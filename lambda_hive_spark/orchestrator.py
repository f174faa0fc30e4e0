"""Thin workflow-DAG runner (SURVEY.md §2.11, orchestrator heritage).

The engine's second (and last) engine-owned structure besides the op
registry: a dict of named jobs with dependencies, each job a callable
that runs Spark actions. Deliberately thin — scheduling *data* work is
Catalyst's job; this only sequences whole jobs, which is all the
Lambda/Hive-style orchestration surface amounts to (SURVEY.md §0.1).

Scale/ops notes:
- Independent jobs run concurrently via a thread pool; Spark's
  scheduler interleaves their stages across the cluster (threads only
  submit jobs — the FAIR/FIFO pool does the real multiplexing).
- Each job runs under its own `setJobGroup`, so a stuck job is
  visible and cancellable (`cancelJobGroup`) in the Spark UI at scale.
- Retries are per-job with no shared state, safe because jobs are
  idempotent Spark actions (overwrite-mode writes, pure reads).

Reference file:line: N/A — empty reference dir (SURVEY.md §0).
"""

from __future__ import annotations

import inspect
import threading
from collections.abc import Callable, Iterable
from concurrent.futures import FIRST_COMPLETED, Future, ThreadPoolExecutor, wait
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class Job:
    name: str
    fn: Callable[..., Any]  # fn(spark) or fn(spark, deps: dict[str, Any])
    deps: tuple[str, ...] = ()
    retries: int = 0
    wants_deps: bool = False


def _wants_deps(fn: Callable[..., Any]) -> bool:
    """True when `fn` can accept a second positional arg (the deps
    dict). Uses `inspect.signature`, which sees through
    `functools.partial` and callable objects — `fn.__code__.co_argcount`
    does not (it raises on partials and miscounts bound args)."""
    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return False
    positional = 0
    for p in sig.parameters.values():
        if p.kind == p.VAR_POSITIONAL:
            return True
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD):
            positional += 1
    return positional >= 2


@dataclass
class DagRun:
    results: dict[str, Any] = field(default_factory=dict)
    attempts: dict[str, int] = field(default_factory=dict)
    failed: dict[str, Exception] = field(default_factory=dict)
    skipped: list[str] = field(default_factory=list)


class Dag:
    """Declare with `add`, execute with `run` — topological order,
    dependency-gated, failures skip (don't run) downstream jobs."""

    def __init__(self) -> None:
        self._jobs: dict[str, Job] = {}

    def add(
        self,
        name: str,
        fn: Callable[..., Any],
        deps: Iterable[str] = (),
        retries: int = 0,
    ) -> "Dag":
        """Declare a job. `fn` takes the session, plus — if it declares
        a second parameter — a dict of its dependencies' results."""
        if name in self._jobs:
            raise ValueError(f"duplicate job: {name}")
        deps = tuple(deps)
        for d in deps:
            if d not in self._jobs:
                raise ValueError(f"job {name!r} depends on undeclared {d!r}")
        self._jobs[name] = Job(name, fn, deps, retries, _wants_deps(fn))
        return self

    def run(self, spark: SparkSession, max_parallel: int = 4) -> DagRun:
        run = DagRun()
        pending = dict(self._jobs)
        lock = threading.Lock()

        def execute(job: Job) -> Any:
            spark.sparkContext.setJobGroup(job.name, f"dag job {job.name}", True)
            args = (spark, {d: run.results[d] for d in job.deps}) if job.wants_deps else (spark,)
            try:
                last: Exception | None = None
                for attempt in range(job.retries + 1):
                    with lock:
                        run.attempts[job.name] = attempt + 1
                    try:
                        return job.fn(*args)
                    except Exception as exc:  # noqa: BLE001 — retry any job error
                        last = exc
                raise last  # type: ignore[misc]
            finally:
                # PySpark 4 dropped clearJobGroup; reset the property
                spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)

        with ThreadPoolExecutor(max_workers=max_parallel) as pool:
            futures: dict[Future, str] = {}
            while pending or futures:
                ready = [
                    j
                    for j in pending.values()
                    if all(d in run.results for d in j.deps)
                    and not any(d in run.failed or d in run.skipped for d in j.deps)
                ]
                dead = [
                    j.name
                    for j in pending.values()
                    if any(d in run.failed or d in run.skipped for d in j.deps)
                ]
                for name in dead:
                    run.skipped.append(name)
                    del pending[name]
                for job in ready:
                    futures[pool.submit(execute, job)] = job.name
                    del pending[job.name]
                if not futures:
                    continue
                done, _ = wait(futures, return_when=FIRST_COMPLETED)
                for fut in done:
                    name = futures.pop(fut)
                    try:
                        run.results[name] = fut.result()
                    except Exception as exc:  # noqa: BLE001
                        run.failed[name] = exc
        return run
