"""Orchestrator DAG-runner semantics (SURVEY.md §2.11): dependency
ordering, parallel ready-set execution, per-job retries, and
failure→skip propagation."""

from __future__ import annotations

import threading

import pytest

from lambda_hive_spark.orchestrator import Dag


def test_dependency_results_flow(spark):
    dag = (
        Dag()
        .add("a", lambda s: 1)
        .add("b", lambda s: 2)
        .add("sum", lambda s, deps: deps["a"] + deps["b"], deps=("a", "b"))
    )
    run = dag.run(spark)
    assert run.results == {"a": 1, "b": 2, "sum": 3}
    assert not run.failed and not run.skipped


def test_undeclared_dep_rejected():
    with pytest.raises(ValueError, match="undeclared"):
        Dag().add("x", lambda s: 0, deps=("missing",))


def test_retry_then_succeed(spark):
    calls = {"n": 0}

    def flaky(s):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    run = Dag().add("flaky", flaky, retries=2).run(spark)
    assert run.results["flaky"] == "ok"
    assert run.attempts["flaky"] == 3


def test_failure_skips_downstream_only(spark):
    def boom(s):
        raise RuntimeError("boom")

    dag = (
        Dag()
        .add("bad", boom)
        .add("child", lambda s: "never", deps=("bad",))
        .add("grandchild", lambda s: "never", deps=("child",))
        .add("independent", lambda s: "ran")
    )
    run = dag.run(spark)
    assert isinstance(run.failed["bad"], RuntimeError)
    assert set(run.skipped) == {"child", "grandchild"}
    assert run.results == {"independent": "ran"}


def test_independent_jobs_overlap(spark):
    """Two dependency-free jobs must actually run concurrently (the
    thread pool submits both before either finishes)."""
    barrier = threading.Barrier(2, timeout=30)

    def job(s):
        barrier.wait()  # deadlocks unless both jobs are in flight
        return True

    run = Dag().add("j1", job).add("j2", job).run(spark, max_parallel=2)
    assert run.results == {"j1": True, "j2": True}


def test_partial_and_callable_jobs(spark):
    """Jobs may be functools.partial or callable objects — dependency
    introspection uses inspect.signature, not fn.__code__ (which
    partials lack)."""
    import functools

    def base(spark, deps, tag):
        return {"deps": dict(deps), "tag": tag}

    class CallableJob:
        def __call__(self, spark):
            return "obj"

    dag = Dag()
    dag.add("a", lambda s: 1)
    dag.add("obj", CallableJob())
    dag.add("p", functools.partial(base, tag="t"), deps=["a", "obj"])
    run = dag.run(spark)
    assert not run.failed and not run.skipped
    assert run.results["p"] == {"deps": {"a": 1, "obj": "obj"}, "tag": "t"}
