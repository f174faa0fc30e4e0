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


# ---------------------------------------------------------------------------
# Orchestration-depth ops (operators/orchestration.py): the scenario
# counters are self-asserted inside each op, so these tests exercise the
# properties the oracle can NOT see — repeat-invocation determinism (the
# scratch reset) and the stamp lifecycle under a mid-build death.
# ---------------------------------------------------------------------------

SF_SMALL = "/root/testdata/sf0.001"


def test_incremental_op_repeat_invocations_deterministic(spark):
    """Each invocation must demonstrate the full build->skip cycle from
    scratch: a leftover stamp from a prior call must not turn run 1
    into a skip (the op resets its node dir), and two invocations must
    return identical counter columns."""
    from lambda_hive_spark.operators.orchestration import orchestrate_incremental

    # collect each result BEFORE the next invocation: the op resets its
    # node dir per call, so a lazily-held DataFrame from call 1 points
    # at files call 2 replaces
    ra = {tuple(r) for r in orchestrate_incremental(spark, SF_SMALL).collect()}
    rb = {tuple(r) for r in orchestrate_incremental(spark, SF_SMALL).collect()}
    assert ra == rb
    assert all(r[-2] == 1 and r[-1] == 2 for r in ra)  # n_builds / n_requests


def test_mid_build_death_leaves_no_stamp(spark, tmp_path):
    """A build that dies before mark_scratch_fresh must be retried on
    the next request — the stamp is written only AFTER success."""
    import os

    from lambda_hive_spark.operators.scans import mark_scratch_fresh, scratch_stale

    fixture = os.path.join(SF_SMALL, "lineitem.parquet")
    node = str(tmp_path / "node")
    assert scratch_stale(node, fixture)  # nothing built yet
    os.makedirs(node)
    (tmp_path / "node" / "part-0").write_text("partial")
    # died before stamping -> still stale despite files on disk
    assert scratch_stale(node, fixture)
    mark_scratch_fresh(node, fixture)
    assert not scratch_stale(node, fixture)
    # clear_scratch must remove BOTH dir and stamp (shared _stamp_path
    # convention — the orchestration ops' per-invocation reset)
    from lambda_hive_spark.operators.scans import clear_scratch

    clear_scratch(node)
    assert scratch_stale(node, fixture)
    import os as _os

    assert not _os.path.exists(node) and not _os.path.exists(node + ".stamp")


def test_resume_op_skips_upstream_on_second_dag_run(spark):
    """The op itself asserts upstream_builds == 1 across its two DAG
    runs; here we just pin that the returned schema carries the
    counters and the data matches a direct join."""
    from pyspark.sql import functions as F

    from lambda_hive_spark.io import table
    from lambda_hive_spark.operators.orchestration import (
        orchestrate_resume_checkpoint,
    )

    got = orchestrate_resume_checkpoint(spark, SF_SMALL)
    assert got.columns == [
        "c_mktsegment", "n_orders", "total_price", "upstream_builds", "dag_runs",
    ]
    o = table(spark, SF_SMALL, "orders")
    c = table(spark, SF_SMALL, "customer")
    want = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got_counts = {(r.c_mktsegment, r.n_orders) for r in got.collect()}
    want_counts = {(r.c_mktsegment, r.n) for r in want.collect()}
    assert got_counts == want_counts
