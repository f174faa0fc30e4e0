"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``lambda_hive_spark``; this module is a thin
adapter over its operator registry (SURVEY.md §3 entry points 1-2).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lambda_hive_spark.registry import all_ops, op_source_hash

_REPO = os.path.dirname(os.path.abspath(__file__))


def _graded_names() -> set[str]:
    """Op names already driver-graded in a prior round (GRADED.json is a
    manifest {round: [op, ...], "hashes": {op: fp}} maintained by
    tools/update_graded.py from each CORRECTNESS_r{N}).  An op whose
    implementation changed since grading (fingerprint mismatch) is
    treated as ungraded so the driver re-verifies it."""
    try:
        with open(os.path.join(_REPO, "GRADED.json")) as f:
            manifest = json.load(f)
    except (OSError, ValueError):
        return set()
    hashes = manifest.get("hashes", {})
    names = {
        name
        for key, entries in manifest.items()
        if key != "hashes" and isinstance(entries, list)
        for name in entries
    }
    if not hashes:
        return names
    ops = all_ops()
    return {
        name
        for name in names
        if name not in ops
        or hashes.get(name) is None  # pre-hash manifest entry: trust it
        or hashes[name] == op_source_hash(ops[name])
    }


# The oldest never-graded backlog (registered in rounds 1-2; §2.5
# windows, §2.9 streaming, §2.11 UDx/orchestrator, TPC-H shapes, and
# the rows-only LSH ops). Registry order alone cannot express age —
# later rounds added ops to early-registering modules, which would
# otherwise jump this queue — so the backlog is pinned explicitly at
# the front of the grading window until it has driver evidence.
_BACKLOG_FIRST = (
    "win_rank", "win_topk_per_group", "win_lag_lead", "win_running",
    "win_sliding_rows", "win_range_frame", "win_ntile_cume", "win_first_last",
    "win_distinct_running", "win_gaps_islands", "win_ratio_to_report",
    "stream_tumbling", "stream_sliding", "stream_session", "stream_dedup",
    "stream_watermark", "stream_stateful", "stream_join", "stream_stream_join",
    "stream_sink", "udf_scalar", "udaf_grouped", "udtf", "fn_map",
    "orchestrate_dag", "orchestrate_schedule", "tpch_q3_shipping_priority",
    "tpch_q6_forecast_revenue", "tpch_q10_returned_items", "limit_k",
    "sample_frac", "dedup_near_minhash", "dedup_simhash", "sim_knn_approx",
    "sim_pairs_threshold",
)


def _ordered_ops():
    """Registry ops reordered so the driver's bounded correctness window
    (first ~50 queries) grades ops that do not yet have a driver
    CORRECTNESS row: the pinned oldest backlog first, then other
    never-graded (or edited-since-grading) ops in registry order, then
    the graded remainder."""
    ops = all_ops()
    graded = _graded_names()
    backlog_rank = {n: i for i, n in enumerate(_BACKLOG_FIRST)}

    ordered = sorted(
        enumerate(ops.items()),
        key=lambda item: (
            item[1][0] in graded,                              # ungraded first
            backlog_rank.get(item[1][0], len(backlog_rank)),   # pinned backlog
            item[0],                                           # registry order
        ),
    )
    return {name: o for _, (name, o) in ordered}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    from lambda_hive_spark.operators.aggregates import q1_pricing_summary

    sf_dir = os.environ.get("SPARK_GRAFT_ENTRY_SF_DIR", "/root/testdata/sf0.001")
    return q1_pricing_summary(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's correctness window covers not-yet-graded ops first."""
    return {name: o.fn for name, o in _ordered_ops().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle for each sql-checkable op; ops without an
    oracle get the driver's weaker rows-only check."""
    return {name: o.oracle for name, o in _ordered_ops().items() if o.oracle is not None}
