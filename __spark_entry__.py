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


def _ordered_ops():
    """Registry ops reordered so the driver's bounded correctness window
    (first ~50 queries) grades ops that do not yet have a driver
    CORRECTNESS row: never-graded (or edited-since-grading) ops first in
    registry order — oldest ops wait the fewest rounds, and newly added
    ops queue behind the existing backlog instead of displacing
    rows-only ops that have never been executed — then the graded
    remainder."""
    ops = all_ops()
    graded = _graded_names()

    ordered = sorted(
        enumerate(ops.items()),
        key=lambda item: (
            item[1][0] in graded,          # ungraded first
            item[0],                       # stable registry order within group
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
