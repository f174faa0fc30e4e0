"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``lambda_hive_spark``; this module is a thin
adapter over its operator registry (SURVEY.md §3 entry points 1-2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lambda_hive_spark.registry import all_ops


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    from lambda_hive_spark.operators.aggregates import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: o.fn for name, o in all_ops().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle for each sql-checkable op; ops without an
    oracle get the driver's weaker rows-only check."""
    return {name: o.oracle for name, o in all_ops().items() if o.oracle is not None}
