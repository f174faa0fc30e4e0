"""Aggregation operators (SURVEY.md §2.4).

Scale notes: every groupBy here is planned by Catalyst as partial
(map-side) + final hash aggregation, so the shuffle carries one row
per (partition, group), not per input row. Group keys are
low-cardinality (returnflag×linestatus = 6; flags/status/priority
likewise), so there is no skew concern at 100 TB. Float sums go
through the decimal-exact pattern (helpers.py) — order-independent,
hence partitioning-independent — and are NEVER rounded (round()
itself is engine-divergent; see helpers.r4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_hive_spark.helpers import davg, dsum, flat_exact_agg, sql_davg, sql_dsum
from lambda_hive_spark.io import table
from lambda_hive_spark.registry import op

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary — the flagship (SURVEY.md §7 M0).

    One query exercising scan → pushed-down filter → projection →
    partial/final hash agg. At 100 TB: the filter reaches the parquet
    scan (plan-asserted in tests/test_plans.py), only 7 of 11 columns
    are read, and the shuffle after partial agg is 6 rows/partition.
    The money sums run through flat_exact_agg (helpers.py): SINGLE-
    level long-micros try_sum — Catalyst's own partial/final BIGINT
    sum does the map-side combine, the avg numerators share the sum
    columns' long totals (5 distinct micros accumulators instead of
    the two-level form's 7), and one decimal division at emit keeps
    the doubles bit-identical to dsum/sql_dsum. r10 A/B vs the former
    hier_exact_agg (tools/r10_flat_agg_ab.py): 0.551 s → 0.331 s at
    sf0.1 (1.67×), 0.674 s → 0.544 s at the 100× tier (1.24×), plan
    2 Exchanges → 1, parity EXACT at both scales (sorted-row
    compare). History: sum(cast decimal) → hier two-level micros
    (~1.5×, r4) → this (guide §2.4: the second aggregate pass and its
    exchange removed outright).
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = "l_extendedprice * (1 - l_discount)"
    charge = f"{disc_price} * (1 + l_tax)"
    return flat_exact_agg(
        li.filter("l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"),
        ["l_returnflag", "l_linestatus"],
        sums=[
            ("sum_qty", "l_quantity"),
            ("sum_base_price", "l_extendedprice"),
            ("sum_disc_price", disc_price),
            ("sum_charge", charge),
        ],
        avgs=[
            ("avg_qty", "l_quantity"),
            ("avg_price", "l_extendedprice"),
            ("avg_disc", "l_discount"),
        ],
        count_star="count_order",
    )


op("agg_hash", oracle=_Q1_ORACLE)(q1_pricing_summary)


@op(
    "agg_global",
    oracle=f"""
SELECT
  COUNT(*) AS n_rows,
  {sql_dsum('o_totalprice')} AS sum_price,
  {sql_davg('o_totalprice')} AS avg_price,
  MIN(o_totalprice) AS min_price,
  MAX(o_totalprice) AS max_price,
  COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
""",
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregates over orders (SURVEY.md §2.4 agg_global).
    min/max of doubles are order-independent — no decimal detour."""
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice").alias("sum_price"),
        davg("o_totalprice").alias("avg_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )
