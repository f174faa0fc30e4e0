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

from lambda_hive_spark.helpers import davg, dsum, hier_exact_agg, sql_davg, sql_dsum
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
    The money sums run through hier_exact_agg (helpers.py): long-micros
    partials per scan partition, decimal-exact merge — same bit-exact
    doubles as a direct decimal sum, ~1.5× faster because the 128-bit
    decimal accumulator leaves the per-row hot loop. r10 sharpened it:
    a column used by both a sum and an avg accumulates ONE long
    partial (Q1: 7 → 5 accumulators), values unchanged by
    construction.

    Why NOT the single-level try_sum that agg_partial_final/agg_pivot
    use (r10 adjudication, tools/r10_q1_variants.py — re-confirming
    BASELINE §7 addendum 18): Q1 has SIX corpus-sized groups, so the
    int64 group-total bound (9.2e12 value units) is real here — the
    local 1000× corpus already reaches 31% of 2^63 micros on
    sum_base_price, and a 100 TB corpus (~10^6× sf0.1) overflows it
    ~300×; try_sum would fail visibly (NULL), but a flagship that
    NULLs at target scale is the wrong design. Measured alternatives,
    all parity-EXACT at sf0.1+100×: single-level int64 try_sum 1.67×
    at sf0.1 / 1.24× at 100× but UNSAFE as above; single-level
    decimal-accumulator sum (long micros cast to DECIMAL(38,0) per
    row) 0.99× / 0.39× — the 128-bit accumulator back in the hot loop;
    split whole+frac int64 try_sums (bound ~2 EB) 1.25× / 0.95× —
    doubled buffers cost at row volume. The partition-bounded
    two-level form stays: its partials overflow only if ONE scan
    partition sums past 9.2e12 value units, and its merge is
    unbounded decimal.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = "l_extendedprice * (1 - l_discount)"
    charge = f"{disc_price} * (1 + l_tax)"
    return hier_exact_agg(
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
