"""Projection / filter / scalar-predicate operators (SURVEY.md §2.2).

All expressions are Catalyst built-ins inside whole-stage codegen; no
Python executes per row. Per-row double arithmetic is IEEE-identical
across engines, so projections hash-match without the decimal detour
(only cross-row ACCUMULATION needs it — helpers.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_hive_spark.helpers import dsum, sql_dsum
from lambda_hive_spark.io import table
from lambda_hive_spark.registry import op


@op(
    "project_compute",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
FROM lineitem
""",
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-column projection (per-row arithmetic, no shuffle).
    Raw doubles: identical IEEE ops on identical inputs are
    bit-identical across engines — no rounding (helpers.r4)."""
    li = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charge"),
    )


@op(
    "filter_conj",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE (o_orderstatus = 'F' AND o_totalprice > 150000.0)
   OR (NOT (o_orderpriority IN ('1-URGENT', '2-HIGH')) AND o_totalprice < 20000.0)
""",
)
def filter_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT predicate combination."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000.0))
        | (~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH") & (F.col("o_totalprice") < 20000.0))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@op(
    "filter_in",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
""",
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate."""
    c = table(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )


@op(
    "filter_between",
    oracle="""
SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
""",
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate over the timestamp[ms] order date."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 00:00:00").cast("timestamp"),
        )
    ).select("o_orderkey", "o_orderdate", "o_totalprice")


@op(
    "filter_like",
    oracle="""
SELECT p_partkey, p_name, p_brand, p_type FROM part
WHERE p_type LIKE '%OMO%' OR regexp_matches(p_name, '^(red|blue) .*t$')
""",
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE and regex pattern matching."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%OMO%") | F.col("p_name").rlike("^(red|blue) .*t$")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@op(
    "filter_null",
    oracle="""
SELECT coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN nullif(o_orderstatus, 'P') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_was_null
FROM orders
GROUP BY status_filled
""",
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: nullif/coalesce/isNull (fixtures have no native
    NULLs, so nullif manufactures them)."""
    o = table(spark, sf_dir, "orders")
    st = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        o.select(F.coalesce(st, F.lit("PENDING")).alias("status_filled"), st.isNull().alias("wn"))
        .groupBy("status_filled")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("wn"), 1).otherwise(0)).alias("n_was_null"),
        )
    )


@op(
    "case_when",
    oracle=f"""
SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
            WHEN o_orderpriority = '3-MEDIUM' THEN 'mid'
            ELSE 'low' END AS prio_bucket,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS total_price
FROM orders
GROUP BY prio_bucket
""",
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional projection feeding an aggregation."""
    o = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "mid")
        .otherwise("low")
    )
    return (
        o.select(bucket.alias("prio_bucket"), "o_totalprice")
        .groupBy("prio_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


@op("distinct_rows", oracle="SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem")
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row deduplication — a shuffle on all selected columns; at scale
    prefer dropDuplicates on an explicit key subset.

    r11 (guide §1.2 per-task work): the distinct groups with the
    HIGH-CARDINALITY column first (l_shipdate ~2.4k distinct values vs
    3 return flags / 2 line statuses), so hash-table key-equality
    probes bail on the first compared field instead of matching the
    2-3-value string prefixes on nearly every probe. Measured on the
    600M-row 1000× corpus at ≤2.5% steal: 6.70→5.59 s and 7.40→6.12 s
    (1.20×/1.21× in two sessions), 1.14× at 100×, noise-band at the
    sub-second sf0.1 tier — the win grows with row volume. The
    trailing select restores the declared column order (same rows,
    same schema; oracle hash-gated). The remaining ~2.5× gap to the
    xxhash64-only lower bound (2.5 s vs 6 s at 1000×) is the scan's
    dictionary-string materialization — reader-level, not reachable by
    a plan change (r8 decomposition; re-confirmed r11 with
    tools/r11_distinct_probe.py: non-vectorized reader 0.5×, bigger
    reader batches 0.9×)."""
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_shipdate", "l_returnflag", "l_linestatus")
        .distinct()
        .select("l_returnflag", "l_linestatus", "l_shipdate")
    )
