"""Remaining aggregate surface: argmin/argmax, boolean aggregates,
and a dynamic-partition-pruning join over the date-partitioned layout.

Reference file:line: N/A — empty reference dir (SURVEY.md §0).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_hive_spark.io import table
from lambda_hive_spark.operators.scans import _scratch
from lambda_hive_spark.registry import op


@op(
    "agg_minmax_by",
    oracle="""
SELECT o_orderstatus,
       arg_max(o_orderkey, o_totalprice) AS biggest_order,
       arg_min(o_orderkey, o_totalprice) AS smallest_order,
       MAX(o_totalprice) AS max_price, MIN(o_totalprice) AS min_price
FROM orders GROUP BY o_orderstatus
""",
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax per group (max_by/min_by ≡ DuckDB arg_max/arg_min).
    Deterministic here because o_totalprice values are distinct within
    each status group at these sf (ties would be engine-arbitrary)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@op(
    "agg_boolean",
    oracle="""
SELECT user_id,
       bool_and(value >= 0) AS all_nonneg,
       bool_or(event_type = 'error') AS any_error,
       CAST(count_if(event_type = 'purchase') AS BIGINT) AS n_purchases
FROM events GROUP BY user_id
""",
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates: every/any/count_if per user."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.every(F.col("value") >= 0).alias("all_nonneg"),
        F.some(F.col("event_type") == "error").alias("any_error"),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
    )


@op(
    "join_dpp",
    oracle="""
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date, COUNT(*) AS n
FROM events
WHERE CAST(ts AS DATE) = DATE '2024-01-05' OR CAST(ts AS DATE) = DATE '2024-01-20'
GROUP BY 1
""",
    tags=("side_effect",),
)
def join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-wise join: the date-partitioned event layout joined
    against a filtered dates dim — the shape that triggers dynamic
    partition pruning at scale (fact scan skips 363 of 365 days when
    the date filter only exists on a dimension). NOTE: Spark's DPP
    insertion is gated on a size-benefit heuristic that (correctly)
    declines on KB-scale fixtures even with useStats=false, so no
    `dynamicpruning` subquery appears here; static partition pruning
    of the same layout IS plan-asserted via `sink_partitioned`."""
    out = _scratch(f"events_dpp_{os.path.basename(sf_dir.rstrip('/'))}")
    if not os.path.isdir(os.path.join(out, "event_date=2024-01-05")):
        ev = table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
        ev.write.mode("overwrite").partitionBy("event_date").parquet(out)
    facts = spark.read.parquet(out)
    # the dim must be a filtered SOURCE (DPP inserts the pruning
    # subquery only when the build side carries a selective predicate)
    dim_path = _scratch(f"dates_dim_{os.path.basename(sf_dir.rstrip('/'))}")
    if not os.path.isdir(dim_path) or not os.listdir(dim_path):
        facts.select("event_date").distinct().withColumn(
            "wanted", F.dayofmonth("event_date").isin(5, 20)
        ).write.mode("overwrite").parquet(dim_path)
    wanted = spark.read.parquet(dim_path).filter(F.col("wanted")).select(
        F.col("event_date").alias("d")
    )
    return (
        facts.join(wanted, facts.event_date == wanted.d)
        .groupBy(F.col("event_date").cast("string").alias("event_date"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
