"""Mergeable-sketch operators (SURVEY.md §2.12, round 3 batch 2):
Datasketches HLL rollups and t-digest quantiles — the approximate
answers that replace exact aggregation when 100 TB makes exactness a
luxury. Both are rows-only ops (no DuckDB oracle can reproduce
Spark's sketch internals); their accuracy contracts are pinned by
invariant tests against the exact answers
(tests/test_rowsonly_invariants.py).

The property that matters at scale: sketches are MERGEABLE. Each
executor summarizes its partitions into a fixed-size state, and
partial states combine associatively — so the shuffle moves kilobytes
of sketch instead of the key set, and yesterday's per-partition
sketches union with today's without rescanning either.

Reference file:line: N/A — empty reference dir (SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_hive_spark.io import table
from lambda_hive_spark.registry import op


@op("sketch_hll_rollup", tags=("approx",))
def sketch_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group HLL distinct-user sketches PLUS their union rolled up
    to a global estimate — the canonical mergeable-sketch rollup. The
    per-type sketches are built in one pass (partial hll_sketch_agg on
    the map side, fixed ~KB state per group), and the ALL row comes
    from hll_union_agg over the per-group sketches — NOT a rescan.
    This is the shape that lets a 100 TB daily pipeline keep per-day
    per-group sketches and answer "distinct users this quarter" by
    unioning 90 tiny states. lgConfigK=14 → ~0.8% relative error;
    the invariant test pins estimates within 5% of exact."""
    ev = table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk")
    )
    per_est = per.select(
        "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
    )
    glob = per.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    return per_est.unionByName(glob)


@op("sketch_approx_quantiles", tags=("approx",))
def sketch_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles of l_extendedprice per returnflag via
    percentile_approx (Greenwald-Khanna/t-digest style summary,
    accuracy parameter 10000 → ε = 1/10000 rank error). The summary is
    mergeable like the HLL sketch, so the same partial/final split
    applies; this is what agg_percentile's docstring tells you to swap
    to at 100 TB, exercised as its own op. Invariant test bounds each
    approx quantile between the exact neighbors at ±2ε rank."""
    li = table(spark, sf_dir, "lineitem")
    pr = F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx(pr, 0.5, 10000).alias("p50"),
        F.percentile_approx(pr, 0.95, 10000).alias("p95"),
        F.percentile_approx(pr, 0.99, 10000).alias("p99"),
    )
