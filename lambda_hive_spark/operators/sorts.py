"""Sort / limit / top-k / sampling operators (SURVEY.md §2.6).

Scale notes: `orderBy(...).limit(k)` is planned as
TakeOrderedAndProject (per-partition heap + driver merge of k rows) —
no global sort ever materializes; this is the 100 TB-safe top-k
(plan-asserted in tests/test_plans.py). Full sorts are range-partition
sorts (sampled boundaries), used only when the user genuinely wants
total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_hive_spark.io import table
from lambda_hive_spark.registry import op


@op(
    "sort_multi",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
ORDER BY nullif(o_orderstatus, 'P') ASC NULLS FIRST, o_totalprice DESC, o_orderkey ASC
LIMIT 50
""",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null ordering; LIMIT with a unique
    tie-break key makes the result deterministic and hash-checkable
    through the ordering boundary."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.nullif(F.col("o_orderstatus"), F.lit("P")).asc_nulls_first(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(50)
    )


@op("limit_k")
def limit_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT without a total order — result set is engine-dependent, so
    rows-only oracle (SURVEY.md §5.1 rule 5)."""
    return table(spark, sf_dir, "lineitem").limit(100)


@op(
    "topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
""",
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject (no full sort)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@op("sample_frac")
def sample_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample — per-partition RNG means the row set is
    Spark-specific → rows-only oracle."""
    return table(spark, sf_dir, "lineitem").sample(fraction=0.1, seed=42)
