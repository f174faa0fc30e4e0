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


@op(
    "limit_k",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
ORDER BY l_orderkey, l_linenumber,
         l_quantity NULLS LAST, l_extendedprice NULLS LAST
LIMIT 100
""",
)
def limit_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT, determinized: a bare LIMIT's row set is engine-dependent
    (whatever rows arrive first), so the op totally orders before
    limiting — same LIMIT machinery (TakeOrderedAndProject:
    per-partition heap + driver merge of k rows, no global sort), but
    a hash-checkable result (VERDICT r3 item 2 determinization).

    The sort key is ALL FOUR output columns, not just (l_orderkey,
    l_linenumber): this corpus's lineitem does NOT keep that pair
    unique (unlike TPC-H proper — ~1.2k duplicate pairs at sf0.001),
    so a two-column "total" order ties at the LIMIT boundary and the
    row set silently depends on scan order — the regen-resilience
    sweep caught it flaking once the file had >1 row group. Ordering
    by every emitted column (NULLS LAST pinned) makes the output a
    function of the data alone, even under duplicate keys."""
    return (
        table(spark, sf_dir, "lineitem")
        .orderBy(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").asc_nulls_last(),
            F.col("l_extendedprice").asc_nulls_last(),
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .limit(100)
    )


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


@op(
    "sample_frac",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE substr(md5(l_orderkey::VARCHAR || '#' || l_linenumber::VARCHAR), 1, 8) < '1999999a'
""",
)
def sample_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% Bernoulli sample: keep a row iff the first 8
    hex chars of md5(primary key) fall below floor(0.1·16^8) — the
    same hash-threshold trick as sample_weighted, so the row set is
    identical on both engines, under retries, and across
    repartitioning (Spark's .sample() draws per-partition RNG, which
    no oracle can reproduce — VERDICT r3 item 2 determinization).
    Scale: a pure per-row projection-filter at the scan; no shuffle,
    no RNG state."""
    li = table(spark, sf_dir, "lineitem")
    key = F.substring(
        F.md5(F.concat_ws("#", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string"))),
        1,
        8,
    )
    # floor(0.1 * 16^8) = 429496729 = 0x19999999; strict < '1999999a'
    # in hex-string order equals numeric <= 0x19999999.
    return (
        li.filter(key < "1999999a")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )
