"""Interval-overlap join (SURVEY.md §2.3 extension, round 3): the
bucket-banded overlap join that join_range's docstring describes but
— being a broadcast band join — never has to execute. This op
implements the actual 100 TB path: when NEITHER side fits in memory
and there is NO equi key, decompose each interval into the fixed-width
time buckets it touches, equi-join on bucket id, then apply the exact
overlap predicate. The quadratic blow-up is confined to a single
bucket; everything between buckets is a plain hash join.

Reference file:line: N/A — empty reference dir (SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_hive_spark.io import table
from lambda_hive_spark.registry import op

# Campaign windows [start, end) — shared literals between the Spark
# plan and the DuckDB oracle so both engines see identical inputs.
_CAMPAIGNS = (
    (1, "1995-02-01", "1995-05-01"),
    (2, "1996-01-15", "1996-02-15"),
    (3, "1996-11-01", "1997-01-10"),
    (4, "1997-06-01", "1997-06-08"),
    (5, "1998-03-01", "1998-09-01"),
    (6, "1999-12-15", "2000-01-15"),
    (7, "2000-07-01", "2000-10-01"),
    (8, "2001-07-20", "2001-08-05"),
)

_BUCKET_DAYS = 28

_SQL_CAMPAIGNS = ",\n         ".join(
    f"({i}, DATE '{s}', DATE '{e}')" for i, s, e in _CAMPAIGNS
)


@op(
    "join_interval_overlap",
    oracle=f"""
WITH campaigns(campaign_id, c_start, c_end) AS (
  VALUES {_SQL_CAMPAIGNS}
)
SELECT campaign_id, CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
FROM campaigns c JOIN orders o
  ON CAST(o.o_orderdate AS DATE) < c.c_end
 AND c.c_start < CAST(o.o_orderdate AS DATE) + INTERVAL 14 DAY
GROUP BY campaign_id
""",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap join of order fulfillment windows [orderdate,
    orderdate+14d) against campaign windows, with NO equi key: each
    interval explodes into the 28-day buckets it touches, the two
    sides equi-join on bucket id, and the exact half-open overlap
    predicate (a.start < b.end AND b.start < a.end) filters the bucket-
    local candidates. count_distinct dedupes orders matched in several
    buckets. Locally Catalyst still broadcasts the 8-campaign side —
    the point is the PLAN SHAPE: at 100 TB with two fact-sized interval
    sets the same query stays a shuffle hash join on bucket id, never a
    cartesian; bucket width tunes the candidate-blowup/bucket-count
    tradeoff exactly like the shingle buckets in dedup_ngram_jaccard.
    All interval math is integer day numbers (datediff from epoch) —
    no timestamp arithmetic to drift between engines."""
    epoch = F.lit("1970-01-01").cast("date")
    o = (
        table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.datediff(F.to_date("o_orderdate"), epoch).alias("s_day"),
        )
        .withColumn("e_day", F.col("s_day") + 14)
    )
    camp = spark.createDataFrame(
        list(_CAMPAIGNS), "campaign_id INT, c_start STRING, c_end STRING"
    ).select(
        "campaign_id",
        F.datediff(F.to_date("c_start"), epoch).alias("cs"),
        F.datediff(F.to_date("c_end"), epoch).alias("ce"),
    )
    o_b = o.withColumn(
        "bucket",
        F.explode(F.sequence(F.expr(f"s_day div {_BUCKET_DAYS}"),
                             F.expr(f"(e_day - 1) div {_BUCKET_DAYS}"))),
    )
    c_b = camp.withColumn(
        "bucket",
        F.explode(F.sequence(F.expr(f"cs div {_BUCKET_DAYS}"),
                             F.expr(f"(ce - 1) div {_BUCKET_DAYS}"))),
    )
    return (
        o_b.join(c_b, "bucket")
        .filter((F.col("s_day") < F.col("ce")) & (F.col("cs") < F.col("e_day")))
        .groupBy("campaign_id")
        .agg(F.count_distinct("o_orderkey").alias("n_orders"))
    )
