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
    # r11 (guide §6): Catalyst infers isnotnull(datediff(to_date(
    # o_orderdate), epoch)) from the bucket join key but cannot push a
    # derived expression to the parquet scan (PushedFilters stayed
    # empty). The base-column guard below is semantics-identical
    # (datediff of a non-null date is never null, and null-key rows
    # were already dropped by the inner bucket join) and DOES push —
    # at 100 TB the scan skips all-null pages/row-groups via parquet
    # null-count stats instead of materializing them.
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
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


@op(
    "interval_islands_merge",
    oracle="""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e FROM events
),
mk AS (
  SELECT user_id, s, e,
         CASE WHEN s > MAX(e) OVER (
           PARTITION BY user_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) THEN 1 ELSE 0 END AS new_island
  FROM iv
),
isl AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (
           PARTITION BY user_id ORDER BY s, e ROWS UNBOUNDED PRECEDING
         ) AS island
  FROM mk
)
SELECT user_id, CAST(island AS BIGINT) AS island,
       MIN(s) AS island_start_us, MAX(e) AS island_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_intervals
FROM isl
GROUP BY user_id, island
""",
)
def interval_islands_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing (gaps-and-islands): each event opens a
    30-minute activity window [ts, ts+30m); overlapping/touching-free
    windows per user merge into islands. The classic two-window plan:
    a row starts a NEW island iff its start exceeds the running MAX
    end of every earlier interval (cumulative max over a rows frame —
    NOT lag(end), which misses the engulfed-interval case where an
    earlier long interval outlives its successor), then a running SUM
    of the flags numbers the islands. First row's frame is empty →
    NULL compare → flag 0: island ids start at 0 per user on BOTH
    engines. All arithmetic in integer epoch-µs; tie order within
    equal (s, e) cannot change island assignment (the flag pattern is
    symmetric under permutation of ties).

    Scale: one shuffle on user_id; both windows and the final groupBy
    share that partitioning (Catalyst plans a single Exchange). Island
    state is O(1) per row — no buffering of the interval set."""
    iv = table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("s"),
        (F.unix_micros(F.col("ts")) + 1_800_000_000).alias("e"),
    )
    from pyspark.sql import Window

    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(F.col("s") > F.max("e").over(w_prev), 1).otherwise(0),
    ).withColumn("island", F.sum("new_island").over(w_run).cast("long"))
    return flagged.groupBy("user_id", "island").agg(
        F.min("s").alias("island_start_us"),
        F.max("e").alias("island_end_us"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


@op(
    "interval_max_concurrent",
    oracle="""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e FROM events
),
pts AS (
  SELECT user_id, s AS t, 1 AS d FROM iv
  UNION ALL
  SELECT user_id, e AS t, -1 AS d FROM iv
),
run AS (
  SELECT user_id,
         SUM(d) OVER (
           PARTITION BY user_id ORDER BY t, d ROWS UNBOUNDED PRECEDING
         ) AS live
  FROM pts
)
SELECT user_id, CAST(MAX(live) AS BIGINT) AS max_concurrent
FROM run GROUP BY user_id
""",
)
def interval_max_concurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line concurrency (the room-booking maximum): each event's
    30-minute window contributes a +1 at its start and a -1 at its
    end; the running sum ordered by (time, delta) is the number of
    live intervals, and its per-user MAX is the peak concurrency.
    Ordering ends (-1) before starts (+1) at the same instant makes
    the windows half-open — back-to-back intervals never double-count.
    Tie groups of identical (t, d) rows cannot change the partition
    MAX (the prefix sum is monotone within a tie group), so the result
    is deterministic on both engines despite row-order freedom.

    Scale: one shuffle on user_id over 2 rows per interval; the sweep
    is a single window pass, state O(1) per row. The same plan handles
    billions of intervals — the alternative self-join counts overlaps
    quadratically."""
    iv = table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("s"),
        (F.unix_micros(F.col("ts")) + 1_800_000_000).alias("e"),
    )
    pts = iv.select("user_id", F.col("s").alias("t"), F.lit(1).alias("d")).unionByName(
        iv.select("user_id", F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        pts.withColumn("live", F.sum("d").over(w))
        .groupBy("user_id")
        .agg(F.max("live").cast("long").alias("max_concurrent"))
    )
