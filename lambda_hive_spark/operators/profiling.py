"""Data-profiling / data-quality operators (SURVEY.md §2.12, round 3):
the diagnostics a 100 TB ingest runs BEFORE committing to a plan —
per-column profiles, heavy-hitter keys, value histograms, and key-skew
(frequency-of-frequencies) distributions. Skewed keys are the #1 cause
of straggler tasks at scale; these ops are how you find them.

All four are single-scan shapes: one pass over the fact table with
map-side partial aggregation, no joins, no driver materialization.

Reference file:line: N/A — empty reference dir (SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_hive_spark.io import table
from lambda_hive_spark.registry import op

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@op(
    "profile_columns",
    oracle="""
SELECT 'l_quantity' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
       MIN(l_quantity) AS min_v, MAX(l_quantity) AS max_v
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
       CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
       MIN(l_extendedprice), MAX(l_extendedprice)
FROM lineitem
UNION ALL
SELECT 'l_discount', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(l_discount) AS BIGINT),
       CAST(COUNT(DISTINCT l_discount) AS BIGINT),
       MIN(l_discount), MAX(l_discount)
FROM lineitem
UNION ALL
SELECT 'l_tax', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(l_tax) AS BIGINT),
       CAST(COUNT(DISTINCT l_tax) AS BIGINT),
       MIN(l_tax), MAX(l_tax)
FROM lineitem
""",
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile (rows / nulls / distinct / min / max) of the
    numeric lineitem measures in ONE scan: all 4×5 aggregates run in a
    single groupBy-less aggregate (the multiple count-distincts become
    one Expand + partial agg — still one pass over the data, unlike the
    oracle's 4 UNION'd scans, which is the point at 100 TB), then the
    1-row wide result is stacked to long form driver-free."""
    li = table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) "
        "AS (col, n_rows, n_nulls, n_distinct, min_v, max_v)"
    )


@op(
    "profile_heavy_hitters",
    oracle="""
WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id
),
t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c)
SELECT user_id, cnt, cnt / total AS share
FROM c, t
ORDER BY cnt DESC, user_id
LIMIT 20
""",
)
def profile_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 hottest keys with their traffic share — the skew report
    you read before choosing a join strategy for user_id. One shuffle
    (groupBy user_id with map-side combine); the grand total joins back
    as a broadcast 1-row scalar, and the top-k is a TakeOrdered (no
    global sort). share = exact-int / exact-int in double: bit-identical
    across engines. At 100 TB the exact groupBy is still fine (keys ≪
    rows); a count-min sketch only becomes necessary when the key space
    itself won't fit a shuffle."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    total = c.agg(F.sum("cnt").alias("total"))
    return (
        c.crossJoin(F.broadcast(total))
        .select("user_id", "cnt", (F.col("cnt") / F.col("total")).alias("share"))
        .orderBy(F.desc("cnt"), "user_id")
        .limit(20)
    )


@op(
    "profile_histogram",
    oracle="""
SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(l_extendedprice) AS min_v, MAX(l_extendedprice) AS max_v
FROM lineitem
GROUP BY bucket
""",
)
def profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram (5000-wide buckets) of a measure
    column: pure groupBy on a computed key, map-side combined, output
    cardinality = O(#buckets) regardless of input size. Bucket id uses
    floor(x/width) on BOTH sides — DuckDB's CAST(x/N AS BIGINT) rounds
    half-away while floor() floors, a known parity trap (see
    duckdb-spark parity rule 3b)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_extendedprice") / 5000).alias("bucket")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("min_v"),
            F.max("l_extendedprice").alias("max_v"),
        )
    )


@op(
    "profile_key_skew",
    oracle="""
WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id
)
SELECT cnt AS events_per_user, CAST(COUNT(*) AS BIGINT) AS n_users
FROM c GROUP BY cnt
""",
)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-of-frequencies: how many keys occur exactly k times.
    THE skew diagnostic — a long tail at high k means salting / AQE
    skew-join is needed downstream. Two cascaded groupBys; the second
    input is already key-cardinality-sized, so the second shuffle is
    tiny. No driver collection: the distribution itself is the result."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    return c.groupBy(F.col("cnt").alias("events_per_user")).agg(
        F.count(F.lit(1)).alias("n_users")
    )


@op(
    "quality_rules_audit",
    oracle="""
WITH agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT) AS q_range,
         CAST(COUNT(*) FILTER (WHERE l_extendedprice <= 0) AS BIGINT) AS price_pos,
         CAST(COUNT(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT) AS key_null,
         CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS pk_dup,
         CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 1) AS BIGINT) AS disc_range
  FROM lineitem
)
SELECT r.rule, r.n_violations, r.n_violations = 0 AS passed
FROM agg, LATERAL (VALUES
  ('quantity_in_1_50', agg.q_range),
  ('price_positive', agg.price_pos),
  ('orderkey_not_null', agg.key_null),
  ('pk_unique', agg.pk_dup),
  ('discount_in_0_1', agg.disc_range)
) AS r(rule, n_violations)
""",
)
def quality_rules_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality rule audit (the Deequ/dbt-test shape):
    range, positivity, null, primary-key-uniqueness and domain checks
    over lineitem, evaluated as ONE conditional-aggregation scan and
    unpivoted to a (rule, n_violations, passed) report — the
    constraint report a warehouse runs after every load.

    Scale: all rules share a single pass (conditional counts combine
    map-side; the PK check is one count_distinct); adding a rule adds
    an accumulator, not a scan. At 100 TB this is the difference
    between one 100 TB read and one per rule.

    Sibling: `quality_rule_audit_orders` (operators/quality.py) runs the same
    audit shape over ORDERS with a pass/fail-count report and a
    composite-free unique check — kept separate deliberately: together
    they cover both report conventions (violations-only vs pass/fail)
    and both PK shapes (composite vs single-column)."""
    li = table(spark, sf_dir, "lineitem")
    q, p, dsc = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    agg = li.agg(
        F.count(F.when((q < 1) | (q > 50), 1)).alias("q_range"),
        F.count(F.when(p <= 0, 1)).alias("price_pos"),
        F.count(F.when(F.col("l_orderkey").isNull(), 1)).alias("key_null"),
        (F.count(F.lit(1)) - F.count_distinct("l_orderkey", "l_linenumber")).alias("pk_dup"),
        F.count(F.when((dsc < 0) | (dsc > 1), 1)).alias("disc_range"),
    )
    rules = [
        ("quantity_in_1_50", "q_range"),
        ("price_positive", "price_pos"),
        ("orderkey_not_null", "key_null"),
        ("pk_unique", "pk_dup"),
        ("discount_in_0_1", "disc_range"),
    ]
    stacked = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(rule).alias("rule"), F.col(col).cast("bigint").alias("n_violations")
                    )
                    for rule, col in rules
                ]
            )
        ).alias("r")
    )
    return stacked.select(
        F.col("r.rule").alias("rule"),
        F.col("r.n_violations").alias("n_violations"),
        (F.col("r.n_violations") == 0).alias("passed"),
    )


@op(
    "profile_drift_psi",
    oracle="""
WITH binned AS (
  SELECT event_type,
         (event_id % 2 = 0) AS is_base,
         LEAST(CAST(FLOOR(value / 50.0) AS BIGINT), 9) AS bin
  FROM events
),
counts AS (
  SELECT event_type, bin,
         CAST(COUNT(*) FILTER (WHERE is_base) AS DOUBLE) AS n_a,
         CAST(COUNT(*) FILTER (WHERE NOT is_base) AS DOUBLE) AS n_b
  FROM binned GROUP BY event_type, bin
),
tot AS (
  SELECT event_type, bin, n_a, n_b,
         SUM(n_a) OVER (PARTITION BY event_type) AS tot_a,
         SUM(n_b) OVER (PARTITION BY event_type) AS tot_b
  FROM counts
),
terms AS (
  SELECT event_type, bin,
         ((n_a + 0.5) / (tot_a + 5.0)) AS pa,
         ((n_b + 0.5) / (tot_b + 5.0)) AS pb
  FROM tot
)
SELECT event_type,
       ROUND(SUM(ROUND((pa - pb) * LN(pa / pb), 12)), 8) AS psi,
       CAST(COUNT(*) AS BIGINT) AS n_bins
FROM terms GROUP BY event_type
""",
)
def profile_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two event populations (even
    vs odd event_id stands in for last-week vs this-week) per event
    type: 10 equal-width value bins, Laplace-smoothed proportions,
    PSI = Σ (pa−pb)·ln(pa/pb). THE standard drift alarm a training
    pipeline runs on every feature before re-training; PSI > 0.2 means
    the feature moved.

    Determinism: bin counts are integers, proportions are single IEEE
    divisions, and each per-bin term is rounded to 12 dp before the
    final sum (the ln libm call may differ by 1 ulp between engines —
    rounding each ~1e-2-magnitude term 10 orders above that noise
    makes the order-independent sum exact); the output rounds to 8 dp.

    Scale: one scan, map-combinable (event_type, bin) counts — the
    windows run over ≤ |types|×10 rows. No shuffle touches raw
    events beyond the first partial-agg exchange."""
    ev = table(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        (F.col("event_id") % 2 == 0).alias("is_base"),
        F.least(F.floor(F.col("value") / 50.0).cast("bigint"), F.lit(9)).alias("bin"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.count_if(F.col("is_base")).cast("double").alias("n_a"),
        F.count_if(~F.col("is_base")).cast("double").alias("n_b"),
    )
    from pyspark.sql.window import Window

    wt = Window.partitionBy("event_type")
    terms = (
        counts.withColumn("tot_a", F.sum("n_a").over(wt))
        .withColumn("tot_b", F.sum("n_b").over(wt))
        .select(
            "event_type",
            "bin",
            ((F.col("n_a") + 0.5) / (F.col("tot_a") + 5.0)).alias("pa"),
            ((F.col("n_b") + 0.5) / (F.col("tot_b") + 5.0)).alias("pb"),
        )
    )
    return terms.groupBy("event_type").agg(
        F.round(
            F.sum(F.round((F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb")), 12)),
            8,
        ).alias("psi"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
    )
