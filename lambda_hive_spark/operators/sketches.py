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


@op(
    "sketch_hll_rollup",
    oracle="""
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS within_bound
FROM events GROUP BY event_type
UNION ALL
SELECT 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT), TRUE FROM events
""",
    tags=("approx",),
)
def sketch_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group HLL distinct-user sketches PLUS their union rolled up
    to a global estimate — the canonical mergeable-sketch rollup. The
    per-type sketches are built in one pass (partial hll_sketch_agg on
    the map side, fixed ~KB state per group), and the ALL row comes
    from hll_union_agg over the per-group sketches — NOT a rescan.
    This is the shape that lets a 100 TB daily pipeline keep per-day
    per-group sketches and answer "distinct users this quarter" by
    unioning 90 tiny states.

    Oracle contract (the agg_approx_error_bound pattern, VERDICT r3
    item 2): Datasketches internals are engine-specific, so each row
    publishes the exact count plus within_bound = |est − exact| ≤
    5%·exact (lgConfigK=14 → ~0.8% rsd; 5% ≈ 6σ). The UNIONED
    estimate must meet the same bound — sketch-merge error is gated,
    not just per-group error. At 100 TB drop the exact column; the
    contract column makes the sketch drivable by the gate here."""
    ev = table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    per_est = per.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("within_bound"),
    )
    glob_exact = ev.agg(F.count_distinct("user_id").alias("ge"))
    glob = (
        per.agg(F.hll_union_agg("sk").alias("sk"))
        .crossJoin(glob_exact)  # broadcast of one scalar row
        .select(
            F.lit("ALL").alias("event_type"),
            F.col("ge").alias("exact_users"),
            (
                F.abs(F.hll_sketch_estimate("sk") - F.col("ge")) <= 0.05 * F.col("ge")
            ).alias("within_bound"),
        )
    )
    return per_est.unionByName(glob)


_GK_ACC = 10000  # percentile_approx accuracy → rank error ε = 1/acc


@op(
    "sketch_approx_quantiles",
    oracle="""
SELECT l_returnflag, CAST(COUNT(l_extendedprice) AS BIGINT) AS n,
       TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
FROM lineitem GROUP BY l_returnflag
""",
    tags=("approx",),
)
def sketch_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles of l_extendedprice per returnflag via
    percentile_approx (Greenwald-Khanna summary, accuracy {acc} →
    ε = 1/{acc} rank error, a DETERMINISTIC worst-case bound). The
    summary is mergeable like the HLL sketch, so the same
    partial/final split applies; this is what agg_percentile's
    docstring says to swap to at 100 TB.

    Oracle contract (VERDICT r3 item 2): the sketch value itself is
    engine-internal, so the op verifies the GK guarantee and publishes
    booleans — for each q, the returned value's occupied rank interval
    [cnt_lt+1, cnt_le] must intersect [(q−ε)n − 1, (q+ε)n + 1]. The
    verify pass joins the 3-row quantile table back to the scan
    (broadcast) and counts comparisons — one extra scan at test scale,
    dropped at 100 TB where the guarantee is carried by the algorithm."""
    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    pr = F.col("l_extendedprice")
    qs = li.groupBy("l_returnflag").agg(
        F.percentile_approx(pr, 0.5, _GK_ACC).alias("p50"),
        F.percentile_approx(pr, 0.95, _GK_ACC).alias("p95"),
        F.percentile_approx(pr, 0.99, _GK_ACC).alias("p99"),
    )
    j = li.join(F.broadcast(qs), "l_returnflag")
    agg = j.groupBy("l_returnflag").agg(
        # count(col), not count(*): percentile_approx ignores NULL
        # prices, so the GK rank bound must be taken over the non-null
        # population or the check falsely fails on a null-bearing
        # corpus (the oracle's n mirrors COUNT(l_extendedprice)).
        F.count(pr).alias("n"),
        *[
            c
            for q in ("p50", "p95", "p99")
            for c in (
                F.count(F.when(pr < F.col(q), 1)).alias(f"lt_{q}"),
                F.count(F.when(pr <= F.col(q), 1)).alias(f"le_{q}"),
            )
        ],
    )
    eps = 1.0 / _GK_ACC

    def ok(q: str, frac: float):
        n = F.col("n")
        return (
            (F.col(f"lt_{q}") + 1 <= F.ceil((frac + eps) * n) + 1)
            & (F.col(f"le_{q}") >= F.floor((frac - eps) * n) - 1)
        ).alias(f"{q}_ok")

    return agg.select("l_returnflag", "n", ok("p50", 0.5), ok("p95", 0.95), ok("p99", 0.99))


sketch_approx_quantiles.__doc__ = sketch_approx_quantiles.__doc__.format(acc=_GK_ACC)


# ---------------------------------------------------------------------------
# Round-4 additions: hash-sketches whose arithmetic is EXACTLY mirrored
# in the DuckDB oracle (md5 is bit-identical on both engines), so unlike
# the Datasketches ops above these get the full hash-compare gate.
# ---------------------------------------------------------------------------

_CMS_D = 4       # count-min depth (independent hash rows)
_CMS_W = 512     # count-min width (buckets per row)


def _md5_bucket(key: F.Column, seed: F.Column, width: int) -> F.Column:
    """Deterministic cross-engine hash bucket: first 8 hex chars of
    md5("<key>#<seed>") as an unsigned int, mod width. md5 is the one
    hash both Spark and DuckDB compute identically, which is what lets
    the sketch be oracle-verified instead of rows-only."""
    hx = F.substring(F.md5(F.concat_ws("#", key.cast("string"), seed.cast("string"))), 1, 8)
    return (F.conv(hx, 16, 10).cast("bigint") % width).alias("bucket")


def _sql_md5_bucket(key: str, seed: str, width: int) -> str:
    return f"(('0x' || substr(md5({key}::VARCHAR || '#' || {seed}::VARCHAR), 1, 8))::BIGINT % {width})"


@op(
    "sketch_countmin",
    oracle=f"""
WITH seeds AS (SELECT UNNEST(range({_CMS_D})) AS seed),
cms AS (
  SELECT seed, {_sql_md5_bucket("l_partkey", "seed", _CMS_W)} AS bucket,
         COUNT(*) AS cnt
  FROM lineitem CROSS JOIN seeds
  GROUP BY 1, 2
),
probe AS (SELECT p_partkey FROM part WHERE p_size = 1)
SELECT p_partkey, MIN(cnt) AS est_count
FROM probe CROSS JOIN seeds
JOIN cms ON cms.seed = seeds.seed
        AND cms.bucket = {_sql_md5_bucket("p_partkey", "seeds.seed", _CMS_W)}
GROUP BY p_partkey
""",
    tags=("approx",),
)
def sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch: d={_d} independent md5-hash rows of w={_w}
    buckets count lineitem rows per l_partkey; a key's estimate is the
    MIN over its d buckets (always >= true count; collisions only
    inflate). Probed here for every size-1 part.

    Scale: the sketch build is a map-side-combinable groupBy over
    (seed, bucket) — at most d*w = {dw} rows of state regardless of
    input size, the whole point of the sketch at 100 TB: the shuffle
    carries a fixed-size table, and daily sketches merge by adding
    counts. The probe side broadcasts the tiny sketch. The ×d row
    expansion happens map-side before the combine, so no d× shuffle.
    Oracle-exact because both engines compute identical md5 buckets."""
    seeds = spark.range(_CMS_D).select(F.col("id").alias("seed"))
    li = table(spark, sf_dir, "lineitem").select("l_partkey")
    cms = (
        li.crossJoin(F.broadcast(seeds))
        .groupBy("seed", _md5_bucket(F.col("l_partkey"), F.col("seed"), _CMS_W))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probe = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 1)
        .select("p_partkey")
        .crossJoin(F.broadcast(seeds))
        .select("p_partkey", "seed", _md5_bucket(F.col("p_partkey"), F.col("seed"), _CMS_W).alias("pbucket"))
    )
    return (
        probe.join(
            F.broadcast(cms),
            (probe["seed"] == cms["seed"]) & (F.col("pbucket") == cms["bucket"]),
        )
        .groupBy("p_partkey")
        .agg(F.min("cnt").alias("est_count"))
    )


sketch_countmin.__doc__ = sketch_countmin.__doc__.format(
    _d=_CMS_D, _w=_CMS_W, dw=_CMS_D * _CMS_W
)

_BLOOM_K = 3      # hash functions
_BLOOM_BITS = 16384  # m bits, 32-bit-packed words


@op(
    "sketch_bloom_membership",
    oracle=f"""
WITH seeds AS (SELECT UNNEST(range({_BLOOM_K})) AS seed),
pos AS (
  SELECT DISTINCT {_sql_md5_bucket("o_custkey", "seed", _BLOOM_BITS)} AS pos
  FROM (SELECT DISTINCT o_custkey FROM orders) CROSS JOIN seeds
),
bloom AS (
  SELECT pos // 32 AS word, bit_or(1::BIGINT << (pos % 32)::INTEGER) AS bits
  FROM pos GROUP BY 1
),
probe AS (
  SELECT k AS c_custkey,
         k IN (SELECT o_custkey FROM orders) AS is_member
  FROM (
    SELECT c_custkey AS k FROM customer
    UNION ALL SELECT c_custkey + 10000000 FROM customer
  )
),
checked AS (
  SELECT c_custkey, is_member,
         COUNT(*) FILTER (
           WHERE (bloom.bits & (1::BIGINT << (p.pos % 32)::INTEGER)) != 0
         ) = {_BLOOM_K} AS bloom_says
  FROM (
    SELECT c_custkey, is_member,
           {_sql_md5_bucket("c_custkey", "seed", _BLOOM_BITS)} AS pos
    FROM probe CROSS JOIN seeds
  ) p
  LEFT JOIN bloom ON bloom.word = p.pos // 32
  GROUP BY 1, 2
)
SELECT is_member, bloom_says, COUNT(*) AS n_keys
FROM checked GROUP BY 1, 2
""",
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Bloom filter built with DataFrame ops: k={k} md5 hashes
    of every ordering customer set bits in an m={m}-bit filter stored
    as 32-bit-packed words (bit_or aggregate — at most m/32 = {words} rows of
    state). Every customer key is then probed, plus a shifted twin set of
    guaranteed NON-members (custkey + 10M); output cross-tabulates true
    membership vs the filter's answer, so the row (is_member=false,
    bloom_says=true, n) IS the measured false-positive count, and the
    invariant "no false negatives" is visible as the absence of
    (true, false) rows.

    Scale: the filter is a fixed-size bit table built in one
    map-combinable pass and broadcast to the probe side — the classic
    pre-join filter that turns a 100 TB shuffle join into a local
    bit-test that discards non-matching rows at scan time. Oracle-exact:
    identical md5 bit positions on both engines."""
    seeds = spark.range(_BLOOM_K).select(F.col("id").alias("seed"))
    orders = table(spark, sf_dir, "orders").select("o_custkey").distinct()
    pos = (
        orders.crossJoin(F.broadcast(seeds))
        .select(_md5_bucket(F.col("o_custkey"), F.col("seed"), _BLOOM_BITS).alias("pos"))
        .distinct()
    )
    bloom = pos.groupBy((F.col("pos") / 32).cast("bigint").alias("word")).agg(
        F.bit_or(F.expr("shiftleft(cast(1 as bigint), cast(pos % 32 as int))")).alias("bits")
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    keys = cust.unionByName(cust.select((F.col("c_custkey") + 10_000_000).alias("c_custkey")))
    probe = keys.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select("c_custkey", F.col("o_custkey").isNotNull().alias("is_member"))
    checked = (
        probe.crossJoin(F.broadcast(seeds))
        .select(
            "c_custkey",
            "is_member",
            _md5_bucket(F.col("c_custkey"), F.col("seed"), _BLOOM_BITS).alias("pos"),
        )
        .join(F.broadcast(bloom), (F.col("pos") / 32).cast("bigint") == F.col("word"), "left")
        .groupBy("c_custkey", "is_member")
        .agg(
            (
                F.count(
                    F.when(
                        F.expr(
                            "(bits & shiftleft(cast(1 as bigint), cast(pos % 32 as int))) != 0"
                        ),
                        F.lit(1),
                    )
                )
                == _BLOOM_K
            ).alias("bloom_says")
        )
    )
    return checked.groupBy("is_member", "bloom_says").agg(F.count(F.lit(1)).alias("n_keys"))


sketch_bloom_membership.__doc__ = sketch_bloom_membership.__doc__.format(
    k=_BLOOM_K, m=_BLOOM_BITS, words=_BLOOM_BITS // 32
)
