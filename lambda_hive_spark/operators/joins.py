"""Join operators (SURVEY.md §2.3).

Scale notes per strategy:
- Equi joins on fact tables shuffle both sides on the key; AQE picks
  shuffled-hash vs sort-merge and splits skewed partitions at runtime.
- Dimension joins use explicit `broadcast()` hints — region/nation/
  supplier/part stay broadcast-able at any sf because their size is
  bounded by the real world (BROADCAST_DIMS in io.py).
- Theta/band joins plan as BroadcastNestedLoopJoin — only ever used
  with a bounded (broadcastable) side; the band join documents the
  bucketed prefilter that makes it linear at 100 TB.
- The as-of join is the classic union+window trick: one shuffle on
  (user_id), no per-row Python, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lambda_hive_spark.helpers import dsum, hier_exact_agg, sql_dsum
from lambda_hive_spark.io import table
from lambda_hive_spark.registry import op


@op(
    "join_inner_hash",
    oracle="""
SELECT o.o_orderkey, c.c_name, c.c_mktsegment, o.o_totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderstatus = 'O'
""",
)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders⋈customer; Catalyst/AQE pick the physical
    strategy (shuffled hash at this size ratio)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@op(
    "join_broadcast",
    oracle="""
SELECT n.n_name, COUNT(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast of a bounded dimension (nation, 25 rows at every sf) —
    zero shuffle on the fact side; plan-asserted BroadcastHashJoin."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@op(
    "join_left",
    oracle="""
SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
FROM customer c LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_orderpriority = '1-URGENT'
GROUP BY c.c_custkey
""",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero urgent orders
    (COUNT(col) skips the null-extended rows on both engines)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@op(
    "join_right",
    oracle="""
SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0
""",
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join — customers kept even when no qualifying order."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(
        c, (o.o_custkey == c.c_custkey) & (o.o_totalprice > 400000.0), "right"
    ).select("c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice")


_REV95 = f"SELECT o_custkey, {sql_dsum('o_totalprice')} AS rev FROM orders WHERE year(o_orderdate) = 1995 GROUP BY o_custkey"
_REV96 = f"SELECT o_custkey, {sql_dsum('o_totalprice')} AS rev FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey"


@op(
    "join_full",
    oracle=f"""
SELECT coalesce(a.o_custkey, b.o_custkey) AS custkey, a.rev AS rev_1995, b.rev AS rev_1996
FROM ({_REV95}) a FULL OUTER JOIN ({_REV96}) b ON a.o_custkey = b.o_custkey
""",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-customer revenue in two years."""

    def rev(year: int) -> DataFrame:
        return (
            table(spark, sf_dir, "orders")
            .filter(F.year("o_orderdate") == year)
            .groupBy("o_custkey")
            .agg(dsum("o_totalprice").alias("rev"))
        )

    a, b = rev(1995).alias("a"), rev(1996).alias("b")
    return a.join(b, F.col("a.o_custkey") == F.col("b.o_custkey"), "full").select(
        F.coalesce(F.col("a.o_custkey"), F.col("b.o_custkey")).alias("custkey"),
        F.col("a.rev").alias("rev_1995"),
        F.col("b.rev").alias("rev_1996"),
    )


@op(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS via left-semi join — no duplication of the left side."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@op(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS via left-anti join."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@op(
    "join_cross",
    oracle="SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — bounded inputs only (5×25 here)."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@op(
    "join_theta",
    oracle="""
SELECT s1.s_suppkey AS richer, s2.s_suppkey AS poorer
FROM supplier s1 JOIN supplier s2
  ON s1.s_acctbal > s2.s_acctbal AND s1.s_nationkey <> s2.s_nationkey
""",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure non-equi join → BroadcastNestedLoopJoin; supplier is a
    bounded dimension, so the broadcast is safe at any sf."""
    s1 = table(spark, sf_dir, "supplier").alias("s1")
    s2 = table(spark, sf_dir, "supplier").alias("s2")
    return s1.join(
        F.broadcast(s2),
        (F.col("s1.s_acctbal") > F.col("s2.s_acctbal"))
        & (F.col("s1.s_nationkey") != F.col("s2.s_nationkey")),
    ).select(F.col("s1.s_suppkey").alias("richer"), F.col("s2.s_suppkey").alias("poorer"))


@op(
    "join_range",
    oracle="""
SELECT p.p_partkey, COUNT(s.s_suppkey) AS n_band_suppliers
FROM part p LEFT JOIN supplier s
  ON s.s_acctbal BETWEEN p.p_retailprice - 50.0 AND p.p_retailprice + 50.0
GROUP BY p.p_partkey
""",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join (interval containment). Here supplier broadcasts; at
    100 TB with two fact tables, prefilter by bucketing both sides on
    floor(value/band_width) and equi-joining adjacent buckets to keep
    the nested-loop local to a bucket."""
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    cond = F.col("s_acctbal").between(
        F.col("p_retailprice") - 50.0, F.col("p_retailprice") + 50.0
    )
    return (
        p.join(F.broadcast(s), cond, "left")
        .groupBy("p_partkey")
        .agg(F.count("s_suppkey").alias("n_band_suppliers"))
    )


@op(
    "join_asof",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts, MAX(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.value AS purchase_value, c.click_value AS last_click_value
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND c.ts <= p.ts
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click value by the
    same user at-or-before its timestamp. Spark has no native batch
    as-of, so: union both sides tagged, window last(ignorenulls) per
    user ordered by (ts, tag) — clicks sort before purchases at equal
    ts, making the join inclusive. One shuffle on user_id; state is
    O(1) per row. DuckDB oracle uses its native ASOF JOIN.

    The carried payload is a STRUCT wrapping the click row, not the
    bare value: as-of semantics pick the latest click ROW (whose value
    may itself be NULL), and the struct is non-null for every click
    row, so last(ignorenulls) lands on the right row instead of
    skipping back to an older click with a non-null value.
    """
    ev = table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
        .select("user_id", "ts", F.lit(0).alias("tag"),
                F.struct(F.col("click_value")).alias("click_row"),
                F.lit(None).cast("long").alias("event_id"),
                F.lit(None).cast("double").alias("purchase_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("tag"),
        F.lit(None).cast("struct<click_value:double>").alias("click_row"),
        "event_id", F.col("value").alias("purchase_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "last_click_value",
        F.last("click_row", ignorenulls=True).over(w).getField("click_value"),
    )
    return merged.filter(F.col("tag") == 1).select(
        "event_id", "user_id", "purchase_value", "last_click_value"
    )


@op(
    "join_multiway",
    oracle=f"""
SELECT r.r_name, n.n_name, {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY r.r_name, n.n_name
""",
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table star join (TPC-H-Q5 shape): broadcast the bounded dims
    (region, nation), shuffle-join the facts, aggregate down. The fact
    join keys are uniform (orderkey), so no salting needed; AQE would
    split stragglers anyway.

    Fact sides carry a SIZE-AWARE shuffle-hash hint: when a fact
    table's real on-disk footprint exceeds the broadcast threshold,
    Spark's post-filter size estimate can still land under it and AQE
    then broadcasts a multi-million-row side — a single-threaded
    driver HashedRelation build that cost 12.4 s vs 5.6 s shuffle-hash
    at the scale100 tier (the build repeats on every execution). The
    hint only engages above the threshold, so sub-threshold fixtures
    keep the genuinely-faster broadcast plan; at 100 TB the facts are
    always above it, which is exactly the declaration the hint makes.
    Output is join-strategy-independent (restamp-proven).

    r10 adjudication: the single-level try_sum rewrite (one fewer
    aggregate pass and Exchange) measured 1.14× at sf0.1 / 1.20× at
    the 100× tier (tools/r10_flat_agg_ab.py, parity EXACT) but was
    NOT adopted: the ~25 (region, nation) groups are corpus-sized, so
    the int64 group-total bound (9.2e12 value units) overflows at a
    100 TB corpus — same adjudication as agg_hash (see its docstring
    and BASELINE §7 addendum 18). The partition-bounded two-level
    hier_exact_agg stays."""
    from lambda_hive_spark.io import table_bytes
    from lambda_hive_spark.session import _BROADCAST_THRESHOLD

    threshold = int(_BROADCAST_THRESHOLD)
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem")
    if table_bytes(sf_dir, "orders") > threshold:
        o = o.hint("shuffle_hash")
    if table_bytes(sf_dir, "customer") > threshold:
        c = c.hint("shuffle_hash")
    revenue = "l_extendedprice * (1 - l_discount)"
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return hier_exact_agg(joined, ["r_name", "n_name"], sums=[("revenue", revenue)])


@op(
    "join_lateral_topn",
    oracle="""
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
) t
""",
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join: the top-2 customers by balance FOR
    EACH nation, written as a per-row dependent subquery — the SQL
    shape analysts reach for before discovering window functions, and
    a real parser/planner feature (Spark plans it as a lateral join,
    then rewrites the correlated ORDER+LIMIT into a partitioned rank
    filter rather than executing the subquery per driving row).

    Scale: Catalyst decorrelates it — the plan is a row_number rank
    filter partitioned on the correlation key plus a broadcast join,
    never a per-driving-row subquery execution and never a cartesian.
    Measured caveat vs the explicit window form (win_topk_per_group):
    decorrelation keeps the subquery's global ORDER BY as a range-sort
    stage and does not plan WindowGroupLimit, so the sugar costs one
    extra exchange — at 100 TB write the window form directly; this op
    documents that exact trade. Deterministic tie-break on c_custkey."""
    from lambda_hive_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation n,
        LATERAL (
          SELECT c_name, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) t
        """
    )


@op(
    "join_null_safe",
    oracle="""
WITH l AS (
  SELECT event_id, nullif(props ->> '$.k', '3') AS k
  FROM events
),
r AS (
  SELECT nullif(CAST(n % 7 AS VARCHAR), '3') AS k,
         CAST(SUM(n) AS BIGINT) AS r_sum
  FROM (SELECT unnest(generate_series(0, 13)) AS n)
  GROUP BY 1
)
SELECT l.event_id, l.k, r.r_sum
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
""",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of silently dropping — the semantics
    you need when NULL is a real category (e.g. "no referrer") rather
    than unknown. One key value is nulled on both sides to prove the
    NULL↔NULL rows survive.

    Scale: Spark plans <=> as an ordinary hash join on the
    null-wrapped key (EqualNullSafe is a valid equi-join predicate, so
    no fallback to nested-loop) — same shuffle cost as `=`; here the
    7-row build side broadcasts."""
    ev = table(spark, sf_dir, "events")
    l = ev.select(
        "event_id",
        F.nullif(
            F.get_json_object("props", "$.k"), F.lit("3")
        ).alias("k"),
    )
    r = (
        spark.range(0, 14)
        .select(F.nullif((F.col("id") % 7).cast("string"), F.lit("3")).alias("k"), "id")
        .groupBy("k")
        .agg(F.sum("id").cast("bigint").alias("r_sum"))
    )
    return l.join(F.broadcast(r), l["k"].eqNullSafe(r["k"])).select(
        "event_id", l["k"].alias("k"), "r_sum"
    )


@op(
    "join_shuffle_hash_hint",
    oracle="""
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit join-strategy control: the SHUFFLE_HASH hint forces a
    shuffled hash join where Catalyst would default to sort-merge —
    the right call when one side is much smaller than the other but
    too big to broadcast (hash-building the small side beats sorting
    BOTH sides; no spill-safe sort needed). Strategy choice is
    plan-asserted in tests; results are identical by construction,
    which is exactly what the oracle certifies."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").hint("shuffle_hash")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@op(
    "join_runtime_bloom",
    oracle=f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_totalprice > 450000
GROUP BY o_orderpriority
""",
)
def join_runtime_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning: a selective predicate on the
    dimension side is compiled at runtime into a bloom filter
    (`might_contain(xxhash64(l_orderkey))`) applied to the fact scan
    BEFORE its shuffle. This is THE mechanism for the 100 TB case the
    broadcast join can't reach — dimension too large to broadcast but
    its filtered keys selective — where it removes most fact rows from
    the shuffle for the cost of one small subquery. Injection
    (`InjectRuntimeFilter`) requires a shuffle join, so broadcast is
    disabled while the plan resolves and restored immediately after
    (the resolved physical plan is cached on the returned DataFrame;
    might_contain presence is plan-asserted in tests). The oracle is
    the plain join — bloom false positives only ever ADD rows the join
    itself then drops, so results are bit-identical by construction."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
        l = table(spark, sf_dir, "lineitem")
        out = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            )
        )
        # Force logical optimization + physical planning NOW, while the
        # injection confs are live; the plan is cached on this Dataset.
        out._jdf.queryExecution().executedPlan()
        return out
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
