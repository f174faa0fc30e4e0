"""Coverage extensions beyond SURVEY.md §2's base inventory:
time-hierarchy rollups (hypertable-style continuous aggregates), a
BPE-ish regex token counter, IVF-bucketed ANN (the cluster-pruned
scale path next to the LSH variant), and the SQL-string frontend
(SURVEY.md §3 entry point 3 — same Catalyst pipeline behind a real
ANTLR parse).

Reference file:line: N/A — empty reference dir (SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lambda_hive_spark.helpers import dot, dsum, sql_dsum
from lambda_hive_spark.io import register_views, table
from lambda_hive_spark.registry import op


@op(
    "agg_time_rollup",
    oracle=f"""
SELECT CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS m,
       CAST(day(ts) AS BIGINT) AS d, CAST(hour(ts) AS BIGINT) AS h,
       COUNT(*) AS n_events, {sql_dsum("value")} AS total_value,
       CAST(grouping(year(ts)) * 8 + grouping(month(ts)) * 4
            + grouping(day(ts)) * 2 + grouping(hour(ts)) AS BIGINT) AS gid
FROM events
GROUP BY ROLLUP (year(ts), month(ts), day(ts), hour(ts))
""",
)
def agg_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: one pass produces
    hour/day/month/year/grand-total aggregates (ROLLUP plans a single
    expand+shuffle, not four scans). At 100 TB this materializes the
    continuous-aggregate hierarchy a time-series store keeps."""
    ev = table(spark, sf_dir, "events").select(
        F.year("ts").cast("bigint").alias("y"),
        F.month("ts").cast("bigint").alias("m"),
        F.dayofmonth("ts").cast("bigint").alias("d"),
        F.hour("ts").cast("bigint").alias("h"),
        "value",
    )
    return ev.rollup("y", "m", "d", "h").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
        F.grouping_id().cast("long").alias("gid"),
    )


_BPE_PAT = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


@op(
    "text_token_count",
    oracle=f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_PAT}')) AS BIGINT) AS bpe_tokens,
       CAST(CEIL(length(text) / 4.0) AS BIGINT) AS byte_estimate
FROM documents
""",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, a BPE-ish regex
    (letter runs / single digits / punctuation — the GPT-2 pre-tokenizer
    shape), and the chars/4 heuristic. All JVM regex — the budget
    gatekeeper for a 100 TB training-data pipeline."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT), 0)).cast("bigint").alias("bpe_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("byte_estimate"),
    )


N_PROBE = 3
K_NN = 5


def ivf_index(spark: SparkSession, sf_dir: str):
    """Coarse quantizer + inverted lists. Centroids = per-label mean
    vectors (10 cells, deterministic — stands in for k-means, whose
    iterations add nothing on this labeled corpus); each vector is
    assigned to its nearest cell. Returns (centroids_df, lists_df)."""
    e = table(spark, sf_dir, "embeddings")
    ex = e.select("vec_id", F.posexplode(F.col("embedding").cast("array<double>"))).withColumnsRenamed(
        {"col": "val"}
    )
    lab = e.select("vec_id", "label")
    cent = (
        ex.join(F.broadcast(lab), "vec_id")
        .groupBy("label", "pos")
        .agg(F.avg("val").alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            F.col("label").alias("cell"),
            F.transform("pc", lambda x: x.c).alias("centroid"),
        )
    )
    scored = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "embedding",
        "cell",
        dot(F.col("embedding").cast("array<double>"), F.col("centroid")).alias("cdot"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cdot").desc(), F.col("cell").asc())
    lists = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cell")
    )
    return cent, lists


def ivf_knn(spark: SparkSession, sf_dir: str, nprobe: int = N_PROBE) -> DataFrame:
    """IVF top-k: probe the `nprobe` cells nearest each query, score
    only their inverted lists. Exact within the probed candidate set
    (tests assert nprobe=all ≡ brute force)."""
    cent, lists = ivf_index(spark, sf_dir)
    q = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    qcells = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "qe",
            "cell",
            dot(F.col("qe").cast("array<double>"), F.col("centroid")).alias("cdot"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("cdot").desc(), F.col("cell").asc())
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qe", "cell")
    )
    scored = (
        lists.join(F.broadcast(qcells), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dot(F.col("qe"), F.col("embedding")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= K_NN
    )


@op("sim_knn_ivf")  # rows-only: pruning is algorithm-specific; invariants asserted in tests
def sim_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN — the cluster-pruned scale path beside the LSH variant:
    queries probe their nearest cells and score only those inverted
    lists (at 100 TB, cells are partition keys so a probe reads only
    its partitions). Same query set / output shape as sim_knn_exact.
    tests/test_extras.py asserts (a) probing every cell reproduces the
    exact result (the machinery is correct) and (b) pruned recall
    beats the probed-coverage baseline. NOTE the fixture embeddings
    are isotropic (within-label cosine ≈ cross-label ≈ 0), the
    worst case for any coarse quantizer — real embedding corpora
    cluster, which is what makes IVF pay."""
    return ivf_knn(spark, sf_dir, N_PROBE)


@op(
    "sql_frontend",
    oracle=f"""
SELECT c_mktsegment, COUNT(DISTINCT o_orderkey) AS n_orders,
       {sql_dsum("o_totalprice")} AS segment_revenue
FROM customer JOIN orders ON c_custkey = o_custkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY c_mktsegment
""",
)
def sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-string entry point: register the ten fixture views, run
    an ANSI query through Spark's ANTLR parser — parse → analyze →
    optimize → execute, same Catalyst pipeline as the DataFrame API
    (SURVEY.md §3 entry point 3)."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT c_mktsegment, COUNT(DISTINCT o_orderkey) AS n_orders,
               {sql_dsum("o_totalprice")} AS segment_revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY c_mktsegment
        """
    )
