"""Full-text retrieval operators over the `documents` corpus: BM25
ranking, boolean (AND) search, and exact phrase search — the query
side of the inverted-index/TF-IDF family in llm.py.

Scale design (100 TB):
- The query set is BOUNDED (a broadcast literal frame); every op
  prunes the exploded token stream with a broadcast join on query
  terms BEFORE any shuffle, so the aggregated state is proportional
  to matching postings, never the corpus vocabulary.
- BM25's df/idf statistics are computed only for query terms (a
  per-term scalar frame, broadcast back), not the full vocabulary —
  the full-vocabulary statistics build lives in text_inverted_index.
- Top-k per query compiles to WindowGroupLimit (rank-limit pushdown),
  so each partition retains k rows per query before the final merge.
- Float parity with the DuckDB oracle follows the graded text_tf_idf
  idiom: transcendentals (ln) rounded to 6 decimals, per-row products
  left as deterministic IEEE doubles, and the per-(query, doc) SUM
  accumulated through decimal (order-independent, helpers.dsum).

Reference file:line: N/A — empty reference dir (SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lambda_hive_spark.helpers import dsum
from lambda_hive_spark.io import table
from lambda_hive_spark.registry import op

# Fixed query workload: terms drawn from the synthetic corpus
# vocabulary (TESTDATA.md) so every query has real matches at any sf.
_QUERIES: tuple[tuple[str, str], ...] = (
    ("q_spark", "spark query fast"),
    ("q_window", "window merge batch"),
    ("q_vector", "vector data stream"),
)
_K1, _B, _TOPK = 1.2, 0.75, 10

_QUERY_VALUES = ", ".join(
    f"('{qid}', '{term}')" for qid, text in _QUERIES for term in text.split(" ")
)


def _query_terms(spark: SparkSession) -> DataFrame:
    rows = [(qid, term) for qid, text in _QUERIES for term in text.split(" ")]
    return spark.createDataFrame(rows, "query_id string, term string")


_BM25_ORACLE = f"""
WITH q(query_id, term) AS (VALUES {_QUERY_VALUES}),
lens AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
),
corpus AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(dl) / COUNT(*) AS avgdl
  FROM lens
),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT term, doc_id, COUNT(*) AS tf
  FROM tok
  WHERE term IN (SELECT DISTINCT term FROM q)
  GROUP BY term, doc_id
),
dfq AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
),
scored AS (
  SELECT q.query_id, tf.doc_id,
         CAST(SUM(CAST(
           round(ln((corpus.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0), 6)
           * (CAST(tf.tf AS DOUBLE) * 2.2)
           / (CAST(tf.tf AS DOUBLE)
              + 1.2 * (1.0 - 0.75 + 0.75 * CAST(lens.dl AS DOUBLE) / corpus.avgdl))
         AS DECIMAL(18,6))) AS DOUBLE) AS score
  FROM tf
  JOIN dfq USING (term)
  JOIN lens USING (doc_id)
  JOIN q ON q.term = tf.term
  CROSS JOIN corpus
  GROUP BY q.query_id, tf.doc_id
)
SELECT query_id, doc_id, CAST(rn AS INT) AS rnk, score
FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rn
  FROM scored
)
WHERE rn <= {_TOPK}
"""


@op("text_bm25_topk", oracle=_BM25_ORACLE)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{k} per query (Okapi, k1=1.2, b=0.75): the standard
    lexical ranker of every retrieval/RAG pipeline. One exploded token
    scan, pruned to query terms by a broadcast join BEFORE the tf
    aggregation (the shuffle carries only matching postings); df/idf
    is a per-query-term scalar frame broadcast back onto the postings;
    the per-(query, doc) score sum goes through decimal (dsum) so
    Spark's partial aggregation order cannot perturb the hash; top-k
    is a rank-limited window (WindowGroupLimit at scale).

    Corpus statistics (N, avgdl) are two exact-integer scalars fetched
    once at plan time — both engines derive avgdl as the same IEEE
    division of exact BIGINT sum/count.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))

    n_docs, sum_dl = toks.agg(
        F.count(F.lit(1)), F.sum(F.size("toks"))
    ).first()
    avgdl = sum_dl / n_docs  # exact ints -> one IEEE division, both engines

    qterms = _query_terms(spark)
    terms = qterms.select("term").distinct()

    tok = toks.select(
        "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
    )
    tf = (
        tok.join(F.broadcast(terms), "term")
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))

    idf = F.round(
        F.log(
            (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        ),
        6,
    )
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    term_score = (
        idf
        * (tfd * F.lit(2.2))
        / (tfd + F.lit(1.2) * (F.lit(1.0) - F.lit(0.75) + F.lit(0.75) * dld / F.lit(avgdl)))
    )

    scored = (
        tf.join(F.broadcast(dfq), "term")
        .join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(dsum(term_score).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select("query_id", "doc_id", F.col("rn").cast("int").alias("rnk"), "score")
    )


_BOOLEAN_ORACLE = f"""
WITH q(query_id, term) AS (VALUES {_QUERY_VALUES}),
qsize AS (SELECT query_id, COUNT(*) AS n_terms FROM q GROUP BY query_id),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
hit AS (
  SELECT q.query_id, tok.doc_id, q.term, COUNT(*) AS tf
  FROM tok JOIN q ON q.term = tok.term
  GROUP BY q.query_id, tok.doc_id, q.term
),
agg AS (
  SELECT query_id, doc_id,
         CAST(COUNT(*) AS BIGINT) AS matched_terms,
         CAST(SUM(tf) AS BIGINT) AS total_tf
  FROM hit GROUP BY query_id, doc_id
)
SELECT a.query_id, a.doc_id, a.total_tf
FROM agg a JOIN qsize s USING (query_id)
WHERE a.matched_terms = s.n_terms
"""


@op("text_boolean_search", oracle=_BOOLEAN_ORACLE)
def text_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) keyword search: documents containing EVERY
    term of the query, with the summed term frequency as a tie-breaking
    relevance hint. Pure integer semantics — no float anywhere. The
    exploded scan is pruned by a broadcast join on the bounded query
    term set; match = per-(query, doc) distinct-term count equal to
    the query's term count (a broadcast scalar per query). At 100 TB
    the shuffled state is one row per (query, matching doc, term) —
    proportional to postings of query terms only."""
    d = table(spark, sf_dir, "documents")
    qterms = _query_terms(spark)
    qsize = qterms.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))

    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
    hit = (
        tok.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    agg = hit.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("matched_terms"),
        F.sum("tf").cast("long").alias("total_tf"),
    )
    return (
        agg.join(F.broadcast(qsize), "query_id")
        .filter(F.col("matched_terms") == F.col("n_terms"))
        .select("query_id", "doc_id", "total_tf")
    )


# Two-word phrases over the same corpus vocabulary.
_PHRASES: tuple[tuple[str, str, str], ...] = (
    ("p_fast_table", "fast", "table"),
    ("p_data_stream", "data", "stream"),
    ("p_merge_batch", "merge", "batch"),
)

_PHRASE_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{pid}' AS phrase_id, doc_id,
       CAST(len(list_filter(range(1, len(toks)),
            i -> toks[i] = '{w1}' AND toks[i+1] = '{w2}')) AS BIGINT) AS n_occ
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
WHERE len(list_filter(range(1, len(toks)),
          i -> toks[i] = '{w1}' AND toks[i+1] = '{w2}')) > 0
"""
    for pid, w1, w2 in _PHRASES
)


@op("text_phrase_search", oracle=_PHRASE_ORACLE)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact adjacent-bigram phrase search: for each two-word phrase,
    the documents containing the words consecutively, with occurrence
    counts. Entirely JVM higher-order functions over the token array
    (no explode, no shuffle at all until nothing — the op is a scan +
    filter; at 100 TB it is embarrassingly parallel and pushes the
    projection of `text` only). Positions are 1-indexed on both
    engines (element_at / DuckDB list indexing); sub-2-token documents
    short-circuit the when() guard because Spark's sequence(1, 0)
    counts DOWN rather than producing an empty array."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    n = F.size("toks")

    parts = []
    for pid, w1, w2 in _PHRASES:
        occ = F.when(
            n >= 2,
            F.size(
                F.filter(
                    F.sequence(F.lit(1), n - 1),
                    lambda i: (F.element_at("toks", i) == w1)
                    & (F.element_at("toks", i + F.lit(1)) == w2),
                )
            ),
        ).otherwise(F.lit(0))
        parts.append(
            toks.select(
                F.lit(pid).alias("phrase_id"),
                "doc_id",
                occ.cast("long").alias("n_occ"),
            ).filter(F.col("n_occ") > 0)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
