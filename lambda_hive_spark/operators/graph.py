"""Graph operators over the near-duplicate pair graph (SURVEY.md
§2.12, round 3): node degrees and triangle counting. Together with
dedup_clusters (connected components, llm.py) these cover the graph
shapes a dedup pipeline actually consults: degree → which docs are
template-spam hubs; triangles → how clique-like (vs chain-like) the
duplicate clusters are, i.e. whether transitive dedup is safe.

Edges come from dedup_ngram_jaccard (exact J ≥ 0.6 pairs), so these
ops also demonstrate operator composition: a registered op's DataFrame
feeds another plan without materialization boundaries.

Reference file:line: N/A — empty reference dir (SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_hive_spark.operators.llm import _SQL_SHINGLES, dedup_ngram_jaccard
from lambda_hive_spark.registry import op

# Shared oracle prefix: the exact-Jaccard pair graph (doc_a < doc_b),
# same construction as _JACCARD_ORACLE / _CLUSTERS_ORACLE in llm.py.
_SQL_SIM_EDGES = f"""
sh AS (SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents),
e AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
sim AS (
  SELECT p.doc_a, p.doc_b
  FROM pairs p JOIN sh x ON x.doc_id = p.doc_a JOIN sh y ON y.doc_id = p.doc_b
  WHERE (p.shared / (len(x.shingles) + len(y.shingles) - p.shared)) >= 0.6
)"""


def _sim_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge list (doc_a < doc_b), materialized once via localCheckpoint
    — the graph ops traverse it 2-3×, and at 100 TB you'd persist the
    edge list rather than re-derive the Jaccard join per traversal."""
    return (
        dedup_ngram_jaccard(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )


@op(
    "graph_degree",
    oracle=f"""
WITH {_SQL_SIM_EDGES},
edges AS (SELECT doc_a AS u FROM sim UNION ALL SELECT doc_b FROM sim)
SELECT u AS doc_id, CAST(COUNT(*) AS BIGINT) AS degree
FROM edges GROUP BY u
""",
)
def graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node degree in the near-dup graph — the hub report (a doc
    near-duplicating hundreds of others is template spam; its whole
    neighborhood usually drops together). Undirected degree = count
    over the symmetrized edge list: one explode-free union + groupBy,
    output O(#nodes). Degree is also the quantity the 100 TB triangle
    count orders by (see graph_triangles)."""
    p = _sim_pairs(spark, sf_dir)
    both = p.select(F.col("doc_a").alias("doc_id")).unionByName(
        p.select(F.col("doc_b").alias("doc_id"))
    )
    return both.groupBy("doc_id").agg(F.count(F.lit(1)).alias("degree"))


@op(
    "graph_triangles",
    oracle=f"""
WITH {_SQL_SIM_EDGES}
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM sim e1
JOIN sim e2 ON e2.doc_a = e1.doc_a AND e2.doc_b > e1.doc_b
JOIN sim e3 ON e3.doc_a = e1.doc_b AND e3.doc_b = e2.doc_b
""",
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count: with edges kept (doc_a < doc_b), a
    triangle a<b<c is exactly one wedge (a,b)+(a,c), b<c, closed by
    edge (b,c) — each triangle counted once, no orientation dedup
    needed. Two equi-joins on node ids; the wedge fan-out is
    Σ deg(v)², so the 100 TB refinement is orienting edges from
    low-degree to HIGH-degree endpoints first (not by id), which
    bounds the expansion at O(m^1.5) regardless of hubs — noted here,
    unneeded at fixture degrees (max deg 4). Clique-heavy duplicate
    clusters → high triangle density → transitive 'keep one per
    component' dedup is safe; chain-like → it over-merges."""
    p = _sim_pairs(spark, sf_dir)
    e1 = p.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = p.select(F.col("doc_a").alias("a2"), F.col("doc_b").alias("c"))
    e3 = p.select(F.col("doc_a").alias("b3"), F.col("doc_b").alias("c3"))
    wedges = e1.join(e2, (F.col("a") == F.col("a2")) & (F.col("c") > F.col("b")))
    tri = wedges.join(
        e3, (F.col("b3") == F.col("b")) & (F.col("c3") == F.col("c"))
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))
