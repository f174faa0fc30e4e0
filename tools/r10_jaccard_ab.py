"""Round-10 A/B: dedup_ngram_jaccard pair-count shuffle.

Committed plan repartitions the expanded pairs by (doc_a, doc_b) and
lets groupBy reuse that partitioning — which places partial_count
ABOVE the exchange (plans/r10/dedup_ngram_jaccard_before.txt nodes
13-15): the shuffle carries one RAW row per shared shingle and the
partial/final pair degenerates to a same-stage no-op. Variant drops
the explicit repartition so Catalyst plans the canonical partial →
exchange → final: the map-side combine collapses each (pair) to one
row per map task BEFORE the shuffle (guide §2.3 "aggregate before you
shuffle"). The expansion stage's parallelism is unchanged (it is set
by the FIRST repartition on the shingle key); only the tiny final
count stage can be AQE-coalesced, which is free.

Parity gate: sorted-row compare at sf0.1 and the 10× scale corpus
(the tier where pair work is 9× — real duplicates).

Usage: python tools/r10_jaccard_ab.py [runs]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import _scale_corpus
from pyspark.sql import functions as F

from lambda_hive_spark.operators.llm import _docs_with_shingles
from lambda_hive_spark.registry import all_ops
from lambda_hive_spark.session import get_spark
from lambda_hive_spark.testing import duck_connection

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def _med(fn, runs=RUNS):
    times = []
    for i in range(runs + 1):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        if i:
            times.append(dt)
    return statistics.median(times)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def variant(spark, sf_dir, explicit_repartition: bool):
    par = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    max_df = int(os.environ.get("SPARK_GRAFT_JACCARD_MAX_DF", "10000"))
    sh = _docs_with_shingles(spark, sf_dir)
    e = sh.select(
        F.struct(F.col("doc_id"), F.size("shingles").cast("long").alias("n_sh")).alias("d"),
        F.explode("shingles").alias("s"),
    )
    buckets = (
        e.repartition(par, "s")
        .groupBy("s")
        .agg(F.sort_array(F.collect_list("d")).alias("ids"))
        .filter(F.size("ids").between(2, max_df))
    )
    n = F.size("ids")
    pair_arr = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice("ids", i + F.lit(2), n - i - 1),
                lambda y: F.struct(
                    x["doc_id"].alias("doc_a"),
                    y["doc_id"].alias("doc_b"),
                    x["n_sh"].alias("na"),
                    y["n_sh"].alias("nb"),
                ),
            ),
        )
    )
    exploded = (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.na", "p.nb")
    )
    if explicit_repartition:
        exploded = exploded.repartition(par, "doc_a", "doc_b")
    pairs = exploded.groupBy("doc_a", "doc_b", "na", "nb").agg(
        F.count(F.lit(1)).alias("shared")
    )
    jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return pairs.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= 0.6
    )


def main():
    spark = get_spark("r10_jaccard_ab")
    ops = all_ops()
    s10 = _scale_corpus(spark, SF_DIR)  # default 10x tier
    for sdir, tag in ((SF_DIR, "sf0.1"), (s10, "scale10")):
        a = sorted(map(tuple, variant(spark, sdir, True).collect()))
        b = sorted(map(tuple, variant(spark, sdir, False).collect()))
        print(f"parity@{tag}: {'EXACT' if a == b else 'DRIFT'}", flush=True)
    con = duck_connection(SF_DIR)
    for sdir, tag in ((SF_DIR, "sf0.1"), (s10, "scale10")):
        cur = _med(lambda: _noop(variant(spark, sdir, True)))
        new = _med(lambda: _noop(variant(spark, sdir, False)))
        print(f"{tag}: repartition {cur:6.3f}s  combine {new:6.3f}s  speedup {cur/new:5.3f}x", flush=True)
    duck = _med(lambda: con.execute(ops["dedup_ngram_jaccard"].oracle).fetchall(), 3)
    print(f"duckdb@sf0.1 {duck:6.3f}s")
    pf = variant(spark, SF_DIR, False)._jdf.queryExecution().executedPlan().toString()
    import re
    print("combine-variant exchanges:", len(re.findall(r"Exchange hash", pf)),
          "partial_count below pair exchange:", "partial_count" in pf.split("Exchange hashpartitioning(doc_a")[0] if "Exchange hashpartitioning(doc_a" in pf else "n/a")
    spark.stop()


if __name__ == "__main__":
    main()
