"""Decompose dedup_ngram_jaccard's wall-clock by pipeline prefix and
A/B three exchange-1 encodings (guide §1 empirical loop, after the
first narrowing attempt measured 0.85×/0.91× — SLOWER):

variants:
  a = committed (string shingles; exchange-1 row = struct+string)
  b = hash inside the shingling transform (r11_jaccard_narrow_ab's B —
      interpreted-lambda xxhash64 per raw position, long arrays)
  c = committed string shingles, then xxhash64 AFTER the explode as a
      top-level column (WholeStageCodegen, one hash per occurrence) —
      exchange-1 row = (doc_id long, n_sh int, s long)

prefixes (noop-sinked):
  p1 = scan + repartition + shingle + explode   (the CPU pass)
  p2 = p1 + exchange-1 + bucket collect_list + df-cap filter
  p3 = full op (pair expansion + pair exchange + count + jaccard)

Usage: python tools/r11_jaccard_decompose.py [runs] [sf_dir|10x]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import _proc_stat_sample, _scale_corpus, _steal_pct
from pyspark.sql import functions as F

from lambda_hive_spark.operators.llm import _shingles, _tokens
from lambda_hive_spark.io import par_table
from lambda_hive_spark.session import get_spark
from tools.r11_jaccard_narrow_ab import _hashed_shingles, _tail

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _e(spark, sf_dir, kind: str):
    par = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if kind == "b":
        sh = par_table(spark, sf_dir, "documents").select(
            "doc_id", _hashed_shingles(_tokens()).alias("shingles")
        )
        e = sh.select(
            "doc_id", F.size("shingles").alias("n_sh"),
            F.explode("shingles").alias("s"),
        )
    else:
        sh = par_table(spark, sf_dir, "documents").select(
            "doc_id", _shingles(_tokens()).alias("shingles")
        )
        e = sh.select(
            "doc_id", F.size("shingles").alias("n_sh"),
            F.explode("shingles").alias("s"),
        )
        if kind == "c":
            e = e.select("doc_id", "n_sh", F.xxhash64("s").alias("s"))
    return e, par


def _buckets(spark, sf_dir, kind: str):
    e, par = _e(spark, sf_dir, kind)
    return (
        e.repartition(par, "s")
        .groupBy("s")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("doc_id"), F.col("n_sh").cast("long").alias("n_sh"))
                )
            ).alias("ids")
        ),
        par,
    )


def _tail_chained(buckets, par):
    """Pair expansion via chained posexplode+slice Generates (codegen)
    instead of the interpreted nested transform+flatten."""
    max_df = int(os.environ.get("SPARK_GRAFT_JACCARD_MAX_DF", "10000"))
    b = buckets.filter(F.size("ids").between(2, max_df))
    t1 = b.select("ids", F.posexplode("ids").alias("i", "a"))
    t2 = t1.select(
        "a",
        F.explode(
            F.slice("ids", F.col("i") + F.lit(2), F.size("ids") - F.col("i") - 1)
        ).alias("bb"),
    )
    pairs = (
        t2.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("bb.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("na"),
            F.col("bb.n_sh").alias("nb"),
        )
        .repartition(par, "doc_a", "doc_b")
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return pairs.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= 0.6
    )


def _full(spark, sf_dir, kind: str):
    if kind == "d":  # hashed shingles + chained-explode expansion
        buckets, par = _buckets(spark, sf_dir, "b")
        return _tail_chained(buckets, par)
    if kind == "e":  # string shingles (committed) + chained expansion
        buckets, par = _buckets(spark, sf_dir, "a")
        return _tail_chained(buckets, par)
    buckets, par = _buckets(spark, sf_dir, kind)
    return _tail(spark, sf_dir, buckets, par)


def main():
    spark = get_spark("r11_jaccard_decompose")
    sdirs = [(SF_DIR, "sf0.1")]
    if len(sys.argv) > 2 and sys.argv[2] == "10xonly":
        sdirs = [(_scale_corpus(spark, SF_DIR), "scale10")]
    elif len(sys.argv) <= 2 or sys.argv[2] == "10x":
        sdirs.append((_scale_corpus(spark, SF_DIR), "scale10"))

    builders = {
        "p1": lambda k, sd: _e(spark, sd, k)[0],
        "p2": lambda k, sd: _buckets(spark, sd, k)[0],
        "p3": lambda k, sd: _full(spark, sd, k),
    }
    kinds = {"p1": ("a", "b", "c"), "p2": ("a", "b", "c"),
             "p3": ("a", "b", "c", "d"), "p4": ("a", "b", "d", "e")}
    builders["p4"] = builders["p3"]
    prefixes = (
        tuple(sys.argv[3].split(",")) if len(sys.argv) > 3 else ("p1", "p2", "p3")
    )
    for sdir, tag in sdirs:
        for pref in prefixes:
            ks = kinds[pref]
            # warm-up every variant once
            for k in ks:
                _noop(builders[pref](k, sdir))
            med = {}
            st0 = _proc_stat_sample()
            samples = {k: [] for k in ks}
            for _ in range(RUNS):
                for k in ks:
                    t0 = time.perf_counter()
                    _noop(builders[pref](k, sdir))
                    samples[k].append(time.perf_counter() - t0)
            steal = _steal_pct(st0, _proc_stat_sample()) or 0.0
            for k in ks:
                med[k] = statistics.median(samples[k])
            print(
                f"{tag} {pref}: "
                + "  ".join(
                    f"{k}={med[k]:6.3f}" + (
                        f" ({med['a']/med[k]:4.2f}x)" if k != "a" else ""
                    )
                    for k in ks
                )
                + f"  steal {steal:.2f}%",
                flush=True,
            )
    # parity at every measured corpus
    for sdir, tag in (sdirs if os.environ.get("SPARK_GRAFT_SKIP_PARITY") != "1" else []):
        a = sorted(map(tuple, _full(spark, sdir, "a").collect()))
        for k in ("c", "d", "e"):
            v = sorted(map(tuple, _full(spark, sdir, k).collect()))
            print(f"parity a=={k} @{tag}: {'EXACT' if a == v else 'DRIFT'}")
    spark.stop()


if __name__ == "__main__":
    main()
