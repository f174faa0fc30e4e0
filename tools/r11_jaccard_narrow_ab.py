"""Round-11 A/B: narrow dedup_ngram_jaccard's shuffles (guide §2.3,
VERDICT r10 "Next round" item 1).

Committed plan (A) explodes STRING shingles and shuffles one
(struct(doc_id,n_sh), s string) row per (doc, shingle) occurrence into
the bucket groupBy — the shingle is a ~20-30 byte 3-word string plus
offsets, and the struct wrapper adds a nested-row header, so the
dominant exchange carries ~2.5x the bytes it needs to.

Variant (B) hashes each shingle to int64 with xxhash64 INSIDE the
shingling transform (before array_distinct, so the distinct and the
array materialize longs, never a string array) and flattens the
exchange row to three top-level fixed-width columns
(doc_id long, n_sh int, s long); the (doc_id, n_sh) struct for
sort_array/collect_list is built AFTER the exchange in the partial
aggregate. Downstream (pair expansion, pair count, jaccard) unchanged.

Semantics: xxhash64 is applied to DISTINCT string shingles; bucket
membership (and n_sh) equals the string form unless two distinct
shingles collide in 64 bits. Fixture scales: P(any collision)
~ n^2/2^65 < 1e-9 — the oracle gate is untouched. 100 TB: ~1e12
distinct shingles → ~3e4 colliding buckets out of 1e12 (fraction
3e-8), each perturbing ONE pair's shared count by +1 — same epsilon
class as grouping by md5 in dedup_exact, and the standard trade for
content-addressed shuffles at scale.

Protocol: INTERLEAVED pairs (A,B,A,B,...) per corpus so both variants
share VM weather; parity by sorted-row compare at sf0.1 and the 10x
scale corpus; /proc/stat steal sampled around each timing loop with
the >3% refusal gate (VERDICT r10 item 8).

Usage: python tools/r11_jaccard_narrow_ab.py [pairs]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import _proc_stat_sample, _scale_corpus, _steal_pct
from pyspark.sql import functions as F

from lambda_hive_spark.operators.llm import _docs_with_shingles, _tokens
from lambda_hive_spark.io import par_table
from lambda_hive_spark.registry import all_ops
from lambda_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
MAX_STEAL = float(os.environ.get("SPARK_GRAFT_MAX_STEAL_PCT", "3.0"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _hashed_shingles(tokens):
    """xxhash64 of each 3-word shingle, distinct over the LONGS."""
    n = F.size(tokens)
    return F.when(
        n >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - 2),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tokens, i, 3))),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def _tail(spark, sf_dir, buckets, par):
    """Shared pair-expansion + count + jaccard tail (identical in both
    variants — copied from the committed op)."""
    max_df = int(os.environ.get("SPARK_GRAFT_JACCARD_MAX_DF", "10000"))
    buckets = buckets.filter(F.size("ids").between(2, max_df))
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
    pairs = (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.na", "p.nb")
        .repartition(par, "doc_a", "doc_b")
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return pairs.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= 0.6
    )


def variant_a(spark, sf_dir):
    """Committed op (string shingles, struct+string exchange)."""
    return all_ops()["dedup_ngram_jaccard"].fn(spark, sf_dir)


def variant_b(spark, sf_dir):
    """Narrow form: hashed shingles, flat 3-column exchange."""
    par = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sh = par_table(spark, sf_dir, "documents").select(
        "doc_id", _hashed_shingles(_tokens()).alias("shingles")
    )
    e = sh.select(
        "doc_id",
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("s"),
    )
    buckets = (
        e.repartition(par, "s")
        .groupBy("s")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("doc_id"), F.col("n_sh").cast("long").alias("n_sh")
                    )
                )
            ).alias("ids")
        )
    )
    return _tail(spark, sf_dir, buckets, par)


def main():
    spark = get_spark("r11_jaccard_narrow_ab")
    s10 = _scale_corpus(spark, SF_DIR)  # default 10x tier

    for sdir, tag in ((SF_DIR, "sf0.1"), (s10, "scale10")):
        a = sorted(map(tuple, variant_a(spark, sdir).collect()))
        b = sorted(map(tuple, variant_b(spark, sdir).collect()))
        print(f"parity@{tag}: {'EXACT' if a == b else 'DRIFT'} ({len(a)} rows)",
              flush=True)

    overall_bad = False
    for sdir, tag in ((SF_DIR, "sf0.1"), (s10, "scale10")):
        # warm-up both once (plan + file-index caches)
        _noop(variant_a(spark, sdir))
        _noop(variant_b(spark, sdir))
        ta, tb = [], []
        st0 = _proc_stat_sample()
        for _ in range(PAIRS):
            t0 = time.perf_counter()
            _noop(variant_a(spark, sdir))
            t1 = time.perf_counter()
            _noop(variant_b(spark, sdir))
            t2 = time.perf_counter()
            ta.append(t1 - t0)
            tb.append(t2 - t1)
        steal = _steal_pct(st0, _proc_stat_sample()) or 0.0
        ma, mb = statistics.median(ta), statistics.median(tb)
        per_pair = " ".join(f"{x/y:4.2f}" for x, y in zip(ta, tb))
        bad = steal > MAX_STEAL
        overall_bad = overall_bad or bad
        print(
            f"{tag}: base {ma:6.3f}s  narrow {mb:6.3f}s  speedup {ma/mb:5.3f}x"
            f"  per-pair [{per_pair}]  steal {steal:.2f}%"
            f"{'  UNRELIABLE(>gate)' if bad else ''}",
            flush=True,
        )

    # plan capture for the exchange-schema claim
    plans_dir = os.path.join("/root/repo", "plans", "r11")
    os.makedirs(plans_dir, exist_ok=True)
    for fn, tag in ((variant_a, "before"), (variant_b, "after_candidate")):
        df = fn(spark, SF_DIR)
        with open(os.path.join(plans_dir, f"dedup_ngram_jaccard_{tag}.txt"), "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted")))
    spark.stop()
    if overall_bad:
        print("UNRELIABLE: steal exceeded the gate in at least one loop — "
              "re-run before recording a decision.")
        sys.exit(3)


if __name__ == "__main__":
    main()
