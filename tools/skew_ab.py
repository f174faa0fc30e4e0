"""Skew A/B harness (VERDICT r6 item 3): measure, on a zipfian-hot
corpus, that (a) AQE's runtime skew-join split beats the same
shuffle join without it, and (b) the salted two-stage aggregation
(the join_skew_salted pattern) beats the naive per-key state
aggregation — and record WHY the sum/count aggs the bench already
times are skew-immune (map-side partials collapse the hot key per
partition before the shuffle).

Corpus: events replicated REPLICATE× from $SPARK_GRAFT_SF_DIR
(default sf0.1 → 10M rows), then ~HOT_FRAC of rows re-keyed onto ONE
existing user_id — the same 30%-hot shape as the `zipf` perturbation
variant (tools/perturb_corpus.py), scaled to where task-level skew
dominates wall-clock.

A/B 1 — shuffle-join skew: skewed fact ⋈ per-user dim, broadcast
disabled (the dim is small; at 100 TB it wouldn't be — forcing the
shuffle path is the point), sort-merge join. OFF: the hot user's
partition is one straggler task. ON: AQE splits the oversized
partition across tasks (plan shows `skew=true`). The thresholds are
lowered from the 256 MB default so a ~10M-row local corpus exhibits
what a 100 TB corpus hits at defaults.

A/B 2 — aggregation skew: naive `collect_set(event_id) per user`
holds the hot user's entire distinct set in ONE reducer; the salted
two-stage (group by (user, salt=hash(event_id)%16), then merge)
spreads that state 16 ways. Spark's own count_distinct is recorded
alongside: its expand plan shuffles on (user, event_id) FIRST, so it
is skew-immune by construction — the reason join_skew_salted's
docstring scopes manual salting to state-heavy aggs and pre-shuffle
hot producers.

Usage: python tools/skew_ab.py [--replicate N] [--quick]
Prints one JSON line; numbers are recorded in BASELINE.md §7.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

REPLICATE = 10
HOT_MOD, HOT_LT = 10, 3  # ~30% hot, same shape as perturb zipf
RUNS = 3


def _timed(df, runs: int = RUNS) -> float:
    times = []
    for i in range(runs + 1):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if i > 0:
            times.append(dt)
    return round(statistics.median(times), 4)


def build_corpus(spark, sf_dir: str, replicate: int):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "user_id", "value"
    )
    hot = ev.agg(F.min("user_id")).collect()[0][0]
    big = (
        ev.repartition(32)
        .withColumn("_c", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))))
        .withColumn(
            "event_id",
            F.col("event_id") + F.col("_c") * F.lit(10_000_000_000),
        )
        .withColumn(
            "user_id",
            F.when(
                F.pmod(F.xxhash64("event_id"), F.lit(HOT_MOD)) < HOT_LT, F.lit(hot)
            ).otherwise(F.col("user_id")),
        )
        .drop("_c")
    )
    scratch = os.environ.get("SPARK_GRAFT_SCRATCH", "/root/repo/.tmp")
    out = os.path.join(
        scratch, f"skew_ab_{os.path.basename(sf_dir.rstrip('/'))}_x{replicate}"
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        big.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out), hot


def main() -> None:
    replicate = REPLICATE
    if "--replicate" in sys.argv:
        replicate = int(sys.argv[sys.argv.index("--replicate") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from lambda_hive_spark.session import get_spark

    spark = get_spark("lambda_hive_spark_skew_ab")
    fact, hot = build_corpus(spark, sf_dir, replicate)
    n = fact.count()
    n_hot = fact.filter(F.col("user_id") == hot).count()

    # Materialize the dim: if it stays a groupBy over the same scan,
    # the SMJ's dim child is Sort<-HashAggregate<-ShuffleStage and AQE's
    # OptimizeSkewedJoin bails (it needs Sort directly over the shuffle
    # stage on BOTH sides) — measured on this build; a real per-user
    # dim table is a separate table anyway.
    scratch = os.environ.get("SPARK_GRAFT_SCRATCH", "/root/repo/.tmp")
    dimp = os.path.join(scratch, "skew_ab_dim")
    fact.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events")).write.mode(
        "overwrite"
    ).parquet(dimp)
    dim = spark.read.parquet(dimp)

    def shuffle_join(skew_on: bool):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        # scaled-down trigger: a 10M-row local corpus's hot partition is
        # ~tens of MB; at 100 TB the same shape trips the 256 MB default
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2MB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
        joined = fact.join(dim.hint("merge"), "user_id").select(
            F.sum(F.col("value") * F.col("n_events")).alias("s")
        )
        return joined

    res = {}
    try:
        res["join_skew_off_sec"] = _timed(shuffle_join(False))
        df_on = shuffle_join(True)
        res["join_skew_on_sec"] = _timed(df_on)
        # plan proof: the executed adaptive plan split the hot partition
        # (collect drives THIS DataFrame's QueryExecution — a write
        # would execute a clone and report isFinalPlan=false)
        df_on.collect()
        plan = df_on._jdf.queryExecution().executedPlan().toString()
        res["join_skew_plan_flag"] = "skew=true" in plan
    finally:
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        ):
            spark.conf.unset(k)

    naive = fact.groupBy("user_id").agg(
        F.size(F.collect_set("event_id")).cast("long").alias("nd")
    )
    salted = (
        fact.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
        .groupBy("user_id", "salt")
        .agg(F.size(F.collect_set("event_id")).cast("long").alias("pnd"))
        .groupBy("user_id")
        .agg(F.sum("pnd").alias("nd"))
    )
    builtin = fact.groupBy("user_id").agg(F.count_distinct("event_id").alias("nd"))
    # value parity first: salting must not change the answer
    drift = (
        naive.exceptAll(salted).unionAll(salted.exceptAll(naive)).count()
        + naive.exceptAll(builtin).unionAll(builtin.exceptAll(naive)).count()
    )
    assert drift == 0, "salted/builtin distinct counts diverged from naive"
    res["agg_naive_collect_set_sec"] = _timed(naive)
    res["agg_salted_two_stage_sec"] = _timed(salted)
    res["agg_builtin_count_distinct_sec"] = _timed(builtin)

    res.update(
        {
            "rows": n,
            "hot_rows": n_hot,
            "hot_frac": round(n_hot / n, 4),
            "replicate": replicate,
            "runs": RUNS,
        }
    )
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
