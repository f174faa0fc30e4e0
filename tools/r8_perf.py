"""Round-8 perf experiments at the scale100 corpus (VERDICT r7 items 3-5).

Four studies, each printing one labeled line per timing so the adopt-or-
reject record lands in BASELINE.md verbatim:

1. agg_pivot interleaved A/B vs DuckDB (settle the r6->r7 0.48->0.82 s
   sample regression: same-session alternation removes VM weather).
2. distinct_rows hash-first probe: is xxhash64-of-3-cols distinct any
   faster than the value distinct? If the HASH-ONLY lower bound (no
   collision resolution at all) is not faster, every complete two-phase
   scheme loses and the 6.4x floor stands as engine constant.
3. agg_partial_final variants: current hier_exact_agg (2-level micros)
   vs single-level long-micros try_sum vs direct decimal sum.
4. join_multiway three-way: as-committed (size-aware SHJ) vs the same
   star with runtime bloom injection from the filtered orders side vs
   DuckDB.

Usage: python tools/r8_perf.py [study ...]   (default: all)
NEVER run concurrently with another sweep/bench (shared scratch).
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import os

from bench import SCALE100_SHIFT_GROUPS, SCALE100_TABLES, _scale_corpus

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F  # noqa: E402

from lambda_hive_spark.io import table  # noqa: E402
from lambda_hive_spark.registry import all_ops  # noqa: E402
from lambda_hive_spark.session import get_spark  # noqa: E402
from lambda_hive_spark.testing import duck_connection  # noqa: E402

STUDIES = set(sys.argv[1:] or ["pivot", "distinct", "partial", "bloom"])


def _med(fn, runs=3):
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


def main():
    spark = get_spark("r8_perf")
    ops = all_ops()
    s100 = _scale_corpus(spark, SF_DIR, "scale100", SCALE100_TABLES, SCALE100_SHIFT_GROUPS)
    con = duck_connection(s100)

    if "pivot" in STUDIES:
        # interleaved alternation: S D S D ... (6 pairs after 1 warm-up
        # each) — the addendum-10 method that separated VM weather from
        # real regressions for the headline set
        op_ = ops["agg_pivot"]
        op_.fn(spark, s100).write.format("noop").mode("overwrite").save()
        con.execute(op_.oracle).fetchall()
        s_times, d_times = [], []
        for _ in range(6):
            t0 = time.perf_counter()
            _noop(op_.fn(spark, s100))
            s_times.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            con.execute(op_.oracle).fetchall()
            d_times.append(time.perf_counter() - t0)
        sm, dm = statistics.median(s_times), statistics.median(d_times)
        print(f"pivot.interleaved spark_runs={[round(x,3) for x in s_times]}")
        print(f"pivot.interleaved duck_runs ={[round(x,3) for x in d_times]}")
        print(f"pivot.interleaved spark_med={sm:.3f} duck_med={dm:.3f} ratio={sm/dm:.2f}")

    if "distinct" in STUDIES:
        li = table(spark, s100, "lineitem")
        cols = ["l_returnflag", "l_linestatus", "l_shipdate"]
        cur = _med(lambda: _noop(li.select(*cols).distinct()))
        print(f"distinct.value_distinct    {cur:7.3f} s  (committed plan)")
        hash_only = _med(
            lambda: _noop(li.select(F.xxhash64(*cols).alias("h")).distinct())
        )
        print(f"distinct.hash_only_lb      {hash_only:7.3f} s  (no collision resolution — "
              "lower bound of ANY hash-first scheme)")
        # the complete two-phase realization: group on the hash,
        # collect_set(struct) resolves collisions exactly, explode —
        # measured 2026-08-16: 3.66 s vs 1.76 s value distinct (2x
        # SLOWER: the set insert re-hashes and re-compares the struct
        # per row on top of the long-key probe). REJECTED; with the
        # hash-only lower bound itself at 3.4x DuckDB, no hash-first
        # scheme can close the gap — the committed partial+final
        # distinct stands as the engine-constant floor.
        two = (li.select(F.xxhash64(*cols).alias("h"), F.struct(*cols).alias("s"))
                 .groupBy("h").agg(F.collect_set("s").alias("ss"))
                 .select(F.explode("ss").alias("s")).select("s.*"))
        tp = _med(lambda: _noop(two))
        print(f"distinct.two_phase_full    {tp:7.3f} s  (collect_set collision resolution)")
        duck = _med(lambda: con.execute(ops["distinct_rows"].oracle).fetchall())
        print(f"distinct.duckdb            {duck:7.3f} s  ratio_cur={cur/duck:.2f}")

    if "partial" in STUDIES:
        from lambda_hive_spark.helpers import dsum, hier_exact_agg

        li = table(spark, s100, "lineitem")
        cur = _med(lambda: _noop(hier_exact_agg(
            li, ["l_suppkey"], sums=[("total_qty", "l_quantity")], count_star="n_items")))
        print(f"partial.hier_2level        {cur:7.3f} s  (committed plan)")

        # single-level long micros: Catalyst's own partial/final sum on
        # BIGINT, one decimal division at emit; try_sum nulls on
        # group-total overflow (>9.2e18 micros) instead of wrapping
        m = "CAST(SIGN(l_quantity*1e6) * FLOOR(ABS(l_quantity*1e6)+0.5D) AS BIGINT)"
        single = li.groupBy("l_suppkey").agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr(f"try_sum(CASE WHEN ABS(l_quantity*1e6) < 2251799813685248D THEN {m} END)").alias("_m"),
        ).select(
            "l_suppkey", "n_items",
            F.expr("CAST(CAST(_m AS DECIMAL(38,0)) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE)").alias("total_qty"),
        )
        sl = _med(lambda: _noop(single))
        print(f"partial.single_long_trysum {sl:7.3f} s")

        direct = li.groupBy("l_suppkey").agg(
            F.count(F.lit(1)).alias("n_items"), dsum("l_quantity").alias("total_qty"))
        dd = _med(lambda: _noop(direct))
        print(f"partial.decimal_direct     {dd:7.3f} s")
        duck = _med(lambda: con.execute(ops["agg_partial_final"].oracle).fetchall())
        print(f"partial.duckdb             {duck:7.3f} s  ratio_cur={cur/duck:.2f} "
              f"ratio_single={sl/duck:.2f}")
        # value parity of the single-level candidate vs committed —
        # compare on ALIGNED column order (hier returns key, sums,
        # count; the first run of this script compared positionally
        # and reported a spurious DRIFT)
        h = hier_exact_agg(li, ["l_suppkey"], sums=[("total_qty", "l_quantity")],
                           count_star="n_items")
        a = sorted(map(tuple, h.select("l_suppkey", "n_items", "total_qty").collect()))
        b = sorted(map(tuple, single.select("l_suppkey", "n_items", "total_qty").collect()))
        print(f"partial.single_parity      {'EXACT' if a == b else 'DRIFT'}")

    if "bloom" in STUDIES:
        op_ = ops["join_multiway"]
        cur = _med(lambda: _noop(op_.fn(spark, s100)))
        print(f"bloom.multiway_committed   {cur:7.3f} s  (size-aware SHJ)")

        # NOTE (r8 findings): InjectRuntimeFilter only engages with
        # autoBroadcastJoinThreshold=-1 at planning time (explicit
        # F.broadcast hints keep the dims broadcast), and the variant
        # must be built INLINE — op_.fn goes through the registry
        # wrapper, whose tune_runtime() re-pins autoBroadcastJoin-
        # Threshold (killing injection) and whose plan cache would
        # serve the committed plan. Measured 2026-08-16 interleaved:
        # committed med 3.76 s vs bloom med 4.19 s (0.897x — a LOSS;
        # the o_orderdate filter keeps ~half of orders, so the bloom
        # build on 6M keys + 60M might_contain probes exceeds the
        # shuffle savings). REJECTED per the >1.2x adoption bar.
        def bloom_variant():
            from lambda_hive_spark.helpers import hier_exact_agg
            from lambda_hive_spark.io import table_bytes
            from lambda_hive_spark.session import _BROADCAST_THRESHOLD

            saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
            spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "8GB")
            spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                r = table(spark, s100, "region")
                n = table(spark, s100, "nation")
                c = table(spark, s100, "customer")
                o = table(spark, s100, "orders").filter(
                    F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                li = table(spark, s100, "lineitem")
                if table_bytes(s100, "orders") > int(_BROADCAST_THRESHOLD):
                    o = o.hint("shuffle_hash")
                if table_bytes(s100, "customer") > int(_BROADCAST_THRESHOLD):
                    c = c.hint("shuffle_hash")
                joined = (li.join(o, li.l_orderkey == o.o_orderkey)
                          .join(c, o.o_custkey == c.c_custkey)
                          .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
                          .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
                df = hier_exact_agg(joined, ["r_name", "n_name"],
                                    sums=[("revenue", "l_extendedprice * (1 - l_discount)")])
                df._jdf.queryExecution().executedPlan()  # plan under confs
                return df
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)

        probe = bloom_variant()
        plan = probe._jdf.queryExecution().executedPlan().toString()
        injected = "might_contain" in plan
        print(f"bloom.injected             {injected}")
        bl = _med(lambda: _noop(bloom_variant()))
        print(f"bloom.multiway_bloom       {bl:7.3f} s  win={cur/bl:.2f}x")
        duck = _med(lambda: con.execute(op_.oracle).fetchall())
        print(f"bloom.duckdb               {duck:7.3f} s  ratio_cur={cur/duck:.2f} "
              f"ratio_bloom={bl/duck:.2f}")

    con.close()
    spark.stop()


if __name__ == "__main__":
    main()
