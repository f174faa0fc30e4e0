"""join_multiway on a bucketed fact layout — the cluster answer, measured.

The committed op reads raw fixture parquet and must shuffle both
facts; addendum 11 put the zero-exchange bucketed read on record for
the simple fact-fact join. This study runs the FULL 5-table star
(filter + two broadcast dims + the aggregate) over the bucketed
orders/lineitem layout that join_bucket_colocated_read maintains, so
the record shows what the real query costs once the shuffle was paid
at ingest — the steady state a 100 TB warehouse actually lives in.

Usage: python tools/r8_bucketed_star.py   (scale100 corpus, cached)
NEVER run concurrently with another sweep/bench (shared scratch).
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import SCALE100_SHIFT_GROUPS, SCALE100_TABLES, _scale_corpus

from pyspark.sql import functions as F

from lambda_hive_spark.io import table
from lambda_hive_spark.helpers import hier_exact_agg
from lambda_hive_spark.registry import all_ops
from lambda_hive_spark.session import get_spark
from lambda_hive_spark.testing import duck_connection


def med(fn, runs=4):
    ts = []
    for i in range(runs + 1):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        if i:
            ts.append(dt)
    return statistics.median(ts)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("r8_bucketed_star")
    ops = all_ops()
    s100 = _scale_corpus(
        spark, "/root/testdata/sf0.1", "scale100", SCALE100_TABLES, SCALE100_SHIFT_GROUPS
    )
    # ensure the bucketed layout exists and is fresh (the read op
    # builds at most once per source fingerprint)
    ops["join_bucket_colocated_read"].fn(spark, s100).count()

    def star_raw():
        return ops["join_multiway"].fn(spark, s100)

    def star_bucketed():
        # identical query; facts come from the bucketed tables the
        # maintenance op registered for this corpus
        from lambda_hive_spark.operators.maintenance import sf_slug

        o = spark.table(f"orders_bro_{sf_slug(s100)}").filter(
            F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
        )
        li = spark.table(f"lineitem_bro_{sf_slug(s100)}").hint("merge")
        n = table(spark, s100, "nation")
        r = table(spark, s100, "region")
        c = table(spark, s100, "customer")
        joined = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        )
        return hier_exact_agg(
            joined, ["r_name", "n_name"],
            sums=[("revenue", "l_extendedprice * (1 - l_discount)")],
        )

    plan = star_bucketed()._jdf.queryExecution().executedPlan().toString()
    # the FACT join must be exchange-free; the tiny post-agg merge and
    # broadcast exchanges remain, so count only shuffle exchanges on
    # the fact side via SortMergeJoin presence + no Exchange before it
    print("bucketed star: SortMergeJoin" , "SortMergeJoin" in plan)

    raw = med(lambda: noop(star_raw()))
    bk = med(lambda: noop(star_bucketed()))
    con = duck_connection(s100)
    duck = med(lambda: con.execute(ops["join_multiway"].oracle).fetchall())
    con.close()
    print(f"star raw-layout    {raw:7.3f} s  ratio {raw/duck:.2f}")
    print(f"star bucketed      {bk:7.3f} s  ratio {bk/duck:.2f}  win {raw/bk:.2f}x")
    print(f"duckdb             {duck:7.3f} s")
    # parity
    a = sorted(map(tuple, star_raw().collect()))
    b = sorted(map(tuple, star_bucketed().collect()))
    print("parity", "EXACT" if a == b else "DRIFT")
    spark.stop()


if __name__ == "__main__":
    main()
