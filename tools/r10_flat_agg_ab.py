"""Round-10 A/B: flat_exact_agg (single-level micros) vs committed
hier_exact_agg for agg_hash and join_multiway, at sf0.1 and the 100×
tier, with bit-parity checks (sorted full-row compare) at both scales.

The r8 study proved the single-level form 1.33×/1.47× for
agg_partial_final/agg_pivot; this extends the A/B to the two remaining
hier callers on the headline list (agg_hash was the r9 watch item:
1.80× DuckDB at 100×).

Usage: python tools/r10_flat_agg_ab.py [runs]   (default 5)
NEVER run concurrently with another sweep/bench (shared scratch).
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import os

from bench import SCALE100_SHIFT_GROUPS, SCALE100_TABLES, _scale_corpus
from pyspark.sql import functions as F

from lambda_hive_spark.helpers import flat_exact_agg, hier_exact_agg
from lambda_hive_spark.io import table, table_bytes
from lambda_hive_spark.registry import all_ops
from lambda_hive_spark.session import _BROADCAST_THRESHOLD, get_spark
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


def q1_variant(spark, sf_dir, agg):
    li = table(spark, sf_dir, "lineitem")
    disc_price = "l_extendedprice * (1 - l_discount)"
    charge = f"{disc_price} * (1 + l_tax)"
    return agg(
        li.filter("l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"),
        ["l_returnflag", "l_linestatus"],
        sums=[
            ("sum_qty", "l_quantity"),
            ("sum_base_price", "l_extendedprice"),
            ("sum_disc_price", disc_price),
            ("sum_charge", charge),
        ],
        avgs=[
            ("avg_qty", "l_quantity"),
            ("avg_price", "l_extendedprice"),
            ("avg_disc", "l_discount"),
        ],
        count_star="count_order",
    )


def multiway_variant(spark, sf_dir, agg):
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
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return agg(joined, ["r_name", "n_name"], sums=[("revenue", "l_extendedprice * (1 - l_discount)")])


def main():
    spark = get_spark("r10_flat_agg_ab")
    ops = all_ops()
    s100 = _scale_corpus(spark, SF_DIR, "scale100", SCALE100_TABLES, SCALE100_SHIFT_GROUPS)
    con = duck_connection(SF_DIR)
    con100 = duck_connection(s100)

    for label, builder, opname in (
        ("q1", q1_variant, "agg_hash"),
        ("multiway", multiway_variant, "join_multiway"),
    ):
        # bit-parity first, at both scales (sorted full rows)
        for sdir, tag in ((SF_DIR, "sf0.1"), (s100, "scale100")):
            a = sorted(map(tuple, builder(spark, sdir, hier_exact_agg).collect()))
            b = sorted(map(tuple, builder(spark, sdir, flat_exact_agg).collect()))
            print(f"{label}.parity@{tag}        {'EXACT' if a == b else 'DRIFT'}", flush=True)
        for sdir, c, tag in ((SF_DIR, con, "sf0.1"), (s100, con100, "scale100")):
            hier = _med(lambda: _noop(builder(spark, sdir, hier_exact_agg)))
            flat = _med(lambda: _noop(builder(spark, sdir, flat_exact_agg)))
            duck = _med(lambda: c.execute(ops[opname].oracle).fetchall())
            print(
                f"{label}@{tag}: hier {hier:6.3f}s  flat {flat:6.3f}s  "
                f"speedup {hier/flat:5.3f}x  duck {duck:6.3f}s  "
                f"ratio hier {hier/duck:.3f} flat {flat/duck:.3f}",
                flush=True,
            )
        # plan shape: Exchange counts
        for sdir, tag in ((SF_DIR, "sf0.1"),):
            ph = builder(spark, sdir, hier_exact_agg)._jdf.queryExecution().executedPlan().toString()
            pf = builder(spark, sdir, flat_exact_agg)._jdf.queryExecution().executedPlan().toString()
            print(f"{label}.exchanges hier={ph.count('Exchange')} flat={pf.count('Exchange')}")
    spark.stop()


if __name__ == "__main__":
    main()
