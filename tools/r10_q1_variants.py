"""Round-10 Q1 aggregation shoot-out — finding a form that is BOTH
fast and safe for corpus-sized groups (the flat int64 try_sum total
overflows Q1's 6 groups at true 100 TB — BASELINE §7 addendum 18's
adjudication; group totals measured at 31% of 2^63 already at the
1000× local tier, so ~30× more data wraps the bound).

Variants (all bit-identical outputs where in-contract; parity gated):
- hier: committed r9 two-level (long partials per (group, pid),
  decimal merge) — unbounded, 2 Exchanges, 7 accumulators for Q1.
- hier_dedup: hier with the sum/avg accumulator SHARED per source
  expression (Q1: 7 → 5 partial sums) — same bound story, same plan
  shape, less per-row work.
- flat: single-level int64 try_sum (UNSAFE at 100 TB for Q1's
  corpus-sized groups — measured here only as the speed ceiling).
- decsum: single-level sum(CAST(long micros AS DECIMAL(38,0))) — the
  per-row value is the same arithmetic long micros (no
  Double.toString path, which is what made sum-of-decimal slow in
  r4), but the ACCUMULATOR is exact unbounded decimal: one pass, one
  Exchange, no overflow bound. Candidate to beat hier if Spark's
  compact-long decimal add is cheap enough.

Usage: python tools/r10_q1_variants.py [runs]
NEVER run concurrently with another sweep/bench (shared scratch).
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import os

from bench import SCALE100_SHIFT_GROUPS, SCALE100_TABLES, _scale_corpus
from pyspark.sql import functions as F

from lambda_hive_spark.helpers import (
    MICROS_GUARD,
    _micros_product,
    flat_exact_agg,
    hier_exact_agg,
    sql_micros_count,
)
from lambda_hive_spark.io import table
from lambda_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

SUMS = [
    ("sum_qty", "l_quantity"),
    ("sum_base_price", "l_extendedprice"),
    ("sum_disc_price", "l_extendedprice * (1 - l_discount)"),
    ("sum_charge", "l_extendedprice * (1 - l_discount) * (1 + l_tax)"),
]
AVGS = [
    ("avg_qty", "l_quantity"),
    ("avg_price", "l_extendedprice"),
    ("avg_disc", "l_discount"),
]
KEYS = ["l_returnflag", "l_linestatus"]


def _li(spark, sf_dir):
    return table(spark, sf_dir, "lineitem").filter(
        "l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"
    )


def q1_hier(spark, sf_dir):
    return hier_exact_agg(
        _li(spark, sf_dir), KEYS, sums=SUMS, avgs=AVGS, count_star="count_order"
    )


def q1_flat(spark, sf_dir):
    return flat_exact_agg(
        _li(spark, sf_dir), KEYS, sums=SUMS, avgs=AVGS, count_star="count_order"
    )


def q1_decsum(spark, sf_dir):
    aggs, finals = [], []
    shared = {}
    div = "CAST(1000000 AS DECIMAL(7,0))"

    def m_alias(expr):
        if expr not in shared:
            a = f"_m{len(shared)}"
            shared[expr] = a
            m = _micros_product(expr, 6)
            half = f"CAST(SIGN({m}) * FLOOR(ABS({m}) + 0.5D) AS BIGINT)"
            aggs.append(F.expr(
                f"SUM(CAST(CASE WHEN ABS({m}) < {MICROS_GUARD} THEN {half} END"
                f" AS DECIMAL(38,0))) AS {a}"))
        return shared[expr]

    for name, expr in SUMS:
        finals.append(f"CAST({m_alias(expr)} / {div} AS DOUBLE) AS {name}")
    for i, (name, expr) in enumerate(AVGS):
        a = m_alias(expr)
        aggs.append(F.expr(f"{sql_micros_count(expr, 6)} AS _c{i}"))
        finals.append(f"(CAST({a} / {div} AS DOUBLE) / _c{i}) AS {name}")
    aggs.append(F.expr("COUNT(*) AS count_order"))
    finals.append("count_order")
    return (
        _li(spark, sf_dir).groupBy(*KEYS).agg(*aggs)
        .select(*KEYS, *[F.expr(e) for e in finals])
    )


VARIANTS = [("hier", q1_hier), ("flat", q1_flat), ("decsum", q1_decsum)]


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("r10_q1_variants")
    s100 = _scale_corpus(spark, SF_DIR, "scale100", SCALE100_TABLES, SCALE100_SHIFT_GROUPS)
    ref = sorted(map(tuple, q1_hier(spark, SF_DIR).collect()))
    for name, fn in VARIANTS[1:]:
        got = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        print(f"parity {name}@sf0.1: {'EXACT' if got == ref else 'DRIFT'}", flush=True)
    ref100 = sorted(map(tuple, q1_hier(spark, s100).collect()))
    for name, fn in VARIANTS[1:]:
        got = sorted(map(tuple, fn(spark, s100).collect()))
        print(f"parity {name}@scale100: {'EXACT' if got == ref100 else 'DRIFT'}", flush=True)
    for sdir, tag, runs in ((SF_DIR, "sf0.1", RUNS), (s100, "scale100", max(3, RUNS - 2))):
        meds = {}
        for name, fn in VARIANTS:
            ts = []
            for i in range(runs + 1):
                t0 = time.perf_counter()
                _noop(fn(spark, sdir))
                if i:
                    ts.append(time.perf_counter() - t0)
            meds[name] = statistics.median(ts)
        base = meds["hier"]
        print(f"{tag}: " + "  ".join(
            f"{n} {m:6.3f}s ({base/m:4.2f}x)" for n, m in meds.items()), flush=True)
    for name, fn in VARIANTS:
        p = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        print(f"{name}: exchanges={p.count('Exchange hashpartitioning')}")
    spark.stop()


if __name__ == "__main__":
    main()
