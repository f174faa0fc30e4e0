"""Profile the multi-rowgroup scale-corpus queries one stage at a time.

Builds (or reuses) the bench scale corpus in scratch, then times
selected ops plus a few decomposed probes (bare scan, scan+filter,
scan+agg) so a regression can be attributed to scan / shuffle / agg
rather than guessed. Usage:
    python tools/profile_scale.py [op ...]
Prints one line per timing; pass op names to restrict.
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import os

from bench import _scale_corpus  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from lambda_hive_spark.io import table  # noqa: E402
from lambda_hive_spark.registry import all_ops  # noqa: E402
from lambda_hive_spark.session import get_spark  # noqa: E402

ONLY = sys.argv[1:] or ["agg_hash", "join_multiway", "agg_partial_final"]


def t(label, fn, runs=3):
    times = []
    for i in range(runs + 1):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        if i:  # skip warm-up
            times.append(dt)
    print(f"{label:40s} {statistics.median(times):7.3f} s")


def main():
    spark = get_spark("profile_scale")
    scale_dir = _scale_corpus(spark, SF_DIR)
    ops = all_ops()

    li = table(spark, scale_dir, "lineitem")
    t("scan lineitem count", lambda: li.count())
    t("scan lineitem 7-col sum", lambda: li.selectExpr(
        "sum(l_quantity)", "sum(l_extendedprice)").collect())

    for name in ONLY:
        fn = ops[name].fn
        t(f"op {name}", lambda fn=fn: fn(spark, scale_dir).collect())
    spark.stop()


if __name__ == "__main__":
    main()
