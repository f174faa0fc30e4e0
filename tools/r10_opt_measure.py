"""Round-10 optimization baseline: per-headline-query timing split +
plan capture (guide §1: measure first, note the plan shape).

For each headline op at $SPARK_GRAFT_SF_DIR (default sf0.1):
- `build_ms`: driver-side DataFrame construction (op fn call — py4j
  round-trips + analysis triggered lazily later, so this is pure
  Column/plan assembly),
- `exec_s`: median noop-sink wall (plan + schedule + execute), the
  same timed action bench.py uses,
- writes `plans/r10/<name>_<tag>.txt` with explain("formatted") so
  plan-shape claims in OPTIMIZATION_r10.md are checkable offline.

Usage: python tools/r10_opt_measure.py [tag] [op ...]
  tag defaults to "before"; ops default to the bench HEADLINE set.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import HEADLINE
from lambda_hive_spark.registry import all_ops
from lambda_hive_spark.session import get_spark

N = int(os.environ.get("SPARK_GRAFT_OPT_RUNS", "5"))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.path.join("/root/repo", "plans", "r10")
    os.makedirs(plans_dir, exist_ok=True)
    spark = get_spark("r10_opt_measure")
    ops = all_ops()
    total = 0.0
    print(f"{'op':24s} {'build_ms':>9s} {'exec_s':>8s}")
    for name in names:
        fn = ops[name].fn
        spark.sparkContext.setJobDescription(f"r10 {tag}: {name}")
        # warm-up: file-index + plan caches, then capture the plan once
        df = fn(spark, sf_dir)
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted")))
        df.write.format("noop").mode("overwrite").save()
        builds, execs = [], []
        for _ in range(N):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        b = statistics.median(builds) * 1000
        e = statistics.median(execs)
        total += b / 1000 + e
        print(f"{name:24s} {b:9.1f} {e:8.4f}")
    print(f"{'TOTAL (build+exec)':24s} {'':9s} {total:8.4f}")
    spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
