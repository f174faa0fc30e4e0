"""Round-11 optimization measurement: per-query timing split + plan
capture (guide §1), with the steal-gate VERDICT r10 item 8 asked for.

Same protocol as tools/r10_opt_measure.py — build_ms (driver-side plan
assembly) + exec_s (median noop-sink wall) per op, explain("formatted")
written to plans/r11/<name>_<tag>.txt — plus an ENFORCED weather gate:
/proc/stat steal is sampled around the whole timing session and any
per-op loop; if same-session steal exceeds SPARK_GRAFT_MAX_STEAL_PCT
(default 3.0), the numbers are printed with an UNRELIABLE marker and
the process exits non-zero so a decision can never silently rest on a
contaminated run (r10 did this check by hand; this makes the tool
refuse for you).

Usage: python tools/r11_opt_measure.py [tag] [op ...]
  tag defaults to "before"; ops default to the bench HEADLINE set.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import HEADLINE, _proc_stat_sample, _steal_pct
from lambda_hive_spark.registry import all_ops
from lambda_hive_spark.session import get_spark

N = int(os.environ.get("SPARK_GRAFT_OPT_RUNS", "5"))
MAX_STEAL = float(os.environ.get("SPARK_GRAFT_MAX_STEAL_PCT", "3.0"))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.path.join("/root/repo", "plans", "r11")
    os.makedirs(plans_dir, exist_ok=True)
    spark = get_spark("r11_opt_measure")
    ops = all_ops()
    total = 0.0
    session_st0 = _proc_stat_sample()
    print(f"{'op':24s} {'build_ms':>9s} {'exec_s':>8s} {'steal%':>7s}")
    worst_steal = 0.0
    for name in names:
        fn = ops[name].fn
        spark.sparkContext.setJobDescription(f"r11 {tag}: {name}")
        # warm-up: file-index + plan caches, then capture the plan once
        df = fn(spark, sf_dir)
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted")))
        df.write.format("noop").mode("overwrite").save()
        builds, execs = [], []
        st0 = _proc_stat_sample()
        for _ in range(N):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        steal = _steal_pct(st0, _proc_stat_sample()) or 0.0
        worst_steal = max(worst_steal, steal)
        b = statistics.median(builds) * 1000
        e = statistics.median(execs)
        total += b / 1000 + e
        print(f"{name:24s} {b:9.1f} {e:8.4f} {steal:7.2f}")
    session_steal = _steal_pct(session_st0, _proc_stat_sample()) or 0.0
    print(f"{'TOTAL (build+exec)':24s} {'':9s} {total:8.4f}")
    print(f"session steal%: {session_steal:.2f}  worst per-op: {worst_steal:.2f}"
          f"  gate: {MAX_STEAL:.1f}")
    spark.sparkContext.setJobDescription(None)
    spark.stop()
    if session_steal > MAX_STEAL or worst_steal > MAX_STEAL:
        print(f"UNRELIABLE: steal exceeded {MAX_STEAL:.1f}% — do not record "
              "these numbers for an adopt/reject decision; re-run in calmer "
              "weather.")
        sys.exit(3)


if __name__ == "__main__":
    main()
