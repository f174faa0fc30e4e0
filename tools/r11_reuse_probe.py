"""Probe AQE runtime stage reuse on the high-static-Exchange diamond
pipelines (VERDICT r10 item 3): execute each op at sf0.01 and count
ReusedQueryStage / ReusedExchange in the AQE-final plan, to calibrate
the regression fences in tests/test_plans.py.

Usage: python tools/r11_reuse_probe.py [sf_dir] [op ...]
"""
import os
import sys

sys.path.insert(0, "/root/repo")

from lambda_hive_spark.registry import all_ops
from lambda_hive_spark.session import get_spark

DIAMONDS = (
    "text_lang_divergence_tv",
    "dedup_near_minhash",
    "sim_recall_eval",
    "customer_rfm_segments",
    "dedup_threshold_sweep",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(DIAMONDS)
    os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"
    spark = get_spark("r11_reuse_probe")
    ops = all_ops()
    for name in names:
        df = ops[name].fn(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        rqs = plan.count("ReusedQueryStage")
        rex = plan.count("ReusedExchange")
        ex = plan.count("Exchange")
        print(f"{name:28s} ReusedQueryStage={rqs:2d} ReusedExchange={rex:2d} "
              f"Exchange(all)={ex:2d} final={'isFinalPlan=true' in plan}")
    spark.stop()


if __name__ == "__main__":
    main()
