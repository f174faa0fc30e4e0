"""Benchmark harness (SURVEY.md §6, BASELINE.md).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

BASELINE.md interpretation: with no published reference numbers (empty
reference dir), the comparable is DuckDB 1.0 wall-clock on the same
oracle SQL over the same parquet — reported per query as
"duckdb_sec" so every round records the ratio alongside.

Timing method: median of 3 runs after 1 warm-up; Spark queries are
materialized with a noop write (full execution, no driver collect
cost); DuckDB with fetchall on the same connection.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The headline set: one per operator family, weighted toward the ops
# that stress scan/shuffle/join/window/text/vector paths.
HEADLINE = (
    "agg_hash",            # flagship TPC-H-Q1 shape
    "agg_partial_final",   # mid-cardinality groupBy
    "join_multiway",       # 5-table star join
    "join_asof",           # union+window as-of
    "win_topk_per_group",  # window rank-filter
    "agg_pivot",           # pivot over events
    "distinct_rows",       # full-row shuffle dedup
    "dedup_ngram_jaccard", # shingle self-join (text path)
    "sim_knn_exact",       # vector dot-product path
    "text_tf_idf",         # explode + two-level agg
)

N_RUNS = 3


def _time_spark(fn, spark, sf_dir: str) -> float:
    times = []
    for i in range(N_RUNS + 1):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if i > 0:  # first run is warm-up (plan + file-index caches)
            times.append(dt)
    return statistics.median(times)


def _time_duck(con, sql: str) -> float:
    times = []
    for i in range(N_RUNS + 1):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        dt = time.perf_counter() - t0
        if i > 0:
            times.append(dt)
    return statistics.median(times)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from lambda_hive_spark.registry import all_ops
    from lambda_hive_spark.session import get_spark
    from lambda_hive_spark.testing import duck_connection

    ops = all_ops()
    spark = get_spark("lambda_hive_spark_bench")
    con = duck_connection(sf_dir)

    queries: dict[str, float] = {}
    duck: dict[str, float] = {}
    for name in HEADLINE:
        op_ = ops[name]
        queries[name] = round(_time_spark(op_.fn, spark, sf_dir), 4)
        if op_.oracle:
            duck[name] = round(_time_duck(con, op_.oracle), 4)

    total = round(sum(queries.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": float(sf),
                "duckdb_sec": duck,
                "duckdb_total_sec": round(sum(duck.values()), 4),
                "config": {
                    "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                    "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
                    "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
