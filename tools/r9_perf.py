"""Round-9 interleaved A/B at the scale100 tier (VERDICT r8 item 3).

The r8 driver one-shots put agg_partial_final at 3.09x and
join_multiway at 4.66x — both CONTRADICTING same-session A/Bs (1.31x
win adopted for partial_final; join_multiway 3.40x the round before on
a 15%-steal tier). Method per BASELINE addendum 10: DRIVER CONDITIONS
(ops[...].fn through the registry, noop sink, bench's session and
corpus builder), Spark and DuckDB runs INTERLEAVED pair-by-pair within
one session so VM weather hits both engines alike, per-pair ratios
reported with /proc/stat steal%. join_star_bucketed rides along for
its first scale100 record as a registered op.

NEVER run concurrently with another sweep/bench (shared scratch).
Usage: python tools/r9_perf.py [pairs]   (default 4)
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import (
    SCALE100_SHIFT_GROUPS,
    SCALE100_TABLES,
    _proc_stat_sample,
    _scale_corpus,
    _steal_pct,
)
from lambda_hive_spark.registry import all_ops
from lambda_hive_spark.session import get_spark
from lambda_hive_spark.testing import duck_connection

OPS_UNDER_TEST = __import__("os").environ.get("R9_OPS", "agg_partial_final join_multiway join_star_bucketed").split()


def main() -> None:
    import os

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("r9_perf")
    ops = all_ops()
    s100 = _scale_corpus(
        spark, "/root/testdata/sf0.1", "scale100", SCALE100_TABLES, SCALE100_SHIFT_GROUPS
    )
    con = duck_connection(s100)
    out = {}
    for name in OPS_UNDER_TEST:
        op_ = ops[name]
        # warm-up both sides (plan + file-index caches, bucketed build)
        op_.fn(spark, s100).write.format("noop").mode("overwrite").save()
        con.execute(op_.oracle).fetchall()
        rows = []
        for i in range(pairs):
            st0 = _proc_stat_sample()
            t0 = time.perf_counter()
            op_.fn(spark, s100).write.format("noop").mode("overwrite").save()
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            con.execute(op_.oracle).fetchall()
            td = time.perf_counter() - t0
            steal = _steal_pct(st0, _proc_stat_sample())
            rows.append((ts, td, ts / td, steal))
            print(f"{name} pair{i}: spark {ts:6.3f}s  duck {td:6.3f}s  "
                  f"ratio {ts/td:5.3f}  steal {steal}%", flush=True)
        med_r = statistics.median(r for _, _, r, _ in rows)
        out[name] = {
            "spark_med": round(statistics.median(r[0] for r in rows), 3),
            "duck_med": round(statistics.median(r[1] for r in rows), 3),
            "ratio_med": round(med_r, 3),
            "pairs": [[round(a, 3), round(b, 3), round(c, 3), d] for a, b, c, d in rows],
        }
    import json

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
