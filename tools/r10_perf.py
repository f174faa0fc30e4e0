"""Round-10 interleaved A/Bs (VERDICT r9 item 3).

Two open watch items, both needing the addendum-10/15 method (driver
conditions, Spark/DuckDB runs interleaved pair-by-pair so VM weather
hits both alike, per-pair steal%):

- agg_pivot at the 1000x tier: the driver sample moved 1.70x -> 2.21x
  between r8 and r9 and the 1000x tier has no interleave record — the
  only headline query whose worst tier is uncharacterized.
- agg_hash at the 100x tier: crept to 1.80x in r9 (closest approach
  to the 2x bar yet); re-characterize in the same session.

NEVER run concurrently with another sweep/bench (shared scratch).
Usage: python tools/r10_perf.py [pairs]   (default 4)
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import (
    SCALE100_SHIFT_GROUPS,
    SCALE100_TABLES,
    SCALE1000_SHIFT_GROUPS,
    SCALE1000_TABLES,
    _proc_stat_sample,
    _scale_corpus,
    _steal_pct,
)
from lambda_hive_spark.registry import all_ops
from lambda_hive_spark.session import get_spark
from lambda_hive_spark.testing import duck_connection

# op -> (tier name, tables, shift groups)
PLAN = [
    ("agg_pivot", "scale1000", SCALE1000_TABLES, SCALE1000_SHIFT_GROUPS),
    ("agg_hash", "scale1000", SCALE1000_TABLES, SCALE1000_SHIFT_GROUPS),
    ("agg_pivot", "scale100", SCALE100_TABLES, SCALE100_SHIFT_GROUPS),
    ("agg_hash", "scale100", SCALE100_TABLES, SCALE100_SHIFT_GROUPS),
]


def main() -> None:
    import json
    import os

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("r10_perf")
    ops = all_ops()
    out = {}
    corpora: dict[str, str] = {}
    cons: dict[str, object] = {}
    for name, tier, tables, groups in PLAN:
        if tier not in corpora:
            corpora[tier] = _scale_corpus(
                spark, "/root/testdata/sf0.1", tier, tables, groups
            )
            cons[tier] = duck_connection(corpora[tier])
        sdir, con = corpora[tier], cons[tier]
        op_ = ops[name]
        op_.fn(spark, sdir).write.format("noop").mode("overwrite").save()
        con.execute(op_.oracle).fetchall()
        rows = []
        for i in range(pairs):
            st0 = _proc_stat_sample()
            t0 = time.perf_counter()
            op_.fn(spark, sdir).write.format("noop").mode("overwrite").save()
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            con.execute(op_.oracle).fetchall()
            td = time.perf_counter() - t0
            steal = _steal_pct(st0, _proc_stat_sample())
            rows.append((ts, td, ts / td, steal))
            print(
                f"{name}@{tier} pair{i}: spark {ts:6.3f}s  duck {td:6.3f}s  "
                f"ratio {ts/td:5.3f}  steal {steal}%",
                flush=True,
            )
        out[f"{name}@{tier}"] = {
            "spark_med": round(statistics.median(r[0] for r in rows), 3),
            "duck_med": round(statistics.median(r[1] for r in rows), 3),
            "ratio_med": round(statistics.median(r[2] for r in rows), 3),
            "pairs": [
                [round(a, 3), round(b, 3), round(c, 3), d] for a, b, c, d in rows
            ],
        }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
