"""Round-10 full-registry plan audit (guide §1/§2/§4): build every
registered op's DataFrame at sf0.01 and inspect the physical plan for
the anti-patterns the optimization guide names, so the optimization
round's checklist covers EVERY operator, not just the bench headline.

Flags per op:
- batch_eval_python: row-at-a-time Python UDF in the plan (guide §4 —
  should be zero; the plan-purity test bans it for headline ops only).
- arrow_python: ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
  nodes (acceptable Python boundary, listed for the per-op audit).
- cartesian: CartesianProduct / BroadcastNestedLoopJoin (must be
  bounded by construction; listed for review).
- single_partition_exchange: Exchange SinglePartition feeding a Sort/
  Window (corpus-sized input would serialize; whitelist audited by
  test_no_corpus_sized_global_window, listed here for completeness).
- exchanges: total Exchange count (shuffle inventory).
- scan_filters: count of scans with non-empty PushedFilters vs scans.

Build errors (ops needing scratch state etc.) are recorded, not fatal.
Writes plans/r10/plan_audit.json and prints a summary table of flagged
ops.

Usage: python tools/r10_plan_audit.py [sf_dir]
"""
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

from lambda_hive_spark.registry import all_ops
from lambda_hive_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("r10_plan_audit")
    ops = all_ops()
    out = {}
    for name, o in ops.items():
        row: dict = {}
        try:
            df = o.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001 — audit must survive any op
            out[name] = {"error": f"{type(ex).__name__}: {ex}"[:200]}
            continue
        row["exchanges"] = plan.count("Exchange")
        row["batch_eval_python"] = plan.count("BatchEvalPython")
        row["arrow_python"] = sum(
            plan.count(t)
            for t in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas",
                      "MapInArrow", "FlatMapCoGroupsInPandas")
        )
        row["cartesian"] = plan.count("CartesianProduct") + plan.count(
            "BroadcastNestedLoopJoin"
        )
        row["single_partition"] = plan.count("Exchange SinglePartition")
        scans = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        row["scans"] = len(scans)
        row["scans_with_pushed"] = sum(1 for s in scans if s.strip())
        row["sort_merge_joins"] = plan.count("SortMergeJoin")
        out[name] = row

    os.makedirs("/root/repo/plans/r10", exist_ok=True)
    with open("/root/repo/plans/r10/plan_audit.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)

    errs = {n: r for n, r in out.items() if "error" in r}
    flagged = {
        n: r
        for n, r in out.items()
        if "error" not in r
        and (r["batch_eval_python"] or r["cartesian"] or r["single_partition"])
    }
    print(f"ops audited: {len(out)}  build errors: {len(errs)}")
    print(f"flagged (BatchEvalPython/cartesian/SinglePartition): {len(flagged)}")
    for n, r in sorted(flagged.items()):
        print(f"  {n}: {r}")
    for n, r in sorted(errs.items()):
        print(f"  ERR {n}: {r['error']}")
    hist = {}
    for n, r in out.items():
        if "error" not in r:
            hist[r["exchanges"]] = hist.get(r["exchanges"], 0) + 1
    print("exchange-count histogram:", dict(sorted(hist.items())))
    spark.stop()


if __name__ == "__main__":
    main()
