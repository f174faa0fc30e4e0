"""Round-11 full-registry plan audit — r10's audit (exchange counts,
Python boundaries, cartesians, SinglePartition sites) PLUS the §6
follow-through VERDICT r10 item 4 asked for: per-scan ReadSchema
columns and PushedFilters are now RECORDED PER SCAN (not just counted),
so ops whose filters fail to reach the scan, or whose scans read wider
than the query needs, can be ranked and fixed with a checkable diff.

Per op:
- exchanges / batch_eval_python / arrow_python / cartesian /
  single_partition / sort_merge_joins: as in r10 (diffable).
- scans: list of {table, read_cols, pushed} — one entry per FileScan,
  table inferred from the Location path, read_cols parsed from
  ReadSchema, pushed = the PushedFilters payload string ('' if none).
- filters_above_unpushed_scan: count of scans with a Filter node in
  the plan but an empty PushedFilters list — the §6 smell (filter on a
  derived/wrapped column that cannot push).

Writes plans/r11/plan_audit.json and prints the §6 offender ranking.

Usage: python tools/r11_plan_audit.py [sf_dir]
"""
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

from lambda_hive_spark.registry import all_ops
from lambda_hive_spark.session import get_spark

_SCAN_RE = re.compile(
    r"FileScan parquet \[(?P<cols>[^\]]*)\][^\n]*?"
    r"Location: [^\[]*\[(?P<loc>[^\]]*)\][^\n]*?"
    r"PushedFilters: \[(?P<pushed>[^\]]*)\][^\n]*?"
    r"ReadSchema: struct<(?P<schema>[^>]*)>"
)


def _scan_details(plan: str) -> list[dict]:
    out = []
    for m in _SCAN_RE.finditer(plan):
        loc = m.group("loc")
        table = os.path.basename(loc.rstrip("/").split(",")[0]).replace(
            ".parquet", ""
        )
        cols = [
            c.split(":")[0].strip()
            for c in m.group("schema").split(",")
            if c.strip()
        ]
        out.append(
            {"table": table, "read_cols": cols, "pushed": m.group("pushed").strip()}
        )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("r11_plan_audit")
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
        row["sort_merge_joins"] = plan.count("SortMergeJoin")
        scans = _scan_details(plan)
        row["scans"] = len(scans)
        row["scans_with_pushed"] = sum(1 for s in scans if s["pushed"])
        row["scan_detail"] = scans
        row["has_filter_node"] = plan.count("Filter (") + plan.count("+- Filter ")
        out[name] = row

    os.makedirs("/root/repo/plans/r11", exist_ok=True)
    with open("/root/repo/plans/r11/plan_audit.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)

    errs = {n: r for n, r in out.items() if "error" in r}
    print(f"ops audited: {len(out)}  build errors: {len(errs)}")
    for n, r in sorted(errs.items()):
        print(f"  ERR {n}: {r['error']}")
    hist: dict = {}
    for n, r in out.items():
        if "error" not in r:
            hist[r["exchanges"]] = hist.get(r["exchanges"], 0) + 1
    print("exchange-count histogram:", dict(sorted(hist.items())))

    # §6 offender ranking: ops with Filter nodes but zero pushed scans,
    # and the widest unpushed scans by read-column count.
    offenders = [
        (n, r)
        for n, r in out.items()
        if "error" not in r
        and r["has_filter_node"] > 0
        and r["scans"] > 0
        and r["scans_with_pushed"] == 0
    ]
    print(f"\nops with Filter nodes but NO pushed scan filters: {len(offenders)}")
    for n, r in sorted(offenders, key=lambda t: -t[1]["has_filter_node"])[:40]:
        widths = [f"{s['table']}:{len(s['read_cols'])}" for s in r["scan_detail"]]
        print(f"  {n}: filters={r['has_filter_node']} scans=[{', '.join(widths)}]")
    spark.stop()


if __name__ == "__main__":
    main()
