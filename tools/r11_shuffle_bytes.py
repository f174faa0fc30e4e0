"""Measure ACTUAL shuffle bytes per Exchange for the jaccard variants
(guide §2.3: "measure shuffle bytes written and stage time") by
traversing the AQE-final executed plan and reading each node's SQL
metrics (shuffle bytes written / shuffle records written / data size)
— deterministic byte evidence immune to VM weather, which is exactly
what a local shared-memory box cannot show in wall-clock.

Usage: python tools/r11_shuffle_bytes.py [sf0.1|10x] [a|b|c ...]
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from bench import _scale_corpus
from lambda_hive_spark.session import get_spark
from tools.r11_jaccard_decompose import _full

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _walk(node, out):
    """Collect (nodeName, metrics dict) for every node, descending into
    AQE-materialized query stages and reused exchanges."""
    name = node.nodeName()
    mets = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        mets[kv._1()] = kv._2().value()
    out.append((name, mets))
    # adaptive wrappers first
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        _walk(node.executedPlan(), out)
        return
    if cls in ("ShuffleQueryStageExec", "BroadcastQueryStageExec",
               "TableCacheQueryStageExec", "ResultQueryStageExec"):
        _walk(node.plan(), out)
        return
    ch = node.children()
    for i in range(ch.size()):
        _walk(ch.apply(i), out)


def exchange_bytes(df) -> list[tuple[str, int, int]]:
    # Execute through the DataFrame's OWN QueryExecution (a noop write
    # plans a separate command whose metrics this df never sees).
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    nodes: list = []
    _walk(plan, nodes)
    rows = []
    for name, mets in nodes:
        if "Exchange" in name or "ShuffleExchange" in name:
            b = mets.get("shuffleBytesWritten", mets.get("shuffle bytes written", 0))
            r = mets.get("shuffleRecordsWritten", mets.get("shuffle records written", 0))
            d = mets.get("dataSize", 0)
            rows.append((name, int(b), int(r), int(d)))
    return rows


def main():
    spark = get_spark("r11_shuffle_bytes")
    tier = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
    kinds = sys.argv[2:] or ["a", "b"]
    sdir = SF_DIR if tier == "sf0.1" else _scale_corpus(spark, SF_DIR)
    for k in kinds:
        df = _full(spark, sdir, k)
        rows = exchange_bytes(df)
        tot_b = sum(r[1] for r in rows)
        tot_r = sum(r[2] for r in rows)
        print(f"variant {k} @ {tier}: total shuffle bytes={tot_b:,} records={tot_r:,}")
        for name, b, r, d in rows:
            bpr = b / r if r else 0.0
            print(f"  {name:28s} bytes={b:>12,} records={r:>10,} "
                  f"b/rec={bpr:6.1f} dataSize={d:>12,}")
    spark.stop()


if __name__ == "__main__":
    main()
