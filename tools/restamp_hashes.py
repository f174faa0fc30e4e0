#!/usr/bin/env python
"""Re-stamp GRADED.json fingerprints for ops whose edit is PROVEN
output-preserving on the grading corpus.

The fingerprint system (update_graded.py) re-queues any edited op for
driver grading — correct for behavior changes, wasteful for edits
whose sf0.01 output is bit-identical (e.g. null-robustness guards that
are no-ops on the null-free corpus). This tool updates the recorded
hash to the CURRENT op_source_hash, but only when the caller supplies
a pre-edit/post-edit fingerprint pair (tools/output_hash.py) proving
Spark AND oracle outputs unchanged.

Usage:
    python tools/restamp_hashes.py <pre.json> <post.json>

Only ops present in BOTH fingerprint files, with identical spark+duck
hashes, AND already recorded in GRADED.json hashes are re-stamped.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lambda_hive_spark.registry import all_ops, op_source_hash

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GRADED = os.path.join(REPO, "GRADED.json")


def main(pre_path: str, post_path: str) -> None:
    with open(pre_path) as f:
        pre = json.load(f)
    with open(post_path) as f:
        post = json.load(f)
    with open(GRADED) as f:
        manifest = json.load(f)
    hashes = manifest.setdefault("hashes", {})
    ops = all_ops()

    restamped, skipped = [], []
    for name in sorted(set(pre) & set(post)):
        if name not in hashes:
            skipped.append((name, "never graded — will be graded fresh"))
            continue
        if pre[name] != post[name] or "ERROR" in str(pre[name]):
            skipped.append((name, "output changed — must be re-graded"))
            continue
        current = op_source_hash(ops[name])
        if hashes[name] == current:
            skipped.append((name, "hash already current"))
            continue
        hashes[name] = current
        restamped.append(name)

    with open(GRADED, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"re-stamped {len(restamped)}: {restamped}")
    for name, why in skipped:
        print(f"  skipped {name}: {why}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
