#!/usr/bin/env python
"""Re-stamp GRADED.json fingerprints for ops whose edit is PROVEN
output-preserving on the grading corpus.

The fingerprint system (update_graded.py) re-queues any edited op for
driver grading — correct for behavior changes, wasteful for edits
whose sf0.01 output is bit-identical (e.g. null-robustness guards that
are no-ops on the null-free corpus). This tool updates the recorded
hash to the CURRENT op_source_hash, but only when the caller supplies
pre-edit fingerprint runs plus a post-edit run (tools/output_hash.py)
proving Spark AND oracle outputs unchanged.

A SINGLE pre-edit run is not accepted (ADVICE r4): for an op that was
nondeterministic before the edit (e.g. a tie-flaky LIMIT), one
matching sample does not prove the graded output equals the new
output. At least two independent pre-edit runs must agree with each
other AND with the post-edit run.

Usage:
    python tools/restamp_hashes.py <pre1.json> <pre2.json> [...] <post.json>

Only ops present in ALL fingerprint files, with identical spark+duck
hashes across every run, AND already recorded in GRADED.json hashes
are re-stamped.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lambda_hive_spark.registry import all_ops, op_source_hash

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GRADED = os.path.join(REPO, "GRADED.json")


def main(pre_paths: list[str], post_path: str) -> None:
    if len(pre_paths) < 2:
        sys.exit(
            "restamp_hashes: need >=2 independent pre-edit fingerprint runs "
            "(a single pre-run cannot rule out pre-edit nondeterminism; "
            "re-run tools/output_hash.py on the pre-edit source and retry)"
        )
    pres = []
    for p in pre_paths:
        with open(p) as f:
            pres.append(json.load(f))
    with open(post_path) as f:
        post = json.load(f)
    with open(GRADED) as f:
        manifest = json.load(f)
    hashes = manifest.setdefault("hashes", {})
    ops = all_ops()

    common = set(post)
    for pre in pres:
        common &= set(pre)

    restamped, skipped = [], []
    for name in sorted(common):
        if name not in hashes:
            skipped.append((name, "never graded — will be graded fresh"))
            continue
        runs = [pre[name] for pre in pres]
        if any(r != runs[0] for r in runs[1:]):
            skipped.append((name, "pre-edit runs disagree — op was flaky; must be re-graded"))
            continue
        if runs[0] != post[name] or "ERROR" in str(runs[0]):
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
    main(sys.argv[1:-1], sys.argv[-1])
