#!/usr/bin/env python
"""Snapshot every registry op's implementation fingerprint to OPHASHES.json.

Run immediately before each round's FINAL commit.  The driver grades
exactly that commit, so this file records the fingerprint each op had
*at grading time* of any CORRECTNESS_r{N}.json the driver writes after
the commit.  ``__spark_entry__._graded_names()`` then trusts a
glob-discovered CORRECTNESS row (one newer than the GRADED.json
manifest merge) only while the op's CURRENT fingerprint still matches
this snapshot — closing the r5 advisor's residual gap where an op
edited after the newest driver artifact landed kept its graded status
for a full window with no hash check.

Usage:  python tools/snapshot_hashes.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lambda_hive_spark.registry import all_ops, op_source_hash

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "OPHASHES.json")


def main() -> None:
    ops = all_ops()
    snapshot = {name: op_source_hash(o) for name, o in ops.items()}
    with open(OUT, "w") as f:
        json.dump(snapshot, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"snapshotted {len(snapshot)} op fingerprints to OPHASHES.json")


if __name__ == "__main__":
    main()
