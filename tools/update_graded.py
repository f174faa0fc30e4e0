#!/usr/bin/env python
"""Merge a round's CORRECTNESS_r{N}.json into GRADED.json.

GRADED.json is the manifest ``__spark_entry__._graded_names()`` reads to
push never-driver-graded ops to the front of the driver's bounded
correctness window.  Layout::

    {
      "r01": ["op", ...],          # ops graded in round 1
      "r02": ["op", ...],
      "hashes": {"op": "abcd1234ef567890", ...}   # impl fingerprint at grade time
    }

An op counts as graded only while its current ``op_source_hash`` matches
the recorded one — editing an op re-queues it for driver grading
(VERDICT r2 item 7).

Usage:  python tools/update_graded.py CORRECTNESS_r02.json r02
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lambda_hive_spark.registry import all_ops, op_source_hash

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GRADED = os.path.join(REPO, "GRADED.json")


def main(correctness_path: str, round_key: str) -> None:
    with open(correctness_path) as f:
        correctness = json.load(f)

    try:
        with open(GRADED) as f:
            manifest = json.load(f)
    except (OSError, ValueError):
        manifest = {}

    # Only record ops the driver actually executed without a hard error
    # (rows-only ops carry err == "no_oracle" and still count as graded —
    # that is the strongest check semantically possible for them).
    graded_now = sorted(
        name
        for name, row in correctness.items()
        if row.get("err") in (None, "no_oracle")
        and row.get("rows_match") is not False
        and row.get("hash_match") is not False
    )
    failed = sorted(set(correctness) - set(graded_now))
    if failed:
        print(f"NOT recording (driver-red, must be re-graded after a fix): {failed}")

    manifest[round_key] = graded_now

    ops = all_ops()
    hashes = manifest.setdefault("hashes", {})
    # Prefer the OPHASHES.json snapshot (written at the round's final
    # commit — the exact source the driver graded) over the current
    # source hash: merging AFTER local edits must not stamp source the
    # driver never saw (r5 advisor trust gap, closed for the manifest
    # path too).
    try:
        with open(os.path.join(REPO, "OPHASHES.json")) as f:
            snapshot = json.load(f)
    except (OSError, ValueError):
        snapshot = {}
    for name in graded_now:
        if name in ops:
            hashes[name] = snapshot.get(name) or op_source_hash(ops[name])

    with open(GRADED, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"recorded {len(graded_now)} ops under {round_key}; {len(hashes)} hashes tracked")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
