"""Unit tests for __spark_entry__'s grading-evidence logic.

The driver's bounded window (~50 queries/round) is steered by
_graded_names(): ops with prior evidence sort last so never-graded ops
get slots. Two r3/r4 regressions motivated the current rules — a
stale GRADED.json merge re-graded a whole round, and an edited op must
not keep its old green row. These tests pin the rules without any
Spark session (source hashing only).
"""

from __future__ import annotations

import json
import os

import pytest

import __spark_entry__ as entry
from lambda_hive_spark.registry import all_ops, op_source_hash


@pytest.fixture
def repo(tmp_path, monkeypatch):
    monkeypatch.setattr(entry, "_REPO", str(tmp_path))
    return tmp_path


def _write(path, obj):
    with open(path, "w") as f:
        json.dump(obj, f)


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True,
         "spark_rows": 1, "oracle_rows": 1, "err": None}
RED = {**GREEN, "hash_match": False}


def test_manifest_current_hash_counts(repo):
    ops = all_ops()
    _write(repo / "GRADED.json", {
        "r01": ["agg_hash"],
        "hashes": {"agg_hash": op_source_hash(ops["agg_hash"])},
    })
    assert "agg_hash" in entry._graded_names()


def test_manifest_stale_hash_requeues(repo):
    _write(repo / "GRADED.json", {
        "r01": ["agg_hash"],
        "hashes": {"agg_hash": "0000000000000000"},
    })
    assert "agg_hash" not in entry._graded_names()


def test_newer_correctness_file_counts_without_merge(repo):
    _write(repo / "GRADED.json", {"r01": [], "hashes": {}})
    _write(repo / "CORRECTNESS_r02.json", {"join_left": GREEN})
    assert "join_left" in entry._graded_names()


def test_older_correctness_file_is_ignored(repo):
    # r01 already merged into the manifest; a lingering CORRECTNESS_r01
    # must not resurrect an op the manifest has re-queued (hash guard).
    _write(repo / "GRADED.json", {"r01": [], "hashes": {}})
    _write(repo / "CORRECTNESS_r01.json", {"join_left": GREEN})
    assert "join_left" not in entry._graded_names()


def test_newer_correctness_overrides_stale_manifest_hash(repo):
    # Op edited since its manifest grade (stale hash) but the DRIVER
    # re-graded it green in a round newer than the last merge — the
    # newer evidence wins (it post-dates the edit the manifest saw).
    _write(repo / "GRADED.json", {
        "r01": ["agg_hash"],
        "hashes": {"agg_hash": "0000000000000000"},
    })
    _write(repo / "CORRECTNESS_r02.json", {"agg_hash": GREEN})
    assert "agg_hash" in entry._graded_names()


def test_red_row_never_counts(repo):
    _write(repo / "GRADED.json", {"r01": [], "hashes": {}})
    _write(repo / "CORRECTNESS_r02.json", {"join_left": RED})
    assert "join_left" not in entry._graded_names()


def test_no_oracle_row_requeues_once_op_gains_oracle(repo):
    # r5 advisor: a rows-only green (err == "no_oracle") is only the
    # strongest-possible check WHILE the op has no oracle. Every
    # registry op currently carries an oracle, so a glob-discovered
    # no_oracle row (written before the op was oracle-ized) must NOT
    # keep the slot — the op re-earns a real value-hash green.
    _write(repo / "GRADED.json", {"r01": [], "hashes": {}})
    _write(repo / "CORRECTNESS_r02.json",
           {"join_left": {**GREEN, "err": "no_oracle", "hash_match": None}})
    assert "join_left" not in entry._graded_names()


def test_glob_row_trusted_only_while_fingerprint_matches_snapshot(repo):
    # r5 advisor: glob-discovered rows carry no fingerprint, so they
    # are checked against OPHASHES.json (the snapshot taken at the
    # final commit the driver graded). Matching snapshot → trusted;
    # stale snapshot (op edited since) → re-queued.
    ops = all_ops()
    _write(repo / "GRADED.json", {"r01": [], "hashes": {}})
    _write(repo / "CORRECTNESS_r02.json", {"join_left": GREEN})
    _write(repo / "OPHASHES.json",
           {"join_left": op_source_hash(ops["join_left"])})
    assert "join_left" in entry._graded_names()
    _write(repo / "OPHASHES.json", {"join_left": "0000000000000000"})
    assert "join_left" not in entry._graded_names()


def test_glob_row_trusted_when_snapshot_missing(repo):
    # Pre-sidecar fallback: with no OPHASHES.json the old trusting
    # behavior applies (documented residual, closed once the sidecar
    # is committed alongside the code).
    _write(repo / "GRADED.json", {"r01": [], "hashes": {}})
    _write(repo / "CORRECTNESS_r02.json", {"join_left": GREEN})
    assert "join_left" in entry._graded_names()


def test_hard_error_row_does_not_count(repo):
    _write(repo / "GRADED.json", {"r01": [], "hashes": {}})
    _write(repo / "CORRECTNESS_r02.json",
           {"join_left": {**GREEN, "err": "Py4JJavaError: boom"}})
    assert "join_left" not in entry._graded_names()


def test_window_orders_ungraded_first(repo):
    ops = all_ops()
    graded_now = {
        n: op_source_hash(o) for n, o in list(ops.items())
    }
    # mark everything graded EXCEPT two sentinels from different families
    sentinels = ["join_left", "agg_hash"]
    manifest_names = [n for n in graded_now if n not in sentinels]
    _write(repo / "GRADED.json", {
        "r01": manifest_names,
        "hashes": {n: graded_now[n] for n in manifest_names},
    })
    first = list(entry.queries())[: len(sentinels)]
    assert set(first) == set(sentinels)
