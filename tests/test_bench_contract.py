"""bench.py contract test: the driver consumes ONE JSON line with
specific keys — run the real script as a subprocess at the smallest sf
and validate the shape (opt-in with the scale smoke flag: it costs a
full JVM spin-up)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_SMOKE") != "1",
    reason="opt-in (set SPARK_GRAFT_SCALE_SMOKE=1): spawns its own JVM",
)


def test_bench_emits_contract_json():
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    out = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1000:]
    line = out.stdout.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["metric"] == "headline_total_wall_sec"
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["value"] > 0
    assert set(payload["queries"]) == set(
        __import__("bench").HEADLINE
    )
    assert all(v > 0 for v in payload["queries"].values())
    assert payload["duckdb_total_sec"] > 0
    # multi-rowgroup section (VERDICT r2 item 8): same line, "scale" key
    assert payload["scale"]["metric"] == "scale_multirowgroup_total_wall_sec"
    assert set(payload["scale"]["queries"]) == set(__import__("bench").SCALE_HEADLINE)
    assert all(v > 0 for v in payload["scale"]["queries"].values())
    assert payload["scale"]["duckdb_total_sec"] > 0
