"""Pin agg_pivot's explicit-values semantics under the INT-code rewrite.

Round 6 rewrote agg_pivot (operators/advagg.py) to map event_type to an
integer code before the level-1 micros aggregation so HashAggregateExec's
fast two-level hash map engages.  Types outside the static 5-value list
(and NULL) share code 5 and are dropped at level 2.  The fixture corpus
only ever contains the 5 known types, so that ELSE branch is unexercised
by the parity sweeps — these tests drive it directly:

- an unknown type's value must not leak into any output column;
- a user whose ONLY events carry unknown/NULL types still appears, with
  every pivot column NULL (matching `groupBy().pivot(col, values)` with
  explicit values, and matching the SUM(CASE WHEN ...) oracle, both of
  which keep the group row);
- known-type values for the same user are unaffected by the unknown
  rows sharing the group.
"""

from __future__ import annotations

import datetime

from lambda_hive_spark.operators.advagg import _EVENT_TYPES, agg_pivot


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_unknown_and_null_types_drop_but_group_row_survives(spark, tmp_path):
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        # user 1: one known event per type plus poison rows that must not leak
        *[(i, ts, 1, t, 10.0 + i, "{}") for i, t in enumerate(_EVENT_TYPES)],
        (100, ts, 1, "mystery", 9999.0, "{}"),
        (101, ts, 1, None, 8888.0, "{}"),
        # user 2: ONLY unknown/NULL types -> row kept, all columns NULL
        (200, ts, 2, "mystery", 7777.0, "{}"),
        (201, ts, 2, None, 6666.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {r["user_id"]: r for r in agg_pivot(spark, str(tmp_path)).collect()}

    assert set(out) == {1, 2}
    for i, t in enumerate(_EVENT_TYPES):
        assert out[1][t] == 10.0 + i  # known values intact, no poison added
    assert all(out[2][t] is None for t in _EVENT_TYPES)


def test_matches_explicit_values_pivot(spark, tmp_path):
    """Bit-compare against Spark's own pivot(col, values) on the same data."""
    import pyspark.sql.functions as F

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (i, ts, i % 7, _EVENT_TYPES[i % 5] if i % 11 else "mystery", float(i) / 3, "{}")
        for i in range(500)
    ]
    _write_events(spark, tmp_path, rows)
    got = {r["user_id"]: r for r in agg_pivot(spark, str(tmp_path)).collect()}

    ref_df = (
        spark.read.parquet(str(tmp_path / "events.parquet"))
        .groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.sum(F.col("value").cast("decimal(38,6)")).cast("double"))
    )
    ref = {r["user_id"]: r for r in ref_df.collect()}

    assert set(got) == set(ref)
    for uid in ref:
        for t in _EVENT_TYPES:
            assert got[uid][t] == ref[uid][t], (uid, t)
