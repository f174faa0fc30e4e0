"""Mirror of the driver's t2 gate: every registered op with a sql
oracle is hash-compared against DuckDB at sf0.01 — the exact sf the
driver uses (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from lambda_hive_spark.registry import all_ops
from lambda_hive_spark.testing import assert_parity
from tests.conftest import SF_DIR

OPS = all_ops()
SQL_OPS = sorted(n for n, o in OPS.items() if o.oracle is not None)
ROWS_OPS = sorted(n for n, o in OPS.items() if o.oracle is None)


@pytest.mark.parametrize("name", SQL_OPS)
def test_sql_oracle_parity(spark, duck, name):
    o = OPS[name]
    assert_parity(o.fn(spark, SF_DIR), duck, o.oracle, name)


@pytest.mark.parametrize("name", ROWS_OPS)
def test_rows_only_runs(spark, name):
    """Ops without an oracle must at least run and return a stable
    schema with ≥0 rows (the driver's weaker check)."""
    df = OPS[name].fn(spark, SF_DIR)
    assert df.columns, name
    assert df.count() >= 0, name


@pytest.mark.parametrize("name", SQL_OPS)
def test_no_array_outputs_in_sql_ops(spark, name):
    """Policy: sql-oracle ops never emit array/map/struct columns —
    engines' pandas conversions represent them differently (numpy
    array vs list), which a naive driver-side hash would trip on.
    Serialize with concat_ws/array_to_string instead."""
    df = OPS[name].fn(spark, SF_DIR)
    for f in df.schema.fields:
        assert f.dataType.typeName() not in ("array", "map", "struct"), (
            f"{name}.{f.name} is {f.dataType.typeName()}"
        )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_hostile_session_timezone_repinned(spark, duck):
    """The driver hands us ITS SparkSession; if it carries a non-UTC
    session timezone, date-bucketing ops would hash-mismatch the UTC
    oracle unless the registry wrapper repins UTC at call time."""
    tz_ops = [
        n
        for n in (
            "fn_date",
            "stream_tumbling",
            "ts_gap_fill",
            "ts_interpolate_linear",
            "win_moving_median",
            "maintenance_cluster_by",
            "profile_drift_psi",
        )
        if n in OPS
    ]
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        for name in tz_ops:
            o = OPS[name]
            assert_parity(o.fn(spark, SF_DIR), duck, o.oracle, f"tz:{name}")
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
