"""Round-9 staged ops, verified TODAY against their shipping oracles.

These run the exact t2 comparison the driver will run on registration
day (same DuckDB views, same order-insensitive compare as
tools/verify_driver.py), so lifting the freeze adds zero verification
work. The module under test is NOT in the registry (operators/__init__
omits it — asserted here so a stray import can never break the
round-8 freeze silently).
"""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in ["orders"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


def _compare(sdf, con, sql):
    ddf = con.execute(sql).fetchdf()
    pdf = sdf.toPandas()
    cols = sorted(pdf.columns)
    assert cols == sorted(ddf.columns)
    s = sorted(map(str, pdf[cols].itertuples(index=False, name=None)))
    d = sorted(map(str, ddf[cols].itertuples(index=False, name=None)))
    assert s == d


def test_r9_ops_are_registered():
    from lambda_hive_spark.registry import all_ops

    ops = all_ops()
    assert "lake_deletion_vector" in ops
    assert "catalog_txn_atomic" in ops
    assert "side_effect" in ops["lake_deletion_vector"].tags
    assert "side_effect" in ops["catalog_txn_atomic"].tags
    # round-9 lifted the round-8 freeze: 351 + staged pair +
    # join_star_bucketed + lake_update_where + events_global_seq;
    # round-10 build added the lake SQL surface (lake_sql_dml,
    # lake_sql_insert) and named refs (lake_named_refs) → 359
    assert len(ops) == 359


def test_lake_deletion_vector_matches_oracle(spark, duck):
    from lambda_hive_spark.operators.staged_r9 import (
        LAKE_DV_ORACLE,
        lake_deletion_vector,
    )

    _compare(lake_deletion_vector(spark, SF), duck, LAKE_DV_ORACLE)


def test_catalog_txn_atomic_matches_oracle(spark, duck):
    from lambda_hive_spark.operators.staged_r9 import (
        CATALOG_TXN_ORACLE,
        catalog_txn_atomic,
    )

    _compare(catalog_txn_atomic(spark, SF), duck, CATALOG_TXN_ORACLE)
