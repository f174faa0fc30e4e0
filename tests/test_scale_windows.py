"""scale_windows.py equivalence contract: the two-phase bucket-parallel
global window forms must be BIT-identical to the single-partition
`Window.orderBy(...)` plans they replace — six graded ops were restamped
on exactly that claim (r9 audit), so it stays machine-checked here over
seeded randomized data covering the hazards: NULLs in the primary order
column (nulls-first placement), heavy ties, descending orders, coarse
tiebreak sub-buckets, n < k ntiles, and sparse keys with empty buckets
in the floor range.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lambda_hive_spark.scale_windows import (
    global_lag_over_keys,
    global_ntile,
    global_row_number,
)


@pytest.fixture(scope="module")
def rdf(spark):
    rng = random.Random(20260816)
    rows = [
        (
            i,
            rng.randint(0, 40),  # heavy ties
            rng.choice([None, None, rng.randint(0, 9)]),  # ~2/3 NULL
            rng.uniform(-500.0, 500.0),
        )
        for i in range(3000)
    ]
    return spark.createDataFrame(
        rows, "id long, v long, d long, x double"
    ).repartition(16).cache()


def _same(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_row_number_matches_single_partition(rdf):
    ref = rdf.withColumn(
        "rn", F.row_number().over(Window.orderBy("v", "id")).cast("long")
    )
    got = global_row_number(
        rdf,
        [F.col("v"), F.col("id")],
        [(F.col("v"), "asc"), (F.floor(F.col("id") / 256), "asc")],
        "rn",
    )
    assert _same(ref, got)


def test_row_number_desc_coarse_only_bucket(rdf):
    ref = rdf.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.desc("x"), F.desc("id"))).cast("long"),
    )
    got = global_row_number(
        rdf,
        [F.desc("x"), F.desc("id")],
        [(F.floor(F.col("x") / 50), "desc")],
        "rn",
    )
    assert _same(ref, got)


@pytest.mark.parametrize("k", [4, 5, 7, 2999, 3001])
def test_ntile_matches_spark_semantics(rdf, k):
    """Covers balanced tiles, n%k remainders, and both n<k edges
    around the 3000-row fixture."""
    ref = rdf.withColumn(
        "t", F.ntile(k).over(Window.orderBy(F.asc_nulls_first("d"), "id"))
    )
    got = global_ntile(
        rdf,
        k,
        [F.asc_nulls_first("d"), F.col("id")],
        [(F.col("d"), "asc_nulls_first"), (F.floor(F.col("id") / 256), "asc")],
        "t",
    )
    assert _same(ref, got)


def test_lag_matches_including_empty_buckets(rdf):
    # multiply keys out so the floor-bucket range has holes
    ks = rdf.select((F.col("id") * 13 % 9973).alias("k")).distinct()
    ref = ks.withColumn("p", F.lag("k").over(Window.orderBy("k")))
    got = global_lag_over_keys(ks, "k", 128, "p")
    assert _same(ref, got)


def test_lag_matches_with_null_keys(rdf):
    """NULL keys must route through the eqNullSafe bucket join, not be
    silently dropped (ADVICE r9): floor(NULL/w)=NULL is one dedicated
    nulls-first bucket, and both the NULL rows' lag (NULL) and the
    first non-NULL row's lag (the preceding NULL key) must match the
    single-partition reference exactly — Spark's ASC nulls-first
    default makes both sides agree."""
    ks = rdf.select(
        F.when(F.col("d").isNull() & (F.col("id") % 7 == 0), F.lit(None))
        .otherwise(F.col("id") * 13 % 9973)
        .alias("k")
    ).distinct()
    assert ks.where(F.col("k").isNull()).count() == 1  # NULL present
    ref = ks.withColumn("p", F.lag("k").over(Window.orderBy("k")))
    got = global_lag_over_keys(ks, "k", 128, "p")
    assert _same(ref, got)
    # row-count parity guards the "dropped rows" failure mode directly
    assert got.count() == ks.count()


def test_no_single_partition_exchange_over_input(rdf):
    """The whole point: the input-sized side never crosses an
    `Exchange SinglePartition`; only the bounded bucket summary does
    (exactly one per helper application)."""
    got = global_row_number(
        rdf,
        [F.col("v"), F.col("id")],
        [(F.col("v"), "asc"), (F.floor(F.col("id") / 256), "asc")],
        "rn",
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange SinglePartition") == 1
    assert "hashpartitioning(_sw_b" in plan
