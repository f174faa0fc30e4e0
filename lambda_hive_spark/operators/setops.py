"""Set operations (SURVEY.md §2.7).

UNION ALL is a zero-shuffle plan concatenation; the DISTINCT variants
and INTERSECT/EXCEPT shuffle on the full row — at 100 TB prefer
pre-aggregated keys (as these queries do: they operate on key
projections, not whole rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_hive_spark.io import table
from lambda_hive_spark.registry import op


def _year_custkeys(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.filter(F.year("o_orderdate") == year).select("o_custkey")


_Y95 = "SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995"
_Y96 = "SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996"


@op(
    "union_all",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 250000.0
UNION ALL
SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 200000.0
""",
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — overlapping rows appear twice."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 250000.0).select("o_orderkey", "o_totalprice")
    b = o.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000.0)).select(
        "o_orderkey", "o_totalprice"
    )
    return a.unionByName(b)


@op("union_distinct", oracle=f"{_Y95} UNION {_Y96}")
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union."""
    return _year_custkeys(spark, sf_dir, 1995).union(_year_custkeys(spark, sf_dir, 1996)).distinct()


@op("intersect", oracle=f"{_Y95} INTERSECT {_Y96}")
def intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in both 1995 and 1996 (set semantics)."""
    return _year_custkeys(spark, sf_dir, 1995).intersect(_year_custkeys(spark, sf_dir, 1996))


@op("intersect_all", oracle=f"{_Y95} INTERSECT ALL {_Y96}")
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersect — multiplicity = min of the two sides."""
    return _year_custkeys(spark, sf_dir, 1995).intersectAll(_year_custkeys(spark, sf_dir, 1996))


@op("except_distinct", oracle=f"{_Y95} EXCEPT {_Y96}")
def except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: customers active in 1995 but not 1996."""
    return _year_custkeys(spark, sf_dir, 1995).subtract(_year_custkeys(spark, sf_dir, 1996))


@op("except_all", oracle=f"{_Y95} EXCEPT ALL {_Y96}")
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference — multiplicity-aware."""
    return _year_custkeys(spark, sf_dir, 1995).exceptAll(_year_custkeys(spark, sf_dir, 1996))
