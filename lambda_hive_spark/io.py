"""Table loaders for the fixture corpus (FIXTURES.md).

Load pattern prescribed by TESTDATA.md:14-15:
`spark.read.parquet(f"{sf_dir}/{name}.parquet")`. Schemas come from the
parquet footers — never `inferSchema` (SURVEY.md §1.2).

At 100 TB these reads become partitioned-directory scans; everything
downstream (predicate pushdown, column pruning, partition pruning) is
Catalyst's job because all operators are declarative (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor
# (region 5 rows, nation 25 — bounded by the real world, not by sf).
BROADCAST_DIMS = ("region", "nation")

# Fixture-parallelism note: each fixture is ONE parquet file with ONE
# row group, so a scan yields a single task. A real deployment reads a
# partitioned directory whose many files/row-groups give the scan
# natural parallelism. CPU-heavy operators (text shingling, hashing,
# vector math) call `par_table` to emulate that locally; everything
# else keeps the plain scan — measured at sf0.1, a blanket repartition
# costs cheap ops more in shuffle than the parallel map work saves.


def scan_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def par_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan + fan out to core-count partitions — for operators whose
    per-row compute dominates (the 100 TB scan would be split anyway)."""
    return table(spark, sf_dir, name).repartition(scan_parallelism())


# Catalog cache: `spark.read.parquet` re-lists the path and re-reads a
# footer for schema on EVERY call — measured 50-100 ms per table, so a
# 5-table join pays ~0.4 s of driver time before the first task runs. A
# real warehouse resolves tables through a catalog once; this cache is
# that catalog. DataFrames are immutable, so returning the same object
# is safe; the (mtime, size) stamp in the key self-invalidates when a
# fixture or scratch corpus is regenerated in-process.
_TABLE_CACHE: dict[tuple, DataFrame] = {}


def _path_stamp(path: str) -> tuple:
    try:
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return (0, 0)


def table_bytes(sf_dir: str, name: str) -> int:
    """On-disk parquet footprint of a fixture table (file or directory
    of part-files). A metadata-only stat used to pick join strategy at
    PLAN time: Spark's cost model happily broadcasts any post-filter
    side its size estimate puts under the threshold, but building a
    multi-million-row HashedRelation single-threaded on the driver
    costs seconds per execution — the real footprint is the honest
    signal the estimate lacks (measured: the 100×-orders broadcast
    made join_multiway 12.4 s vs 5.6 s shuffle-hash at the scale100
    tier, while sub-threshold fixtures keep the faster broadcast)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isfile(path):
        return os.stat(path).st_size
    total = 0
    try:
        for entry in os.scandir(path):
            if entry.is_file():
                total += entry.stat().st_size
    except OSError:
        return 0
    return total


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    key = (spark.sparkContext.applicationId, path, _path_stamp(path))
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        # Legacy corpus layout: events.ts was parquet TIMESTAMP(NANOS),
        # which Spark 4 refuses to read natively (PARQUET_TYPE_ILLEGAL).
        # The conf is a no-op for the current µs layout but keeps old
        # checkouts of the corpus loadable.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = _normalize_timestamps(spark.read.parquet(path))
    _TABLE_CACHE[key] = df
    return df


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Pin the corpus' timestamp columns to TimestampType regardless of
    the parquet physical layout the driver generated them with.

    Two layouts exist across corpus generations (FIXTURES.md):
    - TIMESTAMP(NANOS) (events.ts, old): Spark 4 reads it as long via
      `nanosAsLong`; convert with INTEGER division (epoch-ns ~1.7e18
      exceeds double's 2^53 — float division would corrupt µs).
    - timestamp[us] isAdjustedToUTC=false (current): Spark reads
      TIMESTAMP_NTZ; cast to TIMESTAMP. The session timezone is pinned
      to UTC (session.py), so the cast maps wall-clock→instant 1:1 and
      every downstream op keeps seeing the exact instants the old
      layout produced — and DuckDB (naive µs either way) agrees.
    """
    for col, dtype in df.dtypes:
        if col == "ts" and dtype == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Mirror the driver's DuckDB pre-registered views so `spark.sql`
    strings can name bare tables (SURVEY.md §3 entry point 3)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
