"""distinct_rows final §6 probe (VERDICT r10 item 5): the r8
decomposition blamed the scan's string materialization (dictionary-
encoded parquet strings become per-row UTF8Strings before the hash
distinct sees them; DuckDB's compressed execution never materializes).
One last pass over the reader-level levers before the watch item is
closed as an engine constant:

  base      committed plan (partial+final distinct, 1 Exchange)
  novec     spark.sql.parquet.enableVectorizedReader=false (the
            non-columnar reader path — expected slower; on record)
  batchsz   columnarReaderBatchSize 4096 -> 16384 (fewer batch
            boundaries per scan task)
  reorder   project (l_shipdate, flag, status) so the date column
            leads the distinct key (cheaper first-column compare),
            re-projected back to the declared order after the distinct
  scanfloor max(flag), max(status), max(shipdate) — no distinct at
            all: the pure materialization floor
  hashfloor distinct over xxhash64(flag,status,shipdate) — NOT exact
            (not adoptable), the in-engine lower bound for any
            hash-dedup that still materializes the strings

All at the 1000x corpus (the tier where distinct_rows is 6.2x DuckDB)
with interleaved runs and the 3% steal gate.

Usage: python tools/r11_distinct_probe.py [runs]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import (
    SCALE1000_SHIFT_GROUPS,
    SCALE1000_TABLES,
    _proc_stat_sample,
    _scale_corpus,
    _steal_pct,
)
from pyspark.sql import functions as F

from lambda_hive_spark.io import table
from lambda_hive_spark.session import get_spark

RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
MAX_STEAL = float(os.environ.get("SPARK_GRAFT_MAX_STEAL_PCT", "3.0"))
COLS = ["l_returnflag", "l_linestatus", "l_shipdate"]


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("r11_distinct_probe")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    s1k = _scale_corpus(spark, sf_dir, "scale1000", SCALE1000_TABLES,
                        SCALE1000_SHIFT_GROUPS)
    li = lambda: table(spark, s1k, "lineitem")  # noqa: E731

    def base():
        _noop(li().select(*COLS).distinct())

    def novec():
        spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
        try:
            _noop(li().select(*COLS).distinct())
        finally:
            spark.conf.set("spark.sql.parquet.enableVectorizedReader", "true")

    def batchsz():
        spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "16384")
        try:
            _noop(li().select(*COLS).distinct())
        finally:
            spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "4096")

    def reorder():
        _noop(
            li()
            .select("l_shipdate", "l_returnflag", "l_linestatus")
            .distinct()
            .select(*COLS)
        )

    def scanfloor():
        _noop(li().select(*[F.max(c).alias(c) for c in COLS]))

    def hashfloor():
        _noop(li().select(F.xxhash64(*COLS).alias("h")).distinct())

    variants = [
        ("base", base), ("novec", novec), ("batchsz", batchsz),
        ("reorder", reorder), ("scanfloor", scanfloor), ("hashfloor", hashfloor),
    ]
    for _, fn in variants:
        fn()  # warm-up
    samples = {name: [] for name, _ in variants}
    st0 = _proc_stat_sample()
    for _ in range(RUNS):
        for name, fn in variants:
            t0 = time.perf_counter()
            fn()
            samples[name].append(time.perf_counter() - t0)
    steal = _steal_pct(st0, _proc_stat_sample()) or 0.0
    b = statistics.median(samples["base"])
    for name, _ in variants:
        m = statistics.median(samples[name])
        print(f"{name:10s} {m:7.3f}s  vs base {b/m:5.2f}x")
    print(f"steal {steal:.2f}%{'  UNRELIABLE(>gate)' if steal > MAX_STEAL else ''}")
    spark.stop()
    if steal > MAX_STEAL:
        sys.exit(3)


if __name__ == "__main__":
    main()
