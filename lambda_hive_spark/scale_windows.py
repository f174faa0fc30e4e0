"""Exact global window functions without a single-partition sort.

Problem: `Window.orderBy(...)` with no `partitionBy` is the one Spark
construct that silently serializes — WindowExec requires all rows in
one partition, so a global row_number/ntile/lag over a corpus-sized
input funnels 100 TB through a single task. Catalyst plans the global
SORT in parallel (range partitioning) but the WINDOW on top of it
still collapses to `Exchange SinglePartition`.

Fix (the classic two-phase rank): pick a BUCKET — a coarse,
order-aligned prefix of the total order — then

  1. hash-partition on the bucket and run the window WITHIN buckets
     (parallel: one task per bucket, never the whole input),
  2. compute per-bucket row counts, order the bucket summary, and turn
     it into cumulative OFFSETS (this window IS single-partition, but
     over the bucket summary — bounded by construction, not by data),
  3. broadcast-join the offsets back: global = offset(bucket) + local.

Equality with the single-partition plan is exact, not approximate,
because the bucket is an order prefix: rows with equal bucket tuples
are contiguous in the total order and bucket-tuple order equals the
group order, so offset+local enumerates the identical permutation.
Every call site must supply a deterministic TOTAL order (tiebreaker
included) — same requirement the oracle hash-match already imposes.

Bucket contract (caller's obligation, asserted nowhere — it is a
statement about the data's order, which only the caller knows):
  - every bucket component except the last must be an EXACT copy of
    the corresponding total-order component; only the LAST component
    may be a monotone coarsening (e.g. floor(x/1000)) of the next
    order component. A coarsened non-final component would interleave
    buckets across the total order and break contiguity.
  - bucket cardinality must be bounded and small relative to the data
    (target ≤ ~1e5 tuples): the summary table is what flows through
    the one single-partition window and the broadcast. Pick the
    coarsening width accordingly at deployment scale; exactness never
    depends on the width, only the summary size does.
  - adding an exact-prefix component plus a coarsened tiebreak
    component (e.g. [(key, 'asc'), (floor(id/65536), 'asc')]) is the
    skew escape hatch when the primary component has heavy ties
    (NULL-heavy dates, low-cardinality counts): ties then spread
    across sub-buckets instead of piling into one task.
  - if the primary component is ITSELF a coarsening (a band), a
    tiebreak component may only split bands where the underlying
    order value is constant — make it conditional, e.g.
    when(x.isNull(), floor(id/65536)).otherwise(0) splits the NULL
    band (x constant there) while leaving real bands whole. An
    unconditional tiebreak under a band would reorder rows within
    the band and break contiguity.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DIR = {
    "asc": F.asc,
    "asc_nulls_first": F.asc_nulls_first,
    "asc_nulls_last": F.asc_nulls_last,
    "desc": F.desc,
    "desc_nulls_first": F.desc_nulls_first,
    "desc_nulls_last": F.desc_nulls_last,
}

# Internal column names: underscore-prefixed and helper-scoped; ops
# never expose them (each helper drops its working columns before
# returning).
_B = "_sw_b"  # bucket component prefix
_OB = "_sw_ob"  # offsets-side bucket copy prefix


def _tag(df: DataFrame, buckets: list[tuple[Column, str]]) -> tuple[DataFrame, list[str]]:
    names = [f"{_B}{i}" for i in range(len(buckets))]
    return df.withColumns({n: b for n, (b, _) in zip(names, buckets)}), names


def _offsets(
    tagged: DataFrame, names: list[str], buckets: list[tuple[Column, str]]
) -> DataFrame:
    """Bucket summary → (bucket, cumulative offset, grand total).

    Both windows here are unpartitioned ON PURPOSE: they run over the
    bucket summary, whose size is the caller-bounded bucket
    cardinality, never over the input.
    """
    counts = tagged.groupBy(*names).agg(F.count(F.lit(1)).alias("_sw_n"))
    order = [_DIR[d](F.col(n)) for n, (_, d) in zip(names, buckets)]
    w_off = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy(F.lit(0))
    return counts.select(
        *[F.col(n).alias(f"{_OB}{i}") for i, n in enumerate(names)],
        F.coalesce(F.sum("_sw_n").over(w_off), F.lit(0)).cast("long").alias("_sw_off"),
        F.sum("_sw_n").over(w_all).cast("long").alias("_sw_total"),
    )


def _join_offsets(tagged: DataFrame, offsets: DataFrame, names: list[str]) -> DataFrame:
    cond = reduce(
        Column.__and__,
        [
            tagged[n].eqNullSafe(offsets[f"{_OB}{i}"])
            for i, n in enumerate(names)
        ],
    )
    out = tagged.join(F.broadcast(offsets), cond)
    for i in range(len(names)):
        out = out.drop(f"{_OB}{i}")
    return out


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    buckets: list[tuple[Column, str]],
    rn_col: str = "rn",
) -> DataFrame:
    """df + `rn_col` = 1-based global row_number over the total order
    `order_cols`, computed bucket-parallel (module doc). Output is
    bit-identical to `F.row_number().over(Window.orderBy(*order_cols))`
    whenever the order is total and `buckets` honors the contract."""
    tagged, names = _tag(df, buckets)
    offsets = _offsets(tagged, names, buckets)
    local = F.row_number().over(Window.partitionBy(*names).orderBy(*order_cols))
    out = _join_offsets(tagged.withColumn("_sw_lrn", local), offsets, names)
    out = out.withColumn(rn_col, (F.col("_sw_off") + F.col("_sw_lrn")).cast("long"))
    return out.drop(*names, "_sw_lrn", "_sw_off", "_sw_total")


def global_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: list[Column],
    buckets: list[tuple[Column, str]],
    tile_col: str = "tile",
) -> DataFrame:
    """df + `tile_col` = `F.ntile(n_tiles).over(Window.orderBy(...))`,
    bucket-parallel and exact. Spark's ntile is row_number-based (ties
    ignored): with n rows, the first n%k tiles get ceil(n/k) rows and
    the rest floor(n/k); this reproduces that assignment from the
    two-phase global rn and the grand total carried on the broadcast
    offsets row — same rows, same tiles, no single-partition window."""
    tagged, names = _tag(df, buckets)
    offsets = _offsets(tagged, names, buckets)
    local = F.row_number().over(Window.partitionBy(*names).orderBy(*order_cols))
    out = _join_offsets(tagged.withColumn("_sw_lrn", local), offsets, names)
    rn = F.col("_sw_off") + F.col("_sw_lrn")
    n = F.col("_sw_total")
    k = F.lit(n_tiles).cast("long")
    base = F.floor(n / k)  # rows in the small tiles
    rem = n % k  # number of big (base+1) tiles, placed first
    cut = rem * (base + F.lit(1))  # rows covered by the big tiles
    tile = F.when(
        rn <= cut, F.floor((rn - 1) / (base + 1)) + 1
    ).otherwise(
        # greatest() guards the unused branch when n < k (base = 0 ⇒
        # cut = n ⇒ the when-branch always fires); ANSI mode would
        # otherwise raise DIVIDE_BY_ZERO evaluating the dead branch.
        rem + F.floor((rn - cut - 1) / F.greatest(base, F.lit(1))) + 1
    )
    out = out.withColumn(tile_col, tile.cast("int"))
    return out.drop(*names, "_sw_lrn", "_sw_off", "_sw_total")


def global_lag_over_keys(
    df: DataFrame,
    key: str,
    bucket_width: int,
    prev_col: str = "prev_k",
) -> DataFrame:
    """df + `prev_col` = `F.lag(key).over(Window.orderBy(key))` for a
    NUMERIC key, bucket-parallel and exact: lag within
    floor(key/width) buckets, then stitch each bucket's first row to
    the running max of all lower buckets (bounded summary — running
    max, not lag, so empty buckets in the floor range cost nothing).
    `bucket_width` trades summary size against per-bucket task size;
    pick it so keyspace/width ≲ 1e5 at deployment scale — exactness is
    width-independent.

    NULL keys are exact too, matching Spark's ASC nulls-first default:
    floor(NULL/w) = NULL routes them to one dedicated bucket that the
    null-safe join keeps and the summary window orders first, so NULL
    rows lag to NULL (their in-bucket lag of a NULL key) and the first
    non-NULL row lags to max(NULL)=NULL via the running-max stitch —
    identical to the single-partition reference on both sides."""
    bucket = F.floor(F.col(key) / F.lit(bucket_width))
    tagged = df.withColumn(f"{_B}0", bucket)
    local = F.lag(key).over(Window.partitionBy(f"{_B}0").orderBy(key))
    summary = tagged.groupBy(f"{_B}0").agg(F.max(key).alias("_sw_bmax"))
    # Running max over buckets strictly below — the summary is the
    # bounded table; this unpartitioned window never sees the input.
    w_prev = Window.orderBy(f"{_B}0").rowsBetween(Window.unboundedPreceding, -1)
    boundary = summary.select(
        F.col(f"{_B}0").alias(f"{_OB}0"),
        F.max("_sw_bmax").over(w_prev).alias("_sw_pmax"),
    )
    # eqNullSafe, as in _join_offsets: a plain == would silently drop
    # the NULL-key bucket and break equivalence for nullable keys.
    out = tagged.withColumn("_sw_ll", local).join(
        F.broadcast(boundary), F.col(f"{_B}0").eqNullSafe(F.col(f"{_OB}0"))
    )
    out = out.withColumn(prev_col, F.coalesce("_sw_ll", "_sw_pmax"))
    return out.drop(f"{_B}0", f"{_OB}0", "_sw_ll", "_sw_pmax")
