"""Float-parity helpers (SURVEY.md §5.1 rule 1, strengthened).

Problem: `sum(double)` is order-dependent; Spark (parallel partial
aggregation) and DuckDB (its own order) accumulate differently. At
sf0.01 the big money sums reach ~1e9, where accumulated ulp noise can
exceed the `round(x, 4)` granularity — rounding alone does NOT
guarantee hash-parity.

Fix: sum through DECIMAL. `CAST(x AS DECIMAL(38, s))` rounds the
identical IEEE double to the identical decimal on both engines (no
halfway ties exist: no double is exactly *.5e-s), decimal addition is
exact and order-independent, and the final `CAST(... AS DOUBLE)` is
nearest-double of the same exact decimal → bit-identical results on
both engines, at any parallelism, at any scale. This is also the right
100 TB answer: exact aggregation independent of partitioning.

Per-row arithmetic (e.g. `l_extendedprice*(1-l_discount)`) is safe in
double: both engines execute the same IEEE ops on the same inputs.
Only ACCUMULATION across rows needs the decimal detour.

Helpers come in pairs: a PySpark Column builder and a DuckDB SQL
string builder, generated from the same parameters so the two sides
cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18 digits total (scale 6 → 12 integer digits, values to 1e12): the
# per-row cast stays within Spark's compact-long decimal range, which
# is measurably faster than 128-bit decimal (0.81 s vs 0.94 s on the
# sf0.1 flagship agg). The SUM accumulator is auto-widened by both
# engines (Spark decimal(28,6), DuckDB decimal(38,6)) — still exact and
# order-independent to ~1e22, ample for 100 TB sums of 1e6-magnitude
# money values.
_PREC = 18


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent exact sum of a double column → double."""
    return F.sum(_c(col).cast(f"decimal({_PREC},{scale})")).cast("double")


def sql_dsum(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({_PREC},{scale}))) AS DOUBLE)"


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent avg: exact decimal sum / exact count, divided
    in double (identical IEEE division on both engines)."""
    return dsum(col, scale) / F.count(_c(col))


def sql_davg(expr: str, scale: int = 6) -> str:
    return f"({sql_dsum(expr, scale)} / COUNT({expr}))"


def r4(col: Column) -> Column:
    """Display rounding — for ROWS-ONLY ops. Never use in a sql-oracle
    op: Spark rounds the double's shortest decimal repr (BigDecimal
    HALF_UP) while DuckDB rounds the binary value (x*1e4 → rint), so
    identical inputs can round differently whenever the shortest repr
    terminates in a half at the target scale (common with 2-decimal
    money data: observed spark=101226.8121 vs duckdb=101226.812).
    Oracle-checked ops instead emit either raw per-row doubles
    (bit-identical IEEE ops) or decimal-exact aggregates (above) —
    both hash-match without any rounding."""
    return F.round(col, 4)


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float> columns: element products in
    double, accumulated strictly left-to-right (F.aggregate is a left
    fold) — bit-identical to the DuckDB mirror below. Stays fully
    JVM-side (higher-order functions, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def sql_dot(a: str, b: str) -> str:
    """DuckDB mirror of `dot`: same element-wise double products, same
    left-to-right fold via list_reduce → bit-identical doubles."""
    prods = (
        f"list_transform(range(1, len({a})+1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))"
    )
    return f"list_reduce({prods}, (acc, x) -> acc + x)"


def hier_exact_agg(
    df,
    keys: list[str],
    sums: list[tuple[str, "Column | str"]] = (),
    avgs: list[tuple[str, "Column | str"]] = (),
    count_star: str | None = None,
    scale: int = 6,
):
    """Two-level exact grouped aggregation — same values as dsum/davg,
    measured ~1.5× faster on the sf0.1 flagship (0.93 s vs 1.38 s for
    4 sums): the per-row hot loop accumulates LONG "micros"
    (value·10^scale as int64) per input partition, and only the tiny
    per-(group, partition) partials go through the decimal-exact merge.
    Decimal sum's 128-bit accumulator updates leave the hot path; the
    emitted double is the nearest double of the exact decimal sum —
    bit-identical to dsum's output, so oracles keep using sql_dsum/
    sql_davg unchanged.

    Exactness at 100 TB: a long partial overflows only if ONE input
    partition's sum exceeds 9.2e18 micros (9.2e12 in value units) —
    with 128 MB scan partitions and 1e4-magnitude money values that
    needs ~1e8 rows in a single partition, orders beyond any sane
    partition sizing; the decimal merge level is unbounded (~1e22).
    The partial grouping key includes spark_partition_id(), so the
    merge input is one row per (group, partition) — shuffle payload is
    unchanged vs the partial-aggregation Catalyst already plans.

    `avgs` divide by the non-null count of the same column
    (COUNT(expr) semantics — mirrors sql_davg exactly).
    """
    factor = 10**scale

    def micros(col):
        return F.sum((_c(col).cast(f"decimal({_PREC},{scale})") * factor).cast("long"))

    partials, finals = [], []
    for name, col in sums:
        partials.append(micros(col).alias(f"_m_{name}"))
        exact = F.sum(F.col(f"_m_{name}").cast("decimal(38,0)"))
        finals.append(
            (exact / F.lit(factor).cast("decimal(7,0)")).cast("double").alias(name)
        )
    for name, col in avgs:
        partials.append(micros(col).alias(f"_m_{name}"))
        partials.append(F.count(_c(col)).alias(f"_c_{name}"))
        exact = F.sum(F.col(f"_m_{name}").cast("decimal(38,0)"))
        finals.append(
            (
                (exact / F.lit(factor).cast("decimal(7,0)")).cast("double")
                / F.sum(f"_c_{name}")
            ).alias(name)
        )
    if count_star is not None:
        partials.append(F.count(F.lit(1)).alias("_n"))
        finals.append(F.sum("_n").alias(count_star))
    return (
        df.groupBy(*keys, F.spark_partition_id().alias("_pid"))
        .agg(*partials)
        .groupBy(*keys)
        .agg(*finals)
    )
