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


# 2^51: the largest micros magnitude where the double product is
# provably within 0.5 of the exact integer (see hier_exact_agg's
# docstring for the derivation and the out-of-domain NULL contract).
MICROS_GUARD = "2251799813685248.0D"


def _micros_product(expr: str, scale: int) -> str:
    return f"(CAST(({expr}) AS DOUBLE) * {10**scale}.0D)"


def sql_micros_sum(expr: str, scale: int = 6) -> str:
    """Partial-level long-micros sum of a money expression (Spark SQL):
    round-half-away(x·10^scale) accumulated as BIGINT, NULL outside
    the 2^51 exact-arithmetic domain. Pair with `sql_micros_final` on
    the partial column for the decimal-exact merge."""
    m = _micros_product(expr, scale)
    half_away = f"CAST(SIGN({m}) * FLOOR(ABS({m}) + 0.5D) AS BIGINT)"
    return f"SUM(CASE WHEN ABS({m}) < {MICROS_GUARD} THEN {half_away} END)"


def sql_micros_count(expr: str, scale: int = 6) -> str:
    """Denominator twin of `sql_micros_sum`: count exactly the rows
    the sum admitted, so guard-nulled rows don't skew an avg low."""
    return f"COUNT(CASE WHEN ABS({_micros_product(expr, scale)}) < {MICROS_GUARD} THEN 1 END)"


def sql_micros_final(partial_col: str, scale: int = 6) -> str:
    """Final-level merge of long-micros partials: exact decimal sum,
    one decimal division back to value units, nearest-double emit —
    bit-identical to dsum on the same data."""
    div = f"CAST({10**scale} AS DECIMAL(7,0))"
    return f"CAST(SUM(CAST({partial_col} AS DECIMAL(38,0))) / {div} AS DOUBLE)"


def flat_exact_agg(
    df,
    keys: list[str],
    sums: list[tuple[str, str]] = (),
    avgs: list[tuple[str, str]] = (),
    count_star: str | None = None,
    scale: int = 6,
):
    """SINGLE-level exact grouped aggregation — same bit-identical
    doubles as hier_exact_agg/dsum, one fewer aggregate pass and one
    fewer Exchange: Catalyst's own partial/final BIGINT sum does the
    map-side combine on the bare group key, so the plan is
    scan → partial agg → ONE exchange → final agg (the r8
    agg_partial_final/agg_pivot rewrite, generalized to multi-sum/avg
    shapes — measured 1.33×/1.47× over the two-level form at the 100×
    tier there).

    PRECONDITION — KEY-BOUNDED GROUPS ONLY. The long total here is per
    GROUP, so a group whose row count grows with the corpus (Q1's six
    (returnflag, linestatus) groups, a per-(region, nation) rollup)
    overflows 2^63 micros at large corpus sizes: Q1's groups reach 31%
    of the bound already at the local 1000× tier and overflow ~300× at
    100 TB (r10 adjudication, tools/r10_q1_variants.py — measured
    1.67× faster locally and still rejected). try_sum keeps the
    failure visible (NULL, never a wrap), but an op that NULLs at
    target scale is the wrong design: use hier_exact_agg (partition-
    bounded partials, unbounded decimal merge) for corpus-sized
    groups. agg_partial_final (per-suppkey) and agg_pivot (per-user)
    are the key-bounded shapes this form is for.

    vs hier_exact_agg this additionally DEDUPLICATES source
    expressions: a column used by both a sum and an avg (e.g. Q1's
    l_quantity) accumulates ONE long total instead of two — the
    two-level form materialized `_m_sum_qty` and `_m_avg_qty`
    separately, paying the guarded-micros expression twice per row.

    Exactness: identical contract to hier_exact_agg (per-row
    half-away long micros under the 2^51 guard, one decimal division
    at emit → the same nearest-double as sql_dsum). The long total is
    per GROUP rather than per (group, partition): bound 2^63 micros ≈
    9.2e12 value units, FAIL-VISIBLE via try_sum (an overflowing
    group emits NULL and hash-mismatches any oracle, never wraps).
    For genuinely unbounded heavy-hitter keys, hier_exact_agg's
    per-partition partials + unbounded decimal merge remain the
    fallback — that is the one reason to keep the two-level form.

    avgs divide the shared micros total by the count of guard-admitted
    rows (COUNT of the same CASE the sum admits) — exactly
    hier_exact_agg's count denominator, so NaN/Inf/out-of-domain rows
    drop from numerator and denominator alike. The count accumulator
    is ALSO keyed on the source expression (ADVICE r10): two avgs over
    the same expr share one COUNT buffer, consistent with the micros
    dedup.

    Internal aliases are `__lhs_`-prefixed (ADVICE r10: the old bare
    `_m0`/`_c0` could collide with caller columns since groupBy/select
    resolve by name)."""
    aggs: list = []
    finals: list[str] = []
    shared: dict[str, str] = {}  # source expr -> micros-total alias
    shared_counts: dict[str, str] = {}  # source expr -> guard-count alias
    div = f"CAST({10**scale} AS DECIMAL(7,0))"

    def _emit(alias: str) -> str:
        # the group total is already in `alias` — one exact decimal
        # division, nearest-double emit (same arithmetic as
        # sql_micros_final, minus its merge-level SUM)
        return f"CAST(CAST({alias} AS DECIMAL(38,0)) / {div} AS DOUBLE)"

    def _m_alias(expr: str) -> str:
        if expr not in shared:
            alias = f"__lhs_m{len(shared)}"
            shared[expr] = alias
            m = _micros_product(expr, scale)
            half_away = f"CAST(SIGN({m}) * FLOOR(ABS({m}) + 0.5D) AS BIGINT)"
            aggs.append(
                F.expr(
                    f"try_sum(CASE WHEN ABS({m}) < {MICROS_GUARD} "
                    f"THEN {half_away} END) AS {alias}"
                )
            )
        return shared[expr]

    def _c_alias(expr: str) -> str:
        if expr not in shared_counts:
            alias = f"__lhs_c{len(shared_counts)}"
            shared_counts[expr] = alias
            aggs.append(F.expr(f"{sql_micros_count(expr, scale)} AS {alias}"))
        return shared_counts[expr]

    for name, expr in sums:
        finals.append(f"{_emit(_m_alias(expr))} AS {name}")
    for name, expr in avgs:
        finals.append(f"({_emit(_m_alias(expr))} / {_c_alias(expr)}) AS {name}")
    if count_star is not None:
        aggs.append(F.expr(f"COUNT(*) AS {count_star}"))
        finals.append(count_star)
    return df.groupBy(*keys).agg(*aggs).select(*keys, *[F.expr(e) for e in finals])


def hier_exact_agg(
    df,
    keys: list[str],
    sums: list[tuple[str, str]] = (),
    avgs: list[tuple[str, str]] = (),
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

    `avgs` divide by the count of rows the micros guard admitted —
    for in-contract data that IS the non-null count (COUNT(expr),
    mirroring sql_davg exactly); guard-nulled rows (NaN/Inf/out-of-
    domain) are excluded from numerator and denominator alike.

    Per-row micros are ARITHMETIC, not a decimal cast: Spark's
    double→decimal cast routes through Double.toString + BigDecimal
    per row (~150 ns), which made the cast itself the scan bottleneck
    (the sf0.1 single-file flagship scan is one task). For the data
    class this helper is documented for — nearest-doubles of values
    with ≤`scale` decimal digits AND |x·10^scale| < 2^51 (~2.25e9 in
    value units at scale 6) — `x·10^scale` lands within ≪0.5 of the
    exact integer (error k·2^-52 < 0.5 only while the integer part
    k < 2^51), so round-half-away(x·10^scale) in pure double ops
    yields the IDENTICAL long the decimal cast produced, ~30× cheaper.
    Above 2^51 micros the double product (and FLOOR past 2^53) can be
    ULP-off the exact decimal, so the CASE guard NULLS those rows
    outright — out-of-domain values collapse to NULL rather than
    silently diverging (same observable behavior as NaN/±Inf, and as
    the old decimal(18,s) cast's overflow-null, just at the honest
    boundary). Avgs exclude guard-nulled rows from BOTH the sum and
    the count, mirroring how AVG(decimal) skips cast-nulled values.
    Full-precision doubles (7+ significant decimals at the target
    scale) are OUTSIDE this helper's contract (both engines' decimal
    casts already diverge there — see the stats.py module doc); use
    dsum for those, and for |x| beyond the 2^51-micros domain.

    `sums`/`avgs` take SQL STRING expressions (not Columns): each
    partial/final is then a single F.expr py4j call, vs ~10 Column-API
    round-trips each — measured 220 ms → ~40 ms of driver-side plan
    construction on the flagship (7 aggregates). On a sub-second query
    that build time was a third of the wall clock.
    """
    partials, finals = [], []
    # r10: one long-micros partial per DISTINCT source expression — a
    # column used by both a sum and an avg (Q1's l_quantity,
    # l_extendedprice) previously accumulated twice; sharing the
    # partial drops Q1 from 7 to 5 micros accumulators in the per-row
    # hot loop. Values are unchanged by construction (the merge sums
    # the identical partial column).
    shared: dict[str, str] = {}

    def _m_col(expr: str) -> str:
        if expr not in shared:
            alias = f"__lhs_m{len(shared)}"
            shared[expr] = alias
            partials.append(F.expr(f"{sql_micros_sum(expr, scale)} AS {alias}"))
        return shared[expr]

    # Internal aliases are `__lhs_`-prefixed (ADVICE r10: bare _m0/_pid
    # could collide with caller column names); all are dropped by the
    # final-level groupBy, so outputs are unchanged.
    for name, expr in sums:
        finals.append(F.expr(f"{sql_micros_final(_m_col(expr), scale)} AS {name}"))
    for name, expr in avgs:
        alias = _m_col(expr)
        partials.append(F.expr(f"{sql_micros_count(expr, scale)} AS __lhs_c_{name}"))
        finals.append(
            F.expr(f"{sql_micros_final(alias, scale)} / SUM(__lhs_c_{name}) AS {name}")
        )
    if count_star is not None:
        partials.append(F.expr("COUNT(*) AS __lhs_n"))
        finals.append(F.expr(f"SUM(__lhs_n) AS {count_star}"))
    return (
        df.groupBy(*keys, F.expr("spark_partition_id() AS __lhs_pid"))
        .agg(*partials)
        .groupBy(*keys)
        .agg(*finals)
    )
