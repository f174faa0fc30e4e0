"""Time-series / hypertable operators (SURVEY.md §2.12 extension,
round 3): gap filling over a dense calendar grid, forward as-of
joins, and OHLC-style resampling — the query shapes a metrics/events
store runs constantly.

Scale notes: the calendar dimension is bounded by wall-clock reality
(30 years of days ≈ 11k rows) so it always broadcasts; per-key work
shuffles once on the key. Nothing here materializes on the driver.

Reference file:line: N/A — empty reference dir (SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lambda_hive_spark.helpers import dsum, sql_dsum
from lambda_hive_spark.io import table
from lambda_hive_spark.registry import op


@op(
    "ts_gap_fill",
    oracle="""
WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, value FROM events),
b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM e),
days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
grid AS (SELECT u.user_id, d.day FROM (SELECT DISTINCT user_id FROM e) u CROSS JOIN days d),
counts AS (SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY user_id, day)
SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
       COALESCE(c.n, 0) AS n_events
FROM grid g LEFT JOIN counts c ON g.user_id = c.user_id AND g.day = c.day
""",
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable gap filling: daily event counts per user with
    missing days ZERO-FILLED over the corpus's [min_day, max_day]
    calendar. The calendar is built from a 1-row bounds aggregate →
    sequence → explode, then broadcast-cross-joined with the distinct
    keys — the day dimension is wall-clock-bounded (a decade ≈ 3.7k
    rows), so the dense grid is keys × small-broadcast, never a
    fact-sized shuffle; the counts join shuffles once on
    (user_id, day)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    counts = ev.groupBy("user_id", "day").agg(F.count(F.lit(1)).alias("n_events"))
    bounds = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    days = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    users = ev.select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(days))
    return (
        grid.join(counts, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


@op(
    "join_asof_forward",
    oracle="""
WITH errors AS (
  SELECT user_id, ts, MAX(value) AS err_value
  FROM events WHERE event_type = 'error' GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.value AS purchase_value,
       (SELECT e.err_value FROM errors e
        WHERE e.user_id = p.user_id AND e.ts >= p.ts
        ORDER BY e.ts LIMIT 1) AS next_error_value
FROM purchases p
""",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each purchase, the EARLIEST error value
    by the same user at-or-after its timestamp (the mirror of
    join_asof's backward lookup — "what broke next"). Same union+window
    trick, reflected: first(ignorenulls) over [current, ∞) ordered by
    (ts, tag) with purchases tagged before errors at equal ts so the
    lookup is inclusive. One shuffle on user_id, O(1) window state.
    The oracle uses a correlated min-subquery (DuckDB's ASOF JOIN is
    backward-only in 1.0).

    Like join_asof, the carried payload is a STRUCT wrapping the error
    row: as-of picks the next error ROW (whose value may be NULL), so
    first(ignorenulls) must not skip past a null-valued error to a
    later non-null one."""
    ev = table(spark, sf_dir, "events")
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("err_value"))
        .select(
            "user_id", "ts", F.lit(1).alias("tag"),
            F.struct(F.col("err_value")).alias("err_row"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("purchase_value"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(0).alias("tag"),
        F.lit(None).cast("struct<err_value:double>").alias("err_row"),
        "event_id", F.col("value").alias("purchase_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = purchases.unionByName(errors).withColumn(
        "next_error_value",
        F.first("err_row", ignorenulls=True).over(w).getField("err_value"),
    )
    return merged.filter(F.col("tag") == 0).select(
        "event_id", "user_id", "purchase_value", "next_error_value"
    )


@op(
    "ts_resample_ohlc",
    oracle=f"""
WITH bucketed AS (
  SELECT user_id, time_bucket(INTERVAL 6 HOUR, ts) AS bucket, ts, event_id, value
  FROM events
),
ranked AS (
  SELECT user_id, bucket, value,
         row_number() OVER (PARTITION BY user_id, bucket ORDER BY ts, event_id) AS rn_open,
         row_number() OVER (PARTITION BY user_id, bucket ORDER BY ts DESC, event_id DESC) AS rn_close
  FROM bucketed
)
SELECT user_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
       MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
       MAX(value) AS high, MIN(value) AS low,
       MAX(CASE WHEN rn_close = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum("value")} AS volume
FROM ranked
GROUP BY user_id, bucket
""",
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling: per user per 6-hour bucket, the opening /
    highest / lowest / closing `value` plus count and decimal-exact
    volume — the candlestick shape every metrics store serves.
    Open/close pick the first/last row by the deterministic
    (ts, event_id) order via row_number (min_by/arg_min tie-break
    differently across engines; row_number over an explicit total
    order doesn't). One shuffle on (user_id, bucket)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.window("ts", "6 hours").start.alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    w_open = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    w_close = Window.partitionBy("user_id", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = ev.withColumn("rn_open", F.row_number().over(w_open)).withColumn(
        "rn_close", F.row_number().over(w_close)
    )
    return (
        ranked.groupBy("user_id", F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"))
        .agg(
            F.max(F.when(F.col("rn_open") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_close") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("volume"),
        )
    )


_EMA_N = 20  # EMA window depth (terms)


def _sql_ema_terms() -> tuple[str, str]:
    """DuckDB expression pair (weighted_sum, weight_sum) for the
    finite EMA: Sum_j value[t-j] * 2^-j over the last N rows. Built by
    the same loop as the Spark side so the two cannot drift."""
    num = " + ".join(
        f"COALESCE(lag(value, {j}) OVER w, 0) * POWER(0.5, {j})" for j in range(_EMA_N)
    )
    den = " + ".join(
        f"(CASE WHEN lag(value, {j}) OVER w IS NOT NULL THEN POWER(0.5, {j}) ELSE 0 END)"
        for j in range(_EMA_N)
    )
    return num, den


_EMA_NUM, _EMA_DEN = _sql_ema_terms()


@op(
    "ts_ema",
    oracle=f"""
SELECT user_id, event_id, value,
       CASE WHEN ({_EMA_DEN}) > 0
            THEN ({_EMA_NUM}) / ({_EMA_DEN}) END AS ema
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def ts_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average of each user's event values,
    alpha = 0.5 over the last 20 observations (weights 2^-j renormalized
    over the available prefix — pandas ewm(adjust=True) semantics,
    truncated at 20 terms where the weight is 1e-6 of the head).

    Float-parity design: alpha is DYADIC, so every weight 2^-j is an
    exact double and each product is an exact exponent shift; both
    engines evaluate the same left-to-right 20-term sum, giving
    bit-identical results — which is why this op can be hash-verified
    at all. The 20 lag() calls share one window spec, so Spark
    evaluates ONE window pass (single sort+shuffle on user_id), not 20.

    Scale: one shuffle on the partition key; state per row is O(N)
    lags inside the window operator — the standard streaming-friendly
    EMA shape. At 100 TB, partition by (user bucket, day) first."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    den = None
    for j in range(_EMA_N):
        lag_j = F.lag("value", j).over(w)
        term = F.coalesce(lag_j, F.lit(0.0)) * F.pow(F.lit(0.5), F.lit(j))
        wgt = F.when(lag_j.isNotNull(), F.pow(F.lit(0.5), F.lit(j))).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = wgt if den is None else den + wgt
    # A window whose observations are ALL NULL has zero total weight:
    # emit NULL instead of dividing by zero (ANSI mode hard-errors on
    # it; the oracle's CASE mirrors the same guard).
    return table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value",
        F.when(den > 0, num / den).alias("ema"),
    )


@op(
    "anomaly_mad",
    oracle="""
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
  FROM events e JOIN med m ON e.event_type = m.event_type
),
mad AS (
  SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_type,
       COUNT(*) AS n_events,
       COUNT(*) FILTER (WHERE d.adev > 3 * 1.4826 * m.mad) AS n_anomalies,
       ANY_VALUE(d.med) AS med,
       ANY_VALUE(m.mad) AS mad
FROM dev d JOIN mad m ON d.event_type = m.event_type
GROUP BY d.event_type
""",
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation: per
    event type, flag values whose deviation from the median exceeds
    3 sigma-equivalents (MAD x 1.4826). Median/MAD resist the outliers
    they hunt, unlike mean/stddev — the standard robust screen for
    corrupt metric streams.

    Float-parity: both engines interpolate the median identically on
    IEEE doubles (one rounding of the same exact midpoint), ABS/compare
    are exact, so the counts hash-match. Two grouped exact medians =
    two shuffles on event_type (a handful of groups); the flags join
    the tiny per-type table back via broadcast. At 100 TB swap the
    exact medians for percentile_approx (sketch_approx_quantiles) and
    the whole thing is one map-combinable pass."""
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy(F.col("event_type").alias("m_type")).agg(
        F.median("adev").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), F.col("event_type") == F.col("m_type"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("adev") > 3 * 1.4826 * F.col("mad"), 1)).alias(
                "n_anomalies"
            ),
            F.any_value("med").alias("med"),
            F.any_value("mad").alias("mad"),
        )
    )


@op(
    "ts_interpolate_linear",
    oracle=f"""
WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, value FROM events),
b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM e),
days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
grid AS (SELECT u.user_id, d.day FROM (SELECT DISTINCT user_id FROM e) u CROSS JOIN days d),
obs AS (
  SELECT user_id, day, {sql_dsum("value", 2)} / COUNT(*) AS v
  FROM e GROUP BY user_id, day
),
g AS (
  SELECT gr.user_id, gr.day, o.v,
         last_value(o.v IGNORE NULLS) OVER w_prev AS prev_v,
         last_value(CASE WHEN o.v IS NOT NULL THEN gr.day END IGNORE NULLS)
           OVER w_prev AS prev_day,
         first_value(o.v IGNORE NULLS) OVER w_next AS next_v,
         first_value(CASE WHEN o.v IS NOT NULL THEN gr.day END IGNORE NULLS)
           OVER w_next AS next_day
  FROM grid gr LEFT JOIN obs o ON gr.user_id = o.user_id AND gr.day = o.day
  WINDOW
    w_prev AS (PARTITION BY gr.user_id ORDER BY gr.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY gr.user_id ORDER BY gr.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
       ROUND(CASE
         WHEN v IS NOT NULL THEN v
         WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
           prev_v + (next_v - prev_v)
             * (CAST(date_diff('day', prev_day, day) AS DOUBLE)
                / CAST(date_diff('day', prev_day, next_day) AS DOUBLE))
       END, 6) AS v_filled,
       (v IS NULL AND prev_v IS NOT NULL AND next_v IS NOT NULL)
         AS interpolated
FROM g
""",
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of interior gaps in a per-user daily
    series (the hypertable `interpolate()` companion to ts_gap_fill's
    zero-fill): each missing day between two observations gets
    prev + (next − prev) · elapsed/span; boundary gaps (no observation
    on one side) stay NULL — no extrapolation.

    Determinism: per-day means use the decimal-exact sum (values are
    2-decimal) divided by an integer count; the bracketing scan is
    last/first IGNORE NULLS over the same day order on both engines;
    the interpolation formula is written with identical IEEE op order
    in both dialects, then rounded to 6 dp.

    Scale: the grid is keys × wall-clock-bounded days (same shape as
    ts_gap_fill — the calendar broadcasts); both windows run in ONE
    shuffle on user_id since they share partitioning, and Spark plans
    them as two Window nodes over a single Exchange."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "value"
    )
    bounds = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    days = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    grid = ev.select("user_id").distinct().crossJoin(F.broadcast(days))
    obs = ev.groupBy("user_id", "day").agg(
        (dsum("value", 2) / F.count(F.lit(1))).alias("v")
    )
    g = grid.join(obs, ["user_id", "day"], "left")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    day_if_obs = F.when(F.col("v").isNotNull(), F.col("day"))
    g = (
        g.withColumn("prev_v", F.last("v", ignorenulls=True).over(w_prev))
        .withColumn("prev_day", F.last(day_if_obs, ignorenulls=True).over(w_prev))
        .withColumn("next_v", F.first("v", ignorenulls=True).over(w_next))
        .withColumn("next_day", F.first(day_if_obs, ignorenulls=True).over(w_next))
    )
    frac = F.datediff(F.col("day"), F.col("prev_day")).cast("double") / F.datediff(
        F.col("next_day"), F.col("prev_day")
    ).cast("double")
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac,
        )
    )
    return g.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(filled, 6).alias("v_filled"),
        (
            F.col("v").isNull()
            & F.col("prev_v").isNotNull()
            & F.col("next_v").isNotNull()
        ).alias("interpolated"),
    )


@op(
    "ts_seasonality_dow",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
per_dow AS (
  SELECT dow, CAST(SUM(n) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily GROUP BY dow
),
tot AS (
  SELECT CAST(SUM(n_events) AS BIGINT) AS n_total,
         CAST(SUM(n_days) AS BIGINT) AS d_total
  FROM per_dow
)
SELECT p.dow, p.n_events, p.n_days,
       CAST(p.n_events * t.d_total AS DOUBLE)
         / CAST(p.n_days * t.n_total AS DOUBLE) AS seasonal_index
FROM per_dow p CROSS JOIN tot t
""",
)
def ts_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index: (mean events on that weekday) /
    (overall daily mean), computed as one exact integer cross-ratio —
    n_dow·days_total / (days_dow·n_total) — so no float accumulates
    and no rounding is needed (index > 1 = busy weekday). ISO weekday
    numbering on both engines (Spark weekday()+1 == DuckDB isodow).
    Two tiny map-combined aggregates and a broadcast scalar — the
    capacity-planning query every traffic system runs."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"),
        (F.weekday(F.to_date("ts")) + 1).cast("long").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    per_dow = daily.groupBy("dow").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.count(F.lit(1)).alias("n_days"),
    )
    tot = per_dow.agg(
        F.sum("n_events").cast("long").alias("n_total"),
        F.sum("n_days").cast("long").alias("d_total"),
    )
    idx = (F.col("n_events") * F.col("d_total")).cast("double") / (
        F.col("n_days") * F.col("n_total")
    ).cast("double")
    return (
        per_dow.crossJoin(F.broadcast(tot))
        .select("dow", "n_events", "n_days", idx.alias("seasonal_index"))
    )


@op(
    "ts_rate_changepoint",
    oracle="""
WITH hourly AS (
  SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS h,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
win AS (
  SELECT event_type, h, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS pre,
         COUNT(*) OVER (PARTITION BY event_type ORDER BY h
                        ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS n_pre,
         SUM(n) OVER (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS post,
         COUNT(*) OVER (PARTITION BY event_type ORDER BY h
                        ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS n_post
  FROM hourly
),
full_w AS (
  SELECT event_type, h, CAST(pre AS BIGINT) AS pre_events,
         CAST(post AS BIGINT) AS post_events,
         CAST(post - pre AS BIGINT) AS shift
  FROM win WHERE n_pre = 3 AND n_post = 3
)
SELECT event_type, h, pre_events, post_events, shift, CAST(rn AS INT) AS rnk
FROM (
  SELECT *, row_number() OVER (
    ORDER BY abs(shift) DESC, event_type ASC, h ASC) AS rn
  FROM full_w
)
WHERE rn <= 10
""",
)
def ts_rate_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate change-point detection: per event type, compare each
    hour's trailing 3-bucket event count against the 3-bucket window
    starting at that hour (two-window mean-shift, the declarative
    CUSUM stand-in — a recursive max(0, S+x) has no windowed form,
    and at scale the two-window scan IS how rate regressions are
    screened before a targeted revisit). Pure integer arithmetic —
    counts, sums of counts, an integer shift — so there is no float
    surface at all; only FULL windows (3 buckets each side) qualify,
    and the top-10 |shift| rows are returned (always non-empty at
    every fixture scale — a 0-row green is vacuous evidence,
    VERDICT r4 item 4) with a total-order tie-break.

    Scale: one shuffle to hourly (partial count map-side), one
    per-type window sort whose state is 7 buckets; composes with
    ts_gap_fill when zero-event hours must count as zeros. The
    changepoint sibling of anomaly_mad (pointwise outliers) and
    events_burst_detect (per-user trailing windows)."""
    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hh"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            F.date_format("hh", "yyyy-MM-dd HH:00").alias("h"),
            F.col("n").cast("long").alias("n"),
        )
    )
    wp = Window.partitionBy("event_type").orderBy("h")
    pre_f = wp.rowsBetween(-3, -1)
    post_f = wp.rowsBetween(0, 2)
    win = hourly.select(
        "event_type",
        "h",
        F.sum("n").over(pre_f).alias("pre"),
        F.count(F.lit(1)).over(pre_f).alias("n_pre"),
        F.sum("n").over(post_f).alias("post"),
        F.count(F.lit(1)).over(post_f).alias("n_post"),
    ).filter((F.col("n_pre") == 3) & (F.col("n_post") == 3))
    full_w = win.select(
        "event_type",
        "h",
        F.col("pre").cast("long").alias("pre_events"),
        F.col("post").cast("long").alias("post_events"),
        (F.col("post") - F.col("pre")).cast("long").alias("shift"),
    )
    # Top-10 via orderBy+limit — Catalyst plans TakeOrderedAndProject
    # (per-partition heaps, no single-partition sort of the candidate
    # set); the rank window then runs over only the 10 survivors, the
    # head32 idiom from text_unigram_coverage.
    order = [
        F.abs(F.col("shift")).desc(), F.col("event_type").asc(), F.col("h").asc()
    ]
    wr = Window.orderBy(*order)
    return (
        full_w.orderBy(*order)
        .limit(10)
        .withColumn("rn", F.row_number().over(wr))
        .select(
            "event_type", "h", "pre_events", "post_events", "shift",
            F.col("rn").cast("int").alias("rnk"),
        )
    )


@op(
    "events_global_seq",
    oracle="""
SELECT event_id,
       CAST(row_number() OVER (
         ORDER BY epoch_ms(ts) ASC NULLS FIRST, event_id ASC NULLS FIRST
       ) AS BIGINT) AS seq
FROM events
""",
)
def events_global_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GLOBAL sequence assignment over the event stream
    — the replay-ordering / reproducible-sample-indexing primitive: a
    total (event-time, event_id) order enumerated 1..n identically on
    every re-run, regardless of partitioning. Runs through
    scale_windows.global_row_number bucketed on the event DAY (a
    monotone coarsening of the ms order key), so ranks assign
    bucket-parallel with broadcast day offsets and no corpus-sized
    input crosses a single-partition window — the registered
    user-facing face of the r9 two-phase machinery the audit rewrote
    six ops onto.

    Determinism fine print: event time compares on the MILLISECOND
    grid (unix_millis/epoch_ms — the common exact grid under the
    ns-precision fixture, the sessionize rule) with NULLS FIRST pinned
    on both sides; the output columns are a subset of the order
    columns, so rows the order cannot distinguish are identical in the
    output and any tie permutation yields the same multiset — seq is
    well-defined even where the order ties."""
    from lambda_hive_spark.scale_windows import global_row_number

    ev = table(spark, sf_dir, "events")
    base = ev.select("event_id", F.unix_millis("ts").alias("ms"))
    ranked = global_row_number(
        base,
        [F.asc_nulls_first("ms"), F.asc_nulls_first("event_id")],
        [(F.floor(F.col("ms") / 86400000), "asc_nulls_first")],
        "seq",
    )
    return ranked.select("event_id", F.col("seq").cast("long").alias("seq"))
