"""Second tranche of the scalar function surface (SURVEY.md §2.8
extension): more string functions, bitwise ops, more date functions —
all JVM built-ins with 1:1 DuckDB twins.

Reference file:line: N/A — empty reference dir (SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_hive_spark.io import table
from lambda_hive_spark.registry import op


@op(
    "fn_string2",
    oracle="""
SELECT p_partkey,
       array_to_string(list_transform(string_split(p_name, ' '),
                       w -> upper(w[1]) || lower(w[2:])), ' ') AS name_title,
       reverse(p_brand) AS brand_rev,
       repeat(p_brand, 2) AS brand_x2,
       translate(p_type, 'AEO', 'aeo') AS type_translated,
       replace(p_name, ' ', '_') AS name_snake,
       split_part(p_name, ' ', 1) AS first_word,
       left(p_name, 3) AS name_left3,
       right(p_name, 3) AS name_right3,
       contains(p_name, 'widget') AS has_widget,
       starts_with(p_name, 'small') AS is_small,
       ends_with(p_name, 'bolt') AS is_bolt
FROM part
""",
)
def fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface #2: initcap/reverse/repeat/translate/replace/
    split_part/left/right/contains/starts_with/ends_with."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.initcap("p_name").alias("name_title"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat("p_brand", 2).alias("brand_x2"),
        F.translate("p_type", "AEO", "aeo").alias("type_translated"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.left(F.col("p_name"), F.lit(3)).alias("name_left3"),
        F.right(F.col("p_name"), F.lit(3)).alias("name_right3"),
        F.contains(F.col("p_name"), F.lit("widget")).alias("has_widget"),
        F.startswith(F.col("p_name"), F.lit("small")).alias("is_small"),
        F.endswith(F.col("p_name"), F.lit("bolt")).alias("is_bolt"),
    )


@op(
    "fn_bitwise",
    oracle="""
SELECT event_id,
       event_id & 255 AS low_byte,
       event_id | 1 AS with_low_bit,
       xor(event_id, 255) AS xored,
       event_id << 2 AS shifted_l,
       event_id >> 2 AS shifted_r,
       CAST(bit_count(event_id) AS BIGINT) AS n_bits
FROM events
""",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface: and/or/xor/shifts/popcount."""
    ev = table(spark, sf_dir, "events")
    eid = F.col("event_id")
    return ev.select(
        "event_id",
        eid.bitwiseAND(F.lit(255)).alias("low_byte"),
        eid.bitwiseOR(F.lit(1)).alias("with_low_bit"),
        eid.bitwiseXOR(F.lit(255)).alias("xored"),
        F.shiftleft(eid, 2).alias("shifted_l"),
        F.shiftright(eid, 2).alias("shifted_r"),
        F.bit_count(eid).cast("bigint").alias("n_bits"),
    )


@op(
    "fn_date2",
    oracle="""
SELECT o_orderkey,
       CAST(quarter(o_orderdate) AS BIGINT) AS q,
       CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
       strftime(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS plus_3_months,
       strftime(CAST(o_orderdate - INTERVAL 90 DAY AS DATE), '%Y-%m-%d') AS minus_90_days,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start
FROM orders
""",
)
def fn_date2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date surface #2: quarter/dayofyear/ISO week/add_months/date_sub/
    datediff (both engines use ISO 8601 week numbering)."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.quarter(d).cast("bigint").alias("q"),
        F.dayofyear(d).cast("bigint").alias("doy"),
        F.weekofyear(d).cast("bigint").alias("iso_week"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3_months"),
        F.date_format(F.date_sub(d, 90), "yyyy-MM-dd").alias("minus_90_days"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("bigint").alias(
            "days_since_epoch_start"
        ),
    )


@op(
    "fn_safe_arith",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount = 0 THEN NULL ELSE l_extendedprice / l_discount END
         AS safe_ratio,
       nullif(l_tax, 0.0) AS nz_tax,
       COALESCE(nullif(l_tax, 0.0), nullif(l_discount, 0.0), 0.5) AS first_nonzero,
       GREATEST(l_quantity, l_tax * 100) AS hi,
       LEAST(l_quantity, l_discount * 100) AS lo
FROM lineitem
""",
)
def fn_safe_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar surface: try_divide (NULL on zero divisor
    instead of Inf/exception — what ANSI mode turns arithmetic into),
    nullif / coalesce chaining for sentinel-to-NULL cleanup, and
    greatest/least. All per-row JVM expressions inside codegen; the
    oracle spells try_divide as its CASE equivalent. The practical
    point at scale: try_* keeps a 100 TB job alive through the one
    malformed row that strict ANSI would kill it with."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"),
            F.nullif(F.col("l_discount"), F.lit(0.0)),
        ).alias("safe_ratio"),
        F.nullif(F.col("l_tax"), F.lit(0.0)).alias("nz_tax"),
        F.coalesce(
            F.nullif(F.col("l_tax"), F.lit(0.0)),
            F.nullif(F.col("l_discount"), F.lit(0.0)),
            F.lit(0.5),
        ).alias("first_nonzero"),
        F.greatest(F.col("l_quantity"), F.col("l_tax") * 100).alias("hi"),
        F.least(F.col("l_quantity"), F.col("l_discount") * 100).alias("lo"),
    )


@op(
    "fn_url",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.org/' || lang || '/doc/' || doc_id
           || '?id=' || doc_id || '&lang=' || lang AS url
  FROM documents
)
SELECT doc_id,
       regexp_extract(url, 'https://([^/]+)/', 1) AS host,
       regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query,
       regexp_extract(url, 'lang=([^&]*)', 1) AS lang_param,
       regexp_extract(url, 'https://([^/.]+)\\.', 1) AS domain_key
FROM u
""",
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing — the first step of every web-corpus curation
    pipeline (dedup by host, per-domain quality quotas, registrable-
    domain mixing). URLs are synthesized deterministically from
    document metadata (the fixture has no url column), then pulled
    apart with Spark's builtin parse_url (HOST / PATH / QUERY /
    keyed QUERY lookup) — all JVM-side, codegen-friendly; the oracle
    re-derives the same parts with RE2 regexes.

    Scale: pure per-row expressions, no shuffle; at 100 TB the
    domain_key column is what the per-domain groupBy downstream
    partitions on."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/"), F.col("lang"),
        F.lit("/doc/"), F.col("doc_id"), F.lit("?id="), F.col("doc_id"),
        F.lit("&lang="), F.col("lang"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.regexp_extract(F.parse_url("url", F.lit("HOST")), r"^([^.]+)\.", 1).alias(
            "domain_key"
        ),
    )


@op(
    "fn_struct",
    oracle="""
SELECT o_orderkey,
       u.k AS k, u.v AS v,
       o_totalprice AS nested_price,
       o_orderstatus || '/' || o_orderpriority AS tag
FROM (
  SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority,
         unnest([{'k': 1, 'v': o_totalprice},
                 {'k': 2, 'v': o_totalprice * 2}]) AS u
  FROM orders
)
""",
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type surface: build structs, build an array OF structs,
    explode it back to rows, and read fields through a two-level
    dot path (outer.inner.field). Output is flattened to primitives so
    the cross-engine hash stays representation-independent (struct
    stringification differs between engines; field VALUES don't).

    Scale: pure per-row expression work inside codegen — structs in
    Tungsten rows are offsets, not objects; the explode doubles rows
    but never shuffles."""
    o = table(spark, sf_dir, "orders")
    nested = F.struct(
        F.struct(
            F.col("o_totalprice").alias("price"), F.col("o_orderdate").alias("d")
        ).alias("inner"),
        F.col("o_orderstatus").alias("status"),
    )
    arr = F.array(
        F.struct(F.lit(1).alias("k"), F.col("o_totalprice").alias("v")),
        F.struct(F.lit(2).alias("k"), (F.col("o_totalprice") * 2).alias("v")),
    )
    e = (
        o.withColumn("nested", nested)
        .withColumn("entry", F.explode(arr))
    )
    return e.select(
        "o_orderkey",
        F.col("entry.k").alias("k"),
        F.col("entry.v").alias("v"),
        F.col("nested.inner.price").alias("nested_price"),
        # concat_ws silently SKIPS null elements while the oracle's ||
        # propagates NULL — emit NULL when either part is missing so a
        # null-bearing corpus cannot diverge.
        F.when(
            F.col("nested.status").isNotNull()
            & F.col("o_orderpriority").isNotNull(),
            F.concat_ws("/", F.col("nested.status"), F.col("o_orderpriority")),
        ).alias("tag"),
    )


@op(
    "fn_regex",
    oracle="""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_words,
       CAST(len(regexp_extract_all(text, 'ss')) AS BIGINT) AS n_ss,
       md5(regexp_replace(text, '(aa|ee|ll|oo|ss|tt)', '<\\1>', 'g')) AS doubled_md5,
       CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_split
FROM documents
""",
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex kernel surface beyond extract: regexp_count (as
    size∘extract_all — identical cross-engine), group-capture
    substitution (doubled letters wrapped, output md5'd), and regex
    split. Patterns stick to constructs where Java regex and RE2
    agree: literal classes, \\s, alternation, and capture refs in the
    REPLACEMENT only — RE2 has NO pattern backrefs, so `([a-z])\\1`
    silently never matches in DuckDB (found by the parity gate); the
    doubled-letter set is therefore an explicit alternation. Spark
    spells the replacement ref $1, DuckDB \\1 — same semantics.
    All codegen'd per-row kernels, zero shuffle."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), 0))
        .cast("bigint")
        .alias("n_words"),
        F.size(F.regexp_extract_all("text", F.lit("ss"), 0))
        .cast("bigint")
        .alias("n_ss"),
        F.md5(F.regexp_replace("text", "(aa|ee|ll|oo|ss|tt)", "<$1>")).alias("doubled_md5"),
        F.size(F.split("text", r"\s+")).cast("bigint").alias("n_split"),
    )


@op(
    "fn_try_cast",
    oracle="""
WITH dirty AS (
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN CAST(n_chars AS VARCHAR)
           WHEN 1 THEN 'oops'
           WHEN 2 THEN ''
           ELSE '12.75'
         END AS num_s,
         CASE CAST(doc_id % 3 AS INTEGER)
           WHEN 0 THEN '2024-02-29'
           WHEN 1 THEN '2024-13-45'
           ELSE '2023-07-01'
         END AS date_s
  FROM documents
)
SELECT doc_id,
       TRY_CAST(num_s AS DOUBLE) AS as_double,
       TRY_CAST(CASE WHEN regexp_matches(num_s, '^-?[0-9]+$') THEN num_s END
                AS BIGINT) AS as_long,
       TRY_CAST('99999999999999999999' AS BIGINT) AS overflow_long,
       strftime(TRY_CAST(date_s AS DATE), '%Y-%m-%d') AS as_date
FROM dirty
""",
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fault-tolerant ingestion casts: try_cast returns NULL for
    malformed numerics ('oops', ''), non-integral longs ('12.75'),
    out-of-range integers, and impossible dates — instead of the
    job-killing exception ANSI-strict casting throws. At 100 TB the
    difference between try_cast and cast is the difference between
    quarantining 0.001% bad rows and losing the whole job at hour
    9. Dirty inputs are synthesized deterministically so both engines
    judge the identical strings.

    Engine divergence pinned by this op's contract: DuckDB's
    TRY_CAST('12.75' AS BIGINT) ROUNDS to 13, Spark's try_cast NULLs
    non-integral strings — the op standardizes on Spark's stricter
    semantics (a silently rounded id is worse than a quarantined row),
    and the oracle gates the string-to-long path on an integral
    regex to express the same rule."""
    d = table(spark, sf_dir, "documents")
    num_s = (
        F.when(F.col("doc_id") % 4 == 0, F.col("n_chars").cast("string"))
        .when(F.col("doc_id") % 4 == 1, F.lit("oops"))
        .when(F.col("doc_id") % 4 == 2, F.lit(""))
        .otherwise(F.lit("12.75"))
    )
    date_s = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("2024-02-29"))
        .when(F.col("doc_id") % 3 == 1, F.lit("2024-13-45"))
        .otherwise(F.lit("2023-07-01"))
    )
    return d.select(
        "doc_id",
        num_s.try_cast("double").alias("as_double"),
        num_s.try_cast("bigint").alias("as_long"),
        F.lit("99999999999999999999").try_cast("bigint").alias("overflow_long"),
        F.date_format(date_s.try_cast("date"), "yyyy-MM-dd").alias("as_date"),
    )


@op(
    "fn_format",
    oracle="""
SELECT o_orderkey,
       printf('%05d/%x', o_orderkey, o_orderkey) AS key_fmt,
       lpad(o_orderpriority, 12, '.') AS prio_padded,
       rpad(o_orderstatus, 4, '_') AS status_padded,
       printf('cust-%d @ %s', o_custkey, o_orderpriority) AS note
FROM orders
""",
)
def fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting and padding. Formats stay on INTEGER
    conversions (%d, %x, %05d) — floating %f is deliberately excluded
    because Java's Formatter rounds half-up while C printf rounds
    half-even, a true cross-engine divergence on exact .xx5 halves
    (same family as the HALF_UP/rint hazard in helpers.py)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.format_string("%05d/%x", "o_orderkey", "o_orderkey").alias("key_fmt"),
        F.lpad("o_orderpriority", 12, ".").alias("prio_padded"),
        F.rpad("o_orderstatus", 4, "_").alias("status_padded"),
        # Java's Formatter renders a NULL %s arg as the string "null"
        # while DuckDB printf propagates NULL — emit NULL explicitly
        # so both sides agree on a null-bearing corpus.
        F.when(
            F.col("o_orderpriority").isNotNull(),
            F.format_string("cust-%d @ %s", "o_custkey", "o_orderpriority"),
        ).alias("note"),
    )


@op(
    "fn_timezone",
    oracle="""
SELECT event_id,
       strftime(ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York',
                '%Y-%m-%d %H:%M:%S') AS ny_wall,
       strftime(ts AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo',
                '%Y-%m-%d %H:%M:%S') AS tokyo_wall,
       strftime((ts + INTERVAL 6 MONTH) AT TIME ZONE 'UTC'
                  AT TIME ZONE 'America/New_York',
                '%Y-%m-%d %H:%M:%S') AS ny_wall_summer,
       (((ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York')
           AT TIME ZONE 'America/New_York') AT TIME ZONE 'UTC') = ts
         AS roundtrip_ok
FROM events
""",
)
def fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion surface: UTC instants rendered as New York
    and Tokyo wall time (from_utc_timestamp), a +6-month variant that
    crosses the DST boundary (January EST −5 becomes July EDT −4 —
    the conversion must consult the zone's rules, not a fixed
    offset), and the to_utc_timestamp round-trip proven as a boolean.
    The oracle spells the same conversions with DuckDB's two-step
    AT TIME ZONE chain (naive→instant→other-zone wall time); outputs
    are formatted strings so no tz-typed column reaches the hash."""
    ev = table(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss"
    ny = F.from_utc_timestamp("ts", "America/New_York")
    summer = F.from_utc_timestamp(
        F.col("ts") + F.expr("INTERVAL 6 MONTHS"), "America/New_York"
    )
    return ev.select(
        "event_id",
        F.date_format(ny, fmt).alias("ny_wall"),
        F.date_format(F.from_utc_timestamp("ts", "Asia/Tokyo"), fmt).alias(
            "tokyo_wall"
        ),
        F.date_format(summer, fmt).alias("ny_wall_summer"),
        (F.to_utc_timestamp(ny, "America/New_York") == F.col("ts")).alias(
            "roundtrip_ok"
        ),
    )


@op(
    "fn_rounding_modes",
    oracle="""
WITH v AS (
  SELECT o_orderkey AS k,
         (CASE WHEN o_orderkey % 2 = 0 THEN -1 ELSE 1 END)
           * (CAST(o_orderkey AS DOUBLE) + 0.5) AS x
  FROM orders
)
SELECT k,
       round(x) + 0.0 AS half_away,
       (CASE WHEN CAST(floor(x) AS BIGINT) % 2 = 0
             THEN floor(x) ELSE ceil(x) END) + 0.0 AS half_even,
       floor(x) + 0.0 AS flr,
       ceil(x) + 0.0 AS cl,
       trunc(x) + 0.0 AS toward_zero,
       CAST(-k % 7 AS BIGINT) AS mod_signed,
       CAST(((-k % 7) + 7) % 7 AS BIGINT) AS mod_positive
FROM v
""",
)
def fn_rounding_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rounding-semantics family pinned on EXACT halves (k + 0.5
    is exactly representable, so every row is the contested case):
    round = half-away-from-zero on BOTH engines for doubles; half-even
    (banker's) is Spark's bround, which DuckDB has no builtin for —
    the oracle spells it as the floor/ceil-parity CASE; floor / ceil /
    truncate-toward-zero; and the % sign trap: both engines give %
    the dividend's sign, so negative keys need pmod (spelled
    ((x%y)+y)%y in the oracle) for bucket assignment — using % to
    pick a shuffle bucket of a signed key is a real 100 TB data-loss
    bug (negative rows land in nonexistent buckets). Every double
    output is canonicalized with +0.0 because the engines disagree on
    SIGNED ZERO at k=0 (Spark's integer-path ceil yields +0.0 where
    DuckDB's double ceil yields -0.0 — same value, different hash)."""
    o = table(spark, sf_dir, "orders")
    x = (
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(-1)).otherwise(F.lit(1))
        * (F.col("o_orderkey").cast("double") + 0.5)
    )
    k = F.col("o_orderkey")
    return o.select(
        k.alias("k"),
        (F.round(x, 0) + 0.0).alias("half_away"),
        (F.bround(x, 0) + 0.0).alias("half_even"),
        (F.floor(x).cast("double") + 0.0).alias("flr"),
        (F.ceil(x).cast("double") + 0.0).alias("cl"),
        (x.cast("bigint").cast("double") + 0.0).alias("toward_zero"),
        ((-k) % 7).cast("bigint").alias("mod_signed"),
        F.pmod(-k, F.lit(7)).cast("bigint").alias("mod_positive"),
    )


@op(
    "fn_binary_codec",
    oracle="""
SELECT doc_id,
       to_base64(encode(lang)) AS lang_b64,
       lower(hex(encode(lang))) AS lang_hex,
       decode(from_base64(to_base64(encode(lang)))) IS NOT DISTINCT FROM lang
         AS b64_roundtrip,
       CAST(octet_length(encode(text)) AS BIGINT) AS text_bytes
FROM documents
""",
)
def fn_binary_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary codec surface: string→bytes (UTF-8 encode), base64 and
    hex renderings, a decode∘encode round-trip proven as a boolean,
    and byte length (octet_length ≠ char length under multibyte
    UTF-8). The transport layer for the multimodal ops — binary
    payloads cross systems as base64 — all per-row codegen kernels."""
    d = table(spark, sf_dir, "documents")
    lang_bin = F.encode("lang", "UTF-8")
    return d.select(
        "doc_id",
        F.base64(lang_bin).alias("lang_b64"),
        F.lower(F.hex(lang_bin)).alias("lang_hex"),
        # null-safe equality (<=> / IS NOT DISTINCT FROM) on both
        # sides: a NULL lang round-trips trivially (TRUE), instead of
        # producing a nullable boolean whose None/NaN rendering
        # diverges between engines on a null-bearing corpus.
        F.decode(F.unbase64(F.base64(lang_bin)), "UTF-8")
        .eqNullSafe(F.col("lang"))
        .alias("b64_roundtrip"),
        F.octet_length(F.encode("text", "UTF-8")).cast("bigint").alias("text_bytes"),
    )


@op(
    "fn_array_hof",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(len(list_filter(toks, x -> len(x) > 6)) AS INT) AS n_long,
       coalesce(len(list_filter(toks, x -> x = 'join')) > 0, FALSE) AS has_join,
       coalesce(len(list_filter(toks, x -> len(x) = 0)) = 0, FALSE) AS all_nonempty,
       CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS total_chars,
       array_to_string(list_transform(toks, x -> upper(x[1:1])), '') AS initials
FROM t
WHERE doc_id % 7 = 0
""",
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order-function surface as a first-class op:
    filter / exists / forall / aggregate (fold) / transform over a
    token array, each mirrored by a DuckDB list_* twin. HOFs are the
    mechanism that keeps per-row collection logic JVM-side and
    codegen'd — the alternative (a Python UDF per row) is the
    anti-pattern this engine avoids everywhere; this op pins their
    exact cross-engine semantics (fold init value, empty-array
    behavior, 1-based slicing vs substring)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) > 6)).alias("n_long"),
        # COALESCE(..., FALSE) on both sides: a NULL token array (NULL
        # text) yields a definite "not verified" instead of a nullable
        # boolean whose None/NaN rendering differs between engines.
        F.coalesce(F.exists(toks, lambda x: x == "join"), F.lit(False)).alias(
            "has_join"
        ),
        F.coalesce(F.forall(toks, lambda x: F.length(x) > 0), F.lit(False)).alias(
            "all_nonempty"
        ),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.array_join(
            F.transform(toks, lambda x: F.upper(F.substring(x, 1, 1))), ""
        ).alias("initials"),
    )


@op(
    "fn_interval",
    oracle="""
SELECT o_orderkey,
       o_orderdate + INTERVAL 1 MONTH AS plus_month,
       o_orderdate + INTERVAL 45 DAY AS plus_45d,
       o_orderdate + INTERVAL 90 MINUTE AS plus_90m,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT) AS days_since_epoch,
       date_trunc('month', o_orderdate) AS month_start
FROM orders WHERE o_orderkey % 13 = 0
""",
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic pinned cross-engine: month
    addition CLAMPS to the target month's last day (Jan 31 + 1 month =
    Feb 28, and 2000-02-29 + 12 months = 2001-02-28 — both engines
    agree, probed before writing this), day/minute intervals are exact
    instant shifts, last_day/date_trunc give the month frame, and the
    date difference is exact integer days. These are the primitives
    every retention/billing-cycle query stands on; all per-row
    codegen'd expressions, no shuffle."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 1 MONTH")).alias("plus_month"),
        (F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")).alias("plus_45d"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 MINUTES")).alias("plus_90m"),
        F.last_day(F.to_date("o_orderdate")).cast("timestamp").alias("month_end"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
    )


@op(
    "fn_conditional",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'big' ELSE 'small' END AS size_tag,
       CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS status_or_null,
       COALESCE(CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END, 'PENDING') AS status_defaulted,
       CASE WHEN CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END IS NOT NULL
            THEN 'known' ELSE 'unknown' END AS nvl2_tag,
       CASE o_orderpriority
         WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 ELSE 9 END AS priority_code
FROM orders WHERE o_orderkey % 19 = 0
""",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conditional scalar surface beyond CASE: if(), nullif(),
    nvl(), nvl2(), and decode() — the Oracle/Hive-compat idioms a
    migrating user's SQL is full of. Each is a thin alias Catalyst
    rewrites to CASE (the oracle IS that rewrite, so parity proves
    the equivalences, not just the values). Map-only, codegen'd."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 19 == 0)
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        F.expr("if(o_totalprice > 300000, 'big', 'small')").alias("size_tag"),
        status_or_null.alias("status_or_null"),
        F.nvl(status_or_null, F.lit("PENDING")).alias("status_defaulted"),
        F.nvl2(status_or_null, F.lit("known"), F.lit("unknown")).alias("nvl2_tag"),
        F.expr(
            "decode(o_orderpriority, '1-URGENT', 1, '2-HIGH', 2, 9)"
        ).cast("long").alias("priority_code"),
    )


@op(
    "fn_like_family",
    oracle="""
SELECT doc_id,
       CAST(text LIKE '%join%' AS BIGINT) AS has_join_like,
       CAST(lower(text) LIKE lower('%JOIN%') AS BIGINT) AS has_join_ilike,
       CAST(contains(text, 'window') AS BIGINT) AS has_window,
       CAST(starts_with(text, 'scan') AS BIGINT) AS starts_scan,
       CAST(suffix(text, 'hash') AS BIGINT) AS ends_hash,
       CAST(lang LIKE 'e_' AS BIGINT) AS lang_two_e,
       CAST(source NOT LIKE '%9' AS BIGINT) AS not_nine
FROM documents WHERE doc_id % 9 = 0
""",
)
def fn_like_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The string-matching predicate family as values (not filters):
    LIKE, case-insensitive ILIKE, contains / startswith / endswith,
    single-char wildcard, negated LIKE — each returned as a column so
    parity pins the MATCH SEMANTICS themselves (filter_like only
    proves the rows that survive). All map-only codegen'd predicates;
    DuckDB mirrors ilike via lower()-LIKE and endswith via suffix().

    Outputs are nullable 0/1 BIGINT, not boolean: SQL matching is
    three-valued (LIKE over NULL text is NULL — preserved here), and
    the int encoding renders identically from both engines' pandas
    bridges, where nullable booleans do not (None vs NaN)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 9 == 0)
    return d.select(
        "doc_id",
        F.col("text").like("%join%").cast("bigint").alias("has_join_like"),
        F.col("text").ilike("%JOIN%").cast("bigint").alias("has_join_ilike"),
        F.contains("text", F.lit("window")).cast("bigint").alias("has_window"),
        F.startswith("text", F.lit("scan")).cast("bigint").alias("starts_scan"),
        F.endswith("text", F.lit("hash")).cast("bigint").alias("ends_hash"),
        F.col("lang").like("e_").cast("bigint").alias("lang_two_e"),
        (~F.col("source").like("%9")).cast("bigint").alias("not_nine"),
    )
