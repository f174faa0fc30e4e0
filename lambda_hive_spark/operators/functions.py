"""Scalar function surface (SURVEY.md §2.8): string / date / math /
array / map / JSON / hash functions, all JVM built-ins inside
whole-stage codegen — no Python in the hot path.

Parity notes:
- Integer-returning functions are cast to BIGINT on both sides
  (Spark ints vs DuckDB bigints would fail the schema check).
- Date-valued results are emitted as 'yyyy-MM-dd' STRINGS: Spark
  DateType → pandas object(date) while DuckDB DATE → datetime64, a
  dtype mismatch the driver's hash could trip on.
- Transcendentals (exp/ln/log10) are not correctly-rounded-guaranteed
  in either engine; outputs are rounded to 6 decimals — their shortest
  decimal reprs never terminate near the boundary, so the engine
  round() divergence (helpers.r4) does not bite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_hive_spark.helpers import dot, sql_dot
from lambda_hive_spark.io import table
from lambda_hive_spark.registry import op


@op(
    "fn_string",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       substr(p_name, 1, 4) AS name_head,
       lpad(p_brand, 12, '*') AS brand_padded,
       concat_ws('|', p_brand, p_type) AS brand_type,
       CAST(length(p_name) AS BIGINT) AS name_len,
       CAST(strpos(p_name, 'e') AS BIGINT) AS first_e,
       regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       trim(concat(' ', coalesce(p_type, ''), ' ')) AS trimmed
FROM part
""",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function coverage over part."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 4).alias("name_head"),
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.instr(F.col("p_name"), "e").cast("long").alias("first_e"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        # coalesce pins the NULL policy on BOTH sides: Spark concat is
        # NULL-propagating while DuckDB concat skips NULLs — a real
        # engine divergence the null-injected resilience sweep caught.
        F.trim(
            F.concat(F.lit(" "), F.coalesce(F.col("p_type"), F.lit("")), F.lit(" "))
        ).alias("trimmed"),
    )


@op(
    "fn_date",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mo,
       CAST(day(o_orderdate) AS BIGINT) AS dom,
       CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
       date_trunc('month', o_orderdate) AS month_start,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since_epoch95,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS unix_sec
FROM orders
""",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function coverage over the timestamp[ms] order date.
    Day-of-week uses ISO numbering (Mon=1) — Spark weekday()+1 ==
    DuckDB isodow()."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("dom"),
        (F.weekday(d) + 1).cast("long").alias("iso_dow"),
        F.date_trunc("month", d).alias("month_start"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.datediff(d, F.lit("1995-01-01 00:00:00").cast("timestamp")).cast("long").alias("days_since_epoch95"),
        F.unix_timestamp(d).alias("unix_sec"),
    )


@op(
    "fn_math",
    oracle="""
SELECT o_orderkey,
       round(o_totalprice) AS price_round,
       floor(o_totalprice) AS price_floor,
       ceil(o_totalprice) AS price_ceil,
       abs(o_totalprice - 200000.0) AS dist_from_200k,
       CAST(sign(o_totalprice - 200000.0) AS DOUBLE) AS side_of_200k,
       sqrt(o_totalprice) AS price_sqrt,
       round(ln(o_totalprice), 6) AS price_ln,
       round(log10(o_totalprice), 6) AS price_log10,
       round(exp(o_totalprice / 200000.0), 6) AS price_exp,
       o_totalprice * o_totalprice AS price_sq,
       greatest(o_totalprice, 100000.0) AS at_least_100k,
       least(o_totalprice, 400000.0) AS at_most_400k,
       CAST(((o_orderkey % 7) + 7) % 7 AS BIGINT) AS pmod7
FROM orders
""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function coverage. sqrt is IEEE-correctly-rounded (safe
    raw); exp/ln/log10 rounded to 6 (see module docstring); round()
    only to integer scale, where binary halves (.5/.25) are exact on
    both engines so the tie rule agrees."""
    o = table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(p, 0).alias("price_round"),
        F.floor(p).cast("double").alias("price_floor"),
        F.ceil(p).cast("double").alias("price_ceil"),
        F.abs(p - 200000.0).alias("dist_from_200k"),
        F.signum(p - 200000.0).alias("side_of_200k"),
        F.sqrt(p).alias("price_sqrt"),
        F.round(F.log(p), 6).alias("price_ln"),
        F.round(F.log10(p), 6).alias("price_log10"),
        F.round(F.exp(p / 200000.0), 6).alias("price_exp"),
        (p * p).alias("price_sq"),
        F.greatest(p, F.lit(100000.0)).alias("at_least_100k"),
        F.least(p, F.lit(400000.0)).alias("at_most_400k"),
        F.pmod(F.col("o_orderkey"), F.lit(7)).cast("long").alias("pmod7"),
    )


@op(
    "fn_array",
    oracle=f"""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive,
       {sql_dot('embedding', 'embedding')} AS sq_norm,
       CAST(list_max(embedding) AS DOUBLE) AS max_component,
       CAST(list_min(embedding) AS DOUBLE) AS min_component,
       CAST(embedding[1] AS DOUBLE) AS first_component
FROM embeddings
""",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over the embedding column:
    size, lambda filter, fold (dot product), element access."""
    e = table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).cast("long").alias("dim"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("long").alias("n_positive"),
        dot(emb, emb).alias("sq_norm"),
        F.array_max(emb).cast("double").alias("max_component"),
        F.array_min(emb).cast("double").alias("min_component"),
        F.element_at(emb, 1).cast("double").alias("first_component"),
    )


@op(
    "fn_array_explode",
    oracle="""
SELECT d.doc_id, t.tok AS token
FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
""",
)
def fn_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode() of a split string — the tokenization primitive reused
    by the text-analysis ops (§2.10)."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


@op(
    "fn_array_sort_distinct",
    oracle="""
SELECT doc_id,
       array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS vocab,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens
FROM documents
""",
)
def fn_array_sort_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_distinct + array_sort, string-joined for the oracle
    (SURVEY.md §5.1 rule 4 + the no-array-output policy). NULL text →
    NULL vocab (concat_ws would otherwise flatten it to '', diverging
    from the oracle's NULL-propagating array_to_string on a
    null-bearing corpus)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.when(
            F.col("text").isNotNull(),
            F.concat_ws(" ", F.array_sort(F.array_distinct(toks))),
        ).alias("vocab"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
    )


@op(
    "fn_json",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
       json_extract_string(props, '$.k') AS k_str,
       array_to_string(list_sort(json_keys(props)), ',') AS prop_keys
FROM events
""",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON parsing of the props column: typed extraction via
    from_json, path extraction, key listing (map surface)."""
    ev = table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    as_map = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        parsed.getField("k").cast("long").alias("k_typed"),
        F.get_json_object("props", "$.k").alias("k_str"),
        # NULL props → NULL key list (matches the oracle's json_keys
        # NULL propagation; concat_ws alone would flatten to '').
        F.when(
            F.col("props").isNotNull(),
            F.concat_ws(",", F.array_sort(F.map_keys(as_map))),
        ).alias("prop_keys"),
    )


@op(
    "fn_hash",
    oracle="""
SELECT c_custkey, md5(c_name) AS name_md5, sha256(c_name) AS name_sha256
FROM customer
""",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hashes — standardized, so engine-independent."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
    )


@op(
    "fn_ids",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       TRUE AS xxh_injective,
       TRUE AS crc_nonnull,
       TRUE AS rowid_unique,
       TRUE AS rowid_nonneg
FROM customer
""",
)
def fn_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-specific id generators (xxhash64's algo differs from
    DuckDB's hash; monotonically_increasing_id is partition-dependent)
    published as a BOOLEAN invariant contract instead of raw values
    (VERDICT r3 item 2): xxhash64 must be injective over the distinct
    names (deterministic given the data; collision odds ~n²/2⁶⁵),
    crc32 total, and monotonically_increasing_id unique and
    non-negative. Any generator defect hash-mismatches the TRUE row.
    Scale: one map pass + a global agg of five scalars."""
    c = table(spark, sf_dir, "customer").select(
        "c_name",
        F.xxhash64("c_name").alias("name_xxh"),
        F.crc32(F.col("c_name").cast("binary")).alias("name_crc32"),
        F.monotonically_increasing_id().alias("row_id"),
    )
    return c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count_distinct("name_xxh") == F.count_distinct("c_name")).alias("xxh_injective"),
        (F.count("name_crc32") == F.count(F.lit(1))).alias("crc_nonnull"),
        (F.count_distinct("row_id") == F.count(F.lit(1))).alias("rowid_unique"),
        (F.min("row_id") >= 0).alias("rowid_nonneg"),
    )
