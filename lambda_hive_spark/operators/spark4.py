"""Spark-4-native surface (round 5): VariantType semi-structured
access, parameterized SQL, collation-aware joins, a Python Data
Source connector, and a recursive-CTE date spine.

These are the engine capabilities Spark 4 added over 3.x that a user
migrating a semi-structured / multi-tenant corpus pipeline would reach
for first; each is exercised end-to-end with a DuckDB oracle.

Scale notes: variant extraction and parameterized SQL are per-row
codegen'd expressions (no shuffle); the collation join broadcasts a
bounded dim; the Python data source declares real InputPartitions so
its read parallelizes across executors like any file scan; the
recursive spine is wall-clock-bounded (days), never fact-sized.

Reference file:line: N/A — empty reference dir (SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_hive_spark.io import table
from lambda_hive_spark.registry import op


@op(
    "fn_variant",
    oracle="""
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
       CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str,
       TRY_CAST(json_extract_string(props, '$.missing') AS INT) AS missing_int,
       CAST(json(props) AS VARCHAR) AS canon_json
FROM events
WHERE event_id % 10 = 0
""",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VariantType:
    ``parse_json`` once into a variant, then typed path extraction
    with ``try_variant_get`` and canonical re-serialization with
    ``to_json``. Variant keeps the parsed binary form through the
    plan, so N extractions cost one parse — the recommended Spark 4
    replacement for repeated ``get_json_object(props, ...)`` string
    re-parsing. All JVM-side, whole-stage-codegen'd, no shuffle; the
    oracle re-derives each path with DuckDB's JSON extraction.
    try_variant_get/TRY_CAST on BOTH sides so a non-numeric `k` in a
    regenerated corpus degrades to a graded NULL mismatch rather than
    a runtime error (ADVICE r3 item 4). `canon_json` equality is a
    fixture-shape guard: it holds for flat single-key objects (the
    fixture's props layout per FIXTURES.md); nested/multi-key props
    would need a sorted-key re-serialization on both sides instead."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 0)
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_int"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "int").alias("missing_int"),
        F.to_json(v).alias("canon_json"),
    )


@op(
    "sql_parameterized",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(CASE WHEN o_totalprice > 200000.0 THEN 1 END) AS BIGINT) AS n_big
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY o_orderpriority
""",
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 parameterized SQL: named ``:param`` binding plus
    ``{df}`` DataFrame template interpolation — the injection-safe way
    a service layer issues user-supplied thresholds (parameters are
    bound as literals by the parser, never string-spliced, and the
    plan is cache-reusable across bindings). Semantically identical to
    the literal query the oracle runs."""
    orders = table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               COUNT(CASE WHEN o_totalprice > :minp THEN 1 END) AS n_big
        FROM {orders}
        WHERE o_orderdate >= :cutoff
        GROUP BY o_orderpriority
        """,
        args={"minp": 200000.0, "cutoff": "1996-01-01 00:00:00"},
        orders=orders,
    )


@op(
    "fn_collation",
    oracle="""
WITH mixed AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END AS lang_mixed
  FROM documents
),
dim(code, family) AS (
  VALUES ('EN', 'germanic'), ('DE', 'germanic'), ('ES', 'romance'),
         ('FR', 'romance'), ('ZH', 'sinitic')
)
SELECT d.family, lower(m.lang_mixed) AS lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM mixed m JOIN dim d ON lower(m.lang_mixed) = lower(d.code)
GROUP BY 1, 2
""",
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware equality (Spark 4 collations): a deliberately
    case-mangled lang column joins a canonical UPPERCASE dim under
    ``UNICODE_CI`` — the engine-level answer to case-insensitive
    matching that previously forced ``lower()`` wrappers on every
    predicate (and broke index/stats use on real warehouses). The
    collated compare happens inside an ordinary broadcast hash join;
    output is re-canonicalized with ``lower`` so both engines hash the
    same representative. The oracle is the classic lower()-join."""
    d = table(spark, sf_dir, "documents")
    mixed = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.upper("lang"))
        .otherwise(F.col("lang"))
        .alias("lang_mixed"),
    )
    dim = spark.createDataFrame(
        [("EN", "germanic"), ("DE", "germanic"), ("ES", "romance"),
         ("FR", "romance"), ("ZH", "sinitic")],
        "code string, family string",
    )
    ci = lambda c: F.collate(F.col(c), "UNICODE_CI")  # noqa: E731
    return (
        mixed.join(F.broadcast(dim), ci("lang_mixed") == ci("code"))
        .groupBy("family", F.lower("lang_mixed").alias("lang"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@op(
    "source_python_datasource",
    oracle="""
SELECT CAST(r AS BIGINT) AS id,
       CAST(r // 1000 AS INT) AS part,
       'doc-' || lpad(CAST(r AS VARCHAR), 6, '0') AS payload,
       CAST((r * 2654435761) % 4294967296 AS BIGINT) AS fingerprint
FROM range(8000) t(r)
""",
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A custom connector through Spark 4's Python Data Source API: a
    deterministic synthetic-document source that declares 8 real
    ``InputPartition``s, so the read fans out across executors exactly
    like a file scan (each partition generates its own id range —
    this is the template for reading a sharded external service:
    partition = shard, reader = client). Values are pure arithmetic
    (Knuth multiplicative fingerprint) so the oracle regenerates them
    exactly from ``range()``. Registered per-call; batch API only
    (the same class gains streaming by adding ``streamReader``)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _Reader(DataSourceReader):
        def partitions(self):
            return [InputPartition(i) for i in range(8)]

        def read(self, partition):
            base = partition.value * 1000
            for j in range(1000):
                i = base + j
                yield (i, partition.value, f"doc-{i:06d}", (i * 2654435761) % 4294967296)

    class SyntheticDocs(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_docs"

        def schema(self):
            return "id bigint, part int, payload string, fingerprint bigint"

        def reader(self, schema):
            return _Reader()

    spark.dataSource.register(SyntheticDocs)
    return spark.read.format("synthetic_docs").load()


@op(
    "ts_spine_recursive",
    oracle="""
WITH RECURSIVE spine(day) AS (
  SELECT CAST(MIN(CAST(ts AS DATE)) AS DATE) FROM events
  UNION ALL
  SELECT day + INTERVAL 1 DAY FROM spine
  WHERE day < (SELECT MAX(CAST(ts AS DATE)) FROM events)
),
counts AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
)
SELECT strftime(CAST(s.day AS DATE), '%Y-%m-%d') AS day,
       COALESCE(c.n, 0) AS n_events
FROM spine s LEFT JOIN counts c ON CAST(s.day AS DATE) = c.day
""",
)
def ts_spine_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine generation via ``WITH RECURSIVE`` (new in Spark 4) —
    the SQL-standard way BI tools emit calendar scaffolds, now
    runnable unmodified. Bounds come from a 1-row min/max fetch (the
    recursion itself must not scan the fact table per step); the
    recursion materializes one row per day — wall-clock-bounded, so
    depth is ~30 here and ~36k for a century. Left-joining the daily
    counts zero-fills gaps; complements ts_gap_fill's
    sequence+explode formulation with the portable-SQL one."""
    # r11 (guide §6): the left join's right-side key made Catalyst
    # infer isnotnull(cast(cast(ts))) — an unpushable cast chain. The
    # base-column guard is semantics-identical (a null-day count group
    # can never match the non-null spine; min/max ignore nulls) and
    # pushes IsNotNull(ts) into the scan.
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(F.to_date("ts").alias("day"))
    )
    d0, d1 = ev.agg(F.min("day"), F.max("day")).collect()[0]  # bounded 1-row fetch
    counts = ev.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    counts.createOrReplaceTempView("__spine_counts")
    spine = spark.sql(
        f"""
        WITH RECURSIVE spine(day) AS (
          SELECT DATE '{d0}'
          UNION ALL
          SELECT date_add(day, 1) FROM spine WHERE day < DATE '{d1}'
        )
        SELECT date_format(s.day, 'yyyy-MM-dd') AS day,
               COALESCE(c.n, 0) AS n_events
        FROM spine s LEFT JOIN __spine_counts c ON s.day = c.day
        """
    )
    return spine


@op(
    "fn_xml",
    oracle="""
WITH x AS (
  SELECT doc_id,
         '<doc id="' || CAST(doc_id AS VARCHAR) || '"><lang>' || lang
           || '</lang><chars>' || CAST(n_chars AS VARCHAR)
           || '</chars><src>' || source || '</src></doc>' AS xml
  FROM documents WHERE doc_id % 5 = 0
)
SELECT doc_id,
       regexp_extract(xml, '<lang>([^<]*)</lang>', 1) AS lang,
       CAST(regexp_extract(xml, '<chars>([^<]*)</chars>', 1) AS BIGINT) AS n_chars,
       regexp_extract(xml, '<src>([^<]*)</src>', 1) AS src,
       CAST(regexp_extract(xml, 'id="([^"]*)"', 1) AS BIGINT) AS id_attr
FROM x
""",
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion surface (native in Spark 4): documents rendered
    as XML (the fixture has no XML column), then parsed back with both
    schema-driven ``from_xml`` (struct extraction, including the
    ``_id`` attribute convention) and XPath accessors — the two ways a
    feed-ingestion pipeline reads XML payloads. The oracle re-derives
    every field with regexes, which doubles as a guard that Spark's
    XML parser agrees with the literal markup for this subset
    (entity-free, attribute-quoted). Pure per-row parsing fused into
    the scan — no shuffle."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    xml = F.concat(
        F.lit('<doc id="'), F.col("doc_id"), F.lit('"><lang>'), F.col("lang"),
        F.lit("</lang><chars>"), F.col("n_chars"), F.lit("</chars><src>"),
        F.col("source"), F.lit("</src></doc>"),
    )
    x = d.select("doc_id", xml.alias("xml"))
    parsed = F.from_xml("xml", "_id BIGINT, lang STRING, chars BIGINT, src STRING")
    return x.select(
        "doc_id",
        F.xpath_string("xml", F.lit("/doc/lang")).alias("lang"),
        parsed.getField("chars").alias("n_chars"),
        parsed.getField("src").alias("src"),
        parsed.getField("_id").alias("id_attr"),
    )
