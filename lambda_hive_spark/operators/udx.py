"""UDF / UDAF / UDTF surface + orchestrator ops (SURVEY.md §2.11) and
the §2.8 map-function op.

UDx policy (the "UDFs are the slow path" rule): every Python crossing
is Arrow-batched — `pandas_udf` for scalars, `applyInPandas` for
grouped custom aggregation. The lone row-at-a-time construct is the
Python UDTF, registered deliberately as the 1→N table-function surface
demo; anything hot-path stays in JVM built-ins.

Float-parity: custom aggregates accumulate in integer cents (the data
has 2-decimal money), so Python's summation order cannot diverge from
DuckDB's — same trick as helpers.dsum, done pandas-side.

Reference file:line: N/A — empty reference dir (SURVEY.md §0).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf

from lambda_hive_spark.helpers import sql_dsum
from lambda_hive_spark.io import table
from lambda_hive_spark.orchestrator import Dag
from lambda_hive_spark.registry import op

# NOTE: pandas_udf / udtf objects are built INSIDE the ops, not at
# module scope — their decorators touch the active SparkContext (DDL
# schema parsing), and this module is imported by executor workers
# when they unpickle the plain helper functions below.


def _charge_pdf(extended: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """Vectorized per-row charge — the same IEEE mul/sub ops the oracle
    runs, so results are bit-identical without rounding."""
    return extended * (1.0 - discount) * (1.0 + tax)


@op(
    "udf_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
FROM lineitem
WHERE l_quantity >= 48
""",
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF (one Python batch per Arrow
    chunk, ~10-100× over row UDFs; SNIPPETS.md §2-3 pattern)."""
    charge = pandas_udf(_charge_pdf, T.DoubleType())
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


def _segment_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    # dropna first: SQL SUM/MAX skip NULLs (and SUM of an all-NULL
    # group is NULL, which pandas' sum-of-empty == 0.0 would get
    # wrong); COUNT(*) still counts every row.
    bal = pdf["c_acctbal"].dropna()
    cents = (bal * 100).round().astype("int64")
    return pd.DataFrame(
        {
            "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
            "n_customers": [len(pdf)],
            "sum_acctbal": [cents.sum() / 100.0 if len(cents) else None],
            "max_acctbal": [bal.max() if len(bal) else None],
        }
    )


@op(
    "udaf_grouped",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_acctbal,
       MAX(c_acctbal) AS max_acctbal
FROM customer GROUP BY c_mktsegment
""",
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped custom aggregation via Arrow-batched applyInPandas (one
    pandas frame per segment, executor-side — no driver collect). Sums
    run in integer cents for order-independent exactness."""
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .applyInPandas(
            _segment_stats,
            "c_mktsegment string, n_customers long, sum_acctbal double, max_acctbal double",
        )
    )


class _SplitWords:
    """1→N table function: one output row per word of the input."""

    def eval(self, text: str):  # noqa: ANN001 — UDTF protocol
        for i, w in enumerate(text.split(" ")):
            yield w, i + 1


@op(
    "udtf",
    oracle="""
SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word,
       CAST(unnest(range(1, len(string_split(p_name, ' ')) + 1)) AS BIGINT) AS pos
FROM part
""",
)
def udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in a LATERAL join (Spark 4 table-function surface);
    the oracle zips DuckDB's parallel unnests. Row-at-a-time Python —
    kept off hot paths by policy (module doc)."""
    spark.udtf.register("split_words", udtf(_SplitWords, returnType="word string, pos bigint"))
    table(spark, sf_dir, "part").createOrReplaceTempView("udtf_part")
    return spark.sql(
        "SELECT p.p_partkey, t.word, t.pos FROM udtf_part p, LATERAL split_words(p.p_name) t"
    )


@op(
    "fn_map",
    oracle="""
SELECT event_id, array_to_string(json_keys(props), ',') AS ks_csv,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
       CAST(len(json_keys(props)) AS BIGINT) AS n_keys
FROM events
""",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions over parsed `props` JSON (completes §2.8):
    from_json → map, then map_keys / element_at / map_from_entries
    (rebuild the map from its zipped entries before the lookup)."""
    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    rebuilt = F.map_from_entries(F.arrays_zip(F.map_keys(m), F.map_values(m)))
    return ev.select(
        "event_id",
        # NULL props → NULL csv (concat_ws alone would emit '' while
        # the oracle's array_to_string propagates NULL).
        F.when(
            F.col("props").isNotNull(), F.concat_ws(",", F.map_keys(m))
        ).alias("ks_csv"),
        F.element_at(rebuilt, "k").alias("k_val"),
        F.size(F.map_keys(m)).cast("bigint").alias("n_keys"),
    )


@op(
    "orchestrate_dag",
    tags=("side_effect",),
    oracle=f"""
SELECT o_orderpriority,
       {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
)
def orchestrate_dag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract→transform→load DAG on the thin orchestrator: two
    parallel extracts feed a transform; load materializes to parquet
    and the op returns the read-back (so the oracle checks the whole
    pipeline, including the sink)."""
    from lambda_hive_spark.helpers import dsum
    from lambda_hive_spark.operators.scans import _scratch

    out = _scratch("dag_load")

    def transform(s: SparkSession, deps: dict) -> DataFrame:
        li, o = deps["extract_lineitem"], deps["extract_orders"]
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
                F.count("*").alias("n_items"),
            )
        )

    def load(s: SparkSession, deps: dict) -> None:
        deps["transform"].write.mode("overwrite").parquet(out)

    dag = (
        Dag()
        .add("extract_lineitem", lambda s: table(s, sf_dir, "lineitem"))
        .add("extract_orders", lambda s: table(s, sf_dir, "orders"))
        .add("transform", transform, deps=("extract_lineitem", "extract_orders"))
        .add("load", load, deps=("transform",), retries=1)
    )
    run = dag.run(spark, max_parallel=4)
    if run.failed:
        raise next(iter(run.failed.values()))
    return spark.read.parquet(out)


@op(
    "orchestrate_schedule",
    tags=("side_effect",),
    oracle=f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice")} AS total
FROM orders GROUP BY 1
""",
)
def orchestrate_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill-style scheduled runs: one DAG job per order-year
    partition (the time trigger is host-side cron / availableNow; the
    engine's contract is per-window idempotent jobs), unioned into the
    full history. At 100 TB each job prunes to its year's partitions."""
    from functools import reduce

    from lambda_hive_spark.helpers import dsum

    o = table(spark, sf_dir, "orders")
    lo, hi = o.agg(F.min(F.year("o_orderdate")), F.max(F.year("o_orderdate"))).collect()[0]

    def window_job(yr: int):
        def job(s: SparkSession) -> DataFrame:
            return (
                o.filter(F.year("o_orderdate") == yr)
                .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
                .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total"))
            )

        return job

    dag = Dag()
    for yr in range(lo, hi + 1):
        dag.add(f"backfill_{yr}", window_job(yr))
    run = dag.run(spark, max_parallel=8)
    if run.failed:
        raise next(iter(run.failed.values()))
    return reduce(DataFrame.unionByName, (run.results[f"backfill_{y}"] for y in range(lo, hi + 1)))


def _tok_count_batches(it: "Iterator[pd.Series]") -> "Iterator[pd.Series]":
    """Iterator-of-batches form (the Iterator type hints are what make
    PySpark pick SCALAR_ITER): `_VOCAB` plays the expensive artifact
    (tokenizer/model weights) loaded ONCE per Python worker, then
    amortized over every Arrow batch the executor feeds it."""
    _VOCAB = {"the", "a", "of", "and"}  # stands in for a real tokenizer load
    for texts in it:
        # na_action + nullable Int64: NULL text → NULL count (the
        # oracle's list/len chain propagates NULL the same way).
        yield texts.map(
            lambda t: sum(1 for w in t.split(" ") if w not in _VOCAB),
            na_action="ignore",
        ).astype("Int64")


@op(
    "udf_scalar_iter",
    oracle="""
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '),
                w -> w NOT IN ('the', 'a', 'of', 'and'))) AS BIGINT)
         AS content_tokens
FROM documents
""",
)
def udf_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR_ITER pandas UDF — the third Python-UDF shape after
    per-batch scalar (udf_scalar) and grouped (udaf_grouped): the
    function receives an ITERATOR of Arrow batches, so per-worker
    setup (tokenizer load, model weights, trie build) runs once and
    amortizes across the whole partition instead of once per batch.
    THE shape for LLM-pipeline inference UDFs at 100 TB, where model
    load is seconds and batches are milliseconds.

    The toy artifact here is a stopword set; the oracle recomputes the
    same count relationally."""
    from pyspark.sql.functions import pandas_udf as _pudf

    content_tokens = _pudf(_tok_count_batches, T.LongType())
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", content_tokens("text").alias("content_tokens"))


def _purchase_error_profile(key, purchases: pd.DataFrame, errors: pd.DataFrame) -> pd.DataFrame:
    # Guard on column PRESENCE, not just emptiness: under an action
    # that needs none of the output values (df.count(), a pruned
    # projection), Catalyst prunes the cogroup inputs down to the key,
    # and the frames arrive without "ts" — indexing it raised KeyError
    # from the Python worker (found by the round-5 vacuity audit).
    first_p = purchases["ts"].min() if "ts" in purchases.columns and len(purchases) else pd.NaT
    first_e = errors["ts"].min() if "ts" in errors.columns and len(errors) else pd.NaT
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_purchases": [len(purchases)],
            "n_errors": [len(errors)],
            "error_before_first_purchase": [
                bool(
                    pd.notna(first_e)
                    and (pd.isna(first_p) or first_e < first_p)
                )
            ],
        }
    )


@op(
    "udaf_cogrouped",
    oracle="""
WITH p AS (
  SELECT user_id, MIN(ts) AS first_p, CAST(COUNT(*) AS BIGINT) AS n_p
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
e AS (
  SELECT user_id, MIN(ts) AS first_e, CAST(COUNT(*) AS BIGINT) AS n_e
  FROM events WHERE event_type = 'error' GROUP BY user_id
),
keys AS (SELECT user_id FROM p UNION SELECT user_id FROM e)
SELECT k.user_id,
       COALESCE(p.n_p, 0) AS n_purchases,
       COALESCE(e.n_e, 0) AS n_errors,
       (e.first_e IS NOT NULL AND (p.first_p IS NULL OR e.first_e < p.first_p))
         AS error_before_first_purchase
FROM keys k LEFT JOIN p ON k.user_id = p.user_id
            LEFT JOIN e ON k.user_id = e.user_id
""",
)
def udaf_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas — the two-sided custom aggregation API:
    each user's purchase stream and error stream arrive as two aligned
    pandas frames in one Python call (Spark co-shuffles both sides on
    the key). The imperative temporal logic (did an error precede the
    first purchase?) is two lines of pandas; the relational oracle
    needs a three-way outer join to say the same thing — which is
    exactly when cogroup earns its keep.

    Scale: both sides shuffle once on user_id; per-key state is the
    user's own rows, never the corpus."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    errors = ev.filter(F.col("event_type") == "error")
    return (
        purchases.groupBy("user_id")
        .cogroup(errors.groupBy("user_id"))
        .applyInPandas(
            _purchase_error_profile,
            "user_id long, n_purchases long, n_errors long, "
            "error_before_first_purchase boolean",
        )
    )


@op(
    "udtf_arrow",
    oracle="""
SELECT e.event_id, g.i AS slot,
       CAST(e.event_id * 10 + g.i AS BIGINT) AS slot_key
FROM events e, LATERAL (
  SELECT unnest(generate_series(0, CAST(json_extract(e.props, '$.k') AS BIGINT) % 4)) AS i
) g
WHERE e.event_id % 25 = 0
""",
)
def udtf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDTF (Spark 4 `useArrow=True`): rows
    cross the JVM↔Python boundary in Arrow batches instead of pickled
    one-by-one — the same ~10-100× transfer win pandas_udf has over
    row UDFs, applied to table functions. The function fans each
    event out into (k % 4) + 1 deterministic slots (the shape of a
    retry-schedule or shard-fanout expansion); the oracle mirrors it
    with a lateral generate_series. The UDTF class is defined inside
    the op (module-scope @udtf breaks executor imports — verify
    skill gotcha)."""
    from pyspark.sql.functions import udtf as udtf_deco

    class _FanOut:
        def eval(self, event_id: int, k: int):
            if k is None:
                # no fan-out config → no slots, mirroring the oracle's
                # lateral unnest(generate_series(0, NULL)) → zero rows
                return
            for i in range((k % 4) + 1):
                yield (event_id, i, event_id * 10 + i)

    spark.udtf.register(
        "fan_out",
        udtf_deco(_FanOut, returnType="event_id bigint, slot bigint, slot_key bigint", useArrow=True),
    )
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 25 == 0)
    ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    ).createOrReplaceTempView("udtf_fan_src")
    return spark.sql(
        "SELECT t.event_id, t.slot, t.slot_key "
        "FROM udtf_fan_src s, LATERAL fan_out(s.event_id, s.k) t"
    )
