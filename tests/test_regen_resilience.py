"""Corpus-regeneration resilience tier (opt-in, like test_scale_smoke).

The driver regenerated the fixture corpus once already (round 3:
timestamp physical layout flipped) and may again. This tier replays
the oracle comparison against schema-compatible PERTURBED corpora
(tools/perturb_corpus.py) so ops secretly coupled to row order,
row-group layout, timestamp physical type, or null-freedom fail HERE
instead of in a future driver round:

  shuffled     — rows md5-permuted, 3 row groups
  nanos        — shuffled + events.ts stored as TIMESTAMP(NANOS)
  nulled       — shuffled + ~2% NULLs in non-key value columns
  nulled_heavy — shuffled + 25% NULLs (all-NULL groups/windows)
  unicode      — shuffled + multibyte chars in documents.text
  empty_text   — shuffled + every 7th doc text '' / every 11th one-token
  colshuffle   — shuffled + physical column order reversed

Run:  SPARK_GRAFT_REGEN_SMOKE=1 pytest tests/test_regen_resilience.py
(each variant sweeps a representative op subset; the full-registry
sweep is `python tools/verify_driver.py <variant_dir>`)
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_REGEN_SMOKE") != "1",
    reason="regen-resilience smoke is opt-in (SPARK_GRAFT_REGEN_SMOKE=1)",
)

SF_DIR = os.environ.get("SPARK_GRAFT_REGEN_SF_DIR", "/root/testdata/sf0.001")

# One representative per family, plus every op the nulled sweep
# originally caught (the regression set this tier exists to hold).
REPRESENTATIVE = [
    "agg_hash", "join_multiway", "win_rank", "sort_multi", "union_all",
    "stream_tumbling", "dedup_exact", "dedup_ngram_jaccard", "sim_knn_exact",
    "text_tf_idf", "fn_date", "fn_hash", "agg_percentile", "join_asof",
]
NULL_REGRESSIONS = [
    "agg_weighted", "customer_balance_deciles", "eval_langid_confusion",
    "fn_array_hof", "fn_array_sort_distinct", "fn_binary_codec", "fn_format",
    "fn_json", "fn_map", "fn_string", "fn_struct", "join_asof", "limit_k",
    "quality_rule_audit_orders", "sketch_approx_quantiles", "text_fingerprint",
    "win_ntile_cume", "mm_arrow_checksum", "mm_feature_extract",
    "mm_frame_sample", "mm_resize_stub", "ts_ema", "udaf_grouped",
    "udf_scalar_iter",
]
# caught only at 25% null density (all-NULL windows / NULL fan-out keys)
# customer_rfm_segments: sf0.01 only — the sf0.001 corpus has too few
# all-NULL monetary groups to shift an ntile boundary (round 5).
HEAVY_NULL_REGRESSIONS = [
    "fn_like_family", "join_asof_forward", "udtf_arrow",
    "customer_rfm_segments", "pipeline_dataset_card",
]
# caught by the multibyte variant (byte-vs-char addressing, case maps,
# engine levenshtein units)
UNICODE_REGRESSIONS = [
    "dedup_edit_distance", "mm_block_dedup_savings", "mm_chunk_manifest",
    "mm_feature_extract", "mm_frame_sample", "mm_resize_stub",
    "text_clean_normalize", "mm_arrow_checksum", "mm_ingest",
    "text_tokenize", "text_tf_idf",
]
# targeted by the empty_text variant (ADVICE r4): empty / one-token
# docs drive chunk- and n-gram expansions into the sequence(start>stop)
# zero-length branch, where Spark's step inference diverges from
# generate_series unless the op guards it.
EMPTY_TEXT_TARGETS = [
    "mm_block_dedup_savings", "mm_chunk_manifest", "mm_ingest",
    "mm_feature_extract", "mm_arrow_checksum", "text_ngram",
    "text_tokenize", "text_tf_idf", "text_fingerprint", "doc_chunk_sliding",
    "dedup_chunk_exact", "dedup_ngram_jaccard", "dedup_exact",
    "text_clean_normalize", "doc_repetition", "text_bpe_merge_step",
    "pipeline_pack_sequences", "pipeline_encode_token_ids",
    "text_inverted_index",
]


# targeted by the novel_enum variant (round 6, motivated by the
# agg_pivot INT-code rewrite): every op that matches enum-valued
# categorical columns by literal (pivot values / CASE / IN) on either
# engine side. A regenerated corpus may widen a category domain;
# asymmetric hardcoding diverges here, symmetric hardcoding must stay
# green by construction.
NOVEL_ENUM_TARGETS = [
    "agg_pivot", "agg_hash", "case_when", "filter_conj", "filter_in",
    "attribution_last_touch", "brand_share_trend", "fn_interval",
    "text_lang_divergence_tv", "quality_rule_audit_orders",
    "tpch_q4_priority_check", "tpch_q12_priority_lines",
    "tpch_q16_supplier_part_count", "tpch_q19_disjunctive_revenue",
    "text_lang_stats", "pipeline_domain_mix", "eval_langid_confusion",
    "profile_heavy_hitters", "events_burst_detect", "classify_centroid",
]


# the lake table layer + streaming sink (round 6): all side-effect ops
# over orders/events-derived tables — the NULL-injected variants drive
# o_totalprice NULLs through Z-value scaling and CDF pre/post images,
# colshuffle through the manifest-schema read path.
LAKE_TARGETS = [
    "lake_merge_upsert", "lake_time_travel", "lake_compact_audit",
    "lake_schema_evolution", "lake_stats_pruned_scan",
    "lake_incremental_read", "lake_zorder_audit", "lake_cdf_read",
    "stream_sink_lake", "lake_ivm_refresh", "lake_delete_where",
    # r6 partitioning family: novel enum values become novel partition
    # tuples (routing + pruning under unseen categories); NULL-injected
    # event_type exercises the __HIVE_DEFAULT_PARTITION__ round-trip
    "lake_partitioned_write", "lake_partition_pruned_scan",
    "lake_replace_where", "lake_partition_evolution",
    "lake_generated_partition", "lake_shallow_clone",
]


def _sweep(spark, variant: str, names: list[str]) -> list[str]:
    import duckdb

    from lambda_hive_spark.registry import all_ops
    from tools.perturb_corpus import TABLES, build

    sf = build(SF_DIR, variant)
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    ops = all_ops()
    bad = []
    for name in names:
        o = ops[name]
        sdf = o.fn(spark, sf).toPandas()
        ddf = con.execute(o.oracle).fetchdf()
        cols = sorted(sdf.columns)
        s = sorted(map(str, sdf[cols].itertuples(index=False, name=None)))
        d = sorted(map(str, ddf[sorted(ddf.columns)].itertuples(index=False, name=None)))
        if cols != sorted(ddf.columns) or s != d:
            bad.append(name)
    con.close()
    return bad


@pytest.mark.parametrize("variant", ["shuffled", "nanos"])
def test_layout_variants(spark, variant):
    assert _sweep(spark, variant, REPRESENTATIVE) == []


def test_column_order_variant(spark):
    """Physical column order reversed (schema-compatible): every op
    selects by name, so this must be a no-op. Caught source_csv_json
    transposing fields — CSV is positional and Spark's explicit-schema
    read ignores the header names (round 5)."""
    from lambda_hive_spark.registry import all_ops

    ops = all_ops()
    names = [
        n for n in sorted(set(REPRESENTATIVE) | {"source_csv_json", "sink_csv_json_roundtrip"})
        if n in ops
    ]
    assert _sweep(spark, "colshuffle", names) == []


def test_null_injected_variant(spark):
    names = sorted(set(REPRESENTATIVE + NULL_REGRESSIONS))
    assert _sweep(spark, "nulled", names) == []


def test_heavy_null_variant(spark):
    names = sorted(set(NULL_REGRESSIONS + HEAVY_NULL_REGRESSIONS))
    assert _sweep(spark, "nulled_heavy", names) == []


def test_unicode_variant(spark):
    names = sorted(set(REPRESENTATIVE + UNICODE_REGRESSIONS))
    assert _sweep(spark, "unicode", names) == []


def test_empty_text_variant(spark):
    assert _sweep(spark, "empty_text", sorted(set(EMPTY_TEXT_TARGETS))) == []


def test_novel_enum_variant(spark):
    assert _sweep(spark, "novel_enum", sorted(set(NOVEL_ENUM_TARGETS))) == []


@pytest.mark.parametrize("variant", ["nulled_heavy", "colshuffle"])
def test_lake_layer_variants(spark, variant):
    assert _sweep(spark, variant, LAKE_TARGETS) == []


# round-6 retrieval + data-loading ops: text-derived, so the hostile
# variants are empty/one-token docs (sequence(start>stop) branches in
# phrase matching, ['']-token postings in BM25/boolean) and multibyte
# text (byte-vs-char tokenization drift); the md5-keyed loaders join
# the shuffled sweep because their whole contract is row-order
# independence.
RETRIEVAL_TARGETS = [
    "text_bm25_topk", "text_boolean_search", "text_phrase_search",
    "pipeline_epoch_shuffle", "pipeline_curriculum_order",
]

# orchestration scenario ops: aggregate lineitem/orders/customer, so
# NULL-injected money columns must flow through the decimal-exact sums
# on both engines; colshuffle exercises the read-back-by-name path of
# their materialized checkpoints.
ORCHESTRATION_TARGETS = [
    "orchestrate_incremental", "orchestrate_retry_idempotent",
    "orchestrate_resume_checkpoint",
]


@pytest.mark.parametrize("variant", ["shuffled", "empty_text", "unicode"])
def test_retrieval_variants(spark, variant):
    assert _sweep(spark, variant, RETRIEVAL_TARGETS) == []


@pytest.mark.parametrize("variant", ["nulled", "colshuffle"])
def test_orchestration_variants(spark, variant):
    assert _sweep(spark, variant, ORCHESTRATION_TARGETS) == []
