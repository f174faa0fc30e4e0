"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``lambda_hive_spark``; this module is a thin
adapter over its operator registry (SURVEY.md §3 entry points 1-2).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lambda_hive_spark.registry import all_ops, op_source_hash

_REPO = os.path.dirname(os.path.abspath(__file__))


def _graded_names() -> set[str]:
    """Op names already driver-graded in a prior round.

    Two evidence sources, union'd:

    1. GRADED.json — the manifest {round: [op, ...], "hashes": {op: fp}}
       maintained by tools/update_graded.py from each CORRECTNESS_r{N}.
       An op whose implementation changed since grading (fingerprint
       mismatch) is treated as ungraded so the driver re-verifies it.
    2. Any CORRECTNESS_r{N}.json in the repo root with N NEWER than the
       manifest's last merged round — rounds 3 AND 4 both hit the same
       failure mode where the driver wrote its CORRECTNESS file after
       the session's final commit, so the manifest merge lagged a round
       and the next window re-graded 50 already-green ops. Reading the
       driver's own artifact closes that gap with no manual merge step.
       Only NEWER-than-merge files count: an old round's green row must
       not resurrect an op edited since (the manifest's hash guard owns
       that call), while a newer round's green row post-dates any edit
       the manifest knows about and is the freshest evidence available.
       Glob-discovered rows carry no fingerprint of their own, so they
       are checked against OPHASHES.json — the per-op fingerprint
       snapshot tools/snapshot_hashes.py writes at each round's final
       commit (i.e. the exact source the driver graded): a row is
       trusted only while the op's current fingerprint still matches
       the snapshot, so an op edited after the newest CORRECTNESS
       landed is re-queued instead of trusted blind (r5 advisor gap).
       A row with err == "no_oracle" additionally counts only while
       the op STILL has no oracle in the current registry — an op that
       gained an oracle since must re-earn a real value-hash green.
    """
    ops = all_ops()
    names: set[str] = set()

    try:
        with open(os.path.join(_REPO, "GRADED.json")) as f:
            manifest = json.load(f)
    except (OSError, ValueError):
        manifest = {}
    hashes = manifest.get("hashes", {})
    merged_rounds = [
        int(key[1:])
        for key in manifest
        if key != "hashes" and key.startswith("r") and key[1:].isdigit()
    ]
    last_merged = max(merged_rounds, default=0)
    for key, entries in manifest.items():
        if key == "hashes" or not isinstance(entries, list):
            continue
        for name in entries:
            if (
                name not in ops
                or hashes.get(name) is None  # pre-hash manifest entry: trust it
                or hashes[name] == op_source_hash(ops[name])
            ):
                names.add(name)

    import glob
    import re

    try:
        with open(os.path.join(_REPO, "OPHASHES.json")) as f:
            snapshot = json.load(f)
    except (OSError, ValueError):
        snapshot = None  # pre-sidecar repo state: fall back to trusting

    def _fingerprint_ok(name: str) -> bool:
        if snapshot is None:
            return True  # documented fallback, closed once the sidecar exists
        return snapshot.get(name) == op_source_hash(ops[name])

    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", os.path.basename(path))
        if m is None or int(m.group(1)) <= last_merged:
            continue
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict) or name not in ops:
                continue
            if (
                row.get("err") == "no_oracle"
                and ops[name].oracle is not None
            ):
                continue  # op gained an oracle since — re-earn a value green
            if (
                row.get("err") in (None, "no_oracle")
                and row.get("rows_match") is not False
                and row.get("hash_match") is not False
                and _fingerprint_ok(name)
            ):
                names.add(name)
    return names


# Round-7 priority queue for the driver's bounded grading window
# (VERDICT r6 item 1): after absorbing CORRECTNESS_r06, 76 registry
# ops lack a trusted driver row — 73 never graded plus 3 re-earners
# whose source changed after their grading round (text_ngram,
# dedup_clusters, sim_pairs_rp_lsh). The window grades ~50/round, so
# the first ~50 pinned here are the capability families with ZERO
# driver evidence (lake tail, retrieval, orchestration, intervals,
# sql/spark4, multimodal, joins tail, udx tail, vector stats, graph,
# timeseries tail) — exactly the families the r6 verdict named for
# this round; the scalar-function/pipeline tail and the 3 re-earners
# queue behind them and drain in round 8. Any op ADDED this round is
# unpinned, so it queues after all 76 via the family rank — the
# backlog drains before new work consumes window slots.
_BACKLOG_FIRST = (
    # lakehouse maintenance tail (lake.py) — 7
    "lake_delete_where", "lake_bloom_pruned_scan", "lake_restore_version",
    "lake_vacuum_audit", "lake_constraint_audit", "lake_history_metrics",
    "lake_optimize_small_files",
    # retrieval (retrieval.py) — 4
    "text_bm25_topk", "text_boolean_search", "text_phrase_search",
    "retrieval_rrf_fusion",
    # orchestration depth (orchestration.py) — 3
    "orchestrate_incremental", "orchestrate_retry_idempotent",
    "orchestrate_resume_checkpoint",
    # interval algebra (intervals.py) — 3
    "join_interval_overlap", "interval_islands_merge",
    "interval_max_concurrent",
    # Spark-4 SQL surface (spark4.py) — 5
    "sql_parameterized", "sql_pivot_clause", "sql_window_clause",
    "source_python_datasource", "fn_collation",
    # multimodal tail (multimodal.py) — 3
    "mm_arrow_checksum", "mm_chunk_manifest", "mm_block_dedup_savings",
    # join tail (joins.py) — 4
    "join_lateral_topn", "join_null_safe", "join_shuffle_hash_hint",
    "join_runtime_bloom",
    # udx tail (udx.py) — 3
    "udf_scalar_iter", "udaf_cogrouped", "udtf_arrow",
    # vector / stats (stats.py) — 6
    "vec_pca_power_iter", "vec_pq_encode", "vec_pq_recall_eval",
    "vec_norm_audit", "stats_chi2_independence", "sim_label_centroids",
    # graph tail (graph.py) — 4
    "graph_pagerank", "graph_link_prediction", "graph_component_density",
    "graph_bfs_levels",
    # timeseries tail (timeseries.py) — 2
    "ts_rate_changepoint", "ts_spine_recursive",
    # streaming upsert + cache reuse — 2
    "stream_upsert_foreachbatch", "maintenance_cache_reuse",
    # extended scalar functions (functions2.py) — first 4 of 7;
    # window boundary falls here (46 capability rows + these 4 = 50)
    "fn_timezone", "fn_rounding_modes", "fn_binary_codec", "fn_interval",
    # ---- round-8 residue (positions 51+): scalar/pipeline tail ----
    "fn_conditional", "fn_like_family", "fn_xml",
    "agg_corr_covar", "agg_mode_tiebreak", "agg_weighted",
    "agg_listagg_ordered", "agg_filter_clause",
    "doc_chunk_sliding", "dedup_chunk_exact", "pipeline_domain_cap",
    "text_bpe_merge_step", "pipeline_shard_assignment",
    "pipeline_epoch_shuffle", "pipeline_curriculum_order",
    "pipeline_observe_metrics", "dedup_url_canonicalize",
    "pipeline_incremental_ingest", "pipeline_dataset_card",
    "pipeline_dedup_report",
    "dedup_semantic_cluster", "text_inverted_index", "basket_pair_lift",
    # re-earners (edited after their grading round; green rows expired
    # via the GRADED.json hash guard)
    "text_ngram", "dedup_clusters", "sim_pairs_rp_lsh",
)


# User-impact ranking of operator FAMILIES (by defining module) for the
# ungraded backlog — the self-updating generalization of the explicit
# pin: once a round's grades are absorbed, the next ~50-slot window
# automatically fills with the highest-traffic ungraded family without
# anyone editing a hardcoded tuple (the r3/r4 stale-pin trap).
_FAMILY_RANK = {
    "tpch_full": 0,   # canonical benchmark surface
    "warehouse": 1,   # CDC / SCD2 / unpivot
    "timeseries": 2,
    "profiling": 3,
    "training": 4,    # LLM-curation pipeline
    "quality": 5,
    "graph": 6,
    "functions2": 7,  # extended fn_* surface
    "llm": 8,
    "analytics": 9,
    "stats": 10,
    "misc_agg": 11,
    "pipeline": 12,
    "joins": 13,
    "udx": 14,
    "spark4": 15,
    "multimodal": 16,
    "extras": 17,
    "streams": 18,
    "maintenance": 19,
    "intervals": 20,
    "lake": 21,
    "retrieval": 22,      # BM25 / boolean / phrase search (round 6)
    "orchestration": 23,  # incremental / retry / resume DAG depth (round 6)
}
_FAMILY_DEFAULT = len(_FAMILY_RANK)


def _family_rank(o) -> int:
    return _FAMILY_RANK.get(o.fn.__module__.rsplit(".", 1)[-1], _FAMILY_DEFAULT)


def _ordered_ops():
    """Registry ops reordered so the driver's bounded correctness window
    (first ~50 queries) grades ops that do not yet have a driver
    CORRECTNESS row: the pinned backlog first, then other never-graded
    (or edited-since-grading) ops by family impact rank then registry
    order, then the graded remainder."""
    ops = all_ops()
    graded = _graded_names()
    backlog_rank = {n: i for i, n in enumerate(_BACKLOG_FIRST)}

    ordered = sorted(
        enumerate(ops.items()),
        key=lambda item: (
            item[1][0] in graded,                              # ungraded first
            backlog_rank.get(item[1][0], len(backlog_rank)),   # pinned backlog
            _family_rank(item[1][1]),                          # family impact
            item[0],                                           # registry order
        ),
    )
    return {name: o for _, (name, o) in ordered}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    from lambda_hive_spark.operators.aggregates import q1_pricing_summary

    sf_dir = os.environ.get("SPARK_GRAFT_ENTRY_SF_DIR", "/root/testdata/sf0.001")
    return q1_pricing_summary(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's correctness window covers not-yet-graded ops first."""
    return {name: o.fn for name, o in _ordered_ops().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle for each sql-checkable op; ops without an
    oracle get the driver's weaker rows-only check."""
    return {name: o.oracle for name, o in _ordered_ops().items() if o.oracle is not None}
