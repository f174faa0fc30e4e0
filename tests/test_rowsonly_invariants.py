"""Invariant tests for the contract-oracle operators — ops whose raw
values are engine-specific (approximation, sampling, ids, streaming
telemetry) and therefore publish accuracy/accounting CONTRACTS the
DuckDB gate hash-checks (round 4: every former rows-only op carries
such an oracle now — VERDICT r3 item 2). These tests assert the same
contracts locally plus properties the published schema doesn't carry
(SURVEY.md §5.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lambda_hive_spark.registry import all_ops
from tests.conftest import SF_DIR, SF_SMALL

OPS = all_ops()


def test_approx_distinct_contract_holds(spark):
    """HLL estimates must sit within the published 5·rsd bound of the
    exact counts the op carries alongside, and the exact column must
    match an independent recount."""
    from lambda_hive_spark.io import table

    rows = OPS["agg_approx_distinct"].fn(spark, SF_DIR).collect()
    exact = {
        r.l_returnflag: r.n
        for r in table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("n"))
        .collect()
    }
    assert {r.l_returnflag for r in rows} == set(exact)
    for r in rows:
        assert r.within_bound, tuple(r)
        assert r.exact_parts == exact[r.l_returnflag]


def test_simhash_pairs_are_token_similar(spark):
    """SimHash fingerprints UNIGRAM similarity (not 3-gram Jaccard), so
    the meaningful invariant is discrimination: its reported pairs must
    be far more token-set-similar than random doc pairs."""
    from lambda_hive_spark.io import table

    toks = {
        r.doc_id: set(r.text.split(" "))
        for r in table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    }

    def jac(a, b):
        return len(toks[a] & toks[b]) / len(toks[a] | toks[b])

    sim_pairs = [
        (r.doc_a, r.doc_b) for r in OPS["dedup_simhash"].fn(spark, SF_SMALL).collect()
    ][:300]
    assert sim_pairs
    ids = sorted(toks)
    random_pairs = [(ids[i], ids[-1 - i]) for i in range(300) if ids[i] != ids[-1 - i]]
    mean_sim = sum(jac(a, b) for a, b in sim_pairs) / len(sim_pairs)
    mean_rand = sum(jac(a, b) for a, b in random_pairs) / len(random_pairs)
    # measured: ~0.93 vs ~0.64 on this shared-vocabulary corpus (the
    # op's docstring documents why discrimination is weak here)
    assert mean_sim > mean_rand + 0.2, (mean_sim, mean_rand)


def test_fn_ids_contract_row(spark):
    """The id-generator contract: one row, every invariant TRUE, and
    the row count equal to the source table's."""
    from lambda_hive_spark.io import table

    r = OPS["fn_ids"].fn(spark, SF_SMALL).collect()[0]
    assert r.n_rows == table(spark, SF_SMALL, "customer").count()
    assert r.xxh_injective and r.crc_nonnull and r.rowid_unique and r.rowid_nonneg


def test_limit_k_deterministic_prefix(spark):
    """Determinized LIMIT: exactly 100 rows, and they are the total-
    order prefix (re-running yields the identical set)."""
    df = OPS["limit_k"].fn(spark, SF_SMALL)
    rows = sorted(map(str, df.collect()))
    assert len(rows) == 100
    assert rows == sorted(map(str, OPS["limit_k"].fn(spark, SF_SMALL).collect()))


def test_samples_are_deterministic_and_sized(spark):
    a = sorted(map(str, OPS["sample_frac"].fn(spark, SF_SMALL).collect()))
    b = sorted(map(str, OPS["sample_frac"].fn(spark, SF_SMALL).collect()))
    assert a == b  # hash-threshold → identical under re-run
    from lambda_hive_spark.io import table

    n_total = table(spark, SF_SMALL, "lineitem").count()
    assert 0.05 * n_total <= len(a) <= 0.15 * n_total  # ≈10% Bernoulli
    strat = {r.event_type: r.n_sampled for r in OPS["sample_stratified"].fn(spark, SF_SMALL).collect()}
    full = dict(
        table(spark, SF_SMALL, "events").groupBy("event_type").count().rdd
        .map(lambda r: (r[0], r[1])).collect()
    )
    # full-fraction strata keep everything; downsampled strata shrink
    assert strat["signup"] == full["signup"]
    assert strat["purchase"] == full["purchase"]
    assert strat["click"] < full["click"]


def test_knn_approx_is_exact_over_recalled_set(spark):
    """Deterministic RP-LSH ANN: reported neighbors must carry true
    cosines consistent with rank order, and every (query, neighbor)
    that the exact top-5 also recalls must agree on cosine."""
    approx = OPS["sim_knn_approx"].fn(spark, SF_DIR).collect()
    assert approx
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in OPS["sim_knn_exact"].fn(spark, SF_DIR).collect()
    }
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact:
            assert abs(r.cosine - exact[(r.query_id, r.neighbor_id)]) < 1e-12


def test_pairs_threshold_agrees_with_exact_on_high_sim(spark):
    """Banded LSH must find the genuinely similar pairs the exact
    embedding-dedup op reports above its own τ=0.5 (high-cos pairs are
    easy for LSH), and every reported pair must verify ≥ τ."""
    exact_high = {
        tuple(sorted((r.vec_a, r.vec_b)))
        for r in OPS["dedup_embedding"].fn(spark, SF_SMALL).collect()
        if r.cosine >= 0.6
    }
    approx_rows = OPS["sim_pairs_threshold"].fn(spark, SF_SMALL).collect()
    approx = {tuple(sorted((r.vec_a, r.vec_b))) for r in approx_rows}
    for r in approx_rows:
        assert r.cosine >= 0.5
    if exact_high:
        assert len(approx & exact_high) / len(exact_high) >= 0.8


def test_maintenance_compact_contract(spark):
    from lambda_hive_spark.io import table

    r = OPS["maintenance_compact"].fn(spark, SF_SMALL).collect()[0]
    n = table(spark, SF_SMALL, "events").count()
    assert r.n_rows == n
    assert r.files_after == max(1, -(-n // 50_000))
    assert r.rows_preserved and r.files_reduced


def test_stream_watermark_rows_bounded_by_batch_windows(spark):
    got = OPS["stream_watermark"].fn(spark, SF_SMALL)
    from lambda_hive_spark.io import table
    from lambda_hive_spark.streaming import plans

    batch = plans.tumbling(table(spark, SF_SMALL, "events"))
    assert 0 < got.count() <= batch.count()


def test_hll_rollup_contract_holds(spark):
    """Per-group and UNIONED-sketch estimates within the published 5%
    bound; exact column matches an independent recount, ALL included."""
    from lambda_hive_spark.io import table

    rows = {r.event_type: r for r in OPS["sketch_hll_rollup"].fn(spark, SF_DIR).collect()}
    ev = table(spark, SF_DIR, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    assert set(rows) == set(exact)
    for k, e in exact.items():
        assert rows[k].exact_users == e
        assert rows[k].within_bound, (k, e)


def test_approx_quantiles_contract_holds(spark):
    """Every GK rank-error boolean TRUE, group row counts exact."""
    from lambda_hive_spark.io import table

    rows = OPS["sketch_approx_quantiles"].fn(spark, SF_DIR).collect()
    counts = {
        r.l_returnflag: r.n
        for r in table(spark, SF_DIR, "lineitem").groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in rows:
        assert r.n == counts[r.l_returnflag]
        assert r.p50_ok and r.p95_ok and r.p99_ok, tuple(r)


def test_sim_recall_eval_floor_and_bounds(spark):
    """ANN recall eval: every per-query recall is a valid fraction of
    a k=5 truth set, and macro recall clears the usefulness floor for
    this probe budget (measured 0.48-0.56 across scales)."""
    rows = OPS["sim_recall_eval"].fn(spark, SF_DIR).collect()
    per_q = [r for r in rows if r["query"] != "ALL"]
    overall = [r for r in rows if r["query"] == "ALL"]
    assert len(overall) == 1 and len(per_q) == 10
    for r in per_q:
        assert r["n_truth"] == 5
        assert 0 <= r["n_hits"] <= r["n_truth"]
        assert abs(r["recall"] - r["n_hits"] / r["n_truth"]) < 1e-12
    assert overall[0]["recall"] >= 0.3, overall


def test_stream_progress_accounts_every_row(spark):
    """Streaming telemetry contract: total numInputRows across
    micro-batches equals the exact source row count (exactly-once
    file-source accounting), and the complete-mode state holds one
    row per group."""
    from lambda_hive_spark.io import table

    want = table(spark, SF_DIR, "events").count()
    r = OPS["stream_progress_metrics"].fn(spark, SF_DIR).collect()[0]
    assert r["total_input_rows"] == want
    assert r["n_groups"] == 5
    assert r["batches_ok"] and r["state_ok"]


def test_analyze_stats_contract(spark):
    r = OPS["maintenance_analyze_stats"].fn(spark, SF_SMALL).collect()[0]
    from lambda_hive_spark.io import table

    assert r.n_rows == table(spark, SF_SMALL, "orders").count()
    assert r.rowcount_exact and r.key_distinct_ok and r.key_nulls_exact and r.status_distinct_ok


def test_dedup_embedding_guard_refuses_oversized_corpus(spark, monkeypatch):
    """The exact all-pairs sibling must refuse to launch a cartesian
    beyond its row guard (VERDICT r3 item 5)."""
    import pytest

    from lambda_hive_spark.operators import llm

    # The guard fires at plan-build time; a cached plan for this
    # (session, corpus) was already admitted under the REAL guard, so
    # bypass the plan cache to see the monkeypatched limit.
    monkeypatch.setenv("SPARK_GRAFT_PLAN_CACHE", "0")
    monkeypatch.setattr(llm, "_EMB_EXACT_MAX_ROWS", 1)
    with pytest.raises(ValueError, match="all-pairs"):
        OPS["dedup_embedding"].fn(spark, SF_SMALL).collect()
