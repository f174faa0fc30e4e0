"""Property-style checks (SURVEY.md §5.2): algebraic invariants that
must hold regardless of data values, plus a hypothesis-driven
Spark≡DuckDB equivalence over randomized predicates."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from lambda_hive_spark.io import table
from lambda_hive_spark.registry import all_ops
from tests.conftest import SF_SMALL

OPS = all_ops()


def test_union_all_count_additivity(spark):
    o = table(spark, SF_SMALL, "orders")
    a = o.filter(F.col("o_orderkey") % 2 == 0)
    b = o.filter(F.col("o_orderkey") % 2 == 1)
    assert a.unionByName(b).count() == a.count() + b.count() == o.count()


def test_topk_is_sorted_prefix(spark):
    o = table(spark, SF_SMALL, "orders")
    full = [r.o_orderkey for r in o.orderBy(F.desc("o_totalprice"), "o_orderkey").collect()]
    top = [
        r.o_orderkey
        for r in o.orderBy(F.desc("o_totalprice"), "o_orderkey").limit(25).collect()
    ]
    assert top == full[:25]


def test_semi_anti_partition_left(spark):
    c = table(spark, SF_SMALL, "customer")
    o = table(spark, SF_SMALL, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    assert semi.count() + anti.count() == c.count()
    assert semi.intersect(anti).count() == 0


def test_intersect_except_partition(spark):
    o = table(spark, SF_SMALL, "orders").select("o_orderstatus", "o_orderpriority").distinct()
    b = table(spark, SF_SMALL, "orders").filter(F.col("o_totalprice") > 100000).select(
        "o_orderstatus", "o_orderpriority"
    ).distinct()
    assert o.intersect(b).count() + o.exceptAll(b.distinct()).distinct().count() == o.count()


def test_dedup_exact_conserves_rows(spark):
    out = OPS["dedup_exact"].fn(spark, SF_SMALL)
    n_docs = table(spark, SF_SMALL, "documents").count()
    assert out.agg(F.sum("n_copies")).collect()[0][0] == n_docs


def test_jaccard_pairs_are_canonical_and_bounded(spark):
    out = OPS["dedup_ngram_jaccard"].fn(spark, SF_SMALL).collect()
    for r in out:
        assert r.doc_a < r.doc_b
        assert 0.6 <= r.jaccard <= 1.0


def test_jaccard_df_cap_is_conservative(spark, monkeypatch):
    """The stop-shingle df-cap bounds bucket fan-out and only ever
    *removes* pairs (undercounted `shared` → lower jaccard) — it can
    never invent a dup pair. With the default cap (10k ≫ fixture max df
    25) results are exactly the uncapped ones."""
    uncapped = {(r.doc_a, r.doc_b) for r in OPS["dedup_ngram_jaccard"].fn(spark, SF_SMALL).collect()}
    monkeypatch.setenv("SPARK_GRAFT_JACCARD_MAX_DF", "3")
    capped = {(r.doc_a, r.doc_b) for r in OPS["dedup_ngram_jaccard"].fn(spark, SF_SMALL).collect()}
    assert capped <= uncapped
    monkeypatch.setenv("SPARK_GRAFT_JACCARD_MAX_DF", "10000")
    default = {(r.doc_a, r.doc_b) for r in OPS["dedup_ngram_jaccard"].fn(spark, SF_SMALL).collect()}
    assert default == uncapped


def test_merge_upsert_preserves_keys_and_applies_updates(spark):
    out = OPS["merge_upsert"].fn(spark, SF_SMALL)
    base = table(spark, SF_SMALL, "orders")
    assert out.count() == base.count()
    updated = out.filter(F.col("o_orderkey") % 10 == 0)
    assert updated.filter(F.col("o_orderstatus") != "P").count() == 0


def test_window_topk_groups_bounded_and_subset(spark):
    """Every customer's top-3 rows are ≤3 and each appears in the full
    orders table with its own top price ordering respected."""
    out = OPS["win_topk_per_group"].fn(spark, SF_SMALL)
    sizes = out.groupBy("o_custkey").count()
    assert sizes.filter(F.col("count") > 3).count() == 0
    o = table(spark, SF_SMALL, "orders")
    per_cust_max = o.groupBy("o_custkey").agg(F.max("o_totalprice").alias("mx"))
    top1 = out.groupBy("o_custkey").agg(F.max("o_totalprice").alias("top_price"))
    joined = top1.join(per_cust_max, "o_custkey")
    assert joined.filter(F.col("top_price") != F.col("mx")).count() == 0


@pytest.fixture(scope="module")
def duck_small():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_SMALL}/lineitem.parquet')"
    )
    yield con
    con.close()


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    qty=st.integers(min_value=1, max_value=50),
    disc=st.floats(min_value=0.0, max_value=0.1, allow_nan=False),
)
def test_filter_agrees_with_duckdb_on_random_predicates(spark_h, duck_h, qty, disc):
    """For arbitrary (quantity, discount) thresholds the Spark plan and
    DuckDB must select exactly the same rows — the predicate-boundary
    equivalence the whole oracle harness rests on."""
    li = table(spark_h, SF_SMALL, "lineitem")
    got = li.filter((F.col("l_quantity") >= qty) & (F.col("l_discount") <= disc)).count()
    want = duck_h.execute(
        f"SELECT COUNT(*) FROM lineitem WHERE l_quantity >= {qty} AND l_discount <= {disc}"
    ).fetchone()[0]
    assert got == want


# hypothesis can't use function-scoped fixtures; bridge via module scope
@pytest.fixture(scope="module")
def _bridge(spark, duck_small):
    global _SPARK, _DUCK
    _SPARK, _DUCK = spark, duck_small
    return True


@pytest.fixture()
def spark_h(_bridge):
    return _SPARK


@pytest.fixture()
def duck_h(_bridge):
    return _DUCK


def test_minhash_candidates_verify_to_exact_subset(spark):
    """MinHash+LSH output is exact-verified, so it must be a subset of
    the exact all-pairs result; with 8 bands the miss probability at
    J>=0.6 is ~1e-3, so recall should be near-total."""
    exact = {
        (r.doc_a, r.doc_b) for r in OPS["dedup_ngram_jaccard"].fn(spark, SF_SMALL).collect()
    }
    near = {
        (r.doc_a, r.doc_b) for r in OPS["dedup_near_minhash"].fn(spark, SF_SMALL).collect()
    }
    assert near <= exact
    if exact:
        assert len(near) / len(exact) >= 0.95


def test_train_test_split_fraction_and_determinism(spark):
    out = OPS["pipeline_train_test_split"].fn(spark, SF_SMALL)
    rows = out.collect()
    n_test = sum(1 for r in rows if r.split == "test")
    assert 0.04 <= n_test / len(rows) <= 0.18  # md5 bucket < 0x1a ≈ 10.2%
    again = {(r.doc_id, r.split) for r in OPS["pipeline_train_test_split"].fn(spark, SF_SMALL).collect()}
    assert again == {(r.doc_id, r.split) for r in rows}  # restart-idempotent


def test_contamination_excludes_eval_docs(spark):
    out = OPS["pipeline_contamination"].fn(spark, SF_SMALL).collect()
    for r in out:
        assert r.doc_id % 50 != 0  # eval docs never flagged as contaminated
        assert r.max_shared >= 5


def test_sessionize_seq_starts_at_one(spark):
    rows = OPS["pipeline_sessionize"].fn(spark, SF_SMALL).collect()
    from collections import defaultdict

    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r.session_seq)
    for seqs in per_user.values():
        assert min(seqs) == 1
        assert max(seqs) >= 1


def test_domain_mix_downsamples_only_english(spark):
    d = table(spark, SF_SMALL, "documents")
    out = OPS["pipeline_domain_mix"].fn(spark, SF_SMALL)
    non_en_in = d.filter(F.col("lang") != "en").count()
    non_en_out = out.filter(F.col("lang") != "en").count()
    # '< ff' drops only the ~1/256 of docs whose md5 prefix is 'ff'
    assert non_en_out >= 0.95 * non_en_in
    en_in = d.filter(F.col("lang") == "en").count()
    en_out = out.filter(F.col("lang") == "en").count()
    assert 0.3 * en_in <= en_out <= 0.7 * en_in  # ~50% en retention


def test_pack_sequences_bin_budget(spark):
    rows = OPS["pipeline_pack_sequences"].fn(spark, SF_SMALL).collect()
    from collections import defaultdict

    bins = defaultdict(list)
    for r in rows:
        bins[(r.lang, r.seq_bin)].append(r.n_tokens)
    for (lang, b), toks in bins.items():
        # streaming-pack bound: a bin overflows 2048 by at most its last doc
        assert sum(toks) <= 2048 + max(toks), (lang, b, sum(toks))


# ------------------------------------------------- bloom hash parity


def _spark_bloom_positions(spark, values, m_bits, k):
    """The JVM twin of lakehouse._bloom_positions, exactly as
    bloom_index builds it: salted-md5 double hashing over the
    string-canonical value."""
    from lambda_hive_spark import lakehouse as lh

    df = spark.createDataFrame([(v,) for v in values], "v string").selectExpr(
        "v",
        f"CAST(CONV(SUBSTRING(MD5(CONCAT(v, '{lh._BLOOM_SALT1}')), 1, 15), 16, 10)"
        " AS BIGINT) AS h1",
        f"(CAST(CONV(SUBSTRING(MD5(CONCAT(v, '{lh._BLOOM_SALT2}')), 1, 15), 16, 10)"
        " AS BIGINT) | 1) AS h2",
    ).selectExpr(
        "v", f"transform(sequence(0, {k - 1}), i -> (h1 + i * h2) % {m_bits}L) AS pos"
    )
    return {r["v"]: list(r["pos"]) for r in df.collect()}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
def test_bloom_positions_spark_python_parity_strings(spark_h, vals):
    """The index is built by JVM SQL expressions and probed by driver-
    side Python; the k bit positions MUST agree for arbitrary unicode
    values or a point lookup silently skips a file that has the value
    (the unforgivable bloom failure: lost rows, not lost speed)."""
    from lambda_hive_spark.lakehouse import _bloom_positions

    got = _spark_bloom_positions(spark_h, vals, 8192, 7)
    for v in vals:
        assert got[v] == _bloom_positions(v, 8192, 7), repr(v)


def test_bloom_positions_int_canonicalization(spark):
    """Integer columns canonicalize through CAST(bigint AS STRING) on
    the JVM and str(int) in the probe — pin the corners (negatives,
    zero, int64 extremes)."""
    from lambda_hive_spark.lakehouse import _bloom_positions

    ints = [0, -1, 5, -5, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    df = spark.createDataFrame([(i,) for i in ints], "v long").selectExpr(
        "CAST(v AS STRING) AS v"
    )
    strs = [r["v"] for r in df.collect()]
    assert strs == [str(i) for i in ints]  # canonical forms agree
    got = _spark_bloom_positions(spark, strs, 8192, 7)
    for i in ints:
        assert got[str(i)] == _bloom_positions(i, 8192, 7), i


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a=st.integers(min_value=-50, max_value=1050),
    b=st.integers(min_value=-50, max_value=1050),
    v=st.integers(min_value=0, max_value=10000),
    op=st.sampled_from([">", ">=", "<", "<=", "="]),
)
def test_scan_where_equals_full_filter(spark_h, tmp_path_factory, a, b, v, op):
    """Auto-pruned scans must return exactly read().filter(pred) for
    arbitrary sargable predicates — pruning may only skip files the
    predicate provably cannot match (lost rows = the unforgivable
    pruning failure)."""
    from lambda_hive_spark import lakehouse as lh

    global _SW_PATH
    if "_SW_PATH" not in globals():
        path = str(tmp_path_factory.mktemp("swprop") / "tbl")
        df = (
            _SPARK.range(1000)
            .select("id", (F.col("id") * 10).alias("val"))
            .repartitionByRange(10, "id")
        )
        lh.create(_SPARK, path, df, key="id")
        _SW_PATH = path
    lo, hi = min(a, b), max(a, b)
    pred = f"id BETWEEN {lo} AND {hi} AND val {op} {v}"
    got = sorted(r["id"] for r in lh.scan_where(spark_h, _SW_PATH, pred).collect())
    want = sorted(
        r["id"] for r in lh.read(spark_h, _SW_PATH).filter(pred).collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# Round-6 retrieval / loader ops: independent PYTHON reference checks —
# stronger than the DuckDB oracle alone, because the oracle mirrors the
# op's formulation while these recompute the semantics from scratch.
# ---------------------------------------------------------------------------


def test_bm25_matches_pure_python_reference(spark):
    """Recompute BM25 end-to-end in Python (math.log + Decimal
    quantization replicating Spark's round/decimal-cast semantics) and
    require the same ranked doc ids and scores within one micro-unit."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from lambda_hive_spark.operators.retrieval import _QUERIES, _TOPK

    docs = {
        r.doc_id: r.text
        for r in table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    }
    n = len(docs)
    dls = {d: len(t.split(" ")) for d, t in docs.items()}
    avgdl = sum(dls.values()) / n

    def idf(term):
        df = sum(1 for t in docs.values() if term in t.split(" "))
        x = (n - df + 0.5) / (df + 0.5) + 1.0
        # Spark round(_, 6): HALF_UP over the shortest decimal repr
        return float(Decimal(repr(math.log(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    expected = {}
    for qid, qtext in _QUERIES:
        scores = {}
        for d, t in docs.items():
            toks = t.split(" ")
            total = Decimal(0)
            for term in qtext.split(" "):
                tf = toks.count(term)
                if tf == 0:
                    continue
                ts = idf(term) * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dls[d] / avgdl))
                # decimal(18,6) cast: nearest decimal of the exact double
                total += Decimal(ts).quantize(Decimal("1e-6"), ROUND_HALF_UP)
            if total > 0:
                scores[d] = float(total)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:_TOPK]
        expected[qid] = ranked

    got = OPS["text_bm25_topk"].fn(spark, SF_SMALL).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rnk)):
        by_q.setdefault(r.query_id, []).append((r.doc_id, r.score))
    assert set(by_q) == set(expected)
    for qid in expected:
        assert [d for d, _ in by_q[qid]] == [d for d, _ in expected[qid]], qid
        for (d1, s1), (d2, s2) in zip(by_q[qid], expected[qid]):
            assert abs(s1 - s2) <= 1e-6, (qid, d1, s1, s2)


def test_epoch_shuffle_is_balanced_decorrelated_permutation(spark):
    rows = OPS["pipeline_epoch_shuffle"].fn(spark, SF_SMALL).collect()
    n_docs = table(spark, SF_SMALL, "documents").count()
    for epoch in (0, 1):
        per = [r for r in rows if r.epoch == epoch]
        assert sum(r.n_docs for r in per) == n_docs  # a permutation, nothing lost
        sizes = [r.n_docs for r in per]
        assert max(sizes) - min(sizes) <= 1  # round-robin stripe balance
    e1 = [r for r in rows if r.epoch == 1]
    same = sum(r.n_same_as_epoch0 for r in e1)
    # a same-seed-every-epoch bug gives same == n_docs; true reshuffle
    # concentrates near n_docs/16
    assert same < n_docs * 0.5
    e0 = [r for r in rows if r.epoch == 0]
    assert all(r.n_same_as_epoch0 == r.n_docs for r in e0)


def test_curriculum_stages_partition_and_order(spark):
    rows = sorted(
        OPS["pipeline_curriculum_order"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r.stage,
    )
    n_docs = table(spark, SF_SMALL, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert max(r.n_docs for r in rows) - min(r.n_docs for r in rows) <= 1
    for lo, hi in zip(rows, rows[1:]):
        # easy->hard: ntile over (n_chars, doc_id) guarantees the next
        # stage never starts below the prior stage's ceiling (ties can
        # split across the boundary, hence >= not >)
        assert hi.min_chars >= lo.max_chars


def test_basket_pairs_canonical_and_bounded(spark):
    rows = OPS["basket_pair_lift"].fn(spark, SF_SMALL).collect()
    assert rows, "sf0.001 should still produce frequent pairs"
    for r in rows:
        assert r.part_a < r.part_b  # canonical orientation, no dupes
        assert r.n_both <= min(r.n_a, r.n_b)  # co-occurrence bound
        assert r.lift > 0
