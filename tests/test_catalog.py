"""Catalog + multi-table transaction protocol tests (catalog.py).

The properties a catalog must actually deliver, each provoked
directly: atomic DDL (create/drop/rename are single pointer commits),
snapshot-consistent reads ACROSS tables, the all-or-nothing publish of
a multi-table transaction, first-committer-wins conflict on a racing
transaction, and the loud failure when a pin reaches past a table's
vacuum horizon.
"""

from __future__ import annotations

import threading

import pytest

from pyspark.sql import functions as F

from lambda_hive_spark import catalog as cat
from lambda_hive_spark import lakehouse as lh


def _mk_table(spark, tmp_path, name, n=20):
    path = str(tmp_path / name)
    df = spark.range(n).select(
        F.col("id").cast("long"), (F.col("id") * 10).alias("val")
    )
    lh.create(spark, path, df, key="id")
    return path


def test_ddl_roundtrip_and_rename_is_atomic(spark, tmp_path):
    root = str(tmp_path / "cat")
    c = cat.Catalog(root)
    p = _mk_table(spark, tmp_path, "t1")
    c.create_table("ledger", p)
    assert set(c.tables()) == {"ledger"}
    with pytest.raises(FileExistsError):
        c.create_table("ledger", p)
    v = c.rename_table("ledger", "journal")
    now, before = c.tables(), c.tables(version=v - 1)
    assert set(now) == {"journal"} and set(before) == {"ledger"}
    assert now["journal"] == before["ledger"]  # pointer moved, pin kept
    c.drop_table("journal")
    assert c.tables() == {}
    with pytest.raises(KeyError):
        c.drop_table("journal")


def test_catalog_read_pins_version_until_refresh(spark, tmp_path):
    """Ordinary lakehouse writes do NOT leak into catalog reads until
    a refresh/transaction publishes the pointer — the pin IS the
    isolation."""
    root = str(tmp_path / "cat")
    c = cat.Catalog(root)
    p = _mk_table(spark, tmp_path, "t1", n=10)
    c.create_table("t", p)
    lh.append(spark, p, spark.range(10, 15).select(
        F.col("id").cast("long"), (F.col("id") * 10).alias("val")))
    assert c.read(spark, "t").count() == 10  # pinned pre-append
    c.refresh("t")
    assert c.read(spark, "t").count() == 15


def test_transaction_publishes_all_or_nothing(spark, tmp_path):
    """Two tables move in ONE catalog commit: a reader at the prior
    catalog snapshot sees NEITHER write, at the new snapshot BOTH —
    there is no catalog version with exactly one."""
    root = str(tmp_path / "cat")
    c = cat.Catalog(root)
    pa = _mk_table(spark, tmp_path, "a", n=10)
    pb = _mk_table(spark, tmp_path, "b", n=10)
    c.create_table("ledger", pa)
    c.create_table("balances", pb)
    pre_v = cat.current_version(root)

    txn = c.transaction()
    delta = spark.range(100, 103).select(
        F.col("id").cast("long"), F.lit(-1).cast("long").alias("val"))
    lh.append(spark, txn.path("ledger"), delta)
    lh.append(spark, txn.path("balances"), delta)
    txn.stage("ledger")
    txn.stage("balances")
    post_v = txn.commit()

    assert post_v == pre_v + 1  # one catalog commit for both moves
    for v, expect in ((pre_v, 10), (post_v, 13)):
        na = c.read(spark, "ledger", catalog_version=v).count()
        nb = c.read(spark, "balances", catalog_version=v).count()
        assert (na, nb) == (expect, expect), "catalog version saw a torn transaction"


def test_transaction_conflict_first_committer_wins(spark, tmp_path):
    """Two transactions touching the same table: the second commit
    raises CatalogConflict and publishes NOTHING (its staged snapshot
    stays unreferenced); a disjoint-table transaction sails through."""
    root = str(tmp_path / "cat")
    c = cat.Catalog(root)
    pa = _mk_table(spark, tmp_path, "a", n=10)
    pb = _mk_table(spark, tmp_path, "b", n=10)
    pc = _mk_table(spark, tmp_path, "c", n=10)
    c.create_table("x", pa)
    c.create_table("y", pb)
    c.create_table("z", pc)

    t1, t2 = c.transaction(), c.transaction()
    row = spark.range(1).select(
        F.lit(999).cast("long").alias("id"), F.lit(0).cast("long").alias("val"))
    lh.append(spark, t1.path("x"), row)
    t1.stage("x")
    lh.append(spark, t2.path("x"), row.withColumn("id", F.lit(998).cast("long")))
    t2.stage("x")
    t1.commit()
    with pytest.raises(cat.CatalogConflict):
        t2.commit()
    assert c.read(spark, "x").count() == 11  # only t1's row published

    t3 = c.transaction()  # disjoint table: no conflict with history
    lh.append(spark, t3.path("z"), row)
    t3.stage("z")
    t3.commit()
    assert c.read(spark, "z").count() == 11


def test_concurrent_ddl_occ_loses_nothing(spark, tmp_path):
    """N threads each register a distinct name concurrently; the OCC
    loop serializes them — all N land, no version lost."""
    root = str(tmp_path / "cat")
    c = cat.Catalog(root)
    paths = [_mk_table(spark, tmp_path, f"t{i}") for i in range(4)]
    errs = []

    def reg(i):
        try:
            c.create_table(f"name{i}", paths[i])
        except Exception as ex:  # pragma: no cover
            errs.append(ex)

    threads = [threading.Thread(target=reg, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert set(c.tables()) == {f"name{i}" for i in range(4)}
    assert cat.current_version(root) == 4


def test_pin_past_vacuum_horizon_fails_loud(spark, tmp_path):
    """A catalog pin older than the table's vacuum horizon must raise
    on read (the manifest is gone) — never silently serve the head."""
    root = str(tmp_path / "cat")
    c = cat.Catalog(root)
    p = _mk_table(spark, tmp_path, "t1", n=10)
    c.create_table("t", p)
    lh.append(spark, p, spark.range(10, 12).select(
        F.col("id").cast("long"), (F.col("id") * 10).alias("val")))
    lh.compact(spark, p, num_files=1)
    lh.vacuum(p, keep_last=1)  # pin (v1) is now past the horizon
    with pytest.raises(FileNotFoundError):
        c.read(spark, "t").count()
    c.refresh("t")
    assert c.read(spark, "t").count() == 12


def test_fact_index_pair_never_torn_and_replay_publishes_nothing(spark, tmp_path):
    """The fact/index pair the catalog's docstring motivates (r9,
    VERDICT r8 item 5): per micro-batch, a fact append and its derived
    index append publish through ONE transaction, so no catalog
    snapshot counts more fact rows than index postings. A replayed
    (idempotent no-op) batch stages unchanged heads — dirty() is False
    and the catalog version must not move."""
    fact = _mk_table(spark, tmp_path, "fact", n=10)
    idx_path = str(tmp_path / "idx")
    lh.create(
        spark,
        idx_path,
        lh.read(spark, fact).select("id", (F.col("id") % 4).alias("cell")),
        key="id",
    )
    c = cat.Catalog(str(tmp_path / "cat"))
    c.create_table("fact", fact)
    c.create_table("idx", idx_path)

    def land(bid: int, lo: int, hi: int) -> None:
        rows = spark.range(lo, hi).select(
            F.col("id").cast("long"), (F.col("id") * 10).alias("val")
        )
        txn = c.transaction()
        lh.append_idempotent(spark, txn.path("fact"), rows, writer_id="w", batch_id=bid)
        lh.append_idempotent(
            spark,
            txn.path("idx"),
            rows.select("id", (F.col("id") % 4).alias("cell")),
            writer_id="w",
            batch_id=bid,
        )
        txn.stage("fact")
        txn.stage("idx")
        if txn.dirty():
            txn.commit()

    land(0, 10, 20)
    land(1, 20, 30)
    v = cat.current_version(str(tmp_path / "cat"))
    land(1, 20, 30)  # replay: both appends no-op, nothing publishes
    assert cat.current_version(str(tmp_path / "cat")) == v, "replay moved pointers"
    for cv in range(3, v + 1):  # both tables registered from v3 on... v2 registers idx
        n_fact = c.read(spark, "fact", catalog_version=cv).count()
        n_idx = c.read(spark, "idx", catalog_version=cv).count()
        assert n_fact == n_idx, f"catalog v{cv} torn: fact {n_fact} != idx {n_idx}"


def test_text_index_trio_consistent_at_every_catalog_snapshot(spark, tmp_path):
    """The lake_text_index_probe publication contract (r10): docs,
    postings, and stats commit per-table but publish through ONE
    catalog transaction — so at EVERY catalog version where the trio
    is registered, re-tokenizing the pinned docs snapshot must equal
    the pinned postings snapshot exactly, and the pinned stats row
    must equal the pinned docs' (count, sum_dl). A maintenance path
    that published per-table would fail this sweep at the torn
    intermediate snapshots."""
    root = str(tmp_path / "cat")
    c = cat.Catalog(root)

    def tokenize(docs):
        toks = F.split(F.col("text"), " ")
        return (
            docs.select("doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term"))
            .groupBy("term", "doc_id", "dl")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        )

    def stats_of(docs):
        return docs.agg(
            F.lit(0).cast("long").alias("stat_id"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("sum_dl"),
        )

    base = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], "doc_id long, text string"
    )
    paths = {n: str(tmp_path / n) for n in ("docs", "postings", "stats")}
    lh.create(spark, paths["docs"], base, key="doc_id")
    lh.create(spark, paths["postings"], tokenize(base), key="doc_id")
    lh.create(spark, paths["stats"], stats_of(base), key="stat_id")
    for n, p in paths.items():
        c.create_table(n, p)

    for batch in ([(3, "c d")], [(4, "d e d"), (5, "a")]):
        delta = spark.createDataFrame(batch, "doc_id long, text string")
        txn = c.transaction()
        lh.append(spark, txn.path("docs"), delta)
        lh.append(spark, txn.path("postings"), tokenize(delta))
        cur = lh.read(spark, txn.path("stats")).collect()[0]
        inc = stats_of(delta).collect()[0]
        lh.merge_upsert(
            spark,
            txn.path("stats"),
            spark.createDataFrame(
                [(0, cur["n_docs"] + inc["n_docs"], cur["sum_dl"] + inc["sum_dl"])],
                "stat_id long, n_docs long, sum_dl long",
            ),
        )
        for n in paths:
            txn.stage(n)
        txn.commit()

    head = cat.current_version(root)
    # trio fully registered from catalog v3 on; sweep every snapshot
    swept = 0
    for cv in range(3, head + 1):
        pins = c.tables(version=cv)
        docs = lh.read(spark, pins["docs"]["path"], version=pins["docs"]["version"])
        posts = lh.read(
            spark, pins["postings"]["path"], version=pins["postings"]["version"]
        )
        st = lh.read(
            spark, pins["stats"]["path"], version=pins["stats"]["version"]
        ).collect()[0]
        expect = tokenize(docs)
        drift = posts.exceptAll(expect).unionAll(expect.exceptAll(posts))
        assert drift.count() == 0, f"catalog v{cv}: postings torn from docs"
        n, dl = docs.count(), docs.select(
            F.sum(F.size(F.split(F.col("text"), " ")))
        ).collect()[0][0]
        assert (st["n_docs"], st["sum_dl"]) == (n, dl), f"catalog v{cv}: stats torn"
        swept += 1
    assert swept >= 3  # initial + two maintenance publishes
