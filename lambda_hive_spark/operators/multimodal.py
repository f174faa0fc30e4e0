"""Multimodal binary-column pipeline (task brief: first-class at
100 TB alongside SURVEY.md §2.10).

Model: media (image/audio/video) rides as an opaque `binary` payload
column with typed metadata; all per-item compute (decode, feature
extraction, resize, frame sampling) runs as Arrow-batched pandas
iterators over `mapInPandas` — executor-side, one Arrow batch at a
time, never a driver collect. The fixtures carry no real media, so the
payload is the document's UTF-8 bytes and the *codec* step is stubbed
(`decode_media` below raises NotImplementedError until a real codec
lib is present) — but everything Spark-side is real and oracle-checked:
schema, binary Arrow transfer, batch iteration, partitioning.

At 100 TB: payloads dominate row size → keep
`spark.sql.files.maxPartitionBytes` at default 128 MB so scan tasks
stay memory-bounded, and select metadata columns FIRST (column pruning
skips payload bytes entirely for metadata-only queries — parquet
stores the binary column separately).

Reference file:line: N/A — empty reference dir (SURVEY.md §0).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_hive_spark.io import table
from lambda_hive_spark.registry import op

THUMB = 8  # fake-resize target (long edge)


def decode_media(payload: bytes, modality: str):
    """The real codec boundary. Image/audio libs are not in this
    container (task brief) — the Spark plumbing around this stub is
    real; swap in PIL/librosa/pyav here when available."""
    try:
        import PIL.Image  # noqa: F401  (not installed here)
    except ImportError as exc:
        raise NotImplementedError(
            f"no codec available for modality={modality!r}; "
            "install PIL/librosa/pyav or use the deterministic fake path"
        ) from exc


def fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: 'dimensions' derived from the first
    two payload bytes — stands in for a real header parse. Payloads
    shorter than 2 bytes read as zero bytes, mirroring the oracle's
    ascii(substr(text, i, 1)) = 0 on out-of-range positions."""
    padded = (payload + b"\x00\x00")[:2]
    return padded[0] % 64 + 1, padded[1] % 64 + 1


def payload_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary, modality, n_bytes): the
    canonical multimodal ingest projection."""
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text").alias("modality"),
        F.length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
    )


@op(
    "mm_ingest",
    oracle="""
SELECT doc_id, 'text' AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS content_hash
FROM documents
""",
)
def mm_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary ingest: opaque payload + typed metadata + content hash
    (the dedup/lineage key for media at scale). All JVM built-ins."""
    p = payload_df(spark, sf_dir)
    return p.select(
        "doc_id", "modality", "n_bytes", F.lower(F.sha2("payload", 256)).alias("content_hash")
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # na_action='ignore' + nullable Int64: a NULL payload (missing
    # media) propagates NULL features, matching the oracle's
    # NULL-propagating length()/ascii() — instead of crashing the
    # Python worker on None.
    for pdf in batches:
        pay = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pay.map(len, na_action="ignore").astype("Int64"),
                "n_space_bytes": pay.map(
                    lambda b: b.count(b" "), na_action="ignore"
                ).astype("Int64"),
                # empty payload → 0, mirroring DuckDB ascii('') = 0
                "first_byte": pay.map(
                    lambda b: b[0] if len(b) else 0, na_action="ignore"
                ).astype("Int64"),
                "last_byte": pay.map(
                    lambda b: b[-1] if len(b) else 0, na_action="ignore"
                ).astype("Int64"),
            }
        )


@op(
    "mm_feature_extract",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)
         AS n_space_bytes,
       CASE WHEN octet_length(encode(text)) = 0 THEN 0
            ELSE ('0x' || substring(hex(encode(text)), 1, 2))::BIGINT
       END AS first_byte,
       CASE WHEN octet_length(encode(text)) = 0 THEN 0
            ELSE ('0x' || substring(hex(encode(text)),
                                    octet_length(encode(text)) * 2 - 1, 2))::BIGINT
       END AS last_byte
FROM documents
""",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item feature extraction over raw payload bytes via
    Arrow-batched mapInPandas (the shape a real pixel/sample featurizer
    takes). Oracle mirrors the byte math exactly on ANY corpus —
    multibyte included — by addressing bytes through hex(encode(text))
    (2 hex chars per byte; DuckDB 1.0 cannot slice BLOBs directly).
    Space counting stays char-based because 0x20 never occurs inside a
    UTF-8 multibyte sequence."""
    return payload_df(spark, sf_dir).mapInPandas(
        _feature_batches,
        "doc_id long, n_bytes long, n_space_bytes long, first_byte long, last_byte long",
    )


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    rows: dict[str, list] = {"doc_id": [], "width": [], "height": [], "thumb_w": [], "thumb_h": []}
    for pdf in batches:
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:
                # missing media → no thumbnail row (the oracle filters
                # NULL text out; Spark's greatest/NULL and DuckDB's
                # greatest/NULL disagree, so a NULL-dims row cannot be
                # pinned consistently — absence can)
                continue
            w, h = fake_dims(payload)
            long_edge = max(w, h)
            rows["doc_id"].append(doc_id)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["thumb_w"].append(max(1, w * THUMB // long_edge))
            rows["thumb_h"].append(max(1, h * THUMB // long_edge))
    yield pd.DataFrame(rows)


@op(
    "mm_resize_stub",
    oracle=f"""
WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS h FROM documents WHERE text IS NOT NULL
),
dims AS (
  SELECT doc_id,
         COALESCE(TRY_CAST('0x' || substring(h, 1, 2) AS BIGINT), 0) % 64 + 1 AS w,
         COALESCE(TRY_CAST('0x' || substring(h, 3, 2) AS BIGINT), 0) % 64 + 1 AS hh
  FROM hx
)
SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(hh AS BIGINT) AS height,
       CAST(greatest(1, w * {THUMB} // greatest(w, hh)) AS BIGINT) AS thumb_w,
       CAST(greatest(1, hh * {THUMB} // greatest(w, hh)) AS BIGINT) AS thumb_h
FROM dims
""",
)
def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode→resize with the codec stubbed by a deterministic header
    parse (`fake_dims`): aspect-preserving integer thumbnail math in
    mapInPandas. The real decoder slots into `decode_media` without
    touching the Spark plumbing. The oracle reads header BYTES through
    hex(encode(text)) so it stays exact on multibyte corpora; a short
    payload's missing byte 2 reads as 0 on both sides (TRY_CAST of the
    empty hex slice ↔ fake_dims' zero padding)."""
    return payload_df(spark, sf_dir).mapInPandas(
        _resize_batches, "doc_id long, width long, height long, thumb_w long, thumb_h long"
    )


FRAME_BYTES = 256
FRAME_STRIDE = 4  # keep every 4th frame


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_n_bytes": [], "frame_sha": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:
                # missing media → no frames, mirroring the oracle's
                # lateral UNNEST(range(NULL)) yielding zero rows
                continue
            n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
            for i in range(0, n_frames, FRAME_STRIDE):
                frame = payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame_n_bytes"].append(len(frame))
                # fingerprint the HEX rendering (not the raw bytes):
                # equal bytes ↔ equal hash still holds, and DuckDB 1.0
                # can reproduce it for frames that split a multibyte
                # char (sha256 there only accepts VARCHAR, and such a
                # frame is not valid UTF-8)
                out["frame_sha"].append(
                    hashlib.sha256(frame.hex().upper().encode()).hexdigest()
                )
        yield pd.DataFrame(out)


@op(
    "mm_frame_sample",
    oracle=f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS h,
         octet_length(encode(text)) AS nb
  FROM documents
)
SELECT doc_id, i AS frame_idx,
       least({FRAME_BYTES}, nb - i * {FRAME_BYTES}) AS frame_n_bytes,
       sha256(substring(h, i * {FRAME_BYTES} * 2 + 1, {FRAME_BYTES} * 2))
         AS frame_sha
FROM b,
     UNNEST(range(0, CAST(ceil(nb / {FRAME_BYTES}.0) AS BIGINT),
                  {FRAME_STRIDE})) AS t(i)
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: slice the payload into fixed
    256-byte frames, keep every 4th, fingerprint each — a 1→N
    mapInPandas expansion whose per-frame hashes the oracle reproduces
    byte-for-byte. Frame boundaries are BYTE offsets (addressed as
    2-hex-char pairs oracle-side) and the fingerprint is sha256 of the
    frame's hex rendering, so the manifest is exact even when a frame
    boundary splits a multibyte character."""
    return payload_df(spark, sf_dir).mapInPandas(
        _frame_batches, "doc_id long, frame_idx long, frame_n_bytes long, frame_sha string"
    )


def _checksum_batches(batches):
    """Arrow-native batch worker: hashlib.md5 over each payload's raw
    bytes, emitted as an int64 checksum column. Operates on
    pyarrow.RecordBatch directly — no pandas conversion layer at all."""
    import hashlib

    import pyarrow as pa

    for batch in batches:
        doc_ids = batch.column("doc_id")
        payloads = [p.as_py() for p in batch.column("payload")]
        # None payload → NULL checksum/length (oracle: md5(NULL) is
        # NULL), instead of crashing hashlib on a non-buffer.
        crcs = [
            None if p is None else int(hashlib.md5(p).hexdigest()[:8], 16)
            for p in payloads
        ]
        n_bytes = [None if p is None else len(p) for p in payloads]
        yield pa.RecordBatch.from_arrays(
            [doc_ids, pa.array(crcs, pa.int64()), pa.array(n_bytes, pa.int64())],
            names=["doc_id", "crc32ish", "n_bytes"],
        )


@op(
    "mm_arrow_checksum",
    oracle="""
SELECT doc_id,
       ('0x' || substr(md5(text), 1, 8))::BIGINT AS crc32ish,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
""",
)
def mm_arrow_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary checksumming through mapInArrow — the zero-copy Arrow
    path next to mapInPandas (mm_feature_extract): payload bytes reach
    Python as arrow buffers, the worker hashes them with hashlib, and
    only (id, checksum, size) rows come back. The checksum is the
    first 8 md5 hex chars as int64, so DuckDB reproduces it exactly
    from the same UTF-8 bytes — a Python-UDF-path op with a full SQL
    oracle.

    Scale: this is the template for every decode-heavy media job —
    opaque bytes in arrow batches, fixed-width metadata out, nothing
    wide ever shuffled. mapInArrow skips the pandas conversion
    entirely (no object-dtype materialization of the payload column),
    which is the right hot path when payloads are MBs."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("crc32ish", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )
    return payload_df(spark, sf_dir).select("doc_id", "payload").mapInArrow(
        _checksum_batches, schema
    )


@op(
    "mm_chunk_manifest",
    oracle="""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS h,
         octet_length(encode(text)) AS nb
  FROM documents WHERE doc_id % 4 = 0
),
chunks AS (
  SELECT doc_id, i AS chunk_idx,
         substring(h, 1 + CAST(i * 128 AS INT), 128) AS chunkhex
  FROM b, LATERAL (
    SELECT unnest(generate_series(0,
           CAST(ceil(nb / 64.0) AS BIGINT) - 1)) AS i
  ) g
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(length(chunkhex) // 2 AS BIGINT) AS chunk_bytes,
       sha256(chunkhex) AS chunk_hash
FROM chunks
""",
)
def mm_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressable chunk manifest over binary payloads: split
    each payload into fixed 64-byte blocks (JVM substring over
    BinaryType — no Python in the loop) and fingerprint every block —
    the manifest layout object stores and dedup-transfer protocols
    (CAS, rsync-style delta sync) build on. A re-uploaded media file
    then ships only blocks whose hash is unseen. The last block is
    short, not padded, and its true length is part of the manifest.

    Scale: chunk expansion is sequence+transform inside the scan
    projection (exchange-free, like doc_chunk_sliding); payload bytes
    never shuffle — only (doc_id, idx, 64-byte block) rows exist
    post-projection, and the manifest output is hashes + lengths.
    Oracle note: DuckDB's substring has no BLOB overload, so byte
    offsets are addressed through hex(encode(text)) (2 hex chars per
    byte) and the content address is sha256 of the hex rendering —
    equal bytes ↔ equal hash is preserved, and it stays exact when a
    block boundary splits a multibyte character (same convention as
    mm_frame_sample)."""
    p = payload_df(spark, sf_dir).filter(F.col("doc_id") % 4 == 0)
    n_chunks = F.ceil(F.col("n_bytes") / 64.0).cast("long")
    # Guard n_chunks = 0 (empty payload): sequence(0, -1) infers step -1
    # and yields [0, -1] — two bogus chunks — while the oracle's
    # generate_series(0, -1) is empty (ADVICE r4).
    chunk_structs = F.when(n_chunks <= 0, F.array().cast("array<struct<chunk_idx:bigint,chunk:binary>>")).otherwise(
        F.transform(
            F.sequence(F.lit(0).cast("long"), n_chunks - 1),
            lambda i: F.struct(
                i.alias("chunk_idx"),
                F.substring(F.col("payload"), (i * 64 + 1).cast("int"), 64).alias("chunk"),
            ),
        )
    )
    ex = p.select("doc_id", F.explode(chunk_structs).alias("c"))
    return ex.select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.length("c.chunk").cast("long").alias("chunk_bytes"),
        F.lower(F.sha2(F.hex(F.col("c.chunk")), 256)).alias("chunk_hash"),
    )


@op(
    "mm_block_dedup_savings",
    oracle="""
WITH src AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS nb
  FROM documents
),
chunks AS (
  SELECT doc_id, i AS chunk_idx,
         substring(hx, 1 + CAST(i * 128 AS INT), 128) AS chunkhex
  FROM src, LATERAL (
    SELECT unnest(generate_series(0,
           CAST(ceil(nb / 64.0) AS BIGINT) - 1)) AS i
  ) g
),
blocks AS (
  SELECT sha256(chunkhex) AS h, CAST(length(chunkhex) // 2 AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS refs
  FROM chunks GROUP BY sha256(chunkhex), length(chunkhex)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_unique_blocks,
       CAST(SUM(refs) AS BIGINT) AS n_total_refs,
       CAST(SUM(refs * b) AS BIGINT) AS logical_bytes,
       CAST(SUM(b) AS BIGINT) AS physical_bytes,
       CAST(SUM((refs - 1) * b) AS BIGINT) AS saved_bytes,
       CAST(SUM((refs - 1) * b) AS DOUBLE) / SUM(refs * b) AS dedup_ratio
FROM blocks
""",
)
def mm_block_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-level dedup savings estimate: content-address every
    64-byte payload block (mm_chunk_manifest's expansion over the
    WHOLE corpus), then one census of reference counts — logical vs
    physical bytes and the savings a CAS store would realize. THE
    sizing query before deploying block dedup on a media corpus.
    Shuffle payload is (hash, length) pairs; blocks never move after
    the in-scan expansion; output is one row of exact integers."""
    p = payload_df(spark, sf_dir)
    n_chunks = F.ceil(F.col("n_bytes") / 64.0).cast("long")
    # Same empty-payload sequence(0,-1) guard as mm_chunk_manifest.
    chunk_structs = F.when(n_chunks <= 0, F.array().cast("array<binary>")).otherwise(
        F.transform(
            F.sequence(F.lit(0).cast("long"), n_chunks - 1),
            lambda i: F.substring(F.col("payload"), (i * 64 + 1).cast("int"), 64),
        )
    )
    ex = p.select(F.explode(chunk_structs).alias("chunk"))
    blocks = ex.groupBy(
        # hex-rendered content address — see mm_chunk_manifest
        F.lower(F.sha2(F.hex("chunk"), 256)).alias("h"),
        F.length("chunk").cast("long").alias("b"),
    ).agg(F.count(F.lit(1)).alias("refs"))
    saved = F.sum((F.col("refs") - 1) * F.col("b"))
    logical = F.sum(F.col("refs") * F.col("b"))
    return blocks.agg(
        F.count(F.lit(1)).alias("n_unique_blocks"),
        F.sum("refs").cast("long").alias("n_total_refs"),
        logical.cast("long").alias("logical_bytes"),
        F.sum("b").cast("long").alias("physical_bytes"),
        saved.cast("long").alias("saved_bytes"),
        (saved.cast("double") / logical).alias("dedup_ratio"),
    )
