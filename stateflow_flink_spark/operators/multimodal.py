"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` payloads plus typed metadata — the lakehouse
pattern for 100 TB multimodal training data: parquet stores the bytes
(or an object-store pointer), Spark moves them in Arrow batches, and the
decode/transform stages are `mapInPandas` operators so each partition
streams record batches through Python exactly once.

The container has no image/audio codecs, so the codec call itself is
STUBBED: `decode_media` raises ``NotImplementedError`` unless a library
is importable, and the default pipeline uses a clearly-marked
deterministic fake decoder.  Everything around the stub — the binary
column handling, Arrow batch shapes, schemas, partitioning, the
byte-histogram featurizer and the frame sampler — is real and tested.

The fixture tables carry no media bytes, so payloads derive
deterministically from ``documents.text`` (utf-8 bytes) — same tables,
same rows, reproducible in the DuckDB oracle via ``ENCODE(text)``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..plans.registry import query

N_HIST_BINS = 16
FRAME_BYTES = 64  # fake "frame" = 64-byte payload slice
FRAME_STRIDE = 4  # keep every 4th frame


def with_payload(d: DataFrame) -> DataFrame:
    """Attach the opaque media column + typed metadata to documents.

    media_type cycles deterministically; at scale this frame is what a
    parquet scan of a real media table yields: (id, type, bytes, meta).
    """
    return d.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("n_chars").alias("n_bytes_expected"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, media_type: str):
    """Decode one payload with a real codec — STUB.

    In production this dispatches to PIL / soundfile / pyav.  None of
    those exist in this container, so the real branch raises and the
    pipeline uses `_fake_decode` (deterministic, content-derived) which
    keeps every downstream schema and batch shape honest.
    """
    try:
        import PIL.Image  # noqa: F401  (absent here by design)
    except ImportError as exc:
        raise NotImplementedError(
            "no media codecs in this environment — use _fake_decode"
        ) from exc
    raise NotImplementedError("real codec dispatch not implemented")


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decode: content-addressed pseudo-dimensions."""
    h = hashlib.md5(payload).digest()
    return {"height": 1 + h[0] % 128, "width": 1 + h[1] % 128, "channels": 3}


@query(
    "q_mm_metadata",
    """
    SELECT media_type,
           COUNT(*) AS n_assets,
           CAST(SUM(OCTET_LENGTH(payload)) AS BIGINT) AS total_bytes,
           CAST(MAX(OCTET_LENGTH(payload)) AS BIGINT) AS max_bytes
    FROM (
        SELECT ['image', 'audio', 'video'][(doc_id % 3) + 1] AS media_type,
               ENCODE(text) AS payload
        FROM documents
    )
    GROUP BY media_type
    """,
)
def q_mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset inventory by media type — pure JVM over the binary column."""
    m = with_payload(load(spark, sf_dir, "documents"))
    return m.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.octet_length("payload")).cast("long").alias("total_bytes"),
        F.max(F.octet_length("payload")).cast("long").alias("max_bytes"),
    )


def _byte_histogram_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-asset 16-bin byte-value histogram, L1-normalized float32[16].

    The featurizer shape for media: binary in, fixed-dim vector out,
    vectorized NumPy per Arrow batch.  Swap the histogram for a real
    embedding model without touching the plumbing."""
    for pdf in batches:
        feats = []
        for buf in pdf["payload"]:
            arr = np.frombuffer(bytes(buf), dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=N_HIST_BINS).astype(np.float64)
            feats.append((hist / max(hist.sum(), 1.0)).astype(np.float32))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})


@query(
    "q_mm_features",
    f"""
    SELECT doc_id, CAST(b AS INT) AS bin,
           CAST(CAST(LEN(LIST_FILTER(codes, x -> x // 16 = b)) AS DOUBLE)
                / LEN(codes) AS FLOAT) AS weight
    FROM (
        SELECT doc_id,
               LIST_TRANSFORM(GENERATE_SERIES(1, LENGTH(text)),
                              i -> ORD(text[i])) AS codes
        FROM documents
    ), GENERATE_SERIES(0, {N_HIST_BINS - 1}) AS bins(b)
    """,
)
def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary → fixed-dim feature vector via mapInPandas (Arrow batches),
    emitted as scalar (doc_id, bin, weight) rows — the long form both
    engines and the driver's hasher agree on.  The vector form is the
    mapInPandas output; `posexplode` unrolls it JVM-side.

    Oracle note: the fixture text is pure ASCII (asserted in tests), so
    per-character ORD codes in DuckDB equal the utf-8 payload bytes."""
    m = with_payload(load(spark, sf_dir, "documents")).select("doc_id", "payload")
    feat = m.mapInPandas(
        _byte_histogram_batches, "doc_id long, feature array<float>"
    )
    return feat.select("doc_id", F.posexplode("feature").alias("bin", "weight"))


@query(
    "q_mm_frame_sample",
    f"""
    SELECT doc_id, frame_idx,
           CAST(LENGTH(SUBSTRING(text, frame_idx * {FRAME_BYTES} + 1,
                                 {FRAME_BYTES})) AS BIGINT) AS frame_bytes,
           MD5(SUBSTRING(text, frame_idx * {FRAME_BYTES} + 1,
                         {FRAME_BYTES})) AS frame_md5
    FROM (
        SELECT doc_id, text,
               UNNEST(GENERATE_SERIES(0,
                   CAST(CEIL(LENGTH(text) * 1.0 / {FRAME_BYTES})
                        AS BIGINT) - 1)) AS frame_idx
        FROM documents
        WHERE doc_id % 3 = 2  -- 'video' assets
    )
    WHERE frame_idx % {FRAME_STRIDE} = 0
    """,
)
def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for 'video' payloads: slice the binary into
    FRAME_BYTES frames, keep every FRAME_STRIDE-th.  Pure JVM: sequence
    + explode for the frame index, substring on binary for the slice —
    the decode-free part of a real frame pipeline (the codec call is the
    `decode_media` stub)."""
    m = with_payload(load(spark, sf_dir, "documents")).filter(
        F.col("media_type") == "video"
    )
    n_frames = F.ceil(F.octet_length("payload") / F.lit(FRAME_BYTES)).cast("long")
    frames = m.select(
        "doc_id",
        "payload",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).filter(F.col("frame_idx") % FRAME_STRIDE == 0)
    frame = F.expr(f"substring(payload, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})")
    return frames.select(
        "doc_id",
        "frame_idx",
        F.octet_length(frame).cast("long").alias("frame_bytes"),
        F.md5(frame).alias("frame_md5"),
    )


@query(
    "q_mm_decode",
    """
    SELECT doc_id,
           CAST(1 + ((16 * (STRPOS('0123456789abcdef', h[1]) - 1)
                      + (STRPOS('0123456789abcdef', h[2]) - 1)) % 128) AS INT) AS height,
           CAST(1 + ((16 * (STRPOS('0123456789abcdef', h[3]) - 1)
                      + (STRPOS('0123456789abcdef', h[4]) - 1)) % 128) AS INT) AS width,
           CAST(3 AS INT) AS channels
    FROM (SELECT doc_id, MD5(text) AS h FROM documents WHERE doc_id % 3 = 0)
    """,
)
def q_mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode stage with the stubbed codec: emits the deterministic fake
    decoder's dimensions per image asset.  Batch plumbing (mapInPandas,
    binary in / struct-ish row out) is exactly what a PIL-backed decode
    would use."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_decode(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "height": [d["height"] for d in dims],
                    "width": [d["width"] for d in dims],
                    "channels": [d["channels"] for d in dims],
                }
            )

    m = with_payload(load(spark, sf_dir, "documents")).filter(
        F.col("media_type") == "image"
    )
    return m.select("doc_id", "payload").mapInPandas(
        decode, "doc_id long, height int, width int, channels int"
    )


RESIZE_OUT = 1024  # target "pixel" count of the resize stage


@query(
    "q_mm_resize",
    f"""
    SELECT doc_id, n_in,
           CAST({RESIZE_OUT} AS BIGINT) AS n_out,
           MD5(STRING_AGG(SUBSTRING(text, CAST((i * n_in) // {RESIZE_OUT} AS INT) + 1, 1),
                          '' ORDER BY i)) AS out_md5
    FROM (SELECT doc_id, text, LENGTH(text) AS n_in FROM documents
          WHERE doc_id % 3 = 0),
         UNNEST(GENERATE_SERIES(0, {RESIZE_OUT - 1})) AS u(i)
    GROUP BY doc_id, n_in
    """,
)
def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage for 'image' payloads: nearest-neighbor resample of
    each payload's byte grid to a fixed RESIZE_OUT length (both down-
    and up-sampling, like letterboxing a training batch to one shape).

    The kernel is the real thing — an Arrow-batched numpy gather
    (frombuffer -> precomputed index map -> tobytes) per record batch,
    the exact shape a PIL/cv2-backed resize runs in production; only
    the pixel decode behind it is the container-stubbed `decode_media`.
    Fixture payloads are ASCII text bytes, so the DuckDB oracle rebuilds
    the same gather character-by-character and the md5 of the resized
    bytes is hash-exact."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = np.arange(RESIZE_OUT, dtype=np.int64)
        for pdf in batches:
            outs, sizes = [], []
            for b in pdf["payload"]:
                data = np.frombuffer(bytes(b), dtype=np.uint8)
                n = len(data)
                sizes.append(n)
                outs.append(
                    hashlib.md5(data[(base * n) // RESIZE_OUT].tobytes()).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_in": pd.Series(sizes, dtype="int64"),
                    "n_out": pd.Series([RESIZE_OUT] * len(pdf), dtype="int64"),
                    "out_md5": outs,
                }
            )

    m = with_payload(load(spark, sf_dir, "documents")).filter(
        F.col("media_type") == "image"
    )
    return m.select("doc_id", "payload").mapInPandas(
        resize, "doc_id long, n_in long, n_out long, out_md5 string"
    )
