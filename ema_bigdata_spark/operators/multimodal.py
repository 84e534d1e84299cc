"""LLM-pipeline multimodal columns (driver mandate, SURVEY.md §2.4).

Pattern for 100 TB media pipelines: media payloads travel as opaque
``binary`` columns next to typed metadata; decode / feature-extract
runs as Arrow-batched pandas iterators (``mapInPandas``) so each task
processes whole record batches without per-row Python overhead, and
repartitioning controls decode parallelism independently of file
layout.

The container has no image/audio codecs, so the decode step is a
clearly marked stub (``decode_media`` raises NotImplementedError); the
Spark-side plumbing — schema, binary handling, batch iteration,
deterministic feature extraction — is real and tested via
``q_mm_features``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F

from ema_bigdata_spark.registry import query
from ema_bigdata_spark.sources.tables import load_table

_FEATURE_SCHEMA = (
    "doc_id BIGINT, byte_len BIGINT, first_byte BIGINT, byte_checksum BIGINT"
)
_CHECKSUM_MOD = 1_000_003


def decode_media(payload: bytes, media_type: str):
    """Decode an image/audio/video payload into a feature tensor.

    STUB: media codecs (PIL/libav/...) are not available in this
    environment.  Production implementations decode ``payload`` and
    return (H, W, C) pixel arrays / PCM frames; everything downstream
    (schema, batching, partitioning) is unchanged.
    """
    raise NotImplementedError(
        f"no codec for {media_type!r} in this environment — "
        "q_mm_features uses deterministic byte-level features instead"
    )


@query(
    "q_mm_features",
    # full-value oracle: the stand-in "decode" is pure byte math, which
    # DuckDB replicates from the hex dump of the same utf-8 payload
    # (one ('0x'||hex-pair)::BIGINT per byte; empty payloads sum to a
    # NULL list_aggregate → coalesce 0, matching Python's sum(b'')).
    oracle=f"""
    WITH d AS (
      SELECT doc_id, encode(text) AS b, octet_length(encode(text)) AS bl
      FROM documents
    )
    SELECT doc_id,
           CAST(bl AS BIGINT) AS byte_len,
           CAST(CASE WHEN bl = 0 THEN -1
                ELSE ('0x' || substr(hex(b), 1, 2))::BIGINT
                END AS BIGINT) AS first_byte,
           CAST(coalesce(list_aggregate(
                  list_transform(generate_series(1, bl),
                    i -> ('0x' || substr(hex(b), 2 * i - 1, 2))::BIGINT),
                  'sum'), 0) % {_CHECKSUM_MOD} AS BIGINT) AS byte_checksum
    FROM d
    """,
)
def q_mm_features(spark, sf_dir):
    """Binary-column plumbing end-to-end: utf-8 payload bytes stand in
    for media blobs; mapInPandas extracts features batch-wise.

    The batch function is a *closure* (pickled by value) so executors
    never need this package importable — the driver process may be the
    only place the repo is on sys.path.
    """
    checksum_mod = _CHECKSUM_MOD

    def byte_features(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        # deterministic stand-in for media decode: byte stats per batch
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ),
                    "byte_checksum": payloads.map(
                        lambda b: sum(b) % checksum_mod
                    ),
                }
            )

    # measured: NOT spread() — Arrow worker startup outweighs the
    # parallelism below ~10k rows; at scale the scan splits anyway and
    # decode parallelism is tuned with repartition(n) by the caller
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    out = docs.mapInPandas(byte_features, schema=_FEATURE_SCHEMA)
    return out.orderBy("doc_id")


# -- q_multimodal_join: typed metadata ⋈ vectors (SQL-oracled) ------------


@query(
    "q_multimodal_join",
    oracle="""
    SELECT d.doc_id, d.lang, d.n_chars,
           CAST(length(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           CAST(e.label AS BIGINT) AS label,
           round(sqrt(list_aggregate(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 6)
             AS l2_norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def q_multimodal_join(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    dot_self = (
        "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) *"
        " CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(F.split("text", " ", -1)).cast("long").alias("n_tokens"),
        F.col("label").cast("long").alias("label"),
        F.round(F.sqrt(F.expr(dot_self)), 6).alias("l2_norm"),
    )


# -- q_mm_frames: frame sampling / resize plumbing (SQL-oracled) ----------

_FRAME_SCHEMA = (
    "doc_id BIGINT, frame_idx BIGINT, frame_bytes BIGINT,"
    " thumb_checksum BIGINT"
)
_FRAME_SIZE = 64          # bytes per fake "frame"
_FRAME_STRIDE = 4         # sample every 4th frame
_THUMB_FACTOR = 8         # fake resize: keep every 8th byte


def sample_frames(payload: bytes, media_type: str):
    """Sample frames from a video/audio payload and resize each.

    STUB: real decoders (libav/ffmpeg) are absent here.  Production
    implementations yield (frame_idx, np.ndarray) pairs; the fake below
    slices fixed-size byte windows so the *Spark* contract — one input
    row fanning out to many frame rows through an Arrow batch — is real
    and tested.
    """
    raise NotImplementedError(
        f"no codec for {media_type!r} — q_mm_frames uses deterministic "
        "byte windows instead"
    )


@query(
    "q_mm_frames",
    # full-value oracle for the 1→N fan-out: every sampled frame is a
    # fixed 64-byte window (full windows only ⇒ frame_bytes ≡ 64), its
    # "thumbnail" the 8 bytes at stride-8 offsets, checksummed from the
    # payload's hex dump exactly like q_mm_features.
    oracle=f"""
    WITH d AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) // {_FRAME_SIZE} AS n_frames
      FROM documents
    ),
    f AS (
      SELECT doc_id, hx,
             unnest(generate_series(0, n_frames - 1, {_FRAME_STRIDE}))
               AS frame_idx
      FROM d WHERE n_frames >= 1
    )
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST({_FRAME_SIZE} AS BIGINT) AS frame_bytes,
           CAST(list_aggregate(
                  list_transform(
                    generate_series(0, {_FRAME_SIZE // _THUMB_FACTOR - 1}),
                    j -> ('0x' || substr(hx,
                           (frame_idx * {_FRAME_SIZE}
                            + j * {_THUMB_FACTOR}) * 2 + 1, 2))::BIGINT),
                  'sum') % {_CHECKSUM_MOD} AS BIGINT) AS thumb_checksum
    FROM f
    """,
)
def q_mm_frames(spark, sf_dir):
    """Frame-sampling shape end-to-end: each document payload expands
    to every ``_FRAME_STRIDE``-th fixed-size byte window ("frame"),
    each reduced by keeping every ``_THUMB_FACTOR``-th byte ("resize").
    ``mapInPandas`` is the right tool because output cardinality per
    input row is data-dependent (built-in explode can't decode), and
    Arrow batches amortize the Python boundary."""
    frame_size, stride, thumb = _FRAME_SIZE, _FRAME_STRIDE, _THUMB_FACTOR
    checksum_mod = _CHECKSUM_MOD

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [],
                   "thumb_checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) // frame_size
                for idx in range(0, n_frames, stride):
                    frame = payload[idx * frame_size:(idx + 1) * frame_size]
                    thumbnail = frame[::thumb]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(len(frame))
                    out["thumb_checksum"].append(
                        sum(thumbnail) % checksum_mod
                    )
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return docs.mapInPandas(frames, schema=_FRAME_SCHEMA).orderBy(
        "doc_id", "frame_idx"
    )
