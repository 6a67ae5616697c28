"""Multimodal column handling: opaque binary payloads + typed metadata.

The reference's whole data model is "opaque bytes with a key and a
timestamp" (``/root/reference/src/wsclient.hpp:59``,
``src/kafka_producer.cpp:46-52``) — this module carries that model to the
batch side as the driver-mandated multimodal surface (SURVEY.md §2.3):
image/audio/video payloads as ``BinaryType`` columns with typed metadata,
processed by Arrow-batched ``mapInPandas`` pipelines.

The container has no image/audio codecs, so the DECODE step is stubbed
exactly as the brief prescribes: :func:`decode_image` raises
``NotImplementedError`` and :func:`decode_image_stub` is the deterministic
fake used by the pipeline + tests. Everything Spark-side — schema,
Arrow batch shape, partitioning, UDF signatures — is real.

Since the fixtures ship no binary tables, payloads are derived
deterministically from ``documents.text`` (utf-8 bytes), which also makes
the metadata query fully oracle-checkable in DuckDB (``encode``/``sha256``/
``octet_length`` agree across engines).

Scale notes: binary payloads are the widest column in any multimodal
table — every plan here projects metadata columns BEFORE any shuffle and
keeps payload bytes inside their original scan partition (`mapInPandas`
is narrow: no shuffle, no payload movement). Feature extraction emits
small fixed-width vectors, so downstream joins/aggs never touch bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables
from .registry import register

#: Arrow schema of the stub feature extractor's output.
_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, n_frames int, mean_byte double, format string"
)

_FRAME_BYTES = 64  # fake "frame" granularity for the sampler stub


def decode_image(payload: bytes):  # pragma: no cover - documented stub
    """Real image decode — requires a codec library this container lacks.

    A production deployment swaps this for PIL/libjpeg via the same
    ``mapInPandas`` pipeline; only this function changes.
    """
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use decode_image_stub (deterministic fake) instead"
    )


def decode_image_stub(payload: bytes) -> dict:
    """Deterministic fake decode: treats every _FRAME_BYTES slice as a
    'frame' and byte values as pixels. Pure function of the payload."""
    n = len(payload)
    return {
        "n_frames": n // _FRAME_BYTES,
        "mean_byte": (sum(payload) / n) if n else 0.0,
        "format": "fake/raw",
    }


def with_payload(docs: DataFrame) -> DataFrame:
    """documents → multimodal-shaped frame: (doc_id, payload binary, meta).

    The metadata struct is the typed sidecar a real ingest writes next to
    the blob (mime/size/checksum) so queries can plan on metadata alone.
    """
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            # long: DuckDB's octet_length is BIGINT — keep both sides aligned
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("digest"),
        ).alias("meta"),
    )


@register(
    "q_mm_meta",
    oracle="""
    SELECT doc_id,
           'text/plain'                 AS mime,
           octet_length(encode(text))   AS n_bytes,
           sha256(text)                 AS digest,
           (octet_length(encode(text)) >= 200) AS is_large
    FROM documents
    """,
)
def q_mm_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan over the multimodal frame: filters/projections on
    the typed sidecar never touch payload bytes (at 100 TB this is the
    difference between a metadata-column scan and reading every blob —
    parquet column pruning drops `payload` entirely; ReadSchema shows it).
    """
    docs = tables.load(spark, sf_dir, "documents")
    mm = with_payload(docs)
    return mm.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.digest").alias("digest"),
        (F.col("meta.n_bytes") >= 200).alias("is_large"),
    )


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: decode-stub each payload, emit fixed-width features.

    Receives Arrow record batches (pandas frames) of (doc_id, payload);
    payload bytes never leave this partition.
    """
    for pdf in batches:
        feats = pdf["payload"].map(decode_image_stub)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "n_frames": feats.map(lambda d: d["n_frames"]).astype("int32"),
                "mean_byte": feats.map(lambda d: round(d["mean_byte"], 4)),
                "format": feats.map(lambda d: d["format"]),
            }
        )


@register("q_mm_features", oracle=None)  # decode is stubbed -> rows-only check
def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``:
    the decode/resize/frame-sample pipeline shape, with the codec stubbed
    (unit tests pin the stub's arithmetic against a local recompute).

    Scale: narrow transformation — one Arrow pass per scan partition, no
    shuffle, features are ~40 bytes/row regardless of payload size.
    """
    docs = tables.load(spark, sf_dir, "documents")
    mm = with_payload(docs).select("doc_id", "payload")
    return mm.mapInPandas(_extract_features, schema=_FEATURE_SCHEMA)


@register(
    "q_mm_framesample",
    oracle=f"""
    WITH frames AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             unnest(range(0, octet_length(encode(text)) // {_FRAME_BYTES}))
                 AS frame_idx
      FROM documents
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(frame_idx * {_FRAME_BYTES} AS BIGINT) AS byte_offset
    FROM frames
    WHERE frame_idx % 4 = 0
    """,
)
def q_mm_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plan: explode payloads into per-frame rows (every
    4th frame — the video keyframe-sampling shape) WITHOUT decoding: the
    frame index comes from metadata arithmetic, so the oracle can check the
    sampling plan exactly even though real decoding is stubbed."""
    docs = tables.load(spark, sf_dir, "documents")
    mm = with_payload(docs)
    n_frames = F.floor(F.col("meta.n_bytes") / _FRAME_BYTES).cast("long")
    # Guard: sequence(0, -1) would produce a DESCENDING [0, -1]; payloads
    # shorter than one frame must yield zero rows (= the oracle's range(0,0)).
    frame_ids = F.when(
        n_frames >= 1, F.sequence(F.lit(0).cast("long"), n_frames - 1)
    ).otherwise(F.array().cast("array<long>"))
    return (
        mm.select("doc_id", F.explode(frame_ids).alias("frame_idx"))
        .filter(F.col("frame_idx") % 4 == 0)
        .select(
            "doc_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            (F.col("frame_idx") * _FRAME_BYTES).cast("long").alias("byte_offset"),
        )
    )


_RESIZE_FACTOR = 4
_RESIZE_SCHEMA = (
    "doc_id long, n_bytes_in long, n_bytes_out long, "
    "payload_out binary, mean_out double"
)


def resize_payload_stub(payload: bytes) -> bytes:
    """Deterministic fake resize: block-mean every _RESIZE_FACTOR bytes
    (the 1-D analogue of average-pooling an image down by 4x).  A real
    deployment swaps this for PIL's ``Image.resize`` inside the same
    ``mapInPandas`` pipeline — only this function changes, exactly like
    :func:`decode_image` / :func:`decode_image_stub`."""
    n = len(payload) - len(payload) % _RESIZE_FACTOR
    return bytes(
        sum(payload[i : i + _RESIZE_FACTOR]) // _RESIZE_FACTOR
        for i in range(0, n, _RESIZE_FACTOR)
    )


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = pdf["payload"].map(resize_payload_stub)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes_in": pdf["payload"].map(len).astype("int64"),
                "n_bytes_out": out.map(len).astype("int64"),
                "payload_out": out,
                "mean_out": out.map(
                    lambda x: round(sum(x) / len(x), 4) if len(x) else 0.0
                ),
            }
        )


@register("q_mm_resize", oracle=None)  # codec stubbed -> rows-only check
def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize over binary payloads via ``mapInPandas`` — the
    decode→resize→re-encode stage of an image pipeline, with the codec
    stubbed as a deterministic 4x block-mean (tests pin the arithmetic
    against a local recompute).

    Scale: narrow transformation like q_mm_features — payload bytes are
    read and REPLACED inside their scan partition, never shuffled; the
    output payload is factor-x smaller, so any downstream exchange moves
    a quarter of the input volume."""
    docs = tables.load(spark, sf_dir, "documents")
    mm = with_payload(docs).select("doc_id", "payload")
    return mm.mapInPandas(_resize_batches, schema=_RESIZE_SCHEMA)
