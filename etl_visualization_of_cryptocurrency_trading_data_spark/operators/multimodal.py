"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the *decode* step is a
deterministic stub (clearly marked); everything Spark-side — schema,
binary handling, partitioning, mapInPandas batch shape — is real and
tested. Swapping ``_fake_decode`` for a PIL/ffmpeg call is the only
change needed in production.

``media_table`` synthesizes a deterministic media corpus from the
``documents`` fixture (payload = utf-8 bytes of the text), which keeps
the binary path oracle-checkable: byte lengths and sha256 digests are
reproducible in DuckDB.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ("image", "audio", "video")
FEATURE_DIM = 8


def media_table(documents: DataFrame) -> DataFrame:
    """Deterministic media corpus: doc_id, media_type (round-robin),
    payload binary, and typed metadata columns derived from doc_id."""
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return documents.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        (64 + F.col("doc_id") % 448).cast("int").alias("width"),
        (64 + (F.col("doc_id") * 7) % 448).cast("int").alias("height"),
        ((F.col("doc_id") % 120) + 1).cast("double").alias("duration_s"),
    )


def media_metadata(documents: DataFrame) -> DataFrame:
    """Typed-metadata projection over the binary column: byte size +
    content digest — pure built-ins, no Python."""
    m = media_table(documents)
    return m.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha256"),
        "width",
        "height",
    )


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """STUB decode: deterministic pseudo-features from payload bytes.

    Real implementation would be e.g. PIL.Image.open(BytesIO(payload))
    + resize + channel stats; codecs are absent in this container.
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(dim)
    chunks = np.array_split(arr.astype(np.float64), dim)
    return np.array([c.mean() if c.size else 0.0 for c in chunks]) / 255.0


def resize_media(
    media: DataFrame, target_w: int = 224, target_h: int = 224, real_decode: bool = False
) -> DataFrame:
    """Resize step: metadata transform is real (new width/height,
    deterministic output byte size); the pixel resample itself is the
    stubbed part (payload re-hashed to the target size — swap for
    PIL ``Image.resize`` in production). Same mapInPandas batch shape."""
    if real_decode:
        raise NotImplementedError(
            "real resize requires image codecs not present in this container"
        )
    # Preserve every input column (duration_s etc.) so resize composes
    # with the other media stages; only payload/width/height change.
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in media.schema.fields
    )
    out_len = target_w * target_h // 64  # stub: deterministic byte budget

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                bytes((np.resize(np.frombuffer(p, dtype=np.uint8), out_len)))
                if len(p)
                else b"\x00" * out_len
                for p in pdf["payload"]
            ]
            pdf["width"] = np.full(len(pdf), target_w, dtype=np.int32)
            pdf["height"] = np.full(len(pdf), target_h, dtype=np.int32)
            yield pdf

    return media.mapInPandas(resize, schema)


def frame_schedule(media: DataFrame, every_s: float = 10.0) -> DataFrame:
    """Frame-sampling schedule for video rows: one output row per
    sampled frame timestamp. This part is PURE declarative Spark —
    ``explode(sequence(...))`` over the duration metadata — so the
    fan-out (the scale-relevant piece: row counts, partitioning) is
    engine-side and oracle-checkable; only pixel extraction is stubbed
    (``extract_frames``)."""
    # Frames at every_s*idx for idx in [0, ceil(duration/every)) — the
    # last frame timestamp stays strictly below duration_s (a frame AT
    # the duration does not exist; decoders reject it).
    n_frames = F.ceil(F.col("duration_s") / F.lit(float(every_s))).cast("int")
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "doc_id",
            "duration_s",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            (F.col("frame_idx") * float(every_s)).alias("frame_ts"),
        )
    )


def extract_frames(
    media: DataFrame, every_s: float = 10.0, real_decode: bool = False
) -> DataFrame:
    """Frame extraction: schedule (real) joined back to payloads, frame
    bytes produced by the stubbed decoder per (payload, frame_ts)."""
    if real_decode:
        raise NotImplementedError(
            "real frame extraction requires video codecs not present in "
            "this container; wire ffmpeg/PyAV here"
        )
    sched = frame_schedule(media, every_s)
    joined = sched.join(media.select("doc_id", "payload"), "doc_id")
    schema = "doc_id long, frame_idx int, frame_ts double, frame_features array<double>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                list(_fake_decode(p[int(i) % max(len(p), 1):] or p))
                for p, i in zip(pdf["payload"], pdf["frame_idx"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_ts": pdf["frame_ts"],
                    "frame_features": feats,
                }
            )

    return joined.mapInPandas(extract, schema)


def decode_features_flat(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Driver/oracle-facing projection of :func:`decode_features`: the
    feature vector as per-dimension double columns ``f0..f{DIM-1}``
    instead of one ``array<double>`` column.

    The stub decode is exact integer arithmetic (chunk means of uint8
    payload bytes), so every fj is bit-reproducible in DuckDB SQL and
    the flat shape hashes cleanly under the driver's canonicalization
    (an array column does not). Internal pipelines that want the vector
    (e.g. to feed similarity search) keep using ``decode_features``.
    """
    feats = decode_features(media, real_decode)
    return feats.select(
        "doc_id",
        "media_type",
        *[F.element_at("features", i + 1).alias(f"f{i}") for i in range(FEATURE_DIM)],
    )


def extract_frames_flat(
    media: DataFrame, every_s: float = 10.0, real_decode: bool = False
) -> DataFrame:
    """Flat twin of :func:`extract_frames` (see
    :func:`decode_features_flat` for why): per-dimension frame-feature
    columns ``f0..f{DIM-1}``."""
    fr = extract_frames(media, every_s, real_decode)
    return fr.select(
        "doc_id",
        "frame_idx",
        "frame_ts",
        *[
            F.element_at("frame_features", i + 1).alias(f"f{i}")
            for i in range(FEATURE_DIM)
        ],
    )


def decode_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas — the
    production batch shape (Arrow record batches of binary columns in,
    fixed-dim float features out). Pure map: no shuffle, scales
    linearly; partition sizing is inherited from the scan."""
    if real_decode:
        raise NotImplementedError(
            "real media decode requires image/audio codecs not present in "
            "this container; wire PIL/torchaudio/ffmpeg here"
        )
    schema = "doc_id long, media_type string, features array<double>"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "features": [list(_fake_decode(p)) for p in pdf["payload"]],
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(decode, schema)
