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
