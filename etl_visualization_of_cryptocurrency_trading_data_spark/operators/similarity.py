"""Similarity search over an embedding column (``embeddings`` table:
vec_id, embedding array<float>, label).

- ``knn_brute``: exact cosine top-k of every probe vector against the
  corpus — the correctness baseline. The probe set is broadcast (it is
  small by construction); the corpus streams through a single map stage
  (no shuffle of the corpus), then top-k per probe is a window over
  |probes| * k candidate rows. Dot products are built-in higher-order
  functions (zip_with + aggregate) — JVM-side, no Python.

- ``knn_lsh``: random-hyperplane LSH variant — the 100 TB scale path.
  Signature = sign bits of projections onto H fixed hyperplanes; only
  same-bucket (probe, corpus) pairs are scored. Buckets shrink the
  candidate set ~2^H-fold at the cost of recall; hyperplanes are
  deterministic (seeded) so results are reproducible and
  oracle-checkable with the same literals embedded in SQL.

Determinism: ties broken by (cosine desc, vec_id asc) everywhere.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LSH_SEED = 42
# 2^4 = 16 buckets: sized so a bucket keeps enough candidates for top-k
# quality at fixture scale; at production corpus sizes raise this so
# bucket cardinality ~ a few thousand (candidates per probe stay flat).
LSH_PLANES = 4
DIM = 64


def hyperplanes(n_planes: int = LSH_PLANES, dim: int = DIM, seed: int = LSH_SEED) -> list[list[float]]:
    """Deterministic random hyperplanes (shared with the oracle SQL)."""
    rng = np.random.default_rng(seed)
    return [[round(float(v), 6) for v in row] for row in rng.normal(0.0, 1.0, (n_planes, dim))]


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_brute(
    embeddings: DataFrame,
    probe_filter: Column | None = None,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (probe_id, neighbor_id, cosine, rank).

    probe_filter defaults to ``vec_id % 50 == 0`` (a deterministic ~2%
    probe sample). Self-matches excluded.
    """
    if probe_filter is None:
        probe_filter = F.col("vec_id") % 50 == 0
    base = embeddings.select("vec_id", _as_double("embedding").alias("emb"))
    probes = base.filter(probe_filter).select(
        F.col("vec_id").alias("probe_id"), F.col("emb").alias("probe_emb")
    )
    scored = (
        base.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("probe_emb"), F.col("emb")).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def lsh_bucket(emb: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id of a vector under the hyperplane family."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        proj = _dot(emb, F.array(*[F.lit(v) for v in plane]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def knn_lsh(
    embeddings: DataFrame,
    probe_filter: Column | None = None,
    k: int = 5,
    n_planes: int = LSH_PLANES,
) -> DataFrame:
    """Approximate cosine top-k: candidates restricted to the probe's
    LSH bucket, then exact cosine + top-k within candidates. At scale
    the bucket column is a partition/cluster key, so a probe touches
    1/2^H of the corpus."""
    if probe_filter is None:
        probe_filter = F.col("vec_id") % 50 == 0
    planes = hyperplanes(n_planes)
    base = embeddings.select(
        "vec_id",
        _as_double("embedding").alias("emb"),
    ).withColumn("bucket", lsh_bucket(F.col("emb"), planes))
    probes = base.filter(probe_filter).select(
        F.col("vec_id").alias("probe_id"),
        F.col("emb").alias("probe_emb"),
        F.col("bucket").alias("probe_bucket"),
    )
    scored = (
        base.join(F.broadcast(probes), F.col("bucket") == F.col("probe_bucket"))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("probe_emb"), F.col("emb")).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )
