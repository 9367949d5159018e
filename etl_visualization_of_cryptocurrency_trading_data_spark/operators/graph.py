"""Graph analytics over derived entity graphs: co-occurrence edge
extraction + PageRank. Second iterative-algorithm family beside the
connected-components survivorship in [[dedup]] — PageRank's
join-aggregate round is the canonical "iterative dataflow on Spark"
shape (no driver-side loops over collect(); each round is one keyed
join + one aggregation, the composition stays a lazy linear chain for
small fixed iteration counts exactly like [[kmeans_centroids]]).

Scale notes:

- ``cooccurrence_edges``: the per-bucket pair join is quadratic in the
  DENSEST bucket's entity count — the same df-cap problem as n-gram
  postings, so ``max_per_bucket`` (deterministic top-N by entity id)
  bounds it; the default keeps every fixture bucket intact while
  pinning the guard in the plan.
- ``pagerank``: per round, the contribution shuffle carries one row
  per edge (8-byte-ish keys) and the rank table one row per node;
  ranks are rounded to 1e-9 between rounds so engine summation order
  never drifts the fixpoint (same contract as kmeans). Dangling mass
  is NOT redistributed (isolated nodes hold (1-d)/N) — the simplified
  formulation, stated rather than hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(
    df: DataFrame,
    entity: str = "coin_id",
    ts: str = "timestamp",
    bucket: str = "hour",
    max_per_bucket: int | None = 2000,
) -> DataFrame:
    """Undirected co-occurrence edges: (src, dst, weight) where weight
    counts the time buckets in which BOTH entities were active and
    src < dst. Distinct (entity, bucket) first — tick volume inside a
    bucket never inflates the pair count."""
    eh = df.select(
        F.col(entity).alias("e"), F.date_trunc(bucket, F.col(ts)).alias("h")
    ).distinct()
    if max_per_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("h").orderBy("e")
        eh = (
            eh.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_per_bucket)
            .drop("_rn")
        )
    a, b = eh.alias("a"), eh.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.e") < F.col("b.e")))
        .groupBy(F.col("a.e").alias("src"), F.col("b.e").alias("dst"))
        .agg(F.count("*").alias("weight"))
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    scale_decimals: int = 9,
    persist_edges: bool = True,
) -> DataFrame:
    """Weighted PageRank over an undirected edge list after ``iters``
    rounds, computed in INTEGER FIXED-POINT on a 10^-scale_decimals
    grid: rank_int(v) = T + d_pct * sum_u (rank_int(u) * w(u,v) DIV
    wdeg(u)) DIV 100, with T = floor((100-d_pct)/100/N * 10^s + 0.5).
    ``nodes`` is one row per node id in a column named ``id`` (isolated
    nodes keep the teleport mass). Returns (id, rank, wdeg) with rank
    = rank_int / 10^s.

    WHY integer: a float formulation needs per-round rounding to stay
    cross-engine deterministic, and rounding is exactly where engines
    diverge — measured on this operator: summation-order drift put one
    node's round-2 value on opposite sides of the 1e-9 boundary in
    Spark vs DuckDB (with round() AND with the floor(x*s+0.5) form),
    and a single flip cascades through every later round. Integer
    multiply / integer DIV / integer sum have no rounding mode and no
    summation-order sensitivity — every engine agrees bit-for-bit, so
    the fixpoint is exactly reproducible. Quantization loss (the DIV
    truncations) is part of the DEFINED algorithm, not engine noise;
    at the 1e-9 grid it is ~1e-9 per term against rank magnitudes of
    1/N. Dangling mass is NOT redistributed (the simplified
    formulation, stated rather than hidden).

    Scale shape: per round, the contribution shuffle carries one
    long per edge and the rank table one long per node; the
    composition stays a lazy linear chain for small fixed ``iters``
    exactly like [[kmeans_centroids]]. ``persist_edges`` pins the
    bidirectional edge list + degree table at the build-once/
    iterate-many boundary (neutral on a dense graph where the
    iteration joins dominate — A/B 25.8 vs 25.2 s at sf0.1 hourly —
    but it bounds re-evaluation of an expensive sparse edge build,
    so it stays on).
    """
    scale = 10 ** scale_decimals
    both = edges.select("src", "dst", "weight").unionByName(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    # ``both`` MUST stay persisted even though ``edged`` supersedes it:
    # the degree join below reads ``both`` on BOTH sides (edge list +
    # wdeg aggregate), and without the cache the whole distinct/window/
    # self-join edge build runs twice inside one materialization —
    # measured 3.4 s -> 6.9 s at sf0.1 when this persist was dropped.
    if persist_edges:
        both = both.persist()
    wdeg = both.groupBy(F.col("src").alias("id")).agg(
        F.sum("weight").alias("wdeg")
    )
    if persist_edges:
        wdeg = wdeg.persist()
    # wdeg(u) is a per-round constant, so it joins the edge list ONCE
    # here instead of once per iteration — each round then needs a
    # single keyed join (rank) instead of two (3 joins removed at
    # iters=3; sf0.1 wall time neutral within ambient noise, the win
    # is per-round shuffle/JOIN count at scale). Arithmetic is
    # unchanged: (r * weight) div wdeg reads the same numbers either
    # way.
    edged = both.join(
        wdeg.select(F.col("id").alias("src"), "wdeg"), "src"
    ).select("src", "dst", "weight", "wdeg")
    if persist_edges:
        edged = edged.persist()
    n_nodes = nodes.select(F.count("*").alias("_n"))
    base = nodes.crossJoin(F.broadcast(n_nodes))
    teleport = F.floor(
        (F.lit(float(100 - damping_pct)) / 100.0) / F.col("_n") * scale + F.lit(0.5)
    ).cast("long")
    rank = base.select(
        "id",
        "_n",
        F.floor(F.lit(1.0) / F.col("_n") * scale + F.lit(0.5))
        .cast("long")
        .alias("r"),
    )
    for _ in range(iters):
        contrib = (
            edged.join(rank.select("id", "r"), edged.src == F.col("id"))
            .select(
                F.col("dst").alias("id"),
                (F.col("r") * F.col("weight")).alias("_num"),
                "wdeg",
            )
            # SQL `div` (true integral division) — a float divide +
            # trunc can misround when the quotient lands within one
            # double ulp of an integer; positive operands make Spark's
            # div and DuckDB's // identical
            .selectExpr("id", "_num div wdeg AS c")
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        rank = (
            base.join(contrib, "id", "left")
            .select(
                "id",
                "_n",
                (
                    teleport
                    + F.expr(
                        f"({damping_pct} * coalesce(s, 0L)) div 100"
                    )
                ).alias("r"),
            )
        )
    return rank.join(wdeg, "id", "left").select(
        "id",
        (F.col("r").cast("double") / scale).alias("rank"),
        F.coalesce("wdeg", F.lit(0)).alias("wdeg"),
    )
