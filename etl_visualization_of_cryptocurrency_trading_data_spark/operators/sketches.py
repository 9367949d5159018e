"""Count-Min Sketch: mergeable frequency estimation (Cormode &
Muthukrishnan 2005) — the frequency-sketch sibling of the HLL
cardinality rollup (`derive.exchange_hll_rollup`) and the GK quantile
sketch (`doc_length_quantiles_approx`).

At 100 TB you don't count key frequencies with a groupBy over the
corpus per question — you maintain a depth×width counter grid whose
size is INDEPENDENT of both corpus size and key cardinality: each
occurrence increments one counter per row (depth hash functions), the
estimate is the MIN over rows, and two grids merge by cell-wise
addition (each cell is a plain SUM — map-side combinable, streamable,
unionable across days/sources exactly like the materialized HLL sketch
table). Structural guarantees: estimates NEVER underestimate (every
counter the key touches contains its full count), and overshoot is
bounded by εN with ε = e/width at depth ln(1/δ).

Hash family: md5-derived column positions (first 8 hex chars → int mod
width) — the same md5-family trick as MinHash/SimHash's registered
forms, so the ENTIRE sketch (build, merge, estimate) replays
bit-exactly in the DuckDB oracle; a production deployment would swap
xxhash64 in, changing nothing structural.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cms_col(key, seed: int, width: int):
    """Column position of ``key`` in sketch row ``seed``: first 32
    bits of md5(key || 's<seed>') mod width — deterministic,
    engine-portable (DuckDB: ('0x' || substr(md5(..), 1, 8))::UBIGINT)."""
    return (
        F.conv(F.substring(F.md5(F.concat(key, F.lit(f"s{seed}"))), 1, 8), 16, 10)
        .cast("long")
        % width
    )


def cms_build(df: DataFrame, key, width: int = 1024, depth: int = 4) -> DataFrame:
    """Build the Count-Min grid over one occurrence column: one
    (seed, col, n) row per touched counter, at most depth*width rows
    however large the input — a single explode-by-depth map pass into
    a map-side-combined groupBy. The grid is the mergeable state: two
    grids union + re-sum to the grid of the concatenated inputs."""
    positions = df.select(
        F.posexplode(
            F.array(*[_cms_col(key, s, width) for s in range(depth)])
        ).alias("seed", "col")
    )
    return positions.groupBy("seed", "col").agg(F.count("*").alias("n"))


def cms_frequencies(
    df: DataFrame, key, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Per-key CMS frequency estimates WITH the in-plan accuracy
    contract (the `exchange_cardinality_approx` pattern): for every
    distinct key, the exact count, the sketch estimate (min over the
    depth rows), and two booleans the oracle states as literal
    outcomes — ``is_overestimate`` (structurally ALWAYS true: a CMS
    never undercounts) and ``within_bound`` (estimate ≤ exact +
    ceil(2N/width), the ε-overshoot bound at these dimensions).

    Plan: grid build (one pass) + exact counts (one groupBy) + a
    BROADCAST join of the ≤ depth*width-row grid onto the distinct
    keys exploded by depth — the estimate never rescans the corpus,
    which is the point of carrying a sketch."""
    keyed = df.select(key.alias("key"))
    grid = cms_build(keyed, F.col("key"), width, depth)
    exact = keyed.groupBy("key").agg(F.count("*").alias("exact_n"))
    # N comes from the GRID (row 0 sums to one increment per
    # occurrence) — in-plan, no eager action, and exactly how a
    # sketch-table consumer derives it without touching the corpus
    total = grid.filter(F.col("seed") == 0).agg(
        F.sum("n").alias("_total")
    )
    probes = exact.select(
        "key",
        "exact_n",
        F.posexplode(
            F.array(*[_cms_col(F.col("key"), s, width) for s in range(depth)])
        ).alias("seed", "col"),
    )
    est = (
        probes.join(F.broadcast(grid), ["seed", "col"])
        .groupBy("key", "exact_n")
        .agg(F.min("n").alias("cms_n"))
    )
    bound = F.ceil(2.0 * F.col("_total") / width)  # the εN overshoot bound
    return est.crossJoin(F.broadcast(total)).select(
        "key",
        "exact_n",
        "cms_n",
        (F.col("cms_n") >= F.col("exact_n")).alias("is_overestimate"),
        (F.col("cms_n") <= F.col("exact_n") + bound).alias("within_bound"),
    )
