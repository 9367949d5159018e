"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping.

At 100 TB the scan cost of a selective two-column predicate is decided
before the query runs — by LAYOUT. Sorting by one column clusters only
that column's min/max file statistics; interleaving the bits of two
bucketed columns into one Morton key and range-partitioning + sorting
on it gives every output file a tight bounding BOX in both dimensions,
so parquet row-group/file pruning works for predicates on either or
both columns (the technique behind Delta/Iceberg ``OPTIMIZE ZORDER
BY``, from Morton 1966). The key computation is pure integer
arithmetic — 2*bits shift/mask/or terms, fully inside whole-stage
codegen, exactly replayable in SQL — and the write is one
``repartitionByRange`` (range exchange on the key) + an in-partition
sort: the same cost as any global sort-write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave two non-negative ints of ``bits`` bits each
    into one 2*bits-bit key: bit i of ``a`` lands at position 2i, bit
    i of ``b`` at 2i+1. Built as a sum of shift/mask terms (shift
    amounts are literals, so the whole expression codegens); callers
    bucket their raw columns into [0, 2^bits) first."""
    a = a.cast("long")
    b = b.cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_cells(
    df: DataFrame,
    a: Column,
    b: Column,
    bits: int = 16,
    cell_shift: int = 24,
) -> DataFrame:
    """Z-order layout PROFILE: bucket every row into the Morton cell
    ``zkey >> cell_shift`` and report, per cell, the row count and the
    bounding box of both dimensions — the statistics a layout engine
    reads to decide file boundaries, and the direct evidence that
    Morton cells are tight in BOTH dimensions at once (each top-level
    cell covers one quadrant-of-quadrant... of the (a, b) plane).

    Output: (cell, n_rows, a_min, a_max, b_min, b_max) — at most
    2^(2*bits - cell_shift) rows however large the input, so the
    profile itself is an aggregation-safe driver query. Plan: one map
    pass for the key + one groupBy on the cell (map-side combined)."""
    keyed = df.select(
        a.cast("long").alias("a"),
        b.cast("long").alias("b"),
    ).withColumn("cell", F.shiftright(zorder_key(F.col("a"), F.col("b"), bits), cell_shift))
    return keyed.groupBy("cell").agg(
        F.count("*").alias("n_rows"),
        F.min("a").alias("a_min"),
        F.max("a").alias("a_max"),
        F.min("b").alias("b_min"),
        F.max("b").alias("b_max"),
    )


def write_zordered(
    df: DataFrame,
    a: Column,
    b: Column,
    path: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` Z-order-clustered: range-partition on the Morton
    key into ``n_files`` output files and sort within each — every
    file gets a contiguous Morton range, i.e. a tight bounding box in
    both dimensions, so parquet footer min/max statistics prune files
    for predicates on either column. The pytest measures exactly that:
    the sum of per-file bounding-box areas collapses vs an unclustered
    write of the same rows."""
    keyed = df.withColumn("_zkey", zorder_key(a, b, bits))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
