"""Latest-row-per-group operators (SURVEY §2.4 A1/A2, §2.2 P7).

The reference's richest route collapses a 3-way many-to-many join to the
newest row per (coin, exchange) with pandas ``sort_values().groupby()
.last()`` (flask/app.py:300), and fetches the latest market-cap snapshot
with a MAX(timestamp)-then-equality query pair (flask/app.py:208-218).

Spark-first equivalents:
- ``latest_per_group``: ``row_number()`` over a per-key desc-time window
  — the idiomatic top-1-per-group. One hash shuffle on the keys; with
  AQE this stays balanced at any entity cardinality.
- ``latest_snapshot``: the max-timestamp scalar folded into one plan via
  a window max — no two-query race (reference defect §2.11.5).

Deterministic tie-break: timestamp desc, then ``tiebreak`` columns desc,
pinned identically in the oracle SQL (FIXTURES.md §C).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_group(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "timestamp",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Newest row per key group (argmax over event time)."""
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def latest_snapshot(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """All rows carrying the globally newest timestamp (A1 + P7).

    Single-pass: global max via an aggregate joined back broadcast-style
    rather than an all-rows-to-one-partition window.
    """
    mx = df.agg(F.max(ts_col).alias("_max_ts"))
    return (
        df.join(F.broadcast(mx), on=df[ts_col] == mx["_max_ts"], how="inner")
        .drop("_max_ts")
    )
