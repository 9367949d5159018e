"""Plan-shape observability: deterministic physical-plan features of
registered queries, AS A QUERY — so a plan regression (a new shuffle, a
broadcast join degrading to sort-merge, a lost latest-per-group
WindowGroupLimit) flips a driver-side oracle hash instead of hiding in
a NOTES table someone has to re-measure by hand.

Why these features: they are exactly the properties the 100 TB design
cares about (data movement count and kind, join strategy, the
WindowGroupLimit collapse that keeps latest-per-group from sorting
whole partitions), and they are DETERMINISTIC — measured identical
under the tuned session and a vanilla default-config session, and
across sf0.001/sf0.01/sf0.1, because they depend only on the logical
plan and the planner (explicit broadcast hints pin every join strategy
the audited queries use; no CBO/statistics enter). Runtime metrics
(shuffle bytes, spill) are deliberately NOT here — they are not
engine-reproducible, so they belong in bench.py, not a hash-checked
query.

Driver boundary (documented, like the stream-replay spool builders):
the plan strings are inspected driver-side and the result frame is
created from local rows — |audited queries| rows of metadata, not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def plan_features(df: DataFrame) -> dict[str, int]:
    """Count plan-shape features from the physical plan's string form
    (the AQE initial plan — pre-execution, so independent of runtime
    statistics). Substring counts are stable for a pinned Spark
    version; the registered oracle pins the expected values, so a
    planner change surfaces as a hash mismatch to investigate, which
    is the intended behavior for an observability contract."""
    s = df._jdf.queryExecution().executedPlan().toString()
    return {
        "n_shuffles": (
            s.count("Exchange hashpartitioning")
            + s.count("Exchange rangepartitioning")
            + s.count("Exchange SinglePartition")
        ),
        "n_broadcasts": s.count("BroadcastExchange"),
        "n_broadcast_joins": s.count("BroadcastHashJoin")
        + s.count("BroadcastNestedLoopJoin"),
        "n_sortmerge_joins": s.count("SortMergeJoin"),
        "n_window_group_limits": s.count("WindowGroupLimit"),
    }


def audit_plans(spark: SparkSession, frames: dict[str, DataFrame]) -> DataFrame:
    """One row per audited query: (query, n_shuffles, n_broadcasts,
    n_broadcast_joins, n_sortmerge_joins, n_window_group_limits)."""
    rows = [(name, *plan_features(df).values()) for name, df in frames.items()]
    return spark.createDataFrame(
        rows,
        "query string, n_shuffles int, n_broadcasts int, n_broadcast_joins int,"
        " n_sortmerge_joins int, n_window_group_limits int",
    )
