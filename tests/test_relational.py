"""Unit tests pinning the stretch relational operators' edge semantics
on tiny literal frames (SURVEY §5.2 operator-family tests)."""

from __future__ import annotations

from etl_visualization_of_cryptocurrency_trading_data_spark.operators import relational


def test_asof_join_tie_and_missing(spark):
    left = spark.createDataFrame(
        [("k", 5, "a"), ("k", 10, "b"), ("k", 15, "c"), ("q", 7, "d")],
        "key string, timestamp long, tag string",
    )
    right = spark.createDataFrame(
        [("k", 10, 1.0), ("k", 12, 2.0)],
        "key string, timestamp long, val double",
    )
    got = {
        (r.key, r.timestamp): r.val
        for r in relational.asof_join(left, right, ["key"]).collect()
    }
    assert got[("k", 5)] is None          # nothing at-or-before
    assert got[("k", 10)] == 1.0          # tie: same-ts right row visible
    assert got[("k", 15)] == 2.0          # latest at-or-before wins
    assert got[("q", 7)] is None          # key with no right rows at all
    assert len(got) == 4                  # every left row exactly once


def test_semi_anti_partition(spark):
    left = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    right = spark.createDataFrame([("b",), ("b",), ("x",)], "k string")
    semi = {r.k for r in relational.semi_join(left, right, ["k"]).collect()}
    anti = {r.k for r in relational.anti_join(left, right, ["k"]).collect()}
    assert semi == {"b"}                  # no row multiplication from dup rhs
    assert anti == {"a", "c"}
    assert semi | anti == {"a", "b", "c"}


def test_union_feeds_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id long, only_a string")
    b = spark.createDataFrame([(2, 3.0)], "id long, only_b double")
    out = relational.union_feeds(a, b).orderBy("id").collect()
    assert [r.id for r in out] == [1, 2]
    assert out[0].only_b is None and out[1].only_a is None
