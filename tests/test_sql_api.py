"""SQL-API surface + physical-plan property tests: the engine's tables
work through plain ``spark.sql`` over registered views, and the scan
paths show the pushdown/pruning the 100 TB design depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_visualization_of_cryptocurrency_trading_data_spark import sinks
from etl_visualization_of_cryptocurrency_trading_data_spark.catalog import (
    load_table,
    register_views,
)
from etl_visualization_of_cryptocurrency_trading_data_spark.operators import derive

from conftest import SF_SMOKE


def test_flagship_expressible_in_sql(spark):
    """The latest-per-group snapshot runs as one spark.sql statement
    over registered views — same row count as the DataFrame builder."""
    register_views(spark, SF_SMOKE)
    derive.price_data(load_table(spark, SF_SMOKE, "events")).createOrReplaceTempView(
        "price_data_v"
    )
    got = spark.sql(
        """
        SELECT coin_id, exchange, timestamp, price FROM (
          SELECT *, row_number() OVER (PARTITION BY coin_id, exchange
                                       ORDER BY timestamp DESC) AS rn
          FROM price_data_v) WHERE rn = 1
        """
    )
    n_keys = (
        spark.table("price_data_v").select("coin_id", "exchange").distinct().count()
    )
    assert got.count() == n_keys


def test_filter_pushdown_reaches_scan(spark):
    """Predicate + projection reach the parquet scan (SURVEY §4.1: the
    reference cannot push its client-side filters; Catalyst does)."""
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("lang") == "en").select(
        "doc_id", "lang"
    )
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan


def test_partition_pruning_on_written_table(spark, tmp_path):
    """Tables written partitionBy(exchange) prune directories: a filter
    on the partition column shows up as PartitionFilters, and only that
    partition's files are read."""
    price = derive.price_data(load_table(spark, SF_SMOKE, "events")).limit(500)
    base = str(tmp_path / "tables")
    sinks.write_table(price, base, "price_data")
    one_exchange = price.select("exchange").first().exchange
    read = sinks.read_table(spark, base, "price_data").filter(
        F.col("exchange") == one_exchange
    )
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert f"PartitionFilters: [isnotnull(exchange" in plan
    assert read.count() > 0
