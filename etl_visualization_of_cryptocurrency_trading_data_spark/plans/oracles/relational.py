"""Relational / events / TPC-H-ish queries: joins (left,
semi, anti, as-of, salted-skew), rollup/cube/grouping-sets/pivot,
sketches (HLL, CMS, approx quantiles) and layout profiling.

Split verbatim from plans/registry.py (r11 verdict item #2); the
facade registry module re-exports every name and asserts the
assembled surface is byte-identical to the pre-split snapshot.
"""

from __future__ import annotations

from ...catalog import load_table
from ...operators import derive
from ...operators.indicators import technical_indicators
from pyspark.sql import DataFrame, SparkSession
from .serving import (
    COINS_CTE,
    INDICATORS_CTE,
    OHLC_CTE,
    PRICE_BASE_SQL,
    PRICE_DATA_CTE,
    _events,
    _price_base,
    _with,
    q_ohlc,
)
from ...operators import relational

def q_exchange_cardinality(spark, sf_dir):
    """Distinct aggregation (absent in the reference, SURVEY §2.4):
    exact distinct coins + tick count per exchange. Spark expands
    count(DISTINCT) into a two-phase aggregate (dedup then count) with
    partial aggregation on both phases; approx_count_distinct (HLL,
    single-phase mergeable sketch) is the 100 TB alternative."""
    from pyspark.sql import functions as F

    return (
        _price_base(spark, sf_dir)
        .groupBy("exchange")
        .agg(
            F.countDistinct("coin_id").alias("n_coins"),
            F.count("*").alias("n_ticks"),
        )
    )

def q_exchange_cardinality_approx(spark, sf_dir):
    """The 100 TB variant of exchange_cardinality: HLL++ mergeable
    sketch (single-phase, map-side combinable, fixed memory per group)
    instead of the two-phase exact distinct. rsd=0.01 doubles the
    default precision at ~4x fewer registers than the 0.005 max tier
    (measured 6x faster; observed error <=0.7% at fixture scales).

    Driver-checkable contract: DuckDB's HLL produces different raw
    estimates by construction, so instead of emitting the estimate this
    emits the exact count plus an IN-PLAN accuracy bound
    (|approx - exact| / exact <= 0.05) as a boolean — the oracle states
    the bound as a literal TRUE and value-hash equality then verifies
    the sketch's accuracy, not its engine-specific register contents.
    The tighter per-scale error (<=2%) stays pinned by pytest
    (tests/test_sql_api.py)."""
    from pyspark.sql import functions as F

    exact = F.countDistinct("coin_id")
    approx = F.approx_count_distinct("coin_id", 0.01)
    return (
        _price_base(spark, sf_dir)
        .groupBy("exchange")
        .agg(
            exact.alias("n_coins"),
            F.count("*").alias("n_ticks"),
            # coalesce: a group whose key column is entirely NULL has
            # exact == 0, the ratio is NULL (non-ANSI /0), and the
            # contract is vacuously satisfied — the oracle's literal
            # TRUE must match in that degenerate case too
            F.coalesce(
                F.abs(approx - exact) / exact <= 0.05, F.lit(True)
            ).alias("approx_within_5pct"),
        )
    )

def q_coin_indicators_left(spark, sf_dir):
    """Plain left outer join with real null extension (reference J3):
    every coin, left-joined to its latest FULL indicator row (sma_20
    non-null needs >= 20 ticks, which many fixture coins lack, so the
    null-extended branch is genuinely exercised). The right side
    collapses to one row per coin before the join and is broadcast —
    at 100 TB the preserved side streams with no shuffle."""
    from pyspark.sql import functions as F

    from ...operators.latest import latest_per_group

    ev = _events(spark, sf_dir)
    ind = technical_indicators(derive.price_data(ev)).filter(
        F.col("sma_20").isNotNull()
    )
    latest = latest_per_group(
        ind, ["coin_id", "exchange"], tiebreak=["sma_20", "ema_20", "rsi_14", "macd"]
    ).select(
        F.col("coin_id").alias("id"),
        "exchange",
        F.col("timestamp").alias("ind_ts"),
        "sma_20",
        "ema_20",
        "rsi_14",
        "macd",
    )
    return relational.left_join(
        derive.coins(ev), F.broadcast(latest), ["id", "exchange"]
    )

def q_asof_price_candle(spark, sf_dir):
    price = _price_base(spark, sf_dir)
    candles = derive.ohlc_data(derive.price_data(_events(spark, sf_dir)))
    return relational.asof_join(
        price, candles, keys=["coin_id", "exchange"],
        right_cols=["open", "high", "low", "close"],
    )

def _cutoff_days(price: DataFrame, days: int) -> DataFrame:
    from pyspark.sql import functions as F

    cut = price.agg(
        F.max("timestamp").alias("_max_ts")
    ).select((F.col("_max_ts") - F.expr(f"INTERVAL {days} DAYS")).alias("_cutoff"))
    return price.crossJoin(F.broadcast(cut)).filter(
        F.col("timestamp") > F.col("_cutoff")
    ).drop("_cutoff")

def q_active_coins_semi(spark, sf_dir):
    ev = _events(spark, sf_dir)
    recent = _cutoff_days(derive.price_data(ev), 3).selectExpr(
        "coin_id AS id", "exchange"
    )
    return relational.semi_join(derive.coins(ev), recent, ["id", "exchange"])

def q_stale_coins_anti(spark, sf_dir):
    ev = _events(spark, sf_dir)
    recent = _cutoff_days(derive.price_data(ev), 3).selectExpr(
        "coin_id AS id", "exchange"
    )
    return relational.anti_join(derive.coins(ev), recent, ["id", "exchange"])

def q_union_price_feeds(spark, sf_dir):
    from pyspark.sql import functions as F

    price = _price_base(spark, sf_dir)
    otc = load_table(spark, sf_dir, "orders").select(
        F.concat(F.lit("otc_C"), F.col("o_custkey") % 15).alias("coin_id"),
        F.lit("otc").alias("exchange"),
        F.col("o_orderdate").alias("timestamp"),
        (F.col("o_totalprice") / 1000.0).alias("price"),
        F.col("o_totalprice").alias("volume"),
    )
    return (
        relational.union_feeds(price, otc)
        .groupBy("exchange")
        .agg(
            F.count("*").alias("n_ticks"),
            F.sum("volume").alias("total_volume"),
        )
    )

def q_top_coins_by_volume(spark, sf_dir):
    from pyspark.sql import functions as F

    per_coin = (
        _price_base(spark, sf_dir)
        .groupBy("coin_id", "exchange")
        .agg(F.sum("volume").alias("total_volume"))
    )
    return relational.top_k(per_coin, "total_volume", 10, tiebreak="coin_id")

def q_volume_rollup(spark, sf_dir):
    return relational.volume_rollup(_price_base(spark, sf_dir))

# The fixture feed's five exchanges. Static on purpose: pivot/conditional
# aggregation with a pinned value list plans one pass; value inference
# would add a distinct scan of the fact table (see relational.close_pivot).
EXCHANGES = ["click", "error", "purchase", "signup", "view"]

def q_volume_cube(spark, sf_dir):
    """CUBE (exchange, day) volume matrix — all four grouping sets in
    one Expand + single-shuffle aggregation (§2.4 stretch next to
    volume_rollup)."""
    return relational.volume_cube(_price_base(spark, sf_dir))

def q_close_pivot(spark, sf_dir):
    """Hourly avg-close pivoted wide by exchange (static value list) —
    the chart-ready matrix the reference assembles client-side in
    pandas (flask/app.py builds per-coin traces by re-querying; one
    pivoted frame serves all five)."""
    return relational.close_pivot(q_ohlc(spark, sf_dir), EXCHANGES)

def q_cms_frequencies(spark, sf_dir):
    """Count-Min Sketch frequency estimation
    (operators/sketches.cms_frequencies) — the frequency sketch next
    to the HLL cardinality rollup and the GK quantile sketch: a
    4×1024 counter grid (size independent of corpus and key
    cardinality, cells are plain SUMs so grids merge by cell-wise
    addition like the daily HLL table), per-key estimate = min over
    rows, with the in-plan accuracy contract — ``is_overestimate``
    (structurally ALWAYS true for a CMS) and ``within_bound``
    (estimate ≤ exact + ceil(2N/width)). The md5-derived positions
    make build + estimate replay bit-exactly in the oracle (the
    MinHash/SimHash md5-family pattern), so the driver hash checks
    the sketch's VALUES, not just the contract."""
    from pyspark.sql import functions as F

    from ...operators import sketches

    price = _price_base(spark, sf_dir)
    return sketches.cms_frequencies(price, F.col("coin_id"))

def q_zorder_profile(spark, sf_dir):
    """Z-order (Morton) layout profile (operators/layout.py
    zorder_cells) — the multi-column data-skipping primitive behind
    Delta/Iceberg OPTIMIZE ZORDER BY: price bucket and epoch-minute
    interleaved bit-by-bit into one key, rows grouped into top-level
    Morton cells, per-cell row count + bounding box of BOTH
    dimensions emitted. Tight per-cell boxes in both dimensions at
    once are exactly what makes parquet min/max file pruning work for
    predicates on either column after a zordered write
    (layout.write_zordered; the collapse of per-file bounding-box
    area vs an unclustered write is measured in pytest). The oracle
    replays the 32-term shift/mask interleave verbatim — pure integer
    arithmetic, bit-identical across engines."""
    from pyspark.sql import functions as F

    from ...operators import layout

    price = _price_base(spark, sf_dir)
    a = F.pmod(F.floor(F.col("price") * 100).cast("long"), F.lit(65536))
    b = F.expr("unix_timestamp(timestamp) div 60 % 65536")
    return layout.zorder_cells(price, a, b).orderBy("cell")

def q_event_bigrams(spark, sf_dir):
    """Sequential-pattern mining (relational.event_bigrams): top-20
    consecutive per-user event-type transitions — the Markov edge
    table, with the event_id tiebreak pinning tied timestamps."""
    from ...operators.relational import event_bigrams

    return event_bigrams(_events(spark, sf_dir))

def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape (relational.shipping_priority): segment-filtered
    customer ⋈ orders ⋈ lineitem with anchored date cutoffs, revenue
    per order, top-10 via TakeOrdered — the selective-join bench anchor
    next to pricing_summary's scan-agg."""
    from ...operators.relational import shipping_priority

    return shipping_priority(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )

def q_event_props_variant(spark, sf_dir):
    """The VARIANT semi-structured path (Spark 4's typed JSON):
    events.props parsed once with parse_json, fields extracted with
    variant_get (typed, no per-path re-parse — get_json_object
    re-parses the string per path, which is why event_props_stats
    caps at one path), plus try_variant_get's NULL-not-error contract
    on a missing path. Aggregated per event_type; oracle replays with
    DuckDB's native JSON extraction."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "long")
    missing = F.try_variant_get(v, "$.does_not_exist", "string")
    return (
        ev.select("event_type", k.alias("k"), missing.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.col("m").isNull().cast("long")).alias("n_missing_path"),
        )
    )

def q_activity_reconciliation(spark, sf_dir):
    """Full-outer snapshot reconciliation
    (relational.activity_reconciliation): per-entity activity across
    the feed's two time halves with both/first-only/second-only
    status — the join type nothing else exercises, with integer
    midpoint arithmetic for determinism."""
    from ...operators.relational import activity_reconciliation

    return activity_reconciliation(_price_base(spark, sf_dir))

def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape (relational.pricing_summary): the canonical
    scan-dominated two-flag aggregate over lineitem, cutoff anchored
    at max(l_shipdate) − 90 days — the stable scan-agg bench anchor."""
    from ...operators.relational import pricing_summary

    return pricing_summary(load_table(spark, sf_dir, "lineitem"))

def q_rolling_active_coins(spark, sf_dir):
    """Rolling trailing-7-day distinct coins per exchange
    (derive.rolling_active_coins): windowed hll_union_agg over
    pre-built daily sketches, contract-verified against the exact
    range-join answer — the rolling-MAU pattern where mergeable
    sketches become load-bearing."""
    return derive.rolling_active_coins(_price_base(spark, sf_dir))

def q_exchange_hll_rollup(spark, sf_dir):
    """Mergeable-sketch rollup contract (derive.exchange_hll_rollup):
    per-day Datasketches HLL sketches merged per exchange; emits exact
    counts + the in-plan ≤5% accuracy boolean the oracle pins as TRUE —
    the materialized-sketch-table pattern next to
    exchange_cardinality_approx's single-shot HLL++."""
    return derive.exchange_hll_rollup(_price_base(spark, sf_dir))

def q_coin_volume_percentile(spark, sf_dir):
    """Liquidity standing per exchange (derive.coin_volume_percentile):
    percent_rank + cume_dist of rounded total volume — the rank-family
    window functions momentum_ranks doesn't cover."""
    return derive.coin_volume_percentile(_price_base(spark, sf_dir))

def q_volume_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS ((exchange),(day),()) with grouping_id
    (derive.volume_grouping_sets) — the non-lattice member of the
    multi-dimensional aggregate family next to volume_cube and
    volume_rollup."""
    return derive.volume_grouping_sets(_price_base(spark, sf_dir))

def q_funnel_conversion(spark, sf_dir):
    """Ordered funnel over the raw event stream
    (relational.funnel): view → click → purchase with first-touch
    anchors and strictly-after ordering; per-stage user counts and
    conversion rates."""
    from ...operators.relational import funnel

    return funnel(_events(spark, sf_dir))

def q_scd2_volume_tiers(spark, sf_dir):
    """SCD type-2 dimension build (derive.scd2_volume_tiers): daily
    per-coin liquidity tier (ntile over rounded daily volume) collapsed
    into [valid_from, valid_to) validity ranges with is_current — the
    gaps-and-islands warehouse primitive."""
    return derive.scd2_volume_tiers(_price_base(spark, sf_dir))

def q_revenue_by_nation(spark, sf_dir):
    """Classic OLAP multi-join: lineitem ⋈ orders ⋈ customer ⋈ nation,
    revenue per nation. Dimension sides broadcast; the lineitem-orders
    join is the only large shuffle and AQE sizes it."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum("rev").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )

def q_top_suppliers(spark, sf_dir):
    """Top-10 suppliers by shipped value: join + agg + deterministic
    top-k (TakeOrderedAndProject)."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", (F.col("l_extendedprice") * F.col("l_quantity")).alias("val")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    per = li.groupBy("l_suppkey").agg(F.sum("val").alias("shipped_value"))
    joined = per.join(F.broadcast(supp), per.l_suppkey == supp.s_suppkey).select(
        "s_suppkey", "s_name", "shipped_value"
    )
    return relational.top_k(joined, "shipped_value", 10, tiebreak="s_suppkey")

def q_event_props_stats(spark, sf_dir):
    """Semi-structured path extraction outside the envelope family: the
    events.props JSON payload parsed in-plan (get_json_object) and
    aggregated per event_type. Scale: map-side JSON path + one keyed
    aggregation with partial combine."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )

def q_user_retention(spark, sf_dir):
    """Cohort retention triangle over the raw event stream."""
    return derive.user_retention(load_table(spark, sf_dir, "events"))

def q_trading_sessions(spark, sf_dir):
    """Gaps-and-islands sessionization of the tick stream (batch twin
    of streaming session_window; gap 6h)."""
    return relational.sessionize(
        _price_base(spark, sf_dir), ["coin_id", "exchange"], gap_minutes=360
    )

def q_session_range_join(spark, sf_dir):
    """Pure range join (no equi key): every tick of every coin against
    the trading sessions of the single highest-volume coin — binned
    interval join (operators/relational.interval_join_binned), never a
    broadcast nested loop. Aggregates market-wide activity per session
    window of the market mover."""
    from pyspark.sql import functions as F

    price = _price_base(spark, sf_dir)
    top1 = (
        price.groupBy("coin_id")
        .agg(F.sum("volume").alias("v"))
        .orderBy(F.col("v").desc(), F.col("coin_id").asc())
        .limit(1)
        .select("coin_id")
    )
    mover = price.join(F.broadcast(top1), "coin_id", "left_semi")
    sessions = relational.sessionize(
        mover, ["coin_id", "exchange"], gap_minutes=360
    ).select("session_start", "session_end")
    joined = relational.interval_join_binned(
        price.select("coin_id", "timestamp", "volume"),
        sessions,
        "timestamp",
        "session_start",
        "session_end",
    )
    return joined.groupBy("session_start", "session_end").agg(
        F.count("*").alias("n_ticks"),
        F.countDistinct("coin_id").alias("n_coins"),
        F.round(F.sum("volume"), 6).alias("total_volume"),
    )

def q_salted_join_skew(spark, sf_dir):
    """Skew-mitigated join evidence (relational.salted_join): the
    price feed keyed by symbol with a DELIBERATE hot key (every
    symbol with u % 5 != 0 remaps to 'HOT' — ~80% of all rows funnel
    into one key), joined salted (8 buckets) against the derived
    key dimension, then aggregated per key. Salting is result-
    identical to the plain join by construction; the oracle IS the
    plain join, so the driver hash pins exactly that equivalence.
    At scale the salt spreads the hot key across 8 shuffle partitions
    instead of one straggler task."""
    from ...operators import relational

    from pyspark.sql import functions as F

    price = _price_base(spark, sf_dir)
    u = F.regexp_extract("coin_id", "_C([0-9]+)$", 1).cast("int")
    big = price.select(
        F.when(u % 5 != 0, F.lit("HOT"))
        .otherwise(F.concat(F.lit("C"), u.cast("string")))
        .alias("key"),
        "volume",
    )
    small = big.select("key").distinct().select(
        "key", F.md5(F.col("key")).alias("key_tag")
    )
    joined = relational.salted_join(big, small, ["key"], buckets=8)
    return (
        joined.groupBy("key", "key_tag")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("volume"), 6).alias("total_volume"),
        )
    )

def q_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape (relational.large_volume_customers): the
    aggregate-as-join-filter plan — one partial-combined corpus
    aggregate, HAVING leaves a tiny key set, which is BROADCAST
    through the orders and customer joins so lineitem never reaches a
    join exchange. Completes the classic-OLAP anchor set next to Q1
    (pricing_summary), Q3 (shipping_priority) and the Q5-shaped
    revenue_by_nation."""
    from ...operators.relational import large_volume_customers

    return large_volume_customers(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )

def q_bucketed_join_audit(spark, sf_dir):
    """Bucketed co-located join as a DRIVER-HASH row (r11): the
    storage-layout lever for 100 TB fact-to-fact joins, previously
    pytest-only (test_bucketed_join_plan_has_no_exchange /
    test_bucketed_tables_join_without_shuffle). Both sides are written
    ``bucketBy(8, coin_id)`` via catalog.write_bucketed_table (per-sf
    table names, overwrite-idempotent, under the gitignored
    spark-warehouse dir), re-read from the catalog, and joined with a
    MERGE hint (no broadcast/conf dependence). The row carries the
    join's physical evidence IN-BAND, plan_audit-style:
    ``plan_exchanges`` = Exchange-operator count in the join's executed
    plan (0 — bucketing pre-applied the hash partitioning at write
    time, so neither side shuffles) and ``sort_merge_join`` (True),
    value-checked against oracle literals. The per-exchange aggregate
    over the tick ⋈ per-coin-totals join is join-shape-sensitive, so a
    wrong join flips the hash too. At scale this layout pays one
    clustering shuffle at write and amortizes it over every subsequent
    same-key join or aggregation."""
    import re as _re

    from pyspark.sql import functions as F

    from ...catalog import write_bucketed_table

    tag = _re.sub(r"[^A-Za-z0-9]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    price = derive.price_data(load_table(spark, sf_dir, "events")).select(
        "coin_id", "exchange", "timestamp", "price", "volume"
    )
    totals = price.groupBy("coin_id").agg(
        F.sum("volume").alias("total_volume")
    )
    # anchor the scratch tables in a tempdir-located database rather
    # than the session's cwd-dependent spark-warehouse (the driver's
    # working directory is not ours to assume writable); a managed
    # table's location can also survive from ANOTHER session's catalog
    # (LOCATION_ALREADY_EXISTS on create), so drop the catalog entry
    # and clear any orphaned location before the overwrite
    import os as _os
    import shutil as _shutil

    # per-process location with dead-owner orphan sweep (ADVICE r11 +
    # r12's uid/age scoping) — the shared sinks.scratch_dir discipline
    db = "bucket_audit"
    from ...sinks import scratch_dir

    db_loc = scratch_dir("spark_bucket_audit")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{db_loc}'")
    # IF NOT EXISTS keeps an existing database's OLD location, so the
    # cleanup path comes from the catalog's actual answer, not from the
    # location we just asked for
    actual_loc = _re.sub(
        "^file:", "", spark.catalog.getDatabase(db).locationUri
    )
    ticks_t = f"{db}.ticks_{tag}"
    totals_t = f"{db}.totals_{tag}"
    for t in (ticks_t, totals_t):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = _os.path.join(actual_loc, t.split(".", 1)[1])
        if _os.path.isdir(loc):
            _shutil.rmtree(loc)
    write_bucketed_table(price, ticks_t, ["coin_id"], n_buckets=8)
    write_bucketed_table(totals, totals_t, ["coin_id"], n_buckets=8)
    joined = spark.table(ticks_t).join(
        spark.table(totals_t).hint("merge"), "coin_id"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return (
        joined.groupBy("exchange")
        .agg(
            F.count("*").alias("n_ticks"),
            F.round(F.sum("volume"), 4).alias("sum_volume"),
            F.round(F.sum("total_volume"), 2).alias("sum_joined_totals"),
        )
        .withColumn("plan_exchanges", F.lit(plan.count("Exchange")))
        .withColumn("sort_merge_join", F.lit("SortMergeJoin" in plan))
    )

# DuckDB oracle SQL for this domain's registered queries —
# assembled (registration order restored) into plans.registry.ORACLES.
ORACLE_SQL: dict[str, str] = {
    "exchange_cardinality": f"""
SELECT exchange, count(DISTINCT coin_id)::BIGINT AS n_coins,
       count(*)::BIGINT AS n_ticks
FROM ({PRICE_BASE_SQL}) p GROUP BY exchange""",
    # The oracle asserts the HLL accuracy CONTRACT (bound literally
    # TRUE), not the engine-specific estimate — see q_exchange_
    # cardinality_approx. A sketch drifting past 5% breaks hash equality.
    "exchange_cardinality_approx": f"""
SELECT exchange, count(DISTINCT coin_id)::BIGINT AS n_coins,
       count(*)::BIGINT AS n_ticks,
       TRUE AS approx_within_5pct
FROM ({PRICE_BASE_SQL}) p GROUP BY exchange""",
    "coin_indicators_left": _with(
        PRICE_DATA_CTE, COINS_CTE, INDICATORS_CTE,
        select="""
, latest_full_ind AS (
  SELECT coin_id, exchange, timestamp AS ind_ts, sma_20, ema_20, rsi_14, macd FROM (
    SELECT *, row_number() OVER (PARTITION BY coin_id, exchange
                                 ORDER BY timestamp DESC, sma_20 DESC, ema_20 DESC,
                                          rsi_14 DESC, macd DESC) AS lrn
    FROM technical_indicators WHERE sma_20 IS NOT NULL) WHERE lrn = 1
)
SELECT c.id, c.name, c.symbol, c.exchange,
       i.ind_ts, i.sma_20, i.ema_20, i.rsi_14, i.macd
FROM coins c
LEFT JOIN latest_full_ind i ON i.coin_id = c.id AND i.exchange = c.exchange""",
    ),
    "asof_price_candle": f"""
WITH price AS ({PRICE_BASE_SQL}),
ohlc AS (
  SELECT coin_id, exchange, date_trunc('hour', timestamp) AS timestamp,
         (min({{'t': timestamp, 'p': price}})).p AS open, max(price) AS high,
         min(price) AS low, (max({{'t': timestamp, 'p': price}})).p AS close
  FROM price GROUP BY 1, 2, 3
)
SELECT p.coin_id, p.exchange, p.timestamp, p.price, p.volume,
       o.open, o.high, o.low, o.close
FROM price p
ASOF LEFT JOIN ohlc o
  ON p.coin_id = o.coin_id AND p.exchange = o.exchange
 AND o.timestamp <= p.timestamp""",
    "active_coins_semi": _with(
        COINS_CTE,
        select=f"""
, price AS ({PRICE_BASE_SQL}),
cut AS (SELECT max(timestamp) - INTERVAL 3 DAYS AS cutoff FROM price)
SELECT c.* FROM coins c WHERE EXISTS (
  SELECT 1 FROM price p, cut
  WHERE p.coin_id = c.id AND p.exchange = c.exchange AND p.timestamp > cut.cutoff)""",
    ),
    "stale_coins_anti": _with(
        COINS_CTE,
        select=f"""
, price AS ({PRICE_BASE_SQL}),
cut AS (SELECT max(timestamp) - INTERVAL 3 DAYS AS cutoff FROM price)
SELECT c.* FROM coins c WHERE NOT EXISTS (
  SELECT 1 FROM price p, cut
  WHERE p.coin_id = c.id AND p.exchange = c.exchange AND p.timestamp > cut.cutoff)""",
    ),
    "union_price_feeds": f"""
WITH feed AS (
  {PRICE_BASE_SQL}
  UNION ALL
  SELECT 'otc_C' || (o_custkey % 15) AS coin_id, 'otc' AS exchange,
         o_orderdate AS timestamp, o_totalprice / 1000.0 AS price,
         o_totalprice AS volume
  FROM orders
)
SELECT exchange, count(*)::BIGINT AS n_ticks, sum(volume) AS total_volume
FROM feed GROUP BY exchange""",
    "top_coins_by_volume": f"""
SELECT coin_id, exchange, sum(volume) AS total_volume
FROM ({PRICE_BASE_SQL}) p
GROUP BY coin_id, exchange
ORDER BY total_volume DESC, coin_id
LIMIT 10""",
    "volume_rollup": f"""
SELECT exchange, coin_id, sum(volume) AS total_volume, count(*)::BIGINT AS n_ticks
FROM ({PRICE_BASE_SQL}) p
GROUP BY ROLLUP (exchange, coin_id)""",
    # salted join is result-identical to the plain join — the oracle
    # IS the plain join, so the hash pins exactly that equivalence
    "salted_join_skew": f"""
WITH base AS ({PRICE_BASE_SQL}),
keyed AS (
  SELECT CASE WHEN CAST(regexp_extract(coin_id, '_C([0-9]+)$', 1) AS INT) % 5 <> 0
              THEN 'HOT'
              ELSE 'C' || regexp_extract(coin_id, '_C([0-9]+)$', 1) END AS key,
         volume
  FROM base
),
dim AS (SELECT key, md5(key) AS key_tag FROM (SELECT DISTINCT key FROM keyed))
SELECT k.key, d.key_tag, count(*)::BIGINT AS n_rows,
       round(sum(k.volume), 6) AS total_volume
FROM keyed k JOIN dim d ON k.key = d.key
GROUP BY k.key, d.key_tag""",
    "event_bigrams": """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, count(*)::BIGINT AS n_transitions
  FROM pairs WHERE from_type IS NOT NULL GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_transitions, rank FROM (
  SELECT *, row_number() OVER (ORDER BY n_transitions DESC,
                               from_type, to_type) AS rank
  FROM counts) WHERE rank <= 20""",
    "shipping_priority": """
WITH cut AS (SELECT max(l_shipdate) - INTERVAL 60 DAYS AS c FROM lineitem),
cust AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
ordf AS (
  SELECT o_orderkey, o_orderdate, o_orderpriority
  FROM orders JOIN cust ON o_custkey = c_custkey CROSS JOIN cut
  WHERE o_orderdate < cut.c
),
li AS (
  SELECT l_orderkey, l_extendedprice * (1 - l_discount) AS rev
  FROM lineitem CROSS JOIN cut WHERE l_shipdate > cut.c
)
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(rev), 6) AS revenue
FROM li JOIN ordf ON l_orderkey = o_orderkey
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10""",
    "event_props_variant": """
SELECT event_type,
       count(*)::BIGINT AS n_events,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       min(json_extract(props, '$.k')::BIGINT)::BIGINT AS min_k,
       max(json_extract(props, '$.k')::BIGINT)::BIGINT AS max_k,
       sum(CASE WHEN json_extract_string(props, '$.does_not_exist') IS NULL
                THEN 1 ELSE 0 END)::BIGINT AS n_missing_path
FROM events GROUP BY event_type""",
    "activity_reconciliation": f"""
WITH base AS ({PRICE_BASE_SQL}),
bounds AS (
  SELECT (min(epoch_us(timestamp)) + max(epoch_us(timestamp))) // 2 AS mid
  FROM base
),
a AS (
  SELECT coin_id, exchange, count(*)::BIGINT AS n_ticks_h1,
         round(sum(volume), 6) AS volume_h1
  FROM base, bounds WHERE epoch_us(timestamp) <= mid
  GROUP BY coin_id, exchange
),
b AS (
  SELECT coin_id, exchange, count(*)::BIGINT AS n_ticks_h2,
         round(sum(volume), 6) AS volume_h2
  FROM base, bounds WHERE epoch_us(timestamp) > mid
  GROUP BY coin_id, exchange
)
SELECT coalesce(a.coin_id, b.coin_id) AS coin_id,
       coalesce(a.exchange, b.exchange) AS exchange,
       coalesce(n_ticks_h1, 0)::BIGINT AS n_ticks_h1,
       coalesce(n_ticks_h2, 0)::BIGINT AS n_ticks_h2,
       coalesce(volume_h1, 0.0) AS volume_h1,
       coalesce(volume_h2, 0.0) AS volume_h2,
       CASE WHEN n_ticks_h1 IS NOT NULL AND n_ticks_h2 IS NOT NULL THEN 'both'
            WHEN n_ticks_h1 IS NOT NULL THEN 'first_half_only'
            ELSE 'second_half_only' END AS status
FROM a FULL OUTER JOIN b
  ON a.coin_id = b.coin_id AND a.exchange = b.exchange""",
    "pricing_summary": """
WITH cut AS (SELECT max(l_shipdate) - INTERVAL 90 DAYS AS cutoff FROM lineitem)
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       round(sum(l_extendedprice), 6) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*)::BIGINT AS count_order
FROM lineitem, cut
WHERE l_shipdate <= cut.cutoff
GROUP BY l_returnflag, l_linestatus""",
    "rolling_active_coins": f"""
WITH base AS ({PRICE_BASE_SQL}),
pairs AS (
  SELECT DISTINCT exchange, date_trunc('day', timestamp) AS day, coin_id
  FROM base
),
spine AS (SELECT DISTINCT exchange, day FROM pairs),
ex AS (
  SELECT s.exchange, s.day, count(DISTINCT p.coin_id)::BIGINT AS n_coins_7d
  FROM spine s JOIN pairs p ON p.exchange = s.exchange
   AND p.day BETWEEN s.day - INTERVAL 6 DAYS AND s.day
  GROUP BY s.exchange, s.day
),
nd AS (
  SELECT exchange, day,
         count(*) OVER (PARTITION BY exchange ORDER BY day
                        RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)::BIGINT
           AS n_days_in_window
  FROM spine
)
SELECT ex.exchange, ex.day, ex.n_coins_7d, nd.n_days_in_window,
       TRUE AS sketch_within_5pct
FROM ex JOIN nd USING (exchange, day)""",
    "exchange_hll_rollup": f"""
WITH base AS ({PRICE_BASE_SQL})
SELECT exchange,
       count(DISTINCT coin_id)::BIGINT AS n_coins,
       count(DISTINCT date_trunc('day', timestamp))::BIGINT AS n_days,
       TRUE AS merged_within_5pct
FROM base GROUP BY exchange""",
    "coin_volume_percentile": f"""
WITH base AS ({PRICE_BASE_SQL}),
t AS (
  SELECT coin_id, exchange, round(sum(volume), 6) AS total_volume,
         count(*)::BIGINT AS n_ticks
  FROM base GROUP BY coin_id, exchange
)
SELECT exchange, coin_id, total_volume, n_ticks,
       percent_rank() OVER w AS vol_percent_rank,
       cume_dist() OVER w AS vol_cume_dist
FROM t
WINDOW w AS (PARTITION BY exchange ORDER BY total_volume)""",
    "volume_grouping_sets": f"""
SELECT exchange, date_trunc('day', timestamp) AS day,
       grouping_id(exchange, date_trunc('day', timestamp))::BIGINT AS grouping_id,
       round(sum(volume), 6) AS total_volume, count(*)::BIGINT AS n_ticks
FROM ({PRICE_BASE_SQL}) p
GROUP BY GROUPING SETS ((exchange), (date_trunc('day', timestamp)), ())""",
    "funnel_conversion": """
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view'
  GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t
  GROUP BY e.user_id
),
counts AS (
  SELECT 1 AS stage_idx, 'view' AS stage, count(*)::BIGINT AS n_users FROM s1
  UNION ALL
  SELECT 2, 'click', count(*)::BIGINT FROM s2
  UNION ALL
  SELECT 3, 'purchase', count(*)::BIGINT FROM s3
)
SELECT stage_idx, stage, n_users,
       round(n_users::DOUBLE / lag(n_users) OVER w, 9) AS conv_from_prev,
       round(n_users::DOUBLE / first_value(n_users) OVER w, 9) AS conv_from_first
FROM counts
WINDOW w AS (ORDER BY stage_idx)""",
    "scd2_volume_tiers": f"""
WITH base AS ({PRICE_BASE_SQL}),
daily AS (
  SELECT coin_id, date_trunc('day', timestamp) AS day,
         round(sum(volume), 6) AS day_volume
  FROM base GROUP BY coin_id, date_trunc('day', timestamp)
),
tiered AS (
  SELECT *, ntile(4) OVER (PARTITION BY day
                           ORDER BY day_volume DESC, coin_id) AS tier
  FROM daily
),
runs AS (
  SELECT *,
         row_number() OVER (PARTITION BY coin_id ORDER BY day)
           - row_number() OVER (PARTITION BY coin_id, tier ORDER BY day) AS grp
  FROM tiered
),
collapsed AS (
  SELECT coin_id, tier, grp,
         min(day) AS valid_from,
         max(day) AS last_day,
         count(*)::BIGINT AS n_days
  FROM runs GROUP BY coin_id, tier, grp
)
SELECT coin_id, tier, valid_from,
       last_day + INTERVAL 1 DAY AS valid_to,
       n_days,
       last_day = max(last_day) OVER (PARTITION BY coin_id) AS is_current
FROM collapsed""",
    "volume_cube": f"""
SELECT exchange, date_trunc('day', timestamp) AS day,
       round(sum(volume), 6) AS total_volume, count(*)::BIGINT AS n_ticks
FROM ({PRICE_BASE_SQL}) p
GROUP BY CUBE (exchange, day)""",
    "close_pivot": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
  SELECT timestamp,
         round(avg(close) FILTER (WHERE exchange = 'click'), 6) AS click,
         round(avg(close) FILTER (WHERE exchange = 'error'), 6) AS error,
         round(avg(close) FILTER (WHERE exchange = 'purchase'), 6) AS purchase,
         round(avg(close) FILTER (WHERE exchange = 'signup'), 6) AS signup,
         round(avg(close) FILTER (WHERE exchange = 'view'), 6) AS view
  FROM ohlc_data GROUP BY timestamp""",
    ),
    "event_props_stats": """
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(CAST(props->>'k' AS BIGINT))::BIGINT AS sum_k,
       min(CAST(props->>'k' AS BIGINT))::BIGINT AS min_k,
       max(CAST(props->>'k' AS BIGINT))::BIGINT AS max_k
FROM events GROUP BY event_type""",
    "user_retention": """
WITH activity AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
c AS (SELECT *, min(day) OVER (PARTITION BY user_id) AS cohort_day
      FROM activity)
SELECT cohort_day::TIMESTAMP AS cohort_day,
       (day - cohort_day)::BIGINT AS day_offset,
       count(*)::BIGINT AS n_users
FROM c GROUP BY 1, 2""",
    "trading_sessions": f"""
WITH base AS ({PRICE_BASE_SQL}),
marked AS (
  SELECT *, CASE WHEN epoch(timestamp) - epoch(lag(timestamp) OVER w) >= 360*60
                 THEN 1 ELSE 0 END AS ns
  FROM base
  WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp)
),
ids AS (
  SELECT *, sum(ns) OVER (PARTITION BY coin_id, exchange ORDER BY timestamp
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT coin_id, exchange,
       min(timestamp) AS session_start,
       max(timestamp) + INTERVAL 360 MINUTES AS session_end,
       count(*)::BIGINT AS n_ticks,
       min(price) AS low,
       max(price) AS high
FROM ids GROUP BY coin_id, exchange, sid""",
    # CMS replayed bit-exactly via the md5 position family; the two
    # contract booleans come out as actual comparisons, not literals —
    # the hash checks sketch VALUES
    "cms_frequencies": f"""
WITH base AS ({PRICE_BASE_SQL}),
keyed AS (SELECT coin_id AS key FROM base),
pos AS (
  SELECT key, s.seed,
         (('0x' || substr(md5(key || 's' || s.seed), 1, 8))::UBIGINT % 1024)::BIGINT AS col
  FROM keyed, (VALUES (0), (1), (2), (3)) s(seed)
),
grid AS (SELECT seed, col, count(*)::BIGINT AS n FROM pos GROUP BY seed, col),
total AS (SELECT sum(n) AS t FROM grid WHERE seed = 0),
exact AS (SELECT key, count(*)::BIGINT AS exact_n FROM keyed GROUP BY key),
probes AS (
  SELECT e.key, e.exact_n, s.seed,
         (('0x' || substr(md5(e.key || 's' || s.seed), 1, 8))::UBIGINT % 1024)::BIGINT AS col
  FROM exact e, (VALUES (0), (1), (2), (3)) s(seed)
),
est AS (
  SELECT p.key, p.exact_n, min(g.n) AS cms_n
  FROM probes p JOIN grid g ON p.seed = g.seed AND p.col = g.col
  GROUP BY p.key, p.exact_n
)
SELECT key, exact_n, cms_n,
       cms_n >= exact_n AS is_overestimate,
       cms_n <= exact_n + ceil(2.0 * t / 1024) AS within_bound
FROM est CROSS JOIN total""",
    # Morton interleave replayed as 32 shift/mask terms; cells are the
    # top 8 bits (zkey >> 24), so output is <=256 rows whatever the input
    "zorder_profile": f"""
WITH base AS ({PRICE_BASE_SQL}),
keyed AS (
  SELECT CAST(floor(price * 100) AS BIGINT) % 65536 AS a,
         -- floor, not CAST: epoch() is fractional and CAST rounds
         -- half-even while Spark's unix_timestamp truncates
         (CAST(floor(epoch(timestamp)) AS BIGINT) // 60) % 65536 AS b
  FROM base
),
z AS (SELECT a, b, ((((a >> 0) & 1) << 0) + (((b >> 0) & 1) << 1) + (((a >> 1) & 1) << 2) + (((b >> 1) & 1) << 3) + (((a >> 2) & 1) << 4) + (((b >> 2) & 1) << 5) + (((a >> 3) & 1) << 6) + (((b >> 3) & 1) << 7) + (((a >> 4) & 1) << 8) + (((b >> 4) & 1) << 9) + (((a >> 5) & 1) << 10) + (((b >> 5) & 1) << 11) + (((a >> 6) & 1) << 12) + (((b >> 6) & 1) << 13) + (((a >> 7) & 1) << 14) + (((b >> 7) & 1) << 15) + (((a >> 8) & 1) << 16) + (((b >> 8) & 1) << 17) + (((a >> 9) & 1) << 18) + (((b >> 9) & 1) << 19) + (((a >> 10) & 1) << 20) + (((b >> 10) & 1) << 21) + (((a >> 11) & 1) << 22) + (((b >> 11) & 1) << 23) + (((a >> 12) & 1) << 24) + (((b >> 12) & 1) << 25) + (((a >> 13) & 1) << 26) + (((b >> 13) & 1) << 27) + (((a >> 14) & 1) << 28) + (((b >> 14) & 1) << 29) + (((a >> 15) & 1) << 30) + (((b >> 15) & 1) << 31)) AS zkey FROM keyed)
SELECT zkey >> 24 AS cell, count(*)::BIGINT AS n_rows,
       min(a) AS a_min, max(a) AS a_max,
       min(b) AS b_min, max(b) AS b_max
FROM z GROUP BY zkey >> 24 ORDER BY cell""",
    "session_range_join": f"""
WITH base AS ({PRICE_BASE_SQL}),
top1 AS (SELECT coin_id FROM base GROUP BY coin_id
         ORDER BY sum(volume) DESC, coin_id LIMIT 1),
mover AS (SELECT b.* FROM base b JOIN top1 USING (coin_id)),
marked AS (
  SELECT *, CASE WHEN epoch(timestamp) - epoch(lag(timestamp) OVER w) >= 360*60
                 THEN 1 ELSE 0 END AS ns
  FROM mover
  WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp)
),
ids AS (
  SELECT *, sum(ns) OVER (PARTITION BY coin_id, exchange ORDER BY timestamp
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
),
sess AS (
  SELECT min(timestamp) AS session_start,
         max(timestamp) + INTERVAL 360 MINUTES AS session_end
  FROM ids GROUP BY coin_id, exchange, sid
)
SELECT s.session_start, s.session_end,
       count(*)::BIGINT AS n_ticks,
       count(DISTINCT t.coin_id)::BIGINT AS n_coins,
       round(sum(t.volume), 6) AS total_volume
FROM base t JOIN sess s
  ON t.timestamp >= s.session_start AND t.timestamp < s.session_end
GROUP BY s.session_start, s.session_end""",
    "revenue_by_nation": """
SELECT n_name AS nation,
       sum(l_extendedprice * (1 - l_discount)) AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name""",
    "top_suppliers": """
SELECT s_suppkey, s_name, shipped_value FROM (
  SELECT l_suppkey AS s_suppkey, sum(l_extendedprice * l_quantity) AS shipped_value
  FROM lineitem GROUP BY l_suppkey) v
JOIN (SELECT s_suppkey AS sk, s_name FROM supplier) s ON s_suppkey = sk
ORDER BY shipped_value DESC, s_suppkey
LIMIT 10""",
    # TPC-H Q18: aggregate-as-join-filter
    "large_volume_customers": """
WITH qty AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM qty
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey""",
    # r11: the co-located-join evidence row — the oracle is the PLAIN
    # join (bucketing must be result-identical) plus the literal plan
    # contract (0 exchanges, sort-merge), plan_audit-style
    "bucketed_join_audit": f"""
WITH price AS ({PRICE_BASE_SQL}),
totals AS (
  SELECT coin_id, sum(volume) AS total_volume FROM price GROUP BY coin_id
)
SELECT p.exchange,
       count(*)::BIGINT AS n_ticks,
       round(sum(p.volume), 4) AS sum_volume,
       round(sum(t.total_volume), 2) AS sum_joined_totals,
       0 AS plan_exchanges,
       TRUE AS sort_merge_join
FROM price p JOIN totals t USING (coin_id)
GROUP BY p.exchange""",
}
