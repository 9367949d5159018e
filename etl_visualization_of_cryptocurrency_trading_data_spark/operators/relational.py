"""Relational stretch operators (SURVEY §2.3 "not present" joins,
§2.4 grouping sets, §2.6 top-k, §2.7 set ops) — capabilities the
reference lacks but a user of this engine gets natively from Spark,
each wired to an exact DuckDB oracle in plans/registry.

Scale notes per operator are inline; none of these collects to the
driver or cross-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "timestamp",
    right_ts: str = "timestamp",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    ``right_ts <= left_ts`` on the same keys (ties: the right row is
    visible to a left row at the exact same timestamp).

    Implemented as the union-and-carry-forward pattern — the scalable
    formulation: tag both sides, union, and ``last_value(..., ignoreNulls)``
    over (keys ORDER BY ts, side) carries each right row's payload
    forward to the left rows that follow it. ONE shuffle on the keys,
    no range-condition join (which Spark would execute as a broadcast
    nested loop), state bounded by the window sort.
    """
    from pyspark.sql.types import StructField, StructType

    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    # The whole right payload travels as ONE struct: last(ignorenulls)
    # then skips only the left rows' NULL placeholders, never a
    # legitimate NULL field inside a matched right row — and all
    # carried fields always come from the SAME right row.
    r_struct_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    lhs = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_struct_type).alias("_r"),
        *[c for c in left.columns if c not in keys and c != left_ts],
    )
    rhs = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*right_cols).alias("_r"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in keys and c != left_ts
        ],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_rv")
    )
    return carried.filter(F.col("_side") == 1).select(
        *keys,
        F.col("_ts").alias(left_ts),
        *[c for c in left.columns if c not in keys and c != left_ts],
        *[F.col("_rv")[c].alias(c) for c in right_cols],
    )


def interval_join_binned(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Range (interval) join without an equi key: each fact row joins
    every interval with ``start <= ts < end``, executed as an EQUI
    join on time bins instead of the theta join Spark would otherwise
    plan as a broadcast nested loop (or, with neither side small, a
    cartesian).

    Each interval is exploded into the bins it covers (``sequence`` +
    ``explode``), each fact maps to its single bin, both sides
    equi-join on the bin, and the exact range predicate filters the
    boundary bins. A fact's bin is unique and an interval lists each
    covered bin once, so no post-join dedup is needed.

    Scale: shuffle keyed by time bin — pick ``bin_seconds`` near the
    median interval length so interval replication stays O(1) per
    interval while each bin's fan-in stays bounded; hot bins shard
    further under AQE skew-join. This is the standard bin-bucketed
    range-join strategy (same family as Databricks' range-join hints,
    which open-source Spark lacks).
    """
    # Bin in exact integer microseconds. unix_micros needs an LTZ
    # timestamp, and TIMESTAMP_NTZ cannot cast to numeric in Spark 4, so
    # route any timestamp flavor through cast("timestamp") first; plain
    # numeric columns (epoch seconds) pass through unchanged. Floor
    # division = subtract pmod in pure long arithmetic, then divide the
    # exact multiple as decimal(38,0) — no double anywhere, so binning
    # stays exact across the full int64 range (a double quotient would
    # silently misbin values past 2^53 and drop join rows).
    bin_us = int(bin_seconds) * 1_000_000

    def _us(frame: DataFrame, c: str):
        dt = dict(
            (f.name, f.dataType.simpleString()) for f in frame.schema.fields
        ).get(c, "")
        if dt.startswith("timestamp"):
            return F.unix_micros(F.col(c).cast("timestamp"))
        return (F.col(c) * 1_000_000).cast("long")

    def _bin_of(col):
        exact_multiple = (col - F.pmod(col, F.lit(bin_us))).cast("decimal(38,0)")
        return (exact_multiple / F.lit(bin_us)).cast("long")

    # empty intervals match nothing; dropping them up front also keeps
    # sequence() ascending (end > start  =>  last covered bin >= first)
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    first_bin = _bin_of(_us(intervals, start_col))
    # end is EXCLUSIVE: an interval ending exactly on a bin boundary does
    # not cover that bin, hence bin(end - 1us); greatest() pins the
    # never-descends invariant structurally rather than by argument.
    last_bin = F.greatest(first_bin, _bin_of(_us(intervals, end_col) - 1))
    iv = intervals.withColumn("_bin", F.explode(F.sequence(first_bin, last_bin)))
    fx = facts.withColumn("_bin", _bin_of(_us(facts, ts_col)))
    joined = fx.join(iv, "_bin").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("_bin")


def left_join(left: DataFrame, right: DataFrame, keys: list[str]) -> DataFrame:
    """Plain left outer join with null extension (reference J3: the
    choropleth's ``world.merge(df, how="left")``, flask/app.py:233-269
    — kept geo-free per SURVEY). Wrap the right side in
    ``F.broadcast`` at the call site when it is dimension-sized so no
    shuffle of the preserved side is planned."""
    return left.join(right, keys, "left")


def semi_join(left: DataFrame, right: DataFrame, keys: list[str]) -> DataFrame:
    """EXISTS: left rows with at least one key match on the right.
    Spark plans a left-semi hash join (broadcast when right is small);
    right side is deduplicated implicitly — no row multiplication."""
    return left.join(right, keys, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, keys: list[str]) -> DataFrame:
    """NOT EXISTS: left rows with no key match on the right."""
    return left.join(right, keys, "left_anti")


def union_feeds(*feeds: DataFrame) -> DataFrame:
    """Multi-source feed merge by column NAME (§2.7): position-safe,
    missing columns become nulls. Pure narrow op — no shuffle."""
    out = feeds[0]
    for f in feeds[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def top_k(
    df: DataFrame, order_col: str, k: int, tiebreak: str, ascending: bool = False
) -> DataFrame:
    """Deterministic top-k: ORDER BY measure [DESC], tiebreak, LIMIT k.
    Spark executes TakeOrderedAndProject — per-partition heaps of size
    k, then a k-row merge on the driver; no global sort of the data."""
    order = [
        F.col(order_col).asc() if ascending else F.col(order_col).desc(),
        F.col(tiebreak).asc(),
    ]
    return df.orderBy(*order).limit(k)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: replicate the smaller side ``buckets``
    times, salt the big side by a deterministic row hash, join on
    (keys + salt). A hot key's rows then spread across ``buckets``
    shuffle partitions instead of funneling into one straggler task.

    Use when BOTH sides are too large to broadcast and the key
    distribution is heavy-tailed (AQE's skew-join split handles sort-
    merge skew at runtime; explicit salting also covers aggregations
    downstream of the join and engines/paths AQE does not reach).
    Identical results to a plain join for any ``how`` that preserves
    the big side's rows (inner/left).
    """
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    # deterministic row-hash salt: duplicates land together (harmless),
    # every key's rows spread uniformly.
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(buckets)).cast(
            "int"
        ),
    )
    return salted_big.join(salted_small, [*keys, "_salt"], how).drop("_salt")


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "timestamp",
    gap_minutes: int = 60,
    agg_exprs: list | None = None,
) -> DataFrame:
    """Batch sessionization (gaps-and-islands): rows closer than
    ``gap_minutes`` to their predecessor share a session; a session's
    end is last event + gap (matching Structured Streaming's
    ``session_window`` semantics, so batch and stream agree).

    ``agg_exprs`` customizes the per-session aggregates (default: tick
    count + price low/high, matching ``streaming.session_stream``).

    One window pass (lag + running sum) + one aggregation — two
    shuffles on the entity keys total.
    """
    if agg_exprs is None:
        agg_exprs = [
            F.count("*").alias("n_ticks"),
            F.min("price").alias("low"),
            F.max("price").alias("high"),
        ]
    w = Window.partitionBy(*keys).orderBy(ts_col)
    gap = F.expr(f"INTERVAL {gap_minutes} MINUTES")
    # >= not >: streaming session_window spans [t, t+gap) with an
    # EXCLUSIVE end, so an event exactly gap after its predecessor
    # starts a new session — batch must agree for batch === stream.
    # Pure interval arithmetic (ts - lag(ts) >= INTERVAL): valid for
    # both TIMESTAMP and TIMESTAMP_NTZ, unlike a numeric cast which
    # Spark 4 rejects for NTZ (the round-3 fixture-encoding breakage).
    new_session = (
        F.when(F.col(ts_col) - F.lag(ts_col).over(w) >= gap, 1).otherwise(0)
    )
    with_id = df.withColumn(
        "_session_id", F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_id.groupBy(*keys, "_session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            (F.max(ts_col) + gap).alias("session_end"),
            *agg_exprs,
        )
        .drop("_session_id")
    )


def volume_rollup(price: DataFrame) -> DataFrame:
    """ROLLUP (exchange, coin_id): per-coin, per-exchange subtotal and
    grand-total volume in one pass — partial aggregation handles the
    hierarchy; one shuffle."""
    return (
        price.rollup("exchange", "coin_id")
        .agg(F.sum("volume").alias("total_volume"), F.count("*").alias("n_ticks"))
    )


def volume_cube(price: DataFrame) -> DataFrame:
    """CUBE (exchange, day): all four grouping sets — per cell, per
    exchange, per day, grand total — in ONE aggregation (Spark plans an
    Expand of the grouping sets feeding a single partial+final
    hash-agg, so the input is scanned once and shuffled once; four
    separate groupBys would scan and shuffle four times). Completes the
    §2.4 grouping-set family next to [[volume_rollup]].

    total_volume is rounded to 6 decimals: each engine's partial-sum
    order differs, and the subtotal/grand-total cells sum the most rows
    so they drift first."""
    return (
        price.withColumn("day", F.date_trunc("day", F.col("timestamp")))
        .cube("exchange", "day")
        .agg(
            F.round(F.sum("volume"), 6).alias("total_volume"),
            F.count("*").alias("n_ticks"),
        )
    )


def close_pivot(ohlc: DataFrame, exchanges: list[str]) -> DataFrame:
    """Hourly close matrix: one row per candle hour, one column per
    exchange (avg close over that exchange's coins) — the wide/pivoted
    shape the reference builds client-side in pandas for charting.

    The pivot value list is STATIC (caller-supplied): with explicit
    values Spark plans a single pass of conditional aggregates; without
    them it must first run a distinct scan just to discover the columns
    — at 100 TB the dimension values are catalog metadata, never
    inferred from the fact table. Missing (hour, exchange) cells are
    NULL on both engines (avg over an empty filtered set)."""
    return (
        ohlc.groupBy("timestamp")
        .pivot("exchange", exchanges)
        .agg(F.round(F.avg("close"), 6))
    )


def funnel(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel conversion — the product-analytics primitive
    [[user_retention]]'s cohort view doesn't cover: a user counts at
    stage i only with an event of type stages[i] STRICTLY AFTER their
    stage-(i-1) entry time (first-touch semantics: each stage anchors
    at the user's EARLIEST qualifying event, the standard ordered-
    funnel definition).

    Output: one row per stage — (stage_idx, stage, n_users,
    conv_from_prev, conv_from_first), conversions on the 1e-9 grid,
    NULL conv_from_prev at stage 1.

    Plan shape (100 TB): per stage, one type-pruned scan (predicate
    pushes to the fact scan) joined to the previous stage's
    user-anchor table on the user key and min-aggregated — i keyed
    equi-joins that SHRINK monotonically (each stage's anchor table is
    a subset of the previous), then a 3-row ranking window for the
    rates. No windows over the fact table, no driver loops — the
    Python loop here only BUILDS the lazy plan."""
    anchors: list[DataFrame] = []
    prev: DataFrame | None = None
    for st in stages:
        f = events.filter(F.col(type_col) == st)
        if prev is not None:
            f = f.join(
                prev.select(user_col, F.col("t").alias("_prev_t")), user_col
            ).filter(F.col(ts_col) > F.col("_prev_t"))
        cur = f.groupBy(user_col).agg(F.min(ts_col).alias("t"))
        anchors.append(cur)
        prev = cur
    tagged = None
    for i, (st, cur) in enumerate(zip(stages, anchors)):
        part = cur.select(
            F.lit(i + 1).alias("stage_idx"), F.lit(st).alias("stage"), user_col
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    counts = tagged.groupBy("stage_idx", "stage").agg(F.count("*").alias("n_users"))
    w = Window.orderBy("stage_idx").rowsBetween(Window.unboundedPreceding, 0)
    wl = Window.orderBy("stage_idx")
    return (
        counts.withColumn("_prev", F.lag("n_users").over(wl))
        .withColumn("_first", F.first("n_users").over(w))
        .select(
            "stage_idx",
            "stage",
            "n_users",
            F.round(F.col("n_users").cast("double") / F.col("_prev"), 9).alias(
                "conv_from_prev"
            ),
            F.round(F.col("n_users").cast("double") / F.col("_first"), 9).alias(
                "conv_from_first"
            ),
        )
    )


def pricing_summary(
    lineitem: DataFrame, cutoff_days: int = 90, round_decimals: int = 6
) -> DataFrame:
    """The TPC-H Q1 shape — the canonical scan-dominated aggregate every
    warehouse engine anchors on: one pass over the fact table, grouped
    by two low-cardinality flags, eight aggregates with map-side
    partials. Deliberately classic so bench evolution has a stable
    scan-agg anchor next to the domain queries.

    The shipdate cutoff anchors at max(l_shipdate) − cutoff_days (the
    engine's F6 convention: deterministic on any fixture, no wall
    clock). Sum/avg columns round to ``round_decimals`` — engines
    reassociate partial sums. Plan: one scan, one broadcast of the
    1-row cutoff, one grouped exchange on a 2-value key (partial agg
    does nearly all the work map-side)."""
    cutoff = lineitem.agg(
        F.date_sub(F.max("l_shipdate"), cutoff_days).alias("_cutoff")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.crossJoin(F.broadcast(cutoff))
        .filter(F.col("l_shipdate") <= F.col("_cutoff"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), round_decimals).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), round_decimals).alias("sum_base_price"),
            F.round(F.sum(disc_price), round_decimals).alias("sum_disc_price"),
            F.round(F.sum(charge), round_decimals).alias("sum_charge"),
            F.round(F.avg("l_quantity"), round_decimals).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), round_decimals).alias("avg_price"),
            F.round(F.avg("l_discount"), round_decimals).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def activity_reconciliation(price: DataFrame, round_decimals: int = 6) -> DataFrame:
    """Snapshot reconciliation — the FULL OUTER join pattern the engine
    didn't yet exercise (inner/left/semi/anti/asof/range all have
    queries): split the feed at its integer-microsecond midpoint and
    reconcile per-entity activity across the halves. Entities present
    in both halves, only early (delisted), or only late (newly listed)
    each get a status row — the trichotomy only a full outer join
    expresses in one pass.

    Determinism: the midpoint is INTEGER microsecond arithmetic
    ((min+max) div 2 — no float time math); volumes round to the 1e-6
    grid; counts coalesce to 0 on the absent side. Plan: two
    half-filtered aggregates over one scan lineage + a single keyed
    full outer join (both sides shuffle once on the entity key)."""
    bounds = price.agg(
        F.min(F.unix_micros("timestamp")).alias("_lo"),
        F.max(F.unix_micros("timestamp")).alias("_hi"),
    ).select(((F.col("_lo") + F.col("_hi")) / F.lit(2)).cast("long").alias("_mid"))
    t = price.crossJoin(F.broadcast(bounds))
    us = F.unix_micros("timestamp")

    def half(cond, n_name, v_name):
        return (
            t.filter(cond)
            .groupBy("coin_id", "exchange")
            .agg(
                F.count("*").alias(n_name),
                F.round(F.sum("volume"), round_decimals).alias(v_name),
            )
        )

    a = half(us <= F.col("_mid"), "n_ticks_h1", "volume_h1")
    b = half(us > F.col("_mid"), "n_ticks_h2", "volume_h2")
    joined = a.join(b, ["coin_id", "exchange"], "full_outer")
    status = (
        F.when(
            F.col("n_ticks_h1").isNotNull() & F.col("n_ticks_h2").isNotNull(),
            "both",
        )
        .when(F.col("n_ticks_h1").isNotNull(), "first_half_only")
        .otherwise("second_half_only")
    )
    return joined.select(
        "coin_id",
        "exchange",
        F.coalesce("n_ticks_h1", F.lit(0)).alias("n_ticks_h1"),
        F.coalesce("n_ticks_h2", F.lit(0)).alias("n_ticks_h2"),
        F.coalesce("volume_h1", F.lit(0.0)).alias("volume_h1"),
        F.coalesce("volume_h2", F.lit(0.0)).alias("volume_h2"),
        status.alias("status"),
    )


def shipping_priority(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    segment: str = "BUILDING",
    cutoff_days: int = 60,
    k: int = 10,
    round_decimals: int = 6,
) -> DataFrame:
    """The TPC-H Q3 shape — the canonical selective multi-join + top-k:
    one segment of customers, orders placed BEFORE the anchor date,
    lineitems shipped AFTER it, revenue per order, top ``k``. The
    second classic bench anchor next to [[pricing_summary]]'s pure
    scan-agg, exercising join ORDER (customer is the most selective
    side and broadcasts; lineitem never shuffles before its filter) and
    TopK (TakeOrdered — no global sort of the aggregate).

    The anchor date is max(l_shipdate) − cutoff_days (deterministic F6
    convention; the fixture has no o_shippriority column, so
    o_orderpriority carries through in its place). Revenue rounds to
    ``round_decimals`` BEFORE the ordering, with l_orderkey as total-
    order tiebreak, so the top-k frontier cannot flip on partial-sum
    drift."""
    cut = lineitem.agg(
        F.date_sub(F.max("l_shipdate"), cutoff_days).alias("_cut")
    )
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ord_f = (
        orders.crossJoin(F.broadcast(cut))
        .filter(F.col("o_orderdate") < F.col("_cut"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        lineitem.crossJoin(F.broadcast(cut))
        .filter(F.col("l_shipdate") > F.col("_cut"))
        .select(
            "l_orderkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
        )
    )
    agg = (
        li.join(ord_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum("_rev"), round_decimals).alias("revenue"))
    )
    return agg.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(k)


def event_bigrams(
    events: DataFrame,
    k: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Sequential-pattern mining, order 2: corpus-wide counts of
    consecutive per-user event-type transitions (the Markov-chain edge
    table funnels and next-action models start from), top-``k`` with
    deterministic ties. One lag window per user (tiebreak column pins
    tied timestamps — the [[with_obv]] lesson), one pair aggregate,
    one WindowGroupLimit top-k; the pair universe is |types|², so the
    final ranking is dimension-sized regardless of corpus scale."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        events.select(user_col, F.col(type_col).alias("to_type"), ts_col, tiebreak_col)
        .withColumn("from_type", F.lag("to_type").over(w))
        .filter(F.col("from_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    rank_w = Window.orderBy(
        F.desc("n_transitions"), F.asc("from_type"), F.asc("to_type")
    )
    return (
        counts.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("from_type", "to_type", "n_transitions", "rank")
    )


def large_volume_customers(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    qty_threshold: int = 300,
) -> DataFrame:
    """TPC-H Q18 shape — large-volume customers: orders whose summed
    lineitem quantity exceeds ``qty_threshold``, joined back to their
    order and customer rows. The canonical AGGREGATE-AS-JOIN-FILTER
    plan: the only corpus-sized shuffle is the l_orderkey partial-
    combined sum (map-side partials collapse the ~4 rows/order before
    the exchange); the HAVING filter leaves a tiny key set which is
    then BROADCAST through both dimension joins — at 100 TB the
    billions-row lineitem never reaches a join exchange, and orders /
    customer are probed by hash lookup. An unhinted plan would
    sort-merge lineitem against orders; the explicit broadcast of the
    filtered aggregate is the difference between touching terabytes
    and kilobytes in the join stage."""
    qty = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > qty_threshold)
    )
    ords = orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    matched = ords.join(
        F.broadcast(qty), ords.o_orderkey == qty.l_orderkey
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "total_qty")
    return F.broadcast(matched).join(
        customer.select("c_custkey", "c_name"),
        matched.o_custkey == F.col("c_custkey"),
    ).select(
        "c_name", "c_custkey", "o_orderkey", "o_orderdate",
        "o_totalprice", "total_qty",
    )
