"""Technical indicators (SURVEY §2.5, reference spark-streaming.py:164-194).

The reference computes SMA-20 / EMA-20 / RSI-14 / MACD inside one
grouped-map pandas UDF per (coin_id, exchange). Engine design:

- ``with_sma`` / ``with_rsi``: standalone **native window** operators —
  fixed-frame rolling aggregates stay JVM-side in WholeStageCodegen.
  Use these when the EMA family isn't needed (no Python in the plan).
- ``technical_indicators``: the full four-indicator table. The EMA
  recursion (``e_t = a*p_t + (1-a)*e_{t-1}``) is not a fixed window
  frame, so an Arrow hop to pandas is unavoidable; given that, the
  whole table is computed in ONE ``mapInPandas`` pass over
  key-partitioned, time-sorted partitions:

    * one hash shuffle on the entity key, one sort — the same physical
      cost as a single window exec, and strictly less than
      native-windows + a second grouped-map pass;
    * inside the partition, grouped Cython kernels
      (``groupby().rolling/ewm/diff``) vectorize across ALL groups —
      measured ~10x faster than per-group ``applyInPandas`` invocation
      (which pays Python call + frame assembly per tiny group);
    * pandas ``ewm(span, adjust=False)`` / ``rolling(n)`` are the
      reference's own definitions (spark-streaming.py:170-182), so
      parity is by construction.

  At 100 TB: partitions hold whole entity groups (hash repartition on
  the keys); memory per task is bounded by partition size, which
  ``spark.sql.shuffle.partitions`` / AQE size to fit executors. No
  driver-side state, no collects.

Pinned edge-case semantics (FIXTURES.md §C, mirrored in the oracle SQL):
- rolling windows yield NULL until the frame is full (pandas
  ``rolling(n)`` min_periods semantics; reference spark-streaming.py:170).
- the first delta is NaN -> clamps to gain=loss=0 (pandas
  ``where(cond, 0)`` maps NaN to 0; reference :175-176).
- RSI with zero rolling loss -> 100.0 (inf rs in pandas float
  semantics, reference :177-178); zero gain AND zero loss -> NaN ->
  NULL (0/0).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEYS = ("coin_id", "exchange")


def with_sma(df: DataFrame, col: str = "price", n: int = 20, out: str = "sma_20") -> DataFrame:
    """n-row rolling mean, NULL until the window is full (A4/W2).
    Native window function — JVM-side, codegen'd."""
    w = Window.partitionBy(*KEYS).orderBy("timestamp").rowsBetween(-(n - 1), 0)
    return df.withColumn(out, F.when(F.count(col).over(w) == n, F.avg(col).over(w)))


def with_bollinger(
    df: DataFrame,
    col: str = "price",
    n: int = 20,
    k: float = 2.0,
    round_decimals: int = 6,
    order_cols: tuple[str, ...] = ("timestamp",),
) -> DataFrame:
    """Bollinger bands: n-row rolling mean ± k rolling sample stddevs,
    NULL until the window is full (same fill convention as [[with_sma]]).
    The natural next indicator after the reference's SMA/EMA/RSI/MACD
    family (spark-streaming.py:292-316) — pure native window functions,
    one shuffle on the entity keys shared with every other indicator.

    mid and sd are rounded to ``round_decimals`` BEFORE the band
    arithmetic: each engine's incremental variance differs in the last
    ulps, and deriving the bands from the rounded values keeps all
    three columns bit-identical across engines instead of re-drifting.

    ``order_cols``: tick-level callers must pass a deterministic
    tiebreak (e.g. ``("timestamp", "event_id")``) — a row frame over
    tied timestamps is otherwise engine-order-dependent.
    """
    w = Window.partitionBy(*KEYS).orderBy(*order_cols).rowsBetween(-(n - 1), 0)
    full = F.count(col).over(w) == n
    mid = F.when(full, F.round(F.avg(col).over(w), round_decimals))
    sd = F.when(full, F.round(F.stddev_samp(col).over(w), round_decimals))
    return (
        df.withColumn("bb_mid", mid)
        .withColumn("_sd", sd)
        .withColumn("bb_upper", F.round(F.col("bb_mid") + k * F.col("_sd"), round_decimals))
        .withColumn("bb_lower", F.round(F.col("bb_mid") - k * F.col("_sd"), round_decimals))
        .drop("_sd")
    )


def with_atr(
    df: DataFrame,
    n: int = 14,
    round_decimals: int = 6,
    out: str = "atr_14",
) -> DataFrame:
    """Average True Range over OHLC candles: rolling mean of the true
    range — greatest(high-low, |high-prev_close|, |low-prev_close|),
    with TR_1 = high-low for the first candle (standard Wilder
    convention) — NULL until the n-row window fills, matching
    [[with_sma]]. Candle-level sibling of the tick-level indicator
    family; native window functions on the same (coin, exchange) key.
    """
    wo = Window.partitionBy(*KEYS).orderBy("timestamp")
    wn = wo.rowsBetween(-(n - 1), 0)
    prev_close = F.lag("close").over(wo)
    tr = F.when(prev_close.isNull(), F.col("high") - F.col("low")).otherwise(
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - prev_close),
            F.abs(F.col("low") - prev_close),
        )
    )
    with_tr = df.withColumn("_tr", tr)
    return with_tr.withColumn(
        out,
        F.when(
            F.count("_tr").over(wn) == n,
            F.round(F.avg("_tr").over(wn), round_decimals),
        ),
    ).drop("_tr")


def with_obv(
    df: DataFrame,
    round_decimals: int = 6,
    order_cols: tuple[str, ...] = ("timestamp",),
) -> DataFrame:
    """On-balance volume: running sum of volume signed by the tick's
    price direction (first tick contributes 0 — no prior direction).
    One running-sum window on the shared entity key; the cumulative
    frame is evaluated in ``order_cols`` order sequentially by every
    engine, so the rounded prefix sums are reproducible. Tick-level
    callers must pass a deterministic tiebreak (e.g. ``("timestamp",
    "event_id")``) — lag/prefix sums over tied timestamps are
    otherwise engine-order-dependent.
    """
    wo = Window.partitionBy(*KEYS).orderBy(*order_cols)
    delta = F.col("price") - F.lag("price").over(wo)
    signed = (
        F.when(delta > 0, F.col("volume"))
        .when(delta < 0, -F.col("volume"))
        .otherwise(F.lit(0.0))
    )
    run = wo.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(
        "obv", F.round(F.sum(signed).over(run), round_decimals)
    )


def with_stochastic(
    df: DataFrame,
    n: int = 14,
    d_n: int = 3,
    round_decimals: int = 6,
) -> DataFrame:
    """Stochastic oscillator over OHLC candles: %K = 100 * (close −
    lowest low_n) / (highest high_n − lowest low_n), %D = d_n-candle
    rolling mean of %K. NULL until each window fills ([[with_sma]]
    convention) and when the n-candle range is flat (%K undefined).
    %D averages the ROUNDED %K values so both engines see identical
    inputs. Native window functions, shared entity-key shuffle.
    """
    wo = Window.partitionBy(*KEYS).orderBy("timestamp")
    wn = wo.rowsBetween(-(n - 1), 0)
    ll = F.min("low").over(wn)
    hh = F.max("high").over(wn)
    k = F.when(
        (F.count("close").over(wn) == n) & (hh != ll),
        F.round(100.0 * (F.col("close") - ll) / (hh - ll), round_decimals),
    )
    with_k = df.withColumn("stoch_k", k)
    wd = wo.rowsBetween(-(d_n - 1), 0)
    return with_k.withColumn(
        "stoch_d",
        F.when(
            F.count("stoch_k").over(wd) == d_n,
            F.round(F.avg("stoch_k").over(wd), round_decimals),
        ),
    )


def with_donchian(df: DataFrame, n: int = 20, round_decimals: int = 6) -> DataFrame:
    """Donchian channel over OHLC candles: n-candle highest high /
    lowest low and their midline, NULL until the window fills. Upper
    and lower are exact (min/max are order-insensitive); only the
    midline divide is rounded."""
    wn = Window.partitionBy(*KEYS).orderBy("timestamp").rowsBetween(-(n - 1), 0)
    full = F.count("close").over(wn) == n
    upper = F.when(full, F.max("high").over(wn))
    lower = F.when(full, F.min("low").over(wn))
    return (
        df.withColumn("dc_upper", upper)
        .withColumn("dc_lower", lower)
        .withColumn(
            "dc_mid",
            F.round((F.col("dc_upper") + F.col("dc_lower")) / 2.0, round_decimals),
        )
    )


def with_ichimoku(
    df: DataFrame,
    conversion_n: int = 9,
    base_n: int = 26,
    span_b_n: int = 52,
    shift: int = 26,
    round_decimals: int = 6,
) -> DataFrame:
    """Ichimoku cloud over OHLC candles: conversion/base lines are
    midpoints of the rolling high/low range (NULL until each window
    fills, [[with_sma]] convention); the two leading spans are those
    midpoints displaced ``shift`` candles FORWARD (``lag`` — the value
    shown now was computed 26 candles ago) and the lagging span is the
    close displaced backward (``lead``). The only indicator in the set
    that composes rolling extremes with row-displaced series — all
    still native window functions sharing the one entity-key sort.
    NULLs appear wherever the source window or the displacement runs
    off the series edge, exactly as charts draw the cloud."""
    wo = Window.partitionBy(*KEYS).orderBy("timestamp")

    def _mid(n: int):
        wn = wo.rowsBetween(-(n - 1), 0)
        return F.when(
            F.count("close").over(wn) == n,
            F.round((F.max("high").over(wn) + F.min("low").over(wn)) / 2.0,
                    round_decimals),
        )

    out = (
        df.withColumn("tenkan", _mid(conversion_n))
        .withColumn("kijun", _mid(base_n))
        .withColumn("_span_b_src", _mid(span_b_n))
    )
    senkou_a = F.round(
        (F.lag("tenkan", shift).over(wo) + F.lag("kijun", shift).over(wo)) / 2.0,
        round_decimals,
    )
    return (
        out.withColumn("senkou_a", senkou_a)
        .withColumn("senkou_b", F.lag("_span_b_src", shift).over(wo))
        .withColumn("chikou", F.lead("close", shift).over(wo))
        .drop("_span_b_src")
    )


def with_keltner(
    df: DataFrame,
    ema_span: int = 20,
    atr_n: int = 14,
    mult: float = 2.0,
    round_decimals: int = 6,
) -> DataFrame:
    """Keltner channels over OHLC candles: EMA(ema_span) of the typical
    price (high+low+close)/3 as the midline, ± mult·ATR(atr_n) bands —
    the volatility envelope traders read against [[with_bollinger]]
    (ATR-based width vs stddev-based width). Composes the two existing
    primitives: ATR stays a native window ([[with_atr]], rounded to
    ``round_decimals`` exactly as its standalone query), the EMA rides
    the same fused Arrow pass as the indicator table (``with_ema_macd``
    with ATR as a passthrough column — ONE entity-key shuffle total).

    Determinism contract: the midline is published UNROUNDED (like
    ema_20 in ``technical_indicators`` — the closed-form oracle matches
    the recursive evaluation to ~1e-12 relative, and rounding near a
    grid boundary would AMPLIFY that noise to a full grid step); the
    bands are single IEEE ops on the midline and the already-rounded
    ATR, so they inherit the same tolerance. Bands are NULL until the
    ATR window fills ([[with_sma]] fill convention)."""
    base = with_atr(df, n=atr_n, round_decimals=round_decimals, out="_kc_atr")
    base = base.withColumn(
        "_typical", (F.col("high") + F.col("low") + F.col("close")) / 3.0
    )
    ema = with_ema_macd(base, col="_typical", ema_span=ema_span, passthrough=("_kc_atr",))
    return ema.select(
        "coin_id",
        "exchange",
        "timestamp",
        F.col(f"ema_{ema_span}").alias("kc_mid"),
        (F.col(f"ema_{ema_span}") + mult * F.col("_kc_atr")).alias("kc_upper"),
        (F.col(f"ema_{ema_span}") - mult * F.col("_kc_atr")).alias("kc_lower"),
    )


def candlestick_patterns(
    df: DataFrame,
    doji_frac: float = 0.1,
    shadow_mult: float = 2.0,
) -> DataFrame:
    """Classical candlestick pattern flags over OHLC candles — doji,
    hammer, shooting star (single-candle shape tests) and bullish /
    bearish engulfing (two-candle, via one lag on the shared entity-key
    sort). Pure native expressions: one window, no Python, map-side
    after the candle aggregation.

    Cross-engine determinism: every flag is a comparison of single IEEE
    ops ((high-low), |close-open|, shadow lengths, doji_frac·range) on
    candle values that are themselves exact min/max/first/last
    aggregates — no reassociated sums anywhere, so the booleans are
    bit-identical across engines with NO rounding grid needed. The
    two-candle flags coalesce to FALSE on the series head (no prior
    candle ⇒ no engulfing)."""
    wo = Window.partitionBy(*KEYS).orderBy("timestamp")
    o, h, lo, c = F.col("open"), F.col("high"), F.col("low"), F.col("close")
    rng = h - lo
    body = F.abs(c - o)
    upper = h - F.greatest(o, c)
    lower = F.least(o, c) - lo
    po = F.lag("open").over(wo)
    pc = F.lag("close").over(wo)
    return df.select(
        *KEYS,
        "timestamp",
        ((rng > 0) & (body <= doji_frac * rng)).alias("is_doji"),
        ((rng > 0) & (lower >= shadow_mult * body) & (upper <= body)).alias(
            "is_hammer"
        ),
        ((rng > 0) & (upper >= shadow_mult * body) & (lower <= body)).alias(
            "is_shooting_star"
        ),
        F.coalesce(
            (pc < po) & (c > o) & (o <= pc) & (c >= po), F.lit(False)
        ).alias("is_bullish_engulfing"),
        F.coalesce(
            (pc > po) & (c < o) & (o >= pc) & (c <= po), F.lit(False)
        ).alias("is_bearish_engulfing"),
    )


def with_rsi(df: DataFrame, col: str = "price", n: int = 14, out: str = "rsi_14") -> DataFrame:
    """Relative Strength Index over n-row rolling clamped deltas
    (W4/P10/A5/W5). Native window functions throughout."""
    wo = Window.partitionBy(*KEYS).orderBy("timestamp")
    wn = wo.rowsBetween(-(n - 1), 0)
    delta = F.col(col) - F.lag(col, 1).over(wo)
    gain = F.when(delta > 0, delta).otherwise(F.lit(0.0))
    loss = F.when(delta < 0, -delta).otherwise(F.lit(0.0))
    stats = (
        df.withColumn("_rn", F.row_number().over(wo))
        .withColumn("_avg_gain", F.avg(gain).over(wn))
        .withColumn("_avg_loss", F.avg(loss).over(wn))
    )
    rsi = (
        F.when(F.col("_rn") < n, F.lit(None).cast("double"))
        .when((F.col("_avg_loss") == 0) & (F.col("_avg_gain") == 0), F.lit(None).cast("double"))
        .when(F.col("_avg_loss") == 0, F.lit(100.0))
        .otherwise(
            F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + F.col("_avg_gain") / F.col("_avg_loss"))
        )
    )
    return stats.withColumn(out, rsi).drop("_rn", "_avg_gain", "_avg_loss")


def _grouped_series(pdf: pd.DataFrame, keys: list[str], col: str):
    """Grouped accessor preserving input row order (input is sorted by
    keys, so group-concatenated results align positionally)."""
    return pdf.groupby(keys, sort=False, group_keys=False)[col]


def technical_indicators(price: DataFrame) -> DataFrame:
    """Full indicator table (reference DDL spark-streaming.py:92-105):
    (coin_id, exchange, timestamp, sma_20, ema_20, rsi_14, macd).

    Single fused pass: repartition on the entity keys, sort within
    partitions by (keys, time), then one mapInPandas computing all four
    indicators with grouped Cython kernels. Group boundaries never span
    partitions (hash repartition on the full key), and rows arrive
    sorted, so grouped results align positionally with the input.
    """
    keys = list(KEYS)
    part = (
        price.select(*keys, "timestamp", "price")
        .repartition(*keys)
        .sortWithinPartitions(*keys, "timestamp")
    )
    schema = (
        "coin_id string, exchange string, timestamp timestamp, "
        "sma_20 double, ema_20 double, rsi_14 double, macd double"
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        price_g = _grouped_series(pdf, keys, "price")
        pdf["sma_20"] = price_g.rolling(window=20).mean().to_numpy()
        pdf["ema_20"] = price_g.ewm(span=20, adjust=False).mean().to_numpy()
        delta = price_g.diff()
        pdf["_gain"] = delta.where(delta > 0, 0)
        pdf["_loss"] = (-delta).where(delta < 0, 0)
        avg_gain = _grouped_series(pdf, keys, "_gain").rolling(window=14).mean().to_numpy()
        avg_loss = _grouped_series(pdf, keys, "_loss").rolling(window=14).mean().to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            rs = avg_gain / avg_loss
            pdf["rsi_14"] = 100.0 - 100.0 / (1.0 + rs)
        ema_12 = price_g.ewm(span=12, adjust=False).mean().to_numpy()
        ema_26 = price_g.ewm(span=26, adjust=False).mean().to_numpy()
        pdf["macd"] = ema_12 - ema_26
        yield pdf[["coin_id", "exchange", "timestamp", "sma_20", "ema_20", "rsi_14", "macd"]]

    return part.mapInPandas(compute, schema)


def with_ema_macd(
    df: DataFrame,
    col: str = "price",
    ema_span: int = 20,
    macd_spans: tuple[int, int] = (12, 26),
    passthrough: Iterable[str] = (),
) -> DataFrame:
    """Append EMA(span) + MACD(fast,slow) columns to a keyed time-series
    (W3/W6/U1) — same fused mapInPandas mechanism, for callers that
    already computed other columns natively and only need the EMA family.
    """
    keys = list(KEYS)
    passthrough = list(passthrough)
    fast, slow = macd_spans
    ema_col = f"ema_{ema_span}"
    pass_ddl = "".join(
        f"{c} {df.schema[c].dataType.simpleString()}, " for c in passthrough
    )
    schema = (
        "coin_id string, exchange string, timestamp timestamp, "
        + pass_ddl
        + f"{ema_col} double, macd double"
    )
    part = (
        df.select(*keys, "timestamp", col, *[c for c in passthrough if c != col])
        .repartition(*keys)
        .sortWithinPartitions(*keys, "timestamp")
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        price_g = _grouped_series(pdf, keys, col)
        pdf[ema_col] = price_g.ewm(span=ema_span, adjust=False).mean().to_numpy()
        pdf["macd"] = (
            price_g.ewm(span=fast, adjust=False).mean().to_numpy()
            - price_g.ewm(span=slow, adjust=False).mean().to_numpy()
        )
        yield pdf[["coin_id", "exchange", "timestamp", *passthrough, ema_col, "macd"]]

    return part.mapInPandas(compute, schema)


def heikin_ashi(candles: DataFrame) -> DataFrame:
    """Heikin-Ashi smoothed candles — the recursive candle transform
    charting platforms pair with raw OHLC: ha_close = (o+h+l+c)/4,
    ha_open(t) = (ha_open(t-1) + ha_close(t-1))/2 seeded with
    (o1+c1)/2, ha_high/ha_low = extremes over {high/low, ha_open,
    ha_close}. Like the EMA family, the open recursion has no fixed
    window frame, so it rides the same fused ``mapInPandas`` shape as
    [[technical_indicators]] (one entity-key shuffle, grouped Cython
    ewm kernel — alpha=0.5 adjust=False IS this recursion, with the
    seed injected as the first input value).

    Cross-engine determinism: each step is one rounding of
    (prev + x)/2 — multiplying by 0.5 is exact in binary floating
    point, so pandas' (1-α)·prev + α·x and SQL's (prev+x)/2.0 round
    identically and the recursion is bit-stable; the oracle replays it
    with a recursive CTE."""
    keys = list(KEYS)
    part = (
        candles.select(*keys, "timestamp", "open", "high", "low", "close")
        .repartition(*keys)
        .sortWithinPartitions(*keys, "timestamp")
    )
    schema = (
        "coin_id string, exchange string, timestamp timestamp, "
        "ha_open double, ha_high double, ha_low double, ha_close double"
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        pdf["ha_close"] = (pdf["open"] + pdf["high"] + pdf["low"] + pdf["close"]) / 4.0
        g = pdf.groupby(keys, sort=False)
        x = g["ha_close"].shift(1)
        first = g.cumcount() == 0
        seed = (pdf["open"] + pdf["close"]) / 2.0
        x[first] = seed[first]
        pdf["_x"] = x
        pdf["ha_open"] = (
            _grouped_series(pdf, keys, "_x")
            .ewm(alpha=0.5, adjust=False)
            .mean()
            .to_numpy()
        )
        pdf["ha_high"] = pdf[["high", "ha_open", "ha_close"]].max(axis=1)
        pdf["ha_low"] = pdf[["low", "ha_open", "ha_close"]].min(axis=1)
        yield pdf[
            ["coin_id", "exchange", "timestamp", "ha_open", "ha_high", "ha_low", "ha_close"]
        ]

    return part.mapInPandas(compute, schema)
