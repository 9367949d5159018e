"""Technical-indicator and market-statistics queries
(SMA/EMA/RSI/MACD family plus Bollinger/ATR/OBV/... and return
statistics) with their DuckDB oracle SQL.

Split verbatim from plans/registry.py (r11 verdict item #2); the
facade registry module re-exports every name and asserts the
assembled surface is byte-identical to the pre-split snapshot.
"""

from __future__ import annotations

from ...operators import derive
from .serving import (
    OHLC_CTE,
    PRICE_BASE_SQL,
    PRICE_BASE_TB_SQL,
    PRICE_DATA_CTE,
    _events,
    _price_base,
    _price_base_tb,
    _with,
    q_ohlc,
)

def q_vwap_hourly(spark, sf_dir):
    """Hourly VWAP per (coin, exchange) — execution-quality benchmark
    next to the OHLC candles (derive.vwap)."""
    return derive.vwap(_price_base(spark, sf_dir))

def q_bollinger_bands(spark, sf_dir):
    """Bollinger bands (SMA-20 ± 2σ), the natural next indicator after
    the reference's SMA/EMA/RSI/MACD family — native window functions
    on the shared (coin, exchange) shuffle."""
    from ...operators.indicators import with_bollinger

    return with_bollinger(
        _price_base_tb(spark, sf_dir), order_cols=("timestamp", "event_id")
    ).select("coin_id", "exchange", "timestamp", "bb_mid", "bb_upper", "bb_lower")

def q_max_drawdown(spark, sf_dir):
    """Per-coin maximum drawdown vs running peak (derive.max_drawdown):
    one running-max window + one aggregation on the shared entity key."""
    return derive.max_drawdown(
        _price_base_tb(spark, sf_dir), order_cols=("timestamp", "event_id")
    )

def q_atr_14(spark, sf_dir):
    """ATR-14 over the hourly candles (indicators.with_atr) — candle-
    level member of the indicator family, Wilder TR convention."""
    from ...operators.indicators import with_atr

    return with_atr(q_ohlc(spark, sf_dir)).select(
        "coin_id", "exchange", "timestamp", "atr_14"
    )

def q_obv(spark, sf_dir):
    """On-balance volume running sum per coin (indicators.with_obv)."""
    from ...operators.indicators import with_obv

    return with_obv(
        _price_base_tb(spark, sf_dir), order_cols=("timestamp", "event_id")
    ).select("coin_id", "exchange", "timestamp", "obv")

def q_stochastic(spark, sf_dir):
    """Stochastic oscillator %K/%D over the hourly candles
    (indicators.with_stochastic)."""
    from ...operators.indicators import with_stochastic

    return with_stochastic(q_ohlc(spark, sf_dir)).select(
        "coin_id", "exchange", "timestamp", "stoch_k", "stoch_d"
    )

def q_donchian(spark, sf_dir):
    """Donchian 20-candle channel (indicators.with_donchian)."""
    from ...operators.indicators import with_donchian

    return with_donchian(q_ohlc(spark, sf_dir)).select(
        "coin_id", "exchange", "timestamp", "dc_upper", "dc_lower", "dc_mid"
    )

def q_ichimoku(spark, sf_dir):
    """Ichimoku cloud over the hourly candles (indicators.with_ichimoku)
    — rolling-extreme midpoints composed with forward/backward row
    displacement."""
    from ...operators.indicators import with_ichimoku

    return with_ichimoku(q_ohlc(spark, sf_dir)).select(
        "coin_id", "exchange", "timestamp",
        "tenkan", "kijun", "senkou_a", "senkou_b", "chikou",
    )

def q_keltner_channels(spark, sf_dir):
    """Keltner channels over the hourly candles
    (indicators.with_keltner): EMA-20 of typical price ± 2·ATR-14 —
    the ATR-width volatility envelope next to bollinger_bands'
    stddev-width one. ATR native-window + EMA on the shared fused
    Arrow pass; oracle replays the closed-form EMA over typical price
    plus the atr_14 oracle's TR construction."""
    from ...operators.indicators import with_keltner

    return with_keltner(q_ohlc(spark, sf_dir))

def q_candlestick_patterns(spark, sf_dir):
    """Candlestick pattern flags over the hourly candles
    (indicators.candlestick_patterns): doji / hammer / shooting star /
    bullish / bearish engulfing as exact booleans — single IEEE-op
    comparisons on exact candle aggregates, deterministic with no
    rounding grid."""
    from ...operators.indicators import candlestick_patterns

    return candlestick_patterns(q_ohlc(spark, sf_dir))

def q_ohlc_daily_rollup(spark, sf_dir):
    """Candle re-aggregation 1h → 1d (derive.ohlc_rollup): open/close
    carried from the boundary SUB-candles via struct min/max — the
    chainable rollup layer coarser chart zooms serve from."""
    return derive.ohlc_rollup(q_ohlc(spark, sf_dir), bucket="day")

def q_lead_lag_corr(spark, sf_dir):
    """Directional lead-lag correlation at 1 day (derive.lead_lag_corr)
    — corr(a(t), b(t-1d)) for ordered top-20 pairs, the asymmetric
    companion to price_correlation. Daily alignment because the
    fixture's ~13-candle hourly series share too few lagged hours
    (hourly lag yields the agreeing-but-empty result both engines
    happily hash-match — checked, not assumed)."""
    return derive.lead_lag_corr(_price_base(spark, sf_dir), bucket="day")

def q_rolling_sharpe(spark, sf_dir):
    """Rolling risk-adjusted return (derive.rolling_sharpe) over a
    6-candle window — sized to the fixture's ~13-candle series so the
    window actually fills (24 would emit all-NULL moments); production
    runs 24+ via the parameter."""
    return derive.rolling_sharpe(q_ohlc(spark, sf_dir), window=6)

def q_market_regime(spark, sf_dir):
    """Volatility-regime labels (derive.market_regime): trailing
    realized vol (6-candle window, fixture-sized like rolling_sharpe)
    vs the coin's own tercile thresholds — calm / normal / turbulent
    per candle."""
    return derive.market_regime(q_ohlc(spark, sf_dir), window=6)

def q_heikin_ashi(spark, sf_dir):
    """Heikin-Ashi smoothed candles (indicators.heikin_ashi): the
    recursive candle transform on the same fused Arrow pass as the EMA
    family; the oracle replays the open recursion with a RECURSIVE CTE
    — each step is one rounding of (prev+x)/2, so the recursion is
    bit-stable across engines."""
    from ...operators.indicators import heikin_ashi

    return heikin_ashi(q_ohlc(spark, sf_dir))

def q_rolling_beta(spark, sf_dir):
    """24-candle rolling market beta per coin (derive.rolling_beta) —
    windowed covariance/variance over hourly returns vs the
    equal-weight market."""
    return derive.rolling_beta(q_ohlc(spark, sf_dir))

def q_cross_exchange_spread(spark, sf_dir):
    """Per-symbol hourly price dispersion across venues
    (derive.cross_exchange_spread) — the arbitrage view."""
    return derive.cross_exchange_spread(q_ohlc(spark, sf_dir))

def q_momentum_ranks(spark, sf_dir):
    """Window-function breadth (SURVEY §2.5 lists rank/dense_rank/
    ntile/lead as absent from the reference): per-exchange momentum
    leaderboard over the latest tick of every coin — rank, dense_rank,
    quartile ntile, and next-coin lead in ONE window pass (single
    shuffle on exchange after the latest-per-group collapse)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ...operators.latest import latest_per_group

    price = derive.price_data(_events(spark, sf_dir))
    latest = latest_per_group(
        price, ["coin_id", "exchange"], tiebreak=["change_1h"]
    ).filter(F.col("change_1h").isNotNull())
    w = Window.partitionBy("exchange").orderBy(F.desc("change_1h"), F.asc("coin_id"))
    return latest.select(
        "exchange",
        "coin_id",
        "change_1h",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lead("coin_id", 1).over(w).alias("next_coin"),
    )

def q_price_correlation(spark, sf_dir):
    """Pairwise Pearson correlation matrix of hourly closes across the
    top-20 coins by volume (upper triangle, >= 5 aligned candles)."""
    return derive.price_correlation(
        _price_base(spark, sf_dir), top_n=20, min_obs=5
    )

def q_price_resample_1h(spark, sf_dir):
    """Gap-filled hourly resample with forward fill
    (derive.resample_ffill): one row per (coin, exchange, hour) from
    first to last tick, carrying the latest tick price at-or-before
    the hour; is_gap marks tickless hours. Tie collapse by event_id
    keeps the carry deterministic."""
    return derive.resample_ffill(derive.tick_base(_events(spark, sf_dir)))

def q_forecast_backtest(spark, sf_dir):
    """Forecast-baseline backtest (derive.forecast_backtest): naive vs
    seasonal-naive walk-forward MAPE per coin — the evaluation harness
    a forecasting layer is judged against, with the verdict on rounded
    values so both engines agree. season=4 (the change_1d lag) because
    the fixture's per-coin series are ~13 ticks — season=24 would
    evaluate nothing."""
    return derive.forecast_backtest(
        derive.tick_base(_events(spark, sf_dir)), season=4
    )

def q_volume_profile(spark, sf_dir):
    """Volume profile (derive.volume_profile): per-coin volume-by-price
    histogram over 20 equal-width bins, explicit-floor binning so
    boundary ticks land identically in both engines."""
    return derive.volume_profile(_price_base(spark, sf_dir))

def q_price_anomalies(spark, sf_dir):
    """Robust per-coin anomaly flags (derive.robust_anomalies): modified
    z-score (median/MAD, Iglewicz-Hoaglin 3.5 cutoff) on the hourly
    change column — the outlier-resistant screen a data-quality layer
    runs before indicators consume the feed."""
    return derive.robust_anomalies(derive.price_data(_events(spark, sf_dir)))

# DuckDB oracle SQL for this domain's registered queries —
# assembled (registration order restored) into plans.registry.ORACLES.
ORACLE_SQL: dict[str, str] = {
    # DuckDB's native ASOF LEFT JOIN is the oracle for the engine's
    # union-and-carry asof implementation; ties collapse via the same
    # event_id struct-max before the fill on both sides.
    "price_resample_1h": f"""
WITH ticks AS ({PRICE_BASE_TB_SQL}),
t AS (
  SELECT coin_id, exchange, timestamp,
         (max({{'e': event_id, 'p': price}})).p AS price
  FROM ticks GROUP BY coin_id, exchange, timestamp
),
h AS (
  SELECT coin_id, exchange, date_trunc('hour', timestamp) AS hour_ts,
         (max({{'t': timestamp, 'p': price}})).t AS tick_ts,
         (max({{'t': timestamp, 'p': price}})).p AS price
  FROM t GROUP BY coin_id, exchange, date_trunc('hour', timestamp)
),
b AS (
  SELECT coin_id, exchange, min(hour_ts) AS lo, max(hour_ts) AS hi
  FROM h GROUP BY coin_id, exchange
),
g AS (
  SELECT coin_id, exchange, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS grid_ts
  FROM b
)
SELECT g.coin_id, g.exchange, g.grid_ts, h.price, h.tick_ts,
       (date_trunc('hour', h.tick_ts) <> g.grid_ts) AS is_gap
FROM g ASOF LEFT JOIN h
  ON g.coin_id = h.coin_id AND g.exchange = h.exchange AND g.grid_ts >= h.hour_ts""",
    "ichimoku": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
  SELECT coin_id, exchange, timestamp, tenkan, kijun,
         round((lag(tenkan, 26) OVER wo + lag(kijun, 26) OVER wo) / 2.0, 6)
           AS senkou_a,
         lag(spanb, 26) OVER wo AS senkou_b,
         lead(close, 26) OVER wo AS chikou
  FROM (
    SELECT coin_id, exchange, timestamp, close,
           CASE WHEN count(close) OVER w9 = 9
                THEN round((max(high) OVER w9 + min(low) OVER w9) / 2.0, 6)
           END AS tenkan,
           CASE WHEN count(close) OVER w26 = 26
                THEN round((max(high) OVER w26 + min(low) OVER w26) / 2.0, 6)
           END AS kijun,
           CASE WHEN count(close) OVER w52 = 52
                THEN round((max(high) OVER w52 + min(low) OVER w52) / 2.0, 6)
           END AS spanb
    FROM ohlc_data
    WINDOW w9 AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                  ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
           w26 AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                   ROWS BETWEEN 25 PRECEDING AND CURRENT ROW),
           w52 AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                   ROWS BETWEEN 51 PRECEDING AND CURRENT ROW))
  WINDOW wo AS (PARTITION BY coin_id, exchange ORDER BY timestamp)""",
    ),
    "rolling_beta": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
  SELECT coin_id, exchange, timestamp,
         CASE WHEN c = 24 AND v > 0 THEN round(cv / v, 6) END AS beta
  FROM (
    SELECT coin_id, exchange, timestamp,
           count(r) OVER wn AS c,
           var_samp(m) OVER wn AS v,
           covar_samp(r, m) OVER wn AS cv
    FROM (
      SELECT rr.coin_id, rr.exchange, rr.timestamp, rr.r, mkt.m
      FROM (
        SELECT coin_id, exchange, timestamp, r FROM (
          SELECT coin_id, exchange, timestamp,
                 CASE WHEN lag(close) OVER w != 0
                      THEN close / lag(close) OVER w - 1.0 END AS r
          FROM ohlc_data
          WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp))
        WHERE r IS NOT NULL) rr
      JOIN (
        SELECT timestamp, round(avg(r), 9) AS m FROM (
          SELECT timestamp, r FROM (
            SELECT coin_id, exchange, timestamp,
                   CASE WHEN lag(close) OVER w != 0
                        THEN close / lag(close) OVER w - 1.0 END AS r
            FROM ohlc_data
            WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp))
          WHERE r IS NOT NULL)
        GROUP BY timestamp) mkt USING (timestamp))
    WINDOW wn AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                  ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))""",
    ),
    "cross_exchange_spread": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
  SELECT 'C' || regexp_extract(coin_id, '_C([0-9]+)$', 1) AS coin_symbol,
         timestamp,
         max(close) AS high_close,
         min(close) AS low_close,
         round(avg(close), 6) AS avg_close,
         count(*)::BIGINT AS n_venues,
         CASE WHEN count(*) >= 2 AND min(close) > 0
              THEN round((max(close) - min(close)) / min(close), 6) END AS spread_pct
  FROM ohlc_data GROUP BY 1, 2""",
    ),
    "obv": f"""
WITH base AS ({PRICE_BASE_TB_SQL}),
s AS (
  SELECT coin_id, exchange, timestamp, event_id, volume,
         price - lag(price) OVER w AS delta
  FROM base
  WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp, event_id)
)
SELECT coin_id, exchange, timestamp,
       round(sum(CASE WHEN delta > 0 THEN volume
                      WHEN delta < 0 THEN -volume ELSE 0.0 END)
             OVER (PARTITION BY coin_id, exchange ORDER BY timestamp, event_id
                   ROWS UNBOUNDED PRECEDING), 6) AS obv
FROM s""",
    "stochastic": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
  SELECT coin_id, exchange, timestamp, stoch_k,
         CASE WHEN count(stoch_k) OVER wd = 3
              THEN round(avg(stoch_k) OVER wd, 6) END AS stoch_d
  FROM (
    SELECT coin_id, exchange, timestamp,
           CASE WHEN c = 14 AND hh != ll
                THEN round(100.0 * (close - ll) / (hh - ll), 6) END AS stoch_k
    FROM (
      SELECT coin_id, exchange, timestamp, close,
             count(close) OVER wn AS c,
             min(low) OVER wn AS ll,
             max(high) OVER wn AS hh
      FROM ohlc_data
      WINDOW wn AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)))
  WINDOW wd AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",
    ),
    "donchian": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
  SELECT coin_id, exchange, timestamp,
         CASE WHEN c = 20 THEN hh END AS dc_upper,
         CASE WHEN c = 20 THEN ll END AS dc_lower,
         CASE WHEN c = 20 THEN round((hh + ll) / 2.0, 6) END AS dc_mid
  FROM (
    SELECT coin_id, exchange, timestamp,
           count(close) OVER wn AS c,
           max(high) OVER wn AS hh,
           min(low) OVER wn AS ll
    FROM ohlc_data
    WINDOW wn AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                  ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))""",
    ),
    "max_drawdown": f"""
WITH base AS ({PRICE_BASE_TB_SQL}),
dd AS (
  SELECT coin_id, exchange, price,
         max(price) OVER (PARTITION BY coin_id, exchange
                          ORDER BY timestamp, event_id
                          ROWS UNBOUNDED PRECEDING) AS peak
  FROM base
)
SELECT coin_id, exchange,
       round(min(CASE WHEN peak != 0 THEN price / peak - 1.0 END), 6) AS max_drawdown,
       max(price) AS peak_price,
       count(*)::BIGINT AS n_ticks
FROM dd GROUP BY coin_id, exchange""",
    "atr_14": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
  SELECT coin_id, exchange, timestamp,
         CASE WHEN c = 14 THEN round(a, 6) END AS atr_14
  FROM (
    SELECT coin_id, exchange, timestamp,
           count(tr) OVER wn AS c, avg(tr) OVER wn AS a
    FROM (
      SELECT coin_id, exchange, timestamp,
             CASE WHEN pc IS NULL THEN high - low
                  ELSE greatest(high - low, abs(high - pc), abs(low - pc)) END AS tr
      FROM (
        SELECT coin_id, exchange, timestamp, high, low,
               lag(close) OVER (PARTITION BY coin_id, exchange
                                ORDER BY timestamp) AS pc
        FROM ohlc_data))
    WINDOW wn AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                  ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))""",
    ),
    "ohlc_daily_rollup": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
, daily AS (
  SELECT coin_id, exchange, date_trunc('day', timestamp) AS day,
         (min({'t': timestamp, 'o': open})).o AS open,
         max(high) AS high, min(low) AS low,
         (max({'t': timestamp, 'c': close})).c AS close
  FROM ohlc_data
  GROUP BY coin_id, exchange, date_trunc('day', timestamp)
)
SELECT coin_id, exchange, day AS timestamp, open, high, low, close
FROM daily""",
    ),
    "lead_lag_corr": f"""
WITH base AS ({PRICE_BASE_SQL}),
top AS (SELECT coin_id FROM base GROUP BY coin_id
        ORDER BY sum(volume) DESC, coin_id LIMIT 20),
daily AS (
  SELECT coin_id, date_trunc('day', timestamp) AS ts,
         (max({{'t': timestamp, 'p': price}})).p AS close
  FROM base JOIN top USING (coin_id)
  GROUP BY coin_id, date_trunc('day', timestamp)
)
SELECT a.coin_id AS coin_a, b.coin_id AS coin_b,
       count(*)::BIGINT AS n_obs,
       round(corr(a.close, b.close), 7) AS lead_corr
FROM daily a JOIN daily b
  ON a.ts = b.ts + INTERVAL 1 DAY AND a.coin_id <> b.coin_id
GROUP BY a.coin_id, b.coin_id
HAVING count(*) >= 5""",
    "rolling_sharpe": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
, r AS (
  SELECT coin_id, exchange, timestamp,
         CASE WHEN lag(close) OVER w <> 0
              THEN close / lag(close) OVER w - 1.0 END AS r
  FROM ohlc_data
  WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp)
),
rr AS (SELECT * FROM r WHERE r IS NOT NULL),
m AS (
  SELECT coin_id, exchange, timestamp,
         CASE WHEN count(r) OVER wn = 6
              THEN round(avg(r) OVER wn, 9) END AS mean_ret,
         CASE WHEN count(r) OVER wn = 6
              THEN round(stddev_samp(r) OVER wn, 9) END AS sd
  FROM rr
  WINDOW wn AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
)
SELECT coin_id, exchange, timestamp, mean_ret,
       CASE WHEN sd > 0 THEN round(mean_ret / sd, 6) END AS sharpe
FROM m""",
    ),
    "market_regime": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
, r AS (
  SELECT coin_id, exchange, timestamp,
         CASE WHEN lag(close) OVER w <> 0
              THEN close / lag(close) OVER w - 1.0 END AS r
  FROM ohlc_data
  WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp)
),
rr AS (SELECT * FROM r WHERE r IS NOT NULL),
v AS (
  SELECT coin_id, exchange, timestamp,
         CASE WHEN count(r) OVER wn = 6
              THEN round(stddev_samp(r) OVER wn, 9) END AS vol
  FROM rr
  WINDOW wn AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
),
vv AS (SELECT * FROM v WHERE vol IS NOT NULL),
th AS (
  SELECT coin_id, exchange,
         round(quantile_cont(vol, 0.33), 9) AS q_low,
         round(quantile_cont(vol, 0.66), 9) AS q_high
  FROM vv GROUP BY coin_id, exchange
)
SELECT vv.coin_id, vv.exchange, vv.timestamp, vv.vol,
       CASE WHEN vol <= q_low THEN 'calm'
            WHEN vol <= q_high THEN 'normal'
            ELSE 'turbulent' END AS regime
FROM vv JOIN th USING (coin_id, exchange)""",
    ),
    # the ha_open recursion replayed exactly: every step is one rounding
    # of (prev+x)/2 (x0.5 is exact in binary fp), so the recursive CTE
    # and the engine's grouped ewm(alpha=0.5) agree bit-for-bit
    "heikin_ashi": f"""
WITH RECURSIVE {PRICE_DATA_CTE.strip()},
{OHLC_CTE.strip()},
c AS (
  SELECT coin_id, exchange, timestamp, open, high, low, close,
         (open + high + low + close) / 4.0 AS ha_close,
         row_number() OVER (PARTITION BY coin_id, exchange
                            ORDER BY timestamp) AS rn
  FROM ohlc_data
),
ha AS (
  SELECT coin_id, exchange, timestamp, high, low, ha_close, rn,
         (open + close) / 2.0 AS ha_open
  FROM c WHERE rn = 1
  UNION ALL
  SELECT c.coin_id, c.exchange, c.timestamp, c.high, c.low, c.ha_close, c.rn,
         (ha.ha_open + ha.ha_close) / 2.0 AS ha_open
  FROM ha JOIN c ON c.coin_id = ha.coin_id AND c.exchange = ha.exchange
               AND c.rn = ha.rn + 1
)
SELECT coin_id, exchange, timestamp, ha_open,
       greatest(high, ha_open, ha_close) AS ha_high,
       least(low, ha_open, ha_close) AS ha_low,
       ha_close
FROM ha""",
    # closed-form EMA over typical price (same identity as
    # INDICATORS_CTE's ema_20) + the atr_14 oracle's TR construction;
    # kc_mid stays unrounded like ema_20 (see with_keltner docstring)
    "keltner_channels": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
, kc0 AS (
  SELECT coin_id, exchange, timestamp,
         (high + low + close) / 3.0 AS typical,
         row_number() OVER wo AS rn,
         first_value((high + low + close) / 3.0) OVER wo AS t0,
         CASE WHEN lag(close) OVER wo IS NULL THEN high - low
              ELSE greatest(high - low, abs(high - lag(close) OVER wo),
                            abs(low - lag(close) OVER wo)) END AS tr
  FROM ohlc_data
  WINDOW wo AS (PARTITION BY coin_id, exchange ORDER BY timestamp)
),
kc1 AS (
  SELECT coin_id, exchange, timestamp,
         power(19.0/21.0, rn-1) * (t0 + (2.0/21.0) * (s - t0)) AS kc_mid,
         atr
  FROM (
    SELECT coin_id, exchange, timestamp, rn, t0,
           sum(typical * power(19.0/21.0, -(rn-1))) OVER ws AS s,
           CASE WHEN count(tr) OVER w14 = 14
                THEN round(avg(tr) OVER w14, 6) END AS atr
    FROM kc0
    WINDOW ws AS (PARTITION BY coin_id, exchange ORDER BY rn
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w14 AS (PARTITION BY coin_id, exchange ORDER BY rn
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
)
SELECT coin_id, exchange, timestamp, kc_mid,
       kc_mid + 2.0 * atr AS kc_upper,
       kc_mid - 2.0 * atr AS kc_lower
FROM kc1""",
    ),
    "candlestick_patterns": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
  SELECT coin_id, exchange, timestamp,
         ((high - low) > 0 AND abs(close - open) <= 0.1 * (high - low)) AS is_doji,
         ((high - low) > 0
          AND (least(open, close) - low) >= 2.0 * abs(close - open)
          AND (high - greatest(open, close)) <= abs(close - open)) AS is_hammer,
         ((high - low) > 0
          AND (high - greatest(open, close)) >= 2.0 * abs(close - open)
          AND (least(open, close) - low) <= abs(close - open)) AS is_shooting_star,
         coalesce(pc < po AND close > open
                  AND open <= pc AND close >= po, FALSE) AS is_bullish_engulfing,
         coalesce(pc > po AND close < open
                  AND open >= pc AND close <= po, FALSE) AS is_bearish_engulfing
  FROM (SELECT *, lag(open) OVER w AS po, lag(close) OVER w AS pc
        FROM ohlc_data
        WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp))""",
    ),
    "vwap_hourly": f"""
SELECT coin_id, exchange, date_trunc('hour', timestamp) AS timestamp,
       CASE WHEN sum(volume) > 0
            THEN round(sum(price * volume) / sum(volume), 6) END AS vwap,
       round(sum(volume), 6) AS total_volume,
       count(*)::BIGINT AS n_ticks
FROM ({PRICE_BASE_SQL}) p
GROUP BY coin_id, exchange, date_trunc('hour', timestamp)""",
    "bollinger_bands": f"""
WITH base AS ({PRICE_BASE_TB_SQL}),
w AS (
  SELECT coin_id, exchange, timestamp,
         count(price) OVER win AS c,
         round(avg(price) OVER win, 6) AS mid,
         round(stddev_samp(price) OVER win, 6) AS sd
  FROM base
  WINDOW win AS (PARTITION BY coin_id, exchange ORDER BY timestamp, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT coin_id, exchange, timestamp,
       CASE WHEN c = 20 THEN mid END AS bb_mid,
       CASE WHEN c = 20 THEN round(mid + 2.0 * sd, 6) END AS bb_upper,
       CASE WHEN c = 20 THEN round(mid - 2.0 * sd, 6) END AS bb_lower
FROM w""",
    "volume_profile": f"""
WITH base AS ({PRICE_BASE_SQL}),
rng AS (
  SELECT coin_id, exchange, min(price) AS mn, max(price) AS mx
  FROM base GROUP BY coin_id, exchange
),
binned AS (
  SELECT b.coin_id, b.exchange, b.price, b.volume, r.mn, r.mx,
         CASE WHEN r.mx > r.mn
              THEN least(19, floor((b.price - r.mn) / (r.mx - r.mn) * 20))::INT
              ELSE 0 END AS bin
  FROM base b JOIN rng r USING (coin_id, exchange)
)
SELECT coin_id, exchange, bin,
       round(sum(volume), 6) AS bin_volume,
       count(*)::BIGINT AS n_ticks,
       round(any_value(mn) + bin * ((any_value(mx) - any_value(mn)) / 20), 6) AS bin_lo,
       round(any_value(mn) + (bin + 1) * ((any_value(mx) - any_value(mn)) / 20), 6) AS bin_hi
FROM binned GROUP BY coin_id, exchange, bin""",
    "forecast_backtest": f"""
WITH ticks AS ({PRICE_BASE_TB_SQL}),
lagged AS (
  SELECT coin_id, exchange, price,
         lag(price, 1)  OVER w AS f_naive,
         lag(price, 4) OVER w AS f_snaive
  FROM ticks
  WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp, event_id)
),
scored AS (
  SELECT * FROM lagged WHERE f_snaive IS NOT NULL AND abs(price) > 0
)
SELECT coin_id, exchange, count(*)::BIGINT AS n_evaluated,
       round(avg(abs(price - f_naive) / abs(price)), 6) AS mape_naive,
       round(avg(abs(price - f_snaive) / abs(price)), 6) AS mape_snaive,
       round(avg(abs(price - f_naive) / abs(price)), 6)
         <= round(avg(abs(price - f_snaive) / abs(price)), 6) AS naive_wins
FROM scored GROUP BY coin_id, exchange""",
    "price_anomalies": _with(
        PRICE_DATA_CTE,
        select="""
, base AS (
  SELECT coin_id, exchange, timestamp, change_1h AS value
  FROM price_data WHERE change_1h IS NOT NULL
),
med AS (
  SELECT coin_id, exchange, quantile_cont(value, 0.5) AS med
  FROM base GROUP BY coin_id, exchange
),
mad AS (
  SELECT b.coin_id, b.exchange,
         quantile_cont(abs(b.value - m.med), 0.5) AS mad
  FROM base b JOIN med m USING (coin_id, exchange)
  GROUP BY b.coin_id, b.exchange
)
SELECT b.coin_id, b.exchange, b.timestamp, b.value,
       CASE WHEN d.mad > 0
            THEN round(0.6745 * (b.value - m.med) / d.mad, 6) END AS robust_z,
       coalesce(CASE WHEN d.mad > 0
            THEN abs(round(0.6745 * (b.value - m.med) / d.mad, 6)) > 3.5 END,
            FALSE) AS is_anomaly
FROM base b JOIN med m USING (coin_id, exchange)
            JOIN mad d USING (coin_id, exchange)""",
    ),
    "price_correlation": f"""
WITH base AS ({PRICE_BASE_SQL}),
top AS (SELECT coin_id FROM base GROUP BY coin_id
        ORDER BY sum(volume) DESC, coin_id LIMIT 20),
candles AS (
  SELECT coin_id, date_trunc('day', timestamp) AS ts,
         (max({{'t': timestamp, 'p': price}})).p AS close
  FROM base JOIN top USING (coin_id)
  GROUP BY coin_id, date_trunc('day', timestamp)
)
SELECT a.coin_id AS coin_a, b.coin_id AS coin_b,
       count(*)::BIGINT AS n_obs,
       round(corr(a.close, b.close), 7) AS correlation
FROM candles a JOIN candles b ON a.ts = b.ts AND a.coin_id < b.coin_id
GROUP BY a.coin_id, b.coin_id
HAVING count(*) >= 5""",
    "momentum_ranks": _with(
        PRICE_DATA_CTE,
        select="""
, latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY coin_id, exchange
                                 ORDER BY timestamp DESC, change_1h DESC) AS lrn
    FROM price_data) WHERE lrn = 1 AND change_1h IS NOT NULL
)
SELECT exchange, coin_id, change_1h,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4)     OVER w AS quartile,
       lead(coin_id, 1) OVER w AS next_coin
FROM latest
WINDOW w AS (PARTITION BY exchange ORDER BY change_1h DESC, coin_id)""",
    ),
}
