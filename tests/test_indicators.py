"""Indicator semantics vs the reference's own pandas definitions
(reference spark-streaming.py:164-188): SMA/EMA/RSI/MACD computed by the
engine must equal a direct pandas rolling/ewm recomputation to 1e-9,
including the pinned edge cases (FIXTURES.md §C)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from etl_visualization_of_cryptocurrency_trading_data_spark.operators.indicators import (
    technical_indicators,
)


def reference_indicators(pdf: pd.DataFrame) -> pd.DataFrame:
    """The reference UDF body, verbatim semantics (spark-streaming.py:164-188)."""
    out = []
    for (coin_id, exchange), g in pdf.groupby(["coin_id", "exchange"]):
        g = g.sort_values("timestamp").copy()
        g["sma_20"] = g["price"].rolling(window=20).mean()
        g["ema_20"] = g["price"].ewm(span=20, adjust=False).mean()
        delta = g["price"].diff()
        gain = delta.where(delta > 0, 0)
        loss = (-delta).where(delta < 0, 0)
        avg_gain = gain.rolling(window=14).mean()
        avg_loss = loss.rolling(window=14).mean()
        rs = avg_gain / avg_loss
        g["rsi_14"] = 100 - (100 / (1 + rs))
        ema_12 = g["price"].ewm(span=12, adjust=False).mean()
        ema_26 = g["price"].ewm(span=26, adjust=False).mean()
        g["macd"] = ema_12 - ema_26
        out.append(g[["coin_id", "exchange", "timestamp", "sma_20", "ema_20", "rsi_14", "macd"]])
    return pd.concat(out, ignore_index=True)


def make_price(spark, rows):
    pdf = pd.DataFrame(rows, columns=["coin_id", "exchange", "timestamp", "price"])
    pdf["timestamp"] = pd.to_datetime(pdf["timestamp"])
    pdf["volume"] = pdf["price"].abs() * 100
    return spark.createDataFrame(pdf)


def series_rows(coin, exch, prices, start="2024-01-01"):
    ts = pd.date_range(start, periods=len(prices), freq="1h")
    return [(coin, exch, t, p) for t, p in zip(ts, prices)]


def check(spark, rows):
    df = make_price(spark, rows)
    got = (
        technical_indicators(df)
        .toPandas()
        .sort_values(["coin_id", "exchange", "timestamp"])
        .reset_index(drop=True)
    )
    want = (
        reference_indicators(df.toPandas())
        .sort_values(["coin_id", "exchange", "timestamp"])
        .reset_index(drop=True)
    )
    for c in ["sma_20", "ema_20", "rsi_14", "macd"]:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        # engine emits NULL where pandas float semantics yield NaN/inf-derived values
        w = np.where(np.isinf(w), np.nan, w)
        assert np.isclose(g, w, rtol=1e-9, atol=1e-12, equal_nan=True).all(), (
            f"{c}:\n{got[c]}\nvs\n{want[c]}"
        )


def test_random_series_matches_pandas(spark):
    rng = np.random.default_rng(7)
    rows = []
    for coin, exch, n in [("a_C1", "a", 60), ("b_C1", "b", 25), ("a_C2", "a", 5)]:
        rows += series_rows(coin, exch, rng.normal(100, 10, n).round(4))
    check(spark, rows)


def test_short_group_all_null_sma_rsi(spark):
    """Groups with <20 (and <14) rows: SMA/RSI all NULL (FIXTURES §C)."""
    rows = series_rows("x_C1", "x", [1.0, 2.0, 3.0])
    check(spark, rows)


def test_monotonic_rises_rsi_100(spark):
    """Strictly rising prices → zero rolling loss → RSI 100 (FIXTURES §C)."""
    prices = list(np.linspace(1, 50, 40))
    check(spark, series_rows("up_C1", "up", prices))


def test_constant_prices_rsi_null(spark):
    """Constant prices → 0/0 → pandas NaN → engine NULL."""
    check(spark, series_rows("flat_C1", "flat", [5.0] * 30))


def test_falling_prices_rsi_0(spark):
    prices = list(np.linspace(50, 1, 40))
    check(spark, series_rows("dn_C1", "dn", prices))


def test_with_ema_macd_span_naming_and_passthrough_types(spark):
    """ema_span controls the output column name; non-double passthrough
    columns keep their types."""
    from etl_visualization_of_cryptocurrency_trading_data_spark.operators.indicators import (
        with_ema_macd,
    )

    import pyspark.sql.functions as F

    rows = series_rows("a_C1", "a", [1.0, 2.0, 3.0, 4.0])
    df = make_price(spark, rows).withColumn("n_trades", F.lit(5).cast("long"))
    out = with_ema_macd(df, ema_span=50, passthrough=["n_trades"])
    assert "ema_50" in out.columns and "ema_20" not in out.columns
    assert dict(out.dtypes)["n_trades"] == "bigint"
    got = out.orderBy("timestamp").toPandas()
    want = pd.Series([1.0, 2.0, 3.0, 4.0]).ewm(span=50, adjust=False).mean()
    assert np.allclose(got["ema_50"], want)


@pytest.mark.parametrize("n", [1, 14, 19, 20, 21])
def test_boundary_lengths(spark, n):
    rng = np.random.default_rng(n)
    check(spark, series_rows("b_C1", "b", rng.uniform(1, 9, n).round(3)))


def test_bollinger_bands_fill_and_values(spark):
    """NULL until the 20-row window fills; bands symmetric around the
    rolling mean at k rolling sample stddevs (pandas ground truth)."""
    from etl_visualization_of_cryptocurrency_trading_data_spark.operators.indicators import (
        with_bollinger,
    )

    rng = np.random.default_rng(7)
    prices = rng.uniform(1, 9, 25).round(3)
    df = make_price(spark, series_rows("bb_C1", "bb", prices))
    got = with_bollinger(df).orderBy("timestamp").toPandas()
    s = pd.Series(prices)
    mid = s.rolling(20).mean().round(6)
    sd = s.rolling(20).std(ddof=1).round(6)
    assert got["bb_mid"][:19].isna().all()
    assert got["bb_upper"][:19].isna().all()
    assert np.allclose(got["bb_mid"][19:], mid[19:])
    assert np.allclose(got["bb_upper"][19:], (mid + 2 * sd).round(6)[19:])
    assert np.allclose(got["bb_lower"][19:], (mid - 2 * sd).round(6)[19:])


def test_vwap_weighted_mean_and_zero_volume(spark):
    """VWAP is the volume-weighted mean within each hour bucket, and
    NULL when the bucket's volume sums to zero."""
    from etl_visualization_of_cryptocurrency_trading_data_spark.operators.derive import vwap

    pdf = pd.DataFrame(
        {
            "coin_id": ["c_C1"] * 3 + ["z_C2"],
            "exchange": ["c"] * 3 + ["z"],
            "timestamp": pd.to_datetime(
                ["2024-01-01 10:05", "2024-01-01 10:40", "2024-01-01 11:10",
                 "2024-01-01 10:20"]
            ),
            "price": [10.0, 20.0, 7.0, 5.0],
            "volume": [1.0, 3.0, 2.0, 0.0],
        }
    )
    rows = {
        (r.coin_id, r.timestamp.hour): (r.vwap, r.total_volume, r.n_ticks)
        for r in vwap(spark.createDataFrame(pdf)).collect()
    }
    assert rows[("c_C1", 10)] == (round((10 * 1 + 20 * 3) / 4, 6), 4.0, 2)
    assert rows[("c_C1", 11)] == (7.0, 2.0, 1)
    assert rows[("z_C2", 10)] == (None, 0.0, 1)


def test_atr_wilder_convention_and_fill(spark):
    """TR_1 = high-low (no prev close); later TRs take the greatest of
    the three ranges; NULL until 14 candles; pandas ground truth."""
    from etl_visualization_of_cryptocurrency_trading_data_spark.operators.indicators import (
        with_atr,
    )

    rng = np.random.default_rng(11)
    n = 18
    close = rng.uniform(5, 15, n).round(3)
    high = (close + rng.uniform(0, 2, n)).round(3)
    low = (close - rng.uniform(0, 2, n)).round(3)
    pdf = pd.DataFrame(
        {
            "coin_id": "a_C1",
            "exchange": "a",
            "timestamp": pd.date_range("2024-01-01", periods=n, freq="1h"),
            "high": high,
            "low": low,
            "close": close,
        }
    )
    got = with_atr(spark.createDataFrame(pdf)).orderBy("timestamp").toPandas()
    pc = pd.Series(close).shift(1)
    tr = pd.concat(
        [pd.Series(high) - low, (high - pc).abs(), (pd.Series(low) - pc).abs()],
        axis=1,
    ).max(axis=1)
    tr.iloc[0] = high[0] - low[0]
    want = tr.rolling(14).mean().round(6)
    assert got["atr_14"][:13].isna().all()
    assert np.allclose(got["atr_14"][13:], want[13:])


def test_max_drawdown_running_peak(spark):
    """Drawdown measured against the running (not global) peak, and the
    zero-peak guard yields NULL-free results on an all-positive series."""
    from etl_visualization_of_cryptocurrency_trading_data_spark.operators.derive import (
        max_drawdown,
    )

    prices = [10.0, 8.0, 12.0, 6.0, 9.0]  # worst: 6/12 - 1 = -0.5
    pdf = pd.DataFrame(
        {
            "coin_id": "a_C1",
            "exchange": "a",
            "timestamp": pd.date_range("2024-01-01", periods=5, freq="1h"),
            "price": prices,
        }
    )
    r = max_drawdown(spark.createDataFrame(pdf)).collect()[0]
    assert r.max_drawdown == -0.5
    assert r.peak_price == 12.0 and r.n_ticks == 5


def test_obv_signed_cumulative(spark):
    """OBV accumulates +volume on up-ticks, -volume on down-ticks, 0 on
    flat/first ticks."""
    from etl_visualization_of_cryptocurrency_trading_data_spark.operators.indicators import (
        with_obv,
    )

    pdf = pd.DataFrame(
        {
            "coin_id": "o_C1",
            "exchange": "o",
            "timestamp": pd.date_range("2024-01-01", periods=5, freq="1h"),
            "price": [10.0, 12.0, 12.0, 9.0, 11.0],
            "volume": [100.0, 200.0, 50.0, 300.0, 150.0],
        }
    )
    got = [r.obv for r in with_obv(spark.createDataFrame(pdf)).orderBy("timestamp").collect()]
    assert got == [0.0, 200.0, 200.0, -100.0, 50.0]


def test_stochastic_and_donchian_ground_truth(spark):
    """%K/%D and the Donchian channel against pandas rolling windows."""
    from etl_visualization_of_cryptocurrency_trading_data_spark.operators.indicators import (
        with_donchian,
        with_stochastic,
    )

    rng = np.random.default_rng(13)
    n = 26
    close = rng.uniform(5, 15, n).round(3)
    high = (close + rng.uniform(0.1, 2, n)).round(3)
    low = (close - rng.uniform(0.1, 2, n)).round(3)
    pdf = pd.DataFrame(
        {
            "coin_id": "s_C1",
            "exchange": "s",
            "timestamp": pd.date_range("2024-01-01", periods=n, freq="1h"),
            "high": high,
            "low": low,
            "close": close,
        }
    )
    sdf = spark.createDataFrame(pdf)
    stoch = with_stochastic(sdf).orderBy("timestamp").toPandas()
    ll = pd.Series(low).rolling(14).min()
    hh = pd.Series(high).rolling(14).max()
    k = (100.0 * (close - ll) / (hh - ll)).round(6)
    d = k.rolling(3).mean().round(6)
    assert stoch["stoch_k"][:13].isna().all()
    assert np.allclose(stoch["stoch_k"][13:], k[13:])
    assert stoch["stoch_d"][:15].isna().all()
    assert np.allclose(stoch["stoch_d"][15:], d[15:])
    don = with_donchian(sdf).orderBy("timestamp").toPandas()
    up = pd.Series(high).rolling(20).max()
    lo = pd.Series(low).rolling(20).min()
    assert don["dc_upper"][:19].isna().all()
    assert np.allclose(don["dc_upper"][19:], up[19:])
    assert np.allclose(don["dc_lower"][19:], lo[19:])
    assert np.allclose(don["dc_mid"][19:], ((up + lo) / 2).round(6)[19:])


def test_rolling_beta_ground_truth(spark):
    """Beta against numpy covariance/variance over a hand-built
    two-coin market (each coin's market = mean of both returns)."""
    from etl_visualization_of_cryptocurrency_trading_data_spark.operators.derive import (
        rolling_beta,
    )

    rng = np.random.default_rng(17)
    n = 30
    ts = pd.date_range("2024-01-01", periods=n, freq="1h")
    closes = {"a_C1": rng.uniform(5, 15, n), "b_C1": rng.uniform(5, 15, n)}
    pdf = pd.concat(
        pd.DataFrame(
            {"coin_id": cid, "exchange": cid[0], "timestamp": ts, "close": c}
        )
        for cid, c in closes.items()
    )
    got = rolling_beta(spark.createDataFrame(pdf), window=10).toPandas()
    ra = pd.Series(closes["a_C1"]).pct_change().dropna().to_numpy()
    rb = pd.Series(closes["b_C1"]).pct_change().dropna().to_numpy()
    m = np.round((ra + rb) / 2, 9)
    # trailing 10-sample beta for coin a at the final return row
    wa, wm = ra[-10:], m[-10:]
    want = np.cov(wa, wm, ddof=1)[0, 1] / np.var(wm, ddof=1)
    last_a = (
        got[got.coin_id == "a_C1"].sort_values("timestamp")["beta"].iloc[-1]
    )
    assert abs(last_a - round(want, 6)) < 1e-9
    # first window-1 return rows have NULL beta
    first = got[got.coin_id == "a_C1"].sort_values("timestamp")["beta"]
    assert first[:9].isna().all()


def test_cross_exchange_spread_venues(spark):
    """Spread across venues sharing a symbol; single-venue hours and
    non-positive floors yield NULL spread."""
    from etl_visualization_of_cryptocurrency_trading_data_spark.operators.derive import (
        cross_exchange_spread,
    )

    t = pd.Timestamp("2024-01-01 10:00")
    pdf = pd.DataFrame(
        [
            ("view_C1", "view", t, 10.0),
            ("click_C1", "click", t, 12.0),
            ("view_C2", "view", t, 5.0),           # single venue
            ("view_C3", "view", t, -1.0),          # negative floor
            ("click_C3", "click", t, 2.0),
        ],
        columns=["coin_id", "exchange", "timestamp", "close"],
    )
    rows = {r.coin_symbol: r for r in cross_exchange_spread(spark.createDataFrame(pdf)).collect()}
    assert rows["C1"].spread_pct == 0.2 and rows["C1"].n_venues == 2
    assert rows["C2"].spread_pct is None and rows["C2"].n_venues == 1
    assert rows["C3"].spread_pct is None  # low_close <= 0
    assert rows["C3"].high_close == 2.0 and rows["C3"].low_close == -1.0


def test_ichimoku_midpoints_and_shifts(spark):
    """Conversion/base midpoints against pandas rolling extremes, and
    the leading/lagging spans displaced exactly `shift` rows."""
    from etl_visualization_of_cryptocurrency_trading_data_spark.operators.indicators import (
        with_ichimoku,
    )

    rng = np.random.default_rng(19)
    n = 40
    close = rng.uniform(5, 15, n).round(3)
    high = (close + rng.uniform(0.1, 2, n)).round(3)
    low = (close - rng.uniform(0.1, 2, n)).round(3)
    pdf = pd.DataFrame(
        {
            "coin_id": "i_C1",
            "exchange": "i",
            "timestamp": pd.date_range("2024-01-01", periods=n, freq="1h"),
            "high": high,
            "low": low,
            "close": close,
        }
    )
    got = (
        with_ichimoku(pdf.pipe(spark.createDataFrame), shift=5)
        .orderBy("timestamp")
        .toPandas()
    )
    tenkan = (
        (pd.Series(high).rolling(9).max() + pd.Series(low).rolling(9).min()) / 2
    ).round(6)
    kijun = (
        (pd.Series(high).rolling(26).max() + pd.Series(low).rolling(26).min()) / 2
    ).round(6)
    assert got["tenkan"][:8].isna().all()
    assert np.allclose(got["tenkan"][8:], tenkan[8:])
    assert got["kijun"][:25].isna().all()
    assert np.allclose(got["kijun"][25:], kijun[25:])
    # spans displaced 5 rows forward; chikou 5 backward
    senkou_a = ((tenkan + kijun) / 2).round(6).shift(5)
    valid = senkou_a.notna()
    assert np.allclose(got["senkou_a"][valid], senkou_a[valid])
    assert np.allclose(got["chikou"][: n - 5], close[5:])
    assert got["chikou"][n - 5 :].isna().all()


def test_robust_anomalies_flags_outlier(spark):
    """Median/MAD modified z-score: a single 10x spike flags while the
    surrounding ticks stay clean (a mean/stddev screen would mask the
    spike with itself); a constant series yields NULL z and FALSE (no
    MAD=0 division)."""
    import datetime as dt

    from etl_visualization_of_cryptocurrency_trading_data_spark.operators import derive

    T = lambda i: dt.datetime(2024, 1, 1, 0, i)  # noqa: E731
    rows = [("c1", "x", T(i), 0.01 * ((-1) ** i)) for i in range(10)]
    rows.append(("c1", "x", T(10), 5.0))              # the spike
    rows += [("c2", "x", T(i), 0.02) for i in range(5)]  # constant
    df = spark.createDataFrame(
        rows, "coin_id string, exchange string, timestamp timestamp, change_1h double"
    )
    out = derive.robust_anomalies(df).collect()
    spikes = [r for r in out if r.is_anomaly]
    assert len(spikes) == 1 and spikes[0].value == 5.0
    c2 = [r for r in out if r.coin_id == "c2"]
    assert all(r.robust_z is None and r.is_anomaly is False for r in c2)


def test_forecast_backtest_hand_built(spark):
    """MAPE arithmetic against hand-computed values: a rising series
    where the naive forecast is always 1 behind and the seasonal(2)
    forecast always 2 behind — naive must win; zero-price ticks are
    excluded from the evaluation."""
    import datetime as dt

    from etl_visualization_of_cryptocurrency_trading_data_spark.operators import derive

    T = lambda i: dt.datetime(2024, 1, 1, 0, i)  # noqa: E731
    prices = [10.0, 11.0, 12.0, 13.0, 14.0]
    rows = [("c1", "x", T(i), p, i) for i, p in enumerate(prices)]
    df = spark.createDataFrame(
        rows, "coin_id string, exchange string, timestamp timestamp, price double, event_id long"
    )
    out = derive.forecast_backtest(df, season=2).collect()[0]
    evald = prices[2:]
    mape_n = sum(abs(p - prices[i + 1]) / p for i, p in enumerate(evald)) / 3
    mape_s = sum(abs(p - prices[i]) / p for i, p in enumerate(evald)) / 3
    assert out.n_evaluated == 3
    assert out.mape_naive == round(mape_n, 6)
    assert out.mape_snaive == round(mape_s, 6)
    assert out.naive_wins


def test_volume_profile_hand_built(spark):
    """Binning arithmetic against hand-computed bins: boundary ticks
    (price == max) land in the LAST bin, volumes accumulate per bin,
    edges tile [min, max], and a constant-price entity collapses to
    bin 0."""
    import datetime as dt

    from etl_visualization_of_cryptocurrency_trading_data_spark.operators import derive

    T = dt.datetime(2024, 1, 1)
    rows = [
        ("c1", "x", T, 0.0, 10.0),
        ("c1", "x", T, 50.0, 20.0),
        ("c1", "x", T, 100.0, 30.0),   # == max -> last bin, not bin 20
        ("c2", "x", T, 7.0, 5.0),
        ("c2", "x", T, 7.0, 5.0),      # constant price -> single bin 0
    ]
    df = spark.createDataFrame(
        rows, "coin_id string, exchange string, timestamp timestamp, price double, volume double"
    )
    out = {(r.coin_id, r.bin): r for r in derive.volume_profile(df, bins=20).collect()}
    assert set(out) == {("c1", 0), ("c1", 10), ("c1", 19), ("c2", 0)}
    assert out[("c1", 0)].bin_volume == 10.0 and out[("c1", 0)].bin_lo == 0.0
    assert out[("c1", 10)].bin_volume == 20.0
    assert out[("c1", 19)].bin_volume == 30.0 and out[("c1", 19)].bin_hi == 100.0
    assert out[("c2", 0)].bin_volume == 10.0 and out[("c2", 0)].n_ticks == 2


def _candles(spark, rows):
    """rows: (coin, exch, ts, open, high, low, close)."""
    return spark.createDataFrame(
        rows,
        "coin_id string, exchange string, timestamp timestamp, "
        "open double, high double, low double, close double",
    )


def test_keltner_matches_pandas_recomputation(spark):
    """kc_mid must equal pandas ewm(span=20, adjust=False) of the
    typical price; bands = mid ± 2·ATR(14) with the ATR rounded to 6
    exactly as with_atr publishes it; bands NULL until the ATR window
    fills."""
    import datetime as dt

    import numpy as np
    import pandas as pd

    from etl_visualization_of_cryptocurrency_trading_data_spark.operators.indicators import (
        with_keltner,
    )

    rng = np.random.default_rng(7)
    n = 40
    close = 100 + np.cumsum(rng.normal(0, 1, n))
    high = close + rng.uniform(0.1, 2.0, n)
    low = close - rng.uniform(0.1, 2.0, n)
    open_ = (high + low) / 2
    ts = [dt.datetime(2024, 1, 1) + dt.timedelta(hours=i) for i in range(n)]
    rows = [
        ("c1", "x", ts[i], float(open_[i]), float(high[i]), float(low[i]), float(close[i]))
        for i in range(n)
    ]
    got = (
        with_keltner(_candles(spark, rows))
        .toPandas()
        .sort_values("timestamp")
        .reset_index(drop=True)
    )
    typical = pd.Series((high + low + close) / 3)
    want_mid = typical.ewm(span=20, adjust=False).mean()
    assert np.allclose(got["kc_mid"], want_mid, rtol=1e-9)
    # ATR recomputation (Wilder TR, first TR = high-low), rounded to 6
    pc = pd.Series(close).shift(1)
    tr = pd.concat(
        [pd.Series(high - low), (pd.Series(high) - pc).abs(), (pd.Series(low) - pc).abs()],
        axis=1,
    ).max(axis=1)
    tr.iloc[0] = high[0] - low[0]
    atr = tr.rolling(14).mean().round(6)
    assert got["kc_upper"].isna().sum() == 13 and got["kc_lower"].isna().sum() == 13
    w = ~got["kc_upper"].isna()
    assert np.allclose(got.loc[w, "kc_upper"], (want_mid + 2 * atr)[w.to_numpy()], rtol=1e-9)
    assert np.allclose(got.loc[w, "kc_lower"], (want_mid - 2 * atr)[w.to_numpy()], rtol=1e-9)


def test_candlestick_patterns_hand_built(spark):
    """One handcrafted candle per pattern (and a fat bullish candle
    matching nothing): flags fire exactly where constructed."""
    import datetime as dt

    from etl_visualization_of_cryptocurrency_trading_data_spark.operators.indicators import (
        candlestick_patterns,
    )

    T = dt.datetime(2024, 1, 1)
    H = dt.timedelta(hours=1)
    rows = [
        # doji: tiny body inside a wide range
        ("doji", "x", T, 100.0, 105.0, 95.0, 100.5),
        # hammer: long lower shadow, no upper shadow
        ("ham", "x", T, 100.0, 100.0, 90.0, 99.0),
        # shooting star: long upper shadow, no lower shadow
        ("star", "x", T, 100.0, 110.0, 99.0, 99.0),
        # plain fat candle: body spans the whole range
        ("plain", "x", T, 90.0, 100.0, 90.0, 100.0),
        # engulfing pairs: small bearish then big bullish (and inverse)
        ("bull", "x", T, 100.0, 101.0, 98.0, 99.0),
        ("bull", "x", T + H, 98.5, 102.0, 98.0, 101.0),
        ("bear", "x", T, 99.0, 101.0, 98.0, 100.0),
        ("bear", "x", T + H, 100.5, 101.0, 97.0, 98.0),
    ]
    out = {
        (r.coin_id, r.timestamp): r
        for r in candlestick_patterns(_candles(spark, rows)).collect()
    }
    assert out[("doji", T)].is_doji and not out[("plain", T)].is_doji
    assert out[("ham", T)].is_hammer and not out[("ham", T)].is_shooting_star
    assert out[("star", T)].is_shooting_star and not out[("star", T)].is_hammer
    r_bull = out[("bull", T + H)]
    assert r_bull.is_bullish_engulfing and not r_bull.is_bearish_engulfing
    r_bear = out[("bear", T + H)]
    assert r_bear.is_bearish_engulfing and not r_bear.is_bullish_engulfing
    # series heads coalesce to FALSE, never NULL
    assert out[("bull", T)].is_bullish_engulfing is False
    assert not any(
        v is None
        for r in out.values()
        for v in (r.is_doji, r.is_hammer, r.is_shooting_star,
                  r.is_bullish_engulfing, r.is_bearish_engulfing)
    )


def test_scd2_volume_tiers_hand_built(spark):
    """Gaps-and-islands collapse on a handcrafted two-coin history:
    tier flips create separate validity ranges, consecutive same-tier
    days merge, valid_to is exclusive (+1 day), and is_current marks
    exactly each coin's last run."""
    import datetime as dt

    from etl_visualization_of_cryptocurrency_trading_data_spark.operators import derive

    D = dt.datetime(2024, 1, 1)

    def day(i, hour=0):
        return D + dt.timedelta(days=i, hours=hour)

    # two coins, two tiers: big dominates days 0-1, small dominates day 2
    rows = [
        ("big", "x", day(0), 1.0, 100.0), ("big", "x", day(0, 1), 1.0, 100.0),
        ("small", "x", day(0), 1.0, 1.0),
        ("big", "x", day(1), 1.0, 100.0),
        ("small", "x", day(1), 1.0, 1.0),
        ("big", "x", day(2), 1.0, 1.0),
        ("small", "x", day(2), 1.0, 100.0),
    ]
    df = spark.createDataFrame(
        rows,
        "coin_id string, exchange string, timestamp timestamp, price double, volume double",
    )
    out = derive.scd2_volume_tiers(df, tiers=2).collect()
    by_key = {(r.coin_id, r.valid_from): r for r in out}
    # big: tier 1 for days 0-1 (one collapsed run), tier 2 on day 2
    r = by_key[("big", day(0))]
    assert r.tier == 1 and r.n_days == 2 and r.valid_to == day(2) and not r.is_current
    r = by_key[("big", day(2))]
    assert r.tier == 2 and r.n_days == 1 and r.valid_to == day(3) and r.is_current
    # small: the mirror image
    r = by_key[("small", day(0))]
    assert r.tier == 2 and r.n_days == 2 and not r.is_current
    r = by_key[("small", day(2))]
    assert r.tier == 1 and r.is_current
    # every coin has exactly one current run
    assert sum(1 for r in out if r.is_current) == 2


def test_heikin_ashi_matches_hand_recursion(spark):
    """ha_open must follow the exact recursion (seeded (o1+c1)/2, then
    (prev_open+prev_close)/2) per group independently; highs/lows are
    elementwise extremes over {raw extreme, ha_open, ha_close}."""
    import datetime as dt

    from etl_visualization_of_cryptocurrency_trading_data_spark.operators.indicators import (
        heikin_ashi,
    )

    T = dt.datetime(2024, 1, 1)
    H = dt.timedelta(hours=1)
    rows = [
        ("c1", "x", T + 0 * H, 10.0, 12.0, 9.0, 11.0),
        ("c1", "x", T + 1 * H, 11.0, 14.0, 10.0, 13.0),
        ("c1", "x", T + 2 * H, 13.0, 13.5, 11.0, 11.5),
        ("c2", "x", T + 0 * H, 100.0, 101.0, 99.0, 100.5),
    ]
    out = {
        (r.coin_id, r.timestamp): r
        for r in heikin_ashi(_candles(spark, rows)).collect()
    }

    def ha_close(o, h, lo, c):
        return (o + h + lo + c) / 4.0

    hc = [ha_close(*r[3:]) for r in rows[:3]]
    ho = [(10.0 + 11.0) / 2.0]
    ho.append((ho[0] + hc[0]) / 2.0)
    ho.append((ho[1] + hc[1]) / 2.0)
    for i in range(3):
        r = out[("c1", T + i * H)]
        assert r.ha_open == ho[i] and r.ha_close == hc[i]
        assert r.ha_high == max(rows[i][4], ho[i], hc[i])
        assert r.ha_low == min(rows[i][5], ho[i], hc[i])
    # second group re-seeds independently
    assert out[("c2", T)].ha_open == (100.0 + 100.5) / 2.0


def test_funnel_strictly_after_semantics(spark):
    """A user whose click PRECEDES their first view does not convert;
    in-order users flow through; rates derive from the stage counts."""
    import datetime as dt

    from etl_visualization_of_cryptocurrency_trading_data_spark.operators.relational import (
        funnel,
    )

    T = dt.datetime(2024, 1, 1)

    def ev(u, t, typ):
        return (1000 + u * 10 + t, typ, u, T + dt.timedelta(hours=t), 1.0)

    rows = [
        # u1: view -> click -> purchase (full funnel)
        ev(1, 0, "view"), ev(1, 1, "click"), ev(1, 2, "purchase"),
        # u2: click BEFORE view -> stuck at view
        ev(2, 0, "click"), ev(2, 1, "view"),
        # u3: view -> click, no purchase
        ev(3, 0, "view"), ev(3, 5, "click"),
        # u4: purchase only -> never enters
        ev(4, 0, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long, ts timestamp, value double"
    )
    out = {r.stage_idx: r for r in funnel(df).collect()}
    assert out[1].n_users == 3 and out[1].conv_from_prev is None
    assert out[2].n_users == 2 and out[2].conv_from_prev == round(2 / 3, 9)
    assert out[3].n_users == 1 and out[3].conv_from_first == round(1 / 3, 9)


def test_lead_lag_corr_detects_perfect_lead(spark):
    """Coin b's daily close copied one day later by coin a ⇒
    corr(a(t), b(t-1)) = 1.0 in the (a, b) orientation; the reverse
    orientation sees a different (weaker) alignment — the asymmetry
    that distinguishes this from price_correlation."""
    import datetime as dt

    from etl_visualization_of_cryptocurrency_trading_data_spark.operators import derive

    D = dt.datetime(2024, 1, 1)
    b_closes = [10.0, 12.0, 11.0, 15.0, 13.0, 17.0, 16.0, 20.0]
    rows = []
    for i, c in enumerate(b_closes):
        rows.append(("ex_b", "x", D + dt.timedelta(days=i, hours=1), c, 1.0))
        # a copies b with a one-day delay (plus one leading filler day)
        rows.append(("ex_a", "x", D + dt.timedelta(days=i + 1, hours=2),
                     c, 1.0))
    rows.append(("ex_a", "x", D + dt.timedelta(hours=2), 99.0, 1.0))
    df = spark.createDataFrame(
        rows,
        "coin_id string, exchange string, timestamp timestamp, price double, volume double",
    )
    out = {(r.coin_a, r.coin_b): r for r in derive.lead_lag_corr(df, top_n=5).collect()}
    assert out[("ex_a", "ex_b")].lead_corr == 1.0
    assert out[("ex_a", "ex_b")].n_obs == len(b_closes)
    assert out[("ex_b", "ex_a")].lead_corr != 1.0


def test_rolling_sharpe_flat_vol_is_null(spark):
    """Constant returns ⇒ zero stddev ⇒ sharpe NULL (not inf); a
    hand-checked window value on varying returns."""
    import datetime as dt

    from etl_visualization_of_cryptocurrency_trading_data_spark.operators import derive

    T = dt.datetime(2024, 1, 1)
    closes = [100.0] + [100.0 * (1.1 ** (i + 1)) for i in range(6)]  # constant +10%
    rows = [
        ("c1", "x", T + dt.timedelta(hours=i), c, c, c, c)
        for i, c in enumerate(closes)
    ]
    df = spark.createDataFrame(
        rows,
        "coin_id string, exchange string, timestamp timestamp, "
        "open double, high double, low double, close double",
    )
    out = derive.rolling_sharpe(df, window=6).collect()
    filled = [r for r in out if r.mean_ret is not None]
    assert len(filled) == 1
    assert filled[0].mean_ret == round(0.1, 9) or abs(filled[0].mean_ret - 0.1) < 1e-9
    assert filled[0].sharpe is None  # sd == 0


def test_market_regime_separates_vol_levels(spark):
    """A low-vol stretch then a high-vol stretch: the rolled-vol
    terciles must label at least one candle calm and one turbulent,
    and every vol at/below q_low is calm."""
    import datetime as dt

    import numpy as np

    from etl_visualization_of_cryptocurrency_trading_data_spark.operators import derive

    rng = np.random.default_rng(3)
    T = dt.datetime(2024, 1, 1)
    rets = np.concatenate([rng.normal(0, 0.001, 12), rng.normal(0, 0.05, 12)])
    closes = 100 * np.cumprod(1 + rets)
    rows = [
        ("c1", "x", T + dt.timedelta(hours=i), float(c), float(c), float(c), float(c))
        for i, c in enumerate(closes)
    ]
    df = spark.createDataFrame(
        rows,
        "coin_id string, exchange string, timestamp timestamp, "
        "open double, high double, low double, close double",
    )
    out = derive.market_regime(df, window=6).collect()
    labels = {r.regime for r in out}
    assert {"calm", "turbulent"} <= labels
    vols = sorted(r.vol for r in out)
    calm_max = max(r.vol for r in out if r.regime == "calm")
    turb_min = min(r.vol for r in out if r.regime == "turbulent")
    assert calm_max < turb_min


def test_volume_percentile_and_grouping_sets(spark):
    """percent_rank spans [0, 1] by rounded volume within each
    exchange; GROUPING SETS emits exactly the three requested slices
    with the ANSI grouping_id bit per rolled-up column."""
    import datetime as dt

    from etl_visualization_of_cryptocurrency_trading_data_spark.operators import derive

    T = dt.datetime(2024, 1, 1)
    rows = [
        ("a", "x", T, 1.0, 10.0),
        ("b", "x", T, 1.0, 20.0),
        ("c", "x", T + dt.timedelta(days=1), 1.0, 30.0),
        ("d", "y", T, 1.0, 5.0),
    ]
    df = spark.createDataFrame(
        rows,
        "coin_id string, exchange string, timestamp timestamp, price double, volume double",
    )
    pct = {(r.exchange, r.coin_id): r for r in derive.coin_volume_percentile(df).collect()}
    assert pct[("x", "a")].vol_percent_rank == 0.0
    assert pct[("x", "c")].vol_percent_rank == 1.0
    assert pct[("y", "d")].vol_percent_rank == 0.0  # singleton group
    assert pct[("x", "b")].vol_cume_dist == round(2 / 3, 10) or abs(
        pct[("x", "b")].vol_cume_dist - 2 / 3
    ) < 1e-12

    gs = derive.volume_grouping_sets(df).collect()
    by_id = {}
    for r in gs:
        by_id.setdefault(r.grouping_id, []).append(r)
    # (exchange) slice: day rolled up -> bit 0 set
    assert {r.exchange for r in by_id[1]} == {"x", "y"}
    assert all(r.day is None for r in by_id[1])
    # (day) slice: exchange rolled up -> bit 1 set
    assert len(by_id[2]) == 2 and all(r.exchange is None for r in by_id[2])
    # grand total
    assert len(by_id[3]) == 1 and by_id[3][0].n_ticks == 4
    assert set(by_id) == {1, 2, 3}


def test_ohlc_daily_rollup_boundary_semantics(spark):
    """The daily open must be the FIRST hour's open and the close the
    LAST hour's close — not extremes of the opens/closes — while
    high/low are plain extremes across sub-candles."""
    import datetime as dt

    from etl_visualization_of_cryptocurrency_trading_data_spark.operators import derive

    T = dt.datetime(2024, 1, 1)
    H = dt.timedelta(hours=1)
    rows = [
        # hour 0: open 50 (daily open), close 60
        ("c1", "x", T + 0 * H, 50.0, 61.0, 49.0, 60.0),
        # hour 5: the day's high and low
        ("c1", "x", T + 5 * H, 60.0, 99.0, 10.0, 55.0),
        # hour 23: close 42 (daily close)
        ("c1", "x", T + 23 * H, 55.0, 56.0, 41.0, 42.0),
        # next day
        ("c1", "x", T + 25 * H, 42.0, 43.0, 41.0, 43.0),
    ]
    out = {
        r.timestamp: r
        for r in derive.ohlc_rollup(_candles(spark, rows), bucket="day").collect()
    }
    d0 = out[T]
    assert (d0.open, d0.high, d0.low, d0.close) == (50.0, 99.0, 10.0, 42.0)
    d1 = out[T + dt.timedelta(days=1)]
    assert (d1.open, d1.close) == (42.0, 43.0)
