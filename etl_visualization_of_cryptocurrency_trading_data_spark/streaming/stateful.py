"""Stateful streaming indicators (SURVEY §2.9 T5, fixed properly).

The reference applies its grouped-map indicator UDF to a STREAMING
DataFrame (reference spark-streaming.py:318-319) with no checkpoint and
no cross-batch state: every micro-batch recomputes SMA/EMA/RSI/MACD
over only the rows that happen to be in that batch, so results depend
on batch boundaries. Correct continuous semantics require carrying per
(coin_id, exchange) state across batches — exactly what
``applyInPandasWithState`` provides.

State per key (all O(1) per key, independent of history length):
- ``n``           rows seen
- ``prices``      last 19 prices        (SMA-20 window tail)
- ``gains/losses`` last 13 clamped deltas (RSI-14 window tail)
- ``ema20/12/26`` current EMA values    (the recursion carry)
- ``last_price``  previous price        (delta computation)

The per-row recursion inside a batch is a Python loop — inherent to
EMA's sequential dependence; the loop is per-key-per-batch and the
state bound is constant, so executor memory does not grow with stream
length. Batch-mode ``operators.indicators.technical_indicators`` is the
correctness anchor: feeding the same rows through any batch split
yields identical output (tests/test_streaming.py).

Pinned edge cases match the batch path (FIXTURES.md §C): rolling
windows NULL until full; first delta clamps to gain=loss=0; RSI with
zero loss -> 100.0, zero gain AND zero loss -> NULL.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

STATE_SCHEMA = (
    "n long, prices array<double>, gains array<double>, losses array<double>, "
    "ema20 double, ema12 double, ema26 double, last_price double"
)
OUTPUT_SCHEMA = (
    "coin_id string, exchange string, timestamp timestamp, "
    "sma_20 double, ema_20 double, rsi_14 double, macd double"
)

_A20, _A12, _A26 = 2.0 / 21.0, 2.0 / 13.0, 2.0 / 27.0


def _step(
    state: tuple[Any, ...] | None, price: float
) -> tuple[tuple[Any, ...], tuple[float, float, float, float]]:
    """Advance one row: returns (new_state, (sma, ema, rsi, macd))."""
    if state is None:
        n, prices, gains, losses = 0, [], [], []
        ema20 = ema12 = ema26 = last_price = None
    else:
        n, prices, gains, losses, ema20, ema12, ema26, last_price = state
        prices, gains, losses = list(prices), list(gains), list(losses)
    n += 1
    ema20 = price if ema20 is None else _A20 * price + (1 - _A20) * ema20
    ema12 = price if ema12 is None else _A12 * price + (1 - _A12) * ema12
    ema26 = price if ema26 is None else _A26 * price + (1 - _A26) * ema26
    if last_price is None:
        gain = loss = 0.0  # pandas `where` clamps the first NaN delta to 0
    else:
        delta = price - last_price
        gain, loss = max(delta, 0.0), max(-delta, 0.0)
    prices.append(price)
    gains.append(gain)
    losses.append(loss)
    prices, gains, losses = prices[-20:], gains[-14:], losses[-14:]

    sma = sum(prices) / 20.0 if len(prices) == 20 else math.nan
    if len(gains) == 14:
        ag, al = sum(gains) / 14.0, sum(losses) / 14.0
        if ag == 0.0 and al == 0.0:
            rsi = math.nan
        elif al == 0.0:
            rsi = 100.0
        else:
            rsi = 100.0 - 100.0 / (1.0 + ag / al)
    else:
        rsi = math.nan
    new_state = (n, prices[-19:], gains[-13:], losses[-13:], ema20, ema12, ema26, price)
    return new_state, (sma, ema20, rsi, ema12 - ema26)


def _indicator_func(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    coin_id, exchange = key
    st = state.get if state.exists else None
    out_rows = []
    # Concatenate ALL Arrow chunks before sorting: a large group arrives
    # as multiple chunks whose time-ranges interleave; sorting each
    # chunk alone would feed the sequential recursion out of order.
    chunks = list(pdfs)
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    pdf = pdf.sort_values("timestamp")
    for ts, price in zip(pdf["timestamp"], pdf["price"]):
        st, (sma, ema, rsi, macd) = _step(st, float(price))
        out_rows.append((coin_id, exchange, ts, sma, ema, rsi, macd))
    state.update(st)
    if out_rows:
        yield pd.DataFrame(
            out_rows,
            columns=[
                "coin_id", "exchange", "timestamp",
                "sma_20", "ema_20", "rsi_14", "macd",
            ],
        )


def stateful_indicators(price_stream: DataFrame) -> DataFrame:
    """Continuous SMA-20/EMA-20/RSI-14/MACD over a streaming price feed,
    state carried across micro-batches per (coin_id, exchange)."""
    return price_stream.groupBy("coin_id", "exchange").applyInPandasWithState(
        _indicator_func,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


DD_STATE_SCHEMA = "peak double, n long"
DD_OUTPUT_SCHEMA = (
    "coin_id string, exchange string, timestamp timestamp, event_id long, "
    "price double, running_peak double, drawdown double, tick_n long"
)


def _drawdown_func(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    """Per-key running peak / drawdown / tick counter. Rows are sorted
    by (timestamp, event_id) WITHIN the batch; cross-batch order is the
    caller's contract (time-split spool waves). Arithmetic is chosen to
    be cross-engine bit-exact: the peak update is comparison-only, the
    drawdown is a single IEEE divide + subtract on operands both
    engines read identically from parquet, and the tick index is
    integer — no accumulating float sums whose order could drift."""
    coin_id, exchange = key
    peak, n = (state.get if state.exists else (None, 0))
    chunks = list(pdfs)
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    pdf = pdf.sort_values(["timestamp", "event_id"])
    # Vectorized state update (r7 verdict item #7 — the per-key Python
    # loop dominated wide-batch cost): np.maximum.accumulate + one
    # np.maximum fold of the carried peak equals carrying it forward
    # row by row, so every output double is bit-identical to the
    # sequential form ON REAL PRICES (pinned by the replay's driver
    # hash and the exact 1-wave-vs-4-wave pytest equality). NaN
    # semantics are DELIBERATE (ADVICE r8 offered fmax; rejected): a
    # NaN price PROPAGATES into every later running_peak — exactly
    # what the registered window-max oracle (max(price) OVER w: NaN
    # orders greatest in both Spark and DuckDB) and the batch
    # derive.max_drawdown twin compute, so engine and oracle agree on
    # ANY input. np.fmax would silently skip NaN and diverge from the
    # oracle the first time a NaN entered the feed.
    prices = pdf["price"].to_numpy(dtype=np.float64)
    peaks = np.maximum.accumulate(prices)
    if peak is not None:
        peaks = np.maximum(peaks, peak)
    ticks = n + np.arange(1, prices.size + 1, dtype=np.int64)
    state.update((float(peaks[-1]), int(ticks[-1])))
    yield pd.DataFrame(
        {
            "coin_id": coin_id,
            "exchange": exchange,
            "timestamp": pdf["timestamp"].to_numpy(),
            "event_id": pdf["event_id"].to_numpy(dtype=np.int64),
            "price": prices,
            "running_peak": peaks,
            "drawdown": prices / peaks - 1.0,
            "tick_n": ticks,
        }
    )


def stateful_drawdown(tick_stream: DataFrame) -> DataFrame:
    """Running peak / drawdown-from-peak / tick index over a streaming
    tick feed, state carried across micro-batches per
    (coin_id, exchange) — the custom-stateful twin of the batch
    ``operators.derive`` drawdown windows, built so the whole output is
    CROSS-ENGINE BIT-EXACT (see [[_drawdown_func]]) and therefore
    driver-hash-verifiable against a plain window-function oracle:
    a lost or duplicated state carry shifts ``running_peak`` and
    ``tick_n`` for every later row of the key and flips the hash."""
    return tick_stream.groupBy("coin_id", "exchange").applyInPandasWithState(
        _drawdown_func,
        outputStructType=DD_OUTPUT_SCHEMA,
        stateStructType=DD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
