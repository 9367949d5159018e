"""Technical indicators (SURVEY §2.5, reference spark-streaming.py:164-194).

The reference computes SMA-20 / EMA-20 / RSI-14 / MACD inside one
grouped-map pandas UDF per (coin_id, exchange). Spark-first split:

- SMA-20, price delta, RSI-14: **native window functions** — fixed-frame
  rolling aggregates stay JVM-side inside WholeStageCodegen; no Python.
- EMA-20 / MACD (EMA12-EMA26): the exponential recursion
  ``e_t = a*p_t + (1-a)*e_{t-1}`` is not a fixed window frame, so it runs
  as an Arrow-batched ``applyInPandas`` with pandas
  ``ewm(span, adjust=False)`` — bit-identical to the reference's own
  definition (spark-streaming.py:172,180-182).

Both passes partition by the same keys, so Catalyst reuses one hash
shuffle (the window's exchange satisfies the grouped-map distribution).
At 100 TB this is a single shuffle on the entity key; group state is one
pandas frame per entity — bounded by per-entity history, never by total
data volume. For unbounded per-entity history the streaming module
carries (last EMA, last 19 prices, last 14 gains/losses) as explicit
state instead (SURVEY §2.9 T5).

Pinned edge-case semantics (FIXTURES.md §C, mirrored in the oracle SQL):
- rolling windows yield NULL until the frame is full (pandas
  ``rolling(n)`` min_periods semantics; reference spark-streaming.py:170).
- the first delta is NULL -> clamps to gain=loss=0 (pandas
  ``where(cond, 0)`` maps NaN to 0; reference :175-176).
- RSI with zero rolling loss -> 100.0 (inf rs in pandas float semantics,
  reference :177-178); zero gain AND zero loss -> NULL (pandas 0/0 NaN).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEYS = ("coin_id", "exchange")


def with_sma(df: DataFrame, col: str = "price", n: int = 20, out: str = "sma_20") -> DataFrame:
    """n-row rolling mean, NULL until the window is full (A4/W2)."""
    w = (
        Window.partitionBy(*KEYS)
        .orderBy("timestamp")
        .rowsBetween(-(n - 1), 0)
    )
    return df.withColumn(
        out,
        F.when(F.count(col).over(w) == n, F.avg(col).over(w)),
    )


def with_rsi(df: DataFrame, col: str = "price", n: int = 14, out: str = "rsi_14") -> DataFrame:
    """Relative Strength Index over n-row rolling clamped deltas (W4/W5/A5)."""
    wo = Window.partitionBy(*KEYS).orderBy("timestamp")
    wn = wo.rowsBetween(-(n - 1), 0)
    delta = F.col(col) - F.lag(col, 1).over(wo)
    gain = F.when(delta > 0, delta).otherwise(F.lit(0.0))
    loss = F.when(delta < 0, -delta).otherwise(F.lit(0.0))
    stats = df.withColumn("_rn", F.row_number().over(wo)).withColumn(
        "_avg_gain", F.avg(gain).over(wn)
    ).withColumn("_avg_loss", F.avg(loss).over(wn))
    rsi = (
        F.when(F.col("_rn") < n, F.lit(None).cast("double"))
        .when((F.col("_avg_loss") == 0) & (F.col("_avg_gain") == 0), F.lit(None).cast("double"))
        .when(F.col("_avg_loss") == 0, F.lit(100.0))
        .otherwise(
            F.lit(100.0)
            - F.lit(100.0) / (F.lit(1.0) + F.col("_avg_gain") / F.col("_avg_loss"))
        )
    )
    return stats.withColumn(out, rsi).drop("_rn", "_avg_gain", "_avg_loss")


def with_ema_macd(
    df: DataFrame,
    col: str = "price",
    ema_span: int = 20,
    macd_spans: tuple[int, int] = (12, 26),
    passthrough: Iterable[str] = (),
) -> DataFrame:
    """EMA(span) + MACD(fast,slow) via grouped-map pandas (W3/W6/U1).

    Exact pandas ``ewm(adjust=False)`` recursion — the reference's own
    compute (spark-streaming.py:172,180-182) — over an Arrow batch per
    (coin_id, exchange) group.
    """
    passthrough = list(passthrough)
    fast, slow = macd_spans
    out_schema = ", ".join(
        ["coin_id string", "exchange string", "timestamp timestamp"]
        + [f"{c} double" for c in passthrough]
        + ["ema_20 double", "macd double"]
    )
    cols = ["coin_id", "exchange", "timestamp", col, *passthrough]

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("timestamp")
        price = pdf[col]
        pdf["ema_20"] = price.ewm(span=ema_span, adjust=False).mean()
        pdf["macd"] = (
            price.ewm(span=fast, adjust=False).mean()
            - price.ewm(span=slow, adjust=False).mean()
        )
        return pdf[["coin_id", "exchange", "timestamp", *passthrough, "ema_20", "macd"]]

    return df.select(*cols).groupBy(*KEYS).applyInPandas(compute, out_schema)


def technical_indicators(price: DataFrame) -> DataFrame:
    """Full indicator table (reference DDL spark-streaming.py:92-105):
    (coin_id, exchange, timestamp, sma_20, ema_20, rsi_14, macd).

    Native windows compute SMA/RSI, then the grouped-map pass adds the
    EMA family, passing SMA/RSI through so everything lands in one
    DataFrame without a self-join. Both stages hash-partition on the same
    keys -> one shuffle total.
    """
    with_native = with_rsi(with_sma(price))
    return with_ema_macd(with_native, passthrough=["sma_20", "rsi_14"]).select(
        "coin_id", "exchange", "timestamp", "sma_20", "ema_20", "rsi_14", "macd"
    )
