"""Structured-streaming replay harnesses registered as
driver-hash rows (watermarks, session windows, dedup, exactly-once
recovery, stateful drawdown).

Split verbatim from plans/registry.py (r11 verdict item #2); the
facade registry module re-exports every name and asserts the
assembled surface is byte-identical to the pre-split snapshot.
"""

from __future__ import annotations

from ...operators import derive
from .media import _DHASH_CTES
from .serving import (
    COINS_CTE,
    OHLC_CTE,
    PRICE_BASE_SQL,
    PRICE_BASE_TB_SQL,
    PRICE_DATA_CTE,
    _events,
    _price_base,
    _price_base_tb,
    _with,
)

def q_vwap_stream_replay(spark, sf_dir):
    """Driver-checkable STREAMING evidence (pipeline.vwap_stream_replay):
    the watermarked tumbling-VWAP stream replayed to completion over a
    spooled feed; emitted windows must hash-match the batch vwap_hourly
    oracle exactly (batch===stream)."""
    from ...streaming.pipeline import vwap_stream_replay

    return vwap_stream_replay(spark, _price_base(spark, sf_dir))

def q_enrich_stream_replay(spark, sf_dir):
    """Eighth driver-checkable STREAMING path — the STREAM-STATIC
    broadcast lookup join (pipeline.enrich_stream_replay): the spooled
    tick feed left-joins the coins dimension per micro-batch, emitted
    rows hash-match the one-shot batch left join. Stateless join, no
    watermark/sentinel: batch === stream by construction, proven
    engine-to-engine here. The dimension side re-resolves per
    micro-batch in production (a refreshed upsert table is picked up
    between batches without a restart — pipeline.enrich_stream
    docstring), which this replay's plan shape certifies."""
    from pyspark.sql import functions as F

    from ...streaming.pipeline import enrich_stream_replay

    dim = derive.coins(_events(spark, sf_dir)).select(
        F.col("id").alias("coin_id"), "exchange", "name", "symbol"
    )
    return enrich_stream_replay(spark, _price_base(spark, sf_dir), dim)

def q_late_drop_stream_replay(spark, sf_dir):
    """Ninth driver-checkable STREAMING path — watermark late-data
    DROP enforcement (pipeline.late_drop_stream_replay): after the
    full feed drains and its watermark commits, a second drain
    re-delivers price −1e6 copies of the earliest hour's ticks; their
    windows are finalized, so the aggregate must DISCARD them and the
    final frame hash-matches the batch candles of the real feed — a
    leaked late row would crater the first hour's `low` and flip the
    hash. Complements recovery_stream_replay (state CARRIED for open
    windows there, state FINALIZED against late arrivals here) and
    the six close-correctly rows. The fixture feed spans 30 days, far
    past the builder's more-than-one-hour precondition."""
    from ...streaming.pipeline import late_drop_stream_replay

    return late_drop_stream_replay(spark, _price_base(spark, sf_dir))

def q_spread_stream_replay(spark, sf_dir):
    """Fourth driver-checkable streaming path — the STREAM-STREAM join
    (pipeline.spread_stream_replay): view↔click cross-exchange pairs
    within ±30 minutes replayed over a spooled feed; emitted matches
    hash-match the batch theta join (inner joins emit on arrival — no
    sentinel needed, the watermark only bounds state)."""
    from ...streaming.pipeline import spread_stream_replay

    return spread_stream_replay(spark, _price_base(spark, sf_dir))

def q_ohlc_stream_replay(spark, sf_dir):
    """Third driver-checkable STREAMING path
    (pipeline.ohlc_stream_replay): watermarked tumbling candles
    replayed to completion over a spooled feed; emitted candles must
    hash-match the batch ohlc_data SQL exactly — the struct-ordering
    open/close convention is what keeps batch===stream on tied
    timestamps."""
    from ...streaming.pipeline import ohlc_stream_replay

    return ohlc_stream_replay(spark, _price_base(spark, sf_dir))

def q_recovery_stream_replay(spark, sf_dir):
    """Exactly-once failure-recovery replay (verdict r6 item #7;
    pipeline.recovery_stream_replay): the candle drain is killed with
    the midpoint hour still open in watermark state, restarted from
    its checkpoint over the remaining feed + sentinel, and the final
    PARQUET-sink contents must hash-match the uninterrupted batch
    candles — lost state, double emission, or a late-drop across the
    restart each change the frame and flip the hash. Promotes T7 from
    pytest-only to driver-hash-verified like the other six streaming
    rows."""
    from ...streaming.pipeline import recovery_stream_replay

    return recovery_stream_replay(spark, _price_base(spark, sf_dir))

def q_session_stream_replay(spark, sf_dir):
    """Second driver-checkable STREAMING path
    (pipeline.session_stream_replay): event-time session windows
    replayed to completion over a spooled feed; emitted sessions must
    hash-match the batch gaps-and-islands SQL (trading_sessions'
    oracle) exactly — session_window batch===stream, engine-to-engine."""
    from ...streaming.pipeline import session_stream_replay

    return session_stream_replay(spark, _price_base(spark, sf_dir))

def q_restfeed_stream_replay(spark, sf_dir):
    """Fifth driver-checkable STREAMING path — the custom Python
    DataSource's STREAMING face end-to-end
    (pipeline.restfeed_stream_replay): the REST poll loop drained in
    5-minute micro-batches under availableNow through the watermarked
    candle aggregate. No sentinel: the final watermark stops inside
    hour 2, so append mode withholds the open last window — the
    oracle encodes exactly that (closed-form feed + candles for the
    two closed hours). ``sf_dir`` is unused: the source IS the data."""
    from ...streaming.pipeline import restfeed_stream_replay

    return restfeed_stream_replay(spark)

def q_dedup_stream_replay(spark, sf_dir):
    """SIXTH driver-checkable STREAMING path
    (pipeline.dedup_stream_replay), first for the ingestion-dedup
    guard: the spooled feed carries planted exact re-deliveries of
    ~1/7 of the rows in later files, dropDuplicatesWithinWatermark
    runs over the full row with a delay outlasting the replay, and
    the emitted rows must hash-match one batch DISTINCT of the price
    base — a single surviving duplicate (or a falsely dropped
    original) flips the driver hash."""
    from ...streaming.pipeline import dedup_stream_replay

    return dedup_stream_replay(spark, _price_base(spark, sf_dir))

def q_spread_outer_stream_replay(spark, sf_dir):
    """Stream-stream LEFT OUTER join replay
    (pipeline.spread_outer_stream_replay): the watermark's
    null-extension semantic — an unmatched left tick is emitted
    null-extended exactly once, only after the watermark proves no
    future right tick can match. An in-band sentinel pair (reserved
    symbol, both exchanges, +72 h) pushes the final watermark past
    the whole feed so the emitted frame equals the batch LEFT theta
    join exactly; the inner-join face is spread_stream_replay."""
    from ...streaming.pipeline import spread_outer_stream_replay

    return spread_outer_stream_replay(spark, _price_base(spark, sf_dir))

def q_quality_stream_replay(spark, sf_dir):
    """Eleventh driver-checkable STREAMING path — the TRAINED quality
    filter running in the production harness
    (pipeline.quality_stream_replay): frozen train-split weights
    broadcast per micro-batch inside foreachBatch, each document shard
    scored by classifier.score_quality with NO retraining, emitted
    through the epoch-partitioned parquet sink. Per-document scoring
    with a fixed model is batching-invariant, so the emitted rows must
    hash-match the one-shot batch scoring chain (the qc_score oracle
    CTEs) exactly — batch === stream engine-to-engine, completing r12's
    classifier family with the deployment-shaped row (r12 verdict
    item #5)."""
    from pyspark.sql import functions as F

    from ...operators import classifier, sampling
    from ...streaming.pipeline import quality_stream_replay
    from .common import _documents

    docs = _documents(spark, sf_dir)
    train = (
        sampling.train_val_test_split(docs, "doc_id")
        .filter(F.col("split") == "train")
        .drop("split")
    )
    wts = classifier.train_quality_classifier(train)
    return quality_stream_replay(spark, docs, wts)

def q_media_dedup_stream_replay(spark, sf_dir):
    """Twelfth driver-checkable STREAMING path — perceptual media
    dedup running in the ingestion harness
    (pipeline.media_dedup_stream_replay): each arriving image shard is
    dHash-fingerprinted per micro-batch inside foreachBatch (the same
    Arrow-batched map pass as the batch family) and anti-joined
    against the ACCUMULATED fingerprint registry; only first-seen
    fingerprints emit a survivor through the epoch-partitioned
    exactly-once sink. The range-ordered spool pins the streamed
    survivor per fingerprint to the GLOBAL min doc_id, so the emitted
    registry must hash-match the batch rep collapse (the dHash hashes
    CTE + one GROUP BY) exactly — batch === stream for the media
    family; a registry that re-emits a known fingerprint or drops a
    first arrival flips the driver hash (late-r14)."""
    from ...operators import multimodal
    from ...streaming.pipeline import media_dedup_stream_replay
    from .common import _documents

    return media_dedup_stream_replay(
        spark, multimodal.ppm_table(_documents(spark, sf_dir))
    )

def _quality_stream_replay_sql() -> str:
    """Oracle: the shared qclf scores CTE chain (train on the 'train'
    split, score every >= 1-token document) — the same SQL surface the
    batch quality_classifier_scores row replays, projected to the
    replay's emitted columns."""
    from .corpus import _qclf_scores_ctes

    return f"""
WITH {_qclf_scores_ctes()}
SELECT s.doc_id, s.score, s.score >= 0.5 AS predicted
FROM qc_score s"""

def q_drawdown_stream_replay(spark, sf_dir):
    """Custom-stateful streaming replay
    (streaming.pipeline.drawdown_stream_replay → stateful_drawdown):
    running peak / drawdown / tick counter via applyInPandasWithState,
    the tick feed drained in three TIME-ORDERED waves one file per
    micro-batch so per-key state genuinely crosses batch boundaries —
    promotes T5 (custom stateful operators) from pytest-only to a
    driver-hash row. The operator's arithmetic is bit-exact by
    construction (comparison-only peak, one IEEE divide, integer tick
    index), so the oracle is a plain window replay over the same tick
    projection — no rounding pin needed."""
    from ...streaming.pipeline import drawdown_stream_replay

    return drawdown_stream_replay(spark, _price_base_tb(spark, sf_dir))

# DuckDB oracle SQL for this domain's registered queries —
# assembled (registration order restored) into plans.registry.ORACLES.
ORACLE_SQL: dict[str, str] = {
    # the streaming replay emits exactly the batch candles of the real
    # feed (sentinel-advanced watermark), so its oracle is the identical
    # batch ohlc SQL
    "ohlc_stream_replay": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="SELECT coin_id, exchange, timestamp, open, high, low, close FROM ohlc_data",
    ),
    # the kill-and-resume drain must ALSO emit exactly the batch
    # candles — recovery that loses state, re-emits, or late-drops
    # diverges from this same SQL
    "recovery_stream_replay": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="SELECT coin_id, exchange, timestamp, open, high, low, close FROM ohlc_data",
    ),
    # ...and so must the late-drop drain: the sabotage re-deliveries
    # are DROPPED behind the watermark, so the real feed's batch
    # candles are again the exact expectation (a leak craters `low`)
    "late_drop_stream_replay": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="SELECT coin_id, exchange, timestamp, open, high, low, close FROM ohlc_data",
    ),
    # the feed generation of restfeed_ohlc over 180 minutes; the final
    # watermark (last tick 02:59, delay 0) closes only hours 0 and 1 —
    # append mode withholds the open hour-2 window, and the oracle
    # encodes exactly that
    "restfeed_stream_replay": """
WITH coins AS (SELECT unnest(generate_series(0, 19)) AS coin),
mins AS (SELECT unnest(generate_series(0, 179)) AS m),
feed AS (
  SELECT
    (CASE coin % 3 WHEN 0 THEN 'binance' WHEN 1 THEN 'coinbase'
                   ELSE 'kraken' END) || '_R' || coin AS coin_id,
    CASE coin % 3 WHEN 0 THEN 'binance' WHEN 1 THEN 'coinbase'
                  ELSE 'kraken' END AS exchange,
    TIMESTAMP '2024-01-01' + m * INTERVAL 1 MINUTE AS timestamp,
    (10000 + (coin * 9176 + m * 31) % 1000) / 100.0 AS price,
    ((coin * 7 + m * 13) % 500 + 1)::DOUBLE AS volume
  FROM coins, mins
),
candles AS (
  SELECT coin_id, exchange, date_trunc('hour', timestamp) AS timestamp,
         (min({'t': timestamp, 'p': price})).p AS open,
         max(price) AS high,
         min(price) AS low,
         (max({'t': timestamp, 'p': price})).p AS close
  FROM feed
  GROUP BY coin_id, exchange, date_trunc('hour', timestamp)
)
SELECT coin_id, exchange, timestamp, open, high, low, close
FROM candles
WHERE timestamp <= TIMESTAMP '2024-01-01 01:00:00'""",
    # the streaming replay emits exactly the batch VWAP of the real
    # feed (sentinel-advanced watermark; see pipeline.vwap_stream_replay),
    # so its oracle is the identical batch SQL
    "vwap_stream_replay": f"""
SELECT coin_id, exchange, date_trunc('hour', timestamp) AS timestamp,
       CASE WHEN sum(volume) > 0
            THEN round(sum(price * volume) / sum(volume), 6) END AS vwap,
       round(sum(volume), 6) AS total_volume,
       count(*)::BIGINT AS n_ticks
FROM ({PRICE_BASE_SQL}) p
GROUP BY coin_id, exchange, date_trunc('hour', timestamp)""",
    # full-row streaming dedup over a feed with planted re-deliveries
    # emits exactly DISTINCT(feed): copies are bit-identical, so which
    # one survives is unobservable (see pipeline.dedup_stream_replay)
    "dedup_stream_replay": f"""
SELECT DISTINCT coin_id, exchange, timestamp, price, volume
FROM ({PRICE_BASE_SQL}) p""",
    # stream-static enrichment emits exactly the batch LEFT join of
    # feed x coins dim (stateless per-batch lookup; null-extended miss)
    "enrich_stream_replay": f"""
WITH base AS ({PRICE_BASE_SQL}),
{COINS_CTE.strip()}
SELECT b.coin_id, b.exchange, b.timestamp, b.price, b.volume,
       c.name, c.symbol
FROM base b LEFT JOIN coins c
  ON b.coin_id = c.id AND b.exchange = c.exchange""",
    # inner stream-stream join emits exactly the batch theta join; the
    # regexp guard mirrors the engine's empty-symbol drop
    "spread_stream_replay": f"""
WITH base AS ({PRICE_BASE_SQL}),
a AS (
  SELECT regexp_extract(coin_id, '_(C[0-9]+)$', 1) AS symbol,
         timestamp AS ts_a, price AS price_a
  FROM base WHERE exchange = 'view'
    AND regexp_extract(coin_id, '_(C[0-9]+)$', 1) <> ''
),
b AS (
  SELECT regexp_extract(coin_id, '_(C[0-9]+)$', 1) AS symbol,
         timestamp AS ts_b, price AS price_b
  FROM base WHERE exchange = 'click'
    AND regexp_extract(coin_id, '_(C[0-9]+)$', 1) <> ''
)
SELECT a.symbol, ts_a, price_a, ts_b, price_b,
       price_b - price_a AS spread
FROM a JOIN b ON a.symbol = b.symbol
 AND ts_b BETWEEN ts_a - INTERVAL 30 MINUTES
              AND ts_a + INTERVAL 30 MINUTES""",
    "session_stream_replay": f"""
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
    # stream-stream LEFT OUTER replay: batch left theta join — matched
    # pairs per match, unmatched left ticks exactly once, null-extended
    "spread_outer_stream_replay": f"""
WITH base AS ({PRICE_BASE_SQL}),
a AS (
  SELECT regexp_extract(coin_id, '_(C[0-9]+)$', 1) AS symbol,
         timestamp AS ts_a, price AS price_a
  FROM base WHERE exchange = 'view'
    AND regexp_extract(coin_id, '_(C[0-9]+)$', 1) <> ''
),
b AS (
  SELECT regexp_extract(coin_id, '_(C[0-9]+)$', 1) AS symbol,
         timestamp AS ts_b, price AS price_b
  FROM base WHERE exchange = 'click'
    AND regexp_extract(coin_id, '_(C[0-9]+)$', 1) <> ''
)
SELECT a.symbol, ts_a, price_a, ts_b, price_b,
       price_b - price_a AS spread
FROM a LEFT JOIN b ON a.symbol = b.symbol
 AND ts_b BETWEEN ts_a - INTERVAL 30 MINUTES
              AND ts_a + INTERVAL 30 MINUTES""",
    # custom-stateful streaming replay: bit-exact window replay of the
    # running peak / drawdown / tick counter the stateful operator
    # carries across micro-batches — batching must not change anything
    "drawdown_stream_replay": f"""
WITH base AS ({PRICE_BASE_TB_SQL})
SELECT coin_id, exchange, timestamp, event_id, price,
       max(price) OVER w AS running_peak,
       price / max(price) OVER w - 1.0 AS drawdown,
       row_number() OVER (PARTITION BY coin_id, exchange
                          ORDER BY timestamp, event_id) AS tick_n
FROM base
WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    # trained-filter-in-the-stream replay: per-document scoring with a
    # frozen model is batching-invariant, so the emitted union equals
    # the batch qc_score chain exactly
    "quality_stream_replay": _quality_stream_replay_sql(),
    # streaming perceptual-dedup replay: the range-ordered spool pins
    # the streamed first-seen survivor per fingerprint to the global
    # min doc_id, so the emitted registry equals the batch rep
    # collapse of the dHash chain — one GROUP BY over the hash CTEs
    "media_dedup_stream_replay": f"""
WITH {_DHASH_CTES}
SELECT band0, band1, band2, band3, min(doc_id) AS rep_id
FROM hashes GROUP BY 1, 2, 3, 4""",
}
