from .pipeline import (  # noqa: F401
    cross_exchange_stream_join,
    dedup_stream,
    dedup_stream_replay,
    drawdown_stream_replay,
    enrich_stream,
    envelope_price_stream,
    ohlc_stream,
    read_envelope_stream,
    read_kafka_stream,
    read_price_stream,
    run_full_pipeline,
    run_ingest,
    session_stream,
    spread_outer_stream_replay,
    stream_ohlc_to_dir,
    vwap_stream,
)
from .stateful import stateful_drawdown, stateful_indicators  # noqa: F401
