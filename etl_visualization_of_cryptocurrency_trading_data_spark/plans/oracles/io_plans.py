"""Source/sink round-trips (ORC/JSONL/CSV) and the REST-feed
Python DataSource scan.

Split verbatim from plans/registry.py (r11 verdict item #2); the
facade registry module re-exports every name and asserts the
assembled surface is byte-identical to the pre-split snapshot.
"""

from __future__ import annotations

from ...operators import derive
from .common import _documents

def q_orc_roundtrip(spark, sf_dir):
    """ORC source/sink evidence: the documents table written as ORC
    (Spark's other built-in columnar format — the interchange answer
    when the downstream stack is Hive/Trino-flavored) and read back
    under the enforced schema; survivors must hash-match the source
    table (oracle = plain SELECT). Predicate pushdown and column
    pruning work on ORC scans exactly as on parquet."""
    import tempfile

    docs = _documents(spark, sf_dir).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    path = tempfile.mkdtemp(prefix="orc_rt_")
    docs.write.mode("overwrite").orc(path)
    return spark.read.schema(docs.schema).orc(path)

def q_restfeed_ohlc(spark, sf_dir):
    """Custom Python DataSource evidence (sources.restfeed): the
    reference's paginated REST ticker ingestion as a first-class Spark
    source — one input partition per API page, executor-side row
    generation, honest schema — composed straight into the hourly
    candle aggregate. The feed is deterministic integer arithmetic, so
    the oracle replays generation + candles closed-form in SQL
    (``sf_dir`` is unused: the source IS the data)."""
    from ...sources import restfeed

    restfeed.register(spark)
    feed = (
        spark.read.format("cryptofeed")
        .option("pages", 4)
        .option("coins_per_page", 5)
        .option("minutes", 120)
        .load()
    )
    return derive.ohlc_data(feed)

def q_jsonl_roundtrip(spark, sf_dir):
    """JSONL source/sink evidence (sources.jsonl): the documents table
    written as newline-delimited JSON, a hand-corrupted line appended,
    then read back under the ENFORCED schema in PERMISSIVE mode — the
    corrupt line drops instead of killing the read, and the surviving
    rows must hash-match the original table exactly (oracle = plain
    SELECT). The write+read runs at build time (side-effect query,
    like the streaming replays)."""
    import os
    import tempfile

    from ...sources import jsonl

    docs = _documents(spark, sf_dir).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    path = tempfile.mkdtemp(prefix="jsonl_rt_")
    jsonl.write_jsonl(docs, path)
    with open(os.path.join(path, "zz_corrupt.json"), "w") as f:
        f.write('{"doc_id": not valid json\n')
    return jsonl.read_jsonl(spark, path, docs.schema)

def q_csv_roundtrip(spark, sf_dir):
    """CSV source/sink evidence (sources.delimited): the documents
    table written headerless-CSV, a hand-corrupted line (unclosed
    quote) appended, then read back under the ENFORCED schema — the
    corrupt line quarantines and drops, and the survivors must
    hash-match the original table exactly (oracle = plain SELECT).
    Write+read runs at build time, like jsonl_roundtrip."""
    import os
    import tempfile

    from ...sources import delimited

    docs = _documents(spark, sf_dir).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    path = tempfile.mkdtemp(prefix="csv_rt_")
    delimited.write_csv(docs, path)
    with open(os.path.join(path, "zz_corrupt.csv"), "w") as f:
        f.write('999999,"unclosed quote,xx,yy,12\n')
    return delimited.read_csv(spark, path, docs.schema)

# DuckDB oracle SQL for this domain's registered queries —
# assembled (registration order restored) into plans.registry.ORACLES.
ORACLE_SQL: dict[str, str] = {
    "restfeed_ohlc": """
WITH coins AS (SELECT unnest(generate_series(0, 19)) AS coin),
mins AS (SELECT unnest(generate_series(0, 119)) AS m),
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
)
SELECT coin_id, exchange, date_trunc('hour', timestamp) AS timestamp,
       (min({'t': timestamp, 'p': price})).p AS open,
       max(price) AS high,
       min(price) AS low,
       (max({'t': timestamp, 'p': price})).p AS close
FROM feed
GROUP BY coin_id, exchange, date_trunc('hour', timestamp)""",
    "jsonl_roundtrip": "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "csv_roundtrip": "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "orc_roundtrip": "SELECT doc_id, text, lang, source, n_chars FROM documents",
}
