"""Custom Python DataSource: the reference's REST ticker ingestion
(dags/crypto_data_streaming.py:102-141 polls a paginated HTTP API)
re-expressed as a FIRST-CLASS Spark source instead of driver-side
requests code — Spark 4's Python DataSource API
(``pyspark.sql.datasource``) turns each "API page" into an input
partition, so the fetch parallelizes across executors, composes with
every DataFrame operator, and the planner sees an honest schema.

The sandbox has no network, so the "API" is a deterministic in-process
generator (integer-arithmetic prices — bit-reproducible in any engine,
so the registered query is oracle-exact, not rows-only). The class
split is exactly what a real HTTP-backed source needs: swap
``_page_rows``'s generator for a ``requests.get`` and the partition
planning, schema enforcement, and executor-side batching all stand.

Scale notes: one partition per page keeps fetch parallelism ==
pagination (the REST API's own unit of parallelism); no driver-side
accumulation — rows are yielded lazily from each executor task. A
production variant adds ``pushFilters`` to map coin/time predicates
onto API query parameters (predicate pushdown INTO the service).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EPOCH = datetime(2024, 1, 1)
SCHEMA = (
    "coin_id string, exchange string, timestamp timestamp,"
    " price double, volume double"
)
EXCHANGES = ("binance", "coinbase", "kraken")


def _page_rows(page: int, coins_per_page: int, minutes: int, start_minute: int = 0):
    """Deterministic 'API response' for one page: ``coins_per_page``
    coins × ticks for minutes [start_minute, minutes). Integer
    arithmetic only — both engines reproduce every double exactly
    (small ints are exact in binary fp; one division by 100 per
    value). ``start_minute`` is the streaming reader's slice start, so
    a micro-batch generates exactly its own rows instead of filtering
    a from-zero replay."""
    for i in range(coins_per_page):
        coin = page * coins_per_page + i
        exchange = EXCHANGES[coin % len(EXCHANGES)]
        coin_id = f"{exchange}_R{coin}"
        for m in range(start_minute, minutes):
            cents = 10_000 + ((coin * 9176 + m * 31) % 1_000)
            price = cents / 100.0
            volume = float((coin * 7 + m * 13) % 500 + 1)
            yield (
                coin_id,
                exchange,
                EPOCH + timedelta(minutes=m),
                price,
                volume,
            )


class RestFeedReader(DataSourceReader):
    def __init__(self, options):
        self.pages = int(options.get("pages", "4"))
        self.coins_per_page = int(options.get("coins_per_page", "5"))
        self.minutes = int(options.get("minutes", "120"))
        self._coin_filter: int | None = None

    def partitions(self):
        if self._coin_filter is not None:
            if self._coin_filter < 0:
                return [InputPartition(-1)]
            return [InputPartition(self._coin_filter // self.coins_per_page)]
        return [InputPartition(p) for p in range(self.pages)]

    def read(self, partition):
        if partition.value < 0:
            return
        for row in _page_rows(partition.value, self.coins_per_page, self.minutes):
            if self._coin_filter is not None:
                coin = int(row[0].rsplit("_R", 1)[1])
                if coin != self._coin_filter:
                    continue
            yield row


class RestFeedPushdownReader(RestFeedReader):
    """Opt-in pushdown variant (``option("pushdown", "true")``) —
    separate CLASS, not a flag inside RestFeedReader, because merely
    IMPLEMENTING ``pushFilters`` makes Spark require
    ``spark.sql.python.filterPushdown.enabled``; the default reader
    must stay usable on any stock session (the driver's vanilla config
    runs the registered query)."""

    def pushFilters(self, filters):
        """Source-side predicate pushdown — the API-parameter mapping a
        REST source natively supports (``?coin=...``): a coin_id
        equality is CONSUMED (we fully apply it: partitions prune to
        the one owning page, generation to the one coin); every other
        filter is returned for Spark to apply post-scan. Consuming a
        filter obliges the source to apply it exactly — returning a
        superset is only legal for filters handed back."""
        from pyspark.sql.datasource import EqualTo

        remaining = []
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("coin_id",)
                and isinstance(f.value, str)
                and "_R" in f.value
            ):
                coin = int(f.value.rsplit("_R", 1)[1])
                # only consume if the id round-trips (wrong exchange
                # prefix for this coin number => zero rows, still exact)
                expected = f"{EXCHANGES[coin % len(EXCHANGES)]}_R{coin}"
                if f.value == expected and coin < self.pages * self.coins_per_page:
                    self._coin_filter = coin
                    continue
                self._coin_filter = -1  # impossible id: empty scan
                continue
            remaining.append(f)
        return remaining


class RestFeedStreamReader(SimpleDataSourceStreamReader):
    """The reference's poll LOOP as a streaming source: each micro-batch
    is the next ``batch_minutes`` slice of the feed (the reference
    fetches every 5 minutes — dags/crypto_data_streaming.py:223-246
    schedules exactly this cadence). Offsets are plain minute counters,
    so recovery replays deterministically (``readBetweenOffsets`` is
    exact, not best-effort); the feed caps at ``minutes`` total, after
    which reads report no new data — which is what lets
    ``trigger(availableNow=True)`` drain it to completion in tests."""

    def __init__(self, options):
        self.pages = int(options.get("pages", "4"))
        self.coins_per_page = int(options.get("coins_per_page", "5"))
        self.minutes = int(options.get("minutes", "120"))
        self.batch_minutes = int(options.get("batch_minutes", "5"))

    def initialOffset(self):
        return {"minute": 0}

    def _slice(self, lo: int, hi: int):
        for page in range(self.pages):
            yield from _page_rows(page, self.coins_per_page, hi, start_minute=lo)

    def read(self, start):
        lo = start["minute"]
        hi = min(lo + self.batch_minutes, self.minutes)
        # MATERIALIZED list (simple stream readers buffer driver-side
        # by design; batch_minutes bounds the buffer) wrapped in iter():
        # the runner's prefetch cache REQUIRES an iterator — on the
        # exhausted-feed path (end == start) it probes emptiness with
        # next(it), which raises TypeError on a bare list. That path
        # only runs once a query drains past the feed's cap, so the
        # single-batch tests never hit it; restfeed_stream_replay does.
        return iter(list(self._slice(lo, hi))), {"minute": hi}

    def readBetweenOffsets(self, start, end):
        return list(self._slice(start["minute"], end["minute"]))

    def commit(self, end):
        pass


class RestFeedDataSource(DataSource):
    @classmethod
    def name(cls):
        return "cryptofeed"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        if str(self.options.get("pushdown", "false")).lower() == "true":
            return RestFeedPushdownReader(self.options)
        return RestFeedReader(self.options)

    def simpleStreamReader(self, schema):
        return RestFeedStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration; ``spark.read.format('cryptofeed')`` /
    ``spark.readStream.format('cryptofeed')`` afterwards."""
    spark.dataSource.register(RestFeedDataSource)
