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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EPOCH = datetime(2024, 1, 1)
SCHEMA = (
    "coin_id string, exchange string, timestamp timestamp,"
    " price double, volume double"
)
EXCHANGES = ("binance", "coinbase", "kraken")


def _page_rows(page: int, coins_per_page: int, minutes: int):
    """Deterministic 'API response' for one page: ``coins_per_page``
    coins × ``minutes`` one-minute ticks. Integer arithmetic only —
    both engines reproduce every double exactly (small ints are exact
    in binary fp; one division by 100 per value)."""
    for i in range(coins_per_page):
        coin = page * coins_per_page + i
        exchange = EXCHANGES[coin % len(EXCHANGES)]
        coin_id = f"{exchange}_R{coin}"
        for m in range(minutes):
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

    def partitions(self):
        return [InputPartition(p) for p in range(self.pages)]

    def read(self, partition):
        yield from _page_rows(partition.value, self.coins_per_page, self.minutes)


class RestFeedDataSource(DataSource):
    @classmethod
    def name(cls):
        return "cryptofeed"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return RestFeedReader(self.options)


def register(spark) -> None:
    """Idempotent registration; ``spark.read.format('cryptofeed')``
    afterwards."""
    spark.dataSource.register(RestFeedDataSource)
