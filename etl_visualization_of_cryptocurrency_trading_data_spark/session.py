"""SparkSession factory.

Local-mode defaults are sized for the test harness (local[N], one JVM);
every setting is chosen to also be the right *kind* of setting on a real
multi-executor cluster at 100 TB:

- AQE on (runtime shuffle coalescing, skew-join splitting) so the same
  declarative plans self-tune from sf0.001 fixtures to petabyte tables.
- ``spark.sql.shuffle.partitions`` ~= cores locally; on a cluster this is
  AQE-coalesced upward from ``spark.sql.adaptive.coalescePartitions
  .initialPartitionNum`` instead of hand-tuned.
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle and are deployment-independent.
- Arrow enabled: every pandas hop (applyInPandas for the EMA family) is
  vectorized batch transfer, never per-row pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crypto-analytics-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master``/``shuffle_partitions`` default from env so the same code
    runs under the driver harness (SPARK_GRAFT_CPUS) and on a cluster
    (where ``master`` is supplied by spark-submit and AQE owns the
    partition count).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
