"""JSONL (newline-delimited JSON) source/sink — the interchange format
LLM corpora actually ship in. Spark's json writer IS line-delimited by
default; the reader here deliberately goes through ``text`` +
``from_json`` rather than ``spark.read.json``:

- schema is ENFORCED (never inference — an inference pass is a second
  full scan at 100 TB and type-drifts on dirty data);
- malformed lines are flagged through a corrupt field declared INSIDE
  the ``from_json`` schema — an ordinary struct column with none of
  the analyzer restrictions of ``spark.read.json``'s internal
  ``_corrupt_record`` (which REFUSES queries referencing only it:
  count() after a corrupt-filter throws unless the relation is cached
  first — breaking exactly the quarantine-accounting pattern a
  pipeline needs);
- both sides stay pure per-line map work over splittable files, no
  shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RAW_COL = "_raw_line"
CORRUPT_FIELD = "_corrupt"


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema,
    drop_corrupt: bool = True,
) -> DataFrame:
    """Schema-enforced JSONL read. With ``drop_corrupt`` (default) only
    cleanly-parsed rows survive, as the schema's columns; otherwise
    every line is kept with the parsed struct in ``parsed`` (whose
    ``_corrupt`` field holds the raw text of malformed lines) plus the
    original line in ``_raw_line`` — the quarantine shape."""
    from pyspark.sql.types import StringType, StructType

    if not isinstance(schema, StructType):
        raise TypeError("read_jsonl requires an explicit StructType schema")
    parse_schema = StructType(schema.fields[:]).add(CORRUPT_FIELD, StringType())
    raw = spark.read.text(path).select(F.col("value").alias(RAW_COL))
    parsed = raw.select(
        RAW_COL,
        F.from_json(
            F.col(RAW_COL),
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_FIELD},
        ).alias("parsed"),
    )
    if drop_corrupt:
        return parsed.filter(
            F.col(f"parsed.{CORRUPT_FIELD}").isNull()
        ).select(*[f"parsed.{f.name}" for f in schema.fields])
    return parsed
