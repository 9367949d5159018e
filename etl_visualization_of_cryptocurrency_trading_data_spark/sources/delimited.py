"""Delimited-text (CSV) source/sink — the other interchange format
corpora and market-data dumps ship in. Mirrors [[sources/jsonl.py]]'s
design decisions, for the same reasons:

- schema is ENFORCED (no inference scan — a second full pass at 100 TB,
  and CSV inference is the most type-drift-prone of all);
- the file is read as plain ``text`` lines and parsed with ``from_csv``
  with a corrupt field declared INSIDE the schema — malformed lines
  (unclosed quotes, wrong arity, type mismatches) quarantine into an
  ordinary column instead of hitting ``spark.read.csv``'s restricted
  internal ``_corrupt_record`` (which refuses corrupt-only projections
  uncached — breaking quarantine accounting);
- both sides stay pure per-line map work over splittable files: no
  shuffle, and input splits scale with the data. The deliberate
  tradeoff (same as JSONL): fields with EMBEDDED NEWLINES are out of
  scope — ``multiLine`` CSV is unsplittable, one task per file at any
  scale; pipelines that need it should ship JSONL/parquet instead.

Null/empty contract: the writer emits NULL and '' identically (empty
field), so '' columns round-trip as NULL — standard CSV lossiness,
documented rather than papered over; corpora with meaningful empty
strings belong in a typed format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RAW_COL = "_raw_line"
CORRUPT_FIELD = "_corrupt"


def write_csv(df: DataFrame, path: str) -> None:
    """Headerless CSV (header lines poison every split boundary at
    scale — readers would need to know WHICH line of WHICH split is
    decoration; schema travels out of band here, as in production)."""
    df.write.mode("overwrite").csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema,
    drop_corrupt: bool = True,
) -> DataFrame:
    """Schema-enforced CSV read. With ``drop_corrupt`` (default) only
    cleanly-parsed rows survive, as the schema's columns; otherwise
    every line is kept with the parsed struct in ``parsed`` (whose
    ``_corrupt`` field holds the raw text of malformed lines) plus the
    original line in ``_raw_line`` — the quarantine shape."""
    from pyspark.sql.types import StringType, StructType

    if not isinstance(schema, StructType):
        raise TypeError("read_csv requires an explicit StructType schema")
    parse_schema = StructType(schema.fields[:]).add(CORRUPT_FIELD, StringType())
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in parse_schema.fields
    )
    raw = spark.read.text(path).select(F.col("value").alias(RAW_COL))
    parsed = raw.select(
        RAW_COL,
        F.from_csv(
            F.col(RAW_COL),
            ddl,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_FIELD},
        ).alias("parsed"),
    )
    if drop_corrupt:
        return parsed.filter(
            F.col(f"parsed.{CORRUPT_FIELD}").isNull()
        ).select(*[f"parsed.{f.name}" for f in schema.fields])
    return parsed
