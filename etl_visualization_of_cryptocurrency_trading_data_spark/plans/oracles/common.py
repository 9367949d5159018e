"""Shared fixture loaders used by builders across domains.

Split verbatim from plans/registry.py (r11 verdict item #2); the
facade registry module re-exports every name and asserts the
assembled surface is byte-identical to the pre-split snapshot.
"""

from __future__ import annotations

from ...catalog import load_table
from pyspark.sql import DataFrame, SparkSession

def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")

