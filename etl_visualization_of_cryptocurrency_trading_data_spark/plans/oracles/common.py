"""Shared fixture loaders and cross-domain SQL literal constants.

Split verbatim from plans/registry.py (r11 verdict item #2); the
facade registry module re-exports every name and asserts the
assembled surface is byte-identical to the pre-split snapshot.

The literal families below consolidate the split-CASE and
quality-battery SQL that used to be copy-pasted across the corpus /
dedup / text oracle modules (r12 verdict item #2, NOTES_r12 §7.6).
ONE definition per family; call sites parameterize only the id/column
expression. Any engine-vs-oracle divergence in these semantics flips
the covering driver rows red, so the constants are the single point a
deliberate semantics change would edit.
"""

from __future__ import annotations

from ...catalog import load_table
from pyspark.sql import DataFrame, SparkSession

def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# md5-bucket dataset split (sampling.train_val_test_split's oracle twin):
# bucket = first-8-hex md5('split' || id) as BIGINT mod 10000;
# train < 8000 <= val < 9000 <= test.
# ---------------------------------------------------------------------------

SPLIT_SALT = "split"
SPLIT_TRAIN_LT = 8000
SPLIT_VAL_LT = 9000


def split_bucket_sql(id_expr: str = "doc_id") -> str:
    """The 0..9999 md5 split bucket for ``id_expr`` (DuckDB)."""
    return (
        f"CAST(('0x' || substring(md5('{SPLIT_SALT}' || {id_expr}::VARCHAR), 1, 8))\n"
        f"              AS BIGINT) % 10000"
    )


def split_case_sql(id_expr: str = "doc_id") -> str:
    """Three-way train/val/test CASE computed inline from ``id_expr``."""
    return (
        f"CASE WHEN {split_bucket_sql(id_expr)} < {SPLIT_TRAIN_LT} THEN 'train'\n"
        f"              WHEN {split_bucket_sql(id_expr)} < {SPLIT_VAL_LT} THEN 'val'\n"
        f"              ELSE 'test' END"
    )


def split_case_from_bucket_sql(bucket: str = "bucket") -> str:
    """Three-way CASE over an already-computed split bucket column."""
    return (
        f"CASE WHEN {bucket} < {SPLIT_TRAIN_LT} THEN 'train'\n"
        f"            WHEN {bucket} < {SPLIT_VAL_LT} THEN 'val'\n"
        f"            ELSE 'test' END"
    )


def split_train_pred_sql(id_expr: str = "doc_id") -> str:
    """Predicate selecting the 'train' slice of the split."""
    return f"{split_bucket_sql(id_expr)} < {SPLIT_TRAIN_LT}"


def split_holdout_pred_sql(id_expr: str = "doc_id") -> str:
    """Predicate selecting the held-out (val+test) slice."""
    return f"{split_bucket_sql(id_expr)} >= {SPLIT_TRAIN_LT}"


# ---------------------------------------------------------------------------
# Heuristic quality battery (text.quality_score / with_quality):
# 0.4 for 20<=n_words<=2000, +0.3 for 2<=avg_word_len<=12,
# +0.3 for stopword_ratio>=0.05; quality >= 0.7 is the gate.
# Two rendered forms: over a word ARRAY column (ws) and over
# precomputed TEXT_STATS columns. The ws form takes the caller's
# stopword-set literal (defined next to the tokenizer in oracles/text
# — common must not import text).
# ---------------------------------------------------------------------------

QUALITY_GATE = 0.7


def quality_sum_ws_sql(stopwords: str, ws: str = "ws", guarded: bool = True) -> str:
    """The battery summed over a word-array column ``ws``.

    ``guarded=False`` drops the len(ws)>0 guards for call sites whose
    enclosing WHERE already excludes empty docs (the qclf label CTE).
    """
    g = f"len({ws}) > 0 AND\n                   " if guarded else ""
    g2 = f"len({ws}) > 0 AND\n                   " if guarded else ""
    return (
        f"(CASE WHEN len({ws}) BETWEEN 20 AND 2000 THEN 0.4 ELSE 0.0 END\n"
        f"       + CASE WHEN {g}list_sum(list_transform({ws}, x -> length(x)))::DOUBLE / len({ws})\n"
        f"                     BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END\n"
        f"       + CASE WHEN {g2}len(list_filter({ws}, x -> x IN {stopwords}))::DOUBLE / len({ws})\n"
        f"                     >= 0.05 THEN 0.3 ELSE 0.0 END)"
    )


def quality_sum_stats_sql() -> str:
    """The battery over TEXT_STATS columns (n_words / avg_word_len /
    stopword_ratio — NULL stats short-circuit each CASE to its ELSE,
    matching the engine's null semantics)."""
    return (
        "(CASE WHEN n_words BETWEEN 20 AND 2000 THEN 0.4 ELSE 0.0 END\n"
        "        + CASE WHEN avg_word_len BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END\n"
        "        + CASE WHEN stopword_ratio >= 0.05 THEN 0.3 ELSE 0.0 END)"
    )



def _materialize_ctes(sql: str, names: tuple[str, ...]) -> str:
    """Mark the named CTEs ``AS MATERIALIZED`` (DuckDB): a composed
    oracle like the curation pipelines references its stage outputs
    many times (sig 16x in the band union, sh 4x, the survivor corpus
    from split + contamination + resample), and DuckDB 1.0 inlines CTE
    bodies per reference — the COMPOSED tree then multiplies out to
    thousands of leaf parquet scans and dies on file handles (or, for
    the hash-chain oracles, re-evaluates the chain per reference,
    measured 7x-118x slower). Materializing each stage boundary pins
    the oracle to the same evaluate-once semantics the engine's
    persist() boundaries use. Anchored on the unique '\n<name> AS ('
    definition site; asserts exactly one match so a parts edit cannot
    silently de-materialize a stage."""
    for n in names:
        anchor = f"\n{n} AS ("
        assert sql.count(anchor) == 1, f"CTE anchor not unique: {n}"
        sql = sql.replace(anchor, f"\n{n} AS MATERIALIZED (", 1)
    return sql
