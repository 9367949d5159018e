"""Text-analysis operators for LLM-data pipelines (brief §"beyond the
reference": language-ID, quality scoring, token counting, document
fingerprinting) over the ``documents`` table.

Everything here is built-in `pyspark.sql.functions` + higher-order
lambdas — fully JVM-side, zero Python UDFs, so per-row cost is constant
and the operators scale embarrassingly (pure map, no shuffle at all).

NOTE: higher-order functions are interpreted (CodegenFallback) and get
no common-subexpression elimination, so the token array is always
materialized in its own projection before being referenced repeatedly
— inlining ``words()`` into N references costs N full re-tokenizations
per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, normalized_text, stopword_count, words

# Tiny per-language lexicons for the n-gram/stopword lang-ID heuristic.
# Deterministic and literal so the oracle SQL embeds the same lists.
LANG_LEXICONS = {
    "en": ("the", "and", "of", "is", "a"),
    "de": ("der", "und", "die", "ist", "ein"),
    "fr": ("le", "et", "la", "est", "un"),
    "es": ("el", "y", "la", "es", "un"),
}


def text_stats(documents: DataFrame) -> DataFrame:
    """Per-document surface statistics: char/word counts, average word
    length, punctuation density, stopword ratio."""
    base = documents.select("doc_id", "text", words(F.col("text")).alias("ws"))
    ws = F.col("ws")
    n_words = F.size(ws)
    n_chars = F.length("text")
    # length - length(translate(...)) == count of punctuation chars;
    # translate is a single table-lookup pass, ~10x cheaper than the
    # regexp_replace('[^.,;:!?]') formulation at corpus scale.
    n_punct = F.length("text") - F.length(F.translate("text", ".,;:!?", ""))
    return base.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.when(
            n_words > 0,
            F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
            / n_words,
        ).alias("avg_word_len"),
        F.when(n_chars > 0, n_punct.cast("double") / n_chars).alias("punct_ratio"),
        F.when(n_words > 0, stopword_count(ws).cast("double") / n_words).alias(
            "stopword_ratio"
        ),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Composite quality score in [0, 1] from the surface statistics —
    the shape of a C4/Gopher-style heuristic filter (word-count band,
    mean word length band, stopword presence), expressed as columns so
    the filter itself is pushdown-able."""
    s = text_stats(documents)
    in_band = (
        F.when((F.col("n_words") >= 20) & (F.col("n_words") <= 2000), 0.4).otherwise(0.0)
        + F.when((F.col("avg_word_len") >= 2.0) & (F.col("avg_word_len") <= 12.0), 0.3).otherwise(0.0)
        + F.when(F.col("stopword_ratio") >= 0.05, 0.3).otherwise(0.0)
    )
    return s.select(
        "doc_id",
        "n_words",
        in_band.alias("quality"),
        (in_band >= 0.7).alias("is_quality"),
    )


def token_counts(documents: DataFrame) -> DataFrame:
    """Token counts under two tokenizers: plain whitespace, and a
    BPE-ish regex (letter runs / digit runs / single other non-space) —
    the standard cheap proxy for LLM token budgeting."""
    ws_tokens = F.size(words(F.col("text")))
    bpe_tokens = F.regexp_count(F.lower("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"))
    return documents.select(
        "doc_id",
        ws_tokens.cast("long").alias("ws_tokens"),
        bpe_tokens.cast("long").alias("regex_tokens"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-profile language ID: score each candidate language by
    lexicon-hit count; predict the argmax (ties -> lexicographically
    first language, pinned for determinism). Emits per-language scores,
    the prediction, and agreement with the labeled ``lang`` column."""
    base = documents.select("doc_id", "lang", words(F.col("text")).alias("ws"))
    ws = F.col("ws")
    langs = sorted(LANG_LEXICONS)
    scored = base.select(
        "doc_id",
        "lang",
        *[
            F.size(F.filter(ws, lambda w: w.isin(*LANG_LEXICONS[lang])))
            .cast("long")
            .alias(f"score_{lang}")
            for lang in langs
        ],
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # build when-chain so earlier langs win ties
        pred = F.when((best > 0) & (F.col(f"score_{lang}") == best), lang).otherwise(pred)
    return scored.withColumn("predicted_lang", pred).withColumn(
        "label_match", F.col("predicted_lang") == F.col("lang")
    )


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text.
    The join key for exact dedup across shards — identical content
    hashes identically regardless of incidental whitespace."""
    return documents.select(
        "doc_id",
        F.md5(normalized_text(F.col("text"))).alias("fingerprint"),
        F.length("text").cast("long").alias("n_chars"),
    )
