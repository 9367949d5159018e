"""Text scalar helpers shared by the text-analysis and dedup operators.

All JVM-side (built-in / higher-order functions) — no Python UDFs. Each
helper has an exactly-matching DuckDB SQL fragment in plans/registry so
results are oracle-checkable; tokenization is pinned to: lowercase,
split on runs of whitespace, drop empty tokens.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small fixed stopword lexicon used for quality scoring / lang-id. Kept
# deliberately tiny and literal so the oracle SQL can embed the same list.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def words(text: Column) -> Column:
    """Whitespace tokens of lowercased text, empties dropped."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def word_shingles(ws: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a token array (order-preserving build,
    then dedup). Documents shorter than n words yield an empty array."""
    idx = F.sequence(F.lit(0), F.size(ws) - n)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(ws, i + k + 1) for k in range(n)]
    )
    return F.when(
        F.size(ws) >= n,
        F.array_distinct(F.transform(idx, lambda i: gram(i))),
    ).otherwise(F.array().cast("array<string>"))


def stopword_count(ws: Column) -> Column:
    return F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS)))


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace,
    trim — so visually-identical documents hash identically."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


# BPE-ish tokenizer: letter runs / digit runs / single other non-space.
# ONE definition — token_counts, pack_chunks, and the curation manifest
# must agree on the token budget, so they all call regex_token_count.
TOKEN_REGEX = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def regex_token_count(text: Column) -> Column:
    """Token count under the BPE-ish regex — the cheap proxy for LLM
    token budgeting shared by every operator that publishes a budget."""
    return F.regexp_count(F.lower(text), F.lit(TOKEN_REGEX)).cast("long")


def quality_band(n_words: Column, avg_word_len: Column, stopword_ratio: Column) -> Column:
    """The C4/Gopher-style quality score in [0, 1] — word-count band,
    mean-word-length band, stopword presence. ONE definition shared by
    quality_score (the registered query) and with_quality (the
    pipeline gate) so the two can never drift."""
    return (
        F.when((n_words >= 20) & (n_words <= 2000), 0.4).otherwise(0.0)
        + F.when((avg_word_len >= 2.0) & (avg_word_len <= 12.0), 0.3).otherwise(0.0)
        + F.when(stopword_ratio >= 0.05, 0.3).otherwise(0.0)
    )
