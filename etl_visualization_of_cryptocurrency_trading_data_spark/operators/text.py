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
from pyspark.sql.window import Window

from ..functions.text import (
    STOPWORDS,
    normalized_text,
    quality_band,
    regex_token_count,
    stopword_count,
    words,
)

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


def with_quality(documents: DataFrame) -> DataFrame:
    """Append the composite quality score (and its boolean gate) to the
    input WITHOUT dropping any columns — the map-only form used when a
    pipeline needs both the verdict and the document content in one
    pass (a quality_score + join-back would shuffle the corpus on
    doc_id for columns a projection computes for free). Same formula as
    [[quality_score]]."""
    base = documents.withColumn("ws", words(F.col("text")))
    ws = F.col("ws")
    n_words = F.size(ws)
    avg_wl = F.when(
        n_words > 0,
        F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
        / n_words,
    )
    stop_ratio = F.when(n_words > 0, stopword_count(ws).cast("double") / n_words)
    in_band = quality_band(n_words, avg_wl, stop_ratio)
    return base.select(
        *documents.columns,
        in_band.alias("quality"),
        (in_band >= 0.7).alias("is_quality"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Composite quality score in [0, 1] from the surface statistics —
    the shape of a C4/Gopher-style heuristic filter (word-count band,
    mean word length band, stopword presence), expressed as columns so
    the filter itself is pushdown-able."""
    s = text_stats(documents)
    in_band = quality_band(
        F.col("n_words"), F.col("avg_word_len"), F.col("stopword_ratio")
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
    return documents.select(
        "doc_id",
        ws_tokens.cast("long").alias("ws_tokens"),
        regex_token_count(F.col("text")).alias("regex_tokens"),
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


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document: the fraction of
    non-empty lines that are exact duplicates of an earlier line, and
    the share of tokens taken by the single most frequent word. High
    values on either flag boilerplate / machine-generated text that
    quality filters should drop before training.

    dup_line_ratio counts surplus copies ((n_lines - n_distinct) /
    n_lines), so a document whose every line is unique scores 0.0 and
    one line repeated N times scores (N-1)/N.

    Scale: the line metrics are map-only array ops. top_word_share
    needs a per-(doc, word) count — explode + two-phase hash
    aggregation (Zipf-head words are absorbed map-side), re-keyed to
    doc_id for the final agg and sort-merge-joined back to the line
    metrics. Two keyed shuffles, both on doc_id-bounded cardinality;
    no window over the full corpus.
    """
    lines = F.filter(
        F.transform(F.split(F.col("text"), r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    base = documents.select(
        "doc_id", lines.alias("ls"), words(F.col("text")).alias("ws")
    )
    n_lines = F.size("ls")
    n_distinct = F.size(F.array_distinct("ls"))
    line_stats = base.select(
        "doc_id",
        n_lines.cast("long").alias("n_lines"),
        n_distinct.cast("long").alias("n_distinct_lines"),
        F.when(
            n_lines > 0, (n_lines - n_distinct).cast("double") / n_lines
        ).alias("dup_line_ratio"),
        F.size("ws").cast("long").alias("n_words"),
    )
    word_freq = (
        documents.select("doc_id", F.explode(words(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg((F.max("n").cast("double") / F.sum("n")).alias("top_word_share"))
    )
    return line_stats.join(word_freq, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        "n_distinct_lines",
        "dup_line_ratio",
        "n_words",
        "top_word_share",
    )


def tfidf_top_terms(documents: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-``k`` terms by tf-idf (tf = in-doc count, idf =
    ln(N / df) over document frequency, N = corpus document count) —
    the classic keyword/topic-signature extraction over a corpus.

    Ties and floats are pinned for cross-engine reproducibility: the
    score is rounded to 7 decimals in-plan (ln() and double
    multiplication agree across engines well beyond that), and ranking
    orders by (rounded score desc, term asc).

    Scale: ONE tokenize pass over the corpus. df comes from a count
    window over the term partition of the already-aggregated (doc_id,
    term) frame — formulating it as ``tf.groupBy(term)`` + join would
    make Catalyst re-derive the distinct from a second full scan
    (exchange reuse does not kick in because the unused tf count gets
    pruned from the df branch). Shuffles: (doc_id, term) tf
    aggregation with map-side combine, re-key to term for the df
    window, re-key to doc_id for top-k — which Spark executes as
    WindowGroupLimit (k rows per doc retained before the final
    shuffle). N arrives via a broadcast 1-row cross join on a
    zero-column scan (parquet metadata count), so nothing collects on
    the driver.
    """
    tf = (
        documents.select("doc_id", F.explode(words(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = F.count("*").over(Window.partitionBy("term"))
    n_docs = documents.select(F.count("*").alias("n_docs"))
    scored = (
        tf.withColumn("df", df_)
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 7
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "tfidf", "rank")
    )


def bigram_logprob(documents: DataFrame) -> DataFrame:
    """Per-document mean bigram log-probability under the corpus's own
    bigram model — the KenLM-style perplexity proxy quality filters
    use: garbled or machine-mangled text scores far below fluent prose
    because its word transitions are rare in the corpus. Unsmoothed by
    construction (every observed bigram includes itself in the counts,
    so no zero probabilities); documents under 2 tokens are absent
    from the output.

    Emits (doc_id, n_bigrams, avg_logprob) with the score rounded to 7
    decimals — the mean's partial-sum order drifts ~1e-14, far under
    the rounding grid, so results are reproducible across engines.

    Scale: ONE tokenize scan. Both model counts (bigram count and
    left-context count) are count windows over the exploded bigram
    stream — partitionBy (w1, w2) and (w1) — rather than
    aggregate-plus-join, which would re-scan the corpus per count
    (same plan lesson as cross_split_contamination). Final per-doc
    mean re-keys by doc_id. Three keyed exchanges, no joins.
    """
    toks = documents.select("doc_id", words(F.col("text")).alias("ws")).filter(
        F.size("ws") >= 2
    )
    idx = F.sequence(F.lit(0), F.size("ws") - 2)
    bi = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("ws", i + 1).alias("w1"),
                    F.element_at("ws", i + 2).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    counted = bi.withColumn(
        "n2", F.count("*").over(Window.partitionBy("w1", "w2"))
    ).withColumn("n1", F.count("*").over(Window.partitionBy("w1")))
    return counted.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg(F.log(F.col("n2") / F.col("n1"))), 7).alias("avg_logprob"),
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


def gopher_rules(
    documents: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.90,
    max_ellipsis_line_frac: float = 0.30,
    min_alpha_word_frac: float = 0.80,
    min_stopword_hits: int = 2,
    keep_columns: bool = False,
) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021, §A.1.1) as
    per-rule boolean COLUMNS rather than one opaque score — the shape a
    curation pipeline needs, because each rule is tuned/ablated
    independently and the conjunction is a pushdown-able filter.

    Rules (thresholds are the paper's defaults, all parameterized):
    word-count band, mean-word-length band, symbol-to-word ratio
    (``#``/ellipsis), bullet-started line fraction, ellipsis-ended line
    fraction, alphabetic-word fraction, and the stopword floor (>=
    ``min_stopword_hits`` distinct hits from the paper's 8-word list).

    Scale shape: pure map — one pass, no shuffle, no Python. Mean word
    length is ``length(concat_ws('', ws)) / n_words`` (codegen'd)
    rather than an interpreted ``aggregate()`` lambda over the token
    array; symbol counts are ``regexp_count`` on the raw text. The two
    line rules and the alpha/stopword rules use ``filter()`` lambdas —
    interpreted, but over short line/word arrays, and measured
    negligible next to the tokenize.
    """
    text, ws = F.col("text"), words(F.col("text"))
    lines = F.split(text, r"\n")
    # The paper's stopword list (distinct from the scoring lexicon in
    # functions.text.STOPWORDS — the rule is defined BY this list).
    gopher_stops = ("the", "be", "to", "of", "and", "that", "have", "with")
    carried = [c for c in documents.columns if c != "doc_id"] if keep_columns else []
    base = documents.select(
        "doc_id",
        *carried,
        F.size(ws).cast("long").alias("n_words"),
        F.try_divide(F.length(F.concat_ws("", ws)), F.size(ws)).alias(
            "mean_word_len"
        ),
        F.try_divide(
            F.regexp_count(text, F.lit(r"#")) + F.regexp_count(text, F.lit(r"\.\.\.")),
            F.size(ws),
        ).alias("symbol_ratio"),
        (
            F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
            / F.size(lines)
        ).alias("bullet_line_frac"),
        (
            F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$")))
            / F.size(lines)
        ).alias("ellipsis_line_frac"),
        F.try_divide(
            F.size(F.filter(ws, lambda w: w.rlike(r"[a-z]"))), F.size(ws)
        ).alias("alpha_word_frac"),
        F.size(
            F.filter(
                F.array(*[F.lit(s) for s in gopher_stops]),
                lambda s: F.array_contains(ws, s),
            )
        ).alias("stopword_hits"),
    )
    n = F.col("n_words")
    rules = {
        "r_word_count": (n >= min_words) & (n <= max_words),
        "r_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "r_symbol_ratio": F.col("symbol_ratio") < max_symbol_ratio,
        "r_bullet_lines": F.col("bullet_line_frac") < max_bullet_line_frac,
        "r_ellipsis_lines": F.col("ellipsis_line_frac") < max_ellipsis_line_frac,
        "r_alpha_words": F.col("alpha_word_frac") >= min_alpha_word_frac,
        "r_stopwords": F.col("stopword_hits") >= min_stopword_hits,
    }
    guarded = {k: F.when(n > 0, v).otherwise(F.lit(False)) for k, v in rules.items()}
    passes = guarded["r_word_count"]
    for k in list(guarded)[1:]:
        passes = passes & guarded[k]
    return base.select(
        "doc_id",
        *carried,
        "n_words",
        *[v.alias(k) for k, v in guarded.items()],
        passes.alias("passes_gopher"),
    )


def bpe_merge_candidates(documents: DataFrame, k: int = 20) -> DataFrame:
    """The first round of BPE tokenizer training: corpus-wide counts of
    adjacent symbol (character) pairs, weighted by word frequency —
    the top pair is exactly what BPE would merge first. Training
    operates on the WORD FREQUENCY TABLE, not the raw corpus (the
    standard formulation): the corpus collapses to (word, n) in one
    hash aggregate, and the pair explosion runs over the vocabulary —
    at web scale that is millions of rows, not trillions.

    Output: (pair, n_occurrences, rank) for the top ``k`` pairs, ties
    by pair text. Plan: explode(words) -> word-count aggregate ->
    explode(sequence) + substring pair build (codegen, no interpreted
    lambdas — the [[dedup.span_dedup]] pattern) -> pair aggregate ->
    one WindowGroupLimit top-k.
    """
    word_freq = (
        documents.select(F.explode(words(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .filter(F.length("w") >= 2)
    )
    pairs = word_freq.select(
        "w",
        "n",
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
    ).select(F.substring(F.col("w"), F.col("i"), 2).alias("pair"), "n")
    counts = pairs.groupBy("pair").agg(F.sum("n").alias("n_occurrences"))
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("pair"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("pair", "n_occurrences", "rank")
    )


def _bpe_initial_symbols(documents: DataFrame) -> DataFrame:
    """BPE training state, round 0: the corpus collapsed to its word
    frequency table (the standard formulation — training touches the
    VOCABULARY, millions of rows at web scale, never the corpus
    again), each word exploded to one (w, n, pos, sym) row per
    character."""
    word_freq = (
        documents.select(F.explode(words(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .filter(F.length("w") >= 2)
    )
    return word_freq.select(
        "w", "n", F.posexplode(F.split(F.col("w"), "")).alias("pos", "sym")
    )


def _bpe_merge_step(syms: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One BPE training round over the exploded symbol table: count
    adjacent pairs (weighted by word frequency), pick the argmax pair
    (ties by pair text — deterministic in both engines), and apply it
    with BPE's greedy LEFT-TO-RIGHT NON-OVERLAPPING semantics.

    The greedy rule is declarative, not a fold: adjacent matches can
    only chain when p1 == p2 (a match at i+1 needs sym[i+1] = p1 = p2),
    so within each run of CONSECUTIVE match positions exactly the
    even offsets merge ("aaaa" + (a,a) -> [aa, aa]; "aaa" -> [aa, a]).
    Runs are gaps-and-islands (pos - row_number over match rows), the
    even-offset test is (pos - run_start) % 2 = 0, and the consumed
    second symbol is lag(merge_here) — three window passes over the
    vocabulary, zero interpreted lambdas, and the exact same windows
    replay verbatim in the DuckDB oracle.

    Returns (merge_row, next_syms): the 1-row (p1, p2, merged, cnt)
    frame and the post-merge symbol table with positions renumbered.
    """
    wwin = Window.partitionBy("w").orderBy("pos")
    with_next = syms.withColumn("nxt", F.lead("sym").over(wwin))
    counts = (
        with_next.filter(F.col("nxt").isNotNull())
        .groupBy("sym", "nxt")
        .agg(F.sum("n").alias("cnt"))
    )
    top1 = (
        counts.orderBy(F.desc("cnt"), F.asc("sym"), F.asc("nxt"))
        .limit(1)
        .select(
            F.col("sym").alias("p1"), F.col("nxt").alias("p2"), F.col("cnt")
        )
    )
    # LEFT join on a constant key, not crossJoin: when the pair counts
    # saturate before the requested rounds (every word already a single
    # symbol) top1 is EMPTY, and a crossJoin would drop every symbol row
    # — bpe_vocab would return an empty vocabulary and bpe_encode_counts
    # would silently coalesce every word to 1 token (ADVICE r8). With
    # the left join, p1/p2 are NULL, match coalesces to False, and the
    # round is a no-op — matching the DuckDB oracle, whose scalar
    # subqueries (SELECT p1 FROM topN) yield NULL on the same state.
    stepped = (
        with_next.withColumn("_k", F.lit(1))
        .join(
            F.broadcast(
                top1.select("p1", "p2").withColumn("_k", F.lit(1))
            ),
            "_k",
            "left",
        )
        .drop("_k")
        .withColumn(
            "match",
            F.coalesce(
                (F.col("sym") == F.col("p1")) & (F.col("nxt") == F.col("p2")),
                F.lit(False),
            ),
        )
        .withColumn(
            "grp",
            F.col("pos")
            - F.row_number().over(Window.partitionBy("w", "match").orderBy("pos")),
        )
        .withColumn(
            "run_start",
            F.min("pos").over(Window.partitionBy("w", "match", "grp")),
        )
        .withColumn(
            "merge_here",
            F.col("match") & (((F.col("pos") - F.col("run_start")) % 2) == 0),
        )
        .withColumn(
            "consumed", F.coalesce(F.lag("merge_here").over(wwin), F.lit(False))
        )
        .filter(~F.col("consumed"))
        .select(
            "w",
            "n",
            F.row_number().over(wwin).alias("pos"),
            F.when(F.col("merge_here"), F.concat("p1", "p2"))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )
    return top1, stepped


def bpe_train(
    documents: DataFrame, rounds: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Iterative BPE tokenizer training for ``rounds`` merge rounds —
    the real training loop (r7 verdict item #4: round 1 alone is
    [[bpe_merge_candidates]]; the tokenizer is the FIXED POINT of
    apply-top-pair-and-recount). Returns (merges, symbols): the
    learned merge table (round, p1, p2, merged, n_occurrences) — the
    artifact a tokenizer ships — and the post-training symbol table.

    Scale shape: every round is two vocabulary-sized window passes +
    one map-side-combined pair aggregate; the corpus is touched ONCE
    (the round-0 word-frequency collapse). Each round's symbol table
    feeds BOTH the next pair count and the next merge application, so
    lineage doubles per round without truncation — the same
    O(2^rounds) analyzer hazard measured on the star-CC operator
    ([[dedup.connected_components_star]]); per-round eager
    ``localCheckpoint`` is the documented fix and the GraphFrames
    boundary, values unchanged.
    """
    # Eager checkpoint of the round-0 vocabulary collapse + a count:
    # round 1 would materialize this exact frame anyway, and the count
    # gates the scale-adaptive loop pinning (OPTIMIZATION_r14, see
    # operators/_loopconf.py — the K rounds are vocabulary-sized window
    # passes, so on a small measured symbol table they run with AQE off
    # and a derived partition count; above the gate nothing changes).
    from ._loopconf import pinned_small_loop

    syms = _bpe_initial_symbols(documents).localCheckpoint(eager=True)
    n_syms = syms.count()
    merges = None
    with pinned_small_loop(documents.sparkSession, n_syms):
        for r in range(1, rounds + 1):
            top1, stepped = _bpe_merge_step(syms)
            row = top1.select(
                F.lit(r).alias("round"),
                "p1",
                "p2",
                F.concat("p1", "p2").alias("merged"),
                F.col("cnt").alias("n_occurrences"),
            )
            merges = row if merges is None else merges.unionByName(row)
            syms = stepped.localCheckpoint(eager=True)
    return merges, syms


def bpe_vocab(
    documents: DataFrame, rounds: int = 3, k: int = 40
) -> DataFrame:
    """Post-training BPE vocabulary: apply ``rounds`` learned merges
    ([[bpe_train]]) and emit the top-``k`` symbols by word-frequency-
    weighted occurrence count — (sym, n_occurrences, rank). Every
    merge decision upstream moves mass between symbols here, so one
    hash over this frame pins the whole training loop: pair counting,
    argmax tie-breaks, and the greedy non-overlap application of all
    K rounds."""
    _, syms = bpe_train(documents, rounds=rounds)
    counts = syms.groupBy("sym").agg(F.sum("n").alias("n_occurrences"))
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("sym"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("sym", "n_occurrences", "rank")
    )


def bpe_encode_counts(
    documents: DataFrame, rounds: int = 3
) -> DataFrame:
    """Tokenizer APPLICATION — the serving side of [[bpe_train]]: count
    each document's tokens under the K-round trained BPE vocabulary.
    Because BPE merges apply per WORD, encoding reduces to one
    vocabulary-sized lookup table (word → post-merge symbol count)
    LEFT-joined onto the corpus word stream; words shorter than the
    training floor (length < 2) stay single tokens. This is the
    100 TB shape of trained-tokenizer accounting: the corpus pays one
    tokenize+explode pass and one broadcast-sized join — training cost
    is vocabulary-bound and amortized, exactly like a shipped
    tokenizer's merge table.

    Output: (doc_id, n_words, n_tokens_bpe). n_tokens_bpe strictly
    decreases (weakly) as rounds grow — each merge can only shrink a
    word's symbol count — which pytest pins as the training-progress
    contract."""
    _, syms = bpe_train(documents, rounds=rounds)
    per_word = syms.groupBy("w").agg(F.count("*").alias("toks"))
    docw = documents.select(
        "doc_id", F.explode(words(F.col("text"))).alias("w")
    )
    return (
        docw.join(F.broadcast(per_word), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.coalesce(F.col("toks"), F.lit(1))).alias("n_tokens_bpe"),
        )
    )


def vocab_coverage(documents: DataFrame, ks: tuple[int, ...] = (100, 1000, 10000)) -> DataFrame:
    """Vocabulary coverage curve — for each candidate vocabulary size k,
    the fraction of all corpus token occurrences covered by the k most
    frequent tokens. THE tokenizer-sizing diagnostic (how much of the
    stream does a 32k/64k/128k vocab actually absorb), and the natural
    companion to [[bpe_merge_candidates]].

    Plan shape (100 TB): one tokenize+explode pass -> token-count hash
    aggregate (map-side combinable) -> distributed partial TOP-max(k)
    (``orderBy().limit()`` is TakeOrdered — each partition keeps its own
    top max(k), only those survivors reach the driver-side merge; the
    full vocabulary is NEVER globally sorted) -> rank window over the
    ≤max(k)-row survivor frame (bounded, not corpus-sized) -> tiny
    rank<=k expansion join -> one-row total broadcast. Counts are exact
    integers end to end; the only float is the final division,
    rounded to the 1e-9 grid.

    Output: (k, vocab_size, covered_tokens, total_tokens, coverage),
    one row per k (a k larger than the vocabulary reports the whole
    vocabulary; an empty corpus yields no rows)."""
    spark = documents.sparkSession
    toks = documents.select(F.explode(words(F.col("text"))).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    top = counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(max(ks))
    rank_w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    ranked = top.withColumn("rank", F.row_number().over(rank_w))
    ks_df = spark.createDataFrame([(int(k),) for k in sorted(ks)], "k int")
    totals = toks.agg(F.count("*").alias("total_tokens"))
    return (
        ks_df.join(ranked, F.col("rank") <= F.col("k"))
        .groupBy("k")
        .agg(
            F.count("*").alias("vocab_size"),
            F.sum("cnt").alias("covered_tokens"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "k",
            "vocab_size",
            "covered_tokens",
            "total_tokens",
            F.round(
                F.col("covered_tokens").cast("double") / F.col("total_tokens"), 9
            ).alias("coverage"),
        )
    )


def corpus_quality_report(
    documents: DataFrame, min_stopword_hits: int = 1
) -> DataFrame:
    """Pipeline-observability rollup: per (source, lang), document and
    word counts, per-Gopher-rule pass counts, and the overall pass
    rate — the dashboard a curation run publishes so a threshold
    regression in any one rule is visible per corpus slice instead of
    buried in a global rate.

    Composes [[gopher_rules]] with ``keep_columns`` (the rule battery
    stays one map pass; this adds a single dimension-keyed aggregate).
    Runs at ``min_stopword_hits=1`` like ``curation_pipeline_v2`` — the
    synthetic vocabulary carries one word from the paper's list."""
    gr = gopher_rules(
        documents, min_stopword_hits=min_stopword_hits, keep_columns=True
    )
    rules = (
        "r_word_count", "r_mean_word_len", "r_symbol_ratio", "r_bullet_lines",
        "r_ellipsis_lines", "r_alpha_words", "r_stopwords",
    )
    agg = gr.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        *[F.sum(F.col(r).cast("long")).alias(f"n_{r}") for r in rules],
        F.sum(F.col("passes_gopher").cast("long")).alias("n_pass"),
    )
    return agg.select(
        "source",
        "lang",
        "n_docs",
        "total_words",
        *[f"n_{r}" for r in rules],
        "n_pass",
        F.round(F.col("n_pass").cast("double") / F.col("n_docs"), 9).alias(
            "pass_rate"
        ),
    )


# Fixed literal query so the registered query and its oracle embed the
# same terms (the LANG_LEXICONS pattern). Mixes high-df corpus words
# with rarer ones so idf actually spreads.
BM25_QUERY_TERMS = ("spark", "query", "window", "stream", "filter")


def bm25_scores(
    documents: DataFrame,
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document to a fixed term set
    (Robertson & Spärck Jones probabilistic ranking; the Lucene
    ``log(1 + (N - df + .5)/(df + .5))`` non-negative idf variant) —
    the retrieval primitive a training-data pipeline uses for
    targeted corpus search and RAG-style nearest-text lookup next to
    the embedding ANN family in ``similarity``.

    Emits (doc_id, n_matched, bm25) for every document containing at
    least one query term, rounded to 6 decimals (partial-sum order
    drifts ~1e-14, far under the grid — the [[bigram-logprob]]
    convention).

    Scale: ONE tokenize scan; the exploded stream is filtered to the
    query terms BEFORE the shuffle, so the keyed exchanges carry only
    matching occurrences (a vanishing fraction of the corpus at
    100 TB). df comes from a count window over the per-(doc, term) tf
    rows — partitionBy(term) over |terms| x |matching docs| rows, not
    a corpus re-scan — and the 1-row corpus stats frame (N, avgdl)
    joins in broadcast (the share-of-total A6 idiom, no 1-partition
    window). Three keyed exchanges total, no joins on big sides.
    """
    toks = documents.select("doc_id", words(F.col("text")).alias("ws")).filter(
        F.size("ws") > 0
    )
    stats = toks.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size("ws")).alias("avgdl"),
    )
    matched = toks.select(
        "doc_id",
        F.size("ws").alias("dl"),
        F.explode(F.filter("ws", lambda w: w.isin(*query_terms))).alias("term"),
    )
    tf = matched.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))
    tf = tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
    scored = tf.crossJoin(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    contrib = (
        idf
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_matched"),
        F.round(F.sum(contrib), 6).alias("bm25"),
    )


def lm_perplexity_buckets(
    documents: DataFrame,
    q_low: float = 0.33,
    q_high: float = 0.66,
    round_decimals: int = 9,
) -> DataFrame:
    """CCNet-style corpus-LM quality bucketing: label every scoreable
    document head / middle / tail by its [[bigram_logprob]] score
    against its OWN LANGUAGE's score quantiles — the Wenzek et al.
    (CCNet) discipline that curation pipelines use to keep the fluent
    third, review the middle, and drop the garbled tail. Per-language
    cuts matter: raw LM scores are not comparable across languages
    (different bigram entropy), so a global threshold would silently
    drop whole languages.

    Determinism (the [[market_regime]] idiom): scores are already on
    bigram_logprob's 1e-7 grid; the exact interpolated percentiles
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``) compute over
    those rounded values and round to 1e-9, so bucket labels compare
    rounded-to-rounded and cannot flip on ulp drift. head = highest
    log-probability (most fluent). Documents under 2 tokens have no
    score and are absent, as in bigram_logprob.

    Plan: the bigram_logprob chain (one tokenize scan, three keyed
    exchanges), a |langs|-row quantile aggregate, one broadcast join
    back — the corpus crosses the wire exactly as often as the score
    itself."""
    scored = bigram_logprob(documents).join(
        documents.select("doc_id", "lang"), "doc_id"
    )
    cuts = scored.groupBy("lang").agg(
        F.round(F.percentile("avg_logprob", q_low), round_decimals).alias("c_low"),
        F.round(F.percentile("avg_logprob", q_high), round_decimals).alias("c_high"),
    )
    bucket = (
        F.when(F.col("avg_logprob") <= F.col("c_low"), "tail")
        .when(F.col("avg_logprob") <= F.col("c_high"), "middle")
        .otherwise("head")
    )
    return scored.join(F.broadcast(cuts), "lang").select(
        "doc_id", "lang", "n_bigrams", "avg_logprob", bucket.alias("bucket")
    )


def bpe_fertility(
    documents: DataFrame, rounds: int = 3, round_decimals: int = 9
) -> DataFrame:
    """Per-language tokenizer-fit report under the trained BPE — the
    two numbers a tokenizer review reads before shipping a vocabulary:
    FERTILITY (BPE tokens per whitespace word; 1.0 = every word is one
    token, higher = the vocab fragments that language) and
    CHARS-PER-TOKEN (compression; higher = each token carries more
    text). Multilingual pipelines watch fertility skew across
    languages — a vocab trained on the mixture can still fragment a
    minority language badly.

    Exact integer sums (token/word/char counts) with ONE rounded
    division each at the end, so the oracle replays bit-exactly.
    Plan: the [[bpe_encode_counts]] chain (vocabulary-bound training +
    one broadcast word-table join), one extra map pass for word-char
    totals, one |langs|-row aggregate."""
    enc = bpe_encode_counts(documents, rounds=rounds)
    toks = documents.select(
        "doc_id", "lang", words(F.col("text")).alias("ws")
    ).filter(F.size("ws") > 0)
    wchars = toks.select(
        "doc_id",
        "lang",
        F.expr(
            "aggregate(transform(ws, x -> length(x)), 0L, (a, x) -> a + bigint(x))"
        ).alias("n_word_chars"),
    )
    return (
        enc.join(wchars, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_tokens_bpe").alias("n_tokens_bpe"),
            F.sum("n_word_chars").alias("n_word_chars"),
            F.round(F.sum("n_tokens_bpe") / F.sum("n_words"), round_decimals).alias(
                "fertility"
            ),
            F.round(
                F.sum("n_word_chars") / F.sum("n_tokens_bpe"), round_decimals
            ).alias("chars_per_token"),
        )
    )
