"""Text-analysis battery over the documents table: stats,
quality, lang-id, fingerprints, TF-IDF, BM25, Gopher rules, PII
redaction, and BPE train/encode, with shared tokenization fragments
(WORDS_SQL / NORM_TEXT_SQL / STOPWORDS_SQL) other domains import.

Split verbatim from plans/registry.py (r11 verdict item #2); the
facade registry module re-exports every name and asserts the
assembled surface is byte-identical to the pre-split snapshot.
"""

from __future__ import annotations

from ...operators import corpus
from ...operators import text
from .common import QUALITY_GATE, _documents, quality_sum_stats_sql

def q_text_stats(spark, sf_dir):
    return text.text_stats(_documents(spark, sf_dir))

def q_quality_score(spark, sf_dir):
    return text.quality_score(_documents(spark, sf_dir))

def q_token_counts(spark, sf_dir):
    return text.token_counts(_documents(spark, sf_dir))

def q_lang_id(spark, sf_dir):
    return text.lang_id(_documents(spark, sf_dir))

def q_doc_fingerprint(spark, sf_dir):
    return text.doc_fingerprint(_documents(spark, sf_dir))

def q_bigram_logprob(spark, sf_dir):
    """Corpus-LM perplexity proxy: mean bigram log-probability per doc."""
    return text.bigram_logprob(_documents(spark, sf_dir))

def q_repetition_stats(spark, sf_dir):
    return text.repetition_stats(_documents(spark, sf_dir))

def q_tfidf_top_terms(spark, sf_dir):
    return text.tfidf_top_terms(_documents(spark, sf_dir), k=3)

def q_doc_length_quantiles(spark, sf_dir):
    """Exact interpolated percentiles of document length per language
    (percentile is absent from the reference, SURVEY §2.5) — one
    hash-agg; swap percentile for approx_percentile (t-digest sketch,
    mergeable map-side) when exactness can be traded at 100 TB."""
    from pyspark.sql import functions as F

    return (
        _documents(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.expr("percentile(n_chars, 0.25)").alias("p25"),
            F.expr("percentile(n_chars, 0.5)").alias("p50"),
            F.expr("percentile(n_chars, 0.75)").alias("p75"),
            F.expr("percentile(n_chars, 0.95)").alias("p95"),
        )
    )

def q_doc_length_quantiles_approx(spark, sf_dir):
    """The 100 TB variant of doc_length_quantiles: approx_percentile
    (Greenwald-Khanna summary, mergeable map-side, bounded memory)
    instead of the exact sort-based percentile. At accuracy=100000 the
    summary is in its EXACT regime for oracle-scale groups (it buffers
    fewer rows than the error bound), and its exact-regime answer —
    the lower discrete quantile — equals DuckDB's quantile_disc, so
    this keeps a full value oracle; the approximation contract outside
    the exact regime is pinned by pytest."""
    from pyspark.sql import functions as F

    acc = 100000
    return (
        _documents(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            *[
                F.expr(f"approx_percentile(n_chars, {q}, {acc})").alias(f"p{int(q*100)}")
                for q in (0.25, 0.5, 0.75, 0.95)
            ],
        )
    )

def q_lm_perplexity_buckets(spark, sf_dir):
    """CCNet-style LM-quality bucketing (text.lm_perplexity_buckets,
    mid-r13): head/middle/tail per document by its corpus-bigram-LM
    score against ITS OWN LANGUAGE's rounded tercile cuts — the
    keep/review/drop triage curation pipelines run on a KenLM score.
    Per-language cuts because raw LM scores are not cross-language
    comparable. Determinism per the market_regime idiom (rounded
    scores -> exact percentile -> rounded cuts -> rounded-to-rounded
    compare)."""
    return text.lm_perplexity_buckets(_documents(spark, sf_dir))

def q_bpe_fertility(spark, sf_dir):
    """Per-language tokenizer-fit report (text.bpe_fertility,
    mid-r13): fertility (trained-BPE tokens per word) and
    chars-per-token under the 3-round trained vocabulary — the skew
    check a multilingual tokenizer review reads before shipping.
    Exact integer sums, one rounded division each."""
    return text.bpe_fertility(_documents(spark, sf_dir))

def q_corpus_quality_report(spark, sf_dir):
    """Per-(source, lang) curation dashboard
    (text.corpus_quality_report): Gopher per-rule pass counts and the
    overall pass rate — one rule-battery map pass + one
    dimension-keyed aggregate."""
    return text.corpus_quality_report(_documents(spark, sf_dir))

def q_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage curve (text.vocab_coverage): share of all
    corpus token occurrences covered by the top-k tokens for
    k ∈ {100, 1000, 10000} — the tokenizer-sizing diagnostic next to
    bpe_merges. Exact integer counts, distributed partial top-k
    (TakeOrdered), no global sort of the vocabulary."""
    return text.vocab_coverage(_documents(spark, sf_dir))

# Pinned tokenization: lowercase, split on whitespace runs, drop empties.
WORDS_SQL = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"

NORM_TEXT_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

STOPWORDS_SQL = "('the','a','of','and','to','in','is','on','for','with')"

TEXT_STATS_SQL = f"""
WITH w AS (
  SELECT doc_id, text, length(text) AS n_chars, {WORDS_SQL} AS ws FROM documents
)
SELECT doc_id,
       n_chars::BIGINT AS n_chars,
       len(ws)::BIGINT AS n_words,
       CASE WHEN len(ws) > 0
            THEN list_sum(list_transform(ws, x -> length(x)))::DOUBLE / len(ws) END AS avg_word_len,
       CASE WHEN n_chars > 0
            THEN length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE / n_chars END AS punct_ratio,
       CASE WHEN len(ws) > 0
            THEN len(list_filter(ws, x -> x IN {STOPWORDS_SQL}))::DOUBLE / len(ws) END AS stopword_ratio
FROM w"""

# knn_ivf against the TRAINED coarse index: the two Lloyd rounds of the
# kmeans_centroids oracle (identical CTEs, digest select dropped) feed
# the IVF search in place of the deterministic sample. Centroid dims are
# round(avg, 9) in BOTH engines, so the search sees bit-identical
# centroids; cosine ties break by id as everywhere else.
def _bpe_parts(
    rounds: int = 3, source: str = "documents", with_prefix: str = "WITH "
) -> str:
    """The K-round BPE training loop unrolled as a CTE chain (no
    final SELECT) — the structured piece [[_bpe_sql]],
    [[_bpe_encode_sql]], and [[_bpe_pack_sql]] compose instead of
    pattern-matching each other's rendered SQL (the ADVICE r9
    anti-pattern). Each round mirrors the engine's window formulation
    verbatim — lead() pair build, grouped argmax with (count DESC,
    p1, p2) tie-break, gaps-and-islands run grouping (pos -
    row_number over match rows), even-offset merge_here, lag()
    consumed drop, row_number position renumbering — so the two
    engines walk identical integer/string columns and the comparison
    needs no tolerance. The final symbol table is CTE ``s{rounds}``.
    ``source`` re-points the training corpus at an upstream CTE and
    ``with_prefix=""`` drops the leading WITH for composed oracles
    ([[_curation_v3_sql]])."""
    parts = [
        rf"""wf AS (
  SELECT w, count(*) AS n FROM (
    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS w
    FROM {source})
  GROUP BY w HAVING length(w) >= 2
),
s0 AS (
  SELECT w, n, i AS pos, substring(w, i, 1) AS sym
  FROM (SELECT w, n, unnest(generate_series(1, length(w))) AS i FROM wf)
)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"""nx{r} AS (
  SELECT w, n, pos, sym, lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
  FROM s{p}
),
top{r} AS (
  SELECT sym AS p1, nxt AS p2 FROM nx{r} WHERE nxt IS NOT NULL
  GROUP BY sym, nxt ORDER BY sum(n) DESC, sym, nxt LIMIT 1
),
mk{r} AS (
  SELECT w, n, pos, sym,
         coalesce(sym = (SELECT p1 FROM top{r})
                  AND nxt = (SELECT p2 FROM top{r}), FALSE) AS match
  FROM nx{r}
),
gr{r} AS (
  SELECT *, pos - row_number() OVER (PARTITION BY w, match ORDER BY pos) AS grp
  FROM mk{r}
),
mh{r} AS (
  SELECT *, match AND ((pos - min(pos) OVER (PARTITION BY w, match, grp)) % 2 = 0)
            AS merge_here
  FROM gr{r}
),
cs{r} AS (
  SELECT *, coalesce(lag(merge_here) OVER (PARTITION BY w ORDER BY pos), FALSE)
            AS consumed
  FROM mh{r}
),
s{r} AS (
  SELECT w, n, row_number() OVER (PARTITION BY w ORDER BY pos) AS pos,
         CASE WHEN merge_here
              THEN (SELECT p1 FROM top{r}) || (SELECT p2 FROM top{r})
              ELSE sym END AS sym
  FROM cs{r} WHERE NOT consumed
)"""
        )
    return with_prefix + ",\n".join(parts)

def _bpe_sql(rounds: int = 3, k: int = 40) -> str:
    """Generated oracle for [[q_bpe_vocab_k]]: the [[_bpe_parts]]
    training chain + the top-k post-training vocabulary SELECT."""
    return (
        _bpe_parts(rounds)
        + f"""
SELECT sym, n_occurrences, rank FROM (
  SELECT sym, n_occurrences,
         row_number() OVER (ORDER BY n_occurrences DESC, sym) AS rank
  FROM (SELECT sym, sum(n)::BIGINT AS n_occurrences FROM s{rounds} GROUP BY sym)
) WHERE rank <= {k}"""
    )

def _bpe_encode_ctes(
    rounds: int = 3, source: str = "documents", with_prefix: str = "WITH "
) -> str:
    """Training chain + encode CTE ``enc`` (doc_id, n_words,
    n_tokens_bpe): per-word post-merge symbol counts LEFT-joined onto
    the corpus word stream (words below the length-2 training floor
    stay single tokens). The structured piece [[_bpe_encode_sql]] and
    [[_bpe_pack_sql]] compose — no rendered-SQL surgery. ``source`` /
    ``with_prefix`` as in [[_bpe_parts]] (train AND encode follow the
    same corpus)."""
    return (
        _bpe_parts(rounds, source=source, with_prefix=with_prefix)
        + f""",
per_word AS (SELECT w, count(*) AS toks FROM s{rounds} GROUP BY w),
docw AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x <> '')) AS w
  FROM {source}
),
enc AS (
  SELECT doc_id, count(*)::BIGINT AS n_words,
         sum(coalesce(toks, 1))::BIGINT AS n_tokens_bpe
  FROM docw LEFT JOIN per_word USING (w)
  GROUP BY doc_id
)"""
    )

def _bpe_encode_sql(rounds: int = 3) -> str:
    """Oracle for [[q_bpe_encode]]: the K-round training chain +
    encode CTE ([[_bpe_encode_ctes]]), projected."""
    return (
        _bpe_encode_ctes(rounds)
        + "\nSELECT doc_id, n_words, n_tokens_bpe FROM enc"
    )

LANGS_SQL = {
    "de": "('der','und','die','ist','ein')",
    "en": "('the','and','of','is','a')",
    "es": "('el','y','la','es','un')",
    "fr": "('le','et','la','est','un')",
}

_GREATEST = "greatest(score_de, score_en, score_es, score_fr)"

TOP_TERMS_K = 10

def q_top_terms(spark, sf_dir):
    """Per-language top-10 vocabulary heavy hitters, deterministic
    ties (count desc, term asc)."""
    return corpus.top_terms(_documents(spark, sf_dir), k=TOP_TERMS_K)

def q_redact_pii(spark, sf_dir):
    """URL/email/long-number scrub with sequential span counts and a
    content hash of the redacted text."""
    return corpus.redact_pii(_documents(spark, sf_dir))

def q_documents_profile(spark, sf_dir):
    """One-pass per-column data-quality profile of the documents table
    (corpus.profile_table): row/null/distinct counts + numeric ranges —
    the ingest-gate stats a corpus pipeline checks before training."""
    return corpus.profile_table(
        _documents(spark, sf_dir),
        numeric_cols=["doc_id", "n_chars"],
        other_cols=["text", "lang", "source"],
    )

def q_gopher_rules(spark, sf_dir):
    """Gopher quality-rule battery (text.gopher_rules): the Rae et al.
    2021 §A.1.1 ruleset as per-rule boolean columns + the conjunction;
    paper-default thresholds (the 50-word floor lands at the fixture's
    median, so both outcomes are exercised)."""
    return text.gopher_rules(_documents(spark, sf_dir))

def q_bpe_merges(spark, sf_dir):
    """Tokenizer-training round 1 (text.bpe_merge_candidates): top-20
    adjacent character pairs by word-frequency-weighted count — the
    merges BPE would learn first, computed on the vocabulary table."""
    return text.bpe_merge_candidates(_documents(spark, sf_dir), k=20)

def q_bpe_vocab_k(spark, sf_dir):
    """Iterative BPE tokenizer training, 3 merge rounds
    (text.bpe_vocab over text.bpe_train — r7 verdict item #4: round 1
    alone was bpe_merges): per round, count adjacent symbol pairs on
    the word-frequency table, argmax with deterministic tie-breaks,
    apply with BPE's greedy left-to-right non-overlap semantics —
    expressed as pure window functions (runs of consecutive matches
    merge at even offsets), so the DuckDB oracle replays the identical
    windows and the hash pins the whole loop: counting, tie-breaks,
    greedy application, and the cross-round dependency (each round's
    top pair exists only because of the previous round's merge).
    Per-round eager localCheckpoint truncates the doubling lineage
    (the star-CC lesson). Output: top-40 post-training vocabulary."""
    return text.bpe_vocab(_documents(spark, sf_dir), rounds=3, k=40)

def q_bpe_encode(spark, sf_dir):
    """Trained-tokenizer APPLICATION (text.bpe_encode_counts): per-doc
    token counts under the 3-round BPE vocabulary of [[q_bpe_vocab_k]]
    — the serving path a shipped tokenizer runs. The corpus pays one
    tokenize pass + one broadcast vocabulary join; n_tokens_bpe weakly
    decreases as rounds grow (pytest pins the progress contract).
    Oracle reuses the training CTE chain verbatim plus the same
    LEFT-join/coalesce encode step."""
    return text.bpe_encode_counts(_documents(spark, sf_dir), rounds=3)

def q_bm25_scores(spark, sf_dir):
    """Okapi BM25 retrieval scoring (text.bm25_scores) over the fixed
    literal query terms — the lexical-search sibling of the embedding
    ANN family: one tokenize scan, match-filtered before the shuffle,
    df via a count window over per-(doc, term) rows, corpus stats
    broadcast. Lucene's non-negative idf variant; ln (not log10) on
    both engines."""
    return text.bm25_scores(_documents(spark, sf_dir))

def q_host_cap(spark, sf_dir):
    """C4-style per-host cap (corpus.host_cap): at most K docs per
    source with md5-deterministic survivors — one host-keyed shuffle +
    WindowGroupLimit, so a billion-page domain costs cap+1 rows per
    map task, not a sort of its crawl. cap=40 binds at sf0.01 (sources
    hold ~100 docs each)."""
    return corpus.host_cap(_documents(spark, sf_dir), cap=40)

def q_quality_auc(spark, sf_dir):
    """Classifier-eval AUC (corpus.ranking_auc): does the C4/Gopher
    quality heuristic rank English docs above the rest? Mann-Whitney
    rank-sum in its distinct-score form — the only corpus-sized
    operation is one groupBy on the (quantized) score; the rank walk
    runs over the distinct-score table. Composes quality_score with
    the lang label; counts integer + exact-half tie terms ⇒ every
    intermediate double exact, one final division."""
    from pyspark.sql import functions as F

    from ...operators import corpus as corpus_ops

    docs = _documents(spark, sf_dir)
    scored = (
        text.quality_score(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            F.col("quality").alias("score"),
            (F.col("lang") == "en").alias("label"),
        )
    )
    return corpus_ops.ranking_auc(scored)

# Okapi BM25 replay (Lucene non-negative idf); shared verbatim by the
# bm25_scores oracle and hybrid_retrieval_rrf's lexical arm
_BM25_SQL = r"""WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> '') AS ws
  FROM documents
),
d AS (SELECT doc_id, len(ws) AS dl, ws FROM toks WHERE len(ws) > 0),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
m AS (SELECT doc_id, dl, unnest(ws) AS term FROM d),
tf AS (
  SELECT doc_id, dl, term, count(*) AS tf FROM m
  WHERE term IN ('spark', 'query', 'window', 'stream', 'filter')
  GROUP BY doc_id, dl, term
),
wdf AS (SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf)
SELECT doc_id, count(*)::BIGINT AS n_matched,
       round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                 * (tf * 2.2)
                 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS bm25
FROM wdf, stats
GROUP BY doc_id"""

# Shared bigram-LM fragments: the corpus bigram model + per-doc mean
# log-probability, used verbatim by the bigram_logprob oracle and
# composed (as CTE ``sc``) by lm_perplexity_buckets — one definition,
# no literal twins (the r12 verdict item #2 discipline).
_BIGRAM_CTES = f"""docs AS (
  SELECT doc_id, ws FROM (SELECT doc_id, {WORDS_SQL} AS ws FROM documents)
  WHERE len(ws) >= 2
),
bi AS (
  SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM (
    SELECT doc_id,
           unnest([{{'w1': ws[i], 'w2': ws[i+1]}}
                   for i in range(1, len(ws))]) AS bg
    FROM docs)
),
c AS (
  SELECT doc_id,
         count(*) OVER (PARTITION BY w1, w2) AS n2,
         count(*) OVER (PARTITION BY w1) AS n1
  FROM bi
)"""

_BIGRAM_SCORE_SELECT = """SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       round(avg(ln(n2::DOUBLE / n1)), 7) AS avg_logprob
FROM c GROUP BY doc_id"""

# DuckDB oracle SQL for this domain's registered queries —
# assembled (registration order restored) into plans.registry.ORACLES.
ORACLE_SQL: dict[str, str] = {
    "text_stats": TEXT_STATS_SQL,
    "quality_score": f"""
WITH s AS ({TEXT_STATS_SQL})
SELECT doc_id, n_words,
       {quality_sum_stats_sql()} AS quality,
       {quality_sum_stats_sql()} >= {QUALITY_GATE} AS is_quality
FROM s""",
    "token_counts": f"""
SELECT doc_id,
       len({WORDS_SQL})::BIGINT AS ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))::BIGINT AS regex_tokens
FROM documents""",
    "lang_id": f"""
WITH s AS (
  SELECT doc_id, lang,
         len(list_filter(ws, x -> x IN {LANGS_SQL['de']}))::BIGINT AS score_de,
         len(list_filter(ws, x -> x IN {LANGS_SQL['en']}))::BIGINT AS score_en,
         len(list_filter(ws, x -> x IN {LANGS_SQL['es']}))::BIGINT AS score_es,
         len(list_filter(ws, x -> x IN {LANGS_SQL['fr']}))::BIGINT AS score_fr
  FROM (SELECT doc_id, lang, {WORDS_SQL} AS ws FROM documents)
)
SELECT doc_id, lang, score_de, score_en, score_es, score_fr,
       CASE WHEN {_GREATEST} = 0 THEN 'und'
            WHEN score_de = {_GREATEST} THEN 'de'
            WHEN score_en = {_GREATEST} THEN 'en'
            WHEN score_es = {_GREATEST} THEN 'es'
            ELSE 'fr' END AS predicted_lang,
       (CASE WHEN {_GREATEST} = 0 THEN 'und'
             WHEN score_de = {_GREATEST} THEN 'de'
             WHEN score_en = {_GREATEST} THEN 'en'
             WHEN score_es = {_GREATEST} THEN 'es'
             ELSE 'fr' END) = lang AS label_match
FROM s""",
    "doc_fingerprint": f"""
SELECT doc_id, md5({NORM_TEXT_SQL}) AS fingerprint,
       length(text)::BIGINT AS n_chars
FROM documents""",
    "bigram_logprob": f"""
WITH {_BIGRAM_CTES}
{_BIGRAM_SCORE_SELECT}""",
    # CCNet-style LM bucketing: the SAME score chain, per-language
    # rounded tercile cuts (quantile_cont == Spark percentile), labels
    # compared rounded-to-rounded (the market_regime idiom)
    "lm_perplexity_buckets": f"""
WITH {_BIGRAM_CTES},
sc AS (
  {_BIGRAM_SCORE_SELECT}
),
sl AS (
  SELECT sc.doc_id, d.lang, sc.n_bigrams, sc.avg_logprob
  FROM sc JOIN documents d USING (doc_id)
),
cuts AS (
  SELECT lang,
         round(quantile_cont(avg_logprob, 0.33), 9) AS c_low,
         round(quantile_cont(avg_logprob, 0.66), 9) AS c_high
  FROM sl GROUP BY lang
)
SELECT sl.doc_id, sl.lang, sl.n_bigrams, sl.avg_logprob,
       CASE WHEN sl.avg_logprob <= c.c_low THEN 'tail'
            WHEN sl.avg_logprob <= c.c_high THEN 'middle'
            ELSE 'head' END AS bucket
FROM sl JOIN cuts c USING (lang)""",
    # tokenizer-fit report: exact integer sums, one rounded division
    # each — fertility (BPE tokens per word) and chars-per-token
    "bpe_fertility": f"""
{_bpe_encode_ctes()},
wchars AS (
  SELECT doc_id,
         list_sum(list_transform(ws, x -> length(x)))::BIGINT AS n_word_chars
  FROM (SELECT doc_id, {WORDS_SQL} AS ws FROM documents)
  WHERE len(ws) > 0
)
SELECT d.lang, count(*)::BIGINT AS n_docs,
       sum(e.n_words)::BIGINT AS n_words,
       sum(e.n_tokens_bpe)::BIGINT AS n_tokens_bpe,
       sum(w.n_word_chars)::BIGINT AS n_word_chars,
       round(sum(e.n_tokens_bpe)::DOUBLE / sum(e.n_words), 9) AS fertility,
       round(sum(w.n_word_chars)::DOUBLE / sum(e.n_tokens_bpe), 9) AS chars_per_token
FROM enc e JOIN documents d USING (doc_id) JOIN wchars w USING (doc_id)
GROUP BY d.lang""",
    "repetition_stats": f"""
WITH base AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                     l -> l <> '') AS ls,
         {WORDS_SQL} AS ws
  FROM documents
),
line_stats AS (
  SELECT doc_id,
         len(ls)::BIGINT AS n_lines,
         len(list_distinct(ls))::BIGINT AS n_distinct_lines,
         CASE WHEN len(ls) > 0
              THEN (len(ls) - len(list_distinct(ls)))::DOUBLE / len(ls) END
           AS dup_line_ratio,
         len(ws)::BIGINT AS n_words
  FROM base
),
wf AS (
  SELECT doc_id, max(n)::DOUBLE / sum(n) AS top_word_share
  FROM (
    SELECT doc_id, w, count(*) AS n
    FROM (SELECT doc_id, unnest({WORDS_SQL}) AS w FROM documents)
    GROUP BY doc_id, w
  ) GROUP BY doc_id
)
SELECT l.doc_id, n_lines, n_distinct_lines, dup_line_ratio, n_words,
       top_word_share
FROM line_stats l LEFT JOIN wf USING (doc_id)""",
    "tfidf_top_terms": f"""
WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest({WORDS_SQL}) AS term FROM documents)
  GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tf.term AS term, tf,
         round(tf * ln(n_docs::DOUBLE / df), 7) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT doc_id, term, tf, tfidf, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
  )::BIGINT AS rank FROM scored
) WHERE rank <= 3""",
    "top_terms": f"""
WITH tok AS (SELECT lang, unnest({WORDS_SQL}) AS term FROM documents),
cnt AS (SELECT lang, term, count(*)::BIGINT AS n FROM tok GROUP BY lang, term),
r AS (SELECT lang, term, n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, term ASC)::BIGINT AS "rank"
      FROM cnt)
SELECT lang, term, n, "rank" FROM r WHERE "rank" <= {TOP_TERMS_K}""",
    # plain string (not f-string): the regex quantifiers use literal braces
    "redact_pii": """
WITH s1 AS (
  SELECT doc_id, text,
         regexp_replace(text, 'https?://[^\\s]+', '<URL>', 'g') AS t1
  FROM documents),
s2 AS (
  SELECT *, regexp_replace(t1, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g') AS t2
  FROM s1),
s3 AS (
  SELECT *, regexp_replace(t2, '[0-9]{6,}', '<NUM>', 'g') AS t3
  FROM s2)
SELECT doc_id,
       len(regexp_extract_all(text, 'https?://[^\\s]+'))::BIGINT AS n_urls,
       len(regexp_extract_all(t1, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
       len(regexp_extract_all(t2, '[0-9]{6,}'))::BIGINT AS n_long_numbers,
       t3 AS redacted_text,
       md5(t3) AS redacted_md5
FROM s3""",
    "doc_length_quantiles": """
SELECT lang, count(*)::BIGINT AS n_docs,
       quantile_cont(n_chars, 0.25) AS p25,
       quantile_cont(n_chars, 0.5)  AS p50,
       quantile_cont(n_chars, 0.75) AS p75,
       quantile_cont(n_chars, 0.95) AS p95
FROM documents GROUP BY lang""",
    "doc_length_quantiles_approx": """
SELECT lang, count(*)::BIGINT AS n_docs,
       quantile_disc(n_chars, 0.25) AS p25,
       quantile_disc(n_chars, 0.5)  AS p50,
       quantile_disc(n_chars, 0.75) AS p75,
       quantile_disc(n_chars, 0.95) AS p95
FROM documents GROUP BY lang""",
    "gopher_rules": r"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> '') AS ws,
         regexp_split_to_array(text, '\n') AS lines,
         text
  FROM documents
),
m AS (
  SELECT doc_id,
         len(ws) AS n,
         length(array_to_string(ws, '')) / len(ws) AS mean_word_len,
         (len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.'))) / len(ws) AS symbol_ratio,
         len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) / len(lines) AS bullet_line_frac,
         len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) / len(lines) AS ellipsis_line_frac,
         len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) / len(ws) AS alpha_word_frac,
         len(list_filter(['the','be','to','of','and','that','have','with'], s -> list_contains(ws, s))) AS stopword_hits
  FROM base
),
r AS (
  SELECT doc_id, n,
         CASE WHEN n > 0 THEN n >= 50 AND n <= 100000 ELSE FALSE END AS r_word_count,
         CASE WHEN n > 0 THEN mean_word_len >= 3.0 AND mean_word_len <= 10.0 ELSE FALSE END AS r_mean_word_len,
         CASE WHEN n > 0 THEN symbol_ratio < 0.1 ELSE FALSE END AS r_symbol_ratio,
         CASE WHEN n > 0 THEN bullet_line_frac < 0.90 ELSE FALSE END AS r_bullet_lines,
         CASE WHEN n > 0 THEN ellipsis_line_frac < 0.30 ELSE FALSE END AS r_ellipsis_lines,
         CASE WHEN n > 0 THEN alpha_word_frac >= 0.80 ELSE FALSE END AS r_alpha_words,
         CASE WHEN n > 0 THEN stopword_hits >= 2 ELSE FALSE END AS r_stopwords
  FROM m
)
SELECT doc_id, n::BIGINT AS n_words,
       r_word_count, r_mean_word_len, r_symbol_ratio, r_bullet_lines,
       r_ellipsis_lines, r_alpha_words, r_stopwords,
       (r_word_count AND r_mean_word_len AND r_symbol_ratio AND r_bullet_lines
        AND r_ellipsis_lines AND r_alpha_words AND r_stopwords) AS passes_gopher
FROM r""",
    "documents_profile": """
SELECT 'doc_id' AS column, count(*)::BIGINT AS n_rows,
       (count(*) - count(doc_id))::BIGINT AS n_nulls,
       count(DISTINCT doc_id)::BIGINT AS n_distinct,
       min(doc_id)::DOUBLE AS min_value, max(doc_id)::DOUBLE AS max_value
FROM documents
UNION ALL
SELECT 'n_chars', count(*)::BIGINT, (count(*) - count(n_chars))::BIGINT,
       count(DISTINCT n_chars)::BIGINT, min(n_chars)::DOUBLE, max(n_chars)::DOUBLE
FROM documents
UNION ALL
SELECT 'text', count(*)::BIGINT, (count(*) - count(text))::BIGINT,
       count(DISTINCT text)::BIGINT, NULL::DOUBLE, NULL::DOUBLE
FROM documents
UNION ALL
SELECT 'lang', count(*)::BIGINT, (count(*) - count(lang))::BIGINT,
       count(DISTINCT lang)::BIGINT, NULL::DOUBLE, NULL::DOUBLE
FROM documents
UNION ALL
SELECT 'source', count(*)::BIGINT, (count(*) - count(source))::BIGINT,
       count(DISTINCT source)::BIGINT, NULL::DOUBLE, NULL::DOUBLE
FROM documents""",
    # the gopher_rules oracle's rule battery (min_stopword_hits=1, the
    # curation_pipeline_v2 setting) carried per (source, lang) and rolled
    # up — counts are exact integers; only the final rate divides
    "corpus_quality_report": r"""
WITH base AS (
  SELECT doc_id, source, lang,
         list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> '') AS ws,
         regexp_split_to_array(text, '\n') AS lines,
         text
  FROM documents
),
m AS (
  SELECT doc_id, source, lang,
         len(ws) AS n,
         length(array_to_string(ws, '')) / len(ws) AS mean_word_len,
         (len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.'))) / len(ws) AS symbol_ratio,
         len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) / len(lines) AS bullet_line_frac,
         len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) / len(lines) AS ellipsis_line_frac,
         len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) / len(ws) AS alpha_word_frac,
         len(list_filter(['the','be','to','of','and','that','have','with'], s -> list_contains(ws, s))) AS stopword_hits
  FROM base
),
r AS (
  SELECT source, lang, n,
         CASE WHEN n > 0 THEN n >= 50 AND n <= 100000 ELSE FALSE END AS r_word_count,
         CASE WHEN n > 0 THEN mean_word_len >= 3.0 AND mean_word_len <= 10.0 ELSE FALSE END AS r_mean_word_len,
         CASE WHEN n > 0 THEN symbol_ratio < 0.1 ELSE FALSE END AS r_symbol_ratio,
         CASE WHEN n > 0 THEN bullet_line_frac < 0.90 ELSE FALSE END AS r_bullet_lines,
         CASE WHEN n > 0 THEN ellipsis_line_frac < 0.30 ELSE FALSE END AS r_ellipsis_lines,
         CASE WHEN n > 0 THEN alpha_word_frac >= 0.80 ELSE FALSE END AS r_alpha_words,
         CASE WHEN n > 0 THEN stopword_hits >= 1 ELSE FALSE END AS r_stopwords
  FROM m
),
p AS (
  SELECT *, (r_word_count AND r_mean_word_len AND r_symbol_ratio
             AND r_bullet_lines AND r_ellipsis_lines AND r_alpha_words
             AND r_stopwords) AS passes
  FROM r
)
SELECT source, lang,
       count(*)::BIGINT AS n_docs,
       sum(n)::BIGINT AS total_words,
       sum(r_word_count::INT)::BIGINT AS n_r_word_count,
       sum(r_mean_word_len::INT)::BIGINT AS n_r_mean_word_len,
       sum(r_symbol_ratio::INT)::BIGINT AS n_r_symbol_ratio,
       sum(r_bullet_lines::INT)::BIGINT AS n_r_bullet_lines,
       sum(r_ellipsis_lines::INT)::BIGINT AS n_r_ellipsis_lines,
       sum(r_alpha_words::INT)::BIGINT AS n_r_alpha_words,
       sum(r_stopwords::INT)::BIGINT AS n_r_stopwords,
       sum(passes::INT)::BIGINT AS n_pass,
       round(sum(passes::INT)::DOUBLE / count(*), 9) AS pass_rate
FROM p GROUP BY source, lang""",
    "vocab_coverage": f"""
WITH toks AS (SELECT unnest({WORDS_SQL}) AS tok FROM documents),
counts AS (SELECT tok, count(*)::BIGINT AS cnt FROM toks GROUP BY tok),
ranked AS (SELECT tok, cnt,
                  row_number() OVER (ORDER BY cnt DESC, tok) AS r
           FROM counts),
total AS (SELECT count(*)::BIGINT AS total_tokens FROM toks)
SELECT k, count(*)::BIGINT AS vocab_size, sum(cnt)::BIGINT AS covered_tokens,
       (SELECT total_tokens FROM total) AS total_tokens,
       round(sum(cnt)::DOUBLE / (SELECT total_tokens FROM total), 9) AS coverage
FROM (VALUES (100), (1000), (10000)) ks(k)
JOIN ranked ON r <= k
GROUP BY k""",
    "bpe_vocab_k": _bpe_sql(rounds=3, k=40),
    "bpe_encode": _bpe_encode_sql(rounds=3),
    "bpe_merges": r"""
WITH wf AS (
  SELECT w, count(*) AS n FROM (
    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS w
    FROM documents)
  GROUP BY w HAVING length(w) >= 2
),
idx AS (SELECT w, n, unnest(generate_series(1, length(w) - 1)) AS i FROM wf),
pairs AS (SELECT substring(w, i, 2) AS pair, n FROM idx),
counts AS (SELECT pair, sum(n)::BIGINT AS n_occurrences FROM pairs GROUP BY pair)
SELECT pair, n_occurrences, rank FROM (
  SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, pair) AS rank
  FROM counts) WHERE rank <= 20""",
    # Okapi BM25, Lucene non-negative idf ln(1 + (N-df+.5)/(df+.5));
    # expression shapes mirror text.bm25_scores term-for-term (ln, not
    # log10; 2.2 = k1+1; 0.25 = 1-b) so doubles agree to ~1e-14, far
    # under the round-6 grid
    "bm25_scores": _BM25_SQL,
    # per-host cap: md5-priority row_number, survivors deterministic
    "host_cap": """
SELECT doc_id, host, keep_rank FROM (
  SELECT doc_id, source AS host,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5('hostcap' || doc_id::VARCHAR), doc_id
         ) AS keep_rank
  FROM documents)
WHERE keep_rank <= 40""",
    # AUC via distinct-score Mann-Whitney: integers + exact halves
    "quality_auc": f"""
WITH s AS ({TEXT_STATS_SQL}),
q AS (
  SELECT s.doc_id,
         {quality_sum_stats_sql()} AS score,
         (d.lang = 'en') AS label
  FROM s JOIN documents d ON s.doc_id = d.doc_id
),
c AS (
  SELECT score AS sv,
         sum(CASE WHEN label THEN 1 ELSE 0 END) AS p,
         sum(CASE WHEN label THEN 0 ELSE 1 END) AS n
  FROM q GROUP BY score
),
b AS (
  SELECT *, coalesce(sum(n) OVER (ORDER BY sv
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
  FROM c
)
SELECT round(CASE WHEN sum(p) > 0 AND sum(n) > 0
             THEN sum(p * neg_below + 0.5 * p * n) / (sum(p) * sum(n)) END, 6) AS auc,
       round(sum(p * neg_below + 0.5 * p * n), 1) AS u_stat,
       sum(p)::BIGINT AS n_pos, sum(n)::BIGINT AS n_neg
FROM b""",
}
