"""Query + oracle registry: the driver-facing correctness surface.

Every implemented operator from SURVEY §2 appears here as a named query
(builder taking ``(spark, sf_dir)``) with, where SQL-expressible, a
DuckDB oracle computing the identical result from the same parquet
fixtures. Column names/aliases are pinned identical on both sides
(the driver hashes values under a by-name column sort).

The EMA family (ema_20 / macd) is oracle-checked via the closed form of
``ewm(adjust=False)``:  with w = 1 - 2/(span+1),

    e_t = w^t * p_0 + (1-w) * sum_{i=1..t} w^(t-i) * p_i
        = w^t * (p_0 + alpha * (S_t - p_0)),   S_t = sum_{i<=t} w^(-i) p_i

S_t is a plain prefix-sum window, so DuckDB can express the recursion
exactly (numerically safe at oracle scale: groups are ~10^2 rows at
sf0.01, so w^(-i) stays far below double overflow).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators import (
    corpus,
    dedup,
    derive,
    graph,
    multimodal,
    relational,
    sampling,
    similarity,
    text,
)
from ..operators.indicators import technical_indicators
from ..sources import envelope
from . import serving

# ---------------------------------------------------------------------------
# Shared oracle CTE fragments (DuckDB SQL over the pre-registered views)
# ---------------------------------------------------------------------------

PRICE_DATA_CTE = """
price_data AS (
  SELECT coin_id, exchange, timestamp, price, volume,
         CASE WHEN lag(price, 1)  OVER w <> 0 THEN price / lag(price, 1)  OVER w - 1 END AS change_1h,
         CASE WHEN lag(price, 4)  OVER w <> 0 THEN price / lag(price, 4)  OVER w - 1 END AS change_1d,
         CASE WHEN lag(price, 12) OVER w <> 0 THEN price / lag(price, 12) OVER w - 1 END AS change_1w,
         CASE WHEN lag(price, 24) OVER w <> 0 THEN price / lag(price, 24) OVER w - 1 END AS change_1m
  FROM (
    SELECT event_type || '_C' || user_id AS coin_id,
           event_type AS exchange,
           ts AS timestamp,
           value AS price,
           abs(value) * 100 AS volume,
           event_id
    FROM events) b
  WINDOW w AS (PARTITION BY coin_id ORDER BY timestamp, event_id)
)"""

COINS_CTE = """
coins AS (
  SELECT DISTINCT event_type || '_C' || user_id AS id,
         'Coin ' || user_id AS name,
         'C' || user_id AS symbol,
         event_type AS exchange
  FROM events
)"""

# open/close via struct-ordering min/max — ties on timestamp break by
# price, matching the engine's min/max(struct(timestamp, price)) in
# batch AND streaming (arg_min(price, timestamp) is arbitrary on ties).
OHLC_CTE = """
ohlc_data AS (
  SELECT coin_id, exchange, date_trunc('hour', timestamp) AS timestamp,
         (min({'t': timestamp, 'p': price})).p AS open,
         max(price) AS high,
         min(price) AS low,
         (max({'t': timestamp, 'p': price})).p AS close
  FROM price_data
  GROUP BY coin_id, exchange, date_trunc('hour', timestamp)
)"""

INDICATORS_CTE = """
ind0 AS (
  SELECT coin_id, exchange, timestamp, price,
         row_number() OVER wo AS rn,
         first_value(price) OVER wo AS p0,
         CASE WHEN count(*) OVER w20 = 20 THEN avg(price) OVER w20 END AS sma_20,
         price - lag(price) OVER wo AS delta
  FROM price_data
  WINDOW wo AS (PARTITION BY coin_id, exchange ORDER BY timestamp),
         w20 AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
),
ind1 AS (
  SELECT *,
         sum(price * power(19.0/21.0, -(rn-1))) OVER ws AS s20,
         sum(price * power(11.0/13.0, -(rn-1))) OVER ws AS s12,
         sum(price * power(25.0/27.0, -(rn-1))) OVER ws AS s26,
         CASE WHEN rn >= 14
              THEN avg(CASE WHEN delta > 0 THEN delta ELSE 0 END) OVER w14 END AS avg_gain,
         CASE WHEN rn >= 14
              THEN avg(CASE WHEN delta < 0 THEN -delta ELSE 0 END) OVER w14 END AS avg_loss
  FROM ind0
  WINDOW ws AS (PARTITION BY coin_id, exchange ORDER BY rn
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w14 AS (PARTITION BY coin_id, exchange ORDER BY rn
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
),
technical_indicators AS (
  SELECT coin_id, exchange, timestamp, sma_20,
         power(19.0/21.0, rn-1) * (p0 + (2.0/21.0) * (s20 - p0)) AS ema_20,
         CASE WHEN rn < 14 THEN NULL
              WHEN avg_loss = 0 AND avg_gain = 0 THEN NULL
              WHEN avg_loss = 0 THEN 100.0
              ELSE 100.0 - 100.0 / (1.0 + avg_gain / avg_loss) END AS rsi_14,
         power(11.0/13.0, rn-1) * (p0 + (2.0/13.0) * (s12 - p0))
           - power(25.0/27.0, rn-1) * (p0 + (2.0/27.0) * (s26 - p0)) AS macd
  FROM ind1
)"""

LATEST_CTES = """
latest_price AS (
  SELECT coin_id, exchange, timestamp AS price_ts, price, volume FROM (
    SELECT *, row_number() OVER (PARTITION BY coin_id, exchange
                                 ORDER BY timestamp DESC, price DESC, volume DESC) AS lrn
    FROM price_data) WHERE lrn = 1
),
latest_ohlc AS (
  SELECT coin_id, exchange, open, high, low, close FROM (
    SELECT *, row_number() OVER (PARTITION BY coin_id, exchange
                                 ORDER BY timestamp DESC, open DESC, high DESC,
                                          low DESC, close DESC) AS lrn
    FROM ohlc_data) WHERE lrn = 1
),
latest_ind AS (
  SELECT coin_id, exchange, sma_20, ema_20, rsi_14, macd FROM (
    SELECT *, row_number() OVER (PARTITION BY coin_id, exchange
                                 ORDER BY timestamp DESC, sma_20 DESC, ema_20 DESC,
                                          rsi_14 DESC, macd DESC) AS lrn
    FROM technical_indicators) WHERE lrn = 1
)"""


def _with(*ctes: str, select: str) -> str:
    return "WITH " + ",".join(ctes) + "\n" + select


# ---------------------------------------------------------------------------
# Builders
# ---------------------------------------------------------------------------

def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def q_coins(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive.coins(_events(spark, sf_dir))


def q_price_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive.price_data(_events(spark, sf_dir))


def q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive.ohlc_data(derive.price_data(_events(spark, sf_dir)))


def q_indicators(spark: SparkSession, sf_dir: str) -> DataFrame:
    return technical_indicators(derive.price_data(_events(spark, sf_dir)))


def q_market_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive.coin_market_cap(derive.price_data(_events(spark, sf_dir)))


def q_price_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    return serving.price_chart(q_price_data(spark, sf_dir), "C7", "1w")


def q_ohlc_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    return serving.ohlc_chart(q_ohlc(spark, sf_dir), "C7", "1w")


def q_indicator_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    return serving.indicator_chart(q_indicators(spark, sf_dir), "C7", limit=200)


def q_market_cap_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    return serving.market_cap_chart(q_market_cap(spark, sf_dir))


def q_coin_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    price = derive.price_data(ev)
    return serving.coin_table(
        derive.coins(ev), price, derive.ohlc_data(price), technical_indicators(price)
    )


def q_coin_display(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Presentation-layer string shaping (SURVEY F4): the reference
    capitalizes coin/exchange names for display (flask/app.py:139,194).
    initcap is Spark's word-capitalize; the oracle replays it per word
    (upper first char, lower rest)."""
    from pyspark.sql import functions as F

    return derive.coins(_events(spark, sf_dir)).select(
        "id",
        F.initcap("exchange").alias("exchange_display"),
        F.initcap(
            F.concat_ws(" ", F.col("exchange"), F.lit("coin"), F.col("symbol"))
        ).alias("title"),
    )


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


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


def q_contamination(spark, sf_dir):
    """Train/test decontamination report: shared-shingle counts between
    the deterministic hash split's train and test documents."""
    return dedup.cross_split_contamination(
        _documents(spark, sf_dir), n=3, max_df=100
    )


def q_curation_pipeline(spark, sf_dir):
    """The composed end-to-end corpus pipeline: quality gate -> exact
    dedup -> deterministic split -> decontamination -> per-(split,
    lang) manifest. One registered query proving the operators compose
    as DataFrames. persist_intermediate caches the (dimension-sized)
    deduped corpus across the pipeline's three consumers — the
    in-session stand-in for the stage-materialization boundary the
    operator docstring prescribes at 100 TB; results are identical
    either way (pinned in pytest)."""
    return corpus.curation_pipeline(
        _documents(spark, sf_dir), persist_intermediate=True
    )


def q_dataset_split(spark, sf_dir):
    """Deterministic train/val/test split by content hash: counts per
    (split, lang) — the reproducible-split primitive for training
    corpora (same key => same split across runs and engines)."""
    from pyspark.sql import functions as F

    return (
        sampling.train_val_test_split(_documents(spark, sf_dir), "doc_id")
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
    )


def q_deterministic_sample(spark, sf_dir):
    """Hash-threshold 10% sample of documents — reproducible and
    consistent (kept keys stay kept when the fraction grows)."""
    return sampling.deterministic_sample(
        _documents(spark, sf_dir), "doc_id", 0.1
    ).select("doc_id", "lang", "n_chars")


def q_exchange_cardinality(spark, sf_dir):
    """Distinct aggregation (absent in the reference, SURVEY §2.4):
    exact distinct coins + tick count per exchange. Spark expands
    count(DISTINCT) into a two-phase aggregate (dedup then count) with
    partial aggregation on both phases; approx_count_distinct (HLL,
    single-phase mergeable sketch) is the 100 TB alternative."""
    from pyspark.sql import functions as F

    return (
        _price_base(spark, sf_dir)
        .groupBy("exchange")
        .agg(
            F.countDistinct("coin_id").alias("n_coins"),
            F.count("*").alias("n_ticks"),
        )
    )


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


def q_exchange_cardinality_approx(spark, sf_dir):
    """The 100 TB variant of exchange_cardinality: HLL++ mergeable
    sketch (single-phase, map-side combinable, fixed memory per group)
    instead of the two-phase exact distinct. rsd=0.01 doubles the
    default precision at ~4x fewer registers than the 0.005 max tier
    (measured 6x faster; observed error <=0.7% at fixture scales).

    Driver-checkable contract: DuckDB's HLL produces different raw
    estimates by construction, so instead of emitting the estimate this
    emits the exact count plus an IN-PLAN accuracy bound
    (|approx - exact| / exact <= 0.05) as a boolean — the oracle states
    the bound as a literal TRUE and value-hash equality then verifies
    the sketch's accuracy, not its engine-specific register contents.
    The tighter per-scale error (<=2%) stays pinned by pytest
    (tests/test_sql_api.py)."""
    from pyspark.sql import functions as F

    exact = F.countDistinct("coin_id")
    approx = F.approx_count_distinct("coin_id", 0.01)
    return (
        _price_base(spark, sf_dir)
        .groupBy("exchange")
        .agg(
            exact.alias("n_coins"),
            F.count("*").alias("n_ticks"),
            # coalesce: a group whose key column is entirely NULL has
            # exact == 0, the ratio is NULL (non-ANSI /0), and the
            # contract is vacuously satisfied — the oracle's literal
            # TRUE must match in that degenerate case too
            F.coalesce(
                F.abs(approx - exact) / exact <= 0.05, F.lit(True)
            ).alias("approx_within_5pct"),
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


def q_exact_dedup(spark, sf_dir):
    return dedup.exact_dedup(_documents(spark, sf_dir))


# Registered df cap: a genuine posting-list bound (sum(df^2) per shingle
# <= cap * postings) that does NOT bind at fixture scale — max shingle df
# is 9/7/25 at sf0.001/0.01/0.1 — so capped results equal uncapped there
# (pinned by pytest); the oracle replays the cap's filtered-universe
# semantics so the row stays green even when the cap binds.
NGRAM_MAX_DF = 1000


def q_ngram_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(
        _documents(spark, sf_dir),
        n=3,
        threshold=0.5,
        max_df=NGRAM_MAX_DF,
        persist_intermediate=True,
    )


def q_dup_clusters(spark, sf_dir):
    """Canonical-doc resolution: connected components over the exact
    near-dup pair graph (min-label propagation, SURVEY M8 extension)."""
    # persist_intermediate stays OFF: dup_clusters persists the edge
    # frame itself, and the posting cache on top of that measured as a
    # net loss (0.25 s -> 0.39 s at sf0.1).
    pairs = dedup.ngram_jaccard_pairs(
        _documents(spark, sf_dir), n=3, threshold=0.5, max_df=NGRAM_MAX_DF
    )
    return dedup.dup_clusters(pairs)


def q_minhash_lsh(spark, sf_dir):
    # md5 family: same banded-LSH plan as the xxhash64 production
    # default, but reproducible in DuckDB => full three-way oracle row.
    # The xxhash64 default's recall vs exact Jaccard is pinned in pytest.
    return dedup.minhash_lsh_pairs(
        _documents(spark, sf_dir),
        n=3,
        threshold=0.5,
        hash_family="md5",
        persist_intermediate=True,
    )


def q_simhash_pairs(spark, sf_dir):
    # md5 family for oracle reproducibility (see q_minhash_lsh).
    # persist_intermediate OFF: the two self-join sides are IDENTICAL
    # subtrees, so ReuseExchange already computes the fingerprints once
    # (measured: no win from the cache).
    return dedup.simhash_pairs(
        _documents(spark, sf_dir), n=3, max_hamming=3, hash_family="md5"
    )


def q_knn_brute(spark, sf_dir):
    return similarity.knn_brute(load_table(spark, sf_dir, "embeddings"), k=5)


def q_kmeans_centroids(spark, sf_dir):
    """Two Lloyd rounds from the deterministic init: per-cluster size
    plus a digest of the refined centroid."""
    from pyspark.sql import functions as F

    cent = similarity.kmeans_centroids(
        load_table(spark, sf_dir, "embeddings"), iters=2
    )
    return cent.select(
        "cent_id",
        "n_members",
        similarity.digest_i6(F.col("cent")).alias("cent_digest"),
    )


def q_kmeans_fixed(spark, sf_dir):
    """The SCALE-SAFE k-means registration
    (similarity.kmeans_centroids centroid_limit=32): a fixed 32-seed
    init instead of the modulus rule's K = N/101 — per-round
    assignment cost N*K becomes linear in N (the modulus form
    measured 53x at 10x data; fixed K is the production shape, same
    dial as knn_ivf_fixed). Two Lloyd rounds, same digest output as
    the teaching form."""
    from pyspark.sql import functions as F

    cent = similarity.kmeans_centroids(
        load_table(spark, sf_dir, "embeddings"), iters=2, centroid_limit=32
    )
    return cent.select(
        "cent_id",
        "n_members",
        similarity.digest_i6(F.col("cent")).alias("cent_digest"),
    )


def q_knn_quantized(spark, sf_dir):
    """Top-k cosine over int8-quantized codes (exact integer-dot
    oracle, no rounding pin needed)."""
    return similarity.knn_quantized(load_table(spark, sf_dir, "embeddings"), k=5)


def q_embedding_normalize(spark, sf_dir):
    """L2 normalization with an engine-independent digest of the unit
    vector (the driver's canonicalizer cannot hash raw arrays)."""
    from pyspark.sql import functions as F

    norm = similarity.normalize_embeddings(load_table(spark, sf_dir, "embeddings"))
    return norm.select(
        "vec_id",
        F.round("l2_norm", 7).alias("l2_norm"),
        F.when(
            F.col("emb").isNotNull(), similarity.digest_i6(F.col("emb"))
        ).alias("emb_digest"),
    )


def q_embedding_quantize(spark, sf_dir):
    """Symmetric int8 quantization: per-vector scale plus a digest of
    the quantized codes."""
    from pyspark.sql import functions as F

    qt = similarity.quantize_embeddings(load_table(spark, sf_dir, "embeddings"))
    return qt.select(
        "vec_id",
        F.round("scale", 7).alias("scale"),
        F.when(
            F.col("q").isNotNull(),
            F.md5(F.concat_ws(",", F.transform("q", lambda x: x.cast("string")))),
        ).alias("q_digest"),
    )


def q_knn_lsh(spark, sf_dir):
    return similarity.knn_lsh(load_table(spark, sf_dir, "embeddings"), k=5)


def q_knn_lsh_multiprobe(spark, sf_dir):
    """Multiprobe sign-bit LSH (similarity.knn_lsh multiprobe=True):
    own bucket + all Hamming-1 buckets — the recall/cost dial, recall
    ~3x single-probe on the fixtures (pinned by knn_recall)."""
    return similarity.knn_lsh(
        load_table(spark, sf_dir, "embeddings"), k=5, multiprobe=True
    )


def q_knn_brute_vectorized(spark, sf_dir):
    """round_decimals=9 pins the BLAS-summation cosine to a precision
    where it equals the SQL left-fold dot product exactly, making the
    result (incl. rank ties) oracle-checkable.

    The probe matrix (the index-build step) is read locally with the
    modulo predicate pushed into the parquet scan (DuckDB), so only the
    ~2% probe rows ever reach driver memory and building this plan
    never runs a Spark job; the cluster only sees the declarative
    mapInPandas scan. On a real deployment the probes would come from
    a previously persisted probe table the same way.
    """
    import os

    import duckdb
    import numpy as np

    from ..catalog import table_path

    path = table_path(sf_dir, "embeddings")
    if os.path.isdir(path):  # Spark-written dataset dir vs single file
        # recursive glob: a partitioned/nested layout must not silently
        # yield zero probes (ADVICE r4)
        path = os.path.join(path, "**", "*.parquet")
    probes = duckdb.sql(
        "SELECT vec_id, embedding AS emb"
        f" FROM '{path}'"
        " WHERE vec_id % 50 = 0 ORDER BY vec_id"
    ).df()
    if probes.empty and duckdb.sql(f"SELECT count(*) FROM '{path}'").fetchone()[0]:
        # an empty TABLE legitimately yields zero probes; zero probes
        # from a non-empty table means the glob missed the layout
        raise ValueError(
            f"knn_brute_vectorized: probe scan of {path!r} returned no rows"
            " from a non-empty source — layout the modulo filter missed?"
        )
    # match _as_double's float->double widening (exact, value-preserving)
    probes["emb"] = probes["emb"].map(lambda a: np.asarray(a, dtype=np.float64))
    return similarity.knn_brute_vectorized(
        load_table(spark, sf_dir, "embeddings"),
        k=5,
        probes=probes.reset_index(drop=True),
        round_decimals=9,
    )


def q_knn_ivf(spark, sf_dir):
    return similarity.knn_ivf(load_table(spark, sf_dir, "embeddings"), k=5)


def q_knn_ivf_trained(spark, sf_dir):
    """IVF search against the TRAINED coarse index: kmeans_centroids'
    two Lloyd rounds feed knn_ivf's ``centroids=`` hook — one lazy
    plan (train + assign + search), closing the loop the similarity
    docstrings promise.

    The centroid frame is persisted: the search consumes the
    assignment ranking twice (inverted lists + probe lists), and
    without the cache each consumer would re-run the full training
    subtree (observed: 13 parquet scans in the executed plan vs 5
    with the cache). k x dim rows — the same train-once/search-many
    materialization boundary a real deployment has, where the trained
    index is a persisted table. No job runs at plan construction
    (persist is lazy)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cent = similarity.kmeans_centroids(emb, iters=2).persist()
    return similarity.knn_ivf(emb, k=5, centroids=cent, persist_assignment=True)


def q_embedding_dup(spark, sf_dir):
    # persist_intermediate OFF: identical self-join subtrees hit
    # ReuseExchange; forcing the cache measured 3.2 s -> 4.3 s at sf0.1.
    return similarity.embedding_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.5
    )


def q_knn_recall(spark, sf_dir):
    """ANN quality contract (similarity.knn_recall): recall@5 of the
    LSH and IVF indexes against brute-force ground truth, with a
    meets_floor boolean per method — approximate-search QUALITY is
    hash-verified, not just determinism."""
    return similarity.knn_recall(load_table(spark, sf_dir, "embeddings"), k=5)


def q_media_decode_ppm(spark, sf_dir):
    """REAL bytes→pixels decode (multimodal.decode_ppm): spec-compliant
    binary PPM payloads synthesized per doc, then header-parsed and
    pixel-decoded with numpy — channel means come from actual decoded
    pixels, closing the r4 'decode is a stub' gap for one format."""
    return multimodal.decode_ppm(
        multimodal.ppm_table(_documents(spark, sf_dir))
    )


def q_media_decode_bmp(spark, sf_dir):
    """REAL bytes→pixels decode for BMP (multimodal.decode_bmp over
    multimodal.bmp_table) — fifth real-codec format (PPM, WAV, PNG,
    JPEG, now BMP), covering the format's three semantic hazards:
    bottom-up row storage, BGR channel order, 4-byte row padding.
    The (px01_*) image-space corner pixel makes each hazard
    hash-visible (channel means alone are invariant under row and
    channel reshuffles); same closed-form pixel pattern as
    media_decode_ppm, so the oracle needs no decoder."""
    return multimodal.decode_bmp(
        multimodal.bmp_table(_documents(spark, sf_dir))
    )


def q_media_decode_gif(spark, sf_dir):
    """REAL bytes→pixels decode for GIF89a (multimodal.decode_gif over
    multimodal.gif_table) — sixth real-codec format, and the first
    with a COMPRESSION codec written both directions from scratch
    (variable-width LSB-first LZW with CLEAR/EOI, width bumps, dict
    reset, and the KwKwK case — fuzz-roundtripped in pytest): header,
    screen descriptor, 256-entry global color table, sub-block
    reassembly, LZW decode, palette lookup. Pixel i's palette index
    is (d+i)%256 and palette entry j is (j, 2j%256, 3j%256), so the
    oracle replays the channel means without decoding."""
    return multimodal.decode_gif(
        multimodal.gif_table(_documents(spark, sf_dir))
    )


def q_media_frames_gif(spark, sf_dir):
    """REAL video-frame extraction via animated GIF
    (multimodal.gif_frames_real over multimodal.gif_table_animated) —
    the r7-verdict item closing the last stubbed modality with the
    engine's own LZW codec, no external library: each payload is
    2 + d%3 full frames behind graphics-control extensions
    (delay = 10 + d%5 cs), parsed by the multi-descriptor walk with
    disposal-1 compositing ([[_parse_gif_frames]]; partial-frame
    compositing pinned by handcrafted payloads in pytest). Frame f's
    pixel i has palette index (d + 17f + i) % 256, so per-frame
    channel means AND frame_ts = f*delay/100 replay closed-form in
    SQL — the hash covers the GCE delay read, the per-frame LZW
    decode, and the frame fan-out."""
    return multimodal.gif_frames_real(
        multimodal.gif_table_animated(_documents(spark, sf_dir))
    )


def q_media_frames_gif2(spark, sf_dir):
    """GIF disposal-2/3 + transparency frame extraction
    (multimodal.gif_frames_real over multimodal.gif_table_disposal) —
    the r8-verdict item closing the most user-visible decode
    restriction: real animations overwhelmingly use restore-to-
    background, restore-to-previous, and transparent-pixel partial
    updates. Each payload is 3 frames: a full disposal-2 frame, a
    partial transparent disposal-3 rect, and a top-row overwrite; the
    displayed canvas of every frame is a CASE expression over
    (doc_id, pixel position), so the hash covers the GCE transparency
    read, the background restore, the previous-canvas restore, and the
    masked composite ([[_parse_gif_frames]])."""
    return multimodal.gif_frames_real(
        multimodal.gif_table_disposal(_documents(spark, sf_dir))
    )


def q_media_decode_jpeg(spark, sf_dir):
    """REAL bytes→pixels decode for baseline grayscale JPEG
    (multimodal.decode_jpeg over multimodal.jpeg_table) — the lossy
    format made EXACTLY decodable: flat 8x8 blocks keep only the DC
    coefficient and q[DC]=8 makes the DC-only IDCT exact in IEEE
    doubles, so the closed-form block means replay in SQL with no
    tolerance. The decoder is the real pipeline — marker walk,
    canonical Huffman decode over the 0xFF00-unstuffed bitstream, DC
    prediction, dequantization, separable float IDCT. Built in r6
    with pytest-only evidence; registered r7 so the codec earns a
    driver-hash row like the other five formats."""
    return multimodal.decode_jpeg(
        multimodal.jpeg_table(_documents(spark, sf_dir))
    )


def q_media_resize(spark, sf_dir):
    """REAL pixel resample (multimodal.resize_pixels, closes the r6
    resize stub — verdict r6 item #4): the PPM corpus decoded,
    nearest-resampled to 6x5 with pure-integer index mapping
    (src = (dst * src_size) // dst_size — upsamples width 4-5,
    downsamples 7-8, identity at 6, so both directions are exercised),
    re-encoded as spec-compliant P6, then channel-meaned through
    decode_ppm. The oracle replays the exact index arithmetic in SQL:
    output pixel (ro, co) reads source index
    ((ro*h)//5)*w + (co*w)//6 whose channels are closed-form in
    doc_id — integer-exact, tolerance-free."""
    return multimodal.decode_ppm(
        multimodal.resize_pixels(
            multimodal.ppm_table(_documents(spark, sf_dir)),
            target_w=6,
            target_h=5,
        )
    )


def q_url_dedup(spark, sf_dir):
    """URL-level dedup (dedup.url_dedup) over deterministic synthetic
    URLs: host from source, bucketed path from doc_id, plus www./
    trailing-slash/query-string spelling variants that normalization
    must collapse."""
    from pyspark.sql import functions as F

    docs = _documents(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.when(F.col("doc_id") % 5 == 0, F.lit("www.")).otherwise(F.lit("")),
            F.col("source"),
            F.lit(".example.com/p/"),
            (F.col("doc_id") % 97).cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("/")).otherwise(F.lit("")),
            F.lit("?id="),
            F.col("doc_id").cast("string"),
            F.lit("&utm_source=feed"),
        ).alias("url"),
    )
    return dedup.url_dedup(docs)


def q_vwap_stream_replay(spark, sf_dir):
    """Driver-checkable STREAMING evidence (pipeline.vwap_stream_replay):
    the watermarked tumbling-VWAP stream replayed to completion over a
    spooled feed; emitted windows must hash-match the batch vwap_hourly
    oracle exactly (batch===stream)."""
    from ..streaming.pipeline import vwap_stream_replay

    return vwap_stream_replay(spark, _price_base(spark, sf_dir))


def q_media_metadata(spark, sf_dir):
    return multimodal.media_metadata(_documents(spark, sf_dir))


def q_media_features(spark, sf_dir):
    # Flat (per-dim column) shape: hashable by the driver's canonicalizer
    # and bit-reproducible in SQL; the array-returning decode_features
    # stays the internal composition surface.
    return multimodal.decode_features_flat(
        multimodal.media_table(_documents(spark, sf_dir))
    )


def q_frame_schedule(spark, sf_dir):
    return multimodal.frame_schedule(
        multimodal.media_table(_documents(spark, sf_dir)), every_s=10.0
    )


def q_media_frames(spark, sf_dir):
    return multimodal.extract_frames_flat(
        multimodal.media_table(_documents(spark, sf_dir)), every_s=10.0
    )


# ---------------------------------------------------------------------------
# Envelope (M3) + relational-stretch builders
# ---------------------------------------------------------------------------


def _decoded(spark: SparkSession, sf_dir: str):
    return envelope.decode_envelopes(
        envelope.build_envelopes(_events(spark, sf_dir))
    )


def q_envelope_price(spark, sf_dir):
    return envelope.decode_price(_decoded(spark, sf_dir))


def q_envelope_coins(spark, sf_dir):
    return envelope.decode_coins(_decoded(spark, sf_dir))


def q_envelope_ohlc(spark, sf_dir):
    return envelope.decode_ohlc(_decoded(spark, sf_dir))


def q_envelope_mcap(spark, sf_dir):
    return envelope.decode_market_cap(_decoded(spark, sf_dir))


def _price_base(spark, sf_dir):
    return derive.price_data(_events(spark, sf_dir)).select(
        "coin_id", "exchange", "timestamp", "price", "volume"
    )


def _price_base_tb(spark, sf_dir):
    """_price_base plus the event_id tiebreak column, for tick-level
    window operators (obv / bollinger / max_drawdown): lag, row frames
    and running peaks over tied (coin_id, timestamp) ticks are
    engine-order-dependent without it (ADVICE r4). derive.price_data
    orders its own windows by (timestamp, event_id) for the same
    reason. Callers must drop/aggregate event_id out of their output."""
    return derive.tick_base(_events(spark, sf_dir))


def q_coin_indicators_left(spark, sf_dir):
    """Plain left outer join with real null extension (reference J3):
    every coin, left-joined to its latest FULL indicator row (sma_20
    non-null needs >= 20 ticks, which many fixture coins lack, so the
    null-extended branch is genuinely exercised). The right side
    collapses to one row per coin before the join and is broadcast —
    at 100 TB the preserved side streams with no shuffle."""
    from pyspark.sql import functions as F

    from ..operators.latest import latest_per_group

    ev = _events(spark, sf_dir)
    ind = technical_indicators(derive.price_data(ev)).filter(
        F.col("sma_20").isNotNull()
    )
    latest = latest_per_group(
        ind, ["coin_id", "exchange"], tiebreak=["sma_20", "ema_20", "rsi_14", "macd"]
    ).select(
        F.col("coin_id").alias("id"),
        "exchange",
        F.col("timestamp").alias("ind_ts"),
        "sma_20",
        "ema_20",
        "rsi_14",
        "macd",
    )
    return relational.left_join(
        derive.coins(ev), F.broadcast(latest), ["id", "exchange"]
    )


def q_asof_price_candle(spark, sf_dir):
    price = _price_base(spark, sf_dir)
    candles = derive.ohlc_data(derive.price_data(_events(spark, sf_dir)))
    return relational.asof_join(
        price, candles, keys=["coin_id", "exchange"],
        right_cols=["open", "high", "low", "close"],
    )


def _cutoff_days(price: DataFrame, days: int) -> DataFrame:
    from pyspark.sql import functions as F

    cut = price.agg(
        F.max("timestamp").alias("_max_ts")
    ).select((F.col("_max_ts") - F.expr(f"INTERVAL {days} DAYS")).alias("_cutoff"))
    return price.crossJoin(F.broadcast(cut)).filter(
        F.col("timestamp") > F.col("_cutoff")
    ).drop("_cutoff")


def q_active_coins_semi(spark, sf_dir):
    ev = _events(spark, sf_dir)
    recent = _cutoff_days(derive.price_data(ev), 3).selectExpr(
        "coin_id AS id", "exchange"
    )
    return relational.semi_join(derive.coins(ev), recent, ["id", "exchange"])


def q_stale_coins_anti(spark, sf_dir):
    ev = _events(spark, sf_dir)
    recent = _cutoff_days(derive.price_data(ev), 3).selectExpr(
        "coin_id AS id", "exchange"
    )
    return relational.anti_join(derive.coins(ev), recent, ["id", "exchange"])


def q_union_price_feeds(spark, sf_dir):
    from pyspark.sql import functions as F

    price = _price_base(spark, sf_dir)
    otc = load_table(spark, sf_dir, "orders").select(
        F.concat(F.lit("otc_C"), F.col("o_custkey") % 15).alias("coin_id"),
        F.lit("otc").alias("exchange"),
        F.col("o_orderdate").alias("timestamp"),
        (F.col("o_totalprice") / 1000.0).alias("price"),
        F.col("o_totalprice").alias("volume"),
    )
    return (
        relational.union_feeds(price, otc)
        .groupBy("exchange")
        .agg(
            F.count("*").alias("n_ticks"),
            F.sum("volume").alias("total_volume"),
        )
    )


def q_top_coins_by_volume(spark, sf_dir):
    from pyspark.sql import functions as F

    per_coin = (
        _price_base(spark, sf_dir)
        .groupBy("coin_id", "exchange")
        .agg(F.sum("volume").alias("total_volume"))
    )
    return relational.top_k(per_coin, "total_volume", 10, tiebreak="coin_id")


def q_volume_rollup(spark, sf_dir):
    return relational.volume_rollup(_price_base(spark, sf_dir))


# The fixture feed's five exchanges. Static on purpose: pivot/conditional
# aggregation with a pinned value list plans one pass; value inference
# would add a distinct scan of the fact table (see relational.close_pivot).
EXCHANGES = ["click", "error", "purchase", "signup", "view"]


def q_volume_cube(spark, sf_dir):
    """CUBE (exchange, day) volume matrix — all four grouping sets in
    one Expand + single-shuffle aggregation (§2.4 stretch next to
    volume_rollup)."""
    return relational.volume_cube(_price_base(spark, sf_dir))


def q_close_pivot(spark, sf_dir):
    """Hourly avg-close pivoted wide by exchange (static value list) —
    the chart-ready matrix the reference assembles client-side in
    pandas (flask/app.py builds per-coin traces by re-querying; one
    pivoted frame serves all five)."""
    return relational.close_pivot(q_ohlc(spark, sf_dir), EXCHANGES)


def q_vwap_hourly(spark, sf_dir):
    """Hourly VWAP per (coin, exchange) — execution-quality benchmark
    next to the OHLC candles (derive.vwap)."""
    return derive.vwap(_price_base(spark, sf_dir))


def q_bollinger_bands(spark, sf_dir):
    """Bollinger bands (SMA-20 ± 2σ), the natural next indicator after
    the reference's SMA/EMA/RSI/MACD family — native window functions
    on the shared (coin, exchange) shuffle."""
    from ..operators.indicators import with_bollinger

    return with_bollinger(
        _price_base_tb(spark, sf_dir), order_cols=("timestamp", "event_id")
    ).select("coin_id", "exchange", "timestamp", "bb_mid", "bb_upper", "bb_lower")


def q_max_drawdown(spark, sf_dir):
    """Per-coin maximum drawdown vs running peak (derive.max_drawdown):
    one running-max window + one aggregation on the shared entity key."""
    return derive.max_drawdown(
        _price_base_tb(spark, sf_dir), order_cols=("timestamp", "event_id")
    )


def q_atr_14(spark, sf_dir):
    """ATR-14 over the hourly candles (indicators.with_atr) — candle-
    level member of the indicator family, Wilder TR convention."""
    from ..operators.indicators import with_atr

    return with_atr(q_ohlc(spark, sf_dir)).select(
        "coin_id", "exchange", "timestamp", "atr_14"
    )


def q_obv(spark, sf_dir):
    """On-balance volume running sum per coin (indicators.with_obv)."""
    from ..operators.indicators import with_obv

    return with_obv(
        _price_base_tb(spark, sf_dir), order_cols=("timestamp", "event_id")
    ).select("coin_id", "exchange", "timestamp", "obv")


def q_stochastic(spark, sf_dir):
    """Stochastic oscillator %K/%D over the hourly candles
    (indicators.with_stochastic)."""
    from ..operators.indicators import with_stochastic

    return with_stochastic(q_ohlc(spark, sf_dir)).select(
        "coin_id", "exchange", "timestamp", "stoch_k", "stoch_d"
    )


def q_donchian(spark, sf_dir):
    """Donchian 20-candle channel (indicators.with_donchian)."""
    from ..operators.indicators import with_donchian

    return with_donchian(q_ohlc(spark, sf_dir)).select(
        "coin_id", "exchange", "timestamp", "dc_upper", "dc_lower", "dc_mid"
    )


def q_ichimoku(spark, sf_dir):
    """Ichimoku cloud over the hourly candles (indicators.with_ichimoku)
    — rolling-extreme midpoints composed with forward/backward row
    displacement."""
    from ..operators.indicators import with_ichimoku

    return with_ichimoku(q_ohlc(spark, sf_dir)).select(
        "coin_id", "exchange", "timestamp",
        "tenkan", "kijun", "senkou_a", "senkou_b", "chikou",
    )


def q_keltner_channels(spark, sf_dir):
    """Keltner channels over the hourly candles
    (indicators.with_keltner): EMA-20 of typical price ± 2·ATR-14 —
    the ATR-width volatility envelope next to bollinger_bands'
    stddev-width one. ATR native-window + EMA on the shared fused
    Arrow pass; oracle replays the closed-form EMA over typical price
    plus the atr_14 oracle's TR construction."""
    from ..operators.indicators import with_keltner

    return with_keltner(q_ohlc(spark, sf_dir))


def q_candlestick_patterns(spark, sf_dir):
    """Candlestick pattern flags over the hourly candles
    (indicators.candlestick_patterns): doji / hammer / shooting star /
    bullish / bearish engulfing as exact booleans — single IEEE-op
    comparisons on exact candle aggregates, deterministic with no
    rounding grid."""
    from ..operators.indicators import candlestick_patterns

    return candlestick_patterns(q_ohlc(spark, sf_dir))


def q_incremental_dedup(spark, sf_dir):
    """Incremental exact dedup (dedup.incremental_dedup): the second
    half of the corpus (by doc_id — "today's crawl") deduped within
    itself and against the first half's fingerprint table ("everything
    already ingested") — the batch-over-time dedup form production
    pipelines run, vs exact_dedup's whole-corpus pass.

    The fixtures plant NEAR-dups but zero exact dups, so the raw split
    would only exercise the survive path (the r5 verdict's gap). The
    increment therefore PLANTS both drop kinds in-engine: a re-crawl
    of every 10th prior doc under a shifted id (must drop against the
    seen table) and a second copy of every (10k+1)th new doc under a
    higher id (must drop within-batch, min-doc_id survivor). The
    surviving rows are exactly the original odd docs — and the driver
    hash covers all three paths, because a failed drop adds rows."""
    from pyspark.sql import functions as F

    from ..functions.text import normalized_text

    off = 10_000_000
    docs = _documents(spark, sf_dir)
    prior = docs.filter(F.col("doc_id") % 2 == 0)
    new_base = docs.filter(F.col("doc_id") % 2 == 1)
    recrawl = prior.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + off
    )
    within_dup = new_base.filter(F.col("doc_id") % 10 == 1).withColumn(
        "doc_id", F.col("doc_id") + 2 * off
    )
    new = new_base.unionByName(recrawl).unionByName(within_dup)
    seen = prior.select(F.md5(normalized_text(F.col("text"))).alias("fp")).distinct()
    return dedup.incremental_dedup(new, seen)


def q_incremental_dedup_bloom(spark, sf_dir):
    """Bloom-prefiltered incremental dedup
    (dedup.incremental_dedup_bloom) — the 100 TB form of the
    crawl-increment join: the accumulated seen-fingerprint table's
    Bloom bitset (a few MiB) broadcasts to every executor, the
    definitely-new majority of the increment bypasses the exact
    anti-join entirely, and only probe-positive rows (true dups + the
    fpp sliver) reach it. Output is BIT-IDENTICAL to
    incremental_dedup — no false negatives by construction (same
    deterministic xxhash64/seed/m family in build and probe), false
    positives removed by the exact verify — so the oracle IS the
    exact incremental-dedup SQL and the driver hash pins the
    equivalence, exactly like salted_join_skew pins salting. Same
    planted increment as q_incremental_dedup (re-crawled priors +
    within-batch copies), so all three drop/survive paths flow
    through the prefilter."""
    from pyspark.sql import functions as F

    from ..functions.text import normalized_text

    off = 10_000_000
    docs = _documents(spark, sf_dir)
    prior = docs.filter(F.col("doc_id") % 2 == 0)
    new_base = docs.filter(F.col("doc_id") % 2 == 1)
    recrawl = prior.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + off
    )
    within_dup = new_base.filter(F.col("doc_id") % 10 == 1).withColumn(
        "doc_id", F.col("doc_id") + 2 * off
    )
    new = new_base.unionByName(recrawl).unionByName(within_dup)
    seen = prior.select(F.md5(normalized_text(F.col("text"))).alias("fp")).distinct()
    return dedup.incremental_dedup_bloom(new, seen)


def q_enrich_stream_replay(spark, sf_dir):
    """Eighth driver-checkable STREAMING path — the STREAM-STATIC
    broadcast lookup join (pipeline.enrich_stream_replay): the spooled
    tick feed left-joins the coins dimension per micro-batch, emitted
    rows hash-match the one-shot batch left join. Stateless join, no
    watermark/sentinel: batch === stream by construction, proven
    engine-to-engine here. The dimension side re-resolves per
    micro-batch in production (a refreshed upsert table is picked up
    between batches without a restart — pipeline.enrich_stream
    docstring), which this replay's plan shape certifies."""
    from pyspark.sql import functions as F

    from ..streaming.pipeline import enrich_stream_replay

    dim = derive.coins(_events(spark, sf_dir)).select(
        F.col("id").alias("coin_id"), "exchange", "name", "symbol"
    )
    return enrich_stream_replay(spark, _price_base(spark, sf_dir), dim)


def q_late_drop_stream_replay(spark, sf_dir):
    """Ninth driver-checkable STREAMING path — watermark late-data
    DROP enforcement (pipeline.late_drop_stream_replay): after the
    full feed drains and its watermark commits, a second drain
    re-delivers price −1e6 copies of the earliest hour's ticks; their
    windows are finalized, so the aggregate must DISCARD them and the
    final frame hash-matches the batch candles of the real feed — a
    leaked late row would crater the first hour's `low` and flip the
    hash. Complements recovery_stream_replay (state CARRIED for open
    windows there, state FINALIZED against late arrivals here) and
    the six close-correctly rows. The fixture feed spans 30 days, far
    past the builder's more-than-one-hour precondition."""
    from ..streaming.pipeline import late_drop_stream_replay

    return late_drop_stream_replay(spark, _price_base(spark, sf_dir))


def q_knn_ivf_full_fixed(spark, sf_dir):
    """The PRODUCTION-shape IVF registration: fixed coarse index
    (centroid_limit=32, the knn_ivf_fixed rule) AND a fixed probe set
    (vec_id < 200) — closing the one honest caveat in the r7 100×
    experiment (NOTES_r07 §11): the %50 probe rule grows the probe
    COUNT with the corpus, injecting a probes×corpus/lists quadratic
    that belongs to the fixture, not the index. With both C and the
    query workload constant, search cost is linear in N exactly like
    assignment — the 100×-data measurement of THIS registration is the
    index's true scaling. Oracle via the parameterized
    ``_knn_ivf_sql(cent_where, probe_where)``."""
    from pyspark.sql import functions as F

    return similarity.knn_ivf(
        load_table(spark, sf_dir, "embeddings"),
        probe_filter=F.col("vec_id") < 200,
        k=5,
        centroid_limit=32,
    )


def q_cms_frequencies(spark, sf_dir):
    """Count-Min Sketch frequency estimation
    (operators/sketches.cms_frequencies) — the frequency sketch next
    to the HLL cardinality rollup and the GK quantile sketch: a
    4×1024 counter grid (size independent of corpus and key
    cardinality, cells are plain SUMs so grids merge by cell-wise
    addition like the daily HLL table), per-key estimate = min over
    rows, with the in-plan accuracy contract — ``is_overestimate``
    (structurally ALWAYS true for a CMS) and ``within_bound``
    (estimate ≤ exact + ceil(2N/width)). The md5-derived positions
    make build + estimate replay bit-exactly in the oracle (the
    MinHash/SimHash md5-family pattern), so the driver hash checks
    the sketch's VALUES, not just the contract."""
    from pyspark.sql import functions as F

    from ..operators import sketches

    price = _price_base(spark, sf_dir)
    return sketches.cms_frequencies(price, F.col("coin_id"))


def q_zorder_profile(spark, sf_dir):
    """Z-order (Morton) layout profile (operators/layout.py
    zorder_cells) — the multi-column data-skipping primitive behind
    Delta/Iceberg OPTIMIZE ZORDER BY: price bucket and epoch-minute
    interleaved bit-by-bit into one key, rows grouped into top-level
    Morton cells, per-cell row count + bounding box of BOTH
    dimensions emitted. Tight per-cell boxes in both dimensions at
    once are exactly what makes parquet min/max file pruning work for
    predicates on either column after a zordered write
    (layout.write_zordered; the collapse of per-file bounding-box
    area vs an unclustered write is measured in pytest). The oracle
    replays the 32-term shift/mask interleave verbatim — pure integer
    arithmetic, bit-identical across engines."""
    from pyspark.sql import functions as F

    from ..operators import layout

    price = _price_base(spark, sf_dir)
    a = F.pmod(F.floor(F.col("price") * 100).cast("long"), F.lit(65536))
    b = F.expr("unix_timestamp(timestamp) div 60 % 65536")
    return layout.zorder_cells(price, a, b).orderBy("cell")


def q_spread_stream_replay(spark, sf_dir):
    """Fourth driver-checkable streaming path — the STREAM-STREAM join
    (pipeline.spread_stream_replay): view↔click cross-exchange pairs
    within ±30 minutes replayed over a spooled feed; emitted matches
    hash-match the batch theta join (inner joins emit on arrival — no
    sentinel needed, the watermark only bounds state)."""
    from ..streaming.pipeline import spread_stream_replay

    return spread_stream_replay(spark, _price_base(spark, sf_dir))


def q_orc_roundtrip(spark, sf_dir):
    """ORC source/sink evidence: the documents table written as ORC
    (Spark's other built-in columnar format — the interchange answer
    when the downstream stack is Hive/Trino-flavored) and read back
    under the enforced schema; survivors must hash-match the source
    table (oracle = plain SELECT). Predicate pushdown and column
    pruning work on ORC scans exactly as on parquet."""
    import tempfile

    docs = _documents(spark, sf_dir).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    path = tempfile.mkdtemp(prefix="orc_rt_")
    docs.write.mode("overwrite").orc(path)
    return spark.read.schema(docs.schema).orc(path)


def q_restfeed_ohlc(spark, sf_dir):
    """Custom Python DataSource evidence (sources.restfeed): the
    reference's paginated REST ticker ingestion as a first-class Spark
    source — one input partition per API page, executor-side row
    generation, honest schema — composed straight into the hourly
    candle aggregate. The feed is deterministic integer arithmetic, so
    the oracle replays generation + candles closed-form in SQL
    (``sf_dir`` is unused: the source IS the data)."""
    from ..sources import restfeed

    restfeed.register(spark)
    feed = (
        spark.read.format("cryptofeed")
        .option("pages", 4)
        .option("coins_per_page", 5)
        .option("minutes", 120)
        .load()
    )
    return derive.ohlc_data(feed)


def q_ohlc_daily_rollup(spark, sf_dir):
    """Candle re-aggregation 1h → 1d (derive.ohlc_rollup): open/close
    carried from the boundary SUB-candles via struct min/max — the
    chainable rollup layer coarser chart zooms serve from."""
    return derive.ohlc_rollup(q_ohlc(spark, sf_dir), bucket="day")


def q_event_bigrams(spark, sf_dir):
    """Sequential-pattern mining (relational.event_bigrams): top-20
    consecutive per-user event-type transitions — the Markov edge
    table, with the event_id tiebreak pinning tied timestamps."""
    from ..operators.relational import event_bigrams

    return event_bigrams(_events(spark, sf_dir))


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape (relational.shipping_priority): segment-filtered
    customer ⋈ orders ⋈ lineitem with anchored date cutoffs, revenue
    per order, top-10 via TakeOrdered — the selective-join bench anchor
    next to pricing_summary's scan-agg."""
    from ..operators.relational import shipping_priority

    return shipping_priority(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


def q_knn_ivf_pq_recall(spark, sf_dir):
    """Quality contract for the composed index
    (similarity.knn_ivf_pq_recall): recall@5 of IVF-PQ vs exact L2
    brute — with knn_recall and knn_pq_recall this decomposes quality
    loss into quantization and routing terms."""
    return similarity.knn_ivf_pq_recall(
        load_table(spark, sf_dir, "embeddings"), k=5
    )


def q_event_props_variant(spark, sf_dir):
    """The VARIANT semi-structured path (Spark 4's typed JSON):
    events.props parsed once with parse_json, fields extracted with
    variant_get (typed, no per-path re-parse — get_json_object
    re-parses the string per path, which is why event_props_stats
    caps at one path), plus try_variant_get's NULL-not-error contract
    on a missing path. Aggregated per event_type; oracle replays with
    DuckDB's native JSON extraction."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "long")
    missing = F.try_variant_get(v, "$.does_not_exist", "string")
    return (
        ev.select("event_type", k.alias("k"), missing.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.col("m").isNull().cast("long")).alias("n_missing_path"),
        )
    )


def q_activity_reconciliation(spark, sf_dir):
    """Full-outer snapshot reconciliation
    (relational.activity_reconciliation): per-entity activity across
    the feed's two time halves with both/first-only/second-only
    status — the join type nothing else exercises, with integer
    midpoint arithmetic for determinism."""
    from ..operators.relational import activity_reconciliation

    return activity_reconciliation(_price_base(spark, sf_dir))


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape (relational.pricing_summary): the canonical
    scan-dominated two-flag aggregate over lineitem, cutoff anchored
    at max(l_shipdate) − 90 days — the stable scan-agg bench anchor."""
    from ..operators.relational import pricing_summary

    return pricing_summary(load_table(spark, sf_dir, "lineitem"))


def q_rolling_active_coins(spark, sf_dir):
    """Rolling trailing-7-day distinct coins per exchange
    (derive.rolling_active_coins): windowed hll_union_agg over
    pre-built daily sketches, contract-verified against the exact
    range-join answer — the rolling-MAU pattern where mergeable
    sketches become load-bearing."""
    return derive.rolling_active_coins(_price_base(spark, sf_dir))


def q_exchange_hll_rollup(spark, sf_dir):
    """Mergeable-sketch rollup contract (derive.exchange_hll_rollup):
    per-day Datasketches HLL sketches merged per exchange; emits exact
    counts + the in-plan ≤5% accuracy boolean the oracle pins as TRUE —
    the materialized-sketch-table pattern next to
    exchange_cardinality_approx's single-shot HLL++."""
    return derive.exchange_hll_rollup(_price_base(spark, sf_dir))


def q_ohlc_stream_replay(spark, sf_dir):
    """Third driver-checkable STREAMING path
    (pipeline.ohlc_stream_replay): watermarked tumbling candles
    replayed to completion over a spooled feed; emitted candles must
    hash-match the batch ohlc_data SQL exactly — the struct-ordering
    open/close convention is what keeps batch===stream on tied
    timestamps."""
    from ..streaming.pipeline import ohlc_stream_replay

    return ohlc_stream_replay(spark, _price_base(spark, sf_dir))


def q_recovery_stream_replay(spark, sf_dir):
    """Exactly-once failure-recovery replay (verdict r6 item #7;
    pipeline.recovery_stream_replay): the candle drain is killed with
    the midpoint hour still open in watermark state, restarted from
    its checkpoint over the remaining feed + sentinel, and the final
    PARQUET-sink contents must hash-match the uninterrupted batch
    candles — lost state, double emission, or a late-drop across the
    restart each change the frame and flip the hash. Promotes T7 from
    pytest-only to driver-hash-verified like the other six streaming
    rows."""
    from ..streaming.pipeline import recovery_stream_replay

    return recovery_stream_replay(spark, _price_base(spark, sf_dir))


def q_dup_rate_by_source(spark, sf_dir):
    """Duplication observability per corpus slice
    (dedup.dup_rate_by_source): per source, docs / distinct contents /
    docs duplicated corpus-wide / dup rate, on exact_dedup's md5
    fingerprint."""
    return dedup.dup_rate_by_source(_documents(spark, sf_dir))


def q_coin_volume_percentile(spark, sf_dir):
    """Liquidity standing per exchange (derive.coin_volume_percentile):
    percent_rank + cume_dist of rounded total volume — the rank-family
    window functions momentum_ranks doesn't cover."""
    return derive.coin_volume_percentile(_price_base(spark, sf_dir))


def q_volume_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS ((exchange),(day),()) with grouping_id
    (derive.volume_grouping_sets) — the non-lattice member of the
    multi-dimensional aggregate family next to volume_cube and
    volume_rollup."""
    return derive.volume_grouping_sets(_price_base(spark, sf_dir))


def q_lead_lag_corr(spark, sf_dir):
    """Directional lead-lag correlation at 1 day (derive.lead_lag_corr)
    — corr(a(t), b(t-1d)) for ordered top-20 pairs, the asymmetric
    companion to price_correlation. Daily alignment because the
    fixture's ~13-candle hourly series share too few lagged hours
    (hourly lag yields the agreeing-but-empty result both engines
    happily hash-match — checked, not assumed)."""
    return derive.lead_lag_corr(_price_base(spark, sf_dir), bucket="day")


def q_rolling_sharpe(spark, sf_dir):
    """Rolling risk-adjusted return (derive.rolling_sharpe) over a
    6-candle window — sized to the fixture's ~13-candle series so the
    window actually fills (24 would emit all-NULL moments); production
    runs 24+ via the parameter."""
    return derive.rolling_sharpe(q_ohlc(spark, sf_dir), window=6)


def q_market_regime(spark, sf_dir):
    """Volatility-regime labels (derive.market_regime): trailing
    realized vol (6-candle window, fixture-sized like rolling_sharpe)
    vs the coin's own tercile thresholds — calm / normal / turbulent
    per candle."""
    return derive.market_regime(q_ohlc(spark, sf_dir), window=6)


def q_corpus_quality_report(spark, sf_dir):
    """Per-(source, lang) curation dashboard
    (text.corpus_quality_report): Gopher per-rule pass counts and the
    overall pass rate — one rule-battery map pass + one
    dimension-keyed aggregate."""
    return text.corpus_quality_report(_documents(spark, sf_dir))


def q_heikin_ashi(spark, sf_dir):
    """Heikin-Ashi smoothed candles (indicators.heikin_ashi): the
    recursive candle transform on the same fused Arrow pass as the EMA
    family; the oracle replays the open recursion with a RECURSIVE CTE
    — each step is one rounding of (prev+x)/2, so the recursion is
    bit-stable across engines."""
    from ..operators.indicators import heikin_ashi

    return heikin_ashi(q_ohlc(spark, sf_dir))


def q_funnel_conversion(spark, sf_dir):
    """Ordered funnel over the raw event stream
    (relational.funnel): view → click → purchase with first-touch
    anchors and strictly-after ordering; per-stage user counts and
    conversion rates."""
    from ..operators.relational import funnel

    return funnel(_events(spark, sf_dir))


def q_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage curve (text.vocab_coverage): share of all
    corpus token occurrences covered by the top-k tokens for
    k ∈ {100, 1000, 10000} — the tokenizer-sizing diagnostic next to
    bpe_merges. Exact integer counts, distributed partial top-k
    (TakeOrdered), no global sort of the vocabulary."""
    return text.vocab_coverage(_documents(spark, sf_dir))


def q_scd2_volume_tiers(spark, sf_dir):
    """SCD type-2 dimension build (derive.scd2_volume_tiers): daily
    per-coin liquidity tier (ntile over rounded daily volume) collapsed
    into [valid_from, valid_to) validity ranges with is_current — the
    gaps-and-islands warehouse primitive."""
    return derive.scd2_volume_tiers(_price_base(spark, sf_dir))


def q_rolling_beta(spark, sf_dir):
    """24-candle rolling market beta per coin (derive.rolling_beta) —
    windowed covariance/variance over hourly returns vs the
    equal-weight market."""
    return derive.rolling_beta(q_ohlc(spark, sf_dir))


def q_cross_exchange_spread(spark, sf_dir):
    """Per-symbol hourly price dispersion across venues
    (derive.cross_exchange_spread) — the arbitrage view."""
    return derive.cross_exchange_spread(q_ohlc(spark, sf_dir))


def q_revenue_by_nation(spark, sf_dir):
    """Classic OLAP multi-join: lineitem ⋈ orders ⋈ customer ⋈ nation,
    revenue per nation. Dimension sides broadcast; the lineitem-orders
    join is the only large shuffle and AQE sizes it."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum("rev").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_top_suppliers(spark, sf_dir):
    """Top-10 suppliers by shipped value: join + agg + deterministic
    top-k (TakeOrderedAndProject)."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", (F.col("l_extendedprice") * F.col("l_quantity")).alias("val")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    per = li.groupBy("l_suppkey").agg(F.sum("val").alias("shipped_value"))
    joined = per.join(F.broadcast(supp), per.l_suppkey == supp.s_suppkey).select(
        "s_suppkey", "s_name", "shipped_value"
    )
    return relational.top_k(joined, "shipped_value", 10, tiebreak="s_suppkey")


def q_event_props_stats(spark, sf_dir):
    """Semi-structured path extraction outside the envelope family: the
    events.props JSON payload parsed in-plan (get_json_object) and
    aggregated per event_type. Scale: map-side JSON path + one keyed
    aggregation with partial combine."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_user_retention(spark, sf_dir):
    """Cohort retention triangle over the raw event stream."""
    return derive.user_retention(load_table(spark, sf_dir, "events"))


def q_trading_sessions(spark, sf_dir):
    """Gaps-and-islands sessionization of the tick stream (batch twin
    of streaming session_window; gap 6h)."""
    return relational.sessionize(
        _price_base(spark, sf_dir), ["coin_id", "exchange"], gap_minutes=360
    )


def q_momentum_ranks(spark, sf_dir):
    """Window-function breadth (SURVEY §2.5 lists rank/dense_rank/
    ntile/lead as absent from the reference): per-exchange momentum
    leaderboard over the latest tick of every coin — rank, dense_rank,
    quartile ntile, and next-coin lead in ONE window pass (single
    shuffle on exchange after the latest-per-group collapse)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..operators.latest import latest_per_group

    price = derive.price_data(_events(spark, sf_dir))
    latest = latest_per_group(
        price, ["coin_id", "exchange"], tiebreak=["change_1h"]
    ).filter(F.col("change_1h").isNotNull())
    w = Window.partitionBy("exchange").orderBy(F.desc("change_1h"), F.asc("coin_id"))
    return latest.select(
        "exchange",
        "coin_id",
        "change_1h",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lead("coin_id", 1).over(w).alias("next_coin"),
    )


PRICE_BASE_SQL = """
SELECT event_type || '_C' || user_id AS coin_id,
       event_type AS exchange,
       ts AS timestamp,
       value AS price,
       abs(value) * 100 AS volume
FROM events"""

# tick projection + the event_id tiebreak column, for oracles of
# tick-level window queries (obv / bollinger / max_drawdown) — mirrors
# derive.tick_base so both engines order tied ticks identically
PRICE_BASE_TB_SQL = """
SELECT event_type || '_C' || user_id AS coin_id,
       event_type AS exchange,
       ts AS timestamp,
       value AS price,
       abs(value) * 100 AS volume,
       event_id
FROM events"""

ENVELOPE_TICK_OHLC_SQL = """
SELECT coin_id, exchange,
       time_bucket(INTERVAL '5 minutes', timestamp) AS timestamp,
       (min({'t': timestamp, 'p': price})).p AS open,
       max(price) AS high,
       min(price) AS low,
       (max({'t': timestamp, 'p': price})).p AS close
FROM (%s) p
GROUP BY 1, 2, 3""" % PRICE_BASE_SQL

ENVELOPE_MCAP_SQL = """
WITH base AS (%s),
per_symbol AS (
  SELECT time_bucket(INTERVAL '5 minutes', timestamp) AS tick_ts,
         regexp_extract(coin_id, '_(C[0-9]+)$', 1) AS coin_symbol,
         sum(volume) AS symbol_volume
  FROM base GROUP BY 1, 2
)
SELECT coin_symbol, tick_ts AS timestamp,
       100.0 * symbol_volume / sum(symbol_volume) OVER (PARTITION BY tick_ts)
         AS market_cap_percentage
FROM per_symbol""" % PRICE_BASE_SQL


# ---------------------------------------------------------------------------
# Oracle fragments for the text/dedup/similarity surface
# ---------------------------------------------------------------------------

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

def _shingles_cte(source: str = "documents") -> str:
    """The distinct-3-gram shingle CTE pair (docs, sh), parameterized
    on the corpus source so composed oracles
    ([[_curation_v3_sql]]) can shingle an upstream CTE instead of the
    raw table; ``SHINGLES_CTE`` below keeps the rendered default
    byte-identical."""
    return f"""
docs AS (SELECT doc_id, {WORDS_SQL} AS ws FROM {source}),
sh AS (
  SELECT doc_id,
         list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                        for i in range(1, len(ws) - 1)]) AS shingles
  FROM docs WHERE len(ws) >= 3
)"""


SHINGLES_CTE = _shingles_cte()

# df-capped pair generation (mirrors ngram_jaccard_pairs(max_df=...):
# shingles above the document-frequency cap are removed from every doc
# BEFORE sizes/intersections, i.e. the filtered-universe Jaccard).
CAPPED_PAIRS_CTES = f"""{SHINGLES_CTE},
post AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
keep AS (SELECT s FROM post GROUP BY s HAVING count(*) <= {NGRAM_MAX_DF}),
fsh AS (
  SELECT doc_id, list(post.s) AS shingles
  FROM post JOIN keep USING (s) GROUP BY doc_id
),
pairs AS (
  SELECT * FROM (
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           len(list_intersect(a.shingles, b.shingles))::DOUBLE
           / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) AS jaccard
    FROM fsh a JOIN fsh b ON a.doc_id < b.doc_id)
  WHERE jaccard >= 0.5
)"""


def _minhash_lsh_parts(
    bands: int = 16,
    rows: int = 4,
    threshold: float = 0.5,
    source: str = "documents",
) -> tuple[str, str]:
    """Structured (ctes, final_select) pieces of the md5-family
    MinHash+LSH oracle so dependent oracles ([[_leakage_safe_split_sql]],
    [[_curation_v3_sql]]) compose SQL fragments instead of
    pattern-matching the rendered string (ADVICE r9: the old
    rindex-on-a-literal-anchor surgery broke on any cosmetic edit to
    the final SELECT). ``ctes`` is the full ``WITH ...`` clause (no
    trailing comma); ``final_select`` is the verify SELECT that
    consumes the ``cand``/``sh`` CTEs. ``source`` re-points the
    shingle scan at an upstream CTE."""
    k = bands * rows
    sig_entries = ",\n    ".join(
        f"min(h1 + {i} * h2)" for i in range(k)
    )
    band_union = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band,"
        f" md5(array_to_string(sg[{b * rows + 1}:{(b + 1) * rows}], ',')) AS bucket"
        " FROM sig"
        for b in range(bands)
    )
    ctes = f"""WITH {_shingles_cte(source)},
hv AS (
  SELECT doc_id,
         CAST('0x' || substr(m, 1, 7) AS BIGINT) AS h1,
         CAST('0x' || substr(m, 8, 7) AS BIGINT) AS h2
  FROM (SELECT doc_id, md5(s) AS m
        FROM (SELECT doc_id, unnest(shingles) AS s FROM sh))
),
sig AS (
  SELECT doc_id, [
    {sig_entries}
  ] AS sg FROM hv GROUP BY doc_id
),
bb AS (
{band_union}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)"""
    final_select = f"""SELECT doc_id_a, doc_id_b,
       len(list_intersect(x.shingles, y.shingles))::DOUBLE
       / (len(x.shingles) + len(y.shingles) - len(list_intersect(x.shingles, y.shingles))) AS jaccard
FROM cand
JOIN sh x ON x.doc_id = doc_id_a
JOIN sh y ON y.doc_id = doc_id_b
WHERE jaccard >= {threshold}"""
    return ctes, final_select


def _minhash_lsh_sql(
    bands: int = 16, rows: int = 4, threshold: float = 0.5
) -> str:
    """DuckDB oracle replaying the md5-family MinHash+LSH bit-for-bit:
    one md5 per shingle -> two 28-bit ints (h1, h2 via '0x' casts, the
    same values Spark's conv parses) -> family member i = h1 + i*h2
    (Kirsch-Mitzenmacher; bounded far below BIGINT overflow) -> K MIN
    aggregates; band buckets are md5 over the comma-joined signature
    slice; candidates verified with exact Jaccard. Rendered from
    [[_minhash_lsh_parts]] so the leakage-split oracle composes the
    same pieces structurally."""
    ctes, final_select = _minhash_lsh_parts(bands, rows, threshold)
    return f"\n{ctes}\n{final_select}"


def _leakage_safe_split_sql() -> str:
    """Oracle for [[q_leakage_safe_split]]: reuse the md5-family
    MinHash+LSH oracle pieces verbatim via [[_minhash_lsh_parts]]
    (the CTE chain keeps its structure; the verify SELECT becomes the
    ``pairs`` CTE body), replay the star-CC labeling as recursive
    reachability with min-label (the dup_clusters_star oracle
    pattern), left-join singletons to their own doc_id, and apply the
    exact md5 bucket thresholds of the dataset_split oracle keyed on
    cluster_id."""
    ctes, final_select = _minhash_lsh_parts()
    assert ctes.startswith("WITH ")
    ctes = "WITH RECURSIVE " + ctes[len("WITH ") :]
    return f"""{ctes},
pairs AS (
{final_select}
),
edges AS (
  SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
  UNION ALL
  SELECT doc_id_b AS a, doc_id_a AS b FROM pairs
),
reach(node, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r
),
comp AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
labeled AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c USING (doc_id)
),
bkt AS (
  SELECT doc_id, cluster_id,
         CAST(('0x' || substring(md5('split' || cluster_id::VARCHAR), 1, 8))
              AS BIGINT) % 10000 AS bucket
  FROM labeled
)
SELECT doc_id, cluster_id,
       CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM bkt"""


def _simhash_sql(max_hamming: int = 3, n_bits: int = 64) -> str:
    """DuckDB oracle for the md5-family SimHash: n_bits signed-bit sums
    over the first n_bits/4 hex chars of md5(shingle) (parsed as 32-bit
    ints — the same '0x' cast values Spark's conv produces), assembled
    into 4 bands of n_bits/4 bits; pigeonhole candidates;
    xor+bit_count verify. ``n_bits=128`` is the scale-safe band width
    (see dedup._simhash_bands_md5)."""
    bb = n_bits // 4
    sums = ",\n         ".join(
        f"sum((((v{j // 32 + 1} >> {j % 32}) & 1) * 2 - 1)) AS b{j}"
        for j in range(n_bits)
    )
    band_cols = ", ".join(
        "("
        + " + ".join(
            f"CASE WHEN b{bb * k + j} > 0 THEN {1 << j} ELSE 0 END" for j in range(bb)
        )
        + f") AS band{k}"
        for k in range(4)
    )
    band_union = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {k} AS band, band{k} AS bucket FROM bands" for k in range(4)
    )
    hamming = " + ".join(f"bit_count(xor(x.band{k}, y.band{k}))" for k in range(4))
    word_cols = ",\n         ".join(
        f"CAST('0x' || substr(md5(s), {1 + 8 * w}, 8) AS BIGINT) AS v{w + 1}"
        for w in range(n_bits // 32)
    )
    return f"""
WITH {SHINGLES_CTE},
hashes AS (
  SELECT doc_id,
         {word_cols}
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
),
sums AS (
  SELECT doc_id,
         {sums}
  FROM hashes GROUP BY doc_id
),
bands AS (SELECT doc_id, {band_cols} FROM sums),
bb AS (
{band_union}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT doc_id_a, doc_id_b, ({hamming})::BIGINT AS hamming
FROM cand
JOIN bands x ON x.doc_id = doc_id_a
JOIN bands y ON y.doc_id = doc_id_b
WHERE hamming <= {max_hamming}"""


def _knn_sql(
    bucketed: bool,
    round_decimals: int | None = None,
    multiprobe: bool = False,
    n_planes: int | None = None,
    plant_shift: int | None = None,
) -> str:
    planes = (
        similarity.hyperplanes(n_planes)
        if n_planes is not None
        else similarity.hyperplanes()
    )
    bucket_expr = " + ".join(
        f"CASE WHEN list_dot_product(emb, {plane!r}::DOUBLE[]) > 0 THEN {1 << i} ELSE 0 END"
        for i, plane in enumerate(planes)
    )
    bucket_col = f", ({bucket_expr}) AS bucket" if bucketed else ""
    join = (
        "JOIN probes ON base.bucket = probes.probe_bucket AND vec_id <> probe_id"
        if bucketed
        else "CROSS JOIN probes WHERE vec_id <> probe_id"
    )
    if multiprobe:
        # own bucket + every Hamming-1 bucket, mirroring knn_lsh(multiprobe=True)
        masks = ", ".join(f"({1 << i})" for i in range(len(planes)))
        probe_bucket = ", xor(bucket, m) AS probe_bucket"
        probe_from = f"FROM base, (VALUES (0), {masks}) v(m)"
    else:
        probe_bucket = ", bucket AS probe_bucket" if bucketed else ""
        probe_from = "FROM base"
    cos = (
        "list_dot_product(probe_emb, emb)"
        " / (sqrt(list_dot_product(probe_emb, probe_emb)) * sqrt(list_dot_product(emb, emb)))"
    )
    if round_decimals is not None:
        # rank on the rounded value too — the engine's vectorized path
        # prunes and ranks on rounded cosines, so ties must match
        cos = f"round({cos}, {round_decimals})"
    # plant_shift: the corpus additionally carries an EXACT twin of
    # every probe vector under vec_id + plant_shift (shift chosen so
    # twins are never probes themselves) — identical vectors share
    # every sign bit, so each probe's twin is a guaranteed bucket
    # collision and a cosine-1 rank-1 neighbor; the driver hash then
    # certifies candidate generation AND ranking on non-empty,
    # known-answer output (the embedding_dup_wide recipe).
    corpus = (
        "SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings"
        if plant_shift is None
        else f"""SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
  UNION ALL
  SELECT vec_id + {plant_shift}, embedding::DOUBLE[]
  FROM embeddings WHERE vec_id % 50 = 0"""
    )
    return f"""
WITH corpus AS (
  {corpus}
),
base AS (
  SELECT vec_id, emb{bucket_col} FROM corpus
),
probes AS (
  SELECT vec_id AS probe_id, emb AS probe_emb{probe_bucket} {probe_from} WHERE vec_id % 50 = 0
),
scored AS (
  SELECT probe_id, vec_id AS neighbor_id,
         {cos} AS cosine
  FROM base {join}
)
SELECT probe_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored)
WHERE rank <= 5"""


def _embedding_dup_sql(
    threshold: float = 0.5,
    n_planes: int = 16,
    bands: int = 4,
    base_sql: str = "SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings",
) -> str:
    """DuckDB oracle replaying the banded sign-bit LSH bit-for-bit.
    ``base_sql`` overrides the corpus CTE (the wide registration plants
    exact twins so its driver row verifies candidate generation AND the
    cosine verify on non-empty output)."""
    planes = similarity.hyperplanes(n_planes)
    r = n_planes // bands
    bit_cols = ",\n         ".join(
        f"CASE WHEN list_dot_product(emb, {plane!r}::DOUBLE[]) > 0 THEN 1 ELSE 0 END AS bit{i}"
        for i, plane in enumerate(planes)
    )
    band_cols = ", ".join(
        "(" + " + ".join(f"bit{b * r + j} * {1 << j}" for j in range(r)) + f") AS band{b}"
        for b in range(bands)
    )
    band_union = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, {b} AS band, band{b} AS val FROM banded" for b in range(bands)
    )
    return f"""
WITH base AS ({base_sql}),
bits AS (
  SELECT vec_id, emb,
         {bit_cols}
  FROM base
),
banded AS (SELECT *, {band_cols} FROM bits),
bb AS (
{band_union}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bb a JOIN bb b ON a.band = b.band AND a.val = b.val AND a.vec_id < b.vec_id
)
SELECT id_a, id_b,
       list_dot_product(x.emb, y.emb)
       / (sqrt(list_dot_product(x.emb, x.emb)) * sqrt(list_dot_product(y.emb, y.emb))) AS cosine
FROM cand
JOIN base x ON x.vec_id = id_a
JOIN base y ON y.vec_id = id_b
WHERE cosine >= {threshold}"""


def _kmeans_ctes(cent_where: str = "vec_id % 101 = 1") -> str:
    """The two-Lloyd-round k-means CTE chain (base..c2), shared by the
    ``kmeans_centroids*`` oracles and the trained-centroid
    composition ``semantic_dedup_trained`` (which consumes c2 as its
    coarse index); ``cent_where`` picks the seed set — the modulus
    default (K grows with N; teaching form) or the fixed-size rule
    (``vec_id < 32``; the scale-honest registrations)."""
    return f"""base AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
c0 AS (SELECT vec_id AS cent_id, emb AS cent FROM base WHERE {cent_where}),
s1 AS (
  SELECT b.vec_id, b.emb, c.cent_id,
         round(list_sum([(b.emb[i] - c.cent[i]) * (b.emb[i] - c.cent[i])
                         for i in range(1, 65)]), 9) AS dist
  FROM base b CROSS JOIN c0 c
),
a1 AS (
  SELECT vec_id, emb, cent_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist, cent_id) AS rn
    FROM s1) WHERE rn = 1
),
u1 AS (
  SELECT cent_id, t.i AS i, avg(emb[t.i]) AS v, count(*) AS n
  FROM a1, range(1, 65) t(i) GROUP BY cent_id, t.i
),
c1 AS (
  SELECT cent_id, list(round(v, 9) ORDER BY i) AS cent,
         max(n) AS n_members
  FROM u1 GROUP BY cent_id
),
s2 AS (
  SELECT b.vec_id, b.emb, c.cent_id,
         round(list_sum([(b.emb[i] - c.cent[i]) * (b.emb[i] - c.cent[i])
                         for i in range(1, 65)]), 9) AS dist
  FROM base b CROSS JOIN c1 c
),
a2 AS (
  SELECT vec_id, emb, cent_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist, cent_id) AS rn
    FROM s2) WHERE rn = 1
),
u2 AS (
  SELECT cent_id, t.i AS i, avg(emb[t.i]) AS v, count(*) AS n
  FROM a2, range(1, 65) t(i) GROUP BY cent_id, t.i
),
c2 AS (
  SELECT cent_id, list(round(v, 9) ORDER BY i) AS cent,
         max(n) AS n_members
  FROM u2 GROUP BY cent_id
)"""


def _kmeans_sql(cent_where: str = "vec_id % 101 = 1") -> str:
    """Two-Lloyd-round k-means oracle over :func:`_kmeans_ctes`."""
    return f"""
WITH {_kmeans_ctes(cent_where)}
SELECT cent_id, n_members,
       md5(array_to_string(
         list_transform(cent, x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)),
         ',')) AS cent_digest
FROM c2"""


def _pca_sql(dim: int = 16, iters: int = 12) -> str:
    """Power-iteration PCA oracle: imports the SAME expression strings
    the engine executes (similarity._pca_terms) and wraps them in
    DuckDB CTEs — identical text, identical left-to-right evaluation,
    identical round() grids, so both engines walk bit-identical
    doubles. Only the dialect-specific pieces (1-based list indexing,
    ::DOUBLE element casts, count(*)::DOUBLE) are written here."""
    from ..operators.similarity import _pca_terms

    idx = range(dim)
    means, covs, rounds, ps, lam, score = _pca_terms(dim, iters)
    xs = ",\n         ".join(f"embedding[{i + 1}]::DOUBLE AS x{i}" for i in idx)
    sums = ", ".join(f"sum(x{i}) AS s{i}" for i in idx)
    grams = ", ".join(
        f"sum(x{i}*x{j}) AS g{i}_{j}" for i in idx for j in idx if j >= i
    )
    it_ctes = []
    prev = "cov"
    for it, (ws, nrm) in enumerate(rounds):
        it_ctes.append(f"ia{it} AS (SELECT *, {', '.join(ws)} FROM {prev})")
        it_ctes.append(f"ib{it} AS (SELECT *, {nrm} FROM ia{it})")
        prev = f"ib{it}"
    it_block = ",\n".join(it_ctes)
    ms = ", ".join(f"m{i}" for i in idx)
    return f"""
WITH x AS (
  SELECT vec_id, {xs}
  FROM embeddings WHERE len(embedding) >= {dim}
),
st AS (SELECT count(*)::DOUBLE AS n, {sums}, {grams} FROM x),
cov AS (SELECT n, {", ".join(means)}, {", ".join(covs)} FROM st),
{it_block},
comp AS (SELECT {ms}, {", ".join(ps)}, round({lam}, 6) AS lambda1 FROM {prev})
SELECT vec_id, round({score}, 6) AS pc1, lambda1
FROM x CROSS JOIN comp"""


def _pca_residual_sql(dim: int = 16, iters: int = 12) -> str:
    """ABTT-residual oracle: the same generated CTE walk as
    [[_pca_sql]] (identical expression text through covariance and all
    power iterations), then the residual expression — which, exactly
    like the engine side, references the ROUNDED pc1 column so both
    engines subtract the same projection."""
    from ..operators.similarity import _pca_terms

    idx = range(dim)
    means, covs, rounds, ps, lam, score = _pca_terms(dim, iters)
    xs = ",\n         ".join(f"embedding[{i + 1}]::DOUBLE AS x{i}" for i in idx)
    sums = ", ".join(f"sum(x{i}) AS s{i}" for i in idx)
    grams = ", ".join(
        f"sum(x{i}*x{j}) AS g{i}_{j}" for i in idx for j in idx if j >= i
    )
    it_ctes = []
    prev = "cov"
    for it, (ws, nrm) in enumerate(rounds):
        it_ctes.append(f"ia{it} AS (SELECT *, {', '.join(ws)} FROM {prev})")
        it_ctes.append(f"ib{it} AS (SELECT *, {nrm} FROM ia{it})")
        prev = f"ib{it}"
    it_block = ",\n".join(it_ctes)
    ms = ", ".join(f"m{i}" for i in idx)
    rexpr = "sqrt(" + " + ".join(
        f"(x{i} - m{i} - pc1*p{i})*(x{i} - m{i} - pc1*p{i})" for i in idx
    ) + ")"
    return f"""
WITH x AS (
  SELECT vec_id, {xs}
  FROM embeddings WHERE len(embedding) >= {dim}
),
st AS (SELECT count(*)::DOUBLE AS n, {sums}, {grams} FROM x),
cov AS (SELECT n, {", ".join(means)}, {", ".join(covs)} FROM st),
{it_block},
comp AS (SELECT {ms}, {", ".join(ps)} FROM {prev}),
proj AS (SELECT x.*, comp.*, round({score}, 6) AS pc1
         FROM x CROSS JOIN comp)
SELECT vec_id, pc1, round({rexpr}, 6) AS residual_norm
FROM proj"""


def _knn_ivf_sql(
    cent_where: str = "vec_id % 101 = 1",
    probe_where: str = "vec_id % 50 = 0",
    base_sql: str = "SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings",
) -> str:
    """IVF-flat oracle; ``cent_where`` picks the coarse index — the
    modulus default (C grows with N; fixture/teaching form) or a
    fixed-size rule like ``vec_id < 32`` (constant C; the scale-honest
    registration ``knn_ivf_fixed``). ``probe_where`` picks the probe
    set — the %50 default's probe COUNT grows with N (injecting a
    probes*corpus/lists quadratic into fixture-scale measurements,
    NOTES_r07 §11); a constant rule like ``vec_id < 200`` models the
    production fixed query workload (the r8 registration candidate).
    ``base_sql`` overrides the corpus — the append registration passes
    the base∪increment union, which IS the equivalence statement: a
    from-scratch index over the union must equal the engine's
    incremental build (per-row assignment against fixed centroids)."""
    return f"""
WITH base AS ({base_sql}),
centroids AS (
  SELECT vec_id AS cent_id, emb AS cent_emb FROM base WHERE {cent_where}
),
scored AS (
  SELECT vec_id, emb, cent_id,
         list_dot_product(emb, cent_emb)
         / (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(cent_emb, cent_emb))) AS cent_cos
  FROM base CROSS JOIN centroids
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cent_cos DESC, cent_id) AS crank
  FROM scored
),
lists AS (SELECT vec_id, emb, cent_id FROM ranked WHERE crank = 1),
probe_lists AS (
  SELECT vec_id AS probe_id, emb AS probe_emb, cent_id
  FROM ranked WHERE {probe_where} AND crank <= 2
),
cand AS (
  SELECT probe_id, l.vec_id AS neighbor_id,
         list_dot_product(probe_emb, l.emb)
         / (sqrt(list_dot_product(probe_emb, probe_emb)) * sqrt(list_dot_product(l.emb, l.emb))) AS cosine
  FROM lists l JOIN probe_lists p ON l.cent_id = p.cent_id
  WHERE l.vec_id <> p.probe_id
)
SELECT probe_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM cand)
WHERE rank <= 5"""


KNN_IVF_SQL = _knn_ivf_sql()

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


def _bpe_pack_sql(rounds: int = 3, budget: int = 512) -> str:
    """Oracle for [[q_bpe_pack]]: the trained-tokenizer token counts
    ([[_bpe_encode_ctes]]) fed through the pack_chunks cumsum — the
    same shard-local window / chunk-range arithmetic as the
    ``pack_chunks`` oracle with n_tokens_bpe as the budget unit.
    Documents with no words are absent from ``enc`` (the word explode
    drops them) and re-enter with 0 tokens via the LEFT join, exactly
    like the engine's coalesce."""
    return (
        _bpe_encode_ctes(rounds)
        + f""",
t AS (
  SELECT d.doc_id, d.source,
         coalesce(e.n_tokens_bpe, 0)::BIGINT AS n_tokens_bpe
  FROM documents d LEFT JOIN enc e ON d.doc_id = e.doc_id
),
c AS (
  SELECT *, sum(n_tokens_bpe) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING)::BIGINT AS end_tokens
  FROM t
)
SELECT doc_id, source, n_tokens_bpe,
       (CASE WHEN n_tokens_bpe > 0
             THEN (end_tokens - n_tokens_bpe) // {budget} END)::BIGINT AS first_chunk,
       (CASE WHEN n_tokens_bpe > 0 THEN (end_tokens - 1) // {budget} END)::BIGINT AS last_chunk,
       (CASE WHEN n_tokens_bpe > 0
             THEN (end_tokens - 1) // {budget} - (end_tokens - n_tokens_bpe) // {budget} + 1
             ELSE 0 END)::BIGINT AS n_chunks
FROM c"""
    )


def _pagerank_ctes(cap: int = 2000) -> str:
    """Edge build + 3 integer-fixed-point PageRank rounds as CTEs;
    ``cap`` is graph.cooccurrence_edges' ``max_per_bucket`` guard —
    2000 never binds on the fixtures (the teaching registration),
    3 BINDS at sf0.01 (max per-minute density is 4) and bounds the
    edge count to buckets * C(cap, 2) regardless of tick density
    (the scale-safe registration ``coin_pagerank_capped``; the
    uncapped minute-bucket build measured 103x edges at 10x data)."""
    return f"""base AS ({PRICE_BASE_SQL}),
eh AS (SELECT DISTINCT coin_id AS e, date_trunc('minute', timestamp) AS h FROM base),
ehc AS (
  SELECT e, h FROM (
    SELECT e, h, row_number() OVER (PARTITION BY h ORDER BY e) AS rn FROM eh)
  WHERE rn <= {cap}
),
edges AS (
  SELECT a.e AS src, b.e AS dst, count(*) AS weight
  FROM ehc a JOIN ehc b ON a.h = b.h AND a.e < b.e
  GROUP BY a.e, b.e
),
bidir AS (
  SELECT src, dst, weight FROM edges
  UNION ALL SELECT dst, src, weight FROM edges
),
wdeg AS (SELECT src AS id, sum(weight)::BIGINT AS wdeg FROM bidir GROUP BY src),
nodes AS (SELECT DISTINCT coin_id AS id FROM base),
nn AS (SELECT count(*) AS n,
              floor((100.0 - 85) / 100.0 / count(*) * 1000000000 + 0.5)::BIGINT AS tele,
              floor(1.0 / count(*) * 1000000000 + 0.5)::BIGINT AS r_init
       FROM nodes),
r0 AS (SELECT id, r_init AS r FROM nodes CROSS JOIN nn),
c1 AS (
  SELECT b.dst AS id, sum((r.r * b.weight) // w.wdeg)::BIGINT AS s
  FROM bidir b JOIN r0 r ON b.src = r.id JOIN wdeg w ON b.src = w.id
  GROUP BY b.dst
),
r1 AS (
  SELECT nodes.id, (tele + (85 * coalesce(c1.s, 0)) // 100)::BIGINT AS r
  FROM nodes CROSS JOIN nn LEFT JOIN c1 ON nodes.id = c1.id
),
c2 AS (
  SELECT b.dst AS id, sum((r.r * b.weight) // w.wdeg)::BIGINT AS s
  FROM bidir b JOIN r1 r ON b.src = r.id JOIN wdeg w ON b.src = w.id
  GROUP BY b.dst
),
r2 AS (
  SELECT nodes.id, (tele + (85 * coalesce(c2.s, 0)) // 100)::BIGINT AS r
  FROM nodes CROSS JOIN nn LEFT JOIN c2 ON nodes.id = c2.id
),
c3 AS (
  SELECT b.dst AS id, sum((r.r * b.weight) // w.wdeg)::BIGINT AS s
  FROM bidir b JOIN r2 r ON b.src = r.id JOIN wdeg w ON b.src = w.id
  GROUP BY b.dst
),
r3 AS (
  SELECT nodes.id, (tele + (85 * coalesce(c3.s, 0)) // 100)::BIGINT AS r
  FROM nodes CROSS JOIN nn LEFT JOIN c3 ON nodes.id = c3.id
)"""


PAGERANK_CTES = _pagerank_ctes(2000)

PQ_SEARCH_CTES = """base AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
seeds AS (
  SELECT vec_id, code FROM (
    SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS code
    FROM base WHERE vec_id % 7 = 0) WHERE code < 64
),
vdim AS (
  SELECT vec_id, pos, pos // 4 AS sub, emb[pos + 1] AS v FROM (
    SELECT vec_id, emb, unnest(generate_series(0, 63)) AS pos FROM base)
),
cb0 AS (
  SELECT t.sub, s.code, t.pos, round(t.v, 9) AS c
  FROM vdim t JOIN seeds s USING (vec_id)
),
a_d AS (
  SELECT t.vec_id, t.sub, cb0.code,
         round(sum((t.v - cb0.c) * (t.v - cb0.c)), 9) AS d
  FROM vdim t JOIN cb0 ON cb0.sub = t.sub AND cb0.pos = t.pos
  GROUP BY t.vec_id, t.sub, cb0.code
),
assign AS (
  SELECT vec_id, sub, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn
    FROM a_d) WHERE rn = 1
),
cb AS (
  SELECT t.sub, a.code, t.pos, round(avg(t.v), 9) AS c
  FROM vdim t JOIN assign a ON a.vec_id = t.vec_id AND a.sub = t.sub
  GROUP BY t.sub, a.code, t.pos
),
enc_d AS (
  SELECT t.vec_id, t.sub, cb.code,
         round(sum((t.v - cb.c) * (t.v - cb.c)), 9) AS d
  FROM vdim t JOIN cb ON cb.sub = t.sub AND cb.pos = t.pos
  GROUP BY t.vec_id, t.sub, cb.code
),
enc AS (
  SELECT vec_id, sub, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn
    FROM enc_d) WHERE rn = 1
),
dtab AS (
  SELECT t.vec_id AS probe_id, t.sub, cb.code,
         round(sum((t.v - cb.c) * (t.v - cb.c)), 9) AS pd
  FROM vdim t JOIN cb ON cb.sub = t.sub AND cb.pos = t.pos
  WHERE t.vec_id % 50 = 0
  GROUP BY t.vec_id, t.sub, cb.code
),
adc AS (
  SELECT d.probe_id, e.vec_id AS neighbor_id, round(sum(d.pd), 9) AS adc_dist
  FROM enc e JOIN dtab d ON d.sub = e.sub AND d.code = e.code
  WHERE e.vec_id <> d.probe_id
  GROUP BY d.probe_id, e.vec_id
)"""

# IVF coarse routing bolted onto the PQ CTEs: shared by knn_ivf_pq and
# its recall contract (both f-strings append these after PQ_SEARCH_CTES)
IVF_ROUTE_CTES = """ivf_cent AS (
  SELECT vec_id AS cent_id, emb AS cent_emb FROM base WHERE vec_id % 101 = 1
),
ivf_scored AS (
  SELECT b.vec_id, c.cent_id,
         list_dot_product(b.emb, c.cent_emb)
         / (sqrt(list_dot_product(b.emb, b.emb))
            * sqrt(list_dot_product(c.cent_emb, c.cent_emb))) AS cent_cos
  FROM base b CROSS JOIN ivf_cent c
),
ivf_ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cent_cos DESC, cent_id) AS crank
  FROM ivf_scored
),
ivf_lists AS (SELECT vec_id, cent_id FROM ivf_ranked WHERE crank = 1),
ivf_probe AS (
  SELECT vec_id AS probe_id, cent_id
  FROM ivf_ranked WHERE vec_id % 50 = 0 AND crank <= 2
),
adc_ivf AS (
  SELECT d.probe_id, e.vec_id AS neighbor_id, round(sum(d.pd), 9) AS adc_dist
  FROM enc e
  JOIN ivf_lists l ON l.vec_id = e.vec_id
  JOIN ivf_probe p ON p.cent_id = l.cent_id
  JOIN dtab d ON d.sub = e.sub AND d.code = e.code AND d.probe_id = p.probe_id
  WHERE e.vec_id <> d.probe_id
  GROUP BY d.probe_id, e.vec_id
)"""

KNN_IVF_TRAINED_SQL = """
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
c0 AS (SELECT vec_id AS cent_id, emb AS cent FROM base WHERE vec_id % 101 = 1),
s1 AS (
  SELECT b.vec_id, b.emb, c.cent_id,
         round(list_sum([(b.emb[i] - c.cent[i]) * (b.emb[i] - c.cent[i])
                         for i in range(1, 65)]), 9) AS dist
  FROM base b CROSS JOIN c0 c
),
a1 AS (
  SELECT vec_id, emb, cent_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist, cent_id) AS rn
    FROM s1) WHERE rn = 1
),
u1 AS (
  SELECT cent_id, t.i AS i, avg(emb[t.i]) AS v
  FROM a1, range(1, 65) t(i) GROUP BY cent_id, t.i
),
c1 AS (
  SELECT cent_id, list(round(v, 9) ORDER BY i) AS cent FROM u1 GROUP BY cent_id
),
s2 AS (
  SELECT b.vec_id, b.emb, c.cent_id,
         round(list_sum([(b.emb[i] - c.cent[i]) * (b.emb[i] - c.cent[i])
                         for i in range(1, 65)]), 9) AS dist
  FROM base b CROSS JOIN c1 c
),
a2 AS (
  SELECT vec_id, emb, cent_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist, cent_id) AS rn
    FROM s2) WHERE rn = 1
),
u2 AS (
  SELECT cent_id, t.i AS i, avg(emb[t.i]) AS v
  FROM a2, range(1, 65) t(i) GROUP BY cent_id, t.i
),
trained AS (
  SELECT cent_id, list(round(v, 9) ORDER BY i) AS cent_emb
  FROM u2 GROUP BY cent_id
),
scored AS (
  SELECT vec_id, emb, cent_id,
         list_dot_product(emb, cent_emb)
         / (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(cent_emb, cent_emb))) AS cent_cos
  FROM base CROSS JOIN trained
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cent_cos DESC, cent_id) AS crank
  FROM scored
),
lists AS (SELECT vec_id, emb, cent_id FROM ranked WHERE crank = 1),
probe_lists AS (
  SELECT vec_id AS probe_id, emb AS probe_emb, cent_id
  FROM ranked WHERE vec_id % 50 = 0 AND crank <= 2
),
cand AS (
  SELECT probe_id, l.vec_id AS neighbor_id,
         list_dot_product(probe_emb, l.emb)
         / (sqrt(list_dot_product(probe_emb, probe_emb)) * sqrt(list_dot_product(l.emb, l.emb))) AS cosine
  FROM lists l JOIN probe_lists p ON l.cent_id = p.cent_id
  WHERE l.vec_id <> p.probe_id
)
SELECT probe_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM cand)
WHERE rank <= 5"""


# --- media stub-decode oracle -------------------------------------------
# The stubbed media decode (multimodal._fake_decode) is exact integer
# arithmetic: np.array_split the uint8 payload into 8 chunks (first
# n % 8 chunks one byte longer) and take mean(chunk)/255. Integer sums
# are exact in float64 regardless of summation order, so DuckDB's
# list_avg reproduces every feature BIT-EXACTLY — validated at fixture
# scale (0 mismatches over all docs/frames). Payload bytes are recovered
# in SQL from hex(encode(text)).
MEDIA_BYTES_CTE = """
mraw AS (
  SELECT doc_id,
         CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
           AS media_type,
         hex(encode(text)) AS h,
         octet_length(encode(text)) AS n
  FROM documents
),
mbytes AS (
  SELECT doc_id, media_type, n,
         list_transform(range(1, n + 1),
           i -> (strpos('0123456789ABCDEF', h[2*i-1]) - 1) * 16
                + strpos('0123456789ABCDEF', h[2*i]) - 1) AS b
  FROM mraw
)"""


def _chunk_mean_cols(lst: str, length: str, dim: int = 8) -> str:
    """f0..f{dim-1} chunk-mean exprs replaying np.array_split semantics:
    chunk j starts at j*(L//dim) + min(j, L%dim) and has L//dim (+1 for
    the first L%dim chunks) elements; empty chunks (L < dim) yield 0."""
    cols = []
    for j in range(dim):
        start = f"({j} * (({length}) // {dim}) + least({j}, ({length}) % {dim}))"
        size = (
            f"((({length}) // {dim})"
            f" + CASE WHEN {j} < ({length}) % {dim} THEN 1 ELSE 0 END)"
        )
        cols.append(
            f"CASE WHEN {size} = 0 THEN 0.0 ELSE "
            f"list_avg(list_slice({lst}, {start} + 1, {start} + {size})) / 255.0 END"
            f" AS f{j}"
        )
    return ",\n       ".join(cols)


MEDIA_FEATURES_SQL = f"""
WITH {MEDIA_BYTES_CTE}
SELECT doc_id, media_type,
       {_chunk_mean_cols('b', 'n')}
FROM mbytes"""

# Frame features: payload sliced from offset frame_idx % n (the stub's
# per-frame "seek"), then the same chunk means over the n - offset tail.
MEDIA_FRAMES_SQL = f"""
WITH {MEDIA_BYTES_CTE},
vid AS (
  SELECT doc_id, n, b, ((doc_id % 120) + 1)::DOUBLE AS duration_s
  FROM mbytes WHERE media_type = 'video'
),
fr AS (
  SELECT doc_id, n, b,
         unnest(generate_series(0, ceil(duration_s / 10.0)::INT - 1))::INT AS frame_idx
  FROM vid
),
sliced AS (
  SELECT doc_id, frame_idx, frame_idx * 10.0 AS frame_ts,
         list_slice(b, (frame_idx % n) + 1, n) AS sb,
         n - (frame_idx % n) AS m
  FROM fr
)
SELECT doc_id, frame_idx, frame_ts,
       {_chunk_mean_cols('sb', 'm')}
FROM sliced"""


LANGS_SQL = {
    "de": "('der','und','die','ist','ein')",
    "en": "('the','and','of','is','a')",
    "es": "('el','y','la','es','un')",
    "fr": "('le','et','la','est','un')",
}
_GREATEST = "greatest(score_de, score_en, score_es, score_fr)"

# ---------------------------------------------------------------------------
# Corpus-curation queries (operators/corpus.py) + range join + correlation
# ---------------------------------------------------------------------------

# Per-language sampling rates for the registered stratified sample:
# heavy downsample of the majority language, full keep of a minority
# one, and implicit drop of strata not listed (zh).
STRATA_FRACTIONS = {"en": 0.05, "de": 0.25, "es": 0.5, "fr": 1.0}
PACK_STRIDE = 256
PACK_BUDGET = 512
TOP_TERMS_K = 10


def _strata_case_sql() -> str:
    """Threshold when-chain for the stratified-sample oracle, derived
    from STRATA_FRACTIONS so query and oracle can never drift."""
    whens = " ".join(
        f"WHEN '{s}' THEN {round(f * 10000)}"
        for s, f in sorted(STRATA_FRACTIONS.items())
    )
    return f"CASE lang {whens} ELSE 0 END"


def q_stratified_sample(spark, sf_dir):
    """Per-stratum deterministic sampling: rebalance the corpus by
    language with content-hash thresholds (map-only, reproducible)."""
    return corpus.stratified_sample(
        _documents(spark, sf_dir), "doc_id", "lang", STRATA_FRACTIONS
    ).select("doc_id", "lang", "source")


def q_pack_chunks(spark, sf_dir):
    """Concat-and-chunk token packing manifest per source shard
    (budget 512 regex tokens per context window)."""
    return corpus.pack_chunks(_documents(spark, sf_dir), budget=PACK_BUDGET)


def q_pack_chunks_overlap(spark, sf_dir):
    """Sliding-window (RAG-style) packing manifest: budget 512, stride
    256 — each document lists every overlapping window it touches."""
    return corpus.pack_chunks(
        _documents(spark, sf_dir), budget=PACK_BUDGET, stride=PACK_BUDGET // 2
    )


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


def q_dedup_survivors(spark, sf_dir):
    """End-to-end dedup survivorship: near-dup pairs -> connected
    components -> one canonical doc per cluster + all unique docs."""
    docs = _documents(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(
        docs, n=3, threshold=0.5, max_df=NGRAM_MAX_DF
    )
    return corpus.dedup_survivors(docs, dedup.dup_clusters(pairs))


def q_session_range_join(spark, sf_dir):
    """Pure range join (no equi key): every tick of every coin against
    the trading sessions of the single highest-volume coin — binned
    interval join (operators/relational.interval_join_binned), never a
    broadcast nested loop. Aggregates market-wide activity per session
    window of the market mover."""
    from pyspark.sql import functions as F

    price = _price_base(spark, sf_dir)
    top1 = (
        price.groupBy("coin_id")
        .agg(F.sum("volume").alias("v"))
        .orderBy(F.col("v").desc(), F.col("coin_id").asc())
        .limit(1)
        .select("coin_id")
    )
    mover = price.join(F.broadcast(top1), "coin_id", "left_semi")
    sessions = relational.sessionize(
        mover, ["coin_id", "exchange"], gap_minutes=360
    ).select("session_start", "session_end")
    joined = relational.interval_join_binned(
        price.select("coin_id", "timestamp", "volume"),
        sessions,
        "timestamp",
        "session_start",
        "session_end",
    )
    return joined.groupBy("session_start", "session_end").agg(
        F.count("*").alias("n_ticks"),
        F.countDistinct("coin_id").alias("n_coins"),
        F.round(F.sum("volume"), 6).alias("total_volume"),
    )


def q_price_correlation(spark, sf_dir):
    """Pairwise Pearson correlation matrix of hourly closes across the
    top-20 coins by volume (upper triangle, >= 5 aligned candles)."""
    return derive.price_correlation(
        _price_base(spark, sf_dir), top_n=20, min_obs=5
    )


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# Ordering note: the driver's correctness gate checks the FIRST 50 entries
# of this dict at each round.  Every query is pinned at sf0.001 by
# tests/test_oracle_parity.py regardless of position; the first 50 slots are
# rotated per round so that every registered query accumulates a green
# driver-side CORRECTNESS row.  Round 5 executes the rotation plan written
# in r4: the window is (a) this round's NEW queries (knn_recall,
# url_dedup, media_decode_ppm, vwap_stream_replay), (b) the queries whose
# PLANS changed this round (the event_id-tiebreak trio bollinger/obv/
# max_drawdown and the recursive-glob knn_brute_vectorized), (c) the full
# 34-entry r4 tail, whose newest driver rows date from r3, and (d) 8
# r4-green fillers.  The tail holds only queries with a green r4 row and
# unchanged since.  Window membership is pinned by
def q_span_dedup(spark, sf_dir):
    """Sub-document duplicated-span removal (dedup.span_dedup): the
    chunk-hash approximation of exact-substring dedup (Lee et al.
    2022) — 8-word spans counted corpus-wide, every span occurring
    twice+ dropped from every carrier, text rebuilt from survivors."""
    return dedup.span_dedup(_documents(spark, sf_dir), span_words=8, min_count=2)


def q_repeated_spans_sliding(spark, sf_dir):
    """Alignment-invariant repeated-substring sweep
    (dedup.repeated_spans_sliding — the SLIDING form of span_dedup,
    r8): every overlapping 8-word window counted corpus-wide, flagged
    windows collapsed per doc into maximal word ranges via
    gaps-and-islands. Catches duplicate blocks at ANY offset (the
    suffix-array property of Lee et al. 2022), which the chunked form
    misses whenever the copy is not 8-word aligned — pinned by a
    planted shifted-copy pytest. Engine correlates windows by
    xxhash64; the oracle groups by the window text itself — identical
    counts, and the hash never reaches the output."""
    return dedup.repeated_spans_sliding(
        _documents(spark, sf_dir), span_words=8, min_count=2
    )


def q_remove_repeated_spans(spark, sf_dir):
    """The CUTTER for the sliding-span sweep
    (dedup.remove_repeated_spans, r9): the flagged maximal repeated
    ranges are removed from every carrier and the survivors
    reassembled into the cleaned document — the step that makes
    exact-substring dedup (Lee et al. 2022) a TRANSFORM, not just a
    report. One output row per INPUT doc (cleaning never drops a
    doc): (doc_id, clean_text, n_words_kept, n_words_removed);
    fully-repeated docs come out ''. The hash covers the range
    detection, the positional anti-join cut, and the in-plan
    position-ordered reassembly (collect_list of (pos, word) structs,
    array_sort, transform — no Python)."""
    return dedup.remove_repeated_spans(
        _documents(spark, sf_dir), span_words=8, min_count=2
    )


def q_remove_repeated_spans_keep_first(spark, sf_dir):
    """The ALL-BUT-ONE cutter (dedup.remove_repeated_spans_keep_first,
    r10 — the survivorship-composed form the r9 cutter's docstring
    routes to): each corpus-repeated window keeps its canonical
    occurrence (lexicographic-min (doc_id, start) — deterministic
    first-carrier survivorship) and every other occurrence is cut.
    The hash covers the per-key argmin survivorship, the non-canonical
    flagging, the range collapse, and the positional cut/reassembly.
    Engine correlates windows by xxhash64 and takes the argmin inside
    ONE map-side-combinable aggregate; the oracle groups by the window
    text with a row_number()=1 canonical — identical selections, the
    hash never reaches the output."""
    return dedup.remove_repeated_spans_keep_first(
        _documents(spark, sf_dir), span_words=8, min_count=2
    )


def q_leakage_safe_split(spark, sf_dir):
    """Near-duplicate-aware train/val/test split
    (sampling.leakage_safe_split, r9): every doc in a near-dup
    CLUSTER (log-round star CC over the MinHash-LSH verified pair
    graph) gets the SAME md5-bucket split, so an eval doc can never
    have a near-copy in train — the contamination mode a doc_id-keyed
    split cannot prevent. md5 hash family so the oracle replays the
    pair graph bit-for-bit (the xxhash64 production family keeps its
    recall pins in pytest); the oracle replays CC as recursive
    reachability and the split as the same md5 threshold."""
    return sampling.leakage_safe_split(
        _documents(spark, sf_dir), hash_family="md5"
    )


def q_gopher_rules(spark, sf_dir):
    """Gopher quality-rule battery (text.gopher_rules): the Rae et al.
    2021 §A.1.1 ruleset as per-rule boolean columns + the conjunction;
    paper-default thresholds (the 50-word floor lands at the fixture's
    median, so both outcomes are exercised)."""
    return text.gopher_rules(_documents(spark, sf_dir))


def q_mixture_sample(spark, sf_dir):
    """Temperature-weighted source mixing (sampling.mixture_sample):
    the fixture's sources are uniform, so the query derives a skewed
    60/30/10 source split from doc_id first — small sources must come
    out up-weighted (higher accept rate) vs proportional sampling."""
    from pyspark.sql import functions as F

    docs = _documents(spark, sf_dir).select(
        "doc_id",
        F.when(F.col("doc_id") % 10 < 6, F.lit("web"))
        .when(F.col("doc_id") % 10 < 9, F.lit("books"))
        .otherwise(F.lit("code"))
        .alias("mix_source"),
    )
    return sampling.mixture_sample(
        docs, group_col="mix_source", key="doc_id", budget_frac=0.5
    )


def q_price_resample_1h(spark, sf_dir):
    """Gap-filled hourly resample with forward fill
    (derive.resample_ffill): one row per (coin, exchange, hour) from
    first to last tick, carrying the latest tick price at-or-before
    the hour; is_gap marks tickless hours. Tie collapse by event_id
    keeps the carry deterministic."""
    return derive.resample_ffill(derive.tick_base(_events(spark, sf_dir)))


def q_curation_pipeline_v2(spark, sf_dir):
    """Composed round-5 curation (corpus.curation_pipeline_v2): Gopher
    gate -> span dedup -> exact dedup on the post-span text ->
    temperature mixture -> per-source manifest. The oracle replays
    every stage in one SQL chain."""
    return corpus.curation_pipeline_v2(_documents(spark, sf_dir))


def q_exchange_influencers(spark, sf_dir):
    """Composition query: top-3 coins per exchange by co-movement
    PageRank — graph analytics joined back into the serving dimension
    (exchange recovered from the entity key), ranked with the
    deterministic (rank desc, id) tiebreak.

    Re-planned r7 (verdict r6 item #2): the edge build now runs with
    the BINDING ``max_per_bucket=3`` cap (the ``coin_pagerank_capped``
    configuration — max per-minute density at sf0.01 is 4), not the
    never-binding 2000 default. The uncapped minute-bucket build was
    the last registered scale-killer: measured 103x edges / 7.8x wall
    at 10x data, while the capped build bounds edges to
    buckets * C(3, 2) whatever the tick density (measured 1.2x at
    10x). The oracle replays the identical deterministic
    top-K-by-entity-id guard via ``_pagerank_ctes(3)``."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    price = _price_base(spark, sf_dir)
    pr = graph.pagerank(
        graph.cooccurrence_edges(price, bucket="minute", max_per_bucket=3),
        price.select(F.col("coin_id").alias("id")).distinct(),
        iters=3,
    )
    w = Window.partitionBy("exchange").orderBy(F.desc("rank"), F.asc("id"))
    return (
        pr.withColumn("exchange", F.substring_index("id", "_C", 1))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("exchange", "id", "rank", "wdeg", "rk")
    )


def q_forecast_backtest(spark, sf_dir):
    """Forecast-baseline backtest (derive.forecast_backtest): naive vs
    seasonal-naive walk-forward MAPE per coin — the evaluation harness
    a forecasting layer is judged against, with the verdict on rounded
    values so both engines agree. season=4 (the change_1d lag) because
    the fixture's per-coin series are ~13 ticks — season=24 would
    evaluate nothing."""
    return derive.forecast_backtest(
        derive.tick_base(_events(spark, sf_dir)), season=4
    )


def q_volume_profile(spark, sf_dir):
    """Volume profile (derive.volume_profile): per-coin volume-by-price
    histogram over 20 equal-width bins, explicit-floor binning so
    boundary ticks land identically in both engines."""
    return derive.volume_profile(_price_base(spark, sf_dir))


def q_jsonl_roundtrip(spark, sf_dir):
    """JSONL source/sink evidence (sources.jsonl): the documents table
    written as newline-delimited JSON, a hand-corrupted line appended,
    then read back under the ENFORCED schema in PERMISSIVE mode — the
    corrupt line drops instead of killing the read, and the surviving
    rows must hash-match the original table exactly (oracle = plain
    SELECT). The write+read runs at build time (side-effect query,
    like the streaming replays)."""
    import os
    import tempfile

    from ..sources import jsonl

    docs = _documents(spark, sf_dir).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    path = tempfile.mkdtemp(prefix="jsonl_rt_")
    jsonl.write_jsonl(docs, path)
    with open(os.path.join(path, "zz_corrupt.json"), "w") as f:
        f.write('{"doc_id": not valid json\n')
    return jsonl.read_jsonl(spark, path, docs.schema)


def q_csv_roundtrip(spark, sf_dir):
    """CSV source/sink evidence (sources.delimited): the documents
    table written headerless-CSV, a hand-corrupted line (unclosed
    quote) appended, then read back under the ENFORCED schema — the
    corrupt line quarantines and drops, and the survivors must
    hash-match the original table exactly (oracle = plain SELECT).
    Write+read runs at build time, like jsonl_roundtrip."""
    import os
    import tempfile

    from ..sources import delimited

    docs = _documents(spark, sf_dir).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    path = tempfile.mkdtemp(prefix="csv_rt_")
    delimited.write_csv(docs, path)
    with open(os.path.join(path, "zz_corrupt.csv"), "w") as f:
        f.write('999999,"unclosed quote,xx,yy,12\n')
    return delimited.read_csv(spark, path, docs.schema)


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


def q_bpe_pack(spark, sf_dir):
    """Token-budget packing under the TRAINED tokenizer
    (corpus.pack_chunks_bpe — r9 verdict item #5): [[q_pack_chunks]]'
    manifest with [[q_bpe_encode]]'s exact per-document token counts
    as the budget unit, closing the BPE family end-to-end — train →
    encode → pack is the pipeline a pretraining run ships. Budget 512
    trained-tokenizer tokens per context window, disjoint; the oracle
    composes the training/encode CTE chain with the pack_chunks
    cumsum structurally ([[_bpe_pack_sql]])."""
    return corpus.pack_chunks_bpe(
        _documents(spark, sf_dir), rounds=3, budget=PACK_BUDGET
    )


def q_price_anomalies(spark, sf_dir):
    """Robust per-coin anomaly flags (derive.robust_anomalies): modified
    z-score (median/MAD, Iglewicz-Hoaglin 3.5 cutoff) on the hourly
    change column — the outlier-resistant screen a data-quality layer
    runs before indicators consume the feed."""
    return derive.robust_anomalies(derive.price_data(_events(spark, sf_dir)))


def q_coin_pagerank(spark, sf_dir):
    """Graph analytics (graph.cooccurrence_edges + graph.pagerank):
    undirected same-MINUTE co-occurrence graph over the tick stream,
    then 3 weighted PageRank rounds — the second iterative dataflow
    beside connected components, with the whole edge build + iteration
    chain replayed in the oracle. Minute buckets keep the fixture graph
    sparse (~136k edges at sf0.1 vs 6.8M hourly — per-bucket pair
    growth is quadratic in bucket density, so bucket granularity is the
    documented density dial, like max_df for postings)."""
    from pyspark.sql import functions as F

    price = _price_base(spark, sf_dir)
    edges = graph.cooccurrence_edges(price, bucket="minute")
    nodes = price.select(F.col("coin_id").alias("id")).distinct()
    return graph.pagerank(edges, nodes, iters=3)


def q_session_stream_replay(spark, sf_dir):
    """Second driver-checkable STREAMING path
    (pipeline.session_stream_replay): event-time session windows
    replayed to completion over a spooled feed; emitted sessions must
    hash-match the batch gaps-and-islands SQL (trading_sessions'
    oracle) exactly — session_window batch===stream, engine-to-engine."""
    from ..streaming.pipeline import session_stream_replay

    return session_stream_replay(spark, _price_base(spark, sf_dir))


def q_knn_pq_recall(spark, sf_dir):
    """PQ quality contract (similarity.knn_pq_recall): recall@5 of the
    product-quantized search vs exact squared-L2 brute force as one
    hash-verified row with a meets_floor boolean — approximate-search
    QUALITY for the PQ family, mirroring knn_recall's contract for
    LSH/IVF."""
    return similarity.knn_pq_recall(load_table(spark, sf_dir, "embeddings"), k=5)


def q_knn_pq(spark, sf_dir):
    """Product-quantized ANN (similarity.knn_pq): deterministic PQ
    codebooks (16 subspaces x 64 codes over 64 dims — the m=16/64-code
    point of the §8 recall sweep), corpus encoded to 16 byte-codes per
    vector, probes scored by asymmetric distance tables — the
    memory-scale half of IVF-PQ. Recall vs exact L2 is pinned in
    pytest; the oracle replays the whole closed-form construction."""
    return similarity.knn_pq(load_table(spark, sf_dir, "embeddings"), k=5)


def q_knn_ivf_pq(spark, sf_dir):
    """The composed IVF-PQ index (similarity.knn_ivf_pq): coarse
    inverted-list routing (knn_ivf's assignment) restricting which
    byte-code rows each probe's broadcast ADC table scores (knn_pq's
    scoring) — the production serving-index shape where routing and
    compression compose multiplicatively. Oracle replays routing,
    training, encoding, and ADC end-to-end in SQL on the shared
    1e-9 grid."""
    return similarity.knn_ivf_pq(load_table(spark, sf_dir, "embeddings"), k=5)


def q_media_decode_wav(spark, sf_dir):
    """REAL bytes→samples decode for RIFF/WAVE PCM16
    (multimodal.decode_wav over multimodal.wav_table): spec-compliant
    WAV payloads synthesized per doc (the stdlib ``wave`` module opens
    them — pinned in pytest), then RIFF-chunk-walked and sample-decoded
    with numpy; exact int64 sample sums make the oracle tolerance-free.
    With decode_ppm this closes the real-decode gap for a second
    modality (audio)."""
    return multimodal.decode_wav(
        multimodal.wav_table(_documents(spark, sf_dir))
    )


def q_simhash_pairs_wide(spark, sf_dir):
    """The SCALE-SAFE SimHash registration (dedup.simhash_pairs
    n_bits=128): md5's full width as 4x32-bit bands — same plan shape
    as simhash_pairs, but expected bucket collisions fall from
    N^2/2^16 to N^2/2^32, which is what makes the candidate join
    linear at web-corpus scale (the 4x16 default measured 21.9x at
    10x data; this width knob-verified sub-linear — NOTES_r05 §3,
    now driver-hash-verified here). Keeps the 64-bit entry as the
    documented teaching/baseline form."""
    return dedup.simhash_pairs(
        _documents(spark, sf_dir),
        n=3,
        max_hamming=3,
        hash_family="md5",
        n_bits=128,
    )


def q_knn_lsh_planes8(spark, sf_dir):
    """The SCALE-SAFE sign-bit LSH registration (similarity.knn_lsh
    n_planes=8): 256 buckets instead of 16 — candidates per probe fall
    16x, the dial that took the sf0.1→sf1 ratio from 18.6x to 2.0x
    (NOTES_r05 §3, knob-verified; driver-hash-verified here). The
    4-plane entry stays as the high-recall fixture form; recall at 8
    planes is the documented cost of the bucket shrink.

    Re-planned r7 (verdict r6 item #3): 256 buckets over ~500 fixture
    vectors made the r6 driver row vacuous on QUALITY — recall vs
    random neighbors ≈ 0, so the hash certified bucketing but not
    that the index finds anything. The corpus now PLANTS an exact
    twin of every probe vector under vec_id + 1000001 (the shift
    keeps twins out of the probe set: % 50 == 1): identical sign
    bits collide in every bucketing, so each probe's twin is a
    guaranteed candidate and its cosine-1 rank-1 neighbor — the
    driver hash covers candidate generation, exact-cosine verify,
    and ranking on non-empty known-answer output (the
    embedding_dup_wide recipe); the planted-recall floor is pinned
    in tests/test_dedup_similarity.py."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    twins = emb.filter(F.col("vec_id") % 50 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_001)
    )
    return similarity.knn_lsh(emb.unionByName(twins), k=5, n_planes=8)


def q_knn_ivf_fixed(spark, sf_dir):
    """The SCALE-SAFE IVF registration (similarity.knn_ivf
    centroid_limit=32): a FIXED 32-centroid coarse index instead of
    the modulus rule's C = N/101 — assignment cost N*C becomes linear
    in N (the modulus form measured 75x at 10x data; fixed C is the
    production shape, where C is a capacity choice, not a corpus
    ratio). n_probe=2 of 32 lists => each probe scans ~1/16 of the
    corpus, and the inverted-list id is the partition key at scale."""
    return similarity.knn_ivf(
        load_table(spark, sf_dir, "embeddings"), k=5, centroid_limit=32
    )


def q_media_decode_png(spark, sf_dir):
    """REAL bytes→pixels decode for PNG (multimodal.decode_png over
    multimodal.png_table) — the third real-decode modality and the
    most common image format, with stdlib zlib only: CRC-verified
    chunk walk, IDAT inflate, per-scanline unfilter covering ALL FIVE
    filter types (the synthesized corpus cycles them per row), channel
    means from the reconstructed pixels. Same closed-form pixel
    pattern as media_decode_ppm, so the oracle needs no decoder."""
    return multimodal.decode_png(
        multimodal.png_table(_documents(spark, sf_dir))
    )


def q_salted_join_skew(spark, sf_dir):
    """Skew-mitigated join evidence (relational.salted_join): the
    price feed keyed by symbol with a DELIBERATE hot key (every
    symbol with u % 5 != 0 remaps to 'HOT' — ~80% of all rows funnel
    into one key), joined salted (8 buckets) against the derived
    key dimension, then aggregated per key. Salting is result-
    identical to the plain join by construction; the oracle IS the
    plain join, so the driver hash pins exactly that equivalence.
    At scale the salt spreads the hot key across 8 shuffle partitions
    instead of one straggler task."""
    from ..operators import relational

    from pyspark.sql import functions as F

    price = _price_base(spark, sf_dir)
    u = F.regexp_extract("coin_id", "_C([0-9]+)$", 1).cast("int")
    big = price.select(
        F.when(u % 5 != 0, F.lit("HOT"))
        .otherwise(F.concat(F.lit("C"), u.cast("string")))
        .alias("key"),
        "volume",
    )
    small = big.select("key").distinct().select(
        "key", F.md5(F.col("key")).alias("key_tag")
    )
    joined = relational.salted_join(big, small, ["key"], buckets=8)
    return (
        joined.groupBy("key", "key_tag")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("volume"), 6).alias("total_volume"),
        )
    )


def q_restfeed_stream_replay(spark, sf_dir):
    """Fifth driver-checkable STREAMING path — the custom Python
    DataSource's STREAMING face end-to-end
    (pipeline.restfeed_stream_replay): the REST poll loop drained in
    5-minute micro-batches under availableNow through the watermarked
    candle aggregate. No sentinel: the final watermark stops inside
    hour 2, so append mode withholds the open last window — the
    oracle encodes exactly that (closed-form feed + candles for the
    two closed hours). ``sf_dir`` is unused: the source IS the data."""
    from ..streaming.pipeline import restfeed_stream_replay

    return restfeed_stream_replay(spark)


def q_embedding_dup_wide(spark, sf_dir):
    """The SCALE-SAFE embedding near-dup registration
    (similarity.embedding_dup_pairs n_planes=32, bands=4 — 8-bit
    bands, 256 buckets/band): same banded sign-bit LSH + exact-cosine
    verify as embedding_dup_pairs, with candidate collisions ∝
    N²/2^8 per band instead of N²/2^4 — the knob NOTES_r05 §3
    measured taking the sf0.1→sf1 ratio from 52x to 3.5x, now
    driver-hash-verified with its own exact oracle (deterministic
    plane literals shared with the SQL). The 16-plane entry stays as
    the high-recall fixture form.

    The fixtures' planted cosine near-dups don't collide at 8-bit
    band width (the registered 16-plane run finds exactly 1 pair at
    sf0.01; this config finds none), so the corpus PLANTS exact twins
    of every 25th vector under shifted ids — identical sign bits make
    every band collide, cosine 1 survives the verify, and the driver
    row checks candidate generation AND verify on non-empty output
    instead of hashing an empty set."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    twins = emb.filter(F.col("vec_id") % 25 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000)
    )
    return similarity.embedding_dup_pairs(
        emb.unionByName(twins), n_planes=32, bands=4
    )


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup (similarity.semantic_dedup,
    Abbas et al. 2023): assignment-only clustering onto the fixed
    32-seed coarse index, then cosine>=0.9 near-dup detection ONLY
    within each cluster — the pair space is sum_c(|c| choose 2)
    instead of (N choose 2), the bound that makes embedding dedup
    tractable at corpus scale. Like embedding_dup_wide, the corpus
    PLANTS exact twins of every 25th vector under shifted ids (random
    fixture vectors almost never exceed 0.9), so the driver hash
    verifies clustering, within-cluster pairing, the drop rule, and
    the smallest-id dup_of attribution on non-empty output."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    twins = emb.filter(F.col("vec_id") % 25 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000)
    )
    return similarity.semantic_dedup(
        emb.unionByName(twins), threshold=0.9, n_clusters=32
    )


def q_semantic_dedup_trained(spark, sf_dir):
    """The trained-centroid SemDeDup route (verdict r6 item #6) —
    the documented WEB-SCALE form: semantic_dedup's coarse index is
    the OUTPUT of kmeans_centroids (fixed K=32, two Lloyd rounds)
    instead of raw seed vectors, because refined centroids balance
    cluster sizes, which at corpus scale evens the per-cluster
    quadratic pair cost (the Σ|c|² bound is tightest when the |c|
    are equal). Same planted-twin corpus as semantic_dedup, so the
    driver hash verifies training → assignment → within-cluster
    pairing → drop attribution end-to-end on non-empty output. The
    oracle composes the _kmeans_ctes chain (both engines round
    centroid dims to the shared 1e-9 grid each Lloyd round, so the
    trained index is bit-identical) with the semantic-dedup replay."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    twins = emb.filter(F.col("vec_id") % 25 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000)
    )
    cents = similarity.kmeans_centroids(emb, iters=2, centroid_limit=32)
    return similarity.semantic_dedup(
        emb.unionByName(twins), threshold=0.9, centroids=cents
    )


def q_semantic_dedup_capped(spark, sf_dir):
    """The CLUSTER-SKEW-safe SemDeDup registration (r8, measured
    motivation): at sf10 the trained route's within-cluster pair join
    serialized on ONE straggler task in BOTH the C=32 (>25 min,
    truncated) and C=320 (>20 min, truncated) configurations — this
    fixture's embedding distribution has a dominant mode, so the
    "refined centroids balance the lists" premise fails exactly where
    it matters and |c_max|² owns the wall clock. Same trained index
    and planted-twin corpus as semantic_dedup_trained, plus the
    max_cluster=12 deterministic member cap (BINDS at sf0.01, where
    trained clusters run up to 25 members — the capped output DIFFERS
    from the uncapped form, so the hash genuinely covers the guard): md5-priority WindowGroupLimit top-K per cluster —
    the ngram max_df / coin_pagerank_capped / host_cap guard family —
    bounds pair candidates to C·cap² regardless of skew. The driver
    hash pins the guard's exact semantics (priority, tie-break,
    superset-on-raise); measured at sf10: the capped form runs in
    assignment-bound time where both uncapped forms were truncated
    (NOTES_r08 §10)."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    twins = emb.filter(F.col("vec_id") % 25 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000)
    )
    cents = similarity.kmeans_centroids(emb, iters=2, centroid_limit=32)
    return similarity.semantic_dedup(
        emb.unionByName(twins), threshold=0.9, centroids=cents, max_cluster=12
    )


def q_coin_pagerank_capped(spark, sf_dir):
    """The SCALE-SAFE PageRank registration: identical iteration to
    coin_pagerank, but the co-occurrence edge build runs with a
    max_per_bucket cap that BINDS (3; max per-minute density at
    sf0.01 is 4) — per-bucket pair growth is the graph family's
    quadratic term (measured: 116k -> 11.9M edges, 103x, at 10x data
    with the non-binding 2000 default), and the deterministic
    top-K-by-id guard bounds edges to buckets * C(K, 2) no matter how
    dense ticks get. K=3 is fixture-sized for the same reason
    knn_ivf_fixed's C=32 is: the point the driver hash pins is the
    guard's SEMANTICS (replayed exactly in SQL), while production
    picks K for graph fidelity."""
    from pyspark.sql import functions as F

    price = _price_base(spark, sf_dir)
    edges = graph.cooccurrence_edges(price, bucket="minute", max_per_bucket=3)
    nodes = price.select(F.col("coin_id").alias("id")).distinct()
    return graph.pagerank(edges, nodes, iters=3)


def q_dedup_stream_replay(spark, sf_dir):
    """SIXTH driver-checkable STREAMING path
    (pipeline.dedup_stream_replay), first for the ingestion-dedup
    guard: the spooled feed carries planted exact re-deliveries of
    ~1/7 of the rows in later files, dropDuplicatesWithinWatermark
    runs over the full row with a delay outlasting the replay, and
    the emitted rows must hash-match one batch DISTINCT of the price
    base — a single surviving duplicate (or a falsely dropped
    original) flips the driver hash."""
    from ..streaming.pipeline import dedup_stream_replay

    return dedup_stream_replay(spark, _price_base(spark, sf_dir))


def q_plan_audit(spark, sf_dir):
    """Plan-shape observability as a driver-checked contract
    (plans.audit): deterministic physical-plan features (shuffle /
    broadcast / join-strategy / WindowGroupLimit counts) of eight
    representative queries, hash-pinned against literal expected
    values — a new shuffle or a degraded join strategy anywhere in
    these plans flips the driver hash instead of waiting for a human
    to re-read EXPLAIN.md. Features verified identical under the tuned
    and vanilla sessions and across sf0.001/sf0.01 (they depend only
    on the logical plan + planner; every audited join is hint-pinned).
    ``sf_dir`` feeds the audited builders; the row count is the number
    of audited queries (metadata, not data)."""
    from .audit import audit_plans

    names = [
        "coin_table", "exact_dedup", "technical_indicators",
        "coin_market_cap", "gopher_rules", "media_metadata",
        "price_chart", "url_dedup",
    ]
    return audit_plans(spark, {n: QUERIES[n](spark, sf_dir) for n in names})


def q_plan_audit_skew(spark, sf_dir):
    """Native AQE skew-join split as a driver-hash row (plans.audit.
    aqe_skew_probe — r7 verdict stretch #8, the runtime twin of
    salted_join_skew's manual salting): a deliberately skewed SMJ on
    a FIXED synthetic input runs twice, skewJoin on/off; the row pins
    that the adaptive FINAL plan really split the straggler partition
    (skew=true + AQEShuffleRead) exactly when enabled, and that both
    modes return bit-identical aggregates. Probe-scoped configs are
    pinned and restored, so the row is invariant to session config
    and to ``sf_dir`` (unused — the probe must not scale with sf)."""
    from .audit import aqe_skew_probe

    return aqe_skew_probe(spark)


def q_media_features_auto(spark, sf_dir):
    """GENERIC real decode (multimodal.media_features_auto): a MIXED
    six-format media corpus — each document's payload synthesized as
    real PPM/PNG/BMP/GIF/JPEG/WAV bytes by doc_id % 6, plus a slice of
    raw-text payloads that must come back fmt='unknown' with NULL
    features (the production quarantine path) — decoded through the
    magic-byte dispatch into one uniform feature row per payload.
    Closes the r6 'generic any-codec feature-extract' stub for every
    format the engine really decodes; each arm's closed-form oracle is
    the single-format corpus oracle, so the whole dispatch is
    hash-verified end to end."""
    from pyspark.sql import functions as F

    docs = _documents(spark, sf_dir)

    def pick(k):
        return docs.filter(F.col("doc_id") % 6 == k)

    unknown = docs.filter(F.col("doc_id") % 97 == 3).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    corpus = (
        multimodal.ppm_table(pick(0)).select("doc_id", "payload")
        .unionByName(multimodal.png_table(pick(1)).select("doc_id", "payload"))
        .unionByName(multimodal.bmp_table(pick(2)).select("doc_id", "payload"))
        .unionByName(multimodal.gif_table(pick(3)).select("doc_id", "payload"))
        .unionByName(multimodal.jpeg_table(pick(4)).select("doc_id", "payload"))
        .unionByName(multimodal.wav_table(pick(5)).select("doc_id", "payload"))
        .unionByName(unknown)
    )
    return multimodal.media_features_auto(corpus)


def q_media_frames_real(spark, sf_dir):
    """REAL frame extraction (multimodal.media_frames_real): the WAV
    corpus sample-decoded and cut into 8 ms windows (64 frames at
    8 kHz); each window row carries exact int64 amplitude sums plus
    RMS, replayed closed-form from the wav_table sample formula —
    frame sampling stops being schedule-only (frame_schedule) and
    becomes decoded-samples-in, windowed-features-out."""
    return multimodal.media_frames_real(
        multimodal.wav_table(_documents(spark, sf_dir)), every_s=0.008
    )


def q_hybrid_retrieval_rrf(spark, sf_dir):
    """Hybrid retrieval (similarity.hybrid_retrieval_rrf): BM25 top-50
    and brute-cosine top-50 against the vec_id=0 embedding, fused by
    Reciprocal Rank Fusion 1/(60+rank) — the Elasticsearch-style
    hybrid-search composition over this engine's own lexical and
    vector arms. Each arm is TakeOrderedAndProject (no global sort);
    the rank windows run over the post-limit <=50-row frames."""
    return similarity.hybrid_retrieval_rrf(
        _documents(spark, sf_dir), load_table(spark, sf_dir, "embeddings")
    )


def q_bm25_scores(spark, sf_dir):
    """Okapi BM25 retrieval scoring (text.bm25_scores) over the fixed
    literal query terms — the lexical-search sibling of the embedding
    ANN family: one tokenize scan, match-filtered before the shuffle,
    df via a count window over per-(doc, term) rows, corpus stats
    broadcast. Lucene's non-negative idf variant; ln (not log10) on
    both engines."""
    return text.bm25_scores(_documents(spark, sf_dir))


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (sampling.dsir_weights, arXiv:2302.03169):
    hashed-unigram bucket LM ratio of the corpus's own lang='en' slice
    vs the raw corpus, add-1 smoothed over 256 md5 buckets — the
    data-selection scorer that tilts a crawl toward a curated target
    without training a classifier. Bucket counts are windows over the
    exploded stream; the 1-row totals frame joins broadcast."""
    return sampling.dsir_weights(_documents(spark, sf_dir))


def q_dsir_sample(spark, sf_dir):
    """DSIR importance RESAMPLING (sampling.dsir_sample, r10 — the
    step that completes arXiv:2302.03169's recipe): top-200 documents
    by log_weight + deterministic Gumbel noise (hash_unit of doc_id —
    2^32-level md5 noise since the ADVICE r10 widening), i.e. a
    k-sample without replacement proportional to exp(log_weight)
    (hash-quantized) that replays bit-for-bit in SQL. The draw is a
    map-side key + TakeOrdered (orderBy().limit — per-partition
    top-k, no global sort); the weights chain is [[q_dsir_weights]]'.
    The driver hash covers the weights, the Gumbel arithmetic, and
    the selection boundary."""
    return sampling.dsir_sample(_documents(spark, sf_dir), k=200)


def q_pca_top_component(spark, sf_dir):
    """Distributed PCA (similarity.pca_top_component): top principal
    component of the first 16 embedding dims via ONE single-row
    covariance aggregate + a fixed unrolled power iteration + a
    broadcast projection pass — distributed linear algebra where the
    only corpus-wide shuffle carries d means + d(d+1)/2 Gram sums.
    The oracle (_pca_sql) replays covariance, the 1/sqrt(16) start
    vector, and all twelve normalized iterations expression-for-
    expression on the same rounding grid; the Rayleigh-quotient
    quality contract vs numpy's exact eigh is pinned in pytest."""
    return similarity.pca_top_component(
        load_table(spark, sf_dir, "embeddings"), dim=16, iters=12
    )


def q_knn_ivf_append(spark, sf_dir):
    """Incremental IVF maintenance (similarity.knn_ivf_append): the
    ingest batch — exact twins of every 25th vector under shifted ids,
    so probes verifiably find cosine-1.0 neighbors across the
    base/increment boundary — joins the STORED index (centroids fixed
    from the base, base lists materialized once) with increment-only
    assignment work. The oracle is the from-scratch IVF over the
    union, so the hash pins append ≡ full reindex."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    inc = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    return similarity.knn_ivf_append(emb, inc, centroid_limit=32)


def q_media_decode_jpeg_color(spark, sf_dir):
    """REAL bytes→pixels decode for baseline COLOR JPEG
    (multimodal.decode_jpeg_color over multimodal.jpeg_table_color) —
    the seventh real-decode row closes the 'color JPEG remains
    outside' boundary: YCbCr 4:2:0 with interleaved 2x2+1+1 MCUs,
    per-component DC prediction, chroma upsample, JFIF YCbCr→RGB.
    Exactness trick: flat DC-only blocks + q[DC]=8 + NEUTRAL chroma
    (Cb=Cr=128 → the RGB conversion multiplies its float constants by
    exactly 0.0), so the channel means equal the luma block average —
    closed-form in SQL for a lossy color format. Non-neutral chroma is
    pinned by a handcrafted pytest payload through the same path."""
    return multimodal.decode_jpeg_color(
        multimodal.jpeg_table_color(_documents(spark, sf_dir))
    )


def q_quality_survivors(spark, sf_dir):
    """Quality-aware dedup survivorship (corpus.quality_survivors):
    within each near-dup cluster keep the HIGHEST-quality member —
    the production keep-rule (duplicates differ by boilerplate and
    truncation, so min-id/first-crawled is wrong). Composes the exact
    ngram pair graph → min-label clusters → quality_score argmax per
    cluster (WindowGroupLimit top-1, ties on doc_id)."""
    docs = _documents(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(
        docs, n=3, threshold=0.5, max_df=NGRAM_MAX_DF
    )
    return corpus.quality_survivors(
        dedup.dup_clusters(pairs), text.quality_score(docs)
    )


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

    from ..operators import corpus as corpus_ops

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


def q_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape (relational.large_volume_customers): the
    aggregate-as-join-filter plan — one partial-combined corpus
    aggregate, HAVING leaves a tiny key set, which is BROADCAST
    through the orders and customer joins so lineitem never reaches a
    join exchange. Completes the classic-OLAP anchor set next to Q1
    (pricing_summary), Q3 (shipping_priority) and the Q5-shaped
    revenue_by_nation."""
    from ..operators.relational import large_volume_customers

    return large_volume_customers(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


def q_pca_residual(spark, sf_dir):
    """ABTT whitening (similarity.pca_residual_norms): remove the
    dominant direction pca_top_component finds and emit each vector's
    projection + residual norm — the embedding de-biasing step (Mu &
    Viswanath 2018) composed directly on the PCA primitive; still one
    single-row corpus aggregate + a broadcast map pass. The oracle
    replays the identical generated expressions including the
    rounded-pc1 subtraction."""
    return similarity.pca_residual_norms(
        load_table(spark, sf_dir, "embeddings"), dim=16, iters=12
    )


def q_dup_clusters_star(spark, sf_dir):
    """Log-round connected components
    (dedup.connected_components_star, Kiveris et al. 2014 alternating
    large-star/small-star) — the scale-path twin of dup_clusters'
    min-label propagation, on a fixture BUILT to break the Pregel
    form: chain components of diameter ~127 (blocks of 64 consecutive
    doc_ids chained, adjacent block pairs bridged), where min-label
    needs ~127 shuffle rounds (its default max_iter=50 RAISES; pinned
    in pytest) and the star alternation converges in ~7. Each round
    is two exchanges per star op; the driver reads one changed-edge
    indicator per round. Oracle: the dup_clusters recursive-CTE
    reachability, over the same arithmetic edge construction."""
    from pyspark.sql import functions as F

    docs = _documents(spark, sf_dir).select("doc_id")
    chain = docs.filter(F.col("doc_id") % 64 != 63).select(
        F.col("doc_id").alias("doc_id_a"),
        (F.col("doc_id") + F.lit(1)).alias("doc_id_b"),
    )
    bridge = docs.filter(F.col("doc_id") % 128 == 0).select(
        F.col("doc_id").alias("doc_id_a"),
        (F.col("doc_id") + F.lit(96)).alias("doc_id_b"),
    )
    return dedup.connected_components_star(chain.unionByName(bridge))


def q_spread_outer_stream_replay(spark, sf_dir):
    """Stream-stream LEFT OUTER join replay
    (pipeline.spread_outer_stream_replay): the watermark's
    null-extension semantic — an unmatched left tick is emitted
    null-extended exactly once, only after the watermark proves no
    future right tick can match. An in-band sentinel pair (reserved
    symbol, both exchanges, +72 h) pushes the final watermark past
    the whole feed so the emitted frame equals the batch LEFT theta
    join exactly; the inner-join face is spread_stream_replay."""
    from ..streaming.pipeline import spread_outer_stream_replay

    return spread_outer_stream_replay(spark, _price_base(spark, sf_dir))


def q_drawdown_stream_replay(spark, sf_dir):
    """Custom-stateful streaming replay
    (streaming.pipeline.drawdown_stream_replay → stateful_drawdown):
    running peak / drawdown / tick counter via applyInPandasWithState,
    the tick feed drained in three TIME-ORDERED waves one file per
    micro-batch so per-key state genuinely crosses batch boundaries —
    promotes T5 (custom stateful operators) from pytest-only to a
    driver-hash row. The operator's arithmetic is bit-exact by
    construction (comparison-only peak, one IEEE divide, integer tick
    index), so the oracle is a plain window replay over the same tick
    projection — no rounding pin needed."""
    from ..streaming.pipeline import drawdown_stream_replay

    return drawdown_stream_replay(spark, _price_base_tb(spark, sf_dir))


def _fuzzy_names(spark, sf_dir):
    """The shared fuzzy-linkage corpus base: each document's
    normalized 24-char name slice (length >= 24 guard). Shared by
    [[q_fuzzy_match_blocked]] and [[q_fuzzy_match_multipass]] so the
    slice width / filter / twin recipes can never silently diverge
    between the two registrations (code-review r10)."""
    from pyspark.sql import functions as F

    from ..functions.text import normalized_text

    norm = normalized_text(F.col("text"))
    return (
        _documents(spark, sf_dir)
        .select("doc_id", F.substring(norm, 1, 24).alias("name"))
        .filter(F.length(norm) >= 24)
    )


def _fuzzy_twins(names, mod_rem: int, sub_pos: int, id_offset: int):
    """Planted edit-distance-1 twin family: for doc_id % 7 ==
    ``mod_rem``, substitute '#' at 1-based char ``sub_pos`` of the
    24-char name and shift the id by ``id_offset`` (the
    knn_lsh_planes8 known-answer recipe)."""
    from pyspark.sql import functions as F

    return names.filter(F.col("doc_id") % 7 == mod_rem).select(
        (F.col("doc_id") + id_offset).alias("doc_id"),
        F.concat(
            F.substring("name", 1, sub_pos - 1),
            F.lit("#"),
            F.substring("name", sub_pos + 1, 24 - sub_pos),
        ).alias("name"),
    )


def q_fuzzy_match_blocked(spark, sf_dir):
    """Blocked fuzzy record linkage (dedup.fuzzy_match_blocked):
    edit-distance entity resolution — the primitive behind metadata
    dedup (titles, authors, OCR'd strings) that set-similarity can't
    express. The registered corpus is each document's normalized
    24-char name PLUS a planted twin per doc_id % 7 == 3 (one char
    substituted mid-string, AFTER the 8-char blocking prefix, so each
    twin is a guaranteed same-block edit-distance-1 match — the
    knn_lsh_planes8 known-answer recipe); the driver hash therefore
    covers blocking, the length prefilter, and levenshtein verify on
    non-empty output. Natural prefix-share pairs ride along
    identically in both engines."""
    from ..operators import dedup

    names = _fuzzy_names(spark, sf_dir)
    twins = _fuzzy_twins(names, mod_rem=3, sub_pos=13, id_offset=1_000_001)
    return dedup.fuzzy_match_blocked(
        names.unionByName(twins), name_col="name", id_col="doc_id",
        block_prefix=8, max_dist=2, max_block=200,
    )


def _fuzzy_reorder_twins(names, mod_rem: int):
    """Planted token-REORDER twin family (r10 verdict item #5 — the
    LAST-FIRST/FIRST-LAST convention clash): per doc_id % 7 ==
    ``mod_rem``, TWO short planted rows — "t1 t2" (id + 3,000,003)
    and "t2 t1" (id + 4,000,004) with t1/t2 the first two 2-char
    slices of md5(doc_id) (hex, so normalize is the identity). The
    reorder costs <= 4 Levenshtein edits (two 2-char substitutions),
    changes BOTH the 8-char prefix and the 8-char suffix key, and
    leaves the sorted-token key invariant — each pair is findable
    ONLY by the sorted-token pass (pinned in pytest)."""
    from pyspark.sql import functions as F

    h = F.md5(F.col("doc_id").cast("string"))
    base = names.filter(F.col("doc_id") % 7 == mod_rem).select(
        "doc_id",
        F.substring(h, 1, 2).alias("t1"),
        F.substring(h, 3, 2).alias("t2"),
    )
    fwd = base.select(
        (F.col("doc_id") + 3_000_003).alias("doc_id"),
        F.concat_ws(" ", "t1", "t2").alias("name"),
    )
    rev = base.select(
        (F.col("doc_id") + 4_000_004).alias("doc_id"),
        F.concat_ws(" ", "t2", "t1").alias("name"),
    )
    return fwd.unionByName(rev)


def q_fuzzy_match_multipass(spark, sf_dir):
    """Multi-pass blocked fuzzy linkage (dedup.fuzzy_match_multipass —
    r9 verdict item #7, sorted-token pass r10 verdict item #5): the
    [[q_fuzzy_match_blocked]] corpus PLUS (a) a second planted twin
    family per doc_id % 7 == 5 with the character substitution INSIDE
    the 8-char blocking prefix (char 3) — the documented single-pass
    miss — and (b) a planted token-REORDER pair family per doc_id % 7
    == 1 ([[_fuzzy_reorder_twins]]: "t1 t2" vs "t2 t1" short names,
    <= 4 edits apart, both positional keys changed). THREE passes at
    max_dist=4: the default prefix key (finds same-prefix edits), a
    LAST-8-chars suffix key via right(norm, 8) (finds the in-prefix
    family — right() rather than the old fixed substr(17, 8) so the
    short reorder names keep per-row suffix keys instead of
    degenerating into one '' block), and the permutation-invariant
    sorted-token key (finds exactly the reorder family). Pairs
    unioned and deduplicated; the driver hash covers all three
    passes' blocking, the planted recoveries, and the distinct."""
    from pyspark.sql import functions as F

    from ..operators import dedup

    names = _fuzzy_names(spark, sf_dir)
    twins_mid = _fuzzy_twins(names, mod_rem=3, sub_pos=13, id_offset=1_000_001)
    twins_prefix = _fuzzy_twins(
        names, mod_rem=5, sub_pos=3, id_offset=2_000_002
    )
    twins_reorder = _fuzzy_reorder_twins(names, mod_rem=1)
    return dedup.fuzzy_match_multipass(
        names.unionByName(twins_mid)
        .unionByName(twins_prefix)
        .unionByName(twins_reorder),
        name_col="name",
        id_col="doc_id",
        block_exprs=(
            None,
            F.expr("right(norm, 8)"),
            F.array_join(F.array_sort(F.split(F.col("norm"), " ")), " "),
        ),
        max_dist=4,
        max_block=200,
    )


def q_curation_pipeline_v3(spark, sf_dir):
    """The end-to-end pretraining pipeline (corpus.curation_pipeline_v3,
    r10 verdict item #3): quality gate -> MinHash-LSH near-dup dedup
    (md5 family) -> deterministic split (cluster-keyed via the
    canonical survivor) -> shingle decontamination -> DSIR Gumbel
    top-k resample (k=200) -> token-true BPE packing of the selected
    train corpus (tokenizer trained on the selection itself). The
    driver hash covers every stage boundary: a change in any gate,
    pair, split, contamination verdict, importance weight, merge
    table, or chunk edge moves the output. The oracle composes the
    SAME generated parts as the per-stage oracles
    ([[_minhash_lsh_parts]], [[_dsir_scored_parts]],
    [[_bpe_encode_ctes]]) re-pointed at the upstream CTEs."""
    return corpus.curation_pipeline_v3(_documents(spark, sf_dir))


# tests/test_sql_api.py::test_driver_window_membership (EXPECTED_R8_WINDOW);
# ORACLES == QUERIES by test_registry_invariants.
# ROUND-7 ROTATION EXECUTED (registry = 158 queries, window = first 50):
# 12 new registrations (semantic_dedup_trained, recovery_stream_replay,
# media_decode_bmp, media_decode_gif, media_decode_jpeg — the r6 JPEG
# codec had pytest-only evidence — media_resize,
# incremental_dedup_bloom, zorder_profile, cms_frequencies,
# enrich_stream_replay, late_drop_stream_replay, and
# knn_ivf_full_fixed — fixed C AND fixed probes, 49x at 100x data vs
# 104x for the %50-probe fixture rule) + 2 re-plans
# (knn_lsh_planes8 now plants probe twins so its hash covers non-empty
# candidate+verify; exchange_influencers now runs the BINDING
# max_per_bucket=3 edge cap) + 36 of the 46 r4-row entries — the whole
# remaining r4-stale evidence set except ten yields:
# stochastic/donchian/ichimoku/rolling_beta (the indicators' shared
# fused-mapInPandas / window plan family is pinned this round by
# in-window atr_14 and technical_indicators), cross_exchange_spread
# (batch theta join pinned by the r6-row spread_stream_replay),
# documents_profile (profiling aggregate pinned by the r5-row
# corpus_quality_report), close_pivot (conditional-agg pivot pinned
# by the r5-row volume_grouping_sets' Expand family + pytest),
# vwap_hourly (its EXACT oracle SQL is shared verbatim by the r5-row
# vwap_stream_replay, so the computation stays driver-verified), and
# ohlc_chart (its candle CTE is pinned by in-window ohlc_candles and
# its serving filters by in-window price_chart/indicator_chart), and
# envelope_mcap (one of four identical-shape explode branches of the
# same envelope codec; envelope_price/coins/ohlc stay in-window). All
# ten r4 rows stand and front-load r8.
# New registrations hit the ~12 cap exactly (12 + 2 re-plans).
# AFTER the r7 driver run: no registered query's newest driver row is
# older than r5 except the ten yielded entries (r4).
# ROUND-10 ROTATION EXECUTED per the r9 guidance (kept below) — see
# the _R10_WINDOW_FRONT reorder after the QUERIES literal (and
# PINNING.md for the per-query evidence map). The demotion trigger
# FIRED this round (186 registrations pre-demotion, the ten teaching
# forms = the r9 verdict's entire perf-weak list), so the nine
# teaching-form r6 rows were demoted rather than rotated; their
# verbatim oracles are exercised every run by
# test_teaching_form_matches_oracle_after_demotion.
# ROUND-11 ROTATION EXECUTED per the r10 guidance (kept below) — see
# _R11_WINDOW_FRONT after the QUERIES literal: (a) curation_pipeline_v3
# (new) + the re-planned fuzzy_match_multipass and dsir_sample, (b)
# the full 31-entry r7-row cohort, (c) the 16 oldest r8-row entries.
# AFTER the r11 driver run: no registered query's newest row is older
# than r8.
# Round-12 rotation guidance: front-load (a) anything r12 adds or
# re-plans, (b) the 32 remaining r8-row entries not covered by the r11
# window (shipping_priority, knn_ivf_pq_recall, envelope_mcap,
# ohlc_chart, vwap_hourly, close_pivot, documents_profile,
# cross_exchange_spread, rolling_beta, stochastic, donchian, ichimoku,
# bm25_scores, dsir_weights, media_features_auto, media_frames_real,
# hybrid_retrieval_rrf, pca_top_component, dup_clusters_star,
# spread_outer_stream_replay, pca_residual, knn_ivf_append,
# media_decode_jpeg_color, large_volume_customers, quality_auc,
# host_cap, quality_survivors, media_frames_gif, bpe_vocab_k,
# plan_audit_skew, bpe_encode, semantic_dedup_capped), registry
# order, then (c) the oldest r9-row entries with any remaining slots.
# Rename EXPECTED_R11_WINDOW to EXPECTED_R12_WINDOW in the same
# commit.
# The r10-written round-11 guidance (kept for history):
# front-load (a) anything r11 adds or
# re-plans, (b) the r7-row cohort not covered by the r10 window
# (price_chart, indicator_chart, coin_display, quality_score,
# token_counts, lang_id, doc_fingerprint, bigram_logprob,
# doc_length_quantiles, top_terms, redact_pii, dataset_split,
# deterministic_sample, stratified_sample, pack_chunks,
# media_metadata, frame_schedule, coins_dim, price_data,
# ohlc_candles, technical_indicators, coin_market_cap, coin_table,
# envelope_price, envelope_coins, envelope_ohlc,
# coin_indicators_left, volume_rollup, text_stats, plus atr_14 and
# exchange_cardinality_approx which yielded their r10 slots — 31
# entries),
# registry order, then (c) the oldest r8-row entries with any
# remaining slots. Rename EXPECTED_R10_WINDOW to EXPECTED_R11_WINDOW
# in the same commit.
# The r9-written round-10 guidance (kept for history):
# front-load (a) anything r10 adds or re-plans, (b)
# spread_stream_replay and exact_dedup (r6 rows that yielded their r9
# (d) slots to the mid-round registrations), (c) the ~33 remaining
# r6-row entries not covered by the r9 window, oldest first in
# registry order (simhash_pairs/semantic_dedup/incremental_dedup/
# knn_lsh/knn_brute/knn_ivf/kmeans_centroids/dup_clusters/
# embedding_dup_pairs are TEACHING forms — include them only if the
# demotion trigger has NOT fired by then, else flip
# DEMOTE_TEACHING_FORMS instead), then (d) the oldest r7-row entries
# with any remaining slots.
# The r8-written round-9 guidance (kept for history):
# front-load (a) anything r9 adds or re-plans, (b) the remaining
# ~30 r5-row entries not covered by the r8 window (dup_rate_by_source,
# coin_volume_percentile, volume_grouping_sets, knn_recall, url_dedup,
# media_decode_ppm, vwap_stream_replay, span_dedup, gopher_rules,
# media_decode_wav, mixture_sample, knn_pq, curation_pipeline_v2,
# price_resample_1h, knn_pq_recall, session_stream_replay,
# coin_pagerank, price_anomalies, forecast_backtest, bpe_merges,
# jsonl_roundtrip, volume_profile, bollinger_bands, max_drawdown, obv,
# knn_brute_vectorized, active_coins_semi, momentum_ranks,
# knn_lsh_multiprobe, ...), oldest first, then (c) the ten r4-yield
# entries rotated through r8 only if their r8 rows aged out.
# The original r7-written guidance (kept for history):
# front-load (a) anything r8 adds or
# re-plans, (b) the nine yielded r4-row entries (stochastic/donchian/
# ichimoku/rolling_beta/cross_exchange_spread/documents_profile/
# close_pivot/vwap_hourly/ohlc_chart/envelope_mcap — the only
# r4-row entries
# left), (c) the 50 entries whose newest rows are r5
# (activity_reconciliation, event_props_variant, keltner_channels,
# candlestick_patterns, vocab_coverage, scd2_volume_tiers, knn_ivf_pq,
# csv_roundtrip, heikin_ashi, funnel_conversion, lead_lag_corr,
# rolling_sharpe, market_regime, corpus_quality_report,
# pricing_summary, rolling_active_coins, shipping_priority,
# knn_ivf_pq_recall, exchange_hll_rollup, ohlc_stream_replay,
# dup_rate_by_source, coin_volume_percentile, volume_grouping_sets,
# knn_recall, url_dedup, media_decode_ppm, vwap_stream_replay,
# span_dedup, gopher_rules, media_decode_wav, mixture_sample, knn_pq,
# curation_pipeline_v2, price_resample_1h, knn_pq_recall,
# session_stream_replay, coin_pagerank, price_anomalies,
# forecast_backtest, bpe_merges, jsonl_roundtrip, volume_profile,
# bollinger_bands, max_drawdown, obv, knn_brute_vectorized,
# active_coins_semi, momentum_ranks, knn_lsh_multiprobe...), oldest
# first; the ~48 r6-row and ~45 r7-row entries can wait.
# Update the EXPECTED_R{N}_WINDOW list in test_sql_api.py in the same
# commit as any window change.
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # ---- literal order = REGISTRATION history. Since r8 the driver
    # window is applied by the _R8_WINDOW_FRONT reorder after this
    # dict; the section comments below record each round's additions.
    # ---- ROUND-7 DRIVER WINDOW (was first 50; pinned then by
    # tests/test_sql_api.py::EXPECTED_R7_WINDOW) ----
    # new this round (12): trained-index SemDeDup, exactly-once
    # recovery replay, late-data-drop replay, BMP + GIF + JPEG
    # real-decode rows, real pixel resize, bloom-prefiltered
    # incremental dedup, Z-order layout profile, CMS frequency
    # sketch, stream-static enrichment replay, production-shape IVF
    "semantic_dedup_trained": q_semantic_dedup_trained,
    "recovery_stream_replay": q_recovery_stream_replay,
    "media_decode_bmp": q_media_decode_bmp,
    "media_decode_gif": q_media_decode_gif,
    "media_decode_jpeg": q_media_decode_jpeg,
    "media_resize": q_media_resize,
    "incremental_dedup_bloom": q_incremental_dedup_bloom,
    "zorder_profile": q_zorder_profile,
    "cms_frequencies": q_cms_frequencies,
    "enrich_stream_replay": q_enrich_stream_replay,
    "late_drop_stream_replay": q_late_drop_stream_replay,
    "knn_ivf_full_fixed": q_knn_ivf_full_fixed,
    # re-planned this round (2): knn_lsh_planes8 plants probe
    # twins (non-vacuous recall); exchange_influencers runs the
    # BINDING max_per_bucket=3 edge cap (last scale-killer closed)
    "knn_lsh_planes8": q_knn_lsh_planes8,
    "exchange_influencers": q_exchange_influencers,
    # the r4-stale evidence set rotates in (36 of 46; oldest rows in
    # the registry) — the ten yields are listed in the rotation note
    # above with their pinning evidence
    "trading_sessions": q_trading_sessions,
    "session_range_join": q_session_range_join,
    "market_cap_chart": q_market_cap_chart,
    "knn_ivf_trained": q_knn_ivf_trained,
    "volume_cube": q_volume_cube,
    "exchange_cardinality_approx": q_exchange_cardinality_approx,
    "atr_14": q_atr_14,
    "price_chart": q_price_chart,
    "indicator_chart": q_indicator_chart,
    "coin_display": q_coin_display,
    "quality_score": q_quality_score,
    "token_counts": q_token_counts,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "bigram_logprob": q_bigram_logprob,
    "doc_length_quantiles": q_doc_length_quantiles,
    "top_terms": q_top_terms,
    "redact_pii": q_redact_pii,
    "dataset_split": q_dataset_split,
    "deterministic_sample": q_deterministic_sample,
    "stratified_sample": q_stratified_sample,
    "pack_chunks": q_pack_chunks,
    "media_metadata": q_media_metadata,
    "frame_schedule": q_frame_schedule,
    "coins_dim": q_coins,
    "price_data": q_price_data,
    "ohlc_candles": q_ohlc,
    "technical_indicators": q_indicators,
    "coin_market_cap": q_market_cap,
    "coin_table": q_coin_table,
    "envelope_price": q_envelope_price,
    "envelope_coins": q_envelope_coins,
    "envelope_ohlc": q_envelope_ohlc,
    "coin_indicators_left": q_coin_indicators_left,
    "volume_rollup": q_volume_rollup,
    "text_stats": q_text_stats,
    # ---- end of driver correctness window (50 entries above) ----
    # Tail: driver-green in r4/r5/r6 under the current fixtures and
    # unchanged this round; still pinned at sf0.001 every session by
    # tests/test_oracle_parity.py. Ordered: r6-row members first,
    # then r5-row, then the ten yielded r4-row entries
    # (envelope_mcap, ohlc_chart, vwap_hourly, close_pivot,
    # documents_profile,
    # cross_exchange_spread + rolling_beta/stochastic/donchian/
    # ichimoku — computations pinned elsewhere: ohlc_candles +
    # price_chart cover ohlc_chart, vwap_stream_replay shares
    # vwap_hourly's exact oracle SQL, volume_grouping_sets pins the
    # Expand/conditional-agg family, corpus_quality_report,
    # spread_stream_replay, atr_14 and technical_indicators cover
    # the rest) — they front-load the r8 rotation together with
    # anything r8 re-plans.
    "simhash_pairs_wide": q_simhash_pairs_wide,
    "knn_ivf_fixed": q_knn_ivf_fixed,
    "media_decode_png": q_media_decode_png,
    "salted_join_skew": q_salted_join_skew,
    "restfeed_stream_replay": q_restfeed_stream_replay,
    "plan_audit": q_plan_audit,
    "embedding_dup_wide": q_embedding_dup_wide,
    "semantic_dedup": q_semantic_dedup,
    "dedup_stream_replay": q_dedup_stream_replay,
    "coin_pagerank_capped": q_coin_pagerank_capped,
    "kmeans_centroids_fixed": q_kmeans_fixed,
    "incremental_dedup": q_incremental_dedup,
    "ohlc_daily_rollup": q_ohlc_daily_rollup,
    "event_bigrams": q_event_bigrams,
    "restfeed_ohlc": q_restfeed_ohlc,
    "orc_roundtrip": q_orc_roundtrip,
    "spread_stream_replay": q_spread_stream_replay,
    "exact_dedup": q_exact_dedup,
    "dedup_survivors": q_dedup_survivors,
    "ngram_jaccard_pairs": q_ngram_jaccard,
    "dup_clusters": q_dup_clusters,
    "minhash_lsh_pairs": q_minhash_lsh,
    "simhash_pairs": q_simhash_pairs,
    "pack_chunks_overlap": q_pack_chunks_overlap,
    "contamination": q_contamination,
    "curation_pipeline": q_curation_pipeline,
    "repetition_stats": q_repetition_stats,
    "tfidf_top_terms": q_tfidf_top_terms,
    "doc_length_quantiles_approx": q_doc_length_quantiles_approx,
    "exchange_cardinality": q_exchange_cardinality,
    "knn_lsh": q_knn_lsh,
    "knn_brute": q_knn_brute,
    "knn_ivf": q_knn_ivf,
    "kmeans_centroids": q_kmeans_centroids,
    "knn_quantized": q_knn_quantized,
    "embedding_normalize": q_embedding_normalize,
    "embedding_quantize": q_embedding_quantize,
    "embedding_dup_pairs": q_embedding_dup,
    "media_frames": q_media_frames,
    "media_features": q_media_features,
    "stale_coins_anti": q_stale_coins_anti,
    "top_coins_by_volume": q_top_coins_by_volume,
    "union_price_feeds": q_union_price_feeds,
    "asof_price_candle": q_asof_price_candle,
    "top_suppliers": q_top_suppliers,
    "user_retention": q_user_retention,
    "price_correlation": q_price_correlation,
    "event_props_stats": q_event_props_stats,
    "revenue_by_nation": q_revenue_by_nation,
    "keltner_channels": q_keltner_channels,
    "candlestick_patterns": q_candlestick_patterns,
    "vocab_coverage": q_vocab_coverage,
    "scd2_volume_tiers": q_scd2_volume_tiers,
    "knn_ivf_pq": q_knn_ivf_pq,
    "csv_roundtrip": q_csv_roundtrip,
    "heikin_ashi": q_heikin_ashi,
    "funnel_conversion": q_funnel_conversion,
    "lead_lag_corr": q_lead_lag_corr,
    "rolling_sharpe": q_rolling_sharpe,
    "market_regime": q_market_regime,
    "corpus_quality_report": q_corpus_quality_report,
    "pricing_summary": q_pricing_summary,
    "rolling_active_coins": q_rolling_active_coins,
    "event_props_variant": q_event_props_variant,
    "activity_reconciliation": q_activity_reconciliation,
    "shipping_priority": q_shipping_priority,
    "knn_ivf_pq_recall": q_knn_ivf_pq_recall,
    "exchange_hll_rollup": q_exchange_hll_rollup,
    "ohlc_stream_replay": q_ohlc_stream_replay,
    "dup_rate_by_source": q_dup_rate_by_source,
    "coin_volume_percentile": q_coin_volume_percentile,
    "volume_grouping_sets": q_volume_grouping_sets,
    "knn_recall": q_knn_recall,
    "url_dedup": q_url_dedup,
    "media_decode_ppm": q_media_decode_ppm,
    "vwap_stream_replay": q_vwap_stream_replay,
    "span_dedup": q_span_dedup,
    "gopher_rules": q_gopher_rules,
    "media_decode_wav": q_media_decode_wav,
    "mixture_sample": q_mixture_sample,
    "knn_pq": q_knn_pq,
    "curation_pipeline_v2": q_curation_pipeline_v2,
    "price_resample_1h": q_price_resample_1h,
    "knn_pq_recall": q_knn_pq_recall,
    "session_stream_replay": q_session_stream_replay,
    "coin_pagerank": q_coin_pagerank,
    "price_anomalies": q_price_anomalies,
    "forecast_backtest": q_forecast_backtest,
    "bpe_merges": q_bpe_merges,
    "jsonl_roundtrip": q_jsonl_roundtrip,
    "volume_profile": q_volume_profile,
    "bollinger_bands": q_bollinger_bands,
    "max_drawdown": q_max_drawdown,
    "obv": q_obv,
    "knn_brute_vectorized": q_knn_brute_vectorized,
    "active_coins_semi": q_active_coins_semi,
    "momentum_ranks": q_momentum_ranks,
    "knn_lsh_multiprobe": q_knn_lsh_multiprobe,
    "envelope_mcap": q_envelope_mcap,
    "ohlc_chart": q_ohlc_chart,
    "vwap_hourly": q_vwap_hourly,
    "close_pivot": q_close_pivot,
    "documents_profile": q_documents_profile,
    "cross_exchange_spread": q_cross_exchange_spread,
    "rolling_beta": q_rolling_beta,
    "stochastic": q_stochastic,
    "donchian": q_donchian,
    "ichimoku": q_ichimoku,
    # ---- appended mid-round-7 (out of the pinned 50-slot window;
    # r8 rotation candidates — front-load ALL SEVENTEEN of these in the
    # r8 window: retrieval (bm25/dsir/rrf), generic decode + real
    # frames + color JPEG, fuzzy linkage, distributed PCA + ABTT
    # residuals, log-round star CC, incremental IVF append, TPC-H Q18,
    # classifier-eval AUC, per-host crawl cap, quality-aware
    # survivorship, and the two new
    # streaming replay rows (custom-stateful drawdown, stream-stream
    # LEFT OUTER)) ----
    "bm25_scores": q_bm25_scores,
    "dsir_weights": q_dsir_weights,
    "dsir_sample": q_dsir_sample,
    "media_features_auto": q_media_features_auto,
    "media_frames_real": q_media_frames_real,
    "hybrid_retrieval_rrf": q_hybrid_retrieval_rrf,
    "fuzzy_match_blocked": q_fuzzy_match_blocked,
    "fuzzy_match_multipass": q_fuzzy_match_multipass,
    "pca_top_component": q_pca_top_component,
    "dup_clusters_star": q_dup_clusters_star,
    "drawdown_stream_replay": q_drawdown_stream_replay,
    "spread_outer_stream_replay": q_spread_outer_stream_replay,
    "pca_residual": q_pca_residual,
    "knn_ivf_append": q_knn_ivf_append,
    "media_decode_jpeg_color": q_media_decode_jpeg_color,
    "large_volume_customers": q_large_volume_customers,
    "quality_auc": q_quality_auc,
    "host_cap": q_host_cap,
    "quality_survivors": q_quality_survivors,
    # ---- round 8 registrations ----
    "media_frames_gif": q_media_frames_gif,
    "bpe_vocab_k": q_bpe_vocab_k,
    "plan_audit_skew": q_plan_audit_skew,
    "bpe_encode": q_bpe_encode,
    "bpe_pack": q_bpe_pack,
    "semantic_dedup_capped": q_semantic_dedup_capped,
    "repeated_spans_sliding": q_repeated_spans_sliding,
    # ---- round 9 registrations ----
    "media_frames_gif2": q_media_frames_gif2,
    "remove_repeated_spans": q_remove_repeated_spans,
    "remove_repeated_spans_keep_first": q_remove_repeated_spans_keep_first,
    "leakage_safe_split": q_leakage_safe_split,
    # ---- round 11 registrations ----
    "curation_pipeline_v3": q_curation_pipeline_v3,
}

# ---- ROUND-10 DRIVER WINDOW (applied below; pinned by
# tests/test_sql_api.py::EXPECTED_R10_WINDOW) ----
# The r9 window rationale (kept for history):
# The dict literal above preserves REGISTRATION history; the driver's
# 50-slot correctness window is applied by reordering here, per the
# r8 rotation note and the r8 verdict item #1: (a) the THREE r9
# registrations (media_frames_gif2 — GIF disposal-2/3 + transparency;
# remove_repeated_spans — the sliding-span cutter; leakage_safe_split
# — the near-dup-aware split) and the re-planned fuzzy_match_blocked
# (de-spilled block self-join, hash-unchanged — the fresh row
# re-verifies the re-plan); (b) the mid-r8 repeated_spans_sliding —
# the ONLY registered query that has never had a driver row; (c) ALL
# 31 remaining r5-row entries (the oldest evidence left; includes the
# teaching-form coin_pagerank — §7's no-front-load preference yields
# to the no-row-older-than-r6 done-criterion); (d) 14 oldest r6-row
# entries in registry order, skipping TEACHING_FORMS members
# (semantic_dedup, incremental_dedup — their twins are in or newer);
# spread_stream_replay and exact_dedup (r6 rows, safe to age one more
# round) yielded their (d) slots to the two mid-round (a)
# registrations. After the r9 driver run: zero never-checked
# registrations and no newest row older than r6.
# (The r8/r9 window lists live in git history / CORRECTNESS_r0{8,9}.json;
# PINNING.md tracks per-query evidence age.)
# ROUND-10 ROTATION (executed per the r9 guidance; list in git history
# / CORRECTNESS_r10.json): (a) bpe_pack, fuzzy_match_multipass,
# remove_repeated_spans_keep_first, dsir_sample, drawdown_stream_replay;
# (b) spread_stream_replay, exact_dedup; (c) the 24 remaining r6 rows;
# (d) the 19 oldest r7 rows (atr_14 / exchange_cardinality_approx
# yielded to the mid-round registrations).
# ROUND-11 ROTATION (executed per the r10 guidance block above):
_R11_WINDOW_FRONT = [
    # (a) new or re-planned this round: curation_pipeline_v3 (r11
    # registration — the end-to-end pretraining composition, never
    # driver-checked), fuzzy_match_multipass (re-planned: third
    # sorted-token pass + reorder twin family + max_dist=4 + right()
    # suffix key — output changed), dsir_sample (re-planned: 2^32-level
    # Gumbel noise per ADVICE r10 — output changed)
    "curation_pipeline_v3",
    "fuzzy_match_multipass",
    "dsir_sample",
    # (b) the full r7-row cohort (31 entries, registry order — incl.
    # atr_14 and exchange_cardinality_approx which yielded their r10
    # slots)
    "exchange_cardinality_approx",
    "atr_14",
    "price_chart",
    "indicator_chart",
    "coin_display",
    "quality_score",
    "token_counts",
    "lang_id",
    "doc_fingerprint",
    "bigram_logprob",
    "doc_length_quantiles",
    "top_terms",
    "redact_pii",
    "dataset_split",
    "deterministic_sample",
    "stratified_sample",
    "pack_chunks",
    "media_metadata",
    "frame_schedule",
    "coins_dim",
    "price_data",
    "ohlc_candles",
    "technical_indicators",
    "coin_market_cap",
    "coin_table",
    "envelope_price",
    "envelope_coins",
    "envelope_ohlc",
    "coin_indicators_left",
    "volume_rollup",
    "text_stats",
    # (c) the 16 oldest r8-row entries, registry order
    "keltner_channels",
    "candlestick_patterns",
    "vocab_coverage",
    "scd2_volume_tiers",
    "knn_ivf_pq",
    "csv_roundtrip",
    "heikin_ashi",
    "funnel_conversion",
    "lead_lag_corr",
    "rolling_sharpe",
    "market_regime",
    "corpus_quality_report",
    "pricing_summary",
    "rolling_active_coins",
    "event_props_variant",
    "activity_reconciliation",
]
assert len(_R11_WINDOW_FRONT) == 50 and len(set(_R11_WINDOW_FRONT)) == 50
assert set(_R11_WINDOW_FRONT) <= set(QUERIES), sorted(
    set(_R11_WINDOW_FRONT) - set(QUERIES)
)
QUERIES = {
    k: QUERIES[k]
    for k in _R11_WINDOW_FRONT + [k for k in QUERIES if k not in _R11_WINDOW_FRONT]
}

# shared by incremental_dedup AND incremental_dedup_bloom: the bloom
# prefilter is result-identical to the exact form by construction
INCREMENTAL_DEDUP_SQL = f"""
WITH seen AS (
  SELECT DISTINCT md5({NORM_TEXT_SQL}) AS fp
  FROM documents WHERE doc_id % 2 = 0
),
newdocs AS (
  SELECT doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + 10000000, text, lang, source, n_chars
  FROM documents WHERE doc_id % 2 = 0 AND doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 20000000, text, lang, source, n_chars
  FROM documents WHERE doc_id % 10 = 1
),
tagged AS (
  SELECT *, md5({NORM_TEXT_SQL}) AS fp FROM newdocs
),
within AS (SELECT fp, min(doc_id) AS doc_id FROM tagged GROUP BY fp),
survivors AS (
  SELECT w.fp, w.doc_id FROM within w
  WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.fp = w.fp)
)
SELECT t.doc_id, t.fp, t.text, t.lang, t.source, t.n_chars
FROM survivors v JOIN tagged t ON t.fp = v.fp AND t.doc_id = v.doc_id"""

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

# ---------------------------------------------------------------------------
# Shared sliding-span oracle fragments (code-review r10): the sweep and
# BOTH cutters compose these structurally — a fix to the window build,
# the range collapse, or the positional cut/reassembly lands in exactly
# one place (the _bpe_parts / _minhash_lsh_parts posture).
# ---------------------------------------------------------------------------
SLIDING_WINS_CTES = r"""toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> '') AS ws
  FROM documents
),
full_docs AS (SELECT doc_id, ws, len(ws) AS n FROM toks WHERE len(ws) >= 8),
wins AS (
  SELECT doc_id, s AS start, array_to_string(ws[s+1 : s+8], ' ') AS span_text
  FROM (SELECT doc_id, ws, n, unnest(generate_series(0, n - 8)) AS s FROM full_docs)
)"""

# gaps-and-islands collapse of a `hits(doc_id, start)` CTE into maximal
# ranges `ranges(doc_id, rs, rl)`
SPAN_RANGES_CTES = r"""grouped AS (
  SELECT doc_id, start,
         start - row_number() OVER (PARTITION BY doc_id ORDER BY start) AS grp
  FROM hits
),
ranges AS (
  SELECT doc_id, min(start) AS rs, max(start) - min(start) + 8 AS rl
  FROM grouped GROUP BY doc_id, grp
)"""

# positional cut of `ranges` out of `toks` + in-position reassembly
# (DuckDB string_agg ORDER BY pos == Spark array_sort(struct(pos, w)))
SPAN_CUT_TAIL_SQL = r"""wordpos AS (
  SELECT doc_id, ws[i] AS w, i - 1 AS pos
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM toks)
),
kept AS (
  SELECT wp.doc_id, wp.pos, wp.w FROM wordpos wp
  WHERE NOT EXISTS (
    SELECT 1 FROM ranges r
    WHERE r.doc_id = wp.doc_id AND wp.pos >= r.rs AND wp.pos < r.rs + r.rl)
),
agg AS (
  SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS clean_text,
         count(*) AS n_words_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, coalesce(a.clean_text, '') AS clean_text,
       coalesce(a.n_words_kept, 0)::BIGINT AS n_words_kept,
       (len(t.ws) - coalesce(a.n_words_kept, 0))::BIGINT AS n_words_removed
FROM toks t LEFT JOIN agg a USING (doc_id)"""

# DSIR scored-weights CTE chain (shared by dsir_weights and the
# Gumbel top-k resampler dsir_sample — the parts posture)
def _dsir_scored_parts(source: str = "documents") -> str:
    """The DSIR hashed-unigram scoring chain (toks..scored) WITHOUT the
    WITH prefix, parameterized on the corpus source so composed oracles
    ([[_curation_v3_sql]]) can score an upstream CTE; the module-level
    ``DSIR_SCORED_CTES`` below keeps the rendered default
    byte-identical."""
    return rf"""toks AS (
  SELECT doc_id, lang = 'en' AS tgt,
         list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> '') AS ws
  FROM {source}
),
d AS (SELECT doc_id, tgt, ws FROM toks WHERE len(ws) > 0),
occ AS (
  SELECT doc_id, tgt,
         (('0x' || substr(md5('dsir' || w), 1, 8))::UBIGINT % 256)::BIGINT AS b
  FROM (SELECT doc_id, tgt, unnest(ws) AS w FROM d)
),
counted AS (
  SELECT doc_id, b,
         count(*) OVER (PARTITION BY b) AS n_raw,
         sum(CASE WHEN tgt THEN 1 ELSE 0 END) OVER (PARTITION BY b) AS n_tgt
  FROM occ
),
totals AS (
  SELECT count(*) AS t_raw, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS t_tgt FROM occ
),
scored AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens,
         round(sum(ln((n_tgt + 1) / (t_tgt + 256))
                   - ln((n_raw + 1) / (t_raw + 256))), 6) AS log_weight
  FROM counted, totals
  GROUP BY doc_id
)"""


DSIR_SCORED_CTES = "\nWITH " + _dsir_scored_parts()


def _materialize_ctes(sql: str, names: tuple[str, ...]) -> str:
    """Mark the named CTEs ``AS MATERIALIZED`` (DuckDB): a composed
    oracle like [[_curation_v3_sql]] references its stage outputs many
    times (sig 16x in the band union, sh 4x, the survivor corpus from
    split + contamination + resample), and DuckDB 1.0 inlines CTE
    bodies per reference — the COMPOSED tree then multiplies out to
    thousands of leaf parquet scans and dies on file handles.
    Materializing each stage boundary pins the oracle to the same
    evaluate-once semantics the engine's persist() boundaries use.
    Anchored on the unique '\\n<name> AS (' definition site; asserts
    exactly one match so a parts edit cannot silently de-materialize a
    stage."""
    for n in names:
        anchor = f"\n{n} AS ("
        assert sql.count(anchor) == 1, f"CTE anchor not unique: {n}"
        sql = sql.replace(anchor, f"\n{n} AS MATERIALIZED (", 1)
    return sql


def _curation_v3_sql(k: int = 200, rounds: int = 3, budget: int = 512) -> str:
    """Oracle for [[q_curation_pipeline_v3]] — the end-to-end
    pretraining pipeline composed from the SAME generated parts as the
    per-stage oracles, each re-pointed at its upstream CTE: quality
    gate (the curation_pipeline qw/q pair) -> [[_minhash_lsh_parts]]
    over ``q`` -> recursive star-CC (the leakage_safe_split pattern)
    -> canonical-survivor filter -> md5-bucket split -> capped-shingle
    decontamination (reusing the minhash ``sh`` shingles, restricted
    to survivors) -> [[_dsir_scored_parts]] over ``train_clean`` +
    the wide-hash Gumbel top-{k} -> [[_bpe_encode_ctes]] trained and
    encoded over ``selected`` -> the pack cumsum tail. Every stage is
    bit-exact vs the engine (established per stage by the
    leakage_safe_split / contamination / dsir_sample / bpe_pack
    driver rows)."""
    mh_ctes, mh_select = _minhash_lsh_parts(source="q")
    assert mh_ctes.startswith("WITH ")
    mh_ctes = mh_ctes[len("WITH ") :]
    sql = f"""
WITH RECURSIVE qw AS (
  SELECT doc_id, text, lang, source, {WORDS_SQL} AS ws FROM documents
),
q AS (
  SELECT doc_id, text, lang, source FROM (
    SELECT doc_id, text, lang, source,
      (CASE WHEN len(ws) BETWEEN 20 AND 2000 THEN 0.4 ELSE 0.0 END
       + CASE WHEN len(ws) > 0 AND
                   list_sum(list_transform(ws, x -> length(x)))::DOUBLE / len(ws)
                     BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END
       + CASE WHEN len(ws) > 0 AND
                   len(list_filter(ws, x -> x IN {STOPWORDS_SQL}))::DOUBLE / len(ws)
                     >= 0.05 THEN 0.3 ELSE 0.0 END) AS quality
    FROM qw
  ) WHERE quality >= 0.7
),
{mh_ctes},
pairs AS (
{mh_select}
),
edges AS (
  SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
  UNION ALL
  SELECT doc_id_b AS a, doc_id_a AS b FROM pairs
),
reach(node, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r
),
comp AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
surv AS (
  SELECT q.doc_id, q.text, q.lang, q.source
  FROM q LEFT JOIN comp ON q.doc_id = comp.doc_id
  WHERE comp.cluster_id IS NULL OR comp.cluster_id = q.doc_id
),
spl AS (
  SELECT doc_id,
         CASE WHEN CAST(('0x' || substring(md5('split' || doc_id::VARCHAR), 1, 8))
                        AS BIGINT) % 10000 < 8000 THEN 'train'
              WHEN CAST(('0x' || substring(md5('split' || doc_id::VARCHAR), 1, 8))
                        AS BIGINT) % 10000 < 9000 THEN 'val'
              ELSE 'test' END AS split
  FROM surv
),
cpost AS (SELECT sh.doc_id, unnest(sh.shingles) AS sg
          FROM sh JOIN surv ON sh.doc_id = surv.doc_id),
csp AS (SELECT cpost.doc_id, cpost.sg, spl.split
        FROM cpost JOIN spl ON cpost.doc_id = spl.doc_id),
ckept AS (SELECT sg FROM csp GROUP BY sg HAVING count(*) <= 100),
cfp AS (SELECT csp.doc_id, csp.sg, csp.split FROM csp JOIN ckept USING (sg)),
ctr AS (SELECT doc_id, sg FROM cfp WHERE split = 'train'),
ctst AS (SELECT doc_id AS tdoc, sg FROM cfp WHERE split = 'test'),
csizes AS (SELECT doc_id, count(*) AS n_sh FROM ctr GROUP BY doc_id),
chits AS (
  SELECT ctr.doc_id, count(DISTINCT ctr.sg) AS n_hit
  FROM ctr JOIN ctst USING (sg) GROUP BY ctr.doc_id
),
contaminated AS (
  SELECT chits.doc_id FROM chits JOIN csizes USING (doc_id)
  WHERE n_hit::DOUBLE / n_sh >= 0.5
),
train_clean AS (
  SELECT surv.* FROM surv JOIN spl ON surv.doc_id = spl.doc_id
  WHERE spl.split = 'train'
    AND surv.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
{_dsir_scored_parts("train_clean")},
g AS (
  SELECT doc_id,
         round(log_weight
               + -ln(-ln((('0x' || substr(md5('gumbel' || doc_id::VARCHAR), 1, 8))::BIGINT
                          + 0.5) / 4294967296)), 6) AS gumbel_key
  FROM scored
),
sel AS (SELECT doc_id FROM g ORDER BY gumbel_key DESC, doc_id LIMIT {k}),
selected AS (
  SELECT train_clean.doc_id, train_clean.text, train_clean.source
  FROM train_clean JOIN sel ON train_clean.doc_id = sel.doc_id
),
{_bpe_encode_ctes(rounds, source="selected", with_prefix="")},
pt AS (
  SELECT sd.doc_id, sd.source,
         coalesce(e.n_tokens_bpe, 0)::BIGINT AS n_tokens_bpe
  FROM selected sd LEFT JOIN enc e ON sd.doc_id = e.doc_id
),
pc AS (
  SELECT *, sum(n_tokens_bpe) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING)::BIGINT AS end_tokens
  FROM pt
)
SELECT doc_id, source, n_tokens_bpe,
       (CASE WHEN n_tokens_bpe > 0
             THEN (end_tokens - n_tokens_bpe) // {budget} END)::BIGINT AS first_chunk,
       (CASE WHEN n_tokens_bpe > 0 THEN (end_tokens - 1) // {budget} END)::BIGINT AS last_chunk,
       (CASE WHEN n_tokens_bpe > 0
             THEN (end_tokens - 1) // {budget} - (end_tokens - n_tokens_bpe) // {budget} + 1
             ELSE 0 END)::BIGINT AS n_chunks
FROM pc"""
    return _materialize_ctes(
        sql,
        (
            "q",
            "sh",
            "sig",
            "cand",
            "surv",
            "spl",
            "train_clean",
            "scored",
            "selected",
            "enc",
        ),
    )


ORACLES: dict[str, str] = {
    "coins_dim": _with(COINS_CTE, select="SELECT id, name, symbol, exchange FROM coins"),
    "price_data": _with(
        PRICE_DATA_CTE,
        select="SELECT coin_id, exchange, timestamp, price, volume,"
        " change_1h, change_1d, change_1w, change_1m FROM price_data",
    ),
    "ohlc_candles": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="SELECT coin_id, exchange, timestamp, open, high, low, close FROM ohlc_data",
    ),
    "technical_indicators": _with(
        PRICE_DATA_CTE, INDICATORS_CTE,
        select="SELECT coin_id, exchange, timestamp, sma_20, ema_20, rsi_14, macd"
        " FROM technical_indicators",
    ),
    "coin_market_cap": _with(
        PRICE_DATA_CTE,
        select="""
  SELECT 'C' || CAST(u AS VARCHAR) AS coin_symbol,
         (SELECT max(timestamp) FROM price_data) AS timestamp,
         100.0 * symbol_volume / sum(symbol_volume) OVER () AS market_cap_percentage
  FROM (SELECT regexp_extract(coin_id, '_C([0-9]+)$', 1) AS u,
               sum(volume) AS symbol_volume
        FROM price_data GROUP BY 1)""",
    ),
    "market_cap_chart": _with(
        PRICE_DATA_CTE,
        select="""
  SELECT 'C' || CAST(u AS VARCHAR) AS coin_symbol,
         (SELECT max(timestamp) FROM price_data) AS timestamp,
         100.0 * symbol_volume / sum(symbol_volume) OVER () AS market_cap_percentage
  FROM (SELECT regexp_extract(coin_id, '_C([0-9]+)$', 1) AS u,
               sum(volume) AS symbol_volume
        FROM price_data GROUP BY 1)""",
    ),
    "price_chart": _with(
        PRICE_DATA_CTE,
        select="""
  SELECT exchange, timestamp, price, volume
  FROM price_data
  WHERE ends_with(coin_id, '_C7')
    AND timestamp > (SELECT max(timestamp) FROM price_data
                     WHERE ends_with(coin_id, '_C7')) - INTERVAL 168 HOURS""",
    ),
    "ohlc_chart": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
  SELECT exchange, timestamp, open, high, low, close
  FROM ohlc_data
  WHERE ends_with(coin_id, '_C7')
    AND timestamp > (SELECT max(timestamp) FROM ohlc_data
                     WHERE ends_with(coin_id, '_C7')) - INTERVAL 168 HOURS""",
    ),
    "indicator_chart": _with(
        PRICE_DATA_CTE, INDICATORS_CTE,
        select="""
  SELECT coin_id, exchange, timestamp, sma_20, ema_20, rsi_14, macd
  FROM technical_indicators
  WHERE ends_with(coin_id, '_C7')
  ORDER BY timestamp, exchange
  LIMIT 200""",
    ),
    "coin_table": _with(
        PRICE_DATA_CTE, COINS_CTE, OHLC_CTE, INDICATORS_CTE, LATEST_CTES,
        select="""
  SELECT c.id, c.name, c.symbol, c.exchange, p.price_ts, p.price, p.volume,
         o.open, o.high, o.low, o.close, i.sma_20, i.ema_20, i.rsi_14, i.macd
  FROM coins c
  JOIN latest_price p ON p.coin_id = c.id AND p.exchange = c.exchange
  JOIN latest_ohlc  o ON o.coin_id = c.id AND o.exchange = c.exchange
  JOIN latest_ind   i ON i.coin_id = c.id AND i.exchange = c.exchange""",
    ),
    "coin_display": _with(
        COINS_CTE,
        select="""
SELECT id,
       upper(exchange[1]) || lower(exchange[2:]) AS exchange_display,
       array_to_string(list_transform(
         string_split(exchange || ' coin ' || symbol, ' '),
         w -> upper(w[1]) || lower(w[2:])), ' ') AS title
FROM coins""",
    ),
    "text_stats": TEXT_STATS_SQL,
    "quality_score": f"""
WITH s AS ({TEXT_STATS_SQL})
SELECT doc_id, n_words,
       (CASE WHEN n_words BETWEEN 20 AND 2000 THEN 0.4 ELSE 0.0 END
        + CASE WHEN avg_word_len BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END
        + CASE WHEN stopword_ratio >= 0.05 THEN 0.3 ELSE 0.0 END) AS quality,
       (CASE WHEN n_words BETWEEN 20 AND 2000 THEN 0.4 ELSE 0.0 END
        + CASE WHEN avg_word_len BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END
        + CASE WHEN stopword_ratio >= 0.05 THEN 0.3 ELSE 0.0 END) >= 0.7 AS is_quality
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
WITH docs AS (
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
)
SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       round(avg(ln(n2::DOUBLE / n1)), 7) AS avg_logprob
FROM c GROUP BY doc_id""",
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
    "contamination": f"""
WITH {SHINGLES_CTE},
post AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
sp AS (
  SELECT doc_id, s,
         CASE WHEN bucket < 8000 THEN 'train'
              WHEN bucket < 9000 THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT doc_id, s,
           CAST(('0x' || substring(md5('split' || doc_id::VARCHAR), 1, 8))
                AS BIGINT) % 10000 AS bucket
    FROM post
  )
),
kept AS (SELECT s FROM sp GROUP BY s HAVING count(*) <= 100),
fp AS (SELECT sp.doc_id, sp.s, sp.split FROM sp JOIN kept USING (s)),
train AS (SELECT doc_id, s FROM fp WHERE split = 'train'),
test AS (SELECT doc_id AS test_doc_id, s FROM fp WHERE split = 'test'),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_shingles FROM train GROUP BY doc_id),
hits AS (
  SELECT doc_id,
         count(DISTINCT s)::BIGINT AS n_hit_shingles,
         count(DISTINCT test_doc_id)::BIGINT AS n_test_docs
  FROM train JOIN test USING (s) GROUP BY doc_id
)
SELECT doc_id, n_hit_shingles, n_test_docs, n_shingles,
       n_hit_shingles::DOUBLE / n_shingles AS contamination_ratio
FROM hits JOIN sizes USING (doc_id)""",
    "curation_pipeline": f"""
WITH qw AS (
  SELECT doc_id, text, lang, {WORDS_SQL} AS ws FROM documents
),
q AS (
  SELECT doc_id, text, lang FROM (
    SELECT doc_id, text, lang,
      (CASE WHEN len(ws) BETWEEN 20 AND 2000 THEN 0.4 ELSE 0.0 END
       + CASE WHEN len(ws) > 0 AND
                   list_sum(list_transform(ws, x -> length(x)))::DOUBLE / len(ws)
                     BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END
       + CASE WHEN len(ws) > 0 AND
                   len(list_filter(ws, x -> x IN {STOPWORDS_SQL}))::DOUBLE / len(ws)
                     >= 0.05 THEN 0.3 ELSE 0.0 END) AS quality
    FROM qw
  ) WHERE quality >= 0.7
),
d AS (
  SELECT doc_id, text, lang FROM (
    SELECT *, row_number() OVER (
      PARTITION BY md5({NORM_TEXT_SQL}) ORDER BY doc_id
    ) AS rn FROM q
  ) WHERE rn = 1
),
sp AS (
  SELECT doc_id, text, lang,
         CASE WHEN CAST(('0x' || substring(md5('split' || doc_id::VARCHAR), 1, 8))
                        AS BIGINT) % 10000 < 8000 THEN 'train'
              WHEN CAST(('0x' || substring(md5('split' || doc_id::VARCHAR), 1, 8))
                        AS BIGINT) % 10000 < 9000 THEN 'val'
              ELSE 'test' END AS split
  FROM d
),
dws AS (SELECT doc_id, {WORDS_SQL} AS ws FROM d),
dsh AS (
  SELECT doc_id,
         list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                        for i in range(1, len(ws) - 1)]) AS shingles
  FROM dws WHERE len(ws) >= 3
),
post AS (SELECT doc_id, unnest(shingles) AS sg FROM dsh),
spp AS (
  SELECT post.doc_id, post.sg, sp.split
  FROM post JOIN sp ON post.doc_id = sp.doc_id
),
kept AS (SELECT sg FROM spp GROUP BY sg HAVING count(*) <= 100),
fpp AS (SELECT spp.doc_id, spp.sg, spp.split FROM spp JOIN kept USING (sg)),
tr AS (SELECT doc_id, sg FROM fpp WHERE split = 'train'),
te AS (SELECT doc_id AS tdoc, sg FROM fpp WHERE split = 'test'),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM tr GROUP BY doc_id),
hits AS (
  SELECT tr.doc_id, count(DISTINCT tr.sg) AS n_hit
  FROM tr JOIN te USING (sg) GROUP BY tr.doc_id
),
contaminated AS (
  SELECT hits.doc_id FROM hits JOIN sizes USING (doc_id)
  WHERE n_hit::DOUBLE / n_sh >= 0.5
),
clean AS (
  SELECT * FROM sp
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
)
SELECT split, lang, count(*)::BIGINT AS n_docs,
       sum(len(regexp_extract_all(lower(text),
               '[a-z]+|[0-9]+|[^a-z0-9\\s]')))::BIGINT AS n_tokens
FROM clean GROUP BY split, lang""",
    "dataset_split": """
WITH b AS (
  SELECT lang,
         CAST(('0x' || substring(md5('split' || doc_id::VARCHAR), 1, 8)) AS BIGINT)
           % 10000 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val'
            ELSE 'test' END AS split,
       lang, count(*)::BIGINT AS n_docs
FROM b GROUP BY 1, 2""",
    "deterministic_sample": """
SELECT doc_id, lang, n_chars FROM documents
WHERE CAST(('0x' || substring(md5('sample' || doc_id::VARCHAR), 1, 8)) AS BIGINT)
      % 10000 < 1000""",
    "stratified_sample": f"""
SELECT doc_id, lang, source FROM documents
WHERE CAST(('0x' || substring(md5('strat' || doc_id::VARCHAR), 1, 8)) AS BIGINT)
      % 10000 < {_strata_case_sql()}""",
    "pack_chunks": f"""
WITH t AS (
  SELECT doc_id, source,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))::BIGINT AS n_tokens
  FROM documents),
c AS (
  -- ::BIGINT: DuckDB's sum() over BIGINT widens to HUGEINT, which
  -- pandas would surface as float64 and break the int-dtype hash
  SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING)::BIGINT AS end_tokens
  FROM t)
SELECT doc_id, source, n_tokens,
       (CASE WHEN n_tokens > 0 THEN (end_tokens - n_tokens) // {PACK_BUDGET} END)::BIGINT AS first_chunk,
       (CASE WHEN n_tokens > 0 THEN (end_tokens - 1) // {PACK_BUDGET} END)::BIGINT AS last_chunk,
       (CASE WHEN n_tokens > 0
             THEN (end_tokens - 1) // {PACK_BUDGET} - (end_tokens - n_tokens) // {PACK_BUDGET} + 1
             ELSE 0 END)::BIGINT AS n_chunks
FROM c""",
    "pack_chunks_overlap": f"""
WITH t AS (
  SELECT doc_id, source,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))::BIGINT AS n_tokens
  FROM documents),
c AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING)::BIGINT AS end_tokens
  FROM t),
b AS (
  -- floor() over DOUBLE division: the first-chunk numerator can go
  -- negative, where integer // would have engine-specific semantics
  SELECT doc_id, source, n_tokens, end_tokens,
         greatest(0, CAST(floor((end_tokens - n_tokens - {PACK_BUDGET})::DOUBLE
                                / {PACK_STRIDE}) AS BIGINT) + 1) AS first_c,
         CAST(floor((end_tokens - 1)::DOUBLE / {PACK_STRIDE}) AS BIGINT) AS last_c
  FROM c)
SELECT doc_id, source, n_tokens,
       (CASE WHEN n_tokens > 0 THEN first_c END)::BIGINT AS first_chunk,
       (CASE WHEN n_tokens > 0 THEN last_c END)::BIGINT AS last_chunk,
       (CASE WHEN n_tokens > 0 THEN last_c - first_c + 1 ELSE 0 END)::BIGINT AS n_chunks
FROM b""",
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
    "exchange_cardinality": f"""
SELECT exchange, count(DISTINCT coin_id)::BIGINT AS n_coins,
       count(*)::BIGINT AS n_ticks
FROM ({PRICE_BASE_SQL}) p GROUP BY exchange""",
    # The oracle asserts the HLL accuracy CONTRACT (bound literally
    # TRUE), not the engine-specific estimate — see q_exchange_
    # cardinality_approx. A sketch drifting past 5% breaks hash equality.
    "exchange_cardinality_approx": f"""
SELECT exchange, count(DISTINCT coin_id)::BIGINT AS n_coins,
       count(*)::BIGINT AS n_ticks,
       TRUE AS approx_within_5pct
FROM ({PRICE_BASE_SQL}) p GROUP BY exchange""",
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
    "exact_dedup": f"""
SELECT md5({NORM_TEXT_SQL}) AS fingerprint,
       min(doc_id) AS keep_doc_id,
       count(*)::BIGINT AS n_docs
FROM documents GROUP BY 1""",
    "ngram_jaccard_pairs": f"""
WITH {CAPPED_PAIRS_CTES}
SELECT doc_id_a, doc_id_b, jaccard FROM pairs""",
    "dup_clusters": f"""
WITH RECURSIVE {CAPPED_PAIRS_CTES},
edges AS (
  SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
  UNION ALL
  SELECT doc_id_b AS a, doc_id_a AS b FROM pairs
),
reach(node, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r
)
SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node""",
    "dedup_survivors": f"""
WITH RECURSIVE {CAPPED_PAIRS_CTES},
edges AS (
  SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
  UNION ALL
  SELECT doc_id_b AS a, doc_id_a AS b FROM pairs
),
reach(node, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r
),
clusters AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node)
SELECT d.doc_id, d.lang,
       CASE WHEN c.cluster_id IS NOT NULL THEN 'canonical' ELSE 'unique' END AS kept_as
FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
WHERE c.cluster_id IS NULL OR c.cluster_id = d.doc_id""",
    "minhash_lsh_pairs": _minhash_lsh_sql(),
    "leakage_safe_split": _leakage_safe_split_sql(),
    # end-to-end pretraining pipeline (r11): composed from the same
    # generated stage parts, re-pointed at the upstream CTEs
    "curation_pipeline_v3": _curation_v3_sql(),
    "simhash_pairs": _simhash_sql(),
    # scale-safe width: 4x32-bit bands over md5's full 128 bits
    "simhash_pairs_wide": _simhash_sql(n_bits=128),
    # scale-safe width: 8-bit sign-LSH bands (52x -> 3.5x at 10x data);
    # exact twins planted so the hash covers non-empty candidate+verify
    "embedding_dup_wide": _embedding_dup_sql(
        n_planes=32,
        bands=4,
        base_sql=(
            "SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings"
            " UNION ALL SELECT vec_id + 1000000, embedding::DOUBLE[]"
            " FROM embeddings WHERE vec_id % 25 = 0"
        ),
    ),
    # SemDeDup replay: fixed-seed clustering -> within-cluster pairs
    # -> smallest-id dup_of; same planted twins as embedding_dup_wide
    "semantic_dedup": """
WITH raw AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding::DOUBLE[]
  FROM embeddings WHERE vec_id % 25 = 0
),
-- zero-norm guard: mirrors semantic_dedup's l2>0 filter exactly
base AS (
  SELECT vec_id, emb FROM raw WHERE sqrt(list_dot_product(emb, emb)) > 0
),
centroids AS (
  SELECT vec_id AS cent_id, emb AS cent_emb FROM base WHERE vec_id < 32
),
scored AS (
  SELECT vec_id, emb, cent_id,
         list_dot_product(emb, cent_emb)
         / (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(cent_emb, cent_emb))) AS cent_cos
  FROM base CROSS JOIN centroids
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cent_cos DESC, cent_id) AS crank
  FROM scored
),
assigned AS (SELECT vec_id, emb, cent_id FROM ranked WHERE crank = 1),
pairs AS (
  SELECT a.cent_id AS cluster_id, a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.emb, b.emb)
         / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) AS cosine
  FROM assigned a JOIN assigned b
    ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
),
dups AS (SELECT * FROM pairs WHERE cosine >= 0.9),
first_dup AS (
  SELECT *, row_number() OVER (PARTITION BY id_b ORDER BY id_a) AS rn
  FROM dups
)
SELECT id_b AS vec_id, cluster_id, id_a AS dup_of, cosine
FROM first_dup WHERE rn = 1""",
    # trained-index SemDeDup: the _kmeans_ctes chain (c2 = trained
    # centroids, dims rounded to the shared 1e-9 grid per round) feeds
    # the same assignment/pair/drop replay as semantic_dedup
    "semantic_dedup_trained": f"""
WITH {_kmeans_ctes("vec_id < 32")},
corpus_raw AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding::DOUBLE[]
  FROM embeddings WHERE vec_id % 25 = 0
),
corpus AS (
  SELECT vec_id, emb FROM corpus_raw
  WHERE sqrt(list_dot_product(emb, emb)) > 0
),
cents AS (SELECT cent_id, cent AS cent_emb FROM c2),
sd_scored AS (
  SELECT c.vec_id, c.emb, k.cent_id,
         list_dot_product(c.emb, k.cent_emb)
         / (sqrt(list_dot_product(c.emb, c.emb)) * sqrt(list_dot_product(k.cent_emb, k.cent_emb))) AS cent_cos
  FROM corpus c CROSS JOIN cents k
),
sd_ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cent_cos DESC, cent_id) AS crank
  FROM sd_scored
),
sd_assigned AS (SELECT vec_id, emb, cent_id FROM sd_ranked WHERE crank = 1),
sd_pairs AS (
  SELECT a.cent_id AS cluster_id, a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.emb, b.emb)
         / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) AS cosine
  FROM sd_assigned a JOIN sd_assigned b
    ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
),
sd_dups AS (SELECT * FROM sd_pairs WHERE cosine >= 0.9),
sd_first AS (
  SELECT *, row_number() OVER (PARTITION BY id_b ORDER BY id_a) AS rn
  FROM sd_dups
)
SELECT id_b AS vec_id, cluster_id, id_a AS dup_of, cosine
FROM sd_first WHERE rn = 1""",
    # capped SemDeDup: identical chain + the md5-priority top-12
    # member cap per cluster (the guard the r8 sf10 straggler
    # measurement motivated; 12 BINDS at sf0.01 where clusters
    # reach 25 — a non-binding cap would be vacuous, ADVICE r8)
    "semantic_dedup_capped": f"""
WITH {_kmeans_ctes("vec_id < 32")},
corpus_raw AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding::DOUBLE[]
  FROM embeddings WHERE vec_id % 25 = 0
),
corpus AS (
  SELECT vec_id, emb FROM corpus_raw
  WHERE sqrt(list_dot_product(emb, emb)) > 0
),
cents AS (SELECT cent_id, cent AS cent_emb FROM c2),
sd_scored AS (
  SELECT c.vec_id, c.emb, k.cent_id,
         list_dot_product(c.emb, k.cent_emb)
         / (sqrt(list_dot_product(c.emb, c.emb)) * sqrt(list_dot_product(k.cent_emb, k.cent_emb))) AS cent_cos
  FROM corpus c CROSS JOIN cents k
),
sd_ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cent_cos DESC, cent_id) AS crank
  FROM sd_scored
),
sd_assigned AS (SELECT vec_id, emb, cent_id FROM sd_ranked WHERE crank = 1),
sd_capped AS (
  SELECT vec_id, emb, cent_id FROM (
    SELECT *, row_number() OVER (PARTITION BY cent_id
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS crk
    FROM sd_assigned) WHERE crk <= 12
),
sd_pairs AS (
  SELECT a.cent_id AS cluster_id, a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.emb, b.emb)
         / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) AS cosine
  FROM sd_capped a JOIN sd_capped b
    ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
),
sd_dups AS (SELECT * FROM sd_pairs WHERE cosine >= 0.9),
sd_first AS (
  SELECT *, row_number() OVER (PARTITION BY id_b ORDER BY id_a) AS rn
  FROM sd_dups
)
SELECT id_b AS vec_id, cluster_id, id_a AS dup_of, cosine
FROM sd_first WHERE rn = 1""",
    "knn_brute": _knn_sql(bucketed=False),
    "kmeans_centroids": _kmeans_sql(),
    # scale-safe seed rule: fixed K=32 (the modulus rule makes
    # K = N/101, i.e. N^2 assignment — measured 53x at 10x data)
    "kmeans_centroids_fixed": _kmeans_sql("vec_id < 32"),
    "knn_quantized": """
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS raw FROM embeddings),
m AS (SELECT vec_id, raw,
             list_max(list_transform(raw, x -> abs(x))) AS mx FROM base),
q AS (
  SELECT vec_id,
         list_transform(raw,
           x -> CAST(floor(x * (127.0 / mx) + 0.5) AS BIGINT)) AS q
  FROM m WHERE mx > 0
),
sized AS (SELECT vec_id, q, list_dot_product(q, q) AS n FROM q),
probes AS (SELECT vec_id AS probe_id, q AS q_p, n AS np
           FROM sized WHERE vec_id % 50 = 0),
scored AS (
  SELECT probe_id, vec_id AS neighbor_id,
         list_dot_product(q, q_p)
           / (sqrt(n::DOUBLE) * sqrt(np::DOUBLE)) AS cosine_q8
  FROM sized CROSS JOIN probes WHERE vec_id <> probe_id
)
SELECT probe_id, neighbor_id, cosine_q8, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY cosine_q8 DESC, neighbor_id) AS rank
  FROM scored) WHERE rank <= 5""",
    "embedding_normalize": """
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS raw FROM embeddings),
n AS (SELECT vec_id, raw, sqrt(list_dot_product(raw, raw)) AS l2 FROM base)
SELECT vec_id, round(l2, 7) AS l2_norm,
       CASE WHEN l2 > 0 THEN md5(array_to_string(
         list_transform(raw, x -> CAST(floor(x / l2 * 1000000 + 0.5) AS BIGINT)),
         ',')) END AS emb_digest
FROM n""",
    "embedding_quantize": """
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS raw FROM embeddings),
m AS (SELECT vec_id, raw,
             list_max(list_transform(raw, x -> abs(x))) AS mx FROM base)
SELECT vec_id,
       CASE WHEN mx > 0 THEN round(127.0 / mx, 7) END AS scale,
       CASE WHEN mx > 0 THEN md5(array_to_string(
         list_transform(raw,
           x -> CAST(CAST(floor(x * (127.0 / mx) + 0.5) AS INTEGER) AS VARCHAR)),
         ',')) END AS q_digest
FROM m""",
    "knn_brute_vectorized": _knn_sql(bucketed=False, round_decimals=9),
    "knn_lsh": _knn_sql(bucketed=True),
    "knn_lsh_multiprobe": _knn_sql(bucketed=True, multiprobe=True),
    "knn_ivf": KNN_IVF_SQL,
    # scale-safe configurations (r5 verdict item #2): fixed-C coarse
    # index / 256-bucket LSH, each with its own exact oracle
    "knn_ivf_fixed": _knn_ivf_sql("vec_id < 32"),
    # fixed C AND fixed probes — the production shape; the fixture's
    # %50 probe rule (probe count ∝ N) stays on the other entries
    "knn_ivf_full_fixed": _knn_ivf_sql("vec_id < 32", "vec_id < 200"),
    "knn_lsh_planes8": _knn_sql(bucketed=True, n_planes=8, plant_shift=1_000_001),
    # recall@5 of each approximate index vs brute truth — floors must
    # stay in sync with similarity.knn_recall's defaults
    "knn_recall": f"""
WITH truth AS ({_knn_sql(bucketed=False)}),
lsh AS ({_knn_sql(bucketed=True)}),
lsh_mp AS ({_knn_sql(bucketed=True, multiprobe=True)}),
ivf AS ({KNN_IVF_SQL}),
t AS (SELECT count(*) AS n_truth FROM truth),
hits AS (
  SELECT 'lsh' AS method,
         (SELECT count(*) FROM truth x JOIN lsh a
            ON a.probe_id = x.probe_id AND a.neighbor_id = x.neighbor_id) AS n_hits,
         0.10 AS fl
  UNION ALL
  SELECT 'lsh_mp',
         (SELECT count(*) FROM truth x JOIN lsh_mp a
            ON a.probe_id = x.probe_id AND a.neighbor_id = x.neighbor_id),
         0.30
  UNION ALL
  SELECT 'ivf',
         (SELECT count(*) FROM truth x JOIN ivf a
            ON a.probe_id = x.probe_id AND a.neighbor_id = x.neighbor_id),
         0.40
)
SELECT method, n_truth, n_hits::BIGINT AS n_hits,
       CASE WHEN n_truth > 0 THEN round(n_hits * 1.0 / n_truth, 6) END AS recall_at_k,
       coalesce(CASE WHEN n_truth > 0
                     THEN round(n_hits * 1.0 / n_truth, 6) >= fl END,
                FALSE) AS meets_floor
FROM hits, t""",
    "url_dedup": r"""
WITH urls AS (
  SELECT doc_id,
         'https://' || CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END ||
         source || '.example.com/p/' || CAST(doc_id % 97 AS VARCHAR) ||
         CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END ||
         '?id=' || CAST(doc_id AS VARCHAR) || '&utm_source=feed' AS url
  FROM documents
),
norm AS (
  SELECT doc_id, url,
         regexp_replace(lower(regexp_extract(url, 'https?://([^/?#]+)', 1)),
                        '^www\.', '') AS host,
         regexp_replace(regexp_extract(url, 'https?://[^/?#]+([^?#]*)', 1),
                        '/+$', '') AS path
  FROM urls
)
SELECT host, path, count(*)::BIGINT AS n_docs,
       count(DISTINCT url)::BIGINT AS n_variants,
       min(doc_id) AS canonical_doc_id
FROM norm GROUP BY host, path""",
    # closed-form replay of ppm_table's pixel formula — checks the
    # REAL decode end-to-end (a parser bug cannot reproduce these means)
    # PNG decode reconstructs the same closed-form pixels as PPM (the
    # filters are lossless), so the oracle is the identical replay
    "media_decode_png": """
WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents),
px AS (
  SELECT doc_id, w, h, unnest(generate_series(0, w * h - 1)) AS i FROM d
)
SELECT doc_id, w::INT AS width, h::INT AS height, (w * h)::BIGINT AS n_pixels,
       round(avg((doc_id + i) % 256), 6) AS mean_r,
       round(avg((doc_id + 2 * i) % 256), 6) AS mean_g,
       round(avg((doc_id + 3 * i) % 256), 6) AS mean_b
FROM px GROUP BY doc_id, w, h""",
    "media_decode_ppm": """
WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents),
px AS (
  SELECT doc_id, w, h, unnest(generate_series(0, w * h - 1)) AS i FROM d
)
SELECT doc_id, w::INT AS width, h::INT AS height, (w * h)::BIGINT AS n_pixels,
       round(avg((doc_id + i) % 256), 6) AS mean_r,
       round(avg((doc_id + 2 * i) % 256), 6) AS mean_g,
       round(avg((doc_id + 3 * i) % 256), 6) AS mean_b
FROM px GROUP BY doc_id, w, h""",
    # BMP: same closed-form channel stats as the PPM/PNG corpora plus
    # the image-space (row 0, col 1) pixel — i = 1, so channels are
    # (d+1)%256, (d+2)%256, (d+3)%256; a decoder that misreads
    # bottom-up/BGR/stride diverges here even when the means agree
    "media_decode_bmp": """
WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents),
px AS (
  SELECT doc_id, w, h, unnest(generate_series(0, w * h - 1)) AS i FROM d
)
SELECT doc_id, w::INT AS width, h::INT AS height, (w * h)::BIGINT AS n_pixels,
       round(avg((doc_id + i) % 256), 6) AS mean_r,
       round(avg((doc_id + 2 * i) % 256), 6) AS mean_g,
       round(avg((doc_id + 3 * i) % 256), 6) AS mean_b,
       ((doc_id + 1) % 256)::INT AS px01_r,
       ((doc_id + 2) % 256)::INT AS px01_g,
       ((doc_id + 3) % 256)::INT AS px01_b
FROM px GROUP BY doc_id, w, h""",
    # GIF: pixel i's palette index is j = (d+i)%256; palette entry j
    # is (j, 2j%256, 3j%256) — so decoded channels are closed-form in
    # the index and the oracle needs neither LZW nor the palette bytes
    "media_decode_gif": """
WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents),
px AS (
  SELECT doc_id, w, h, (doc_id + unnest(generate_series(0, w * h - 1))) % 256 AS j
  FROM d
)
SELECT doc_id, w::INT AS width, h::INT AS height, (w * h)::BIGINT AS n_pixels,
       round(avg(j), 6) AS mean_r,
       round(avg((2 * j) % 256), 6) AS mean_g,
       round(avg((3 * j) % 256), 6) AS mean_b
FROM px GROUP BY doc_id, w, h""",
    # animated GIF: frame f's pixel i has palette index
    # j = (d + 17f + i) % 256; per-doc constant delay makes the
    # cumulative display time an exact f*delay/100 — frames, delays,
    # and channel means all replay without the codec
    "media_frames_gif": """
WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
                  2 + doc_id % 3 AS nf, 10 + doc_id % 5 AS delay
           FROM documents),
fr AS (SELECT doc_id, w, h, delay, unnest(generate_series(0, nf - 1)) AS f
       FROM d),
px AS (
  SELECT doc_id, w, h, delay, f,
         (doc_id + 17 * f + unnest(generate_series(0, w * h - 1))) % 256 AS j
  FROM fr
)
SELECT doc_id, f::INT AS frame_idx, delay::INT AS delay_cs,
       (f * delay) / 100.0 AS frame_ts,
       w::INT AS width, h::INT AS height, (w * h)::BIGINT AS n_pixels,
       round(avg(j), 6) AS mean_r,
       round(avg((2 * j) % 256), 6) AS mean_g,
       round(avg((3 * j) % 256), 6) AS mean_b
FROM px GROUP BY doc_id, f, delay, w, h""",
    # disposal/transparency corpus: the displayed canvas of each frame
    # is a CASE over pixel position p (y = p//w, x = p%w) — frame 0 is
    # the full formula, frame 1 is bg (disposal-2 restore) + the
    # transparent-masked rect (r=0 stays bg), frame 2 is bg
    # (disposal-3 restore) + the top-row overwrite
    "media_frames_gif2": """
WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
                  10 + doc_id % 5 AS delay, (7 * doc_id) % 256 AS bg
           FROM documents),
fr AS (SELECT doc_id, w, h, delay, bg, unnest([0, 1, 2]) AS f FROM d),
px AS (
  SELECT doc_id, w, h, delay, bg, f,
         unnest(generate_series(0, w * h - 1)) AS p
  FROM fr
),
v AS (
  SELECT doc_id, w, h, delay, f,
         CASE
           WHEN f = 0 THEN (doc_id + p) % 256
           WHEN f = 1 THEN CASE
             WHEN (p // w) BETWEEN 1 AND h - 2
                  AND (p % w) BETWEEN 1 AND w - 2
                  AND ((p // w) - 1) * (w - 2) + ((p % w) - 1) <> 0
             THEN (doc_id + 5 + ((p // w) - 1) * (w - 2) + ((p % w) - 1)) % 256
             ELSE bg END
           ELSE CASE
             WHEN p // w = 0 AND p % w <= w - 2
             THEN (doc_id + 9 + (p % w)) % 256
             ELSE bg END
         END AS j
  FROM px
)
SELECT doc_id, f::INT AS frame_idx, delay::INT AS delay_cs,
       (f * delay) / 100.0 AS frame_ts,
       w::INT AS width, h::INT AS height, (w * h)::BIGINT AS n_pixels,
       round(avg(j), 6) AS mean_r,
       round(avg((2 * j) % 256), 6) AS mean_g,
       round(avg((3 * j) % 256), 6) AS mean_b
FROM v GROUP BY doc_id, f, delay, w, h""",
    # JPEG: block b of doc d holds the flat value (d + 7b) % 256 and
    # the DC-only IDCT is exact, so mean_gray is the closed-form block
    # mean — no tolerance despite the lossy format
    "media_decode_jpeg": """
WITH d AS (SELECT doc_id, 8 * (1 + doc_id % 3) AS w, 8 * (1 + doc_id % 2) AS h
           FROM documents),
blk AS (
  SELECT doc_id, w, h,
         unnest(generate_series(0, (w // 8) * (h // 8) - 1)) AS b
  FROM d
)
SELECT doc_id, w::INT AS width, h::INT AS height, (w * h)::BIGINT AS n_pixels,
       round(avg((doc_id + 7 * b) % 256), 6) AS mean_gray
FROM blk GROUP BY doc_id, w, h""",
    # nearest-neighbor resize replayed as pure index arithmetic:
    # output pixel (ro, co) of the 6x5 target reads source index
    # ((ro*h)//5)*w + (co*w)//6; channels are the ppm_table closed form
    "media_resize": """
WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents),
px AS (
  SELECT doc_id,
         ((ro * h) // 5) * w + ((co * w) // 6) AS i
  FROM d, range(5) r(ro), range(6) c(co)
)
SELECT doc_id, 6 AS width, 5 AS height, 30::BIGINT AS n_pixels,
       round(avg((doc_id + i) % 256), 6) AS mean_r,
       round(avg((doc_id + 2 * i) % 256), 6) AS mean_g,
       round(avg((doc_id + 3 * i) % 256), 6) AS mean_b
FROM px GROUP BY doc_id""",
    # sliding windows: oracle groups by the window TEXT (the engine's
    # xxhash64 only correlates); ranges collapse via the same
    # gaps-and-islands walk
    "repeated_spans_sliding": f"""
WITH {SLIDING_WINS_CTES},
dups AS (SELECT span_text FROM wins GROUP BY span_text HAVING count(*) >= 2),
hits AS (SELECT doc_id, start FROM wins JOIN dups USING (span_text)),
grouped AS (
  SELECT doc_id, start,
         start - row_number() OVER (PARTITION BY doc_id ORDER BY start) AS grp
  FROM hits
)
SELECT doc_id, min(start)::INT AS range_start,
       (max(start) - min(start) + 8)::INT AS range_len_words,
       count(*)::BIGINT AS n_windows
FROM grouped GROUP BY doc_id, grp""",
    # the cutter: same sliding-window range detection, then words
    # whose 0-based position falls inside any flagged range are
    # dropped and the survivors re-joined in position order (DuckDB
    # string_agg ORDER BY pos == Spark array_sort(struct(pos, w)))
    "remove_repeated_spans": f"""
WITH {SLIDING_WINS_CTES},
dups AS (SELECT span_text FROM wins GROUP BY span_text HAVING count(*) >= 2),
hits AS (SELECT doc_id, start FROM wins JOIN dups USING (span_text)),
{SPAN_RANGES_CTES},
{SPAN_CUT_TAIL_SQL}""",
    # the ALL-BUT-ONE cutter: same sliding sweep, but each repeated
    # window's canonical occurrence (row_number()=1 over (doc_id,
    # start) per span text == the engine's min(struct) argmin) is NOT
    # flagged; ranges collapse over the non-canonical starts only,
    # then the identical positional cut / reassembly
    "remove_repeated_spans_keep_first": f"""
WITH {SLIDING_WINS_CTES},
occ AS (
  SELECT doc_id, start, span_text,
         count(*) OVER (PARTITION BY span_text) AS span_df,
         row_number() OVER (PARTITION BY span_text
                            ORDER BY doc_id, start) AS rn
  FROM wins
),
hits AS (SELECT doc_id, start FROM occ WHERE span_df >= 2 AND rn > 1),
{SPAN_RANGES_CTES},
{SPAN_CUT_TAIL_SQL}""",
    # Engine groups spans by xxhash64(span_text) (8-byte shuffle key);
    # the oracle groups by the text itself — identical counts, and the
    # hash never reaches the output.
    "span_dedup": r"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> '') AS ws
  FROM documents
),
full_docs AS (SELECT doc_id, ws, len(ws) AS n FROM toks WHERE len(ws) >= 8),
idx AS (SELECT doc_id, ws, n, unnest(generate_series(0, n // 8 - 1)) AS j FROM full_docs),
spans AS (
  SELECT doc_id, j, array_to_string(ws[j*8+1 : j*8+8], ' ') AS span_text,
         CASE WHEN n % 8 > 0 THEN array_to_string(ws[n - n % 8 + 1 : n], ' ') END AS remainder
  FROM idx
),
counts AS (SELECT span_text, count(*) AS span_df FROM spans GROUP BY span_text),
k AS (SELECT s.*, c.span_df < 2 AS keep FROM spans s JOIN counts c USING (span_text)),
agg AS (
  SELECT doc_id, count(*) AS n_spans,
         sum(CASE WHEN keep THEN 1 ELSE 0 END) AS n_kept,
         string_agg(span_text, ' ' ORDER BY j) FILTER (WHERE keep) AS kept_txt,
         any_value(remainder) AS rem
  FROM k GROUP BY doc_id
)
SELECT doc_id, n_spans::BIGINT AS n_spans, n_kept::BIGINT AS n_kept,
       concat_ws(' ', kept_txt, rem) AS text_kept
FROM agg""",
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
    # DuckDB's native ASOF LEFT JOIN is the oracle for the engine's
    # union-and-carry asof implementation; ties collapse via the same
    # event_id struct-max before the fill on both sides.
    "price_resample_1h": f"""
WITH ticks AS ({PRICE_BASE_TB_SQL}),
t AS (
  SELECT coin_id, exchange, timestamp,
         (max({{'e': event_id, 'p': price}})).p AS price
  FROM ticks GROUP BY coin_id, exchange, timestamp
),
h AS (
  SELECT coin_id, exchange, date_trunc('hour', timestamp) AS hour_ts,
         (max({{'t': timestamp, 'p': price}})).t AS tick_ts,
         (max({{'t': timestamp, 'p': price}})).p AS price
  FROM t GROUP BY coin_id, exchange, date_trunc('hour', timestamp)
),
b AS (
  SELECT coin_id, exchange, min(hour_ts) AS lo, max(hour_ts) AS hi
  FROM h GROUP BY coin_id, exchange
),
g AS (
  SELECT coin_id, exchange, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS grid_ts
  FROM b
)
SELECT g.coin_id, g.exchange, g.grid_ts, h.price, h.tick_ts,
       (date_trunc('hour', h.tick_ts) <> g.grid_ts) AS is_gap
FROM g ASOF LEFT JOIN h
  ON g.coin_id = h.coin_id AND g.exchange = h.exchange AND g.grid_ts >= h.hour_ts""",
    # Stage chain replayed verbatim: gopher gate (paper thresholds as
    # one WHERE), span dedup on the gated corpus, exact-dup window on
    # the post-span fingerprint, mixture rates computed on the DEDUPED
    # counts, per-source manifest.
    "curation_pipeline_v2": r"""
WITH ws0 AS (
  SELECT doc_id, source, text,
         list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> '') AS ws,
         regexp_split_to_array(text, '\n') AS lines
  FROM documents
),
g AS (
  SELECT doc_id, source, ws FROM ws0
  WHERE len(ws) > 0
    AND len(ws) >= 50 AND len(ws) <= 100000
    AND (length(array_to_string(ws, '')) / len(ws)) >= 3.0
    AND (length(array_to_string(ws, '')) / len(ws)) <= 10.0
    AND ((len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.'))) / len(ws)) < 0.1
    AND (len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) / len(lines)) < 0.90
    AND (len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) / len(lines)) < 0.30
    AND (len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) / len(ws)) >= 0.80
    AND len(list_filter(['the','be','to','of','and','that','have','with'], s -> list_contains(ws, s))) >= 1
),
full_docs AS (SELECT doc_id, source, ws, len(ws) AS n FROM g WHERE len(ws) >= 8),
idx AS (SELECT doc_id, source, ws, n, unnest(generate_series(0, n // 8 - 1)) AS j FROM full_docs),
spans AS (
  SELECT doc_id, source, j, array_to_string(ws[j*8+1 : j*8+8], ' ') AS span_text,
         CASE WHEN n % 8 > 0 THEN array_to_string(ws[n - n % 8 + 1 : n], ' ') END AS remainder
  FROM idx
),
cnts AS (SELECT span_text, count(*) AS span_df FROM spans GROUP BY span_text),
k AS (SELECT s.*, c.span_df < 2 AS keep FROM spans s JOIN cnts c USING (span_text)),
sd AS (
  SELECT doc_id, any_value(source) AS source,
         concat_ws(' ',
           string_agg(span_text, ' ' ORDER BY j) FILTER (WHERE keep),
           any_value(remainder)) AS text_kept
  FROM k GROUP BY doc_id
),
sd2 AS (SELECT * FROM sd WHERE text_kept <> ''),
dd AS (
  SELECT doc_id, source, text_kept FROM (
    SELECT sd2.*, row_number() OVER (
      PARTITION BY md5(trim(regexp_replace(lower(text_kept), '\s+', ' ', 'g')))
      ORDER BY doc_id) AS rn
    FROM sd2) WHERE rn = 1
),
counts AS (SELECT source, count(*) AS n FROM dd GROUP BY source),
tot AS (SELECT sum(n) AS total, sum(sqrt(n)) AS z FROM counts),
rates AS (
  SELECT source, n AS n_source,
         round(least(1.0, 0.8 * total * (sqrt(n) / z) / n), 9) AS rate
  FROM counts, tot
),
mixed AS (
  SELECT d.doc_id, d.source, d.text_kept, r.n_source, r.rate
  FROM dd d JOIN rates r USING (source)
  WHERE CAST(('0x' || substring(md5('mix' || d.doc_id::VARCHAR), 1, 8)) AS BIGINT)
        % 10000 < round(r.rate * 10000)
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(len(regexp_extract_all(lower(text_kept), '[a-z]+|[0-9]+|[^a-z0-9\s]')))::BIGINT AS n_tokens,
       max(n_source)::BIGINT AS docs_before_mix,
       max(rate) AS rate
FROM mixed GROUP BY source""",
    # tau=0.5 via sqrt (correctly-rounded IEEE in every engine — pow is
    # not); the 9-decimal rate round happens BEFORE the value becomes a
    # hash threshold, so both engines compare against the same cutoff.
    "mixture_sample": """
WITH src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 6 THEN 'web'
              WHEN doc_id % 10 < 9 THEN 'books'
              ELSE 'code' END AS mix_source
  FROM documents
),
counts AS (SELECT mix_source, count(*) AS n FROM src GROUP BY mix_source),
tot AS (SELECT sum(n) AS total, sum(sqrt(n)) AS z FROM counts),
rates AS (
  SELECT mix_source, n AS n_source,
         round(least(1.0, 0.5 * total * (sqrt(n) / z) / n), 9) AS rate
  FROM counts, tot
)
SELECT s.doc_id, s.mix_source, r.n_source, r.rate
FROM src s JOIN rates r USING (mix_source)
WHERE CAST(('0x' || substring(md5('mix' || s.doc_id::VARCHAR), 1, 8)) AS BIGINT)
      % 10000 < round(r.rate * 10000)""",
    # The full PQ construction replayed in SQL: codebook means, argmin
    # encode (ties by code), ADC tables, top-k (ties by neighbor).
    # Same 1e-9 rounding grid at the same three points as the engine.
    "knn_pq_recall": f"""
WITH {PQ_SEARCH_CTES},
pq AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY probe_id
                                 ORDER BY adc_dist, neighbor_id) AS rank
    FROM adc) WHERE rank <= 5
),
pr AS (SELECT vec_id AS probe_id, emb AS p FROM base WHERE vec_id % 50 = 0),
sc AS (
  SELECT pr.probe_id, b.vec_id AS neighbor_id,
         round(list_dot_product(b.emb, b.emb) + list_dot_product(pr.p, pr.p)
               - 2 * list_dot_product(pr.p, b.emb), 9) AS l2
  FROM base b CROSS JOIN pr WHERE b.vec_id <> pr.probe_id
),
truth AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY l2, neighbor_id) AS rank
    FROM sc) WHERE rank <= 5
),
agg AS (
  SELECT (SELECT count(*) FROM truth t JOIN pq USING (probe_id, neighbor_id)) AS n_hits,
         (SELECT count(DISTINCT probe_id) FROM truth) AS n_probes
)
SELECT 'pq' AS method, n_probes::BIGINT AS n_probes, n_hits::BIGINT AS n_hits,
       round(n_hits / (5.0 * n_probes), 6) AS recall_at_k,
       round(n_hits / (5.0 * n_probes), 6) >= 0.30 AS meets_floor
FROM agg""",
    "knn_pq": f"""
WITH {PQ_SEARCH_CTES}
SELECT probe_id, neighbor_id, adc_dist, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY adc_dist, neighbor_id) AS rank
  FROM adc) WHERE rank <= 5""",
    # IVF routing (the knn_ivf oracle's cosine coarse assignment) bolted
    # onto the PQ training/encode/ADC CTEs; the full-corpus `adc` CTE in
    # PQ_SEARCH_CTES goes unreferenced here and is never evaluated
    "knn_ivf_pq": f"""
WITH {PQ_SEARCH_CTES},
{IVF_ROUTE_CTES}
SELECT probe_id, neighbor_id, adc_dist, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY adc_dist, neighbor_id) AS rank
  FROM adc_ivf) WHERE rank <= 5""",
    "knn_ivf_pq_recall": f"""
WITH {PQ_SEARCH_CTES},
{IVF_ROUTE_CTES},
ivfpq AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY probe_id
                                 ORDER BY adc_dist, neighbor_id) AS rank
    FROM adc_ivf) WHERE rank <= 5
),
pr AS (SELECT vec_id AS probe_id, emb AS p FROM base WHERE vec_id % 50 = 0),
sc AS (
  SELECT pr.probe_id, b.vec_id AS neighbor_id,
         round(list_dot_product(b.emb, b.emb) + list_dot_product(pr.p, pr.p)
               - 2 * list_dot_product(pr.p, b.emb), 9) AS l2
  FROM base b CROSS JOIN pr WHERE b.vec_id <> pr.probe_id
),
truth AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY l2, neighbor_id) AS rank
    FROM sc) WHERE rank <= 5
),
agg AS (
  SELECT (SELECT count(*) FROM truth t JOIN ivfpq USING (probe_id, neighbor_id)) AS n_hits,
         (SELECT count(DISTINCT probe_id) FROM truth) AS n_probes
)
SELECT 'ivf_pq' AS method, n_probes::BIGINT AS n_probes, n_hits::BIGINT AS n_hits,
       round(n_hits / (5.0 * n_probes), 6) AS recall_at_k,
       round(n_hits / (5.0 * n_probes), 6) >= 0.10 AS meets_floor
FROM agg""",
    # The decoded-sample statistics in closed form: sample (i, ch) of
    # doc d is (d*31 + i*17 + ch*7919) % 65536 - 32768 (see
    # multimodal.wav_table). sum_amp/sum_sq are exact int64 — the hash
    # comparison needs no tolerance; rms derives with one IEEE
    # divide+sqrt identical in both engines.
    "media_decode_wav": """
WITH d AS (SELECT doc_id, 1 + doc_id % 2 AS c, 64 + doc_id % 129 AS n FROM documents),
chs AS (SELECT doc_id, c, n, unnest(generate_series(0, c - 1)) AS ch FROM d),
samp AS (SELECT doc_id, c, n, ch, unnest(generate_series(0, n - 1)) AS i FROM chs),
vals AS (SELECT doc_id, c, n, (doc_id*31 + i*17 + ch*7919) % 65536 - 32768 AS s FROM samp)
SELECT doc_id, c::INT AS n_channels, 8000::INT AS sample_rate, n::BIGINT AS n_frames,
       n / 8000.0 AS duration_s,
       sum(s)::BIGINT AS sum_amp, sum(s*s)::BIGINT AS sum_sq,
       round(sqrt(sum(s*s) / (n * c * 1.0)), 6) AS rms
FROM vals GROUP BY doc_id, c, n""",
    "knn_ivf_trained": KNN_IVF_TRAINED_SQL,
    "embedding_dup_pairs": _embedding_dup_sql(),
    "media_metadata": """
SELECT doc_id,
       CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       octet_length(encode(text))::BIGINT AS n_bytes,
       sha256(text) AS payload_sha256,
       (64 + doc_id % 448)::INT AS width,
       (64 + (doc_id * 7) % 448)::INT AS height
FROM documents""",
    "frame_schedule": """
SELECT doc_id, unnest(generate_series(0, ceil(duration_s / 10.0)::INT - 1))::INT AS frame_idx,
       unnest(generate_series(0, ceil(duration_s / 10.0)::INT - 1)) * 10.0 AS frame_ts
FROM (SELECT doc_id, ((doc_id % 120) + 1)::DOUBLE AS duration_s
      FROM documents WHERE doc_id % 3 = 2)""",
    "media_features": MEDIA_FEATURES_SQL,
    "media_frames": MEDIA_FRAMES_SQL,
    "envelope_price": PRICE_BASE_SQL,
    "envelope_coins": _with(COINS_CTE, select="SELECT * FROM coins"),
    "envelope_ohlc": ENVELOPE_TICK_OHLC_SQL,
    "envelope_mcap": ENVELOPE_MCAP_SQL,
    "coin_indicators_left": _with(
        PRICE_DATA_CTE, COINS_CTE, INDICATORS_CTE,
        select="""
, latest_full_ind AS (
  SELECT coin_id, exchange, timestamp AS ind_ts, sma_20, ema_20, rsi_14, macd FROM (
    SELECT *, row_number() OVER (PARTITION BY coin_id, exchange
                                 ORDER BY timestamp DESC, sma_20 DESC, ema_20 DESC,
                                          rsi_14 DESC, macd DESC) AS lrn
    FROM technical_indicators WHERE sma_20 IS NOT NULL) WHERE lrn = 1
)
SELECT c.id, c.name, c.symbol, c.exchange,
       i.ind_ts, i.sma_20, i.ema_20, i.rsi_14, i.macd
FROM coins c
LEFT JOIN latest_full_ind i ON i.coin_id = c.id AND i.exchange = c.exchange""",
    ),
    "asof_price_candle": f"""
WITH price AS ({PRICE_BASE_SQL}),
ohlc AS (
  SELECT coin_id, exchange, date_trunc('hour', timestamp) AS timestamp,
         (min({{'t': timestamp, 'p': price}})).p AS open, max(price) AS high,
         min(price) AS low, (max({{'t': timestamp, 'p': price}})).p AS close
  FROM price GROUP BY 1, 2, 3
)
SELECT p.coin_id, p.exchange, p.timestamp, p.price, p.volume,
       o.open, o.high, o.low, o.close
FROM price p
ASOF LEFT JOIN ohlc o
  ON p.coin_id = o.coin_id AND p.exchange = o.exchange
 AND o.timestamp <= p.timestamp""",
    "active_coins_semi": _with(
        COINS_CTE,
        select=f"""
, price AS ({PRICE_BASE_SQL}),
cut AS (SELECT max(timestamp) - INTERVAL 3 DAYS AS cutoff FROM price)
SELECT c.* FROM coins c WHERE EXISTS (
  SELECT 1 FROM price p, cut
  WHERE p.coin_id = c.id AND p.exchange = c.exchange AND p.timestamp > cut.cutoff)""",
    ),
    "stale_coins_anti": _with(
        COINS_CTE,
        select=f"""
, price AS ({PRICE_BASE_SQL}),
cut AS (SELECT max(timestamp) - INTERVAL 3 DAYS AS cutoff FROM price)
SELECT c.* FROM coins c WHERE NOT EXISTS (
  SELECT 1 FROM price p, cut
  WHERE p.coin_id = c.id AND p.exchange = c.exchange AND p.timestamp > cut.cutoff)""",
    ),
    "union_price_feeds": f"""
WITH feed AS (
  {PRICE_BASE_SQL}
  UNION ALL
  SELECT 'otc_C' || (o_custkey % 15) AS coin_id, 'otc' AS exchange,
         o_orderdate AS timestamp, o_totalprice / 1000.0 AS price,
         o_totalprice AS volume
  FROM orders
)
SELECT exchange, count(*)::BIGINT AS n_ticks, sum(volume) AS total_volume
FROM feed GROUP BY exchange""",
    "top_coins_by_volume": f"""
SELECT coin_id, exchange, sum(volume) AS total_volume
FROM ({PRICE_BASE_SQL}) p
GROUP BY coin_id, exchange
ORDER BY total_volume DESC, coin_id
LIMIT 10""",
    "volume_rollup": f"""
SELECT exchange, coin_id, sum(volume) AS total_volume, count(*)::BIGINT AS n_ticks
FROM ({PRICE_BASE_SQL}) p
GROUP BY ROLLUP (exchange, coin_id)""",
    "ichimoku": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
  SELECT coin_id, exchange, timestamp, tenkan, kijun,
         round((lag(tenkan, 26) OVER wo + lag(kijun, 26) OVER wo) / 2.0, 6)
           AS senkou_a,
         lag(spanb, 26) OVER wo AS senkou_b,
         lead(close, 26) OVER wo AS chikou
  FROM (
    SELECT coin_id, exchange, timestamp, close,
           CASE WHEN count(close) OVER w9 = 9
                THEN round((max(high) OVER w9 + min(low) OVER w9) / 2.0, 6)
           END AS tenkan,
           CASE WHEN count(close) OVER w26 = 26
                THEN round((max(high) OVER w26 + min(low) OVER w26) / 2.0, 6)
           END AS kijun,
           CASE WHEN count(close) OVER w52 = 52
                THEN round((max(high) OVER w52 + min(low) OVER w52) / 2.0, 6)
           END AS spanb
    FROM ohlc_data
    WINDOW w9 AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                  ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
           w26 AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                   ROWS BETWEEN 25 PRECEDING AND CURRENT ROW),
           w52 AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                   ROWS BETWEEN 51 PRECEDING AND CURRENT ROW))
  WINDOW wo AS (PARTITION BY coin_id, exchange ORDER BY timestamp)""",
    ),
    "rolling_beta": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
  SELECT coin_id, exchange, timestamp,
         CASE WHEN c = 24 AND v > 0 THEN round(cv / v, 6) END AS beta
  FROM (
    SELECT coin_id, exchange, timestamp,
           count(r) OVER wn AS c,
           var_samp(m) OVER wn AS v,
           covar_samp(r, m) OVER wn AS cv
    FROM (
      SELECT rr.coin_id, rr.exchange, rr.timestamp, rr.r, mkt.m
      FROM (
        SELECT coin_id, exchange, timestamp, r FROM (
          SELECT coin_id, exchange, timestamp,
                 CASE WHEN lag(close) OVER w != 0
                      THEN close / lag(close) OVER w - 1.0 END AS r
          FROM ohlc_data
          WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp))
        WHERE r IS NOT NULL) rr
      JOIN (
        SELECT timestamp, round(avg(r), 9) AS m FROM (
          SELECT timestamp, r FROM (
            SELECT coin_id, exchange, timestamp,
                   CASE WHEN lag(close) OVER w != 0
                        THEN close / lag(close) OVER w - 1.0 END AS r
            FROM ohlc_data
            WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp))
          WHERE r IS NOT NULL)
        GROUP BY timestamp) mkt USING (timestamp))
    WINDOW wn AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                  ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))""",
    ),
    "cross_exchange_spread": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
  SELECT 'C' || regexp_extract(coin_id, '_C([0-9]+)$', 1) AS coin_symbol,
         timestamp,
         max(close) AS high_close,
         min(close) AS low_close,
         round(avg(close), 6) AS avg_close,
         count(*)::BIGINT AS n_venues,
         CASE WHEN count(*) >= 2 AND min(close) > 0
              THEN round((max(close) - min(close)) / min(close), 6) END AS spread_pct
  FROM ohlc_data GROUP BY 1, 2""",
    ),
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
    "obv": f"""
WITH base AS ({PRICE_BASE_TB_SQL}),
s AS (
  SELECT coin_id, exchange, timestamp, event_id, volume,
         price - lag(price) OVER w AS delta
  FROM base
  WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp, event_id)
)
SELECT coin_id, exchange, timestamp,
       round(sum(CASE WHEN delta > 0 THEN volume
                      WHEN delta < 0 THEN -volume ELSE 0.0 END)
             OVER (PARTITION BY coin_id, exchange ORDER BY timestamp, event_id
                   ROWS UNBOUNDED PRECEDING), 6) AS obv
FROM s""",
    "stochastic": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
  SELECT coin_id, exchange, timestamp, stoch_k,
         CASE WHEN count(stoch_k) OVER wd = 3
              THEN round(avg(stoch_k) OVER wd, 6) END AS stoch_d
  FROM (
    SELECT coin_id, exchange, timestamp,
           CASE WHEN c = 14 AND hh != ll
                THEN round(100.0 * (close - ll) / (hh - ll), 6) END AS stoch_k
    FROM (
      SELECT coin_id, exchange, timestamp, close,
             count(close) OVER wn AS c,
             min(low) OVER wn AS ll,
             max(high) OVER wn AS hh
      FROM ohlc_data
      WINDOW wn AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)))
  WINDOW wd AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",
    ),
    "donchian": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
  SELECT coin_id, exchange, timestamp,
         CASE WHEN c = 20 THEN hh END AS dc_upper,
         CASE WHEN c = 20 THEN ll END AS dc_lower,
         CASE WHEN c = 20 THEN round((hh + ll) / 2.0, 6) END AS dc_mid
  FROM (
    SELECT coin_id, exchange, timestamp,
           count(close) OVER wn AS c,
           max(high) OVER wn AS hh,
           min(low) OVER wn AS ll
    FROM ohlc_data
    WINDOW wn AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                  ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))""",
    ),
    "max_drawdown": f"""
WITH base AS ({PRICE_BASE_TB_SQL}),
dd AS (
  SELECT coin_id, exchange, price,
         max(price) OVER (PARTITION BY coin_id, exchange
                          ORDER BY timestamp, event_id
                          ROWS UNBOUNDED PRECEDING) AS peak
  FROM base
)
SELECT coin_id, exchange,
       round(min(CASE WHEN peak != 0 THEN price / peak - 1.0 END), 6) AS max_drawdown,
       max(price) AS peak_price,
       count(*)::BIGINT AS n_ticks
FROM dd GROUP BY coin_id, exchange""",
    "atr_14": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
  SELECT coin_id, exchange, timestamp,
         CASE WHEN c = 14 THEN round(a, 6) END AS atr_14
  FROM (
    SELECT coin_id, exchange, timestamp,
           count(tr) OVER wn AS c, avg(tr) OVER wn AS a
    FROM (
      SELECT coin_id, exchange, timestamp,
             CASE WHEN pc IS NULL THEN high - low
                  ELSE greatest(high - low, abs(high - pc), abs(low - pc)) END AS tr
      FROM (
        SELECT coin_id, exchange, timestamp, high, low,
               lag(close) OVER (PARTITION BY coin_id, exchange
                                ORDER BY timestamp) AS pc
        FROM ohlc_data))
    WINDOW wn AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                  ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))""",
    ),
    # the streaming replay emits exactly the batch candles of the real
    # feed (sentinel-advanced watermark), so its oracle is the identical
    # batch ohlc SQL
    "ohlc_stream_replay": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="SELECT coin_id, exchange, timestamp, open, high, low, close FROM ohlc_data",
    ),
    # the kill-and-resume drain must ALSO emit exactly the batch
    # candles — recovery that loses state, re-emits, or late-drops
    # diverges from this same SQL
    "recovery_stream_replay": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="SELECT coin_id, exchange, timestamp, open, high, low, close FROM ohlc_data",
    ),
    # ...and so must the late-drop drain: the sabotage re-deliveries
    # are DROPPED behind the watermark, so the real feed's batch
    # candles are again the exact expectation (a leak craters `low`)
    "late_drop_stream_replay": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="SELECT coin_id, exchange, timestamp, open, high, low, close FROM ohlc_data",
    ),
    # replays the DataSource's integer-arithmetic generator with
    # generate_series, then the standard candle CTE on top
    # the plan-shape contract: expected feature literals, measured and
    # pinned (identical tuned/vanilla, sf-independent); a planner or
    # plan regression = hash mismatch. Re-pin DELIBERATELY (with the
    # new measurement) if Spark is upgraded or a plan is re-designed.
    # AQE skew probe: fixed synthetic input, so the whole row --
    # results AND adaptive-plan booleans -- is a literal contract
    "plan_audit_skew": """
SELECT * FROM (VALUES
  ('skew_on',  100000::BIGINT, 3200000::BIGINT, 999900000::BIGINT, TRUE, TRUE,  TRUE),
  ('skew_off', 100000::BIGINT, 3200000::BIGINT, 999900000::BIGINT, TRUE, FALSE, FALSE)
) AS t(mode, n_rows, pad_chars, tag_sum, smj_in_final, skew_split_applied,
       aqe_shuffle_reads)""",
    "plan_audit": """
SELECT * FROM (VALUES
  ('coin_table', 6, 3, 3, 0, 6),
  ('exact_dedup', 1, 0, 0, 0, 0),
  ('technical_indicators', 1, 0, 0, 0, 0),
  ('coin_market_cap', 3, 1, 1, 0, 0),
  ('gopher_rules', 0, 0, 0, 0, 0),
  ('media_metadata', 0, 0, 0, 0, 0),
  ('price_chart', 1, 1, 1, 0, 0),
  ('url_dedup', 2, 0, 0, 0, 0)
) AS t(query, n_shuffles, n_broadcasts, n_broadcast_joins,
       n_sortmerge_joins, n_window_group_limits)""",
    # salted join is result-identical to the plain join — the oracle
    # IS the plain join, so the hash pins exactly that equivalence
    "salted_join_skew": f"""
WITH base AS ({PRICE_BASE_SQL}),
keyed AS (
  SELECT CASE WHEN CAST(regexp_extract(coin_id, '_C([0-9]+)$', 1) AS INT) % 5 <> 0
              THEN 'HOT'
              ELSE 'C' || regexp_extract(coin_id, '_C([0-9]+)$', 1) END AS key,
         volume
  FROM base
),
dim AS (SELECT key, md5(key) AS key_tag FROM (SELECT DISTINCT key FROM keyed))
SELECT k.key, d.key_tag, count(*)::BIGINT AS n_rows,
       round(sum(k.volume), 6) AS total_volume
FROM keyed k JOIN dim d ON k.key = d.key
GROUP BY k.key, d.key_tag""",
    # the feed generation of restfeed_ohlc over 180 minutes; the final
    # watermark (last tick 02:59, delay 0) closes only hours 0 and 1 —
    # append mode withholds the open hour-2 window, and the oracle
    # encodes exactly that
    "restfeed_stream_replay": """
WITH coins AS (SELECT unnest(generate_series(0, 19)) AS coin),
mins AS (SELECT unnest(generate_series(0, 179)) AS m),
feed AS (
  SELECT
    (CASE coin % 3 WHEN 0 THEN 'binance' WHEN 1 THEN 'coinbase'
                   ELSE 'kraken' END) || '_R' || coin AS coin_id,
    CASE coin % 3 WHEN 0 THEN 'binance' WHEN 1 THEN 'coinbase'
                  ELSE 'kraken' END AS exchange,
    TIMESTAMP '2024-01-01' + m * INTERVAL 1 MINUTE AS timestamp,
    (10000 + (coin * 9176 + m * 31) % 1000) / 100.0 AS price,
    ((coin * 7 + m * 13) % 500 + 1)::DOUBLE AS volume
  FROM coins, mins
),
candles AS (
  SELECT coin_id, exchange, date_trunc('hour', timestamp) AS timestamp,
         (min({'t': timestamp, 'p': price})).p AS open,
         max(price) AS high,
         min(price) AS low,
         (max({'t': timestamp, 'p': price})).p AS close
  FROM feed
  GROUP BY coin_id, exchange, date_trunc('hour', timestamp)
)
SELECT coin_id, exchange, timestamp, open, high, low, close
FROM candles
WHERE timestamp <= TIMESTAMP '2024-01-01 01:00:00'""",
    "restfeed_ohlc": """
WITH coins AS (SELECT unnest(generate_series(0, 19)) AS coin),
mins AS (SELECT unnest(generate_series(0, 119)) AS m),
feed AS (
  SELECT
    (CASE coin % 3 WHEN 0 THEN 'binance' WHEN 1 THEN 'coinbase'
                   ELSE 'kraken' END) || '_R' || coin AS coin_id,
    CASE coin % 3 WHEN 0 THEN 'binance' WHEN 1 THEN 'coinbase'
                  ELSE 'kraken' END AS exchange,
    TIMESTAMP '2024-01-01' + m * INTERVAL 1 MINUTE AS timestamp,
    (10000 + (coin * 9176 + m * 31) % 1000) / 100.0 AS price,
    ((coin * 7 + m * 13) % 500 + 1)::DOUBLE AS volume
  FROM coins, mins
)
SELECT coin_id, exchange, date_trunc('hour', timestamp) AS timestamp,
       (min({'t': timestamp, 'p': price})).p AS open,
       max(price) AS high,
       min(price) AS low,
       (max({'t': timestamp, 'p': price})).p AS close
FROM feed
GROUP BY coin_id, exchange, date_trunc('hour', timestamp)""",
    "ohlc_daily_rollup": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
, daily AS (
  SELECT coin_id, exchange, date_trunc('day', timestamp) AS day,
         (min({'t': timestamp, 'o': open})).o AS open,
         max(high) AS high, min(low) AS low,
         (max({'t': timestamp, 'c': close})).c AS close
  FROM ohlc_data
  GROUP BY coin_id, exchange, date_trunc('day', timestamp)
)
SELECT coin_id, exchange, day AS timestamp, open, high, low, close
FROM daily""",
    ),
    "event_bigrams": """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, count(*)::BIGINT AS n_transitions
  FROM pairs WHERE from_type IS NOT NULL GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_transitions, rank FROM (
  SELECT *, row_number() OVER (ORDER BY n_transitions DESC,
                               from_type, to_type) AS rank
  FROM counts) WHERE rank <= 20""",
    "shipping_priority": """
WITH cut AS (SELECT max(l_shipdate) - INTERVAL 60 DAYS AS c FROM lineitem),
cust AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
ordf AS (
  SELECT o_orderkey, o_orderdate, o_orderpriority
  FROM orders JOIN cust ON o_custkey = c_custkey CROSS JOIN cut
  WHERE o_orderdate < cut.c
),
li AS (
  SELECT l_orderkey, l_extendedprice * (1 - l_discount) AS rev
  FROM lineitem CROSS JOIN cut WHERE l_shipdate > cut.c
)
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(rev), 6) AS revenue
FROM li JOIN ordf ON l_orderkey = o_orderkey
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10""",
    "event_props_variant": """
SELECT event_type,
       count(*)::BIGINT AS n_events,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       min(json_extract(props, '$.k')::BIGINT)::BIGINT AS min_k,
       max(json_extract(props, '$.k')::BIGINT)::BIGINT AS max_k,
       sum(CASE WHEN json_extract_string(props, '$.does_not_exist') IS NULL
                THEN 1 ELSE 0 END)::BIGINT AS n_missing_path
FROM events GROUP BY event_type""",
    "activity_reconciliation": f"""
WITH base AS ({PRICE_BASE_SQL}),
bounds AS (
  SELECT (min(epoch_us(timestamp)) + max(epoch_us(timestamp))) // 2 AS mid
  FROM base
),
a AS (
  SELECT coin_id, exchange, count(*)::BIGINT AS n_ticks_h1,
         round(sum(volume), 6) AS volume_h1
  FROM base, bounds WHERE epoch_us(timestamp) <= mid
  GROUP BY coin_id, exchange
),
b AS (
  SELECT coin_id, exchange, count(*)::BIGINT AS n_ticks_h2,
         round(sum(volume), 6) AS volume_h2
  FROM base, bounds WHERE epoch_us(timestamp) > mid
  GROUP BY coin_id, exchange
)
SELECT coalesce(a.coin_id, b.coin_id) AS coin_id,
       coalesce(a.exchange, b.exchange) AS exchange,
       coalesce(n_ticks_h1, 0)::BIGINT AS n_ticks_h1,
       coalesce(n_ticks_h2, 0)::BIGINT AS n_ticks_h2,
       coalesce(volume_h1, 0.0) AS volume_h1,
       coalesce(volume_h2, 0.0) AS volume_h2,
       CASE WHEN n_ticks_h1 IS NOT NULL AND n_ticks_h2 IS NOT NULL THEN 'both'
            WHEN n_ticks_h1 IS NOT NULL THEN 'first_half_only'
            ELSE 'second_half_only' END AS status
FROM a FULL OUTER JOIN b
  ON a.coin_id = b.coin_id AND a.exchange = b.exchange""",
    "pricing_summary": """
WITH cut AS (SELECT max(l_shipdate) - INTERVAL 90 DAYS AS cutoff FROM lineitem)
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       round(sum(l_extendedprice), 6) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*)::BIGINT AS count_order
FROM lineitem, cut
WHERE l_shipdate <= cut.cutoff
GROUP BY l_returnflag, l_linestatus""",
    "rolling_active_coins": f"""
WITH base AS ({PRICE_BASE_SQL}),
pairs AS (
  SELECT DISTINCT exchange, date_trunc('day', timestamp) AS day, coin_id
  FROM base
),
spine AS (SELECT DISTINCT exchange, day FROM pairs),
ex AS (
  SELECT s.exchange, s.day, count(DISTINCT p.coin_id)::BIGINT AS n_coins_7d
  FROM spine s JOIN pairs p ON p.exchange = s.exchange
   AND p.day BETWEEN s.day - INTERVAL 6 DAYS AND s.day
  GROUP BY s.exchange, s.day
),
nd AS (
  SELECT exchange, day,
         count(*) OVER (PARTITION BY exchange ORDER BY day
                        RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)::BIGINT
           AS n_days_in_window
  FROM spine
)
SELECT ex.exchange, ex.day, ex.n_coins_7d, nd.n_days_in_window,
       TRUE AS sketch_within_5pct
FROM ex JOIN nd USING (exchange, day)""",
    "exchange_hll_rollup": f"""
WITH base AS ({PRICE_BASE_SQL})
SELECT exchange,
       count(DISTINCT coin_id)::BIGINT AS n_coins,
       count(DISTINCT date_trunc('day', timestamp))::BIGINT AS n_days,
       TRUE AS merged_within_5pct
FROM base GROUP BY exchange""",
    "dup_rate_by_source": f"""
WITH base AS (
  SELECT source, md5({NORM_TEXT_SQL}) AS fp, doc_id FROM documents
),
counts AS (SELECT fp, count(*) AS n FROM base GROUP BY fp)
SELECT source,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT b.fp)::BIGINT AS n_distinct,
       sum((n > 1)::INT)::BIGINT AS n_dup_docs,
       round(sum((n > 1)::INT)::DOUBLE / count(*), 9) AS dup_rate
FROM base b JOIN counts c USING (fp)
GROUP BY source""",
    "coin_volume_percentile": f"""
WITH base AS ({PRICE_BASE_SQL}),
t AS (
  SELECT coin_id, exchange, round(sum(volume), 6) AS total_volume,
         count(*)::BIGINT AS n_ticks
  FROM base GROUP BY coin_id, exchange
)
SELECT exchange, coin_id, total_volume, n_ticks,
       percent_rank() OVER w AS vol_percent_rank,
       cume_dist() OVER w AS vol_cume_dist
FROM t
WINDOW w AS (PARTITION BY exchange ORDER BY total_volume)""",
    "volume_grouping_sets": f"""
SELECT exchange, date_trunc('day', timestamp) AS day,
       grouping_id(exchange, date_trunc('day', timestamp))::BIGINT AS grouping_id,
       round(sum(volume), 6) AS total_volume, count(*)::BIGINT AS n_ticks
FROM ({PRICE_BASE_SQL}) p
GROUP BY GROUPING SETS ((exchange), (date_trunc('day', timestamp)), ())""",
    "lead_lag_corr": f"""
WITH base AS ({PRICE_BASE_SQL}),
top AS (SELECT coin_id FROM base GROUP BY coin_id
        ORDER BY sum(volume) DESC, coin_id LIMIT 20),
daily AS (
  SELECT coin_id, date_trunc('day', timestamp) AS ts,
         (max({{'t': timestamp, 'p': price}})).p AS close
  FROM base JOIN top USING (coin_id)
  GROUP BY coin_id, date_trunc('day', timestamp)
)
SELECT a.coin_id AS coin_a, b.coin_id AS coin_b,
       count(*)::BIGINT AS n_obs,
       round(corr(a.close, b.close), 7) AS lead_corr
FROM daily a JOIN daily b
  ON a.ts = b.ts + INTERVAL 1 DAY AND a.coin_id <> b.coin_id
GROUP BY a.coin_id, b.coin_id
HAVING count(*) >= 5""",
    "rolling_sharpe": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
, r AS (
  SELECT coin_id, exchange, timestamp,
         CASE WHEN lag(close) OVER w <> 0
              THEN close / lag(close) OVER w - 1.0 END AS r
  FROM ohlc_data
  WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp)
),
rr AS (SELECT * FROM r WHERE r IS NOT NULL),
m AS (
  SELECT coin_id, exchange, timestamp,
         CASE WHEN count(r) OVER wn = 6
              THEN round(avg(r) OVER wn, 9) END AS mean_ret,
         CASE WHEN count(r) OVER wn = 6
              THEN round(stddev_samp(r) OVER wn, 9) END AS sd
  FROM rr
  WINDOW wn AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
)
SELECT coin_id, exchange, timestamp, mean_ret,
       CASE WHEN sd > 0 THEN round(mean_ret / sd, 6) END AS sharpe
FROM m""",
    ),
    "market_regime": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
, r AS (
  SELECT coin_id, exchange, timestamp,
         CASE WHEN lag(close) OVER w <> 0
              THEN close / lag(close) OVER w - 1.0 END AS r
  FROM ohlc_data
  WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp)
),
rr AS (SELECT * FROM r WHERE r IS NOT NULL),
v AS (
  SELECT coin_id, exchange, timestamp,
         CASE WHEN count(r) OVER wn = 6
              THEN round(stddev_samp(r) OVER wn, 9) END AS vol
  FROM rr
  WINDOW wn AS (PARTITION BY coin_id, exchange ORDER BY timestamp
                ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
),
vv AS (SELECT * FROM v WHERE vol IS NOT NULL),
th AS (
  SELECT coin_id, exchange,
         round(quantile_cont(vol, 0.33), 9) AS q_low,
         round(quantile_cont(vol, 0.66), 9) AS q_high
  FROM vv GROUP BY coin_id, exchange
)
SELECT vv.coin_id, vv.exchange, vv.timestamp, vv.vol,
       CASE WHEN vol <= q_low THEN 'calm'
            WHEN vol <= q_high THEN 'normal'
            ELSE 'turbulent' END AS regime
FROM vv JOIN th USING (coin_id, exchange)""",
    ),
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
    # the ha_open recursion replayed exactly: every step is one rounding
    # of (prev+x)/2 (x0.5 is exact in binary fp), so the recursive CTE
    # and the engine's grouped ewm(alpha=0.5) agree bit-for-bit
    "heikin_ashi": f"""
WITH RECURSIVE {PRICE_DATA_CTE.strip()},
{OHLC_CTE.strip()},
c AS (
  SELECT coin_id, exchange, timestamp, open, high, low, close,
         (open + high + low + close) / 4.0 AS ha_close,
         row_number() OVER (PARTITION BY coin_id, exchange
                            ORDER BY timestamp) AS rn
  FROM ohlc_data
),
ha AS (
  SELECT coin_id, exchange, timestamp, high, low, ha_close, rn,
         (open + close) / 2.0 AS ha_open
  FROM c WHERE rn = 1
  UNION ALL
  SELECT c.coin_id, c.exchange, c.timestamp, c.high, c.low, c.ha_close, c.rn,
         (ha.ha_open + ha.ha_close) / 2.0 AS ha_open
  FROM ha JOIN c ON c.coin_id = ha.coin_id AND c.exchange = ha.exchange
               AND c.rn = ha.rn + 1
)
SELECT coin_id, exchange, timestamp, ha_open,
       greatest(high, ha_open, ha_close) AS ha_high,
       least(low, ha_open, ha_close) AS ha_low,
       ha_close
FROM ha""",
    "funnel_conversion": """
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view'
  GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t
  GROUP BY e.user_id
),
counts AS (
  SELECT 1 AS stage_idx, 'view' AS stage, count(*)::BIGINT AS n_users FROM s1
  UNION ALL
  SELECT 2, 'click', count(*)::BIGINT FROM s2
  UNION ALL
  SELECT 3, 'purchase', count(*)::BIGINT FROM s3
)
SELECT stage_idx, stage, n_users,
       round(n_users::DOUBLE / lag(n_users) OVER w, 9) AS conv_from_prev,
       round(n_users::DOUBLE / first_value(n_users) OVER w, 9) AS conv_from_first
FROM counts
WINDOW w AS (ORDER BY stage_idx)""",
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
    "scd2_volume_tiers": f"""
WITH base AS ({PRICE_BASE_SQL}),
daily AS (
  SELECT coin_id, date_trunc('day', timestamp) AS day,
         round(sum(volume), 6) AS day_volume
  FROM base GROUP BY coin_id, date_trunc('day', timestamp)
),
tiered AS (
  SELECT *, ntile(4) OVER (PARTITION BY day
                           ORDER BY day_volume DESC, coin_id) AS tier
  FROM daily
),
runs AS (
  SELECT *,
         row_number() OVER (PARTITION BY coin_id ORDER BY day)
           - row_number() OVER (PARTITION BY coin_id, tier ORDER BY day) AS grp
  FROM tiered
),
collapsed AS (
  SELECT coin_id, tier, grp,
         min(day) AS valid_from,
         max(day) AS last_day,
         count(*)::BIGINT AS n_days
  FROM runs GROUP BY coin_id, tier, grp
)
SELECT coin_id, tier, valid_from,
       last_day + INTERVAL 1 DAY AS valid_to,
       n_days,
       last_day = max(last_day) OVER (PARTITION BY coin_id) AS is_current
FROM collapsed""",
    # closed-form EMA over typical price (same identity as
    # INDICATORS_CTE's ema_20) + the atr_14 oracle's TR construction;
    # kc_mid stays unrounded like ema_20 (see with_keltner docstring)
    "keltner_channels": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
, kc0 AS (
  SELECT coin_id, exchange, timestamp,
         (high + low + close) / 3.0 AS typical,
         row_number() OVER wo AS rn,
         first_value((high + low + close) / 3.0) OVER wo AS t0,
         CASE WHEN lag(close) OVER wo IS NULL THEN high - low
              ELSE greatest(high - low, abs(high - lag(close) OVER wo),
                            abs(low - lag(close) OVER wo)) END AS tr
  FROM ohlc_data
  WINDOW wo AS (PARTITION BY coin_id, exchange ORDER BY timestamp)
),
kc1 AS (
  SELECT coin_id, exchange, timestamp,
         power(19.0/21.0, rn-1) * (t0 + (2.0/21.0) * (s - t0)) AS kc_mid,
         atr
  FROM (
    SELECT coin_id, exchange, timestamp, rn, t0,
           sum(typical * power(19.0/21.0, -(rn-1))) OVER ws AS s,
           CASE WHEN count(tr) OVER w14 = 14
                THEN round(avg(tr) OVER w14, 6) END AS atr
    FROM kc0
    WINDOW ws AS (PARTITION BY coin_id, exchange ORDER BY rn
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w14 AS (PARTITION BY coin_id, exchange ORDER BY rn
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
)
SELECT coin_id, exchange, timestamp, kc_mid,
       kc_mid + 2.0 * atr AS kc_upper,
       kc_mid - 2.0 * atr AS kc_lower
FROM kc1""",
    ),
    "candlestick_patterns": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
  SELECT coin_id, exchange, timestamp,
         ((high - low) > 0 AND abs(close - open) <= 0.1 * (high - low)) AS is_doji,
         ((high - low) > 0
          AND (least(open, close) - low) >= 2.0 * abs(close - open)
          AND (high - greatest(open, close)) <= abs(close - open)) AS is_hammer,
         ((high - low) > 0
          AND (high - greatest(open, close)) >= 2.0 * abs(close - open)
          AND (least(open, close) - low) <= abs(close - open)) AS is_shooting_star,
         coalesce(pc < po AND close > open
                  AND open <= pc AND close >= po, FALSE) AS is_bullish_engulfing,
         coalesce(pc > po AND close < open
                  AND open >= pc AND close <= po, FALSE) AS is_bearish_engulfing
  FROM (SELECT *, lag(open) OVER w AS po, lag(close) OVER w AS pc
        FROM ohlc_data
        WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp))""",
    ),
    "vwap_hourly": f"""
SELECT coin_id, exchange, date_trunc('hour', timestamp) AS timestamp,
       CASE WHEN sum(volume) > 0
            THEN round(sum(price * volume) / sum(volume), 6) END AS vwap,
       round(sum(volume), 6) AS total_volume,
       count(*)::BIGINT AS n_ticks
FROM ({PRICE_BASE_SQL}) p
GROUP BY coin_id, exchange, date_trunc('hour', timestamp)""",
    # the streaming replay emits exactly the batch VWAP of the real
    # feed (sentinel-advanced watermark; see pipeline.vwap_stream_replay),
    # so its oracle is the identical batch SQL
    "vwap_stream_replay": f"""
SELECT coin_id, exchange, date_trunc('hour', timestamp) AS timestamp,
       CASE WHEN sum(volume) > 0
            THEN round(sum(price * volume) / sum(volume), 6) END AS vwap,
       round(sum(volume), 6) AS total_volume,
       count(*)::BIGINT AS n_ticks
FROM ({PRICE_BASE_SQL}) p
GROUP BY coin_id, exchange, date_trunc('hour', timestamp)""",
    # full-row streaming dedup over a feed with planted re-deliveries
    # emits exactly DISTINCT(feed): copies are bit-identical, so which
    # one survives is unobservable (see pipeline.dedup_stream_replay)
    "dedup_stream_replay": f"""
SELECT DISTINCT coin_id, exchange, timestamp, price, volume
FROM ({PRICE_BASE_SQL}) p""",
    "bollinger_bands": f"""
WITH base AS ({PRICE_BASE_TB_SQL}),
w AS (
  SELECT coin_id, exchange, timestamp,
         count(price) OVER win AS c,
         round(avg(price) OVER win, 6) AS mid,
         round(stddev_samp(price) OVER win, 6) AS sd
  FROM base
  WINDOW win AS (PARTITION BY coin_id, exchange ORDER BY timestamp, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT coin_id, exchange, timestamp,
       CASE WHEN c = 20 THEN mid END AS bb_mid,
       CASE WHEN c = 20 THEN round(mid + 2.0 * sd, 6) END AS bb_upper,
       CASE WHEN c = 20 THEN round(mid - 2.0 * sd, 6) END AS bb_lower
FROM w""",
    "volume_cube": f"""
SELECT exchange, date_trunc('day', timestamp) AS day,
       round(sum(volume), 6) AS total_volume, count(*)::BIGINT AS n_ticks
FROM ({PRICE_BASE_SQL}) p
GROUP BY CUBE (exchange, day)""",
    "close_pivot": _with(
        PRICE_DATA_CTE, OHLC_CTE,
        select="""
  SELECT timestamp,
         round(avg(close) FILTER (WHERE exchange = 'click'), 6) AS click,
         round(avg(close) FILTER (WHERE exchange = 'error'), 6) AS error,
         round(avg(close) FILTER (WHERE exchange = 'purchase'), 6) AS purchase,
         round(avg(close) FILTER (WHERE exchange = 'signup'), 6) AS signup,
         round(avg(close) FILTER (WHERE exchange = 'view'), 6) AS view
  FROM ohlc_data GROUP BY timestamp""",
    ),
    "event_props_stats": """
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(CAST(props->>'k' AS BIGINT))::BIGINT AS sum_k,
       min(CAST(props->>'k' AS BIGINT))::BIGINT AS min_k,
       max(CAST(props->>'k' AS BIGINT))::BIGINT AS max_k
FROM events GROUP BY event_type""",
    "user_retention": """
WITH activity AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
c AS (SELECT *, min(day) OVER (PARTITION BY user_id) AS cohort_day
      FROM activity)
SELECT cohort_day::TIMESTAMP AS cohort_day,
       (day - cohort_day)::BIGINT AS day_offset,
       count(*)::BIGINT AS n_users
FROM c GROUP BY 1, 2""",
    "trading_sessions": f"""
WITH base AS ({PRICE_BASE_SQL}),
marked AS (
  SELECT *, CASE WHEN epoch(timestamp) - epoch(lag(timestamp) OVER w) >= 360*60
                 THEN 1 ELSE 0 END AS ns
  FROM base
  WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp)
),
ids AS (
  SELECT *, sum(ns) OVER (PARTITION BY coin_id, exchange ORDER BY timestamp
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT coin_id, exchange,
       min(timestamp) AS session_start,
       max(timestamp) + INTERVAL 360 MINUTES AS session_end,
       count(*)::BIGINT AS n_ticks,
       min(price) AS low,
       max(price) AS high
FROM ids GROUP BY coin_id, exchange, sid""",
    # PageRank in INTEGER FIXED-POINT (1e-9 grid): float formulations
    # diverge at per-round rounding boundaries (observed: one node's
    # round-2 sum fell on opposite sides of the grid in Spark vs DuckDB
    # and the flip cascaded); integer multiply/DIV/sum are bit-exact in
    # every engine. DuckDB // == Spark div for positive operands.
    # re-planned r7: binding cap=3 (scale-safe edge bound), replayed
    # by the same parameterized CTE stack as coin_pagerank_capped
    "exchange_influencers": f"""
WITH {_pagerank_ctes(3)},
pr AS (
  SELECT r3.id, r3.r / 1000000000.0 AS rank, coalesce(w.wdeg, 0)::BIGINT AS wdeg
  FROM r3 LEFT JOIN wdeg w ON r3.id = w.id
)
SELECT exchange, id, rank, wdeg, rk FROM (
  SELECT split_part(id, '_C', 1) AS exchange, id, rank, wdeg,
         row_number() OVER (PARTITION BY split_part(id, '_C', 1)
                            ORDER BY rank DESC, id) AS rk
  FROM pr) WHERE rk <= 3""",
    "jsonl_roundtrip": "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "csv_roundtrip": "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "orc_roundtrip": "SELECT doc_id, text, lang, source, n_chars FROM documents",
    # the increment plants both drop kinds (re-crawled priors under
    # +1e7 ids; second copies of (10k+1)th new docs under +2e7 ids) so
    # the hash pins the against-seen AND within-batch drop paths, not
    # just survive (r5 verdict item #5)
    "incremental_dedup_bloom": INCREMENTAL_DEDUP_SQL,
    # stream-static enrichment emits exactly the batch LEFT join of
    # feed x coins dim (stateless per-batch lookup; null-extended miss)
    "enrich_stream_replay": f"""
WITH base AS ({PRICE_BASE_SQL}),
{COINS_CTE.strip()}
SELECT b.coin_id, b.exchange, b.timestamp, b.price, b.volume,
       c.name, c.symbol
FROM base b LEFT JOIN coins c
  ON b.coin_id = c.id AND b.exchange = c.exchange""",
    # CMS replayed bit-exactly via the md5 position family; the two
    # contract booleans come out as actual comparisons, not literals —
    # the hash checks sketch VALUES
    "cms_frequencies": f"""
WITH base AS ({PRICE_BASE_SQL}),
keyed AS (SELECT coin_id AS key FROM base),
pos AS (
  SELECT key, s.seed,
         (('0x' || substr(md5(key || 's' || s.seed), 1, 8))::UBIGINT % 1024)::BIGINT AS col
  FROM keyed, (VALUES (0), (1), (2), (3)) s(seed)
),
grid AS (SELECT seed, col, count(*)::BIGINT AS n FROM pos GROUP BY seed, col),
total AS (SELECT sum(n) AS t FROM grid WHERE seed = 0),
exact AS (SELECT key, count(*)::BIGINT AS exact_n FROM keyed GROUP BY key),
probes AS (
  SELECT e.key, e.exact_n, s.seed,
         (('0x' || substr(md5(e.key || 's' || s.seed), 1, 8))::UBIGINT % 1024)::BIGINT AS col
  FROM exact e, (VALUES (0), (1), (2), (3)) s(seed)
),
est AS (
  SELECT p.key, p.exact_n, min(g.n) AS cms_n
  FROM probes p JOIN grid g ON p.seed = g.seed AND p.col = g.col
  GROUP BY p.key, p.exact_n
)
SELECT key, exact_n, cms_n,
       cms_n >= exact_n AS is_overestimate,
       cms_n <= exact_n + ceil(2.0 * t / 1024) AS within_bound
FROM est CROSS JOIN total""",
    # Morton interleave replayed as 32 shift/mask terms; cells are the
    # top 8 bits (zkey >> 24), so output is <=256 rows whatever the input
    "zorder_profile": f"""
WITH base AS ({PRICE_BASE_SQL}),
keyed AS (
  SELECT CAST(floor(price * 100) AS BIGINT) % 65536 AS a,
         -- floor, not CAST: epoch() is fractional and CAST rounds
         -- half-even while Spark's unix_timestamp truncates
         (CAST(floor(epoch(timestamp)) AS BIGINT) // 60) % 65536 AS b
  FROM base
),
z AS (SELECT a, b, ((((a >> 0) & 1) << 0) + (((b >> 0) & 1) << 1) + (((a >> 1) & 1) << 2) + (((b >> 1) & 1) << 3) + (((a >> 2) & 1) << 4) + (((b >> 2) & 1) << 5) + (((a >> 3) & 1) << 6) + (((b >> 3) & 1) << 7) + (((a >> 4) & 1) << 8) + (((b >> 4) & 1) << 9) + (((a >> 5) & 1) << 10) + (((b >> 5) & 1) << 11) + (((a >> 6) & 1) << 12) + (((b >> 6) & 1) << 13) + (((a >> 7) & 1) << 14) + (((b >> 7) & 1) << 15) + (((a >> 8) & 1) << 16) + (((b >> 8) & 1) << 17) + (((a >> 9) & 1) << 18) + (((b >> 9) & 1) << 19) + (((a >> 10) & 1) << 20) + (((b >> 10) & 1) << 21) + (((a >> 11) & 1) << 22) + (((b >> 11) & 1) << 23) + (((a >> 12) & 1) << 24) + (((b >> 12) & 1) << 25) + (((a >> 13) & 1) << 26) + (((b >> 13) & 1) << 27) + (((a >> 14) & 1) << 28) + (((b >> 14) & 1) << 29) + (((a >> 15) & 1) << 30) + (((b >> 15) & 1) << 31)) AS zkey FROM keyed)
SELECT zkey >> 24 AS cell, count(*)::BIGINT AS n_rows,
       min(a) AS a_min, max(a) AS a_max,
       min(b) AS b_min, max(b) AS b_max
FROM z GROUP BY zkey >> 24 ORDER BY cell""",
    "incremental_dedup": INCREMENTAL_DEDUP_SQL,
    # inner stream-stream join emits exactly the batch theta join; the
    # regexp guard mirrors the engine's empty-symbol drop
    "spread_stream_replay": f"""
WITH base AS ({PRICE_BASE_SQL}),
a AS (
  SELECT regexp_extract(coin_id, '_(C[0-9]+)$', 1) AS symbol,
         timestamp AS ts_a, price AS price_a
  FROM base WHERE exchange = 'view'
    AND regexp_extract(coin_id, '_(C[0-9]+)$', 1) <> ''
),
b AS (
  SELECT regexp_extract(coin_id, '_(C[0-9]+)$', 1) AS symbol,
         timestamp AS ts_b, price AS price_b
  FROM base WHERE exchange = 'click'
    AND regexp_extract(coin_id, '_(C[0-9]+)$', 1) <> ''
)
SELECT a.symbol, ts_a, price_a, ts_b, price_b,
       price_b - price_a AS spread
FROM a JOIN b ON a.symbol = b.symbol
 AND ts_b BETWEEN ts_a - INTERVAL 30 MINUTES
              AND ts_a + INTERVAL 30 MINUTES""",
    "volume_profile": f"""
WITH base AS ({PRICE_BASE_SQL}),
rng AS (
  SELECT coin_id, exchange, min(price) AS mn, max(price) AS mx
  FROM base GROUP BY coin_id, exchange
),
binned AS (
  SELECT b.coin_id, b.exchange, b.price, b.volume, r.mn, r.mx,
         CASE WHEN r.mx > r.mn
              THEN least(19, floor((b.price - r.mn) / (r.mx - r.mn) * 20))::INT
              ELSE 0 END AS bin
  FROM base b JOIN rng r USING (coin_id, exchange)
)
SELECT coin_id, exchange, bin,
       round(sum(volume), 6) AS bin_volume,
       count(*)::BIGINT AS n_ticks,
       round(any_value(mn) + bin * ((any_value(mx) - any_value(mn)) / 20), 6) AS bin_lo,
       round(any_value(mn) + (bin + 1) * ((any_value(mx) - any_value(mn)) / 20), 6) AS bin_hi
FROM binned GROUP BY coin_id, exchange, bin""",

    "bpe_vocab_k": _bpe_sql(rounds=3, k=40),
    "bpe_encode": _bpe_encode_sql(rounds=3),
    # trained-tokenizer packing: encode chain + pack cumsum, composed
    "bpe_pack": _bpe_pack_sql(rounds=3, budget=PACK_BUDGET),
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
    "forecast_backtest": f"""
WITH ticks AS ({PRICE_BASE_TB_SQL}),
lagged AS (
  SELECT coin_id, exchange, price,
         lag(price, 1)  OVER w AS f_naive,
         lag(price, 4) OVER w AS f_snaive
  FROM ticks
  WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp, event_id)
),
scored AS (
  SELECT * FROM lagged WHERE f_snaive IS NOT NULL AND abs(price) > 0
)
SELECT coin_id, exchange, count(*)::BIGINT AS n_evaluated,
       round(avg(abs(price - f_naive) / abs(price)), 6) AS mape_naive,
       round(avg(abs(price - f_snaive) / abs(price)), 6) AS mape_snaive,
       round(avg(abs(price - f_naive) / abs(price)), 6)
         <= round(avg(abs(price - f_snaive) / abs(price)), 6) AS naive_wins
FROM scored GROUP BY coin_id, exchange""",
    "price_anomalies": _with(
        PRICE_DATA_CTE,
        select="""
, base AS (
  SELECT coin_id, exchange, timestamp, change_1h AS value
  FROM price_data WHERE change_1h IS NOT NULL
),
med AS (
  SELECT coin_id, exchange, quantile_cont(value, 0.5) AS med
  FROM base GROUP BY coin_id, exchange
),
mad AS (
  SELECT b.coin_id, b.exchange,
         quantile_cont(abs(b.value - m.med), 0.5) AS mad
  FROM base b JOIN med m USING (coin_id, exchange)
  GROUP BY b.coin_id, b.exchange
)
SELECT b.coin_id, b.exchange, b.timestamp, b.value,
       CASE WHEN d.mad > 0
            THEN round(0.6745 * (b.value - m.med) / d.mad, 6) END AS robust_z,
       coalesce(CASE WHEN d.mad > 0
            THEN abs(round(0.6745 * (b.value - m.med) / d.mad, 6)) > 3.5 END,
            FALSE) AS is_anomaly
FROM base b JOIN med m USING (coin_id, exchange)
            JOIN mad d USING (coin_id, exchange)""",
    ),
    "coin_pagerank": f"""
WITH {PAGERANK_CTES}
SELECT r3.id, r3.r / 1000000000.0 AS rank, coalesce(w.wdeg, 0)::BIGINT AS wdeg
FROM r3 LEFT JOIN wdeg w ON r3.id = w.id""",
    # scale-safe twin: the max_per_bucket guard BINDS (cap=3), bounding
    # edges to buckets * C(3,2) — the quadratic density term removed
    "coin_pagerank_capped": f"""
WITH {_pagerank_ctes(3)}
SELECT r3.id, r3.r / 1000000000.0 AS rank, coalesce(w.wdeg, 0)::BIGINT AS wdeg
FROM r3 LEFT JOIN wdeg w ON r3.id = w.id""",
    "session_stream_replay": f"""
WITH base AS ({PRICE_BASE_SQL}),
marked AS (
  SELECT *, CASE WHEN epoch(timestamp) - epoch(lag(timestamp) OVER w) >= 360*60
                 THEN 1 ELSE 0 END AS ns
  FROM base
  WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp)
),
ids AS (
  SELECT *, sum(ns) OVER (PARTITION BY coin_id, exchange ORDER BY timestamp
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT coin_id, exchange,
       min(timestamp) AS session_start,
       max(timestamp) + INTERVAL 360 MINUTES AS session_end,
       count(*)::BIGINT AS n_ticks,
       min(price) AS low,
       max(price) AS high
FROM ids GROUP BY coin_id, exchange, sid""",
    "session_range_join": f"""
WITH base AS ({PRICE_BASE_SQL}),
top1 AS (SELECT coin_id FROM base GROUP BY coin_id
         ORDER BY sum(volume) DESC, coin_id LIMIT 1),
mover AS (SELECT b.* FROM base b JOIN top1 USING (coin_id)),
marked AS (
  SELECT *, CASE WHEN epoch(timestamp) - epoch(lag(timestamp) OVER w) >= 360*60
                 THEN 1 ELSE 0 END AS ns
  FROM mover
  WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp)
),
ids AS (
  SELECT *, sum(ns) OVER (PARTITION BY coin_id, exchange ORDER BY timestamp
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
),
sess AS (
  SELECT min(timestamp) AS session_start,
         max(timestamp) + INTERVAL 360 MINUTES AS session_end
  FROM ids GROUP BY coin_id, exchange, sid
)
SELECT s.session_start, s.session_end,
       count(*)::BIGINT AS n_ticks,
       count(DISTINCT t.coin_id)::BIGINT AS n_coins,
       round(sum(t.volume), 6) AS total_volume
FROM base t JOIN sess s
  ON t.timestamp >= s.session_start AND t.timestamp < s.session_end
GROUP BY s.session_start, s.session_end""",
    "price_correlation": f"""
WITH base AS ({PRICE_BASE_SQL}),
top AS (SELECT coin_id FROM base GROUP BY coin_id
        ORDER BY sum(volume) DESC, coin_id LIMIT 20),
candles AS (
  SELECT coin_id, date_trunc('day', timestamp) AS ts,
         (max({{'t': timestamp, 'p': price}})).p AS close
  FROM base JOIN top USING (coin_id)
  GROUP BY coin_id, date_trunc('day', timestamp)
)
SELECT a.coin_id AS coin_a, b.coin_id AS coin_b,
       count(*)::BIGINT AS n_obs,
       round(corr(a.close, b.close), 7) AS correlation
FROM candles a JOIN candles b ON a.ts = b.ts AND a.coin_id < b.coin_id
GROUP BY a.coin_id, b.coin_id
HAVING count(*) >= 5""",
    "momentum_ranks": _with(
        PRICE_DATA_CTE,
        select="""
, latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY coin_id, exchange
                                 ORDER BY timestamp DESC, change_1h DESC) AS lrn
    FROM price_data) WHERE lrn = 1 AND change_1h IS NOT NULL
)
SELECT exchange, coin_id, change_1h,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4)     OVER w AS quartile,
       lead(coin_id, 1) OVER w AS next_coin
FROM latest
WINDOW w AS (PARTITION BY exchange ORDER BY change_1h DESC, coin_id)""",
    ),
    "revenue_by_nation": """
SELECT n_name AS nation,
       sum(l_extendedprice * (1 - l_discount)) AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name""",
    "top_suppliers": """
SELECT s_suppkey, s_name, shipped_value FROM (
  SELECT l_suppkey AS s_suppkey, sum(l_extendedprice * l_quantity) AS shipped_value
  FROM lineitem GROUP BY l_suppkey) v
JOIN (SELECT s_suppkey AS sk, s_name FROM supplier) s ON s_suppkey = sk
ORDER BY shipped_value DESC, s_suppkey
LIMIT 10""",
    # Okapi BM25, Lucene non-negative idf ln(1 + (N-df+.5)/(df+.5));
    # expression shapes mirror text.bm25_scores term-for-term (ln, not
    # log10; 2.2 = k1+1; 0.25 = 1-b) so doubles agree to ~1e-14, far
    # under the round-6 grid
    "bm25_scores": _BM25_SQL,
    # DSIR hashed-unigram importance weights: bucket = first 32 bits of
    # md5('dsir' || token) mod 256 (sampling.hash_bucket idiom), add-1
    # smoothing over the 256 cells, target = lang='en' occurrences
    "dsir_weights": f"""{DSIR_SCORED_CTES}
SELECT doc_id, n_tokens, log_weight, log_weight > 0 AS target_like FROM scored""",
    # importance RESAMPLING: the weights chain + deterministic Gumbel
    # top-k (noise from the md5 bucket of doc_id, the hash_bucket
    # idiom) — ORDER BY ... LIMIT replays the engine's TakeOrdered
    "dsir_sample": f"""{DSIR_SCORED_CTES},
g AS (
  SELECT doc_id, n_tokens, log_weight,
         round(log_weight
               + -ln(-ln((('0x' || substr(md5('gumbel' || doc_id::VARCHAR), 1, 8))::BIGINT
                          + 0.5) / 4294967296)), 6) AS gumbel_key
  FROM scored
)
SELECT doc_id, n_tokens, log_weight, gumbel_key FROM g
ORDER BY gumbel_key DESC, doc_id LIMIT 200""",
    # Six-format dispatch: each arm replays the single-format corpus
    # oracle (ppm/png/bmp share the (d + k*i) % 256 pattern; gif goes
    # through the palette index j; jpeg is DC-only block means; wav is
    # the int16 sample formula), routed by doc_id % 6; the raw-text
    # slice comes back 'unknown' with NULL features
    "media_features_auto": """
WITH base AS (SELECT doc_id FROM documents),
imgd AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
         FROM base WHERE doc_id % 6 IN (0, 1, 2)),
rgbpx AS (SELECT doc_id, w, h, unnest(generate_series(0, w * h - 1)) AS i FROM imgd),
rgb AS (
  SELECT doc_id,
         CASE doc_id % 6 WHEN 0 THEN 'ppm' WHEN 1 THEN 'png' ELSE 'bmp' END AS fmt,
         w::INT AS width, h::INT AS height, (w * h)::BIGINT AS n_pixels,
         round(avg((doc_id + i) % 256), 6) AS mean_0,
         round(avg((doc_id + 2 * i) % 256), 6) AS mean_1,
         round(avg((doc_id + 3 * i) % 256), 6) AS mean_2
  FROM rgbpx GROUP BY doc_id, w, h
),
gifd AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
         FROM base WHERE doc_id % 6 = 3),
gifpx AS (
  SELECT doc_id, w, h, (doc_id + unnest(generate_series(0, w * h - 1))) % 256 AS j
  FROM gifd
),
gif AS (
  SELECT doc_id, 'gif' AS fmt, w::INT AS width, h::INT AS height,
         (w * h)::BIGINT AS n_pixels,
         round(avg(j), 6) AS mean_0,
         round(avg((2 * j) % 256), 6) AS mean_1,
         round(avg((3 * j) % 256), 6) AS mean_2
  FROM gifpx GROUP BY doc_id, w, h
),
jpgd AS (SELECT doc_id, 8 * (1 + doc_id % 3) AS w, 8 * (1 + doc_id % 2) AS h
         FROM base WHERE doc_id % 6 = 4),
jpgb AS (
  SELECT doc_id, w, h, unnest(generate_series(0, (w // 8) * (h // 8) - 1)) AS b
  FROM jpgd
),
jpg AS (
  SELECT doc_id, 'jpeg' AS fmt, w::INT AS width, h::INT AS height,
         (w * h)::BIGINT AS n_pixels,
         round(avg((doc_id + 7 * b) % 256), 6) AS mean_0,
         round(avg((doc_id + 7 * b) % 256), 6) AS mean_1,
         round(avg((doc_id + 7 * b) % 256), 6) AS mean_2
  FROM jpgb GROUP BY doc_id, w, h
),
wavd AS (SELECT doc_id, 1 + doc_id % 2 AS c, 64 + doc_id % 129 AS n
         FROM base WHERE doc_id % 6 = 5),
wi AS (SELECT doc_id, c, unnest(generate_series(0, n - 1)) AS i FROM wavd),
ws AS (SELECT doc_id, i, unnest(generate_series(0, c - 1)) AS ch FROM wi),
wv AS (SELECT doc_id, (doc_id * 31 + i * 17 + ch * 7919) % 65536 - 32768 AS v FROM ws),
wav AS (
  SELECT doc_id, 'wav' AS fmt, NULL::INT AS width, NULL::INT AS height,
         count(*)::BIGINT AS n_pixels,
         round(sum(v) / count(*), 6) AS mean_0,
         round(sqrt(sum(v * v) / count(*)), 6) AS mean_1,
         NULL::DOUBLE AS mean_2
  FROM wv GROUP BY doc_id
),
unk AS (
  SELECT doc_id + 1000000 AS doc_id, 'unknown' AS fmt, NULL::INT AS width,
         NULL::INT AS height, NULL::BIGINT AS n_pixels, NULL::DOUBLE AS mean_0,
         NULL::DOUBLE AS mean_1, NULL::DOUBLE AS mean_2
  FROM base WHERE doc_id % 97 = 3
)
SELECT * FROM rgb UNION ALL SELECT * FROM gif UNION ALL SELECT * FROM jpg
UNION ALL SELECT * FROM wav UNION ALL SELECT * FROM unk""",
    # 8 ms windows over the closed-form int16 samples: 64 frames per
    # window at 8 kHz, trailing partial window kept; sums are exact
    # int64, rms derives with one IEEE divide+sqrt
    "media_frames_real": """
WITH d AS (SELECT doc_id, 1 + doc_id % 2 AS c, 64 + doc_id % 129 AS n FROM documents),
wi AS (SELECT doc_id, c, unnest(generate_series(0, n - 1)) AS i FROM d),
ws AS (SELECT doc_id, i, unnest(generate_series(0, c - 1)) AS ch FROM wi),
wv AS (
  SELECT doc_id, i // 64 AS frame_idx,
         (doc_id * 31 + i * 17 + ch * 7919) % 65536 - 32768 AS v
  FROM ws
),
agg AS (
  SELECT doc_id, frame_idx, count(*)::BIGINT AS n_samples,
         sum(v)::BIGINT AS sum_amp, sum(v * v)::BIGINT AS sum_sq
  FROM wv GROUP BY doc_id, frame_idx
)
SELECT doc_id, frame_idx::INT AS frame_idx,
       frame_idx * CAST(0.008 AS DOUBLE) AS frame_ts,
       n_samples, sum_amp, sum_sq,
       round(sqrt(sum_sq / n_samples), 6) AS rms
FROM agg""",
    # RRF fusion of the BM25 replay (shared _BM25_SQL, nested WITH) and
    # the brute-cosine arm (list_dot_product idiom of the knn oracles);
    # ranks are row_number over (score DESC, id) AFTER each arm's
    # LIMIT 50, mirroring the engine's post-TakeOrdered rank window
    "hybrid_retrieval_rrf": f"""
WITH lex_all AS ({_BM25_SQL}),
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
  FROM (SELECT * FROM lex_all ORDER BY bm25 DESC, doc_id LIMIT 50)
),
emb AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb FROM embeddings),
probe AS (SELECT emb AS probe_emb FROM emb WHERE vec_id = 0),
cos AS (
  SELECT vec_id,
         list_dot_product(probe_emb, emb)
         / (sqrt(list_dot_product(probe_emb, probe_emb)) * sqrt(list_dot_product(emb, emb))) AS cosine
  FROM emb, probe WHERE vec_id <> 0
),
vec AS (
  SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id) AS vec_rank
  FROM (SELECT * FROM cos ORDER BY cosine DESC, vec_id LIMIT 50)
),
f AS (
  SELECT coalesce(l.doc_id, v.vec_id) AS doc_id, l.lex_rank, v.vec_rank
  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.vec_id
)
SELECT doc_id, lex_rank::INT AS lex_rank, vec_rank::INT AS vec_rank,
       round(coalesce(1.0 / (60 + lex_rank), 0) + coalesce(1.0 / (60 + vec_rank), 0), 6)
         AS rrf_score
FROM f""",
    # blocked fuzzy record linkage: normalized 24-char names + planted
    # edit-distance-1 twins (substitution at char 13 — inside the name,
    # after the 8-char block prefix); block cap and length prefilter
    # replayed; DuckDB's levenshtein is the same classic edit distance
    # as Spark's
    "fuzzy_match_blocked": f"""
WITH norm AS (
  SELECT doc_id, trim(substr({NORM_TEXT_SQL}, 1, 24)) AS name
  FROM documents WHERE length({NORM_TEXT_SQL}) >= 24
),
corpus AS (
  SELECT doc_id, name FROM norm
  UNION ALL
  SELECT doc_id + 1000001,
         substr(name, 1, 12) || '#' || substr(name, 14)
  FROM norm WHERE doc_id % 7 = 3
),
blocked AS (
  SELECT doc_id, name, substr(name, 1, 8) AS blk, length(name) AS ln
  FROM corpus
),
keep AS (
  SELECT b.* FROM blocked b
  JOIN (SELECT blk FROM blocked GROUP BY blk HAVING count(*) <= 200) s
    USING (blk)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       levenshtein(a.name, b.name)::INT AS edit_dist
FROM keep a JOIN keep b
  ON a.blk = b.blk AND a.doc_id < b.doc_id AND abs(a.ln - b.ln) <= 2
WHERE levenshtein(a.name, b.name) <= 2""",
    # multi-pass blocked fuzzy linkage: the single-pass corpus + a
    # second twin family mutated INSIDE the prefix (char 3) + a
    # token-REORDER pair family ("t1 t2" / "t2 t1" from md5(doc_id),
    # <= 4 edits apart); prefix pass UNION last-8 suffix pass UNION
    # sorted-token pass, max_dist=4, distinct — each pass replays the
    # blocked CTE shape above under its own key
    "fuzzy_match_multipass": f"""
WITH norm AS (
  SELECT doc_id, trim(substr({NORM_TEXT_SQL}, 1, 24)) AS name
  FROM documents WHERE length({NORM_TEXT_SQL}) >= 24
),
corpus AS (
  SELECT doc_id, name FROM norm
  UNION ALL
  SELECT doc_id + 1000001,
         substr(name, 1, 12) || '#' || substr(name, 14)
  FROM norm WHERE doc_id % 7 = 3
  UNION ALL
  SELECT doc_id + 2000002,
         substr(name, 1, 2) || '#' || substr(name, 4)
  FROM norm WHERE doc_id % 7 = 5
  UNION ALL
  SELECT doc_id + 3000003,
         substr(md5(doc_id::VARCHAR), 1, 2) || ' ' || substr(md5(doc_id::VARCHAR), 3, 2)
  FROM norm WHERE doc_id % 7 = 1
  UNION ALL
  SELECT doc_id + 4000004,
         substr(md5(doc_id::VARCHAR), 3, 2) || ' ' || substr(md5(doc_id::VARCHAR), 1, 2)
  FROM norm WHERE doc_id % 7 = 1
),
pre AS (
  SELECT doc_id, name, substr(name, 1, 8) AS blk, length(name) AS ln
  FROM corpus
),
suf AS (
  SELECT doc_id, name, right(name, 8) AS blk, length(name) AS ln
  FROM corpus
),
tok AS (
  SELECT doc_id, name,
         array_to_string(list_sort(string_split(name, ' ')), ' ') AS blk,
         length(name) AS ln
  FROM corpus
),
keep_pre AS (
  SELECT b.* FROM pre b
  JOIN (SELECT blk FROM pre GROUP BY blk HAVING count(*) <= 200) s
    USING (blk)
),
keep_suf AS (
  SELECT b.* FROM suf b
  JOIN (SELECT blk FROM suf GROUP BY blk HAVING count(*) <= 200) s
    USING (blk)
),
keep_tok AS (
  SELECT b.* FROM tok b
  JOIN (SELECT blk FROM tok GROUP BY blk HAVING count(*) <= 200) s
    USING (blk)
)
SELECT DISTINCT id_a, id_b, edit_dist FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         levenshtein(a.name, b.name)::INT AS edit_dist
  FROM keep_pre a JOIN keep_pre b
    ON a.blk = b.blk AND a.doc_id < b.doc_id AND abs(a.ln - b.ln) <= 4
  WHERE levenshtein(a.name, b.name) <= 4
  UNION ALL
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         levenshtein(a.name, b.name)::INT AS edit_dist
  FROM keep_suf a JOIN keep_suf b
    ON a.blk = b.blk AND a.doc_id < b.doc_id AND abs(a.ln - b.ln) <= 4
  WHERE levenshtein(a.name, b.name) <= 4
  UNION ALL
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         levenshtein(a.name, b.name)::INT AS edit_dist
  FROM keep_tok a JOIN keep_tok b
    ON a.blk = b.blk AND a.doc_id < b.doc_id AND abs(a.ln - b.ln) <= 4
  WHERE levenshtein(a.name, b.name) <= 4
)""",
    # power-iteration PCA: generated, mirrored expression-for-expression
    "pca_top_component": _pca_sql(dim=16, iters=12),
    # ABTT residuals: same generated walk + rounded-pc1 subtraction
    "pca_residual": _pca_residual_sql(dim=16, iters=12),
    # quality-aware survivorship: clusters (recursive CTE) x quality
    "quality_survivors": f"""
WITH RECURSIVE {CAPPED_PAIRS_CTES},
edges AS (
  SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
  UNION ALL
  SELECT doc_id_b AS a, doc_id_a AS b FROM pairs
),
reach(node, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r
),
clusters AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
stats AS ({TEXT_STATS_SQL}),
q AS (
  SELECT doc_id,
         (CASE WHEN n_words BETWEEN 20 AND 2000 THEN 0.4 ELSE 0.0 END
          + CASE WHEN avg_word_len BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END
          + CASE WHEN stopword_ratio >= 0.05 THEN 0.3 ELSE 0.0 END) AS quality
  FROM stats
),
ranked AS (
  SELECT c.cluster_id, c.doc_id, q.quality,
         count(*) OVER (PARTITION BY c.cluster_id) AS n_members,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.quality DESC, c.doc_id) AS rn
  FROM clusters c JOIN q ON c.doc_id = q.doc_id
)
SELECT cluster_id, doc_id AS survivor_id, quality AS survivor_quality,
       n_members
FROM ranked WHERE rn = 1""",
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
         (CASE WHEN n_words BETWEEN 20 AND 2000 THEN 0.4 ELSE 0.0 END
          + CASE WHEN avg_word_len BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END
          + CASE WHEN stopword_ratio >= 0.05 THEN 0.3 ELSE 0.0 END) AS score,
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
    # TPC-H Q18: aggregate-as-join-filter
    "large_volume_customers": """
WITH qty AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM qty
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey""",
    # color JPEG: neutral-chroma corpus makes the lossy color format
    # exactly decodable — channel means = luma block average
    "media_decode_jpeg_color": """
WITH d AS (SELECT doc_id, 16 * (1 + doc_id % 2) AS w, 16 AS h FROM documents),
blk AS (
  SELECT doc_id, w, h,
         unnest(generate_series(0, (w // 8) * (h // 8) - 1)) AS b
  FROM d
),
m AS (
  SELECT doc_id, w, h, round(avg((doc_id + 7 * b) % 256), 6) AS mg
  FROM blk GROUP BY doc_id, w, h
)
SELECT doc_id, w::INT AS width, h::INT AS height, (w * h)::BIGINT AS n_pixels,
       mg AS mean_r, mg AS mean_g, mg AS mean_b
FROM m""",
    # incremental IVF: from-scratch oracle over the union pins
    # append == full reindex (assignment is per-row deterministic)
    "knn_ivf_append": _knn_ivf_sql(
        cent_where="vec_id < 32",
        base_sql=(
            "SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings"
            " UNION ALL SELECT vec_id + 1000000, embedding::DOUBLE[]"
            " FROM embeddings WHERE vec_id % 25 = 0"
        ),
    ),
    # stream-stream LEFT OUTER replay: batch left theta join — matched
    # pairs per match, unmatched left ticks exactly once, null-extended
    "spread_outer_stream_replay": f"""
WITH base AS ({PRICE_BASE_SQL}),
a AS (
  SELECT regexp_extract(coin_id, '_(C[0-9]+)$', 1) AS symbol,
         timestamp AS ts_a, price AS price_a
  FROM base WHERE exchange = 'view'
    AND regexp_extract(coin_id, '_(C[0-9]+)$', 1) <> ''
),
b AS (
  SELECT regexp_extract(coin_id, '_(C[0-9]+)$', 1) AS symbol,
         timestamp AS ts_b, price AS price_b
  FROM base WHERE exchange = 'click'
    AND regexp_extract(coin_id, '_(C[0-9]+)$', 1) <> ''
)
SELECT a.symbol, ts_a, price_a, ts_b, price_b,
       price_b - price_a AS spread
FROM a LEFT JOIN b ON a.symbol = b.symbol
 AND ts_b BETWEEN ts_a - INTERVAL 30 MINUTES
              AND ts_a + INTERVAL 30 MINUTES""",
    # custom-stateful streaming replay: bit-exact window replay of the
    # running peak / drawdown / tick counter the stateful operator
    # carries across micro-batches — batching must not change anything
    "drawdown_stream_replay": f"""
WITH base AS ({PRICE_BASE_TB_SQL})
SELECT coin_id, exchange, timestamp, event_id, price,
       max(price) OVER w AS running_peak,
       price / max(price) OVER w - 1.0 AS drawdown,
       row_number() OVER (PARTITION BY coin_id, exchange
                          ORDER BY timestamp, event_id) AS tick_n
FROM base
WINDOW w AS (PARTITION BY coin_id, exchange ORDER BY timestamp, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    # log-round CC on the chain-planted graph: reachability replay
    "dup_clusters_star": """
WITH RECURSIVE base AS (SELECT doc_id FROM documents),
pairs AS (
  SELECT doc_id AS a, doc_id + 1 AS b FROM base WHERE doc_id % 64 <> 63
  UNION ALL
  SELECT doc_id AS a, doc_id + 96 AS b FROM base WHERE doc_id % 128 = 0
),
edges AS (
  SELECT a, b FROM pairs
  UNION ALL
  SELECT b, a FROM pairs
),
reach(node, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r
)
SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node""",
}

# ---------------------------------------------------------------------------
# Teaching-form demotion pre-positioning (r8 verdict item #5 /
# NOTES_r08 §7). These ten registrations are LABELED TEACHING FORMS —
# each documents a measured scale defect next to its scale-safe twin
# (e.g. coin_pagerank uncapped vs coin_pagerank_capped). Policy: they
# STAY registered until the written trigger fires (~200 queries in the
# registry OR the full sf0.01 sweep exceeds ~30 min); when it does,
# flip DEMOTE_TEACHING_FORMS to True — the forms leave QUERIES/ORACLES
# (and therefore the driver window, bench, and the main parity
# parametrization) but their (query fn, oracle SQL) pairs survive
# VERBATIM in TEACHING, which tests/test_oracle_parity.py re-checks at
# the driver's sf the moment they are demoted. One line, no evidence
# lost.
# ---------------------------------------------------------------------------
TEACHING_FORMS = [
    "knn_lsh",             # 4-plane LSH; scale twin knn_lsh_planes8
    "knn_brute",           # row-form brute cosine; twin knn_brute_vectorized
    "kmeans_centroids",    # modulus seeding; twin kmeans_centroids_fixed
    "coin_pagerank",       # uncapped edge build; twin coin_pagerank_capped
    "embedding_dup_pairs", # 4-bit bands; twin embedding_dup_wide
    "simhash_pairs",       # 64-bit narrow; twin simhash_pairs_wide
    "semantic_dedup",      # untrained, uncapped; twin semantic_dedup_capped
    "knn_ivf",             # %50-probe rule; twin knn_ivf_full_fixed
    "dup_clusters",        # min-label propagation; twin dup_clusters_star
    "incremental_dedup",   # exact anti-join; twin incremental_dedup_bloom
]
TEACHING: dict[str, tuple] = {
    k: (QUERIES[k], ORACLES[k]) for k in TEACHING_FORMS
}
# FLIPPED r10 (r9 verdict item #3): the trigger is met — 186
# registrations pre-demotion crosses the ~200 line during r10-r11,
# and the ten forms were the r9 verdict's entire perf-weak list.
# Their (query fn, oracle SQL) pairs survive VERBATIM in TEACHING and
# are value-checked at the driver's sf on every pytest run by
# test_teaching_form_matches_oracle_after_demotion (the previously
# dormant twin).
DEMOTE_TEACHING_FORMS = True
if DEMOTE_TEACHING_FORMS:
    for _k in TEACHING_FORMS:
        QUERIES.pop(_k)
        ORACLES.pop(_k)
