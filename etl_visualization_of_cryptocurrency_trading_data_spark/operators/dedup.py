"""Deduplication operators for LLM-data pipelines: exact, n-gram
Jaccard, MinHash+LSH, SimHash — over the ``documents`` table.

Scale design (the whole point — these must work at 100 TB):

- **exact_dedup**: group by a content hash, never by the raw text — the
  shuffle key is 16 bytes regardless of document size, and map-side
  partial aggregation collapses most duplicates before the exchange.
- **ngram_jaccard_pairs**: inverted-index join (explode shingles, join
  postings with doc_a < doc_b, count common shingles per pair), not an
  all-pairs cross join — cost is sum over shingles of df^2, not N^2.
  ``max_df`` drops ultra-frequent shingles (stopword-grams), the
  standard guard against posting-list blowup; leave None only at
  oracle scale.
- **minhash_lsh_pairs**: per-row signature via nested higher-order
  functions (no explode, no shuffle to build signatures), banded LSH
  bucket join to generate candidates, exact-Jaccard verification of
  candidates only. Hot buckets are bounded by the band hash width; the
  candidate join is doc_a < doc_b on bucket keys.
- **simhash_pairs**: 64-bit SimHash per row (again pure column
  expressions), near-dup candidates = equal 16-bit bands (Hamming<=3
  guarantee via pigeonhole across 4 bands), verified by true Hamming
  distance via xor+bit_count.

MinHash/SimHash use Spark's xxhash64 as the base hash family — not
reproducible in DuckDB SQL, so those two register rows-only oracle
checks; their quality/agreement with exact Jaccard is pinned by pytest
instead (tests/test_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized_text, word_shingles, words

# MinHash family: h_i(s) = xxhash64(i || '|' || s); K=64 hashes in B=16
# bands of R=4 rows. P(candidate | jaccard j) = 1-(1-j^R)^B — ~0.97 at
# j=0.7, ~1-5e-8 at j=0.9.
MINHASH_K = 64
LSH_BANDS = 16
LSH_ROWS = 4


def _with_shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    return documents.select(
        "doc_id", word_shingles(words(F.col("text")), n).alias("shingles")
    ).filter(F.size("shingles") > 0)


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact duplicate groups keyed by normalized-content hash.
    Returns one row per distinct content: the kept (minimum) doc_id and
    the group size. Filter ``n_docs > 1`` for the duplicates only."""
    return (
        documents.select(
            F.md5(normalized_text(F.col("text"))).alias("fingerprint"), "doc_id"
        )
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_docs"))
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs via inverted index.

    Emits (doc_id_a, doc_id_b, jaccard) for doc_id_a < doc_id_b with
    jaccard >= threshold. ``max_df`` (document-frequency cap per
    shingle) bounds posting-list join cost at scale.
    """
    sh = _with_shingles(documents, n)
    sizes = sh.select("doc_id", F.size("shingles").alias("n_shingles"))
    postings = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    if max_df is not None:
        df_counts = postings.groupBy("shingle").agg(F.count("*").alias("df"))
        postings = postings.join(
            df_counts.filter(F.col("df") <= max_df).select("shingle"), "shingle"
        )
    a = postings.alias("a")
    b = postings.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"doc_id": "doc_id_a", "n_shingles": "size_a"}), "doc_id_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_id_b", "n_shingles": "size_b"}), "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            (
                F.col("n_common").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(documents: DataFrame, n: int = 3, k: int = MINHASH_K) -> DataFrame:
    """K-wide MinHash signature per document, built entirely with
    column expressions (nested TRANSFORM + ARRAY_MIN over the shingle
    array) — no explode, no shuffle; cost is K*|shingles| JVM hash
    calls per row."""
    sh = _with_shingles(documents, n)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(
            F.transform(
                F.col("shingles"),
                lambda s: F.xxhash64(F.concat(i.cast("string"), F.lit("|"), s)),
            )
        ),
    )
    return sh.select("doc_id", "shingles", sig.alias("signature"))


def minhash_lsh_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, exact-Jaccard verified.

    signature -> B band keys (hash of R consecutive minhashes) ->
    bucket equi-join (doc_a < doc_b) -> distinct candidates -> exact
    Jaccard on the shingle sets -> threshold filter. Only candidates
    pay the set-intersection cost.
    """
    sigs = minhash_signatures(documents, n, bands * rows)
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda band: F.struct(
                    band.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.slice(F.col("signature"), band * rows + 1, rows))
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .distinct()
    )
    sh = sigs.select("doc_id", "shingles")
    verified = (
        candidates.join(sh.withColumnsRenamed({"doc_id": "doc_id_a", "shingles": "sh_a"}), "doc_id_a")
        .join(sh.withColumnsRenamed({"doc_id": "doc_id_b", "shingles": "sh_b"}), "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold)


def simhash(documents: DataFrame, n: int = 3) -> DataFrame:
    """64-bit SimHash per document from shingle hashes: bit j of the
    fingerprint is the sign of sum over shingles of (+1 if bit j of
    xxhash64(shingle) else -1). Pure column expressions."""
    sh = _with_shingles(documents, n)
    hashed = sh.select(
        "doc_id",
        F.transform(F.col("shingles"), lambda s: F.xxhash64(s)).alias("hs"),
    )
    bit = lambda j: F.when(  # noqa: E731
        F.aggregate(
            F.col("hs"),
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        > 0,
        F.lit(1).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    with_bits = hashed.select(
        "doc_id", F.array(*[bit(j) for j in range(64)]).alias("bits")
    )
    fp = F.lit(0).cast("long")
    for j in range(64):
        fp = fp.bitwiseOR(F.shiftleft(F.element_at(F.col("bits"), j + 1), j))
    return with_bits.select("doc_id", fp.alias("simhash"))


def simhash_pairs(documents: DataFrame, n: int = 3, max_hamming: int = 3) -> DataFrame:
    """SimHash near-duplicate pairs with Hamming distance <= max_hamming.

    Candidates via 4x16-bit band equality (pigeonhole: any pair within
    Hamming 3 of 64 bits agrees exactly on at least one 16-bit quarter),
    then verified with xor + bit_count.
    """
    fps = simhash(documents, n)
    banded = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.shiftright(F.col("simhash"), band * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for band in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
