"""Multimodal queries: the from-scratch PPM/WAV/PNG/BMP/GIF/
JPEG decode rows, resize, frame extraction and feature stubs.

Split verbatim from plans/registry.py (r11 verdict item #2); the
facade registry module re-exports every name and asserts the
assembled surface is byte-identical to the pre-split snapshot.
"""

from __future__ import annotations

from ...operators import multimodal
from .common import _documents, _materialize_ctes

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

# DuckDB oracle SQL for this domain's registered queries —
# assembled (registration order restored) into plans.registry.ORACLES.
def q_media_dhash(spark, sf_dir):
    """Fixed-point perceptual dHash per image (multimodal.dhash_ppm
    over the real PPM decode): 64 bits as four 16-bit band columns,
    integer NN-sample + integer luma so the oracle replays the hash
    bit-exactly from ppm_table's closed-form pixels. One linear map
    pass — the fingerprint stage of media dedup (r12 verdict item #4).
    """
    return multimodal.dhash_ppm(
        multimodal.ppm_table(_documents(spark, sf_dir))
    )

def q_media_dup_clusters(spark, sf_dir):
    """Perceptual image dedup end-to-end
    (multimodal.perceptual_dup_clusters): dHash -> distinct-hash
    representatives (min doc_id + member count via ONE content-bounded
    groupBy) -> Hamming<=3 banded pair join over REPRESENTATIVES only
    (pigeonhole over the 4x16-bit bands; the raw image table never
    enters the quadratic stage — this fixture collapses 500 images to
    ~40 distinct hashes, real crawls repeat logos/thumbnails the same
    way) -> star connected components (O(log n) rounds,
    localCheckpoint-bounded lineage) -> every image labeled with its
    cluster minimum + cluster size. Oracle replays the same chain with
    a recursive reach CC over the OR-banded candidate set (identical
    pair set, deduped)."""
    return multimodal.perceptual_dup_clusters(
        multimodal.ppm_table(_documents(spark, sf_dir))
    )

# dHash replay from ppm_table's closed-form pixels: NN grid sample
# src = (g * size) // grid, integer luma 299R+587G+114B, bit k =
# gray(gx+1) > gray(gx) row-major, four 16-bit LSB-first bands —
# the exact integer chain of multimodal.dhash_ppm
_DHASH_CTES = """dims AS (
  SELECT doc_id, (4 + doc_id % 5)::BIGINT AS w, (3 + doc_id % 4)::BIGINT AS h
  FROM documents
),
grid AS (
  SELECT d.doc_id, d.w, d.h, gy.g::BIGINT AS gy, gx.g::BIGINT AS gx
  FROM dims d, range(8) gy(g), range(9) gx(g)
),
luma AS (
  SELECT doc_id, gy, gx,
         299 * ((doc_id + i) % 256) + 587 * ((doc_id + 2*i) % 256)
         + 114 * ((doc_id + 3*i) % 256) AS v
  FROM (SELECT doc_id, gy, gx,
               ((gy * h) // 8) * w + ((gx * w) // 9) AS i
        FROM grid)
),
bits AS (
  SELECT doc_id, k, bit FROM (
    SELECT doc_id, gy * 8 + gx AS k, gx,
           CASE WHEN lead(v) OVER (PARTITION BY doc_id, gy ORDER BY gx) > v
                THEN 1 ELSE 0 END AS bit
    FROM luma
  ) WHERE gx < 8
),
hashes AS (
  SELECT doc_id,
         sum(CASE WHEN k // 16 = 0 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band0,
         sum(CASE WHEN k // 16 = 1 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band1,
         sum(CASE WHEN k // 16 = 2 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band2,
         sum(CASE WHEN k // 16 = 3 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band3
  FROM bits GROUP BY doc_id
)"""

def q_media_ahash(spark, sf_dir):
    """dHash's sibling fingerprint (multimodal.ahash_ppm): each bit
    compares a grid cell against the GRID MEAN — integer-exact as
    64*gray > sum(grays), so the oracle replays every bit. Production
    media dedup runs both hash families and unions candidates; this
    registers the second family with the same band discipline
    (mid-r13)."""
    return multimodal.ahash_ppm(
        multimodal.ppm_table(_documents(spark, sf_dir))
    )

def q_media_dup_survivors(spark, sf_dir):
    """Survivorship over the perceptual clusters
    (multimodal.perceptual_dup_survivors): per cluster keep the
    highest-resolution copy (width*height from the decoded header),
    min doc_id on ties — the media twin of dedup_survivors, one row
    per cluster (mid-r13)."""
    return multimodal.perceptual_dup_survivors(
        multimodal.ppm_table(_documents(spark, sf_dir))
    )

# reps -> banded candidates -> recursive reach CC -> per-image labels:
# the shared cluster chain of the media_dup_clusters and
# media_dup_survivors oracles (appended after _DHASH_CTES)
_DUP_CLUSTER_CTES = """reps AS (
  SELECT band0, band1, band2, band3, min(doc_id) AS rep_id
  FROM hashes GROUP BY 1, 2, 3, 4
),
cand AS (
  SELECT a.rep_id AS ra, b.rep_id AS rb,
         bit_count(xor(a.band0, b.band0)) + bit_count(xor(a.band1, b.band1))
         + bit_count(xor(a.band2, b.band2)) + bit_count(xor(a.band3, b.band3)) AS hamming
  FROM reps a JOIN reps b
    ON a.rep_id < b.rep_id
   AND (a.band0 = b.band0 OR a.band1 = b.band1
        OR a.band2 = b.band2 OR a.band3 = b.band3)
),
pairs AS (SELECT ra, rb FROM cand WHERE hamming <= 3),
edges AS (SELECT ra AS a, rb AS b FROM pairs UNION SELECT rb, ra FROM pairs),
reach(node, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r
),
comp AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node),
replab AS (
  SELECT r.band0, r.band1, r.band2, r.band3,
         coalesce(c.cluster_id, r.rep_id) AS cluster_id
  FROM reps r LEFT JOIN comp c ON r.rep_id = c.node
),
labeled AS (
  SELECT h.doc_id, rl.cluster_id
  FROM hashes h JOIN replab rl USING (band0, band1, band2, band3)
)"""


# ---------------------------------------------------------------------------
# Prefixed perceptual-hash CTE generators: the dHash/aHash replay chains
# of _DHASH_CTES / the media_ahash literal, parameterized on a CTE-name
# prefix (so two families compose in ONE query without collisions), the
# corpus source, and the pixel SEED expression (ppm_table_seeded's
# planted-duplicate fixture keys pixels on doc_id % H). The r13 literals
# above stay byte-identical — these generators serve only the composed
# oracles registered from r14 on (media_dup_clusters_union,
# image_text_dup_agreement, curation_pipeline_v5).
# ---------------------------------------------------------------------------

def _phash_hash_ctes(
    p: str, kind: str, source: str = "documents", seed: str = "doc_id"
) -> str:
    """dims -> grid -> luma -> bits -> hashes for one hash family,
    every CTE name prefixed with ``p``. ``kind`` is 'dhash' (9-wide
    grid, right-neighbor compare) or 'ahash' (8x8 grid, grid-mean
    compare as 64*v > sum(v)); ``seed`` is the integer expression the
    closed-form pixels are keyed on (doc_id for ppm_table, doc_id % H
    for ppm_table_seeded)."""
    gx_n = 9 if kind == "dhash" else 8
    base = f"""{p}dims AS (
  SELECT doc_id, (4 + ({seed}) % 5)::BIGINT AS w, (3 + ({seed}) % 4)::BIGINT AS h,
         ({seed})::BIGINT AS sd
  FROM {source}
),
{p}grid AS (
  SELECT d.doc_id, d.w, d.h, d.sd, gy.g::BIGINT AS gy, gx.g::BIGINT AS gx
  FROM {p}dims d, range(8) gy(g), range({gx_n}) gx(g)
),
{p}luma AS (
  SELECT doc_id, gy, gx,
         299 * ((sd + i) % 256) + 587 * ((sd + 2*i) % 256)
         + 114 * ((sd + 3*i) % 256) AS v
  FROM (SELECT doc_id, sd, gy, gx,
               ((gy * h) // 8) * w + ((gx * w) // {gx_n}) AS i
        FROM {p}grid)
),"""
    if kind == "dhash":
        bits = f"""
{p}bits AS (
  SELECT doc_id, k, bit FROM (
    SELECT doc_id, gy * 8 + gx AS k, gx,
           CASE WHEN lead(v) OVER (PARTITION BY doc_id, gy ORDER BY gx) > v
                THEN 1 ELSE 0 END AS bit
    FROM {p}luma
  ) WHERE gx < 8
),"""
    else:
        bits = f"""
{p}tot AS (SELECT doc_id, sum(v) AS s FROM {p}luma GROUP BY doc_id),
{p}bits AS (
  SELECT l.doc_id, l.gy * 8 + l.gx AS k,
         CASE WHEN 64 * l.v > t.s THEN 1 ELSE 0 END AS bit
  FROM {p}luma l JOIN {p}tot t USING (doc_id)
),"""
    return base + bits + f"""
{p}hashes AS (
  SELECT doc_id,
         sum(CASE WHEN k // 16 = 0 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band0,
         sum(CASE WHEN k // 16 = 1 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band1,
         sum(CASE WHEN k // 16 = 2 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band2,
         sum(CASE WHEN k // 16 = 3 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band3
  FROM {p}bits GROUP BY doc_id
)"""


def _afp_hash_ctes(p: str, source: str = "documents") -> str:
    """{p}hashes for the AUDIO fingerprint family (afp_wav): the
    closed-form wav_table samples (int16 at (frame i, channel ch) =
    (d*31 + i*17 + ch*7919) % 65536 - 32768, n = 64 + d%129 frames,
    c = 1 + d%2 channels) mixed to an exact mono sum, squared-energy
    per 65 integer-assigned windows (empty tail windows count 0), 64
    contour bits e_{k+1} > e_k packed into the shared 4x16-bit band
    layout — so :func:`_phash_pair_ctes`/:func:`_phash_label_ctes`
    compose unchanged."""
    return f"""{p}adims AS (
  SELECT doc_id, (64 + doc_id % 129)::BIGINT AS n, (1 + doc_id % 2)::BIGINT AS c
  FROM {source}
),
{p}mono AS (
  SELECT d.doc_id, (i.g * 65) // d.n AS w,
         ((d.doc_id * 31 + i.g * 17) % 65536 - 32768)
         + CASE WHEN d.c = 2
                THEN (d.doc_id * 31 + i.g * 17 + 7919) % 65536 - 32768
                ELSE 0 END AS m
  FROM {p}adims d, range(192) i(g)
  WHERE i.g < d.n
),
{p}esum AS (
  SELECT doc_id, w, sum(m * m)::BIGINT AS e FROM {p}mono GROUP BY doc_id, w
),
{p}energy AS (
  SELECT d.doc_id, wg.g::BIGINT AS w, coalesce(s.e, 0)::BIGINT AS e
  FROM {p}adims d CROSS JOIN range(65) wg(g)
  LEFT JOIN {p}esum s ON s.doc_id = d.doc_id AND s.w = wg.g
),
{p}bits AS (
  SELECT doc_id, w AS k, bit FROM (
    SELECT doc_id, w,
           CASE WHEN lead(e) OVER (PARTITION BY doc_id ORDER BY w) > e
                THEN 1 ELSE 0 END AS bit
    FROM {p}energy
  ) WHERE w < 64
),
{p}hashes AS (
  SELECT doc_id,
         sum(CASE WHEN k // 16 = 0 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band0,
         sum(CASE WHEN k // 16 = 1 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band1,
         sum(CASE WHEN k // 16 = 2 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band2,
         sum(CASE WHEN k // 16 = 3 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band3
  FROM {p}bits GROUP BY doc_id
)"""


def _vfp_hash_ctes(p: str, source: str = "documents") -> str:
    """{p}hashes for the VIDEO fingerprint family (vfp_gif): replays
    gif_table_animated's closed-form frames (frame f's pixel i has
    palette index j = (d + 17f + i) % 256 against the (j, 2j%256,
    3j%256) palette, nf = 2 + d%3 frames) through the exact sampling
    chain — frame f_k = (k*(nf-1)) // 3 for k = 0..3, 4x5 NN grid
    (i = ((gy*h)//4)*w + (gx*w)//5), integer luma, right-neighbor
    gradient sign, band_k = frame k's 16 bits — so
    :func:`_phash_pair_ctes`/:func:`_phash_label_ctes` compose
    unchanged (the shared 4x16-bit band contract)."""
    return f"""{p}vdims AS (
  SELECT doc_id, (4 + doc_id % 5)::BIGINT AS w, (3 + doc_id % 4)::BIGINT AS h,
         (2 + doc_id % 3)::BIGINT AS nf
  FROM {source}
),
{p}vluma AS (
  SELECT doc_id, fk, gy, gx,
         299 * j + 587 * ((2 * j) % 256) + 114 * ((3 * j) % 256) AS v
  FROM (
    SELECT d.doc_id, fk.g::BIGINT AS fk, gy.g::BIGINT AS gy, gx.g::BIGINT AS gx,
           (d.doc_id + 17 * ((fk.g * (d.nf - 1)) // 3)
            + ((gy.g * d.h) // 4) * d.w + (gx.g * d.w) // 5) % 256 AS j
    FROM {p}vdims d, range(4) fk(g), range(4) gy(g), range(5) gx(g)
  )
),
{p}vbits AS (
  SELECT doc_id, fk * 16 + gy * 4 + gx AS k, bit FROM (
    SELECT doc_id, fk, gy, gx,
           CASE WHEN lead(v) OVER (PARTITION BY doc_id, fk, gy ORDER BY gx) > v
                THEN 1 ELSE 0 END AS bit
    FROM {p}vluma
  ) WHERE gx < 4
),
{p}hashes AS (
  SELECT doc_id,
         sum(CASE WHEN k // 16 = 0 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band0,
         sum(CASE WHEN k // 16 = 1 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band1,
         sum(CASE WHEN k // 16 = 2 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band2,
         sum(CASE WHEN k // 16 = 3 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band3
  FROM {p}vbits GROUP BY doc_id
)"""


def _phash_pair_ctes(p: str, max_hamming: int = 3) -> str:
    """reps -> cand -> pairs for one family (distinct-hash collapse,
    band-pigeonhole candidates, xor+bit_count verify) — the
    _DUP_CLUSTER_CTES head, prefixed."""
    return f"""{p}reps AS (
  SELECT band0, band1, band2, band3, min(doc_id) AS rep_id
  FROM {p}hashes GROUP BY 1, 2, 3, 4
),
{p}cand AS (
  SELECT a.rep_id AS ra, b.rep_id AS rb,
         bit_count(xor(a.band0, b.band0)) + bit_count(xor(a.band1, b.band1))
         + bit_count(xor(a.band2, b.band2)) + bit_count(xor(a.band3, b.band3)) AS hamming
  FROM {p}reps a JOIN {p}reps b
    ON a.rep_id < b.rep_id
   AND (a.band0 = b.band0 OR a.band1 = b.band1
        OR a.band2 = b.band2 OR a.band3 = b.band3)
),
{p}pairs AS (SELECT ra, rb FROM {p}cand WHERE hamming <= {max_hamming})"""


def _phash_label_ctes(
    p: str,
    edges_from: str | None = None,
    reps: str | None = None,
    hashes: str | None = None,
) -> str:
    """edges -> recursive reach -> comp -> replab -> labeled for one
    label pass — the _DUP_CLUSTER_CTES tail, prefixed.
    ``edges_from`` overrides the (ra, rb) pair CTE the edges read
    (default ``{p}pairs``); ``reps``/``hashes`` re-point the label
    joins (the union oracle labels through the d-family while its
    edges come from the union pair set)."""
    pairs = edges_from or f"{p}pairs"
    reps = reps or f"{p}reps"
    hashes = hashes or f"{p}hashes"
    return f"""{p}edges AS (SELECT ra AS a, rb AS b FROM {pairs} UNION SELECT rb, ra FROM {pairs}),
{p}reach(node, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM {p}edges) n
  UNION
  SELECT {p}reach.node, e.b FROM {p}reach JOIN {p}edges e ON e.a = {p}reach.r
),
{p}comp AS (SELECT node, min(r) AS cluster_id FROM {p}reach GROUP BY node),
{p}replab AS (
  SELECT r.band0, r.band1, r.band2, r.band3,
         coalesce(c.cluster_id, r.rep_id) AS cluster_id
  FROM {reps} r LEFT JOIN {p}comp c ON r.rep_id = c.node
),
{p}labeled AS (
  SELECT h.doc_id, rl.cluster_id
  FROM {hashes} h JOIN {p}replab rl USING (band0, band1, band2, band3)
)"""



def q_media_dup_clusters_union(spark, sf_dir):
    """Dual-family perceptual dedup
    (multimodal.perceptual_dup_clusters_union): dHash pairs UNION
    aHash pairs UNION (d-rep, a-rep) bridge edges -> ONE star-CC label
    set — the candidate-union posture NOTES_r13 documents as the
    production recall move (each family is robust to different
    distortions). max_hamming=1, tighter than the single-family
    queries' 3: unioning families raises candidate recall, so the
    per-family verify distance tightens to keep precision (at 3 this
    fixture chains into one near-global component; at 1 it keeps 42
    clusters at sf0.001). Per-family quadratic stages keep their
    per-family distinct-hash bounds; the bridges are linear. Oracle replays both
    band chains from the closed-form pixels and runs one recursive
    reach over the union edge set (r14, r13 verdict item #3)."""
    return multimodal.perceptual_dup_clusters_union(
        multimodal.ppm_table(_documents(spark, sf_dir)), max_hamming=1
    )

def q_image_text_dup_agreement(spark, sf_dir):
    """Paired text+image dedup over a PLANTED caption-image corpus
    (corpus.image_text_dup_agreement, r13 verdict item #4): captions
    'photo <g> of <g> item <g> style <v>' (g = doc_id//5,
    v = doc_id%3) make the text near-dup relation exactly same-5-block
    (6 3-shingles, 5 shared across style variants -> jaccard
    5/7 >= 0.5; distinct blocks share ZERO shingles — the block token
    sits in EVERY shingle, deliberately: a shingle shared corpus-wide
    would dominate many minhash positions and hash O(N) docs into the
    same LSH band buckets, turning the candidate join quadratic — the
    scale bug this fixture's first draft had at sf10); images are
    keyed
    (doc_id//7)*97 through multimodal.ppm_table_seeded (the *97
    scatter keeps adjacent blocks' pixel patterns apart), so
    same-image 7-blocks interleave the 5-block caption groups — BOTH
    disagreement families are planted (same caption/different image,
    same image/different caption) plus the lcm-35 overlap classes
    that agree in both. BLOCK keying is the scale-honest shape: dup
    GROUPS grow with the corpus while group size stays constant, so
    the pair relation is linear in N (fixed mod-K groups would grow
    it quadratically — the fixture itself would be the scale bug).
    The REAL MinHash-LSH and perceptual-cluster pipelines run
    end-to-end; output = every verified text pair with its
    image-agreement verdict + the three modality counts (image-only
    counted by label arithmetic, never by materializing intra-cluster
    pairs)."""
    from ...operators import corpus as corpus_ops
    from pyspark.sql import functions as F

    docs = _documents(spark, sf_dir)
    g = (F.col("doc_id") / 5).cast("long").cast("string")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.lit("photo "), g, F.lit(" of "), g, F.lit(" item "), g,
            F.lit(" style "), (F.col("doc_id") % 3).cast("string"),
        ).alias("text"),
    )
    media = multimodal.ppm_table_seeded(
        docs.withColumn("seed", (F.col("doc_id") / 7).cast("long") * 97), "seed"
    )
    return corpus_ops.image_text_dup_agreement(planted, media)


def _union_cluster_sql(max_hamming: int = 1) -> str:
    """Oracle for [[q_media_dup_clusters_union]]: both hash chains
    rendered from [[_phash_hash_ctes]]/[[_phash_pair_ctes]] with d_/a_
    prefixes, bridge edges joining each doc's two reps, one recursive
    reach over the union, labels through the d-family (either family
    gives the identical answer — the bridges put a doc's two reps in
    the same component). Multiply-referenced CTEs are AS MATERIALIZED
    (DuckDB inlines per reference — evaluate-once, code-review r14)."""
    sql = f"""
WITH RECURSIVE {_phash_hash_ctes("d_", "dhash")},
{_phash_pair_ctes("d_", max_hamming)},
{_phash_hash_ctes("a_", "ahash")},
{_phash_pair_ctes("a_", max_hamming)},
u_bridge AS (
  SELECT DISTINCT dr.rep_id AS ra, ar.rep_id AS rb
  FROM d_hashes dh
  JOIN a_hashes ah USING (doc_id)
  JOIN d_reps dr ON dh.band0 = dr.band0 AND dh.band1 = dr.band1
                AND dh.band2 = dr.band2 AND dh.band3 = dr.band3
  JOIN a_reps ar ON ah.band0 = ar.band0 AND ah.band1 = ar.band1
                AND ah.band2 = ar.band2 AND ah.band3 = ar.band3
  WHERE dr.rep_id <> ar.rep_id
),
u_pairs AS (
  SELECT ra, rb FROM d_pairs
  UNION SELECT ra, rb FROM a_pairs
  UNION SELECT ra, rb FROM u_bridge
),
{_phash_label_ctes("u_", edges_from="u_pairs", reps="d_reps", hashes="d_hashes")}
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id)::BIGINT AS n_members
FROM u_labeled"""
    return _materialize_ctes(
        sql,
        (
            "d_hashes", "a_hashes", "d_reps", "a_reps", "d_pairs",
            "a_pairs", "u_bridge", "u_pairs", "u_edges", "u_comp",
        ),
    )


def _image_text_agreement_sql() -> str:
    """Oracle for [[q_image_text_dup_agreement]]: the planted caption
    CTE feeds the md5-family MinHash parts ([[_minhash_lsh_parts]]
    re-pointed at it), the seeded dHash chain labels the images
    (seed = (doc_id // 7) * 97 replays ppm_table_seeded's pixels), and
    final select attaches the three modality counts — n_image_only
    from per-cluster C(m,2) label arithmetic minus n_both."""
    from .dedup import _minhash_lsh_parts

    mh_ctes, mh_select = _minhash_lsh_parts(source="pl")
    assert mh_ctes.startswith("WITH ")
    mh_ctes = mh_ctes[len("WITH ") :]
    sql = f"""
WITH RECURSIVE pl AS (
  SELECT doc_id,
         'photo ' || (doc_id // 5)::VARCHAR || ' of ' ||
         (doc_id // 5)::VARCHAR || ' item ' || (doc_id // 5)::VARCHAR ||
         ' style ' || (doc_id % 3)::VARCHAR AS text
  FROM documents
),
{mh_ctes},
tp AS (
{mh_select}
),
{_phash_hash_ctes("pi_", "dhash", seed="(doc_id // 7) * 97")},
{_phash_pair_ctes("pi_")},
{_phash_label_ctes("pi_")},
ann AS (
  SELECT t.doc_id_a, t.doc_id_b,
         coalesce(la.cluster_id = lb.cluster_id, false) AS image_agree
  FROM tp t
  LEFT JOIN pi_labeled la ON la.doc_id = t.doc_id_a
  LEFT JOIN pi_labeled lb ON lb.doc_id = t.doc_id_b
),
tc AS (
  SELECT sum(CASE WHEN image_agree THEN 1 ELSE 0 END)::BIGINT AS n_both,
         sum(CASE WHEN image_agree THEN 0 ELSE 1 END)::BIGINT AS n_text_only
  FROM ann
),
ip AS (
  SELECT sum(m * (m - 1) // 2)::BIGINT AS n_image_pairs
  FROM (SELECT cluster_id, count(*) AS m FROM pi_labeled GROUP BY cluster_id)
)
SELECT a.doc_id_a, a.doc_id_b, a.image_agree,
       c.n_both, c.n_text_only,
       (i.n_image_pairs - c.n_both)::BIGINT AS n_image_only
FROM ann a, tc c, ip i"""
    return _materialize_ctes(
        sql,
        (
            "sh", "sig", "bb", "cand", "tp", "pi_hashes", "pi_reps",
            "pi_pairs", "pi_edges", "pi_comp", "pi_labeled", "ann",
        ),
    )



def q_audio_fingerprint(spark, sf_dir):
    """Fixed-point perceptual AUDIO fingerprint (multimodal.afp_wav
    over the real RIFF/WAVE PCM16 decode): exact int64 mono mix ->
    squared-energy over 65 integer-assigned windows -> 64
    energy-contour sign bits in the shared 4x16-bit band layout —
    the audio member of the perceptual-hash family (Chromaprint
    posture made exactly computable). One mapInPandas, no shuffle;
    oracle replays every bit from wav_table's closed-form samples
    (late-r14)."""
    return multimodal.afp_wav(
        multimodal.wav_table(_documents(spark, sf_dir))
    )

def q_audio_dup_clusters(spark, sf_dir):
    """Perceptual AUDIO dedup end-to-end
    (multimodal.audio_dup_clusters): afp_wav fingerprints ->
    distinct-hash rep collapse + Hamming<=2 banded rep pairs (the
    image family's quadratic-stage bound, reused verbatim via
    _phash_rep_pairs) -> star CC -> per-clip cluster labels + sizes.
    The fixture collapses 500 clips to ~61 distinct fingerprints;
    max_hamming=2 keeps discriminating structure (7 rep pairs at
    sf0.001). Completes the modality set: text (MinHash/SimHash),
    image (dHash/aHash), audio (this) — one dedup discipline
    (late-r14)."""
    return multimodal.audio_dup_clusters(
        multimodal.wav_table(_documents(spark, sf_dir))
    )


def q_video_fingerprint(spark, sf_dir):
    """Fixed-point perceptual VIDEO fingerprint (multimodal.vfp_gif
    over the real animated-GIF decode — LZW codec + disposal
    compositing, not a header read): 4 timeline-sampled frames
    (f_k = (k*(nf-1))//3), each hashed to 16 gradient-sign bits over
    a 4x5 integer NN grid, band_k = frame k's hash — so the shared
    4x16-bit band pigeonhole means "agree exactly on >= 1 sampled
    frame". One mapInPandas, no shuffle; oracle replays every bit
    from gif_table_animated's closed-form frames (late-r14)."""
    return multimodal.vfp_gif(
        multimodal.gif_table_animated(_documents(spark, sf_dir))
    )

def q_video_dup_clusters(spark, sf_dir):
    """Perceptual VIDEO dedup end-to-end
    (multimodal.video_dup_clusters): vfp_gif fingerprints ->
    distinct-hash rep collapse + Hamming<=1 banded rep pairs (the
    image/audio quadratic-stage bound via _phash_rep_pairs) -> star
    CC -> per-clip cluster labels + sizes. max_hamming=1, tighter
    than the image family's 3: a 16-bit per-frame hash is coarse, so
    agreeing on a whole band is weak evidence and the verify distance
    tightens to keep precision (at 2 this fixture chains 500 clips
    into 9 clusters; at 1 it keeps 50 with 202 distinct fingerprints).
    Completes the perceptual family across all four payload
    modalities: text, image, audio, video (late-r14)."""
    return multimodal.video_dup_clusters(
        multimodal.gif_table_animated(_documents(spark, sf_dir)),
        max_hamming=1,
    )


def _video_cluster_sql(max_hamming: int = 1) -> str:
    """Oracle for [[q_video_dup_clusters]]: the vfp hash chain
    ([[_vfp_hash_ctes]]) composed with the SAME pair/label generators
    the image and audio oracles use — the band layout is the shared
    contract. Multiply-referenced CTEs are AS MATERIALIZED
    (evaluate-once)."""
    sql = f"""
WITH RECURSIVE {_vfp_hash_ctes("vf_")},
{_phash_pair_ctes("vf_", max_hamming)},
{_phash_label_ctes("vf_")}
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id)::BIGINT AS n_members
FROM vf_labeled"""
    return _materialize_ctes(
        sql,
        ("vf_hashes", "vf_reps", "vf_pairs", "vf_edges", "vf_comp", "vf_labeled"),
    )


def _audio_cluster_sql(max_hamming: int = 2) -> str:
    """Oracle for [[q_audio_dup_clusters]]: the afp hash chain
    ([[_afp_hash_ctes]]) composed with the SAME pair/label generators
    the image oracles use — the band layout is the shared contract.
    Multiply-referenced CTEs are AS MATERIALIZED (evaluate-once)."""
    sql = f"""
WITH RECURSIVE {_afp_hash_ctes("af_")},
{_phash_pair_ctes("af_", max_hamming)},
{_phash_label_ctes("af_")}
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id)::BIGINT AS n_members
FROM af_labeled"""
    return _materialize_ctes(
        sql,
        ("af_hashes", "af_reps", "af_pairs", "af_edges", "af_comp", "af_labeled"),
    )


def q_audio_dup_survivors(spark, sf_dir):
    """Survivorship over the perceptual AUDIO clusters
    (multimodal.audio_dup_survivors): per afp_wav cluster keep the
    LONGEST clip (n_frames from the WAV header — duration is the
    audio analogue of image resolution), min doc_id on ties; one row
    per cluster. The audio member of the survivorship family, through
    the shared rank window (multimodal._ranked_clusters)
    (late-r14)."""
    return multimodal.audio_dup_survivors(
        multimodal.wav_table(_documents(spark, sf_dir))
    )


def q_video_dup_survivors(spark, sf_dir):
    """Survivorship over the perceptual VIDEO clusters
    (multimodal.video_dup_survivors): per vfp_gif cluster keep the
    clip with the most CONTENT (frame volume n_frames*width*height),
    min doc_id on ties; one row per cluster. max_hamming=1 matches
    video_dup_clusters' registered radius. Completes survivorship
    across the modality set: text keep-first / image resolution /
    audio duration / video frame volume (late-r14)."""
    return multimodal.video_dup_survivors(
        multimodal.gif_table_animated(_documents(spark, sf_dir)),
        max_hamming=1,
    )


def q_multimodal_dedup_report(spark, sf_dir):
    """The perceptual-family capstone
    (multimodal.multimodal_dedup_report): ONE dedup report across all
    four payload modalities — text SimHash, image dHash, audio energy
    contour, video frame-sampled gradient — each through the
    IDENTICAL distinct-fingerprint -> Hamming-banded rep pairs ->
    star-CC chain (the shared 4x16-bit band contract), differing only
    in the fingerprint map pass. One row per modality: fingerprinted
    population, distinct fingerprints, clusters, docs in multi-member
    clusters, largest cluster — the dashboard a multimodal curation
    pipeline reads before choosing drop thresholds (late-r14)."""
    docs = _documents(spark, sf_dir)
    return multimodal.multimodal_dedup_report(
        docs,
        multimodal.ppm_table(docs),
        multimodal.wav_table(docs),
        multimodal.gif_table_animated(docs),
    )


def _audio_survivor_sql(max_hamming: int = 2) -> str:
    """Oracle for [[q_audio_dup_survivors]]: the afp cluster chain +
    the rank window over the closed-form header duration
    (n = 64 + doc_id % 129 from {p}adims)."""
    sql = f"""
WITH RECURSIVE {_afp_hash_ctes("af_")},
{_phash_pair_ctes("af_", max_hamming)},
{_phash_label_ctes("af_")},
af_sized AS (
  SELECT l.doc_id, l.cluster_id, d.n,
         count(*) OVER (PARTITION BY l.cluster_id) AS n_members,
         row_number() OVER (PARTITION BY l.cluster_id
                            ORDER BY d.n DESC, l.doc_id) AS rn
  FROM af_labeled l JOIN af_adims d USING (doc_id)
)
SELECT cluster_id, doc_id AS survivor_id, n::INT AS n_frames,
       n_members::BIGINT AS n_members
FROM af_sized WHERE rn = 1"""
    return _materialize_ctes(
        sql,
        ("af_hashes", "af_reps", "af_pairs", "af_edges",
         "af_comp", "af_labeled"),
    )


def _video_survivor_sql(max_hamming: int = 1) -> str:
    """Oracle for [[q_video_dup_survivors]]: the vfp cluster chain +
    the rank window over the closed-form frame volume
    (nf*w*h from {p}vdims)."""
    sql = f"""
WITH RECURSIVE {_vfp_hash_ctes("vf_")},
{_phash_pair_ctes("vf_", max_hamming)},
{_phash_label_ctes("vf_")},
vf_sized AS (
  SELECT l.doc_id, l.cluster_id, d.nf, d.w, d.h,
         count(*) OVER (PARTITION BY l.cluster_id) AS n_members,
         row_number() OVER (PARTITION BY l.cluster_id
                            ORDER BY d.nf * d.w * d.h DESC, l.doc_id) AS rn
  FROM vf_labeled l JOIN vf_vdims d USING (doc_id)
)
SELECT cluster_id, doc_id AS survivor_id, nf::INT AS n_frames,
       w::INT AS width, h::INT AS height, n_members::BIGINT AS n_members
FROM vf_sized WHERE rn = 1"""
    return _materialize_ctes(
        sql,
        ("vf_hashes", "vf_reps", "vf_pairs", "vf_edges",
         "vf_comp", "vf_labeled"),
    )


def _multimodal_report_sql() -> str:
    """Oracle for [[q_multimodal_dedup_report]]: FOUR modality chains
    side-by-side in one query — text via [[_simhash_hash_ctes]] (the
    md5-family SimHash reshaped to the shared band contract), image
    via [[_phash_hash_ctes]], audio via [[_afp_hash_ctes]], video via
    [[_vfp_hash_ctes]] — each composed with the SAME pair/label
    generators at its family's registered radius (text 3 / image 3 /
    audio 2 / video 1), then one aggregate row per modality,
    UNION ALL. Text runs the WIDE 128-bit SimHash
    (simhash_pairs_wide's scale-safe width — near-unique text
    fingerprints would make 16-bit band buckets quadratic at corpus
    scale). n_distinct_fp counts the rep table (= distinct band
    tuples); n_docs is the fingerprinted population (text counts docs
    with >= 3 words, the shingle floor)."""
    from .dedup import _simhash_hash_ctes

    chains = {
        "tx_": (_simhash_hash_ctes("tx_", n_bits=128), 3, "text"),
        "im_": (_phash_hash_ctes("im_", "dhash"), 3, "image"),
        "au_": (_afp_hash_ctes("au_"), 2, "audio"),
        "vd_": (_vfp_hash_ctes("vd_"), 1, "video"),
    }
    parts, selects, mat = [], [], []
    for p, (hash_ctes, mh, name) in chains.items():
        parts.append(f"""{hash_ctes},
{_phash_pair_ctes(p, mh)},
{_phash_label_ctes(p)},
{p}memb AS (
  SELECT doc_id, cluster_id,
         count(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM {p}labeled
),
{p}stats AS (
  SELECT count(*)::BIGINT AS n_docs,
         count(DISTINCT cluster_id)::BIGINT AS n_clusters,
         sum(CASE WHEN n_members > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
         max(n_members)::BIGINT AS max_cluster_size
  FROM {p}memb
),
{p}rep AS (SELECT count(*)::BIGINT AS n_distinct_fp FROM {p}reps)""")
        selects.append(
            f"SELECT '{name}' AS modality, s.n_docs, r.n_distinct_fp,"
            f" s.n_clusters, s.n_dup_docs, s.max_cluster_size"
            f" FROM {p}stats s, {p}rep r"
        )
        mat += [f"{p}hashes", f"{p}reps", f"{p}pairs", f"{p}edges",
                f"{p}comp", f"{p}labeled"]
    sql = "\nWITH RECURSIVE " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)
    return _materialize_ctes(sql, tuple(mat))


ORACLE_SQL: dict[str, str] = {
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
    "media_dhash": f"""
WITH {_DHASH_CTES}
SELECT doc_id, band0, band1, band2, band3 FROM hashes""",
    # candidate set: OR over band equalities = the union of the four
    # band-bucket joins the engine runs, deduped; recursive reach =
    # min reachable id per node = the star-CC component minimum
    "media_dup_clusters": f"""
WITH RECURSIVE {_DHASH_CTES},
{_DUP_CLUSTER_CTES}
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id)::BIGINT AS n_members
FROM labeled""",
    # aHash: same grid/luma/band layout as dHash, but bit = cell vs
    # grid mean, integer-exact as 64*v > sum(v)
    "media_ahash": f"""
WITH dims AS (
  SELECT doc_id, (4 + doc_id % 5)::BIGINT AS w, (3 + doc_id % 4)::BIGINT AS h
  FROM documents
),
grid AS (
  SELECT d.doc_id, d.w, d.h, gy.g::BIGINT AS gy, gx.g::BIGINT AS gx
  FROM dims d, range(8) gy(g), range(8) gx(g)
),
luma AS (
  SELECT doc_id, gy, gx,
         299 * ((doc_id + i) % 256) + 587 * ((doc_id + 2*i) % 256)
         + 114 * ((doc_id + 3*i) % 256) AS v
  FROM (SELECT doc_id, gy, gx,
               ((gy * h) // 8) * w + ((gx * w) // 8) AS i
        FROM grid)
),
tot AS (SELECT doc_id, sum(v) AS s FROM luma GROUP BY doc_id),
bits AS (
  SELECT l.doc_id, l.gy * 8 + l.gx AS k,
         CASE WHEN 64 * l.v > t.s THEN 1 ELSE 0 END AS bit
  FROM luma l JOIN tot t USING (doc_id)
),
hashes AS (
  SELECT doc_id,
         sum(CASE WHEN k // 16 = 0 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band0,
         sum(CASE WHEN k // 16 = 1 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band1,
         sum(CASE WHEN k // 16 = 2 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band2,
         sum(CASE WHEN k // 16 = 3 THEN bit << (k % 16) ELSE 0 END)::BIGINT AS band3
  FROM bits GROUP BY doc_id
)
SELECT doc_id, band0, band1, band2, band3 FROM hashes""",
    # survivorship: highest-resolution copy per cluster, min id on ties
    "media_dup_survivors": f"""
WITH RECURSIVE {_DHASH_CTES},
{_DUP_CLUSTER_CTES},
sized AS (
  SELECT l.doc_id, l.cluster_id, d.w, d.h,
         count(*) OVER (PARTITION BY l.cluster_id) AS n_members,
         row_number() OVER (PARTITION BY l.cluster_id
                            ORDER BY d.w * d.h DESC, l.doc_id) AS rn
  FROM labeled l JOIN dims d USING (doc_id)
)
SELECT cluster_id, doc_id AS survivor_id, w::INT AS width, h::INT AS height,
       n_members::BIGINT AS n_members
FROM sized WHERE rn = 1""",
    "media_dup_clusters_union": _union_cluster_sql(),
    "image_text_dup_agreement": _image_text_agreement_sql(),
    "audio_fingerprint": f"""
WITH {_afp_hash_ctes("af_")}
SELECT doc_id, band0, band1, band2, band3 FROM af_hashes""",
    "audio_dup_clusters": _audio_cluster_sql(),
    "video_fingerprint": f"""
WITH {_vfp_hash_ctes("vf_")}
SELECT doc_id, band0, band1, band2, band3 FROM vf_hashes""",
    "video_dup_clusters": _video_cluster_sql(),
    "audio_dup_survivors": _audio_survivor_sql(),
    "video_dup_survivors": _video_survivor_sql(),
    "multimodal_dedup_report": _multimodal_report_sql(),
}
