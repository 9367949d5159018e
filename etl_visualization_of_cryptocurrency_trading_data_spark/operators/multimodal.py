"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

Six formats decode FOR REAL with no codec library — binary PPM, PNG
(stdlib zlib), 24-bit BMP, GIF (from-scratch LZW), baseline grayscale
JPEG, and RIFF/WAVE PCM16 — and :func:`sniff_media` dispatches a mixed
payload column to the right parser per row
(:func:`media_features_auto` / :func:`media_frames_real`). Formats
beyond these (MP4/MP3/color JPEG…) are the honest external-library
boundary: they surface as fmt='unknown' in the dispatch path, and the
legacy ``_fake_decode`` stub remains for synthetic payloads so the
Spark-side plumbing (schema, batch shape, partitioning) is exercised
even where no real codec exists.

``media_table`` synthesizes a deterministic media corpus from the
``documents`` fixture (payload = utf-8 bytes of the text), which keeps
the binary path oracle-checkable: byte lengths and sha256 digests are
reproducible in DuckDB.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ("image", "audio", "video")
FEATURE_DIM = 8


def media_table(documents: DataFrame) -> DataFrame:
    """Deterministic media corpus: doc_id, media_type (round-robin),
    payload binary, and typed metadata columns derived from doc_id."""
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return documents.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        (64 + F.col("doc_id") % 448).cast("int").alias("width"),
        (64 + (F.col("doc_id") * 7) % 448).cast("int").alias("height"),
        ((F.col("doc_id") % 120) + 1).cast("double").alias("duration_s"),
    )


def media_metadata(documents: DataFrame) -> DataFrame:
    """Typed-metadata projection over the binary column: byte size +
    content digest — pure built-ins, no Python."""
    m = media_table(documents)
    return m.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha256"),
        "width",
        "height",
    )


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """STUB decode: deterministic pseudo-features from payload bytes.

    Real implementation would be e.g. PIL.Image.open(BytesIO(payload))
    + resize + channel stats; codecs are absent in this container.
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(dim)
    chunks = np.array_split(arr.astype(np.float64), dim)
    return np.array([c.mean() if c.size else 0.0 for c in chunks]) / 255.0


def resize_media(
    media: DataFrame, target_w: int = 224, target_h: int = 224, real_decode: bool = False
) -> DataFrame:
    """Resize step over the OPAQUE media table: metadata transform is
    real (new width/height, deterministic output byte size); the pixel
    path is stubbed because these payloads are synthetic bytes, not
    images. ``real_decode=True`` routes to :func:`resize_pixels`, the
    REAL numpy resample over decodable (PPM) payloads — it raises at
    decode time on non-image bytes instead of pretending."""
    if real_decode:
        return resize_pixels(media, target_w, target_h)
    # Preserve every input column (duration_s etc.) so resize composes
    # with the other media stages; only payload/width/height change.
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in media.schema.fields
    )
    out_len = target_w * target_h // 64  # stub: deterministic byte budget

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                bytes((np.resize(np.frombuffer(p, dtype=np.uint8), out_len)))
                if len(p)
                else b"\x00" * out_len
                for p in pdf["payload"]
            ]
            pdf["width"] = np.full(len(pdf), target_w, dtype=np.int32)
            pdf["height"] = np.full(len(pdf), target_h, dtype=np.int32)
            yield pdf

    return media.mapInPandas(resize, schema)


def frame_schedule(media: DataFrame, every_s: float = 10.0) -> DataFrame:
    """Frame-sampling schedule for video rows: one output row per
    sampled frame timestamp. This part is PURE declarative Spark —
    ``explode(sequence(...))`` over the duration metadata — so the
    fan-out (the scale-relevant piece: row counts, partitioning) is
    engine-side and oracle-checkable; only pixel extraction is stubbed
    (``extract_frames``)."""
    # Frames at every_s*idx for idx in [0, ceil(duration/every)) — the
    # last frame timestamp stays strictly below duration_s (a frame AT
    # the duration does not exist; decoders reject it).
    n_frames = F.ceil(F.col("duration_s") / F.lit(float(every_s))).cast("int")
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "doc_id",
            "duration_s",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            (F.col("frame_idx") * float(every_s)).alias("frame_ts"),
        )
    )


def extract_frames(
    media: DataFrame, every_s: float = 10.0, real_decode: bool = False
) -> DataFrame:
    """Frame extraction: schedule (real) joined back to payloads, frame
    bytes produced by the stubbed decoder per (payload, frame_ts).

    ``real_decode=True`` routes to :func:`media_frames_auto` — a
    per-row magic-byte dispatch over the codecs this engine can really
    open frame-by-frame: RIFF/WAVE payloads become sample-decoded
    ``every_s``-second windows (features [n_samples, mean_amp, rms]);
    animated GIF payloads become post-compositing display frames
    (features [n_pixels, mean_r, mean_g, mean_b], frame_ts from the
    graphics-control delays). Other formats raise — frame extraction
    over a still image is a caller bug; MP4 stays the honest
    external-library boundary."""
    if real_decode:
        return media_frames_auto(media, every_s=every_s)
    sched = frame_schedule(media, every_s)
    joined = sched.join(media.select("doc_id", "payload"), "doc_id")
    schema = "doc_id long, frame_idx int, frame_ts double, frame_features array<double>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                list(_fake_decode(p[int(i) % max(len(p), 1):] or p))
                for p, i in zip(pdf["payload"], pdf["frame_idx"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_ts": pdf["frame_ts"],
                    "frame_features": feats,
                }
            )

    return joined.mapInPandas(extract, schema)


def decode_features_flat(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Driver/oracle-facing projection of :func:`decode_features`: the
    feature vector as per-dimension double columns ``f0..f{DIM-1}``
    instead of one ``array<double>`` column.

    The stub decode is exact integer arithmetic (chunk means of uint8
    payload bytes), so every fj is bit-reproducible in DuckDB SQL and
    the flat shape hashes cleanly under the driver's canonicalization
    (an array column does not). Internal pipelines that want the vector
    (e.g. to feed similarity search) keep using ``decode_features``.
    """
    feats = decode_features(media, real_decode)
    return feats.select(
        "doc_id",
        "media_type",
        *[F.element_at("features", i + 1).alias(f"f{i}") for i in range(FEATURE_DIM)],
    )


def extract_frames_flat(
    media: DataFrame, every_s: float = 10.0, real_decode: bool = False
) -> DataFrame:
    """Flat twin of :func:`extract_frames` (see
    :func:`decode_features_flat` for why): per-dimension frame-feature
    columns ``f0..f{DIM-1}``."""
    fr = extract_frames(media, every_s, real_decode)
    return fr.select(
        "doc_id",
        "frame_idx",
        "frame_ts",
        *[
            F.element_at("frame_features", i + 1).alias(f"f{i}")
            for i in range(FEATURE_DIM)
        ],
    )


def decode_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas — the
    production batch shape (Arrow record batches of binary columns in,
    fixed-dim float features out). Pure map: no shuffle, scales
    linearly; partition sizing is inherited from the scan.

    ``real_decode=True`` routes to :func:`media_features_auto` — the
    magic-byte dispatch over the six real codecs (PPM/PNG/BMP/GIF/
    JPEG/WAV) — and packs its uniform feature row into the same
    (doc_id, media_type, features) contract as the stub path, with
    media_type = the SNIFFED format and undecodable rows surfacing as
    'unknown' with NULL features."""
    if real_decode:
        feats = media_features_auto(media)
        return feats.select(
            "doc_id",
            F.col("fmt").alias("media_type"),
            F.array(
                F.col("width").cast("double"),
                F.col("height").cast("double"),
                F.col("n_pixels").cast("double"),
                "mean_0",
                "mean_1",
                "mean_2",
            ).alias("features"),
        )
    schema = "doc_id long, media_type string, features array<double>"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "features": [list(_fake_decode(p)) for p in pdf["payload"]],
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(decode, schema)


def _ppm_payload(s: int) -> tuple[int, int, bytes]:
    """(width, height, P6 payload) for seed ``s`` — the ONE rendering
    of the closed-form fixture image (width = 4 + s%5, height =
    3 + s%4, channels of pixel i = (s + c*i) % 256), shared by
    :func:`ppm_table` (s = doc_id) and :func:`ppm_table_seeded`
    (caller-keyed s) so the pixel formula cannot fork between the
    fixture families (its SQL replay lives in the oracle modules)."""
    w, h = 4 + s % 5, 3 + s % 4
    i = np.arange(w * h, dtype=np.int64)
    px = np.empty((w * h, 3), dtype=np.uint8)
    px[:, 0] = (s + i) % 256
    px[:, 1] = (s + 2 * i) % 256
    px[:, 2] = (s + 3 * i) % 256
    return w, h, f"P6\n{w} {h}\n255\n".encode("ascii") + px.tobytes()


def ppm_table(documents: DataFrame) -> DataFrame:
    """Deterministic REAL image corpus: one tiny binary PPM (P6) image
    per document, pixels generated in closed form from ``doc_id`` so
    the decoded channel statistics are reproducible in SQL.

    width = 4 + doc_id % 5, height = 3 + doc_id % 4; the RGB channels
    of pixel i (row-major) are (doc_id + i) % 256, (doc_id + 2i) % 256,
    (doc_id + 3i) % 256. Payload = ``P6\\n{w} {h}\\n255\\n`` + raw
     3-byte pixels — a complete, spec-compliant image file that any PPM
    reader opens. Arrow-batched mapInPandas, pure map (no shuffle).
    """
    schema = "doc_id long, width int, height int, payload binary"

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "payload": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h, payload = _ppm_payload(d)
                rows["doc_id"].append(d)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["payload"].append(payload)
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(synth, schema)


def _ppm_parse_header(buf: bytes) -> tuple[int, int, int, int]:
    """Return (width, height, maxval, pixel_offset) of a binary PPM
    (P6) payload — magic, dimensions, maxval, arbitrary whitespace and
    ``#`` comments per the netpbm spec; raises on a malformed file
    rather than guessing. Shared by :func:`decode_ppm` and
    :func:`resize_pixels`."""
    if buf[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":  # comment runs to end of line
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    return fields[0], fields[1], fields[2], pos + 1  # single ws after maxval


def _parse_ppm(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Full P6 parse: header + pixel block as a (h, w, 3) uint8 array.
    Shared by :func:`decode_ppm` and the [[sniff-media]] dispatcher."""
    w, h, maxval, off = _ppm_parse_header(buf)
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    px = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=off)
    return w, h, px.reshape(h, w, 3)


def _resample(px: np.ndarray, target_h: int, target_w: int, method: str) -> np.ndarray:
    """Pure-numpy pixel resample, (h, w, c) uint8 -> (target_h,
    target_w, c) — the piece that was an honest stub through r6
    because "no image library" was conflated with "no resampler";
    index arithmetic needs no codec.

    ``nearest``: source index = (dst * src_size) // dst_size — pure
    integer arithmetic, exactly replayable in SQL (the registered
    oracle's form).
    ``bilinear``: half-pixel-centered sampling with edge clamp (the
    PIL/torchvision align_corners=False convention), float64 weights,
    round-half-up back to uint8 — pinned by handcrafted-scale pytest,
    not the driver oracle (weight arithmetic is IEEE-deterministic but
    not worth expressing in SQL)."""
    h, w = px.shape[0], px.shape[1]
    if method == "nearest":
        ri = (np.arange(target_h) * h) // target_h
        ci = (np.arange(target_w) * w) // target_w
        return px[ri][:, ci]
    if method == "bilinear":

        def axis(n_src: int, n_dst: int):
            pos = (np.arange(n_dst) + 0.5) * n_src / n_dst - 0.5
            lo = np.floor(pos).astype(np.int64)
            frac = pos - lo
            return (
                np.clip(lo, 0, n_src - 1),
                np.clip(lo + 1, 0, n_src - 1),
                frac,
            )

        r0, r1, fr = axis(h, target_h)
        c0, c1, fc = axis(w, target_w)
        p = px.astype(np.float64)
        fc3 = fc[None, :, None]
        top = p[r0][:, c0] * (1 - fc3) + p[r0][:, c1] * fc3
        bot = p[r1][:, c0] * (1 - fc3) + p[r1][:, c1] * fc3
        fr3 = fr[:, None, None]
        out = top * (1 - fr3) + bot * fr3
        return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    raise ValueError(f"unknown resample method {method!r}")


def resize_pixels(
    media: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    method: str = "nearest",
) -> DataFrame:
    """REAL pixel resample over decodable image payloads (closes the
    r6 resize stub): decode the binary PPM payload, resample the
    actual pixel grid with :func:`_resample`, re-encode as a
    spec-compliant P6 payload at the target dimensions — so the
    output composes with :func:`decode_ppm` (decode → resize →
    channel means is the registered ``media_resize`` chain and its
    closed-form oracle).

    Arrow-batched mapInPandas, pure map: no shuffle, linear
    scale-out; at 100 TB this is a per-file CPU transform exactly
    like production PIL resize, and swapping the PPM codec for
    PIL/ffmpeg changes only the decode/encode lines."""
    schema = "doc_id long, width int, height int, payload binary"
    header = f"P6\n{target_w} {target_h}\n255\n".encode("ascii")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "payload": []}
            for d, buf in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(buf)
                w, h, maxval, off = _ppm_parse_header(buf)
                if maxval != 255:
                    raise ValueError(f"unsupported maxval {maxval}")
                px = np.frombuffer(
                    buf, dtype=np.uint8, count=w * h * 3, offset=off
                ).reshape(h, w, 3)
                out = _resample(px, target_h, target_w, method)
                rows["doc_id"].append(int(d))
                rows["width"].append(target_w)
                rows["height"].append(target_h)
                rows["payload"].append(header + out.tobytes())
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(resize, schema)


def decode_ppm(media: DataFrame, round_decimals: int = 6) -> DataFrame:
    """REAL bytes→pixels decode for binary PPM (P6) payloads — no codec
    library needed, so unlike :func:`decode_features` this path has no
    stub: the header (magic, dimensions, maxval, arbitrary whitespace
    and ``#`` comments per the netpbm spec) is parsed from the raw
    bytes, the pixel block is reinterpreted as a (h, w, 3) uint8 array,
    and per-channel means come from the actual decoded pixels.

    Output: (doc_id, width, height, n_pixels, mean_r, mean_g, mean_b),
    with width/height read from the PAYLOAD (not trusted metadata).
    Arrow-batched mapInPandas, pure map: no shuffle, linear scale-out;
    swap the parser for PIL/ffmpeg to extend beyond PPM — the plumbing
    (schema, batch shape, partitioning) is identical.
    """
    schema = (
        "doc_id long, width int, height int, n_pixels long,"
        " mean_r double, mean_g double, mean_b double"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "width": [], "height": [], "n_pixels": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for d, buf in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = _parse_ppm(bytes(buf))
                px = px.astype(np.float64)
                means = px.mean(axis=(0, 1)).round(round_decimals)
                rows["doc_id"].append(int(d))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(w * h)
                rows["mean_r"].append(means[0])
                rows["mean_g"].append(means[1])
                rows["mean_b"].append(means[2])
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(decode, schema)


def wav_table(documents: DataFrame) -> DataFrame:
    """Deterministic REAL audio corpus: one complete RIFF/WAVE PCM16
    file per document, samples generated in closed form from ``doc_id``
    so the decoded waveform statistics are reproducible in SQL.

    channels = 1 + doc_id % 2 (mono/stereo), sample_rate = 8000 Hz,
    n_frames = 64 + doc_id % 129; the int16 sample at (frame i,
    channel ch) is ``(doc_id*31 + i*17 + ch*7919) % 65536 - 32768``,
    interleaved little-endian per the WAVE spec. The payload carries a
    full canonical header (RIFF size, ``fmt `` chunk with rates and
    block alignment, ``data`` chunk) — the stdlib ``wave`` module opens
    it, which the unit test pins. Arrow-batched mapInPandas, pure map.
    """
    import struct

    schema = "doc_id long, n_channels int, sample_rate int, n_frames int, payload binary"
    sr = 8000

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "n_channels": [], "sample_rate": [],
                "n_frames": [], "payload": [],
            }
            for d in pdf["doc_id"]:
                d = int(d)
                c, n = 1 + d % 2, 64 + d % 129
                i = np.arange(n, dtype=np.int64)[:, None]
                ch = np.arange(c, dtype=np.int64)[None, :]
                samples = ((d * 31 + i * 17 + ch * 7919) % 65536 - 32768).astype(
                    "<i2"
                )  # (n_frames, channels) row-major == interleaved frames
                data = samples.tobytes()
                hdr = (
                    b"RIFF"
                    + struct.pack("<I", 36 + len(data))
                    + b"WAVE"
                    + b"fmt "
                    + struct.pack("<IHHIIHH", 16, 1, c, sr, sr * c * 2, c * 2, 16)
                    + b"data"
                    + struct.pack("<I", len(data))
                )
                rows["doc_id"].append(d)
                rows["n_channels"].append(c)
                rows["sample_rate"].append(sr)
                rows["n_frames"].append(n)
                rows["payload"].append(hdr + data)
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(synth, schema)


def _parse_wav(buf: bytes) -> tuple[int, int, int, bytes]:
    """RIFF/WAVE chunk walk: return (channels, sample_rate, bits,
    data_bytes); raises on a malformed file rather than guessing.
    Shared by :func:`decode_wav` and the [[sniff-media]] dispatcher."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sr, _brate, _balign, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAVE format ({audio_format}, {bits}-bit)")
    return channels, sr, bits, data


def decode_wav(media: DataFrame) -> DataFrame:
    """REAL bytes→samples decode for RIFF/WAVE PCM16 payloads — like
    :func:`decode_ppm`, no codec library and no stub: a proper RIFF
    chunk walker (arbitrary chunk order, unknown chunks skipped by
    declared size, word-aligned advance per the spec) finds ``fmt ``
    and ``data``, the sample block is reinterpreted as an int16
    (frames, channels) array, and the published statistics come from
    the actual decoded samples.

    Output: (doc_id, n_channels, sample_rate, n_frames, duration_s,
    sum_amp, sum_sq, rms) with format fields read from the PAYLOAD (not
    trusted metadata). ``sum_amp``/``sum_sq`` are exact int64 sums —
    bit-reproducible in any engine — and ``rms`` derives from them with
    one IEEE divide+sqrt, so the hash comparison needs no tolerance.
    Arrow-batched mapInPandas, pure map: no shuffle, linear scale-out.
    """
    schema = (
        "doc_id long, n_channels int, sample_rate int, n_frames long,"
        " duration_s double, sum_amp long, sum_sq long, rms double"
    )
    parse_riff = _parse_wav

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "n_channels": [], "sample_rate": [], "n_frames": [],
                "duration_s": [], "sum_amp": [], "sum_sq": [], "rms": [],
            }
            for d, buf in zip(pdf["doc_id"], pdf["payload"]):
                c, sr, _bits, data = parse_riff(bytes(buf))
                samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
                n = samples.size // c
                sum_amp = int(samples.sum())
                sum_sq = int((samples * samples).sum())
                rows["doc_id"].append(int(d))
                rows["n_channels"].append(c)
                rows["sample_rate"].append(sr)
                rows["n_frames"].append(n)
                rows["duration_s"].append(n / float(sr))
                rows["sum_amp"].append(sum_amp)
                rows["sum_sq"].append(sum_sq)
                rows["rms"].append(round(float(np.sqrt(sum_sq / samples.size)), 6))
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(decode, schema)


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): nearest of left/up/upleft
    to the linear estimate a + b - c, ties broken left, up, upleft."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_filter_row(ftype: int, raw: bytes, prev: bytes, bpp: int = 3) -> bytes:
    """Apply PNG scanline filter ``ftype`` to ``raw`` given the prior
    reconstructed row ``prev`` (encoder side)."""
    out = bytearray(len(raw))
    for i, x in enumerate(raw):
        a = raw[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) % 256
        elif ftype == 2:
            out[i] = (x - b) % 256
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) % 256
        elif ftype == 4:
            out[i] = (x - _paeth(a, b, c)) % 256
        else:
            raise ValueError(f"bad filter type {ftype}")
    return bytes(out)


def _png_unfilter_row(ftype: int, filt: bytes, prev: bytes, bpp: int = 3) -> bytes:
    """Reverse a PNG scanline filter (decoder side) — sequential by
    spec: Sub/Average/Paeth feed each byte's reconstruction into the
    next byte's predictor."""
    out = bytearray(len(filt))
    for i, x in enumerate(filt):
        a = out[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x + a) % 256
        elif ftype == 2:
            out[i] = (x + b) % 256
        elif ftype == 3:
            out[i] = (x + (a + b) // 2) % 256
        elif ftype == 4:
            out[i] = (x + _paeth(a, b, c)) % 256
        else:
            raise ValueError(f"bad filter type {ftype}")
    return bytes(out)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def png_table(documents: DataFrame) -> DataFrame:
    """Deterministic REAL image corpus in PNG — the most common image
    format, spec-complete with stdlib ``zlib`` only: signature, IHDR
    (8-bit truecolor, no interlace), one zlib-deflated IDAT whose
    scanlines cycle through ALL FIVE PNG filter types
    ((doc_id + row) % 5 — so the registered query's hash covers Sub /
    Up / Average / Paeth reconstruction, not just None), CRC-correct
    chunks, IEND.

    Same closed-form pixel pattern as [[ppm_table]] (w = 4 + d%5,
    h = 3 + d%4; channel values (d + k*i) % 256 for k=1,2,3), so the
    oracle replays the decoded statistics without decoding anything.
    Arrow-batched mapInPandas, pure map (no shuffle).
    """
    import struct
    import zlib

    schema = "doc_id long, width int, height int, payload binary"

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "payload": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 5, 3 + d % 4
                i = np.arange(w * h, dtype=np.int64)
                px = np.empty((w * h, 3), dtype=np.uint8)
                px[:, 0] = (d + i) % 256
                px[:, 1] = (d + 2 * i) % 256
                px[:, 2] = (d + 3 * i) % 256
                px = px.reshape(h, w * 3)
                raw_stream = bytearray()
                prev = bytes(w * 3)
                for r in range(h):
                    raw = px[r].tobytes()
                    ftype = (d + r) % 5
                    raw_stream += bytes([ftype]) + _png_filter_row(ftype, raw, prev)
                    prev = raw
                ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
                payload = (
                    b"\x89PNG\r\n\x1a\n"
                    + _png_chunk(b"IHDR", ihdr)
                    + _png_chunk(b"IDAT", zlib.compress(bytes(raw_stream)))
                    + _png_chunk(b"IEND", b"")
                )
                rows["doc_id"].append(d)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["payload"].append(payload)
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(synth, schema)


def _parse_png(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Full PNG parse (CRC-verified chunk walk, inflate, unfilter) to a
    (h, w, 3) uint8 array. Shared by :func:`decode_png` and the
    [[sniff-media]] dispatcher."""
    import struct
    import zlib

    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(buf):
        (size,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = buf[pos + 4 : pos + 8]
        body = buf[pos + 8 : pos + 8 + size]
        (crc,) = struct.unpack(">I", buf[pos + 8 + size : pos + 12 + size])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, ctype_code, comp, filt, interlace = ihdr
    if (depth, ctype_code, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={ctype_code}, "
            f"interlace={interlace}) — only 8-bit truecolor supported"
        )
    stream = zlib.decompress(bytes(idat))
    stride = w * 3
    if len(stream) != h * (stride + 1):
        raise ValueError("IDAT stream length does not match dimensions")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytes(stride)
    for r in range(h):
        off = r * (stride + 1)
        prev = _png_unfilter_row(
            stream[off], stream[off + 1 : off + 1 + stride], prev
        )
        out[r] = np.frombuffer(prev, dtype=np.uint8)
    return w, h, out.reshape(h, w, 3)


def decode_png(media: DataFrame, round_decimals: int = 6) -> DataFrame:
    """REAL bytes→pixels decode for PNG payloads with stdlib ``zlib`` —
    the third real-decode modality next to [[decode_ppm]] (PPM) and
    [[decode_wav]] (WAV), closing the most common image format without
    PIL: chunk walk with CRC verification, IDAT concatenation + zlib
    inflate, per-scanline unfilter (all five filter types per RFC 2083),
    then per-channel means from the reconstructed pixels.

    Output: (doc_id, width, height, n_pixels, mean_r, mean_g, mean_b)
    — the same contract as decode_ppm, with width/height read from
    IHDR (not trusted metadata). Supports 8-bit truecolor (color type
    2), non-interlaced — raises on anything else rather than guessing.
    Arrow-batched mapInPandas, pure map: no shuffle, linear scale-out.
    The per-row unfilter loop is Python (rows here are tiny); a
    production swap-in is PIL/libpng behind the identical plumbing.
    """
    schema = (
        "doc_id long, width int, height int, n_pixels long,"
        " mean_r double, mean_g double, mean_b double"
    )
    parse_png = _parse_png

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "width": [], "height": [], "n_pixels": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for d, buf in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = parse_png(bytes(buf))
                means = px.astype(np.float64).mean(axis=(0, 1)).round(round_decimals)
                rows["doc_id"].append(int(d))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(w * h)
                rows["mean_r"].append(means[0])
                rows["mean_g"].append(means[1])
                rows["mean_b"].append(means[2])
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(decode, schema)


# --- BMP (24-bit BITMAPINFOHEADER) ---------------------------------


def bmp_table(documents: DataFrame) -> DataFrame:
    """Deterministic REAL image corpus in BMP (Windows
    BITMAPINFOHEADER, 24-bit, uncompressed) — the fifth real-codec
    format, chosen because its three decode hazards are all
    SEMANTIC, not byte-shuffling: rows are stored BOTTOM-UP, channels
    are stored BGR, and every row is padded to a 4-byte boundary.
    Same closed-form pixel pattern as [[ppm_table]]/[[png_table]]
    (w = 4 + d%5, h = 3 + d%4; image-space channel values
    (d + k*i) % 256 for k=1,2,3 at row-major index i), so the oracle
    replays the decoded statistics without decoding anything.
    Arrow-batched mapInPandas, pure map (no shuffle).
    """
    import struct

    schema = "doc_id long, width int, height int, payload binary"

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "payload": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 5, 3 + d % 4
                i = np.arange(w * h, dtype=np.int64)
                px = np.empty((w * h, 3), dtype=np.uint8)
                px[:, 0] = (d + i) % 256
                px[:, 1] = (d + 2 * i) % 256
                px[:, 2] = (d + 3 * i) % 256
                img = px.reshape(h, w, 3)
                pad = b"\x00" * ((-(w * 3)) % 4)
                body = b"".join(
                    img[r, :, ::-1].tobytes() + pad  # BGR, bottom-up
                    for r in range(h - 1, -1, -1)
                )
                off = 14 + 40
                payload = (
                    b"BM"
                    + struct.pack("<IHHI", off + len(body), 0, 0, off)
                    + struct.pack(
                        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                        2835, 2835, 0, 0,
                    )
                    + body
                )
                rows["doc_id"].append(d)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["payload"].append(payload)
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(synth, schema)


def _parse_bmp(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Full 24-bit BMP parse (stride, bottom-up/top-down, BGR→RGB) to a
    (h, w, 3) uint8 array. Shared by :func:`decode_bmp` and the
    [[sniff-media]] dispatcher."""
    import struct

    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack("<I", buf[10:14])
    hdr_size, w, h_signed = struct.unpack("<Iii", buf[14:26])
    planes, bpp, comp = struct.unpack("<HHI", buf[26:34])
    if hdr_size < 40 or planes != 1 or bpp != 24 or comp != 0:
        raise ValueError(
            f"unsupported BMP (hdr={hdr_size}, bpp={bpp}, comp={comp})"
            " — only 24-bit uncompressed supported"
        )
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4
    data = np.frombuffer(buf, dtype=np.uint8, count=h * stride, offset=off)
    grid = data.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up storage -> flip to image order
        grid = grid[::-1]
    return w, h, grid[:, :, ::-1]  # BGR -> RGB


def decode_bmp(media: DataFrame, round_decimals: int = 6) -> DataFrame:
    """REAL bytes→pixels decode for 24-bit uncompressed BMP — file
    header, BITMAPINFOHEADER, stride arithmetic, bottom-up (or
    top-down when height < 0, per spec) row order, BGR→RGB swap.

    Output adds (px01_r, px01_g, px01_b) — the IMAGE-space pixel at
    row 0, col 1 — on top of the usual channel means, because means
    are invariant under row/channel reshuffling: a decoder that
    forgets bottom-up reads the wrong row for px01, one that forgets
    BGR swaps px01_r/px01_b, and one that forgets stride padding
    shears every row — each flips the driver hash. Arrow-batched
    mapInPandas, pure map: no shuffle, linear scale-out.
    """
    schema = (
        "doc_id long, width int, height int, n_pixels long,"
        " mean_r double, mean_g double, mean_b double,"
        " px01_r int, px01_g int, px01_b int"
    )
    parse_bmp = _parse_bmp

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "width": [], "height": [], "n_pixels": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
                "px01_r": [], "px01_g": [], "px01_b": [],
            }
            for d, buf in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = parse_bmp(bytes(buf))
                means = px.astype(np.float64).mean(axis=(0, 1)).round(round_decimals)
                rows["doc_id"].append(int(d))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(w * h)
                rows["mean_r"].append(means[0])
                rows["mean_g"].append(means[1])
                rows["mean_b"].append(means[2])
                rows["px01_r"].append(int(px[0, 1, 0]))
                rows["px01_g"].append(int(px[0, 1, 1]))
                rows["px01_b"].append(int(px[0, 1, 2]))
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(decode, schema)


# --- GIF (87a/89a, LZW) ---------------------------------------------

# Base code tables per min_code_size, built ONCE (OPTIMIZATION_r15,
# guide §4.5 — heavyweight init out of the hot loop): profiling the
# GIF family showed ~45% of BOTH codec directions went to rebuilding
# the 2^mcs single-byte literal tables on every CLEAR/init (a dict- or
# list-comprehension constructing 256 bytes objects per reset). The
# literals are immutable, so a shallow dict(...)/list(...) copy of a
# module-level base — a single C-level memcpy of pointers — is
# equivalent and removes the construction entirely. Values unchanged.
_LZW_ENC_BASE: dict[int, dict[bytes, int]] = {}
_LZW_DEC_BASE: dict[int, list[bytes]] = {}


def _lzw_enc_base(min_code_size: int) -> dict[bytes, int]:
    base = _LZW_ENC_BASE.get(min_code_size)
    if base is None:
        base = {bytes([j]): j for j in range(1 << min_code_size)}
        _LZW_ENC_BASE[min_code_size] = base
    return base


def _lzw_dec_base(min_code_size: int) -> list[bytes]:
    base = _LZW_DEC_BASE.get(min_code_size)
    if base is None:
        base = [bytes([j]) for j in range(1 << min_code_size)] + [b"", b""]
        _LZW_DEC_BASE[min_code_size] = base
    return base


def _gif_lzw_encode(indices: bytes, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW compression of an index stream (encoder side of
    the [[gif_table]] corpus): variable code width starting at
    min_code_size+1 bits, CLEAR emitted first, dictionary reset at
    4096 entries, codes packed LSB-first per the GIF spec."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1

    out = bytearray()
    bitbuf = bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    base = _lzw_enc_base(min_code_size)

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return dict(base), eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    emit(clear, width)
    run = b""
    for byte in indices:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4096:
            emit(clear, width)
            table, next_code, width = fresh()
        run = bytes([byte])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW decompression (decoder side of [[decode_gif]]):
    LSB-first variable-width codes, CLEAR/EOI handling, width bump at
    table size 2^width, and the KwKwK self-reference case."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    base = _lzw_dec_base(min_code_size)

    def fresh() -> tuple[list[bytes], int]:
        return list(base), min_code_size + 1

    table, width = fresh()
    out = bytearray()
    prev: bytes | None = None
    bitbuf = bitcnt = pos = 0
    while True:
        while bitcnt < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended without EOI")
            bitbuf |= data[pos] << bitcnt
            bitcnt += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width
        if code == clear:
            table, width = fresh()
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"corrupt LZW code {code}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def gif_table(documents: DataFrame) -> DataFrame:
    """Deterministic REAL image corpus in GIF89a — the sixth
    real-codec format and the first with a real COMPRESSION codec
    written both directions from scratch ([[_gif_lzw_encode]] /
    [[_gif_lzw_decode]]; PNG leaned on stdlib zlib): header, logical
    screen descriptor, 256-entry global color table, image
    descriptor, LZW-compressed index stream in ≤255-byte sub-blocks,
    trailer.

    Closed-form content: pixel i's palette INDEX is (d + i) % 256 and
    global palette entry j is (j, 2j % 256, 3j % 256), so decoded
    channel R(i) = (d+i) % 256 — the oracle replays the statistics
    without decoding. Arrow-batched mapInPandas, pure map.
    """
    import struct

    schema = "doc_id long, width int, height int, payload binary"
    j = np.arange(256, dtype=np.int64)
    palette = np.stack([j % 256, (2 * j) % 256, (3 * j) % 256], axis=1).astype(
        np.uint8
    )
    gct = palette.tobytes()

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "payload": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 5, 3 + d % 4
                i = np.arange(w * h, dtype=np.int64)
                indices = ((d + i) % 256).astype(np.uint8).tobytes()
                lzw = _gif_lzw_encode(indices)
                blocks = b"".join(
                    bytes([len(lzw[o : o + 255])]) + lzw[o : o + 255]
                    for o in range(0, len(lzw), 255)
                )
                payload = (
                    b"GIF89a"
                    + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
                    + gct
                    + b"\x2c"
                    + struct.pack("<HHHHB", 0, 0, w, h, 0)  # no LCT/interlace
                    + bytes([8])  # LZW min code size
                    + blocks
                    + b"\x00\x3b"  # block terminator + trailer
                )
                rows["doc_id"].append(d)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["payload"].append(payload)
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(synth, schema)


def _gif_skip_subblocks(buf: bytes, pos: int) -> int:
    """Advance past a GIF sub-block chain starting at ``pos``; returns
    the offset just after the 0x00 terminator. A payload that ends
    mid-chain raises ValueError (the documented malformed-file
    contract), never IndexError."""
    while True:
        if pos >= len(buf):
            raise ValueError("truncated GIF")
        size = buf[pos]
        if size == 0:
            return pos + 1
        pos += 1 + size


def _gif_read_subblocks(buf: bytes, pos: int) -> tuple[bytearray, int]:
    """Reassemble a GIF sub-block chain starting at ``pos``; returns
    (data, offset just after the terminator). Bounds-checked like
    :func:`_gif_skip_subblocks` — a truncated chain raises ValueError."""
    data = bytearray()
    while True:
        if pos >= len(buf):
            raise ValueError("truncated GIF")
        size = buf[pos]
        if size == 0:
            return data, pos + 1
        if pos + 1 + size > len(buf):
            raise ValueError("truncated GIF")
        data += buf[pos + 1 : pos + 1 + size]
        pos += 1 + size


def _parse_gif(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Full single-frame GIF parse (screen descriptor, global palette,
    extension skip, sub-block reassembly, LZW decode, palette lookup)
    to a (h, w, 3) uint8 array. Shared by :func:`decode_gif` and the
    [[sniff-media]] dispatcher."""
    import struct

    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(buf) < 13:
        raise ValueError("truncated GIF")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", buf[6:13])
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(buf):
        block = buf[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos = _gif_skip_subblocks(buf, pos + 2)
        elif block == 0x2C:
            if pos + 10 > len(buf):
                raise ValueError("truncated GIF")
            _l, _t, w, h, ipacked = struct.unpack("<HHHHB", buf[pos + 1 : pos + 10])
            pos += 10
            if ipacked & 0x80:
                raise ValueError("local color tables unsupported")
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if palette is None:
                raise ValueError("no color table")
            if pos >= len(buf):
                raise ValueError("truncated GIF")
            min_code = buf[pos]
            pos += 1
            lzw, pos = _gif_read_subblocks(buf, pos)
            indices = np.frombuffer(
                _gif_lzw_decode(bytes(lzw), min_code), np.uint8
            )
            if indices.size != w * h:
                raise ValueError("decoded index count != dimensions")
            if indices.size and int(indices.max()) >= palette.shape[0]:
                raise ValueError("pixel index outside palette")
            return w, h, palette[indices].reshape(h, w, 3)
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("no image descriptor found")


def decode_gif(media: DataFrame, round_decimals: int = 6) -> DataFrame:
    """REAL bytes→pixels decode for single-frame GIF87a/89a — header
    and screen-descriptor parse, global color table, extension-block
    skip, image descriptor, sub-block reassembly, from-scratch LZW
    decompression ([[_gif_lzw_decode]]), palette lookup. Interlaced
    or locally-paletted frames raise rather than guess.

    Output: (doc_id, width, height, n_pixels, mean_r, mean_g, mean_b)
    with dims read from the image descriptor, not trusted metadata.
    Arrow-batched mapInPandas, pure map: no shuffle, linear scale-out.
    """
    schema = (
        "doc_id long, width int, height int, n_pixels long,"
        " mean_r double, mean_g double, mean_b double"
    )
    parse_gif = _parse_gif

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "width": [], "height": [], "n_pixels": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for d, buf in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = parse_gif(bytes(buf))
                means = px.astype(np.float64).mean(axis=(0, 1)).round(round_decimals)
                rows["doc_id"].append(int(d))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(w * h)
                rows["mean_r"].append(means[0])
                rows["mean_g"].append(means[1])
                rows["mean_b"].append(means[2])
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(decode, schema)


def _gif_frame_block(
    left: int, top: int, w: int, h: int, idx,
    delay: int, disposal: int, transp: int | None,
) -> bytes:
    """Serialize ONE animated-GIF frame: graphics-control extension
    (packed disposal/transparency bits, centisecond delay, transparent
    index) + image descriptor + LZW-coded indices in 255-byte
    sub-blocks. Single source of truth for the byte-level frame layout
    — [[gif_table_animated]] and [[gif_table_disposal]] both call it
    (the pytest helper `_handmade_gif` stays independent on purpose:
    an independently hand-rolled serializer is what catches a bug
    here)."""
    import struct

    lzw = _gif_lzw_encode(idx.astype(np.uint8).tobytes())
    blocks = b"".join(
        bytes([len(lzw[o : o + 255])]) + lzw[o : o + 255]
        for o in range(0, len(lzw), 255)
    )
    gpacked = (disposal << 2) | (1 if transp is not None else 0)
    return (
        b"\x21\xf9\x04"
        + struct.pack("<BHB", gpacked, delay, transp or 0)
        + b"\x00"
        + b"\x2c"
        + struct.pack("<HHHHB", left, top, w, h, 0)
        + bytes([8])
        + blocks
        + b"\x00"
    )


def gif_table_animated(documents: DataFrame) -> DataFrame:
    """Deterministic ANIMATED GIF89a corpus — the VIDEO-modality
    payload this engine can decode frame-by-frame with its own LZW
    codec (real multi-frame extraction without an external codec
    library; MP4 stays the honest boundary). Each payload is
    ``n_frames = 2 + d % 3`` full-size frames, every frame preceded by
    a graphics-control extension carrying ``delay_cs = 10 + d % 5``
    centiseconds.

    Closed-form content (the [[gif_table]] recipe per frame): frame
    f's pixel i has palette index (d + 17*f + i) % 256 against the
    same (j, 2j%256, 3j%256) global palette, so per-frame channel
    means — and the per-frame timestamp f*delay/100 — replay in SQL
    without decoding. Arrow-batched mapInPandas, pure map.
    """
    import struct

    schema = "doc_id long, width int, height int, n_frames int, payload binary"
    j = np.arange(256, dtype=np.int64)
    palette = np.stack([j % 256, (2 * j) % 256, (3 * j) % 256], axis=1).astype(
        np.uint8
    )
    gct = palette.tobytes()

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "width": [], "height": [], "n_frames": [],
                "payload": [],
            }
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 5, 3 + d % 4
                nf, delay = 2 + d % 3, 10 + d % 5
                i = np.arange(w * h, dtype=np.int64)
                body = bytearray()
                for f in range(nf):
                    # disposal 0, no transparency — byte-identical to
                    # the pre-hoist inline serializer (driver-hash pin)
                    body += _gif_frame_block(
                        0, 0, w, h, (d + 17 * f + i) % 256, delay, 0, None
                    )
                payload = (
                    b"GIF89a"
                    + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
                    + gct
                    + bytes(body)
                    + b"\x3b"
                )
                rows["doc_id"].append(d)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(nf)
                rows["payload"].append(payload)
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(synth, schema)


def gif_table_disposal(documents: DataFrame) -> DataFrame:
    """Deterministic animated GIF89a corpus exercising the GIF
    features REAL animations use that [[gif_table_animated]] does not:
    disposal 2 (restore to background), disposal 3 (restore to
    previous), and transparency — with displayed-canvas channel means
    still closed-form in SQL (r8 verdict item #4's oracle).

    Per doc d (screen w = 4+d%5, h = 3+d%4, background palette index
    bg = 7d % 256, constant delay = 10+d%5 cs, the (j, 2j%256, 3j%256)
    global palette):

    - frame 0: FULL-SCREEN, pixel i -> index (d+i) % 256, disposal 2 —
      so the whole canvas reverts to bg before frame 1.
    - frame 1: partial rect at (1,1) size (w-2)x(h-2), pixel r ->
      index (d+5+r) % 256, TRANSPARENT index (d+5) % 256 (exactly the
      r=0 pixel — rect size <= 24 < 256 so no other r collides),
      disposal 3 — displayed canvas is bg everywhere except the rect's
      r>=1 pixels; before frame 2 the rect reverts to the pre-frame-1
      content (all bg).
    - frame 2: top-row rect at (0,0) size (w-1)x1, pixel x -> index
      (d+9+x) % 256, disposal 0 — displayed canvas is bg except that
      row.

    Every displayed pixel is a CASE expression over (doc_id, p), so
    the oracle replays the full composite-dispose-restore walk without
    decoding. Arrow-batched mapInPandas, pure map.
    """
    import struct

    schema = "doc_id long, width int, height int, n_frames int, payload binary"
    j = np.arange(256, dtype=np.int64)
    palette = np.stack([j % 256, (2 * j) % 256, (3 * j) % 256], axis=1).astype(
        np.uint8
    )
    gct = palette.tobytes()

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "width": [], "height": [], "n_frames": [],
                "payload": [],
            }
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 5, 3 + d % 4
                delay, bg = 10 + d % 5, (7 * d) % 256
                i = np.arange(w * h, dtype=np.int64)
                r = np.arange((w - 2) * (h - 2), dtype=np.int64)
                x = np.arange(w - 1, dtype=np.int64)
                body = (
                    _gif_frame_block(0, 0, w, h, (d + i) % 256, delay, 2, None)
                    + _gif_frame_block(
                        1, 1, w - 2, h - 2, (d + 5 + r) % 256,
                        delay, 3, (d + 5) % 256,
                    )
                    + _gif_frame_block(
                        0, 0, w - 1, 1, (d + 9 + x) % 256, delay, 0, None
                    )
                )
                payload = (
                    b"GIF89a"
                    + struct.pack("<HHBBB", w, h, 0xF7, bg, 0)
                    + gct
                    + body
                    + b"\x3b"
                )
                rows["doc_id"].append(d)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(3)
                rows["payload"].append(payload)
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(synth, schema)


def _parse_gif_frames(buf: bytes) -> tuple[int, int, list[tuple[int, np.ndarray]]]:
    """ANIMATED GIF parse: walk every graphics-control extension +
    image descriptor to (screen_w, screen_h, [(delay_cs, canvas_rgb)
    per frame]). Compositing follows the GIF89a spec for ALL FOUR
    disposal methods (r8 verdict item #4 closed the 2/3 gap):

    - 0 (unspecified) / 1 (do not dispose): the frame's rectangle is
      painted OVER the previous canvas — partial-frame updates, the
      normal animation encoding.
    - 2 (restore to background): after the frame is displayed, its
      rectangle reverts to the GLOBAL BACKGROUND COLOR (the screen
      descriptor's background palette index — the spec-literal
      reading; browsers that substitute transparent-black are layering
      a web-compat quirk this decoder does not).
    - 3 (restore to previous): the rectangle reverts to the canvas
      content captured immediately before the frame was composited.

    Transparency (GCE flag + transparent index) is palette-index
    passthrough: rect pixels holding the transparent index leave the
    canvas unchanged. The canvas initializes to the background color,
    so a partial or transparent FIRST frame is well-defined (the old
    full-screen-first restriction is gone). Disposal 4-7 are undefined
    by the spec and raise; truncated payloads raise ValueError
    ([[_gif_skip_subblocks]]).
    """
    import struct

    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(buf) < 13:
        raise ValueError("truncated GIF")
    sw, sh, packed, bg, _ar = struct.unpack("<HHBBB", buf[6:13])
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    frames: list[tuple[int, np.ndarray]] = []
    canvas = None
    # GCE state applies to the NEXT image descriptor
    delay, disposal, transp = 0, 0, None
    # the PREVIOUS frame's disposal is applied just before compositing
    # the next frame (the displayed canvas is pre-disposal)
    prev_disposal = 0
    prev_box: tuple[int, int, int, int] | None = None
    prev_saved: np.ndarray | None = None
    while pos < len(buf):
        block = buf[pos]
        if block == 0x21:
            if pos + 1 >= len(buf):
                raise ValueError("truncated GIF")
            label = buf[pos + 1]
            if label == 0xF9:  # graphics control extension
                if pos + 7 >= len(buf):
                    raise ValueError("truncated GIF")
                # the fixed-offset reads below assume the spec's 4-byte
                # GCE body; a nonstandard size would silently misread
                # delay/packed (ADVICE r8)
                if buf[pos + 2] != 4:
                    raise ValueError("bad GCE block size")
                gpacked = buf[pos + 3]
                disposal = (gpacked >> 2) & 0x07
                if disposal > 3:
                    raise ValueError("undefined GIF disposal method")
                delay = struct.unpack("<H", buf[pos + 4 : pos + 6])[0]
                transp = buf[pos + 6] if gpacked & 0x01 else None
                pos = _gif_skip_subblocks(buf, pos + 2)
            else:  # other extensions: skip
                pos = _gif_skip_subblocks(buf, pos + 2)
        elif block == 0x2C:
            if pos + 10 > len(buf):
                raise ValueError("truncated GIF")
            left, top, w, h, ipacked = struct.unpack(
                "<HHHHB", buf[pos + 1 : pos + 10]
            )
            pos += 10
            if ipacked & 0x80:
                raise ValueError("local color tables unsupported")
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if palette is None:
                raise ValueError("no color table")
            if pos >= len(buf):
                raise ValueError("truncated GIF")
            min_code = buf[pos]
            pos += 1
            lzw, pos = _gif_read_subblocks(buf, pos)
            indices = np.frombuffer(
                _gif_lzw_decode(bytes(lzw), min_code), np.uint8
            )
            if indices.size != w * h:
                raise ValueError("decoded index count != dimensions")
            if left + w > sw or top + h > sh:
                raise ValueError("GIF frame rectangle exceeds screen")
            if canvas is None:
                if bg >= palette.shape[0]:
                    raise ValueError("background index outside palette")
                canvas = np.broadcast_to(
                    palette[bg], (sh, sw, 3)
                ).copy()
            else:
                canvas = canvas.copy()
                if prev_disposal == 2:
                    if bg >= palette.shape[0]:
                        raise ValueError(
                            "background index outside palette"
                        )
                    pt, pl, ph_, pw_ = prev_box
                    canvas[pt : pt + ph_, pl : pl + pw_] = palette[bg]
                elif prev_disposal == 3:
                    pt, pl, ph_, pw_ = prev_box
                    canvas[pt : pt + ph_, pl : pl + pw_] = prev_saved
            saved = canvas[top : top + h, left : left + w].copy()
            if indices.size and int(indices.max()) >= palette.shape[0]:
                raise ValueError("pixel index outside palette")
            rect = palette[indices].reshape(h, w, 3)
            if transp is not None:
                mask = indices.reshape(h, w) != transp
                region = canvas[top : top + h, left : left + w]
                region[mask] = rect[mask]
            else:
                canvas[top : top + h, left : left + w] = rect
            frames.append((delay, canvas))
            prev_disposal, prev_box, prev_saved = disposal, (top, left, h, w), saved
            delay, disposal, transp = 0, 0, None
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("no image descriptor found")
    return sw, sh, frames


def gif_frames_real(media: DataFrame, round_decimals: int = 6) -> DataFrame:
    """REAL video-frame extraction for the codec this engine owns end
    to end — animated GIF ([[_parse_gif_frames]] over the from-scratch
    LZW decoder): one output row per DISPLAYED frame (post-compositing
    canvas), closing the last stubbed modality (r7 verdict item #3)
    without an external codec library.

    Output: (doc_id, frame_idx, delay_cs, frame_ts, width, height,
    n_pixels, mean_r, mean_g, mean_b). ``frame_ts`` is the frame's
    display time = cumulative prior delays / 100.0 — an exact integer
    centisecond sum divided once, so it replays bit-exactly in SQL.
    Arrow-batched mapInPandas, pure map: no shuffle, linear scale-out;
    frame fan-out happens executor-side, never on the driver.
    """
    schema = (
        "doc_id long, frame_idx int, delay_cs int, frame_ts double,"
        " width int, height int, n_pixels long,"
        " mean_r double, mean_g double, mean_b double"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "frame_idx": [], "delay_cs": [], "frame_ts": [],
                "width": [], "height": [], "n_pixels": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for d, buf in zip(pdf["doc_id"], pdf["payload"]):
                sw, sh, frames = _parse_gif_frames(bytes(buf))
                cum_cs = 0
                for f, (delay, canvas) in enumerate(frames):
                    means = (
                        canvas.astype(np.float64)
                        .mean(axis=(0, 1))
                        .round(round_decimals)
                    )
                    rows["doc_id"].append(int(d))
                    rows["frame_idx"].append(f)
                    rows["delay_cs"].append(delay)
                    rows["frame_ts"].append(cum_cs / 100.0)
                    rows["width"].append(sw)
                    rows["height"].append(sh)
                    rows["n_pixels"].append(sw * sh)
                    rows["mean_r"].append(means[0])
                    rows["mean_g"].append(means[1])
                    rows["mean_b"].append(means[2])
                    cum_cs += delay
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(extract, schema)


def media_frames_auto(
    media: DataFrame, every_s: float = 0.008, round_decimals: int = 6
) -> DataFrame:
    """Per-row frame extraction DISPATCH — the frame-level sibling of
    :func:`media_features_auto` and the real-decode back end of
    :func:`extract_frames`: sniff each payload's magic bytes and route
    to the matching frame decoder. WAV → ``every_s``-second sample
    windows, frame_features = [n_samples, mean_amp, rms]; animated GIF
    → post-compositing display frames ([[gif_frames_real]]),
    frame_features = [n_pixels, mean_r, mean_g, mean_b] with frame_ts
    from the graphics-control delays. Any other format raises — frame
    extraction over a still image is a caller bug, not data to
    quarantine (quarantine lives in :func:`media_features_auto`, whose
    one row per DOCUMENT can carry an 'unknown' marker; a frames
    operator has no natural zero-frame row to carry it).

    Output: (doc_id, frame_idx, frame_ts, frame_features). Pure map.
    """
    schema = (
        "doc_id long, frame_idx int, frame_ts double,"
        " frame_features array<double>"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "frame_idx": [], "frame_ts": [],
                "frame_features": [],
            }
            for d, buf in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(buf)
                fmt = sniff_media(buf)
                if fmt == "wav":
                    c, sr, _bits, data = _parse_wav(buf)
                    samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
                    n = samples.size // c
                    grid = samples.reshape(n, c)
                    win = max(1, int(round(every_s * sr)))
                    for j in range((n + win - 1) // win):
                        seg = grid[j * win : (j + 1) * win]
                        size = int(seg.size)
                        sum_sq = int((seg * seg).sum())
                        rows["doc_id"].append(int(d))
                        rows["frame_idx"].append(j)
                        rows["frame_ts"].append(j * every_s)
                        rows["frame_features"].append(
                            [
                                float(size),
                                int(seg.sum()) / size,
                                round(float(np.sqrt(sum_sq / size)), round_decimals),
                            ]
                        )
                elif fmt == "gif":
                    sw, sh, frames = _parse_gif_frames(buf)
                    cum_cs = 0
                    for f, (delay, canvas) in enumerate(frames):
                        means = (
                            canvas.astype(np.float64)
                            .mean(axis=(0, 1))
                            .round(round_decimals)
                        )
                        rows["doc_id"].append(int(d))
                        rows["frame_idx"].append(f)
                        rows["frame_ts"].append(cum_cs / 100.0)
                        rows["frame_features"].append(
                            [
                                float(sw * sh),
                                float(means[0]),
                                float(means[1]),
                                float(means[2]),
                            ]
                        )
                        cum_cs += delay
                else:
                    raise ValueError(
                        f"frame extraction unsupported for format '{fmt}'"
                    )
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(extract, schema)


# --- JPEG (baseline grayscale) ------------------------------------
# Standard JPEG Annex K luminance Huffman tables (public spec):
# BITS (count of codes per length 1..16) and HUFFVAL (symbols in
# code order). DC symbols are magnitude categories 0..11; AC symbols
# are (run << 4) | size with 0x00 = EOB.
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical JPEG code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.buf.append(b)
                if b == 0xFF:
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-pad per spec
        return bytes(self.buf)


def jpeg_table(documents: DataFrame) -> DataFrame:
    """Deterministic REAL image corpus in baseline JPEG (SOI/APP0/DQT/
    SOF0/DHT/SOS/EOI, standard Annex K luminance Huffman tables,
    grayscale, 8x8-aligned dims) — built so the LOSSY format becomes
    EXACTLY decodable: every 8x8 block is a flat value, so only the DC
    coefficient is nonzero, and with q[DC]=8 the dequantized DC is
    8*(v-128) whose DC-only IDCT is exactly v-128 in IEEE doubles
    (division by 8 is exact). Quantization loses nothing on this
    corpus, making a closed-form oracle possible for a format where
    general payloads round-trip only approximately.

    Dims: w = 8*(1 + d%3), h = 8*(1 + d%2); block b (raster order)
    holds value (d + 7*b) % 256. Arrow-batched mapInPandas, pure map.
    """
    import struct

    schema = "doc_id long, width int, height int, payload binary"
    dc_codes = _jpeg_huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)

    qtab = bytes([8] * 64)

    def segments(w: int, h: int) -> bytes:
        out = bytearray(b"\xff\xd8")  # SOI
        out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x00]) + qtab
        out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
        dht = bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        out += b"\xff\xc4" + struct.pack(">H", 3 + len(dht)) + bytes([0x00]) + dht
        aht = bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
        out += b"\xff\xc4" + struct.pack(">H", 3 + len(aht)) + bytes([0x10]) + aht
        out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
        return bytes(out)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "payload": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 * (1 + d % 3), 8 * (1 + d % 2)
                bw = _JpegBitWriter()
                pred = 0
                n_blocks = (w // 8) * (h // 8)
                for b in range(n_blocks):
                    v = (d + 7 * b) % 256
                    dc_q = v - 128  # dequantizes to 8*(v-128)
                    diff = dc_q - pred
                    pred = dc_q
                    mag = abs(diff)
                    size = mag.bit_length()
                    code, length = dc_codes[size]
                    bw.put(code, length)
                    if size:
                        bits = diff if diff > 0 else diff + (1 << size) - 1
                        bw.put(bits, size)
                    eob_code, eob_len = ac_codes[0x00]
                    bw.put(eob_code, eob_len)
                payload = segments(w, h) + bw.flush() + b"\xff\xd9"
                rows["doc_id"].append(d)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["payload"].append(payload)
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(synth, schema)


def jpeg_table_color(documents: DataFrame) -> DataFrame:
    """Deterministic REAL color corpus in baseline YCbCr 4:2:0 JPEG —
    the full interleaved-MCU structure (SOF0 with Y at 2x2 / chroma at
    1x1 sampling, one interleaved scan, per-component DC prediction)
    with the same exactness trick as [[jpeg_table]]: every 8x8 block
    is flat so only DC survives, q[DC]=8 makes dequantized DC an exact
    multiple of 8 whose DC-only IDCT is exact, and the CHROMA planes
    are neutral (Cb=Cr=128, DC diff 0), so the JFIF YCbCr→RGB
    conversion multiplies its float constants by exactly 0.0 and the
    decoded RGB equals the luma integers — a closed-form oracle for a
    lossy COLOR format. (Non-neutral chroma goes through the same
    decode path and is pinned by a handcrafted pytest payload instead,
    where exactness is not required.)

    Dims: w = 16*(1 + d%2), h = 16 (whole MCUs). The t-th luma block
    in MCU traversal order holds (d + 7*t) % 256 — channel means are
    traversal-order independent: avg over t of (d + 7t) % 256.
    Arrow-batched mapInPandas, pure map.
    """
    import struct

    schema = "doc_id long, width int, height int, payload binary"
    dc_codes = _jpeg_huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    qtab = bytes([8] * 64)
    eob_code, eob_len = ac_codes[0x00]
    zero_code, zero_len = dc_codes[0]

    def segments(w: int, h: int) -> bytes:
        out = bytearray(b"\xff\xd8")  # SOI
        out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x00]) + qtab
        # SOF0: 3 components — Y 2x2, Cb 1x1, Cr 1x1, all quant table 0
        out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
        out += bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
        dht = bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        out += b"\xff\xc4" + struct.pack(">H", 3 + len(dht)) + bytes([0x00]) + dht
        aht = bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
        out += b"\xff\xc4" + struct.pack(">H", 3 + len(aht)) + bytes([0x10]) + aht
        # SOS: all three components use DC table 0 / AC table 0
        out += b"\xff\xda" + struct.pack(">H", 12) + bytes(
            [3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]
        )
        return bytes(out)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "payload": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 16 * (1 + d % 2), 16
                bw = _JpegBitWriter()
                pred = 0
                t = 0
                for _mcu in range((w // 16) * (h // 16)):
                    for _blk in range(4):  # 2x2 luma blocks per MCU
                        v = (d + 7 * t) % 256
                        t += 1
                        dc_q = v - 128  # dequantizes to 8*(v-128)
                        diff = dc_q - pred
                        pred = dc_q
                        mag = abs(diff)
                        size = mag.bit_length()
                        code, length = dc_codes[size]
                        bw.put(code, length)
                        if size:
                            bits = diff if diff > 0 else diff + (1 << size) - 1
                            bw.put(bits, size)
                        bw.put(eob_code, eob_len)
                    for _chroma in range(2):  # Cb, Cr: neutral (DC diff 0)
                        bw.put(zero_code, zero_len)
                        bw.put(eob_code, eob_len)
                payload = segments(w, h) + bw.flush() + b"\xff\xd9"
                rows["doc_id"].append(d)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["payload"].append(payload)
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(synth, schema)


def decode_jpeg_color(media: DataFrame, round_decimals: int = 6) -> DataFrame:
    """REAL bytes→pixels decode for baseline COLOR JPEG — closes the
    last in-reach codec stub (the r6/r7 boundary said 'color JPEG
    remains outside'): [[_parse_jpeg]] now walks interleaved YCbCr
    MCUs with 1-2x sampling factors, replicates chroma up to full
    resolution, and applies the JFIF YCbCr→RGB equations; this
    operator publishes per-channel means. Output: (doc_id, width,
    height, n_pixels, mean_r, mean_g, mean_b) with dims read from
    SOF0. Arrow-batched mapInPandas, pure map: no shuffle."""
    schema = (
        "doc_id long, width int, height int, n_pixels long,"
        " mean_r double, mean_g double, mean_b double"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "width": [], "height": [], "n_pixels": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for d, buf in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = _parse_jpeg(bytes(buf))
                if px.ndim != 3:
                    raise ValueError("decode_jpeg_color needs a 3-component JPEG")
                means = px.mean(axis=(0, 1)).round(round_decimals)
                rows["doc_id"].append(int(d))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(w * h)
                rows["mean_r"].append(float(means[0]))
                rows["mean_g"].append(float(means[1]))
                rows["mean_b"].append(float(means[2]))
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(decode, schema)


def decode_jpeg(media: DataFrame, round_decimals: int = 6) -> DataFrame:
    """REAL bytes→pixels decode for baseline grayscale JPEG — the
    fourth real-decode modality (PPM, WAV, PNG, now JPEG) with numpy
    only: marker/segment walk, DQT/SOF0/DHT/SOS parse, canonical
    Huffman decode over the 0xFF00-unstuffed bitstream, DC prediction,
    AC run-length/zigzag placement, dequantization, and a REAL float
    8x8 IDCT (separable cosine basis) with level shift + clamp. The
    decoder is general within baseline/grayscale/single-scan (no
    restart markers; multi-table DQT segments are walked like DHT;
    the final sample rounding uses numpy's round-half-even, which can
    differ from the spec's round-half-away by 1 LSB on exact .5
    reconstructions — irrelevant on [[jpeg_table]]'s corpus, whose
    block means are integers); on [[jpeg_table]]'s DC-only corpus the
    IDCT is exact in IEEE doubles, which is what makes the closed-form
    oracle possible for a lossy format.

    Output: (doc_id, width, height, n_pixels, mean_gray) with
    width/height read from SOF0, not trusted metadata. Arrow-batched
    mapInPandas, pure map: no shuffle, linear scale-out.
    """
    schema = (
        "doc_id long, width int, height int, n_pixels long, mean_gray double"
    )
    parse = _parse_jpeg

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "width": [], "height": [],
                "n_pixels": [], "mean_gray": [],
            }
            for d, buf in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = parse(bytes(buf))
                rows["doc_id"].append(int(d))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(w * h)
                rows["mean_gray"].append(round(float(px.mean()), round_decimals))
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(decode, schema)


def _parse_jpeg(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Full baseline JPEG parse (marker walk, Huffman decode, per-
    component DC prediction, dequantize, float IDCT) — grayscale
    (SOF0 ncomp=1, the original r6 decoder, numerics unchanged) or
    YCbCr COLOR (ncomp=3, one interleaved scan, sampling factors
    1-2): interleaved MCU traversal, chroma upsample by sample
    replication, JFIF YCbCr→RGB. Returns (w, h, arr) with arr a
    (h, w) float array of clamped samples for grayscale or a
    (h, w, 3) float RGB array for color. Shared by
    :func:`decode_jpeg`, :func:`decode_jpeg_color` and the
    [[sniff-media]] dispatcher. No restart markers (DRI interval 0
    accepted), no progressive (SOF2), 8-bit quant tables only."""
    import struct

    u = np.arange(8)
    basis = np.cos((2 * u[:, None] + 1) * u[None, :] * np.pi / 16)
    basis[:, 0] *= 1 / np.sqrt(2)  # C(0) folded into column 0

    def idct2(coef: np.ndarray) -> np.ndarray:
        # f = (1/4) * B @ S @ B.T with C(u) folded into B's columns
        return 0.25 * basis @ coef @ basis.T

    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = None
    scan = None
    sof: dict[int, tuple[int, int, int]] = {}  # cid -> (hi, vi, tq)
    scan_comps: list[tuple[int, int, int]] = []  # (cid, dc_id, ac_id)
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (size,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
        body = buf[pos + 4 : pos + 2 + size]
        if marker == 0xDB:
            # a DQT segment may carry SEVERAL 65-byte (precision
            # nibble + 64 entries) tables back to back — walk them
            # all, like the DHT branch below (ADVICE r6)
            off = 0
            while off < len(body):
                if body[off] >> 4:
                    raise ValueError("16-bit quant tables unsupported")
                qtabs[body[off] & 0x0F] = np.frombuffer(
                    body[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int32)
                off += 65
        elif marker == 0xC0:
            depth, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if depth != 8 or ncomp not in (1, 3):
                raise ValueError("only 8-bit 1- or 3-component baseline supported")
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError("sampling factors 1-2 only")
                sof[cid] = (hi, vi, tq)
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline SOF0 supported")
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nval = sum(bits)
                vals = list(body[off + 17 : off + 17 + nval])
                codes = _jpeg_huff_codes(bits, vals)
                huff[(tc, th)] = {
                    (length, code): sym for sym, (code, length) in codes.items()
                }
                off += 17 + nval
        elif marker == 0xDD:
            if struct.unpack(">H", body[:2])[0] != 0:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:
            ncomp_s = body[0]
            if ncomp_s not in (1, 3):
                raise ValueError("1- or 3-component interleaved scan only")
            scan_comps = [
                (
                    body[1 + 2 * i],
                    body[2 + 2 * i] >> 4,
                    body[2 + 2 * i] & 0x0F,
                )
                for i in range(ncomp_s)
            ]
            scan_start = pos + 2 + size
            end = buf.rindex(b"\xff\xd9")
            scan = buf[scan_start:end]
            pos = end
            continue
        pos += 2 + size
    if w is None or scan is None or not scan_comps:
        raise ValueError("missing SOF0/SOS")
    # unstuff 0xFF00 and decode
    data = scan.replace(b"\xff\x00", b"\xff")
    bitpos = 0

    def read_bit() -> int:
        nonlocal bitpos
        byte = data[bitpos >> 3]
        bit = (byte >> (7 - (bitpos & 7))) & 1
        bitpos += 1
        return bit

    def read_huff(table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    def receive_extend(size: int) -> int:
        if size == 0:
            return 0
        v = 0
        for _ in range(size):
            v = (v << 1) | read_bit()
        if v < (1 << (size - 1)):
            v -= (1 << size) - 1
        return v

    interleaved = len(scan_comps) > 1
    if interleaved:
        geo = {cid: sof[cid][:2] for cid, _, _ in scan_comps}
    else:
        # a single-component scan is never interleaved: the MCU is one
        # block of that component regardless of its sampling factors
        geo = {scan_comps[0][0]: (1, 1)}
    hmax = max(hi for hi, _ in geo.values())
    vmax = max(vi for _, vi in geo.values())
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        cid: np.empty((mcuy * vi * 8, mcux * hi * 8), dtype=np.float64)
        for cid, (hi, vi) in geo.items()
    }
    preds = {cid: 0 for cid, _, _ in scan_comps}
    zig = np.array(_JPEG_ZIGZAG)
    for my in range(mcuy):
        for mx in range(mcux):
            for cid, dc_id, ac_id in scan_comps:
                hi, vi = geo[cid]
                dc_map, ac_map = huff[(0, dc_id)], huff[(1, ac_id)]
                q = qtabs[sof[cid][2]]
                for byi in range(vi):
                    for bxi in range(hi):
                        zz = np.zeros(64, dtype=np.int64)
                        size = read_huff(dc_map)
                        preds[cid] += receive_extend(size)
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            sym = read_huff(ac_map)
                            if sym == 0x00:  # EOB
                                break
                            run, s = sym >> 4, sym & 0x0F
                            if s == 0 and run != 15:
                                raise ValueError("invalid AC symbol")
                            k += run
                            if s:
                                if k > 63:
                                    raise ValueError("AC index out of range")
                                zz[k] = receive_extend(s)
                                k += 1
                            else:
                                k += 1  # ZRL consumed 16 zeros total
                        coef = np.zeros(64, dtype=np.float64)
                        coef[zig] = zz * q[np.arange(64)]
                        block = idct2(coef.reshape(8, 8)) + 128.0
                        y0 = (my * vi + byi) * 8
                        x0 = (mx * hi + bxi) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
    if len(scan_comps) == 1:
        out = planes[scan_comps[0][0]]
        px = np.clip(np.round(out[:h, :w]), 0, 255)
        return w, h, px
    # color: upsample chroma by sample replication, JFIF YCbCr -> RGB
    full = {}
    for cid, (hi, vi) in geo.items():
        plane = planes[cid]
        if vi < vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        if hi < hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        full[cid] = plane[:h, :w]
    y, cb, cr = (full[cid] for cid, _, _ in scan_comps)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    px = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255)
    return w, h, px


# --- format-dispatch real decode (sniff-media) ---------------------


def sniff_media(buf: bytes) -> str:
    """Magic-byte format sniff over an opaque binary payload — the
    entry point of the generic real-decode path: at 100 TB a media
    column is a mixed bag of formats (and garbage), so the decode
    operator must dispatch per ROW, not per table. Returns one of
    'ppm'/'png'/'bmp'/'gif'/'jpeg'/'wav'/'unknown' (jpeg covers both
    grayscale and color — the parser dispatches on SOF0); never
    raises."""
    if buf[:2] == b"P6":
        return "ppm"
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if buf[:2] == b"BM":
        return "bmp"
    if buf[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if buf[:2] == b"\xff\xd8":
        return "jpeg"
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "wav"
    return "unknown"


_IMAGE_PARSERS = {
    "ppm": _parse_ppm,
    "png": _parse_png,
    "bmp": _parse_bmp,
    "gif": _parse_gif,
}


def media_features_auto(media: DataFrame, round_decimals: int = 6) -> DataFrame:
    """GENERIC real feature extraction — the operator that closes the
    r6 'generic any-codec feature-extract' stub for every format this
    engine can actually decode (PPM, PNG, BMP, GIF, JPEG, WAV): sniff
    the payload's magic bytes per row, route to the matching
    from-scratch parser, and publish a uniform feature row
    (doc_id, fmt, width, height, n_pixels, mean_0, mean_1, mean_2).

    Per-format semantics: color images put channel means in
    mean_0/1/2; grayscale JPEG replicates mean_gray into all three;
    WAV has NULL width/height, n_pixels = total samples,
    mean_0 = mean amplitude, mean_1 = RMS, mean_2 NULL. Rows whose
    magic matches NO known format — AND rows whose magic matches but
    whose body fails to parse (truncated PNG, text that happens to
    start with 'P6'/'BM') — come back as fmt='unknown' with NULL
    features: a production crawl quarantines corrupt bytes instead of
    failing the job, and the NULLs make the quarantine rate visible
    to one aggregate.

    Arrow-batched mapInPandas, pure map: no shuffle, linear scale-out;
    each per-format mean is computed exactly as the single-format
    decoder computes it, so the closed-form corpus oracles carry over
    arm by arm. Color JPEG decodes for real since mid-r7
    ([[decode_jpeg_color]]) — per-channel means like the other color
    formats; truly-external codecs (MP4/MP3) are the remaining honest
    boundary, surfacing as 'unknown' here.
    """
    schema = (
        "doc_id long, fmt string, width int, height int, n_pixels long,"
        " mean_0 double, mean_1 double, mean_2 double"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        # Everything a from-scratch parser raises on a malformed BODY
        # whose magic bytes matched: truncated headers (struct),
        # corrupt deflate streams (zlib), bad LZW/Huffman codes and
        # dimension mismatches (ValueError), short reads (IndexError).
        parse_errors = (
            ValueError, IndexError, ZeroDivisionError, struct.error, zlib.error,
        )

        for pdf in batches:
            rows = {
                "doc_id": [], "fmt": [], "width": [], "height": [],
                "n_pixels": [], "mean_0": [], "mean_1": [], "mean_2": [],
            }
            for d, buf in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(buf)
                fmt = sniff_media(buf)
                w = h = npx = m0 = m1 = m2 = None
                try:
                    if fmt in _IMAGE_PARSERS:
                        w, h, px = _IMAGE_PARSERS[fmt](buf)
                        means = (
                            px.astype(np.float64)
                            .mean(axis=(0, 1))
                            .round(round_decimals)
                        )
                        npx, (m0, m1, m2) = w * h, (float(means[0]), float(means[1]),
                                                    float(means[2]))
                    elif fmt == "jpeg":
                        w, h, px = _parse_jpeg(buf)
                        npx = w * h
                        if px.ndim == 3:  # color: per-channel means
                            means = px.mean(axis=(0, 1)).round(round_decimals)
                            m0, m1, m2 = (
                                float(means[0]), float(means[1]), float(means[2])
                            )
                        else:  # grayscale: replicate mean_gray
                            m0 = m1 = m2 = round(float(px.mean()), round_decimals)
                    elif fmt == "wav":
                        c, sr, _bits, data = _parse_wav(buf)
                        samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
                        npx = int(samples.size)
                        sum_amp = int(samples.sum())
                        sum_sq = int((samples * samples).sum())
                        m0 = round(sum_amp / npx, round_decimals)
                        m1 = round(float(np.sqrt(sum_sq / npx)), round_decimals)
                except parse_errors:
                    # magic matched but the body is malformed (truncated
                    # PNG, text that happens to start with 'BM'/'P6'):
                    # quarantine like unknown-magic rows instead of
                    # failing the whole job — the documented contract.
                    fmt, w, h, npx, m0, m1, m2 = "unknown", None, None, None, None, None, None
                rows["doc_id"].append(int(d))
                rows["fmt"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(npx)
                rows["mean_0"].append(m0)
                rows["mean_1"].append(m1)
                rows["mean_2"].append(m2)
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(extract, schema)


def media_frames_real(
    media: DataFrame, every_s: float = 0.008, round_decimals: int = 6
) -> DataFrame:
    """REAL frame extraction over decodable audio payloads — the
    time-windowed sibling of :func:`media_features_auto` and the real
    replacement for the frame-extract stub wherever the codec exists:
    RIFF/WAVE payloads are sample-decoded ([[_parse_wav]]) and cut
    into consecutive ``every_s``-second windows; each window row
    carries exact int64 sums (bit-reproducible) plus the derived RMS.

    Output: (doc_id, frame_idx, frame_ts, n_samples, sum_amp, sum_sq,
    rms); window length in frames is round(every_s * sample_rate) with
    a trailing partial window kept (its n_samples says so). Non-WAV
    payloads raise — frame extraction over a still image is a caller
    bug, not data to quarantine. Arrow-batched mapInPandas, pure map.
    """
    schema = (
        "doc_id long, frame_idx int, frame_ts double, n_samples long,"
        " sum_amp long, sum_sq long, rms double"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "frame_idx": [], "frame_ts": [], "n_samples": [],
                "sum_amp": [], "sum_sq": [], "rms": [],
            }
            for d, buf in zip(pdf["doc_id"], pdf["payload"]):
                c, sr, _bits, data = _parse_wav(bytes(buf))
                samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
                n = samples.size // c
                grid = samples.reshape(n, c)
                win = max(1, int(round(every_s * sr)))
                for j in range((n + win - 1) // win):
                    seg = grid[j * win : (j + 1) * win]
                    size = int(seg.size)
                    sum_amp = int(seg.sum())
                    sum_sq = int((seg * seg).sum())
                    rows["doc_id"].append(int(d))
                    rows["frame_idx"].append(j)
                    rows["frame_ts"].append(j * every_s)
                    rows["n_samples"].append(size)
                    rows["sum_amp"].append(sum_amp)
                    rows["sum_sq"].append(sum_sq)
                    rows["rms"].append(
                        round(float(np.sqrt(sum_sq / size)), round_decimals)
                    )
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(extract, schema)


def dhash_ppm(
    media: DataFrame,
    grid_w: int = 8,
    grid_h: int = 8,
    passthrough: str = "",
) -> DataFrame:
    """Fixed-point perceptual difference hash (dHash) over decoded PPM
    payloads — the standard near-duplicate-image fingerprint (Krawetz's
    dHash: downsample to a (grid_h, grid_w+1) grayscale grid, emit one
    bit per horizontally adjacent pair, gray(x+1) > gray(x)), kept
    ENTIRELY in integer arithmetic so a SQL oracle replays it
    bit-exactly:

    - nearest-neighbor sampling: src_x = (gx * w) // (grid_w + 1),
      src_y = (gy * h) // grid_h — pure integer index math, no
      float resize (area/bilinear resamples would need a float
      rounding pin; NN keeps the whole hash exact end-to-end);
    - integer luma: gray = 299*R + 587*G + 114*B (the ITU-R 601
      weights scaled by 1000, division dropped — comparisons are
      scale-invariant so the /1000 would be dead work);
    - the 64 bits are emitted as FOUR 16-bit band columns
      (band0..band3, bit j of band k = comparison at grid position
      16k + j, row-major) — the SimHash band discipline
      (dedup._simhash_bands_md5): no signed-64-bit packing issues,
      and the bands double as the LSH bucketing keys for the pair
      join in :func:`perceptual_dup_clusters`.

    Input: (doc_id, payload) PPM rows (ppm_table / any P6 payload).
    Output: (doc_id, band0..band3). Arrow-batched mapInPandas, pure
    map — no shuffle; at 100 TB this is one linear decode pass.
    Malformed payloads raise (caller bug, not data to quarantine),
    same posture as the other codecs in this module.
    """
    n_bits = grid_w * grid_h
    if n_bits != 64:
        raise ValueError("dhash_ppm is pinned to 64-bit hashes (8x8 grid)")
    # ``passthrough`` (OPTIMIZATION_r14, guide §8.3): a schema fragment
    # of input columns (e.g. "width int, height int") copied verbatim
    # onto the fingerprint rows, so survivorship compositions read the
    # payload table ONCE — the decode pass carries the metadata the
    # rank window needs instead of a second corpus scan.
    extra = _passthrough_cols(passthrough)
    schema = "doc_id long, band0 long, band1 long, band2 long, band3 long" + (
        ", " + passthrough if extra else ""
    )

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "band0": [], "band1": [], "band2": [], "band3": [],
            }
            for d, buf in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = _parse_ppm(bytes(buf))
                xs = (np.arange(grid_w + 1, dtype=np.int64) * w) // (grid_w + 1)
                ys = (np.arange(grid_h, dtype=np.int64) * h) // grid_h
                g = px[np.ix_(ys, xs)].astype(np.int64)
                gray = 299 * g[:, :, 0] + 587 * g[:, :, 1] + 114 * g[:, :, 2]
                bits = (gray[:, 1:] > gray[:, :-1]).astype(np.int64).ravel()
                rows["doc_id"].append(int(d))
                for k in range(4):
                    seg = bits[16 * k : 16 * k + 16]
                    rows[f"band{k}"].append(int((seg << np.arange(16)).sum()))
            out = pd.DataFrame(rows)
            for c in extra:
                out[c] = pdf[c].to_numpy()
            yield out

    return media.select("doc_id", "payload", *extra).mapInPandas(
        hash_batch, schema
    )


def _passthrough_cols(passthrough: str) -> list[str]:
    """Column names of a ``passthrough`` schema fragment
    ("width int, height int" -> ["width", "height"]).

    The fragment is split on commas, so comma-bearing complex types
    ("m map<int,int>") would mis-parse into phantom columns and fail
    later with an opaque Arrow/schema error — raise here instead with
    the real reason (ADVICE r14). Every current passthrough is flat
    ints; a future complex column should extend this to a proper
    DDL parse (pyspark.sql.types._parse_datatype_string)."""
    if "<" in passthrough:
        raise ValueError(
            "passthrough schema fragments must use flat types (complex "
            f"types would mis-split on commas): {passthrough!r}"
        )
    return [c.split()[0] for c in passthrough.split(",") if c.strip()]


def perceptual_dup_clusters(
    media: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Perceptual image dedup: dHash fingerprints -> Hamming-banded
    candidate pairs -> star connected components -> per-image cluster
    labels (doc_id, cluster_id = min doc_id in the cluster, n_members).

    Scale architecture — the pair space is built over DISTINCT hashes,
    never over images: a perceptual-hash corpus is heavily degenerate
    (this fixture: ~336 distinct 64-bit hashes per 5000 images; real
    crawls repeat logos/thumbnails the same way), so banding the raw
    image table would put every copy of a popular image in one bucket
    and the bucket join would go O(N^2). Instead:

    1. one map pass computes the hash per image (:func:`dhash_ppm`);
    2. ONE groupBy collapses images to distinct hashes, keeping
       min(doc_id) as the representative and the member count —
       the shuffle key is the hash, so the reduction is map-side
       partial first (content-bounded output, not N rows);
    3. the 4x16-bit bands bucket the REPRESENTATIVES (pigeonhole: two
       hashes within Hamming 3 agree on >= 1 of 4 bands), the bucket
       self-join emits candidate pairs, xor+bit_count verifies the
       true distance — sum over buckets of |bucket|^2 where buckets
       hold distinct hashes, the same discipline as
       dedup._simhash_pairs_md5;
    4. dedup.connected_components_star labels the representative
       graph in O(log n) alternation rounds (localCheckpoint-bounded
       lineage), and one hash-keyed join maps every image back to
       its representative's cluster.

    Every image therefore crosses the wire exactly twice (the hash
    groupBy and the final label join); only distinct hashes enter the
    quadratic-risk stage. 100x ratio measured in NOTES_r13.

    Cache contract (caller-owned): the fingerprint and representative
    frames are ``persist()``-ed here because three downstream jobs
    consume each — without the persists every consumer re-runs the
    corpus-wide pandas-UDF decode. The returned DataFrame is lazy, so
    this function cannot unpersist them itself; the CALLER owns the
    release (``spark.catalog.clearCache()`` or an unpersist sweep)
    once the result is materialized. The bench's per-query clearCache
    honors this; repeated invocations without a release accumulate
    two cached frames per call.
    """
    # persist both: fps is consumed by the reps groupBy AND the final
    # label join, reps by the banded self-join (twice, inside the CC
    # edge job) AND rep_lab — without the persists each consuming job
    # re-runs the corpus-wide pandas-UDF decode (code-review r13; the
    # bench's per-query clearCache releases these)
    fps = dhash_ppm(media).persist()
    return _phash_cluster_labels(fps, max_hamming)


def ahash_ppm(media: DataFrame, grid: int = 8) -> DataFrame:
    """Fixed-point perceptual average hash (aHash) over decoded PPM
    payloads — dHash's sibling fingerprint (same downsample, but each
    bit compares a cell against the GRID MEAN instead of its right
    neighbor: robust to different distortions, so production pipelines
    run both and near-dup candidates union). Integer-exact end-to-end:
    the mean comparison ``gray > mean(grays)`` is evaluated as
    ``64 * gray > sum(grays)`` — no division, no float, so the SQL
    oracle replays every bit. Grid is 8x8 NN-sampled
    (src = (g * size) // 8), luma and band layout identical to
    :func:`dhash_ppm` (four LSB-first 16-bit bands, bit k = cell
    gy*8+gx row-major). One Arrow-batched mapInPandas, no shuffle.
    """
    if grid != 8:
        raise ValueError("ahash_ppm is pinned to 64-bit hashes (8x8 grid)")
    schema = "doc_id long, band0 long, band1 long, band2 long, band3 long"

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "band0": [], "band1": [], "band2": [], "band3": [],
            }
            for d, buf in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = _parse_ppm(bytes(buf))
                xs = (np.arange(grid, dtype=np.int64) * w) // grid
                ys = (np.arange(grid, dtype=np.int64) * h) // grid
                g = px[np.ix_(ys, xs)].astype(np.int64)
                gray = 299 * g[:, :, 0] + 587 * g[:, :, 1] + 114 * g[:, :, 2]
                bits = (64 * gray > gray.sum()).astype(np.int64).ravel()
                rows["doc_id"].append(int(d))
                for k in range(4):
                    seg = bits[16 * k : 16 * k + 16]
                    rows[f"band{k}"].append(int((seg << np.arange(16)).sum()))
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(hash_batch, schema)


def _ranked_clusters(clusters: DataFrame, dims: DataFrame, quality) -> DataFrame:
    """Cluster labels joined to per-doc dimensions and ranked within
    cluster by (``quality`` DESC, doc_id) — the ONE rank window every
    perceptual survivorship variant reads (image resolution, audio
    duration, video frame volume), so each family's survivor choice
    and drop set always partition its clusters exactly."""
    from pyspark.sql.window import Window

    return clusters.join(dims, "doc_id").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("cluster_id").orderBy(
                quality.desc(), F.col("doc_id")
            )
        ),
    )


def _perceptual_ranked(media: DataFrame, max_hamming: int) -> DataFrame:
    """Image-family ranking (resolution DESC, doc_id) — the frame both
    :func:`perceptual_dup_survivors` (rn = 1) and
    :func:`perceptual_dup_drops` (rn > 1) read.

    One payload pass (OPTIMIZATION_r14, guide §8.3): the fingerprint
    map carries width/height along, so the rank window reads the
    cached fingerprint frame instead of re-scanning (here:
    re-synthesizing) the payload table for its dimensions. Same
    caller-owned cache contract as :func:`perceptual_dup_clusters`.
    """
    fps = dhash_ppm(
        media, passthrough="width int, height int"
    ).persist()
    return _ranked_clusters(
        _phash_cluster_labels(fps, max_hamming),
        fps.select("doc_id", "width", "height"),
        F.col("width") * F.col("height"),
    )


def perceptual_dup_survivors(media: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Survivorship over the perceptual clusters — the decision a real
    media pipeline ships: per dHash cluster keep the HIGHEST-RESOLUTION
    copy (width*height from the decoded header), min doc_id on ties.
    Output: (cluster_id, survivor_id, width, height, n_members), one
    row per cluster. Composition of :func:`perceptual_dup_clusters`
    with the images' own dimensions — the media twin of the text
    family's dedup_survivors (corpus.survivorship discipline: rank
    inside the cluster, rn=1). The rank window shuffles on cluster_id;
    everything upstream keeps the distinct-hash bounds.
    """
    ranked = _perceptual_ranked(media, max_hamming)
    return ranked.filter(F.col("rn") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("survivor_id"),
        "width",
        "height",
        "n_members",
    )


def ppm_table_seeded(documents: DataFrame, seed_col: str = "seed") -> DataFrame:
    """:func:`ppm_table` with the pixel/dimension formula keyed on a
    caller-supplied SEED column instead of doc_id — docs sharing a
    seed get byte-identical payloads while keeping their own doc_id.
    The planted-duplicate fixture for image+text dedup compositions
    (LAION-style caption corpora repeat the same thumbnail under many
    captions; ``seed = doc_id % H`` reproduces that shape
    deterministically, so the SQL oracle replays every pixel from the
    seed). Same closed form as :func:`ppm_table`: width = 4 + s % 5,
    height = 3 + s % 4, channels of pixel i = (s + c*i) % 256.
    Arrow-batched mapInPandas, pure map (no shuffle).
    """
    schema = "doc_id long, width int, height int, payload binary"

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "payload": []}
            for d, s in zip(pdf["doc_id"], pdf[seed_col]):
                d, s = int(d), int(s)
                w, h, payload = _ppm_payload(s)
                rows["doc_id"].append(d)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["payload"].append(payload)
            yield pd.DataFrame(rows)

    return documents.select("doc_id", seed_col).mapInPandas(synth, schema)


def _phash_rep_pairs(
    fps: DataFrame, max_hamming: int
) -> tuple[DataFrame, DataFrame]:
    """(reps, verified rep pairs) for one perceptual-hash family —
    the distinct-hash collapse + Hamming-banded self-join of
    :func:`perceptual_dup_clusters`, factored for compositions that
    run MORE than one hash family over the same corpus. ``fps`` is a
    fingerprint frame (doc_id, band0..band3); ``reps`` is the
    content-bounded distinct-hash table (bands, rep_id = min doc_id,
    n_docs); ``pairs`` is (rep_id_a, rep_id_b) verified at
    xor+bit_count distance <= max_hamming over the 4x16-bit-band
    pigeonhole candidates. The caller owns persisting ``reps`` (both
    self-join sides and any downstream label join consume it).
    """
    bands = [f"band{k}" for k in range(4)]
    reps = fps.groupBy(*bands).agg(
        F.min("doc_id").alias("rep_id"), F.count("*").alias("n_docs")
    )
    banded = reps.select(
        "rep_id",
        *bands,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"), F.col(f"band{k}").alias("bucket")
                    )
                    for k in range(4)
                ]
            )
        ).alias("bb"),
    ).select("rep_id", *bands, "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    hamming = sum(
        F.bit_count(
            F.col(f"a.band{k}").bitwiseXOR(F.col(f"b.band{k}")).cast("long")
        )
        for k in range(4)
    )
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.rep_id") < F.col("b.rep_id")),
        )
        .select(
            F.col("a.rep_id").alias("rep_id_a"),
            F.col("b.rep_id").alias("rep_id_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
        .select("rep_id_a", "rep_id_b")
    )
    return reps, pairs


def _phash_label_docs(
    fps: DataFrame, reps: DataFrame, labels: DataFrame
) -> DataFrame:
    """(doc_id, cluster_id, n_members) from a fingerprint frame, its
    rep table, and CC labels over the rep ids — the shared label tail
    of every perceptual-dedup composition (image single-family, image
    dual-family union, audio): reps LEFT-join labels (isolated reps
    label themselves), one hash-keyed join maps every doc back, one
    window counts members."""
    from pyspark.sql.window import Window

    bands = [f"band{k}" for k in range(4)]
    rep_lab = reps.join(
        labels, reps["rep_id"] == labels["doc_id"], "left"
    ).select(
        *[reps[c] for c in bands],
        F.coalesce(labels["cluster_id"], reps["rep_id"]).alias("cluster_id"),
    )
    docs = fps.join(rep_lab, bands).select("doc_id", "cluster_id")
    return docs.select(
        "doc_id",
        "cluster_id",
        F.count("*")
        .over(Window.partitionBy("cluster_id"))
        .cast("long")
        .alias("n_members"),
    )


def _phash_cluster_labels(fps: DataFrame, max_hamming: int) -> DataFrame:
    """Single-family perceptual clustering over a (doc_id, band0..3)
    fingerprint frame: rep collapse + banded verify
    (:func:`_phash_rep_pairs`), star CC, label tail
    (:func:`_phash_label_docs`). ``fps`` should arrive persisted (it
    feeds the rep groupBy and the final label join); the rep table is
    persisted here (band self-join x2 inside the iterative CC edge
    job + the label join)."""
    from .dedup import connected_components_star

    reps, pairs = _phash_rep_pairs(fps, max_hamming)
    reps = reps.persist()
    labels = connected_components_star(pairs, id_a="rep_id_a", id_b="rep_id_b")
    return _phash_label_docs(fps, reps, labels)


def perceptual_dup_clusters_union(
    media: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Dual-family perceptual image dedup: a pair of images is a
    near-dup if dHash OR aHash says so — the candidate-union posture
    production media dedup ships (each family is robust to different
    distortions: dHash to global brightness shifts, aHash to local
    pixel noise; running both and unioning candidates is the standard
    recall move). Output: (doc_id, cluster_id, n_members), one label
    set over the UNION graph — same schema as
    :func:`perceptual_dup_clusters`.

    Scale architecture — the union never leaves rep space:

    1. one map pass per family computes the fingerprints
       (:func:`dhash_ppm`, :func:`ahash_ppm`);
    2. each family collapses to its OWN distinct-hash representative
       table (content-bounded, min doc_id as rep) and runs its own
       Hamming-banded rep self-join — the per-family quadratic-risk
       stage keeps the per-family distinct-hash bound;
    3. the two rep-pair sets union with BRIDGE edges — one edge
       (dhash_rep(doc), ahash_rep(doc)) per distinct (d-rep, a-rep)
       combination, O(distinct hash combos) <= O(N) and linear to
       build (one join of the two fingerprint frames on doc_id) —
       which glue the families: two docs identical under aHash but
       far under dHash reach each other through their shared a-rep;
    4. ONE star-CC labels the union graph
       ([[dedup.connected_components_star]]), and every image joins
       its cluster through its d-rep (its a-rep lands in the same
       component by the bridge edge, so either family's label join
       gives the identical answer).

    cluster_id remains the min doc_id of the doc-level cluster: every
    rep id IS a member doc's id, and the cluster's minimal doc is the
    min of its own d-hash group, hence a rep, hence a CC node.

    Cache contract (caller-owned): the two fingerprint frames and the
    two rep tables are persisted here (each feeds 2-3 downstream
    jobs, incl. the iterative CC); the returned frame is lazy, so the
    CALLER releases the cache once materialized — same contract as
    :func:`perceptual_dup_clusters`.
    """
    from .dedup import connected_components_star

    bands = [f"band{k}" for k in range(4)]
    fps_d = dhash_ppm(media).persist()
    fps_a = ahash_ppm(media).persist()
    reps_d, pairs_d = _phash_rep_pairs(fps_d, max_hamming)
    reps_a, pairs_a = _phash_rep_pairs(fps_a, max_hamming)
    reps_d, reps_a = reps_d.persist(), reps_a.persist()
    a_named = fps_a.select(
        "doc_id", *[F.col(b).alias(f"a_{b}") for b in bands]
    )
    bridges = (
        fps_d.join(a_named, "doc_id")
        .join(reps_d.select(*bands, F.col("rep_id").alias("rep_d")), bands)
        .join(
            reps_a.select(
                *[F.col(b).alias(f"a_{b}") for b in bands],
                F.col("rep_id").alias("rep_a"),
            ),
            [f"a_{b}" for b in bands],
        )
        .filter(F.col("rep_d") != F.col("rep_a"))
        .select(
            F.col("rep_d").alias("rep_id_a"), F.col("rep_a").alias("rep_id_b")
        )
        .distinct()
    )
    edges = pairs_d.unionByName(pairs_a).unionByName(bridges)
    labels = connected_components_star(edges, id_a="rep_id_a", id_b="rep_id_b")
    return _phash_label_docs(fps_d, reps_d, labels)


def perceptual_dup_drops(media: DataFrame, max_hamming: int = 3) -> DataFrame:
    """The DROP side of perceptual survivorship: every image that is
    NOT its cluster's highest-resolution copy (min doc_id on ties) —
    the complement of :func:`perceptual_dup_survivors`, as a
    (doc_id) frame ready for an anti-join gate in a curation
    pipeline. Same rank window (cluster_id partition), same upstream
    distinct-hash bounds; singleton clusters drop nothing.
    """
    return _perceptual_ranked(media, max_hamming).filter(
        F.col("rn") > 1
    ).select("doc_id")


def afp_wav(
    media: DataFrame, windows: int = 65, passthrough: str = ""
) -> DataFrame:
    """Fixed-point perceptual AUDIO fingerprint over the real RIFF/WAVE
    PCM16 decode — the audio member of the perceptual-hash family
    (dHash/aHash for images, this for waveforms; the
    Chromaprint/AcoustID posture re-expressed exactly computable):

    1. channels mix to mono by EXACT int64 frame sum (no /c divide —
       sign comparisons are scale-invariant, the same trick as the
       luma x1000 in :func:`dhash_ppm`);
    2. the waveform splits into 65 contiguous windows by the integer
       assignment w = (i * 65) // n_frames (empty tail windows at
       n_frames < 65 count as energy 0);
    3. per-window ENERGY e_w = sum of squared mono samples — exact
       int64 (|mono| <= 2*32768 -> e_w <= ~3.4e12 at fixture frame
       counts, far below 2^63);
    4. 64 bits: bit_k = e_{k+1} > e_k — the temporal energy-envelope
       CONTOUR, robust to global gain exactly like dHash's gradient
       signs are to brightness;
    5. four LSB-first 16-bit bands (the shared band discipline, so the
       hashes feed the same rep/pair/CC machinery and the SQL oracle
       replays every bit from wav_table's closed-form samples).

    One Arrow-batched mapInPandas, no shuffle. Output:
    (doc_id, band0..band3).
    """
    if windows != 65:
        raise ValueError("afp_wav is pinned to 64-bit fingerprints (65 windows)")
    # passthrough: see dhash_ppm — one payload pass carries the
    # survivorship metadata (OPTIMIZATION_r14, guide §8.3)
    extra = _passthrough_cols(passthrough)
    schema = "doc_id long, band0 long, band1 long, band2 long, band3 long" + (
        ", " + passthrough if extra else ""
    )

    def fp_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "band0": [], "band1": [], "band2": [], "band3": [],
            }
            for d, buf in zip(pdf["doc_id"], pdf["payload"]):
                c, _sr, _bits, data = _parse_wav(bytes(buf))
                samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
                n = samples.size // c
                mono = samples.reshape(n, c).sum(axis=1)
                w = (np.arange(n, dtype=np.int64) * 65) // n
                # np.add.at (not bincount, whose weights pass through
                # float64): the energy sums must stay exact int64 for
                # the bit-exact oracle contract
                e = np.zeros(65, dtype=np.int64)
                np.add.at(e, w, mono * mono)
                bits = (e[1:] > e[:-1]).astype(np.int64)
                rows["doc_id"].append(int(d))
                for k in range(4):
                    seg = bits[16 * k : 16 * k + 16]
                    rows[f"band{k}"].append(int((seg << np.arange(16)).sum()))
            out = pd.DataFrame(rows)
            for c2 in extra:
                out[c2] = pdf[c2].to_numpy()
            yield out

    return media.select("doc_id", "payload", *extra).mapInPandas(
        fp_batch, schema
    )


def audio_dup_clusters(media: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Perceptual AUDIO dedup end-to-end: :func:`afp_wav` fingerprints
    -> distinct-hash representative collapse + Hamming-banded rep
    pair join (:func:`_phash_rep_pairs` — the identical
    quadratic-stage bound the image family uses: only distinct
    fingerprints enter the band join) -> star connected components ->
    (doc_id, cluster_id, n_members). The audio twin of
    :func:`perceptual_dup_clusters`; a multimodal training corpus
    dedups each modality with the same discipline, differing only in
    the fingerprint map pass.

    Cache contract (caller-owned): fingerprint + rep frames are
    persisted here (each feeds the band join, the CC edge job and the
    final label join); the returned frame is lazy — the caller
    releases the cache once materialized, same as the image family.
    """
    fps = afp_wav(media).persist()
    return _phash_cluster_labels(fps, max_hamming)


def vfp_gif(
    media: DataFrame, frames: int = 4, passthrough: str = ""
) -> DataFrame:
    """Fixed-point perceptual VIDEO fingerprint over the real animated
    GIF decode — the video member of the perceptual-hash family
    (dHash/aHash for images, :func:`afp_wav` for audio, this for
    clips; the frame-sampled-signature posture of production video
    dedup, e.g. TMK/videohash, re-expressed exactly computable):

    1. the clip decodes through :func:`_parse_gif_frames` (the
       from-scratch LZW codec + full disposal compositing — the real
       video path, not a header read);
    2. FOUR frames sample the timeline at f_k = (k*(nf-1)) // 3,
       k = 0..3 — first / one-third / two-thirds / last. Clips
       shorter than 4 frames repeat boundary frames (deliberate: the
       fingerprint is constant-size, so clips of different lengths
       stay comparable);
    3. each sampled frame hashes to 16 bits: a 4x5 NN-sampled integer
       grid (src_x = (gx*w)//5, src_y = (gy*h)//4), integer luma
       299R+587G+114B, bit = right-neighbor gradient sign — dHash's
       exact-integer discipline at quarter size;
    4. band_k IS frame k's 16-bit hash (LSB-first, bit gy*4+gx
       row-major) — so the shared 4x16-bit band layout gets a
       MEANINGFUL pigeonhole: two clips are band-join candidates iff
       they agree exactly on >= 1 sampled frame's coarse hash, and
       :func:`_phash_rep_pairs` / star CC / the SQL oracle generators
       compose verbatim.

    One Arrow-batched mapInPandas, no shuffle. Output:
    (doc_id, band0..band3). Malformed payloads raise (caller bug),
    same posture as the other codecs in this module.
    """
    if frames != 4:
        raise ValueError("vfp_gif is pinned to 64-bit fingerprints (4 frames)")
    # passthrough: see dhash_ppm — one payload pass carries the
    # survivorship metadata (OPTIMIZATION_r14, guide §8.3)
    extra = _passthrough_cols(passthrough)
    schema = "doc_id long, band0 long, band1 long, band2 long, band3 long" + (
        ", " + passthrough if extra else ""
    )

    def fp_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "band0": [], "band1": [], "band2": [], "band3": [],
            }
            for d, buf in zip(pdf["doc_id"], pdf["payload"]):
                _sw, _sh, frs = _parse_gif_frames(bytes(buf))
                nf = len(frs)
                rows["doc_id"].append(int(d))
                for k in range(4):
                    px = frs[(k * (nf - 1)) // 3][1].astype(np.int64)
                    h, w = px.shape[0], px.shape[1]
                    xs = (np.arange(5, dtype=np.int64) * w) // 5
                    ys = (np.arange(4, dtype=np.int64) * h) // 4
                    g = px[np.ix_(ys, xs)]
                    gray = 299 * g[:, :, 0] + 587 * g[:, :, 1] + 114 * g[:, :, 2]
                    bits = (gray[:, 1:] > gray[:, :-1]).astype(np.int64).ravel()
                    rows[f"band{k}"].append(int((bits << np.arange(16)).sum()))
            out = pd.DataFrame(rows)
            for c in extra:
                out[c] = pdf[c].to_numpy()
            yield out

    return media.select("doc_id", "payload", *extra).mapInPandas(
        fp_batch, schema
    )


def video_dup_clusters(media: DataFrame, max_hamming: int = 1) -> DataFrame:
    """Perceptual VIDEO dedup end-to-end: :func:`vfp_gif` fingerprints
    -> distinct-hash representative collapse + Hamming-banded rep pair
    join (:func:`_phash_rep_pairs` — only distinct fingerprints enter
    the quadratic-risk stage, the image/audio families' bound reused
    verbatim) -> star connected components ->
    (doc_id, cluster_id, n_members). Completes the perceptual family
    across all four payload modalities: text (MinHash/SimHash), image
    (dHash/aHash), audio (afp_wav), video (this) — one dedup
    discipline, differing only in the fingerprint map pass.

    Cache contract (caller-owned): fingerprint + rep frames are
    persisted here (each feeds the band join, the CC edge job and the
    final label join); the returned frame is lazy — the caller
    releases the cache once materialized, same as the image family.
    """
    fps = vfp_gif(media).persist()
    return _phash_cluster_labels(fps, max_hamming)


def _audio_ranked(media: DataFrame, max_hamming: int) -> DataFrame:
    """Audio-family ranking (header n_frames DESC, doc_id) — the frame
    both :func:`audio_dup_survivors` (rn = 1) and
    :func:`audio_dup_drops` (rn > 1) read. One payload pass: the
    fingerprint map carries n_frames (OPTIMIZATION_r14, guide §8.3);
    same caller-owned cache contract as :func:`audio_dup_clusters`."""
    fps = afp_wav(media, passthrough="n_frames int").persist()
    return _ranked_clusters(
        _phash_cluster_labels(fps, max_hamming),
        fps.select("doc_id", "n_frames"),
        F.col("n_frames"),
    )


def _video_ranked(media: DataFrame, max_hamming: int) -> DataFrame:
    """Video-family ranking (frame volume nf*w*h DESC, doc_id) — the
    frame both :func:`video_dup_survivors` (rn = 1) and
    :func:`video_dup_drops` (rn > 1) read. One payload pass — for the
    video family this is the one that matters most: the second scan
    this replaces re-ran the GIF synthesis/LZW encode of every clip
    just to read three header columns (OPTIMIZATION_r14, guide §8.3).
    Same caller-owned cache contract as :func:`video_dup_clusters`."""
    fps = vfp_gif(
        media, passthrough="width int, height int, n_frames int"
    ).persist()
    return _ranked_clusters(
        _phash_cluster_labels(fps, max_hamming),
        fps.select("doc_id", "width", "height", "n_frames"),
        F.col("n_frames") * F.col("width") * F.col("height"),
    )


def audio_dup_survivors(media: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Survivorship over the perceptual AUDIO clusters — per
    :func:`audio_dup_clusters` cluster keep the LONGEST clip
    (n_frames from the WAV header; duration is the audio analogue of
    image resolution: the longest capture of a repeated jingle carries
    the most signal), min doc_id on ties. Output:
    (cluster_id, survivor_id, n_frames, n_members), one row per
    cluster — the audio member of the survivorship family
    (:func:`perceptual_dup_survivors` for images,
    corpus.dedup_survivors for text). Same shared rank window
    (:func:`_ranked_clusters`); everything upstream keeps the
    distinct-fingerprint bounds.
    """
    ranked = _audio_ranked(media, max_hamming)
    return ranked.filter(F.col("rn") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("survivor_id"),
        "n_frames",
        "n_members",
    )


def audio_dup_drops(media: DataFrame, max_hamming: int = 2) -> DataFrame:
    """The DROP side of audio survivorship: every clip that is NOT its
    cluster's longest copy (min doc_id on ties) — the rn > 1
    complement of :func:`audio_dup_survivors`, as a (doc_id) frame
    ready for an anti-join gate in a curation pipeline (the audio twin
    of :func:`perceptual_dup_drops`)."""
    return _audio_ranked(media, max_hamming).filter(
        F.col("rn") > 1
    ).select("doc_id")


def video_dup_survivors(media: DataFrame, max_hamming: int = 1) -> DataFrame:
    """Survivorship over the perceptual VIDEO clusters — per
    :func:`video_dup_clusters` cluster keep the clip with the most
    CONTENT: frame volume n_frames * width * height (the video
    analogue of image resolution — more sampled frames of a bigger
    canvas), min doc_id on ties. Output:
    (cluster_id, survivor_id, n_frames, width, height, n_members),
    one row per cluster. Completes survivorship across the modality
    set: text keep-first / image resolution / audio duration / video
    frame volume — one rank-window discipline
    (:func:`_ranked_clusters`).
    """
    ranked = _video_ranked(media, max_hamming)
    return ranked.filter(F.col("rn") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("survivor_id"),
        "n_frames",
        "width",
        "height",
        "n_members",
    )


def video_dup_drops(media: DataFrame, max_hamming: int = 1) -> DataFrame:
    """The DROP side of video survivorship: every clip that is NOT its
    cluster's largest-frame-volume copy (min doc_id on ties) — the
    rn > 1 complement of :func:`video_dup_survivors`, as a (doc_id)
    frame ready for an anti-join gate in a curation pipeline (the
    video twin of :func:`perceptual_dup_drops`)."""
    return _video_ranked(media, max_hamming).filter(
        F.col("rn") > 1
    ).select("doc_id")


def multimodal_dedup_report(
    documents: DataFrame,
    images: DataFrame,
    audio: DataFrame,
    video: DataFrame,
    text_max_hamming: int = 3,
    image_max_hamming: int = 3,
    audio_max_hamming: int = 2,
    video_max_hamming: int = 1,
) -> DataFrame:
    """The capstone of the perceptual-dedup family: ONE dedup report
    across all four payload modalities, each running the IDENTICAL
    rep/band/CC discipline and differing only in its fingerprint map
    pass — text SimHash (dedup._simhash_bands_md5), image dHash
    (:func:`dhash_ppm`), audio energy contour (:func:`afp_wav`),
    video frame-sampled gradient (:func:`vfp_gif`). All four emit the
    shared (doc_id, band0..band3) band contract, so
    :func:`_phash_cluster_labels` (distinct-fingerprint collapse ->
    Hamming-banded rep pairs -> star CC -> labels) is literally the
    same code path per modality. Text runs the WIDE 128-bit family
    (4x32-bit bands — simhash_pairs_wide's scale-safe width: real
    text fingerprints are near-unique, so 16-bit band buckets would
    go N^2/2^16 at web scale; 32-bit bands keep the candidate join
    linear); the payload families keep their 64-bit 4x16-bit layout
    (their fingerprint spaces are content-degenerate and collapse to
    reps first).

    Output: one row per modality —
    (modality, n_docs, n_distinct_fp, n_clusters, n_dup_docs,
    max_cluster_size) — the corpus-curation dashboard a multimodal
    training pipeline reads before choosing drop thresholds.
    n_docs is the fingerprinted population (text counts docs with
    >= 3 words, the SimHash shingle floor). Per-modality verify
    distances follow each family's registered defaults (image 3,
    audio 2, video 1 — coarser per-band semantics tighten the
    radius; see each cluster function's docstring).

    Scale: four independent bounded pipelines (no cross-modality
    join). Cache contract (caller-owned): one fingerprint + one rep
    frame persist per modality, same as the cluster functions.

    Batched labeling + aggregation (OPTIMIZATION_r15, guide §1.2 —
    fewer driver actions / stage submissions, values unchanged): the
    r14 shape ran FOUR independent star-CC invocations (each an eager
    checkpoint + count + labeling job) and EIGHT single-row aggregates
    glued by cross joins. The four rep-pair graphs are disjoint by
    construction (components never cross modalities), so one CC over
    the tag-encoded union labels all four at once: rep ids are encoded
    ``rep_id * 4 + modality`` (shiftleft — exact integer arithmetic,
    monotone per modality, so the component MINIMUM of an encoded
    graph is the encoding of the per-modality minimum and the decode
    ``shiftright(label, 2)`` recovers exactly the per-modality
    cluster_id the separate runs produced), and the per-modality
    stats/fingerprint aggregates become two tag-keyed groupBys + one
    5-row join instead of eight aggregates + four cross joins.
    """
    from .dedup import _simhash_bands_md5, connected_components_star

    fams = [
        ("text", _simhash_bands_md5(documents, n_bits=128), text_max_hamming),
        ("image", dhash_ppm(images), image_max_hamming),
        ("audio", afp_wav(audio), audio_max_hamming),
        ("video", vfp_gif(video), video_max_hamming),
    ]
    fps_l, reps_l, pairs_l = [], [], []
    for i, (_name, fps, max_hamming) in enumerate(fams):
        fps = fps.persist()
        reps, pairs = _phash_rep_pairs(fps, max_hamming)
        fps_l.append(fps)
        reps_l.append(reps.persist())
        pairs_l.append(
            pairs.select(
                (F.shiftleft(F.col("rep_id_a"), 2) + F.lit(i)).alias("rep_id_a"),
                (F.shiftleft(F.col("rep_id_b"), 2) + F.lit(i)).alias("rep_id_b"),
            )
        )
    union_pairs = pairs_l[0]
    for p in pairs_l[1:]:
        union_pairs = union_pairs.unionByName(p)
    lab_all = connected_components_star(
        union_pairs, id_a="rep_id_a", id_b="rep_id_b"
    ).persist()
    labeled = None
    for i, (name, _fps, _h) in enumerate(fams):
        lab_i = lab_all.filter(F.col("doc_id") % 4 == i).select(
            F.shiftright(F.col("doc_id"), 2).alias("doc_id"),
            F.shiftright(F.col("cluster_id"), 2).alias("cluster_id"),
        )
        part = _phash_label_docs(fps_l[i], reps_l[i], lab_i).withColumn(
            "modality", F.lit(name)
        )
        labeled = part if labeled is None else labeled.unionByName(part)
    stats = labeled.groupBy("modality").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
        F.sum((F.col("n_members") > 1).cast("long")).alias("n_dup_docs"),
        F.max("n_members").cast("long").alias("max_cluster_size"),
    )
    tagged_fps = None
    for i, (name, _fps, _h) in enumerate(fams):
        part = fps_l[i].withColumn("modality", F.lit(name))
        tagged_fps = part if tagged_fps is None else tagged_fps.unionByName(part)
    nfp = tagged_fps.groupBy("modality").agg(
        F.countDistinct("band0", "band1", "band2", "band3")
        .cast("long")
        .alias("n_distinct_fp")
    )
    return stats.join(nfp, "modality").select(
        "modality",
        "n_docs",
        "n_distinct_fp",
        "n_clusters",
        "n_dup_docs",
        "max_cluster_size",
    )
