"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
iterators (mapInPandas).

The image path is REAL for BMP, PNG, and baseline JPEG: this module
carries a from-scratch 24-bit uncompressed BMP codec (numpy + struct),
a from-scratch PNG codec on stdlib zlib (8-bit gray/RGB/RGBA,
non-interlaced, all five scanline filters), and a from-scratch
baseline JPEG codec (operators/jpeg.py: huffman entropy coding,
DCT/IDCT, 4:4:4/4:2:2/4:2:0, grayscale, restart markers).  The fixture
adapter synthesizes genuine payloads, and decode / feature-extract /
resize operate on actual pixel arrays with magic-byte dispatch
(:func:`decode_image`).  Progressive JPEG / arithmetic coding refuse
loudly; ``fake=True`` keeps the old deterministic byte-stub for
payloads that aren't images at all.

Scale notes: binary payloads dominate row size, so
``spark.sql.files.maxPartitionBytes`` governs decode parallelism, and
feature extraction must stream per-batch (mapInPandas iterator) rather
than collecting a partition into memory.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# BMP codec (Windows BITMAPINFOHEADER, 24bpp, BI_RGB).  Public format:
# 14-byte file header + 40-byte info header + bottom-up BGR rows, each
# padded to a 4-byte boundary.
# --------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> BMP file bytes."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("encode_bmp expects (H, W, 3) RGB")
    row_len = (w * 3 + 3) & ~3
    img_size = row_len * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, row_len), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, RGB->BGR
    return header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP file bytes -> (H, W, 3) uint8 RGB.  Supports the 24bpp
    uncompressed encoding this module writes (and most real-world
    .bmp files)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression} unsupported")
    bottom_up = h > 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=row_len * h, offset=offset)
    px = rows.reshape(h, row_len)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    return px[::-1] if bottom_up else px


# --------------------------------------------------------------------------
# PNG codec (from scratch on stdlib zlib -- no PIL).  Writes 8-bit RGB
# with filter 0; reads 8-bit gray/RGB/RGBA, non-interlaced, all five
# scanline filters (None/Sub/Up/Average/Paeth).  Covers what PNG
# encoders actually emit for photos/screenshots; palette, 16-bit, and
# Adam7 interlace raise loudly.
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    import zlib

    crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + typ + payload + struct.pack(">I", crc)


def encode_png(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> PNG bytes (8-bit truecolor, filter 0)."""
    import zlib

    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("encode_png expects (H, W, 3) RGB")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, 3) uint8 RGB.  8-bit depth, color types
    0 (gray: replicated to RGB), 2 (RGB), 6 (RGBA: alpha dropped),
    non-interlaced; all five scanline filters."""
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if typ == b"IHDR":
            meta = struct.unpack(">IIBBBBB", payload)
        elif typ == b"IDAT":
            idat.append(payload)
        elif typ == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = meta
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or ctype not in (0, 2, 6):
        raise NotImplementedError(
            f"PNG depth={depth} colortype={ctype} interlace={interlace} unsupported "
            "(8-bit gray/RGB/RGBA non-interlaced only)"
        )
    nch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub/Average/Paeth need the running left neighbor
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                if ftype == 1:
                    cur[i] = (line[i] + a) & 0xFF
                elif ftype == 3:
                    cur[i] = (line[i] + (a + b) // 2) & 0xFF
                elif ftype == 4:
                    cur[i] = (line[i] + _paeth(a, b, c)) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, nch)
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3]


def decode_image(data: bytes) -> np.ndarray:
    """Magic-byte dispatch to the native codecs: BMP, PNG, or baseline
    JPEG (operators/jpeg.py) -> (H, W, 3) uint8 RGB."""
    b = bytes(data)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:8] == _PNG_SIG:
        return decode_png(b)
    if b[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(b)
    raise NotImplementedError(
        "unsupported image format (native codecs: BMP, PNG, baseline JPEG)"
    )


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an (H, W, 3) array -- real image
    resizing without an external library."""
    h, w = pixels.shape[:2]
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return pixels[yi][:, xi]


def synth_bmp(seed: int, width: int, height: int) -> bytes:
    """Deterministic test-image generator: a seed-keyed affine gradient
    (distinct per doc, reproducible across runs/executors)."""
    y, x = np.mgrid[0:height, 0:width]
    r = (seed * 31 + x * 7 + y * 13) % 256
    g = (seed * 17 + x * 3 + y * 11) % 256
    b = (seed * 53 + x * 5 + y * 2) % 256
    return encode_bmp(np.stack([r, g, b], axis=-1).astype(np.uint8))


# --------------------------------------------------------------------------
# WAV codec (RIFF/WAVE, 16-bit PCM).  Public format: 12-byte RIFF
# header + 'fmt ' chunk (PCM params) + 'data' chunk of little-endian
# int16 samples.
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000, channels: int = 1) -> bytes:
    """1-D int16 sample array -> mono (or interleaved) WAV bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    return struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE") + fmt + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 sample array, sample_rate).  Supports the
    16-bit PCM encoding this module writes (and standard .wav files);
    walks chunks, so extra chunks (LIST/INFO) are skipped."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sample_rate, bits, fmt_code = 12, None, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = pos + 8
        if cid == b"fmt ":
            fmt_code, _ch, sample_rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", data, body)
        elif cid == b"data":
            if fmt_code != 1 or bits != 16:
                raise NotImplementedError(f"WAV fmt={fmt_code} bits={bits} unsupported")
            samples = np.frombuffer(data, dtype="<i2", count=size // 2, offset=body)
            return samples, int(sample_rate)
        pos = body + size + (size & 1)  # chunks are word-aligned
    raise ValueError("WAV payload has no data chunk")


def synth_wav(seed: int, n_samples: int = 1600, sample_rate: int = 16_000) -> bytes:
    """Deterministic test-audio generator: a seed-keyed tone with one
    harmonic (distinct per doc, reproducible)."""
    f0 = 110.0 + (seed % 40) * 20.0
    t = np.arange(n_samples) / sample_rate
    wave = 0.6 * np.sin(2 * np.pi * f0 * t) + 0.2 * np.sin(2 * np.pi * 2 * f0 * t + seed % 7)
    return encode_wav((wave * 32767 * 0.5).astype(np.int16), sample_rate)


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Per-clip scalar features from real samples: duration, RMS level
    (normalized to [-1,1] full scale), zero-crossing rate, peak."""
    x = samples.astype(np.float64) / 32768.0
    n = max(len(x), 1)
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    # RMS via the exact integer sum of squared int16 samples: the sum
    # is order-free, so the value is bit-identical on any host (see
    # stable_norm) -- mathematically equal to sqrt(mean((k/32768)^2))
    sq = int((samples.astype(np.int64) ** 2).sum()) if len(samples) else 0
    rms = float(np.sqrt(sq / (len(samples) * 1073741824.0))) if len(samples) else 0.0
    return {
        "duration_ms": int(round(1000.0 * len(x) / sample_rate)),
        "rms": rms,
        "zero_crossing_rate": zc / n,
        "peak": float(np.max(np.abs(x))) if len(x) else 0.0,
        "sample_rate": int(sample_rate),
    }

#: Typed metadata carried alongside every opaque media payload.
MEDIA_METADATA_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("format", T.StringType()),  # png/jpeg/wav/mp4/...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("feat_norm", T.DoubleType()),
    ]
)


def attach_media_columns(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: synthesize a genuine BMP payload per row (a
    doc-keyed gradient, dimensions varying per doc) so the multimodal
    pipeline exercises real decode/resize.  In production this column
    comes straight from the source (parquet BINARY / object-store
    pointers); only this synthesizer is fixture-specific."""
    w = (F.lit(16) + F.col(id_col) % 8).cast("int")
    h = (F.lit(12) + F.col(id_col) % 5).cast("int")

    @F.pandas_udf("binary")
    def _bmp(ids: pd.Series, ws: pd.Series, hs: pd.Series) -> pd.Series:
        return pd.Series(
            [synth_bmp(int(i), int(wv), int(hv)) for i, wv, hv in zip(ids, ws, hs)]
        )

    payload = _bmp(F.col(id_col), w, h)
    out = df.select(F.col(id_col), payload.alias("media_bytes"), w.alias("__w"), h.alias("__h"))
    return out.select(
        id_col,
        "media_bytes",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("bmp").alias("format"),
            F.col("__w").alias("width"),
            F.col("__h").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length("media_bytes").cast("long").alias("size_bytes"),
        ).alias("media_meta"),
    )


def stable_norm(f: np.ndarray) -> float:
    """L2 norm via exact fsum of squares -- MACHINE-independent, unlike
    np.linalg.norm, whose SIMD-dispatched accumulation order (AVX2 vs
    AVX512) can differ in the last ULPs across hosts.  The committed
    expected tables (tools/gen_multimodal_expected.py) must reproduce
    on any machine, so every float reduction feeding them goes through
    exact integer/fsum arithmetic (this regressed once: a container
    move flipped a handful of np.linalg.norm last-bits and broke the
    multimodal_features oracle)."""
    import math

    return math.sqrt(math.fsum(float(x) * float(x) for x in f))


def bmp_features(pixels: np.ndarray) -> np.ndarray:
    """(H, W, 3) RGB -> FEATURE_DIM pixel features: a 4x4 grid of
    grayscale block means in [0, 1] (resolution-independent, so images
    of different sizes land in the same feature space).

    Block means accumulate in exact INTEGER space (sum of uint8
    channels), with a single float division at the end -- the result
    is bit-identical on any host (see :func:`stable_norm`)."""
    sums = pixels.astype(np.int64).sum(axis=2)  # exact per-pixel RGB sum
    h, w = sums.shape
    out = np.empty(FEATURE_DIM, dtype=np.float32)
    for i in range(4):
        for j in range(4):
            block = sums[i * h // 4 : max((i + 1) * h // 4, i * h // 4 + 1),
                         j * w // 4 : max((j + 1) * w // 4, j * w // 4 + 1)]
            total = int(block.sum())  # exact, order-free
            out[i * 4 + j] = total / (block.size * 3 * 255.0)
    return out


def decode_image_batch(payloads, fake: bool = False):
    """Decode a batch of image payloads -> list of FEATURE_DIM feature
    vectors.

    BMP, PNG and baseline JPEG payloads are decoded for real (module
    codecs above + operators/jpeg.py) into pixel arrays -> grid
    features; only genuinely unsupported variants (progressive or
    arithmetic JPEG, palette PNG, exotic BMP) raise loudly.
    ``fake=True`` keeps the deterministic byte-stub (rolling byte sums)
    for payloads that aren't images at all.
    """
    out = []
    for p in payloads:
        b = bytes(p)
        if not fake:
            out.append(bmp_features(decode_image(b)))
            continue
        arr = np.frombuffer(b, dtype=np.uint8)
        if len(arr) == 0:
            out.append(np.zeros(FEATURE_DIM, dtype=np.float32))
            continue
        pad = (-len(arr)) % FEATURE_DIM
        chunks = np.pad(arr, (0, pad)).reshape(-1, FEATURE_DIM).astype(np.float32)
        out.append(chunks.mean(axis=0) / 255.0)
    return out


def extract_features(df: DataFrame, fake_decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, media_bytes): the
    real Arrow-batched pipeline shape.  Batches stream through the
    iterator; nothing accumulates per-partition."""

    def _extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = decode_image_batch(pdf["media_bytes"], fake=fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": [f.tolist() for f in feats],
                    "feat_norm": [stable_norm(f) for f in feats],
                }
            )

    return df.select("doc_id", "media_bytes").mapInPandas(_extract, FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_bytes", T.BinaryType()),
        T.StructField("media_meta", MEDIA_METADATA_TYPE),
    ]
)


def resize_images(
    df: DataFrame, width: int = 32, height: int = 32, fake: bool = False
) -> DataFrame:
    """mapInPandas image resize: payload in, re-encoded payload +
    updated metadata out.  BMP and PNG payloads are REALLY resized --
    decode -> nearest-neighbor resample -> re-encode -- with the
    module's own codecs; the output is a valid BMP of exactly
    (width, height) (normalizing to one storage format is what a real
    thumbnail stage does).  ``fake=True`` keeps the old byte
    truncate/pad stub for non-image payloads; JPEG raises loudly.
    """
    target = width * height

    def _resize(batches):
        import pandas as pd

        def _resize_one(p) -> bytes:
            b = bytes(p)
            if not fake:
                return encode_bmp(resize_nearest(decode_image(b), width, height))
            return (b * (target // max(len(b), 1) + 1))[:target] if b else b"\x00" * target

        for pdf in batches:
            out = pdf[["doc_id"]].copy()
            out["media_bytes"] = pdf["media_bytes"].map(_resize_one)
            out["media_meta"] = [
                {
                    "media_type": "image",
                    "format": "bmp" if not fake else "fake",
                    "width": width,
                    "height": height,
                    "duration_ms": None,
                    "size_bytes": len(mb),
                }
                for mb in out["media_bytes"]
            ]
            yield out

    return df.select("doc_id", "media_bytes").mapInPandas(_resize, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling plumbing for video payloads: explode each payload
    into ``n_frames`` (frame_idx, frame_bytes) rows -- the stub slices
    the byte payload evenly, standing in for keyframe extraction.  The
    explode keeps rows JVM-side; only the decoder (above) is a stub."""
    payload = F.col("media_bytes")
    size = F.length(payload)
    frame = lambda i: F.expr(  # noqa: E731
        f"substring(media_bytes, cast({i} * length(media_bytes) / {n_frames} as int) + 1, "
        f"cast(length(media_bytes) / {n_frames} as int))"
    )
    frames = F.array(*[F.struct(F.lit(i).alias("frame_idx"), frame(i).alias("frame_bytes")) for i in range(n_frames)])
    return (
        df.filter(size >= n_frames)
        .select(F.col(id_col), F.explode(frames).alias("f"))
        .select(id_col, F.col("f.frame_idx").alias("frame_idx"), F.col("f.frame_bytes").alias("frame_bytes"))
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def attach_audio_columns(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: synthesize a genuine 16-bit PCM WAV payload per
    row (seed-keyed tone, per-doc length) with typed metadata."""
    n = (F.lit(1200) + (F.col(id_col) % 5) * 200).cast("int")

    @F.pandas_udf("binary")
    def _wav(ids: pd.Series, ns: pd.Series) -> pd.Series:
        return pd.Series([synth_wav(int(i), int(nv)) for i, nv in zip(ids, ns)])

    payload = _wav(F.col(id_col), n)
    out = df.select(F.col(id_col), payload.alias("media_bytes"), n.alias("__n"))
    return out.select(
        id_col,
        "media_bytes",
        F.struct(
            F.lit("audio").alias("media_type"),
            F.lit("wav").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.col("__n") * 1000 / 16_000).cast("long").alias("duration_ms"),
            F.length("media_bytes").cast("long").alias("size_bytes"),
        ).alias("media_meta"),
    )


def extract_audio_features(df: DataFrame) -> DataFrame:
    """mapInPandas audio feature extraction over (doc_id, media_bytes):
    real WAV decode -> per-clip scalar features, Arrow-batched, nothing
    accumulated per partition."""

    def _extract(batches: Iterator) -> Iterator:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf["doc_id"], pdf["media_bytes"]):
                samples, sr = decode_wav(bytes(p))
                rows.append({"doc_id": i, **audio_features(samples, sr)})
            yield pd.DataFrame(rows)

    return df.select("doc_id", "media_bytes").mapInPandas(_extract, AUDIO_FEATURES_SCHEMA)


# --------------------------------------------------------------------------
# Y4M codec (YUV4MPEG2, C420 planar).  Public format: one ASCII header
# line, then per frame "FRAME\n" + planar Y (W*H), U, V (W/2 * H/2)
# bytes.  Color math is full-range BT.601.
# --------------------------------------------------------------------------


def _rgb_to_yuv420(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = 128.0 + (b - y) * 0.564
    v = 128.0 + (r - y) * 0.713
    sub = lambda p: (  # 2x2 box mean  # noqa: E731
        p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
    )
    clip = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(sub(u)), clip(sub(v))


def _yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    up = lambda p: p.repeat(2, axis=0).repeat(2, axis=1)  # noqa: E731
    yf, uf, vf = y.astype(np.float64), up(u).astype(np.float64) - 128, up(v).astype(np.float64) - 128
    r = yf + 1.403 * vf
    b = yf + 1.773 * uf
    g = yf - 0.714 * vf - 0.344 * uf
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def encode_y4m(frames: list[np.ndarray], fps: int = 25) -> bytes:
    """List of (H, W, 3) RGB frames (even H, W) -> YUV4MPEG2 bytes."""
    h, w = frames[0].shape[:2]
    if h % 2 or w % 2:
        raise ValueError("C420 needs even dimensions")
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A0:0 C420jpeg\n".encode()]
    for f in frames:
        y, u, v = _rgb_to_yuv420(f)
        out += [b"FRAME\n", y.tobytes(), u.tobytes(), v.tobytes()]
    return b"".join(out)


def decode_y4m(data: bytes) -> tuple[list[np.ndarray], int]:
    """YUV4MPEG2 bytes -> (list of RGB frames, fps)."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M payload")
    w = h = fps = None
    for tok in data[:nl].decode("ascii", "replace").split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fps = int(tok[1:].split(":")[0])
    if not w or not h:
        raise ValueError("Y4M header missing geometry")
    ysz, csz = w * h, (w // 2) * (h // 2)
    frames, pos = [], nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("malformed Y4M frame header")
        body = fnl + 1
        y = np.frombuffer(data, np.uint8, ysz, body).reshape(h, w)
        u = np.frombuffer(data, np.uint8, csz, body + ysz).reshape(h // 2, w // 2)
        v = np.frombuffer(data, np.uint8, csz, body + ysz + csz).reshape(h // 2, w // 2)
        frames.append(_yuv420_to_rgb(y, u, v))
        pos = body + ysz + 2 * csz
    return frames, fps or 25


def synth_y4m(seed: int, n_frames: int = 8, width: int = 16, height: int = 12) -> bytes:
    """Deterministic test-video generator: the synth_bmp gradient
    translated per frame (a 'moving' pattern, distinct per doc)."""
    frames = [
        decode_bmp(synth_bmp(seed + 7 * t, width, height)) for t in range(n_frames)
    ]
    return encode_y4m(frames, fps=10)


def sample_video_frames(df: DataFrame, every: int = 2) -> DataFrame:
    """REAL video frame sampling: decode the Y4M payload, keep every
    ``every``-th frame as actual pixels, re-encode each kept frame as a
    standalone BMP -- (doc_id, frame_idx, frame_bmp, width, height).
    The mapInPandas iterator streams batches; one input row fans out to
    ceil(n_frames / every) output rows."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_bmp", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def _sample(batches: Iterator) -> Iterator:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf["doc_id"], pdf["media_bytes"]):
                frames, _fps = decode_y4m(bytes(p))
                for idx in range(0, len(frames), every):
                    f = frames[idx]
                    rows.append(
                        {
                            "doc_id": i,
                            "frame_idx": idx,
                            "frame_bmp": encode_bmp(f),
                            "width": f.shape[1],
                            "height": f.shape[0],
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "media_bytes").mapInPandas(_sample, schema)


def attach_video_columns(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: genuine Y4M payload per row (seed-keyed moving
    gradient, per-doc frame count) with typed metadata."""
    nf = (F.lit(6) + F.col(id_col) % 4).cast("int")

    @F.pandas_udf("binary")
    def _y4m(ids: pd.Series, nfs: pd.Series) -> pd.Series:
        return pd.Series([synth_y4m(int(i), int(n)) for i, n in zip(ids, nfs)])

    payload = _y4m(F.col(id_col), nf)
    out = df.select(F.col(id_col), payload.alias("media_bytes"), nf.alias("__nf"))
    return out.select(
        id_col,
        "media_bytes",
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("y4m").alias("format"),
            F.lit(16).cast("int").alias("width"),
            F.lit(12).cast("int").alias("height"),
            (F.col("__nf") * 100).cast("long").alias("duration_ms"),  # 10 fps
            F.length("media_bytes").cast("long").alias("size_bytes"),
        ).alias("media_meta"),
    )


def extract_features_arrow(df: DataFrame, fake_decode: bool = False) -> DataFrame:
    """``mapInArrow`` twin of :func:`extract_features`: batches arrive
    and leave as ``pyarrow.RecordBatch`` -- no Arrow<->pandas
    conversion on either edge, which removes the pandas block-manager
    copy per batch.  For binary-heavy rows (media payloads) that copy
    is the dominant per-batch cost, so this is the preferred shape when
    the UDF body works on raw buffers anyway.  Parity with the pandas
    path is pinned by test."""

    def _extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            payloads = batch.column("media_bytes").to_pylist()
            feats = decode_image_batch(payloads, fake=fake_decode)
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": batch.column("doc_id"),
                    "features": pa.array(
                        [f.tolist() for f in feats], type=pa.list_(pa.float32())
                    ),
                    "feat_norm": pa.array(
                        [stable_norm(f) for f in feats], type=pa.float64()
                    ),
                }
            )

    return df.select("doc_id", "media_bytes").mapInArrow(_extract, FEATURES_SCHEMA)
