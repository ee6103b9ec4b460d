"""Multimodal-column queries.

Pixel decoding is not SQL-expressible, but every query here is a PURE
FUNCTION of ``doc_id`` (fixture media is synthesized from the id and
the codecs are deterministic), so each gets a real DuckDB oracle by
joining the sf's documents table against a precomputed expected table
(``fixtures/expected_multimodal/``, generated once through the same
pixel-tested codec path by tools/gen_multimodal_expected.py).  The
oracle therefore isolates exactly the DISTRIBUTED layer -- mapInPandas
signatures, Arrow batching, explode fan-out, schema, partitioning --
while the codec math itself is verified independently at pixel level
(tests/test_multimodal.py, tests/test_jpeg.py).  The fixture payloads
are genuine BMP/PNG/JPEG/WAV/Y4M bytes and the decode/resize path
operates on real pixels (operators/multimodal carries from-scratch
codecs)."""

from __future__ import annotations

import os

import pandas as pd  # module-level: pandas_udf resolves string hints in module globals
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_media_columns, extract_features, sample_frames
from ..sources.readers import read_documents
from ._exact import davg, sql_davg
from .registry import register

#: precomputed expected tables (see module docstring); absolute path so
#: the oracle SQL works from any cwd
_EXPECTED = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "fixtures", "expected_multimodal")
)


def _expected(name: str) -> str:
    return f"read_parquet('{_EXPECTED}/{name}.parquet')"


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_documents(spark, sf_dir)
    return attach_media_columns(docs)


@register(
    "multimodal_features",
    oracle=f"""
    SELECT e.doc_id, e.feat_norm, e.feat_dim
    FROM {_expected('features')} e
    JOIN documents d ON e.doc_id = d.doc_id
    ORDER BY e.doc_id
    """,
    tags=("multimodal",),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> Arrow-batched feature extraction
    (mapInPandas): real BMP decode into 4x4 grayscale grid features."""
    feats = extract_features(_media(spark, sf_dir), fake_decode=False)
    return feats.select("doc_id", "feat_norm", F.size("features").alias("feat_dim"))


@register(
    "multimodal_resize",
    oracle=f"""
    SELECT e.doc_id, e.payload_bytes, e.width, e.height
    FROM {_expected('resize')} e
    JOIN documents d ON e.doc_id = d.doc_id
    ORDER BY e.doc_id
    """,
    tags=("multimodal",),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image resize: BMP decode -> nearest-neighbor resample ->
    BMP re-encode, metadata updated to the actual output geometry."""
    from ..operators.multimodal import resize_images

    resized = resize_images(_media(spark, sf_dir), width=16, height=16)
    return resized.select(
        "doc_id",
        F.length("media_bytes").cast("long").alias("payload_bytes"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )


@register(
    "multimodal_frame_samples",
    oracle=f"""
    SELECT e.doc_id, e.frame_idx, e.frame_len
    FROM {_expected('frame_samples')} e
    JOIN documents d ON e.doc_id = d.doc_id
    ORDER BY e.doc_id, e.frame_idx
    """,
    tags=("multimodal",),
)
def multimodal_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: payload -> 4 frame slices per doc."""
    frames = sample_frames(_media(spark, sf_dir), n_frames=4)
    return frames.select(
        "doc_id", "frame_idx", F.length("frame_bytes").cast("long").alias("frame_len")
    )


@register(
    "multimodal_metadata_stats",
    oracle=f"""
    SELECT e.media_type, e.format, COUNT(*) AS n,
           SUM(e.size_bytes) AS total_bytes, MAX(e.width) AS max_width
    FROM {_expected('media_meta')} e
    JOIN documents d ON e.doc_id = d.doc_id
    GROUP BY e.media_type, e.format
    ORDER BY e.media_type, e.format
    """,
    tags=("multimodal",),
)
def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata rollup over the media struct column."""
    return (
        _media(spark, sf_dir)
        .groupBy(F.col("media_meta.media_type").alias("media_type"), F.col("media_meta.format").alias("format"))
        .agg(
            F.count("*").alias("n"),
            F.sum("media_meta.size_bytes").alias("total_bytes"),
            F.max("media_meta.width").alias("max_width"),
        )
        .orderBy("media_type", "format")
    )


@register(
    "multimodal_video_frames",
    oracle=f"""
    SELECT e.doc_id, e.frame_idx, e.frame_bytes, e.width, e.height
    FROM {_expected('video_frames')} e
    JOIN documents d ON e.doc_id = d.doc_id
    ORDER BY e.doc_id, e.frame_idx
    """,
    tags=("multimodal", "video"),
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real video frame sampling: from-scratch Y4M (YUV4MPEG2 C420)
    decode -> keep every 2nd frame -> re-encode each as a BMP.  One
    input row fans out to ceil(n_frames/2) rows via mapInPandas."""
    from ..operators.multimodal import attach_video_columns, sample_video_frames

    docs = read_documents(spark, sf_dir)
    frames = sample_video_frames(attach_video_columns(docs), every=2)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("frame_bmp").cast("long").alias("frame_bytes"),
        "width",
        "height",
    )


@register(
    "multimodal_audio_features",
    oracle=f"""
    SELECT e.doc_id, e.duration_ms, e.rms, e.zero_crossing_rate, e.peak, e.sample_rate
    FROM {_expected('audio_features')} e
    JOIN documents d ON e.doc_id = d.doc_id
    ORDER BY e.doc_id
    """,
    tags=("multimodal", "audio"),
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV decode (from-scratch RIFF/PCM codec) -> per-clip
    duration/RMS/zero-crossing/peak features via mapInPandas."""
    from ..operators.multimodal import attach_audio_columns, extract_audio_features

    docs = read_documents(spark, sf_dir)
    audio = attach_audio_columns(docs)
    return extract_audio_features(audio)


@register(
    "multimodal_mixed_format_features",
    oracle=f"""
    SELECT e.format, COUNT(*) AS n_images,
           ROUND({sql_davg('e.feat_norm')}, 3) AS avg_feat_norm
    FROM {_expected('mixed_formats')} e
    JOIN documents d ON e.doc_id = d.doc_id
    GROUP BY e.format
    ORDER BY e.format
    """,
    tags=("multimodal",),
)
def multimodal_mixed_format_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A mixed-format corpus (BMP / PNG / baseline JPEG payloads,
    chosen per doc_id) through ONE feature-extraction pass: the
    magic-byte dispatch decodes each format natively, so the pipeline
    doesn't need per-format branches -- the shape of a real crawl
    where image encodings arrive mixed.  JPEG features differ from the
    lossless formats only by quantization error (same synthesized
    pixels)."""
    from ..operators.jpeg import encode_jpeg
    from ..operators.multimodal import decode_bmp, extract_features, synth_bmp

    docs = read_documents(spark, sf_dir)

    @F.pandas_udf("binary")
    def _payload(ids: pd.Series) -> pd.Series:
        from ..operators.multimodal import encode_png

        out = []
        for i in ids:
            i = int(i)
            px = decode_bmp(synth_bmp(i, 16 + i % 8, 12 + i % 5))
            if i % 3 == 0:
                out.append(synth_bmp(i, 16 + i % 8, 12 + i % 5))
            elif i % 3 == 1:
                out.append(encode_png(px))
            else:
                out.append(encode_jpeg(px, quality=90))
        return pd.Series(out)

    media = docs.select("doc_id", _payload(F.col("doc_id")).alias("media_bytes"))
    feats = extract_features(media, fake_decode=False)
    fmt = (
        F.when(F.col("doc_id") % 3 == 0, "bmp")
        .when(F.col("doc_id") % 3 == 1, "png")
        .otherwise("jpeg")
    )
    return (
        feats.select("doc_id", fmt.alias("format"), "feat_norm")
        .groupBy("format")
        .agg(
            F.count("*").alias("n_images"),
            # fixed-point avg (queries/_exact.py): a 32-partition double
            # sum differs from DuckDB's single-threaded sum in the last
            # ULPs, which can flip ROUND(.., 3) at the boundary
            F.round(davg("feat_norm"), 3).alias("avg_feat_norm"),
        )
        .orderBy("format")
    )
