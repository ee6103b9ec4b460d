"""Multimodal-column queries (rows-only: pixel decoding is not
SQL-expressible; codec/resize semantics are unit-tested in
tests/test_multimodal.py).  The fixture payloads are genuine BMPs and
the decode/resize path operates on real pixels (operators/multimodal
carries a from-scratch 24-bit BMP codec)."""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves string hints in module globals
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_media_columns, extract_features, sample_frames
from ..sources.readers import read_documents
from .registry import register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_documents(spark, sf_dir)
    return attach_media_columns(docs)


@register("multimodal_features", oracle=None, tags=("multimodal",))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> Arrow-batched feature extraction
    (mapInPandas): real BMP decode into 4x4 grayscale grid features."""
    feats = extract_features(_media(spark, sf_dir), fake_decode=False)
    return feats.select("doc_id", "feat_norm", F.size("features").alias("feat_dim"))


@register("multimodal_resize", oracle=None, tags=("multimodal",))
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


@register("multimodal_frame_samples", oracle=None, tags=("multimodal",))
def multimodal_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: payload -> 4 frame slices per doc."""
    frames = sample_frames(_media(spark, sf_dir), n_frames=4)
    return frames.select(
        "doc_id", "frame_idx", F.length("frame_bytes").cast("long").alias("frame_len")
    )


@register("multimodal_metadata_stats", oracle=None, tags=("multimodal",))
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


@register("multimodal_video_frames", oracle=None, tags=("multimodal", "video"))
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


@register("multimodal_audio_features", oracle=None, tags=("multimodal", "audio"))
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV decode (from-scratch RIFF/PCM codec) -> per-clip
    duration/RMS/zero-crossing/peak features via mapInPandas."""
    from ..operators.multimodal import attach_audio_columns, extract_audio_features

    docs = read_documents(spark, sf_dir)
    audio = attach_audio_columns(docs)
    return extract_audio_features(audio)


@register("multimodal_mixed_format_features", oracle=None, tags=("multimodal",))
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
            F.round(F.avg("feat_norm"), 3).alias("avg_feat_norm"),
        )
        .orderBy("format")
    )
