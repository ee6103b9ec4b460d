"""Multimodal plumbing: schema, batch shape, determinism of the fake
decoder, frame sampling, and that the real decode path fails loudly."""

import pytest
from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_media_columns,
    decode_image_batch,
    extract_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    return attach_media_columns(docs)


def test_media_schema(media):
    fields = dict(media.dtypes)
    assert fields["media_bytes"] == "binary"
    assert fields["media_meta"].startswith("struct<media_type:string")


def test_extract_features_shape_and_determinism(media):
    feats = extract_features(media, fake_decode=True)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r["features"]) == FEATURE_DIM for r in rows)
    assert all(r["feat_norm"] >= 0 for r in rows)
    rows2 = extract_features(media, fake_decode=True).collect()
    assert sorted(r["feat_norm"] for r in rows) == sorted(r["feat_norm"] for r in rows2)


def test_real_decode_is_loud():
    with pytest.raises(NotImplementedError):
        decode_image_batch([b"xx"], fake=False)


def test_frame_sampling(media):
    frames = sample_frames(media, n_frames=4)
    per_doc = frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] == 4 for r in per_doc)
    idx = frames.select("frame_idx").distinct().collect()
    assert sorted(r["frame_idx"] for r in idx) == [0, 1, 2, 3]


def test_metadata_size_matches_payload(media):
    rows = media.select(
        F.length("media_bytes").alias("a"), F.col("media_meta.size_bytes").alias("b")
    ).collect()
    assert all(r["a"] == r["b"] for r in rows)


def test_binary_file_source_feeds_multimodal_pipeline(spark, tmp_path):
    """binaryFile ingestion -> mapInPandas feature extraction: the real
    media path end-to-end (with the deterministic decode stub)."""
    from pyspark.sql import functions as F

    from big_data_co2_emission_analysis_spark.operators.multimodal import extract_features
    from big_data_co2_emission_analysis_spark.sources.readers import read_binary_files

    for i in range(4):
        (tmp_path / f"img_{i}.png").write_bytes(bytes([i] * (100 + i)))
    (tmp_path / "skip.txt").write_bytes(b"not media")

    files = read_binary_files(spark, str(tmp_path), glob="*.png", max_bytes=102)
    rows = files.select("path", "length", "content").collect()
    assert len(rows) == 3  # glob drops .txt, max_bytes drops img_3 (103b)

    docs = files.select(
        F.monotonically_increasing_id().alias("doc_id"), F.col("content").alias("media_bytes")
    )
    feats = extract_features(docs, fake_decode=True)
    out = feats.collect()
    assert len(out) == 3 and all(len(r["features"]) == 16 for r in out)


def test_resize_images_normalizes_payload_size(spark, sf_dir):
    from big_data_co2_emission_analysis_spark.operators.multimodal import (
        attach_media_columns,
        resize_images,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = attach_media_columns(docs)
    resized = resize_images(media, width=8, height=8)
    rows = resized.collect()
    assert len(rows) == 20
    assert all(len(r["media_bytes"]) == 64 for r in rows)
    assert all(r["media_meta"]["width"] == 8 and r["media_meta"]["size_bytes"] == 64 for r in rows)
