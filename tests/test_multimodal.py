"""Multimodal pipeline: the from-scratch BMP codec (round-trip,
resize correctness on real pixels), schema, batch shape, frame
sampling, and that unsupported formats fail loudly."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_media_columns,
    decode_bmp,
    decode_image_batch,
    encode_bmp,
    extract_features,
    resize_nearest,
    sample_frames,
    synth_bmp,
)


def test_bmp_codec_round_trip():
    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (5, 3), (12, 17), (32, 32)]:  # odd widths hit row padding
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp(px))
        assert out.shape == (h, w, 3)
        assert np.array_equal(out, px)


def test_bmp_decode_rejects_non_bmp():
    with pytest.raises(ValueError):
        decode_bmp(b"PNG....definitely not a bitmap" * 3)


def test_resize_nearest_pixel_semantics():
    # 2x2 checkerboard scaled to 4x4: each source pixel becomes a 2x2 block
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
    )
    up = resize_nearest(px, 4, 4)
    assert up.shape == (4, 4, 3)
    assert np.array_equal(up[0, 0], [255, 0, 0]) and np.array_equal(up[1, 1], [255, 0, 0])
    assert np.array_equal(up[0, 3], [0, 255, 0])
    assert np.array_equal(up[3, 0], [0, 0, 255])
    assert np.array_equal(up[3, 3], [255, 255, 255])


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    return attach_media_columns(docs)


def test_media_schema(media):
    fields = dict(media.dtypes)
    assert fields["media_bytes"] == "binary"
    assert fields["media_meta"].startswith("struct<media_type:string")


def test_media_payloads_are_real_bmps(media):
    rows = media.select("media_bytes", "media_meta").collect()
    for r in rows:
        px = decode_bmp(bytes(r["media_bytes"]))  # decodes = valid BMP
        assert px.shape == (r["media_meta"]["height"], r["media_meta"]["width"], 3)


def test_extract_features_real_decode(media):
    feats = extract_features(media, fake_decode=False)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r["features"]) == FEATURE_DIM for r in rows)
    assert all(0 <= v <= 1 for r in rows for v in r["features"])  # grid means in [0,1]
    rows2 = extract_features(media, fake_decode=False).collect()
    assert sorted(r["feat_norm"] for r in rows) == sorted(r["feat_norm"] for r in rows2)
    # features genuinely depend on pixels: the gradient images differ per doc
    assert len({tuple(r["features"]) for r in rows}) > 1


def test_unsupported_format_decode_is_loud():
    with pytest.raises(NotImplementedError):
        decode_image_batch([b"xx"], fake=False)  # not a BMP, no PIL fallback


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


def test_resize_images_real_pixels(spark, sf_dir):
    from big_data_co2_emission_analysis_spark.operators.multimodal import resize_images

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = attach_media_columns(docs)
    originals = {r["doc_id"]: bytes(r["media_bytes"]) for r in media.collect()}
    rows = resize_images(media, width=8, height=8).collect()
    assert len(rows) == 20
    for r in rows:
        px = decode_bmp(bytes(r["media_bytes"]))  # output is a valid BMP
        assert px.shape == (8, 8, 3)
        assert r["media_meta"]["width"] == 8 and r["media_meta"]["height"] == 8
        assert r["media_meta"]["size_bytes"] == len(r["media_bytes"])
        # nearest-neighbor correctness vs an independent resample of the source
        src = decode_bmp(originals[r["doc_id"]])
        assert np.array_equal(px, resize_nearest(src, 8, 8))


def test_synth_bmp_deterministic():
    assert synth_bmp(3, 16, 12) == synth_bmp(3, 16, 12)
    assert synth_bmp(3, 16, 12) != synth_bmp(4, 16, 12)


def test_wav_codec_round_trip():
    from big_data_co2_emission_analysis_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.RandomState(11)
    for n in (1, 160, 1601):  # odd length exercises word-alignment
        samples = rng.randint(-32768, 32767, size=n).astype(np.int16)
        out, sr = decode_wav(encode_wav(samples, 8000))
        assert sr == 8000
        assert np.array_equal(out, samples)
    with pytest.raises(ValueError):
        decode_wav(b"ID3\x00not audio" * 5)


def test_audio_features_known_sine():
    """A pure sine of amplitude A has RMS A/sqrt(2) and zero-crossing
    rate 2f/sr -- the features must recover both from decoded bytes."""
    from big_data_co2_emission_analysis_spark.operators.multimodal import (
        audio_features,
        decode_wav,
        encode_wav,
    )

    sr, f, amp, n = 16_000, 400.0, 0.5, 16_000
    t = np.arange(n) / sr
    wav = encode_wav((amp * 32767 * np.sin(2 * np.pi * f * t)).astype(np.int16), sr)
    samples, got_sr = decode_wav(wav)
    feats = audio_features(samples, got_sr)
    assert feats["duration_ms"] == 1000
    assert feats["rms"] == pytest.approx(amp / np.sqrt(2), rel=0.01)
    assert feats["zero_crossing_rate"] == pytest.approx(2 * f / sr, rel=0.01)
    assert feats["peak"] == pytest.approx(amp, rel=0.01)


def test_y4m_codec_round_trip():
    """RGB -> YUV420 -> RGB is lossy (chroma subsample) but must keep
    geometry/frame count exact and luma close; pure-gray frames survive
    bit-exactly (U=V=128 everywhere, no chroma loss)."""
    from big_data_co2_emission_analysis_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
    )

    rng = np.random.RandomState(5)
    gray = [
        np.repeat(rng.randint(0, 256, size=(6, 8, 1), dtype=np.uint8), 3, axis=2)
        for _ in range(3)
    ]
    back, fps = decode_y4m(encode_y4m(gray, fps=10))
    assert fps == 10 and len(back) == 3
    for a, b in zip(gray, back):
        assert np.array_equal(a, b)

    color = [rng.randint(0, 256, size=(6, 8, 3), dtype=np.uint8) for _ in range(2)]
    back2, _ = decode_y4m(encode_y4m(color))
    assert len(back2) == 2 and back2[0].shape == (6, 8, 3)
    # luma is preserved within rounding: compare BT.601 Y of in vs out
    def luma(p):
        return 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]

    assert np.abs(luma(color[0]) - luma(back2[0])).max() < 3.0

    with pytest.raises(ValueError):
        decode_y4m(b"RIFF not a y4m stream")
    with pytest.raises(ValueError):
        encode_y4m([np.zeros((5, 8, 3), dtype=np.uint8)])  # odd height


def test_video_frame_sampling_real_pixels(spark, sf_dir):
    """Every 2nd frame of each Y4M payload comes back as a valid BMP
    whose pixels equal the decoded source frame."""
    from big_data_co2_emission_analysis_spark.operators.multimodal import (
        attach_video_columns,
        decode_y4m,
        sample_video_frames,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(12)
    video = attach_video_columns(docs)
    payloads = {r["doc_id"]: bytes(r["media_bytes"]) for r in video.collect()}
    rows = sample_video_frames(video, every=2).collect()
    # per-doc frame count: ceil(n_frames / 2), n_frames = 6 + doc_id % 4
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(payloads)
    for doc_id, frs in by_doc.items():
        src_frames, _ = decode_y4m(payloads[doc_id])
        nf = len(src_frames)
        assert nf == 6 + doc_id % 4
        assert sorted(r["frame_idx"] for r in frs) == list(range(0, nf, 2))
        for r in frs:
            px = decode_bmp(bytes(r["frame_bmp"]))
            assert px.shape == (r["height"], r["width"], 3)
            assert np.array_equal(px, src_frames[r["frame_idx"]])


def test_video_metadata_consistent(spark, sf_dir):
    from big_data_co2_emission_analysis_spark.operators.multimodal import (
        attach_video_columns,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(12)
    rows = attach_video_columns(docs).collect()
    for r in rows:
        m = r["media_meta"]
        assert m["media_type"] == "video" and m["format"] == "y4m"
        assert m["size_bytes"] == len(r["media_bytes"])
        # 10 fps, n_frames = 6 + doc_id % 4 -> duration_ms = n_frames * 100
        assert m["duration_ms"] == (6 + r["doc_id"] % 4) * 100


def test_audio_pipeline_end_to_end(spark, sf_dir):
    from big_data_co2_emission_analysis_spark.operators.multimodal import (
        attach_audio_columns,
        extract_audio_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    audio = attach_audio_columns(docs)
    rows = extract_audio_features(audio).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["sample_rate"] == 16_000
        assert 50 <= r["duration_ms"] <= 200  # 1200..2000 samples at 16k
        assert 0.1 < r["rms"] < 0.5 and 0 < r["zero_crossing_rate"] < 0.2
    # meta duration matches decoded duration
    meta = {r["doc_id"]: r["media_meta"]["duration_ms"] for r in audio.collect()}
    got = {r["doc_id"]: r["duration_ms"] for r in rows}
    assert all(abs(meta[k] - got[k]) <= 1 for k in got)


def test_arrow_feature_path_matches_pandas_path(spark, sf_dir):
    """mapInArrow and mapInPandas feature extraction must agree
    bit-for-bit (same decode, no conversion drift)."""
    from big_data_co2_emission_analysis_spark.operators.multimodal import (
        extract_features,
        extract_features_arrow,
    )
    from big_data_co2_emission_analysis_spark.queries.multimodal_queries import _media

    media = _media(spark, sf_dir)
    pandas_rows = {
        r["doc_id"]: (r["features"], r["feat_norm"])
        for r in extract_features(media, fake_decode=False).collect()
    }
    arrow_rows = {
        r["doc_id"]: (r["features"], r["feat_norm"])
        for r in extract_features_arrow(media, fake_decode=False).collect()
    }
    assert arrow_rows == pandas_rows and len(arrow_rows) > 0


# ---------------------------------------------------------------------------
# PNG codec (from-scratch, stdlib zlib)
# ---------------------------------------------------------------------------


def _filter_scanlines(px, ftype, nch):
    """Forward-apply a PNG filter to build test payloads exercising the
    decoder's unfilter paths (our encoder only emits filter 0)."""
    import numpy as np

    h, w, _ = px.shape
    stride = w * nch
    flat = px.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        line = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = cur[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if ftype == 1:
                line[i] = (cur[i] - a) % 256
            elif ftype == 2:
                line[i] = (cur[i] - b) % 256
            elif ftype == 3:
                line[i] = (cur[i] - (a + b) // 2) % 256
            elif ftype == 4:
                from big_data_co2_emission_analysis_spark.operators.multimodal import _paeth

                line[i] = (cur[i] - _paeth(a, b, c)) % 256
        out.append(ftype)
        out.extend(line.astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


def _make_png(px, ctype, ftype):
    import struct
    import zlib

    import numpy as np

    from big_data_co2_emission_analysis_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
    )

    nch = {0: 1, 2: 3, 6: 4}[ctype]
    h, w = px.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = _filter_scanlines(px.reshape(h, w, nch), ftype, nch)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def test_png_round_trip():
    import numpy as np

    from big_data_co2_emission_analysis_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_png_all_filters_decode():
    import numpy as np

    from big_data_co2_emission_analysis_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    for ftype in (1, 2, 3, 4):
        got = decode_png(_make_png(px, ctype=2, ftype=ftype))
        assert np.array_equal(got, px), f"filter {ftype}"


def test_png_gray_and_rgba():
    import numpy as np

    from big_data_co2_emission_analysis_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, (6, 8, 1), dtype=np.uint8)
    got = decode_png(_make_png(gray, ctype=0, ftype=2))
    assert np.array_equal(got, np.repeat(gray, 3, axis=2))
    rgba = rng.integers(0, 256, (6, 8, 4), dtype=np.uint8)
    got = decode_png(_make_png(rgba, ctype=6, ftype=4))
    assert np.array_equal(got, rgba[:, :, :3])


def test_decode_image_dispatches_on_magic_bytes():
    import numpy as np
    import pytest

    from big_data_co2_emission_analysis_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
        encode_png,
    )

    px = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    assert np.array_equal(decode_image(encode_bmp(px)), px)
    assert np.array_equal(decode_image(encode_png(px)), px)
    with pytest.raises(NotImplementedError):
        decode_image(b"GIF89a not-a-supported-format")


def test_resize_handles_png_payloads(spark):
    import numpy as np

    from big_data_co2_emission_analysis_spark.operators.multimodal import (
        decode_bmp,
        encode_png,
        resize_images,
    )

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    df = spark.createDataFrame([(1, bytearray(encode_png(px)))], "doc_id long, media_bytes binary")
    out = resize_images(df, width=8, height=8).collect()[0]
    resized = decode_bmp(bytes(out["media_bytes"]))
    assert resized.shape == (8, 8, 3)
    # nearest-neighbor: every output pixel exists in the source
    assert np.array_equal(resized, px[::2, ::2])
