"""Baseline JPEG codec (operators/jpeg.py): round trips, quality
scaling, grayscale, restart markers, unsupported-feature refusals."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from big_data_co2_emission_analysis_spark.operators.jpeg import (
    AC_LUM,
    DC_LUM,
    QT_LUM,
    ZIGZAG,
    _BitWriter,
    _build_codes,
    _category,
    _dct2,
    _scale_qt,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 3 + y) % 256, (x + y * 2) % 256, (x * 2 + y * 3) % 256], axis=-1
    ).astype(np.uint8)


def test_round_trip_smooth_image():
    px = _gradient(40, 56)
    dec = decode_jpeg(encode_jpeg(px, quality=95))
    assert dec.shape == px.shape
    err = np.abs(dec.astype(int) - px.astype(int))
    assert err.max() <= 4 and err.mean() < 1.0


def test_quality_degrades_monotonically():
    px = _gradient(32, 32)
    errs = []
    for q in (95, 75, 40):
        dec = decode_jpeg(encode_jpeg(px, quality=q))
        errs.append(np.abs(dec.astype(int) - px.astype(int)).mean())
    assert errs[0] <= errs[1] <= errs[2]


def test_solid_color_exact():
    solid = np.full((16, 24, 3), 77, np.uint8)
    assert np.abs(decode_jpeg(encode_jpeg(solid, 90)).astype(int) - 77).max() == 0


def test_non_multiple_of_8_dimensions():
    px = _gradient(13, 19)
    dec = decode_jpeg(encode_jpeg(px, quality=95))
    assert dec.shape == (13, 19, 3)


def _encode_gray_blocks(y_plane, qlum, writer, prev_dc, dc_codes, ac_codes):
    h, w = y_plane.shape
    bh, bw = h // 8, w // 8
    blocks = y_plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    qb = np.round(_dct2(blocks - 128.0) / qlum.reshape(8, 8)).astype(np.int32)
    for bi in range(bh * bw):
        zz = qb[bi].reshape(64)[ZIGZAG]
        diff = int(zz[0]) - prev_dc[0]
        prev_dc[0] = int(zz[0])
        t = _category(diff)
        code, ln = dc_codes[t]
        writer.write(code, ln)
        if t:
            writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                if k > last_nz:
                    code, ln = ac_codes[0x00]
                    writer.write(code, ln)
                    break
                run += 1
                if run == 16:
                    code, ln = ac_codes[0xF0]
                    writer.write(code, ln)
                    run = 0
                continue
            t = _category(v)
            code, ln = ac_codes[(run << 4) | t]
            writer.write(code, ln)
            writer.write(v if v >= 0 else v + (1 << t) - 1, t)
            run = 0


def _gray_jpeg(y_plane: np.ndarray, restart_every: int | None = None) -> bytes:
    """Hand-built single-component JPEG (optionally with DRI/RST), to
    exercise decoder paths the module encoder doesn't emit."""
    h, w = y_plane.shape
    qlum = _scale_qt(QT_LUM, 90)
    dc_codes, ac_codes = _build_codes(*DC_LUM), _build_codes(*AC_LUM)

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = struct.pack(">H", 0xFFD8)
    out += seg(0xFFDB, b"\x00" + bytes(qlum.reshape(64)[ZIGZAG].astype(np.uint8)))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    for cls, tid, (bits, vals) in ((0, 0, DC_LUM), (1, 0, AC_LUM)):
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_every:
        out += seg(0xFFDD, struct.pack(">H", restart_every))
    out += seg(0xFFDA, b"\x01" + b"\x01\x00" + b"\x00\x3f\x00")

    bh, bw = h // 8, w // 8
    if restart_every:
        # one MCU = one block for 1-component scans; emit RST between groups
        parts, rst = [], 0
        blocks = y_plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        for start in range(0, bh * bw, restart_every):
            writer = _BitWriter()
            prev_dc = [0]
            group = blocks[start : start + restart_every]
            # encode the group's blocks in order via a tiny plane view
            gplane = np.concatenate(list(group), axis=1)  # (8, 8*n)
            _encode_gray_blocks(gplane, qlum, writer, prev_dc, dc_codes, ac_codes)
            parts.append(writer.flush())
        data = b""
        for i, p in enumerate(parts):
            data += p
            if i < len(parts) - 1:
                data += struct.pack(">H", 0xFFD0 + (i % 8))
        out += data
    else:
        writer = _BitWriter()
        prev_dc = [0]
        _encode_gray_blocks(y_plane, qlum, writer, prev_dc, dc_codes, ac_codes)
        out += writer.flush()
    return out + struct.pack(">H", 0xFFD9)


def test_grayscale_single_component():
    y, x = np.mgrid[0:16, 0:24]
    plane = ((x * 5 + y * 3) % 200 + 20).astype(np.float64)
    dec = decode_jpeg(_gray_jpeg(plane))
    assert dec.shape == (16, 24, 3)
    assert np.abs(dec[:, :, 0].astype(int) - plane.astype(int)).mean() < 3
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])  # replicated gray


def test_restart_markers():
    y, x = np.mgrid[0:8, 0:64]  # 8 MCUs in one row
    plane = ((x * 2 + y * 7) % 180 + 30).astype(np.float64)
    plain = decode_jpeg(_gray_jpeg(plane))
    with_rst = decode_jpeg(_gray_jpeg(plane, restart_every=2))
    assert np.array_equal(plain, with_rst)


def test_progressive_refused():
    px = _gradient(16, 16)
    enc = bytearray(encode_jpeg(px))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(enc))


def test_decode_image_dispatch_includes_jpeg():
    from big_data_co2_emission_analysis_spark.operators.multimodal import decode_image

    px = _gradient(24, 24)
    dec = decode_image(encode_jpeg(px, 95))
    assert dec.shape == (24, 24, 3)


# ---------------------------------------------------------------------------
# Hypothesis sweep over (H, W, quality): the fixed-size tests above pin
# specific MCU layouts; shrinking-enabled property tests catch the
# Annex-K quantization / edge-padding cases those specific shapes miss
# (odd dimensions crossing MCU boundaries, 1-pixel strips, extreme
# qualities).
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_JPEG_SETTINGS = dict(max_examples=30, deadline=None)


@settings(**_JPEG_SETTINGS)
@given(
    h=st.integers(min_value=1, max_value=41),
    w=st.integers(min_value=1, max_value=41),
    quality=st.integers(min_value=5, max_value=100),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_round_trip_shape_and_range_any_content(h, w, quality, seed):
    """ANY (H, W, quality), arbitrary noise content: the round trip must
    preserve shape/dtype and produce in-range pixels -- no exception, no
    MCU-edge garbage dimensions."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(px, quality=quality))
    assert dec.shape == (h, w, 3)
    assert dec.dtype == np.uint8


@settings(**_JPEG_SETTINGS)
@given(
    h=st.integers(min_value=1, max_value=41),
    w=st.integers(min_value=1, max_value=41),
    quality=st.integers(min_value=85, max_value=100),
    base=st.integers(min_value=30, max_value=220),
    gx=st.floats(min_value=-1.5, max_value=1.5),
    gy=st.floats(min_value=-1.5, max_value=1.5),
)
def test_round_trip_smooth_content_bounded_error(h, w, quality, base, gx, gy):
    """Smooth (clipped linear gradient) content at quality >= 85 must
    round-trip with tightly bounded error at every size -- including
    sizes that exercise the right/bottom edge replication padding."""
    y, x = np.mgrid[0:h, 0:w]
    plane = np.clip(base + gx * x + gy * y, 0, 255)
    px = np.stack([plane, plane, plane], axis=-1).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(px, quality=quality))
    err = np.abs(dec.astype(int) - px.astype(int))
    assert err.max() <= 12
    assert err.mean() < 3.0


@settings(**_JPEG_SETTINGS)
@given(
    h=st.integers(min_value=1, max_value=33),
    w=st.integers(min_value=1, max_value=33),
    val=st.integers(min_value=0, max_value=255),
    quality=st.integers(min_value=50, max_value=100),
)
def test_solid_color_near_exact_any_size(h, w, val, quality):
    """A solid color has only a DC coefficient; every size/quality must
    reconstruct it within rounding of the DC quantization step."""
    solid = np.full((h, w, 3), val, np.uint8)
    dec = decode_jpeg(encode_jpeg(solid, quality))
    assert np.abs(dec.astype(int) - int(val)).max() <= 3
