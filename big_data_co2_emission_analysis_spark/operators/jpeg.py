"""Baseline JPEG codec from scratch (numpy + stdlib -- no PIL/opencv).

Decoder: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
4:4:4 / 4:2:2 / 4:2:0 chroma sampling, restart markers; huffman
entropy decode -> dequant -> inverse zigzag -> IDCT (orthonormal DCT
matrix multiply) -> chroma upsample -> JFIF YCbCr->RGB.  Progressive
(SOF2), arithmetic coding, and 12-bit precision raise loudly.

Encoder: the matching subset -- 4:4:4, standard Annex-K quantization
tables scaled by a quality factor, standard huffman tables.

Everything is deterministic; the codec exists so the multimodal
operators (operators/multimodal.py decode_image) can decode real
JPEG payloads with the same no-external-libraries posture as the BMP/
PNG/WAV/Y4M codecs.  The per-block math is vectorized numpy (the DCT
of every block in one einsum); only the entropy coder is a per-symbol
loop, as in any huffman implementation.
"""

from __future__ import annotations

import struct

import numpy as np

# -- constants --------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

#: Annex K luminance / chrominance quantization tables (natural order)
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])
QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])

# standard huffman tables (Annex K): (bits[1..16], values)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

#: orthonormal 8x8 DCT-II matrix
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8)) * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _dct2(blocks: np.ndarray) -> np.ndarray:
    """(N, 8, 8) spatial -> DCT coefficients."""
    return np.einsum("ij,njk,lk->nil", _C, blocks, _C)


def _idct2(blocks: np.ndarray) -> np.ndarray:
    """(N, 8, 8) coefficients -> spatial."""
    return np.einsum("ji,njk,kl->nil", _C, blocks, _C)


# -- huffman infrastructure -------------------------------------------------


def _build_codes(bits, values):
    """(bits, values) -> {symbol: (code, length)} per Annex C."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_table(bits, values):
    """(bits, values) -> {(length, code): symbol}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker (EOI / RST already stripped by caller): pad
                    self.pos -= 1
                    b = 0  # feed zero bits past the end
                    self.acc = (self.acc << 8)
                    self.n += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
            if self.n == 0:
                return 0
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: t-bit magnitude v -> signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# -- encoder ----------------------------------------------------------------


def _scale_qt(qt: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * s + 50) // 100, 1, 255).astype(np.int32)


def encode_jpeg(pixels: np.ndarray, quality: int = 85) -> bytes:
    """(H, W, 3) uint8 RGB -> baseline JFIF bytes (4:4:4, standard
    huffman tables)."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("encode_jpeg expects (H, W, 3) RGB")
    qlum, qchrom = _scale_qt(QT_LUM, quality), _scale_qt(QT_CHROM, quality)

    r, g, b = (pixels[..., i].astype(np.float64) for i in range(3))
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b,
    ]

    bh, bw = (h + 7) // 8, (w + 7) // 8
    dc_codes = [_build_codes(*DC_LUM), _build_codes(*DC_CHROM)]
    ac_codes = [_build_codes(*AC_LUM), _build_codes(*AC_CHROM)]
    writer = _BitWriter()
    prev_dc = [0, 0, 0]

    # quantized coefficient blocks per component, natural block order
    comp_q = []
    for ci, plane in enumerate(planes):
        padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
        blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        coeffs = _dct2(blocks - (128.0 if ci == 0 else 128.0))
        qt = (qlum if ci == 0 else qchrom).reshape(8, 8)
        comp_q.append(np.round(coeffs / qt).astype(np.int32))

    for bi in range(bh * bw):
        for ci in range(3):
            tsel = 0 if ci == 0 else 1
            zz = comp_q[ci][bi].reshape(64)[ZIGZAG]
            diff = int(zz[0]) - prev_dc[ci]
            prev_dc[ci] = int(zz[0])
            t = _category(diff)
            code, ln = dc_codes[tsel][t]
            writer.write(code, ln)
            if t:
                writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            run = 0
            last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    if k > last_nz:
                        code, ln = ac_codes[tsel][0x00]  # EOB
                        writer.write(code, ln)
                        break
                    run += 1
                    if run == 16:
                        code, ln = ac_codes[tsel][0xF0]  # ZRL
                        writer.write(code, ln)
                        run = 0
                    continue
                t = _category(v)
                code, ln = ac_codes[tsel][(run << 4) | t]
                writer.write(code, ln)
                writer.write(v if v >= 0 else v + (1 << t) - 1, t)
                run = 0

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = struct.pack(">H", 0xFFD8)  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qlum.reshape(64)[ZIGZAG].astype(np.uint8)))
    out += seg(0xFFDB, b"\x01" + bytes(qchrom.reshape(64)[ZIGZAG].astype(np.uint8)))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
               + b"\x01\x11\x00" + b"\x02\x11\x01" + b"\x03\x11\x01")
    for cls, tid, (bits, vals) in ((0, 0, DC_LUM), (0, 1, DC_CHROM), (1, 0, AC_LUM), (1, 1, AC_CHROM)):
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    out += seg(0xFFDA, b"\x03" + b"\x01\x00" + b"\x02\x11" + b"\x03\x11" + b"\x00\x3f\x00")
    out += writer.flush()
    out += struct.pack(">H", 0xFFD9)  # EOI
    return out


# -- decoder ----------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (H, W, 3) uint8 RGB (grayscale replicated)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    scan = None

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = struct.unpack_from(">H", data, pos)[0]
        if marker == 0xFFD9:
            break
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        payload = data[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xFFDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(payload, np.uint8, 64, p + 1)
                qts[tq] = tbl
                p += 65
        elif marker == 0xFFC4:
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                huff[(cls, tid)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xFFC0 or marker == 0xFFC1:
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for i in range(nc):  # SOF header is 6 bytes, then 3 per component
                cid, hv, tq = payload[6 + 3 * i], payload[7 + 3 * i], payload[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7, 0xFFC9, 0xFFCA, 0xFFCB):
            raise NotImplementedError("only baseline sequential JPEG (SOF0) supported")
        elif marker == 0xFFDD:
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xFFDA:
            ns = payload[0]
            sel = {}
            for i in range(ns):
                cs, tt = payload[1 + 2 * i], payload[2 + 2 * i]
                sel[cs] = (tt >> 4, tt & 0xF)
            scan = sel
            scan_start = pos
            break

    if comps is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    # strip entropy-coded data: ends at next non-RST marker
    end = scan_start
    while end + 1 < len(data):
        if data[end] == 0xFF and data[end + 1] not in (0x00,) and not (0xD0 <= data[end + 1] <= 0xD7):
            break
        end += 1
    entropy = data[scan_start:end]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.float64)

    # split entropy stream on RST markers so each interval resets cleanly
    intervals = []
    if restart_interval:
        cur = bytearray()
        i = 0
        while i < len(entropy):
            if entropy[i] == 0xFF and i + 1 < len(entropy) and 0xD0 <= entropy[i + 1] <= 0xD7:
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            cur.append(entropy[i])
            i += 1
        intervals.append(bytes(cur))
    else:
        intervals = [entropy]

    n_mcu = mcux * mcuy
    mcu_idx = 0
    for interval in intervals:
        reader = _BitReader(interval)
        prev_dc = {c["id"]: 0 for c in comps}
        limit = min(n_mcu, mcu_idx + (restart_interval or n_mcu))
        while mcu_idx < limit:
            my, mx = divmod(mcu_idx, mcux)
            for c in comps:
                dc_t, ac_t = scan[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        t = reader.decode(huff[(0, dc_t)])
                        diff = _extend(reader.bits(t), t) if t else 0
                        prev_dc[c["id"]] += diff
                        zz = np.zeros(64, dtype=np.int32)
                        zz[0] = prev_dc[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode(huff[(1, ac_t)])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                break
                            zz[k] = _extend(reader.bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = zz * qts[c["tq"]][ZIGZAG]
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bw"] + col] = blk.reshape(8, 8)
            mcu_idx += 1

    planes = []
    for c in comps:
        spatial = _idct2(c["coef"]) + 128.0
        plane = (
            spatial.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full resolution
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(np.repeat(plane, vmax // c["v"], 0), hmax // c["h"], 1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
