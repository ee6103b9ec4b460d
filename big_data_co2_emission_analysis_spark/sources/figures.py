"""Figure sink (reference S7): the reference saves five matplotlib PNGs
(`/root/reference/project-co2.py:55,126,155,168,177` -- elbow plot,
cluster scatter, three choropleths).  matplotlib is not in this
environment, so this module renders figures from scratch -- a pure-numpy
rasterizer (Bresenham lines, square point markers, a 5x7 bitmap font,
linear color ramps) writing the engine's own 24-bit BMP codec
(`operators.multimodal.encode_bmp`).

Scale posture: a figure sink is inherently a DRIVER-side terminal op --
the inputs are already-reduced results (an elbow sweep is ~10 numbers, a
choropleth is one row per country).  Callers must aggregate in Spark
first and pass small in-memory sequences; nothing here touches a
DataFrame, so there is no hidden collect of a big table.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

import numpy as np

from ..operators.multimodal import encode_bmp

WHITE = (255, 255, 255)
BLACK = (0, 0, 0)
GREY = (200, 200, 200)

# "rainbow"-ish categorical palette (cluster colors, ref :125 cmap='rainbow')
PALETTE = [
    (148, 0, 211),
    (0, 0, 255),
    (0, 200, 83),
    (255, 200, 0),
    (255, 120, 0),
    (220, 20, 60),
    (0, 180, 180),
    (120, 90, 40),
]

# 5x7 font for the characters figures need (digits, caps, a few symbols);
# each glyph is 7 rows x 5 bits, MSB = leftmost pixel.
_FONT = {
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    "3": (0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    "A": (0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "B": (0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    "C": (0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    "D": (0x1C, 0x12, 0x11, 0x11, 0x11, 0x12, 0x1C),
    "E": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    "F": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    "G": (0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F),
    "H": (0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "I": (0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "J": (0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    "K": (0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    "L": (0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    "M": (0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    "N": (0x11, 0x19, 0x15, 0x13, 0x11, 0x11, 0x11),
    "O": (0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "P": (0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    "Q": (0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    "R": (0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    "S": (0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    "T": (0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "U": (0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "V": (0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    "W": (0x11, 0x11, 0x11, 0x15, 0x15, 0x1B, 0x11),
    "X": (0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    "Y": (0x11, 0x11, 0x0A, 0x04, 0x04, 0x04, 0x04),
    "Z": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    "-": (0x00, 0x00, 0x00, 0x1F, 0x00, 0x00, 0x00),
    ".": (0x00, 0x00, 0x00, 0x00, 0x00, 0x0C, 0x0C),
    " ": (0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00),
}


class Canvas:
    """Minimal raster surface: (H, W, 3) uint8, y grows downward."""

    def __init__(self, width: int, height: int, bg=WHITE):
        self.img = np.full((height, width, 3), bg, dtype=np.uint8)

    @property
    def size(self) -> tuple[int, int]:
        h, w = self.img.shape[:2]
        return w, h

    def fill_rect(self, x0: int, y0: int, x1: int, y1: int, color) -> None:
        h, w = self.img.shape[:2]
        x0, x1 = max(0, min(x0, x1)), min(w, max(x0, x1))
        y0, y1 = max(0, min(y0, y1)), min(h, max(y0, y1))
        self.img[y0:y1, x0:x1] = color

    def marker(self, x: int, y: int, color, r: int = 2) -> None:
        self.fill_rect(x - r, y - r, x + r + 1, y + r + 1, color)

    def line(self, x0: int, y0: int, x1: int, y1: int, color) -> None:
        """Bresenham segment, clipped to the canvas."""
        dx, dy = abs(x1 - x0), -abs(y1 - y0)
        sx, sy = (1 if x0 < x1 else -1), (1 if y0 < y1 else -1)
        err = dx + dy
        h, w = self.img.shape[:2]
        while True:
            if 0 <= x0 < w and 0 <= y0 < h:
                self.img[y0, x0] = color
            if x0 == x1 and y0 == y1:
                return
            e2 = 2 * err
            if e2 >= dy:
                err += dy
                x0 += sx
            if e2 <= dx:
                err += dx
                y0 += sy

    def text(self, x: int, y: int, s: str, color=BLACK) -> None:
        """Draw ``s`` with the 5x7 font, top-left at (x, y); unknown
        characters render as blanks (the font covers what figures use)."""
        for ch in s.upper():
            glyph = _FONT.get(ch, _FONT[" "])
            for row, bits in enumerate(glyph):
                for col in range(5):
                    if bits & (0x10 >> col):
                        yy, xx = y + row, x + col
                        if 0 <= yy < self.img.shape[0] and 0 <= xx < self.img.shape[1]:
                            self.img[yy, xx] = color
            x += 6

    def save(self, path: str) -> str:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(encode_bmp(self.img))
        return path


def _ramp(t: float, lo=(255, 245, 200), hi=(165, 0, 38)) -> tuple[int, int, int]:
    """Linear color ramp (Spectral_r-flavored: pale yellow -> deep red)."""
    t = min(1.0, max(0.0, t))
    return tuple(int(round(a + (b - a) * t)) for a, b in zip(lo, hi))


def _axes(c: Canvas, m: int = 40) -> tuple[int, int, int, int]:
    """Draw plot axes; return the data area (x0, y0, x1, y1)."""
    w, h = c.size
    c.line(m, h - m, w - m, h - m, BLACK)  # x axis
    c.line(m, m, m, h - m, BLACK)  # y axis
    return m, m, w - m, h - m


def fig_elbow(
    ks: Sequence[int],
    costs: Sequence[float],
    path: str,
    width: int = 640,
    height: int = 480,
) -> str:
    """Elbow plot (ref :51-56): WSSSE cost vs k as a polyline with
    point markers and k tick labels."""
    if len(ks) != len(costs) or not ks:
        raise ValueError("ks and costs must be equal-length and non-empty")
    c = Canvas(width, height)
    x0, y0, x1, y1 = _axes(c)
    lo, hi = min(costs), max(costs)
    span = (hi - lo) or 1.0
    n = len(ks)

    def px(i: int) -> int:
        return x0 + int((x1 - x0 - 20) * (i / max(1, n - 1))) + 10

    def py(v: float) -> int:
        return y1 - 10 - int((y1 - y0 - 20) * ((v - lo) / span))

    pts = [(px(i), py(v)) for i, v in enumerate(costs)]
    for (ax, ay), (bx, by) in zip(pts, pts[1:]):
        c.line(ax, ay, bx, by, (0, 0, 255))
    for (x, y), k in zip(pts, ks):
        c.marker(x, y, (220, 20, 60), r=2)
        c.text(x - 2, y1 + 6, str(k))
    c.text(x0, y0 - 14, "WSSSE VS K")
    return c.save(path)


def fig_scatter(
    xs: Sequence[float],
    ys: Sequence[float],
    labels: Sequence[int],
    path: str,
    width: int = 640,
    height: int = 480,
) -> str:
    """Cluster scatter (ref :125): points colored by categorical label
    from the rainbow-ish palette."""
    if not (len(xs) == len(ys) == len(labels)) or not xs:
        raise ValueError("xs, ys, labels must be equal-length and non-empty")
    c = Canvas(width, height)
    x0, y0, x1, y1 = _axes(c)
    xlo, xhi = min(xs), max(xs)
    ylo, yhi = min(ys), max(ys)
    xspan, yspan = (xhi - xlo) or 1.0, (yhi - ylo) or 1.0
    for x, y, lab in zip(xs, ys, labels):
        px = x0 + 10 + int((x1 - x0 - 20) * ((x - xlo) / xspan))
        py = y1 - 10 - int((y1 - y0 - 20) * ((y - ylo) / yspan))
        c.marker(px, py, PALETTE[int(lab) % len(PALETTE)], r=2)
    c.text(x0, y0 - 14, "CLUSTERS")
    return c.save(path)


def fig_choropleth_dual(
    records: Sequence[tuple[str, float | None, bool | None]],
    path: str,
    tile: int = 34,
    cols: int = 16,
) -> str:
    """The reference's improvement map (ref :173-178): reduced countries
    on a green ramp ('summer'), increased on a red ramp ('Reds'), each
    normalized within its own group exactly as two separate .plot()
    calls would; missing data grey."""
    reds = [float(v) for _, v, f in records if v is not None and f]
    incs = [float(v) for _, v, f in records if v is not None and not f]

    def norm(v: float, vals: list[float]) -> float:
        lo, hi = (min(vals), max(vals)) if vals else (0.0, 1.0)
        return (v - lo) / ((hi - lo) or 1.0)

    colored: list[tuple[str, float | None]] = []
    overrides: dict[str, tuple[int, int, int]] = {}
    for iso, v, f in records:
        colored.append((iso, None if v is None else 0.0))
        if v is not None:
            overrides[str(iso)] = (
                _ramp(norm(float(v), reds), lo=(200, 255, 200), hi=(0, 110, 40))
                if f
                else _ramp(norm(float(v), incs), lo=(255, 225, 225), hi=(165, 0, 38))
            )
    return _render_tiles(colored, path, tile, cols, overrides)


def fig_choropleth_tiles(
    records: Sequence[tuple[str, float | None]],
    path: str,
    categorical: bool = False,
    tile: int = 34,
    cols: int = 16,
) -> str:
    """Choropleth stand-in (ref :152-178): without polygon geometry (no
    geopandas here) each country becomes a labeled tile in an iso-sorted
    grid -- value-ramp color (or categorical palette), unmatched/None
    hatched grey exactly like the reference's missing-data styling."""
    return _render_tiles(records, path, tile, cols, {}, categorical)


def _render_tiles(
    records: Sequence[tuple[str, float | None]],
    path: str,
    tile: int,
    cols: int,
    overrides: dict[str, tuple[int, int, int]],
    categorical: bool = False,
) -> str:
    recs = sorted(records, key=lambda r: str(r[0]))
    if not recs:
        raise ValueError("no records")
    vals = [v for _, v in recs if v is not None]
    lo = min(vals) if vals else 0.0
    hi = max(vals) if vals else 1.0
    span = (hi - lo) or 1.0
    rows = (len(recs) + cols - 1) // cols
    c = Canvas(cols * tile + 2, rows * tile + 2)
    for i, (iso, val) in enumerate(recs):
        r, col = divmod(i, cols)
        x, y = 1 + col * tile, 1 + r * tile
        if str(iso) in overrides:
            color = overrides[str(iso)]
            c.fill_rect(x, y, x + tile - 2, y + tile - 2, color)
        elif val is None:
            c.fill_rect(x, y, x + tile - 2, y + tile - 2, GREY)
            for d in range(0, tile - 2, 4):  # the reference's hatch='///'
                c.line(x + d, y + tile - 3, x + tile - 3, y + d, (120, 120, 120))
            color = GREY
        else:
            color = (
                PALETTE[int(val) % len(PALETTE)]
                if categorical
                else _ramp((float(val) - lo) / span)
            )
            c.fill_rect(x, y, x + tile - 2, y + tile - 2, color)
        lum = 0.299 * color[0] + 0.587 * color[1] + 0.114 * color[2]
        c.text(x + 3, y + 3, str(iso)[:3], BLACK if lum > 128 else WHITE)
    return c.save(path)
