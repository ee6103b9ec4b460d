"""Figure sink (S7): the pure-numpy rasterizer writing the engine's own
BMP codec.  The reference's five matplotlib PNGs (project-co2.py:55,126,
155,168,177) map to fig_elbow / fig_scatter / fig_choropleth_tiles;
tests decode the BMP output and assert actual pixels."""

import numpy as np
import pytest

from big_data_co2_emission_analysis_spark.operators.multimodal import decode_bmp
from big_data_co2_emission_analysis_spark.sources.figures import (
    GREY,
    PALETTE,
    Canvas,
    fig_choropleth_tiles,
    fig_elbow,
    fig_scatter,
)


def test_canvas_primitives():
    c = Canvas(40, 30)
    assert (c.img == 255).all()
    c.fill_rect(5, 5, 10, 10, (255, 0, 0))
    assert tuple(c.img[7, 7]) == (255, 0, 0)
    assert tuple(c.img[7, 10]) == (255, 255, 255)  # exclusive bound
    c.line(0, 0, 39, 29, (0, 0, 255))
    assert tuple(c.img[0, 0]) == (0, 0, 255)
    assert tuple(c.img[29, 39]) == (0, 0, 255)
    # off-canvas drawing must clip, not crash
    c.line(-10, -10, 50, 50, (0, 255, 0))
    c.marker(-5, -5, (1, 2, 3))


def test_canvas_text_renders_glyph_pixels():
    c = Canvas(20, 12)
    c.text(1, 1, "I")
    # 'I' glyph (0x0E top row): bar lights glyph columns 1..3 -> x 2..4
    assert tuple(c.img[1, 3]) == (0, 0, 0)
    assert (c.img[1, 2:5] == 0).all()


def test_fig_elbow_round_trip(tmp_path):
    ks = list(range(2, 11))
    costs = [900.0, 610.0, 420.0, 300.0, 250.0, 225.0, 210.0, 200.0, 195.0]
    path = fig_elbow(ks, costs, str(tmp_path / "bestK.bmp"))
    px = decode_bmp(open(path, "rb").read())
    assert px.shape == (480, 640, 3)
    # the polyline is blue; some blue pixels must exist strictly inside axes
    blue = (px[:, :, 2] > 200) & (px[:, :, 0] < 60) & (px[:, :, 1] < 60)
    assert blue[41:439, 41:599].any()
    # markers are crimson, one per k
    crimson = (px[:, :, 0] > 180) & (px[:, :, 1] < 60)
    assert crimson.sum() >= len(ks) * 9  # 5x5 marker blocks


def test_fig_elbow_validates():
    with pytest.raises(ValueError):
        fig_elbow([2, 3], [1.0], "/tmp/never.bmp")


def test_fig_scatter_colors_by_label(tmp_path):
    xs = [0.0, 1.0, 2.0, 3.0]
    ys = [0.0, 1.0, 2.0, 3.0]
    labels = [0, 1, 2, 3]
    path = fig_scatter(xs, ys, labels, str(tmp_path / "scatter.bmp"))
    px = decode_bmp(open(path, "rb").read())
    # every label's palette color appears in the raster
    flat = set(map(tuple, px.reshape(-1, 3)))
    for lab in labels:
        assert PALETTE[lab] in flat
    # min point lands bottom-left of the data area, max top-right
    # (margins 40; data inset 10: min -> (50, 430), max -> (590, 50))
    assert tuple(px[430, 50]) == PALETTE[0]
    assert tuple(px[50, 590]) == PALETTE[3]


def test_fig_choropleth_value_ramp_and_missing(tmp_path):
    recs = [("USA", 10.0), ("DEU", 0.0), ("FRA", None), ("CHN", 5.0)]
    path = fig_choropleth_tiles(recs, str(tmp_path / "choro.bmp"))
    px = decode_bmp(open(path, "rb").read())
    t = 34
    # iso-sorted grid: CHN, DEU, FRA, USA
    def tile_center(i):
        return 1 + (i % 16) * t + t // 2, 1 + (i // 16) * t + t // 2

    x, y = tile_center(1)  # DEU = min value -> pale ramp low end
    assert tuple(px[y, x]) == (255, 245, 200)
    x, y = tile_center(3)  # USA = max value -> deep red
    assert tuple(px[y, x]) == (165, 0, 38)
    x, y = tile_center(2)  # FRA missing -> grey with hatch
    assert tuple(px[y, x + 8]) in (GREY, (120, 120, 120))
    # mid value interpolates strictly between the ramp ends
    x, y = tile_center(0)  # CHN = 5.0 of 10
    r, g, b = px[y, x]
    assert 165 < r <= 255 and 0 < g < 245


def test_fig_choropleth_categorical(tmp_path):
    recs = [("AAA", 0), ("BBB", 1), ("CCC", 2)]
    path = fig_choropleth_tiles(recs, str(tmp_path / "cat.bmp"), categorical=True)
    px = decode_bmp(open(path, "rb").read())
    t = 34
    for i in range(3):
        x, y = 1 + i * t + t // 2, 1 + t // 2
        assert tuple(px[y, x]) == PALETTE[i]


def test_fig_choropleth_dual_two_ramps(tmp_path):
    from big_data_co2_emission_analysis_spark.sources.figures import (
        fig_choropleth_dual,
    )

    recs = [
        ("AAA", -5.0, True),   # most-reduced -> deep green end
        ("BBB", -1.0, True),   # least-reduced -> pale green end
        ("CCC", 4.0, False),   # most-increased -> deep red end
        ("DDD", 1.0, False),   # least-increased -> pale red end
        ("EEE", None, None),   # missing -> grey hatch
    ]
    path = fig_choropleth_dual(recs, str(tmp_path / "dual.bmp"))
    px = decode_bmp(open(path, "rb").read())
    t = 34

    def center(i):
        return 1 + (i // 16) * t + t // 2, 1 + (i % 16) * t + t // 2

    y, x = center(0)
    assert tuple(px[y, x]) == (200, 255, 200)  # AAA: green ramp low end (min)
    y, x = center(1)
    assert tuple(px[y, x]) == (0, 110, 40)  # BBB: green ramp high end (max)
    y, x = center(2)
    assert tuple(px[y, x]) == (165, 0, 38)  # CCC: red ramp high end
    y, x = center(3)
    assert tuple(px[y, x]) == (255, 225, 225)  # DDD: red ramp low end
    y, x = center(4)
    assert tuple(px[y, x + 8]) in (GREY, (120, 120, 120))  # EEE missing


def test_figures_deterministic(tmp_path):
    a = fig_elbow([2, 3, 4], [9.0, 4.0, 3.0], str(tmp_path / "a.bmp"))
    b = fig_elbow([2, 3, 4], [9.0, 4.0, 3.0], str(tmp_path / "b.bmp"))
    assert open(a, "rb").read() == open(b, "rb").read()


def test_choropleth_render_input_matches_world_geo_revenue(spark, sf_dir, tmp_path):
    """Closes the S7<->J1 loop (round-2 verdict item 10): the (iso_a3,
    value) table a choropleth sink renders must be exactly the
    oracle-checked world_geo_revenue output -- same rows, same values,
    no figure-side re-join or silent drops -- and the render must be
    deterministic for that input."""
    from big_data_co2_emission_analysis_spark.queries.registry import all_queries

    result = all_queries()["world_geo_revenue"].fn(spark, sf_dir)
    rows = result.collect()

    # figure sink input built exactly as examples/co2_demo.py builds it
    render_input = [(r["iso_a3"], r["revenue"]) for r in rows]
    # parity: the render input IS the query result projected to the two
    # rendered columns -- a row-for-row match, None where unmatched
    assert len(render_input) == len(rows) == 177
    assert {iso for iso, _ in render_input} == {r["iso_a3"] for r in rows}
    for (iso, val), r in zip(render_input, rows):
        assert iso == r["iso_a3"] and val == r["revenue"]
    matched = {r["iso_a3"] for r in rows if r["matched"]}
    assert all((val is None) == (iso not in matched) for iso, val in render_input)

    p1 = fig_choropleth_tiles(render_input, str(tmp_path / "a.bmp"))
    p2 = fig_choropleth_tiles(render_input, str(tmp_path / "b.bmp"))
    b1, b2 = open(p1, "rb").read(), open(p2, "rb").read()
    assert b1 == b2  # deterministic render for identical input
    img = decode_bmp(b1)
    # unmatched countries render the grey missing-data hatch; matched
    # ones a value-ramp color -- spot-check one of each via tile origin
    recs = sorted(render_input, key=lambda r: str(r[0]))
    tile, cols = 34, 16
    for idx, (iso, val) in enumerate(recs):
        r, c = divmod(idx, cols)
        y, x = 1 + r * tile + tile // 2, 1 + c * tile + tile // 2
        px = tuple(int(v) for v in img[y, x])
        if val is None:
            assert px == GREY or px == (120, 120, 120)  # grey fill or hatch line
        else:
            assert px != GREY
