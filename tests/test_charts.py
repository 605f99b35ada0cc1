"""S6 chart render: the stdlib PNG encoder must produce a decodable PNG
whose raster actually contains the bars (decoded with zlib, not eyeballed)."""

from __future__ import annotations

import struct
import zlib

import pytest

from nosql_based_business_intelligence_system_spark.sources import charts


def _decode_png(data: bytes):
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, chunks = 8, {}
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        assert crc == zlib.crc32(tag + body) & 0xFFFFFFFF, "chunk CRC"
        chunks.setdefault(tag, b"")
        chunks[tag] += body
        pos += 12 + ln
    w, h, depth, ctype = struct.unpack_from(">IIBB", chunks[b"IHDR"], 0)
    assert (depth, ctype) == (8, 2)
    raw = zlib.decompress(chunks[b"IDAT"])
    stride = 1 + w * 3
    rows = []
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        assert line[0] == 0, "filter 0 expected"
        rows.append([tuple(line[1 + x * 3 : 4 + x * 3]) for x in range(w)])
    return w, h, rows

def test_bar_chart_pixels_match_values():
    png = charts.render_bar_chart_png([1.0, 0.5, 0.0], width=64, height=48, margin=4)
    w, h, px = _decode_png(png)
    assert (w, h) == (64, 48)
    cols_with_bar = [
        x for x in range(w) if any(px[y][x] == charts.BAR_RGB for y in range(h))
    ]
    assert cols_with_bar, "no bars rendered"
    heights = {}
    for x in cols_with_bar:
        heights[x] = sum(px[y][x] == charts.BAR_RGB for y in range(h))
    hs = sorted(set(heights.values()), reverse=True)
    assert len(hs) == 2  # full-height bar and half-height bar (zero bar absent)
    assert abs(hs[0] - 2 * hs[1]) <= 2  # 1.0 vs 0.5 -> ~2:1 in pixels
    assert any(px[h - 5][x] == charts.AXIS_RGB for x in range(w))  # x axis drawn


def test_line_chart_pixels_match_values():
    vals = [0.0, 1.0, 0.5, 1.0]
    png = charts.render_line_chart_png(
        vals, width=64, height=48, margin=4, marker_radius=1
    )
    w, h, px = _decode_png(png)
    assert (w, h) == (64, 48)
    line_cols = {
        x: [y for y in range(h) if px[y][x] == charts.BAR_RGB]
        for x in range(w)
    }
    line_cols = {x: ys for x, ys in line_cols.items() if ys}
    assert line_cols, "no line rendered"
    # the polyline is horizontally continuous between first and last point
    xs = sorted(line_cols)
    assert xs == list(range(xs[0], xs[-1] + 1)), "gap in polyline"
    # peaks (1.0) reach higher (smaller y) than the valley (0.5); the
    # peak points sit near the plot top, the 0.0 start near the baseline
    top_y = min(min(ys) for ys in line_cols.values())
    start_y = max(line_cols[xs[0]])
    assert top_y < h // 2 < start_y
    # markers thicken the line at the data points: some column must have
    # a >=3-pixel vertical run (marker_radius=1 -> 3x3 square)
    assert any(len(ys) >= 3 for ys in line_cols.values())
    assert any(px[h - 5][x] == charts.AXIS_RGB for x in range(w))  # x axis


def test_line_chart_single_point_and_empty():
    png = charts.render_line_chart_png([2.0], width=32, height=32, margin=4)
    w, h, px = _decode_png(png)
    assert any(
        px[y][x] == charts.BAR_RGB for y in range(h) for x in range(w)
    ), "single-point marker missing"
    with pytest.raises(ValueError, match="at least one value"):
        charts.render_line_chart_png([])


def test_line_chart_png_over_a1_aggregate(spark, sf_smoke):
    from nosql_based_business_intelligence_system_spark.queries import QUERIES

    monthly = QUERIES["sales_by_fiscal_month"].fn(spark, sf_smoke)
    png = charts.line_chart_png(monthly, "fin_month_label", "revenue")
    w, h, _ = _decode_png(png)
    assert (w, h) == (640, 320)


def test_line_chart_png_rejects_fact_table(spark, sf_smoke):
    from nosql_based_business_intelligence_system_spark.sources.tables import load_table

    li = load_table(spark, sf_smoke, "lineitem")
    with pytest.raises(ValueError, match="aggregate in Spark"):
        charts.line_chart_png(li, "l_orderkey", "l_extendedprice")


def test_chart_png_over_a1_aggregate(spark, sf_smoke):
    from nosql_based_business_intelligence_system_spark.queries import QUERIES

    monthly = QUERIES["sales_by_fiscal_month"].fn(spark, sf_smoke)
    png = charts.chart_png(monthly, "fin_month_label", "revenue")
    w, h, _ = _decode_png(png)
    assert (w, h) == (640, 320)


def test_chart_png_rejects_fact_table(spark, sf_smoke):
    from nosql_based_business_intelligence_system_spark.sources.tables import load_table

    li = load_table(spark, sf_smoke, "lineitem")
    with pytest.raises(ValueError, match="aggregate in Spark"):
        charts.chart_png(li, "l_orderkey", "l_extendedprice")
