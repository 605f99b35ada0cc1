"""Chart rendering (SURVEY.md §2 S6): the reference renders matplotlib bar
charts of its A1/A3 aggregates to PNG and embeds them in the Excel workbook
(Project.py:312-324). This container has no matplotlib/PIL, so the renderer
here is a dependency-free PNG encoder (struct + zlib are stdlib): a real
raster bar chart, not a stub — IHDR/IDAT/IEND with CRC'd chunks, filter-0
scanlines, 8-bit RGB.

Engine stance: charts render DRIVER-SIDE from an already-aggregated result
(tens of rows — the A1 monthly rollup, the A3 top-k). The aggregation is the
distributed part and stays in Spark; ``.collect()`` here is the presentation
boundary, the same place the reference calls ``plt.savefig``.
"""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import DataFrame

#: bar / background / axis colors (RGB)
BAR_RGB = (31, 119, 180)      # matplotlib C0, the reference's default bars
BG_RGB = (255, 255, 255)
AXIS_RGB = (0, 0, 0)

MAX_CHART_ROWS = 1_000  # charts render collected aggregates, not fact tables


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Encode an RGB raster (rows of (r,g,b)) as a PNG byte string."""
    height = len(pixels)
    width = len(pixels[0]) if height else 0
    raw = b"".join(
        b"\x00" + b"".join(bytes(px) for px in row) for row in pixels
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 9))
        + _png_chunk(b"IEND", b"")
    )


def render_bar_chart_png(
    values: list[float],
    width: int = 640,
    height: int = 320,
    margin: int = 10,
) -> bytes:
    """Render a bar chart of ``values`` to PNG bytes.

    Bars are laid out left-to-right with 1px gaps over a baseline axis;
    negative inputs clamp to 0 (the reference charts revenue aggregates,
    which the cleaning layer already floors at 0).
    """
    if not values:
        raise ValueError("render_bar_chart_png needs at least one value")
    vmax = max(max(values), 0.0) or 1.0
    plot_w = width - 2 * margin
    plot_h = height - 2 * margin
    n = len(values)
    if n > plot_w:
        raise ValueError(f"{n} bars exceed plot width {plot_w}px")
    bar_w = max(plot_w // n - 1, 1)
    pixels = [[BG_RGB] * width for _ in range(height)]
    baseline = height - margin
    for x in range(margin, width - margin):  # x axis
        pixels[baseline][x] = AXIS_RGB
    for y in range(margin, baseline + 1):  # y axis
        pixels[y][margin] = AXIS_RGB
    for i, v in enumerate(values):
        h = int(round(max(v, 0.0) / vmax * (plot_h - 1)))
        x0 = margin + 1 + i * (bar_w + 1)
        for x in range(x0, min(x0 + bar_w, width - margin)):
            for y in range(baseline - h, baseline):
                pixels[y][x] = BAR_RGB
    return encode_png(pixels)


def render_line_chart_png(
    values: list[float],
    width: int = 640,
    height: int = 320,
    margin: int = 10,
    marker_radius: int = 2,
) -> bytes:
    """Render a polyline-with-markers chart of ``values`` to PNG bytes —
    the reference's FIRST chart is this shape (Project.py:231-245:
    ``plt.plot(months, revenue, marker='o', linewidth=2)``, the revenue
    trend by financial month); the bar renderer covers its second chart
    (Project.py:248-267).

    Points are spaced evenly across the plot width in input order and
    scaled to [0, max]; consecutive points connect with Bresenham
    segments and each point gets a filled square marker (the 1-bit
    stand-in for matplotlib's 'o').
    """
    if not values:
        raise ValueError("render_line_chart_png needs at least one value")
    vmax = max(max(values), 0.0) or 1.0
    plot_w = width - 2 * margin
    plot_h = height - 2 * margin
    n = len(values)
    if n > plot_w:
        raise ValueError(f"{n} points exceed plot width {plot_w}px")
    pixels = [[BG_RGB] * width for _ in range(height)]
    baseline = height - margin
    for x in range(margin, width - margin):  # x axis
        pixels[baseline][x] = AXIS_RGB
    for y in range(margin, baseline + 1):  # y axis
        pixels[y][margin] = AXIS_RGB

    def pt(i: int, v: float) -> tuple[int, int]:
        x = margin + 1 + (i * (plot_w - 2)) // max(n - 1, 1)
        y = baseline - 1 - int(round(max(v, 0.0) / vmax * (plot_h - 2)))
        return x, y

    def draw(x: int, y: int) -> None:
        if margin < x < width - margin and margin <= y < baseline:
            pixels[y][x] = BAR_RGB

    points = [pt(i, v) for i, v in enumerate(values)]
    for (x0, y0), (x1, y1) in zip(points, points[1:]):
        # Bresenham segment between consecutive points
        dx, dy = abs(x1 - x0), -abs(y1 - y0)
        sx, sy = (1 if x0 < x1 else -1), (1 if y0 < y1 else -1)
        err = dx + dy
        x, y = x0, y0
        while True:
            draw(x, y)
            if x == x1 and y == y1:
                break
            e2 = 2 * err
            if e2 >= dy:
                err += dy
                x += sx
            if e2 <= dx:
                err += dx
                y += sy
    r = marker_radius
    for x0, y0 in points:  # filled square markers over the line
        for x in range(x0 - r, x0 + r + 1):
            for y in range(y0 - r, y0 + r + 1):
                draw(x, y)
    return encode_png(pixels)


def line_chart_png(
    df: DataFrame,
    label_col: str,
    value_col: str,
    width: int = 640,
    height: int = 320,
) -> bytes:
    """Chart an aggregated DataFrame (label, value) as a PNG line chart,
    ordered by label — the S6 surface over the A1 monthly trend
    (Project.py:231-245). Same collect bound as :func:`chart_png`."""
    rows = df.select(label_col, value_col).limit(MAX_CHART_ROWS + 1).collect()
    if len(rows) > MAX_CHART_ROWS:
        raise ValueError(
            f"chart input exceeds {MAX_CHART_ROWS} rows; aggregate in Spark "
            "before charting"
        )
    rows.sort(key=lambda r: r[0])
    return render_line_chart_png(
        [float(r[1] or 0.0) for r in rows], width, height
    )


def chart_png(
    df: DataFrame,
    label_col: str,
    value_col: str,
    width: int = 640,
    height: int = 320,
) -> bytes:
    """Chart an aggregated DataFrame (label, value) as a PNG bar chart,
    ordered by label — the S6 surface over the A1/A3 query outputs.

    Raises if the input exceeds ``MAX_CHART_ROWS``: charting a fact table
    is a bug, the aggregate belongs in Spark.
    """
    rows = df.select(label_col, value_col).limit(MAX_CHART_ROWS + 1).collect()
    if len(rows) > MAX_CHART_ROWS:
        raise ValueError(
            f"chart input exceeds {MAX_CHART_ROWS} rows; aggregate in Spark "
            "before charting"
        )
    rows.sort(key=lambda r: r[0])
    return render_bar_chart_png([float(r[1] or 0.0) for r in rows], width, height)
