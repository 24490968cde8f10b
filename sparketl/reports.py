"""Report/chart layer (SURVEY §3.4 — tool:1213-1357).

The reference builds Bar/Line/Pie charts from the *entire* cached
result set client-side. Here the aggregation runs as a DataFrame op
(AGG-01/02) and only the small aggregate is collected; rendering uses
matplotlib when present, else a built-in headless rasterizer (SNK-03/
04): numpy-drawn bars / polylines / pie sectors (geometry only, no
text) written as PNG via the stdlib encoder in ``sparketl.codecs``,
or wrapped in a minimal single-page PDF (one FlateDecode DeviceRGB
image XObject) — so the reference's export path (tool:1278-1287) is
fully testable in images without matplotlib.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHART_TYPES = ("Bar Graph", "Line Graph", "Pie Chart")  # tool:1036


class ReportError(Exception):
    pass


def _numeric(df: DataFrame, col: str) -> bool:
    # tool:1241-1243 — numeric-dtype gate for Bar/Line Y axes
    return dict(df.dtypes)[col] in (
        "tinyint", "smallint", "int", "bigint", "float", "double"
    ) or dict(df.dtypes)[col].startswith("decimal")


def report_data(df: DataFrame, chart: str, x_col: str, y_col: str):
    """Compute the (small) aggregate behind a chart; returns pandas.

    Pie: group-sum (tool:1261-1262) or value-counts when x==y
    (tool:1263-1264). Bar/Line: x vs numeric y, as-is.
    """
    if x_col not in df.columns or y_col not in df.columns:
        raise ReportError(f"Columns not found: {x_col}/{y_col}")  # tool:1236-1239
    if chart == "Pie Chart":
        if x_col == y_col:
            agg = (
                df.groupBy(x_col)
                .agg(F.count(F.lit(1)).alias("count"))
                .orderBy(F.desc("count"), x_col)
            )
        else:
            if not _numeric(df, y_col):
                raise ReportError(f"Column '{y_col}' must be numeric")
            agg = df.groupBy(x_col).agg(F.sum(y_col).alias(y_col)).orderBy(x_col)
        return agg.toPandas()
    if chart in ("Bar Graph", "Line Graph"):
        if not _numeric(df, y_col):
            raise ReportError(f"Column '{y_col}' must be numeric")  # tool:1241-1243
        return df.select(x_col, y_col).toPandas()
    raise ReportError(f"Unknown chart type: {chart}")


# categorical palette for the headless renderer (RGB)
_PALETTE = [
    (31, 119, 180),
    (255, 127, 14),
    (44, 160, 44),
    (214, 39, 40),
    (148, 103, 189),
    (140, 86, 75),
    (227, 119, 194),
    (127, 127, 127),
]


def _render_chart_rgb(pdf, chart: str, x_col: str, y_col: str, w: int = 640, h: int = 400):
    """Rasterize the aggregate to an RGB buffer: filled bars, a
    1-px-interpolated polyline, or angle-tested pie sectors — all
    vectorized numpy, white background, black axes. Returns
    (w, h, raw_rgb_bytes)."""
    import numpy as np

    img = np.full((h, w, 3), 255, dtype=np.uint8)
    ml, mr, mt, mb = 50, 20, 20, 40  # margins
    if chart == "Pie Chart":
        vals = np.asarray(pdf[pdf.columns[-1]], dtype=float)
        vals = np.clip(vals, 0.0, None)
        total = vals.sum()
        if total <= 0:
            raise ReportError("Pie Chart needs a positive value sum")
        cx, cy = w / 2.0, h / 2.0
        radius = min(w, h) / 2.0 - 10
        yy, xx = np.mgrid[0:h, 0:w]
        dx, dy = xx - cx, yy - cy
        inside = dx * dx + dy * dy <= radius * radius
        theta = np.arctan2(dy, dx)  # [-pi, pi]
        frac = (theta + np.pi) / (2 * np.pi)  # [0, 1)
        bounds = np.cumsum(vals) / total
        slice_idx = np.searchsorted(bounds, frac, side="right")
        slice_idx = np.clip(slice_idx, 0, len(vals) - 1)
        for i in range(len(vals)):
            mask = inside & (slice_idx == i)
            img[mask] = _PALETTE[i % len(_PALETTE)]
        return w, h, img.tobytes()

    ys = np.asarray(pdf[y_col], dtype=float)
    if ys.size == 0:
        raise ReportError("empty result set")
    lo, hi = min(0.0, float(ys.min())), max(0.0, float(ys.max()))
    if hi == lo:
        hi = lo + 1.0
    px_h = h - mt - mb

    def ypix(v: float) -> int:
        return int(mt + (hi - v) / (hi - lo) * (px_h - 1))

    # axes
    img[h - mb, ml:w - mr] = 0
    img[mt:h - mb + 1, ml] = 0
    if chart == "Bar Graph":
        n = ys.size
        span = (w - ml - mr) / n
        bar_w = max(1, int(span * 0.8))
        y0 = ypix(0.0)
        for i, v in enumerate(ys):
            x0 = int(ml + i * span + span * 0.1)
            top, bot = sorted((ypix(float(v)), y0))
            img[top : bot + 1, x0 : x0 + bar_w] = _PALETTE[i % len(_PALETTE)]
        return w, h, img.tobytes()
    if chart == "Line Graph":
        xs_raw = pdf[x_col]
        try:
            xs = np.asarray(xs_raw, dtype=float)
        except (TypeError, ValueError):
            xs = np.arange(ys.size, dtype=float)
        order = np.argsort(xs, kind="stable")
        xs, ys_o = xs[order], ys[order]
        xlo, xhi = float(xs.min()), float(xs.max())
        if xhi == xlo:
            xhi = xlo + 1.0
        xp = ml + (xs - xlo) / (xhi - xlo) * (w - ml - mr - 1)
        # interpolate one sample per x pixel, then connect vertically
        grid = np.arange(ml, w - mr)
        yv = np.interp(grid, xp, ys_o)
        ypx = np.array([ypix(float(v)) for v in yv])
        color = _PALETTE[0]
        for j in range(grid.size):
            a = ypx[j - 1] if j else ypx[j]
            top, bot = sorted((int(a), int(ypx[j])))
            img[top : bot + 1, grid[j]] = color
        return w, h, img.tobytes()
    raise ReportError(f"Unknown chart type: {chart}")


def _rgb_to_pdf(w: int, h: int, raw: bytes) -> bytes:
    """Minimal single-page PDF embedding the RGB raster as one
    FlateDecode /DeviceRGB image XObject — enough for SNK-04 without
    a PDF library, and round-trippable by inflating the stream."""
    import zlib

    data = zlib.compress(raw)
    objs: list[bytes] = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    objs.append(
        (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
            "/Resources << /XObject << /Im0 4 0 R >> >> /Contents 5 0 R >>"
        ).encode()
    )
    objs.append(
        (
            f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
            "/ColorSpace /DeviceRGB /BitsPerComponent 8 "
            f"/Filter /FlateDecode /Length {len(data)} >>\nstream\n"
        ).encode()
        + data
        + b"\nendstream"
    )
    content = f"q {w} 0 0 {h} 0 0 cm /Im0 Do Q".encode()
    objs.append(
        (f"<< /Length {len(content)} >>\nstream\n").encode()
        + content
        + b"\nendstream"
    )
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def export_chart(pdf, chart: str, x_col: str, y_col: str, out_path: str) -> str:
    """Render + save PNG/PDF (SNK-03/04). Uses matplotlib when
    installed; otherwise the built-in headless rasterizer (geometry
    only — no titles/labels, which need font rendering)."""
    try:
        import matplotlib
    except ImportError:
        matplotlib = None
    if matplotlib is not None:
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 5))
        if chart == "Pie Chart":
            ax.pie(pdf[pdf.columns[-1]], labels=pdf[x_col], autopct="%1.1f%%")
        elif chart == "Bar Graph":
            ax.bar(pdf[x_col].astype(str), pdf[y_col])
        else:
            ax.plot(pdf[x_col], pdf[y_col])
        ax.set_title(f"{chart}: {y_col} by {x_col}")
        fig.savefig(out_path)
        plt.close(fig)
        return out_path
    from sparketl.codecs import encode_png

    w, h, raw = _render_chart_rgb(pdf, chart, x_col, y_col)
    if out_path.lower().endswith(".pdf"):
        payload = _rgb_to_pdf(w, h, raw)
    else:
        payload = encode_png(w, h, 3, raw)
    with open(out_path, "wb") as f:
        f.write(payload)
    return out_path
