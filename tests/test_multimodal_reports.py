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
