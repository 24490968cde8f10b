"""Sharper guarantees for the rows-only sketch/ANN queries at sf0.1.

These operators have no SQL-expressible oracle (engine-specific
hashing), so the driver records a rows-only check; the semantic
guarantees live here instead: planted-near-duplicate recall floors for
the two ANN paths and the Count-Min εN error bound against exact
counts — all at sf0.1, the bench scale, with deterministic seeds so a
pass is stable run-to-run.
"""

import pytest
from pyspark.sql import functions as F

from sparketl.io import load_table

SF_BENCH = "/root/testdata/sf0.1"
N_PLANT = 20
PLANT_BASE = 1_000_000  # planted ids live far above real vec_ids


@pytest.fixture(scope="module")
def emb01(spark):
    return load_table(spark, SF_BENCH, "embeddings").cache()


@pytest.fixture(scope="module")
def planted(spark, emb01):
    """Corpus ∪ 20 planted near-duplicates: vector i's twin is i plus a
    small fixed-direction perturbation (~0.998 cosine to its source) —
    the nearest neighbor of query i by a wide margin."""
    src = emb01.filter(F.col("vec_id") < N_PLANT).collect()
    assert len(src) == N_PLANT
    rows = []
    for r in src:
        v = list(r["embedding"])
        norm = sum(x * x for x in v) ** 0.5
        bump = 0.03 * norm / (len(v) ** 0.5)
        rows.append(
            (PLANT_BASE + r["vec_id"], [x + bump for x in v], r["label"])
        )
    twins = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    return emb01.unionByName(twins).cache()


def _recall_of_planted(topk_rows) -> float:
    hit = {
        r["query_id"]
        for r in topk_rows
        if r["neighbor_id"] == PLANT_BASE + r["query_id"]
    }
    return len(hit) / N_PLANT


def test_exact_cosine_always_finds_planted_twin(spark, emb01, planted):
    """Sanity: exact top-k retrieves every planted twin (rank 1)."""
    from sparketl.operators.similarity import cosine_topk

    queries = emb01.filter(F.col("vec_id") < N_PLANT)
    out = cosine_topk(planted, queries, k=5).collect()
    assert _recall_of_planted(out) == 1.0
    ranks = [
        r["rank"] for r in out if r["neighbor_id"] == PLANT_BASE + r["query_id"]
    ]
    assert all(rk == 1 for rk in ranks)


def test_ann_lsh_planted_twin_recall_floor(spark, emb01, planted):
    """ext_03_ann_lsh: ≥0.9 of the planted near-duplicates must be
    retrieved — a near-identical vector shares a hyperplane signature
    with its source in at least one of the 8 tables essentially always."""
    from sparketl.operators.similarity import ann_lsh_topk

    queries = emb01.filter(F.col("vec_id") < N_PLANT)
    out = ann_lsh_topk(planted, queries, k=5).collect()
    recall = _recall_of_planted(out)
    assert recall >= 0.9, f"LSH planted-twin recall {recall}"


def test_ann_ivf_planted_twin_recall_floor(spark, emb01, planted):
    """ext_03_ann_ivf: the twin lands in its source's IVF cell (same
    region of space), so nprobe-probing must retrieve ≥0.9 of them."""
    from sparketl.operators.similarity import ann_ivf_topk

    queries = emb01.filter(F.col("vec_id") < N_PLANT)
    out = ann_ivf_topk(planted, queries, k=5, n_cells=16, nprobe=4).collect()
    recall = _recall_of_planted(out)
    assert recall >= 0.9, f"IVF planted-twin recall {recall}"


def test_countmin_eps_bound_at_bench_scale(spark):
    """ext_55_countmin at sf0.1: estimates never undercount, and every
    probe obeys the Count-Min guarantee overcount ≤ (e/width)·N with N
    the exact stream length — no lower-bound slack, no 10× fudge."""
    import math

    from sparketl.operators.text import countmin_token_estimates

    docs = load_table(spark, SF_BENCH, "documents")
    width = 1 << 14
    rows = countmin_token_estimates(docs, depth=4, width=width, k=30).collect()
    assert len(rows) == 30
    n_stream = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).collect()[0]["n"]
    eps_n = math.e * n_stream / width
    for r in rows:
        assert r["cm_estimate"] >= r["exact_n"], r
        assert r["overcount"] <= eps_n, (r, eps_n)
