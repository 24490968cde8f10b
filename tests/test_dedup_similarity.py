"""Semantic checks for the hash-based ops the DuckDB oracle can't cover."""

import pytest
from pyspark.sql import functions as F

from sparketl.io import load_table
from sparketl.operators.dedup import (
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)
from sparketl.operators.similarity import ann_lsh_topk, cosine_topk
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").cache()


def test_minhash_candidates_cover_true_near_dups(spark, docs):
    """LSH banding must recall (nearly) all true Jaccard≥0.5 pairs."""
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    cand = {
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_candidates(docs).collect()
    }
    assert truth, "fixture should contain near-dups"
    recall = len(truth & cand) / len(truth)
    assert recall >= 0.9, f"LSH recall too low: {recall} ({len(truth)} true pairs)"


def test_simhash_near_dups_have_small_hamming(spark, docs):
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    fp = simhash(docs)
    joined = (
        pairs.join(fp.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("simhash", "ha"), "doc_a")
        .join(fp.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("simhash", "hb"), "doc_b")
        .select(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("ham"))
    )
    stats = joined.agg(F.avg("ham").alias("avg")).collect()[0]
    # near-dup docs: hamming well below the ~32 expectation for random pairs
    assert stats["avg"] < 16, stats


def test_simhash_deterministic(spark, docs):
    a = {tuple(r) for r in simhash(docs).collect()}
    b = {tuple(r) for r in simhash(docs).collect()}
    assert a == b


def test_ann_lsh_recall_vs_bruteforce(spark, emb):
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_lsh_topk(emb, queries, k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"ANN recall {recall}"  # multi-probe 1-bit, 8 planes


def test_cosine_topk_excludes_self_and_ranks(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    out = cosine_topk(emb, queries, k=5).collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in out)
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())


def test_ann_ivf_recall_vs_bruteforce(spark, emb):
    from sparketl.operators.similarity import ann_ivf_topk

    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_ivf_topk(emb, queries, k=10, n_cells=16, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall}"


def test_ann_ivf_deterministic(spark, emb):
    from sparketl.operators.similarity import ann_ivf_topk

    queries = emb.filter(F.col("vec_id") < 4)
    a = sorted(tuple(r) for r in ann_ivf_topk(emb, queries, k=5).collect())
    b = sorted(tuple(r) for r in ann_ivf_topk(emb, queries, k=5).collect())
    assert a == b and len(a) > 0


def test_dup_clusters_equal_bfs_components(spark, docs):
    """Label propagation must produce exactly the BFS connected
    components of the candidate-pair graph."""
    from collections import defaultdict

    from sparketl.operators.dedup import dup_clusters, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    edges = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    assert edges, "fixture should contain near-dup pairs"
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected = {}
    for start in sorted(adj):
        if start in expected:
            continue
        stack, comp = [start], []
        seen = {start}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x] - seen:
                seen.add(y)
                stack.append(y)
        root = min(comp)
        for x in comp:
            expected[x] = root

    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert got == expected


def test_hll_ndv_error_bound_and_determinism(spark, docs):
    from sparketl.operators.text import q_ext_09_hll_ndv
    from tests.conftest import SF_SMOKE

    a = {r["lang"]: (r["ndv_approx"], r["ndv_exact"])
         for r in q_ext_09_hll_ndv(spark, SF_SMOKE).collect()}
    b = {r["lang"]: (r["ndv_approx"], r["ndv_exact"])
         for r in q_ext_09_hll_ndv(spark, SF_SMOKE).collect()}
    assert a == b and len(a) == 5
    for lang, (approx, exact) in a.items():
        assert abs(approx - exact) / exact < 0.1, (lang, approx, exact)


def test_label_centroids_known_mean(spark):
    from sparketl.operators.similarity import label_centroids

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 7), (2, [3.0, 2.0], 7), (3, [10.0, 10.0], 8)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {(r["label"], r["pos"]): (r["n"], r["mean_v"]) for r in label_centroids(emb).collect()}
    assert rows[(7, 0)] == (2, 2.0)
    assert rows[(7, 1)] == (2, 1.0)
    assert rows[(8, 0)] == (1, 10.0)


def test_embedding_covariance_matches_numpy(spark):
    """ext_98: the nano-quantized distributed covariance must agree
    with numpy's dense covariance to quantization error, and the
    diagonal must be non-negative."""
    import numpy as np

    from sparketl.operators.similarity import embedding_covariance
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = embedding_covariance(emb).collect()
    X = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    ref = np.cov(X, rowvar=False)  # ddof=1, matching /(n-1)
    dim = X.shape[1]
    assert len(rows) == dim * (dim + 1) // 2
    for r in rows:
        i, j = r["pos_i"], r["pos_j"]
        assert r["n_vecs"] == X.shape[0]
        assert abs(r["cov"] - ref[i][j]) < 1e-5, (i, j)
        if i == j:
            assert r["cov"] >= 0.0


def test_pca_top_component_matches_numpy_eigh(spark):
    """ext_99 (rows-only): the power-iteration leading component must
    align with numpy's dense eigendecomposition (|cos| > 0.999) and
    its eigenvalue must match the top eigenvalue."""
    import numpy as np

    from sparketl.operators.similarity import pca_top_component
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = pca_top_component(emb).collect()
    v = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["pos"])])
    eigval = rows[0]["eigenvalue"]
    X = np.array(
        [r["embedding"] for r in emb.collect()], dtype=np.float64
    )
    ref_vals, ref_vecs = np.linalg.eigh(np.cov(X, rowvar=False))
    top = ref_vecs[:, -1]
    assert abs(float(np.dot(v, top))) > 0.999
    assert abs(eigval - ref_vals[-1]) < 1e-3 * max(1.0, abs(ref_vals[-1]))
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-9
