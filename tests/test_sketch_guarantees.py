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


DOC_PLANT_BASE = 10_000_000
N_DOC_PLANT = 30


@pytest.fixture(scope="module")
def docs_planted(spark):
    """sf0.1 documents ∪ 30 planted near-duplicates: twin i is doc i
    with only its LAST token replaced, so only the trailing 3 trigram
    shingles change — true Jaccard (S-3)/(S+3) ≥ 0.9 for the ≥60-token
    docs selected, comfortably above the 0.8 pipeline threshold."""
    docs = load_table(spark, SF_BENCH, "documents")
    base = (
        docs.filter(F.size(F.split("text", " ")) >= 60)
        .orderBy("doc_id")
        .limit(N_DOC_PLANT)
    )
    twins = base.select(
        (F.col("doc_id") + DOC_PLANT_BASE).alias("doc_id"),
        F.concat_ws(
            " ",
            F.slice(
                F.split("text", " "), 1, F.size(F.split("text", " ")) - 1
            ),
            F.lit("qqnearduptoken"),
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    planted_ids = [r["doc_id"] for r in base.select("doc_id").collect()]
    assert len(planted_ids) == N_DOC_PLANT
    return docs.unionByName(twins).cache(), planted_ids


def test_lsh_dedup_pipeline_planted_twin_recall_floor(spark, docs_planted):
    """ext_82 (rows-only): the LSH candidate stage must surface ≥0.9 of
    the planted true near-dup pairs at sf0.1 — the exact pipeline
    (ext_70) finds them all by construction, so this floors the LSH
    swap's recall against it at bench scale."""
    from sparketl.operators.dedup import minhash_lsh_candidates, shingles

    corpus, planted_ids = docs_planted
    # every planted pair really is a true pair under the 0.8 threshold
    sh = shingles(corpus)
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    pairs = spark.createDataFrame(
        [(i, i + DOC_PLANT_BASE) for i in planted_ids], "doc_a long, doc_b long"
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            (
                inter.cast("double")
                / (F.size("sh_a") + F.size("sh_b") - inter).cast("double")
            ).alias("j"),
        )
        .collect()
    )
    assert len(jac) == N_DOC_PLANT
    assert all(r["j"] >= 0.8 for r in jac)

    cand = minhash_lsh_candidates(corpus)
    found = {
        r["doc_a"]
        for r in cand.filter(
            (F.col("doc_b") - F.col("doc_a") == DOC_PLANT_BASE)
        ).collect()
        if r["doc_a"] in set(planted_ids)
    }
    recall = len(found) / N_DOC_PLANT
    assert recall >= 0.9, f"LSH planted near-dup recall {recall}"


def test_lsh_pipeline_report_counts_planted_removals(spark, docs_planted):
    """End-to-end ext_82 on the planted corpus: the per-source removal
    counts must account for (at least) the recalled planted twins —
    the report actually removes what the candidate stage finds."""
    from sparketl.operators.curation import lsh_dedup_pipeline_report

    corpus, planted_ids = docs_planted
    rep = lsh_dedup_pipeline_report(corpus).collect()
    total_removed = sum(r["n_removed"] for r in rep)
    assert total_removed >= int(0.9 * N_DOC_PLANT)
    total_docs = sum(r["n_docs"] for r in rep)
    assert total_docs == corpus.count()


def test_hll_register_fold_is_associative_and_order_free(spark):
    """ext_146's correctness rests on register folds commuting with any
    batch split: registers(A∪B∪C) == fold(fold(reg(A), reg(B)), reg(C))
    == fold(reg(A), fold(reg(B), reg(C))) for ARBITRARY partitions of
    the corpus — the property that lets a persisted register table
    absorb ingest batches in any order."""
    from pyspark.sql import functions as F

    from sparketl.operators.text import hll_registers, merge_hll_registers

    rows = [(i, f"g{i % 3}", f"v{i % 37}") for i in range(120)]
    df = spark.createDataFrame(rows, "id long, g string, v string")

    def regs(frame):
        return hll_registers(frame, ["g"], "v")

    def rowset(frame):
        return sorted((r["g"], r["idx"], r["m_reg"]) for r in frame.collect())

    whole = rowset(regs(df))
    a = regs(df.where(F.col("id") % 3 == 0))
    b = regs(df.where(F.col("id") % 3 == 1))
    c = regs(df.where(F.col("id") % 3 == 2))
    left = merge_hll_registers(merge_hll_registers(a, b, ["g"]), c, ["g"])
    right = merge_hll_registers(a, merge_hll_registers(b, c, ["g"]), ["g"])
    assert rowset(left) == whole
    assert rowset(right) == whole
    # a different (overlapping) split folds to the same registers too
    d = regs(df.where(F.col("id") < 80))
    e = regs(df.where(F.col("id") >= 40))
    assert rowset(merge_hll_registers(d, e, ["g"])) == whole


def test_heavy_hitters_exact_threshold_semantics(spark):
    """The exact twin returns precisely the tokens with count·(k+1) > N
    — checked against a pure-Python count on a corpus with a value
    sitting exactly AT the threshold (must be excluded: strict >)."""
    from sparketl.operators.corpus import heavy_hitters_exact

    # N = 40 tokens, k = 3 → threshold N/(k+1) = 10: a token with
    # exactly 10 occurrences is NOT a heavy hitter (10*4 = 40 = N)
    texts = (["at " * 10] * 1) + (["hh " * 12] * 1) + [f"u{i}" for i in range(18)]
    df = spark.createDataFrame(
        [(i, t.strip()) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {(r["token"], r["n_occurrences"])
           for r in heavy_hitters_exact(df, k=3).collect()}
    # pure-Python oracle
    from collections import Counter

    toks = [w for t in texts for w in t.strip().split(" ")]
    cnt = Counter(toks)
    n = len(toks)
    want = {(w, c) for w, c in cnt.items() if c * 4 > n}
    assert got == want
    assert ("at", 10) not in got  # exactly at threshold -> excluded
    assert ("hh", 12) in got
