"""Semantic tests for the corpus operators (tfidf / gopher / rolling /
decontamination) on hand-built frames with known answers."""

from pyspark.sql import functions as F

from sparketl.operators.corpus import (
    decontaminate_overlap,
    gopher_flags,
    rolling_window,
    tfidf_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_tfidf_rare_term_outranks_common(spark):
    d = _docs(
        spark,
        [
            "common common rare",
            "common other words",
            "common filler text",
        ],
    )
    top = {
        r["doc_id"]: r["token"]
        for r in tfidf_topk(d, k=1).collect()
    }
    # 'common' appears in every doc (df=3) → idf-weight 1; doc 0's top
    # term must be the unique 'rare' (tf=1, df=1 → score 3)
    assert top[0] == "rare"


def test_tfidf_score_is_rational(spark):
    d = _docs(spark, ["a a b", "b c d"])
    rows = {(r["doc_id"], r["token"]): r for r in tfidf_topk(d, k=3).collect()}
    r = rows[(0, "a")]
    assert (r["tf"], r["df"]) == (2, 1)
    assert r["score"] == 2 * 2 / 1  # tf * N / df


def test_gopher_flags_boundaries(spark):
    d = _docs(
        spark,
        [
            "tiny doc",  # n_tokens=2 → fails length gate
            "the " * 9 + "the",  # 10 tokens, all stopwords, mean_wl 3.0
        ],
    )
    flags = {r["doc_id"]: r for r in gopher_flags(d).collect()}
    assert not flags[0]["flag_len"]
    f1 = flags[1]
    assert f1["flag_len"] and f1["flag_word_len"] and f1["flag_stopwords"]
    assert f1["passes"]


def test_rolling_window_counts(spark):
    day = 86400 * 1_000_000
    rows = [
        (1, 10, 0 * day, 1.0),
        (2, 10, 3 * day, 1.0),
        (3, 10, 9 * day, 1.0),  # 9d after e1: outside 7d of e1, inside of e2
        (4, 20, 0 * day, 1.0),
    ]
    e = spark.createDataFrame(rows, "event_id long, user_id long, us long, value double")
    e = e.select("event_id", "user_id", F.timestamp_micros("us").alias("ts"), "value")
    out = {r["event_id"]: r["roll_n"] for r in rolling_window(e, days=7).collect()}
    assert out == {1: 1, 2: 2, 3: 2, 4: 1}


def test_decontaminate_planted_overlap(spark):
    train = _docs(spark, ["alpha beta gamma delta epsilon", "unrelated words here now"])
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta zeta", "en", "eval", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # train doc 0 shares 3-grams: 'alpha beta gamma', 'beta gamma delta'
    out = decontaminate_overlap(train, ev, n=3, min_shared=2).collect()
    assert [(r["train_doc_id"], r["eval_doc_id"], r["n_shared"]) for r in out] == [
        (0, 100, 2)
    ]
    assert decontaminate_overlap(train, ev, n=3, min_shared=3).count() == 0


def test_repetition_stats(spark):
    from sparketl.operators.corpus import repetition_stats

    d = _docs(
        spark,
        [
            "a b a b a b",  # 5 bigrams, 2 distinct → dup_frac 0.6
            "w x y z q",    # 4 bigrams, all distinct → dup_frac 0.0
            "solo",         # <2 tokens → dropped
        ],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(d).collect()}
    assert set(rows) == {0, 1}
    assert (rows[0]["n_2grams"], rows[0]["n_distinct"]) == (5, 2)
    assert abs(rows[0]["dup_frac"] - 0.6) < 1e-12
    assert rows[1]["dup_frac"] == 0.0 and rows[1]["flag_repetition"]


def test_pii_scrub_planted(spark):
    from sparketl.operators.corpus import pii_scrub

    d = _docs(
        spark,
        [
            "contact me at jo.doe@example.com or 555-123-4567 thanks",
            "ssn is 123-45-6789 ok",
            "nothing sensitive here",
        ],
    )
    rows = {r["doc_id"]: r for r in pii_scrub(d).collect()}
    assert (rows[0]["n_emails"], rows[0]["n_phones"], rows[0]["n_ssns"]) == (1, 1, 0)
    assert (rows[1]["n_ssns"], rows[1]["n_phones"]) == (1, 0)  # SSN not double-counted as phone
    assert rows[0]["has_pii"] and rows[1]["has_pii"] and not rows[2]["has_pii"]
    assert rows[2]["redacted_len"] == len("nothing sensitive here")


def test_passage_dedup_shared_block(spark):
    from sparketl.operators.corpus import passage_dedup

    d = _docs(
        spark,
        [
            "a b c d e f",  # passages (block=3): "a b c", "d e f"
            "a b c x y z",  # "a b c" duplicates doc0's first passage
            "a b c",        # duplicate again
        ],
    )
    rows = {r["doc_id"]: r for r in passage_dedup(d, block=3).collect()}
    assert (rows[0]["n_passages"], rows[0]["n_dup_removed"], rows[0]["kept_tokens"]) == (2, 0, 6)
    assert (rows[1]["n_passages"], rows[1]["n_dup_removed"], rows[1]["kept_tokens"]) == (2, 1, 3)
    assert (rows[2]["n_passages"], rows[2]["n_dup_removed"], rows[2]["kept_tokens"]) == (1, 1, 0)


def test_pack_positions_and_chunk_stats(spark):
    from sparketl.operators.corpus import chunk_stats, pack_positions

    d = _docs(spark, ["a b c", "d e f g", "h i j k l"])  # 3, 4, 5 tokens
    # bucket=2 forces the two-phase path (2 buckets, nontrivial offsets)
    pos = {r["doc_id"]: r for r in pack_positions(d, chunk=4, bucket=2).collect()}
    assert (pos[0]["start_off"], pos[0]["first_chunk"], pos[0]["n_chunks"]) == (0, 0, 1)
    assert (pos[1]["start_off"], pos[1]["first_chunk"], pos[1]["n_chunks"]) == (3, 0, 2)
    assert (pos[2]["start_off"], pos[2]["first_chunk"], pos[2]["n_chunks"]) == (7, 1, 2)
    ch = {r["chunk_id"]: r for r in chunk_stats(d, chunk=4, bucket=2).collect()}
    assert (ch[0]["n_docs"], ch[0]["n_boundary_docs"], ch[0]["n_tokens_filled"]) == (2, 0, 4)
    assert (ch[1]["n_docs"], ch[1]["n_boundary_docs"], ch[1]["n_tokens_filled"]) == (2, 1, 4)
    assert (ch[2]["n_docs"], ch[2]["n_boundary_docs"], ch[2]["n_tokens_filled"]) == (1, 1, 4)
    # every token lands in exactly one chunk
    assert sum(r["n_tokens_filled"] for r in ch.values()) == 12


def test_pack_positions_bucket_invariance(spark):
    """The two-phase prefix sum must be bit-identical for ANY bucket
    size (integer sums are associative): a tiny bucket, a large bucket,
    and the adaptive √n default all agree row-for-row on the fixture.
    Guards the adaptive-bucket change (the per-bucket-totals frame used
    to grow as n/64 in one partition; now both phases are O(√n))."""
    from sparketl.io import load_table
    from sparketl.operators.corpus import pack_positions

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    ref = [
        tuple(r)
        for r in pack_positions(d, chunk=512, bucket=64).orderBy("doc_id").collect()
    ]
    assert len(ref) > 0
    for b in (7, 1000, None):  # tiny, coarse, adaptive √n
        got = [
            tuple(r)
            for r in pack_positions(d, chunk=512, bucket=b).orderBy("doc_id").collect()
        ]
        assert got == ref, f"bucket={b} diverged"


def test_heavy_hitters_guarantee(spark):
    from sparketl.operators.corpus import heavy_hitters_exact, heavy_hitters_mg

    # 30 copies of "hh" + 20 singleton tokens: N=50, k=3 → any token with
    # true freq > N/(k+1)=12.5 must survive the per-partition MG merge.
    texts = ["hh " * 10] * 3 + [f"u{i}" for i in range(20)]
    d = _docs(spark, [t.strip() for t in texts]).repartition(6)
    out = {r["token"]: r["est_count"] for r in heavy_hitters_mg(d, k=3).collect()}
    assert "hh" in out
    assert 0 < out["hh"] <= 30  # MG estimates never overestimate

    # the exact twin (the r10 oracle-checked registry form) returns
    # precisely the > N/(k+1) set, and the MG candidates cover it
    exact = {r["token"]: r["n_occurrences"]
             for r in heavy_hitters_exact(d, k=3).collect()}
    assert exact == {"hh": 30}  # 30*4 > 50; singletons 1*4 < 50
    assert set(exact) <= set(out)  # MG candidates ⊇ exact heavy hitters


def test_quantize_embeddings_known_and_bounded(spark):
    from sparketl.operators.similarity import quantize_embeddings

    emb = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.0], 0), (2, [0.0, 0.0, 0.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(emb).collect()}
    assert rows[1]["q_csv"] == "127,-63,0"
    assert abs(rows[1]["scale"] - 1.0 / 127) < 1e-12
    assert rows[1]["max_err"] <= rows[1]["scale"] / 2 + 1e-12
    assert rows[2]["scale"] == 1.0 and rows[2]["q_csv"] == "0,0,0" and rows[2]["max_err"] == 0.0


def test_mix_sources_rates_and_determinism(spark):
    from sparketl.operators.corpus import mix_sources

    d = spark.createDataFrame(
        [(i, "t", "en", f"src{i % 4}", 1) for i in range(400)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    a = {r["source"]: r for r in mix_sources(d).collect()}
    b = {r["source"]: r for r in mix_sources(d).collect()}
    assert a.keys() == b.keys() == {"src0", "src1", "src2", "src3"}
    for s in a:
        assert (a[s]["n_kept"], a[s]["rate"]) == (b[s]["n_kept"], b[s]["rate"])
    assert a["src0"]["rate"] == 1.0 and a["src0"]["n_kept"] == a["src0"]["n_in"]
    assert a["src3"]["rate"] == 0.1 and a["src3"]["n_kept"] < a["src3"]["n_in"]


def test_bigram_collocations_known_pair(spark):
    from sparketl.operators.corpus import bigram_collocations

    # "new york" always adjacent (5×); "data" and "base" frequent but
    # never adjacent to each other more than chance.
    texts = ["new york data base"] * 5 + ["data x base y"] * 5
    d = _docs(spark, texts)
    out = bigram_collocations(d, min_count=5, k=5).collect()
    assert out, "no collocations returned"
    top = out[0]
    assert (top["w1"], top["w2"]) == ("new", "york")
    assert top["c_ab"] == 5 and top["c_a"] == 5 and top["c_b"] == 5
    # score = c_ab * N / (c_a * c_b) with N = 40 tokens
    assert top["score"] == 5 * 40 / 25


def test_pack_bins_greedy_invariants(spark):
    from pyspark.sql import functions as F

    from sparketl.operators.corpus import pack_bins_greedy

    # tokens: 3, 4, 5, 6, 20(oversized), 2 → budget 10, bucket 100 (one block)
    texts = ["w " * n for n in (3, 4, 5, 6, 20, 2)]
    d = _docs(spark, [t.strip() for t in texts])
    out = pack_bins_greedy(d, budget=10, bucket=100).orderBy("doc_id").collect()
    # greedy next-fit: 3+4 fit; 5 opens bin1; 6 overflows (5+6>10) →
    # bin2; 20 oversized singleton bin3; 2 can't join (20+2>10) → bin4
    assert [r["bin_id"] for r in out] == [0, 0, 1, 2, 3, 4]
    # every doc appears exactly once
    assert [r["doc_id"] for r in out] == [0, 1, 2, 3, 4, 5]
    # no bin over budget except the oversized singleton
    fills = {}
    for r in out:
        fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["n_tokens"]
    for b, f in fills.items():
        assert f <= 10 or (f == 20 and b == 3)
    # determinism under different input partitioning
    again = (
        pack_bins_greedy(d.repartition(5), budget=10, bucket=100)
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


def test_bm25_hand_computed(spark):
    """Tiny corpus where the full bigint BM25 device is hand-checkable:
    ranking must put the doc with the rarer term first, and every score
    must equal the integer formula evaluated in Python."""
    import math

    from sparketl.operators.corpus import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "hash hash hash join join"),   # tf(hash)=3, dl=5
            (2, "hash join join join join"),   # tf(hash)=1, dl=5
            (3, "merge join join"),            # tf(merge)=1, dl=3
            (4, "join join join join join"),   # no query term
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, terms=("hash", "merge"), k=10).collect()
    T, N = 18, 4

    def s(tf, dl, df):
        idf = math.floor(1e6 * math.log((2 * N + 2) / (2 * df + 1)))
        return (idf * 44 * tf * T) // (20 * T * tf + 6 * T + 18 * dl * N)

    want = {
        1: s(3, 5, 2),          # hash only
        2: s(1, 5, 2),
        3: s(1, 3, 1),          # merge only — df=1, rarer
    }
    got = {r["doc_id"]: r["score_micro"] for r in out}
    assert got == want
    # doc 4 (no query terms) filtered out; doc 3's rare term wins
    assert [r["doc_id"] for r in out] == sorted(
        want, key=lambda d: (-want[d], d)
    )
    assert out[0]["doc_id"] == 3


def test_bm25_rejects_non_identifier_terms(spark):
    """r12 (advisor): terms flow into generated SQL on both engines —
    anything outside ^[A-Za-z0-9_]+$ must raise, not break the
    expression. Mixed/upper case is identifier-safe and allowed (r13,
    advisor follow-up): the tf test is case-sensitive, so an uppercase
    term scores real uppercase tokens — but two terms colliding
    case-insensitively would generate ambiguous column names under
    Spark's default resolver and must raise."""
    import pytest

    from sparketl.operators.corpus import bm25_topk

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    for bad in ("it's", "two words", "semi;colon", 'quo"te', "da-sh", ""):
        with pytest.raises(ValueError, match="identifier-safe"):
            bm25_topk(docs, terms=(bad,))
    with pytest.raises(ValueError, match="case-insensitively"):
        bm25_topk(docs, terms=("Hash", "hash"))
    cased = spark.createDataFrame(
        [(1, "Hash Hash b c"), (2, "hash b c d")], "doc_id long, text string"
    )
    out = bm25_topk(cased, terms=("Hash",), k=5).collect()
    assert [r["doc_id"] for r in out] == [1]  # only the uppercase doc scores


def test_ctfidf_discriminative_terms_rank_first(spark):
    """A term exclusive to one class must outrank the shared filler in
    that class; the exact ppm score follows the integer formula."""
    from sparketl.operators.corpus import ctfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "s1", "alpha alpha common common"),
            (2, "s1", "alpha common"),
            (3, "s2", "beta common common common"),
            (4, "s2", "common beta"),
        ],
        "doc_id long, source string, text string",
    )
    out = ctfidf_top_terms(docs, k=2).collect()
    top = {r["source"]: r for r in out if r["rank"] == 1}
    assert top["s1"]["token"] == "alpha"
    assert top["s2"]["token"] == "beta"
    # s1: tf(alpha)=3, class_tokens=6, df=1, n_classes=2
    assert top["s1"]["score_ppm"] == (1_000_000 * 3 * 2) // (6 * 1)
    # s2: tf(beta)=2, class_tokens=6, df=1
    assert top["s2"]["score_ppm"] == (1_000_000 * 2 * 2) // (6 * 1)
