"""Semantics tests for sparketl.operators.textmine (trigram LM,
overlap chunking, bag dedup, shingle containment) and the reshape /
regex / chi-square extras in analytics."""

from pyspark.sql import functions as F

from sparketl.operators.analytics import chisq_cells, props_number_counts
from sparketl.operators.textmine import (
    bag_dedup,
    chunk_with_overlap,
    shingle_containment_topk,
    trigram_lm,
)
from tests.conftest import SF_SMOKE


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_trigram_lm_conditional_probs(spark):
    # "a b c" ×2 and "a b d" ×1 → P(c|a b)=2/3, P(d|a b)=1/3.
    d = _docs(spark, ["a b c", "a b c", "a b d"])
    got = {
        (r["w1"], r["w2"], r["w3"]): (r["n3"], r["n2"], r["p"])
        for r in trigram_lm(d, min_count=1).collect()
    }
    assert got == {
        ("a", "b", "c"): (2, 3, 2 / 3),
        ("a", "b", "d"): (1, 3, 1 / 3),
    }


def test_trigram_min_count_filters_after_denominator(spark):
    d = _docs(spark, ["a b c", "a b c", "a b d"])
    rows = trigram_lm(d, min_count=2).collect()
    # d-trigram dropped, but the surviving probability still uses the
    # full denominator 3.
    assert [(r["w3"], r["n2"], r["p"]) for r in rows] == [("c", 3, 2 / 3)]


def test_chunk_overlap_boundaries(spark):
    # 10 tokens, chunk 4, stride 3 → starts 0,3,6,9; last chunk short.
    d = _docs(spark, [" ".join(f"t{i}" for i in range(10))])
    rows = chunk_with_overlap(d, chunk=4, stride=3).collect()
    assert [(r["chunk_idx"], r["start_tok"], r["n_tokens"]) for r in rows] == [
        (0, 0, 4),
        (1, 3, 4),
        (2, 6, 4),
        (3, 9, 1),
    ]
    assert rows[1]["chunk_text"] == "t3 t4 t5 t6"
    # overlap: chunk 0 ends at t3, chunk 1 starts at t3.
    assert rows[0]["chunk_text"].split(" ")[-1] == rows[1]["chunk_text"].split(" ")[0]


def test_bag_dedup_groups_word_shuffles(spark):
    d = _docs(spark, ["x y z", "z y x", "x y y"])
    rows = bag_dedup(d).collect()
    assert [(r["keep_doc_id"], r["n_members"]) for r in rows] == [(0, 2), (2, 1)]


def test_containment_detects_doc_in_doc(spark):
    # doc 1 is a contiguous slice of doc 0: containment(1→0) = 1.0,
    # while containment(0→1) < 1.
    big = "a b c d e f g h"
    small = "c d e f"
    d = _docs(spark, [big, small])
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_shared"], r["n_sh_a"], r["containment"])
        for r in shingle_containment_topk(d, n=3, k=10).collect()
    }
    assert got[(1, 0)] == (2, 2, 1.0)
    assert got[(0, 1)] == (2, 6, 2 / 6)


def test_props_numbers_counts_all_matches(spark):
    e = spark.createDataFrame(
        [(1, '{"a": 12, "b": "x12"}'), (2, '{"a": 7}')],
        "event_id long, props string",
    )
    got = {r["num"]: r["n"] for r in props_number_counts(e).collect()}
    assert got == {"12": 2, "7": 1}


def test_chisq_uniform_table_has_zero_contrib(spark):
    # 2 types × 2 buckets, perfectly balanced → expected == observed.
    day_us = 86_400_000_000
    rows = []
    eid = 0
    for ty in ("a", "b"):
        for day in (0, 1):
            for _ in range(5):
                rows.append((eid, ty, day * day_us))
                eid += 1
    e = spark.createDataFrame(
        rows, "event_id long, event_type string, ts_us long"
    ).select("event_id", "event_type", F.timestamp_micros("ts_us").alias("ts"))
    out = chisq_cells(e).collect()
    assert len(out) == 4
    assert all(r["expected"] == 5.0 and r["contrib"] == 0.0 for r in out)


def test_lm_score_hand_corpus(spark):
    from sparketl.operators.textmine import lm_doc_score

    # Two docs sharing the trigram "a b c"; doc 2 also has "b c d".
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in lm_doc_score(docs).collect()}
    # trigrams: doc1: (a,b,c); doc2: (a,b,c), (b,c,d)
    # counts: (a,b,c)->2 with n2[(a,b)]=2 → p=1; (b,c,d)->1, n2[(b,c)]=1 → p=1
    assert rows[1]["n_trigrams"] == 1 and rows[1]["score_nano"] == 1_000_000_000
    assert rows[2]["n_trigrams"] == 2 and rows[2]["score_nano"] == 2_000_000_000
    assert abs(rows[2]["mean_p"] - 1.0) < 1e-12


def test_lm_score_prefers_repeated_patterns(spark):
    from sparketl.operators.textmine import lm_doc_score

    # "x y z" appears twice after (x,y); "x y q" once → p(z|x,y)=2/3.
    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "x y z"), (3, "x y q")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in lm_doc_score(docs).collect()}
    assert rows[1]["score_nano"] == rows[2]["score_nano"] == 666_666_666
    assert rows[3]["score_nano"] == 333_333_333


def test_prefix_jaccard_equals_bruteforce(spark):
    from sparketl.io import load_table
    from sparketl.operators.dedup import ngram_jaccard_pairs
    from sparketl.operators.textmine import prefix_jaccard_join

    docs = load_table(spark, SF_SMOKE, "documents")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in prefix_jaccard_join(docs, threshold=0.8).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    assert set(got) == set(want) and len(got) > 0
    for k in got:
        assert abs(got[k] - want[k]) < 1e-12


def test_lexical_diversity_recompute(spark):
    import math

    from sparketl.operators.textmine import lexical_diversity

    docs = spark.createDataFrame(
        [
            (1, "a", "x x x y"),          # tokens 4, types 2, hapax 1 (y)
            (2, "a", "x z"),              # + z hapax → tokens 6, types 3
            (3, "b", "p q r s"),          # all hapax
        ],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in lexical_diversity(docs).collect()}
    a = out["a"]
    assert (a["n_tokens"], a["n_types"], a["n_hapax"]) == (6, 3, 2)
    assert a["ttr_milli"] == (1000 * 3) // 6
    assert a["hapax_milli"] == (1000 * 2) // 3
    # entropy: counts {x:4, y:1, z:1}, H = Σ c*floor(1e6*ln(6/c)) // 6
    h = sum(
        c * math.floor(1_000_000 * math.log(6 / c)) for c in (4, 1, 1)
    ) // 6
    assert a["entropy_micro"] == h
    b = out["b"]
    # uniform distribution: entropy = ln(4) micro-nats, max for 4 types
    assert b["hapax_milli"] == 1000
    assert b["entropy_micro"] == (4 * math.floor(1_000_000 * math.log(4))) // 4
