"""Tests for the round-5 end-to-end curation operators
(sparketl.operators.curation): dedup pipeline accounting, SemDeDup
bucket semantics, cleaned-corpus reconstruction, and BPE encoding
against a pure-Python reference."""

import pytest
from pyspark.sql import functions as F

from sparketl.io import load_table
from tests.conftest import SF_SMOKE

SF_SMALL = "/root/testdata/sf0.01"


# ------------------------------------------------------ ext_70 pipeline


def test_dedup_pipeline_accounting_consistent(spark):
    """Per-source removed + kept == docs, and the removed total equals
    the non-canonical members of the prefix-Jaccard cluster graph."""
    from sparketl.operators.curation import dedup_pipeline_report
    from sparketl.operators.dedup import dup_clusters
    from sparketl.operators.textmine import prefix_jaccard_join

    docs = load_table(spark, SF_SMALL, "documents")
    rep = dedup_pipeline_report(docs).collect()
    assert rep, "report is empty"
    for r in rep:
        assert r["n_removed"] + r["n_kept"] == r["n_docs"]

    pairs = prefix_jaccard_join(docs, threshold=0.8).select("doc_a", "doc_b")
    labels = dup_clusters(pairs)
    want_removed = labels.filter("doc_id != cluster_id").count()
    assert sum(r["n_removed"] for r in rep) == want_removed
    assert sum(r["n_docs"] for r in rep) == docs.count()


def test_dedup_pipeline_removes_planted_duplicate(spark):
    """An exact copy of an existing doc (new id, same text) is removed;
    the original (smaller id) survives."""
    from sparketl.operators.curation import dedup_pipeline_report

    docs = load_table(spark, SF_SMOKE, "documents")
    victim = docs.orderBy("doc_id").limit(1)
    clone = victim.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        "lang",
        F.lit("planted").alias("source"),
        "n_chars",
    )
    base = dedup_pipeline_report(docs).collect()
    got = dedup_pipeline_report(docs.unionByName(clone)).collect()
    planted = [r for r in got if r["source"] == "planted"]
    assert planted and planted[0]["n_removed"] == 1 and planted[0]["n_kept"] == 0
    # original sources' kept counts are unchanged by the planted clone
    assert {r["source"]: r["n_kept"] for r in base} == {
        r["source"]: r["n_kept"] for r in got if r["source"] != "planted"
    }


# ------------------------------------------------------ ext_71 semdedup


def test_semdedup_removes_planted_twin_keeps_rest_deterministic(spark):
    """A near-identical copy (same direction, scaled) of vec 0 lands in
    vec 0's bucket with cosine 1 and is dropped; two identical runs
    produce identical rows."""
    from sparketl.operators.curation import semdedup

    emb = load_table(spark, SF_SMALL, "embeddings")
    twin = emb.orderBy("vec_id").limit(1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr("transform(embedding, x -> x * CAST(1.5 AS FLOAT))").alias(
            "embedding"
        ),
        "label",
    )
    out = semdedup(emb.unionByName(twin))
    rows = {r["vec_id"]: r for r in out.collect()}
    assert rows[1_000_000]["kept"] == 0, "scaled twin must be removed"
    assert rows[min(rows)]["kept"] == 1, "smaller-id original survives"
    twin_bucket = rows[1_000_000]["bucket"]
    orig = emb.orderBy("vec_id").first()["vec_id"]
    assert rows[orig]["bucket"] == twin_bucket, "same direction → same bucket"

    again = {r["vec_id"]: r for r in semdedup(emb.unionByName(twin)).collect()}
    assert rows.keys() == again.keys()
    assert all(
        rows[k]["bucket"] == again[k]["bucket"] and rows[k]["kept"] == again[k]["kept"]
        for k in rows
    )


def test_semdedup_kept_flag_matches_pairwise_definition(spark):
    """kept == 0 iff some smaller-id bucket-mate has cosine ≥ 0.95 —
    recomputed brute-force in numpy over the fixture."""
    import numpy as np

    from sparketl.operators.curation import sem_plane_weights, semdedup

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    planes = np.asarray(sem_plane_weights(), dtype=np.float64)

    def bucket(v):
        return int(sum((1 << i) for i, d in enumerate(planes @ v) if d > 0))

    buckets = {k: bucket(v) for k, v in vecs.items()}
    removed = set()
    ids = sorted(vecs)
    for j, b_id in enumerate(ids):
        for a_id in ids[:j]:
            if buckets[a_id] != buckets[b_id]:
                continue
            a, b = vecs[a_id], vecs[b_id]
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            if cos >= 0.95:
                removed.add(b_id)
                break
    got = {r["vec_id"]: (r["bucket"], r["kept"]) for r in semdedup(emb).collect()}
    assert {k for k, (_, kept) in got.items() if kept == 0} == removed
    assert all(got[k][0] == buckets[k] for k in vecs)


# ------------------------------------------------- ext_72 clean corpus


def test_clean_corpus_reconstruction_invariants(spark):
    """Surviving passage count equals the number of DISTINCT passages
    corpus-wide; a doc with all-unique passages round-trips its text
    exactly; clean_chars == length(clean_text)."""
    from sparketl.operators.corpus import passage_marked
    from sparketl.operators.curation import clean_corpus

    docs = load_table(spark, SF_SMOKE, "documents")
    out = clean_corpus(docs).collect()
    marked = passage_marked(docs)
    n_distinct = marked.select("passage").distinct().count()
    assert sum(r["n_kept_passages"] for r in out) == n_distinct
    for r in out:
        assert r["clean_chars"] == len(r["clean_text"])
        assert r["n_kept_passages"] <= r["n_passages"]

    # a doc whose every passage is globally unique must round-trip
    uniq = (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_first").cast("long")).alias("k"),
        )
        .filter("n = k")
        .orderBy("doc_id")
        .first()
    )
    assert uniq is not None, "fixture should contain an all-unique doc"
    original = docs.filter(F.col("doc_id") == uniq["doc_id"]).first()["text"]
    rebuilt = next(r for r in out if r["doc_id"] == uniq["doc_id"])["clean_text"]
    assert rebuilt == original


def test_clean_corpus_drops_planted_duplicate_text(spark):
    """A doc that exactly duplicates an earlier doc's text is emptied
    (every passage already occurred)."""
    from sparketl.operators.curation import clean_corpus

    docs = load_table(spark, SF_SMOKE, "documents")
    victim = docs.orderBy("doc_id").limit(1)
    clone = victim.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    out = clean_corpus(docs.unionByName(clone))
    got = out.filter(F.col("doc_id") == 1_000_000).first()
    assert got["n_kept_passages"] == 0 and got["clean_text"] == ""


# ---------------------------------------------------- ext_74 bpe encode


def _py_bpe_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_matches_python_reference(spark):
    """Per-source BPE token totals equal a pure-Python encode of every
    word with the same trained merges."""
    from sparketl.operators.curation import bpe_encode_report
    from sparketl.operators.pipeline_ops import bpe_train_merges

    docs = load_table(spark, SF_SMOKE, "documents")
    merges = [
        (r["left"], r["right"])
        for r in bpe_train_merges(docs, n_merges=8).orderBy("step").collect()
    ]
    assert merges, "training produced no merges"

    want: dict[str, list[int]] = {}
    for r in docs.select("source", "text").collect():
        acc = want.setdefault(r["source"], [0, 0, 0])
        for w in r["text"].split(" "):
            if not w:
                continue
            acc[0] += 1
            acc[1] += len(w)
            acc[2] += len(_py_bpe_encode(w, merges))

    got = bpe_encode_report(docs, n_merges=8).collect()
    assert {
        r["source"]: [r["n_words"], r["n_chars"], r["n_bpe_tokens"]] for r in got
    } == want
    for r in got:
        assert r["n_bpe_tokens"] <= r["n_chars"], "encoding can't exceed chars"
        assert r["chars_per_token"] == pytest.approx(
            r["n_chars"] / r["n_bpe_tokens"], abs=1e-4
        )


# ------------------------------------------- ext_75 substring coverage


def test_substring_dup_coverage_planted_span(spark):
    """Planting doc A's first 10 tokens inside a new doc marks exactly
    those window positions as duplicated in BOTH docs; an otherwise
    all-unique corpus reports zero coverage for untouched docs."""
    from sparketl.operators.curation import substring_dup_coverage

    docs = load_table(spark, SF_SMOKE, "documents")
    base = substring_dup_coverage(docs)
    victim = docs.orderBy("doc_id").first()
    span = " ".join(victim["text"].split(" ")[:10])
    planted = spark.createDataFrame(
        [(2_000_000, "zzz0 " + span + " zzz1", "en", "planted", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: r
        for r in substring_dup_coverage(docs.unionByName(planted)).collect()
    }
    # the planted doc: exactly the 10-token span is covered (12 tokens,
    # windows at pos 0..2; only pos 1 == the span duplicates)
    assert got[2_000_000]["n_tokens"] == 12
    assert got[2_000_000]["n_dup_tokens"] == 10
    # the victim gains ≥10 covered tokens relative to the base run
    base_victim = {r["doc_id"]: r["n_dup_tokens"] for r in base.collect()}
    assert got[victim["doc_id"]]["n_dup_tokens"] >= max(
        10, base_victim[victim["doc_id"]]
    )
    # fraction is consistent with the counts
    for r in got.values():
        assert r["dup_token_frac"] == pytest.approx(
            r["n_dup_tokens"] / r["n_tokens"], abs=1e-6
        )


# -------------------------------------------- ext_77/78 loader planning


def test_shard_plan_partitions_corpus_evenly_and_deterministically(spark):
    """Shards partition the corpus exactly (doc/token/char totals
    preserved), assignment is stable across runs, and the Knuth hash
    spreads sequential ids within 3x of each other."""
    from sparketl.operators.curation import shard_plan

    docs = load_table(spark, SF_SMALL, "documents")
    rep = shard_plan(docs).collect()
    tot = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split("text", " "))).alias("t"),
        F.sum("n_chars").alias("c"),
    ).first()
    assert sum(r["n_docs"] for r in rep) == tot["n"]
    assert sum(r["n_tokens"] for r in rep) == tot["t"]
    assert sum(r["n_chars"] for r in rep) == tot["c"]
    counts = [r["n_docs"] for r in rep]
    assert max(counts) <= 3 * min(counts), counts
    again = shard_plan(docs).collect()
    assert [tuple(r) for r in rep] == [tuple(r) for r in again]


def test_interleave_share_tracks_sqrt_weights(spark):
    """In the first 100 scheduled docs, each source's share matches its
    sqrt(n_docs) weight within +/-2 slots (stride scheduling bound),
    and virtual time is nondecreasing."""
    import math

    from sparketl.operators.curation import interleave_schedule

    docs = load_table(spark, SF_SMALL, "documents")
    sched = interleave_schedule(docs, k=100).collect()
    vtimes = [r["vtime"] for r in sched]
    assert vtimes == sorted(vtimes)
    weights = {
        r["source"]: math.sqrt(r["n"])
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    wsum = sum(weights.values())
    from collections import Counter

    got = Counter(r["source"] for r in sched)
    for src, w in weights.items():
        expect = 100 * w / wsum
        assert abs(got.get(src, 0) - expect) <= 2, (src, got.get(src, 0), expect)


# ------------------------------------------------ ext_79 snapshot diff


def test_snapshot_diff_classes_are_exact(spark):
    """Diff counts recomputed from the split predicates match: removed
    = in-old-only, added = in-new-only, changed = doc_id % 11 == 0
    among the intersection."""
    from sparketl.operators.curation import q_ext_79_snapshot_diff

    docs = load_table(spark, SF_SMALL, "documents")
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    old = {i for i in ids if i % 7 != 0}
    new = {i for i in ids if i % 5 != 0}
    want = {
        "added": len(new - old),
        "removed": len(old - new),
        "changed": len({i for i in old & new if i % 11 == 0}),
        "same": len({i for i in old & new if i % 11 != 0}),
    }
    rep = q_ext_79_snapshot_diff(spark, SF_SMALL).collect()
    got = {
        k: sum(r[f"n_{k}"] for r in rep)
        for k in ("added", "removed", "changed", "same")
    }
    assert got == want


# ------------------------------------------------ ext_80 triplet mining


def test_triplet_mining_matches_numpy_brute_force(spark):
    """Per anchor with >= 2 bucket-mates: pos = argmax cosine, neg =
    argmin cosine within the hyperplane bucket, ties on neighbor id —
    recomputed brute-force in numpy; and pos_cos >= neg_cos always."""
    import numpy as np

    from sparketl.operators.curation import sem_plane_weights, triplet_mining

    emb = load_table(spark, SF_SMOKE, "embeddings")
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    planes = np.asarray(sem_plane_weights(), dtype=np.float64)
    buckets = {
        k: int(sum((1 << i) for i, d in enumerate(planes @ v) if d > 0))
        for k, v in vecs.items()
    }
    want = {}
    for a_id, a in vecs.items():
        mates = [
            (float(a @ vecs[o] / (np.linalg.norm(a) * np.linalg.norm(vecs[o]))), o)
            for o in vecs
            if o != a_id and buckets[o] == buckets[a_id]
        ]
        if len(mates) < 2:
            continue
        pos = max(mates, key=lambda t: (t[0], -t[1]))
        neg = min(mates, key=lambda t: (t[0], t[1]))
        want[a_id] = (pos[1], neg[1])

    got = {
        r["anchor_id"]: (r["pos_id"], r["neg_id"], r["pos_cos"], r["neg_cos"])
        for r in triplet_mining(emb).collect()
    }
    assert {k: (p, n) for k, (p, n, _, _) in got.items()} == want
    assert all(pc >= nc for _, _, pc, nc in got.values())


# --------------------------------------------------- ext_81 knn eval


def test_knn_eval_matches_numpy_reference(spark):
    """Per-label kNN accuracy equals a full numpy leave-one-out
    recompute with identical tie rules."""
    import numpy as np
    from collections import Counter

    from sparketl.operators.curation import knn_label_eval

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = emb.select("vec_id", "embedding", "label").collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    labels = {r["vec_id"]: r["label"] for r in rows}
    norms = {k: np.linalg.norm(v) for k, v in vecs.items()}

    want = {}
    for qid in sorted(vecs):
        if qid >= 64:
            continue
        sims = sorted(
            (
                (-float(vecs[qid] @ vecs[o] / (norms[qid] * norms[o])), o)
                for o in vecs
                if o != qid
            ),
        )[:5]
        votes = Counter(labels[o] for _, o in sims)
        pred = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        tl = labels[qid]
        n, c = want.get(tl, (0, 0))
        want[tl] = (n + 1, c + (1 if pred == tl else 0))

    got = {
        r["true_label"]: (r["n_queries"], r["n_correct"])
        for r in knn_label_eval(emb).collect()
    }
    assert got == want


# ---------------------------------------- ext_82 LSH dedup pipeline


def test_lsh_dedup_pipeline_matches_exact_on_fixture(spark):
    """On the fixture (+ a planted exact clone, which collides in every
    LSH band), the LSH-candidate pipeline removes exactly what the
    exact prefix-filter pipeline removes."""
    from sparketl.operators.curation import (
        dedup_pipeline_report,
        lsh_dedup_pipeline_report,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    clone = docs.orderBy("doc_id").limit(1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        "lang",
        F.lit("planted").alias("source"),
        "n_chars",
    )
    corpus = docs.unionByName(clone)
    exact = {tuple(r) for r in dedup_pipeline_report(corpus).collect()}
    lsh = {tuple(r) for r in lsh_dedup_pipeline_report(corpus).collect()}
    assert lsh == exact
    assert any(r[0] == "planted" and r[2] == 1 for r in lsh)  # clone removed


# ------------------------------------------------------ ext_83 skyline


def test_skyline_matches_brute_force_dominance(spark):
    """The per-day prefix-min skyline equals O(n^2) dominance checking
    on the smoke fixture: keep a row iff no other row is >= as recent,
    <= as expensive, and strictly better in one."""
    from sparketl.operators.curation import skyline_orders

    orders = load_table(spark, SF_SMOKE, "orders")
    pts = [
        (r["o_orderkey"], r["order_day"], r["price"])
        for r in orders.selectExpr(
            "o_orderkey",
            "CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) / 86400000000 AS LONG)"
            " AS order_day",
            "o_totalprice AS price",
        ).collect()
    ]
    want = {
        k
        for k, d, p in pts
        if not any(
            d2 >= d and p2 <= p and (d2 > d or p2 < p) for _, d2, p2 in pts
        )
    }
    got = {r["o_orderkey"] for r in skyline_orders(orders).collect()}
    assert got == want and len(got) > 0


# ------------------------------------------------- ext_84 copurchase


def test_copurchase_counts_and_lift_match_python(spark):
    """Pair counts and lift recomputed in pure Python over the smoke
    fixture's baskets match the top-k output exactly."""
    from collections import Counter
    from itertools import combinations

    from sparketl.operators.curation import copurchase_pairs

    li = load_table(spark, SF_SMOKE, "lineitem")
    baskets = {}
    for r in li.select("l_orderkey", "l_partkey").distinct().collect():
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    n_orders = len(baskets)
    pair_counts = Counter()
    part_counts = Counter()
    for parts in baskets.values():
        for p in parts:
            part_counts[p] += 1
        for x, y in combinations(sorted(parts), 2):
            pair_counts[(x, y)] += 1
    want = sorted(
        (
            (
                -c,
                -(c * n_orders) / (part_counts[x] * part_counts[y]),
                x,
                y,
            )
            for (x, y), c in pair_counts.items()
            if c >= 2
        ),
    )[:100]

    got = copurchase_pairs(li).collect()
    assert [(r["part_a"], r["part_b"], r["n_ab"]) for r in got] == [
        (x, y, -nc) for nc, _, x, y in want
    ]
    for r in got:
        exp = (r["n_ab"] * n_orders) / (part_counts[r["part_a"]] * part_counts[r["part_b"]])
        assert r["lift"] == exp


# --------------------------------------- ext_85/86 robust feature ops


def test_decile_binning_partitions_all_rows(spark):
    """Deciles cover every row exactly once and each bin holds ~10% of
    rows (exact percentile edges => bins within 2% of each other on
    continuous data)."""
    from sparketl.operators.curation import decile_binning

    li = load_table(spark, SF_SMOKE, "lineitem")
    out = decile_binning(li).collect()
    n = li.count()
    assert sum(r["n_rows"] for r in out) == n
    assert [r["decile"] for r in out] == list(range(1, 11))
    lo, hi = min(r["n_rows"] for r in out), max(r["n_rows"] for r in out)
    assert hi - lo <= max(4, n // 50), (lo, hi)


def test_mad_outliers_matches_python(spark):
    """Median, MAD, and the outlier count recomputed in pure Python
    (statistics.median == percentile(0.5) on these data) match."""
    import statistics

    from sparketl.operators.curation import mad_outliers

    li = load_table(spark, SF_SMOKE, "lineitem")
    groups = {}
    for r in li.select("l_returnflag", "l_extendedprice").collect():
        groups.setdefault(r["l_returnflag"], []).append(r["l_extendedprice"])
    got = {r["l_returnflag"]: r for r in mad_outliers(li).collect()}
    for flag, xs in groups.items():
        med = statistics.median(xs)
        mad = statistics.median([abs(x - med) for x in xs])
        n_out = sum(1 for x in xs if abs(x - med) > 3.0 * 1.4826 * mad)
        r = got[flag]
        assert r["median_price"] == med
        assert r["mad"] == mad
        assert r["n_outliers"] == n_out


# ----------------------------------------- ext_87 incremental view


def test_incremental_view_equals_full_recompute(spark):
    """Old aggregate + signed delta == direct aggregate of the new
    snapshot, source for source — including a source that exists only
    in one snapshot."""
    from sparketl.operators.curation import (
        _pseudo_snapshots,
        incremental_agg_maintenance,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    old, new = _pseudo_snapshots(docs)
    extra = spark.createDataFrame(
        [(3_000_000, "brand new", "en", "fresh-source", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    inc = {
        r["source"]: (r["n_docs"], r["n_chars"])
        for r in incremental_agg_maintenance(old, new.unionByName(extra)).collect()
    }
    want = {
        r["source"]: (r["n"], r["c"])
        for r in new.unionByName(extra)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("c"))
        .collect()
    }
    assert inc == want and "fresh-source" in inc


# ------------------------------------------------- ext_88 UDTF surface


def test_udtf_chunks_equal_array_expression_path(spark):
    """The Python UDTF's lateral chunk rows equal the codegen
    array-expression block split (ext_72's formulation) row for row."""
    from sparketl.operators.curation import register_chunk_udtf

    register_chunk_udtf(spark)
    docs = load_table(spark, SF_SMOKE, "documents")
    docs.createOrReplaceTempView("_t88")
    udtf_rows = spark.sql(
        "SELECT doc_id, c.chunk_idx, c.n_tokens "
        "FROM _t88, LATERAL chunk_text(text, 20) c"
    ).collect()
    expr_rows = docs.selectExpr(
        "doc_id",
        "posexplode(transform(sequence(0, CAST(ceil(size(split(text,' ')) / 20.0)"
        " AS INT) - 1), i -> size(slice(split(text,' '), i * 20 + 1, 20))))"
        " AS (chunk_idx, n_tokens)",
    ).collect()
    assert sorted(map(tuple, udtf_rows)) == sorted(map(tuple, expr_rows))
    assert len(udtf_rows) > 0


# ------------------------------------------------ ext_89 grouped corr


def test_grouped_corr_matches_numpy(spark):
    """Each per-group correlation equals numpy's corrcoef to 1e-9
    (exact power sums; only the final double expression differs in
    association order from numpy's two-pass formula)."""
    import numpy as np

    from sparketl.operators.curation import grouped_correlations

    li = load_table(spark, SF_SMOKE, "lineitem")
    data = {}
    for r in li.select(
        "l_returnflag", "l_extendedprice", "l_quantity", "l_discount"
    ).collect():
        data.setdefault(r["l_returnflag"], []).append(
            (r["l_extendedprice"], r["l_quantity"], r["l_discount"])
        )
    got = {r["l_returnflag"]: r for r in grouped_correlations(li).collect()}
    for flag, rows in data.items():
        m = np.asarray(rows, dtype=np.float64).T
        c = np.corrcoef(m)
        r = got[flag]
        assert abs(r["corr_price_qty"] - c[0, 1]) < 1e-9
        assert abs(r["corr_price_disc"] - c[0, 2]) < 1e-9
        assert abs(r["corr_qty_disc"] - c[1, 2]) < 1e-9
        assert r["n_rows"] == len(rows)
        for v in (r["corr_price_qty"], r["corr_price_disc"], r["corr_qty_disc"]):
            assert -1.0 <= v <= 1.0


# -------------------------------------------------- ext_90 triangles


def test_triangle_counts_match_python_enumeration(spark):
    """Per-part triangle participation equals brute-force enumeration
    over the same thresholded co-purchase edge set."""
    from collections import Counter
    from itertools import combinations

    from sparketl.operators.curation import copurchase_triangles

    li = load_table(spark, SF_SMOKE, "lineitem")
    baskets = {}
    for r in li.select("l_orderkey", "l_partkey").distinct().collect():
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    pair_counts = Counter()
    for parts in baskets.values():
        for x, y in combinations(sorted(parts), 2):
            pair_counts[(x, y)] += 1
    edges = {p for p, c in pair_counts.items() if c >= 2}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    tri_count = Counter()
    for u, v in edges:
        for w in adj.get(v, set()):
            if (u, w) in edges:
                tri_count[u] += 1
                tri_count[v] += 1
                tri_count[w] += 1
    want = sorted(
        ((-c, p) for p, c in tri_count.items()),
    )[:20]
    got = [
        (-r["n_triangles"], r["part"])
        for r in copurchase_triangles(li).collect()
    ]
    assert got == want


# ------------------------------------------------ ext_91 RRF fusion


def test_rrf_fusion_scores_match_rank_formula(spark):
    """Every fused score equals 1/(60+rq) + 1/(60+rl) with ranks from
    the two bounded top-100 lists; output is rrf-descending and a doc
    in BOTH lists beats one in a single list at equal ranks."""
    from sparketl.operators.curation import rrf_fusion

    docs = load_table(spark, SF_SMALL, "documents")
    out = rrf_fusion(docs).collect()
    assert len(out) == 20
    scores = [r["rrf"] for r in out]
    assert scores == sorted(scores, reverse=True)
    for r in out:
        want = 0.0
        if r["quality_rank"] is not None:
            want += 1.0 / (60.0 + r["quality_rank"])
        if r["length_rank"] is not None:
            want += 1.0 / (60.0 + r["length_rank"])
        assert r["rrf"] == want
        assert r["quality_rank"] is not None or r["length_rank"] is not None


# ------------------------------------------------ ext_92 rolling WAU


def test_rolling_wau_matches_python_window(spark):
    """Each day's count equals the distinct users with >= 1 event in
    the trailing 7 days, recomputed in Python."""
    from sparketl.operators.curation import rolling_wau

    ev = load_table(spark, SF_SMOKE, "events")
    rows = ev.selectExpr(
        "user_id", "unix_micros(ts) div 86400000000 AS day"
    ).collect()
    by_day = {}
    for r in rows:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    days = sorted(by_day)
    want = {}
    for d in range(min(days), max(days) + 1):
        users = set()
        for back in range(7):
            users |= by_day.get(d - back, set())
        if users:
            want[d] = len(users)
    got = {r["report_day"]: r["n_active_users"] for r in rolling_wau(ev).collect()}
    assert got == {d: n for d, n in want.items()}


# ------------------------------------------------ ext_93 n-gram novelty


def test_ngram_novelty_matches_python_reference(spark):
    """Counts and ratio equal a pure-Python first-occurrence scan."""
    from sparketl.operators.curation import ngram_novelty

    docs = load_table(spark, SF_SMOKE, "documents")
    rows = docs.select("doc_id", "text").collect()
    sh = {}
    for r in rows:
        t = r["text"].split(" ")
        if len(t) < 3:
            continue
        sh[r["doc_id"]] = {
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        }
    first = {}
    for d in sorted(sh):
        for g in sh[d]:
            first.setdefault(g, d)
    got = ngram_novelty(docs).collect()
    assert {r["doc_id"] for r in got} == set(sh)
    for r in got:
        grams = sh[r["doc_id"]]
        novel = sum(1 for g in grams if first[g] == r["doc_id"])
        assert r["n_shingles"] == len(grams)
        assert r["n_novel"] == novel
        assert r["novelty"] == novel / len(grams)


# ------------------------------------------------ ext_94 cross-source leak


def test_cross_source_leak_matches_python_reference(spark):
    """Pair counts equal a pure-Python set-intersection recompute."""
    from sparketl.operators.curation import cross_source_leak

    docs = load_table(spark, SF_SMOKE, "documents")
    by_src = {}
    for r in docs.select("source", "text").collect():
        t = r["text"].split(" ")
        if len(t) < 5:
            continue
        by_src.setdefault(r["source"], set()).update(
            " ".join(t[i : i + 5]) for i in range(len(t) - 4)
        )
    want = {}
    names = sorted(by_src)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            shared = len(by_src[a] & by_src[b])
            if shared:
                want[(a, b)] = shared
    got = {
        (r["src_a"], r["src_b"]): r["n_shared_ngrams"]
        for r in cross_source_leak(docs).collect()
    }
    assert got == want


# ------------------------------------------------ ext_95 inter-event gaps


def test_interevent_gaps_matches_numpy_quantiles(spark):
    """Gap quantiles equal numpy's linear-interpolation percentiles
    over a Python recompute of per-user consecutive gaps."""
    import numpy as np

    from sparketl.operators.curation import interevent_gaps

    ev = load_table(spark, SF_SMOKE, "events")
    rows = ev.selectExpr(
        "user_id", "event_type", "event_id", "unix_micros(ts) AS us"
    ).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    gaps = {}
    for stream in by_user.values():
        stream.sort(key=lambda r: (r["us"], r["event_id"]))
        for prev, cur in zip(stream, stream[1:]):
            gaps.setdefault(cur["event_type"], []).append(cur["us"] - prev["us"])
    got = interevent_gaps(ev).collect()
    assert {r["event_type"] for r in got} == set(gaps)
    for r in got:
        xs = gaps[r["event_type"]]
        assert r["n_gaps"] == len(xs)
        for col, q in [("p50_us", 50), ("p90_us", 90), ("p99_us", 99)]:
            assert r[col] == pytest.approx(np.percentile(xs, q), rel=1e-12)


def test_cross_source_leak_hashed_equals_string_keyed(spark):
    """ext_94 shuffles xxhash64(gram) bigints instead of gram strings;
    the pair-count matrix must be identical to the string-keyed
    formulation (no collisions at fixture scale — and the DuckDB
    oracle re-proves it at sf0.01 each round)."""
    from pyspark.sql import functions as F

    from sparketl.operators.curation import cross_source_leak
    from sparketl.operators.dedup import shingles

    docs = load_table(spark, SF_SMOKE, "documents")
    got = {
        (r["src_a"], r["src_b"]): r["n_shared_ngrams"]
        for r in cross_source_leak(docs).collect()
    }
    sg = shingles(docs, n=5, keep=("source",)).select(
        "source", F.explode("sh").alias("g")
    )
    srcs = (
        sg.groupBy("g")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .filter(F.size("ss") >= 2)
    )
    ref_rows = (
        srcs.select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, (x, i) -> "
                    "transform(slice(ss, i + 2, size(ss)), "
                    "y -> struct(x AS src_a, y AS src_b))))"
                )
            ).alias("p")
        )
        .select("p.src_a", "p.src_b")
        .groupBy("src_a", "src_b")
        .count()
        .collect()
    )
    ref = {(r["src_a"], r["src_b"]): r["count"] for r in ref_rows}
    assert got == ref and len(got) > 0


def test_dsir_scores_match_pure_python(spark):
    """DSIR importance ranks ≡ a pure-Python recompute of the hashed
    bigram model (exact integer micro-nat scores), and target-domain
    docs dominate the top of their own ranking."""
    import math

    from sparketl.io import load_table
    from sparketl.operators.curation import dsir_importance_rank

    B = 128
    docs = load_table(spark, SF_SMOKE, "documents")
    rows = docs.select("doc_id", "source", "text").collect()

    def features(text):
        tks = text.split(" ")
        return tks + [f"{a} {b}" for a, b in zip(tks, tks[1:])]

    def bucket(f):
        w = sum(ord(c) * (i + 1) for i, c in enumerate(f))
        return ((w * 2654435761) % 4294967296) % B

    cq = [0] * B
    cp = [0] * B
    per_doc: dict = {}
    for r in rows:
        bs = [bucket(f) for f in features(r.text)]
        per_doc[r.doc_id] = bs
        for b in bs:
            cq[b] += 1
            if r.source == "src0":
                cp[b] += 1
    q_tot, t_tot = sum(cq), sum(cp)
    lr = [
        math.floor(
            math.log(
                float((cp[b] + 1) * (q_tot + B))
                / float((cq[b] + 1) * (t_tot + B))
            )
            * 1e6
        )
        for b in range(B)
    ]
    scores = {d: (len(bs), sum(lr[b] for b in bs)) for d, bs in per_doc.items()}
    expected = sorted(
        ((s, n, d) for d, (n, s) in scores.items()),
        key=lambda t: (-t[0], t[2]),
    )[:25]

    got = dsir_importance_rank(docs).collect()
    assert [(r.score_micro, r.n_features, r.doc_id) for r in got] == expected
    # the selector must prefer target-domain docs: majority of top-25
    src = {r.doc_id: r.source for r in rows}
    n_target = sum(1 for r in got if src[r.doc_id] == "src0")
    assert n_target >= 13


def test_weighted_sample_favors_heavy_docs_and_matches_python(spark):
    """A-ES weighted top-k ≡ pure-Python recompute of the quantized
    exponential keys, and the selected set is weight-biased (mean
    token count above the corpus mean)."""
    import math

    from sparketl.io import load_table
    from sparketl.operators.curation import weighted_sample_topk

    docs = load_table(spark, SF_SMOKE, "documents")
    rows = docs.select("doc_id", "text").collect()
    keys = []
    for r in rows:
        w = len(r.text.split(" "))
        u = ((r.doc_id * 2654435761) % 4294967296 + 1) / 4294967296.0
        keys.append((math.floor(math.log(u) / w * 1e6), -r.doc_id, r.doc_id, w))
    keys.sort(reverse=True)
    expected = [(k[2], k[0]) for k in keys[:25]]

    got = weighted_sample_topk(docs).collect()
    assert [(r.doc_id, r.key_micro) for r in got] == expected
    corpus_mean = sum(k[3] for k in keys) / len(keys)
    sel_mean = sum(r.n_tokens for r in got) / len(got)
    assert sel_mean > corpus_mean


def test_sequence_packing_invariants(spark):
    """Concat-and-chunk packing: every non-final window holds exactly
    `window` tokens, and window occupancy reconciles — docs in a window
    = docs starting there + docs carried over from the previous one."""
    from sparketl.io import load_table
    from sparketl.operators.curation import sequence_packing_report

    rows = sequence_packing_report(
        load_table(spark, SF_SMOKE, "documents"), window=512, n_windows=40
    ).collect()
    assert len(rows) > 5
    by_id = {r.window_id: r for r in rows}
    last = max(by_id)
    for wid, r in by_id.items():
        if wid < last:
            assert r.tokens_in_window == 512, (wid, r.tokens_in_window)
        prev = by_id.get(wid - 1)
        if prev is not None:
            assert r.n_docs == r.n_starting + prev.n_crossing_out, wid


def test_source_kl_matches_python_and_detects_planted_drift(spark):
    """Per-source token KL ≡ pure-Python recompute, and a planted
    divergent source scores far above the organic ones."""
    import math

    from pyspark.sql import functions as F

    from sparketl.io import load_table
    from sparketl.operators.curation import source_token_kl

    docs = load_table(spark, SF_SMOKE, "documents")
    # plant a source whose vocabulary is disjoint boilerplate
    planted = docs.limit(20).select(
        "doc_id",
        F.lit("zzzz qqqq zzzz qqqq zzzz qqqq zzzz qqqq").alias("text"),
        "lang",
        F.lit("src_planted").alias("source"),
        "n_chars",
    )
    full = docs.unionByName(planted)
    got = {r.source: (r.n_tokens, r.kl_weighted_micro)
           for r in source_token_kl(full).collect()}

    B = 128
    def bucket(f):
        w = sum(ord(c) * (i + 1) for i, c in enumerate(f))
        return ((w * 2654435761) % 4294967296) % B

    from collections import Counter
    sb: dict = {}
    gb: Counter = Counter()
    for r in full.select("source", "text").collect():
        for t in r.text.split(" "):
            b = bucket(t)
            sb.setdefault(r.source, Counter())[b] += 1
            gb[b] += 1
    q = sum(gb.values())
    for src, cnt in sb.items():
        t_s = sum(cnt.values())
        kl = sum(
            c * math.floor(
                math.log((c + 1) * (q + B) / ((gb[b] + 1) * (t_s + B))) * 1e6
            )
            for b, c in cnt.items()
        )
        assert got[src] == (t_s, kl), src
    organic_max = max(v[1] / v[0] for s, v in got.items() if s != "src_planted")
    assert got["src_planted"][1] / got["src_planted"][0] > 4 * max(
        organic_max, 1e-9
    )


def test_incremental_lsh_accounting_matches_python_replay(spark):
    """The incremental batch-dedup accounting ≡ a pure-Python replay of
    the drop rules over the verified pair lists, and the split covers
    the corpus."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from sparketl.io import load_table
    from sparketl.operators.curation import (
        incremental_minhash_dedup,
        q_ext_117_incremental_lsh,
    )
    from sparketl.operators.dedup import banded_signatures, shingles

    docs = load_table(spark, SF_SMOKE, "documents")
    coin = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8"
    old, new = docs.filter(coin).cache(), docs.filter(~coin).cache()
    got = {r.source: r for r in incremental_minhash_dedup(old, new).collect()}

    # pair lists via the same building blocks (banding is xxhash64 —
    # not Python-reproducible — but the DROP LOGIC is, given the pairs)
    def pairs(bl, br, lt):
        cond = (F.col("a.band") == F.col("b.band")) & (
            F.col("a.bucket") == F.col("b.bucket")
        )
        if lt:
            cond = cond & (F.col("a.doc_id") < F.col("b.doc_id"))
        return (
            bl.alias("a")
            .join(br.alias("b"), cond)
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )

    def verify(cand, sh_a, sh_b):
        sa = sh_a.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
        sb = sh_b.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        j = inter.cast("double") / (
            F.size("sh_a") + F.size("sh_b") - inter
        ).cast("double")
        return [
            (r.doc_a, r.doc_b)
            for r in cand.join(sa, "doc_a")
            .join(sb, "doc_b")
            .where(j >= 0.8)
            .select("doc_a", "doc_b")
            .collect()
        ]

    ob, nb = banded_signatures(old), banded_signatures(new)
    no = verify(pairs(nb, ob, lt=False), shingles(new), shingles(old))
    nn = verify(pairs(nb, nb, lt=True), shingles(new), shingles(new))

    drop_vs = {a for a, _ in no}
    adj = defaultdict(set)
    for a, b in nn:
        if a not in drop_vs and b not in drop_vs:
            adj[a].add(b)
            adj[b].add(a)
    drop_in = set()
    seen = set()
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = [], [start]
        seen.add(start)
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x] - seen:
                seen.add(y)
                stack.append(y)
        root = min(comp)
        drop_in |= set(comp) - {root}

    src = {r.doc_id: r.source for r in new.select("doc_id", "source").collect()}
    want = defaultdict(lambda: [0, 0, 0, 0])
    for d, s in src.items():
        w = want[s]
        w[0] += 1
        if d in drop_vs:
            w[1] += 1
        elif d in drop_in:
            w[2] += 1
        else:
            w[3] += 1
    assert set(got) == set(want)
    for s, w in want.items():
        g = got[s]
        assert (
            g.n_docs,
            g.n_dropped_vs_corpus,
            g.n_dropped_in_batch,
            g.n_kept,
        ) == tuple(w), s
    assert sum(w[1] + w[2] for w in want.values()) > 0  # fixture has dups


def test_csv_failfast_rejects_malformed_and_permissive_accounts(spark, tmp_path):
    """ext_153's FAILFAST choice: a malformed row must be a loud error,
    and the PERMISSIVE twin must capture it in the corrupt-record
    column instead of silently nulling fields."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        '1,"hello",en,src0,5\n'
        'NOT_A_NUMBER,"bad",en,src0,3\n'
        '2,"world",fr,src1,5\n'
    )
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    with pytest.raises((PySparkException, Py4JJavaError)):
        (
            spark.read.schema(schema)
            .option("header", True)
            .option("mode", "FAILFAST")
            .csv(str(p))
            .collect()
        )
    perm = (
        spark.read.schema(schema + ", _corrupt string")
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(str(p))
    )
    rows = perm.collect()
    corrupt = [r for r in rows if r["_corrupt"] is not None]
    clean = [r for r in rows if r["_corrupt"] is None]
    assert len(corrupt) == 1 and "NOT_A_NUMBER" in corrupt[0]["_corrupt"]
    assert {r["doc_id"] for r in clean} == {1, 2}


def test_csv_roundtrip_survives_newlines_and_nulls(spark, tmp_path):
    """r12 (advisor): ext_153's exact write/read option pairing must
    round-trip embedded newlines (multiLine), embedded quotes, NULL
    text (the \\N marker) and empty-but-not-NULL strings (quoteAll)."""
    from pyspark.sql import functions as F

    rows = [
        (1, "line one\nline two", "en", "s0", 17),
        (2, None, "en", "s0", 0),
        (3, "", "fr", "s1", 0),
        (4, 'quote " inside', "fr", "s1", 14),
        (5, "plain", "de", "s2", 5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    stage = str(tmp_path / "csvstage")
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .option("nullValue", "\\N")
        .csv(stage)
    )
    back = (
        spark.read.schema(
            "doc_id bigint, text string, lang string, source string, n_chars bigint"
        )
        .option("header", True)
        .option("mode", "FAILFAST")
        .option("multiLine", True)
        .option("nullValue", "\\N")
        .csv(stage)
    )
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == {i: t for i, t, *_ in rows}
    # NULL stayed NULL and empty stayed empty — the aggregate ext_153
    # hashes distinguishes them via sum(length(text)) vs n_docs
    assert got[2] is None and got[3] == ""
    assert back.where(F.col("text").isNull()).count() == 1


def test_roundtrip_sources_agree_with_parquet(spark):
    """ext_153/154: the CSV and ORC round trips must produce the exact
    checksum aggregate the parquet table produces directly."""
    from pyspark.sql import functions as F

    from sparketl.io import load_table
    from sparketl.operators.curation import (
        _roundtrip_aggregate,
        q_ext_153_csv_source,
        q_ext_154_orc_source,
    )
    from tests.conftest import SF_SMOKE

    want = [
        tuple(r)
        for r in _roundtrip_aggregate(
            load_table(spark, SF_SMOKE, "documents")
        ).collect()
    ]
    got_csv = [tuple(r) for r in q_ext_153_csv_source(spark, SF_SMOKE).collect()]
    got_orc = [tuple(r) for r in q_ext_154_orc_source(spark, SF_SMOKE).collect()]
    assert got_csv == want and got_orc == want and len(want) > 0


def test_layout_entries_prune_and_colocate(spark):
    """ext_157/158: the partitioned scan must carry a lang
    PartitionFilter, and the bucketed join's executed plan must be a
    SortMergeJoin over Bucketed: true scans with NO Exchange below the
    join (the shuffle was paid at write time)."""
    from sparketl.operators.curation import (
        q_ext_157_partitioned_scan,
        q_ext_158_bucketed_join,
    )
    from tests.conftest import SF_SMOKE

    d1 = q_ext_157_partitioned_scan(spark, SF_SMOKE)
    d1.collect()
    p1 = d1._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in p1 and "lang" in p1.split("PartitionFilters")[1][:80]

    d2 = q_ext_158_bucketed_join(spark, SF_SMOKE)
    d2.collect()
    p2 = d2._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in p2 and p2.count("Bucketed: true") >= 2
    below_join = p2[p2.rindex("SortMergeJoin"):]
    assert "Exchange" not in below_join, below_join[:500]
