"""Round-4 training-pipeline operators: vocabulary coverage, CCNet
quality buckets, embedding outliers, streaming dedup."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_vocab_coverage_monotone_and_bounded(spark):
    from sparketl.io import load_table
    from sparketl.operators.pipeline_ops import vocab_coverage

    docs = load_table(spark, SF_SMOKE, "documents")
    rows = vocab_coverage(docs).collect()
    assert [r["k"] for r in rows] == [100, 1000, 10000]
    prev = 0.0
    for r in rows:
        assert 0.0 < r["coverage"] <= 1.0
        assert r["covered_tokens"] <= r["total_tokens"]
        assert r["coverage"] >= prev  # more vocab never covers less
        prev = r["coverage"]
    # all rows agree on the corpus totals
    assert len({(r["total_tokens"], r["distinct_vocab"]) for r in rows}) == 1


def test_quality_buckets_partition_scored_docs(spark):
    from sparketl.io import load_table
    from sparketl.operators.pipeline_ops import quality_buckets
    from sparketl.operators.textmine import lm_doc_score

    docs = load_table(spark, SF_SMOKE, "documents")
    buckets = quality_buckets(docs).collect()
    assert {r["bucket"] for r in buckets} <= {"head", "middle", "tail"}
    # buckets partition exactly the scored (>=3-token) docs per language
    n_scored = lm_doc_score(docs).count()
    assert sum(r["n_docs"] for r in buckets) == n_scored
    # thirds: within each language no bucket swallows everything
    per_lang = {}
    for r in buckets:
        per_lang.setdefault(r["lang"], []).append(r["n_docs"])
    for lang, ns in per_lang.items():
        if sum(ns) >= 9:  # enough docs for thirds to be meaningful
            assert max(ns) < sum(ns), lang


def test_embedding_outliers_p99_flags_about_one_percent(spark):
    from sparketl.io import load_table
    from sparketl.operators.pipeline_ops import embedding_outliers

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = embedding_outliers(emb).collect()
    assert rows, "expected at least one label"
    for r in rows:
        assert 0 <= r["n_outliers"] <= max(1, int(r["n_vecs"] * 0.02))
        assert r["max_d2_nano"] >= 0
        # the max distance is at or beyond the p99 threshold
        assert float(r["max_d2_nano"]) >= r["p99_d2_nano"] or r["n_vecs"] == 1


def test_source_cap_caps_and_keeps_longest(spark):
    from sparketl.io import load_table
    from sparketl.operators.pipeline_ops import source_cap

    docs = load_table(spark, SF_SMOKE, "documents")
    rows = source_cap(docs, cap=3).collect()
    for r in rows:
        assert r["n_kept"] <= 3
        assert r["n_kept"] <= r["n_docs"]
    # kept docs are the longest: min kept length >= every dropped length
    one = rows[0]["source"]
    lens = sorted(
        (r["n_chars"] for r in docs.filter(F.col("source") == one).collect()),
        reverse=True,
    )
    assert rows[0]["min_kept_chars"] == lens[min(3, len(lens)) - 1]


def test_curation_funnel_monotone_stages(spark):
    from sparketl.io import load_table
    from sparketl.operators.pipeline_ops import curation_funnel

    docs = load_table(spark, SF_SMOKE, "documents")
    rows = curation_funnel(docs).collect()
    assert [r["stage"] for r in rows] == [
        "raw",
        "quality",
        "exact_dedup",
        "near_dedup",
    ]
    counts = [r["n_docs"] for r in rows]
    assert counts == sorted(counts, reverse=True)  # funnel never grows
    assert counts[0] == docs.count()
    assert counts[-1] > 0


def test_dataset_card_consistency(spark):
    from sparketl.io import load_table
    from sparketl.operators.pipeline_ops import dataset_card

    docs = load_table(spark, SF_SMOKE, "documents")
    rows = dataset_card(docs).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert 0.0 <= r["dup_rate"] <= 1.0
        assert 0.0 <= r["pass_rate"] <= 1.0
        assert r["n_dup_docs"] < r["n_docs"]
        assert 1 <= r["n_langs"]
        # the dominant language really is a language of this source
        langs = {
            x["lang"]
            for x in docs.filter(F.col("source") == r["source"])
            .select("lang")
            .distinct()
            .collect()
        }
        assert r["top_lang"] in langs
        assert r["n_langs"] == len(langs)


def test_incremental_dedup_drops_registry_and_batch_dups(spark):
    from sparketl.io import load_table
    from sparketl.operators.pipeline_ops import incremental_dedup

    docs = load_table(spark, SF_SMOKE, "documents")
    registry = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    rows = incremental_dedup(batch, registry).collect()
    assert sum(r["n_batch"] for r in rows) == batch.count()
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_batch"]
        assert 0 <= r["n_kept"] <= r["n_batch"]
    # a batch reusing only registry texts keeps nothing
    dup_batch = registry.limit(10).withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    )
    dup_rows = incremental_dedup(dup_batch, registry).collect()
    assert sum(r["n_kept"] for r in dup_rows) == 0


def test_two_phase_stratified_rank_matches_single_window(spark):
    """The bucketed prefix-sum rank must select exactly the same docs
    as the textbook single-window formulation."""
    from pyspark.sql import Window as W

    from sparketl.io import load_table
    from sparketl.operators.relational import q_ext_08_stratified_sample

    docs = load_table(spark, SF_SMOKE, "documents")
    w = W.partitionBy("lang").orderBy("doc_id")
    want = {
        r["doc_id"]
        for r in docs.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") % 10) == 1)
        .collect()
    }
    got = {r["doc_id"] for r in q_ext_08_stratified_sample(spark, SF_SMOKE).collect()}
    assert got == want


def test_streaming_dedup_equals_batch_distinct(spark):
    from sparketl.io import load_table
    from sparketl.streaming.stateful import run_streaming_dedup

    got = {
        (r["user_id"], r["event_type"])
        for r in run_streaming_dedup(spark, SF_SMOKE, n_chunks=3).collect()
    }
    want = {
        (r["user_id"], r["event_type"])
        for r in load_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert got == want


def test_mixture_weights_sum_to_one_and_upweight_small(spark):
    from sparketl.io import load_table
    from sparketl.operators.pipeline_ops import mixture_weights

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    rows = mixture_weights(docs, token_budget=10_000).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-9
    # τ=0.5 upweights small sources: weight share must exceed token
    # share for the smallest source and trail it for the largest
    total_tok = sum(r["n_tokens"] for r in rows)
    smallest = min(rows, key=lambda r: r["n_tokens"])
    largest = max(rows, key=lambda r: r["n_tokens"])
    assert smallest["weight"] > smallest["n_tokens"] / total_tok
    assert largest["weight"] < largest["n_tokens"] / total_tok
    # epochs = weight·budget/n_tokens exactly
    for r in rows:
        assert abs(r["epochs"] - r["weight"] * 10_000 / r["n_tokens"]) < 1e-9


def test_hash_split_fractions_and_determinism(spark):
    from sparketl.io import load_table
    from sparketl.operators.pipeline_ops import hash_split_counts

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    rows = hash_split_counts(docs).collect()
    by_split = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    n = sum(by_split.values())
    assert n == docs.count()
    # md5 uniformity: 79.7/10.2/10.2 targets, generous ±4% absolute
    assert abs(by_split["train"] / n - 204 / 256) < 0.04
    assert abs(by_split["val"] / n - 26 / 256) < 0.04
    assert abs(by_split["test"] / n - 26 / 256) < 0.04
    # deterministic across partitioning: same counts after repartition
    again = hash_split_counts(docs.repartition(7)).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_tv_drift_zero_for_identical_one_for_disjoint(spark):
    from pyspark.sql import functions as F

    from sparketl.operators.pipeline_ops import tv_drift

    docs = spark.createDataFrame(
        [(i, "w " * (i % 5 + 1), "en", "s1", 10) for i in range(100)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    same = {r["source"]: r for r in tv_drift(docs, docs).collect()}
    assert same["s1"]["tv_half_nanos"] == 0
    short = docs.withColumn("text", F.lit("a"))
    long = docs.withColumn("text", F.lit(" ".join(["b"] * 100)))
    disjoint = {r["source"]: r for r in tv_drift(short, long).collect()}
    # disjoint supports → TV = 1.0 → half-sum of |Δp| in nanos = 1e9
    assert disjoint["s1"]["tv_half_nanos"] == 1_000_000_000
    # a source that vanished from one snapshot must not go NULL (the
    # zero-total guard): its empty side contributes p≡0, so the
    # half-L1 reads 0.5 — flagged alongside the zero count
    only_a = docs.filter(F.col("doc_id") < 50)
    other = docs.filter(F.col("doc_id") >= 50).withColumn("source", F.lit("s2"))
    vanish = {r["source"]: r for r in tv_drift(only_a, other).collect()}
    assert vanish["s1"]["tv_half_nanos"] == 500_000_000
    assert vanish["s2"]["tv_half_nanos"] == 500_000_000
    assert vanish["s1"]["n_b"] == 0 and vanish["s2"]["n_a"] == 0


def _reference_bpe(word_counts, n_merges, min_count=2):
    """Pure-Python BPE with the operator's exact tie-break
    (count DESC, left, right) — the ground truth for the merge loop."""
    syms = {w: list(w) for w in word_counts}
    merges = []
    for step in range(1, n_merges + 1):
        counts = {}
        for w, n in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + n
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((step, a, b, a + b, cnt))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def test_bpe_merges_equal_reference(spark):
    """The distributed merge loop must reproduce the reference BPE's
    merge sequence exactly — pair choice, tie-break, counts, and the
    left-to-right merge application all verified in one equality."""
    from pyspark.sql import functions as F

    from sparketl.io import load_table
    from sparketl.operators.pipeline_ops import bpe_train_merges

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    wc = {
        r["w"]: r["n"]
        for r in docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = _reference_bpe(wc, n_merges=6)
    got = [
        (r["step"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train_merges(docs, n_merges=6).orderBy("step").collect()
    ]
    assert got == want
    assert len(got) == 6  # fixture has ≥6 productive merges


def test_bpe_merges_overlapping_pairs_left_to_right(spark):
    """'aaa' under merge (a,a): left-to-right gives [aa, a], never
    [a, aa] — the fold's sentinel logic, on a crafted corpus."""
    from sparketl.operators.pipeline_ops import bpe_train_merges

    docs = spark.createDataFrame(
        [(1, "aaa aaa aa", "en", "s", 10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = bpe_train_merges(docs, n_merges=1).collect()
    assert [(r["left"], r["right"], r["pair_count"]) for r in out] == [
        ("a", "a", 5)  # 2 per 'aaa' (overlap not double-counted at apply
        # time but pair COUNTING sees both) + 1 for 'aa'
    ]


def test_epoch_shuffle_permutation_and_decorrelation(spark):
    """ext_143: within every (epoch, shard) the positions are exactly
    1..n; shards are identical across epochs (files written once);
    the ORDER differs between epochs (fresh permutation per epoch)."""
    from tests.conftest import SF_SMOKE

    from sparketl.io import load_table
    from sparketl.operators.curation import epoch_shuffle

    docs = load_table(spark, SF_SMOKE, "documents")
    rows = epoch_shuffle(docs, n_shards=4, n_epochs=2).collect()
    by = {}
    shard_of = {}
    for r in rows:
        by.setdefault((r["epoch"], r["shard"]), []).append(
            (r["pos"], r["doc_id"])
        )
        prev = shard_of.setdefault(r["doc_id"], r["shard"])
        assert prev == r["shard"]  # shard fixed across epochs
    for (_, _), members in by.items():
        poss = sorted(p for p, _ in members)
        assert poss == list(range(1, len(members) + 1))  # true permutation
    # decorrelation: the doc order of epoch 1 != epoch 2 in some shard
    diff = 0
    for shard in {s for (_, s) in by}:
        o1 = [d for _, d in sorted(by[(1, shard)])]
        o2 = [d for _, d in sorted(by[(2, shard)])]
        assert sorted(o1) == sorted(o2)  # same membership
        diff += int(o1 != o2)
    assert diff > 0
