"""Text-analysis operators (EXT-04 / north-star text suite).

- corpus stats per language (token/char aggregates)
- token frequency (top-k terms)
- quality scoring: length / stopword-ratio / word-length composite
- token counting: whitespace tokens + a BPE-ish subword estimate
- language-ID: wordlist-hit scoring with deterministic arg-max
  (the fixture corpus shares one vocabulary across langs, so accuracy
  is near-chance — the operator contract is determinism, and the
  output is the confusion matrix against the labeled column)
- document fingerprinting: polynomial rolling hash over characters

Everything is built from JVM-side expressions (split / filter /
aggregate / transform array folds) — no Python UDFs — so the whole
suite runs inside whole-stage codegen and scales with scan
throughput; the only shuffles are the final small aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparketl.io import load_table, spread

STOPWORDS = ("the", "a")

# Deterministic wordlists for the language-ID heuristic.
LANG_WORDLISTS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "data", "table"),
    "es": ("row", "column", "value"),
    "de": ("hash", "merge", "sort"),
    "fr": ("query", "filter", "join"),
    "zh": ("spark", "stream", "batch"),
}


def q_ext_04_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return (
        d.select("lang", "n_chars", F.size(toks).alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.col("n_tokens").cast("long")).alias("total_tokens"),
            (F.sum(F.col("n_tokens").cast("long")).cast("double") / F.count(F.lit(1))).alias(
                "avg_tokens"
            ),
        )
        .orderBy("lang")
    )


def q_ext_04_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global term frequency, top 20 (tie-broken on token)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(20)
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Length/stopword/word-length composite quality score per doc.

    score = 0.4·min(n_tokens/100, 1) + 0.3·(1 − stopword_ratio)
          + 0.3·min(avg_word_len/8, 1)
    All double arithmetic in a fixed order → reproducible.
    """
    toks = F.split(F.col("text"), " ")
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_tokens = F.size(toks).cast("double")
    n_stop = F.expr(f"size(filter(split(text, ' '), x -> x IN ({sw})))").cast("double")
    avg_word_len = (F.length("text") - (F.size(toks) - 1)).cast("double") / F.size(toks)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        (n_stop / n_tokens).alias("stopword_ratio"),
        avg_word_len.alias("avg_word_len"),
        (
            F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
            + (F.lit(1.0) - n_stop / n_tokens) * 0.3
            + F.least(avg_word_len / F.lit(8.0), F.lit(1.0)) * 0.3
        ).alias("quality"),
    )


def q_ext_04_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return quality_score(d).orderBy("doc_id")


def q_ext_04_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens and a BPE-ish subword estimate
    (⌈len(word)/4⌉ per word, integer arithmetic)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.expr(
            "aggregate(split(text, ' '), 0, (acc, w) -> acc + CAST((length(w) + 3) div 4 AS INT))"
        ).alias("subword_tokens"),
    ).orderBy("doc_id")


def lang_id(docs: DataFrame) -> DataFrame:
    """Predict language by wordlist hit count; deterministic arg-max
    (max hits, ties broken by language code ascending)."""
    scored = docs
    for lang, words in LANG_WORDLISTS.items():
        wl = ", ".join(f"'{w}'" for w in words)
        scored = scored.withColumn(
            f"score_{lang}",
            F.expr(f"size(filter(split(text, ' '), x -> x IN ({wl})))"),
        )
    # min of (-score, lang) == max score with lexicographic tie-break
    pairs = ", ".join(
        f"named_struct('neg', -score_{lang}, 'lang', '{lang}')"
        for lang in sorted(LANG_WORDLISTS)
    )
    return scored.withColumn(
        "predicted", F.expr(f"array_min(array({pairs})).lang")
    ).drop(*[f"score_{lang}" for lang in LANG_WORDLISTS])


def q_ext_04_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the wordlist lang-ID against the labels."""
    d = load_table(spark, sf_dir, "documents")
    return (
        lang_id(d)
        .groupBy(F.col("lang").alias("true_lang"), F.col("predicted"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("true_lang", "predicted")
    )


def fingerprint(docs: DataFrame, mod: int = 10**15, mult: int = 31, seed: int = 7) -> DataFrame:
    """Polynomial rolling hash over the character stream — a
    deterministic, engine-agnostic document fingerprint (unlike
    xxhash64, this is reproducible in any SQL engine).

    Linear char access via split (the substring(i) formulation is
    O(len²) per doc — 2.7× slower measured at sf0.1)."""
    return spread(docs).select(
        "doc_id",
        F.expr(
            f"aggregate(transform(filter(split(text, ''), c -> c <> ''), "
            f"c -> ascii(c)), "
            f"CAST({seed} AS BIGINT), (acc, c) -> (acc * {mult} + c) % {mod})"
        ).alias("fingerprint"),
    )


def q_ext_04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return fingerprint(d).orderBy("doc_id")


def q_ext_04_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram: fixed-width 100-char buckets.
    Integer floor-div bucketing (deterministic, engine-agnostic);
    single map-side-combined aggregation."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (F.col("n_chars") / 100).cast("bigint")
    return (
        d.select(
            bucket.alias("bucket"),
            (bucket * 100).alias("bucket_lo"),
        )
        .groupBy("bucket", "bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("bucket")
    )


# HyperLogLog constants (m = 256 registers, p = 8): the estimate
# numerator alpha_m·m²·2^53 is folded into ONE shared decimal literal
# so both engines parse the identical double and the single division
# by the exact integer Z is correctly rounded everywhere.
_HLL_M = 256
_HLL_NUMERATOR = "4.2399330249068963e+20"  # 0.7213/(1+1.079/256)·256²·2^53


def hll_ndv(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Explicit HyperLogLog NDV estimate per group, next to the exact
    NDV — fixed 256-register state, map-side mergeable via max(), no
    shuffle-the-universe distinct (the 100 TB NDV path; Spark's
    built-in `approx_count_distinct` is the same algorithm with an
    opaque binary sketch).

    Round 8: built from the portable md5 hash (`phash.h60`) with every
    register exact — idx = top 8 bits, rank = 52-bit leading-zero
    count via the minimal-binary-string length (`bin()` is identical
    in Spark and DuckDB), and Z carried as the exact bigint
    Σ 2^(53−M_j) — so DuckDB reproduces the sketch REGISTER-FOR-
    REGISTER and the estimate bit-for-bit: a sketch operator with a
    full SQL oracle (was rows-only via HLL++'s engine-opaque state).
    The standard small-range linear-counting branch (raw ≤ 2.5m with
    empty registers) uses one ln() of an exact quotient, floored.
    """
    from sparketl.operators.phash import h60

    h = h60(F.concat(F.lit("hll:"), F.col(value_col).cast("string")))
    regs = (
        df.select(
            F.col(group_col).alias("g"),
            h.alias("h"),
            F.col(value_col).alias("v"),
        )
        .select(
            "g",
            "v",
            F.expr("h div 4503599627370496").alias("idx"),  # top 8 bits
            F.expr("h % 4503599627370496").alias("low"),  # low 52 bits
        )
        .withColumn(
            "rank",
            F.expr("CASE WHEN low = 0 THEN 53 ELSE 53 - length(bin(low)) END"),
        )
        .groupBy("g", "idx")
        .agg(F.max("rank").alias("m_reg"))
    )
    exact = (
        df.groupBy(F.col(group_col).alias("g"))
        .agg(F.countDistinct(value_col).alias("ndv_exact"))
    )
    per_group = regs.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m_reg AS INT))")
        ).alias("z_present"),
    )
    est = (
        per_group.withColumn("v_zero", F.lit(_HLL_M) - F.col("n_present"))
        .withColumn(
            "z_scaled",
            F.col("z_present") + F.col("v_zero") * F.lit(1 << 53),
        )
        .withColumn(
            "raw_est", F.expr(f"{_HLL_NUMERATOR} / CAST(z_scaled AS DOUBLE)")
        )
        .withColumn(
            "hll_estimate",
            F.expr(
                "CAST(FLOOR(CASE WHEN raw_est <= 640.0 AND v_zero > 0 "
                "THEN 256.0 * ln(256.0 / CAST(v_zero AS DOUBLE)) "
                "ELSE raw_est END) AS BIGINT)"
            ),
        )
    )
    return (
        est.join(exact, "g")
        .select(
            F.col("g").alias(group_col),
            "ndv_exact",
            "v_zero",
            "z_scaled",
            "hll_estimate",
            F.expr(
                "(1000 * abs(hll_estimate - ndv_exact)) div ndv_exact"
            ).alias("abs_err_permille"),
        )
        .orderBy(group_col)
    )


def q_ext_09_hll_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority HLL estimate of distinct ordering customers (the
    exact NDV rides along for the error audit; pytest bounds the
    relative error). sf0.01 exercises the raw-estimate branch
    (NDV ≈ 4-5x the register count), sf0.001 the linear-counting
    small-range branch."""
    o = load_table(spark, sf_dir, "orders")
    return hll_ndv(o, "o_orderpriority", "o_custkey")


def hll_union_ndv(docs: DataFrame) -> DataFrame:
    """Union-NDV by REGISTER MERGE — the property that makes HLL the
    100 TB distinct-count tool: per-source 256-register sketches
    (built once, persistable) merge into the corpus-wide sketch by
    ``max()`` per register — O(sources × 256) work, never a rescan of
    the data, and the merged estimate equals the estimate a single
    pass over the union would produce (max of maxes ≡ max over the
    union, exactly). Output: one row per source plus the merged
    ``ALL`` scope, each with the exact NDV and permille error
    alongside (the exact side is the audit, not the scale path).

    Same engine-exact register construction as ``hll_ndv`` (md5-h60,
    bin()-length ranks, exact bigint Z), so DuckDB replays the
    per-source sketches AND the merge register-for-register."""
    from sparketl.operators.phash import h60

    h = h60(F.concat(F.lit("hllu:"), F.col("text")))
    base = docs.select(F.col("source").alias("g"), h.alias("hh"))
    regs = (
        base.select(
            "g",
            F.expr("hh div 4503599627370496").alias("idx"),
            F.expr("hh % 4503599627370496").alias("low"),
        )
        .withColumn(
            "rank",
            F.expr("CASE WHEN low = 0 THEN 53 ELSE 53 - length(bin(low)) END"),
        )
        .groupBy("g", "idx")
        .agg(F.max("rank").alias("m_reg"))
        .localCheckpoint(eager=True)  # two consumers: per-source + merge
    )
    merged = (
        regs.groupBy("idx")
        .agg(F.max("m_reg").alias("m_reg"))
        .select(F.lit("ALL").alias("g"), "idx", "m_reg")
    )
    all_regs = regs.unionByName(merged)
    per_group = all_regs.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m_reg AS INT))")
        ).alias("z_present"),
    )
    est = (
        per_group.withColumn("v_zero", F.lit(_HLL_M) - F.col("n_present"))
        .withColumn(
            "z_scaled",
            F.col("z_present") + F.col("v_zero") * F.lit(1 << 53),
        )
        .withColumn(
            "raw_est", F.expr(f"{_HLL_NUMERATOR} / CAST(z_scaled AS DOUBLE)")
        )
        .withColumn(
            "hll_estimate",
            F.expr(
                "CAST(FLOOR(CASE WHEN raw_est <= 640.0 AND v_zero > 0 "
                "THEN 256.0 * ln(256.0 / CAST(v_zero AS DOUBLE)) "
                "ELSE raw_est END) AS BIGINT)"
            ),
        )
    )
    exact = (
        docs.groupBy(F.col("source").alias("g"))
        .agg(F.countDistinct("text").alias("ndv_exact"))
        .unionByName(
            docs.agg(F.countDistinct("text").alias("ndv_exact")).select(
                F.lit("ALL").alias("g"), "ndv_exact"
            )
        )
    )
    return (
        est.join(exact, "g")
        .select(
            F.col("g").alias("scope"),
            "ndv_exact",
            "hll_estimate",
            F.expr(
                "(1000 * abs(hll_estimate - ndv_exact)) div ndv_exact"
            ).alias("abs_err_permille"),
        )
        .orderBy("scope")
    )


def q_ext_144_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_union_ndv(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# ext_146: incremental NDV maintenance — the persistable register table
# folds with each ingest batch's registers (r10, judge task 7).
# ---------------------------------------------------------------------------


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    salt: str = "hllu:",
) -> DataFrame:
    """``(*group_cols, idx, m_reg)`` — the persistable per-group HLL
    register table (the same md5-h60 / bin()-length construction as
    :func:`hll_ndv` / :func:`hll_union_ndv`, factored out for the
    incremental path). 256 rows max per group, map-side mergeable.
    NULL values are excluded — NDV ignores NULLs (countDistinct
    semantics in both engines); without the guard a NULL value would
    hash to a NULL register index whose NULL rank poisons the exact
    bigint Z sum."""
    from sparketl.operators.phash import h60

    h = h60(F.concat(F.lit(salt), F.col(value_col).cast("string")))
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("hh"))
        .select(
            *group_cols,
            F.expr("hh div 4503599627370496").alias("idx"),
            F.expr("hh % 4503599627370496").alias("low"),
        )
        .withColumn(
            "rank",
            F.expr("CASE WHEN low = 0 THEN 53 ELSE 53 - length(bin(low)) END"),
        )
        .groupBy(*group_cols, "idx")
        .agg(F.max("rank").alias("m_reg"))
    )


def merge_hll_registers(
    a: DataFrame, b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Fold two register tables: max per (group, idx). Associative and
    commutative, so any fold order equals the single-pass recompute —
    the property the ext_146 oracle hash-checks."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "idx")
        .agg(F.max("m_reg").alias("m_reg"))
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """``(*group_cols, hll_estimate)`` from a register table — the
    identical exact-bigint Z / linear-counting expressions as
    :func:`hll_ndv`, so DuckDB replays the estimate bit-for-bit."""
    per_group = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m_reg AS INT))")
        ).alias("z_present"),
    )
    return (
        per_group.withColumn("v_zero", F.lit(_HLL_M) - F.col("n_present"))
        .withColumn(
            "z_scaled",
            F.col("z_present") + F.col("v_zero") * F.lit(1 << 53),
        )
        .withColumn(
            "raw_est", F.expr(f"{_HLL_NUMERATOR} / CAST(z_scaled AS DOUBLE)")
        )
        .withColumn(
            "hll_estimate",
            F.expr(
                "CAST(FLOOR(CASE WHEN raw_est <= 640.0 AND v_zero > 0 "
                "THEN 256.0 * ln(256.0 / CAST(v_zero AS DOUBLE)) "
                "ELSE raw_est END) AS BIGINT)"
            ),
        )
        .select(*group_cols, "hll_estimate")
    )


def q_ext_146_incremental_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NDV maintenance: the per-source register table
    built from an OLD corpus snapshot folds with the ingest batch's
    registers by max-per-register — one pass over the DELTA only,
    never a rescan of old data — and the maintained estimate equals a
    full single-pass recompute register-for-register (max is
    associative/commutative), which is exactly what the DuckDB oracle
    recomputes over the new snapshot: the hash-match IS the
    fold ≡ recompute proof.

    DELETE CAVEAT (by design): a register max cannot decrease, so the
    maintained sketch estimates EVER-SEEN NDV — deletes are ignored
    (a deletion-aware distinct count needs a counting sketch, not
    HLL). Production drives the fold from a ManagedTable change feed
    via ``tables.incremental_hll_registers``; its pytest replays real
    append batches (fold ≡ recompute) and asserts the post-delete
    no-shrink caveat explicitly."""
    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 0)
    batch = docs.filter(F.col("doc_id") % 7 == 0)
    prev = hll_registers(old, ["source"], "text")  # the persisted table
    delta = hll_registers(batch, ["source"], "text")  # the ingest batch
    regs = merge_hll_registers(prev, delta, ["source"])
    est = hll_estimate_from_registers(regs, ["source"])
    exact = docs.groupBy("source").agg(
        F.countDistinct("text").alias("ndv_exact")
    )
    return (
        est.join(exact, "source")
        .select(
            "source",
            "ndv_exact",
            "hll_estimate",
            F.expr(
                "(1000 * abs(hll_estimate - ndv_exact)) div ndv_exact"
            ).alias("abs_err_permille"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# ext_55: Count-Min sketch frequency estimates
# ---------------------------------------------------------------------------


def _cm_bucket(tok, seed, width: int):
    """Portable count-min bucket: h60('cm<seed>:<tok>') % width."""
    from sparketl.operators.phash import h60

    return h60(
        F.concat(F.lit("cm"), seed.cast("string"), F.lit(":"), tok)
    ) % F.lit(width)


def countmin_token_estimates(
    docs: DataFrame, depth: int = 4, width: int = 1 << 14, k: int = 30
) -> DataFrame:
    """Count-Min frequency estimates for the corpus's top-k tokens,
    next to their exact counts.

    The sketch is built relationally: each of ``depth`` seeded hash
    rows buckets every token into ``width`` counters — one groupBy
    over (seed, bucket), fixed d×w state, fully mergeable (the 100 TB
    shape: partial sketches combine by cell-wise sum, and the
    aggregate is map-side combinable by construction). A point
    estimate is min over the d counters the token hashes to —
    overestimate-only, within εN with probability 1−δ for
    w=⌈e/ε⌉, d=⌈ln 1/δ⌉. Exact counts ride along for the error
    audit (pytest asserts est ≥ exact and the εN bound).

    Round 8: the bucket hash moved from xxhash64 to the portable
    md5-derived ``phash.h60`` — DuckDB computes the identical sketch,
    so this is now a FULL-oracle driver check (was rows-only). The
    seed fan-out is a single-scan explode, not a ``depth``-way union.
    """
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
    seeds = list(range(depth))
    seed_col = F.explode(F.array(*[F.lit(s) for s in seeds])).alias("seed")
    cells = toks.select("tok", seed_col).select(
        "seed", _cm_bucket(F.col("tok"), F.col("seed"), width).alias("bucket")
    )
    sketch = cells.groupBy("seed", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    top = exact.orderBy(F.desc("exact_n"), "tok").limit(k)
    probes = top.select("tok", "exact_n", seed_col).select(
        "tok",
        "exact_n",
        "seed",
        _cm_bucket(F.col("tok"), F.col("seed"), width).alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("tok", "exact_n")
        .agg(F.min("cnt").alias("cm_estimate"))
    )
    return est.select(
        "tok",
        "exact_n",
        "cm_estimate",
        (F.col("cm_estimate") - F.col("exact_n")).alias("overcount"),
    ).orderBy(F.desc("exact_n"), "tok")


def q_ext_55_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return countmin_token_estimates(load_table(spark, sf_dir, "documents"))
