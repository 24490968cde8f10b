"""Text-mining operators over the document corpus (EXT suite,
round 2 batch 3): n-gram language-model estimation, sliding-window
chunking, bag-of-words dedup, and asymmetric containment detection.

Like the rest of the EXT suite these go beyond the reference's query
surface (the reference ships raw SQL to SQL Server,
SQL_DATA_INTEGRATION_TOOL.py:273); they are the document-side
operators an LLM training-data pipeline runs at 100 TB, expressed as
pure JVM DataFrame plans — token arrays via ``split``/``transform``/
``sequence``, never a Python UDF.

Engine-exactness (oracle hashing): every float emitted is a single
bigint÷bigint IEEE division (trigram conditional probability,
containment ratio) — correctly rounded and bit-identical in Spark and
DuckDB; counts are bigints; chunk boundaries are integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparketl.io import load_table
from sparketl.operators.dedup import shingles

# ---------------------------------------------------------------------------
# ext_34: trigram language-model counts P(w3 | w1 w2)
# ---------------------------------------------------------------------------


def trigram_lm(docs: DataFrame, min_count: int = 3) -> DataFrame:
    """Trigram counts and conditional probabilities over the corpus.

    One explode pass emits (w1,w2,w3) per position; the count is a
    map-side-combinable aggregate whose key space is the observed
    trigram vocabulary (≪ corpus size). The bigram denominator is a
    second aggregate over that table joined back on (w1,w2) — NOT a
    window sum: the window sorts each bigram's continuation set in one
    partition (hot bigrams like "of the" serialize), while the
    aggregate combines map-side and its exchange is shared with the
    trigram counts (measured ~40% faster at sf0.1, identical output).
    The ``min_count`` filter runs AFTER the denominator so
    probabilities stay calibrated against the full distribution.
    """
    t = docs.select(F.split("text", " ").alias("tk")).where(F.size("tk") >= 3)
    tri = t.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(tk) - 3),"
                " i -> struct(tk[i] AS w1, tk[i+1] AS w2, tk[i+2] AS w3))"
            )
        ).alias("g")
    ).select("g.*")
    counts = tri.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("n3"))
    n2 = counts.groupBy("w1", "w2").agg(F.sum("n3").alias("n2"))
    return (
        counts.join(n2, ["w1", "w2"])
        .withColumn("p", F.col("n3").cast("double") / F.col("n2").cast("double"))
        .where(F.col("n3") >= min_count)
        .select("w1", "w2", "w3", "n3", "n2", "p")
        .orderBy("w1", "w2", "w3")
    )


def q_ext_34_trigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return trigram_lm(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# ext_35: sliding-window chunking with overlap
# ---------------------------------------------------------------------------


def chunk_with_overlap(
    docs: DataFrame, chunk: int = 32, stride: int = 24
) -> DataFrame:
    """Cut each document into ``chunk``-token windows every ``stride``
    tokens (the RAG/embedding chunking layout; chunk > stride ⇒
    consecutive chunks overlap by chunk − stride tokens).

    Chunk starts come from ``sequence(0, n−1, stride)`` — generated
    inside the row, so the operator is map-only: no shuffle, no driver
    round-trip, output size a fixed ×(chunk/stride) of the corpus. The
    trailing window is kept short (slice clamps at the end) rather
    than dropped, matching standard chunkers.
    """
    t = docs.select("doc_id", F.split("text", " ").alias("tk"))
    c = t.select(
        "doc_id",
        "tk",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.size("tk") - 1, F.lit(0)), F.lit(stride)
            )
        ).alias("start"),
    )
    ctk = F.expr(f"slice(tk, start + 1, {chunk})")
    return (
        c.select(
            "doc_id",
            (F.col("start") / stride).cast("long").alias("chunk_idx"),
            F.col("start").cast("long").alias("start_tok"),
            ctk.alias("ctk"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            "start_tok",
            F.size("ctk").cast("long").alias("n_tokens"),
            F.array_join("ctk", " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


def q_ext_35_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_with_overlap(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# ext_36: bag-of-words dedup (word-order-insensitive exact dedup)
# ---------------------------------------------------------------------------


def bag_dedup(docs: DataFrame) -> DataFrame:
    """Group documents whose token MULTISETS are identical (catches
    word-shuffled copies that exact-hash dedup misses, without any
    pairwise comparison).

    The fingerprint — sorted token array re-joined — is computed
    map-side; the one shuffle is the fingerprint groupBy, i.e. exactly
    the exact-dedup plan with a canonicalizing key. min(doc_id) is the
    deterministic cluster representative.
    """
    fp = F.array_join(F.array_sort(F.split("text", " ")), " ")
    return (
        docs.select("doc_id", fp.alias("bag"))
        .groupBy("bag")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select("keep_doc_id", "n_members")
        .orderBy("keep_doc_id")
    )


def q_ext_36_bag_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bag_dedup(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# ext_37: shingle containment top-k (doc-in-doc / asymmetric near-dup)
# ---------------------------------------------------------------------------


def shingle_containment_topk(
    docs: DataFrame, n: int = 3, k: int = 20
) -> DataFrame:
    """Top-k ordered pairs by containment |sh(A) ∩ sh(B)| / |sh(A)| —
    the asymmetric companion to Jaccard: a small document fully
    embedded in a large one scores ~1 here but low on Jaccard.

    Candidate generation is the inverted-index equi-join on the
    shingle (cost Σ df(shingle)², the same bound as the Jaccard
    baseline — at 100 TB swap in the MinHash-LSH candidates from
    dedup.py and keep this exact scorer for the survivors). The
    per-document shingle-set sizes are a document-count-sized table →
    broadcast. Containment is one bigint÷bigint division, exact in
    both engines.
    """
    sh = shingles(docs, n=n)
    sizes = sh.select("doc_id", F.size("sh").cast("long").alias("n_sh"))
    # explode_outer: ≡ explode on non-empty shingle arrays, no
    # InferFiltersFromGenerate re-evaluation below the exchange (r10)
    ex = sh.select("doc_id", F.explode_outer("sh").alias("shingle"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a.doc_id") != F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sizes_a = F.broadcast(
        sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_sh_a"))
    )
    return (
        inter.join(sizes_a, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "n_sh_a",
            (F.col("n_shared").cast("double") / F.col("n_sh_a").cast("double")).alias(
                "containment"
            ),
        )
        .orderBy(F.desc("containment"), "doc_a", "doc_b")
        .limit(k)
    )


def q_ext_37_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shingle_containment_topk(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# ext_48: language-model document quality score
# ---------------------------------------------------------------------------


def lm_doc_score(docs: DataFrame) -> DataFrame:
    """Per-document fluency score under the corpus's own trigram LM —
    the KenLM-style quality filter of a pretraining pipeline (docs
    whose trigrams are improbable under the corpus distribution are
    boilerplate/garbled candidates).

    One explode produces (doc_id, w1, w2, w3); the trigram/bigram
    counts aggregate from that same relation (self-join — vocabulary-
    sized, ≪ corpus), and each document's score is the sum of its
    trigrams' conditional probabilities P(w3|w1,w2) = n3/n2 in NANO
    units: ``(n3 · 10⁹) div n2`` — pure bigint, so the aggregate is
    map-side combinable, independent of summation order, and
    bit-identical in any engine. The standard log-space score is the
    same plan with ln(n3/n2) — deliberately not used for the oracle
    because ln is not correctly rounded across libms (JVM vs DuckDB
    diverge by an ulp, which crosses quantization boundaries at
    corpus scale). At 100 TB, hash (w1,w2,w3) to a 64-bit key before
    the join to shrink the shuffle.
    """
    tri = (
        docs.select("doc_id", F.split("text", " ").alias("tk"))
        .where(F.size("tk") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(tk) - 3),"
                    " i -> struct(tk[i] AS w1, tk[i+1] AS w2, tk[i+2] AS w3))"
                )
            ).alias("g"),
        )
        .select("doc_id", "g.*")
    )
    counts = tri.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("n3"))
    # bigram denominator as an aggregate joined back on (w1,w2), not a
    # window sum — hot bigrams would serialize a window partition; the
    # aggregate combines map-side and shares the counts exchange
    n2 = counts.groupBy("w1", "w2").agg(F.sum("n3").alias("n2"))
    probs = counts.join(n2, ["w1", "w2"])
    scored = tri.join(probs, ["w1", "w2", "w3"])
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum(F.expr("n3 * 1000000000 div n2")).alias("score_nano"),
        )
        .withColumn(
            "mean_p",
            F.col("score_nano").cast("double")
            / F.lit(1e9)
            / F.col("n_trigrams").cast("double"),
        )
        .orderBy("doc_id")
    )


def q_ext_48_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lm_doc_score(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# ext_52: prefix-filtered exact Jaccard set-similarity join
# ---------------------------------------------------------------------------


def prefix_jaccard_join(
    docs: DataFrame, threshold: float = 0.8, n: int = 3
) -> DataFrame:
    """All document pairs whose shingle-set Jaccard ≥ threshold via
    prefix filtering (AllPairs/PPJoin family) — the SAME semantics as
    ext_02's brute-force join (pytest asserts pair-for-pair equality),
    but the scale-correct algorithm: EXACT output without ever
    expanding Σ df(shingle)² candidate pairs. The default threshold is
    0.8 — prefix filtering is a HIGH-threshold technique (prefix length
    is |s|·(1-t)+1, so t=0.5 keeps half of every set and filters
    little; at t=0.8 candidates drop ~25× versus the brute-force
    join). For low thresholds, ext_02's exact join or MinHash-LSH is
    the right tool.

    Each doc's distinct shingles sort by global rarity (ascending doc
    frequency, shingle tiebreak); two sets with Jaccard ≥ t MUST share
    an element within their first ``|s| - ⌈t·|s|⌉ + 1`` rarest ones,
    so the equi-join explodes only prefixes — candidate volume tracks
    the doc frequency of RARE shingles, which is what makes this
    tractable when a few stop-shingles appear in every document.
    Verification computes the true intersection with array_intersect
    on the full sorted-set arrays carried through the join, and the
    length filter (t·|a| ≤ |b| ≤ |a|/t) prunes before that. Unlike
    MinHash-LSH (probabilistic recall), the prefix filter only drops
    pairs that provably cannot reach the threshold.
    """
    toks = shingles(docs, n=n).select(
        "doc_id", F.explode_outer("sh").alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        toks.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df"), F.col("tok")))
            ).alias("ranked")
        )
        .select(
            "doc_id",
            F.expr("transform(ranked, r -> r.tok)").alias("toks"),
            F.size("ranked").alias("n_tok"),
        )
        # document-count-sized (one row per doc); three consumers below
        # (prefix explode + both verification sides) would otherwise
        # each recompute the shingle explode + frequency join — the
        # single most expensive subtree (measured ~3× the total).
        .persist()
    )
    t = threshold
    # candidate generation carries ONLY (doc_id, n_tok, prefix-token):
    # shuffling the full shingle arrays through the candidate join (and
    # the dedup) multiplies shuffle bytes by set size — measured 8× on
    # this stage. Arrays rejoin after the id-pair dedup, once per
    # surviving pair.
    prefix = per_doc.select(
        "doc_id",
        "n_tok",
        F.explode(
            F.expr(f"slice(toks, 1, size(toks) - CAST(ceil({t} * size(toks)) AS INT) + 1)")
        ).alias("ptok"),
    )
    a = prefix.select(
        F.col("doc_id").alias("doc_a"), F.col("n_tok").alias("na"), "ptok"
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"), F.col("n_tok").alias("nb"), "ptok"
    )
    cand = (
        a.join(b, "ptok")
        .where(F.col("doc_a") < F.col("doc_b"))
        # length filter: t·|a| ≤ |b| ≤ |a|/t is necessary for J ≥ t
        .where(F.col("nb").cast("double") >= F.lit(t) * F.col("na").cast("double"))
        .where(F.col("na").cast("double") >= F.lit(t) * F.col("nb").cast("double"))
        .select("doc_a", "doc_b", "na", "nb")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sets_a = per_doc.select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a")
    )
    sets_b = per_doc.select(
        F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b")
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    verified = (
        cand.join(sets_a, "doc_a")
        .join(sets_b, "doc_b")
        .select("doc_a", "doc_b", inter.alias("inter"), F.col("na"), F.col("nb"))
    ).withColumn(
        "jaccard",
        F.col("inter").cast("double")
        / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
    )
    return (
        verified.where(F.col("jaccard") >= t)
        .select(
            "doc_a", "doc_b", F.col("inter").cast("long").alias("inter"), "jaccard"
        )
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
    )


def q_ext_52_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prefix_jaccard_join(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# ext_129: lexical-diversity profile (TTR, hapax rate, unigram entropy)
# ---------------------------------------------------------------------------


def lexical_diversity(docs: DataFrame) -> DataFrame:
    """Per-source lexical-diversity profile: type-token ratio, hapax
    rate (share of vocabulary seen exactly once), and unigram Shannon
    entropy — the trio that separates template/boilerplate spam (low
    TTR, low entropy: few types repeated) from organic text, and
    machine-generated gibberish (hapax rate → 1) from both. Rounds out
    the text-audit family: ext_115 measures divergence FROM the
    corpus, this measures internal diversity.

    Exactness: entropy needs ln() (1-ulp portable only), so each
    distinct token's contribution uses the ext_106 micro-nat device —
    ln of the correctly-rounded double quotient of two exact bigints
    (t/c), floored to micro-nats, weighted by the exact count c and
    summed as bigints. H = Σ c·⌊10⁶·ln(t/c)⌋ div t micro-nats/token.
    TTR and hapax rate are pure integer ratios.

    Scale: one token explode into a (source × vocabulary) count
    aggregate (map-combinable; the shuffle carries one row per
    distinct (source, token)), per-source totals broadcast back, one
    final per-source rollup. No driver state, no window.
    """
    tf = (
        docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = tf.groupBy("source").agg(F.sum("c").alias("t"))
    return (
        tf.join(F.broadcast(tot), "source")
        .withColumn(
            "h_term",
            F.col("c")
            * F.floor(
                F.log(F.col("t").cast("double") / F.col("c").cast("double"))
                * F.lit(1000000.0)
            ).cast("long"),
        )
        .groupBy("source")
        .agg(
            F.max("t").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum((F.col("c") == 1).cast("long")).alias("n_hapax"),
            F.sum("h_term").alias("h_sum_micro"),
        )
        .withColumn("ttr_milli", F.expr("(1000 * n_types) div n_tokens"))
        .withColumn("hapax_milli", F.expr("(1000 * n_hapax) div n_types"))
        .withColumn("entropy_micro", F.expr("h_sum_micro div n_tokens"))
        .select(
            "source",
            "n_tokens",
            "n_types",
            "n_hapax",
            "ttr_milli",
            "hapax_milli",
            "entropy_micro",
        )
        .orderBy("source")
    )


def q_ext_129_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lexical_diversity(load_table(spark, sf_dir, "documents"))
