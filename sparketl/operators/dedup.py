"""Deduplication operators (EXT-01/02 — SURVEY §2.12).

Four tiers, from exact to fuzzy, all DataFrame-native:

- exact: keyed dedup with deterministic keep-first (window row_number)
- n-gram Jaccard: exact set-similarity on trigram shingles — the
  oracle-checkable ground truth for near-dup detection
- MinHash-LSH: the 100 TB scale path — candidate generation via
  banded min-hashes (explode bands → bucket join), verified against
  exact Jaccard only on candidates; signatures use the portable
  md5-h60 universal family (r9), so the whole pipeline is
  oracle-checkable
- SimHash: 60-bit fingerprints via md5-h60 bit-votes (r9; map-side
  combinable per-bit sums), engine-exact

Scale design: the exact-Jaccard self-join is quadratic in per-shingle
document frequency — fine for correctness at sf0.01, replaced by
LSH banding at scale, where each document lands in O(bands) buckets
and only bucket-mates pair up. Both paths share the shingling code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sparketl.io import load_table, spread

# ---------------------------------------------------------------------------
# EXT-01 — exact dedup with deterministic keep-first semantics.
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, keys: list[str], order_by: str) -> DataFrame:
    """Keep exactly one row per key group — the one with the smallest
    ``order_by`` value (deterministic when ``order_by`` is unique per
    group, unlike dropDuplicates).

    ``min_by(struct(*), order_by)`` instead of a row_number window:
    the aggregate combines map-side, so a pathological hot key (one
    text duplicated millions of times) reduces inside each input
    partition before the shuffle, where the window form would sort the
    whole group in one partition. Measured ~20% faster at sf0.1 even
    without skew; identical output."""
    cols = df.columns
    return (
        df.groupBy(*keys)
        .agg(F.min_by(F.struct(*cols), F.col(order_by)).alias("_r"))
        .select("_r.*")
    )


def q_ext_01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup events on (user_id, event_type), keeping the earliest
    event_id; report the kept id and the group size."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("kept_event_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return counts.orderBy("user_id", "event_type")


def q_ext_01_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup over documents (hash-groupBy formulation):
    one surviving doc_id per distinct text."""
    d = load_table(spark, sf_dir, "documents")
    kept = exact_dedup(d, ["text"], "doc_id")
    return kept.select("doc_id", "lang", "source", "n_chars").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Shingling shared by Jaccard / MinHash.
# ---------------------------------------------------------------------------


def shingles(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, *keep, sh: array<string>) — distinct word n-gram
    shingles. Documents with fewer than ``n`` tokens are dropped (no
    shingle). ``keep`` carries extra columns through (e.g. a
    train/eval flag) so callers can shingle a corpus in ONE scan and
    split afterwards."""
    toks = F.split(F.col(text_col), " ")
    df = (
        spread(docs)
        .select("doc_id", *keep, toks.alias("toks"))
        .filter(F.size("toks") >= n)
    )
    parts = ", ".join(f"toks[i+{k}]" for k in range(n))
    return df.select(
        "doc_id",
        *keep,
        F.expr(
            f"array_distinct(transform(sequence(0, size(toks)-{n}), "
            f"i -> concat_ws(' ', {parts})))"
        ).alias("sh"),
    )


# ---------------------------------------------------------------------------
# EXT-02a — exact n-gram Jaccard near-dup pairs (oracle-checkable).
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, n: int = 3
) -> DataFrame:
    """All document pairs with trigram-shingle Jaccard ≥ threshold.

    Plan: explode shingles → self equi-join on shingle (this is the
    only shuffle; its cost is Σ df(shingle)²) → count common → join
    per-doc sizes (broadcast-sized aggregate) → |A∩B| / (|A|+|B|-|A∩B|).
    """
    # eager localCheckpoint, not cache(): the pin feeds sizes + the
    # exploded self-join within this one plan and must not outlive it
    # in the session CacheManager (r10 advisor finding); explode_outer
    # (≡ explode on the non-empty shingle arrays) avoids the
    # InferFiltersFromGenerate re-evaluation on top of the pin
    sh = shingles(docs, n=n).localCheckpoint(eager=True)
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    tok = sh.select("doc_id", F.explode_outer("sh").alias("tok"))
    a = tok.alias("a")
    b = tok.alias("b")
    common = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        common.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def q_ext_02_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, threshold=0.5).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# EXT-02b — MinHash + LSH banding: the scale path.
# Signatures use the portable md5-h60 universal family (phash.py), so
# both engines compute them bit-for-bit and the candidate set gets a
# FULL DuckDB oracle (r9 upgrade; the earlier seeded-xxhash64 form was
# engine-specific → rows-only). pytest still asserts the candidate
# set is a superset of the exact-Jaccard pairs.
# ---------------------------------------------------------------------------


def minhash_signatures(sh: DataFrame, num_hashes: int = 32) -> DataFrame:
    """(doc_id, sig: array<bigint>) — per seed i, min over shingles of
    g_i(h60(s)) = (a_i·h60(s) + b_i) mod 2^60.

    Formulation: explode shingles, md5-hash each ONCE, then
    ``num_hashes`` map-combinable ``min`` aggregates — the simhash
    lesson (one hash per token + plain aggregate columns stays inside
    whole-stage codegen; a per-seed array fold recomputes the hash per
    seed). The shuffle carries ``num_hashes`` longs per document after
    partial aggregation. The (a_i, b_i) scrambles are shared integer
    literals with the DuckDB oracle, so signatures agree
    engine-for-engine (see ``phash.h60_scrambles``).

    The explode is ``explode_outer`` (r10): exploding a COMPUTED
    array with plain ``explode`` triggers InferFiltersFromGenerate —
    Spark infers ``size(sh) > 0`` and filter-pushdown inlines the
    whole shingle transform below the exchange, re-evaluating it once
    in the pushed filter and again in the projection, pinned to the
    single-task scan stage at fixture scale. ``explode_outer`` admits
    no such inference, and since ``shingles`` guarantees non-empty
    arrays (it drops docs with < n tokens) the two are row-for-row
    identical — so the r9 pin (cache, then localCheckpoint) that
    existed only to block that pushdown is GONE: no materialization,
    no CacheManager entry, one evaluation, full scan parallelism."""
    from sparketl.operators.phash import g60_expr, h60, h60_scrambles

    tok = sh.select("doc_id", F.explode_outer("sh").alias("s")).withColumn(
        "h", h60(F.col("s"))
    )
    scr = h60_scrambles(num_hashes)
    agg = tok.groupBy("doc_id").agg(
        *[
            F.min(F.expr(g60_expr("h", a, b))).alias(f"m{i}")
            for i, (a, b) in enumerate(scr)
        ]
    )
    return agg.select(
        "doc_id",
        F.array(*[f"m{i}" for i in range(num_hashes)]).alias("sig"),
    )


def banded_signatures(
    docs: DataFrame, num_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """(doc_id, band, bucket) LSH band table — the artifact an
    incremental pipeline PERSISTS between ingest batches (bands per
    doc, not pairs), so a new batch only ever band-joins against it.
    The bucket is the h60 of the band's signature slice rendered as a
    comma-joined decimal string — portable across engines, 8 bytes of
    shuffle payload per band."""
    from sparketl.operators.phash import h60_sql_spark

    rows_per_band = num_hashes // bands
    sig = minhash_signatures(shingles(docs), num_hashes)
    bucket = h60_sql_spark(
        f"concat_ws(',', slice(sig, b*{rows_per_band}+1, {rows_per_band}))"
    )
    return sig.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"named_struct('band', b, 'bucket', {bucket}))"
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def minhash_lsh_candidates(
    docs: DataFrame, num_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing ≥1 LSH band bucket.

    Each doc emits ``bands`` (band_id, bucket_hash) keys; the only
    shuffle is the groupBy on those keys. Bucket sizes stay small when
    rows/band ≥ 4, so the within-bucket pairing is cheap.
    """
    banded = banded_signatures(docs, num_hashes, bands)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def q_ext_02_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_candidates(d).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# EXT-02c — SimHash 64-bit fingerprints: pure map-side array fold.
# ---------------------------------------------------------------------------


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — sign-aggregated bit votes of token hashes:
    a 60-BIT fingerprint over the portable md5-h60 domain (r9; the
    64-bit xxhash64 form was engine-specific → rows-only — the h60
    hash gives every bit vote an exact DuckDB twin, so the
    fingerprints hash-match bit for bit).

    Formulation: explode tokens, hash each ONCE, then 60 per-bit vote
    sums as plain aggregate columns — all inside whole-stage codegen
    with map-side partial aggregation, so the shuffle carries only 60
    longs per document. (A single nested array-fold expression is
    semantically identical but falls out of codegen and recomputes
    the hash per bit — ~80× slower measured.) The fingerprint
    reassembles as Σ 2^i over positive votes — distinct powers, so
    integer addition ≡ bitwise OR and both engines agree exactly
    (ties: a zero vote sum leaves the bit 0).
    """
    from sparketl.operators.phash import h60

    tok = spread(docs).select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).withColumn("h", h60(F.col("tok")))
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(shiftright(h, {i}) & 1L) = 1L"), 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(60)
        ]
    )
    fingerprint = sum(
        [
            F.expr(f"CASE WHEN v{i} > 0 THEN shiftleft(1L, {i}) ELSE 0L END")
            for i in range(60)
        ],
        F.lit(0).cast("long"),
    )
    return votes.select("doc_id", fingerprint.alias("simhash"))


def q_ext_02_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return simhash(d).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components over the candidate-pair
# graph → one keeper per duplicate cluster. The step after pairwise
# near-dup detection in every training-data dedup pipeline.
# ---------------------------------------------------------------------------


def dup_clusters(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components by iterative min-label propagation.

    ``pairs`` is an undirected edge list (doc_a, doc_b). Returns
    (doc_id, cluster_id) where cluster_id = min doc_id reachable.
    Converges in O(diameter) rounds — near-dup clusters are shallow
    (dozens of docs), so this is a handful of small shuffles; each
    round joins the label table (2 cols) with the edge list, both far
    smaller than the corpus. Driver loop stops at a fixed point
    (count of changed labels == 0).

    Each round's label table is ``localCheckpoint``ed (eager): without
    lineage truncation an iterative fixed point re-embeds every prior
    round's plan (plus the full upstream pair-generation subtree) into
    the next — analysis/codegen cost grows with iteration count and at
    depth ~20 dwarfs execution. The checkpoint stores the tiny 2-column
    label table in executor block storage; on a real cluster with
    flaky executors you would use ``checkpoint()`` to reliable storage
    instead (same plan shape).
    """
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .union(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        # neighbor's current label, then keep the min of (own, neighbors)
        neighbor = (
            edges.join(labels, edges.b == labels.doc_id)
            .select(F.col("a").alias("doc_id"), F.col("cluster_id"))
        )
        new_labels = (
            labels.select("doc_id", "cluster_id")
            .union(neighbor)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonical_docs(labels: DataFrame, quality: DataFrame) -> DataFrame:
    """Per cluster, the member to KEEP: highest quality score, ties →
    smallest doc_id — the 'which copy survives' step a dedup pipeline
    runs after clustering. The label table is 2 columns (tiny next to
    the corpus). Keeper selection is a ``max(struct(quality, -doc_id))``
    aggregate, not a per-cluster sort window: it combines map-side, so
    even a degenerate giant cluster (all docs near-identical) reduces
    inside each input partition instead of serializing one sort."""
    best = F.max(F.struct(F.col("quality"), (-F.col("doc_id")).alias("nid")))
    return (
        labels.join(quality, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            best.alias("_b"),
        )
        .select(
            "cluster_id",
            "n_members",
            (-F.col("_b.nid")).alias("canonical_doc_id"),
            F.col("_b.quality").alias("canonical_quality"),
        )
    )


def q_ext_02_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters (Jaccard ≥ 0.5) reduced to their canonical
    member by quality score."""
    from sparketl.operators.text import quality_score

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, threshold=0.5).select("doc_a", "doc_b")
    labels = dup_clusters(pairs)
    q = quality_score(d).select("doc_id", "quality")
    return canonical_docs(labels, q).orderBy("cluster_id")


def q_ext_02_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster summary of Jaccard≥0.5 near-dup components: per cluster
    the member count and kept (minimum) doc id."""
    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, threshold=0.5).select("doc_a", "doc_b")
    labels = dup_clusters(pairs)
    return (
        labels.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# ext_116: leakage-safe cross-validation folds (fold by dup cluster)
# ---------------------------------------------------------------------------


def leakage_safe_folds(docs: DataFrame, n_folds: int = 5) -> DataFrame:
    """Assign train/eval folds so near-duplicate documents NEVER split
    across folds — the step that keeps a held-out set honest (a
    hash-of-doc_id fold puts one copy of a duplicated page in train and
    its twin in test, and the model "generalizes" by memorizing).

    Unit of assignment is the near-dup CLUSTER (Jaccard ≥ 0.5
    connected components, the ext_02 machinery): fold =
    knuth(cluster_id) mod n_folds, singletons cluster to themselves.
    Scale shape: the only extra work over clustering is a left join of
    the corpus against the 2-column label table and pure bigint fold
    arithmetic; clustering itself is the documented prefix-filter
    pair-gen + O(diameter) min-label propagation.
    """
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    labels = dup_clusters(pairs)
    assigned = (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
    )
    fold = (
        (F.col("cluster_id") * F.lit(2654435761)) % F.lit(4294967296)
    ) % F.lit(n_folds)
    return assigned.select(
        "doc_id", "cluster_id", fold.cast("int").alias("fold")
    ).orderBy("doc_id")


def q_ext_116_leakage_safe_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    return leakage_safe_folds(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# ext_121: sorted-neighborhood ER blocking — the non-hash blocking method
# ---------------------------------------------------------------------------


def sorted_neighborhood_blocking(
    docs: DataFrame,
    window: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """Sorted-neighborhood entity-resolution blocking: sort each
    language's documents by a cheap blocking key (length, doc_id
    tiebreak) and compare each document only against its next
    ``window`` neighbors — the classic alternative to LSH banding
    (ext_02/82) when a meaningful sort key exists. Near-identical
    records have near-identical lengths, so they land adjacent and
    pair up; total candidates are ≤ window·n instead of n²/buckets.

    Verification is exact token-set Jaccard ≥ num/den, evaluated with
    the integer cross-multiplication den·|∩| ≥ num·|∪| (no float
    ratio). Returns per-language blocking accounting: n_candidates,
    n_matched.

    Scale: ONE window sort per language partition (all ``window``
    leads ride the same sort — they are emitted as a struct array and
    exploded, not one window pass per offset), then a map-side
    verify + aggregate. Skew note: partitioning by language
    concentrates a monolingual corpus; at scale the blocking key
    should extend to (lang, length-band) which this sort order
    already induces — split the window at band boundaries to
    parallelize further.
    """
    toks = docs.select(
        "lang",
        "doc_id",
        "n_chars",
        F.array_distinct(F.split("text", " ")).alias("tk"),
    )
    win = W.partitionBy("lang").orderBy("n_chars", "doc_id")
    # window expressions may not appear inside a generator: compute all
    # leads in one projection (they share the single window sort), then
    # explode the struct array in a second projection
    stepped = toks.select(
        "lang",
        "tk",
        *[
            c
            for j in range(1, window + 1)
            for c in (
                F.lead("doc_id", j).over(win).alias(f"_db{j}"),
                F.lead("tk", j).over(win).alias(f"_tb{j}"),
            )
        ],
    )
    leads = F.array(
        *[
            F.struct(
                F.col(f"_db{j}").alias("doc_b"), F.col(f"_tb{j}").alias("tk_b")
            )
            for j in range(1, window + 1)
        ]
    )
    pairs = (
        stepped.select("lang", "tk", F.explode(leads).alias("nb"))
        .where(F.col("nb.doc_b").isNotNull())
        .select("lang", "tk", F.col("nb.tk_b").alias("tk_b"))
    )
    inter = F.size(F.array_intersect("tk", "tk_b"))
    uni = F.size("tk") + F.size("tk_b") - inter
    return (
        pairs.withColumn(
            "m",
            (F.lit(threshold_den) * inter >= F.lit(threshold_num) * uni).cast(
                "long"
            ),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum("m").alias("n_matched"),
        )
        .orderBy("lang")
    )


def q_ext_121_sorted_neighborhood(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return sorted_neighborhood_blocking(load_table(spark, sf_dir, "documents"))
