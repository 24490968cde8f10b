"""Training-data pipeline operators (EXT suite, round 4): vocabulary
coverage curves, CCNet-style per-language quality bucketing, and
embedding outlier detection.

Like the rest of the EXT suite these go beyond the reference's query
surface (the reference ships raw SQL to SQL Server,
SQL_DATA_INTEGRATION_TOOL.py:273); they are corpus-curation operators
an LLM pretraining pipeline runs at 100 TB, expressed as pure JVM
DataFrame plans — no Python UDFs, no driver-side loops.

Engine-exactness (oracle hashing): floats are either a single
bigint÷bigint IEEE division (coverage ratio), an exact ``percentile``
(bit-identical to DuckDB ``quantile_cont``), or a fixed expression
over doubles that both engines evaluate identically (the squared
centroid distance is quantized to bigint nanos per term BEFORE the
order-sensitive sum, so accumulation order can't flip a bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparketl.io import load_table, spread

# ---------------------------------------------------------------------------
# ext_58: vocabulary coverage curve (top-k token share)
# ---------------------------------------------------------------------------


def vocab_coverage(
    docs: DataFrame, ks: tuple[int, ...] = (100, 1000, 10000)
) -> DataFrame:
    """What fraction of all corpus tokens the top-k vocabulary covers,
    for each k — the curve that sizes a tokenizer's vocab (BPE stops
    earning when the curve flattens).

    One corpus-sized explode feeds a map-side-combinable token count;
    everything after operates on the vocabulary-sized aggregate. The
    top-``max(ks)`` cut is ``orderBy().limit()`` — Spark's distributed
    TakeOrdered, never a global sort — and the only window runs over
    those ≤ max(ks) rows (a fixed constant, not data-sized). Grand
    totals ride in as a broadcast one-row aggregate; the coverage
    ratio is one bigint÷bigint division.
    """
    max_k = max(ks)
    tokens = docs.select(F.explode(F.split("text", " ")).alias("tok")).where(
        F.col("tok") != ""
    )
    counts = tokens.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").alias("total_tokens"),
        F.count(F.lit(1)).alias("distinct_vocab"),
    )
    top = counts.orderBy(F.desc("n"), "tok").limit(max_k)
    # rank window over ≤ max_k rows — constant-bounded by construction.
    # The pmod(n,1)≡0 partition key marks this as an INTENTIONAL single
    # partition (a bare constant would be folded away and the node would
    # print as an accidental no-partition window; bench.py flags those).
    ranked = top.select(
        "n",
        F.row_number()
        .over(
            Window.partitionBy(F.pmod(F.col("n"), F.lit(1))).orderBy(
                F.desc("n"), "tok"
            )
        )
        .alias("r"),
    )
    ks_df = docs.sparkSession.createDataFrame([(k,) for k in ks], "k long")
    covered = (
        ranked.crossJoin(F.broadcast(ks_df))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("r") <= F.col("k"), F.col("n")).otherwise(F.lit(0)))
            .alias("covered_tokens")
        )
    )
    return (
        covered.crossJoin(F.broadcast(totals))
        .select(
            "k",
            "covered_tokens",
            "total_tokens",
            "distinct_vocab",
            (
                F.col("covered_tokens").cast("double")
                / F.col("total_tokens").cast("double")
            ).alias("coverage"),
        )
        .orderBy("k")
    )


def q_ext_58_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_coverage(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# ext_59: CCNet-style per-language quality buckets
# ---------------------------------------------------------------------------


def quality_buckets(docs: DataFrame) -> DataFrame:
    """Split each language's documents into head/middle/tail thirds by
    corpus-LM fluency — the CCNet bucketing that decides which slice of
    a crawl is worth training on.

    Reuses :func:`sparketl.operators.textmine.lm_doc_score` (one
    corpus scan) for the per-document score, then: per-language 33/67
    percentile thresholds via the MSD radix selection in
    `operators/quantiles.py` (r6: the former exact ``percentile``
    buffered every doc score per language — an OOM once a language is
    billions of docs; the radix path is map-combinable counts with
    bounded per-task state and reproduces ``percentile`` ≡ DuckDB
    ``quantile_cont`` bit-for-bit) — broadcast back as a
    |languages|-row table, a codegen'd comparison to assign buckets,
    and a segment-sized rollup. Boundary ties land in the better
    bucket. The scored frame is checkpointed once so the digit passes
    don't re-run the LM-score join.
    """
    from sparketl.operators.quantiles import exact_group_quantiles
    from sparketl.operators.textmine import lm_doc_score

    scores = lm_doc_score(docs).select("doc_id", "n_trigrams", "mean_p")
    scored = scores.join(docs.select("doc_id", "lang"), "doc_id").localCheckpoint(
        eager=False
    )
    th = exact_group_quantiles(
        scored, ["lang"], "mean_p", [0.67, 0.33]
    ).select(
        "lang",
        F.col("qs")[0].alias("t_head"),
        F.col("qs")[1].alias("t_mid"),
    )
    bucket = (
        F.when(F.col("mean_p") > F.col("t_head"), F.lit("head"))
        .when(F.col("mean_p") > F.col("t_mid"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.join(F.broadcast(th), "lang")
        .select("lang", bucket.alias("bucket"), "n_trigrams")
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_trigrams").alias("sum_trigrams"),
        )
        .orderBy("lang", "bucket")
    )


def q_ext_59_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_buckets(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# ext_60: embedding outliers (distance to own label centroid)
# ---------------------------------------------------------------------------


def embedding_outliers(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-label outlier audit: vectors whose squared distance to their
    own label centroid exceeds the label's p99 — the mislabeled-example
    / embedding-drift detector run before training on labeled data.

    Centroids come from :func:`sparketl.operators.similarity.
    label_centroids` (sorted-fold mean — engine-exact); they are
    |labels|×dim rows, so the join back to the exploded components is a
    broadcast. Each squared-difference term is quantized to bigint
    nanos BEFORE the per-vector sum, making the distance independent of
    accumulation order (a raw double sum would hash-mismatch on
    partitioning alone); the p99 threshold comes from the MSD radix
    selection in `operators/quantiles.py` (r6: bounded per-task state
    instead of percentile()'s per-label whole-column buffer, same
    doubles bit-for-bit). Nothing here sorts or collects the corpus;
    the per-vector distance table is checkpointed once and shared by
    the threshold passes and the final outlier count.
    """
    from sparketl.operators.similarity import label_centroids

    cent = label_centroids(emb, vec_col=vec_col)
    e = spread(emb).select(
        "vec_id", "label", F.posexplode(vec_col).alias("pos", "v")
    )
    term_nano = F.floor(
        (F.col("v").cast("double") - F.col("mean_v"))
        * (F.col("v").cast("double") - F.col("mean_v"))
        * F.lit(1e9)
    ).cast("long")
    d2 = (
        e.join(F.broadcast(cent.select("label", "pos", "mean_v")), ["label", "pos"])
        .select("vec_id", "label", term_nano.alias("term_nano"))
        .groupBy("vec_id", "label")
        .agg(F.sum("term_nano").alias("d2_nano"))
        .localCheckpoint(eager=False)
    )
    from sparketl.operators.quantiles import exact_group_quantiles

    th = exact_group_quantiles(
        d2, ["label"], "d2_nano", [0.99], value_kind="bigint"
    ).select("label", F.col("qs")[0].alias("p99_d2_nano"))
    return (
        d2.join(F.broadcast(th), "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(
                (F.col("d2_nano").cast("double") > F.col("p99_d2_nano")).cast("long")
            ).alias("n_outliers"),
            F.max("d2_nano").alias("max_d2_nano"),
            F.first("p99_d2_nano").alias("p99_d2_nano"),
        )
        .orderBy("label")
    )


def q_ext_60_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_outliers(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# ext_62: per-source document cap (domain cap)
# ---------------------------------------------------------------------------


def source_cap(docs: DataFrame, cap: int = 50, spread_buckets: int = 64) -> DataFrame:
    """Cap every source at its ``cap`` longest documents — the domain
    cap a crawl pipeline applies so no single site dominates the mix.

    Exact two-phase top-N so a hot source never serializes: phase 1
    ranks within (source, doc_id mod B) buckets — B-way parallel even
    for a source holding half the corpus — and keeps ≤ cap per bucket
    (the global top-cap is necessarily a subset of the union of
    per-bucket top-caps). Phase 2 ranks the ≤ B·cap survivors per
    source, a constant-bounded window. Both phases order by
    (n_chars desc, doc_id), so the result is identical to the
    single-window form. The summary keeps the output source-sized."""
    spread_key = F.pmod(F.col("doc_id"), F.lit(spread_buckets))
    w_local = Window.partitionBy("source", spread_key).orderBy(
        F.desc("n_chars"), "doc_id"
    )
    survivors = docs.withColumn("_rnl", F.row_number().over(w_local)).filter(
        F.col("_rnl") <= cap
    )
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    kept = survivors.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= cap
    )
    summary_kept = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
        F.min("n_chars").alias("min_kept_chars"),
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        totals.join(summary_kept, "source")
        .select("source", "n_docs", "n_kept", "kept_chars", "min_kept_chars")
        .orderBy("source")
    )


def q_ext_62_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return source_cap(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# ext_63: end-to-end curation funnel
# ---------------------------------------------------------------------------


def curation_funnel(docs: DataFrame, jaccard_threshold: float = 0.8) -> DataFrame:
    """The whole curation pipeline as one query: raw → quality gates →
    exact dedup → near-dup drop, reporting survivors per stage (the
    funnel chart every dataset card shows).

    Built as ONE DAG, not four pipelines:

    - quality: Gopher boolean gates applied INLINE on the scan (no
      join-back on doc_id) — raw and quality counts come from a single
      conditional aggregate over one corpus scan;
    - exact:   one hash shuffle on text, min-doc_id survivor; the
      exact-survivor subtree is byte-identical in its count branch and
      the near-dup branch, so the exchange is planned once and reused
      (ReusedExchange), not recomputed;
    - near:    trigram-Jaccard pairs ≥ threshold among survivors, drop
               the larger doc_id of each pair. Pairs come from the
               prefix-filter join (AllPairs/PPJoin,
               textmine.prefix_jaccard_join): EXACT output at this
               high threshold with candidates bounded by rare-shingle
               document frequency — no Σdf(shingle)² blowup anywhere
               in the funnel. The quadratic shingle self-join survives
               only as the DuckDB oracle twin (and ext_02's baseline);
               at 100 TB each stage additionally checkpoints survivors
               to storage instead of leaning on exchange reuse.
    """
    from sparketl.operators.corpus import gopher_gate_exprs
    from sparketl.operators.dedup import exact_dedup
    from sparketl.operators.textmine import prefix_jaccard_join

    flag_len, flag_wl, flag_stop = gopher_gate_exprs()
    base = docs.select(
        "doc_id",
        "text",
        "n_chars",
        (flag_len & flag_wl & flag_stop).alias("passes"),
    )
    quality = base.filter(F.col("passes")).drop("passes")
    exact = exact_dedup(quality, ["text"], "doc_id")
    dup_b = (
        prefix_jaccard_join(exact, threshold=jaccard_threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    near = exact.join(dup_b, "doc_id", "left_anti")

    # raw + quality from ONE corpus scan: conditional aggregate on the gate
    stage01 = base.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).alias("c_raw"),
        F.sum(F.col("passes").cast("long")).alias("n_q"),
        F.coalesce(
            F.sum(F.when(F.col("passes"), F.col("n_chars")).otherwise(F.lit(0))),
            F.lit(0),
        ).alias("c_q"),
    ).select(
        F.expr(
            "stack(2, 0, 'raw', n_raw, c_raw, 1, 'quality', n_q, c_q)"
            " AS (stage_idx, stage, n_docs, n_chars)"
        )
    )

    def stage(idx: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).alias("n_chars"),
        ).select(
            F.lit(idx).alias("stage_idx"),
            F.lit(name).alias("stage"),
            "n_docs",
            "n_chars",
        )

    return (
        stage01.unionAll(stage(2, "exact_dedup", exact))
        .unionAll(stage(3, "near_dedup", near))
        .orderBy("stage_idx")
    )


def q_ext_63_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation_funnel(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# ext_64: per-source dataset card
# ---------------------------------------------------------------------------


def dataset_card(docs: DataFrame) -> DataFrame:
    """The dataset-card table: one row per source with the numbers a
    data curator publishes — volume (docs/tokens/chars), language
    makeup (distinct langs + dominant lang), exact-duplicate rate, and
    quality-gate pass rate.

    One corpus scan feeds a single per-(source,lang) aggregate (the
    finest grain any column needs); everything else derives from that
    vocabulary-sized table: per-source rollup, a source-partitioned
    window for the dominant language, and fixed bigint÷bigint
    divisions for the rates. Duplicate counting uses per-(source,text)
    counts folded map-side — no distinct-over-corpus second shuffle.
    """
    from sparketl.operators.corpus import gopher_gate_exprs

    flag_len, flag_wl, flag_stop = gopher_gate_exprs()
    base = docs.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_tokens"),
        (flag_len & flag_wl & flag_stop).cast("long").alias("passes"),
        "text",
    )
    # exact-dup count per source: Σ (copies-1) over per-text groups
    per_text = base.groupBy("source", "text").agg(
        F.count(F.lit(1)).alias("n_copies")
    )
    dups = per_text.groupBy("source").agg(
        F.sum(F.col("n_copies") - F.lit(1)).alias("n_dup_docs")
    )
    per_src_lang = base.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.sum("passes").alias("n_pass"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("n_docs"), "lang")
    top_lang = (
        per_src_lang.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    per_src = per_src_lang.groupBy("source").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.sum("n_pass").alias("n_pass"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    return (
        per_src.join(top_lang, "source")
        .join(dups, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_chars",
            "n_langs",
            "top_lang",
            "n_dup_docs",
            (
                F.col("n_dup_docs").cast("double") / F.col("n_docs").cast("double")
            ).alias("dup_rate"),
            "n_pass",
            (F.col("n_pass").cast("double") / F.col("n_docs").cast("double")).alias(
                "pass_rate"
            ),
        )
        .orderBy("source")
    )


def q_ext_64_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dataset_card(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# ext_65: incremental ingest dedup (new batch vs historical registry)
# ---------------------------------------------------------------------------


def incremental_dedup(batch: DataFrame, registry: DataFrame) -> DataFrame:
    """Dedup an incoming batch against the corpus already ingested —
    the per-ingest gate of a continuously fed pipeline: drop batch docs
    whose text already exists in the registry, then dedup what's left
    within the batch itself (first doc_id wins).

    Two anti-join-shaped steps, both shuffling ONLY on the text key
    (at 100 TB you key both sides on xxhash64(text) — 8-byte shuffle
    rows; raw text here keeps the oracle engine-exact): a left_anti
    against the registry's distinct texts, then the min_by exact dedup
    within the survivors. The registry side reduces to its distinct
    text set before the join — the historical corpus never re-shuffles
    its payload columns, just keys."""
    reg_keys = registry.select("text").distinct()
    fresh = batch.join(reg_keys, "text", "left_anti")
    kept = exact_dedup_by_text(fresh)
    return (
        batch.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_batch"))
        .join(
            kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept")),
            "source",
            "left",
        )
        .select(
            "source",
            "n_batch",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("n_batch") - F.coalesce("n_kept", F.lit(0))).alias("n_dropped"),
        )
        .orderBy("source")
    )


def exact_dedup_by_text(df: DataFrame) -> DataFrame:
    from sparketl.operators.dedup import exact_dedup

    return exact_dedup(df, ["text"], "doc_id")


def q_ext_65_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split the documents fixture by doc_id parity: even ids play the
    already-ingested registry, odd ids the incoming batch."""
    docs = load_table(spark, sf_dir, "documents")
    registry = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    return incremental_dedup(batch, registry)


# ---------------------------------------------------------------------------
# ext_66: temperature-scaled source mixture weights
# ---------------------------------------------------------------------------


def mixture_weights(docs: DataFrame, token_budget: int = 1_000_000_000) -> DataFrame:
    """Sampling weights for combining sources into one training mix,
    with temperature τ=0.5: weight_s ∝ n_s^τ (the standard
    multilingual/data-mixing upweighting of small sources — small
    sources get more than their proportional share, large ones less).
    Also reports the epochs each source would run at a given token
    budget (epochs > 1 ⇒ the source repeats).

    Scale: one map-side-combinable per-source token-count aggregate
    over the corpus; everything downstream operates on the handful of
    source rows. Engine-exactness: τ=0.5 is computed with ``sqrt``
    (IEEE-correctly-rounded in both Spark and DuckDB, unlike ``pow``),
    each sqrt is quantized to bigint micro-units BEFORE the
    order-sensitive normalization sum, and the final weight is a
    single bigint÷bigint double division — bit-identical across
    engines regardless of aggregation order.
    """
    per_src = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    scaled = per_src.withColumn(
        "w_micro",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * F.lit(1_000_000.0)).cast(
            "long"
        ),
    )
    total = scaled.agg(F.sum("w_micro").alias("w_total"))
    return (
        scaled.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            (F.col("w_micro").cast("double") / F.col("w_total").cast("double")).alias(
                "weight"
            ),
            (
                F.col("w_micro").cast("double")
                / F.col("w_total").cast("double")
                * F.lit(float(token_budget))
                / F.col("n_tokens").cast("double")
            ).alias("epochs"),
        )
        .orderBy("source")
    )


def q_ext_66_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_weights(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# ext_67: portable deterministic train/val/test split
# ---------------------------------------------------------------------------


def hash_split_counts(docs: DataFrame) -> DataFrame:
    """Assign every document to train/val/test by the first hex byte of
    ``md5(doc_id)`` — the split a reproducible pipeline needs: stable
    across engines, runs, partitionings and cluster sizes (md5 of the
    decimal id string is identical everywhere, unlike xxhash64/rand).
    Thresholds on the first two hex chars: < 'cc' → train (204/256 ≈
    79.7%), < 'e6' → val (26/256 ≈ 10.2%), else test.

    Scale: the split tag is a scan-speed map expression (one md5 per
    row, codegen'd); the output is a tiny (source × split) count
    aggregate — all-bigint, zero float risk. The same tag expression
    filters the actual split members without ever materializing an
    assignment table.
    """
    tag = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(tag < "cc", F.lit("train"))
        .when(tag < "e6", F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select("source", split.alias("split"), F.size(F.split("text", " ")).alias("n_tok"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .orderBy("source", "split")
    )


def q_ext_67_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hash_split_counts(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# ext_68: corpus drift between snapshots (total-variation distance)
# ---------------------------------------------------------------------------


def tv_drift(snap_a: DataFrame, snap_b: DataFrame, bucket_tokens: int = 32) -> DataFrame:
    """Per-source distribution drift between two corpus snapshots:
    total-variation distance ½·Σ|p_a − p_b| over document-length
    buckets — the monitoring gate that catches a scraper or filter
    change shifting the corpus shape between ingest runs.

    TV is preferred to PSI/KL here for engine-exactness: it needs no
    logarithm (``ln`` is only 1-ulp-accurate and differs across
    libms), so every step is exact IEEE arithmetic on bigint-ratio
    doubles, and each |p_a − p_b| is floored to bigint nano-units
    before the order-sensitive sum. Output is pure bigints.

    Scale: two map-side-combinable (source, bucket) counts, a
    source-keyed merge of two small aggregates, and a per-source fold
    over ≤ a few dozen buckets — nothing data-sized shuffles twice.
    """

    def hist(df: DataFrame, n_col: str) -> DataFrame:
        # explicit floor: Spark's long cast truncates but DuckDB's
        # rounds, so the bucket id must be floored in both engines
        b = F.floor(F.size(F.split("text", " ")) / F.lit(bucket_tokens)).cast("long")
        return df.select("source", b.alias("bucket")).groupBy(
            "source", "bucket"
        ).agg(F.count(F.lit(1)).alias(n_col))

    ha, hb = hist(snap_a, "n_a"), hist(snap_b, "n_b")
    merged = ha.join(hb, ["source", "bucket"], "full").select(
        "source",
        "bucket",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    totals = merged.groupBy("source").agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    # a source absent from one snapshot has p≡0 there — guard the
    # ratio so t=0 doesn't NULL the row; the half-L1 then reads 0.5
    # (half the mass comparable) with the vanish explicit in n_a/n_b=0
    def p(n: str, t: str):
        return F.when(
            F.col(t) > 0, F.col(n).cast("double") / F.col(t).cast("double")
        ).otherwise(F.lit(0.0))

    terms = merged.join(totals, "source").select(
        "source",
        "n_a",
        "n_b",
        F.floor(F.abs(p("n_a", "t_a") - p("n_b", "t_b")) * F.lit(1_000_000_000.0))
        .cast("long")
        .alias("term_nanos"),
    )
    return (
        terms.groupBy("source")
        .agg(
            F.sum("n_a").cast("long").alias("n_a"),
            F.sum("n_b").cast("long").alias("n_b"),
            # integer div, not /2-then-cast (cast rounding differs)
            F.expr("sum(term_nanos) div 2").alias("tv_half_nanos"),
        )
        .orderBy("source")
    )


def q_ext_68_tv_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot twins from the fixture, split by an md5 coin so every
    source has documents on BOTH sides (doc_id parity correlates with
    source in the fixture — a parity split would put each source
    entirely in one snapshot and measure nothing but its absence)."""
    docs = load_table(spark, sf_dir, "documents")
    coin = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8"
    return tv_drift(docs.filter(coin), docs.filter(~coin))


# ---------------------------------------------------------------------------
# ext_69: distributed BPE tokenizer training (merge-pair sequence)
# ---------------------------------------------------------------------------


def _bpe_merge_expr(a: str, b: str) -> str:
    """SQL fold that applies one BPE merge (a,b)→ab left-to-right over
    a symbol array — pure higher-order-function JVM code, no UDF. The
    '' sentinel for 'no pending symbol' is safe: symbols come from
    non-empty tokens and merges of them, never the empty string."""
    qa = "'" + a.replace("'", "''") + "'"
    qb = "'" + b.replace("'", "''") + "'"
    qab = "'" + (a + b).replace("'", "''") + "'"
    return f"""
    aggregate(
      s,
      named_struct('out', array()::array<string>, 'prev', ''),
      (acc, x) -> IF(acc.prev = {qa} AND x = {qb},
                     named_struct('out', array_append(acc.out, {qab}), 'prev', ''),
                     IF(acc.prev = '',
                        named_struct('out', acc.out, 'prev', x),
                        named_struct('out', array_append(acc.out, acc.prev),
                                     'prev', x))),
      acc -> IF(acc.prev = '', acc.out, array_append(acc.out, acc.prev))
    )
    """


def bpe_train_merges(
    docs: DataFrame, n_merges: int = 8, min_count: int = 2
) -> DataFrame:
    """Byte-pair-encoding tokenizer training: the sequence of merge
    rules a BPE vocab build learns from the corpus, with each rule's
    pair frequency — the core of training a tokenizer at corpus scale.

    Scale shape (how real distributed BPE trainers work): the ONLY
    corpus-sized operation is the initial word-count aggregate
    (map-side combinable). Every merge iteration then runs on the
    WORD-FREQUENCY table (vocabulary-sized, ~10⁵–10⁷ rows at 100 TB,
    not 10¹⁰): explode adjacent symbol pairs weighted by word count,
    pick the argmax pair (a one-ROW collect per iteration — the same
    legitimate driver-side decision as IVF centroid training), and
    apply the merge with a higher-order-function fold (no UDF). Ties
    break deterministically on (count DESC, left, right).

    FULL oracle since r11: the fixed-step loop unrolls as a DuckDB
    CTE chain (pair-count → argmax → delimiter-wrapped replace() as
    the merge fold — see ext_queries._bpe_train_ctes); pytest
    additionally proves the merge sequence equals a pure-Python
    reference BPE."""
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # eager localCheckpoint instead of cache+count+unpersist: one call
    # materializes the vocab table AND truncates lineage (the merge
    # folds would otherwise nest one level deeper per iteration),
    # dropping an explicit count job per merge step
    # char split: Spark's split keeps a TRAILING EMPTY element for the
    # zero-width (?!^) pattern at end-of-string (['a','b','']), which
    # would inject phantom ('lastchar','') pairs into the counts — at
    # sf0.1 such a pair actually outcounts the best real pair and also
    # violates the merge fold's ''-sentinel (r11 bug, exposed by the
    # new full oracle). filter() drops it; real symbols are never ''.
    chars = F.expr("filter(split(w, '(?!^)'), x -> x != '')")
    syms = words.select("n", chars.alias("s")).localCheckpoint()
    out_schema = "step int, left string, right string, merged string, pair_count long"
    merges: list[tuple] = []
    for step in range(1, n_merges + 1):
        pairs = (
            syms.select(
                "n",
                F.explode(
                    F.expr(
                        "IF(size(s) < 2, array()::array<struct<a:string,b:string>>, "
                        "transform(sequence(0, size(s) - 2), "
                        "i -> named_struct('a', s[i], 'b', s[i+1])))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
        if not top or top[0]["cnt"] < min_count:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((step, a, b, a + b, cnt))
        syms = syms.withColumn("s", F.expr(_bpe_merge_expr(a, b))).localCheckpoint()
    return spark.createDataFrame(merges, out_schema)


def q_ext_69_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_train_merges(load_table(spark, sf_dir, "documents"), n_merges=8)


# ---------------------------------------------------------------------------
# ext_167/ext_168: unigram-LM tokenizer (SentencePiece shape) — the
# second of the two tokenizer families real pipelines train (Kudo
# 2018): seed a substring vocabulary, hard-EM (Viterbi) rounds that
# re-estimate piece frequencies and prune unused pieces, then encode
# with the trained pieces. BPE (ext_69/74) grows a vocab bottom-up by
# merges; unigram starts big and PRUNES top-down under a piece
# language model.
# ---------------------------------------------------------------------------

UNIGRAM_MAX_PIECE = 4  # L: longest candidate piece, in chars
UNIGRAM_SEED_TOP = 24  # multi-char seed pieces kept (by freq desc, piece)
UNIGRAM_SEED_MIN = 2  # min corpus occurrences for a multi-char seed
UNIGRAM_PRUNE_MIN = 2  # EM prune: multi-char pieces below this drop out
UNIGRAM_EM_ROUNDS = 2  # hard-EM (Viterbi) re-estimation rounds
UNIGRAM_UNK_COST = 10**12  # unreachable when every single char is in vocab


def _unigram_pcost(p: str, l: str) -> str:
    """Spark SQL: micro-nat cost of piece w[p-l+1 .. p] under map
    column ``m`` (UNK if absent — unreachable while chars are kept)."""
    return (
        f"coalesce(element_at(m, substring(w, ({p}) - ({l}) + 1, {l})), "
        f"CAST({UNIGRAM_UNK_COST} AS BIGINT))"
    )


def _unigram_chosen_l(p: str) -> str:
    """Spark SQL: the piece length ending the Viterbi path at position
    ``p`` — the SMALLEST l whose edge cost achieves cst[p] (the
    deterministic tie rule both engines share)."""
    L = UNIGRAM_MAX_PIECE
    return (
        f"element_at(filter(transform(sequence(1, least({L}, {p})), "
        f"l -> IF(element_at(cst, ({p}) - l + 1) + {_unigram_pcost(p, 'l')} "
        f"= element_at(cst, ({p}) + 1), l, 0)), x -> x > 0), 1)"
    )


# forward Viterbi costs: cst[i+1] = min total micro-nat cost of
# segmenting the prefix w[1..i] (cst[1] = 0). One JVM-side fold per
# word — no UDF, no shuffle, whole-stage codegen.
_UNIGRAM_CST = (
    "aggregate(sequence(1, length(w)), array(CAST(0 AS BIGINT)), "
    "(acc, i) -> array_append(acc, array_min(transform("
    f"sequence(1, least({UNIGRAM_MAX_PIECE}, i)), "
    f"l -> element_at(acc, i - l + 1) + {_unigram_pcost('i', 'l')}))))"
)
_UNIGRAM_POS = "(length(w) - coalesce(aggregate(ls, 0, (x, y) -> x + y), 0))"
# backward reconstruction: piece lengths popped off the end of the
# word, each the cost-achieving edge at the current position
_UNIGRAM_BL = (
    "aggregate(sequence(1, length(w)), CAST(array() AS array<int>), "
    f"(ls, s) -> IF({_UNIGRAM_POS} = 0, ls, "
    f"array_append(ls, {_unigram_chosen_l(_UNIGRAM_POS)})))"
)
# back-lens -> piece strings (backward order; counting is order-free)
_UNIGRAM_PIECES = (
    "transform(sequence(1, size(bl)), k -> "
    "substring(w, length(w) - aggregate(slice(bl, 1, k), 0, (x, y) -> x + y) + 1, "
    "element_at(bl, k)))"
)
# every substring of w with length 1..L, one element per occurrence
_UNIGRAM_SUBS = (
    "flatten(transform(sequence(1, length(w)), "
    f"i -> transform(sequence(i, least(i + {UNIGRAM_MAX_PIECE} - 1, length(w))), "
    "j -> substring(w, i, j - i + 1))))"
)


def _unigram_cost_micro(vocab: DataFrame) -> DataFrame:
    """Piece cost = ⌊10⁶·ln(total/freq)⌋ — the single-ln micro-nat
    device of ext_106/129/149: floats enter through exactly one ln()
    of an exact integer quotient, floored to bigint, so both engines
    agree bit-for-bit."""
    total = vocab.agg(F.sum("freq").alias("tot"))
    return vocab.crossJoin(F.broadcast(total)).select(
        "piece",
        "freq",
        F.expr(
            "CAST(FLOOR(ln(CAST(tot AS DOUBLE) / CAST(freq AS DOUBLE))"
            " * 1000000.0) AS BIGINT)"
        ).alias("cost_micro"),
    )


def _unigram_viterbi_counts(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """Hard E-step: Viterbi-segment every DISTINCT word under the
    current piece costs and return occurrence-weighted piece counts.
    The piece table rides as a broadcast one-row map — the same few-MB
    vocabulary a production tokenizer worker holds — so segmentation
    is map-only over the distinct-word table (vocabulary-sized,
    ~10⁵–10⁷ rows at 100 TB, never the corpus)."""
    m = vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct("piece", "cost_micro"))
        ).alias("m")
    )
    return (
        words.crossJoin(F.broadcast(m))
        .withColumn("cst", F.expr(_UNIGRAM_CST))
        .withColumn("bl", F.expr(_UNIGRAM_BL))
        .select("n", F.explode(F.expr(_UNIGRAM_PIECES)).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("n").alias("used"))
    )


def unigram_lm_train(docs: DataFrame) -> DataFrame:
    """Unigram-LM tokenizer training (SentencePiece shape, hard-EM
    variant): seed = all substrings up to ``UNIGRAM_MAX_PIECE`` chars
    (every single char kept unconditionally so segmentation is total;
    multi-char pieces need ``UNIGRAM_SEED_MIN`` occurrences and only
    the top ``UNIGRAM_SEED_TOP`` by (freq DESC, piece) survive), then
    ``UNIGRAM_EM_ROUNDS`` Viterbi-EM rounds: E-step re-segments every
    distinct word under the current piece costs (min total cost;
    ties choose the shortest final piece — a deterministic rule both
    engines replay identically), M-step re-estimates piece frequency
    from occurrence-weighted Viterbi usage, drops multi-char pieces
    used fewer than ``UNIGRAM_PRUNE_MIN`` times, clamps never-used
    chars to freq 1, and recomputes costs.

    Integer-exact: piece costs are micro-nats via one floored ln() of
    an exact integer quotient (the ext_106/149 device); the DP then
    runs entirely in bigint, so Viterbi paths — not just costs — are
    engine-portable.

    Scale shape: the ONLY corpus-sized op is the initial word count
    (map-combinable). Seeding, EM and the output are vocabulary-sized;
    each E-step is a broadcast-map fold over distinct words (no
    shuffle beyond the piece-count aggregate). Mirrors how real
    distributed SentencePiece training sharades the corpus: word
    frequencies in, piece table out.

    The reference has no tokenizer surface (every query ships to SQL
    Server, tool:273); [EXT] LLM-pipeline suite, the BPE (ext_69)
    sibling."""
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)  # consumed once per EM round
    )
    subs = (
        words.select("n", F.explode(F.expr(_UNIGRAM_SUBS)).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("n").alias("freq"))
    )
    chars0 = subs.filter(F.length("piece") == 1)
    # top-V seed selection as TakeOrderedAndProject (no global window)
    multi0 = (
        subs.filter(
            (F.length("piece") >= 2) & (F.col("freq") >= UNIGRAM_SEED_MIN)
        )
        .orderBy(F.desc("freq"), "piece")
        .limit(UNIGRAM_SEED_TOP)
    )
    vocab = _unigram_cost_micro(chars0.unionByName(multi0)).localCheckpoint(
        eager=True
    )
    for _ in range(UNIGRAM_EM_ROUNDS):
        used = _unigram_viterbi_counts(words, vocab)
        multi = (
            used.filter(F.length("piece") >= 2)
            .filter(F.col("used") >= UNIGRAM_PRUNE_MIN)
            .select("piece", F.col("used").alias("freq"))
        )
        chars = (
            vocab.filter(F.length("piece") == 1)
            .select("piece")
            .join(used, "piece", "left")
            .select(
                "piece",
                F.greatest(F.coalesce("used", F.lit(0)), F.lit(1)).alias(
                    "freq"
                ),
            )
        )
        vocab = _unigram_cost_micro(chars.unionByName(multi)).localCheckpoint(
            eager=True
        )
    return vocab.select(
        "piece",
        F.length("piece").cast("long").alias("n_chars"),
        "freq",
        "cost_micro",
    ).orderBy(F.desc("freq"), "piece")


def unigram_encode_stats(docs: DataFrame) -> DataFrame:
    """Apply the trained unigram-LM pieces: Viterbi-encode every
    document and report per-doc token/piece/char counts plus the
    compression ratio — the coverage check a pipeline runs before
    committing to a tokenizer. Per-doc piece counts pin the actual
    segmentations (a different Viterbi path changes n_pieces), so the
    oracle hash is segmentation-sensitive.

    Scale: train is vocabulary-sized (see unigram_lm_train); encode
    segments DISTINCT words once under the broadcast piece map, then
    broadcast-joins the per-word piece counts back onto the exploded
    token stream — the corpus-sized work is one explode + one per-doc
    aggregate, both map-combinable/shuffle-light."""
    vocab = unigram_lm_train(docs)
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct("piece", "cost_micro"))
        ).alias("m")
    )
    word_np = (
        words.crossJoin(F.broadcast(m))
        .withColumn("cst", F.expr(_UNIGRAM_CST))
        .withColumn("bl", F.expr(_UNIGRAM_BL))
        .select("w", F.size("bl").cast("long").alias("np"))
    )
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).where(F.col("w") != "")
    return (
        toks.join(F.broadcast(word_np), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("np").alias("n_pieces"),
            F.sum(F.length("w").cast("long")).alias("n_chars"),
        )
        .withColumn(
            "pieces_per_kchar", F.expr("(1000 * n_pieces) div n_chars")
        )
        .orderBy("doc_id")
    )


def q_ext_167_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return unigram_lm_train(load_table(spark, sf_dir, "documents"))


def q_ext_168_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return unigram_encode_stats(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# ext_120: temperature-based source sampling weights (w_s ∝ p_s^α)
# ---------------------------------------------------------------------------


def temperature_mixture(docs: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Temperature-flattened source sampling weights ``w_s ∝ p_s^α``
    — the standard device for upweighting low-resource sources (or
    languages) in a training mixture: α = 1 keeps the natural token
    distribution, α → 0 approaches uniform. Complements ext_66
    (token-budget mixture planning): ext_66 answers "how many tokens
    per source fit the budget", this answers "at what RATE should the
    sampler draw from each source".

    ``alpha`` ∈ {0.5, 0.25} — powers expressible as repeated sqrt,
    which is IEEE correctly-rounded in both engines (a general pow()
    is only 1-ulp portable and would break the oracle hash). p_s^0.25
    is sqrt(sqrt(p_s)).

    Exactness: token counts are exact bigints; each source's
    flattened share is quantized to micro-units BEFORE the normalizing
    sum (a float Σ over sources would be summation-order-dependent),
    so the normalizer and the final ppm weights are exact integer
    arithmetic. ``boost_milli`` = w_s/p_s in milli-units — >1000 means
    the source is upsampled relative to its natural share.

    Scale: one map + one per-source aggregate + two one-row
    broadcasts; the heavy token count is map-combinable.
    """
    if alpha not in (0.5, 0.25):
        raise ValueError("alpha must be 0.5 or 0.25 (repeated-sqrt exact)")
    per = (
        docs.select(
            "source", F.size(F.split("text", " ")).cast("long").alias("nt")
        )
        .groupBy("source")
        .agg(F.sum("nt").alias("t_s"))
    )
    tot = per.agg(F.sum("t_s").alias("t"))
    flat = F.sqrt(F.col("t_s").cast("double") / F.col("t").cast("double"))
    if alpha == 0.25:
        flat = F.sqrt(flat)
    w = per.crossJoin(F.broadcast(tot)).withColumn(
        "sq_micro", F.floor(flat * F.lit(1000000.0)).cast("long")
    )
    z = w.agg(F.sum("sq_micro").alias("z"))
    return (
        w.crossJoin(F.broadcast(z))
        .withColumn("p_ppm", F.expr("(1000000 * t_s) div t"))
        .withColumn("weight_ppm", F.expr("(1000000 * sq_micro) div z"))
        .withColumn("boost_milli", F.expr("(1000 * weight_ppm) div p_ppm"))
        .select(
            "source",
            F.col("t_s").alias("n_tokens"),
            "p_ppm",
            "weight_ppm",
            "boost_milli",
        )
        .orderBy("source")
    )


def q_ext_120_temperature_mixture(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return temperature_mixture(load_table(spark, sf_dir, "documents"))
