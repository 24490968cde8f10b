"""Distributed EXACT quantiles with bounded per-task state.

Spark's ``percentile()`` is an ObjectHashAggregate whose buffer holds
every value of the group — exact, but O(group) memory in ONE
aggregation buffer, which at 100 TB (billions of rows per group) is an
executor OOM. This module computes the SAME bit-for-bit result with a
most-significant-digit radix selection over a 64-bit order-preserving
key:

1. Map every value to a signed-bigint key whose UNSIGNED order equals
   the value order (doubles via the classic IEEE-754 bit flip, done in
   one Arrow-vectorized pandas UDF; bigints via a sign-bit XOR that is
   pure Spark SQL).
2. Resolve each requested order statistic 16 bits at a time: a
   histogram over the next 16-bit digit is a plain map-combinable
   ``groupBy().count()`` (per-key state = one long), a per-target
   prefix sum over at most 65 536 histogram rows picks the digit
   containing the residual rank, and the next pass descends into that
   digit. At most four passes fully determine the 64-bit key — i.e.
   the exact order statistic — without any task ever holding more
   than 65 536 counters. The descent is ADAPTIVE: once every
   outstanding target's bucket holds ≤ 2^16 rows (its count is known
   from the previous histogram), one finish pass histograms the FULL
   residual key — ≤ 2^16 distinct residuals per target by
   construction, so the state bound is unchanged — and resolves the
   exact key immediately. At petabyte scale that still means 3-4
   passes (bucket counts shrink 65 536× per level); at small scale it
   collapses the tail passes into one job.
3. Interpolate with the exact arithmetic Spark's Percentile uses
   (``(hi - pos) * v_lo + (pos - lo) * v_hi`` with ``pos = p*(n-1)``),
   so results match ``percentile()`` — and therefore DuckDB's
   ``quantile_cont`` — bit for bit.

Scale shape: 4 scans of a two-column projection (vs 1 scan + an
unbounded buffer for ``percentile()``); every shuffle carries counts,
not values; per-task state is bounded by the 2^16 digit alphabet times
the (tiny) number of outstanding targets.
:func:`exact_multi_group_quantiles` fuses INDEPENDENT value columns
into one selection — the per-column keys ride a single scan via
``posexplode`` and share the same four histogram jobs, keyed by a
phase column — so e.g. three quintile-threshold columns cost 4 passes
total, not 12.

Memory note (long-lived sessions): each call pins a handful of lazy
``localCheckpoint`` RDDs (tiny target frames; plus the full
(group, key) projection under ``checkpoint_base=True``). They are
released when the result DataFrame's lineage is garbage-collected, not
eagerly — callers issuing MANY selections inside one long-lived session
should drop result references promptly (or call
``spark.sparkContext._jsc.sc().cleaner()`` hygiene via normal GC) and
reserve ``checkpoint_base`` for genuinely expensive lineages.

The reference has no quantile operator at all
(SQL_DATA_INTEGRATION_TOOL.py:273 delegates to SQL Server); this is the
[EXT] scale path for the exact-percentile family (ext_44/49/85/86/95).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType


# DataType objects, not DDL strings: string types are parsed against an
# active session, which does not exist at import time
@F.pandas_udf(LongType())
def _double_sort_key(v):
    """IEEE-754 double -> signed bigint whose UNSIGNED order equals the
    double order (negatives: flip all bits; positives: flip sign bit).
    -0.0 sorts just below +0.0 and NaN sorts last, matching Java's
    Double ordering used inside Spark's percentile()."""
    import numpy as np
    import pandas as pd

    b = v.to_numpy(dtype="float64").view(np.int64)
    return pd.Series(np.where(b < 0, ~b, b ^ np.int64(-(2**63))))


@F.pandas_udf(DoubleType())
def _double_from_key(k):
    """Inverse of :func:`_double_sort_key`."""
    import numpy as np
    import pandas as pd

    a = k.to_numpy(dtype="int64")
    b = np.where(a < 0, a ^ np.int64(-(2**63)), ~a)
    return pd.Series(b.view(np.float64))


def _key_expr(col: Column, value_kind: str) -> Column:
    """Order-preserving bigint key for ``col`` (null -> null)."""
    if value_kind == "double":
        # the pandas UDF sees nulls as NaN, so mask them back to null
        # AFTER key conversion (when() keeps the Arrow batch vectorized)
        return F.when(col.isNotNull(), _double_sort_key(col))
    return F.when(
        col.isNotNull(), col.cast("long").bitwiseXOR(F.expr("shiftleft(1L, 63)"))
    )


def _msd_descend(
    base: DataFrame, g: list[str], t: DataFrame, *, weighted: bool
) -> DataFrame:
    """Adaptive 16-bit MSD descent shared by the count and weight
    paths.

    ``t`` carries, per outstanding target: the resolved prefix ``_p``
    (bits above the current level), the residual rank ``_r`` inside
    that prefix's bucket, and the bucket's row count / weight ``_bc``.
    Each level either (a) finishes: when EVERY bucket holds ≤ 2^16
    rows (weights ≥ 1, so bucket weight bounds distinct values too), a
    single histogram over the FULL residual key — ≤ 2^16 distinct
    residuals per target by construction — resolves the exact key in
    one job; or (b) descends one more 16-bit digit. The per-task state
    bound (2^16 aggregation cells × outstanding targets) is identical
    in both shapes. The ``_bc`` probe is a one-scalar aggregate over
    the checkpointed, ≤ groups×targets-row ``t`` — driver-appropriate
    at any scale.

    Broadcast honesty at extreme group cardinality: ``t`` is
    groups×targets rows of five longs, broadcast into every level's
    candidate join. At ~10M+ groups that outgrows a broadcast; the
    swap is mechanical — shuffle-join ``base`` and ``t`` on
    ``(*g, prefix)`` instead (both sides already carry the keys) —
    and the per-task state bound is unchanged. Not wired to a knob
    because no current call site groups beyond dimension cardinality;
    a probe-free per-target-conditional variant was also measured
    (r10) and LOST to this shape at fixture scale — AQE stage
    materialization outweighs the two tiny blocking probes.

    Returns ``*g, _rank, _p`` with ``_p`` the full 64-bit key.
    """
    if weighted:
        # cumulative weight first REACHES the rank threshold
        lo_pred = lambda cb, r, c: (cb < r) & (r <= cb + c)  # noqa: E731
        agg = F.sum("b._w")
    else:
        lo_pred = lambda cb, r, c: (cb <= r) & (r < cb + c)  # noqa: E731
        agg = F.count(F.lit(1))

    for s in (32, 16, 0):
        maxc = t.agg(F.max("_bc")).collect()[0][0]
        tb = F.broadcast(t)
        if maxc is None or maxc <= 65536:
            # finish pass: histogram the full residual (low s+16 bits)
            mask = (1 << (s + 16)) - 1
            cand = base.alias("b").join(
                tb.alias("t"),
                [F.col(f"b.{c}") == F.col(f"t.{c}") for c in g]
                + [
                    F.expr(f"shiftrightunsigned(b._k, {s + 16})")
                    == F.col("t._p")
                ],
            )
            h = cand.groupBy(
                *[F.col(f"t.{c}").alias(c) for c in g],
                F.col("t._rank").alias("_rank"),
                F.expr(f"b._k & {mask}L").alias("_f"),
            ).agg(agg.alias("_c"))
            wr = Window.partitionBy(*g, "_rank").orderBy("_f")
            hc = h.withColumn("_cb", F.sum("_c").over(wr) - F.col("_c"))
            return (
                # t is the targets frame (≤ groups×targets rows — the
                # same size class broadcast into cand above), so the
                # join-back is map-side: no exchange on the histogram
                hc.join(tb, [*g, "_rank"])
                .where(lo_pred(F.col("_cb"), F.col("_r"), F.col("_c")))
                .select(
                    *g,
                    "_rank",
                    F.expr(f"shiftleft(_p, {s + 16}) | _f").alias("_p"),
                )
                .localCheckpoint(eager=False)
            )
        cand = base.alias("b").join(
            tb.alias("t"),
            [F.col(f"b.{c}") == F.col(f"t.{c}") for c in g]
            + [
                F.expr(f"shiftrightunsigned(b._k, {s + 16})")
                == F.col("t._p")
            ],
        )
        h = cand.groupBy(
            *[F.col(f"t.{c}").alias(c) for c in g],
            F.col("t._rank").alias("_rank"),
            F.expr(f"shiftrightunsigned(b._k, {s}) & 65535").alias("_f"),
        ).agg(agg.alias("_c"))
        wr = Window.partitionBy(*g, "_rank").orderBy("_f")
        hc = h.withColumn("_cb", F.sum("_c").over(wr) - F.col("_c"))
        t = (
            hc.join(F.broadcast(t.drop("_bc")), [*g, "_rank"])
            .where(lo_pred(F.col("_cb"), F.col("_r"), F.col("_c")))
            .select(
                *g,
                "_rank",
                F.expr("shiftleft(_p, 16) | _f").alias("_p"),
                (F.col("_r") - F.col("_cb")).alias("_r"),
                F.col("_c").alias("_bc"),
            )
            .localCheckpoint(eager=False)
        )
    return t.select(*g, "_rank", "_p")


def _radix_quantiles(
    base: DataFrame,
    g: list[str],
    pct_col: Column,
    n_q: int,
    decode,
) -> DataFrame:
    """Shared MSD radix selection over a keyed base ``(*g, _k)``.

    ``pct_col`` is a Column evaluating (per group row) to the
    array<double> of requested percentiles; ``n_q`` its max length;
    ``decode`` maps the resolved key frame ``(*g, _rank, _p)`` to
    ``(*g, _rank, _val double)``. Returns ``*g, n_values, qs``.
    """
    # ---- pass 1: histogram over the top 16 bits (shared by all targets)
    h0 = base.groupBy(*g, F.expr("shiftrightunsigned(_k, 48)").alias("_f")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    wg = Window.partitionBy(*g)
    wo = wg.orderBy("_f")
    # cum0 is bounded (≤ groups × 65 536 rows) but feeds BOTH the
    # target frame and the pass-1 rank resolve — checkpoint it so the
    # base scan + histogram shuffle + window run once, not twice
    cum0 = h0.select(
        *g,
        "_f",
        "_c",
        (F.sum("_c").over(wo) - F.col("_c")).alias("_cb"),
        F.sum("_c").over(wg).alias("_n"),
    ).localCheckpoint(eager=False)

    # ---- targets: the distinct order statistics the pcts need.
    # pos = p * (n-1) in double arithmetic — exactly Spark's Percentile.
    per_n = cum0.groupBy(*g).agg(F.max("_n").alias("_n"))
    # Every frame below the histogram is TINY (≤ groups × targets
    # rows) but sits on a lineage that re-scans the base; each is
    # referenced 2-3 times downstream, so without truncation the DAG
    # re-executes the base scan O(2^passes) times. A lazy
    # localCheckpoint of each tiny frame pins the pass structure to
    # exactly one base scan per digit pass.
    tq = (
        per_n.select(*g, "_n", F.posexplode(pct_col).alias("_i", "_pct"))
        .select(
            *g,
            "_n",
            "_i",
            (F.col("_pct") * (F.col("_n") - F.lit(1)).cast("double")).alias(
                "_pos"
            ),
        )
        .select(
            *g,
            "_n",
            "_i",
            "_pos",
            F.floor("_pos").cast("long").alias("_lo"),
            F.ceil("_pos").cast("long").alias("_hi"),
        )
        .localCheckpoint(eager=False)
    )
    ranks = tq.select(*g, F.explode(F.array("_lo", "_hi")).alias("_rank")).distinct()

    # resolve the top digit for every target rank (ranks is
    # groups×targets-sized — broadcast so the bounded cum0 histogram
    # is never exchanged)
    t = (
        F.broadcast(ranks).join(cum0.select(*g, "_f", "_c", "_cb"), g)
        .where(
            (F.col("_cb") <= F.col("_rank"))
            & (F.col("_rank") < F.col("_cb") + F.col("_c"))
        )
        .select(
            *g,
            "_rank",
            F.col("_f").alias("_p"),
            (F.col("_rank") - F.col("_cb")).alias("_r"),
            F.col("_c").alias("_bc"),
        )
        .localCheckpoint(eager=False)
    )

    # passes 2-4: adaptive MSD descent (shared with the weighted path)
    t = _msd_descend(base, g, t, weighted=False)

    # _p now IS the full 64-bit key of the order statistic
    vals = decode(t, g)

    # ---- interpolation, exactly as Spark's Percentile.getPercentile
    vlo = vals.select(*g, F.col("_rank").alias("_lo"), F.col("_val").alias("_vlo"))
    vhi = vals.select(*g, F.col("_rank").alias("_hi"), F.col("_val").alias("_vhi"))
    # tq/vlo/vhi are all groups×targets-sized: broadcast joins keep
    # the interpolation exchange-free
    q = (
        tq.join(F.broadcast(vlo), [*g, "_lo"])
        .join(F.broadcast(vhi), [*g, "_hi"])
        .select(
            *g,
            "_n",
            "_i",
            # the _vlo == _vhi branch mirrors Spark's
            # Percentile.getPercentile lowerKey == higherKey
            # short-circuit: NUMERIC equality, so interpolating
            # (-0.0, +0.0) returns -0.0 exactly as percentile() does
            # (plain interpolation would produce +0.0)
            F.when(
                (F.col("_lo") == F.col("_hi"))
                | (F.col("_vlo") == F.col("_vhi")),
                F.col("_vlo"),
            )
            .otherwise(
                (F.col("_hi").cast("double") - F.col("_pos")) * F.col("_vlo")
                + (F.col("_pos") - F.col("_lo").cast("double")) * F.col("_vhi")
            )
            .alias("_q"),
        )
    )
    # pcts is static, so the array assembles from one conditional max
    # per requested percentile — a plain HashAggregate (collect_list
    # would reintroduce an ObjectHashAggregate, the node this module
    # exists to avoid)
    return q.groupBy(*g).agg(
        F.max("_n").alias("n_values"),
        F.array(
            *[
                F.max(F.when(F.col("_i") == i, F.col("_q")))
                for i in range(n_q)
            ]
        ).alias("qs"),
    )


def _decode_for_kind(value_kind: str):
    def decode(t: DataFrame, g: list[str]) -> DataFrame:
        if value_kind == "double":
            return t.select(*g, "_rank", _double_from_key("_p").alias("_val"))
        return t.select(
            *g,
            "_rank",
            F.expr("_p ^ shiftleft(1L, 63)").cast("double").alias("_val"),
        )

    return decode


def exact_group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    pcts: list[float],
    *,
    value_kind: str = "double",
    checkpoint_base: bool = False,
) -> DataFrame:
    """Per-group exact quantiles of ``value_col`` at ``pcts``.

    Returns one row per group: ``group_cols…, n_values bigint (non-null
    count), qs array<double>`` in the order of ``pcts`` — bit-for-bit
    equal to ``percentile(value_col, array(pcts…))``.

    ``value_kind`` is ``'double'`` or ``'bigint'`` (the key transform
    differs). ``checkpoint_base=True`` materializes the (group, key)
    projection once via a lazy localCheckpoint — use when the input is
    itself expensive (e.g. a window/lag derivation) so the four digit
    passes don't recompute it.
    """
    if value_kind not in ("double", "bigint"):
        raise ValueError(f"unsupported value_kind {value_kind!r}")
    g = list(group_cols)
    work = df
    if not g:
        # constant partition key: the histogram windows stay explicitly
        # partitioned (bounded 65 536 rows) instead of tripping the
        # unpartitioned-window warning
        work = df.withColumn("_g", F.lit(0))
        g = ["_g"]

    base = work.select(*g, F.col(value_col).alias("_v")).where(
        F.col("_v").isNotNull()
    )
    if value_kind == "double":
        base = base.select(*g, _double_sort_key("_v").alias("_k"))
    else:
        # sign-bit flip: unsigned order of the key == signed order of _v
        base = base.select(*g, F.expr("_v ^ shiftleft(1L, 63)").alias("_k"))
    if checkpoint_base:
        base = base.localCheckpoint(eager=False)

    pct_arr = F.array(*[F.lit(float(p)) for p in pcts])
    out = _radix_quantiles(
        base, g, pct_arr, len(pcts), _decode_for_kind(value_kind)
    )
    if not group_cols:
        out = out.drop("_g")
    return out


def exact_multi_group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    specs: list[tuple[str, str, list[float]]],
    *,
    checkpoint_base: bool = False,
) -> DataFrame:
    """Exact quantiles for SEVERAL independent value columns in ONE
    radix selection.

    ``specs`` is a list of ``(value_col, value_kind, pcts)``. The
    per-column sort keys ride a single scan of ``df`` (``posexplode``
    over the key array) and all columns share the same four digit
    passes, keyed by a phase column — so k columns cost 4 histogram
    jobs total instead of 4k. Use this when several unrelated columns
    need thresholds over the same input (e.g. RFM's three quintile
    columns).

    Returns one row per group per spec: ``group_cols…, _ph int (index
    into specs), n_values (per-column non-null count), qs
    array<double>`` — each ``(group, _ph=i)`` row bit-for-bit equal to
    ``percentile(specs[i].value_col, specs[i].pcts)``. ``qs`` has
    length ``max(len(pcts))``; trailing elements are null for specs
    with fewer percentiles.
    """
    if not specs:
        raise ValueError("specs must be non-empty")
    for _, kind, _ in specs:
        if kind not in ("double", "bigint"):
            raise ValueError(f"unsupported value_kind {kind!r}")
    g = list(group_cols)
    work = df
    if not g:
        work = df.withColumn("_g", F.lit(0))
        g = ["_g"]

    keys = [_key_expr(F.col(col), kind) for col, kind, _ in specs]
    base = (
        work.select(*g, F.posexplode(F.array(*keys)).alias("_ph", "_k"))
        .where(F.col("_k").isNotNull())
    )
    if checkpoint_base:
        base = base.localCheckpoint(eager=False)

    g2 = [*g, "_ph"]
    # static per-phase percentile arrays via a when-chain on _ph
    n_q = max(len(p) for _, _, p in specs)
    pct_col = F.array(*[F.lit(float(p)) for p in specs[-1][2]])
    for i in range(len(specs) - 2, -1, -1):
        pct_col = F.when(
            F.col("_ph") == i,
            F.array(*[F.lit(float(p)) for p in specs[i][2]]),
        ).otherwise(pct_col)

    dbl_phases = [i for i, (_, kind, _) in enumerate(specs) if kind == "double"]

    def decode(t: DataFrame, gg: list[str]) -> DataFrame:
        big = F.expr("_p ^ shiftleft(1L, 63)").cast("double")
        if not dbl_phases:
            val = big
        elif len(dbl_phases) == len(specs):
            val = _double_from_key("_p")
        else:
            val = F.when(
                F.col("_ph").isin(dbl_phases), _double_from_key("_p")
            ).otherwise(big)
        return t.select(*gg, "_rank", val.alias("_val"))

    out = _radix_quantiles(base, g2, pct_col, n_q, decode)
    if not group_cols:
        out = out.drop("_g")
    return out


def _weighted_base(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    value_kind: str,
    checkpoint_base: bool,
) -> tuple[DataFrame, list[str], bool]:
    """Keyed ``(*g, _k, _w)`` projection for the weighted paths. Rows
    with null values or non-positive weights are dropped (they cannot
    carry quantile mass)."""
    if value_kind not in ("double", "bigint"):
        raise ValueError(f"unsupported value_kind {value_kind!r}")
    g = list(group_cols)
    work = df
    synthetic = False
    if not g:
        work = df.withColumn("_g", F.lit(0))
        g = ["_g"]
        synthetic = True
    base = work.select(
        *g,
        F.col(value_col).alias("_v"),
        F.col(weight_col).cast("long").alias("_w"),
    ).where(F.col("_v").isNotNull() & (F.col("_w") > 0))
    if value_kind == "double":
        base = base.select(*g, _double_sort_key("_v").alias("_k"), "_w")
    else:
        base = base.select(
            *g, F.expr("_v ^ shiftleft(1L, 63)").alias("_k"), "_w"
        )
    if checkpoint_base:
        base = base.localCheckpoint(eager=False)
    return base, g, synthetic


def _weighted_cum0(base: DataFrame, g: list[str]) -> DataFrame:
    """Pass-1 weight histogram over the top 16 bits with per-group
    cumulative-before and total weight."""
    h0 = base.groupBy(*g, F.expr("shiftrightunsigned(_k, 48)").alias("_f")).agg(
        F.sum("_w").alias("_c")
    )
    wg = Window.partitionBy(*g)
    wo = wg.orderBy("_f")
    # bounded (≤ groups × 65 536 rows) and read by both the target
    # frame and the pass-1 resolve — checkpoint to run pass 1 once
    return h0.select(
        *g,
        "_f",
        "_c",
        (F.sum("_c").over(wo) - F.col("_c")).alias("_cb"),
        F.sum("_c").over(wg).alias("_n"),
    ).localCheckpoint(eager=False)


def _weighted_descend(
    base: DataFrame, g: list[str], ranks: DataFrame, cum0: DataFrame
) -> DataFrame:
    """Resolve, per group, the smallest key whose cumulative weight
    reaches each ``_rank`` threshold. Returns ``*g, _rank, _p`` (the
    full 64-bit key). Same adaptive MSD descent as the unweighted
    path, with weight-sum histograms — still map-combinable, still
    ≤ 2^16 aggregation cells per task."""
    t = (
        ranks.join(cum0.select(*g, "_f", "_c", "_cb"), g)
        .where(
            (F.col("_cb") < F.col("_rank"))
            & (F.col("_rank") <= F.col("_cb") + F.col("_c"))
        )
        .select(
            *g,
            "_rank",
            F.col("_f").alias("_p"),
            (F.col("_rank") - F.col("_cb")).alias("_r"),
            F.col("_c").alias("_bc"),
        )
        .localCheckpoint(eager=False)
    )
    return _msd_descend(base, g, t, weighted=True)


def exact_group_weighted_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    pcts: list[tuple[int, int]],
    *,
    value_kind: str = "double",
    checkpoint_base: bool = False,
) -> DataFrame:
    """Per-group exact LOWER weighted quantiles: for each rational
    percentage ``(num, den)`` the smallest value whose cumulative
    weight reaches ``ceil(num*W/den)`` (W = total weight). Thresholds
    are pure bigint arithmetic (``(num*W + den - 1) div den``), so the
    result is engine-exact with no interpolation — a DuckDB
    cumulative-window oracle reproduces it bit for bit.

    Same MSD radix machinery as :func:`exact_group_quantiles`, with
    weight-sum histograms instead of counts — still map-combinable,
    still ≤ 2^16 aggregation cells per task, still four passes.
    Rows with null values or non-positive weights are dropped (they
    cannot carry quantile mass).

    Returns ``group_cols…, total_weight bigint, qs array`` (element
    type matches ``value_kind``), in ``pcts`` order.
    """
    base, g, synthetic = _weighted_base(
        df, group_cols, value_col, weight_col, value_kind, checkpoint_base
    )
    cum0 = _weighted_cum0(base, g)

    per_w = cum0.groupBy(*g).agg(F.max("_n").alias("_n"))
    pct_arr = F.array(
        *[
            F.struct(F.lit(int(num)).alias("num"), F.lit(int(den)).alias("den"))
            for num, den in pcts
        ]
    )
    tq = (
        per_w.select(*g, "_n", F.posexplode(pct_arr).alias("_i", "_pd"))
        .select(
            *g,
            "_n",
            "_i",
            F.expr("(_pd.num * _n + _pd.den - 1) div _pd.den").alias("_kth"),
        )
        .localCheckpoint(eager=False)
    )
    ranks = tq.select(*g, F.col("_kth").alias("_rank")).distinct()

    t = _weighted_descend(base, g, ranks, cum0)
    if value_kind == "double":
        vals = t.select(*g, "_rank", _double_from_key("_p").alias("_val"))
    else:
        vals = t.select(
            *g, "_rank", F.expr("_p ^ shiftleft(1L, 63)").alias("_val")
        )

    q = tq.join(
        vals.select(*g, F.col("_rank").alias("_kth"), "_val"), [*g, "_kth"]
    )
    out = q.groupBy(*g).agg(
        F.max("_n").alias("total_weight"),
        F.array(
            *[
                F.max(F.when(F.col("_i") == i, F.col("_val")))
                for i in range(len(pcts))
            ]
        ).alias("qs"),
    )
    if synthetic:
        out = out.drop("_g")
    return out


def exact_group_weighted_quantiles_interp(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    pcts: list[float],
    *,
    value_kind: str = "double",
    checkpoint_base: bool = False,
) -> DataFrame:
    """Per-group exact INTERPOLATED weighted quantiles — the
    continuous ``quantile_cont`` semantics over the multiset where
    each value repeats ``weight`` times, computed WITHOUT expanding:
    ``pos = p*(W-1)`` (W = total weight), the bracketing expanded-rank
    values come from two cumulative-weight thresholds ``floor(pos)+1``
    and ``ceil(pos)+1`` resolved by the same 4-pass MSD radix descent
    as the lower-quantile path, and interpolation uses the exact
    arithmetic Spark's Percentile / DuckDB's ``quantile_cont`` use
    (``(hi-pos)*v_lo + (pos-lo)*v_hi``) — so the result is bit-for-bit
    what ``percentile()`` / ``quantile_cont`` would return on the
    weight-expanded table, at any scale, with bounded per-task state.

    With all weights 1 this reduces exactly to
    :func:`exact_group_quantiles`. Rows with null values or
    non-positive weights are dropped.

    Returns ``group_cols…, total_weight bigint, qs array<double>`` in
    ``pcts`` order.
    """
    base, g, synthetic = _weighted_base(
        df, group_cols, value_col, weight_col, value_kind, checkpoint_base
    )
    cum0 = _weighted_cum0(base, g)

    per_w = cum0.groupBy(*g).agg(F.max("_n").alias("_n"))
    pct_arr = F.array(*[F.lit(float(p)) for p in pcts])
    # pos over the EXPANDED multiset: p * (W - 1), double arithmetic —
    # exactly what percentile() would compute with n = W rows
    tq = (
        per_w.select(*g, "_n", F.posexplode(pct_arr).alias("_i", "_pct"))
        .select(
            *g,
            "_n",
            "_i",
            (F.col("_pct") * (F.col("_n") - F.lit(1)).cast("double")).alias(
                "_pos"
            ),
        )
        .select(
            *g,
            "_n",
            "_i",
            "_pos",
            F.floor("_pos").cast("long").alias("_lo"),
            F.ceil("_pos").cast("long").alias("_hi"),
        )
        .localCheckpoint(eager=False)
    )
    # expanded 0-based rank r = cumulative-weight threshold r+1
    ranks = (
        tq.select(*g, F.explode(F.array("_lo", "_hi")).alias("_rk"))
        .select(*g, (F.col("_rk") + F.lit(1)).alias("_rank"))
        .distinct()
    )

    t = _weighted_descend(base, g, ranks, cum0)
    if value_kind == "double":
        vals = t.select(*g, "_rank", _double_from_key("_p").alias("_val"))
    else:
        vals = t.select(
            *g,
            "_rank",
            F.expr("_p ^ shiftleft(1L, 63)").cast("double").alias("_val"),
        )

    vlo = vals.select(
        *g, (F.col("_rank") - 1).alias("_lo"), F.col("_val").alias("_vlo")
    )
    vhi = vals.select(
        *g, (F.col("_rank") - 1).alias("_hi"), F.col("_val").alias("_vhi")
    )
    q = (
        tq.join(vlo, [*g, "_lo"])
        .join(vhi, [*g, "_hi"])
        .select(
            *g,
            "_n",
            "_i",
            # numeric-equality short-circuit, matching Percentile /
            # quantile_cont (preserves -0.0 across (-0.0, +0.0) pairs)
            F.when(
                (F.col("_lo") == F.col("_hi"))
                | (F.col("_vlo") == F.col("_vhi")),
                F.col("_vlo"),
            )
            .otherwise(
                (F.col("_hi").cast("double") - F.col("_pos")) * F.col("_vlo")
                + (F.col("_pos") - F.col("_lo").cast("double")) * F.col("_vhi")
            )
            .alias("_q"),
        )
    )
    out = q.groupBy(*g).agg(
        F.max("_n").alias("total_weight"),
        F.array(
            *[
                F.max(F.when(F.col("_i") == i, F.col("_q")))
                for i in range(len(pcts))
            ]
        ).alias("qs"),
    )
    if synthetic:
        out = out.drop("_g")
    return out


# ---------------------------------------------------------------------------
# ext_147: deterministic equi-width histogram quantile sketch (r11)
# ---------------------------------------------------------------------------

HIST_SKETCH_BUCKETS = 256
# (permille, numerator, denominator) — exact-rational targets
HIST_SKETCH_QUANTILES = ((500, 1, 2), (900, 9, 10), (990, 99, 100))


def histogram_quantile_sketch(
    df: DataFrame,
    value_col: str = "l_extendedprice",
    n_buckets: int = HIST_SKETCH_BUCKETS,
    quantiles: tuple = HIST_SKETCH_QUANTILES,
) -> DataFrame:
    """Approximate quantiles from a DETERMINISTIC equi-width histogram
    sketch — the fully oracle-checkable sketch companion to the
    Greenwald-Khanna entry (ext_09, which stays rows-only because GK
    merge state depends on partition layout; this sketch does not).

    Two passes, both map-combinable: (1) exact min/max/count of the
    value in integer cents (the DECIMAL(12,2) cast device, portable
    HALF_UP), broadcast as one row; (2) per-bucket counts with
    ``idx = least(B-1, ((c - lo) * B) div (hi - lo + 1))`` — pure
    integer arithmetic, so bucket assignment is identical in any
    engine and the sketch is ORDER-FREE and MERGEABLE (shard
    histograms sum). The quantile estimate for target rank
    ``r = ceil(q·N)`` (exact rational arithmetic) is the lower edge of
    the first bucket whose running count reaches r; the true value
    lies in [est, est + bucket_width), so the error bound is one
    bucket width — pytest-asserted against the exact percentile.

    100 TB: pass 1 is a 3-value aggregate; pass 2 shuffles ≤ B
    counters per partition (map-side combine); the selection runs on
    the ≤ B-row histogram. No sort, no percentile buffer, no driver
    collect. Output columns are all exact integers (cents / counts),
    so the DuckDB oracle replays the sketch bucket-for-bucket."""
    spark = df.sparkSession
    vals = df.select(
        F.expr(
            f"CAST(CAST({value_col} AS DECIMAL(12,2)) * 100 AS BIGINT)"
        ).alias("c")
    ).where("c IS NOT NULL")
    bounds = vals.agg(
        F.min("c").alias("lo"),
        F.max("c").alias("hi"),
        F.count("c").alias("n"),
    )
    hist = (
        vals.crossJoin(F.broadcast(bounds))
        .select(
            F.expr(
                f"least({n_buckets - 1}, "
                f"((c - lo) * {n_buckets}) div (hi - lo + 1))"
            ).alias("bucket_idx")
        )
        .groupBy("bucket_idx")
        .agg(F.count(F.lit(1)).alias("n_in_bucket"))
    )
    w = Window.orderBy("bucket_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # ≤ n_buckets rows: the single-partition window is bounded state
    cum = hist.withColumn("cum_count", F.sum("n_in_bucket").over(w))
    qdf = spark.createDataFrame(
        list(quantiles), "q_permille int, q_num long, q_den long"
    )
    targets = qdf.crossJoin(F.broadcast(bounds)).withColumn(
        "target_rank", F.expr("(q_num * n + q_den - 1) div q_den")
    )
    return (
        targets.join(
            F.broadcast(cum), F.col("cum_count") >= F.col("target_rank")
        )
        .groupBy("q_permille", "target_rank", "lo", "hi")
        .agg(F.min(F.struct("bucket_idx", "n_in_bucket", "cum_count")).alias("s"))
        .select(
            "q_permille",
            "target_rank",
            F.col("s.bucket_idx").alias("bucket_idx"),
            F.expr(
                f"lo + (s.bucket_idx * (hi - lo + 1)) div {n_buckets}"
            ).alias("est_cents"),
            F.expr(
                f"(hi - lo + 1 + {n_buckets - 1}) div {n_buckets}"
            ).alias("bucket_width_cents"),
            F.col("s.n_in_bucket").alias("n_in_bucket"),
            F.col("s.cum_count").alias("cum_count"),
        )
        .orderBy("q_permille")
    )


def q_ext_147_histogram_quantiles(spark, sf_dir: str) -> DataFrame:
    from sparketl.io import load_table

    return histogram_quantile_sketch(load_table(spark, sf_dir, "lineitem"))


# ---------------------------------------------------------------------------
# ext_164 (r12): grouped, shard-MERGEABLE quantile bands from the
# deterministic histogram sketch — ext_147 per group, with the
# mergeability claim demonstrated (pane histograms sum) in pytest.
# ---------------------------------------------------------------------------


def grouped_cents(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """(g, c): the group key plus the value in exact integer cents —
    the shared first projection of the grouped-sketch family."""
    return df.select(
        F.col(group_col).alias("g"),
        F.expr(
            f"CAST(CAST({value_col} AS DECIMAL(12,2)) * 100 AS BIGINT)"
        ).alias("c"),
    ).where("c IS NOT NULL")


def grouped_bounds(vals: DataFrame) -> DataFrame:
    """(g, lo, hi, n): exact per-group min/max/count — one
    map-combinable aggregate; defines the shared bucket edges every
    shard of a group must use for its histogram to be mergeable."""
    return vals.groupBy("g").agg(
        F.min("c").alias("lo"), F.max("c").alias("hi"), F.count("c").alias("n")
    )


def grouped_histogram(
    vals: DataFrame, bounds: DataFrame, n_buckets: int = HIST_SKETCH_BUCKETS
) -> DataFrame:
    """(g, bucket_idx, n_in_bucket) under the given shared bounds.
    Bucket assignment is pure integer arithmetic, so histograms built
    on DISJOINT row sets of one group under the SAME bounds merge by
    summing counts — the property the pane-merge pytest pins."""
    return (
        vals.join(F.broadcast(bounds), "g")
        .select(
            "g",
            F.expr(
                f"least({n_buckets - 1}, "
                f"((c - lo) * {n_buckets}) div (hi - lo + 1))"
            ).alias("bucket_idx"),
        )
        .groupBy("g", "bucket_idx")
        .agg(F.count(F.lit(1)).alias("n_in_bucket"))
    )


def grouped_quantile_bands(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    n_buckets: int = HIST_SKETCH_BUCKETS,
    quantiles: tuple = HIST_SKETCH_QUANTILES,
) -> DataFrame:
    """Per-GROUP quantile bands from the deterministic equi-width
    histogram sketch — ext_147 grouped (the monitoring shape: one
    p50/p90/p99 band per event type / source / tenant), with the same
    three properties that made ext_147 fully oracle-able: order-free
    (integer bucket assignment), shard-MERGEABLE (per-shard histograms
    under the group's shared bounds sum — demonstrated by the
    pane-merge pytest, which ext_147 asserted but never exercised),
    and exact-integer output end to end.

    Scale shape: pass 1 is a per-group 3-value aggregate (broadcast —
    group cardinality is type/tenant-sized, not data-sized); pass 2
    shuffles ≤ n_buckets counters per (group, partition) with map-side
    combine; the selection windows run over ≤ n_buckets rows PER GROUP
    (partitioned, bounded state — never data-sized). At 100 TB the
    per-shard histograms are what you'd persist hourly and fold into
    daily/weekly bands without re-reading values — the sketch algebra
    ext_147's docstring promises, here exposed as composable
    ``grouped_histogram`` + band selection.

    The reference has no sketch surface (tool:273 ships SQL to the
    server); [EXT] scale suite, composing the ext_147 device.
    """
    vals = grouped_cents(df, group_col, value_col)
    bounds = grouped_bounds(vals)
    hist = grouped_histogram(vals, bounds, n_buckets)
    return bands_from_histogram(hist, bounds, n_buckets, quantiles)


def bands_from_histogram(
    hist: DataFrame,
    bounds: DataFrame,
    n_buckets: int = HIST_SKETCH_BUCKETS,
    quantiles: tuple = HIST_SKETCH_QUANTILES,
) -> DataFrame:
    """Band selection from a (possibly shard-MERGED) grouped histogram:
    the second half of ``grouped_quantile_bands``, split out so the
    pane-merge pytest can sum per-shard histograms and run the
    identical selection — the persisted-sketch fold path at scale."""
    w = Window.partitionBy("g").orderBy("bucket_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("cum_count", F.sum("n_in_bucket").over(w))
    spark = hist.sparkSession
    qdf = spark.createDataFrame(
        list(quantiles), "q_permille int, q_num long, q_den long"
    )
    targets = qdf.crossJoin(F.broadcast(bounds)).withColumn(
        "target_rank", F.expr("(q_num * n + q_den - 1) div q_den")
    )
    return (
        targets.join(
            F.broadcast(cum),
            (F.col("cum_count") >= F.col("target_rank"))
            & (targets.g == cum.g),
        )
        .drop(cum.g)
        .groupBy("g", "q_permille", "target_rank", "lo", "hi")
        .agg(F.min(F.struct("bucket_idx", "n_in_bucket", "cum_count")).alias("s"))
        .select(
            F.col("g").alias("group_key"),
            "q_permille",
            "target_rank",
            F.col("s.bucket_idx").alias("bucket_idx"),
            F.expr(
                f"lo + (s.bucket_idx * (hi - lo + 1)) div {n_buckets}"
            ).alias("est_cents"),
            F.expr(
                f"(hi - lo + 1 + {n_buckets - 1}) div {n_buckets}"
            ).alias("bucket_width_cents"),
            F.col("s.n_in_bucket").alias("n_in_bucket"),
            F.col("s.cum_count").alias("cum_count"),
        )
        .orderBy("group_key", "q_permille")
    )


def q_ext_164_quantile_bands(spark, sf_dir: str) -> DataFrame:
    from sparketl.io import load_table

    return grouped_quantile_bands(load_table(spark, sf_dir, "events"))
