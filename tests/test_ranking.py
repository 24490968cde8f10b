"""Distributed two-phase global ranking (operators/ranking.py)."""

import pytest
from pyspark.sql import functions as F


def test_global_rank_is_exact_permutation(spark):
    import random

    from sparketl.operators.ranking import with_global_rank

    random.seed(3)
    rows = [(i, random.randint(-500, 500)) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r["id"]: r["_rank"]
        for r in with_global_rank(df, ["v", "id"]).collect()
    }
    expect = {
        rid: i + 1
        for i, (rid, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert got == expect


def test_global_rank_has_no_unpartitioned_window(spark):
    """The whole point: ranks without a 'No Partition Defined' window
    dragging the table through one task."""
    from bench import count_unpartitioned_windows
    from sparketl.operators.ranking import with_global_rank

    df = spark.range(10000).select(
        F.col("id"), (F.col("id") * 37 % 1001).alias("v")
    )
    out = with_global_rank(df, ["v", "id"])
    out.collect()
    assert count_unpartitioned_windows(out) == 0


def test_global_rank_requires_order_cols(spark):
    from sparketl.operators.ranking import with_global_rank

    with pytest.raises(ValueError):
        with_global_rank(spark.range(3), [])


def test_auc_extremes_and_ties(spark):
    """AUC machinery on planted data: a perfectly separating margin
    gives 1.0, its negation 0.0, and all-tied scores give exactly 0.5
    (the tie-rank device's calibration point)."""
    from sparketl.operators.ranking import one_vs_rest_auc

    def emb(vals):
        # one dim carries the signal (d=0 has sign +1 in the margin)
        return spark.createDataFrame(
            [(i, [float(v)] + [0.0] * 63, lab) for i, (v, lab) in enumerate(vals)],
            "vec_id long, embedding array<float>, label int",
        )

    sep = emb([(1.0, 1)] * 5 + [(-1.0, 0)] * 5)
    got = {r["label"]: r["auc_micro"] for r in one_vs_rest_auc(sep).collect()}
    assert got[1] == 1_000_000 and got[0] == 0

    tied = emb([(0.5, 1)] * 4 + [(0.5, 0)] * 6)
    got = {r["label"]: r["auc_micro"] for r in one_vs_rest_auc(tied).collect()}
    assert got[1] == 500_000 and got[0] == 500_000
