"""Property checks (hypothesis) for the round-12 operators.

Spark round trips cost ~1 s per example, so example counts stay small;
the properties are chosen so ANY counterexample is a real bug, not a
tolerance miss:

- connected_components_star ≡ a Python union-find on arbitrary small
  graphs (self-loops, duplicate edges, multi-component, any labeling);
- grouped_quantile_bands: every estimate brackets the true per-group
  discrete quantile within one bucket width, for arbitrary integer
  multisets — AND the bands are invariant under ANY disjoint pane
  split of the rows when the panes share the group bounds (the
  shard-merge algebra, checked against arbitrary splits rather than
  the single parity split the unit test uses).
"""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # compress to the component MINIMUM (the operator's contract)
    return {n: find(n) for n in parent}


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=8, deadline=None)
def test_cc_star_matches_union_find(spark, edges):
    from sparketl.operators.scaleops import connected_components_star

    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(df).collect()
    }
    want = _union_find(edges)
    # the operator drops isolated self-loop-only nodes the same way
    # union-find keeps them as their own root — compare on its domain
    non_loop_nodes = {x for a, b in edges if a != b for x in (a, b)}
    assert set(got) == non_loop_nodes
    for n in non_loop_nodes:
        assert got[n] == want[n], (n, got[n], want[n])


@given(
    groups=st.dictionaries(
        keys=st.sampled_from(["a", "b", "c"]),
        values=st.lists(
            st.integers(min_value=-10_000, max_value=10_000),
            min_size=1,
            max_size=20,
        ),
        min_size=1,
        max_size=3,
    ),
    split_bits=st.lists(st.integers(min_value=0, max_value=2), max_size=64),
)
@settings(max_examples=6, deadline=None)
def test_grouped_bands_bound_and_split_invariance(spark, groups, split_bits):
    from sparketl.operators.quantiles import (
        bands_from_histogram,
        grouped_bounds,
        grouped_histogram,
        grouped_quantile_bands,
    )

    rows = [
        (g, float(v)) for g, vs in groups.items() for v in vs
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")
    direct = [
        tuple(r)
        for r in grouped_quantile_bands(
            df, group_col="event_type", value_col="value"
        ).collect()
    ]

    # one-bucket error bound vs the exact discrete quantile
    import math

    for (g, qp, _tr, _bi, est, width, _nib, _cum) in direct:
        vs = sorted(round(v * 100) for v in groups[g])
        rank = math.ceil(qp / 1000 * len(vs))
        true = vs[max(rank - 1, 0)]
        assert est <= true < est + width, (g, qp, true, est, width)

    # pane-merge invariance under an arbitrary 3-way split
    vals = df.select(
        F.col("event_type").alias("g"),
        F.expr(
            "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"
        ).alias("c"),
    ).where("c IS NOT NULL")
    bounds = grouped_bounds(vals)
    bits = (split_bits + [0] * len(rows))[: len(rows)]
    tagged = spark.createDataFrame(
        [(g, round(v * 100), t) for (g, v), t in zip(rows, bits)],
        "g string, c long, t int",
    )
    panes = [
        grouped_histogram(tagged.where(F.col("t") == t).select("g", "c"), bounds)
        for t in (0, 1, 2)
    ]
    merged = (
        panes[0]
        .unionByName(panes[1])
        .unionByName(panes[2])
        .groupBy("g", "bucket_idx")
        .agg(F.sum("n_in_bucket").alias("n_in_bucket"))
    )
    folded = [
        tuple(r) for r in bands_from_histogram(merged, bounds).collect()
    ]
    assert folded == direct
