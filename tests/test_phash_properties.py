"""Property checks on the portable-hash devices (hypothesis):
the g60 universal-scramble SQL evaluates identically in DuckDB (`//`)
and in exact Python arithmetic across the whole h60 domain, and the
h60 SQL forms agree between engines on arbitrary strings (DuckDB vs
the Python md5 reference; the Spark side is covered by the oracle
drives, which compare end-to-end)."""

import hashlib

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from sparketl.operators.phash import (
    H60_MAX,
    g60_expr,
    h60_scrambles,
    h60_sql_duckdb,
)

_con = duckdb.connect()


@given(
    h=st.integers(min_value=0, max_value=H60_MAX - 1),
    seed=st.integers(min_value=0, max_value=63),
)
@settings(max_examples=200, deadline=None)
def test_g60_duckdb_matches_exact_arithmetic(h, seed):
    a, b = h60_scrambles(seed + 1)[seed]
    got = _con.execute(
        f"SELECT {g60_expr('h', a, b, '//')} FROM (SELECT CAST(? AS BIGINT) AS h)",
        [h],
    ).fetchone()[0]
    assert got == (a * h + b) % H60_MAX


@given(
    s=st.text(
        alphabet=st.characters(blacklist_characters="'", blacklist_categories=("Cs",)),
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_h60_duckdb_matches_python_md5(s):
    got = _con.execute(
        f"SELECT {h60_sql_duckdb('s')} FROM (SELECT ? AS s)", [s]
    ).fetchone()[0]
    want = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
    assert got == want
