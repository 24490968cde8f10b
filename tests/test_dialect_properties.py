"""Property-based checks on the T-SQL dialect shim (hypothesis).

The shim's invariants, for arbitrary inputs:
1. content inside single-quoted string literals is NEVER rewritten
2. content inside ``--`` line comments is NEVER rewritten
3. bracket identifiers become backtick identifiers with the inner
   text preserved verbatim
4. transpiling is idempotent: transpile(transpile(s)) == transpile(s)
5. plain ANSI SQL without any T-SQL construct passes through unchanged
"""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from sparketl.dialect import transpile

# identifier-ish inner text for brackets: no brackets/backticks/newlines
ident = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters="_ "
    ),
    min_size=1,
    max_size=20,
)

# literal body: anything printable except the quote itself
literal_body = st.text(
    alphabet=st.characters(
        blacklist_characters="'\n\r", blacklist_categories=("Cs", "Cc")
    ),
    max_size=30,
)


@given(body=literal_body)
@settings(max_examples=200, deadline=None)
def test_string_literals_never_rewritten(body):
    sql = f"SELECT '{body}' AS c FROM t"
    out = transpile(sql)
    assert f"'{body}'" in out


@given(body=literal_body)
@settings(max_examples=200, deadline=None)
def test_comments_never_rewritten(body):
    sql = f"SELECT 1 -- TOP 5 GETDATE() [{body}]"
    out = transpile(sql)
    assert out.endswith(f"-- TOP 5 GETDATE() [{body}]")


@given(name=ident)
@settings(max_examples=200, deadline=None)
def test_bracket_ident_preserved(name):
    out = transpile(f"SELECT [{name}] FROM t")
    assert f"`{name}`" in out and "[" not in out


@given(
    n=st.integers(min_value=1, max_value=10_000),
    name=ident,
    body=literal_body,
)
@settings(max_examples=200, deadline=None)
def test_transpile_idempotent(n, name, body):
    sql = f"SELECT TOP {n} [{name}], ISNULL(a, '{body}') FROM t WHERE LEN(x) > 1"
    once = transpile(sql)
    assert transpile(once) == once


@given(
    cols=st.lists(ident.map(lambda s: s.replace(" ", "_")), min_size=1, max_size=4),
)
@settings(max_examples=100, deadline=None)
def test_ansi_passthrough_unchanged(cols):
    # no T-SQL constructs → byte-identical passthrough
    collist = ", ".join(re.sub(r"^(\d)", r"c\1", c) for c in cols)
    sql = f"SELECT {collist} FROM t WHERE x = 1 GROUP BY {collist}"
    assert transpile(sql) == sql
