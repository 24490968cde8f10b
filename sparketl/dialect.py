"""T-SQL → Spark SQL dialect shim (SURVEY §4.3 item 1).

The reference ships raw T-SQL to SQL Server (tool:273) and itself
emits bracket-quoted identifiers (tool:149, 246-248, 287-288). This
shim rewrites the constructs the reference's surface relies on into
Spark SQL; it is deliberately minimal — arbitrary T-SQL is out of
scope (documented limitation, SURVEY §7.3 item 3).

Rewrites (applied outside string literals and comments only):
- ``[ident]``            → backtick-quoted identifier
- ``SELECT TOP n`` / ``SELECT DISTINCT TOP (n)``
                         → ``SELECT`` ... ``LIMIT n`` (appended).
                         Only the OUTERMOST select may carry TOP: a TOP
                         inside a subquery, or a second TOP, raises
                         ``DialectError`` instead of silently becoming a
                         wrong outer LIMIT.
- ``GETDATE()``          → ``current_timestamp()``
- ``ISNULL(a,b)``        → ``coalesce(a,b)``
- ``LEN(x)``             → ``length(x)``
- ``CHARINDEX(sub,s)``   → ``locate(sub,s)`` (same argument order)
- ``expr + 'str'`` / ``'str' + expr``
                         → ``expr || 'str'`` — T-SQL string concat, but
                         only when a string literal is adjacent so the
                         rewrite is unambiguous; ``col + col`` on string
                         columns is out of scope (no type info here).

The lexer honors the reference's literal syntax: single-quoted
strings (tool:399-402) and ``--`` line comments (tool:405-408).
"""

from __future__ import annotations

import re


class DialectError(Exception):
    """A T-SQL construct the shim cannot rewrite faithfully."""

_FUNC_MAP = {
    "getdate": "current_timestamp",
    "isnull": "coalesce",
    "len": "length",
    "charindex": "locate",
}

_TOKEN = re.compile(
    r"""
    (?P<comment>--[^\n]*)
  | (?P<string>'(?:[^']|'')*')
  | (?P<bracket>\[[^\]]+\])
  | (?P<word>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<number>\d+(?:\.\d+)?)
  | (?P<other>.)
    """,
    re.VERBOSE | re.DOTALL,
)


def transpile(sql: str) -> str:
    """Rewrite a T-SQL-flavored statement into Spark SQL."""
    out: list[str] = []
    limit_from_top: str | None = None
    depth = 0
    tokens = list(_TOKEN.finditer(sql))
    i = 0
    while i < len(tokens):
        m = tokens[i]
        kind = m.lastgroup
        text = m.group()
        if kind in ("comment", "string", "number", "other"):
            if kind == "other":
                if text == "(":
                    depth += 1
                elif text == ")":
                    depth = max(0, depth - 1)
                elif text == "+" and _is_string_concat(tokens, i):
                    out.append("||")
                    i += 1
                    continue
            out.append(text)
        elif kind == "bracket":
            out.append("`" + text[1:-1] + "`")
        elif kind == "word":
            lower = text.lower()
            # SELECT [DISTINCT] TOP n → SELECT ... LIMIT n
            if lower == "top" and _after_select(out):
                n, next_i = _parse_top_count(tokens, i)
                if n is not None:
                    if depth > 0:
                        raise DialectError(
                            "TOP inside a subquery is not supported: the shim "
                            "can only attach LIMIT to the outermost query"
                        )
                    if limit_from_top is not None:
                        raise DialectError(
                            "multiple TOP clauses in one statement are not supported"
                        )
                    limit_from_top = n
                    i = next_i
                    while i < len(tokens) and tokens[i].group().isspace():
                        i += 1
                    continue
                out.append(text)
            elif lower in _FUNC_MAP and _next_nonspace(tokens, i) == "(":
                out.append(_FUNC_MAP[lower])
            else:
                out.append(text)
        i += 1
    result = "".join(out).rstrip().rstrip(";")
    if limit_from_top is not None:
        result = f"{result} LIMIT {limit_from_top}"
    return result


def _parse_top_count(tokens, i: int) -> tuple[str | None, int]:
    """Parse ``TOP n`` or ``TOP (n)`` starting after token *i*.

    Returns (count, index-after-count) or (None, i) if what follows is
    not a count (then TOP was an identifier, not the keyword).
    """
    j = i + 1
    while j < len(tokens) and tokens[j].group().isspace():
        j += 1
    if j < len(tokens) and tokens[j].group().isdigit():
        return tokens[j].group(), j + 1
    if j < len(tokens) and tokens[j].group() == "(":
        k = j + 1
        while k < len(tokens) and tokens[k].group().isspace():
            k += 1
        if k < len(tokens) and tokens[k].group().isdigit():
            n = tokens[k].group()
            k += 1
            while k < len(tokens) and tokens[k].group().isspace():
                k += 1
            if k < len(tokens) and tokens[k].group() == ")":
                return n, k + 1
    return None, i


def _is_string_concat(tokens, i: int) -> bool:
    """True when the ``+`` at token *i* has a string literal neighbor."""
    for j in range(i - 1, -1, -1):
        t = tokens[j]
        if not t.group().isspace():
            if t.lastgroup == "string":
                return True
            break
    return _is_string_token(tokens, i)


def _is_string_token(tokens, i: int) -> bool:
    for j in range(i + 1, len(tokens)):
        t = tokens[j]
        if not t.group().isspace():
            return t.lastgroup == "string"
    return False


def _after_select(out: list[str]) -> bool:
    """True when the emitted text ends with SELECT or SELECT DISTINCT —
    the positions where a following TOP is the T-SQL keyword."""
    words: list[str] = []
    for piece in reversed(out):
        if piece.strip():
            words.append(piece.strip().lower())
            if len(words) == 2:
                break
    if not words:
        return False
    if words[0] == "select":
        return True
    return words[0] == "distinct" and len(words) == 2 and words[1] == "select"


def _next_nonspace(tokens, i: int) -> str | None:
    for j in range(i + 1, len(tokens)):
        t = tokens[j].group()
        if not t.isspace():
            return t
    return None
