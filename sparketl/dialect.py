"""T-SQL → Spark SQL dialect shim (SURVEY §4.3 item 1).

The reference ships raw T-SQL to SQL Server (tool:273) and itself
emits bracket-quoted identifiers (tool:149, 246-248, 287-288). This
shim rewrites the constructs the reference's surface relies on into
Spark SQL; it is deliberately minimal — arbitrary T-SQL is out of
scope (documented limitation, SURVEY §7.3 item 3).

Rewrites (applied outside string literals and comments only):
- ``[ident]``            → backtick-quoted identifier
- ``SELECT TOP n``       → ``SELECT`` ... ``LIMIT n`` (appended)
- ``GETDATE()``          → ``current_timestamp()``
- ``ISNULL(a,b)``        → ``coalesce(a,b)``
- ``LEN(x)``             → ``length(x)``
- ``CHARINDEX(sub,s)``   → ``locate(sub,s)`` (same argument order)

The lexer honors the reference's literal syntax: single-quoted
strings (tool:399-402) and ``--`` line comments (tool:405-408).
"""

from __future__ import annotations

import re

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
    tokens = list(_TOKEN.finditer(sql))
    i = 0
    while i < len(tokens):
        m = tokens[i]
        kind = m.lastgroup
        text = m.group()
        if kind in ("comment", "string", "number", "other"):
            out.append(text)
        elif kind == "bracket":
            out.append("`" + text[1:-1] + "`")
        elif kind == "word":
            lower = text.lower()
            # SELECT TOP n → SELECT ... LIMIT n
            if lower == "top" and out and _last_word(out) == "select":
                j = i + 1
                while j < len(tokens) and tokens[j].group().isspace():
                    j += 1
                if j < len(tokens) and tokens[j].group().isdigit():
                    limit_from_top = tokens[j].group()
                    i = j + 1
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


def _last_word(out: list[str]) -> str | None:
    for piece in reversed(out):
        if piece.strip():
            return piece.strip().lower()
    return None


def _next_nonspace(tokens, i: int) -> str | None:
    for j in range(i + 1, len(tokens)):
        t = tokens[j].group()
        if not t.isspace():
            return t
    return None
