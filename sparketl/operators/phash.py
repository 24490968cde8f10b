"""Portable 60-bit hashing shared by Spark queries and DuckDB oracles.

Sketch operators (count-min, HyperLogLog) historically used Spark's
``xxhash64`` — fast but engine-specific, forcing rows-only driver
checks. This module derives a 60-bit hash from ``md5`` instead, which
both engines compute identically on UTF-8 strings:

- Spark:  ``CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)``
- DuckDB: ``CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)``

15 hex digits = 60 bits, always non-negative, exactly representable
in a signed 64-bit integer in both engines — so every downstream
bucket index / register value is exact integer arithmetic and the
whole sketch gets a full SQL oracle. md5 stays JVM-side (codegen'd
``Md5`` expression) on the Spark path; it is ~2-3x slower than
xxhash64 per call but the sketch hash is never the bottleneck (the
shuffle is), and determinism across engines is what buys the oracle.

Reference parity: the reference delegates all hashing to SQL Server
(``HASHBYTES('MD5', ...)`` is its portable device, tool:273); md5 is
the one hash the T-SQL surface, Spark, and DuckDB all share.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Upper bound (exclusive) of the portable hash domain.
H60_MAX = 1 << 60


def h60(col: Column | str) -> Column:
    """Portable 60-bit hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def h60_sql_spark(expr: str) -> str:
    """Spark-SQL snippet computing ``h60`` of a string expression."""
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def h60_sql_duckdb(expr: str) -> str:
    """DuckDB snippet computing the identical 60-bit hash."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------------------
# Seeded universal-hash family over the h60 domain — the portable
# replacement for Spark's seeded xxhash64 in MinHash signatures.
# ---------------------------------------------------------------------------

#: 2^30 — the split point that keeps every intermediate of the
#: (a·h + b) mod 2^60 scramble inside a signed 64-bit integer.
_HALF = 1 << 30


def h60_scrambles(n: int) -> list[tuple[int, int]]:
    """``n`` deterministic (a, b) pairs for the universal family
    g_i(h) = (a_i·h + b_i) mod 2^60 over the h60 domain. a_i is an
    odd Knuth multiplicative scramble < 2^30 (odd ⇒ the map is a
    bijection on the low bits); b_i decorrelates the minima across
    seeds. Pure Python ints — both the Spark query and the DuckDB
    oracle embed them as identical literals, so the signatures agree
    engine-for-engine."""
    return [
        (
            (2654435761 * (i + 1)) % _HALF | 1,
            (25214903917 * (i + 1) + 11) % H60_MAX,
        )
        for i in range(n)
    ]


def g60_expr(h_expr: str, a: int, b: int, intdiv: str = "div") -> str:
    """SQL for g(h) = (a·h + b) mod 2^60 with every intermediate
    64-bit-safe: split h = hi·2^30 + lo (hi, lo < 2^30; a < 2^30), so
    a·hi and a·lo each stay < 2^60 and the sum < 2^62. Integer ops
    only — Spark and DuckDB agree exactly on non-negative operands.
    ``intdiv`` parameterizes the integer-division token (Spark
    ``div``, DuckDB ``//``), same device as ``zorder_expr``."""
    return (
        f"((({a} * (({h_expr}) {intdiv} {_HALF})) % {_HALF}) * {_HALF}"
        f" + {a} * (({h_expr}) % {_HALF}) + {b}) % {H60_MAX}"
    )
