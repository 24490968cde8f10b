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
