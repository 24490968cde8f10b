"""Scale-engineering utilities: salted joins for skew, bucketed tables
for shuffle-free co-located joins.

Neither exists in the reference (its server handled physical
execution); both are core to running the Tier-B/C join surface at
100 TB, alongside the AQE skew handling already enabled in
``sparketl.session`` (spark.sql.adaptive.skewJoin).

- ``salted_join``: explicit salting for the case AQE can't fix —
  a shuffled join where ONE key holds a large fraction of all rows.
  The skewed (fact) side gets a random-but-deterministic salt in
  [0, n_salts); the small side is replicated n_salts×. The join key
  becomes (key, salt), splitting the hot partition n_salts ways.
- ``write_bucketed`` / co-located join: pre-shuffling both tables into
  the same bucket layout at write time makes every subsequent
  key-join shuffle-free — the classic "pay the shuffle once" layout
  for a fact table joined repeatedly on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    skewed_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted n_salts ways.

    Deterministic salt (hash of the full row via xxhash64 of all
    columns, mod n_salts) so re-runs produce identical partitioning.
    The small side is exploded n_salts× — keep it broadcast-sized or
    the replication cost dominates.

    Result columns = skewed columns + small columns (join helpers
    dropped), identical to ``skewed.join(small, key)``.
    """
    s = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)).cast(
            "int"
        ),
    )
    r = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    cond = (s[skewed_key] == r[small_key]) & (s["__salt"] == r["__salt"])
    out = s.join(r, cond, how)
    return out.drop(s["__salt"]).drop(r["__salt"])


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int = 16,
    sort_key: str | None = None,
) -> None:
    """Persist as a bucketed (+optionally sorted) managed table: both
    sides of a future join written with the same (key, n_buckets)
    layout join with ZERO exchanges — the shuffle happened at write
    time, once, instead of per query."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-layout bucketed tables (co-located, exchange-free)."""
    l = spark.table(left_table)
    r = spark.table(right_table)
    return l.join(r, l[left_key] == r[right_key])
