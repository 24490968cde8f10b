"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, compares row count, sorted column names, and an
order-insensitive value hash (exact string rendering; floats via repr).

Usage: python tools/verify_oracle.py [--vanilla] [--first N] [sf_dir] [query_name ...]

``--vanilla`` builds a bare ``SparkSession`` (no sparketl session
configs) — the closest local stand-in for the driver's own session;
catches session-config coupling that runs under ``get_spark`` miss.
``--first N`` restricts to the first N ``queries()`` entries in
iteration order (the driver's rotating check window).
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from sparketl.io import TABLE_NAMES, table_path  # noqa: E402


def _canon(val) -> str:
    import datetime
    import math

    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(val)
    if isinstance(val, (datetime.datetime, datetime.date)):
        return val.isoformat()
    return str(val)


def frame_fingerprint(cols: list[str], rows: list[tuple]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return sorted(cols), len(rows), h


def main() -> int:
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    first_n = None
    if "--first" in args:
        i = args.index("--first")
        first_n = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod

    if vanilla:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        from sparketl.session import get_spark

        spark = get_spark("verify_oracle")
    qs = entrymod.queries()
    if first_n is not None:
        qs = dict(list(qs.items())[:first_n])
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sn, sh = frame_fingerprint(scols, [tuple(r) for r in srows])
        dc, dn, dh = frame_fingerprint(dcols, drows)
        # degenerate-output tripwire: a hash match on a column BOTH
        # engines compute as all-NULL is agreement, not correctness
        # (caught ext_68's parity split computing nothing) — surface it
        tuples = [tuple(r) for r in srows]
        all_null = [
            c
            for i, c in enumerate(scols)
            if tuples and all(t[i] is None for t in tuples)
        ]
        if (sc, sn, sh) == (dc, dn, dh):
            note = f"  [ALL-NULL cols: {all_null}]" if all_null else ""
            print(f"PASS  {name}: {sn} rows{note}")
            n_pass += 1
        else:
            print(f"FAIL  {name}: spark(cols={sc},n={sn},h={sh}) duckdb(cols={dc},n={dn},h={dh})")
            if sn == dn and sc == dc:
                for a, b in zip(
                    sorted(map(tuple, srows)), sorted(map(tuple, drows))
                ):
                    if tuple(map(_canon, a)) != tuple(map(_canon, b)):
                        print(f"      first diff:\n      spark : {a}\n      duckdb: {b}")
                        break
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
