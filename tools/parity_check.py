"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__ query on Spark AND its DuckDB oracle at
the given SF, then compares row count, column names, and
order-insensitive values (sorted rows, columns sorted by name,
floats compared exactly first and to 1e-12 relative as a fallback
diagnostic).

Usage: python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from whatdropsnow_etl_spark.session import get_spark
from whatdropsnow_etl_spark.sources import TABLE_NAMES


# DuckDB result types the driver's value-hash serializes differently
# from Spark (int128 has no Spark twin): an oracle producing one of
# these hash-fails even when every value matches bit-for-bit.
# Proven in r3: the only two HUGEINT-producing oracles were the only
# two hash failures. Uncast integer SUM(CASE...) is the usual source;
# the fix is CAST(... AS BIGINT).
_BANNED_DUCK_TYPES = ("HUGEINT", "UHUGEINT")


def _duck_connect(sf_dir: str):
    import os

    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(path):  # Spark-written multi-file table
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def oracle_type_errors(con, sql: str) -> list[str]:
    """Columns whose DuckDB type would break the driver's type-
    sensitive value hash (checked on the relation, no execution)."""
    rel = con.sql(sql)
    return [
        f"{c}:{t}"
        for c, t in zip(rel.columns, rel.types)
        if str(t).upper() in _BANNED_DUCK_TYPES
    ]


def duck_run(sf_dir: str, sql: str):
    con = _duck_connect(sf_dir)
    type_errs = oracle_type_errors(con, sql)
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall(), type_errs


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def compare(name, scols, srows, dcols, drows) -> list[str]:
    errs = []
    if len(srows) != len(drows):
        errs.append(f"rowcount spark={len(srows)} duck={len(drows)}")
    if scols != dcols:
        errs.append(f"columns spark={scols} duck={dcols}")
    if errs:
        return errs
    nmis = 0
    for i, (a, b) in enumerate(zip(srows, drows)):
        if a != b:
            close = all(
                (
                    x == y
                    or (
                        isinstance(x, float)
                        and isinstance(y, float)
                        and math.isclose(x, y, rel_tol=1e-12, abs_tol=1e-12)
                    )
                )
                for x, y in zip(a, b)
            )
            nmis += 1
            if nmis <= 3:
                errs.append(f"row {i} {'~close' if close else 'DIFF'}: "
                            f"spark={a} duck={b}")
    if nmis:
        errs.append(f"{nmis} mismatched rows total")
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # args: [sf_dir] [name ... | skip:a,b,c] — skip: for oracle twins
    # that are intractable single-node at big SFs (the skipped names
    # are PRINTED so a sweep can't silently claim full coverage)
    only: set[str] = set()
    skip: set[str] = set()
    for arg in sys.argv[2:]:
        if arg.startswith("skip:"):
            skip |= set(arg[5:].split(","))
        else:
            only.add(arg)
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    qs = entrymod.queries()
    # an unknown name in `only` would otherwise run ZERO queries and
    # still print ALL OK — a vacuous pass that reads as a real one
    unknown = (only | skip) - set(qs)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if (only and name not in only) or name in skip:
            if name in skip:
                print(f"SKIP {name} (by request)")
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        finally:
            # r10: release the lazily-persisted mid-relations and
            # localCheckpoint blocks between queries — a 240-query
            # single-session sweep otherwise accumulates them
            # (bench.py run_one has the same release)
            spark.catalog.clearCache()
            try:
                rdds = spark.sparkContext._jsc.sc().getPersistentRDDs()
                it = rdds.iterator()
                while it.hasNext():
                    it.next()._2().unpersist(False)
            except Exception:  # noqa: BLE001
                pass
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows")
            continue
        try:
            dcols, drows, type_errs = duck_run(sf_dir, oracles[name])
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            continue
        scols, srows = norm_rows(scols, srows)
        dcols, drows = norm_rows(dcols, drows)
        errs = compare(name, scols, srows, dcols, drows)
        if type_errs:
            errs.append(f"oracle emits driver-hash-breaking types: {type_errs}")
        if errs:
            failures.append(name)
            print(f"FAIL {name} ({len(srows)} rows):")
            for e in errs:
                print(f"  {e}")
        else:
            print(f"ok   {name}: {len(srows)} rows")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
