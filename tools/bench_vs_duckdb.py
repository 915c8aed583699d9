"""Head-to-head: every oracle-twinned query on Spark vs DuckDB.

The target contract is "match-or-beat the reference's single-node
throughput at the same data scale"; DuckDB running the oracle SQL is
the strongest single-node stand-in available in this environment, so
this prints per-query times for both engines at the given SF plus
the ratio. Spark runs warm (one JVM, queries sequential, noop sink);
DuckDB runs in-process with all threads.

Usage: python tools/bench_vs_duckdb.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from whatdropsnow_etl_spark.session import get_spark
from whatdropsnow_etl_spark.sources import TABLE_NAMES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # args: [sf_dir] [name ... | skip:a,b,c]  — skip: for oracle
    # twins that are intractable single-node at the given SF
    # (e.g. dedup_editdist's exact DP blocking at sf1+)
    only: set[str] = set()
    skip: set[str] = set()
    for arg in sys.argv[2:]:
        if arg.startswith("skip:"):
            skip |= set(arg[5:].split(","))
        else:
            only.add(arg)
    spark = get_spark(app_name="bench-vs-duckdb")
    # same warmup contract as bench.py: exercise scan→join→agg once
    # at the smallest SF so session-level first-use costs (parquet
    # reader init, codegen compiler, broadcast machinery) don't land
    # on the first measured query
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    entrymod.entry(spark).write.format("noop").mode("overwrite").save()
    con = duckdb.connect()
    import os

    # The pathological oracle CTEs (pagerank/kcore pair shapes) can
    # exhaust the box when the long-lived Spark JVM holds its heap
    # high-water: cap DuckDB and give it a spill directory so those
    # oracles page to disk instead of dying with a bad-allocation
    # (observed live at sf1 on pagerank_update_pass's oracle, r11).
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    # r12: env-overridable. 48GB forces the pathological pair-CTE
    # oracles (pagerank_update_pass at sf1) into a spill that exceeds
    # the box's free disk (observed: 80GB of /tmp temp storage, then
    # IOException) — r10 completed the same oracle uncapped in RAM in
    # 198s. Raise the cap when the box is otherwise quiet.
    con.execute(
        "SET memory_limit='%s'" % os.environ.get("DUCK_MEM", "48GB")
    )
    con.execute("SET temp_directory='/tmp/duckdb_spill'")

    for name in TABLE_NAMES:
        path = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(path):  # Spark-written multi-file table
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    oracles = entrymod.oracle_sql()
    out = {}
    for name, fn in entrymod.queries().items():
        if (only and name not in only) or name in skip:
            continue
        if name not in oracles:
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t_spark = time.perf_counter() - t0
        # r10: release persisted blocks between queries (bench.py
        # run_one has the same release and the rationale)
        spark.catalog.clearCache()
        try:
            rdds = spark.sparkContext._jsc.sc().getPersistentRDDs()
            it = rdds.iterator()
            while it.hasNext():
                it.next()._2().unpersist(False)
        except Exception:  # noqa: BLE001
            pass
        t0 = time.perf_counter()
        con.execute(oracles[name]).fetchall()
        t_duck = time.perf_counter() - t0
        out[name] = {
            "spark_s": round(t_spark, 3),
            "duckdb_s": round(t_duck, 3),
            "ratio": round(t_spark / max(t_duck, 1e-9), 1),
        }
        print(
            f"{name:28s} spark {t_spark:7.2f}s  duckdb {t_duck:7.2f}s  "
            f"x{out[name]['ratio']}"
        )
    tot_s = sum(v["spark_s"] for v in out.values())
    tot_d = sum(v["duckdb_s"] for v in out.values())
    print(
        json.dumps(
            {
                "total_spark_s": round(tot_s, 2),
                "total_duckdb_s": round(tot_d, 2),
                "ratio": round(tot_s / max(tot_d, 1e-9), 2),
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
