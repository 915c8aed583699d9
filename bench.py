"""Per-round benchmark: run every registered query at
$SPARK_GRAFT_SF_DIR (default sf0.1) and print ONE JSON line.

Queries execute against the noop sink (full execution, no driver
collect) so timings measure the distributed plan, not result
transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F
from whatdropsnow_etl_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_spark(app_name="wdn-bench")
    # JVM warmup: exercise the scan→join→agg machinery once at the
    # smallest SF so the first measured query doesn't absorb
    # first-use costs (parquet reader init, broadcast machinery,
    # codegen compiler warm-up) that belong to the session, not the
    # query. Same treatment for every query; nothing is pre-compiled
    # at the benchmarked SF.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    entrymod.entry(spark).write.format("noop").mode("overwrite").save()
    # Python-worker warmup: the first pandas-UDF query otherwise absorbs
    # the Arrow worker-pool spinup (~seconds) that belongs to the
    # session. JVM warmup above doesn't start Python workers.
    import pandas as _pd
    from pyspark.sql.pandas.functions import pandas_udf as _pudf

    def _warm(x):
        return x * 1.0

    _warm.__annotations__ = {"x": _pd.Series, "return": _pd.Series}
    spark.range(10_000).select(
        _pudf(_warm, "double")(F.col("id").cast("double"))
    ).write.format("noop").mode("overwrite").save()

    # Optional subset/skip for scale studies: bench.py [skip:a,b | only:a,b]
    only: set[str] = set()
    skip: set[str] = set()
    for arg in sys.argv[1:]:
        if arg.startswith("only:"):
            only |= set(arg[5:].split(","))
        elif arg.startswith("skip:"):
            skip |= set(arg[5:].split(","))

    registry = entrymod.queries()

    def run_one(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        # r10: operators lazily persist shared mid-relations (the
        # subplan-reuse fixes) and the iterative ops localCheckpoint
        # round state; across a 240-query single-session sweep those
        # blocks accumulate and later queries pay LRU-eviction/GC
        # churn that belongs to NO query (measured: ~+25% on the
        # total, spread noisily over unchanged queries). Queries are
        # independent by the bench contract, so release everything
        # AFTER the timed window.
        spark.catalog.clearCache()
        try:
            rdds = spark.sparkContext._jsc.sc().getPersistentRDDs()
            it = rdds.iterator()
            while it.hasNext():
                it.next()._2().unpersist(False)
        except Exception:
            pass
        return dt

    # Heavy-path warmup (r7 verdict ask #6): the generic JVM/Arrow
    # warmups above don't touch the applyInPandas/groupState/
    # localCheckpoint machinery the heaviest queries lean on, so the
    # FIRST heavy query of the sweep absorbed ~2 s of first-use cost
    # (dup_weighting 6.83 s cold vs 4.8-5.4 s warm in r7). Run the
    # first registry query once, untimed, so the timed loop starts
    # warm; round-over-round deltas then compare like with like.
    _first = next(iter(entrymod.queries().values()))
    _first(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # LSH/banding warmup (r8 verdict ask #8): the warmups above never
    # touched the shingle→minhash→band machinery, so the sweep's
    # FIRST LSH query absorbed its first-touch cost — the judge
    # re-measured curation_funnel at 3.91 s warm vs the committed
    # 10.68 s. Warm the code path (not the data) at the smallest SF.
    _small = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(_small) and "dedup_minhash_lsh" in registry:
        registry["dedup_minhash_lsh"](spark, _small).write.format(
            "noop"
        ).mode("overwrite").save()

    # Drift sentinel: one fixed query timed immediately before AND
    # after the sweep. Round-over-round comparisons divide by the
    # sentinel ratio to separate environment drift (contended box,
    # thermal state — the r5 verdict measured a ±10% spread on
    # UNCHANGED code) from real per-query regressions: if the
    # sentinel moved the same way, it's the box, not the code.
    sentinel_name = "q1_pricing_summary"
    sentinel_pre = run_one(registry[sentinel_name])

    times: dict[str, float] = {}
    for name, fn in registry.items():
        if (only and name not in only) or name in skip:
            continue
        times[name] = run_one(fn)

    sentinel_post = run_one(registry[sentinel_name])
    total = round(sum(times.values()), 3)
    # Sentinel-normalized walls (r8 verdict ask #9): wall/sentinel_pre
    # per query, so round-over-round comparison across drifting VMs is
    # mechanical (divide two rounds' normalized columns) instead of a
    # narrative correction in PERF.md.
    norm = {
        k: round(v / sentinel_pre, 2) if sentinel_pre > 0 else None
        for k, v in times.items()
    }
    payload = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "queries_norm": norm,
        "sentinel": {
            "query": sentinel_name,
            "pre": sentinel_pre,
            "post": sentinel_post,
        },
        "sf": sf,
    }
    # The driver captures only the LAST ~2000 chars of stdout and
    # parses the final line as JSON: with 150+ per-query entries the
    # full line blew past that window and rounds 2-4 recorded
    # "parsed": null. Persist the full breakdown to bench_full.json
    # and PRINT a compact line (headline total + the slowest queries)
    # guaranteed to fit the driver's capture window.
    if not only and not skip:  # subset runs must not clobber the full record
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "bench_full.json"
            ),
            "w",
        ) as f:
            json.dump(payload, f, indent=1, sort_keys=True)
    slowest = dict(sorted(times.items(), key=lambda kv: -kv[1])[:25])
    compact = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "queries_norm": {k: norm[k] for k in slowest},
        "n_queries": len(times),
        "queries_note": "25 slowest shown; all %d in bench_full.json" % len(times),
        "sentinel": payload["sentinel"],
        "sf": sf,
    }
    line = json.dumps(compact)
    if len(line) > 1800:  # never outgrow the driver's tail again
        compact["queries"] = dict(list(slowest.items())[:10])
        compact["queries_norm"] = {k: norm[k] for k in compact["queries"]}
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
