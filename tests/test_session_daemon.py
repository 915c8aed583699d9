"""The pre-warming worker daemon (whatdropsnow_etl_spark.pydaemon).

Workers forked by the stock daemon import pandas/pyarrow during
bootstrap — ~8 s of concurrent-import wall for a cold 32-worker
stage. session.py swaps in pydaemon, which imports the heavy
modules (and the in-repo codec kernels) once before forking, so
every worker inherits them loaded. These tests pin (a) the config
is actually set and (b) the inheritance genuinely reaches worker
processes — if the daemon module failed to import, Spark would
fall back with an error, and if the config were dropped, the
sys.modules probe below would come back False.
"""

from __future__ import annotations


def test_pydaemon_configured(spark):
    assert (
        spark.conf.get("spark.python.daemon.module")
        == "whatdropsnow_etl_spark.pydaemon"
    )


def test_workers_inherit_preloaded_modules(spark):
    def probe(it):
        import sys  # noqa: PLC0415

        # checked BEFORE any in-UDF import: only the daemon preload
        # can have put the codec module here
        flag = "whatdropsnow_etl_spark.functions.jpeg" in sys.modules
        import pandas as pd  # noqa: PLC0415

        for batch in it:
            yield pd.DataFrame({"ok": [flag] * len(batch)})

    rows = (
        spark.range(8)
        .repartition(4)
        .mapInPandas(probe, "ok boolean")
        .collect()
    )
    assert rows and all(r["ok"] for r in rows)
