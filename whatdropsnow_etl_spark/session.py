"""Tuned SparkSession factory.

Scale notes (100 TB / 1000 executors):
- AQE on: runtime coalescing of post-shuffle partitions and skew-join
  splitting, so the same plans survive a 1000x scale-up without
  hand-tuning ``spark.sql.shuffle.partitions`` per query.
- Arrow on: any pandas-UDF path (multimodal decode) moves batches,
  not rows.
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle and are cluster-location independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "whatdropsnow-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for local
    runs; on a real cluster the caller passes no master and lets
    spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    # Pre-warming worker daemon (pydaemon.py): stock workers import
    # pandas+pyarrow AFTER forking — a cold stage spawning 32 workers
    # (64 for chained mapInPandas) pays ~8 s of concurrent import
    # wall (measured; multimodal_frame_sample 18.6 s -> 2.8 s with
    # the preload). The daemon module must be importable by the
    # worker-side interpreter, which does NOT inherit the driver's
    # sys.path hacks — prepend the repo root to PYTHONPATH before
    # the JVM (and with it the daemon) launches. On a real cluster
    # the package ships via --py-files and the same config applies.
    # SPARK_GRAFT_NO_DAEMON=1 falls back to the stock pyspark daemon
    # so the daemon's effect can be A/B-attributed in one window.
    use_daemon = os.environ.get("SPARK_GRAFT_NO_DAEMON", "") != "1"
    if use_daemon and SparkSession.getActiveSession() is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        existing = os.environ.get("PYTHONPATH", "")
        if repo_root not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                repo_root + (os.pathsep + existing if existing else "")
            )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata parquet writes TIMESTAMP(NANOS); read as long and
        # convert in sources.tables (Spark has no native nanos type)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # dims at TPC-H ratios are far under this; keeps dim joins
        # broadcast (zero-shuffle) without per-query hints
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # local mode runs all 32 executor threads inside the driver
        # JVM; an 8g heap is GC-bound on the heavy dedup/iterative
        # queries (measured: full bench 135s at 8g vs 112s at 24g,
        # with far lower run-to-run variance). The box has 128 GiB.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    if use_daemon:
        builder = builder.config(
            "spark.python.daemon.module", "whatdropsnow_etl_spark.pydaemon"
        )
    return builder.getOrCreate()
