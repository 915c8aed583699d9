"""Pre-warming PySpark worker daemon.

Stock workers import pandas + pyarrow (+ numpy) during bootstrap,
AFTER the daemon forks them: ~1-1.5 s of CPU per worker, and a cold
stage that needs 32 workers at once (64 for chained mapInPandas)
pays it 32-64x concurrently — measured ~8 s of wall on this box for
a trivial 32-task mapInPandas job, dwarfing the actual UDF work.
Importing the heavy modules ONCE here, before ``manager()`` starts
forking, lets every worker inherit them via copy-on-write fork for
free (the guide's "heavyweight init once" rule applied one level
above the task: once per daemon, not once per worker).

Two fork-safety measures around the preload (r12, after the r11
driver runs showed UDF-heavy queries 2-4x SLOWER at 32 concurrent
workers with the bare preload):

* ``gc.freeze()`` after the imports moves every preloaded object
  into the permanent generation, so forked workers' garbage
  collections never traverse (and copy-on-write un-share) the
  ~300 MB of inherited module objects — the public CPython API built
  for exactly this pre-fork-server pattern.  Without it each of the
  32 workers' first full GC dirties most inherited pages at once.
* stdout is parked on stderr while the preloads run: pyspark.daemon
  speaks a binary port handshake on stdout, and any transitively
  imported module that prints would corrupt it for every worker
  (ADVICE r11).

Wired via ``spark.python.daemon.module`` (session.py). The module
must be importable by the worker-side Python: session.py prepends
the repo root to PYTHONPATH before the JVM launches. Platforms
without fork (Windows) never use the daemon, so this module is
POSIX-only by construction, like pyspark.daemon itself.
``SPARK_GRAFT_NO_DAEMON=1`` (read in session.py) disables the
daemon entirely for A/B attribution.
"""

import gc
import sys

_real_stdout = sys.stdout
sys.stdout = sys.stderr  # preload prints must not touch the port handshake
try:
    # Heavy third-party imports: the bulk of worker bootstrap time.
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401

    # The worker main-loop modules the fork will exec, and the Arrow
    # serializers every pandas-UDF/mapInArrow task instantiates.
    import pyspark.sql.pandas.serializers  # noqa: F401
    import pyspark.sql.pandas.types  # noqa: F401
    import pyspark.worker  # noqa: F401

    # In-repo kernels used inside pandas UDFs (multimodal codecs pull
    # the whole package + pyspark import chain otherwise: ~0.5 s per
    # fresh worker on first use).
    try:  # pragma: no cover - best-effort: workers fall back to lazy import
        import whatdropsnow_etl_spark.functions.jpeg  # noqa: F401
        import whatdropsnow_etl_spark.functions.media  # noqa: F401
    except Exception:  # noqa: BLE001
        pass
finally:
    sys.stdout = _real_stdout

# Park the preloaded object graph in the permanent generation BEFORE
# any fork: children inherit it frozen, their collections skip it,
# and the inherited pages stay shared instead of being dirtied by
# the first gen-2 sweep in all 32 workers simultaneously.
gc.collect()
gc.freeze()

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
