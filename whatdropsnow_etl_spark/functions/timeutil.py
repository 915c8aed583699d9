"""Timestamp helpers robust to physical encoding.

The testdata's parquet timestamp encoding has changed between rounds
(INT64 TIMESTAMP(NANOS) -> naive timestamp[us]); Spark surfaces those
as bigint / TIMESTAMP_NTZ / TIMESTAMP depending on flags. The loader
(`sources.tables.load_table`) canonicalizes to TIMESTAMP with the
session at UTC, but library operators should not *require* callers to
have gone through the loader — so epoch extraction here tolerates any
flavor via a no-op-when-already-canonical cast.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_micros(col: Column | str) -> Column:
    """Epoch microseconds from a timestamp column of any flavor.

    `cast("timestamp")` is a no-op on TIMESTAMP and a pure re-tag on
    TIMESTAMP_NTZ when the session timezone is UTC (the loader pins
    it); `F.unix_micros` then works uniformly. Stays JVM-side /
    codegen-friendly — no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
