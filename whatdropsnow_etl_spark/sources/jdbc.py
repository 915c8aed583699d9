"""JDBC source — the Spark counterpart of the reference's Postgres
layer (db.py:30-48 connect_db / retrying engine, db.py:51-67 keyed
upsert target tables).

The reference reads and writes one Postgres database through
SQLAlchemy; on Spark the same tables are read DISTRIBUTED: the scan
is split into ``num_partitions`` range slices of a numeric/temporal
``partition_column`` so every executor pulls its own slice over its
own connection, and Catalyst pushes filters/column pruning into the
generated SQL (``PushedFilters`` works through JDBC like parquet).

Write-back mirrors the reference's latest-wins ON CONFLICT upsert in
two steps (JDBC has no portable MERGE): land the batch into a stage
table, then issue one INSERT ... ON CONFLICT DO UPDATE from stage to
target on the driver connection — the heavy lifting (dedup to one
row per key) happens distributed BEFORE landing via
``operators.latest_wins``.

No database SERVER ships in this sandbox, but the runtime's embedded
Derby (the Hive-metastore jar already on the classpath) is a real
JDBC database, so the full write → range-partitioned distributed
read round-trip IS tested end-to-end
(tests/test_sink_and_source.py::test_jdbc_roundtrip_embedded_derby),
including the partition count of the resulting scan. Postgres-
specific behavior (ON CONFLICT upsert execution, fetchsize
semantics) remains exercised only at the SQL/option level.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class JdbcTableSpec:
    """Connection + partitioning recipe for one distributed scan."""

    url: str  # jdbc:postgresql://host:port/db
    table: str
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int = 16
    fetch_size: int = 10_000
    user: str | None = None
    password: str | None = None
    # explicit driver class; None relies on JDBC 4 auto-registration
    driver: str | None = None


def jdbc_read_options(spec: JdbcTableSpec) -> dict[str, str]:
    """The exact option map for ``spark.read.format("jdbc")``.

    Partitioned when a partition column + bounds are given (every
    executor reads one range slice); single-connection otherwise —
    acceptable only for dimension-sized tables, so callers at scale
    should always pass the partitioning triple. ``fetchsize``
    overrides the Postgres driver's row-at-a-time default (10 rows)
    that silently serializes large scans.
    """
    opts: dict[str, str] = {
        "url": spec.url,
        "dbtable": spec.table,
        "fetchsize": str(spec.fetch_size),
    }
    if spec.user is not None:
        opts["user"] = spec.user
    if spec.password is not None:
        opts["password"] = spec.password
    if spec.driver is not None:
        opts["driver"] = spec.driver
    if spec.partition_column is not None:
        if spec.lower_bound is None or spec.upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound"
                " (SELECT min(col), max(col) once, driver-side)"
            )
        opts.update(
            {
                "partitionColumn": spec.partition_column,
                "lowerBound": str(spec.lower_bound),
                "upperBound": str(spec.upper_bound),
                "numPartitions": str(spec.num_partitions),
            }
        )
    return opts


def upsert_sql(table: str, stage: str, key_cols: list[str], value_cols: list[str]) -> str:
    """The reference's ON CONFLICT DO UPDATE statement (db.py:51-67),
    emitted from a landed stage table in one set-based statement
    instead of row batches."""
    if not value_cols:
        raise ValueError("upsert with no value columns is a no-op")
    if not key_cols:
        # would otherwise emit 'ON CONFLICT () DO UPDATE' — a syntax
        # error surfacing only at execution, far from the mistake
        raise ValueError("upsert needs at least one key column")

    def q(ident: str) -> str:
        # quote identifiers: a reserved word ('user', 'order') or
        # mixed-case column binds wrong or fails unquoted
        return '"' + ident.replace('"', '""') + '"'

    cols = ", ".join(q(c) for c in [*key_cols, *value_cols])
    keys = ", ".join(q(c) for c in key_cols)
    sets = ", ".join(f"{q(c)} = excluded.{q(c)}" for c in value_cols)
    return (
        f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {stage} "
        f"ON CONFLICT ({keys}) DO UPDATE SET {sets}"
    )


def read_jdbc(spark, spec: JdbcTableSpec):
    """Distributed JDBC scan from :func:`jdbc_read_options` —
    round-trip-tested against embedded Derby (4-way range-partitioned
    read verified)."""
    return spark.read.format("jdbc").options(**jdbc_read_options(spec)).load()
