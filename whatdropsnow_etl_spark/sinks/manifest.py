"""Manifest-committed parquet sink: atomic multi-file publish.

A plain ``df.write.parquet(path)`` is not atomic to concurrent
readers: they can list a directory mid-write and see half the files
(or, with dynamic overwrite, a mix of old and new). The standard
lakehouse fix — the core idea under Delta/Iceberg's log, rebuilt
here on nothing but parquet + one JSON file — is to make the FILE
LIST the unit of commit:

- writers land data files under ``<path>/data/<commit-uuid>/``
  (never visible to manifest readers until committed);
- commit = atomically renaming one JSON manifest into place
  (``os.replace`` — POSIX-atomic within a filesystem) naming the
  exact data files of the new version plus per-file row counts;
- readers load the manifest FIRST and read only the files it names
  — a torn directory listing can't hurt them, and an aborted write
  leaves only unreferenced files (garbage, never corruption);
- versions are monotonically numbered; old manifests are kept, so
  any prior version remains readable (time travel for free) until
  ``vacuum`` drops files no retained manifest references.

Scale: the manifest is file-list-sized (not data-sized); commits
are O(1) renames. On a real object store the atomic-rename step maps
to a conditional PUT of the version pointer — the protocol shape is
identical. Concurrent WRITERS are serialized by the version-file
link (``os.link`` — fails rather than clobbers, and the name appears
only WITH its full content); this is single-writer-per-version, the
same contract as a Delta log commit.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, f"manifest-{version:012d}.json")


def current_version(path: str) -> int | None:
    """Highest committed version, or None for an empty table."""
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return None
    versions = [
        int(n[len("manifest-"):-len(".json")])
        for n in names
        if n.startswith("manifest-") and n.endswith(".json")
    ]
    return max(versions) if versions else None


def commit_write(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    meta: dict | None = None,
) -> int:
    """Write ``df`` as a new atomically-published version; returns
    the committed version number. Readers never observe a partial
    state: until the manifest rename lands, the new files are
    invisible; after it, exactly the committed file set is visible.
    ``mode="overwrite"`` makes the new version exactly this write's
    files (snapshot replace); ``mode="append"`` makes it the
    previous version's files PLUS this write's (the streaming /
    incremental-load shape — every version is a full-table snapshot,
    so time travel still works). ``meta`` is stored verbatim in the
    manifest (e.g. a streaming batch id for idempotent replay)."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    commit_id = uuid.uuid4().hex
    data_dir = os.path.join(path, "data", commit_id)
    df.write.mode("errorifexists").parquet(data_dir)
    files = sorted(
        os.path.relpath(os.path.join(data_dir, n), path)
        for n in os.listdir(data_dir)
        if n.endswith(".parquet")
    )
    prev = current_version(path)
    # schema evolution contract (the Delta/Iceberg rule): appends may
    # ADD nullable columns and may OMIT existing ones (read as NULL),
    # but may never change a column's type — a type flip would make
    # old files unreadable under the new schema, which is corruption
    # deferred to read time. The table schema is recorded per version
    # so reads don't depend on which file the parquet reader samples.
    new_fields = {f["name"]: f for f in df.schema.jsonValue()["fields"]}
    table_fields = None
    if mode == "append" and prev is not None:
        with open(_manifest_path(path, prev)) as fh:
            prev_manifest = json.load(fh)
        files = prev_manifest["files"] + files
        prev_fields = prev_manifest.get("schema")
        if prev_fields is None:
            # pre-upgrade manifest with no recorded schema:
            # reconstruct it from the committed files' footers
            # (mergeSchema unifies any heterogeneous appends) so the
            # type guard and column preservation apply to old tables
            # too, instead of silently skipping both
            prev_files = [
                os.path.join(path, f) for f in prev_manifest["files"]
            ]
            prev_fields = (
                df.sparkSession.read.option("mergeSchema", "true")
                .parquet(*prev_files)
                .schema.jsonValue()["fields"]
            )
        changed = [
            f["name"]
            for f in prev_fields
            if f["name"] in new_fields
            and new_fields[f["name"]]["type"] != f["type"]
        ]
        if changed:
            raise ValueError(
                f"append changes column type(s) {changed}; evolution "
                "allows only adding nullable columns"
            )
        prev_names = {f["name"] for f in prev_fields}
        # added columns are recorded nullable regardless of the
        # incoming frame's flag: every pre-evolution row reads as
        # NULL in them, so a non-nullable declaration would lie
        table_fields = prev_fields + [
            {**f, "nullable": True}
            for f in df.schema.jsonValue()["fields"]
            if f["name"] not in prev_names
        ]
    if table_fields is None:
        table_fields = df.schema.jsonValue()["fields"]
    version = (prev or 0) + 1
    manifest = {
        "version": version,
        "commit_id": commit_id,
        "files": files,
        "schema": table_fields,
        "meta": meta or {},
    }
    tmp = os.path.join(path, f".manifest-{commit_id}.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    final = _manifest_path(path, version)
    # single-writer-per-version AND all-or-nothing publish: link(2)
    # makes the final name appear atomically WITH its full content
    # (an earlier O_CREAT+replace sequence exposed a zero-byte
    # manifest between the two syscalls — a crash there bricked the
    # table) and raises FileExistsError if a racing writer already
    # claimed this version, instead of clobbering its commit
    try:
        os.link(tmp, final)
    finally:
        os.unlink(tmp)
    return version


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a committed version (default: latest) by its manifest's
    exact file list — unreferenced/in-flight files are invisible.

    Reads honor the version's RECORDED table schema: after a
    schema-evolving append the file set is heterogeneous, and a
    plain parquet read would take whichever file's footer it samples
    (silently dropping the new column). ``mergeSchema`` unifies the
    footers, then the manifest schema pins column order and
    presence — files written before a column existed read as NULL
    for it, exactly the lakehouse contract."""
    if version is None:
        version = current_version(path)
        if version is None:
            raise FileNotFoundError(f"no committed version under {path}")
    with open(_manifest_path(path, version)) as fh:
        manifest = json.load(fh)
    files = [os.path.join(path, f) for f in manifest["files"]]
    df = spark.read.option("mergeSchema", "true").parquet(*files)
    schema = manifest.get("schema")
    if schema is not None:
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructField, StructType

        cols = []
        for f in schema:
            ftype = StructType.fromJson({"fields": [f], "type": "struct"})[
                f["name"]
            ].dataType
            if f["name"] in df.columns:
                cols.append(F.col(f["name"]).cast(ftype).alias(f["name"]))
            else:
                cols.append(F.lit(None).cast(ftype).alias(f["name"]))
        df = df.select(*cols)
    return df


def latest_meta(path: str) -> dict | None:
    """The CURRENT version's meta dict (None for an empty table) —
    the O(1) read the streaming sinks' idempotence check uses: each
    sink commit records a cumulative ``max_batch_id`` there, so the
    skip decision never rescans the whole manifest history and
    survives ``vacuum`` (the latest manifest is always retained)."""
    v = current_version(path)
    if v is None:
        return None
    with open(_manifest_path(path, v)) as fh:
        return json.load(fh).get("meta", {})


def committed_meta(path: str) -> list[dict]:
    """All retained manifests' meta dicts, oldest first — the
    idempotence ledger for streaming replays."""
    latest = current_version(path)
    if latest is None:
        return []
    out = []
    for v in range(1, latest + 1):
        mp = _manifest_path(path, v)
        if os.path.exists(mp):
            with open(mp) as fh:
                out.append(json.load(fh).get("meta", {}))
    return out


def vacuum(path: str, keep_last: int = 1) -> list[str]:
    """Drop data files referenced by NO retained manifest (the last
    ``keep_last`` versions survive; older manifests are removed).
    Returns the deleted file paths. Safe to run concurrently with
    readers of retained versions — only unreferenced files go.

    Streaming-replay note: the streaming sinks' idempotence ledger
    is the cumulative ``max_batch_id`` carried in EVERY sink
    commit's meta, so vacuuming old manifests does not shrink it
    (the latest manifest always survives). Only a pre-upgrade table
    whose manifests carry bare ``batch_id`` entries loses ledger
    depth to vacuum — re-commit once with a current sink to migrate.
    """
    latest = current_version(path)
    if latest is None:
        return []
    keep_versions = [v for v in range(latest - keep_last + 1, latest + 1) if v >= 1]
    keep_files: set[str] = set()
    for v in keep_versions:
        with open(_manifest_path(path, v)) as fh:
            keep_files |= set(json.load(fh)["files"])
    deleted: list[str] = []
    data_root = os.path.join(path, "data")
    for commit_dir in os.listdir(data_root) if os.path.isdir(data_root) else []:
        cdir = os.path.join(data_root, commit_dir)
        for name in os.listdir(cdir):
            rel = os.path.relpath(os.path.join(cdir, name), path)
            if name.endswith(".parquet") and rel not in keep_files:
                os.remove(os.path.join(path, rel))
                deleted.append(rel)
        if not os.listdir(cdir):
            os.rmdir(cdir)
    for v in range(1, (latest - keep_last) + 1):
        mp = _manifest_path(path, v)
        if os.path.exists(mp):
            os.remove(mp)
    return deleted


def merge_write(
    updates: DataFrame,
    path: str,
    keys: list[str],
    order_col: str,
    meta: dict | None = None,
) -> int:
    """MERGE (latest-wins upsert) committed as a new atomic version —
    the Delta ``MERGE INTO`` shape on the manifest table: read the
    current version, resolve each key to the single newest row by
    ``order_col`` (updates beat existing rows on ties via a side
    marker, matching ON CONFLICT DO UPDATE), and publish the result
    as one new snapshot version. Readers flip from the old state to
    the merged state atomically; time travel keeps every pre-merge
    version; a crash mid-merge leaves only unreferenced files.

    Schema evolution composes: updates may add nullable columns
    (validated by the commit path's type guard via the recorded
    schema).

    Scale: the merge itself is the latest_wins window — ONE shuffle
    on the key columns, the same exchange a warehouse MERGE needs.
    The rewrite cost is the full-snapshot write, which is the
    manifest sink's contract (every version is a complete file set);
    for keyed partial rewrites at 100 TB the bucketed upsert sink
    (sinks/upsert_parquet.py) is the partition-local alternative —
    this operator buys atomic multi-reader snapshots instead.
    """
    from pyspark.sql import functions as F

    from whatdropsnow_etl_spark.operators.upsert import latest_wins

    spark = updates.sparkSession
    prev = current_version(path)
    if prev is None:
        merged = latest_wins(
            updates.withColumn("__upd", F.lit(1)),
            keys,
            [F.col(order_col).desc(), F.col("__upd").desc()],
        ).drop("__upd")
        return commit_write(merged, path, mode="overwrite", meta=meta)
    existing = read_version(spark, path, prev)
    new_cols = [c for c in updates.columns if c not in existing.columns]
    for c in new_cols:
        existing = existing.withColumn(
            c, F.lit(None).cast(updates.schema[c].dataType)
        )
    missing = [c for c in existing.columns if c not in updates.columns]
    for c in missing:
        updates = updates.withColumn(
            c, F.lit(None).cast(existing.schema[c].dataType)
        )
    both = existing.withColumn("__upd", F.lit(0)).unionByName(
        updates.withColumn("__upd", F.lit(1))
    )
    merged = latest_wins(
        both, keys, [F.col(order_col).desc(), F.col("__upd").desc()]
    ).drop("__upd")
    return commit_write(merged, path, mode="overwrite", meta=meta)


def diff_versions(
    spark: SparkSession,
    path: str,
    key_cols: Sequence[str],
    old_version: int,
    new_version: int | None = None,
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff between two committed versions of a manifest
    table — time travel composed with ``operators.cdc.snapshot_diff``
    into the audit question a versioned table exists to answer:
    "what exactly changed between v3 and v7?" (added / removed /
    changed / unchanged per key).

    ``compare_cols`` defaults to every non-key column the two
    versions SHARE — schema evolution between the versions is
    handled by comparing the intersection (a column added in between
    shows up as 'added'-rows' payload, not as a spurious 'changed'
    on every pre-existing row). Cost is the two manifest-pinned
    version reads plus snapshot_diff's one key-partitioned full
    outer join; reading two versions does NOT double the scan when
    they share data files (the common case for appends), because
    each file is listed, not copied, per version.
    """
    from ..operators.cdc import snapshot_diff

    old = read_version(spark, path, old_version)
    new = read_version(spark, path, new_version)
    if compare_cols is None:
        keys = set(key_cols)
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in keys
        ]
    return snapshot_diff(old, new, key_cols, compare_cols)


def delete_where(
    spark: SparkSession,
    path: str,
    condition: str,
    meta: dict | None = None,
) -> int:
    """DELETE ... WHERE committed as a new atomic version — the
    compliance primitive (GDPR/CCPA right-to-be-forgotten, takedown
    requests) on the manifest table: readers flip atomically from
    the old snapshot to one without the matching rows.

    The audit trail composes from what the sink already provides:
    the predicate is recorded in the commit meta, ``diff_versions``
    reproduces the exact removed rows, and ``vacuum`` is the
    PHYSICAL erasure step — time travel intentionally keeps deleted
    rows readable until the retention cut, exactly like Delta's
    VACUUM contract (document retention accordingly for legal
    deletes).

    Scale: the anti-filter is map-only; the rewrite is the
    full-snapshot write that is this sink's versioning contract.
    """
    prev = current_version(path)
    if prev is None:
        raise ValueError(f"no committed version at {path}")
    existing = read_version(spark, path, prev)
    # delete only rows where the predicate is provably TRUE: a bare
    # NOT(cond) silently deletes rows where cond is NULL (three-valued
    # logic) — the opposite of what a legal delete may do
    kept = existing.where(f"NOT coalesce(({condition}), false)")
    return commit_write(
        kept,
        path,
        mode="overwrite",
        meta={**(meta or {}), "deleted_where": condition},
    )


def delete_keys(
    spark: SparkSession,
    path: str,
    tombstones: DataFrame,
    keys: Sequence[str],
    meta: dict | None = None,
) -> int:
    """DELETE by key list committed as a new atomic version: drops
    every row whose key tuple appears in ``tombstones`` (the
    erasure-request list) via a LEFT ANTI join — null-safe on each
    key column so a NULL key in a tombstone matches NULL-keyed rows
    instead of silently deleting nothing (the snapshot_diff
    eqNullSafe lesson).

    Scale: the tombstone list is request-sized — broadcast anti
    join, the corpus never shuffles; rewrite cost is the sink's
    full-snapshot contract (see delete_where).
    """
    from pyspark.sql import functions as F

    prev = current_version(path)
    if prev is None:
        raise ValueError(f"no committed version at {path}")
    existing = read_version(spark, path, prev)
    cond = None
    for k in keys:
        eq = existing[k].eqNullSafe(tombstones[k])
        cond = eq if cond is None else cond & eq
    kept = existing.join(
        F.broadcast(tombstones.select(*keys).distinct()), cond, "left_anti"
    )
    return commit_write(
        kept,
        path,
        mode="overwrite",
        meta={**(meta or {}), "deleted_keys": list(keys)},
    )
