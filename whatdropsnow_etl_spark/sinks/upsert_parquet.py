"""Key-partitioned latest-wins upsert sink (merge-on-read parquet).

Reference parity: db.py:51-67 ``upsert`` (insert-or-update on
primary key, newest wins; db.py:63-67 FK-tolerant skip is the
``valid_only`` operator composed in front). Delta-style semantics
without a Delta dependency:

- every ``upsert(df)`` appends a delta batch stamped with a
  monotonically increasing ``__batch`` id;
- rows are hash-bucketed on the key into ``__bucket`` partition
  directories, so merge-on-read and compaction touch only the
  buckets a key maps to — never a global sort or full rewrite;
- ``read()`` resolves latest-wins per key with one window over
  (__batch DESC, version DESC);
- ``compact()`` rewrites the resolved state and truncates history.

Scale: bucket count is fixed at table creation (like bucketed Hive
tables) so the same key always lands in the same directory across
batches; 100 TB state with n_buckets sized to ~1 GB/bucket keeps
both upsert append and per-bucket compaction executor-local. Reads
shuffle only within the window dedup, partitioned by key hash.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.upsert import latest_wins


class UpsertParquetSink:
    def __init__(
        self,
        path: str,
        keys: list[str],
        version_col: str,
        n_buckets: int = 16,
        resolve_by_version: bool = False,
    ) -> None:
        """``resolve_by_version=False`` (default) resolves reads by
        arrival order first (__batch DESC, version DESC) — the
        reference's ON CONFLICT DO UPDATE semantics, where the last
        write wins. Set True for version-authoritative resolution
        (version DESC, __batch DESC): required when batches arrive in
        an order uncorrelated with event time, e.g. a streaming
        foreachBatch writer — an old event arriving late must not
        clobber newer state."""
        self.path = path
        self.keys = list(keys)
        self.version_col = version_col
        self.n_buckets = n_buckets
        self.resolve_by_version = resolve_by_version
        self._meta_path = os.path.join(path, "_upsert_meta.json")

    # -- meta ---------------------------------------------------------------

    def _load_meta(self) -> dict:
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                return json.load(f)
        return {
            "keys": self.keys,
            "version_col": self.version_col,
            "n_buckets": self.n_buckets,
            "next_batch": 0,
        }

    def _save_meta(self, meta: dict) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path)

    def _bucket(self) -> F.Column:
        return F.pmod(F.xxhash64(*self.keys), F.lit(self.n_buckets)).cast("int")

    # -- api ----------------------------------------------------------------

    def upsert(self, df: DataFrame) -> int:
        """Append one delta batch; returns its batch id."""
        missing = [
            c for c in (*self.keys, self.version_col) if c not in df.columns
        ]
        if missing:
            raise ValueError(f"upsert batch is missing columns {missing}")
        meta = self._load_meta()
        if (
            meta["keys"] != self.keys
            or meta["n_buckets"] != self.n_buckets
            # version_col decides WHICH row wins latest-wins: a sink
            # reopened with the wrong one would silently resolve by
            # the wrong ordering and return stale winners
            or meta.get("version_col", self.version_col) != self.version_col
        ):
            raise ValueError(
                f"sink at {self.path} was created with keys={meta['keys']}"
                f" version_col={meta.get('version_col')!r}"
                f" n_buckets={meta['n_buckets']}"
            )
        batch = meta["next_batch"]
        (
            df.withColumn("__batch", F.lit(batch).cast("bigint"))
            .withColumn("__bucket", self._bucket())
            .write.partitionBy("__bucket")
            .mode("append")
            .parquet(os.path.join(self.path, "data"))
        )
        meta["next_batch"] = batch + 1
        # record the logical schema so read() stays well-defined even
        # when every batch so far was empty (an empty write lands only
        # _SUCCESS — no part files — and bare spark.read.parquet would
        # fail schema inference; found via the all-orphan-offers case
        # in the reference pipeline)
        meta["schema"] = df.schema.json()
        self._save_meta(meta)
        return batch

    def upsert_valid(
        self, df: DataFrame, parent: DataFrame, fk: str, pk: str
    ) -> tuple[int, DataFrame]:
        """FK-tolerant upsert (reference db.py:63-67): rows whose FK
        resolves are written; orphans are returned for logging, not
        raised. Returns (batch_id, orphans)."""
        # ONE distinct parent-key projection feeds both sides (the
        # semi- and anti-join split of the same broadcast relation) —
        # routing the kept side through integrity.valid_only would
        # distinct+broadcast the parent a second time per call
        parent_keys = F.broadcast(
            parent.select(F.col(pk).alias("__pk")).distinct()
        )
        kept = df.join(
            parent_keys, df[fk] == F.col("__pk"), "left_semi"
        )
        orphans = df.join(
            parent_keys, df[fk] == F.col("__pk"), "left_anti"
        )
        batch = self.upsert(kept)
        return batch, orphans

    def read(self, spark: SparkSession) -> DataFrame:
        """Merge-on-read: latest-wins state across all batches. A
        table whose batches were ALL empty (possible: every row of
        every upsert_valid call was an FK orphan) has a data dir with
        no part files — return an empty relation of the recorded
        logical schema instead of failing parquet schema inference."""
        import glob

        from pyspark.sql.types import StructType

        data_dir = os.path.join(self.path, "data")
        if not glob.glob(
            os.path.join(data_dir, "**", "*.parquet"), recursive=True
        ):
            meta = self._load_meta()
            if "schema" not in meta:
                raise FileNotFoundError(
                    f"upsert sink at {self.path} has no data and no"
                    " recorded schema"
                )
            return spark.createDataFrame(
                [], StructType.fromJson(json.loads(meta["schema"]))
            )
        df = spark.read.parquet(data_dir)
        order = (
            [F.col(self.version_col).desc(), F.col("__batch").desc()]
            if self.resolve_by_version
            else [F.col("__batch").desc(), F.col(self.version_col).desc()]
        )
        resolved = latest_wins(df, self.keys, order)
        return resolved.drop("__batch", "__bucket")

    def compact(self, spark: SparkSession) -> None:
        """Rewrite resolved state as batch 0; truncates delta history."""
        resolved = self.read(spark)
        tmp = os.path.join(self.path, "data.compact")
        (
            resolved.withColumn("__batch", F.lit(0).cast("bigint"))
            .withColumn("__bucket", self._bucket())
            .write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(tmp)
        )
        import shutil

        # swap order matters: renaming the live dir ASIDE first means
        # a crash at any point leaves either the old state (data or
        # data.old present) or the new one — never a table with NO
        # data directory (the old rmtree-then-replace had exactly
        # that window)
        data = os.path.join(self.path, "data")
        old = data + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.replace(data, old)
        os.replace(tmp, data)
        shutil.rmtree(old)
        meta = self._load_meta()
        meta["next_batch"] = 1
        self._save_meta(meta)
