"""Structured Streaming: drift-gated ingestion with quarantine.

The batch-side `schema_drift_report` (operators/integrity.py)
compares two snapshots; the streaming question is different: "should
THIS micro-batch be appended to 100 TB of history, or does it smell
like an upstream breakage?" Re-profiling the sink per trigger would
scan history every few seconds, so the gate keeps a RUNNING baseline
instead: per column, exact (n_rows, n_null) — sum monoids, O(columns)
state, merged per batch and persisted as a tiny parquet. History is
never re-read.

Gate contract (per batch, per gated column): the batch's null rate
may exceed the baseline's by at most ``max_null_rate_jump``. A
failing batch is appended to the QUARANTINE path — never dropped
(an operator inspects and replays it; silent data loss is worse than
late data) — and does NOT merge into the baseline, so one poisoned
batch can't normalize the breakage for the next. The first batch
bootstraps the baseline (nothing to compare against), matching how
these gates are armed in production: seed from a known-good batch.

Null-rate is the gated signal because it is scale-free (a 1k-row
batch compares cleanly against a 1B-row baseline); distinct-count
ratios are NOT (a small batch legitimately has few distincts), and
exact distinct isn't a mergeable monoid anyway — layer the KMV/HLL
register sketches from operators/sketches.py into the state if a
distinct-collapse gate is needed.

No reference twin (the reference is batch-only). Pinned by
tests/test_streaming.py::test_drift_gate_* — a null-surge batch
lands in quarantine, clean batches append, and the baseline equals
the profile of exactly the appended batches.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATE_SCHEMA = "column string, n_rows bigint, n_null bigint"


def profile_nulls(df: DataFrame, cols: Sequence[str]) -> list[tuple[str, int, int]]:
    """ONE wide-aggregate scan -> [(column, n_rows, n_null)].
    Column-count-bounded result, collected driver-side (the gate
    decision is driver logic inside foreachBatch)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null_{c}"))
    [row] = df.agg(*aggs).collect()
    return [(c, row["__n"], row[f"__null_{c}"]) for c in cols]


class DriftGatedSink:
    """foreachBatch callback: append clean batches to ``path``,
    quarantine drifted ones, maintain the O(columns) baseline at
    ``state_path``.

    ``n_quarantined`` / ``n_appended`` count batch outcomes — the
    unit tests' observables.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        quarantine_path: str,
        cols: Sequence[str],
        max_null_rate_jump: float = 0.3,
        state_path: str | None = None,
        uniqueness_cols: Sequence[str] | None = None,
        min_uniqueness_vs_baseline: float = 0.5,
        hll_p: int = 12,
        shift_cols: Sequence[str] | None = None,
        shift_id_col: str = "event_id",
        max_share_l1: float = 0.5,
        shift_bins: int = 10,
    ) -> None:
        self.spark = spark
        self.path = path
        self.quarantine_path = quarantine_path
        self.cols = list(cols)
        self.max_null_rate_jump = max_null_rate_jump
        self.state_path = state_path or path.rstrip("/") + "__drift_state"
        # second gate (opt-in): per-column DISTINCT-collapse detection
        # for replay storms / duplicate floods. Exact distinct over
        # 100 TB of history is unmaintainable, so the baseline lives
        # as mergeable HLL registers (operators/sketches.py) —
        # O(cols × 2^p) state rows, MAX-merged per accepted batch,
        # never a history rescan. A batch whose EXACT batch-local
        # uniqueness (distinct/rows) falls below
        # ``min_uniqueness_vs_baseline`` × the baseline's estimated
        # uniqueness quarantines. Enum-like columns are structurally
        # immune to false positives: their baseline uniqueness decays
        # toward 0 as history grows, so the threshold decays with it.
        self.uniqueness_cols = list(uniqueness_cols or [])
        # The uniqueness gate divides the register estimate by the
        # baseline row count read from the NULL-profile state, so a
        # uniqueness column not also in ``cols`` would always see
        # rows=0 and be silently excluded — a misconfiguration that
        # disables the duplicate-flood check with no error. Auto-
        # extend ``cols`` so every uniqueness column is profiled.
        missing = [c for c in self.uniqueness_cols if c not in self.cols]
        self.cols.extend(missing)
        self.min_uniqueness_vs_baseline = min_uniqueness_vs_baseline
        self.hll_p = hll_p
        self.reg_path = self.state_path.rstrip("/") + "__hll"
        # third gate (opt-in): VALUE-DISTRIBUTION shift on numeric
        # columns — the streaming half of
        # operators.integrity.distribution_shift_report. Bin
        # boundaries FREEZE from the first accepted batch's
        # deterministic sample quantiles (frozen boundaries are what
        # make per-batch shares comparable across the table's
        # lifetime); the baseline is cumulative per-bin counts —
        # a sum monoid, O(cols x bins) state, merged only on accept
        # so a drifted batch can't normalize the drift. A batch
        # quarantines when the L1 distance between its bin shares
        # and the baseline's exceeds ``max_share_l1`` (L1 instead of
        # PSI: no log, exact integer-share arithmetic, bounded [0,2]).
        self.shift_cols = list(shift_cols or [])
        self.shift_id_col = shift_id_col
        self.max_share_l1 = max_share_l1
        self.shift_bins = shift_bins
        self.bnds_path = self.state_path.rstrip("/") + "__shift_bnds"
        self.shift_counts_path = self.state_path.rstrip("/") + "__shift_counts"
        self.n_appended = 0
        self.n_quarantined = 0

    def _baseline(self) -> dict[str, tuple[int, int]]:
        if not os.path.exists(self.state_path):
            return {}
        rows = self.spark.read.schema(STATE_SCHEMA).parquet(self.state_path).collect()
        return {r["column"]: (r["n_rows"], r["n_null"]) for r in rows}

    def _batch_registers(self, batch_df: DataFrame) -> DataFrame:
        from ..operators.sketches import hll_registers

        parts = [
            hll_registers(
                batch_df.select(F.lit(c).alias("column"), F.col(c).alias("__v")),
                ["column"],
                "__v",
                p=self.hll_p,
            )
            for c in self.uniqueness_cols
        ]
        out = parts[0]
        for p_ in parts[1:]:
            out = out.unionByName(p_)
        return out

    def _baseline_uniqueness(self, base: dict) -> dict[str, float]:
        """column -> estimated distinct/rows over all accepted
        history, from the persisted register store."""
        from ..operators.sketches import hll_estimate_from_registers

        if not self.uniqueness_cols or not os.path.exists(self.reg_path):
            return {}
        regs = self.spark.read.parquet(self.reg_path)
        est = {
            r["column"]: r["approx_distinct"]
            for r in hll_estimate_from_registers(
                regs, ["column"], p=self.hll_p
            ).collect()
        }
        out = {}
        for c in self.uniqueness_cols:
            rows = base.get(c, (0, 0))[0]
            if c in est and rows > 0:
                out[c] = est[c] / rows
        return out

    def _stored_boundaries(self) -> dict[str, list[int]]:
        """Per-column frozen bin boundaries already persisted (from
        prior ACCEPTED batches)."""
        if not os.path.exists(self.bnds_path):
            return {}
        rows = self.spark.read.parquet(self.bnds_path).collect()
        return {r["column"]: list(r["bnds"]) for r in rows}

    def _compute_boundaries(
        self, batch_df: DataFrame, cols: list[str]
    ) -> dict[str, list[int]]:
        """Bin boundaries for ``cols`` from THIS batch (the
        quantile_bucketize sample contract: bottom-k by md5(id),
        type-1 quantiles). Pure compute — persistence happens only
        on the ACCEPT path, so a quarantined batch can never freeze
        corrupted boundaries (and a column all-NULL in one batch is
        simply retried on the next accepted one, not silently
        excluded forever)."""
        from ..operators.quantiles import _bottom_k_cents

        out = {}
        for c in cols:
            [arr] = _bottom_k_cents(
                batch_df, c, self.shift_id_col, 1024, 100
            ).collect()
            vals, n = list(arr["__arr"]), arr["__n"]
            if n == 0:
                continue
            out[c] = [
                vals[int((i / self.shift_bins) * (n - 1))]
                for i in range(1, self.shift_bins)
            ]
        return out

    def _persist_boundaries(self, bnds: dict[str, list[int]]) -> None:
        self.spark.createDataFrame(
            [(c, b) for c, b in bnds.items()],
            "column string, bnds array<bigint>",
        ).coalesce(1).write.mode("overwrite").parquet(self.bnds_path)

    def _shift_counts(
        self, batch_df: DataFrame, bnds: dict[str, list[int]]
    ) -> dict[str, list[int]]:
        """Per-column per-bin batch counts against the frozen
        boundaries — one tiny agg per gated column."""
        out = {}
        for c, b in bnds.items():
            cents = F.round(F.col(c) * 100, 0).cast("long")
            arr = F.array(*[F.lit(x) for x in b])
            rows = (
                batch_df.select(cents.alias("__c"))
                .where(F.col("__c").isNotNull())
                .groupBy(
                    F.size(
                        F.filter(arr, lambda x: x <= F.col("__c"))
                    ).alias("bin")
                )
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            counts = [0] * self.shift_bins
            for r in rows:
                counts[r["bin"]] = r["n"]
            out[c] = counts
        return out

    def _shift_baseline(self) -> dict[str, list[int]]:
        if not os.path.exists(self.shift_counts_path):
            return {}
        rows = self.spark.read.parquet(self.shift_counts_path).collect()
        return {r["column"]: list(r["counts"]) for r in rows}

    def _last_batch_id(self) -> int:
        marker = self.state_path.rstrip("/") + "__last_batch"
        if not os.path.exists(marker):
            return -1
        with open(marker) as f:
            return int(f.read().strip() or -1)

    def _record_batch_id(self, batch_id: int) -> None:
        marker = self.state_path.rstrip("/") + "__last_batch"
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, marker)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch redelivers the SAME batch_id on retry after a
        # sink-side failure; a plain append would then double-write
        # and double-merge the baseline. The marker write is atomic
        # (os.replace) and happens only after the batch fully lands,
        # so a crash mid-batch replays it — append-then-crash before
        # the marker can still double-append the FILES (parquet
        # append is not transactional; write_stream_parquet's
        # epoch-tracking sink is the exactly-once file path), but the
        # BASELINE merge is exactly-once either way, which is what
        # keeps the gate's statistics truthful.
        if batch_id <= self._last_batch_id():
            return
        if batch_df.isEmpty():
            self._record_batch_id(batch_id)
            return
        prof = profile_nulls(batch_df, self.cols)
        base = self._baseline()
        drifted = []
        for col, n, nn in prof:
            if col in base and base[col][0] > 0 and n > 0:
                base_rate = base[col][1] / base[col][0]
                if nn / n - base_rate > self.max_null_rate_jump:
                    drifted.append(col)
        if self.uniqueness_cols and base:
            base_uni = self._baseline_uniqueness(base)
            if base_uni:
                [brow] = batch_df.agg(
                    F.count(F.lit(1)).alias("__n"),
                    *[
                        F.countDistinct(c).alias(f"__d_{c}")
                        for c in self.uniqueness_cols
                    ],
                ).collect()
                for c, bu in base_uni.items():
                    batch_uni = brow[f"__d_{c}"] / brow["__n"]
                    if batch_uni < self.min_uniqueness_vs_baseline * bu:
                        drifted.append(c)
        shift_bnds: dict[str, list[int]] = {}
        fresh_bnds: dict[str, list[int]] = {}
        batch_counts: dict[str, list[int]] = {}
        if self.shift_cols:
            stored = self._stored_boundaries()
            missing = [c for c in self.shift_cols if c not in stored]
            if missing:
                fresh_bnds = self._compute_boundaries(batch_df, missing)
            shift_bnds = {**stored, **fresh_bnds}
            batch_counts = self._shift_counts(batch_df, shift_bnds)
            shift_base = self._shift_baseline()
            for c, counts in batch_counts.items():
                if c not in shift_base:
                    continue
                bn, nn_ = sum(shift_base[c]), sum(counts)
                if bn == 0 or nn_ == 0:
                    continue
                l1 = sum(
                    abs(x / nn_ - y / bn)
                    for x, y in zip(counts, shift_base[c])
                )
                if l1 > self.max_share_l1:
                    drifted.append(c)
        # every gate contributor self-guards on ITS baseline (null:
        # col in base; uniqueness: base_uni non-empty; shift: column
        # in shift_base), so an empty null-profile baseline must not
        # suppress the others — `drifted and base` once made a
        # shift-only configuration silently inert
        if drifted:
            batch_df.write.mode("append").parquet(self.quarantine_path)
            self.n_quarantined += 1
            self._record_batch_id(batch_id)
            return
        batch_df.write.mode("append").parquet(self.path)
        self.n_appended += 1
        merged = [
            (c, n + base.get(c, (0, 0))[0], nn + base.get(c, (0, 0))[1])
            for c, n, nn in prof
        ]
        # state is column-count-sized: the overwrite is a metadata-
        # scale write, not a data-scale one
        self.spark.createDataFrame(merged, STATE_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(self.state_path)
        if self.uniqueness_cols:
            regs = self._batch_registers(batch_df)
            if os.path.exists(self.reg_path):
                regs = regs.unionByName(self.spark.read.parquet(self.reg_path))
            # MAX-merge then materialize driver-side (register store is
            # cols × 2^p rows at most) so the overwrite never reads the
            # path it is replacing
            merged_regs = (
                regs.groupBy("column", "__reg")
                .agg(F.max("__rho").alias("__rho"))
                .collect()
            )
            self.spark.createDataFrame(
                merged_regs, "column string, __reg bigint, __rho int"
            ).coalesce(1).write.mode("overwrite").parquet(self.reg_path)
        if fresh_bnds:
            # boundaries freeze only from an ACCEPTED batch — the
            # documented "first accepted batch" bootstrap contract
            self._persist_boundaries({**self._stored_boundaries(), **fresh_bnds})
        if self.shift_cols and batch_counts:
            shift_base = self._shift_baseline()
            merged_counts = [
                (
                    c,
                    [
                        x + y
                        for x, y in zip(
                            counts,
                            shift_base.get(c, [0] * self.shift_bins),
                        )
                    ],
                )
                for c, counts in batch_counts.items()
            ]
            self.spark.createDataFrame(
                merged_counts, "column string, counts array<bigint>"
            ).coalesce(1).write.mode("overwrite").parquet(
                self.shift_counts_path
            )
        self._record_batch_id(batch_id)
