"""Micro-batch CDC apply: the engine's core loop (reference lifecycle §3.1).

One batch = one delivery_seq range above the checkpoint:

    read events (delivery_seq in (lo, hi])     -- watermark-bounded scan
      -> vectorized decode (JVM expressions)    -- payload -> typed columns
      -> split valid / quarantine               -- never fail the batch
      -> in-batch LWW dedup + conditional MERGE -- one key shuffle
      -> atomic snapshot commit w/ batch-id     -- exactly-once
      -> checkpoint hwm (global + per source partition) + metrics row

Reference shape: DeployETL.run's fetch->process->save->updateETLState loop
(/root/reference/src/etl/deploy-etl.ts:19-100), with its two weaknesses
fixed by construction: the non-atomic state-after-save window (batch-id is
inside the committed snapshot) and the unconditional upsert (conditional
LWW in the MERGE).

Scale notes: the batch scan is a parquet range filter (pushed down;
min/max row-group pruning on delivery_seq since the WAL is written in
arrival order). Decode is narrow — no shuffle. The only shuffle is the
key hash for dedup+MERGE join, and the target-side read is pruned to
touched buckets. Per-batch driver work is O(buckets + partitions), never
O(events).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.decode import decode_events
from ..state.stores import CheckpointStore, MetricsLog
from ..tables.merge_table import MergeTable

TARGET_FIELDS = [
    ("repo", T.StringType()),
    ("path", T.StringType()),
    ("commit", T.StringType()),
    ("lang", T.StringType()),
    ("content", T.StringType()),
    ("commit_seq", T.LongType()),
    ("event_seq", T.LongType()),
    ("payload_version", T.LongType()),
    ("content_len", T.LongType()),
    ("content_sha256", T.StringType()),
]


def target_schema() -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in TARGET_FIELDS])


class CdcApplyPipeline:
    def __init__(
        self,
        spark: SparkSession,
        events_path: str,
        table: MergeTable,
        state_dir: str,
        pipeline: str = "cdc_apply",
        optional_cols: tuple[str, ...] = ("size_bytes",),
        collect_metrics: bool = True,
    ):
        self.spark = spark
        self.events_path = events_path
        self.table = table
        self.pipeline = pipeline
        self.optional_cols = optional_cols
        self.collect_metrics = collect_metrics
        self.checkpoints = CheckpointStore(f"{state_dir}/checkpoints.json")
        self.metrics = MetricsLog(f"{state_dir}/metrics.jsonl")
        self.quarantine_dir = f"{state_dir}/quarantine"

    # ------------------------------------------------------------------
    def events(self) -> DataFrame:
        return self.spark.read.parquet(self.events_path)

    def delivery_range(self) -> tuple[int, int]:
        r = self.events().agg(
            F.min("delivery_seq").alias("lo"), F.max("delivery_seq").alias("hi")
        ).collect()[0]
        return (r["lo"], r["hi"])

    @staticmethod
    def batch_id_for(pipeline: str, lo: int, hi: int) -> str:
        return f"{pipeline}:{lo}:{hi}"

    # ------------------------------------------------------------------
    def run_batch(self, seq_lo: int, seq_hi: int, batch_id: str | None = None) -> dict:
        """Apply one (lo, hi] delivery range. Idempotent by batch_id."""
        batch_id = batch_id or self.batch_id_for(self.pipeline, seq_lo, seq_hi)
        t0 = time.time()
        if self.table.is_committed(batch_id):
            return {"batch_id": batch_id, "skipped_already_committed": True}

        batch = self.events().filter(
            (F.col("delivery_seq") > seq_lo) & (F.col("delivery_seq") <= seq_hi)
        )
        decoded = decode_events(batch).persist()
        try:
            # one small job for all counters + per-partition watermarks
            part_stats = (
                decoded.groupBy("partition_id")
                .agg(
                    F.count("*").alias("n_in"),
                    F.sum(F.when(~F.col("is_valid"), 1).otherwise(0)).alias("n_bad"),
                    F.max("delivery_seq").alias("hwm"),
                )
                .collect()
            ) if self.collect_metrics else []

            # quarantine (idempotent: per-batch directory overwrite)
            quarantined = decoded.filter(~F.col("is_valid")).select(
                "event_id", "partition_id", "commit_seq", "event_seq",
                "payload", F.lit("payload_decode_failed").alias("error"), "ts",
            )
            qn = 0
            if self.collect_metrics:
                qn = sum(r["n_bad"] or 0 for r in part_stats)
            if not self.collect_metrics or qn > 0:
                quarantined.write.mode("overwrite").parquet(
                    f"{self.quarantine_dir}/batch_id={batch_id.replace(':', '_')}"
                )

            # valid -> target projection (+ schema-evolution column gating:
            # an optional column rides along only once events actually carry
            # it — additive evolution then happens inside MergeTable.merge)
            cols = [n for n, _ in TARGET_FIELDS] + ["op"]
            extra = []
            for c in self.optional_cols:
                if c in decoded.columns:
                    present = decoded.filter(F.col(c).isNotNull()).limit(1).count() > 0
                    if present:
                        extra.append(c)
            valid = decoded.filter(F.col("is_valid")).select(*cols, *extra)
            m = self.table.merge(valid, batch_id,
                                 collect_metrics=self.collect_metrics)
        finally:
            decoded.unpersist()

        # checkpoint AFTER commit: replay of (lo,hi] is a snapshot-level no-op
        if part_stats:
            self.checkpoints.set_many(
                self.pipeline, {r["partition_id"]: r["hwm"] for r in part_stats}
            )
        self.checkpoints.set(self.pipeline, seq_hi)

        wall = time.time() - t0
        n_in = sum(r["n_in"] for r in part_stats) if part_stats else None
        rec = {
            "batch_id": batch_id,
            "seq_lo": seq_lo,
            "seq_hi": seq_hi,
            "n_in": n_in,
            "n_quarantined": qn,
            "n_inserted": m.n_inserted,
            "n_updated": m.n_updated,
            "n_stale_ignored": m.n_stale_ignored,
            "n_deleted": m.n_deleted,
            "n_buckets_touched": m.n_buckets_touched,
            "table_version": m.version,
            "wall_ms": round(wall * 1000, 1),
            "events_per_sec": round(n_in / wall, 1) if n_in else None,
            "per_partition": [
                {"partition_id": r["partition_id"], "n_in": r["n_in"],
                 "n_quarantined": r["n_bad"], "hwm": r["hwm"]}
                for r in part_stats
            ],
        }
        if self.collect_metrics:
            self.metrics.append(rec)
        return rec

    # ------------------------------------------------------------------
    def run(self, batch_span: int | None = None, max_batches: int | None = None) -> list[dict]:
        """Catch up from the checkpoint to the current WAL head."""
        lo_all, hi_all = self.delivery_range()
        hwm = self.checkpoints.get(self.pipeline)
        if hwm < 0:
            hwm = (lo_all or 0) - 1
        results = []
        span = batch_span or max(1, (hi_all - hwm))
        n = 0
        while hwm < hi_all and (max_batches is None or n < max_batches):
            hi = min(hwm + span, hi_all)
            results.append(self.run_batch(hwm, hi))
            hwm = hi
            n += 1
        return results

    def quarantine(self) -> DataFrame:
        import os

        if not os.path.exists(self.quarantine_dir):
            schema = ("event_id string, partition_id int, commit_seq long, "
                      "event_seq long, payload string, error string, ts timestamp")
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(f"{self.quarantine_dir}/*")
