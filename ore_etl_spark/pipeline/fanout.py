"""Multi-type fan-out apply (SURVEY §7 step 5; reference lifecycle 3.2).

The reference decodes each transaction once and routes it into 0..N typed
records persisted to 9 separate collections
(/root/reference/src/etl/activity-parser.ts:76-86,222-252 router;
persistParsedActivities :93-220), including deliberate multi-emit — one
event may produce records for SEVERAL types (claim_ore + claim_yield,
test/etl/activity-parser.test.ts:106-118,158-161).

Spark shape: ONE decode pass over the batch, N filter/transform branches,
N MERGEs into N MergeTables. Each (batch, route) commit is independently
idempotent (batch-id "{batch}:{route}"), so a crash between route commits
replays only the missing routes — per-table exactly-once, mirroring (and
strengthening) the reference's per-collection saveBatch loop.

Scale note: the decode pass is shared (read once); each route's MERGE
shuffles only its own records. Routes whose predicate selects nothing
commit an empty snapshot (bookkeeping only).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.decode import decode_events
from ..state.stores import CheckpointStore, MetricsLog
from ..tables.merge_table import MergeTable


@dataclass
class Route:
    """One typed output: a predicate over decoded events and a projection
    to the route's record shape (must keep key + version columns)."""

    name: str
    predicate: Callable[[DataFrame], F.Column]
    transform: Callable[[DataFrame], DataFrame]


class FanoutApplyPipeline:
    def __init__(
        self,
        spark: SparkSession,
        events_path: str,
        routes: list[Route],
        tables: dict[str, MergeTable],
        state_dir: str,
        pipeline: str = "cdc_fanout",
        mode: str = "cow",
    ):
        missing = [r.name for r in routes if r.name not in tables]
        if missing:
            raise ValueError(f"routes without tables: {missing}")
        self.spark = spark
        self.events_path = events_path
        self.routes = routes
        self.tables = tables
        self.pipeline = pipeline
        self.mode = mode
        self.checkpoints = CheckpointStore(f"{state_dir}/checkpoints.json")
        self.metrics = MetricsLog(f"{state_dir}/metrics.jsonl")

    def events(self) -> DataFrame:
        return self.spark.read.parquet(self.events_path)

    def delivery_range(self):
        r = self.events().agg(
            F.min("delivery_seq").alias("lo"), F.max("delivery_seq").alias("hi")
        ).collect()[0]
        return (r["lo"], r["hi"])

    def run_batch(self, seq_lo: int, seq_hi: int) -> dict:
        t0 = time.time()
        batch = self.events().filter(
            (F.col("delivery_seq") > seq_lo) & (F.col("delivery_seq") <= seq_hi)
        )
        decoded = decode_events(batch).filter(F.col("is_valid"))
        out = {}
        for route in self.routes:
            batch_id = f"{self.pipeline}:{seq_lo}:{seq_hi}:{route.name}"
            tbl = self.tables[route.name]
            if tbl.is_committed(batch_id):
                out[route.name] = {"skipped_already_committed": True}
                continue
            records = route.transform(decoded.filter(route.predicate(decoded)))
            if self.mode == "mor":
                m = tbl.merge_mor(records, batch_id)
            else:
                m = tbl.merge(records, batch_id)
            out[route.name] = {
                "n_inserted": m.n_inserted, "n_updated": m.n_updated,
                "version": m.version,
            }
        self.checkpoints.set(self.pipeline, seq_hi)
        rec = {"batch_id": f"{self.pipeline}:{seq_lo}:{seq_hi}",
               "routes": out, "wall_ms": round((time.time() - t0) * 1000, 1)}
        self.metrics.append(rec)
        return rec

    def run(self, batch_span: int | None = None) -> list[dict]:
        lo_all, hi_all = self.delivery_range()
        if hi_all is None:
            return []
        hwm = self.checkpoints.get(self.pipeline)
        if hwm < 0:
            hwm = (lo_all or 0) - 1
        span = batch_span or max(1, hi_all - hwm)
        results = []
        while hwm < hi_all:
            hi = min(hwm + span, hi_all)
            results.append(self.run_batch(hwm, hi))
            hwm = hi
        return results
