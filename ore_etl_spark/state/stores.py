"""Engine state: checkpoints, backfill chunk ledger, metrics (FIXTURES §5).

Reference analogs: ``etl_state`` per-type high-watermark docs
(/root/reference/src/types/schemas.ts:159-168) and the ``transform_chunks``
claim/resume ledger (schemas.ts:170-180,
src/etl/transaction-transformer.ts:187-265).

All stores are tiny (O(partitions + batches) rows, never O(events)) so they
live as JSON on the driver-visible filesystem with atomic ``os.replace``
writes — on a real cluster this path is the shared object store / HDFS, and
the same rename-based protocol applies (or the checkpoint table moves into
the lakehouse catalog). Data-plane exactly-once does NOT depend on these:
the batch-id manifest inside the MergeTable snapshot is the authority; the
checkpoint is a restart hint. Re-applying an already-committed range is a
snapshot-level no-op.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class _JsonStore:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def _read(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def _write(self, data: dict) -> None:
        tmp = f"{self.path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(data, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)


class CheckpointStore(_JsonStore):
    """Per-(pipeline, partition) high-watermark on ``delivery_seq``."""

    GLOBAL = "_global"

    def get(self, pipeline: str, partition: str | int = GLOBAL) -> int:
        return self._read().get(pipeline, {}).get(str(partition), {}).get("hwm", -1)

    def set(self, pipeline: str, hwm: int, partition: str | int = GLOBAL,
            extra: dict | None = None) -> None:
        data = self._read()
        p = data.setdefault(pipeline, {})
        p[str(partition)] = {"hwm": hwm, "updated_at": time.time(), **(extra or {})}
        self._write(data)

    def set_many(self, pipeline: str, hwms: dict) -> None:
        data = self._read()
        p = data.setdefault(pipeline, {})
        now = time.time()
        for part, hwm in hwms.items():
            p[str(part)] = {"hwm": int(hwm), "updated_at": now}
        self._write(data)


class ChunkLedger(_JsonStore):
    """Backfill work ledger: seq-range chunks with claim/resume status.

    Reference: transform_chunks with status pending/running/completed/error
    and mid-chunk ``lastProcessedSlot`` resume
    (transaction-transformer.ts:267-432). In Spark the *execution* unit is
    the task, so the ledger exists for restartability + lineage, not for
    work distribution inside a job.
    """

    def plan(self, seq_lo: int, seq_hi: int, chunk_size: int) -> list[dict]:
        data = self._read()
        chunks = data.get("chunks", {})
        lo = seq_lo
        created = []
        while lo <= seq_hi:
            hi = min(lo + chunk_size - 1, seq_hi)
            cid = f"chunk_{lo}_{hi}"
            if cid not in chunks:
                chunks[cid] = {"chunk_id": cid, "seq_lo": lo, "seq_hi": hi,
                               "status": "pending", "last_seq": lo - 1,
                               "updated_at": time.time()}
                created.append(chunks[cid])
            lo = hi + 1
        data["chunks"] = chunks
        self._write(data)
        return created

    def claim_next(self) -> dict | None:
        data = self._read()
        for c in sorted(data.get("chunks", {}).values(), key=lambda c: c["seq_lo"]):
            if c["status"] in ("pending", "error"):
                c["status"] = "running"
                c["updated_at"] = time.time()
                self._write(data)
                return dict(c)
        return None

    def update(self, chunk_id: str, status: str | None = None,
               last_seq: int | None = None, error: str | None = None) -> None:
        data = self._read()
        c = data["chunks"][chunk_id]
        if status is not None:
            c["status"] = status
        if last_seq is not None:
            c["last_seq"] = int(last_seq)
        if error is not None:
            c["error"] = error
        c["updated_at"] = time.time()
        self._write(data)

    def chunks(self) -> list[dict]:
        return sorted(self._read().get("chunks", {}).values(),
                      key=lambda c: c["seq_lo"])


class MetricsLog(_JsonStore):
    """Append-only per-batch / per-partition metrics (north rule: lineage +
    throughput). JSONL append, one line per record."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def append(self, record: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def records(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
