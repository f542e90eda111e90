"""Broker-format source seam (S6 realtime parity; round-5).

The reference consumes JSON change messages off RabbitMQ with a DLQ for
poison messages (/root/reference/src/queue/transaction-consumer.ts:42-174).
No broker exists in this sandbox, so the untestable piece is confined to
``kafka_stream`` (the format("kafka") builder); everything downstream —
record→envelope→WAL normalization, broker-metadata backfill, poison→DLQ
routing, batch archive replay, streaming stand-in — is tested here against
the identical record shape.
"""

import datetime
import json

import pytest
from pyspark.sql import functions as F

from ore_etl_spark.datagen.wal import generate_wal  # noqa: F401 (fixture peers)
from ore_etl_spark.pipeline.apply import CdcApplyPipeline, target_schema
from ore_etl_spark.sources.kafka import (from_kafka_records,
                                         kafka_record_schema,
                                         read_kafka_archive)
from ore_etl_spark.tables.merge_table import MergeTable


def _env(op, who, ver, content, with_seq=True, before=False, with_ts=True):
    image = {"repo": who, "path": f"src/{who}.py", "commit": f"c{ver}",
             "lang": "python", "content": content}
    d = {
        "op": op,
        "before": image if before else None,
        "after": None if op == "d" else image,
        "source": {"commit_seq": ver, "event_seq": 0,
                   "partition_id": 0 if with_seq else None},
    }
    if with_ts:
        d["ts_ms"] = 1_700_000_000_000 + ver
    if op == "d":
        d["before"], d["after"] = image, None
    if with_seq:
        d["delivery_seq"] = ver
    return json.dumps(d)


def _records(spark, rows):
    """rows: list of (value: bytes|None, partition, offset)."""
    ts = datetime.datetime(2024, 1, 2, 3, 4, 5)
    data = [(None, v, "topic-a", p, o, ts) for v, p, o in rows]
    return spark.createDataFrame(data, kafka_record_schema())


def _archive(spark, tmpdir_path, rows, name="kafka_archive"):
    path = f"{tmpdir_path}/{name}"
    _records(spark, rows).write.parquet(path)
    return path


GOOD = [
    (_env("c", "alice", 1, "v1").encode(), 0, 101),
    (_env("u", "alice", 2, "v2").encode(), 0, 102),
    (_env("c", "bob", 3, "hello").encode(), 1, 103),
    (_env("d", "bob", 4, "hello").encode(), 1, 104),
    (_env("r", "carol", 5, "snap").encode(), 0, 105),
    # no delivery_seq / partition_id in the envelope: broker metadata
    # (offset 106, partition 1) must backfill them
    (_env("c", "dave", 6, "dv", with_seq=False).encode(), 1, 106),
]
POISON = [
    (None, 0, 200),                                   # compaction tombstone
    (b"<<not json at all", 1, 201),                   # broken bytes
    (json.dumps({"op": "x", "after": None}).encode(), 0, 202),  # unknown op
    (json.dumps({"foo": 1}).encode(), 1, 203),        # JSON, not an envelope
]
NON_ROW = [
    (json.dumps({"op": "t", "source": {"commit_seq": 9}}).encode(), 0, 300),
]


def test_from_kafka_records_normalizes_and_backfills(spark):
    wal = from_kafka_records(_records(spark, GOOD))
    rows = {r["delivery_seq"]: r for r in wal.collect()}
    # dave's envelope had no delivery_seq/partition_id: broker metadata
    # backfills as offset * stride + partition — NOT the bare offset,
    # which is only ordered within a partition
    dave_seq = 106 * 1024 + 1
    assert set(rows) == {1, 2, 3, 4, 5, dave_seq}
    assert rows[dave_seq]["repo"] == "dave"
    assert rows[dave_seq]["partition_id"] == 1
    assert rows[2]["op"] == "UPDATE" and rows[4]["op"] == "DELETE"
    assert rows[4]["repo"] == "bob"  # delete keyed by the before image


def test_kafka_seq_backfill_is_unique_across_partitions(spark):
    """Two seq-less envelopes at the SAME offset in different partitions
    must not collide on delivery_seq (or the event_id derived from it) —
    Kafka offsets are per-partition sequences, not a global order. And a
    ms-precision broker timestamp backfills ts_ms without second
    truncation."""
    ts = datetime.datetime(2024, 1, 2, 3, 4, 5, 678000)
    rows = [
        (None, _env("c", "p0", 10, "a", with_seq=False,
                    with_ts=False).encode(), "topic-a", 0, 7, ts),
        (None, _env("c", "p1", 11, "b", with_seq=False,
                    with_ts=False).encode(), "topic-a", 1, 7, ts),
    ]
    # _env(with_seq=False) still fixes partition_id=None in source
    rec = spark.createDataFrame(rows, kafka_record_schema())
    wal = from_kafka_records(rec).collect()
    seqs = {r["delivery_seq"] for r in wal}
    ids = {r["event_id"] for r in wal}
    assert seqs == {7 * 1024 + 0, 7 * 1024 + 1}
    assert len(ids) == 2
    # within-partition order is preserved by the offset-major encoding
    assert 8 * 1024 + 0 > 7 * 1024 + 1023 > 6 * 1024 + 0
    # ts came from the broker timestamp at millisecond precision: the
    # engine's ts is the envelope ts_ms rendered UTC — check the WAL ts
    # second fraction survived (05.678, not 05.000)
    assert all(r["ts"].microsecond == 678000 for r in wal)


def test_kafka_seq_fallback_quarantine_for_mixed_streams(spark):
    """A mixed stream (some envelopes counter-stamped, some seq-less) has
    no correct interleaving under any deterministic backfill — a
    backfilled offset-scale seq would drag the hwm past the counter range
    and later counter-stamped events would be skipped as applied.
    seq_fallback='quarantine' keeps seq-less envelopes at NULL seq (the
    missing_delivery_seq park path) instead of guessing."""
    recs = _records(spark, GOOD)
    wal = from_kafka_records(recs, keep_malformed=True,
                             seq_fallback="quarantine")
    live = wal.filter(F.col("delivery_seq").isNotNull()).collect()
    assert {r["delivery_seq"] for r in live} == {1, 2, 3, 4, 5}
    # dave (the seq-less envelope) is NOT assigned a broker seq; its
    # decoded row survives with NULL seq for the quarantine path
    parked = wal.filter(F.col("delivery_seq").isNull()
                        & F.col("_malformed").isNull()).collect()
    assert {r["repo"] for r in parked} == {"dave"}

    with pytest.raises(ValueError):
        from_kafka_records(recs, seq_fallback="nonsense")


def test_kafka_unbackfillable_partitions_park_not_collide(spark):
    """The backfill never invents identity: a seq-less record with a
    NULL partition (partially-populated archive row) or a partition
    >= stride (stride misconfigured below the topic's partition count)
    gets NO guessed seq — guessing either could silently share a
    delivery_seq/event_id with a REAL record (NULL->0 collides with true
    partition 0 at the same offset; p=1500 at stride 1024 collides with
    p=476 one offset later). Both park as missing_delivery_seq with
    their ORIGINAL envelope bytes; a real sub-stride partition at the
    same offset still ingests."""
    ts = datetime.datetime(2024, 1, 2, 3, 4, 5)
    nopart = _env("c", "nopart", 1, "x", with_seq=False)
    toobig = _env("c", "toobig", 2, "y", with_seq=False)
    rows = [
        (None, nopart.encode(), "topic-a", None, 50, ts),
        (None, toobig.encode(), "topic-a", 9, 50, ts),   # stride below 9
        (None, _env("c", "ok", 3, "z", with_seq=False).encode(),
         "topic-a", 0, 50, ts),
    ]
    rec = spark.createDataFrame(rows, kafka_record_schema())
    wal = from_kafka_records(rec, keep_malformed=True, partition_stride=8)
    live = wal.filter(F.col("delivery_seq").isNotNull()).collect()
    assert [(r["repo"], r["delivery_seq"]) for r in live] == [("ok", 400)]
    parked = wal.filter(F.col("delivery_seq").isNull()
                        & F.col("_malformed").isNull()).collect()
    assert {r["repo"] for r in parked} == {"nopart", "toobig"}
    # the quarantine payload is the TRUE envelope bytes, not a re-render
    assert {r["_raw"] for r in parked} == {nopart, toobig}
    # default (non-keep) path simply filters them — the pipeline's
    # quarantine_malformed_source is what parks them
    assert from_kafka_records(rec, partition_stride=8).count() == 1


def test_kafka_poison_routes_to_malformed_not_silence(spark):
    recs = _records(spark, GOOD + POISON + NON_ROW)
    wal = from_kafka_records(recs, keep_malformed=True)
    dead = wal.filter(F.col("delivery_seq").isNull()).collect()
    # the 4 poison records — and ONLY them — survive as dead rows with
    # their raw value; the 't' envelope is recognized and dropped by
    # design (no row image), never misfiled as poison
    assert len(dead) == 4
    raws = {r["_malformed"] for r in dead}
    assert "<null kafka record value>" in raws
    assert "<<not json at all" in raws
    assert json.dumps({"foo": 1}) in raws
    assert wal.filter(F.col("delivery_seq").isNotNull()).count() == len(GOOD)
    # default path: dead rows are filtered (the pipeline parks them)
    assert from_kafka_records(recs).count() == len(GOOD)


def test_kafka_archive_replay_applies_and_quarantines(spark, tmpdir_path):
    """Full-pipeline parity: an archived broker dump replays through the
    standard batch path — LWW state, tombstones, and the poison DLQ all
    behave exactly like the parquet/jsonl WAL forms."""
    path = _archive(spark, tmpdir_path, GOOD + POISON + NON_ROW)
    tbl = MergeTable.create(
        spark, f"{tmpdir_path}/target", target_schema(),
        key_cols=["repo", "path"], version_cols=["commit_seq", "event_seq"],
        n_buckets=8,
    )
    pipe = CdcApplyPipeline(spark, path, tbl, f"{tmpdir_path}/state",
                            events_format="kafka")
    pipe.run()
    state = {(r["repo"], r["path"]): (r["commit_seq"], r["content_len"])
             for r in tbl.read().collect()}
    assert set(state) == {("alice", "src/alice.py"),
                          ("carol", "src/carol.py"),
                          ("dave", "src/dave.py")}
    assert state[("alice", "src/alice.py")] == (2, len("v2"))
    dead_keys = {(r["repo"], r["path"]) for r in
                 tbl.read(with_deleted=True)
                 .filter(F.col("_deleted")).collect()}
    assert dead_keys == {("bob", "src/bob.py")}
    # DLQ: every poison record parked once, tagged, idempotent on re-scan
    q = pipe.quarantine().collect()
    assert len(q) == len(POISON)
    assert {r["error"] for r in q} == {"malformed_source_line"}
    assert pipe.quarantine_malformed_source() == 0


def test_kafka_pipeline_source_options_quarantine(spark, tmpdir_path):
    """``CdcApplyPipeline(source_options=...)`` must reach the kafka
    reader: with seq_fallback='quarantine' the seq-less envelope (dave)
    is parked as missing_delivery_seq — never applied under a guessed
    broker seq — alongside the poison DLQ rows, and the park is
    idempotent across re-scans."""
    path = _archive(spark, tmpdir_path, GOOD + POISON)
    tbl = MergeTable.create(
        spark, f"{tmpdir_path}/target_q", target_schema(),
        key_cols=["repo", "path"], version_cols=["commit_seq", "event_seq"],
        n_buckets=8,
    )
    pipe = CdcApplyPipeline(spark, path, tbl, f"{tmpdir_path}/state_q",
                            events_format="kafka",
                            source_options={"seq_fallback": "quarantine"})
    pipe.run()
    assert {r["repo"] for r in tbl.read().collect()} == {"alice", "carol"}
    q = pipe.quarantine().collect()
    errs = {r["error"] for r in q}
    assert errs == {"malformed_source_line", "missing_delivery_seq"}
    parked = [r for r in q if r["error"] == "missing_delivery_seq"]
    assert len(parked) == 1 and '"dave"' in parked[0]["payload"]
    assert pipe.quarantine_malformed_source() == 0


def test_kafka_pipeline_source_options_stride(spark, tmpdir_path):
    """partition_stride passes through both pipeline entry points: the
    batch reader's backfilled seq for dave becomes offset*4 + partition,
    and the streaming path sees the identical seq."""
    from ore_etl_spark.pipeline.continuous import stream_decoded

    path = _archive(spark, tmpdir_path, GOOD)
    pipe = CdcApplyPipeline(spark, path, None, f"{tmpdir_path}/state_s",
                            events_format="kafka",
                            source_options={"partition_stride": 4})
    seqs = {r["delivery_seq"] for r in pipe.events().collect()}
    assert seqs == {1, 2, 3, 4, 5, 106 * 4 + 1}

    seen = set()

    def apply_fn(batch_df, epoch_id):
        seen.update(r["delivery_seq"] for r in
                    batch_df.filter(F.col("is_valid")).collect())

    q = stream_decoded(spark, path, None, f"{tmpdir_path}/sckpt", apply_fn,
                       events_format="kafka",
                       source_options={"partition_stride": 4})
    q.awaitTermination(180)
    assert seen == seqs


def test_kafka_stream_standin_matches_archive(spark, tmpdir_path):
    """The streaming path (file-backed record stand-in, identical record
    shape to format('kafka')) must deliver the same valid rows and the
    same poison (raw value preserved) as the batch archive read."""
    from ore_etl_spark.pipeline.continuous import stream_decoded

    path = _archive(spark, tmpdir_path, GOOD + POISON)
    seen = {"valid": 0, "malformed": set(), "seqs": set()}

    def apply_fn(batch_df, epoch_id):
        assert "_malformed" in batch_df.columns
        dead = batch_df.filter(F.col("delivery_seq").isNull()
                               & F.col("_malformed").isNotNull()).collect()
        seen["malformed"] |= {r["_malformed"] for r in dead}
        ok = batch_df.filter(F.col("is_valid")).collect()
        seen["valid"] += len(ok)
        seen["seqs"] |= {r["delivery_seq"] for r in ok}

    q = stream_decoded(spark, path, None, f"{tmpdir_path}/kckpt", apply_fn,
                       events_format="kafka")
    q.awaitTermination(180)
    assert seen["valid"] == len(GOOD)
    assert seen["seqs"] == {1, 2, 3, 4, 5, 106 * 1024 + 1}
    batch = read_kafka_archive(spark, path, keep_malformed=True)
    batch_raws = {r["_malformed"] for r in
                  batch.filter(F.col("_malformed").isNotNull()).collect()}
    assert seen["malformed"] == batch_raws and len(batch_raws) == len(POISON)


def test_kafka_extra_after_field_named_raw_does_not_collide(spark):
    """Wire-path schema evolution can ship ANY after-image field name —
    including one named like a reader-reserved column. An extra after
    field '_raw' must alias to src__raw instead of colliding with the
    keep_malformed reader's own _raw (which would raise
    AMBIGUOUS_REFERENCE in the bad-row builder and kill the ingest)."""
    from pyspark.sql import types as T

    from ore_etl_spark.sources.kafka import debezium_envelope_schema

    schema = debezium_envelope_schema([T.StructField("_raw", T.StringType())])
    env = json.loads(_env("c", "evo", 1, "x"))
    env["after"]["_raw"] = "upstream-raw-value"
    recs = _records(spark, [(json.dumps(env).encode(), 0, 500)])
    wal = from_kafka_records(recs, envelope_schema=schema,
                             keep_malformed=True)
    rows = wal.filter(F.col("delivery_seq").isNotNull()).collect()
    assert len(rows) == 1
    assert rows[0]["src__raw"] == "upstream-raw-value"
    # the reader's own _raw still carries the record's original bytes
    assert '"evo"' in rows[0]["_raw"]
