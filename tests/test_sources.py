"""JSON change-event sources (round-3): the engine must be source-format
agnostic — the reference's events arrive as JSON messages
(/root/reference/src/services/transaction-consumer.ts), and the parquet
WAL is just their archived form.

- JSONL WAL end-to-end: the same adversarial WAL serialized as
  newline-delimited JSON, applied through CdcApplyPipeline, converges to
  the pandas replay oracle (identical to the parquet path).
- Malformed JSON lines are quarantined, never silently dropped.
- Debezium envelopes (c/u/d ops, before/after images) normalize into WAL
  events whose replay produces the expected keyed state incl. deletes.
"""

import json
import os

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T

from ore_etl_spark.datagen.wal import generate_wal, replay_oracle
from ore_etl_spark.pipeline.apply import CdcApplyPipeline, target_schema
from ore_etl_spark.sources.cdc_json import (from_debezium, read_jsonl_wal,
                                            wal_event_schema)
from ore_etl_spark.tables.merge_table import MergeTable


def _make_pipe(spark, tmpdir_path, events_path, events_format):
    tbl = MergeTable.create(
        spark, f"{tmpdir_path}/target", target_schema(),
        key_cols=["repo", "path"], version_cols=["commit_seq", "event_seq"],
        n_buckets=8,
    )
    return CdcApplyPipeline(spark, events_path, tbl, f"{tmpdir_path}/state",
                            events_format=events_format)


def test_jsonl_wal_replay_matches_parquet_oracle(spark, tmpdir_path):
    wal = generate_wal(spark, n_keys=300, n_partitions=4)
    pq_path = f"{tmpdir_path}/events_pq"
    wal.write.parquet(pq_path)
    jl_path = f"{tmpdir_path}/events_jsonl"
    # serialize the SAME WAL as newline-delimited JSON
    spark.read.parquet(pq_path).write.json(jl_path)

    pipe = _make_pipe(spark, tmpdir_path, jl_path, "jsonl")
    # schema-on-read must round-trip types (ts is timestamp_ntz)
    assert dict(pipe.events().dtypes)["ts"] == "timestamp_ntz"
    pipe.run()

    exp = replay_oracle(spark.read.parquet(pq_path).toPandas())
    got = (
        pipe.table.read()
        .select("repo", "path", "commit", "lang", "commit_seq", "event_seq",
                "content_sha256", "content_len")
        .toPandas()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    exp = exp[got.columns.tolist()].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_malformed_jsonl_lines_are_quarantined_not_dropped(spark, tmpdir_path):
    wal = generate_wal(spark, n_keys=50, n_partitions=2, corrupt_rate_permille=0)
    jl_path = f"{tmpdir_path}/events_jsonl"
    wal.write.json(jl_path)
    # drop a garbage line into the directory as its own file (appending to
    # a part file would break its Hadoop .crc sidecar)
    with open(os.path.join(jl_path, "part-zz-malformed.json"), "w") as f:
        f.write("{this is not json\n")

    pipe = _make_pipe(spark, tmpdir_path, jl_path, "jsonl")
    n_events = wal.count()
    # default read filters the bad line out of the batchable stream...
    assert read_jsonl_wal(spark, jl_path).count() == n_events
    # ...and run() parks it in quarantine first (it has no delivery_seq,
    # so the watermark loop could never see it)
    pipe.run()
    q = pipe.quarantine().collect()
    assert len(q) == 1
    assert q[0]["error"] == "malformed_source_line"
    assert q[0]["payload"].startswith("{this is not json")
    # the valid events all applied
    assert pipe.table.read().count() > 0


def test_missing_delivery_seq_rows_are_quarantined(spark, tmpdir_path):
    """A syntactically VALID JSON line that lacks (or nulls) delivery_seq
    can never enter a watermark batch — it must be parked with a distinct
    error tag, not silently vanish (the nothing-vanishes contract covers
    more than non-JSON lines)."""
    wal = generate_wal(spark, n_keys=40, n_partitions=2,
                       corrupt_rate_permille=0)
    jl_path = f"{tmpdir_path}/events_jsonl"
    wal.write.json(jl_path)
    n_events = wal.count()
    lines = [
        json.dumps({"event_id": 999999, "op": "INSERT",
                    "repo": "ghost", "path": "src/ghost.py",
                    "payload": "AAAA"}),
        json.dumps({"event_id": 999998, "delivery_seq": None,
                    "repo": "ghost2"}),
        # round-4 ADVICE: these two differ ONLY in a non-schema field —
        # the old to_json re-render collapsed them to one parked row and
        # lost the second original line; with _raw both must survive
        json.dumps({"event_id": 999997, "repo": "ghost3",
                    "upstream_note": "first"}),
        json.dumps({"event_id": 999997, "repo": "ghost3",
                    "upstream_note": "second"}),
        # verbatim duplicate of line 1: still dedups to one row
        json.dumps({"event_id": 999999, "op": "INSERT",
                    "repo": "ghost", "path": "src/ghost.py",
                    "payload": "AAAA"}),
    ]
    with open(os.path.join(jl_path, "part-zz-noseq.json"), "w") as f:
        f.write("\n".join(lines) + "\n")

    # batchable stream excludes ALL seq-less rows
    assert read_jsonl_wal(spark, jl_path).count() == n_events
    pipe = _make_pipe(spark, tmpdir_path, jl_path, "jsonl")
    pipe.run()
    rows = pipe.quarantine().collect()
    assert {r["error"] for r in rows} == {"missing_delivery_seq"}
    # 5 source lines -> 4 parked (only the verbatim duplicate collapses)
    assert len(rows) == 4
    # payloads are the ORIGINAL source bytes, redrive-repairable
    assert sorted(r["payload"] for r in rows) == sorted(set(lines))
    # idempotent: a second scan parks nothing new
    assert pipe.quarantine_malformed_source() == 0


def test_streaming_jsonl_malformed_carries_raw_line(spark, tmpdir_path):
    """Streaming parity with read_jsonl_wal's quarantine contract: a
    non-JSON line must reach foreachBatch with its raw text in
    _malformed (not as an anonymous all-NULL row), and EVERY dead row —
    including a valid-JSON line that lacks delivery_seq — must carry its
    original source bytes in _raw, so the consumer can park true lines
    (the batch path's round-5 raw-line contract)."""
    from ore_etl_spark.pipeline.continuous import stream_decoded

    wal = generate_wal(spark, n_keys=30, n_partitions=2,
                       corrupt_rate_permille=0)
    jl_path = f"{tmpdir_path}/events_jsonl"
    wal.write.json(jl_path)
    noseq_line = json.dumps({"event_id": 424242, "repo": "ghost",
                             "upstream_note": "not in schema"})
    with open(os.path.join(jl_path, "part-zz-bad.json"), "w") as f:
        f.write("<<not json at all\n")
        f.write(noseq_line + "\n")

    seen = {"malformed": [], "noseq_raw": [], "valid": 0}

    def apply_fn(batch_df, epoch_id):
        assert "_malformed" in batch_df.columns
        assert "_raw" in batch_df.columns
        # dead rows (can never be watermarked) carry their raw line —
        # same predicate the batch path's quarantine uses
        dead = batch_df.filter(F.col("delivery_seq").isNull()).collect()
        seen["malformed"].extend(
            r["_malformed"] for r in dead if r["_malformed"] is not None)
        seen["noseq_raw"].extend(
            r["_raw"] for r in dead if r["_malformed"] is None)
        seen["valid"] += batch_df.filter(F.col("is_valid")).count()

    q = stream_decoded(spark, jl_path, wal_event_schema(),
                       f"{tmpdir_path}/malckpt", apply_fn,
                       events_format="jsonl")
    q.awaitTermination(180)
    assert seen["malformed"] == ["<<not json at all"]
    # the seq-less valid-JSON row arrived with its ORIGINAL bytes,
    # non-schema field and all
    assert seen["noseq_raw"] == [noseq_line]
    assert seen["valid"] == wal.count()


def test_debezium_envelopes_normalize_and_replay(spark, tmpdir_path):
    img = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ])
    env_schema = T.StructType([
        T.StructField("op", T.StringType()),
        T.StructField("before", img),
        T.StructField("after", img),
        T.StructField("source", T.StructType([
            T.StructField("commit_seq", T.LongType()),
            T.StructField("event_seq", T.LongType()),
            T.StructField("partition_id", T.IntegerType()),
        ])),
        T.StructField("delivery_seq", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
    ])

    def row(op, who, ver, content, before=None):
        image = (who, f"src/{who}.py", f"c{ver}", "python", content)
        return (
            op,
            image if op == "d" else before,
            None if op == "d" else image,
            (ver, 0, 0),
            ver,
            1_700_000_000_000 + ver,
        )

    envs = spark.createDataFrame(
        [
            row("c", "alice", 1, "v1"),
            row("u", "alice", 2, "v2"),
            row("c", "bob", 1, "hello"),
            row("d", "bob", 2, "hello"),   # delete bob via before image
            row("r", "carol", 1, "snap"),  # snapshot read -> INSERT
        ],
        env_schema,
    )
    wal = from_debezium(envs)
    assert set(wal.columns) == {n for n, _ in
                                zip(wal_event_schema().fieldNames(),
                                    wal_event_schema().fields)} \
        or wal.columns == wal_event_schema().fieldNames()

    jl = f"{tmpdir_path}/dbz_wal"
    wal.write.json(jl)
    pipe = _make_pipe(spark, tmpdir_path, jl, "jsonl")
    pipe.run()
    state = {(r["repo"], r["path"]): (r["commit_seq"], r["content_len"])
             for r in pipe.table.read().collect()}
    # bob is tombstoned; alice holds v2's content; carol snapshot applied
    assert set(state) == {("alice", "src/alice.py"), ("carol", "src/carol.py")}
    assert state[("alice", "src/alice.py")][0] == 2
    assert state[("alice", "src/alice.py")][1] == len("v2")
    # the tombstone survives with its version (no resurrection)
    dead = {(r["repo"], r["path"]) for r in
            pipe.table.read(with_deleted=True)
            .filter(F.col("_deleted")).collect()}
    assert dead == {("bob", "src/bob.py")}


def _dbz_env_schema(stars_type):
    img = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("stars", stars_type),
    ])
    return T.StructType([
        T.StructField("op", T.StringType()),
        T.StructField("before", img),
        T.StructField("after", img),
        T.StructField("source", T.StructType([
            T.StructField("commit_seq", T.LongType()),
            T.StructField("event_seq", T.LongType()),
            T.StructField("partition_id", T.IntegerType()),
        ])),
        T.StructField("delivery_seq", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
    ])


def test_debezium_additive_field_lands_in_target_and_widens(spark, tmpdir_path):
    """Wire-path schema evolution (SURVEY §1.2/§7, reference's dynamic
    parsedData surface): an upstream ALTER TABLE that starts shipping a
    new Debezium `after` field must land it in the target additively (not
    silently drop it) and widen int→long across streams — batch AND
    streaming paths."""
    from ore_etl_spark.sources.cdc_json import wal_event_schema

    def envs(schema, stars_val, ver):
        rows = [("c", None,
                 ("alice", "src/alice.py", f"c{ver}", "py", f"v{ver}",
                  stars_val),
                 (ver, 0, 0), ver, 1_700_000_000_000 + ver)]
        return spark.createDataFrame(rows, schema)

    # phase 1: envelopes carry an additive int field `stars`
    wal1 = from_debezium(envs(_dbz_env_schema(T.IntegerType()), 7, 1))
    assert "stars" in wal1.columns  # passed through, not dropped
    jl1 = f"{tmpdir_path}/dbz1"
    wal1.write.json(jl1)
    src_schema1 = T.StructType(
        list(wal_event_schema().fields)
        + [T.StructField("stars", T.IntegerType())])
    tbl = MergeTable.create(
        spark, f"{tmpdir_path}/evo_target", target_schema(),
        key_cols=["repo", "path"], version_cols=["commit_seq", "event_seq"],
        n_buckets=4,
    )
    pipe1 = CdcApplyPipeline(
        spark, jl1, tbl, f"{tmpdir_path}/evo_state1",
        events_format="jsonl", source_schema=src_schema1,
        optional_cols=("size_bytes", "stars"))
    pipe1.run()
    got = tbl.read().collect()
    assert dict(tbl.read().dtypes)["stars"] == "int"
    assert [r["stars"] for r in got] == [7]

    # phase 2: upstream widened stars to long — target widens, data lands
    big = 5_000_000_000
    wal2 = from_debezium(envs(_dbz_env_schema(T.LongType()), big, 2))
    jl2 = f"{tmpdir_path}/dbz2"
    wal2.write.json(jl2)
    src_schema2 = T.StructType(
        list(wal_event_schema().fields)
        + [T.StructField("stars", T.LongType())])
    pipe2 = CdcApplyPipeline(
        spark, jl2, tbl, f"{tmpdir_path}/evo_state2",
        events_format="jsonl", source_schema=src_schema2,
        optional_cols=("size_bytes", "stars"))
    pipe2.run()
    assert dict(tbl.read().dtypes)["stars"] == "bigint"
    assert [r["stars"] for r in
            tbl.read().orderBy("commit_seq").collect()] == [big]

    # streaming leg: the same additive stream through readStream +
    # foreachBatch lands the new column too
    from ore_etl_spark.pipeline.continuous import stream_decoded

    tbl_s = MergeTable.create(
        spark, f"{tmpdir_path}/evo_target_s", target_schema(),
        key_cols=["repo", "path"], version_cols=["commit_seq", "event_seq"],
        n_buckets=4,
    )
    cols = [f.name for f in target_schema().fields] + ["op", "stars"]

    def apply_fn(batch_df, epoch_id):
        valid = batch_df.filter(F.col("is_valid")).select(*cols)
        tbl_s.merge(valid, batch_id=f"evo-epoch-{epoch_id}")

    q = stream_decoded(spark, jl1, src_schema1,
                       f"{tmpdir_path}/evockpt", apply_fn,
                       events_format="jsonl")
    q.awaitTermination(180)
    assert dict(tbl_s.read().dtypes)["stars"] == "int"
    assert [r["stars"] for r in tbl_s.read().collect()] == [7]


def test_debezium_extra_field_colliding_with_wal_column_is_aliased(spark):
    """An upstream image column named like a fixed WAL output column (ts,
    op, size_bytes — common DB names) must not produce a duplicate column;
    it passes through under a deterministic src_ prefix."""
    img = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("ts", T.StringType()),       # collides with WAL ts
        T.StructField("rating", T.IntegerType()),  # clean extra
    ])
    schema = T.StructType([
        T.StructField("op", T.StringType()),
        T.StructField("before", img),
        T.StructField("after", img),
        T.StructField("source", T.StructType([
            T.StructField("commit_seq", T.LongType()),
            T.StructField("event_seq", T.LongType()),
            T.StructField("partition_id", T.IntegerType()),
        ])),
        T.StructField("delivery_seq", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
    ])
    envs = spark.createDataFrame(
        [("c", None, ("r", "p", "c1", "py", "v1", "2020-01-01", 5),
          (1, 0, 0), 1, 1_700_000_000_000)], schema)
    wal = from_debezium(envs)
    assert wal.columns.count("ts") == 1
    row = wal.collect()[0]
    assert row["src_ts"] == "2020-01-01" and row["rating"] == 5
    wal.write.json  # resolvable plan, no ambiguous reference
    assert wal.count() == 1


def test_malformed_parking_is_idempotent_across_redrive(spark, tmpdir_path):
    """A parked malformed line that redrive() has already advanced (or
    dead-lettered) must NOT be re-parked at attempts=1 by the next run()
    — that would resurrect dead letters and retry a permanently-bad line
    forever. The scan anti-joins against every quarantine generation."""
    wal = generate_wal(spark, n_keys=40, n_partitions=2,
                       corrupt_rate_permille=0)
    jl_path = f"{tmpdir_path}/events_jsonl"
    wal.write.json(jl_path)
    with open(os.path.join(jl_path, "part-zz-malformed.json"), "w") as f:
        f.write("{still not json\n")

    pipe = _make_pipe(spark, tmpdir_path, jl_path, "jsonl")
    pipe.run()
    q1 = pipe.quarantine().collect()
    assert len(q1) == 1 and q1[0]["attempts"] == 1

    pipe.redrive()  # still fails decode -> attempts=2 in a new generation
    q2 = pipe.quarantine().collect()
    assert len(q2) == 1 and q2[0]["attempts"] == 2

    # a fresh run over the unchanged source must not re-park a duplicate
    assert pipe.quarantine_malformed_source() == 0
    pipe.run()
    q3 = pipe.quarantine().collect()
    assert len(q3) == 1 and q3[0]["attempts"] == 2

    # two more redrives dead-letter it for good; later runs leave it dead
    pipe.redrive()
    pipe.run()
    q4 = pipe.quarantine().collect()
    assert len(q4) == 1
    assert q4[0]["attempts"] == 3
    assert q4[0]["error"] == "payload_decode_failed_final"


def test_streaming_jsonl_foreachbatch_converges(spark, tmpdir_path):
    """S6 wire-format parity in streaming mode: a JSONL WAL streamed via
    readStream.json + foreachBatch MERGE converges to the same replay
    oracle as the batch paths."""
    from ore_etl_spark.pipeline.continuous import stream_decoded
    from ore_etl_spark.sources.cdc_json import wal_event_schema

    wal = generate_wal(spark, n_keys=150, n_partitions=2)
    jl_path = f"{tmpdir_path}/events_jsonl"
    wal.write.json(jl_path)
    tbl = MergeTable.create(
        spark, f"{tmpdir_path}/starget", target_schema(),
        key_cols=["repo", "path"], version_cols=["commit_seq", "event_seq"],
        n_buckets=8,
    )
    cols = [f.name for f in target_schema().fields] + ["op"]

    def apply_fn(batch_df, epoch_id):
        valid = batch_df.filter(F.col("is_valid")).select(*cols)
        tbl.merge(valid, batch_id=f"jl-epoch-{epoch_id}")

    q = stream_decoded(spark, jl_path, wal_event_schema(),
                       f"{tmpdir_path}/jlckpt", apply_fn,
                       events_format="jsonl")
    q.awaitTermination(180)

    exp = replay_oracle(wal.toPandas())
    got = (
        tbl.read()
        .select("repo", "path", "commit", "lang", "commit_seq", "event_seq",
                "content_sha256", "content_len")
        .toPandas()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    exp = exp[got.columns.tolist()].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
