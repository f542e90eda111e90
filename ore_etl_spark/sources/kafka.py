"""Broker-format source seam (SURVEY S6 completion — the realtime queue).

The reference's realtime path consumes JSON change messages off RabbitMQ
with prefetch=10 and a DLQ for poison messages
(/root/reference/src/queue/transaction-consumer.ts:42-143). Spark's native
broker integration is the Kafka source, whose record shape
(key/value binary, topic, partition, offset, timestamp) is also what any
archived record dump carries — so the adapter is split to make the broker
CONNECTION the only piece this sandbox cannot test:

- ``kafka_stream``: the real ``format("kafka")`` readStream. Needs a
  broker (and the spark-sql-kafka connector jar on a real deployment);
  no broker exists in this container, so this function is the documented
  seam — its OUTPUT shape is exactly ``KAFKA_RECORD_FIELDS``, which the
  rest of the module is tested against.
- ``from_kafka_records``: pure DataFrame normalize of broker records →
  WAL events (value JSON → Debezium envelope → ``from_debezium``). Works
  on batch AND streaming frames; this is the tested surface.
- ``read_kafka_archive``: batch replay of an archived record dump
  (parquet or JSONL) through the same normalizer —
  ``CdcApplyPipeline(events_format="kafka")`` uses it, so the full
  batch/backfill/quarantine machinery runs on broker archives unchanged.

Poison handling mirrors the DLQ (reference :150-174): records whose value
is NULL (a compaction tombstone has no row image) or not a parseable
envelope normalize to rows with a NULL ``delivery_seq`` and the raw value
in ``_malformed`` — the exact contract ``read_jsonl_wal`` set, so
``CdcApplyPipeline.quarantine_malformed_source`` parks them (nothing
vanishes, redrive can repair).

Broker metadata fills envelope gaps deterministically: a missing
``delivery_seq`` falls back to ``offset * partition_stride + partition``
(offsets are a total order only within a partition, so the bare offset
would collide across partitions), a missing ``source.partition_id`` to
the Kafka partition, a missing ``ts_ms`` to the broker timestamp in
milliseconds. The fallback is sound for streams where NO envelope
carries a counter ``delivery_seq`` (the backfilled seqs form a
consistent offset-major total order among themselves); a MIXED stream —
some producers stamping small counter seqs, some not — has no correct
interleaving under ANY deterministic backfill, and the inflated
backfilled seqs would drag the high-watermark past the counter range so
later counter-stamped events are skipped as already-applied. For mixed
streams pass ``seq_fallback="quarantine"`` so seq-less envelopes park in
the ``missing_delivery_seq`` quarantine (redrive-able) instead of
guessing an order.

The backfill never GUESSES an identity it can't defend: a seq-less
record whose partition is NULL (partially-populated archive row) or
``>= partition_stride`` (stride misconfigured below the topic's
partition count) gets NO backfilled seq — it parks as
``missing_delivery_seq`` instead of silently colliding with a real
record's delivery_seq/event_id. And the encoding is part of the seq
space: changing ``partition_stride`` (or upgrading across a change to
the encoding itself) over an existing state dir invalidates its
watermarks — backfilled seqs shrink or grow past the stored
high-watermark and events are skipped as already-applied. Re-ingest
into a fresh ``state_dir`` (the WAL/archive is the source of truth)
rather than resuming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .cdc_json import from_debezium, wal_event_schema

# the shape format("kafka") yields — and the shape an archive dump stores
KAFKA_RECORD_FIELDS = [
    ("key", T.BinaryType()),
    ("value", T.BinaryType()),
    ("topic", T.StringType()),
    ("partition", T.IntegerType()),
    ("offset", T.LongType()),
    ("timestamp", T.TimestampType()),
]


def kafka_record_schema() -> T.StructType:
    return T.StructType([T.StructField(n, t, True)
                         for n, t in KAFKA_RECORD_FIELDS])


def debezium_envelope_schema(
        extra_after_fields: list[T.StructField] | None = None) -> T.StructType:
    """The Debezium-style envelope ``from_debezium`` normalizes. Additive
    upstream columns (wire-path schema evolution) ride in ``after`` —
    pass them via ``extra_after_fields``."""
    img = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        *(extra_after_fields or []),
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


def kafka_stream(spark: SparkSession, bootstrap_servers: str, topic: str,
                 starting_offsets: str = "earliest",
                 max_offsets_per_trigger: int | None = 100_000,
                 options: dict | None = None) -> DataFrame:
    """The real broker source (UNTESTABLE in this sandbox — no broker, no
    connector jar; every downstream transformation is tested against the
    identical record shape via ``from_kafka_records``).

    ``maxOffsetsPerTrigger`` is the prefetch-bound analog of the
    reference's ``channel.prefetch(10)`` — it caps a micro-batch so one
    slow batch can't balloon into an OOM-sized catch-up read."""
    b = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        # poison records must reach the quarantine, not kill the stream
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        b = b.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    for k, v in (options or {}).items():
        b = b.option(k, str(v))
    return b.load()


def from_kafka_records(records: DataFrame,
                       envelope_schema: T.StructType | None = None,
                       keep_malformed: bool = False,
                       seq_fallback: str = "broker",
                       partition_stride: int = 1024) -> DataFrame:
    """Normalize broker records into WAL events.

    value bytes → JSON envelope (explicit schema — never inferred) →
    ``from_debezium``; broker metadata backfills missing envelope fields
    (offset → delivery_seq, partition → partition_id, timestamp → ts_ms).

    Rows whose value is NULL or is not a recognizable envelope (no known
    ``op``) come back with NULL ``delivery_seq`` and the raw value text
    in ``_malformed`` when ``keep_malformed=True`` (otherwise they are
    filtered here and the pipeline's ``quarantine_malformed_source``
    parks them). Valid envelopes with non-row ops ('t' truncate / 'm'
    message) are recognized — not poison — and then dropped by design in
    ``from_debezium`` (no row image).

    ``seq_fallback``:

    - ``"broker"`` (default): a seq-less envelope backfills
      ``delivery_seq = offset * partition_stride + partition``. Use for
      streams where envelopes never carry their own counter seq — the
      backfilled seqs are then a consistent offset-major total order.
      Do NOT mix with counter-stamped envelopes (see the module
      docstring). A seq-less record with a NULL partition or a partition
      ``>= partition_stride`` is NOT backfilled — any guessed value
      could collide with a real record's identity — it keeps a NULL
      ``delivery_seq`` and parks as ``missing_delivery_seq``
      (redrive-able once the row is repaired or the stride corrected).
    - ``"quarantine"``: no backfill — a seq-less envelope keeps a NULL
      ``delivery_seq`` and the pipeline parks it as
      ``missing_delivery_seq``. The safe choice for mixed streams.

    ``partition_stride`` must exceed the topic's partition count (two
    partitions p and p' at offsets o and o+1 collide iff
    p - p' = ±stride; records at partitions >= stride are therefore
    parked, never backfilled). The default 1024 covers typical topics
    while inflating the seq span only 1024× — span-proportional
    machinery (``ChunkLedger.plan`` chunk counts, ``run(batch_span=)``)
    should scale its range sizes by the stride when planning over a
    backfilled archive. Set it to the topic's actual partition count for
    a dense seq space (span ≈ record count). The stride is part of the
    seq ENCODING — see the module docstring before changing it over an
    existing state dir.

    ``keep_malformed=True`` additionally carries every record's original
    value text in ``_raw`` (same contract as ``read_jsonl_wal``): a
    VALID envelope that ends up seq-less parks with its true source
    bytes, not a lossy re-render — two distinct seq-less records
    differing only outside the envelope schema stay distinct in the
    quarantine."""
    if seq_fallback not in ("broker", "quarantine"):
        raise ValueError("seq_fallback must be 'broker' or 'quarantine'")
    if partition_stride < 1:
        raise ValueError("partition_stride must be >= 1")
    env_schema = envelope_schema or debezium_envelope_schema()
    parsed = records.select(
        F.col("value").cast("string").alias("_raw"),
        F.col("partition").alias("_kpartition"),
        F.col("offset").alias("_koffset"),
        F.col("timestamp").alias("_kts"),
    ).withColumn("_env", F.from_json(F.col("_raw"), env_schema))
    # an envelope is usable iff it names a KNOWN op; everything else —
    # null value, non-JSON bytes, JSON of some other shape, unknown op —
    # is poison (the reference DLQs what it can't process, :150-174).
    # NULL-safe: a parsed envelope with op=NULL makes the isin() NULL,
    # and a NULL predicate fails BOTH filter(ok) and filter(~ok) — the
    # row would silently vanish from the two-way split without coalesce.
    ok = F.coalesce(
        F.col("_env").isNotNull()
        & F.col("_env.op").isin("c", "u", "d", "r", "t", "m"),
        F.lit(False))
    # offset is a total order only WITHIN a partition — two partitions
    # both have an offset 7, and a bare-offset fallback would collide
    # delivery_seq (and the event_id derived from it) across them.
    # offset * stride + partition is unique (for partitions < stride)
    # and per-partition monotone; offset-major order keeps
    # delivery_seq roughly time-ordered across partitions filling at
    # similar rates, so watermark batches drain all partitions
    # together instead of one at a time. The when() guard refuses to
    # backfill a NULL partition (condition NULL → no branch → NULL seq)
    # or a partition >= stride: either guess could silently share a
    # delivery_seq/event_id with a REAL record, so both park as
    # missing_delivery_seq instead (recoverable; identity is never
    # invented).
    backfill = F.when(
        F.col("_kpartition").cast("long") < F.lit(int(partition_stride)),
        F.col("_koffset") * F.lit(int(partition_stride))
        + F.col("_kpartition").cast("long"),
    )
    envs = parsed.filter(ok).select(
        F.col("_env.op").alias("op"),
        F.col("_env.before").alias("before"),
        F.col("_env.after").alias("after"),
        F.struct(
            F.col("_env.source.commit_seq").alias("commit_seq"),
            F.col("_env.source.event_seq").alias("event_seq"),
            F.coalesce(F.col("_env.source.partition_id"),
                       F.col("_kpartition")).alias("partition_id"),
        ).alias("source"),
        (F.col("_env.delivery_seq") if seq_fallback == "quarantine"
         else F.coalesce(F.col("_env.delivery_seq"), backfill)
         ).alias("delivery_seq"),
        # unix_millis, not unix_timestamp*1000: the latter truncates to
        # whole seconds and ts_ms is a millisecond-precision contract
        F.coalesce(F.col("_env.ts_ms"),
                   F.unix_millis(F.col("_kts"))).alias("ts_ms"),
        # original value bytes ride along so a valid-but-seq-less row
        # can quarantine with its TRUE source line (read_jsonl_wal
        # parity) — from_debezium passes _raw through untouched
        *([F.col("_raw")] if keep_malformed else []),
    )
    wal = from_debezium(envs)
    if not keep_malformed:
        # read_jsonl_wal parity: a row without a delivery_seq can never
        # enter a watermark batch — returning it here would make it
        # silently vanish downstream. The keep_malformed path keeps it
        # for quarantine_malformed_source to park.
        return wal.filter(F.col("delivery_seq").isNotNull())
    bad = parsed.filter(~ok).select(
        *[F.col("_raw") if f.name == "_raw"
          else F.lit(None).cast(f.dataType).alias(f.name)
          for f in wal.schema.fields],
        F.coalesce(F.col("_raw"),
                   F.lit("<null kafka record value>")).alias("_malformed"),
    )
    return wal.withColumn("_malformed",
                          F.lit(None).cast("string")).unionByName(bad)


def read_kafka_archive(spark: SparkSession, path: str,
                       archive_format: str = "parquet",
                       envelope_schema: T.StructType | None = None,
                       keep_malformed: bool = False,
                       seq_fallback: str = "broker",
                       partition_stride: int = 1024) -> DataFrame:
    """Batch replay of an archived broker record dump through the same
    normalizer the stream uses (record shape = ``kafka_record_schema``)."""
    if archive_format == "jsonl":
        rec = spark.read.schema(kafka_record_schema()).json(path)
    else:
        rec = spark.read.parquet(path)
    return from_kafka_records(rec, envelope_schema=envelope_schema,
                              keep_malformed=keep_malformed,
                              seq_fallback=seq_fallback,
                              partition_stride=partition_stride)


__all__ = [
    "KAFKA_RECORD_FIELDS", "kafka_record_schema",
    "debezium_envelope_schema", "kafka_stream", "from_kafka_records",
    "read_kafka_archive", "wal_event_schema",
]
