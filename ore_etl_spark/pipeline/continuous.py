"""Continuous tail mode (SURVEY T3) + Structured Streaming variant.

The reference polls getSlotRange() every 5 s after draining chunks
(/root/reference/src/etl/transaction-transformer.ts:70-87,135-151). Here:

- ``tail_loop``: the batch-incremental analog — poll the WAL head, apply
  any new delivery range as one micro-batch, sleep; exactly-once comes from
  the same batch-id manifests, so a crash mid-loop never double-applies.
- ``stream_decoded``: a real Structured Streaming pipeline over the WAL
  directory (readStream -> decode -> foreachBatch apply). foreachBatch
  gives the same MERGE sink the batch path uses; Spark's checkpointLocation
  tracks source offsets while our snapshot manifests keep the sink
  idempotent (belt + suspenders across the two failure domains).
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.decode import decode_events
from .apply import CdcApplyPipeline


def tail_loop(
    pipe: CdcApplyPipeline,
    poll_interval_s: float = 5.0,
    max_polls: int | None = None,
    on_batch: Callable[[dict], None] | None = None,
    stop_when_idle: bool = False,
) -> list[dict]:
    """Poll the WAL head; apply new events as they appear."""
    results = []
    polls = 0
    # JSONL archives: park fully-malformed lines (no delivery_seq — the
    # watermark loop below could never see them) before tailing
    pipe.quarantine_malformed_source()
    while max_polls is None or polls < max_polls:
        polls += 1
        hwm = pipe.checkpoints.get(pipe.pipeline)
        _, head = pipe.delivery_range()
        if head is not None and head > hwm:
            rec = pipe.run_batch(max(hwm, -1), head)
            results.append(rec)
            if on_batch:
                on_batch(rec)
        elif stop_when_idle:
            break
        else:
            time.sleep(poll_interval_s)
    return results


def stream_decoded(
    spark: SparkSession,
    events_path: str,
    schema,
    checkpoint_dir: str,
    apply_fn: Callable[[DataFrame, int], None],
    trigger_once: bool = True,
    events_format: str = "parquet",
    broker: dict | None = None,
    source_options: dict | None = None,
):
    """Structured Streaming over the WAL directory with a foreachBatch sink.

    ``apply_fn(batch_df, epoch_id)`` receives decoded micro-batches (valid
    and quarantine rows both, discriminated by ``is_valid``).
    ``events_format='jsonl'`` streams a newline-delimited JSON archive
    with the same explicit schema (schema-on-read; the raw-queue shape the
    reference consumes). Mirroring ``read_jsonl_wal``'s batch contract, a
    ``_malformed`` corrupt-record column carries the raw text of non-JSON
    lines into the micro-batch, and ``_raw`` carries EVERY line's original
    text — so foreachBatch consumers can park any dead row (non-JSON OR
    valid-JSON-but-seq-less) by its true source bytes, exactly like the
    batch path's quarantine after the round-5 raw-line fix.

    ``events_format='kafka'`` streams broker records (S6 realtime
    parity). ``broker`` selects the physical source: a dict (
    ``{"bootstrap_servers": ..., "topic": ...}``) connects the real
    ``format("kafka")`` source via ``sources.kafka.kafka_stream``
    (untestable in this sandbox — no broker); ``None`` streams an
    archived record dump at ``events_path`` with the identical record
    shape (the tested stand-in). Either way records normalize through
    ``from_kafka_records(keep_malformed=True)`` — poison records reach
    the micro-batch with NULL delivery_seq and the raw value in
    ``_malformed``, same as the jsonl contract, and ``schema`` is the
    ENVELOPE schema (None = Debezium default). ``source_options`` passes
    reader kwargs (for kafka: ``seq_fallback``/``partition_stride`` —
    see sources/kafka.py).
    """
    if events_format == "kafka":
        from ..sources.kafka import (from_kafka_records, kafka_record_schema,
                                     kafka_stream)

        if broker is not None:
            rec = kafka_stream(spark, broker["bootstrap_servers"],
                               broker["topic"],
                               **{k: v for k, v in broker.items()
                                  if k not in ("bootstrap_servers", "topic")})
        else:
            rec = (
                spark.readStream.schema(kafka_record_schema())
                .option("maxFilesPerTrigger", "16")
                .parquet(events_path)
            )
        src = from_kafka_records(rec, envelope_schema=schema,
                                 keep_malformed=True,
                                 **(source_options or {}))
    elif events_format == "jsonl":
        from pyspark.sql import types as T

        stream_schema = T.StructType(
            list(schema.fields)
            + [T.StructField("_malformed", T.StringType(), True)])
        # text + from_json (the batch reader's keep_malformed construction):
        # EVERY line keeps its original text in _raw, so foreachBatch
        # consumers can park seq-less valid-JSON rows by their true source
        # bytes too, not just non-JSON lines — full batch-quarantine parity
        raw = (
            spark.readStream
            .option("maxFilesPerTrigger", "16")
            .text(events_path)
            # the JSON datasource skips whitespace-only lines; mirror it
            .filter(F.length(F.trim(F.col("value"))) > 0)
        )
        src = raw.select(
            F.from_json(F.col("value"), stream_schema,
                        {"mode": "PERMISSIVE",
                         "columnNameOfCorruptRecord": "_malformed"})
            .alias("j"),
            F.col("value").alias("_raw"),
        ).select("j.*", "_raw")
    else:
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "16")
            .parquet(events_path)
        )
    decoded = decode_events(src)
    writer = (
        decoded.writeStream.foreachBatch(apply_fn)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_rates(spark: SparkSession, events_path: str, schema,
                   window: str = "1 hour"):
    """Streaming tumbling-window event rates with watermarked late data
    (SURVEY T9/W analog; memory sink for tests)."""
    src = spark.readStream.schema(schema).parquet(events_path)
    return (
        src.withColumn("ts2", F.col("ts").cast("timestamp"))
        .withWatermark("ts2", "1 hour")
        .groupBy(F.window("ts2", window), "op")
        .agg(F.count("*").alias("n"))
    )
