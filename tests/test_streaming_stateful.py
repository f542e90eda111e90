"""applyInPandasWithState: streaming conditional-LWW gate keeps state
across micro-batches (duplicates and stale events dropped upstream)."""

import pyspark.sql.functions as F

from ore_etl_spark.streaming.stateful import streaming_lww_gate

SCHEMA = ("repo string, path string, commit_seq long, event_seq long, "
          "content string")


def test_streaming_lww_gate_drops_stale_across_batches(spark, tmpdir_path):
    src_dir = f"{tmpdir_path}/stream_src"
    # micro-batch 1: two versions of key (a,x) + one of (b,y)
    spark.createDataFrame([
        ("a", "x", 1, 0, "v1"), ("a", "x", 3, 0, "v3"), ("b", "y", 1, 0, "w1"),
    ], SCHEMA).coalesce(1).write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    out_dir = f"{tmpdir_path}/gated_out"
    gated = streaming_lww_gate(stream, SCHEMA)
    # file sink (memory sink cannot recover from a checkpoint)
    q = (
        gated.writeStream.outputMode("append").format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", f"{tmpdir_path}/ckpt")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out1 = {(r["repo"], r["path"], r["commit_seq"])
            for r in spark.read.parquet(out_dir).collect()}
    assert ("a", "x", 1) in out1 and ("a", "x", 3) in out1  # in-batch order kept
    assert ("b", "y", 1) in out1

    # micro-batch 2: a STALE event for (a,x) and a newer one for (b,y);
    # state must persist across the query RESTART (checkpointed)
    spark.createDataFrame([
        ("a", "x", 2, 0, "stale"), ("b", "y", 5, 0, "w5"),
    ], SCHEMA).coalesce(1).write.mode("append").parquet(src_dir)
    q2 = (
        streaming_lww_gate(
            spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1")
            .parquet(src_dir), SCHEMA)
        .writeStream.outputMode("append").format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", f"{tmpdir_path}/ckpt")
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    out2 = [(r["repo"], r["path"], r["commit_seq"], r["content"])
            for r in spark.read.parquet(out_dir).collect()]
    assert ("b", "y", 5, "w5") in out2
    assert not any(c == "stale" for (_, _, _, c) in out2)
