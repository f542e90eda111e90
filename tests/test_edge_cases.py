"""Edge cases: empty WAL, empty batch ranges, all-corrupt batches."""

from pyspark.sql import functions as F

from ore_etl_spark.datagen.wal import generate_wal
from ore_etl_spark.pipeline.apply import CdcApplyPipeline, target_schema
from ore_etl_spark.tables.merge_table import MergeTable


def build(spark, tmpdir_path, wal_path):
    tbl = MergeTable.create(
        spark, f"{tmpdir_path}/t", target_schema(),
        key_cols=["repo", "path"], version_cols=["commit_seq", "event_seq"],
        n_buckets=4,
    )
    return CdcApplyPipeline(spark, wal_path, tbl, f"{tmpdir_path}/s")


def test_empty_wal_run_is_noop(spark, tmpdir_path):
    wal = f"{tmpdir_path}/empty_wal"
    generate_wal(spark, n_keys=10).limit(0).write.parquet(wal)
    p = build(spark, tmpdir_path, wal)
    assert p.run() == []
    assert p.table.read().count() == 0


def test_empty_range_batch_commits_noop_snapshot(spark, tmpdir_path):
    wal = f"{tmpdir_path}/wal"
    generate_wal(spark, n_keys=20).write.parquet(wal)
    p = build(spark, tmpdir_path, wal)
    lo, hi = p.delivery_range()
    rec = p.run_batch(hi + 100, hi + 200)  # range beyond the WAL head
    assert rec["n_in"] is None or rec["n_in"] == 0
    assert rec["n_inserted"] == 0
    # the empty batch is still recorded (exactly-once bookkeeping)
    assert p.table.is_committed(rec["batch_id"])


def test_all_corrupt_batch_goes_entirely_to_quarantine(spark, tmpdir_path):
    wal = f"{tmpdir_path}/wal"
    ev = generate_wal(spark, n_keys=30).withColumn(
        "payload", F.substring(F.col("payload"), 1, 6)  # truncate everything
    )
    ev.write.parquet(wal)
    p = build(spark, tmpdir_path, wal)
    res = p.run()
    assert len(res) == 1
    assert res[0]["n_quarantined"] == res[0]["n_in"] > 0
    assert p.table.read().count() == 0
    assert p.quarantine().count() == res[0]["n_in"]
