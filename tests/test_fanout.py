"""Multi-type fan-out: one decode pass -> N typed tables, multi-emit
semantics, per-route exactly-once (SURVEY §2.9 router + §7 step 5)."""

import pyspark.sql.types as T
from pyspark.sql import functions as F

from ore_etl_spark.datagen.wal import generate_wal
from ore_etl_spark.pipeline.fanout import FanoutApplyPipeline, Route
from ore_etl_spark.tables.merge_table import MergeTable

RECORD_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("commit_seq", T.LongType()),
    T.StructField("event_seq", T.LongType()),
    T.StructField("lang", T.StringType()),
    T.StructField("content_sha256", T.StringType()),
])

COLS = ["repo", "path", "commit_seq", "event_seq", "lang", "content_sha256", "op"]


def make_routes():
    # inserts -> "created"; updates -> "modified";
    # py-lang events ALSO emit to "python_files" (multi-emit, the
    # claim_ore/claim_yield quirk: one event, several typed records)
    return [
        Route("created", lambda d: F.col("op") == "INSERT",
              lambda d: d.select(*COLS)),
        Route("modified", lambda d: F.col("op") == "UPDATE",
              lambda d: d.select(*COLS)),
        Route("python_files", lambda d: F.col("lang") == "py",
              lambda d: d.select(*COLS)),
    ]


def build(spark, tmpdir_path, wal):
    tables = {
        name: MergeTable.create(
            spark, f"{tmpdir_path}/{name}", RECORD_SCHEMA,
            key_cols=["repo", "path"], version_cols=["commit_seq", "event_seq"],
            n_buckets=4,
        )
        for name in ("created", "modified", "python_files")
    }
    return FanoutApplyPipeline(spark, wal, make_routes(), tables,
                               f"{tmpdir_path}/state")


def test_fanout_routes_and_multi_emit(spark, tmpdir_path):
    wal = f"{tmpdir_path}/wal"
    generate_wal(spark, n_keys=200, n_partitions=2).write.parquet(wal)
    p = build(spark, tmpdir_path, wal)
    res = p.run()
    assert len(res) == 1

    from ore_etl_spark.operators.decode import decode_events
    from ore_etl_spark.operators.lww import dedupe_lww

    dec = decode_events(spark.read.parquet(wal)).filter(F.col("is_valid"))

    def expect(pred):
        return dedupe_lww(dec.filter(pred), ["repo", "path"],
                          ["commit_seq", "event_seq"]) \
            .filter(F.col("op") != "DELETE").count()

    assert p.tables["created"].read().count() == expect(F.col("op") == "INSERT")
    assert p.tables["modified"].read().count() == expect(F.col("op") == "UPDATE")
    assert p.tables["python_files"].read().count() == expect(F.col("lang") == "py")

    # multi-emit: a single-version py INSERT is the latest event for BOTH
    # routes, so the key must exist in created AND python_files (later
    # versions can change lang / delete, so restrict to 1-version keys)
    single = (dec.groupBy("repo", "path")
              .agg(F.count("*").alias("n"), F.min("lang").alias("lang0"),
                   F.min("op").alias("op0"))
              .filter((F.col("n") == 1) & (F.col("lang0") == "py")
                      & (F.col("op0") == "INSERT")))
    singles = {(r["repo"], r["path"]) for r in single.collect()}
    created = {(r["repo"], r["path"]) for r in p.tables["created"].read().collect()}
    pyfiles = {(r["repo"], r["path"]) for r in p.tables["python_files"].read().collect()}
    assert singles and singles <= created and singles <= pyfiles


def test_fanout_per_route_exactly_once(spark, tmpdir_path):
    wal = f"{tmpdir_path}/wal"
    generate_wal(spark, n_keys=100, n_partitions=2).write.parquet(wal)
    p = build(spark, tmpdir_path, wal)
    lo, hi = p.delivery_range()
    r1 = p.run_batch(lo - 1, hi)
    versions = {n: p.tables[n].version for n in p.tables}
    r2 = p.run_batch(lo - 1, hi)  # replay
    assert all(v.get("skipped_already_committed") for v in r2["routes"].values())
    assert {n: p.tables[n].version for n in p.tables} == versions
    assert all("version" in v for v in r1["routes"].values())
