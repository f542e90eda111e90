"""Deterministic N× scale-out of the driver's testdata (bench-only).

The sandbox ships sf0.001/0.01/0.1; the round-4 VERDICT stretch asks for
one sf1 query-bench datapoint to evidence sublinear wall growth with the
plans already pinned. No external data is allowed, so sf1 is synthesised
here as a deterministic 10x extension of sf0.1 — the same trick the WAL
generator uses, applied to the analytics tables:

- every table's rows are replicated FACTOR times with primary/foreign keys
  shifted consistently by replica*(max_key+1), so join fan-outs and group
  cardinalities scale the way a genuinely bigger corpus would (10x rows AND
  10x keys, not 10x duplicates of the same keys);
- ``documents.text`` gets a deterministic ~10% hashed word substitution per
  replica (any 5-gram shingle containing a substituted word changes, so
  cross-replica Jaccard lands ~0.4 — below near-dup thresholds; replicas
  are fresh corpus, not exact dupes that would quadratically densify LSH
  buckets), and ``n_chars`` is recomputed from the new text;
- ``embeddings.embedding`` is rotated by ``replica`` positions (norm- and
  distribution-preserving, decorrelates replicas: cos(x, roll(x)) ~ 0 for
  these vectors) so ANN bucket occupancy scales like a real 10x corpus;
- ``events.ts`` extends the timeline per replica (longer history, more
  daily buckets), event/user ids shift;
- tiny dims (region, nation) are copied as-is.

Usage:
    python scripts/make_scale.py [--src /root/testdata/sf0.1] \
        [--dst /dev/shm/sf1] [--factor 10] [--cpus 32]

Everything is xxhash64/arithmetic on existing values — two runs produce
byte-identical tables at any parallelism.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# table -> columns shifted by replica * (1 + max of the PK authority).
# FK columns use the REFERENCED table's span so joins stay consistent.
KEY_AUTHORITY = {
    "customer": [("c_custkey", "customer", "c_custkey")],
    "supplier": [("s_suppkey", "supplier", "s_suppkey")],
    "part": [("p_partkey", "part", "p_partkey")],
    "orders": [("o_orderkey", "orders", "o_orderkey"),
               ("o_custkey", "customer", "c_custkey")],
    "lineitem": [("l_orderkey", "orders", "o_orderkey"),
                 ("l_partkey", "part", "p_partkey"),
                 ("l_suppkey", "supplier", "s_suppkey")],
    "events": [("event_id", "events", "event_id"),
               ("user_id", "events", "user_id")],
    "documents": [("doc_id", "documents", "doc_id")],
    "embeddings": [("vec_id", "embeddings", "vec_id")],
}


def _spans(spark: SparkSession, src: str) -> dict[tuple[str, str], int]:
    spans: dict[tuple[str, str], int] = {}
    for tbl, shifts in KEY_AUTHORITY.items():
        for _, auth_tbl, auth_col in shifts:
            if (auth_tbl, auth_col) not in spans:
                df = spark.read.parquet(f"{src}/{auth_tbl}.parquet")
                spans[(auth_tbl, auth_col)] = int(
                    df.agg(F.max(auth_col)).collect()[0][0]) + 1
    return spans


def _replicate(df: DataFrame, factor: int) -> DataFrame:
    return df.withColumn(
        "_r", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))


def scale_table(spark: SparkSession, src: str, name: str, factor: int,
                spans: dict) -> DataFrame:
    df = spark.read.parquet(f"{src}/{name}.parquet")
    if name in ("region", "nation"):
        return df
    cols = df.columns
    out = _replicate(df, factor)
    r = F.col("_r")
    for col, auth_tbl, auth_col in KEY_AUTHORITY.get(name, []):
        out = out.withColumn(col, F.col(col) + r * spans[(auth_tbl, auth_col)])
    if name == "events":
        # extend the timeline: each replica is a later 90-day epoch
        out = out.withColumn("ts", F.timestamp_add("DAY", r * 90, F.col("ts")))
    if name == "documents":
        # ~10% deterministic word substitution per replica: replica 0 is
        # the original corpus byte-for-byte; other replicas break enough
        # shingles that cross-replica Jaccard sits below dedup thresholds
        words = F.split(F.col("text"), " ")
        subbed = F.transform(
            words,
            lambda w: F.when(
                (r > 0) & (F.pmod(F.xxhash64(w, r), F.lit(10)) == 0),
                F.concat(w, F.lit("~"), r.cast("string"))).otherwise(w))
        out = (out.withColumn("text", F.array_join(subbed, " "))
               .withColumn("n_chars", F.length("text").cast("long")))
    if name == "embeddings":
        # rotate by replica: replica 0 exact, others decorrelated clones
        # with identical norms and component distribution
        e, dim = F.col("embedding"), F.size(F.col("embedding"))
        out = out.withColumn(
            "embedding",
            F.when(r == 0, e).otherwise(F.concat(
                F.slice(e, r + 1, dim - r), F.slice(e, F.lit(1), r))))
    return out.select(*cols)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/dev/shm/sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from ore_etl_spark.session import get_spark

    spark = get_spark("make-scale", cpus=args.cpus,
                      shuffle_partitions=args.cpus)
    spans = _spans(spark, args.src)
    for name in TABLES:
        out = scale_table(spark, args.src, name, args.factor, spans)
        # spread BEFORE writing so the scaled dir has real splits (the
        # single-file source would otherwise serialize downstream scans)
        n_parts = 1 if name in ("region", "nation") else args.cpus
        (out.repartition(n_parts)
            .write.mode("overwrite").parquet(f"{args.dst}/{name}.parquet"))
        n = spark.read.parquet(f"{args.dst}/{name}.parquet").count()
        print(f"{name}: {n} rows -> {args.dst}/{name}.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
