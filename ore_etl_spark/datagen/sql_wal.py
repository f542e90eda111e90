"""Documents-derived change-event WAL for the correctness gate.

The driver's oracle is DuckDB over the shared parquet tables, so this WAL
is a *pure SQL-expressible* function of ``documents.parquet`` — the same
derivation is written twice, once as Spark expressions (here) and once as
ANSI SQL (``WAL_SQL`` / oracle strings in __spark_entry__), and the engine's
replay result must match DuckDB's direct window-function replay.

Derivation (deterministic, no randomness):
- each doc_id yields 1 + (doc_id % 3) versions v = 0..doc_id % 3
- key: repo = 'org' || (doc_id % 20), path = 'src/f' || doc_id || '.txt'
- LWW order: commit_seq = v * 1000000 + doc_id, event_seq = doc_id
- op: v=0 INSERT; last version of doc_id % 7 == 0 keys DELETE; else UPDATE
- content = text || '|v' || v  (so every version has distinct sha256)
- commit = substr(sha256(repo || ':' || path || ':' || v), 1, 40)

The Spark side additionally round-trips content through the engine's binary
payload encode -> vectorized decode (identity on content), exercising the
real decode operators inside the gated query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .wal import payload_expr


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def derive_wal(spark: SparkSession, sf_dir: str, with_payload: bool = True) -> DataFrame:
    # documents.parquet is a single file -> one input split; spread the rows
    # before the CPU-heavy payload encode/sha work (all derivations are
    # hash-based, so the result is partitioning-independent)
    d = documents(spark, sf_dir).repartition(spark.sparkContext.defaultParallelism)
    w = (
        d.withColumn("v", F.explode(F.sequence(F.lit(0), (F.col("doc_id") % 3).cast("int"))))
        .withColumn("repo", F.concat(F.lit("org"), (F.col("doc_id") % 20).cast("string")))
        .withColumn("path", F.concat(F.lit("src/f"), F.col("doc_id").cast("string"),
                                     F.lit(".txt")))
        .withColumn("commit_seq", (F.col("v").cast("long") * 1000000 + F.col("doc_id")))
        .withColumn("event_seq", F.col("doc_id").cast("long"))
        .withColumn(
            "op",
            F.when(F.col("v") == 0, F.lit("INSERT"))
            .when((F.col("v") == (F.col("doc_id") % 3).cast("int"))
                  & (F.col("doc_id") % 7 == 0), F.lit("DELETE"))
            .otherwise(F.lit("UPDATE")),
        )
        .withColumn("content", F.concat(F.col("text"), F.lit("|v"),
                                        F.col("v").cast("string")))
        .withColumn(
            "commit",
            F.substring(
                F.sha2(F.concat(F.col("repo"), F.lit(":"), F.col("path"),
                                F.lit(":"), F.col("v").cast("string")), 256),
                1, 40,
            ),
        )
    )
    # ~1% of events get a truncated payload -> must land in quarantine
    # (reference 12-byte-deploy analog, DEPLOY-PARSE-ANALYSIS.md:63-73);
    # the flag is SQL-derivable so the oracle can exclude/count them
    w = w.withColumn("corrupt", (F.col("doc_id") * 31 + F.col("v") * 7) % 97 == 0)
    cols = ["repo", "path", "commit", "lang", "commit_seq", "event_seq", "op"]
    if with_payload:
        w = w.withColumn(
            "payload",
            F.when(F.col("corrupt"),
                   F.substring(payload_expr(F.col("content"), F.col("v")), 1, 6))
            .otherwise(payload_expr(F.col("content"), F.col("v"))),
        )
        # plaintext content/corrupt are NOT exposed with the payload — the
        # engine must recover content via decode (that's the invariant)
        cols.append("payload")
    else:
        cols += ["content", "corrupt"]
    return w.select(*cols)


# The identical derivation as a DuckDB CTE (documents is a registered view).
WAL_SQL = """
  SELECT 'org' || (d.doc_id % 20) AS repo,
         'src/f' || d.doc_id || '.txt' AS path,
         substr(sha256('org' || (d.doc_id % 20) || ':' ||
                       'src/f' || d.doc_id || '.txt' || ':' || t.v), 1, 40) AS commit,
         d.lang AS lang,
         (t.v * 1000000 + d.doc_id)::BIGINT AS commit_seq,
         d.doc_id::BIGINT AS event_seq,
         CASE WHEN t.v = 0 THEN 'INSERT'
              WHEN t.v = d.doc_id % 3 AND d.doc_id % 7 = 0 THEN 'DELETE'
              ELSE 'UPDATE' END AS op,
         d.text || '|v' || t.v AS content,
         (d.doc_id * 31 + t.v * 7) % 97 = 0 AS corrupt
  FROM documents d, LATERAL unnest(generate_series(0, d.doc_id % 3)) AS t(v)
"""
