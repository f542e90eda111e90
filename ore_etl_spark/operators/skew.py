"""Hot-key (hot-repo) skew handling (north rule: explicit salting).

The reference has no skew handling — its hot rounds/miners are processed
serially by one Node process anyway (SURVEY §4). At cluster scale a Zipf
repo distribution means a plain ``repartition(col("repo"))`` puts >=20% of
all events on one task. Two tools:

1. ``salted_repartition`` — spread each hot key over ``n_salts`` partitions
   for the *decode* stage (decode is key-independent, so salting is free:
   no re-aggregation needed afterwards).
2. AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``, on by
   default in our session) — handles the MERGE join side at runtime.

Salting uses a deterministic hash of a fine-grained column (``path``), not
``rand()``: same input -> same placement at any parallelism, keeping the
two-cluster-size benchmark comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame,
    n_partitions: int,
    key_col: str = "repo",
    fine_col: str = "path",
    n_salts: int = 16,
) -> DataFrame:
    """Repartition by (key, salt) where salt = hash(fine_col) % n_salts.

    Each hot key's rows spread over up to ``n_salts`` partitions while cold
    keys stay roughly co-located. The salt column is dropped after the
    exchange — downstream per-key operators that need co-location (the
    MERGE's own shuffle) re-shuffle on the full key anyway.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(fine_col)), F.lit(n_salts)).cast("int")
    )
    return salted.repartition(n_partitions, F.col(key_col), F.col("_salt")).drop("_salt")


def key_histogram(df: DataFrame, key_col: str = "repo", top: int = 10) -> list[dict]:
    """Diagnostic: per-key share of rows (to decide whether to salt)."""
    total = df.count()
    rows = (
        df.groupBy(key_col).count()
        .orderBy(F.desc("count"), F.col(key_col))
        .limit(top)
        .collect()
    )
    return [
        {key_col: r[key_col], "count": r["count"], "share": r["count"] / max(total, 1)}
        for r in rows
    ]
