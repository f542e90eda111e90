"""In-batch last-writer-wins dedup (SURVEY A7).

The reference relies on Mongo's unconditional ``$set`` upsert to collapse
duplicate deliveries (/root/reference/src/database/mongo-manager.ts:210-225),
which is last-*arrival*-wins and therefore order-sensitive. Here dedup is an
explicit, deterministic operator: one survivor per key, the row with the
greatest version tuple. It MUST run before any keyed MERGE (a MERGE with two
source matches per target row is ambiguous; Iceberg rejects it outright).

Implementation note (scale): ``row_number`` over
``Window.partitionBy(keys).orderBy(desc(versions))`` is one hash shuffle on
the key — the same shuffle the MERGE join needs, so AQE/exchange-reuse keeps
this to a single repartitioning of the batch, not two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedupe_lww(
    df: DataFrame,
    key_cols: list[str],
    version_cols: list[str],
    tie_break_cols: list[str] | None = None,
) -> DataFrame:
    """Keep exactly one row per key: max version tuple wins.

    ``tie_break_cols`` make the survivor deterministic when the version
    tuple itself is duplicated (verbatim duplicate deliveries) — any column
    works since the rows are identical; defaults to the version columns.
    """
    order = [F.col(c).desc_nulls_last() for c in version_cols]
    if tie_break_cols:
        order += [F.col(c).desc_nulls_last() for c in tie_break_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_lww_rn", F.row_number().over(w))
        .filter(F.col("_lww_rn") == 1)
        .drop("_lww_rn")
    )
