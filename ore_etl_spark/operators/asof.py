"""As-of (point-in-time) join — SURVEY J1.

The reference's only true join: for each Reset event, find the latest
Deploy with slot in (reset.slot - 1000, reset.slot)
(/root/reference/src/etl/reset-etl.ts:272-314), executed there as one
indexed Mongo query *per event* — an N-queries anti-pattern.

Two Spark-first strategies, chosen by expected sizes:

1. ``asof_join_union`` (default, scales to any size): union both streams
   tagged, sort within (partition key, time) once, and carry the last
   reference row forward with ``last(..., ignorenulls=True)`` over an
   ordered window. One shuffle on the partition key, no row explosion —
   this is the sort-merge as-of, robust to dense reference streams.
2. ``asof_join_range`` (bounded lookback): equi-join on the partition key
   plus a range predicate, then keep the newest match per left row with
   ``row_number() == 1``. Matches the reference's bounded (slot-1000, slot)
   window; right side can be broadcast when small.

Tie rule (both): a reference row with the same timestamp as the probe row
IS visible (<=), and among equal timestamps the largest order-key wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    time_col: str,
    value_cols: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with time <= left.time.

    Returns the left rows with ``value_cols`` (from right) appended.
    """
    tagged_r = right.select(
        *on, time_col, *(F.col(c).alias(f"_r_{c}") for c in value_cols),
        F.lit(0).alias("_side"),
        *( [F.col(tie_col).alias("_tie")] if tie_col else [F.lit(0).alias("_tie")] ),
    )
    lcols = [c for c in left.columns]
    tagged_l = left.select(
        *lcols,
        *(F.lit(None).cast(tagged_r.schema[f"_r_{c}"].dataType).alias(f"_r_{c}")
          for c in value_cols),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
    )
    # align columns for union
    tagged_r_full = tagged_r
    for c in lcols:
        if c not in tagged_r.columns:
            tagged_r_full = tagged_r_full.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )
    tagged_r_full = tagged_r_full.select(*tagged_l.columns)

    u = tagged_l.unionByName(tagged_r_full)
    # right rows sort before left rows at equal time (_side 0 < 1); among
    # equal-time right rows the largest tie_col ends up last -> wins
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(time_col).asc(), F.col("_side").asc(), F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *lcols, "_side",
        *(F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
          for c in value_cols),
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    for c in value_cols:
        out = out.withColumnRenamed(f"_r_{c}", c)
    return out


def asof_join_range(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    time_col: str,
    value_cols: list[str],
    lookback: int | float,
    left_id_cols: list[str],
    tie_col: str | None = None,
    broadcast_right: bool = False,
) -> DataFrame:
    """Bounded-lookback as-of: right.time in (left.time - lookback, left.time].

    ``left_id_cols`` must uniquely identify left rows (the newest-match
    row_number is computed per left row).
    """
    l, r = left.alias("l"), right.alias("r")
    cond = F.lit(True)
    for c in on:
        cond = cond & (F.col(f"l.{c}") == F.col(f"r.{c}"))
    cond = cond & (F.col(f"r.{time_col}") <= F.col(f"l.{time_col}"))
    cond = cond & (F.col(f"r.{time_col}") > F.col(f"l.{time_col}") - F.lit(lookback))
    rt = F.broadcast(r) if broadcast_right else r
    j = l.join(rt, cond, "left")
    order = [F.col(f"r.{time_col}").desc_nulls_last()]
    if tie_col:
        order.append(F.col(f"r.{tie_col}").desc_nulls_last())
    w = Window.partitionBy(*[F.col(f"l.{c}") for c in left_id_cols]).orderBy(*order)
    lcols = [F.col(f"l.{c}").alias(c) for c in left.columns]
    vcols = [F.col(f"r.{c}").alias(c) for c in value_cols]
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*lcols, *vcols)
    )
