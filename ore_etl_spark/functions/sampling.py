"""Corpus-assembly operators: token-budget shard packing and
deterministic split assignment.

These are the steps AFTER dedup/quality filtering in a training-data
pipeline: turn the curated corpus into (a) contiguous shards of ~N
tokens each (sequence packing / shard manifests) and (b) disjoint
train/val/test splits that are reproducible across engines and runs.
The reference has no analog (it is a CDC ingester); these extend the
engine the way the dedup/similarity family does — first-class,
oracle-checked, designed for the 10^9-document scale.

Scale notes, because both are easy to get wrong at 100 TB:

- ``pack_token_shards`` is a DISTRIBUTED prefix sum. The naive Spark
  formulation — ``sum(tokens) over (order by id)`` with no partition —
  is a single-task global window: one executor sorts and scans the
  entire corpus. Instead the order domain is split into P deterministic
  ranges (one min/max job, ZERO sampling — unlike
  ``repartitionByRange``, whose sampled boundaries a recomputation may
  re-draw differently between the totals job and the output job,
  silently corrupting offsets), each range computes a local cumsum in
  parallel, and a P-row driver fold supplies the range offsets.
- ``hash_split`` is pure per-row expression work: no shuffle, no state,
  no sampling. The draw is md5-derived (NOT xxhash64) so the exact
  assignment is reproducible OUTSIDE Spark — DuckDB, any warehouse with
  md5() — the same portability trick the minhash signatures use
  (functions/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_token_shards(
    df: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
    num_partitions: int | None = None,
    out_col: str = "shard",
) -> DataFrame:
    """Greedy in-order packing: documents sorted by ``order_col`` fill
    shards of ~``budget`` tokens. A document's shard is
    ``floor(preceding_tokens / budget)`` — its starting offset in the
    concatenated token stream — so shard boundaries are a pure function
    of the global order and token counts, never of partitioning,
    parallelism, or row arrival order (the determinism contract a
    resumable 100 TB packing job needs).

    ``order_col`` must be integral and unique (ties would make the
    cumsum order ambiguous); ``token_col`` NULLs count as 0.

    Plan shape: one min/max job over ``order_col`` splits its DOMAIN
    into ``num_partitions`` equal ranges; the range id is computed FROM
    THE VALUE, so a recompute can never disagree with itself. One
    shuffle (hash on the range id) feeds P parallel local-cumsum
    windows; per-range totals (P rows) fold to prefix offsets on the
    driver and broadcast-join back. No single-partition exchange
    anywhere. Skew bound: ranges are equal-width in the DOMAIN — for a
    dense id space (the WAL's delivery_seq, a row_number) they are
    equal-size; a pathologically sparse id space concentrates rows, in
    which case re-key with row_number first.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    clash = {"_pid", "_tok", "_cum", "_offset", "_start"} & set(df.columns)
    if clash:
        # the working columns would silently clobber-and-drop caller
        # data — an explicit error beats silent loss
        raise ValueError(f"input columns collide with internals: {clash}")
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    # One lazy localCheckpoint of the input: the bounds job below
    # materializes it, and the totals + output jobs then read the cache
    # instead of re-evaluating the caller's lineage (3 evaluations -> 1;
    # r6, guide §5). This also pins a SINGLE evaluation of the input for
    # non-deterministic sources (rand()/sample-derived frames, a source
    # dir mutating between jobs), so totals and output can never disagree
    # and corrupt shard offsets (round-5 ADVICE).
    df = df.localCheckpoint(eager=False)
    bounds = df.agg(F.min(order_col).alias("lo"),
                    F.max(order_col).alias("hi")).collect()[0]
    if bounds["lo"] is None:  # empty input
        return df.withColumn(out_col, F.lit(None).cast("long"))
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = max(1, (hi - lo) // n_parts + 1)
    pid = F.floor((F.col(order_col) - F.lit(lo)) / F.lit(width)).cast("int")
    tok = F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    local = Window.partitionBy("_pid").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    d = (df.withColumn("_pid", pid)
           .withColumn("_tok", tok)
           .withColumn("_cum", F.sum("_tok").over(local)))
    # P-row driver fold: totals per range -> exclusive prefix offsets.
    # _pid is a pure function of order_col, so this second evaluation of
    # the plan CANNOT disagree with the output evaluation below. Plain
    # sum(_tok), NOT max(_cum): the totals job then needs no sort or
    # running-sum window (one cumsum pass, not two), and it stays
    # correct even for adversarial negative token counts where the
    # last row's cumsum is not the range total.
    totals = {r["_pid"]: r["t"] for r in
              df.select(pid.alias("_pid"), tok.alias("_tok"))
                .groupBy("_pid").agg(F.sum("_tok").alias("t")).collect()}
    offsets, acc = [], 0
    for p in sorted(totals):
        offsets.append((p, acc))
        acc += totals[p]
    off = spark.createDataFrame(offsets, "_pid int, _offset long")
    out = (
        d.join(F.broadcast(off), "_pid")
        # start offset div budget == floor (all terms non-negative);
        # integer div stays exact past 2^53 tokens where float floor()
        # would start mis-assigning boundary documents
        .withColumn("_start", F.col("_offset") + F.col("_cum") - F.col("_tok"))
        .withColumn(out_col, F.expr(f"_start div {int(budget)}"))
        .drop("_pid", "_tok", "_cum", "_offset", "_start")
    )
    return out


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    out_col: str = "split",
    denom: int = 1_000_000,
) -> DataFrame:
    """Deterministic train/val/test assignment: each row draws a uniform
    value from md5(seed:id) and lands in the split whose cumulative
    weight interval contains it. Row-independent (no shuffle, no
    sampling machinery), stable under repartitioning, re-runs, and
    engine changes — the draw is plain md5 over a string, so the exact
    same assignment reproduces in DuckDB or any warehouse (the
    portability trick the minhash signatures use; xxhash64 would be
    Spark-only).

    ``weights`` need not sum to 1 (they are normalized); iteration
    order fixes the interval layout, so pass them in a canonical order.
    The draw takes 15 hex chars (60 bits) of the digest — bias from the
    ``% denom`` fold is < denom / 2^60, immaterial for split ratios.

    Leakage-safe grouping: pass a GROUP key as ``id_col`` (e.g. the
    repo, domain, or cluster id from ``connected_components``) and every
    row of a group lands in the same split — near-duplicate documents
    can't straddle train and test, the usual contamination vector.
    """
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-empty and non-negative")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to > 0")
    draw = (
        F.conv(F.substring(
            F.md5(F.concat_ws(":", F.lit(str(int(seed))),
                              F.col(id_col).cast("string"))), 1, 15),
            16, 10).cast("long") % F.lit(int(denom))
    )
    names = list(weights)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name] / total
        cond = draw < F.lit(int(round(acc * denom)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


__all__ = ["pack_token_shards", "hash_split"]
