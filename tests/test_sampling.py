"""Corpus-assembly operators (round 5): token-budget shard packing and
deterministic hash splits — correctness vs a driver-side brute force,
the parallelism-invariance contract, and the no-global-window plan shape
that makes the packing survive 100 TB."""

import random

import pytest
from pyspark.sql import functions as F

from ore_etl_spark.functions.sampling import hash_split, pack_token_shards


def _brute_pack(rows, budget):
    """(id, tokens) -> {id: shard} by the definition: a doc's shard is
    floor(preceding_tokens / budget) in ascending id order."""
    out, acc = {}, 0
    for i, t in sorted(rows):
        out[i] = acc // budget
        acc += t
    return out


def test_pack_token_shards_matches_brute_force(spark):
    rnd = random.Random(5)
    rows = [(i, rnd.randrange(0, 400)) for i in rnd.sample(range(10_000), 300)]
    rnd.shuffle(rows)  # arrival order must not matter
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    want = _brute_pack(rows, budget=1000)

    for parts in (1, 3, 8, 64):  # parallelism must not matter either
        got = {r["doc_id"]: r["shard"] for r in
               pack_token_shards(df, 1000, num_partitions=parts).collect()}
        assert got == want, f"num_partitions={parts}"

    # budget=1: every token starts a new shard; zero-token docs share
    # their successor's start offset (the boundary degenerate case)
    got1 = {r["doc_id"]: r["shard"] for r in
            pack_token_shards(df, 1, num_partitions=4).collect()}
    assert got1 == _brute_pack(rows, budget=1)

    # shards are contiguous in id order and (except the last) full:
    # every shard's token sum reaches the budget once its successor opens
    by_shard = {}
    for i, t in rows:
        by_shard.setdefault(want[i], []).append((i, t))
    shard_ids = sorted(by_shard)
    assert shard_ids == list(range(len(shard_ids)))
    for s in shard_ids[:-1]:
        assert sum(t for _, t in by_shard[s]) >= 1  # never an empty shard

    # NULL token counts pack as 0 tokens
    dfn = spark.createDataFrame(
        [(1, 10), (2, None), (3, 10)], "doc_id long, n_tokens long")
    gotn = {r["doc_id"]: r["shard"] for r in
            pack_token_shards(dfn, 10, num_partitions=2).collect()}
    assert gotn == {1: 0, 2: 1, 3: 1}

    with pytest.raises(ValueError):
        pack_token_shards(df, 0)


def test_pack_token_shards_plan_has_no_global_window(spark):
    """The naive formulation (sum over ORDER BY with no PARTITION BY)
    funnels the corpus through ONE task. The distributed prefix sum must
    never do that: no single-partition exchange anywhere in the output
    plan, and the offsets side enters via a broadcast join."""
    df = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("n_tokens"))
    out = pack_token_shards(df, 500, num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan  # offsets join must broadcast


def test_pack_token_shards_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, n_tokens long")
    out = pack_token_shards(df, 100)
    assert out.count() == 0 and "shard" in out.columns


def test_hash_split_deterministic_disjoint_and_proportional(spark):
    df = spark.range(0, 6000).select(F.col("id").alias("doc_id"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(df, w, seed=7).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in a}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 6000  # exhaustive + disjoint
    assert abs(counts["train"] / 6000 - 0.8) < 0.03
    assert abs(counts["val"] / 6000 - 0.1) < 0.02

    # exact per-row stability: same seed -> identical assignment across
    # re-runs and repartitioning; different seed -> a different split
    one = {r["doc_id"]: r["split"]
           for r in hash_split(df, w, seed=7).collect()}
    two = {r["doc_id"]: r["split"]
           for r in hash_split(df.repartition(17), w, seed=7).collect()}
    assert one == two
    other = {r["doc_id"]: r["split"]
             for r in hash_split(df, w, seed=8).collect()}
    assert one != other

    # weights are normalized, order fixes the interval layout
    n1 = {r["doc_id"]: r["split"]
          for r in hash_split(df, {"a": 8, "b": 2}, seed=7).collect()}
    n2 = {r["doc_id"]: r["split"]
          for r in hash_split(df, {"a": 0.8, "b": 0.2}, seed=7).collect()}
    assert n1 == n2
    with pytest.raises(ValueError):
        hash_split(df, {})
    with pytest.raises(ValueError):
        hash_split(df, {"a": -1.0, "b": 2.0})


def test_pack_token_shards_rejects_internal_column_clash(spark):
    df = spark.createDataFrame([(1, 2, 3)], "doc_id long, n_tokens long, _cum long")
    with pytest.raises(ValueError, match="_cum"):
        pack_token_shards(df, 10)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=-10_000, max_value=10_000),
                  st.integers(min_value=0, max_value=500)),
        min_size=1, max_size=60, unique_by=lambda r: r[0]),
    budget=st.integers(min_value=1, max_value=2000),
    parts=st.sampled_from([1, 2, 7, 32]),
)
def test_pack_token_shards_property(spark, rows, budget, parts):
    """For ANY unique-id row set (sparse/dense/negative ids), ANY budget,
    ANY parallelism: the distributed prefix sum equals the sequential
    definition exactly."""
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {r["doc_id"]: r["shard"] for r in
           pack_token_shards(df, budget, num_partitions=parts).collect()}
    assert got == _brute_pack(rows, budget)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9),
                 min_size=1, max_size=50, unique=True),
    seed=st.integers(min_value=0, max_value=10**6),
    names=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=4),
                   min_size=1, max_size=4, unique=True),
)
def test_hash_split_property(spark, ids, seed, names):
    """For ANY id set, seed, and weight layout: exhaustive + disjoint
    assignment, every label drawn from the weights, and exact stability
    under repartitioning (the md5 draw is a pure row function)."""
    w = {n: float(i + 1) for i, n in enumerate(names)}
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    one = {r["doc_id"]: r["split"]
           for r in hash_split(df, w, seed=seed).collect()}
    assert set(one) == set(ids)
    assert set(one.values()) <= set(names)
    two = {r["doc_id"]: r["split"]
           for r in hash_split(df.repartition(5), w, seed=seed).collect()}
    assert one == two
