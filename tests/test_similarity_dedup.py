"""Round-2 similarity/dedup upgrades:

- hyperplane-LSH signatures built from literal array columns (no
  per-(plane, dim) expression unroll — the dim-256 codegen-cliff fix);
- write-time signatures + partition-pruned ANN probe;
- banded-LSH fallback for cosine_pairs_threshold (block_col=None must
  never cross-join);
- SimHash hamming-radius candidate generation (bit-band pigeonhole).
"""

import math
import random

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def opt_plan_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


# ---------------------------------------------------------------------------
# ANN / hyperplane LSH
# ---------------------------------------------------------------------------

def _random_vecs(n, dim, seed=7):
    rnd = random.Random(seed)
    return [[rnd.uniform(-1, 1) for _ in range(dim)] for _ in range(n)]


def test_ann_literal_planes_no_unroll_at_dim_256(spark):
    """16 planes x 256 dims must NOT build 4096 per-element expressions:
    each plane is one folded array literal, the plan stays compact and in
    whole-stage codegen (the old per-(plane, dim) unroll was ~12k nodes)."""
    from ore_etl_spark.functions.similarity import lsh_signature

    vecs = _random_vecs(20, 256)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id int, embedding array<double>"
    )
    sig = df.select("vec_id", lsh_signature(F.col("embedding"), 16, 256).alias("sig"))
    opt = opt_plan_of(sig)
    assert "element_at" not in opt          # no per-dimension extraction
    assert len(opt) < 200_000               # bounded plan, not O(planes*dim) nodes
    phys = plan_of(sig)
    assert "*(1)" in phys or "WholeStageCodegen" in phys
    assert "BatchEvalPython" not in phys and "ArrowEvalPython" not in phys
    assert sig.count() == 20                # and it actually evaluates


def test_ann_bucket_probe_matches_signature_math(spark):
    from ore_etl_spark.functions.similarity import (
        lsh_bucket_ann, lsh_signature, query_signature, with_lsh_signature,
    )

    dim = 16
    vecs = _random_vecs(60, dim, seed=3)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id int, embedding array<double>"
    )
    q = vecs[0]
    q_sig = query_signature(q, n_planes=4)
    # driver-side signature == column signature for the same vector
    got = df.filter(F.col("vec_id") == 0).select(
        lsh_signature(F.col("embedding"), 4, dim).alias("s")).first()["s"]
    assert got == q_sig

    # on-the-fly probe == precomputed-signature probe
    on_fly = lsh_bucket_ann(df, q, k=5, n_planes=4)
    pre = with_lsh_signature(df, dim=dim, n_planes=4)
    pre_probe = lsh_bucket_ann(pre, q, k=5, n_planes=4, sig_col="lsh_sig")
    assert sorted(map(tuple, on_fly.collect())) == sorted(map(tuple, pre_probe.collect()))


def test_write_time_signature_prunes_partitions(spark, tmpdir_path):
    """Persisting partitionBy(lsh_sig) turns the ANN probe into a
    partition-pruned scan: the probe's plan reads ONE bucket directory."""
    from ore_etl_spark.functions.similarity import query_signature, with_lsh_signature

    dim = 8
    vecs = _random_vecs(80, dim, seed=11)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id int, embedding array<double>"
    )
    path = f"{tmpdir_path}/ann_table"
    with_lsh_signature(df, dim=dim, n_planes=3).write.partitionBy("lsh_sig").parquet(path)
    q = vecs[5]
    q_sig = query_signature(q, n_planes=3)
    probe = spark.read.parquet(path).filter(F.col("lsh_sig") == q_sig)
    plan = plan_of(probe)
    assert "PartitionFilters" in plan and "lsh_sig" in plan.split("PartitionFilters")[1][:200]
    assert probe.count() > 0  # the query's own bucket is non-empty


def _brute_cosine_pairs(vecs, threshold, round_to=6):
    out = set()
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            a, b = vecs[i], vecs[j]
            d = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            cs = d / max(na * nb, 1e-12)
            if round(cs, round_to) >= threshold:
                out.add((i, j))
    return out


def test_cosine_pairs_lsh_fallback_no_cross_join_and_matches_brute(spark):
    """block_col=None must block on banded LSH signatures — the plan may
    not contain a cartesian/nested-loop join — and on a clustered fixture
    (near-dups at cos>=0.99) the banded OR recovers every brute-force pair."""
    from ore_etl_spark.functions.similarity import cosine_pairs_threshold

    rnd = random.Random(42)
    dim = 16
    vecs = []
    for c in range(8):  # 8 tight clusters of 5 near-identical vectors
        base = [rnd.uniform(-1, 1) for _ in range(dim)]
        for _ in range(5):
            vecs.append([x + rnd.uniform(-0.01, 0.01) for x in base])
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id int, embedding array<double>"
    )
    out = cosine_pairs_threshold(df, block_col=None, threshold=0.99, dim=dim,
                                 n_bands=8, band_bits=2)
    plan = plan_of(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == _brute_cosine_pairs(vecs, 0.99)


# ---------------------------------------------------------------------------
# IVF ANN
# ---------------------------------------------------------------------------

def test_ivf_assignment_and_probe(spark):
    """Every vector lands in its argmin-L2 cell; the probe scans exactly
    the nprobe nearest cells and equals a manual filter + exact re-rank."""
    from ore_etl_spark.functions.similarity import (
        ivf_ann, ivf_assign, ivf_query_cells,
    )

    dim = 8
    vecs = _random_vecs(100, dim, seed=21)
    centroids = vecs[:5]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id int, embedding array<double>"
    )
    assigned = ivf_assign(df, centroids)
    # python-side argmin replicates the column expression
    rows = {r["vec_id"]: r["ivf_cell"] for r in assigned.collect()}
    for i, v in enumerate(vecs):
        dists = sorted(
            (sum((x - y) * (x - y) for x, y in zip(v, c)), ci)
            for ci, c in enumerate(centroids)
        )
        assert rows[i] == dists[0][1]

    q = vecs[7]
    probe_cells = ivf_query_cells(q, centroids, nprobe=2)
    assert len(probe_cells) == 2
    got = ivf_ann(df, q, centroids, k=5, nprobe=2).collect()
    manual = (
        assigned.filter(F.col("ivf_cell").isin(probe_cells))
    )
    assert {r["vec_id"] for r in got} <= {r["vec_id"] for r in manual.collect()}
    assert got[0]["vec_id"] == 7  # the query itself is its own best match


def test_ivf_write_time_cells_prune_partitions(spark, tmpdir_path):
    from ore_etl_spark.functions.similarity import ivf_assign, ivf_query_cells

    dim = 8
    vecs = _random_vecs(120, dim, seed=33)
    centroids = vecs[:4]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id int, embedding array<double>"
    )
    path = f"{tmpdir_path}/ivf_table"
    ivf_assign(df, centroids).write.partitionBy("ivf_cell").parquet(path)
    probe = ivf_query_cells(vecs[9], centroids, nprobe=1)
    scan = spark.read.parquet(path).filter(F.col("ivf_cell").isin(probe))
    plan = plan_of(scan)
    assert "PartitionFilters" in plan and "ivf_cell" in plan.split("PartitionFilters")[1][:200]
    assert scan.count() > 0


# ---------------------------------------------------------------------------
# SimHash hamming-radius candidates
# ---------------------------------------------------------------------------

def test_simhash_radius_matches_brute_force(spark):
    """Banded candidate generation + bit_count verify must equal the
    brute-force all-pairs hamming<=3 answer (pigeonhole: 4 bands, r=3)."""
    from ore_etl_spark.functions.dedup import simhash16, simhash_radius_pairs

    rnd = random.Random(5)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lambda", "mu"]
    docs = []
    for i in range(30):
        base = [rnd.choice(words) for _ in range(12)]
        docs.append((2 * i, " ".join(base)))
        mutated = list(base)
        mutated[rnd.randrange(len(base))] = rnd.choice(words)  # near-dup
        docs.append((2 * i + 1, " ".join(mutated)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    sigs = {r["doc_id"]: r["sig"]
            for r in df.select("doc_id", simhash16(F.col("text")).alias("sig")).collect()}
    ids = sorted(sigs)
    brute = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    assert brute, "fixture must contain near-dup signatures"
    got = {(r["id_a"], r["id_b"], r["hamming"])
           for r in simhash_radius_pairs(df, radius=3).collect()}
    assert got == brute
    # and it genuinely finds non-identical signatures (radius > 0)
    assert any(h > 0 for _, _, h in got)


def test_simhash_radius_is_banded_not_all_pairs(spark):
    """The candidate join must be an equi-join on (band, band_key) —
    no cartesian product anywhere in the plan."""
    from ore_etl_spark.functions.dedup import simhash_radius_pairs

    df = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2}") for i in range(20)], "doc_id long, text string"
    )
    plan = plan_of(simhash_radius_pairs(df))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    with pytest.raises(ValueError):
        simhash_radius_pairs(df, radius=4, n_bands=4)  # pigeonhole violated


def test_simhash_radius_target_widens_signature(spark):
    """target_bucket_rows auto-widens the signature with corpus size (the
    sf1 probe measured fixed-16-bit going quadratic: 1.2 s -> 111 s at
    10x rows). Three contracts: (1) a target the corpus doesn't exceed
    resolves to the caller's bits — output byte-identical to the fixed
    config, so existing oracles/benchmarks are unaffected; (2) a tiny
    target widens bits and the widened output still equals brute force
    AT THAT WIDTH (the pigeonhole guarantee is width-independent);
    (3) planted exact duplicates (hamming 0 at any width) survive."""
    from ore_etl_spark.functions.dedup import (simhash_radius_pairs,
                                               simhash_signatures_agg)

    rnd = random.Random(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = []
    for i in range(20):
        t = " ".join(rnd.choice(words) for _ in range(10))
        docs.append((2 * i, t))
        docs.append((2 * i + 1, t))  # exact dup: hamming 0 at any width
    df = spark.createDataFrame(docs, "doc_id long, text string")

    fixed = {(r["id_a"], r["id_b"], r["hamming"])
             for r in simhash_radius_pairs(df, radius=3).collect()}
    same = {(r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_radius_pairs(
                df, radius=3, target_bucket_rows=10_000,
                approx_n=len(docs)).collect()}
    assert same == fixed  # target not exceeded -> bits stay 16

    # target=2 over 40 docs -> need ceil(log2(20))=5 -> bits 4*5=20
    wide = {(r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_radius_pairs(
                df, radius=3, target_bucket_rows=2,
                approx_n=len(docs)).collect()}
    sigs20 = {r["id"]: r["sig"]
              for r in simhash_signatures_agg(df, "text", "doc_id",
                                              bits=20).collect()}
    ids = sorted(sigs20)
    brute20 = {(a, b, bin(sigs20[a] ^ sigs20[b]).count("1"))
               for i, a in enumerate(ids) for b in ids[i + 1:]
               if bin(sigs20[a] ^ sigs20[b]).count("1") <= 3}
    assert wide == brute20
    dup_pairs = {(2 * i, 2 * i + 1, 0) for i in range(20)}
    assert dup_pairs <= wide and dup_pairs <= fixed

    # bits NOT divisible by n_bands + target already met: bits must pass
    # through UNTOUCHED (a naive n_bands*(bits//n_bands) reassignment
    # would shrink 16 -> 15 and change every signature)
    fixed5 = {(r["id_a"], r["id_b"], r["hamming"])
              for r in simhash_radius_pairs(df, radius=3,
                                            n_bands=5).collect()}
    same5 = {(r["id_a"], r["id_b"], r["hamming"])
             for r in simhash_radius_pairs(
                 df, radius=3, n_bands=5, target_bucket_rows=10_000,
                 approx_n=len(docs)).collect()}
    assert same5 == fixed5

    # when the 60-bit accumulator cap BINDS, the caller's width is kept,
    # never rounded down to n_bands*(60//n_bands): bits=60/n_bands=7
    # with need past the cap (approx_n hint 10k, target 1 -> need 14 >
    # 60//7 = 8) must stay 60 bits, so the output equals the fixed run
    fixed60 = {(r["id_a"], r["id_b"], r["hamming"])
               for r in simhash_radius_pairs(df, radius=3, n_bands=7,
                                             bits=60).collect()}
    capped = {(r["id_a"], r["id_b"], r["hamming"])
              for r in simhash_radius_pairs(
                  df, radius=3, n_bands=7, bits=60, target_bucket_rows=1,
                  approx_n=10_000).collect()}
    assert capped == fixed60


def test_knn_join_target_bucket_rows_passthrough(spark):
    """knn_join(target_bucket_rows=) defers to lsh_band_pairs' auto-sizing;
    a target the corpus doesn't exceed keeps band_bits and yields the
    byte-identical neighbor set (the sf0.1 bench config is unchanged by
    adding the knob)."""
    from ore_etl_spark.functions.similarity import knn_join

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)], "x")
            for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    base = {(r["id"], r["nbr"], r["rank"])
            for r in knn_join(df, k=3, dim=8, n_bands=2, band_bits=2,
                              round_to=6).collect()}
    with_target = {(r["id"], r["nbr"], r["rank"])
                   for r in knn_join(df, k=3, dim=8, n_bands=2, band_bits=2,
                                     target_bucket_rows=16, approx_n=64,
                                     round_to=6).collect()}
    # 64/16 -> need=2 == band_bits: identical config, identical output
    assert with_target == base and base


# ---------------------------------------------------------------- components

def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


# ---------------------------------------------------------------------------
# Band-capacity guard (round 4): the Σ|bucket|² cliff on low-entropy inputs
# ---------------------------------------------------------------------------

def _clustered_vecs(n, dim, seed=11):
    """Adversarial same-bucket set: one tight cluster — every vector lands
    the same side of every hyperplane, so ALL n rows share one (band,
    band_key) bucket and the unguarded candidate join is C(n,2)."""
    rnd = random.Random(seed)
    base = [rnd.uniform(-1, 1) for _ in range(dim)]
    return [[x + 1e-9 * (i + 1) for x in base] for i in range(n)]


def test_band_capacity_guard_bounds_low_entropy_candidates(spark):
    from ore_etl_spark.functions.similarity import lsh_band_pairs

    n, dim, cap = 300, 8, 40
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(_clustered_vecs(n, dim))],
        "vec_id long, embedding array<double>",
    ).coalesce(4)
    unguarded = lsh_band_pairs(df, dim=dim, n_bands=2, band_bits=2,
                               max_bucket_rows=None).count()
    assert unguarded == n * (n - 1) // 2  # the quadratic cliff, measured
    guarded = lsh_band_pairs(df, dim=dim, n_bands=2, band_bits=2,
                             max_bucket_rows=cap).count()
    # ceil(n/cap) sub-buckets of ~cap rows each: Σ|bucket|² is ~n×cap per
    # band, not n² — 2×n×cap leaves ~2.7x headroom for hash-salt skew and
    # is still well under the quadratic cliff
    bound = 2 * n * cap
    assert 0 < guarded <= bound < unguarded
    # determinism: same input, same subset
    again = lsh_band_pairs(df, dim=dim, n_bands=2, band_bits=2,
                           max_bucket_rows=cap).count()
    assert again == guarded
    # soundness: the guard can only DROP candidates, never invent them
    g = {(r["id_a"], r["id_b"]) for r in
         lsh_band_pairs(df, dim=dim, n_bands=2, band_bits=2,
                        max_bucket_rows=cap).collect()}
    u = {(r["id_a"], r["id_b"]) for r in
         lsh_band_pairs(df, dim=dim, n_bands=2, band_bits=2,
                        max_bucket_rows=None).collect()}
    assert g <= u


def test_band_capacity_guard_noop_below_cap(spark):
    """Normal-entropy data under the cap must be byte-identical to the
    unguarded output (the oracle-gated queries rely on this)."""
    from ore_etl_spark.functions.similarity import lsh_band_pairs

    dim = 16
    vecs = _random_vecs(120, dim, seed=3)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    base = {(r["id_a"], r["id_b"]) for r in
            lsh_band_pairs(df, dim=dim, n_bands=4, band_bits=2,
                           max_bucket_rows=None).collect()}
    capped = {(r["id_a"], r["id_b"]) for r in
              lsh_band_pairs(df, dim=dim, n_bands=4, band_bits=2,
                             max_bucket_rows=10_000).collect()}
    assert base == capped and len(base) > 0


def test_band_capacity_auto_bits_from_n(spark):
    """target_bucket_rows auto-sizes band_bits: with 256 diverse vectors
    and a 16-row target the effective bits grow to ceil(log2(256/16))=4,
    shrinking expected bucket population (and the candidate count) versus
    the caller's 1-bit request."""
    from ore_etl_spark.functions.similarity import lsh_band_pairs

    dim = 16
    vecs = _random_vecs(256, dim, seed=9)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    coarse = lsh_band_pairs(df, dim=dim, n_bands=2, band_bits=1,
                            max_bucket_rows=None).count()
    auto = lsh_band_pairs(df, dim=dim, n_bands=2, band_bits=1,
                          max_bucket_rows=None, target_bucket_rows=16,
                          approx_n=256).count()
    assert 0 < auto < coarse


def test_minhash_and_simhash_inherit_bucket_cap(spark):
    """The dedup blockers share the guard: a corpus of identical docs
    collides on every band; the cap bounds their candidate joins too."""
    from ore_etl_spark.functions.dedup import (minhash_lsh_candidates,
                                               simhash_radius_pairs)

    n, cap = 200, 25
    rows = [(i, "the same boilerplate text repeated everywhere forever")
            for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = n * (n - 1) // 2
    mh = minhash_lsh_candidates(df, max_bucket_rows=cap).count()
    sh = simhash_radius_pairs(df, max_bucket_rows=cap).count()
    nsub = -(-n // cap)
    per_band_bound = nsub * (2 * cap) * (2 * cap - 1) // 2
    assert 0 < mh <= 4 * per_band_bound < full * 4
    assert mh < full  # strictly fewer than the quadratic cliff
    assert 0 < sh < full


def test_connected_components_matches_union_find(spark):
    """Large-star/small-star CC vs a driver union-find on a mixed fixture:
    a long chain (log-round convergence), a clique, a star, an isolated
    pair, and two chains merged by a bridge edge."""
    from ore_etl_spark.functions.dedup import connected_components

    edges = (
        [(i, i + 1) for i in range(40)]            # chain 0..40
        + [(100, 101), (100, 102), (101, 102)]     # clique
        + [(200, 201), (200, 202), (200, 203)]     # star
        + [(300, 301)]                             # pair
        + [(400 + i, 401 + i) for i in range(5)]
        + [(500 + i, 501 + i) for i in range(5)]
        + [(405, 500)]                             # bridge merges two chains
    )
    want = _union_find(edges)
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    assert got == want
    # chain collapsed to its minimum in well under max_iter rounds
    assert got[40] == 0 and got[505] == 400


def test_connected_components_edge_order_invariant(spark):
    from ore_etl_spark.functions.dedup import connected_components

    edges = [(5, 3), (1, 9), (9, 5), (7, 7), (2, 8)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    # (7,7) self-loop dropped but 7 still absent (no real edge); others:
    assert got == {5: 1, 3: 1, 1: 1, 9: 1, 2: 2, 8: 2, 7: 7}


def test_simhash_agg_form_equals_column_form(spark):
    """The codegen-agg signature path must be bit-identical to the
    higher-order column form it replaces in the hot path."""
    from ore_etl_spark.functions.dedup import simhash16, simhash_signatures_agg

    rows = [(i, f"alpha beta w{i} gamma delta {i % 5}") for i in range(40)]
    rows += [(100, ""), (101, "   ")]  # zero-token docs must keep sig 0
    df = spark.createDataFrame(rows, "doc_id long, text string")
    col_form = {r["doc_id"]: r["s"]
                for r in df.select("doc_id", simhash16(F.col("text")).alias("s")).collect()}
    agg_form = {r["id"]: r["sig"]
                for r in simhash_signatures_agg(df, bits=16).collect()}
    assert agg_form == col_form


def test_connected_components_hybrid_matches_distributed(spark):
    """The driver-finish union-find tail must produce exactly the labels
    the all-distributed star-contraction loop converges to — contraction
    preserves the component partition, so finishing round k's edges with
    exact union-find IS the fixpoint answer."""
    from ore_etl_spark.functions.dedup import connected_components

    edges = (
        [(i, i + 1) for i in range(30)]
        + [(100, 101), (100, 102), (101, 102)]
        + [(300, 301)]
        + [(400 + i, 401 + i) for i in range(4)]
    )
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    hybrid = {(r["node"], r["component"])
              for r in connected_components(df).collect()}
    distributed = {(r["node"], r["component"])
                   for r in connected_components(
                       df, driver_finish_edges=None).collect()}
    assert hybrid == distributed and len(hybrid) > 0


def test_band_guard_fire_is_loud(spark, caplog):
    """Round-4 ADVICE: a fired capacity guard silently dropped candidate
    pairs. Now it must (a) record what it did in LAST_GUARD_STATS and
    (b) log a WARNING — and must report not-fired on normal corpora."""
    import logging

    from ore_etl_spark.functions import similarity
    from ore_etl_spark.functions.similarity import lsh_band_pairs

    n, dim, cap = 120, 8, 20
    clustered = spark.createDataFrame(
        [(i, v) for i, v in enumerate(_clustered_vecs(n, dim))],
        "vec_id long, embedding array<double>",
    )
    with caplog.at_level(logging.WARNING,
                         logger="ore_etl_spark.functions.similarity"):
        lsh_band_pairs(clustered, dim=dim, n_bands=2, band_bits=2,
                       max_bucket_rows=cap).count()
    st = dict(similarity.LAST_GUARD_STATS)
    assert st["fired"] is True
    assert st["n_oversize_buckets"] >= 1
    assert st["largest_bucket"] > cap
    assert st["rows_in_oversize"] >= st["largest_bucket"]
    assert st["max_bucket_rows"] == cap
    assert any("band-capacity guard FIRED" in r.message
               for r in caplog.records)

    diverse = spark.createDataFrame(
        [(i, v) for i, v in enumerate(_random_vecs(60, 16, seed=5))],
        "vec_id long, embedding array<double>",
    )
    lsh_band_pairs(diverse, dim=16, n_bands=4, band_bits=2,
                   max_bucket_rows=10_000).count()
    assert similarity.LAST_GUARD_STATS["fired"] is False


def test_adaptive_salt_sizes_from_bucket_histogram(spark):
    """r6: the self-join salt is sized from the band-bucket histogram the
    capacity guard already collects — 1 on high-entropy corpora (a static
    16 measured +71% replication overhead there), scaled up on skewed
    ones — and the emitted pair set is IDENTICAL at any salt (each
    same-bucket pair matches at exactly one salt value)."""
    from ore_etl_spark.functions import similarity
    from ore_etl_spark.functions.dedup import simhash_radius_pairs
    from ore_etl_spark.functions.similarity import (auto_salt_partitions,
                                                    lsh_band_pairs)

    # sizing rule: the guard cap bounds any one bucket's pair loop, so
    # salt stays 1 at the default cap (replication overhead measured 2.5x
    # the straggler it would remove); it engages only when a caller
    # raises the cap past the ~50M-pairs-per-task budget
    assert auto_salt_partitions(0, 10_000) == 1
    assert auto_salt_partitions(8991, 10_000) == 1   # the measured sf1 case
    assert auto_salt_partitions(50_000, 10_000) == 1  # eff = cap = 10k
    assert auto_salt_partitions(30_000, 40_000) == 9  # ceil(450M/50M)
    assert auto_salt_partitions(100_000, 100_000) == 16  # clamp
    assert auto_salt_partitions(100_000, None, max_salt=16) == 16

    # output invariance across salt settings, skewed AND diverse corpora
    n, dim = 60, 8
    for vecs in (_clustered_vecs(n, dim), _random_vecs(n, dim, seed=9)):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>")
        outs = [
            {(r["id_a"], r["id_b"]) for r in
             lsh_band_pairs(df, dim=dim, n_bands=2, band_bits=2,
                            max_bucket_rows=25,
                            salt_partitions=s).collect()}
            for s in ("auto", 1, 16)
        ]
        assert outs[0] == outs[1] == outs[2] and len(outs[0]) > 0

    docs = spark.createDataFrame(
        [(i, "the very same boilerplate text everywhere") for i in range(40)]
        + [(100 + i, f"unique document number {i} with words {i * 7}")
           for i in range(10)],
        "doc_id long, text string")
    sh = [
        {(r["id_a"], r["id_b"], r["hamming"]) for r in
         simhash_radius_pairs(docs, radius=3, max_bucket_rows=25,
                              salt_partitions=s).collect()}
        for s in ("auto", 1, 16)
    ]
    assert sh[0] == sh[1] == sh[2] and len(sh[0]) > 0


def test_first_match_band_emission_equals_distinct_dedup(spark):
    """r6: with a clean capacity guard, banded blockers emit each pair
    from its FIRST matching band instead of deduping multi-band matches
    with a .distinct() shuffle. The emitted pair set must equal the
    banding semantics computed independently (driver-side signatures +
    brute-force band comparison), and a FIRED guard must fall back to the
    distinct-based dedup without losing the capped-subset soundness."""
    from ore_etl_spark.functions.dedup import (simhash_signatures_agg,
                                               simhash_radius_pairs)
    from ore_etl_spark.functions.similarity import (lsh_band_pairs,
                                                    query_signature)

    # --- hyperplane LSH: engine pairs == python banding oracle ----------
    n, dim, n_bands, band_bits = 80, 8, 4, 2
    vecs = _random_vecs(n, dim, seed=11)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    sigs = [query_signature(v, n_bands * band_bits) for v in vecs]

    def bands_of(s):
        return [s[b * band_bits:(b + 1) * band_bits] for b in range(n_bands)]

    expected = {
        (i, j)
        for i in range(n) for j in range(i + 1, n)
        if any(x == y for x, y in zip(bands_of(sigs[i]), bands_of(sigs[j])))
    }
    got = {(r["id_a"], r["id_b"]) for r in
           lsh_band_pairs(df, dim=dim, n_bands=n_bands, band_bits=band_bits,
                          max_bucket_rows=10_000).collect()}
    assert got == expected and len(got) > 0
    # multi-band duplicates must exist in this corpus for the test to
    # mean anything (otherwise first-match vs distinct is vacuous)
    multi = sum(
        1 for i, j in expected
        if sum(x == y for x, y in zip(bands_of(sigs[i]), bands_of(sigs[j]))) > 1)
    assert multi > 0
    # exactly-once emission: no duplicate rows without any distinct
    rows = lsh_band_pairs(df, dim=dim, n_bands=n_bands, band_bits=band_bits,
                          max_bucket_rows=10_000).collect()
    assert len(rows) == len(got)

    # --- simhash radius: engine pairs == python banding oracle ----------
    docs = spark.createDataFrame(
        [(i, f"shared words alpha beta gamma delta {i % 5} {i % 7}")
         for i in range(60)],
        "doc_id long, text string")
    radius, sn_bands, bits = 3, 4, 16
    sh_sigs = {r["id"]: r["sig"] for r in
               simhash_signatures_agg(docs, bits=bits).collect()}
    bb = bits // sn_bands
    mask = (1 << bb) - 1

    def sh_bands(s):
        return [(s >> (b * bb)) & mask for b in range(sn_bands)]

    exp = set()
    for i in sh_sigs:
        for j in sh_sigs:
            if i < j and any(x == y for x, y in
                             zip(sh_bands(sh_sigs[i]), sh_bands(sh_sigs[j]))):
                h = bin(sh_sigs[i] ^ sh_sigs[j]).count("1")
                if h <= radius:
                    exp.add((i, j, h))
    out = simhash_radius_pairs(docs, radius=radius, n_bands=sn_bands,
                               bits=bits, max_bucket_rows=10_000).collect()
    assert {(r["id_a"], r["id_b"], r["hamming"]) for r in out} == exp
    assert len(out) == len(exp) and len(exp) > 0  # exactly-once, no dups

    # --- fired guard falls back to distinct (subset, still deduped) -----
    clustered = spark.createDataFrame(
        [(i, v) for i, v in enumerate(_clustered_vecs(120, dim))],
        "vec_id long, embedding array<double>")
    fired = lsh_band_pairs(clustered, dim=dim, n_bands=2, band_bits=2,
                           max_bucket_rows=30).collect()
    fired_set = {(r["id_a"], r["id_b"]) for r in fired}
    assert len(fired) == len(fired_set) > 0  # deduped even when split
