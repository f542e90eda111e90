"""Deduplication operators for training-data pipelines.

Spark-first implementations, all shuffle-conscious:

- exact: hash-groupBy on a normalized content digest (one shuffle).
- MinHash + LSH: shingle -> K md5-derived minhashes -> band buckets ->
  candidate pairs via self-join *within buckets only* (the LSH point: no
  all-pairs shuffle; cost ~ sum over buckets of |bucket|^2).
- SimHash: per-token md5 bit votes -> 16/32-bit signature; exact dups share
  a signature, and ``simhash_radius_pairs`` finds near-dups within hamming
  distance r via bit-band blocking (pigeonhole: r < n_bands guarantees a
  shared band) + exact bit_count(xor) verification.
- n-gram Jaccard: verification metric for candidate pairs (exact set
  intersection over shingles) — used after LSH blocking, never all-pairs.
- embedding cosine near-dup: see functions/similarity.py.

Hashes are md5-based (not xxhash) so every step is reproducible in the
DuckDB oracle — md5 exists on both engines and is endianness-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def norm_text(col: Column) -> Column:
    return F.regexp_replace(F.lower(col), r"[ \t\n\x0B\f\r]+", " ")


def exact_digest(col: Column) -> Column:
    return F.md5(norm_text(col))


def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of exact duplicates: digest -> n_docs, min id kept."""
    return (
        df.withColumn("digest", exact_digest(F.col(text_col)))
        .groupBy("digest")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def shingles(col: Column, k: int = 3) -> Column:
    """Word k-shingles as strings (distinct).

    r6 optimization (guide §1.2 per-task work): the gram-building lambda
    must reference the token array as a BOUND lambda variable, not a
    captured expression — higher-order functions are CodegenFallback and
    re-evaluate captured child expressions per element, so the naive form
    re-tokenized the whole document for every element_at of every gram
    (k re-tokenizations per gram; measured 8.4 s of the 9.7 s
    decontaminate wall at sf1). Wrapping the tokenizer in a one-element
    array and building grams inside a ``transform`` lambda evaluates the
    tokenization exactly once per row; the emitted grams are
    byte-identical."""
    toks = F.filter(F.split(norm_text(col), " "), lambda t: t != "")

    def build(tk: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.size(tk) - (k - 1), F.lit(1)))
        return F.array_distinct(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(tk, i + j) for j in range(k)]),
            )
        )

    return F.element_at(F.transform(F.array(toks), build), 1)


def minhash_signatures_agg(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    n_hashes: int = 8,
) -> DataFrame:
    """Minhash signatures via explode -> codegen md5 -> partial-agg min.

    The per-row higher-order form (8 x array_min(transform(md5))) falls
    out of whole-stage codegen — Spark interprets the lambda per element
    and re-evaluates the shingle array per hash (no CSE through
    CodegenFallback): measured ~40x slower. Here shingles are computed
    ONCE per row, exploded to (id, shingle) rows, the 8 salted md5s run
    inside codegen, and map-side partial MIN aggregation shuffles only
    8 hashes per doc — the shape that survives 10^9 docs. Values are
    identical to the array form (min over a multiset == min over its
    distinct set), so the DuckDB oracle is unchanged.

    Returns (id, h0..h{n-1}).
    """
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), k_shingle)).alias("sh"),
    )
    return ex.groupBy("id").agg(*[
        F.min(F.md5(F.concat(F.lit(f"s{i}|"), F.col("sh")))).alias(f"h{i}")
        for i in range(n_hashes)
    ])


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    n_hashes: int = 8,
    band_size: int = 2,
    max_bucket_rows: int | None = 10_000,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band bucket.

    Returns (id_a, id_b, band) with id_a < id_b. Scale path: the join is
    an equi-join on (band, band_hash) — only same-bucket pairs shuffle.
    ``max_bucket_rows`` guards the Σ|bucket|² cliff on low-entropy corpora
    (e.g. millions of identical boilerplate docs collide on every band):
    oversize buckets split by deterministic id hash, see
    ``similarity.cap_band_buckets``. Normal corpora never hit the cap.
    """
    n_bands = n_hashes // band_size
    sig = minhash_signatures_agg(df, text_col, id_col, k_shingle, n_hashes)
    bands = sig.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        ",", *[F.col(f"h{b * band_size + j}")
                               for j in range(band_size)]
                    ).alias("band_key"),
                )
                for b in range(n_bands)
            ])
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.band_key").alias("band_key"))
    if max_bucket_rows is not None:
        from .similarity import cap_band_buckets

        bands = cap_band_buckets(bands, max_bucket_rows)
    a, b = bands.alias("a"), bands.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.id") < F.col("b.id")),
    )
    # r6 optimization (guide §2.4: remove shuffles outright): no trailing
    # ``.distinct()`` — the band table holds exactly ONE row per
    # (id, band) (explode of an n_bands-element array; cap_band_buckets
    # rewrites band_key in place, never fans out), so the equi-join can
    # emit at most one row per (id_a, id_b, band) and the distinct was a
    # no-op full shuffle of every candidate row.
    return pairs.select(
        F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
        F.col("a.band").alias("band"),
    )


def simhash16(col: Column) -> Column:
    """16-bit SimHash over word tokens (portable md5-derived bit votes).

    bit_i = 1 iff sum over tokens of (+-1 by bit_i of first-16-bits of
    md5(token)) > 0. 16 bits keeps the SQL-oracle expression tractable."""
    toks = F.filter(F.split(norm_text(col), " "), lambda t: t != "")
    tok_hash = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long")
    )

    def vote_fn(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for i in range(16):
        vote = F.aggregate(tok_hash, F.lit(0).cast("long"), vote_fn(i))
        out = out + F.when(vote > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0))
    return out


def simhash32(col: Column) -> Column:
    """32-bit SimHash over word tokens (md5-derived bit votes).

    bit_i(sig) = 1 iff sum over tokens of (+1 if bit_i(md5(tok)) else -1) > 0.
    """
    toks = F.filter(F.split(norm_text(col), " "), lambda t: t != "")
    tok_hash = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    def vote_fn(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bits = []
    for i in range(32):
        vote = F.aggregate(tok_hash, F.lit(0).cast("long"), vote_fn(i))
        bits.append(F.when(vote > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def simhash_signatures_agg(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """SimHash signatures via explode -> codegen bit votes -> one agg.

    Same interpreted-lambda escape as ``minhash_signatures_agg``: the
    column form runs ``bits`` separate F.aggregate lambdas per row outside
    codegen. Here tokens explode to (id, token-hash) rows, all bit votes
    are conditional SUMs in a single map-side-combined aggregation, and
    the signature reassembles from the vote signs. Values are identical
    to ``simhash16``/``simhash32`` (same votes, same sign rule).

    Returns (id, sig).
    """
    # ceil: for bits not a multiple of 4 (n_bands=6 widths), truncating
    # would zero the top vote bits — harvest one extra hex char instead
    hex_chars = (bits + 3) // 4
    toks = F.filter(F.split(norm_text(F.col(text_col)), " "), lambda t: t != "")
    # explode_outer keeps zero-token docs (NULL tok -> NULL h -> vote 0 ->
    # sig 0), matching simhash16's empty-array behavior exactly
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(toks).alias("tok"),
    ).select(
        "id",
        F.conv(F.substring(F.md5(F.col("tok")), 1, hex_chars), 16, 10)
        .cast("long").alias("h"),
    )
    votes = ex.groupBy("id").agg(*[
        F.sum(F.when(F.col("h").isNull(), 0)
              .when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
              .otherwise(-1)).alias(f"v{i}")
        for i in range(bits)
    ])
    sig = None
    for i in range(bits):
        term = F.when(F.col(f"v{i}") > 0, F.lit(2 ** i).cast("long")) \
                .otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return votes.select("id", sig.alias("sig"))


def simhash_radius_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    radius: int = 3,
    n_bands: int = 4,
    bits: int = 16,
    max_bucket_rows: int | None = 10_000,
    target_bucket_rows: int | None = None,
    approx_n: int | None = None,
    salt_partitions: int | str = "auto",
) -> DataFrame:
    """Near-dup pairs within hamming distance <= ``radius`` of a 16-bit
    SimHash — the banded candidate generation the plain signature-collision
    path misses (a 1-bit flip is a different bucket).

    Pigeonhole: two signatures differing in <= radius bits agree on at
    least one of n_bands bit-bands whenever radius < n_bands — so an
    equi-join on (band, band_key) finds EVERY pair within the radius (no
    all-pairs), and an exact ``bit_count(xor)`` verifies. Same LSH-banding
    shape as ``minhash_lsh_candidates``; the signature is a single long,
    so it rides through the band explode for free.

    Returns (id_a, id_b, hamming) with id_a < id_b, hamming <= radius.

    ``max_bucket_rows``: oversize-bucket guard (see
    ``similarity.cap_band_buckets``). A bucket only exceeds the cap when
    that many docs share a band key — at 16 bits that means a dense
    cluster of (near-)identical signatures, where the split trades the
    pigeonhole completeness WITHIN the monster bucket for a Σ|bucket|² bound;
    under-cap buckets keep the exact radius-recall guarantee.

    ``target_bucket_rows``: auto-WIDEN the signature so the banding keeps
    up with the corpus. A fixed 16-bit simhash has 2^(16/4)=16 band
    buckets — bucket size grows as N/16 and the candidate join goes
    quadratic (measured 1.2 s → 111 s at sf0.1 → sf1); worse, at ~10⁵+
    docs only 65,536 distinct signatures exist, so even the TRUE radius-3
    pair set is Θ(N²) — a 16-bit sketch stops meaning "near-dup" long
    before 100 TB. With a target, bits := n_bands * max(bits/n_bands,
    ceil(log2(n/target))): band buckets stay ≥ n/target so the expected
    bucket is ~target rows, and the wider signature keeps radius
    semantics discriminating at scale. The pigeonhole guarantee
    (radius < n_bands) is width-independent, so it survives the widening.
    Widening CHANGES which pairs fall within the radius (by design — more
    bits = a stricter, better sketch); callers pinning exact output (the
    sf0.01 oracle) pass a fixed ``bits`` and no target.
    """
    if radius >= n_bands:
        raise ValueError("need radius < n_bands for the pigeonhole guarantee")
    if target_bucket_rows is not None:
        from .similarity import band_bits_needed

        n = approx_n if approx_n is not None else df.count()
        need = band_bits_needed(n, target_bucket_rows)
        # only WIDEN: when the caller's width already meets the target,
        # bits passes through untouched (byte-identical output) — a
        # reassignment here would silently SHRINK e.g. bits=16/n_bands=5
        # to 15 and change signatures. Cap: sig accumulates as one
        # signed long, so at most 60 usable bits — and when the cap
        # binds, max() keeps the caller's width rather than rounding it
        # DOWN to n_bands * (60 // n_bands) (e.g. bits=60/n_bands=7
        # must not shrink to 56).
        if need > bits // n_bands:
            bits = max(bits, n_bands * min(need, 60 // n_bands))
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    sigs = simhash_signatures_agg(df, text_col, id_col, bits)
    bands = sigs.select(
        "id", "sig",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("sig"), b * band_bits)
                .bitwiseAND(F.lit(mask)).alias("band_key"),
            )
            for b in range(n_bands)
        ])).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"),
             F.col("bb.band_key").alias("band_key"))
    gs: dict = {}
    if max_bucket_rows is not None:
        from .similarity import cap_band_buckets

        bands = cap_band_buckets(bands, max_bucket_rows, stats_out=gs)
    # r6 optimizations (guide §2.3/§2.5), output-identical by construction:
    # 1. VERIFY BEFORE DEDUP: bit_count(xor) is a cheap map-side
    #    expression — run it before the cross-band distinct so the dedup
    #    shuffles only radius survivors, not every candidate row (the
    #    distinct-last form shuffled Σ|bucket|² rows with both sigs).
    # 2. SALT THE SELF-JOIN: simhash band keys are low-entropy (majority
    #    votes over a shared vocabulary), so one bucket can hold ~20% of
    #    the corpus and its |bucket|² pair loop lands in ONE task — a
    #    single-key skew straggler AQE cannot split (the explosion
    #    happens inside the join, invisible to its input-size stats).
    #    Deterministic salt: the left row keys on pmod(xxhash64(id), S),
    #    the right side is replicated S ways, so each same-bucket pair
    #    still matches EXACTLY once while the monster bucket's work
    #    spreads over S tasks (measured 5.9 s -> 1.8 s at sf1, byte-
    #    identical 8.53M-pair output). Replication costs S copies of
    #    the slim band table through the join's shuffle/sort — measured
    #    2.5x the straggler it removes at the DEFAULT 10k bucket cap
    #    (salt 1: 3.2 s vs salt 16: 8.2 s at sf1, even with a near-cap
    #    9k-row hot bucket), because the capacity guard already bounds
    #    any one bucket's loop at cap²/2 cheap bit_count comparisons.
    #    So the salt is ADAPTIVE ("auto", default): sized from the
    #    bucket histogram the guard already collects (zero extra jobs),
    #    1 at the default cap, engaging only when a caller raises the
    #    cap past the ~50M-pairs-per-task budget; with the guard off
    #    there is no histogram and auto stays at the skew-safe maximum.
    #    The pair set is identical at ANY salt.
    if salt_partitions == "auto":
        from .similarity import auto_salt_partitions

        s_n = (auto_salt_partitions(gs["largest_seen"], max_bucket_rows)
               if "largest_seen" in gs else 16)
    else:
        s_n = max(1, int(salt_partitions))
    a, b = bands.alias("a"), bands.alias("b")
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.id") < F.col("b.id"))
    )
    if s_n > 1:  # salt 1 is the identity — keep the plan free of it
        a = bands.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("id")), F.lit(s_n)).cast("int"),
        ).alias("a")
        b = bands.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(s_n - 1))),
        ).alias("b")
        cond = cond & (F.col("a._salt") == F.col("b._salt"))
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    joined = a.join(b, cond)
    # pair dedup (guide §2.4; mirrors similarity.lsh_band_pairs): a pair
    # within the radius matches in SEVERAL bands (that is the pigeonhole
    # guarantee), and the trailing .distinct() shuffled every surviving
    # row to collapse them. Both signatures are in the joined row, so the
    # FIRST matching band is a cheap bit expression and each pair emits
    # exactly once by construction — same pair set, no dedup exchange.
    # Only sound while band keys are raw signature slices: a fired
    # capacity guard splits buckets by id hash, which can separate a pair
    # in its first matching band while a later band still joins it, so
    # the guard case keeps the distinct.
    guard_clean = (max_bucket_rows is None) or not gs.get("fired", True)
    out = joined.select(
        F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
        ham.alias("hamming"),
        F.col("a.band").alias("_band"),
        F.col("a.sig").alias("_sa"), F.col("b.sig").alias("_sb"),
    ).filter(F.col("hamming") <= radius)
    if guard_clean:
        first_match = F.array_position(
            F.array(*[
                F.shiftright(F.col("_sa"), bb * band_bits)
                .bitwiseAND(F.lit(mask))
                == F.shiftright(F.col("_sb"), bb * band_bits)
                .bitwiseAND(F.lit(mask))
                for bb in range(n_bands)
            ]), True) - 1
        return (out.filter(F.col("_band") == first_match)
                .select("id_a", "id_b", "hamming"))
    return out.select("id_a", "id_b", "hamming").distinct()


def _driver_union_find(pairs) -> dict:
    """Exact components of a small edge list via union-find with path
    compression, union-by-min (the smaller id always becomes the root, so
    every root IS its component's minimum). Bounded driver work: callers
    gate on edge count."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
        else:
            parent.setdefault(u, ru)
            parent.setdefault(v, rv)
    return {x: find(x) for x in parent}


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    driver_finish_edges: int | None = 400_000,
) -> DataFrame:
    """Connected components over a pair list via alternating large-star /
    small-star contraction (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14 — public algorithm): converges in
    O(log n) rounds instead of O(diameter), so a 100 TB-scale dup graph
    with long chains still finishes in a handful of shuffles. This is the
    step that turns near-dup PAIRS (LSH output) into dedup CLUSTERS with a
    canonical keeper per cluster.

    large-star: every neighbor v > u re-points to min(Γ⁺(u));
    small-star: every neighbor v <= u (and u itself) points to min(Γ⁺(u)).
    Fixpoint = a forest of depth-1 stars rooted at each component minimum.

    Each round is two groupBy-min + two equi-joins; ``localCheckpoint``
    truncates the plan per round (iterative lineage would otherwise grow
    unboundedly). Convergence is detected from a cheap (count, hash-sum)
    aggregate of the edge set. The checkpoint is LAZY and the fingerprint
    aggregate is the action that materializes it, so each round is ONE
    Spark job (compute + persist + fingerprint in a single pass) — the
    eager-checkpoint-then-collect form ran two jobs per round, and on
    small/medium edge sets the per-round job barrier, not data volume,
    is the wall (measured 2.2 s for 669 edges at 32 cores).

    ``driver_finish_edges``: star contraction shrinks the edge set
    geometrically, so the LAST rounds are always tiny and pure barrier
    cost — ~0.4 s/round to shuffle a few hundred rows at 32 cores. Once
    the (exactly counted) edge set fits under this bound, the remainder
    is finished with exact union-find on the driver (≤ ~10 MB at the
    400k default — raised from 100k in r6: the sf1 bench graph lands at
    ~160k round-0 edges, and an interleaved A/B measured the collect +
    union-find ~0.2-0.3 s cheaper and lower-variance than the one extra
    contraction round the lower threshold forced) instead of paying
    more distributed rounds. At
    100 TB the big early rounds still run distributed; the hybrid only
    replaces the contraction TAIL, and each contraction round preserves
    the component partition (Kiveris Lemma 1–2), so union-find on round
    k's edges yields exactly the fixpoint labels. Pass ``None`` to force
    the all-distributed loop.

    Returns (node, component) for every node appearing in ``edges``,
    component = min node id of the component.
    """
    # r6 optimization: checkpoint the PROJECTED input pair list once —
    # both the contraction loop's first round AND the final `nodes`
    # projection read this 2-long-column cache instead of re-evaluating
    # the caller's (typically expensive: full LSH candidate generation)
    # lineage twice. Lazy: the first fingerprint action materializes it.
    ed0 = (
        edges.select(F.col(id_a).cast("long").alias("u"),
                     F.col(id_b).cast("long").alias("v"))
        .localCheckpoint(eager=False)
    )
    e = (
        ed0.filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def large_star(ed: DataFrame) -> DataFrame:
        sym = ed.union(ed.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (sym.groupBy("u").agg(F.min("v").alias("mn"))
                .select("u", F.least(F.col("mn"), F.col("u")).alias("m")))
        # no trailing distinct: small_star's orientation-normalized
        # distinct immediately dedups this output, so a distinct here is
        # a redundant extra shuffle every round
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )

    def small_star(ed: DataFrame) -> DataFrame:
        d = ed.select(F.greatest("u", "v").alias("u"),
                      F.least("u", "v").alias("v")).distinct()
        m = d.groupBy("u").agg(F.min("v").alias("m"))
        j = d.join(m, "u")
        out = j.select(F.col("v").alias("u"), F.col("m").alias("v")).union(
            m.select(F.col("u"), F.col("m").alias("v"))
        )
        return out.filter(F.col("u") != F.col("v")).distinct()

    def fingerprint(ed: DataFrame):
        # bit_xor is order-independent and cannot overflow (ANSI-safe)
        row = ed.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    prev = None
    lab = None
    for _ in range(max_iter):
        # the fingerprint aggregate is the action that computes AND
        # persists the current (lazily checkpointed) edge set — one
        # job per round. (r6 note: a limit(N+1)-probe that answers
        # "small enough?" and delivers the edges in ONE job was tried
        # and reverted — it saves a light cached-collect job only when
        # the edge set is ALREADY small, but on an over-threshold graph
        # the probe runs the full upstream lineage through the distinct's
        # shuffle before giving up: measured +0.3–0.6 s per distributed
        # round at sf1 vs −0.3 s at sf0.1. Fingerprint-first keeps the
        # big-graph rounds at exactly one job each.)
        fp = fingerprint(e)
        if fp == prev or fp[0] == 0:
            break
        prev = fp
        if driver_finish_edges is not None and fp[0] <= driver_finish_edges:
            comp = _driver_union_find(
                (r["u"], r["v"]) for r in e.collect())
            # bounded by construction (<= 2 * driver_finish_edges nodes);
            # broadcast the label map rather than shuffling `nodes`
            lab = F.broadcast(e.sparkSession.createDataFrame(
                list(comp.items()), schema="node long, component long"))
            break
        e = small_star(large_star(e)).localCheckpoint(eager=False)

    nodes = (
        ed0.select(F.col("u").alias("node"))
        .union(ed0.select(F.col("v").alias("node")))
        .distinct()
    )
    if lab is None:
        # min-agg guards the (max_iter hit before fixpoint) edge case: a
        # node with several outgoing edges must not fan out dup labels
        lab = e.groupBy(F.col("u").alias("node")).agg(
            F.min("v").alias("component"))
    return (
        nodes.join(lab, "node", "left")
        .select("node", F.coalesce("component", F.col("node")).alias("component"))
    )


def jaccard_from_shingles(sa: Column, sb: Column) -> Column:
    """Exact Jaccard over two precomputed shingle-array columns. Verify
    stages should project the arrays ONCE PER DOC before the candidate
    join and call this on the joined arrays — computing shingles on the
    pair side redoes the whole shingling per candidate pair (r6: measured
    183 s → 8 s at sf1 for the gated jaccard query)."""
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(F.array_union(sa, sb))
    return F.round(inter / F.greatest(union, F.lit(1)), 6)


def ngram_jaccard(a: Column, b: Column, k: int = 3) -> Column:
    """Exact Jaccard similarity of word k-shingle sets (verification step)."""
    return jaccard_from_shingles(shingles(a, k), shingles(b, k))
