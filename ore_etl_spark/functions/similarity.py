"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB pipeline needs:

- ``cosine_topk_brute``: exact brute-force top-k against a query vector.
  The dot product is a JVM ``aggregate`` over zipped arrays (no Python);
  the top-k is ``TakeOrderedAndProject`` (no global sort materialization).
  Right for one-off probes or small candidate sets.
- ``lsh_bucket_ann`` (scale path): random-hyperplane LSH — sign-bit
  signature from H md5-seeded pseudo-hyperplanes; candidates share a
  signature bucket, then exact cosine re-ranks within buckets only.
  All-pairs never materializes; cost ~ sum(|bucket|^2).
- ``with_lsh_signature``: write-time signature column — persist (and
  partition) the table by ``lsh_sig`` so an ANN probe is a
  partition-pruned scan of one bucket, no per-query signature compute.
- ``cosine_pairs_threshold``: embedding-cosine near-dup over candidate
  pairs. With ``block_col=None`` it blocks on banded LSH signatures
  (OR over bands → high recall), NEVER a constant block / cross join.
- ``ivf_assign`` / ``ivf_ann`` (second scale path): inverted-file ANN —
  a small sampled-centroid coarse quantizer assigns every vector to a
  cell; a probe scans only the query's nprobe nearest cells. Persist
  ``partitionBy(ivf_cell)`` and the probe is a partition-pruned scan.

Hyperplane components are md5-derived doubles in [-1, 1) — deterministic,
reproducible in an external SQL oracle. Each plane is materialized as ONE
literal array column (``F.lit(list)``), so the per-row expression count is
O(n_planes), not O(n_planes × dim): at 768-dim × 16 planes the old
per-(plane, dim) unroll built ~12k expression nodes (a codegen /
constant-fold cliff); the literal-array form builds 16 ``aggregate``
nodes over folded constants (verified by tests/test_plans.py at dim=256).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

def norm2(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.greatest(norm2(a) * norm2(b), F.lit(1e-12))


def _py_norm2(vec: list[float]) -> float:
    """Driver-side ||v||: the same left-to-right fold ``norm2`` runs, so
    the result is bit-identical to evaluating the column expression —
    lets probe queries fold a LITERAL query vector's norm once on the
    driver instead of once per scanned row."""
    import math

    s = 0.0
    for x in vec:
        s += float(x) * float(x)
    return math.sqrt(s)


def _cosine_to_query(vec_col: Column, query_vec: list[float]) -> Column:
    """cosine(row_vec, literal query): per-row work is one dot fold plus
    the row's own norm — the query norm is a driver-side constant
    (bit-identical to the folded form; at 10^9 scanned rows the saved
    literal-array fold is a third of the probe's expression work)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = _py_norm2(query_vec)
    return dot(vec_col, q) / F.greatest(norm2(vec_col) * F.lit(qn),
                                        F.lit(1e-12))


def cosine_topk_brute(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    return (
        df.select(
            F.col(id_col),
            F.round(_cosine_to_query(F.col(vec_col), query_vec),
                    round_to).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH
# ---------------------------------------------------------------------------

def hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-hyperplane: component d is an md5-derived
    double in [-1, 1). Same formula as the SQL oracle:
    ('0x' || substr(md5('hp{p}d{d}'), 1, 8)) / 2^31 - 1."""
    return [
        int(hashlib.md5(f"hp{plane}d{d}".encode()).hexdigest()[:8], 16)
        / 2147483648.0 - 1.0
        for d in range(dim)
    ]


def _plane_dot(vec: Column, plane_vals: list[float]) -> Column:
    """<vec, plane> with the plane as ONE literal array column.

    ``F.lit(list)`` produces a single array Literal — constant-folded, no
    per-dimension expression nodes, stays inside whole-stage codegen."""
    return F.aggregate(
        F.zip_with(vec, F.lit(plane_vals), lambda x, h: x.cast("double") * h),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sign_bit(vec: Column, plane: int, dim: int) -> Column:
    return F.when(_plane_dot(vec, hyperplane(plane, dim)) >= 0,
                  F.lit("1")).otherwise(F.lit("0"))


def lsh_signature(vec_col: Column, n_planes: int, dim: int) -> Column:
    """Concatenated sign bits as a string bucket key."""
    return F.concat_ws("", *[_sign_bit(vec_col, p, dim) for p in range(n_planes)])


def with_lsh_signature(df: DataFrame, dim: int, n_planes: int = 8,
                       vec_col: str = "embedding",
                       sig_col: str = "lsh_sig") -> DataFrame:
    """Write-time signature: attach ``sig_col`` so the table can be
    persisted ``partitionBy(sig_col)`` — an ANN probe then reads exactly
    one bucket directory (partition pruning), with zero signature work at
    query time. This is the 100 TB path: signatures are computed once per
    ingest, not once per query."""
    return df.withColumn(sig_col, lsh_signature(F.col(vec_col), n_planes, dim))


def query_signature(query_vec: list[float], n_planes: int) -> str:
    """Driver-side signature of a probe vector (same math as the column)."""
    dim = len(query_vec)
    bits = []
    for p in range(n_planes):
        h = hyperplane(p, dim)
        s = 0.0
        for x, hv in zip(query_vec, h):
            s += float(x) * hv
        bits.append("1" if s >= 0 else "0")
    return "".join(bits)


def lsh_bucket_ann(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_planes: int = 6,
    round_to: int = 6,
    sig_col: str | None = None,
) -> DataFrame:
    """ANN: probe only vectors whose LSH bucket matches the query's.

    If ``sig_col`` names a precomputed signature column (see
    ``with_lsh_signature``), the probe is a pure filter + re-rank — at
    scale a partition-pruned scan of one bucket. Otherwise signatures are
    computed on the fly (one literal-array dot per plane)."""
    dim = len(query_vec)
    q_sig = query_signature(query_vec, n_planes)
    if sig_col is None:
        sigged = df.withColumn("_sig", lsh_signature(F.col(vec_col), n_planes, dim))
        sig_col = "_sig"
    else:
        sigged = df
    return (
        sigged.filter(F.col(sig_col) == q_sig)
        .select(
            F.col(id_col),
            F.round(_cosine_to_query(F.col(vec_col), query_vec),
                    round_to).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


# Observability for the band-capacity guard (round-4 ADVICE): a fired
# guard deterministically DROPS cross-sub-bucket candidate pairs (and,
# inside the split bucket, simhash's pigeonhole radius guarantee) — recall
# degradation that must never be silent. Each cap_band_buckets call
# overwrites this dict and logs a WARNING when the guard fired, so both a
# human tailing logs and a caller inspecting the module see it. (Plain
# module global: per-driver, last-call-wins — observability, not a ledger.)
LAST_GUARD_STATS: dict = {
    "fired": False, "n_oversize_buckets": 0, "rows_in_oversize": 0,
    "largest_bucket": 0, "max_bucket_rows": None,
}

# DataFrame.persist registers in Spark's CacheManager and is NOT released
# when the Python object is GC'd — a long-lived driver calling guarded
# blockers per micro-batch (fresh plan each batch) would accumulate cached
# band tables forever. Bounded FIFO: past _MAX_CACHED_BAND_TABLES entries
# the oldest is unpersisted. persist keeps lineage, so eviction can only
# cost recompute, never correctness — even mid-query. The FIFO and
# LAST_GUARD_STATS are module globals shared by concurrent pipelines
# (backfill worker threads, the pipelined bench stats thread), so both
# mutate under one lock — interleaved append/pop could otherwise
# double-unpersist, and torn stats updates could misreport a guard fire.
_MAX_CACHED_BAND_TABLES = 8
_persisted_band_tables: list = []

import threading as _threading  # noqa: E402

_guard_lock = _threading.Lock()


def _remember_persisted(df: DataFrame) -> None:
    with _guard_lock:
        _persisted_band_tables.append(df)
        evict = []
        while len(_persisted_band_tables) > _MAX_CACHED_BAND_TABLES:
            evict.append(_persisted_band_tables.pop(0))
    for old in evict:  # unpersist outside the lock (it can block on RPC)
        try:
            old.unpersist(blocking=False)
        except Exception:  # session already stopped — nothing to free
            pass


def band_bits_needed(n: int, target_bucket_rows: int) -> int:
    """The bucket-count exponent at which the EXPECTED band bucket holds
    ~target rows: ceil(log2(n / target)). Shared by every banded blocker
    that auto-sizes with corpus scale (``lsh_band_pairs`` grows its
    band_bits, ``dedup.simhash_radius_pairs`` widens its signature) so
    the sizing rule can only drift in one place."""
    import math

    return max(0, math.ceil(math.log2(max(1.0, n / target_bucket_rows))))


# Adaptive self-join salting (r6, guide §2.5). A static salt is wrong:
# the S-fold band-table replication costs O(S·N·n_bands) rows through the
# join's shuffle/sort — measured 3.2 s (salt 1) vs 8.2 s (salt 16) on the
# sf1 simhash query even WITH a near-cap 9k-row hot bucket, because the
# capacity guard already bounds any one bucket's |bucket|²/2 pair loop at
# cap²/2 comparisons (cheap band-key/bit_count work, ~1-2 s per 50M at
# worst) and a corpus with MANY capped sub-buckets spreads them across
# tasks by bucket key anyway. Salt therefore engages only when a caller
# RAISES the cap far enough that one capped loop is a real straggler:
# S = ceil(min(largest, cap)² / 2 / _SALT_TASK_PAIRS), clamped [1, 16],
# sized from the bucket histogram cap_band_buckets ALREADY collects for
# its capacity guard (same single job — the stats ride along for free).
_SALT_REPORT_OVER = 10_000     # report buckets above this for salt sizing
                               # (10k²/2 = _SALT_TASK_PAIRS: anything
                               # smaller can't need more than one task)
_SALT_TASK_PAIRS = 50_000_000  # per-task pair-loop budget (~1-2 s)
_GUARD_COLLECT_CAP = 4096      # bound on the single-job histogram collect


def auto_salt_partitions(largest_bucket: int, max_bucket_rows: int | None,
                         max_salt: int = 16) -> int:
    """Salt factor for a banded self-join, from the largest observed band
    bucket: enough ways to spread that bucket's |bucket|²/2 pair loop into
    ~``_SALT_TASK_PAIRS``-sized tasks, never more than ``max_salt``. The
    capacity guard splits buckets at ``max_bucket_rows``, so the effective
    per-bucket loop is bounded by the cap."""
    import math

    eff = int(largest_bucket)
    if max_bucket_rows is not None:
        eff = min(eff, int(max_bucket_rows))
    return max(1, min(max_salt, math.ceil(eff * eff / 2 / _SALT_TASK_PAIRS)))


def cap_band_buckets(bands: DataFrame, max_bucket_rows: int,
                     id_col: str = "id",
                     stats_out: dict | None = None) -> DataFrame:
    """Band-capacity guard shared by every (band, band_key) blocker.

    Buckets larger than ``max_bucket_rows`` are split into
    ceil(count/cap) sub-buckets by a deterministic hash of the id —
    extra planes/hashes cannot split a tight cluster of near-identical
    rows (they collide on EVERY signature), so the split is by id,
    bounding the candidate join's Σ|bucket|² at ~count×cap instead of
    count². The oversize list is ≤ n/cap buckets: it is counted HERE
    (driver-side collect of oversize buckets only) so a fired guard is
    loud — WARNING log + ``LAST_GUARD_STATS`` — never a silent recall
    drop. Emitted pairs from an oversize bucket become a deterministic
    subset; buckets under the cap are byte-identical to the unguarded
    output (band_key is cast to string so the guarded column has one
    type either way).

    Cost: the band table is persisted (MEMORY_AND_DISK, spill-safe)
    before the count so the upstream signature pipeline — shingle /
    minhash / hyperplane work, the expensive part — is evaluated ONCE and
    the candidate self-join reads the cache from both sides. Round 4
    measured a +4–12% always-on premium from re-evaluating that pipeline
    for the count aggregate; the cache removes it. The count itself uses
    map-side partial aggregation (tiny shuffle of distinct bucket keys,
    rows never concentrate), whereas the cheaper-looking window-count
    alternative would physically shuffle ALL band rows by
    (band, band_key) and land a monster bucket in ONE task — dying on
    exactly the adversarial input the guard exists for. On a cluster the
    persist recomputes from lineage after executor loss (unlike
    localCheckpoint, which would fail the job). Callers on
    trusted-entropy corpora can pass ``max_bucket_rows=None``.

    ``stats_out``: optional dict the histogram rides back in (same job,
    no extra cost): ``largest_seen`` = the largest band-bucket row count
    observed above ``report_over`` (0 when every bucket is at or below
    it) — the input the caller's adaptive join salt is sized from. The
    collect is bounded at ``_GUARD_COLLECT_CAP`` buckets (sorted
    descending, so the max and the biggest oversize buckets always make
    the cut); in the pathological case where the bound truncates the
    oversize list, ONE extra aggregate over the already-persisted band
    table re-collects the full oversize set."""
    from pyspark.storagelevel import StorageLevel

    bands = bands.persist(StorageLevel.MEMORY_AND_DISK)
    _remember_persisted(bands)
    report_over = max_bucket_rows
    if stats_out is not None:
        report_over = min(max_bucket_rows, _SALT_REPORT_OVER)
    counts = (bands.groupBy("band", "band_key")
              .agg(F.count("*").alias("_bn")))
    top = (counts.filter(F.col("_bn") > report_over)
           .sort(F.desc("_bn"))
           .limit(_GUARD_COLLECT_CAP)
           .collect())
    if stats_out is not None:
        stats_out["largest_seen"] = int(top[0]["_bn"]) if top else 0
        stats_out["report_over"] = report_over
    if len(top) == _GUARD_COLLECT_CAP:
        # the bounded collect may have truncated the oversize set — the
        # split must see EVERY bucket over the cap (rare: >4096 oversize)
        oversize_rows = (counts.filter(F.col("_bn") > max_bucket_rows)
                         .collect())
    else:
        oversize_rows = [r for r in top if r["_bn"] > max_bucket_rows]
    if stats_out is not None:
        # whether any bucket was split — callers use this to decide if
        # first-matching-band pair emission is sound (a split bucket can
        # drop individual band occurrences, so only the distinct-based
        # dedup is correct once the guard fires)
        stats_out["fired"] = bool(oversize_rows)
    with _guard_lock:
        LAST_GUARD_STATS.update({
            "fired": bool(oversize_rows),
            "n_oversize_buckets": len(oversize_rows),
            "rows_in_oversize": sum(r["_bn"] for r in oversize_rows),
            "largest_bucket": max((r["_bn"] for r in oversize_rows),
                                  default=0),
            "max_bucket_rows": max_bucket_rows,
        })
    if not oversize_rows:
        return bands.withColumn("band_key", F.col("band_key").cast("string"))
    import logging

    logging.getLogger(__name__).warning(
        "band-capacity guard FIRED: %d bucket(s) over cap=%d "
        "(largest=%d rows, %d rows affected) — cross-sub-bucket candidate "
        "pairs in those buckets are dropped (bounded recall loss); see "
        "LAST_GUARD_STATS", len(oversize_rows), max_bucket_rows,
        LAST_GUARD_STATS["largest_bucket"],
        LAST_GUARD_STATS["rows_in_oversize"])
    spark = bands.sparkSession
    oversize = spark.createDataFrame(
        [(r["band"], r["band_key"], -(-r["_bn"] // max_bucket_rows))
         for r in oversize_rows],
        schema=bands.select(
            "band", "band_key",
            F.lit(1).cast("int").alias("_nsub")).schema,
    )
    return (
        bands.join(F.broadcast(oversize), ["band", "band_key"], "left")
        .withColumn(
            "band_key",
            F.when(
                F.col("_nsub").isNotNull(),
                F.concat_ws("#", F.col("band_key").cast("string"),
                            F.pmod(F.xxhash64(F.col(id_col)),
                                   F.col("_nsub")).cast("string")),
            ).otherwise(F.col("band_key").cast("string")),
        )
        .drop("_nsub")
    )


def lsh_band_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    n_bands: int = 8,
    band_bits: int = 2,
    max_bucket_rows: int | None = 10_000,
    target_bucket_rows: int | None = None,
    approx_n: int | None = None,
    salt_partitions: int | str = "auto",
) -> DataFrame:
    """Candidate pairs sharing ANY LSH band (banded OR — high recall).

    Uses n_bands × band_bits hyperplanes; each band's bits form a bucket
    key; candidates are an equi-join on (band, band_key). Only the id and
    the short signature string shuffle through the join — vectors are
    joined back by the caller. Returns distinct (id_a, id_b) with
    id_a < id_b (unique by construction via first-matching-band emission
    when the capacity guard is clean; via an explicit dedup otherwise).

    Band-capacity guard (round 4): the candidate join's cost is
    Σ|bucket|², and with band_bits small relative to N a low-entropy
    embedding set (every vector the same side of every plane) silently
    degenerates toward N²/2^band_bits — the one quadratic cliff in the
    dedup/ANN layer at 10⁹ docs. Two knobs, both deterministic:

    - ``target_bucket_rows``: auto-size band_bits up from a rough row
      count (``approx_n`` if given, else one ``df.count()`` job) so the
      EXPECTED bucket is that size: band_bits_eff =
      max(band_bits, ceil(log2(n / target))). Helps when vectors are
      diverse but the caller under-sized the bits.
    - ``max_bucket_rows`` (on by default): a hard per-(band, band_key)
      cap. Buckets over the cap are split into ceil(count/cap) sub-buckets
      by a deterministic id hash — extra planes cannot split a tight
      cluster (near-identical vectors land the same side of EVERY plane),
      so the split is by id, trading within-monster-bucket recall for a
      Σ|bucket|² bound of ~count×cap instead of count². The oversize
      bucket list is ≤ n/cap rows, broadcast back onto the band table.
      Pairs emitted by an oversize bucket become a deterministic subset;
      normal-entropy data never hits the cap (buckets ≪ cap), so results
      are unchanged — verified by the recall gates and the SQL oracles.
    """
    if dim is None:
        raise ValueError("dim is required (hyperplanes are literal arrays)")
    if target_bucket_rows is not None:
        n = approx_n if approx_n is not None else df.count()
        band_bits = max(band_bits, band_bits_needed(n, target_bucket_rows))
    # the full signature (all bands' bits, one short string) rides along
    # so the candidate join can test OTHER bands' keys per joined row —
    # the first-matching-band emission below needs it. It is computed
    # ONCE per row in its own projection (the sign bits are HOF
    # aggregates, which sit outside codegen subexpression elimination —
    # rebuilding a band's bits in the explode would re-run every plane
    # dot); band keys are substrings of the signature attribute, which is
    # character-identical to concatenating that band's sign bits.
    sigged = df.select(
        F.col(id_col).alias("id"),
        F.concat_ws("", *[
            _sign_bit(F.col(vec_col), p, dim)
            for p in range(n_bands * band_bits)
        ]).alias("sig"),
    )
    bands = sigged.select(
        "id", "sig",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.substring(F.col("sig"), b * band_bits + 1,
                            band_bits).alias("band_key"),
            )
            for b in range(n_bands)
        ])).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"),
             F.col("bb.band_key").alias("band_key"))
    gs: dict = {}
    if max_bucket_rows is not None:
        bands = cap_band_buckets(bands, max_bucket_rows, stats_out=gs)
    # salted self-join (r6, guide §2.5 — see dedup.simhash_radius_pairs):
    # clustered embeddings land the same side of every plane, so one band
    # bucket can hold a large corpus fraction and its |bucket|² pair loop
    # is a single-task straggler; the deterministic id-salt splits that
    # loop over salt_partitions tasks while each pair still matches
    # exactly once — the emitted pair set is unchanged at ANY salt.
    # "auto" (default) sizes the salt from the bucket histogram the
    # capacity guard already collected (zero extra jobs): 1 at the
    # default cap — the guard's bucket split already bounds the loop,
    # and S-fold replication measured 2.5x the straggler it removes —
    # engaging only when a caller raises the cap past the ~50M-pairs-
    # per-task budget; with the guard off there is no histogram, so
    # auto stays at the skew-safe maximum.
    if salt_partitions == "auto":
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
    pairs = a.join(b, cond).select(
        F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
        F.col("a.band").alias("_band"),
        F.col("a.sig").alias("_sa"), F.col("b.sig").alias("_sb"))
    # pair dedup (guide §2.4: remove shuffles outright): a pair matching
    # in SEVERAL bands used to be deduped by a full .distinct() shuffle of
    # every candidate row. With both signatures in the joined row, the
    # FIRST matching band is a cheap per-row expression, so each pair is
    # emitted exactly once by construction — same pair set, no dedup
    # exchange. Sound only while band keys are raw signature slices: once
    # the capacity guard splits a bucket, a pair can be separated in its
    # first matching band's sub-buckets yet joined in a later band, and
    # the first-match filter would drop it — so a fired guard keeps the
    # distinct-based dedup.
    guard_clean = (max_bucket_rows is None) or not gs.get("fired", True)
    if n_bands == 1:
        return pairs.select("id_a", "id_b")
    if guard_clean:
        first_match = F.array_position(
            F.array(*[
                F.substring(F.col("_sa"), bb * band_bits + 1, band_bits)
                == F.substring(F.col("_sb"), bb * band_bits + 1, band_bits)
                for bb in range(n_bands)
            ]), True) - 1
        return (pairs.filter(F.col("_band") == first_match)
                .select("id_a", "id_b"))
    return pairs.select("id_a", "id_b").distinct()


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path besides hyperplane LSH
# ---------------------------------------------------------------------------

def l2sq(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
    cell_ids: list[int] | None = None,
) -> DataFrame:
    """Assign each vector to its nearest coarse-quantizer centroid.

    The centroid table is tiny by design (K cells for N >> K vectors), so
    it ships as K literal arrays — one squared-L2 ``aggregate`` per cell,
    argmin via ``array_min`` over (distance, cell) structs (struct ordering
    breaks ties on the lower cell id, matching the SQL oracle's
    ORDER BY d, cell). At scale the assignment is a narrow map over the
    ingest; persisting ``partitionBy(cell_col)`` makes every probe a
    partition-pruned scan of nprobe cells."""
    if cell_ids is None:
        cell_ids = list(range(len(centroids)))
    structs = [
        F.struct(
            l2sq(F.col(vec_col), F.lit([float(x) for x in c])).alias("d"),
            F.lit(int(i)).alias("cell"),
        )
        for i, c in zip(cell_ids, centroids)
    ]
    return df.withColumn(cell_col, F.array_min(F.array(*structs))["cell"])


def ivf_query_cells(query_vec: list[float], centroids: list[list[float]],
                    cell_ids: list[int] | None = None, nprobe: int = 2) -> list[int]:
    """Driver-side: the nprobe nearest cells for a probe vector (same
    sequential double math as the column expression)."""
    if cell_ids is None:
        cell_ids = list(range(len(centroids)))
    dists = []
    for i, c in zip(cell_ids, centroids):
        s = 0.0
        for x, y in zip(query_vec, c):
            s += (float(x) - float(y)) * (float(x) - float(y))
        dists.append((s, i))
    dists.sort()
    return [i for _, i in dists[:nprobe]]


def ivf_ann(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    nprobe: int = 2,
    round_to: int = 6,
    cell_ids: list[int] | None = None,
    cell_col: str | None = None,
) -> DataFrame:
    """IVF ANN probe: scan only the query's nprobe nearest cells, exact
    cosine re-rank within them. Pass ``cell_col`` if assignments were
    precomputed at write time (partition-pruned probe); otherwise cells
    are computed on the fly."""
    probe = ivf_query_cells(query_vec, centroids, cell_ids, nprobe)
    if cell_col is None:
        df = ivf_assign(df, centroids, vec_col, "_cell", cell_ids)
        cell_col = "_cell"
    return (
        df.filter(F.col(cell_col).isin(probe))
        .select(
            F.col(id_col),
            F.round(_cosine_to_query(F.col(vec_col), query_vec),
                    round_to).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def knn_join(
    df: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    n_bands: int = 2,
    band_bits: int = 2,
    round_to: int = 6,
    max_bucket_rows: int | None = 10_000,
    target_bucket_rows: int | None = None,
    approx_n: int | None = None,
) -> DataFrame:
    """Per-row k nearest neighbors — the curation workhorse ("for EVERY
    document, its k nearest") — without ever materializing all pairs.

    Banded-LSH candidate generation (``lsh_band_pairs``: an equi-join on
    (band, band_key) only) → exact cosine re-rank of the candidates →
    ``row_number() <= k`` per row. Cost ~ Σ|bucket|², never N²; only
    (id, band_key) shuffles through the candidate join, vectors join back
    by id afterwards. Rows whose buckets hold no other vector yield no
    neighbors — recall is tuned with n_bands × band_bits (more bands =
    higher recall at more candidates; tests/test_ann_recall.py pins a
    measured floor vs brute force). Returns (id, nbr, cos_sim, rank).

    ``target_bucket_rows``: pass-through to ``lsh_band_pairs``'s
    auto-sizing — band_bits grows with N so the EXPECTED bucket (and with
    it per-row candidate work) stays constant as the corpus scales. With
    a fixed band_bits, bucket size is N/2^band_bits and the candidate
    join is Σ|bucket|² = quadratic in N — measured 2.9 s → 163 s going
    sf0.1 → sf1 before this knob existed. At 10⁹ vectors this is the
    difference between a working KNN join and an impossible one.

    Shrinking buckets costs recall at fixed n_bands; recover it with
    MORE BANDS, never bigger buckets — per-row candidate cost is
    ~n_bands × target (linear in bands) while bucket growth is quadratic
    in N. Measured on the sf0.01 fixture at target=32: recall@3 0.41 at
    4 bands → 0.68 at 8 → 0.84 at 12 (pinned in
    tests/test_ann_recall.py).
    """
    if dim is None:
        raise ValueError("dim is required (hyperplanes are literal arrays)")
    cand = lsh_band_pairs(df, vec_col, id_col, dim=dim,
                          n_bands=n_bands, band_bits=band_bits,
                          max_bucket_rows=max_bucket_rows,
                          target_bucket_rows=target_bucket_rows,
                          approx_n=approx_n)
    # norms are computed ONCE PER VECTOR in the pre-join projection — a
    # pair-side cosine() would re-fold both 2·dim-element norm aggregates
    # for every candidate pair (Σ|bucket|² of them), tripling the re-rank's
    # expression work. Same float op order per vector, so cos_sim is
    # bit-identical to the cosine() form (the SQL oracle is unchanged).
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                  norm2(F.col(vec_col)).alias("na"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                  norm2(F.col(vec_col)).alias("nb"))
    cos = (dot(F.col("va"), F.col("vb"))
           / F.greatest(F.col("na") * F.col("nb"), F.lit(1e-12)))
    # r6 optimization (guide §1.2: fix the algorithm first): score each
    # UNDIRECTED pair once, THEN symmetrize the scored rows — the old
    # symmetrize-then-score form ran the vector joins and the dim-element
    # dot fold twice per pair (both directions), doubling the dominant
    # re-rank stage. cos is bit-symmetric (per-element float multiply
    # commutes; the fold order over dims is the row order either way;
    # na*nb == nb*na), so both directions carry the identical rounded
    # value and the ranking output is unchanged.
    pair_scored = cand.join(a, "id_a").join(b, "id_b").select(
        "id_a", "id_b", F.round(cos, round_to).alias("cos_sim"))
    # symmetrize with ONE generator (not a unionAll of two projections,
    # which would plan the scoring subtree twice and re-run the joins)
    scored = pair_scored.select(
        F.explode(F.array(
            F.struct(F.col("id_a").alias("id"), F.col("id_b").alias("nbr")),
            F.struct(F.col("id_b").alias("id"), F.col("id_a").alias("nbr")),
        )).alias("_p"),
        "cos_sim",
    ).select(F.col("_p.id").alias("id"), F.col("_p.nbr").alias("nbr"),
             "cos_sim")
    w = Window.partitionBy("id").orderBy(F.desc("cos_sim"), F.asc("nbr"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def kmeans_refine(
    df: DataFrame,
    centroids: list[list[float]],
    n_iter: int = 3,
    vec_col: str = "embedding",
    cell_ids: list[int] | None = None,
) -> list[list[float]]:
    """Deterministic Lloyd iterations over sampled init centroids (the
    round-2 IVF used k-means INIT without iterations; refined centroids
    tighten cells and lift probe recall — measured in
    tests/test_ann_recall.py).

    Per iteration: assign via the literal-centroid argmin (``ivf_assign``,
    a narrow map), per-(cell, dim) mean via posexplode → groupBy (the
    scalable shape: one shuffle of (cell, dim) keys), collect the tiny
    K×dim result. Decimal accumulation keeps the means bit-deterministic
    at any parallelism. Empty cells keep their previous centroid."""
    cents = [[float(x) for x in c] for c in centroids]
    ids = list(cell_ids) if cell_ids is not None else list(range(len(cents)))
    for _ in range(max(0, n_iter)):
        asg = ivf_assign(df, cents, vec_col, "_cell", ids)
        rows = (
            asg.select("_cell", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("_cell", "dim")
            .agg(
                F.sum(F.col("x").cast("double").cast("decimal(38,12)"))
                .cast("double").alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        by_cell: dict = {}
        for r in rows:
            by_cell.setdefault(r["_cell"], {})[r["dim"]] = (r["s"], r["n"])
        cents = [
            [by_cell[i][d][0] / by_cell[i][d][1] for d in range(len(c))]
            if i in by_cell else c
            for i, c in zip(ids, cents)
        ]
    return cents


def cosine_pairs_threshold(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = "label",
    threshold: float = 0.95,
    round_to: int = 6,
    dim: int | None = None,
    n_bands: int = 8,
    band_bits: int = 2,
    max_bucket_rows: int | None = 10_000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs above threshold, blocked to avoid
    all-pairs.

    ``block_col`` given: equi-join within the block (caller-chosen key).
    ``block_col=None``: banded-LSH candidate generation (``lsh_band_pairs``)
    then exact cosine verification — never a constant block, never a cross
    join (the old ``F.lit(0)`` fallback was a full cartesian product).
    ``dim`` is required in LSH mode (hyperplanes are literal arrays)."""
    if block_col is not None:
        a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                      norm2(F.col(vec_col)).alias("na"),
                      F.col(block_col).alias("blk"))
        b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                      norm2(F.col(vec_col)).alias("nb"),
                      F.col(block_col).alias("blk"))
        pairs = a.join(b, ["blk"]).filter(F.col("id_a") < F.col("id_b"))
        cos = (dot(F.col("va"), F.col("vb"))
               / F.greatest(F.col("na") * F.col("nb"), F.lit(1e-12)))
        out = pairs.select(
            "id_a", "id_b",
            F.round(cos, round_to).alias("cos_sim"),
        )
        return out.filter(F.col("cos_sim") >= threshold)
    cand = lsh_band_pairs(df, vec_col, id_col, dim=dim,
                          n_bands=n_bands, band_bits=band_bits,
                          max_bucket_rows=max_bucket_rows)
    # per-vector norms in the pre-join projection (see knn_join): the
    # verify stage folds dot only, not 2 norm aggregates, per pair
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                  norm2(F.col(vec_col)).alias("na"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                  norm2(F.col(vec_col)).alias("nb"))
    joined = cand.join(a, "id_a").join(b, "id_b")
    cos = (dot(F.col("va"), F.col("vb"))
           / F.greatest(F.col("na") * F.col("nb"), F.lit(1e-12)))
    out = joined.select(
        "id_a", "id_b",
        F.round(cos, round_to).alias("cos_sim"),
    )
    return out.filter(F.col("cos_sim") >= threshold)
