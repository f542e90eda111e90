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
- ``cosine_pairs_threshold``: embedding-cosine near-dup over candidate
  pairs (used with LSH blocking for dedup).

Hyperplanes are derived from md5 of (dim, plane) — deterministic, no numpy
state on executors, reproducible in an external oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


def cosine_topk_brute(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), round_to).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _hyperplane_sign(vec: Column, plane: int, dim: int) -> Column:
    """Sign of <vec, h_plane> where h_plane[d] = md5-derived value in [-1,1)."""
    comps = [
        F.element_at(vec, d + 1).cast("double")
        * (
            (F.conv(F.substring(F.md5(F.lit(f"hp{plane}d{d}")), 1, 8), 16, 10)
             .cast("double") / F.lit(2147483648.0)) - F.lit(1.0)
        )
        for d in range(dim)
    ]
    s = comps[0]
    for c in comps[1:]:
        s = s + c
    return F.when(s >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_signature(vec_col: Column, n_planes: int, dim: int) -> Column:
    """Concatenated sign bits as a string bucket key."""
    return F.concat_ws(
        "", *[_hyperplane_sign(vec_col, p, dim).cast("string") for p in range(n_planes)]
    )


def lsh_bucket_ann(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_planes: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """ANN: probe only vectors whose LSH bucket matches the query's.

    At scale the signature is precomputed/bucketed at write time; the probe
    is a partition-pruned scan of one bucket + exact re-rank.
    """
    dim = len(query_vec)
    import hashlib

    def py_sign(plane: int) -> int:
        s = 0.0
        for d, x in enumerate(query_vec):
            h = int(hashlib.md5(f"hp{plane}d{d}".encode()).hexdigest()[:8], 16)
            s += float(x) * (h / 2147483648.0 - 1.0)
        return 1 if s >= 0 else 0

    q_sig = "".join(str(py_sign(p)) for p in range(n_planes))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sigged = df.withColumn("sig", lsh_signature(F.col(vec_col), n_planes, dim))
    return (
        sigged.filter(F.col("sig") == q_sig)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), round_to).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def cosine_pairs_threshold(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = "label",
    threshold: float = 0.95,
    round_to: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup pairs above threshold, blocked to avoid
    all-pairs (block on `block_col`, or LSH signature when None)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                  F.col(block_col).alias("blk") if block_col else F.lit(0).alias("blk"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                  F.col(block_col).alias("blk") if block_col else F.lit(0).alias("blk"))
    pairs = a.join(b, ["blk"]).filter(F.col("id_a") < F.col("id_b"))
    out = pairs.select(
        "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), round_to).alias("cos_sim")
    )
    return out.filter(F.col("cos_sim") >= threshold)
