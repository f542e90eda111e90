"""ANN recall gates (round-2 VERDICT missing #3): the approximate paths
are only trustworthy at scale if their recall against brute force is
measured and pinned. Floors are measured on the deterministic sf0.01
embeddings fixture (64-dim, 500 vectors, 10 labels) and asserted with
margin; a regression in banding/centroid logic trips them.
"""

import os

import numpy as np
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pdf = df.select("vec_id", "embedding").toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    order = np.argsort(ids)
    return df, ids[order], mat[order]


def _brute_topk(ids, mat, qi, k):
    q = mat[qi]
    sims = (mat @ q) / np.maximum(
        np.linalg.norm(mat, axis=1) * np.linalg.norm(q), 1e-12)
    sims[qi] = -np.inf  # exclude self
    # tie-break on ascending id to mirror the engine's (cos DESC, id ASC)
    order = np.lexsort((ids, -sims))
    return set(ids[order[:k]])


def test_ivf_lloyd_refinement_recall_at_10(spark, emb):
    """recall@10 of the IVF probe (K=8 cells, nprobe=3) vs brute force.
    Measured on this fixture over 20 spread probes: sampled-init (the
    round-2 state) 0.535; after 3 deterministic Lloyd iterations 0.605
    (nprobe=2: 0.480 vs 0.480; nprobe=4: 0.755 vs 0.715). Gates: refined
    must beat init at nprobe=3, and its absolute recall must stay >= 0.55
    (floor with margin under 0.605)."""
    from ore_etl_spark.functions.similarity import ivf_ann, kmeans_refine

    df, ids, mat = emb
    init = [mat[i].tolist() for i in range(1, 9)]  # sampled init (round-2)
    refined = kmeans_refine(df, init, n_iter=3)
    assert len(refined) == 8 and len(refined[0]) == 64
    # refinement must actually move sampled centroids
    assert any(abs(a - b) > 1e-9 for c0, c1 in zip(init, refined)
               for a, b in zip(c0, c1))

    probes = [int(ids[i]) for i in range(0, 200, 10)]  # 20 spread probes
    id_to_row = {int(v): i for i, v in enumerate(ids)}

    def avg_recall(cents):
        recalls = []
        for pid in probes:
            qi = id_to_row[pid]
            true = _brute_topk(ids, mat, qi, 10)
            got = {
                r["vec_id"]
                for r in ivf_ann(df.filter(f"vec_id != {pid}"),
                                 mat[qi].tolist(), cents,
                                 k=10, nprobe=3).collect()
            }
            recalls.append(len(got & true) / 10.0)
        return float(np.mean(recalls))

    r_init, r_ref = avg_recall(init), avg_recall(refined)
    assert r_ref >= r_init, f"Lloyd refinement hurt recall: {r_ref} < {r_init}"
    assert r_ref >= 0.55, f"IVF recall@10 regressed: {r_ref:.3f} < 0.55 floor"


def test_knn_join_recall_at_3(spark, emb):
    """Average recall@3 of the banded-LSH knn_join vs brute force over
    every row. With 4 bands x 2 bits the fixture measures >= 0.8; floor
    pinned at 0.7 with margin. (The oracle-gated sim_knn_join uses
    2 bands x 2 bits — exactness there is vs the same-algorithm SQL
    oracle; THIS test is the approximation-quality gate.)"""
    from ore_etl_spark.functions.similarity import knn_join

    df, ids, mat = emb
    got = knn_join(df, k=3, dim=64, n_bands=4, band_bits=2).collect()
    by_id: dict = {}
    for r in got:
        by_id.setdefault(r["id"], set()).add(r["nbr"])
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    recalls = []
    for pid, qi in id_to_row.items():
        true = _brute_topk(ids, mat, qi, 3)
        recalls.append(len(by_id.get(pid, set()) & true) / 3.0)
    avg = float(np.mean(recalls))
    assert avg >= 0.7, f"knn_join recall@3 regressed: {avg:.3f} < 0.7 floor"


def test_knn_join_autosized_recall_recovered_by_bands(spark, emb):
    """The scale knob (target_bucket_rows) bounds candidate cost at
    ~n_bands x target per row by shrinking buckets — which costs recall
    at fixed n_bands (measured on this fixture at target=32: 0.413 with
    4 bands). The production rule is to recover recall with MORE BANDS
    (linear cost), never bigger buckets (quadratic): measured 8 bands
    0.677, 12 bands 0.837. Gates: the 12-band auto-sized config must
    beat the 4-band one and hold an absolute 0.75 floor (margin under
    0.837)."""
    from ore_etl_spark.functions.similarity import knn_join

    df, ids, mat = emb
    id_to_row = {int(v): i for i, v in enumerate(ids)}

    def avg_recall(n_bands):
        got = knn_join(df, k=3, dim=64, n_bands=n_bands, band_bits=2,
                       target_bucket_rows=32, approx_n=500).collect()
        by_id: dict = {}
        for r in got:
            by_id.setdefault(r["id"], set()).add(r["nbr"])
        return float(np.mean([
            len(by_id.get(pid, set()) & _brute_topk(ids, mat, qi, 3)) / 3.0
            for pid, qi in id_to_row.items()
        ]))

    r4, r12 = avg_recall(4), avg_recall(12)
    assert r12 > r4, f"bands lever broken: {r12:.3f} <= {r4:.3f}"
    assert r12 >= 0.75, f"auto-sized 12-band recall@3: {r12:.3f} < 0.75"
