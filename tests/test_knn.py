"""Similarity search tests: brute-force exactness vs naive numpy; IVF
recall sanity."""

import numpy as np
import pyarrow as pa
import pytest


def _emb_table(n=200, d=16, seed=5):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, d))
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in mat]),
        }
    )
    return t, mat


def _naive_topk(mat, q_ids, q_mat, k):
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qu = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    out = {}
    for qid, q in zip(q_ids, qu):
        sims = unit @ q
        order = sorted(range(len(mat)), key=lambda i: (-sims[i], i))
        out[qid] = [i for i in order if i != qid][:k]
    return out


def test_brute_force_matches_naive(ray_session):
    import ray.data as rd

    from multimedia_indexing_ray.stages.knn import brute_force_knn

    t, mat = _emb_table()
    q_ids = np.array([0, 1, 2])
    res = brute_force_knn(
        rd.from_arrow(t).repartition(6), (q_ids, mat[q_ids]), "embedding", "vec_id", k=5
    ).to_pandas()
    expected = _naive_topk(mat, q_ids, mat[q_ids], 5)
    for qid in q_ids:
        got = (
            res[res["query_id"] == qid].sort_values("rank")["neighbor_id"].tolist()
        )
        assert got == expected[qid], f"query {qid}"


def test_ivf_recall_reasonable(ray_session):
    import ray.data as rd

    from multimedia_indexing_ray.stages.knn import ivf_knn

    t, mat = _emb_table(400, 16)
    q_ids = np.array([0, 1, 2, 3])
    res = ivf_knn(
        rd.from_arrow(t).repartition(4),
        (q_ids, mat[q_ids]),
        "embedding",
        "vec_id",
        k=5,
        n_lists=8,
        probe=4,
    ).to_pandas()
    expected = _naive_topk(mat, q_ids, mat[q_ids], 5)
    hits = total = 0
    for qid in q_ids:
        got = set(res[res["query_id"] == qid]["neighbor_id"].tolist())
        hits += len(got & set(expected[qid]))
        total += 5
    assert hits / total >= 0.5  # probing half the lists -> decent recall


def test_tied_scores_resolved_by_lowest_id(ray_session):
    """Planted duplicate embeddings straddle batch boundaries: the top-k
    must keep the LOWEST neighbor_ids among ties (batch-level partial
    top-k must apply the same tie rule as the global merge)."""
    import pyarrow as pa

    import ray.data as rd

    from multimedia_indexing_ray.stages.knn import brute_force_knn

    rng = np.random.default_rng(0)
    mat = rng.standard_normal((200, 8))
    q = mat[0]
    dup_ids = [13, 44, 91, 120, 160, 199]  # scattered across partitions
    for i in dup_ids:
        mat[i] = q  # cosine exactly 1.0 with the query
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(200), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in mat]),
        }
    )
    res = brute_force_knn(
        rd.from_arrow(t).repartition(8), (np.array([0]), mat[[0]]), "embedding", "vec_id", k=4
    ).to_pandas()
    assert res.sort_values("rank")["neighbor_id"].tolist() == sorted(dup_ids)[:4]


def test_topk_rows_nan_key_keeps_finite_candidates():
    """A NaN (corrupt vector) in the candidate block must not wipe the
    query's finite neighbors (review-found argpartition/thresh bug)."""
    import numpy as np

    from multimedia_indexing_ray.stages.knn import topk_rows

    key = np.array([[0.3, np.nan, 0.1, 0.2]])
    qi = np.array([7], dtype=np.int64)
    ids = np.array([10, 11, 12, 13], dtype=np.int64)
    out_q, out_n, out_s = topk_rows(qi, ids, key, k=3)
    assert list(out_n[0]) == [12, 13, 10]  # sorted by key, NaN excluded
    assert np.isfinite(out_s[0]).all()
