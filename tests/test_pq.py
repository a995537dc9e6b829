"""Product quantization: encode/decode error, byte-offset quirk, ADC/SDC
approximation quality, PQ/IVFPQ top-k recall."""

import numpy as np
import pyarrow as pa
import pytest

from multimedia_indexing_ray.functions import pq as pqf


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(9)
    return rng.standard_normal((1500, 16))


@pytest.fixture(scope="module")
def model(data):
    return pqf.fit_pq(data[:1000], m=4, ks=16, seed=1)


def test_encode_byte_offset_quirk(data, model):
    codes = pqf.pq_encode(data[:100], model)
    assert codes.dtype == np.int8  # PQ.java byte packing
    ids = pqf.pq_code_ids(codes, model.ks)
    assert ids.min() >= 0 and ids.max() < model.ks
    # offset round-trips: code -128 <-> id 0
    assert np.all(ids == codes.astype(np.int64) + 128)


def test_decode_reduces_error_with_more_centroids(data):
    small = pqf.fit_pq(data[:1000], m=4, ks=4, seed=1)
    big = pqf.fit_pq(data[:1000], m=4, ks=64, seed=1)
    x = data[1000:]
    err_small = ((pqf.pq_decode(pqf.pq_encode(x, small), small) - x) ** 2).mean()
    err_big = ((pqf.pq_decode(pqf.pq_encode(x, big), big) - x) ** 2).mean()
    assert err_big < err_small


def test_adc_approximates_true_distance(data, model):
    q = data[1200]
    db = data[:200]
    codes = pqf.pq_encode(db, model)
    approx = pqf.adc_distances(codes, pqf.adc_table(q, model), model.ks)
    # ADC distance equals the exact distance to the DECODED vectors
    dec = pqf.pq_decode(codes, model)
    true_dec = ((dec - q) ** 2).sum(axis=1)
    np.testing.assert_allclose(approx, true_dec, rtol=1e-9)
    # and correlates strongly with the raw distances
    raw = ((db - q) ** 2).sum(axis=1)
    assert np.corrcoef(approx, raw)[0, 1] > 0.6  # ks=16 on 16-dim is coarse


def test_sdc_symmetric_and_consistent(data, model):
    tables = pqf.sdc_tables(model)
    a = pqf.pq_encode(data[:50], model)
    b = pqf.pq_encode(data[50:100], model)
    dab = pqf.sdc_distances(a, b, tables, model.ks)
    dba = pqf.sdc_distances(b, a, tables, model.ks)
    np.testing.assert_allclose(dab, dba)
    assert np.all(pqf.sdc_distances(a, a, tables, model.ks) == 0.0)


def test_sentinel_padding_quirk():
    # 10 identical points cannot form 16 clusters -> sentinel-1000 pads
    pts = np.zeros((10, 4))
    cent, _ = pqf._kmeans(pts, 16, seed=1)
    assert (cent == pqf.SENTINEL).all(axis=1).sum() >= 6


def _emb_table(n, d, seed=5):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, d))
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in mat]),
        }
    )
    return t, mat


def _true_l2_topk(mat, q_ids, k):
    out = {}
    for qid in q_ids:
        d = ((mat - mat[qid]) ** 2).sum(axis=1)
        order = sorted(range(len(mat)), key=lambda i: (d[i], i))
        out[qid] = [i for i in order if i != qid][:k]
    return out


def test_pq_knn_recall(ray_session):
    import ray.data as rd

    from multimedia_indexing_ray.stages.knn import pq_knn

    t, mat = _emb_table(400, 16)
    q_ids = np.array([0, 1, 2])
    res = pq_knn(
        rd.from_arrow(t).repartition(4), (q_ids, mat[q_ids]), "embedding", "vec_id",
        k=5, m=4, ks=64, sample_size=400,
    ).to_pandas()
    truth = _true_l2_topk(mat, q_ids, 5)
    hits = sum(
        len(set(res[res["query_id"] == q]["neighbor_id"]) & set(truth[q])) for q in q_ids
    )
    assert hits / (5 * len(q_ids)) >= 0.4  # coarse codes, decent recall


def test_ivfpq_knn_runs_and_recalls(ray_session):
    import ray.data as rd

    from multimedia_indexing_ray.stages.knn import ivfpq_knn

    t, mat = _emb_table(600, 16)
    q_ids = np.array([0, 1, 2, 3])
    res = ivfpq_knn(
        rd.from_arrow(t).repartition(4), (q_ids, mat[q_ids]), "embedding", "vec_id",
        k=5, n_lists=8, probe=4, m=4, ks=64, sample_size=600,
    ).to_pandas()
    truth = _true_l2_topk(mat, q_ids, 5)
    hits = sum(
        len(set(res[res["query_id"] == q]["neighbor_id"]) & set(truth[q])) for q in q_ids
    )
    assert hits / (5 * len(q_ids)) >= 0.3  # probe half the lists + PQ codes
