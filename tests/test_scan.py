"""Distributed ordered prefix sum (stages/scan.py): correctness under
arbitrary block layout, sparse/negative-free keys, exclusive/inclusive
modes, and hash-partition groups holding multiple key ranges."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from multimedia_indexing_ray.stages.scan import ordered_prefix_sum


def _run(keys, vals, num_ranges=4, exclusive=True, blocks=3):
    t = pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(blocks)
    out = ordered_prefix_sum(ds, "k", "v", out_col="ps", num_ranges=num_ranges, exclusive=exclusive)
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    return df


def _oracle(keys, vals, exclusive):
    order = np.argsort(keys)
    cum = np.cumsum(np.asarray(vals, np.int64)[order])
    res = cum - np.asarray(vals, np.int64)[order] if exclusive else cum
    return np.asarray(keys)[order], res


def test_prefix_sum_hand_checked(ray_session):
    df = _run([3, 1, 2, 0], [10, 20, 30, 40])
    assert df["k"].tolist() == [0, 1, 2, 3]
    assert df["ps"].tolist() == [0, 40, 60, 90]


def test_prefix_sum_inclusive(ray_session):
    df = _run([3, 1, 2, 0], [10, 20, 30, 40], exclusive=False)
    assert df["ps"].tolist() == [40, 60, 90, 100]


@pytest.mark.parametrize("num_ranges", [1, 2, 7])
@pytest.mark.parametrize("blocks", [1, 5])
def test_prefix_sum_random_permutation_invariant(ray_session, num_ranges, blocks):
    """Any key distribution (sparse, shuffled) and any block layout give
    the sorted-oracle prefix; more ranges than distinct keys is fine."""
    rng = np.random.default_rng(7)
    keys = rng.permutation(np.array([0, 5, 9, 100, 101, 7000, 7001, 7002], np.int64))
    vals = rng.integers(0, 50, len(keys)).astype(np.int64)
    df = _run(keys.tolist(), vals.tolist(), num_ranges=num_ranges, blocks=blocks)
    ok, oref = _oracle(keys, vals, True)
    assert df["k"].tolist() == ok.tolist()
    assert df["ps"].tolist() == oref.tolist()


def test_batch_matrix_uniform_list_fast_path():
    from multimedia_indexing_ray.stages.knn import _batch_matrix

    mats = np.arange(12, dtype=np.float32).reshape(4, 3)
    t_var = pa.table({"v": pa.array([list(r) for r in mats], pa.list_(pa.float32()))})
    t_fix = pa.table({"v": pa.array([list(r) for r in mats], pa.list_(pa.float32(), 3))})
    np.testing.assert_array_equal(_batch_matrix(t_var, "v"), mats.astype(np.float64))
    np.testing.assert_array_equal(_batch_matrix(t_fix, "v"), mats.astype(np.float64))
    # ragged lists still take the fallback
    t_rag = pa.table({"v": pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32()))})
    with pytest.raises(ValueError):
        _batch_matrix(t_rag, "v")
