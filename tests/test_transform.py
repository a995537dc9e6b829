"""String-dispatched vector transforms (no|rr|rp) + truncation."""

import numpy as np
import pyarrow as pa
import pytest


def _tbl(n=50, d=8, seed=2):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, d))
    return (
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in mat]),
            }
        ),
        mat,
    )


def test_transforms(ray_session):
    import ray.data as rd

    from multimedia_indexing_ray.functions.normalize import (
        random_permutation_indices,
        random_rotation_matrix,
    )
    from multimedia_indexing_ray.stages.transform import transform_vectors

    t, mat = _tbl()
    for kind in ("no", "rr", "rp"):
        out = transform_vectors(rd.from_arrow(t), "embedding", 8, kind).to_pandas()
        got = np.stack(out.sort_values("vec_id")["vec_t"].to_numpy())
        if kind == "no":
            exp = mat
        elif kind == "rr":
            exp = mat @ random_rotation_matrix(8, 1)
        else:
            exp = mat[:, random_permutation_indices(8, 1)]
        np.testing.assert_allclose(got, exp, rtol=1e-9)
        # norms preserved by rotation/permutation
        if kind != "no":
            np.testing.assert_allclose(
                np.linalg.norm(got, axis=1), np.linalg.norm(mat, axis=1), rtol=1e-9
            )


def test_transform_truncate(ray_session):
    import ray.data as rd

    from multimedia_indexing_ray.stages.transform import transform_vectors

    t, mat = _tbl()
    out = transform_vectors(rd.from_arrow(t), "embedding", 8, "rr", truncate_to=4).to_pandas()
    got = np.stack(out.sort_values("vec_id")["vec_t"].to_numpy())
    assert got.shape == (50, 4)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, rtol=1e-9)


def test_unknown_transform_rejected(ray_session):
    import ray.data as rd

    from multimedia_indexing_ray.stages.transform import transform_vectors

    t, _ = _tbl()
    with pytest.raises(ValueError):
        transform_vectors(rd.from_arrow(t), "embedding", 8, "zz")
