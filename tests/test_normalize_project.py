"""Normalization quirk parity + projection stage tests."""

import numpy as np

from multimedia_indexing_ray.functions import normalize as nz


def test_l2_zero_vector_quirk():
    m = np.array([[3.0, 4.0], [0.0, 0.0]])
    out = nz.l2_normalize(m)
    np.testing.assert_allclose(out[0], [0.6, 0.8])
    np.testing.assert_allclose(out[1], [1.0, 1.0])  # zero -> ALL ONES (quirk)


def test_l1_zero_vector_quirk():
    m = np.array([[2.0, -2.0], [0.0, 0.0, ]])
    out = nz.l1_normalize(m)
    np.testing.assert_allclose(out[0], [0.5, -0.5])
    np.testing.assert_allclose(out[1], [0.5, 0.5])  # zero -> 1/len


def test_power_signed():
    m = np.array([[4.0, -9.0, 0.0]])
    np.testing.assert_allclose(nz.power_normalize(m), [[2.0, -3.0, 0.0]])


def test_ssr():
    m = np.array([[4.0, 0.0]])
    np.testing.assert_allclose(nz.ssr_normalize(m), [[1.0, 0.0]])


def test_residual_sign():
    cent = np.array([[1.0, 1.0]])
    v = np.array([[0.25, 0.5]])
    np.testing.assert_allclose(
        nz.residual(v, cent, np.array([0])), [[0.75, 0.5]]
    )  # centroid - vector


def test_rotation_orthogonal_deterministic():
    r1 = nz.random_rotation_matrix(16, seed=1)
    r2 = nz.random_rotation_matrix(16, seed=1)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_allclose(r1 @ r1.T, np.eye(16), atol=1e-10)


def test_truncate_renorm():
    m = np.array([[3.0, 4.0, 100.0]])
    np.testing.assert_allclose(nz.truncate_renorm(m, 2), [[0.6, 0.8]])


def test_projection_roundtrip(ray_session):
    """PCA on low-rank data recovers the plane; whitened output is L2=1."""
    import pandas as pd

    import ray.data as rd

    from multimedia_indexing_ray.stages.project import fit_projection, project_features

    rng = np.random.default_rng(0)
    latent = rng.standard_normal((2000, 2))
    mix = rng.standard_normal((2, 6))
    x = latent @ mix + 5.0
    df = pd.DataFrame(x, columns=[f"f{i}" for i in range(6)])
    ds = rd.from_pandas(df).repartition(4)
    model = fit_projection(ds, df.columns, k=2, whiten=True, sample_size=2000, seed=1)
    out = project_features(ds, model, df.columns, concurrency=2).to_pandas()
    mats = np.stack(out["features_proj"].to_numpy())
    assert mats.shape == (2000, 2)
    np.testing.assert_allclose(np.linalg.norm(mats, axis=1), 1.0, rtol=1e-9)
    # unwhitened projection preserves >99% of variance in 2 dims
    model2 = fit_projection(ds, df.columns, k=2, whiten=False, sample_size=2000, seed=1)
    proj = model2.project(x)
    assert proj.var(axis=0).sum() / x.var(axis=0).sum() > 0.99


def test_fit_projection_distributed_exact(ray_session):
    """Distributed covariance PCA == direct numpy eigendecomposition on
    the same data (exact, not sampled), across multiple blocks."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from multimedia_indexing_ray.stages.project import fit_projection_distributed

    rng = np.random.default_rng(3)
    x = rng.normal(size=(500, 6)) @ np.diag([5, 3, 2, 1, 0.5, 0.1])
    ds = rd.from_pandas(pd.DataFrame(x, columns=list("abcdef"))).repartition(7)
    m = fit_projection_distributed(ds, list("abcdef"), k=3)

    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False)
    eig, vec = np.linalg.eigh(cov)
    order = np.argsort(eig)[::-1][:3]
    np.testing.assert_allclose(m.mean, mean, rtol=1e-9)
    np.testing.assert_allclose(m.eigenvalues, eig[order], rtol=1e-9)
    # compare subspaces via projection magnitudes (sign-fixed rows)
    comp = vec[:, order].T
    flip = np.sign(comp[np.arange(3), np.abs(comp).argmax(axis=1)])
    comp = comp * flip[:, None]
    np.testing.assert_allclose(m.components, comp, rtol=1e-7, atol=1e-9)


def test_fit_projection_distributed_large_offsets(ray_session):
    """Two-pass centered covariance survives the catastrophic-cancellation
    regime (column means ~1e9, spread ~1) that the one-pass
    sum_xxT - n*mean*meanT form cannot."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from multimedia_indexing_ray.stages.project import fit_projection_distributed

    rng = np.random.default_rng(5)
    x = rng.normal(size=(400, 4)) + np.array([1e9, 1e9, 5e8, 0.0])
    ds = rd.from_pandas(pd.DataFrame(x, columns=list("abcd"))).repartition(5)
    m = fit_projection_distributed(ds, list("abcd"), k=2)
    eig = np.sort(np.linalg.eigvalsh(np.cov(x, rowvar=False)))[::-1][:2]
    np.testing.assert_allclose(m.eigenvalues, eig, rtol=1e-9)
