"""Learned projection stage — the PCA(+whitening) analog.

The reference learns a PCA basis offline on a sample, persists
(means, eigenvalues, eigenvectors), pre-folds lambda^-0.5 whitening into
the projection matrix at load, and L2-normalizes whitened outputs
(`visual/dimreduction/PCA.java:120-208,275-313`).  Here:

- ``fit_projection``: driver-side numpy SVD on a sampled Dataset (the
  reference samples 10-50k vectors too — K8/K9, SURVEY.md §2.6).
- ``Projector``: an ACTOR-POOL map_batches class — the matrix is loaded
  once per actor in __init__ (ST3 singleton analog), applied vectorized
  per batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

import ray
import ray.data

from multimedia_indexing_ray.functions.normalize import l2_normalize


@dataclass
class ProjectionModel:
    mean: np.ndarray  # (d,)
    eigenvalues: np.ndarray  # (k,) descending
    components: np.ndarray  # (k, d) rows = top eigenvectors
    whiten: bool = False

    @property
    def matrix(self) -> np.ndarray:
        """Projection matrix with whitening pre-folded (PCA.java:275-313)."""
        if self.whiten:
            scale = 1.0 / np.sqrt(np.maximum(self.eigenvalues, 1e-12))
            return self.components * scale[:, None]
        return self.components

    def project(self, mat: np.ndarray) -> np.ndarray:
        out = (np.asarray(mat, dtype=np.float64) - self.mean) @ self.matrix.T
        if self.whiten:
            out = l2_normalize(out)  # reference L2-normalizes whitened output
        return out


def _sample_matrix(ds: "ray.data.Dataset", columns: Sequence[str], n: int, seed: int) -> np.ndarray:
    total = ds.count()
    frac = min(1.0, (n * 1.1 + 100) / max(total, 1))
    sample = ds.select_columns(list(columns)).random_sample(frac, seed=seed)
    df = sample.to_pandas()
    return df[list(columns)].to_numpy(dtype=np.float64)[:n]


def fit_projection(
    ds: "ray.data.Dataset",
    columns: Sequence[str],
    k: int,
    whiten: bool = False,
    sample_size: int = 50_000,
    seed: int = 1,
) -> ProjectionModel:
    """SVD on a seeded sample (no U, singular values sorted descending —
    PCA.java:120-177; default sample size mirrors the reference's 50k)."""
    x = _sample_matrix(ds, columns, sample_size, seed)
    mean = x.mean(axis=0)
    xc = x - mean
    _, s, vt = np.linalg.svd(xc, full_matrices=False)
    eig = (s**2) / max(len(x) - 1, 1)
    return ProjectionModel(mean=mean, eigenvalues=eig[:k], components=vt[:k], whiten=whiten)


def fit_projection_distributed(
    ds: "ray.data.Dataset",
    columns: Sequence[str],
    k: int,
    whiten: bool = False,
) -> ProjectionModel:
    """EXACT full-dataset PCA — the 100-TB path, two passes:

    1. mean: each batch emits one (n, sum_x) row; driver reduces.
    2. centered covariance: each batch emits sum((x-mean)^T (x-mean))
       against the broadcast mean — NOT the one-pass
       (sum_xxT - n*mean*mean^T) form, which catastrophically cancels
       for columns with large offset relative to spread.

    Only one small partial row per block reaches the driver.  Eigenvector
    sign is fixed so the largest-|component| entry is positive
    (deterministic across LAPACK builds)."""
    import ray as _ray

    cols = list(columns)
    d = len(cols)
    slim = ds.select_columns(cols)

    def _mean_partial(batch: pa.Table) -> pa.Table:
        mat = np.column_stack(
            [batch[c].to_numpy(zero_copy_only=False) for c in cols]
        ).astype(np.float64)
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "sum_x": pa.array([mat.sum(axis=0).tolist()]),
            }
        )

    mparts = slim.map_batches(_mean_partial, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in mparts)
    mean = np.sum([np.asarray(p["sum_x"]) for p in mparts], axis=0) / n
    mean_ref = _ray.put(mean)

    def _cov_partial(batch: pa.Table) -> pa.Table:
        m = _ray.get(mean_ref)
        mat = np.column_stack(
            [batch[c].to_numpy(zero_copy_only=False) for c in cols]
        ).astype(np.float64)
        xc = mat - m
        return pa.table({"sum_cc": pa.array([(xc.T @ xc).reshape(-1).tolist()])})

    cparts = slim.map_batches(_cov_partial, batch_format="pyarrow").take_all()
    cov = np.sum([np.asarray(p["sum_cc"]).reshape(d, d) for p in cparts], axis=0) / max(
        n - 1, 1
    )
    eig, vec = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eig)[::-1][:k]
    eig = eig[order]
    comp = vec[:, order].T  # (k, d)
    flip = np.sign(comp[np.arange(len(comp)), np.abs(comp).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comp = comp * flip[:, None]
    return ProjectionModel(mean=mean, eigenvalues=eig, components=comp, whiten=whiten)


class Projector:
    """Actor-pool stage: project feature columns to `features_proj`.

    Model shipped via object store ref; fetched once per actor."""

    def __init__(self, model_ref, columns: Sequence[str]):
        self.model: ProjectionModel = ray.get(model_ref)
        self.columns = list(columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = np.column_stack(
            [batch[c].to_numpy(zero_copy_only=False) for c in self.columns]
        )
        out = self.model.project(mat)
        k = out.shape[1]
        col = pa.FixedSizeListArray.from_arrays(pa.array(out.reshape(-1), pa.float64()), k)
        keep = [c for c in batch.column_names if c not in self.columns]
        return batch.select(keep).append_column("features_proj", col)


def project_features(
    ds: "ray.data.Dataset",
    model: ProjectionModel,
    columns: Sequence[str],
    concurrency: int = 4,
) -> "ray.data.Dataset":
    ref = ray.put(model)
    return ds.map_batches(
        Projector,
        batch_format="pyarrow",
        # autoscaling (1, n): a fixed pool the size of the cluster can pin
        # every CPU on idle actors and starve upstream read tasks
        concurrency=(1, concurrency),
        fn_constructor_args=(ref, list(columns)),
    )
