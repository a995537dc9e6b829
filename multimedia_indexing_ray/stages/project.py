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
        concurrency=concurrency,
        fn_constructor_args=(ref, list(columns)),
    )
