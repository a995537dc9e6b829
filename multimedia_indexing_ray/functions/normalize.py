"""Vector normalizations — faithful to the reference's conventions.

Replicated quirks (SURVEY.md §7.3 conformance set):

- L2: zero vector -> ALL-ONES, not unit norm
  (`visual/utilities/Normalization.java:21-37` sets every component to 1
  when the norm is 0 — quirk replicated verbatim).
- L1: zero vector -> 1/len each (`Normalization.java:47-62`).
- power: signed power sign(v)*|v|^a (`Normalization.java:74-79`).
- SSR: power(0.5) then L2 (`Normalization.java:89-93`).
- residual sign convention: centroid MINUS vector
  (`visual/datastructures/IVFPQ.java:642-648`).

All kernels operate on (n, d) float64 matrices (a batch of vectors) —
vectorized, no per-row loops.
"""

from __future__ import annotations

import numpy as np


def l2_normalize(mat: np.ndarray) -> np.ndarray:
    mat = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    zero = norms[:, 0] == 0.0
    out = np.divide(mat, norms, out=np.zeros_like(mat), where=norms != 0)
    out[zero] = 1.0  # reference quirk: zero vector -> all ones
    return out


def l1_normalize(mat: np.ndarray) -> np.ndarray:
    mat = np.asarray(mat, dtype=np.float64)
    norms = np.abs(mat).sum(axis=1, keepdims=True)
    zero = norms[:, 0] == 0.0
    out = np.divide(mat, norms, out=np.zeros_like(mat), where=norms != 0)
    out[zero] = 1.0 / mat.shape[1]  # reference quirk: zero vector -> 1/len
    return out


def power_normalize(mat: np.ndarray, a: float = 0.5) -> np.ndarray:
    mat = np.asarray(mat, dtype=np.float64)
    return np.sign(mat) * np.power(np.abs(mat), a)


def ssr_normalize(mat: np.ndarray) -> np.ndarray:
    return l2_normalize(power_normalize(mat, 0.5))


def residual(mat: np.ndarray, centroids: np.ndarray, assign: np.ndarray) -> np.ndarray:
    """centroid - vector (note the sign; `IVFPQ.java:645`)."""
    return centroids[assign] - np.asarray(mat, dtype=np.float64)


def truncate_renorm(mat: np.ndarray, k: int) -> np.ndarray:
    """Keep the first k components, re-L2 — the cheap dimensionality
    reduction (`visual/examples/IndexTransformation.java:113-122`)."""
    return l2_normalize(np.asarray(mat, dtype=np.float64)[:, :k])


def random_rotation_matrix(d: int, seed: int = 1) -> np.ndarray:
    """Seeded orthogonal rotation (QR of a seeded Gaussian) — transform
    analog of `visual/utilities/RandomRotation.java:30-49` (seed 1)."""
    rng = np.random.default_rng(seed)
    q, r = np.linalg.qr(rng.standard_normal((d, d)))
    return q * np.sign(np.diag(r))  # sign-fix for a deterministic rotation


def random_permutation_indices(d: int, seed: int = 1) -> np.ndarray:
    """Seeded component permutation (`visual/utilities/RandomPermutation.java:29-56`)."""
    return np.random.default_rng(seed).permutation(d)
