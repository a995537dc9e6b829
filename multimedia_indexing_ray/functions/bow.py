"""Bag-of-words aggregation over a codebook — hard and soft assignment.

Re-expression of the reference's BoW aggregator
(`visual/aggregation/BowAggregator.java:39-74`): histogram of
nearest-centroid counts per item.  The soft variant adds the k nearest
centroids per descriptor — and the reference's inner loop increments the
bin once per VECTOR COMPONENT (``descriptorLength`` times) instead of
once per descriptor (`BowAggregator.java:46-51`).  That over-counting
quirk is replicated behind ``reference_quirk=True`` (default) and
documented; ``reference_quirk=False`` gives the textbook histogram.
"""

from __future__ import annotations

import numpy as np


def assign_topk(descriptors: np.ndarray, centroids: np.ndarray, k: int) -> np.ndarray:
    """(n, d) x (c, d) -> (n, k) nearest-centroid ids (K5 analog —
    `visual/aggregation/AbstractFeatureAggregator.java:193-220`)."""
    x = np.asarray(descriptors, dtype=np.float64)
    c = np.asarray(centroids, dtype=np.float64)
    d = -2.0 * (x @ c.T) + (c**2).sum(axis=1)[None, :]
    if k == 1:
        return d.argmin(axis=1)[:, None]
    idx = np.argpartition(d, k - 1, axis=1)[:, :k]
    # order the k by distance (stable for ties via centroid id)
    rows = np.arange(len(x))[:, None]
    order = np.lexsort((idx, d[rows, idx]), axis=1)
    return idx[rows, order]


def bow_histogram(
    descriptors: np.ndarray,
    centroids: np.ndarray,
    k: int = 1,
    reference_quirk: bool = True,
) -> np.ndarray:
    """One histogram (len = num centroids) for one item's descriptor set.

    Empty set -> zero histogram (the zero-descriptor convention,
    `visual/aggregation/VladAggregator.java:37-39`)."""
    n_cent = len(centroids)
    if len(descriptors) == 0:
        return np.zeros(n_cent)
    nn = assign_topk(descriptors, centroids, k)
    weight = descriptors.shape[1] if (reference_quirk and k > 1) else 1
    hist = np.bincount(nn.reshape(-1), minlength=n_cent).astype(np.float64)
    return hist * weight if k > 1 else hist


def vlad_aggregate(descriptors: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """VLAD: sum of residuals d - c_k into the k-th block
    (`visual/aggregation/VladAggregator.java:35-70`; note VLAD uses
    descriptor-minus-centroid, unlike the IVFPQ residual convention)."""
    c = np.asarray(centroids, dtype=np.float64)
    n_cent, dim = c.shape
    out = np.zeros(n_cent * dim)
    if len(descriptors) == 0:
        return out  # zero vector for an empty set
    x = np.asarray(descriptors, dtype=np.float64)
    nn = assign_topk(x, c, 1)[:, 0]
    res = x - c[nn]
    np.add.at(out.reshape(n_cent, dim), nn, res)
    return out
