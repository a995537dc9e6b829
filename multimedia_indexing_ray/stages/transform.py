"""String-dispatched vector transforms — the IndexTransformation analog.

The reference re-indexes stored vectors under a named transform
(`no|rr|rp`) with optional truncation
(`visual/examples/IndexTransformation.java:61-125,86-94`).  Same surface
here: a transform name selects a seeded deterministic matrix/permutation
(built once, shipped via the task closure) applied vectorized per batch.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data

from multimedia_indexing_ray.functions.normalize import (
    l2_normalize,
    random_permutation_indices,
    random_rotation_matrix,
    truncate_renorm,
)
from multimedia_indexing_ray.stages.knn import _batch_matrix

TRANSFORMS = ("no", "rr", "rp")  # none | random rotation | random permutation


def transform_vectors(
    ds: "ray.data.Dataset",
    vec_col: str,
    dim: int,
    transform: str = "no",
    truncate_to: Optional[int] = None,
    seed: int = 1,
    out_col: str = "vec_t",
) -> "ray.data.Dataset":
    """Apply a named transform (and optional truncate+renorm, M15) to an
    embedding column; output is a FixedSizeList column `out_col`."""
    if transform not in TRANSFORMS:
        raise ValueError(f"unknown transform {transform!r}; one of {TRANSFORMS}")
    rot = random_rotation_matrix(dim, seed) if transform == "rr" else None
    perm = random_permutation_indices(dim, seed) if transform == "rp" else None

    def _fn(batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, vec_col)
        if rot is not None:
            mat = mat @ rot
        elif perm is not None:
            mat = mat[:, perm]
        if truncate_to is not None:
            mat = truncate_renorm(mat, truncate_to)
        k = mat.shape[1]
        col = pa.FixedSizeListArray.from_arrays(pa.array(mat.reshape(-1), pa.float64()), k)
        return batch.append_column(out_col, col)

    return ds.map_batches(_fn, batch_format="pyarrow")
