"""Product quantization — encode / ADC / SDC kernels.

Faithful numpy re-expression of the reference's PQ machinery:

- subvector split + per-subspace nearest-centroid encode
  (`visual/datastructures/PQ.java:232-268`);
- byte packing with the -128 offset so 256 centroid ids fit a signed
  byte (`PQ.java:544-558`) — quirk replicated (codes stored int8);
- ADC: per-query lookup table [m][ks] of subvector->centroid squared
  distances, database scan is O(m) adds per code (`PQ.java:290-322`);
- SDC: symmetric code-to-code tables (`PQ.java:334-374`);
- per-subspace k-means learning with best-of-n repeats by SSE and the
  sentinel-1000 padding for empty clusters
  (`visual/quantization/ProductQuantizationLearning.java:46-308`).

All kernels operate on (n, d) float64 matrices, vectorized.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

SENTINEL = 1000.0  # reference pads missing k-means clusters with 1000s


@dataclass
class PQModel:
    centroids: np.ndarray  # (m, ks, d_sub)

    @property
    def m(self) -> int:
        return self.centroids.shape[0]

    @property
    def ks(self) -> int:
        return self.centroids.shape[1]

    @property
    def d_sub(self) -> int:
        return self.centroids.shape[2]


def _kmeanspp_init(sample: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """Seeded k-means++ seeding (D^2-weighted), vectorized.

    The reference's learner enables Weka's kmeans++ initialisation
    (`visual/quantization/AbstractQuantizerLearning.java:39-81`); plain
    random init gives measurably worse codebooks at equal iterations."""
    n = len(sample)
    k = min(k, n)
    chosen = np.empty(k, dtype=np.int64)
    chosen[0] = rng.integers(n)
    d2 = ((sample - sample[chosen[0]]) ** 2).sum(axis=1)
    for j in range(1, k):
        cum = np.cumsum(d2)
        tot = cum[-1]
        if tot <= 0:
            chosen[j] = rng.integers(n)
        else:
            # inverse-CDF draw (rng.choice(p=...) renormalizes per call —
            # measurably slower at ks=256 across 96 subspace fits);
            # clamp: a draw rounding up to exactly tot would index n
            chosen[j] = min(
                int(np.searchsorted(cum, rng.random() * tot, side="right")), n - 1
            )
        d2 = np.minimum(d2, ((sample - sample[chosen[j]]) ** 2).sum(axis=1))
    return sample[chosen].astype(np.float64)


def _kmeans(
    sample: np.ndarray,
    k: int,
    seed: int,
    iters: int = 25,
    pad_sentinel: bool = True,
    init: str = "kmeans++",
) -> "tuple[np.ndarray, float]":
    rng = np.random.default_rng(seed)
    n = len(sample)
    if init == "kmeans++":
        cent = _kmeanspp_init(sample, k, rng)
    else:
        cent = sample[rng.choice(n, min(k, n), replace=False)].astype(np.float64)
    assign = np.zeros(n, dtype=np.int64)
    kk = len(cent)
    prev = None
    for _ in range(iters):
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin drops the x term
        d = -2.0 * (sample @ cent.T) + (cent**2).sum(axis=1)[None, :]
        assign = d.argmin(axis=1)
        if prev is not None and np.array_equal(assign, prev):
            break  # converged (Lloyd fixed point)
        prev = assign
        # vectorized centroid update (empty clusters keep their previous
        # centroid); per-dim bincount beats np.add.at scatter by ~5x
        sums = np.stack(
            [
                np.bincount(assign, weights=sample[:, j], minlength=kk)
                for j in range(sample.shape[1])
            ],
            axis=1,
        )
        counts = np.bincount(assign, minlength=kk)
        nz = counts > 0
        cent[nz] = sums[nz] / counts[nz, None]
    sse = float(((sample - cent[assign]) ** 2).sum())
    if pad_sentinel and len(cent) < k:  # sentinel quirk (ProductQuantizationLearning)
        pad = np.full((k - len(cent), sample.shape[1]), SENTINEL)
        cent = np.vstack([cent, pad])
    return cent, sse


def _fit_subspace(
    sub: np.ndarray, ks: int, seed: int, j: int, repeats: int, iters: int
) -> np.ndarray:
    """Best-of-`repeats` kmeans for ONE subspace — the independent unit
    of PQ training (seeds are a pure function of (seed, j, r), so the
    result is identical whether subspaces run serially or in parallel)."""
    best = None
    for r in range(repeats):
        cent, sse = _kmeans(sub, ks, seed + 31 * j + 7 * r, iters)
        if best is None or sse < best[1]:
            best = (cent, sse)
    return best[0]


def fit_pq(
    sample: np.ndarray,
    m: int,
    ks: int = 256,
    seed: int = 1,
    repeats: int = 3,
    iters: int = 25,
    parallel: "bool | str" = "auto",
) -> PQModel:
    """Learn per-subspace codebooks; kmeans++ init and best-of-`repeats`
    by SSE per subspace (the reference's kmeans++ option +
    numKmeansRepeats, `visual/quantization/AbstractQuantizerLearning.java:39-81`,
    `ProductQuantizationLearning.java:46-308`).

    The m subspace fits are independent; ``parallel="auto"`` fans them
    out as Ray tasks when Ray is up and there are enough of them to pay
    the dispatch (cold ivfpq build: 4.6s -> sub-second at m=32).  Seeds
    are per-(subspace, repeat), so serial and parallel results are
    bit-identical."""
    sample = np.asarray(sample, dtype=np.float64)
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    d_sub = d // m
    subs = [sample[:, j * d_sub : (j + 1) * d_sub] for j in range(m)]
    if parallel == "auto":
        import ray

        parallel = m >= 4 and ray.is_initialized()
    if parallel:
        import ray

        fit_remote = ray.remote(num_cpus=1)(_fit_subspace)
        refs = [
            fit_remote.remote(subs[j], ks, seed, j, repeats, iters)
            for j in range(m)
        ]
        cents = np.stack(ray.get(refs))
    else:
        cents = np.stack(
            [_fit_subspace(subs[j], ks, seed, j, repeats, iters) for j in range(m)]
        )
    return PQModel(centroids=cents)


def pq_encode(mat: np.ndarray, model: PQModel) -> np.ndarray:
    """(n, d) -> (n, m) int8 codes (centroid id - 128, byte-offset quirk)."""
    mat = np.asarray(mat, dtype=np.float64)
    n = len(mat)
    codes = np.empty((n, model.m), dtype=np.int16)
    d_sub = model.d_sub
    for j in range(model.m):
        sub = mat[:, j * d_sub : (j + 1) * d_sub]
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin over c
        c = model.centroids[j]
        d = -2.0 * (sub @ c.T) + (c**2).sum(axis=1)[None, :]
        codes[:, j] = d.argmin(axis=1)
    if model.ks <= 256:
        return (codes - 128).astype(np.int8)  # PQ.java:552-558 offset
    return codes


def pq_code_ids(codes: np.ndarray, ks: int) -> np.ndarray:
    """Undo the byte offset -> centroid ids (n, m) int64."""
    ids = codes.astype(np.int64)
    if ks <= 256 and codes.dtype == np.int8:
        ids = ids + 128
    return ids


def pq_decode(codes: np.ndarray, model: PQModel) -> np.ndarray:
    ids = pq_code_ids(codes, model.ks)
    n = len(ids)
    out = np.empty((n, model.m * model.d_sub))
    for j in range(model.m):
        out[:, j * model.d_sub : (j + 1) * model.d_sub] = model.centroids[j][ids[:, j]]
    return out


def adc_table(query: np.ndarray, model: PQModel) -> np.ndarray:
    """(m, ks) squared distances from the query's subvectors to every
    centroid — computed once per query (PQ.java:290-322)."""
    q = np.asarray(query, dtype=np.float64)
    d_sub = model.d_sub
    table = np.empty((model.m, model.ks))
    for j in range(model.m):
        diff = model.centroids[j] - q[j * d_sub : (j + 1) * d_sub][None, :]
        table[j] = (diff**2).sum(axis=1)
    return table


def adc_distances(codes: np.ndarray, table: np.ndarray, ks: int) -> np.ndarray:
    """Approximate squared L2 per database code: O(m) table adds per row,
    vectorized as one fancy-index gather + sum."""
    ids = pq_code_ids(codes, ks)
    m = table.shape[0]
    return table[np.arange(m)[None, :], ids].sum(axis=1)


def adc_distances_multi(codes: np.ndarray, tables: np.ndarray, ks: int) -> np.ndarray:
    """ADC for a whole QUERY BATCH at once: ``tables`` is (nq, m, ks)
    (one per query), ``codes`` is (n, m); returns (nq, n) distances.
    One (nq, n) gather per subquantizer — no per-query rescans."""
    ids = pq_code_ids(codes, ks)  # (n, m)
    nq, m, _ = tables.shape
    out = np.zeros((nq, len(ids)), dtype=np.float64)
    for j in range(m):
        out += tables[:, j, ids[:, j]]
    return out


def sdc_tables(model: PQModel) -> np.ndarray:
    """(m, ks, ks) symmetric centroid-to-centroid squared distances
    (PQ.java:334-374)."""
    out = np.empty((model.m, model.ks, model.ks))
    for j in range(model.m):
        c = model.centroids[j]
        d = ((c[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        out[j] = d
    return out


def sdc_distances(codes_a: np.ndarray, codes_b: np.ndarray, tables: np.ndarray, ks: int) -> np.ndarray:
    """Approximate distance between two code matrices, row-wise."""
    ia = pq_code_ids(codes_a, ks)
    ib = pq_code_ids(codes_b, ks)
    m = tables.shape[0]
    return tables[np.arange(m)[None, :], ia, ib].sum(axis=1)
