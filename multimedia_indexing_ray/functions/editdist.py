"""Banded Levenshtein over PAIR BATCHES — vectorized Ukkonen band DP.

Verifier kernel for edit-distance near-dup blocking
(`stages/dedup.py:anchor_editdist_pairs`): instead of one O(|a|*|b|)
Python DP per candidate pair, ALL pairs of a block advance together
through a diagonal band of half-width K (= max_dist).  Cells with
|i - j| > K can never lie on a path of cost <= K (each off-diagonal
step costs at least 1), so the DP state is a (n_pairs, 2K+1) int32
matrix and each text row costs a handful of vector ops — the same
bounded-state-over-unbounded-scan discipline as the reference's fixed-K
result heap (`visual/datastructures/Linear.java:138-163`).

The insertion recurrence D[i][j-1] + 1 is a left-to-right chain inside
a row; it is closed in ONE vector step via the prefix-min identity

    min_{e <= d} (C[e] + (d - e))  =  d + min-accumulate(C[e] - e)[d]

so there is no inner Python loop over the band either.

Semantics match DuckDB ``levenshtein``: unit-cost insert / delete /
substitute over UTF-8 BYTES — DuckDB's implementation is byte-level,
verified empirically (``levenshtein('🎉','x') = 4``, one byte-substitute
plus three byte-deletes), so the engine compares byte arrays, not
codepoints, to stay oracle-exact on non-ASCII text.  Distances above
``max_dist`` are reported as ``max_dist + 1`` — a sentinel the caller
filters, never emits.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

_A_PAD = np.uint16(0xFFFE)  # outside byte range so padding never "matches"
_B_PAD = np.uint16(0xFFFF)
_INF = np.int32(1 << 20)


def utf8_codes(text: str) -> np.ndarray:
    """UTF-8 byte array of ``text`` widened to uint16 (so the DP's pad
    sentinels sit outside the value range)."""
    return np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint16)


def banded_levenshtein_pairs(
    a_list: Sequence[np.ndarray],
    b_list: Sequence[np.ndarray],
    max_dist: int,
) -> np.ndarray:
    """Levenshtein distance per pair, capped at ``max_dist + 1``.

    Args:
        a_list / b_list: byte-code arrays (see :func:`utf8_codes`),
            pairwise aligned.
        max_dist: band half-width K; any true distance > K returns K+1.
    Returns:
        int64 array of len(a_list) distances in [0, max_dist + 1].
    """
    P = len(a_list)
    out = np.full(P, max_dist + 1, dtype=np.int64)
    if P == 0:
        return out
    K = int(max_dist)
    la = np.fromiter((len(a) for a in a_list), np.int64, P)
    lb = np.fromiter((len(b) for b in b_list), np.int64, P)
    act = np.flatnonzero(np.abs(la - lb) <= K)  # |len diff| > K => dist > K
    if act.size == 0:
        return out
    la_a, lb_a = la[act], lb[act]
    m = act.size
    maxla = int(la_a.max())
    maxlb = int(lb_a.max())
    band = 2 * K + 1
    A = np.full((m, max(maxla, 1)), _A_PAD, np.uint16)
    # Bp column (K + j) holds b[j]; the row-i char window is Bp[:, i-1 : i-1+band]
    Bp = np.full((m, max(maxla + band, K + maxlb) + 1), _B_PAD, np.uint16)
    for r, p in enumerate(act):
        a, b = a_list[p], b_list[p]
        if len(a):
            A[r, : len(a)] = a
        Bp[r, K : K + len(b)] = b

    dgrid = np.arange(band, dtype=np.int32)
    res = np.full(m, max_dist + 1, dtype=np.int64)
    # row i=0: D[0, j] = j for 0 <= j <= lb (band index d <-> j = d - K)
    j0 = (dgrid - K).astype(np.int64)
    cur = np.where(
        (j0[None, :] >= 0) & (j0[None, :] <= lb_a[:, None]), j0[None, :], _INF
    ).astype(np.int32)
    rows0 = np.flatnonzero(la_a == 0)
    if rows0.size:
        res[rows0] = cur[rows0, lb_a[rows0] + K]
    for i in range(1, maxla + 1):
        j = i + j0  # j = i - K + d
        achar = A[:, i - 1][:, None]
        bchars = Bp[:, i - 1 : i - 1 + band]
        sub = cur + (achar != bchars)
        dele = np.concatenate([cur[:, 1:], np.full((m, 1), _INF, np.int32)], axis=1) + 1
        C = np.minimum(sub, dele)
        invalid = (j[None, :] < 0) | (j[None, :] > lb_a[:, None])
        C[invalid] = _INF
        acc = np.minimum.accumulate(C - dgrid, axis=1)
        cur = np.minimum(C, acc + dgrid)
        cur[invalid] = _INF
        hit = np.flatnonzero(la_a == i)
        if hit.size:
            res[hit] = cur[hit, (lb_a[hit] - i + K).astype(np.int64)]
    out[act] = np.minimum(res, max_dist + 1)
    return out
