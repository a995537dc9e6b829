"""The windowed feature kernel — VLAD-aggregation analog.

Computes every spec'd window/session/lag feature for one sorted partition
batch in O(n log n) numpy, no per-conversation Python loops.  The
reference accumulates residuals per centroid one descriptor at a time
(`visual/aggregation/VladAggregator.java:35-70`); here window blocks are
prefix-sum differences over a single monotone adjusted-time axis and the
block concatenation yields the fixed-dimension vector per (conv_id, ts)
(multi-vocabulary concat analog,
`visual/aggregation/VladAggregatorMultipleVocabularies.java:58-75`).
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np

from multimedia_indexing_ray.functions import segments as sg
from multimedia_indexing_ray.specs import TUMBLING_ORIGIN_US, FeatureSpecs

_US = 1_000_000


def _cond_mask(condition, feats: dict, n: int) -> np.ndarray:
    if condition is None:
        return np.ones(n, dtype=np.float64)
    kind, value = condition
    if kind == "role":
        return feats[f"is_{value}" if value != "tool" else "is_tool_role"]
    if kind == "tool_notnull":
        return feats["has_tool"]
    raise ValueError(f"unknown condition {condition!r}")


def _window_block(mask: np.ndarray, feats: dict) -> np.ndarray:
    """(n, 3) matrix [cond, cond*text_len, cond*n_tokens] for one spec."""
    return np.stack([mask, mask * feats["text_len"], mask * feats["n_tokens"]], axis=1)


def _emit_aggs(sums: np.ndarray, out: "OrderedDict[str, np.ndarray]", name: str) -> None:
    count = sums[:, 0]
    sum_tl = sums[:, 1]
    sum_tok = sums[:, 2]
    with np.errstate(invalid="ignore", divide="ignore"):
        mean_tl = np.where(count > 0, sum_tl / count, 0.0)
    out[f"{name}_count"] = count
    out[f"{name}_sum_text_len"] = sum_tl
    out[f"{name}_mean_text_len"] = mean_tl
    out[f"{name}_sum_n_tokens"] = sum_tok


def compute_window_features(
    codes: np.ndarray,
    ts_us: np.ndarray,
    feats: dict,
    specs: FeatureSpecs,
) -> "OrderedDict[str, np.ndarray]":
    """All spec'd features for one sorted partition.

    Args:
        codes: int conversation codes, nondecreasing (sorted batch).
        ts_us: int64 timestamps, nondecreasing within each conversation.
        feats: base per-turn features (text_len, n_tokens, one-hots,
            has_tool) as float64 arrays; gap_s is added here.
    Returns:
        OrderedDict of float64 columns in specs.feature_columns() order,
        followed by lead (label-side) columns.
    """
    n = len(codes)
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    starts = sg.segment_starts(codes)
    gap_s = sg.seg_gap_us(ts_us, starts).astype(np.float64) / _US
    feats = dict(feats)
    feats["gap_s"] = gap_s

    if specs.include_base:
        for name in (
            "text_len",
            "n_tokens",
            "gap_s",
            "is_user",
            "is_assistant",
            "is_system",
            "is_tool_role",
            "has_tool",
        ):
            out[name] = feats[name]

    margin_us = int(specs.max_window_width_s() * _US) + 1
    ts_adj = sg.adjusted_ts(ts_us, starts, margin_us)
    hi = sg.visible_hi(ts_adj)

    # ---- sliding windows: group specs by (width, closed) to share bounds
    if specs.sliding:
        by_bounds: dict = {}
        for spec in specs.sliding:
            by_bounds.setdefault((spec.width_s, spec.closed), []).append(spec)
        for (width_s, closed), group in by_bounds.items():
            lo = sg.sliding_lo(ts_adj, int(width_s * _US), closed)
            blocks = np.concatenate(
                [_window_block(_cond_mask(s.condition, feats, n), feats) for s in group],
                axis=1,
            )
            sums = sg.range_sums(sg.prefix_sums(blocks), lo, hi)
            for j, s in enumerate(group):
                _emit_aggs(sums[:, 3 * j : 3 * j + 3], out, s.name)

    # ---- tumbling windows: prefix aggregate within (conv, window)
    for spec in specs.tumbling:
        width_us = int(spec.width_s * _US)
        win = (ts_us - TUMBLING_ORIGIN_US) // width_us
        bound = np.zeros(n, dtype=bool)
        bound[starts] = True
        if n > 1:
            bound[1:] |= win[1:] != win[:-1]
        gstart = sg.group_start_rows(bound)
        block = _window_block(_cond_mask(spec.condition, feats, n), feats)
        sums = sg.range_sums(sg.prefix_sums(block), gstart, hi)
        _emit_aggs(sums, out, spec.name)

    # ---- session features
    for spec in specs.session:
        bound = sg.session_boundaries(gap_s, starts, spec.gap_s)
        gstart = sg.group_start_rows(bound)
        ones = np.ones((n, 1), dtype=np.float64)
        turns = sg.range_sums(sg.prefix_sums(ones), gstart, hi)[:, 0]
        duration_s = (ts_us - ts_us[gstart]).astype(np.float64) / _US
        gid = sg.group_index(bound)
        gid_at_conv_start = gid[sg.group_start_rows(_conv_bound(starts, n))]
        out[f"{spec.name}_turns_so_far"] = turns
        out[f"{spec.name}_duration_so_far_s"] = duration_s
        out[f"{spec.name}_session_idx"] = (gid - gid_at_conv_start).astype(np.float64)

    # ---- positional lags (point-in-time) and leads (label-side)
    for spec in specs.lags:
        out[spec.columns[0]] = sg.seg_lag(feats[spec.feature], starts, spec.k, 0.0)
    for spec in specs.leads:
        out[spec.columns[0]] = sg.seg_lead(feats[spec.feature], starts, spec.k, 0.0)
    return out


def _conv_bound(starts: np.ndarray, n: int) -> np.ndarray:
    b = np.zeros(n, dtype=bool)
    b[starts] = True
    return b
