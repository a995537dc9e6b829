"""Single-process pandas/numpy oracle — deliberately naive (FIXTURES.md).

Independent reimplementation of the feature semantics with Python loops
per conversation; O(n^2) windows.  The engine's Ray output must match
allclose(rtol=1e-9, atol=1e-12) on features and exactly on keys/text.
Mirrors the reference's exact-vs-approx conformance idea
(`visual/examples/Example.java:155-182`) with exact tolerance.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from multimedia_indexing_ray.specs import TUMBLING_ORIGIN_US, DEFAULT_SPECS, FeatureSpecs

_US = 1_000_000
_TOKEN = re.compile(r"\S+")


def _cond_fn(condition):
    if condition is None:
        return lambda row: True
    kind, value = condition
    if kind == "role":
        return lambda row: row["role"] == value
    if kind == "tool_notnull":
        return lambda row: row["tool"] is not None and not (
            isinstance(row["tool"], float) and np.isnan(row["tool"])
        )
    raise ValueError(condition)


def oracle_features(df: pd.DataFrame, specs: FeatureSpecs = DEFAULT_SPECS) -> pd.DataFrame:
    """Feature rows per input turn, sorted by (conv_id, ts, turn_idx)."""
    df = df.copy()
    df["__ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
    df = df.sort_values(["conv_id", "__ts_us", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )
    rows = []
    for conv_id, g in df.groupby("conv_id", sort=True):
        g = g.reset_index(drop=True)
        n = len(g)
        tl = np.array([len(t) for t in g["text"]], dtype=float)
        tok = np.array([len(_TOKEN.findall(t)) for t in g["text"]], dtype=float)
        ts = g["__ts_us"].to_numpy()
        gap = np.zeros(n)
        for i in range(1, n):
            gap[i] = (ts[i] - ts[i - 1]) / _US
        # session boundary flags for every session spec
        sess_bounds = {}
        for spec in specs.session:
            b = [True] + [gap[i] > spec.gap_s for i in range(1, n)]
            sess_bounds[spec.name] = b
        for i in range(n):
            row = g.iloc[i]
            rec = {
                "conv_id": conv_id,
                "turn_idx": int(row["turn_idx"]),
                "ts": row["ts"],
                "text": row["text"],
            }
            base = {
                "text_len": tl[i],
                "n_tokens": tok[i],
                "gap_s": gap[i],
                "is_user": float(row["role"] == "user"),
                "is_assistant": float(row["role"] == "assistant"),
                "is_system": float(row["role"] == "system"),
                "is_tool_role": float(row["role"] == "tool"),
                "has_tool": float(_cond_fn(("tool_notnull", ""))(row)),
            }
            if specs.include_base:
                rec.update(base)
            for spec in specs.sliding:
                cond = _cond_fn(spec.condition)
                w_us = int(spec.width_s * _US)
                c = s = k = 0.0
                for j in range(n):
                    if ts[j] > ts[i]:
                        continue
                    if spec.closed == "right" and not (ts[j] > ts[i] - w_us):
                        continue
                    if spec.closed == "both" and not (ts[j] >= ts[i] - w_us):
                        continue
                    if cond(g.iloc[j]):
                        c += 1
                        s += tl[j]
                        k += tok[j]
                rec[f"{spec.name}_count"] = c
                rec[f"{spec.name}_sum_text_len"] = s
                rec[f"{spec.name}_mean_text_len"] = s / c if c else 0.0
                rec[f"{spec.name}_sum_n_tokens"] = k
            for spec in specs.tumbling:
                cond = _cond_fn(spec.condition)
                w_us = int(spec.width_s * _US)
                win_i = (ts[i] - TUMBLING_ORIGIN_US) // w_us
                c = s = k = 0.0
                for j in range(n):
                    if ts[j] > ts[i]:
                        continue
                    if (ts[j] - TUMBLING_ORIGIN_US) // w_us != win_i:
                        continue
                    if cond(g.iloc[j]):
                        c += 1
                        s += tl[j]
                        k += tok[j]
                rec[f"{spec.name}_count"] = c
                rec[f"{spec.name}_sum_text_len"] = s
                rec[f"{spec.name}_mean_text_len"] = s / c if c else 0.0
                rec[f"{spec.name}_sum_n_tokens"] = k
            for spec in specs.session:
                b = sess_bounds[spec.name]
                # find the session start row for i
                start = max(j for j in range(i + 1) if b[j])
                sess_idx = sum(1 for j in range(i + 1) if b[j]) - 1
                turns = sum(1 for j in range(start, n) if ts[j] <= ts[i])
                rec[f"{spec.name}_turns_so_far"] = float(turns)
                rec[f"{spec.name}_duration_so_far_s"] = (ts[i] - ts[start]) / _US
                rec[f"{spec.name}_session_idx"] = float(sess_idx)
            for spec in specs.lags:
                src = base if spec.feature in base else None
                vals = {"text_len": tl, "n_tokens": tok, "gap_s": gap}[spec.feature]
                rec[spec.columns[0]] = float(vals[i - spec.k]) if i - spec.k >= 0 else 0.0
            for spec in specs.leads:
                vals = {"text_len": tl, "n_tokens": tok, "gap_s": gap}[spec.feature]
                rec[spec.columns[0]] = float(vals[i + spec.k]) if i + spec.k < n else 0.0
            rows.append(rec)
    return pd.DataFrame(rows)


def oracle_asof(turns_df: pd.DataFrame, queries_df: pd.DataFrame) -> pd.DataFrame:
    """For each (conv_id, ts) query: the last turn with ts' <= ts (ties by
    highest turn_idx under the stable ordering); None when no turn
    qualifies or the conv is unknown."""
    turns_df = turns_df.copy()
    turns_df["__ts_us"] = turns_df["ts"].astype("datetime64[us]").astype("int64")
    out = []
    for _, q in queries_df.iterrows():
        q_ts = int(np.datetime64(q["ts"], "us").astype("int64"))
        cand = turns_df[turns_df["conv_id"] == q["conv_id"]]
        cand = cand[cand["__ts_us"] <= q_ts]
        if len(cand) == 0:
            out.append({"conv_id": q["conv_id"], "ts": q["ts"], "matched_ts": None, "matched_turn_idx": None})
            continue
        best = cand.sort_values(["__ts_us", "turn_idx"], kind="mergesort").iloc[-1]
        out.append(
            {
                "conv_id": q["conv_id"],
                "ts": q["ts"],
                "matched_ts": best["ts"],
                "matched_turn_idx": int(best["turn_idx"]),
            }
        )
    return pd.DataFrame(out)
