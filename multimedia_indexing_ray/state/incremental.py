"""Incremental per-conversation window state — the streaming/serving path.

The reference's aggregator holds per-item running state while descriptors
stream through worker pools (`visual/vectorization/ImageVectorizer.java`
completion-service loop; ST2 codebook/window state in SURVEY.md §2.3).
The batch engine computes whole partitions at once; this module is the
complementary INCREMENTAL mode: rows arrive per conversation in
nondecreasing ``(ts, turn_idx)`` order (micro-batches / a serving tail)
and each appended turn immediately yields its point-in-time feature
vector.  Semantics are CAUSAL: a row cannot see a later-arriving row
with the SAME timestamp, whereas the batch kernel's ts-visibility rule
makes equal-ts rows mutually visible — so the two modes agree exactly on
every conversation without duplicate timestamps (tested), and diverge
only on equal-ts ties (also tested, explicitly).

Memory is BOUNDED per conversation (SURVEY.md §7.3 actor-state-size
concern): the row buffer only keeps rows within the largest window
horizon of the latest timestamp, plus the deepest lag context.  Lead
(label-side) columns need future rows and are NOT produced in
incremental mode.

``ShardedIncrementalFeaturizer`` runs N ``@ray.remote`` actors, each
owning a hash shard of conversations — the long-lived stateful-actor
pattern for state the Dataset API cannot express (a mutable index).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

from multimedia_indexing_ray.functions.turns import base_turn_features
from multimedia_indexing_ray.specs import TUMBLING_ORIGIN_US, DEFAULT_SPECS, FeatureSpecs

_US = 1_000_000

_BASE = ("text_len", "n_tokens", "is_user", "is_assistant", "is_system", "is_tool_role", "has_tool")


class ConversationWindowState:
    """Running window/session state for ONE conversation."""

    def __init__(self, specs: FeatureSpecs):
        self.specs = specs
        self.horizon_us = int(specs.max_window_width_s() * _US) + 1
        self.k_keep = specs.max_lag_depth() + 1
        # ring buffer of recent rows: ts + base features + gap
        self.ts: List[int] = []
        self.feat: List[np.ndarray] = []  # rows of [_BASE order] values
        self.gap_s: List[float] = []
        self.last_ts: Optional[int] = None
        self.n_seen = 0
        # per-session-spec running state
        self.sess = {
            s.name: {"idx": -1, "start_ts": 0, "count": 0.0} for s in specs.session
        }
        # per-tumbling-spec current-window accumulators [count, sum_tl, sum_tok]
        self.tumb = {t.name: {"win": None, "acc": np.zeros(3)} for t in specs.tumbling}

    def _evict(self) -> None:
        if not self.ts:
            return
        cutoff = self.ts[-1] - self.horizon_us
        drop = 0
        while drop < len(self.ts) - self.k_keep and self.ts[drop] < cutoff:
            drop += 1
        if drop:
            del self.ts[:drop]
            del self.feat[:drop]
            del self.gap_s[:drop]

    def _cond_value(self, condition, row: np.ndarray) -> float:
        if condition is None:
            return 1.0
        kind, value = condition
        if kind == "role":
            name = f"is_{value}" if value != "tool" else "is_tool_role"
            return row[_BASE.index(name)]
        if kind == "tool_notnull":
            return row[_BASE.index("has_tool")]
        raise ValueError(condition)

    def append(self, ts_us: int, base_row: np.ndarray) -> "Dict[str, float]":
        """Append one turn (nondecreasing ts) -> its feature dict."""
        if self.last_ts is not None and ts_us < self.last_ts:
            raise ValueError("incremental appends must be in nondecreasing ts order")
        gap = 0.0 if self.last_ts is None else (ts_us - self.last_ts) / _US
        out: "Dict[str, float]" = {}
        if self.specs.include_base:
            for i, name in enumerate(_BASE[:2]):
                out[name] = float(base_row[i])
            out["gap_s"] = gap
            for i, name in enumerate(_BASE[2:], start=2):
                out[name] = float(base_row[i])

        self.ts.append(ts_us)
        self.feat.append(np.array(base_row, dtype=np.float64, copy=True))
        self.gap_s.append(gap)
        self.last_ts = ts_us
        self.n_seen += 1

        ts_arr = np.asarray(self.ts, dtype=np.int64)
        fmat = np.stack(self.feat)

        for spec in self.specs.sliding:
            w = int(spec.width_s * _US)
            lo = ts_us - w
            vis = (ts_arr > lo) if spec.closed == "right" else (ts_arr >= lo)
            vis &= ts_arr <= ts_us
            cond = np.array([self._cond_value(spec.condition, r) for r in fmat])
            sel = vis & (cond > 0)
            cnt = float(sel.sum())
            stl = float(fmat[sel, _BASE.index("text_len")].sum())
            stk = float(fmat[sel, _BASE.index("n_tokens")].sum())
            out[f"{spec.name}_count"] = cnt
            out[f"{spec.name}_sum_text_len"] = stl
            out[f"{spec.name}_mean_text_len"] = stl / cnt if cnt else 0.0
            out[f"{spec.name}_sum_n_tokens"] = stk

        for spec in self.specs.tumbling:
            st = self.tumb[spec.name]
            win = (ts_us - TUMBLING_ORIGIN_US) // int(spec.width_s * _US)
            if st["win"] != win:
                st["win"] = win
                st["acc"] = np.zeros(3)
            c = self._cond_value(spec.condition, base_row)
            if c > 0:
                st["acc"] += [
                    1.0,
                    base_row[_BASE.index("text_len")],
                    base_row[_BASE.index("n_tokens")],
                ]
            cnt, stl, stk = st["acc"]
            out[f"{spec.name}_count"] = cnt
            out[f"{spec.name}_sum_text_len"] = stl
            out[f"{spec.name}_mean_text_len"] = stl / cnt if cnt else 0.0
            out[f"{spec.name}_sum_n_tokens"] = stk

        for spec in self.specs.session:
            st = self.sess[spec.name]
            if st["idx"] < 0 or gap > spec.gap_s:
                st["idx"] += 1
                st["start_ts"] = ts_us
                st["count"] = 0.0
            st["count"] += 1.0
            out[f"{spec.name}_turns_so_far"] = st["count"]
            out[f"{spec.name}_duration_so_far_s"] = (ts_us - st["start_ts"]) / _US
            out[f"{spec.name}_session_idx"] = float(st["idx"])

        feats_by_name = {
            "text_len": [r[_BASE.index("text_len")] for r in self.feat],
            "n_tokens": [r[_BASE.index("n_tokens")] for r in self.feat],
            "gap_s": self.gap_s,
        }
        rel = len(self.ts) - 1
        for spec in self.specs.lags:
            j = rel - spec.k
            if self.n_seen - 1 - spec.k < 0:
                out[spec.columns[0]] = 0.0
            elif j >= 0:
                out[spec.columns[0]] = float(feats_by_name[spec.feature][j])
            else:  # lag row was evicted — horizon too small for this spec
                raise RuntimeError("lag context evicted; raise k_keep")
        self._evict()
        return out


    def append_group(self, ts_us: int, rows: np.ndarray) -> "List[Dict[str, float]]":
        """Append ALL rows sharing one timestamp with BATCH-kernel
        semantics (equal-ts rows mutually visible — the batch engine's
        ts-visibility rule, `functions/window_kernel.py` visible_hi):
        window/session aggregates are computed once over the whole run
        and emitted for every row; lags stay positional per row.  Rows
        must be in (ts, turn_idx) arrival order."""
        if self.last_ts is not None and ts_us < self.last_ts:
            raise ValueError("incremental appends must be in nondecreasing ts order")
        if self.last_ts == ts_us:
            raise ValueError(
                "equal-ts run split across appends: batch-visibility mode "
                "needs the whole run in one call (buffer until the ts advances)"
            )
        g = len(rows)
        gaps = np.zeros(g)
        gaps[0] = 0.0 if self.last_ts is None else (ts_us - self.last_ts) / _US
        outs: "List[Dict[str, float]]" = [{} for _ in range(g)]
        for r in range(g):
            if self.specs.include_base:
                o = outs[r]
                o["text_len"] = float(rows[r][0])
                o["n_tokens"] = float(rows[r][1])
                o["gap_s"] = float(gaps[r])
                for i, name in enumerate(_BASE[2:], start=2):
                    o[name] = float(rows[r][i])
            self.ts.append(ts_us)
            self.feat.append(np.array(rows[r], dtype=np.float64, copy=True))
            self.gap_s.append(float(gaps[r]))
        self.last_ts = ts_us
        self.n_seen += g

        ts_arr = np.asarray(self.ts, dtype=np.int64)
        fmat = np.stack(self.feat)

        for spec in self.specs.sliding:
            w = int(spec.width_s * _US)
            lo = ts_us - w
            vis = (ts_arr > lo) if spec.closed == "right" else (ts_arr >= lo)
            vis &= ts_arr <= ts_us  # includes the whole equal-ts run
            cond = np.array([self._cond_value(spec.condition, rr) for rr in fmat])
            sel = vis & (cond > 0)
            cnt = float(sel.sum())
            stl = float(fmat[sel, _BASE.index("text_len")].sum())
            stk = float(fmat[sel, _BASE.index("n_tokens")].sum())
            vals = {
                f"{spec.name}_count": cnt,
                f"{spec.name}_sum_text_len": stl,
                f"{spec.name}_mean_text_len": stl / cnt if cnt else 0.0,
                f"{spec.name}_sum_n_tokens": stk,
            }
            for o in outs:
                o.update(vals)

        for spec in self.specs.tumbling:
            st = self.tumb[spec.name]
            win = (ts_us - TUMBLING_ORIGIN_US) // int(spec.width_s * _US)
            if st["win"] != win:
                st["win"] = win
                st["acc"] = np.zeros(3)
            for r in range(g):
                c = self._cond_value(spec.condition, rows[r])
                if c > 0:
                    st["acc"] += [
                        1.0,
                        rows[r][_BASE.index("text_len")],
                        rows[r][_BASE.index("n_tokens")],
                    ]
            cnt, stl, stk = st["acc"]
            vals = {
                f"{spec.name}_count": cnt,
                f"{spec.name}_sum_text_len": stl,
                f"{spec.name}_mean_text_len": stl / cnt if cnt else 0.0,
                f"{spec.name}_sum_n_tokens": stk,
            }
            for o in outs:
                o.update(vals)

        for spec in self.specs.session:
            st = self.sess[spec.name]
            if st["idx"] < 0 or gaps[0] > spec.gap_s:
                st["idx"] += 1
                st["start_ts"] = ts_us
                st["count"] = 0.0
            st["count"] += float(g)
            vals = {
                f"{spec.name}_turns_so_far": st["count"],
                f"{spec.name}_duration_so_far_s": (ts_us - st["start_ts"]) / _US,
                f"{spec.name}_session_idx": float(st["idx"]),
            }
            for o in outs:
                o.update(vals)

        feats_by_name = {
            "text_len": [rr[_BASE.index("text_len")] for rr in self.feat],
            "n_tokens": [rr[_BASE.index("n_tokens")] for rr in self.feat],
            "gap_s": self.gap_s,
        }
        for r in range(g):
            i_global = self.n_seen - g + r
            buf_idx = len(self.ts) - g + r
            for spec in self.specs.lags:
                j = buf_idx - spec.k
                if i_global - spec.k < 0:
                    outs[r][spec.columns[0]] = 0.0
                elif j >= 0:
                    outs[r][spec.columns[0]] = float(feats_by_name[spec.feature][j])
                else:
                    raise RuntimeError("lag context evicted; raise k_keep")
        self._evict()
        return outs

    def _cond_mask(self, condition, fmat: np.ndarray) -> np.ndarray:
        """Vectorized `_cond_value` over a (n, len(_BASE)) matrix."""
        if condition is None:
            return np.ones(len(fmat), dtype=bool)
        kind, value = condition
        if kind == "role":
            name = f"is_{value}" if value != "tool" else "is_tool_role"
            return fmat[:, _BASE.index(name)] > 0
        if kind == "tool_notnull":
            return fmat[:, _BASE.index("has_tool")] > 0
        raise ValueError(condition)

    def append_run(
        self, ts_arr: np.ndarray, rows: np.ndarray, visibility: str = "causal"
    ) -> "Dict[str, np.ndarray]":
        """Vectorized multi-row append: one WHOLE per-conversation segment
        (nondecreasing ts) in one call, returning columnar float64 arrays.
        Bit-identical to the per-row paths — every summed quantity is
        integer-valued in float64, so the prefix-sum reassociation here is
        exact vs `append`'s per-row mask sums:

        - ``visibility="causal"``: row r sees combined indices <= r
          (== calling `append` once per row);
        - ``visibility="batch"``: row r sees through the end of its
          equal-ts run (== calling `append_group` once per run; a run
          split across calls raises, same as `append_group`).

        This is the ingest hot path for `IncrementalFeaturizer
        .append_batch` — the per-row/per-run methods re-stack the ring
        buffer per call, which capped live-store ingest at ~25k rows/s."""
        g = len(ts_arr)
        if g == 0:
            return {}
        ts_arr = np.asarray(ts_arr, dtype=np.int64)
        rows = np.asarray(rows, dtype=np.float64)
        if np.any(ts_arr[1:] < ts_arr[:-1]):
            raise ValueError("incremental appends must be in nondecreasing ts order")
        if self.last_ts is not None and ts_arr[0] < self.last_ts:
            raise ValueError("incremental appends must be in nondecreasing ts order")
        if visibility == "batch" and self.last_ts is not None and ts_arr[0] == self.last_ts:
            raise ValueError(
                "equal-ts run split across appends: batch-visibility mode "
                "needs the whole run in one call (buffer until the ts advances)"
            )

        gaps = np.zeros(g)
        gaps[0] = 0.0 if self.last_ts is None else (ts_arr[0] - self.last_ts) / _US
        gaps[1:] = (ts_arr[1:] - ts_arr[:-1]) / _US

        n_buf = len(self.ts)
        ts_all = np.concatenate([np.asarray(self.ts, dtype=np.int64), ts_arr])
        fmat_all = (
            np.concatenate([np.stack(self.feat), rows]) if n_buf else np.asarray(rows)
        )
        tl_all = fmat_all[:, _BASE.index("text_len")]
        tk_all = fmat_all[:, _BASE.index("n_tokens")]
        gap_all = np.concatenate([np.asarray(self.gap_s, dtype=np.float64), gaps])

        # per-row visible END (exclusive) in combined indices
        if visibility == "batch":
            hi = np.searchsorted(ts_all, ts_arr, side="right")
        else:
            hi = n_buf + np.arange(g) + 1

        out: "Dict[str, np.ndarray]" = {}
        if self.specs.include_base:
            out["text_len"] = rows[:, 0].astype(np.float64)
            out["n_tokens"] = rows[:, 1].astype(np.float64)
            out["gap_s"] = gaps
            for i, name in enumerate(_BASE[2:], start=2):
                out[name] = rows[:, i].astype(np.float64)

        for spec in self.specs.sliding:
            w = int(spec.width_s * _US)
            side = "right" if spec.closed == "right" else "left"
            lo = np.searchsorted(ts_all, ts_arr - w, side=side)
            m = self._cond_mask(spec.condition, fmat_all)
            mf = m.astype(np.float64)
            pre = np.zeros((len(ts_all) + 1, 3))
            np.cumsum(
                np.stack([mf, mf * tl_all, mf * tk_all], axis=1), axis=0,
                out=pre[1:],
            )
            agg = pre[hi] - pre[lo]
            cnt, stl, stk = agg[:, 0], agg[:, 1], agg[:, 2]
            mean = np.divide(stl, cnt, out=np.zeros(g), where=cnt > 0)
            out[f"{spec.name}_count"] = cnt
            out[f"{spec.name}_sum_text_len"] = stl
            out[f"{spec.name}_mean_text_len"] = mean
            out[f"{spec.name}_sum_n_tokens"] = stk

        hi_local = hi - n_buf  # end (exclusive) within the NEW rows
        for spec in self.specs.tumbling:
            st = self.tumb[spec.name]
            wins = (ts_arr - TUMBLING_ORIGIN_US) // int(spec.width_s * _US)
            m = self._cond_mask(spec.condition, rows)
            contrib = np.stack(
                [m.astype(np.float64), np.where(m, rows[:, 0], 0.0),
                 np.where(m, rows[:, 1], 0.0)], axis=1
            )
            cum = np.concatenate([np.zeros((1, 3)), np.cumsum(contrib, axis=0)])
            starts = np.empty(g, dtype=bool)
            starts[0] = st["win"] is None or wins[0] != st["win"]
            starts[1:] = wins[1:] != wins[:-1]
            seg = np.cumsum(starts)  # 0 == continuing the carried window
            start_pos = np.flatnonzero(starts)
            carry = np.zeros(3)
            if seg[0] == 0:
                carry = np.asarray(st["acc"], dtype=np.float64)
            seg_base = np.zeros((g, 3))
            if len(start_pos):
                per_seg_base = cum[start_pos]  # cumsum BEFORE each segment start
                seg_base[seg > 0] = per_seg_base[seg[seg > 0] - 1]
            acc = cum[hi_local] - seg_base + np.where((seg == 0)[:, None], carry, 0.0)
            cnt, stl, stk = acc[:, 0], acc[:, 1], acc[:, 2]
            mean = np.divide(stl, cnt, out=np.zeros(g), where=cnt > 0)
            out[f"{spec.name}_count"] = cnt
            out[f"{spec.name}_sum_text_len"] = stl
            out[f"{spec.name}_mean_text_len"] = mean
            out[f"{spec.name}_sum_n_tokens"] = stk
            st["win"] = int(wins[-1])
            final = cum[g] - (per_seg_base[-1] if len(start_pos) else 0.0)
            st["acc"] = final + (carry if len(start_pos) == 0 else 0.0)

        for spec in self.specs.session:
            st = self.sess[spec.name]
            new_flags = gaps > spec.gap_s
            new_flags[0] = st["idx"] < 0 or gaps[0] > spec.gap_s
            seg = np.cumsum(new_flags)  # 0 == continuing the carried session
            start_pos = np.flatnonzero(new_flags)
            start_ts = np.full(g, st["start_ts"], dtype=np.int64)
            if len(start_pos):
                per_seg_start = ts_arr[start_pos]
                start_ts[seg > 0] = per_seg_start[seg[seg > 0] - 1]
            # count at visible end: rows since session start (carry if cont.)
            start_row = np.zeros(g, dtype=np.int64)
            if len(start_pos):
                start_row[seg > 0] = start_pos[seg[seg > 0] - 1]
            count = (hi_local - start_row).astype(np.float64)
            count[seg == 0] += st["count"]
            out[f"{spec.name}_turns_so_far"] = count
            out[f"{spec.name}_duration_so_far_s"] = (ts_arr - start_ts) / _US
            out[f"{spec.name}_session_idx"] = (st["idx"] + seg).astype(np.float64)
            st["idx"] = int(st["idx"] + seg[-1])
            st["start_ts"] = int(start_ts[-1])
            st["count"] = float(g - start_row[-1] + (st["count"] if seg[-1] == 0 else 0.0))

        feats_all = {"text_len": tl_all, "n_tokens": tk_all, "gap_s": gap_all}
        for spec in self.specs.lags:
            src = n_buf + np.arange(g) - spec.k
            valid = (self.n_seen + np.arange(g) - spec.k) >= 0
            if np.any(valid & (src < 0)):
                raise RuntimeError("lag context evicted; raise k_keep")
            arr = feats_all[spec.feature]
            out[spec.columns[0]] = np.where(
                valid, arr[np.clip(src, 0, None)], 0.0
            ).astype(np.float64)

        self.ts.extend(int(t) for t in ts_arr)
        # COPY before retaining: ``rows`` is typically a slice view of
        # the caller's whole sorted batch matrix — keeping views would
        # pin the full multi-conversation batch in every conversation's
        # ring buffer (review-found memory leak in long-lived serving
        # actors), defeating the bounded-per-conversation guarantee
        self.feat.extend(np.array(rows, dtype=np.float64, copy=True))
        self.gap_s.extend(float(x) for x in gaps)
        self.last_ts = int(ts_arr[-1])
        self.n_seen += g
        self._evict()
        return out


class IncrementalFeaturizer:
    """Holds ConversationWindowState per conv; usable directly or as the
    body of a @ray.remote actor shard."""

    def __init__(self, specs: FeatureSpecs = DEFAULT_SPECS, equal_ts: str = "causal"):
        """``equal_ts``: how rows sharing one timestamp see each other.
        "causal" (default) — a row never sees a later-arriving equal-ts
        row (streaming semantics).  "batch" — equal-ts runs are mutually
        visible, matching the batch kernel EXACTLY (the run must arrive
        within one append_batch call; a split run raises)."""
        if equal_ts not in ("causal", "batch"):
            raise ValueError(equal_ts)
        self.specs = specs
        self.equal_ts = equal_ts
        self.states: "Dict[str, ConversationWindowState]" = {}
        # latest computed vector per conversation — the live point-lookup
        # surface (the reference's open-index query loop,
        # `visual/examples/YFCC100MExample.java:64-195`)
        self.last: "Dict[str, dict]" = {}

    def append_batch(self, batch: pa.Table) -> pa.Table:
        """Rows must be globally nondecreasing in ts per conversation
        across calls.  Returns one feature row per input row.

        Hot path: ONE `append_run` call per conversation segment (the
        vectorized prefix-sum kernel), one state-dict lookup per conv —
        not per row/per run, which capped ingest at ~25k rows/s."""
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            batch, sort_keys=[("conv_id", "ascending"), ("ts", "ascending"), ("turn_idx", "ascending")]
        )
        t = batch.take(idx)
        base = base_turn_features(t)
        fmat = np.stack([base[n] for n in _BASE], axis=1)
        conv = np.asarray(t["conv_id"].to_numpy(zero_copy_only=False), dtype=object)
        ts = t["ts"].cast(pa.int64()).to_numpy()
        ti = t["turn_idx"].to_numpy(zero_copy_only=False)
        n = len(conv)
        seg_outs: "List[Dict[str, np.ndarray]]" = []
        if n:
            bounds = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
            ends = np.r_[bounds[1:], n]
            for s, e in zip(bounds, ends):
                cid = conv[s]
                st = self.states.get(cid)
                if st is None:
                    st = self.states[cid] = ConversationWindowState(self.specs)
                out = st.append_run(ts[s:e], fmat[s:e], visibility=self.equal_ts)
                seg_outs.append(out)
                self.last[cid] = {
                    "ts": int(ts[e - 1]),
                    "turn_idx": int(ti[e - 1]),
                    **{name: float(arr[-1]) for name, arr in out.items()},
                }
        cols: dict = {
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "ts": t["ts"],
        }
        for name in self.specs.feature_columns():
            cols[name] = pa.array(
                np.concatenate([o[name] for o in seg_outs])
                if seg_outs
                else np.empty(0),
                pa.float64(),
            )
        return pa.table(cols)


    def current(self, conv_ids) -> pa.Table:
        """Point lookup: latest feature vector per requested conversation
        (typed nulls for unseen convs) — the streaming analog of
        ``features_at`` at 'now'."""
        cols: dict = {"conv_id": pa.array(list(conv_ids), pa.string())}
        rows = [self.last.get(c) for c in conv_ids]
        cols["matched_ts"] = pa.array(
            [None if r is None else r["ts"] for r in rows], pa.int64()
        ).cast(pa.timestamp("us"))
        cols["matched_turn_idx"] = pa.array(
            [None if r is None else r["turn_idx"] for r in rows], pa.int64()
        )
        for name in self.specs.feature_columns():
            cols[f"matched_{name}"] = pa.array(
                [None if r is None else r[name] for r in rows], pa.float64()
            )
        return pa.table(cols)


def sharded_incremental(
    specs: FeatureSpecs = DEFAULT_SPECS,
    num_shards: int = 4,
    equal_ts: str = "causal",
) -> "tuple[list, object]":
    """Create `num_shards` long-lived actors each owning a conv-hash
    shard, plus a `route(batch) -> list[ObjectRef]` function.  This is the
    raw-actor escape hatch for shared mutable state (SURVEY.md §2.3 ST5)."""
    import ray

    from multimedia_indexing_ray.stages.partition import partition_ids

    Actor = ray.remote(IncrementalFeaturizer)
    actors = [Actor.remote(specs, equal_ts) for _ in range(num_shards)]

    def route(batch: pa.Table) -> "list":
        pids = partition_ids(batch["conv_id"].to_numpy(zero_copy_only=False), num_shards)
        refs = []
        for s in range(num_shards):
            sel = np.flatnonzero(pids == s)
            if len(sel):
                refs.append(actors[s].append_batch.remote(batch.take(pa.array(sel))))
        return refs

    return actors, route


class IncrementalUserFeatureStore:
    """Streaming maintenance of the per-user feature-store row
    (`pipelines/queries.py:q_user_feature_store`): every feature is an
    ASSOCIATIVE accumulator, so per-user state is O(1) scalars — no ring
    buffer, unlike the window featurizer above.  Feed event batches in
    nondecreasing (ts, event_id) order (the arrival order of a log
    stream); `current()` then reproduces the batch query bit-for-bit
    (integer sums, single divisions with identical operands).

    State per user: [n, first_ts, last_ts, n_sessions, total_cents,
    n_purchase, n_error, sum_t, sum_tx, sum_tt] — all int64.  The OLS
    time axis is hours since the user's FIRST event, which streaming
    arrival order pins at first sight, so late accumulators never need
    re-basing."""

    _GAP_US = 1_800_000_000
    _HOUR_US = 3_600_000_000

    def __init__(self):
        self.state: "Dict[int, np.ndarray]" = {}

    def append_batch(self, batch: pa.Table) -> None:
        if batch.num_rows == 0:
            return
        uid = batch["user_id"].to_numpy()
        eid = batch["event_id"].to_numpy()
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        val = batch["value"].to_numpy(zero_copy_only=False)
        c = np.floor(val * 100.0 + 0.5).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        su, st, sc = uid[order], ts[order], c[order]
        se = et[order]
        bounds = np.flatnonzero(np.r_[True, su[1:] != su[:-1]])
        ends = np.r_[bounds[1:], len(su)]
        for s, e in zip(bounds, ends):
            u = int(su[s])
            seg_ts, seg_c = st[s:e], sc[s:e]
            prev = self.state.get(u)
            if prev is None:
                first = seg_ts[0]
                sessions = 1
                gap_prev = None
            else:
                if seg_ts[0] < prev[2]:
                    raise ValueError(
                        "append_batch requires nondecreasing (ts, event_id) "
                        f"arrival per user: user {u} got ts {seg_ts[0]} after "
                        f"stored last_ts {prev[2]}"
                    )
                first = prev[1]
                sessions = 0
                gap_prev = seg_ts[0] - prev[2]
            gaps = np.diff(seg_ts)
            sessions += int((gaps > self._GAP_US).sum())
            if gap_prev is not None and gap_prev > self._GAP_US:
                sessions += 1
            th = (seg_ts - first) // self._HOUR_US
            add = np.array(
                [
                    e - s,
                    0,  # first handled below
                    0,  # last handled below
                    sessions,
                    int(seg_c.sum()),
                    int((se[s:e] == "purchase").sum()),
                    int((se[s:e] == "error").sum()),
                    int(th.sum()),
                    int((th * seg_c).sum()),
                    int((th * th).sum()),
                ],
                dtype=np.int64,
            )
            if prev is None:
                cur = add
                cur[1] = first
            else:
                cur = prev + add
                cur[1] = first
            cur[2] = seg_ts[-1]
            self.state[u] = cur

    def current(self) -> pa.Table:
        if not self.state:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                    "events_per_session": pa.array([], pa.float64()),
                    "tenure_s": pa.array([], pa.int64()),
                    "total_value_cents": pa.array([], pa.int64()),
                    "n_purchase": pa.array([], pa.int64()),
                    "n_error": pa.array([], pa.int64()),
                    "slope_cents_per_hour": pa.array([], pa.float64()),
                }
            )
        uids = np.array(sorted(self.state), dtype=np.int64)
        m = np.stack([self.state[int(u)] for u in uids])
        n, first, last = m[:, 0], m[:, 1], m[:, 2]
        sessions, cents = m[:, 3], m[:, 4]
        sum_t, sum_tx, sum_tt = m[:, 7], m[:, 8], m[:, 9]
        num = (n * sum_tx - sum_t * cents).astype(np.float64)
        den = (n * sum_tt - sum_t * sum_t).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = num / den
        return pa.table(
            {
                "user_id": pa.array(uids, pa.int64()),
                "n_events": pa.array(n, pa.int64()),
                "n_sessions": pa.array(sessions, pa.int64()),
                "events_per_session": pa.array(n.astype(np.float64) / sessions, pa.float64()),
                "tenure_s": pa.array((last - first) // 1_000_000, pa.int64()),
                "total_value_cents": pa.array(cents, pa.int64()),
                "n_purchase": pa.array(m[:, 5], pa.int64()),
                "n_error": pa.array(m[:, 6], pa.int64()),
                "slope_cents_per_hour": pa.array(slope, pa.float64(), mask=(den == 0)),
            }
        )
