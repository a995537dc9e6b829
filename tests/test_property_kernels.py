"""Property-based tests (hypothesis): segmented kernels vs brute force.

Randomized segments/timestamps/values; each vectorized kernel must match
an obviously-correct O(n^2) reference on every generated case.
"""

import numpy as np
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from multimedia_indexing_ray.functions import segments as sg


@st.composite
def segmented_data(draw, max_segs=5, max_len=12):
    n_segs = draw(st.integers(1, max_segs))
    lens = [draw(st.integers(1, max_len)) for _ in range(n_segs)]
    codes = np.repeat(np.arange(n_segs), lens)
    n = len(codes)
    # nondecreasing ts within segments, arbitrary gaps
    ts = np.empty(n, dtype=np.int64)
    i = 0
    for L in lens:
        start = draw(st.integers(0, 10**9))
        gaps = [draw(st.integers(0, 10**7)) for _ in range(L)]
        ts[i : i + L] = start + np.cumsum(gaps) - gaps[0]
        i += L
    vals = np.array([draw(st.integers(-100, 100)) for _ in range(n)], dtype=np.float64)
    return codes, ts, vals


@settings(max_examples=60, deadline=None)
@given(segmented_data(), st.integers(1, 4), st.floats(-5, 5))
def test_lag_lead_property(data, k, fill):
    codes, ts, vals = data
    starts = sg.segment_starts(codes)
    lag = sg.seg_lag(vals, starts, k, fill)
    lead = sg.seg_lead(vals, starts, k, fill)
    for i in range(len(vals)):
        seg = codes[i]
        j = i - k
        exp = vals[j] if j >= 0 and codes[j] == seg else fill
        assert lag[i] == exp, f"lag at {i}"
        j = i + k
        exp = vals[j] if j < len(vals) and codes[j] == seg else fill
        assert lead[i] == exp, f"lead at {i}"


@settings(max_examples=60, deadline=None)
@given(segmented_data())
def test_gap_property(data):
    codes, ts, _ = data
    starts = sg.segment_starts(codes)
    gap = sg.seg_gap_us(ts, starts)
    for i in range(len(ts)):
        if i == 0 or codes[i] != codes[i - 1]:
            assert gap[i] == 0
        else:
            assert gap[i] == ts[i] - ts[i - 1]


@settings(max_examples=60, deadline=None)
@given(segmented_data(), st.integers(0, 10**7))
def test_sliding_window_property(data, width):
    codes, ts, vals = data
    starts = sg.segment_starts(codes)
    adj = sg.adjusted_ts(ts, starts, width + 1)
    hi = sg.visible_hi(adj)
    lo = sg.sliding_lo(adj, width, "right")
    sums = sg.range_sums(sg.prefix_sums(vals[:, None]), lo, hi)[:, 0]
    for i in range(len(ts)):
        exp = sum(
            vals[j]
            for j in range(len(ts))
            if codes[j] == codes[i] and ts[i] - width < ts[j] <= ts[i]
        )
        assert sums[i] == exp, f"window sum at {i}"


@settings(max_examples=60, deadline=None)
@given(segmented_data(), st.floats(0, 10**6))
def test_session_property(data, thr):
    codes, ts, _ = data
    starts = sg.segment_starts(codes)
    gap = sg.seg_gap_us(ts, starts).astype(np.float64)
    b = sg.session_boundaries(gap, starts, thr)
    gid = sg.group_index(b)
    for i in range(len(ts)):
        if i == 0 or codes[i] != codes[i - 1]:
            assert b[i]
        else:
            assert b[i] == (gap[i] > thr)
        if i > 0:
            assert gid[i] == gid[i - 1] + int(b[i])


@settings(max_examples=60, deadline=None)
@given(segmented_data(), st.floats(-5, 5))
def test_ffill_property(data, fill):
    codes, ts, vals = data
    starts = sg.segment_starts(codes)
    valid = vals > 0
    out = sg.seg_ffill(vals, valid, starts, fill)
    for i in range(len(vals)):
        exp = fill
        for j in range(i, -1, -1):
            if codes[j] != codes[i]:
                break
            if valid[j]:
                exp = vals[j]
                break
        assert out[i] == exp, f"ffill at {i}"


@settings(max_examples=40, deadline=None)
@given(segmented_data(), segmented_data())
def test_asof_searchsorted_property(left, right):
    """The asof index math on an adjusted axis matches a nested-loop asof."""
    l_codes, l_ts, _ = left
    r_codes, r_ts, _ = right
    cats = np.unique(np.concatenate([l_codes, r_codes]))
    c_l = np.searchsorted(cats, l_codes)
    c_r = np.searchsorted(cats, r_codes)
    base = np.full(len(cats), np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(base, c_l, l_ts)
    np.minimum.at(base, c_r, r_ts)
    rel_l = l_ts - base[c_l]
    rel_r = r_ts - base[c_r]
    step = int(max(rel_l.max(initial=0), rel_r.max(initial=0))) + 2
    adj_l = c_l * step + rel_l
    adj_r = c_r * step + rel_r
    order = np.argsort(adj_l, kind="stable")
    adj_l_s, c_l_s, l_ts_s = adj_l[order], c_l[order], l_ts[order]
    idx = np.searchsorted(adj_l_s, adj_r, side="right") - 1
    for r in range(len(r_ts)):
        cands = [j for j in range(len(l_ts)) if c_l[j] == c_r[r] and l_ts[j] <= r_ts[r]]
        if not cands:
            assert idx[r] < 0 or c_l_s[idx[r]] != c_r[r]
        else:
            assert idx[r] >= 0 and c_l_s[idx[r]] == c_r[r]
            assert l_ts_s[idx[r]] == max(l_ts[j] for j in cands)


@settings(deadline=None)
@given(
    st.lists(st.tuples(st.sampled_from("abcde"), st.integers(-10**9, 10**9)), max_size=200),
    st.integers(1, 7),
)
def test_tiny_group_sum_combine_split_invariance(rows, n_chunks):
    """The _tiny_group_sum combine (per-chunk _pa_group_sum partials, then
    one final _pa_group_sum over the concatenated partials) equals a
    direct global group-sum for ANY split of the rows into chunks —
    int sums are order/partition independent."""
    import pyarrow as pa

    from multimedia_indexing_ray.pipelines.queries import _pa_group_sum

    keys = [k for k, _ in rows]
    vals = [v for _, v in rows]
    table = pa.table({"k": pa.array(keys, pa.string()), "v": pa.array(vals, pa.int64())})
    bounds = np.linspace(0, len(rows), n_chunks + 1).astype(int)
    partials = [
        _pa_group_sum(table.slice(int(s), int(e - s)), ["k"], ["v"])
        for s, e in zip(bounds[:-1], bounds[1:])
        if e > s
    ]
    if partials:
        combined = _pa_group_sum(pa.concat_tables(partials), ["k"], ["v"])
    else:
        combined = _pa_group_sum(table, ["k"], ["v"])
    got = dict(zip(combined["k"].to_pylist(), combined["v"].to_pylist()))
    want = {}
    for k, v in rows:
        want[k] = want.get(k, 0) + v
    assert got == want


@settings(deadline=None)
@given(st.lists(st.text(alphabet="co value customer order .x@5 ", max_size=40), max_size=30))
def test_scrub_replace_matches_re_sub(texts):
    """pc.replace_substring_regex (RE2) == Python re.sub for the scrub
    patterns on arbitrary text (both engines: leftmost, non-overlapping)."""
    import re

    import pyarrow as pa

    from multimedia_indexing_ray.functions import text as tx

    arr = pa.array(texts, pa.string())
    for pat in (tx.REDACT_TERM_RE, tx.PII_EMAIL_RE):
        got = tx.scrub_replace(arr, pat).to_pylist()
        want = [re.sub(pat, tx.REDACT_TOKEN, t) for t in texts]
        assert got == want
        counts = tx.scrub_count(arr, pat).tolist()
        assert counts == [len(re.findall(pat, t)) for t in texts]


@settings(max_examples=60, deadline=None)
@given(segmented_data(), st.integers(1, 10**7))
def test_sliding_corr_lag1_property(data, width):
    """Trailing-window autocorr sums: the int64 prefix-sum path must
    equal a brute-force per-row window scan on every generated case."""
    codes, ts, vals = data
    starts = sg.segment_starts(codes)
    x = vals.astype(np.int64)
    adj = sg.adjusted_ts(ts, starts, width + 1)
    hi = sg.visible_hi(adj)
    lo = sg.sliding_lo(adj, width, "both")
    y = np.zeros_like(x)
    y[1:] = x[:-1]
    y[starts] = 0
    v = np.ones(len(x), dtype=np.int64)
    v[starts] = 0
    blocks = np.stack([v, x * v, x * x * v, y, y * y, x * v * y], axis=1)
    s = sg.range_sums(sg.prefix_sums_int(blocks), lo, hi)
    for i in range(len(x)):
        idx = [
            j
            for j in range(len(x))
            if codes[j] == codes[i] and ts[i] - width <= ts[j] <= ts[i] and v[j]
        ]
        # equal-ts peers AFTER i are included (closed="both" RANGE frame)
        assert s[i, 0] == len(idx)
        assert s[i, 1] == sum(int(x[j]) for j in idx)
        assert s[i, 2] == sum(int(x[j]) ** 2 for j in idx)
        assert s[i, 5] == sum(int(x[j]) * int(x[j - 1]) for j in idx)


@settings(max_examples=60, deadline=None)
@given(segmented_data(), st.integers(1, 10**7))
def test_resample_ffill_tick_property(data, step):
    """Grid generation + as-of mapping vs brute force: every
    epoch-aligned tick in [ceil(t0), t1] appears exactly once per key
    and carries the last value at-or-before it."""
    codes, ts, vals = data
    starts = sg.segment_starts(codes)
    counts = sg.segment_counts(starts, len(codes))
    t0 = ts[starts]
    t1 = ts[starts + counts - 1]
    g0 = -(-t0 // step) * step
    nt = np.maximum((t1 - g0) // step + 1, 0)
    total = int(nt.sum())
    assume(total <= 2000)  # keep the O(total x rows) brute force sane
    if total == 0:
        return
    seg = np.repeat(np.arange(len(starts), dtype=np.int64), nt)
    cum = np.concatenate([[0], np.cumsum(nt)[:-1]])
    tick = g0[seg] + (np.arange(total, dtype=np.int64) - np.repeat(cum, nt)) * step
    adj = sg.adjusted_ts(ts, starts, 1)
    off = adj[starts] - t0
    idx = np.searchsorted(adj, tick + off[seg], side="right") - 1
    # brute force per key
    pos = 0
    for s_i, (st0, st1) in enumerate(zip(t0, t1)):
        expect = [t for t in range(-(-int(st0) // step) * step, int(st1) + 1, step)]
        got = tick[seg == s_i]
        assert list(got) == expect
        lo_row, hi_row = starts[s_i], starts[s_i] + counts[s_i]
        for t in expect:
            cand = [j for j in range(lo_row, hi_row) if ts[j] <= t]
            assert idx[pos] == cand[-1]
            pos += 1


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=400),
    st.integers(4, 32),
)
def test_qsketch_compress_envelope(vals, k):
    """compress_block: weights sum to n, vals strictly increasing, and for
    every query point |cumW_le(x) - rank_le(x)| < ceil(n/k)."""
    from multimedia_indexing_ray.functions import qsketch as qs

    a = np.array(vals, np.int64)
    v, w = qs.compress_block(a, k)
    assert w.sum() == len(a)
    assert (np.diff(v) > 0).all()
    s = np.sort(a)
    gap = -(-len(a) // k)
    cum = np.cumsum(w)
    for x in np.unique(np.concatenate([a, a + 1, a - 1])):
        cum_le = int(cum[np.searchsorted(v, x, side="right") - 1]) if (v <= x).any() else 0
        rank_le = int(np.searchsorted(s, x, side="right"))
        assert 0 <= rank_le - cum_le < max(gap, 1) + 1


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=400),
    st.integers(4, 32),
    st.integers(1, 6),
    st.integers(0, 2**31),
)
def test_qsketch_merge_estimate_within_envelope(vals, k, n_blocks, seed):
    """Estimates from arbitrarily-partitioned blocks stay within the
    summed per-block gap envelope of the exact lower-quantile target —
    the partition-invariance the conformance query hashes."""
    from multimedia_indexing_ray.functions import qsketch as qs

    a = np.array(vals, np.int64)
    rng = np.random.default_rng(seed)
    bounds = np.sort(rng.integers(0, len(a) + 1, size=max(n_blocks - 1, 0)))
    blocks = np.split(a, bounds)
    vs, ws, budget = [], [], 0
    for b in blocks:
        if len(b) == 0:
            continue
        v, w = qs.compress_block(b, k)
        vs.append(v)
        ws.append(w)
        budget += -(-len(b) // k)
    q_milli = np.array([100, 250, 500, 750, 900], np.int64)
    est = qs.merge_estimate(np.concatenate(vs), np.concatenate(ws), q_milli)
    s = np.sort(a)
    n = len(a)
    t = np.maximum(-(-(q_milli * n) // 1000), 1)
    for e, ti in zip(est, t):
        le = int(np.searchsorted(s, e, side="right"))
        lt = int(np.searchsorted(s, e, side="left"))
        assert le >= ti - budget and lt <= ti - 1 + budget
    # single uncompressed block must be EXACT (the discrete lower rule)
    v1, w1 = qs.compress_block(a, len(a))
    exact = qs.merge_estimate(v1, w1, q_milli)
    np.testing.assert_array_equal(exact, s[t - 1])


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.integers(0, 4), min_size=1, max_size=60),
    st.lists(st.tuples(st.integers(0, 59), st.integers(0, 60)), min_size=1, max_size=8),
    st.sampled_from([4, 16, 1 << 20]),
)
def test_range_mode_property(codes, windows, cap):
    """range_mode == brute-force most-frequent with smallest-code ties,
    under every mass-cap chunking."""
    from multimedia_indexing_ray.functions import segments as sg

    c = np.array(codes, np.int64)
    n = len(c)
    lo = np.array([min(a, n) for a, _ in windows], np.int64)
    hi = np.array([min(b, n) for _, b in windows], np.int64)
    got = sg.range_mode(c, lo, hi, mass_cap=cap)
    for i, (l, h) in enumerate(zip(lo, hi)):
        if h <= l:
            assert got[i] == -1
            continue
        cnt = np.bincount(c[l:h], minlength=5)
        assert got[i] == np.flatnonzero(cnt == cnt.max())[0]
