"""Planted-semantics tests for the round-5k operators: snapshot_diff's
add/remove/change classification is verified against hand-derivable
membership (ids 1..70: %10 drops from A, %7 drops from B, %5 doubles in
B), and zorder_zonemap's defining property — every cell is TIGHT in
BOTH dimensions at once (a 6-bit Morton prefix pins the top 3 bits of
each 10-bit bucket, so per-cell spread <= 128 buckets per axis) — is
asserted on a value/time grid that spans the full bucket space."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as papq
import pytest

US = 1_000_000
BASE = 1_700_000_000 * US


def _write_events(d, ids, ts_us, values, types=None):
    n = len(ids)
    t = pa.table(
        {
            "event_id": pa.array(np.asarray(ids, np.int64), pa.int64()),
            "ts": pa.array(np.asarray(ts_us, np.int64), pa.timestamp("us")),
            "user_id": pa.array(np.ones(n, np.int64), pa.int64()),
            "event_type": pa.array(types or ["click"] * n, pa.string()),
            "value": pa.array(np.asarray(values, np.float64), pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    papq.write_table(t, str(d / "events.parquet"))
    return str(d)


def test_snapshot_diff_planted(ray_session, tmp_path):
    import __ray_entry__ as e

    ids = np.arange(1, 71)
    sf = _write_events(tmp_path, ids, BASE + ids * US, np.full(70, 2.0))
    out = e.queries()["snapshot_diff"](sf).to_pandas()
    got = {s: set(g["event_id"]) for s, g in out.groupby("status")}
    ids = set(range(1, 71))
    exp_added = {i for i in ids if i % 10 == 0 and i % 7 != 0}
    exp_removed = {i for i in ids if i % 7 == 0 and i % 10 != 0}
    exp_changed = {
        i for i in ids if i % 10 != 0 and i % 7 != 0 and i % 5 == 0
    }
    assert got.get("added", set()) == exp_added
    assert got.get("removed", set()) == exp_removed
    assert got.get("changed", set()) == exp_changed
    # payloads: added rows have no old value, removed no new, changed 2x
    by = out.set_index("event_id")
    for i in exp_added:
        assert pd.isna(by.loc[i, "old_cents"]) and by.loc[i, "new_cents"] == 400
    for i in exp_removed:
        assert by.loc[i, "old_cents"] == 200 and pd.isna(by.loc[i, "new_cents"])
    for i in exp_changed:
        assert by.loc[i, "old_cents"] == 200 and by.loc[i, "new_cents"] == 400


def test_zorder_cells_tight_in_both_dims(ray_session, tmp_path):
    import __ray_entry__ as e

    # grid spanning the full bucket space: values 0..$511.50 in 50c
    # steps x hours 0..1023 (sampled) — plus out-of-range values that
    # must clamp into the edge buckets, not crash or mis-cell
    rng = np.random.default_rng(7)
    v = rng.integers(0, 1024, 4000) * 0.50
    h = rng.integers(0, 1024, 4000)
    v = np.r_[v, [9999.99, 0.0]]
    h = np.r_[h, [0, 1023]]
    ids = np.arange(1, len(v) + 1)
    sf = _write_events(tmp_path, ids, BASE + h * 3600 * US, v)
    out = e.queries()["zorder_zonemap"](sf).to_pandas()
    assert out["n_rows"].sum() == len(v)
    # tightness: each cell's hour spread <= 127 (3 high t-bits pinned)
    spread_h = out["hmax_off"] - out["hmin_off"]
    assert (spread_h <= 127).all()
    # value tightness holds for in-range cells (clamped rows live in the
    # top v-bucket band, whose cents range is unbounded above by design)
    in_range = out["vmax_cents"] < 1024 * 50
    spread_v = out.loc[in_range, "vmax_cents"] - out.loc[in_range, "vmin_cents"]
    assert (spread_v <= 128 * 50).all()
    # both dims tight SIMULTANEOUSLY is the Z-order point; a ts-sorted
    # layout would give spread_h ~0 but spread_v ~ full range
    assert len(out) > 8


def test_pr_thresholds_planted(ray_session, tmp_path):
    import __ray_entry__ as e

    # 4 purchases at $10, 6 clicks at $1: thr=0/$5 splits them exactly
    ids = np.arange(1, 11)
    types = ["purchase"] * 4 + ["click"] * 6
    vals = [10.0] * 4 + [1.0] * 6
    sf = _write_events(tmp_path, ids, BASE + ids * US, vals, types)
    out = e.queries()["pr_at_thresholds"](sf).to_pandas().set_index("thr")
    assert out.loc[0, "tp"] == 4 and out.loc[0, "fp"] == 6
    assert out.loc[0, "recall"] == 1.0 and out.loc[0, "precision"] == 0.4
    assert out.loc[1, "tp"] == 4 and out.loc[1, "fp"] == 0
    assert out.loc[1, "precision"] == 1.0 and out.loc[1, "f1"] == 1.0
    # thresholds above $10: no predictions -> precision/f1 NULL, recall 0
    assert out.loc[3, "tp"] == 0 and pd.isna(out.loc[3, "precision"])
    assert out.loc[3, "recall"] == 0.0 and pd.isna(out.loc[3, "f1"])


def test_new_user_rate_planted(ray_session, tmp_path):
    import __ray_entry__ as e

    # day 0: users 1,2,3 (all new); day 1: users 2,3,4 (one new);
    # day 2: user 1 again (zero new)
    day = 86400 * US
    rows = [(1, 0), (2, 0), (3, 0), (2, 1), (3, 1), (4, 1), (1, 2), (1, 2)]
    uid, d = zip(*rows)
    n = len(rows)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "ts": pa.array(
                np.array([BASE + x * day for x in d], np.int64), pa.timestamp("us")
            ),
            "user_id": pa.array(np.array(uid, np.int64)),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array(np.ones(n), pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    papq.write_table(t, str(tmp_path / "events.parquet"))
    out = (
        e.queries()["new_user_rate_daily"](str(tmp_path))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert out["n_users"].tolist() == [3, 3, 1]
    assert out["n_new"].tolist() == [3, 1, 0]
    assert out["new_rate"].tolist() == [1.0, 1.0 / 3.0, 0.0]
