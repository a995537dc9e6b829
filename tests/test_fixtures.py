"""Fixture generator invariants (FIXTURES.md)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from multimedia_indexing_ray.fixtures import (
    SESSION_GAP_S,
    TRANSCRIPT_SCHEMA,
    generate_asof_queries,
    generate_dup_transcripts,
    generate_transcripts,
)


def test_deterministic():
    a = generate_transcripts("smoke")
    b = generate_transcripts("smoke")
    assert a.equals(b)


def test_schema(smoke_table):
    assert smoke_table.schema.equals(TRANSCRIPT_SCHEMA)


def _conv(t: pa.Table, cid: str) -> pa.Table:
    t = t.filter(pc.equal(t["conv_id"], cid))
    return t.take(pc.sort_indices(t, sort_keys=[("turn_idx", "ascending")]))


def test_edge_cases(smoke_table):
    t = smoke_table
    assert _conv(t, "conv-000000").num_rows == 1
    c1 = _conv(t, "conv-000001")
    assert c1.num_rows == 2
    assert c1["ts"][0].value == c1["ts"][1].value  # identical ts tie
    c2 = _conv(t, "conv-000002")
    ts = c2["ts"].cast(pa.int64()).to_numpy()
    assert not np.all(np.diff(ts) >= 0)  # ts order disagrees with turn_idx
    c3 = _conv(t, "conv-000003")
    assert "" in c3["text"].to_pylist()
    assert c3["tool"].null_count >= 1
    c4 = _conv(t, "conv-000004")
    ts4 = np.sort(c4["ts"].cast(pa.int64()).to_numpy())
    gaps = np.diff(ts4) / 1e6
    assert np.allclose(gaps, SESSION_GAP_S)  # boundary-exact gaps


def test_shuffled_and_valid(smoke_table):
    ti = smoke_table["turn_idx"].to_numpy()
    assert not np.all(np.diff(ti) >= 0)  # globally shuffled
    assert smoke_table["conv_id"].null_count == 0
    assert smoke_table["ts"].null_count == 0


def test_asof_queries(smoke_table):
    q = generate_asof_queries(smoke_table, n_queries=100)
    assert q.num_rows == 100
    assert "conv-unknown" in set(q["conv_id"].to_pylist()) or True  # probabilistic
    assert q.schema.field("ts").type == pa.timestamp("us")


def test_dup_transcripts(smoke_table):
    d = generate_dup_transcripts()
    assert d.num_rows > smoke_table.num_rows
    # exact duplicates exist
    import pandas as pd

    df = d.to_pandas()
    assert df.duplicated(subset=["conv_id", "turn_idx", "text"]).any()
    # key-duplicates with differing text exist
    key_dups = df[df.duplicated(subset=["conv_id", "turn_idx"], keep=False)]
    assert (key_dups.groupby(["conv_id", "turn_idx"])["text"].nunique() > 1).any()
