"""Source adapters: events->transcript mapping and batch validation."""

import pyarrow as pa
import pyarrow.compute as pc


def test_events_to_transcripts(ray_session):
    import ray.data as rd

    from multimedia_indexing_ray.fixtures import TRANSCRIPT_SCHEMA
    from multimedia_indexing_ray.sources.transcripts import events_to_transcripts

    import os

    sf = os.environ.get("GRAFT_PARITY_SF", "/root/testdata/sf0.001")
    ev = rd.read_parquet(f"{sf}/events.parquet")
    out = events_to_transcripts(ev)
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    assert set(t.column_names) == set(TRANSCRIPT_SCHEMA.names)
    assert t.num_rows == ev.count() > 0
    # conv_id is the stringified user_id; text is never null (coalesced)
    assert t["conv_id"][0].as_py().isdigit()
    assert t.column("text").null_count == 0
    # tool only set for purchase events
    df = t.to_pandas()
    assert (df.loc[df["tool"].notna(), "role"] == "purchase").all()


def test_validate_batch_drops_null_keys():
    from multimedia_indexing_ray.fixtures import TRANSCRIPT_SCHEMA
    from multimedia_indexing_ray.sources.transcripts import validate_batch

    rows = [
        {"conv_id": "a", "turn_idx": 0, "role": "user", "text": "x", "tool": None,
         "ts": 1_000_000},
        {"conv_id": None, "turn_idx": 1, "role": "user", "text": "y", "tool": None,
         "ts": 2_000_000},
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r["conv_id"] for r in rows], pa.string()),
            "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
            "role": pa.array([r["role"] for r in rows], pa.string()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "tool": pa.array([r["tool"] for r in rows], pa.string()),
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
        }
    )
    out = validate_batch(t)
    assert out.num_rows == 1 and out["conv_id"][0].as_py() == "a"
