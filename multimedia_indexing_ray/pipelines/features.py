"""End-to-end feature pipelines.

``transcript_features``: transcripts -> per-turn feature rows (flagship).
``features_at``: transcripts + (conv_id, ts) query probes -> the
point-in-time feature vector at each probe, via the as-of join — the
"entity x timestamp" contract of the north_rule: a probe sees exactly the
features of the last visible turn (ts' <= ts), nulls when no turn or an
unknown conversation (query-time analog of the reference's
`computeNearestNeighbors` serving path,
`visual/examples/YFCC100MExample.java:64-195`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import ray.data

from multimedia_indexing_ray.sources.transcripts import read_transcripts
from multimedia_indexing_ray.specs import DEFAULT_SPECS, FeatureSpecs
from multimedia_indexing_ray.stages.asof_join import asof_join
from multimedia_indexing_ray.stages.features import compute_features
from multimedia_indexing_ray.stages.partition import DEFAULT_NUM_PARTITIONS


def transcript_features(
    source: Union[str, Sequence[str], "ray.data.Dataset"],
    specs: FeatureSpecs = DEFAULT_SPECS,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    **kw,
) -> "ray.data.Dataset":
    ds = source if isinstance(source, ray.data.Dataset) else read_transcripts(source)
    return compute_features(ds, specs, num_partitions=num_partitions, **kw)


def features_at(
    source: Union[str, Sequence[str], "ray.data.Dataset"],
    queries: "ray.data.Dataset",
    specs: FeatureSpecs = DEFAULT_SPECS,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    keep_unmatched: bool = True,
    columns: Optional[Sequence[str]] = None,
) -> "ray.data.Dataset":
    """Point-in-time feature vector per (conv_id, ts) probe.

    Output: query columns + matched_ts / matched_turn_idx + matched_<f>
    for every feature column (typed nulls where no turn is visible).

    ``columns``: restrict which feature columns are attached — every
    selected column crosses the co-partition exchange, so projecting to
    the needed subset is the big serving-path lever (measured in
    BASELINE.md; key/ts/turn_idx always carried)."""
    feats = transcript_features(source, specs, num_partitions)
    if columns is not None:
        keep = ["conv_id", "ts", "turn_idx"] + [
            c for c in columns if c not in ("conv_id", "ts", "turn_idx")
        ]
        feats = feats.select_columns(keep)
    return asof_join(
        feats,
        queries,
        left_key="conv_id",
        left_on="ts",
        tiebreak="turn_idx",
        num_partitions=num_partitions,
        keep_unmatched=keep_unmatched,
    )
