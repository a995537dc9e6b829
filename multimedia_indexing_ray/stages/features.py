"""Transcript feature stages: pre-featurize → shuffle → window kernel.

Pipeline shape (SURVEY.md §7.1; FolderIndexingMT.java:48-168 Ray analog):

    read_parquet(transcripts)
      -> prefeaturize (stateless map_batches, Arrow zero-copy; computes
         per-turn scalars and DROPS the heavy text column before the
         shuffle — column pruning at the exchange)
      -> map_partitions_by_key(conv_id)  [the one mandatory shuffle]
      -> WindowKernelFn (sort within partition by (conv_id, ts, turn_idx),
         run the vectorized window/session/lag kernel)

The output has one row per input turn: keys (conv_id, turn_idx, ts),
feature columns in spec order (float64), and lead label columns.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from multimedia_indexing_ray.functions.turns import base_turn_features
from multimedia_indexing_ray.functions.window_kernel import compute_window_features
from multimedia_indexing_ray.specs import DEFAULT_SPECS, FeatureSpecs
from multimedia_indexing_ray.stages.partition import (
    DEFAULT_NUM_PARTITIONS,
    map_partitions_by_key,
)

SORT_KEYS = [("conv_id", "ascending"), ("ts", "ascending"), ("turn_idx", "ascending")]
BASE_PRE_COLS = (
    "text_len",
    "n_tokens",
    "is_user",
    "is_assistant",
    "is_system",
    "is_tool_role",
    "has_tool",
)


def prefeaturize(batch: pa.Table, include_text: bool = False) -> pa.Table:
    """Compute per-turn base features; drop text/role/tool before shuffle."""
    feats = base_turn_features(batch)
    cols = {
        "conv_id": batch["conv_id"],
        "turn_idx": batch["turn_idx"],
        "ts": batch["ts"],
    }
    if include_text:
        cols["text"] = batch["text"]
    for name in BASE_PRE_COLS:
        cols[name] = pa.array(feats[name], pa.float64())
    return pa.table(cols)


class WindowKernelFn:
    """Per-partition window kernel (stateless; spec registry compiled once).

    The spec registry is the codebook analog — loaded once per worker
    (`visual/vectorization/ImageVectorizer.java:101-112`), applied per
    batch.
    """

    def __init__(
        self,
        specs: FeatureSpecs = DEFAULT_SPECS,
        include_text: bool = False,
        pack_vector: bool = False,
    ):
        self.specs = specs
        self.include_text = include_text
        self.pack_vector = pack_vector
        self.feature_cols = specs.feature_columns()
        self.lead_cols = specs.lead_columns()

    def __call__(self, table: pa.Table) -> pa.Table:
        idx = pc.sort_indices(table, sort_keys=SORT_KEYS)
        t = table.take(idx)
        codes = pc.dictionary_encode(t["conv_id"].combine_chunks()).indices.to_numpy()
        ts_us = t["ts"].cast(pa.int64()).to_numpy()
        feats = {name: t[name].to_numpy() for name in BASE_PRE_COLS}
        out = compute_window_features(codes, ts_us, feats, self.specs)

        cols = {
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "ts": t["ts"],
        }
        if self.include_text and "text" in t.column_names:
            cols["text"] = t["text"]
        if self.pack_vector:
            mat = np.stack([out[c] for c in self.feature_cols], axis=1)
            cols["features"] = pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.float64()), mat.shape[1]
            )
        else:
            for c in self.feature_cols:
                cols[c] = pa.array(out[c], pa.float64())
        for c in self.lead_cols:
            cols[c] = pa.array(out[c], pa.float64())
        return pa.table(cols)


def compute_features(
    ds: "ray.data.Dataset",
    specs: FeatureSpecs = DEFAULT_SPECS,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    include_text: bool = False,
    pack_vector: bool = False,
    shuffle_strategy: str = "sort",
) -> "ray.data.Dataset":
    """Full transcript feature pipeline over a transcript Dataset."""
    pre = ds.map_batches(
        lambda b: prefeaturize(b, include_text), batch_format="pyarrow"
    )
    kernel = WindowKernelFn(specs, include_text, pack_vector)
    return map_partitions_by_key(
        pre, "conv_id", kernel, num_partitions=num_partitions, strategy=shuffle_strategy
    )
