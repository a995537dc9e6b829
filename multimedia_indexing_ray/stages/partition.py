"""Explicit conversation partitioning — the engine's ONE mandatory shuffle.

The reference routes vectors to inverted lists via nearest-coarse-centroid
assignment (`visual/datastructures/IVFPQ.java:315,547-601`) — its
partitioner.  Here the partitioner is a stable hash of the entity key
(``conv_id``) into ``num_partitions`` buckets; every downstream window /
session / as-of kernel relies on the invariant that ALL rows of a
conversation land in the same partition group.

Hashing uses ``pandas.util.hash_array`` (SipHash-1-3 with a fixed key) —
stable across processes, platforms and runs, so partition assignment (and
therefore checkpoint manifests) are reproducible.

Two shuffle strategies:
- "sort" (default): ``groupby(part).map_groups`` — Ray Data's
  sort-based pull shuffle; no extra actors, good for repeated small jobs.
- "hash": ``Dataset.repartition(num_partitions, keys=[part])`` with
  ``DataContext.shuffle_strategy=HASH_SHUFFLE`` — streaming hash shuffle,
  preferred for very large inputs (enable on the session's DataContext
  before building the pipeline).
"""

from __future__ import annotations

import logging
from typing import Callable, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

logger = logging.getLogger(__name__)

PART_COL = "__part"
DEFAULT_NUM_PARTITIONS = 64
# A partition group is held as ONE Arrow table in one worker; warn when a
# group's bytes approach a worker-heap-sized fraction so the operator
# (num_partitions) can be resized BEFORE an OOM at larger scale.
PARTITION_BYTES_WARN = 2 * 1024**3


def stable_hash(values: np.ndarray) -> np.ndarray:
    """Stable (cross-process) uint64 hash of a key array."""
    return pd.util.hash_array(np.asarray(values), categorize=False)


def partition_ids(keys: np.ndarray, num_partitions: int) -> np.ndarray:
    return (stable_hash(keys) % np.uint64(num_partitions)).astype(np.int32)


def multi_key_partition_ids(
    batch: pa.Table, keys: "list[str]", num_partitions: int
) -> np.ndarray:
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for k in keys:
        h = h * np.uint64(1000003) ^ stable_hash(batch[k].to_numpy(zero_copy_only=False))
    return (h % np.uint64(num_partitions)).astype(np.int32)


def add_partition_column(
    ds: "ray.data.Dataset",
    key,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> "ray.data.Dataset":
    keys = [key] if isinstance(key, str) else list(key)

    def _add(batch: pa.Table) -> pa.Table:
        # strip schema metadata before the exchange: the source parquet
        # files carry a pandas metadata dict, which is unhashable and
        # defeats Ray's shuffle schema dedup (one warning per reduce task)
        return batch.replace_schema_metadata(None).append_column(
            PART_COL, pa.array(multi_key_partition_ids(batch, keys, num_partitions))
        )

    return ds.map_batches(_add, batch_format="pyarrow")


def map_partitions_by_key(
    ds: "ray.data.Dataset",
    key: str,
    fn: Callable[[pa.Table], pa.Table],
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    strategy: str = "sort",
    ray_remote_args: Optional[dict] = None,
) -> "ray.data.Dataset":
    """Shuffle so all rows sharing `key` are in one group, then apply `fn`
    to each whole partition group as a single Arrow table.

    `fn` receives the partition WITHOUT the internal part column and must
    return an Arrow table (schema consistent across partitions).
    """

    def _apply(table: pa.Table) -> pa.Table:
        if table.nbytes > PARTITION_BYTES_WARN:
            logger.warning(
                "partition group holds %.1f GiB in one worker (key=%s); "
                "raise num_partitions (now %d) to bound per-group memory",
                table.nbytes / 1024**3, key, num_partitions,
            )
        return fn(table.drop_columns([PART_COL]))

    with_part = add_partition_column(ds, key, num_partitions)
    if strategy == "hash":
        co = with_part.repartition(num_partitions, keys=[PART_COL])
        return co.map_batches(
            _apply, batch_format="pyarrow", batch_size=None, **(ray_remote_args or {})
        )
    return with_part.groupby(PART_COL).map_groups(
        _apply, batch_format="pyarrow", **(ray_remote_args or {})
    )
