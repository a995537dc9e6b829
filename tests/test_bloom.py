"""Bloom-filter semi-join stage: membership guarantees + determinism."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def _mk(ids):
    return rd.from_arrow(pa.table({"k": pa.array(ids, pa.int64())}))


def test_bloom_no_false_negatives_and_deterministic(ray_session):
    from multimedia_indexing_ray.pipelines.queries import _fnv1a32
    from multimedia_indexing_ray.stages.join import bloom_filter, build_bloom

    build_ids = np.arange(0, 400, 2)  # even ids
    probe_ids = np.arange(0, 4000)

    words = build_bloom(_mk(build_ids), "k", _fnv1a32, n_bits=1024)
    kept = bloom_filter(_mk(probe_ids), "k", _fnv1a32, words, n_bits=1024).to_pandas()
    kept_set = set(kept["k"])

    # every true member survives (no false negatives, the hard guarantee)
    assert set(build_ids) <= kept_set
    # at this load factor (400 keys x 2 bits in 1024) some non-members
    # slip through — false positives exist and are part of the contract
    fps = kept_set - set(build_ids)
    assert fps, "expected deterministic false positives at this density"

    # partition invariance: build from a differently-sharded dataset
    words2 = build_bloom(
        _mk(build_ids).repartition(7), "k", _fnv1a32, n_bits=1024
    )
    assert np.array_equal(words, words2)
    kept2 = bloom_filter(
        _mk(probe_ids).repartition(5), "k", _fnv1a32, words2, n_bits=1024
    ).to_pandas()
    assert set(kept2["k"]) == kept_set
