"""multimedia_indexing_ray — a Ray-Data-native feature-engineering engine.

A from-scratch engine with the query/data-processing capabilities of
MKLab-ITI/multimedia-indexing (reference at /root/reference), re-expressed
over Parquet tables of multi-turn conversation transcripts
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])``:

- point-in-time correct as-of join keyed ``(conv_id, ts)``
  (gallop/searchsorted cursor; the reference's nearest-neighbour "join"
  analog, see SURVEY.md §2.4),
- lag/lead, inactivity-gap sessionization, backfill,
- role/tool-conditioned tumbling and sliding windows producing a
  fixed-dimension feature vector per (conv_id, ts) — the VLAD aggregation
  analog (reference ``visual/aggregation/VladAggregator.java:35-70``),
- normalization conventions replicated from the reference
  (``visual/utilities/Normalization.java``),
- exact + approximate dedup, brute-force / bucketed similarity search,
  text analysis, multimodal plumbing — the large-scale training-data ops.

Everything runs as ``ray.data.Dataset`` pipelines: ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages, one explicit
hash-partition shuffle on ``conv_id`` (plus salted splitting for hot
conversations), streaming execution end-to-end.

IMPORTANT: nothing in this package calls ``ray.init()`` / ``ray.shutdown()``
— the driver owns the Ray session.
"""

__version__ = "0.1.0"


def _enable_worker_shipping() -> None:
    """Ship this package's code by value inside task closures.

    Ray workers are separate processes that may not have this repo on
    sys.path (the driver owns ray.init and we may not control
    runtime_env).  Registering the package with cloudpickle's
    pickle-by-value makes every stage callable self-contained — the
    Ray-native analog of the reference shipping its learning artifacts to
    every node via DistributedCache (visual/mapreduce/VisualJob.java:56-62).
    """
    try:
        import sys

        from ray import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:  # pragma: no cover - best effort; import paths may still work
        pass


_enable_worker_shipping()

from multimedia_indexing_ray.specs import (  # noqa: E402,F401
    DEFAULT_SPECS,
    FeatureSpecs,
    feature_names,
)
