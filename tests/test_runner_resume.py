"""Checkpoint/resume: kill after k partitions -> rerun -> identical output
(SURVEY.md §5 property test #3)."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pytest

from multimedia_indexing_ray.pipelines.runner import completed_partitions, run_feature_job

KEYS = ["conv_id", "ts", "turn_idx"]


def _collect(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    return df.sort_values(KEYS, kind="mergesort").reset_index(drop=True)


def test_kill_and_resume_identical(ray_session, smoke_dir, tmp_path):
    clean = str(tmp_path / "clean")
    summary = run_feature_job(smoke_dir, clean, num_partitions=8)
    assert summary["partitions_processed"] >= 1
    expected = _collect(clean)

    # run with injected faults -> job fails part-way; committed partitions
    # stay on disk with manifests
    broken = str(tmp_path / "resume")
    with pytest.raises(Exception):
        run_feature_job(smoke_dir, broken, num_partitions=8, fault_pids=[1, 3])
    done_before = completed_partitions(broken)
    assert 0 < len(done_before) < 8  # some committed, some not

    # resume without faults: only the remaining NON-EMPTY partitions run
    # (a hash bucket with no conversations produces no group/manifest)
    import pyarrow.parquet as pq

    from multimedia_indexing_ray.stages.partition import partition_ids

    conv = pd.concat(
        [pd.read_parquet(f, columns=["conv_id"]) for f in glob.glob(os.path.join(smoke_dir, "*.parquet"))]
    )["conv_id"].to_numpy()
    nonempty = set(partition_ids(conv, 8).tolist())
    summary2 = run_feature_job(smoke_dir, broken, num_partitions=8)
    assert summary2["partitions_done_previously"] == len(done_before)
    assert summary2["partitions_processed"] == len(nonempty) - len(done_before)

    resumed = _collect(broken)
    pd.testing.assert_frame_equal(expected, resumed)


def test_manifest_lineage_and_metrics(ray_session, smoke_dir, tmp_path):
    out = str(tmp_path / "m")
    run_feature_job(smoke_dir, out, num_partitions=4)
    manifests = sorted(glob.glob(os.path.join(out, "_manifests", "part-*.json")))
    assert 1 <= len(manifests) <= 4  # empty hash buckets write no manifest
    m = json.load(open(manifests[0]))
    assert m["rows_in"] == m["rows_out"] > 0
    assert m["wall_sec"] > 0 and m["rows_per_sec"] > 0
    assert all(s.endswith(".parquet") for s in m["source_files"])
    assert len(m["source_files"]) >= 1  # lineage: contributing input files


def test_noop_resume(ray_session, smoke_dir, tmp_path):
    out = str(tmp_path / "n")
    s1 = run_feature_job(smoke_dir, out, num_partitions=4)
    s2 = run_feature_job(smoke_dir, out, num_partitions=4)
    assert s2["partitions_processed"] == 0
    assert s2["partitions_done_previously"] == s1["partitions_processed"]


def test_resume_rejects_changed_num_partitions(ray_session, smoke_dir, tmp_path):
    """Resuming with a different partition modulus would silently skip
    rows; the runner must refuse."""
    out = str(tmp_path / "p")
    run_feature_job(smoke_dir, out, num_partitions=4)
    with pytest.raises(ValueError, match="num_partitions"):
        run_feature_job(smoke_dir, out, num_partitions=8)
