"""Build-once / query-many ANN index artifacts (IVF-flat, PQ, IVFPQ).

The reference's central lifecycle is a persistent search structure that is
built (or appended to) once and then serves many queries:
`visual/datastructures/AbstractSearchStructure.java:229-257` append,
`Linear.java:191-224` / `PQ.java:436-483` / `IVFPQ.java:680-728` load,
`IVFPQ.java:408-450` probe.  Round-1's ANN paths refit the quantizers and
scanned every batch per call; this module persists the learned model plus
the encoded vectors as a **list-partitioned parquet artifact** and prunes
the query-time read to the probed partitions — at scale the probe reads
``probe/n_lists`` of the data instead of all of it.

Artifact layout (``index_dir/``):

- ``manifest.json`` — kind (ivf|pq|ivfpq), n_lists, m, ks, dim, metric,
  column names, segment dirs, per-segment row counts (lineage).
- ``model.npz`` — coarse centroids (n_lists, d) and/or PQ codebooks
  (m, ks, d/m) — the codebook-CSV analog (S8/S9).
- ``data-NNN/list_id=<l>/*.parquet`` — one hive partition per inverted
  list; ``lid`` kept as a data column.  Append jobs add new ``data-NNN``
  segments without rewriting old ones (resumable, reference append
  semantics: already-written segments are never touched).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as papq

import ray
import ray.data

from multimedia_indexing_ray.functions import pq as pqf
from multimedia_indexing_ray.functions.normalize import residual
from multimedia_indexing_ray.stages.knn import (
    _batch_matrix,
    _pack_candidates,
    _unit,
    kmeans_fit,
    topk_merge as _topk_merge,
    topk_rows as _topk_rows,
)

LID = "lid"
CODE = "code"


def _sample_matrix(
    ds: "ray.data.Dataset", vec_col: str, sample_size: int, id_col: Optional[str] = None
) -> np.ndarray:
    """Sample for quantizer learning.

    With ``id_col``: a seeded CONTENT-HASH sample — each row is kept iff
    ``stable_hash(id) < fraction`` — pushed into a distributed filter, so
    the sample is unbiased under ANY data layout.  The reference's prefix
    sample (`ProductQuantizationLearning.java:225-244`, K9) is biased on
    clustered/sorted data (the first blocks see one region of the space);
    kept as the fallback when no id column is available."""
    if id_col is not None:
        from multimedia_indexing_ray.stages.partition import stable_hash

        total = ds.count()
        if not total:
            raise ValueError("cannot build an ANN index from zero vectors")
        # 2x oversample so the hash draw ~never lands under sample_size
        frac = min(1.0, (2.0 * sample_size) / total)
        thresh = np.uint64(min(int(frac * 2**64), 2**64 - 1))

        def _filt(batch: pa.Table) -> pa.Table:
            h = stable_hash(batch[id_col].to_numpy())
            return batch.filter(pa.array(h <= thresh))

        picked = ds.map_batches(_filt, batch_format="pyarrow").take_all()
        if picked:
            t = pa.Table.from_pylist(picked)
            mat = _batch_matrix(t, vec_col)
            # deterministic under any partitioning: order by (hash, id)
            ids = t[id_col].to_numpy()
            h = stable_hash(ids)
            order = np.lexsort((ids, h))[:sample_size]
            return mat[order]
        # pathological hash draw (tiny data): fall through to prefix
    out, tot = [], 0
    for batch in ds.iter_batches(batch_size=min(sample_size, 4096), batch_format="pyarrow"):
        out.append(_batch_matrix(batch, vec_col))
        tot += len(out[-1])
        if tot >= sample_size:
            break
    if not out:
        raise ValueError("cannot build an ANN index from zero vectors")
    return np.concatenate(out)[:sample_size]


def _codes_column(codes: np.ndarray) -> pa.Array:
    """(n, m) int8/int16 codes -> fixed_size_list column (vectorized)."""
    m = codes.shape[1]
    flat = pa.array(codes.reshape(-1))
    return pa.FixedSizeListArray.from_arrays(flat, m)


def _codes_matrix(col: "pa.ChunkedArray") -> np.ndarray:
    col = col.combine_chunks()
    m = col.type.list_size
    return col.flatten().to_numpy(zero_copy_only=False).reshape(-1, m)


class _Encoder:
    """Actor-pool stage: assign list id + (optionally) PQ-encode a batch.

    The model is LOADED FROM the artifact's model.npz in ``__init__``
    (once per actor) rather than passed as a constructor arg: args over
    ~100 KB land in the object store, and object-store constructor args
    make actor restarts unrecoverable if the ref is lost (ray#53727).
    The artifact dir must be on storage every node can read — the same
    assumption the query path's partition-pruned reads already make.
    ST1-ST3 singleton pattern,
    `visual/vectorization/ImageVectorization.java:52-65`."""

    def __init__(self, model_path: str, kind: str, vec_col: str, id_col: str):
        npz = np.load(model_path)
        self.coarse = npz["coarse"] if "coarse" in npz else None
        self.pq_model = (
            pqf.PQModel(centroids=npz["codebooks"]) if "codebooks" in npz else None
        )
        self.kind = kind
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, self.vec_col)
        if self.coarse is not None:
            d = -2.0 * (mat @ self.coarse.T) + (self.coarse**2).sum(axis=1)[None, :]
            lid = d.argmin(axis=1).astype(np.int64)
        else:
            lid = np.zeros(len(mat), dtype=np.int64)
        cols = {
            self.id_col: batch[self.id_col],
            LID: pa.array(lid),
            "list_id": pa.array(lid),
        }
        if self.kind == "ivf":
            cols[self.vec_col] = batch[self.vec_col]
        else:
            src = mat if self.coarse is None else residual(mat, self.coarse, lid)
            cols[CODE] = _codes_column(pqf.pq_encode(src, self.pq_model))
        return pa.table(cols)


def build_ann_index(
    ds: "ray.data.Dataset",
    out_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    kind: str = "ivf",
    n_lists: int = 16,
    m: int = 8,
    ks: int = 64,
    sample_size: int = 2048,
    seed: int = 1,
    concurrency: Optional[int] = None,
) -> dict:
    """Learn the quantizers on a sample, encode the full dataset
    distributed, write the list-partitioned artifact.  Returns the
    manifest dict."""
    if kind not in ("ivf", "pq", "ivfpq"):
        raise ValueError(kind)
    smp = _sample_matrix(ds, vec_col, sample_size, id_col=id_col)
    dim = smp.shape[1]
    coarse = pq_model = None
    if kind in ("ivf", "ivfpq"):
        coarse = kmeans_fit(smp, n_lists, seed)
    if kind == "pq":
        pq_model = pqf.fit_pq(smp, m=m, ks=ks, seed=seed)
        n_lists = 1
    elif kind == "ivfpq":
        d = ((smp[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
        pq_model = pqf.fit_pq(residual(smp, coarse, d.argmin(axis=1)), m=m, ks=ks, seed=seed)

    os.makedirs(out_dir, exist_ok=True)
    model = {}
    if coarse is not None:
        model["coarse"] = coarse
    if pq_model is not None:
        model["codebooks"] = pq_model.centroids
    np.savez(os.path.join(out_dir, "model.npz"), **model)

    manifest = {
        "kind": kind,
        "metric": "cosine" if kind == "ivf" else "l2_adc",
        "n_lists": int(n_lists),
        "m": int(m) if pq_model is not None else None,
        "ks": int(ks) if pq_model is not None else None,
        "dim": int(dim),
        "vec_col": vec_col,
        "id_col": id_col,
        "segments": [],
    }
    return _append_segment(ds, out_dir, manifest, coarse, pq_model, concurrency)


def append_to_index(
    ds: "ray.data.Dataset", index_dir: str, concurrency: Optional[int] = None
) -> dict:
    """Encode new vectors with the SAVED model and add a new data segment —
    the reference's append lifecycle (`AbstractSearchStructure.java:229-257`):
    existing segments are never rewritten."""
    manifest, coarse, pq_model = _load_index(index_dir)
    return _append_segment(ds, index_dir, manifest, coarse, pq_model, concurrency)


def _append_segment(ds, out_dir, manifest, coarse, pq_model, concurrency) -> dict:
    # exclusive writer lock: two concurrent builders/appenders would both
    # pick the same data-NNN segment and double-count each other's files
    # (the atomic manifest rename only protects against crashes)
    lock = os.path.join(out_dir, ".build_lock")

    def _try_acquire():
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.write(fd, str(os.getpid()).encode())
        return fd

    try:
        fd = _try_acquire()
    except FileExistsError:
        # a SIGKILL/OOM during a build would otherwise leave the lock
        # forever; reclaim it when the recorded owner PID is dead
        try:
            owner = int(open(lock).read().strip() or "0")
        except (OSError, ValueError):
            owner = 0
        if owner and _pid_alive(owner):
            raise RuntimeError(
                f"index build/append already in progress on {out_dir} "
                f"(held by live pid {owner}; lock file {lock})"
            )
        # reclaim via atomic RENAME, not unlink: with unlink, two
        # processes that both saw the dead owner could each unlink (the
        # second deleting the first's freshly-created lock) and both
        # enter the critical section.  rename makes exactly one
        # reclaimer win — the loser's rename raises FileNotFoundError.
        # NOTE: pid liveness is host-local; the lock protocol assumes a
        # single writer HOST per artifact dir (writers on other nodes of
        # a shared filesystem look dead — route appends through one
        # node, as the reference routes through one BDB writer).
        try:
            os.rename(lock, f"{lock}.stale-{os.getpid()}")
            os.unlink(f"{lock}.stale-{os.getpid()}")
            fd = _try_acquire()
        except (FileNotFoundError, FileExistsError):
            raise RuntimeError(
                f"index build/append lock on {out_dir} contended during "
                f"stale-lock reclaim; retry ({lock})"
            )
    try:
        return _append_segment_locked(ds, out_dir, manifest, coarse, pq_model, concurrency)
    finally:
        os.close(fd)
        os.unlink(lock)


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def _append_segment_locked(ds, out_dir, manifest, coarse, pq_model, concurrency) -> dict:
    import shutil

    seg = f"data-{len(manifest['segments']):03d}"
    seg_dir = os.path.join(out_dir, seg)
    # a crashed earlier attempt may have left a partial segment dir the
    # manifest never committed; stale files would be double-counted and
    # double-served (write_parquet appends UUID-named files)
    if os.path.exists(seg_dir):
        shutil.rmtree(seg_dir)
    enc = ds.map_batches(
        _Encoder,
        fn_constructor_args=(
            os.path.join(out_dir, "model.npz"),
            manifest["kind"],
            manifest["vec_col"],
            manifest["id_col"],
        ),
        batch_format="pyarrow",
        # autoscaling pool: a FIXED pool the size of the cluster would
        # pin every CPU on idle actors and starve the read/write tasks
        concurrency=concurrency or (1, 4),
        # the package is registered pickle-by-value, so the actor's
        # constructor payload always exceeds Ray's inline cap and lands in
        # the object store; with max_restarts > 0 a lost payload makes
        # restarts unrecoverable (ray#53727).  State rebuilds from
        # model.npz anyway, so let the pool replace dead actors instead.
        max_restarts=0,
    )
    enc.write_parquet(seg_dir, partition_cols=["list_id"])
    n_rows = sum(
        papq.read_metadata(os.path.join(root, f)).num_rows
        for root, _, files in os.walk(seg_dir)
        for f in files
        if f.endswith(".parquet")
    )
    manifest["segments"] = manifest["segments"] + [{"dir": seg, "rows": int(n_rows)}]
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))  # atomic commit
    return manifest


def _load_index(index_dir: str):
    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    npz = np.load(os.path.join(index_dir, "model.npz"))
    coarse = npz["coarse"] if "coarse" in npz else None
    pq_model = pqf.PQModel(centroids=npz["codebooks"]) if "codebooks" in npz else None
    return manifest, coarse, pq_model


def index_stats(index_dir: str) -> dict:
    """Per-list occupancy min/max/avg — the reference's inverted-list
    stats (`visual/datastructures/IVFPQ.java:654-673`)."""
    manifest, _, _ = _load_index(index_dir)
    counts = np.zeros(manifest["n_lists"], dtype=np.int64)
    for seg in manifest["segments"]:
        seg_dir = os.path.join(index_dir, seg["dir"])
        for entry in os.listdir(seg_dir):
            if not entry.startswith("list_id="):
                continue
            lid = int(entry.split("=", 1)[1])
            d = os.path.join(seg_dir, entry)
            counts[lid] += sum(
                papq.read_metadata(os.path.join(d, f)).num_rows
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )
    return {
        "n_vectors": int(counts.sum()),
        "min_list": int(counts.min()),
        "max_list": int(counts.max()),
        "avg_list": float(counts.mean()),
    }


def reindex(
    index_dir_in: str,
    index_dir_out: str,
    kind: str,
    n_lists: int = 16,
    m: int = 8,
    ks: int = 256,
    sample_size: int = 2048,
    seed: int = 1,
) -> dict:
    """Re-encode an existing IVF-FLAT artifact (which stores raw vectors)
    into another index kind — the `IndexTransformation.main` chain
    (`visual/examples/IndexTransformation.java:61-125`: Linear ->
    small/PQ/IVFPQ) without touching the original source data."""
    manifest, _, _ = _load_index(index_dir_in)
    if manifest["kind"] != "ivf":
        raise ValueError("reindex source must be an ivf (raw-vector) index")
    paths = _probed_paths(index_dir_in, manifest, range(manifest["n_lists"]))
    ds = ray.data.read_parquet(paths, columns=[manifest["id_col"], manifest["vec_col"]])
    return build_ann_index(
        ds,
        index_dir_out,
        vec_col=manifest["vec_col"],
        id_col=manifest["id_col"],
        kind=kind,
        n_lists=n_lists,
        m=m,
        ks=ks,
        sample_size=sample_size,
        seed=seed,
    )


def dump_index(index_dir: str, out_path: str, limit: Optional[int] = None) -> int:
    """Export the index records to CSV for inspection — the S11 dump
    analog (`Linear.java:300-313` toCSV / `IVFPQ.java:738-752`
    dumpIidToIvfpqDB).  Codes/vectors are rendered as
    space-separated ints/floats.  Returns rows written."""
    manifest, _, _ = _load_index(index_dir)
    id_col = manifest["id_col"]
    payload = manifest["vec_col"] if manifest["kind"] == "ivf" else CODE
    written = 0
    with open(out_path, "w") as f:
        f.write(f"{id_col},list_id,{payload}\n")
        for seg in manifest["segments"]:
            for p in _probed_paths(index_dir, {"segments": [seg]}, range(manifest["n_lists"])):
                t = papq.read_table(p, columns=[id_col, LID, payload])
                ids = t[id_col].to_numpy()
                lids = t[LID].to_numpy()
                rows = t[payload].to_pylist()  # list or fixed_size_list
                for i in range(t.num_rows):
                    f.write(f"{ids[i]},{lids[i]},{' '.join(map(str, rows[i]))}\n")
                    written += 1
                    if limit is not None and written >= limit:
                        return written
    return written


def _probed_paths(index_dir: str, manifest: dict, lists) -> "list[str]":
    paths = []
    for seg in manifest["segments"]:
        for l in lists:
            p = os.path.join(index_dir, seg["dir"], f"list_id={int(l)}")
            if os.path.isdir(p):
                paths.extend(
                    os.path.join(p, f)
                    for f in sorted(os.listdir(p))
                    if f.endswith(".parquet")
                )
    return paths


def _empty_result() -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        }
    )


def ann_search(
    index_dir: str,
    queries: "Tuple[np.ndarray, np.ndarray]",
    k: int = 5,
    probe: Optional[int] = None,
    exclude_self: bool = True,
):
    """Top-k search against a prebuilt index, reading ONLY the probed list
    partitions (`IVFPQ.java:408-450` probe: w nearest lists per query).
    ``probe=n_lists`` scans everything — for the IVF-flat kind that equals
    the exact Linear scan and is oracle-checkable against exact kNN.

    Output: (query_id, neighbor_id, rank) — identical contract (and tie
    rule) to ``brute_force_knn``."""
    manifest, coarse, pq_model = _load_index(index_dir)
    kind = manifest["kind"]
    q_ids = np.asarray(queries[0], dtype=np.int64)
    q_mat = np.asarray(queries[1], dtype=np.float64)

    n_lists = manifest["n_lists"]
    if coarse is not None:
        if probe is None:
            probe = max(1, n_lists // 10)  # IVFPQ.java:188 default w
        probe = min(probe, n_lists)
        qd = ((q_mat[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
        probed = np.argsort(qd, axis=1)[:, :probe]  # (nq, probe)
        # (nq, n_lists) membership — one row gather per batch replaces the
        # old per-query np.isin rescan of every batch
        pmask = np.zeros((len(q_ids), n_lists), dtype=bool)
        np.put_along_axis(pmask, probed, True, axis=1)
        union = sorted(set(int(v) for v in probed.ravel()))
    else:
        probed = pmask = None
        union = [0]

    paths = _probed_paths(index_dir, manifest, union)
    if not paths:
        return ray.data.from_arrow(_empty_result())
    ds = ray.data.read_parquet(paths)
    id_col = manifest["id_col"]

    if kind == "ivf":
        ref = ray.put((q_ids, _unit(q_mat), pmask))
        vec_col = manifest["vec_col"]

        def _partial(batch: pa.Table) -> pa.Table:
            qi, qmu, pm = ray.get(ref)
            mat = _unit(_batch_matrix(batch, vec_col))
            ids = batch[id_col].to_numpy()
            lids = batch[LID].to_numpy()
            key = -(qmu @ mat.T)  # smaller = better
            if pm is not None:
                key[~pm[:, lids]] = np.inf
            if exclude_self:
                key[qi[:, None] == ids[None, :]] = np.inf
            out_q, out_n, out_s = _topk_rows(qi, ids, key, k)
            return _pack_candidates(out_q, out_n, out_s, "cos_sim", negate=True)

        candidates = ds.map_batches(_partial, batch_format="pyarrow")
        return _topk_merge(candidates, k, "cos_sim", ascending=False)

    # pq: ADC over stored codes — the whole query batch in one gather pass
    if kind == "pq":
        tabs = np.stack([pqf.adc_table(q, pq_model) for q in q_mat])  # (nq, m, ks)
        ref = ray.put((q_ids, tabs, pq_model.ks))

        def _partial(batch: pa.Table) -> pa.Table:
            qi, tb, ks = ray.get(ref)
            codes = _codes_matrix(batch[CODE])
            ids = batch[id_col].to_numpy()
            key = pqf.adc_distances_multi(codes, tb, ks)  # (nq, n)
            if exclude_self:
                key[qi[:, None] == ids[None, :]] = np.inf
            return _pack_candidates(*_topk_rows(qi, ids, key, k), "adc_dist")

        candidates = ds.map_batches(_partial, batch_format="pyarrow")
        return _topk_merge(candidates, k, "adc_dist", ascending=True)

    # ivfpq: residual tables per (query, probed list), IVFPQ.java:408-450.
    # wpos[q, l] = position of list l in query q's probe order (-1 = not
    # probed): the batch is processed per PRESENT LIST with all of that
    # list's queries at once, not per query over the whole batch.
    tabs = np.stack(
        [
            np.stack([pqf.adc_table(coarse[lst] - q, pq_model) for lst in probed[i]])
            for i, q in enumerate(q_mat)
        ]
    )  # (nq, probe, m, ks)
    wpos = np.full((len(q_ids), n_lists), -1, dtype=np.int64)
    np.put_along_axis(wpos, probed, np.arange(probed.shape[1])[None, :], axis=1)
    ref = ray.put((q_ids, wpos, tabs, pq_model.ks))

    def _partial(batch: pa.Table) -> pa.Table:
        qi, wp, tb, ks = ray.get(ref)
        codes = _codes_matrix(batch[CODE])
        ids = batch[id_col].to_numpy()
        lids = batch[LID].to_numpy()
        nq = len(qi)
        # group batch rows by list once (sorted slices)
        order = np.argsort(lids, kind="stable")
        lid_sorted = lids[order]
        starts = np.flatnonzero(np.concatenate([[True], lid_sorted[1:] != lid_sorted[:-1]]))
        ends = np.concatenate([starts[1:], [len(lid_sorted)]])
        key = np.full((nq, len(ids)), np.inf)
        for s, e in zip(starts, ends):
            lst = int(lid_sorted[s])
            rows = order[s:e]
            qs = np.flatnonzero(wp[:, lst] >= 0)  # queries probing this list
            if len(qs) == 0:
                continue
            sub = pqf.adc_distances_multi(codes[rows], tb[qs, wp[qs, lst]], ks)
            key[np.ix_(qs, rows)] = sub
        if exclude_self:
            key[qi[:, None] == ids[None, :]] = np.inf
        return _pack_candidates(*_topk_rows(qi, ids, key, k), "adc_dist")

    candidates = ds.map_batches(_partial, batch_format="pyarrow")
    return _topk_merge(candidates, k, "adc_dist", ascending=True)


