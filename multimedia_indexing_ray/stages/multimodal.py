"""Multimodal column plumbing: opaque binary payloads + typed metadata.

This is the engine's mapping of the reference's image path — download,
tolerant decode, rescale, feature-extract
(`visual/download/ImageDownload.java:152-260`,
`visual/utilities/ImageIOGreyScale.java` fallback,
`visual/extraction/ImageScaling.java:96-155`,
`visual/extraction/SURFExtractor.java:44-59`) — onto Ray Data:

- media rows are ``(media_id, payload: binary, media_type, width/height/
  duration metadata)``;
- decode / resize / frame-sample are ACTOR-POOL ``map_batches`` stages
  with state built once per actor (ST1 singleton analog);
- the actual codec calls are STUBBED: the container ships no image/audio
  libraries, so ``codec="real"`` raises NotImplementedError at the exact
  integration point, and ``codec="fake"`` is a deterministic stand-in
  (seeded by content hash) keeping every schema/batch/actor contract real
  and testable;
- failures never crash the batch: bad payloads are routed to an error
  side-channel column (``decode_error``), mirroring the reference's
  count-and-skip policy (`visual/examples/UrlIndexingMT.java:154-191`).
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string(), nullable=False),
        pa.field("media_type", pa.string(), nullable=False),  # image|audio|video
        pa.field("payload", pa.binary(), nullable=False),
        pa.field("meta_width", pa.int32(), nullable=True),
        pa.field("meta_height", pa.int32(), nullable=True),
        pa.field("meta_duration_s", pa.float32(), nullable=True),
    ]
)


def _stable_seed(payload: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")


class MediaDecoder:
    """Actor-pool decode stage.

    codec="real" is the integration point for PIL/libav — unavailable in
    this container, so it raises NotImplementedError (clearly marked
    stub).  codec="fake" emits a deterministic (seeded) small raster so
    the downstream plumbing is fully exercised."""

    def __init__(self, codec: str = "fake", target_pixels: int = 64 * 64):
        if codec not in ("fake", "real"):
            raise ValueError(codec)
        self.codec = codec
        self.target_pixels = target_pixels

    def _decode_one(self, payload: bytes, media_type: str) -> Optional[np.ndarray]:
        if self.codec == "real":
            raise NotImplementedError(
                "real media decode requires PIL/libav — not available in this "
                "container; use codec='fake' (deterministic stand-in)"
            )
        if len(payload) == 0:
            return None  # malformed -> error side-channel
        rng = np.random.default_rng(_stable_seed(payload))
        side = int(np.sqrt(self.target_pixels))
        return rng.random((side, side), dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        types = batch["media_type"].to_pylist()
        pixels, errors = [], []
        side = int(np.sqrt(self.target_pixels))
        for p, t in zip(payloads, types):
            arr = self._decode_one(p, t)
            if arr is None:
                pixels.append(np.zeros(side * side, dtype=np.float32))
                errors.append("decode_failed:empty_payload")
            else:
                pixels.append(arr.reshape(-1))
                errors.append(None)
        mat = np.stack(pixels)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1), pa.float32()), side * side
        )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "pixels": col,
                "decode_error": pa.array(errors, pa.string()),
            }
        )


class MediaFeaturizer:
    """Actor-pool feature extraction over decoded rasters — the SURF/VLAD
    slot.  Computes simple deterministic pooled statistics per tile grid
    (a stand-in feature with a real fixed-dimension contract)."""

    def __init__(self, grid: int = 4):
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["pixels"].combine_chunks()
        dim = col.type.list_size
        side = int(np.sqrt(dim))
        mat = col.flatten().to_numpy(zero_copy_only=False).reshape(-1, side, side)
        g = self.grid
        tile = side // g
        # mean + std per tile -> 2*g*g dims, vectorized over the batch
        tiles = mat[:, : g * tile, : g * tile].reshape(-1, g, tile, g, tile)
        means = tiles.mean(axis=(2, 4)).reshape(len(mat), -1)
        stds = tiles.std(axis=(2, 4)).reshape(len(mat), -1)
        feats = np.concatenate([means, stds], axis=1).astype(np.float64)
        out = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), pa.float64()), feats.shape[1]
        )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": out,
                "decode_error": batch["decode_error"],
            }
        )


def decode_and_featurize(
    ds: "ray.data.Dataset",
    codec: str = "fake",
    concurrency: int = 4,
    batch_size: int = 64,
) -> "ray.data.Dataset":
    """media table -> (media_id, features, decode_error).

    Small batch_size: binary payloads are wide rows — batch x concurrency
    must fit the worker heap (SURVEY.md memory-aware sizing)."""
    decoded = ds.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"codec": codec},
    )
    return decoded.map_batches(
        MediaFeaturizer, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


def synthetic_media_table(n: int = 32, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for tests/benches (binary payloads)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        payload = rng.bytes(256) if i % 7 != 3 else b""  # planted malformed rows
        rows.append(
            {
                "media_id": f"m-{i:04d}",
                "media_type": ["image", "audio", "video"][i % 3],
                "payload": payload,
                "meta_width": 640,
                "meta_height": 480,
                "meta_duration_s": None if i % 3 == 0 else 12.5,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
