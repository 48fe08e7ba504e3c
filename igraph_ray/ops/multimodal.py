"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment): ``DecodeImage`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (bytes → shape
+ checksum-derived features) exercises the real Ray-side plumbing —
schema, actor signature, batch sizing, output layout — which is the part
that has to be right at scale.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def make_fake_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": [], "kind": [], "payload": [], "mime": [],
        "width": [], "height": [], "duration_ms": [],
    }
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, rng.integers(64, 512), dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        rows["width"].append(64 if kind != "audio" else 0)
        rows["height"].append(64 if kind != "audio" else 0)
        rows["duration_ms"].append(0 if kind == "image" else 5000)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeImage:
    """Actor-pool stage: decode + feature-extract an image binary column.

    Real decode requires PIL/cv2 (absent here). With ``fake=True`` the
    stage derives a deterministic 8-dim feature vector from the payload
    digest — same shapes, batch flow and output schema as the real thing.
    Use small batch_size for large payloads (batch × concurrency must fit
    the worker heap).
    """

    def __init__(self, fake: bool = False, feature_dim: int = 8) -> None:
        self.fake = fake
        self.feature_dim = feature_dim
        if not fake:
            raise NotImplementedError(
                "image decode requires PIL/cv2, not available in this build; "
                "construct with fake=True for the deterministic test decoder"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            h = hashlib.sha256(payload).digest()
            v = np.frombuffer(h[: self.feature_dim * 4], dtype=np.uint32).astype(np.float32)
            v = v / np.float32(2**32)
            feats.append(v.tolist())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.array(feats, pa.list_(pa.float32())),
                "n_bytes": pa.array(
                    [len(p) for p in batch["payload"].to_pylist()], pa.int64()
                ),
            }
        )


class FrameSampler:
    """Actor-pool stage: sample N frame offsets per video (metadata-only
    computation is real; pixel extraction is the stubbed part)."""

    def __init__(self, frames: int = 4) -> None:
        self.frames = frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, offs = [], []
        for mid, kind, dur in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            if kind != "video" or dur <= 0:
                continue
            for f in range(self.frames):
                ids.append(mid)
                offs.append(int(dur * (f + 0.5) / self.frames))
        return pa.table(
            {"media_id": pa.array(ids, pa.int64()),
             "frame_offset_ms": pa.array(offs, pa.int32())}
        )


def decode_images(
    media: ray.data.Dataset,
    fake: bool = True,
    concurrency: int = 2,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """The canonical multimodal stage shape: actor pool, small batches,
    binary in → features out."""
    return media.filter(expr="kind == 'image'").map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ResizeImage:
    """Actor-pool stage: resize an image binary column to (width, height).

    The real kernel needs PIL/cv2 (absent in this build) — with
    ``fake=True`` the stage emits a deterministic stand-in payload
    (sha256 keystream of the source payload, one byte per target pixel)
    so the Ray-side plumbing is fully real: actor construction cost paid
    once, small batches for large binaries, metadata columns updated for
    real, output schema identical to the real resizer's.
    """

    def __init__(self, width: int = 32, height: int = 32,
                 fake: bool = False) -> None:
        self.width = width
        self.height = height
        if not fake:
            raise NotImplementedError(
                "image resize requires PIL/cv2, not available in this "
                "build; construct with fake=True for the deterministic "
                "stand-in kernel"
            )

    def _fake_resize(self, payload: bytes) -> bytes:
        n = self.width * self.height
        out = bytearray()
        seed = hashlib.sha256(payload).digest()
        block = seed
        while len(out) < n:
            out.extend(block)
            block = hashlib.sha256(block).digest()
        return bytes(out[:n])

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [self._fake_resize(p) for p in batch["payload"].to_pylist()]
        k = batch.num_rows
        return pa.table(
            {"media_id": batch["media_id"],
             "payload": pa.array(payloads, pa.binary()),
             "width": pa.array([self.width] * k, pa.int64()),
             "height": pa.array([self.height] * k, pa.int64())}
        )


def resize_images(
    media: ray.data.Dataset,
    width: int = 32,
    height: int = 32,
    fake: bool = True,
    concurrency: int = 2,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Actor-pool resize over the image rows (binary in → binary out,
    metadata updated; kernel stubbed per the build's no-PIL mandate)."""
    return media.filter(expr="kind == 'image'").map_batches(
        ResizeImage,
        fn_constructor_kwargs={"width": width, "height": height, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
