"""Multimodal column plumbing (decode/feature stages for binary payloads).

Images/audio/video are opaque ``binary`` columns with typed metadata
columns alongside. The Ray-side plumbing — schema, actor-pool stage
shape, batch sizing, output layout — is real and tested; the actual
codec work is STUBBED (this container has no image/audio libraries):
``DecodeImage`` raises ``NotImplementedError`` in strict mode or emits a
deterministic fake feature vector derived from the payload hash, so
pipelines exercise realistic data movement end-to-end.

Usage shape (the actor pool pattern for heavy decode stages):

    ds.map_batches(DecodeImage, fn_constructor_kwargs={"fake": True},
                   batch_size=64,            # small: payloads are large
                   concurrency=8, num_cpus=1, batch_format="pyarrow")
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),            # -1 when unknown / not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])

FEATURE_DIM = 64


def make_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media rows (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(200, 2000)),
                               dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind])
        rows["width"].append(64 if kind != "audio" else -1)
        rows["height"].append(64 if kind != "audio" else -1)
        rows["duration_ms"].append(-1 if kind == "image"
                                   else int(rng.integers(500, 60000)))
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeImage:
    """Actor-pool decode + feature-extract stage.

    Real path (``fake=False``): would decode via PIL/libvips —
    unavailable here, raises NotImplementedError (clearly marked stub).
    Fake path: deterministic FEATURE_DIM-float vector seeded from
    sha256(payload) — stable across runs/parallelism, so downstream
    stages (ANN, dedup) are fully testable.
    """

    def __init__(self, fake: bool = True, feature_dim: int = FEATURE_DIM):
        self.fake = fake
        self.feature_dim = feature_dim
        try:  # real decoder deps, gated behind an import-try
            import PIL.Image  # noqa: F401
            self._pil = True
        except ImportError:
            self._pil = False

    def _features(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            if not self._pil:
                raise NotImplementedError(
                    "real image decode requires PIL/libvips (not in this "
                    "container); run with fake=True for the plumbing path")
            raise NotImplementedError("real decode path not implemented")
        digest = hashlib.sha256(payload).digest()
        seed = int.from_bytes(digest[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.feature_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        feats = np.stack([self._features(p) for p in payloads.to_pylist()])
        flat = pa.array(feats.reshape(-1), type=pa.float32())
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "feature": pa.FixedSizeListArray.from_arrays(flat, self.feature_dim),
        })


class SampleFrames:
    """Video frame-sampling stage (stub): emits ``n_frames`` offsets per
    video row — the real implementation would decode at those offsets.
    Plumbing (explode one row -> n rows) is real."""

    def __init__(self, n_frames: int = 4):
        self.n = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, offs = [], []
        for mid, kind, dur in zip(batch["media_id"].to_pylist(),
                                  batch["kind"].to_pylist(),
                                  batch["duration_ms"].to_pylist()):
            if kind != "video" or dur <= 0:
                continue
            for j in range(self.n):
                ids.append(mid)
                offs.append(int(dur * (j + 0.5) / self.n))
        return pa.table({"media_id": pa.array(ids, type=pa.int64()),
                         "frame_ms": pa.array(offs, type=pa.int64())})
