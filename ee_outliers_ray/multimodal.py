"""Multimodal (image/audio/video) column stages.

Binary payloads are opaque ``binary`` columns with typed metadata; decode
and feature-extract are stateful actor-pool ``map_batches`` stages.  The
decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernel is STUBBED: with ``fake=True`` it produces a deterministic
feature vector from the payload bytes (so the Ray-side plumbing — schema,
batch sizing, actor signature, output layout — is real and tested); with
``fake=False`` it raises ``NotImplementedError`` at the exact point where
a real decoder would run.

Memory note (SURVEY §"Memory-aware"): payload batches must stay small —
callers should pass ``batch_size`` such that batch_size x avg_payload x
concurrency fits the worker heap; blocks carrying binary payloads should
be dropped (select away the payload column) immediately after this stage.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),          # typed metadata (nullable)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


class MediaDecode:
    """Actor-pool stage: binary payload -> fixed-size feature vector.

    __init__ loads the (stubbed) decoder once per actor; __call__ handles
    one Arrow batch and drops the payload column from its output.
    """

    def __init__(self, feature_dim: int = 16, fake: bool = True):
        self.feature_dim = feature_dim
        self.fake = fake
        # real implementation would do: self.model = load_decoder(...)

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "media decode requires PIL/ffmpeg, not available in this "
                "environment; run with fake=True for the deterministic stub")
        # deterministic fake: bytes -> blake2b digest -> float features
        digest = hashlib.blake2b(payload, digest_size=self.feature_dim).digest()
        return np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0

    def __call__(self, b: pa.Table) -> pa.Table:
        feats = [self._decode_one(p) for p in b["payload"].to_pylist()]
        out = pa.table({
            "media_id": b["media_id"],
            "kind": b["kind"],
            "features": pa.array([f.tolist() for f in feats],
                                 type=pa.list_(pa.float32())),
            "n_bytes": pa.array(
                np.fromiter((len(p) for p in b["payload"].to_pylist()),
                            dtype=np.int64, count=b.num_rows)),
        })
        return out


def decode_features(ds, *, feature_dim: int = 16, fake: bool = True,
                    batch_size: int = 256, concurrency=2):
    """Run the decode actor pool; small batches because payloads are wide."""
    return ds.map_batches(MediaDecode,
                          fn_constructor_kwargs=dict(feature_dim=feature_dim,
                                                     fake=fake),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def synth_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic synthetic media table matching MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])
    rows = {
        "media_id": np.arange(n, dtype=np.int64),
        "kind": kinds[rng.integers(0, 3, size=n)],
        "payload": [rng.integers(0, 256, size=int(s)).astype(np.uint8).tobytes()
                    for s in rng.integers(64, 2048, size=n)],
        "mime": ["application/octet-stream"] * n,
        "width": rng.integers(16, 4096, size=n).astype(np.int32),
        "height": rng.integers(16, 4096, size=n).astype(np.int32),
        "duration_ms": rng.integers(0, 60000, size=n).astype(np.int32),
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)
