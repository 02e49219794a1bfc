"""Multimodal (image/audio/video) column stages.

Binary payloads are opaque ``binary`` columns with typed metadata; decode
and feature-extract are stateful actor-pool ``map_batches`` stages.

All three modalities now have a REAL pure-stdlib path:
  - images: PNG codec (`png.py` — zlib scanlines + all five spec
    filters) AND baseline JPEG codec (`jpeg.py` — Annex K Huffman +
    8x8 DCT, 4:4:4 / 4:2:0): decode -> pixel-stats features, decode ->
    resize -> re-encode;
  - audio: WAV/PCM codec (`wav.py`): decode -> spectral/energy
    features;
  - video: uncompressed-DIB AVI codec (`avi.py`): decode -> temporal
    pixel features, and frame sampling that emits each sampled frame
    re-encoded as PNG so the image stages compose downstream.
The remaining formats (mp3/h264/progressive-JPEG...) need
PIL/ffmpeg, which are NOT in this container, so their kernels stay
STUBBED: with ``fake=True`` they produce a deterministic feature
vector from the payload bytes (the Ray-side plumbing — schema, batch
sizing, actor signature, output layout — is real and tested); with
``fake=False`` they raise ``NotImplementedError`` at the exact point
where a real decoder would run.

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

    def _png_features(self, img: np.ndarray) -> np.ndarray:
        """Real pixel features: dims, global mean/std, per-channel
        means, coarse luminance histogram — deterministic and cheap."""
        f = np.zeros(self.feature_dim, dtype=np.float32)
        h, w, c = img.shape
        px = img.astype(np.float32)
        vals = [h, w, c, px.mean() / 255.0, px.std() / 255.0]
        vals += [px[:, :, i].mean() / 255.0 for i in range(min(c, 3))]
        hist, _ = np.histogram(img[:, :, 0], bins=8, range=(0, 256))
        vals += list(hist / max(1, h * w))
        f[:min(len(vals), self.feature_dim)] = vals[:self.feature_dim]
        return f

    def _wav_features(self, payload: bytes) -> np.ndarray:
        from .wav import audio_features, decode_wav

        samples, rate = decode_wav(payload)
        f = np.zeros(self.feature_dim, dtype=np.float32)
        vals = audio_features(samples, rate)
        f[:min(len(vals), self.feature_dim)] = vals[:self.feature_dim]
        return f

    def _avi_features(self, payload: bytes) -> np.ndarray:
        """Real video features: frame count, dims, fps, duration,
        global pixel mean/std, per-channel means, temporal motion
        (mean |frame-to-frame diff|)."""
        from .avi import decode_avi

        frames, fps = decode_avi(payload)
        n, h, w, _ = frames.shape
        px = frames.astype(np.float32)
        f = np.zeros(self.feature_dim, dtype=np.float32)
        vals = [n, h, w, fps, n / max(1, fps),
                px.mean() / 255.0, px.std() / 255.0]
        vals += [px[..., i].mean() / 255.0 for i in range(3)]
        vals.append(np.abs(np.diff(px, axis=0)).mean() / 255.0
                    if n > 1 else 0.0)
        f[:min(len(vals), self.feature_dim)] = vals[:self.feature_dim]
        return f

    def _decode_one(self, payload: bytes) -> np.ndarray:
        from .avi import is_avi
        from .jpeg import decode_jpeg, is_jpeg
        from .png import _SIG, decode_png
        from .wav import is_wav

        if payload[:8] == _SIG:
            # REAL path: pure-stdlib PNG decode (png.py)
            return self._png_features(decode_png(payload))
        if is_jpeg(payload):
            # REAL path: pure-stdlib baseline JPEG decode (jpeg.py);
            # progressive/arithmetic payloads raise inside decode_jpeg
            # and fall through to the stub under fake=True
            try:
                return self._png_features(decode_jpeg(payload))
            except Exception:
                if not self.fake:
                    raise
        if is_wav(payload):
            # REAL path: pure-stdlib WAV decode (wav.py) -> spectral/
            # energy features.  A payload that merely LOOKS like RIFF/
            # WAVE but fails the stdlib reader (truncated, non-PCM)
            # falls through to the stub instead of crashing the stage.
            try:
                return self._wav_features(payload)
            except Exception:
                if not self.fake:
                    raise
        if is_avi(payload):
            # REAL path: pure-stdlib AVI decode (avi.py) -> temporal
            # pixel features; compressed/truncated AVI falls through
            # to the stub the same way WAV does.
            try:
                return self._avi_features(payload)
            except Exception:
                if not self.fake:
                    raise
        if not self.fake:
            raise NotImplementedError(
                "non-PNG/JPEG/WAV/AVI media decode requires PIL/ffmpeg, "
                "not available in this environment; run with fake=True "
                "for the deterministic stub")
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


class MediaResize:
    """Actor-pool stage: image payload -> resized payload + updated
    typed metadata.  The pixel kernel is stubbed like MediaDecode (a
    real one would PIL.Image.resize); the Ray-side contract is real:
    payload-in/payload-out with (width, height) rewritten, non-image
    rows passed through untouched, small batches."""

    def __init__(self, target_w: int = 224, target_h: int = 224,
                 fake: bool = True):
        self.target_w = target_w
        self.target_h = target_h
        self.fake = fake

    def _resize_one(self, payload: bytes) -> bytes:
        from .jpeg import decode_jpeg, encode_jpeg, is_jpeg
        from .png import _SIG, decode_png, encode_png, resize_nearest

        if payload[:8] == _SIG:
            # REAL path: decode -> nearest-neighbor resize -> re-encode
            img = decode_png(payload)
            return encode_png(resize_nearest(img, self.target_w,
                                             self.target_h))
        if is_jpeg(payload):
            # REAL path: baseline JPEG decode -> resize -> re-encode
            try:
                img = decode_jpeg(payload)
                return encode_jpeg(resize_nearest(img, self.target_w,
                                                  self.target_h))
            except Exception:
                if not self.fake:
                    raise
        if not self.fake:
            raise NotImplementedError(
                "non-PNG/JPEG image resize requires PIL, not available "
                "here; run with fake=True for the deterministic stub")
        # deterministic fake: size-proportional byte resample
        n_out = max(1, self.target_w * self.target_h // 1024)
        arr = np.frombuffer(payload, dtype=np.uint8)
        idx = np.linspace(0, len(arr) - 1, num=min(n_out, len(arr)),
                          dtype=np.int64)
        return arr[idx].tobytes()

    def __call__(self, b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kinds = b["kind"].to_numpy(zero_copy_only=False)
        payloads = b["payload"].to_pylist()
        out_payload = [self._resize_one(p) if k == "image" else p
                       for k, p in zip(kinds, payloads)]
        is_img = pa.array(kinds == "image")
        w = pc.if_else(is_img, pa.scalar(self.target_w, pa.int32()),
                       b["width"])
        h = pc.if_else(is_img, pa.scalar(self.target_h, pa.int32()),
                       b["height"])
        cols = {n_: b[n_] for n_ in b.column_names}
        cols["payload"] = pa.array(out_payload, type=pa.binary())
        cols["width"], cols["height"] = w, h
        return pa.table(cols)


class FrameSampler:
    """Actor-pool stage: video payload -> K evenly-spaced frame payloads
    (one output row per sampled frame).

    Uncompressed-DIB AVI payloads take the REAL path (avi.py): decode,
    pick K evenly-spaced frames, re-encode each as PNG so the image
    stages (MediaDecode/MediaResize) compose downstream.  Other codecs
    would need ffmpeg (not in this container) and keep the stub; the
    fan-out contract — row explosion with frame_idx/frame_ts_ms,
    payload dropped after sampling — is identical on both paths."""

    def __init__(self, num_frames: int = 4, fake: bool = True):
        self.num_frames = num_frames
        self.fake = fake

    def _sample_avi(self, payload: bytes) -> list[tuple[int, int, bytes]]:
        from .avi import decode_avi
        from .png import encode_png

        frames, fps = decode_avi(payload)
        n = frames.shape[0]
        k = min(self.num_frames, n)
        picks = (np.arange(k, dtype=np.int64) * n) // k
        return [(i, int(j) * 1000 // max(1, fps), encode_png(frames[j]))
                for i, j in enumerate(picks)]

    def _sample_one(self, payload: bytes, duration_ms: int
                    ) -> list[tuple[int, int, bytes]]:
        from .avi import is_avi

        if is_avi(payload):
            # REAL path; compressed ('00dc') or truncated AVI falls
            # through to the stub, mirroring MediaDecode's WAV rule.
            try:
                return self._sample_avi(payload)
            except Exception:
                if not self.fake:
                    raise
        if not self.fake:
            raise NotImplementedError(
                "non-AVI frame sampling requires ffmpeg, not available "
                "here; run with fake=True for the deterministic stub")
        arr = np.frombuffer(payload, dtype=np.uint8)
        k = self.num_frames
        out = []
        for i in range(k):
            ts = (duration_ms * i) // max(1, k)
            lo = (len(arr) * i) // k
            hi = (len(arr) * (i + 1)) // k
            out.append((i, int(ts), arr[lo:hi].tobytes()))
        return out

    def __call__(self, b: pa.Table) -> pa.Table:
        ids, kinds = b["media_id"].to_pylist(), b["kind"].to_pylist()
        payloads = b["payload"].to_pylist()
        durs = b["duration_ms"].to_pylist()
        o_id, o_idx, o_ts, o_frame = [], [], [], []
        for mid, kind, p, d in zip(ids, kinds, payloads, durs):
            if kind != "video":
                continue
            for idx, ts, frame in self._sample_one(p, d or 0):
                o_id.append(mid)
                o_idx.append(idx)
                o_ts.append(ts)
                o_frame.append(frame)
        return pa.table({
            "media_id": pa.array(o_id, type=pa.int64()),
            "frame_idx": pa.array(o_idx, type=pa.int32()),
            "frame_ts_ms": pa.array(o_ts, type=pa.int32()),
            "frame": pa.array(o_frame, type=pa.binary()),
        })


def resize_images(ds, *, target_w: int = 224, target_h: int = 224,
                  fake: bool = True, batch_size: int = 256, concurrency=2):
    return ds.map_batches(MediaResize,
                          fn_constructor_kwargs=dict(target_w=target_w,
                                                     target_h=target_h,
                                                     fake=fake),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def sample_frames(ds, *, num_frames: int = 4, fake: bool = True,
                  batch_size: int = 64, concurrency=2):
    """Video rows fan out to one row per sampled frame (flat_map shape
    expressed as a batch transform)."""
    return ds.map_batches(FrameSampler,
                          fn_constructor_kwargs=dict(num_frames=num_frames,
                                                     fake=fake),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def synth_media_table(n: int = 64, seed: int = 5,
                      real_png: bool = False,
                      real_wav: bool = False,
                      real_avi: bool = False,
                      real_jpeg: bool = False,
                      real_adpcm: bool = False) -> pa.Table:
    """Deterministic synthetic media table matching MEDIA_SCHEMA.

    ``real_png=True``: image rows carry actual (decodable) PNG payloads
    with matching width/height metadata — drives the real decode path.
    ``real_jpeg=True``: alternating image rows carry baseline JPEG
    payloads instead (4:2:0/4:4:4 alternating too), driving jpeg.py.
    ``real_wav=True``: audio rows carry actual 16-bit PCM WAV payloads
    (seeded tone + noise mixtures) with matching duration_ms metadata.
    ``real_adpcm=True``: alternating audio rows compress the same signal
    as IMA ADPCM (format 0x0011) instead — 4-bit lossy, decoded by the
    audioop-pinned kernel in wav.py (same alternation pattern as jpeg;
    the rng draw sequence is unchanged, so all other rows' payloads stay
    byte-identical to the real_adpcm=False table).
    ``real_avi=True``: video rows carry actual uncompressed-DIB AVI
    payloads with matching width/height/duration_ms metadata."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])
    kind_col = kinds[rng.integers(0, 3, size=n)]
    payloads, mimes, widths, heights = [], [], [], []
    durations = rng.integers(0, 60000, size=n).astype(np.int32)
    for i in range(n):
        w = int(rng.integers(16, 64))
        h = int(rng.integers(16, 64))
        if real_jpeg and kind_col[i] == "image" and i % 2 == 1:
            from .jpeg import encode_jpeg

            img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
            payloads.append(encode_jpeg(
                img, quality=85,
                subsample="420" if i % 4 == 1 else "444"))
            mimes.append("image/jpeg")
        elif real_png and kind_col[i] == "image":
            from .png import encode_png

            img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
            payloads.append(encode_png(img, filter_mode="cycle"))
            mimes.append("image/png")
        elif real_avi and kind_col[i] == "video":
            from .avi import encode_avi

            fps = 10
            nf = int(rng.integers(2, 7))
            h = int(rng.integers(8, 17))
            w = int(rng.integers(8, 17))
            frames = rng.integers(0, 256,
                                  size=(nf, h, w, 3)).astype(np.uint8)
            payloads.append(encode_avi(frames, fps=fps))
            mimes.append("video/x-msvideo")
            durations[i] = nf * 1000 // fps
        elif real_wav and kind_col[i] == "audio":
            from .wav import encode_wav

            rate = 8000
            dur_ms = int(rng.integers(20, 250))
            durations[i] = dur_ms
            t = np.arange(int(rate * dur_ms / 1000)) / rate
            freq = float(rng.integers(100, 2000))
            sig = 0.5 * np.sin(2 * np.pi * freq * t) \
                + 0.1 * rng.standard_normal(len(t))
            pcm = np.clip(sig * 32767, -32768, 32767).astype(np.int16)
            if real_adpcm and i % 2 == 1:
                from .wav import encode_adpcm_wav

                payloads.append(encode_adpcm_wav(pcm, rate,
                                                 block_align=128))
                mimes.append("audio/adpcm")
            else:
                payloads.append(encode_wav(pcm, rate))
                mimes.append("audio/wav")
        else:
            size = int(rng.integers(64, 2048))
            payloads.append(rng.integers(0, 256, size=size)
                            .astype(np.uint8).tobytes())
            mimes.append("application/octet-stream")
        widths.append(w)
        heights.append(h)
    rows = {
        "media_id": np.arange(n, dtype=np.int64),
        "kind": kind_col,
        "payload": payloads,
        "mime": mimes,
        "width": np.asarray(widths, dtype=np.int32),
        "height": np.asarray(heights, dtype=np.int32),
        "duration_ms": durations,
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)
