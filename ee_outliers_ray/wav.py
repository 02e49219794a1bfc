"""Pure-stdlib WAV audio codec (`wave` + numpy) — makes the audio leg of
the multimodal pipeline REAL the same way png.py did for images: no
PIL/ffmpeg/soundfile, just the stdlib RIFF/WAVE reader and vectorized
numpy feature kernels.

Scope: 16-bit PCM (the `wave` module's bread and butter), mono or
multi-channel.  Anything the stdlib reader rejects raises, and the
caller (multimodal.MediaDecode) falls through to its declared stub.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

_RIFF = b"RIFF"
_WAVE = b"WAVE"
_FMT_PCM = 0x0001
_FMT_IMA_ADPCM = 0x0011


def is_wav(payload: bytes) -> bool:
    return payload[:4] == _RIFF and payload[8:12] == _WAVE


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 samples (n,) or (n, channels) -> WAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(s.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(s.tobytes())
    return buf.getvalue()


def _riff_chunks(payload: bytes):
    """Yield (chunk_id, data_offset, data_size) for every top-level RIFF
    chunk (chunks are word-aligned: odd sizes carry one pad byte)."""
    pos, end = 12, len(payload)
    while pos + 8 <= end:
        cid, size = payload[pos:pos + 4], \
            struct.unpack_from("<I", payload, pos + 4)[0]
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 samples (n, channels), frame rate).

    Dispatches on the fmt chunk's wFormatTag: PCM (0x0001, 16-bit, via
    the stdlib ``wave`` reader) or IMA/DVI ADPCM (0x0011 — the 4-bit
    compressed standard; decoded by the numpy kernel below).  Other
    compression tags raise."""
    if not is_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    tag = None
    for cid, off, size in _riff_chunks(payload):
        if cid == b"fmt " and size >= 2:
            tag = struct.unpack_from("<H", payload, off)[0]
            break
    if tag == _FMT_IMA_ADPCM:
        return _decode_adpcm_wav(payload)
    if tag != _FMT_PCM:
        raise ValueError(f"unsupported WAVE format tag {tag}")
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(
                f"only 16-bit PCM supported, got sampwidth={w.getsampwidth()}")
        n = w.getnframes()
        raw = w.readframes(n)
        rate = w.getframerate()
        ch = w.getnchannels()
    samples = np.frombuffer(raw, dtype=np.int16).reshape(-1, ch)
    return samples, rate


# --------------------------------------------------------------------------
# IMA / DVI ADPCM (WAVE format 0x0011): 4-bit compressed PCM
#
# Public standard (IMA Digital Audio Focus Group "Recommended Practices
# for Enhancing Digital Audio Compatibility", 1992); the per-nibble state
# machine below is the same kernel as CPython's stdlib ``audioop``
# lin2adpcm/adpcm2lin, which the tests use as an independent bit-exact
# oracle.  Container layout is the standard mono WAV framing: independent
# blocks of ``block_align`` bytes, each opening with a 4-byte header
# (int16 predictor = the block's first sample stored verbatim, uint8 step
# index, uint8 reserved) followed by 4-bit nibbles, LOW nibble first; a
# ``fact`` chunk records the true sample count so the final padded block
# trims exactly.  The predictor recurrence is clamped and nonlinear, so
# the per-sample loop is inherently sequential (same note as jpeg.py's
# entropy loop); blocks are independent, so the batch/actor layer
# parallelizes across payloads, not within one.
# --------------------------------------------------------------------------

_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)
_IMA_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)


def adpcm_encode_kernel(samples: np.ndarray, pred: int = 0,
                        index: int = 0) -> tuple[np.ndarray, int, int]:
    """int16 samples -> (uint8 nibbles, final predictor, final index).

    Bit-identical to ``audioop.lin2adpcm`` (property-pinned): quantize
    diff against the current step in 3 halvings, update the predictor
    with the SAME reconstructed diff the decoder will apply."""
    step_t, idx_t = _IMA_STEP, _IMA_INDEX
    out = np.empty(len(samples), dtype=np.uint8)
    pred, index = int(pred), int(index)
    for i, s in enumerate(np.asarray(samples, dtype=np.int64)):
        step = int(step_t[index])
        diff = int(s) - pred
        sign = 8 if diff < 0 else 0
        if sign:
            diff = -diff
        delta = 0
        vpdiff = step >> 3
        if diff >= step:
            delta = 4
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            delta |= 2
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            delta |= 1
            vpdiff += step
        pred = pred - vpdiff if sign else pred + vpdiff
        pred = max(-32768, min(32767, pred))
        delta |= sign
        index = max(0, min(88, index + int(idx_t[delta & 7])))
        out[i] = delta
    return out, pred, index


def adpcm_decode_kernel(nibbles: np.ndarray, pred: int = 0,
                        index: int = 0) -> tuple[np.ndarray, int, int]:
    """uint8 nibbles -> (int16 samples, final predictor, final index).
    Bit-identical to ``audioop.adpcm2lin`` (property-pinned)."""
    step_t, idx_t = _IMA_STEP, _IMA_INDEX
    out = np.empty(len(nibbles), dtype=np.int16)
    pred, index = int(pred), int(index)
    for i, n in enumerate(np.asarray(nibbles, dtype=np.uint8)):
        step = int(step_t[index])
        index = max(0, min(88, index + int(idx_t[n & 7])))
        vpdiff = step >> 3
        if n & 4:
            vpdiff += step
        if n & 2:
            vpdiff += step >> 1
        if n & 1:
            vpdiff += step >> 2
        pred = pred - vpdiff if n & 8 else pred + vpdiff
        pred = max(-32768, min(32767, pred))
        out[i] = pred
    return out, pred, index


def _adpcm_geometry(block_align: int, ch: int) -> int:
    """Samples per block for the given framing; validates the layout.
    Mono nibbles are contiguous, so any positive data size works;
    multi-channel interleaves in 4-byte units per channel, so the data
    region must be a positive multiple of 4*channels."""
    data_bytes = block_align - 4 * ch
    if ch == 1:
        if data_bytes < 1:
            raise ValueError(f"block_align {block_align} too small")
        return data_bytes * 2 + 1
    if data_bytes < 4 * ch or data_bytes % (4 * ch):
        raise ValueError(
            f"block_align {block_align} invalid for {ch} channels: data "
            "region must be a positive multiple of 4*channels")
    return data_bytes * 2 // ch + 1


def encode_adpcm_wav(samples: np.ndarray, rate: int = 16000,
                     block_align: int = 256) -> bytes:
    """int16 samples (n,) or (n, channels) -> IMA ADPCM WAV (0x0011).

    Each block stores each channel's first frame verbatim in its 4-byte
    per-channel header and nibble-codes the rest; step indexes carry
    across blocks for quality but every block stays independently
    decodable (the header re-seeds the state).  Multi-channel data
    interleaves in the standard 4-byte (8-nibble) units per channel.
    The final block zero-pads; the fact chunk's frame count trims it on
    decode."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if n == 0:
        raise ValueError("cannot encode an empty signal")
    spb = _adpcm_geometry(block_align, ch)
    n_blocks = -(-n // spb)
    padded = np.zeros((n_blocks * spb, ch), dtype=np.int16)
    padded[:n] = s
    # seed each channel's step index from the first block's mean slew
    # rate — the header carries it, so decoders are unaffected, and the
    # usual cold-start attack transient (index 0 = step 7 vs a signal
    # slewing thousands of LSB/sample) disappears
    idx = []
    for c in range(ch):
        d0 = np.abs(np.diff(padded[:spb, c].astype(np.int64)))
        idx.append(int(min(88, np.searchsorted(_IMA_STEP, d0.mean())))
                   if len(d0) else 0)
    groups = (block_align - 4 * ch) // (4 * ch)   # per channel (ch > 1)
    blocks = []
    for b in range(n_blocks):
        chunk = padded[b * spb:(b + 1) * spb]
        header, ch_packed = b"", []
        for c in range(ch):
            pred = int(chunk[0, c])           # header re-seeds predictor
            header += struct.pack("<hBB", pred, idx[c], 0)
            nib, _, idx[c] = adpcm_encode_kernel(chunk[1:, c], pred, idx[c])
            ch_packed.append(                  # low nibble first
                (nib[0::2] | (nib[1::2] << 4)).astype(np.uint8))
        if ch == 1:
            body = ch_packed[0]
        else:
            body = np.stack([p.reshape(groups, 4) for p in ch_packed],
                            axis=1).reshape(-1)
        blocks.append(header + body.tobytes())
    data = b"".join(blocks)
    avg_bps = (rate * block_align + spb - 1) // spb
    fmt = struct.pack("<HHIIHHHH", _FMT_IMA_ADPCM, ch, rate, avg_bps,
                      block_align, 4, 2, spb)
    fact = struct.pack("<I", n)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", len(fact)) + fact
            + b"data" + struct.pack("<I", len(data)) + data)
    return _RIFF + struct.pack("<I", len(body)) + body


def _decode_adpcm_wav(payload: bytes) -> tuple[np.ndarray, int]:
    fmt_raw = data = None
    n_samples = None
    for cid, off, size in _riff_chunks(payload):
        if cid == b"fmt ":
            fmt_raw = payload[off:off + size]
        elif cid == b"fact" and size >= 4:
            n_samples = struct.unpack_from("<I", payload, off)[0]
        elif cid == b"data":
            data = payload[off:off + size]
    if fmt_raw is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, ch, rate, _avg, block_align, bits = \
        struct.unpack_from("<HHIIHH", fmt_raw, 0)
    if tag != _FMT_IMA_ADPCM or bits != 4:
        raise ValueError(f"not 4-bit IMA ADPCM (tag={tag}, bits={bits})")
    if not 1 <= ch <= 8:
        raise ValueError(f"unsupported channel count {ch}")
    spb = struct.unpack_from("<H", fmt_raw, 18)[0] if len(fmt_raw) >= 20 \
        else _adpcm_geometry(block_align, ch)
    if len(data) % block_align:
        raise ValueError("truncated ADPCM data (partial block)")
    data_bytes = block_align - 4 * ch
    groups = data_bytes // (4 * ch)
    out = []
    for boff in range(0, len(data), block_align):
        payload_b = np.frombuffer(data, dtype=np.uint8, count=data_bytes,
                                  offset=boff + 4 * ch)
        cols = []
        for c in range(ch):
            pred, index = struct.unpack_from("<hB", data, boff + 4 * c)
            if index > 88:
                raise ValueError(f"corrupt step index {index}")
            cb = payload_b if ch == 1 else \
                payload_b.reshape(groups, ch, 4)[:, c, :].reshape(-1)
            nib = np.empty(len(cb) * 2, dtype=np.uint8)
            nib[0::2] = cb & 0x0F                # low nibble first
            nib[1::2] = cb >> 4
            dec, _, _ = adpcm_decode_kernel(nib[:spb - 1], pred, index)
            cols.append(np.concatenate(
                ([np.int16(pred)], dec)).astype(np.int16))
        out.append(np.stack(cols, axis=1))
    samples = np.concatenate(out)
    if n_samples is not None:
        samples = samples[:n_samples]
    return samples, rate


def audio_features(samples: np.ndarray, rate: int,
                   n_bands: int = 8) -> np.ndarray:
    """Deterministic spectral/energy features from decoded PCM:
    [duration_s, rate/1e5, n_channels, rms, zero-crossing rate,
    <n_bands normalized FFT band energies>] — float32, vectorized."""
    n, ch = samples.shape
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    dur = n / rate if rate else 0.0
    rms = float(np.sqrt(np.mean(mono ** 2))) if n else 0.0
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) \
        if n > 1 else 0.0
    feats = [dur, rate / 1e5, float(ch), rms, zcr]
    if n:
        spec = np.abs(np.fft.rfft(mono))
        edges = np.linspace(0, len(spec), n_bands + 1, dtype=np.int64)
        total = float(spec.sum()) or 1.0
        bands = [float(spec[edges[i]:edges[i + 1]].sum()) / total
                 for i in range(n_bands)]
    else:
        bands = [0.0] * n_bands
    return np.asarray(feats + bands, dtype=np.float32)
