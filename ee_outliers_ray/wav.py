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
import wave

import numpy as np

_RIFF = b"RIFF"
_WAVE = b"WAVE"


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


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 samples (n, channels), frame rate)."""
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
