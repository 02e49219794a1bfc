"""Pure-stdlib PNG codec (zlib + numpy) — a REAL image decode path for
the multimodal stages in an environment without PIL/ffmpeg.

Implements the public PNG specification (RFC 2083 / W3C PNG): chunk
framing with CRC-32, IHDR/IDAT/IEND, zlib-compressed scanlines, and all
five filter types (None/Sub/Up/Average/Paeth).  Supported pixel
formats: 8-bit greyscale (color type 0), RGB (2) and RGBA (6) — the
formats a web-crawl thumbnail pipeline actually meets.

The encoder can cycle through every filter type per scanline
(``filter_mode="cycle"``), which the tests use to pin the decoder
against all five filters; the Paeth predictor is additionally pinned to
the spec's reference definition.

Decode filters Up/None/Sub are vectorized (Sub is a per-channel
running sum, i.e. cumsum mod 256); Average and Paeth carry an in-row
sequential dependency and run as per-pixel loops — acceptable for the
thumbnail-sized payloads this stage is for (documented; a SIMD codec
would replace this module wholesale, not change its callers).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body +
            struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    """Spec reference predictor (left, above, upper-left)."""
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    if pb <= pc_:
        return b
    return c


def encode_png(img: np.ndarray, filter_mode: str = "none") -> bytes:
    """(H, W) or (H, W, {1,3,4}) uint8 array -> PNG bytes.

    ``filter_mode``: "none" = filter 0 every row; "cycle" = row r uses
    filter r % 5 (exercises every decoder branch)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {ch}")
    color_type = _COLOR_TYPE[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)

    flat = img.reshape(h, w * ch).astype(np.int16)
    prior = np.zeros(w * ch, dtype=np.int16)
    lines = []
    for r in range(h):
        raw = flat[r]
        ft = (r % 5) if filter_mode == "cycle" else 0
        left = np.zeros(w * ch, dtype=np.int16)
        left[ch:] = raw[:-ch]
        ul = np.zeros(w * ch, dtype=np.int16)
        ul[ch:] = prior[:-ch]
        if ft == 0:
            filt = raw
        elif ft == 1:
            filt = raw - left
        elif ft == 2:
            filt = raw - prior
        elif ft == 3:
            filt = raw - (left + prior) // 2
        else:
            pred = np.fromiter(
                (_paeth(int(left[i]), int(prior[i]), int(ul[i]))
                 for i in range(w * ch)), dtype=np.int16, count=w * ch)
            filt = raw - pred
        lines.append(bytes([ft]) + (filt % 256).astype(np.uint8).tobytes())
        prior = raw
    idat = zlib.compress(b"".join(lines), 6)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) +
            _chunk(b"IEND", b""))


def png_info(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the IHDR without full decode."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    if data[12:16] != b"IHDR":
        raise ValueError("IHDR must be the first chunk")
    w, h, depth, color_type = struct.unpack(">IIBB", data[16:26])
    if depth != 8 or color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG (depth={depth}, "
                         f"color_type={color_type})")
    return w, h, _CHANNELS[color_type]


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array (8-bit gray/RGB/RGBA,
    non-interlaced)."""
    w, h, ch = png_info(data)
    interlace = data[28]
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    # walk chunks, concatenate IDAT
    pos, idat = 8, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("scanline payload size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int64)
    for r in range(h):
        row = raw[r * (stride + 1): (r + 1) * (stride + 1)]
        ft = row[0]
        filt = np.frombuffer(row[1:], dtype=np.uint8).astype(np.int64)
        if ft == 0:
            recon = filt
        elif ft == 1:
            # Sub: per-channel running sum == cumsum mod 256
            recon = filt.reshape(w, ch).cumsum(axis=0).reshape(stride) % 256
        elif ft == 2:
            recon = (filt + prior) % 256
        elif ft == 3:
            recon = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                left = recon[i - ch] if i >= ch else 0
                recon[i] = (filt[i] + (left + prior[i]) // 2) % 256
        elif ft == 4:
            recon = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                left = recon[i - ch] if i >= ch else 0
                ul = prior[i - ch] if i >= ch else 0
                recon[i] = (filt[i] + _paeth(int(left), int(prior[i]),
                                             int(ul))) % 256
        else:
            raise ValueError(f"unknown filter type {ft}")
        out[r] = recon.astype(np.uint8)
        prior = recon
    return out.reshape(h, w, ch)


def resize_nearest(img: np.ndarray, target_w: int, target_h: int
                   ) -> np.ndarray:
    """Deterministic nearest-neighbor resize (index mapping per axis)."""
    h, w = img.shape[:2]
    rows = (np.arange(target_h) * h) // target_h
    cols = (np.arange(target_w) * w) // target_w
    return img[rows][:, cols]
