"""Pure-stdlib AVI (RIFF) video container codec — completes the
multimodal trio the same way png.py (images) and wav.py (audio) did:
no ffmpeg/PIL, just struct-packed RIFF chunks and numpy.

Scope: uncompressed RGB24 DIB frames (biCompression=0, the classic
'00db' raw-frame AVI), single video stream.  The encoder writes a
spec-shaped file (RIFF/'AVI ' -> LIST hdrl [avih + LIST strl
(strh/strf)] -> LIST movi ['00db' chunks] -> idx1) with bottom-up BGR
rows as BITMAPINFOHEADER demands; the decoder walks the chunk tree,
reads geometry/fps from avih/strf, and yields frames as (h, w, 3) RGB
numpy arrays.  Compressed AVIs ('00dc' with a codec) raise, and the
caller (multimodal.FrameSampler) falls back to its declared stub.
"""

from __future__ import annotations

import struct

import numpy as np

_RIFF = b"RIFF"
_AVI = b"AVI "


def is_avi(payload: bytes) -> bool:
    return payload[:4] == _RIFF and payload[8:12] == _AVI


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(listtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", listtype + body)


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 RGB frames -> uncompressed AVI bytes."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    if f.ndim != 4 or f.shape[3] != 3:
        raise ValueError("frames must be (n, h, w, 3) RGB")
    n, h, w, _ = f.shape
    row_bytes = (w * 3 + 3) & ~3          # DIB rows pad to 4 bytes
    frame_bytes = row_bytes * h
    # RGB -> BGR, bottom-up, row-padded (the DIB wire format)
    bgr = f[:, ::-1, :, ::-1]
    dib = np.zeros((n, h, row_bytes), dtype=np.uint8)
    dib[:, :, : w * 3] = bgr.reshape(n, h, w * 3)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(1, fps),  # dwMicroSecPerFrame
        frame_bytes * fps,         # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        0x10,                      # dwFlags (AVIF_HASINDEX)
        n, 0, 1,                   # dwTotalFrames, dwInitialFrames, dwStreams
        frame_bytes,               # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0)          # dwWidth, dwHeight, dwReserved[4]
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"\x00\x00\x00\x00", 0, 0, 0, 0,
        1, max(1, fps),            # dwScale, dwRate -> fps
        0, n, frame_bytes, 0xFFFFFFFF, 0,
        0, 0, np.int16(w), np.int16(h))
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, 0,        # BITMAPINFOHEADER, biCompression=0
        frame_bytes, 0, 0, 0, 0)
    hdrl = _list(b"hdrl",
                 _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_body = b"".join(_chunk(b"00db", dib[i].tobytes())
                         for i in range(n))
    movi = _list(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to 'movi' fourcc)
    idx_entries, off = [], 4
    for i in range(n):
        idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, off,
                                       frame_bytes))
        off += 8 + frame_bytes + (frame_bytes & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = _AVI + hdrl + movi + idx1
    return _RIFF + struct.pack("<I", len(body)) + body


def _walk_chunks(buf: memoryview, lo: int, hi: int):
    """Yield (fourcc, body_lo, body_hi) for each chunk in [lo, hi)."""
    p = lo
    while p + 8 <= hi:
        fourcc = bytes(buf[p:p + 4])
        (size,) = struct.unpack_from("<I", buf, p + 4)
        yield fourcc, p + 8, min(p + 8 + size, hi)
        p += 8 + size + (size & 1)


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """AVI bytes -> ((n, h, w, 3) uint8 RGB frames, fps)."""
    if not is_avi(payload):
        raise ValueError("not a RIFF/AVI payload")
    buf = memoryview(payload)
    w = h = None
    us_per_frame = 100_000
    raw_frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal w, h, us_per_frame
        for fourcc, blo, bhi in _walk_chunks(buf, lo, hi):
            if fourcc == b"LIST":
                walk(blo + 4, bhi)
            elif fourcc == b"avih":
                us_per_frame = struct.unpack_from("<I", buf, blo)[0] or \
                    us_per_frame
                w, h = struct.unpack_from("<II", buf, blo + 32)
            elif fourcc == b"strf":
                _, sw, sh, _, bpp, comp = struct.unpack_from(
                    "<IiiHHI", buf, blo)
                if bpp != 24 or comp != 0:
                    raise ValueError(
                        f"unsupported DIB format (biBitCount={bpp}, "
                        f"biCompression={comp}); only uncompressed RGB24")
                if w is None:
                    w, h = sw, sh
            elif fourcc == b"00db":
                raw_frames.append(bytes(buf[blo:bhi]))
            elif fourcc == b"00dc":
                raise ValueError("compressed AVI stream (00dc) unsupported")

    walk(12, len(payload))
    if w is None or h is None or not raw_frames:
        raise ValueError("no decodable video stream found")
    row_bytes = (w * 3 + 3) & ~3
    out = np.empty((len(raw_frames), h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(raw_frames):
        if len(raw) < row_bytes * h:
            raise ValueError("truncated frame chunk")
        dib = np.frombuffer(raw, dtype=np.uint8,
                            count=row_bytes * h).reshape(h, row_bytes)
        out[i] = dib[::-1, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    fps = max(1, round(1_000_000 / us_per_frame))
    return out, fps
