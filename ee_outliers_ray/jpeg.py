"""Pure-stdlib baseline JPEG codec (numpy only — no PIL/libjpeg).

Converts the last honest media stub (multimodal.py jpeg branch) into a
real decode path.  Scope is BASELINE SEQUENTIAL JFIF (SOF0, 8-bit,
Huffman, single interleaved scan): grayscale or YCbCr 4:4:4 / 4:2:0,
standard Annex K quantization + Huffman tables, optional restart
markers on decode.  Progressive (SOF2), arithmetic coding and 12-bit
precision raise ValueError.

Encoder exists to build deterministic fixtures (and to round-trip-test
the decoder inside this container, where no reference codec exists);
the decoder is the production path.  The DCT is the exact orthonormal
8x8 DCT-II as one einsum over all blocks; the entropy coder is the only
per-symbol Python loop (inherent to a Huffman bitstream — parallelism
comes from the actor pool decoding many payloads at once, not from
inside one stream).

Spec references: ITU-T T.81 (tables in Annex K), JFIF 1.02 for the
APP0 header and YCbCr matrix.  Reference parity cannot be machine-
checked in this container (no libjpeg); the tests pin round-trip error
bounds, spec-derived bitstream fragments, and golden digests.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K tables -------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# (bits[1..16], values) per Annex K
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
          list(range(12)))
AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])

# orthonormal 8x8 DCT-II basis: dct(B) = C @ B @ C.T, idct = C.T @ B @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * \
            (np.sqrt(0.125) if _k == 0 else 0.5)


def is_jpeg(data: bytes) -> bool:
    return len(data) > 3 and data[:2] == b"\xff\xd8"


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-style quality scaling of the Annex K tables."""
    q = min(100, max(1, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((QT_LUM * scale + 50) // 100, 1, 255)
    chr_ = np.clip((QT_CHR * scale + 50) // 100, 1, 255)
    return lum, chr_


def _build_huff_encode(bits, vals) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical per T.81 C.2."""
    out, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_huff_decode(bits, vals):
    """(min_code, max_code, first_index) per length for fast decode."""
    mincode, maxcode, valptr = [0] * 17, [-1] * 17, [0] * 17
    code, k = 0, 0
    for length in range(1, 17):
        if bits[length - 1]:
            valptr[length] = k
            mincode[length] = code
            code += bits[length - 1]
            k += bits[length - 1]
            maxcode[length] = code - 1
        else:
            maxcode[length] = -1
        code <<= 1
    return mincode, maxcode, valptr, list(vals)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:          # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # 1-fill per spec
        return bytes(self.buf)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; RST markers
    are consumed by the caller via ``sync_restart``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos + 1 >= len(self.data):
            raise ValueError("corrupt JPEG: truncated entropy segment")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartHit()
            else:
                # EOI / next marker: pad with zeros (spec-legal tail)
                self.acc = (self.acc << 8)
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume an RST marker at a restart interval boundary."""
        self.acc = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1
        if 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2


class _RestartHit(Exception):
    pass


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to a signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --- encoder ---------------------------------------------------------------

def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (nby, nbx, 8, 8) with edge replication padding."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
    return plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)


def _encode_blocks_quantized(blocks: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> (n, 64) zigzagged quantized coefficients."""
    coef = np.einsum("ij,njk,lk->nil", _C, blocks - 128.0, _C)
    q = np.round(coef / qt.reshape(8, 8)).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _encode_entropy(comp_blocks, dc_tabs, ac_tabs) -> bytes:
    """Interleaved MCU scan: comp_blocks[c] is the (mcu, blocks-in-mcu,
    64) zigzag coefficient array per component."""
    w = _BitWriter()
    n_mcu = comp_blocks[0].shape[0]
    pred = [0] * len(comp_blocks)
    for m in range(n_mcu):
        for c, blocks in enumerate(comp_blocks):
            dct, act = dc_tabs[c], ac_tabs[c]
            for blk in blocks[m]:
                diff = int(blk[0]) - pred[c]
                pred[c] = int(blk[0])
                t = _category(diff)
                code, ln = dct[t]
                w.write(code, ln)
                if t:
                    w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                run = 0
                nz = np.flatnonzero(blk[1:])
                last = nz[-1] + 1 if len(nz) else 0
                for k in range(1, last + 1):
                    v = int(blk[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = act[0xF0]       # ZRL
                        w.write(code, ln)
                        run -= 16
                    t = _category(v)
                    code, ln = act[(run << 4) | t]
                    w.write(code, ln)
                    w.write(v if v >= 0 else v + (1 << t) - 1, t)
                    run = 0
                if last < 63:
                    code, ln = act[0x00]           # EOB
                    w.write(code, ln)
    return w.flush()


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: str = "444") -> bytes:
    """Baseline JFIF encode of an (H, W, 3) uint8 RGB image (or (H, W)
    grayscale).  ``subsample``: "444" or "420"."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    gray = nc == 1
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be 444 or 420")
    sub = (1, 1) if (subsample == "444" or gray) else (2, 2)
    qt_l, qt_c = _quality_tables(quality)

    if gray:
        planes = [img[:, :, 0].astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(img)
        y = ycc[..., 0]
        cb, cr = ycc[..., 1], ycc[..., 2]
        if sub == (2, 2):
            ph, pw = -h % 2, -w % 2
            cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
            cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2) \
                .mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2) \
                .mean(axis=(1, 3))
        planes = [y, cb, cr]

    hv, vv = sub
    # blocks per plane; luma MCU = hv x vv blocks, chroma = 1 block
    lum_b = _plane_blocks(planes[0])
    nby, nbx = lum_b.shape[:2]
    # pad luma block grid to MCU multiple
    pby, pbx = -nby % vv, -nbx % hv
    if pby or pbx:
        lum_b = np.pad(lum_b, ((0, pby), (0, pbx), (0, 0), (0, 0)),
                       mode="edge")
    mby, mbx = lum_b.shape[0] // vv, lum_b.shape[1] // hv
    lum_q = _encode_blocks_quantized(
        lum_b.reshape(-1, 8, 8).astype(np.float64), qt_l)
    lum_q = lum_q.reshape(lum_b.shape[0], lum_b.shape[1], 64)
    # MCU-major order for the luma blocks
    lum_m = lum_q.reshape(mby, vv, mbx, hv, 64).transpose(0, 2, 1, 3, 4) \
        .reshape(mby * mbx, vv * hv, 64)
    comp_blocks = [lum_m]
    for p in planes[1:]:
        cb_b = _plane_blocks(p)
        if cb_b.shape[0] != mby or cb_b.shape[1] != mbx:
            cb_b = np.pad(cb_b, ((0, mby - cb_b.shape[0]),
                                 (0, mbx - cb_b.shape[1]),
                                 (0, 0), (0, 0)), mode="edge")
        q = _encode_blocks_quantized(
            cb_b.reshape(-1, 8, 8).astype(np.float64), qt_c)
        comp_blocks.append(q.reshape(mby * mbx, 1, 64))

    dc_l = _build_huff_encode(*DC_LUM)
    ac_l = _build_huff_encode(*AC_LUM)
    dc_c = _build_huff_encode(*DC_CHR)
    ac_c = _build_huff_encode(*AC_CHR)
    dc_tabs = [dc_l] + [dc_c] * (len(planes) - 1)
    ac_tabs = [ac_l] + [ac_c] * (len(planes) - 1)
    scan = _encode_entropy(comp_blocks, dc_tabs, ac_tabs)

    out = bytearray(b"\xff\xd8")                           # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 2, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    for tid, qt in ((0, qt_l),) + (((1, qt_c),) if not gray else ()):
        # DQT elements are serialized in ZIGZAG order (T.81 B.2.4.1)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(int(qt[ZIGZAG[i]]) for i in range(64))
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * ncomp) + bytes([8]) \
        + struct.pack(">HH", h, w) + bytes([ncomp])
    samp = [(hv << 4) | vv] + [0x11] * (ncomp - 1)
    for ci in range(ncomp):
        out += bytes([ci + 1, samp[ci], 0 if ci == 0 else 1])
    for cls, tid, (bits, vals) in ((0, 0, DC_LUM), (1, 0, AC_LUM),
                                   (0, 1, DC_CHR), (1, 1, AC_CHR)):
        if gray and tid == 1:
            continue
        out += b"\xff\xc4" + struct.pack(">H", 19 + sum(bits)) \
            + bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * ncomp) + bytes([ncomp])
    for ci in range(ncomp):
        tab = 0 if ci == 0 else 0x11
        out += bytes([ci + 1, tab])
    out += bytes([0, 63, 0])                               # Ss, Se, Ah/Al
    out += scan
    out += b"\xff\xd9"                                     # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------------

def _decode_block(r: _BitReader, dct, act, qt: np.ndarray,
                  pred: int) -> tuple[np.ndarray, int]:
    mincode, maxcode, valptr, vals = dct
    t = _read_huff(r, mincode, maxcode, valptr, vals)
    diff = _extend(r.receive(t), t) if t else 0
    dc = pred + diff
    zz = np.zeros(64, dtype=np.int64)
    zz[0] = dc
    k = 1
    amin, amax, avp, avals = act
    while k < 64:
        rs = _read_huff(r, amin, amax, avp, avals)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:
                k += 16
                continue
            break                                          # EOB
        k += run
        if k > 63:
            raise ValueError("corrupt JPEG: AC index out of range")
        zz[k] = _extend(r.receive(size), size)
        k += 1
    coef = (zz * qt)[UNZIGZAG].reshape(8, 8).astype(np.float64)
    return coef, dc


def _read_huff(r: _BitReader, mincode, maxcode, valptr, vals) -> int:
    code = r.read_bit()
    ln = 1
    while code > maxcode[ln]:
        code = (code << 1) | r.read_bit()
        ln += 1
        if ln > 16:
            raise ValueError("corrupt JPEG: invalid Huffman code")
    return vals[valptr[ln] + code - mincode[ln]]


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255) \
        .round().astype(np.uint8)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline sequential JFIF payload to (H, W, 3) uint8 RGB
    ((H, W, 1) for grayscale)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple] = {}
    huff_ac: dict[int, tuple] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    while True:
        if pos + 4 > len(data):
            raise ValueError("corrupt JPEG: truncated header")
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("corrupt JPEG: EOI before scan")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seg_len = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("corrupt JPEG: truncated segment")
        if marker == 0xDB:                                  # DQT
            sp = 0
            while sp < len(seg):
                prec_id = seg[sp]
                if prec_id >> 4:
                    raise ValueError("16-bit quant tables unsupported")
                qts[prec_id & 0xF] = np.frombuffer(
                    seg, dtype=np.uint8, count=64, offset=sp + 1) \
                    .astype(np.int64)
                sp += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF{marker - 0xC0}) "
                             "unsupported")
        elif marker == 0xC0:                                # SOF0
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
        elif marker == 0xC4:                                # DHT
            sp = 0
            while sp < len(seg):
                cls_id = seg[sp]
                bits = list(seg[sp + 1:sp + 17])
                nv = sum(bits)
                vals = list(seg[sp + 17:sp + 17 + nv])
                tab = _build_huff_decode(bits, vals)
                if cls_id >> 4:
                    huff_ac[cls_id & 0xF] = tab
                else:
                    huff_dc[cls_id & 0xF] = tab
                sp += 17 + nv
        elif marker == 0xDD:                                # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                                # SOS
            ns = seg[0]
            scan_sel = []
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si:3 + 2 * si]
                scan_sel.append((cs, tdta >> 4, tdta & 0xF))
            pos += seg_len
            break
        pos += seg_len

    if not comps or h == 0:
        raise ValueError("corrupt JPEG: missing SOF0")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors > 2 unsupported")
    mbx = -(-w // (8 * hmax))
    mby = -(-h // (8 * vmax))
    order = []
    for cs, td, ta in scan_sel:
        c = next(c for c in comps if c["id"] == cs)
        order.append((c, td, ta))
    planes = []
    for c, _, _ in order:
        planes.append(np.zeros((mby * c["v"] * 8, mbx * c["h"] * 8)))

    r = _BitReader(data, pos)
    pred = [0] * len(order)
    mcu = 0
    while mcu < mbx * mby:
        if restart_interval and mcu and mcu % restart_interval == 0:
            r.sync_restart()
            pred = [0] * len(order)
        my, mx = divmod(mcu, mbx)
        try:
            for ci, (c, td, ta) in enumerate(order):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef, pred[ci] = _decode_block(
                            r, huff_dc[td], huff_ac[ta],
                            qts[c["tq"]], pred[ci])
                        px = _C.T @ coef @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
        except _RestartHit:
            # tolerate an RST the interval accounting didn't predict
            r.sync_restart()
            pred = [0] * len(order)
            continue
        mcu += 1

    # upsample to luma geometry and crop
    full = []
    for (c, _, _), p in zip(order, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0], 0, 255).round() \
            .astype(np.uint8)[:, :, None]
    return _ycbcr_to_rgb(full[0], full[1], full[2])
