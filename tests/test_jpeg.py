"""Pure-stdlib baseline JPEG codec: round-trip error bounds, spec-derived
bitstream fragments, golden digests, and the multimodal integration.

No reference codec exists in this container (PIL/libjpeg absent), so
correctness rests on (a) spec-fragment checks computed by hand from
ITU-T T.81 (marker layout, the entropy bits of an all-zero block),
(b) round-trip error profiles matching real JPEG behavior (sub-1 error
on smooth gradients, quantization-limited error on noise, monotone in
quality), and (c) pinned golden digests for cross-version stability."""

import hashlib
import struct

import numpy as np
import pytest

from ee_outliers_ray.jpeg import decode_jpeg, encode_jpeg, is_jpeg


def _grad(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 4) % 256, (yy * 3) % 256, ((xx + yy) * 2) % 256],
                    axis=-1).astype(np.uint8)


def test_marker_structure():
    d = encode_jpeg(_grad(16, 16), quality=85)
    assert is_jpeg(d)
    assert d[:2] == b"\xff\xd8" and d[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in d[:32]
    # SOF0 carries the true dimensions big-endian
    i = d.find(b"\xff\xc0")
    h, w = struct.unpack(">HH", d[i + 5:i + 9])
    assert (h, w) == (16, 16)


def test_uniform_block_entropy_bits_match_spec():
    """Hand-computed T.81 check: an all-128 grayscale 8x8 block level-
    shifts to all-zero coefficients, so the scan is DC-lum category 0
    ('00') + EOB ('1010'), 1-padded to one byte = 0x2B."""
    d = encode_jpeg(np.full((8, 8), 128, dtype=np.uint8), quality=50)
    assert d[-3] == 0x2B and d[-2:] == b"\xff\xd9"
    out = decode_jpeg(d)
    assert out.shape == (8, 8, 1)
    assert (out == 128).all()


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("q", [95, 85, 60])
def test_roundtrip_smooth_gradient(sub, q):
    img = _grad(40, 56)
    out = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err < 2.0, (sub, q, err)


def test_roundtrip_noise_quality_monotone():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    errs = []
    for q in (95, 85, 60):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        errs.append(np.abs(out.astype(int) - img.astype(int)).mean())
    assert errs[0] < 5 and errs[0] < errs[1] < errs[2]
    assert errs[2] < 35  # q60 noise: quantization-limited, not broken


def test_roundtrip_odd_sizes_and_gray():
    rng = np.random.default_rng(3)
    for (h, w) in ((1, 1), (7, 9), (8, 8), (17, 23)):
        im = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(im, quality=90, subsample="420"))
        assert out.shape == im.shape
    g = ((np.arange(24)[:, None] + np.arange(40)[None, :]) % 256) \
        .astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == (24, 40, 1)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).mean() < 2.0


def test_rejects_non_baseline_and_garbage():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # progressive: SOI + SOF2
    prog = b"\xff\xd8\xff\xc2" + struct.pack(">H", 11) \
        + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(prog)


def test_golden_digest_stable():
    """Pinned byte + pixel digests: encoder output and decoder output
    for a fixed input must never drift silently."""
    img = _grad(24, 32)
    d = encode_jpeg(img, quality=85, subsample="420")
    out = decode_jpeg(d)
    assert out.shape == (24, 32, 3)
    assert hashlib.sha256(d).hexdigest() == \
        "8fdf73ee63b3572868e98f82c837b9a372998f6e3a7712ed8fadaf90c40421b4"
    assert hashlib.sha256(out.tobytes()).hexdigest() == \
        "cb72a52700d2cd54388b1c34207e64fb77775fcd3ebf36c0f33f4d967d9db29c"


def test_media_decode_jpeg_real_path():
    """media decode: jpeg rows take the REAL path under fake=False, and
    their features reflect actual pixel stats (mean channel values close
    to the source image's)."""
    from ee_outliers_ray.multimodal import MediaDecode

    import pyarrow as pa

    img = _grad(20, 28)
    payload = encode_jpeg(img, quality=90)
    b = pa.table({
        "media_id": pa.array([0], type=pa.int64()),
        "kind": pa.array(["image"]),
        "payload": pa.array([payload], type=pa.binary()),
    })
    out = MediaDecode(fake=False)(b)
    f = np.asarray(out["features"][0].as_py())
    assert f[0] == 20 and f[1] == 28 and f[2] == 3
    assert abs(f[3] - img.mean() / 255.0) < 0.02


def test_media_resize_jpeg_real_path():
    from ee_outliers_ray.multimodal import MediaResize

    import pyarrow as pa

    img = _grad(32, 32)
    b = pa.table({
        "media_id": pa.array([0], type=pa.int64()),
        "kind": pa.array(["image"]),
        "payload": pa.array([encode_jpeg(img, quality=90)],
                            type=pa.binary()),
        "width": pa.array([32], type=pa.int32()),
        "height": pa.array([32], type=pa.int32()),
    })
    out = MediaResize(target_w=16, target_h=16, fake=False)(b)
    resized = decode_jpeg(out["payload"][0].as_py())
    assert resized.shape == (16, 16, 3)
    assert out["width"][0].as_py() == 16


def test_truncation_always_raises_valueerror():
    """Every truncation point of a valid stream raises ValueError (never
    IndexError / infinite loop) — header, table, and entropy cuts."""
    img = (np.arange(16 * 16 * 3) % 256).astype(np.uint8).reshape(16, 16, 3)
    d = encode_jpeg(img, quality=85)
    for cut in range(4, len(d) - 1, 7):
        with pytest.raises(ValueError):
            decode_jpeg(d[:cut])
