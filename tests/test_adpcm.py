"""IMA/DVI ADPCM codec (wav.py, WAVE format 0x0011).

The per-nibble state machine is pinned BIT-EXACT to CPython's stdlib
``audioop`` (lin2adpcm / adpcm2lin implement the same public IMA/DVI
standard) by hypothesis property tests — an independent oracle the same
way DuckDB pins the SQL-expressible pipelines.  audioop packs the FIRST
nibble of a byte in the HIGH half; the WAV container packs low-first,
so the properties repack explicitly.
"""

from __future__ import annotations

import audioop

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ee_outliers_ray.wav import (
    adpcm_decode_kernel,
    adpcm_encode_kernel,
    decode_wav,
    encode_adpcm_wav,
    is_wav,
)

states = st.tuples(st.integers(-32768, 32767), st.integers(0, 88))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 15), min_size=2, max_size=400)
       .filter(lambda v: len(v) % 2 == 0), states)
def test_decode_kernel_matches_audioop(nibs, state):
    nib = np.array(nibs, dtype=np.uint8)
    # audioop consumes the HIGH nibble of each byte first
    packed = ((nib[0::2] << 4) | nib[1::2]).astype(np.uint8).tobytes()
    want = np.frombuffer(audioop.adpcm2lin(packed, 2, state)[0],
                         dtype=np.int16)
    got, _, _ = adpcm_decode_kernel(nib, pred=state[0], index=state[1])
    np.testing.assert_array_equal(got, want)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=2, max_size=400)
       .filter(lambda v: len(v) % 2 == 0), states)
def test_encode_kernel_matches_audioop(vals, state):
    samples = np.array(vals, dtype=np.int16)
    packed, (vpred, vidx) = audioop.lin2adpcm(samples.tobytes(), 2, state)
    pb = np.frombuffer(packed, dtype=np.uint8)
    want = np.empty(len(samples), dtype=np.uint8)
    want[0::2] = pb >> 4
    want[1::2] = pb & 0x0F
    got, pred, index = adpcm_encode_kernel(samples, pred=state[0],
                                           index=state[1])
    np.testing.assert_array_equal(got, want)
    assert (pred, index) == (vpred, vidx)


def test_wav_roundtrip_sine_quality_and_trim():
    rate = 8000
    n = 1234                      # forces a zero-padded final block
    t = np.arange(n) / rate
    sig = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    payload = encode_adpcm_wav(sig, rate=rate, block_align=128)
    assert is_wav(payload)
    got, got_rate = decode_wav(payload)
    assert got_rate == rate
    assert got.shape == (n, 1)    # fact chunk trims the padded block
    err = got[:, 0].astype(np.float64) - sig.astype(np.float64)
    rms_err = float(np.sqrt(np.mean(err ** 2)))
    rms_sig = float(np.sqrt(np.mean(sig.astype(np.float64) ** 2)))
    assert rms_err < 0.05 * rms_sig, (rms_err, rms_sig)


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 600), st.integers(0, 2 ** 31 - 1),
       st.integers(8, 300))
def test_wav_roundtrip_arbitrary_signals(n, seed, block_align):
    rng = np.random.default_rng(seed)
    # smooth-ish random walk (ADPCM's target signal class), clipped
    sig = np.clip(np.cumsum(rng.integers(-900, 901, size=n)),
                  -32768, 32767).astype(np.int16)
    payload = encode_adpcm_wav(sig, rate=16000, block_align=block_align)
    got, rate = decode_wav(payload)
    assert rate == 16000
    assert got.shape == (n, 1)
    # block headers re-seed exactly -> the first sample of every block
    # is lossless
    spb = (block_align - 4) * 2 + 1
    np.testing.assert_array_equal(got[::spb, 0], sig[::spb])


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 400), st.integers(0, 2 ** 31 - 1),
       st.integers(2, 4), st.sampled_from([24, 72, 256]))
def test_wav_roundtrip_multichannel(n, seed, ch, base_align):
    """Multi-channel framing: 4-byte-per-channel interleave, per-channel
    headers/state; every block's first frame is lossless per channel."""
    block_align = 4 * ch + ((base_align // (4 * ch)) or 1) * 4 * ch
    rng = np.random.default_rng(seed)
    sig = np.clip(np.cumsum(rng.integers(-700, 701, size=(n, ch)), axis=0),
                  -32768, 32767).astype(np.int16)
    payload = encode_adpcm_wav(sig, rate=22050, block_align=block_align)
    got, rate = decode_wav(payload)
    assert rate == 22050
    assert got.shape == (n, ch)
    spb = (block_align - 4 * ch) * 2 // ch + 1
    np.testing.assert_array_equal(got[::spb], sig[::spb])
    # channels adapt independently: decoding matches the mono kernel run
    # per channel over the same block segmentation
    err = got.astype(np.float64) - sig.astype(np.float64)
    assert np.sqrt((err ** 2).mean()) < 1200


def test_adpcm_rejects():
    with pytest.raises(ValueError):
        # stereo data region must be a multiple of 4*channels
        encode_adpcm_wav(np.zeros((40, 2), dtype=np.int16), block_align=30)
    with pytest.raises(ValueError):
        encode_adpcm_wav(np.array([], dtype=np.int16))
    sig = np.arange(100, dtype=np.int16)
    payload = bytearray(encode_adpcm_wav(sig, rate=8000, block_align=64))
    with pytest.raises(ValueError):
        decode_wav(bytes(payload[:-3]))     # truncated final block
    # unsupported format tag raises, never silently mis-decodes
    tag_off = payload.find(b"fmt ") + 8
    payload[tag_off:tag_off + 2] = (0x55).to_bytes(2, "little")  # mp3 tag
    with pytest.raises(ValueError):
        decode_wav(bytes(payload))


def test_media_table_adpcm_rows_take_real_path():
    from ee_outliers_ray.multimodal import MediaDecode, synth_media_table

    t = synth_media_table(n=48, seed=5, real_png=True, real_wav=True,
                          real_avi=True, real_jpeg=True, real_adpcm=True)
    mimes = t.column("mime").to_pylist()
    assert "audio/adpcm" in mimes and "audio/wav" in mimes
    # fake=False: every row must decode for real — an ADPCM row falling
    # through to the stub would raise NotImplementedError here
    out = MediaDecode(fake=False)(t)
    assert out.num_rows == t.num_rows
    # rng draw order is unchanged by the alternation: non-adpcm payloads
    # byte-identical to the real_adpcm=False table
    t0 = synth_media_table(n=48, seed=5, real_png=True, real_wav=True,
                           real_avi=True, real_jpeg=True)
    for p0, p1, m in zip(t0.column("payload").to_pylist(),
                         t.column("payload").to_pylist(), mimes):
        if m != "audio/adpcm":
            assert p0 == p1
