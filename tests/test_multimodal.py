"""Multimodal plumbing: decode / resize / frame-sample actor stages over
opaque binary payload columns (kernels stubbed, contracts real)."""

import numpy as np
import pytest
import ray.data

from ee_outliers_ray.multimodal import (
    FrameSampler,
    MediaDecode,
    MediaResize,
    decode_features,
    resize_images,
    sample_frames,
    synth_media_table,
)


def test_decode_features_deterministic():
    ds = ray.data.from_arrow(synth_media_table(n=32, seed=5))
    out = decode_features(ds, fake=True).to_pandas().sort_values("media_id")
    out2 = decode_features(ds, fake=True).to_pandas().sort_values("media_id")
    assert len(out) == 32
    assert all(len(f) == 16 for f in out["features"])
    assert [list(f) for f in out["features"]] == \
        [list(f) for f in out2["features"]]
    assert "payload" not in out.columns  # wide binary dropped after stage


def test_decode_real_path_raises():
    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        MediaDecode(fake=False)._decode_one(b"xx")


def test_resize_rewrites_image_metadata():
    t = synth_media_table(n=48, seed=5)
    ds = ray.data.from_arrow(t)
    out = resize_images(ds, target_w=64, target_h=64).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    src = t.to_pandas().sort_values("media_id").reset_index(drop=True)
    img = src["kind"] == "image"
    assert (out.loc[img.to_numpy(), "width"] == 64).all()
    assert (out.loc[img.to_numpy(), "height"] == 64).all()
    # non-image rows untouched (payload + dims)
    ni = (~img).to_numpy()
    assert (out.loc[ni, "width"].to_numpy() ==
            src.loc[ni, "width"].to_numpy()).all()
    assert all(a == b for a, b in zip(out.loc[ni, "payload"],
                                      src.loc[ni, "payload"]))
    with pytest.raises(NotImplementedError):
        MediaResize(fake=False)._resize_one(b"zz")


def test_frame_sampler_fan_out():
    t = synth_media_table(n=48, seed=5)
    ds = ray.data.from_arrow(t)
    out = sample_frames(ds, num_frames=3).to_pandas()
    n_videos = int((t["kind"].to_pandas() == "video").sum())
    assert len(out) == n_videos * 3
    assert set(out["frame_idx"]) == {0, 1, 2}
    # frame timestamps within duration, monotone per media_id
    for _, g in out.groupby("media_id"):
        ts = g.sort_values("frame_idx")["frame_ts_ms"].to_numpy()
        assert (np.diff(ts) >= 0).all()
    with pytest.raises(NotImplementedError):
        FrameSampler(fake=False)._sample_one(b"zz", 100)


def test_png_codec_roundtrip_all_filters():
    """Pure-stdlib PNG codec: encode/decode roundtrip across every spec
    filter type and channel count; Paeth pinned to the spec function."""
    from ee_outliers_ray.png import _paeth, decode_png, encode_png, png_info

    rng = np.random.default_rng(9)
    for ch in (1, 3, 4):
        for mode in ("none", "cycle"):
            img = rng.integers(0, 256, size=(21, 13, ch)).astype(np.uint8)
            data = encode_png(img, filter_mode=mode)
            assert png_info(data) == (13, 21, ch)
            assert np.array_equal(decode_png(data), img)
    # spec: predictor picks the neighbor closest to p = a + b - c
    assert _paeth(3, 9, 9) == 3
    assert _paeth(9, 3, 9) == 3
    assert _paeth(100, 101, 1) == 101


def test_real_png_decode_and_resize_paths():
    """Image rows with real PNG payloads take the REAL pixel path even
    with fake=False; features reflect actual pixel statistics."""
    from ee_outliers_ray.png import decode_png, encode_png

    img = np.full((20, 10, 3), 128, dtype=np.uint8)
    img[:, :, 0] = 255  # red-heavy
    payload = encode_png(img)
    feats = MediaDecode(fake=False)._decode_one(payload)
    assert feats[0] == 20 and feats[1] == 10 and feats[2] == 3
    assert abs(feats[5] - 1.0) < 1e-6          # R channel mean = 255
    assert abs(feats[6] - 128 / 255) < 1e-6    # G channel mean

    resized = MediaResize(target_w=5, target_h=4, fake=False) \
        ._resize_one(payload)
    back = decode_png(resized)
    assert back.shape == (4, 5, 3)
    assert (back[:, :, 0] == 255).all()


def test_media_features_real_png_table():
    ds = ray.data.from_arrow(synth_media_table(n=32, seed=5, real_png=True))
    out = decode_features(ds, fake=True).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    src = synth_media_table(n=32, seed=5, real_png=True).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    img_rows = src["kind"] == "image"
    assert img_rows.any()
    # real path: features[0:2] are the actual decoded (h, w)
    for i in np.flatnonzero(img_rows.to_numpy()):
        f = out["features"].iloc[i]
        assert f[0] == src["height"].iloc[i]
        assert f[1] == src["width"].iloc[i]


def test_wav_codec_roundtrip():
    from ee_outliers_ray.wav import decode_wav, encode_wav, is_wav

    rng = np.random.default_rng(7)
    for ch in (1, 2):
        s = rng.integers(-32768, 32767, size=(777, ch)).astype(np.int16)
        payload = encode_wav(s, rate=8000)
        assert is_wav(payload)
        got, rate = decode_wav(payload)
        assert rate == 8000
        np.testing.assert_array_equal(got, s)
    assert not is_wav(b"RIFFxxxxJUNK")
    assert not is_wav(b"\x89PNG")


def test_wav_audio_features_golden():
    """Pure tone: duration/rate/channels exact; spectral energy lands in
    the band containing the tone frequency."""
    from ee_outliers_ray.wav import audio_features, decode_wav, encode_wav

    rate, freq = 8000, 1000.0
    t = np.arange(rate) / rate  # 1 second
    sig = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    samples, r = decode_wav(encode_wav(sig, rate))
    f = audio_features(samples, r)
    assert f[0] == pytest.approx(1.0)           # duration s
    assert f[1] == pytest.approx(rate / 1e5)
    assert f[2] == 1.0                          # channels
    assert f[3] == pytest.approx(0.5 / np.sqrt(2), rel=1e-2)  # sine RMS
    # 1 kHz at nyquist 4 kHz -> band 2 of 8 holds nearly all energy
    assert f[5 + 2] > 0.9


def test_media_features_real_wav_table():
    """Audio rows decode for REAL: feature[0] equals duration_ms/1000
    from the table metadata, and decode is deterministic."""
    ds = ray.data.from_arrow(synth_media_table(n=48, seed=5, real_png=True,
                                               real_wav=True))
    out = decode_features(ds, fake=True).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    src = synth_media_table(n=48, seed=5, real_png=True,
                            real_wav=True).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    audio_rows = src["kind"] == "audio"
    assert audio_rows.any()
    for i in np.flatnonzero(audio_rows.to_numpy()):
        f = out["features"].iloc[i]
        assert f[0] == pytest.approx(src["duration_ms"].iloc[i] / 1000.0,
                                     abs=1e-3)
        assert f[1] == pytest.approx(0.08)      # 8 kHz
        assert f[2] == 1.0
    # fake=False must now ACCEPT wav (real path) but reject opaque video
    from ee_outliers_ray.multimodal import MediaDecode

    dec = MediaDecode(fake=False)
    wav_payload = src.loc[audio_rows, "payload"].iloc[0]
    assert len(dec._decode_one(wav_payload)) == 16
    with pytest.raises(NotImplementedError):
        dec._decode_one(b"not media")


def test_avi_codec_roundtrip():
    """Pure-stdlib AVI codec: encode/decode is pixel-exact for
    uncompressed RGB24 frames, preserves fps, and rejects non-AVI and
    compressed ('00dc') streams."""
    from ee_outliers_ray.avi import decode_avi, encode_avi, is_avi

    rng = np.random.default_rng(11)
    for nf, h, w in [(1, 7, 5), (4, 16, 9), (6, 10, 12)]:
        frames = rng.integers(0, 256, size=(nf, h, w, 3)).astype(np.uint8)
        payload = encode_avi(frames, fps=12)
        assert is_avi(payload)
        got, fps = decode_avi(payload)
        assert fps == 12
        np.testing.assert_array_equal(got, frames)
    assert not is_avi(b"RIFFxxxxWAVE")
    # compressed stream fourcc raises (caller falls back to the stub)
    comp = encode_avi(rng.integers(0, 256, size=(2, 4, 4, 3))
                      .astype(np.uint8)).replace(b"00db", b"00dc")
    with pytest.raises(ValueError, match="00dc"):
        decode_avi(comp)


def test_frame_sampler_real_avi():
    """AVI payloads sample REAL frames: each emitted frame is a PNG of
    the exact source pixels, evenly spaced, with fps-derived
    timestamps."""
    from ee_outliers_ray.avi import encode_avi
    from ee_outliers_ray.png import decode_png

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(6, 9, 11, 3)).astype(np.uint8)
    payload = encode_avi(frames, fps=10)
    out = FrameSampler(num_frames=3, fake=False)._sample_one(payload, 600)
    assert [(i, ts) for i, ts, _ in out] == [(0, 0), (1, 200), (2, 400)]
    for k, (_, _, png_bytes) in zip([0, 2, 4], out):
        np.testing.assert_array_equal(decode_png(png_bytes), frames[k])
    # more samples requested than frames available: clamps to n frames
    out2 = FrameSampler(num_frames=16, fake=False)._sample_one(payload, 600)
    assert len(out2) == 6


def test_media_features_real_avi_table():
    """Video rows decode for REAL: feature[0] is the true frame count,
    [1:3] the true dims, [4] the duration in seconds."""
    src_t = synth_media_table(n=48, seed=5, real_png=True, real_wav=True,
                              real_avi=True)
    ds = ray.data.from_arrow(src_t)
    out = decode_features(ds, fake=False).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    src = src_t.to_pandas().sort_values("media_id").reset_index(drop=True)
    vid = src["kind"] == "video"
    assert vid.any()
    for i in np.flatnonzero(vid.to_numpy()):
        f = out["features"].iloc[i]
        assert f[1] == src["height"].iloc[i]
        assert f[2] == src["width"].iloc[i]
        assert f[3] == 10.0  # fps
        assert f[4] == pytest.approx(src["duration_ms"].iloc[i] / 1000.0,
                                     abs=0.1)
    # the real trio means fake=False now works END TO END on this table
    assert len(out) == 48


def test_frame_sampler_pipeline_real_avi():
    """End-to-end: sample_frames over a real-AVI table fans out one row
    per sampled frame, and the frames feed the image decode stage."""
    t = synth_media_table(n=32, seed=5, real_avi=True)
    n_videos = int((t["kind"].to_pandas() == "video").sum())
    out = sample_frames(ray.data.from_arrow(t), num_frames=2,
                        fake=False).to_pandas()
    assert (out.groupby("media_id").size() <= 2).all()
    assert len(out["media_id"].unique()) == n_videos
    # sampled frames are decodable PNGs -> image feature path works
    feats = MediaDecode(fake=False)._decode_one(out["frame"].iloc[0])
    assert feats[0] > 0 and feats[1] > 0


def test_wav_lookalike_payload_falls_to_stub():
    """A truncated/garbage RIFF/WAVE payload must not crash the decode
    stage: fake=True falls through to the deterministic stub, fake=False
    raises."""
    bad = b"RIFF\x10\x00\x00\x00WAVEjunkjunk"
    f = MediaDecode(fake=True)._decode_one(bad)
    assert len(f) == 16
    with pytest.raises(Exception):
        MediaDecode(fake=False)._decode_one(bad)
