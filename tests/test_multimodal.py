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
