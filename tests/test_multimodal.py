"""Multimodal stage plumbing: actor pools, deterministic fakes, seams."""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_real_codec_seams_raise():
    from xmlschema_ray.pipelines.multimodal import (
        FrameSampler,
        MediaFeatureExtractor,
        MediaResizer,
    )

    for cls in (MediaFeatureExtractor, MediaResizer, FrameSampler):
        with pytest.raises(NotImplementedError):
            cls()


def test_resizer_deterministic_and_sized():
    from xmlschema_ray.pipelines.multimodal import MediaResizer

    batch = pd.DataFrame({"item_id": [1, 2], "payload": [b"abc", b"defg"]})
    r = MediaResizer(target_w=4, target_h=3, fake=True)
    out1, out2 = r(batch), r(batch)
    pd.testing.assert_frame_equal(out1, out2)  # deterministic across calls
    assert (out1["n_bytes"] == 4 * 3 * 3).all()
    assert all(len(p) == 36 for p in out1["payload"])
    assert out1["width"].tolist() == [4, 4] and out1["height"].tolist() == [3, 3]
    # different payloads -> different pseudo-pixels
    assert out1["payload"][0] != out1["payload"][1]


def test_frame_sampler_fans_out():
    from xmlschema_ray.pipelines.multimodal import FrameSampler

    batch = pd.DataFrame({"item_id": [7], "payload": [bytes(range(40))]})
    out = FrameSampler(n_frames=4, fake=True)(batch)
    assert out["item_id"].tolist() == [7, 7, 7, 7]
    assert out["frame_idx"].tolist() == [0, 1, 2, 3]
    assert b"".join(out["payload"]) == bytes(range(40))  # contiguous cover


def test_resize_pipeline_end_to_end(ray_session):
    from xmlschema_ray.pipelines.multimodal import multimodal_resize_pipeline

    df = multimodal_resize_pipeline(SF_DIR, target_w=4, target_h=4).to_pandas()
    assert len(df) == 500
    assert (df["n_bytes"] == 4 * 4 * 3).all()
    feat_cols = [c for c in df.columns if c.startswith("feat_")]
    assert len(feat_cols) == 8
    assert df[feat_cols].to_numpy().min() >= 0.0
    assert df[feat_cols].to_numpy().max() <= 1.0
