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


def test_phash_pairs_exact_vs_bruteforce(ray_session):
    """Banded pair search equals brute-force all-pairs Hamming at k<=3
    (pigeonhole guarantee), and every planted variant pairs with its base."""
    import numpy as np
    import pandas as pd

    from xmlschema_ray.pipelines.multimodal import phash_dup_pairs

    sf = "/root/testdata/sf0.001"
    got = phash_dup_pairs(sf)
    import hashlib

    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    ids = docs["doc_id"].to_numpy(np.int64)
    h = np.array(
        [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in docs["text"]],
        dtype=np.int64,
    )
    var = ids % 7 == 0
    all_ids = np.concatenate([ids, ids[var] + 1_000_000_000])
    all_h = np.concatenate(
        [h, h[var] ^ (np.int64(1) << (ids[var] % 60)) ^ (np.int64(1) << ((ids[var] * 11) % 60))]
    )
    ia, ib = np.triu_indices(len(all_ids), k=1)
    # order pairs by id, not index
    a, b = all_ids[ia], all_ids[ib]
    swap = a > b
    a[swap], b[swap] = b[swap], a[swap]
    x = np.bitwise_xor(all_h[ia], all_h[ib]).astype(np.uint64)
    d = np.zeros(len(x), dtype=np.int64)
    while x.any():
        d += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    keep = d <= 2
    want = (
        pd.DataFrame({"item_id_a": a[keep], "item_id_b": b[keep], "hamming": d[keep]})
        .sort_values(["item_id_a", "item_id_b"])
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, want)
    planted = set(zip(ids[var].tolist(), (ids[var] + 1_000_000_000).tolist()))
    found = set(zip(got["item_id_a"], got["item_id_b"]))
    assert planted <= found and len(planted) > 0
