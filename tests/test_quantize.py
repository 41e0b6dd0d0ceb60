"""embedding_quantize_int8: code range + endpoint saturation, exact
recompute vs a numpy replay, constant-dimension pinning, batch/file-split
invariance (min/max partials are mergeable), empty corpus."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from xmlschema_ray.pipelines.similarity import embedding_quantize_int8


def _write(tmp_path, mats, split=1):
    import os

    d = str(tmp_path)
    os.makedirs(d, exist_ok=True)
    n = len(mats)
    if split == 1:
        pq.write_table(_tbl(mats, 0), f"{d}/embeddings.parquet")
    else:
        import os

        os.makedirs(f"{d}/embeddings.parquet", exist_ok=True)
        step = -(-n // split)
        for i in range(split):
            chunk = mats[i * step : (i + 1) * step]
            if len(chunk):
                pq.write_table(
                    _tbl(chunk, i * step), f"{d}/embeddings.parquet/p{i}.parquet"
                )
    return d


def _tbl(mats, base):
    return pa.table(
        {
            "vec_id": pa.array(np.arange(base, base + len(mats), dtype=np.int64)),
            "embedding": pa.array(
                [m.astype(np.float32) for m in mats], type=pa.list_(pa.float32())
            ),
        }
    )


def _replay(mats):
    mat = np.stack(mats).astype(np.float64)
    mn, mx = mat.min(axis=0), mat.max(axis=0)
    span = mx - mn
    with np.errstate(divide="ignore", invalid="ignore"):
        codes = np.minimum(np.floor((mat - mn) * 255.0 / span), 255.0)
    codes[:, span == 0.0] = 0.0
    return codes.astype(np.int64)


def test_codes_match_replay_and_saturate(tmp_path, ray_session):
    rng = np.random.default_rng(47)
    mats = [rng.normal(size=8).astype(np.float32) for _ in range(40)]
    mats.append(np.full(8, 9.0, dtype=np.float32))  # per-dim max row
    d = _write(tmp_path, mats)
    got = embedding_quantize_int8(d)
    codes = _replay(mats)
    assert got["code_sum"].tolist() == codes.sum(axis=1).tolist()
    assert got["code_min"].tolist() == codes.min(axis=1).tolist()
    assert got["code_max"].tolist() == codes.max(axis=1).tolist()
    assert codes.min() >= 0 and codes.max() == 255  # max row saturates
    # per-dim min rows land at 0 somewhere
    assert (codes == 0).any()


def test_constant_dimension_pinned_zero(tmp_path, ray_session):
    mats = [np.array([1.0, 5.0], dtype=np.float32), np.array([1.0, 7.0], dtype=np.float32)]
    d = _write(tmp_path, mats)
    got = embedding_quantize_int8(d)
    codes = _replay(mats)
    assert (codes[:, 0] == 0).all()
    assert got["code_min"].tolist() == codes.min(axis=1).tolist()


def test_file_split_invariance(tmp_path, ray_session):
    rng = np.random.default_rng(53)
    mats = [rng.normal(size=6).astype(np.float32) for _ in range(48)]
    one = embedding_quantize_int8(_write(tmp_path / "a", mats))
    many = embedding_quantize_int8(_write(tmp_path / "b", mats, split=6))
    pd.testing.assert_frame_equal(one, many)


def test_empty_corpus(tmp_path, ray_session):
    d = _write(tmp_path, [np.zeros(4, dtype=np.float32)])
    import os

    os.remove(f"{d}/embeddings.parquet")
    pq.write_table(_tbl([], 0), f"{d}/embeddings.parquet")
    out = embedding_quantize_int8(d)
    assert len(out) == 0
    assert list(out.columns) == ["vec_id", "code_sum", "code_min", "code_max"]
