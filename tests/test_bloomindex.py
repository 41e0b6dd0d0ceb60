"""Bloom file-skipping index (sources/bloomindex.py): pruned read ≡ full
read + filter (int and string columns), the no-false-negative property
checked against per-file ground truth, pruning actually skips files on a
planted disjoint layout, typed empty probe/result, unknown-hash refusal."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from xmlschema_ray.ops.relational import to_pandas_with_schema
from xmlschema_ray.sources.bloomindex import (
    BLOOM_MANIFEST,
    build_bloom_index,
    prune_bloom,
    read_with_bloom,
)


def _write_files(d, frames):
    os.makedirs(d, exist_ok=True)
    for i, f in enumerate(frames):
        pq.write_table(pa.Table.from_pandas(f, preserve_index=False), os.path.join(d, f"f{i:03d}.parquet"))


def _canon(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("str_keys", [False, True])
def test_pruned_read_equals_full_filter(tmp_path, ray_session, str_keys):
    rng = np.random.default_rng(31)
    frames, full = [], []
    for i in range(6):
        k = rng.integers(0, 500, 200)
        kv = np.array([f"u{v}" for v in k], dtype=object) if str_keys else k.astype("int64")
        f = pd.DataFrame({"k": kv, "x": rng.integers(0, 99, 200).astype("int64")})
        frames.append(f)
        full.append(f)
    d = str(tmp_path / f"data{str_keys}")
    _write_files(d, frames)
    idx = str(tmp_path / f"idx{str_keys}")
    build_bloom_index(d, "k", idx, m_bits=1 << 14)
    probe = ["u7", "u123", "u9999"] if str_keys else np.array([7, 123, 9999], dtype=np.int64)
    got = to_pandas_with_schema(read_with_bloom(d, idx, probe))
    all_rows = pd.concat(full, ignore_index=True)
    exp = all_rows[all_rows["k"].isin(np.asarray(probe))]
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


def test_no_false_negatives_and_pruning(tmp_path, ray_session):
    # planted DISJOINT key ranges per file: file i holds [100i, 100i+49]
    frames = [
        pd.DataFrame(
            {"k": np.arange(100 * i, 100 * i + 50, dtype="int64"),
             "x": np.full(50, i, dtype="int64")}
        )
        for i in range(8)
    ]
    d, idx = str(tmp_path / "dj"), str(tmp_path / "dji")
    _write_files(d, frames)
    build_bloom_index(d, "k", idx, m_bits=1 << 14)
    probe = np.array([120, 610], dtype=np.int64)  # lives in files 1 and 6 only
    kept, total = prune_bloom(idx, probe)
    assert total == 8
    # no false negatives: the true home files are ALWAYS kept
    assert "f001.parquet" in kept and "f006.parquet" in kept
    # pruning happened (FPR at 2^14 bits / 50 keys is negligible)
    assert len(kept) < total
    got = to_pandas_with_schema(read_with_bloom(d, idx, probe))
    assert sorted(got["k"].tolist()) == [120, 610]
    # absent-everywhere value: result exact-empty regardless of FPR
    got = to_pandas_with_schema(read_with_bloom(d, idx, np.array([99999], dtype=np.int64)))
    assert len(got) == 0


def test_empty_probe_and_int_width_identity(tmp_path, ray_session):
    frames = [pd.DataFrame({"k": np.arange(10, dtype="int64"), "x": np.arange(10, dtype="int64")})]
    d, idx = str(tmp_path / "e"), str(tmp_path / "ei")
    _write_files(d, frames)
    build_bloom_index(d, "k", idx, m_bits=1 << 12)
    kept, total = prune_bloom(idx, np.array([], dtype=np.int64))
    assert kept == [] and total == 1
    out = to_pandas_with_schema(read_with_bloom(d, idx, []))
    assert len(out) == 0 and list(out.columns) == ["k", "x"]
    # an int32 probe must hash identically to the int64 build
    kept32, _ = prune_bloom(idx, np.array([3], dtype=np.int32))
    assert kept32 == ["f000.parquet"]


def test_unknown_hash_refused(tmp_path, ray_session):
    frames = [pd.DataFrame({"k": np.arange(5, dtype="int64")})]
    d, idx = str(tmp_path / "h"), str(tmp_path / "hi")
    _write_files(d, frames)
    build_bloom_index(d, "k", idx)
    with open(os.path.join(idx, BLOOM_MANIFEST)) as fh:
        m = json.load(fh)
    m["hash"] = "other_v0"
    with open(os.path.join(idx, BLOOM_MANIFEST), "w") as fh:
        json.dump(m, fh)
    with pytest.raises(ValueError, match="hash"):
        prune_bloom(idx, np.array([1], dtype=np.int64))
