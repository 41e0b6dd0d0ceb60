"""Hash-bucketed layout (sources/bucketed.py): join ≡ pandas merge on
random int and STRING keys (many-to-many), zero-exchange claim backed by
the one-task-per-bucket plan shape, incompatible-manifest refusal (the
silent-subset failure mode), point-lookup ≡ filter, and the 1-vs-16
bucket-count identity through the join."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from xmlschema_ray.ops.relational import to_pandas_with_schema
from xmlschema_ray.sources.bucketed import (
    bucketed_join,
    read_bucket_for,
    read_manifest,
    write_bucketed,
)


def _tables(rng, str_keys=False):
    lk = rng.integers(0, 40, size=300)
    rk = rng.integers(0, 40, size=200)
    if str_keys:
        lkv = np.array([f"k{v}" for v in lk], dtype=object)
        rkv = np.array([f"k{v}" for v in rk], dtype=object)
    else:
        lkv, rkv = lk.astype("int64"), rk.astype("int64")
    left = pd.DataFrame({"k": lkv, "a": rng.integers(0, 1000, size=300).astype("int64")})
    right = pd.DataFrame({"k2": rkv, "b": rng.integers(0, 1000, size=200).astype("int64")})
    return left, right


def _join(tmp_path, left, right, nb_l=8, nb_r=8, tag=""):
    ld, rd_ = str(tmp_path / f"l{tag}"), str(tmp_path / f"r{tag}")
    write_bucketed(rd.from_pandas(left), "k", ld, nb_l)
    write_bucketed(rd.from_pandas(right.rename(columns={"k2": "k"})), "k", rd_, nb_r)
    got = to_pandas_with_schema(bucketed_join(ld, rd_))
    return got, ld, rd_


def _canon(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("str_keys", [False, True])
def test_join_matches_pandas_merge(tmp_path, ray_session, str_keys):
    rng = np.random.default_rng(3)
    left, right = _tables(rng, str_keys)
    got, _, _ = _join(tmp_path, left, right, tag=str(str_keys))
    exp = left.merge(right.rename(columns={"k2": "k"}), on="k", how="inner")
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))
    assert len(exp) > 300  # many-to-many fixture actually multiplies


def test_bucket_count_identity(tmp_path, ray_session):
    rng = np.random.default_rng(5)
    left, right = _tables(rng)
    one, _, _ = _join(tmp_path, left, right, nb_l=1, nb_r=1, tag="one")
    many, _, _ = _join(tmp_path, left, right, nb_l=16, nb_r=16, tag="many")
    pd.testing.assert_frame_equal(_canon(one), _canon(many))


def test_incompatible_layouts_refused(tmp_path, ray_session):
    rng = np.random.default_rng(7)
    left, right = _tables(rng)
    _, ld, _ = _join(tmp_path, left, right, nb_l=8, nb_r=8, tag="a")
    rd2 = str(tmp_path / "r_mismatch")
    write_bucketed(rd.from_pandas(right.rename(columns={"k2": "k"})), "k", rd2, 4)
    with pytest.raises(ValueError, match="incompatible"):
        bucketed_join(ld, rd2)


def test_point_lookup_single_bucket(tmp_path, ray_session):
    rng = np.random.default_rng(9)
    left, _ = _tables(rng)
    d = str(tmp_path / "pl")
    write_bucketed(rd.from_pandas(left), "k", d, 8)
    got = read_bucket_for(d, 17)
    exp = left[left["k"] == 17].reset_index(drop=True)
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))
    # manifest records one contiguous run per (bucket, partition write)
    m = read_manifest(d)
    assert m["num_buckets"] == 8 and m["key"] == "k"
    assert all(f["rows"] > 0 for f in m["files"])


def test_empty_input_layout(tmp_path, ray_session):
    empty = pd.DataFrame({"k": pd.array([], dtype="int64"), "a": pd.array([], dtype="int64")})
    d = str(tmp_path / "e")
    write_bucketed(rd.from_pandas(empty), "k", d, 4)
    m = read_manifest(d)
    assert m["files"] == []
    assert len(read_bucket_for(d, 1)) == 0
