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

# -- compaction (compact_bucketed): CDC apply onto the layout ----------------


def _feed_df(keys, actions, vals):
    return pd.DataFrame(
        {
            "k": np.asarray(keys, dtype="int64"),
            "action": np.asarray(actions, dtype=object),
            "a": np.asarray(vals, dtype="int64"),
        }
    )


def _merge_reference(base: pd.DataFrame, feed: pd.DataFrame) -> pd.DataFrame:
    keep = base[~base["k"].isin(feed["k"])]
    ins = feed.loc[feed["action"] == "upsert", ["k", "a"]]
    return pd.concat([keep, ins], ignore_index=True)


def test_compact_matches_merge_into(tmp_path, ray_session):
    from xmlschema_ray.sources.bucketed import compact_bucketed, read_bucketed

    rng = np.random.default_rng(13)
    keys = rng.permutation(200)[:120]
    base = pd.DataFrame(
        {"k": keys.astype("int64"), "a": rng.integers(0, 1000, 120).astype("int64")}
    )
    d0, d1 = str(tmp_path / "g0"), str(tmp_path / "g1")
    write_bucketed(rd.from_pandas(base), "k", d0, 8)
    # compacted feed: delete 20 existing, update 20 existing, insert 20 new
    feed = pd.concat(
        [
            _feed_df(keys[:20], ["delete"] * 20, [0] * 20),
            _feed_df(keys[20:40], ["upsert"] * 20, rng.integers(0, 1000, 20)),
            _feed_df(np.arange(1000, 1020), ["upsert"] * 20, rng.integers(0, 1000, 20)),
        ],
        ignore_index=True,
    )
    compact_bucketed(d0, rd.from_pandas(feed), d1)
    got = _canon(read_bucketed(d1).to_pandas())
    exp = _canon(_merge_reference(base, feed))
    pd.testing.assert_frame_equal(got, exp)
    # the output is itself a valid layout: point lookup works post-compact
    ins_key = 1000
    assert read_bucket_for(d1, ins_key)["k"].tolist() == [ins_key]
    deleted = int(keys[0])
    assert len(read_bucket_for(d1, deleted)) == 0


def test_compact_untouched_buckets_are_links(tmp_path, ray_session):
    import os

    from xmlschema_ray.sources.bucketed import bucket_of, compact_bucketed, read_bucketed

    rng = np.random.default_rng(17)
    base = pd.DataFrame(
        {"k": np.arange(100, dtype="int64"), "a": rng.integers(0, 100, 100).astype("int64")}
    )
    d0, d1 = str(tmp_path / "h0"), str(tmp_path / "h1")
    write_bucketed(rd.from_pandas(base), "k", d0, 16)
    touch_key = 7
    feed = _feed_df([touch_key], ["upsert"], [999])
    compact_bucketed(d0, rd.from_pandas(feed), d1)
    tb = int(bucket_of(np.asarray([touch_key]), 16)[0])
    m0, m1 = read_manifest(d0), read_manifest(d1)
    ino0 = {f["path"]: os.stat(os.path.join(d0, f["path"])).st_ino for f in m0["files"]}
    rewritten = untouched = 0
    for f in m1["files"]:
        st = os.stat(os.path.join(d1, f["path"]))
        if f["bucket"] == tb:
            rewritten += 1
        else:
            # carried over as a hard link to the generation-0 file
            assert st.st_ino in ino0.values()
            untouched += 1
    assert rewritten >= 1 and untouched >= 1
    got = _canon(read_bucketed(d1).to_pandas())
    exp = _canon(_merge_reference(base, feed))
    pd.testing.assert_frame_equal(got, exp)


def test_compact_generation_chain_and_empty_bucket_insert(tmp_path, ray_session):
    from xmlschema_ray.sources.bucketed import compact_bucketed, read_bucketed

    base = pd.DataFrame({"k": np.asarray([0, 1], dtype="int64"), "a": np.asarray([10, 11], dtype="int64")})
    d0, d1, d2 = str(tmp_path / "c0"), str(tmp_path / "c1"), str(tmp_path / "c2")
    write_bucketed(rd.from_pandas(base), "k", d0, 8)  # most buckets EMPTY
    f1 = _feed_df([0, 50, 51], ["delete", "upsert", "upsert"], [0, 500, 510])
    f2 = _feed_df([50, 1], ["delete", "upsert"], [0, 111])
    compact_bucketed(d0, rd.from_pandas(f1), d1)
    compact_bucketed(d1, rd.from_pandas(f2), d2)
    got = _canon(read_bucketed(d2).to_pandas())
    exp = _canon(_merge_reference(_merge_reference(base, f1), f2))
    pd.testing.assert_frame_equal(got, exp)


def test_compact_refuses_unknown_hash(tmp_path, ray_session):
    import json
    import os

    from xmlschema_ray.sources.bucketed import BUCKET_MANIFEST, compact_bucketed

    base = pd.DataFrame({"k": np.asarray([1], dtype="int64"), "a": np.asarray([2], dtype="int64")})
    d0 = str(tmp_path / "x0")
    write_bucketed(rd.from_pandas(base), "k", d0, 2)
    m = read_manifest(d0)
    m["hash"] = "other_fn_v9"
    with open(os.path.join(d0, BUCKET_MANIFEST), "w") as fh:
        json.dump(m, fh)
    with pytest.raises(ValueError, match="hash"):
        compact_bucketed(d0, rd.from_pandas(_feed_df([1], ["delete"], [0])), str(tmp_path / "x1"))


def test_bucketed_join_refuses_unsupported_how_and_dtype_mismatch(ray_session, tmp_path):
    import pandas as pd
    import pytest as _pt
    import ray.data as rd

    from xmlschema_ray.sources.bucketed import bucketed_join, write_bucketed

    l, r = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed(rd.from_pandas(pd.DataFrame({"k": [1, 2], "a": [1, 1]})), "k", l, 4)
    write_bucketed(
        rd.from_pandas(pd.DataFrame({"k": [1.0, 2.0], "b": [2, 2]})), "k", r, 4
    )
    with _pt.raises(ValueError, match="inner"):
        bucketed_join(l, r, how="outer")
    # int64 vs float64 key: equal values hash to different buckets
    with _pt.raises(ValueError, match="dtype"):
        bucketed_join(l, r)


def test_write_bucketed_refuses_nothing_but_layouts_refuse_stale(ray_session, tmp_path):
    import pandas as pd
    import pytest as _pt
    import ray.data as rd

    from xmlschema_ray.sources.clustered import write_clustered

    d = str(tmp_path / "c")
    write_clustered(rd.from_pandas(pd.DataFrame({"k": [3, 1, 2]})), "k", d)
    # a second build into the same dir would absorb the first build's
    # files into the manifest as duplicated rows — refuse
    with _pt.raises(ValueError, match="stale|FRESH"):
        write_clustered(rd.from_pandas(pd.DataFrame({"k": [9]})), "k", d)
