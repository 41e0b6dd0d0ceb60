"""Zero-exchange clustered merge join (clustered_merge_join): joined rows
≡ pandas merge on many-to-many keys duplicated ACROSS file boundaries,
disjoint key spaces, one-side-empty ranges skipped, non-integer key
refusal."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from xmlschema_ray.ops.relational import to_pandas_with_schema
from xmlschema_ray.sources.clustered import clustered_merge_join, write_clustered


def _layout(tmp_path, name, df, key, blocks=6):
    out = str(tmp_path / name)
    write_clustered(rd.from_pandas(df).repartition(blocks), key, out)
    return out


def _mk_joined_rows():
    # a CLOSURE: module-level test functions pickle by reference and the
    # test module is not importable inside Ray workers
    def joined(la: pd.DataFrame, lb: pd.DataFrame) -> pd.DataFrame:
        return lb.merge(la, left_on="kb", right_on="ka")

    return joined


def test_merge_join_equals_pandas_many_to_many(ray_session, tmp_path):
    rng = np.random.default_rng(41)
    # heavy duplication so equal keys straddle file boundaries
    a = pd.DataFrame(
        {
            "ka": rng.integers(0, 25, 200).astype("int64"),
            "va": np.arange(200, dtype="int64"),
        }
    )
    b = pd.DataFrame(
        {
            "kb": rng.integers(0, 25, 300).astype("int64"),
            "vb": np.arange(300, dtype="int64"),
        }
    )
    da = _layout(tmp_path, "a", a, "ka")
    db = _layout(tmp_path, "b", b, "kb")
    got = to_pandas_with_schema(clustered_merge_join(da, db, _mk_joined_rows()))
    want = b.merge(a, left_on="kb", right_on="ka")
    key = ["ka", "va", "kb", "vb"]
    got = got[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_merge_join_disjoint_and_partial_overlap(ray_session, tmp_path):
    a = pd.DataFrame({"ka": np.arange(0, 50, dtype="int64"), "va": np.arange(50, dtype="int64")})
    b = pd.DataFrame({"kb": np.arange(100, 150, dtype="int64"), "vb": np.arange(50, dtype="int64")})
    da = _layout(tmp_path, "a2", a, "ka", blocks=4)
    db = _layout(tmp_path, "b2", b, "kb", blocks=4)
    got = to_pandas_with_schema(clustered_merge_join(da, db, _mk_joined_rows()))
    assert len(got) == 0
    # partial overlap: only the shared band joins
    c = pd.DataFrame({"kb": np.arange(40, 90, dtype="int64"), "vb": np.arange(50, dtype="int64")})
    dc = _layout(tmp_path, "c2", c, "kb", blocks=4)
    got = to_pandas_with_schema(clustered_merge_join(da, dc, _mk_joined_rows()))
    want = c.merge(a, left_on="kb", right_on="ka")
    assert len(got) == len(want) == 10
    assert sorted(got["ka"]) == list(range(40, 50))


def test_merge_join_rejects_non_integer_key(ray_session, tmp_path):
    a = pd.DataFrame({"ka": ["x", "y"], "va": [1, 2]})
    b = pd.DataFrame({"kb": np.arange(2, dtype="int64"), "vb": [1, 2]})
    da = _layout(tmp_path, "a3", a, "ka", blocks=1)
    db = _layout(tmp_path, "b3", b, "kb", blocks=1)
    with pytest.raises(ValueError, match="integer cluster key"):
        clustered_merge_join(da, db, _mk_joined_rows())
