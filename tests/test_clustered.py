"""Range-clustered layout: zone-map export, file pruning, pruned ≡ full."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from xmlschema_ray.sources.clustered import (
    MANIFEST_NAME,
    prune_files,
    read_clustered,
    write_clustered,
)


def _frame(n=20000, dup_heavy=False, seed=3):
    rng = np.random.default_rng(seed)
    if dup_heavy:
        k = rng.integers(0, 50, size=n).astype("int64") * 10  # many boundary dups
    else:
        k = rng.permutation(n).astype("int64")  # unique keys
    return pd.DataFrame({"k": k, "v": rng.integers(0, 1000, size=n).astype("int64")})


def test_write_clustered_disjoint_ranges_unique_keys(tmp_path, ray_session):
    df = _frame()
    m = write_clustered(rd.from_pandas(df).repartition(8), "k", str(tmp_path))
    zones = sorted(m["files"], key=lambda z: z["min"])
    assert len(zones) >= 2, "layout must produce multiple files to cluster"
    assert sum(z["rows"] for z in zones) == len(df)
    for a, b in zip(zones, zones[1:]):
        assert a["max"] < b["min"]  # unique keys -> strictly disjoint zones
    # manifest matches footers
    for z in zones:
        md = pq.read_metadata(os.path.join(str(tmp_path), z["path"]))
        assert md.num_rows == z["rows"]


def test_pruned_read_equals_full_filter_with_boundary_dups(tmp_path, ray_session):
    df = _frame(dup_heavy=True)
    write_clustered(rd.from_pandas(df).repartition(8), "k", str(tmp_path))
    lo, hi = 120, 260
    got = (
        read_clustered(str(tmp_path), lo=lo, hi=hi)
        .to_pandas()
        .sort_values(["k", "v"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = (
        df[(df["k"] >= lo) & (df["k"] <= hi)]
        .sort_values(["k", "v"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    paths, n_total = prune_files(str(tmp_path), lo, hi)
    assert 0 < len(paths) < n_total, "a narrow band must actually prune files"


def test_read_clustered_empty_band_typed(tmp_path, ray_session):
    df = _frame(n=2000)
    write_clustered(rd.from_pandas(df).repartition(4), "k", str(tmp_path))
    out = read_clustered(str(tmp_path), lo=10**9, hi=2 * 10**9)
    assert out.count() == 0
    # the Dataset CARRIES the layout schema (Ray's bare to_pandas drops
    # columns on empty datasets; to_pandas_with_schema is the boundary)
    assert out.schema().names == ["k", "v"]
    from xmlschema_ray.ops.relational import to_pandas_with_schema

    p = to_pandas_with_schema(out)
    assert len(p) == 0 and list(p.columns) == ["k", "v"]
    # column projection on the empty path too
    out2 = read_clustered(str(tmp_path), lo=10**9, hi=2 * 10**9, columns=["v"])
    assert out2.schema().names == ["v"]
