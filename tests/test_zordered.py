"""Z-order clustered layout (sources.zordered): pruned read ≡ full read +
filter on random boxes (incl. boundary duplicates and negative
coordinates), second-dimension-only pruning (the property a 1-D sort
cannot give), empty-box typed schema, unbounded reads."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from xmlschema_ray.ops.relational import to_pandas_with_schema
from xmlschema_ray.sources.zordered import (
    prune_files_box,
    read_zordered,
    write_zordered,
)


def _grid_df(n: int = 48, dup_at: int = 10) -> pd.DataFrame:
    """n×n integer grid with duplicated rows pinned at a boundary value."""
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    df = pd.DataFrame(
        {
            "x": xs.ravel().astype("int64"),
            "y": ys.ravel().astype("int64"),
            "v": (xs.ravel() * 31 + ys.ravel()).astype("int64"),
        }
    )
    dup = df[(df["x"] == dup_at) | (df["y"] == dup_at)]
    return pd.concat([df, dup, dup], ignore_index=True)


def _build(tmp_path, df: pd.DataFrame, blocks: int = 16) -> str:
    out = str(tmp_path / "zlayout")
    write_zordered(rd.from_pandas(df).repartition(blocks), "x", "y", out)
    return out


def _full_filter(df, x_lo, x_hi, y_lo, y_hi):
    m = np.ones(len(df), dtype=bool)
    if x_lo is not None:
        m &= df["x"].to_numpy() >= x_lo
    if x_hi is not None:
        m &= df["x"].to_numpy() <= x_hi
    if y_lo is not None:
        m &= df["y"].to_numpy() >= y_lo
    if y_hi is not None:
        m &= df["y"].to_numpy() <= y_hi
    return df[m].sort_values(["x", "y", "v"]).reset_index(drop=True)


def _read_sorted(out, **kw):
    got = to_pandas_with_schema(read_zordered(out, **kw))
    return got.sort_values(["x", "y", "v"]).reset_index(drop=True)


def test_zordered_pruned_equals_full_filter(ray_session, tmp_path):
    df = _grid_df()
    out = _build(tmp_path, df)
    rng = np.random.default_rng(3)
    boxes = [tuple(sorted(rng.integers(0, 48, 2))) + tuple(sorted(rng.integers(0, 48, 2))) for _ in range(5)]
    boxes.append((10, 10, 0, 47))  # boundary-duplicate row band
    boxes.append((0, 47, 10, 10))
    for x_lo, x_hi, y_lo, y_hi in boxes:
        got = _read_sorted(out, x_lo=x_lo, x_hi=x_hi, y_lo=y_lo, y_hi=y_hi)
        want = _full_filter(df, x_lo, x_hi, y_lo, y_hi)
        pd.testing.assert_frame_equal(got[["x", "y", "v"]], want[["x", "y", "v"]])


def test_zordered_prunes_on_second_dimension_alone(ray_session, tmp_path):
    df = _grid_df()
    out = _build(tmp_path, df)
    kept_y, total = prune_files_box(out, y_lo=0, y_hi=5)
    assert total >= 8
    assert len(kept_y) < total  # a 1-D sort on x could never prune this
    kept_x, _ = prune_files_box(out, x_lo=0, x_hi=5)
    assert len(kept_x) < total
    got = _read_sorted(out, y_lo=0, y_hi=5)
    want = _full_filter(df, None, None, 0, 5)
    pd.testing.assert_frame_equal(got[["x", "y", "v"]], want[["x", "y", "v"]])


def test_zordered_empty_box_typed(ray_session, tmp_path):
    out = _build(tmp_path, _grid_df(n=16), blocks=4)
    ds = read_zordered(out, x_lo=1000, x_hi=2000, columns=["x", "v"])
    got = to_pandas_with_schema(ds)
    assert len(got) == 0
    assert list(got.columns) == ["x", "v"]
    kept, _ = prune_files_box(out, x_lo=1000, x_hi=2000)
    assert kept == []


def test_zordered_negative_coordinates(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "x": rng.integers(-500, 500, 4000).astype("int64"),
            "y": rng.integers(-90, 90, 4000).astype("int64"),
            "v": np.arange(4000, dtype="int64"),
        }
    )
    out = _build(tmp_path, df, blocks=8)
    got = _read_sorted(out, x_lo=-100, x_hi=50, y_lo=-10, y_hi=80)
    want = _full_filter(df, -100, 50, -10, 80)
    pd.testing.assert_frame_equal(got[["x", "y", "v"]], want[["x", "y", "v"]])


def test_zordered_unbounded_read_is_everything(ray_session, tmp_path):
    df = _grid_df(n=12)
    out = _build(tmp_path, df, blocks=4)
    got = _read_sorted(out)
    want = df.sort_values(["x", "y", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["x", "y", "v"]], want[["x", "y", "v"]])


def test_zordered_empty_input_raises(ray_session, tmp_path):
    empty = rd.from_pandas(
        pd.DataFrame(
            {
                "x": pd.Series([], dtype="int64"),
                "y": pd.Series([], dtype="int64"),
            }
        )
    )
    with pytest.raises(ValueError, match="empty input"):
        write_zordered(empty, "x", "y", str(tmp_path / "z2"))
