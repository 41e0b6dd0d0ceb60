import pandas as pd
import pyarrow as pa

import ray.data as rd

from xmlschema_ray.ops.transform import fill_defaults, parse_booleans, parse_timestamps


def test_fill_defaults(ray_session):
    ds = rd.from_arrow(
        pa.table({"a": pa.array([1, None, 3], type=pa.int64()), "b": pa.array(["x", None, None])})
    )
    out = fill_defaults(ds, {"a": 0, "b": "unknown"}).to_pandas()
    assert out["a"].tolist() == [1, 0, 3]
    assert out["b"].tolist() == ["x", "unknown", "unknown"]


def test_parse_timestamps_invalid_becomes_null(ray_session):
    ds = rd.from_arrow(pa.table({"ts": pa.array(["2024-01-02 03:04:05", "not a date"])}))
    out = parse_timestamps(ds, "ts").to_pandas()
    assert out["ts"].iloc[0] == pd.Timestamp("2024-01-02 03:04:05")
    assert pd.isna(out["ts"].iloc[1])


def test_parse_booleans(ray_session):
    ds = rd.from_arrow(pa.table({"f": pa.array(["true", "0", "1", "false", "junk", None])}))
    out = parse_booleans(ds, "f").to_pandas()
    assert out["f"].tolist()[:4] == [True, False, True, False]
    assert pd.isna(out["f"].iloc[4]) and pd.isna(out["f"].iloc[5])
