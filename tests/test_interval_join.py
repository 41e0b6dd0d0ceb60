"""session_window_overlap — two-sided interval overlap join: brute-force
pandas replay on a crafted event log whose sessions and busy windows span
range boundaries, forced num_ranges identity (1 vs many ranges — the
ownership rule must keep output sets equal with zero duplicates), and the
empty-input typed schema. The DuckDB interval-predicate oracle gates the
full pipeline at 3 SFs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from xmlschema_ray.pipelines.analytics import session_window_overlap


def _events():
    rows = []
    base = pd.Timestamp("2024-01-01 00:00:00")
    # user 1: one long session spanning two days (crosses any day boundary)
    for h in range(0, 30):
        rows.append((1, base + pd.Timedelta(minutes=20 * h), "click"))
    # user 2: three short sessions on day 1
    for s in range(3):
        t0 = base + pd.Timedelta(hours=3 * s)
        rows.append((2, t0, "view"))
        rows.append((2, t0 + pd.Timedelta(minutes=5), "view"))
    # user 3: a session exactly at a window edge
    rows.append((3, base + pd.Timedelta(hours=23, minutes=50), "click"))
    rows.append((3, base + pd.Timedelta(hours=24, minutes=5), "click"))
    # busy windows need >= min_events per (type, day): pad 'click' day 1+2,
    # 'view' day 1 past the threshold with one more user
    for m in range(10):
        rows.append((9, base + pd.Timedelta(hours=12, minutes=m), "view"))
        rows.append((9, base + pd.Timedelta(hours=36, minutes=m), "buy"))
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    return df


def _write(tmp_path, df):
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False), tmp_path / "events.parquet"
    )
    return str(tmp_path)


def _brute(df, gap_minutes=30, min_events=8):
    gap = pd.Timedelta(minutes=gap_minutes)
    sess = []
    for uid, g in df.sort_values("ts").groupby("user_id"):
        ts = g["ts"].tolist()
        start = prev = ts[0]
        for t in ts[1:]:
            if t - prev > gap:
                sess.append((uid, start, prev))
                start = t
            prev = t
        sess.append((uid, start, prev))
    busy = []
    d = df.assign(day=df["ts"].dt.floor("D"))
    for (et, day), g in d.groupby(["event_type", "day"]):
        if len(g) >= min_events:
            busy.append((et, day, g["ts"].min(), g["ts"].max()))
    rows = []
    for uid, ss, se in sess:
        for et, day, ws, we in busy:
            if ss <= we and ws <= se:
                ov = (min(se, we) - max(ss, ws)).value  # ns
                rows.append((uid, ss, se, et, day, ov // 1000))
    out = pd.DataFrame(
        rows, columns=["user_id", "s_start", "s_end", "event_type", "day", "overlap_us"]
    )
    out["user_id"] = out["user_id"].astype("int64")
    out["overlap_us"] = out["overlap_us"].astype("int64")
    for c in ("s_start", "s_end", "day"):
        out[c] = out[c].astype("datetime64[us]")
    return out.sort_values(["user_id", "s_start", "event_type", "day"]).reset_index(drop=True)


def test_brute_force_equality(tmp_path, ray_session):
    df = _events()
    sf = _write(tmp_path, df)
    got = session_window_overlap(sf, min_events=8)
    exp = _brute(df)
    pd.testing.assert_frame_equal(got, exp)
    assert len(exp) >= 5  # fixture exercises real overlaps


def test_forced_many_ranges_identical(tmp_path, ray_session):
    """num_ranges=1 (no replication) vs many tiny ranges: the ownership
    rule must produce the identical pair set with no duplicates even when
    every interval replicates across several ranges."""
    df = _events()
    sf = _write(tmp_path, df)
    one = session_window_overlap(sf, num_ranges=1)
    many = session_window_overlap(sf, num_ranges=16)
    pd.testing.assert_frame_equal(one, many)
    assert not many.duplicated(["user_id", "s_start", "event_type", "day"]).any()


def test_empty_events_typed(tmp_path, ray_session):
    df = pd.DataFrame(
        {
            "user_id": pd.array([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "event_type": pd.Series([], dtype=object),
            "event_id": pd.array([], dtype="int64"),
        }
    )
    sf = _write(tmp_path, df)
    got = session_window_overlap(sf)
    assert list(got.columns) == ["user_id", "s_start", "s_end", "event_type", "day", "overlap_us"]
    assert len(got) == 0
