"""Point-in-time SCD2 enrichment (orders_scd2_enrich): brute-force
interval-join replay (incl. same-timestamp version collapse, orders
exactly at a boundary, orders before any history, customers with no
history), and the no-future-leak property."""

import numpy as np
import pandas as pd

from xmlschema_ray.pipelines.relational import orders_scd2_enrich


def _corpus(tmp_path, events, orders):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pd.DataFrame(events).to_parquet(d / "events.parquet", index=False)
    pd.DataFrame(orders).to_parquet(d / "orders.parquet", index=False)
    return str(d)


def _ts(s):
    return pd.Timestamp(s).as_unit("us")


def _brute(events, orders):
    """Reference replay: build versions (change rows ordered by (ts,
    event_id)), then for each order pick the version whose
    [valid_from, valid_to) contains the date."""
    ev = pd.DataFrame(events).sort_values(["user_id", "ts", "event_id"])
    rows = []
    for uid, g in ev.groupby("user_id"):
        prev = None
        vers = []
        for _, r in g.iterrows():
            if prev is None or r["event_type"] != prev:
                vers.append([r["event_type"], r["ts"]])
            prev = r["event_type"]
        for i, (typ, frm) in enumerate(vers):
            to = vers[i + 1][1] if i + 1 < len(vers) else None
            rows.append((uid, i + 1, typ, frm, to))
    out = []
    for o in pd.DataFrame(orders).itertuples():
        match = [
            r
            for r in rows
            if r[0] == o.o_custkey
            and r[3] <= o.o_orderdate
            and (r[4] is None or o.o_orderdate < r[4])
        ]
        assert len(match) <= 1
        if match:
            out.append((o.o_orderkey, match[0][2], float(match[0][1])))
        else:
            out.append((o.o_orderkey, None, np.nan))
    return pd.DataFrame(out, columns=["o_orderkey", "type_at_order", "version"]).sort_values(
        "o_orderkey"
    ).reset_index(drop=True)


def test_scd2_enrich_matches_bruteforce(ray_session, tmp_path):
    events = {
        "event_id": [1, 2, 3, 4, 5, 6, 7],
        "user_id": [10, 10, 10, 10, 20, 20, 30],
        "event_type": ["a", "a", "b", "a", "x", "x", "z"],
        "ts": [
            _ts("2024-01-01"),
            _ts("2024-01-05"),
            _ts("2024-01-10"),
            _ts("2024-02-01"),
            _ts("2024-01-03"),
            _ts("2024-03-01"),
            _ts("2024-01-07"),
        ],
        "value": [0.0] * 7,
        "props": [""] * 7,
    }
    orders = {
        "o_orderkey": [100, 101, 102, 103, 104, 105, 106],
        "o_custkey": [10, 10, 10, 10, 20, 30, 99],
        "o_orderdate": [
            _ts("2023-12-31"),  # before any history -> NULL
            _ts("2024-01-10"),  # exactly at a boundary -> new version
            _ts("2024-01-09"),  # inside version 1
            _ts("2024-06-01"),  # open current version
            _ts("2024-02-01"),  # no-op update must not bump version
            _ts("2024-01-07"),  # boundary of the only version
            _ts("2024-01-01"),  # customer with no history -> NULL
        ],
    }
    sf = _corpus(tmp_path, events, orders)
    got = orders_scd2_enrich(sf)
    want = _brute(events, orders)
    pd.testing.assert_frame_equal(
        got[["o_orderkey", "type_at_order", "version"]], want
    )
    by = got.set_index("o_orderkey")
    assert by.loc[100, "type_at_order"] is None
    assert by.loc[101, "type_at_order"] == "b" and by.loc[101, "version"] == 2.0
    assert by.loc[102, "type_at_order"] == "a" and by.loc[102, "version"] == 1.0
    assert by.loc[103, "type_at_order"] == "a" and by.loc[103, "version"] == 3.0
    assert by.loc[104, "version"] == 1.0  # x->x no-op never opened v2
    assert by.loc[106, "type_at_order"] is None


def test_scd2_enrich_same_ts_change_takes_later_event(ray_session, tmp_path):
    # two changes at the SAME timestamp: the zero-length first version
    # must never match an order at/after that instant
    events = {
        "event_id": [1, 2, 3],
        "user_id": [5, 5, 5],
        "event_type": ["a", "b", "c"],
        "ts": [_ts("2024-01-01"), _ts("2024-01-02"), _ts("2024-01-02")],
        "value": [0.0] * 3,
        "props": [""] * 3,
    }
    orders = {
        "o_orderkey": [1, 2],
        "o_custkey": [5, 5],
        "o_orderdate": [_ts("2024-01-02"), _ts("2024-01-01")],
    }
    got = orders_scd2_enrich(_corpus(tmp_path, events, orders)).set_index("o_orderkey")
    assert got.loc[1, "type_at_order"] == "c" and got.loc[1, "version"] == 3.0
    assert got.loc[2, "type_at_order"] == "a" and got.loc[2, "version"] == 1.0


def test_scd2_enrich_never_leaks_future(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    n_ev = 300
    events = {
        "event_id": np.arange(1, n_ev + 1),
        "user_id": rng.integers(0, 12, n_ev),
        "event_type": rng.choice(["a", "b", "c"], n_ev),
        "ts": pd.to_datetime("2024-01-01").as_unit("us")
        + pd.to_timedelta(rng.integers(0, 10_000_000, n_ev), unit="s").as_unit("us"),
        "value": np.zeros(n_ev),
        "props": [""] * n_ev,
    }
    n_o = 120
    orders = {
        "o_orderkey": np.arange(n_o),
        "o_custkey": rng.integers(0, 14, n_o),
        "o_orderdate": pd.to_datetime("2024-01-01").as_unit("us")
        + pd.to_timedelta(rng.integers(-100_000, 11_000_000, n_o), unit="s").as_unit("us"),
    }
    sf = _corpus(tmp_path, events, orders)
    got = orders_scd2_enrich(sf)
    want = _brute(events, orders)
    pd.testing.assert_frame_equal(got[["o_orderkey", "type_at_order", "version"]], want)
    # no-leak: the matched version's valid_from never exceeds the order date
    ev = pd.DataFrame(events)
    for r in got.dropna(subset=["version"]).itertuples():
        first_ts = ev[ev["user_id"] == r.o_custkey]["ts"].min()
        assert first_ts <= r.o_orderdate
