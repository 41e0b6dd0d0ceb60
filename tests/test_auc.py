"""auc_urgent_price — exact distributed ROC AUC: brute-force pairwise
replay on a crafted orders table dense with score ties (the mid-rank
term), forced num_ranges identity (1 vs 16 — tie co-location and the
cross-range driver fold must agree with the no-replication plan), the
single-class degenerate (AUC undefined -> NaN, counts still exact), and
the zero-row typed result. The DuckDB window oracle gates the full
pipeline at 3 SFs."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from xmlschema_ray.pipelines.analytics import auc_urgent_price


def _orders(prices, priorities):
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(len(prices), dtype=np.int64),
            "o_custkey": np.zeros(len(prices), dtype=np.int64),
            "o_orderstatus": ["O"] * len(prices),
            "o_totalprice": np.asarray(prices, dtype=np.float64),
            "o_orderdate": pd.Series(
                [pd.Timestamp("2024-01-01")] * len(prices), dtype="datetime64[us]"
            ),
            "o_orderpriority": priorities,
        }
    )
    return df


def _write(tmp_path, df):
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp_path / "orders.parquet")
    return str(tmp_path)


def _brute(df):
    sc = np.floor(df["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    lab = (df["o_orderpriority"].to_numpy() == "1-URGENT").astype(np.int64)
    pos = sc[lab == 1]
    neg = sc[lab == 0]
    gt = sum(1 for p, q in itertools.product(pos, neg) if p > q)
    eq = sum(1 for p, q in itertools.product(pos, neg) if p == q)
    denom = 2 * len(pos) * len(neg)
    return (
        len(pos),
        len(neg),
        gt,
        eq,
        (2 * gt + eq) / denom if denom else float("nan"),
    )


def test_brute_force_with_ties(tmp_path, ray_session):
    rng = np.random.default_rng(7)
    # heavy ties: prices drawn from 12 distinct values, mixed labels per value
    prices = rng.choice([10.0, 10.5, 11.0, 20.0, 20.0, 33.33, 40.0, 55.5, 60.0, 60.0, 71.0, 99.99], size=200)
    priorities = rng.choice(["1-URGENT", "3-MEDIUM"], size=200, p=[0.3, 0.7])
    df = _orders(prices, priorities)
    sf = _write(tmp_path, df)
    got = auc_urgent_price(sf)
    n_pos, n_neg, gt, eq, auc = _brute(df)
    assert got.loc[0, "n_pos"] == n_pos and got.loc[0, "n_neg"] == n_neg
    assert got.loc[0, "pairs_gt"] == gt and got.loc[0, "pairs_eq"] == eq
    assert got.loc[0, "auc"] == auc  # exact: one division of exact ints
    assert eq > 0  # fixture actually exercises the tie term


def test_forced_many_ranges_identical(tmp_path, ray_session):
    rng = np.random.default_rng(11)
    prices = rng.uniform(1, 1000, size=500).round(2)
    priorities = rng.choice(["1-URGENT", "2-HIGH"], size=500)
    sf = _write(tmp_path, _orders(prices, priorities))
    one = auc_urgent_price(sf, num_ranges=1)
    many = auc_urgent_price(sf, num_ranges=16)
    pd.testing.assert_frame_equal(one, many)


def test_single_class_nan(tmp_path, ray_session):
    sf = _write(tmp_path, _orders([1.0, 2.0, 3.0], ["1-URGENT"] * 3))
    got = auc_urgent_price(sf)
    assert got.loc[0, "n_pos"] == 3 and got.loc[0, "n_neg"] == 0
    assert got.loc[0, "pairs_gt"] == 0 and got.loc[0, "pairs_eq"] == 0
    assert np.isnan(got.loc[0, "auc"])


def test_empty_orders_typed(tmp_path, ray_session):
    sf = _write(tmp_path, _orders([], []))
    got = auc_urgent_price(sf)
    assert list(got.columns) == ["n_pos", "n_neg", "pairs_gt", "pairs_eq", "auc"]
    assert got.loc[0, "n_pos"] == 0 and np.isnan(got.loc[0, "auc"])
