"""Diagnostics-family invariants: key_skew_report, join_size_bounds and
extendedprice_deciles checked against independent pandas recomputes."""

import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def test_join_size_bounds_invariants(ray_session):
    from xmlschema_ray.pipelines.relational import join_size_bounds

    out = join_size_bounds(SF_DIR)
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_orderkey"])
    l = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey"])
    true_size = len(o.merge(l, left_on="o_orderkey", right_on="l_orderkey"))
    assert int(out["exact_join_size"].iloc[0]) == true_size > 0
    # both bounds dominate the exact size
    assert int(out["bound_l1_linf"].iloc[0]) >= true_size
    assert float(out["bound_l2"].iloc[0]) >= true_size
    # l2 (Cauchy-Schwarz) recompute
    da = o.groupby("o_orderkey").size().to_numpy(np.float64)
    db = l.groupby("l_orderkey").size().to_numpy(np.float64)
    assert abs(float(out["bound_l2"].iloc[0]) - np.sqrt((da**2).sum()) * np.sqrt((db**2).sum())) < 1e-6


def test_key_skew_report_matches_pandas(ray_session):
    from xmlschema_ray.pipelines.relational import key_skew_report

    got = key_skew_report(SF_DIR)
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["source"])
    c = docs.groupby("source").size().sort_values(kind="mergesort").to_numpy(np.int64)
    row = got[got["table_col"] == "documents.source"].iloc[0]
    k = len(c)
    assert row["n_rows"] == c.sum() and row["n_distinct"] == k and row["top1_n"] == c.max()
    r = np.arange(1, k + 1, dtype=np.int64)
    gini = 2.0 * int((r * np.sort(c)).sum()) / (float(k) * float(c.sum())) - float(k + 1) / k
    assert abs(row["gini"] - gini) < 1e-12
    # uniform-ish source distribution → low Gini; and Gini ∈ [0, 1)
    assert (got["gini"] >= 0).all() and (got["gini"] < 1).all()


def test_deciles_match_numpy_selection(ray_session):
    from xmlschema_ray.pipelines.relational import extendedprice_deciles

    got = extendedprice_deciles(SF_DIR)
    v = np.sort(
        pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_extendedprice"])[
            "l_extendedprice"
        ].to_numpy(np.float64)
    )
    n = len(v)
    exp = [v[((n - 1) * k) // 10] for k in range(1, 10)]  # 0-based index of rank
    assert got["decile"].tolist() == list(range(1, 10))
    assert got["value"].tolist() == exp
