"""FD discovery (fd_discovery): seeded hold/violation counts, duplicate
rows don't inflate distinct-pair counts, violating-LHS count equals the
repair worklist size."""

import numpy as np
import pandas as pd

from xmlschema_ray.pipelines.relational import fd_discovery


def test_fd_discovery_seeded(ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    # lineitem: l_partkey -> l_suppkey holds (p % 7 mapping); l_orderkey ->
    # l_returnflag violated for exactly orders 0 and 1
    n = 300
    rng = np.random.default_rng(3)
    ok = rng.integers(0, 30, n)
    pk = rng.integers(0, 50, n)
    flags = np.where(ok == 0, rng.choice(["A", "N"], n), "R")
    flags = np.where(ok == 1, rng.choice(["A", "N"], n), flags)
    li = pd.DataFrame(
        {
            "l_orderkey": ok.astype("int64"),
            "l_partkey": pk.astype("int64"),
            "l_suppkey": (pk % 7).astype("int64"),
            "l_returnflag": flags,
        }
    )
    # duplicate every row: distinct-pair counts must not inflate
    li = pd.concat([li, li], ignore_index=True)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(20, dtype="int64"),
            "o_custkey": (np.arange(20, dtype="int64") % 5),
            "o_orderstatus": ["F"] * 20,
            "o_orderpriority": [f"p{i % 2}" for i in range(20)],  # custkey -> prio broken
        }
    )
    li.to_parquet(d / "lineitem.parquet", index=False)
    orders.to_parquet(d / "orders.parquet", index=False)
    got = fd_discovery(str(d)).set_index("fd")
    r = got.loc["lineitem.l_partkey->l_suppkey"]
    assert r["holds"] == 1 and r["n_violating_lhs"] == 0
    assert r["n_lhs"] == r["n_pairs"] == len(np.unique(pk))
    r = got.loc["lineitem.l_orderkey->l_returnflag"]
    # orders 0 and 1 carry two flags each iff both values were drawn
    expect_viol = sum(
        1 for o in (0, 1) if li[li["l_orderkey"] == o]["l_returnflag"].nunique() > 1
    )
    assert r["n_violating_lhs"] == expect_viol
    assert r["holds"] == int(expect_viol == 0)
    r = got.loc["orders.o_orderkey->o_orderstatus"]
    assert r["holds"] == 1 and r["n_lhs"] == 20
    r = got.loc["orders.o_custkey->o_orderpriority"]
    assert r["holds"] == 0 and r["n_violating_lhs"] == 5  # every custkey maps to p0+p1
    assert r["n_pairs"] == 10


def test_ind_discovery_directions(ray_session):
    from xmlschema_ray.pipelines.relational import ind_discovery

    out = ind_discovery("/root/testdata/sf0.001").set_index("ind")
    # every lineitem order key has an orders row; the reverse fails
    # (orders with no lineitem rows exist in the synthetic data)
    fwd = out.loc["lineitem.l_orderkey<=orders.o_orderkey"]
    rev = out.loc["orders.o_orderkey<=lineitem.l_orderkey"]
    assert int(fwd["holds"]) == 1 and int(fwd["n_missing"]) == 0
    assert int(rev["holds"]) == 0 and int(rev["n_missing"]) > 0
    # n_missing never exceeds the dependent's distinct count
    assert (out["n_missing"] <= out["n_dep_distinct"]).all()
