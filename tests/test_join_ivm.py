"""Delta-join IVM (join_ivm_priority_revenue): brute-force version-B
recompute equality on a corpus seeding every corner — deleted order with
surviving AND inserted items, priority flip, delete+insert on the SAME
lineitem row ((k+p) ≡ 0 mod lcm(93,101)), orphan lineitems, a group
driven to zero (must vanish), and a group born only from the delta
('9-MAINT')."""

import numpy as np
import pandas as pd

from xmlschema_ray.pipelines.relational import join_ivm_priority_revenue


def _corpus(tmp_path, orders, lineitem):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pd.DataFrame(orders).to_parquet(d / "orders.parquet", index=False)
    pd.DataFrame(lineitem).to_parquet(d / "lineitem.parquet", index=False)
    return str(d)


def _brute(orders, lineitem):
    o = pd.DataFrame(orders)
    li = pd.DataFrame(lineitem)
    a_new = o[o["o_orderkey"] % 97 != 0].copy()
    a_new["prio"] = np.where(
        a_new["o_orderkey"] % 89 == 0, "9-MAINT", a_new["o_orderpriority"]
    )
    li = li.copy()
    li["price_c"] = np.floor(li["l_extendedprice"] * 100 + 0.5).astype("int64")
    kp = li["l_orderkey"] + li["l_partkey"]
    keep = li[kp % 93 != 0][["l_orderkey", "l_returnflag", "price_c"]]
    ins = li[kp % 101 == 0][["l_orderkey", "l_returnflag", "price_c"]].copy()
    ins["price_c"] += 100
    b_new = pd.concat([keep, ins], ignore_index=True)
    m = b_new.merge(a_new[["o_orderkey", "prio"]], left_on="l_orderkey", right_on="o_orderkey")
    g = (
        m.groupby(["prio", "l_returnflag"], as_index=False)
        .agg(n_items=("price_c", "size"), revenue_c=("price_c", "sum"))
        .rename(columns={"prio": "o_orderpriority"})
        .astype({"n_items": "int64", "revenue_c": "int64"})
    )
    return g.sort_values(["o_orderpriority", "l_returnflag"]).reset_index(drop=True)


def test_join_ivm_equals_recompute_on_seeded_corners(ray_session, tmp_path):
    # orderkeys: 97 (deleted), 89 (flipped), 97*89=8633 (deleted beats
    # flip), 5/7 plain, 11 exists-but-loses-all-items
    orders = {
        "o_orderkey": [97, 89, 8633, 5, 7, 11],
        "o_orderpriority": ["1-URGENT", "2-HIGH", "1-URGENT", "2-HIGH", "3-MED", "4-LOW"],
    }
    # lineitem partkeys chosen so (k+p) hits the mod classes:
    rows = []
    # order 97 (deleted): one surviving item, one inserted item -> all moot
    rows += [(97, 3, "A", 10.0), (97, 4, "A", 11.0)]  # 97+4=101 -> insert too
    # order 89 (flip): survives with items -> lands under 9-MAINT
    rows += [(89, 1, "B", 20.0), (89, 4, "A", 30.0)]  # 89+4=93 -> deleted row
    # order 5: delete+insert on the SAME row: 5+p ≡ 0 mod 93 and 101
    lcm = 93 * 101 // np.gcd(93, 101)  # 9393
    rows += [(5, lcm - 5, "C", 40.0)]  # deleted AND re-inserted at +100c
    rows += [(5, 2, "A", 50.0)]  # plain survivor
    # order 7: untouched entirely
    rows += [(7, 1, "B", 60.0)]
    # order 11: its only item deleted -> (4-LOW, A) group must vanish
    rows += [(11, 82, "A", 70.0)]  # 11+82=93
    # orphan lineitem: order 999 never existed
    rows += [(999, 1, "A", 80.0)]
    lineitem = {
        "l_orderkey": [r[0] for r in rows],
        "l_partkey": [r[1] for r in rows],
        "l_returnflag": [r[2] for r in rows],
        "l_extendedprice": [r[3] for r in rows],
    }
    sf = _corpus(tmp_path, orders, lineitem)
    got = join_ivm_priority_revenue(sf)
    want = _brute(orders, lineitem)
    pd.testing.assert_frame_equal(got, want)
    # the seeded corners actually fired:
    prios = set(got["o_orderpriority"])
    assert "9-MAINT" in prios  # delta-born group
    assert "4-LOW" not in prios  # group driven to zero vanished
    assert "1-URGENT" not in prios  # both 1-URGENT orders deleted
    by = got.set_index(["o_orderpriority", "l_returnflag"])
    # order 5's same-row delete+insert nets to price+100c
    assert by.loc[("2-HIGH", "C"), "revenue_c"] == 4000 + 100
    assert by.loc[("2-HIGH", "C"), "n_items"] == 1


def test_join_ivm_equals_recompute_random(ray_session, tmp_path):
    rng = np.random.default_rng(29)
    n_o, n_l = 400, 1600
    okeys = np.arange(1, n_o + 1) * 7  # hits 89/97 classes occasionally
    orders = {
        "o_orderkey": okeys,
        "o_orderpriority": rng.choice(["1-URGENT", "2-HIGH", "3-MED"], n_o),
    }
    lineitem = {
        "l_orderkey": rng.choice(okeys, n_l),
        "l_partkey": rng.integers(1, 300, n_l),
        "l_returnflag": rng.choice(["A", "N", "R"], n_l),
        "l_extendedprice": np.round(rng.uniform(1, 1000, n_l), 2),
    }
    sf = _corpus(tmp_path, orders, lineitem)
    got = join_ivm_priority_revenue(sf)
    want = _brute(orders, lineitem)
    pd.testing.assert_frame_equal(got, want)
