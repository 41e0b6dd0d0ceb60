"""Association rules (association_rules_parts): brute-force replay over
synthetic baskets, direction asymmetry of confidence, perfect-implication
and independence lift anchors, min-support filtering, empty input."""

import itertools

import numpy as np
import pandas as pd

from xmlschema_ray.pipelines.relational import association_rules_parts


def _corpus(tmp_path, baskets):
    rows = [(o, p) for o, parts in baskets.items() for p in parts]
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]).to_parquet(
        d / "lineitem.parquet", index=False
    )
    return str(d)


def _brute(baskets, min_support=2):
    sets = {o: set(ps) for o, ps in baskets.items()}
    n = len(sets)
    items = {}
    pairs = {}
    for s in sets.values():
        for p in s:
            items[p] = items.get(p, 0) + 1
        for a, b in itertools.combinations(sorted(s), 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    rows = []
    for (a, b), c_ab in pairs.items():
        if c_ab < min_support:
            continue
        for x, y in ((a, b), (b, a)):
            rows.append(
                (
                    x,
                    y,
                    c_ab,
                    items[x],
                    items[y],
                    (100 * c_ab) // items[x],
                    (1_000_000 * c_ab * n) // (items[x] * items[y]),
                )
            )
    cols = [
        "antecedent",
        "consequent",
        "pair_orders",
        "ante_orders",
        "cons_orders",
        "conf_pct",
        "lift_ppm",
    ]
    return (
        pd.DataFrame(rows, columns=cols)
        .astype("int64")
        .sort_values(["antecedent", "consequent"])
        .reset_index(drop=True)
    )


def test_rules_match_bruteforce_random(ray_session, tmp_path):
    rng = np.random.default_rng(17)
    baskets = {
        o: list(rng.choice(20, size=rng.integers(1, 6), replace=False))
        for o in range(60)
    }
    got = association_rules_parts(_corpus(tmp_path, baskets))
    want = _brute(baskets)
    pd.testing.assert_frame_equal(got, want)


def test_rules_anchors_and_asymmetry(ray_session, tmp_path):
    # item 1 appears in 8 baskets, always with item 2; item 2 appears in
    # 16 -> conf(1->2)=100, conf(2->1)=50; independent 3/4 co-occur at
    # chance in a 16-basket universe
    baskets = {}
    for o in range(8):
        baskets[o] = [1, 2]
    for o in range(8, 16):
        baskets[o] = [2, 9 + o]
    # duplicate lineitem rows must not inflate counts (distinct orders)
    baskets[0] = [1, 2, 1, 2]
    got = association_rules_parts(_corpus(tmp_path, baskets)).set_index(
        ["antecedent", "consequent"]
    )
    r12 = got.loc[(1, 2)]
    r21 = got.loc[(2, 1)]
    assert r12["conf_pct"] == 100 and r21["conf_pct"] == 50
    assert r12["pair_orders"] == 8 and r12["ante_orders"] == 8 and r12["cons_orders"] == 16
    # lift symmetric: c_ab*N/(c_a*c_b) identical both ways
    assert r12["lift_ppm"] == r21["lift_ppm"] == (1_000_000 * 8 * 16) // (8 * 16)


def test_rules_min_support_filters(ray_session, tmp_path):
    baskets = {0: [1, 2], 1: [1, 2], 2: [3, 4]}  # (3,4) support 1 -> out
    got = association_rules_parts(_corpus(tmp_path, baskets))
    assert set(zip(got["antecedent"], got["consequent"])) == {(1, 2), (2, 1)}


def test_rules_empty_when_no_frequent_pairs(ray_session, tmp_path):
    baskets = {0: [1], 1: [2], 2: [3]}
    got = association_rules_parts(_corpus(tmp_path, baskets))
    assert len(got) == 0
    assert list(got.columns) == [
        "antecedent",
        "consequent",
        "pair_orders",
        "ante_orders",
        "cons_orders",
        "conf_pct",
        "lift_ppm",
    ]
