"""Weighted SSSP (sssp_from_edges): dense Bellman-Ford replay over random
weighted graphs, early-exit-as-no-op, bounded-rounds semantics, empty and
seedless inputs."""

import numpy as np
import pandas as pd
import ray.data as rd

from xmlschema_ray.pipelines.analytics import sssp_from_edges


def _brute_sssp(edges: pd.DataFrame, rounds: int, seed_mod: int) -> pd.DataFrame:
    """Dense Bellman-Ford DP: d_r[v] = min(d_{r-1}[v], min over incident
    edges of d_{r-1}[u] + w) — the exact semantics the oracle unrolls."""
    e = []
    for a, b, w in zip(
        edges["part_a"].tolist(), edges["part_b"].tolist(), edges["w"].tolist()
    ):
        e.append((a, b, w))
        e.append((b, a, w))
    nodes = sorted({a for a, _, _ in e} | {b for _, b, _ in e})
    inf = float("inf")
    d = {n: (0 if n % seed_mod == 0 else inf) for n in nodes}
    if all(v == inf for v in d.values()):
        return pd.DataFrame(
            {
                "p_partkey": pd.Series([], dtype="int64"),
                "dist": pd.Series([], dtype="int64"),
            }
        )
    for _ in range(rounds):
        prev = dict(d)
        for a, b, w in e:
            if prev[a] + w < d[b]:
                d[b] = prev[a] + w
    keep = sorted(n for n in nodes if d[n] < inf)
    return pd.DataFrame(
        {
            "p_partkey": pd.Series(keep, dtype="int64"),
            "dist": pd.Series([d[n] for n in keep], dtype="int64"),
        }
    )


def _random_edges(seed: int, n_nodes: int = 40, n_edges: int = 90) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges * 2)
    b = rng.integers(0, n_nodes, n_edges * 2)
    w = rng.integers(1, 50, n_edges * 2)
    m = a < b
    df = (
        pd.DataFrame({"part_a": a[m], "part_b": b[m], "w": w[m]})
        .drop_duplicates(subset=["part_a", "part_b"])
        .reset_index(drop=True)
        .astype("int64")
    )
    return df


def test_sssp_matches_bruteforce(ray_session):
    edges = _random_edges(7)
    for rounds, seed_mod in ((6, 10), (2, 10), (1, 7), (8, 13)):
        got = sssp_from_edges(rd.from_pandas(edges), rounds=rounds, seed_mod=seed_mod)
        want = _brute_sssp(edges, rounds, seed_mod)
        pd.testing.assert_frame_equal(got, want)


def test_sssp_early_exit_is_noop(ray_session):
    # path 0-1-2-3 with weights: converges in 3 rounds; any longer
    # schedule must return the identical table (min is idempotent)
    edges = pd.DataFrame(
        {"part_a": [0, 1, 2], "part_b": [1, 2, 3], "w": [5, 1, 7]}
    ).astype("int64")
    short = sssp_from_edges(rd.from_pandas(edges), rounds=3, seed_mod=100)
    long = sssp_from_edges(rd.from_pandas(edges), rounds=50, seed_mod=100)
    pd.testing.assert_frame_equal(short, long)
    assert short.set_index("p_partkey")["dist"].to_dict() == {0: 0, 1: 5, 2: 6, 3: 13}


def test_sssp_bounded_rounds_cuts_long_paths(ray_session):
    # heavy direct edge (w=100) vs light 3-hop detour (w=3): one round
    # must report the direct edge, three rounds the detour
    edges = pd.DataFrame(
        {
            "part_a": [0, 0, 1, 2],
            "part_b": [3, 1, 2, 3],
            "w": [100, 1, 1, 1],
        }
    ).astype("int64")
    one = sssp_from_edges(rd.from_pandas(edges), rounds=1, seed_mod=100)
    three = sssp_from_edges(rd.from_pandas(edges), rounds=3, seed_mod=100)
    assert one.set_index("p_partkey")["dist"][3] == 100
    assert three.set_index("p_partkey")["dist"][3] == 3


def test_sssp_improving_distance_propagates(ray_session):
    # node 2's distance improves in round 2 (via 1) after being set in
    # round 1 (direct); the improvement must re-propagate to 3
    edges = pd.DataFrame(
        {
            "part_a": [0, 0, 1, 2],
            "part_b": [2, 1, 2, 3],
            "w": [10, 1, 2, 1],
        }
    ).astype("int64")
    got = sssp_from_edges(rd.from_pandas(edges), rounds=4, seed_mod=100)
    want = _brute_sssp(edges, 4, 100)
    pd.testing.assert_frame_equal(got, want)
    assert got.set_index("p_partkey")["dist"][3] == 4  # 0->1->2->3


def test_sssp_empty_and_seedless(ray_session):
    empty = rd.from_pandas(
        pd.DataFrame(
            {
                "part_a": pd.Series([], dtype="int64"),
                "part_b": pd.Series([], dtype="int64"),
                "w": pd.Series([], dtype="int64"),
            }
        )
    )
    out = sssp_from_edges(empty)
    assert len(out) == 0 and list(out.columns) == ["p_partkey", "dist"]
    # no node divisible by seed_mod -> empty seed set -> typed empty
    edges = pd.DataFrame({"part_a": [1, 2], "part_b": [2, 3], "w": [1, 1]}).astype("int64")
    out = sssp_from_edges(rd.from_pandas(edges), seed_mod=97)
    assert len(out) == 0 and list(out.columns) == ["p_partkey", "dist"]
