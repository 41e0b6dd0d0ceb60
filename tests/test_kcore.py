"""k-core decomposition (kcore_from_edges): brute-force peel replay,
forced dataset-path equality, fixpoint early-exit no-op, empty and
fully-peeled inputs."""

import numpy as np
import pandas as pd
import ray.data as rd

from xmlschema_ray.pipelines.analytics import kcore_from_edges


def _brute_kcore(edges: pd.DataFrame, k: int, rounds: int) -> pd.DataFrame:
    """Pure-Python replay of the scheduled peel: ``rounds`` iterations of
    (degree count -> alive = deg>=k -> filter both endpoints), then the
    degree table of the surviving edge set."""
    e = list(zip(edges["part_a"].tolist(), edges["part_b"].tolist()))
    for _ in range(rounds):
        deg = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        alive = {n for n, d in deg.items() if d >= k}
        e = [(a, b) for a, b in e if a in alive and b in alive]
    deg = {}
    for a, b in e:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    keys = sorted(deg)
    return pd.DataFrame(
        {
            "p_partkey": pd.Series(keys, dtype="int64"),
            "core_deg": pd.Series([deg[n] for n in keys], dtype="int64"),
        }
    )


def _random_edges(seed: int, n_nodes: int = 40, n_edges: int = 90) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges * 2)
    b = rng.integers(0, n_nodes, n_edges * 2)
    m = a < b  # undirected, no self-loops, canonical order
    df = pd.DataFrame({"part_a": a[m], "part_b": b[m]}).drop_duplicates()
    return df.reset_index(drop=True).astype("int64")


def test_kcore_matches_bruteforce(ray_session):
    edges = _random_edges(11)
    for k, rounds in ((2, 8), (3, 8), (4, 2), (2, 1)):
        got = kcore_from_edges(rd.from_pandas(edges), k=k, rounds=rounds)
        want = _brute_kcore(edges, k, rounds)
        pd.testing.assert_frame_equal(got, want)


def test_kcore_forced_dataset_path_identical(ray_session):
    edges = _random_edges(23)
    broadcast = kcore_from_edges(rd.from_pandas(edges), k=3, rounds=6)
    distributed = kcore_from_edges(
        rd.from_pandas(edges), k=3, rounds=6,
        broadcast_nodes_threshold=0, num_partitions=3,
    )
    pd.testing.assert_frame_equal(broadcast, distributed)


def test_kcore_fixpoint_early_exit_noop(ray_session):
    # triangle + one pendant: converges after one peel round, so any
    # schedule >= 2 rounds must give the identical answer
    edges = pd.DataFrame({"part_a": [0, 1, 0, 2], "part_b": [1, 2, 2, 9]}).astype("int64")
    short = kcore_from_edges(rd.from_pandas(edges), k=2, rounds=2)
    long = kcore_from_edges(rd.from_pandas(edges), k=2, rounds=50)
    pd.testing.assert_frame_equal(short, long)
    assert set(short["p_partkey"]) == {0, 1, 2}
    assert (short["core_deg"] == 2).all()


def test_kcore_empty_and_fully_peeled(ray_session):
    empty = rd.from_pandas(
        pd.DataFrame(
            {"part_a": pd.Series([], dtype="int64"), "part_b": pd.Series([], dtype="int64")}
        )
    )
    out = kcore_from_edges(empty, k=2)
    assert len(out) == 0 and list(out.columns) == ["p_partkey", "core_deg"]
    # a bare chain has no 2-core: every round peels the current endpoints
    chain = pd.DataFrame({"part_a": [0, 1, 2], "part_b": [1, 2, 3]}).astype("int64")
    out = kcore_from_edges(rd.from_pandas(chain), k=2, rounds=8)
    assert len(out) == 0 and list(out.columns) == ["p_partkey", "core_deg"]
    # same on the forced dataset path
    out = kcore_from_edges(
        rd.from_pandas(chain), k=2, rounds=8, broadcast_nodes_threshold=0
    )
    assert len(out) == 0 and list(out.columns) == ["p_partkey", "core_deg"]
