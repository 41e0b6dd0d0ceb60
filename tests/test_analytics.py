"""Unit tests for the analytics family: skyline, sweep-line concurrency,
gap-fill, integer PageRank (incl. forced-path equality)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from xmlschema_ray.pipelines.analytics import (
    _skyline_2d,
    events_daily_gapfill,
    pagerank_from_edges,
    pareto_orders,
    peak_concurrent_sessions,
)

SF = "/root/testdata/sf0.001"


def brute_skyline(df: pd.DataFrame) -> set:
    """O(n^2) dominance reference: minimize t, maximize v."""
    keep = []
    rows = list(df.itertuples(index=False))
    for i, a in enumerate(rows):
        dominated = any(
            (b.t <= a.t and b.v >= a.v and (b.t < a.t or b.v > a.v)) for b in rows
        )
        if not dominated:
            keep.append(i)
    return set(keep)


def test_skyline_matches_bruteforce_with_ties():
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "t": rng.integers(0, 20, 200),
            "v": rng.integers(0, 20, 200).astype(float),
        }
    )
    # force exact duplicate points (both survive together) and same-t ties
    df.loc[0, ["t", "v"]] = [0, 19.0]
    df.loc[1, ["t", "v"]] = [0, 19.0]
    got = _skyline_2d(df.rename_axis("i").reset_index(), "t", "v")
    expect = brute_skyline(df)
    assert set(got["i"]) == expect


def test_skyline_empty_and_single():
    empty = pd.DataFrame({"t": pd.Series([], dtype="int64"), "v": pd.Series([], dtype="float64")})
    assert len(_skyline_2d(empty, "t", "v")) == 0
    one = pd.DataFrame({"t": [3], "v": [1.0]})
    assert len(_skyline_2d(one, "t", "v")) == 1


def test_pareto_orders_no_dominated_row_and_batch_independent():
    out = pareto_orders(SF)
    # frontier property: no pair where one dominates the other
    t = out["o_orderdate"].to_numpy()
    v = out["o_totalprice"].to_numpy()
    order = np.lexsort((-v, t.astype("int64")))
    ts, vs = t[order], v[order]
    # sorted by date asc: every later frontier point must have strictly
    # higher price than all earlier-dated ones
    for i in range(1, len(ts)):
        if ts[i] != ts[i - 1]:
            assert vs[i] > vs[: i][ts[:i] < ts[i]].max()


def test_peak_concurrent_sessions_matches_pandas_replay():
    got = peak_concurrent_sessions(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    p = ev.sort_values(["user_id", "ts"], kind="mergesort")
    brk = p["user_id"].ne(p["user_id"].shift()) | (p["ts"].diff() > pd.Timedelta(minutes=30))
    sid = brk.cumsum()
    g = p.groupby(sid.to_numpy())["ts"]
    deltas = pd.concat(
        [
            pd.DataFrame({"ts": g.min(), "d": 1}),
            pd.DataFrame({"ts": g.max() + pd.Timedelta(microseconds=1), "d": -1}),
        ]
    )
    byts = deltas.groupby("ts", as_index=False)["d"].sum().sort_values("ts")
    byts["c"] = byts["d"].cumsum()
    byts["day"] = byts["ts"].dt.normalize()
    expect = byts.groupby("day", as_index=False)["c"].max().rename(columns={"c": "peak"})
    expect["day"] = expect["day"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), expect.astype({"peak": "int64"}).reset_index(drop=True)
    )


def test_gapfill_zero_days_and_conservation():
    out = events_daily_gapfill(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    assert out["n_events"].sum() == len(ev)
    # spine is dense: consecutive days exactly one day apart
    days = out["day"].to_numpy().astype("datetime64[us]").astype("int64")
    assert (np.diff(days) == 86_400_000_000).all()
    assert len(out) == int((days.max() - days.min()) // 86_400_000_000) + 1


def _toy_edges() -> pd.DataFrame:
    # two triangles joined by a bridge + a pendant node
    return pd.DataFrame(
        {
            "part_a": [1, 1, 2, 4, 4, 5, 3, 6],
            "part_b": [2, 3, 3, 5, 6, 6, 4, 7],
        }
    )


def _reference_pagerank(edges: pd.DataFrame, iterations: int = 5) -> pd.DataFrame:
    S = 1_000_000_000_000
    src = np.concatenate([edges["part_a"], edges["part_b"]])
    dst = np.concatenate([edges["part_b"], edges["part_a"]])
    nodes = np.unique(src)
    deg = pd.Series(src).value_counts().reindex(nodes).to_numpy(np.int64)
    rank = {int(n): S for n in nodes}
    for _ in range(iterations):
        contrib = {int(n): rank[int(n)] // int(d) for n, d in zip(nodes, deg)}
        s = {int(n): 0 for n in nodes}
        for u, v in zip(src, dst):
            s[int(v)] += contrib[int(u)]
        rank = {n: (3 * S) // 20 + (17 * s[n]) // 20 for n in rank}
    return pd.DataFrame(
        {"p_partkey": nodes.astype(np.int64), "rank_scaled": [rank[int(n)] for n in nodes]}
    )


def test_pagerank_matches_reference_loop():
    edges = rd.from_pandas(_toy_edges())
    got = pagerank_from_edges(edges, iterations=5)
    expect = _reference_pagerank(_toy_edges(), iterations=5)
    pd.testing.assert_frame_equal(got, expect.astype({"rank_scaled": "int64"}))


def test_pagerank_forced_dataset_path_identical():
    edges = rd.from_pandas(_toy_edges())
    broadcast = pagerank_from_edges(edges, iterations=3)
    edges2 = rd.from_pandas(_toy_edges())
    distributed = pagerank_from_edges(
        edges2, iterations=3, broadcast_nodes_threshold=0, num_partitions=3
    )
    pd.testing.assert_frame_equal(broadcast, distributed)


def test_pagerank_empty_edges():
    empty = rd.from_pandas(
        pd.DataFrame({"part_a": pd.Series([], dtype="int64"), "part_b": pd.Series([], dtype="int64")})
    )
    out = pagerank_from_edges(empty, iterations=2)
    assert len(out) == 0
    assert list(out.columns) == ["p_partkey", "rank_scaled"]


def test_pagerank_overflow_lint():
    edges = rd.from_pandas(_toy_edges())
    import xmlschema_ray.pipelines.analytics as A

    orig = A._PR_SCALE
    try:
        A._PR_SCALE = 2**60
        with pytest.raises(ValueError, match="overflow"):
            pagerank_from_edges(edges, iterations=1)
    finally:
        A._PR_SCALE = orig


def _bruteforce_bfs(edges: pd.DataFrame, seeds, max_hops: int) -> dict:
    adj = {}
    for a, b in zip(edges["part_a"], edges["part_b"]):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds if s in adj}
    frontier = list(dist)
    for h in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    return dist


def test_bfs_matches_bruteforce_and_stops_early(ray_session):
    from xmlschema_ray.pipelines.analytics import bfs_hops_from_edges

    # chain 0-1-2-3-4-5 plus a separate triangle (10,11,12): seed_mod=10
    # seeds {0, 10} — the chain forces multiple rounds, the triangle
    # saturates after one
    edges = pd.DataFrame(
        {
            "part_a": [0, 1, 2, 3, 4, 10, 11, 10],
            "part_b": [1, 2, 3, 4, 5, 11, 12, 12],
        }
    )
    for max_hops in (1, 3, 10):
        got = bfs_hops_from_edges(rd.from_pandas(edges), max_hops=max_hops, seed_mod=10)
        want = _bruteforce_bfs(edges, [0, 10], max_hops)
        assert dict(zip(got["p_partkey"], got["hops"])) == want


def test_bfs_no_seeds_and_empty(ray_session):
    from xmlschema_ray.pipelines.analytics import bfs_hops_from_edges

    edges = pd.DataFrame({"part_a": [1, 2], "part_b": [2, 3]})
    out = bfs_hops_from_edges(rd.from_pandas(edges), seed_mod=1000)
    assert len(out) == 0 and list(out.columns) == ["p_partkey", "hops"]
    empty = rd.from_pandas(
        pd.DataFrame({"part_a": pd.Series([], dtype="int64"), "part_b": pd.Series([], dtype="int64")})
    )
    assert len(bfs_hops_from_edges(empty)) == 0


# -- logistic regression (integer-exact full-batch GD) ----------------------


def _logreg_replay(y: np.ndarray, x: np.ndarray, iterations: int = 5):
    """Pure-python single-process replay of the documented recurrence."""
    S = 1_000_000

    def tdiv(a, b):
        return -((-a) // b) if a < 0 else a // b

    w0 = w1 = 0
    n = len(y)
    trace = []
    for it in range(1, iterations + 1):
        g0 = g1 = 0
        for yi, xi in zip(y.tolist(), x.tolist()):
            z = w0 + w1 * xi
            q = tdiv(z * S, S + abs(z))
            r = (S + q) // 2 - yi * S
            g0 += r
            g1 += r * xi
        w0 -= tdiv(g0, 4 * n)
        w1 -= tdiv(g1, 4 * n)
        trace.append((it, w0, w1))
    return trace


def test_logreg_matches_pure_python_replay(ray_session):
    from xmlschema_ray.pipelines.analytics import logreg_train_orders

    got = logreg_train_orders(SF, iterations=4)
    orders = pd.read_parquet(SF + "/orders.parquet", columns=["o_orderstatus", "o_totalprice"])
    y = (orders["o_orderstatus"].to_numpy() == "F").astype(np.int64)
    x = (
        np.floor(orders["o_totalprice"].to_numpy(np.float64) * 100 + 0.5).astype(np.int64)
        // 10_000_000
    )
    want = _logreg_replay(y, x, iterations=4)
    assert list(map(tuple, got.to_numpy())) == want
    # the model actually moves (nonzero weights after the first step)
    assert got["w0_scaled"].iloc[0] != 0


def test_logreg_batch_count_invariance(ray_session):
    """The weight trace is identical at 1 block and many blocks (integer
    sums are order/partition independent)."""
    from xmlschema_ray.pipelines.analytics import logreg_train_orders

    a = logreg_train_orders(SF, iterations=3)
    # different parallelism by overriding the read: rerun with same input is
    # enough — materialize() block structure varies run to run; exactness is
    # asserted against the replay above, so here just determinism:
    b = logreg_train_orders(SF, iterations=3)
    pd.testing.assert_frame_equal(a, b)


def test_logreg_warm_start_resume_is_bit_exact(ray_session):
    """Checkpointed iterative training resumes LOSSLESSLY: the state is two
    integers, so trace(k1) + trace(k2, init=last) == trace(k1+k2) bit for
    bit — the mid-run resume property the north star asks of iterative
    state, free by the integer design but pinned here against regressions
    (a float accumulator would break it silently)."""
    from xmlschema_ray.pipelines.analytics import logreg_train_orders

    full = logreg_train_orders(SF, iterations=5)
    head = logreg_train_orders(SF, iterations=2)
    ckpt = (int(head["w0_scaled"].iloc[-1]), int(head["w1_scaled"].iloc[-1]))
    tail = logreg_train_orders(SF, iterations=3, init_weights=ckpt)
    resumed = pd.concat([head, tail], ignore_index=True)
    resumed["iter"] = np.arange(1, 6, dtype=np.int64)
    pd.testing.assert_frame_equal(resumed, full)


def test_rolling_median_matches_pandas_window(ray_session):
    from xmlschema_ray.ops.relational import to_pandas_with_schema
    from xmlschema_ray.pipelines.relational import events_rolling_median

    got = to_pandas_with_schema(events_rolling_median(SF, window=7)).reset_index(drop=True)
    ev = pd.read_parquet(SF + "/events.parquet", columns=["event_id", "user_id", "ts", "value"])
    p = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    c = pd.Series(np.floor(p["value"].to_numpy(np.float64) * 100 + 0.5).astype(np.int64), index=p.index)
    med = c.groupby(p["user_id"].to_numpy(), sort=False).rolling(7, min_periods=7).median().to_numpy()
    full = ~np.isnan(med)
    want = (
        pd.DataFrame(
            {
                "event_id": p["event_id"].to_numpy()[full],
                "user_id": p["user_id"].to_numpy()[full],
                "median_c": med[full],
            }
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0


# -- Benford first-digit audit ----------------------------------------------


def test_benford_digit_counts_boundaries(ray_session):
    from xmlschema_ray.pipelines.analytics import benford_digit_counts

    # powers of ten, sub-1 exclusions, negatives, fractional parts
    vals = [1000.0, 10.0, 1.0, 0.99, 0.0, -0.5, -9.99, 9.99, 777.3, 2.5, 25.0]
    ds = rd.from_pandas(pd.DataFrame({"x": vals}))
    got = benford_digit_counts(ds, "x").set_index("digit")["n"].to_dict()
    # first digits of abs(floor(x)) for |floor| >= 1:
    # 1000->1, 10->1, 1->1, 9 (-9.99 -> floor(9.99)=9), 9.99->9, 777->7,
    # 2.5->2, 25->2 ; 0.99/0.0/-0.5 excluded
    assert got == {1: 3, 2: 2, 7: 1, 9: 2}


def test_benford_audit_shares_sum_and_expectations(ray_session):
    from xmlschema_ray.pipelines.analytics import benford_price_audit

    out = benford_price_audit(SF)
    assert list(out.columns) == ["digit", "n", "obs_pm", "exp_pm"]
    assert out["digit"].is_monotonic_increasing
    # Benford expectation row for digit 1 is 301 per mille
    assert int(out.loc[out["digit"] == 1, "exp_pm"].iloc[0]) == 301
    # per-mille shares sum to ~1000 (floor rounding slack <= 9)
    assert abs(int(out["obs_pm"].sum()) - 1000) <= 9
    assert int(out["n"].sum()) == len(
        pd.read_parquet(SF + "/lineitem.parquet", columns=["l_extendedprice"])
    )


def test_k_anonymity_flags(ray_session):
    from xmlschema_ray.pipelines.analytics import k_anonymity_audit

    out = k_anonymity_audit(SF).to_pandas()
    # flags are consistent with their thresholds
    assert ((out["n"] < 5) == (out["k_at_risk"] == 1)).all()
    assert ((out["l_bands"] < 2) == (out["l_at_risk"] == 1)).all()
    # 150 customers over 25x5 QI cells: at-risk groups must exist
    assert out["k_at_risk"].sum() > 0
    # group sizes sum back to the full table
    assert int(out["n"].sum()) == 150
    assert (out["l_bands"] <= out["n"]).all()


def test_seasonal_decomposition_identity(ray_session):
    import numpy as np

    from xmlschema_ray.pipelines.analytics import seasonal_decompose_daily

    out = seasonal_decompose_daily(SF)
    # dow is the Monday-aligned integer convention
    assert ((out["day"] + 3) % 7 == out["dow"]).all()
    # within each dow, residuals sum to ~0 (mean-centering identity;
    # e6-scaled floor leaves < 1 unit per day of slack)
    for _, g in out.groupby("dow"):
        assert abs(int(g["resid_e6"].sum())) <= len(g)
    # seasonal + residual reconstructs the count within rounding
    rec = (out["seasonal_e6"] + out["resid_e6"]).to_numpy()
    assert np.abs(rec - out["n"].to_numpy() * 1_000_000).max() <= 1


def test_gini_exactness_and_bounds(ray_session):
    import numpy as np
    import pandas as pd

    from xmlschema_ray.pipelines.analytics import gini_revenue_concentration

    out = gini_revenue_concentration(SF)
    g = int(out["gini_e9"].iloc[0])
    assert 0 <= g < 1_000_000_000  # Gini in [0, 1)
    # brute-force recompute from the raw table in unbounded ints
    o = pd.read_parquet(SF + "/orders.parquet", columns=["o_custkey", "o_totalprice"])
    c = np.floor(o["o_totalprice"].to_numpy(np.float64) * 100 + 0.5).astype(np.int64)
    rev = (
        pd.DataFrame({"k": o["o_custkey"], "x": c})
        .groupby("k")["x"]
        .sum()
        .reset_index()
        .sort_values(["x", "k"], kind="mergesort")
        .reset_index(drop=True)
    )
    n = len(rev)
    x = rev["x"].astype(object).to_numpy()
    sixi = int((np.arange(1, n + 1, dtype=object) * x).sum())
    sx = int(x.sum())
    num, den = 2 * sixi - (n + 1) * sx, n * sx
    assert g == (2 * num * 1_000_000_000 + den) // (2 * den)
    assert int(out["n"].iloc[0]) == n and int(out["total_cents"].iloc[0]) == sx


def test_hll_sliding_window_registers_and_estimate(ray_session):
    """Sliding-window HLL: (1) every (window, bucket, rank) register cell
    equals a direct single-process recompute (the merge-by-max across
    batches and window members loses nothing); (2) the engine's own
    hll_estimate over each window's dense register array lands within
    the sketch's error envelope of the EXACT trailing-window distinct
    user count (the weekly_active_users cross-check)."""
    import hashlib

    from xmlschema_ray.engine.stats import hll_estimate
    from xmlschema_ray.pipelines.analytics import hll_sliding_window_users

    out = hll_sliding_window_users(SF)
    ev = pd.read_parquet(SF + "/events.parquet", columns=["user_id", "ts"])
    day = (
        ev["ts"].to_numpy("datetime64[us]").view(np.int64) // 86_400_000_000
    ).astype(np.int64)
    uid = ev["user_id"].to_numpy(np.int64)

    # direct register recompute
    shift = 52
    uu = np.unique(uid)
    hmap = {
        int(u): int.from_bytes(hashlib.md5(str(int(u)).encode()).digest()[:8], "big")
        for u in uu
    }
    rows = {}
    exact = {}
    for d, u in zip(day, uid):
        for o in range(7):
            w = int(d) + o
            h = hmap[int(u)]
            b = h >> shift
            rem = h & ((1 << shift) - 1)
            rank = (shift + 1) - rem.bit_length() if rem else shift + 1
            key = (w, b)
            rows[key] = max(rows.get(key, 0), rank)
            exact.setdefault(w, set()).add(int(u))
    expect = (
        pd.DataFrame(
            [(w, b, r) for (w, b), r in rows.items()],
            columns=["window_end_day", "bucket", "rank"],
        )
        .sort_values(["window_end_day", "bucket"])
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(out, expect)

    # estimate within the sketch envelope of the exact rolling distinct
    for w, g in out.groupby("window_end_day"):
        reg = np.zeros(4096, dtype=np.uint8)
        reg[g["bucket"].to_numpy(np.int64)] = g["rank"].to_numpy(np.int64)
        est = hll_estimate(reg)
        true = len(exact[int(w)])
        assert abs(est - true) <= max(10, 0.1 * true), (w, est, true)


def test_rolling_quantile_sketch_merge_and_accuracy(ray_session):
    """Rolling histogram-quantile sketch: per-window totals equal the
    exact trailing-window event counts (the additive merge loses
    nothing), and the sketch p50/p95 land within one bin width of the
    EXACT trailing-window percentile of the raw values."""
    from xmlschema_ray.pipelines.analytics import (
        _RQS_WIDTH_C,
        rolling_value_quantile_sketch,
    )

    out = rolling_value_quantile_sketch(SF)
    ev = pd.read_parquet(SF + "/events.parquet", columns=["ts", "value"]).dropna(
        subset=["value"]
    )
    day = (
        ev["ts"].to_numpy("datetime64[us]").view(np.int64) // 86_400_000_000
    ).astype(np.int64)
    c = np.floor(ev["value"].to_numpy(np.float64) * 100 + 0.5).astype(np.int64)
    by_window = {}
    for d, v in zip(day, c):
        for o in range(7):
            by_window.setdefault(int(d) + o, []).append(int(v))
    assert set(out["window_end_day"]) == set(by_window)
    for row in out.itertuples(index=False):
        vals = np.sort(np.array(by_window[int(row.window_end_day)], dtype=np.float64))
        n = len(vals)
        assert int(row.n_events) == n
        for q, got in ((0.5, row.p50_c), (0.95, row.p95_c)):
            # the histogram quantile targets rank q·N: the ceil(qN)-th
            # smallest value lies in the bin the interpolation lands in
            # (cum[i-1] < qN <= cum[i]), so sketch and order statistic
            # differ by less than one bin width
            v_target = vals[min(n - 1, max(0, int(np.ceil(q * n)) - 1))]
            assert abs(got - v_target) <= _RQS_WIDTH_C, (
                row.window_end_day, q, got, v_target,
            )


def test_event_activity_islands_brute_force(ray_session):
    """Gaps-and-islands coalescing equals a brute-force per-user merge:
    islands are disjoint (strictly increasing, non-touching-after-merge),
    cover every interval, and their event counts partition the user's
    interval count."""
    from xmlschema_ray.pipelines.analytics import event_activity_islands

    out = event_activity_islands(SF)
    ev = pd.read_parquet(
        SF + "/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    ).dropna(subset=["ts", "value"])
    s = ev["ts"].to_numpy("datetime64[us]").view(np.int64)
    dur = (
        np.floor(np.abs(ev["value"].to_numpy(np.float64)) * 1e6).astype(np.int64) * 997
    ) % 86_400_000_000
    e = s + dur
    df = pd.DataFrame(
        {"u": ev["user_id"].to_numpy(np.int64), "s": s, "e": e,
         "eid": ev["event_id"].to_numpy(np.int64)}
    ).sort_values(["u", "s", "eid"], kind="mergesort")
    rows = []
    for u, g in df.groupby("u", sort=True):
        cur_s = cur_e = None
        n = 0
        k = 0
        for _, r in g.iterrows():
            if cur_s is None or r["s"] > cur_e:
                if cur_s is not None:
                    k += 1
                    rows.append((u, k, cur_s, cur_e, n))
                cur_s, cur_e, n = r["s"], r["e"], 1
            else:
                cur_e = max(cur_e, r["e"])
                n += 1
        k += 1
        rows.append((u, k, cur_s, cur_e, n))
    expect = pd.DataFrame(
        rows, columns=["user_id", "island", "island_start_us", "island_end_us", "n_events"]
    ).astype("int64").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, expect)
    # disjointness: within a user, each island starts strictly after the
    # previous island's end
    for _, g in out.groupby("user_id"):
        g = g.sort_values("island")
        assert (g["island_start_us"].to_numpy()[1:] > g["island_end_us"].to_numpy()[:-1]).all()
