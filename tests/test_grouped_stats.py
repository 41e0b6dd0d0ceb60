"""Grouped-OLS and contingency-chi2 invariants checked against
independent pandas/numpy recomputes (the oracle gate checks DuckDB
bit-exactness; these prove the *statistics* are the right ones)."""

import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def test_regr_matches_numpy_polyfit(ray_session):
    from xmlschema_ray.pipelines.relational import regr_price_on_qty_by_flag

    out = regr_price_on_qty_by_flag(SF_DIR)
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    li["y"] = np.floor(li["l_extendedprice"].to_numpy() * 100.0 + 0.5)
    for _, row in out.iterrows():
        g = li[li["l_returnflag"] == row["l_returnflag"]]
        slope, intercept = np.polyfit(g["l_quantity"].to_numpy(np.float64), g["y"].to_numpy(), 1)
        assert abs(row["slope"] - slope) < 1e-6 * max(1.0, abs(slope))
        assert abs(row["intercept"] - intercept) < 1e-6 * max(1.0, abs(intercept))
        r = np.corrcoef(g["l_quantity"].to_numpy(np.float64), g["y"].to_numpy())[0, 1]
        assert abs(row["r2"] - r * r) < 1e-9


def test_chi2_cells_match_pandas_crosstab(ray_session):
    from xmlschema_ray.pipelines.relational import contingency_chi2

    out = contingency_chi2(SF_DIR)
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderpriority", "o_orderstatus"]
    )
    ct = pd.crosstab(o["o_orderpriority"], o["o_orderstatus"])
    n = ct.to_numpy().sum()
    assert int(out["n"].iloc[0]) == n
    # observed counts and marginals cell-by-cell
    for _, row in out.iterrows():
        obs = ct.loc[row["o_orderpriority"], row["o_orderstatus"]]
        assert int(row["observed"]) == obs
        assert int(row["row_total"]) == ct.loc[row["o_orderpriority"]].sum()
        assert int(row["col_total"]) == ct[row["o_orderstatus"]].sum()
        e = row["row_total"] * row["col_total"] / n
        assert abs(row["expected"] - e) < 1e-9
        assert abs(row["chi2_term"] - (obs - e) ** 2 / e) < 1e-9
    # full coverage: every non-empty cell appears
    assert len(out) == (ct.to_numpy() > 0).sum()


def test_funnel_matches_bruteforce(ray_session):
    from xmlschema_ray.pipelines.relational import funnel_conversion

    out = funnel_conversion(SF_DIR)
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "event_type", "ts"]
    )
    reached = [0, 0, 0]
    exp_lag = [0, 0, 0]  # Timestamp.value is ns; lags accumulate in us
    for _, g in ev.groupby("user_id"):
        prev = None
        for i, st in enumerate(("view", "click", "purchase")):
            sub = g[g["event_type"] == st]
            if prev is not None:
                sub = sub[sub["ts"] > prev]
            if sub.empty:
                break
            t = sub["ts"].min()
            reached[i] += 1
            if prev is not None:
                exp_lag[i] += int((t.value - prev.value) // 1000)
            prev = t
    assert out["n_users"].tolist() == reached
    assert out["sum_lag_us"].tolist() == exp_lag
    # funnel monotonicity
    assert reached[0] >= reached[1] >= reached[2]
    assert reached[0] > 0


def test_part_pairs_match_bruteforce(ray_session):
    from xmlschema_ray.ops.relational import to_pandas_with_schema
    from xmlschema_ray.pipelines.relational import part_pair_cooccurrence

    out = to_pandas_with_schema(part_pair_cooccurrence(SF_DIR))
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    from collections import Counter
    from itertools import combinations

    c = Counter()
    for _, g in li.groupby("l_orderkey"):
        for a, b in combinations(sorted(g["l_partkey"]), 2):
            c[(a, b)] += 1
    want = sorted((a, b, n) for (a, b), n in c.items() if n >= 2)
    got = list(out[["part_a", "part_b", "n_orders"]].itertuples(index=False, name=None))
    assert sorted(got) == want and len(want) > 0


def test_part_pairs_max_basket_gate(ray_session):
    import numpy as np

    from xmlschema_ray.pipelines.relational import part_pair_cooccurrence

    # a crafted wide basket must raise, not OOM
    import pytest

    with pytest.raises(ValueError, match="max_group"):
        import ray.data as rd

        # monkey-free: call the partition fn through a tiny synthetic dir
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            wide = pd.DataFrame(
                {"l_orderkey": np.int64(1), "l_partkey": np.arange(10, dtype=np.int64)}
            )
            wide.to_parquet(os.path.join(d, "lineitem.parquet"))
            to_list = part_pair_cooccurrence(d, max_basket=5).take_all()


def _brute_heavy_hitters(k):
    import re

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["text"])
    from collections import Counter

    c = Counter()
    for t in docs["text"]:
        c.update(w for w in re.split(r"\s+", t.strip()) if w)
    n_total = sum(c.values())
    return {w: n for w, n in c.items() if n * k > n_total}, n_total


def test_heavy_hitters_match_bruteforce_on_fixtures(ray_session):
    from xmlschema_ray.pipelines.curation import heavy_hitter_words

    for k, cap in [(30, 40), (100, 500)]:
        out = heavy_hitter_words(SF_DIR, k=k, mg_capacity=cap)
        want, n_total = _brute_heavy_hitters(k)
        got = dict(zip(out["word"], out["n"]))
        assert got == want, (k, cap, len(got), len(want))
        assert (out["n_total"] == n_total).all()


def test_heavy_hitters_exact_under_forced_compression(ray_session, tmp_path):
    """A 4000-word zipf-ish vocabulary with mg_capacity=256 forces real MG
    compression in every batch; the sketch-then-verify output must STILL
    be exactly the true heavy-hitter set (the mergeability guarantee)."""
    import numpy as np

    from xmlschema_ray.pipelines.curation import heavy_hitter_words

    rng = np.random.default_rng(7)
    vocab = np.array([f"w{i:04d}" for i in range(4000)], dtype=object)
    # zipf-ish weights: a handful of hot words + a wide flat tail
    weights = 1.0 / np.arange(1, 4001) ** 1.2
    weights /= weights.sum()
    docs = []
    for _ in range(300):
        words = rng.choice(vocab, size=80, p=weights)
        docs.append(" ".join(words))
    # several files -> several blocks, so sketch MERGING is exercised too
    (tmp_path / "documents.parquet").mkdir()
    for i in range(8):
        chunk = docs[i * 38 : (i + 1) * 38] if i < 7 else docs[7 * 38 :]
        pd.DataFrame(
            {"doc_id": np.arange(len(chunk), dtype=np.int64), "text": chunk}
        ).to_parquet(tmp_path / "documents.parquet" / f"part-{i}.parquet")

    out = heavy_hitter_words(str(tmp_path), k=200, mg_capacity=256)
    from collections import Counter

    c = Counter(w for t in docs for w in t.split())
    n_total = sum(c.values())
    want = {w: n for w, n in c.items() if n * 200 > n_total}
    got = dict(zip(out["word"], out["n"]))
    assert got == want and len(want) >= 5
    assert (out["n_total"] == n_total).all()


def test_heavy_hitters_capacity_lint():
    import pytest

    from xmlschema_ray.pipelines.curation import heavy_hitter_words

    with pytest.raises(ValueError, match="mg_capacity"):
        heavy_hitter_words(SF_DIR, k=100, mg_capacity=99)


def test_user_paths_match_bruteforce(ray_session):
    from xmlschema_ray.pipelines.relational import user_path_counts

    out = user_path_counts(SF_DIR, k=3)
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    from collections import Counter

    c = Counter()
    for _, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        c[">".join(g["event_type"].head(3))] += 1
    got = dict(zip(out["path"], out["n_users"]))
    assert got == dict(c)
    assert sum(got.values()) == ev["user_id"].nunique()


def test_morton_bit_interleave_reference():
    from xmlschema_ray.pipelines.relational import morton_zvalue

    rng = np.random.default_rng(3)
    x = rng.integers(0, 65536, 200)
    y = rng.integers(0, 65536, 200)
    z = morton_zvalue(x, y)

    def ref(a, b):
        out = 0
        for i in range(16):
            out |= ((int(a) >> i) & 1) << (2 * i)
            out |= ((int(b) >> i) & 1) << (2 * i + 1)
        return out

    assert z.tolist() == [ref(a, b) for a, b in zip(x, y)]


def test_zorder_layout_prunes_2d_boxes(ray_session):
    """The layout claim itself: chunking a Z-ordered sort into files gives
    2-D-tight bounding boxes, so a box predicate prunes most chunks, while
    natural (orderkey) order prunes almost nothing on either dimension."""
    from xmlschema_ray.pipelines.relational import morton_zvalue

    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )
    z = morton_zvalue(li["l_partkey"].to_numpy(), li["l_suppkey"].to_numpy())
    n_chunks = 32

    def chunks_touched(order):
        o = li.iloc[order].reset_index(drop=True)
        bounds = []
        for c in np.array_split(np.arange(len(o)), n_chunks):
            g = o.iloc[c]
            bounds.append(
                (g["l_partkey"].min(), g["l_partkey"].max(), g["l_suppkey"].min(), g["l_suppkey"].max())
            )
        pk_lo, pk_hi = np.quantile(li["l_partkey"], [0.4, 0.5])
        sk_lo, sk_hi = np.quantile(li["l_suppkey"], [0.4, 0.5])
        return sum(
            1
            for (a, b, c_, d) in bounds
            if not (b < pk_lo or a > pk_hi or d < sk_lo or c_ > sk_hi)
        )

    z_touched = chunks_touched(np.argsort(z, kind="stable"))
    nat_touched = chunks_touched(np.arange(len(li)))
    assert z_touched * 2 <= nat_touched, (z_touched, nat_touched)
    assert z_touched <= n_chunks // 2


def test_triangles_match_bruteforce(ray_session):
    from collections import defaultdict
    from itertools import combinations

    from xmlschema_ray.pipelines.relational import part_triangle_count

    out = part_triangle_count(SF_DIR)
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    pair_n = defaultdict(int)
    for _, g in li.groupby("l_orderkey"):
        for a, b in combinations(sorted(g["l_partkey"]), 2):
            pair_n[(a, b)] += 1
    edges = {p for p, n in pair_n.items() if n >= 2}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    tri = sum(1 for (a, b) in edges for c in adj[b] if c in adj[a])
    assert int(out["n_edges"].iloc[0]) == len(edges)
    assert int(out["n_triangles"].iloc[0]) == tri > 0


def test_phrase_search_overlapping_and_boundaries(ray_session, tmp_path):
    """Crafted cases: overlapping occurrences all counted, phrases never
    match across document boundaries, multi-space runs don't break
    adjacency."""
    from xmlschema_ray.pipelines.curation import phrase_search

    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "a b a b a b",      # 'a b a' overlapping: starts at 0 and 2
                "x  a   b a",       # multi-space: 'a b a' present once
                "junk a b",         # ends with prefix only
                "a junk b a",       # words present, sequence absent
            ],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    out = phrase_search(str(tmp_path), phrase="a b a")
    got = dict(zip(out["doc_id"], out["n_hits"]))
    assert got == {0: 2, 1: 1}


def test_merge_into_roundtrip_equals_diff_target(ray_session):
    """Applying the change feed must reproduce snapshot B exactly, and
    diffing the merged result against B must be empty."""
    from xmlschema_ray.ops.relational import snapshot_diff, to_pandas_with_schema
    from xmlschema_ray.pipelines.relational import orders_apply_changes

    import ray.data as rd

    merged = orders_apply_changes(SF_DIR)
    got = to_pandas_with_schema(merged)
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    k = o["o_orderkey"].to_numpy()
    v = o["o_totalprice"].to_numpy()
    keep = k % 97 != 0
    bk, bv = k[keep], v[keep].copy()
    bv[bk % 89 == 0] += 1.0
    want = pd.DataFrame(
        {
            "o_orderkey": np.concatenate([bk, k[k % 101 == 0] + 1_000_000_000]),
            "o_totalprice": np.concatenate([bv, v[k % 101 == 0]]),
        }
    ).sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_values("o_orderkey").reset_index(drop=True), want
    )
    # idempotence check via diff: merged vs independently-built B is empty
    d = snapshot_diff(
        rd.from_pandas(want), rd.from_pandas(got), "o_orderkey", ["o_totalprice"]
    )
    assert to_pandas_with_schema(d).empty


def test_transition_matrix_matches_bruteforce(ray_session):
    from xmlschema_ray.pipelines.relational import event_transition_matrix

    out = event_transition_matrix(SF_DIR)
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    from collections import Counter

    c = Counter()
    for _, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        types = g["event_type"].tolist()
        for a, b in zip(types, types[1:]):
            c[(a, b)] += 1
    got = {(r.prev_type, r.event_type): r.n for r in out.itertuples()}
    assert got == dict(c)
    # conditional probabilities sum to 1 per prev_type
    sums = out.groupby("prev_type")["p"].sum()
    assert np.allclose(sums.to_numpy(), 1.0)


def test_session_ranks_consistent_with_sessionize(ray_session):
    """Max session_id per user must equal sessionize_events' n_sessions,
    and ranks must be 1..len within each (user, session)."""
    from xmlschema_ray.ops.relational import to_pandas_with_schema
    from xmlschema_ray.pipelines.relational import (
        session_event_ranks,
        sessionize_events,
    )

    ranks = to_pandas_with_schema(session_event_ranks(SF_DIR))
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_id", "user_id"])
    j = ranks.merge(ev, on="event_id")
    per_user_max = j.groupby("user_id")["session_id"].max()
    ns = sessionize_events(SF_DIR)
    if hasattr(ns, "to_pandas"):
        ns = ns.to_pandas()
    want = dict(zip(ns["user_id"], ns["n_sessions"]))
    assert dict(per_user_max) == want
    g = j.groupby(["user_id", "session_id"])["rank_in_session"]
    assert (g.min() == 1).all()
    assert (g.max() == g.size()).all()


def test_retention_cohort_cells_conserve_users(ray_session):
    from xmlschema_ray.pipelines.relational import retention_cohorts

    out = retention_cohorts(SF_DIR)
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "ts"])
    # offset-0 cells count each user exactly once (everyone is active in
    # their own cohort week)
    assert out[out["offset_weeks"] == 0]["n_users"].sum() == ev["user_id"].nunique()
    # cell recompute
    us = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    ev = ev.assign(week=(us // 86_400_000_000 + 3) // 7).drop(columns="ts").drop_duplicates()
    first = ev.groupby("user_id")["week"].transform("min")
    cells = (
        ev.assign(cohort_week=first, offset_weeks=ev["week"] - first)
        .groupby(["cohort_week", "offset_weeks"])
        .size()
    )
    got = out.set_index(["cohort_week", "offset_weeks"])["n_users"]
    assert got.to_dict() == cells.to_dict()


def test_quantile_sketch_within_bin_width_of_exact(ray_session):
    from xmlschema_ray.pipelines.relational import quantile_sketch_quantity

    out = quantile_sketch_quantity(SF_DIR)
    q = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_quantity"])["l_quantity"]
    for pct, v in zip(out["pct"], out["value"]):
        exact = q.quantile(pct / 100.0)
        assert abs(v - exact) <= 2.0 + 1e-9, (pct, v, exact)  # bin width bound


def test_vocab_overlap_matches_set_arithmetic(ray_session):
    import re

    from xmlschema_ray.pipelines.curation import source_vocab_overlap

    out = source_vocab_overlap(SF_DIR)
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["source", "text"])
    vocab = {}
    for src, g in docs.groupby("source"):
        vocab[src] = set(w for t in g["text"] for w in re.split(r"\s+", t.strip()) if w)
    for r in out.itertuples():
        a, b = vocab[r.source_a], vocab[r.source_b]
        assert r.n_a == len(a) and r.n_b == len(b)
        assert r.n_common == len(a & b)
        assert abs(r.jaccard - len(a & b) / len(a | b)) < 1e-12
    import itertools

    assert len(out) == len(list(itertools.combinations(vocab, 2)))


def test_vocab_overlap_source_cap():
    import pytest

    from xmlschema_ray.pipelines.curation import source_vocab_overlap

    with pytest.raises(ValueError, match="max_sources"):
        source_vocab_overlap(SF_DIR, max_sources=1)


def test_above_avg_matches_pandas(ray_session):
    from xmlschema_ray.ops.relational import to_pandas_with_schema
    from xmlschema_ray.pipelines.relational import orders_above_customer_avg

    got = to_pandas_with_schema(orders_above_customer_avg(SF_DIR))["o_orderkey"].tolist()
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = np.floor(o["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    o = o.assign(c=c)
    g = o.groupby("o_custkey")["c"]
    want = o[o["c"] * g.transform("size") > g.transform("sum")]["o_orderkey"]
    assert got == sorted(want.tolist()) and len(got) > 0


def test_scd2_matches_pandas_replay_and_collapses_noops(ray_session):
    """SCD2 invariants: per-user versions are 1..k contiguous, intervals
    chain exactly (valid_to == next valid_from, NULL only on the last),
    consecutive equal values never open a version, and the full frame
    matches an independent pandas replay."""
    from xmlschema_ray.pipelines.relational import user_type_scd2

    got = user_type_scd2(SF_DIR)
    assert len(got) > 0 and got["valid_to"].isna().sum() == got["user_id"].nunique()

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"], kind="mergesort"
    )
    chg = ev["user_id"].ne(ev["user_id"].shift()) | ev["event_type"].ne(
        ev["event_type"].shift()
    )
    c = ev[chg].copy()
    c["version"] = c.groupby("user_id").cumcount() + 1
    c["valid_to"] = c.groupby("user_id")["ts"].shift(-1)
    want = (
        c.rename(columns={"ts": "valid_from"})[
            ["user_id", "version", "event_type", "valid_from", "valid_to"]
        ]
        .sort_values(["user_id", "version"])
        .reset_index(drop=True)
        .astype({"version": "int64", "valid_from": "datetime64[us]", "valid_to": "datetime64[us]"})
    )
    pd.testing.assert_frame_equal(got, want)

    # interval chaining: within a user, valid_to[i] == valid_from[i+1]
    nxt = got.groupby("user_id")["valid_from"].shift(-1)
    inner = got["valid_to"].notna()
    assert (got.loc[inner, "valid_to"] == nxt[inner]).all()
    # no-op collapse: adjacent versions always differ in value
    prev_t = got.groupby("user_id")["event_type"].shift()
    assert (got["event_type"] != prev_t)[prev_t.notna()].all()


def test_time_weighted_avg_matches_pandas_replay(ray_session):
    """TWA invariants vs an independent per-user pandas replay: exact
    integer weighted sums, span exclusion, and uneven-sampling dominance
    (a long-held value pulls the TWA toward itself regardless of count)."""
    from xmlschema_ray.pipelines.relational import time_weighted_value_by_user

    got = time_weighted_value_by_user(SF_DIR)
    assert len(got) > 0

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"], kind="mergesort"
    )
    c = np.floor(ev["value"].to_numpy(np.float64) * 100.0 + 0.5).astype(np.int64)
    t = ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
    uid = ev["user_id"].to_numpy(np.int64)
    same_next = np.zeros(len(ev), dtype=bool)
    same_next[:-1] = uid[1:] == uid[:-1]
    dt = np.zeros(len(ev), dtype=np.int64)
    dt[same_next] = (np.roll(t, -1) - t)[same_next]
    df = pd.DataFrame({"user_id": uid, "w": c * dt, "t": t})
    agg = df.groupby("user_id").agg(s=("w", "sum"), lo=("t", "min"), hi=("t", "max"), n=("w", "size"))
    agg = agg[agg["hi"] > agg["lo"]]
    want = (agg["s"] / (agg["hi"] - agg["lo"])).to_dict()
    assert dict(zip(got["user_id"], got["twa_value"])) == want
    assert dict(zip(got["user_id"], got["n_events"])) == agg["n"].to_dict()

    # dominance property on a crafted stream: value 100 held 99 µs then
    # value 0 held 1 µs -> TWA = 9900/100 = 99.0, while plain AVG is 50
    ts0 = pd.Timestamp("2024-01-01")
    crafted = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [7, 7, 7],
            "ts": [ts0, ts0 + pd.Timedelta(microseconds=99), ts0 + pd.Timedelta(microseconds=100)],
            "value": [100.0, 0.0, 5.0],
        }
    )
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(crafted), os.path.join(d, "events.parquet"))
        one = time_weighted_value_by_user(d)
    assert one.iloc[0]["twa_value"] == (10000 * 99 + 0 * 1) / 100


def test_fd_repair_tie_and_exactness(tmp_path, ray_session):
    """Majority tie resolves to the lexicographically smallest lang, and
    n_repair is the exact minimal repair count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xmlschema_ray.pipelines.relational import fd_repair_by_source

    df = pd.DataFrame(
        {
            "source": ["a"] * 4 + ["b"] * 3,
            "lang": ["de", "de", "en", "en", "fr", "fr", "fr"],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))
    out = fd_repair_by_source(str(tmp_path))
    a = out[out["source"] == "a"].iloc[0]
    assert a["majority_lang"] == "de" and a["n_repair"] == 2 and a["n_langs"] == 2
    b = out[out["source"] == "b"].iloc[0]
    assert b["majority_lang"] == "fr" and b["n_repair"] == 0 and b["n_langs"] == 1


def test_ivm_equals_direct_recompute(ray_session):
    """Delta maintenance == full recompute of the derived version-B table,
    proven independently in pandas (the IVM correctness property)."""
    from xmlschema_ray.pipelines.relational import orders_status_counts_ivm

    got = orders_status_counts_ivm(SF_DIR)
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_orderstatus"])
    k = o["o_orderkey"].to_numpy(np.int64)
    s = o["o_orderstatus"].to_numpy(object)
    keep = k % 97 != 0
    s2 = s[keep].copy()
    s2[k[keep] % 89 == 0] = "X"
    b = np.concatenate([s2, s[k % 101 == 0]])
    want = pd.Series(b).value_counts().sort_index()
    assert dict(zip(got["o_orderstatus"], got["n"])) == want.to_dict()
