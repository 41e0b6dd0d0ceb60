"""Sketch correctness: HLL accuracy & mergeability, moments, KS/PSI."""

import numpy as np
import pyarrow as pa

from xmlschema_ray.engine import stats as S


def test_hll_estimate_accuracy():
    rng = np.random.default_rng(7)
    vals = np.array([f"k{i}" for i in rng.integers(0, 20000, size=100_000)], dtype=object)
    true = len(set(vals.tolist()))
    reg = S.hll_new()
    S.hll_add_hashes(reg, S.hash64(vals))
    est = S.hll_estimate(reg)
    assert abs(est - true) / true < 0.05


def test_hll_merge_equals_union():
    a_vals = np.array([f"a{i}" for i in range(5000)], dtype=object)
    b_vals = np.array([f"a{i}" for i in range(2500, 7500)], dtype=object)
    ra, rb, rall = S.hll_new(), S.hll_new(), S.hll_new()
    S.hll_add_hashes(ra, S.hash64(a_vals))
    S.hll_add_hashes(rb, S.hash64(b_vals))
    S.hll_add_hashes(rall, S.hash64(np.concatenate([a_vals, b_vals])))
    assert np.array_equal(S.hll_merge(ra, rb), rall)


def test_column_stats_merge_matches_global():
    rng = np.random.default_rng(3)
    x = rng.normal(10, 2, size=10_000)
    a, b, g = S.ColumnStats(), S.ColumnStats(), S.ColumnStats()
    a.observe(x[:4000], 2)
    b.observe(x[4000:], 3)
    g.observe(x, 5)
    a.merge(b)
    assert a.count == g.count and a.null_count == g.null_count
    assert np.isclose(a.mean, g.mean) and np.isclose(a.std, g.std)
    assert a.vmin == g.vmin and a.vmax == g.vmax


def test_batch_stats_collect_and_merge():
    t1 = pa.table(
        {
            "n": pa.array([1, 2, None], type=pa.int32()),
            "k": pa.array(["a", "b", "a"]),
            "lst": pa.array([[1], [1, 2], [1, 2, 3]], type=pa.list_(pa.int32())),
        }
    )
    t2 = pa.table(
        {
            "n": pa.array([10, 20], type=pa.int32()),
            "k": pa.array(["c", "a"]),
            "lst": pa.array([[1, 2, 3, 4], []], type=pa.list_(pa.int32())),
        }
    )
    hspec = {"len(lst)": np.array([0.0, 2.0, 4.0, 6.0])}
    b1 = S.collect_batch_stats(t1, ["n"], ["k"], hspec)
    b2 = S.collect_batch_stats(t2, ["n"], ["k"], hspec)
    b1.merge(b2)
    assert b1.n_rows == 5
    cs = b1.columns["n"]
    assert cs.count == 4 and cs.null_count == 1 and cs.vmin == 1 and cs.vmax == 20
    assert abs(S.hll_estimate(b1.hlls["k"]) - 3) < 0.5
    # lens 1,2,3,4,0 over edges [0,2,4,6]: [0,2)->{0,1}, [2,4)->{2,3}, [4,6]->{4}
    assert b1.histograms["len(lst)"].tolist() == [2, 2, 1]
    blob = b1.dumps()
    assert S.BatchStats.loads(blob).n_rows == 5


def test_ks_and_psi():
    h1 = np.array([100, 200, 300, 100])
    assert S.ks_statistic(h1, h1) == 0.0
    assert S.psi(h1, h1) < 1e-9
    h2 = np.array([300, 200, 100, 100])
    assert S.ks_statistic(h1, h2) > 0.2
    assert S.psi(h1, h2) > 0.1


def test_histogram_quantiles():
    edges = np.arange(0, 101, 10, dtype=float)
    # uniform 1000 samples in [0, 100)
    hist = np.full(10, 100)
    q = S.histogram_quantiles(hist, edges)
    assert abs(q["p50"] - 50.0) < 1.0
    assert abs(q["p95"] - 95.0) < 1.0
    assert abs(q["p99"] - 99.0) < 1.0
    # empty histogram -> NaNs
    qe = S.histogram_quantiles(np.zeros(10), edges)
    assert all(np.isnan(v) for v in qe.values())


def test_isin_sorted_matches_np_isin():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 62, 20000).astype(np.uint64)
    cands = np.sort(
        np.concatenate([rng.choice(vals, 40, replace=False), rng.integers(0, 1 << 62, 10).astype(np.uint64)])
    )
    got = S.isin_sorted(vals, cands)
    assert (got == np.isin(vals, cands)).all()
    # boundary values: below min, equal min/max, above max
    edge = np.array([cands[0] - 1, cands[0], cands[-1], cands[-1] + 1], dtype=np.uint64)
    assert S.isin_sorted(edge, cands).tolist() == [
        bool(np.isin(e, cands)) for e in edge
    ]
    assert S.isin_sorted(vals, np.array([], dtype=np.uint64)).sum() == 0
    assert len(S.isin_sorted(np.array([], dtype=np.uint64), cands)) == 0


def test_mad_outlier_docs_invariants(tmp_path, ray_session):
    """MAD flags only genuine per-group outliers and is robust to them:
    a constant group plus one spike flags exactly the spike."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xmlschema_ray.pipelines.textstats import mad_outlier_docs

    rows = []
    # group A: tight cluster around 100 with one huge spike
    for i in range(9):
        rows.append((i, "A", 100 + (i % 3)))
    rows.append((9, "A", 10_000))
    # group B: linear spread, no 3-MAD outliers
    for i in range(10, 20):
        rows.append((i, "B", 50 + (i - 10)))
    df = pd.DataFrame(rows, columns=["doc_id", "source", "n_chars"])
    df["text"] = "x"
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))

    out = mad_outlier_docs(str(tmp_path)).to_pandas()
    assert out["doc_id"].tolist() == [9]
    assert out.loc[0, "source"] == "A" and out.loc[0, "n_chars"] == 10_000
    assert out.loc[0, "med"] == 101.0  # median untouched by the spike


def test_group_keys_stable_across_nullable_batches():
    """A nullable INT group column must key the same logical group
    identically in null-free and null-bearing batches ('1', never '1.0')
    — the float64 dtype-instability class, previously splitting one
    group's partials — and null groups are EXCLUDED from both the
    group-agg and grouped-histogram channels (one convention)."""
    import pyarrow as pa

    from xmlschema_ray.engine.stats import collect_batch_stats

    edges = np.array([0.0, 10.0, 20.0])
    specs = {"chk": ("g", "v")}
    t_a = pa.table(  # no nulls: int64 batch
        {"g": pa.array([1, 2], pa.int64()), "v": pa.array([1.0, 2.0])}
    )
    t_b = pa.table(  # null-bearing: pandas would surface g as float64
        {"g": pa.array([1, 2, None], pa.int64()), "v": pa.array([3.0, 4.0, 9.0])}
    )
    bs = collect_batch_stats(t_a, [], [], {"v": (edges, "g")}, group_agg_specs=specs)
    bs.merge(collect_batch_stats(t_b, [], [], {"v": (edges, "g")}, group_agg_specs=specs))
    assert set(bs.groups["chk"]) == {"1", "2"}, bs.groups["chk"]
    assert bs.groups["chk"]["1"].tolist() == [2.0, 0.0, 4.0]  # rows 1.0 + 3.0
    assert set(h for h in bs.histograms if "@" in h) == {"v@1", "v@2"}
    assert bs.histograms["v@1"].sum() == 2  # null group's 9.0 excluded


def test_grouped_histograms_match_np_histogram():
    """The vectorized one-pass grouped histogram equals per-group
    np.histogram, including the closed right edge of the LAST bin and
    out-of-range drops."""
    import pyarrow as pa

    from xmlschema_ray.engine.stats import collect_batch_stats

    rng = np.random.RandomState(3)
    g = rng.randint(0, 5, 500)
    v = rng.uniform(-5, 25, 500)
    v[::17] = 20.0  # exactly the last edge → last bin
    edges = np.array([0.0, 5.0, 10.0, 20.0])
    t = pa.table({"g": pa.array(g, pa.int64()), "v": pa.array(v)})
    bs = collect_batch_stats(t, [], [], {"v": (edges, "g")})
    for gv in np.unique(g):
        want, _ = np.histogram(v[g == gv], bins=edges)
        got = bs.histograms[f"v@{gv}"]
        assert got.tolist() == want.tolist(), (gv, got, want)


def test_std_no_catastrophic_cancellation():
    """Centered-moment (Chan) merge: epoch-µs magnitudes with a 1-second
    spread must NOT collapse std to 0.0 (the naive E[x²]−E[x]² form did,
    through the float64 ulp)."""
    from xmlschema_ray.engine.stats import ColumnStats

    base = 1_755_000_000_000_000_000
    vals = base + np.arange(0, 1_000_000, 1000, dtype=np.int64)
    a, b = ColumnStats(), ColumnStats()
    a.observe(vals[:500].astype(np.float64), 0)
    b.observe(vals[500:].astype(np.float64), 0)
    a.merge(b)
    true_std = float(np.std(vals.astype(np.float64)))
    assert true_std > 0
    # float64 subtraction at 1e18 magnitudes caps precision around 1e-3
    # relative — the point is the OLD formula returned exactly 0.0 (100%
    # error) where the centered merge is within a fraction of a percent
    assert abs(a.std - true_std) / true_std < 1e-3, (a.std, true_std)


def test_nan_treated_as_null_and_merge_order_independent():
    """Float NaN is null for profiling: excluded from count/sum/extremes,
    added to null_count — and the merge is ORDER-INDEPENDENT (Python
    min(1.0, nan) != min(nan, 1.0) previously made tree-merge order
    change min/max)."""
    from xmlschema_ray.engine.stats import ColumnStats

    a1, b1 = ColumnStats(), ColumnStats()
    a1.observe(np.array([1.0, 2.0]), 0)
    b1.observe(np.array([np.nan, 5.0]), 1)
    a1.merge(b1)
    a2, b2 = ColumnStats(), ColumnStats()
    a2.observe(np.array([1.0, 2.0]), 0)
    b2.observe(np.array([np.nan, 5.0]), 1)
    b2.merge(a2)
    for cs in (a1, b2):
        assert (cs.vmin, cs.vmax) == (1.0, 5.0), cs
        assert cs.count == 3 and cs.null_count == 2
        assert abs(cs.mean - 8.0 / 3.0) < 1e-12


def test_ks_psi_empty_actual_is_maximal_drift():
    """An all-zero actual histogram (column gone all-null, or every value
    migrated OUTSIDE the bin range) is maximal drift, not stability."""
    from xmlschema_ray.engine.stats import ks_statistic, psi

    ref = np.array([100, 200, 100])
    zero = np.zeros(3)
    assert ks_statistic(ref, zero) == 1.0
    assert psi(ref, zero) == float("inf")
    assert ks_statistic(zero, zero) == 0.0 and psi(zero, zero) == 0.0


def test_quantile_labels_exact():
    from xmlschema_ray.engine.stats import histogram_quantiles

    h = np.array([10, 10, 10, 10])
    e = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    out = histogram_quantiles(h, e, qs=(0.5, 0.95, 0.99, 0.29, 0.999))
    assert set(out) == {"p50", "p95", "p99", "p29", "p99_9"}, set(out)


def test_hash64_float32_canonicalizes():
    """parquet FLOAT vs DOUBLE spellings of one value hash identically
    (schema drift across file generations must co-locate, never split)."""
    from xmlschema_ray.engine.stats import hash64

    f32 = np.array([7.0, -1.5], dtype=np.float32)
    f64 = np.array([7.0, -1.5], dtype=np.float64)
    assert hash64(f32).tolist() == hash64(f64).tolist()
