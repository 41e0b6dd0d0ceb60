"""Relational-ops layer: combiner aggregation, joins, top-k, partition
balance under skew."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from xmlschema_ray.ops.relational import (
    anti_join,
    broadcast_join,
    combiner_aggregate,
    hash_partition_apply,
    semi_join,
    topk,
)


def _sample_ds(n=5000, seed=3):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 50, size=n),
            "v": rng.integers(0, 1000, size=n).astype("int64"),
        }
    )
    return rd.from_pandas(df), df


def test_combiner_aggregate_matches_pandas(ray_session):
    ds, df = _sample_ds()
    out = (
        combiner_aggregate(
            ds,
            keys="k",
            aggs={
                "s": ("v", "sum"),
                "lo": ("v", "min"),
                "hi": ("v", "max"),
                "n": (None, "count"),
                "m": ("v", "mean"),
            },
            batch_size=512,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    gb = df.groupby("k")["v"]
    truth = pd.DataFrame(
        {"k": gb.sum().index, "s": gb.sum().values, "lo": gb.min().values,
         "hi": gb.max().values, "n": gb.size().values, "m": gb.mean().values}
    )
    for c in ["s", "lo", "hi", "n"]:
        assert out[c].astype("int64").tolist() == truth[c].astype("int64").tolist()
    assert np.allclose(out["m"], truth["m"])


def test_hash_partition_apply_colocates_and_balances(ray_session):
    """All rows of one key land in one partition; a skewed key does not
    blow up any single partition beyond its own mass (FIXTURES
    reducer-balance)."""
    rng = np.random.default_rng(0)
    keys = np.where(rng.random(20000) < 0.5, "hot", rng.integers(0, 1000, 20000).astype(str))
    ds = rd.from_pandas(pd.DataFrame({"k": keys}))

    def tag(part: pd.DataFrame) -> pd.DataFrame:
        out = part.groupby("k", sort=False).size().reset_index(name="n")
        out["part_rows"] = len(part)
        return out

    res = hash_partition_apply(ds, "k", tag, num_partitions=16).to_pandas()
    # co-location: each key appears in exactly one partition-output row
    assert res["k"].is_unique
    # balance: non-hot mass spreads — the largest partition is the hot one,
    # and it carries at most hot + ~3x fair share of the rest
    hot_rows = int(res.loc[res["k"] == "hot", "n"].iloc[0])
    assert hot_rows > 9000
    fair = (20000 - hot_rows) / 16
    assert res["part_rows"].max() <= hot_rows + 4 * fair


def test_broadcast_semi_anti_join(ray_session):
    ds, df = _sample_ds(2000)
    dim = pd.DataFrame({"k": [1, 2, 3], "label": ["a", "b", "c"]})
    joined = broadcast_join(ds, dim, left_on="k").to_pandas()
    truth = df.merge(dim, on="k")
    assert len(joined) == len(truth)
    semi = semi_join(ds, dim, on="k", key="k").to_pandas()
    assert set(semi["k"].unique()) <= {1, 2, 3}
    assert len(semi) == (df["k"].isin([1, 2, 3])).sum()
    anti = anti_join(ds, dim, on="k", key="k").to_pandas()
    assert len(anti) == len(df) - len(semi)


def test_topk(ray_session):
    ds, df = _sample_ds(3000)
    got = topk(ds, "v", 7, descending=True, tiebreak=["k"]).to_pandas()
    truth = df.sort_values(["v", "k"], ascending=[False, True]).head(7).reset_index(drop=True)
    assert got["v"].tolist() == truth["v"].tolist()


def test_hash_bucket_join_matches_pandas_merge(ray_session):
    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "key": rng.integers(0, 300, size=4000).astype("int64"),
            # values past 2^53 prove the copartition path never roundtrips
            # int64 through float64 (the padded-null poisoning hazard)
            "big": rng.integers(2**60, 2**62, size=4000).astype("int64"),
        }
    )
    right = pd.DataFrame(
        {
            "rkey": np.arange(0, 250, dtype="int64"),
            "label": [f"L{i}" for i in range(250)],
        }
    )
    from xmlschema_ray.ops.relational import hash_bucket_join

    got = (
        hash_bucket_join(
            rd.from_pandas(left), rd.from_pandas(right), "key", "rkey", num_partitions=8
        )
        .to_pandas()
        .sort_values(["key", "big"])
        .reset_index(drop=True)
    )
    truth = (
        left.merge(right, left_on="key", right_on="rkey")
        .drop(columns="rkey")
        .sort_values(["key", "big"])
        .reset_index(drop=True)
    )
    assert got["big"].dtype == np.int64
    pd.testing.assert_frame_equal(got[truth.columns], truth)


def test_asof_join_bucketed_matches_broadcast(ray_session):
    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "eid": np.arange(3000, dtype="int64"),
            "uid": rng.integers(0, 40, size=3000).astype("int64"),
            "t": rng.integers(0, 10_000, size=3000).astype("int64"),
        }
    )
    right = pd.DataFrame(
        {
            "ruid": rng.integers(0, 40, size=500).astype("int64"),
            "rt": rng.integers(0, 10_000, size=500).astype("int64"),
        }
    )
    # dedupe (ruid, rt) so the asof match is unique -> deterministic compare
    right = right.drop_duplicates(["ruid", "rt"]).reset_index(drop=True)
    from xmlschema_ray.ops.relational import asof_join, asof_join_broadcast, asof_join_bucketed

    bc = (
        asof_join_broadcast(rd.from_pandas(left), right, "t", "rt", "uid", "ruid")
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    bk = (
        asof_join_bucketed(
            rd.from_pandas(left), rd.from_pandas(right), "t", "rt", "uid", "ruid",
            num_partitions=8,
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    cols = ["eid", "uid", "t", "rt"]
    pd.testing.assert_frame_equal(bk[cols], bc[cols])

    # adaptive switch: threshold 0 forces the bucketed path
    ad = (
        asof_join(
            rd.from_pandas(left), rd.from_pandas(right), "t", "rt", "uid", "ruid",
            broadcast_threshold_bytes=0, num_partitions=8,
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ad[cols], bc[cols])


def test_hash_partition_apply_empty_partitions_keep_schema(ray_session):
    """Forced-empty partitions: 2 distinct keys over 32 partitions and 16
    input blocks leave most shuffle ranges empty — every output block must
    still carry the declared columns, and to_pandas must keep the schema."""
    from xmlschema_ray.ops.relational import to_pandas_with_schema

    df = pd.DataFrame({"k": np.repeat([1, 2], 500), "v": np.arange(1000.0)})
    ds = rd.from_pandas(df).repartition(16)

    def per(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby("k", sort=False)
        return pd.DataFrame({"s": gb["v"].sum()}).reset_index()

    out = hash_partition_apply(ds, "k", per, num_partitions=32)
    blocks = list(out.iter_batches(batch_size=None, batch_format="pandas"))
    assert blocks, "no output blocks"
    for b in blocks:
        assert list(b.columns) == ["k", "s"], list(b.columns)
    got = out.to_pandas()
    got = got[got["s"].notna()].astype({"k": "int64"}) if got["k"].isna().any() else got
    got = got.sort_values("k").reset_index(drop=True)
    exp = df.groupby("k")["v"].sum().rename("s").reset_index()
    pd.testing.assert_frame_equal(got[got["s"] > 0].reset_index(drop=True), exp)

    # all-filtered result keeps columns through the helper
    empty = to_pandas_with_schema(out.filter(expr="s < 0"))
    assert list(empty.columns) == ["k", "s"] and len(empty) == 0


def test_copartition_empty_partitions_keep_schema(ray_session):
    from xmlschema_ray.ops.relational import hash_bucket_join

    left = pd.DataFrame({"k": [1, 1, 2], "a": [10, 20, 30]})
    right = pd.DataFrame({"k2": [1, 2, 2], "b": ["x", "y", "z"]})
    out = hash_bucket_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(4),
        "k",
        "k2",
        num_partitions=16,
    )
    blocks = list(out.iter_batches(batch_size=None, batch_format="pandas"))
    cols = {tuple(b.columns) for b in blocks}
    assert cols == {("k", "a", "b")}, cols
    got = out.to_pandas().sort_values(["k", "a", "b"]).reset_index(drop=True)
    exp = (
        left.merge(right, left_on="k", right_on="k2")
        .drop(columns="k2")
        .sort_values(["k", "a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_orders_price_ntile_ties_across_partitions(tmp_path, ray_session):
    """NTILE with heavy ties: duplicate prices must rank by the unique key
    across range-partition boundaries, matching a pandas window oracle."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xmlschema_ray.pipelines.relational import orders_price_ntile

    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            # only 5 distinct prices -> every range boundary lands inside a tie run
            "o_totalprice": rng.choice([10.0, 10.01, 20.5, 20.5, 99.99], size=n),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "orders.parquet"))

    out = orders_price_ntile(str(tmp_path), n_buckets=4).to_pandas()
    ref = df.sort_values(["o_totalprice", "o_orderkey"]).reset_index(drop=True)
    q, r = divmod(n, 4)
    sizes = [q + 1] * r + [q] * (4 - r)
    ref["bucket"] = np.repeat(np.arange(1, 5), sizes)
    ref = ref.sort_values("o_orderkey").reset_index(drop=True)
    got = out.sort_values("o_orderkey").reset_index(drop=True)
    assert got["bucket"].tolist() == ref["bucket"].tolist()


def test_combiner_aggregate_salt_and_consolidate_equivalent(ray_session):
    """Skew controls are exact: plain, salted, and consolidated merges all
    produce identical aggregates on a hot-key distribution (one key holds
    half the rows), including mean finalization."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from xmlschema_ray.ops.relational import combiner_aggregate, to_pandas_with_schema

    rng = np.random.default_rng(11)
    n = 20000
    keys = np.where(rng.random(n) < 0.5, "HOT", rng.choice([f"k{i}" for i in range(50)], n))
    df = pd.DataFrame({"k": keys, "v": rng.integers(0, 1000, n)})
    ds = rd.from_pandas(df).repartition(8)
    aggs = {"s": ("v", "sum"), "m": ("v", "mean"), "lo": ("v", "min"), "n": (None, "count")}

    def run(**kw):
        out = to_pandas_with_schema(combiner_aggregate(ds, "k", aggs, batch_size=512, **kw))
        return out.sort_values("k").reset_index(drop=True)

    plain = run()
    salted = run(salt=4)
    consolidated = run(consolidate=True)
    both = run(salt=4, consolidate=True)
    for other in (salted, consolidated, both):
        pd.testing.assert_frame_equal(plain, other[plain.columns.tolist()])
    truth = (
        df.groupby("k")
        .agg(s=("v", "sum"), m=("v", "mean"), lo=("v", "min"), n=("v", "size"))
        .reset_index()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert plain["s"].tolist() == truth["s"].tolist()
    assert plain["n"].tolist() == truth["n"].tolist()
    assert np.allclose(plain["m"], truth["m"])


def test_except_keys_matches_set_difference(ray_session):
    from xmlschema_ray.ops.relational import except_keys

    rng = np.random.default_rng(7)
    a = pd.DataFrame({"ka": rng.integers(0, 400, size=3000)})
    b = pd.DataFrame({"kb": rng.integers(200, 600, size=3000)})
    out = (
        except_keys(rd.from_pandas(a), rd.from_pandas(b), "ka", "kb")
        .to_pandas()["ka"]
        .sort_values()
        .to_numpy()
    )
    expect = np.array(sorted(set(a["ka"]) - set(b["kb"])))
    assert np.array_equal(out, expect)
    assert len(out) > 0  # non-vacuous by construction


def test_except_keys_empty_difference(ray_session):
    from xmlschema_ray.ops.relational import except_keys, to_pandas_with_schema

    a = pd.DataFrame({"k": np.arange(10, dtype=np.int64)})
    b = pd.DataFrame({"k": np.arange(20, dtype=np.int64)})
    out = to_pandas_with_schema(except_keys(rd.from_pandas(a), rd.from_pandas(b), "k", "k"))
    assert len(out) == 0 and list(out.columns) == ["k"]


def test_global_rank_exact_with_ties(ray_session):
    from xmlschema_ray.ops.relational import global_rank

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "v": rng.integers(0, 20, size=4000),  # heavy ties across ranges
            "uid": rng.permutation(4000).astype("int64"),
        }
    )
    ranked, total = global_rank(
        rd.from_pandas(df).repartition(8), ["v", "uid"], rank_col="r"
    )
    assert total == 4000
    out = ranked.to_pandas().sort_values(["v", "uid"]).reset_index(drop=True)
    assert np.array_equal(out["r"].to_numpy(), np.arange(1, 4001))


def test_global_rank_string_keys_and_small_input(ray_session):
    from xmlschema_ray.ops.relational import global_rank

    df = pd.DataFrame({"s": list("dcabe"), "uid": np.arange(5, dtype=np.int64)})
    ranked, total = global_rank(rd.from_pandas(df), ["s", "uid"], rank_col="r")
    assert total == 5
    out = ranked.to_pandas().sort_values("r")
    assert list(out["s"]) == sorted("dcabe")


def test_range_join_bucketed_matches_bruteforce(ray_session):
    from xmlschema_ray.ops.relational import range_join_bucketed

    rng = np.random.default_rng(13)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 20, size=800).astype("int64"),
            "t": rng.integers(0, 1000, size=800).astype("int64"),
            "lid": np.arange(800, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.integers(0, 20, size=600).astype("int64"),
            "rt": rng.integers(0, 1000, size=600).astype("int64"),
            "rid": np.arange(600, dtype=np.int64),
        }
    )
    out = (
        range_join_bucketed(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(4),
            "k", "rk", "t", "rt", lo_offset=-50, hi_offset=10,
        )
        .to_pandas()
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    brute = left.merge(right, left_on="k", right_on="rk")
    brute = brute[(brute["rt"] - brute["t"] >= -50) & (brute["rt"] - brute["t"] < 10)]
    brute = brute.sort_values(["lid", "rid"]).reset_index(drop=True)
    assert len(out) == len(brute) and len(out) > 0
    assert np.array_equal(out["lid"].to_numpy(), brute["lid"].to_numpy())
    assert np.array_equal(out["rid"].to_numpy(), brute["rid"].to_numpy())


def test_range_join_bucketed_no_matches(ray_session):
    from xmlschema_ray.ops.relational import range_join_bucketed, to_pandas_with_schema

    left = pd.DataFrame({"k": [1, 2], "t": [0, 0], "lid": [0, 1]})
    right = pd.DataFrame({"rk": [1, 2], "rt": [500, 600], "rid": [0, 1]})
    out = to_pandas_with_schema(
        range_join_bucketed(
            rd.from_pandas(left), rd.from_pandas(right), "k", "rk", "t", "rt", -10, 10
        )
    )
    assert len(out) == 0


def test_range_self_join_matches_two_input_path(ray_session):
    from xmlschema_ray.ops.relational import range_join_bucketed, range_self_join

    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 15, size=600).astype("int64"),
            "t": rng.integers(0, 500, size=600).astype("int64"),
            "id": np.arange(600, dtype=np.int64),
        }
    )
    self_out = (
        range_self_join(
            rd.from_pandas(df).repartition(4), "k", "t", -40, 0,
            rename={"id": "prev_id", "t": "prev_t"},
        )
        .to_pandas()
        .sort_values(["id", "prev_id"])
        .reset_index(drop=True)
    )
    right = df.rename(columns={"k": "rk", "t": "rt", "id": "rid"})
    two_out = (
        range_join_bucketed(
            rd.from_pandas(df).repartition(4), rd.from_pandas(right),
            "k", "rk", "t", "rt", -40, 0,
        )
        .to_pandas()
        .sort_values(["id", "rid"])
        .reset_index(drop=True)
    )
    assert len(self_out) == len(two_out) and len(self_out) > 0
    assert np.array_equal(self_out["prev_id"].to_numpy(), two_out["rid"].to_numpy())
    assert np.array_equal(self_out["prev_t"].to_numpy(), two_out["rt"].to_numpy())


def test_snapshot_diff_classifies_all_three(ray_session):
    from xmlschema_ray.ops.relational import snapshot_diff

    a = pd.DataFrame({"k": [1, 2, 3, 4], "v": [10.0, 20.0, 30.0, 40.0]})
    b = pd.DataFrame({"k": [2, 3, 4, 5], "v": [20.0, 31.0, 40.0, 50.0]})
    out = (
        snapshot_diff(rd.from_pandas(a).repartition(2), rd.from_pandas(b).repartition(2), "k", ["v"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 3, 5]
    assert out["change"].tolist() == ["removed", "changed", "added"]


def test_broadcast_join_size_gate(ray_session):
    from xmlschema_ray.ops.relational import broadcast_join

    big = pd.DataFrame({"k": np.arange(1000, dtype=np.int64), "v": np.ones(1000)})
    ds = rd.from_pandas(pd.DataFrame({"k": [1, 2]}))
    with pytest.raises(ValueError, match="hash_bucket_join"):
        broadcast_join(ds, big, "k", max_broadcast_bytes=1024)
    # under the gate it still joins
    out = broadcast_join(ds, big.head(5), "k").to_pandas()
    assert out["v"].tolist() == [1.0, 1.0]


def test_range_self_join_rejects_rename_collision(ray_session):
    from xmlschema_ray.ops.relational import range_self_join

    df = pd.DataFrame({"k": [1, 1], "t": [0, 10], "id": [1, 2]})
    with pytest.raises(Exception, match="collide"):
        range_self_join(
            rd.from_pandas(df), "k", "t", -40, 0, rename={"id": "t"}
        ).materialize()


def test_global_rank_bounded_sample_shrink_path(ray_session):
    """Force the distributed boundary-sample reduce (sample > driver cap
    via stride=1) — ranks stay exact and the driver-collected candidate
    set is bounded, whatever the corpus size."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from xmlschema_ray.ops.relational import (
        global_rank,
        sample_range_bounds,
        to_pandas_with_schema,
    )

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"v": rng.permutation(10_000), "id": np.arange(10_000)})
    ds = rd.from_pandas(df).repartition(8)

    bounds = sample_range_bounds(ds, ["v", "id"], num_partitions=4, sample_stride=1)
    assert bounds is not None and len(bounds[0]) == 3

    ranked, total = global_rank(ds, ["v", "id"], sample_stride=1, num_partitions=4)
    out = to_pandas_with_schema(ranked).sort_values("rank").reset_index(drop=True)
    assert total == 10_000
    # exact: rank order == value order
    assert (out["v"].to_numpy() == np.sort(df["v"].to_numpy())).all()
    assert (out["rank"].to_numpy() == np.arange(1, 10_001)).all()


def test_late_event_counts_matches_sequential_bruteforce(tmp_path, ray_session):
    """Distributed prefix-max watermark == a driver-side sequential scan,
    across multiple range partitions and event-time days."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xmlschema_ray.pipelines.relational import late_event_counts

    rng = np.random.RandomState(7)
    n = 5000
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        np.sort(rng.randint(0, 5 * 86400, n)), unit="s"
    )
    df = pd.DataFrame({"event_id": np.arange(n, dtype=np.int64), "ts": ts})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False), d / "events.parquet"
    )

    got = late_event_counts(str(d))

    # brute force: same simulated arrival order, sequential watermark
    ak = ((df["event_id"] % 2**31) * 2654435761) % 2**32
    order = np.lexsort((df["event_id"].to_numpy(), ak.to_numpy()))
    ts_us = df["ts"].to_numpy("datetime64[us]").view(np.int64)[order]
    wm = np.empty(n, dtype=np.int64)
    wm[0] = np.iinfo(np.int64).min
    np.maximum.accumulate(ts_us[:-1], out=wm[1:])
    late = wm > ts_us + 3_600_000_000
    day = pd.to_datetime((ts_us // 86_400_000_000) * 86_400_000_000, unit="us").strftime(
        "%Y-%m-%d"
    )
    want = (
        pd.DataFrame({"day": day, "late": late.astype(np.int64)})
        .groupby("day")
        .agg(n_events=("late", "size"), n_late=("late", "sum"))
        .reset_index()
        .astype({"n_events": "int64", "n_late": "int64"})
    )
    pd.testing.assert_frame_equal(got, want.sort_values("day").reset_index(drop=True))


# -- skew_split_join: the hot/cold split is plan-only -----------------------


def _skew_fixture(seed=23, n=6000, n_keys=40, hot_key=7, hot_frac=0.5):
    """A zipf-ish probe: one key holds half the rows; build side is a dim."""
    rng = np.random.default_rng(seed)
    key = rng.integers(0, n_keys, size=n).astype("int64")
    hot_rows = rng.random(n) < hot_frac
    key[hot_rows] = hot_key
    left = pd.DataFrame(
        {
            "key": key,
            "big": rng.integers(2**60, 2**62, size=n).astype("int64"),
        }
    )
    right = pd.DataFrame(
        {
            "rkey": np.arange(0, n_keys - 5, dtype="int64"),  # 5 keys unmatched
            "label": [f"L{i}" for i in range(n_keys - 5)],
        }
    )
    truth_inner = (
        left.merge(right, left_on="key", right_on="rkey")
        .drop(columns="rkey")
        .sort_values(["key", "big"])
        .reset_index(drop=True)
    )
    return left, right, truth_inner


@pytest.mark.parametrize(
    "hot_threshold",
    [1, 100, 10**9],  # all-hot / mixed (only the planted key crosses) / all-cold
)
def test_skew_split_join_equals_plain_join_any_split(ray_session, hot_threshold):
    from xmlschema_ray.ops.relational import skew_split_join

    left, right, truth = _skew_fixture()
    got = (
        skew_split_join(
            rd.from_pandas(left).repartition(6),
            rd.from_pandas(right),
            "key",
            "rkey",
            hot_threshold=hot_threshold,
            num_partitions=8,
        )
        .to_pandas()
        .sort_values(["key", "big"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(truth.dtypes.to_dict()), truth)


def test_skew_split_join_left_outer_keeps_unmatched_hot_and_cold(ray_session):
    from xmlschema_ray.ops.relational import skew_split_join

    left, right, _ = _skew_fixture(hot_key=38)  # hot key OUTSIDE the build dim
    truth = (
        left.merge(right, how="left", left_on="key", right_on="rkey")
        .drop(columns="rkey")
        .sort_values(["key", "big"])
        .reset_index(drop=True)
    )
    got = (
        skew_split_join(
            rd.from_pandas(left).repartition(6),
            rd.from_pandas(right),
            "key",
            "rkey",
            how="left",
            hot_threshold=100,
            num_partitions=8,
        )
        .to_pandas()
        .sort_values(["key", "big"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(truth.dtypes.to_dict()), truth)


def test_skew_split_join_hot_build_guard(ray_session):
    from xmlschema_ray.ops.relational import skew_split_join

    left, _, _ = _skew_fixture()
    fat_build = pd.DataFrame(
        {"rkey": np.full(500, 7, dtype="int64"), "label": ["x"] * 500}
    )
    with pytest.raises(ValueError, match="hot build side"):
        skew_split_join(
            rd.from_pandas(left),
            rd.from_pandas(fat_build),
            "key",
            "rkey",
            hot_threshold=100,
            max_hot_build_rows=100,
        ).to_pandas()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_skew_split_join_randomized_string_keys_many_to_many(ray_session, seed):
    """Randomized: string keys, duplicate build keys (many-to-many), a
    random threshold — output must equal pandas merge exactly."""
    from xmlschema_ray.ops.relational import skew_split_join

    rng = np.random.default_rng(seed)
    n = int(rng.integers(500, 3000))
    keys = np.array([f"k{int(i):03d}" for i in rng.integers(0, 25, size=n)], dtype=object)
    keys[rng.random(n) < 0.3] = "k007"  # planted hot key
    left = pd.DataFrame({"key": keys, "v": rng.integers(0, 100, size=n).astype("int64")})
    m = int(rng.integers(10, 60))
    right = pd.DataFrame(
        {
            "rkey": np.array([f"k{int(i):03d}" for i in rng.integers(0, 22, size=m)], dtype=object),
            "w": rng.integers(0, 9, size=m).astype("int64"),
        }
    )
    threshold = int(rng.integers(1, 400))
    got = (
        skew_split_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right),
            "key",
            "rkey",
            hot_threshold=threshold,
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["key", "v", "w"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="key", right_on="rkey")
        .drop(columns="rkey")
        .sort_values(["key", "v", "w"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


# -- melt_dataset (UNPIVOT) ---------------------------------------------------


def test_melt_dataset_long_form(ray_session):
    import pandas as pd

    from xmlschema_ray.ops.transform import melt_dataset

    ds = rd.from_pandas(pd.DataFrame({"k": [1, 2], "a": [10, 20], "b": [30, 40]}))
    out = (
        melt_dataset(ds, ["k"], ["a", "b"])
        .to_pandas()
        .sort_values(["k", "measure"])
        .reset_index(drop=True)
    )
    assert len(out) == 4
    assert out["measure"].tolist() == ["a", "b", "a", "b"]
    assert out["value"].tolist() == [10, 30, 20, 40]
    assert str(out["value"].dtype) == "int64"


def test_melt_dataset_refuses_mixed_types(ray_session):
    import pandas as pd
    import pytest as _pt

    from xmlschema_ray.ops.transform import melt_dataset

    ds = rd.from_pandas(pd.DataFrame({"k": [1], "a": [10], "b": [0.5]}))
    with _pt.raises(Exception):  # TypeError inside the map task surfaces as RayTaskError
        melt_dataset(ds, ["k"], ["a", "b"]).to_pandas()


def test_grouped_mode_tie_break(ray_session):
    import pandas as pd

    from xmlschema_ray.pipelines.relational import grouped_mode

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 2, 2, 3],
            "v": ["b", "b", "a", "a", "z", "y", "q"],
        }
    )
    out = (
        grouped_mode(rd.from_pandas(df), "k", "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # k=1: a/b tie at 2 -> smallest value 'a'; k=2: y/z tie -> 'y'
    assert out["mode_value"].tolist() == ["a", "y", "q"]
    assert out["n"].tolist() == [2, 1, 1]


def test_melt_dataset_refuses_name_collision(ray_session):
    import pandas as pd
    import pytest as _pt

    from xmlschema_ray.ops.transform import melt_dataset

    ds = rd.from_pandas(pd.DataFrame({"measure": [1], "a": [2], "b": [3]}))
    with _pt.raises(ValueError, match="collide"):
        melt_dataset(ds, ["measure"], ["a", "b"])  # default var_name='measure'


def test_combiner_mean_and_count_null_semantics(ray_session):
    import numpy as np
    import pandas as pd

    from xmlschema_ray.ops.relational import combiner_aggregate

    df = pd.DataFrame({"k": [1, 1, 1, 2], "x": [1.0, 3.0, np.nan, 5.0]})
    out = (
        combiner_aggregate(
            rd.from_pandas(df),
            "k",
            {"m": ("x", "mean"), "c_col": ("x", "count"), "c_star": (None, "count")},
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # SQL semantics: AVG skips nulls; COUNT(col) counts non-null; COUNT(*) rows
    assert out["m"].tolist() == [2.0, 5.0]
    assert out["c_col"].tolist() == [2, 1]
    assert out["c_star"].tolist() == [3, 1]


def test_hash_bucket_join_null_key_sql_semantics(ray_session):
    import numpy as np
    import pandas as pd

    from xmlschema_ray.ops.relational import hash_bucket_join, to_pandas_with_schema

    l = pd.DataFrame({"k": [1.0, np.nan, 2.0], "a": [10, 20, 30]})
    r = pd.DataFrame({"rk": [1.0, np.nan], "b": [100, 200]})
    inner = to_pandas_with_schema(
        hash_bucket_join(rd.from_pandas(l), rd.from_pandas(r), "k", "rk")
    )
    # SQL: null never matches null — exactly one row (k=1)
    assert len(inner) == 1 and int(inner["b"].iloc[0]) == 100
    left = to_pandas_with_schema(
        hash_bucket_join(rd.from_pandas(l), rd.from_pandas(r), "k", "rk", how="left")
    ).sort_values("a")
    # left keeps the null-key probe row UNMATCHED
    assert len(left) == 3
    assert np.isnan(left.loc[left["a"] == 20, "b"].iloc[0])


def test_stable_hash_copartition_mixed_dtype_batches(ray_session):
    import numpy as np
    import pandas as pd

    from xmlschema_ray.ops.relational import combiner_aggregate

    # two blocks: one carries the key as float64 (null-bearing), one as
    # int64 — the same logical key 7 must land in ONE partition and fold
    # to ONE output row
    b1 = pd.DataFrame({"k": pd.array([7.0, np.nan], dtype="float64"), "x": [1, 1]})
    b2 = pd.DataFrame({"k": pd.array([7, 8], dtype="int64"), "x": [1, 1]})
    out = (
        combiner_aggregate(rd.from_pandas([b1, b2]), "k", {"n": (None, "count")})
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    by_key = {k: n for k, n in zip(out["k"], out["n"]) if not pd.isna(k)}
    assert by_key[7.0] == 2, out  # one row for key 7, count 2 — not split
    assert by_key[8.0] == 1


def test_bloom_dtype_stable_no_false_negatives(ray_session):
    import numpy as np

    from xmlschema_ray.ops.bloom import BloomFilter

    f = BloomFilter(m_bits=1 << 12, n_hashes=5)
    # build from a null-bearing (float64) spelling; probe as int64
    f.add_many(np.array([7.0, 8.0, np.nan]))
    got = f.contains_many(np.array([7, 8, 9], dtype=np.int64))
    assert bool(got[0]) and bool(got[1])  # no false negatives
