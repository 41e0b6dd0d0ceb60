"""Round-5 Arrow-native combiner/partition spine pilot (XSR_ARROW_SPINE):
flag-on vs flag-off equivalence of combiner_aggregate across every agg
kind, null keys, nullable measures, salt and consolidate paths — plus the
dtype claim that motivates the pilot (nullable int64 stays typed int64 at
the Arrow level instead of degrading to float64)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from xmlschema_ray.ops.relational import (
    combiner_aggregate,
    hash_partition_apply,
    hash_partition_apply_arrow,
    to_pandas_with_schema,
)

AGGS = {
    "n": (None, "count"),
    "n_v": ("v", "count"),
    "s": ("v", "sum"),
    "mn": ("v", "min"),
    "mx": ("v", "max"),
    "avg": ("v", "mean"),
}


def _table(nullable: bool) -> pa.Table:
    rng = np.random.RandomState(7)
    n = 5000
    k = rng.randint(0, 37, n)
    v = rng.randint(-100, 100, n).astype(np.int64)
    if nullable:
        varr = pa.array(
            [None if i % 11 == 0 else int(x) for i, x in enumerate(v)], pa.int64()
        )
    else:
        varr = pa.array(v, pa.int64())
    return pa.table({"k": pa.array(k, pa.int64()), "v": varr})


def _run(t: pa.Table, arrow: bool, **kw) -> pd.DataFrame:
    ds = rd.from_arrow(t).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=512, zero_copy_batch=True
    )
    out = to_pandas_with_schema(
        combiner_aggregate(ds, "k", AGGS, batch_size=512, arrow=arrow, **kw)
    )
    out = out.sort_values("k").reset_index(drop=True)
    # normalize dtypes for the value compare (the arrow spine keeps
    # nullable int64 typed; pandas surfaces it as float64 — the compare
    # below checks VALUES agree, the dedicated test below checks types)
    for c in ("n", "n_v", "s", "mn", "mx", "avg"):
        out[c] = out[c].astype("float64")
    out["k"] = out["k"].astype("int64")
    return out[["k", "n", "n_v", "s", "mn", "mx", "avg"]]


@pytest.mark.parametrize("nullable", [False, True])
def test_flag_equivalence(ray_session, nullable):
    t = _table(nullable)
    a = _run(t, arrow=False)
    b = _run(t, arrow=True)
    pd.testing.assert_frame_equal(a, b)
    # independent ground truth
    df = t.to_pandas()
    gb = df.groupby("k")
    assert (a["n"].to_numpy() == gb.size().sort_index().to_numpy()).all()
    assert (a["n_v"].to_numpy() == gb["v"].count().sort_index().to_numpy()).all()


@pytest.mark.parametrize("kw", [{"salt": 4}, {"consolidate": True}])
def test_flag_equivalence_skew_paths(ray_session, kw):
    t = _table(True)
    a = _run(t, arrow=False, **kw)
    b = _run(t, arrow=True, **kw)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, _run(t, arrow=False))  # paths agree


def test_null_keys_form_a_group(ray_session):
    t = pa.table(
        {
            "k": pa.array([1, 1, None, None, 2], pa.int64()),
            "v": pa.array([10, 20, 30, 40, 50], pa.int64()),
        }
    )
    for arrow in (False, True):
        ds = rd.from_arrow(t)
        out = to_pandas_with_schema(
            combiner_aggregate(ds, "k", {"s": ("v", "sum")}, arrow=arrow)
        )
        got = {(-1 if pd.isna(k) else int(k)): int(s) for k, s in zip(out["k"], out["s"])}
        assert got == {1: 30, -1: 70, 2: 50}, (arrow, got)


def test_arrow_spine_keeps_int64_typed(ray_session):
    """The pilot's motivating claim: a null-bearing int64 measure stays
    int64-with-null through the Arrow spine (take_batch at the ARROW
    level), where the pandas spine surfaces float64 — including values
    past 2^53 that a float64 detour would corrupt."""
    big = 2**60 + 7
    t = pa.table(
        {
            "k": pa.array([1, 1, 2], pa.int64()),
            "v": pa.array([big, None, 5], pa.int64()),
        }
    )
    ds = rd.from_arrow(t)
    out = combiner_aggregate(ds, "k", {"s": ("v", "sum")}, arrow=True)
    batch = out.take_batch(10, batch_format="pyarrow")
    assert batch["s"].type == pa.int64()
    got = dict(zip(batch["k"].to_pylist(), batch["s"].to_pylist()))
    assert got == {1: big, 2: 5}  # exact past 2^53 — no float64 detour


def test_hash_partition_apply_arrow_colocates_like_pandas(ray_session):
    """Partition assignment must be IDENTICAL between the two spines (the
    arrow variant hashes key columns through the same stable_key_hash)."""
    t = _table(True)

    def tag_pandas(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": g["k"].unique()})

    def tag_arrow(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"k": pc.unique(g["k"])})

    a = to_pandas_with_schema(
        hash_partition_apply(rd.from_arrow(t), "k", tag_pandas, num_partitions=8)
    )
    b = to_pandas_with_schema(
        hash_partition_apply_arrow(rd.from_arrow(t), "k", tag_arrow, num_partitions=8)
    )
    assert sorted(a["k"].dropna().astype("int64")) == sorted(
        b["k"].dropna().astype("int64")
    )
    assert len(a) == len(b)  # same number of (partition, key) incidences


def test_all_null_group_sum_is_null_on_both_spines(ray_session):
    """SQL semantics on BOTH spines: SUM over an all-null group is NULL
    (pandas' bare .sum() would invent 0 — min_count=1 fix); COUNT(col) 0,
    mean NULL. Key 2's measures are all null; key 1 has values."""
    t = pa.table(
        {
            "k": pa.array([1, 1, 2, 2], pa.int64()),
            "v": pa.array([10, 20, None, None], pa.int64()),
        }
    )
    for arrow in (False, True):
        out = to_pandas_with_schema(
            combiner_aggregate(
                rd.from_arrow(t),
                "k",
                {"s": ("v", "sum"), "n_v": ("v", "count"), "m": ("v", "mean")},
                arrow=arrow,
            )
        ).set_index("k")
        assert out.loc[1, "s"] == 30 and out.loc[1, "n_v"] == 2
        assert pd.isna(out.loc[2, "s"]), (arrow, out)
        assert out.loc[2, "n_v"] == 0
        assert pd.isna(out.loc[2, "m"]), (arrow, out)


def test_semi_join_copartitioned_empty_build_side(ray_session):
    """A corpus-EMPTY build side (the schema-collapse pitfall: a second
    map over fully-empty blocks) must not crash: semi keeps nothing
    (typed empty), anti keeps every NON-NULL probe row."""
    import pyarrow.compute as pc

    from xmlschema_ray.ops.relational import semi_join_copartitioned

    left = pa.table(
        {
            "k": pa.array([1, 2, None, 4], pa.int64()),
            "x": pa.array(["a", "b", "c", "d"], pa.string()),
        }
    )
    right = pa.table({"rk": pa.array([1, 2, 3], pa.int64())})
    empty_right = (
        rd.from_arrow(right)
        .map_batches(  # first map: filter everything out
            lambda t: t.filter(pc.greater(t["rk"], 100)),
            batch_format="pyarrow",
        )
    )
    semi = to_pandas_with_schema(
        semi_join_copartitioned(rd.from_arrow(left), empty_right, "k", "rk")
    )
    assert len(semi) == 0 and list(semi.columns) == ["k", "x"]
    anti = to_pandas_with_schema(
        semi_join_copartitioned(
            rd.from_arrow(left), empty_right, "k", "rk", keep_members=False
        )
    ).sort_values("k")
    assert anti["k"].tolist() == [1, 2, 4]  # null probe never survives
