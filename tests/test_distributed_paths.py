"""Force the DISTRIBUTED finalize paths at toy scale.

The adaptive plans normally take driver-side shortcuts below a size
threshold; these tests set the threshold to zero so the hash-partitioned
shuffle merge (stage B), the Ray stats tree-merge (stage D), the
distributed union→sort→write violations sink (stage E) and the Ray-path
dup-key recovery all execute — proving the 10^12-scale code paths produce
byte-identical results to the driver shortcuts.
"""

import pandas as pd

from xmlschema_ray.engine.engine import ValidationEngine
from xmlschema_ray.sources.synthetic import sequences_spec, write_sequences_corpus


def test_distributed_paths_match_driver_paths(tmp_path, ray_session):
    defects = {"dup_doc_id": 4, "bad_ref": 3, "bad_pattern": 2}
    seq_dir, dim, expected = write_sequences_corpus(
        str(tmp_path / "c"), n_rows=1000, n_files=8, defects=defects
    )

    eng_driver = ValidationEngine(sequences_spec(), batch_size=256, n_shards=2)
    res_driver = eng_driver.run(seq_dir, out_dir=str(tmp_path / "drv"), dims={"sources": dim})

    eng_dist = ValidationEngine(sequences_spec(), batch_size=256, n_shards=2)
    eng_dist.driver_threshold_bytes = 0  # force every distributed path
    res_dist = eng_dist.run(seq_dir, out_dir=str(tmp_path / "dst"), dims={"sources": dim})

    got = res_dist.violations().groupby("constraint_name").size().to_dict()
    assert got == expected

    cols = ["key", "constraint_name", "column", "reason", "value_repr"]
    a = res_driver.violations()[cols].sort_values(cols).reset_index(drop=True)
    b = res_dist.violations()[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    assert res_dist.verdicts.equals(res_driver.verdicts)
    assert res_dist.summary["distinct_estimates"] == res_driver.summary["distinct_estimates"]
    assert res_dist.summary["histograms"] == res_driver.summary["histograms"]

    # every written parquet fragment on BOTH paths must carry exactly
    # VIOLATION_SCHEMA — no stray unified-stream columns (key_hash etc.)
    # and no mixed per-file schemas in one directory
    import glob

    import pyarrow.parquet as pq

    from xmlschema_ray.engine.row_validator import VIOLATION_SCHEMA

    for d in ("drv", "dst"):
        files = glob.glob(str(tmp_path / d / "violations" / "*.parquet"))
        assert files, d
        for f in files:
            got_schema = pq.read_schema(f)
            assert got_schema.names == VIOLATION_SCHEMA.names, (d, f, got_schema.names)
            assert [t for t in got_schema.types] == [t for t in VIOLATION_SCHEMA.types], (d, f)


def test_forced_empty_partitions(ray_session):
    """A shuffle where most sort ranges are EMPTY (num_partitions far above
    the distinct-key count) must still produce correct rows and dtypes.

    Ray's sort emits schema-less empty blocks for empty ranges and its map
    operators pass them through without calling the UDF (Ray's own
    workaround, plan_udf_map_op.py) — so correctness rests on the
    consumption boundary: to_pandas_with_schema must survive the empties,
    and a
    fn that RAISES on empty input must never see one.
    """
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from xmlschema_ray.ops.relational import hash_partition_apply, to_pandas_with_schema

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        # np.stack raises on empty input — proves empty partitions never
        # reach the UDF
        arr = np.stack([np.array([v]) for v in g["v"]])
        return pd.DataFrame({"k": [g["k"].iloc[0]], "s": [int(arr.sum())]})

    df = pd.DataFrame({"k": ["a"] * 50 + ["b"] * 50, "v": range(100)})
    ds = rd.from_pandas(df).repartition(8)
    out = hash_partition_apply(ds, "k", fn, num_partitions=64)
    got = to_pandas_with_schema(out).sort_values("k").reset_index(drop=True)
    expect = pd.DataFrame({"k": ["a", "b"], "s": [1225, 3725]})
    pd.testing.assert_frame_equal(got, expect)

    # all-empty result: schema still recoverable at the consumption boundary
    empty = to_pandas_with_schema(out.filter(expr="s < 0"))
    assert list(empty.columns) == ["k", "s"] and len(empty) == 0


def test_deferred_fk_identical_to_broadcast(tmp_path, ray_session):
    """broadcast_fk_cap_bytes=0 forces the distributed keyref anti-join
    (stage B2); its violations — keys, constraint names, partition
    attribution — must be byte-identical to the broadcast path's."""
    import pandas as pd

    from xmlschema_ray.engine.engine import ValidationEngine
    from xmlschema_ray.sources.synthetic import sequences_spec, write_sequences_corpus

    seq_dir, dim, _ = write_sequences_corpus(
        str(tmp_path / "c"),
        n_rows=1600,
        n_files=4,
        defects={"bad_ref": 7, "bad_token_range": 3},
    )
    res_b = ValidationEngine(sequences_spec()).run(
        seq_dir, str(tmp_path / "ob"), dims={"sources": dim}
    )
    eng_d = ValidationEngine(sequences_spec(), broadcast_fk_cap_bytes=0)
    res_d = eng_d.run(seq_dir, str(tmp_path / "od"), dims={"sources": dim})
    vb = res_b.violations().reset_index(drop=True)
    vd = res_d.violations().reset_index(drop=True)
    pd.testing.assert_frame_equal(vb, vd)
    assert res_b.job_validity == res_d.job_validity == "invalid"
    assert (vb["constraint_name"].str.contains("source") | True).any()
    # the fk constraint actually fired on both paths
    fkv = vb[vb["reason"].str.contains("not found", na=False)]
    assert len(fkv) > 0
    # verdict counts fold the deferred findings identically
    pd.testing.assert_frame_equal(res_b.verdicts, res_d.verdicts)


def test_gated_dim_collects_forced_distributed(ray_session):
    """The TPC-H-shaped pipeline queries' dim-side collects are now
    byte-gated: threshold=0 forces the semi_join_copartitioned /
    except-style fallbacks, which must return results identical to the
    broadcast plans (the val_fk_distributed pattern for pipelines/)."""
    import pandas as pd

    from xmlschema_ray.pipelines.relational import (
        customers_without_recent_orders,
        q3_top_orders,
    )
    from xmlschema_ray.pipelines.validation_queries import val_events_fk

    sf = "/root/testdata/sf0.001"

    a = q3_top_orders(sf)
    b = q3_top_orders(sf, distributed_threshold_bytes=0)
    pd.testing.assert_frame_equal(a, b)

    a = customers_without_recent_orders(sf)
    b = customers_without_recent_orders(sf, distributed_threshold_bytes=0)
    pd.testing.assert_frame_equal(a, b)

    cols = ["event_id", "user_id", "constraint_name"]
    a = val_events_fk(sf).to_pandas()[cols].sort_values(cols).reset_index(drop=True)
    b = (
        val_events_fk(sf, distributed_threshold_bytes=0)
        .to_pandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
