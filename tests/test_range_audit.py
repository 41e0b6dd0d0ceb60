"""Stats-pruned range audit (engine/audit.py): pruned ≡ full scan,
proven-clean files never opened, untrusted stats degrade to scanning,
inclusive/exclusive boundary proving, float refusal, null exemption."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xmlschema_ray.engine.audit import RangeRule, range_audit


def _corpus(tmp_path):
    """Four files with disjoint known x-ranges (clustered layout shape)
    plus a constant small column y in [1, 7] everywhere."""
    d = str(tmp_path / "data")
    os.makedirs(d, exist_ok=True)
    ranges = [(0, 99), (100, 199), (200, 299), (300, 399)]
    for i, (lo, hi) in enumerate(ranges):
        x = np.arange(lo, hi + 1, dtype=np.int64)
        df = pd.DataFrame(
            {
                "k": x * 10,
                "x": x,
                "y": (x % 7 + 1).astype(np.int64),
            }
        )
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            os.path.join(d, f"f{i}.parquet"),
        )
    return d


def test_pruned_equals_full_scan_and_prunes(tmp_path, ray_session):
    d = _corpus(tmp_path)
    viol, report = range_audit(
        d, [RangeRule("x", hi=250), RangeRule("y", lo=1, hi=7)], ["k"]
    )
    # files 0,1 proven clean (max 99/199 <= 250) AND y in [1,7] proven
    # everywhere; files 2 (max 299 > 250) and 3 are scanned
    assert report == {"n_files": 4, "n_pruned": 2, "n_scanned": 2}
    assert sorted(viol["k"]) == [v * 10 for v in range(251, 400)]
    assert set(viol["constraint_name"]) == {"x.range"}
    assert sorted(viol["value_int"]) == list(range(251, 400))


def test_inclusive_exclusive_boundary_proving(tmp_path, ray_session):
    d = _corpus(tmp_path)
    # hi=99 inclusive: file 0 (max exactly 99) is PROVEN clean
    _, r = range_audit(d, [RangeRule("x", hi=99)], ["k"])
    assert r == {"n_files": 4, "n_pruned": 1, "n_scanned": 3}
    # hi=99 exclusive: max == 99 no longer proves cleanliness, and row
    # x=99 is a real violation the scan must find
    v, r2 = range_audit(d, [RangeRule("x", hi=99, hi_inclusive=False)], ["k"])
    assert r2["n_pruned"] == 0
    assert 990 in set(v["k"]) and sorted(v["value_int"])[0] == 99


def test_missing_stats_degrade_to_scan(tmp_path, ray_session):
    d = _corpus(tmp_path)
    # rewrite file 0 without statistics: clean data, but unprovable
    t = pq.read_table(os.path.join(d, "f0.parquet"))
    pq.write_table(t, os.path.join(d, "f0.parquet"), write_statistics=False)
    viol, report = range_audit(d, [RangeRule("x", hi=399)], ["k"])
    assert report == {"n_files": 4, "n_pruned": 3, "n_scanned": 1}
    assert viol.empty  # scanned, found clean — never a false violation


def test_float_column_refused(tmp_path, ray_session):
    d = str(tmp_path / "f")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table({"k": pa.array([1, 2]), "x": pa.array([1.5, 2.5])}),
        os.path.join(d, "a.parquet"),
    )
    # footer pass refuses to prove float files clean -> scan raises loudly
    with pytest.raises(Exception, match="float"):
        range_audit(d, [RangeRule("x", hi=10)], ["k"])


def test_timestamp_rule_and_null_exemption(tmp_path, ray_session):
    d = str(tmp_path / "ts")
    os.makedirs(d, exist_ok=True)
    ts = pd.to_datetime([0, 100, 200, None], unit="s").values.astype("datetime64[us]")
    pq.write_table(
        pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()), "t": pa.array(ts)}),
        os.path.join(d, "a.parquet"),
    )
    cutoff = pd.Timestamp("1970-01-01 00:02:30")
    viol, report = range_audit(d, [RangeRule("t", hi=cutoff)], ["k"])
    # null t row is exempt; only t=200s violates
    assert report["n_scanned"] == 1
    assert list(viol["k"]) == [3]
    assert list(viol["value_int"]) == [200_000_000]


def test_empty_rules_and_missing_files():
    with pytest.raises(ValueError, match="at least one rule"):
        range_audit("/tmp", [], ["k"])
    with pytest.raises(ValueError, match="no parquet files"):
        range_audit("/tmp/definitely_not_a_dir_xyz", [RangeRule("x")], ["k"])


def test_audit_schema_generation_missing_column(tmp_path, ray_session):
    """A suspect file LACKING the audited column must not crash (or
    null-fill) the scan: column-absent ⇒ all null ⇒ range-exempt, proven
    clean from the schema alone; the other generation still scans."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xmlschema_ray.engine.audit import RangeRule, range_audit

    d = str(tmp_path / "c")
    import os

    os.makedirs(d)
    # file sorting adversarially puts the columnless file FIRST
    pq.write_table(pa.table({"id": pa.array([1, 2], pa.int64())}), d + "/a.parquet")
    pq.write_table(
        pa.table({"id": pa.array([3, 4], pa.int64()), "v": pa.array([5, 99], pa.int64())}),
        d + "/b.parquet",
    )
    viol, report = range_audit(d, [RangeRule("v", lo=0, hi=10)], ["id"])
    assert viol["id"].tolist() == [4] and viol["value_int"].tolist() == [99]
    # the columnless file is PRUNED by schema proof, never scanned
    assert report["n_pruned"] == 1 and report["n_scanned"] == 1


def test_audit_refuses_missing_key_column(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pt

    from xmlschema_ray.engine.audit import RangeRule, range_audit

    d = str(tmp_path / "c")
    import os

    os.makedirs(d)
    pq.write_table(pa.table({"v": pa.array([99], pa.int64())}), d + "/a.parquet")
    with _pt.raises(ValueError, match="key column"):
        range_audit(d, [RangeRule("v", lo=0, hi=10)], ["id"])
