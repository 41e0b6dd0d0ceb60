"""ReconcileCheck (stage B4, per-key header/detail reconciliation): exact
seeded violations for all three kinds (sum + count, boundary tolerance,
scale), flags off, serde round-trip + byte-stability when absent,
spec_compat identity, lints, Dataset-source and missing-dim refusal,
warning demotion."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from xmlschema_ray import ValidationEngine
from xmlschema_ray.constraints.spec import (
    ColumnSpec,
    ReconcileCheck,
    SpecError,
    TableConstraints,
)


def _corpus(tmp_path, df, name="data"):
    d = str(tmp_path / name)
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), os.path.join(d, "p0.parquet"))
    return d


def _cols():
    return [
        ColumnSpec("k", pa.int64(), nullable=False),
        ColumnSpec("amount", pa.float64()),
    ]


def _spec(checks, **kw):
    return TableConstraints(
        "recon", columns=_cols(), reconcile_checks=checks, key_columns=("k",), **kw
    )


def _detail():
    # key 1: two rows summing 30.00; key 2: one row 5.00; key 9: orphan
    return pd.DataFrame(
        {
            "k": np.array([1, 1, 2, 9, 9], dtype=np.int64),
            "amount": np.array([10.0, 20.0, 5.0, 1.0, 2.0], dtype=np.float64),
        }
    )


def _header():
    # key 1 expects 30.00 (clean), key 2 expects 5.02 (mismatch by 2
    # cents), key 3 has no details (missing)
    return pa.table(
        {
            "hk": pa.array([1, 2, 3], type=pa.int64()),
            "total": pa.array([30.0, 5.02, 7.0], type=pa.float64()),
        }
    )


def _run(tmp_path, checks, detail=None, header=None, out="o", **kw):
    d = _corpus(tmp_path, detail if detail is not None else _detail(), name=out + "_d")
    eng = ValidationEngine(_spec(checks, **kw), batch_size=2, n_shards=1)
    return eng.run(
        d,
        out_dir=str(tmp_path / out),
        dims={"hdr": header if header is not None else _header()},
        resume=False,
    )


def _sum_check(**kw):
    defaults = dict(
        key="k",
        agg="sum",
        column="amount",
        scale=100,
        dim_name="hdr",
        dim_key="hk",
        expected="total",
    )
    defaults.update(kw)
    return ReconcileCheck("bal", **defaults)


def test_engine_exact_violations_sum(tmp_path, ray_session):
    res = _run(tmp_path, [_sum_check()])
    v = res.violations()
    v = v[v["constraint_name"].str.startswith("bal.")].sort_values("key")
    got = list(zip(v["key"], v["constraint_name"], v["reason"]))
    assert got == [
        ("2", "bal.mismatch", "observed sum 500 != expected 502"),
        ("3", "bal.missing_details", "header expects 700, observed no detail rows"),
        ("9", "bal.orphan_details", "2 detail rows for key absent from header 'hdr'"),
    ]
    assert (v["partition_id"] == -1).all()


def test_tolerance_boundary_and_count_agg(tmp_path, ray_session):
    # tolerance 2 scaled units: |500-502| == 2 -> NOT a violation; 1 -> is
    res = _run(tmp_path, [_sum_check(tolerance=2)], out="t2")
    v = res.violations()
    assert not (v["constraint_name"] == "bal.mismatch").any()
    res = _run(tmp_path, [_sum_check(tolerance=1)], out="t1")
    v = res.violations()
    assert (v["constraint_name"] == "bal.mismatch").sum() == 1
    # count agg: header expects 2 rows for key 1, 2 for key 2 (actual 1)
    hdr = pa.table(
        {
            "hk": pa.array([1, 2], type=pa.int64()),
            "total": pa.array([2.0, 2.0], type=pa.float64()),
        }
    )
    res = _run(
        tmp_path,
        [ReconcileCheck("cnt", key="k", agg="count", dim_name="hdr", dim_key="hk", expected="total")],
        header=hdr,
        out="cnt",
    )
    v = res.violations()
    v = v[v["constraint_name"] == "cnt.mismatch"]
    assert list(v["key"]) == ["2"] and list(v["reason"]) == ["observed count 1 != expected 2"]


def test_flags_off_suppress_kinds(tmp_path, ray_session):
    res = _run(
        tmp_path,
        [_sum_check(check_missing_details=False, check_orphan_details=False)],
        out="fl",
    )
    names = set(res.violations()["constraint_name"])
    assert "bal.missing_details" not in names and "bal.orphan_details" not in names
    assert "bal.mismatch" in names


def test_serde_round_trip_and_byte_stability():
    from xmlschema_ray.constraints.serde import spec_from_json, spec_to_json

    spec = _spec([_sum_check(tolerance=3)]).compile()
    doc = spec_to_json(spec)
    back = spec_from_json(json.loads(json.dumps(doc)))
    assert spec_to_json(back) == doc
    assert back.reconcile_checks[0] == spec.reconcile_checks[0]
    assert "reconcile_checks" not in spec_to_json(_spec([]).compile())


def test_spec_compat_identity():
    from xmlschema_ray.constraints.derive import spec_compat

    a = _spec([_sum_check(tolerance=0)]).compile()
    b = _spec([_sum_check(tolerance=5)]).compile()
    findings = [f for f in spec_compat(a, b) if "reconcile_check bal" in f["item"]]
    assert findings and findings[0]["change"] == "definition changed"
    removed = [f for f in spec_compat(a, _spec([]).compile()) if "reconcile_check" in f["item"]]
    assert removed and removed[0]["change"] == "removed" and removed[0]["compatible"]


def test_lints():
    with pytest.raises(SpecError, match="unknown agg"):
        _spec([_sum_check(agg="avg")]).compile()
    with pytest.raises(SpecError, match="column must be set exactly"):
        _spec([_sum_check(column=None)]).compile()
    with pytest.raises(SpecError, match="column must be set exactly"):
        _spec(
            [ReconcileCheck("c", key="k", agg="count", column="amount", dim_name="h", dim_key="k", expected="e")]
        ).compile()
    with pytest.raises(SpecError, match="unknown key column"):
        _spec([_sum_check(key="nope")]).compile()
    with pytest.raises(SpecError, match="scale"):
        _spec([_sum_check(scale=0)]).compile()
    with pytest.raises(SpecError, match="tolerance"):
        _spec([_sum_check(tolerance=-1)]).compile()


def test_dataset_source_and_missing_dim_refused(tmp_path, ray_session):
    spec = _spec([_sum_check()])
    ds = rd.from_pandas(_detail())
    with pytest.raises(ValueError, match="reconcile checks"):
        ValidationEngine(spec, n_shards=1).run(ds, out_dir=str(tmp_path / "r1"), resume=False)
    d = _corpus(tmp_path, _detail(), name="r2d")
    with pytest.raises(ValueError, match="not provided in dims"):
        ValidationEngine(spec, n_shards=1).run(d, out_dir=str(tmp_path / "r2"), resume=False)


def test_warning_demotion_per_kind(tmp_path, ray_session):
    res = _run(
        tmp_path,
        [_sum_check()],
        out="w",
        warning_constraints=("bal.mismatch", "bal.orphan_details"),
    )
    # mismatch + orphan demoted; missing_details still an error
    assert res.n_warnings == 2
    v = res.violations()
    errs = v[v["constraint_name"].str.startswith("bal.")]
    assert res.job_validity == "invalid"
    assert (errs["constraint_name"] == "bal.missing_details").any()
