"""ManifestCheck — cross-table aggregate reconciliation against an
expected-values manifest dim: lint, serde round-trip, every violation
kind through the engine (count/sum mismatch, missing group, unexpected
group), tolerances, warning demotion of one kind, and the spec_compat
audit. The end-to-end path is additionally DuckDB-gated via the
val_manifest_reconcile oracle."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xmlschema_ray.constraints.serde import load_spec, save_spec, spec_to_json
from xmlschema_ray.constraints.spec import (
    ColumnSpec,
    ManifestCheck,
    SpecError,
    TableConstraints,
)
from xmlschema_ray.engine.engine import ValidationEngine


def _spec(checks, warning_constraints=(), float_x=False):
    return TableConstraints(
        name="t",
        columns=[
            ColumnSpec("id", pa.int64(), nullable=False),
            ColumnSpec("grp", pa.string()),
            ColumnSpec("x", pa.float64() if float_x else pa.int64()),
        ],
        manifest_checks=checks,
        key_columns=("id",),
        warning_constraints=warning_constraints,
    )


MC = dict(group_by="grp", dim_name="man", dim_key="grp")


def _run(tmp_path, df, checks, manifest, warning_constraints=()):
    p = tmp_path / "in.parquet"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
    eng = ValidationEngine(
        _spec(checks, warning_constraints=warning_constraints), batch_size=3, n_shards=1
    )
    return eng.run(
        str(p),
        out_dir=str(tmp_path / "out"),
        dims={"man": pa.Table.from_pandas(manifest, preserve_index=False)},
        resume=False,
    )


def test_lint_errors():
    with pytest.raises(SpecError, match="group_by references unknown"):
        _spec([ManifestCheck("m", group_by="nope", dim_name="d", dim_key="k", expected_count="n")]).compile()
    with pytest.raises(SpecError, match="nothing to reconcile"):
        _spec([ManifestCheck("m", **MC)]).compile()
    with pytest.raises(SpecError, match="declared together"):
        _spec([ManifestCheck("m", column="x", **MC)]).compile()
    with pytest.raises(SpecError, match="unknown column"):
        _spec([ManifestCheck("m", column="nope", expected_sum="s", **MC)]).compile()
    with pytest.raises(SpecError, match="float column"):
        _spec(
            [ManifestCheck("m", column="x", expected_sum="s", **MC)], float_x=True
        ).compile()
    # float column OK with a tolerance
    _spec(
        [ManifestCheck("m", column="x", expected_sum="s", sum_tolerance=0.5, **MC)],
        float_x=True,
    ).compile()
    with pytest.raises(SpecError, match="negative tolerance"):
        _spec(
            [ManifestCheck("m", expected_count="n", count_tolerance=-1, **MC)]
        ).compile()


def test_serde_round_trip_and_byte_stability(tmp_path):
    spec = _spec(
        [
            ManifestCheck(
                "m",
                expected_count="n",
                column="x",
                expected_sum="s",
                count_tolerance=2,
                check_unexpected=False,
                **MC,
            )
        ]
    ).compile()
    p = tmp_path / "spec.json"
    save_spec(spec, str(p))
    loaded = load_spec(str(p))
    assert loaded.manifest_checks == spec.manifest_checks
    assert spec_to_json(loaded) == spec_to_json(spec)
    # a spec WITHOUT manifest checks emits no section (pre-existing
    # documents stay byte-stable)
    assert "manifest_checks" not in spec_to_json(_spec([]).compile())


def test_all_violation_kinds(tmp_path, ray_session):
    df = pd.DataFrame(
        {
            "id": range(10),
            "grp": ["a"] * 4 + ["b"] * 3 + ["c"] * 3,
            "x": [10] * 4 + [5] * 3 + [1] * 3,
        }
    )
    # a: count off by one; b: sum off by 2; c: not in manifest; d: phantom
    manifest = pd.DataFrame(
        {
            "grp": ["a", "b", "d"],
            "n": [5, 3, 2],
            "s": [40, 17, 0],
        }
    )
    res = _run(
        tmp_path,
        df,
        [ManifestCheck("m", expected_count="n", column="x", expected_sum="s", **MC)],
        manifest,
    )
    v = res.violations()
    got = {(r.constraint_name, r.key) for r in v.itertuples()}
    assert ("m.count_mismatch", "a") in got
    assert ("m.sum_mismatch", "b") in got
    assert ("m.unexpected_group", "c") in got
    assert ("m.missing_group", "d") in got
    # exactly these four — a's sum (40) and b's count (3) reconcile
    assert len([g for g in got if g[0].startswith("m.")]) == 4
    assert res.job_validity == "invalid"
    row = v[v["constraint_name"] == "m.count_mismatch"].iloc[0]
    assert row["partition_id"] == -1 and row["reason"] == "count 4 != expected 5"


def test_tolerances_and_flags(tmp_path, ray_session):
    df = pd.DataFrame({"id": range(4), "grp": ["a"] * 4, "x": [1, 2, 3, 4]})
    manifest = pd.DataFrame({"grp": ["a", "ghost"], "n": [5, 1], "s": [12, 0]})
    checks = [
        ManifestCheck(
            "m",
            expected_count="n",
            column="x",
            expected_sum="s",
            count_tolerance=1,
            sum_tolerance=2.0,
            check_missing=False,
            **MC,
        )
    ]
    res = _run(tmp_path, df, checks, manifest)
    # count 4 vs 5 within tolerance 1; sum 10 vs 12 within tolerance 2;
    # ghost suppressed by check_missing=False
    assert not any(
        c.startswith("m.") for c in res.violations()["constraint_name"]
    )
    assert res.job_validity == "valid"


def test_warning_demotion(tmp_path, ray_session):
    df = pd.DataFrame({"id": range(3), "grp": ["a"] * 3, "x": [1, 1, 1]})
    manifest = pd.DataFrame({"grp": ["a"], "n": [4]})
    res = _run(
        tmp_path,
        df,
        [ManifestCheck("m", expected_count="n", **MC)],
        manifest,
        warning_constraints=("m.count_mismatch",),
    )
    assert res.n_warnings == 1
    assert res.job_validity == "valid"


def test_missing_dim_raises(tmp_path, ray_session):
    df = pd.DataFrame({"id": [0], "grp": ["a"], "x": [1]})
    p = tmp_path / "in.parquet"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
    eng = ValidationEngine(
        _spec([ManifestCheck("m", expected_count="n", **MC)]), n_shards=1
    )
    with pytest.raises(ValueError, match="dim table 'man' not provided"):
        eng.run(str(p), out_dir=str(tmp_path / "out"), resume=False)


def test_dup_manifest_key_raises(tmp_path, ray_session):
    df = pd.DataFrame({"id": [0], "grp": ["a"], "x": [1]})
    p = tmp_path / "in.parquet"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
    eng = ValidationEngine(
        _spec([ManifestCheck("m", expected_count="n", **MC)]), n_shards=1
    )
    manifest = pa.table({"grp": ["a", "a"], "n": [1, 2]})
    with pytest.raises(ValueError, match="unique and non-null"):
        eng.run(
            str(p), out_dir=str(tmp_path / "out"), dims={"man": manifest}, resume=False
        )


def test_integer_group_labels_reconcile(tmp_path, ray_session):
    # stats-channel group keys stringify; integer manifest keys must too
    df = pd.DataFrame({"id": range(4), "grp": [1, 1, 2, 2], "x": [1] * 4})
    df["grp"] = df["grp"].astype("int64")
    p = tmp_path / "in.parquet"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
    spec = TableConstraints(
        name="t",
        columns=[
            ColumnSpec("id", pa.int64(), nullable=False),
            ColumnSpec("grp", pa.int64()),
        ],
        manifest_checks=[
            ManifestCheck("m", group_by="grp", dim_name="man", dim_key="grp", expected_count="n")
        ],
        key_columns=("id",),
    )
    eng = ValidationEngine(spec, batch_size=2, n_shards=1)
    res = eng.run(
        str(p),
        out_dir=str(tmp_path / "out"),
        dims={"man": pa.table({"grp": pa.array([1, 2], pa.int64()), "n": [2, 3]})},
        resume=False,
    )
    got = {(r.constraint_name, r.key) for r in res.violations().itertuples()}
    assert ("m.count_mismatch", "2") in got
    assert ("m.count_mismatch", "1") not in got


def test_stale_resume_refused(tmp_path, ray_session):
    # adding a manifest check to the spec and resuming over an out_dir whose
    # stats predate it must RAISE (the blobs carry no partials for the new
    # check), never fabricate missing_group violations for every manifest row
    df = pd.DataFrame({"id": range(4), "grp": ["a"] * 4, "x": [1] * 4})
    p = tmp_path / "in.parquet"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
    out = str(tmp_path / "out")
    ValidationEngine(_spec([]), n_shards=1).run(str(p), out_dir=out, resume=False)
    eng = ValidationEngine(_spec([ManifestCheck("m", expected_count="n", **MC)]), n_shards=1)
    manifest = pa.table({"grp": ["a"], "n": [4]})
    with pytest.raises(ValueError, match="spec changed under resume"):
        eng.run(str(p), out_dir=out, dims={"man": manifest}, resume=True)
    # a fresh run over the same inputs reconciles clean
    res = eng.run(str(p), out_dir=out, dims={"man": manifest}, resume=False)
    assert not any(
        c.startswith("m.") for c in res.violations()["constraint_name"]
    )


def test_spec_compat_flags_manifest_changes():
    from xmlschema_ray.constraints.derive import spec_compat

    old = _spec([ManifestCheck("m", expected_count="n", **MC)]).compile()
    new = _spec(
        [ManifestCheck("m", expected_count="n", count_tolerance=3, **MC)]
    ).compile()
    findings = spec_compat(old, new)
    assert any(
        f["item"] == "manifest_check m" and f["change"] == "definition changed"
        for f in findings
    )
    findings2 = spec_compat(old, _spec([]).compile())
    assert any(
        f["item"] == "manifest_check m" and f["change"] == "removed" for f in findings2
    )
