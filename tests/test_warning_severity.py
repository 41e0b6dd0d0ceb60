"""Per-constraint warning severity (spec.warning_constraints) — the
per-constraint refinement of the reference's lax validation mode
(``validators/xsdbase.py:24``: lax reports errors but tolerates them).

Warnings are recorded and counted (verdicts carry ``n_warnings``) but never
flip partition validity, never abort a failfast run, and keep exact counts
under the violation-materialization cap.
"""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xmlschema_ray.constraints.facets import MaxInclusive, MinInclusive, SpecError
from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints
from xmlschema_ray.engine.engine import ValidationEngine

WARN_NAME = "val.maxInclusive(100)"
ERR_NAME = "val.minInclusive(0)"


def _spec(warn=(WARN_NAME,)):
    return TableConstraints(
        name="t",
        columns=[
            ColumnSpec("doc_id", pa.int64(), nullable=False),
            ColumnSpec("val", pa.int64(), facets=(MinInclusive(0), MaxInclusive(100))),
        ],
        key_columns=("doc_id",),
        warning_constraints=tuple(warn),
    )


def _corpus(tmp_path, n_warn=7, n_err=3, n_ok=40):
    """n_warn rows with val>100 (warning), n_err rows with val<0 (error)."""
    vals = [50] * n_ok + [200 + i for i in range(n_warn)] + [-1 - i for i in range(n_err)]
    df = pd.DataFrame({"doc_id": range(len(vals)), "val": vals})
    path = str(tmp_path / "corpus")
    os.makedirs(path, exist_ok=True)
    # two files so the run has >1 partition candidate
    pq.write_table(pa.Table.from_pandas(df.iloc[: len(df) // 2]), os.path.join(path, "a.parquet"))
    pq.write_table(pa.Table.from_pandas(df.iloc[len(df) // 2 :]), os.path.join(path, "b.parquet"))
    return path


def test_mixed_severity_split(tmp_path, ray_session):
    src = _corpus(tmp_path, n_warn=7, n_err=3)
    res = ValidationEngine(_spec(), batch_size=16, n_shards=2).run(
        src, out_dir=str(tmp_path / "o")
    )
    assert res.n_violations == 3  # errors only
    assert res.n_warnings == 7
    assert res.summary["n_violations"] == 3 and res.summary["n_warnings"] == 7
    assert res.job_validity == "invalid"  # errors still flip
    # both severities are materialized in the canonical violations output
    viol = res.violations()
    assert (viol["constraint_name"] == WARN_NAME).sum() == 7
    assert (viol["constraint_name"] == ERR_NAME).sum() == 3
    assert int(res.verdicts["n_warnings"].sum()) == 7


def test_warnings_only_job_stays_valid(tmp_path, ray_session):
    src = _corpus(tmp_path, n_warn=5, n_err=0)
    res = ValidationEngine(_spec(), batch_size=16, n_shards=1).run(
        src, out_dir=str(tmp_path / "o")
    )
    assert res.n_violations == 0 and res.n_warnings == 5
    assert res.job_validity == "valid"
    assert (res.verdicts["validity"] == "valid").all()
    # promote back to error: same corpus now invalid
    res2 = ValidationEngine(_spec(warn=()), batch_size=16, n_shards=1).run(
        src, out_dir=str(tmp_path / "o2")
    )
    assert res2.n_violations == 5 and res2.job_validity == "invalid"


def test_failfast_tolerates_warnings(tmp_path, ray_session):
    src = _corpus(tmp_path, n_warn=5, n_err=0)
    res = ValidationEngine(_spec(), batch_size=16, n_shards=1).run(
        src, out_dir=str(tmp_path / "o"), mode="failfast"
    )
    assert res.n_warnings == 5 and res.job_validity == "valid"
    # an error-severity violation still aborts
    src2 = _corpus(tmp_path / "e", n_warn=0, n_err=2)
    with pytest.raises(Exception, match="violated"):
        ValidationEngine(_spec(), batch_size=16, n_shards=1).run(
            src2, out_dir=str(tmp_path / "oe"), mode="failfast"
        )


def test_cap_keeps_exact_severity_split(tmp_path, ray_session):
    """Overflow count records carry the constraint name, so capped runs
    keep the error/warning split exact, not just the total."""
    src = _corpus(tmp_path, n_warn=30, n_err=10, n_ok=20)
    res = ValidationEngine(
        _spec(), batch_size=16, n_shards=1, max_violations_per_batch=1
    ).run(src, out_dir=str(tmp_path / "o"))
    assert res.n_violations == 10
    assert res.n_warnings == 30
    assert len(res.violations()) < 40  # tail truncated


def test_serde_roundtrip_and_unknown_name_rejected():
    from xmlschema_ray.constraints.serde import spec_from_json, spec_to_json

    doc = spec_to_json(_spec())
    assert doc["warning_constraints"] == [WARN_NAME]
    spec2 = spec_from_json(doc)
    assert spec2.warning_constraints == (WARN_NAME,)
    with pytest.raises(SpecError, match="warning_constraints"):
        _spec(warn=("val.maxInclusive(999)",)).compile()
    # schema-level constraint families are demotable without declaration
    _spec(warn=("schema.unexpected_column",)).compile()


def test_spec_compat_reports_severity_changes():
    from xmlschema_ray.constraints.derive import spec_compat

    err_spec, warn_spec = _spec(warn=()).compile(), _spec().compile()
    demote = {f["item"]: f for f in spec_compat(err_spec, warn_spec)}
    f = demote[f"constraint {WARN_NAME}"]
    assert f["change"] == "error -> warning" and f["compatible"]
    promote = {f["item"]: f for f in spec_compat(warn_spec, err_spec)}
    f = promote[f"constraint {WARN_NAME}"]
    assert f["change"] == "warning -> error" and not f["compatible"]
