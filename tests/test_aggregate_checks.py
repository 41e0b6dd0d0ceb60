"""Dataset-level AggregateCheck: lint, serde round-trip, every agg kind
through the engine, global (ungrouped) scope, verdict impact, and the
spec_compat audit. The grouped-mean path is additionally DuckDB-gated via
the val_source_mean_chars oracle."""

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xmlschema_ray.constraints.serde import load_spec, save_spec, spec_from_json, spec_to_json
from xmlschema_ray.constraints.spec import (
    AggregateCheck,
    ColumnSpec,
    SpecError,
    TableConstraints,
)
from xmlschema_ray.engine.engine import ValidationEngine


def _spec(checks):
    return TableConstraints(
        name="t",
        columns=[
            ColumnSpec("id", pa.int64(), nullable=False),
            ColumnSpec("grp", pa.string()),
            ColumnSpec("x", pa.int64()),
        ],
        aggregate_checks=checks,
        key_columns=("id",),
    )


def _run(tmp_path, df, checks):
    p = tmp_path / "in.parquet"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
    eng = ValidationEngine(_spec(checks), batch_size=3, n_shards=1)
    return eng.run(str(p), out_dir=str(tmp_path / "out"), resume=False)


def test_lint_errors():
    with pytest.raises(SpecError, match="unknown agg"):
        _spec([AggregateCheck("a", agg="median", column="x", min_value=0)]).compile()
    with pytest.raises(SpecError, match="requires a column"):
        _spec([AggregateCheck("a", agg="mean", min_value=0)]).compile()
    with pytest.raises(SpecError, match="unknown column"):
        _spec([AggregateCheck("a", agg="mean", column="nope", min_value=0)]).compile()
    with pytest.raises(SpecError, match="group_by references unknown"):
        _spec(
            [AggregateCheck("a", agg="count", group_by="nope", min_value=0)]
        ).compile()
    with pytest.raises(SpecError, match="no bounds"):
        _spec([AggregateCheck("a", agg="count")]).compile()
    # duplicate constraint names are rejected across families
    with pytest.raises(SpecError, match="duplicate constraint name"):
        _spec(
            [
                AggregateCheck("dup", agg="count", min_value=0),
                AggregateCheck("dup", agg="count", max_value=9),
            ]
        ).compile()


def test_serde_round_trip(tmp_path):
    spec = _spec(
        [
            AggregateCheck(
                "q", agg="null_fraction", column="x", group_by="grp", max_value=0.5
            )
        ]
    ).compile()
    p = tmp_path / "spec.json"
    save_spec(spec, str(p))
    loaded = load_spec(str(p))
    assert loaded.aggregate_checks == spec.aggregate_checks
    # byte-stable re-serialization
    assert spec_to_json(loaded) == spec_to_json(spec)


def test_grouped_count_and_sum(tmp_path, ray_session):
    df = pd.DataFrame(
        {
            "id": range(10),
            "grp": ["a"] * 7 + ["b"] * 3,
            "x": [10] * 7 + [1] * 3,
        }
    )
    res = _run(
        tmp_path,
        df,
        [
            AggregateCheck("quota", agg="count", group_by="grp", max_value=5),
            AggregateCheck("mass", agg="sum", column="x", group_by="grp", min_value=5),
        ],
    )
    v = res.violations()
    got = {(r.constraint_name, r.key) for r in v.itertuples()}
    # 'a' has 7 rows (> 5); 'b' sums to 3 (< 5)
    assert ("quota", "a") in got and ("quota", "b") not in got
    assert ("mass", "b") in got and ("mass", "a") not in got
    assert res.job_validity == "invalid"


def test_global_mean_and_null_fraction(tmp_path, ray_session):
    df = pd.DataFrame(
        {
            "id": range(8),
            "grp": ["a"] * 8,
            "x": pd.array([1, 1, 1, 1, None, None, None, None], dtype="Int64"),
        }
    )
    res = _run(
        tmp_path,
        df,
        [
            AggregateCheck("nulls", agg="null_fraction", column="x", max_value=0.25),
            AggregateCheck("mu", agg="mean", column="x", min_value=0.5, max_value=2.0),
        ],
    )
    v = res.violations()
    names = set(v["constraint_name"])
    assert "nulls" in names  # 50% nulls > 25%
    assert "mu" not in names  # mean over non-null = 1.0, in bounds
    # global checks are table-scoped: empty key, partition -1
    row = v[v["constraint_name"] == "nulls"].iloc[0]
    assert row["key"] == "" and row["partition_id"] == -1


def test_all_null_group_passes_mean(tmp_path, ray_session):
    df = pd.DataFrame(
        {
            "id": [0, 1],
            "grp": ["a", "a"],
            "x": pd.array([None, None], dtype="Int64"),
        }
    )
    res = _run(
        tmp_path,
        df,
        [AggregateCheck("mu", agg="mean", column="x", group_by="grp", min_value=5)],
    )
    # no non-null evidence -> NaN -> no violation (SQL aggregate semantics)
    assert "mu" not in set(res.violations()["constraint_name"])


def test_spec_compat_flags_aggregate_changes():
    from xmlschema_ray.constraints.derive import spec_compat

    old = _spec([AggregateCheck("q", agg="count", group_by="grp", max_value=5)]).compile()
    new = _spec([AggregateCheck("q", agg="count", group_by="grp", max_value=3)]).compile()
    findings = spec_compat(old, new)
    assert any(
        f["item"] == "aggregate_check q" and f["change"] == "definition changed"
        for f in findings
    )
    gone = _spec([]).compile()
    findings2 = spec_compat(old, gone)
    assert any(
        f["item"] == "aggregate_check q" and f["change"] == "removed"
        for f in findings2
    )
