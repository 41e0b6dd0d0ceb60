"""SequenceCheck (stage B3, per-key ordered-stream constraints): exact
seeded violations for all three kinds, null exemption, serde round-trip +
byte-stability when absent, spec_compat identity, lints, Dataset-source
refusal, warning demotion."""

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
    SequenceCheck,
    SpecError,
    TableConstraints,
)


def _corpus(tmp_path, df):
    d = str(tmp_path / "data")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), os.path.join(d, "p0.parquet"))
    return d


def _cols():
    return [
        ColumnSpec("event_id", pa.int64(), nullable=False),
        ColumnSpec("user_id", pa.int64()),
        ColumnSpec("ts", pa.int64()),
        ColumnSpec("val", pa.int64()),
    ]


def _spec(checks, **kw):
    return TableConstraints(
        "seq", columns=_cols(), sequence_checks=checks, key_columns=("event_id",), **kw
    )


def test_engine_exact_violations(tmp_path, ray_session):
    df = pd.DataFrame(
        {
            "event_id": np.arange(10, dtype=np.int64),
            "user_id": np.array([1, 1, 1, 1, 1, 2, 2, 2, 2, 2], dtype=np.int64),
            "ts": np.array([0, 10, 20, 1020, 1025, 0, 5, 6, 7, 2000], dtype=np.int64),
            "val": np.array([1, 2, 3, 3, 4, 5, 4, 6, 7, 8], dtype=np.int64),
        }
    )
    d = _corpus(tmp_path, df)
    spec = _spec(
        [
            SequenceCheck("ts_gap", ("user_id",), ("ts", "event_id"), "ts", "max_gap", max_gap=100),
            SequenceCheck("val_incr", ("user_id",), ("ts", "event_id"), "val", "strictly_increasing"),
            SequenceCheck("val_nondec", ("user_id",), ("ts", "event_id"), "val", "non_decreasing"),
        ]
    )
    res = ValidationEngine(spec, n_shards=1).run(d, out_dir=str(tmp_path / "out"), resume=False)
    v = res.violations()
    got = {
        name: sorted(v.loc[v["constraint_name"] == name, "key"].astype(int))
        for name in ("ts_gap", "val_incr", "val_nondec")
    }
    # gaps: event 3 (1020 after 20), event 9 (2000 after 7)
    assert got["ts_gap"] == [3, 9]
    # strictly increasing: event 3 (3 after 3), event 6 (4 after 5)
    assert got["val_incr"] == [3, 6]
    # non-decreasing: only the actual decrease, event 6
    assert got["val_nondec"] == [6]
    assert res.job_validity == "invalid"
    gap_reasons = sorted(v.loc[v["constraint_name"] == "ts_gap", "reason"])
    assert gap_reasons == ["gap 1000 exceeds max_gap 100", "gap 1993 exceeds max_gap 100"]


def test_null_values_are_order_exempt(tmp_path, ray_session):
    df = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "user_id": np.array([1, 1, 1, 1], dtype=np.int64),
            "ts": np.array([0, 1, 2, 3], dtype=np.int64),
            "val": pd.array([5, None, 4, 6], dtype="Int64"),
        }
    )
    d = _corpus(tmp_path, df)
    cols = _cols()
    cols[3] = ColumnSpec("val", pa.int64(), nullable=True)
    spec = TableConstraints(
        "seq",
        columns=cols,
        sequence_checks=[
            SequenceCheck("v", ("user_id",), ("ts", "event_id"), "val", "strictly_increasing")
        ],
        key_columns=("event_id",),
    )
    res = ValidationEngine(spec, n_shards=1).run(d, out_dir=str(tmp_path / "o2"), resume=False)
    v = res.violations()
    # pairs touching the null (events 1,2) are skipped; 4<5 never compares
    # because 5's successor pair was broken by the null — only 4->6 and
    # 5->(null) remain, both fine
    assert v.loc[v["constraint_name"] == "v"].empty


def test_serde_round_trip_and_byte_stability():
    from xmlschema_ray.constraints.serde import spec_from_json, spec_to_json

    spec = _spec(
        [SequenceCheck("g", ("user_id",), ("ts", "event_id"), "ts", "max_gap", max_gap=7)]
    ).compile()
    doc = spec_to_json(spec)
    back = spec_from_json(json.loads(json.dumps(doc)))
    assert spec_to_json(back) == doc
    assert back.sequence_checks[0] == spec.sequence_checks[0]
    # absent section leaves pre-existing documents byte-stable
    assert "sequence_checks" not in spec_to_json(_spec([]).compile())


def test_spec_compat_identity():
    from xmlschema_ray.constraints.derive import spec_compat

    a = _spec([SequenceCheck("g", ("user_id",), ("ts",), "ts", "max_gap", max_gap=100)]).compile()
    b = _spec([SequenceCheck("g", ("user_id",), ("ts",), "ts", "max_gap", max_gap=50)]).compile()
    findings = [f for f in spec_compat(a, b) if "sequence_check g" in f["item"]]
    assert findings and findings[0]["change"] == "definition changed"
    removed = [f for f in spec_compat(a, _spec([]).compile()) if "sequence_check" in f["item"]]
    assert removed and removed[0]["change"] == "removed" and removed[0]["compatible"]


def test_lints():
    with pytest.raises(SpecError, match="unknown kind"):
        _spec([SequenceCheck("x", ("user_id",), ("ts",), "val", "wiggly")]).compile()
    with pytest.raises(SpecError, match="max_gap"):
        _spec([SequenceCheck("x", ("user_id",), ("ts",), "val", "max_gap")]).compile()
    with pytest.raises(SpecError, match="max_gap"):
        _spec([SequenceCheck("x", ("user_id",), ("ts",), "val", "non_decreasing", max_gap=3)]).compile()
    with pytest.raises(SpecError, match="unknown column"):
        _spec([SequenceCheck("x", ("nope",), ("ts",), "val")]).compile()
    with pytest.raises(SpecError, match="empty order_by"):
        _spec([SequenceCheck("x", ("user_id",), (), "val")]).compile()


def test_dataset_source_refused(tmp_path, ray_session):
    spec = _spec([SequenceCheck("g", ("user_id",), ("ts",), "val")])
    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "event_id": np.array([1], dtype=np.int64),
                "user_id": np.array([1], dtype=np.int64),
                "ts": np.array([1], dtype=np.int64),
                "val": np.array([1], dtype=np.int64),
            }
        )
    )
    with pytest.raises(ValueError, match="sequence checks"):
        ValidationEngine(spec, n_shards=1).run(ds, out_dir=str(tmp_path / "o3"), resume=False)


def test_warning_demotion(tmp_path, ray_session):
    df = pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "user_id": np.array([1, 1, 1], dtype=np.int64),
            "ts": np.array([0, 1, 2], dtype=np.int64),
            "val": np.array([3, 2, 1], dtype=np.int64),
        }
    )
    d = _corpus(tmp_path, df)
    spec = _spec(
        [SequenceCheck("v", ("user_id",), ("ts", "event_id"), "val", "non_decreasing")],
        warning_constraints=("v",),
    )
    res = ValidationEngine(spec, n_shards=1).run(d, out_dir=str(tmp_path / "o4"), resume=False)
    assert res.n_warnings == 2 and res.n_violations == 0
    assert res.job_validity == "valid"


def test_no_overlap_exact_violations_running_max(tmp_path, ray_session):
    # e2 is the case an adjacent-pair compare would MISS: its adjacent
    # predecessor e1 ends at 20 (< 50), but the long early e0 [0,100)
    # still covers it — the running max must flag it. e3 touches e0's
    # end exactly (100 == 100): touching is legal.
    df = pd.DataFrame(
        {
            "event_id": np.arange(7, dtype=np.int64),
            "user_id": np.array([1, 1, 1, 1, 1, 2, 2], dtype=np.int64),
            "ts": np.array([0, 10, 50, 100, 105, 0, 10], dtype=np.int64),
            "val": np.array([100, 20, 60, 110, 106, 10, 20], dtype=np.int64),
        }
    )
    d = _corpus(tmp_path, df)
    spec = _spec(
        [
            SequenceCheck(
                "iv",
                ("user_id",),
                ("ts", "event_id"),
                "ts",
                "no_overlap",
                end_column="val",
            )
        ]
    )
    res = ValidationEngine(spec, n_shards=1).run(d, out_dir=str(tmp_path / "ov"), resume=False)
    v = res.violations()
    v = v[v["constraint_name"] == "iv"].sort_values("key")
    assert sorted(v["key"].astype(int)) == [1, 2, 4]
    assert list(v["reason"]) == [
        "start 10 overlaps earlier interval ending at 100",
        "start 50 overlaps earlier interval ending at 100",
        "start 105 overlaps earlier interval ending at 110",
    ]


def test_no_overlap_null_start_or_end_exempt(tmp_path, ray_session):
    # e0 has a null end: it is exempt AND contributes no coverage;
    # e2 has a null start: exempt; e3 overlaps e1's [5,50) and is the
    # only violation.
    df = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "user_id": np.array([1, 1, 1, 1], dtype=np.int64),
            "ts": pd.array([0, 5, None, 10], dtype="Int64"),
            "val": pd.array([None, 50, 60, 20], dtype="Int64"),
        }
    )
    d = _corpus(tmp_path, df)
    cols = _cols()
    cols[2] = ColumnSpec("ts", pa.int64(), nullable=True)
    cols[3] = ColumnSpec("val", pa.int64(), nullable=True)
    spec = TableConstraints(
        "seq",
        columns=cols,
        sequence_checks=[
            SequenceCheck(
                "iv",
                ("user_id",),
                ("ts", "event_id"),
                "ts",
                "no_overlap",
                end_column="val",
            )
        ],
        key_columns=("event_id",),
    )
    res = ValidationEngine(spec, n_shards=1).run(d, out_dir=str(tmp_path / "ov2"), resume=False)
    v = res.violations()
    assert sorted(v.loc[v["constraint_name"] == "iv", "key"].astype(int)) == [3]


def test_no_overlap_serde_and_compat():
    import json as _json

    from xmlschema_ray.constraints.derive import spec_compat
    from xmlschema_ray.constraints.serde import spec_from_json, spec_to_json

    mk = lambda end: _spec(
        [
            SequenceCheck(
                "iv", ("user_id",), ("ts", "event_id"), "ts", "no_overlap", end_column=end
            )
        ]
    ).compile()
    spec = mk("val")
    doc = spec_to_json(spec)
    assert doc["sequence_checks"][0]["end_column"] == "val"
    back = spec_from_json(_json.loads(_json.dumps(doc)))
    assert back.sequence_checks[0] == spec.sequence_checks[0]
    # non-interval kinds stay byte-stable (no end_column key)
    plain = spec_to_json(
        _spec([SequenceCheck("g", ("user_id",), ("ts",), "ts", "non_decreasing")]).compile()
    )
    assert "end_column" not in plain["sequence_checks"][0]
    # changing the end column is a definition change
    findings = [
        f for f in spec_compat(spec, mk("ts")) if "sequence_check iv" in f["item"]
    ]
    assert findings and findings[0]["change"] == "definition changed"


def test_no_overlap_lints():
    with pytest.raises(SpecError, match="end_column"):
        _spec([SequenceCheck("x", ("user_id",), ("ts",), "ts", "no_overlap")]).compile()
    with pytest.raises(SpecError, match="end_column"):
        _spec(
            [
                SequenceCheck(
                    "x", ("user_id",), ("ts",), "ts", "non_decreasing", end_column="val"
                )
            ]
        ).compile()
    with pytest.raises(SpecError, match="lead with the start column"):
        _spec(
            [
                SequenceCheck(
                    "x",
                    ("user_id",),
                    ("event_id", "ts"),
                    "ts",
                    "no_overlap",
                    end_column="val",
                )
            ]
        ).compile()
    with pytest.raises(SpecError, match="unknown column"):
        _spec(
            [
                SequenceCheck(
                    "x", ("user_id",), ("ts",), "ts", "no_overlap", end_column="nope"
                )
            ]
        ).compile()
