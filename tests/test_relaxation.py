"""suggest_relaxations / apply_relaxations: the violations→amendment loop —
widen-to-valid invariant, pure-relaxation compat certificate, drop path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from xmlschema_ray import ValidationEngine, apply_relaxations, suggest_relaxations
from xmlschema_ray.constraints import facets as F
from xmlschema_ray.constraints.derive import spec_compat
from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints


def _spec():
    return TableConstraints(
        name="t",
        columns=[
            ColumnSpec("id", pa.int64()),
            ColumnSpec("x", pa.float64(), facets=(F.MaxInclusive(10.0), F.MinExclusive(0.0))),
            ColumnSpec(
                "s",
                pa.string(),
                nullable=False,
                facets=(F.MaxLength(3), F.Enumeration(("a", "b"))),
            ),
        ],
        key_columns=("id",),
    ).compile()


def _data():
    return pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "x": pa.array([0.0, 5.0, 42.5]),
            "s": pa.array(["abcd", "b", None]),
        }
    )


def test_relax_then_validate_clean(ray_session, tmp_path):
    import pyarrow.parquet as pq

    spec = _spec()
    d = str(tmp_path / "facts")
    import os

    os.makedirs(d)
    pq.write_table(_data(), d + "/part0.parquet")

    # red under the tight spec
    res = ValidationEngine(spec, n_shards=1).run(
        d, out_dir=str(tmp_path / "o1"), dims={}, resume=False
    )
    assert res.job_validity == "invalid"

    sg = suggest_relaxations(spec, rd.from_arrow(_data()))
    assert {(g["column"], g["action"]) for g in sg} >= {
        ("x", "widen"),
        ("s", "widen"),
        ("s", "nullable"),
    }
    relaxed = apply_relaxations(spec, sg)

    # pure relaxation: zero breaking findings, by construction
    assert all(f["compatible"] for f in spec_compat(spec, relaxed))

    # green under the amended spec
    res2 = ValidationEngine(relaxed, n_shards=1).run(
        d, out_dir=str(tmp_path / "o2"), dims={}, resume=False
    )
    assert res2.job_validity == "valid", res2.violations()


def test_enum_overflow_drops(ray_session):
    spec = TableConstraints(
        name="t",
        columns=[
            ColumnSpec("id", pa.int64()),
            ColumnSpec("s", pa.string(), facets=(F.Enumeration(("a",)),)),
        ],
        key_columns=("id",),
    ).compile()
    n = 100
    ds = rd.from_arrow(
        pa.table(
            {
                "id": pa.array(range(n), pa.int64()),
                "s": pa.array([f"v{i}" for i in range(n)]),
            }
        )
    )
    sg = suggest_relaxations(spec, ds, enum_cap=16)
    (g,) = [g for g in sg if g["column"] == "s"]
    assert g["action"] == "drop" and g["suggested"] is None
    relaxed = apply_relaxations(spec, sg)
    assert relaxed.column("s").facets == ()


def test_no_violations_no_suggestions(ray_session):
    spec = _spec()
    clean = pa.table(
        {
            "id": pa.array([1], pa.int64()),
            "x": pa.array([5.0]),
            "s": pa.array(["a"]),
        }
    )
    assert suggest_relaxations(spec, rd.from_arrow(clean)) == []


def test_large_satisfied_enum_not_suggested(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from xmlschema_ray import suggest_relaxations
    from xmlschema_ray.constraints import facets as F
    from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints

    vals = tuple(f"v{i}" for i in range(100))
    spec = TableConstraints(
        name="t",
        columns=[
            ColumnSpec("id", pa.int64()),
            ColumnSpec("s", pa.string(), facets=(F.Enumeration(vals),)),
        ],
        key_columns=("id",),
    ).compile()
    ds = rd.from_arrow(
        pa.table({"id": pa.array(range(100), pa.int64()), "s": pa.array(list(vals))})
    )
    # 100 observed distinct values, all DECLARED: overflow must not fire
    # and no amendment may be suggested (enum_cap far below cardinality)
    assert suggest_relaxations(spec, ds, enum_cap=16) == []


def test_timestamp_relaxation_json_round_trips(ray_session):
    import json

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from xmlschema_ray import apply_relaxations, suggest_relaxations
    from xmlschema_ray.constraints import facets as F
    from xmlschema_ray.constraints.serde import spec_from_json, spec_to_json
    from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints

    spec = TableConstraints(
        name="t",
        columns=[
            ColumnSpec("id", pa.int64()),
            ColumnSpec(
                "ts",
                pa.timestamp("us"),
                facets=(F.MaxInclusive(np.datetime64("2024-01-01", "us")),),
            ),
        ],
        key_columns=("id",),
    ).compile()
    ds = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1], pa.int64()),
                "ts": pa.array([np.datetime64("2025-06-01", "us")], pa.timestamp("us")),
            }
        )
    )
    relaxed = apply_relaxations(spec, suggest_relaxations(spec, ds))
    # the watermark-facet shape: the widened datetime bound must survive
    # json.dumps (cmd_relax prints it) and reload to the same instant
    doc = json.loads(json.dumps(spec_to_json(relaxed)))
    back = spec_from_json(doc)
    (f,) = back.column("ts").facets
    assert np.datetime64(f.value, "us") == np.datetime64("2025-06-01", "us")
