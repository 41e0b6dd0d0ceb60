"""Stage B5 (TemporalForeignKey): SCD2 referential integrity — containment
boundaries, exemptions, missing-dim refusal, serde + compat identity."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xmlschema_ray import TemporalForeignKey, ValidationEngine
from xmlschema_ray.constraints.serde import spec_from_json, spec_to_json
from xmlschema_ray.constraints.spec import ColumnSpec, SpecError, TableConstraints


def _ts(s):
    return np.datetime64(s, "us")


def _spec():
    return TableConstraints(
        name="tfk_t",
        columns=[
            ColumnSpec("id", pa.int64()),
            ColumnSpec("k", pa.int64(), nullable=True),
            ColumnSpec("ts", pa.timestamp("us"), nullable=True),
        ],
        temporal_foreign_keys=[TemporalForeignKey("k", "ts", "vers", "k")],
        key_columns=("id",),
    )


def _corpus(tmp_path):
    d = str(tmp_path / "facts")
    os.makedirs(d, exist_ok=True)
    facts = pa.table(
        {
            "id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "k": pa.array([10, 10, 10, 99, None, 10, 11], pa.int64()),
            "ts": pa.array(
                [
                    _ts("2024-01-01"),                    # == valid_from: covered
                    _ts("2024-06-30T23:59:59.999999"),    # last covered instant
                    _ts("2024-07-01"),                    # == valid_to: violates
                    _ts("2024-03-01"),                    # key absent from dim
                    _ts("2024-03-01"),                    # null key: exempt
                    None,                                  # null ts: exempt
                    _ts("2024-03-01"),                    # dim row null vf: uncovered
                ],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(facts, os.path.join(d, "part0.parquet"))
    dim = pa.table(
        {
            "k": pa.array([10, 11], pa.int64()),
            "valid_from": pa.array([_ts("2024-01-01"), None], pa.timestamp("us")),
            "valid_to": pa.array([_ts("2024-07-01"), _ts("2025-01-01")], pa.timestamp("us")),
        }
    )
    return d, dim


def test_containment_boundaries_and_exemptions(ray_session, tmp_path):
    d, dim = _corpus(tmp_path)
    res = ValidationEngine(_spec(), n_shards=1).run(
        d, out_dir=str(tmp_path / "out"), dims={"vers": dim}, resume=False
    )
    v = res.violations().sort_values("key").reset_index(drop=True)
    assert sorted(v["key"].astype(int).tolist()) == [3, 4, 7]
    by_key = dict(zip(v["key"].astype(int), v["reason"]))
    assert "version covers" in by_key[3]           # ts == valid_to, half-open
    assert "not found" in by_key[4]                # key missing entirely
    assert "version covers" in by_key[7]           # null-bound version covers nothing
    assert res.job_validity == "invalid"


def test_missing_dim_refuses(ray_session, tmp_path):
    d, _ = _corpus(tmp_path)
    with pytest.raises(ValueError, match="custvers|vers"):
        ValidationEngine(_spec(), n_shards=1).run(
            d, out_dir=str(tmp_path / "out2"), dims={}, resume=False
        )


def test_serde_round_trip_and_compat(ray_session):
    spec = _spec().compile()
    doc = spec_to_json(spec)
    spec2 = spec_from_json(json.loads(json.dumps(doc)))
    assert spec2.temporal_foreign_keys == spec.temporal_foreign_keys
    # absent section stays byte-stable
    plain = TableConstraints(name="p", columns=[ColumnSpec("id", pa.int64())])
    assert "temporal_foreign_keys" not in spec_to_json(plain.compile())

    from xmlschema_ray.constraints.derive import spec_compat

    # adding the check to a spec without it is breaking (old data unchecked)
    base = TableConstraints(
        name="tfk_t",
        columns=[c for c in spec.columns],
        key_columns=("id",),
    ).compile()
    rep = spec_compat(base, spec)
    assert any(
        "tfk_k_at_ts_refs_vers" in f["item"] and not f["compatible"] for f in rep
    )
    # changing the validity window columns is a definition change
    spec3 = TableConstraints(
        name="tfk_t",
        columns=[c for c in spec.columns],
        temporal_foreign_keys=[
            TemporalForeignKey("k", "ts", "vers", "k", dim_valid_from="vf2")
        ],
        key_columns=("id",),
    ).compile()
    rep2 = spec_compat(spec, spec3)
    assert any(not f["compatible"] for f in rep2)


def test_same_validity_column_names_refused():
    with pytest.raises(SpecError, match="same column"):
        TemporalForeignKey("k", "ts", "vers", "k", dim_valid_from="x", dim_valid_to="x")


def test_b5_key_identity_matches_stage_a(ray_session, tmp_path):
    """Cross-stage KEY IDENTITY: B5 violation keys must render exactly like
    stage A's _key_strings (Python str() over the SOURCE dtype). Pinned on
    the two divergent families: a whole-second TIMESTAMP key (Arrow cast
    would append '.000000') and a NULL-BEARING int64 key (the pandas
    exchange surfaces it as float64 — '7.0' where stage A writes '7')."""
    d = str(tmp_path / "facts")
    os.makedirs(d, exist_ok=True)
    facts = pa.table(
        {
            "kid": pa.array([7, None, 9], pa.int64()),       # null-bearing int key
            "kts": pa.array(
                [_ts("2024-03-01T12:00:00"), _ts("2024-03-02T00:00:00"), None],
                pa.timestamp("us"),
            ),
            "k": pa.array([99, 10, 10], pa.int64()),          # 99 absent from dim
            "ts": pa.array(
                [_ts("2024-03-01"), _ts("2024-03-01"), _ts("2024-03-01")],
                pa.timestamp("us"),
            ),
            "name": pa.array([None, "x", "y"], pa.string()),  # stage-A not_null hit row 0
        }
    )
    pq.write_table(facts, os.path.join(d, "part0.parquet"))
    dim = pa.table(
        {
            "k": pa.array([10], pa.int64()),
            "valid_from": pa.array([_ts("2024-01-01")], pa.timestamp("us")),
            "valid_to": pa.array([_ts("2024-07-01")], pa.timestamp("us")),
        }
    )
    spec = TableConstraints(
        name="tfk_keyid",
        columns=[
            ColumnSpec("kid", pa.int64(), nullable=True),
            ColumnSpec("kts", pa.timestamp("us"), nullable=True),
            ColumnSpec("k", pa.int64(), nullable=True),
            ColumnSpec("ts", pa.timestamp("us"), nullable=True),
            ColumnSpec("name", pa.string(), nullable=False),
        ],
        temporal_foreign_keys=[TemporalForeignKey("k", "ts", "vers", "k")],
        key_columns=("kid", "kts"),
    )
    res = ValidationEngine(spec, n_shards=1).run(
        d, out_dir=str(tmp_path / "out"), dims={"vers": dim}, resume=False
    )
    v = res.violations()
    a_keys = set(v.loc[v["constraint_name"] == "name.not_null", "key"])
    b5_keys = set(v.loc[v["constraint_name"] == "fk_k_to_vers", "key"])
    if not b5_keys:  # constraint name differs per spec default; fall back
        b5_keys = set(
            v.loc[v["reason"].str.contains("not found|version covers"), "key"]
        )
    # row 0 violates BOTH stage A (null name) and B5 (k=99 absent): the key
    # must be the SAME string in both stages — and the stage-A form
    # (str(): '7', no '.0'; '2024-03-01 12:00:00', no '.000000')
    assert a_keys == {"7|2024-03-01 12:00:00"}
    assert "7|2024-03-01 12:00:00" in b5_keys
    for key in b5_keys:
        assert ".000000" not in key and not key.split("|")[0].endswith(".0")
