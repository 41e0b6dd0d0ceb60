"""Edge inputs: empty files, all-null columns, single-row corpora."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xmlschema_ray.engine.engine import ValidationEngine
from xmlschema_ray.sources.synthetic import SEQ_SCHEMA, sequences_spec


def _dim():
    return pa.table({"source": pa.array([f"s{i:02d}" for i in range(16)])})


def test_empty_parquet_file(tmp_path, ray_session):
    d = tmp_path / "seq"
    d.mkdir()
    pq.write_table(SEQ_SCHEMA.empty_table(), str(d / "empty.parquet"))
    res = ValidationEngine(sequences_spec(), n_shards=1).run(
        str(d), out_dir=str(tmp_path / "o"), dims={"sources": _dim()}
    )
    assert res.job_validity == "valid"
    assert res.summary["n_rows"] == 0
    assert res.n_violations == 0


def test_single_row_with_null_everything(tmp_path, ray_session):
    d = tmp_path / "seq"
    d.mkdir()
    t = pa.table(
        {
            "doc_id": pa.array([None], type=pa.string()),
            "tokens": pa.array([None], type=pa.list_(pa.int32())),
            "n_tok": pa.array([None], type=pa.int32()),
            "source": pa.array([None], type=pa.string()),
        },
        schema=SEQ_SCHEMA,
    )
    pq.write_table(t, str(d / "one.parquet"))
    res = ValidationEngine(sequences_spec(), n_shards=1).run(
        str(d), out_dir=str(tmp_path / "o"), dims={"sources": _dim()}
    )
    viol = res.violations()
    # four not_null violations, nothing else fires on nulls
    assert sorted(viol["constraint_name"]) == [
        "doc_id.not_null",
        "n_tok.not_null",
        "source.not_null",
        "tokens.not_null",
    ]


def test_missing_required_column(tmp_path, ray_session):
    d = tmp_path / "seq"
    d.mkdir()
    t = pa.table(
        {
            "doc_id": pa.array(["doc-0123456789ab"], type=pa.string()),
            "tokens": pa.array([[1, 2, 3]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([3], type=pa.int32()),
        }
    )
    pq.write_table(t, str(d / "nosource.parquet"))
    res = ValidationEngine(sequences_spec(), n_shards=1).run(
        str(d), out_dir=str(tmp_path / "o"), dims={"sources": _dim()}
    )
    viol = res.violations()
    assert "schema.required_column" in set(viol["constraint_name"])
    assert res.job_validity == "invalid"
