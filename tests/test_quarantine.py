"""Dead-letter split sink: quarantine_out / clean_out route rows by the
SAME key identity the validator uses, conserve the corpus, exclude
warning-severity findings, and refuse capped (incomplete) violation sets."""

import glob

import pandas as pd
import pytest

from xmlschema_ray.engine.engine import ValidationEngine
from xmlschema_ray.sources.synthetic import sequences_spec, write_sequences_corpus


def _read_dir(d):
    return pd.concat(
        [pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/**/*.parquet", recursive=True))],
        ignore_index=True,
    )


def test_quarantine_split_partitions_corpus(tmp_path, ray_session):
    seq_dir, dim, _ = write_sequences_corpus(
        str(tmp_path / "c"),
        n_rows=1500,
        n_files=4,
        defects={"bad_token_range": 6, "dup_doc_id": 4, "bad_source": 3},
    )
    qdir, cdir = str(tmp_path / "q"), str(tmp_path / "cl")
    res = ValidationEngine(sequences_spec()).run(
        seq_dir,
        str(tmp_path / "out"),
        dims={"sources": dim},
        quarantine_out=qdir,
        clean_out=cdir,
    )
    src = _read_dir(seq_dir)
    q = _read_dir(qdir)
    cl = _read_dir(cdir)
    # conservation: every source row lands on exactly one side
    assert len(q) + len(cl) == len(src)
    v = res.violations()
    bad_keys = set(v[v["key"].notna() & (v["partition_id"] >= 0)]["key"])
    assert set(q["doc_id"].astype(str)) == bad_keys
    assert set(cl["doc_id"].astype(str)).isdisjoint(bad_keys)
    assert len(q) > 0 and len(cl) > 0


def test_quarantine_refuses_capped_run(tmp_path, ray_session):
    seq_dir, dim, _ = write_sequences_corpus(
        str(tmp_path / "c"), n_rows=1200, n_files=2, defects={"bad_token_range": 20}
    )
    eng = ValidationEngine(sequences_spec(), max_violations_per_batch=1)
    with pytest.raises(ValueError, match="uncapped"):
        eng.run(
            seq_dir,
            str(tmp_path / "out"),
            dims={"sources": dim},
            quarantine_out=str(tmp_path / "q"),
        )


def test_quarantine_excludes_warning_severity(tmp_path, ray_session):
    seq_dir, dim, _ = write_sequences_corpus(
        str(tmp_path / "c"),
        n_rows=1200,
        n_files=2,
        defects={"bad_token_range": 5, "dup_doc_id": 4},
    )
    spec = sequences_spec()
    # find the constraint names actually emitted, demote the token-range one
    base = ValidationEngine(spec).run(seq_dir, str(tmp_path / "out0"), dims={"sources": dim})
    v0 = base.violations()
    fk_names = sorted({n for n in v0["constraint_name"].unique() if "tokens" in n})
    hard_names = sorted(set(v0["constraint_name"].unique()) - set(fk_names))
    assert fk_names and hard_names, v0["constraint_name"].unique()
    import dataclasses

    spec2 = dataclasses.replace(spec, warning_constraints=tuple(fk_names))
    res = ValidationEngine(spec2).run(
        seq_dir,
        str(tmp_path / "out1"),
        dims={"sources": dim},
        quarantine_out=str(tmp_path / "q"),
    )
    q = _read_dir(str(tmp_path / "q"))
    v = res.violations()
    hard = v[
        v["key"].notna()
        & (v["partition_id"] >= 0)
        & ~v["constraint_name"].isin(set(fk_names))
    ]
    assert set(q["doc_id"].astype(str)) == set(hard["key"])
    # the demoted rows are warnings, not quarantined
    assert res.n_warnings > 0


def test_quarantine_matches_timestamp_and_bool_keys(tmp_path, ray_session):
    """Key rendering must be the VALIDATOR's (_key_strings: Python str(),
    nulls -> '') — an Arrow cast renders bool/whole-second-timestamp keys
    differently and every violating row silently leaks into clean."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xmlschema_ray import ValidationEngine
    from xmlschema_ray.constraints import facets as F
    from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints

    d = str(tmp_path / "facts")
    import os

    os.makedirs(d)
    ts = lambda s: np.datetime64(s, "us")
    pq.write_table(
        pa.table(
            {
                "k_ts": pa.array([ts("2020-01-01"), ts("2020-01-02")], pa.timestamp("us")),
                "k_b": pa.array([True, False]),
                "x": pa.array([99.0, 1.0]),  # first row violates
            }
        ),
        d + "/p0.parquet",
    )
    spec = TableConstraints(
        name="t",
        columns=[
            ColumnSpec("k_ts", pa.timestamp("us")),
            ColumnSpec("k_b", pa.bool_()),
            ColumnSpec("x", pa.float64(), facets=(F.MaxInclusive(10.0),)),
        ],
        key_columns=("k_ts", "k_b"),
    )
    res = ValidationEngine(spec, n_shards=1).run(
        d,
        str(tmp_path / "out"),
        dims={},
        quarantine_out=str(tmp_path / "q"),
        clean_out=str(tmp_path / "cl"),
        resume=False,
    )
    assert res.job_validity == "invalid"
    q = _read_dir(str(tmp_path / "q"))
    cl = _read_dir(str(tmp_path / "cl"))
    # the violating timestamp/bool-keyed row is QUARANTINED, not leaked
    assert len(q) == 1 and float(q["x"].iloc[0]) == 99.0
    assert len(cl) == 1 and float(cl["x"].iloc[0]) == 1.0


def test_quarantine_refuses_missing_key_column(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xmlschema_ray.engine.encode import quarantine_split
    from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints

    d = str(tmp_path / "facts")
    import os

    os.makedirs(d)
    pq.write_table(pa.table({"x": pa.array([1.0])}), d + "/p0.parquet")
    spec = TableConstraints(
        name="t",
        columns=[ColumnSpec("id", pa.int64()), ColumnSpec("x", pa.float64())],
        key_columns=("id",),
    )
    with pytest.raises(Exception, match="key column"):
        quarantine_split(d, spec, ["1"], quarantine_out=str(tmp_path / "q"), resume=False)
