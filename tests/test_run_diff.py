"""Run diffing (engine/diff.py): two seeded runs over perturbed corpora
give exact per-constraint deltas and exact regressed/fixed key sets;
identity diff is empty; one-empty-side diffs degrade correctly."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from xmlschema_ray import ValidationEngine
from xmlschema_ray.constraints.facets import MaxInclusive
from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints
from xmlschema_ray.engine.diff import diff_validation_runs


def _spec():
    return TableConstraints(
        "t",
        columns=[
            ColumnSpec("k", pa.int64(), nullable=False),
            ColumnSpec("x", pa.int64(), facets=[MaxInclusive(100)]),
        ],
        key_columns=("k",),
    )


def _run(tmp_path, name, xs):
    d = tmp_path / (name + "_in")
    d.mkdir()
    df = pd.DataFrame({"k": np.arange(len(xs), dtype=np.int64), "x": np.array(xs, dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), d / "p0.parquet")
    out = str(tmp_path / (name + "_out"))
    ValidationEngine(_spec(), n_shards=1).run(str(d), out_dir=out, resume=False)
    return out


def test_diff_exact_regressions_and_fixes(ray_session, tmp_path):
    # A: keys 1, 3 violate; B: keys 3, 5, 7 violate
    a = _run(tmp_path, "a", [10, 200, 20, 300, 30, 40, 50, 60])
    b = _run(tmp_path, "b", [10, 90, 20, 300, 30, 400, 50, 700])
    d = diff_validation_runs(a, b)
    per = d["per_constraint"]
    assert len(per) == 1
    assert per.iloc[0]["n_a"] == 2 and per.iloc[0]["n_b"] == 3 and per.iloc[0]["delta"] == 1
    assert d["regressed"]["key"].tolist() == ["5", "7"]
    assert d["fixed"]["key"].tolist() == ["1"]


def test_diff_identity_is_empty(ray_session, tmp_path):
    a = _run(tmp_path, "i1", [10, 200, 20])
    b = _run(tmp_path, "i2", [10, 200, 20])
    d = diff_validation_runs(a, b)
    assert d["per_constraint"]["delta"].tolist() == [0]
    assert len(d["regressed"]) == 0 and len(d["fixed"]) == 0


def test_diff_against_clean_run(ray_session, tmp_path):
    clean = _run(tmp_path, "c", [1, 2, 3])
    dirty = _run(tmp_path, "d", [1, 200, 300])
    d = diff_validation_runs(clean, dirty)
    assert d["per_constraint"].iloc[0]["n_a"] == 0
    assert d["per_constraint"].iloc[0]["n_b"] == 2
    assert len(d["regressed"]) == 2 and len(d["fixed"]) == 0
    rev = diff_validation_runs(dirty, clean)
    assert len(rev["regressed"]) == 0 and len(rev["fixed"]) == 2
