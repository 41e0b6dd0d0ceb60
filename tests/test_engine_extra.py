"""Engine behaviors beyond exact counts: schema-level violations, drift
gating, failfast mode, resume-after-interrupt, spec serde, CLI."""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from xmlschema_ray.engine.engine import ValidationEngine
from xmlschema_ray.engine.row_validator import ValidationFailure
from xmlschema_ray.sources.synthetic import (
    generate_sequences,
    sequences_spec,
    write_sequences_corpus,
)


def test_bad_dtype_partition_level_violation(tmp_path, ray_session):
    seq_dir, dim, exp = write_sequences_corpus(
        str(tmp_path / "c"), n_rows=800, n_files=8, defects={"bad_dtype": 1}
    )
    res = ValidationEngine(sequences_spec(), batch_size=256, n_shards=2).run(
        seq_dir, out_dir=str(tmp_path / "o"), dims={"sources": dim}
    )
    viol = res.violations()
    schema_viol = viol[viol["constraint_name"] == "schema.dtype"]
    assert len(schema_viol) == 1
    assert schema_viol.iloc[0]["column"] == "n_tok"
    assert res.job_validity == "invalid"


def test_drift_gate_fails_on_shifted_distribution(tmp_path, ray_session):
    """FIXTURES `drift`: profile mean-512 corpus, gate a mean-1536 corpus —
    0 row violations but a failing drift verdict (stats channel only)."""
    a_dir, dim_a, _ = write_sequences_corpus(str(tmp_path / "a"), n_rows=1500, n_files=4, mean_len=512)
    res_a = ValidationEngine(sequences_spec(), batch_size=512, n_shards=1).run(
        a_dir, out_dir=str(tmp_path / "ao"), dims={"sources": dim_a}
    )
    ref_hist = tuple(int(x) for x in res_a.summary["histograms"]["len(tokens)"])

    b_dir, dim_b, _ = write_sequences_corpus(
        str(tmp_path / "b"), n_rows=1500, n_files=4, mean_len=1536, seed=43
    )
    res_b = ValidationEngine(sequences_spec(reference_hist=ref_hist), batch_size=512, n_shards=1).run(
        b_dir, out_dir=str(tmp_path / "bo"), dims={"sources": dim_b}
    )
    assert res_b.n_violations == 0
    drift = res_b.drift[0]
    assert not drift.passed
    assert drift.ks > 0.5
    assert "drift_token_length" in res_b.summary["drift_failed"]
    # same-distribution control passes
    c_dir, dim_c, _ = write_sequences_corpus(
        str(tmp_path / "c"), n_rows=1500, n_files=4, mean_len=512, seed=44
    )
    res_c = ValidationEngine(sequences_spec(reference_hist=ref_hist), batch_size=512, n_shards=1).run(
        c_dir, out_dir=str(tmp_path / "co"), dims={"sources": dim_c}
    )
    assert res_c.drift[0].passed


def test_failfast_mode_raises(tmp_path, ray_session):
    seq_dir, dim, _ = write_sequences_corpus(
        str(tmp_path / "c"), n_rows=600, n_files=4, defects={"bad_token_range": 3}
    )
    import ray.exceptions

    with pytest.raises(Exception) as ei:
        ValidationEngine(sequences_spec(), batch_size=128, n_shards=1).run(
            seq_dir, out_dir=str(tmp_path / "o"), dims={"sources": dim}, mode="failfast"
        )
    assert "violated" in str(ei.value)


def test_resume_after_interrupt_produces_identical_output(tmp_path, ray_session):
    """FIXTURES resume property: drop a completed shard from the manifest
    (simulating a crash before it finished), resume, and the final outputs
    equal an uninterrupted run."""
    defects = {"dup_doc_id": 3, "bad_pattern": 2}
    seq_dir, dim, _ = write_sequences_corpus(str(tmp_path / "c"), n_rows=1000, n_files=8, defects=defects)
    eng = ValidationEngine(sequences_spec(), batch_size=256, n_shards=4)
    full = eng.run(seq_dir, out_dir=str(tmp_path / "full"), dims={"sources": dim})

    interrupted = str(tmp_path / "part")
    eng.run(seq_dir, out_dir=interrupted, dims={"sources": dim})
    # simulate crash: shard 2 never completed — remove its manifest line + output
    manifest_path = os.path.join(interrupted, "manifest.jsonl")
    lines = [l for l in open(manifest_path) if json.loads(l)["partition_id"] != 2]
    with open(manifest_path, "w") as f:
        f.writelines(lines)
    shutil.rmtree(os.path.join(interrupted, "unified", "part-00002"))

    resumed = eng.run(seq_dir, out_dir=interrupted, dims={"sources": dim})
    cols = ["key", "constraint_name", "column", "reason", "value_repr"]
    a = full.violations()[cols].sort_values(cols).reset_index(drop=True)
    b = resumed.violations()[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert resumed.verdicts.equals(full.verdicts)


def test_spec_json_roundtrip():
    from xmlschema_ray.constraints.serde import spec_from_json, spec_to_json

    spec = sequences_spec(reference_hist=tuple([1] * 256))
    doc = spec_to_json(spec)
    spec2 = spec_from_json(doc)
    assert spec_to_json(spec2) == doc
    assert [c.name for c in spec2.columns] == ["doc_id", "tokens", "n_tok", "source"]
    assert spec2.unique_keys[0].name == "unique_doc_id"
    assert spec2.drift[0].reference_hist == tuple([1] * 256)


def test_cli_validate_roundtrip(tmp_path):
    """Drive the CLI end-to-end in a subprocess (own Ray session)."""
    from xmlschema_ray.constraints.serde import save_spec

    seq_dir, dim, exp = write_sequences_corpus(
        str(tmp_path / "c"), n_rows=400, n_files=4, defects={"bad_ref": 2}
    )
    spec_path = str(tmp_path / "spec.json")
    save_spec(sequences_spec(), spec_path)
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env.pop("RAY_ADDRESS", None)
    proc = subprocess.run(
        [
            sys.executable, "-m", "xmlschema_ray", "validate",
            "--input", seq_dir, "--spec", spec_path, "--out", str(tmp_path / "o"),
            "--dim", f"sources={dim}", "--num-cpus", "2", "--shards", "2",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )
    assert proc.returncode == 1, proc.stderr[-2000:]  # invalid input → exit 1
    summary = json.loads(proc.stdout)
    assert summary["n_violations"] == 2
    assert summary["job_validity"] == "invalid"


def test_actor_pool_path_matches_tasks(tmp_path, ray_session):
    """use_actors=True (documented for expensive per-worker setup) must
    produce identical results; concurrency stays below the CPU count so
    the pool cannot starve the read (see CLAUDE.md pitfall)."""
    defects = {"bad_token_range": 3, "bad_ref": 2}
    seq_dir, dim, exp = write_sequences_corpus(
        str(tmp_path / "c"), n_rows=600, n_files=4, defects=defects
    )
    res_t = ValidationEngine(sequences_spec(), batch_size=256, n_shards=1).run(
        seq_dir, out_dir=str(tmp_path / "t"), dims={"sources": dim}
    )
    res_a = ValidationEngine(
        sequences_spec(), batch_size=256, n_shards=1, use_actors=True, concurrency=2
    ).run(seq_dir, out_dir=str(tmp_path / "a"), dims={"sources": dim})
    got_t = res_t.violations().groupby("constraint_name").size().to_dict()
    got_a = res_a.violations().groupby("constraint_name").size().to_dict()
    assert got_t == got_a == exp


def test_engine_struct_column_spec(tmp_path, ray_session):
    """Struct-column validation through the FULL engine path (not just the
    TypedViolations kernel): per-field facet violations land in the unified
    violation stream with usable value reprs."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from xmlschema_ray.constraints import facets as F
    from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints
    from xmlschema_ray.engine.engine import ValidationEngine

    st = pa.struct([("qty", pa.int64()), ("tag", pa.string())])
    tbl = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(50)], type=pa.string()),
            "props": pa.array(
                [{"qty": i, "tag": "ok" if i != 7 else None} for i in range(50)],
                type=st,
            ),
        }
    )
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(tbl, src / "part0.parquet")

    spec = TableConstraints(
        name="structs",
        columns=[
            ColumnSpec("doc_id", pa.string()),
            ColumnSpec(
                "props",
                st,
                facets=(
                    F.StructField("qty", (F.MaxInclusive(45),)),
                    F.StructField("tag", required=True),
                ),
            ),
        ],
        key_columns=("doc_id",),
    )
    res = ValidationEngine(spec, batch_size=16, n_shards=1).run(
        str(src), out_dir=str(tmp_path / "out"), resume=False
    )
    v = res.violations()
    # qty 46..49 exceed the bound (4 rows) + d7's null tag (1 row)
    by = v.groupby("constraint_name").size().to_dict()
    assert by == {
        "props.field(qty)[maxInclusive(45)]": 4,
        "props.field(tag)[required,]": 1,
    }, by
    assert set(v.loc[v["constraint_name"].str.contains("qty"), "key"]) == {
        "d46", "d47", "d48", "d49"
    }


def test_composite_unique_key_end_to_end(tmp_path, ray_session):
    """Multi-column xs:key: the tuple (source, doc_id) must be globally
    unique; the SAME doc_id reused by different sources is legal. Runs
    through both finalize plans (driver and forced-distributed) — the
    composite tuple survives the hashed candidate sieve and the exact
    recovery scan identically."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints, UniqueKey
    from xmlschema_ray.engine.engine import ValidationEngine

    seq_dir = os.path.join(str(tmp_path), "seq")
    os.makedirs(seq_dir)
    # every doc_id appears in BOTH sources (legal); the true dups are
    # ("A","d3") ×2 and ("B","d7") ×3, split across different files so the
    # candidate sieve must work cross-shard.
    base = [(f"d{i}", s, i) for s in ("A", "B") for i in range(20)]
    extra = [("d3", "A", 100), ("d7", "B", 101), ("d7", "B", 102)]
    rows = base + extra
    for j in range(4):
        part = rows[j::4]
        df = pd.DataFrame(part, columns=["doc_id", "source", "val"])
        pq.write_table(pa.Table.from_pandas(df), os.path.join(seq_dir, f"p{j}.parquet"))

    spec = TableConstraints(
        name="composite",
        columns=[
            ColumnSpec("doc_id", pa.string(), nullable=False),
            ColumnSpec("source", pa.string(), nullable=False),
            ColumnSpec("val", pa.int64(), nullable=False),
        ],
        unique_keys=[UniqueKey(("source", "doc_id"), name="unique_source_doc")],
        key_columns=("doc_id",),
    )

    for forced, out in ((False, "drv"), (True, "dst")):
        eng = ValidationEngine(spec, batch_size=8, n_shards=2)
        if forced:
            eng.driver_threshold_bytes = 0
        res = eng.run(seq_dir, out_dir=os.path.join(str(tmp_path), out))
        viol = res.violations()
        uviol = viol[viol["constraint_name"] == "unique_source_doc"]
        assert len(uviol) == 2, uviol
        assert set(uviol["key"]) == {"A|d3", "B|d7"}
        msgs = dict(zip(uviol["key"], uviol["reason"]))
        assert "count=2" in msgs["A|d3"] and "count=3" in msgs["B|d7"]
        assert res.job_validity == "invalid"


def test_composite_foreign_key(tmp_path, ray_session):
    """Multi-field xs:keyref analog: a fact (source, region) tuple must
    exist in the dim table as a PAIR — rows whose fields are each valid
    individually but whose combination is absent are exactly the
    violations a single-column keyref cannot catch. Null fields are
    keyref-exempt; spec JSON round-trips the tuple."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xmlschema_ray.constraints.serde import spec_from_json, spec_to_json
    from xmlschema_ray.constraints.spec import ColumnSpec, ForeignKey, TableConstraints
    from xmlschema_ray.engine.engine import ValidationEngine

    seq_dir = os.path.join(str(tmp_path), "seq")
    os.makedirs(seq_dir)
    # dim: allowed (source, region) pairs — A only in eu, B in eu+us
    dim = pa.table({"source": ["A", "B", "B"], "region": ["eu", "eu", "us"]})
    rows = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(6)],
            "source": ["A", "B", "A", "B", "C", None],
            "region": ["eu", "us", "us", "eu", "eu", "eu"],
        }
    )
    # d2 = (A, us): both fields individually present in the dim, pair absent
    # d4 = (C, eu): source C unknown entirely
    # d5 = (None, eu): null field → keyref-exempt (not_null's job)
    for j in range(2):
        pq.write_table(
            pa.Table.from_pandas(rows.iloc[j::2], preserve_index=False),
            os.path.join(seq_dir, f"p{j}.parquet"),
        )

    spec = TableConstraints(
        name="composite_fk",
        columns=[
            ColumnSpec("doc_id", pa.string(), nullable=False),
            ColumnSpec("source", pa.string(), nullable=True),
            ColumnSpec("region", pa.string(), nullable=True),
        ],
        foreign_keys=[
            ForeignKey(("source", "region"), "dims", ("source", "region"), name="fk_pair")
        ],
        key_columns=("doc_id",),
    )
    # tuple survives the JSON round-trip
    rt = spec_from_json(spec_to_json(spec))
    assert rt.foreign_keys[0].columns == ("source", "region")
    assert rt.foreign_keys[0].dim_keys == ("source", "region")

    res = ValidationEngine(rt, batch_size=4, n_shards=1).run(
        seq_dir, out_dir=os.path.join(str(tmp_path), "out"), dims={"dims": dim}
    )
    viol = res.violations()
    fkv = viol[viol["constraint_name"] == "fk_pair"]
    assert set(fkv["key"]) == {"d2", "d4"}, fkv
    assert (fkv["column"] == "source,region").all()
    assert res.job_validity == "invalid"

    # mismatched tuple lengths are a spec error at construction
    import pytest

    with pytest.raises(ValueError):
        ForeignKey(("a", "b"), "dims", "k")


def test_override_spec_compose():
    """xs:override/xs:redefine analog: same-name replaces, new name
    appends, remove deletes, and the merged document recompiles (or
    fails the compile lint exactly like a from-scratch spec)."""
    import pytest

    from xmlschema_ray.constraints.serde import (
        SpecError,
        override_spec,
        spec_from_json,
        spec_to_json,
    )
    from xmlschema_ray.sources.synthetic import sequences_spec

    base = spec_to_json(sequences_spec())
    override = {
        "columns": [
            {
                # REPLACE: doc_id now a plain non-null string (pattern dropped)
                "name": "doc_id",
                "dtype": "string",
                "nullable": False,
                "facets": [],
            }
        ],
        "unique_keys": [
            # APPEND a composite key alongside the base one
            {"name": "unique_source_doc", "columns": ["source", "doc_id"]}
        ],
        "drift": [{"name": "drift_token_length", "remove": True}],
    }
    merged = override_spec(base, override)
    spec = spec_from_json(merged)

    doc_id = next(c for c in spec.columns if c.name == "doc_id")
    assert doc_id.facets == ()  # replaced entry, not merged
    assert len(spec.columns) == len(base["columns"])  # replace, not append
    assert {u.name for u in spec.unique_keys} == {"unique_doc_id", "unique_source_doc"}
    assert spec.drift == []

    # removing an unknown entry is an error, like the reference's
    # "cannot redefine schema" path
    with pytest.raises(SpecError):
        override_spec(base, {"columns": [{"name": "nope", "remove": True}]})
    # entries must be named
    with pytest.raises(SpecError):
        override_spec(base, {"unique_keys": [{"columns": ["a"]}]})


def test_grouped_drift_catches_single_bad_source(tmp_path, ray_session):
    """DriftSpec(group_by=...): a drifted source hiding inside a healthy
    aggregate mix — the aggregate gate passes, the per-group gate fails
    exactly the bad source. Round-trips through spec JSON."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xmlschema_ray.constraints.serde import spec_from_json, spec_to_json
    from xmlschema_ray.constraints.spec import ColumnSpec, DriftSpec, TableConstraints
    from xmlschema_ray.engine.engine import ValidationEngine

    seq_dir = os.path.join(str(tmp_path), "seq")
    os.makedirs(seq_dir)
    # source A: uniform over [0, 50) — matches the uniform reference.
    # source B: all mass in the last bin — drifted, but only ~4% of rows.
    a_vals = np.arange(1000, dtype=np.int64) % 50
    b_vals = np.full(40, 45, dtype=np.int64)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(1040, dtype=np.int64),
            "n_tok": np.concatenate([a_vals, b_vals]),
            "source": ["A"] * 1000 + ["B"] * 40,
        }
    )
    for j in range(4):
        pq.write_table(
            pa.Table.from_pandas(df.iloc[j::4]), os.path.join(seq_dir, f"p{j}.parquet")
        )

    spec = TableConstraints(
        name="grouped_drift",
        columns=[
            ColumnSpec("doc_id", pa.int64(), nullable=False),
            ColumnSpec("n_tok", pa.int64(), nullable=False),
            ColumnSpec("source", pa.string(), nullable=False),
        ],
        drift=[
            DriftSpec(
                column="n_tok",
                bin_edges=tuple(float(x) for x in range(0, 60, 10)),
                reference_hist=(100, 100, 100, 100, 100),
                group_by="source",
                name="drift_n_tok",
            )
        ],
        key_columns=("doc_id",),
    )
    # group_by survives the JSON round-trip
    spec = spec_from_json(spec_to_json(spec))
    assert spec.drift[0].group_by == "source"

    res = ValidationEngine(spec, batch_size=128, n_shards=2).run(
        seq_dir, out_dir=os.path.join(str(tmp_path), "out")
    )
    by_name = {d.name: d for d in res.drift}
    assert by_name["drift_n_tok"].passed  # aggregate mix looks healthy
    assert by_name["drift_n_tok[A]"].passed
    assert not by_name["drift_n_tok[B]"].passed  # the hidden bad source
    assert "drift_n_tok[B]" in res.summary["drift_failed"]


def test_violation_cap_keeps_exact_counts(tmp_path, ray_session):
    """max_violations_per_batch truncates MATERIALIZED violation rows but
    verdicts/n_violations stay exact via overflow count records — the
    pathological-corpus guard (a fully-broken input must not materialize
    one output row per input row)."""
    seq_dir, dim, exp = write_sequences_corpus(
        str(tmp_path / "c"), n_rows=600, n_files=4, defects={"bad_token_range": 60}
    )
    capped = ValidationEngine(
        sequences_spec(), batch_size=64, n_shards=2, max_violations_per_batch=2
    ).run(seq_dir, out_dir=str(tmp_path / "o"), dims={"sources": dim})

    assert capped.job_validity == "invalid"
    assert capped.n_violations == 60  # exact despite truncation
    assert int(capped.verdicts["n_violations"].sum()) == 60
    viol = capped.violations()
    assert 0 < len(viol) < 60  # exemplars materialized, tail truncated
    assert sum(capped.summary["violations_truncated"].values()) == 60 - len(viol)

    # uncapped control on the same corpus: identical verdict counts
    full = ValidationEngine(sequences_spec(), batch_size=64, n_shards=2).run(
        seq_dir, out_dir=str(tmp_path / "f"), dims={"sources": dim}
    )
    assert full.n_violations == 60 and len(full.violations()) == 60
    assert full.summary["violations_truncated"] == {}


def test_drift_group_by_unknown_column_fails_compile():
    """A typo'd group_by would silently disable every per-group gate —
    compile must reject it like every other cross-reference."""
    import pyarrow as pa
    import pytest

    from xmlschema_ray.constraints.spec import (
        ColumnSpec,
        DriftSpec,
        SpecError,
        TableConstraints,
    )

    spec = TableConstraints(
        name="t",
        columns=[ColumnSpec("n", pa.int64(), nullable=False)],
        drift=[DriftSpec(column="n", bin_edges=(0.0, 1.0), group_by="soruce")],
        key_columns=("n",),
    )
    with pytest.raises(SpecError, match="group_by"):
        spec.compile()


def test_negative_violation_cap_rejected():
    import pytest

    with pytest.raises(ValueError, match="max_violations_per_batch"):
        ValidationEngine(sequences_spec(), max_violations_per_batch=-5)


def test_capped_run_resumed_uncapped_keeps_exact_counts(tmp_path, ray_session):
    """Resume a capped run with an UNCAPPED engine: the checkpointed
    overflow records must still fold into the verdicts (the re-add is
    unconditional, not gated on the resuming engine's cap setting)."""
    seq_dir, dim, _ = write_sequences_corpus(
        str(tmp_path / "c"), n_rows=600, n_files=4, defects={"bad_token_range": 60}
    )
    out = str(tmp_path / "o")
    capped = ValidationEngine(
        sequences_spec(), batch_size=64, n_shards=2, max_violations_per_batch=2
    ).run(seq_dir, out_dir=out, dims={"sources": dim})
    assert capped.n_violations == 60

    resumed = ValidationEngine(sequences_spec(), batch_size=64, n_shards=2).run(
        seq_dir, out_dir=out, dims={"sources": dim}
    )
    assert resumed.n_violations == 60
    assert sum(resumed.summary["violations_truncated"].values()) > 0


def test_group_references_gate_per_group(tmp_path, ray_session):
    """group_references: each group gated against ITS OWN reference —
    group A passes against A's profile while the SAME histogram would
    fail against B's; serde round-trips the per-group map."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xmlschema_ray.constraints.serde import spec_from_json, spec_to_json
    from xmlschema_ray.constraints.spec import (
        ColumnSpec,
        DriftSpec,
        SpecError,
        TableConstraints,
    )

    seq_dir = os.path.join(str(tmp_path), "seq")
    os.makedirs(seq_dir)
    # A: uniform over [0,50); B: all in the last bin. Each matches its own
    # profile; B would fail the shared/corpus reference.
    df = pd.DataFrame(
        {
            "doc_id": np.arange(1040, dtype=np.int64),
            "n_tok": np.concatenate(
                [np.arange(1000, dtype=np.int64) % 50, np.full(40, 45, dtype=np.int64)]
            ),
            "source": ["A"] * 1000 + ["B"] * 40,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), os.path.join(seq_dir, "p0.parquet"))

    spec = TableConstraints(
        name="gr",
        columns=[
            ColumnSpec("doc_id", pa.int64(), nullable=False),
            ColumnSpec("n_tok", pa.int64(), nullable=False),
            ColumnSpec("source", pa.string(), nullable=False),
        ],
        drift=[
            DriftSpec(
                column="n_tok",
                bin_edges=tuple(float(x) for x in range(0, 60, 10)),
                reference_hist=(100, 100, 100, 100, 100),
                group_by="source",
                group_references={
                    "A": (200, 200, 200, 200, 200),
                    "B": (0, 0, 0, 0, 40),
                },
                name="d",
            )
        ],
        key_columns=("doc_id",),
    )
    spec = spec_from_json(spec_to_json(spec))  # round-trip preserves the map
    assert spec.drift[0].group_references["B"] == (0, 0, 0, 0, 40)

    res = ValidationEngine(spec, batch_size=256, n_shards=1).run(
        seq_dir, out_dir=os.path.join(str(tmp_path), "o")
    )
    by_name = {d.name: d for d in res.drift}
    assert by_name["d[A]"].passed
    assert by_name["d[B]"].passed  # against B's OWN profile
    assert by_name["d"].passed  # aggregate vs shared reference

    # mismatched group reference length fails at spec build
    with pytest.raises(SpecError, match="group_references"):
        DriftSpec(
            column="n_tok",
            bin_edges=(0.0, 1.0, 2.0),
            group_by="source",
            group_references={"A": (1,)},
        )
    # group_references without group_by is rejected
    with pytest.raises(SpecError, match="requires group_by"):
        DriftSpec(
            column="n_tok", bin_edges=(0.0, 1.0, 2.0), group_references={"A": (1,)}
        )


def test_infer_spec_self_consistency(tmp_path, ray_session):
    """infer → validate the SAME corpus → valid with zero violations;
    the inferred spec round-trips through JSON; and the inferred
    enumeration/range facets catch genuinely novel values."""
    import pyarrow.parquet as pq

    from xmlschema_ray.constraints.infer import infer_spec
    from xmlschema_ray.constraints.serde import spec_from_json, spec_to_json

    seq_dir, dim, _ = write_sequences_corpus(str(tmp_path / "c"), n_rows=800, n_files=4)
    spec = infer_spec(seq_dir)
    spec = spec_from_json(spec_to_json(spec))  # serializable like any spec

    res = ValidationEngine(spec, batch_size=256, n_shards=2).run(
        seq_dir, out_dir=str(tmp_path / "o")
    )
    assert res.job_validity == "valid" and res.n_violations == 0

    by_name = {c.name: c for c in spec.columns}
    # tokens inferred as a list with item range + length bounds
    tok_kinds = {type(f).__name__ for f in by_name["tokens"].facets}
    assert "ItemFacets" in tok_kinds and "MaxLength" in tok_kinds

    # novel out-of-window value on a perturbed copy IS caught
    t = pq.read_table(os.path.join(seq_dir, sorted(os.listdir(seq_dir))[0]))
    df = t.to_pandas()
    df.loc[0, "n_tok"] = int(df["n_tok"].max()) + 10_000
    bad_dir = str(tmp_path / "bad")
    os.makedirs(bad_dir)
    import pyarrow as pa

    pq.write_table(pa.Table.from_pandas(df, schema=t.schema), os.path.join(bad_dir, "p0.parquet"))
    res_bad = ValidationEngine(spec, batch_size=256, n_shards=1).run(
        bad_dir, out_dir=str(tmp_path / "ob")
    )
    viol = res_bad.violations()
    assert res_bad.job_validity == "invalid"
    assert (viol["column"] == "n_tok").any()

def test_infer_spec_nan_columns(tmp_path, ray_session):
    """NaN in a float column must not poison the inferred bounds (Arrow
    min_max does not skip NaN) — the column gets NO range facet, the
    invariant infer→validate==zero-violations still holds, and clean
    float columns still get their window."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xmlschema_ray.constraints import facets as F
    from xmlschema_ray.constraints.infer import infer_spec

    d = str(tmp_path / "nan")
    os.makedirs(d)
    # build from raw numpy so NaN stays a VALUE (from_pandas would convert
    # NaN to Arrow null, which min_max already skips — not the bug)
    score = np.array([np.nan if i % 7 == 0 else float(i) for i in range(100)])
    tbl = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(100)]),
            "score": pa.array(score, from_pandas=False),
            "clean": pa.array(np.arange(100) * 0.5, from_pandas=False),
            "vals": pa.array(
                [[1.0, np.nan] if i % 9 == 0 else [1.0, 2.0] for i in range(100)],
                type=pa.list_(pa.float64()),
            ),
        }
    )
    assert pa.compute.sum(pa.compute.is_nan(tbl["score"])).as_py() > 0
    pq.write_table(tbl, os.path.join(d, "p0.parquet"))
    spec = infer_spec(d)
    by_name = {c.name: c for c in spec.columns}

    kinds = lambda c: {type(f).__name__ for f in by_name[c].facets}
    # NaN-bearing: no range facets at all (not MinInclusive(nan))
    assert "MinInclusive" not in kinds("score") and "MaxInclusive" not in kinds("score")
    assert not any(isinstance(f, F.ItemFacets) for f in by_name["vals"].facets)
    # but length facets on the list survive, and the clean column keeps its window
    assert "MaxLength" in kinds("vals")
    mins = [f for f in by_name["clean"].facets if isinstance(f, F.MinInclusive)]
    assert mins and mins[0].value == 0.0

    res = ValidationEngine(spec, batch_size=64, n_shards=1).run(
        d, out_dir=str(tmp_path / "o")
    )
    assert res.job_validity == "valid" and res.n_violations == 0

def test_driftspec_group_reference_keys_normalize_to_str():
    """Python-built specs with int group keys must behave like JSON-loaded
    ones (serde yields str keys; the engine looks references up by the
    stringified histogram suffix)."""
    from xmlschema_ray.constraints.spec import DriftSpec

    d = DriftSpec(
        column="n_tok",
        bin_edges=(0.0, 1.0, 2.0),
        group_by="source",
        group_references={3: (1, 2), "7": (2, 3)},
    )
    assert set(d.group_references) == {"3", "7"}
    assert d.group_references["3"] == (1, 2)

def test_output_formatters_roundtrip(tmp_path, ray_session):
    """Registered output formatters (the converters analog): canonical
    parquet is byte-unchanged by default; jsonl-by-key and csv renderings
    round-trip back to the exact canonical frame; a custom registered
    formatter resolves by name; unknown names raise."""
    import hashlib

    import pytest as _pytest

    from xmlschema_ray.engine.formatters import get_formatter, register_formatter

    defects = {"dup_doc_id": 3, "bad_token_range": 4, "bad_ref": 2}
    seq_dir, dim, _ = write_sequences_corpus(
        str(tmp_path / "c"), n_rows=800, n_files=4, defects=defects
    )
    res = ValidationEngine(sequences_spec(), batch_size=256, n_shards=2).run(
        seq_dir, out_dir=str(tmp_path / "o"), dims={"sources": dim}
    )
    viol_dir = os.path.join(res.out_dir, "violations")
    digest_before = {
        f: hashlib.md5(open(os.path.join(viol_dir, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(viol_dir))
    }
    canonical = res.violations()

    for name in ("jsonl-by-key", "csv", "parquet-by-constraint", "jsonl-flat", "json-table"):
        out = res.export(name, str(tmp_path / f"v.{name}"))
        back = get_formatter(name).reader(out)
        pd.testing.assert_frame_equal(
            back.reset_index(drop=True), canonical.reset_index(drop=True)
        )

    # the hive layout really is per-constraint: one directory per distinct
    # constraint name, URL-quoted (names carry parens/quotes/brackets)
    pbc = str(tmp_path / "v.parquet-by-constraint")
    dirs = [e for e in os.listdir(pbc) if e.startswith("constraint_name=")]
    assert len(dirs) == canonical["constraint_name"].nunique()
    from urllib.parse import unquote

    assert {unquote(e.split("=", 1)[1]) for e in dirs} == set(
        canonical["constraint_name"].unique()
    )

    # a SECOND export into the same directory REFUSES (the listdir-built
    # reader would absorb stale constraint dirs as current violations —
    # the layout-writer convention)
    with _pytest.raises(ValueError, match="FRESH directory"):
        res.export("parquet-by-constraint", pbc)

    # canonical parquet untouched by exports
    digest_after = {
        f: hashlib.md5(open(os.path.join(viol_dir, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(viol_dir))
    }
    assert digest_after == digest_before

    # custom formatter via the registry
    register_formatter(
        "count-only",
        lambda vdir, out: open(out, "w").write(
            str(sum(len(pd.read_parquet(os.path.join(vdir, f))) for f in os.listdir(vdir)))
        ),
    )
    out = res.export("count-only", str(tmp_path / "n.txt"))
    assert int(open(out).read()) == len(canonical)

    with _pytest.raises(KeyError, match="unknown output format"):
        res.export("no-such-format", str(tmp_path / "x"))

def test_output_formatter_multifile_distributed_path(tmp_path, ray_session):
    """jsonl-by-key over the DISTRIBUTED violations sink (multi-file
    parquet, driver_threshold_bytes=0) still emits one line per identity
    and round-trips to the canonical frame."""
    from xmlschema_ray.engine.formatters import get_formatter

    defects = {"dup_doc_id": 4, "bad_token_range": 5}
    seq_dir, dim, _ = write_sequences_corpus(
        str(tmp_path / "c"), n_rows=900, n_files=4, defects=defects
    )
    eng = ValidationEngine(sequences_spec(), batch_size=128, n_shards=2)
    eng.driver_threshold_bytes = 0  # force the distributed sink
    res = eng.run(seq_dir, out_dir=str(tmp_path / "o"), dims={"sources": dim})
    out = res.export("jsonl-by-key", str(tmp_path / "v.jsonl"))
    back = get_formatter("jsonl-by-key").reader(out)
    pd.testing.assert_frame_equal(back.reset_index(drop=True), res.violations())
    # one line per identity
    idents = [
        (json.loads(l)["partition_id"], json.loads(l)["key"]) for l in open(out)
    ]
    assert len(idents) == len(set(idents))


def test_normalize_documents_null_text_matches_oracle(tmp_path, ray_session):
    """`changed` must follow IS DISTINCT FROM semantics on NULL text
    (null vs null = unchanged/False), matching the registered oracle."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xmlschema_ray.pipelines.cleaning import NORMALIZE_DOCUMENTS_SQL, normalize_documents

    d = str(tmp_path / "sf")
    os.makedirs(d)
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "text": pa.array([" a\tb ", None, "ok"], type=pa.string())}),
        os.path.join(d, "documents.parquet"),
    )
    ray_df = normalize_documents(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM parquet_scan('{d}/documents.parquet')")
    sql_df = con.execute(NORMALIZE_DOCUMENTS_SQL).df()
    assert ray_df["changed"].tolist() == sql_df["changed"].tolist() == [True, False, False]
    assert ray_df["text_norm"].fillna("∅").tolist() == sql_df["text_norm"].fillna("∅").tolist()


def test_unique_key_require_present_xs_key_mode(tmp_path, ray_session):
    """xs:key vs xs:unique null semantics: by default rows with null key
    fields are EXEMPT from uniqueness (two nulls are not duplicates); in
    key mode (require_present=True) each null key field row is itself a
    `.key_absent` violation. Serde round-trips the flag (absent when
    False, so old spec documents are byte-stable) and spec_compat flags
    flipping it on as breaking."""
    import json

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xmlschema_ray.constraints.derive import spec_compat
    from xmlschema_ray.constraints.serde import spec_from_json, spec_to_json
    from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints, UniqueKey
    from xmlschema_ray.engine.engine import ValidationEngine

    df = pd.DataFrame(
        {
            "id": pd.array([1, 2, 2, None, None, 6], dtype="Int64"),
            "x": [10, 20, 30, 40, 50, 60],
        }
    )
    p = tmp_path / "in.parquet"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)

    def run(uk):
        spec = TableConstraints(
            name="t",
            columns=[ColumnSpec("id", pa.int64(), nullable=True), ColumnSpec("x", pa.int64())],
            unique_keys=[uk],
            key_columns=("x",),
        )
        eng = ValidationEngine(spec, batch_size=3, n_shards=1)
        return eng.run(
            str(p), out_dir=str(tmp_path / f"out_{uk.require_present}"), resume=False
        )

    # xs:unique (default): the two nulls are NOT duplicates of each other;
    # only the real dup pair (id=2) fires
    res_u = run(UniqueKey(("id",), name="uk"))
    v = res_u.violations()
    assert set(v["constraint_name"]) == {"uk"}
    assert len(v) == 1  # one violation per duplicated KEY (count=2)

    # xs:key mode: same dup key PLUS one .key_absent per null row
    res_k = run(UniqueKey(("id",), name="uk", require_present=True))
    vk = res_k.violations()
    counts = vk.groupby("constraint_name").size().to_dict()
    assert counts == {"uk": 1, "uk.key_absent": 2}

    # serde: flag round-trips; absent when False
    spec = TableConstraints(
        name="t",
        columns=[ColumnSpec("id", pa.int64())],
        unique_keys=[UniqueKey(("id",), name="uk", require_present=True)],
        key_columns=("id",),
    )
    doc = spec_to_json(spec)
    assert doc["unique_keys"][0]["require_present"] is True
    back = spec_from_json(doc)
    assert back.unique_keys[0].require_present is True
    spec_f = TableConstraints(
        name="t",
        columns=[ColumnSpec("id", pa.int64())],
        unique_keys=[UniqueKey(("id",), name="uk")],
        key_columns=("id",),
    )
    assert "require_present" not in spec_to_json(spec_f)["unique_keys"][0]

    # compat: flipping key mode ON is a definition change => not compatible
    findings = spec_compat(spec_f, spec)
    hit = [f for f in findings if "unique_key uk" in f["item"]]
    assert hit and not hit[0]["compatible"]


# -- triage_violations --------------------------------------------------------


def test_triage_min_k_merge_and_padding(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from xmlschema_ray.pipelines.validation_queries import triage_violations

    # two blocks so the driver merge must min-k-combine partials; constraint
    # 'b' has fewer than 3 examples -> -1 padding
    b1 = pd.DataFrame(
        {
            "k": [9, 5, 7, 2],
            "constraint_name": ["a", "a", "a", "b"],
            "col_name": ["x", "x", "x", "y"],
        }
    )
    b2 = pd.DataFrame(
        {
            "k": [1, 8, 3],
            "constraint_name": ["a", "a", "a"],
            "col_name": ["x", "x", "x"],
        }
    )
    ds = rd.from_pandas([b1, b2])
    out = triage_violations(ds, ["k"]).sort_values("constraint_name").reset_index(drop=True)
    a = out[out["constraint_name"] == "a"].iloc[0]
    assert int(a["n"]) == 6
    # global 3 smallest across BOTH blocks (1,3 from block 2; 5 from block 1)
    assert [int(a["ex1_k"]), int(a["ex2_k"]), int(a["ex3_k"])] == [1, 3, 5]
    b = out[out["constraint_name"] == "b"].iloc[0]
    assert int(b["n"]) == 1
    assert [int(b["ex1_k"]), int(b["ex2_k"]), int(b["ex3_k"])] == [2, -1, -1]


def test_triage_negative_key_is_not_padding(ray_session):
    import pandas as pd
    import ray.data as rd

    from xmlschema_ray.pipelines.validation_queries import triage_violations

    b1 = pd.DataFrame({"k": [-1, 5], "constraint_name": ["a", "a"], "col_name": ["x", "x"]})
    b2 = pd.DataFrame({"k": [3], "constraint_name": ["a"], "col_name": ["x"]})
    out = triage_violations(rd.from_pandas([b1, b2]), ["k"])
    row = out.iloc[0]
    # the genuine -1 key survives the merge as the smallest example
    assert [int(row["ex1_k"]), int(row["ex2_k"]), int(row["ex3_k"])] == [-1, 3, 5]
    assert int(row["n"]) == 3

    with __import__("pytest").raises(Exception):  # string keys refuse
        triage_violations(
            rd.from_pandas(pd.DataFrame({"k": ["s"], "constraint_name": ["a"], "col_name": ["x"]})),
            ["k"],
        ).head()


def test_csv_round_trip_numeric_looking_strings(tmp_path, ray_session):
    """A constraint/column literally named '2020' must round-trip the CSV
    as a STRING (pd.read_csv would otherwise re-parse it as int64)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from xmlschema_ray.engine.formatters import get_formatter

    d = str(tmp_path / "violations")
    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "partition_id": pa.array([0], pa.int32()),
                "key": pa.array(["7"], pa.string()),
                "constraint_name": pa.array(["2020"], pa.string()),
                "column": pa.array(["2020"], pa.string()),
                "reason": pa.array(["42"], pa.string()),
                "value_repr": pa.array(["1e3"], pa.string()),
            }
        ),
        d + "/part-0.parquet",
    )
    fmt = get_formatter("csv")
    out = str(tmp_path / "v.csv")
    fmt.writer(d, out)
    back = fmt.reader(out)
    assert back["constraint_name"].tolist() == ["2020"]
    assert str(back["constraint_name"].dtype) == "object"
    assert back["column"].tolist() == ["2020"] and back["reason"].tolist() == ["42"]
