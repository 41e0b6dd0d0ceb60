"""Canary sampling (run(sample_mod=N)): exactness-on-sampled-keys, honest
PSVI-partial verdicts, B-stage sample consistency, refusal matrix."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from xmlschema_ray import ValidationEngine
from xmlschema_ray.constraints import facets as F
from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints, UniqueKey
from xmlschema_ray.sources.synthetic import sequences_spec, write_sequences_corpus


def _run(seq_dir, dim, out, spec, **kw):
    return ValidationEngine(spec, n_shards=2, batch_size=512).run(
        seq_dir, out_dir=out, dims={"sources": dim}, resume=False, **kw
    )


def test_sampled_violations_exact_on_sampled_keys(ray_session, tmp_path):
    seq_dir, dim, expected = write_sequences_corpus(
        str(tmp_path / "c"),
        n_rows=2000,
        defects={"dup_doc_id": 9, "bad_token_range": 11},
    )
    spec = sequences_spec()
    full = _run(seq_dir, dim, str(tmp_path / "full"), spec)
    samp = _run(seq_dir, dim, str(tmp_path / "samp"), spec, sample_mod=3)

    fv = full.violations()
    sv = samp.violations()
    # every sampled finding is a real full-run finding
    fset = set(zip(fv["key"], fv["constraint_name"]))
    sset = set(zip(sv["key"], sv["constraint_name"]))
    assert sset <= fset
    # EXACT over the sampled key space: a full-run violation whose key was
    # sampled must appear in the sampled run too (keys sample atomically)
    from xmlschema_ray.engine.stats import hash64

    fkeys = fv["key"].to_numpy()
    sampled_mask = hash64(np.asarray(fkeys, dtype=object)) % 3 == 0
    expected_sampled = {
        (k, c) for (k, c), m in zip(zip(fkeys, fv["constraint_name"]), sampled_mask) if m
    }
    assert sset == expected_sampled
    # honest PSVI: every verdict attempted=partial; violation-free
    # partitions report notKnown, never valid
    v = samp.verdicts
    assert (v["validation_attempted"] == "partial").all()
    assert set(v["validity"]) <= {"invalid", "notKnown"}
    assert samp.job_validity in ("invalid", "notKnown")


def test_clean_sample_is_notknown(ray_session, tmp_path):
    seq_dir, dim, _ = write_sequences_corpus(str(tmp_path / "c"), n_rows=800)
    samp = _run(seq_dir, dim, str(tmp_path / "s"), sequences_spec(), sample_mod=4)
    assert samp.job_validity == "notKnown"
    assert (samp.verdicts["validity"] == "notKnown").all()
    assert samp.summary["sample_mod"] == 4
    # the sample really did shrink the work
    full = _run(seq_dir, dim, str(tmp_path / "f"), sequences_spec())
    assert 0 < samp.summary["n_rows"] < full.summary["n_rows"]


def test_sample_refusals(ray_session, tmp_path):
    seq_dir, dim, _ = write_sequences_corpus(str(tmp_path / "c"), n_rows=200)
    spec = sequences_spec()
    with pytest.raises(ValueError, match="resume=False"):
        ValidationEngine(spec).run(
            seq_dir, out_dir=str(tmp_path / "o"), dims={"sources": dim}, sample_mod=4
        )
    with pytest.raises(ValueError, match=">= 2"):
        _run(seq_dir, dim, str(tmp_path / "o2"), spec, sample_mod=1)
    with pytest.raises(ValueError, match="quarantine"):
        _run(
            seq_dir,
            dim,
            str(tmp_path / "o3"),
            spec,
            sample_mod=4,
            quarantine_out=str(tmp_path / "q"),
        )
    drift_spec = sequences_spec(reference_hist=tuple([1] * 256))
    with pytest.raises(ValueError, match="drift"):
        _run(seq_dir, dim, str(tmp_path / "o4"), drift_spec, sample_mod=4)


def test_sampled_out_dir_refuses_full_run(ray_session, tmp_path):
    seq_dir, dim, _ = write_sequences_corpus(str(tmp_path / "c"), n_rows=200)
    spec = sequences_spec()
    _run(seq_dir, dim, str(tmp_path / "o"), spec, sample_mod=4)
    # a later FULL run into the same out_dir must refuse: the sampled
    # shard records would satisfy its resume manifest
    with pytest.raises(ValueError, match="SAMPLED"):
        ValidationEngine(spec, n_shards=2).run(
            seq_dir, out_dir=str(tmp_path / "o"), dims={"sources": dim}, resume=True
        )
    with pytest.raises(ValueError, match="SAMPLED"):
        _run(seq_dir, dim, str(tmp_path / "o"), spec)  # resume=False full run too


def test_stats_only_sample_keeps_attempted_none(ray_session, tmp_path):
    seq_dir, dim, _ = write_sequences_corpus(str(tmp_path / "c"), n_rows=200)
    res = _run(seq_dir, dim, str(tmp_path / "o"), sequences_spec(), sample_mod=4, mode="stats_only")
    assert (res.verdicts["validation_attempted"] == "none").all()
    assert (res.verdicts["validity"] == "notKnown").all()
