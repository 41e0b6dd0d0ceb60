"""End-to-end engine tests over the seeded fixture corpus.

The fixture methodology is the reference's manifest-driven `--errors N`
convention (``/root/reference/xmlschema/tests/test_factory.py:116-193``,
exact-error-count assertion ``tests/__init__.py:171-197``): every seeded
defect has an exact expected violation count, plus PSVI verdict checks.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from xmlschema_ray.engine.engine import ValidationEngine
from xmlschema_ray.sources.synthetic import (
    generate_sequences,
    sequences_spec,
    write_sequences_corpus,
)

N_ROWS = 1200


def run_fixture(tmp_path, defects, n_rows=N_ROWS, **engine_kw):
    corpus = os.path.join(str(tmp_path), "corpus")
    seq_dir, dim_path, expected = write_sequences_corpus(
        corpus, n_rows=n_rows, n_files=8, defects=defects
    )
    spec = sequences_spec()
    eng = ValidationEngine(spec, batch_size=256, n_shards=4, **engine_kw)
    res = eng.run(
        seq_dir,
        out_dir=os.path.join(str(tmp_path), "out"),
        dims={"sources": dim_path},
    )
    return res, expected


def test_clean_corpus_is_valid(tmp_path):
    res, _ = run_fixture(tmp_path, defects=None)
    assert res.job_validity == "valid"
    assert res.n_violations == 0
    assert len(res.violations()) == 0
    assert (res.verdicts["validity"] == "valid").all()
    assert res.verdicts["n_rows"].sum() == N_ROWS
    # stats channel populated
    assert res.stats.columns["n_tok"].count == N_ROWS
    est = res.summary["distinct_estimates"]["doc_id"]
    assert abs(est - N_ROWS) / N_ROWS < 0.05


@pytest.mark.parametrize(
    "defects",
    [
        {"dup_doc_id": 7},
        {"bad_ref": 5},
        {"null_doc_id": 3},
        {"bad_token_range": 9},
        {"n_tok_mismatch": 6},
        {"len_bounds": 4},
        {"bad_pattern": 2},
    ],
    ids=lambda d: next(iter(d)),
)
def test_seeded_defect_exact_counts(tmp_path, defects):
    res, expected = run_fixture(tmp_path, defects=defects)
    assert res.job_validity == "invalid"
    viol = res.violations()
    got = viol.groupby("constraint_name").size().to_dict()
    assert got == expected, f"got {got}, want {expected}"


def test_mixed_defects_sum_exactly(tmp_path):
    defects = {"dup_doc_id": 7, "bad_ref": 5, "n_tok_mismatch": 6}
    res, expected = run_fixture(tmp_path, defects=defects)
    viol = res.violations()
    got = viol.groupby("constraint_name").size().to_dict()
    assert got == expected
    assert res.n_violations == sum(expected.values())
    # violation rows carry locating keys (the XPath-path analog:
    # reference asserts every error has a non-empty path,
    # tests/__init__.py:171-197)
    non_null_checks = viol[viol["constraint_name"] != "doc_id.not_null"]
    assert (non_null_checks["key"].str.len() > 0).all()


def test_skewed_dup_single_violation(tmp_path):
    res, expected = run_fixture(tmp_path, defects={"skewed_dup": 1})
    viol = res.violations()
    assert len(viol) == 1
    assert viol.iloc[0]["constraint_name"] == "unique_doc_id"
    assert "count=120" in viol.iloc[0]["reason"]  # 10% of 1200 rows


def test_determinism_across_shard_and_batch_sizes(tmp_path):
    """Canonical violations identical under different physical plans —
    the parallelism-determinism analog of the reference's single-threaded
    document order (SURVEY §7 hard part 1)."""
    defects = {"dup_doc_id": 3, "bad_token_range": 4, "bad_pattern": 2}
    res1, _ = run_fixture(tmp_path / "a", defects=defects)
    corpus = os.path.join(str(tmp_path / "b"), "corpus")
    seq_dir, dim_path, _ = write_sequences_corpus(corpus, n_rows=N_ROWS, n_files=8, defects=defects)
    eng = ValidationEngine(sequences_spec(), batch_size=97, n_shards=2)
    res2 = eng.run(seq_dir, out_dir=os.path.join(str(tmp_path / "b"), "out"), dims={"sources": dim_path})
    v1 = res1.violations()[["key", "constraint_name", "column", "reason", "value_repr"]]
    v2 = res2.violations()[["key", "constraint_name", "column", "reason", "value_repr"]]
    v1 = v1.sort_values(list(v1.columns)).reset_index(drop=True)
    v2 = v2.sort_values(list(v2.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(v1, v2)


def test_partition_of_rows_roundtrip(tmp_path):
    """Violating keys ∪ passing keys = all keys, disjoint (the reference's
    decode→encode fixed-point analog, tests/test_validators.py:330-389)."""
    defects = {"bad_token_range": 5, "n_tok_mismatch": 4}
    corpus = os.path.join(str(tmp_path), "corpus")
    seq_dir, dim_path, _ = write_sequences_corpus(corpus, n_rows=N_ROWS, n_files=8, defects=defects)
    res = ValidationEngine(sequences_spec(), batch_size=256, n_shards=2).run(
        seq_dir, out_dir=os.path.join(str(tmp_path), "out"), dims={"sources": dim_path}
    )
    import pyarrow.dataset as pads

    all_keys = set(pads.dataset(seq_dir).to_table(columns=["doc_id"])["doc_id"].to_pylist())
    bad_keys = set(res.violations()["key"])
    assert bad_keys <= all_keys
    assert len(bad_keys) == 9  # 5 + 4 distinct rows
