"""Unit tests for the curation operators' vectorized kernels."""

import numpy as np
import pyarrow as pa

from xmlschema_ray.pipelines.curation import _md5_hex, _word_grams


def test_word_grams_basic():
    text = pa.array(["a b c d", "x y", ""])
    rows, grams = _word_grams(text, 2)
    assert grams.tolist() == ["a b", "b c", "c d", "x y"]
    assert rows.tolist() == [0, 0, 0, 1]


def test_word_grams_never_cross_rows():
    text = pa.array(["a b", "c d"])
    _, grams = _word_grams(text, 2)
    assert "b c" not in grams.tolist()


def test_word_grams_row_shorter_than_n():
    text = pa.array(["only", "two words here"])
    rows, grams = _word_grams(text, 3)
    assert grams.tolist() == ["two words here"]
    assert rows.tolist() == [1]


def test_word_grams_empty_batch():
    rows, grams = _word_grams(pa.array([], type=pa.string()), 2)
    assert len(rows) == 0 and len(grams) == 0


def test_md5_hex_matches_hashlib():
    import hashlib

    vals = ["doc-1", "web", ""]
    out = _md5_hex(vals)
    assert out[0] == hashlib.md5(b"doc-1").hexdigest()
    assert all(len(h) == 32 for h in out)


def test_stratified_rates_deterministic():
    # same input -> identical keep decision, rate within {2,4,6,8}/16
    ids = [f"doc-{i:04d}" for i in range(64)]
    d = np.array(["0123456789abcdef".index(h[0]) for h in _md5_hex(ids)])
    s = np.array(["0123456789abcdef".index(h[0]) for h in _md5_hex(["web"] * 64)])
    keep1 = d < 2 * (1 + s % 4)
    keep2 = d < 2 * (1 + s % 4)
    assert (keep1 == keep2).all()
    assert 0 < keep1.sum() < 64
