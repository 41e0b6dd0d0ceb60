"""Unit tests for the text / hashing / vector function library."""

import numpy as np
import pandas as pd

from xmlschema_ray.functions import hashing as H
from xmlschema_ray.functions import text as T
from xmlschema_ray.functions.vector import (
    batch_cosine_topk,
    hyperplane_bucket,
    hyperplane_planes,
    normalize_rows,
)


def test_token_counts():
    s = pd.Series(["a b  c", "", "one"])
    assert T.whitespace_token_count(s).tolist() == [3, 0, 1]
    assert T.bpe_ish_token_count(pd.Series(["it's done, ok2"])).iloc[0] >= 5


def test_quality_features_and_score():
    s = pd.Series(["the cat sat on the mat", "x"])
    f = T.quality_features(s)
    assert f["n_tokens"].tolist() == [6, 1]
    assert 0 < f["stopword_ratio"].iloc[0] <= 1
    q = T.quality_score(f)
    assert ((0 <= q) & (q <= 1)).all()
    assert q.iloc[0] > q.iloc[1]


def test_language_id():
    s = pd.Series(
        ["the cat and the dog of the town", "der hund und die katze ist nicht da", "zzz qqq"]
    )
    assert T.language_id(s).tolist() == ["en", "de", "und"]


def test_fingerprint_stable_under_whitespace():
    a = T.fingerprint64(pd.Series(["hello   world "]))
    b = T.fingerprint64(pd.Series(["hello world"]))
    assert a.iloc[0] == b.iloc[0]


def test_minhash_similarity_estimates_jaccard():
    a, b = H.minhash_params(256)
    s1 = H.shingle_hashes("the quick brown fox jumps over the lazy dog again and again", 2)
    s2 = H.shingle_hashes("the quick brown fox jumps over the lazy cat again and again", 2)
    sig1 = H.minhash_signature(s1, a, b)
    sig2 = H.minhash_signature(s2, a, b)
    est = (sig1 == sig2).mean()
    true = H.jaccard(s1, s2)
    assert abs(est - true) < 0.2
    # identical docs → identical signatures
    assert np.array_equal(sig1, H.minhash_signature(s1, a, b))


def test_band_hash_matrix_shapes_and_determinism():
    rng = np.random.default_rng(0)
    sigs = rng.integers(0, 1 << 60, size=(5, 128), dtype=np.uint64)
    b1 = H.band_hash_matrix(sigs, 32)
    b2 = H.band_hash_matrix(sigs.copy(), 32)
    assert b1.shape == (5, 32)
    assert np.array_equal(b1, b2)
    # identical signatures share all bands; different ones almost none
    assert np.array_equal(b1[0], H.band_hash_matrix(sigs[:1], 32)[0])


def test_simhash_and_hamming():
    words1 = H.hash64(np.array("the quick brown fox".split(), dtype=object))
    words2 = H.hash64(np.array("the quick brown cat".split(), dtype=object))
    h1 = H.simhash64(words1)
    h2 = H.simhash64(words2)
    d_self = H.hamming64(np.array([h1], dtype=np.uint64), h1)[0]
    d_near = H.hamming64(np.array([h1], dtype=np.uint64), h2)[0]
    assert d_self == 0
    assert 0 < d_near < 40


def test_cosine_topk_matches_bruteforce():
    rng = np.random.default_rng(5)
    corpus = rng.standard_normal((200, 16))
    ids = np.arange(200)
    queries = corpus[:3]
    qi, vids, cos = batch_cosine_topk(corpus, ids, queries, k=5)
    nc = normalize_rows(corpus)
    nq = normalize_rows(queries)
    full = nc @ nq.T
    for q in range(3):
        mine = set(vids[qi == q].tolist())
        truth = set(np.argsort(-full[:, q])[:5].tolist())
        assert mine == truth
    # self-similarity 1.0 present
    assert np.isclose(cos.max(), 1.0)


def test_hyperplane_bucket_deterministic():
    planes = hyperplane_planes(16, 8)
    v = np.random.default_rng(1).standard_normal((10, 16))
    assert np.array_equal(hyperplane_bucket(v, planes), hyperplane_bucket(v.copy(), planes))


def test_fingerprint_md5_null_safe():
    from xmlschema_ray.functions.text import fingerprint_md5_16

    out = fingerprint_md5_16(pd.Series(["a  b", None, "a b"]))
    assert out.iloc[1] is None
    assert out.iloc[0] == out.iloc[2]  # whitespace-collapse identity
