"""Bloom filter primitive (ops/bloom.py) + the bloom-prefiltered exact
decontamination pipeline: no false negatives ever, bounded false-positive
rate at design load, and pipeline output EXACT regardless of filter load
(the two-phase guarantee — false positives die in the verify exchange)."""

import numpy as np
import pandas as pd
import pytest

from xmlschema_ray.ops.bloom import BloomFilter, optimal_bits

SF_DIR = "/root/testdata/sf0.001"


def _keys(prefix, n):
    return np.array([f"{prefix} gram number {i}" for i in range(n)], dtype=object)


def test_no_false_negatives_and_bounded_fpr():
    added = _keys("in", 5000)
    absent = _keys("out", 20000)
    bf = BloomFilter(m_bits=optimal_bits(5000, fpr=0.01), n_hashes=7).add_many(added)
    assert bf.contains_many(added).all()  # structural guarantee
    fpr = bf.contains_many(absent).mean()
    assert fpr < 0.03, fpr  # design 1%, generous margin


def test_union_equals_single_build_and_geometry_checked():
    a, b = _keys("a", 1000), _keys("b", 1000)
    both = BloomFilter(1 << 16).add_many(np.concatenate([a, b]))
    merged = BloomFilter(1 << 16).add_many(a).union(BloomFilter(1 << 16).add_many(b))
    assert np.array_equal(both.bits, merged.bits)  # OR-mergeable, exactly
    with pytest.raises(ValueError, match="geometry"):
        BloomFilter(1 << 16).union(BloomFilter(1 << 15))
    with pytest.raises(ValueError, match="power of two"):
        BloomFilter(1000)


def test_bytes_roundtrip_and_determinism():
    a = _keys("x", 500)
    bf = BloomFilter(1 << 14, n_hashes=5).add_many(a)
    bf2 = BloomFilter.from_bytes(bf.to_bytes(), n_hashes=5)
    assert bf2.m_bits == 1 << 14
    assert bf2.contains_many(a).all()
    # a rebuilt filter is bit-identical (cross-process determinism is what
    # makes build-on-one-worker / probe-on-another sound)
    assert np.array_equal(BloomFilter(1 << 14, n_hashes=5).add_many(a).bits, bf.bits)
    # int64 keys hash too (dedup-index / id use cases)
    ids = np.arange(1000, dtype=np.int64)
    bfi = BloomFilter(1 << 14).add_many(ids)
    assert bfi.contains_many(ids).all()


def test_bloom_pipeline_exact_even_at_saturating_fpr(ray_session):
    """Force a tiny filter (1024 bits for thousands of grams → fill ~1,
    nearly every gram becomes a candidate): the verify phase must still
    return EXACTLY the exact-broadcast result — the candidate exchange
    degrades to the full gram stream, never to a wrong answer."""
    from xmlschema_ray.pipelines.curation import bloom_decontaminate, decontamination

    exact = decontamination(SF_DIR)
    for m_bits in (1 << 20, 1 << 10):
        got = bloom_decontaminate(SF_DIR, m_bits=m_bits)
        pd.testing.assert_frame_equal(got, exact)


def test_bloom_prune_join_equals_unpruned(ray_session):
    """bloom_prune_join == hash_bucket_join bit-for-bit, at a healthy
    filter AND at a forced ~100%-fill filter (pruning power -> 0, output
    unchanged): false positives die in the exact merge, false negatives
    are structurally impossible."""
    import numpy as np
    import ray.data as rd

    from xmlschema_ray.ops.relational import bloom_prune_join, hash_bucket_join

    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {"k": rng.integers(0, 5000, 20000), "v": np.arange(20000, dtype=np.int64)}
    )
    right = pd.DataFrame({"rk": np.arange(0, 5000, 7, dtype=np.int64)})
    right["w"] = right["rk"] * 10
    want = (
        hash_bucket_join(rd.from_pandas(left), rd.from_pandas(right), "k", "rk")
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)[["k", "v", "w"]]
    )
    assert len(want) > 0
    for m_bits in (1 << 20, 1 << 8):
        got = (
            bloom_prune_join(
                rd.from_pandas(left), rd.from_pandas(right), "k", "rk", m_bits=m_bits
            )
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)[["k", "v", "w"]]
        )
        pd.testing.assert_frame_equal(got, want)


def test_urgent_revenue_bloom_forced_fill(ray_session):
    """The oracled query at a saturating 256-bit filter returns the same
    frame as at the default geometry."""
    from xmlschema_ray.pipelines.relational import urgent_revenue_bloom_join

    a = urgent_revenue_bloom_join(SF_DIR)
    b = urgent_revenue_bloom_join(SF_DIR, m_bits=1 << 8)
    pd.testing.assert_frame_equal(a, b)
