"""Property-based facet testing (hypothesis): the vectorized Arrow kernels
must agree with a naive row-by-row Python oracle that mirrors the
reference's per-value validators (``/root/reference/xmlschema/validators/
facets.py`` semantics) on arbitrary inputs — the property-layer analog of
the reference's corpus-driven exact-error-count methodology (SURVEY §5).
"""

import re

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from xmlschema_ray.constraints import facets as F

# naive per-value oracles (mirror reference facets.py rules)


def oracle_range(values, lo=None, hi=None, lo_excl=False, hi_excl=False):
    out = []
    for v in values:
        if v is None:
            out.append(False)
            continue
        bad = False
        if lo is not None:
            bad |= (v <= lo) if lo_excl else (v < lo)
        if hi is not None:
            bad |= (v >= hi) if hi_excl else (v > hi)
        out.append(bad)
    return out


ints = st.lists(st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)), max_size=60)


@given(ints, st.integers(-1000, 1000), st.integers(0, 2000))
@settings(max_examples=60, deadline=None)
def test_range_facets_match_oracle(vals, lo, span):
    hi = lo + span
    arr = pa.array(vals, type=pa.int64())
    m1, _ = F.MinInclusive(lo).check(arr)
    m2, _ = F.MaxInclusive(hi).check(arr)
    m3, _ = F.MinExclusive(lo).check(arr)
    m4, _ = F.MaxExclusive(hi).check(arr)
    assert m1.tolist() == oracle_range(vals, lo=lo)
    assert m2.tolist() == oracle_range(vals, hi=hi)
    assert m3.tolist() == oracle_range(vals, lo=lo, lo_excl=True)
    assert m4.tolist() == oracle_range(vals, hi=hi, hi_excl=True)


texts = st.lists(st.one_of(st.none(), st.text(max_size=20)), max_size=40)


@given(texts, st.integers(0, 10), st.integers(0, 10))
@settings(max_examples=60, deadline=None)
def test_length_facets_match_oracle(vals, lo, extra):
    hi = lo + extra
    arr = pa.array(vals, type=pa.string())
    m_lo, _ = F.MinLength(lo).check(arr)
    m_hi, _ = F.MaxLength(hi).check(arr)
    assert m_lo.tolist() == [v is not None and len(v) < lo for v in vals]
    assert m_hi.tolist() == [v is not None and len(v) > hi for v in vals]


@given(
    st.lists(st.one_of(st.none(), st.lists(st.integers(-100, 60000), max_size=12)), max_size=30),
    st.integers(0, 50257),
)
@settings(max_examples=60, deadline=None)
def test_item_facets_match_oracle(lists, vocab):
    arr = pa.array(lists, type=pa.list_(pa.int32()))
    m, _ = F.ItemFacets((F.MinInclusive(0), F.MaxExclusive(vocab))).check(arr)
    truth = [
        l is not None and any(x < 0 or x >= vocab for x in l)
        for l in lists
    ]
    assert m.tolist() == truth


@given(texts, st.sampled_from([r"[a-z]+", r"doc-[0-9a-f]{4}", r"\d*", r"(ab|cd)+"]))
@settings(max_examples=60, deadline=None)
def test_pattern_matches_re_oracle(vals, pattern):
    arr = pa.array(vals, type=pa.string())
    m, _ = F.Pattern(pattern).check(arr)
    rx = re.compile(f"^(?:{pattern})$")
    truth = [v is not None and not rx.match(v) for v in vals]
    assert m.tolist() == truth


@given(st.lists(st.one_of(st.none(), st.text(max_size=8)), max_size=40), st.lists(st.text(max_size=8), min_size=1, max_size=5))
@settings(max_examples=60, deadline=None)
def test_enumeration_matches_oracle(vals, allowed):
    arr = pa.array(vals, type=pa.string())
    m, _ = F.Enumeration(tuple(allowed)).check(arr)
    allowed_set = set(allowed)
    assert m.tolist() == [v is not None and v not in allowed_set for v in vals]
