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
    # fullmatch, not ^...$: Python's `$` matches before a trailing newline,
    # but XSD patterns (and RE2's end-of-text `$`) must cover the WHOLE value,
    # so 'a\n' does not satisfy '[a-z]+'.
    rx = re.compile(pattern)
    truth = [v is not None and not rx.fullmatch(v) for v in vals]
    assert m.tolist() == truth


@given(st.lists(st.one_of(st.none(), st.text(max_size=8)), max_size=40), st.lists(st.text(max_size=8), min_size=1, max_size=5))
@settings(max_examples=60, deadline=None)
def test_enumeration_matches_oracle(vals, allowed):
    arr = pa.array(vals, type=pa.string())
    m, _ = F.Enumeration(tuple(allowed)).check(arr)
    allowed_set = set(allowed)
    assert m.tolist() == [v is not None and v not in allowed_set for v in vals]


# -- occurs interval arithmetic (reference helpers.py:224-254) ------------

_bounds = st.builds(
    lambda lo, extra: __import__(
        "xmlschema_ray.constraints.occurs", fromlist=["OccursBounds"]
    ).OccursBounds(lo, None if extra is None else lo + extra),
    st.integers(0, 20),
    st.one_of(st.none(), st.integers(0, 20)),
)


@given(a=_bounds, b=_bounds, n=st.integers(0, 2000))
@settings(max_examples=200, deadline=None)
def test_occurs_add_is_minkowski_sum(a, b, n):
    """x∈a and y∈b ⟹ x+y ∈ a+b, and the composed interval is tight at
    its endpoints — the ParticleCounter sequence-concatenation contract."""
    s = a + b
    assert s.contains(a.min_occurs + b.min_occurs)
    if a.max_occurs is not None and b.max_occurs is not None:
        assert s.max_occurs == a.max_occurs + b.max_occurs
        assert not s.contains(s.max_occurs + 1)
    else:
        assert s.max_occurs is None and s.contains(n + s.min_occurs)


@given(a=_bounds, b=_bounds)
@settings(max_examples=200, deadline=None)
def test_occurs_mul_matches_reference_cases(a, b):
    m = a * b
    assert m.min_occurs == a.min_occurs * b.min_occurs
    if a.max_occurs == 0 or b.max_occurs == 0:
        assert m.max_occurs == 0
    elif a.max_occurs is None or b.max_occurs is None:
        assert m.max_occurs is None
    else:
        assert m.max_occurs == a.max_occurs * b.max_occurs


@given(a=_bounds, b=_bounds, n=st.integers(0, 60))
@settings(max_examples=200, deadline=None)
def test_occurs_choice_envelope_is_sound(a, b, n):
    """anything admitted by either branch is admitted by the envelope."""
    e = a | b
    if a.contains(n) or b.contains(n):
        assert e.contains(n)


from hypothesis import given, settings, strategies as st

_iv = st.lists(
    st.tuples(st.integers(0, 0xFFFF), st.integers(0, 0xFFFF)).map(
        lambda t: (min(t), max(t))
    ),
    max_size=6,
)


@settings(max_examples=60, deadline=None)
@given(_iv, _iv)
def test_unicode_subset_algebra_laws(a_ivs, b_ivs):
    """Set-algebra laws over random interval sets: De Morgan, involution,
    difference-as-intersect-complement, cardinality consistency."""
    from xmlschema_ray.constraints.xsd_regex import UnicodeSubset

    a, b = UnicodeSubset(a_ivs), UnicodeSubset(b_ivs)
    assert ~(~a) == a
    assert ~(a | b) == (~a & ~b)          # De Morgan
    assert ~(a & b) == (~a | ~b)
    assert (a - b) == (a & ~b)
    assert len(a | b) == len(a) + len(b) - len(a & b)
    # membership agrees with the interval definition on boundary points
    for lo, hi in a_ivs:
        assert lo in a and hi in a
