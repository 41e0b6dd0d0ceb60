"""Unit tests for the vectorized facet kernels (no Ray needed).

Modeled on the reference's per-operator unit layer
(``/root/reference/xmlschema/tests/test_meta.py:25-263`` builtin-type checks).
"""

import numpy as np
import pyarrow as pa
import pytest

from xmlschema_ray.constraints import facets as F


def test_range_facets():
    arr = pa.chunked_array([pa.array([1, 5, 10, None, -3], type=pa.int32())])
    m, _ = F.MinInclusive(0).check(arr)
    assert m.tolist() == [False, False, False, False, True]
    m, _ = F.MaxInclusive(5).check(arr)
    assert m.tolist() == [False, False, True, False, False]
    m, _ = F.MinExclusive(1).check(arr)
    assert m.tolist() == [True, False, False, False, True]
    m, _ = F.MaxExclusive(10).check(arr)
    assert m.tolist() == [False, False, True, False, False]


def test_length_facets_string_and_list():
    s = pa.array(["a", "abc", None, ""])
    m, _ = F.MinLength(1).check(s)
    assert m.tolist() == [False, False, False, True]
    m, _ = F.MaxLength(2).check(s)
    assert m.tolist() == [False, True, False, False]
    m, _ = F.Length(3).check(s)
    assert m.tolist() == [True, False, False, True]
    lst = pa.array([[1, 2], [], None, [1, 2, 3]], type=pa.list_(pa.int32()))
    m, _ = F.MinLength(1).check(lst)
    assert m.tolist() == [False, True, False, False]
    m, _ = F.MaxLength(2).check(lst)
    assert m.tolist() == [False, False, False, True]


def test_pattern_anchored():
    s = pa.array(["doc-0123456789ab", "doc-XYZ", None, "xdoc-0123456789ab"])
    m, _ = F.Pattern(r"doc-[0-9a-f]{12}").check(s)
    assert m.tolist() == [False, True, False, True]


def test_pattern_caret_is_wrapped_unconditionally():
    # full-match semantics even when the pattern starts with '^': "abcdef"
    # must NOT pass "^abc" (the reference wraps every pattern, facets.py:585)
    s = pa.array(["abc", "abcdef", "xabc"])
    m, _ = F.Pattern(r"^abc").check(s)
    assert m.tolist() == [False, True, True]


def test_enumeration():
    s = pa.array(["web", "books", "junk", None])
    m, _ = F.Enumeration(("web", "books", "code")).check(s)
    assert m.tolist() == [False, False, True, False]


def test_item_facets_flags_parent_and_reports_first_offender():
    lst = pa.array([[1, 2, 3], [4, -1, 99999], None, []], type=pa.list_(pa.int32()))
    f = F.ItemFacets((F.MinInclusive(0), F.MaxExclusive(50257)))
    m, reprs = f.check(lst)
    assert m.tolist() == [False, True, False, False]
    assert reprs[1] == "item=-1"


def test_item_facets_nan_items_not_masked_by_minmax_fast_path():
    """A NaN item poisons Arrow's min_max aggregate (both bounds NaN, every
    bound comparison False), which declared the batch CLEAN on the fast
    path while the exact per-item path flags NaN as failing every range
    facet — regression: both paths must agree. NaN must be a real float
    NaN, not an Arrow null (pa.array from numpy, CLAUDE.md)."""
    flat = np.array([1.0, 2.0, np.nan, 3.0, 4.0], dtype=np.float64)
    lst = pa.ListArray.from_arrays(
        pa.array([0, 2, 3, 5], type=pa.int32()),
        pa.array(flat, from_pandas=False),
    )
    assert lst.values.null_count == 0  # NaN stayed a value, not a null
    f = F.ItemFacets((F.MinInclusive(0.0), F.MaxInclusive(10.0)))
    m, reprs = f.check(lst)
    # row 1 holds the NaN: NaN >= 0.0 is False -> range violation
    assert m.tolist() == [False, True, False]
    assert "nan" in str(reprs[1])
    # a genuinely clean float batch still takes the aggregate shortcut
    clean = pa.array([[1.0, 2.0], [3.0]], type=pa.list_(pa.float64()))
    m2, _ = f.check(clean)
    assert m2.tolist() == [False, False]


def test_item_facets_on_sliced_array():
    lst = pa.array([[99999], [1], [2], [-5]], type=pa.list_(pa.int32())).slice(1, 3)
    f = F.ItemFacets((F.MinInclusive(0), F.MaxExclusive(50257)))
    m, _ = f.check(lst)
    assert m.tolist() == [False, False, True]


def test_lint_contradictory_bounds():
    with pytest.raises(F.SpecError):
        F.lint_facet_stack(pa.string(), [F.MinLength(5), F.MaxLength(2)])
    with pytest.raises(F.SpecError):
        F.lint_facet_stack(pa.int32(), [F.MinInclusive(10), F.MaxInclusive(1)])
    with pytest.raises(F.SpecError):
        F.lint_facet_stack(pa.int32(), [F.MinLength(1)])  # length facet on int
    with pytest.raises(F.SpecError):
        F.lint_facet_stack(pa.string(), [F.Pattern("([")])
    # consistent stack passes
    F.lint_facet_stack(pa.string(), [F.MinLength(1), F.MaxLength(10), F.Pattern("x+")])


def test_binary_encoded_lengths():
    # hexBinary: XSD length = decoded OCTETS = len(lexical)/2
    hx = pa.array(["00ff", "aabbcc", "12"])
    m, _ = F.Length(2, encoding="hex").check(hx)
    assert m.tolist() == [False, True, True]
    # base64Binary: decoded = 3*len/4 - padding (reference facets.py:208-215)
    b64 = pa.array(["TWFu", "TWE=", "TQ==", "TWFuTWFu"])  # 3, 2, 1, 6 bytes
    m, _ = F.MaxLength(2, encoding="base64").check(b64)
    assert m.tolist() == [True, False, False, True]
    m, _ = F.MinLength(3, encoding="base64").check(b64)
    assert m.tolist() == [False, True, True, False]
    with pytest.raises(F.SpecError):
        F.Length(2, encoding="hex").lint(pa.binary())
    with pytest.raises(F.SpecError):
        F.Length(2, encoding="nope").lint(pa.string())
    # lexically invalid forms can never satisfy an exact length; XSD-legal
    # embedded spaces in base64 do not count; outer whitespace collapses
    m, _ = F.Length(1, encoding="hex").check(pa.array(["abc", "ab", " ab "]))
    assert m.tolist() == [True, False, False]
    m, _ = F.Length(3, encoding="base64").check(pa.array(["TWFu", "TWF u", "TWFuX"]))
    assert m.tolist() == [False, False, True]


def test_explicit_timezone():
    tz = pa.array([0, 1, None], type=pa.timestamp("us", tz="UTC"))
    naive = pa.array([0, 1, None], type=pa.timestamp("us"))
    m, _ = F.ExplicitTimezone("required").check(naive)
    assert m.tolist() == [True, True, False]  # nulls never fire
    m, _ = F.ExplicitTimezone("required").check(tz)
    assert not m.any()
    m, _ = F.ExplicitTimezone("prohibited").check(tz)
    assert m.tolist() == [True, True, False]
    m, _ = F.ExplicitTimezone("optional").check(naive)
    assert not m.any()
    F.ExplicitTimezone("required").lint(pa.timestamp("us", tz="UTC"))
    with pytest.raises(F.SpecError):
        F.ExplicitTimezone("required").lint(pa.timestamp("us"))
    with pytest.raises(F.SpecError):
        F.ExplicitTimezone("sometimes").lint(pa.timestamp("us"))
    with pytest.raises(F.SpecError):
        F.ExplicitTimezone("optional").lint(pa.string())


def test_struct_field_facets():
    t = pa.struct([("qty", pa.int64()), ("tag", pa.string())])
    arr = pa.array(
        [
            {"qty": 5, "tag": "ok"},
            {"qty": 50, "tag": "ok"},
            {"qty": 5, "tag": None},
            None,  # null struct never fires
        ],
        type=t,
    )
    m, reprs = F.StructField("qty", (F.MaxInclusive(10),)).check(arr)
    assert m.tolist() == [False, True, False, False]
    assert reprs[1] == "qty=50"
    m, _ = F.StructField("tag", required=True).check(arr)
    assert m.tolist() == [False, False, True, False]
    F.StructField("qty", (F.MaxInclusive(10),)).lint(t)
    with pytest.raises(F.SpecError):
        F.StructField("missing").lint(t)
    with pytest.raises(F.SpecError):
        F.StructField("qty").lint(pa.int64())
    with pytest.raises(F.SpecError):
        F.StructField("qty", (F.Pattern("x"),)).lint(t)  # facet/dtype clash
