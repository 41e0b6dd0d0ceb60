"""New facet kinds + XSD-regex translation."""

import pandas as pd
import pyarrow as pa
import pytest

from xmlschema_ray.constraints import facets as F
from xmlschema_ray.constraints.xsd_regex import translate_xsd_regex
from xmlschema_ray.functions.text import normalize_whitespace


def test_whitespace_facet():
    s = pa.array(["ok value", "has\ttab", " leading", "double  space", None])
    m, _ = F.WhiteSpace("collapse").check(s)
    assert m.tolist() == [False, True, True, True, False]
    m, _ = F.WhiteSpace("replace").check(s)
    assert m.tolist() == [False, True, False, False, False]


def test_normalize_whitespace_op():
    s = pd.Series(["a\tb", "  x  y  ", "ok"])
    assert normalize_whitespace(s, "replace").tolist() == ["a b", "  x  y  ", "ok"]
    assert normalize_whitespace(s, "collapse").tolist() == ["a b", "x y", "ok"]


def test_total_digits_matches_reference_rule():
    # reference rule: digits of str(x).strip('0') (facets.py:421-423)
    arr = pa.array([45.0, 123.45, 0.05, 1000.0], type=pa.float64())
    m, _ = F.TotalDigits(3).check(arr)
    # '45.0'->2, '123.45'->5, '0.05'->2 ('.05'), '1000.0'->4 ('1000.')
    assert m.tolist() == [False, True, False, True]


def test_fraction_digits():
    arr = pa.array([45.0, 1.23, 0.125, None], type=pa.float64())
    m, _ = F.FractionDigits(2).check(arr)
    assert m.tolist() == [False, False, True, False]
    with pytest.raises(F.SpecError):
        F.FractionDigits(2).lint(pa.int32())  # nonzero on integer-derived


def test_union_facet():
    # value valid if it matches doc-pattern OR is in the legacy enum
    s = pa.array(["doc-0123456789ab", "LEGACY-1", "nope"])
    u = F.UnionFacets(
        (
            (F.Pattern(r"doc-[0-9a-f]{12}"),),
            (F.Enumeration(("LEGACY-1", "LEGACY-2")),),
        )
    )
    m, _ = u.check(s)
    assert m.tolist() == [False, False, True]


def test_xsd_regex_name_classes():
    p = translate_xsd_regex(r"\i\c*")
    import re

    rx = re.compile(f"^(?:{p})$")
    assert rx.match("name")
    assert rx.match("_n-a.me")
    assert not rx.match("1bad")


def test_xsd_regex_class_subtraction():
    p = translate_xsd_regex(r"[a-z-[aeiou]]+")
    import re

    rx = re.compile(f"^(?:{p})$")
    assert rx.match("bcdfg")
    assert not rx.match("cab")


def test_xsd_regex_blocks_and_errors():
    p = translate_xsd_regex(r"\p{IsBasicLatin}+")
    import re

    assert re.compile(f"^(?:{p})$").match("abc123")
    with pytest.raises(F.SpecError):
        translate_xsd_regex(r"\p{IsNoSuchBlock}+")


def test_pattern_facet_xsd_mode():
    f = F.Pattern(r"[a-c-[b]]+", xsd=True)
    f.lint(pa.string())
    m, _ = f.check(pa.array(["aacc", "abc"]))
    assert m.tolist() == [False, True]

def _re2_full_match(pattern: str, values):
    import pyarrow.compute as pc

    return pc.match_substring_regex(pa.array(values), f"^(?:{pattern})$").to_pylist()


def test_xsd_regex_full_block_table():
    # complete W3C XSD 1.0 block table: blocks well beyond the old 11-entry
    # subset resolve, including supplementary-plane blocks
    assert _re2_full_match(translate_xsd_regex(r"\p{IsThai}+"), ["สวัสดี", "abc"]) == [True, False]
    assert _re2_full_match(translate_xsd_regex(r"\p{IsGothic}"), ["\U00010330", "a"]) == [True, False]
    assert _re2_full_match(translate_xsd_regex(r"\P{IsThai}+"), ["abc", "สวัสดี"]) == [True, False]
    from xmlschema_ray.constraints.xsd_regex import _BLOCKS

    assert len(_BLOCKS) > 90


def test_xsd_regex_category_passthrough_to_re2():
    # \p{L} is invalid in Python re but native in RE2 — translation must
    # validate against the execution engine, not re.compile
    p = translate_xsd_regex(r"\p{L}+")
    assert _re2_full_match(p, ["héllo", "h1"]) == [True, False]


def test_xsd_regex_block_inside_subtraction():
    p = translate_xsd_regex(r"[\p{IsBasicLatin}-[aeiou]]+")
    assert _re2_full_match(p, ["xyz", "ae"]) == [True, False]


def test_xsd_regex_invalid_syntax_raises_at_compile():
    for bad in [r"(unclosed", r"a{2,1}"]:
        with pytest.raises(F.SpecError):
            translate_xsd_regex(bad)


def test_xsd_regex_blocks_inside_classes():
    # expansion inside [...] must be the bare range body — a nested
    # bracket form is parsed by RE2 as literal '['/']' and matches nothing
    p = translate_xsd_regex(r"[\p{IsHebrew}\p{IsArabic}]+")
    assert _re2_full_match(p, ["שלום", "سلام", "abc"]) == [True, True, False]
    assert _re2_full_match(translate_xsd_regex(r"[\i@]+"), ["name@x", "1bad"]) == [True, False]
    assert _re2_full_match(translate_xsd_regex(r"[^\p{IsThai}]+"), ["abc", "สวัสดี"]) == [
        True,
        False,
    ]
    assert _re2_full_match(translate_xsd_regex(r"[\p{L}0-9]+"), ["héllo9", "!"]) == [True, False]
    # complemented members inside classes now expand via interval algebra
    assert _re2_full_match(translate_xsd_regex(r"[\P{IsThai}]"), ["a", "ส"]) == [True, False]
    assert _re2_full_match(translate_xsd_regex(r"[\I]"), ["1", "a"]) == [True, False]
    assert _re2_full_match(translate_xsd_regex(r"[\C]"), ["!", "a"]) == [True, False]


def test_xsd_regex_interval_algebra():
    """General subset algebra: nested/negated subtraction, complemented
    shorthand + block-complement class members (reference
    codepoints.py:126-480 UnicodeSubset semantics)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def m(p, vals):
        t = translate_xsd_regex(p)
        return pc.match_substring_regex(pa.array(vals), f"^(?:{t})$").to_pylist()

    assert m(r"[a-z-[m-p-[n]]]+", ["an", "am"]) == [True, False]
    assert m(r"[^a-z-[A-Z]]+", ["0!", "A", "a"]) == [True, False, False]
    assert m(r"[\S-[x]]+", ["ab", "x", "a b"]) == [True, False, False]
    assert m(r"[\P{IsThai}]+", ["abc", "สวัสดี"]) == [True, False]
    assert m(r"[\w]+", ["héllo9", "a,b"]) == [True, False]


def test_xsd_regex_spec_shorthand_semantics():
    """\\d/\\s/\\w carry the XSD App. F definitions (reference
    regex.py:59-90), not RE2's ASCII defaults."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def m(p, vals):
        t = translate_xsd_regex(p)
        return pc.match_substring_regex(pa.array(vals), f"^(?:{t})$").to_pylist()

    assert m(r"\d+", ["123", "١٢٣", "a1"]) == [True, True, False]  # Nd, not [0-9]
    assert m(r"a\sb", ["a b", "a\fb"]) == [True, False]  # \f not in XSD \s
    assert m(r"\W+", ["., !", "ab"]) == [True, False]
    with pytest.raises(F.SpecError):
        translate_xsd_regex(r"\p{Greek}+")  # scripts: not XSD


def test_unicode_subset_algebra():
    """Public UnicodeSubset (codepoints.py:126-480 analog): construction
    from class bodies / intervals / categories / blocks; union, intersect,
    subtract, complement; membership, iteration, re-emission as an RE2
    class that a Pattern facet accepts."""
    import pyarrow as pa

    from xmlschema_ray.constraints import facets as F
    from xmlschema_ray.constraints.xsd_regex import UnicodeSubset

    a = UnicodeSubset("a-z")
    v = UnicodeSubset("aeiou")
    cons = a - v
    assert len(cons) == 21 and "b" in cons and "a" not in cons
    assert set("bcd") < set(map(chr, cons))

    # complement round-trips
    assert ~(~cons) == cons
    # algebra identities
    assert (cons | v) == a
    assert (a & v) == v
    assert len(a & ~a) == 0

    nd = UnicodeSubset.category("Nd")
    assert "7" in nd and "x" not in nd
    th = UnicodeSubset.block("Thai")
    assert 0x0E01 in th and "A" not in th

    # emitted class drives a real Pattern facet end-to-end
    pat = F.Pattern(f"{cons.to_class()}+")
    mask, _ = pat.check(pa.chunked_array([pa.array(["bcd", "tree", "xyz"])]))
    assert mask.tolist() == [False, True, False]

    # intervals constructor + containment by codepoint
    s = UnicodeSubset([(0x30, 0x39), 0x41])
    assert 0x35 in s and "A" in s and "B" not in s and len(s) == 11


def test_unique_items_facet():
    """Row-scoped identity (xs:ID-in-scope / uniqueItems): duplicates
    within one row fire, across rows don't; null items have no identity;
    null/empty lists never fire; serde round-trips; lint rejects non-lists."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from xmlschema_ray.constraints.facets import SpecError, UniqueItems
    from xmlschema_ray.constraints.serde import facet_from_json, facet_to_json

    f = UniqueItems()
    arr = pa.array(
        [[1, 2, 3], [4, 4], [5, None, None], [], None, [6, 7, 6, 6]],
        type=pa.list_(pa.int64()),
    )
    viol, reprs = f.check(arr)
    assert viol.tolist() == [False, True, False, False, False, True]
    assert "4" in reprs[1] and "6" in reprs[5]
    # string items + cross-row same value is NOT a duplicate
    sarr = pa.array([["a", "b"], ["a", "c"], ["x", "x"]], type=pa.list_(pa.string()))
    v2, _ = f.check(sarr)
    assert v2.tolist() == [False, False, True]
    # sliced array (offsets not starting at 0)
    v3, _ = f.check(arr.slice(1, 5))
    assert v3.tolist() == [True, False, False, False, True]
    # serde + lint
    assert facet_from_json(facet_to_json(f)) == f
    with pytest.raises(SpecError, match="uniqueItems"):
        f.lint(pa.int64())
    f.lint(pa.list_(pa.string()))
