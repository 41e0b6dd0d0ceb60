"""XSD 1.0 regular-expression → RE2/Python translation (subset).

The reference ships a full XSD-regex translator
(``/root/reference/xmlschema/regex.py:249-357`` ``get_python_regex``, char
groups ``regex.py:93-247``, Unicode subset algebra
``codepoints.py:126-480``). This module re-implements the parts that matter
for tabular pattern facets, translating at SPEC-COMPILE time (the facet
then runs as an anchored ``pc.match_substring_regex``, which is RE2):

* ``\\i`` / ``\\I`` — XML name-start chars (and complement),
* ``\\c`` / ``\\C`` — XML name chars (and complement),
* character-class subtraction ``[a-z-[aeiou]]`` → expanded literal class,
* ``\\p{IsBasicLatin}``-style BLOCK names for a table of common blocks
  (general categories like ``\\p{L}`` pass through — RE2 supports them),
* implicit anchoring is applied by the Pattern facet, matching the
  reference's ``^(...)$`` wrapping (``validators/facets.py:585-593``).

Unsupported constructs raise ``SpecError`` at compile time (the analog of
the reference failing at schema build) rather than mis-matching at scan
time. This is a documented subset: full Unicode block tables and nested
subtraction of complemented classes are out of scope.
"""

from __future__ import annotations

import re
from typing import List, Set

from xmlschema_ray.constraints.facets import SpecError

# Simplified XML 1.0 NameStartChar / NameChar classes (W3C XML spec
# production 4/4a; the reference builds the exact sets from codepoint
# tables, ``regex.py:93-247``).
_NAME_START = (
    "A-Za-z_:\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u02FF\u0370-\u037D"
    "\u037F-\u1FFF\u200C-\u200D\u2070-\u218F\u2C00-\u2FEF\u3001-\uD7FF"
    "\uF900-\uFDCF\uFDF0-\uFFFD"
)
_NAME_CHAR = _NAME_START + "\\-.0-9\u00B7\u0300-\u036F\u203F-\u2040"

_BLOCKS = {
    "IsBasicLatin": "\u0000-\u007F",
    "IsLatin-1Supplement": "\u0080-\u00FF",
    "IsLatinExtended-A": "\u0100-\u017F",
    "IsLatinExtended-B": "\u0180-\u024F",
    "IsGreek": "\u0370-\u03FF",
    "IsCyrillic": "\u0400-\u04FF",
    "IsHebrew": "\u0590-\u05FF",
    "IsArabic": "\u0600-\u06FF",
    "IsCJKUnifiedIdeographs": "\u4E00-\u9FFF",
    "IsHiragana": "\u3040-\u309F",
    "IsKatakana": "\u30A0-\u30FF",
}


def _expand_class_body(body: str) -> Set[int]:
    """Expand a (non-negated, subtraction-free) class body to codepoints."""
    out: Set[int] = set()
    i = 0
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            esc = body[i + 1]
            simple = {"n": "\n", "r": "\r", "t": "\t", "\\": "\\", "-": "-", "]": "]", "[": "[", ".": "."}
            if esc in simple:
                out.add(ord(simple[esc]))
                i += 2
                continue
            raise SpecError(f"cannot expand escape \\{esc} inside subtracted class")
        if i + 2 < len(body) and body[i + 1] == "-" and body[i + 2] != "[":
            lo, hi = ord(ch), ord(body[i + 2])
            if lo > hi:
                raise SpecError(f"bad range {ch}-{body[i + 2]}")
            out.update(range(lo, hi + 1))
            i += 3
            continue
        out.add(ord(ch))
        i += 1
    return out


def _codepoints_to_class(points: Set[int]) -> str:
    """Codepoint set → compact char-class string with ranges."""
    if not points:
        raise SpecError("character-class subtraction produced an empty class")
    sorted_pts = sorted(points)
    parts: List[str] = []
    start = prev = sorted_pts[0]
    for p in sorted_pts[1:] + [None]:
        if p is not None and p == prev + 1:
            prev = p
            continue
        lo, hi = start, prev
        def esc(c):
            ch = chr(c)
            return "\\" + ch if ch in r"\^]-[" else ch
        parts.append(esc(lo) if lo == hi else f"{esc(lo)}-{esc(hi)}")
        if p is not None:
            start = prev = p
    return "[" + "".join(parts) + "]"


_SUBTRACT_RE = re.compile(r"\[([^\[\]\\]*)-\[([^\[\]\\]*)\]\]")


def translate_xsd_regex(pattern: str) -> str:
    """Translate an XSD regex to an RE2-compatible pattern (unanchored —
    the Pattern facet anchors with ``^(?:...)$`` like the reference)."""
    # class subtraction first (innermost, repeat until fixpoint)
    prev = None
    out = pattern
    while prev != out:
        prev = out

        def sub(m: "re.Match") -> str:
            base = _expand_class_body(m.group(1))
            minus = _expand_class_body(m.group(2))
            return _codepoints_to_class(base - minus)

        out = _SUBTRACT_RE.sub(sub, out)

    # \i \I \c \C shorthands
    out = re.sub(r"(?<!\\)\\i", f"[{_NAME_START}]", out)
    out = re.sub(r"(?<!\\)\\I", f"[^{_NAME_START}]", out)
    out = re.sub(r"(?<!\\)\\c", f"[{_NAME_CHAR}]", out)
    out = re.sub(r"(?<!\\)\\C", f"[^{_NAME_CHAR}]", out)

    # \p{IsBlock} block names → literal ranges (categories pass through)
    def block_sub(m: "re.Match") -> str:
        name = m.group(2)
        if name.startswith("Is"):
            if name not in _BLOCKS:
                raise SpecError(f"unsupported Unicode block {name!r} in XSD pattern")
            rng = _BLOCKS[name]
            return f"[^{rng}]" if m.group(1) == "P" else f"[{rng}]"
        return m.group(0)  # general category: RE2-native

    out = re.sub(r"\\([pP])\{([A-Za-z0-9-]+)\}", block_sub, out)

    try:
        re.compile(out)
    except re.error as e:
        raise SpecError(f"XSD pattern {pattern!r} translated to invalid regex {out!r}: {e}") from e
    return out
