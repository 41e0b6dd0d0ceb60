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
* ``\\p{IsBasicLatin}``-style BLOCK names — the COMPLETE XSD 1.0 block
  table (W3C Schema Part 2 / Unicode 3.1 Blocks.txt; general categories
  like ``\\p{L}`` pass through — RE2 supports them natively; block escapes
  are also expanded inside subtracted classes),
* implicit anchoring is applied by the Pattern facet, matching the
  reference's ``^(...)$`` wrapping (``validators/facets.py:585-593``).

Translated patterns are validated against the EXECUTION engine (Arrow's
RE2 kernel). Unsupported constructs raise ``SpecError`` at compile time
(the analog of the reference failing at schema build) rather than
mis-matching at scan time. Documented subset: nested subtraction of
complemented classes and ``\\P{...}``/shorthand escapes inside subtracted
classes are out of scope; surrogate blocks are omitted (meaningless over
UTF-8 Arrow strings).
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

# Complete XSD 1.0 block-escape table (W3C XML Schema Part 2 regexes
# appendix, mirroring Unicode 3.1 Blocks.txt — public data; the reference
# builds the same table from the unicodedata database,
# ``codepoints.py:126-480``). Keys are codepoint (lo, hi) bounds; the
# XSD escape form is ``Is<BlockName>`` (block name, spaces removed).
_BLOCK_RANGES = {
    "BasicLatin": (0x0000, 0x007F),
    "Latin-1Supplement": (0x0080, 0x00FF),
    "LatinExtended-A": (0x0100, 0x017F),
    "LatinExtended-B": (0x0180, 0x024F),
    "IPAExtensions": (0x0250, 0x02AF),
    "SpacingModifierLetters": (0x02B0, 0x02FF),
    "CombiningDiacriticalMarks": (0x0300, 0x036F),
    "Greek": (0x0370, 0x03FF),
    "GreekandCoptic": (0x0370, 0x03FF),
    "Cyrillic": (0x0400, 0x04FF),
    "Armenian": (0x0530, 0x058F),
    "Hebrew": (0x0590, 0x05FF),
    "Arabic": (0x0600, 0x06FF),
    "Syriac": (0x0700, 0x074F),
    "Thaana": (0x0780, 0x07BF),
    "Devanagari": (0x0900, 0x097F),
    "Bengali": (0x0980, 0x09FF),
    "Gurmukhi": (0x0A00, 0x0A7F),
    "Gujarati": (0x0A80, 0x0AFF),
    "Oriya": (0x0B00, 0x0B7F),
    "Tamil": (0x0B80, 0x0BFF),
    "Telugu": (0x0C00, 0x0C7F),
    "Kannada": (0x0C80, 0x0CFF),
    "Malayalam": (0x0D00, 0x0D7F),
    "Sinhala": (0x0D80, 0x0DFF),
    "Thai": (0x0E00, 0x0E7F),
    "Lao": (0x0E80, 0x0EFF),
    "Tibetan": (0x0F00, 0x0FFF),
    "Myanmar": (0x1000, 0x109F),
    "Georgian": (0x10A0, 0x10FF),
    "HangulJamo": (0x1100, 0x11FF),
    "Ethiopic": (0x1200, 0x137F),
    "Cherokee": (0x13A0, 0x13FF),
    "UnifiedCanadianAboriginalSyllabics": (0x1400, 0x167F),
    "Ogham": (0x1680, 0x169F),
    "Runic": (0x16A0, 0x16FF),
    "Khmer": (0x1780, 0x17FF),
    "Mongolian": (0x1800, 0x18AF),
    "LatinExtendedAdditional": (0x1E00, 0x1EFF),
    "GreekExtended": (0x1F00, 0x1FFF),
    "GeneralPunctuation": (0x2000, 0x206F),
    "SuperscriptsandSubscripts": (0x2070, 0x209F),
    "CurrencySymbols": (0x20A0, 0x20CF),
    "CombiningMarksforSymbols": (0x20D0, 0x20FF),
    "LetterlikeSymbols": (0x2100, 0x214F),
    "NumberForms": (0x2150, 0x218F),
    "Arrows": (0x2190, 0x21FF),
    "MathematicalOperators": (0x2200, 0x22FF),
    "MiscellaneousTechnical": (0x2300, 0x23FF),
    "ControlPictures": (0x2400, 0x243F),
    "OpticalCharacterRecognition": (0x2440, 0x245F),
    "EnclosedAlphanumerics": (0x2460, 0x24FF),
    "BoxDrawing": (0x2500, 0x257F),
    "BlockElements": (0x2580, 0x259F),
    "GeometricShapes": (0x25A0, 0x25FF),
    "MiscellaneousSymbols": (0x2600, 0x26FF),
    "Dingbats": (0x2700, 0x27BF),
    "BraillePatterns": (0x2800, 0x28FF),
    "CJKRadicalsSupplement": (0x2E80, 0x2EFF),
    "KangxiRadicals": (0x2F00, 0x2FDF),
    "IdeographicDescriptionCharacters": (0x2FF0, 0x2FFF),
    "CJKSymbolsandPunctuation": (0x3000, 0x303F),
    "Hiragana": (0x3040, 0x309F),
    "Katakana": (0x30A0, 0x30FF),
    "Bopomofo": (0x3100, 0x312F),
    "HangulCompatibilityJamo": (0x3130, 0x318F),
    "Kanbun": (0x3190, 0x319F),
    "BopomofoExtended": (0x31A0, 0x31BF),
    "EnclosedCJKLettersandMonths": (0x3200, 0x32FF),
    "CJKCompatibility": (0x3300, 0x33FF),
    "CJKUnifiedIdeographsExtensionA": (0x3400, 0x4DB5),
    "CJKUnifiedIdeographs": (0x4E00, 0x9FFF),
    "YiSyllables": (0xA000, 0xA48F),
    "YiRadicals": (0xA490, 0xA4CF),
    "HangulSyllables": (0xAC00, 0xD7A3),
    "PrivateUse": (0xE000, 0xF8FF),
    "CJKCompatibilityIdeographs": (0xF900, 0xFAFF),
    "AlphabeticPresentationForms": (0xFB00, 0xFB4F),
    "ArabicPresentationForms-A": (0xFB50, 0xFDFF),
    "CombiningHalfMarks": (0xFE20, 0xFE2F),
    "CJKCompatibilityForms": (0xFE30, 0xFE4F),
    "SmallFormVariants": (0xFE50, 0xFE6F),
    "ArabicPresentationForms-B": (0xFE70, 0xFEFE),
    "HalfwidthandFullwidthForms": (0xFF00, 0xFFEF),
    "Specials": (0xFFF0, 0xFFFD),
    "OldItalic": (0x10300, 0x1032F),
    "Gothic": (0x10330, 0x1034F),
    "Deseret": (0x10400, 0x1044F),
    "ByzantineMusicalSymbols": (0x1D000, 0x1D0FF),
    "MusicalSymbols": (0x1D100, 0x1D1FF),
    "MathematicalAlphanumericSymbols": (0x1D400, 0x1D7FF),
    "CJKUnifiedIdeographsExtensionB": (0x20000, 0x2A6D6),
    "CJKCompatibilityIdeographsSupplement": (0x2F800, 0x2FA1F),
    "Tags": (0xE0000, 0xE007F),
}

# Literal chr()-chr() ranges: both Python re and Arrow's RE2 accept raw
# codepoints in classes, while RE2 rejects \uXXXX/\U... escapes.
_BLOCKS = {f"Is{name}": f"{chr(lo)}-{chr(hi)}" for name, (lo, hi) in _BLOCK_RANGES.items()}


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
            if esc == "p" and i + 2 < len(body) and body[i + 2] == "{":
                close = body.find("}", i + 3)
                name = body[i + 3 : close] if close != -1 else ""
                if close != -1 and name.startswith("Is") and name[2:] in _BLOCK_RANGES:
                    lo, hi = _BLOCK_RANGES[name[2:]]
                    out.update(range(lo, hi + 1))
                    i = close + 1
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


_SUBTRACT_RE = re.compile(r"\[((?:\\.|[^\[\]\\])*)-\[((?:\\.|[^\[\]\\])*)\]\]")


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

    # \i \I \c \C shorthands and \p{IsBlock} block names, expanded with a
    # CLASS-CONTEXT-AWARE scan: inside [...] the expansion must be the bare
    # range body (a bracketed form would nest, which RE2 parses as literal
    # '['/']' and the class silently matches nothing). Negated shorthands
    # inside a class have no body form → SpecError (documented subset).
    # General categories (\p{L} etc.) pass through — RE2-native in and out
    # of classes.
    pieces: List[str] = []
    in_class = False
    i = 0
    while i < len(out):
        ch = out[i]
        if ch == "\\" and i + 1 < len(out):
            nxt = out[i + 1]
            if nxt in "iIcC":
                body = _NAME_START if nxt in "iI" else _NAME_CHAR
                neg = nxt.isupper()
                if in_class:
                    if neg:
                        raise SpecError(
                            f"\\{nxt} inside a character class is not expressible "
                            f"as a class body (negated shorthand)"
                        )
                    pieces.append(body)
                else:
                    pieces.append(("[^" if neg else "[") + body + "]")
                i += 2
                continue
            if nxt in "pP" and i + 2 < len(out) and out[i + 2] == "{":
                close = out.find("}", i + 3)
                if close == -1:
                    raise SpecError(f"unterminated \\{nxt}{{...}} in XSD pattern")
                name = out[i + 3 : close]
                if name.startswith("Is"):
                    if name not in _BLOCKS:
                        raise SpecError(f"unsupported Unicode block {name!r} in XSD pattern")
                    rng = _BLOCKS[name]
                    neg = nxt == "P"
                    if in_class:
                        if neg:
                            raise SpecError(
                                f"\\P{{{name}}} inside a character class is not "
                                f"expressible as a class body"
                            )
                        pieces.append(rng)
                    else:
                        pieces.append(("[^" if neg else "[") + rng + "]")
                else:
                    pieces.append(out[i : close + 1])  # RE2-native category
                i = close + 1
                continue
            pieces.append(out[i : i + 2])
            i += 2
            continue
        if ch == "[" and not in_class:
            in_class = True
        elif ch == "]" and in_class:
            in_class = False
        pieces.append(ch)
        i += 1
    out = "".join(pieces)

    # validate against the ENGINE that will run the facet — Arrow's RE2
    # kernel — not Python re (re lacks \p{...} categories, RE2 lacks
    # backreferences; only RE2's verdict matters at scan time)
    try:
        import pyarrow as pa
        import pyarrow.compute as pc

        # one-element array: the kernel skips regex compilation entirely on
        # empty input, so an empty probe would never surface syntax errors
        pc.match_substring_regex(pa.array([""], type=pa.string()), "^(?:" + out + ")$")
    except pa.ArrowInvalid as e:
        raise SpecError(f"XSD pattern {pattern!r} translated to invalid regex {out!r}: {e}") from e
    return out
