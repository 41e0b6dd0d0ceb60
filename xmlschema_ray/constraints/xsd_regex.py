"""XSD 1.0 regular-expression → RE2/Python translation (subset).

The reference ships a full XSD-regex translator
(``/root/reference/xmlschema/regex.py:249-357`` ``get_python_regex``, char
groups ``regex.py:93-247``, Unicode subset algebra
``codepoints.py:126-480``). This module re-implements the parts that matter
for tabular pattern facets, translating at SPEC-COMPILE time (the facet
then runs as an anchored ``pc.match_substring_regex``, which is RE2):

* ``\\i`` / ``\\I`` — XML name-start chars (and complement),
* ``\\c`` / ``\\C`` — XML name chars (and complement),
* multi-character escapes with their XSD-SPEC definitions (App. F /
  reference ``CHARACTER_ESCAPES``, ``regex.py:59-90``): ``\\d = \\p{Nd}``,
  ``\\s = [#x20\\t\\n\\r]``, ``\\w = [^\\p{P}\\p{Z}\\p{C}]`` and their
  complements — NOT RE2's ASCII defaults,
* general character-class ALGEBRA via codepoint-interval sets (the
  reference's ``UnicodeSubset``, ``codepoints.py:126-480``): subtraction
  ``[a-z-[aeiou]]`` incl. nested operands ``[a-z-[m-p-[n]]]`` and negated
  bases ``[^...-[...]]``, complemented shorthands and block complements as
  class MEMBERS (``[\\S-[x]]``, ``[\\P{IsThai}]``) — combined exactly and
  re-emitted as one literal class,
* ``\\p{IsBasicLatin}``-style BLOCK names — the COMPLETE XSD 1.0 block
  table (W3C Schema Part 2 / Unicode 3.1 Blocks.txt; general categories
  like ``\\p{L}`` pass through — RE2 supports them natively; unknown
  category names are rejected at compile),
* implicit anchoring is applied by the Pattern facet, matching the
  reference's ``^(...)$`` wrapping (``validators/facets.py:585-593``).

Translated patterns are validated against the EXECUTION engine (Arrow's
RE2 kernel). Unsupported constructs raise ``SpecError`` at compile time
(the analog of the reference failing at schema build) rather than
mis-matching at scan time. Remaining documented subset: surrogate
codepoints are dropped at class emission (meaningless over UTF-8 Arrow
strings); script names (``\\p{Greek}``) are rejected (XSD defines only
categories and blocks).
"""

from __future__ import annotations

from typing import List

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


# ---- general Unicode subset algebra (interval lists) -------------------
#
# The reference's ``UnicodeSubset`` (``codepoints.py:218-480``) represents
# character groups as sorted codepoint intervals with union / subtraction /
# complement; this is the same algebra, kept to exactly the operations the
# XSD charClassExpr grammar needs. Intervals are sorted, disjoint,
# inclusive ``[lo, hi]`` pairs over U+0000..U+10FFFF.

_MAX_CP = 0x10FFFF
# Surrogates can't be encoded in the UTF-8 the RE2 kernel sees, so they are
# dropped at EMISSION time only (complements still compute over the full
# range, matching the reference's integer algebra).
_NON_SURROGATE = [[0x0, 0xD7FF], [0xE000, _MAX_CP]]


def _norm(pairs: List[List[int]]) -> List[List[int]]:
    ivs = sorted([lo, hi] for lo, hi in pairs if lo <= hi)
    out: List[List[int]] = []
    for lo, hi in ivs:
        if out and lo <= out[-1][1] + 1:
            if hi > out[-1][1]:
                out[-1][1] = hi
        else:
            out.append([lo, hi])
    return out


def _complement(ivs: List[List[int]]) -> List[List[int]]:
    out: List[List[int]] = []
    prev = 0
    for lo, hi in _norm(ivs):
        if lo > prev:
            out.append([prev, lo - 1])
        prev = hi + 1
    if prev <= _MAX_CP:
        out.append([prev, _MAX_CP])
    return out


def _intersect(a: List[List[int]], b: List[List[int]]) -> List[List[int]]:
    out: List[List[int]] = []
    i = j = 0
    a, b = _norm(a), _norm(b)
    while i < len(a) and j < len(b):
        lo = max(a[i][0], b[j][0])
        hi = min(a[i][1], b[j][1])
        if lo <= hi:
            out.append([lo, hi])
        if a[i][1] < b[j][1]:
            i += 1
        else:
            j += 1
    return out


def _subtract(a: List[List[int]], b: List[List[int]]) -> List[List[int]]:
    return _intersect(a, _complement(b))


_CATEGORY_IV: dict | None = None


def _category_intervals() -> dict:
    """{two-letter Unicode category: interval list}, built lazily from one
    run-length scan of ``unicodedata`` (the reference ships the same data
    pre-generated, ``unicode_categories.json`` via ``codepoints.py``).
    Only patterns that need set algebra over categories pay the one-time
    ~1 s scan, cached per process (per actor, in ``__init__``-compiled
    specs)."""
    global _CATEGORY_IV
    if _CATEGORY_IV is None:
        import unicodedata

        cats: dict = {}
        run_cat = None
        run_start = 0
        for cp in range(_MAX_CP + 1):
            c = unicodedata.category(chr(cp))
            if c != run_cat:
                if run_cat is not None:
                    cats.setdefault(run_cat, []).append([run_start, cp - 1])
                run_cat, run_start = c, cp
        cats.setdefault(run_cat, []).append([run_start, _MAX_CP])
        _CATEGORY_IV = cats
    return _CATEGORY_IV


def _cat_set(name: str) -> List[List[int]]:
    """Interval set for a general category ('Nd') or category group ('L')."""
    cats = _category_intervals()
    if name in cats:
        return [list(p) for p in cats[name]]
    if len(name) == 1:
        ivs = [list(p) for k, v in cats.items() if k[0] == name for p in v]
        if ivs:
            return _norm(ivs)
    raise SpecError(f"unknown Unicode category {name!r} in XSD pattern")


def _class_body_to_iv(body: str) -> List[List[int]]:
    """Parse a bare class BODY (no brackets / negation / subtraction) into
    intervals — used for the \\i / \\c literal range tables."""
    ivs, i = [], 0
    while i < len(body):
        cp, multi, i = _parse_item(body, i)
        if multi is not None:
            ivs.extend(multi)
            continue
        if i + 1 < len(body) and body[i] == "-" and body[i + 1] != "[":
            cp2, m2, i = _parse_item(body, i + 1)
            if m2 is not None or cp > cp2:
                raise SpecError(f"bad range in class body {body!r}")
            ivs.append([cp, cp2])
        else:
            ivs.append([cp, cp])
    return _norm(ivs)


def _shorthand_set(letter: str) -> List[List[int]]:
    """XSD multi-character-escape sets (W3C Schema Part 2 App. F; the
    reference's ``CHARACTER_ESCAPES`` table, ``regex.py:59-90``):
    \\s = [#x20\\t\\n\\r], \\d = \\p{Nd}, \\w = [^\\p{P}\\p{Z}\\p{C}]."""
    if letter == "s":
        return [[0x9, 0xA], [0xD, 0xD], [0x20, 0x20]]
    if letter == "d":
        return _cat_set("Nd")
    if letter == "w":
        return _complement(_norm(_cat_set("P") + _cat_set("Z") + _cat_set("C")))
    if letter == "i":
        return _class_body_to_iv(_NAME_START)
    if letter == "c":
        return _class_body_to_iv(_NAME_CHAR)
    raise SpecError(f"unknown shorthand \\{letter}")


def _pname_set(name: str) -> List[List[int]]:
    if name.startswith("Is"):
        if name[2:] not in _BLOCK_RANGES:
            raise SpecError(f"unsupported Unicode block {name!r} in XSD pattern")
        lo, hi = _BLOCK_RANGES[name[2:]]
        return [[lo, hi]]
    return _cat_set(name)


_SIMPLE_ESCAPES = {
    "n": "\n", "r": "\r", "t": "\t", "\\": "\\", "|": "|", ".": ".", "-": "-",
    "^": "^", "?": "?", "*": "*", "+": "+", "{": "{", "}": "}", "(": "(",
    ")": ")", "[": "[", "]": "]",
}


def _parse_item(s: str, i: int):
    """One class member at ``s[i]`` → (codepoint, None, next_i) for a
    single char or (None, intervals, next_i) for a multi-char escape."""
    ch = s[i]
    if ch == "\\":
        if i + 1 >= len(s):
            raise SpecError("dangling backslash in character class")
        e = s[i + 1]
        if e in _SIMPLE_ESCAPES:
            return ord(_SIMPLE_ESCAPES[e]), None, i + 2
        if e in "sSdDwWiIcC":
            iv = _shorthand_set(e.lower())
            if e.isupper():
                iv = _complement(iv)
            return None, iv, i + 2
        if e in "pP" and i + 2 < len(s) and s[i + 2] == "{":
            close = s.find("}", i + 3)
            if close == -1:
                raise SpecError(f"unterminated \\{e}{{...}} in XSD pattern")
            iv = _pname_set(s[i + 3 : close])
            if e == "P":
                iv = _complement(iv)
            return None, iv, close + 1
        raise SpecError(f"unsupported escape \\{e} in character class")
    return ord(ch), None, i + 1


def _parse_class(s: str, i: int):
    """Parse a full charClassExpr ``[ ^? body ( - charClassExpr )? ]``
    starting at ``s[i] == '['`` → (intervals, index after ']'). Handles
    negation, nested subtraction, and every escape ``_parse_item`` knows —
    the general form of the reference's ``XsdRegexCharGroup`` parse
    (``regex.py:93-247``)."""
    i += 1
    neg = i < len(s) and s[i] == "^"
    if neg:
        i += 1
    ivs: List[List[int]] = []
    while True:
        if i >= len(s):
            raise SpecError("unterminated character class in XSD pattern")
        ch = s[i]
        if ch == "]":
            i += 1
            break
        if ch == "-" and i + 1 < len(s) and s[i + 1] == "[":
            sub, j = _parse_class(s, i + 1)
            if j >= len(s) or s[j] != "]":
                raise SpecError("character-class subtraction must end the class")
            base = _complement(_norm(ivs)) if neg else _norm(ivs)
            return _subtract(base, sub), j + 1
        cp, multi, i = _parse_item(s, i)
        if multi is not None:
            ivs.extend(multi)
            continue
        if i + 1 < len(s) and s[i] == "-" and s[i + 1] not in "][":
            cp2, m2, i = _parse_item(s, i + 1)
            if m2 is not None or cp > cp2:
                raise SpecError("bad range in character class")
            ivs.append([cp, cp2])
        else:
            ivs.append([cp, cp])
    base = _norm(ivs)
    return (_complement(base) if neg else base), i


def _iv_to_class(ivs: List[List[int]]) -> str:
    """Interval set → compact RE2 char-class string (raw codepoints —
    RE2 rejects \\uXXXX escapes; surrogates dropped at emission)."""
    ivs = _intersect(ivs, _NON_SURROGATE)
    if not ivs:
        raise SpecError("character-class subtraction produced an empty class")

    def esc(c: int) -> str:
        ch = chr(c)
        return "\\" + ch if ch in r"\^]-[" else ch

    parts = [esc(lo) if lo == hi else f"{esc(lo)}-{esc(hi)}" for lo, hi in ivs]
    return "[" + "".join(parts) + "]"


def _class_extent(s: str, start: int) -> int:
    """Index just past the ']' closing the class opened at ``s[start]``,
    counting nested subtraction brackets and skipping escapes."""
    depth = 0
    i = start
    while i < len(s):
        ch = s[i]
        if ch == "\\":
            i += 2
            continue
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise SpecError("unterminated character class in XSD pattern")


# Valid XSD general-category names (W3C Schema Part 2 App. F table; 'Cn'
# included — "not assigned" is a queryable category).
_CATEGORY_NAMES = frozenset(
    "L Lu Ll Lt Lm Lo M Mn Mc Me N Nd Nl No P Pc Pd Ps Pe Pi Pf Po "
    "S Sm Sc Sk So Z Zs Zl Zp C Cc Cf Co Cn".split()
)


def _category_names() -> frozenset:
    return _CATEGORY_NAMES


def _needs_algebra(body: str) -> bool:
    """Does this class (full '[...]' text) need interval-set algebra —
    subtraction, a complemented shorthand member (\\S \\w \\I \\C), or a
    block complement (\\P{Is...})? Escape-aware scan; anything textual
    (\\s \\d \\W \\i \\c \\p{...}, \\P{category}) stays on the cheap path."""
    i = 1
    while i < len(body):
        ch = body[i]
        if ch == "\\":
            nxt = body[i + 1] if i + 1 < len(body) else ""
            if nxt in "SwIC":
                return True
            if nxt == "P" and body[i + 2 : i + 3] == "{" and body[i + 3 : i + 5] == "Is":
                return True
            i += 2
            continue
        if ch == "-" and i + 1 < len(body) and body[i + 1] == "[":
            return True
        i += 1
    return False


def translate_xsd_regex(pattern: str) -> str:
    """Translate an XSD regex to an RE2-compatible pattern (unanchored —
    the Pattern facet anchors with ``^(?:...)$`` like the reference).

    Classes involving set ALGEBRA — subtraction (incl. nested / negated
    operands), complemented shorthands (``\\S \\w \\I \\C``) or block
    complements (``\\P{Is...}``) as members — are parsed into codepoint
    intervals, combined exactly, and re-emitted as one literal class.
    Everything else translates textually: ``\\i \\c \\p{IsBlock}`` expand
    to literal ranges; ``\\d → \\p{Nd}``, ``\\s → [#x20\\t\\n\\r]``,
    ``\\w → [^\\p{P}\\p{Z}\\p{C}]`` (and their complements) take their
    XSD-spec definitions (the reference's ``CHARACTER_ESCAPES``,
    ``regex.py:59-90``) rather than RE2's ASCII defaults; general
    categories ``\\p{L}`` pass through (RE2-native)."""
    # Phase 1: classes needing interval algebra → exact literal classes.
    pieces: List[str] = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            pieces.append(pattern[i : i + 2])
            i += 2
            continue
        if ch == "[":
            end = _class_extent(pattern, i)
            body = pattern[i:end]
            if _needs_algebra(body):
                ivs, j = _parse_class(pattern, i)
                if j != end:
                    raise SpecError(f"malformed character class {body!r}")
                pieces.append(_iv_to_class(ivs))
            else:
                pieces.append(body)
            i = end
            continue
        pieces.append(ch)
        i += 1
    out = "".join(pieces)

    # Phase 2: textual escape translation with a CLASS-CONTEXT-AWARE scan:
    # inside [...] expansions must be bare range bodies (a bracketed form
    # would nest, which RE2 parses as literal '['/']' and the class
    # silently matches nothing).
    pieces = []
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
                    # negated shorthand members were routed to phase 1
                    pieces.append(body)
                else:
                    pieces.append(("[^" if neg else "[") + body + "]")
                i += 2
                continue
            if nxt == "d" or nxt == "D":
                # XSD \d is \p{Nd} (all decimal digits), not RE2's ASCII
                # [0-9]; \p/\P{Nd} is RE2-native in and out of classes
                pieces.append("\\p{Nd}" if nxt == "d" else "\\P{Nd}")
                i += 2
                continue
            if nxt == "s" or nxt == "S":
                if in_class:  # \S member routed to phase 1
                    pieces.append(" \\t\\n\\r")
                else:
                    pieces.append("[ \\t\\n\\r]" if nxt == "s" else "[^ \\t\\n\\r]")
                i += 2
                continue
            if nxt == "w" or nxt == "W":
                if in_class:  # \w member routed to phase 1
                    pieces.append("\\p{P}\\p{Z}\\p{C}")
                else:
                    pieces.append(
                        "[^\\p{P}\\p{Z}\\p{C}]" if nxt == "w" else "[\\p{P}\\p{Z}\\p{C}]"
                    )
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
                        # \P{Is...} members were routed to phase 1
                        pieces.append(rng)
                    else:
                        pieces.append(("[^" if neg else "[") + rng + "]")
                else:
                    if name not in _category_names():
                        raise SpecError(f"unknown Unicode category {name!r} in XSD pattern")
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


class UnicodeSubset:
    """General codepoint-set algebra — the PUBLIC form of the interval
    machinery above (the reference's ``UnicodeSubset``,
    ``codepoints.py:126-480``, same operator surface: ``|  &  -  ~  in``,
    iteration, length).

    Construct from a class BODY string (anything a bracketed XSD class
    accepts: ranges, multi-char escapes, ``\\p{...}`` categories/blocks),
    an iterable of codepoints / ``(lo, hi)`` intervals, or another subset.
    ``to_class()`` re-emits the set as one literal RE2 character class —
    the bridge into a ``Pattern`` facet for custom classes XSD syntax
    can't express directly.
    """

    __slots__ = ("_ivs",)

    def __init__(self, arg=None):
        if arg is None:
            self._ivs: List[List[int]] = []
        elif isinstance(arg, UnicodeSubset):
            self._ivs = [iv[:] for iv in arg._ivs]
        elif isinstance(arg, str):
            self._ivs = _class_body_to_iv(arg)
        else:
            pairs = []
            for item in arg:
                if isinstance(item, int):
                    pairs.append([item, item])
                else:
                    lo, hi = item
                    pairs.append([int(lo), int(hi)])
            self._ivs = _norm(pairs)

    @classmethod
    def from_intervals(cls, ivs) -> "UnicodeSubset":
        return cls(ivs)

    @classmethod
    def category(cls, name: str) -> "UnicodeSubset":
        """Unicode general category (``Nd``, ``L``, ...)."""
        s = cls()
        s._ivs = _cat_set(name)
        return s

    @classmethod
    def block(cls, name: str) -> "UnicodeSubset":
        """XSD block name (``BasicLatin``, ``IsThai`` with or without the
        ``Is`` prefix)."""
        s = cls()
        s._ivs = _pname_set(name if name.startswith("Is") else "Is" + name)
        return s

    # -- algebra (each returns a NEW normalized subset) -------------------
    def __or__(self, other: "UnicodeSubset") -> "UnicodeSubset":
        s = UnicodeSubset()
        s._ivs = _norm(self._ivs + other._ivs)
        return s

    def __and__(self, other: "UnicodeSubset") -> "UnicodeSubset":
        s = UnicodeSubset()
        s._ivs = _intersect(self._ivs, other._ivs)
        return s

    def __sub__(self, other: "UnicodeSubset") -> "UnicodeSubset":
        s = UnicodeSubset()
        s._ivs = _subtract(self._ivs, other._ivs)
        return s

    def __invert__(self) -> "UnicodeSubset":
        s = UnicodeSubset()
        s._ivs = _complement(self._ivs)
        return s

    # -- membership / size / iteration ------------------------------------
    def __contains__(self, cp) -> bool:
        if isinstance(cp, str):
            cp = ord(cp)
        import bisect

        i = bisect.bisect_right([iv[0] for iv in self._ivs], cp) - 1
        return i >= 0 and cp <= self._ivs[i][1]

    def __len__(self) -> int:
        return sum(hi - lo + 1 for lo, hi in self._ivs)

    def __iter__(self):
        for lo, hi in self._ivs:
            yield from range(lo, hi + 1)

    def __eq__(self, other) -> bool:
        return isinstance(other, UnicodeSubset) and self._ivs == other._ivs

    def __repr__(self) -> str:
        return f"UnicodeSubset({len(self._ivs)} intervals, {len(self)} codepoints)"

    def intervals(self) -> List[List[int]]:
        return [iv[:] for iv in self._ivs]

    def to_class(self) -> str:
        """One literal RE2 character class matching exactly this set
        (surrogates dropped at emission — un-encodable in the UTF-8 the
        Arrow RE2 kernel sees). Raises on the empty set."""
        return _iv_to_class(self._ivs)
