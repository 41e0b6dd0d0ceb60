"""Vectorized text-analysis functions for training-data pipelines.

The scalar-function-library analog of the reference's lexical layer
(whitespace normalization ``validators/simple_types.py:310-328``, regex
facets ``facets.py:564-628``), extended with the operations a large-scale
training-data pipeline needs (north-rule mandate; no reference analog):
language-ID, quality scoring, token counting, document fingerprinting.

All functions are batch-vectorized (pandas str kernels / numpy); patterns
are compiled at import time — per-actor, once — like the reference compiles
regexes at schema build (``facets.py:585-593``).
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np
import pandas as pd

from xmlschema_ray.engine.stats import hash64

WS_TOKEN = re.compile(r"\S+")
# A GPT2-style BPE pre-tokenizer regex (public pattern shape from the GPT-2
# paper/tokenizer): contractions, letter runs, digit runs, punct runs.
BPE_ISH = re.compile(r"'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that with for on as at by".split()
)

# Tiny marker-word language-ID tables (n-gram/stopword heuristic).
LANG_MARKERS: Dict[str, frozenset] = {
    "en": frozenset("the and of to is in that with for are".split()),
    "de": frozenset("der die das und ist nicht mit für von ein".split()),
    "fr": frozenset("le la les et est dans pour que une avec".split()),
    "es": frozenset("el la los y es en que para con una".split()),
    "zh": frozenset("的 是 在 了 我 有 和 不 人 这".split()),
}
_LANGS = sorted(LANG_MARKERS)


def normalize_whitespace(texts: pd.Series, policy: str = "collapse") -> pd.Series:
    """XSD whiteSpace normalization as a transform operator
    (reference ``validators/simple_types.py:310-328``): ``replace`` maps
    tab/CR/LF to spaces; ``collapse`` additionally squeezes runs and strips
    ends. Vectorized pandas str kernels."""
    if policy == "preserve":
        return texts
    replaced = texts.str.replace(r"[\t\r\n]", " ", regex=True)
    if policy == "replace":
        return replaced
    if policy == "collapse":
        return replaced.str.replace(r" {2,}", " ", regex=True).str.strip(" ")
    raise ValueError(f"unknown whiteSpace policy {policy!r}")


def whitespace_token_count(texts: pd.Series) -> pd.Series:
    """Number of whitespace-delimited tokens (\\S+ runs)."""
    return texts.str.count(WS_TOKEN).fillna(0).astype("int64")


def bpe_ish_token_count(texts: pd.Series) -> pd.Series:
    """Token count under the BPE-style pre-tokenizer regex."""
    return texts.str.count(BPE_ISH).fillna(0).astype("int64")


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Length / punctuation / stopword quality features per document."""
    toks = texts.str.findall(WS_TOKEN)
    n_tokens = toks.str.len().fillna(0).astype("int64")
    n_chars = texts.str.len().fillna(0).astype("int64")
    mean_tok_len = texts.str.replace(r"\s+", "", regex=True).str.len().astype("float64") / n_tokens.replace(0, np.nan)
    stop_counts = toks.map(lambda ws: sum(1 for w in ws if w.lower() in STOPWORDS))
    stop_ratio = stop_counts.astype("float64") / n_tokens.replace(0, np.nan)
    alpha_ratio = texts.str.count(r"[A-Za-z]").astype("float64") / n_chars.replace(0, np.nan)
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "mean_tok_len": mean_tok_len.fillna(0.0),
            "stopword_ratio": stop_ratio.fillna(0.0),
            "alpha_ratio": alpha_ratio.fillna(0.0),
        }
    )


def quality_score(features: pd.DataFrame) -> pd.Series:
    """Heuristic [0,1] quality score from :func:`quality_features`."""
    len_score = np.clip(features["n_tokens"] / 64.0, 0, 1)
    stop_score = np.clip(features["stopword_ratio"] / 0.3, 0, 1)
    alpha = features["alpha_ratio"].clip(0, 1)
    return (0.4 * len_score + 0.3 * stop_score + 0.3 * alpha).astype("float64")


def language_id(texts: pd.Series) -> pd.Series:
    """Marker-word language-ID; deterministic alphabetical tiebreak,
    ``und`` (undetermined) when no marker hits."""
    lowered = texts.str.lower().str.findall(WS_TOKEN)

    def _score(ws: List[str]) -> str:
        best, best_n = "und", 0
        for lang in _LANGS:
            n = sum(1 for w in ws if w in LANG_MARKERS[lang])
            if n > best_n:
                best, best_n = lang, n
        return best

    return lowered.map(_score)


def fingerprint64(texts: pd.Series) -> pd.Series:
    """Stable 64-bit content fingerprint of whitespace-normalized text
    (the dedup-identity analog of the reference's collapse normalization,
    ``simple_types.py:310-328``). Fast in-process variant (pandas hash)."""
    norm = texts.str.strip().str.replace(r"\s+", " ", regex=True)
    return pd.Series(hash64(norm.to_numpy(dtype=object)), index=texts.index).astype("uint64")


def fingerprint_md5_16(texts: pd.Series) -> pd.Series:
    """Portable content fingerprint: first 16 hex chars of MD5 over the
    whitespace-collapsed text. Reproducible by ANY system (DuckDB
    ``md5()``, coreutils, other engines) — the cross-system dedup-identity
    fingerprint, whereas :func:`fingerprint64` is the faster in-process
    one. ASCII whitespace class + space-strip match RE2/SQL semantics."""
    import hashlib

    norm = texts.str.replace(r"[ \t\n\r\f\v]+", " ", regex=True).str.strip(" ")
    # null-safe like SQL md5(NULL) -> NULL (str accessors pass None through)
    return pd.Series(
        [None if s is None else hashlib.md5(s.encode("utf-8")).hexdigest()[:16] for s in norm],
        index=texts.index,
    )
