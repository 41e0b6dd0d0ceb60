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
from typing import Dict

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


def _tokenize_arrow(texts: pd.Series):
    """Shared Arrow tokenization scaffold for the per-token count kernels.

    Splits every document on whitespace in one C++ pass
    (``utf8_split_whitespace`` yields empty fields at boundaries — the
    NON-empty fields are exactly the ``\\S+`` runs) and returns
    ``(arr, parent_idx, nonempty_mask, flat_lower, flat_len)`` where
    ``parent_idx[i]`` is the document row of flat token ``i`` and ``arr``
    is the converted Arrow string array (returned so callers don't pay
    the pandas→Arrow copy twice). Per-row counts then reduce with
    ``np.bincount`` — no per-row Python loop.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(texts, type=pa.string(), from_pandas=True)
    lists = pc.utf8_split_whitespace(arr)
    flat = pc.list_flatten(lists)
    flat_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype("int64")
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False).astype("int64")
    nonempty = flat_len > 0
    flat_lower = pc.utf8_lower(flat)
    return arr, parent, nonempty, flat_lower, flat_len


def _member_counts(flat_tokens, parent: np.ndarray, members: frozenset, n_rows: int) -> np.ndarray:
    """Per-row count of flat tokens contained in ``members`` (one Arrow
    ``is_in`` membership pass + a bincount)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    hits = pc.is_in(flat_tokens, value_set=pa.array(sorted(members))).to_numpy(
        zero_copy_only=False
    )
    return np.bincount(parent[hits], minlength=n_rows)


def _ascii_letter_counts(arr) -> np.ndarray:
    """Per-row ``[A-Za-z]`` character counts straight off the Arrow string
    buffers: UTF-8 multibyte sequences never contain ASCII-range bytes, so a
    byte-level range test over the data buffer + an offsets-indexed cumsum is
    exact and ~8× faster than the RE2 ``count_substring_regex`` scan.
    Null rows (empty slots in the data buffer) count 0."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1]
    if bufs[2] is None:
        return np.zeros(len(arr), dtype=np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    is_letter = ((data >= 65) & (data <= 90)) | ((data >= 97) & (data <= 122))
    cs = np.zeros(len(data) + 1, dtype=np.int64)
    np.cumsum(is_letter, out=cs[1:])
    return cs[offsets[1:].astype(np.int64)] - cs[offsets[:-1].astype(np.int64)]


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Length / punctuation / stopword quality features per document.

    One Arrow whitespace-split pass feeds token counts, non-space length
    (weighted bincount) and stopword membership; alpha counts come from a
    byte-level buffer scan. ~3.5× the per-row-loop version."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr, parent, nonempty, flat_lower, flat_len = _tokenize_arrow(texts)
    n_rows = len(arr)
    n_tokens = pd.Series(
        np.bincount(parent[nonempty], minlength=n_rows), index=texts.index
    ).astype("int64")
    n_chars = pd.Series(
        pc.utf8_length(arr).to_numpy(zero_copy_only=False), index=texts.index
    ).fillna(0).astype("int64")
    nonspace_len = np.bincount(
        parent[nonempty], weights=flat_len[nonempty], minlength=n_rows
    )
    mean_tok_len = pd.Series(nonspace_len, index=texts.index) / n_tokens.replace(0, np.nan)
    stop_counts = pd.Series(
        _member_counts(flat_lower, parent, STOPWORDS, n_rows), index=texts.index
    )
    stop_ratio = stop_counts.astype("float64") / n_tokens.replace(0, np.nan)
    alpha = pd.Series(_ascii_letter_counts(arr), index=texts.index)
    alpha_ratio = alpha.astype("float64") / n_chars.replace(0, np.nan)
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "mean_tok_len": mean_tok_len.fillna(0.0).astype("float64"),
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
    ``und`` (undetermined) when no marker hits.

    Vectorized: one Arrow whitespace-split, one ``is_in`` membership pass
    per language building a (row × lang) marker-hit count matrix, then a
    single argmax — ties break to the alphabetically-first language
    because ``_LANGS`` is sorted and argmax takes the first maximum.
    ~6× the per-row-loop version."""
    arr, parent, _nonempty, flat_lower, _flat_len = _tokenize_arrow(texts)
    n_rows = len(arr)
    counts = np.column_stack(
        [_member_counts(flat_lower, parent, LANG_MARKERS[lang], n_rows) for lang in _LANGS]
    )
    best_j = counts.argmax(axis=1)
    best_n = counts.max(axis=1)
    langs_arr = np.array(_LANGS, dtype=object)
    out = np.where(best_n > 0, langs_arr[best_j], "und")
    return pd.Series(out, index=texts.index, dtype=object)


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
