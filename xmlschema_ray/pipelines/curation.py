"""Training-data curation operators over the documents table.

The four operations a large-scale pretraining-data pipeline runs between
raw crawl and tokenizer — each Ray-Data-first (per-batch vectorized maps;
pre-aggregated partials before any shuffle; broadcast small sides) and
each carrying a full DuckDB value oracle:

* ``top_words`` — corpus vocabulary counts → global top-k. The wide
  groupby ships ONE row per (word, batch) partial, never one per
  occurrence (``combiner_aggregate``), then partial top-k with no global
  sort.
* ``decontamination`` — training-vs-benchmark n-gram overlap (the eval-set
  leakage check run before every serious pretraining job). The benchmark
  side is small by construction ⇒ broadcast gram set + per-batch
  membership, NOT a join shuffle.
* ``repetition_ratio`` — per-document duplicate-n-gram fraction (the
  Gopher/C4-style quality signal); entirely per-row ⇒ embarrassingly
  parallel map_batches.
* ``stratified_sample`` — deterministic hash-based per-source sampling
  (data-mixture rebalancing); pure per-row predicate on (md5(doc_id),
  md5(source)) ⇒ no state, no shuffle, reproducible on any engine.

Word splitting matches the green ``token_counts`` oracle
(``regexp_split_to_array(trim(text), '\\s+')`` ≡ Arrow
``ascii_split_whitespace``). Reference analogs: enumeration/membership
facets (facets.py:426-487) for the gram-set check; assertions
(facets.py:606-628) for the per-row quality predicate.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from xmlschema_ray.pipelines.common import table_path

_HEX = "0123456789abcdef"


def _split_words(
    text: "pa.ChunkedArray | pa.Array",
) -> Tuple[np.ndarray, np.ndarray]:
    """ONE whitespace split of a batch's text column → (list offsets,
    flat word array) — the shared tokenization every gram extractor in
    this module derives from."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.ascii_split_whitespace(text)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    return words.offsets.to_numpy(), words.values.to_numpy(zero_copy_only=False)


def _gram_parts_from_flat(
    offsets: np.ndarray, flat: np.ndarray, n: int
) -> Tuple[np.ndarray, list]:
    """(row_index, [word_0 array, …, word_{n-1} array]) for all word
    n-grams, given a precomputed :func:`_split_words` result — so callers
    needing several gram sizes (e.g. DSIR's unigrams+bigrams) tokenize
    ONCE. One searchsorted for row membership; grams never cross row
    boundaries, so per-batch evaluation is exact for per-document
    statistics."""
    total = len(flat)
    if total == 0:
        return np.array([], dtype=np.int64), [np.array([], dtype=object)] * n
    starts = np.arange(total, dtype=np.int64)
    row_idx = np.searchsorted(offsets, starts, side="right") - 1
    valid = starts + n <= offsets[row_idx + 1]
    vs = starts[valid]
    return row_idx[valid], [flat[vs + j].astype(object) for j in range(n)]


def _word_gram_parts(
    text: "pa.ChunkedArray | pa.Array", n: int
) -> Tuple[np.ndarray, list]:
    """(row_index, [word_0 array, …, word_{n-1} array]) for all word
    n-grams in a batch — the component words, so callers needing both the
    joined gram and a component (e.g. the bigram's left/context word)
    share ONE tokenization (see :func:`_gram_parts_from_flat`)."""
    offsets, flat = _split_words(text)
    return _gram_parts_from_flat(offsets, flat, n)


def _word_grams(text: "pa.ChunkedArray | pa.Array", n: int) -> Tuple[np.ndarray, np.ndarray]:
    """(row_index, gram_string) arrays for all word n-grams in a batch
    (joined form of :func:`_word_gram_parts`; n-1 elementwise concats)."""
    row_idx, parts = _word_gram_parts(text, n)
    grams = parts[0]
    for p in parts[1:]:
        grams = grams + " " + p
    return row_idx, grams


def _md5_hex(values) -> np.ndarray:
    """Lowercase md5 hexdigests of ``str(v)`` — matches DuckDB
    ``md5(CAST(v AS VARCHAR))`` for int64 ids and plain ``md5(v)`` for
    strings."""
    return np.array(
        [hashlib.md5(str(v).encode("utf-8")).hexdigest() for v in values], dtype=object
    )


# -- vocabulary ----------------------------------------------------------


def _gram_count_partial(n: int, out_col: str):
    """Shared per-batch partial: distinct word n-gram counts (one row per
    distinct gram per batch — the combiner shape all vocabulary reduces
    here use)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        _, grams = _word_grams(batch["text"], n)
        if len(grams) == 0:
            return pd.DataFrame(
                {out_col: pd.Series([], dtype=object), "n": pd.Series([], dtype="int64")}
            )
        w, c = np.unique(grams.astype(str), return_counts=True)
        return pd.DataFrame({out_col: w, "n": c.astype(np.int64)})

    return partial


def top_words(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Global word-frequency top-k over the corpus.

    Per-batch ``value_counts`` partials (one row per distinct word per
    batch) → hash-partitioned merge → partial top-k. The full-corpus
    word→count table never exists in one place; the driver sees k rows.
    """
    from xmlschema_ray.ops.relational import combiner_aggregate, topk

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["text"])
    partials = ds.map_batches(_gram_count_partial(1, "word"), batch_format="pyarrow")
    counts = combiner_aggregate(partials, "word", {"n": ("n", "sum")})
    out = topk(counts, "n", k, descending=True, tiebreak=["word"]).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


TOP_WORDS_SQL = r"""
WITH w AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word FROM documents
)
SELECT word, CAST(COUNT(*) AS BIGINT) AS n
FROM w WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
LIMIT 20
"""


def heavy_hitter_words(sf_dir: str, k: int = 500, mg_capacity: int = 2000) -> pd.DataFrame:
    """EXACT frequent items (words with count·k > corpus total) through a
    Misra-Gries mergeable sketch + exact-verify rescan — the
    frequent-items counterpart of the engine's HLL/quantile sketches
    (SURVEY §2.7), and the shape ``top_words`` cannot give: a frequency
    THRESHOLD with a guarantee, not a fixed top-k.

    Phase 1 streams one MG summary per batch (exact batch counts
    compressed to ``mg_capacity`` rows by subtracting the (m+1)-th
    largest count — each item's undercount ≤ batch_words/(m+1), so the
    summed sketch undercounts any word by at most total/(m+1); Agarwal
    et al., "Mergeable summaries", PODS 2012). Batch word totals ride
    the same stream as an empty-string sentinel (words are non-empty by
    construction). The merged sketch is MATERIALIZED (sketch-sized:
    bounded by vocabulary, never the corpus) so the total lookup and the
    candidate cut consume it without re-tokenizing the corpus; with
    m+1 > 4k the integer candidate test sketch·k·(m+1) > total·(m+1−k)
    admits every true heavy hitter and at most ~k·(m+1)/(m+1−k) ≈ 1.33k
    candidates reach the driver. Phase 2 broadcasts the candidate list
    and rescans for exact candidate counts (collision-free: real
    strings, not hashes) — false positives die here, false negatives
    are structurally impossible. The two-pass sketch-then-verify shape
    is the engine's uniqueness design (``engine.py`` stage B)."""
    from xmlschema_ray.ops.relational import combiner_aggregate

    if mg_capacity + 1 <= k:
        raise ValueError("mg_capacity must exceed k for the candidate guarantee")
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["text"])

    def mg_partial(batch: pa.Table) -> pd.DataFrame:
        _, flat = _split_words(batch["text"])
        flat = flat[flat != ""]
        w, c = np.unique(flat.astype(str), return_counts=True)
        total = int(c.sum())
        if len(w) > mg_capacity:
            thr = np.partition(c, len(c) - mg_capacity - 1)[len(c) - mg_capacity - 1]
            keep = c > thr
            w, c = w[keep], c[keep] - thr
        return pd.DataFrame(
            {
                "word": np.concatenate([w, np.array([""], dtype=object)]),
                "n": np.concatenate([c.astype(np.int64), np.array([total], dtype=np.int64)]),
            }
        )

    sketch = combiner_aggregate(
        ds.map_batches(mg_partial, batch_format="pyarrow"), "word", {"n": ("n", "sum")}
    ).materialize()
    total_row = sketch.filter(lambda r: r["word"] == "").take_all()
    n_total = int(total_row[0]["n"]) if total_row else 0
    if n_total == 0:
        return pd.DataFrame(
            {
                "word": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
                "n_total": pd.Series([], dtype="int64"),
            }
        )
    m1 = mg_capacity + 1

    def candidate_cut(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.not_equal(batch["word"], pa.scalar("")),
            pc.greater(
                pc.multiply(batch["n"], pa.scalar(k * m1, pa.int64())),
                pa.scalar(n_total * (m1 - k), pa.int64()),
            ),
        )
        return batch.filter(ok).select(["word"])

    cand = sketch.map_batches(candidate_cut, batch_format="pyarrow").take_all()
    if not cand:
        return pd.DataFrame(
            {
                "word": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
                "n_total": pd.Series([], dtype="int64"),
            }
        )
    cand_words = pa.array(sorted(r["word"] for r in cand), pa.string())
    cand_ref = ray.put(cand_words)

    def exact_partial(batch: pa.Table) -> pd.DataFrame:
        cw = ray.get(cand_ref)
        _, flat = _split_words(batch["text"])
        arr = pa.array(flat, pa.string())
        hits = arr.filter(pc.is_in(arr, value_set=cw)).to_numpy(zero_copy_only=False)
        if len(hits) == 0:
            return pd.DataFrame(
                {"word": pd.Series([], dtype=object), "n": pd.Series([], dtype="int64")}
            )
        w, c = np.unique(hits.astype(str), return_counts=True)
        return pd.DataFrame({"word": w, "n": c.astype(np.int64)})

    exact = combiner_aggregate(
        ds.map_batches(exact_partial, batch_format="pyarrow"), "word", {"n": ("n", "sum")}
    ).to_pandas()
    exact["n"] = exact["n"].astype("int64")
    out = exact[exact["n"] * k > n_total].copy()
    out["n_total"] = np.int64(n_total)
    return out.sort_values("word").reset_index(drop=True)


HEAVY_HITTER_SQL = r"""
WITH w AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word FROM documents
), c AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM w WHERE word <> '' GROUP BY word
), t AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM c
)
SELECT c.word, c.n, t.n_total FROM c, t WHERE c.n * 500 > t.n_total ORDER BY c.word
"""


def hll_vocab_by_source(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """Per-source vocabulary HyperLogLog — the engine's mergeable
    distinct-count sketch (``engine/stats.py``) brought UNDER THE ORACLE
    GATE: registers here are derived from ``md5`` (not the engine's
    SipHash) so DuckDB recomputes every register value exactly, proving the
    bucket/rank/max-merge machinery itself, not just an estimate.

    Layout: 64-bit hash = first 16 md5 hex chars; top ``p`` bits pick the
    register, rank = leading-zero count of the remaining ``64-p`` bits + 1
    (capped at ``64-p+1`` when they are all zero — the engine's OR-mask
    convention, ``stats.py:72``). Per batch, per source: fold the batch's
    DISTINCT words (vocabulary-bounded, the ``cdc_boilerplate_chunks``
    md5-over-uniques cost profile) and emit only NONZERO registers; the
    combiner's per-(source, register) MAX is the HLL merge — sparse
    register rows ride the exchange, never words. Output: one row per hit
    register. At 10^12 docs the exchange is ≤ sources × 4096 rows per
    batch — the whole point of the sketch.
    """
    import hashlib

    from xmlschema_ray.ops.relational import combiner_aggregate, to_pandas_with_schema

    m = 1 << p
    shift = 64 - p
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["source", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        offsets, flat = _split_words(batch["text"])
        src = batch["source"].to_numpy(zero_copy_only=False)
        n_rows = len(src)
        row_idx = np.repeat(np.arange(n_rows), np.diff(offsets))
        keep = flat != ""  # C-looped object compare, not a Python listcomp
        src_codes, src_uniques = pd.factorize(src)
        word_codes = src_codes[row_idx]
        out_src, out_bucket, out_rank = [], [], []
        for ci, s in enumerate(src_uniques):
            words = pd.unique(flat[keep & (word_codes == ci)])
            if len(words) == 0:
                continue
            h = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(str(w).encode("utf-8")).digest()[:8], "big")
                    for w in words
                ),
                dtype=np.uint64,
                count=len(words),
            )
            bucket = (h >> np.uint64(shift)).astype(np.int64)
            # rank from the low 64-p bits EXACTLY: the remainder fits a
            # float64 mantissa (< 2^52), so frexp's exponent IS bit_length
            # — no log2-at-2^63 rounding edge (the engine's own HLL may
            # use floats on both sides; here the oracle side is exact
            # string algebra, so this side must be exact integer algebra)
            rem = (h & np.uint64((1 << shift) - 1)).astype(np.float64)
            exp = np.frexp(rem)[1]
            rank = np.where(rem > 0, (shift + 1) - exp, shift + 1).astype(np.int64)
            reg = np.zeros(m, dtype=np.int64)
            np.maximum.at(reg, bucket, rank)
            hit = np.flatnonzero(reg)
            out_src.append(np.full(len(hit), s, dtype=object))
            out_bucket.append(hit)
            out_rank.append(reg[hit])
        if not out_src:
            return pd.DataFrame(
                {
                    "source": pd.Series([], dtype=object),
                    "bucket": pd.Series([], dtype="int64"),
                    "rank": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "source": np.concatenate(out_src),
                "bucket": np.concatenate(out_bucket).astype(np.int64),
                "rank": np.concatenate(out_rank).astype(np.int64),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    merged = combiner_aggregate(
        partials, ["source", "bucket"], {"rank": ("rank", "max")}
    )
    out = to_pandas_with_schema(merged)
    out["bucket"] = out["bucket"].astype("int64")
    out["rank"] = out["rank"].astype("int64")
    return out.sort_values(["source", "bucket"]).reset_index(drop=True)


# rank replay in pure string algebra: z leading zero NIBBLES of the 13-char
# remainder, then the first nonzero hex char's intra-nibble zeros; the
# all-zero remainder hits the engine's OR-mask cap 64-p+1 = 53 (p=12 → the
# top 3 hex chars are the bucket).
HLL_VOCAB_SQL = r"""
WITH raw AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS word
  FROM documents
), w AS (
  SELECT DISTINCT source, word FROM raw
), h AS (
  SELECT source, md5(word) AS x FROM w
), b AS (
  SELECT source,
    CAST((strpos('0123456789abcdef', substring(x, 1, 1)) - 1) * 256
       + (strpos('0123456789abcdef', substring(x, 2, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substring(x, 3, 1)) - 1) AS BIGINT) AS bucket,
    length(regexp_extract(substring(x, 4, 13), '^0*')) AS z,
    substring(x, 4 + length(regexp_extract(substring(x, 4, 13), '^0*')), 1) AS c
  FROM h
), r AS (
  SELECT source, bucket,
    CAST(CASE WHEN z = 13 THEN 53
         ELSE 4 * z + (CASE WHEN c = '1' THEN 3
                            WHEN c IN ('2', '3') THEN 2
                            WHEN c IN ('4', '5', '6', '7') THEN 1
                            ELSE 0 END) + 1
    END AS BIGINT) AS rank
  FROM b
)
SELECT source, bucket, MAX(rank) AS rank
FROM r GROUP BY source, bucket ORDER BY source, bucket
"""


def top_bigrams(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Global word-bigram top-k (collocation mining / tokenizer-merge
    candidates). Same shape as ``top_words``: one partial row per distinct
    bigram per batch, hash-partitioned merge, partial top-k — the corpus
    bigram table never materializes in one place."""
    from xmlschema_ray.ops.relational import combiner_aggregate, topk

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["text"])
    partials = ds.map_batches(_gram_count_partial(2, "bigram"), batch_format="pyarrow")
    counts = combiner_aggregate(partials, "bigram", {"n": ("n", "sum")})
    out = topk(counts, "n", k, descending=True, tiebreak=["bigram"]).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


TOP_BIGRAMS_SQL = r"""
WITH w AS (
  SELECT regexp_split_to_array(trim(text), '\s+') AS ws FROM documents
), g AS (
  SELECT array_to_string(ws[i:i+1], ' ') AS bigram
  FROM w, LATERAL unnest(generate_series(1, len(ws) - 1)) AS t(i)
)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM g
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 20
"""


def phrase_search(sf_dir: str, phrase: str = "big order scan") -> pd.DataFrame:
    """Exact PHRASE search (consecutive-word match) — the positional
    complement of ``inverted_index``'s bag-of-words postings: which
    documents contain this exact word sequence, and how many (overlapping
    counted) starting positions. The decontamination / exact-quote lookup
    primitive.

    Embarrassingly parallel, zero exchanges: each batch tokenizes once
    (the shared ``_split_words``), drops the split's empty boundary
    fields WITHOUT losing row alignment (positions re-derived from the
    filtered row index), and matches the k-gram with k shifted vectorized
    equality masks + a same-document guard; per-doc hit counts are one
    ``bincount``. doc_id is unique per row, so results need no merge —
    the driver sees only matching docs."""
    words = phrase.split()
    k = len(words)
    if k == 0:
        raise ValueError("empty phrase")
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def find(batch: pa.Table) -> pd.DataFrame:
        offsets, flat = _split_words(batch["text"])
        doc = batch["doc_id"].to_numpy()
        row_idx = np.repeat(np.arange(len(doc)), np.diff(offsets))
        keep = flat != ""
        flat2, row2 = flat[keep], row_idx[keep]
        n = len(flat2) - k + 1
        if n <= 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=doc.dtype),
                    "n_hits": pd.Series([], dtype="int64"),
                }
            )
        m = flat2[:n] == words[0]
        for j in range(1, k):
            m &= flat2[j : n + j] == words[j]
        m &= row2[:n] == row2[k - 1 :]
        counts = np.bincount(row2[:n][m], minlength=len(doc))
        hit = counts > 0
        return pd.DataFrame({"doc_id": doc[hit], "n_hits": counts[hit].astype(np.int64)})

    out = ds.map_batches(find, batch_format="pyarrow").to_pandas()
    out["n_hits"] = out["n_hits"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def source_vocab_overlap(sf_dir: str, max_sources: int = 20) -> pd.DataFrame:
    """EXACT pairwise vocabulary overlap between sources (shared words,
    per-source vocabulary sizes, Jaccard) — the sketch-free set-
    intersection matrix (the exact counterpart of estimating crawl
    similarity with MinHash): each word's presence across sources folds
    into ONE int64 BITMASK, so all |S|² pairwise intersections come from
    a single mask histogram instead of |S|² join passes.

    Exchanges: distinct (word, source-bit) pairs dedupe through one
    combiner (vocabulary-bounded), per-word masks are a SUM combiner
    (after dedup each bit occurs once, so sum ≡ bitwise OR — no custom
    merge kind needed), and the mask histogram (≤ 2^|S| rows, linted at
    ``max_sources``) is the only thing the driver sees. Jaccard is one
    closed-form float over exact int64 counts per pair."""
    from xmlschema_ray.ops.relational import combiner_aggregate

    srcs = sorted(
        r["source"]
        for r in combiner_aggregate(
            rd.read_parquet(table_path(sf_dir, "documents"), columns=["source"]),
            "source",
            {"n": (None, "count")},
        )
        .select_columns(["source"])
        .take_all()
    )
    if len(srcs) > max_sources:
        raise ValueError(
            f"{len(srcs)} sources exceed max_sources={max_sources}: the 2^|S| mask "
            "histogram stops being metadata-sized — use minhash similarity instead"
        )
    bit_of = {s: i for i, s in enumerate(srcs)}

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["source", "text"])

    def pair_partial(batch: pa.Table) -> pd.DataFrame:
        offsets, flat = _split_words(batch["text"])
        src = batch["source"].to_numpy(zero_copy_only=False)
        row_idx = np.repeat(np.arange(len(src)), np.diff(offsets))
        keep = flat != ""
        d = pd.DataFrame({"word": flat[keep], "src": src[row_idx[keep]]}).drop_duplicates()
        return d

    pairs = combiner_aggregate(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["word", "src"],
        {"n": (None, "count")},
    )

    def to_contrib(batch: pd.DataFrame) -> pd.DataFrame:
        bits = batch["src"].map(bit_of).to_numpy(np.int64)
        return pd.DataFrame(
            {"word": batch["word"].to_numpy(), "contrib": np.int64(1) << bits}
        )

    masks = combiner_aggregate(
        pairs.map_batches(to_contrib, batch_format="pandas"),
        "word",
        {"mask": ("contrib", "sum")},
    )

    def mask_hist(batch: pd.DataFrame) -> pd.DataFrame:
        u, c = np.unique(batch["mask"].to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"mask": u, "n": c.astype(np.int64)})

    hist = (
        combiner_aggregate(
            masks.map_batches(mask_hist, batch_format="pandas"), "mask", {"n": ("n", "sum")}
        )
        .to_pandas()
    )
    mask_v = hist["mask"].to_numpy(np.int64)
    n_v = hist["n"].to_numpy(np.int64)
    rows = []
    for a in range(len(srcs)):
        in_a = (mask_v >> a) & 1 == 1
        for b in range(a + 1, len(srcs)):
            in_b = (mask_v >> b) & 1 == 1
            na = int(n_v[in_a].sum())
            nb = int(n_v[in_b].sum())
            nc = int(n_v[in_a & in_b].sum())
            rows.append(
                {
                    "source_a": srcs[a],
                    "source_b": srcs[b],
                    "n_a": na,
                    "n_b": nb,
                    "n_common": nc,
                    "jaccard": float(nc) / float(na + nb - nc),
                }
            )
    out = pd.DataFrame(rows).astype(
        {"n_a": "int64", "n_b": "int64", "n_common": "int64"}
    )
    return out.sort_values(["source_a", "source_b"]).reset_index(drop=True)


SOURCE_VOCAB_OVERLAP_SQL = r"""
WITH w AS (
  SELECT DISTINCT source,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS word
  FROM documents
), w2 AS (
  SELECT source, word FROM w WHERE word <> ''
), s AS (
  SELECT source, CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS bit
  FROM (SELECT DISTINCT source FROM w2)
), m AS (
  SELECT word, CAST(SUM(1 << bit) AS BIGINT) AS mask
  FROM (SELECT DISTINCT source, word FROM w2) d JOIN s USING (source) GROUP BY word
), h AS (
  SELECT mask, CAST(COUNT(*) AS BIGINT) AS n FROM m GROUP BY mask
), p AS (
  SELECT a.source AS source_a, a.bit AS ba, b.source AS source_b, b.bit AS bb
  FROM s a JOIN s b ON a.bit < b.bit
), agg AS (
  SELECT p.source_a, p.source_b,
    CAST(COALESCE(SUM(CASE WHEN ((h.mask >> p.ba) & 1) = 1 THEN h.n END), 0) AS BIGINT) AS n_a,
    CAST(COALESCE(SUM(CASE WHEN ((h.mask >> p.bb) & 1) = 1 THEN h.n END), 0) AS BIGINT) AS n_b,
    CAST(COALESCE(SUM(CASE WHEN ((h.mask >> p.ba) & 1) = 1 AND ((h.mask >> p.bb) & 1) = 1
                      THEN h.n END), 0) AS BIGINT) AS n_common
  FROM p CROSS JOIN h GROUP BY p.source_a, p.source_b
)
SELECT source_a, source_b, n_a, n_b, n_common,
       CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE) AS jaccard
FROM agg ORDER BY source_a, source_b
"""


PHRASE_SEARCH_SQL = r"""
WITH w AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS word,
         generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) AS pos
  FROM documents
)
SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM w a
JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 AND b.word = 'order'
JOIN w c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2 AND c.word = 'scan'
WHERE a.word = 'big'
GROUP BY 1 ORDER BY 1
"""


def table_fingerprint_by_source(sf_dir: str) -> pd.DataFrame:
    """Order/partition-invariant table fingerprint per provenance source —
    the anti-entropy / replica-reconciliation primitive (compare two copies
    of a 100 TB table WITHOUT sorting either or moving a single data row
    between clusters; per-source (n_rows, digest) localizes any divergence
    to one source partition).

    Per row the digest contribution is the first 32 bits of
    ``md5(doc_id|lang|source|n_chars|text)`` (the canonical row string,
    ``|``-joined in column order); the per-source digest is
    ``SUM(h32) mod 2^32``. Addition is commutative and associative, so the
    digest is IDENTICAL under any block order, partitioning, or
    parallelism — the property a sorted-output hash only gets from a
    global sort. Each batch partial takes the residue immediately, so
    merge inputs are < 2^32 and up to 2^31 batch partials stay inside
    int64 at any corpus size; the md5 loop is the same per-row cost
    profile as the engine's canonical violation hashing. A corrupted,
    missing, or duplicated row flips the source's digest with
    probability 1 - 2^-32 (and ``n_rows`` catches pure cardinality drift).
    """
    from xmlschema_ray.ops.relational import combiner_aggregate, to_pandas_with_schema

    ds = rd.read_parquet(
        table_path(sf_dir, "documents"),
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    mod = np.int64(1) << np.int64(32)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "source": pd.Series([], dtype=object),
                    "dsum": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        rows = (
            df["doc_id"].astype(str)
            + "|"
            + df["lang"]
            + "|"
            + df["source"]
            + "|"
            + df["n_chars"].astype(str)
            + "|"
            + df["text"]
        )
        h32 = np.fromiter(
            (
                int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:4], "big")
                for s in rows
            ),
            dtype=np.int64,
            count=len(rows),
        )
        g = pd.DataFrame({"source": df["source"].to_numpy(), "h": h32}).groupby(
            "source", as_index=False
        )
        out = g.agg(dsum=("h", "sum"), n=("h", "size"))
        out["dsum"] = out["dsum"] % mod  # residue now: merge inputs stay < 2^32
        return out.astype({"dsum": "int64", "n": "int64"})

    merged = to_pandas_with_schema(
        combiner_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            "source",
            {"dsum": ("dsum", "sum"), "n_rows": ("n", "sum")},
        )
    )
    merged["digest"] = (merged["dsum"].astype("int64") % mod).astype("int64")
    merged["n_rows"] = merged["n_rows"].astype("int64")
    return (
        merged[["source", "n_rows", "digest"]]
        .sort_values("source")
        .reset_index(drop=True)
    )


def weighted_sample_docs(sf_dir: str, k: int = 200) -> pd.DataFrame:
    """PRIORITY SAMPLING (Duffield–Lund–Thorup, JACM 2007): a weighted
    without-replacement sample of ``k`` documents, selection probability
    increasing with weight (``n_chars`` — longer documents carry more
    training signal per row). Each doc draws the deterministic uniform
    ``u = h52 / 2^52`` (first 13 md5 hex chars of ``doc_id`` — 52 bits,
    exactly representable in a float64) and the sample is the BOTTOM-k by
    priority key ``h52 / w`` (the constant 2^-52 of ``u/w`` is dropped —
    order-invariant), the bottom-k-sketch form of DLT's top-k by ``w/u``. The key is ONE IEEE division of exactly-representable
    integers, so Ray and DuckDB produce bit-identical doubles and the cut
    is reproducible on any engine — the seeded-md5 analog of the
    stratified/quota samplers, but weight-biased.

    Distribution: bottom-k keys are MERGEABLE (the union's bottom-k is the
    bottom-k of per-part bottom-k's), so one partial-top-k pass + a k-row
    final sort suffice — no global sort, no shuffle; k·#batches rows reach
    the reduce at any corpus size.
    """
    from xmlschema_ray.ops.relational import to_pandas_with_schema, topk

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "n_chars"])

    def key(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        h52 = np.fromiter(
            (int(h[:13], 16) for h in _md5_hex(ids)),
            dtype=np.int64,
            count=len(ids),
        )
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_chars": w,
                "priority": h52.astype(np.float64) / w.astype(np.float64),
            }
        )

    keyed = ds.map_batches(key, batch_format="pyarrow")
    out = to_pandas_with_schema(
        topk(keyed, "priority", k, descending=False, tiebreak=["doc_id"])
    )
    return out[["doc_id", "n_chars", "priority"]].reset_index(drop=True)


WEIGHTED_SAMPLE_SQL = """
WITH h AS (
  SELECT doc_id, n_chars,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) AS h52
  FROM documents
)
SELECT doc_id, n_chars,
       CAST(h52 AS DOUBLE) / CAST(n_chars AS DOUBLE) AS priority
FROM h ORDER BY priority, doc_id LIMIT 200
"""


TABLE_FINGERPRINT_SQL = r"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(('0x' || substring(md5(
              CAST(doc_id AS VARCHAR) || '|' || lang || '|' || source || '|'
              || CAST(n_chars AS VARCHAR) || '|' || text), 1, 8)) AS BIGINT))
            % 4294967296 AS BIGINT) AS digest
FROM documents
GROUP BY source
ORDER BY source
"""


def inverted_index(sf_dir: str, min_df: int = 100) -> "rd.Dataset":
    """Distributed inverted-index build (term → sorted posting list), the
    core retrieval structure over a corpus: per-batch DISTINCT (word,
    doc_id) pairs (complete per batch — a document never spans batches),
    ONE hash shuffle on the term, then a vectorized per-partition group
    merge emits df + the canonical comma-joined posting string for terms
    with df ≥ ``min_df``.

    Scale note: the exported joined-string postings are the toy/debug
    form; the production layout keeps postings as (term, doc_id) ROWS
    sorted within each term partition (exactly what this pipeline holds
    right before the join step), which shards hot terms across blocks
    instead of building one giant string."""
    from xmlschema_ray.ops.relational import hash_partition_apply

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def pairs(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        row_idx, words = _word_grams(batch["text"], 1)
        df = pd.DataFrame({"word": words.astype(str), "doc_id": ids[row_idx]})
        return df.drop_duplicates()

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["word", "doc_id"])
        df_counts = g.groupby("word", sort=False).size()
        keep = df_counts[df_counts >= min_df]
        if not len(keep):
            return pd.DataFrame(
                {
                    "word": pd.Series([], dtype=object),
                    "df": pd.Series([], dtype="int64"),
                    "postings": pd.Series([], dtype=object),
                }
            )
        # filter to surviving terms BEFORE the per-group string build: with
        # a selective min_df the posting-join work is the expensive part
        kept = g[g["word"].isin(keep.index)]
        postings = kept.groupby("word", sort=False)["doc_id"].agg(
            lambda s: ",".join(map(str, s))
        )
        return pd.DataFrame(
            {
                "word": keep.index.to_numpy(dtype=object),
                "df": keep.to_numpy(np.int64),
                "postings": postings[keep.index].to_numpy(dtype=object),
            }
        )

    return hash_partition_apply(
        ds.map_batches(pairs, batch_format="pyarrow"), "word", per_part
    ).sort("word")


INVERTED_INDEX_SQL = r"""
WITH t AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS word
  FROM documents
)
SELECT word, CAST(count(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM t GROUP BY word HAVING count(*) >= 100 ORDER BY word
"""


# -- sensitive-term redaction ---------------------------------------------


_REDACT_PATTERN = r"\b[a-z]*(?:key|hash)[a-z]*\b"


def redact_terms(sf_dir: str) -> "rd.Dataset":
    """Scrub sensitive terms from every document (the PII/secret-redaction
    map of a crawl pipeline; here the term class is any word containing
    'key' or 'hash' — the classes a real pipeline uses, emails/SSNs/API
    keys, are the same one-regex shape).

    Pure per-row transform on two RE2 kernels
    (``pc.replace_substring_regex`` + ``pc.count_substring_regex``), so it
    streams zero-copy at any corpus size; DuckDB's regexp functions are
    RE2 too, making the oracle byte-exact. Reference analog: pattern
    facets (facets.py:591-603) — the same compiled-regex-per-worker
    discipline, applied as a rewrite instead of a check."""
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "redacted_text": pc.replace_substring_regex(
                    text, _REDACT_PATTERN, "[TERM]"
                ),
                "n_redacted": pc.cast(
                    pc.count_substring_regex(text, _REDACT_PATTERN), pa.int64()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


REDACT_TERMS_SQL = r"""
SELECT doc_id,
       regexp_replace(text, '\b[a-z]*(?:key|hash)[a-z]*\b', '[TERM]', 'g') AS redacted_text,
       CAST(len(regexp_extract_all(text, '\b[a-z]*(?:key|hash)[a-z]*\b')) AS BIGINT) AS n_redacted
FROM documents
"""


# -- decontamination -----------------------------------------------------


def decontamination(sf_dir: str, n: int = 5) -> pd.DataFrame:
    """Benchmark-leakage check: training docs sharing any word ``n``-gram
    with the held-out set (doc_ids whose md5 starts with '0' — the
    deterministic 1/16 split both engines can recompute).

    The benchmark side is small by construction (real eval sets are MBs
    against a 100-TB training corpus): its gram set is built once,
    ``ray.put`` once, and every training batch does a vectorized membership
    probe — no all-to-all join anywhere. Counts are complete per batch
    because a document never spans batches.
    """
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def is_eval(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = np.array([h[0] == "0" for h in _md5_hex(ids)])
        return batch.filter(pa.array(mask))

    eval_docs = ds.map_batches(is_eval, batch_format="pyarrow")

    def eval_grams(batch: pa.Table) -> pd.DataFrame:
        _, grams = _word_grams(batch["text"], n)
        return pd.DataFrame({"gram": pd.unique(grams)})

    gram_set = frozenset(
        eval_grams_df["gram"]
        if len(eval_grams_df := eval_docs.map_batches(eval_grams, batch_format="pyarrow").to_pandas())
        else []
    )
    gram_ref = ray.put(gram_set)
    state: dict = {}

    def probe(batch: pa.Table) -> pd.DataFrame:
        gs = state.get("g")
        if gs is None:
            gs = state["g"] = ray.get(gram_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.array([h[0] != "0" for h in _md5_hex(ids)])
        row_idx, grams = _word_grams(batch["text"], n)
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "n_contaminated": pd.Series([], dtype="int64"),
            }
        )
        if len(grams) == 0:
            return empty
        hit = np.array([g in gs for g in grams], dtype=bool)
        hit &= keep[row_idx]
        if not hit.any():
            return empty
        rows, cnt = np.unique(row_idx[hit], return_counts=True)
        return pd.DataFrame(
            {"doc_id": ids[rows].astype(np.int64), "n_contaminated": cnt.astype(np.int64)}
        )

    out = ds.map_batches(probe, batch_format="pyarrow").to_pandas()
    out["n_contaminated"] = out["n_contaminated"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


DECONTAMINATION_SQL = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents
), g AS (
  SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS gram
  FROM w, LATERAL unnest(generate_series(1, len(ws) - 4)) AS t(i)
), eval_ids AS (
  SELECT doc_id FROM documents WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
), eg AS (
  SELECT DISTINCT gram FROM g JOIN eval_ids USING (doc_id)
)
SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
FROM g JOIN eg USING (gram)
WHERE g.doc_id NOT IN (SELECT doc_id FROM eval_ids)
GROUP BY g.doc_id
ORDER BY doc_id
"""


def bloom_decontaminate(
    sf_dir: str, n: int = 5, m_bits: int = 1 << 20, n_hashes: int = 7
) -> pd.DataFrame:
    """Benchmark-leakage check with a BLOOM-FILTER broadcast — the
    bounded-memory scale path of :func:`decontamination`, exact by the
    two-phase discipline (``ops/bloom.py``).

    At 100 TB the benchmark gram SET is the broadcast problem: ~10^8
    distinct 5-gram strings are several GiB shipped to every worker.
    This variant broadcasts a fixed-geometry bit array instead
    (10 bits/key ≈ 1% FPR), built MERGEABLY (per-batch partial filters →
    driver bitwise-OR, blob-sized channel), then recovers exactness with
    ONE candidate-sized co-partitioning exchange: only bloom-POSITIVE
    (doc_id, gram) occurrences (true hits + ~FPR of the rest) meet the
    true eval grams, partitioned by gram. False positives die in the
    verify; false negatives cannot exist — so the output equals the
    exact-broadcast query bit-for-bit at ANY filter load (forced-small-
    filter test proves it at ~100% fill).
    """
    from xmlschema_ray.ops.bloom import BloomFilter
    from xmlschema_ray.ops.relational import (
        combiner_aggregate,
        copartition_apply,
        to_pandas_with_schema,
    )

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def _eval_mask(ids: np.ndarray) -> np.ndarray:
        return np.array([h[0] == "0" for h in _md5_hex(ids)])

    def eval_gram_frame(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(_eval_mask(ids)))
        if sub.num_rows == 0:
            return pd.DataFrame({"gram": pd.Series([], dtype=object)})
        _, grams = _word_grams(sub["text"], n)
        u = pd.unique(grams) if len(grams) else []
        return pd.DataFrame({"gram": pd.Series(list(u), dtype=object)})

    # real eval sets are MBs against a 100-TB corpus, so materializing the
    # per-batch-distinct gram stream is bounded by the BENCHMARK size, not
    # the corpus — and it feeds two consumers (filter build + exact verify)
    # without re-reading the input
    eval_grams = ds.map_batches(eval_gram_frame, batch_format="pyarrow").materialize()

    def bloom_partial(batch: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(m_bits, n_hashes)
        bf.add_many(batch["gram"].to_numpy())
        return pd.DataFrame({"blob": pd.Series([bf.to_bytes()], dtype=object)})

    merged = BloomFilter(m_bits, n_hashes)
    for row in eval_grams.map_batches(bloom_partial, batch_format="pandas").iter_rows():
        merged.union(BloomFilter.from_bytes(row["blob"], n_hashes))
    bits_ref = ray.put(merged.to_bytes())
    state: dict = {}

    def probe(batch: pa.Table) -> pd.DataFrame:
        f = state.get("f")
        if f is None:
            f = state["f"] = BloomFilter.from_bytes(ray.get(bits_ref), n_hashes)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = ~_eval_mask(ids)
        row_idx, grams = _word_grams(batch["text"], n)
        empty = pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"), "gram": pd.Series([], dtype=object)}
        )
        if len(grams) == 0:
            return empty
        cand = f.contains_many(grams) & keep[row_idx]
        if not cand.any():
            return empty
        return pd.DataFrame(
            {
                "doc_id": ids[row_idx[cand]].astype(np.int64),
                "gram": pd.Series(grams[cand], dtype=object),
            }
        )

    candidates = ds.map_batches(probe, batch_format="pyarrow")

    def verify(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"), "n": pd.Series([], dtype="int64")}
        )
        if not len(lf):
            return empty
        hit = lf["doc_id"][lf["gram"].isin(set(rf["gram"]))]
        if not len(hit):
            return empty
        g = hit.groupby(hit).size()
        return pd.DataFrame(
            {"doc_id": g.index.to_numpy(np.int64), "n": g.to_numpy(np.int64)}
        )

    counts = copartition_apply(candidates, eval_grams, "gram", "gram", verify)
    # a doc's candidate grams span gram-partitions; one combiner pass over
    # the candidate-bounded count stream folds them per doc
    out = to_pandas_with_schema(
        combiner_aggregate(counts, "doc_id", {"n_contaminated": ("n", "sum")})
    )
    if not len(out):
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "n_contaminated": pd.Series([], dtype="int64"),
            }
        )
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_contaminated"] = out["n_contaminated"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def pretraining_manifest(sf_dir: str) -> pd.DataFrame:
    """The composed raw-corpus → training-manifest showpiece: near-dup
    clustering → quality-aware representative selection → leakage-safe
    split → Gopher quality gate → per-source token accounting, each stage
    the repo's own oracled operator, fused into one plan:

    1. MinHash clusters computed ONCE; the labels×features join is paid
       ONCE and its materialized stream feeds both the keep-best reduce
       and the per-doc decide pass;
    2. multi-member clusters keep only their longest member
       (:func:`~xmlschema_ray.pipelines.dedup.keep_best_from_joined`); the
       keeper map is dup-cluster-sized, broadcast via ``ray.put`` (swap to
       a second ``hash_bucket_join`` past broadcast scale, the
       ``strip_dup_spans`` threshold pattern);
    3. docs whose cluster-root hash lands in 'train' (the
       ``leakage_safe_split`` rule — eval near-dups can never leak in);
    4. the Gopher keep decision (the exact factored kernel
       ``textstats.gopher_flags_batch``);
    5. per-source doc/token totals through one combiner exchange.

    Exchanges: ONE corpus-sized label×features bucket join (plus the
    clustering's own), then metadata-sized reduces. Output is
    |sources| rows.
    """
    from xmlschema_ray.ops.relational import (
        combiner_aggregate,
        hash_bucket_join,
        to_pandas_with_schema,
    )
    from xmlschema_ray.pipelines.dedup import keep_best_from_joined, minhash_lsh_dedup
    from xmlschema_ray.pipelines.textstats import gopher_flags_batch

    labels = minhash_lsh_dedup(sf_dir)

    docs = rd.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text", "source", "n_chars"]
    )

    def feats(batch: pa.Table) -> pd.DataFrame:
        g = gopher_flags_batch(batch.select(["doc_id", "text"]))
        out = g[["doc_id", "n_words"]].copy()
        out["keep_q"] = g["keep"]
        out["source"] = batch["source"].to_numpy(zero_copy_only=False)
        out["n_chars"] = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return out

    f = docs.map_batches(feats, batch_format="pyarrow")
    # ONE corpus-sized exchange total: the joined stream is materialized
    # and feeds BOTH the keep-best reduce (cluster-cardinality partials)
    # and the per-doc decide pass — no second labels×docs join
    j = hash_bucket_join(labels, f, "doc_id", "doc_id").materialize()
    kb = keep_best_from_joined(j).to_pandas()
    kb_small = kb[["cluster_root", "keep_doc_id"]].astype("int64")
    kb_ref = ray.put(kb_small)
    state: dict = {}

    def decide(b: pd.DataFrame) -> pd.DataFrame:
        drop = state.get("kb")
        if drop is None:
            drop = state["kb"] = ray.get(kb_ref)
        first = np.array([h[0] for h in _md5_hex(b["cluster_root"].to_numpy())])
        m = b.merge(drop, on="cluster_root", how="left")
        not_dropped = m["keep_doc_id"].isna().to_numpy() | (
            m["keep_doc_id"].to_numpy() == m["doc_id"].to_numpy()
        )
        sel = (first < "c") & not_dropped & (b["keep_q"].to_numpy() == 1)
        return b.loc[sel, ["source", "n_words"]].reset_index(drop=True)

    selected = j.map_batches(decide, batch_format="pandas")
    agg = combiner_aggregate(
        selected, "source", {"n_docs": (None, "count"), "n_tokens": ("n_words", "sum")}
    )
    out = to_pandas_with_schema(agg)
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def _pretraining_manifest_sql() -> str:
    from xmlschema_ray.pipelines.dedup import _MINHASH_CC_CTE

    return _MINHASH_CC_CTE + r"""
, kb AS (
  SELECT c.cluster_root, c.doc_id,
         row_number() OVER (PARTITION BY c.cluster_root ORDER BY d.n_chars DESC, c.doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY c.cluster_root) AS n_members
  FROM clusters c JOIN documents d USING (doc_id)
), keepers AS (
  SELECT cluster_root, doc_id AS keep_doc_id FROM kb WHERE rn = 1 AND n_members >= 2
), base AS (
  SELECT doc_id, source,
    list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w <> '') AS ws,
    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), w -> w <> '') AS lws,
    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS n_word_chars,
    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
      + CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT) AS n_sym
  FROM documents
), m AS (
  SELECT doc_id, source, n_word_chars, n_sym,
    CAST(length(ws) AS BIGINT) AS n_words,
    CAST(length(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT)
      AS n_alpha_words,
    CAST(CASE WHEN list_contains(lws, 'the') THEN 1 ELSE 0 END
       + CASE WHEN list_contains(lws, 'a') THEN 1 ELSE 0 END
       + CASE WHEN list_contains(lws, 'and') THEN 1 ELSE 0 END
       + CASE WHEN list_contains(lws, 'of') THEN 1 ELSE 0 END
       + CASE WHEN list_contains(lws, 'to') THEN 1 ELSE 0 END
       + CASE WHEN list_contains(lws, 'is') THEN 1 ELSE 0 END
       + CASE WHEN list_contains(lws, 'in') THEN 1 ELSE 0 END
       + CASE WHEN list_contains(lws, 'that') THEN 1 ELSE 0 END AS BIGINT) AS n_stop
  FROM base
), g AS (
  SELECT doc_id, source, n_words,
    CAST(n_words BETWEEN 30 AND 80 AS BIGINT)
      * CAST(3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words AS BIGINT)
      * CAST(10 * n_sym <= n_words AS BIGINT)
      * CAST(5 * n_alpha_words >= 4 * n_words AS BIGINT)
      * CAST(n_stop >= 2 AS BIGINT) AS keep_q
  FROM m
)
SELECT g.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(g.n_words) AS BIGINT) AS n_tokens
FROM clusters c
JOIN g ON g.doc_id = c.doc_id
LEFT JOIN keepers k ON k.cluster_root = c.cluster_root
WHERE substring(md5(CAST(c.cluster_root AS VARCHAR)), 1, 1) < 'c'
  AND (k.cluster_root IS NULL OR k.keep_doc_id = c.doc_id)
  AND g.keep_q = 1
GROUP BY g.source ORDER BY g.source
"""


# -- repetition ratio ----------------------------------------------------


def repetition_ratio(sf_dir: str, n: int = 3) -> "rd.Dataset":
    """Per-document duplicate word-``n``-gram fraction (quality signal).

    Entirely per-row, so it streams: counts and distinct-counts per
    document inside each batch; the single int→double division matches the
    SQL oracle bit-for-bit.
    """
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        row_idx, grams = _word_grams(batch["text"], n)
        if len(grams) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_grams": pd.Series([], dtype="int64"),
                    "n_distinct": pd.Series([], dtype="int64"),
                    "rep_ratio": pd.Series([], dtype="float64"),
                }
            )
        df = pd.DataFrame({"r": row_idx, "g": grams})
        agg = df.groupby("r")["g"].agg(["size", "nunique"])
        tot = agg["size"].to_numpy(np.int64)
        uni = agg["nunique"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": ids[agg.index.to_numpy()].astype(np.int64),
                "n_grams": tot,
                "n_distinct": uni,
                "rep_ratio": (tot - uni) / tot.astype(np.float64),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


REPETITION_RATIO_SQL = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents
), g AS (
  SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
  FROM w, LATERAL unnest(generate_series(1, len(ws) - 2)) AS t(i)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct,
       (COUNT(*) - COUNT(DISTINCT gram)) / CAST(COUNT(*) AS DOUBLE) AS rep_ratio
FROM g
GROUP BY doc_id
"""


# -- stratified sampling -------------------------------------------------


def stratified_sample(sf_dir: str) -> "rd.Dataset":
    """Deterministic per-source downsampling (data-mixture rebalancing).

    Each source gets a rate in {1/8, 2/8, 3/8, 4/8} derived from
    md5(source); a document is kept iff the first hex digit of
    md5(doc_id) < 2·rate·8 — integer logic on hex digits, so the sample is
    bit-reproducible by any engine with md5 and needs no state, no
    shuffle, and no coordination between partitions.
    """
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "source"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        srcs = batch["source"].to_pylist()
        d_digit = np.array([_HEX.index(h[0]) for h in _md5_hex(ids)], dtype=np.int64)
        s_digit = np.array([_HEX.index(h[0]) for h in _md5_hex(srcs)], dtype=np.int64)
        keep = d_digit < 2 * (1 + s_digit % 4)
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


STRATIFIED_SAMPLE_SQL = """
SELECT doc_id, source
FROM documents
WHERE strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
      < 2 * (1 + (strpos('0123456789abcdef', substring(md5(source), 1, 1)) - 1) % 4)
"""


# -- document chunking ---------------------------------------------------


def _split_offsets(text: "pa.ChunkedArray | pa.Array"):
    """(offsets int64[R+1], flat object words[W]) for a batch's texts."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.ascii_split_whitespace(text)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    return words.offsets.to_numpy().astype(np.int64), words.values.to_numpy(
        zero_copy_only=False
    )


_CHUNK_EMPTY = {
    "doc_id": "int64",
    "chunk_idx": "int64",
    "chunk_text": object,
    "n_words": "int64",
}


def _chunk_batch(batch: pa.Table, w: int) -> pd.DataFrame:
    """One batch of (doc_id, text) → exploded (doc_id, chunk_idx,
    chunk_text, n_words) word windows; pure integer array math over the
    flat word array plus one grouped join per chunk."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    offsets, flat = _split_offsets(batch["text"])
    n_words_row = np.diff(offsets)
    chunks_per_row = -(-n_words_row // w)
    total = int(chunks_per_row.sum())
    if total == 0:
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in _CHUNK_EMPTY.items()})
    base = np.concatenate(([0], np.cumsum(chunks_per_row)[:-1]))
    starts = np.arange(len(flat), dtype=np.int64)
    row_idx = np.searchsorted(offsets, starts, side="right") - 1
    pos = starts - offsets[row_idx]
    cid = base[row_idx] + pos // w
    chunk_text = pd.Series(flat.astype(object)).groupby(cid).agg(" ".join)
    chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(base, chunks_per_row) + 1
    n_words_c = np.minimum(w, np.repeat(n_words_row, chunks_per_row) - (chunk_idx - 1) * w)
    return pd.DataFrame(
        {
            "doc_id": np.repeat(ids, chunks_per_row).astype(np.int64),
            "chunk_idx": chunk_idx,
            "chunk_text": chunk_text.to_numpy(),
            "n_words": n_words_c.astype(np.int64),
        }
    )


def chunk_documents(sf_dir: str, w: int = 32) -> "rd.Dataset":
    """Explode each document into fixed-size word windows (the
    chunk-before-tokenize step of a training-data pipeline; the output has
    MORE rows than the input — the flat_map family).

    Entirely per-row and stateless, so it streams at any corpus size: one
    Arrow split per batch, chunk ids assigned with integer array math over
    the flat word array, one grouped join per chunk. A document never
    spans batches, so per-batch evaluation is exact."""
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(lambda b: _chunk_batch(b, w), batch_format="pyarrow")


CHUNK_DOCUMENTS_SQL = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       array_to_string(ws[(i-1)*32+1:least((i-1)*32+32, len(ws))], ' ') AS chunk_text,
       CAST(least(32, len(ws) - (i-1)*32) AS BIGINT) AS n_words
FROM w, LATERAL unnest(generate_series(1, CAST(ceil(len(ws)/32.0) AS BIGINT))) AS t(i)
"""


# -- stopword removal ----------------------------------------------------


_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that with for on as at by"
).split()


def stopword_removal(sf_dir: str) -> "rd.Dataset":
    """Rewrite each document with stopwords dropped, plus the removed-word
    count (the classic text-normalization map; same word list as the green
    ``doc_quality`` stopword_ratio oracle).

    Stateless per-row transform: split once per batch, one vectorized
    ``np.isin`` membership mask over the flat word array, one grouped join
    per surviving document — no shuffle, no state, streams at any size."""
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(_stopword_batch, batch_format="pyarrow")


def _stopword_batch(batch: pa.Table) -> pd.DataFrame:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    offsets, flat = _split_offsets(batch["text"])
    n_rows = len(ids)
    flat_obj = flat.astype(object)
    keep = ~np.isin(np.char.lower(flat.astype(str)), np.array(_STOPWORDS, dtype=object))
    starts = np.arange(len(flat), dtype=np.int64)
    row_idx = np.searchsorted(offsets, starts, side="right") - 1
    clean = np.full(n_rows, "", dtype=object)
    if keep.any():
        joined = pd.Series(flat_obj[keep]).groupby(row_idx[keep]).agg(" ".join)
        clean[joined.index.to_numpy()] = joined.to_numpy()
    n_removed = np.bincount(row_idx[~keep], minlength=n_rows)
    return pd.DataFrame(
        {
            "doc_id": ids.astype(np.int64),
            "clean_text": clean,
            "n_removed": n_removed.astype(np.int64),
        }
    )


_STOP_SQL_LIST = ",".join(f"'{s}'" for s in _STOPWORDS)

STOPWORD_REMOVAL_SQL = rf"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents
)
SELECT doc_id,
       array_to_string(list_filter(ws, x -> lower(x) NOT IN ({_STOP_SQL_LIST})), ' ') AS clean_text,
       CAST(len(ws) - len(list_filter(ws, x -> lower(x) NOT IN ({_STOP_SQL_LIST}))) AS BIGINT) AS n_removed
FROM w
"""


def encode_documents(sf_dir: str, vocab_size: int = 256) -> "rd.Dataset":
    """Tokenizer-encode step: build a frequency-ranked vocabulary (the
    ``top_words`` reduce), broadcast the word→id map, and rewrite every
    document as its comma-joined token-id sequence plus an OOV count.

    The vocab map is vocab_size entries — metadata — so encoding is a
    stateless vectorized map (one sorted-array ``searchsorted`` per batch
    over the flat word array, no per-word Python); ids are 1-based in
    (count desc, word) order with 0 = OOV, the convention both engines can
    rederive."""
    from xmlschema_ray.ops.relational import combiner_aggregate, topk

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])
    counts = combiner_aggregate(
        ds.map_batches(_gram_count_partial(1, "word"), batch_format="pyarrow"),
        "word",
        {"n": ("n", "sum")},
    )
    vocab = topk(counts, "n", vocab_size, descending=True, tiebreak=["word"]).to_pandas()
    words_sorted = np.sort(vocab["word"].to_numpy(dtype=object).astype(str))
    rank_of = {w: i + 1 for i, w in enumerate(vocab["word"])}
    ids_sorted = np.array([rank_of[w] for w in words_sorted], dtype=np.int64)

    def encode(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        offsets, flat = _split_offsets(batch["text"])
        n_rows = len(ids)
        flat_s = flat.astype(str)
        pos = np.searchsorted(words_sorted, flat_s)
        pos_c = np.clip(pos, 0, len(words_sorted) - 1)
        tok = np.where(words_sorted[pos_c] == flat_s, ids_sorted[pos_c], 0)
        starts = np.arange(len(flat), dtype=np.int64)
        row_idx = np.searchsorted(offsets, starts, side="right") - 1
        joined = np.full(n_rows, "", dtype=object)
        if len(tok):
            s = pd.Series(tok.astype(str), dtype=object).groupby(row_idx).agg(",".join)
            joined[s.index.to_numpy()] = s.to_numpy()
        n_oov = np.bincount(row_idx[tok == 0], minlength=n_rows) if len(tok) else np.zeros(n_rows, dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "token_ids": joined,
                "n_oov": n_oov.astype(np.int64),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


ENCODE_DOCUMENTS_SQL = r"""
WITH w AS (
  -- filter '' so an empty/whitespace-only document has ZERO words, matching
  -- Arrow's ascii_split_whitespace (regexp_split of '' yields [''])
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
  FROM documents
), cnt AS (
  SELECT word, count(*) AS n FROM (SELECT unnest(ws) AS word FROM w) GROUP BY word
), vocab AS (
  SELECT word, row_number() OVER (ORDER BY n DESC, word) AS id
  FROM cnt ORDER BY n DESC, word LIMIT 256
), tok AS (
  SELECT doc_id, i, ws[i] AS word
  FROM w, LATERAL unnest(generate_series(1, len(ws))) AS t(i)
)
SELECT tok.doc_id,
       string_agg(CAST(COALESCE(vocab.id, 0) AS VARCHAR), ',' ORDER BY i) AS token_ids,
       CAST(count(*) FILTER (WHERE vocab.id IS NULL) AS BIGINT) AS n_oov
FROM tok LEFT JOIN vocab USING (word)
GROUP BY tok.doc_id
"""


# -- deterministic shuffle export ------------------------------------------


def deterministic_shuffle(sf_dir: str, n_shards: int = 8, seed: str = "s42") -> "rd.Dataset":
    """Seeded global shuffle for training export: every document gets an
    exact global position in the md5(seed:doc_id) order plus a round-robin
    shard id — the reshuffle a trainer runs between epochs, made
    bit-reproducible on any engine.

    The total order is (hash, doc_id); the exact position comes from the
    shared :func:`~xmlschema_ray.ops.relational.global_rank` machinery
    (sampled range boundaries + metadata-sized prefix sums — no global
    sort, no fact-sized driver state). md5 is the portable-hash choice the
    oracle can recompute; a closed deployment would swap in a vectorized
    128-bit hash behind the same two columns."""
    from xmlschema_ray.ops.relational import global_rank

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id"])

    def keyed(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {"doc_id": ids, "__h": _md5_hex([f"{seed}:{i}" for i in ids])}
        )

    ranked, _total = global_rank(
        ds.map_batches(keyed, batch_format="pyarrow"), ["__h", "doc_id"], rank_col="pos"
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        pos = batch["pos"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64),
                "pos": pos,
                "shard": (pos - 1) % n_shards,
            }
        )

    return ranked.map_batches(finish, batch_format="pandas").sort("pos")


DETERMINISTIC_SHUFFLE_SQL = """
WITH r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY md5('s42:' || CAST(doc_id AS VARCHAR)), doc_id) AS pos
  FROM documents
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos, CAST((pos - 1) % 8 AS BIGINT) AS shard
FROM r
ORDER BY pos
"""


# -- percentile length filter ----------------------------------------------


def longest_quartile_docs(sf_dir: str) -> "rd.Dataset":
    """Quantile-based curation filter: keep the longest 25% of the corpus
    by exact global rank (the length-percentile cut of a C4-style cleaning
    stack, with ties broken by doc_id so both engines keep the identical
    set). Rank is exact and distributed (:func:`global_rank`); only the
    per-range counts touch the driver."""
    from xmlschema_ray.ops.relational import global_rank

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "n_chars"])

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch["__neg"] = -batch["n_chars"].to_numpy(np.int64)
        return batch

    ranked, total = global_rank(
        ds.map_batches(keyed, batch_format="pandas"), ["__neg", "doc_id"], rank_col="len_rank"
    )
    cut = total // 4

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch.loc[batch["len_rank"] <= cut]
        return pd.DataFrame(
            {
                "doc_id": keep["doc_id"].to_numpy(np.int64),
                "n_chars": keep["n_chars"].to_numpy(np.int64),
                "len_rank": keep["len_rank"].to_numpy(np.int64),
            }
        )

    return ranked.map_batches(finish, batch_format="pandas").sort("len_rank")


LONGEST_QUARTILE_SQL = """
SELECT doc_id, n_chars,
       CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS len_rank
FROM documents
QUALIFY len_rank <= (SELECT count(*) // 4 FROM documents)
ORDER BY len_rank
"""


# -- sequence packing ----------------------------------------------------


def pack_token_windows(sf_dir: str, window: int = 256) -> "rd.Dataset":
    """Cross-document sequence packing: concatenate all documents in
    doc_id order and cut fixed-size training windows; emit one row per
    (window, document) overlap segment — the packing manifest a trainer
    consumes (which docs feed window w, and how many tokens each
    contributes).

    The only global state is the running token offset, computed the
    scale-safe way (the ``orders_price_ntile`` machinery): range-partition
    by doc_id via sampled boundaries, per-partition token TOTALS (one row
    per partition) prefix-sum on the driver, then every partition derives
    its documents' absolute offsets locally — windows crossing partition
    boundaries agree because offsets are exact. No fact-sized driver
    state at any corpus size."""
    import ray

    from xmlschema_ray.ops.relational import (
        combiner_aggregate,
        derive_num_partitions,
        hash_partition_apply,
        sample_range_bounds,
    )

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def counts(batch: pa.Table) -> pd.DataFrame:
        offsets, _ = _split_offsets(batch["text"])
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                "nw": np.diff(offsets).astype(np.int64),
            }
        )

    cnt = ds.map_batches(counts, batch_format="pyarrow")

    n_parts = derive_num_partitions()
    # bounded-driver boundary sample (O(n_parts) at any corpus size)
    b = sample_range_bounds(cnt, ["doc_id"], n_parts)
    bounds = b[0] if b is not None else np.array([], dtype=np.int64)

    def add_pid(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch["part_id"] = np.searchsorted(bounds, batch["doc_id"].to_numpy(), side="right").astype(
            np.int64
        )
        return batch

    with_pid = cnt.map_batches(add_pid, batch_format="pandas")
    totals = (
        combiner_aggregate(with_pid, keys="part_id", aggs={"w": ("nw", "sum")})
        .to_pandas()
        .sort_values("part_id")
    )
    base: Dict[int, int] = {}
    run = 0
    for pid, w in zip(totals["part_id"], totals["w"]):
        base[int(pid)] = run
        run += int(w)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for pid, gg in g.groupby("part_id", sort=False):
            gg = gg.sort_values("doc_id")
            nw = gg["nw"].to_numpy(np.int64)
            start = base[int(pid)] + np.concatenate(([0], np.cumsum(nw)[:-1]))
            end = start + nw - 1
            n_seg = end // window - start // window + 1
            seg = np.arange(int(n_seg.sum()), dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(n_seg)[:-1])), n_seg
            )
            wid = np.repeat(start // window, n_seg) + seg
            s_rep, e_rep = np.repeat(start, n_seg), np.repeat(end, n_seg)
            n_words = np.minimum((wid + 1) * window - 1, e_rep) - np.maximum(wid * window, s_rep) + 1
            outs.append(
                pd.DataFrame(
                    {
                        "window_id": wid,
                        "doc_id": np.repeat(gg["doc_id"].to_numpy(np.int64), n_seg),
                        "n_words": n_words.astype(np.int64),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    return hash_partition_apply(with_pid, "part_id", per_part).sort(["window_id", "doc_id"])


PACK_TOKEN_WINDOWS_SQL = r"""
WITH w AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS nw
  FROM documents
), o AS (
  SELECT doc_id, nw,
         COALESCE(SUM(nw) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
  FROM w
)
SELECT CAST(wid AS BIGINT) AS window_id,
       doc_id,
       CAST(least((wid + 1) * 256 - 1, s + nw - 1) - greatest(wid * 256, s) + 1 AS BIGINT) AS n_words
FROM o, LATERAL unnest(generate_series(CAST(s // 256 AS BIGINT),
                                       CAST((s + nw - 1) // 256 AS BIGINT))) AS t(wid)
ORDER BY window_id, doc_id
"""


# -- token-budget mixture sampling ----------------------------------------


def token_budget_mixture(
    sf_dir: str,
    budgets: Optional[Dict[str, int]] = None,
    seed: str = "mix42",
    materialize_below_bytes: int = 1 << 30,
) -> "rd.Dataset":
    """Token-budget mixture sampling: the data-mixing primitive of a
    pre-training run ("give me B_s tokens from each source s"). Documents
    are taken per source in a seeded deterministic order (md5(seed:doc_id),
    the :func:`deterministic_shuffle` hash) until that source's TOKEN
    budget fills; a document is kept iff the tokens selected before it are
    still under budget, so the crossing document is included and the kept
    set is exactly a prefix of the seeded order — bit-reproducible on any
    engine, no RNG state.

    Scale shape (the :func:`pack_token_windows` machinery): a counting
    pass (below ``materialize_below_bytes`` of input the narrow hashed
    stream is pinned once in the spillable object store, so the boundary
    sample, the totals pass and the candidate pass share ONE per-row
    hashing pass; above the gate the stream is fact-sized and lazy
    re-execution is the streaming-honest choice — the hash then runs once
    per consuming pass), range-partition on the hash via bounded-driver
    sampled boundaries, per-(partition, source) token+count TOTALS (metadata-sized:
    partitions × sources rows — mixture source sets are small by nature),
    driver prefix sums per source, then every partition derives its rows'
    exact per-source token offsets and ranks locally and applies the
    budget cut. No global sort, no fact-sized driver state.

    The exchange is BUDGET-bounded, not corpus-bounded: kept documents
    are by construction the lowest-hash prefix of each source, so any
    (partition, source) whose driver-known BASE offset already meets the
    budget is dropped BEFORE the shuffle (a metadata-sized allowed-pair
    merge). Sampling 1B tokens out of 100 TB ships ~1B tokens' worth of
    rows through the exchange, not the corpus.

    ``budgets`` maps source -> token budget; the default derives
    ``200 + 60*i`` for the synthetic corpus's ``src{i}`` sources so the
    cut is exercised at every scale factor. Output: one row per kept
    document ``(doc_id, source, n_tok, cum_tokens, pick_pos)`` sorted by
    (source, pick_pos), where ``cum_tokens`` is the source's running token
    total including this document and ``pick_pos`` its 1-based position in
    the seeded order.
    """
    from xmlschema_ray.ops.relational import (
        combiner_aggregate,
        derive_num_partitions,
        hash_partition_apply,
        sample_range_bounds,
    )

    def _budget(src: str) -> int:
        if budgets is not None:
            return int(budgets.get(src, 0))
        digits = "".join(ch for ch in src if ch.isdigit())
        return 200 + 60 * int(digits or 0)

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text", "source"])

    def keyed(batch: pa.Table) -> pd.DataFrame:
        offsets, _ = _split_offsets(batch["text"])
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "source": batch["source"].to_numpy(zero_copy_only=False),
                "n_tok": np.diff(offsets).astype(np.int64),
                "__h": _md5_hex([f"{seed}:{i}" for i in ids]),
            }
        )

    cnt = ds.map_batches(keyed, batch_format="pyarrow")
    try:
        in_bytes = os.path.getsize(table_path(sf_dir, "documents"))
    except OSError:
        in_bytes = materialize_below_bytes + 1
    if in_bytes <= materialize_below_bytes:
        cnt = cnt.materialize()
    n_parts = derive_num_partitions()
    b = sample_range_bounds(cnt, ["__h"], n_parts)
    bounds = b[0] if b is not None else np.array([], dtype=object)

    def add_pid(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch["part_id"] = np.searchsorted(bounds, batch["__h"].to_numpy(), side="right").astype(
            np.int64
        )
        return batch

    with_pid = cnt.map_batches(add_pid, batch_format="pandas")
    totals = (
        combiner_aggregate(
            with_pid,
            keys=["part_id", "source"],
            aggs={"w": ("n_tok", "sum"), "c": ("n_tok", "count")},
        )
        .to_pandas()
        .sort_values(["source", "part_id"])
    )
    tok_base: Dict[Tuple[int, str], int] = {}
    cnt_base: Dict[Tuple[int, str], int] = {}
    for src, g in totals.groupby("source", sort=False):
        tw = cr = 0
        for pid, w, c in zip(g["part_id"], g["w"], g["c"]):
            tok_base[(int(pid), src)] = tw
            cnt_base[(int(pid), src)] = cr
            tw += int(w)
            cr += int(c)

    allowed_pairs = [(p, s) for (p, s), base in tok_base.items() if base < _budget(s)]
    if not allowed_pairs:
        return _TOKEN_MIX_EMPTY.copy()
    allowed = pd.DataFrame(
        {
            "part_id": np.array([p for p, _ in allowed_pairs], dtype=np.int64),
            "source": np.array([s for _, s in allowed_pairs], dtype=object),
        }
    )

    def prefilter(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(allowed, on=["part_id", "source"])

    candidates = with_pid.map_batches(prefilter, batch_format="pandas")

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for (pid, src), gg in g.groupby(["part_id", "source"], sort=False):
            gg = gg.sort_values(["__h", "doc_id"])
            nt = gg["n_tok"].to_numpy(np.int64)
            before = tok_base[(int(pid), src)] + np.concatenate(([0], np.cumsum(nt)[:-1]))
            pos = cnt_base[(int(pid), src)] + np.arange(1, len(gg) + 1, dtype=np.int64)
            keep = before < _budget(src)
            if not keep.any():
                continue
            outs.append(
                pd.DataFrame(
                    {
                        "doc_id": gg["doc_id"].to_numpy(np.int64)[keep],
                        "source": gg["source"].to_numpy()[keep],
                        "n_tok": nt[keep],
                        "cum_tokens": (before + nt)[keep],
                        "pick_pos": pos[keep],
                    }
                )
            )
        if not outs:
            return _TOKEN_MIX_EMPTY.copy()
        return pd.concat(outs, ignore_index=True)

    from xmlschema_ray.pipelines.common import sorted_or_typed_empty

    return sorted_or_typed_empty(
        hash_partition_apply(candidates, "part_id", per_part),
        ["source", "pick_pos"],
        template=_TOKEN_MIX_EMPTY,
    )


_TOKEN_MIX_EMPTY = pd.DataFrame(
    {
        "doc_id": np.array([], dtype=np.int64),
        "source": pd.Series([], dtype=object),
        "n_tok": np.array([], dtype=np.int64),
        "cum_tokens": np.array([], dtype=np.int64),
        "pick_pos": np.array([], dtype=np.int64),
    }
)


TOKEN_BUDGET_MIXTURE_SQL = r"""
WITH w AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok,
         md5('mix42:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), o AS (
  SELECT doc_id, source, n_tok,
         COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
  FROM w
)
SELECT doc_id, source, n_tok,
       CAST(before + n_tok AS BIGINT) AS cum_tokens,
       CAST(rk AS BIGINT) AS pick_pos
FROM o
WHERE before < 200 + 60 * CAST(substr(source, 4) AS BIGINT)
ORDER BY source, pick_pos
"""


def dup_gram_fraction(sf_dir: str, n: int = 3) -> "rd.Dataset":
    """Cross-document duplicate-gram fraction (the corpus-level
    complement of :func:`repetition_ratio`): for every document, the
    fraction of its DISTINCT word ``n``-grams that also occur in at
    least one OTHER document — the Gopher-style "duplicated content"
    filter signal that drives near-boilerplate removal.

    Scale shape: each distinct (doc, gram) pair is emitted ONCE (per-doc
    dedup inside the batch; a document never spans batches, so per-batch
    distinct pairs are globally distinct). One gram-keyed exchange
    co-locates all holders of a gram, so the global doc-frequency of
    every gram is complete inside its partition — each partition emits
    per-doc (dup, total) PARTIALS, and a second combiner-sized exchange
    on doc_id sums them. Strings ship exactly once; the second exchange
    moves O(docs × partitions-touched) partial rows, not pairs. A
    corpus-wide hot gram bounds one partition at #docs rows — at that
    extreme, pre-count per-batch (gram, batch_df) partials and broadcast
    the dup-gram set instead; the pair exchange here is the general
    exact path.
    """
    from xmlschema_ray.ops.relational import combiner_aggregate, hash_partition_apply

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def pairs(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        row_idx, grams = _word_grams(batch["text"], n)
        if len(grams) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "gram": pd.Series([], dtype=object),
                }
            )
        return pd.DataFrame(
            {"doc_id": ids[row_idx].astype(np.int64), "gram": grams.astype(str)}
        ).drop_duplicates(ignore_index=True)

    pair_ds = ds.map_batches(pairs, batch_format="pyarrow")

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "dup_part": pd.Series([], dtype="int64"),
                    "tot_part": pd.Series([], dtype="int64"),
                }
            )
        # distinct pairs ⇒ per-gram row count IS the doc-frequency
        df_per_pair = g.groupby("gram", sort=False)["gram"].transform("size")
        dup = (df_per_pair.to_numpy() >= 2).astype(np.int64)
        agg = (
            pd.DataFrame({"doc_id": g["doc_id"].to_numpy(), "dup": dup})
            .groupby("doc_id", sort=False)["dup"]
            .agg(["sum", "size"])
        )
        return pd.DataFrame(
            {
                "doc_id": agg.index.to_numpy().astype(np.int64),
                "dup_part": agg["sum"].to_numpy(np.int64),
                "tot_part": agg["size"].to_numpy(np.int64),
            }
        )

    partials = hash_partition_apply(pair_ds, "gram", per_part)
    out = combiner_aggregate(
        partials,
        "doc_id",
        {"n_dup": ("dup_part", "sum"), "n_distinct": ("tot_part", "sum")},
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        nd = b["n_dup"].to_numpy(np.int64)
        nt = b["n_distinct"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "n_dup": nd,
                "n_distinct": nt,
                "dup_frac": nd / nt.astype(np.float64),
            }
        )

    return out.map_batches(finish, batch_format="pandas").sort("doc_id")


def distinctive_terms_by_source(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Per-source distinctive vocabulary: top-``k`` words ranked by the
    share of a word's GLOBAL occurrences concentrated in that source
    (``tf_source / tf_global`` — the exact-rational cousin of per-group
    TF-IDF; a word used only by one source scores 1.0). The data-mixture
    diagnostic that surfaces what each source uniquely contributes.

    Scale shape: per-batch (source, word) count partials (combiner — one
    row per distinct pair per batch, never per occurrence) collapse to
    the vocab×sources table, which is metadata-sized relative to the
    corpus. Global totals attach inside a word-keyed exchange (every
    holder of a word co-located ⇒ the partition-local sum IS the global
    tf), per-source top-k inside a source-keyed exchange — partial top-k
    only, no global sort. All counts stay integers until one division,
    so ranks and shares are bit-exact vs the SQL oracle.
    """
    from xmlschema_ray.ops.relational import combiner_aggregate, hash_partition_apply

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["source", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        srcs = batch["source"].to_numpy(zero_copy_only=False)
        row_idx, words = _word_grams(batch["text"], 1)
        if len(words) == 0:
            return pd.DataFrame(
                {
                    "source": pd.Series([], dtype=object),
                    "word": pd.Series([], dtype=object),
                    "tf": pd.Series([], dtype="int64"),
                }
            )
        agg = (
            pd.DataFrame({"source": srcs[row_idx], "word": words.astype(str)})
            .groupby(["source", "word"], sort=False)
            .size()
        )
        return agg.rename("tf").reset_index()

    sw = combiner_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "word"],
        {"tf": ("tf", "sum")},
    )

    def attach_global(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy(deep=False)
        out["gtf"] = (
            g.groupby("word", sort=False)["tf"].transform("sum").to_numpy().astype(np.int64)
        )
        return out

    def per_source_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy(deep=False)
        g["share"] = g["tf"].to_numpy(np.int64) / g["gtf"].to_numpy(np.int64).astype(
            np.float64
        )
        outs = [
            gg.sort_values(
                ["share", "tf", "word"], ascending=[False, False, True], kind="mergesort"
            ).head(k)
            for _, gg in g.groupby("source", sort=False)
        ]
        return (
            pd.concat(outs, ignore_index=True)
            if outs
            else g.head(0).reset_index(drop=True)
        )

    out = hash_partition_apply(
        hash_partition_apply(sw, "word", attach_global), "source", per_source_topk
    ).to_pandas()
    out["tf"] = out["tf"].astype("int64")
    out["gtf"] = out["gtf"].astype("int64")
    return out.sort_values(
        ["source", "share", "tf", "word"], ascending=[True, False, False, True]
    ).reset_index(drop=True)


DISTINCTIVE_TERMS_SQL = r"""
WITH w AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
  FROM documents
), sw AS (
  SELECT source, word, COUNT(*) AS tf FROM w WHERE word <> '' GROUP BY source, word
), g AS (
  SELECT word, SUM(tf) AS gtf FROM sw GROUP BY word
), r AS (
  SELECT sw.source, sw.word,
         CAST(tf AS BIGINT) AS tf, CAST(gtf AS BIGINT) AS gtf,
         tf / CAST(gtf AS DOUBLE) AS share,
         row_number() OVER (
           PARTITION BY sw.source
           ORDER BY tf / CAST(gtf AS DOUBLE) DESC, tf DESC, sw.word
         ) AS rn
  FROM sw JOIN g USING (word)
)
SELECT source, word, tf, gtf, share FROM r WHERE rn <= 5
ORDER BY source, share DESC, tf DESC, word
"""


DUP_GRAM_FRACTION_SQL = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents
), g AS (
  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
  FROM w, LATERAL unnest(generate_series(1, len(ws) - 2)) AS t(i)
), df AS (
  SELECT gram, COUNT(*) AS df FROM g GROUP BY gram
)
SELECT g.doc_id,
       CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE) AS dup_frac
FROM g JOIN df USING (gram)
GROUP BY g.doc_id
ORDER BY doc_id
"""


def curation_pipeline(sf_dir: str, prefix_words: int = 5) -> "rd.Dataset":
    """The composed curation showpiece — quality filter → boilerplate
    dedup → token accounting, fused into ONE streaming plan (the
    raw-crawl-to-training-set path every pretraining job runs):

    1. per-batch quality gate (stopword ratio ≥ .05, alpha ratio ≥ .5,
       ≥ 10 tokens — the same vectorized kernels as ``doc_quality``);
    2. leading-``prefix_words`` boilerplate dedup: survivors sharing
       their first words collapse to the lowest doc_id (one fp-keyed
       exchange, argmin in-partition — the ``exact_dedup`` shape with
       a short derived key, so the only all-to-all ships ~40-byte
       prefixes of FILTERED rows, not documents);
    3. per-survivor token counts, canonical sort kept in Ray.

    Stage order matters at scale: filtering before the exchange means
    the shuffle pays only for rows that can still win.
    """
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    from xmlschema_ray.functions.text import STOPWORDS
    from xmlschema_ray.ops.relational import hash_partition_apply

    stop_set = pa.array(sorted(STOPWORDS))

    def stage(batch: pa.Table) -> pd.DataFrame:
        # ONE tokenization serves all three gate features AND the dedup
        # prefix (the quality_features kernels would tokenize a second
        # time and pay for mean_tok_len, which this gate discards)
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.ascii_split_whitespace(text)
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        n_tokens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = words.offsets.to_numpy()
        is_stop = pc.is_in(pc.utf8_lower(words.values), value_set=stop_set).to_numpy(
            zero_copy_only=False
        )
        cs = np.concatenate(([0], np.cumsum(is_stop.astype(np.int64))))
        stop_counts = cs[offsets[1:]] - cs[offsets[:-1]]
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        n_alpha = (
            pc.count_substring_regex(text, "[A-Za-z]")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = n_tokens >= 10
        with np.errstate(divide="ignore", invalid="ignore"):
            keep &= stop_counts / n_tokens.astype(np.float64) >= 0.05
            keep &= n_alpha / n_chars.astype(np.float64) >= 0.5
        prefix = pc.binary_join(pc.list_slice(words, 0, prefix_words), " ")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False)[keep].astype(np.int64),
                "prefix": prefix.to_numpy(zero_copy_only=False)[keep],
                "n_tokens": n_tokens[keep],
            }
        )

    survivors = ds.map_batches(stage, batch_format="pyarrow")

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g.reset_index(drop=True)
        idx = g.groupby("prefix", sort=False)["doc_id"].idxmin()
        return g.loc[idx].reset_index(drop=True)

    return (
        hash_partition_apply(survivors, "prefix", keep_first)
        .select_columns(["doc_id", "n_tokens"])
        .sort("doc_id")
    )


def quota_sample(sf_dir: str, quota: int = 20) -> "rd.Dataset":
    """EXACT-quota deterministic sampling: the ``quota`` docs with the
    smallest ``md5(doc_id)`` per source — fixed-size per-stratum
    selection (eval-set construction, per-source debugging samples),
    reproducible on any engine, vs :func:`stratified_sample`'s
    rate-based thinning whose output size is only expected.

    Combiner shape: each batch pre-trims to its own per-source
    smallest-``quota`` rows (a batch can contribute at most ``quota``
    winners per source), so the single source-keyed exchange moves
    O(sources × quota × batches) candidate rows, never the corpus; the
    final trim is one vectorized sort+head per co-located source.
    """
    from xmlschema_ray.ops.relational import hash_partition_apply

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "source"])

    def keyed_partial(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {
                "doc_id": ids,
                "source": batch["source"].to_numpy(zero_copy_only=False),
                "h": _md5_hex(ids),
            }
        )
        return (
            df.sort_values(["source", "h", "doc_id"], kind="mergesort")
            .groupby("source", sort=False)
            .head(quota)
            .reset_index(drop=True)
        )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(["source", "h", "doc_id"], kind="mergesort")
            .groupby("source", sort=False)
            .head(quota)
            .reset_index(drop=True)
        )

    return (
        hash_partition_apply(ds.map_batches(keyed_partial, batch_format="pyarrow"), "source", per_part)
        .select_columns(["doc_id", "source"])
        .sort("doc_id")
    )


QUOTA_SAMPLE_SQL = """
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
)
SELECT doc_id, source FROM r WHERE rn <= 20
ORDER BY doc_id
"""


CURATION_PIPELINE_SQL = r"""
WITH q AS (
  SELECT doc_id, text,
         CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         CAST(length(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                 w -> w IN ('the','a','an','and','or','of','to','in','is','are',
                                            'was','were','be','been','it','this','that','with',
                                            'for','on','as','at','by'))) AS DOUBLE)
           / length(regexp_split_to_array(trim(text), '\s+')) AS stopword_ratio,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
           / length(text) AS alpha_ratio
  FROM documents
), f AS (
  SELECT doc_id, n_tokens,
         array_to_string((regexp_split_to_array(trim(text), '\s+'))[1:5], ' ') AS prefix
  FROM q
  WHERE stopword_ratio >= 0.05 AND alpha_ratio >= 0.5 AND n_tokens >= 10
), d AS (
  SELECT doc_id, n_tokens,
         row_number() OVER (PARTITION BY prefix ORDER BY doc_id) AS rn
  FROM f
)
SELECT doc_id, n_tokens FROM d WHERE rn = 1
ORDER BY doc_id
"""


# -- DSIR importance-resampling selection ---------------------------------


_DSIR_BUCKETS = 256


def _md5_bucket256(values: np.ndarray) -> np.ndarray:
    """First-two-hex-digit md5 bucket in [0, 256) — the portable hashed
    feature index any engine with md5 can recompute (same convention as
    :func:`stratified_sample`'s hex-digit arithmetic). A production run
    would swap in a vectorized 64-bit hash here; only the bucket
    assignment changes, not the operator's shape."""
    h = _md5_hex(values)
    return np.array(
        [16 * _HEX.index(x[0]) + _HEX.index(x[1]) for x in h], dtype=np.int64
    )


_DSIR_EMPTY = pd.DataFrame(
    {
        "doc_id": np.array([], dtype=np.int64),
        "lang": pd.Series([], dtype=object),
        "n_feats": np.array([], dtype=np.int64),
        "weight": np.array([], dtype=np.int64),
    }
)


def _dsir_feature_rows(batch: pa.Table) -> Tuple[np.ndarray, np.ndarray]:
    """(row_index, bucket) for every hashed unigram+bigram feature in the
    batch — DSIR's hashed bag-of-ngrams featurization. ONE tokenization
    (:func:`_split_words`) feeds both gram sizes; md5 runs once per
    DISTINCT gram per batch (Zipf makes distinct ≪ total) and fans back
    out through ``np.unique``'s inverse index."""
    offsets, flat = _split_words(batch["text"])
    ridx_all = []
    gram_all = []
    for n_ in (1, 2):
        ridx, parts = _gram_parts_from_flat(offsets, flat, n_)
        grams = parts[0]
        for p in parts[1:]:
            grams = grams + " " + p
        ridx_all.append(ridx)
        gram_all.append(grams)
    ridx = np.concatenate(ridx_all)
    grams = np.concatenate(gram_all)
    if len(grams) == 0:
        return ridx, np.array([], dtype=np.int64)
    grams = grams.astype(str)
    # Arrow's split keeps the empty boundary field an empty text produces
    # (CLAUDE.md: ascii_split_whitespace('') → ['']); the oracle's
    # regexp_split_to_array does too, and filters it with gram <> ''
    keep = grams != ""
    if not keep.all():
        ridx, grams = ridx[keep], grams[keep]
    uniq, inv = np.unique(grams, return_inverse=True)
    return ridx, _md5_bucket256(uniq)[inv]


def dsir_selection(sf_dir: str, target_lang: str = "en", k: int = 100) -> "rd.Dataset":
    """DSIR data selection (Xie et al. 2023, *Data Selection for Language
    Models via Importance Resampling*): score every document by how much
    more likely its hashed n-gram features are under a TARGET distribution
    (here: the ``lang == target_lang`` slice) than under the raw corpus,
    then keep the top-k — the standard recipe for skewing a pretraining
    mixture toward a high-quality / in-domain subset.

    Distributed shape (two streaming passes, zero fact-sized state):

    1. **Feature counts.** Each batch emits ≤ ``_DSIR_BUCKETS`` partial
       rows (bucket, target_n, global_n) — a bounded combiner regardless
       of corpus size — reduced by :func:`combiner_aggregate` to one
       ≤256-row model. At 100 TB the only exchange ships
       O(batches × 256) rows.
    2. **Scoring.** The per-bucket log-importance-ratio table (256 int64s;
       add-1 smoothed, scaled to ppm so per-doc accumulation stays in
       INTEGER arithmetic — no float summation order exists) broadcasts
       once via ``ray.put``; each batch scores vectorized (unique-gram md5
       → bucket → table lookup → one groupby sum). Selection is
       :func:`~xmlschema_ray.ops.relational.topk` — per-batch partial
       top-k, no global sort.

    The paper resamples with Gumbel noise; this operator takes the
    deterministic top-k (ties broken by doc_id) so the selection is
    reproducible and oracle-checkable — the sampled variant is the same
    pipeline with a seeded-Gumbel term added to the sort key. Docs with
    no grams have no features and are excluded (as in the SQL inner
    join). Reference analog: assertion-style row scoring
    (/root/reference/xmlschema/validators/facets.py:606-628) driving a
    selection predicate.
    """
    from xmlschema_ray.ops.relational import combiner_aggregate, topk
    from xmlschema_ray.pipelines.common import dataset_or_typed_empty, scaled_int

    B = _DSIR_BUCKETS
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "lang", "text"])

    def counts_partial(batch: pa.Table) -> pd.DataFrame:
        ridx, b = _dsir_feature_rows(batch)
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "b": np.array([], dtype=np.int64),
                    "tn": np.array([], dtype=np.int64),
                    "gn": np.array([], dtype=np.int64),
                }
            )
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        is_t = (langs == target_lang).astype(np.int64)[ridx]
        g = (
            pd.DataFrame({"b": b, "t": is_t})
            .groupby("b", sort=False)
            .agg(tn=("t", "sum"), gn=("t", "size"))
            .reset_index()
        )
        return g.astype({"b": np.int64, "tn": np.int64, "gn": np.int64})

    model = combiner_aggregate(
        ds.map_batches(counts_partial, batch_format="pyarrow"),
        "b",
        {"tn": ("tn", "sum"), "gn": ("gn", "sum")},
    ).to_pandas()
    if len(model) == 0:
        return _DSIR_EMPTY.copy()
    T = float(model["tn"].sum())
    G = float(model["gn"].sum())
    tn = model["tn"].to_numpy(np.int64).astype(np.float64)
    gn = model["gn"].to_numpy(np.int64).astype(np.float64)
    # add-1 smoothing over the fixed B-bucket feature space; ONE float op
    # per bucket (not per doc), scaled to ppm so doc scores are int64 sums
    ratio = ((tn + 1.0) * (G + float(B))) / ((gn + 1.0) * (T + float(B)))
    r = np.zeros(B, dtype=np.int64)
    r[model["b"].to_numpy(np.int64)] = scaled_int(np.log(ratio), 1e6)
    r_ref = ray.put(r)
    state: dict = {}

    def score(batch: pa.Table) -> pd.DataFrame:
        rv = state.get("r")
        if rv is None:
            rv = state["r"] = ray.get(r_ref)
        ridx, b = _dsir_feature_rows(batch)
        if len(b) == 0:
            return _DSIR_EMPTY.copy()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        g = (
            pd.DataFrame({"doc_id": ids[ridx], "lang": langs[ridx], "rv": rv[b]})
            .groupby("doc_id", sort=False)
            .agg(lang=("lang", "first"), n_feats=("rv", "size"), weight=("rv", "sum"))
            .reset_index()
        )
        return g.astype({"doc_id": np.int64, "n_feats": np.int64, "weight": np.int64})

    out = topk(
        ds.map_batches(score, batch_format="pyarrow"),
        "weight",
        k,
        descending=True,
        tiebreak=["doc_id"],
    )
    return dataset_or_typed_empty(out, _DSIR_EMPTY)


DSIR_SELECTION_SQL = r"""
WITH w AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents
), g AS (
  SELECT doc_id, lang, ws[i] AS gram
  FROM w, LATERAL unnest(generate_series(1, len(ws))) AS t(i)
  UNION ALL
  SELECT doc_id, lang, array_to_string(ws[i:i+1], ' ') AS gram
  FROM w, LATERAL unnest(generate_series(1, len(ws) - 1)) AS t(i)
), f AS (
  SELECT doc_id, lang,
         (strpos('0123456789abcdef', substring(md5(gram), 1, 1)) - 1) * 16
         + strpos('0123456789abcdef', substring(md5(gram), 2, 1)) - 1 AS b
  FROM g WHERE gram <> ''
), c AS (
  SELECT b,
         COUNT(*) FILTER (WHERE lang = 'en') AS tn,
         COUNT(*) AS gn
  FROM f GROUP BY b
), tot AS (
  SELECT SUM(tn) AS t_total, SUM(gn) AS g_total FROM c
), r AS (
  SELECT b,
         CAST(floor(1000000.0 * ln(
           ((tn + 1.0) * (g_total + 256.0)) / ((gn + 1.0) * (t_total + 256.0))
         ) + 0.5) AS BIGINT) AS rv
  FROM c, tot
), s AS (
  SELECT f.doc_id,
         any_value(f.lang) AS lang,
         COUNT(*) AS n_feats,
         SUM(r.rv) AS weight
  FROM f JOIN r USING (b)
  GROUP BY f.doc_id
)
SELECT doc_id, lang, CAST(n_feats AS BIGINT) AS n_feats, CAST(weight AS BIGINT) AS weight
FROM s
ORDER BY weight DESC, doc_id
LIMIT 100
"""


# budget/epoch-cap pair calibrated so the waterfill exercises BOTH
# regimes on the fixtures: at sf0.001/sf0.01 the four tail languages hit
# their 1-epoch caps and the head language absorbs the slack (mixed), at
# sf0.1 every cap clears the waterline (uniform shares)
UNIMAX_BUDGET = 20_000
UNIMAX_MAX_EPOCHS = 1


def waterfill_alloc(caps: np.ndarray, budget: int) -> np.ndarray:
    """Waterfilling over ascending caps: rows whose cap sits under the
    waterline get the full cap, the rest split the remainder evenly
    (``⌊(budget − prefix)/(n − k)⌋``). If the total cap fits the budget
    no waterline exists and every row is capped."""
    n = len(caps)
    prefix = np.concatenate([[0], np.cumsum(caps)[:-1]])
    alloc = caps.astype(np.int64).copy()
    # first row (cap asc) whose cap meets the remaining even share fixes W
    for k in range(n):
        if caps[k] * (n - k) + prefix[k] >= budget:
            w = (float(budget) - float(prefix[k])) / float(n - k)
            alloc[k:] = np.int64(np.floor(w))
            break
    return alloc


def unimax_language_budgets(
    sf_dir: str, budget: int = UNIMAX_BUDGET, max_epochs: int = UNIMAX_MAX_EPOCHS
) -> pd.DataFrame:
    """UniMax language sampling allocation (Chung et al. 2023): split a
    total token ``budget`` across languages so every language is sampled
    as uniformly as possible without repeating any language more than
    ``max_epochs`` times — the waterfilling that fixed mT5's
    over/under-sampling of head/tail languages.

    The corpus reduces to per-language word totals (one combiner
    exchange, ≤ #langs rows — metadata-sized at ANY corpus size); the
    waterfill itself is a #langs-row closed form on the driver: sort by
    cap ``max_epochs·T_l`` ascending, the first row whose cap covers the
    remaining even share fixes the waterline ``W = (B − prefix)/(n − k)``,
    rows below the line get their full cap, rows above get ``⌊W⌋``. The
    oracle SQL replays the identical arithmetic with window functions
    (prefix sums + row numbers), so the one float op (the waterline
    division) compares bit-exact. At these SFs the three regimes are all
    exercised: sf0.001's caps sit under the budget (everything capped),
    larger SFs activate the waterline.
    """
    from xmlschema_ray.ops.relational import combiner_aggregate

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["lang", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        offsets, flat = _split_words(batch["text"])
        n_rows = len(batch)
        if len(flat) == 0:
            per_doc = np.zeros(n_rows, dtype=np.int64)
        else:
            starts = np.arange(len(flat), dtype=np.int64)
            row_idx = np.searchsorted(offsets, starts, side="right") - 1
            nonempty = flat != ""
            per_doc = np.bincount(row_idx[nonempty], minlength=n_rows).astype(np.int64)
        df = pd.DataFrame(
            {"lang": batch["lang"].to_numpy(zero_copy_only=False), "w": per_doc}
        )
        return df.groupby("lang", sort=False).agg(n_tokens=("w", "sum")).reset_index()

    t = (
        combiner_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            "lang",
            {"n_tokens": ("n_tokens", "sum")},
        )
        .to_pandas()
        .astype({"n_tokens": "int64"})
    )
    t["cap"] = max_epochs * t["n_tokens"]
    t = t.sort_values(["cap", "lang"]).reset_index(drop=True)
    t["alloc"] = waterfill_alloc(t["cap"].to_numpy(np.int64), budget)
    t["epochs_ppm"] = np.floor(
        1e6
        * (
            t["alloc"].to_numpy(np.int64).astype(np.float64)
            / t["n_tokens"].to_numpy(np.int64).astype(np.float64)
        )
        + 0.5
    ).astype(np.int64)
    return (
        t[["lang", "n_tokens", "cap", "alloc", "epochs_ppm"]]
        .sort_values("lang")
        .reset_index(drop=True)
    )


UNIMAX_SQL = rf"""
WITH w AS (
  SELECT lang,
    CAST(length(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))
      AS BIGINT) AS nw
  FROM documents
), t AS (
  SELECT lang, CAST(SUM(nw) AS BIGINT) AS n_tokens FROM w GROUP BY lang
), c AS (
  SELECT lang, n_tokens, {UNIMAX_MAX_EPOCHS} * n_tokens AS cap FROM t
), o AS (
  SELECT lang, n_tokens, cap,
    CAST(COALESCE(SUM(cap) OVER (ORDER BY cap, lang
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prefix,
    CAST(ROW_NUMBER() OVER (ORDER BY cap, lang) AS BIGINT) AS rn,
    CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM c
), s AS (
  SELECT MIN(rn) AS start_rn FROM o
  WHERE cap * (n - rn + 1) + prefix >= {UNIMAX_BUDGET}
), a AS (
  SELECT o.lang, o.n_tokens, o.cap,
    CASE
      WHEN s.start_rn IS NULL OR o.rn < s.start_rn THEN o.cap
      ELSE CAST(floor((CAST({UNIMAX_BUDGET} AS DOUBLE)
        - CAST((SELECT prefix FROM o o2 WHERE o2.rn = s.start_rn) AS DOUBLE))
        / CAST(o.n - s.start_rn + 1 AS DOUBLE)) AS BIGINT)
    END AS alloc
  FROM o, s
)
SELECT lang, n_tokens, cap, alloc,
  CAST(floor(1000000.0 * (CAST(alloc AS DOUBLE) / CAST(n_tokens AS DOUBLE)) + 0.5)
    AS BIGINT) AS epochs_ppm
FROM a ORDER BY lang
"""


PRETRAINING_MANIFEST_SQL = _pretraining_manifest_sql()


def quantile_normalize_chars(sf_dir: str) -> "rd.Dataset":
    """Cross-source QUANTILE NORMALIZATION of document length — the
    score-calibration primitive (Bolstad et al. 2003's microarray
    normalization, applied where every large corpus needs it: per-crawl /
    per-source quality or length scores are NOT comparable across sources,
    so selection thresholds silently favor whichever source's scorer runs
    hot; mapping each source's distribution onto the POOLED distribution
    makes one threshold mean the same thing everywhere).

    Each row's score is replaced by the pooled-distribution value at its
    within-source quantile: with r = 0-based rank within its source
    (ns rows) and N pooled rows, the target position is

        pos = (r · (N−1)) // (ns−1)        (ns = 1 → (N−1) // 2)

    — all INTEGER arithmetic over non-negative operands, so both engines
    agree exactly and the mapped value is an actual corpus value (the
    pooled order statistic), never an interpolation.

    Physical plan (nothing fact-sized touches the driver): the 3-int
    projection is materialized once; TWO sampled-range-partition
    :func:`~xmlschema_ray.ops.relational.global_rank` passes (within-source
    order ``(source, c, doc_id)`` minus |sources|-row offsets — the
    ccnet_lm_buckets shape — and pooled order ``(c, doc_id)``), then ONE
    pos-keyed :func:`~xmlschema_ray.ops.relational.hash_bucket_join` of the
    row→pos stream against the (pos, value) pooled order statistics.
    Uniform integer join keys — no skew; per-source counts are the only
    driver state."""
    from xmlschema_ray.ops.relational import (
        combiner_aggregate,
        global_rank,
        hash_bucket_join,
    )
    from xmlschema_ray.pipelines.common import sorted_or_typed_empty, table_path

    ds = rd.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "source", "n_chars"]
    )

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "source": batch["source"],
                "c": batch["n_chars"].astype("int64"),
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pandas").materialize()

    src_n = (
        combiner_aggregate(keyed_ds, "source", {"n": (None, "count")})
        .to_pandas()
        .sort_values("source")
    )
    offs: Dict[str, int] = {}
    totals: Dict[str, int] = {}
    run = 0
    for s, n in zip(src_n["source"], src_n["n"]):
        offs[s] = run
        totals[s] = int(n)
        run += int(n)
    n_pool = run

    ranked_src, _ = global_rank(keyed_ds, ["source", "c", "doc_id"], rank_col="__rank")

    def to_pos(batch: pd.DataFrame) -> pd.DataFrame:
        r = (
            batch["__rank"].to_numpy(np.int64)
            - batch["source"].map(offs).to_numpy(np.int64)
            - 1
        )
        ns = batch["source"].map(totals).to_numpy(np.int64)
        pos = np.where(
            ns > 1, (r * (n_pool - 1)) // np.maximum(ns - 1, 1), (n_pool - 1) // 2
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64),
                "source": batch["source"].to_numpy(),
                "n_chars": batch["c"].to_numpy(np.int64),
                "pos": pos,
            }
        )

    pos_ds = ranked_src.map_batches(to_pos, batch_format="pandas")

    pooled, _ = global_rank(keyed_ds, ["c", "doc_id"], rank_col="__pr")

    def pool_vals(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "pos": batch["__pr"].to_numpy(np.int64) - 1,
                "norm_c": batch["c"].to_numpy(np.int64),
            }
        )

    pooled_ds = pooled.map_batches(pool_vals, batch_format="pandas")
    out = hash_bucket_join(pos_ds, pooled_ds, "pos", "pos").drop_columns(["pos"])
    return sorted_or_typed_empty(
        out,
        ["doc_id"],
        template=pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "source": pd.Series([], dtype=object),
                "n_chars": pd.Series([], dtype="int64"),
                "norm_c": pd.Series([], dtype="int64"),
            }
        ),
    )


QUANTILE_NORMALIZE_SQL = """
WITH t AS (SELECT doc_id, source, n_chars AS c FROM documents),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t),
r AS (
  SELECT doc_id, source, c,
    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY c, doc_id) AS BIGINT) - 1 AS r,
    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS ns
  FROM t
),
p AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY c, doc_id) AS BIGINT) - 1 AS pos,
         c AS norm_c
  FROM t
),
m AS (
  SELECT doc_id, source, c AS n_chars,
    CASE WHEN ns > 1 THEN (r * (n - 1)) // (ns - 1) ELSE (n - 1) // 2 END AS pos
  FROM r, n
)
SELECT m.doc_id, m.source, m.n_chars, p.norm_c
FROM m JOIN p USING (pos)
ORDER BY m.doc_id
"""



def cms_shingle_sketch(sf_dir: str, d: int = 4, w: int = 256) -> pd.DataFrame:
    """COUNT-MIN SKETCH over all 3-word-shingle occurrences — the
    mergeable frequency sketch (Cormode & Muthukrishnan 2005), the third
    sketch family next to HyperLogLog (distinct counts,
    :func:`hll_vocab_by_source`) and the histogram quantiles
    (``quantile_sketch_quantity``): a fixed d×w integer counter matrix
    answers "how often did item x occur?" with estimate = min over d rows
    of x's bucket counters — never an underestimate (every occurrence
    lands in all d of its buckets), overestimates only from collisions,
    bounded by the classic ε = e/w at δ = e^-d. The matrix MERGES BY
    ADDITION, so per-batch partials collapse through one combiner
    exchange of ≤ d·w integer cells per batch — a 100-TB corpus's
    frequency table ships as a 4×256 grid, the whole point of the sketch.

    Bucket hashing is md5-derived (row r: first 8 hex chars of
    ``md5(f"{r}|{gram}")`` mod w, 32 bits — exact in BIGINT), so DuckDB
    recomputes EVERY CELL of the matrix from the raw corpus — the oracle
    proves the hashing + counting + merge machinery bit-for-bit, not an
    estimate tolerance (the :func:`hll_vocab_by_source` precedent). Grams
    are deduped per batch and counted with bincount weights, so md5 runs
    once per distinct gram per batch, not per occurrence. The
    no-underestimate property is pinned against exact counts in
    tests/test_cms.py."""
    import hashlib

    from xmlschema_ray.ops.relational import combiner_aggregate, to_pandas_with_schema

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        _, grams = _word_grams(batch["text"], 3)
        if not len(grams):
            return pd.DataFrame(
                {
                    "r": pd.Series([], dtype=np.int64),
                    "b": pd.Series([], dtype=np.int64),
                    "c": pd.Series([], dtype=np.int64),
                }
            )
        uniq, counts = np.unique(grams, return_counts=True)
        rs, bs, cs = [], [], []
        for r in range(d):
            pre = f"{r}|"
            bkt = np.fromiter(
                (
                    int(hashlib.md5((pre + g).encode("utf-8")).hexdigest()[:8], 16) % w
                    for g in uniq
                ),
                dtype=np.int64,
                count=len(uniq),
            )
            cell = np.bincount(bkt, weights=counts, minlength=w).astype(np.int64)
            hit = np.nonzero(cell)[0]
            rs.append(np.full(len(hit), r, dtype=np.int64))
            bs.append(hit.astype(np.int64))
            cs.append(cell[hit])
        return pd.DataFrame(
            {"r": np.concatenate(rs), "b": np.concatenate(bs), "c": np.concatenate(cs)}
        )

    df = to_pandas_with_schema(
        combiner_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["r", "b"],
            {"c": ("c", "sum")},
        )
    )
    if not len(df):
        return pd.DataFrame(
            {
                "r": pd.Series([], dtype=np.int64),
                "b": pd.Series([], dtype=np.int64),
                "c": pd.Series([], dtype=np.int64),
            }
        )
    df = df.astype({"r": "int64", "b": "int64", "c": "int64"})
    return df.sort_values(["r", "b"]).reset_index(drop=True)


def cms_estimate(sketch: pd.DataFrame, grams, d: int = 4, w: int = 256) -> pd.DataFrame:
    """Point queries against a :func:`cms_shingle_sketch` matrix:
    estimate(g) = min over rows of the g-bucket counters (absent cell =
    0). Driver-side — the sketch is d×w by construction."""
    import hashlib

    grid = np.zeros((d, w), dtype=np.int64)
    grid[sketch["r"].to_numpy(np.int64), sketch["b"].to_numpy(np.int64)] = sketch[
        "c"
    ].to_numpy(np.int64)
    out = []
    for g in grams:
        est = min(
            int(grid[r, int(hashlib.md5(f"{r}|{g}".encode()).hexdigest()[:8], 16) % w])
            for r in range(d)
        )
        out.append((g, est))
    return pd.DataFrame(out, columns=["gram", "estimate"]).astype({"estimate": "int64"})


CMS_SHINGLE_SQL = """
WITH ws AS (
  SELECT list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), g AS (
  SELECT unnest(list_transform(range(1, length(w) - 1),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
  FROM ws
), rws AS (SELECT unnest(range(0, 4)) AS r)
SELECT CAST(r AS BIGINT) AS r,
       CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || gram), 1, 8))::BIGINT % 256 AS BIGINT) AS b,
       CAST(COUNT(*) AS BIGINT) AS c
FROM g CROSS JOIN rws
GROUP BY 1, 2
ORDER BY 1, 2
"""


def padding_waste_report(sf_dir: str, batch_rows: int = 64) -> pd.DataFrame:
    """PADDING-WASTE audit: how many pad tokens a fixed-size training batch
    layout burns under (a) shuffled batching versus (b) LENGTH-SORTED
    batching — the measurement behind every bucketed-batching /
    sequence-packing decision (a batch pads every sequence to its batch
    max, so co-batching similar lengths is pure win; this quantifies it
    before anyone reorders a 100-TB corpus).

    Both orders are exact and engine-independent: 'shuffled' is the
    deterministic md5(doc_id) order (the deterministic_shuffle contract),
    'sorted' is (token_len, doc_id). Each order becomes batch ids through
    ONE :func:`global_rank` pass (``(rank-1) // batch_rows`` — no global
    sort, O(num_partitions) driver state), then per-batch (max_len,
    sum_len, n) fold through one batch-keyed combiner; waste =
    Σ_b (rows_b · max_len_b) − Σ len, all integers, waste_pct as floor
    percent. The oracle replays both layouts with window functions."""
    from xmlschema_ray.ops.relational import (
        combiner_aggregate,
        global_rank,
        to_pandas_with_schema,
    )

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def lens(batch: pd.DataFrame) -> pd.DataFrame:
        # \S+ run count == len(regexp_split(trim(text))) for non-empty text
        # and 0 for empty — the token_counts convention
        n_tok = batch["text"].fillna("").str.count(r"\S+").to_numpy(np.int64)
        ids = batch["doc_id"].tolist()
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "shuffle_key": _md5_hex(ids),
                "token_len": n_tok,
            }
        )

    feats = ds.map_batches(lens, batch_format="pandas").materialize()

    def layout_row(method: str, sort_cols: list) -> pd.DataFrame:
        ranked, total = global_rank(feats, sort_cols, rank_col="__r")
        if total == 0:
            return pd.DataFrame(
                {
                    "method": pd.Series([method], dtype=object),
                    "n_batches": pd.Series([0], dtype=np.int64),
                    "total_tokens": pd.Series([0], dtype=np.int64),
                    "padded_slots": pd.Series([0], dtype=np.int64),
                    "waste_pct": pd.Series([0], dtype=np.int64),
                }
            )

        def tag(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "b": (batch["__r"].to_numpy(np.int64) - 1) // batch_rows,
                    "token_len": batch["token_len"].to_numpy(np.int64),
                }
            )

        per_batch = to_pandas_with_schema(
            combiner_aggregate(
                ranked.map_batches(tag, batch_format="pandas"),
                "b",
                {
                    "mx": ("token_len", "max"),
                    "s": ("token_len", "sum"),
                    "n": (None, "count"),
                },
            )
        )
        total_tokens = int(per_batch["s"].sum())
        slots = int((per_batch["mx"].astype(np.int64) * per_batch["n"].astype(np.int64)).sum())
        padded = slots - total_tokens
        return pd.DataFrame(
            {
                "method": pd.Series([method], dtype=object),
                "n_batches": pd.Series([len(per_batch)], dtype=np.int64),
                "total_tokens": pd.Series([total_tokens], dtype=np.int64),
                "padded_slots": pd.Series([padded], dtype=np.int64),
                "waste_pct": pd.Series([(100 * padded) // slots if slots else 0], dtype=np.int64),
            }
        )

    out = pd.concat(
        [
            layout_row("shuffled", ["shuffle_key", "doc_id"]),
            layout_row("sorted", ["token_len", "doc_id"]),
        ],
        ignore_index=True,
    )
    return out.sort_values("method").reset_index(drop=True)


PADDING_WASTE_SQL = r"""
WITH f AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS token_len
  FROM documents
), r AS (
  SELECT token_len,
         (ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) - 1) // 64 AS b_shuf,
         (ROW_NUMBER() OVER (ORDER BY token_len, doc_id) - 1) // 64 AS b_sort
  FROM f
), shuf AS (
  SELECT 'shuffled' AS method, CAST(COUNT(*) AS BIGINT) AS n_batches,
         CAST(SUM(s) AS BIGINT) AS total_tokens,
         CAST(SUM(mx * n) - SUM(s) AS BIGINT) AS padded_slots,
         CAST((100 * (SUM(mx * n) - SUM(s))) // SUM(mx * n) AS BIGINT) AS waste_pct
  FROM (SELECT b_shuf, MAX(token_len) AS mx, SUM(token_len) AS s, COUNT(*) AS n
        FROM r GROUP BY 1)
), srt AS (
  SELECT 'sorted', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(s) AS BIGINT),
         CAST(SUM(mx * n) - SUM(s) AS BIGINT),
         CAST((100 * (SUM(mx * n) - SUM(s))) // SUM(mx * n) AS BIGINT)
  FROM (SELECT b_sort, MAX(token_len) AS mx, SUM(token_len) AS s, COUNT(*) AS n
        FROM r GROUP BY 1)
)
SELECT * FROM shuf UNION ALL SELECT * FROM srt ORDER BY method
"""


def reshard_movement_report(
    sf_dir: str, n_old: int = 12, n_new: int = 16
) -> pd.DataFrame:
    """RESHARD MOVEMENT analysis: when a corpus rescales from ``n_old`` to
    ``n_new`` shards, what fraction of documents changes owner under (a)
    naive mod-hash placement versus (b) RENDEZVOUS (highest-random-weight)
    hashing (Thaler-Ravishankar 1998) — the placement-strategy audit run
    before any 100-TB relayout, where mod placement moves nearly
    everything and HRW provably moves only the documents whose new-shard
    weight wins (≈ (M−N)/M on growth, the attainable minimum).

    Owners are pure md5 functions of (doc_id[, shard]) — the established
    md5 contract — so the DuckDB oracle recomputes EVERY owner and the
    exact movement counts (argmax ties break toward the lower shard id in
    both engines: numpy ``argmax`` takes the first maximum, the oracle
    orders ``hs DESC, s``). Embarrassingly parallel: per-batch owner
    computation (``n_new`` md5 evaluations per doc, the
    table_fingerprint per-row-hash cost class) collapsing to TWO counter
    rows per batch through one combiner exchange — driver sees four
    integers."""
    from xmlschema_ray.ops.relational import combiner_aggregate, to_pandas_with_schema

    if not 0 < n_old < n_new:
        raise ValueError("reshard_movement_report: need 0 < n_old < n_new")
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids = [str(v) for v in batch["doc_id"].tolist()]
        n = len(ids)
        if n == 0:
            return pd.DataFrame(
                {
                    "method": pd.Series([], dtype=object),
                    "n_docs": pd.Series([], dtype=np.int64),
                    "n_moved": pd.Series([], dtype=np.int64),
                }
            )
        hv = np.fromiter(
            (int(hashlib.md5(i.encode()).hexdigest()[:8], 16) for i in ids),
            dtype=np.int64,
            count=n,
        )
        mod_moved = int(np.count_nonzero(hv % n_old != hv % n_new))
        weights = np.empty((n, n_new), dtype=np.int64)
        for s in range(n_new):
            weights[:, s] = np.fromiter(
                (
                    int(hashlib.md5(f"{i}|{s}".encode()).hexdigest()[:8], 16)
                    for i in ids
                ),
                dtype=np.int64,
                count=n,
            )
        old_owner = np.argmax(weights[:, :n_old], axis=1)
        new_owner = np.argmax(weights, axis=1)
        rz_moved = int(np.count_nonzero(old_owner != new_owner))
        return pd.DataFrame(
            {
                "method": ["mod", "rendezvous"],
                "n_docs": np.array([n, n], dtype=np.int64),
                "n_moved": np.array([mod_moved, rz_moved], dtype=np.int64),
            }
        )

    df = to_pandas_with_schema(
        combiner_aggregate(
            ds.map_batches(partial, batch_format="pandas"),
            "method",
            {"n_docs": ("n_docs", "sum"), "n_moved": ("n_moved", "sum")},
        )
    )
    if len(df) == 0:
        return pd.DataFrame(
            {
                "method": pd.Series([], dtype=object),
                "n_docs": pd.Series([], dtype=np.int64),
                "n_moved": pd.Series([], dtype=np.int64),
                "moved_pct": pd.Series([], dtype=np.int64),
            }
        )
    df["n_docs"] = df["n_docs"].astype("int64")
    df["n_moved"] = df["n_moved"].astype("int64")
    df["moved_pct"] = (100 * df["n_moved"]) // df["n_docs"]
    return df.sort_values("method").reset_index(drop=True)


RESHARD_MOVEMENT_SQL = """
WITH h AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hv
  FROM documents
), mo AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN hv % 12 <> hv % 16 THEN 1 ELSE 0 END) AS BIGINT) AS moved
  FROM h
), rz AS (
  SELECT doc_id, s,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(s AS VARCHAR)), 1, 8))
              AS BIGINT) AS hs
  FROM documents CROSS JOIN (SELECT unnest(range(0, 16)) AS s)
), old_own AS (
  SELECT doc_id, s AS owner FROM (
    SELECT doc_id, s, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hs DESC, s) AS rn
    FROM rz WHERE s < 12
  ) WHERE rn = 1
), new_own AS (
  SELECT doc_id, s AS owner FROM (
    SELECT doc_id, s, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hs DESC, s) AS rn
    FROM rz
  ) WHERE rn = 1
), rzm AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o.owner <> w.owner THEN 1 ELSE 0 END) AS BIGINT) AS moved
  FROM old_own o JOIN new_own w ON o.doc_id = w.doc_id
)
SELECT method, n_docs, n_moved, CAST((100 * n_moved) // n_docs AS BIGINT) AS moved_pct
FROM (
  SELECT 'mod' AS method, n AS n_docs, moved AS n_moved FROM mo
  UNION ALL
  SELECT 'rendezvous', n, moved FROM rzm
)
ORDER BY method
"""


def span_corrupt_documents(sf_dir: str, span_len: int = 3, mask_mod: int = 5) -> pd.DataFrame:
    """T5-style SPAN CORRUPTION (Raffel et al. 2020 §3.1.4) over the word
    stream: contiguous ``span_len``-token blocks are masked with
    probability ``1/mask_mod``, each masked span collapses to one
    sentinel ``<X_k>`` in the model INPUT and expands to ``<X_k> tokens…``
    in the TARGET — the denoising-objective example builder every
    encoder-decoder pretraining pipeline runs over its whole corpus.

    Masking is a PURE FUNCTION of (doc_id, block index) — first 8 md5 hex
    chars mod ``mask_mod`` (the cms/decontamination md5 contract) — so
    examples are reproducible on any engine at any parallelism and the
    DuckDB oracle re-derives EVERY input/target string verbatim
    (hash-exact on the full strings, not a statistic). Sentinels number
    masked spans 0,1,… in document order.

    Physical plan: embarrassingly parallel — ONE whitespace split per
    batch (``_split_words``), block ids / first-of-block flags / sentinel
    ranks all flat integer array arithmetic, md5 runs once per BLOCK (not
    per token), and the only per-group Python is the final string join
    (string assembly is inherently sequential per doc). ZERO exchanges;
    output is doc-sized. Docs with empty text carry no blocks and are
    excluded (both engines filter ``trim(text) <> ''``)."""
    from xmlschema_ray.ops.relational import to_pandas_with_schema

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def corrupt(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=batch["doc_id"].dtype),
                "n_spans": pd.Series([], dtype=np.int64),
                "n_masked": pd.Series([], dtype=np.int64),
                "input_text": pd.Series([], dtype=object),
                "target_text": pd.Series([], dtype=object),
            }
        )
        stripped = batch["text"].fillna("").str.strip()
        keep = stripped != ""
        if not keep.any():
            return empty
        doc_ids = batch.loc[keep, "doc_id"].to_numpy()
        offsets, flat = _split_words(pa.array(stripped[keep], type=pa.string()))
        n_tok = len(flat)
        if n_tok == 0:
            return empty
        starts = np.arange(n_tok, dtype=np.int64)
        row = np.searchsorted(offsets, starts, side="right") - 1
        pos0 = starts - offsets[row]
        blk = pos0 // span_len
        first = pos0 % span_len == 0
        # one md5 per BLOCK: the first-of-block rows are exactly one per block
        f_idx = np.flatnonzero(first)
        doc_f = row[f_idx]
        blk_f = blk[f_idx]
        masked_f = np.fromiter(
            (
                int(hashlib.md5(f"{doc_ids[d]}|{b}".encode("utf-8")).hexdigest()[:8], 16)
                % mask_mod
                == 0
                for d, b in zip(doc_f, blk_f)
            ),
            dtype=bool,
            count=len(f_idx),
        )
        blk_ord = np.cumsum(first) - 1  # global block ordinal per token
        masked = masked_f[blk_ord]
        # sentinel rank k: position of the masked block among its doc's
        # masked blocks (blocks arrive in doc order — the skyline
        # start-index trick gives the within-doc running count)
        m_idx = np.flatnonzero(masked_f)
        doc_m = doc_f[m_idx]
        if len(doc_m):
            change = np.empty(len(doc_m), dtype=bool)
            change[0] = True
            np.not_equal(doc_m[1:], doc_m[:-1], out=change[1:])
            start = np.maximum.accumulate(np.where(change, np.arange(len(doc_m)), 0))
            k_vals = np.arange(len(doc_m)) - start
        else:
            k_vals = np.array([], dtype=np.int64)
        sent_per_block = np.full(len(f_idx), None, dtype=object)
        sent_per_block[m_idx] = np.array([f"<X_{int(k)}>" for k in k_vals], dtype=object)
        words = flat.astype(object)
        sent_tok = sent_per_block[blk_ord]
        # input: unmasked words + one sentinel at each masked block head
        inp_keep = (~masked) | first
        inp_piece = np.where(masked, sent_tok, words)
        inp = (
            pd.Series(inp_piece[inp_keep])
            .groupby(pd.Series(row[inp_keep]), sort=True)
            .agg(" ".join)
        )
        # target: masked words only, sentinel prefixed at each block head
        # (assign only at heads — np.where would evaluate the concat on
        # unmasked positions whose sentinel slot is None)
        tgt_piece = words.copy()
        fm = first & masked
        tgt_piece[fm] = sent_tok[fm] + " " + words[fm]
        tgt = (
            pd.Series(tgt_piece[masked])
            .groupby(pd.Series(row[masked]), sort=True)
            .agg(" ".join)
        )
        n_docs = len(doc_ids)
        n_spans = np.bincount(doc_m, minlength=n_docs) if len(doc_m) else np.zeros(n_docs, dtype=np.int64)
        n_masked = np.bincount(row[masked], minlength=n_docs) if masked.any() else np.zeros(n_docs, dtype=np.int64)
        out = pd.DataFrame(
            {
                "doc_id": doc_ids,
                "n_spans": n_spans.astype(np.int64),
                "n_masked": n_masked.astype(np.int64),
                "input_text": pd.Series(doc_ids).index.map(inp).fillna("").to_numpy(object),
                "target_text": pd.Series(doc_ids).index.map(tgt).fillna("").to_numpy(object),
            }
        )
        return out

    df = to_pandas_with_schema(ds.map_batches(corrupt, batch_format="pandas"))
    if len(df) == 0:
        id_dtype = ds.schema().base_schema.field("doc_id").type.to_pandas_dtype()
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=id_dtype),
                "n_spans": pd.Series([], dtype=np.int64),
                "n_masked": pd.Series([], dtype=np.int64),
                "input_text": pd.Series([], dtype=object),
                "target_text": pd.Series([], dtype=object),
            }
        )
    return df.sort_values("doc_id").reset_index(drop=True)


SPAN_CORRUPT_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS word,
         generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) AS pos
  FROM documents WHERE trim(text) <> ''
), m AS (
  SELECT doc_id, word, pos, (pos - 1) // 3 AS blk,
         ((pos - 1) % 3 = 0) AS first_of_blk,
         (CAST(('0x' || substr(md5(doc_id || '|' || CAST((pos - 1) // 3 AS VARCHAR)), 1, 8))
               AS BIGINT) % 5 = 0) AS masked
  FROM toks
), sent AS (
  SELECT doc_id, blk,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY blk) - 1 AS BIGINT) AS k
  FROM (SELECT DISTINCT doc_id, blk FROM m WHERE masked)
), j AS (
  SELECT m.doc_id, m.word, m.pos, m.masked, m.first_of_blk, sent.k
  FROM m LEFT JOIN sent ON m.doc_id = sent.doc_id AND m.blk = sent.blk
), inp AS (
  SELECT doc_id, string_agg(piece, ' ' ORDER BY pos) AS input_text
  FROM (
    SELECT doc_id, pos,
           CASE WHEN NOT masked THEN word
                WHEN first_of_blk THEN '<X_' || CAST(k AS VARCHAR) || '>' END AS piece
    FROM j
  ) WHERE piece IS NOT NULL GROUP BY doc_id
), tgt AS (
  SELECT doc_id, string_agg(piece, ' ' ORDER BY pos) AS target_text
  FROM (
    SELECT doc_id, pos,
           CASE WHEN first_of_blk THEN '<X_' || CAST(k AS VARCHAR) || '> ' || word
                ELSE word END AS piece
    FROM j WHERE masked
  ) GROUP BY doc_id
), cnt AS (
  SELECT doc_id,
         CAST(COUNT(DISTINCT CASE WHEN masked THEN blk END) AS BIGINT) AS n_spans,
         CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked
  FROM m GROUP BY doc_id
)
SELECT c.doc_id, c.n_spans, c.n_masked,
       COALESCE(i.input_text, '') AS input_text,
       COALESCE(t.target_text, '') AS target_text
FROM cnt c
LEFT JOIN inp i ON c.doc_id = i.doc_id
LEFT JOIN tgt t ON c.doc_id = t.doc_id
ORDER BY c.doc_id
"""


ORACLES: Dict[str, str] = {
    "top_words": TOP_WORDS_SQL,
    "heavy_hitter_words": HEAVY_HITTER_SQL,
    "pretraining_manifest": PRETRAINING_MANIFEST_SQL,
    "hll_vocab_by_source": HLL_VOCAB_SQL,
    "cms_shingle_sketch": CMS_SHINGLE_SQL,
    "unimax_language_budgets": UNIMAX_SQL,
    "top_bigrams": TOP_BIGRAMS_SQL,
    "redact_terms": REDACT_TERMS_SQL,
    "deterministic_shuffle": DETERMINISTIC_SHUFFLE_SQL,
    "inverted_index": INVERTED_INDEX_SQL,
    "phrase_search": PHRASE_SEARCH_SQL,
    "source_vocab_overlap": SOURCE_VOCAB_OVERLAP_SQL,
    "table_fingerprint_by_source": TABLE_FINGERPRINT_SQL,
    "weighted_sample_docs": WEIGHTED_SAMPLE_SQL,
    "encode_documents": ENCODE_DOCUMENTS_SQL,
    "longest_quartile_docs": LONGEST_QUARTILE_SQL,
    "decontamination": DECONTAMINATION_SQL,
    # the bloom path is exact by construction (phase-2 verify), so it
    # shares the exact-broadcast oracle verbatim
    "bloom_decontaminate": DECONTAMINATION_SQL,
    "span_corrupt_documents": SPAN_CORRUPT_SQL,
    "reshard_movement_report": RESHARD_MOVEMENT_SQL,
    "padding_waste_report": PADDING_WASTE_SQL,
    "repetition_ratio": REPETITION_RATIO_SQL,
    "stratified_sample": STRATIFIED_SAMPLE_SQL,
    "chunk_documents": CHUNK_DOCUMENTS_SQL,
    "stopword_removal": STOPWORD_REMOVAL_SQL,
    "pack_token_windows": PACK_TOKEN_WINDOWS_SQL,
    "token_budget_mixture": TOKEN_BUDGET_MIXTURE_SQL,
    "dup_gram_fraction": DUP_GRAM_FRACTION_SQL,
    "distinctive_terms_by_source": DISTINCTIVE_TERMS_SQL,
    "curation_pipeline": CURATION_PIPELINE_SQL,
    "quota_sample": QUOTA_SAMPLE_SQL,
    "dsir_selection": DSIR_SELECTION_SQL,
    "quantile_normalize_chars": QUANTILE_NORMALIZE_SQL,
}

QUERIES = {
    "top_words": top_words,
    "heavy_hitter_words": heavy_hitter_words,
    "pretraining_manifest": pretraining_manifest,
    "hll_vocab_by_source": hll_vocab_by_source,
    "cms_shingle_sketch": cms_shingle_sketch,
    "unimax_language_budgets": unimax_language_budgets,
    "top_bigrams": top_bigrams,
    "redact_terms": redact_terms,
    "deterministic_shuffle": deterministic_shuffle,
    "inverted_index": inverted_index,
    "phrase_search": phrase_search,
    "source_vocab_overlap": source_vocab_overlap,
    "table_fingerprint_by_source": table_fingerprint_by_source,
    "weighted_sample_docs": weighted_sample_docs,
    "encode_documents": encode_documents,
    "longest_quartile_docs": longest_quartile_docs,
    "decontamination": decontamination,
    "bloom_decontaminate": bloom_decontaminate,
    "repetition_ratio": repetition_ratio,
    "stratified_sample": stratified_sample,
    "chunk_documents": chunk_documents,
    "stopword_removal": stopword_removal,
    "pack_token_windows": pack_token_windows,
    "token_budget_mixture": token_budget_mixture,
    "dup_gram_fraction": dup_gram_fraction,
    "distinctive_terms_by_source": distinctive_terms_by_source,
    "curation_pipeline": curation_pipeline,
    "quota_sample": quota_sample,
    "dsir_selection": dsir_selection,
    "quantile_normalize_chars": quantile_normalize_chars,
    "span_corrupt_documents": span_corrupt_documents,
    "reshard_movement_report": reshard_movement_report,
    "padding_waste_report": padding_waste_report,
}
