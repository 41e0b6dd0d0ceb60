"""Text-analysis pipelines over the ``documents`` table.

Token counting and quality features are oracle-checked (every output value
is an integer or a single division of identical integers — exact on both
sides). Language-ID and fingerprinting are heuristic/hash-based and are
rows-only checks.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np
import pandas as pd

import ray.data as rd

from xmlschema_ray.functions import text as T
from xmlschema_ray.pipelines.common import (
    dataset_or_typed_empty,
    sorted_or_typed_empty,
    table_path,
)


def token_counts(sf_dir: str):
    """(doc_id, n_tokens_ws, n_tokens_bpe) per document."""
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens_ws": T.whitespace_token_count(batch["text"]),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


TOKEN_COUNTS_SQL = """
SELECT doc_id, CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens_ws
FROM documents
"""


def doc_quality(sf_dir: str):
    """Quality features; all values exact (ints or single int divisions)."""
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        feats = T.quality_features(batch["text"])
        feats.insert(0, "doc_id", batch["doc_id"].values)
        return feats

    return ds.map_batches(fn, batch_format="pandas")


DOC_QUALITY_SQL = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         / length(regexp_split_to_array(trim(text), '\\s+')) AS mean_tok_len,
       CAST(length(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                               w -> w IN ('the','a','an','and','or','of','to','in','is','are',
                                          'was','were','be','been','it','this','that','with',
                                          'for','on','as','at','by'))) AS DOUBLE)
         / length(regexp_split_to_array(trim(text), '\\s+')) AS stopword_ratio,
       CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
         / length(text) AS alpha_ratio
FROM documents
"""


def language_id_counts(sf_dir: str) -> pd.DataFrame:
    """Predicted-language histogram (marker-word heuristic; rows-only)."""
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"pred_lang": T.language_id(batch["text"])})

    preds = ds.map_batches(fn, batch_format="pandas")
    from xmlschema_ray.ops.relational import combiner_aggregate

    out = combiner_aggregate(preds, keys="pred_lang", aggs={"n": (None, "count")}).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("pred_lang").reset_index(drop=True)


def fingerprints(sf_dir: str):
    """(doc_id, fp) portable content fingerprints — MD5/16 over the
    whitespace-collapsed text, recomputable by any engine (oracle-checked
    against DuckDB ``md5()``)."""
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "fp": T.fingerprint_md5_16(batch["text"])}
        )

    return ds.map_batches(fn, batch_format="pandas")


FINGERPRINTS_SQL = r"""
SELECT doc_id,
       substring(md5(trim(regexp_replace(text, '[ \t\n\r\f\v]+', ' ', 'g'), ' ')), 1, 16) AS fp
FROM documents
"""


LANGUAGE_ID_SQL = r"""
WITH s AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS ws FROM documents
), scored AS (
  SELECT
    length(list_filter(ws, w -> w IN ('der','die','das','und','ist','nicht','mit','für','von','ein'))) AS s_de,
    length(list_filter(ws, w -> w IN ('the','and','of','to','is','in','that','with','for','are'))) AS s_en,
    length(list_filter(ws, w -> w IN ('el','la','los','y','es','en','que','para','con','una'))) AS s_es,
    length(list_filter(ws, w -> w IN ('le','la','les','et','est','dans','pour','que','une','avec'))) AS s_fr,
    length(list_filter(ws, w -> w IN ('的','是','在','了','我','有','和','不','人','这'))) AS s_zh
  FROM s
), pred AS (
  SELECT CASE
    WHEN s_de > 0 AND s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
    WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
    WHEN s_es > 0 AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
    WHEN s_fr > 0 AND s_fr >= s_zh THEN 'fr'
    WHEN s_zh > 0 THEN 'zh'
    ELSE 'und' END AS pred_lang
  FROM scored
)
SELECT pred_lang, COUNT(*) AS n FROM pred GROUP BY pred_lang ORDER BY pred_lang
"""


_LANG_MISMATCH_EMPTY = pd.DataFrame(
    {
        "doc_id": np.array([], dtype=np.int64),
        "lang": pd.Series([], dtype=object),
        "pred_lang": pd.Series([], dtype=object),
    }
)


def lang_mismatch_audit(sf_dir: str) -> "rd.Dataset":
    """Label-noise audit: documents whose DECLARED ``lang`` column
    disagrees with the marker-word language-ID prediction — the semantic
    consistency check a crawl pipeline runs before trusting upstream
    metadata (a metadata-vs-content referential constraint, the
    cross-column analog of the engine's keyref checks,
    /root/reference/xmlschema/validators/identities.py:118-150).

    Pure per-row predicate over one streaming pass (the
    :func:`~xmlschema_ray.functions.text.language_id` Arrow membership
    kernel); ``und`` predictions are exempt — no marker evidence is not a
    contradiction. Output is violation-shaped (result-sized): one row per
    mismatching doc.
    """
    from xmlschema_ray.pipelines.common import sorted_or_typed_empty

    ds = rd.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "lang", "text"]
    )

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        pred = T.language_id(batch["text"]).to_numpy()
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy().astype(np.int64),
                "lang": batch["lang"].to_numpy(),
                "pred_lang": pred,
            }
        )
        return out[(out["pred_lang"] != "und") & (out["pred_lang"] != out["lang"])]

    return sorted_or_typed_empty(
        ds.map_batches(fn, batch_format="pandas"),
        ["doc_id"],
        template=_LANG_MISMATCH_EMPTY,
    )


LANG_MISMATCH_SQL = r"""
WITH s AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(lower(text)), '\s+') AS ws FROM documents
), scored AS (
  SELECT doc_id, lang,
    length(list_filter(ws, w -> w IN ('der','die','das','und','ist','nicht','mit','für','von','ein'))) AS s_de,
    length(list_filter(ws, w -> w IN ('the','and','of','to','is','in','that','with','for','are'))) AS s_en,
    length(list_filter(ws, w -> w IN ('el','la','los','y','es','en','que','para','con','una'))) AS s_es,
    length(list_filter(ws, w -> w IN ('le','la','les','et','est','dans','pour','que','une','avec'))) AS s_fr,
    length(list_filter(ws, w -> w IN ('的','是','在','了','我','有','和','不','人','这'))) AS s_zh
  FROM s
), pred AS (
  SELECT doc_id, lang, CASE
    WHEN s_de > 0 AND s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
    WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
    WHEN s_es > 0 AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
    WHEN s_fr > 0 AND s_fr >= s_zh THEN 'fr'
    WHEN s_zh > 0 THEN 'zh'
    ELSE 'und' END AS pred_lang
  FROM scored
)
SELECT doc_id, lang, pred_lang FROM pred
WHERE pred_lang <> 'und' AND pred_lang <> lang
ORDER BY doc_id
"""


# Gopher's published list is ("the","be","to","of","and","that","have",
# "with"); swapped to the corpus's function words so the ≥2-distinct rule
# actually discriminates on the synthetic vocabulary (63% pass at sf0.01
# instead of a constant 0) — the rule SHAPE is Gopher's, the list is a
# parameter.
GOPHER_STOPWORDS = ("the", "a", "and", "of", "to", "is", "in", "that")
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 30, 80
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 3, 10


def gopher_quality_flags(sf_dir: str) -> "rd.Dataset":
    """Gopher-style quality-rule bundle (Rae et al. 2021 §A1.1): per-doc
    rule flags plus the composite keep decision — THE standard pre-training
    quality filter, as one streaming pass.

    All five rules are evaluated in INTEGER arithmetic (``3·n_words ≤
    n_word_chars`` instead of ``mean ≥ 3`` etc.) so both engines compare
    exactly — the scaled-integer oracle discipline of
    ``pipelines/common.py``. Word-count bounds are calibrated to the
    synthetic corpus (30–80 of its 10–99-word range) so the keep decision
    is non-trivial; the symbol-ratio rule keeps Gopher's #/'...' counts.
    One Arrow split pass feeds every rule; stopword presence is eight
    equality+bincount passes (list-sized, not row-looped).
    """
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(gopher_flags_batch, batch_format="pyarrow")


def gopher_flags_batch(batch: "pa.Table") -> pd.DataFrame:
    """The Gopher rule kernel on one Arrow batch (factored so composed
    pipelines — e.g. ``curation.pretraining_manifest`` — apply the exact
    same integer rules without a second implementation)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_rows = len(batch)
    lists = pc.utf8_split_whitespace(text)
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    flat_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = flat_len > 0
    n_words = np.bincount(parent[nonempty], minlength=n_rows).astype(np.int64)
    n_word_chars = np.bincount(
        parent, weights=flat_len, minlength=n_rows
    ).astype(np.int64)
    alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(
        zero_copy_only=False
    )
    n_alpha_words = np.bincount(parent[alpha], minlength=n_rows).astype(np.int64)
    n_sym = (
        pc.count_substring(text, "#").to_numpy(zero_copy_only=False)
        + pc.count_substring(text, "...").to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    flat_lower = pc.utf8_lower(flat)
    n_stop = np.zeros(n_rows, dtype=np.int64)
    for s in GOPHER_STOPWORDS:
        hits = pc.equal(flat_lower, s).to_numpy(zero_copy_only=False)
        n_stop += (np.bincount(parent[hits], minlength=n_rows) > 0).astype(np.int64)
    f_words = (
        (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    ).astype(np.int64)
    f_mwl = (
        (GOPHER_MIN_MWL * n_words <= n_word_chars)
        & (n_word_chars <= GOPHER_MAX_MWL * n_words)
    ).astype(np.int64)
    f_sym = (10 * n_sym <= n_words).astype(np.int64)
    f_alpha = (5 * n_alpha_words >= 4 * n_words).astype(np.int64)
    f_stop = (n_stop >= 2).astype(np.int64)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"].to_numpy().astype(np.int64),
            "n_words": n_words,
            "n_word_chars": n_word_chars,
            "n_alpha_words": n_alpha_words,
            "n_sym": n_sym,
            "n_stop": n_stop,
            "f_words": f_words,
            "f_mwl": f_mwl,
            "f_sym": f_sym,
            "f_alpha": f_alpha,
            "f_stop": f_stop,
            "keep": f_words * f_mwl * f_sym * f_alpha * f_stop,
        }
    )



GOPHER_QUALITY_SQL = r"""
WITH base AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w <> '') AS ws,
    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), w -> w <> '') AS lws,
    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS n_word_chars,
    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
      + CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT) AS n_sym
  FROM documents
), m AS (
  SELECT doc_id, n_word_chars, n_sym,
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
), f AS (
  SELECT doc_id, n_words, n_word_chars, n_alpha_words, n_sym, n_stop,
    CAST(n_words BETWEEN 30 AND 80 AS BIGINT) AS f_words,
    CAST(3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words AS BIGINT) AS f_mwl,
    CAST(10 * n_sym <= n_words AS BIGINT) AS f_sym,
    CAST(5 * n_alpha_words >= 4 * n_words AS BIGINT) AS f_alpha,
    CAST(n_stop >= 2 AS BIGINT) AS f_stop
  FROM m
)
SELECT doc_id, n_words, n_word_chars, n_alpha_words, n_sym, n_stop,
       f_words, f_mwl, f_sym, f_alpha, f_stop,
       f_words * f_mwl * f_sym * f_alpha * f_stop AS keep
FROM f
"""


def chars_quartiles_by_source(sf_dir: str) -> pd.DataFrame:
    """Per-source p25/p50/p75 of document length — EXACT grouped quantiles
    via key co-location (the ``median_quantity_by_flag`` pattern widened to
    arbitrary quantiles).

    Hash-partitioning on ``source`` lands every group whole in one
    partition, where one vectorized ``np.percentile`` computes the exact
    linear-interpolated quantile. Quartile interpolation weights
    (0, .25, .5, .75) and int inputs are all exactly representable in
    doubles, so numpy's linear method and DuckDB's ``quantile_cont`` produce
    bit-identical results. Partitioning assumption: bounded source
    cardinality with per-source data fitting a worker — true for corpus
    provenance labels at any size; high-cardinality quantiles use the
    engine's mergeable histogram sketches (engine/stats.py) instead."""
    from xmlschema_ray.ops.relational import hash_partition_apply

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["source", "n_chars"])

    def quartiles(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in part.groupby("source", sort=False):
            x = g["n_chars"].to_numpy(np.float64)
            p25, p50, p75 = np.percentile(x, [25.0, 50.0, 75.0])
            rows.append((src, len(x), p25, p50, p75))
        return pd.DataFrame(
            {
                "source": pd.Series([r[0] for r in rows], dtype=object),
                "n_docs": pd.Series([r[1] for r in rows], dtype="int64"),
                "p25": pd.Series([r[2] for r in rows], dtype="float64"),
                "p50": pd.Series([r[3] for r in rows], dtype="float64"),
                "p75": pd.Series([r[4] for r in rows], dtype="float64"),
            }
        )

    out = hash_partition_apply(ds, "source", quartiles).to_pandas()
    return out.sort_values("source").reset_index(drop=True)


CHARS_QUARTILES_SQL = """
SELECT source,
       COUNT(*) AS n_docs,
       quantile_cont(CAST(n_chars AS DOUBLE), 0.25) AS p25,
       quantile_cont(CAST(n_chars AS DOUBLE), 0.50) AS p50,
       quantile_cont(CAST(n_chars AS DOUBLE), 0.75) AS p75
FROM documents
GROUP BY source
ORDER BY source
"""


def zscore_doc_length(sf_dir: str) -> "rd.Dataset":
    """Per-source z-score normalization of document length — the grouped
    feature-standardization map of a curation stack, in its distributed
    shape: per-group (count, Σx, Σx²) reduce as integer combiner partials
    (exact, associative, one row per source per batch), the per-source
    stats table is metadata-sized (bounded by source cardinality) and
    closed over the scoring map — no join, no second pass.

    Float parity: all sums stay integers until ONE division each
    (mean = Σx/n, mean-square = Σx²/n), variance = msq - mean·mean, and
    ``sqrt`` is IEEE-correctly-rounded on both engines, so z-scores are
    bit-exact vs the SQL oracle. (At 10^12-row scale Σx² outgrows int64 —
    the production form switches the partial to a 128-bit/compensated
    accumulator; the shape is unchanged.)"""
    from xmlschema_ray.ops.relational import combiner_aggregate

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "source", "n_chars"])

    def with_sq(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        nc = batch["n_chars"].to_numpy(np.int64)
        batch["__sq"] = nc * nc
        return batch

    stats = (
        combiner_aggregate(
            ds.map_batches(with_sq, batch_format="pandas"),
            keys="source",
            aggs={"n": (None, "count"), "s": ("n_chars", "sum"), "sq": ("__sq", "sum")},
        )
        .to_pandas()
        .set_index("source")
    )
    params = {}
    for src, row in stats.iterrows():
        n, s, sq = int(row["n"]), int(row["s"]), int(row["sq"])
        mean = np.float64(s) / n
        var = np.float64(sq) / n - mean * mean
        params[src] = (mean, np.sqrt(var))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        nc = batch["n_chars"].to_numpy(np.int64)
        srcs = batch["source"].to_numpy()
        # factorize once per batch (C-level), then two O(#sources) lookups
        codes, uniq = pd.factorize(batch["source"])
        mean = np.array([params[s][0] for s in uniq])[codes]
        std = np.array([params[s][1] for s in uniq])[codes]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64),
                "source": srcs,
                "n_chars": nc,
                "z": (nc - mean) / std,
            }
        )

    return ds.map_batches(score, batch_format="pandas")


ZSCORE_SQL = """
WITH g AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n_chars) AS BIGINT) AS s,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS sq
  FROM documents GROUP BY source
)
SELECT d.doc_id, d.source, d.n_chars,
       (d.n_chars - CAST(s AS DOUBLE) / n)
         / sqrt(CAST(sq AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) AS z
FROM documents d JOIN g ON d.source = g.source
"""


_BM25_TERMS = ("table", "window", "join", "hash")
_BM25_K1, _BM25_B = 1.2, 0.75


def bm25_scores(sf_dir: str) -> "rd.Dataset":
    """BM25 relevance of every document against a fixed query term set —
    the retrieval/quality scorer of a data-curation stack, in its
    distributed shape: ONE streaming pass over the text produces a narrow
    per-doc table (doc_id, dl, tf per query term); corpus statistics
    (N, Σdl, per-term document frequencies) reduce from that table as
    metadata-sized partials; scoring is then a stateless vectorized map
    with the ≤|terms| df values closed over — no join, no second text
    pass, no fact-sized driver state.

    Output is one row per (doc, matched term) — per-term contributions
    rather than the per-doc sum, so no cross-term float summation order
    exists to disagree on. The idf uses BM25's rational odds form
    ``(N - df + 0.5)/(df + 0.5)`` WITHOUT the log: the log is monotone
    (per-term rankings identical) but ``ln`` differs between libm and
    DuckDB in the last ulp, while the log-free form is all IEEE +,*,/
    — bit-exact on both engines."""
    from xmlschema_ray.pipelines.curation import _split_offsets

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def per_doc(batch) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        offsets, flat = _split_offsets(batch["text"])
        n_rows = len(ids)
        starts = np.arange(len(flat), dtype=np.int64)
        row_idx = np.searchsorted(offsets, starts, side="right") - 1
        cols = {"doc_id": ids, "dl": np.diff(offsets).astype(np.int64)}
        for t in _BM25_TERMS:
            hit = flat == t
            cols[f"tf_{t}"] = np.bincount(row_idx[hit], minlength=n_rows).astype(np.int64)
        return pd.DataFrame(cols)

    narrow = ds.map_batches(per_doc, batch_format="pyarrow").materialize()

    def stat_partial(batch: pd.DataFrame) -> pd.DataFrame:
        row = {"n": np.int64(len(batch)), "tot": batch["dl"].sum()}
        for t in _BM25_TERMS:
            row[f"df_{t}"] = np.int64((batch[f"tf_{t}"] > 0).sum())
        return pd.DataFrame([row])

    stats = narrow.map_batches(stat_partial, batch_format="pandas").to_pandas().sum()
    n_docs, tot = int(stats["n"]), int(stats["tot"])
    avgdl = np.float64(tot) / n_docs
    idf = {
        t: (n_docs - int(stats[f"df_{t}"]) + 0.5) / (int(stats[f"df_{t}"]) + 0.5)
        for t in _BM25_TERMS
    }

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        dl = batch["dl"].to_numpy(np.int64)
        denom_tail = _BM25_K1 * (1 - _BM25_B + _BM25_B * dl / avgdl)
        for t in _BM25_TERMS:
            tf = batch[f"tf_{t}"].to_numpy(np.int64)
            m = tf > 0
            if not m.any():
                continue
            s = idf[t] * (tf[m] * (_BM25_K1 + 1)) / (tf[m] + denom_tail[m])
            outs.append(
                pd.DataFrame(
                    {
                        "doc_id": batch["doc_id"].to_numpy(np.int64)[m],
                        "word": t,
                        "tf": tf[m],
                        "bm25": s,
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "word": pd.Series([], dtype=object),
                    "tf": pd.Series([], dtype="int64"),
                    "bm25": pd.Series([], dtype="float64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    return sorted_or_typed_empty(narrow.map_batches(score, batch_format="pandas"), ["doc_id", "word"])


BM25_SQL = r"""
WITH w AS (
  -- '' filtered so empty documents have dl = 0, matching the Arrow split
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
  FROM documents
), d AS (
  SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM w
), t AS (
  SELECT doc_id, unnest(ws) AS word FROM w
), tf AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM t
  WHERE word IN ('table','window','join','hash') GROUP BY doc_id, word
), df AS (
  SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM t
  WHERE word IN ('table','window','join','hash') GROUP BY word
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS tot FROM d
)
SELECT tf.doc_id, tf.word, tf.tf,
       -- every literal cast to DOUBLE: DuckDB parses bare 0.5/1.2/2.2 as
       -- DECIMAL, whose intermediate rounding differs from IEEE doubles
       (n - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE) * (tf * 2.2::DOUBLE)
         / (tf + 1.2::DOUBLE * (1 - 0.75::DOUBLE + 0.75::DOUBLE * dl / (CAST(tot AS DOUBLE) / n))) AS bm25
FROM tf JOIN df USING (word) JOIN d ON tf.doc_id = d.doc_id CROSS JOIN s
ORDER BY tf.doc_id, tf.word
"""


def mad_outlier_docs(sf_dir: str) -> "rd.Dataset":
    """Robust per-source outlier detection on document length: flag docs
    with ``|n_chars - median| > 3 × MAD`` (median absolute deviation) —
    the outlier filter a curation stack uses where :func:`zscore_doc_length`
    would be dragged by the very outliers it hunts (median/MAD have a 50%
    breakdown point; mean/std have 0%).

    Medians are holistic, so groups must co-locate: ONE source-keyed
    exchange (:func:`~xmlschema_ray.ops.relational.hash_partition_apply`),
    then both medians + the flag entirely in-partition (two ``np.median``
    passes per group — linear-interpolation semantics match DuckDB's
    ``median`` exactly, so the comparison is bit-stable). Source
    cardinality bounds the skew: at 100 TB with few giant sources the
    production form switches to sampled/sketched quantiles
    (cf. the NTILE range-partition sampler) — this is the exact path.
    """
    from xmlschema_ray.ops.relational import hash_partition_apply

    ds = rd.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "source", "n_chars"]
    )

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "source": pd.Series([], dtype=object),
                "n_chars": pd.Series([], dtype="int64"),
                "med": pd.Series([], dtype="float64"),
                "mad": pd.Series([], dtype="float64"),
            }
        )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = _empty()
        outs = []
        for _src, gg in g.groupby("source", sort=False):
            x = gg["n_chars"].to_numpy(np.int64)
            med = np.median(x)
            adev = np.abs(x - med)
            mad = np.median(adev)
            mask = adev > 3.0 * mad
            k = int(mask.sum())
            if k == 0:
                continue
            outs.append(
                pd.DataFrame(
                    {
                        "doc_id": gg["doc_id"].to_numpy(np.int64)[mask],
                        "source": gg["source"].to_numpy()[mask],
                        "n_chars": x[mask],
                        "med": np.full(k, med),
                        "mad": np.full(k, mad),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else empty

    out = hash_partition_apply(ds, "source", per_part).sort("doc_id")
    # an all-clean corpus yields ZERO outliers; the sorted empty Dataset
    # carries no schema (Ray sort emits schema-less empty blocks), so fall
    # back to the typed empty frame — result-sized, so materialize is safe
    return dataset_or_typed_empty(out, _empty())


MAD_OUTLIER_SQL = """
WITH m AS (
  SELECT source, median(n_chars) AS med FROM documents GROUP BY source
), d AS (
  SELECT doc_id, documents.source AS source, n_chars, med
  FROM documents JOIN m USING (source)
), m2 AS (
  SELECT source, median(abs(n_chars - med)) AS mad FROM d GROUP BY source
)
SELECT doc_id, d.source AS source, n_chars, med, mad
FROM d JOIN m2 USING (source)
WHERE abs(n_chars - med) > 3 * mad
ORDER BY doc_id
"""


# -- bigram LM quality scoring ---------------------------------------------


def bigram_lm_scores(sf_dir: str, max_model_rows: int = 5_000_000) -> "rd.Dataset":
    """Sorted public wrapper over :func:`_bigram_lm_scores_ds` (the
    oracle-facing query; the bucketing pipeline composes on the unsorted
    internal form instead of paying this sort)."""
    return sorted_or_typed_empty(
        _bigram_lm_scores_ds(sf_dir, max_model_rows), ["doc_id"], template=_BIGRAM_LM_EMPTY
    )


def _bigram_lm_scores_ds(
    sf_dir: str, max_model_rows: int = 5_000_000, extra_cols: tuple = ()
) -> "rd.Dataset":
    """CCNet/KenLM-style LM quality scoring: every document is scored by
    how "common" its bigrams are under a corpus-wide bigram model — the
    language-model filter of a pre-training cleaning stack
    (perplexity-bucket selection), in its distributed shape.

    Two passes. Pass 1 trains the model: per-batch distinct-bigram count
    partials (the :func:`~xmlschema_ray.pipelines.curation.top_words`
    combiner shape) reduce to the global bigram table; CONTEXT counts
    need no second aggregate — the count of word w as a bigram left-hand
    side is the sum of the model's own rows with left word w. Pass 2
    broadcasts the model once (``ray.put``, lazily fetched per worker —
    exactly CCNet's regime, where a bounded pruned KenLM ships to every
    node) and scores each batch stateless-vectorized: two
    ``searchsorted`` lookups per gram, integer per-doc sums via groupby
    (documents never span batches, so per-batch rows are final).

    A real deployment prunes the model to its top-K rows before the
    broadcast; ``max_model_rows`` refuses unpruned vocabulary-explosion
    corpora instead of silently shipping a fact-sized model (the
    bucketed-join fallback is the `dup_gram_fraction` exchange).

    Float-exactness: per-doc sums stay INTEGER (no float summation order
    exists); the only float op is the final pooled conditional
    probability ``score_ppm = floor(1e6 * sum_bigram_n / sum_context_n
    + 0.5)`` — one division + one multiply of identical int64-derived
    doubles, bit-equal on both engines. Docs with < 2 tokens have no
    bigrams and are excluded (as in the SQL's inner join).

    ``extra_cols`` are per-document metadata columns (e.g. ``lang``)
    carried through the gram groupby by first-value — free for columns
    constant within a document.
    """
    import pyarrow as pa
    import ray

    from xmlschema_ray.ops.relational import combiner_aggregate
    from xmlschema_ray.pipelines.curation import _gram_count_partial

    ds = rd.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text", *extra_cols]
    )
    partials = ds.map_batches(_gram_count_partial(2, "bigram"), batch_format="pyarrow")
    # gate BEFORE the driver collect: the reduced model lands in the
    # (spillable) object store first, so a vocabulary-explosion corpus
    # raises here instead of OOMing the driver heap on to_pandas()
    # consolidate: bigram keyspace is fact-sized and Zipf-hot ("of the"
    # emits one partial per batch) — the key-agnostic combining pass
    # bounds any hot key's final-partition rows (ops/relational.py:550)
    model_ds = combiner_aggregate(
        partials, "bigram", {"n": ("n", "sum")}, consolidate=True
    ).materialize()
    n_rows = model_ds.count()
    if n_rows > max_model_rows:
        raise ValueError(
            f"bigram model has {n_rows} rows > max_model_rows={max_model_rows}; "
            "prune the model (top-K by count) before broadcast, or use the "
            "bigram-keyed bucketed-join path (see dup_gram_fraction)"
        )
    model = model_ds.to_pandas()
    model = model.sort_values("bigram").reset_index(drop=True)
    left = model["bigram"].str.split(" ", n=1).str[0]
    ctx = model.groupby(left)["n"].sum().sort_index()
    model_ref = ray.put(
        (
            model["bigram"].to_numpy(),
            model["n"].to_numpy(np.int64),
            ctx.index.to_numpy(),
            ctx.to_numpy(np.int64),
        )
    )
    state: dict = {}

    def lookup(keys: np.ndarray, counts: np.ndarray, needles: np.ndarray) -> np.ndarray:
        """Count lookup that FAILS LOUDLY on a gram absent from the model
        (searchsorted alone would silently read a neighbor's count) —
        the invariant is that pass 2 scores the same corpus pass 1
        trained on; a rewritten input or a foreign corpus raises here
        instead of producing wrong scores."""
        idx = np.minimum(np.searchsorted(keys, needles), len(keys) - 1)
        if not (keys[idx] == needles).all():
            raise ValueError(
                "gram absent from the trained bigram model — the scored "
                "corpus does not match the corpus the model was trained on"
            )
        return counts[idx]

    def score(batch: pa.Table) -> pd.DataFrame:
        from xmlschema_ray.pipelines.common import scaled_int
        from xmlschema_ray.pipelines.curation import _word_gram_parts

        m = state.get("m")
        if m is None:
            m = state["m"] = ray.get(model_ref)
        bigrams_k, bigrams_n, ctx_k, ctx_n = m
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        row_idx, (lefts, rights) = _word_gram_parts(batch["text"], 2)
        if len(lefts) == 0:
            return _bigram_lm_empty(extra_cols).copy()
        n2 = lookup(bigrams_k, bigrams_n, lefts + " " + rights)
        n1 = lookup(ctx_k, ctx_n, lefts)
        df = pd.DataFrame({"doc_id": ids[row_idx], "n2": n2, "n1": n1})
        aggs = dict(
            n_bigrams=("n2", "size"), sum_bigram_n=("n2", "sum"), sum_context_n=("n1", "sum")
        )
        for c in extra_cols:
            vals = batch[c].to_numpy(zero_copy_only=False)
            df[c] = vals[row_idx]
            aggs[c] = (c, "first")
        g = df.groupby("doc_id", sort=False).agg(**aggs).reset_index()
        sb = g["sum_bigram_n"].to_numpy(np.int64).astype(np.float64)
        sc = g["sum_context_n"].to_numpy(np.int64).astype(np.float64)
        g["score_ppm"] = scaled_int(sb / sc, 1e6)
        return g.astype(
            {"doc_id": np.int64, "n_bigrams": np.int64, "sum_bigram_n": np.int64,
             "sum_context_n": np.int64}
        )

    return ds.map_batches(score, batch_format="pyarrow")


def _bigram_lm_empty(extra_cols: tuple = ()) -> pd.DataFrame:
    out = {
        "doc_id": np.array([], dtype=np.int64),
        "n_bigrams": np.array([], dtype=np.int64),
        "sum_bigram_n": np.array([], dtype=np.int64),
        "sum_context_n": np.array([], dtype=np.int64),
    }
    for c in extra_cols:
        out[c] = pd.Series([], dtype=object)
    out["score_ppm"] = np.array([], dtype=np.int64)
    return pd.DataFrame(out)


_BIGRAM_LM_EMPTY = _bigram_lm_empty()


BIGRAM_LM_SQL = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents
), g AS (
  SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS bigram, ws[i] AS ctx
  FROM w, LATERAL unnest(generate_series(1, len(ws) - 1)) AS t(i)
), c2 AS (
  SELECT bigram, COUNT(*) AS n2 FROM g GROUP BY bigram
), c1 AS (
  SELECT ctx, COUNT(*) AS n1 FROM g GROUP BY ctx
), s AS (
  SELECT g.doc_id,
         COUNT(*) AS n_bigrams,
         SUM(c2.n2) AS sum_bigram_n,
         SUM(c1.n1) AS sum_context_n
  FROM g JOIN c2 USING (bigram) JOIN c1 ON c1.ctx = g.ctx
  GROUP BY g.doc_id
)
SELECT doc_id,
       CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(sum_bigram_n AS BIGINT) AS sum_bigram_n,
       CAST(sum_context_n AS BIGINT) AS sum_context_n,
       CAST(floor(1000000.0 * (CAST(sum_bigram_n AS DOUBLE) / CAST(sum_context_n AS DOUBLE)) + 0.5) AS BIGINT) AS score_ppm
FROM s
ORDER BY doc_id
"""


_CCNET_EMPTY = pd.DataFrame(
    {
        "doc_id": np.array([], dtype=np.int64),
        "lang": pd.Series([], dtype=object),
        "score_ppm": np.array([], dtype=np.int64),
        "bucket": np.array([], dtype=np.int64),
        "tier": pd.Series([], dtype=object),
    }
)


def ccnet_lm_buckets(
    sf_dir: str, n_buckets: int = 3, max_model_rows: int = 5_000_000
) -> "rd.Dataset":
    """CCNet-style per-language LM-quality bucketing (Wenzek et al. 2020
    §4.3): within each language, rank documents by LM score and cut into
    head/middle/tail tiers — the selection stage that follows perplexity
    scoring in the CCNet cleaning stack.

    Composition of two existing exact distributed ops: the bigram LM
    scorer (:func:`_bigram_lm_scores_ds`, carrying ``lang``) and the
    sampled-range-partition global rank (``ops.relational.global_rank``)
    over the total order ``(lang, -score, doc_id)``. Per-language NTILE
    is then closed-form: the per-language doc counts (one combiner row
    per language — metadata-sized) give rank offsets, and the bucket is
    the same divmod formula as ``orders_price_ntile``, evaluated
    per-row against the language's own total. The scored narrow
    projection (4 columns/doc) is materialized once so the rank op's
    three consumptions (boundary sample, range counts, local rank) don't
    re-run the scoring pass — exactly CCNet's design, which writes the
    per-shard LM scores to disk before bucketing.
    """
    from xmlschema_ray.ops.relational import combiner_aggregate, global_rank

    scores = _bigram_lm_scores_ds(sf_dir, max_model_rows, extra_cols=("lang",))

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "lang": batch["lang"],
                "score_ppm": batch["score_ppm"].astype("int64"),
                "__neg": (-batch["score_ppm"]).astype("int64"),
            }
        )

    keyed_ds = scores.map_batches(keyed, batch_format="pandas").materialize()

    lang_n = (
        combiner_aggregate(keyed_ds, "lang", {"n": (None, "count")})
        .to_pandas()
        .sort_values("lang")
    )
    offs: Dict[str, int] = {}
    totals: Dict[str, int] = {}
    run = 0
    for lang, n in zip(lang_n["lang"], lang_n["n"]):
        offs[lang] = run
        totals[lang] = int(n)
        run += int(n)

    ranked, _total = global_rank(keyed_ds, ["lang", "__neg", "doc_id"], rank_col="__rank")
    tiers = np.array(["head", "middle", "tail"], dtype=object)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        lr = batch["__rank"].to_numpy(np.int64) - batch["lang"].map(offs).to_numpy(
            np.int64
        )
        n = batch["lang"].map(totals).to_numpy(np.int64)
        q, r = n // n_buckets, n % n_buckets
        cut = r * (q + 1)
        bucket = np.where(
            q == 0, lr, np.where(lr <= cut, (lr - 1) // np.maximum(q + 1, 1) + 1,
                                 r + (lr - cut - 1) // np.maximum(q, 1) + 1)
        ).astype(np.int64)
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64),
                "lang": batch["lang"].to_numpy(),
                "score_ppm": batch["score_ppm"].to_numpy(np.int64),
                "bucket": bucket,
            }
        )
        out["tier"] = (
            tiers[np.minimum(bucket, 3) - 1] if n_buckets == 3 else bucket.astype(str)
        )
        return out

    return sorted_or_typed_empty(
        ranked.map_batches(finish, batch_format="pandas"),
        ["doc_id"],
        template=_CCNET_EMPTY,
    )


CCNET_BUCKETS_SQL = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents
), g AS (
  SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS bigram, ws[i] AS ctx
  FROM w, LATERAL unnest(generate_series(1, len(ws) - 1)) AS t(i)
), c2 AS (
  SELECT bigram, COUNT(*) AS n2 FROM g GROUP BY bigram
), c1 AS (
  SELECT ctx, COUNT(*) AS n1 FROM g GROUP BY ctx
), s AS (
  SELECT g.doc_id, SUM(c2.n2) AS sum_bigram_n, SUM(c1.n1) AS sum_context_n
  FROM g JOIN c2 USING (bigram) JOIN c1 ON c1.ctx = g.ctx
  GROUP BY g.doc_id
), sc AS (
  SELECT s.doc_id, d.lang,
    CAST(floor(1000000.0 * (CAST(sum_bigram_n AS DOUBLE) / CAST(sum_context_n AS DOUBLE)) + 0.5) AS BIGINT) AS score_ppm
  FROM s JOIN documents d ON d.doc_id = s.doc_id
)
SELECT doc_id, lang, score_ppm,
  CAST(NTILE(3) OVER (PARTITION BY lang ORDER BY score_ppm DESC, doc_id) AS BIGINT) AS bucket,
  CASE NTILE(3) OVER (PARTITION BY lang ORDER BY score_ppm DESC, doc_id)
    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS tier
FROM sc
ORDER BY doc_id
"""


ORACLES: Dict[str, str] = {
    "token_counts": TOKEN_COUNTS_SQL,
    "bigram_lm_scores": BIGRAM_LM_SQL,
    "ccnet_lm_buckets": CCNET_BUCKETS_SQL,
    "bm25_scores": BM25_SQL,
    "zscore_doc_length": ZSCORE_SQL,
    "doc_quality": DOC_QUALITY_SQL,
    "gopher_quality_flags": GOPHER_QUALITY_SQL,
    "fingerprints": FINGERPRINTS_SQL,
    "language_id_counts": LANGUAGE_ID_SQL,
    "lang_mismatch_audit": LANG_MISMATCH_SQL,
    "chars_quartiles_by_source": CHARS_QUARTILES_SQL,
    "mad_outlier_docs": MAD_OUTLIER_SQL,
}

QUERIES = {
    "token_counts": token_counts,
    "bigram_lm_scores": bigram_lm_scores,
    "ccnet_lm_buckets": ccnet_lm_buckets,
    "bm25_scores": bm25_scores,
    "zscore_doc_length": zscore_doc_length,
    "doc_quality": doc_quality,
    "gopher_quality_flags": gopher_quality_flags,
    "language_id_counts": language_id_counts,
    "lang_mismatch_audit": lang_mismatch_audit,
    "fingerprints": fingerprints,
    "chars_quartiles_by_source": chars_quartiles_by_source,
    "mad_outlier_docs": mad_outlier_docs,
}
