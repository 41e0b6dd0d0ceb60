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
from xmlschema_ray.pipelines.common import table_path


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


ORACLES: Dict[str, str] = {
    "token_counts": TOKEN_COUNTS_SQL,
    "doc_quality": DOC_QUALITY_SQL,
    "fingerprints": FINGERPRINTS_SQL,
    "language_id_counts": LANGUAGE_ID_SQL,
    "chars_quartiles_by_source": CHARS_QUARTILES_SQL,
}

QUERIES = {
    "token_counts": token_counts,
    "doc_quality": doc_quality,
    "language_id_counts": language_id_counts,
    "fingerprints": fingerprints,
    "chars_quartiles_by_source": chars_quartiles_by_source,
}
