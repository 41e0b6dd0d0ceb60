"""Flagship pipelines over the sequence-shaped table (BASELINE.json hint).

``validate_sequences`` derives the ``(doc_id, tokens, n_tok, source)``
table from the driver's ``documents.parquet`` (deterministic word-hash
tokens) and runs the full constraint suite; ``validate_sequences_seeded``
runs it over a seeded-defect synthetic corpus and reports exact violation
counts; ``drift_check`` profiles one half of the corpus and gates the
other half against it. All rows-only checks (the Ray-vs-SQL proof for the
same kernels lives in ``validation_queries.py``).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa

import pyarrow.compute as pc
import ray.data as rd

from xmlschema_ray.engine.engine import ValidationEngine
from xmlschema_ray.sources.synthetic import (
    SOURCES,
    sequences_from_documents,
    sequences_spec,
    write_sequences_corpus,
)


def _scratch(tag: str) -> str:
    d = os.path.join(tempfile.gettempdir(), "xmlschema_ray", tag)
    if os.path.exists(d):
        shutil.rmtree(d)
    os.makedirs(d, exist_ok=True)
    return d


def _sources_dim(sf_dir: str) -> pa.Table:
    srcs = sorted(
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["source"]).unique(
            "source"
        )
    )
    return pa.table({"source": pa.array(srcs, type=pa.string())})


def validate_sequences(sf_dir: str) -> pd.DataFrame:
    """Full validation run over the derived sequence table.

    Returns the per-partition verdict table (PSVI vocabulary); the derived
    corpus is clean so the run proves the whole pipeline at `valid`.
    """
    seq = sequences_from_documents(sf_dir)
    spec = sequences_spec()
    out_dir = _scratch("validate_sequences")
    eng = ValidationEngine(spec, batch_size=4096, n_shards=1)
    res = eng.run(seq, out_dir=out_dir, dims={"sources": _sources_dim(sf_dir)}, resume=False)
    v = res.verdicts.copy()
    v["job_validity"] = res.job_validity
    return v


def validate_sequences_seeded(sf_dir: str) -> pd.DataFrame:
    """Seeded-defect corpus → exact per-constraint violation counts
    (the `--errors N` manifest convention as a queryable result)."""
    out_root = _scratch("validate_sequences_seeded")
    seq_dir, dim_path, expected = write_sequences_corpus(
        os.path.join(out_root, "corpus"),
        n_rows=1200,
        n_files=8,
        defects={"dup_doc_id": 7, "bad_ref": 5, "n_tok_mismatch": 6, "bad_token_range": 9},
    )
    eng = ValidationEngine(sequences_spec(), batch_size=512, n_shards=2)
    res = eng.run(seq_dir, out_dir=os.path.join(out_root, "out"), dims={"sources": dim_path})
    viol = res.violations()
    got = viol.groupby("constraint_name").size()
    out = pd.DataFrame(
        {
            "constraint_name": got.index,
            "n_violations": pd.array(got.values, dtype="int64"),
            "n_expected": pd.array([expected.get(c, 0) for c in got.index], dtype="int64"),
        }
    )
    return out.sort_values("constraint_name").reset_index(drop=True)


def drift_check(sf_dir: str) -> pd.DataFrame:
    """Profile-then-gate drift demo: token-length histogram of the first
    half of the corpus becomes the reference profile; the second half is
    gated against it (KS + PSI). Deterministic; same-distribution halves
    ⇒ pass."""
    import pyarrow.compute as pc

    seq = sequences_from_documents(sf_dir)

    def _half(parity: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(pc.bit_wise_and(t["n_tok"], 1), parity))

        return seq.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

    half_a = _half(0)
    half_b = _half(1)

    spec_profile = sequences_spec()
    out_a = _scratch("drift_profile")
    eng = ValidationEngine(spec_profile, batch_size=4096, n_shards=1)
    dims = {"sources": _sources_dim(sf_dir)}
    res_a = eng.run(half_a, out_dir=out_a, dims=dims, resume=False)
    ref_hist = tuple(int(x) for x in res_a.summary["histograms"]["len(tokens)"])

    spec_gated = sequences_spec(reference_hist=ref_hist)
    out_b = _scratch("drift_gated")
    res_b = ValidationEngine(spec_gated, batch_size=4096, n_shards=1).run(
        half_b, out_dir=out_b, dims=dims, resume=False
    )
    # Scaled-int metrics (pipelines/common.py convention) so the DuckDB
    # oracle can recompute KS/PSI exactly: histogram counts are integers,
    # the per-bin divisions are identical IEEE ops on both sides, and e6
    # scaling puts any last-ulp summation-order difference ~9 orders of
    # magnitude away from a rounding boundary.
    return pd.DataFrame(
        [
            {
                "name": d.name,
                "column": d.column,
                "n_ref": np.int64(sum(ref_hist)),
                "n_cur": np.int64(sum(d.observed_hist)),
                "ks_e6": np.int64(np.floor(d.ks * 1e6 + 0.5)),
                "psi_e6": np.int64(np.floor(d.psi * 1e6 + 0.5)),
                "passed": bool(d.passed),
            }
            for d in res_b.drift
        ]
    )


# DuckDB re-derivation of the whole drift pipeline: re-tokenize documents
# (same whitespace split the green token_counts oracle validates), split
# halves by n_tok parity, bin into the spec's 256 fixed-width bins
# (max_tok=8192 / 256 bins = width 32; np.histogram closes the last bin ⇒
# LEAST(bin, 255)), then recompute the binned-ECDF KS statistic and
# eps-clipped PSI exactly as engine/stats.py does.
DRIFT_SQL = """
WITH toks AS (
  SELECT CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok
  FROM documents
), binned AS (
  SELECT LEAST(CAST(FLOOR(n_tok / 32.0) AS BIGINT), 255) AS bin, n_tok % 2 AS par
  FROM toks WHERE n_tok BETWEEN 0 AND 8192
), grid AS (
  SELECT range AS bin FROM range(0, 256)
), h AS (
  SELECT g.bin,
         CAST(COALESCE(SUM(CASE WHEN par = 0 THEN 1 END), 0) AS DOUBLE) AS ca,
         CAST(COALESCE(SUM(CASE WHEN par = 1 THEN 1 END), 0) AS DOUBLE) AS cb
  FROM grid g LEFT JOIN binned b ON b.bin = g.bin GROUP BY g.bin
), tot AS (
  SELECT SUM(ca) AS na, SUM(cb) AS nb FROM h
), cum AS (
  SELECT SUM(ca) OVER (ORDER BY bin) / (SELECT na FROM tot) AS fa,
         SUM(cb) OVER (ORDER BY bin) / (SELECT nb FROM tot) AS fb
  FROM h
), ks AS (
  SELECT MAX(ABS(fa - fb)) AS ks FROM cum
), terms AS (
  SELECT GREATEST(ca / (SELECT na FROM tot), 1e-6) AS pe,
         GREATEST(cb / (SELECT nb FROM tot), 1e-6) AS pa
  FROM h
), psi AS (
  SELECT SUM((pa - pe) * LN(pa / pe)) AS psi FROM terms
)
SELECT 'drift_token_length' AS name,
       'tokens' AS "column",
       CAST((SELECT na FROM tot) AS BIGINT) AS n_ref,
       CAST((SELECT nb FROM tot) AS BIGINT) AS n_cur,
       CAST(FLOOR((SELECT ks FROM ks) * 1e6 + 0.5) AS BIGINT) AS ks_e6,
       CAST(FLOOR((SELECT psi FROM psi) * 1e6 + 0.5) AS BIGINT) AS psi_e6,
       ((SELECT ks FROM ks) <= 0.15 AND (SELECT psi FROM psi) <= 0.25) AS passed
"""


def drift_by_source(sf_dir: str) -> pd.DataFrame:
    """Per-PROVENANCE drift gates (``DriftSpec(group_by=...)`` through the
    full engine): the corpus aggregate token-length profile becomes the
    reference, and every source's own distribution is gated against it —
    the source-mix diagnostic that catches one bad provenance feed hiding
    inside a healthy aggregate. Scaled-int KS/PSI outputs per source, the
    ``drift_check`` oracle convention."""
    seq = sequences_from_documents(sf_dir)
    dims = {"sources": _sources_dim(sf_dir)}

    res_a = ValidationEngine(sequences_spec(), batch_size=4096, n_shards=1).run(
        seq, out_dir=_scratch("drift_src_profile"), dims=dims, resume=False
    )
    ref_hist = tuple(int(x) for x in res_a.summary["histograms"]["len(tokens)"])

    res_b = ValidationEngine(
        sequences_spec(reference_hist=ref_hist, drift_group_by="source"),
        batch_size=4096,
        n_shards=1,
    ).run(seq, out_dir=_scratch("drift_src_gated"), dims=dims, resume=False)

    rows = []
    for d in res_b.drift:
        if "[" not in d.name:
            continue  # the aggregate gate (trivially ks=0 vs itself)
        rows.append(
            {
                "source": d.name.split("[", 1)[1][:-1],
                "n_cur": np.int64(sum(d.observed_hist)),
                "ks_e6": np.int64(np.floor(d.ks * 1e6 + 0.5)),
                "psi_e6": np.int64(np.floor(d.psi * 1e6 + 0.5)),
                "passed": bool(d.passed),
            }
        )
    return pd.DataFrame(rows).sort_values("source").reset_index(drop=True)


# DuckDB re-derivation of the grouped gates: same binning as DRIFT_SQL,
# but the reference side is the corpus aggregate and the current side is
# each source's own histogram over the complete source×bin grid.
DRIFT_BY_SOURCE_SQL = """
WITH toks AS (
  SELECT source,
         CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok
  FROM documents
), binned AS (
  SELECT source, LEAST(CAST(FLOOR(n_tok / 32.0) AS BIGINT), 255) AS bin
  FROM toks WHERE n_tok BETWEEN 0 AND 8192
), srcs AS (
  SELECT DISTINCT source FROM binned
), grid AS (
  SELECT s.source, r.range AS bin FROM srcs s, range(0, 256) r
), h AS (
  SELECT g.source, g.bin, CAST(COUNT(b.bin) AS DOUBLE) AS cb
  FROM grid g LEFT JOIN binned b ON b.source = g.source AND b.bin = g.bin
  GROUP BY g.source, g.bin
), aggh AS (
  SELECT r.range AS bin, CAST(COALESCE(a.n, 0) AS DOUBLE) AS ca
  FROM range(0, 256) r
  LEFT JOIN (SELECT bin, COUNT(*) AS n FROM binned GROUP BY bin) a ON a.bin = r.range
), tot AS (
  SELECT SUM(ca) AS na FROM aggh
), stot AS (
  SELECT source, SUM(cb) AS nb FROM h GROUP BY source
), cum AS (
  SELECT h.source,
         SUM(a.ca) OVER (PARTITION BY h.source ORDER BY h.bin) / (SELECT na FROM tot) AS fa,
         SUM(h.cb) OVER (PARTITION BY h.source ORDER BY h.bin) / s.nb AS fb
  FROM h JOIN aggh a USING (bin) JOIN stot s USING (source)
), ks AS (
  SELECT source, MAX(ABS(fa - fb)) AS ks FROM cum GROUP BY source
), terms AS (
  SELECT h.source,
         GREATEST(a.ca / (SELECT na FROM tot), 1e-6) AS pe,
         GREATEST(h.cb / s.nb, 1e-6) AS pa
  FROM h JOIN aggh a USING (bin) JOIN stot s USING (source)
), psi AS (
  SELECT source, SUM((pa - pe) * LN(pa / pe)) AS psi FROM terms GROUP BY source
)
SELECT s.source,
       CAST(st.nb AS BIGINT) AS n_cur,
       CAST(FLOOR(k.ks * 1e6 + 0.5) AS BIGINT) AS ks_e6,
       CAST(FLOOR(p.psi * 1e6 + 0.5) AS BIGINT) AS psi_e6,
       (k.ks <= 0.15 AND p.psi <= 0.25) AS passed
FROM srcs s
JOIN stot st USING (source) JOIN ks k USING (source) JOIN psi p USING (source)
ORDER BY s.source
"""


def drift_by_source_windowed(sf_dir: str) -> pd.DataFrame:
    """WITHIN-source drift over time (``DriftSpec.group_references``):
    each source's first-window profile (n_tok-parity half A) becomes that
    source's OWN reference, and its second window (half B) is gated
    against it — the production drift shape (is source X's feed changing
    vs its own history?), vs :func:`drift_by_source`'s source-vs-corpus
    mix diagnostic. Same-distribution halves ⇒ all pass; scaled-int
    KS/PSI per source."""
    import pyarrow.compute as pc

    seq = sequences_from_documents(sf_dir)
    dims = {"sources": _sources_dim(sf_dir)}

    def _half(parity: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(pc.bit_wise_and(t["n_tok"], 1), parity))

        return seq.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

    res_a = ValidationEngine(
        sequences_spec(drift_group_by="source"), batch_size=4096, n_shards=1
    ).run(_half(0), out_dir=_scratch("drift_win_profile"), dims=dims, resume=False)
    prefix = "len(tokens)@"
    group_refs = {
        k[len(prefix):]: tuple(int(x) for x in h)
        for k, h in res_a.summary["histograms"].items()
        if k.startswith(prefix)
    }
    ref_totals = {g: sum(h) for g, h in group_refs.items()}

    res_b = ValidationEngine(
        sequences_spec(
            reference_hist=tuple(
                int(x) for x in res_a.summary["histograms"]["len(tokens)"]
            ),
            drift_group_by="source",
            drift_group_references=group_refs,
        ),
        batch_size=4096,
        n_shards=1,
    ).run(_half(1), out_dir=_scratch("drift_win_gated"), dims=dims, resume=False)

    rows = []
    for d in res_b.drift:
        if "[" not in d.name:
            continue
        src = d.name.split("[", 1)[1][:-1]
        rows.append(
            {
                "source": src,
                "n_ref": np.int64(ref_totals.get(src, 0)),
                "n_cur": np.int64(sum(d.observed_hist)),
                "ks_e6": np.int64(np.floor(d.ks * 1e6 + 0.5)),
                "psi_e6": np.int64(np.floor(d.psi * 1e6 + 0.5)),
                "passed": bool(d.passed),
            }
        )
    return pd.DataFrame(rows).sort_values("source").reset_index(drop=True)


DRIFT_BY_SOURCE_WINDOWED_SQL = """
WITH toks AS (
  SELECT source,
         CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok
  FROM documents
), binned AS (
  SELECT source, LEAST(CAST(FLOOR(n_tok / 32.0) AS BIGINT), 255) AS bin,
         n_tok % 2 AS par
  FROM toks WHERE n_tok BETWEEN 0 AND 8192
), srcs AS (
  SELECT DISTINCT source FROM binned WHERE par = 1
), grid AS (
  SELECT s.source, r.range AS bin FROM srcs s, range(0, 256) r
), h AS (
  SELECT g.source, g.bin,
         CAST(COALESCE(SUM(CASE WHEN par = 0 THEN 1 END), 0) AS DOUBLE) AS ca,
         CAST(COALESCE(SUM(CASE WHEN par = 1 THEN 1 END), 0) AS DOUBLE) AS cb
  FROM grid g LEFT JOIN binned b ON b.source = g.source AND b.bin = g.bin
  GROUP BY g.source, g.bin
), stot AS (
  SELECT source, SUM(ca) AS na, SUM(cb) AS nb FROM h GROUP BY source
), cum AS (
  SELECT h.source,
         SUM(h.ca) OVER (PARTITION BY h.source ORDER BY h.bin) / s.na AS fa,
         SUM(h.cb) OVER (PARTITION BY h.source ORDER BY h.bin) / s.nb AS fb
  FROM h JOIN stot s USING (source)
), ks AS (
  SELECT source, MAX(ABS(fa - fb)) AS ks FROM cum GROUP BY source
), terms AS (
  SELECT h.source,
         GREATEST(h.ca / s.na, 1e-6) AS pe,
         GREATEST(h.cb / s.nb, 1e-6) AS pa
  FROM h JOIN stot s USING (source)
), psi AS (
  SELECT source, SUM((pa - pe) * LN(pa / pe)) AS psi FROM terms GROUP BY source
)
SELECT s.source,
       CAST(st.na AS BIGINT) AS n_ref,
       CAST(st.nb AS BIGINT) AS n_cur,
       CAST(FLOOR(k.ks * 1e6 + 0.5) AS BIGINT) AS ks_e6,
       CAST(FLOOR(p.psi * 1e6 + 0.5) AS BIGINT) AS psi_e6,
       (k.ks <= 0.15 AND p.psi <= 0.25) AS passed
FROM srcs s
JOIN stot st USING (source) JOIN ks k USING (source) JOIN psi p USING (source)
ORDER BY s.source
"""


# DuckDB cross-check of the seeded run: recomputes every constraint's
# violation count from the corpus the query just wrote to its deterministic
# scratch dir (the reference's `--errors N` manifest convention,
# tests/test_factory.py:116-193, as a full SQL oracle). The expected counts
# mirror the defects dict hardcoded in validate_sequences_seeded.
SEEDED_SQL = """
WITH seq AS (
  SELECT * FROM read_parquet('/tmp/xmlschema_ray/validate_sequences_seeded/corpus/sequences/*.parquet')
), dims AS (
  SELECT source FROM read_parquet('/tmp/xmlschema_ray/validate_sequences_seeded/corpus/sources.parquet')
), counts AS (
  SELECT 'fk_source' AS constraint_name,
         (SELECT COUNT(*) FROM seq WHERE source NOT IN (SELECT source FROM dims)) AS n_violations
  UNION ALL
  SELECT 'n_tok_equals_len_tokens',
         (SELECT COUNT(*) FROM seq WHERE n_tok <> length(tokens))
  UNION ALL
  SELECT 'tokens.items[minInclusive(0),maxExclusive(50257)]',
         (SELECT COUNT(*) FROM seq
          WHERE length(list_filter(tokens, t -> t < 0 OR t >= 50257)) > 0)
  UNION ALL
  SELECT 'unique_doc_id',
         (SELECT COUNT(*) FROM (SELECT doc_id FROM seq GROUP BY doc_id HAVING COUNT(*) > 1))
), expected AS (
  SELECT * FROM (VALUES
    ('fk_source', 5),
    ('n_tok_equals_len_tokens', 6),
    ('tokens.items[minInclusive(0),maxExclusive(50257)]', 9),
    ('unique_doc_id', 7)) AS e(constraint_name, n_expected)
)
SELECT c.constraint_name,
       CAST(c.n_violations AS BIGINT) AS n_violations,
       CAST(e.n_expected AS BIGINT) AS n_expected
FROM counts c JOIN expected e USING (constraint_name)
ORDER BY constraint_name
"""

# The flagship's verdict table over the CLEAN derived corpus is itself
# SQL-expressible: one partition, row count = documents row count, zero
# violations, everything `valid` (the PSVI summary a correct engine must
# produce for defect-free input).
VALIDATE_SEQUENCES_SQL = """
SELECT CAST(0 AS BIGINT) AS partition_id,
       'valid' AS validity,
       'full' AS validation_attempted,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS n_violations,
       CAST(0 AS BIGINT) AS n_warnings,
       'valid' AS job_validity
FROM documents
"""

def val_composite_fk(sf_dir: str) -> pd.DataFrame:
    """Composite keyref (multi-field ``xs:field`` tuple) through the FULL
    ``ValidationEngine``: the allowed dimension is the deterministic
    md5-half of the corpus's distinct (source, lang) pairs — pairs whose
    ``md5(source || '|' || lang)`` starts >= '8' are allowed — so docs
    carrying an excluded pair are exactly the violations and BOTH engines
    recompute the same dim. Each field alone is always individually
    valid; only the PAIR membership fails, the case a single-column
    keyref cannot express (``identities.py:118-150``).

    Pair discovery is a bounded per-batch distinct partial (sources ×
    langs rows per batch, never the corpus); the engine broadcasts the
    distinct dim tuples once and exact-left-merges per batch.
    """
    from xmlschema_ray.constraints.spec import ColumnSpec, ForeignKey, TableConstraints
    from xmlschema_ray.pipelines.curation import _md5_hex

    doc_path = os.path.join(sf_dir, "documents.parquet")
    parts = rd.read_parquet(doc_path, columns=["source", "lang"]).map_batches(
        lambda b: b[["source", "lang"]].drop_duplicates(), batch_format="pandas"
    )
    pairs = parts.to_pandas().drop_duplicates().reset_index(drop=True)
    keep = np.array(
        [h[0] >= "8" for h in _md5_hex(pairs["source"] + "|" + pairs["lang"])]
    )
    dim = pa.Table.from_pandas(pairs.loc[keep].reset_index(drop=True), preserve_index=False)

    spec = TableConstraints(
        name="composite_fk_docs",
        columns=[
            ColumnSpec("doc_id", pa.int64(), nullable=False),
            ColumnSpec("source", pa.string()),
            ColumnSpec("lang", pa.string()),
        ],
        foreign_keys=[
            ForeignKey(("source", "lang"), "pairs", ("source", "lang"), name="fk_source_lang")
        ],
        key_columns=("doc_id",),
    )
    out_dir = _scratch("val_composite_fk")
    eng = ValidationEngine(spec, batch_size=4096, n_shards=1)
    res = eng.run(doc_path, out_dir=out_dir, dims={"pairs": dim}, resume=False)
    v = res.violations()
    return (
        pd.DataFrame(
            {
                "doc_id": pd.array(v["key"].astype("int64"), dtype="int64"),
                "constraint_name": v["constraint_name"].astype(object),
            }
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def val_fk_distributed(sf_dir: str) -> pd.DataFrame:
    """The stage-B2 DISTRIBUTED keyref under the DuckDB gate: referential
    integrity checked through the co-partitioning anti-join plan (the
    fact-to-fact path for dims too large to broadcast), not the broadcast
    set. ``broadcast_fk_cap_bytes=0`` forces EVERY dim through B2 — at
    production scale the cap trips naturally on a fact-sized dim; forcing
    it here keeps the toy dim on the same physical plan so the oracle
    verifies the B2 machinery itself (pruned source projection,
    combiner-deduped dim keys, per-partition vectorized ``isin``
    anti-mask, file-lineage partition attribution).

    The allowed dim is the deterministic md5-half of the corpus's distinct
    sources (``md5(source)`` starting >= '8'), so both engines recompute
    it and violations are exactly the docs carrying an excluded source.
    """
    from xmlschema_ray.constraints.spec import ColumnSpec, ForeignKey, TableConstraints
    from xmlschema_ray.pipelines.curation import _md5_hex

    doc_path = os.path.join(sf_dir, "documents.parquet")
    srcs = (
        rd.read_parquet(doc_path, columns=["source"])
        .map_batches(lambda b: b.drop_duplicates(), batch_format="pandas")
        .to_pandas()["source"]
        .drop_duplicates()
        .reset_index(drop=True)
    )
    allowed = srcs[np.array([h[0] >= "8" for h in _md5_hex(srcs)])]
    dim = pa.table({"source": pa.array(allowed.tolist(), type=pa.string())})

    spec = TableConstraints(
        name="fk_distributed_docs",
        columns=[
            ColumnSpec("doc_id", pa.int64(), nullable=False),
            ColumnSpec("source", pa.string()),
        ],
        foreign_keys=[ForeignKey("source", "allowed", "source", name="fk_source_allowed")],
        key_columns=("doc_id",),
    )
    out_dir = _scratch("val_fk_distributed")
    eng = ValidationEngine(spec, batch_size=4096, n_shards=1, broadcast_fk_cap_bytes=0)
    res = eng.run(doc_path, out_dir=out_dir, dims={"allowed": dim}, resume=False)
    v = res.violations()
    return (
        pd.DataFrame(
            {
                "doc_id": pd.array(v["key"].astype("int64"), dtype="int64"),
                "constraint_name": v["constraint_name"].astype(object),
            }
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


VAL_FK_DISTRIBUTED_SQL = """
WITH s AS (SELECT DISTINCT source FROM documents),
allowed AS (SELECT source FROM s WHERE substring(md5(source), 1, 1) >= '8')
SELECT doc_id, 'fk_source_allowed' AS constraint_name
FROM documents
WHERE source NOT IN (SELECT source FROM allowed)
ORDER BY doc_id
"""


def val_struct_key_dups(sf_dir: str) -> pd.DataFrame:
    """NESTED-FIELD identity constraint through the FULL engine (r5): the
    uniqueness key is a DOTTED STRUCT PATH — ``meta.src``+``meta.grp``, a
    composite key addressing subfields of a packed metadata struct (the
    XPath field-selector analog, reference
    ``validators/identities.py:64-150``; at 100× metadata rides struct
    columns and flattening by hand is exactly the toil this removes).
    Documents are packed into parquet with ``meta = struct{src, grp}``
    (cached per SF), then the engine runs the ordinary two-phase exact
    uniqueness machinery over the dotted key: stage A flattens the path at
    batch entry (``augment_struct_keys``) and emits hashed keycounts;
    stage B's recovery scan reads the ROOT struct column from parquet and
    flattens again — proving the dotted path survives both the streaming
    pass and the physical column pruning. Output: one row per duplicated
    (src, grp) tuple with its exact count, re-derived by the oracle's
    GROUP BY ... HAVING."""
    import re

    from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints, UniqueKey

    doc_path = os.path.join(sf_dir, "documents.parquet")
    cache = os.path.join(
        tempfile.gettempdir(),
        "xmlschema_ray",
        "struct_key_corpus",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    meta_type = pa.struct([pa.field("src", pa.string()), pa.field("grp", pa.int64())])
    if not os.path.isdir(cache) or not any(
        f.endswith(".parquet") for f in os.listdir(cache)
    ):
        shutil.rmtree(cache, ignore_errors=True)

        def pack(t: pa.Table) -> pa.Table:
            meta = pa.StructArray.from_arrays(
                [
                    t["source"].combine_chunks(),
                    pc.cast(
                        pc.bit_wise_and(t["doc_id"], pa.scalar(7, pa.int64())),
                        pa.int64(),
                    ).combine_chunks(),
                ],
                fields=list(meta_type),
            )
            return pa.table({"doc_id": t["doc_id"], "meta": meta})

        tmp = f"{cache}.build{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        rd.read_parquet(doc_path, columns=["doc_id", "source"]).map_batches(
            pack, batch_format="pyarrow", zero_copy_batch=True
        ).repartition(4).write_parquet(tmp)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        try:
            os.rename(tmp, cache)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)

    spec = TableConstraints(
        name="struct_key_docs",
        columns=[
            ColumnSpec("doc_id", pa.int64(), nullable=False),
            ColumnSpec("meta", meta_type, nullable=True),
        ],
        unique_keys=[
            UniqueKey(("meta.src", "meta.grp"), name="unique_meta_src_grp")
        ],
        key_columns=("doc_id",),
    )
    out_dir = _scratch("val_struct_key_dups")
    res = ValidationEngine(spec, batch_size=4096, n_shards=1).run(
        cache, out_dir=out_dir, resume=False
    )
    v = res.violations()
    v = v[v["constraint_name"] == "unique_meta_src_grp"]
    n = v["reason"].map(lambda r: int(re.search(r"count=(\d+)", r).group(1)))
    return (
        pd.DataFrame(
            {
                "key": v["key"].astype(object),
                "n_dups": pd.array(n, dtype="int64"),
            }
        )
        .sort_values("key")
        .reset_index(drop=True)
    )


VAL_STRUCT_KEY_DUPS_SQL = """
SELECT source || '|' || CAST((doc_id & 7) AS VARCHAR) AS key,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents
GROUP BY 1
HAVING COUNT(*) > 1
ORDER BY key
"""


def val_source_mean_chars(sf_dir: str) -> pd.DataFrame:
    """Dataset-level aggregate constraint through the FULL engine: per-source
    MEAN document length must stay ≤ 300 chars (an ``AggregateCheck`` — the
    table-scope assertion analog; a data-quality SLO a crawl pipeline gates
    shards on). The check rides the mergeable stats channel (one (n, nulls,
    sum) triple per source per batch — group-cardinality exchange, never
    rows) and is evaluated driver-side in stage D; each offending source
    emits one group-keyed violation through the canonical sink."""
    from xmlschema_ray.constraints.spec import AggregateCheck, ColumnSpec, TableConstraints

    doc_path = os.path.join(sf_dir, "documents.parquet")
    spec = TableConstraints(
        name="source_mean_chars",
        columns=[
            ColumnSpec("doc_id", pa.int64(), nullable=False),
            ColumnSpec("source", pa.string()),
            ColumnSpec("n_chars", pa.int64()),
        ],
        aggregate_checks=[
            AggregateCheck(
                "mean_chars_by_source",
                agg="mean",
                column="n_chars",
                group_by="source",
                max_value=300.0,
            )
        ],
        key_columns=("doc_id",),
    )
    out_dir = _scratch("val_source_mean_chars")
    eng = ValidationEngine(spec, batch_size=4096, n_shards=1)
    res = eng.run(doc_path, out_dir=out_dir, resume=False)
    v = res.violations()
    v = v[v["constraint_name"] == "mean_chars_by_source"]
    return (
        pd.DataFrame(
            {
                "source": v["key"].astype(object),
                "constraint_name": v["constraint_name"].astype(object),
            }
        )
        .sort_values("source")
        .reset_index(drop=True)
    )


VAL_SOURCE_MEAN_CHARS_SQL = """
SELECT source, 'mean_chars_by_source' AS constraint_name
FROM documents
GROUP BY source
HAVING avg(n_chars) > 300.0
ORDER BY source
"""


def val_warning_severity(sf_dir: str) -> pd.DataFrame:
    """Per-constraint severity through the FULL engine: ``n_chars <= 400``
    is demoted to a WARNING (``spec.warning_constraints`` — the
    per-constraint refinement of the reference's lax mode,
    ``xsdbase.py:24``: lax reports but tolerates). The corpus has many
    long docs, so the run records warnings — but the job verdict stays
    ``valid`` because warnings never flip validity, while the error-severity
    ``n_chars >= 0`` facet (never violated) keeps the error channel live.
    Returns the severity-split roll-up the summary carries."""
    from xmlschema_ray.constraints.facets import MaxInclusive, MinInclusive
    from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints

    doc_path = os.path.join(sf_dir, "documents.parquet")
    spec = TableConstraints(
        name="warning_severity",
        columns=[
            ColumnSpec("doc_id", pa.int64(), nullable=False),
            ColumnSpec(
                "n_chars",
                pa.int64(),
                facets=(MinInclusive(0), MaxInclusive(400)),
            ),
        ],
        key_columns=("doc_id",),
        warning_constraints=("n_chars.maxInclusive(400)",),
    )
    out_dir = _scratch("val_warning_severity")
    eng = ValidationEngine(spec, batch_size=4096, n_shards=1)
    res = eng.run(doc_path, out_dir=out_dir, resume=False)
    return pd.DataFrame(
        {
            "n_rows": pd.array([int(res.summary["n_rows"])], dtype="int64"),
            "n_violations": pd.array([res.n_violations], dtype="int64"),
            "n_warnings": pd.array([res.n_warnings], dtype="int64"),
            "job_validity": pd.Series([res.job_validity], dtype=object),
        }
    )


VAL_WARNING_SEVERITY_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS n_violations,
       CAST(SUM(CASE WHEN n_chars > 400 THEN 1 ELSE 0 END) AS BIGINT) AS n_warnings,
       'valid' AS job_validity
FROM documents
"""


def val_unique_words(sf_dir: str) -> pd.DataFrame:
    """Row-scoped identity constraint through the FULL engine: the
    ``UniqueItems`` facet (xs:ID uniqueness within its document scope;
    JSON Schema ``uniqueItems``) over each document's word list, demoted
    to WARNING severity — natural text repeats words, so the run reports
    the per-doc duplicate incidence without flipping validity. One
    streaming derive (Arrow whitespace split, empty runs filtered to match
    the ``\\s+``/``list_filter`` oracle semantics) feeds the validator."""
    from xmlschema_ray.constraints.facets import UniqueItems
    from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints

    doc_path = os.path.join(sf_dir, "documents.parquet")

    def derive(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.ascii_split_whitespace(text)
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        # drop EMPTY boundary fields so items are exactly the \S+ runs
        flat = words.values
        keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        off = words.offsets.to_numpy()
        counts = np.add.reduceat(
            np.concatenate([keep.astype(np.int64), [0]]), off[:-1]
        ) * (np.diff(off) > 0)
        new_off = np.concatenate(([0], np.cumsum(counts)))
        clean = pa.ListArray.from_arrays(
            pa.array(new_off, type=pa.int32()), flat.filter(pa.array(keep))
        )
        return pa.table(
            {"doc_id": pc.cast(batch["doc_id"], pa.int64()), "words": clean}
        )

    ds = rd.read_parquet(doc_path, columns=["doc_id", "text"]).map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True
    )
    spec = TableConstraints(
        name="unique_words",
        columns=[
            ColumnSpec("doc_id", pa.int64(), nullable=False),
            ColumnSpec("words", pa.list_(pa.string()), facets=(UniqueItems(),)),
        ],
        key_columns=("doc_id",),
        warning_constraints=("words.uniqueItems",),
    )
    out_dir = _scratch("val_unique_words")
    eng = ValidationEngine(spec, batch_size=4096, n_shards=1)
    res = eng.run(ds, out_dir=out_dir, resume=False)
    return pd.DataFrame(
        {
            "n_rows": pd.array([int(res.summary["n_rows"])], dtype="int64"),
            "n_violations": pd.array([res.n_violations], dtype="int64"),
            "n_warnings": pd.array([res.n_warnings], dtype="int64"),
            "job_validity": pd.Series([res.job_validity], dtype=object),
        }
    )


VAL_UNIQUE_WORDS_SQL = r"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS n_violations,
       CAST(SUM(CASE WHEN len(ws) <> len(list_distinct(ws)) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_warnings,
       'valid' AS job_validity
FROM (
  SELECT list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w <> '') AS ws
  FROM documents
)
"""


def val_manifest_reconcile(sf_dir: str) -> pd.DataFrame:
    """Cross-table aggregate RECONCILIATION through the FULL engine: a
    ``ManifestCheck`` compares per-source observed doc counts and n_chars
    sums against an expected-values manifest dim (the delivery/inventory
    validation every ingest runs — "source S shipped N docs totalling M
    chars"). Observed aggregates ride the mergeable stats channel (one
    triple per source per batch); the manifest loads driver-side like a
    broadcast FK dim; the compare is a stage-D fold emitting group-keyed
    violations for count/sum mismatches, manifest groups with no data,
    and data groups absent from the manifest.

    The manifest is derived deterministically from the corpus so both
    engines recompute it: true per-source (count, sum) perturbed by md5
    hex digits — first digit < '4' inflates the expected count by 1,
    second digit < '4' inflates the expected sum by 7, first digit >= 'c'
    drops the source from the manifest entirely (→ unexpected_group) —
    plus a phantom source expecting 5 rows (→ missing_group). Sources in
    the md5 mid-band with neither perturbation reconcile clean, so the
    oracle also proves the ABSENCE of false positives. Reason strings
    compare verbatim (integer-formatted on both sides)."""
    from xmlschema_ray.constraints.spec import ColumnSpec, ManifestCheck, TableConstraints
    from xmlschema_ray.ops.relational import combiner_aggregate, to_pandas_with_schema
    from xmlschema_ray.pipelines.curation import _md5_hex

    doc_path = os.path.join(sf_dir, "documents.parquet")
    t = to_pandas_with_schema(
        combiner_aggregate(
            rd.read_parquet(doc_path, columns=["source", "n_chars"]),
            "source",
            {"n": (None, "count"), "s": ("n_chars", "sum")},
        )
    )
    h = _md5_hex(t["source"])
    c1 = np.array([x[0] for x in h])
    c2 = np.array([x[1] for x in h])
    kept = c1 < "c"
    man = pd.DataFrame(
        {
            "source": np.concatenate([t["source"].to_numpy(object)[kept], ["__phantom__"]]),
            "exp_docs": np.concatenate(
                [
                    t["n"].to_numpy(np.int64)[kept] + (c1[kept] < "4").astype(np.int64),
                    [5],
                ]
            ),
            "exp_chars": np.concatenate(
                [
                    t["s"].to_numpy(np.int64)[kept] + 7 * (c2[kept] < "4").astype(np.int64),
                    [0],
                ]
            ),
        }
    )
    spec = TableConstraints(
        name="manifest_reconcile",
        columns=[
            ColumnSpec("doc_id", pa.int64(), nullable=False),
            ColumnSpec("source", pa.string()),
            ColumnSpec("n_chars", pa.int64()),
        ],
        manifest_checks=[
            ManifestCheck(
                "manifest_docs",
                group_by="source",
                dim_name="manifest",
                dim_key="source",
                expected_count="exp_docs",
                column="n_chars",
                expected_sum="exp_chars",
            )
        ],
        key_columns=("doc_id",),
    )
    out_dir = _scratch("val_manifest_reconcile")
    eng = ValidationEngine(spec, batch_size=4096, n_shards=1)
    res = eng.run(
        doc_path, out_dir=out_dir, dims={"manifest": pa.Table.from_pandas(man)}, resume=False
    )
    v = res.violations()
    v = v[v["constraint_name"].str.startswith("manifest_docs.")]
    return (
        pd.DataFrame(
            {
                "source": v["key"].astype(object),
                "constraint_name": v["constraint_name"].astype(object),
                "reason": v["reason"].astype(object),
            }
        )
        .sort_values(["source", "constraint_name"])
        .reset_index(drop=True)
    )


VAL_MANIFEST_RECONCILE_SQL = """
WITH t AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_chars) AS BIGINT) AS s
  FROM documents GROUP BY source
), m AS (
  SELECT source,
         n + CASE WHEN substring(md5(source), 1, 1) < '4' THEN 1 ELSE 0 END AS exp_n,
         s + CASE WHEN substring(md5(source), 2, 1) < '4' THEN 7 ELSE 0 END AS exp_s
  FROM t WHERE substring(md5(source), 1, 1) < 'c'
  UNION ALL
  SELECT '__phantom__', 5, 0
), v AS (
  SELECT m.source, 'manifest_docs.count_mismatch' AS constraint_name,
         'count ' || CAST(t.n AS VARCHAR) || ' != expected ' || CAST(m.exp_n AS VARCHAR) AS reason
  FROM m JOIN t USING (source) WHERE t.n <> m.exp_n
  UNION ALL
  SELECT m.source, 'manifest_docs.sum_mismatch',
         'sum(n_chars) ' || CAST(t.s AS VARCHAR) || ' != expected ' || CAST(m.exp_s AS VARCHAR)
  FROM m JOIN t USING (source) WHERE t.s <> m.exp_s
  UNION ALL
  SELECT m.source, 'manifest_docs.missing_group',
         'manifest expects ' || CAST(m.exp_n AS VARCHAR) || ' (rows), observed no rows'
  FROM m WHERE m.source NOT IN (SELECT source FROM t)
  UNION ALL
  SELECT t.source, 'manifest_docs.unexpected_group',
         'observed ' || CAST(t.n AS VARCHAR) || ' rows for a group not in manifest'
  FROM t WHERE t.source NOT IN (SELECT source FROM m)
)
SELECT source, constraint_name, reason FROM v ORDER BY source, constraint_name
"""


VAL_COMPOSITE_FK_SQL = """
WITH pairs AS (SELECT DISTINCT source, lang FROM documents),
dim AS (SELECT * FROM pairs WHERE md5(source || '|' || lang) >= '8')
SELECT d.doc_id AS doc_id, 'fk_source_lang' AS constraint_name
FROM documents d
LEFT JOIN dim ON d.source = dim.source AND d.lang = dim.lang
WHERE dim.source IS NULL
ORDER BY doc_id
"""


def val_event_gaps(sf_dir: str, max_gap_us: int = 1_800_000_000) -> pd.DataFrame:
    """Per-key ORDERED-STREAM constraint through the FULL engine
    (``SequenceCheck``, stage B3): within each user's event stream ordered
    by (ts, event_id), the inter-event gap must not exceed 30 minutes —
    the stream-continuity SLO a telemetry/CDC ingest gates on (a hole in
    the feed is exactly what this catches). The check pays ONE co-locating
    hash exchange of a pruned 3-column projection; the violation is the
    LATER row of each offending pair (the first event after the hole),
    carrying the engine's key identity and a replayable integer-µs gap
    reason the oracle recomputes with a lag window. The cross-partition
    constraint class the reference's lazy mode skips outright
    (``validators/elements.py:547-549``)."""
    from xmlschema_ray.constraints.spec import ColumnSpec, SequenceCheck, TableConstraints

    ev_path = os.path.join(sf_dir, "events.parquet")
    spec = TableConstraints(
        name="event_gaps",
        columns=[
            ColumnSpec("event_id", pa.int64(), nullable=False),
            ColumnSpec("user_id", pa.int64()),
            ColumnSpec("ts", pa.timestamp("us")),
        ],
        sequence_checks=[
            SequenceCheck(
                "session_gap",
                group_by=("user_id",),
                order_by=("ts", "event_id"),
                column="ts",
                kind="max_gap",
                max_gap=max_gap_us,
            )
        ],
        key_columns=("event_id",),
    )
    out_dir = _scratch("val_event_gaps")
    eng = ValidationEngine(spec, batch_size=8192, n_shards=1)
    res = eng.run(ev_path, out_dir=out_dir, resume=False)
    v = res.violations()
    v = v[v["constraint_name"] == "session_gap"]
    return (
        pd.DataFrame(
            {
                "event_id": v["key"].astype("int64"),
                "constraint_name": v["constraint_name"].astype(object),
                "reason": v["reason"].astype(object),
            }
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )


VAL_EVENT_GAPS_SQL = """
WITH g AS (
  SELECT event_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS gap
  FROM events
)
SELECT event_id,
       'session_gap' AS constraint_name,
       'gap ' || CAST(gap AS VARCHAR) || ' exceeds max_gap 1800000000' AS reason
FROM g
WHERE gap > 1800000000
ORDER BY event_id
"""


def val_order_totals(sf_dir: str) -> pd.DataFrame:
    """Per-KEY header/detail reconciliation through the FULL engine
    (``ReconcileCheck``, stage B4): every order's ``o_totalprice`` must
    equal the scaled-integer sum of its lineitems' ``l_extendedprice`` —
    the detail-level "books balance" audit ``ManifestCheck`` cannot serve
    (the header here has one expected value per JOIN KEY, fact-scale, so
    neither side broadcasts; the check pays one key-combiner exchange of
    (key, n, sum) partials plus one co-partitioning exchange against the
    header projection). On TPC-H-shaped data the totals genuinely differ
    (totalprice folds tax/discount), so the mismatch set is large and
    every reason string carries both scaled integers — the oracle
    recomputes all of them verbatim, plus the missing-details and
    orphan-details sets."""
    from xmlschema_ray.constraints.spec import ColumnSpec, ReconcileCheck, TableConstraints

    li_path = os.path.join(sf_dir, "lineitem.parquet")
    spec = TableConstraints(
        name="order_totals_reconcile",
        columns=[
            ColumnSpec("l_orderkey", pa.int64(), nullable=False),
            ColumnSpec("l_extendedprice", pa.float64()),
        ],
        reconcile_checks=[
            ReconcileCheck(
                "order_totals",
                key="l_orderkey",
                agg="sum",
                column="l_extendedprice",
                scale=100,
                dim_name="orders",
                dim_key="o_orderkey",
                expected="o_totalprice",
            )
        ],
        key_columns=("l_orderkey",),
    )
    out_dir = _scratch("val_order_totals")
    eng = ValidationEngine(spec, batch_size=8192, n_shards=1)
    res = eng.run(
        li_path,
        out_dir=out_dir,
        dims={"orders": os.path.join(sf_dir, "orders.parquet")},
        resume=False,
    )
    v = res.violations()
    v = v[v["constraint_name"].str.startswith("order_totals.")]
    return (
        pd.DataFrame(
            {
                "okey": v["key"].astype(object),
                "constraint_name": v["constraint_name"].astype(object),
                "reason": v["reason"].astype(object),
            }
        )
        .sort_values(["okey", "constraint_name"])
        .reset_index(drop=True)
    )


VAL_ORDER_TOTALS_SQL = """
WITH d AS (
  SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s
  FROM lineitem GROUP BY 1
), h AS (
  SELECT o_orderkey AS k, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS exp
  FROM orders
)
SELECT * FROM (
  SELECT CAST(h.k AS VARCHAR) AS okey, 'order_totals.mismatch' AS constraint_name,
         'observed sum ' || CAST(d.s AS VARCHAR) || ' != expected ' || CAST(h.exp AS VARCHAR) AS reason
  FROM h JOIN d ON h.k = d.k WHERE d.s <> h.exp
  UNION ALL
  SELECT CAST(h.k AS VARCHAR), 'order_totals.missing_details',
         'header expects ' || CAST(h.exp AS VARCHAR) || ', observed no detail rows'
  FROM h WHERE h.k NOT IN (SELECT k FROM d)
  UNION ALL
  SELECT CAST(d.k AS VARCHAR), 'order_totals.orphan_details',
         CAST(d.n AS VARCHAR) || ' detail rows for key absent from header ''orders'''
  FROM d WHERE d.k NOT IN (SELECT k FROM h)
)
ORDER BY okey, constraint_name
"""


def val_interval_overlap(sf_dir: str) -> pd.DataFrame:
    """Validity-INTERVAL integrity through the FULL engine
    (``SequenceCheck(kind="no_overlap")``, stage B3): within each
    (user, event_type) stream, derived activity intervals
    [ts, ts + duration) must not overlap — the SCD2 "no two versions of
    a key valid at once" audit every slowly-changing dimension load
    gates on, and the interval generalization of the gap check (the
    reference's identity constraints compare VALUES; intervals need the
    running max of earlier ends, which no adjacent-pair compare sees:
    a long early interval can swallow a later short one). Duration is
    derived deterministically from ``value`` (floor(|v|·1e6)·997 mod
    24 h, exact int64 µs) so both engines build identical intervals from
    the raw table; the violation is the LATER interval in start order,
    its reason carrying both epoch-µs integers the oracle's window-max
    replays verbatim. ONE co-locating exchange of the pruned 5-column
    projection; the sweep is a per-group int64 cummax."""
    from xmlschema_ray.constraints.spec import ColumnSpec, SequenceCheck, TableConstraints

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type", "ts", "value"],
    )

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(dtype="float64")
        okv = ~np.isnan(v)
        dur = np.zeros(len(v), np.int64)
        dur[okv] = (
            np.floor(np.abs(v[okv]) * 1e6).astype(np.int64) * 997
        ) % 86_400_000_000
        start = df["ts"].to_numpy(dtype="datetime64[us]")
        end = start + dur.astype("timedelta64[us]")
        end[~okv] = np.datetime64("NaT")
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": df["user_id"].to_numpy(),
                "event_type": df["event_type"].to_numpy(),
                "ts_start": start,
                "ts_end": end,
            }
        )

    scratch = _scratch("val_interval_overlap_input")
    ev.map_batches(derive, batch_format="pandas").write_parquet(scratch)

    spec = TableConstraints(
        name="interval_overlap",
        columns=[
            ColumnSpec("event_id", pa.int64(), nullable=False),
            ColumnSpec("user_id", pa.int64()),
            ColumnSpec("event_type", pa.string()),
            ColumnSpec("ts_start", pa.timestamp("us")),
            ColumnSpec("ts_end", pa.timestamp("us")),
        ],
        sequence_checks=[
            SequenceCheck(
                "scd2_overlap",
                group_by=("user_id", "event_type"),
                order_by=("ts_start", "event_id"),
                column="ts_start",
                kind="no_overlap",
                end_column="ts_end",
            )
        ],
        key_columns=("event_id",),
    )
    out_dir = _scratch("val_interval_overlap")
    eng = ValidationEngine(spec, batch_size=8192, n_shards=1)
    res = eng.run(scratch, out_dir=out_dir, resume=False)
    v = res.violations()
    v = v[v["constraint_name"] == "scd2_overlap"]
    return (
        pd.DataFrame(
            {
                "event_id": v["key"].astype("int64"),
                "constraint_name": v["constraint_name"].astype(object),
                "reason": v["reason"].astype(object),
            }
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )


VAL_INTERVAL_OVERLAP_SQL = """
WITH iv AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS s,
         epoch_us(ts)
           + ((CAST(FLOOR(ABS(value) * 1000000) AS BIGINT) * 997) % 86400000000)
           AS e
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
), w AS (
  SELECT event_id, s,
         max(e) OVER (PARTITION BY user_id, event_type ORDER BY s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc
  FROM iv
)
SELECT event_id,
       'scd2_overlap' AS constraint_name,
       'start ' || CAST(s AS VARCHAR) || ' overlaps earlier interval ending at '
         || CAST(pc AS VARCHAR) AS reason
FROM w WHERE s < pc ORDER BY event_id
"""


def val_shipdate_audit(sf_dir: str) -> pd.DataFrame:
    """Stats-pruned range audit (``engine/audit.py range_audit``): the
    load-watermark check "no lineitem ships past the cutoff" plus a
    line-number sanity range, run WITHOUT reading the clean files —
    lineitem is exported once range-clustered on ``l_shipdate`` (the
    natural time-partitioned warehouse layout), so the parquet footers'
    own min/max statistics prove every pre-cutoff file compliant from
    metadata alone and only the newest file(s) are scanned for exact
    row violations. The integer ``l_linenumber ∈ [1,7]`` rule is proven
    clean in EVERY file (multi-rule proving costs no reads); the float
    columns never enter the audit (float stats are NaN-hazardous and
    untrusted by design). Violations are identical to a full scan by
    construction — the oracle recomputes them with no pruning at all."""
    from xmlschema_ray.engine.audit import RangeRule, range_audit
    from xmlschema_ray.sources.clustered import MANIFEST_NAME, write_clustered

    cache = os.path.join(
        "/tmp/xmlschema_ray_auditlayout", os.path.basename(os.path.normpath(sf_dir))
    )
    if not os.path.exists(os.path.join(cache, MANIFEST_NAME)):
        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_linenumber", "l_shipdate"],
        )

        def to_us(df: pd.DataFrame) -> pd.DataFrame:
            # epoch-µs int64 clustering key (the zone manifest is JSON;
            # ints also make the audit rule integer-exact end to end)
            return pd.DataFrame(
                {
                    "l_orderkey": df["l_orderkey"].to_numpy(),
                    "l_linenumber": df["l_linenumber"].to_numpy(),
                    "ship_us": df["l_shipdate"]
                    .to_numpy(dtype="datetime64[us]")
                    .view("int64"),
                }
            )

        tmp = f"{cache}.build{os.getpid()}"

        # a crashed same-pid build leaves stale parquet the layout

        # writers now refuse — clear it before building

        import shutil as _sh


        _sh.rmtree(tmp, ignore_errors=True)
        write_clustered(li.map_batches(to_us, batch_format="pandas"), "ship_us", tmp)
        try:
            os.rename(tmp, cache)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)

    cutoff_us = int(pd.Timestamp("1998-11-01").value // 1000)
    viol, report = range_audit(
        cache,
        rules=[
            RangeRule("ship_us", hi=cutoff_us),
            RangeRule("l_linenumber", lo=1, hi=7),
        ],
        key_columns=["l_orderkey", "l_linenumber"],
    )
    assert report["n_scanned"] < report["n_files"] or report["n_files"] == 1, report
    return viol


VAL_SHIPDATE_AUDIT_SQL = """
SELECT l_orderkey, l_linenumber,
       'ship_us.range' AS constraint_name,
       epoch_us(l_shipdate) AS value_int
FROM lineitem
WHERE l_shipdate > TIMESTAMP '1998-11-01'
ORDER BY l_orderkey, l_linenumber, constraint_name
"""


def val_temporal_fk(sf_dir: str) -> pd.DataFrame:
    """Stage B5 (``TemporalForeignKey``) under the DuckDB gate: SCD2
    referential integrity — every order's customer must have a dimension
    VERSION valid at the order date. The version dim is derived
    deterministically from the corpus itself (one half-open version per
    customer spanning ``[first order date, last order date)``), so both
    engines recompute it and the violations are exactly each customer's
    LAST-day orders (half-open upper bound) — single-order customers give
    the degenerate empty interval and violate too. The engine runs the
    real copartitioned containment pass; the oracle replays containment
    with a plain window-free JOIN."""
    from xmlschema_ray.constraints.spec import (
        ColumnSpec,
        TableConstraints,
        TemporalForeignKey,
    )
    from xmlschema_ray.ops.relational import combiner_aggregate

    orders_path = os.path.join(sf_dir, "orders.parquet")
    vers = (
        combiner_aggregate(
            rd.read_parquet(orders_path, columns=["o_custkey", "o_orderdate"]),
            "o_custkey",
            {"vf": ("o_orderdate", "min"), "vt": ("o_orderdate", "max")},
        )
        .to_pandas()  # dim-sized: one version row per customer
        .sort_values("o_custkey")
        .reset_index(drop=True)
    )
    dim = pa.table(
        {
            "k": pa.array(vers["o_custkey"].to_numpy(np.int64), pa.int64()),
            "valid_from": pa.Array.from_pandas(vers["vf"]).cast(pa.timestamp("us")),
            "valid_to": pa.Array.from_pandas(vers["vt"]).cast(pa.timestamp("us")),
        }
    )
    spec = TableConstraints(
        name="temporal_fk_orders",
        columns=[
            ColumnSpec("o_orderkey", pa.int64(), nullable=False),
            ColumnSpec("o_custkey", pa.int64(), nullable=True),
            ColumnSpec("o_orderdate", pa.timestamp("us"), nullable=True),
        ],
        temporal_foreign_keys=[
            TemporalForeignKey(
                "o_custkey", "o_orderdate", "custvers", "k", name="tfk_cust_at_orderdate"
            )
        ],
        key_columns=("o_orderkey",),
    )
    out_dir = _scratch("val_temporal_fk")
    eng = ValidationEngine(spec, batch_size=8192, n_shards=1)
    res = eng.run(orders_path, out_dir=out_dir, dims={"custvers": dim}, resume=False)
    v = res.violations()
    return (
        pd.DataFrame({"o_orderkey": pd.array(v["key"].astype("int64"), dtype="int64")})
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )


VAL_TEMPORAL_FK_SQL = """
WITH dim AS (
  SELECT o_custkey AS k, MIN(o_orderdate) AS vf, MAX(o_orderdate) AS vt
  FROM orders GROUP BY 1
)
SELECT o.o_orderkey
FROM orders o JOIN dim d ON o.o_custkey = d.k
WHERE NOT (d.vf <= o.o_orderdate AND o.o_orderdate < d.vt)
ORDER BY o_orderkey
"""


ORACLES: Dict[str, str] = {
    "validate_sequences": VALIDATE_SEQUENCES_SQL,
    "val_temporal_fk": VAL_TEMPORAL_FK_SQL,
    "val_composite_fk": VAL_COMPOSITE_FK_SQL,
    "val_fk_distributed": VAL_FK_DISTRIBUTED_SQL,
    "val_struct_key_dups": VAL_STRUCT_KEY_DUPS_SQL,
    "val_manifest_reconcile": VAL_MANIFEST_RECONCILE_SQL,
    "val_order_totals": VAL_ORDER_TOTALS_SQL,
    "val_source_mean_chars": VAL_SOURCE_MEAN_CHARS_SQL,
    "val_event_gaps": VAL_EVENT_GAPS_SQL,
    "val_interval_overlap": VAL_INTERVAL_OVERLAP_SQL,
    "val_shipdate_audit": VAL_SHIPDATE_AUDIT_SQL,
    "val_warning_severity": VAL_WARNING_SEVERITY_SQL,
    "val_unique_words": VAL_UNIQUE_WORDS_SQL,
    "validate_sequences_seeded": SEEDED_SQL,
    "drift_check": DRIFT_SQL,
    "drift_by_source": DRIFT_BY_SOURCE_SQL,
    "drift_by_source_windowed": DRIFT_BY_SOURCE_WINDOWED_SQL,
}
QUERIES = {
    "validate_sequences": validate_sequences,
    "val_temporal_fk": val_temporal_fk,
    "val_composite_fk": val_composite_fk,
    "val_fk_distributed": val_fk_distributed,
    "val_struct_key_dups": val_struct_key_dups,
    "val_manifest_reconcile": val_manifest_reconcile,
    "val_order_totals": val_order_totals,
    "val_source_mean_chars": val_source_mean_chars,
    "val_event_gaps": val_event_gaps,
    "val_interval_overlap": val_interval_overlap,
    "val_shipdate_audit": val_shipdate_audit,
    "val_warning_severity": val_warning_severity,
    "val_unique_words": val_unique_words,
    "validate_sequences_seeded": validate_sequences_seeded,
    "drift_check": drift_check,
    "drift_by_source": drift_by_source,
    "drift_by_source_windowed": drift_by_source_windowed,
}
