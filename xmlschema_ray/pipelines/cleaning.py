"""Validate-and-filter: materialize the PASSING rows.

The training-data-cleaning direction of the engine: instead of emitting
violations, keep the rows that satisfy every row-local check (facets, row
assertions, broadcast referential) — the decode-the-valid-part analog of
the reference's lax-mode ``(data, errors)`` tuple
(``/root/reference/xmlschema/validators/xsdbase.py:595-623``).

Row-local only by design: cross-partition constraints (uniqueness) cannot
be decided inside a streaming batch (the reference skips keyrefs in lazy
mode for the same reason, ``elements.py:547-549``); use the engine's
violation output to subtract duplicated keys afterwards when needed.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from xmlschema_ray.constraints import facets as F
from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints
from xmlschema_ray.engine.row_validator import RowValidator, iter_row_checks
from xmlschema_ray.pipelines.common import table_path


def clean_dataset(
    ds: rd.Dataset,
    spec: TableConstraints,
    fk_sets_ref=None,
) -> rd.Dataset:
    """Rows passing every row-local check, streaming, zero-copy Arrow."""
    spec = spec.compile()
    state: dict = {}

    def keep_clean(batch: pa.Table) -> pa.Table:
        rv = state.get("rv")
        if rv is None:
            rv = state["rv"] = RowValidator(
                spec, emit_stats=False, emit_keycounts=False, fk_sets_ref=fk_sets_ref
            )
        bad = np.zeros(batch.num_rows, dtype=bool)
        for _, _, mask, _, _ in iter_row_checks(batch, spec):
            bad |= mask
        for _, _, mask, _, _ in rv._iter_fk_checks(batch):
            bad |= mask
        return batch.filter(pa.array(~bad))

    return ds.map_batches(keep_clean, batch_format="pyarrow", zero_copy_batch=True)


def clean_lineitem(sf_dir: str) -> rd.Dataset:
    """Oracle-checked cleaning run: lineitem rows passing tightened range
    facets (the complement of ``val_lineitem_ranges``)."""
    spec = TableConstraints(
        name="lineitem_clean",
        columns=[
            ColumnSpec("l_orderkey", pa.int64()),
            ColumnSpec("l_linenumber", pa.int32()),
            ColumnSpec("l_quantity", pa.float64(), facets=(F.MaxInclusive(45.0),)),
            ColumnSpec("l_discount", pa.float64(), facets=(F.MaxInclusive(0.08),)),
            ColumnSpec("l_tax", pa.float64(), facets=(F.MaxInclusive(0.05),)),
        ],
        key_columns=("l_orderkey", "l_linenumber"),
    )
    ds = rd.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"],
    )
    return clean_dataset(ds, spec).select_columns(["l_orderkey", "l_linenumber"])


CLEAN_LINEITEM_SQL = """
SELECT l_orderkey, l_linenumber FROM lineitem
WHERE l_quantity <= 45.0 AND l_discount <= 0.08 AND l_tax <= 0.05
"""

ORACLES = {"clean_lineitem": CLEAN_LINEITEM_SQL}
QUERIES = {"clean_lineitem": clean_lineitem}


def normalize_documents(sf_dir: str) -> rd.Dataset:
    """Oracle-checked encoder-direction rewrite (``engine/encode.py``, the
    ``iter_encode``/``from_json`` analog, reference
    ``documents.py:109-196``): documents canonicalized under a spec whose
    ``text`` column carries ``whiteSpace(collapse)`` — tab/CR/LF → space,
    runs squeezed, ends stripped — plus a ``changed`` marker. The same
    ``normalize_table`` kernel backs the resumable ``normalize_rewrite``
    sink; this query exposes it to the DuckDB gate."""
    from xmlschema_ray.engine.encode import normalize_table

    spec = TableConstraints(
        name="documents_norm",
        columns=[
            ColumnSpec("doc_id", pa.int64()),
            ColumnSpec("text", pa.string(), facets=(F.WhiteSpace("collapse"),)),
        ],
        key_columns=("doc_id",),
    ).compile()
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        out = normalize_table(batch, spec)
        changed = pc.invert(pc.equal(out["text"], batch["text"]))
        # IS DISTINCT FROM semantics (match the oracle): normalization
        # never creates or removes nulls, so a null equal-compare can only
        # mean null-vs-null = unchanged -> False
        return out.rename_columns(["doc_id", "text_norm"]).append_column(
            "changed", pc.fill_null(changed, False)
        )

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)


NORMALIZE_DOCUMENTS_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(text, '[\t\r\n]', ' ', 'g'), ' +', ' ', 'g'), ' ') AS text_norm,
       (text IS DISTINCT FROM trim(regexp_replace(regexp_replace(text, '[\t\r\n]', ' ', 'g'), ' +', ' ', 'g'), ' ')) AS changed
FROM documents
ORDER BY doc_id
"""

ORACLES["normalize_documents"] = NORMALIZE_DOCUMENTS_SQL
QUERIES["normalize_documents"] = normalize_documents
