"""Spec inference: bootstrap a ``TableConstraints`` from a Parquet corpus.

The schema-generation counterpart of the reference's schema *fetching*
surface (``resources.py:120-192`` fetch_schema / schema sniffing,
SURVEY §2.1): given data with no spec, propose the tightest spec the
observed data satisfies — dtypes and nullability from the file schema
and null counts, numeric/temporal min-max windows, small-cardinality
string columns as enumerations, list columns with item ranges and
length bounds. The inferred spec is self-consistent by construction:
validating the corpus it was inferred from yields zero violations
(asserted in tests), and it compiles through the same lint as a
hand-written spec.

Scale shape: ONE streaming pass — per-batch partial frames (min, max,
null count, capped distinct sample per column; all vectorized Arrow
kernels) fold driver-side into O(columns) state. Distinct sampling is
capped at ``enum_threshold + 1`` values per column per batch, so the
driver never sees more than that per column regardless of corpus size.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from xmlschema_ray.constraints import facets as F
from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints


def _fold(state: dict, part: dict, enum_cap: int) -> None:
    for col, rec in part.items():
        s = state.setdefault(
            col, {"min": None, "max": None, "nulls": 0, "distinct": set(), "overflow": False}
        )
        for lo, hi in (("min", "max"), ("len_min", "len_max")):
            if rec.get(lo) is not None:
                s[lo] = rec[lo] if s.get(lo) is None else min(s[lo], rec[lo])
                s[hi] = rec[hi] if s.get(hi) is None else max(s[hi], rec[hi])
        s["nulls"] += rec["nulls"]
        s["nan"] = s.get("nan", 0) + rec.get("nan", 0)
        if rec.get("overflow"):
            s["overflow"] = True
        if not s["overflow"]:
            s["distinct"].update(rec.get("distinct", ()))
            if len(s["distinct"]) > enum_cap:
                s["overflow"] = True
                s["distinct"] = set()


def infer_spec(
    source: Union[str, List[str], "rd.Dataset"],
    name: str = "inferred",
    enum_threshold: int = 16,
    key_column: Optional[str] = None,
) -> TableConstraints:
    """Infer the tightest spec the observed corpus satisfies.

    * numeric / temporal columns → ``MinInclusive``/``MaxInclusive``
      windows at the observed extremes;
    * string columns with ≤ ``enum_threshold`` distinct values →
      ``Enumeration`` (provenance labels, status codes); above it, no
      value facet (patterns are NOT guessed — a wrong inferred pattern
      would reject valid future data);
    * ``list`` columns → ``ItemFacets`` with the observed item window
      plus observed ``MinLength``/``MaxLength``;
    * ``nullable`` iff a null was observed; every column ``required``.

    ``key_column`` (or a column literally named ``doc_id``) becomes
    ``key_columns`` for violation identity. The result ``.compile()``s
    through the normal lint. Observed-extreme windows are intentionally
    tight: they describe THIS corpus; widen with
    :func:`~xmlschema_ray.constraints.serde.override_spec` before
    validating future data, or audit the gap with ``spec_compat``.
    """
    ds = source if isinstance(source, rd.Dataset) else rd.read_parquet(source)
    schema = ds.schema().base_schema
    enum_cap = enum_threshold

    def nan_aware_min_max(arr) -> tuple:
        """(min, max, nan_count) — Arrow ``min_max`` does NOT skip NaN
        (a single NaN poisons both bounds into NaN), so float inputs are
        filtered to non-NaN first and the NaN count is carried so the
        final assembly can skip range facets for NaN-bearing columns
        (a range facet would flag every NaN row and break the
        infer→validate zero-violation invariant)."""
        n_nan = 0
        if pa.types.is_floating(arr.type):
            nan_mask = pc.is_nan(arr)
            n_nan = pc.sum(nan_mask).as_py() or 0
            if n_nan:
                arr = arr.filter(pc.invert(nan_mask))
        mm = pc.min_max(arr)
        return mm["min"].as_py(), mm["max"].as_py(), n_nan

    def partial(batch: pa.Table) -> pa.Table:
        out: dict = {}
        for col_name in batch.column_names:
            col = batch[col_name]
            t = col.type
            rec = {"min": None, "max": None, "nulls": col.null_count, "distinct": set()}
            if pa.types.is_list(t) or pa.types.is_large_list(t):
                flat = col.combine_chunks().flatten() if isinstance(col, pa.ChunkedArray) else col.flatten()
                lens = pc.list_value_length(col)
                rec["min"], rec["max"], rec["nan"] = nan_aware_min_max(flat)
                mm = pc.min_max(lens)
                rec["len_min"] = mm["min"].as_py()
                rec["len_max"] = mm["max"].as_py()
            elif pa.types.is_string(t) or pa.types.is_large_string(t):
                uniq = pc.unique(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
                uniq = uniq.drop_null()
                if len(uniq) > enum_cap:
                    rec["overflow"] = True
                else:
                    rec["distinct"] = set(uniq.to_pylist())
            elif pa.types.is_binary(t) or pa.types.is_large_binary(t) or pa.types.is_struct(t):
                pass  # shape-only columns: dtype + nullability
            else:
                arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                rec["min"], rec["max"], rec["nan"] = nan_aware_min_max(arr)
            out[col_name] = rec
        import pickle

        return pa.table({"blob": pa.array([pickle.dumps(out)], type=pa.binary())})

    import pickle

    state: Dict[str, dict] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for blob in b["blob"].to_pylist():
            _fold(state, pickle.loads(blob), enum_cap)

    columns: List[ColumnSpec] = []
    for field in schema:
        s = state.get(field.name, {"min": None, "max": None, "nulls": 0, "distinct": set(), "overflow": True})
        facets: list = []
        t = field.type
        # NaN-bearing float columns get NO range facet: NaN fails every
        # ordered comparison, so MinInclusive(observed_min) would flag the
        # NaN rows and break the infer→validate zero-violation invariant
        has_nan = s.get("nan", 0) > 0
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            if s["min"] is not None and not has_nan:
                facets.append(
                    F.ItemFacets((F.MinInclusive(s["min"]), F.MaxInclusive(s["max"])))
                )
            if s.get("len_min") is not None:
                facets.append(F.MinLength(int(s["len_min"])))
                facets.append(F.MaxLength(int(s["len_max"])))
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            if not s["overflow"] and s["distinct"]:
                facets.append(F.Enumeration(tuple(sorted(s["distinct"]))))
        elif s["min"] is not None and not has_nan:
            facets.append(F.MinInclusive(s["min"]))
            facets.append(F.MaxInclusive(s["max"]))
        columns.append(
            ColumnSpec(
                field.name,
                t,
                nullable=s["nulls"] > 0,
                facets=tuple(facets),
            )
        )

    key = key_column or ("doc_id" if any(c.name == "doc_id" for c in columns) else None)
    return TableConstraints(
        name=name,
        columns=columns,
        key_columns=(key,) if key else (columns[0].name,),
        allow_extra_columns=False,
    ).compile()
