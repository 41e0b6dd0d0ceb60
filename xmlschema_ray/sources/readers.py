"""Validated multi-format ingestion.

The reference's ``XMLResource`` accepts any source shape
(``/root/reference/xmlschema/resources.py:229-286``); the tabular analog
is format-dispatched Ray Data readers plus an optional dtype-coercion step
(the lexical-to-typed decode of ``XsdAtomicBuiltin.iter_decode``,
``validators/simple_types.py:501-540``): CSV/JSON sources arrive with
inferred types and are cast to the spec's declared Arrow schema, with
failed casts surfacing as nulls for the not-null/facet checks.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from xmlschema_ray.constraints.spec import TableConstraints


def _lexical_to_null(arr: "pa.ChunkedArray | pa.Array", dtype: pa.DataType) -> pa.Array:
    """Element-wise decode with failures -> null (the reference's
    decode-with-errors, ``simple_types.py:501-540``). Vectorized pandas
    fast paths per target family; only runs for batches where the strict
    Arrow cast failed, so clean data never pays this cost."""
    if pa.types.is_integer(dtype):
        src = arr.type
        if pa.types.is_string(src) or pa.types.is_large_string(src):
            # exact path — NO float64 round-trip: a single bad cell must not
            # corrupt valid keys above 2^53, and the XSD integer lexical
            # space excludes '1.0'/'1e3' (reference simple_types.py:501-540
            # errors on them; here they decode to null and surface in the
            # not_null check)
            a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
            trimmed = pc.utf8_trim_whitespace(pc.cast(a, pa.string()))
            ok = pc.fill_null(pc.match_substring_regex(trimmed, r"^[+-]?[0-9]+$"), False)
            # Arrow's string->int parser rejects a leading '+' (XSD-legal);
            # strip it so '+5' stays on the vectorized path
            trimmed = pc.replace_substring_regex(trimmed, r"^\+", "")
            masked = pc.if_else(ok, trimmed, pa.nulls(len(a), pa.string()))
            try:
                return pc.cast(masked, dtype)
            except pa.ArrowInvalid:
                # out-of-range survivors of the regex: per-element exact parse
                info = np.iinfo(np.dtype(dtype.to_pandas_dtype()))
                out = []
                for v in masked.to_pylist():
                    if v is None:
                        out.append(None)
                        continue
                    iv = int(v)
                    out.append(iv if info.min <= iv <= info.max else None)
                return pa.array(out, type=dtype)
        # numeric (already-lossy float) source: integral in-range values keep
        num = pd.to_numeric(arr.to_pandas(), errors="coerce")
        info = np.iinfo(np.dtype(dtype.to_pandas_dtype()))
        num = num.where((num >= info.min) & (num <= info.max) & (np.floor(num) == num))
        return pa.Array.from_pandas(num, type=dtype, safe=False)
    s = arr.to_pandas()
    if pa.types.is_floating(dtype):
        return pa.Array.from_pandas(pd.to_numeric(s, errors="coerce"), type=dtype)
    if pa.types.is_timestamp(dtype) or pa.types.is_date(dtype):
        return pa.Array.from_pandas(
            pd.to_datetime(s, errors="coerce", format="mixed"), type=dtype, safe=False
        )
    if pa.types.is_boolean(dtype):
        m = s.astype(str).str.strip().str.lower().map(
            {"true": True, "1": True, "false": False, "0": False}
        )
        return pa.Array.from_pandas(m, type=dtype)
    out = []  # generic scalar fallback (rare dtypes only)
    for v in s:
        try:
            out.append(pa.scalar(v).cast(dtype).as_py())
        except (pa.ArrowInvalid, pa.ArrowTypeError, ValueError, TypeError):
            out.append(None)
    return pa.array(out, type=dtype)

_READERS = {
    "parquet": rd.read_parquet,
    "csv": rd.read_csv,
    "json": rd.read_json,
}


def read_table(
    paths: Union[str, Sequence[str]],
    format: str = "parquet",
    columns: Optional[List[str]] = None,
    spec: Optional[TableConstraints] = None,
) -> rd.Dataset:
    """Read any supported format; optionally coerce to the spec's schema.

    Column pruning is pushed into the parquet reader; CSV/JSON prune after
    decode (their readers have no projection pushdown).
    """
    if format not in _READERS:
        raise ValueError(f"unsupported format {format!r}; choose from {sorted(_READERS)}")
    if format == "parquet":
        ds = rd.read_parquet(paths, columns=columns)
    else:
        ds = _READERS[format](paths)
        if columns:
            ds = ds.select_columns(columns)
    if spec is not None:
        target = {c.name: c.dtype for c in spec.columns}

        def coerce(batch: pa.Table) -> pa.Table:
            for name, dtype in target.items():
                if name in batch.column_names and batch.schema.field(name).type != dtype:
                    i = batch.schema.get_field_index(name)
                    try:
                        cast = pc.cast(batch[name], dtype)
                    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                        # lexical failures become nulls — decode-with-errors:
                        # the not_null / facet checks report them downstream
                        cast = _lexical_to_null(batch[name], dtype)
                    batch = batch.set_column(i, pa.field(name, dtype), cast)
            return batch

        ds = ds.map_batches(coerce, batch_format="pyarrow", zero_copy_batch=True)
    return ds


def union_with_evolution(
    datasets: "list[rd.Dataset]", schema: pa.Schema
) -> "rd.Dataset":
    """Union datasets written under different SCHEMA GENERATIONS into one
    canonical-schema stream — the data-lake read every long-lived table
    needs once columns have been added, dropped, or widened across file
    generations (the tabular analog of the reference's version-tolerant
    schema composition, ``/root/reference/xmlschema/validators/
    schemas.py`` xs:override lineage; see also ``serde.override_spec``).

    Per generation, one row-local Arrow pass (zero exchanges): missing
    columns materialize as TYPED nulls, present columns ``cast`` to the
    canonical type (widenings like int32→int64 are exact; a lossy cast
    raises rather than silently truncating — Arrow's cast safety is the
    guard), extra columns are dropped, and order is canonicalized so the
    downstream union sees ONE schema. Unknown generations therefore fail
    loudly at the first batch, never at a distant consumer.
    """
    if not datasets:
        raise ValueError("union_with_evolution: need at least one dataset")

    names = [f.name for f in schema]

    def normalize(batch: pa.Table) -> pa.Table:
        cols = []
        for f in schema:
            if f.name in batch.column_names:
                cols.append(batch[f.name].cast(f.type))
            else:
                cols.append(pa.chunked_array([pa.nulls(batch.num_rows, f.type)]))
        return pa.table(dict(zip(names, cols)))

    out = [
        ds.map_batches(normalize, batch_format="pyarrow", zero_copy_batch=True)
        for ds in datasets
    ]
    u = out[0]
    for d in out[1:]:
        u = u.union(d)
    return u
