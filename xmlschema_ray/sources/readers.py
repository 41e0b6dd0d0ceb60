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

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from xmlschema_ray.constraints.spec import TableConstraints

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
                    except pa.ArrowInvalid:
                        # lexical failures become nulls — decode-with-errors:
                        # the not_null / facet checks report them downstream
                        cast = pc.cast(batch[name], dtype, safe=False)
                    batch = batch.set_column(i, pa.field(name, dtype), cast)
            return batch

        ds = ds.map_batches(coerce, batch_format="pyarrow", zero_copy_batch=True)
    return ds
