"""Per-record transform operators: default filling, lexical casts.

The decode-kwarg surface of the reference re-expressed as batch
transforms:

* ``fill_defaults`` — per-column default substitution, the
  attribute-default analog (``/root/reference/xmlschema/validators/
  attributes.py:232-254`` default/fixed substitution; ``fill_missing`` /
  ``filler`` decode kwargs, ``attributes.py:583-630``).
* ``parse_timestamps`` — lexical date/time decoding via Arrow
  ``strptime`` (the tabular analog of the reference's table-driven
  datetime decoders, ``validators/builtins.py:216-248``).
* ``parse_booleans`` — XSD boolean lexical mapping
  ``{'true','1','false','0'}`` (``builtins.py:160-170``).
* ``melt_dataset`` — the wide→long UNPIVOT reshape (the inverse of the
  pivot family in ``pipelines/relational.py``).
"""

from __future__ import annotations

from typing import Any, Dict, List

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def fill_defaults(ds: rd.Dataset, defaults: Dict[str, Any]) -> rd.Dataset:
    """Replace nulls with per-column default values (vectorized)."""

    def fn(batch: pa.Table) -> pa.Table:
        for col, default in defaults.items():
            if col in batch.column_names:
                i = batch.schema.get_field_index(col)
                filled = pc.fill_null(batch[col], pa.scalar(default, type=batch[col].type))
                batch = batch.set_column(i, batch.schema.field(i), filled)
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def parse_timestamps(
    ds: rd.Dataset, column: str, fmt: str = "%Y-%m-%d %H:%M:%S", unit: str = "us"
) -> rd.Dataset:
    """Lexical string column → timestamp column (invalid lexical forms
    become nulls for the not_null/facet checks to catch — validation is
    decode-with-errors)."""

    def fn(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index(column)
        parsed = pc.strptime(batch[column], format=fmt, unit=unit, error_is_null=True)
        return batch.set_column(i, pa.field(column, pa.timestamp(unit)), parsed)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def parse_booleans(ds: rd.Dataset, column: str) -> rd.Dataset:
    """XSD boolean lexical space → bool (true/1 → True, false/0 → False,
    anything else → null)."""

    def fn(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index(column)
        col = batch[column]
        is_true = pc.is_in(col, value_set=pa.array(["true", "1"]))
        is_false = pc.is_in(col, value_set=pa.array(["false", "0"]))
        out = pc.if_else(is_true, True, pc.if_else(is_false, False, pa.scalar(None, pa.bool_())))
        return batch.set_column(i, pa.field(column, pa.bool_()), out)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def melt_dataset(
    ds: rd.Dataset,
    id_cols: List[str],
    value_cols: List[str],
    var_name: str = "measure",
    value_name: str = "value",
) -> rd.Dataset:
    """Wide→long UNPIVOT: each input row emits ``len(value_cols)`` output
    rows ``(*id_cols, var_name=<col name>, value_name=<col value>)``.

    Purely row-local (ZERO exchanges — the reshape every tidy-data step
    needs never justifies a shuffle): one Arrow pass per batch builds the
    long table as ``len(value_cols)`` zero-copy column selections plus a
    dictionary-cheap constant label column, concatenated. Output blocks
    are ``n × len(value_cols)`` rows — size ``batch_size`` upstream
    accordingly when the wide side is already near the block cap. All
    ``value_cols`` must share one Arrow type (cast first if not): the
    long column's type is exact, never a silent promotion.
    """
    if not value_cols:
        raise ValueError("melt_dataset: value_cols must be non-empty")
    out_names = list(id_cols) + [var_name, value_name]
    if len(set(out_names)) != len(out_names):
        # a var/value name colliding with an id column would silently drop
        # the id column's data through the dict constructor
        raise ValueError(
            f"melt_dataset: output column names collide: {sorted(out_names)}"
        )

    def fn(batch: pa.Table) -> pa.Table:
        types = {str(batch.schema.field(c).type) for c in value_cols}
        if len(types) > 1:
            raise TypeError(
                f"melt_dataset: value_cols mix Arrow types {sorted(types)}; "
                "cast to one type before melting"
            )
        names = list(id_cols) + [var_name, value_name]
        parts = []
        for c in value_cols:
            # constant label materialized as a plain string column (a
            # dictionary array would surface as pandas Categorical at the
            # consumer and break dtype-strict compares); short column-name
            # strings make this a minor cost per batch
            label = (
                pa.nulls(batch.num_rows, pa.string()).fill_null(c)
                if batch.num_rows
                else pa.array([], type=pa.string())
            )
            cols = [batch[i] for i in id_cols] + [pa.chunked_array([label]), batch[c]]
            parts.append(pa.table(dict(zip(names, cols))))
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
