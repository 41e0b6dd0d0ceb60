"""Pluggable output formatters for violations / verdicts.

The converters analog (reference ``converters.py:44-370`` base converter +
the variant layouts at ``506-958``): the ENGINE always materializes ONE
canonical representation (sorted violation parquet + verdict parquet —
byte-identical regardless of registered formatters), and formatters are
registered post-hoc renderings of that canonical output into alternative
layouts, resolved by name from a registry exactly like the facet
``BUILDERS`` map. A formatter that also registers a ``reader`` is
round-trippable: ``reader(path)`` must reproduce the canonical frame.

Built-ins:

* ``jsonl-by-key`` — nested JSON-lines grouped by row identity (one line
  per (partition_id, key) with its violation list), the BadgerFish-style
  nested layout; streamed batch-wise off the sorted parquet so no full
  materialization at any output size.
* ``csv`` — flat RFC-4180 CSV of the canonical columns.
* ``parquet-by-constraint`` — hive-partitioned per-constraint feed.
* ``jsonl-flat`` — one flat JSON object per row (Parker-style unnesting,
  ``converters.py:506-620``).
* ``json-table`` — header line + positional row arrays (JsonML-style,
  ``converters.py:886-958``).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional

import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads

from xmlschema_ray.engine.row_validator import VIOLATION_SCHEMA

_COLS = [f.name for f in VIOLATION_SCHEMA]
_SORT = ["partition_id", "key", "constraint_name", "column"]


class Formatter:
    __slots__ = ("name", "writer", "reader")

    def __init__(self, name: str, writer: Callable, reader: Optional[Callable]):
        self.name = name
        self.writer = writer
        self.reader = reader


FORMATTERS: Dict[str, Formatter] = {}


def register_formatter(name: str, writer: Callable, reader: Optional[Callable] = None) -> None:
    """Register (or replace — latest wins) an output formatter.

    ``writer(violations_dir, out_path)`` renders the canonical sorted
    violation parquet directory to ``out_path``; ``reader(out_path) ->
    DataFrame`` (optional) parses it back to the canonical frame for
    round-trip verification."""
    FORMATTERS[name] = Formatter(name, writer, reader)


def get_formatter(name: str) -> Formatter:
    f = FORMATTERS.get(name)
    if f is None:
        raise KeyError(
            f"unknown output format {name!r}; registered: {sorted(FORMATTERS)}"
        )
    return f


def _iter_canonical_batches(violations_dir: str):
    """Record batches off the canonically-sorted violation parquet, in
    sorted-filename/row order, column-pruned to the schema.

    The distributed sink writes one file per sorted output block with
    sequential indices, so the EXPLICIT filename sort here (never
    directory-listing order) preserves the canonical global order across
    the multi-file path too; the jsonl writer additionally asserts
    monotonicity and fails loudly rather than silently splitting an
    identity if that invariant is ever broken."""
    if not os.path.exists(violations_dir):
        return
    files = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(violations_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    if not files:
        return
    for batch in pads.dataset(files).to_batches(columns=_COLS):
        if batch.num_rows:
            yield batch


def _write_jsonl_by_key(violations_dir: str, out_path: str) -> None:
    """One JSON line per (partition_id, key) row identity with its nested
    violation list. The canonical sort makes identities CONTIGUOUS, so a
    streaming batch loop with one carry group needs O(one key's
    violations) memory at any output size."""
    carry_id = None
    carry: List[dict] = []

    def flush(f):
        if carry_id is not None:
            f.write(
                json.dumps(
                    {
                        "partition_id": carry_id[0],
                        "key": carry_id[1],
                        "violations": carry,
                    },
                    sort_keys=True,
                )
                + "\n"
            )

    with open(out_path, "w") as f:
        for batch in _iter_canonical_batches(violations_dir):
            df = batch.to_pandas()
            for (pid, key), g in df.groupby(["partition_id", "key"], sort=False):
                ident = (int(pid), str(key))
                items = g[["constraint_name", "column", "reason", "value_repr"]].to_dict(
                    "records"
                )
                if ident == carry_id:
                    carry.extend(items)
                else:
                    if carry_id is not None and ident < carry_id:
                        raise ValueError(
                            "violations parquet is not in canonical order "
                            f"({ident} after {carry_id}); the one-line-per-"
                            "identity contract would be violated — re-sort "
                            "the canonical output before exporting"
                        )
                    flush(f)
                    carry_id, carry = ident, items
        flush(f)


def _read_jsonl_by_key(path: str) -> pd.DataFrame:
    rows = []
    with open(path) as f:
        for line in f:
            doc = json.loads(line)
            for v in doc["violations"]:
                rows.append(
                    {"partition_id": doc["partition_id"], "key": doc["key"], **v}
                )
    if not rows:
        return pd.DataFrame(columns=_COLS)
    df = pd.DataFrame(rows)[_COLS]
    df["partition_id"] = df["partition_id"].astype("int32")
    return df.sort_values(_SORT, kind="mergesort").reset_index(drop=True)


def _write_csv(violations_dir: str, out_path: str) -> None:
    import csv

    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(_COLS)
        for batch in _iter_canonical_batches(violations_dir):
            w.writerows(batch.to_pandas().itertuples(index=False, name=None))


def _read_csv(path: str) -> pd.DataFrame:
    # every string column forced str: a numeric-LOOKING constraint/column/
    # reason (a column literally named "2020") must round-trip as the
    # string the canonical frame carries, not re-parse as int64
    str_cols = {c: str for c in _COLS if c != "partition_id"}
    df = pd.read_csv(path, dtype=str_cols, keep_default_na=False)
    if not len(df):
        return pd.DataFrame(columns=_COLS)
    df["partition_id"] = df["partition_id"].astype("int32")
    return df[_COLS].sort_values(_SORT, kind="mergesort").reset_index(drop=True)


def _write_parquet_by_constraint(violations_dir: str, out_path: str) -> None:
    """Hive-style partitioned parquet: ``constraint_name=<quoted>/part-N``
    — the per-constraint violation feed operational consumers subscribe to
    (one directory per constraint; a consumer of one constraint reads ONE
    directory, not the whole output). Streamed batch-wise off the
    canonical parquet with one lazily-opened writer per constraint
    (spec-bounded, never output-sized); constraint names are URL-quoted in
    the path (they carry parens/quotes/spaces) and the column itself is
    DROPPED from the files, hive semantics — the reader reconstructs it
    from the directory name, byte-exactly."""
    from urllib.parse import quote

    import pyarrow.parquet as pq

    # the reader is LISTDIR-built, so a pre-existing export would be
    # silently absorbed (stale constraint dirs from an earlier run would
    # read as current) — REFUSE instead, the layout-writer convention
    # (see sources/clustered.refuse_stale_parquet); jsonl/csv truncate
    # their single file on rewrite, this is the only directory formatter
    if os.path.isdir(out_path):
        stale = [
            e
            for e in os.listdir(out_path)
            if e.startswith("constraint_name=") or e.endswith(".parquet")
        ]
        if stale:
            raise ValueError(
                f"parquet-by-constraint out_path {out_path!r} already holds "
                f"{len(stale)} export entr{'y' if len(stale) == 1 else 'ies'} — "
                "write into a FRESH directory (the listdir-built reader would "
                "absorb stale constraint directories as current violations)"
            )
    os.makedirs(out_path, exist_ok=True)
    data_cols = [c for c in _COLS if c != "constraint_name"]
    schema = pa.schema([f for f in VIOLATION_SCHEMA if f.name != "constraint_name"])
    writers: Dict[str, "pq.ParquetWriter"] = {}
    try:
        for batch in _iter_canonical_batches(violations_dir):
            t = pa.Table.from_batches([batch])
            names = t["constraint_name"].to_pylist()
            import numpy as np

            arr = np.asarray(names, dtype=object)
            for name in pd.unique(arr):
                w = writers.get(name)
                if w is None:
                    d = os.path.join(out_path, f"constraint_name={quote(str(name), safe='')}")
                    os.makedirs(d, exist_ok=True)
                    w = writers[name] = pq.ParquetWriter(
                        os.path.join(d, "part-0.parquet"), schema
                    )
                sub = t.filter(pa.array(arr == name)).select(data_cols)
                w.write_table(sub.cast(schema))
    finally:
        for w in writers.values():
            w.close()


def _read_parquet_by_constraint(path: str) -> pd.DataFrame:
    from urllib.parse import unquote

    frames = []
    for entry in sorted(os.listdir(path)):
        full = os.path.join(path, entry)
        if not (os.path.isdir(full) and entry.startswith("constraint_name=")):
            continue
        name = unquote(entry[len("constraint_name=") :])
        files = sorted(
            os.path.join(full, f) for f in os.listdir(full) if f.endswith(".parquet")
        )
        if not files:
            continue
        df = pads.dataset(files).to_table().to_pandas()
        df["constraint_name"] = name
        frames.append(df)
    if not frames:
        return pd.DataFrame(columns=_COLS)
    out = pd.concat(frames, ignore_index=True)[_COLS]
    out["partition_id"] = out["partition_id"].astype("int32")
    return out.sort_values(_SORT, kind="mergesort").reset_index(drop=True)


def _write_jsonl_flat(violations_dir: str, out_path: str) -> None:
    """One flat JSON object per canonical violation row (the Parker-style
    unnested convention, reference ``converters.py:506-620`` — keys are the
    column names, no grouping) — the layout log shippers / jq pipelines
    consume directly. Streamed batch-wise; canonical row order preserved
    line-for-line."""
    with open(out_path, "w") as f:
        for batch in _iter_canonical_batches(violations_dir):
            for row in batch.to_pylist():
                f.write(json.dumps(row, sort_keys=True) + "\n")


def _read_jsonl_flat(path: str) -> pd.DataFrame:
    rows = [json.loads(line) for line in open(path)]
    if not rows:
        return pd.DataFrame(columns=_COLS)
    df = pd.DataFrame(rows)[_COLS]
    df["partition_id"] = df["partition_id"].astype("int32")
    return df.sort_values(_SORT, kind="mergesort").reset_index(drop=True)


def _write_json_table(violations_dir: str, out_path: str) -> None:
    """Compact array-of-arrays table (the JsonML-style positional
    convention, reference ``converters.py:886-958``): line 1 is the JSON
    header array, every further line one row as a JSON value array — the
    column names ship ONCE, not once per row (the layout's point at
    violation volumes). Streamed batch-wise in canonical order."""
    with open(out_path, "w") as f:
        f.write(json.dumps(_COLS) + "\n")
        for batch in _iter_canonical_batches(violations_dir):
            for tup in zip(*(batch[c].to_pylist() for c in _COLS)):
                f.write(json.dumps(list(tup)) + "\n")


def _read_json_table(path: str) -> pd.DataFrame:
    with open(path) as f:
        header_line = f.readline()
        if not header_line:
            return pd.DataFrame(columns=_COLS)
        header = json.loads(header_line)
        if header != _COLS:
            raise ValueError(
                f"json-table header {header!r} does not match the canonical "
                f"violation columns {_COLS!r}"
            )
        rows = [json.loads(line) for line in f]
    if not rows:
        return pd.DataFrame(columns=_COLS)
    df = pd.DataFrame(rows, columns=_COLS)
    df["partition_id"] = df["partition_id"].astype("int32")
    return df.sort_values(_SORT, kind="mergesort").reset_index(drop=True)


register_formatter("jsonl-by-key", _write_jsonl_by_key, _read_jsonl_by_key)
register_formatter("csv", _write_csv, _read_csv)
register_formatter(
    "parquet-by-constraint", _write_parquet_by_constraint, _read_parquet_by_constraint
)
register_formatter("jsonl-flat", _write_jsonl_flat, _read_jsonl_flat)
register_formatter("json-table", _write_json_table, _read_json_table)
