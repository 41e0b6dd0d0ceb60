"""Normalize-and-rewrite sink — the encoder direction.

The reference validates in BOTH directions: decode (XML → data) and
encode (data → canonical XML via ``iter_encode``/``from_json``,
``documents.py:109-196``). The tabular encode analog is a repair/
canonicalization pipeline: rewrite a corpus with the SPEC's canonical
forms applied — whiteSpace-facet normalization on string columns,
declared defaults filled into nulls, canonical dtypes cast — so the
output validates clean against the same spec and is byte-stable for
downstream dedup/fingerprinting. Runs as batch transforms over the
stream and lands in the resumable partitioned sink (one directory per
input shard, manifest after atomic rename), so a failed 100-TB rewrite
restarts where it stopped.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import pyarrow as pa
import pyarrow.compute as pc

from xmlschema_ray.constraints import facets as F
from xmlschema_ray.constraints.spec import TableConstraints


def normalize_whitespace_array(col, policy: str):
    """XSD whiteSpace normalization as an Arrow kernel (reference
    ``validators/simple_types.py:310-328``): ``replace`` maps
    tab/CR/LF to spaces; ``collapse`` additionally squeezes runs and
    strips ends. Nulls pass through."""
    out = pc.replace_substring_regex(col, "[\t\r\n]", " ")
    if policy == "collapse":
        out = pc.replace_substring_regex(out, " +", " ")
        out = pc.utf8_trim(out, " ")
    return out


def normalize_table(
    batch: pa.Table, spec: TableConstraints, defaults: Optional[Dict[str, Any]] = None
) -> pa.Table:
    """One batch through the spec's canonical forms (vectorized):

    1. whiteSpace facets normalize their string columns (the only facet
       with a canonical-form side, like the reference's normalize step
       before facet checks);
    2. ``defaults`` fill nulls (attribute default/fixed substitution,
       ``attributes.py:232-254``);
    3. every spec column casts to its canonical dtype (safe cast — a
       lexically-decoded corpus has already been through the readers'
       decode-with-errors path).

    Column order: spec order first, then pass-through extras.
    """
    defaults = defaults or {}
    names = set(batch.column_names)
    for c in spec.columns:
        if c.name not in names:
            continue
        i = batch.schema.get_field_index(c.name)
        col = batch[c.name]
        for f in c.facets:
            if isinstance(f, F.WhiteSpace):
                col = normalize_whitespace_array(col, f.policy)
        if c.name in defaults:
            col = pc.fill_null(col, pa.scalar(defaults[c.name], type=col.type))
        if col.type != c.dtype:
            col = pc.cast(col, c.dtype)
        batch = batch.set_column(i, pa.field(c.name, col.type, nullable=c.nullable), col)
    spec_order = [c.name for c in spec.columns if c.name in names]
    extras = [n for n in batch.column_names if n not in set(spec_order)]
    return batch.select(spec_order + extras)


def normalize_rewrite(
    source,
    spec: TableConstraints,
    out_dir: str,
    defaults: Optional[Dict[str, Any]] = None,
    n_shards: int = 8,
    resume: bool = True,
) -> Dict[str, int]:
    """Rewrite ``source`` (parquet dir/files) canonicalized under ``spec``
    into the resumable partitioned sink at ``out_dir``. Returns the sink's
    ``{"n_shards", "n_skipped", "n_rows"}`` manifest stats."""
    import glob as _glob

    import ray.data as rd

    from xmlschema_ray.sources.sinks import chunk_files, resumable_write

    if isinstance(source, str):
        files = (
            sorted(_glob.glob(os.path.join(source, "*.parquet")))
            if os.path.isdir(source)
            else [source]
        )
    else:
        files = sorted(source)
    if not files:
        raise FileNotFoundError(f"no parquet inputs under {source!r}")

    def make_shard(shard_files) -> "rd.Dataset":
        return rd.read_parquet(list(shard_files)).map_batches(
            lambda b: normalize_table(b, spec, defaults),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    return resumable_write(make_shard, chunk_files(files, n_shards), out_dir, resume=resume)
