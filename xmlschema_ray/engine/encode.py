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


def _resolve_parquet_files(source) -> list:
    """Dir glob / single file / explicit sequence → sorted file list (the
    one resolution rule for both encode entry points)."""
    import glob as _glob

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
    return files


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


def quarantine_split(
    source,
    spec: TableConstraints,
    violation_keys,
    quarantine_out: Optional[str] = None,
    clean_out: Optional[str] = None,
    n_shards: int = 8,
    resume: bool = True,
    broadcast_cap_bytes: int = 1 << 30,
) -> Dict[str, Dict[str, int]]:
    """Dead-letter SPLIT sink: route rows whose spec key is in
    ``violation_keys`` to ``quarantine_out`` and/or the remaining rows to
    ``clean_out`` — the reject-routing mode the reference's lax/skip
    validation implies (invalid content set aside, valid content flows
    on), materialized as real row routing over the resumable partitioned
    sink.

    The key set broadcasts once (``ray.put``) and each batch filters with
    one vectorized membership kernel on the SAME key derivation the
    validator used (``unique_key_column``), so the split is consistent
    with violation identity at any parallelism. The broadcast is
    size-gated: a key set past ``broadcast_cap_bytes`` means most of the
    corpus is invalid, where quarantine is the wrong tool (fix the spec
    or use the validated-rewrite sink) — raising beats silently building
    a corpus-sized driver object. Each requested side is its own
    resumable pass (single-sink limitation, the stage-A note).
    """
    import numpy as np
    import ray
    import ray.data as rd

    from xmlschema_ray.engine.row_validator import _key_strings
    from xmlschema_ray.sources.sinks import chunk_files, resumable_write

    if quarantine_out is None and clean_out is None:
        raise ValueError("quarantine_split: pass quarantine_out and/or clean_out")
    files = _resolve_parquet_files(source)

    keys = np.asarray(list(violation_keys), dtype=object)
    # extrapolate the sampled bytes by the EXACT ratio — floor division
    # underestimates up to 2x, which is exactly how a corpus-sized key set
    # would sneak past the broadcast gate
    n_sampled = min(len(keys), 100_000)
    sample_bytes = int(sum(len(str(k)) for k in keys[:n_sampled]))
    approx = int(sample_bytes * (len(keys) / n_sampled)) if n_sampled else 0
    if approx > broadcast_cap_bytes:
        raise ValueError(
            f"violation key set ~{approx >> 20} MiB exceeds the broadcast gate "
            f"({broadcast_cap_bytes >> 20} MiB): most of the corpus is invalid — "
            "quarantining is the wrong tool at that ratio (fix the spec, or use "
            "normalize_rewrite to repair in place)"
        )
    key_ref = ray.put(pa.array(keys.astype(str), pa.string()))
    key_cols = spec.key_columns

    dotted = spec.dotted_key_paths()

    def make_side(keep_violating: bool):
        def split(batch: pa.Table) -> pa.Table:
            # IDENTICAL key rendering to the validator's violation identity
            # (_key_strings: Python str(), nulls -> "") — an Arrow cast
            # renders bool/timestamp/null key parts differently and the
            # membership test would silently route violating rows to clean
            orig_cols = batch.column_names
            if dotted:
                from xmlschema_ray.engine.row_validator import augment_struct_keys

                batch = augment_struct_keys(batch, dotted)
            missing = [c for c in key_cols if c not in batch.column_names]
            if missing:
                raise ValueError(
                    f"quarantine_split: key column(s) {missing} absent from an "
                    "input file — key identity cannot match the validator's "
                    "(which prunes per shard); split the drifted files out first"
                )
            ks = _key_strings(batch, spec, np.arange(batch.num_rows, dtype=np.int64))
            kc = pa.array(ks, pa.string())
            m = pc.is_in(kc, value_set=ray.get(key_ref))
            # the split must write the ORIGINAL schema — flattened key
            # helper columns never reach the output
            return batch.filter(m if keep_violating else pc.invert(m)).select(orig_cols)

        def make_shard(shard_files) -> "rd.Dataset":
            return rd.read_parquet(list(shard_files)).map_batches(
                split, batch_format="pyarrow", zero_copy_batch=True
            )

        return make_shard

    out: Dict[str, Dict[str, int]] = {}
    shards = chunk_files(files, n_shards)
    if quarantine_out is not None:
        out["quarantine"] = resumable_write(make_side(True), shards, quarantine_out, resume=resume)
    if clean_out is not None:
        out["clean"] = resumable_write(make_side(False), shards, clean_out, resume=resume)
    return out


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
    import ray.data as rd

    from xmlschema_ray.sources.sinks import chunk_files, resumable_write

    files = _resolve_parquet_files(source)

    def make_shard(shard_files) -> "rd.Dataset":
        return rd.read_parquet(list(shard_files)).map_batches(
            lambda b: normalize_table(b, spec, defaults),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    return resumable_write(make_shard, chunk_files(files, n_shards), out_dir, resume=resume)
