"""Bloom file-skipping index: per-file membership filters over a column
the layout is NOT organized by.

The third member of the storage-layout family and the one that covers
the remaining axis: ``clustered.py`` prunes RANGE reads on the sort key
(zone maps), ``bucketed.py`` makes KEY joins/lookups exchange-free (hash
co-partitioning) — but both serve only the ONE column the layout was
organized by. A Bloom index gives point/membership lookups file-level
pruning on ANY high-cardinality column without reorganizing a byte of
data: one pass per file builds a fixed-size bit array of the column's
hashed values, and a probe opens only the files whose filter claims the
value. No false negatives by construction (a present value's bits are
all set), so pruning is SOUND; false positives only cost extra file
reads and die in the exact residual filter — the same
correctness-independent-of-layout discipline as the other two readers
(pruned read ≡ full read + filter, pinned in tests).

Scale notes: the index is file-dim metadata (size ≈ n_files ×
``m_bits``/8); size ``m_bits`` ≈ 10× the file's distinct keys for ~1%
FPR. Blooms live in a parquet sidecar (binary column — at a 100k-file
corpus the sidecar itself is scannable/prunable), with a small JSON
manifest carrying the (hash fn, m_bits, k) probe contract, published
LAST (atomic) like every layout manifest here. Probing a million-value
IN-list is vectorized (k positions per value against each file's bit
array); build is one column-projected read per file, embarrassingly
parallel, no exchange anywhere.

Reference analog: none (single-shot generator chains); §2.1
sources/sinks scale surface, §2.9 membership family.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

BLOOM_MANIFEST = "_bloom_manifest.json"
BLOOM_SIDECAR = "_bloom_filters.parquet"
# v2: hash64 integer hashing changed in round 4 (ints now hash via their
# float64 spelling for dtype stability). v3: float32/float16 inputs now
# ALSO widen to float64 before hashing (parquet FLOAT vs DOUBLE schema
# drift would otherwise split one value's probes). A stale-tag sidecar
# probed with the current hash yields FALSE NEGATIVES — files containing
# probe values silently pruned — so prune_bloom refuses old tags and
# forces a rebuild (same convention as bucketed.py's tag bumps).
HASH_TAG = "hash64_kirsch_mitzenmacher_v3"


def _norm_values(values) -> np.ndarray:
    """Canonical probe/build dtype: integers widen to int64 (an int32
    probe must hash identically to the int64 build), strings to object."""
    v = np.asarray(values)
    if v.dtype.kind in ("i", "u"):
        return v.astype(np.int64)
    if v.dtype.kind in ("U", "S"):
        return v.astype(object)
    if v.dtype.kind == "f" and v.dtype.itemsize < 8:
        # a float32-built filter must accept float64 probes of the same
        # values (and vice versa) — one canonical float spelling
        return v.astype(np.float64)
    return v


def _positions(values: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k bit positions per value by double hashing h1 + i·h2
    (Kirsch–Mitzenmacher: two independent 64-bit hashes simulate k),
    h2 forced odd so strides cycle the table. Shape (n, k)."""
    from xmlschema_ray.engine.stats import hash64

    v = _norm_values(values)
    h1 = hash64(v)
    h2 = hash64(h1) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def build_bloom_index(
    data_dir: str,
    column: str,
    index_dir: str,
    m_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> dict:
    """Build the per-file Bloom index for ``column`` over every parquet
    file under ``data_dir``: one column-projected read per file (no other
    columns leave storage), bits set over the file's UNIQUE values, one
    (path, rows, bloom) row per file into the sidecar. Zero exchanges —
    the plan is a pure file-parallel map; the driver sees only file-dim
    metadata. Manifest written last."""
    os.makedirs(index_dir, exist_ok=True)
    files = sorted(f for f in os.listdir(data_dir) if f.endswith(".parquet"))

    # bit positions range over [0, m_bits) but the array holds m_bits // 8
    # BYTES — a non-multiple-of-8 m_bits (e.g. the docstring's own ~10x
    # distinct-keys sizing) would truncate the last partial byte and raise
    # a data-dependent IndexError at build or probe; round UP instead
    m_bits = (int(m_bits) + 7) & ~7
    def index_files(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for rel in batch["path"].tolist():
            t = pq.read_table(os.path.join(data_dir, rel), columns=[column])
            vals = t[column].combine_chunks().unique().drop_null().to_numpy(
                zero_copy_only=False
            )
            bits = np.zeros(m_bits // 8, dtype=np.uint8)
            if len(vals):
                pos = _positions(vals, m_bits, num_hashes).ravel()
                np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
            rows.append((rel, t.num_rows, bits.tobytes()))
        return pd.DataFrame(rows, columns=["path", "rows", "bloom"])

    side = (
        rd.from_pandas(pd.DataFrame({"path": np.array(files, dtype=object)}))
        .repartition(max(1, len(files)))
        .map_batches(index_files, batch_format="pandas")
        .to_pandas()  # file-dim metadata: one row per file
    )
    if not len(side.columns):
        side = pd.DataFrame(
            {
                "path": pd.Series([], dtype=object),
                "rows": pd.Series([], dtype=np.int64),
                "bloom": pd.Series([], dtype=object),
            }
        )
    side = side.sort_values("path").reset_index(drop=True)
    tbl = pa.table(
        {
            "path": pa.array(side["path"], type=pa.string()),
            "rows": pa.array(side["rows"], type=pa.int64()),
            "bloom": pa.array(side["bloom"], type=pa.binary()),
        }
    )
    fd, tmp = tempfile.mkstemp(dir=index_dir, suffix=".tmp")
    os.close(fd)
    pq.write_table(tbl, tmp)
    os.replace(tmp, os.path.join(index_dir, BLOOM_SIDECAR))
    manifest = {
        "column": column,
        "m_bits": int(m_bits),
        "k": int(num_hashes),
        "hash": HASH_TAG,
        "n_files": len(files),
    }
    fd, tmp = tempfile.mkstemp(dir=index_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(index_dir, BLOOM_MANIFEST))
    return manifest


def prune_bloom(index_dir: str, values) -> Tuple[List[str], int]:
    """Files whose Bloom filter claims ANY of ``values`` (relative paths,
    n_total) — no false negatives, so the kept set is a superset of the
    files truly containing a probe value."""
    with open(os.path.join(index_dir, BLOOM_MANIFEST)) as fh:
        m = json.load(fh)
    if m["hash"] != HASH_TAG:
        raise ValueError(
            f"prune_bloom: unknown hash {m['hash']!r} (this build implements "
            f"{HASH_TAG!r}) — rebuild the index"
        )
    side = pq.read_table(os.path.join(index_dir, BLOOM_SIDECAR)).to_pandas()
    vals = _norm_values(values)
    if not len(vals):
        return [], len(side)
    pos = _positions(vals, m["m_bits"], m["k"])
    byte, bit = pos >> 3, (pos & 7).astype(np.uint8)
    keep = []
    for rel, blob in zip(side["path"], side["bloom"]):
        bits = np.frombuffer(blob, dtype=np.uint8)
        if (((bits[byte] >> bit) & 1).all(axis=1)).any():
            keep.append(rel)
    return keep, len(side)


def read_with_bloom(
    data_dir: str,
    index_dir: str,
    values,
    columns: Optional[List[str]] = None,
) -> "rd.Dataset":
    """Membership read: Bloom pruning picks candidate FILES, the exact
    ``isin`` residual filter runs inside the read — correct for any
    filter load (false positives die here), fast when the probe set's
    files are few. Empty file set returns a typed empty Dataset."""
    import pyarrow.compute as pc

    with open(os.path.join(index_dir, BLOOM_MANIFEST)) as fh:
        column = json.load(fh)["column"]
    keep, _ = prune_bloom(index_dir, values)
    if not keep:
        any_file = sorted(f for f in os.listdir(data_dir) if f.endswith(".parquet"))
        schema = pq.read_schema(os.path.join(data_dir, any_file[0]))
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return rd.from_arrow(schema.empty_table())
    flt = pc.field(column).isin(_norm_values(values))
    kwargs = {"filter": flt}
    if columns:
        kwargs["columns"] = columns
    return rd.read_parquet([os.path.join(data_dir, p) for p in keep], **kwargs)
