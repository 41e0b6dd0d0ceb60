"""Range-clustered parquet layout: sorted export + zone-map manifest +
file-pruning reader.

The storage-layout complement of the resumable sink (``sinks.py``): a
table written CLUSTERED on a key gives every downstream range query
file-level pruning — at a 100-TB table the difference between touching
3 files and 30,000. The zone maps are not invented metadata: parquet
footers already carry per-column min/max statistics, so the manifest is
assembled from footer reads (no data pass) and pruning is sound by the
parquet spec's own contract. The exact residual filter after pruning
makes correctness independent of the layout — a reader bug class the
pruning test pins (pruned read ≡ full read + filter, bit-for-bit).

Reference analog: none (single-shot generator chains); this is the
§2.1 sources/sinks scale surface, same family as the readers' column +
predicate pushdown.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import List, Optional, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

MANIFEST_NAME = "_zone_manifest.json"


def write_clustered(ds: "rd.Dataset", key: str, out_dir: str) -> dict:
    """Write ``ds`` range-clustered on ``key``: one global sort (Ray's
    sample-based range partition + local sort — the honest clustering
    cost, paid ONCE so every later range read prunes), one
    ``write_parquet``, then a footer-only scan assembling the zone-map
    manifest ``[{path, min, max, rows}]``. Returns the manifest dict.

    The manifest is written LAST (atomic rename), so its presence implies
    the layout is complete — the same manifest-after-data discipline as
    the resumable sink.
    """
    os.makedirs(out_dir, exist_ok=True)
    ds.sort(key).write_parquet(out_dir)
    files = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
    zones = []
    for f in files:
        md = pq.read_metadata(f)
        if md.num_rows == 0:
            continue
        idx = md.schema.to_arrow_schema().get_field_index(key)
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:  # pragma: no cover — parquet
                raise ValueError(f"no min/max stats for {key!r} in {f}")
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        zones.append({"path": os.path.basename(f), "min": lo, "max": hi, "rows": md.num_rows})
    manifest = {"key": key, "files": zones}
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(out_dir, MANIFEST_NAME))
    return manifest


def prune_files(
    out_dir: str, lo=None, hi=None
) -> Tuple[List[str], int]:
    """Zone-map pruning: the manifest files whose [min, max] overlaps
    [lo, hi] (either bound may be None = unbounded). Returns (paths,
    n_total_files) so callers/tests can assert pruning actually happened."""
    with open(os.path.join(out_dir, MANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    keep = []
    for z in manifest["files"]:
        if lo is not None and z["max"] < lo:
            continue
        if hi is not None and z["min"] > hi:
            continue
        keep.append(os.path.join(out_dir, z["path"]))
    return keep, len(manifest["files"])


def read_clustered(
    out_dir: str,
    lo=None,
    hi=None,
    columns: Optional[List[str]] = None,
) -> "rd.Dataset":
    """Range read over a clustered layout: manifest pruning picks the
    overlapping FILES, then the exact residual filter runs inside the
    read (parquet predicate pushdown prunes row groups the same way) —
    correct for any layout, fast for a clustered one. An empty file set
    returns a typed empty Dataset from the layout's own schema."""
    with open(os.path.join(out_dir, MANIFEST_NAME)) as fh:
        key = json.load(fh)["key"]
    paths, _ = prune_files(out_dir, lo, hi)
    if not paths:
        any_file = sorted(
            f for f in os.listdir(out_dir) if f.endswith(".parquet")
        )
        schema = pq.read_schema(os.path.join(out_dir, any_file[0]))
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return rd.from_arrow(schema.empty_table())
    flt = None
    if lo is not None:
        flt = pc.field(key) >= pc.scalar(lo)
    if hi is not None:
        f2 = pc.field(key) <= pc.scalar(hi)
        flt = f2 if flt is None else (flt & f2)
    kwargs = {}
    if columns:
        kwargs["columns"] = columns
    if flt is not None:
        kwargs["filter"] = flt
    return rd.read_parquet(paths, **kwargs)
