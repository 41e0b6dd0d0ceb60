"""Z-order (Morton) clustered parquet layout: multi-dimensional sorted
export + two-column zone-map manifest + box-pruning reader.

The MULTI-DIMENSIONAL member of the storage-layout family
(``clustered.py`` = 1-D range, ``bucketed.py`` = hash co-partitioning,
``bloomindex.py`` = ad-hoc point membership): a table clustered on the
interleaved bits of TWO columns gives every file a tight bounding
rectangle in (x, y), so a 2-D box predicate prunes at the file level on
EITHER column or both — where a plain sort serves only its leading
column (Delta/Iceberg's OPTIMIZE ZORDER shape). Like the range layout,
the zone maps come from the parquet footers' own min/max statistics (no
data pass; sound by the parquet spec's contract) and the exact residual
filter after pruning makes correctness independent of the layout — the
Z-order only decides how MUCH prunes, never WHAT the query returns
(pinned by the pruned ≡ full+filter test).

Coordinates are range-normalized to the 16-bit Morton domain with exact
integer arithmetic (``(x - min) * 65535 // span``) from a metadata-sized
min/max pre-pass, so the interleave covers the data at any key scale.

Reference analog: none (single-shot generator chains); §2.1
sources/sinks scale surface.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

ZMANIFEST_NAME = "_zorder_manifest.json"
_ZCOL = "__zval"


def write_zordered(ds: "rd.Dataset", x: str, y: str, out_dir: str) -> dict:
    """Write ``ds`` Z-order-clustered on integer columns ``(x, y)``: one
    metadata-sized min/max pre-pass (two ints per dim per batch), one
    global sort on the interleaved 32-bit Morton key (Ray's sample-based
    range partition — the honest clustering cost, paid ONCE), one
    ``write_parquet``, then a footer-only scan assembling the per-file
    bounding rectangles ``[{path, min_x, max_x, min_y, max_y, rows}]``.
    Returns the manifest dict; the manifest is written LAST (atomic
    rename) so its presence implies the layout is complete."""
    from xmlschema_ray.ops.relational import combiner_aggregate, to_pandas_with_schema
    from xmlschema_ray.pipelines.relational import morton_zvalue
    from xmlschema_ray.sources.clustered import refuse_stale_parquet

    refuse_stale_parquet(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "__k": np.zeros(len(batch), dtype=np.int64),
                "mnx": batch[x].to_numpy(np.int64),
                "mxx": batch[x].to_numpy(np.int64),
                "mny": batch[y].to_numpy(np.int64),
                "mxy": batch[y].to_numpy(np.int64),
            }
        )

    bounds = to_pandas_with_schema(
        combiner_aggregate(
            ds.map_batches(tag, batch_format="pandas"),
            "__k",
            {
                "mnx": ("mnx", "min"),
                "mxx": ("mxx", "max"),
                "mny": ("mny", "min"),
                "mxy": ("mxy", "max"),
            },
        )
    )
    if len(bounds) == 0:
        raise ValueError("write_zordered: empty input has no layout to build")
    mnx, mxx = int(bounds["mnx"][0]), int(bounds["mxx"][0])
    mny, mxy = int(bounds["mny"][0]), int(bounds["mxy"][0])
    spanx = max(1, mxx - mnx)
    spany = max(1, mxy - mny)

    # (v - mn) * 65535 wraps int64 past this span and the sort interleaves
    # rows essentially randomly (rects then cover the whole domain and
    # pruning silently degrades to a full scan) — wide spans take a
    # float64 mapping instead: still deterministic, and the manifests are
    # built from the WRITTEN data so pruning stays exact either way
    max_exact_span = (2**63 - 1) // 65535

    def _norm16(v: np.ndarray, mn: int, span: int) -> np.ndarray:
        d = v - mn
        if span <= max_exact_span:
            return d * 65535 // span
        return np.minimum(
            (d.astype(np.float64) * (65535.0 / span)).astype(np.int64), 65535
        )

    def add_z(batch: pd.DataFrame) -> pd.DataFrame:
        xv = batch[x].to_numpy(np.int64)
        yv = batch[y].to_numpy(np.int64)
        nx = _norm16(xv, mnx, spanx)
        ny = _norm16(yv, mny, spany)
        out = batch.copy()
        out[_ZCOL] = morton_zvalue(nx, ny)
        return out

    def drop_z(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop(columns=[_ZCOL])

    (
        ds.map_batches(add_z, batch_format="pandas")
        .sort(_ZCOL)
        .map_batches(drop_z, batch_format="pandas")
        .write_parquet(out_dir)
    )
    files = sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".parquet")
    )
    zones = []
    for f in files:
        md = pq.read_metadata(f)
        if md.num_rows == 0:
            continue
        schema = md.schema.to_arrow_schema()
        rect = {}
        for dim, col in (("x", x), ("y", y)):
            idx = schema.get_field_index(col)
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:  # pragma: no cover — parquet
                    raise ValueError(f"no min/max stats for {col!r} in {f}")
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            from xmlschema_ray.sources.clustered import stat_to_json

            rect[f"min_{dim}"] = stat_to_json(lo)
            rect[f"max_{dim}"] = stat_to_json(hi)
        zones.append({"path": os.path.basename(f), "rows": md.num_rows, **rect})
    manifest = {"x": x, "y": y, "files": zones}
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(out_dir, ZMANIFEST_NAME))
    return manifest


def prune_files_box(
    out_dir: str,
    x_lo=None,
    x_hi=None,
    y_lo=None,
    y_hi=None,
) -> Tuple[List[str], int]:
    """Rectangle pruning: the manifest files whose bounding rect
    intersects the query box (any bound may be None = unbounded).
    Returns (paths, n_total_files) so tests can assert pruning happened."""
    with open(os.path.join(out_dir, ZMANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    keep = []
    for z in manifest["files"]:
        if x_lo is not None and z["max_x"] < x_lo:
            continue
        if x_hi is not None and z["min_x"] > x_hi:
            continue
        if y_lo is not None and z["max_y"] < y_lo:
            continue
        if y_hi is not None and z["min_y"] > y_hi:
            continue
        keep.append(os.path.join(out_dir, z["path"]))
    return keep, len(manifest["files"])


def read_zordered(
    out_dir: str,
    x_lo=None,
    x_hi=None,
    y_lo=None,
    y_hi=None,
    columns: Optional[List[str]] = None,
) -> "rd.Dataset":
    """Box read over a Z-ordered layout: manifest pruning picks the
    rectangle-overlapping FILES, then the exact residual filter runs
    inside the read (parquet row-group pushdown prunes the same way) —
    correct for any layout, fast for a Z-ordered one. An empty file set
    returns a typed empty Dataset from the layout's own schema."""
    with open(os.path.join(out_dir, ZMANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    xcol, ycol = manifest["x"], manifest["y"]
    paths, _ = prune_files_box(out_dir, x_lo, x_hi, y_lo, y_hi)
    if not paths:
        any_file = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
        schema = pq.read_schema(os.path.join(out_dir, any_file[0]))
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return rd.from_arrow(schema.empty_table())
    flt = None
    for col, lo, hi in ((xcol, x_lo, x_hi), (ycol, y_lo, y_hi)):
        if lo is not None:
            f1 = pc.field(col) >= pc.scalar(lo)
            flt = f1 if flt is None else (flt & f1)
        if hi is not None:
            f2 = pc.field(col) <= pc.scalar(hi)
            flt = f2 if flt is None else (flt & f2)
    kwargs = {}
    if columns:
        kwargs["columns"] = columns
    if flt is not None:
        kwargs["filter"] = flt
    return rd.read_parquet(paths, **kwargs)
