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

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

MANIFEST_NAME = "_zone_manifest.json"


def stat_to_json(v):
    """Footer statistic / user bound → JSON-safe, ORDER-PRESERVING value:
    ints, FINITE floats and strings pass through, datetime-likes become
    epoch-µs int64 (comparable with each other and with converted user
    bounds). NaN/inf refuse (not order-preserving / not portable JSON), as
    does anything else — loudly, BEFORE json.dump would crash after the
    sort and write were already paid."""
    import datetime
    import math

    import numpy as np
    import pandas as pd

    if isinstance(v, bool) or v is None:
        raise TypeError(f"zone-map statistic type {type(v).__name__} unsupported")
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, (float, np.floating)):
        # float keys are valid cluster/Z-order keys and float bounds may
        # probe int zone maps: floats are JSON-serializable and compare
        # order-preservingly against int stats
        f = float(v)
        if not math.isfinite(f):
            raise TypeError("zone-map statistic is non-finite float (NaN/inf)")
        return f
    if isinstance(v, str):
        return v
    if isinstance(v, (np.datetime64, pd.Timestamp, datetime.datetime, datetime.date)):
        return int(pd.Timestamp(v).value // 1000)
    raise TypeError(f"zone-map statistic type {type(v).__name__} unsupported")


def refuse_stale_parquet(out_dir: str) -> None:
    """A layout write into a dir already holding parquet would absorb the
    stale files into the manifest (listdir-based assembly) and a reader
    would silently see duplicated rows — refuse instead; builders use
    fresh build dirs and rename."""
    if os.path.isdir(out_dir):
        stale = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
        if stale:
            raise ValueError(
                f"layout out_dir {out_dir!r} already holds {len(stale)} parquet "
                "file(s) — a retry must build into a FRESH dir (stale files "
                "would be absorbed into the manifest as duplicated rows)"
            )


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
    refuse_stale_parquet(out_dir)
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
        zones.append(
            {
                "path": os.path.basename(f),
                "min": stat_to_json(lo),
                "max": stat_to_json(hi),
                "rows": md.num_rows,
            }
        )
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
    # user bounds normalize through the SAME mapping the manifest stats
    # took (datetime → epoch µs), so comparisons never mix types
    lo = stat_to_json(lo) if lo is not None else None
    hi = stat_to_json(hi) if hi is not None else None
    keep = []
    for z in manifest["files"]:
        if lo is not None and z["max"] < lo:
            continue
        if hi is not None and z["min"] > hi:
            continue
        keep.append(os.path.join(out_dir, z["path"]))
    return keep, len(manifest["files"])


def _load_zones(out_dir: str):
    with open(os.path.join(out_dir, MANIFEST_NAME)) as fh:
        m = json.load(fh)
    return m["key"], m["files"]


def clustered_merge_join(
    dir_a: str,
    dir_b: str,
    fn,
    columns_a: Optional[List[str]] = None,
    columns_b: Optional[List[str]] = None,
) -> "rd.Dataset":
    """ZERO-EXCHANGE sort-merge join of two range-clustered layouts on
    their (integer) cluster keys — the range-layout counterpart of the
    bucketed layout's exchange-free equi-join: both tables paid ONE
    global sort at write time, so the join reduces to zone alignment.

    The key space is partitioned into DISJOINT half-open ranges at the
    union of both manifests' file boundaries (adjacent ranges with
    identical file sets coalesce), and each range becomes one task that
    reads ONLY the overlapping files from each side (exact residual
    filter to the range), joins locally via ``fn(la, lb) ->
    pd.DataFrame`` and emits the partials — no shuffle, no broadcast.
    Every row's key lies in exactly one range and every file containing
    that key overlaps that range, so equal keys split across adjacent
    files on EITHER side still meet in one task (the many-to-many
    boundary case the tests pin). Inner-join semantics: ranges empty on
    either side are skipped. I/O amplification is bounded by zone
    overlap — ~one boundary file per range on a sorted layout, versus a
    full all-to-all for the exchange join.
    """
    key_a, zones_a = _load_zones(dir_a)
    key_b, zones_b = _load_zones(dir_b)
    for key, zones, d in ((key_a, zones_a, dir_a), (key_b, zones_b, dir_b)):
        for z in zones:
            if not isinstance(z["min"], int) or not isinstance(z["max"], int):
                raise ValueError(
                    f"clustered_merge_join: integer cluster key required, got "
                    f"{type(z['min']).__name__} bounds for {key!r} in {d}"
                )
    points = sorted(
        {z["min"] for z in zones_a}
        | {z["max"] + 1 for z in zones_a}
        | {z["min"] for z in zones_b}
        | {z["max"] + 1 for z in zones_b}
    )
    tasks = []
    for lo, hi in zip(points[:-1], points[1:]):
        fa = [z["path"] for z in zones_a if z["min"] < hi and z["max"] >= lo]
        fb = [z["path"] for z in zones_b if z["min"] < hi and z["max"] >= lo]
        if not fa or not fb:
            continue
        if tasks and tasks[-1]["fa"] == fa and tasks[-1]["fb"] == fb and tasks[-1]["hi"] == lo:
            tasks[-1]["hi"] = hi  # coalesce: same files, adjacent range
        else:
            tasks.append({"lo": lo, "hi": hi, "fa": fa, "fb": fb})
    if not tasks:
        # typed empties from the layouts' own schemas, so fn sees its columns
        def empty_of(d: str, cols: Optional[List[str]]) -> pd.DataFrame:
            any_file = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
            schema = pq.read_schema(os.path.join(d, any_file[0]))
            if cols:
                schema = pa.schema([schema.field(c) for c in cols])
            return schema.empty_table().to_pandas()

        empty = fn(empty_of(dir_a, columns_a), empty_of(dir_b, columns_b))
        return rd.from_pandas(empty)

    def run(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for t in batch.itertuples(index=False):
            filt_a = [(key_a, ">=", int(t.lo)), (key_a, "<", int(t.hi))]
            filt_b = [(key_b, ">=", int(t.lo)), (key_b, "<", int(t.hi))]
            la = pq.read_table(
                [os.path.join(dir_a, f) for f in t.fa], columns=columns_a, filters=filt_a
            ).to_pandas()
            lb = pq.read_table(
                [os.path.join(dir_b, f) for f in t.fb], columns=columns_b, filters=filt_b
            ).to_pandas()
            outs.append(fn(la, lb))
        return pd.concat(outs, ignore_index=True)

    items = rd.from_pandas(pd.DataFrame(tasks)).repartition(len(tasks))
    return items.map_batches(run, batch_format="pandas", batch_size=None)


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
