"""Hash-bucketed parquet layout: co-partitioned export + manifest +
SHUFFLE-FREE bucketed join and point lookup.

The hash sibling of the range-clustered layout (``clustered.py``): two
tables written bucketed on their join key with the SAME (hash fn,
num_buckets) are physically co-partitioned, so the join needs NO
exchange at read time — each task reads bucket k of both sides and joins
locally. At a 100-TB fact table that converts the single most expensive
all-to-all of a recurring pipeline into an embarrassingly parallel map
paid ONCE at write time (the Hive/Iceberg bucketed-table contract). A
point lookup touches exactly one bucket directory.

Safety is carried by the manifest, not convention: the join REFUSES
layouts whose (key-hash function tag, num_buckets) disagree — joining
incompatible buckets would silently DROP matches, the worst failure mode
a layout can have. The manifest is written last (atomic rename), the
same manifest-after-data discipline as the resumable sink.

Reference analog: none (single-shot generator chains); §2.1
sources/sinks scale surface, §2.6 join family.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

BUCKET_MANIFEST = "_bucket_manifest.json"
HASH_TAG = "pd_hash_array_v3"  # identifies the bucket fn; must match to join (v3: float32 keys widen to float64 before hashing)
# (v2: integer keys hash through their float64 spelling — dtype-stable
# across null-bearing batches; v1 layouts must be rebuilt)


def bucket_of(values: np.ndarray, num_buckets: int) -> np.ndarray:
    """Stable bucket assignment (the layout's ONE hash fn — both sides of
    a bucketed join and every later incremental writer must use it)."""
    from xmlschema_ray.engine.stats import hash64

    return (hash64(np.asarray(values)) % np.uint64(num_buckets)).astype(np.int64)


# one NORMALIZED name per logical type: the same key may surface as Arrow
# "double" from a parquet-backed dataset or pandas "float64" from a
# pandas-block dataset — a spelling difference must not fail the contract
_DTYPE_NORM = {
    "double": "float64",
    "float": "float32",
    "object": "string",
    "large_string": "string",
}


def _key_dtype_of(ds: "rd.Dataset", key: str) -> str:
    base = ds.schema().base_schema
    if hasattr(base, "field"):  # Arrow schema
        raw = str(base.field(key).type)
    else:  # PandasBlockSchema: parallel names/types lists
        raw = str(dict(zip(base.names, base.types))[key])
    return _DTYPE_NORM.get(raw, raw)


def write_bucketed(
    ds: "rd.Dataset", key: str, out_dir: str, num_buckets: int
) -> dict:
    """Write ``ds`` hash-bucketed on ``key``: ONE co-locating exchange
    (the write-time cost that buys every later join its zero-exchange
    plan), then each bucket lands contiguously under ``bucket=K/``.
    Size ``num_buckets`` so one bucket of the LARGER table fits a worker
    heap (buckets ≈ bytes / target_bucket_bytes) — the join loads one
    bucket pair per task.
    """
    from xmlschema_ray.ops.relational import hash_partition_apply

    os.makedirs(out_dir, exist_ok=True)
    # key dtype is part of the hash contract (hash64 of int64 vs float64
    # bit patterns differ) — recorded so bucketed_join can refuse a
    # mismatched pair instead of silently dropping matches
    key_dtype = _key_dtype_of(ds, key)

    def write_bucket_rows(part: pd.DataFrame) -> pd.DataFrame:
        # one partition holds whole buckets (co-location guarantee);
        # write each bucket's rows into its own hive dir, return a
        # footer row per bucket (rows, path) for the manifest
        rows = []
        for b, g in part.groupby("__bucket", sort=False):
            d = os.path.join(out_dir, f"bucket={int(b)}")
            os.makedirs(d, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
            os.close(fd)
            g.drop(columns="__bucket").to_parquet(tmp, index=False)
            final = tmp[:-4] + ".parquet"
            os.replace(tmp, final)
            rows.append((int(b), len(g), os.path.relpath(final, out_dir)))
        return pd.DataFrame(rows, columns=["bucket", "rows", "path"])

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch["__bucket"] = bucket_of(batch[key].to_numpy(), num_buckets)
        return batch

    written = hash_partition_apply(
        ds.map_batches(add_bucket, batch_format="pandas"),
        "__bucket",
        write_bucket_rows,
        num_partitions=num_buckets,
    ).to_pandas()
    files = (
        written.sort_values(["bucket", "path"]).to_dict("records")
        if len(written.columns)
        else []
    )
    manifest = {
        "key": key,
        "key_dtype": key_dtype,
        "num_buckets": int(num_buckets),
        "hash": HASH_TAG,
        "files": files,
    }
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(out_dir, BUCKET_MANIFEST))
    return manifest


def read_manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, BUCKET_MANIFEST)) as fh:
        m = json.load(fh)
    if m.get("hash") != HASH_TAG:
        raise ValueError(
            f"bucketed layout at {out_dir!r} was written with bucket hash "
            f"{m.get('hash')!r}; this build implements {HASH_TAG!r} — "
            "rebuild the layout (probing with a different hash would read "
            "the wrong bucket and silently miss rows)"
        )
    return m


def _bucket_paths(out_dir: str, manifest: dict, bucket: int) -> List[str]:
    return [
        os.path.join(out_dir, f["path"])
        for f in manifest["files"]
        if f["bucket"] == bucket
    ]


def read_bucket_for(out_dir: str, value) -> pd.DataFrame:
    """Point lookup: hash the value, read ONE bucket directory, exact
    residual filter (bucket membership is necessary, not sufficient)."""
    m = read_manifest(out_dir)
    b = int(bucket_of(np.asarray([value]), m["num_buckets"])[0])
    paths = _bucket_paths(out_dir, m, b)
    if not paths:
        return pd.DataFrame()
    df = pd.concat([pq.read_table(p).to_pandas() for p in paths], ignore_index=True)
    return df[df[m["key"]] == value].reset_index(drop=True)


def compact_bucketed(
    base_dir: str,
    changes: "rd.Dataset",
    out_dir: str,
    action_col: str = "action",
) -> dict:
    """Apply a compacted CDC feed (``delete``/``upsert`` rows, ≤1 action
    per key — the :func:`~xmlschema_ray.ops.relational.merge_into`
    contract) to a bucketed layout, producing a NEW GENERATION of the
    layout under ``out_dir`` — the data-lake compaction step
    (Iceberg/Delta MERGE + rewrite) expressed against this layout.

    The scale property is the point: the feed takes ONE co-locating
    exchange (feed-sized), each TOUCHED bucket is merged and rewritten by
    the task that owns it (zero exchange of the base — the layout already
    co-partitioned it at write time), and every UNTOUCHED bucket is
    carried into the new generation as a hard link (metadata-only; copy
    fallback across devices). A daily feed touching 1% of the buckets of
    a 100-TB table rewrites 1% of the data and links the rest. The new
    manifest is published LAST (atomic rename), so readers see the old or
    the new generation, never a mix, and the output is itself a valid
    layout: point lookups, bucketed joins and further compactions compose
    on it (generation chains).

    Returns the new manifest. Refuses a base layout whose hash tag this
    build does not implement (merging with a different bucket fn would
    scatter keys across generations — the silent-subset failure mode).
    """
    import shutil

    from xmlschema_ray.ops.relational import hash_partition_apply

    m = read_manifest(base_dir)
    if m["hash"] != HASH_TAG:
        raise ValueError(
            f"compact_bucketed: unknown bucket hash {m['hash']!r} "
            f"(this build implements {HASH_TAG!r}) — rebucket the base"
        )
    key, nb = m["key"], int(m["num_buckets"])
    os.makedirs(out_dir, exist_ok=True)
    # canonical column order for merged buckets, from the base layout
    base_cols: Optional[List[str]] = (
        pq.read_schema(os.path.join(base_dir, m["files"][0]["path"])).names
        if m["files"]
        else None
    )

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch["__bucket"] = bucket_of(batch[key].to_numpy(), nb)
        return batch

    def merge_bucket(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for b, g in part.groupby("__bucket", sort=False):
            b = int(b)
            feed = g.drop(columns="__bucket")
            ins = feed[feed[action_col].to_numpy() == "upsert"].drop(columns=[action_col])
            paths = _bucket_paths(base_dir, m, b)
            if paths:
                base = pd.concat(
                    [pq.read_table(p).to_pandas() for p in paths], ignore_index=True
                )
                keep = base[~base[key].isin(feed[key].to_numpy())]
                merged = pd.concat([keep, ins[keep.columns]], ignore_index=True)
            else:
                merged = ins if base_cols is None else ins[base_cols]
            d = os.path.join(out_dir, f"bucket={b}")
            os.makedirs(d, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
            os.close(fd)
            merged.to_parquet(tmp, index=False)
            final = tmp[:-4] + ".parquet"
            os.replace(tmp, final)
            rows.append((b, len(merged), os.path.relpath(final, out_dir)))
        return pd.DataFrame(rows, columns=["bucket", "rows", "path"])

    written = hash_partition_apply(
        changes.map_batches(add_bucket, batch_format="pandas"),
        "__bucket",
        merge_bucket,
        num_partitions=nb,
    ).to_pandas()
    files = (
        [
            {"bucket": int(r["bucket"]), "rows": int(r["rows"]), "path": r["path"]}
            for r in written.to_dict("records")
        ]
        if len(written.columns)
        else []
    )
    touched = {f["bucket"] for f in files}
    for f in m["files"]:
        if int(f["bucket"]) in touched:
            continue
        src = os.path.join(base_dir, f["path"])
        d = os.path.join(out_dir, f"bucket={int(f['bucket'])}")
        os.makedirs(d, exist_ok=True)
        dst = os.path.join(d, os.path.basename(f["path"]))
        if not os.path.exists(dst):
            try:
                os.link(src, dst)  # metadata-only carry-over
            except OSError:
                shutil.copy2(src, dst)
        files.append(
            {"bucket": int(f["bucket"]), "rows": int(f["rows"]), "path": os.path.relpath(dst, out_dir)}
        )
    manifest = {
        "key": key,
        **({"key_dtype": m["key_dtype"]} if "key_dtype" in m else {}),
        "num_buckets": nb,
        "hash": HASH_TAG,
        "files": sorted(files, key=lambda r: (r["bucket"], r["path"])),
    }
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(out_dir, BUCKET_MANIFEST))
    return manifest


def read_bucketed(out_dir: str, columns: Optional[List[str]] = None) -> "rd.Dataset":
    """Read a bucketed layout back as a Dataset (manifest-listed files
    only — a half-written generation's stray files are invisible)."""
    m = read_manifest(out_dir)
    paths = [os.path.join(out_dir, f["path"]) for f in m["files"]]
    if not paths:
        return rd.from_pandas(pd.DataFrame())
    # partitioning=None: the hive-style bucket=K/ dirs are a layout detail,
    # not a data column — default hive inference would inject 'bucket'
    return rd.read_parquet(paths, columns=columns, partitioning=None)


def bucketed_join(
    left_dir: str,
    right_dir: str,
    fn=None,
    columns_left: Optional[List[str]] = None,
    columns_right: Optional[List[str]] = None,
    how: str = "inner",
) -> "rd.Dataset":
    """ZERO-EXCHANGE join of two compatibly-bucketed layouts: one task per
    bucket reads that bucket's files from BOTH sides and joins locally —
    the physical co-partitioning at write time already did the all-to-all.
    ``fn(joined_df) -> df`` (optional) runs in-task on each bucket's join
    result, so aggregating consumers never materialize the joined rows.

    Refuses incompatible layouts loudly: a (hash, num_buckets, key-type)
    mismatch would not error at read time — it would silently produce a
    SUBSET of the true join, so the manifest check is the correctness
    boundary.
    """
    if how not in ("inner", "left"):
        # 'right'/'outer' would need right-only buckets the left-driven
        # bucket walk never visits — refusing beats silently dropping them
        raise ValueError(f"bucketed_join supports how='inner'|'left', got {how!r}")
    ml, mr = read_manifest(left_dir), read_manifest(right_dir)
    for field in ("num_buckets", "hash"):
        if ml[field] != mr[field]:
            raise ValueError(
                f"bucketed_join: incompatible layouts ({field}: "
                f"{ml[field]!r} != {mr[field]!r}) — rebucket one side"
            )
    # key DTYPE is part of the hash contract: hash64 of int64 vs float64
    # bit patterns differ, so equal values land in different buckets and
    # the join silently returns a subset — refuse when both manifests
    # carry the field and disagree (older manifests lack it)
    lt, rt = ml.get("key_dtype"), mr.get("key_dtype")
    if lt is not None and rt is not None and lt != rt:
        raise ValueError(
            f"bucketed_join: key dtype mismatch ({lt!r} vs {rt!r}) — equal "
            "values hash to different buckets; rebucket one side"
        )
    lk, rk = ml["key"], mr["key"]

    def join_bucket(batch: pd.DataFrame):
        for b in batch["bucket"].tolist():
            lp = _bucket_paths(left_dir, ml, int(b))
            rp = _bucket_paths(right_dir, mr, int(b))
            if not lp or (how == "inner" and not rp):
                continue
            lf = pd.concat(
                [pq.read_table(p, columns=columns_left).to_pandas() for p in lp],
                ignore_index=True,
            )
            if rp:
                rf = pd.concat(
                    [pq.read_table(p, columns=columns_right).to_pandas() for p in rp],
                    ignore_index=True,
                )
            else:
                # TYPED empty frame from the layout's own schema: all-object
                # columns would diverge block schemas across buckets and
                # break Arrow unification downstream
                schema = pq.read_schema(
                    os.path.join(right_dir, mr["files"][0]["path"])
                )
                rf = schema.empty_table().to_pandas()
                if columns_right:
                    rf = rf[list(columns_right)]
            j = lf.merge(rf, left_on=lk, right_on=rk, how=how)
            yield fn(j) if fn is not None else j

    buckets = rd.from_pandas(
        pd.DataFrame({"bucket": np.arange(ml["num_buckets"], dtype=np.int64)})
    ).repartition(ml["num_buckets"])
    return buckets.map_batches(join_bucket, batch_format="pandas", batch_size=None)
