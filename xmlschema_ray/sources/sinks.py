"""Resumable partitioned parquet sink for ARBITRARY pipelines.

The validation engine's lineage layout (``engine/checkpoint.py``: one
directory per input shard, atomic tmp-dir rename, manifest line only after
the rename) generalized so any query pipeline gets the same guarantee: a
failed 100-TB run re-executes only unfinished shards, and a manifest line
implies that shard's parquet is complete. Never one giant file — the unit
of both parallelism and recovery is the shard directory.

The reference has no analog (single-shot generator chains,
``validators/schema.py:1010-1020``); this is north-rule scale machinery.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Sequence

import ray.data as rd

from xmlschema_ray.engine import checkpoint as ckpt


def resumable_write(
    make_shard: Callable[[object], "rd.Dataset"],
    shards: Sequence[object],
    out_dir: str,
    resume: bool = True,
) -> Dict[str, int]:
    """Consume ``make_shard(shard)`` per shard into ``out_dir`` resumably.

    ``shards`` is any list of shard descriptors (typically input-file
    lists); shard identity is POSITIONAL, so the caller must pass a
    deterministic shard list (sorted files, fixed chunking) for resume to
    be sound — the same contract the engine's manifest documents.

    Returns ``{"n_shards", "n_skipped", "n_rows"}``; rows of skipped
    shards are counted from their manifest lines, so the total is stable
    across interrupted + resumed runs.
    """
    manifest = ckpt.Manifest(out_dir)
    done = manifest.load() if resume else {}
    n_skipped = 0
    n_rows = 0
    for pid, shard in enumerate(shards):
        if pid in done:
            n_skipped += 1
            n_rows += done[pid].n_rows
            continue
        t0 = time.time()
        ds = make_shard(shard)
        ckpt.write_shard_atomic(ds, out_dir, pid)
        import pyarrow.dataset as pads

        rows = pads.dataset(ckpt.shard_dir(out_dir, pid)).count_rows()
        n_rows += rows
        manifest.append(
            ckpt.ShardRecord(
                partition_id=pid,
                input_files=[str(shard)]
                if isinstance(shard, (str, int))
                else list(map(str, shard)),
                n_rows=rows,
                n_violations=0,
                wall_sec=round(time.time() - t0, 3),
                content_hash="",
            )
        )
    return {"n_shards": len(shards), "n_skipped": n_skipped, "n_rows": n_rows}


def chunk_files(files: List[str], n_shards: int) -> List[List[str]]:
    """Deterministic file→shard chunking (sorted input, contiguous
    slices) — the same rule the engine uses, exposed for sink callers."""
    if not files:
        return []
    files = sorted(files)
    n_shards = max(1, min(n_shards, len(files)))
    per = (len(files) + n_shards - 1) // n_shards
    return [files[i : i + per] for i in range(0, len(files), per)]
