"""Per-partition lineage manifest + resume.

The reference has no checkpointing (runs are single-shot generator chains,
``validators/schema.py:1010-1020``); this is mandated by the north rule.

Layout under ``out_dir``::

    unified/part-00000/...parquet     stage-A output for input shard 0
    unified/part-00001/...
    manifest.jsonl                    one line per COMPLETED shard
    violations/...parquet             canonically sorted final violations
    verdicts.parquet                  per-partition PSVI verdicts
    summary.json                      merged stats, drift, global verdict

A shard's unified output is written to a temp dir and renamed into place
before its manifest line is appended, so a line in the manifest implies the
shard's parquet is complete. Resume = read manifest, skip completed shards.
The shard → input-file mapping is deterministic (sorted file list, fixed
chunking), so a resumed run reproduces identical lineage and outputs.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from dataclasses import asdict, dataclass
from typing import Dict, List, Optional


@dataclass
class ShardRecord:
    partition_id: int
    input_files: List[str]
    n_rows: int
    n_violations: int
    wall_sec: float
    content_hash: str  # hash of the shard's sorted violation identities


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def load(self) -> Dict[int, ShardRecord]:
        done: Dict[int, ShardRecord] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = ShardRecord(**json.loads(line))
                    done[rec.partition_id] = rec
        return done

    def append(self, rec: ShardRecord) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(asdict(rec)) + "\n")
            f.flush()
            os.fsync(f.fileno())


def shard_dir(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, "unified", f"part-{partition_id:05d}")


def write_shard_atomic(ds, out_dir: str, partition_id: int) -> str:
    """Consume ``ds`` into the shard dir atomically (tmp dir + rename)."""
    final = shard_dir(out_dir, partition_id)
    tmp = final + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    ds.write_parquet(tmp)
    os.makedirs(tmp, exist_ok=True)  # an all-empty dataset writes no dir
    os.replace(tmp, final)
    return final


def content_hash(rows: List[tuple]) -> str:
    h = hashlib.sha256()
    for r in sorted(rows):
        h.update(repr(r).encode())
    return h.hexdigest()[:16]
