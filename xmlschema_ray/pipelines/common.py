"""Shared helpers for oracle-matched pipelines.

Float-exactness rule: every aggregate over money/decimal columns is
computed in SCALED INTEGERS (cents / 1e-4 units) on both the Ray side and
the DuckDB oracle side, with one final division to doubles. Integer sums
are order-independent, so results match the oracle bit-for-bit regardless
of parallelism — the analog of the reference's deterministic single-thread
output order (``/root/reference/xmlschema/validators/schema.py:1010-1020``)
achieved algebraically instead of by serialization.

The matching SQL idiom is ``CAST(floor(x * 100 + 0.5) AS BIGINT)`` —
``floor(+0.5)`` (not ROUND) because numpy rounds half-to-even while DuckDB
rounds half-away; floor+0.5 is identical in both.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def cents(x) -> "pd.Series | np.ndarray":
    """Dollars → integer cents, matching SQL floor(x*100 + 0.5)."""
    return np.floor(np.asarray(x, dtype=np.float64) * 100.0 + 0.5).astype(np.int64)


def scaled_int(x, scale: float) -> np.ndarray:
    return np.floor(np.asarray(x, dtype=np.float64) * scale + 0.5).astype(np.int64)


SQL_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"


# Shared oracle-dump side channel: hash-model pipelines (MinHash/SimHash/
# LSH) dump intermediate signatures here so the DuckDB oracle can re-derive
# everything downstream of them. bench.py sets GRAFT_SKIP_ORACLE_DUMP=1 so
# the timed pipelines never pay for the dump.
ORACLE_DUMP_DIR = "/tmp/xmlschema_ray_oracle"


def oracle_dump(ds, tag: str, enabled: bool = True) -> bool:
    """Write ``ds`` under ``ORACLE_DUMP_DIR/tag`` unless dumping is off
    (``enabled=False`` or the GRAFT_SKIP_ORACLE_DUMP env var is set).
    Returns whether the dump happened."""
    import shutil

    if not enabled or os.environ.get("GRAFT_SKIP_ORACLE_DUMP"):
        return False
    d = os.path.join(ORACLE_DUMP_DIR, tag)
    shutil.rmtree(d, ignore_errors=True)
    ds.write_parquet(d)
    return True


def dataset_or_typed_empty(ds, template: "pd.DataFrame"):
    """Return ``ds`` unless its (result-sized, already-executed-on-consume)
    contents are EMPTY — then return the typed empty frame instead.

    A zero-row Dataset that went through a sort exposes ONLY schema-less
    empty blocks (Ray's sort emits them for empty ranges and map operators
    pass them through; see ``ops/relational.py``), so the driver's
    ``to_pandas`` would lose every column and fail the schema compare.
    ``materialize()`` here is sound only for result-sized outputs
    (violation lists, outlier sets) — never call it on fact-sized data.
    """
    out = ds.materialize()
    if out.count() == 0:
        return template
    return out


def sorted_or_typed_empty(ds, keys, template=None, **sort_kwargs):
    """Canonical-sort a RESULT-SIZED dataset, falling back to its typed
    empty frame when the result is corpus-wide EMPTY.

    Ray's sort emits schema-less empty blocks for empty inputs, so a
    legitimately-empty result (no near-dup pairs, identical snapshots, no
    anti-join survivors) loses every column at the driver's ``to_pandas``
    and fails schema compares (found live: ``mad_outlier_docs`` at
    sf0.1). The pre-sort blocks DO carry their schema (per-partition fns
    emit typed empties), so materialize first, skip the sort when empty.
    Result-sized outputs only — never call on fact-sized data.

    ``template`` (typed empty DataFrame) covers pipelines whose WHOLE
    upstream went through an exchange (every pre-sort block schema-less
    too — e.g. a self-join that found no pairs); without it the schema is
    recovered best-effort from the executed plan.
    """
    from xmlschema_ray.ops.relational import to_pandas_with_schema

    m = ds.materialize()
    if m.count() == 0:
        if template is not None:
            return template
        return to_pandas_with_schema(m)
    return m.sort(keys, **sort_kwargs)


def layout_cache_fresh(cache_dir: str, manifest_name: str, expected_tag: str) -> bool:
    """True iff ``cache_dir`` holds a layout manifest whose hash tag
    matches this build. A STALE tag (layout written under an older hash
    version — e.g. the round-4 hash64/bucket-hash changes, round-5 bloom
    v2) is DELETED here so the caller rebuilds: refusing at read time is
    right for user-owned layouts, but a warm ``/tmp`` cache should
    self-heal instead of surfacing the reader's ValueError on the first
    post-upgrade run. Missing/corrupt manifests also wipe-and-return-False
    (a half-built dir would trip the writers' stale-parquet refusal)."""
    import json
    import shutil

    path = os.path.join(cache_dir, manifest_name)
    if not os.path.exists(path):
        shutil.rmtree(cache_dir, ignore_errors=True)
        return False
    try:
        with open(path) as fh:
            tag = json.load(fh).get("hash")
    except (OSError, ValueError):
        tag = None
    if tag != expected_tag:
        shutil.rmtree(cache_dir, ignore_errors=True)
        return False
    return True


def tdiv_int(a: int, b: int) -> int:
    """Truncate-toward-zero integer division on PYTHON ints (arbitrary
    precision), correct for BOTH signs of both operands — DuckDB ``//``
    semantics; Python ``//`` floors, which differs whenever the quotient
    is negative. The ONE shared scalar helper for the repo's
    integer-exact oracle convention."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q
