"""The validation run lifecycle — Ray-Data-first orchestration.

Mirrors the reference's run spine (``xmlschema.validate`` →
``XMLSchemaBase.iter_errors`` → per-element ``iter_decode`` →
identity-constraint checks, ``/root/reference/xmlschema/validators/
schema.py:946-1020``) re-staged for a cluster:

* stage A — ``read_parquet(shard)`` → actor-pool ``map_batches(RowValidator)``
  over zero-copy Arrow batches: all row-local facet/assertion checks, the
  broadcast-dim referential check, per-batch unique-key count partials and
  per-batch stats blobs, in ONE pass (validation-is-decode-with-errors,
  ``xsdbase.py:547-593``). Output written per input shard (atomic rename +
  manifest line → resumable lineage).
* stage B — global uniqueness (``xs:unique``/``xs:ID`` analog,
  ``validators/identities.py:198-221``), two exact phases:
  (1) candidate detection — per-batch ``(key_hash: uint64, count)``
  partials are aggregated (driver-side Arrow int hash-aggregate below a
  size threshold, hash-partitioned shuffle merge above it) and
  ``total > 1`` marks a candidate; (2) exact recovery — only the
  unique-key columns are rescanned, rows hashing into the broadcast
  candidate set are counted BY VALUE, and true ``count > 1`` keys become
  duplicated-value violations. Hashing shrinks the bulkiest channel ~4x
  and a 64-bit collision can only create a false candidate (killed in
  phase 2), never a false violation — exact even at 10^12 keys.
  Pre-aggregation per batch means a hot key ships one row per batch, so
  reducer skew is bounded by the batch count, not the row count.
* stage C — referential integrity runs inside stage A against the dim key
  set broadcast once with ``ray.put`` (``validators/identities.py:290-318``).
* stage D — driver merge: stats blobs are tree-merged per block then folded
  on the driver; KS/PSI drift vs the reference profile; per-partition PSVI
  verdicts (``xsdbase.py:69-92``) and the job roll-up.
* stage E — writers: canonically sorted violations parquet (deterministic
  across parallelism levels), verdicts parquet, JSON summary.

Scale notes: the only all-to-all exchange is the stage-B groupby over
pre-aggregated ``(key, count)`` partials; the dim table is broadcast, never
shuffled; stats merging is O(#blocks) on the driver. Input shards give
resume granularity and keep `read_parquet` parallelism within each shard.
"""

from __future__ import annotations

import glob
import json
import os
import time

_TIMING = os.environ.get("XSR_TIMING") == "1"


def _mark(label: str, t0: float) -> float:
    if _TIMING:
        print(f"[xsr-timing] {label}: {time.time() - t0:.2f}s", flush=True)
    return time.time()
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray
import ray.data as rd

from xmlschema_ray.constraints.spec import TableConstraints
from xmlschema_ray.engine import checkpoint as ckpt
from xmlschema_ray.engine import verdicts as V
from xmlschema_ray.engine.row_validator import (
    UNIFIED_SCHEMA,
    VIOLATION_SCHEMA,
    RowValidator,
    merge_stats_blobs,
)
from xmlschema_ray.engine.stats import BatchStats, hll_estimate, ks_statistic, psi


@dataclass
class DriftResult:
    name: str
    column: str
    ks: Optional[float]
    psi: Optional[float]
    passed: bool
    observed_hist: List[int]


@dataclass
class ValidationResult:
    out_dir: str
    job_validity: str
    verdicts: pd.DataFrame
    stats: BatchStats
    drift: List[DriftResult]
    summary: Dict
    n_violations: int
    # warning-severity violation count (spec.warning_constraints) — recorded
    # in verdicts/summary but never part of the validity decision
    n_warnings: int = 0

    def violations(self) -> pd.DataFrame:
        """Canonically sorted violations (deterministic across parallelism)."""
        path = os.path.join(self.out_dir, "violations")
        if not os.path.exists(path) or not os.listdir(path):
            return pd.DataFrame(columns=[f.name for f in VIOLATION_SCHEMA])
        df = pads.dataset(path).to_table().to_pandas()
        return df.sort_values(
            ["partition_id", "key", "constraint_name", "column"], kind="mergesort"
        ).reset_index(drop=True)

    def violations_dataset(self) -> "rd.Dataset":
        return rd.read_parquet(os.path.join(self.out_dir, "violations"))

    def export(self, format_name: str, out_path: str) -> str:
        """Render the canonical violations through a registered output
        formatter (``engine.formatters`` registry — the converters analog,
        reference ``converters.py:44-370``). The canonical parquet output
        is never touched; formatters are additional renderings."""
        from xmlschema_ray.engine.formatters import get_formatter

        get_formatter(format_name).writer(
            os.path.join(self.out_dir, "violations"), out_path
        )
        return out_path


def _resolve_files(source: Union[str, Sequence[str]]) -> List[str]:
    if isinstance(source, str):
        if os.path.isdir(source):
            return sorted(glob.glob(os.path.join(source, "*.parquet")))
        return sorted(glob.glob(source)) or [source]
    return sorted(source)


def _dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f)) for r, _, files in os.walk(d) for f in files
    )


def _chunk(files: List[str], n_shards: int) -> List[List[str]]:
    n_shards = max(1, min(n_shards, len(files)))
    out: List[List[str]] = [[] for _ in range(n_shards)]
    for i, f in enumerate(files):
        out[i % n_shards].append(f)
    return [s for s in out if s]


class ValidationEngine:
    """Compile once on the driver, run over any number of inputs.

    The compiled spec is tiny, pickleable pure data — the analog of the
    built ``XsdGlobals`` graph shared by all validations
    (``validators/globals_.py:204-474``) — shipped to workers via the actor
    constructor, loaded once per actor.
    """

    def __init__(
        self,
        spec: TableConstraints,
        batch_size: int = 16384,
        concurrency: Optional[int] = None,
        n_shards: Optional[int] = None,
        use_actors: bool = False,
        max_violations_per_batch: Optional[int] = None,
        broadcast_fk_cap_bytes: int = 256 << 20,
    ):
        self.spec = spec.compile()
        self.batch_size = batch_size
        self.concurrency = concurrency
        self.n_shards = n_shards
        # Stateless tasks by default: validator construction is cheap (the
        # spec is pure data, FK sets come zero-copy from the object store),
        # and tasks reuse Ray's warm worker pool — an actor pool pays a
        # multi-second cold start that dominates short jobs. Set
        # ``use_actors=True`` when per-worker setup is genuinely expensive.
        self.use_actors = use_actors
        # violation-row materialization cap per (batch, constraint) — the
        # pathological-corpus guard; counts stay exact via overflow records
        # (see RowValidator). None = materialize everything (default).
        if max_violations_per_batch is not None and max_violations_per_batch < 0:
            raise ValueError("max_violations_per_batch must be >= 0 or None")
        self.max_violations_per_batch = max_violations_per_batch
        # adaptive-plan threshold: below this many bytes the finalize
        # phases run driver-side (arrow aggregate / sort / stats fold);
        # above it they run as distributed Ray pipelines. Exposed for
        # tests to force the distributed paths at toy scale.
        self.driver_threshold_bytes = 1 * 1024 * 1024 * 1024
        # keyrefs whose dim key data exceeds this broadcast once per run;
        # LARGER dims (fact-to-fact referential integrity — the north
        # star mandates broadcast only for dimension tables) defer to a
        # distributed co-partitioned anti-join in finalize instead of
        # building a worker-crushing broadcast object. Tests force 0 to
        # prove both paths emit identical violations.
        self.broadcast_fk_cap_bytes = broadcast_fk_cap_bytes

    # -- dims -------------------------------------------------------------

    def _load_fk_sets(self, dims: Dict[str, Union[str, pa.Table]]):
        """Driver-side load of the (small) dimension key sets. Returns
        ``(fk_sets, deferred)``: single-column keyrefs whose dim key data
        exceeds ``broadcast_fk_cap_bytes`` are NOT loaded — they come back
        in ``deferred`` for the distributed anti-join pass (stage B2)."""
        fk_sets: Dict[str, pa.Array] = {}
        deferred: List[tuple] = []
        for fk in self.spec.foreign_keys:
            if fk.dim_name not in dims:
                raise ValueError(f"foreign key {fk.name!r}: dim table {fk.dim_name!r} not provided")
            dim = dims[fk.dim_name]
            keys = list(fk.dim_keys)
            if isinstance(dim, str):
                files = _resolve_files(dim)
                approx = sum(map(os.path.getsize, files))
                if approx > self.broadcast_fk_cap_bytes:
                    if len(keys) > 1:
                        raise ValueError(
                            f"foreign key {fk.name!r}: composite dim {fk.dim_name!r} "
                            f"(~{approx >> 20} MiB) exceeds the broadcast cap and the "
                            "distributed keyref path is single-column — raise "
                            "broadcast_fk_cap_bytes or split the keyref"
                        )
                    deferred.append((fk, files))
                    continue
                dim_tbl = pads.dataset(files).to_table(columns=keys)
            else:
                dim_tbl = dim.select(keys)
                if dim_tbl.nbytes > self.broadcast_fk_cap_bytes and len(keys) == 1:
                    deferred.append((fk, dim_tbl))
                    continue
            if len(keys) == 1:
                fk_sets[fk.name] = dim_tbl[keys[0]].combine_chunks().unique()
            else:
                # composite keyref: broadcast the DISTINCT dim tuples as a
                # table; the validator exact-joins per batch (no hashing,
                # so no collision soundness question)
                fk_sets[fk.name] = dim_tbl.group_by(keys).aggregate([])
        return fk_sets, deferred

    def _load_manifests(self, dims: Dict[str, Union[str, pa.Table]]) -> Dict[str, pa.Table]:
        """Driver-side load of the expected-values manifest dims for
        ``spec.manifest_checks`` (group-cardinality-sized by assumption —
        the same broadcast-dim assumption the keyref sets make). Returns
        {check name: manifest table pruned to the referenced columns}."""
        out: Dict[str, pa.Table] = {}
        for mc in self.spec.manifest_checks:
            if mc.dim_name not in dims:
                raise ValueError(
                    f"manifest check {mc.name!r}: dim table {mc.dim_name!r} not provided"
                )
            dim = dims[mc.dim_name]
            cols = [mc.dim_key] + [
                c for c in (mc.expected_count, mc.expected_sum) if c is not None
            ]
            if isinstance(dim, str):
                tbl = pads.dataset(_resolve_files(dim)).to_table(columns=cols)
            else:
                tbl = dim.select(cols)
            key_arr = tbl[mc.dim_key]
            if key_arr.null_count or len(pc.unique(key_arr)) != len(tbl):
                raise ValueError(
                    f"manifest check {mc.name!r}: dim {mc.dim_name!r} key column "
                    f"{mc.dim_key!r} must be unique and non-null"
                )
            out[mc.name] = tbl
        return out

    def _manifest_check_violations(
        self, merged: "BatchStats", manifests: Dict[str, pa.Table], n_rows_total: int = 0
    ) -> List[dict]:
        """Stage-D reconciliation of the merged per-group (n, nulls, sum)
        channel against each manifest (see ``ManifestCheck``). Group keys
        in the stats channel render via ``stats._group_labels`` — Python
        ``str()`` of the Arrow-faithful values (int 3 → '3' in every
        batch); manifest keys render through the SAME convention below so
        integer and string provenance labels both reconcile. Values
        format as integers when integral so reasons are
        engine-independent."""

        def fmt(x: float) -> str:
            return str(int(x)) if float(x) == int(x) else repr(float(x))

        out: List[dict] = []
        for mc in self.spec.manifest_checks:
            man = manifests.get(mc.name)
            if man is None:
                continue
            if mc.name not in merged.groups and n_rows_total > 0:
                # rows were scanned but the stats channel carries NO partials
                # for this check: either the group_by column is absent from
                # every scanned file, or the unified stats predate the check
                # (spec changed under resume). Emitting missing_group for
                # every manifest row would be a fabricated result — refuse.
                raise ValueError(
                    f"manifest check {mc.name!r}: {n_rows_total} rows scanned but "
                    "no stats partials recorded — group_by column "
                    f"{mc.group_by!r} absent from the input, or the out_dir's "
                    "stats predate this check (spec changed under resume); "
                    "re-run with resume=False"
                )
            gd = merged.groups.get(mc.name, {})
            man_pd = man.to_pandas()
            # SAME key identity as the stats channel: str() over the
            # Arrow-faithful values, not a pandas astype(str) (an int64
            # dim surfaced as float64 would render '1.0' vs the channel's
            # '1' and every group would report missing)
            man_keys = np.array(
                [str(v) for v in man[mc.dim_key].to_pylist()], dtype=object
            )
            exp_n = (
                man_pd[mc.expected_count].to_numpy(np.float64)
                if mc.expected_count is not None
                else None
            )
            exp_s = (
                man_pd[mc.expected_sum].to_numpy(np.float64)
                if mc.expected_sum is not None
                else None
            )
            seen = set()
            order = np.argsort(man_keys)
            for i in order:
                gv = man_keys[i]
                seen.add(gv)
                trip = gd.get(gv)
                if trip is None:
                    if mc.check_missing:
                        want = exp_n[i] if exp_n is not None else exp_s[i]
                        out.append(
                            {
                                "partition_id": -1,
                                "key": gv,
                                "constraint_name": f"{mc.name}.missing_group",
                                "column": mc.group_by,
                                "reason": (
                                    f"manifest expects {fmt(want)} "
                                    f"({'rows' if exp_n is not None else 'sum'}), observed no rows"
                                ),
                                "value_repr": "0",
                            }
                        )
                    continue
                n, _nulls, s = (float(x) for x in trip)
                if exp_n is not None and abs(n - float(exp_n[i])) > mc.count_tolerance:
                    out.append(
                        {
                            "partition_id": -1,
                            "key": gv,
                            "constraint_name": f"{mc.name}.count_mismatch",
                            "column": mc.group_by,
                            "reason": f"count {fmt(n)} != expected {fmt(exp_n[i])}",
                            "value_repr": fmt(n),
                        }
                    )
                if exp_s is not None and abs(s - float(exp_s[i])) > mc.sum_tolerance:
                    out.append(
                        {
                            "partition_id": -1,
                            "key": gv,
                            "constraint_name": f"{mc.name}.sum_mismatch",
                            "column": mc.column or mc.group_by,
                            "reason": f"sum({mc.column}) {fmt(s)} != expected {fmt(exp_s[i])}",
                            "value_repr": fmt(s),
                        }
                    )
            if mc.check_unexpected:
                for gv in sorted(g for g in gd if g not in seen):
                    n = float(gd[gv][0])
                    out.append(
                        {
                            "partition_id": -1,
                            "key": gv,
                            "constraint_name": f"{mc.name}.unexpected_group",
                            "column": mc.group_by,
                            "reason": f"observed {fmt(n)} rows for a group not in {mc.dim_name}",
                            "value_repr": fmt(n),
                        }
                    )
        return out

    @staticmethod
    def _key_sample_filter(key_cols, mod: int):
        """Batch filter keeping the canary key-hash sample — the SAME
        predicate stage A applies, so B2/B5 passes see the identical row
        subset under ``sample_mod`` (a B-stage finding for an unsampled
        key would be a violation stage A's verdict math never saw)."""
        from xmlschema_ray.engine.row_validator import unique_key_column
        from xmlschema_ray.engine.stats import hash64

        cols = list(key_cols)

        def fn(t: pa.Table) -> pa.Table:
            if not t.num_rows:
                return t
            ks = unique_key_column(t, cols).to_numpy(zero_copy_only=False)
            return t.filter(pa.array(hash64(ks) % mod == 0))

        return fn

    def _make_attach_pid(self, pid_ref, logical):
        """ONE shared B-stage batch shaper (B2/B3/B5): resolve the
        reader's hidden ``path`` lineage to a shard id immediately (so
        downstream schema sampling sees a plain column), then flatten
        dotted identity keys and drop the root structs — the exchange
        ships leaves, not trees. Factored so the next struct-key or
        lineage change lands in exactly one place (per-stage drift in
        this closure family is precisely the silent-divergence class the
        round-4 key-identity fixes were about)."""
        dotted = self.spec.dotted_key_paths()
        logical = list(logical)

        def attach_pid(batch: pa.Table) -> pa.Table:
            pmap = ray.get(pid_ref)
            parr = batch["path"].to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(parr, return_inverse=True)
            lut = np.array([pmap.get(p, -1) for p in uniq], dtype=np.int32)
            batch = batch.drop_columns(["path"]).append_column(
                "__pid", pa.array(lut[inv], pa.int32())
            )
            if dotted:
                from xmlschema_ray.engine.row_validator import augment_struct_keys

                batch = augment_struct_keys(batch, dotted)
                batch = batch.select(
                    [c for c in logical if c in batch.column_names] + ["__pid"]
                )
            return batch

        return attach_pid

    def _phys_read_cols(self, cols) -> List[str]:
        """Physical parquet columns for a logical column list: dotted
        struct-path identity keys read their ROOT struct column (parquet
        cannot project a subfield by dotted name here); the B-stage maps
        then flatten via ``augment_struct_keys`` so downstream kernels see
        the dotted name as a literal column."""
        dotted = set(self.spec.dotted_key_paths())
        return sorted({c.split(".", 1)[0] if c in dotted else c for c in cols})

    @staticmethod
    def _key_types_of(files, cols) -> dict:
        """Source Arrow types of the violation-key columns, from the first
        file footer carrying each (schema-generation tolerant). B-stage
        pandas kernels route violating key values back through these types
        (``render_violation_keys``) so their rendered keys match stage A's
        ``_key_strings`` identity byte-for-byte — the pandas exchange
        alone would surface null-bearing int64 keys as float64 ('7.0' vs
        stage A's '7')."""
        from xmlschema_ray.constraints.spec import TableConstraints as _TC

        def lookup(sch: "pa.Schema", name: str):
            if name in sch.names:
                return sch.field(name).type
            if "." in name:  # dotted struct path: shared type-level walker
                root, *rest = name.split(".")
                if root not in sch.names:
                    return None
                return _TC.walk_struct_type(sch.field(root).type, rest)
            return None

        out: dict = {}
        for f in files:
            try:
                sch = pq.read_schema(f)
            except Exception:
                continue
            for c in cols:
                if c not in out:
                    t = lookup(sch, c)
                    if t is not None:
                        out[c] = t
            if len(out) == len(cols):
                break
        return out

    def _deferred_fk_violations(
        self,
        source,
        deferred: List[tuple],
        pid_of_file: Dict[str, int],
        sample_mod: Optional[int] = None,
    ) -> Optional["rd.Dataset"]:
        """Stage B2 — DISTRIBUTED keyref for dims too large to broadcast
        (fact-to-fact referential integrity): both the pruned source
        projection (violation key columns + the fk column) and the dim key
        stream flow through ONE co-partitioning exchange per keyref; each
        partition anti-masks with a vectorized ``isin`` against the
        co-located dim keys. Violations are shaped exactly like stage A's
        row-local fk findings (same key identity, partition attribution
        recovered from file lineage), so verdict roll-up and sinks need no
        new cases. NOTE: unlike stage A, this pass materializes every
        violating row (no per-batch cap applies) — a keyref failing
        corpus-wide should be run in stats_only first."""
        from xmlschema_ray.engine.row_validator import render_violation_keys
        from xmlschema_ray.ops.relational import combiner_aggregate, copartition_apply

        key_cols = [c for c in self.spec.key_columns]
        key_types = self._key_types_of(source, key_cols)
        out_ds: Optional[rd.Dataset] = None
        pid_ref = ray.put(pid_of_file)
        for fk, dim_src in deferred:
            col = fk.columns[0]
            logical = sorted(set(key_cols + [col]))
            src = rd.read_parquet(
                source, columns=self._phys_read_cols(logical), include_paths=True
            ).map_batches(
                self._make_attach_pid(pid_ref, logical), batch_format="pyarrow"
            )
            if sample_mod is not None:
                src = src.map_batches(
                    self._key_sample_filter(key_cols, sample_mod),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            if isinstance(dim_src, pa.Table):
                dim_ds = rd.from_arrow(dim_src)
            else:
                dim_ds = rd.read_parquet(dim_src, columns=[fk.dim_key])
            dim_keys = combiner_aggregate(dim_ds, fk.dim_key, {"n": (None, "count")})

            def shape(
                lf: pd.DataFrame, rf: pd.DataFrame, fk=fk, col=col, key_types=key_types
            ) -> pd.DataFrame:
                vals = lf[col]
                bad = (~vals.isin(rf[fk.dim_key]) & vals.notna()).to_numpy()
                if not bad.any():
                    return pd.DataFrame(
                        {f.name: pd.Series([], dtype=object) for f in VIOLATION_SCHEMA}
                    ).astype({"partition_id": "int32"})
                b = lf[bad]
                pids = b["__pid"].to_numpy().astype("int32")
                # stage-A key identity (_key_strings): Python str() through
                # the SOURCE dtypes, not an Arrow cast over the pandas
                # round-trip
                keys = render_violation_keys(b, key_cols, key_types)
                # same short-repr formatting as stage A's format_values so
                # both fk paths emit byte-identical rows
                from xmlschema_ray.engine.row_validator import format_values

                col_arr = pa.Array.from_pandas(b[col])
                vreprs = format_values(col_arr, np.arange(len(b)))
                return pd.DataFrame(
                    {
                        "partition_id": pids,
                        "key": keys,
                        "constraint_name": fk.name,
                        "column": col,
                        "reason": f"value not found in {fk.dim_name}.{fk.dim_key}",
                        "value_repr": np.array(vreprs, dtype=object),
                    }
                )

            viol = copartition_apply(src, dim_keys, col, fk.dim_key, shape)
            out_ds = viol if out_ds is None else out_ds.union(viol)
        return out_ds

    def _temporal_fk_violations(
        self,
        source,
        dims: Dict[str, Union[str, pa.Table]],
        pid_of_file: Dict[str, int],
        sample_mod: Optional[int] = None,
    ) -> Optional["rd.Dataset"]:
        """Stage B5 — TEMPORAL keyref (``TemporalForeignKey``): SCD2
        referential integrity, "did a version of the key exist WHEN the
        fact happened". ONE co-partitioning exchange per check: the pruned
        fact projection (violation keys + fk column + ts) meets the dim's
        VERSION rows (key, valid_from, valid_to) co-located on the key.
        Within each partition an inner merge expands facts × the versions
        of THEIR OWN key (bounded by the SCD2 versions-per-key contract,
        never fact × fact) and the containment mask folds back per fact
        row. Missing key and existing-key-but-uncovered-timestamp both
        violate, with distinguishing reasons (a point-in-time join drops
        both the same way). Null fk or ts rows are exempt (the xs:unique
        null-exemption convention); dim rows with null bounds cover
        nothing. Timestamps compare as epoch-µs int64. Like B2 this
        materializes every violating row (no per-batch cap) — run
        stats_only first on a corpus expected to fail wholesale."""
        from xmlschema_ray.engine.row_validator import (
            format_values,
            render_violation_keys,
        )
        from xmlschema_ray.ops.relational import copartition_apply

        def _epoch_i8(s: pd.Series) -> "tuple[np.ndarray, np.ndarray, bool]":
            """(values, valid mask, exact flag) — datetime64 → epoch-µs
            int64; integer dtypes stay EXACT int64 (raw epoch columns past
            2^53 would round at the half-open boundary through a float64
            detour); floats stay float64 (exact=False). Invalid (null/NaT)
            slots hold 0 under the mask."""
            ok = s.notna().to_numpy()
            if pd.api.types.is_datetime64_any_dtype(s):
                v = np.zeros(len(s), dtype=np.int64)
                if ok.any():
                    v[ok] = s[ok].astype("datetime64[us]").astype("int64").to_numpy()
                return v, ok, True
            if pd.api.types.is_integer_dtype(s):
                return s.fillna(0).to_numpy(dtype=np.int64), ok, True
            v = np.where(ok, s.to_numpy(dtype=np.float64, na_value=0.0), 0.0)
            return v, ok, False

        def _guard_mixed(vals: np.ndarray, ok: np.ndarray, exact: bool, mixed: bool, what: str):
            """A mixed int64-vs-float64 containment compare promotes BOTH
            sides to float64, silently re-rounding >2^53 integer epochs at
            the half-open boundary — exactly what _epoch_i8's int64 path
            exists to prevent. Refuse when the int side actually carries
            such magnitudes; below 2^53 the promotion is exact and allowed
            (a float dim bound probing an integer fact ts is legitimate)."""
            if mixed and exact and ok.any() and np.abs(vals[ok]).max() > 2**53:
                raise ValueError(
                    f"temporal FK: {what} is int64 with magnitudes past 2^53 "
                    "but the other side of the containment compare is float64 "
                    "— the promoted compare would round at the boundary; use "
                    "matching temporal dtypes for the fact ts and dim bounds"
                )

        key_cols = [c for c in self.spec.key_columns]
        key_types = self._key_types_of(source, key_cols)
        out_ds: Optional[rd.Dataset] = None
        pid_ref = ray.put(pid_of_file)
        for tfk in self.spec.temporal_foreign_keys:
            col, ts_col = tfk.column, tfk.ts_column
            logical = sorted(set(key_cols + [col, ts_col]))
            src = rd.read_parquet(
                source, columns=self._phys_read_cols(logical), include_paths=True
            ).map_batches(
                self._make_attach_pid(pid_ref, logical), batch_format="pyarrow"
            )
            if sample_mod is not None:
                src = src.map_batches(
                    self._key_sample_filter(key_cols, sample_mod),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )

            dim_src = dims[tfk.dim_name]
            if isinstance(dim_src, pa.Table):
                dim_ds = rd.from_arrow(
                    dim_src.select([tfk.dim_key, tfk.dim_valid_from, tfk.dim_valid_to])
                )
            else:
                dim_ds = rd.read_parquet(
                    dim_src, columns=[tfk.dim_key, tfk.dim_valid_from, tfk.dim_valid_to]
                )
            # private names so copartition's column-overlap lint never
            # collides with fact columns, whatever the dim calls its own
            dim_ds = dim_ds.map_batches(
                lambda t: t.rename_columns(["__dimk", "__vf", "__vt"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )

            def shape(
                lf: pd.DataFrame,
                rf: pd.DataFrame,
                tfk=tfk,
                col=col,
                ts_col=ts_col,
                key_types=key_types,
            ) -> pd.DataFrame:
                empty = pd.DataFrame(
                    {f.name: pd.Series([], dtype=object) for f in VIOLATION_SCHEMA}
                ).astype({"partition_id": "int32"})
                eligible = (lf[col].notna() & lf[ts_col].notna()).to_numpy()
                if not eligible.any():
                    return empty
                lf2 = lf[eligible].reset_index(drop=True)
                probe = pd.DataFrame(
                    {"__k": lf2[col].to_numpy(), "__row": np.arange(len(lf2), dtype=np.int64)}
                )
                m = probe.merge(
                    rf[["__dimk", "__vf", "__vt"]],
                    left_on="__k",
                    right_on="__dimk",
                    how="inner",
                )
                has_key = np.zeros(len(lf2), dtype=bool)
                covered = np.zeros(len(lf2), dtype=bool)
                if len(m):
                    rows = m["__row"].to_numpy(np.int64)
                    has_key[np.unique(rows)] = True
                    tsv, ts_ok, ts_ex = _epoch_i8(lf2[ts_col])
                    vf, vf_ok, vf_ex = _epoch_i8(m["__vf"])
                    vt, vt_ok, vt_ex = _epoch_i8(m["__vt"])
                    mixed = len({ts_ex, vf_ex, vt_ex}) > 1
                    _guard_mixed(tsv, ts_ok, ts_ex, mixed, f"fact {ts_col}")
                    _guard_mixed(vf, vf_ok, vf_ex, mixed, "dim valid_from")
                    _guard_mixed(vt, vt_ok, vt_ex, mixed, "dim valid_to")
                    tv = tsv[rows]
                    cov = vf_ok & vt_ok & (vf <= tv) & (tv < vt) & ts_ok[rows]
                    if cov.any():
                        covered[np.unique(rows[cov])] = True
                bad = ~covered
                if not bad.any():
                    return empty
                b = lf2[bad]
                # stage-A key identity (_key_strings via source dtypes)
                keys = render_violation_keys(b, key_cols, key_types)
                col_arr = pa.Array.from_pandas(b[col])
                vreprs = format_values(col_arr, np.arange(len(b)))
                reasons = np.where(
                    has_key[bad],
                    f"no {tfk.dim_name} version covers {ts_col}",
                    f"value not found in {tfk.dim_name}.{tfk.dim_key}",
                ).astype(object)
                return pd.DataFrame(
                    {
                        "partition_id": b["__pid"].to_numpy().astype("int32"),
                        "key": keys,
                        "constraint_name": tfk.name,
                        "column": col,
                        "reason": reasons,
                        "value_repr": np.array(vreprs, dtype=object),
                    }
                )

            viol = copartition_apply(src, dim_ds, col, "__dimk", shape)
            out_ds = viol if out_ds is None else out_ds.union(viol)
        return out_ds

    def _sequence_check_violations(
        self, source, pid_of_file: Dict[str, int]
    ) -> Optional["rd.Dataset"]:
        """Stage B3 — per-key ORDERED-STREAM constraints (``SequenceCheck``):
        the cross-partition sequence properties the streaming stage-A pass
        cannot see (the reference's lazy mode SKIPS cross-subtree
        constraints for the same reason, ``elements.py:547-549``). One
        co-locating hash exchange per check over the PRUNED projection
        (group + order + checked + violation-key columns), then a
        vectorized sort + shift compare per partition — group streams
        arrive whole, so no second exchange. The violation is the LATER
        row of each offending adjacent pair, shaped exactly like stage A
        rows (spec key identity, file-lineage partition attribution), so
        sinks and verdict roll-up need no new cases."""
        from xmlschema_ray.engine.row_validator import (
            format_values,
            render_violation_keys,
        )
        from xmlschema_ray.ops.relational import hash_partition_apply

        key_cols = list(self.spec.key_columns)
        key_types = self._key_types_of(source, key_cols)
        pid_ref = ray.put(pid_of_file)
        out_ds: Optional[rd.Dataset] = None

        def seq_vals(s: pd.Series):
            """(values, non-null mask, exact-int flag); timestamps compare
            as int64 microseconds (DuckDB's unit). pd.api.types checks
            first — numpy's issubdtype chokes on pandas extension dtypes
            (nullable Int64)."""
            ok = s.notna().to_numpy()
            if pd.api.types.is_datetime64_any_dtype(s.dtype):
                return s.to_numpy(dtype="datetime64[us]").view("int64"), ok, True
            if pd.api.types.is_integer_dtype(s.dtype):
                return s.fillna(0).to_numpy(np.int64), ok, True
            return s.astype("float64").to_numpy(np.float64), ok, False

        for sc in self.spec.sequence_checks:
            need = sorted(
                set(key_cols)
                | set(sc.group_by)
                | set(sc.order_by)
                | {sc.column}
                | ({sc.end_column} if sc.end_column is not None else set())
            )

            src = rd.read_parquet(
                source, columns=self._phys_read_cols(need), include_paths=True
            ).map_batches(
                self._make_attach_pid(pid_ref, need), batch_format="pyarrow"
            )

            def find_viols(part: pd.DataFrame, sc=sc, key_types=key_types) -> pd.DataFrame:
                p = part.sort_values(
                    list(sc.group_by) + list(sc.order_by), kind="mergesort"
                ).reset_index(drop=True)
                same = np.zeros(len(p), dtype=bool)
                if len(p) > 1:
                    same[1:] = True
                    for g in sc.group_by:
                        same[1:] &= p[g].iloc[1:].to_numpy() == p[g].iloc[:-1].to_numpy()
                vals, ok, exact = seq_vals(p[sc.column])
                prev = np.roll(vals, 1)
                pair = same & ok & np.roll(ok, 1)
                prevcov = None
                if sc.kind == "strictly_increasing":
                    bad = pair & (vals <= prev)
                elif sc.kind == "non_decreasing":
                    bad = pair & (vals < prev)
                elif sc.kind == "max_gap":
                    bad = pair & ((vals - prev) > sc.max_gap)
                else:  # no_overlap — interval sweep in start order
                    ends, ok_e, _ = seq_vals(p[sc.end_column])
                    valid = ok & ok_e
                    # coverage = per-group RUNNING MAX of earlier valid
                    # ends (a long early interval can cover a later short
                    # one an adjacent-pair compare would miss); the
                    # sentinel keeps null-end rows from contributing.
                    # groupby.cummax on int64 stays int64 — no float
                    # round-trip, so µs timestamps compare exactly.
                    sentinel = np.iinfo(np.int64).min if exact else -np.inf
                    cover = np.where(valid, ends, sentinel)
                    grp_id = np.cumsum(~same)
                    cm = (
                        pd.Series(cover)
                        .groupby(grp_id)
                        .cummax()
                        .to_numpy()
                    )
                    prevcov = np.roll(cm, 1)
                    bad = same & valid & (prevcov != sentinel) & (vals < prevcov)
                if not bad.any():
                    return pd.DataFrame(
                        {f.name: pd.Series([], dtype=object) for f in VIOLATION_SCHEMA}
                    ).astype({"partition_id": "int32"})
                b = p[bad]
                # stage-A key identity (_key_strings via source dtypes)
                keys = render_violation_keys(b, key_cols, key_types)
                vreprs = format_values(pa.Array.from_pandas(b[sc.column]), np.arange(len(b)))
                if sc.kind == "max_gap":
                    gaps = (vals - prev)[bad]
                    reasons = [
                        f"gap {int(g) if exact else g} exceeds max_gap {sc.max_gap}"
                        for g in gaps
                    ]
                elif sc.kind == "no_overlap":
                    reasons = [
                        f"start {int(s) if exact else s} overlaps earlier "
                        f"interval ending at {int(c) if exact else c}"
                        for s, c in zip(vals[bad], prevcov[bad])
                    ]
                else:
                    pv = prev[bad]
                    reasons = [
                        f"{sc.kind} violated (previous value "
                        f"{int(x) if exact else x})"
                        for x in pv
                    ]
                return pd.DataFrame(
                    {
                        "partition_id": b["__pid"].to_numpy().astype("int32"),
                        "key": keys,
                        "constraint_name": sc.name,
                        "column": sc.column,
                        "reason": np.array(reasons, dtype=object),
                        "value_repr": np.array(vreprs, dtype=object),
                    }
                )

            viol = hash_partition_apply(src, list(sc.group_by), find_viols)
            out_ds = viol if out_ds is None else out_ds.union(viol)
        return out_ds

    def describe_plan(self) -> List[dict]:
        """PLAN VISIBILITY: the ordered physical stages this spec compiles
        to, each with its data-movement class — the EXPLAIN every
        capacity-planning question starts from ("how many all-to-all
        exchanges does this spec cost?"), derivable without touching data
        because the plan is a pure function of the spec. Exchange
        accounting matches the stage implementations (stage A is
        embarrassingly parallel; uniqueness ships keycount partials;
        B2/B3/B4 each declare their own exchanges; stats/drift/aggregate/
        manifest ride the mergeable stats channel at zero extra
        exchanges). Returned rows: {stage, what, exchanges, notes}."""
        plan: List[dict] = [
            {
                "stage": "A",
                "what": "per-batch validate (facets, row checks, occurs, "
                "type alternatives, broadcast keyrefs) + stats/keycount partials",
                "exchanges": 0,
                "notes": "streaming map over shards; unified single-sink stream",
            }
        ]
        if self.spec.unique_keys:
            plan.append(
                {
                    "stage": "B",
                    "what": f"global uniqueness ({len(self.spec.unique_keys)} keys): "
                    "hashed candidate sieve + exact key recovery",
                    "exchanges": 1,
                    "notes": "adaptive driver/distributed finalize at "
                    f"{self.driver_threshold_bytes >> 20} MiB keycount bytes",
                }
            )
        n_deferred_hint = sum(1 for _ in self.spec.foreign_keys)
        if self.spec.foreign_keys:
            plan.append(
                {
                    "stage": "B2",
                    "what": f"keyref ({n_deferred_hint} declared): broadcast "
                    "set membership; dims over "
                    f"{self.broadcast_fk_cap_bytes >> 20} MiB defer to a "
                    "distributed semi-join",
                    "exchanges": 0,
                    "notes": "deferred dims add 2 exchanges each at run time",
                }
            )
        for sc in self.spec.sequence_checks:
            plan.append(
                {
                    "stage": "B3",
                    "what": f"sequence check {sc.name!r}: per-{'/'.join(sc.group_by)} "
                    f"{sc.kind} over {sc.column!r}",
                    "exchanges": 1,
                    "notes": "co-locating hash exchange of the pruned projection",
                }
            )
        for rc in self.spec.reconcile_checks:
            plan.append(
                {
                    "stage": "B4",
                    "what": f"reconcile check {rc.name!r}: per-{rc.key} "
                    f"{rc.agg} vs {rc.dim_name}.{rc.expected}",
                    "exchanges": 2,
                    "notes": "key-combiner of (key,n,sum) partials + "
                    "copartition against the header projection",
                }
            )
        for tfk in self.spec.temporal_foreign_keys:
            plan.append(
                {
                    "stage": "B5",
                    "what": f"temporal keyref {tfk.name!r}: {tfk.column}@"
                    f"{tfk.ts_column} covered by {tfk.dim_name} versions",
                    "exchanges": 1,
                    "notes": "copartition of the pruned fact projection with "
                    "the dim's version rows; containment folded per fact row",
                }
            )
        stat_bits = []
        if self.spec.stats_columns:
            stat_bits.append(f"stats({len(self.spec.stats_columns)} cols)")
        if self.spec.distinct_columns:
            stat_bits.append(f"HLL({len(self.spec.distinct_columns)} cols)")
        if self.spec.drift:
            stat_bits.append(f"drift({len(self.spec.drift)} gates)")
        if self.spec.aggregate_checks:
            stat_bits.append(f"aggregate_checks({len(self.spec.aggregate_checks)})")
        if self.spec.manifest_checks:
            stat_bits.append(f"manifest_checks({len(self.spec.manifest_checks)})")
        if stat_bits:
            plan.append(
                {
                    "stage": "D",
                    "what": "driver fold of the mergeable stats channel: "
                    + ", ".join(stat_bits),
                    "exchanges": 0,
                    "notes": "group-cardinality partials ride the stage-A stream",
                }
            )
        plan.append(
            {
                "stage": "E",
                "what": "canonical violation sort + verdict/summary writes",
                "exchanges": 1,
                "notes": "result-sized; skipped in stats_only mode",
            }
        )
        return plan

    def _reconcile_check_violations(
        self, source, dims: Dict[str, Union[str, pa.Table]]
    ) -> Optional["rd.Dataset"]:
        """Stage B4 — per-KEY header/detail reconciliation
        (``ReconcileCheck``): the fact-scale totals check ``ManifestCheck``
        cannot serve (its dim is group-cardinality and loads driver-side;
        here the header carries one expected value per JOIN KEY, so
        neither side broadcasts). Per check: per-batch (key, n, sum)
        partials over the PRUNED detail projection → one key-combiner
        exchange; the observed aggregates then meet the header projection
        through one co-partitioning exchange and compare per partition —
        detail rows never move, the header moves once. Sums are per-row
        scaled integers (see the spec class), so the compare is
        integer-exact at any parallelism. Violations are key-level
        (``partition_id = -1`` — a cross-file aggregate has no single-file
        lineage), shaped like stage-A rows for the shared sink/verdicts."""
        from xmlschema_ray.ops.relational import (
            combiner_aggregate,
            copartition_apply,
            hash_partition_apply,  # noqa: F401  (kept for plan symmetry refs)
        )

        out_ds: Optional[rd.Dataset] = None
        for rc in self.spec.reconcile_checks:
            if rc.dim_name not in dims:
                raise ValueError(
                    f"reconcile check {rc.name!r}: header table {rc.dim_name!r} "
                    "not provided in dims"
                )
            dim = dims[rc.dim_name]
            hdr_cols = [rc.dim_key, rc.expected]
            if isinstance(dim, str):
                hdr = rd.read_parquet(_resolve_files(dim), columns=hdr_cols)
            else:
                hdr = rd.from_arrow(dim.select(hdr_cols))
            need = [rc.key] + ([rc.column] if rc.column is not None else [])
            det = rd.read_parquet(source, columns=need)

            def partial(batch: pd.DataFrame, rc=rc) -> pd.DataFrame:
                k = batch[rc.key]
                if rc.agg == "count":
                    s = np.ones(len(batch), dtype=np.int64)
                else:
                    v = batch[rc.column].to_numpy(np.float64)
                    s = np.floor(v * rc.scale + 0.5).astype(np.int64)
                    # null detail values contribute 0 to the scaled sum
                    s[~batch[rc.column].notna().to_numpy()] = 0
                g = pd.DataFrame({"__k": k, "n": np.ones(len(batch), dtype=np.int64), "s": s})
                return g.groupby("__k", as_index=False)[["n", "s"]].sum()

            agg = combiner_aggregate(
                det.map_batches(partial, batch_format="pandas"),
                "__k",
                {"n": ("n", "sum"), "s": ("s", "sum")},
            )

            def compare(lf: pd.DataFrame, rf: pd.DataFrame, rc=rc) -> pd.DataFrame:
                cols = {f.name: pd.Series([], dtype=object) for f in VIOLATION_SCHEMA}
                empty = pd.DataFrame(cols).astype({"partition_id": "int32"})
                if len(lf) == 0 and len(rf) == 0:
                    return empty
                l2 = (
                    lf.rename(columns={"__k": "k"})
                    if len(lf)
                    else pd.DataFrame(
                        {
                            "k": pd.Series([], dtype=object),
                            "n": pd.Series([], dtype=np.int64),
                            "s": pd.Series([], dtype=np.int64),
                        }
                    )
                )
                r2 = (
                    rf.rename(columns={rc.dim_key: "k"})
                    if len(rf)
                    else pd.DataFrame(
                        {
                            "k": pd.Series([], dtype=object),
                            rc.expected: pd.Series([], dtype=np.float64),
                        }
                    )
                )
                m = l2.merge(r2, on="k", how="outer", indicator="side")
                # fully vectorized over the key-cardinality frame; Python
                # touches only the VIOLATION-sized subsets (string assembly)
                side = m["side"].to_numpy(object)
                keys = m["k"].astype(str).to_numpy(object)
                n_arr = m["n"].to_numpy(np.float64)
                s_arr = m["s"].to_numpy(np.float64)
                exp_f = m[rc.expected].to_numpy(np.float64)
                frames: List[pd.DataFrame] = []

                def shape(idx, cname, col, reasons, vreprs):
                    return pd.DataFrame(
                        {
                            "partition_id": np.full(len(idx), -1, dtype=np.int32),
                            "key": keys[idx],
                            "constraint_name": cname,
                            "column": col,
                            "reason": np.array(reasons, dtype=object),
                            "value_repr": np.array(vreprs, dtype=object),
                        }
                    )

                if rc.check_orphan_details:
                    idx = np.flatnonzero(side == "left_only")
                    if len(idx):
                        ns = n_arr[idx].astype(np.int64)
                        frames.append(
                            shape(
                                idx,
                                f"{rc.name}.orphan_details",
                                rc.key,
                                [
                                    f"{int(nn)} detail rows for key absent from "
                                    f"header {rc.dim_name!r}"
                                    for nn in ns
                                ],
                                [str(int(nn)) for nn in ns],
                            )
                        )
                exp_scaled = np.zeros(len(m), dtype=np.int64)
                has_exp = side != "left_only"
                exp_scaled[has_exp] = np.floor(
                    exp_f[has_exp] * rc.scale + 0.5
                ).astype(np.int64)
                if rc.check_missing_details:
                    idx = np.flatnonzero(side == "right_only")
                    if len(idx):
                        frames.append(
                            shape(
                                idx,
                                f"{rc.name}.missing_details",
                                rc.key,
                                [
                                    f"header expects {int(e)}, observed no detail rows"
                                    for e in exp_scaled[idx]
                                ],
                                [""] * len(idx),
                            )
                        )
                both = side == "both"
                obs = (n_arr if rc.agg == "count" else s_arr)
                obs_i = np.zeros(len(m), dtype=np.int64)
                obs_i[both] = obs[both].astype(np.int64)
                bad = both & (np.abs(obs_i - exp_scaled) > rc.tolerance)
                idx = np.flatnonzero(bad)
                if len(idx):
                    tol = f" (tolerance {rc.tolerance})" if rc.tolerance else ""
                    frames.append(
                        shape(
                            idx,
                            f"{rc.name}.mismatch",
                            rc.column if rc.column is not None else rc.key,
                            [
                                f"observed {rc.agg} {int(o)} != expected {int(e)}{tol}"
                                for o, e in zip(obs_i[idx], exp_scaled[idx])
                            ],
                            [str(int(o)) for o in obs_i[idx]],
                        )
                    )
                if not frames:
                    return empty
                out = pd.concat(frames, ignore_index=True)
                out["partition_id"] = out["partition_id"].astype("int32")
                return out

            viol = copartition_apply(agg, hdr, "__k", rc.dim_key, compare)
            out_ds = viol if out_ds is None else out_ds.union(viol)
        return out_ds

    # -- schema precheck (partition-level) --------------------------------

    def _schema_violations(self, partition_id: int, files: List[str]) -> List[dict]:
        """Metadata-only schema conformance check per shard.

        The analog of required-attribute presence + type-instance checks
        (``validators/attributes.py:578-581``, ``simple_types.py:504-506``)
        and of the strict wildcard policy for unknown columns
        (``validators/wildcards.py:215-233``).
        """
        out: List[dict] = []
        seen: set = set()
        for f in files:
            fschema = pq.read_schema(f)
            names = set(fschema.names)
            for c in self.spec.columns:
                vkey = None
                if c.required and c.name not in names:
                    vkey = (f"schema.required_column", c.name, f"required column missing in {os.path.basename(f)}")
                elif c.name in names and fschema.field(c.name).type != c.dtype:
                    vkey = (
                        "schema.dtype",
                        c.name,
                        f"dtype {fschema.field(c.name).type} != declared {c.dtype} in {os.path.basename(f)}",
                    )
                if vkey and vkey not in seen:
                    seen.add(vkey)
                    out.append(
                        {
                            "partition_id": partition_id,
                            "key": "",
                            "constraint_name": vkey[0],
                            "column": vkey[1],
                            "reason": vkey[2],
                            "value_repr": "",
                        }
                    )
            if not self.spec.allow_extra_columns:
                known = {c.name for c in self.spec.columns}
                for extra in sorted(names - known):
                    vkey = ("schema.unexpected_column", extra, f"unexpected column in {os.path.basename(f)}")
                    if vkey not in seen:
                        seen.add(vkey)
                        out.append(
                            {
                                "partition_id": partition_id,
                                "key": "",
                                "constraint_name": vkey[0],
                                "column": vkey[1],
                                "reason": vkey[2],
                                "value_repr": "",
                            }
                        )
        return out

    # -- main entry -------------------------------------------------------

    def run(
        self,
        source: Union[str, Sequence[str], "rd.Dataset"],
        out_dir: str,
        dims: Optional[Dict[str, Union[str, pa.Table]]] = None,
        mode: str = "collect",
        resume: bool = True,
        repair_out: Optional[str] = None,
        repair_defaults: Optional[Dict] = None,
        quarantine_out: Optional[str] = None,
        clean_out: Optional[str] = None,
        sample_mod: Optional[int] = None,
    ) -> ValidationResult:
        """Validate ``source`` into ``out_dir``; see class docstring.

        ``sample_mod``: CANARY mode — validate only the deterministic
        key-hash sample ``hash64(key) % sample_mod == 0`` (~1/sample_mod
        of the corpus at 1/sample_mod of the cost). Sampling is BY KEY,
        so every sampled key's rows are all in: uniqueness and keyref
        findings over the sampled key space are EXACT, and any violation
        found is real. Verdict semantics are honestly PSVI-partial:
        ``validation_attempted='partial'`` everywhere, and a partition
        with no findings reports ``notKnown``, never ``valid`` — a
        sample can convict, not acquit. Constraint families with
        whole-group or whole-corpus totals semantics (sequence,
        reconcile, aggregate, manifest checks and drift gates) REFUSE
        under sampling rather than silently mis-reporting on partial
        groups; repair/quarantine splits refuse too (a partial split
        would silently drop unsampled rows).

        ``repair_out``: additionally rewrite the corpus canonicalized
        under this engine's spec (whiteSpace normal forms,
        ``repair_defaults`` filled, canonical dtypes) into a resumable
        partitioned sink at that path — the encoder direction
        (``engine/encode.py``, reference ``documents.py:109-196``). Runs
        AFTER validation so the verdicts describe the input as received.
        File-based sources only (a Dataset source has no re-readable
        lineage for the resumable rewrite) — raises rather than no-ops.
        """
        if sample_mod is not None:
            if sample_mod < 2:
                raise ValueError("sample_mod must be >= 2 or None")
            incompatible = [
                label
                for label, items in (
                    ("sequence_checks", self.spec.sequence_checks),
                    ("reconcile_checks", self.spec.reconcile_checks),
                    ("aggregate_checks", self.spec.aggregate_checks),
                    ("manifest_checks", self.spec.manifest_checks),
                    # profile-only drift (no reference) just records the
                    # sampled histograms; a GATING drift entry would compare
                    # sampled counts against full-corpus references
                    (
                        "drift",
                        [
                            d
                            for d in self.spec.drift
                            if d.reference_hist is not None or d.group_references
                        ],
                    ),
                )
                if items
            ]
            if incompatible:
                raise ValueError(
                    f"sample_mod: {incompatible} have whole-group/whole-corpus "
                    "totals semantics a key-hash sample breaks — run them unsampled"
                )
            if repair_out is not None or quarantine_out is not None or clean_out is not None:
                raise ValueError(
                    "sample_mod: repair/quarantine/clean splits refuse under "
                    "sampling (a partial split would silently drop unsampled rows)"
                )
            if resume:
                raise ValueError(
                    "sample_mod requires resume=False — a sampled shard in the "
                    "resume manifest would be mistaken for a fully-validated one"
                )
        # sampled and full runs may NEVER share an out_dir: a sampled run's
        # shard records would otherwise satisfy a later full run's resume
        # manifest (sampled parquet read back as complete validation). A
        # marker file makes the refusal stick across processes, both ways.
        sample_marker = os.path.join(out_dir, "SAMPLED.json")
        if sample_mod is not None:
            os.makedirs(out_dir, exist_ok=True)
            with open(sample_marker, "w") as fh:
                json.dump({"sample_mod": sample_mod}, fh)
        elif os.path.exists(sample_marker):
            raise ValueError(
                f"out_dir {out_dir!r} holds a CANARY (sampled) run's artifacts "
                "(SAMPLED.json); a full run must use a fresh out_dir"
            )
        if isinstance(source, rd.Dataset) and (
            repair_out is not None or quarantine_out is not None or clean_out is not None
        ):
            raise ValueError(
                "repair_out/quarantine_out/clean_out require a file-based source "
                "(a Dataset source has no re-readable shard lineage for the "
                "resumable rewrite); call normalize_rewrite / quarantine_split "
                "on the files directly"
            )
        os.makedirs(out_dir, exist_ok=True)
        manifest = ckpt.Manifest(out_dir)
        done = manifest.load() if resume else {}

        if isinstance(source, rd.Dataset):
            # direct-Dataset path: single logical shard, no file lineage
            shards: List[Optional[List[str]]] = [None]
            ds_direct: Optional[rd.Dataset] = source
        else:
            files = _resolve_files(source)
            if not files:
                raise FileNotFoundError(f"no parquet inputs under {source!r}")
            n_shards = self.n_shards
            if n_shards is None:
                # shards are RESUME units processed one pipeline at a time:
                # few enough that each shard saturates the cluster, fine
                # enough that a mid-run failure skips completed work —
                # ~8 GiB of input per shard, clamped to [1, 64]
                total = sum(map(os.path.getsize, files))
                n_shards = min(64, max(1, -(-total // (8 << 30))))
            shards = _chunk(files, n_shards)
            ds_direct = None

        fk_sets, deferred_fks = (
            self._load_fk_sets(dims or {}) if self.spec.foreign_keys else ({}, [])
        )
        manifests = (
            self._load_manifests(dims or {}) if self.spec.manifest_checks else {}
        )
        if deferred_fks and ds_direct is not None:
            raise ValueError(
                "distributed keyref (dim over broadcast_fk_cap_bytes) requires a "
                "file-based source — a Dataset source would re-execute per keyref"
            )
        if self.spec.sequence_checks and ds_direct is not None:
            raise ValueError(
                "sequence checks (stage B3) require a file-based source — a "
                "Dataset source has no re-readable lineage for the ordered pass"
            )
        if self.spec.reconcile_checks and ds_direct is not None:
            raise ValueError(
                "reconcile checks (stage B4) require a file-based source — a "
                "Dataset source would re-execute for the reconciliation pass"
            )
        if self.spec.reconcile_checks:
            for rc in self.spec.reconcile_checks:
                if rc.dim_name not in (dims or {}):
                    raise ValueError(
                        f"reconcile check {rc.name!r}: header table "
                        f"{rc.dim_name!r} not provided in dims"
                    )
        if self.spec.temporal_foreign_keys:
            if ds_direct is not None:
                raise ValueError(
                    "temporal foreign keys (stage B5) require a file-based "
                    "source — a Dataset source would re-execute per check"
                )
            for tfk in self.spec.temporal_foreign_keys:
                if tfk.dim_name not in (dims or {}):
                    raise ValueError(
                        f"temporal foreign key {tfk.name!r}: dim table "
                        f"{tfk.dim_name!r} not provided"
                    )
        fk_ref = ray.put(fk_sets) if fk_sets else None

        concurrency = self.concurrency
        if concurrency is None:
            concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)

        schema_viols: List[dict] = []
        verdict_by_pid: Dict[int, V.PartitionVerdict] = {}

        for pid, shard in enumerate(shards):
            if shard is not None:
                schema_viols.extend(self._schema_violations(pid, shard))
            if pid in done:
                rec = done[pid]
                v = V.PartitionVerdict(pid, n_rows=rec.n_rows)
                v.mark(rec.n_violations)
                verdict_by_pid[pid] = v
                continue
            t0 = time.time()
            if ds_direct is not None:
                ds = ds_direct
            else:
                cols = self._readable_columns(shard)
                ds = rd.read_parquet(shard, columns=cols)
            rv_kwargs = dict(
                spec=self.spec,
                partition_id=pid,
                mode=mode,
                fk_sets_ref=fk_ref,
                max_violations_per_batch=self.max_violations_per_batch,
                sample_mod=sample_mod,
            )
            if self.use_actors:
                unified = ds.map_batches(
                    RowValidator,
                    fn_constructor_kwargs=rv_kwargs,
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                    batch_size=self.batch_size,
                    concurrency=concurrency,
                )
            else:
                from xmlschema_ray.engine.row_validator import make_validator_fn

                unified = ds.map_batches(
                    make_validator_fn(**rv_kwargs),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                    batch_size=self.batch_size,
                )
            _t = time.time()
            ckpt.write_shard_atomic(unified, out_dir, pid)
            _t = _mark(f"stageA shard {pid}", _t)
            n_rows, n_viol, chash = self._shard_counts(out_dir, pid)
            _t = _mark(f"shard_counts {pid}", _t)
            v = V.PartitionVerdict(pid, n_rows=n_rows)
            if mode == "stats_only":
                v.validation_attempted = V.NONE
            v.mark(n_viol)
            verdict_by_pid[pid] = v
            if shard is not None:
                manifest.append(
                    ckpt.ShardRecord(
                        partition_id=pid,
                        input_files=shard,
                        n_rows=n_rows,
                        n_violations=n_viol,
                        wall_sec=round(time.time() - t0, 3),
                        content_hash=chash,
                    )
                )

        all_files = (
            [f for shard in shards for f in shard] if ds_direct is None else ds_direct
        )
        pid_of_file = (
            {f: pid for pid, shard in enumerate(shards) if shard for f in shard}
            if ds_direct is None
            else {}
        )
        result = self._finalize(
            out_dir,
            schema_viols,
            verdict_by_pid,
            mode,
            all_files,
            deferred_fks=deferred_fks,
            pid_of_file=pid_of_file,
            manifests=manifests,
            reconcile_dims=dims or {},
            sample_mod=sample_mod,
        )
        if repair_out is not None and ds_direct is None:
            from xmlschema_ray.engine.encode import normalize_rewrite

            normalize_rewrite(
                all_files, self.spec, repair_out, defaults=repair_defaults, resume=resume
            )
        if (quarantine_out is not None or clean_out is not None) and ds_direct is None:
            # dead-letter routing needs EVERY violating row identified —
            # a capped materialization dropped some keys, so refuse rather
            # than quarantine an incomplete set
            if result.summary.get("violations_truncated"):
                raise ValueError(
                    "quarantine/clean split requires uncapped violation "
                    "materialization (viol_overflow records present — raise "
                    "max_violations and re-run)"
                )
            from xmlschema_ray.engine.encode import quarantine_split

            v = result.violations()
            warn_set = set(self.spec.warning_constraints)
            row_level = v[
                v["key"].notna()
                & (v["partition_id"] >= 0)
                & ~v["constraint_name"].isin(warn_set)
            ]
            quarantine_split(
                all_files,
                self.spec,
                row_level["key"].unique(),
                quarantine_out=quarantine_out,
                clean_out=clean_out,
                resume=resume,
            )
        return result

    def _readable_columns(self, shard: List[str]) -> List[str]:
        """Prune the read to spec columns present in every shard file."""
        wanted = [c.name for c in self.spec.columns]
        present = None
        for f in shard:
            names = set(pq.read_schema(f).names)
            present = names if present is None else (present & names)
        return [c for c in wanted if c in (present or set())]

    def _shard_counts(self, out_dir: str, pid: int) -> tuple:
        """Cheap driver-side counts + violation content hash from the
        written shard (column-pruned scans)."""
        sd = ckpt.shard_dir(out_dir, pid)
        if not any(f.endswith(".parquet") for f in os.listdir(sd)):
            return 0, 0, ""
        d = pads.dataset(sd)
        t = d.to_table(columns=["record_kind", "count"])
        kinds = t["record_kind"]
        n_viol = int(pc.sum(pc.cast(pc.equal(kinds, "violation"), pa.int64())).as_py() or 0)
        # capped-materialization overflow records carry the exact count of
        # violation rows that were NOT materialized (see RowValidator)
        n_viol += int(
            pc.sum(t.filter(pc.equal(kinds, "viol_overflow"))["count"]).as_py() or 0
        )
        stats_counts = t.filter(pc.equal(kinds, "stats"))["count"]
        n_rows = int(pc.sum(stats_counts).as_py() or 0)
        chash = ""
        if n_viol:
            vt = d.to_table(
                columns=["key", "constraint_name", "column"],
                filter=pads.field("record_kind") == "violation",
            )
            chash = ckpt.content_hash(
                list(zip(*(vt[c].to_pylist() for c in ("key", "constraint_name", "column"))))
            )
        return n_rows, n_viol, chash

    # -- dup key recovery -------------------------------------------------

    def _recover_dup_keys(self, source, cand_pdf: pd.DataFrame) -> pd.DataFrame:
        """Exact duplicated-key materialization from candidate hashes.

        Rescans ONLY the unique-key columns of the input, keeps rows whose
        key hashes into the candidate set (broadcast — it contains only
        keys whose hash-count exceeded 1), counts the actual values, and
        keeps ``count > 1``. This second pass is what makes the hashed
        keycount channel exact: a 64-bit collision can only create a false
        CANDIDATE, never a false violation.
        """
        from xmlschema_ray.engine.row_validator import (
            augment_struct_keys,
            unique_key_column,
        )
        from xmlschema_ray.engine.stats import hash64, isin_sorted

        out_cols = ["constraint_name", "column", "key", "total", "first_pid"]
        frames: List[pd.DataFrame] = []
        dotted = self.spec.dotted_key_paths()
        for uk in self.spec.unique_keys:
            sub = cand_pdf[cand_pdf["constraint_name"] == uk.name] if len(cand_pdf) else cand_pdf
            if not len(sub):
                continue
            cand_hashes = np.sort(np.asarray(sub["key_hash"], dtype=np.uint64))
            pid_of = dict(zip(sub["key_hash"].astype(np.uint64), sub["first_pid"]))
            ukcols = list(uk.columns)
            phys = self._phys_read_cols(ukcols)

            if isinstance(source, list) and sum(map(os.path.getsize, source)) < min(256 * 1024 * 1024, self.driver_threshold_bytes):
                tbl = pads.dataset(source).to_table(columns=phys)
                if dotted:
                    tbl = augment_struct_keys(tbl, dotted)
                keycol = unique_key_column(tbl, ukcols).drop_null()
                vals = keycol.to_numpy(zero_copy_only=False)
                m = isin_sorted(hash64(vals), cand_hashes)
                uniq, cnt = np.unique(vals[m], return_counts=True)
            else:
                cand_ref = ray.put(cand_hashes)
                state: dict = {}

                def count_matching(batch: pa.Table) -> pa.Table:
                    ch = state.get("ch")
                    if ch is None:
                        ch = state["ch"] = ray.get(cand_ref)
                    if dotted:
                        batch = augment_struct_keys(batch, dotted)
                    keycol = unique_key_column(batch, ukcols).drop_null()
                    v = keycol.to_numpy(zero_copy_only=False)
                    mm = isin_sorted(hash64(v), ch)
                    u, c = np.unique(v[mm], return_counts=True)
                    return pa.table(
                        {"key": pa.array(u, type=pa.string()), "partial": pa.array(c, type=pa.int64())}
                    )

                if isinstance(source, list):
                    ds = rd.read_parquet(source, columns=phys)
                else:
                    ds = source
                partials = ds.map_batches(
                    count_matching, batch_format="pyarrow", zero_copy_batch=True
                ).to_pandas()
                agg = partials.groupby("key", sort=False)["partial"].sum()
                uniq, cnt = agg.index.to_numpy(dtype=object), agg.to_numpy()

            keep = cnt > 1
            uniq, cnt = uniq[keep], cnt[keep]
            if not len(uniq):
                continue
            h_kept = hash64(np.asarray(uniq, dtype=object))
            frames.append(
                pd.DataFrame(
                    {
                        "constraint_name": uk.name,
                        "column": ",".join(ukcols),
                        "key": uniq,
                        "total": cnt,
                        "first_pid": [int(pid_of.get(h, 0)) for h in h_kept],
                    }
                )
            )
        if not frames:
            return pd.DataFrame(columns=out_cols)
        return pd.concat(frames, ignore_index=True)

    # -- global phase -----------------------------------------------------

    def _finalize(
        self,
        out_dir: str,
        schema_viols: List[dict],
        verdict_by_pid: Dict[int, V.PartitionVerdict],
        mode: str,
        source=None,
        deferred_fks: Optional[List[tuple]] = None,
        pid_of_file: Optional[Dict[str, int]] = None,
        manifests: Optional[Dict[str, pa.Table]] = None,
        reconcile_dims: Optional[Dict[str, Union[str, pa.Table]]] = None,
        sample_mod: Optional[int] = None,
    ) -> ValidationResult:
        unified_dir = os.path.join(out_dir, "unified")

        # stage B2: distributed keyref for over-cap dims (see
        # _deferred_fk_violations) — built lazily, unioned into the sink
        bigfk_viol_ds = None
        if deferred_fks and mode != "stats_only" and isinstance(source, list):
            bigfk_viol_ds = self._deferred_fk_violations(
                source, deferred_fks, pid_of_file or {}, sample_mod=sample_mod
            )
        # stage B3: per-key ordered-stream constraints — same lazy-union
        # plumbing as B2 (the downstream adaptive sink handles both)
        if self.spec.sequence_checks and mode != "stats_only" and isinstance(source, list):
            seq_ds = self._sequence_check_violations(source, pid_of_file or {})
            if seq_ds is not None:
                bigfk_viol_ds = (
                    seq_ds if bigfk_viol_ds is None else bigfk_viol_ds.union(seq_ds)
                )
        # stage B4: per-key header/detail reconciliation — same lazy-union
        # plumbing as B2/B3
        if self.spec.reconcile_checks and mode != "stats_only" and isinstance(source, list):
            rec_ds = self._reconcile_check_violations(source, reconcile_dims or {})
            if rec_ds is not None:
                bigfk_viol_ds = (
                    rec_ds if bigfk_viol_ds is None else bigfk_viol_ds.union(rec_ds)
                )
        # stage B5: temporal (SCD2) keyref — same lazy-union plumbing
        if (
            self.spec.temporal_foreign_keys
            and mode != "stats_only"
            and isinstance(source, list)
        ):
            tfk_ds = self._temporal_fk_violations(
                source, reconcile_dims or {}, pid_of_file or {}, sample_mod=sample_mod
            )
            if tfk_ds is not None:
                bigfk_viol_ds = (
                    tfk_ds if bigfk_viol_ds is None else bigfk_viol_ds.union(tfk_ds)
                )

        # stage B: global uniqueness over the pre-aggregated keycounts —
        # built LAZILY and unioned into the violations sink so the whole
        # finalize is one Ray execution. Hash-partitioned vectorized merge
        # (see ops.relational.hash_partition_apply for why Ray's native
        # aggregate is avoided); the shuffle moves one row per distinct key
        # per batch — a hot key (skew) is already collapsed per block by
        # the stage-A value_counts.
        _t = time.time()
        unified_has_data = _dir_bytes(unified_dir) > 0
        dup_viol_ds = None
        if self.spec.unique_keys and mode != "stats_only" and unified_has_data:
            from xmlschema_ray.ops.relational import hash_partition_apply

            def shape_dup_rows(g: pd.DataFrame) -> pa.Table:
                return pa.table(
                    {
                        "partition_id": pa.array(g["first_pid"], type=pa.int32()),
                        "key": pa.array(g["key"], type=pa.string()),
                        "constraint_name": pa.array(g["constraint_name"], type=pa.string()),
                        "column": pa.array(g["column"], type=pa.string()),
                        "reason": pa.array(
                            [f"duplicate value (count={int(t)})" for t in g["total"]],
                            type=pa.string(),
                        ),
                        "value_repr": pa.array(g["key"], type=pa.string()),
                    },
                    schema=VIOLATION_SCHEMA,
                )

            # Phase 1 — CANDIDATE duplicated key hashes: aggregate the
            # uint64 keycount partials. Adaptive physical plan (like
            # broadcast-vs-shuffle join selection): below the threshold one
            # driver-side column-pruned scan + Arrow's multithreaded C++
            # int hash-aggregate beats a distributed shuffle's fixed cost;
            # above it, the hash-partitioned shuffle merge runs.
            gkeys = ["constraint_name", "key_hash"]
            kc_bytes = _dir_bytes(unified_dir)
            if kc_bytes < self.driver_threshold_bytes:
                # sort-based candidate sieve instead of a generic hash
                # aggregate: candidates (total>1) are either a hash seen in
                # >=2 partial rows (adjacent after an O(n log n) uint64
                # sort) or a single partial with count>1 — then totals and
                # first_pid are computed only over the (tiny) candidate row
                # subset. ~2.5x faster than TableGroupBy on the string-keyed
                # 8M-row partial stream, and the constraint_name string
                # column isn't even read when the spec has one unique key.
                single = len(self.spec.unique_keys) == 1
                cols = ["partition_id", "key_hash", "count"] + (
                    [] if single else ["constraint_name"]
                )
                kct = pads.dataset(unified_dir).to_table(
                    columns=cols, filter=pads.field("record_kind") == "keycount"
                )
                if single:
                    groups = [(self.spec.unique_keys[0].name, kct)]
                else:
                    groups = [
                        (n, kct.filter(pc.equal(kct["constraint_name"], n)))
                        for n in pc.unique(kct["constraint_name"]).to_pylist()
                    ]
                frames = []
                for name, sub in groups:
                    h = sub["key_hash"].to_numpy(zero_copy_only=False)
                    cnts = sub["count"].to_numpy(zero_copy_only=False)
                    hs = np.sort(h)
                    adj = hs[1:][hs[1:] == hs[:-1]]
                    cand = np.unique(np.concatenate([adj, h[cnts > 1]]))
                    if not cand.size:
                        continue
                    from xmlschema_ray.engine.stats import isin_sorted

                    m = isin_sorted(h, cand)
                    pid = sub["partition_id"].to_numpy(zero_copy_only=False)
                    gb = pd.DataFrame(
                        {"key_hash": h[m], "count": cnts[m], "pid": pid[m]}
                    ).groupby("key_hash", sort=False)
                    out = pd.DataFrame(
                        {"total": gb["count"].sum(), "first_pid": gb["pid"].min()}
                    ).reset_index()
                    out.insert(0, "constraint_name", name)
                    frames.append(out)
                cand_pdf = (
                    pd.concat(frames, ignore_index=True)
                    if frames
                    else pd.DataFrame(columns=["constraint_name", "key_hash", "total", "first_pid"])
                )
            else:
                from xmlschema_ray.ops.relational import hash_partition_apply

                kc = rd.read_parquet(
                    unified_dir,
                    columns=["record_kind", "partition_id", "key_hash", "constraint_name", "count"],
                    filter=(pc.field("record_kind") == "keycount"),
                )

                def consolidate(b: pd.DataFrame) -> pd.DataFrame:
                    # key-AGNOSTIC combining pass before the key shuffle
                    # (the skew defense the north-star's "explicit skew
                    # salting" calls for, in its high-cardinality form): a
                    # pathological key present in every stage-A batch emits
                    # #batches partial rows; merging within arbitrary 64k
                    # blocks collapses them by the blocking factor no
                    # matter which key is hot, so no single reducer
                    # partition can be handed a fact-sized group. See
                    # ops.relational.combiner_aggregate(consolidate=True).
                    gb = b.groupby(gkeys, sort=False)
                    return pd.DataFrame(
                        {"count": gb["count"].sum(), "partition_id": gb["partition_id"].min()}
                    ).reset_index()

                def merge_counts(g: pd.DataFrame) -> pd.DataFrame:
                    gb = g.groupby(gkeys, sort=False)
                    out = pd.DataFrame(
                        {"total": gb["count"].sum(), "first_pid": gb["partition_id"].min()}
                    ).reset_index()
                    return out[out["total"] > 1]

                kc = kc.map_batches(consolidate, batch_format="pandas", batch_size=65536)
                cand_pdf = hash_partition_apply(kc, gkeys, merge_counts).to_pandas()

            # Phase 2 — EXACT key recovery: rescan only the unique-key
            # columns, keep rows whose key hashes into the candidate set,
            # and count the actual string values. Hash-collision false
            # candidates drop out here (their true count is 1), so the
            # final report is exact even with 64-bit hashes.
            _t = _mark("stageB phase1 candidates", _t)
            dup_pdf = self._recover_dup_keys(source, cand_pdf)
            _t = _mark("stageB phase2 recovery", _t)
            if len(dup_pdf):
                dup_viol_ds = rd.from_arrow(shape_dup_rows(dup_pdf))

        _t = _mark("stageB dups", _t)
        # stage D: stats merge. Small runs fold the blobs directly on the
        # driver (one pyarrow.dataset scan of the blob column — skips a Ray
        # pipeline's fixed cost); large runs tree-merge per block in Ray
        # first so the driver fold stays O(#blocks).
        merged = BatchStats()
        unified_bytes = _dir_bytes(unified_dir)
        if not unified_has_data:
            pass
        elif unified_bytes < self.driver_threshold_bytes:
            import pyarrow.dataset as _pads

            t = _pads.dataset(unified_dir).to_table(
                columns=["stats_blob"], filter=_pads.field("record_kind") == "stats"
            )
            for blob in t["stats_blob"].to_pylist():
                if blob:
                    merged.merge(BatchStats.loads(blob))
        else:
            stats_ds = rd.read_parquet(
                unified_dir,
                columns=["record_kind", "stats_blob"],
                filter=(pc.field("record_kind") == "stats"),
            ).map_batches(merge_stats_blobs, batch_format="pyarrow")
            for b in stats_ds.iter_batches(batch_format="pyarrow"):
                for blob in b["stats_blob"].to_pylist():
                    if blob:
                        merged.merge(BatchStats.loads(blob))

        _t = _mark("stageD stats", _t)
        drift_results = self._drift(merged)
        # dataset-level aggregate constraints (table-scope assertions):
        # evaluated from the same merged stats channel, one group-keyed
        # violation row per offending group, flowing through the canonical
        # sink and verdict roll-up like schema-level violations
        schema_viols = (
            list(schema_viols)
            + self._aggregate_check_violations(merged)
            + self._manifest_check_violations(
                merged,
                manifests or {},
                n_rows_total=sum(v.n_rows for v in verdict_by_pid.values()),
            )
        )

        # stage E: final canonical violations = row-local+fk (from shards)
        # ∪ duplicates (stage B) ∪ schema-level, sorted deterministically.
        # Adaptive sink: below the threshold one driver-side column-pruned
        # scan + arrow sort + single-file write beats a Ray pipeline's fixed
        # cost; above it, a distributed union → sort → write runs.
        viol_dir = os.path.join(out_dir, "violations")
        if os.path.exists(viol_dir):
            import shutil

            shutil.rmtree(viol_dir)
        sort_keys = ["partition_id", "key", "constraint_name", "column"]
        extra_tbls: List[pa.Table] = []
        if schema_viols:
            extra_tbls.append(pa.Table.from_pylist(schema_viols, schema=VIOLATION_SCHEMA))
        if bigfk_viol_ds is not None and (
            not unified_has_data or _dir_bytes(unified_dir) < self.driver_threshold_bytes
        ):
            # small-run adaptive plan: fold the distributed-keyref rows into
            # the driver-side sort/write like schema-level violations
            from xmlschema_ray.ops.relational import to_pandas_with_schema

            bdf = to_pandas_with_schema(bigfk_viol_ds)
            if len(bdf):
                extra_tbls.append(
                    pa.Table.from_pandas(
                        bdf[[f.name for f in VIOLATION_SCHEMA]], preserve_index=False
                    ).cast(VIOLATION_SCHEMA)
                )
            bigfk_viol_ds = None
        if not unified_has_data:
            os.makedirs(viol_dir, exist_ok=True)
            if extra_tbls:
                allv = pa.concat_tables(extra_tbls).sort_by(
                    [(k, "ascending") for k in sort_keys]
                )
                pq.write_table(allv, os.path.join(viol_dir, "part-00000.parquet"))
        elif _dir_bytes(unified_dir) < self.driver_threshold_bytes:
            vt = pads.dataset(unified_dir).to_table(
                columns=[f.name for f in VIOLATION_SCHEMA],
                filter=pads.field("record_kind") == "violation",
            ).cast(VIOLATION_SCHEMA)
            parts = [vt] + extra_tbls
            if dup_viol_ds is not None:
                parts.append(shape_dup_rows(dup_pdf))
            allv = pa.concat_tables(parts)
            allv = allv.sort_by([(k, "ascending") for k in sort_keys])
            os.makedirs(viol_dir, exist_ok=True)
            if allv.num_rows:
                pq.write_table(allv, os.path.join(viol_dir, "part-00000.parquet"))
        else:
            viol_ds = rd.read_parquet(
                unified_dir,
                columns=[f.name for f in UNIFIED_SCHEMA],
                filter=(pc.field("record_kind") == "violation"),
            ).drop_columns(["record_kind", "key_hash", "count", "stats_blob"])
            if dup_viol_ds is not None:
                viol_ds = viol_ds.union(dup_viol_ds)
            if bigfk_viol_ds is not None:
                viol_ds = viol_ds.union(bigfk_viol_ds)
            for t in extra_tbls:
                viol_ds = viol_ds.union(rd.from_arrow(t))
            viol_ds.sort(sort_keys).write_parquet(viol_dir)
            os.makedirs(viol_dir, exist_ok=True)  # empty result writes no dir

        _t = _mark("stageE violations write", _t)
        # verdict roll-up (xsdbase.py:80-92) from the single source of
        # truth: per-partition counts over the written violations (column-
        # pruned scan of one int32 column — cheap even for huge outputs).
        warn_set = set(self.spec.warning_constraints)
        for v in verdict_by_pid.values():
            v.n_violations = 0
            v.n_warnings = 0
            v.validity = V.VALID if v.validity != V.NOT_KNOWN else v.validity
        if os.listdir(viol_dir):
            # constraint_name rides along only when the spec declares
            # warning severities — the common case stays a 1-column scan
            cols = ["partition_id"] + (["constraint_name"] if warn_set else [])
            vc_tbl = pads.dataset(viol_dir).to_table(columns=cols)
            if warn_set:
                is_warn = pc.is_in(
                    vc_tbl["constraint_name"].combine_chunks(),
                    value_set=pa.array(sorted(warn_set)),
                )
                pids = vc_tbl["partition_id"].combine_chunks()
                for mask, marker in ((pc.invert(is_warn), "mark"), (is_warn, "mark_warnings")):
                    vc = pc.value_counts(pids.filter(mask))
                    for pid, n in zip(
                        vc.field("values").to_pylist(), vc.field("counts").to_pylist()
                    ):
                        getattr(
                            verdict_by_pid.setdefault(int(pid), V.PartitionVerdict(int(pid))),
                            marker,
                        )(int(n))
            else:
                vc = pc.value_counts(vc_tbl["partition_id"].combine_chunks())
                for pid, n in zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist()):
                    verdict_by_pid.setdefault(int(pid), V.PartitionVerdict(int(pid))).mark(int(n))
        violations_truncated: Dict[int, int] = {}
        # UNCONDITIONAL (not gated on this engine's cap setting): a capped
        # run resumed by an uncapped engine still has overflow records in
        # its checkpointed unified stream, and skipping them would silently
        # undercount verdicts
        if unified_has_data:
            # dropped-row counts from the capped materialization: the
            # written violations undercount by exactly these overflow
            # records — add them back so verdicts stay exact
            ot = pads.dataset(unified_dir).to_table(
                columns=["partition_id", "constraint_name", "count"],
                filter=pads.field("record_kind") == "viol_overflow",
            )
            if ot.num_rows:
                odf = ot.to_pandas()
                # overflow records carry the constraint name, so capped
                # runs keep exact severity splits too
                owarn = odf["constraint_name"].isin(warn_set)
                for pid, n in odf.groupby("partition_id")["count"].sum().items():
                    violations_truncated[int(pid)] = int(n)
                for sel, marker in ((~owarn, "mark"), (owarn, "mark_warnings")):
                    for pid, n in (
                        odf.loc[sel].groupby("partition_id")["count"].sum().items()
                    ):
                        getattr(
                            verdict_by_pid.setdefault(int(pid), V.PartitionVerdict(int(pid))),
                            marker,
                        )(int(n))
        _t = _mark("verdict counts", _t)
        if sample_mod is not None:
            # honest PSVI-partial semantics: a sample can CONVICT a
            # partition (violations are real rows) but never ACQUIT one.
            # stats_only verdicts keep attempted='none' — nothing was
            # validated, sampled or not.
            for v in verdict_by_pid.values():
                if v.validation_attempted != V.NONE:
                    v.validation_attempted = V.PARTIAL
                if v.validity == V.VALID:
                    v.validity = V.NOT_KNOWN
        verdicts = V.verdicts_frame(list(verdict_by_pid.values()))
        job = V.job_validity(list(verdict_by_pid.values()))
        drift_failed = [d.name for d in drift_results if not d.passed]

        n_violations = int(verdicts["n_violations"].sum()) if len(verdicts) else 0
        summary = {
            "job_validity": job,
            "sample_mod": sample_mod,
            "drift_failed": drift_failed,
            "n_partitions": len(verdicts),
            "n_rows": int(verdicts["n_rows"].sum()) if len(verdicts) else 0,
            "n_violations": n_violations,
            "n_warnings": int(verdicts["n_warnings"].sum()) if len(verdicts) else 0,
            "violations_truncated": violations_truncated,
            "columns": {k: cs.to_dict() for k, cs in merged.columns.items()},
            "distinct_estimates": {k: hll_estimate(reg) for k, reg in merged.hlls.items()},
            "histograms": {k: h.tolist() for k, h in merged.histograms.items()},
            "quantiles": self._quantiles(merged),
            "drift": [
                {
                    "name": d.name,
                    "column": d.column,
                    "ks": d.ks,
                    "psi": d.psi,
                    "passed": d.passed,
                }
                for d in drift_results
            ],
        }
        verdicts.to_parquet(os.path.join(out_dir, "verdicts.parquet"), index=False)
        with open(os.path.join(out_dir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2, default=float)

        return ValidationResult(
            out_dir=out_dir,
            job_validity=job,
            verdicts=verdicts,
            stats=merged,
            drift=drift_results,
            summary=summary,
            n_violations=n_violations,
            n_warnings=int(summary["n_warnings"]),
        )

    def _quantiles(self, merged: BatchStats) -> Dict[str, Dict[str, float]]:
        """p50/p95/p99 per histogrammed quantity (mergeable histogram
        quantiles — see stats.histogram_quantiles)."""
        from xmlschema_ray.engine.stats import histogram_quantiles

        out: Dict[str, Dict[str, float]] = {}
        for d in self.spec.drift:
            qname = f"len({d.column})" if d.use_list_length else d.column
            hist = merged.histograms.get(qname)
            if hist is not None:
                out[qname] = histogram_quantiles(hist, np.asarray(d.bin_edges))
        return out

    def _aggregate_check_violations(self, merged: BatchStats) -> List[dict]:
        """Evaluate ``spec.aggregate_checks`` against the merged stats
        channel (stage D, driver-side — the group table is
        group-cardinality-sized by construction). One violation dict per
        offending group, shaped for ``VIOLATION_SCHEMA``; table-scope
        rows carry ``partition_id = -1`` (no single shard owns them).
        Groups with no non-null evidence pass ``mean`` (NaN compares
        false), matching SQL aggregate semantics over empty sets."""
        out: List[dict] = []
        for ac in self.spec.aggregate_checks:
            gd = merged.groups.get(ac.name, {})
            for gv in sorted(gd, key=lambda g: "" if g is None else str(g)):
                n, nulls, s = (float(x) for x in gd[gv])
                if ac.agg == "count":
                    obs = n
                elif ac.agg == "sum":
                    obs = s
                elif ac.agg == "mean":
                    obs = s / (n - nulls) if n - nulls > 0 else float("nan")
                else:  # null_fraction
                    obs = nulls / n if n > 0 else float("nan")
                low = ac.min_value is not None and obs < ac.min_value
                high = ac.max_value is not None and obs > ac.max_value
                if low or high:
                    bound = (
                        f">= {ac.min_value}" if low else f"<= {ac.max_value}"
                    )
                    out.append(
                        {
                            "partition_id": -1,
                            "key": "" if gv is None else str(gv),
                            "constraint_name": ac.name,
                            "column": ac.column or ac.group_by or "",
                            "reason": f"{ac.agg}={obs:g} violates {bound}",
                            "value_repr": repr(obs),
                        }
                    )
        return out

    def _drift(self, merged: BatchStats) -> List[DriftResult]:
        out: List[DriftResult] = []
        for d in self.spec.drift:
            qname = f"len({d.column})" if d.use_list_length else d.column
            hist = merged.histograms.get(qname)
            if hist is None:
                out.append(DriftResult(d.name, d.column, None, None, True, []))
                continue
            if d.reference_hist is None:
                out.append(DriftResult(d.name, d.column, None, None, True, hist.tolist()))
                continue
            ref = np.asarray(d.reference_hist, dtype=np.int64)
            ks = ks_statistic(ref, hist)
            p = psi(ref, hist)
            passed = ks <= d.ks_threshold and p <= d.psi_threshold
            out.append(DriftResult(d.name, d.column, ks, p, passed, hist.tolist()))
            if d.group_by:
                # per-group gates: each group compares against ITS OWN
                # reference when given (within-source drift), else the
                # shared profile (source-vs-corpus mix). KS/PSI normalize
                # to densities, so group size does not bias the comparison.
                prefix = f"{qname}@"
                for hname in sorted(h for h in merged.histograms if h.startswith(prefix)):
                    gh = merged.histograms[hname]
                    gref = ref
                    if d.group_references is not None:
                        gr = d.group_references.get(hname[len(prefix):])
                        if gr is not None:
                            gref = np.asarray(gr, dtype=np.int64)
                    gks = ks_statistic(gref, gh)
                    gp = psi(gref, gh)
                    gpassed = gks <= d.ks_threshold and gp <= d.psi_threshold
                    out.append(
                        DriftResult(
                            f"{d.name}[{hname[len(prefix):]}]",
                            d.column,
                            gks,
                            gp,
                            gpassed,
                            gh.tolist(),
                        )
                    )
        return out
