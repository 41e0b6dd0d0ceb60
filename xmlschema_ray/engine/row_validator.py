"""Stage A: the zero-copy per-batch row validator.

The columnar analog of ``XsdElement.iter_decode``
(``/root/reference/xmlschema/validators/elements.py:436-551``) — the
per-record driver that runs every row-local check. Where the reference walks
one element tree per record through a generator chain, we take one Arrow
batch (zero-copy from the object store) and evaluate every facet stack and
row assertion as vectorized kernels, emitting:

* violation rows — the materialized-error analog of
  ``XMLSchemaValidationError(validator, obj, reason, path)``
  (``validators/exceptions.py:182-229``): here
  ``(partition_id, key, constraint_name, column, reason, value_repr)``
  with ``key`` playing the role of the locating XPath;
* one partial-stats blob per batch (see ``stats.py``) — same single pass,
  mirroring validation-is-decode-with-errors (``xsdbase.py:547-593``).

Run modes follow the reference's strict/lax/skip
(``validators/xsdbase.py:24``): ``failfast`` raises on the first violation,
``collect`` gathers all violations, ``stats_only`` skips checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from typing import Dict, Iterator, List, Optional, Tuple

from xmlschema_ray.constraints.spec import TableConstraints
from xmlschema_ray.engine.stats import BatchStats, collect_batch_stats

# Unified stage-A output schema: violation rows, per-batch stats blobs and
# per-batch unique-key count partials share one stream (a Ray Data stage has
# exactly one output); downstream filters on ``record_kind``. Stats rows are
# rare (one per batch); keycount rows are pre-aggregated per batch so a hot
# key contributes ONE row per batch — the skew-safe partial-count shape of
# the reference's per-document Counter (``validators/identities.py:199``)
# lifted per block.
UNIFIED_SCHEMA = pa.schema(
    [
        # "violation" | "stats" | "keycount" | "viol_overflow" (capped-
        # materialization count records, see max_violations_per_batch)
        pa.field("record_kind", pa.string()),
        pa.field("partition_id", pa.int32()),
        pa.field("key", pa.string()),
        pa.field("constraint_name", pa.string()),
        pa.field("column", pa.string()),
        pa.field("reason", pa.string()),
        pa.field("value_repr", pa.string()),
        pa.field("key_hash", pa.uint64()),  # keycount rows: 64-bit key hash
        pa.field("count", pa.int64()),
        pa.field("stats_blob", pa.binary()),
    ]
)

VIOLATION_SCHEMA = pa.schema(
    [
        pa.field("partition_id", pa.int32()),
        pa.field("key", pa.string()),
        pa.field("constraint_name", pa.string()),
        pa.field("column", pa.string()),
        pa.field("reason", pa.string()),
        pa.field("value_repr", pa.string()),
    ]
)


def unique_key_column(table: pa.Table, columns) -> pa.Array:
    """The unique-key tuple as one string array (multi-column keys joined
    with '|'; documented assumption: '|' does not appear in key values).
    Shared by the stage-A keycount emitter and the dup-key recovery scan so
    both sides hash identical strings."""
    if len(columns) == 1:
        col = table[columns[0]]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pc.cast(col, pa.string()) if not pa.types.is_string(col.type) else col
    parts = []
    for c in columns:
        col = table[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts.append(pc.cast(col, pa.string()))
    return pc.binary_join_element_wise(*parts, "|")


class ValidationFailure(Exception):
    """Raised in ``failfast`` mode — the strict-mode analog
    (``validators/xsdbase.py:674-705`` raises on first error)."""


def format_values(col: pa.ChunkedArray | pa.Array, idx: np.ndarray, limit: int = 80) -> List[str]:
    """Short reprs of the offending values (only computed for violations)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    taken = col.take(pa.array(idx, type=pa.int64())).to_pylist()
    out = []
    for v in taken:
        s = repr(v)
        out.append(s if len(s) <= limit else s[: limit - 1] + "…")
    return out


_ALT_CMP = {
    "==": pc.equal,
    "!=": pc.not_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
}


def _eval_alt_test(table: pa.Table, case) -> np.ndarray:
    """Vectorized xs:alternative test: one Arrow kernel over the
    discriminant column; null discriminants never match a comparison
    (they fall through to later cases / the default type), matching the
    reference where an XPath test over a missing attribute is false."""
    col = table[case.column]
    if case.op == "is_null":
        m = pc.is_null(col)
    elif case.op == "not_null":
        m = pc.is_valid(col)
    elif case.op == "in":
        m = pc.is_in(col, value_set=pa.array(list(case.value)))
    else:
        m = _ALT_CMP[case.op](col, case.value)
    if isinstance(m, pa.ChunkedArray):
        m = m.combine_chunks()
    return m.fill_null(False).to_numpy(zero_copy_only=False)


def iter_row_checks(
    table: pa.Table, spec: TableConstraints
) -> Iterator[Tuple[str, str, np.ndarray, str, Optional[np.ndarray]]]:
    """Yield ``(constraint_name, column, violation_mask, reason, reprs)``
    for every row-local check in the spec, all vectorized.

    Checks: per-column not-null (required-value analog,
    ``validators/attributes.py:578-581``), every facet in each column's
    facet stack (conditionally per row when the column carries XSD 1.1
    type alternatives — ``validators/elements.py:778-791`` ``get_type``),
    and every row-level assertion.
    """
    present = set(table.column_names)
    n = table.num_rows
    for c in spec.columns:
        if c.name not in present:
            continue  # missing-column handled at partition level
        col = table[c.name]
        if not c.nullable:
            nulls = pc.is_null(col).combine_chunks().to_numpy(zero_copy_only=False)
            if nulls.any():
                yield (f"{c.name}.not_null", c.name, nulls, "null value in non-nullable column", None)
        for f in c.facets:
            mask, reprs = f.check(col)
            if mask.any():
                yield (f"{c.name}.{f.describe()}", c.name, mask, f"facet {f.describe()} violated", reprs)
    # XSD 1.1 conditional type assignment: each alternative type is a
    # RESTRICTION of the declared type, so it INHERITS the declared stack
    # (which ran unconditionally above, for every row — including rows
    # whose discriminant column is absent from the batch, which all fall
    # to the default type) and ADDS its own facets to the selected rows.
    for ta in spec.type_alternatives:
        if ta.column not in present:
            continue
        col = table[ta.column]
        # first matching case wins (reference get_type order); -1 = default.
        # Each case's test is evaluated INDEPENDENTLY (reference
        # ``validators/elements.py:778-791``): a test over a column absent
        # from the batch is false for every row — later cases whose
        # discriminants ARE present can still match.
        sel = np.full(n, -1, dtype=np.int64)
        for i, case in enumerate(ta.cases):
            if case.column not in present:
                continue
            hit = _eval_alt_test(table, case)
            np.copyto(sel, i, where=(sel < 0) & hit)
        for i, case in enumerate(ta.cases):
            rows = sel == i
            if not rows.any():
                continue
            for f in case.facets:
                mask, reprs = f.check(col)
                mask = mask & rows
                if mask.any():
                    yield (
                        f"{ta.column}.alt[{case.type_name}].{f.describe()}",
                        ta.column,
                        mask,
                        f"facet {f.describe()} violated (type {case.type_name})",
                        reprs,
                    )
    # xs:key presence (require_present=True): a null key field is itself a
    # violation (reference XsdKey, identities.py:232-249 — every field must
    # resolve); xs:unique (the default) exempts null-field rows instead.
    # Row-local, so it rides stage A with no extra exchange.
    for uk in spec.unique_keys:
        if not uk.require_present or not all(c in present for c in uk.columns):
            continue
        anynull = np.zeros(n, dtype=bool)
        for cname in uk.columns:
            anynull |= pc.is_null(table[cname]).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        if anynull.any():
            yield (
                f"{uk.name}.key_absent",
                uk.columns[0],
                anynull,
                "null key field in key-mode unique constraint (require_present)",
                None,
            )
    for rc in spec.row_checks:
        if not all(col in present for col in rc.columns):
            continue
        mask = np.asarray(rc.fn(table), dtype=bool)
        if mask.shape != (n,):
            raise ValueError(f"row check {rc.name!r} returned mask of shape {mask.shape}, want ({n},)")
        if mask.any():
            yield (rc.name, rc.columns[0], mask, rc.reason, None)


def _key_strings(table: pa.Table, spec: TableConstraints, idx: np.ndarray) -> List[str]:
    """Row identity for the violation's ``key`` field (XPath-locator analog,
    ``validators/exceptions.py:76-88``): the table's key column(s) joined."""
    cols = [c for c in spec.key_columns if c in table.column_names]
    if not cols:
        return [""] * len(idx)
    parts = []
    for cname in cols:
        col = table[cname].combine_chunks()
        vals = col.take(pa.array(idx, type=pa.int64())).to_pylist()
        parts.append(["" if v is None else str(v) for v in vals])
    if len(parts) == 1:
        return parts[0]
    return ["|".join(t) for t in zip(*parts)]


def augment_struct_keys(table: pa.Table, paths) -> pa.Table:
    """Append FLATTENED struct-subfield columns for dotted identity-key
    paths (``meta.license`` → a literal column named ``meta.license``) —
    the XPath field-selector analog (reference
    ``validators/identities.py:64-150``): nested metadata rides struct
    columns, and uniqueness/FK/row-identity keys may address subfields.
    One zero-copy ``pc.struct_field`` chain per path per batch; a null
    struct yields a null leaf (SQL's ``meta.license IS NULL``). A literal
    column already carrying the dotted name wins (flat names may contain
    dots); unresolvable paths are skipped — column presence is handled by
    the same missing-column machinery as any flat key."""
    for p in paths:
        if p in table.column_names or "." not in p:
            continue
        root, *rest = p.split(".")
        if root not in table.column_names:
            continue
        col = table[root]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ok = True
        for part in rest:
            if not pa.types.is_struct(col.type) or col.type.get_field_index(part) < 0:
                ok = False
                break
            col = pc.struct_field(col, part)
        if ok:
            table = table.append_column(p, col)
    return table


def render_violation_keys(df, key_cols, key_types=None) -> np.ndarray:
    """Violation ``key`` rendering for B-stage PANDAS kernels, identical
    to stage A's :func:`_key_strings` (Python ``str()``, nulls → '',
    '|'-join) so every stage shares ONE key identity — bool keys render
    'True' not 'true', whole-second timestamps without '.000000', and
    key-based downstream tooling (diff_validation_runs, quarantine key
    sets) matches across stages.

    The pandas exchange loses the source dtype (a null-bearing int64
    batch surfaces as float64, which would render 7 as '7.0' where stage
    A writes '7'), so when ``key_types`` carries the SOURCE Arrow type
    for a column, values are routed back through Arrow with that type
    before formatting. ``df`` is violation-sized — the Python formatting
    never touches the fact."""
    parts: List[List[str]] = []
    for c in key_cols:
        arr = pa.Array.from_pandas(df[c])
        want = (key_types or {}).get(c)
        if want is not None and arr.type != want:
            arr = arr.cast(want)
        parts.append(["" if v is None else str(v) for v in arr.to_pylist()])
    if len(parts) == 1:
        return np.array(parts[0], dtype=object)
    return np.array(["|".join(t) for t in zip(*parts)], dtype=object)


class RowValidator:
    """Callable class for ``map_batches(RowValidator, batch_format="pyarrow",
    zero_copy_batch=True)``.

    Stateless per batch but constructed once per actor/task: the compiled
    spec is captured in ``__init__`` exactly as the reference compiles
    regexes and validators once at schema build (``facets.py:585-593``)
    rather than per value.
    """

    def __init__(
        self,
        spec: TableConstraints,
        partition_id: int = 0,
        mode: str = "collect",
        emit_stats: bool = True,
        emit_keycounts: bool = True,
        histogram_specs: Optional[Dict[str, np.ndarray]] = None,
        fk_sets_ref=None,
        max_violations_per_batch: Optional[int] = None,
        sample_mod: Optional[int] = None,
    ):
        assert mode in ("collect", "failfast", "stats_only")
        # Each pool actor is one logical CPU; Arrow's default intra-kernel
        # thread pool (one per actor PROCESS, sized to the machine) makes
        # N actors × M threads oversubscribe the node and the kernels spend
        # their time waiting. Parallelism comes from the actor pool, not
        # from intra-kernel threads.
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        self.spec = spec.compile()
        self.partition_id = partition_id
        self.mode = mode
        self.emit_stats = emit_stats
        self.emit_keycounts = emit_keycounts
        # Scale guard for pathological corpora: a 100%-broken input would
        # otherwise MATERIALIZE one violation row per input row (10^12 rows
        # of output for 10^12 broken rows). The cap truncates materialized
        # rows per (batch, constraint); dropped rows are still COUNTED
        # exactly through a "viol_overflow" count record, so verdicts and
        # n_violations stay exact — only which exemplar rows are kept
        # becomes parallelism-dependent. None (default) disables.
        if max_violations_per_batch is not None and max_violations_per_batch < 0:
            raise ValueError("max_violations_per_batch must be >= 0 or None")
        self.max_violations_per_batch = max_violations_per_batch
        # canary sampling: keep rows with hash64(key) % sample_mod == 0.
        # Sampling BY KEY means a key's rows are all in or all out, so
        # uniqueness/keyref findings over the sampled key space stay EXACT
        # — the sample weakens coverage, never correctness of what it saw.
        if sample_mod is not None and sample_mod < 2:
            raise ValueError("sample_mod must be >= 2 or None")
        self.sample_mod = sample_mod
        if histogram_specs is None:
            histogram_specs = {}
            for d in spec.drift:
                qname = f"len({d.column})" if d.use_list_length else d.column
                edges = np.asarray(d.bin_edges, dtype=np.float64)
                histogram_specs[qname] = (edges, d.group_by) if d.group_by else edges
        self.histogram_specs = histogram_specs
        # aggregate-check partials ride the same stats blobs: one
        # (n, nulls, sum) triple per observed group per batch
        self.group_agg_specs = {
            ac.name: (ac.group_by, ac.column) for ac in spec.aggregate_checks
        }
        # manifest reconciliation observes the same (n, nulls, sum) channel
        for mc in spec.manifest_checks:
            self.group_agg_specs[mc.name] = (mc.group_by, mc.column)
        # Broadcast dimension key sets for xs:keyref-style referential checks
        # (``validators/identities.py:290-318``): the engine ``ray.put``s the
        # dict of {fk.name: pa.Array of dim keys} ONCE; each actor fetches it
        # here in __init__ (zero-copy from the object store, once per actor,
        # not per batch).
        self.fk_sets: Dict[str, pa.Array] = {}
        if fk_sets_ref is not None:
            import ray

            obj = fk_sets_ref
            if isinstance(obj, ray.ObjectRef):
                obj = ray.get(obj)
            self.fk_sets = dict(obj)

    def _iter_fk_checks(self, table: pa.Table):
        """Row-local half of the keyref check: membership against the
        broadcast dim key set (``validators/identities.py:298-318``).
        Composite keyrefs (multi-field xs:field lists) exact-join the
        batch against the broadcast distinct dim tuples — a vectorized
        left merge, order-preserving, no hashing soundness caveat."""
        for fk in self.spec.foreign_keys:
            cols = fk.columns
            if fk.name not in self.fk_sets or any(
                c not in table.column_names for c in cols
            ):
                continue
            if len(cols) == 1:
                col = table[cols[0]]
                ok = pc.is_in(col, value_set=self.fk_sets[fk.name])
                mask = ~ok.combine_chunks().fill_null(False).to_numpy(zero_copy_only=False)
                nulls = pc.is_null(col).combine_chunks().to_numpy(zero_copy_only=False)
                mask &= ~nulls  # null handled by not_null check, not keyref
                if mask.any():
                    yield (
                        fk.name,
                        fk.column,
                        mask,
                        f"value not found in {fk.dim_name}.{fk.dim_key}",
                        None,
                    )
                continue
            dim_pd = self._fk_dim_frame(fk.name)
            lf = pd.DataFrame(
                {c: table[c].combine_chunks().to_numpy(zero_copy_only=False) for c in cols}
            )
            merged = lf.merge(
                dim_pd, how="left", left_on=list(cols), right_on=list(fk.dim_keys)
            )
            mask = ~merged["__fk_hit"].notna().to_numpy()
            any_null = np.zeros(len(lf), dtype=bool)
            for c in cols:
                any_null |= pc.is_null(table[c]).combine_chunks().to_numpy(
                    zero_copy_only=False
                )
            mask &= ~any_null  # null fields handled by not_null, not keyref
            if mask.any():
                yield (
                    fk.name,
                    ",".join(cols),
                    mask,
                    f"tuple not found in {fk.dim_name}.({', '.join(fk.dim_keys)})",
                    None,
                )

    def _fk_dim_frame(self, fk_name: str) -> pd.DataFrame:
        """Broadcast composite dim tuples as a pandas frame with a hit
        marker, converted once per worker and cached."""
        cache = getattr(self, "_fk_frames", None)
        if cache is None:
            cache = self._fk_frames = {}
        df = cache.get(fk_name)
        if df is None:
            df = self.fk_sets[fk_name].to_pandas()
            df["__fk_hit"] = True
            cache[fk_name] = df
        return df

    def __call__(self, table: pa.Table) -> pa.Table:
        # dotted struct-path identity keys become literal columns here so
        # every downstream consumer (row identity, keycounts, fk
        # membership, sampling) sees them like any flat key column
        dotted = self.spec.dotted_key_paths()
        if dotted and table.num_rows:
            table = augment_struct_keys(table, dotted)
        if self.sample_mod is not None and table.num_rows:
            from xmlschema_ray.engine.stats import hash64

            ks = unique_key_column(table, list(self.spec.key_columns)).to_numpy(
                zero_copy_only=False
            )
            table = table.filter(pa.array(hash64(ks) % self.sample_mod == 0))
        pid = self.partition_id
        kinds: List[str] = []
        keys: List[Optional[str]] = []
        names: List[Optional[str]] = []
        columns: List[Optional[str]] = []
        reasons: List[Optional[str]] = []
        vreprs: List[Optional[str]] = []
        counts: List[Optional[int]] = []
        blobs: List[Optional[bytes]] = []

        if self.mode != "stats_only":
            import itertools

            checks = itertools.chain(
                iter_row_checks(table, self.spec), self._iter_fk_checks(table)
            )
            for cname, col, mask, reason, reprs in checks:
                idx = np.flatnonzero(mask)
                # warning-severity constraints never abort a failfast run
                # (the per-constraint lax mode) — they are still recorded
                if self.mode == "failfast" and cname not in self.spec.warning_constraints:
                    k = _key_strings(table, self.spec, idx[:1])[0]
                    raise ValidationFailure(f"{cname} violated at key={k!r}: {reason}")
                cap = self.max_violations_per_batch
                if cap is not None and len(idx) > cap:
                    n_drop = len(idx) - cap
                    idx = idx[:cap]
                    kinds.append("viol_overflow")
                    keys.append(None)
                    names.append(cname)
                    columns.append(col)
                    reasons.append(reason)
                    vreprs.append(None)
                    counts.append(int(n_drop))
                    blobs.append(None)
                ks = _key_strings(table, self.spec, idx)
                if reprs is not None:
                    vr = [reprs[i] if reprs[i] is not None else "" for i in idx]
                elif col in table.column_names:
                    vr = format_values(table[col], idx)
                else:
                    vr = [""] * len(idx)
                kinds.extend(["violation"] * len(idx))
                keys.extend(ks)
                names.extend([cname] * len(idx))
                columns.extend([col] * len(idx))
                reasons.extend([reason] * len(idx))
                vreprs.extend(vr)
                counts.extend([None] * len(idx))
                blobs.extend([None] * len(idx))

        key_hashes: List[Optional[int]] = [None] * len(kinds)
        if self.emit_keycounts and self.mode != "stats_only":
            from xmlschema_ray.engine.stats import hash64

            for uk in self.spec.unique_keys:
                if not all(c in table.column_names for c in uk.columns):
                    continue
                keycol = unique_key_column(table, uk.columns)
                vals = keycol.drop_null().to_numpy(zero_copy_only=False)
                # 64-bit hashes instead of key strings: the keycount channel
                # is the engine's bulkiest stream (one row per distinct key
                # per batch); hashing shrinks it ~4x and turns the global
                # dup groupby into an int aggregate. Hash-collision false
                # candidates are eliminated later by the exact key-recovery
                # scan, so exactness is preserved even at 10^12 keys.
                h = hash64(vals)
                uniq, kcounts = np.unique(h, return_counts=True)
                n_k = len(uniq)
                kinds.extend(["keycount"] * n_k)
                keys.extend([None] * n_k)
                names.extend([uk.name] * n_k)
                columns.extend([",".join(uk.columns)] * n_k)
                reasons.extend([None] * n_k)
                vreprs.extend([None] * n_k)
                key_hashes.extend(uniq.tolist())
                counts.extend(kcounts.tolist())
                blobs.extend([None] * n_k)

        if self.emit_stats:
            bs = collect_batch_stats(
                table,
                stats_columns=self.spec.stats_columns,
                distinct_columns=self.spec.distinct_columns,
                histogram_specs=self.histogram_specs,
                group_agg_specs=self.group_agg_specs,
            )
            kinds.append("stats")
            keys.append(None)
            names.append(None)
            columns.append(None)
            reasons.append(None)
            vreprs.append(None)
            key_hashes.append(None)
            counts.append(table.num_rows)  # stats rows carry the batch row count
            blobs.append(bs.dumps())

        return pa.table(
            {
                "record_kind": pa.array(kinds, type=pa.string()),
                "partition_id": pa.array([pid] * len(kinds), type=pa.int32()),
                "key": pa.array(keys, type=pa.string()),
                "constraint_name": pa.array(names, type=pa.string()),
                "column": pa.array(columns, type=pa.string()),
                "reason": pa.array(reasons, type=pa.string()),
                "value_repr": pa.array(vreprs, type=pa.string()),
                "key_hash": pa.array(key_hashes, type=pa.uint64()),
                "count": pa.array(counts, type=pa.int64()),
                "stats_blob": pa.array(blobs, type=pa.binary()),
            },
            schema=UNIFIED_SCHEMA,
        )


def make_validator_fn(**kwargs):
    """Stateless-task form of the validator for ``map_batches(fn)``.

    The compiled spec is tiny and the broadcast FK sets are fetched
    zero-copy from the object store, so per-task construction costs
    microseconds — stateless tasks avoid the actor-pool cold-start that
    dominates short jobs. Use the ``RowValidator`` class (actor pool) only
    when per-worker setup is genuinely expensive (models, big indexes).
    """
    state: dict = {}

    def validate(batch: pa.Table) -> pa.Table:
        rv = state.get("rv")
        if rv is None:
            rv = state["rv"] = RowValidator(**kwargs)
        return rv(batch)

    return validate


def merge_stats_blobs(table: pa.Table) -> pa.Table:
    """Tree-merge step: collapse all stats blobs in one block into one.

    Keeps the driver-side final merge O(#blocks), not O(#batches) — the
    partial+final aggregation shape the reference's per-document Counter
    (``validators/identities.py:198-221``) takes when lifted to a cluster.
    """
    blobs = table["stats_blob"].drop_null().to_pylist()
    if not blobs:
        return pa.table({"stats_blob": pa.array([], type=pa.binary())})
    acc = BatchStats.loads(blobs[0])
    for b in blobs[1:]:
        acc.merge(BatchStats.loads(b))
    return pa.table({"stats_blob": pa.array([acc.dumps()], type=pa.binary())})
