"""Type derivation: restriction / extension of table specs.

The reference derives simple types by RESTRICTION — a derived type may
only NARROW its base's value space, enforced facet-by-facet at schema
build (``/root/reference/xmlschema/validators/simple_types.py:879-930``
``XsdAtomicRestriction._parse``; the W3C "facet-valid-restriction"
rules) — and complex types by EXTENSION, which appends new particles
without touching inherited ones. This module applies the same algebra to
``TableConstraints``:

* :func:`restrict` — add facets / tighten nullability on existing
  columns; every added facet is checked against the strictest same-kind
  base facet (mins only increase, maxes only decrease, enumerations only
  shrink, whiteSpace only moves toward collapse, …) and the result is
  re-linted, so an invalid derivation fails at COMPILE time exactly like
  the reference's schema-build errors, never at scan time.
* :func:`extend` — add new columns; inherited columns are carried
  unchanged (extension never alters base constraints).

Patterns accumulate across derivation steps (values must match every
step's pattern — the XSD rule, reference ``facets.py:614-620``); no
containment check is attempted (regex containment is undecidable, and
the reference does not check it either).
"""

from __future__ import annotations

from dataclasses import replace
from typing import Dict, List, Optional, Sequence

from xmlschema_ray.constraints.facets import (
    Enumeration,
    ExplicitTimezone,
    Facet,
    FractionDigits,
    Length,
    MaxExclusive,
    MaxInclusive,
    MaxLength,
    MinExclusive,
    MinInclusive,
    MinLength,
    SpecError,
    TotalDigits,
    WhiteSpace,
)
from xmlschema_ray.constraints.spec import ColumnSpec, RowCheck, TableConstraints

# new-facet value must be >= the strictest same-class base value
_TIGHTEN_UP = (MinInclusive, MinExclusive, MinLength)
# new-facet value must be <= the strictest same-class base value
_TIGHTEN_DOWN = (MaxInclusive, MaxExclusive, MaxLength, TotalDigits, FractionDigits)

_WS_ORDER = {"preserve": 0, "replace": 1, "collapse": 2}


def _facet_value(f: Facet):
    for attr in ("value", "k", "n"):
        if hasattr(f, attr):
            return getattr(f, attr)
    raise SpecError(f"facet {f!r} has no comparable value")  # pragma: no cover


def _check_one(base_facets: Sequence[Facet], new: Facet, col: str) -> None:
    """Facet-valid-restriction for ONE added facet against the base stack."""
    same = [b for b in base_facets if type(b) is type(new)]
    if isinstance(new, _TIGHTEN_UP) and same:
        strictest = max(_facet_value(b) for b in same)
        if _facet_value(new) < strictest:
            raise SpecError(
                f"column {col!r}: {new.describe()} loosens base "
                f"{type(new).__name__}={strictest} (restriction may only narrow)"
            )
    elif isinstance(new, _TIGHTEN_DOWN) and same:
        strictest = min(_facet_value(b) for b in same)
        if _facet_value(new) > strictest:
            raise SpecError(
                f"column {col!r}: {new.describe()} loosens base "
                f"{type(new).__name__}={strictest} (restriction may only narrow)"
            )
    elif isinstance(new, Length) and same:
        if any(b.k != new.k for b in same):
            raise SpecError(
                f"column {col!r}: length {new.k} conflicts with base fixed length"
            )
    elif isinstance(new, Enumeration) and same:
        for b in same:
            extra = set(new.values) - set(b.values)
            if extra:
                raise SpecError(
                    f"column {col!r}: enumeration adds values {sorted(map(str, extra))} "
                    f"not in the base enumeration (restriction may only shrink)"
                )
    elif isinstance(new, WhiteSpace) and same:
        for b in same:
            if _WS_ORDER[new.policy] < _WS_ORDER[b.policy]:
                raise SpecError(
                    f"column {col!r}: whiteSpace {new.policy!r} loosens base {b.policy!r} "
                    f"(only preserve->replace->collapse is a valid restriction)"
                )
    elif isinstance(new, ExplicitTimezone) and same:
        for b in same:
            if b.value != "optional" and new.value != b.value:
                raise SpecError(
                    f"column {col!r}: explicitTimezone {b.value!r} is fixed in the base "
                    f"and cannot change to {new.value!r}"
                )
    # min <= max over the MERGED stack (empty value space = build error,
    # like the reference's facet-conflict checks)
    merged = list(base_facets) + [new]
    mins = [_facet_value(f) for f in merged if isinstance(f, (MinInclusive, MinExclusive))]
    maxs = [_facet_value(f) for f in merged if isinstance(f, (MaxInclusive, MaxExclusive))]
    if mins and maxs and max(mins) > min(maxs):
        raise SpecError(f"column {col!r}: derived bounds are contradictory (min > max)")
    lmins = [_facet_value(f) for f in merged if isinstance(f, MinLength)]
    lmaxs = [_facet_value(f) for f in merged if isinstance(f, MaxLength)]
    if lmins and lmaxs and max(lmins) > min(lmaxs):
        raise SpecError(f"column {col!r}: derived length bounds are contradictory")


def restrict(
    base: TableConstraints,
    name: str,
    column_facets: Optional[Dict[str, Sequence[Facet]]] = None,
    non_nullable: Sequence[str] = (),
    row_checks: Sequence[RowCheck] = (),
) -> TableConstraints:
    """Derive a spec by RESTRICTION: add facets to existing columns and/or
    tighten nullability; the derived spec validates a SUBSET of the base's
    value space or the build raises ``SpecError``."""
    column_facets = column_facets or {}
    by_name = {c.name: c for c in base.columns}
    for col in column_facets:
        if col not in by_name:
            raise SpecError(f"restriction names unknown column {col!r}")
    for col in non_nullable:
        if col not in by_name:
            raise SpecError(f"restriction names unknown column {col!r}")

    new_cols: List[ColumnSpec] = []
    for c in base.columns:
        added = tuple(column_facets.get(c.name, ()))
        for f in added:
            _check_one(c.facets, f, c.name)
        nullable = c.nullable and c.name not in set(non_nullable)
        new_cols.append(replace(c, facets=c.facets + added, nullable=nullable))

    return replace(
        base,
        name=name,
        columns=new_cols,
        row_checks=list(base.row_checks) + list(row_checks),
    )


def extend(
    base: TableConstraints,
    name: str,
    new_columns: Sequence[ColumnSpec],
    row_checks: Sequence[RowCheck] = (),
) -> TableConstraints:
    """Derive a spec by EXTENSION: append new columns; inherited columns
    are carried UNCHANGED (extension never alters base constraints)."""
    existing = {c.name for c in base.columns}
    for c in new_columns:
        if c.name in existing:
            raise SpecError(
                f"extension redefines column {c.name!r} (use restrict() to narrow it)"
            )
    return replace(
        base,
        name=name,
        columns=list(base.columns) + list(new_columns),
        row_checks=list(base.row_checks) + list(row_checks),
    )


# -- backward-compatibility audit -----------------------------------------


def _min_implied(old_facets: Sequence[Facet], new: Facet) -> bool:
    """Does some old lower bound imply the new one for all old-valid x?"""
    w = _facet_value(new)
    for b in old_facets:
        if isinstance(b, (MinInclusive, MinExclusive)):
            v = _facet_value(b)
            if isinstance(new, MinInclusive):
                if v >= w:  # x >= v (or x > v) and v >= w  =>  x >= w
                    return True
            else:  # new MinExclusive: need x > w
                if (isinstance(b, MinInclusive) and v > w) or (
                    isinstance(b, MinExclusive) and v >= w
                ):
                    return True
    return False


def _max_implied(old_facets: Sequence[Facet], new: Facet) -> bool:
    w = _facet_value(new)
    for b in old_facets:
        if isinstance(b, (MaxInclusive, MaxExclusive)):
            v = _facet_value(b)
            if isinstance(new, MaxInclusive):
                if v <= w:
                    return True
            else:  # new MaxExclusive: need x < w
                if (isinstance(b, MaxInclusive) and v < w) or (
                    isinstance(b, MaxExclusive) and v <= w
                ):
                    return True
    return False


def _facet_implied(old_facets: Sequence[Facet], new: Facet) -> bool:
    """True iff every value accepted by the OLD stack also satisfies ``new``
    (sound, not complete: undecidable/unmodeled cases return False)."""
    # identical facet present → trivially implied
    if any(type(b) is type(new) and b.describe() == new.describe() for b in old_facets):
        return True
    if isinstance(new, (MinInclusive, MinExclusive)):
        return _min_implied(old_facets, new)
    if isinstance(new, (MaxInclusive, MaxExclusive)):
        return _max_implied(old_facets, new)
    if isinstance(new, MinLength):
        # length units differ per encoding (chars vs decoded octets):
        # cross-encoding implication is unsound, compare same-encoding only
        for b in old_facets:
            if isinstance(b, MinLength) and b.encoding == new.encoding and b.k >= new.k:
                return True
            if isinstance(b, Length) and b.encoding == new.encoding and b.k >= new.k:
                return True
        return False
    if isinstance(new, (MaxLength, TotalDigits, FractionDigits)):
        for b in old_facets:
            if type(b) is type(new) and _facet_value(b) <= _facet_value(new):
                if not isinstance(new, MaxLength) or b.encoding == new.encoding:
                    return True
            if (
                isinstance(new, MaxLength)
                and isinstance(b, Length)
                and b.encoding == new.encoding
                and b.k <= new.k
            ):
                return True
        return False
    if isinstance(new, Length):
        return any(
            isinstance(b, Length) and b.encoding == new.encoding and b.k == new.k
            for b in old_facets
        )
    if isinstance(new, Enumeration):
        for b in old_facets:
            if isinstance(b, Enumeration) and set(b.values) <= set(new.values):
                return True
        return False
    if isinstance(new, ExplicitTimezone):
        return new.value == "optional"
    # Pattern containment is undecidable; WhiteSpace changes normalization
    # semantics; nested stacks (ItemFacets/UnionFacets/StructField) only
    # match on identity above.
    return False


def spec_compat(old: TableConstraints, new: TableConstraints) -> List[Dict]:
    """Schema-evolution audit: is every table VALID under ``old`` still
    valid under ``new``?  The gate a production deployment runs before
    re-validating a 100-TB corpus against an updated spec — a breaking
    change means previously-green partitions may now fail.

    Returns one finding per change: ``{"item", "change", "compatible",
    "detail"}``; backward-compatible iff all ``compatible``. Sound, not
    complete (pattern containment and nested-stack implication are only
    recognized on identity, so some safe changes report breaking — never
    the reverse). The evolution counterpart of :func:`restrict` /
    :func:`extend` (reference: ``simple_types.py:879-930`` runs the same
    facet algebra at build time)."""
    out: List[Dict] = []

    def add(item: str, change: str, compatible: bool, detail: str = "") -> None:
        out.append(
            {"item": item, "change": change, "compatible": compatible, "detail": detail}
        )

    old_cols = {c.name: c for c in old.columns}
    new_cols = {c.name: c for c in new.columns}
    for name, oc in old_cols.items():
        nc = new_cols.get(name)
        if nc is None:
            add(
                f"column {name}",
                "dropped",
                bool(new.allow_extra_columns),
                "now unchecked" if new.allow_extra_columns else "extra columns rejected",
            )
            continue
        if str(oc.dtype) != str(nc.dtype):
            add(f"column {name}", "dtype changed", False, f"{oc.dtype} -> {nc.dtype}")
            continue  # facet values live in the old dtype's domain — not comparable
        if oc.nullable and not nc.nullable:
            add(f"column {name}", "nullable -> non-null", False, "old nulls now fail")
        if not oc.required and nc.required:
            add(f"column {name}", "optional -> required", False, "absent column now fails")
        for f in nc.facets:
            try:
                implied = _facet_implied(oc.facets, f)
            except TypeError:  # un-comparable values: report, don't crash
                implied = False
            if not implied:
                add(
                    f"column {name}",
                    f"facet added/tightened: {f.describe()}",
                    False,
                    "old-valid values may fail",
                )
    for name, nc in new_cols.items():
        if name not in old_cols:
            if nc.required:
                compatible, detail = False, "required column absent from old data"
            elif old.allow_extra_columns:
                # old data MAY already carry this column (it was an
                # unchecked extra); the new spec now checks its dtype and
                # facets — sound classification is breaking
                compatible, detail = False, (
                    "optional, but old data may carry this column unchecked "
                    "(old allow_extra_columns=True) and now fail its checks"
                )
            else:
                compatible, detail = True, "optional; old data cannot contain it"
            add(f"column {name}", "added", compatible, detail)

    if old.allow_extra_columns and not new.allow_extra_columns:
        add(
            "allow_extra_columns",
            "True -> False",
            False,
            "old files carrying extra columns now fail schema.unexpected_column",
        )

    # severity changes: demoting a constraint to warning relaxes the gate
    # (old-valid stays valid); promoting a warning back to error means rows
    # that only warned before now flip partitions to invalid
    old_warn, new_warn = set(old.warning_constraints), set(new.warning_constraints)
    for w in sorted(new_warn - old_warn):
        add(f"constraint {w}", "error -> warning", True, "violations no longer flip validity")
    for w in sorted(old_warn - new_warn):
        add(
            f"constraint {w}",
            "warning -> error",
            False,
            "rows that only warned under old now make partitions invalid",
        )

    def _defn(kind: str, k) -> "str | None":
        """Stable structural identity, or None when not comparable.

        Row checks carry a stable identity only when built through serde
        (``_serde`` dict); for programmatically-built checks ``repr(fn)``
        embeds a memory address, so two builds of the SAME closure would
        spuriously read as "definition changed" — those compare as
        ``None`` (not comparable) instead.
        """
        if kind == "unique_key":
            # require_present=True is xs:key mode: flipping it on is a
            # definition change (old-valid data with null key fields now
            # fails) and surfaces through the generic breaking path below
            return f"columns={tuple(k.columns)},require_present={k.require_present}"
        if kind == "foreign_key":
            return f"{k.column}->{k.dim_name}.{k.dim_key}"
        if kind == "temporal_foreign_key":
            return (
                f"{k.column}@{k.ts_column}->{k.dim_name}.{k.dim_key}"
                f"[{k.dim_valid_from},{k.dim_valid_to})"
            )
        if kind == "aggregate_check":
            return (
                f"{k.agg}({k.column}) by {k.group_by} in "
                f"[{k.min_value},{k.max_value}]"
            )
        if kind == "sequence_check":
            return (
                f"by {tuple(k.group_by)} order {tuple(k.order_by)}: "
                f"{k.column} {k.kind}"
                + (f"(max_gap={k.max_gap})" if k.max_gap is not None else "")
                + (f"(end={k.end_column})" if k.end_column is not None else "")
            )
        if kind == "reconcile_check":
            return (
                f"key {k.key} {k.agg}({k.column}) x{k.scale} vs "
                f"{k.dim_name}.{k.dim_key}={k.expected}±{k.tolerance}, "
                f"missing={k.check_missing_details}, orphan={k.check_orphan_details}"
            )
        if kind == "manifest_check":
            return (
                f"by {k.group_by} vs {k.dim_name}.{k.dim_key}: "
                f"count={k.expected_count}±{k.count_tolerance}, "
                f"sum({k.column})={k.expected_sum}±{k.sum_tolerance}, "
                f"missing={k.check_missing}, unexpected={k.check_unexpected}"
            )
        meta = getattr(k, "_serde", None)
        return str(meta) if meta is not None else None

    for kind, old_items, new_items in (
        ("unique_key", old.unique_keys, new.unique_keys),
        ("foreign_key", old.foreign_keys, new.foreign_keys),
        ("temporal_foreign_key", old.temporal_foreign_keys, new.temporal_foreign_keys),
        ("aggregate_check", old.aggregate_checks, new.aggregate_checks),
        ("manifest_check", old.manifest_checks, new.manifest_checks),
        ("sequence_check", old.sequence_checks, new.sequence_checks),
        ("reconcile_check", old.reconcile_checks, new.reconcile_checks),
        ("row_check", old.row_checks, new.row_checks),
    ):
        old_by = {k.name: k for k in old_items}
        new_by = {k.name: k for k in new_items}
        for n in sorted(set(new_by) - set(old_by)):
            add(f"{kind} {n}", "added", False, "old data never checked against it")
        for n in sorted(set(old_by) - set(new_by)):
            add(f"{kind} {n}", "removed", True, "")
        for n in sorted(set(old_by) & set(new_by)):
            od, nd = _defn(kind, old_by[n]), _defn(kind, new_by[n])
            if od is None or nd is None:
                if tuple(old_by[n].columns) != tuple(new_by[n].columns):
                    add(
                        f"{kind} {n}",
                        "definition changed",
                        False,
                        f"columns {tuple(old_by[n].columns)} -> {tuple(new_by[n].columns)}",
                    )
                else:
                    # at least one side is a programmatic check with no
                    # stable serde identity: a body change would be
                    # INVISIBLE here, so always surface the undecidability
                    # (never silently pass) instead of guessing either way
                    add(
                        f"{kind} {n}",
                        "not comparable",
                        True,
                        "row-check body has no stable serde identity on at "
                        "least one side; compare semantics manually (build "
                        "via make_row_check for a comparable identity)",
                    )
            elif od != nd:
                # a same-named constraint with a different definition is an
                # added constraint in disguise (may be strictly tighter)
                add(f"{kind} {n}", "definition changed", False, f"{od} -> {nd}")

    return out
