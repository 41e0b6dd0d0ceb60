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
