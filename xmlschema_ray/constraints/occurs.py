"""Particle occurrence arithmetic and composed content models.

The reference's ``ParticleCounter`` (``helpers.py:224-254``) does interval
arithmetic over (min_occurs, max_occurs) — ``+`` for concatenating
particles in a sequence, ``*`` for nesting under a repeated group, with
``None`` meaning *unbounded* — and ``ModelGroup`` (``validators/groups.py``)
composes particles into sequence/choice/all trees whose effective bounds
are checked during restriction (``groups.py`` ``admits_restriction`` /
``is_restriction``).

Tabular mapping: a *particle* is a LIST column whose per-row element count
is the observed occurs. A composed :class:`ContentGroup` propagates its
``(min, max)`` interval at COMPILE time (pure arithmetic, no data) and
:func:`group_occurs_check` turns the derived interval into ONE vectorized
row check over the summed list lengths — the flat-scan form of the
reference's ModelVisitor occurs accounting (per SURVEY §2.4, content-model
checks flatten to presence/length checks in the columnar world). For
``choice`` groups the summed-count envelope is the necessary-condition
projection of the automaton (exact branch tracking is a per-row state
machine the flat model deliberately avoids).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from xmlschema_ray.constraints.facets import SpecError
from xmlschema_ray.constraints.spec import RowCheck


@dataclass(frozen=True)
class OccursBounds:
    """(min_occurs, max_occurs) interval; ``max_occurs=None`` = unbounded.

    Immutable re-expression of the reference's mutating ``ParticleCounter``
    arithmetic (``helpers.py:233-253``): ``+`` concatenates (sequence),
    ``*`` nests (a group repeated ``other`` times), ``|`` envelopes
    (choice).
    """

    min_occurs: int = 0
    max_occurs: Optional[int] = None

    def __post_init__(self):
        if self.min_occurs < 0:
            raise SpecError("min_occurs must be >= 0")
        if self.max_occurs is not None and self.max_occurs < self.min_occurs:
            raise SpecError(
                f"max_occurs {self.max_occurs} < min_occurs {self.min_occurs}"
            )

    def __add__(self, other: "OccursBounds") -> "OccursBounds":
        mx = (
            None
            if self.max_occurs is None or other.max_occurs is None
            else self.max_occurs + other.max_occurs
        )
        return OccursBounds(self.min_occurs + other.min_occurs, mx)

    def __mul__(self, other: "OccursBounds") -> "OccursBounds":
        # reference helpers.py:243-253: unbounded×0 = 0, unbounded×n = unbounded
        if self.max_occurs is None:
            mx = 0 if other.max_occurs == 0 else None
        elif other.max_occurs is None:
            mx = 0 if self.max_occurs == 0 else None
        else:
            mx = self.max_occurs * other.max_occurs
        return OccursBounds(self.min_occurs * other.min_occurs, mx)

    def __or__(self, other: "OccursBounds") -> "OccursBounds":
        mx = (
            None
            if self.max_occurs is None or other.max_occurs is None
            else max(self.max_occurs, other.max_occurs)
        )
        return OccursBounds(min(self.min_occurs, other.min_occurs), mx)

    def contains(self, n: int) -> bool:
        return n >= self.min_occurs and (self.max_occurs is None or n <= self.max_occurs)

    def __repr__(self):
        hi = "unbounded" if self.max_occurs is None else self.max_occurs
        return f"occurs[{self.min_occurs},{hi}]"


@dataclass(frozen=True)
class Particle:
    """A leaf particle: ``column`` is a list column; each row's element
    count is its observed occurs, bounded by this particle's interval."""

    column: str
    min_occurs: int = 1
    max_occurs: Optional[int] = 1

    def bounds(self) -> OccursBounds:
        return OccursBounds(self.min_occurs, self.max_occurs)

    def leaf_columns(self) -> List[str]:
        return [self.column]


@dataclass(frozen=True)
class ContentGroup:
    """sequence / choice / all over particles and nested groups, with its
    own occurs — the ``ModelGroup`` analog. ``bounds()`` is the compile-time
    ParticleCounter propagation: children composed by the group kind, then
    multiplied by the group's own occurs interval."""

    kind: str
    particles: Tuple[Union[Particle, "ContentGroup"], ...]
    min_occurs: int = 1
    max_occurs: Optional[int] = 1

    def __post_init__(self):
        if not isinstance(self.particles, tuple):
            object.__setattr__(self, "particles", tuple(self.particles))

    def bounds(self) -> OccursBounds:
        if self.kind not in ("sequence", "choice", "all"):
            raise SpecError(f"unknown group kind {self.kind!r}")
        if not self.particles:
            raise SpecError("empty content group")
        inner = self.particles[0].bounds()
        for p in self.particles[1:]:
            inner = (inner | p.bounds()) if self.kind == "choice" else (inner + p.bounds())
        return inner * OccursBounds(self.min_occurs, self.max_occurs)

    def leaf_columns(self) -> List[str]:
        out: List[str] = []
        for p in self.particles:
            for c in p.leaf_columns():
                if c not in out:
                    out.append(c)
        return out

    def lint(self) -> None:
        """check_model analog: reject ambiguous choices (one column in two
        branches — the UPA violation projection) and malformed trees."""
        self.bounds()  # validates kinds/intervals recursively
        if self.kind == "choice":
            seen: set = set()
            for p in self.particles:
                cols = set(p.leaf_columns())
                dup = seen & cols
                if dup:
                    raise SpecError(
                        f"ambiguous choice: column(s) {sorted(dup)} appear in "
                        f"more than one branch (UPA violation analog)"
                    )
                seen |= cols
        for p in self.particles:
            if isinstance(p, ContentGroup):
                p.lint()


class _GroupOccursFn:
    """Module-level callable (plain-picklable) computing the violation mask
    for a composed group's derived interval: total observed occurs = sum of
    list lengths over the leaf columns (null list counts 0)."""

    def __init__(self, columns: Tuple[str, ...], min_occurs: int, max_occurs: Optional[int]):
        self.columns = columns
        self.min_occurs = min_occurs
        self.max_occurs = max_occurs

    def __call__(self, table: pa.Table) -> np.ndarray:
        total = np.zeros(table.num_rows, dtype=np.int64)
        for c in self.columns:
            n = pc.list_value_length(table[c])
            total += (
                pc.cast(n, pa.int64())
                .combine_chunks()
                .fill_null(0)
                .to_numpy(zero_copy_only=False)
            )
        bad = total < self.min_occurs
        if self.max_occurs is not None:
            bad |= total > self.max_occurs
        return bad


def group_occurs_check(group: ContentGroup, name: Optional[str] = None) -> RowCheck:
    """Compile a composed group to one vectorized row check on the derived
    bounds. The interval arithmetic happens HERE, once, at spec-compile
    time — the scan just compares a summed length column to two constants."""
    group.lint()
    b = group.bounds()
    cols = tuple(group.leaf_columns())
    check = RowCheck(
        name=name or f"group_{group.kind}_{'_'.join(cols)}",
        columns=cols,
        fn=_GroupOccursFn(cols, b.min_occurs, b.max_occurs),
        reason=f"total occurs outside {b!r}",
    )
    # serde identity (the derived-interval form, not the group tree: the
    # interval arithmetic already ran, so the JSON carries the compiled
    # bounds) — round-trips via the "group_occurs" row-check builder
    object.__setattr__(
        check,
        "_serde",
        {
            "kind": "group_occurs",
            "name": check.name,
            "columns": list(cols),
            "min_occurs": b.min_occurs,
            "max_occurs": b.max_occurs,
            "reason": check.reason,
        },
    )
    return check
