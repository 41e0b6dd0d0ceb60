"""Declarative table constraints — the compiled-schema analog.

The reference compiles an XSD document into an ``XsdGlobals`` object graph
once, then reuses it for every validation run
(``/root/reference/xmlschema/validators/globals_.py:204-474``). Our analog is
``TableConstraints``: a small, pickleable, declarative spec — an Arrow schema
plus per-column facet stacks, row-level checks, identity constraints and
drift profiles — compiled and linted ONCE on the driver, then shipped to
workers by closure / actor ``__init__`` (cheap: it is pure data).

Spec linting mirrors the reference's schema-build-time checks:

* facet consistency (``validators/simple_types.py:134-231``),
* duplicate/ambiguous constraint names — the Unique Particle Attribution
  analog (``validators/models.py:186-224`` ``check_model``),
* keyref wiring resolved at compile time (``validators/identities.py:257-288``
  ``parse_refer``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

from xmlschema_ray.constraints.facets import Facet, SpecError, lint_facet_stack

__all__ = [
    "AggregateCheck",
    "AltCase",
    "ColumnSpec",
    "DriftSpec",
    "ForeignKey",
    "LengthEquals",
    "ManifestCheck",
    "RowCheck",
    "SequenceCheck",
    "SpecError",
    "TableConstraints",
    "TypeAlternatives",
    "UniqueKey",
]


@dataclass(frozen=True)
class ColumnSpec:
    """One column: dtype + nullability + facet stack.

    The analog of an ``XsdAtomicRestriction``/``XsdList`` with its facet
    chain (``validators/simple_types.py:1136-1167``). ``required`` missing
    column = required-attribute violation (``validators/attributes.py:578-581``);
    ``nullable=False`` = minOccurs>=1 on the value.
    """

    name: str
    dtype: pa.DataType
    nullable: bool = False
    required: bool = True
    facets: Tuple[Facet, ...] = ()

    def __post_init__(self):
        # dataclass(frozen) + mutable default workaround: accept lists.
        if not isinstance(self.facets, tuple):
            object.__setattr__(self, "facets", tuple(self.facets))


@dataclass(frozen=True)
class RowCheck:
    """Arbitrary row-level assertion: ``fn(table) -> bool violation mask``.

    The XSD 1.1 assertion escape hatch (``validators/facets.py:631-676``,
    ``assertions.py:21-81``): a user-supplied vectorized predicate compiled
    once and run per batch. ``fn`` takes a ``pa.Table`` and returns a numpy
    bool array (True = violation).
    """

    name: str
    columns: Tuple[str, ...]
    fn: Callable[[pa.Table], np.ndarray]
    reason: str = "row assertion failed"


class _LengthEqualsFn:
    """Module-level callable so specs stay plain-picklable (closures would
    only survive cloudpickle)."""

    def __init__(self, list_col: str, int_col: str):
        self.list_col = list_col
        self.int_col = int_col

    def __call__(self, table: pa.Table) -> np.ndarray:
        import pyarrow.compute as pc

        actual = pc.list_value_length(table[self.list_col])
        declared = table[self.int_col]
        eq = pc.equal(pc.cast(actual, pa.int64()), pc.cast(declared, pa.int64()))
        ok = eq.combine_chunks().fill_null(False).to_numpy(zero_copy_only=False)
        both_null = pc.and_(pc.is_null(table[self.list_col]), pc.is_null(table[self.int_col]))
        ok |= both_null.combine_chunks().fill_null(False).to_numpy(zero_copy_only=False)
        return ~ok


def LengthEquals(list_col: str, int_col: str, name: Optional[str] = None) -> RowCheck:
    """Declared-length-equals-actual-length consistency check.

    ``n_tok == len(tokens)`` is the tabular form of "declared occurs must
    equal observed occurs" (``validators/xsdbase.py:754-799``
    ``is_missing``/``is_over``).
    """
    check = RowCheck(
        name=name or f"{int_col}_equals_len_{list_col}",
        columns=(list_col, int_col),
        fn=_LengthEqualsFn(list_col, int_col),
        reason=f"{int_col} != len({list_col})",
    )
    # declarative origin marker so the spec serializer can round-trip it
    object.__setattr__(
        check,
        "_serde",
        {"kind": "length_equals", "list_col": list_col, "int_col": int_col, "name": check.name},
    )
    return check


@dataclass(frozen=True)
class ColumnAlias:
    """Substitution-group analog: one facet stack declared once on a HEAD
    column applies to every MEMBER column name.

    The reference expands ``xs:substitutionGroup`` at schema build — member
    elements substitute for the head and inherit its type
    (``validators/elements.py:282-332`` builds the map, ``430-434`` walks
    it at decode). The tabular analog expands at :meth:`TableConstraints
    .compile`: each member becomes a clone of the head's ``ColumnSpec``
    (dtype, nullability, facets) with ``required=False`` — a member column
    may appear in place of (or alongside) the head and is validated by the
    head's stack; a batch without it is fine. Expansion is idempotent and
    a member that conflicts with an explicitly-declared different spec is
    a compile error."""

    head: str
    members: Tuple[str, ...]

    def __post_init__(self):
        if not isinstance(self.members, tuple):
            object.__setattr__(self, "members", tuple(self.members))


_ALT_OPS = ("==", "!=", "<", "<=", ">", ">=", "in", "is_null", "not_null")


@dataclass(frozen=True)
class AltCase:
    """One ``xs:alternative``: a declarative test over a discriminant
    column plus the facet stack of the alternative type.

    The reference's test is an XPath over the element's attributes
    (``validators/elements.py:803-857`` ``XsdAlternative``); the columnar
    analog is a single vectorizable comparison on a sibling column. The
    test is declarative (column/op/value) so specs stay JSON-serializable
    and the engine can evaluate it with one Arrow kernel."""

    column: str  # discriminant column the test reads
    op: str  # one of _ALT_OPS
    value: Any  # literal; sequence for "in"; ignored for is_null/not_null
    facets: Tuple[Facet, ...]
    type_name: str  # label used in constraint names

    def __post_init__(self):
        if not isinstance(self.facets, tuple):
            object.__setattr__(self, "facets", tuple(self.facets))
        if self.op not in _ALT_OPS:
            raise SpecError(f"alternative test op {self.op!r} not in {_ALT_OPS}")


@dataclass(frozen=True)
class TypeAlternatives:
    """XSD 1.1 conditional type assignment for one value column.

    The analog of an element's ``xs:alternative`` list
    (``validators/elements.py:758-791`` ``_parse_alternatives`` +
    ``get_type``): per row, the FIRST case whose test matches selects the
    alternative type. Every alternative type must be a valid RESTRICTION
    of the declared type — the reference's ``type.is_derived(parent.type)``
    check (``elements.py:850-851``), enforced facet-by-facet with the
    derivation algebra in ``constraints/derive.py`` — and therefore
    INHERITS the declared ``ColumnSpec.facets`` (which validate every row,
    like any XSD base-type facet survives restriction) and ADDS its own
    ``case.facets`` to the rows it matches. Rows matching no case (or
    whose discriminant column is absent) are the default type: declared
    facets only."""

    column: str  # the value column being validated
    cases: Tuple[AltCase, ...]
    name: Optional[str] = None

    def __post_init__(self):
        if not isinstance(self.cases, tuple):
            object.__setattr__(self, "cases", tuple(self.cases))
        if self.name is None:
            object.__setattr__(self, "name", f"alt_{self.column}")


@dataclass(frozen=True)
class UniqueKey:
    """Global uniqueness of a column tuple.

    The ``xs:unique``/``xs:key``/``xs:ID`` analog
    (``validators/identities.py:198-221``, ``simple_types.py:508-516``):
    global exact uniqueness cannot be checked inside one batch — it becomes
    a hash-partitioned count shuffle in the engine (stage B).

    ``require_present`` carries the ``xs:key`` vs ``xs:unique`` distinction
    (``validators/identities.py:232-249`` ``XsdKey``: every field must
    RESOLVE; ``xs:unique`` simply exempts rows with absent fields): with
    the default ``False``, rows with a null key field are exempt from the
    uniqueness check (two nulls are not duplicates — the reference's
    unique semantics, and this engine's stage-A ``drop_null``); with
    ``True``, a null key field is itself a violation
    (``{name}.key_absent``), caught row-locally in stage A with no extra
    exchange.
    """

    columns: Tuple[str, ...]
    name: Optional[str] = None
    require_present: bool = False

    def __post_init__(self):
        if not isinstance(self.columns, tuple):
            object.__setattr__(self, "columns", tuple(self.columns))
        if self.name is None:
            object.__setattr__(self, "name", "unique_" + "_".join(self.columns))


@dataclass(frozen=True)
class ForeignKey:
    """Referential integrity: fact column values ⊆ dimension key set.

    The ``xs:keyref`` analog (``validators/identities.py:232-318``): keyref
    field tuples must exist in the referenced key set; a violation is an
    unmatched tuple. The engine checks this with the dimension key set
    broadcast once (``ray.put``) and membership-tested per batch in an actor
    pool (stage C) — dimension ≪ fact, so no shuffle.
    """

    column: "str | Tuple[str, ...]"
    dim_name: str
    dim_key: "str | Tuple[str, ...]"
    name: Optional[str] = None

    def __post_init__(self):
        # composite keyrefs (the reference's multi-field xs:field lists,
        # identities.py:118-150) pass tuples; singles stay plain strings
        # so every single-column code path and default name is unchanged
        if not isinstance(self.column, str):
            cols = tuple(self.column)
            object.__setattr__(self, "column", cols[0] if len(cols) == 1 else cols)
        if not isinstance(self.dim_key, str):
            keys = tuple(self.dim_key)
            object.__setattr__(self, "dim_key", keys[0] if len(keys) == 1 else keys)
        if len(self.columns) != len(self.dim_keys):
            raise ValueError(
                f"foreign key {self.name or self.column!r}: column tuple "
                f"{self.columns} and dim key tuple {self.dim_keys} differ in length"
            )
        if self.name is None:
            cols = "_".join(self.columns)
            object.__setattr__(self, "name", f"fk_{cols}_refs_{self.dim_name}")

    @property
    def columns(self) -> Tuple[str, ...]:
        return (self.column,) if isinstance(self.column, str) else self.column

    @property
    def dim_keys(self) -> Tuple[str, ...]:
        return (self.dim_key,) if isinstance(self.dim_key, str) else self.dim_key


@dataclass(frozen=True)
class TemporalForeignKey:
    """TEMPORAL referential integrity (the SCD2 keyref, stage B5): each
    fact row's ``(column, ts_column)`` must be covered by a dimension
    VERSION row with ``dim_key == column`` and
    ``dim_valid_from <= ts < dim_valid_to`` (half-open, the SCD2
    convention shared with ``SequenceCheck(kind="no_overlap")``).

    The warehouse refinement of :class:`ForeignKey`: an ordinary keyref
    asks "does the key exist", this asks "did a version of it exist WHEN
    the fact happened" — the integrity rule every point-in-time
    enrichment (``orders_scd2_enrich``) silently assumes, promoted to a
    checked constraint. A fact whose key has dim rows but none covering
    its timestamp is exactly as broken as a missing key (a join at that
    timestamp drops it), so both fail with coverage-specific reasons.
    Null ``column`` or ``ts_column`` rows are exempt (the xs:unique
    null-exemption convention). Always distributed — version dims are
    key-cardinality × versions, too large to assume broadcastable.
    """

    column: str
    ts_column: str
    dim_name: str
    dim_key: str
    dim_valid_from: str = "valid_from"
    dim_valid_to: str = "valid_to"
    name: Optional[str] = None

    def __post_init__(self):
        if self.dim_valid_from == self.dim_valid_to:
            raise SpecError(
                f"temporal foreign key on {self.column!r}: dim_valid_from and "
                "dim_valid_to name the same column"
            )
        if self.name is None:
            object.__setattr__(
                self, "name", f"tfk_{self.column}_at_{self.ts_column}_refs_{self.dim_name}"
            )


@dataclass(frozen=True)
class AggregateCheck:
    """Dataset-level aggregate constraint — the TABLE-scope counterpart of
    a row assertion (``xs:assert`` evaluates one element tree,
    ``validators/assertions.py``; this bounds an aggregate over the WHOLE
    dataset): ``count`` / ``sum`` / ``mean`` / ``null_fraction`` of
    ``column``, per ``group_by`` value or globally, must lie in
    ``[min_value, max_value]``.

    Rides the mergeable stats channel (one integer/float triple per
    observed group per batch — the exchange cost is group cardinality,
    never row count) and is evaluated on the driver in stage D, like the
    drift gates. Partitioning assumption: ``group_by`` is a
    bounded-cardinality provenance label (source / lang / shard), the
    same assumption grouped drift makes. A violated group emits one
    group-keyed violation row through the canonical sink.
    """

    name: str
    agg: str  # count | sum | mean | null_fraction
    column: Optional[str] = None  # required unless agg == "count"
    group_by: Optional[str] = None
    min_value: Optional[float] = None
    max_value: Optional[float] = None

    _AGGS = ("count", "sum", "mean", "null_fraction")

    def lint(self, known: set) -> None:
        if self.agg not in self._AGGS:
            raise SpecError(
                f"aggregate check {self.name!r}: unknown agg {self.agg!r} "
                f"(expected one of {self._AGGS})"
            )
        if self.agg != "count" and self.column is None:
            raise SpecError(
                f"aggregate check {self.name!r}: agg {self.agg!r} requires a column"
            )
        if self.column is not None and self.column not in known:
            raise SpecError(
                f"aggregate check {self.name!r} references unknown column {self.column!r}"
            )
        if self.group_by is not None and self.group_by not in known:
            raise SpecError(
                f"aggregate check {self.name!r} group_by references unknown "
                f"column {self.group_by!r}"
            )
        if self.min_value is None and self.max_value is None:
            raise SpecError(f"aggregate check {self.name!r} declares no bounds")


@dataclass(frozen=True)
class ManifestCheck:
    """Cross-table aggregate RECONCILIATION against an expected-values
    manifest dimension — the ingest/delivery validation no row-local check
    expresses: per ``group_by`` value (a provenance label: source, shard,
    lang), the observed row COUNT and/or the observed SUM of ``column``
    must match what the manifest table declares for that group. The
    header/detail totals check every warehouse load runs, and the tabular
    analog of validating a document against an external inventory the way
    keyref validates membership against an external key set
    (``validators/identities.py:290-318``) — here the dim carries expected
    AGGREGATES, not keys.

    Physical plan: observed aggregates ride the SAME mergeable stats
    channel as ``AggregateCheck`` (one (n, nulls, sum) triple per observed
    group per batch — exchange cost is group cardinality, never rows); the
    manifest dim is group-cardinality-sized by assumption and loads
    driver-side like a broadcast FK dim; the compare is a stage-D driver
    fold. Violations are group-keyed rows (``partition_id = -1``) named
    ``{name}.count_mismatch`` / ``{name}.sum_mismatch`` /
    ``{name}.missing_group`` (manifest group with no observed rows) /
    ``{name}.unexpected_group`` (observed group absent from the manifest);
    each is independently demotable to warning severity.

    Exactness: group sums accumulate per batch via float64 bincount and
    merge by addition — exact for integer-valued columns below 2^53
    (lint rejects float columns with ``sum_tolerance == 0`` to keep the
    zero-tolerance path honest).
    """

    name: str
    group_by: str
    dim_name: str  # key into run(dims={...})
    dim_key: str  # manifest column holding the group values
    expected_count: Optional[str] = None  # manifest column: expected row count
    column: Optional[str] = None  # data column whose SUM reconciles
    expected_sum: Optional[str] = None  # manifest column: expected sum
    count_tolerance: int = 0
    sum_tolerance: float = 0.0
    check_missing: bool = True
    check_unexpected: bool = True

    KINDS = ("count_mismatch", "sum_mismatch", "missing_group", "unexpected_group")

    def lint(self, known: set, columns=None) -> None:
        if self.group_by not in known:
            raise SpecError(
                f"manifest check {self.name!r} group_by references unknown "
                f"column {self.group_by!r}"
            )
        if (self.expected_sum is None) != (self.column is None):
            raise SpecError(
                f"manifest check {self.name!r}: column and expected_sum must be "
                "declared together (the sum needs both sides)"
            )
        if self.expected_count is None and self.expected_sum is None:
            raise SpecError(
                f"manifest check {self.name!r} declares neither expected_count "
                "nor expected_sum — nothing to reconcile"
            )
        if self.column is not None:
            if self.column not in known:
                raise SpecError(
                    f"manifest check {self.name!r} references unknown column "
                    f"{self.column!r}"
                )
            if columns is not None and self.sum_tolerance == 0:
                col = next((c for c in columns if c.name == self.column), None)
                if col is not None and pa.types.is_floating(col.dtype):
                    raise SpecError(
                        f"manifest check {self.name!r}: zero sum_tolerance on a "
                        f"float column {self.column!r} — float partial sums merge "
                        "in parallelism-dependent order; set sum_tolerance > 0"
                    )
        if self.count_tolerance < 0 or self.sum_tolerance < 0:
            raise SpecError(f"manifest check {self.name!r}: negative tolerance")


@dataclass(frozen=True)
class ReconcileCheck:
    """Per-KEY header/detail reconciliation — the FACT-scale counterpart
    of ``ManifestCheck`` (whose dim is group-cardinality by assumption and
    loads driver-side): here the expected values live in a header table
    with one row per JOIN KEY (orders vs their lineitems, invoices vs
    positions, shards vs their chunk inventories), so neither side can
    broadcast and the check earns its own exchanges (stage B4,
    ``engine.py _reconcile_check_violations``) — the "books balance"
    constraint class every warehouse load and every sharded-corpus
    delivery runs at detail level.

    Semantics, per header key ``k``: the observed ``count`` of detail
    rows (or the observed scaled-integer ``sum`` of ``column``) must
    match ``expected`` within ``tolerance``. Violations (all key-level,
    ``partition_id = -1`` — an aggregate across files has no single-file
    lineage): ``{name}.mismatch``, ``{name}.missing_details`` (header key
    with no detail rows), ``{name}.orphan_details`` (detail key absent
    from the header); each independently demotable to warning severity.

    Exactness: sums accumulate PER-ROW scaled integers
    ``floor(value · scale + 0.5)`` (int64), the suite's cents discipline —
    the only order-independent definition, so the verdict is identical at
    any parallelism and a SQL oracle replays it verbatim; ``expected``
    scales the same way and ``tolerance`` is in scaled units.

    Physical plan: per-batch (key, n, sum) partials → ONE key-combiner
    exchange (key-cardinality rows, the uniqueness-channel class), then
    ONE co-partitioning exchange joining the observed aggregates against
    the header projection — never the detail rows, never a broadcast.
    """

    name: str
    key: str  # detail-side join key column
    agg: str  # count | sum
    dim_name: str  # run(dims={...}) entry: the header table
    dim_key: str  # header's key column
    expected: str  # header column holding the expected value
    column: Optional[str] = None  # detail column summed (required iff agg == "sum")
    scale: int = 1  # per-row integer scaling for sum (100 = cents)
    tolerance: int = 0  # in scaled units
    check_missing_details: bool = True
    check_orphan_details: bool = True

    KINDS = ("mismatch", "missing_details", "orphan_details")
    _AGGS = ("count", "sum")

    def lint(self, known: set) -> None:
        if self.agg not in self._AGGS:
            raise SpecError(
                f"reconcile check {self.name!r}: unknown agg {self.agg!r} "
                f"(expected one of {self._AGGS})"
            )
        if (self.agg == "sum") != (self.column is not None):
            raise SpecError(
                f"reconcile check {self.name!r}: column must be set exactly "
                "when agg == 'sum'"
            )
        if self.key not in known:
            raise SpecError(
                f"reconcile check {self.name!r} references unknown key column {self.key!r}"
            )
        if self.column is not None and self.column not in known:
            raise SpecError(
                f"reconcile check {self.name!r} references unknown column {self.column!r}"
            )
        if self.scale < 1:
            raise SpecError(f"reconcile check {self.name!r}: scale must be >= 1")
        if self.tolerance < 0 or int(self.tolerance) != self.tolerance:
            raise SpecError(
                f"reconcile check {self.name!r}: tolerance must be a "
                "non-negative integer in scaled units"
            )


@dataclass(frozen=True)
class SequenceCheck:
    """Per-key ORDERED-STREAM constraint — the cross-partition sequence
    property no row-local check can see (§2.11 streaming concerns: the
    reference's lazy mode explicitly SKIPS cross-subtree constraints,
    ``validators/elements.py:547-549`` TODO, because they need state
    beyond one streaming unit; here they get their own exchange instead):
    within each ``group_by`` key group, ordered by ``order_by`` (append
    tie-breaker columns until the order is total — an ambiguous order
    would make the verdict parallelism-dependent), ``column`` must be
    ``strictly_increasing`` / ``non_decreasing`` across consecutive rows,
    or its consecutive deltas must not exceed ``max_gap`` (stream-
    continuity: a telemetry/CDC feed with a hole). The violation is the
    LATER row of each offending adjacent pair.

    ``kind="no_overlap"`` generalizes the pair compare to INTERVALS:
    ``column`` is the interval start, ``end_column`` the interval end,
    and within each group (ordered by ``order_by``, which must lead with
    the start column so the sweep sees intervals in start order) a row
    violates when its start precedes the RUNNING MAX of all earlier
    rows' ends — the SCD2 validity-interval integrity check ("no two
    versions of a key may be valid at once"; touching intervals,
    ``start == prev_end``, are legal). The running max, not the adjacent
    end, because a long early interval can cover a later short one that
    an adjacent-pair compare would miss. Rows with a null start or null
    end are exempt and contribute no coverage (xs:unique's null
    exemption).

    Physical plan (stage B3, ``engine.py _sequence_check_violations``):
    ONE co-locating hash exchange of the PRUNED projection (group +
    order + checked + violation-key columns — never the full row), then a
    vectorized sort + shift compare per partition; group streams arrive
    whole, so no second exchange. Null checked values are order-exempt
    (pairs touching a null are skipped), mirroring xs:unique's null
    exemption. Partitioning assumption: one GROUP's rows fit a worker
    (user/device streams, not corpus-wide groups).
    """

    name: str
    group_by: Tuple[str, ...]
    order_by: Tuple[str, ...]
    column: str
    kind: str = "non_decreasing"  # strictly_increasing | non_decreasing | max_gap | no_overlap
    max_gap: Optional[int] = None  # required iff kind == "max_gap"; integer units
    # (µs for timestamp columns — timestamps compare as int64 microseconds)
    end_column: Optional[str] = None  # required iff kind == "no_overlap"

    KINDS = ("strictly_increasing", "non_decreasing", "max_gap", "no_overlap")

    def __post_init__(self):
        if not isinstance(self.group_by, tuple):
            object.__setattr__(self, "group_by", tuple(self.group_by))
        if not isinstance(self.order_by, tuple):
            object.__setattr__(self, "order_by", tuple(self.order_by))

    def lint(self, known: set) -> None:
        if self.kind not in self.KINDS:
            raise SpecError(
                f"sequence check {self.name!r}: unknown kind {self.kind!r} "
                f"(expected one of {self.KINDS})"
            )
        if (self.kind == "max_gap") != (self.max_gap is not None):
            raise SpecError(
                f"sequence check {self.name!r}: max_gap must be set exactly "
                "when kind == 'max_gap'"
            )
        if self.max_gap is not None and self.max_gap < 0:
            raise SpecError(f"sequence check {self.name!r}: negative max_gap")
        if (self.kind == "no_overlap") != (self.end_column is not None):
            raise SpecError(
                f"sequence check {self.name!r}: end_column must be set "
                "exactly when kind == 'no_overlap'"
            )
        if self.end_column is not None and self.order_by[:1] != (self.column,):
            # the overlap sweep assumes start order — an order not led by
            # the start column would make "running max of earlier ends"
            # not mean "intervals that began before me"
            raise SpecError(
                f"sequence check {self.name!r}: no_overlap requires "
                f"order_by to lead with the start column {self.column!r}"
            )
        if not self.group_by:
            raise SpecError(f"sequence check {self.name!r}: empty group_by")
        if not self.order_by:
            raise SpecError(f"sequence check {self.name!r}: empty order_by")
        cols = (*self.group_by, *self.order_by, self.column) + (
            (self.end_column,) if self.end_column is not None else ()
        )
        for col in cols:
            if col not in known:
                raise SpecError(
                    f"sequence check {self.name!r} references unknown column {col!r}"
                )


@dataclass(frozen=True)
class DriftSpec:
    """Distribution-drift gate on a derived integer quantity.

    No reference analog (mandated by the north rule): the engine histograms
    ``quantity`` per batch (``length_of`` a list column or a numeric column
    directly), merges histograms driver-side, and compares against
    ``reference_hist`` with a two-sample KS statistic over the binned ECDFs
    and PSI. Exceeding either threshold fails the drift verdict — the stats
    channel, never the row-violation channel.

    ``group_by`` additionally gates every GROUP of the named column
    (one histogram per group value, merged through the normal stats
    channel): a single bad provenance source stays visible even when
    the aggregate mix still matches the reference. Each group compares
    against ``group_references[group]`` when provided (within-source
    drift vs that source's OWN prior profile — the production shape),
    falling back to the shared ``reference_hist`` (source-vs-corpus
    mix diagnostic). Group cardinality must be metadata-sized
    (provenance labels, not keys) — each group adds one ~2 KB
    histogram per shard.
    """

    column: str
    bin_edges: Tuple[float, ...]
    reference_hist: Optional[Tuple[int, ...]] = None
    ks_threshold: float = 0.15
    psi_threshold: float = 0.25
    use_list_length: bool = False
    group_by: Optional[str] = None
    group_references: Optional[Dict[str, Tuple[int, ...]]] = None
    name: Optional[str] = None

    def __post_init__(self):
        if not isinstance(self.bin_edges, tuple):
            object.__setattr__(self, "bin_edges", tuple(self.bin_edges))
        if self.reference_hist is not None and not isinstance(self.reference_hist, tuple):
            object.__setattr__(self, "reference_hist", tuple(self.reference_hist))
        if self.name is None:
            object.__setattr__(self, "name", f"drift_{self.column}")
        if len(self.bin_edges) < 2:
            raise SpecError("drift bin_edges needs >= 2 edges")
        if self.reference_hist is not None and len(self.reference_hist) != len(self.bin_edges) - 1:
            raise SpecError("reference_hist length must be len(bin_edges) - 1")
        if self.group_references is not None:
            if self.group_by is None:
                raise SpecError("group_references requires group_by")
            fixed = {}
            for g, h in self.group_references.items():
                if len(h) != len(self.bin_edges) - 1:
                    raise SpecError(
                        f"group_references[{g!r}] length must be len(bin_edges) - 1"
                    )
                # keys normalize to str: the engine looks references up by
                # the STRINGIFIED histogram suffix (f"{qname}@{gv}"), so a
                # Python-built spec with int source codes must behave like
                # the JSON-loaded equivalent (serde always yields str keys)
                fixed[str(g)] = tuple(h)
            object.__setattr__(self, "group_references", fixed)


@dataclass
class TableConstraints:
    """The full spec for one table. Compile with :meth:`compile` (lints).

    ``allow_extra_columns`` is the wildcard policy
    (``validators/wildcards.py:215-233`` ``XsdAnyElement`` processContents):
    ``True`` = lax (unknown columns pass through), ``False`` = strict
    (unknown column is a partition-level violation).
    """

    name: str
    columns: List[ColumnSpec]
    row_checks: List[RowCheck] = field(default_factory=list)
    unique_keys: List[UniqueKey] = field(default_factory=list)
    foreign_keys: List[ForeignKey] = field(default_factory=list)
    temporal_foreign_keys: List["TemporalForeignKey"] = field(default_factory=list)
    drift: List[DriftSpec] = field(default_factory=list)
    aggregate_checks: List[AggregateCheck] = field(default_factory=list)
    manifest_checks: List["ManifestCheck"] = field(default_factory=list)
    sequence_checks: List["SequenceCheck"] = field(default_factory=list)
    reconcile_checks: List["ReconcileCheck"] = field(default_factory=list)
    type_alternatives: List[TypeAlternatives] = field(default_factory=list)
    key_columns: Tuple[str, ...] = ()
    allow_extra_columns: bool = True
    # stats collection targets: numeric columns profiled min/max/mean/null;
    # distinct-sketch columns tracked with HyperLogLog.
    stats_columns: Tuple[str, ...] = ()
    distinct_columns: Tuple[str, ...] = ()
    # substitution-group alias sets, expanded into member ColumnSpecs at
    # compile (see ColumnAlias)
    aliases: Tuple["ColumnAlias", ...] = ()
    # per-constraint severity: violations of these constraint names are
    # WARNINGS — recorded and counted (verdicts carry n_warnings) but they
    # never flip validity. The per-constraint refinement of the
    # reference's lax validation mode (``xsdbase.py:24``: lax reports but
    # tolerates); an SLO rollout pattern — ship a new constraint as a
    # warning, observe, then promote it to an error.
    warning_constraints: Tuple[str, ...] = ()

    def __post_init__(self):
        if not self.key_columns and self.columns:
            self.key_columns = (self.columns[0].name,)
        if not isinstance(self.key_columns, tuple):
            self.key_columns = tuple(self.key_columns)
        if not isinstance(self.stats_columns, tuple):
            self.stats_columns = tuple(self.stats_columns)
        if not isinstance(self.distinct_columns, tuple):
            self.distinct_columns = tuple(self.distinct_columns)
        if not isinstance(self.warning_constraints, tuple):
            self.warning_constraints = tuple(self.warning_constraints)

    # -- compile-time -----------------------------------------------------

    def arrow_schema(self) -> pa.Schema:
        return pa.schema([pa.field(c.name, c.dtype, nullable=c.nullable) for c in self.columns])

    @staticmethod
    def walk_struct_type(t: "pa.DataType", parts) -> "pa.DataType | None":
        """Walk dotted-path segments through nested STRUCT types; ``None``
        when any segment is missing or descends into a non-struct. The one
        shared type-level resolver behind ``resolves_struct_path`` and the
        engine's footer-schema lookup (``_key_types_of``) — path semantics
        change in ONE place."""
        for part in parts:
            if not pa.types.is_struct(t):
                return None
            idx = t.get_field_index(part)
            if idx < 0:
                return None
            t = t.field(idx).type
        return t

    def resolves_struct_path(self, name: str) -> bool:
        """True iff a DOTTED name (``meta.license``) resolves through a
        declared STRUCT column to an existing non-nested leaf field — the
        XPath field-selector analog (reference
        ``validators/identities.py:64-150``: selectors address subtree
        fields; here metadata rides struct columns and identity keys may
        address their subfields). A declared flat column whose literal
        name contains a dot is NOT a path (declared names win)."""
        if "." not in name or any(c.name == name for c in self.columns):
            return False
        root, *rest = name.split(".")
        col = next((c for c in self.columns if c.name == root), None)
        if col is None or not rest or any(not p for p in rest):
            return False
        t = self.walk_struct_type(col.dtype, rest)
        return t is not None and not pa.types.is_nested(t)

    def dotted_key_paths(self) -> Tuple[str, ...]:
        """Every dotted struct path referenced as an identity key
        (``key_columns``, unique-key tuples, fact-side foreign-key
        columns) — the set the validator flattens into literal columns at
        batch entry (``augment_struct_keys``). Order-stable, deduped."""
        declared = {c.name for c in self.columns}
        out: List[str] = []
        for name in (
            list(self.key_columns)
            + [c for uk in self.unique_keys for c in uk.columns]
            + [c for fk in self.foreign_keys for c in fk.columns]
        ):
            if "." in name and name not in declared and name not in out:
                out.append(name)
        return tuple(out)

    def compile(self) -> "TableConstraints":
        """Lint the spec; returns self on success, raises SpecError.

        The analog of validating the schema document against the meta-schema
        before building (``validators/schema.py:350-354``) plus the UPA
        determinism check (``validators/models.py:186-224``). Substitution
        aliases expand FIRST (``elements.py:282-332`` analog): each alias
        member becomes an optional clone of its head's column spec.
        """
        if self.aliases:
            from dataclasses import replace as _replace

            if not isinstance(self.aliases, tuple):
                self.aliases = tuple(self.aliases)
            cols = list(self.columns)
            by_name = {c.name: c for c in cols}
            for al in self.aliases:
                head = by_name.get(al.head)
                if head is None:
                    raise SpecError(f"alias head {al.head!r} is not a declared column")
                for m in al.members:
                    if m == al.head:
                        raise SpecError(f"alias member {m!r} equals its head")
                    clone = _replace(head, name=m, required=False)
                    existing = by_name.get(m)
                    if existing is None:
                        cols.append(clone)
                        by_name[m] = clone
                    elif existing != clone:
                        raise SpecError(
                            f"alias member {m!r} conflicts with an explicitly "
                            "declared column spec"
                        )
            self.columns = cols
        names = [c.name for c in self.columns]
        if len(set(names)) != len(names):
            dupes = sorted({n for n in names if names.count(n) > 1})
            raise SpecError(f"duplicate column specs: {dupes}")
        known = set(names)
        for c in self.columns:
            try:
                lint_facet_stack(c.dtype, c.facets)
            except SpecError as e:
                raise SpecError(f"column {c.name!r}: {e}") from e
        seen_constraints: set = set()
        for label in self._constraint_names():
            if label in seen_constraints:
                raise SpecError(f"duplicate constraint name {label!r}")
            seen_constraints.add(label)
        # schema-level constraint families are emitted by the engine, not
        # declared — they are demotable to warnings too
        demotable = seen_constraints | {"schema.required_column", "schema.dtype", "schema.unexpected_column"}
        demotable |= {
            f"{mc.name}.{kind}" for mc in self.manifest_checks for kind in ManifestCheck.KINDS
        }
        demotable |= {
            f"{rc.name}.{kind}" for rc in self.reconcile_checks for kind in ReconcileCheck.KINDS
        }
        for w in self.warning_constraints:
            if w not in demotable:
                raise SpecError(
                    f"warning_constraints names unknown constraint {w!r} "
                    "(a typo here would silently leave it an error)"
                )
        for rc in self.row_checks:
            for col in rc.columns:
                if col not in known:
                    raise SpecError(f"row check {rc.name!r} references unknown column {col!r}")
        for uk in self.unique_keys:
            for col in uk.columns:
                if col not in known and not self.resolves_struct_path(col):
                    raise SpecError(
                        f"unique key {uk.name!r} references unknown column {col!r}"
                        + (" (dotted path does not resolve through a declared struct column)" if "." in col else "")
                    )
        for fk in self.foreign_keys:
            for col in fk.columns:
                if col not in known and not self.resolves_struct_path(col):
                    raise SpecError(
                        f"foreign key {fk.name!r} references unknown column {col!r}"
                        + (" (dotted path does not resolve through a declared struct column)" if "." in col else "")
                    )
        for tfk in self.temporal_foreign_keys:
            for col in (tfk.column, tfk.ts_column):
                if col not in known:
                    raise SpecError(
                        f"temporal foreign key {tfk.name!r} references unknown column {col!r}"
                    )
        for d in self.drift:
            if d.column not in known:
                raise SpecError(f"drift spec {d.name!r} references unknown column {d.column!r}")
            col = next(c for c in self.columns if c.name == d.column)
            is_list = pa.types.is_list(col.dtype) or pa.types.is_large_list(col.dtype)
            if d.use_list_length != is_list:
                raise SpecError(
                    f"drift spec {d.name!r}: use_list_length={d.use_list_length} "
                    f"inconsistent with dtype {col.dtype}"
                )
            if d.group_by is not None and d.group_by not in known:
                # a typo here would otherwise silently disable every
                # per-group gate (the grouped stats path skips absent
                # columns, and the read is pruned to declared columns)
                raise SpecError(
                    f"drift spec {d.name!r} group_by references unknown column {d.group_by!r}"
                )
        for ac in self.aggregate_checks:
            ac.lint(known)
        for mc in self.manifest_checks:
            mc.lint(known, self.columns)
        for sc in self.sequence_checks:
            sc.lint(known)
        for rc2 in self.reconcile_checks:
            rc2.lint(known)
        for col in self.key_columns:
            if col not in known and not self.resolves_struct_path(col):
                raise SpecError(
                    f"unknown column {col!r} in key_columns"
                    + (" (dotted path does not resolve through a declared struct column)" if "." in col else "")
                )
        for col in self.stats_columns + self.distinct_columns:
            if col not in known:
                raise SpecError(f"unknown column {col!r} in stats/distinct columns")
        alt_owned = set()
        for ta in self.type_alternatives:
            if ta.column not in known:
                raise SpecError(
                    f"type alternatives {ta.name!r} reference unknown column {ta.column!r}"
                )
            if ta.column in alt_owned:
                raise SpecError(f"column {ta.column!r} has multiple type-alternative lists")
            alt_owned.add(ta.column)
            declared = self.column(ta.column)
            from xmlschema_ray.constraints.derive import _check_one  # lazy: derive imports spec

            for case in ta.cases:
                if case.column not in known:
                    raise SpecError(
                        f"alternative {ta.name!r}/{case.type_name!r} tests unknown "
                        f"column {case.column!r}"
                    )
                try:
                    lint_facet_stack(declared.dtype, case.facets)
                except SpecError as e:
                    raise SpecError(f"alternative {case.type_name!r}: {e}") from e
                # each alternative type must be a valid restriction of the
                # declared (default) type — the is_derived check
                for f in case.facets:
                    _check_one(declared.facets, f, ta.column)
        return self

    def _constraint_names(self) -> List[str]:
        out: List[str] = []
        for c in self.columns:
            for f in c.facets:
                out.append(f"{c.name}.{f.describe()}")
        for ta in self.type_alternatives:
            for case in ta.cases:
                for f in case.facets:
                    out.append(f"{ta.column}.alt[{case.type_name}].{f.describe()}")
        out += [rc.name for rc in self.row_checks]
        out += [uk.name for uk in self.unique_keys]
        out += [fk.name for fk in self.foreign_keys]
        out += [tfk.name for tfk in self.temporal_foreign_keys]
        out += [d.name for d in self.drift]
        out += [ac.name for ac in self.aggregate_checks]
        out += [sc.name for sc in self.sequence_checks]
        out += [mc.name for mc in self.manifest_checks]
        out += [rc2.name for rc2 in self.reconcile_checks]
        return out

    def column(self, name: str) -> ColumnSpec:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)
