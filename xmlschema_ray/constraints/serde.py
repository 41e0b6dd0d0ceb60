"""TableConstraints ⇄ JSON — the schema-document analog.

The reference's schemas are declarative XSD documents compiled into
validator graphs (``/root/reference/xmlschema/validators/schema.py:253-364``);
our analog is a JSON spec document compiled into ``TableConstraints`` —
loading validates the document (unknown kinds / bad params raise
``SpecError``, the meta-schema-check analog, ``schema.py:350-354``).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List

import numpy as np
import pyarrow as pa

from xmlschema_ray.constraints import facets as F
from xmlschema_ray.constraints.spec import (
    AggregateCheck,
    AltCase,
    ColumnAlias,
    ColumnSpec,
    DriftSpec,
    ForeignKey,
    LengthEquals,
    ManifestCheck,
    RowCheck,
    ReconcileCheck,
    SequenceCheck,
    SpecError,
    TableConstraints,
    TemporalForeignKey,
    TypeAlternatives,
    UniqueKey,
)

_DTYPES = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "binary": pa.binary(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "uint64": pa.uint64(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    "bool": pa.bool_(),
    "timestamp[us]": pa.timestamp("us"),
    "list<int32>": pa.list_(pa.int32()),
    "list<int64>": pa.list_(pa.int64()),
    "list<float>": pa.list_(pa.float32()),
    "list<double>": pa.list_(pa.float64()),
    "list<string>": pa.list_(pa.string()),
}
_DTYPE_NAMES = {str(v): k for k, v in _DTYPES.items()}


def _dtype_to_name(dt: pa.DataType) -> str:
    if pa.types.is_struct(dt):
        inner = ",".join(
            f"{dt.field(i).name}:{_dtype_to_name(dt.field(i).type)}" for i in range(dt.num_fields)
        )
        return f"struct<{inner}>"
    if pa.types.is_list(dt) or pa.types.is_large_list(dt):
        # normalize the list element FIELD NAME: parquet readers spell it
        # "element", pa.list_ spells it "item" — same logical type
        dt = pa.list_(dt.value_type)
    name = _DTYPE_NAMES.get(str(dt))
    if name is None:
        raise SpecError(f"dtype {dt} has no JSON name")
    return name


def _split_fields(body: str) -> List[str]:
    """Split ``a:t1,b:struct<c:t2,...>`` on top-level commas only."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def _dtype_from_name(name: str) -> pa.DataType:
    if name.startswith("struct<") and name.endswith(">"):
        fields = []
        for part in _split_fields(name[len("struct<") : -1]):
            fname, _, ftype = part.partition(":")
            if not fname or not ftype:
                raise SpecError(f"malformed struct dtype name {name!r}")
            fields.append(pa.field(fname, _dtype_from_name(ftype)))
        return pa.struct(fields)
    if name not in _DTYPES:
        raise SpecError(f"unknown dtype name {name!r}")
    return _DTYPES[name]


# -- BUILDERS registry ----------------------------------------------------
#
# The facet-kind -> (class, serializer, parser) class-map, the analog of the
# reference's per-version BUILDERS registries (``facets.py:679-707``
# ``XSD_10_FACETS_BUILDERS``/``XSD_11_...``; wired into the schema class at
# ``schema.py:1202-1214``). Swapping an entry (re-registering a kind with a
# Facet subclass) changes which checker implementation a spec document
# compiles to — the tabular form of selecting component classes per XSD
# version / ``cls=`` engine subclass.


class FacetBuilder:
    __slots__ = ("kind", "cls", "to_json", "from_json")

    def __init__(self, kind, cls, to_json, from_json):
        self.kind = kind
        self.cls = cls
        self.to_json = to_json
        self.from_json = from_json


BUILDERS: Dict[str, FacetBuilder] = {}
_CLS_BUILDERS: Dict[type, FacetBuilder] = {}


def register_facet_builder(kind: str, cls: type, to_json, from_json) -> None:
    """Register (or replace — latest wins) the builder for a facet kind.

    ``to_json(facet) -> params dict`` (without ``kind``);
    ``from_json(doc) -> facet``. Registering a subclass under an existing
    kind swaps the implementation every subsequent ``load_spec`` builds.
    """
    b = FacetBuilder(kind, cls, to_json, from_json)
    BUILDERS[kind] = b
    _CLS_BUILDERS[cls] = b


def facet_to_json(f: F.Facet) -> Dict[str, Any]:
    b = _CLS_BUILDERS.get(type(f))
    if b is None:
        # unregistered subclass: fall back to the nearest registered base
        for base in type(f).__mro__[1:]:
            b = _CLS_BUILDERS.get(base)
            if b is not None:
                break
    if b is None:
        raise SpecError(f"facet {f!r} is not JSON-serializable (no registered builder)")
    return {"kind": b.kind, **b.to_json(f)}


def facet_from_json(d: Dict[str, Any]) -> F.Facet:
    kind = d.get("kind")
    b = BUILDERS.get(kind)
    if b is None:
        raise SpecError(f"unknown facet kind {kind!r}")
    return b.from_json(d)


# -- row-check registry ---------------------------------------------------
#
# The RowCheck counterpart of the facet BUILDERS map: arbitrary (vectorized)
# row predicates round-trip through spec JSON via a registered-name
# indirection, the same shape the reference uses to resolve assertion
# implementations at schema build (``facets.py:631-676`` XsdAssertionFacet
# compiled from its stored XPath source). A builder takes the params dict
# and returns a RowCheck; the loaded check carries the doc as its
# ``_serde`` identity so it re-serializes byte-identically and
# ``spec_compat`` can compare definitions structurally.

ROW_CHECK_BUILDERS: Dict[str, Any] = {}


def register_row_check_builder(kind: str, from_json) -> None:
    """Register (or replace — latest wins) the builder for a row-check
    kind: ``from_json(params_dict) -> RowCheck``. The builder's callable
    (and anything it closes over) must be plain-picklable — module-level
    classes, not closures — since compiled specs ship to workers."""
    ROW_CHECK_BUILDERS[kind] = from_json


def row_check_from_json(doc: Dict[str, Any]) -> RowCheck:
    kind = doc.get("kind")
    b = ROW_CHECK_BUILDERS.get(kind)
    if b is None:
        raise SpecError(
            f"unknown row check kind {kind!r}; register it with "
            "register_row_check_builder(kind, from_json)"
        )
    check = b(dict(doc))
    object.__setattr__(check, "_serde", dict(doc))
    return check


def make_row_check(kind: str, **params) -> RowCheck:
    """Build a registered row check WITH its serde identity attached —
    the portable way to put a custom predicate in a spec (a bare
    ``RowCheck(fn=...)`` works in-process but cannot serialize)."""
    return row_check_from_json({"kind": kind, **params})


register_row_check_builder(
    "length_equals",
    lambda d: LengthEquals(d["list_col"], d["int_col"], name=d.get("name")),
)


def _group_occurs_from_json(d: Dict[str, Any]) -> RowCheck:
    from xmlschema_ray.constraints.occurs import _GroupOccursFn

    cols = tuple(d["columns"])
    return RowCheck(
        name=d["name"],
        columns=cols,
        fn=_GroupOccursFn(cols, int(d["min_occurs"]), d.get("max_occurs")),
        reason=d.get("reason", "total occurs outside bounds"),
    )


register_row_check_builder("group_occurs", _group_occurs_from_json)


def _length_params(f) -> Dict[str, Any]:
    out: Dict[str, Any] = {"value": f.k}
    if f.encoding != "none":
        out["encoding"] = f.encoding
    return out


def _range_params(f) -> Dict[str, Any]:
    """Range-facet value → JSON. Datetime-like bounds (the watermark-facet
    shape; also what ``suggest_relaxations`` emits for timestamp columns)
    serialize as a tagged ISO-8601 string — a raw datetime object would
    crash ``json.dumps`` only AFTER a potentially corpus-sized scan."""
    import datetime

    v = f.value
    if isinstance(v, (np.datetime64, datetime.datetime, datetime.date)) or type(v).__name__ == "Timestamp":
        return {"value": str(np.datetime64(v, "us")), "value_type": "timestamp"}
    return {"value": v}


def _range_value(d: Dict[str, Any]):
    if d.get("value_type") == "timestamp":
        return np.datetime64(d["value"], "us")
    return d["value"]


register_facet_builder(
    "minInclusive", F.MinInclusive, _range_params, lambda d: F.MinInclusive(_range_value(d))
)
register_facet_builder(
    "maxInclusive", F.MaxInclusive, _range_params, lambda d: F.MaxInclusive(_range_value(d))
)
register_facet_builder(
    "minExclusive", F.MinExclusive, _range_params, lambda d: F.MinExclusive(_range_value(d))
)
register_facet_builder(
    "maxExclusive", F.MaxExclusive, _range_params, lambda d: F.MaxExclusive(_range_value(d))
)
register_facet_builder(
    "minLength", F.MinLength, _length_params,
    lambda d: F.MinLength(d["value"], encoding=d.get("encoding", "none")),
)
register_facet_builder(
    "maxLength", F.MaxLength, _length_params,
    lambda d: F.MaxLength(d["value"], encoding=d.get("encoding", "none")),
)
register_facet_builder(
    "length", F.Length, _length_params,
    lambda d: F.Length(d["value"], encoding=d.get("encoding", "none")),
)
register_facet_builder(
    "pattern", F.Pattern, lambda f: {"value": f.pattern, "xsd": f.xsd},
    lambda d: F.Pattern(d["value"], xsd=d.get("xsd", False)),
)
register_facet_builder(
    "enumeration", F.Enumeration, lambda f: {"values": list(f.values)},
    lambda d: F.Enumeration(tuple(d["values"])),
)
register_facet_builder(
    "whiteSpace", F.WhiteSpace, lambda f: {"value": f.policy}, lambda d: F.WhiteSpace(d["value"])
)
register_facet_builder(
    "totalDigits", F.TotalDigits, lambda f: {"value": f.k}, lambda d: F.TotalDigits(d["value"])
)
register_facet_builder(
    "fractionDigits", F.FractionDigits, lambda f: {"value": f.k}, lambda d: F.FractionDigits(d["value"])
)
register_facet_builder(
    "explicitTimezone", F.ExplicitTimezone, lambda f: {"value": f.value},
    lambda d: F.ExplicitTimezone(d["value"]),
)
register_facet_builder(
    "items", F.ItemFacets, lambda f: {"facets": [facet_to_json(x) for x in f.facets]},
    lambda d: F.ItemFacets(tuple(facet_from_json(x) for x in d["facets"])),
)
register_facet_builder(
    "uniqueItems", F.UniqueItems, lambda f: {}, lambda d: F.UniqueItems()
)
register_facet_builder(
    "union", F.UnionFacets,
    lambda f: {"alternatives": [[facet_to_json(x) for x in alt] for alt in f.alternatives]},
    lambda d: F.UnionFacets(
        tuple(tuple(facet_from_json(x) for x in alt) for alt in d["alternatives"])
    ),
)
register_facet_builder(
    "structField", F.StructField,
    lambda f: {
        "name": f.name,
        "facets": [facet_to_json(x) for x in f.facets],
        "required": f.required,
    },
    lambda d: F.StructField(
        d["name"], tuple(facet_from_json(x) for x in d.get("facets", [])),
        required=d.get("required", False),
    ),
)


def spec_to_json(spec: TableConstraints) -> Dict[str, Any]:
    doc: Dict[str, Any] = {
        "name": spec.name,
        "allow_extra_columns": spec.allow_extra_columns,
        "key_columns": list(spec.key_columns),
        "stats_columns": list(spec.stats_columns),
        "distinct_columns": list(spec.distinct_columns),
        "warning_constraints": list(spec.warning_constraints),
        "aliases": [
            {"head": a.head, "members": list(a.members)} for a in spec.aliases
        ],
        "columns": [
            {
                "name": c.name,
                "dtype": _dtype_to_name(c.dtype),
                "nullable": c.nullable,
                "required": c.required,
                "facets": [facet_to_json(f) for f in c.facets],
            }
            for c in spec.columns
        ],
        "row_checks": [],
        "type_alternatives": [
            {
                "name": ta.name,
                "column": ta.column,
                "cases": [
                    {
                        "column": c.column,
                        "op": c.op,
                        "value": list(c.value)
                        if isinstance(c.value, (tuple, set, frozenset))
                        else c.value,
                        "type_name": c.type_name,
                        "facets": [facet_to_json(f) for f in c.facets],
                    }
                    for c in ta.cases
                ],
            }
            for ta in spec.type_alternatives
        ],
        "unique_keys": [
            {
                "name": u.name,
                "columns": list(u.columns),
                # only serialized when set, so pre-existing spec documents
                # round-trip byte-identically
                **({"require_present": True} if u.require_present else {}),
            }
            for u in spec.unique_keys
        ],
        "foreign_keys": [
            {
                "name": k.name,
                # composite keyrefs serialize their tuples as lists; plain
                # strings stay strings so existing spec documents round-trip
                "column": k.column if isinstance(k.column, str) else list(k.column),
                "dim_name": k.dim_name,
                "dim_key": k.dim_key if isinstance(k.dim_key, str) else list(k.dim_key),
            }
            for k in spec.foreign_keys
        ],
        "drift": [
            {
                "name": d.name,
                "column": d.column,
                "bin_edges": list(d.bin_edges),
                "reference_hist": list(d.reference_hist) if d.reference_hist else None,
                "ks_threshold": d.ks_threshold,
                "psi_threshold": d.psi_threshold,
                "use_list_length": d.use_list_length,
                "group_by": d.group_by,
                "group_references": (
                    {g: list(h) for g, h in d.group_references.items()}
                    if d.group_references is not None
                    else None
                ),
            }
            for d in spec.drift
        ],
        "aggregate_checks": [
            {
                "name": a.name,
                "agg": a.agg,
                "column": a.column,
                "group_by": a.group_by,
                "min_value": a.min_value,
                "max_value": a.max_value,
            }
            for a in spec.aggregate_checks
        ],
    }
    if spec.manifest_checks:
        # emitted only when declared so pre-existing spec documents stay
        # byte-stable (the UniqueKey.require_present convention)
        doc["manifest_checks"] = [
            {
                "name": m.name,
                "group_by": m.group_by,
                "dim_name": m.dim_name,
                "dim_key": m.dim_key,
                "expected_count": m.expected_count,
                "column": m.column,
                "expected_sum": m.expected_sum,
                "count_tolerance": m.count_tolerance,
                "sum_tolerance": m.sum_tolerance,
                "check_missing": m.check_missing,
                "check_unexpected": m.check_unexpected,
            }
            for m in spec.manifest_checks
        ]
    if spec.temporal_foreign_keys:
        # emitted only when declared so pre-existing spec documents stay
        # byte-stable (the manifest_checks convention)
        doc["temporal_foreign_keys"] = [
            {
                "name": k.name,
                "column": k.column,
                "ts_column": k.ts_column,
                "dim_name": k.dim_name,
                "dim_key": k.dim_key,
                "dim_valid_from": k.dim_valid_from,
                "dim_valid_to": k.dim_valid_to,
            }
            for k in spec.temporal_foreign_keys
        ]
    if spec.sequence_checks:
        # emitted only when declared so pre-existing spec documents stay
        # byte-stable (the manifest_checks convention)
        doc["sequence_checks"] = [
            {
                "name": sc.name,
                "group_by": list(sc.group_by),
                "order_by": list(sc.order_by),
                "column": sc.column,
                "kind": sc.kind,
                **({"max_gap": sc.max_gap} if sc.max_gap is not None else {}),
                **(
                    {"end_column": sc.end_column}
                    if sc.end_column is not None
                    else {}
                ),
            }
            for sc in spec.sequence_checks
        ]
    if spec.reconcile_checks:
        doc["reconcile_checks"] = [
            {
                "name": r.name,
                "key": r.key,
                "agg": r.agg,
                "dim_name": r.dim_name,
                "dim_key": r.dim_key,
                "expected": r.expected,
                "column": r.column,
                "scale": r.scale,
                "tolerance": r.tolerance,
                "check_missing_details": r.check_missing_details,
                "check_orphan_details": r.check_orphan_details,
            }
            for r in spec.reconcile_checks
        ]
    for rc in spec.row_checks:
        meta = getattr(rc, "_serde", None)
        if meta is None:
            raise SpecError(
                f"row check {rc.name!r} is a bare Python callable and not "
                "JSON-serializable; build it via make_row_check(kind, ...) "
                "after register_row_check_builder(kind, from_json)"
            )
        doc["row_checks"].append(meta)
    return doc


def spec_from_json(doc: Dict[str, Any]) -> TableConstraints:
    columns = [
        ColumnSpec(
            c["name"],
            _dtype_from_name(c["dtype"]),
            nullable=c.get("nullable", False),
            required=c.get("required", True),
            facets=tuple(facet_from_json(f) for f in c.get("facets", [])),
        )
        for c in doc["columns"]
    ]
    row_checks = [row_check_from_json(rc) for rc in doc.get("row_checks", [])]
    type_alternatives = [
        TypeAlternatives(
            column=ta["column"],
            cases=tuple(
                AltCase(
                    column=c["column"],
                    op=c["op"],
                    value=tuple(c["value"]) if isinstance(c["value"], list) else c["value"],
                    facets=tuple(facet_from_json(f) for f in c.get("facets", [])),
                    type_name=c["type_name"],
                )
                for c in ta.get("cases", [])
            ),
            name=ta.get("name"),
        )
        for ta in doc.get("type_alternatives", [])
    ]
    spec = TableConstraints(
        name=doc["name"],
        columns=columns,
        row_checks=row_checks,
        type_alternatives=type_alternatives,
        unique_keys=[
            UniqueKey(
                tuple(u["columns"]),
                name=u.get("name"),
                require_present=bool(u.get("require_present", False)),
            )
            for u in doc.get("unique_keys", [])
        ],
        foreign_keys=[
            ForeignKey(k["column"], k["dim_name"], k["dim_key"], name=k.get("name"))
            for k in doc.get("foreign_keys", [])
        ],
        drift=[
            DriftSpec(
                column=d["column"],
                bin_edges=tuple(d["bin_edges"]),
                reference_hist=tuple(d["reference_hist"]) if d.get("reference_hist") else None,
                ks_threshold=d.get("ks_threshold", 0.15),
                psi_threshold=d.get("psi_threshold", 0.25),
                use_list_length=d.get("use_list_length", False),
                group_by=d.get("group_by"),
                group_references=(
                    {g: tuple(h) for g, h in d["group_references"].items()}
                    if d.get("group_references")
                    else None
                ),
                name=d.get("name"),
            )
            for d in doc.get("drift", [])
        ],
        aggregate_checks=[
            AggregateCheck(
                name=a["name"],
                agg=a["agg"],
                column=a.get("column"),
                group_by=a.get("group_by"),
                min_value=a.get("min_value"),
                max_value=a.get("max_value"),
            )
            for a in doc.get("aggregate_checks", [])
        ],
        manifest_checks=[
            ManifestCheck(
                name=m["name"],
                group_by=m["group_by"],
                dim_name=m["dim_name"],
                dim_key=m["dim_key"],
                expected_count=m.get("expected_count"),
                column=m.get("column"),
                expected_sum=m.get("expected_sum"),
                count_tolerance=int(m.get("count_tolerance", 0)),
                sum_tolerance=float(m.get("sum_tolerance", 0.0)),
                check_missing=bool(m.get("check_missing", True)),
                check_unexpected=bool(m.get("check_unexpected", True)),
            )
            for m in doc.get("manifest_checks", [])
        ],
        temporal_foreign_keys=[
            TemporalForeignKey(
                column=k["column"],
                ts_column=k["ts_column"],
                dim_name=k["dim_name"],
                dim_key=k["dim_key"],
                dim_valid_from=k.get("dim_valid_from", "valid_from"),
                dim_valid_to=k.get("dim_valid_to", "valid_to"),
                name=k.get("name"),
            )
            for k in doc.get("temporal_foreign_keys", [])
        ],
        sequence_checks=[
            SequenceCheck(
                name=sq["name"],
                group_by=tuple(sq["group_by"]),
                order_by=tuple(sq["order_by"]),
                column=sq["column"],
                kind=sq.get("kind", "non_decreasing"),
                max_gap=sq.get("max_gap"),
                end_column=sq.get("end_column"),
            )
            for sq in doc.get("sequence_checks", [])
        ],
        reconcile_checks=[
            ReconcileCheck(
                name=r["name"],
                key=r["key"],
                agg=r["agg"],
                dim_name=r["dim_name"],
                dim_key=r["dim_key"],
                expected=r["expected"],
                column=r.get("column"),
                scale=int(r.get("scale", 1)),
                tolerance=int(r.get("tolerance", 0)),
                check_missing_details=bool(r.get("check_missing_details", True)),
                check_orphan_details=bool(r.get("check_orphan_details", True)),
            )
            for r in doc.get("reconcile_checks", [])
        ],
        key_columns=tuple(doc.get("key_columns", ())),
        allow_extra_columns=doc.get("allow_extra_columns", True),
        stats_columns=tuple(doc.get("stats_columns", ())),
        distinct_columns=tuple(doc.get("distinct_columns", ())),
        warning_constraints=tuple(doc.get("warning_constraints", ())),
        aliases=tuple(
            ColumnAlias(a["head"], tuple(a["members"]))
            for a in doc.get("aliases", [])
        ),
    )
    return spec.compile()


_OVERRIDE_SECTIONS = (
    ("columns", "name"),
    ("unique_keys", "name"),
    ("foreign_keys", "name"),
    ("temporal_foreign_keys", "name"),
    ("drift", "name"),
    ("row_checks", "name"),
    ("type_alternatives", "name"),
    ("aggregate_checks", "name"),
    ("manifest_checks", "name"),
    ("sequence_checks", "name"),
    ("reconcile_checks", "name"),
)


def override_spec(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Compose two spec JSON documents — the ``xs:override``/``xs:redefine``
    analog (reference: ``validators/schema.py:749-775`` processes redefine/
    override children by replacing same-named global components, additions
    appended; ``validators/globals_.py:345``).

    For each list section (columns, unique_keys, foreign_keys, drift,
    row_checks, type_alternatives): an override entry REPLACES the base
    entry with the same ``name``, a new name APPENDS, and an entry of the
    form ``{"name": ..., "remove": true}`` DELETES. Scalar/tuple fields
    (``name``, ``key_columns``, ``allow_extra_columns``, ...) are taken
    from the override document when present. The merged document is plain
    JSON — compile through :func:`spec_from_json`, which re-lints the
    result exactly like a from-scratch spec (a broken override fails at
    compile, the reference's "cannot redefine schema" error path)."""
    out: Dict[str, Any] = {k: v for k, v in base.items()}
    for key, val in override.items():
        if key not in {s for s, _ in _OVERRIDE_SECTIONS}:
            out[key] = val
    for section, name_key in _OVERRIDE_SECTIONS:
        if section not in override:
            continue
        entries = override[section]
        if not isinstance(entries, list) or not all(isinstance(e, dict) for e in entries):
            raise SpecError(f"override section {section!r} must be a list of objects")
        merged = list(base.get(section, []))
        index = {e.get(name_key): i for i, e in enumerate(merged)}
        for entry in entries:
            nm = entry.get(name_key)
            if nm is None:
                raise SpecError(f"override entry in {section!r} must carry {name_key!r}")
            if entry.get("remove"):
                if nm not in index:
                    raise SpecError(f"cannot remove unknown {section} entry {nm!r}")
                merged[index[nm]] = None
            elif nm in index:
                merged[index[nm]] = entry
            else:
                index[nm] = len(merged)
                merged.append(entry)
        out[section] = [e for e in merged if e is not None]
    return out


def save_spec(spec: TableConstraints, path: str) -> None:
    with open(path, "w") as f:
        json.dump(spec_to_json(spec), f, indent=2)


def load_spec(path: str) -> TableConstraints:
    with open(path) as f:
        return spec_from_json(json.load(f))
