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

import pyarrow as pa

from xmlschema_ray.constraints import facets as F
from xmlschema_ray.constraints.spec import (
    ColumnSpec,
    DriftSpec,
    ForeignKey,
    LengthEquals,
    SpecError,
    TableConstraints,
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
    name = _DTYPE_NAMES.get(str(dt))
    if name is None:
        raise SpecError(f"dtype {dt} has no JSON name")
    return name


def _dtype_from_name(name: str) -> pa.DataType:
    if name not in _DTYPES:
        raise SpecError(f"unknown dtype name {name!r}")
    return _DTYPES[name]


def facet_to_json(f: F.Facet) -> Dict[str, Any]:
    if isinstance(f, F.MinInclusive):
        return {"kind": "minInclusive", "value": f.value}
    if isinstance(f, F.MaxInclusive):
        return {"kind": "maxInclusive", "value": f.value}
    if isinstance(f, F.MinExclusive):
        return {"kind": "minExclusive", "value": f.value}
    if isinstance(f, F.MaxExclusive):
        return {"kind": "maxExclusive", "value": f.value}
    if isinstance(f, F.MinLength):
        return {"kind": "minLength", "value": f.k}
    if isinstance(f, F.MaxLength):
        return {"kind": "maxLength", "value": f.k}
    if isinstance(f, F.Length):
        return {"kind": "length", "value": f.k}
    if isinstance(f, F.Pattern):
        return {"kind": "pattern", "value": f.pattern, "xsd": f.xsd}
    if isinstance(f, F.Enumeration):
        return {"kind": "enumeration", "values": list(f.values)}
    if isinstance(f, F.WhiteSpace):
        return {"kind": "whiteSpace", "value": f.policy}
    if isinstance(f, F.TotalDigits):
        return {"kind": "totalDigits", "value": f.k}
    if isinstance(f, F.FractionDigits):
        return {"kind": "fractionDigits", "value": f.k}
    if isinstance(f, F.ItemFacets):
        return {"kind": "items", "facets": [facet_to_json(x) for x in f.facets]}
    if isinstance(f, F.UnionFacets):
        return {
            "kind": "union",
            "alternatives": [[facet_to_json(x) for x in alt] for alt in f.alternatives],
        }
    raise SpecError(f"facet {f!r} is not JSON-serializable")


def facet_from_json(d: Dict[str, Any]) -> F.Facet:
    kind = d.get("kind")
    simple = {
        "minInclusive": lambda: F.MinInclusive(d["value"]),
        "maxInclusive": lambda: F.MaxInclusive(d["value"]),
        "minExclusive": lambda: F.MinExclusive(d["value"]),
        "maxExclusive": lambda: F.MaxExclusive(d["value"]),
        "minLength": lambda: F.MinLength(d["value"]),
        "maxLength": lambda: F.MaxLength(d["value"]),
        "length": lambda: F.Length(d["value"]),
        "pattern": lambda: F.Pattern(d["value"], xsd=d.get("xsd", False)),
        "enumeration": lambda: F.Enumeration(tuple(d["values"])),
        "whiteSpace": lambda: F.WhiteSpace(d["value"]),
        "totalDigits": lambda: F.TotalDigits(d["value"]),
        "fractionDigits": lambda: F.FractionDigits(d["value"]),
        "items": lambda: F.ItemFacets(tuple(facet_from_json(x) for x in d["facets"])),
        "union": lambda: F.UnionFacets(
            tuple(tuple(facet_from_json(x) for x in alt) for alt in d["alternatives"])
        ),
    }
    if kind not in simple:
        raise SpecError(f"unknown facet kind {kind!r}")
    return simple[kind]()


def spec_to_json(spec: TableConstraints) -> Dict[str, Any]:
    doc: Dict[str, Any] = {
        "name": spec.name,
        "allow_extra_columns": spec.allow_extra_columns,
        "key_columns": list(spec.key_columns),
        "stats_columns": list(spec.stats_columns),
        "distinct_columns": list(spec.distinct_columns),
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
        "unique_keys": [{"name": u.name, "columns": list(u.columns)} for u in spec.unique_keys],
        "foreign_keys": [
            {"name": k.name, "column": k.column, "dim_name": k.dim_name, "dim_key": k.dim_key}
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
            }
            for d in spec.drift
        ],
    }
    for rc in spec.row_checks:
        meta = getattr(rc, "_serde", None)
        if meta is None:
            raise SpecError(
                f"row check {rc.name!r} is a Python callable and not JSON-serializable; "
                "only declarative checks (length_equals) serialize"
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
    row_checks = []
    for rc in doc.get("row_checks", []):
        if rc.get("kind") != "length_equals":
            raise SpecError(f"unknown row check kind {rc.get('kind')!r}")
        check = LengthEquals(rc["list_col"], rc["int_col"], name=rc.get("name"))
        object.__setattr__(check, "_serde", rc)
        row_checks.append(check)
    spec = TableConstraints(
        name=doc["name"],
        columns=columns,
        row_checks=row_checks,
        unique_keys=[UniqueKey(tuple(u["columns"]), name=u.get("name")) for u in doc.get("unique_keys", [])],
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
                name=d.get("name"),
            )
            for d in doc.get("drift", [])
        ],
        key_columns=tuple(doc.get("key_columns", ())),
        allow_extra_columns=doc.get("allow_extra_columns", True),
        stats_columns=tuple(doc.get("stats_columns", ())),
        distinct_columns=tuple(doc.get("distinct_columns", ())),
    )
    return spec.compile()


def save_spec(spec: TableConstraints, path: str) -> None:
    with open(path, "w") as f:
        json.dump(spec_to_json(spec), f, indent=2)


def load_spec(path: str) -> TableConstraints:
    with open(path) as f:
        return spec_from_json(json.load(f))
