"""Restriction / extension derivation rules (reference
simple_types.py:879-930 facet-valid-restriction semantics)."""

import pyarrow as pa
import pytest

import xmlschema_ray.constraints.facets as F
from xmlschema_ray.constraints.derive import extend, restrict
from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints


def _base():
    return TableConstraints(
        "base",
        columns=[
            ColumnSpec("id", pa.int64(), nullable=False),
            ColumnSpec(
                "qty",
                pa.int64(),
                nullable=True,
                facets=[F.MinInclusive(0), F.MaxInclusive(100)],
            ),
            ColumnSpec(
                "code",
                pa.string(),
                facets=[F.MinLength(2), F.MaxLength(8), F.Enumeration(("ab", "cd", "ef"))],
            ),
        ],
    )


def test_restrict_narrows_and_compiles():
    d = restrict(
        _base(),
        "narrow",
        {
            "qty": [F.MinInclusive(10), F.MaxInclusive(50)],
            "code": [F.Enumeration(("ab", "cd")), F.MaxLength(4)],
        },
        non_nullable=["qty"],
    )
    d.compile()
    qty = next(c for c in d.columns if c.name == "qty")
    assert not qty.nullable and len(qty.facets) == 4
    # derived value space is a subset: 5 valid in base, invalid in derived
    arr = pa.array([5, 20, 200])
    base_bad = sum(f.check(arr)[0] for f in _base().columns[1].facets).astype(bool)
    drv_bad = sum(f.check(arr)[0] for f in qty.facets).astype(bool)
    assert base_bad.tolist() == [False, False, True]
    assert drv_bad.tolist() == [True, False, True]


@pytest.mark.parametrize(
    "col,facet,msg",
    [
        ("qty", F.MinInclusive(-5), "loosens"),
        ("qty", F.MaxInclusive(200), "loosens"),
        ("code", F.MinLength(1), "loosens"),
        ("code", F.MaxLength(20), "loosens"),
        ("code", F.Enumeration(("ab", "zz")), "not in the base"),
        ("qty", F.MaxInclusive(-1), "contradictory"),
        ("code", F.MinLength(9), "length bounds are contradictory"),
    ],
)
def test_restrict_rejects_loosening(col, facet, msg):
    with pytest.raises(F.SpecError, match=msg):
        restrict(_base(), "bad", {col: [facet]})


def test_restrict_whitespace_and_timezone_rules():
    base = TableConstraints(
        "b",
        columns=[
            ColumnSpec("id", pa.int64(), nullable=False),
            ColumnSpec("s", pa.string(), facets=[F.WhiteSpace("replace")]),
            ColumnSpec(
                "ts",
                pa.timestamp("us", tz="UTC"),
                nullable=True,
                facets=[F.ExplicitTimezone("required")],
            ),
        ],
    )
    restrict(base, "ok", {"s": [F.WhiteSpace("collapse")]})
    with pytest.raises(F.SpecError, match="loosens"):
        restrict(base, "bad", {"s": [F.WhiteSpace("preserve")]})
    with pytest.raises(F.SpecError, match="fixed in the base"):
        restrict(base, "bad", {"ts": [F.ExplicitTimezone("prohibited")]})


def test_restrict_unknown_column_and_extend_redefine():
    with pytest.raises(F.SpecError, match="unknown column"):
        restrict(_base(), "bad", {"nope": [F.MinInclusive(1)]})
    with pytest.raises(F.SpecError, match="redefines"):
        extend(_base(), "bad", [ColumnSpec("qty", pa.int64())])


def test_extend_appends_and_compiles():
    d = extend(
        _base(),
        "wider",
        [ColumnSpec("extra", pa.string(), nullable=True, facets=[F.MaxLength(3)])],
    )
    d.compile()
    assert [c.name for c in d.columns] == ["id", "qty", "code", "extra"]
    # inherited columns unchanged
    assert d.columns[1].facets == _base().columns[1].facets


def test_spec_compat_classifies_changes():
    """Evolution audit: loosening is compatible, tightening is breaking,
    cross-kind bound implication is sound."""
    import pyarrow as pa

    from xmlschema_ray.constraints import facets as F
    from xmlschema_ray.constraints.derive import spec_compat
    from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints, UniqueKey

    old = TableConstraints(
        name="v1",
        columns=[
            ColumnSpec("id", pa.int64(), nullable=False,
                       facets=(F.MinExclusive(5), F.MaxInclusive(100))),
            ColumnSpec("tag", pa.string(), nullable=False,
                       facets=(F.Enumeration(("a", "b")),)),
            ColumnSpec("legacy", pa.string(), nullable=True),
        ],
        unique_keys=[UniqueKey(("id",), name="uk_id")],
        key_columns=("id",),
        allow_extra_columns=False,  # old data cannot carry undeclared columns
    )
    new = TableConstraints(
        name="v2",
        columns=[
            # MinInclusive(5) is IMPLIED by old MinExclusive(5); Max loosened
            ColumnSpec("id", pa.int64(), nullable=True,
                       facets=(F.MinInclusive(5), F.MaxInclusive(200))),
            # enum widened (compatible) — values drawn from {a,b} still pass
            ColumnSpec("tag", pa.string(), nullable=False,
                       facets=(F.Enumeration(("a", "b", "c")), F.MinLength(2))),
            # new optional column: compatible; new required column: breaking
            ColumnSpec("extra_opt", pa.string(), required=False),
            ColumnSpec("extra_req", pa.string()),
        ],
        unique_keys=[UniqueKey(("id",), name="uk_id"), UniqueKey(("tag",), name="uk_tag")],
        key_columns=("id",),
    )
    findings = spec_compat(old, new)
    broken = {(f["item"], f["change"]) for f in findings if not f["compatible"]}
    # exactly these four breaks: the tightened MinLength, the dropped
    # column under allow_extra default True is compatible, the required
    # new column, and the added unique key
    assert ("column tag", "facet added/tightened: minLength(2)") in broken
    assert ("column extra_req", "added") in broken
    assert ("unique_key uk_tag", "added") in broken
    assert not any(f["item"] == "column id" and not f["compatible"] for f in findings)
    assert any(f["item"] == "column legacy" and f["compatible"] for f in findings)
    assert any(f["item"] == "column extra_opt" and f["compatible"] for f in findings)


def test_spec_compat_soundness_holes_closed():
    """Review-found unsound classifications: same-name definition changes,
    allow_extra True->False, encoding-changed lengths, cross-dtype facet
    values, and added-optional columns under old allow_extra=True are ALL
    reported breaking (sound: never breaking-as-compatible)."""
    import datetime

    import pyarrow as pa

    from xmlschema_ray.constraints import facets as F
    from xmlschema_ray.constraints.derive import spec_compat
    from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints, UniqueKey

    old = TableConstraints(
        name="v1",
        columns=[
            ColumnSpec("id", pa.int64(), nullable=False, facets=(F.MinInclusive(5),)),
            ColumnSpec("s", pa.string(), facets=(F.MaxLength(10),)),
        ],
        unique_keys=[UniqueKey(("id", "s"), name="uk")],
        key_columns=("id",),
        allow_extra_columns=True,
    )
    new = TableConstraints(
        name="v2",
        columns=[
            # dtype changed: flagged once, facet domain not compared (no crash)
            ColumnSpec("id", pa.timestamp("us"), nullable=False,
                       facets=(F.MinInclusive(datetime.datetime(2020, 1, 1)),)),
            # same numeric bound but bytes-not-chars: breaking
            ColumnSpec("s", pa.string(), facets=(F.MaxLength(10, encoding="hex"),)),
            ColumnSpec("x", pa.int64(), required=False),  # may exist unchecked in old data
        ],
        unique_keys=[UniqueKey(("id",), name="uk")],  # same name, tighter definition
        key_columns=("id",),
        allow_extra_columns=False,
    )
    findings = spec_compat(old, new)
    broken = {(f["item"], f["change"]) for f in findings if not f["compatible"]}
    assert ("column id", "dtype changed") in broken
    assert ("column s", "facet added/tightened: maxLength(10)[hex]") in broken or any(
        f["item"] == "column s" and not f["compatible"] for f in findings
    )
    assert ("column x", "added") in broken
    assert ("allow_extra_columns", "True -> False") in broken
    assert ("unique_key uk", "definition changed") in broken


def test_spec_compat_programmatic_row_checks_not_spuriously_changed():
    """Two programmatic builds of the SAME row check (distinct closures,
    distinct reprs) must NOT read as 'definition changed'; same-name
    same-columns programmatic checks compare clean, and a columns change
    is still caught."""
    import numpy as np
    import pyarrow as pa

    from xmlschema_ray.constraints.derive import spec_compat
    from xmlschema_ray.constraints.spec import ColumnSpec, RowCheck, TableConstraints

    def build(columns=("a",)):
        fn = lambda t: np.zeros(t.num_rows, dtype=bool)  # noqa: E731
        return TableConstraints(
            name="t",
            columns=[ColumnSpec("a", pa.int64()), ColumnSpec("b", pa.int64())],
            key_columns=("a",),
            row_checks=(RowCheck("chk", tuple(columns), fn),),
        ).compile()

    findings = spec_compat(build(), build())
    assert not any(
        f["change"] == "definition changed" and "chk" in f["item"] for f in findings
    ), findings

    changed = spec_compat(build(("a",)), build(("a", "b")))
    assert any(
        f["change"] == "definition changed" and "chk" in f["item"] and not f["compatible"]
        for f in changed
    ), changed


def test_row_check_registry_roundtrip(ray_session):
    """Custom row checks round-trip through spec JSON via the registered-
    name indirection (the RowCheck counterpart of the facet BUILDERS);
    unregistered kinds raise at load; group_occurs checks now serialize."""
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest

    from xmlschema_ray.constraints.occurs import ContentGroup, Particle, group_occurs_check
    from xmlschema_ray.constraints.serde import (
        make_row_check,
        register_row_check_builder,
        spec_from_json,
        spec_to_json,
    )
    from xmlschema_ray.constraints.spec import ColumnSpec, RowCheck, TableConstraints

    class _NonNegFn:
        def __init__(self, col):
            self.col = col

        def __call__(self, table):
            v = table[self.col].combine_chunks().to_numpy(zero_copy_only=False)
            return v < 0

    register_row_check_builder(
        "non_negative",
        lambda d: RowCheck(
            name=d.get("name") or f"{d['col']}_non_negative",
            columns=(d["col"],),
            fn=_NonNegFn(d["col"]),
            reason="negative value",
        ),
    )

    spec = TableConstraints(
        name="t",
        columns=[ColumnSpec("a", pa.int64()), ColumnSpec("xs", pa.list_(pa.int64()), nullable=True)],
        key_columns=("a",),
        row_checks=(
            make_row_check("non_negative", col="a"),
            group_occurs_check(
                ContentGroup("sequence", (Particle("xs", 1, 3),)), name="grp"
            ),
        ),
    ).compile()

    doc = spec_to_json(spec)
    spec2 = spec_from_json(doc)
    assert spec_to_json(spec2) == doc  # byte-stable round-trip

    # reloaded custom check still computes
    table = pa.table({"a": [1, -2], "xs": [[1], [1, 2, 3, 4]]})
    masks = {rc.name: rc.fn(table) for rc in spec2.row_checks}
    assert masks["a_non_negative"].tolist() == [False, True]
    assert masks["grp"].tolist() == [False, True]

    # unregistered kind raises at load with a registration hint
    bad = dict(doc)
    bad["row_checks"] = [{"kind": "no_such_kind"}]
    with _pytest.raises(Exception, match="register_row_check_builder"):
        spec_from_json(bad)
