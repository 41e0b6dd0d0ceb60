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
