"""XSD 1.1 conditional type assignment (xs:alternative analog): per-row
type dispatch, first-match-wins order, derivation lint, serde round-trip.
Reference semantics: /root/reference/xmlschema/validators/elements.py:758-857.
"""

import os

import numpy as np
import pyarrow as pa
import pytest

from xmlschema_ray.constraints import facets as F
from xmlschema_ray.constraints.serde import spec_from_json, spec_to_json
from xmlschema_ray.constraints.spec import (
    AltCase,
    ColumnSpec,
    SpecError,
    TableConstraints,
    TypeAlternatives,
)
from xmlschema_ray.engine.row_validator import iter_row_checks


def _spec(cases, declared=(F.MinInclusive(0.0), F.MaxInclusive(100.0))):
    return TableConstraints(
        name="t",
        columns=[
            ColumnSpec("id", pa.int64()),
            ColumnSpec("kind", pa.string(), nullable=True),
            ColumnSpec("v", pa.float64(), facets=declared),
        ],
        type_alternatives=[TypeAlternatives(column="v", cases=tuple(cases))],
        key_columns=("id",),
    ).compile()


CASES = (
    AltCase("kind", "==", "a", (F.MinInclusive(10.0),), "type_a"),
    AltCase("kind", "in", ("a", "b"), (F.MaxInclusive(50.0),), "type_ab"),
)


def _violations(spec, table):
    out = {}
    for cname, col, mask, _r, _v in iter_row_checks(table, spec):
        out[cname] = set(np.flatnonzero(mask).tolist())
    return out


def test_first_match_wins_and_default_applies():
    spec = _spec(CASES)
    table = pa.table(
        {
            "id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
            "kind": pa.array(["a", "a", "b", "c", None]),
            #        a: min10   a: ok   b: max50   c: default  null: default
            "v": pa.array([5.0, 20.0, 60.0, 150.0, -1.0], type=pa.float64()),
        }
    )
    v = _violations(spec, table)
    # row0 kind=a matched FIRST case only (not the 'in' case): min10 fires,
    # max50 must NOT fire even though 5.0<=50 passes trivially; check row2
    # (kind=b) got the second case
    assert v.get("v.alt[type_a].minInclusive(10.0)") == {0}
    assert v.get("v.alt[type_ab].maxInclusive(50.0)") == {2}
    # default stack applies to kind=c and null discriminant
    assert v.get("v.maxInclusive(100.0)") == {3}
    assert v.get("v.minInclusive(0.0)") == {4}


def test_first_match_shadowing():
    """A row matching case 0 is never validated by case 1 even when both
    tests match (reference get_type returns the FIRST matching alternative)."""
    spec = _spec(CASES)
    table = pa.table(
        {
            "id": pa.array([0], type=pa.int64()),
            "kind": pa.array(["a"]),
            "v": pa.array([80.0], type=pa.float64()),  # violates type_ab's max50
        }
    )
    v = _violations(spec, table)
    assert "v.alt[type_ab].maxInclusive(50.0)" not in v  # shadowed by type_a


def test_alternative_must_restrict_declared():
    with pytest.raises(SpecError, match="loosens"):
        _spec((AltCase("kind", "==", "a", (F.MaxInclusive(200.0),), "loose"),))


def test_alternative_unknown_columns_raise():
    with pytest.raises(SpecError, match="unknown"):
        _spec((AltCase("missing", "==", "a", (F.MinInclusive(1.0),), "x"),))
    with pytest.raises(SpecError):
        TableConstraints(
            name="t",
            columns=[ColumnSpec("id", pa.int64())],
            type_alternatives=[
                TypeAlternatives(column="nope", cases=(AltCase("id", "==", 1, (), "x"),))
            ],
        ).compile()


def test_bad_op_raises():
    with pytest.raises(SpecError, match="op"):
        AltCase("kind", "~=", "a", (), "x")


def test_serde_round_trip():
    spec = _spec(CASES)
    doc = spec_to_json(spec)
    back = spec_from_json(doc)
    assert len(back.type_alternatives) == 1
    ta = back.type_alternatives[0]
    assert ta.column == "v" and len(ta.cases) == 2
    assert ta.cases[0].op == "==" and ta.cases[0].type_name == "type_a"
    assert ta.cases[1].op == "in" and tuple(ta.cases[1].value) == ("a", "b")
    # behavioral equality after round-trip
    table = pa.table(
        {
            "id": pa.array([0, 1], type=pa.int64()),
            "kind": pa.array(["a", "b"]),
            "v": pa.array([5.0, 60.0], type=pa.float64()),
        }
    )
    assert _violations(spec, table) == _violations(back, table)


def test_declared_facets_inherited_by_alternatives():
    """An alternative is a RESTRICTION, so the declared stack still
    validates matched rows: omitting maxInclusive from a case must not
    loosen the column (the silent-loosening hazard)."""
    spec = _spec((AltCase("kind", "==", "a", (F.MinInclusive(10.0),), "type_a"),))
    table = pa.table(
        {
            "id": pa.array([0], type=pa.int64()),
            "kind": pa.array(["a"]),
            "v": pa.array([500.0], type=pa.float64()),  # matched case has no max
        }
    )
    v = _violations(spec, table)
    assert v.get("v.maxInclusive(100.0)") == {0}


def test_missing_discriminant_column_falls_back_to_declared():
    """A batch without the discriminant column still validates the value
    column with the declared stack (a test over a missing attribute is
    false -> every row is the default type)."""
    spec = _spec(CASES)
    table = pa.table(
        {
            "id": pa.array([0, 1], type=pa.int64()),
            "v": pa.array([-50.0, 20.0], type=pa.float64()),
        }
    )
    v = _violations(spec, table)
    assert v.get("v.minInclusive(0.0)") == {0}
    assert not any("alt[" in k for k in v)


def test_alternative_case_with_absent_discriminant_is_nonmatching():
    """A case whose discriminant column is missing from the batch is FALSE
    (reference evaluates each xs:alternative test independently,
    elements.py:778-791) — other cases with present discriminants still
    match; the whole alternatives list is NOT disabled."""
    import numpy as np
    import pyarrow as pa

    from xmlschema_ray.constraints import facets as F
    from xmlschema_ray.constraints.spec import (
        AltCase,
        ColumnSpec,
        TableConstraints,
        TypeAlternatives,
    )
    from xmlschema_ray.engine.row_validator import iter_row_checks

    spec = TableConstraints(
        name="t",
        columns=[
            ColumnSpec("v", pa.int64()),
            ColumnSpec("kind", pa.string(), nullable=True),
            # declared in the spec but absent from the batch below
            ColumnSpec("missing_col", pa.string(), nullable=True, required=False),
        ],
        key_columns=("v",),
        type_alternatives=(
            TypeAlternatives(
                column="v",
                cases=(
                    # discriminant 'missing_col' absent from the batch
                    AltCase("missing_col", "==", "x", (F.MaxInclusive(0),), "neverType"),
                    AltCase("kind", "==", "big", (F.MinInclusive(100),), "bigType"),
                ),
            ),
        ),
    ).compile()

    table = pa.table({"v": [5, 150], "kind": ["big", "big"]})
    found = {name for name, *_ in iter_row_checks(table, spec)}
    # the 'big' case matched both rows; v=5 violates MinInclusive(100)
    assert any("bigType" in n for n in found), found
    # the absent-column case never matched — its facet fired on no row
    assert not any("neverType" in n for n in found), found


def test_substitution_alias_expansion(tmp_path, ray_session):
    """ColumnAlias (xs:substitutionGroup analog): one facet stack declared
    on a head expands to optional member clones at compile; members are
    validated by the head's stack when present, fine when absent; a
    conflicting explicit member spec is a compile error; serde round-trips
    and re-compile is idempotent."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from xmlschema_ray.constraints import facets as F
    from xmlschema_ray.constraints.serde import spec_from_json, spec_to_json
    from xmlschema_ray.constraints.spec import (
        ColumnAlias,
        ColumnSpec,
        SpecError,
        TableConstraints,
    )
    from xmlschema_ray.engine.engine import ValidationEngine

    def build():
        return TableConstraints(
            name="t",
            columns=[
                ColumnSpec("doc_id", pa.string()),
                ColumnSpec("score", pa.int64(), facets=(F.MinInclusive(0), F.MaxInclusive(100))),
            ],
            key_columns=("doc_id",),
            aliases=(ColumnAlias("score", ("score_alt", "score_legacy")),),
        )

    spec = build().compile()
    names = [c.name for c in spec.columns]
    assert names == ["doc_id", "score", "score_alt", "score_legacy"]
    alt = spec.column("score_alt")
    assert not alt.required and {type(f).__name__ for f in alt.facets} == {
        "MinInclusive",
        "MaxInclusive",
    }

    # serde round-trip (expanded members serialize as explicit clones +
    # the alias; reload+recompile is idempotent, not duplicating)
    doc = spec_to_json(spec)
    spec2 = spec_from_json(doc).compile()
    assert [c.name for c in spec2.columns] == names
    assert spec_to_json(spec2) == doc

    # conflicting explicit member spec -> compile error
    bad = build()
    bad.columns.append(ColumnSpec("score_alt", pa.string()))
    with _pytest.raises(SpecError, match="conflicts"):
        bad.compile()

    # engine: member column present -> validated with the head's stack;
    # corpus WITHOUT the member column -> no violation
    d = str(tmp_path / "c")
    os.makedirs(d)
    pq.write_table(
        pa.table({"doc_id": ["a", "b"], "score": [5, 7], "score_alt": [50, 300]}),
        os.path.join(d, "p0.parquet"),
    )
    res = ValidationEngine(build().compile(), batch_size=64, n_shards=1).run(
        d, out_dir=str(tmp_path / "o")
    )
    v = res.violations()
    assert res.job_validity == "invalid"
    assert (v["column"] == "score_alt").sum() == 1  # 300 > 100

    d2 = str(tmp_path / "c2")
    os.makedirs(d2)
    pq.write_table(
        pa.table({"doc_id": ["a"], "score": [5]}), os.path.join(d2, "p0.parquet")
    )
    res2 = ValidationEngine(build().compile(), batch_size=64, n_shards=1).run(
        d2, out_dir=str(tmp_path / "o2")
    )
    assert res2.job_validity == "valid" and res2.n_violations == 0
