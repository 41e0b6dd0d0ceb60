"""describe_plan: the plan is a pure function of the spec — stages appear
exactly when their constraint families are declared, exchange counts match
the stage implementations' documented movement."""

import pyarrow as pa

from xmlschema_ray import ValidationEngine
from xmlschema_ray.constraints.spec import (
    ColumnSpec,
    ForeignKey,
    ReconcileCheck,
    SequenceCheck,
    TableConstraints,
    UniqueKey,
)


def _spec(**kw):
    return TableConstraints(
        "t",
        columns=[
            ColumnSpec("k", pa.int64(), nullable=False),
            ColumnSpec("src", pa.string()),
            ColumnSpec("ts", pa.int64()),
            ColumnSpec("amount", pa.float64()),
        ],
        key_columns=("k",),
        **kw,
    )


def test_minimal_plan_is_scan_plus_writes():
    plan = ValidationEngine(_spec(), n_shards=1).describe_plan()
    assert [p["stage"] for p in plan] == ["A", "E"]
    assert plan[0]["exchanges"] == 0


def test_stages_appear_with_their_families():
    spec = _spec(
        unique_keys=[UniqueKey(("k",), name="u")],
        foreign_keys=[ForeignKey("src", "dim", "s", name="f")],
        sequence_checks=[SequenceCheck("sq", ("src",), ("ts", "k"), "ts")],
        reconcile_checks=[
            ReconcileCheck(
                "bal", key="k", agg="sum", column="amount", scale=100,
                dim_name="hdr", dim_key="hk", expected="total",
            )
        ],
        stats_columns=("amount",),
        distinct_columns=("src",),
    )
    plan = ValidationEngine(spec, n_shards=1).describe_plan()
    stages = [p["stage"] for p in plan]
    assert stages == ["A", "B", "B2", "B3", "B4", "D", "E"]
    by = {p["stage"]: p for p in plan}
    assert by["B"]["exchanges"] == 1
    assert by["B3"]["exchanges"] == 1
    assert by["B4"]["exchanges"] == 2
    assert "bal" in by["B4"]["what"] and "sq" in by["B3"]["what"]
    assert "stats(1 cols)" in by["D"]["what"] and "HLL(1 cols)" in by["D"]["what"]
    # total exchange budget of this spec: 5
    assert sum(p["exchanges"] for p in plan) == 5
