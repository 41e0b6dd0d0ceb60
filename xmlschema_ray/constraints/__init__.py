from xmlschema_ray.constraints.spec import (
    ColumnSpec,
    DriftSpec,
    ForeignKey,
    LengthEquals,
    SpecError,
    TableConstraints,
    UniqueKey,
)

__all__ = [
    "ColumnSpec",
    "DriftSpec",
    "ForeignKey",
    "LengthEquals",
    "SpecError",
    "TableConstraints",
    "UniqueKey",
]
