from xmlschema_ray.constraints.spec import (
    AggregateCheck,
    ManifestCheck,
    ReconcileCheck,
    SequenceCheck,
    AltCase,
    ColumnAlias,
    ColumnSpec,
    DriftSpec,
    ForeignKey,
    TemporalForeignKey,
    LengthEquals,
    SpecError,
    TableConstraints,
    TypeAlternatives,
    UniqueKey,
)

__all__ = [
    "AggregateCheck",
    "ManifestCheck",
    "ReconcileCheck",
    "SequenceCheck",
    "AltCase",
    "ColumnAlias",
    "ColumnSpec",
    "DriftSpec",
    "ForeignKey",
    "TemporalForeignKey",
    "LengthEquals",
    "SpecError",
    "TableConstraints",
    "TypeAlternatives",
    "UniqueKey",
]
from xmlschema_ray.constraints.occurs import (  # noqa: F401
    ContentGroup,
    OccursBounds,
    Particle,
    group_occurs_check,
)
from xmlschema_ray.constraints.serde import (  # noqa: F401
    BUILDERS,
    register_facet_builder,
)
