"""xmlschema_ray — a Ray-Data-native schema + constraint validation engine.

A brand-new engine that re-imagines the validator surface of the reference
``xmlschema`` package (XSD 1.0/1.1 facets, occurrence bounds, identity
constraints ``xs:unique``/``xs:key``/``xs:keyref``) as declarative column
constraints over Parquet tables of pre-tokenized training sequences,
executed as streaming Ray Data pipelines:

* ``constraints`` — the declarative ``TableConstraints`` spec (the analog of
  a compiled XSD schema graph, reference ``validators/globals_.py:204-474``)
  and vectorized Arrow facet kernels (reference ``validators/facets.py``).
* ``engine`` — the run lifecycle: a zero-copy ``map_batches`` row validator
  (stage A), uniqueness via pre-aggregated groupby shuffle (stage B),
  referential integrity via a broadcast dimension set in an actor pool
  (stage C), mergeable stats sketches + drift checks (stage D), writers and
  per-partition lineage checkpoints (stage E).
* ``ops`` — general relational operators (broadcast joins, combiner-style
  aggregation, top-k, windows) built Ray-Data-first.
* ``functions`` — vectorized scalar/text/vector function library
  (hashing, MinHash/SimHash, language-ID, quality scoring, cosine top-k).
* ``pipelines`` — end-user pipelines: validation runs, dedup family,
  similarity search, text analysis, multimodal plumbing.
* ``sources`` — readers and the deterministic synthetic sequence generator
  used by tests and benchmarks.

Validation semantics follow the reference: validation is decode-with-errors
(``validators/xsdbase.py:547-593``), run modes mirror strict/lax/skip
(``xsdbase.py:24``), and verdicts use the PSVI vocabulary
``validity``/``validation_attempted`` (``xsdbase.py:69-92``).
"""

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
from xmlschema_ray.constraints import facets
from xmlschema_ray.constraints.derive import extend, restrict, spec_compat
from xmlschema_ray.constraints.infer import apply_relaxations, infer_spec, suggest_relaxations
from xmlschema_ray.constraints.serde import (
    load_spec,
    make_row_check,
    override_spec,
    register_facet_builder,
    register_row_check_builder,
    save_spec,
)
from xmlschema_ray.constraints.xsd_regex import UnicodeSubset
from xmlschema_ray.engine.encode import normalize_rewrite, quarantine_split
from xmlschema_ray.engine.formatters import register_formatter
from xmlschema_ray.constraints.occurs import ContentGroup, OccursBounds, Particle, group_occurs_check
from xmlschema_ray.engine.engine import ValidationEngine, ValidationResult

__all__ = [
    "AggregateCheck",
    "ManifestCheck",
    "ReconcileCheck",
    "SequenceCheck",
    "AltCase",
    "ColumnSpec",
    "DriftSpec",
    "ForeignKey",
    "TemporalForeignKey",
    "LengthEquals",
    "SpecError",
    "TableConstraints",
    "TypeAlternatives",
    "UniqueKey",
    "ValidationEngine",
    "ValidationResult",
    "ContentGroup",
    "OccursBounds",
    "Particle",
    "group_occurs_check",
    "facets",
    "restrict",
    "extend",
    "ColumnAlias",
    "UnicodeSubset",
    "spec_compat",
    "infer_spec",
    "suggest_relaxations",
    "apply_relaxations",
    "load_spec",
    "save_spec",
    "override_spec",
    "make_row_check",
    "register_facet_builder",
    "register_row_check_builder",
    "register_formatter",
    "normalize_rewrite",
    "quarantine_split",
]

__version__ = "0.1.0"
