"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here (or
in the library) calls ``ray.init`` / ``ray.shutdown``.

``queries()`` aggregates every implemented pipeline from SURVEY.md §2;
``oracle_sql()`` carries the DuckDB-equivalent SQL for each
SQL-expressible query (same column names — the driver hash-compares
values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: full constraint-validation run over the sequence-shaped
    table derived from sf0.001 documents; returns per-partition verdicts."""
    from xmlschema_ray.pipelines.sequences import validate_sequences

    return validate_sequences("/root/testdata/sf0.001")


def _modules():
    from xmlschema_ray.pipelines import (
        analytics,
        bpe,
        cleaning,
        curation,
        dedup,
        multimodal,
        relational,
        sequences,
        similarity,
        textstats,
        validation_queries,
    )

    return [
        relational,
        analytics,
        validation_queries,
        cleaning,
        textstats,
        curation,
        bpe,
        dedup,
        similarity,
        multimodal,
        sequences,
    ]


def queries() -> dict[str, Callable[[str], Any]]:
    out: dict[str, Callable[[str], Any]] = {}
    for m in _modules():
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        out.update(m.ORACLES)
    return out
