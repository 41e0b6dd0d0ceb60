"""PSVI-style verdicts.

Vocabulary lifted from the reference's post-schema-validation infoset
attributes (``/root/reference/xmlschema/validators/xsdbase.py:69-92``):
``validity`` in {valid, invalid, notKnown} and ``validation_attempted`` in
{full, partial, none}. A partition is invalid iff any of its checks fired —
the any-error-propagates roll-up of ``xsdbase.py:80-92``; the job verdict is
the OR-reduce over partitions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import pandas as pd

VALID = "valid"
INVALID = "invalid"
NOT_KNOWN = "notKnown"

FULL = "full"
PARTIAL = "partial"
NONE = "none"


@dataclass
class PartitionVerdict:
    partition_id: int
    validity: str = VALID
    validation_attempted: str = FULL
    n_rows: int = 0
    n_violations: int = 0
    # warning-severity violations (spec.warning_constraints): recorded and
    # counted, never flip validity — the per-constraint lax mode
    n_warnings: int = 0

    def mark(self, n_new_violations: int) -> None:
        self.n_violations += int(n_new_violations)
        if self.n_violations > 0:
            self.validity = INVALID

    def mark_warnings(self, n_new_warnings: int) -> None:
        self.n_warnings += int(n_new_warnings)


def verdicts_frame(verdicts: List[PartitionVerdict]) -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                "partition_id": v.partition_id,
                "validity": v.validity,
                "validation_attempted": v.validation_attempted,
                "n_rows": v.n_rows,
                "n_violations": v.n_violations,
                "n_warnings": v.n_warnings,
            }
            for v in sorted(verdicts, key=lambda v: v.partition_id)
        ]
    )


def job_validity(verdicts: List[PartitionVerdict]) -> str:
    if any(v.validity == INVALID for v in verdicts):
        return INVALID
    if any(v.validity == NOT_KNOWN for v in verdicts):
        return NOT_KNOWN
    return VALID
