"""Stats-pruned range audit — constraint-aware SCAN PRUNING.

The 100-TB validation question is usually "prove the corpus clean",
and at that scale most files ARE clean. For pure range constraints on
integer / timestamp columns, a parquet footer's own column statistics
(per-row-group min/max) can prove a whole file compliant without
reading a byte of data — the same footer contract the range-clustered
layout's zone maps trust (``sources/clustered.py``). ``range_audit``
runs a DISTRIBUTED footer-only scan over the file list, classifies
every file, never opens a PROVEN_CLEAN file, and scans only the
suspect files' needed columns for exact row-level violations.

Soundness is one-directional by construction: statistics can prove
cleanliness (every value in [min, max] ⊆ the allowed range) but are
never trusted to prove a violation — a suspect file is SCANNED, so the
emitted violations are identical to a full scan's. Anything that
weakens the proof degrades to scanning, never to skipping: a missing
statistics block, a row group without min/max, a floating-point column
(parquet NaN handling predates the spec's ``nan_count``; float stats
are untrusted here), or a column absent from the file.

Pruning power = alignment between layout and constraint: a corpus
clustered on the audited column prunes to the handful of boundary
files (the watermark audit "no rows past the load cutoff" touches only
the newest file); a shuffled corpus proves nothing and the audit
honestly reports 0 pruned. The report carries both counts so the
capacity question ("what does this audit cost on THIS layout?") is
answered by the run itself.

Reference analog: the facet range checks (``validators/facets.py``
min/max In/Exclusive) fused with the metadata-only schema sniff
(§2.1); the reference validates every value because an XML tree has no
column statistics — a columnar layout does, so the engine uses them.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

Bound = Union[int, float, str, "pd.Timestamp", None]


@dataclass(frozen=True)
class RangeRule:
    """Allowed closed/open range for ``column``: a value v is valid iff
    ``lo <op> v <op> hi`` with inclusivity per flag (None bound = that
    side unbounded). Columns must be integer or timestamp typed — the
    dtypes whose parquet statistics are exact and total-ordered (float
    stats are NaN-hazardous and untrusted; see module docstring)."""

    column: str
    lo: Bound = None
    hi: Bound = None
    lo_inclusive: bool = True
    hi_inclusive: bool = True

    @property
    def name(self) -> str:
        return f"{self.column}.range"


def _to_int64(v) -> int:
    """Normalize a bound or a footer statistic to comparable int64:
    timestamps → epoch µs, ints pass through. Raises on floats —
    callers gate dtypes before getting here."""
    if isinstance(v, (np.datetime64,)):
        return int(pd.Timestamp(v).value // 1000)
    if isinstance(v, pd.Timestamp):
        return int(v.value // 1000)
    if hasattr(v, "year") and hasattr(v, "month"):  # datetime.datetime/date
        return int(pd.Timestamp(v).value // 1000)
    if isinstance(v, (int, np.integer)):
        return int(v)
    raise TypeError(f"range_audit bound/stat must be int or timestamp, got {type(v)}")


def _list_parquet(source: Union[str, Sequence[str]]) -> List[str]:
    if not isinstance(source, str):
        return sorted(source)
    if os.path.isfile(source):
        return [source]
    out: List[str] = []
    for root, _dirs, files in os.walk(source):
        out.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    return sorted(out)


def _footer_verdicts(
    paths_batch: pd.DataFrame,
    rules: Tuple[RangeRule, ...],
    key_columns: Tuple[str, ...] = (),
) -> pd.DataFrame:
    """Per-file footer-only classification (runs distributed, one row
    per file in, one out): clean=True iff EVERY rule is proven by
    trusted statistics across ALL row groups. Also emits the file's
    present rule columns (``rule_cols``) so the scan stage can read each
    schema generation with ITS OWN column list — a suspect file missing
    a rule's column must not crash (or silently null-fill) the shared
    read."""
    import pyarrow.parquet as pq

    out = []
    for path in paths_batch["path"]:
        md = pq.ParquetFile(path).metadata
        names = [md.schema.column(j).name for j in range(md.num_columns)]
        clean = True
        for rule in rules:
            if rule.column not in names:
                # absent column ⇒ every value null ⇒ range-exempt (facet
                # convention): PROVEN clean for this rule from the schema
                # alone — the strongest form of metadata proof
                continue
            j = names.index(rule.column)
            phys = md.schema.column(j).physical_type
            if phys in ("FLOAT", "DOUBLE"):
                clean = False  # float stats untrusted (NaN hazard)
                break
            proven = True
            for i in range(md.num_row_groups):
                st = md.row_group(i).column(j).statistics
                if st is None or not st.has_min_max:
                    proven = False
                    break
                fmin, fmax = _to_int64(st.min), _to_int64(st.max)
                if rule.lo is not None:
                    lo = _to_int64(rule.lo)
                    if not (fmin >= lo if rule.lo_inclusive else fmin > lo):
                        proven = False
                        break
                if rule.hi is not None:
                    hi = _to_int64(rule.hi)
                    if not (fmax <= hi if rule.hi_inclusive else fmax < hi):
                        proven = False
                        break
            if not proven:
                clean = False
                break
        missing_keys = [k for k in key_columns if k not in names]
        out.append(
            {
                "path": path,
                "clean": clean,
                "rule_cols": ",".join(sorted({r.column for r in rules} & set(names))),
                "missing_keys": ",".join(missing_keys),
            }
        )
    return pd.DataFrame(out)


def range_audit(
    source: Union[str, Sequence[str]],
    rules: Sequence[RangeRule],
    key_columns: Sequence[str],
) -> Tuple[pd.DataFrame, Dict[str, int]]:
    """Audit ``source`` (a parquet dir / file / path list) against
    ``rules``. Returns ``(violations, report)``:

    * ``violations`` — one row per offending value: the key columns,
      ``constraint_name`` (``{column}.range``) and ``value_int`` (the
      offending value as int64 — epoch µs for timestamps), sorted by
      key then constraint. Identical to a full scan by construction.
    * ``report`` — ``{"n_files", "n_pruned", "n_scanned"}``; pruned
      files were never opened past their footer.

    Both stages are distributed: a footer-only map over the file list
    (driver state is one boolean per file), then a column-pruned
    ``read_parquet`` over ONLY the suspect files. Null values are
    range-exempt (facet convention)."""
    rules = tuple(rules)
    key_columns = list(key_columns)
    if not rules:
        raise ValueError("range_audit needs at least one rule")
    paths = _list_parquet(source)
    if not paths:
        raise ValueError(f"no parquet files under {source!r}")

    kc_tuple = tuple(key_columns)
    verdicts = (
        rd.from_items([{"path": p} for p in paths])
        .map_batches(
            lambda b, rules=rules: _footer_verdicts(b, rules, kc_tuple),
            batch_format="pandas",
        )
        .to_pandas()
    )
    suspects_df = verdicts.loc[~verdicts["clean"]]
    suspect = sorted(suspects_df["path"])
    report = {
        "n_files": len(paths),
        "n_pruned": len(paths) - len(suspect),
        "n_scanned": len(suspect),
    }
    bad_keys = suspects_df.loc[suspects_df["missing_keys"] != ""]
    if len(bad_keys):
        raise ValueError(
            "range_audit: suspect file(s) lack key column(s) "
            f"{sorted(set(bad_keys['missing_keys']))} — violation identity "
            f"cannot be emitted (e.g. {bad_keys['path'].iloc[0]!r})"
        )

    empty = pd.DataFrame(
        {
            **{k: pd.Series([], dtype=object) for k in key_columns},
            "constraint_name": pd.Series([], dtype=object),
            "value_int": pd.Series([], dtype="int64"),
        }
    )
    if not suspect:
        return empty, report

    def find(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for rule in rules:
            if rule.column not in df.columns:
                continue  # absent ⇒ all null ⇒ range-exempt (schema proof)
            s = df[rule.column]
            ok = s.notna().to_numpy()
            if pd.api.types.is_datetime64_any_dtype(s.dtype):
                v = s.to_numpy(dtype="datetime64[us]").view("int64")
            elif pd.api.types.is_float_dtype(s.dtype):
                # fail loudly rather than silently truncating a float
                # column into int64 (the footer pass already refuses to
                # prove float files clean, so this is reachable only by
                # auditing a float column directly)
                raise TypeError(
                    f"range_audit does not support float column {rule.column!r}"
                )
            else:
                v = s.fillna(0).to_numpy(np.int64)
            bad = np.zeros(len(df), dtype=bool)
            if rule.lo is not None:
                lo = _to_int64(rule.lo)
                bad |= (v < lo) if rule.lo_inclusive else (v <= lo)
            if rule.hi is not None:
                hi = _to_int64(rule.hi)
                bad |= (v > hi) if rule.hi_inclusive else (v >= hi)
            bad &= ok
            if bad.any():
                p = df.loc[bad, key_columns].copy()
                p["constraint_name"] = rule.name
                p["value_int"] = v[bad]
                parts.append(p)
        if not parts:
            return empty.copy()
        return pd.concat(parts, ignore_index=True)

    from xmlschema_ray.ops.relational import to_pandas_with_schema

    # one scan per SCHEMA GENERATION of the suspect set: files are grouped
    # by which rule columns they carry so every read's column list exists
    # in every file it touches (a shared read would crash — or silently
    # null-fill, depending on which file sorts first)
    frames = []
    for rule_cols, grp in suspects_df.groupby("rule_cols", sort=True):
        cols = sorted(set(key_columns) | set(filter(None, rule_cols.split(","))))
        frames.append(
            to_pandas_with_schema(
                rd.read_parquet(sorted(grp["path"]), columns=cols).map_batches(
                    find, batch_format="pandas"
                )
            )
        )
    nonempty = [f for f in frames if len(f)]
    viol = pd.concat(nonempty, ignore_index=True) if nonempty else empty.copy()
    if viol.empty:
        return empty, report
    viol = (
        viol[key_columns + ["constraint_name", "value_int"]]
        .sort_values(key_columns + ["constraint_name"], kind="mergesort")
        .reset_index(drop=True)
    )
    viol["value_int"] = viol["value_int"].astype("int64")
    return viol, report
