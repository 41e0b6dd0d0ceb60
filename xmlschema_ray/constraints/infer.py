"""Spec inference: bootstrap a ``TableConstraints`` from a Parquet corpus.

The schema-generation counterpart of the reference's schema *fetching*
surface (``resources.py:120-192`` fetch_schema / schema sniffing,
SURVEY §2.1): given data with no spec, propose the tightest spec the
observed data satisfies — dtypes and nullability from the file schema
and null counts, numeric/temporal min-max windows, small-cardinality
string columns as enumerations, list columns with item ranges and
length bounds. The inferred spec is self-consistent by construction:
validating the corpus it was inferred from yields zero violations
(asserted in tests), and it compiles through the same lint as a
hand-written spec.

Scale shape: ONE streaming pass — per-batch partial frames (min, max,
null count, capped distinct sample per column; all vectorized Arrow
kernels) fold driver-side into O(columns) state. Distinct sampling is
capped at ``enum_threshold + 1`` values per column per batch, so the
driver never sees more than that per column regardless of corpus size.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from xmlschema_ray.constraints import facets as F
from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints


def _fold(state: dict, part: dict, enum_cap: int) -> None:
    for col, rec in part.items():
        s = state.setdefault(
            col, {"min": None, "max": None, "nulls": 0, "distinct": set(), "overflow": False}
        )
        for lo, hi in (("min", "max"), ("len_min", "len_max")):
            if rec.get(lo) is not None:
                s[lo] = rec[lo] if s.get(lo) is None else min(s[lo], rec[lo])
                s[hi] = rec[hi] if s.get(hi) is None else max(s[hi], rec[hi])
        s["nulls"] += rec["nulls"]
        s["nan"] = s.get("nan", 0) + rec.get("nan", 0)
        if rec.get("overflow"):
            s["overflow"] = True
        if not s["overflow"]:
            s["distinct"].update(rec.get("distinct", ()))
            if len(s["distinct"]) > enum_cap:
                s["overflow"] = True
                s["distinct"] = set()


def infer_spec(
    source: Union[str, List[str], "rd.Dataset"],
    name: str = "inferred",
    enum_threshold: int = 16,
    key_column: Optional[str] = None,
) -> TableConstraints:
    """Infer the tightest spec the observed corpus satisfies.

    * numeric / temporal columns → ``MinInclusive``/``MaxInclusive``
      windows at the observed extremes;
    * string columns with ≤ ``enum_threshold`` distinct values →
      ``Enumeration`` (provenance labels, status codes); above it, no
      value facet (patterns are NOT guessed — a wrong inferred pattern
      would reject valid future data);
    * ``list`` columns → ``ItemFacets`` with the observed item window
      plus observed ``MinLength``/``MaxLength``;
    * ``nullable`` iff a null was observed; every column ``required``.

    ``key_column`` (or a column literally named ``doc_id``) becomes
    ``key_columns`` for violation identity. The result ``.compile()``s
    through the normal lint. Observed-extreme windows are intentionally
    tight: they describe THIS corpus; widen with
    :func:`~xmlschema_ray.constraints.serde.override_spec` before
    validating future data, or audit the gap with ``spec_compat``.
    """
    ds = source if isinstance(source, rd.Dataset) else rd.read_parquet(source)
    schema = ds.schema().base_schema
    enum_cap = enum_threshold

    def nan_aware_min_max(arr) -> tuple:
        """(min, max, nan_count) — Arrow ``min_max`` does NOT skip NaN
        (a single NaN poisons both bounds into NaN), so float inputs are
        filtered to non-NaN first and the NaN count is carried so the
        final assembly can skip range facets for NaN-bearing columns
        (a range facet would flag every NaN row and break the
        infer→validate zero-violation invariant)."""
        n_nan = 0
        if pa.types.is_floating(arr.type):
            nan_mask = pc.is_nan(arr)
            n_nan = pc.sum(nan_mask).as_py() or 0
            if n_nan:
                arr = arr.filter(pc.invert(nan_mask))
        mm = pc.min_max(arr)
        return mm["min"].as_py(), mm["max"].as_py(), n_nan

    def partial(batch: pa.Table) -> pa.Table:
        out: dict = {}
        for col_name in batch.column_names:
            col = batch[col_name]
            t = col.type
            rec = {"min": None, "max": None, "nulls": col.null_count, "distinct": set()}
            if pa.types.is_list(t) or pa.types.is_large_list(t):
                flat = col.combine_chunks().flatten() if isinstance(col, pa.ChunkedArray) else col.flatten()
                lens = pc.list_value_length(col)
                rec["min"], rec["max"], rec["nan"] = nan_aware_min_max(flat)
                mm = pc.min_max(lens)
                rec["len_min"] = mm["min"].as_py()
                rec["len_max"] = mm["max"].as_py()
            elif pa.types.is_string(t) or pa.types.is_large_string(t):
                uniq = pc.unique(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
                uniq = uniq.drop_null()
                if len(uniq) > enum_cap:
                    rec["overflow"] = True
                else:
                    rec["distinct"] = set(uniq.to_pylist())
            elif pa.types.is_binary(t) or pa.types.is_large_binary(t) or pa.types.is_struct(t):
                pass  # shape-only columns: dtype + nullability
            else:
                arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                rec["min"], rec["max"], rec["nan"] = nan_aware_min_max(arr)
            out[col_name] = rec
        import pickle

        return pa.table({"blob": pa.array([pickle.dumps(out)], type=pa.binary())})

    import pickle

    state: Dict[str, dict] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for blob in b["blob"].to_pylist():
            _fold(state, pickle.loads(blob), enum_cap)

    columns: List[ColumnSpec] = []
    for field in schema:
        s = state.get(field.name, {"min": None, "max": None, "nulls": 0, "distinct": set(), "overflow": True})
        facets: list = []
        t = field.type
        # NaN-bearing float columns get NO range facet: NaN fails every
        # ordered comparison, so MinInclusive(observed_min) would flag the
        # NaN rows and break the infer→validate zero-violation invariant
        has_nan = s.get("nan", 0) > 0
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            if s["min"] is not None and not has_nan:
                facets.append(
                    F.ItemFacets((F.MinInclusive(s["min"]), F.MaxInclusive(s["max"])))
                )
            if s.get("len_min") is not None:
                facets.append(F.MinLength(int(s["len_min"])))
                facets.append(F.MaxLength(int(s["len_max"])))
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            if not s["overflow"] and s["distinct"]:
                facets.append(F.Enumeration(tuple(sorted(s["distinct"]))))
        elif s["min"] is not None and not has_nan:
            facets.append(F.MinInclusive(s["min"]))
            facets.append(F.MaxInclusive(s["max"]))
        columns.append(
            ColumnSpec(
                field.name,
                t,
                nullable=s["nulls"] > 0,
                facets=tuple(facets),
            )
        )

    key = key_column or ("doc_id" if any(c.name == "doc_id" for c in columns) else None)
    return TableConstraints(
        name=name,
        columns=columns,
        key_columns=(key,) if key else (columns[0].name,),
        allow_extra_columns=False,
    ).compile()


# -- spec relaxation (violations → minimal compatible amendment) -------------


def _ts_norm(v):
    """Normalize datetime-likes to pd.Timestamp so observed extremes and
    declared facet bounds compare regardless of which flavor each is."""
    import datetime

    import pandas as pd

    if isinstance(v, (np.datetime64, datetime.datetime, datetime.date)):
        return pd.Timestamp(v)
    return v


def suggest_relaxations(
    spec: TableConstraints,
    source: Union[str, List[str], "rd.Dataset"],
    enum_cap: int = 64,
) -> List[Dict]:
    """The remediation direction of :func:`infer_spec`: given a spec the
    data VIOLATES, propose the LOOSEST amendment that makes the observed
    corpus valid — widen range facets to the observed extremes, length
    facets to the observed lengths, union new values into enumerations
    (or drop an enum whose observed cardinality exceeds ``enum_cap``),
    and flip ``nullable`` where nulls were observed. The operational
    loop: a run goes red → ``suggest_relaxations`` → review →
    :func:`apply_relaxations` → ``spec_compat(old, new)`` certifies the
    amendment is pure relaxation (zero breaking findings, by
    construction — every suggestion only ADMITS more data).

    Patterns, assertions and encoded-length facets are never relaxed
    (no cheap sound widening exists); their violations stay violations.
    Enumeration overflow counts only values OUTSIDE the declared enum
    union — a large enum the data fully satisfies is never a relaxation
    candidate (with multiple enums on one column, extras are tracked
    against their union, so the narrower facet's suggestion may
    under-report — one enum per column is the linted norm).

    Scale shape: ONE streaming pass over ONLY the constrained columns
    (pruned read), per-batch partial rows (min/max NaN-filtered, length
    min/max, null count, capped distinct sample), O(columns) driver fold
    — the ``infer_spec`` contract.
    """
    range_kinds = (F.MinInclusive, F.MaxInclusive, F.MinExclusive, F.MaxExclusive)

    needs: Dict[str, Dict] = {}
    for c in spec.columns:
        need: Dict = {"range": False, "len": False, "enum": False, "declared": None}
        for f in c.facets:
            if isinstance(f, range_kinds):
                need["range"] = True
            elif isinstance(f, (F.MinLength, F.MaxLength)) and f.encoding == "none":
                need["len"] = True
            elif isinstance(f, F.Enumeration):
                need["enum"] = True
                # overflow must count only values OUTSIDE the declared
                # enum(s): a 1000-value enum fully satisfied by the data
                # is NOT a relaxation candidate
                cur = need["declared"] or set()
                need["declared"] = cur | set(f.values)
        if not c.nullable:
            need["null"] = True
        if any(v for k, v in need.items() if k != "declared"):
            needs[c.name] = need
    if not needs:
        return []

    cols = sorted(needs)
    ds = source if isinstance(source, rd.Dataset) else rd.read_parquet(source, columns=cols)
    if isinstance(source, rd.Dataset):
        ds = ds.select_columns(cols)

    def partial(batch: pa.Table):
        import pandas as pd

        rows = []
        for name in cols:
            col = batch[name]
            need = needs[name]
            rec: Dict = {
                "column": name,
                "vmin": None,
                "vmax": None,
                "lmin": None,
                "lmax": None,
                "n_null": int(col.null_count),
                "distinct": None,
                "overflow": False,
            }
            nn = col.drop_null()
            if len(nn):
                if need["range"]:
                    arr = nn
                    if pa.types.is_floating(arr.type):
                        m = pc.is_nan(arr)
                        if pc.sum(m).as_py():
                            arr = arr.filter(pc.invert(m))
                    if len(arr):
                        mm = pc.min_max(arr)
                        rec["vmin"], rec["vmax"] = mm["min"].as_py(), mm["max"].as_py()
                if need["len"]:
                    t = nn.type
                    if pa.types.is_list(t) or pa.types.is_large_list(t):
                        lens = pc.list_value_length(nn)
                    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
                        lens = pc.binary_length(nn)
                    else:
                        lens = pc.utf8_length(nn)
                    mm = pc.min_max(lens)
                    rec["lmin"], rec["lmax"] = mm["min"].as_py(), mm["max"].as_py()
                if need["enum"]:
                    u = pc.unique(nn).to_pylist()
                    extra = [x for x in u if x not in need["declared"]]
                    if len(extra) > enum_cap + 1:
                        rec["overflow"] = True
                        rec["distinct"] = []
                    else:
                        rec["distinct"] = extra
            rows.append(rec)
        # pandas block with OBJECT value cells: vmin/vmax may be a float in
        # one column's row and a datetime in another's — an Arrow block
        # would refuse the mixed column, a pandas block carries it
        df = pd.DataFrame(rows)
        for c in ("vmin", "vmax", "lmin", "lmax", "distinct"):
            df[c] = df[c].astype(object)
        return df

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()

    state: Dict[str, Dict] = {
        n: {"vmin": None, "vmax": None, "lmin": None, "lmax": None, "n_null": 0,
            "distinct": set(), "overflow": False}
        for n in cols
    }
    for _, r in parts.iterrows():
        s = state[r["column"]]
        for lo_k, hi_k in (("vmin", "vmax"), ("lmin", "lmax")):
            if r[lo_k] is not None:
                lo = _ts_norm(r[lo_k])
                s[lo_k] = lo if s[lo_k] is None else min(s[lo_k], lo)
            if r[hi_k] is not None:
                hi = _ts_norm(r[hi_k])
                s[hi_k] = hi if s[hi_k] is None else max(s[hi_k], hi)
        s["n_null"] += int(r["n_null"])
        if r["overflow"]:
            s["overflow"] = True
        elif r["distinct"] is not None:
            s["distinct"].update(r["distinct"])
            if len(s["distinct"]) > enum_cap:
                s["overflow"] = True

    out: List[Dict] = []
    for c in spec.columns:
        if c.name not in state:
            continue
        s = state[c.name]
        if not c.nullable and s["n_null"] > 0:
            out.append(
                {
                    "column": c.name,
                    "facet": "not_null",
                    "action": "nullable",
                    "suggested": None,
                    "detail": f"{s['n_null']} nulls observed",
                }
            )
        for f in c.facets:
            sug = None
            action = None
            if isinstance(f, F.MinInclusive) and s["vmin"] is not None:
                if s["vmin"] < _ts_norm(f.value):
                    sug, action = F.MinInclusive(s["vmin"]), "widen"
            elif isinstance(f, F.MinExclusive) and s["vmin"] is not None:
                if not (s["vmin"] > _ts_norm(f.value)):
                    # exclusive can't admit its own bound: relax to
                    # inclusive AT the observed minimum
                    sug, action = F.MinInclusive(s["vmin"]), "widen"
            elif isinstance(f, F.MaxInclusive) and s["vmax"] is not None:
                if s["vmax"] > _ts_norm(f.value):
                    sug, action = F.MaxInclusive(s["vmax"]), "widen"
            elif isinstance(f, F.MaxExclusive) and s["vmax"] is not None:
                if not (s["vmax"] < _ts_norm(f.value)):
                    sug, action = F.MaxInclusive(s["vmax"]), "widen"
            elif isinstance(f, F.MinLength) and f.encoding == "none" and s["lmin"] is not None:
                if s["lmin"] < f.k:
                    sug, action = F.MinLength(int(s["lmin"])), "widen"
            elif isinstance(f, F.MaxLength) and f.encoding == "none" and s["lmax"] is not None:
                if s["lmax"] > f.k:
                    sug, action = F.MaxLength(int(s["lmax"])), "widen"
            elif isinstance(f, F.Enumeration):
                extra = s["distinct"] - set(f.values)
                if s["overflow"]:
                    sug, action = None, "drop"
                elif extra:
                    sug = F.Enumeration(tuple(sorted(set(f.values) | s["distinct"], key=str)))
                    action = "widen"
            if action is not None:
                out.append(
                    {
                        "column": c.name,
                        "facet": f.describe(),
                        "action": action,
                        "suggested": sug,
                        "detail": (
                            f"observed [{s['vmin']}, {s['vmax']}]"
                            if action == "widen" and isinstance(f, range_kinds)
                            else f"observed lengths [{s['lmin']}, {s['lmax']}]"
                            if isinstance(f, (F.MinLength, F.MaxLength))
                            else f"observed cardinality exceeds enum_cap"
                            if action == "drop"
                            else f"{len(s['distinct'] - set(f.values))} new values"
                        ),
                    }
                )
    return out


def apply_relaxations(spec: TableConstraints, suggestions: List[Dict]) -> TableConstraints:
    """Build the amended spec: each suggestion's facet is replaced by its
    widened form (or dropped, for ``action='drop'``); ``nullable``
    suggestions flip the column. Returns a NEW compiled spec — feed the
    (old, new) pair to ``spec_compat`` to certify pure relaxation."""
    from dataclasses import replace as _replace

    by_col: Dict[str, List[Dict]] = {}
    for sg in suggestions:
        by_col.setdefault(sg["column"], []).append(sg)
    new_cols = []
    for c in spec.columns:
        sgs = by_col.get(c.name)
        if not sgs:
            new_cols.append(c)
            continue
        nullable = c.nullable or any(sg["action"] == "nullable" for sg in sgs)
        repl = {sg["facet"]: sg for sg in sgs if sg["facet"] != "not_null"}
        facets = []
        for f in c.facets:
            sg = repl.get(f.describe())
            if sg is None:
                facets.append(f)
            elif sg["suggested"] is not None:
                facets.append(sg["suggested"])
            # action == 'drop' → facet omitted
        new_cols.append(_replace(c, nullable=nullable, facets=tuple(facets)))
    return _replace_spec_columns(spec, new_cols)


def _replace_spec_columns(spec: TableConstraints, new_cols: List[ColumnSpec]) -> TableConstraints:
    # dataclasses.replace so EVERY field (aliases included, and any field
    # added to TableConstraints later) survives the rebuild — a hand-copied
    # constructor call silently drops new sections. Alias expansion is
    # idempotent on an already-compiled input: members exist as columns,
    # and a clone mismatch (head and member relaxed differently) raises
    # in compile rather than silently diverging.
    from dataclasses import replace as _dc_replace

    return _dc_replace(spec, columns=new_cols).compile()
