"""Mergeable per-batch statistics sketches and drift metrics.

The reference has no stats channel (SURVEY.md §2.7) — these are mandated by
the north rule: min/max/null-count, mean/std (Welford-style mergeable
moments), distinct-count via HyperLogLog register arrays, fixed-bin
histograms, and KS/PSI drift computed on merged histograms vs a reference
profile.

Design: stage A (the row validator) computes ONE ``BatchStats`` per Arrow
batch from vectorized numpy reductions, serializes it to a small binary
blob, and emits it alongside violation rows in the same single pass — the
columnar analog of the reference's validation-computes-everything-in-one-
decode-pass design (``validators/xsdbase.py:547-593``). Blobs are merged
associatively: first per-block (tree step, keeps the driver merge
O(#blocks)), then on the driver.

Hashing is ``pandas.util.hash_array`` (SipHash with a fixed key) — stable
across processes and vectorized, so HLL register arrays computed on
different workers merge correctly.
"""

from __future__ import annotations

import math
import pickle
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

HLL_P = 12  # 4096 registers, ~1.6% relative error
_HLL_M = 1 << HLL_P


def hash64(values: np.ndarray) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of an object/numeric array.

    Integer/bool inputs hash through their FLOAT64 spelling so a
    null-bearing batch's float64 representation of the same logical value
    hashes identically (Ray's pandas conversion turns nullable int64
    batches float64 — without this, one key's rows would split across
    buckets/partitions/filters). Values past 2^53 can collide after the
    cast, which is safe at every call site by the repo's two-phase
    discipline: hash collisions only create false candidates or
    co-residents, never false results."""
    if values.dtype.kind in ("U", "S"):
        values = values.astype(object)
    elif values.dtype.kind in ("i", "u", "b"):
        values = values.astype(np.float64)
    return pd.util.hash_array(values, categorize=False)


def isin_sorted(values: np.ndarray, sorted_cands: np.ndarray) -> np.ndarray:
    """Membership of ``values`` in an ascending-sorted candidate array.

    O(n log m) binary search. ``np.isin`` degenerates to an O(n*m)
    elementwise sweep when the candidate set is small relative to the
    value array — measured at 2.4 s for 4M uint64 hashes against ~100
    candidates on this box, vs ~30 ms for this form — which made the
    membership test (not the parquet scan) the dominant cost of the
    stage-B exact-recovery rescan.
    """
    values = np.asarray(values)
    if not len(sorted_cands) or not len(values):
        return np.zeros(len(values), dtype=bool)
    idx = np.searchsorted(sorted_cands, values)
    idx[idx == len(sorted_cands)] = 0
    return sorted_cands[idx] == values


def hll_new() -> np.ndarray:
    return np.zeros(_HLL_M, dtype=np.uint8)


def hll_add_hashes(reg: np.ndarray, h: np.ndarray) -> None:
    """Fold 64-bit hashes into HLL registers, fully vectorized."""
    if len(h) == 0:
        return
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # rank = 64 - floor(log2(rest)); the OR above guarantees a set bit so
    # log2 is defined and rank <= 64 - P + 1.
    fl = np.floor(np.log2(rest.astype(np.float64)))
    rank = (64 - fl).astype(np.uint8)
    np.maximum.at(reg, idx, rank)


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(reg: np.ndarray) -> float:
    m = float(_HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)  # linear counting small-range correction
    return float(est)


@dataclass
class ColumnStats:
    """Mergeable moments + extremes for one numeric quantity."""

    count: int = 0
    null_count: int = 0
    vmin: Optional[float] = None
    vmax: Optional[float] = None
    total: float = 0.0
    total_sq: float = 0.0

    def observe(self, values: np.ndarray, null_count: int) -> None:
        self.null_count += int(null_count)
        if len(values) == 0:
            return
        self.count += int(len(values))
        lo = float(values.min())
        hi = float(values.max())
        self.vmin = lo if self.vmin is None else min(self.vmin, lo)
        self.vmax = hi if self.vmax is None else max(self.vmax, hi)
        v = values.astype(np.float64, copy=False)
        self.total += float(v.sum())
        self.total_sq += float((v * v).sum())

    def merge(self, other: "ColumnStats") -> None:
        self.count += other.count
        self.null_count += other.null_count
        for v in (other.vmin,):
            if v is not None:
                self.vmin = v if self.vmin is None else min(self.vmin, v)
        for v in (other.vmax,):
            if v is not None:
                self.vmax = v if self.vmax is None else max(self.vmax, v)
        self.total += other.total
        self.total_sq += other.total_sq

    @property
    def mean(self) -> Optional[float]:
        return self.total / self.count if self.count else None

    @property
    def std(self) -> Optional[float]:
        if not self.count:
            return None
        m = self.total / self.count
        var = max(0.0, self.total_sq / self.count - m * m)
        return math.sqrt(var)

    def to_dict(self) -> Dict:
        return {
            "count": self.count,
            "null_count": self.null_count,
            "min": self.vmin,
            "max": self.vmax,
            "mean": self.mean,
            "std": self.std,
        }


@dataclass
class BatchStats:
    """One partial-stats record: per-column moments, HLLs, histograms."""

    n_rows: int = 0
    columns: Dict[str, ColumnStats] = field(default_factory=dict)
    hlls: Dict[str, np.ndarray] = field(default_factory=dict)
    histograms: Dict[str, np.ndarray] = field(default_factory=dict)
    # aggregate-check partials: check name -> {group value (or None for a
    # global check): array([n_rows, n_nulls, value_sum], float64)} —
    # associative addition, so the channel merges like histograms
    groups: Dict[str, Dict[object, np.ndarray]] = field(default_factory=dict)

    def merge(self, other: "BatchStats") -> "BatchStats":
        self.n_rows += other.n_rows
        for name, cs in other.columns.items():
            self.columns.setdefault(name, ColumnStats()).merge(cs)
        for name, reg in other.hlls.items():
            if name in self.hlls:
                self.hlls[name] = hll_merge(self.hlls[name], reg)
            else:
                self.hlls[name] = reg.copy()
        for name, h in other.histograms.items():
            if name in self.histograms:
                self.histograms[name] = self.histograms[name] + h
            else:
                self.histograms[name] = h.copy()
        for name, gd in other.groups.items():
            mine = self.groups.setdefault(name, {})
            for gv, triple in gd.items():
                if gv in mine:
                    mine[gv] = mine[gv] + triple
                else:
                    mine[gv] = triple.copy()
        return self

    def dumps(self) -> bytes:
        return pickle.dumps(self, protocol=pickle.HIGHEST_PROTOCOL)

    @staticmethod
    def loads(blob: bytes) -> "BatchStats":
        return pickle.loads(blob)


def _column_numeric_values(col: pa.ChunkedArray | pa.Array) -> Tuple[np.ndarray, int]:
    """Non-null numeric values as numpy + null count."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    nulls = col.null_count
    vals = col.drop_null().to_numpy(zero_copy_only=False)
    return vals, nulls


def collect_batch_stats(
    table: pa.Table,
    stats_columns: Sequence[str],
    distinct_columns: Sequence[str],
    histogram_specs: Dict[str, np.ndarray],
    list_length_columns: Sequence[str] = (),
    group_agg_specs: Optional[Dict[str, tuple]] = None,
) -> BatchStats:
    """Compute one BatchStats for an Arrow batch — all vectorized.

    ``histogram_specs`` maps quantity-name -> bin_edges, or ->
    ``(bin_edges, group_by_column)`` for grouped drift gates: the grouped
    form ALSO emits one histogram per observed group value under the key
    ``"<qname>@<group>"`` (keys merge across batches/shards through the
    normal ``BatchStats.merge`` addition). A quantity named ``len(<col>)``
    histograms ``pc.list_value_length(col)``.
    """
    bs = BatchStats(n_rows=table.num_rows)
    for name in stats_columns:
        if name not in table.column_names:
            continue
        col = table[name]
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            col = pc.list_value_length(col)
        vals, nulls = _column_numeric_values(col)
        cs = ColumnStats()
        cs.observe(vals, nulls)
        bs.columns[name] = cs
    for name in distinct_columns:
        if name not in table.column_names:
            continue
        col = table[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = col.drop_null().to_numpy(zero_copy_only=False)
        reg = hll_new()
        hll_add_hashes(reg, hash64(vals))
        bs.hlls[name] = reg
    for qname, spec_v in histogram_specs.items():
        edges, group_by = spec_v if isinstance(spec_v, tuple) else (spec_v, None)
        if qname.startswith("len(") and qname.endswith(")"):
            src = qname[4:-1]
            if src not in table.column_names:
                continue
            q = pc.list_value_length(table[src])
        else:
            if qname not in table.column_names:
                continue
            q = table[qname]
        vals, _ = _column_numeric_values(q)
        hist, _ = np.histogram(vals, bins=edges)
        bs.histograms[qname] = hist.astype(np.int64)
        if group_by and group_by in table.column_names:
            # pairwise null mask keeps quantity and group values ALIGNED
            # (_column_numeric_values drops nulls and would misalign)
            q_pd = q.to_pandas()
            g_pd = table[group_by].to_pandas()
            ok = q_pd.notna().to_numpy() & g_pd.notna().to_numpy()
            qv = q_pd.to_numpy()[ok]
            gv_arr = g_pd.to_numpy()[ok]
            for gv in pd.unique(gv_arr):
                h, _ = np.histogram(qv[gv_arr == gv], bins=edges)
                bs.histograms[f"{qname}@{gv}"] = h.astype(np.int64)
    # aggregate-check partials: name -> (group_col | None, value_col | None).
    # One (n, nulls, sum) triple per observed group — vectorized bincounts
    # over the np.unique inverse, group-cardinality output.
    for cname, (group_col, value_col) in (group_agg_specs or {}).items():
        if group_col is not None and group_col not in table.column_names:
            continue
        if value_col is not None and value_col not in table.column_names:
            continue
        n_rows = table.num_rows
        if value_col is not None:
            vc = table[value_col]
            if isinstance(vc, pa.ChunkedArray):
                vc = vc.combine_chunks()
            null_mask = vc.is_null().to_numpy(zero_copy_only=False)
            vals = np.asarray(vc.to_pandas().to_numpy(), dtype=np.float64)
            vals = np.where(null_mask, 0.0, np.nan_to_num(vals, nan=0.0))
        else:
            null_mask = np.zeros(n_rows, dtype=bool)
            vals = np.zeros(n_rows, dtype=np.float64)
        if group_col is None:
            bs.groups[cname] = {
                None: np.array(
                    [float(n_rows), float(null_mask.sum()), float(vals.sum())]
                )
            }
            continue
        gv_arr = table[group_col].to_pandas().to_numpy()
        ug, inverse = np.unique(gv_arr.astype(str), return_inverse=True)
        n_g = np.bincount(inverse, minlength=len(ug)).astype(np.float64)
        nulls_g = np.bincount(
            inverse, weights=null_mask.astype(np.float64), minlength=len(ug)
        )
        sum_g = np.bincount(inverse, weights=vals, minlength=len(ug))
        bs.groups[cname] = {
            str(g): np.array([n_g[i], nulls_g[i], sum_g[i]]) for i, g in enumerate(ug)
        }
    return bs


def histogram_quantiles(
    hist: np.ndarray, bin_edges: np.ndarray, qs: Sequence[float] = (0.5, 0.95, 0.99)
) -> Dict[str, float]:
    """Approximate quantiles from a merged fixed-bin histogram (linear
    interpolation within bins). Mergeable by construction — histograms add
    — so this gives distributed quantiles without a sketch library; error
    is bounded by the bin width."""
    h = np.asarray(hist, dtype=np.float64)
    total = h.sum()
    out: Dict[str, float] = {}
    if total == 0:
        return {f"p{int(q * 100)}": float("nan") for q in qs}
    edges = np.asarray(bin_edges, dtype=np.float64)
    cum = np.cumsum(h)
    for q in qs:
        target = q * total
        i = int(np.searchsorted(cum, target, side="left"))
        i = min(i, len(h) - 1)
        prev = cum[i - 1] if i > 0 else 0.0
        frac = (target - prev) / h[i] if h[i] > 0 else 0.0
        out[f"p{int(q * 100)}"] = float(edges[i] + frac * (edges[i + 1] - edges[i]))
    return out


# -- drift metrics on merged histograms ----------------------------------


def ks_statistic(hist_a: np.ndarray, hist_b: np.ndarray) -> float:
    """Two-sample KS statistic approximated on shared-bin histograms."""
    a = np.asarray(hist_a, dtype=np.float64)
    b = np.asarray(hist_b, dtype=np.float64)
    if a.sum() == 0 or b.sum() == 0:
        return 0.0
    ca = np.cumsum(a) / a.sum()
    cb = np.cumsum(b) / b.sum()
    return float(np.abs(ca - cb).max())


def psi(hist_expected: np.ndarray, hist_actual: np.ndarray, eps: float = 1e-6) -> float:
    """Population Stability Index between binned distributions."""
    e = np.asarray(hist_expected, dtype=np.float64)
    a = np.asarray(hist_actual, dtype=np.float64)
    if e.sum() == 0 or a.sum() == 0:
        return 0.0
    pe = np.clip(e / e.sum(), eps, None)
    pa_ = np.clip(a / a.sum(), eps, None)
    return float(np.sum((pa_ - pe) * np.log(pa_ / pe)))
