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
    elif values.dtype.kind == "f" and values.dtype.itemsize < 8:
        # float32/float16 widen EXACTLY to float64: the same logical value
        # read as parquet FLOAT in one file generation and DOUBLE in
        # another must hash identically (schema drift across generations
        # is an acknowledged reality here) — without this, one key's rows
        # split across keycount hashes / bloom probes, the class the
        # HASH_TAG versioning exists to kill
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
    """Mergeable moments + extremes for one numeric quantity.

    Variance is carried as CENTERED second moments (``m2``) with the Chan
    parallel merge — the naive E[x²]−E[x]² form cancels catastrophically
    at large magnitudes (epoch-µs timestamps with a 1-second spread report
    std = 0.0 through the float64 ulp; measured live) while the centered
    merge stays exact to ~machine epsilon and remains fully associative.

    Float NaN is treated as NULL for profiling (excluded from count / sum
    / extremes and added to ``null_count``): parquet's own null channel is
    the norm here, and admitting raw NaN would both poison min/max and —
    because Python ``min(1.0, nan) != min(nan, 1.0)`` — make the merge
    ORDER-DEPENDENT, violating this module's associativity contract under
    Ray's nondeterministic tree-merge order."""

    count: int = 0
    null_count: int = 0
    vmin: Optional[float] = None
    vmax: Optional[float] = None
    total: float = 0.0
    m2: float = 0.0

    def observe(self, values: np.ndarray, null_count: int) -> None:
        self.null_count += int(null_count)
        if len(values) == 0:
            return
        v = values.astype(np.float64, copy=False)
        if v.dtype.kind == "f":
            nan_mask = np.isnan(v)
            if nan_mask.any():
                self.null_count += int(nan_mask.sum())
                v = v[~nan_mask]
                if len(v) == 0:
                    return
        n_b = int(len(v))
        lo, hi = float(v.min()), float(v.max())
        mean_b = float(v.mean())
        m2_b = float(((v - mean_b) ** 2).sum())
        # Chan et al. parallel update against the running (count, mean, m2)
        n_a = self.count
        if n_a == 0:
            self.count, self.total, self.m2 = n_b, mean_b * n_b, m2_b
            self.vmin, self.vmax = lo, hi
            return
        mean_a = self.total / n_a
        delta = mean_b - mean_a
        n = n_a + n_b
        self.m2 = self.m2 + m2_b + delta * delta * n_a * n_b / n
        self.total += mean_b * n_b
        self.count = n
        self.vmin = lo if self.vmin is None else min(self.vmin, lo)
        self.vmax = hi if self.vmax is None else max(self.vmax, hi)

    def merge(self, other: "ColumnStats") -> None:
        self.null_count += other.null_count
        for v in (other.vmin,):
            if v is not None:
                self.vmin = v if self.vmin is None else min(self.vmin, v)
        for v in (other.vmax,):
            if v is not None:
                self.vmax = v if self.vmax is None else max(self.vmax, v)
        n_a, n_b = self.count, other.count
        if n_b == 0:
            return
        if n_a == 0:
            self.count, self.total, self.m2 = n_b, other.total, other.m2
            return
        mean_a, mean_b = self.total / n_a, other.total / n_b
        delta = mean_b - mean_a
        n = n_a + n_b
        self.m2 = self.m2 + other.m2 + delta * delta * n_a * n_b / n
        self.total += other.total
        self.count = n

    @property
    def mean(self) -> Optional[float]:
        return self.total / self.count if self.count else None

    @property
    def std(self) -> Optional[float]:
        if not self.count:
            return None
        return math.sqrt(max(0.0, self.m2 / self.count))

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


def _group_labels(col: "pa.ChunkedArray | pa.Array") -> Tuple[np.ndarray, List[str]]:
    """(group index per row — −1 for NULL groups, label list) for a group
    column, via Arrow dictionary encoding. Labels are Python ``str()`` of
    the ARROW-faithful values (the repo's one key-identity convention):
    an int group renders '3' in every batch, where a pandas detour would
    render '3.0' whenever the batch happened to carry a null — silently
    splitting one logical group's partials. Null groups are EXCLUDED
    (index −1) in BOTH the group-agg and grouped-histogram channels — one
    consistent convention, matching the engine's null-exemption stance
    for identity constraints."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = pc.dictionary_encode(col)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    inverse = enc.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
    labels = [str(v) for v in enc.dictionary.to_pylist()]
    return inverse, labels


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
            # (_column_numeric_values drops nulls and would misalign);
            # group labels render through _group_labels (Arrow-faithful
            # str(), null groups excluded) so an int group is '3' in EVERY
            # batch — the pandas detour rendered it '3.0' in null-bearing
            # batches, silently splitting one group's histogram and
            # missing its group_references entry
            q_pd = q.to_pandas()
            inverse, labels = _group_labels(table[group_by])
            ok = q_pd.notna().to_numpy() & (inverse >= 0)
            qv = q_pd.to_numpy()[ok].astype(np.float64, copy=False)
            inv_ok = inverse[ok]
            if len(labels) and ok.any():
                # all per-group histograms in ONE pass: flat bincount over
                # group_index * nbins + bin_index (out-of-range values
                # drop, matching np.histogram's clip-out behavior)
                nbins = len(edges) - 1
                bin_idx = np.searchsorted(edges, qv, side="right") - 1
                # np.histogram includes the right edge of the LAST bin
                bin_idx[qv == edges[-1]] = nbins - 1
                in_range = (bin_idx >= 0) & (bin_idx < nbins)
                flat = np.bincount(
                    inv_ok[in_range] * nbins + bin_idx[in_range],
                    minlength=len(labels) * nbins,
                ).reshape(len(labels), nbins)
                seen_groups = np.unique(inv_ok)
                for gi in seen_groups:
                    bs.histograms[f"{qname}@{labels[gi]}"] = flat[gi].astype(
                        np.int64
                    )
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
            # a raw float NaN payload counts as NULL (not a silent 0 in
            # the sum that DEFLATES the group mean while still counting
            # as non-null evidence) — the ColumnStats NaN-as-null stance
            null_mask = null_mask | np.isnan(vals)
            vals = np.where(null_mask, 0.0, vals)
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
        # canonical group labels (Arrow-faithful str(), null groups
        # excluded) — see _group_labels; the old astype(str) over the
        # pandas conversion keyed an int group '1' in null-free batches
        # and '1.0' in null-bearing ones, splitting its partials
        inverse, labels = _group_labels(table[group_col])
        keep = inverse >= 0
        inv_k = inverse[keep]
        n_lab = len(labels)
        n_g = np.bincount(inv_k, minlength=n_lab).astype(np.float64)
        nulls_g = np.bincount(
            inv_k, weights=null_mask[keep].astype(np.float64), minlength=n_lab
        )
        sum_g = np.bincount(inv_k, weights=vals[keep], minlength=n_lab)
        bs.groups[cname] = {
            labels[i]: np.array([n_g[i], nulls_g[i], sum_g[i]])
            for i in np.unique(inv_k)
        }
    return bs


def histogram_quantiles(
    hist: np.ndarray, bin_edges: np.ndarray, qs: Sequence[float] = (0.5, 0.95, 0.99)
) -> Dict[str, float]:
    """Approximate quantiles from a merged fixed-bin histogram (linear
    interpolation within bins). Mergeable by construction — histograms add
    — so this gives distributed quantiles without a sketch library; error
    is bounded by the bin width."""
    def label(q: float) -> str:
        # %g keeps the defaults' historical labels (p50/p95/p99) while
        # int() truncation mislabeled q=0.29 as 'p28' (28.999… floor) and
        # collided q=0.999 with q=0.99 — fractional percents render as
        # 'p99_9'
        return "p" + ("%g" % (q * 100)).replace(".", "_")

    h = np.asarray(hist, dtype=np.float64)
    total = h.sum()
    out: Dict[str, float] = {}
    if total == 0:
        return {label(q): float("nan") for q in qs}
    edges = np.asarray(bin_edges, dtype=np.float64)
    cum = np.cumsum(h)
    for q in qs:
        target = q * total
        i = int(np.searchsorted(cum, target, side="left"))
        i = min(i, len(h) - 1)
        prev = cum[i - 1] if i > 0 else 0.0
        frac = (target - prev) / h[i] if h[i] > 0 else 0.0
        out[label(q)] = float(edges[i] + frac * (edges[i + 1] - edges[i]))
    return out


# -- drift metrics on merged histograms ----------------------------------


def ks_statistic(hist_a: np.ndarray, hist_b: np.ndarray) -> float:
    """Two-sample KS statistic approximated on shared-bin histograms.

    BOTH sides empty → 0.0 (no data, no evidence of drift). Exactly ONE
    side empty → 1.0, the statistic's supremum: an actual histogram gone
    all-zero means the column went all-null or every value migrated
    OUTSIDE the bin range — maximal drift, not maximal stability (the old
    0.0 return let a wholesale out-of-range regression pass the gate)."""
    a = np.asarray(hist_a, dtype=np.float64)
    b = np.asarray(hist_b, dtype=np.float64)
    sa, sb = a.sum(), b.sum()
    if sa == 0 and sb == 0:
        return 0.0
    if sa == 0 or sb == 0:
        return 1.0
    ca = np.cumsum(a) / sa
    cb = np.cumsum(b) / sb
    return float(np.abs(ca - cb).max())


def psi(hist_expected: np.ndarray, hist_actual: np.ndarray, eps: float = 1e-6) -> float:
    """Population Stability Index between binned distributions.

    Same empty-side convention as :func:`ks_statistic`: both empty → 0.0;
    one empty → ``inf`` (an all-zero actual is maximal instability — any
    finite PSI threshold fails, matching the true statistic's limit)."""
    e = np.asarray(hist_expected, dtype=np.float64)
    a = np.asarray(hist_actual, dtype=np.float64)
    se, sa = e.sum(), a.sum()
    if se == 0 and sa == 0:
        return 0.0
    if se == 0 or sa == 0:
        return float("inf")
    pe = np.clip(e / se, eps, None)
    pa_ = np.clip(a / sa, eps, None)
    return float(np.sum((pa_ - pe) * np.log(pa_ / pe)))
