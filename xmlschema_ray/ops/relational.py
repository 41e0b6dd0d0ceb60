"""General relational operators, Ray-Data-first.

These are the engine's reusable physical operators, designed for the
100 TB regime:

* ``broadcast_join`` — the small side is ``ray.put`` ONCE and fetched once
  per actor in ``__init__``, never re-shipped per batch; the large side
  streams through ``map_batches``. No shuffle. This is the keyref
  broadcast-membership shape (``/root/reference/xmlschema/validators/
  identities.py:290-318``) generalized to full joins.
* ``semi_join`` / ``anti_join`` — membership filters against a broadcast
  key set (``pc.is_in``), the enumeration/keyref predicate lifted to joins.
* ``combiner_aggregate`` — partial aggregation inside ``map_batches``
  (one row per key per batch) before the ``groupby`` shuffle, so the
  all-to-all exchange moves ``O(distinct keys × batches)`` rows, not
  ``O(rows)`` — the partial+final Counter shape of
  ``validators/identities.py:198-221``.
* ``topk`` — per-batch partial top-k then a tiny global sort+limit; the
  full dataset is never globally sorted.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _as_pandas(small: Union[pd.DataFrame, pa.Table]) -> pd.DataFrame:
    return small.to_pandas() if isinstance(small, pa.Table) else small


class _BroadcastJoiner:
    """Actor-pool stage: fetch the broadcast side once, merge per batch."""

    def __init__(self, small_ref, left_on, right_on, how, suffix):
        small = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        self.small = _as_pandas(small)
        self.left_on = left_on
        self.right_on = right_on
        self.how = how
        self.suffix = suffix

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.merge(
            self.small,
            how=self.how,
            left_on=self.left_on,
            right_on=self.right_on,
            suffixes=("", self.suffix),
        )
        if self.left_on != self.right_on and self.right_on in out.columns:
            out = out.drop(columns=[self.right_on])
        return out


def broadcast_join(
    ds: rd.Dataset,
    small: Union[pd.DataFrame, pa.Table],
    left_on: str,
    right_on: Optional[str] = None,
    how: str = "inner",
    concurrency: int = 4,
    batch_size: int = 65536,
    suffix: str = "_r",
) -> rd.Dataset:
    """Stream-side ⋈ broadcast-side. ``how`` in {inner, left}."""
    assert how in ("inner", "left")
    right_on = right_on or left_on
    small_ref = ray.put(small)
    return ds.map_batches(
        _BroadcastJoiner,
        fn_constructor_kwargs=dict(
            small_ref=small_ref, left_on=left_on, right_on=right_on, how=how, suffix=suffix
        ),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class _MembershipFilter:
    def __init__(self, keys_ref, column, keep_members):
        keys = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
        self.value_set = keys if isinstance(keys, pa.Array) else pa.array(keys)
        self.column = column
        self.keep = keep_members

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[self.column], value_set=self.value_set)
        if not self.keep:
            mask = pc.and_kleene(
                pc.invert(mask), pc.is_valid(batch[self.column])
            )
        return batch.filter(pc.fill_null(mask, False))


def _key_array(small: Union[pd.DataFrame, pa.Table, Sequence], key: Optional[str]) -> pa.Array:
    if isinstance(small, pa.Table):
        return small[key].combine_chunks().unique()
    if isinstance(small, pd.DataFrame):
        return pa.Array.from_pandas(small[key].drop_duplicates())
    return pa.array(list(small))


def semi_join(
    ds: rd.Dataset,
    small: Union[pd.DataFrame, pa.Table, Sequence],
    on: str,
    key: Optional[str] = None,
    concurrency: int = 4,
) -> rd.Dataset:
    """Keep rows whose ``on`` value exists in the broadcast key set."""
    keys_ref = ray.put(_key_array(small, key or on))
    return ds.map_batches(
        _MembershipFilter,
        fn_constructor_kwargs=dict(keys_ref=keys_ref, column=on, keep_members=True),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def anti_join(
    ds: rd.Dataset,
    small: Union[pd.DataFrame, pa.Table, Sequence],
    on: str,
    key: Optional[str] = None,
    concurrency: int = 4,
) -> rd.Dataset:
    """Keep rows whose ``on`` value does NOT exist in the broadcast key set
    (the find-the-violations direction of the keyref check)."""
    keys_ref = ray.put(_key_array(small, key or on))
    return ds.map_batches(
        _MembershipFilter,
        fn_constructor_kwargs=dict(keys_ref=keys_ref, column=on, keep_members=False),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


# -- combiner-style aggregation ------------------------------------------

_PARTIAL_FUNCS = {"sum": "sum", "min": "min", "max": "max", "count": "count"}


def _make_partial_fn(keys: List[str], aggs: Dict[str, Tuple[Optional[str], str]]):
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        gb = batch.groupby(list(keys), sort=False, dropna=False)
        cols = {}
        for out_name, (col, kind) in aggs.items():
            if kind == "count":
                cols[out_name] = gb.size()
            else:
                cols[out_name] = gb[col].agg(_PARTIAL_FUNCS[kind])
        return pd.DataFrame(cols).reset_index()

    return partial


def combiner_aggregate(
    ds: rd.Dataset,
    keys: Union[str, List[str]],
    aggs: Dict[str, Tuple[Optional[str], str]],
    batch_size: int = 65536,
) -> rd.Dataset:
    """Pre-aggregated grouped aggregate.

    ``aggs``: out_name -> (column, kind) with kind in sum|min|max|count|mean.
    ``mean`` is computed as sum+count partials finalized after the shuffle,
    so every partial is mergeable. The shuffle moves only per-batch partials.
    """
    from ray.data.aggregate import Max, Min, Sum

    keys = [keys] if isinstance(keys, str) else list(keys)
    # expand mean into sum+count partials
    partial_aggs: Dict[str, Tuple[Optional[str], str]] = {}
    finalize_means: Dict[str, Tuple[str, str]] = {}
    for out, (col, kind) in aggs.items():
        if kind == "mean":
            partial_aggs[f"__sum_{out}"] = (col, "sum")
            partial_aggs[f"__cnt_{out}"] = (col, "count")
            finalize_means[out] = (f"__sum_{out}", f"__cnt_{out}")
        else:
            partial_aggs[out] = (col, kind)

    partials = ds.map_batches(
        _make_partial_fn(keys, partial_aggs), batch_format="pandas", batch_size=batch_size
    )
    final_aggs = []
    for out, (col, kind) in partial_aggs.items():
        if kind in ("sum", "count"):
            final_aggs.append(Sum(out, alias_name=out))
        elif kind == "min":
            final_aggs.append(Min(out, alias_name=out))
        elif kind == "max":
            final_aggs.append(Max(out, alias_name=out))
    result = partials.groupby(keys).aggregate(*final_aggs)
    if finalize_means:

        def finalize(batch: pd.DataFrame) -> pd.DataFrame:
            for out, (s, c) in finalize_means.items():
                batch[out] = batch[s] / batch[c]
            drop = [x for pair in finalize_means.values() for x in pair]
            return batch.drop(columns=[d for d in drop if d in batch.columns])

        result = result.map_batches(finalize, batch_format="pandas")
    return result


def topk(
    ds: rd.Dataset,
    sort_col: str,
    k: int,
    descending: bool = True,
    tiebreak: Optional[List[str]] = None,
) -> rd.Dataset:
    """Global top-k without a global sort: per-batch partial top-k, then a
    tiny sort+limit over the surviving ≤ k·#batches rows."""
    by = [sort_col] + (tiebreak or [])
    asc = [not descending] + [True] * len(tiebreak or [])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(by, ascending=asc, kind="mergesort").head(k)

    reduced = ds.map_batches(partial, batch_format="pandas")
    sort_keys = [(c, "descending" if c == sort_col and descending else "ascending") for c in by]
    return reduced.sort(
        [c for c, _ in sort_keys],
        descending=[d == "descending" for _, d in sort_keys],
    ).limit(k)
