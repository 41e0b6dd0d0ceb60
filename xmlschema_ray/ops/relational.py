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

import os
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _as_pandas(small: Union[pd.DataFrame, pa.Table]) -> pd.DataFrame:
    return small.to_pandas() if isinstance(small, pa.Table) else small


def derive_num_partitions(
    input_bytes: Optional[int] = None,
    target_partition_bytes: int = 256 << 20,
    min_partitions: int = 8,
    max_partitions: int = 4096,
) -> int:
    """Shuffle partition count from the CLUSTER size and (when known) the
    input size, instead of a constant that only fits one machine:

    * ~2× cluster CPUs gives every slot work through the tail without
      drowning the scheduler in tiny partitions;
    * floored at ``input_bytes / 256 MiB`` so one partition's rows fit a
      worker heap even when the cluster is small relative to the data;
    * clamped to [min_partitions, max_partitions].
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", 0)) or 8
    except Exception:  # no ray session (unit contexts)
        cpus = 8
    p = max(min_partitions, 2 * cpus)
    if input_bytes:
        p = max(p, -(-int(input_bytes) // target_partition_bytes))
    return min(p, max_partitions)


def broadcast_join(
    ds: rd.Dataset,
    small: Union[pd.DataFrame, pa.Table],
    left_on: str,
    right_on: Optional[str] = None,
    how: str = "inner",
    batch_size: int = 65536,
    suffix: str = "_r",
    max_broadcast_bytes: int = 512 << 20,
) -> rd.Dataset:
    """Stream-side ⋈ broadcast-side. ``how`` in {inner, left}.

    Stateless tasks + a ``ray.put`` broadcast fetched lazily (zero-copy)
    once per task: a FIXED-size actor pool can reserve every CPU of a
    small cluster and starve the upstream read — tasks cannot deadlock.

    The broadcast side is replicated into every worker's heap, so it is
    gated at ``max_broadcast_bytes`` — beyond that the join must shuffle
    (``hash_bucket_join`` / ``Dataset.join``), not broadcast.
    """
    assert how in ("inner", "left")
    nbytes = (
        small.nbytes
        if isinstance(small, pa.Table)
        else int(small.memory_usage(deep=True).sum())
    )
    if nbytes > max_broadcast_bytes:
        raise ValueError(
            f"broadcast_join: build side is {nbytes >> 20} MiB > "
            f"max_broadcast_bytes={max_broadcast_bytes >> 20} MiB; a side this "
            "large must go through hash_bucket_join / Dataset.join instead of "
            "being replicated to every worker"
        )
    right_on = right_on or left_on
    small_ref = ray.put(small)
    state: dict = {}

    def join_fn(batch: pd.DataFrame) -> pd.DataFrame:
        sm = state.get("sm")
        if sm is None:
            sm = _as_pandas(ray.get(small_ref))
            # SQL null semantics: pandas merge pairs NaN keys with NaN
            # keys; no SQL engine does — null build keys never match
            sm = state["sm"] = sm[sm[right_on].notna()]
        lf = batch[batch[left_on].notna()] if how == "inner" else batch
        out = lf.merge(sm, how=how, left_on=left_on, right_on=right_on, suffixes=("", suffix))
        if left_on != right_on and right_on in out.columns:
            out = out.drop(columns=[right_on])
        return out

    return ds.map_batches(join_fn, batch_format="pandas", batch_size=batch_size)


def _membership_filter_fn(keys_ref, column, keep_members):
    state: dict = {}

    def fn(batch: pa.Table) -> pa.Table:
        vs = state.get("vs")
        if vs is None:
            keys = ray.get(keys_ref)
            vs = state["vs"] = keys if isinstance(keys, pa.Array) else pa.array(keys)
        mask = pc.is_in(batch[column], value_set=vs)
        if not keep_members:
            mask = pc.and_kleene(pc.invert(mask), pc.is_valid(batch[column]))
        return batch.filter(pc.fill_null(mask, False))

    return fn


def _key_array(small: Union[pd.DataFrame, pa.Table, Sequence], key: Optional[str]) -> pa.Array:
    """Distinct BROADCAST key set, nulls dropped: SQL membership (IN /
    EXISTS) never matches NULL = NULL, but Arrow's ``is_in`` does when the
    value set carries a null — a null build key would silently KEEP null
    probe rows in ``semi_join`` (and flip results vs the size-gated
    ``semi_join_copartitioned`` fallback, which drops them)."""
    if isinstance(small, pa.Table):
        return small[key].combine_chunks().unique().drop_null()
    if isinstance(small, pd.DataFrame):
        return pa.Array.from_pandas(small[key].dropna().drop_duplicates())
    arr = pa.array(list(small))
    return arr.drop_null()


def semi_join(
    ds: rd.Dataset,
    small: Union[pd.DataFrame, pa.Table, Sequence],
    on: str,
    key: Optional[str] = None,
) -> rd.Dataset:
    """Keep rows whose ``on`` value exists in the broadcast key set."""
    keys_ref = ray.put(_key_array(small, key or on))
    return ds.map_batches(
        _membership_filter_fn(keys_ref, on, True), batch_format="pyarrow", zero_copy_batch=True
    )


def anti_join(
    ds: rd.Dataset,
    small: Union[pd.DataFrame, pa.Table, Sequence],
    on: str,
    key: Optional[str] = None,
) -> rd.Dataset:
    """Keep rows whose ``on`` value does NOT exist in the broadcast key set
    (the find-the-violations direction of the keyref check)."""
    keys_ref = ray.put(_key_array(small, key or on))
    return ds.map_batches(
        _membership_filter_fn(keys_ref, on, False), batch_format="pyarrow", zero_copy_batch=True
    )


def semi_join_copartitioned(
    left: rd.Dataset,
    right_keys: rd.Dataset,
    on: str,
    key: str,
    keep_members: bool = True,
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Distributed semi/anti membership join — the over-the-broadcast-gate
    fallback for :func:`semi_join` / :func:`anti_join` when the build side
    stops being broadcastable (at 100× a TPC-H "dimension" is no longer
    one; the engine's stage B2 is the validation-side analog). The build
    side reduces to per-batch DISTINCT keys on the map side (the exchange
    ships key-space-sized data, never build-fact-sized) and both sides
    co-partition ONCE (:func:`copartition_apply`); each partition filters
    with a vectorized ``isin``. Null semantics match the broadcast pair:
    null probe keys never survive either direction, null build keys drop.
    """

    def distinct_keys(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({key: b[key].dropna().drop_duplicates().to_numpy()})

    rk = right_keys.map_batches(distinct_keys, batch_format="pandas")
    # a corpus-EMPTY build side collapses rk.schema() to None (chaining a
    # second map over fully-empty upstream blocks — the documented Ray
    # pitfall) and copartition_apply would die on .base_schema; the join
    # is also trivially answerable: semi keeps nothing, anti keeps every
    # NON-NULL probe row (null probes never survive either direction)
    rk_schema = rk.schema()
    if rk_schema is None or rk_schema.base_schema is None:

        def no_build(batch: pd.DataFrame) -> pd.DataFrame:
            kept = batch[batch[on].notna()]
            return kept if not keep_members else kept.iloc[:0]

        return left.map_batches(no_build, batch_format="pandas")

    def keep(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        member = lf[on].isin(rf[key]) & lf[on].notna()
        return lf[member if keep_members else (~member & lf[on].notna())]

    return copartition_apply(left, rk, on, key, keep, num_partitions=num_partitions)


def asof_join_broadcast(
    ds: rd.Dataset,
    right: pd.DataFrame,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    batch_size: int = 65536,
) -> rd.Dataset:
    """As-of join (latest right row with ``right_on <= left_on`` per key).

    Custom operator per SURVEY §2.6: Ray Data has no native as-of join.
    The right side is broadcast pre-sorted once; each batch sorts itself
    and runs ``pd.merge_asof`` (sorted-merge within the batch — the
    composition-of-map_batches path; for a large right side, bucket both
    sides by key hash and asof inside ``map_groups`` instead).
    """
    right_sorted = right.sort_values(right_on, kind="mergesort").reset_index(drop=True)
    right_ref = ray.put(right_sorted)
    state: dict = {}

    def asof_fn(batch: pd.DataFrame) -> pd.DataFrame:
        r = state.get("r")
        if r is None:
            r = state["r"] = ray.get(right_ref)
        left_sorted = batch.sort_values(left_on, kind="mergesort")
        return pd.merge_asof(
            left_sorted,
            r,
            left_on=left_on,
            right_on=right_on,
            left_by=left_by,
            right_by=right_by,
            direction="backward",
        )

    return ds.map_batches(asof_fn, batch_format="pandas", batch_size=batch_size)


def stable_key_hash(df: "pd.DataFrame | pd.Series") -> np.ndarray:
    """Partition hash that is DTYPE-STABLE across Ray's pandas conversion:
    a null-bearing batch surfaces an int64 key as float64, and
    ``hash_pandas_object(int64 7) != hash(float64 7.0)`` — one key's rows
    would otherwise land in DIFFERENT partitions, silently breaking the
    co-location guarantee every exchange here relies on (duplicate
    combiner output rows, missed join matches). Integer and bool columns
    hash through their float64 spelling; values past 2^53 can then
    collide, which only CO-LOCATES extra keys — it can never split one.
    """
    if isinstance(df, pd.Series):
        df = df.to_frame()
    cast = {
        c: np.float64
        for c in df.columns
        if df[c].dtype.kind in ("i", "u", "b")
        or (df[c].dtype.kind == "f" and df[c].dtype.itemsize < 8)
    }
    if cast:
        df = df.astype(cast)
    return pd.util.hash_pandas_object(df, index=False).to_numpy()


def copartition_apply(
    left: rd.Dataset,
    right: rd.Dataset,
    left_key: str,
    right_key: str,
    fn,
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Co-partition two Datasets by hash of their key and call
    ``fn(lf, rf) -> pd.DataFrame`` once per partition with the two sides as
    pandas frames (``rf`` keeps its own key column name).

    Shape: each side is padded to one unified Arrow schema (typed nulls for
    the absent side) with a ``__side`` tag, unioned, shuffled ONCE on
    ``hash(key) % P``, and split back inside the partition. All rows of one
    key land in one partition — the co-location guarantee joins and
    merge_asof need. One all-to-all exchange total, versus two for a
    classic repartition-both-sides hash join.
    """
    if num_partitions is None:
        num_partitions = derive_num_partitions()
    # normalize to Arrow blocks so the sampled schema is an Arrow schema
    # even when an upstream pandas map produced pandas blocks (zero-copy)
    if not isinstance(left.schema().base_schema, pa.Schema):
        left = left.map_batches(lambda t: t, batch_format="pyarrow", zero_copy_batch=True)
    if not isinstance(right.schema().base_schema, pa.Schema):
        right = right.map_batches(lambda t: t, batch_format="pyarrow", zero_copy_batch=True)
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    lcols = list(lschema.names)
    rcols_out = [c for c in rschema.names if c != right_key]
    # exempt the key name only when both sides genuinely SHARE it (same
    # join-column name): with distinct key names, a right-side payload
    # column named like left_key would build a duplicate field in the
    # unified schema and die much later in the shuffle
    exempt = {left_key} if right_key == left_key else set()
    overlap = (set(lcols) & set(rschema.names)) - exempt
    if overlap:
        raise ValueError(f"copartition_apply: overlapping non-key columns {sorted(overlap)}")
    key_type = lschema.field(left_key).type
    uni = pa.schema(
        [lschema.field(c) for c in lcols]
        + [pa.field("__side", pa.uint8())]
        + [rschema.field(c) for c in rcols_out]
    )

    def pad_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        arrays = [batch[c] for c in lcols]
        arrays.append(pa.nulls(n, pa.uint8()).fill_null(0))
        arrays.extend(pa.nulls(n, rschema.field(c).type) for c in rcols_out)
        return pa.Table.from_arrays(arrays, schema=uni)

    def pad_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        arrays = []
        for c in lcols:
            if c == left_key:
                arrays.append(pc.cast(batch[right_key], key_type))
            else:
                arrays.append(pa.nulls(n, lschema.field(c).type))
        arrays.append(pa.nulls(n, pa.uint8()).fill_null(1))
        arrays.extend(batch[c] for c in rcols_out)
        return pa.Table.from_arrays(arrays, schema=uni)

    unified = left.map_batches(pad_left, batch_format="pyarrow").union(
        right.map_batches(pad_right, batch_format="pyarrow")
    )

    # Arrow-native partition & split: the padded typed nulls must NOT pass
    # through a whole-table pandas conversion (int64-with-nulls would become
    # float64 and silently lose precision past 2^53) — each side converts to
    # pandas only AFTER its padded columns are dropped.
    def add_part(batch: pa.Table) -> pa.Table:
        h = stable_key_hash(batch[left_key].to_pandas())
        part = (h % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column("__part", pa.array(part))

    empty_l = pa.schema([lschema.field(c) for c in lcols]).empty_table().to_pandas()
    empty_r = (
        pa.schema(
            [pa.field(right_key, rschema.field(right_key).type)]
            + [rschema.field(c) for c in rcols_out]
        )
        .empty_table()
        .to_pandas()
    )
    l_dtypes = dict(empty_l.dtypes)
    r_dtypes = dict(empty_r.dtypes)

    def per_part(g: pa.Table) -> pd.DataFrame:
        side = g["__side"].to_numpy(zero_copy_only=False)
        lmask = side == 0
        lf = g.select(lcols).filter(pa.array(lmask)).to_pandas()
        rt = g.select([left_key] + rcols_out).filter(pa.array(~lmask)).rename_columns(
            [right_key] + rcols_out
        )
        # the shuffle carried this partition as a pandas block, so the
        # padded typed nulls degraded int64 -> float64; the pad rows are
        # filtered out by now, so the declared dtypes are restorable
        return fn(
            _restore_dtypes(lf, l_dtypes), _restore_dtypes(rt.to_pandas(), r_dtypes)
        )

    def per_block(block: pa.Table):
        # empty sort ranges never reach this UDF (Ray skips them; see the
        # schema-less-empty-block note above to_pandas_with_schema)
        parts = block["__part"].to_numpy(zero_copy_only=False)
        for p in np.unique(parts):
            yield per_part(block.filter(pa.array(parts == p)).drop_columns(["__part"]))

    return (
        unified.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .sort("__part")
        .map_batches(per_block, batch_size=None, batch_format="pyarrow")
    )


def hash_bucket_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    how: str = "inner",
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Large-large equi-join via :func:`copartition_apply` — one bounded
    shuffle, one vectorized ``pd.merge`` per partition. The lighter-weight
    alternative to ``Dataset.join`` (no join-actor pool; reuses the
    sort-on-small-int shuffle every other wide op here uses)."""
    assert how in ("inner", "left")

    def merge(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        # SQL null semantics: a NULL key matches NOTHING — pandas merge
        # pairs NaN with NaN (a cross product of the null keys no SQL
        # engine emits). Null build keys always drop; null probe keys drop
        # for inner (they cannot match) and survive unmatched for left.
        # (Filtered here, inside the partition, rather than as an extra
        # dataset map: chaining a map over fully-empty upstream blocks
        # collapses Ray's schema inference to None.)
        rf = rf[rf[right_on].notna()]
        if how == "inner":
            lf = lf[lf[left_on].notna()]
        out = lf.merge(rf, how=how, left_on=left_on, right_on=right_on)
        if left_on != right_on and right_on in out.columns:
            out = out.drop(columns=[right_on])
        return out

    return copartition_apply(left, right, left_on, right_on, merge, num_partitions)


def skew_split_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    how: str = "inner",
    hot_threshold: int = 1_000_000,
    local_topn: int = 64,
    max_hot_build_rows: int = 1 << 20,
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """SKEW-resistant large-large equi-join: hot probe keys are joined
    map-side against a broadcast of their (few) build rows and never enter
    the exchange; only the cold remainder takes the regular
    :func:`hash_bucket_join`. This is the explicit hot-key defense for
    JOINS (the combiner's ``salt=`` is the aggregate-side analog): under a
    zipf probe key a plain hash join ships the hot key's entire row mass
    to ONE partition — the straggler that stalls a 256-node cluster — while
    here that mass stays in place and only ~|hot build rows| bytes move.

    Plan pass (probe side, one pruned single-column scan): each batch
    emits its ``local_topn`` most frequent keys with local counts; the
    driver sums the observed partials and calls a key hot when the sum
    reaches ``hot_threshold``. The observed sum UNDER-counts (a key outside
    some batch's top-N loses that batch's contribution), so classification
    is conservative — and by pigeonhole any key holding a ≥1/local_topn
    share of every batch is always seen. Crucially the hot SET only
    selects the physical plan: the hot/cold split partitions the probe
    rows, each row joins by the same semantics on either path, so the
    output equals the unsplit join for ANY hot set (forced all-hot /
    all-cold / mixed equality tests). The collected candidate channel is
    ≤ local_topn × #batches rows — metadata-sized at any corpus size.

    Hot build rows are collected and broadcast once (``ray.put``), guarded
    by ``max_hot_build_rows`` (raises rather than silently materializing a
    fat build side — a key hot on BOTH sides needs a different plan:
    pre-aggregate or salt-replicate). ``how='left'`` keeps unmatched hot
    probe rows via the same left-merge on both paths. The probe is read
    twice (once per path) — at scale the all-to-all exchange, not the
    pruned columnar re-scan, is the cost this op removes.
    """
    assert how in ("inner", "left")

    def local_top(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[left_on].value_counts()
        top = vc.iloc[:local_topn]
        return pd.DataFrame(
            {"k": top.index.to_numpy(), "n": top.to_numpy(np.int64)}
        )

    cand = to_pandas_with_schema(
        left.select_columns([left_on]).map_batches(local_top, batch_format="pandas")
    )
    if len(cand):
        sums = cand.groupby("k", sort=False)["n"].sum()
        hot = sums[sums >= hot_threshold]
        hot_keys = hot.index.to_numpy()
    else:
        hot_keys = np.array([], dtype=object)
    if len(hot_keys) == 0:
        return hash_bucket_join(left, right, left_on, right_on, how, num_partitions)

    hot_ref = ray.put(hot_keys)

    def build_hot(batch: pd.DataFrame) -> pd.DataFrame:
        hk = ray.get(hot_ref) if isinstance(hot_ref, ray.ObjectRef) else hot_ref
        return batch[batch[right_on].isin(hk)]

    hb = to_pandas_with_schema(
        right.map_batches(build_hot, batch_format="pandas").limit(max_hot_build_rows + 1)
    )
    if len(hb) > max_hot_build_rows:
        raise ValueError(
            f"skew_split_join: hot build side exceeds {max_hot_build_rows} rows — "
            "the key is hot on BOTH sides; pre-aggregate the build side or salt-replicate"
        )
    hb_ref = ray.put(hb)

    def merge_frames(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        out = lf.merge(rf, how=how, left_on=left_on, right_on=right_on)
        if left_on != right_on and right_on in out.columns:
            out = out.drop(columns=[right_on])
        return out

    def probe_hot_join(batch: pd.DataFrame) -> pd.DataFrame:
        hk = ray.get(hot_ref) if isinstance(hot_ref, ray.ObjectRef) else hot_ref
        bf = ray.get(hb_ref) if isinstance(hb_ref, ray.ObjectRef) else hb_ref
        return merge_frames(batch[batch[left_on].isin(hk)], bf)

    def _cold_filter(col: str):
        # pyarrow-format filter: empty Arrow outputs KEEP their schema, so a
        # fully-hot population still leaves the cold join a typed (empty)
        # stream instead of a schema-less one
        def fn(batch: pa.Table) -> pa.Table:
            hk = ray.get(hot_ref) if isinstance(hot_ref, ray.ObjectRef) else hot_ref
            vs = pa.array(hk)
            keep = pc.invert(pc.is_in(batch[col], value_set=vs))
            return batch.filter(pc.fill_null(keep, True))

        return fn

    hot_ds = left.map_batches(probe_hot_join, batch_format="pandas")
    cold_ds = hash_bucket_join(
        left.map_batches(_cold_filter(left_on), batch_format="pyarrow", zero_copy_batch=True),
        right.map_batches(_cold_filter(right_on), batch_format="pyarrow", zero_copy_batch=True),
        left_on,
        right_on,
        how,
        num_partitions,
    )
    return hot_ds.union(cold_ds)


def bloom_prune_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    m_bits: int = 1 << 23,
    n_hashes: int = 7,
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Bloom-pruned large-large INNER equi-join — the shuffle-minimizing
    join plan for a SELECTIVE build side: before the all-to-all exchange,
    probe (``left``) rows are filtered by a broadcast Bloom filter of the
    build (``right``) keys, so rows that cannot match never enter the
    shuffle. When the build side matches ~s of the probe side, the
    exchange shrinks to ~s + FPR of the probe — at a 100-TB probe table
    that is the plan difference, and the filter broadcast is a fixed bit
    array (10 bits/key ≈ 1 % FPR) instead of a multi-GiB key set.

    Exactness is structural, not probabilistic: Bloom false NEGATIVES
    cannot exist, and false positives die in the exact per-partition merge
    of the downstream :func:`hash_bucket_join` — the output equals the
    unpruned join bit-for-bit at ANY filter load (forced ~100 %-fill test).
    Inner-only: pruning discards non-matching probe rows, which a LEFT
    OUTER join must keep.

    The filter builds MERGEABLY (per-batch partial filters over the build
    keys → driver bitwise-OR — a blob-sized channel, one ~m_bits/8 buffer
    per build batch, no shuffle). Size ``m_bits`` to ~10 bits per expected
    distinct build key (``ops.bloom.optimal_bits``); an undersized filter
    only costs pruning power, never correctness."""
    from xmlschema_ray.ops.bloom import BloomFilter

    def bloom_partial(batch: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(m_bits, n_hashes)
        bf.add_many(batch[right_on].to_numpy())
        return pd.DataFrame({"blob": pd.Series([bf.to_bytes()], dtype=object)})

    right = right.materialize()  # feeds the filter build AND the join side
    merged = BloomFilter(m_bits, n_hashes)
    for row in right.map_batches(bloom_partial, batch_format="pandas").iter_rows():
        merged.union(BloomFilter.from_bytes(row["blob"], n_hashes))
    bits_ref = ray.put(merged.to_bytes())
    state: dict = {}

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        f = state.get("f")
        if f is None:
            f = state["f"] = BloomFilter.from_bytes(ray.get(bits_ref), n_hashes)
        return batch[f.contains_many(batch[left_on].to_numpy())]

    pruned = left.map_batches(prune, batch_format="pandas")
    return hash_bucket_join(pruned, right, left_on, right_on, "inner", num_partitions)


def asof_join_bucketed(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Large-large as-of join: co-partition BOTH sides by hash of the `by`
    key, then one vectorized ``pd.merge_asof`` per partition. This is the
    beyond-broadcast path ``asof_join_broadcast`` documents; use it when the
    right side is fact-table-sized.
    """

    def asof(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        return pd.merge_asof(
            lf.sort_values(left_on, kind="mergesort"),
            rf.sort_values(right_on, kind="mergesort"),
            left_on=left_on,
            right_on=right_on,
            left_by=left_by,
            right_by=right_by,
            direction="backward",
        )

    return copartition_apply(left, right, left_by, right_by, asof, num_partitions)


def asof_join(
    ds: rd.Dataset,
    right: Union[rd.Dataset, pd.DataFrame],
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    broadcast_threshold_bytes: int = 256 * 1024 * 1024,
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Adaptive as-of join: broadcast the right side when it fits comfortably
    in worker heap, else co-partitioned ``asof_join_bucketed``."""
    if isinstance(right, pd.DataFrame):
        # deep=True: shallow usage counts 8-byte POINTERS for object/string
        # columns, so a multi-GB string frame would pass the gate and be
        # broadcast into every worker heap
        if right.memory_usage(deep=True).sum() <= broadcast_threshold_bytes:
            return asof_join_broadcast(ds, right, left_on, right_on, left_by, right_by)
        right = rd.from_pandas(right)
    if (right.size_bytes() or 0) <= broadcast_threshold_bytes:
        return asof_join_broadcast(
            ds, right.to_pandas(), left_on, right_on, left_by, right_by
        )
    return asof_join_bucketed(
        ds, right, left_on, right_on, left_by, right_by, num_partitions=num_partitions
    )


# -- hash-partitioned apply ----------------------------------------------


def _restore_dtypes(df: pd.DataFrame, dtypes: Dict[str, "np.dtype"]) -> pd.DataFrame:
    """Best-effort cast back to declared dtypes after a pandas round-trip.

    Ray's sort/shuffle path carries blocks as pandas frames, where typed
    Arrow nulls turn int64 into float64 (values below 2^53 stay exact).
    Columns that still hold NaN (genuine nulls) are left as-is.
    """
    for c, dt in dtypes.items():
        if c in df.columns and df[c].dtype != dt:
            try:
                df[c] = df[c].astype(dt)
            except (ValueError, TypeError):
                pass
    return df


# -- Why empty sort ranges stay schema-less ------------------------------
#
# Ray 2.49's sort-based shuffle emits a schema-less empty pandas block
# (``PandasBlockSchema(names=[])``) for every sample-boundary range that
# received no rows, and the streaming executor logs a schema-divergence
# WARNING for each. This is NOT fixable from user code: Ray's map operators
# deliberately skip the UDF for empty input blocks and pass them through
# verbatim (``ray/data/_internal/planner/plan_udf_map_op.py:451-462``,
# including Ray's own TODO acknowledging that all-to-all operators output
# empty blocks with no schema) — so no ``map_batches`` downstream of the
# sort can ever re-type them. The alternative HASH_SHUFFLE strategy emits
# no empties but pays multi-second aggregator-actor startup per exchange
# (measured 5.5 s vs 1.5 s on a toy input), which would dominate the
# flagship suite. The engineering consequence: the warning is benign by
# construction here, and every CONSUMPTION boundary must tolerate empty
# schema-less blocks — ``to_pandas_with_schema`` below recovers the schema
# for driver collects, parquet writes skip empty blocks, and
# ``tests/test_distributed_paths.py::test_forced_empty_partitions`` proves
# results and dtypes survive a shuffle where most ranges are empty.


def to_pandas_with_schema(ds: rd.Dataset) -> pd.DataFrame:
    """``Dataset.to_pandas`` that keeps columns/dtypes for all-empty results.

    Ray's ``to_pandas`` returns a column-less ``DataFrame()`` whenever the
    dataset has zero rows, even when every block carries a schema — this
    recovers the schema from the executed plan instead.
    """
    df = ds.to_pandas()
    if len(df.columns):
        return df
    try:
        base = ds.schema().base_schema
    except Exception:
        return df
    if base is None:
        return df
    if isinstance(base, pa.Schema):
        return base.empty_table().to_pandas()
    if base.names:
        return pd.DataFrame({n: pd.Series([], dtype=t) for n, t in zip(base.names, base.types)})
    return df


def hash_partition_apply(
    ds: rd.Dataset,
    key_cols: Union[str, List[str]],
    fn,
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Partition rows by ``hash(key) % num_partitions`` and apply ``fn``
    (pandas in/out) once per PARTITION — not per key group.

    Rationale: Ray's native ``groupby().aggregate()`` / per-key
    ``map_groups`` pay Python-per-row / Python-per-group costs that
    collapse at high key cardinality (measured ~875 rows/s on this build).
    Shuffling on a bounded partition column keeps the sort trivial and the
    per-partition work fully vectorized; ``fn`` must do its own
    ``groupby(keys)`` inside the partition. All rows of one key land in
    one partition (hash-partition co-location guarantee).

    Physical plan: ``sort(__part)`` + block-wise map with ``batch_size=None``
    — the same sort-then-whole-block shape ``groupby().map_groups`` lowers
    to (its batch==block note). EMPTY sort ranges pass through as
    schema-less blocks by Ray design (see the note above
    ``to_pandas_with_schema``); consume results through that helper or a
    parquet write, both of which tolerate them.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if num_partitions is None:
        num_partitions = derive_num_partitions()

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        h = stable_key_hash(batch[keys])
        batch = batch.copy(deep=False)
        batch["__part"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return batch

    def per_block(block: pd.DataFrame):
        # empty sort ranges never reach this UDF (Ray skips them; see the
        # schema-less-empty-block note above to_pandas_with_schema) —
        # downstream consumption recovers schema via to_pandas_with_schema
        for _, g in block.groupby("__part", sort=False):
            yield fn(g.drop(columns="__part"))

    return (
        ds.map_batches(add_part, batch_format="pandas")
        .sort("__part")
        .map_batches(per_block, batch_size=None, batch_format="pandas")
    )


def arrow_spine_enabled() -> bool:
    """Round-5 spine selector — ADOPTED DEFAULT as of r5:
    :func:`combiner_aggregate` runs the ARROW-NATIVE partial/merge spine
    (``pa.TableGroupBy`` per batch / per partition — NOT the known
    flat-scaling dataset-level TableGroupBy trap) instead of the pandas
    kernels; set ``XSR_ARROW_SPINE=0`` to fall back. Why: every pandas
    conversion surfaces null-bearing int64 as float64 — the root of the
    dtype-canonicalization bug family rounds 3–4 kept patching; the Arrow
    spine removes the class, not the symptom — and the interleaved A/B at
    sf0.1 measured it 3.6–7.2% FASTER in aggregate (BASELINE.md round-5).
    Equivalence: full 200-query oracle sweep green under the flag, plus
    tests/test_arrow_spine.py (all agg kinds, null keys, nullable
    measures, salt/consolidate paths, >2^53 exactness). Read per call so
    tests can toggle."""
    return os.environ.get("XSR_ARROW_SPINE", "1") == "1"


def hash_partition_apply_arrow(
    ds: rd.Dataset,
    key_cols: Union[str, List[str]],
    fn,
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Arrow-native :func:`hash_partition_apply`: blocks stay ``pa.Table``
    through the exchange (typed nulls survive — no int64→float64 pandas
    degradation) and ``fn(pa.Table) -> pa.Table | pd.DataFrame`` runs once
    per partition. Partition assignment is IDENTICAL to the pandas spine:
    only the key columns round-trip through pandas for hashing, and
    ``stable_key_hash`` canonicalizes that conversion by design."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if num_partitions is None:
        num_partitions = derive_num_partitions()

    def add_part(batch: pa.Table) -> pa.Table:
        h = stable_key_hash(batch.select(keys).to_pandas())
        part = (h % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column("__part", pa.array(part))

    def per_block(block: pa.Table):
        parts = block["__part"].to_numpy(zero_copy_only=False)
        for p in np.unique(parts):
            yield fn(block.filter(pa.array(parts == p)).drop_columns(["__part"]))

    return (
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .sort("__part")
        .map_batches(per_block, batch_size=None, batch_format="pyarrow")
    )


# -- combiner-style aggregation ------------------------------------------

_PARTIAL_FUNCS = {"sum": "sum", "min": "min", "max": "max", "count": "count"}


def _make_partial_fn(keys: List[str], aggs: Dict[str, Tuple[Optional[str], str]]):
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        gb = batch.groupby(list(keys), sort=False, dropna=False)
        cols = {}
        for out_name, (col, kind) in aggs.items():
            if kind == "count":
                # SQL semantics: (None, "count") is COUNT(*); (col, "count")
                # is COUNT(col) — non-null only. gb.size() for a named
                # column would count nulls, and since "mean" expands to
                # sum+count partials it would divide a non-null sum by the
                # total row count (silently wrong for nullable measures).
                cols[out_name] = gb.size() if col is None else gb[col].count()
            elif kind == "sum":
                # SQL semantics: SUM over an ALL-NULL group is NULL, not 0
                # (pandas' default sum invents 0.0) — min_count=1 aligns
                # this spine with SQL, DuckDB and the Arrow spine
                cols[out_name] = gb[col].sum(min_count=1)
            else:
                cols[out_name] = gb[col].agg(_PARTIAL_FUNCS[kind])
        return pd.DataFrame(cols).reset_index()

    return partial


def _arrow_group_agg(
    t: pa.Table, keys: List[str], specs: Dict[str, Tuple[Optional[str], str]]
) -> pa.Table:
    """One vectorized Arrow hash-aggregate over ``t`` (per-BATCH or
    per-PARTITION — never the dataset-level ``TableGroupBy`` that is the
    known flat-scaling trap). ``specs``: out_name -> (col, kind) with kind
    in sum|min|max|count; ``(None, "count")`` is COUNT(*) (``count_all``),
    ``(col, "count")`` is COUNT(col) non-null — the same SQL semantics as
    the pandas partial. Null keys form their own group (dropna=False
    analog). Output columns: keys first, then out_names."""
    collide = set(specs) & set(keys)
    if collide:
        # the pandas spine fails loudly here (reset_index collision); the
        # dict assembly below would silently OVERWRITE the key column with
        # aggregate values instead — refuse identically on both spines
        raise ValueError(
            f"aggregate output name(s) {sorted(collide)} collide with group key(s)"
        )
    agg_list: List[tuple] = []
    produced: Dict[str, str] = {}  # out -> produced column name
    seen: Dict[tuple, str] = {}
    for out, (col, kind) in specs.items():
        sig = (col, kind)
        if sig in seen:
            produced[out] = seen[sig]
            continue
        if kind == "count" and col is None:
            agg_list.append(([], "count_all"))
            name = "count_all"
        else:
            agg_list.append((col, kind))
            name = f"{col}_{kind}"
        produced[out] = seen[sig] = name
    res = t.group_by(keys, use_threads=False).aggregate(agg_list)
    cols = {k: res[k] for k in keys}
    for out, name in produced.items():
        cols[out] = res[name]
    return pa.table(cols)


def combiner_aggregate(
    ds: rd.Dataset,
    keys: Union[str, List[str]],
    aggs: Dict[str, Tuple[Optional[str], str]],
    batch_size: int = 65536,
    num_partitions: Optional[int] = None,
    salt: int = 1,
    consolidate: bool = False,
    arrow: Optional[bool] = None,
) -> rd.Dataset:
    """Pre-aggregated grouped aggregate, fully vectorized end to end.

    ``aggs``: out_name -> (column, kind) with kind in sum|min|max|count|mean.
    Stage 1: per-batch pandas groupby partials (one row per key per batch —
    the skew-safe combiner; a hot key ships #batches rows, not #rows).
    Stage 2: hash-partition the partials on the key and merge each
    partition with ONE vectorized pandas groupby (see
    :func:`hash_partition_apply` for why Ray's native aggregate is avoided).
    ``mean`` is expanded to mergeable sum+count partials and finalized
    after the shuffle.

    Two skew controls, both exact because every merge kind is associative
    (sum/count→sum, min/max idempotent, mean stays in sum+count parts
    until the last step):

    * ``consolidate=True`` — a key-AGNOSTIC combining pass over the
      partial stream (vectorized merge within arbitrary 64k-row blocks,
      no partitioning) before the key shuffle. At 10^12-row scale a
      pathological key present in every batch emits ~10^8 partial rows;
      consolidation collapses them by the blocking factor regardless of
      which key is hot, bounding any key's final-partition rows by the
      number of partial BLOCKS. Costs one streaming pass, no extra
      exchange — the default skew defense for high-cardinality keys.
    * ``salt > 1`` — EXPLICIT SKEW SALTING: stage 2a merges on
      (key, __salt = row % salt) so a hot key splits across ``salt``
      co-located sub-groups; stage 2b re-merges the ≤ salt rows per key.
      Right for LOW/MODERATE key cardinality with extreme skew (the
      second exchange moves ≤ salt × |keys| rows — do NOT use it when
      |keys| is itself fact-sized; use ``consolidate`` there).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    partial_aggs: Dict[str, Tuple[Optional[str], str]] = {}
    finalize_means: Dict[str, Tuple[str, str]] = {}
    for out, (col, kind) in aggs.items():
        if kind == "mean":
            partial_aggs[f"__sum_{out}"] = (col, "sum")
            partial_aggs[f"__cnt_{out}"] = (col, "count")
            finalize_means[out] = (f"__sum_{out}", f"__cnt_{out}")
        else:
            partial_aggs[out] = (col, kind)

    if arrow is None:
        arrow = arrow_spine_enabled()
    if arrow:
        return _combiner_aggregate_arrow(
            ds,
            keys,
            partial_aggs,
            finalize_means,
            batch_size,
            num_partitions,
            salt,
            consolidate,
        )

    partials = ds.map_batches(
        _make_partial_fn(keys, partial_aggs), batch_format="pandas", batch_size=batch_size
    )

    merge_kinds = {
        out: ("sum" if kind in ("sum", "count") else kind) for out, (col, kind) in partial_aggs.items()
    }

    def _merge(g: pd.DataFrame, by: List[str]) -> pd.DataFrame:
        gb = g.groupby(by, sort=False, dropna=False)
        # sum merges use min_count=1 so a NaN partial (all-null source
        # group) survives as NaN unless a non-null partial joins it —
        # count partials are never null, so their sum-merge is unaffected
        return pd.DataFrame(
            {
                o: (gb[o].sum(min_count=1) if k == "sum" else gb[o].agg(k))
                for o, k in merge_kinds.items()
            }
        ).reset_index()

    def _finalize(out: pd.DataFrame) -> pd.DataFrame:
        for o, (s, c) in finalize_means.items():
            out[o] = out[s] / out[c]
        drop = [x for pair in finalize_means.values() for x in pair]
        return out.drop(columns=[d for d in drop if d in out.columns])

    if consolidate:
        partials = partials.map_batches(
            lambda b: _merge(b, keys), batch_format="pandas", batch_size=batch_size
        )

    if salt > 1:

        def add_salt(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy(deep=False)
            batch["__salt"] = np.arange(len(batch), dtype=np.int64) % salt
            return batch

        salted = partials.map_batches(add_salt, batch_format="pandas")
        stage_a = hash_partition_apply(
            salted,
            keys + ["__salt"],
            lambda g: _merge(g, keys + ["__salt"]),
            num_partitions=num_partitions,
        )
        return hash_partition_apply(
            stage_a,
            keys,
            lambda g: _finalize(_merge(g.drop(columns="__salt"), keys)),
            num_partitions=num_partitions,
        )

    def merge_partition(g: pd.DataFrame) -> pd.DataFrame:
        return _finalize(_merge(g, keys))

    return hash_partition_apply(partials, keys, merge_partition, num_partitions=num_partitions)


def _combiner_aggregate_arrow(
    ds: rd.Dataset,
    keys: List[str],
    partial_aggs: Dict[str, Tuple[Optional[str], str]],
    finalize_means: Dict[str, Tuple[str, str]],
    batch_size: int,
    num_partitions: Optional[int],
    salt: int,
    consolidate: bool,
) -> rd.Dataset:
    """ARROW-NATIVE spine of :func:`combiner_aggregate` (the round-5 pilot
    behind ``XSR_ARROW_SPINE``): per-batch ``pa.TableGroupBy`` partials →
    :func:`hash_partition_apply_arrow` → one Arrow hash-aggregate merge
    per partition. Blocks never round-trip through pandas, so nullable
    int64 measures stay typed int64 end to end (no float64 degradation —
    the bug class the pandas spine's canonicalization patches exist for).
    Dtype note vs the pandas spine: a null-BEARING int64 measure sums to
    int64-with-null here (pandas: float64-with-NaN); non-null measures and
    all key dtypes are byte-identical (proven on the oracle suite). An
    ALL-NULL group sums to NULL on BOTH spines (SQL semantics — the
    pandas spine uses min_count=1; its bare .sum() would invent 0). NaN
    (as opposed to null) float values are summed by Arrow but skipped by
    pandas — parquet sources carry null, not NaN, so the suite never sees
    the difference."""
    merge_specs = {
        out: (out, "sum" if kind in ("sum", "count") else kind)
        for out, (col, kind) in partial_aggs.items()
    }

    partials = ds.map_batches(
        lambda b: _arrow_group_agg(b, keys, partial_aggs),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )

    def finalize(t: pa.Table) -> pa.Table:
        if not finalize_means:
            return t
        drop = {x for pair in finalize_means.values() for x in pair}
        cols = {n: t[n] for n in t.column_names if n not in drop}
        for o, (s, c) in finalize_means.items():
            cols[o] = pc.divide(
                pc.cast(t[s], pa.float64()), pc.cast(t[c], pa.float64())
            )
        return pa.table(cols)

    if consolidate:
        partials = partials.map_batches(
            lambda b: _arrow_group_agg(b, keys, merge_specs),
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )

    if salt > 1:

        def add_salt(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__salt", pa.array(np.arange(batch.num_rows, dtype=np.int64) % salt)
            )

        salted = partials.map_batches(
            add_salt, batch_format="pyarrow", zero_copy_batch=True
        )
        stage_a = hash_partition_apply_arrow(
            salted,
            keys + ["__salt"],
            lambda g: _arrow_group_agg(g, keys + ["__salt"], merge_specs),
            num_partitions=num_partitions,
        )
        return hash_partition_apply_arrow(
            stage_a,
            keys,
            lambda g: finalize(
                _arrow_group_agg(g.drop_columns(["__salt"]), keys, merge_specs)
            ),
            num_partitions=num_partitions,
        )

    return hash_partition_apply_arrow(
        partials,
        keys,
        lambda g: finalize(_arrow_group_agg(g, keys, merge_specs)),
        num_partitions=num_partitions,
    )


def range_join_bucketed(
    left: rd.Dataset,
    right: rd.Dataset,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    lo_offset,
    hi_offset,
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Per-key non-equi RANGE (band) join: all pairs with matching keys and
    ``right_time - left_time ∈ [lo_offset, hi_offset)`` — the temporal
    window join Ray Data lacks natively (repeat-purchase detection,
    exposure↔outcome attribution windows).

    Shape: ONE co-partitioning exchange on the key
    (:func:`copartition_apply`), then per key the right times are sorted
    once and every left row locates its matches with two binary searches;
    pair materialization is integer array math (repeat + cumsum offsets) —
    never a per-key cross product, so cost is O(n log n + matches) per
    key. Partitioning assumption: one KEY's rows fit a worker (same as
    every grouped merge here); offsets must be exact-width (timedelta for
    datetimes, numeric for numbers).
    """
    out_r_cols: List[str] = [c for c in right.schema().names if c != right_key]

    def per_part(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.concat(
            [lf.head(0).reset_index(drop=True), rf.head(0)[out_r_cols].reset_index(drop=True)],
            axis=1,
        )
        if not len(lf) or not len(rf):
            return empty
        outs = []
        rg = {k: g for k, g in rf.groupby(right_key, sort=False)}
        for k, lg in lf.groupby(left_key, sort=False):
            rgk = rg.get(k)
            if rgk is None:
                continue
            l_idx, r_idx = _band_pairs(
                lg[left_time].to_numpy(), rgk[right_time].to_numpy(), lo_offset, hi_offset
            )
            if l_idx is None:
                continue
            outs.append(
                pd.concat(
                    [
                        lg.iloc[l_idx].reset_index(drop=True),
                        rgk.iloc[r_idx][out_r_cols].reset_index(drop=True),
                    ],
                    axis=1,
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else empty

    return copartition_apply(
        left, right, left_key, right_key, per_part, num_partitions=num_partitions
    )


def _band_pairs(lt: np.ndarray, rt: np.ndarray, lo_offset, hi_offset):
    """Index pairs (l_idx, r_idx) with ``rt[r_idx] - lt[l_idx] ∈
    [lo_offset, hi_offset)`` — the per-group band-match kernel shared by
    :func:`range_join_bucketed` and :func:`range_self_join` (sort the
    right side once, two binary searches per left row, pair
    materialization as integer array math). Returns ``(None, None)``
    when the band is empty."""
    order = np.argsort(rt, kind="mergesort")
    rts = rt[order]
    lo = np.searchsorted(rts, lt + lo_offset, side="left")
    hi = np.searchsorted(rts, lt + hi_offset, side="left")
    k_i = hi - lo
    total = int(k_i.sum())
    if total == 0:
        return None, None
    l_idx = np.repeat(np.arange(len(lt)), k_i)
    intra = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(k_i)[:-1])), k_i
    )
    return l_idx, order[np.repeat(lo, k_i) + intra]


def range_self_join(
    ds: rd.Dataset,
    key: str,
    time_col: str,
    lo_offset,
    hi_offset,
    rename: Dict[str, str],
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Self variant of :func:`range_join_bucketed`: pairs (a, b) within
    the same key where ``b.time - a.time ∈ [lo_offset, hi_offset)``.

    A self band join through the two-input path would read and exchange
    the fact twice (left + right unioned); here the single input is
    hash-partitioned ONCE and each key group serves as both sides —
    half the read and shuffle volume. ``rename`` maps the b-side columns
    into the output (e.g. ``{"o_orderkey": "prev_orderkey"}``); b-side
    columns not in ``rename`` are dropped.
    """
    b_cols = list(rename)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        clash = set(rename.values()) & set(g.columns)
        if clash:
            raise ValueError(
                f"range_self_join: rename targets {sorted(clash)} collide with "
                "kept a-side columns (the two-input path rejects this too)"
            )
        a_empty = g.head(0).reset_index(drop=True)
        b_empty = g.head(0)[b_cols].rename(columns=rename).reset_index(drop=True)
        empty = pd.concat([a_empty, b_empty], axis=1)
        outs = []
        for _k, gg in g.groupby(key, sort=False):
            t = gg[time_col].to_numpy()
            a_idx, b_idx = _band_pairs(t, t, lo_offset, hi_offset)
            if a_idx is None:
                continue
            outs.append(
                pd.concat(
                    [
                        gg.iloc[a_idx].reset_index(drop=True),
                        gg.iloc[b_idx][b_cols]
                        .rename(columns=rename)
                        .reset_index(drop=True),
                    ],
                    axis=1,
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else empty

    return hash_partition_apply(ds, key, per_part, num_partitions=num_partitions)


def snapshot_diff(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    compare_cols: List[str],
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Set reconciliation between two versions of a keyed table (the
    CDC / snapshot-diff operator): one row per key that was ``added``
    (right only), ``removed`` (left only), or ``changed`` (both sides,
    any ``compare_cols`` value differs). Unchanged keys are dropped.

    Both snapshots stream through ONE co-partitioning exchange on the
    key (:func:`copartition_apply` — union + single shuffle, not two),
    then each partition classifies with one vectorized outer merge.
    Null comparison follows pandas ``!=`` (null vs null counts as
    changed) — pre-fill sentinel values if null-stable semantics are
    needed.
    """
    rename = {c: f"{c}__b" for c in compare_cols}

    def rename_right(t: pa.Table) -> pa.Table:
        return t.rename_columns([rename.get(c, c) for c in t.column_names])

    right = right.map_batches(rename_right, batch_format="pyarrow", zero_copy_batch=True)

    def per_part(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        m = lf.merge(rf, on=key, how="outer", indicator=True)
        flag = m["_merge"].to_numpy()
        changed = np.zeros(len(m), dtype=bool)
        both = flag == "both"
        for c in compare_cols:
            changed |= both & (m[c].to_numpy() != m[f"{c}__b"].to_numpy())
        change = np.where(
            flag == "right_only", "added", np.where(flag == "left_only", "removed", "changed")
        )
        keep = (flag != "both") | changed
        return pd.DataFrame(
            {key: m[key].to_numpy()[keep], "change": change[keep].astype(object)}
        )

    return copartition_apply(left, right, key, key, per_part, num_partitions=num_partitions)


def merge_into(
    base: rd.Dataset,
    changes: rd.Dataset,
    key: str,
    action_col: str = "action",
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """MERGE INTO (the data-lake upsert): apply a keyed change feed to a
    base snapshot — ``delete`` removes the base row, ``upsert`` replaces
    it (or inserts when the key is absent). Complements
    :func:`snapshot_diff` (diff computes the feed, merge applies it).

    Both streams flow through ONE co-partitioning exchange on the key;
    each partition applies the feed with a vectorized ``isin`` anti-mask
    + concat. The feed must carry at most one action per key (the usual
    compacted-CDC contract); payload columns are the non-key, non-action
    columns and must match the base schema.
    """

    # suffix the feed's payload columns so copartition's overlap lint
    # passes; per_part strips the suffix before the concat
    def rename_feed(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [c if c in (key, action_col) else f"{c}__new" for c in t.column_names]
        )

    changes = changes.map_batches(rename_feed, batch_format="pyarrow", zero_copy_batch=True)

    def per_part(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        touched = rf[key].to_numpy()
        keep = lf[~lf[key].isin(touched)]
        ins = rf[rf[action_col].to_numpy() == "upsert"].drop(columns=[action_col])
        ins = ins.rename(columns=lambda c: c[: -len("__new")] if c.endswith("__new") else c)
        return pd.concat([keep, ins[keep.columns]], ignore_index=True)

    return copartition_apply(base, changes, key, key, per_part, num_partitions=num_partitions)


def sample_range_bounds(
    ds: rd.Dataset,
    sort_cols: List[str],
    num_partitions: int,
    sample_stride: int = 512,
    keep_per_partition: int = 64,
) -> Optional[List[np.ndarray]]:
    """Range-partition boundaries from a BOUNDED-driver systematic sample.

    The 1/``sample_stride`` sample stream is collected with a cap; when it
    exceeds the cap (large corpora — a fixed stride alone would ship
    rows/512 to the driver, ~2e9 rows at 10^12 scale) the sample is
    reduced DISTRIBUTEDLY first: hash-spread over ``num_partitions``
    reduce partitions, each keeping ``keep_per_partition`` evenly-spaced
    rows after a local sort, so the driver never sees more than
    ``keep_per_partition × num_partitions`` boundary candidates at any
    corpus size. Boundaries only steer range BALANCE — exactness of
    rank/offset computations built on them never depends on the sample.

    Returns per-column boundary arrays of length ``num_partitions - 1``,
    or None when the corpus is too small to split.
    """

    def systematic_sample(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.iloc[::sample_stride][sort_cols]

    samp_ds = ds.map_batches(systematic_sample, batch_format="pandas")
    cap = max(num_partitions * keep_per_partition, 4096)
    head = samp_ds.limit(cap + 1).to_pandas()
    if len(head) > cap:

        def spread(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy(deep=False)
            h = pd.util.hash_pandas_object(batch[sort_cols], index=False).to_numpy()
            batch["__sp"] = (h % np.uint64(num_partitions)).astype(np.int64)
            return batch

        def shrink(part: pd.DataFrame) -> pd.DataFrame:
            part = part.sort_values(sort_cols)
            if len(part) > keep_per_partition:
                idx = (np.arange(keep_per_partition) * len(part)) // keep_per_partition
                part = part.iloc[idx]
            return part[sort_cols]

        head = to_pandas_with_schema(
            hash_partition_apply(
                samp_ds.map_batches(spread, batch_format="pandas"),
                "__sp",
                shrink,
                num_partitions=num_partitions,
            )
        )
    if not all(c in head.columns for c in sort_cols):
        # fully-empty corpus: Ray's to_pandas drops the schema entirely
        return None
    samp = head.sort_values(sort_cols).reset_index(drop=True)
    if len(samp) >= num_partitions > 1:
        idx = (np.arange(1, num_partitions) * len(samp)) // num_partitions
        return [samp[c].to_numpy()[idx] for c in sort_cols]
    return None


def global_rank(
    ds: rd.Dataset,
    sort_cols: List[str],
    rank_col: str = "rank",
    sample_stride: int = 512,
    num_partitions: Optional[int] = None,
) -> Tuple[rd.Dataset, int]:
    """Exact global 1-based rank over a total order WITHOUT a global sort
    (the SURVEY §2.8 distributed-rank pattern shared by NTILE, percentile
    filters, and deterministic shuffle export).

    ``sort_cols`` must define a total order (include a unique tie-break
    column). Plan: (1) a bounded systematic sample of sort keys picks
    range boundaries (:func:`sample_range_bounds` — driver state
    O(num_partitions) at ANY corpus size); (2) every row gets its range id
    from a vectorized lexicographic compare against the boundaries; (3)
    per-range row COUNTS (a combiner aggregate, one row per range)
    prefix-sum into offsets on the driver — metadata-sized at any corpus
    size; (4) each range sorts locally and emits offset + local rank.
    Returns ``(dataset + rank_col, total_rows)``.
    """
    if num_partitions is None:
        num_partitions = derive_num_partitions()
    bounds = sample_range_bounds(ds, sort_cols, num_partitions, sample_stride)

    def add_pid(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        if bounds is None:
            batch["__rpid"] = np.int64(0)
            return batch
        cols = [batch[c].to_numpy() for c in sort_cols]
        pid = np.zeros(len(batch), dtype=np.int64)
        for b in zip(*bounds):
            # lexicographic boundary <= row, innermost column first
            le = b[-1] <= cols[-1]
            for j in range(len(cols) - 2, -1, -1):
                le = (b[j] < cols[j]) | ((b[j] == cols[j]) & le)
            pid += le
        batch["__rpid"] = pid
        return batch

    with_pid = ds.map_batches(add_pid, batch_format="pandas")
    counts = combiner_aggregate(
        with_pid, keys="__rpid", aggs={"n": (None, "count")}
    ).to_pandas()
    if "__rpid" not in counts.columns:  # fully-empty corpus (schema-less)
        counts = pd.DataFrame(
            {"__rpid": pd.array([], dtype="int64"), "n": pd.array([], dtype="int64")}
        )
    counts = counts.sort_values("__rpid")
    total = int(counts["n"].sum())
    offsets: Dict[int, int] = {}
    run = 0
    for pid, n in zip(counts["__rpid"], counts["n"]):
        offsets[int(pid)] = run
        run += int(n)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for pid, gg in g.groupby("__rpid", sort=False):
            gg = gg.sort_values(sort_cols).drop(columns="__rpid")
            gg[rank_col] = offsets[int(pid)] + np.arange(1, len(gg) + 1, dtype=np.int64)
            outs.append(gg)
        if not outs:
            out0 = g.drop(columns="__rpid")
            out0[rank_col] = pd.Series([], dtype="int64")
            return out0
        return pd.concat(outs, ignore_index=True)

    ranked = hash_partition_apply(
        with_pid, "__rpid", per_part, num_partitions=num_partitions
    )
    return ranked, total


def except_keys(
    ds_a: rd.Dataset,
    ds_b: rd.Dataset,
    key_a: str,
    key_b: str,
    out_name: Optional[str] = None,
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Distributed ``EXCEPT`` (set difference with DISTINCT): the distinct
    ``key_a`` values of ``ds_a`` that never appear as ``key_b`` in ``ds_b``.

    Both sides reduce to per-batch distinct partials inside
    :func:`combiner_aggregate` (one row per key per batch), so the single
    all-to-all exchange ships key-space-sized data, never fact-sized: each
    side is tagged 0/1, unioned, and merged with an associative ``max`` —
    a key survives iff its merged tag is 0 (present in A, absent from B).
    No driver state at any size; skew defenses of the combiner apply.
    """
    out = out_name or key_a

    def tag(key: str, side: int):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {out: batch[key].to_numpy(), "__side": np.int64(side)}
            )

        return fn

    tagged = ds_a.map_batches(tag(key_a, 0), batch_format="pandas").union(
        ds_b.map_batches(tag(key_b, 1), batch_format="pandas")
    )
    agg = combiner_aggregate(
        tagged, out, {"mx": ("__side", "max")}, num_partitions=num_partitions
    )

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.loc[batch["mx"] == 0, [out]]

    return agg.map_batches(keep, batch_format="pandas")


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
