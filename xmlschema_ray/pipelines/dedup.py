"""Deduplication family over the ``documents`` table.

Five dedup operators, each in its Ray-Data-native shape:

* exact — content-hash groupby, keep-first (``groupby(hash).map_groups``);
  oracle-checked against ``GROUP BY text``.
* n-gram Jaccard — exact word-set Jaccard pairs vs a broadcast corpus
  (oracle-checked; corpus side is small by construction — the scale path
  is the MinHash-LSH variant below).
* MinHash + LSH — shingle → 128-perm MinHash → 32-band LSH bucket groupby
  → candidate pairs → exact-Jaccard verify → connected components
  (min-label union-find on the verified pair set).
* SimHash — 64-bit simhash, 4×16-bit band bucketing, Hamming≤k verify.
* embedding cosine — near-dup pairs above a cosine threshold vs broadcast
  normalized matrix (oracle-checked).

The exact variant is the distributed form of the reference's exact
identity-constraint machinery (``validators/identities.py:198-221``);
the near-dup family has no reference analog (north-rule mandate).
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from xmlschema_ray.engine.stats import hash64
from xmlschema_ray.functions import hashing as H
from xmlschema_ray.ops.sample import seeded_embedding_sample
from xmlschema_ray.pipelines.common import (
    dataset_or_typed_empty,
    oracle_dump as _oracle_dump,
    table_path,
)

_WS = re.compile(r"\s+")


# Adaptive-plan switch for the dedup family (same pattern as the engine's
# ValidationEngine.driver_threshold_bytes and the relational queries'
# DISTRIBUTED_THRESHOLD_BYTES): below this on-disk corpus size the finalize
# runs driver-side on BOUNDED collections (hash partials / candidate-scoped
# rows, never the whole corpus); above it every stage is a Ray shuffle.
# Forced-path tests prove both plans byte-identical.
DEDUP_DISTRIBUTED_THRESHOLD_BYTES = 256 << 20


def exact_dedup(
    sf_dir: str, distributed_threshold_bytes: "int | None" = None
) -> pd.DataFrame:
    """One row per distinct text: (keep_id = min doc_id, n = multiplicity).

    Two-phase hash-keyed shape (the engine's stage-B uniqueness pattern,
    ``engine.py``): phase 1 groups on ``hash64(text)`` so the corpus-wide
    exchange ships 8-byte ints — per-batch partials collapse each distinct
    hash to ONE ``(h, min_id, n)`` row (a text duplicated across half the
    corpus ships #batches rows, not #rows). Hashes seen more than once are
    duplicates OR collisions, so phase 2 rescans ONLY those rows and groups
    them by the actual text — collisions can only create false candidates,
    never wrong output. Below the size threshold both merges run
    driver-side on the (result-sized) partials; above it they are hash
    shuffles.
    """
    from xmlschema_ray.ops.relational import (
        hash_partition_apply,
        semi_join,
        to_pandas_with_schema,
    )

    if distributed_threshold_bytes is None:
        distributed_threshold_bytes = DEDUP_DISTRIBUTED_THRESHOLD_BYTES
    distributed = (
        os.path.getsize(table_path(sf_dir, "documents")) > distributed_threshold_bytes
    )
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def hash_partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {"h": hash64(batch["text"].to_numpy()), "doc_id": batch["doc_id"]}
        )
        gb = df.groupby("h", sort=False)["doc_id"]
        return pd.DataFrame({"min_id": gb.min(), "n": gb.size().astype("int64")}).reset_index()

    def merge_h(part: pd.DataFrame) -> pd.DataFrame:
        gb = part.groupby("h", sort=False)
        return pd.DataFrame(
            {"keep_id": gb["min_id"].min(), "n": gb["n"].sum().astype("int64")}
        ).reset_index()

    def exact_groups(part: pd.DataFrame) -> pd.DataFrame:
        gb = part.groupby("text", sort=False)["doc_id"]
        return pd.DataFrame(
            {"keep_id": gb.min(), "n": gb.size().astype("int64")}
        ).reset_index(drop=True)

    def add_h(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch["h"] = hash64(batch["text"].to_numpy())
        return batch

    partials = ds.map_batches(hash_partial, batch_format="pandas")

    if not distributed:
        # driver finalize: the partials stream is result-sized (one row per
        # distinct hash per batch) — merge with one vectorized groupby
        hc = merge_h(partials.to_pandas())
        uniq = hc.loc[hc["n"] == 1, ["keep_id", "n"]]
        dup_h = hc.loc[hc["n"] > 1, "h"]
        if len(dup_h):
            cand = semi_join(
                ds.map_batches(add_h, batch_format="pandas"), dup_h.to_numpy(), on="h"
            ).to_pandas()  # dup-candidate rows only, never the whole corpus
            out = pd.concat([uniq, exact_groups(cand)], ignore_index=True)
        else:
            out = uniq
    else:
        # fully distributed: the result stays a Dataset — unique-hash rows
        # unioned with the exact dup groups, canonical sort in Ray, no
        # fact-sized (or result-sized) driver collect
        hcounts = hash_partition_apply(partials, "h", merge_h).materialize()
        uniq_ds = hcounts.filter(expr="n == 1").select_columns(["keep_id", "n"])
        dup_h = to_pandas_with_schema(hcounts.filter(expr="n > 1").select_columns(["h"]))["h"]
        if len(dup_h):
            cand = semi_join(
                ds.map_batches(add_h, batch_format="pandas"), dup_h.to_numpy(), on="h"
            )
            dups_ds = hash_partition_apply(cand, "text", exact_groups)
            out_ds = uniq_ds.union(dups_ds)
        else:
            out_ds = uniq_ds
        return out_ds.sort("keep_id")
    return out.sort_values("keep_id").reset_index(drop=True)[["keep_id", "n"]]


EXACT_DEDUP_SQL = """
SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n FROM documents GROUP BY text ORDER BY keep_id
"""


def _word_sets(sf_dir: str) -> Tuple[np.ndarray, List[np.ndarray]]:
    """doc_ids + per-doc sorted-unique word-hash sets, computed in Ray."""
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        sets = [
            np.unique(hash64(np.array(_WS.split(t.strip()), dtype=object)))
            for t in batch["text"]
        ]
        return pd.DataFrame({"doc_id": batch["doc_id"], "wset": [s.tobytes() for s in sets]})

    rows = ds.map_batches(fn, batch_format="pandas").to_pandas()
    ids = rows["doc_id"].to_numpy()
    sets = [np.frombuffer(b, dtype=np.uint64) for b in rows["wset"]]
    order = np.argsort(ids)
    return ids[order], [sets[i] for i in order]


def ngram_jaccard_pairs(
    sf_dir: str, threshold: float = 0.9, max_corpus_bytes: int = 64 << 20
):
    """Exact word-set Jaccard near-dup pairs (a < b, jac >= threshold).

    Corpus word-sets broadcast once (``ray.put``); stateless tasks compare
    each batch's docs against every corpus doc with a greater doc_id.

    This is the EXACT all-pairs oracle shape — O(n²) comparisons against a
    whole-corpus broadcast — so it refuses corpora beyond
    ``max_corpus_bytes``; the scale path for near-dup pairs is
    :func:`minhash_lsh_dedup` (bucketed candidates, no all-pairs)."""
    corpus_bytes = os.path.getsize(table_path(sf_dir, "documents"))
    if corpus_bytes > max_corpus_bytes:
        raise ValueError(
            f"ngram_jaccard_pairs is an exact all-pairs baseline; corpus is "
            f"{corpus_bytes >> 20} MiB > max_corpus_bytes={max_corpus_bytes >> 20} MiB. "
            f"Use minhash_lsh_dedup for large corpora."
        )
    corpus_ref = ray.put(_word_sets(sf_dir))
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])
    state: dict = {}

    def pairs_fn(batch: pd.DataFrame) -> pd.DataFrame:
        corpus = state.get("c")
        if corpus is None:
            corpus = state["c"] = ray.get(corpus_ref)
        ids, sets = corpus
        out_a, out_b, out_j = [], [], []
        for did, text in zip(batch["doc_id"], batch["text"]):
            ws = np.unique(hash64(np.array(_WS.split(text.strip()), dtype=object)))
            start = np.searchsorted(ids, did, side="right")
            for j in range(start, len(ids)):
                jac = H.jaccard(ws, sets[j])
                if jac >= threshold:
                    out_a.append(did)
                    out_b.append(int(ids[j]))
                    out_j.append(jac)
        return pd.DataFrame(
            {
                "doc_id_a": pd.array(out_a, dtype="int64"),
                "doc_id_b": pd.array(out_b, dtype="int64"),
                "jac": pd.array(out_j, dtype="float64"),
            }
        )

    return ds.map_batches(pairs_fn, batch_format="pandas")


def prefix_jaccard_pairs(
    sf_dir: str,
    tau_num: int = 1,
    tau_den: int = 2,
    shingle_words: int = 3,
    distributed_threshold_bytes: "int | None" = None,
    max_bucket: int = 4096,
) -> pd.DataFrame:
    """EXACT shingle-set Jaccard self-join at scale via PREFIX FILTERING
    (AllPairs/PPJoin, Bayardo et al. WWW 2007; Chaudhuri et al. ICDE 2006)
    — every pair with Jaccard >= tau_num/tau_den over distinct
    ``shingle_words``-word shingle sets, found WITHOUT the all-pairs
    comparison :func:`ngram_jaccard_pairs` is size-gated on and without
    MinHash's probabilistic recall: the EXACT counterpart of
    :func:`minhash_lsh_dedup` on the same shingle universe and threshold.
    The guarantee: order the shingle vocabulary globally (rarest-first, by
    (df, shingle) — any total order is sound, rarity minimizes
    candidates); a set of n tokens keeps only its first
    ``n - ceil(tau*n) + 1`` tokens as its PREFIX; two sets with overlap
    >= o share their globally-smallest common token inside BOTH prefixes
    (it precedes >= o-1 common tokens in each), and J >= tau forces
    o >= ceil(tau*max(n_a, n_b)) — so bucketing by prefix tokens provably
    misses nothing. The DuckDB oracle recomputes the pair set with NO
    prefix predicate (unnest self-join on ANY shared shingle — complete
    since J >= tau > 0 implies at least one), proving the blocking loses
    nothing; the in-bucket PPJoin length filter (tau*max(n) <= min(n))
    and the final Jaccard cut are pure-integer predicates, so both
    engines agree exactly.

    The set universe is SHINGLES, not words, by measurement: this corpus
    has a 31-word vocabulary, and word-level blocking degenerates when
    every token is a stopword (2.1M candidates for 191k true pairs, every
    prefix bucket thousands deep). Shingles restore the rare-token premise
    prefix filtering is built on — candidate count collapses to
    near-dup-pair order. ``shingle_words=1`` recovers word-set semantics
    for vocabularies where words ARE discriminative.

    Physical plan (no size gate — this IS the exact scale path): one
    tokenize pass -> shingle df combiner (vocab-sized exchange) ->
    prefix rows through ONE token-keyed exchange (per doc only the prefix
    ships, biased to RARE shingles so buckets stay small; ``max_bucket``
    guards pathological boilerplate prefixes) -> pair-keyed dedup exchange
    (candidate-sized) -> exact verify on candidate-scoped shingle lists
    (vectorized factorize + pair-keyed sort + adjacent-dup bincount — no
    per-pair Python). Rank attachment and verify are adaptive
    driver/distributed at ``distributed_threshold_bytes`` (default
    ``DEDUP_DISTRIBUTED_THRESHOLD_BYTES``) — below it the shingle df map
    is broadcast and the verify runs on candidate-scoped rows driver-side;
    above it df attaches by a bucketed join + doc-keyed regroup and the
    verify is the double hash-bucket-join shape of
    :func:`minhash_verified_pairs`. Forced-path test proves both
    identical. True shingle strings flow end-to-end (no hashing), so
    "exact" holds with no collision caveat. Docs with fewer than
    ``shingle_words`` words have an empty set and no Jaccard (J undefined
    on empty sets) — excluded on both engines."""
    from xmlschema_ray.ops.relational import (
        combiner_aggregate,
        hash_bucket_join,
        hash_partition_apply,
        semi_join,
        to_pandas_with_schema,
    )

    if distributed_threshold_bytes is None:
        distributed_threshold_bytes = DEDUP_DISTRIBUTED_THRESHOLD_BYTES
    distributed = (
        os.path.getsize(table_path(sf_dir, "documents")) > distributed_threshold_bytes
    )
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def _shingle_set(t: str) -> np.ndarray:
        """Sorted-unique ``shingle_words``-word shingles of one doc (object
        array of space-joined strings; empty if the doc is too short)."""
        ws = [w for w in _WS.split(t.strip()) if w]
        k = shingle_words
        if len(ws) < k:
            return np.array([], dtype=object)
        if k == 1:
            return np.unique(np.array(ws, dtype=object))
        return np.unique(
            np.array([" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)], dtype=object)
        )

    def flat_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids: List[np.ndarray] = []
        words: List[np.ndarray] = []
        for did, t in zip(batch["doc_id"], batch["text"]):
            u = _shingle_set(t)
            if len(u):
                ids.append(np.full(len(u), did, dtype=np.int64))
                words.append(u)
        if not ids:
            return pd.DataFrame(
                {"doc_id": pd.array([], dtype="int64"), "word": pd.Series([], dtype=object)}
            )
        return pd.DataFrame(
            {"doc_id": np.concatenate(ids), "word": np.concatenate(words)}
        )

    flat = ds.map_batches(flat_rows, batch_format="pandas")
    df_ds = combiner_aggregate(flat, "word", {"df": (None, "count")})

    def _prefix_len(n: np.ndarray) -> np.ndarray:
        # n - ceil(tau*n) + 1, all-integer (ceil(a/b) = -((-a)//b))
        return n - (-((-tau_num * n) // tau_den)) + 1

    if not distributed:
        df_pdf = to_pandas_with_schema(df_ds)
        df_ref = ray.put(
            pd.Series(df_pdf["df"].to_numpy(np.int64), index=df_pdf["word"].to_numpy(object))
        )
        state: dict = {}

        def prefix_rows(batch: pd.DataFrame) -> pd.DataFrame:
            dfm = state.get("dfm")
            if dfm is None:
                dfm = state["dfm"] = ray.get(df_ref)
            out_w, out_d, out_n, out_p = [], [], [], []
            for did, t in zip(batch["doc_id"], batch["text"]):
                u = _shingle_set(t)
                n = len(u)
                if n == 0:
                    continue
                d = dfm.reindex(u).to_numpy(np.int64)
                order = np.lexsort((u, d))
                L = int(_prefix_len(np.int64(n)))
                pick = order[:L]
                out_w.append(u[pick])
                out_d.append(np.full(len(pick), did, dtype=np.int64))
                out_n.append(np.full(len(pick), n, dtype=np.int64))
                out_p.append(np.arange(len(pick), dtype=np.int64))
            if not out_w:
                return pd.DataFrame(
                    {
                        "word": pd.Series([], dtype=object),
                        "doc_id": pd.array([], dtype="int64"),
                        "n": pd.array([], dtype="int64"),
                        "pos": pd.array([], dtype="int64"),
                    }
                )
            return pd.DataFrame(
                {
                    "word": np.concatenate(out_w),
                    "doc_id": np.concatenate(out_d),
                    "n": np.concatenate(out_n),
                    "pos": np.concatenate(out_p),
                }
            )

        prefix_ds = ds.map_batches(prefix_rows, batch_format="pandas")
    else:
        j = hash_bucket_join(flat, df_ds, "word", "word")

        def prefix_part(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["doc_id", "df", "word"], kind="mergesort")
            n = g.groupby("doc_id")["word"].transform("size").to_numpy(np.int64)
            pos = g.groupby("doc_id").cumcount().to_numpy(np.int64)
            keep = pos < _prefix_len(n)
            return pd.DataFrame(
                {
                    "word": g["word"].to_numpy(object)[keep],
                    "doc_id": g["doc_id"].to_numpy(np.int64)[keep],
                    "n": n[keep],
                    "pos": pos[keep],
                }
            )

        prefix_ds = hash_partition_apply(j, "doc_id", prefix_part)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One call per hash PARTITION: candidate pairs for every token
        bucket via the shared repeat/cumsum pair-index kernel — pure
        integer arithmetic over the whole partition, no per-bucket Python
        loop (a shingle vocabulary means HUNDREDS OF THOUSANDS of tiny
        buckets per partition; looping them was the measured wall)."""
        from xmlschema_ray.pipelines.relational import _within_group_pair_indices

        empty = pd.DataFrame(
            {"a": pd.array([], dtype="int64"), "b": pd.array([], dtype="int64")}
        )
        if not len(g):
            return empty
        codes, _ = pd.factorize(g["word"].to_numpy(object))
        order = np.lexsort((g["doc_id"].to_numpy(np.int64), codes))
        codes = codes[order]
        ids = g["doc_id"].to_numpy(np.int64)[order]
        ns = g["n"].to_numpy(np.int64)[order]
        ps = g["pos"].to_numpy(np.int64)[order]
        try:
            ia, ib = _within_group_pair_indices(codes, max_group=max_bucket)
        except ValueError as e:
            raise ValueError(
                f"{e} — a prefix token this hot means tau is too low for "
                "exact joining on this corpus; raise max_bucket or use "
                "minhash_lsh_dedup"
            ) from e
        if not len(ia):
            return empty
        na, nb = ns[ia], ns[ib]
        # PPJoin length filter: J >= tau forces tau*max(n) <= min(n)
        keep = tau_num * np.maximum(na, nb) <= tau_den * np.minimum(na, nb)
        # PPJoin POSITIONAL filter: J >= tau forces overlap o >=
        # tau/(1+tau)*(n_a+n_b); the smallest common token's occurrence has
        # >= o-1 common tokens after it in BOTH sets, so its candidate row
        # satisfies 1 + min(n_a-p_a-1, n_b-p_b-1) >= o. Occurrences failing
        # the bound are safely dropped — the guarantee occurrence of every
        # qualifying pair always passes, and the pair-dedup exchange keeps
        # a pair if ANY of its occurrences survived.
        ubound = 1 + np.minimum(na - ps[ia] - 1, nb - ps[ib] - 1)
        keep &= ubound * (tau_num + tau_den) >= tau_num * (na + nb)
        return pd.DataFrame({"a": ids[ia][keep], "b": ids[ib][keep]}).drop_duplicates()

    cand = hash_partition_apply(
        hash_partition_apply(prefix_ds, "word", bucket_pairs),
        ["a", "b"],
        lambda p: p.drop_duplicates(),
    )

    def wl_rows(batch: pd.DataFrame) -> pd.DataFrame:
        # sorted-unique shingle list serialized newline-joined (shingles
        # are space-joined \S+ runs, so '\n' can never occur inside one) —
        # a plain string column survives the pandas/Arrow boundary of the
        # bucketed joins, where a column of list cells does not
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "wl": ["\n".join(_shingle_set(t).tolist()) for t in batch["text"]],
            }
        )

    def _decode_wl(s: str) -> np.ndarray:
        return np.array(s.split("\n"), dtype=object) if s else np.array([], dtype=object)

    def _repeat_by(values: np.ndarray, counts: np.ndarray) -> np.ndarray:
        """``np.repeat(values, counts)`` as two cumsum passes — on this
        box vector-count ``np.repeat`` measures ~9 s for 16M int64 (tiny
        per-element memcpys), and it was THE verify wall. Write each
        segment's delta at its start position and prefix-sum."""
        total = int(counts.sum())
        if total == 0:
            return np.zeros(0, dtype=np.int64)
        nz = counts > 0
        starts = (np.cumsum(counts) - counts)[nz]
        vals = values[nz].astype(np.int64)
        out = np.zeros(total, dtype=np.int64)
        out[starts[0]] = vals[0]
        if len(starts) > 1:
            out[starts[1:]] = vals[1:] - vals[:-1]
        return np.cumsum(out)

    def _code_pool(wl_strings, doc_ids):
        """Decode serialized shingle lists and factorize the WHOLE stream
        to int codes ONCE (pd.factorize — hash-based, exact). Returns a
        FLAT code pool + per-doc (start, len) — per-pair verify work then
        stays pure int64 gathers from one contiguous buffer (factorizing
        strings per candidate pair, and even materializing one small array
        per pair, were the measured verify walls)."""
        arrs = [_decode_wl(s) for s in wl_strings]
        lens = np.fromiter(map(len, arrs), np.int64, len(arrs))
        if lens.sum() == 0:
            pool = np.array([], dtype=np.int64)
            V = np.int64(1)
        else:
            codes, uniques = pd.factorize(np.concatenate(arrs))
            pool = codes.astype(np.int64)
            V = np.int64(len(uniques) + 1)
        starts = np.cumsum(lens) - lens
        ids = np.asarray(doc_ids, dtype=np.int64)
        order = np.argsort(ids, kind="mergesort")
        return pool, starts, lens, V, ids[order], order

    def _rows_for(ids_sorted: np.ndarray, perm: np.ndarray, wanted) -> np.ndarray:
        return perm[np.searchsorted(ids_sorted, np.asarray(wanted, dtype=np.int64))]

    def _common_counts(pool, starts, lens, V, ra, rb) -> np.ndarray:
        """Vectorized |a_i ∩ b_i| over pool rows ``ra``/``rb`` per pair —
        no per-pair Python, no per-pair arrays. Key every token by
        pair_index*V + code (gathered straight from the pool), sort, and
        count adjacent equals per pair: within a pair each side's codes
        are unique (sets), so every duplicate is one cross-side match.
        Chunked so the key array stays bounded."""
        n = len(ra)
        out = np.empty(n, dtype=np.int64)
        chunk = 500_000
        for lo in range(0, n, chunk):
            rasub, rbsub = ra[lo : lo + chunk], rb[lo : lo + chunk]
            m = len(rasub)
            la, lb = lens[rasub], lens[rbsub]
            tot_a, tot_b = int(la.sum()), int(lb.sum())
            if tot_a + tot_b == 0:
                out[lo : lo + chunk] = 0
                continue
            pair_sub = np.arange(m, dtype=np.int64)
            ga = np.arange(tot_a, dtype=np.int64) + _repeat_by(
                starts[rasub] - (np.cumsum(la) - la), la
            )
            gb = np.arange(tot_b, dtype=np.int64) + _repeat_by(
                starts[rbsub] - (np.cumsum(lb) - lb), lb
            )
            keys = np.concatenate(
                [_repeat_by(pair_sub, la), _repeat_by(pair_sub, lb)]
            ) * V + np.concatenate([pool[ga], pool[gb]])
            keys.sort(kind="quicksort")
            dup = keys[1:] == keys[:-1]
            out[lo : lo + chunk] = np.bincount((keys[1:][dup] // V), minlength=m)
        return out

    empty = pd.DataFrame(
        {
            "doc_id_a": pd.array([], dtype="int64"),
            "doc_id_b": pd.array([], dtype="int64"),
            "n_common": pd.array([], dtype="int64"),
            "n_a": pd.array([], dtype="int64"),
            "n_b": pd.array([], dtype="int64"),
            "jac": pd.array([], dtype="float64"),
        }
    )

    def _finish(pdf: pd.DataFrame) -> pd.DataFrame:
        keep = tau_den * pdf["n_common"] >= tau_num * (
            pdf["n_a"] + pdf["n_b"] - pdf["n_common"]
        )
        out = pdf[keep].copy()
        out["jac"] = out["n_common"].to_numpy(np.float64) / (
            out["n_a"] + out["n_b"] - out["n_common"]
        ).to_numpy(np.float64)
        return (
            out.sort_values(["doc_id_a", "doc_id_b"])
            .reset_index(drop=True)
            .astype(
                {c: "int64" for c in ("doc_id_a", "doc_id_b", "n_common", "n_a", "n_b")}
            )
        )

    if not distributed:
        cand_pdf = to_pandas_with_schema(cand)
        if cand_pdf.empty:
            return empty
        cand_ids = pd.unique(pd.concat([cand_pdf["a"], cand_pdf["b"]]))
        srows = semi_join(
            ds.map_batches(wl_rows, batch_format="pandas"), cand_ids, on="doc_id"
        ).to_pandas()
        pool, starts, lens, V, ids_sorted, perm = _code_pool(
            srows["wl"], srows["doc_id"]
        )
        ra = _rows_for(ids_sorted, perm, cand_pdf["a"])
        rb = _rows_for(ids_sorted, perm, cand_pdf["b"])
        pdf = pd.DataFrame(
            {
                "doc_id_a": cand_pdf["a"].to_numpy(np.int64),
                "doc_id_b": cand_pdf["b"].to_numpy(np.int64),
                "n_common": _common_counts(pool, starts, lens, V, ra, rb),
                "n_a": lens[ra],
                "n_b": lens[rb],
            }
        )
        return _finish(pdf)

    cand = cand.materialize()
    cand_ids_pdf = to_pandas_with_schema(cand)
    if cand_ids_pdf.empty:
        return empty
    cand_ids = pd.unique(pd.concat([cand_ids_pdf["a"], cand_ids_pdf["b"]]))
    swl = semi_join(
        ds.map_batches(wl_rows, batch_format="pandas"), cand_ids, on="doc_id"
    ).materialize()
    wl_a = swl.map_batches(
        lambda t: t.rename_columns(["doc_id", "wl_a"]), batch_format="pyarrow"
    )
    wl_b = swl.map_batches(
        lambda t: t.rename_columns(["doc_id", "wl_b"]), batch_format="pyarrow"
    )
    jj = hash_bucket_join(
        hash_bucket_join(cand, wl_a, "a", "doc_id"), wl_b, "b", "doc_id"
    )

    def count_common(batch: pd.DataFrame) -> pd.DataFrame:
        # one factorize per BATCH (parallel across workers), then the same
        # flat-pool int-code kernel the driver path uses: rows 0..n-1 hold
        # the a-sides, rows n..2n-1 the b-sides
        n = len(batch)
        arrs = [_decode_wl(x) for x in batch["wl_a"]] + [
            _decode_wl(y) for y in batch["wl_b"]
        ]
        lens = np.fromiter(map(len, arrs), np.int64, len(arrs))
        if lens.sum():
            codes, uniques = pd.factorize(np.concatenate(arrs))
            pool = codes.astype(np.int64)
            V = np.int64(len(uniques) + 1)
        else:
            pool = np.array([], dtype=np.int64)
            V = np.int64(1)
        starts = np.cumsum(lens) - lens
        ra = np.arange(n, dtype=np.int64)
        rb = ra + n
        return pd.DataFrame(
            {
                "doc_id_a": batch["a"].to_numpy(np.int64),
                "doc_id_b": batch["b"].to_numpy(np.int64),
                "n_common": _common_counts(pool, starts, lens, V, ra, rb),
                "n_a": lens[ra],
                "n_b": lens[rb],
            }
        )

    pdf = jj.map_batches(count_common, batch_format="pandas").to_pandas()
    if pdf.empty:
        return empty
    return _finish(pdf)


PREFIX_JACCARD_SQL = """
WITH ws AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, length(w) - 1),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS wl
  FROM ws
), l AS (
  SELECT doc_id, CAST(length(wl) AS BIGINT) AS n FROM s WHERE length(wl) > 0
), u AS (
  SELECT doc_id, unnest(wl) AS g FROM s
), i AS (
  SELECT x.doc_id AS a, y.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS c
  FROM u x JOIN u y USING (g) WHERE x.doc_id < y.doc_id GROUP BY 1, 2
)
SELECT i.a AS doc_id_a, i.b AS doc_id_b, i.c AS n_common, la.n AS n_a, lb.n AS n_b,
       CAST(i.c AS DOUBLE) / (la.n + lb.n - i.c) AS jac
FROM i JOIN l la ON i.a = la.doc_id JOIN l lb ON i.b = lb.doc_id
WHERE 2 * i.c >= 1 * (la.n + lb.n - i.c)
ORDER BY doc_id_a, doc_id_b
"""


NGRAM_JACCARD_SQL = """
WITH w AS (
  SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS wl FROM documents
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(length(list_intersect(a.wl, b.wl)) AS DOUBLE)
         / (length(a.wl) + length(b.wl) - length(list_intersect(a.wl, b.wl))) AS jac
FROM w a, w b
WHERE a.doc_id < b.doc_id
  AND CAST(length(list_intersect(a.wl, b.wl)) AS DOUBLE)
        / (length(a.wl) + length(b.wl) - length(list_intersect(a.wl, b.wl))) >= 0.9
"""


# -- MinHash + LSH --------------------------------------------------------


def _label_stream(docs_ds: "rd.Dataset", roots: Dict[int, int]) -> "rd.Dataset":
    """Label every doc with its cluster root, streaming: the (small,
    pair-touched-only) root map is broadcast once and applied per batch
    with a sorted-key lookup; docs absent from the map label themselves.
    Returns the canonical (doc_id, cluster_root) Dataset sorted in Ray."""
    keys = np.fromiter(roots.keys(), dtype=np.int64, count=len(roots))
    vals = np.fromiter(roots.values(), dtype=np.int64, count=len(roots))
    order = np.argsort(keys)
    map_ref = ray.put((keys[order], vals[order]))
    state: dict = {}

    def lab(t: pa.Table) -> pa.Table:
        kv = state.get("kv")
        if kv is None:
            kv = state["kv"] = ray.get(map_ref)
        k, v = kv
        ids = pc.cast(t["doc_id"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        if len(k):
            pos = np.clip(np.searchsorted(k, ids), 0, len(k) - 1)
            hit = k[pos] == ids
            out = np.where(hit, v[pos], ids)
        else:
            out = ids
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "cluster_root": pa.array(out, type=pa.int64()),
            }
        )

    return docs_ds.map_batches(lab, batch_format="pyarrow", zero_copy_batch=True).sort("doc_id")


def _cc_finalize(
    edges: "rd.Dataset",
    n_pairs: int,
    n_nodes: int,
    docs_ds: "rd.Dataset",
    cc_pairs_threshold: int,
    cc_broadcast_nodes_threshold: int,
) -> "rd.Dataset":
    """Shared three-tier connected-components finalize for the dedup
    clustering family: pair-scoped driver union-find + broadcast label map
    for small pair sets → broadcast min-label propagation → Dataset-join
    label propagation beyond broadcast node counts. ``edges`` has int64
    ``a``/``b``; ``docs_ds`` carries a ``doc_id`` column. Every tier
    returns the (doc_id, cluster_root) labels as a DATASET sorted in Ray —
    no per-doc driver collect on any tier. Forced-path tests prove all
    three tiers identical."""
    from xmlschema_ray.ops.graph import (
        connected_components_distributed,
        connected_components_joined,
        union_find,
    )

    if n_pairs <= cc_pairs_threshold:
        # PAIR-sized collect only: union-find over the nodes touched by
        # some edge, then label the doc STREAM against the broadcast root
        # map (untouched docs default to self) — no node-set collect, so
        # a 10^12-doc corpus with a handful of dup pairs stays streaming.
        verified = list(edges.select_columns(["a", "b"]).to_pandas().itertuples(index=False, name=None))
        touched = sorted({x for p in verified for x in p})
        return _label_stream(docs_ds, union_find(touched, verified))
    if n_nodes <= cc_broadcast_nodes_threshold:
        nodes = np.sort(
            docs_ds.select_columns(["doc_id"]).to_pandas()["doc_id"].to_numpy(dtype=np.int64)
        )
        cc = connected_components_distributed(edges, nodes)
        out = cc.rename(columns={"node": "doc_id", "root": "cluster_root"}).sort_values("doc_id")
        return rd.from_pandas(out.reset_index(drop=True).astype("int64"))
    # beyond-broadcast finalize: labels STAY a Dataset end to end
    nodes_ds = docs_ds.map_batches(
        lambda t: pa.table({"node": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cc_ds = connected_components_joined(edges, nodes_ds)

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["node"], pa.int64()),
                "cluster_root": pc.cast(t["root"], pa.int64()),
            }
        )

    return cc_ds.map_batches(shape, batch_format="pyarrow", zero_copy_batch=True).sort("doc_id")


def minhash_verified_pairs(
    sf_dir: str,
    shingle_n: int = 3,
    n_perm: int = 128,
    n_bands: int = 32,
    threshold: float = 0.5,
    distributed_threshold_bytes: "int | None" = None,
    oracle_dump: bool = True,
) -> "Tuple[rd.Dataset, rd.Dataset, int]":
    """Signatures → LSH candidates → exact-Jaccard verify; returns the
    verified near-dup EDGE Dataset (int64 ``a``/``b``, a < b) plus the doc
    stream and its node count — the shared front half of the MinHash
    family, consumed by :func:`minhash_lsh_dedup` (clustering) and
    :func:`cross_source_dup_matrix` (provenance analytics).

    Adaptive verify: above the corpus-size threshold the verify is fully
    DISTRIBUTED — shingle sets are semi-joined to candidate docs and
    hash-bucket-joined to the (deduped) pair set twice (pairs-by-a, then
    pairs-by-b). Below it the verify collects the CANDIDATE-SCOPED shingle
    rows (never the corpus) and loops the pairs driver-side; the edge set
    returns as a (pair-sized) Dataset either way. Forced-path tests prove
    the plans identical.
    """
    a, b = H.minhash_params(n_perm)
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def band_rows(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack(
            [H.minhash_signature(H.shingle_hashes(t, shingle_n), a, b) for t in batch["text"]]
        )
        bands = H.band_hash_matrix(sigs, n_bands)  # (n, n_bands)
        return pd.DataFrame(
            {
                "band_hash": bands.reshape(-1),
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), n_bands),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One call per hash PARTITION: enumerate pairs bucket by bucket
        (buckets are tiny; the partition loop is over buckets, not rows)."""
        outs_a, outs_b = [], []
        for _, ids in g.groupby("band_hash", sort=False)["doc_id"]:
            u = np.unique(ids.to_numpy())
            if len(u) >= 2:
                ia, ib = np.triu_indices(len(u), k=1)
                outs_a.append(u[ia])
                outs_b.append(u[ib])
        if not outs_a:
            return pd.DataFrame({"a": pd.array([], dtype="int64"), "b": pd.array([], dtype="int64")})
        return pd.DataFrame(
            {"a": np.concatenate(outs_a), "b": np.concatenate(outs_b)}
        ).drop_duplicates()

    from xmlschema_ray.ops.relational import (
        hash_bucket_join,
        hash_partition_apply,
        semi_join,
    )

    if distributed_threshold_bytes is None:
        distributed_threshold_bytes = DEDUP_DISTRIBUTED_THRESHOLD_BYTES
    distributed = (
        os.path.getsize(table_path(sf_dir, "documents")) > distributed_threshold_bytes
    )

    brows = ds.map_batches(band_rows, batch_format="pandas")
    # (band_hash, doc_id) rows let the DuckDB oracle re-derive candidate
    # pairs, re-verify with TRUE shingle-string Jaccard, and re-cluster
    # with a recursive CTE (MINHASH_SQL) — everything downstream of the
    # signatures is cross-checked
    _oracle_dump(brows, "minhash_bands", oracle_dump)
    cand = hash_partition_apply(brows, "band_hash", bucket_pairs)

    # node COUNT only (metadata-cheap) — tier selection never collects the
    # node set; labels are produced by streaming the doc ids through the
    # broadcast root map (_label_stream) or the distributed CC tiers
    n_nodes = ds.count()

    def shingle_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "sh": [H.shingle_hashes(t, shingle_n).tobytes() for t in batch["text"]],
            }
        )

    _empty_edges = pd.DataFrame(
        {"a": pd.array([], dtype="int64"), "b": pd.array([], dtype="int64")}
    )
    if not distributed:
        # driver verify over CANDIDATE-SCOPED rows: pairs + only the
        # shingle sets of docs that appear in some pair (never the corpus)
        cand_pdf = cand.to_pandas().drop_duplicates()
        if cand_pdf.empty:
            return rd.from_pandas(_empty_edges), ds, n_nodes
        cand_ids = pd.unique(pd.concat([cand_pdf["a"], cand_pdf["b"]]))
        srows = semi_join(
            ds.map_batches(shingle_rows, batch_format="pandas"), cand_ids, on="doc_id"
        ).to_pandas()
        sets = {
            int(d): np.frombuffer(bts, dtype=np.uint64)
            for d, bts in zip(srows["doc_id"], srows["sh"])
        }
        verified = [
            (int(x), int(y))
            for x, y in zip(cand_pdf["a"], cand_pdf["b"])
            if H.jaccard(sets[int(x)], sets[int(y)]) >= threshold
        ]
        edf = (
            pd.DataFrame(verified, columns=["a", "b"]).astype("int64")
            if verified
            else _empty_edges
        )
        return rd.from_pandas(edf), ds, n_nodes

    # distributed verify: dedup the pair set with one pair-keyed shuffle
    # (pair-sized, not corpus-sized), semi-join shingles to candidate docs,
    # and hash-bucket-join them to the pairs by each side
    cand = hash_partition_apply(cand, ["a", "b"], lambda p: p.drop_duplicates()).materialize()
    cand_pdf_ids = cand.select_columns(["a", "b"]).to_pandas()
    if not len(cand_pdf_ids.columns) or not len(cand_pdf_ids):
        # no candidates (a fully-empty pipeline also collapses the schema,
        # so guard on columns too): honor the (edges, docs, n_nodes)
        # contract — a bare label Dataset here crashed every
        # 3-tuple-unpacking caller
        return rd.from_pandas(_empty_edges), ds, n_nodes
    cand_ids = pd.unique(pd.concat([cand_pdf_ids["a"], cand_pdf_ids["b"]]))

    scand = semi_join(
        ds.map_batches(shingle_rows, batch_format="pandas"), cand_ids, on="doc_id"
    ).materialize()  # feeds both join sides; candidate-doc-sized
    sh_a = scand.map_batches(
        lambda t: t.rename_columns(["doc_id", "sh_a"]), batch_format="pyarrow"
    )
    sh_b = scand.map_batches(
        lambda t: t.rename_columns(["doc_id", "sh_b"]), batch_format="pyarrow"
    )
    j = hash_bucket_join(
        hash_bucket_join(cand, sh_a, "a", "doc_id"), sh_b, "b", "doc_id"
    )

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        keep_a, keep_b = [], []
        for x, y, sa, sb in zip(batch["a"], batch["b"], batch["sh_a"], batch["sh_b"]):
            if (
                H.jaccard(np.frombuffer(sa, dtype=np.uint64), np.frombuffer(sb, dtype=np.uint64))
                >= threshold
            ):
                keep_a.append(x)
                keep_b.append(y)
        return pd.DataFrame(
            {"a": pd.array(keep_a, dtype="int64"), "b": pd.array(keep_b, dtype="int64")}
        )

    edges = j.map_batches(verify, batch_format="pandas").materialize()
    return edges, ds, n_nodes


def minhash_lsh_dedup(
    sf_dir: str,
    shingle_n: int = 3,
    n_perm: int = 128,
    n_bands: int = 32,
    threshold: float = 0.5,
    cc_pairs_threshold: int = 100_000,
    cc_broadcast_nodes_threshold: int = 20_000_000,
    distributed_threshold_bytes: "int | None" = None,
    oracle_dump: bool = True,
) -> "rd.Dataset":
    """MinHash-LSH near-dup clusters: a (doc_id, cluster_root) Dataset,
    canonically sorted in Ray (no per-doc driver collect).

    Pipeline (the standard MinHash-LSH shape, SURVEY §2.9): per-batch
    signatures → explode (band_hash, doc_id) → bucket groupby (the
    corpus-wide shuffle) → candidate pairs → exact-Jaccard verify
    (:func:`minhash_verified_pairs`, adaptive driver/distributed) →
    connected components (three proven-identical tiers, from driver
    union-find below ``cc_pairs_threshold`` verified pairs up to
    Dataset-join label propagation past ``cc_broadcast_nodes_threshold``
    nodes).
    """
    edges, ds, n_nodes = minhash_verified_pairs(
        sf_dir,
        shingle_n=shingle_n,
        n_perm=n_perm,
        n_bands=n_bands,
        threshold=threshold,
        distributed_threshold_bytes=distributed_threshold_bytes,
        oracle_dump=oracle_dump,
    )
    return _cc_finalize(
        edges, edges.count(), n_nodes, ds, cc_pairs_threshold, cc_broadcast_nodes_threshold
    )


def cross_source_dup_matrix(
    sf_dir: str, broadcast_pairs_threshold: int = 2_000_000
) -> "rd.Dataset | pd.DataFrame":
    """Cross-source near-duplication matrix — provenance analytics over the
    verified MinHash pair set: how many near-dup pairs SPAN each (source,
    source) combination (unordered, lexicographic canonical order). The
    diagnostic behind source-level dedup decisions: a heavy off-diagonal
    cell means two crawls mirror each other and one side can be dropped
    wholesale before per-doc dedup.

    Adaptive plan on the pair count (the edge set is pair-sized by
    construction): below ``broadcast_pairs_threshold`` the edge-touched id
    set (≤ 2·pairs) semi-join-prunes the streamed ``(doc_id, source)``
    projection and the matrix is a driver groupby over pair-bounded rows —
    ZERO exchanges beyond the clustering itself. Above it, each endpoint
    joins the source projection with a bucketed exchange (pair-sized left)
    and a ≤ |sources|²-key combiner reduces. Forced-path test proves the
    plans identical.
    """
    from xmlschema_ray.ops.relational import (
        combiner_aggregate,
        hash_bucket_join,
        semi_join,
    )
    from xmlschema_ray.pipelines.common import sorted_or_typed_empty

    edges, _, _ = minhash_verified_pairs(sf_dir)
    n_pairs = edges.count()
    src = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "source"])
    template = pd.DataFrame(
        {
            "source_a": pd.Series([], dtype=object),
            "source_b": pd.Series([], dtype=object),
            "n_pairs": pd.Series([], dtype="int64"),
        }
    )

    if n_pairs <= broadcast_pairs_threshold:
        e = edges.to_pandas()
        if e.empty:
            return template
        ids = pd.unique(pd.concat([e["a"], e["b"]]))
        sm = semi_join(src, ids, on="doc_id").to_pandas()
        mp = dict(zip(sm["doc_id"], sm["source"]))
        sa = e["a"].map(mp).to_numpy(dtype=object)
        sb = e["b"].map(mp).to_numpy(dtype=object)
        swap = sa > sb
        out = (
            pd.DataFrame(
                {"source_a": np.where(swap, sb, sa), "source_b": np.where(swap, sa, sb)}
            )
            .groupby(["source_a", "source_b"])
            .size()
            .rename("n_pairs")
            .reset_index()
            .sort_values(["source_a", "source_b"])
            .reset_index(drop=True)
        )
        out["n_pairs"] = out["n_pairs"].astype("int64")
        return out

    src_a = src.map_batches(
        lambda t: t.select(["doc_id", "source"]).rename_columns(["doc_id", "__src_a"]),
        batch_format="pyarrow",
    )
    src_b = src.map_batches(
        lambda t: t.select(["doc_id", "source"]).rename_columns(["doc_id", "__src_b"]),
        batch_format="pyarrow",
    )
    j = hash_bucket_join(hash_bucket_join(edges, src_a, "a", "doc_id"), src_b, "b", "doc_id")

    def canonical(b: pd.DataFrame) -> pd.DataFrame:
        sa = b["__src_a"].to_numpy(dtype=object)
        sb = b["__src_b"].to_numpy(dtype=object)
        swap = sa > sb
        lo, hi = np.where(swap, sb, sa), np.where(swap, sa, sb)
        return pd.DataFrame(
            {
                "source_a": pd.Series(lo, dtype=object),
                "source_b": pd.Series(hi, dtype=object),
            }
        )

    pairs = j.map_batches(canonical, batch_format="pandas")
    counts = combiner_aggregate(pairs, ["source_a", "source_b"], {"n_pairs": (None, "count")})
    return sorted_or_typed_empty(counts, ["source_a", "source_b"], template=template)




# DuckDB cross-check of everything downstream of the MinHash signatures:
# candidate pairs re-derived from the dumped (band_hash, doc_id) rows,
# verified with TRUE word-3-gram shingle Jaccard computed from the raw
# text (the Ray side verifies over hashed shingles — identical modulo a
# 2^-64 hash collision), and clustered with a recursive transitive-closure
# CTE whose min reachable id equals the min-label/union-find root.
# Shared CTE prefix: recomputes the verified near-dup clusters from the
# dumped band rows + raw text, ending in a `clusters` CTE — reused by the
# split/keep-best consumers below so their oracles re-derive the SAME
# clustering end-to-end rather than trusting the Ray labels.
_MINHASH_CC_CTE = r"""
WITH RECURSIVE docs AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents
), sh AS (
  SELECT doc_id,
    list_distinct(CASE
      WHEN length(ws) >= 3 THEN list_transform(generate_series(1, length(ws) - 2),
                                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      ELSE [array_to_string(ws, ' ')]
    END) AS grams
  FROM docs
), bands AS (
  SELECT band_hash, doc_id FROM read_parquet('/tmp/xmlschema_ray_oracle/minhash_bands/*.parquet')
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y ON x.band_hash = y.band_hash AND x.doc_id < y.doc_id
), verified AS (
  SELECT c.a, c.b
  FROM cand c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
  WHERE CAST(length(list_intersect(sa.grams, sb.grams)) AS DOUBLE)
        / (length(sa.grams) + length(sb.grams) - length(list_intersect(sa.grams, sb.grams)))
        >= 0.5
), edges AS (
  SELECT a AS s, b AS t FROM verified UNION ALL SELECT b AS s, a AS t FROM verified
), r(n, m) AS (
  SELECT doc_id, doc_id FROM docs
  UNION
  SELECT r.n, e.t FROM r JOIN edges e ON e.s = r.m
), clusters AS (
  SELECT n AS doc_id, CAST(MIN(m) AS BIGINT) AS cluster_root
  FROM r GROUP BY n
)
"""

MINHASH_SQL = _MINHASH_CC_CTE + "SELECT doc_id, cluster_root FROM clusters ORDER BY doc_id\n"


def leakage_safe_split(sf_dir: str) -> "rd.Dataset":
    """Cluster-coherent train/val/test assignment — the eval-leakage guard
    a pretraining pipeline runs when carving held-out data: a plain
    per-document hash split puts near-duplicates of training docs into the
    eval set, silently inflating benchmark scores. Here the split decision
    is a deterministic hash of the near-dup CLUSTER root, so every member
    of a cluster lands in the SAME split by construction (md5 first hex
    digit: c-d → val, e-f → test, else train ⇒ a 12/2/2 ratio in
    expectation).

    Scale shape: one streaming map over the (doc_id, cluster_root) label
    Dataset :func:`minhash_lsh_dedup` already produces distributedly — the
    split adds NO exchange beyond the clustering itself.
    """
    from xmlschema_ray.pipelines.curation import _md5_hex

    labels = minhash_lsh_dedup(sf_dir)

    def add_split(t: pa.Table) -> pa.Table:
        roots = t["cluster_root"].to_numpy(zero_copy_only=False)
        first = np.array([h[0] for h in _md5_hex(roots)])
        split = np.where(first >= "e", "test", np.where(first >= "c", "val", "train"))
        return t.append_column("split", pa.array(list(split), type=pa.string()))

    # map_batches preserves block order, so the labels' canonical doc_id
    # sort survives
    return labels.map_batches(add_split, batch_format="pyarrow", zero_copy_batch=True)


LEAKAGE_SPLIT_SQL = _MINHASH_CC_CTE + """
SELECT doc_id, cluster_root,
  CASE WHEN substring(md5(CAST(cluster_root AS VARCHAR)), 1, 1) BETWEEN 'c' AND 'd' THEN 'val'
       WHEN substring(md5(CAST(cluster_root AS VARCHAR)), 1, 1) >= 'e' THEN 'test'
       ELSE 'train' END AS split
FROM clusters ORDER BY doc_id
"""


def dedup_keep_best(sf_dir: str) -> "rd.Dataset":
    """Quality-aware canonical-representative selection per near-dup
    cluster (the production alternative to keep-lowest-id: near-dup groups
    keep their LONGEST member — ``n_chars`` as the quality proxy — tie
    broken by lowest doc_id). One row per multi-member cluster:
    ``(cluster_root, keep_doc_id, keep_n_chars, n_members)``.

    Scale shape: the labels Dataset joins the pruned ``(doc_id, n_chars)``
    projection with ONE bucketed exchange; the argmax-per-cluster then
    follows the ``first_order_per_customer`` combiner pattern — a per-batch
    pre-reduce (one candidate row + member count per cluster per batch,
    best-of and count both associative) before a single hash-partitioned
    merge, so the reduce exchange ships cluster-cardinality partials,
    never the corpus.
    """
    return keep_best_from_labels(minhash_lsh_dedup(sf_dir), sf_dir)


def keep_best_from_labels(labels: "rd.Dataset", sf_dir: str) -> "rd.Dataset":
    """:func:`dedup_keep_best` over a PRECOMPUTED (doc_id, cluster_root)
    label Dataset — composed pipelines cluster once and reuse the labels."""
    from xmlschema_ray.ops.relational import hash_bucket_join

    docs = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    return keep_best_from_joined(hash_bucket_join(labels, docs, "doc_id", "doc_id"))


def keep_best_from_joined(joined: "rd.Dataset") -> "rd.Dataset":
    """Argmax-per-cluster over any stream carrying ``cluster_root``,
    ``doc_id``, ``n_chars`` — composed pipelines that already paid a
    labels×features join reuse it instead of joining the corpus twice."""
    from xmlschema_ray.ops.relational import hash_partition_apply
    from xmlschema_ray.pipelines.common import sorted_or_typed_empty

    cols = ["cluster_root", "keep_doc_id", "keep_n_chars", "n_members"]

    def best_partial(b: pd.DataFrame) -> pd.DataFrame:
        # the stream may carry extra feature columns — the partial ships
        # only the three the reduce needs
        b = b[["cluster_root", "doc_id", "n_chars"]].sort_values(
            ["cluster_root", "n_chars", "doc_id"], ascending=[True, False, True]
        )
        g = b.groupby("cluster_root", sort=False)
        first = g.head(1).rename(columns={"doc_id": "keep_doc_id", "n_chars": "keep_n_chars"})
        cnt = g.size().rename("n_members").reset_index()
        return first.merge(cnt, on="cluster_root")[cols].reset_index(drop=True)

    def best_merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(
            ["cluster_root", "keep_n_chars", "keep_doc_id"], ascending=[True, False, True]
        )
        first = s.groupby("cluster_root", sort=False).head(1).drop(columns="n_members")
        cnt = g.groupby("cluster_root", sort=False)["n_members"].sum().reset_index()
        out = first.merge(cnt, on="cluster_root")
        return out[out["n_members"] >= 2][cols].reset_index(drop=True)

    partials = joined.map_batches(best_partial, batch_format="pandas")
    red = hash_partition_apply(partials, "cluster_root", best_merge)
    template = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    return sorted_or_typed_empty(red, ["cluster_root"], template=template)


# the `verified` CTE inside the prefix IS the oracle's edge set; the
# unreferenced recursive-closure CTEs cost nothing (DuckDB materializes
# only reachable CTEs)
CROSS_SOURCE_DUP_SQL = _MINHASH_CC_CTE + """
, src AS (SELECT doc_id, source FROM documents)
SELECT LEAST(sa.source, sb.source) AS source_a,
       GREATEST(sa.source, sb.source) AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM verified v JOIN src sa ON sa.doc_id = v.a JOIN src sb ON sb.doc_id = v.b
GROUP BY 1, 2 ORDER BY 1, 2
"""


DEDUP_KEEP_BEST_SQL = _MINHASH_CC_CTE + """
, j AS (
  SELECT c.cluster_root, d.doc_id, d.n_chars
  FROM clusters c JOIN documents d USING (doc_id)
), ranked AS (
  SELECT cluster_root, doc_id, n_chars,
         row_number() OVER (PARTITION BY cluster_root ORDER BY n_chars DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY cluster_root) AS n_members
  FROM j
)
SELECT cluster_root, doc_id AS keep_doc_id, CAST(n_chars AS BIGINT) AS keep_n_chars,
       CAST(n_members AS BIGINT) AS n_members
FROM ranked WHERE rn = 1 AND n_members >= 2 ORDER BY cluster_root
"""


# -- SimHash --------------------------------------------------------------


def simhash_pairs(sf_dir: str, max_hamming: int = 8, oracle_dump: bool = True) -> pd.DataFrame:
    """SimHash near-dup pairs (a < b, hamming <= k), fully distributed:
    explode each doc to 4 (16-bit-band, doc_id, simhash) rows, hash-
    partition on the band key (the only shuffle), and verify Hamming
    vectorized INSIDE the bucket — each bucket row carries its simhash, so
    no join and no driver materialization. Any pair within Hamming 3 of 64
    bits shares ≥1 of 4 bands (pigeonhole); wider distances best-effort.

    Oracle: the per-doc signatures are dumped to parquet and the DuckDB
    SQL recomputes banding + XOR-popcount from them (SIMHASH_SQL) — the
    bucketing/verify logic is fully cross-checked; the signature
    construction itself is implementation-defined (like MinHash).
    """
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def sim_band_rows(batch: pd.DataFrame) -> pd.DataFrame:
        hs = []
        for t in batch["text"]:
            words = np.array(_WS.split(t.strip()), dtype=object)
            hs.append(H.simhash64(hash64(words)))
        sh = np.array(hs, dtype=np.uint64)
        ids = batch["doc_id"].to_numpy()
        frames = []
        for bi in range(4):
            band_val = ((sh >> np.uint64(16 * bi)) & np.uint64(0xFFFF)).astype(np.int64)
            frames.append(
                pd.DataFrame(
                    {
                        "band_key": band_val + (bi << 16),  # fold band index in
                        "doc_id": ids,
                        "simhash": sh,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    rows = ds.map_batches(sim_band_rows, batch_format="pandas").materialize()

    def bucket_verify(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in part.groupby("band_key", sort=False):
            if len(g) < 2:
                continue
            order = np.argsort(g["doc_id"].to_numpy())
            ids = g["doc_id"].to_numpy()[order]
            sh = g["simhash"].to_numpy()[order]
            ia, ib = np.triu_indices(len(ids), k=1)
            d = H.hamming64(sh[ia], sh[ib])  # elementwise XOR popcount
            keep = d <= max_hamming
            if keep.any():
                outs.append(
                    pd.DataFrame(
                        {
                            "doc_id_a": ids[ia][keep],
                            "doc_id_b": ids[ib][keep],
                            "hamming": d[keep],
                        }
                    )
                )
        if not outs:
            return pd.DataFrame(
                {
                    "doc_id_a": pd.array([], dtype="int64"),
                    "doc_id_b": pd.array([], dtype="int64"),
                    "hamming": pd.array([], dtype="int64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    from xmlschema_ray.ops.relational import hash_partition_apply

    pairs = hash_partition_apply(rows, "band_key", bucket_verify).to_pandas()
    # a pair matching several bands surfaces once per band — result-sized dedup
    pairs = (
        pairs.drop_duplicates(["doc_id_a", "doc_id_b"])
        .sort_values(["doc_id_a", "doc_id_b"])
        .reset_index(drop=True)
        .astype({"doc_id_a": "int64", "doc_id_b": "int64", "hamming": "int64"})
    )

    _oracle_dump(
        rows.filter(expr="band_key < 65536").select_columns(["doc_id", "simhash"]),
        "simhash",
        oracle_dump,
    )
    return pairs


# DuckDB cross-check of banding + Hamming verify from the dumped signatures
# (written by simhash_pairs as it runs; band b of h is (h >> 16b) & 0xFFFF)
SIMHASH_SQL = """
WITH s AS (
  SELECT doc_id, simhash
  FROM read_parquet('/tmp/xmlschema_ray_oracle/simhash/*.parquet')
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
  AND ( (a.simhash & 65535) = (b.simhash & 65535)
     OR ((a.simhash >> 16) & 65535) = ((b.simhash >> 16) & 65535)
     OR ((a.simhash >> 32) & 65535) = ((b.simhash >> 32) & 65535)
     OR ((a.simhash >> 48) & 65535) = ((b.simhash >> 48) & 65535) )
ORDER BY doc_id_a, doc_id_b
"""


def simhash_clusters(
    sf_dir: str,
    max_hamming: int = 8,
    cc_pairs_threshold: int = 100_000,
    cc_broadcast_nodes_threshold: int = 20_000_000,
    oracle_dump: bool = True,
) -> "rd.Dataset":
    """SimHash near-dup CLUSTERS: the bucketed pair pipeline composed with
    the same three-tier connected-components finalize minhash uses
    (pair-scoped union-find + broadcast label map → broadcast min-label →
    Dataset-join label propagation); returns the (doc_id, cluster_root)
    Dataset sorted in Ray. Oracle: transitive closure over the
    SQL-re-derived verified pairs (recursive CTE on the dumped
    signatures)."""
    pairs = simhash_pairs(sf_dir, max_hamming=max_hamming, oracle_dump=oracle_dump)
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id"])
    edges = rd.from_pandas(
        pairs.rename(columns={"doc_id_a": "a", "doc_id_b": "b"})[["a", "b"]].astype("int64")
    )
    return _cc_finalize(
        edges, len(pairs), ds.count(), ds, cc_pairs_threshold, cc_broadcast_nodes_threshold
    )


SIMHASH_CLUSTERS_SQL = """
WITH RECURSIVE s AS (
  SELECT doc_id, simhash
  FROM read_parquet('/tmp/xmlschema_ray_oracle/simhash/*.parquet')
), verified AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
    AND ( (a.simhash & 65535) = (b.simhash & 65535)
       OR ((a.simhash >> 16) & 65535) = ((b.simhash >> 16) & 65535)
       OR ((a.simhash >> 32) & 65535) = ((b.simhash >> 32) & 65535)
       OR ((a.simhash >> 48) & 65535) = ((b.simhash >> 48) & 65535) )
), edges AS (
  SELECT a AS s, b AS t FROM verified UNION ALL SELECT b AS s, a AS t FROM verified
), r(n, m) AS (
  SELECT doc_id, doc_id FROM s
  UNION
  SELECT r.n, e.t FROM r JOIN edges e ON e.s = r.m
)
SELECT n AS doc_id, CAST(MIN(m) AS BIGINT) AS cluster_root
FROM r GROUP BY n ORDER BY doc_id
"""


# -- embedding cosine near-dup -------------------------------------------


def embedding_dup_pairs(
    sf_dir: str, threshold: float = 0.5, max_corpus_bytes: int = 256 << 20
):
    """Embedding-cosine near-dup pairs vs broadcast normalized matrix.

    Threshold 0.5 keeps the oracle row non-vacuous on the driver testdata
    (the synthetic embeddings have no >0.8 pairs).

    This is the EXACT all-pairs baseline — a whole-corpus broadcast and an
    O(n²) similarity matrix — so it refuses corpora beyond
    ``max_corpus_bytes``; the scale path is
    :func:`embedding_dup_pairs_ivf` (centroid-bucketed compares)."""
    from xmlschema_ray.functions.vector import normalize_rows

    corpus_bytes = os.path.getsize(table_path(sf_dir, "embeddings"))
    if corpus_bytes > max_corpus_bytes:
        raise ValueError(
            f"embedding_dup_pairs is an exact all-pairs baseline; corpus is "
            f"{corpus_bytes >> 20} MiB > max_corpus_bytes={max_corpus_bytes >> 20} MiB. "
            f"Use embedding_dup_pairs_ivf for large corpora."
        )
    tbl = rd.read_parquet(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    corpus = tbl.to_pandas()
    ids = corpus["vec_id"].to_numpy()
    mat = normalize_rows(np.stack(corpus["embedding"].to_numpy()))
    order = np.argsort(ids)
    corpus_ref = ray.put((ids[order], mat[order]))
    state: dict = {}

    def cosine_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        c = state.get("c")
        if c is None:
            c = state["c"] = ray.get(corpus_ref)
        cids, cmat = c
        vecs = normalize_rows(np.stack(batch["embedding"].to_numpy()))
        sims = vecs @ cmat.T  # (b, n)
        bid = batch["vec_id"].to_numpy()
        mask = (sims >= threshold) & (bid[:, None] < cids[None, :])
        bi, ci = np.nonzero(mask)
        return pd.DataFrame(
            {
                "vec_id_a": pd.array(bid[bi], dtype="int64"),
                "vec_id_b": pd.array(cids[ci], dtype="int64"),
            }
        )

    from xmlschema_ray.ops.relational import to_pandas_with_schema

    out = to_pandas_with_schema(tbl.map_batches(cosine_pairs, batch_format="pandas"))
    return out.sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)


EMBEDDING_DUP_SQL = """
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id AND list_cosine_similarity(a.embedding, b.embedding) >= 0.5
ORDER BY vec_id_a, vec_id_b
"""


def embedding_dup_pairs_ivf(
    sf_dir: str,
    threshold: float = 0.5,
    n_centroids: int = 16,
    n_probe: int = 8,
    sample_size: int = 4096,
    oracle_dump: bool = True,
) -> pd.DataFrame:
    """IVF-bucketed embedding near-dup pairs — the 100-TB scale path.

    NO whole-corpus broadcast anywhere: the only broadcast is the tiny
    centroid matrix. Each vector is exploded to (bucket, vec_id, vec)
    rows — once as a HOME row in its nearest-centroid bucket, once as a
    PROBER row in each of its ``n_probe`` closest buckets — and ONE
    bounded hash shuffle co-locates each bucket, where a single matmul
    compares the bucket's probers against its homes (``prober id <
    home id`` orders the pair; a pair surfaces exactly once, in the home
    bucket of its larger id). The exchange ships ``(1 + n_probe) x corpus``
    rows — the standard inverted-list ANN trade against all-pairs.

    Every emitted pair is exact-cosine-verified, so precision is 1.0 vs
    :func:`embedding_dup_pairs`; recall < 1 is possible when a near-dup
    pair straddles unprobed buckets. The (bucket, vec_id, role) assignment
    rows are dumped to parquet so EMBEDDING_DUP_IVF_SQL can re-derive the
    probe-restricted pair set exactly in DuckDB (same dumped-state pattern
    as ``knn_ivf``); tests additionally assert pairs ⊆ exact pairs.
    """
    from xmlschema_ray.functions.vector import kmeans_fit, normalize_rows
    from xmlschema_ray.ops.relational import hash_partition_apply, to_pandas_with_schema

    tbl = rd.read_parquet(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    sample = seeded_embedding_sample(tbl, sample_size)
    centroids = kmeans_fit(sample, k=n_centroids)
    cent_ref = ray.put(centroids)
    state: dict = {}

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        cent = state.get("c")
        if cent is None:
            cent = state["c"] = ray.get(cent_ref)
        vecs = normalize_rows(np.stack(batch["embedding"].to_numpy()))
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        probes = np.argsort(-(vecs @ cent.T), axis=1)[:, :n_probe]  # col 0 = home
        vb = np.array([v.tobytes() for v in vecs], dtype=object)
        n = len(ids)
        return pd.DataFrame(
            {
                "bucket": np.concatenate([probes[:, 0], probes.reshape(-1)]),
                "vec_id": np.concatenate([ids, np.repeat(ids, n_probe)]),
                "vec": np.concatenate([vb, np.repeat(vb, n_probe)]),
                "role": np.concatenate(
                    [np.zeros(n, np.int8), np.ones(n * n_probe, np.int8)]
                ),
            }
        )

    def per_bucket(part: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in part.groupby("bucket", sort=False):
            hm = g[g["role"] == 0]
            pr = g[g["role"] == 1]
            if hm.empty or pr.empty:
                continue
            hmat = np.stack([np.frombuffer(b) for b in hm["vec"]])
            pmat = np.stack([np.frombuffer(b) for b in pr["vec"]])
            hid = hm["vec_id"].to_numpy()
            pid_ = pr["vec_id"].to_numpy()
            cos = pmat @ hmat.T
            mask = (cos >= threshold) & (pid_[:, None] < hid[None, :])
            pi, hi = np.nonzero(mask)
            out_a.extend(pid_[pi].tolist())
            out_b.extend(hid[hi].tolist())
        return pd.DataFrame(
            {
                "vec_id_a": pd.array(out_a, dtype="int64"),
                "vec_id_b": pd.array(out_b, dtype="int64"),
            }
        )

    rows = tbl.map_batches(explode, batch_format="pandas")
    _oracle_dump(
        rows.map_batches(
            lambda b: b[["bucket", "vec_id", "role"]], batch_format="pandas"
        ),
        "ivf_dup_assign",
        oracle_dump,
    )
    out = to_pandas_with_schema(hash_partition_apply(rows, "bucket", per_bucket))
    return (
        out.drop_duplicates()
        .sort_values(["vec_id_a", "vec_id_b"])
        .reset_index(drop=True)
    )


EMBEDDING_DUP_IVF_SQL = """
WITH homes AS (
  SELECT vec_id, bucket
  FROM read_parquet('/tmp/xmlschema_ray_oracle/ivf_dup_assign/*.parquet')
  WHERE role = 0
), probes AS (
  SELECT DISTINCT vec_id, bucket
  FROM read_parquet('/tmp/xmlschema_ray_oracle/ivf_dup_assign/*.parquet')
  WHERE role = 1
)
SELECT DISTINCT p.vec_id AS vec_id_a, h.vec_id AS vec_id_b
FROM probes p
JOIN homes h ON p.bucket = h.bucket AND p.vec_id < h.vec_id
JOIN embeddings a ON a.vec_id = p.vec_id
JOIN embeddings b ON b.vec_id = h.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.5
ORDER BY vec_id_a, vec_id_b
"""


# -- semantic dedup (SemDeDup) --------------------------------------------

SEMDEDUP_THRESHOLD = 0.5


def semantic_dedup(
    sf_dir: str,
    threshold: float = SEMDEDUP_THRESHOLD,
    n_clusters: int = 8,
    sample_size: int = 4096,
    oracle_dump: bool = True,
) -> pd.DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): spherical k-means partitions the corpus into
    semantic clusters and near-duplicates are pruned WITHIN each cluster
    only — the clustering bounds the quadratic pair search that makes
    whole-corpus cosine dedup intractable.

    Keep rule (deterministic): a vector is pruned iff a LOWER-``vec_id``
    member of its own cluster has cosine >= ``threshold``; the smallest
    id of every in-cluster near-dup neighborhood always survives.

    Scale shape: centroid-only broadcast (the model is fit on a seeded
    cross-block sample, never first-N rows); one assignment matmul per
    batch; ONE bounded hash shuffle co-locates each cluster; one matmul
    per cluster group. At 10^12 rows ``n_clusters`` scales with the
    corpus (SemDeDup's own regime — cluster membership stays bounded), so
    per-cluster state is bounded and pair state never leaves the cluster.

    Oracle: the (vec_id, cluster) assignments are dumped to parquet and
    ``SEMANTIC_DEDUP_SQL`` re-derives the pruned set exactly in DuckDB
    from those assignments + true cosines (the dumped-state pattern of
    ``embedding_dup_pairs_ivf``). Returns the full corpus verdict
    ``(vec_id, cluster, keep)`` sorted by ``vec_id``.
    """
    from xmlschema_ray.functions.vector import kmeans_fit, normalize_rows
    from xmlschema_ray.ops.relational import hash_partition_apply, to_pandas_with_schema

    tbl = rd.read_parquet(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    sample = seeded_embedding_sample(tbl, sample_size)
    centroids = kmeans_fit(sample, k=n_clusters)
    cent_ref = ray.put(centroids)
    state: dict = {}

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        cent = state.get("c")
        if cent is None:
            cent = state["c"] = ray.get(cent_ref)
        vecs = normalize_rows(np.stack(batch["embedding"].to_numpy()))
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "cluster": (vecs @ cent.T).argmax(axis=1).astype(np.int64),
                "vec_id": ids,
                "vec": np.array([v.tobytes() for v in vecs], dtype=object),
            }
        )

    def per_cluster(part: pd.DataFrame) -> pd.DataFrame:
        out: List[pd.DataFrame] = []
        for _, g in part.groupby("cluster", sort=False):
            g = g.sort_values("vec_id")
            ids = g["vec_id"].to_numpy()
            mat = np.stack([np.frombuffer(b) for b in g["vec"]])
            cos = mat @ mat.T
            # row i pruned iff any strictly-lower-id column clears the bar
            dup = ((cos >= threshold) & (ids[None, :] < ids[:, None])).any(axis=1)
            out.append(
                pd.DataFrame(
                    {"vec_id": ids, "cluster": g["cluster"].to_numpy(), "keep": ~dup}
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    "vec_id": np.array([], dtype=np.int64),
                    "cluster": np.array([], dtype=np.int64),
                    "keep": np.array([], dtype=bool),
                }
            )
        return pd.concat(out, ignore_index=True)

    rows = tbl.map_batches(assign, batch_format="pandas")
    _oracle_dump(
        rows.map_batches(lambda b: b[["vec_id", "cluster"]], batch_format="pandas"),
        "semdedup_assign",
        oracle_dump,
    )
    out = to_pandas_with_schema(hash_partition_apply(rows, "cluster", per_cluster))
    return out.sort_values("vec_id").reset_index(drop=True)


SEMANTIC_DEDUP_SQL = f"""
WITH a AS (
  SELECT vec_id, cluster
  FROM read_parquet('/tmp/xmlschema_ray_oracle/semdedup_assign/*.parquet')
), pruned AS (
  SELECT DISTINCT hi.vec_id
  FROM a lo
  JOIN a hi ON lo.cluster = hi.cluster AND lo.vec_id < hi.vec_id
  JOIN embeddings ea ON ea.vec_id = lo.vec_id
  JOIN embeddings eb ON eb.vec_id = hi.vec_id
  WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= {SEMDEDUP_THRESHOLD}
)
SELECT a.vec_id AS vec_id, a.cluster AS cluster, (p.vec_id IS NULL) AS keep
FROM a LEFT JOIN pruned p ON p.vec_id = a.vec_id
ORDER BY vec_id
"""


# -- exact substring-span dedup (Lee et al. 2022) -------------------------

SPAN_TOKENS = 8


def _pair_count_template(count_col: str) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id_a": pd.Series([], dtype="int64"),
            "doc_id_b": pd.Series([], dtype="int64"),
            count_col: pd.Series([], dtype="int64"),
        }
    )


def _shared_key_pair_counts(
    rows: "rd.Dataset",
    key_col: str,
    count_col: str,
    distributed: bool,
    max_df: "int | None" = None,
):
    """(doc_id_a < doc_id_b, n shared keys) from a stream of DISTINCT
    (key, doc) rows — the pair-finalize shared by the substring-span and
    winnowed-fingerprint dedups.

    One hash exchange co-locates each key's doc set; pair generation is
    per-key ``triu_indices`` inside the partition; per-(a, b) counts from
    different keys merge through ``combiner_aggregate``. ``max_df`` drops
    keys held by more than that many docs before pair generation (the
    quadratic boilerplate guard). Driver plan: the same two merges on the
    collected candidate-scoped rows, byte-identical by forced-path test.
    """
    from xmlschema_ray.ops.relational import combiner_aggregate, hash_partition_apply

    template = _pair_count_template(count_col)

    def pair_partial(part: pd.DataFrame) -> pd.DataFrame:
        a_out: List[np.ndarray] = []
        b_out: List[np.ndarray] = []
        for _, g in part.groupby(key_col, sort=False)["doc"]:
            docs = np.unique(g.to_numpy())
            if len(docs) < 2:
                continue  # collision partner or single-doc survivor
            if max_df is not None and len(docs) > max_df:
                continue  # boilerplate key: quadratic pair guard
            ai, bi = np.triu_indices(len(docs), k=1)
            a_out.append(docs[ai])
            b_out.append(docs[bi])
        if not a_out:
            return template.rename(columns={count_col: "n"})
        df = pd.DataFrame(
            {"doc_id_a": np.concatenate(a_out), "doc_id_b": np.concatenate(b_out)}
        )
        return (
            df.groupby(["doc_id_a", "doc_id_b"], sort=False)
            .size()
            .rename("n")
            .reset_index()
            .astype({"n": "int64"})
        )

    if not distributed:
        pairs = pair_partial(rows.to_pandas())  # candidate-scoped collect
        out = (
            pairs.groupby(["doc_id_a", "doc_id_b"], sort=False)["n"]
            .sum()
            .rename(count_col)
            .reset_index()
            .sort_values(["doc_id_a", "doc_id_b"])
            .reset_index(drop=True)
        )
        return out if len(out) else template
    pairs_ds = hash_partition_apply(rows, key_col, pair_partial)
    merged = combiner_aggregate(
        pairs_ds, ["doc_id_a", "doc_id_b"], {count_col: ("n", "sum")}
    )
    return dataset_or_typed_empty(merged.sort(["doc_id_a", "doc_id_b"]), template)

_SPAN_M = np.uint64(0x9E3779B97F4A7C15)


def _flat_tokens(text: "pa.ChunkedArray | pa.Array") -> Tuple[np.ndarray, np.ndarray]:
    """(flat_tokens, row_index) for a batch: one Arrow whitespace split
    over the whole batch; empty boundary fields are dropped so the token
    stream is exactly the ``\\S+`` runs (matches
    ``regexp_split_to_array(trim(x), '\\s+')`` with ``<> ''`` — see the
    split-semantics note in CLAUDE.md)."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.ascii_split_whitespace(text)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = words.offsets.to_numpy()
    flat = words.values.to_numpy(zero_copy_only=False)
    row_of = np.searchsorted(offsets, np.arange(len(flat), dtype=np.int64), side="right") - 1
    keep = flat != ""
    return flat[keep], row_of[keep]


def _window_hashes(
    flat: np.ndarray, row_of: np.ndarray, span: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(start_idx, window_hash) for every length-``span`` token window
    over an already-flattened batch token stream: a polynomial roll over
    per-token 64-bit hashes (``span`` shifted multiply-adds, fully
    vectorized); windows never cross document boundaries."""
    total = len(flat)
    if total < span:
        return np.array([], dtype=np.int64), np.array([], dtype=np.uint64)
    starts = np.arange(total - span + 1, dtype=np.int64)
    valid = row_of[starts] == row_of[starts + span - 1]
    vs = starts[valid]
    th = hash64(flat)
    gh = np.zeros(len(vs), dtype=np.uint64)
    for k in range(span):
        gh = gh * _SPAN_M + th[vs + k]
    return vs, gh


def _token_windows(
    text: "pa.ChunkedArray | pa.Array", span: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(row_idx, start_idx, flat_tokens, window_hash) for every length-
    ``span`` token window in a batch (:func:`_flat_tokens` +
    :func:`_window_hashes`)."""
    flat, row_of = _flat_tokens(text)
    vs, gh = _window_hashes(flat, row_of, span)
    return row_of[vs], vs, flat, gh


def _candidate_window_hashes(ds: "rd.Dataset", span: int, distributed: bool) -> np.ndarray:
    """Sorted uint64 hashes of token windows seen in >= 2 distinct docs.

    One corpus-wide exchange of per-batch ``(window_hash, min_doc,
    max_doc)`` partials — one 24-byte row per DISTINCT hash per batch,
    never the token text; a hash is a candidate iff its global
    min_doc != max_doc. Collisions can only ADD candidates (callers
    exact-verify on the span string). Driver plan merges the collected
    partial stream; distributed plan hash-shuffles it."""
    from xmlschema_ray.ops.relational import hash_partition_apply, to_pandas_with_schema

    def span_partial(batch: pa.Table) -> pd.DataFrame:
        row_idx, _, _, gh = _token_windows(batch["text"], span)
        ids = pc.cast(batch["doc_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        df = pd.DataFrame({"gh": gh, "doc": ids[row_idx]})
        gb = df.groupby("gh", sort=False)["doc"]
        return pd.DataFrame({"dmin": gb.min(), "dmax": gb.max()}).reset_index()

    def merge_minmax(part: pd.DataFrame) -> pd.DataFrame:
        gb = part.groupby("gh", sort=False)
        return pd.DataFrame(
            {"dmin": gb["dmin"].min(), "dmax": gb["dmax"].max()}
        ).reset_index()

    partials = ds.map_batches(span_partial, batch_format="pyarrow", zero_copy_batch=True)
    if not distributed:
        merged = merge_minmax(partials.to_pandas())
        cand = merged.loc[merged["dmin"] < merged["dmax"], "gh"].to_numpy(dtype=np.uint64)
    else:
        merged_ds = hash_partition_apply(partials, "gh", merge_minmax)
        cand = to_pandas_with_schema(
            merged_ds.filter(expr="dmin < dmax").select_columns(["gh"])
        )["gh"].to_numpy(dtype=np.uint64)
    cand.sort()
    return cand


def substring_dup_pairs(
    sf_dir: str,
    span_tokens: int = SPAN_TOKENS,
    max_gram_df: "int | None" = None,
    distributed_threshold_bytes: "int | None" = None,
):
    """Exact substring-level dedup: pairs of documents sharing at least one
    EXACT ``span_tokens``-token span, with the count of distinct shared
    spans per pair (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", arXiv:2107.06499 — the span-level complement
    of the doc-level family above; no reference analog, north-rule
    mandate).

    Two-phase hashed shape (the engine's stage-B uniqueness pattern): the
    corpus-wide exchange ships per-batch ``(window_hash:uint64,
    min_doc, max_doc)`` partials — one row per DISTINCT window hash per
    batch, 24 bytes each, never the token text — and a window hash is a
    candidate iff its global min_doc != max_doc (seen in ≥2 docs).
    Collisions can only create FALSE candidates: phase 2 rescans only
    candidate windows (sorted-hash binary-search membership against a
    candidate broadcast), reconstructs their actual token text, and
    groups by the exact span string, so output is collision-proof exact.
    Pair counts merge through ``combiner_aggregate`` on the (a, b) key.

    Scale controls: ``max_gram_df`` drops spans occurring in more than
    that many documents before pair generation (boilerplate spans explode
    quadratically; Lee et al. §4 drop them the same way) — default None
    = exact, which is what the DuckDB oracle checks. Below the size
    threshold the two merges run driver-side on the bounded partial /
    candidate streams; above it they are hash shuffles (forced-path test
    proves both plans identical).
    """
    from xmlschema_ray.engine.stats import isin_sorted

    if distributed_threshold_bytes is None:
        distributed_threshold_bytes = DEDUP_DISTRIBUTED_THRESHOLD_BYTES
    distributed = (
        os.path.getsize(table_path(sf_dir, "documents")) > distributed_threshold_bytes
    )
    span = span_tokens
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])
    cand = _candidate_window_hashes(ds, span, distributed)

    pair_template = _pair_count_template("n_shared_grams")
    if len(cand) == 0:
        return pair_template

    cand_ref = ray.put(cand)  # duplicated-span hashes only — candidate-scoped
    state: dict = {}

    gram_emit_schema = pa.schema([("gram", pa.string()), ("doc", pa.int64())])

    def gram_emit(batch: pa.Table) -> pa.Table:
        # Arrow in AND out: an empty object-dtype pandas column trips Ray's
        # np.vectorize-based size estimator; Arrow sizes are exact.
        c = state.get("c")
        if c is None:
            c = state["c"] = ray.get(cand_ref)
        row_idx, vs, flat, gh = _token_windows(batch["text"], span)
        hit = isin_sorted(gh, c)
        if not hit.any():
            return gram_emit_schema.empty_table()
        sel = vs[hit]
        grams = flat[sel]
        for k in range(1, span):
            grams = grams + " " + flat[sel + k]
        ids = pc.cast(batch["doc_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        df = (
            pd.DataFrame({"gram": grams, "doc": ids[row_idx[hit]]})
            .drop_duplicates()  # exact: one row per doc (docs never span batches)
            .reset_index(drop=True)
        )
        return pa.Table.from_pandas(df, schema=gram_emit_schema, preserve_index=False)

    cand_rows = ds.map_batches(gram_emit, batch_format="pyarrow", zero_copy_batch=True)
    return _shared_key_pair_counts(
        cand_rows, "gram", "n_shared_grams", distributed, max_df=max_gram_df
    )


SUBSTRING_DUP_SQL = rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
), pos AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - {SPAN_TOKENS - 1})) AS i FROM toks
), grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+{SPAN_TOKENS - 1}], ' ') AS gram FROM pos
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_grams
FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
GROUP BY 1, 2
ORDER BY doc_id_a, doc_id_b
"""


def strip_dup_spans(
    sf_dir: str,
    span_tokens: int = SPAN_TOKENS,
    distributed_threshold_bytes: "int | None" = None,
):
    """The Lee et al. 2022 dedup TRANSFORMATION: rewrite every document
    with all cross-document duplicated ``span_tokens``-token spans
    removed (a token is dropped iff it lies inside some window whose
    exact text also occurs in another document). Returns
    ``(doc_id, clean_text, n_removed)`` for EVERY document, sorted.

    Detection is the exact two-phase machinery of
    :func:`substring_dup_pairs` (hash candidates → exact-string verify),
    but keeps window POSITIONS: a gram group with >= 2 distinct docs
    emits all its (doc, start) rows as removals — removal volume is
    bounded by actual duplication. Coverage per doc is an interval-union
    diff array over the flat token stream (vectorized); only the final
    per-doc string join is a Python loop (inherent to text
    reconstruction — same shape as the formatter writers).

    Plans: below the threshold removals broadcast (``ray.put``) and the
    document stream is rewritten in one ``map_batches`` — the docs table
    itself never shuffles; above it removals stay a Dataset and
    ``copartition_apply`` co-locates each doc with its removals through
    ONE exchange. Forced-path test proves both identical.
    """
    from xmlschema_ray.engine.stats import isin_sorted
    from xmlschema_ray.ops.relational import copartition_apply

    if distributed_threshold_bytes is None:
        distributed_threshold_bytes = DEDUP_DISTRIBUTED_THRESHOLD_BYTES
    distributed = (
        os.path.getsize(table_path(sf_dir, "documents")) > distributed_threshold_bytes
    )
    span = span_tokens
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])
    cand = _candidate_window_hashes(ds, span, distributed)
    cand_ref = ray.put(cand)
    state: dict = {}

    pos_schema = pa.schema([("gram", pa.string()), ("doc", pa.int64()), ("pos", pa.int64())])

    def gram_pos_emit(batch: pa.Table) -> pa.Table:
        """All candidate windows WITH their within-doc start positions."""
        c = state.get("c")
        if c is None:
            c = state["c"] = ray.get(cand_ref)
        flat, row_of = _flat_tokens(batch["text"])
        vs, gh = _window_hashes(flat, row_of, span)
        hit = isin_sorted(gh, c)
        if not hit.any():
            return pos_schema.empty_table()
        sel = vs[hit]
        rows = row_of[sel]
        grams = flat[sel]
        for k in range(1, span):
            grams = grams + " " + flat[sel + k]
        # within-doc 0-based start: flat index minus the doc's first flat
        # index (row_of is sorted, so searchsorted-left finds it)
        doc_start = np.searchsorted(row_of, rows, side="left")
        ids = pc.cast(batch["doc_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        df = pd.DataFrame({"gram": grams, "doc": ids[rows], "pos": sel - doc_start})
        return pa.Table.from_pandas(df, schema=pos_schema, preserve_index=False)

    def removals_partial(part: pd.DataFrame) -> pd.DataFrame:
        """Exact verify per gram group: >= 2 distinct docs → emit all
        (doc, pos) starts of that group."""
        gb = part.groupby("gram", sort=False)["doc"]
        dup = gb.transform("nunique") >= 2
        out = part.loc[dup, ["doc", "pos"]].reset_index(drop=True)
        return out.astype({"doc": "int64", "pos": "int64"})

    out_template = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "clean_text": pd.Series([], dtype=object),
            "n_removed": pd.Series([], dtype="int64"),
        }
    )

    def rebuild(docs_df: pd.DataFrame, rem_df: pd.DataFrame) -> pd.DataFrame:
        flat, row_of = _flat_tokens(pa.array(docs_df["text"].to_numpy(), type=pa.string()))
        n_rows = len(docs_df)
        counts = np.bincount(row_of, minlength=n_rows) if len(row_of) else np.zeros(n_rows, dtype=np.int64)
        offs = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        total = len(flat)
        covered = np.zeros(total, dtype=bool)
        if len(rem_df):
            lookup = pd.DataFrame(
                {"doc": docs_df["doc_id"].to_numpy(), "__row": np.arange(n_rows, dtype=np.int64)}
            )
            m = rem_df.merge(lookup, on="doc")
            starts = offs[m["__row"].to_numpy()] + m["pos"].to_numpy()
            diff = np.zeros(total + 1, dtype=np.int64)
            np.add.at(diff, starts, 1)
            np.add.at(diff, starts + span, -1)  # a start is always <= n-span
            covered = np.cumsum(diff[:-1]) > 0
        clean = [
            " ".join(flat[offs[r] : offs[r + 1]][~covered[offs[r] : offs[r + 1]]])
            for r in range(n_rows)
        ]
        n_removed = (
            np.bincount(row_of[covered], minlength=n_rows)
            if covered.any()
            else np.zeros(n_rows, dtype=np.int64)
        )
        return pd.DataFrame(
            {
                "doc_id": docs_df["doc_id"].to_numpy(),
                "clean_text": np.array(clean, dtype=object),
                "n_removed": n_removed.astype(np.int64),
            }
        )

    cand_rows = ds.map_batches(gram_pos_emit, batch_format="pyarrow", zero_copy_batch=True)
    if not distributed:
        rem = removals_partial(cand_rows.to_pandas())  # candidate-scoped collect
        rem_ref = ray.put(rem)
        rstate: dict = {}

        def rewrite(batch: pd.DataFrame) -> pd.DataFrame:
            r = rstate.get("r")
            if r is None:
                r = rstate["r"] = ray.get(rem_ref)
            return rebuild(batch, r)

        return ds.map_batches(rewrite, batch_format="pandas").sort("doc_id")
    from xmlschema_ray.ops.relational import hash_partition_apply

    rem_ds = hash_partition_apply(cand_rows, "gram", removals_partial)

    def join_rebuild(docs_df: pd.DataFrame, rem_df: pd.DataFrame) -> pd.DataFrame:
        if not len(docs_df):
            return out_template
        return rebuild(docs_df, rem_df[["doc", "pos"]])

    out = copartition_apply(ds, rem_ds, "doc_id", "doc", join_rebuild)
    return out.sort("doc_id")


STRIP_DUP_SPANS_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS t
  FROM documents
), pos AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - {SPAN_TOKENS - 1})) AS i FROM toks
), grams AS (
  SELECT doc_id, i, array_to_string(t[i:i+{SPAN_TOKENS - 1}], ' ') AS gram FROM pos
), dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
), rem AS (
  SELECT g.doc_id, g.i FROM grams g JOIN dup USING (gram)
), tokpos AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t))) AS p FROM toks
), kept AS (
  SELECT tp.doc_id, tp.p, tp.t[tp.p] AS tok
  FROM tokpos tp
  WHERE NOT EXISTS (
    SELECT 1 FROM rem r
    WHERE r.doc_id = tp.doc_id AND tp.p BETWEEN r.i AND r.i + {SPAN_TOKENS - 1}
  )
)
SELECT tk.doc_id AS doc_id,
       COALESCE(k.clean_text, '') AS clean_text,
       CAST(len(tk.t) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed
FROM toks tk
LEFT JOIN (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
) k USING (doc_id)
ORDER BY doc_id
"""


# -- winnowed fingerprint dedup (Schleimer et al. 2003, MOSS) -------------

WINNOW_GUARANTEE = 8
WINNOW_GRAM = 4


def winnowed_dup_pairs(
    sf_dir: str,
    guarantee_tokens: int = WINNOW_GUARANTEE,
    gram_tokens: int = WINNOW_GRAM,
    max_fp_df: "int | None" = None,
    distributed_threshold_bytes: "int | None" = None,
    oracle_dump: bool = True,
):
    """Winnowing-fingerprint near-dup pairs (Schleimer, Wilkerson, Aiken
    2003, "Winnowing: Local Algorithms for Document Fingerprinting" —
    the MOSS sieve): the SAMPLED scale path beside the exact
    :func:`substring_dup_pairs`.

    Each document keeps only the minimum ``gram_tokens``-gram hash of
    every ``w = guarantee_tokens - gram_tokens + 1`` consecutive grams
    (one sliding-window argmin per batch, fully vectorized; windows never
    cross documents). The winnowing guarantee: any shared token span of
    length >= ``guarantee_tokens`` selects at least one common
    fingerprint in BOTH documents, so exact-span pairs are a SUBSET of
    these pairs (invariant-tested against ``substring_dup_pairs``) while
    only ~2/w of the gram hashes — tunable density — ever leave the
    scan. At 10^12 tokens, raising ``guarantee_tokens`` (w ~ 50) cuts
    the exchange 25x against the exact op's all-windows partials; pairs
    are hash-keyed (no exact-string verify — 64-bit fingerprint
    collisions can only ADD a pair, never drop one, which preserves the
    no-false-negative guarantee this op exists for).

    Pipeline: one fingerprint scan (materialized — the /w-sized
    fingerprint set is the op's working set; Ray spills it), an
    (fp, min_doc, max_doc) candidate sieve, a candidate-scoped
    ``semi_join`` rescan of the materialized fingerprints, and the shared
    pair finalize. Oracle: the (doc_id, fp) fingerprint set is dumped and
    DuckDB re-derives the pairs exactly (the dumped-state pattern of
    ``simhash_pairs``/``semantic_dedup``).
    """
    from xmlschema_ray.ops.relational import (
        hash_partition_apply,
        semi_join,
        to_pandas_with_schema,
    )

    if gram_tokens < 1 or guarantee_tokens < gram_tokens:
        raise ValueError("need guarantee_tokens >= gram_tokens >= 1")
    w = guarantee_tokens - gram_tokens + 1
    if distributed_threshold_bytes is None:
        distributed_threshold_bytes = DEDUP_DISTRIBUTED_THRESHOLD_BYTES
    distributed = (
        os.path.getsize(table_path(sf_dir, "documents")) > distributed_threshold_bytes
    )
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    fp_schema = pa.schema([("fp", pa.uint64()), ("doc", pa.int64())])

    def fp_partial(batch: pa.Table) -> pa.Table:
        row_idx, _, _, gh = _token_windows(batch["text"], gram_tokens)
        n = len(gh)
        if n < w:
            return fp_schema.empty_table()
        sw = np.lib.stride_tricks.sliding_window_view(gh, w)
        amin = sw.argmin(axis=1).astype(np.int64)
        starts = np.arange(n - w + 1, dtype=np.int64)
        ok = row_idx[starts] == row_idx[starts + w - 1]
        if not ok.any():
            return fp_schema.empty_table()
        # adjacent windows re-selecting the same minimum collapse here;
        # the same gram VALUE at two positions of one doc collapses in
        # the (fp, doc) drop_duplicates
        sel = np.unique(starts[ok] + amin[ok])
        ids = pc.cast(batch["doc_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        df = pd.DataFrame({"fp": gh[sel], "doc": ids[row_idx[sel]]}).drop_duplicates()
        return pa.Table.from_pandas(df, schema=fp_schema, preserve_index=False)

    fps = ds.map_batches(
        fp_partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    _oracle_dump(
        fps.map_batches(
            lambda t: t.rename_columns(["fp", "doc_id"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "winnow_fp",
        oracle_dump,
    )

    def sieve_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["fp", "doc"]).to_pandas()
        gb = df.groupby("fp", sort=False)["doc"]
        return pd.DataFrame({"dmin": gb.min(), "dmax": gb.max()}).reset_index()

    def merge_minmax(part: pd.DataFrame) -> pd.DataFrame:
        gb = part.groupby("fp", sort=False)
        return pd.DataFrame(
            {"dmin": gb["dmin"].min(), "dmax": gb["dmax"].max()}
        ).reset_index()

    partials = fps.map_batches(sieve_partial, batch_format="pyarrow", zero_copy_batch=True)
    if not distributed:
        merged = merge_minmax(partials.to_pandas())
        cand = merged.loc[merged["dmin"] < merged["dmax"], "fp"].to_numpy(dtype=np.uint64)
    else:
        merged_ds = hash_partition_apply(partials, "fp", merge_minmax)
        cand = to_pandas_with_schema(
            merged_ds.filter(expr="dmin < dmax").select_columns(["fp"])
        )["fp"].to_numpy(dtype=np.uint64)

    template = _pair_count_template("n_shared_fps")
    if len(cand) == 0:
        return template
    cand_rows = semi_join(fps, cand, on="fp")  # duplicated fingerprints only
    return _shared_key_pair_counts(
        cand_rows, "fp", "n_shared_fps", distributed, max_df=max_fp_df
    )


WINNOWED_DUP_SQL = """
WITH fp AS (
  SELECT doc_id, fp
  FROM read_parquet('/tmp/xmlschema_ray_oracle/winnow_fp/*.parquet')
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_fps
FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
ORDER BY doc_id_a, doc_id_b
"""


# -- incremental dedup against a persisted fingerprint index ----------------

# the C4-style leading-span fingerprint: a doc's first PREFIX_WORDS words
PREFIX_WORDS = 5
DEDUP_INDEX_BUCKETS = 32


def _prefix_digest_rows(batch: pa.Table) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_ids, md5 hexdigest of each doc's first-PREFIX_WORDS-word
    prefix, bucket) — Arrow ``list_slice`` + ``binary_join`` keep the
    prefix extraction vectorized; md5 is the portable-hash choice the
    DuckDB oracle recomputes (as in curation's seeded orders), one call
    per DOC, not per token."""
    from xmlschema_ray.pipelines.curation import _md5_hex

    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.ascii_split_whitespace(pc.utf8_trim_whitespace(text))
    prefix = pc.binary_join(pc.list_slice(words, 0, PREFIX_WORDS), " ")
    digests = _md5_hex(prefix.to_numpy(zero_copy_only=False))
    buckets = np.array([int(h[:4], 16) for h in digests], dtype=np.int64)
    return ids, digests, buckets


def build_dedup_index(
    sf_dir: str, index_dir: str, n_buckets: int = DEDUP_INDEX_BUCKETS
) -> str:
    """Persist the already-ingested corpus slice's fingerprint index:
    (digest, doc_id) rows hive-partitioned by ``bucket = digest % n_buckets``.

    The ingestion-time layout for a 100-TB corpus: the index is ~24 bytes
    per document (16-byte digest + 8-byte id) and bucket-partitioned on
    disk, so a new shard's dedup probe reads ONLY the buckets its own keys
    hash to — never the corpus, never the whole index. The build is one
    streaming pass + one partitioned write, produced atomically
    (tmp + rename, manifest last) so an interrupted build restarts
    cleanly and is never half-read; an existing manifest short-circuits
    (same recovery contract as ``build_ivf_index``,
    similarity.py:241-288). The "already ingested" slice is the
    deterministic ``doc_id % 10 != 7`` complement of
    :func:`incremental_dedup`'s new shard, so both engines recompute it.
    """
    import json
    import shutil

    marker = os.path.join(index_dir, "manifest.json")
    if os.path.exists(marker):
        return index_dir
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def key_rows(batch: pa.Table) -> pd.DataFrame:
        ids, digests, buckets = _prefix_digest_rows(batch)
        keep = ids % 10 != 7
        return pd.DataFrame(
            {"d": digests[keep], "doc_id": ids[keep], "bucket": buckets[keep] % n_buckets}
        )

    tmp = index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.dirname(index_dir) or ".", exist_ok=True)
    ds.map_batches(key_rows, batch_format="pyarrow").write_parquet(
        tmp, partition_cols=["bucket"]
    )
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump({"n_buckets": n_buckets, "prefix_words": PREFIX_WORDS}, f)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.replace(tmp, index_dir)
    return index_dir


_INCREMENTAL_EMPTY = pd.DataFrame(
    {
        "new_doc_id": np.array([], dtype=np.int64),
        "base_keep_id": np.array([], dtype=np.int64),
        "n_base": np.array([], dtype=np.int64),
    }
)


def incremental_dedup(
    sf_dir: str,
    index_dir: "str | None" = None,
    n_buckets: int = DEDUP_INDEX_BUCKETS,
) -> "rd.Dataset":
    """Dedup a NEW shard against the already-ingested corpus via the
    persisted fingerprint index — the incremental-ingestion primitive: a
    daily crawl drop is checked against 100 TB of history WITHOUT
    re-scanning (or re-shuffling) the history.

    The new shard here is the deterministic ``doc_id % 10 == 7`` slice
    (standing in for "today's files"; both engines recompute the split).
    Probe shape: the new shard streams once emitting (new_doc_id, digest,
    bucket) keys; one bounded exchange co-locates keys by bucket; each
    partition reads ONLY its buckets' index files (IO-level pruning, the
    probed-bucket read of ``knn_ivf``) and inner-merges on the digest.
    Output: one row per new doc whose leading-``PREFIX_WORDS``-word
    fingerprint already exists in the index, with the earliest indexed
    holder and its multiplicity. Matching is md5-fingerprint equality by
    contract (the index stores digests, not text); a byte-exact verify
    tier would re-read just the matched base docs — the candidate-scoped
    recovery scan of :func:`exact_dedup` phase 2. Reference analog:
    identity-key lookup against a prior document set
    (/root/reference/xmlschema/validators/identities.py:198-221).
    """
    import json

    import pyarrow.parquet as pq

    from xmlschema_ray.ops.relational import hash_partition_apply
    from xmlschema_ray.pipelines.common import sorted_or_typed_empty

    if index_dir is None:
        index_dir = os.path.join(
            "/tmp/xmlschema_ray_dedup_index",
            os.path.basename(os.path.normpath(sf_dir)),
        )
    build_dedup_index(sf_dir, index_dir, n_buckets)
    with open(os.path.join(index_dir, "manifest.json")) as f:
        n_buckets = json.load(f)["n_buckets"]

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def new_keys(batch: pa.Table) -> pd.DataFrame:
        ids, digests, buckets = _prefix_digest_rows(batch)
        keep = ids % 10 == 7
        return pd.DataFrame(
            {
                "new_doc_id": ids[keep],
                "d": digests[keep],
                "bucket": buckets[keep] % n_buckets,
            }
        )

    def probe(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for b, g in part.groupby("bucket", sort=False):
            bdir = os.path.join(index_dir, f"bucket={int(b)}")
            if not os.path.isdir(bdir):
                continue
            idx = pq.read_table(bdir, columns=["d", "doc_id"]).to_pandas()
            agg = (
                idx.groupby("d", sort=False)["doc_id"]
                .agg(base_keep_id="min", n_base="size")
                .reset_index()
            )
            m = g.merge(agg, on="d", how="inner")
            if len(m):
                outs.append(m[["new_doc_id", "base_keep_id", "n_base"]])
        if not outs:
            return _INCREMENTAL_EMPTY.copy()
        out = pd.concat(outs, ignore_index=True)
        return out.astype(
            {"new_doc_id": np.int64, "base_keep_id": np.int64, "n_base": np.int64}
        )

    keys = ds.map_batches(new_keys, batch_format="pyarrow")
    out = hash_partition_apply(keys, "bucket", probe)
    return sorted_or_typed_empty(out, ["new_doc_id"], template=_INCREMENTAL_EMPTY)


INCREMENTAL_DEDUP_SQL = r"""
WITH p AS (
  SELECT doc_id,
         md5(array_to_string((regexp_split_to_array(trim(text), '\s+'))[1:5], ' ')) AS d
  FROM documents
), base AS (
  SELECT d, MIN(doc_id) AS base_keep_id, COUNT(*) AS n_base
  FROM p WHERE doc_id % 10 <> 7 GROUP BY d
), new AS (
  SELECT doc_id AS new_doc_id, d FROM p WHERE doc_id % 10 = 7
)
SELECT new_doc_id, base_keep_id, CAST(n_base AS BIGINT) AS n_base
FROM new JOIN base USING (d)
ORDER BY new_doc_id
"""


def cdc_boilerplate_chunks(sf_dir: str) -> "rd.Dataset":
    """Content-defined chunking boilerplate detector (FastCDC/rsync-style
    chunking lifted to word streams): every document splits at
    content-derived boundaries — a word opens a new chunk iff the first
    hex digit of its md5 is 0–3 (p = 1/4, mean chunk ≈ 4 words) — and a
    chunk fingerprint that recurs across ≥ 2 DISTINCT documents is
    boilerplate. Because boundaries depend only on content, inserting or
    deleting words resynchronizes within one chunk, so shared passages
    fingerprint identically regardless of position — the property fixed
    windows (``substring_dup_pairs``) and winnowing lack.

    One streaming pass + ONE exchange: per-batch, boundary flags come
    from md5 over the batch's UNIQUE words (vocabulary-bounded, mapped
    back through the ``np.unique`` inverse), chunk ids from a cumulative
    sum, chunk strings from a chunk-bounded groupby join, and the batch
    emits (fingerprint, doc_id, n) partial rows. Hash-partitioning on
    the fingerprint co-locates each fingerprint's rows, where one
    vectorized groupby computes occurrence and distinct-doc counts.
    Output is boilerplate-sized (fingerprints seen in ≥2 docs), never
    corpus-sized. md5 keeps both the boundary rule and the chunk
    identity portable to the SQL oracle.
    """
    import hashlib

    from xmlschema_ray.ops.relational import hash_partition_apply
    from xmlschema_ray.pipelines.common import sorted_or_typed_empty

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    empty = pd.DataFrame(
        {
            "fp": pd.Series([], dtype=object),
            "n_occ": pd.Series([], dtype="int64"),
            "n_docs": pd.Series([], dtype="int64"),
        }
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lists = pc.utf8_split_whitespace(text)
        flat_a = pc.list_flatten(lists)
        flat = flat_a.to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        nonempty = flat != ""
        flat, parent = flat[nonempty], parent[nonempty]
        if len(flat) == 0:
            return pd.DataFrame(
                {
                    "fp": pd.Series([], dtype=object),
                    "doc_id": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uwords, inverse = np.unique(flat.astype(str), return_inverse=True)
        u_boundary = np.array(
            [hashlib.md5(w.encode("utf-8")).hexdigest()[0] in "0123" for w in uwords]
        )
        boundary = u_boundary[inverse]
        first_of_doc = np.empty(len(parent), dtype=bool)
        first_of_doc[0] = True
        first_of_doc[1:] = parent[1:] != parent[:-1]
        cid = np.cumsum(boundary | first_of_doc) - 1
        cdf = pd.DataFrame({"cid": cid, "word": flat, "doc": doc_ids[parent]})
        chunks = cdf.groupby("cid", sort=False).agg(
            s=("word", " ".join), doc=("doc", "first")
        )
        fps = np.array(
            [hashlib.md5(s.encode("utf-8")).hexdigest() for s in chunks["s"]],
            dtype=object,
        )
        out = pd.DataFrame({"fp": fps, "doc_id": chunks["doc"].to_numpy(np.int64)})
        g = out.groupby(["fp", "doc_id"], sort=False).size().rename("n").reset_index()
        g["n"] = g["n"].astype("int64")
        return g

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        # all rows of a fingerprint are co-located; (fp, doc_id) may still
        # repeat across source batches — collapse first, then reduce
        pd_ = part.groupby(["fp", "doc_id"], sort=False)["n"].sum().reset_index()
        g = pd_.groupby("fp", sort=False).agg(n_occ=("n", "sum"), n_docs=("doc_id", "size"))
        g = g[g["n_docs"] >= 2].reset_index()
        return g.astype({"n_occ": "int64", "n_docs": "int64"})

    out = hash_partition_apply(partials, "fp", merge)
    return sorted_or_typed_empty(out, ["fp"], template=empty)


CDC_BOILERPLATE_SQL = r"""
WITH w AS (
  SELECT doc_id, ws[i] AS word, i
  FROM (SELECT doc_id,
          list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        FROM documents),
       LATERAL unnest(generate_series(1, len(ws))) AS t(i)
), b AS (
  SELECT doc_id, i, word,
    CASE WHEN substring(md5(word), 1, 1) IN ('0','1','2','3') THEN 1 ELSE 0 END AS is_b
  FROM w
), c AS (
  SELECT doc_id, i, word,
    SUM(CASE WHEN i = 1 THEN 1 ELSE is_b END)
      OVER (PARTITION BY doc_id ORDER BY i) AS cid
  FROM b
), chunks AS (
  SELECT doc_id, cid, md5(string_agg(word, ' ' ORDER BY i)) AS fp
  FROM c GROUP BY doc_id, cid
), per_doc AS (
  SELECT fp, doc_id, COUNT(*) AS n FROM chunks GROUP BY fp, doc_id
)
SELECT fp, CAST(SUM(n) AS BIGINT) AS n_occ, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM per_doc GROUP BY fp HAVING COUNT(*) >= 2
ORDER BY fp
"""


def sorted_neighborhood_pairs(
    sf_dir: str,
    window: int = 10,
    dice_pct: int = 80,
    block_size: "int | None" = None,
) -> pd.DataFrame:
    """Sorted-neighborhood (merge/purge, Hernández & Stolfo SIGMOD'95)
    near-dup candidate generation: sort the corpus by a blocking key
    (here the raw text, doc_id tie-break), slide a ``window``-row window
    over the GLOBAL order, and keep pairs whose distinct-word Dice
    coefficient clears ``dice_pct``/100. The third blocking strategy in
    this family — rank-adjacency, vs set-overlap banding (MinHash/prefix
    filter) and deletion neighborhoods (SymSpell): cost is exactly
    N×window comparisons by construction, the sort clusters shared-prefix
    records, and recall is tunable by window, not by similarity algebra.

    Distributed shape (the cross-boundary window pattern): one
    :func:`global_rank` pass (sampled range exchange — no global sort),
    ranks bucketed into ``block_size`` runs, and each bucket's FIRST
    ``window`` rows replicated to the previous bucket so every forward
    window is complete inside one partition; a row only ORIGINATES pairs
    in its home bucket, so no pair is emitted twice. Driver state is the
    rank machinery's O(num_partitions) boundary frame; the output is
    candidate-bounded (≤ N×window rows before the verify cut).

    The verify predicate is pure-integer (``100·2·|A∩B| ≥ dice_pct·(|A|+|B|)``)
    so both engines cut identically — no float Dice ever exists.
    """
    from xmlschema_ray.ops.relational import (
        derive_num_partitions,
        global_rank,
        hash_partition_apply,
        to_pandas_with_schema,
    )

    template = pd.DataFrame(
        {
            "doc_a": pd.array([], dtype="int64"),
            "doc_b": pd.array([], dtype="int64"),
            "shared_words": pd.array([], dtype="int64"),
        }
    )
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])
    ranked, total = global_rank(ds, ["text", "doc_id"], rank_col="__rk")
    if total == 0:
        return template
    block = block_size or max(2 * window, -(-total // derive_num_partitions()))

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        rk = b["__rk"].to_numpy()
        g = (rk - 1) // block
        b = b.assign(__g=g)
        pre = ((rk - 1) % block < window) & (g > 0)
        if pre.any():
            rep = b.loc[pre].assign(__g=g[pre] - 1)
            b = pd.concat([b, rep], ignore_index=True)
        return b

    def per_part(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for gid, gdf in part.groupby("__g", sort=False):
            gdf = gdf.sort_values("__rk")
            rk = gdf["__rk"].to_numpy()
            n_own = int((((rk - 1) // block) == gid).sum())
            ids = gdf["doc_id"].to_numpy()
            # split(" ") + set() mirror the oracle's string_split+list_distinct
            words = [frozenset(t.split(" ")) for t in gdf["text"]]
            sizes = [len(w) for w in words]
            n = len(gdf)
            out_a: list = []
            out_b: list = []
            out_s: list = []
            for i in range(n_own):
                wa, na_ = words[i], sizes[i]
                for j in range(i + 1, min(i + window + 1, n)):
                    inter = len(wa & words[j])
                    if 200 * inter >= dice_pct * (na_ + sizes[j]):
                        out_a.append(ids[i])
                        out_b.append(ids[j])
                        out_s.append(inter)
            outs.append(
                pd.DataFrame(
                    {
                        "doc_a": pd.array(out_a, dtype="int64"),
                        "doc_b": pd.array(out_b, dtype="int64"),
                        "shared_words": pd.array(out_s, dtype="int64"),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else template

    pairs = hash_partition_apply(ranked.map_batches(explode, batch_format="pandas"), "__g", per_part)
    out = to_pandas_with_schema(pairs)
    if not len(out.columns):
        return template
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


SORTED_NEIGHBORHOOD_SQL = """
WITH t AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY text, doc_id) AS rk,
         list_distinct(string_split(text, ' ')) AS ws
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.ws, b.ws)) AS BIGINT) AS shared_words
FROM t a JOIN t b ON b.rk > a.rk AND b.rk <= a.rk + 10
WHERE 200 * len(list_intersect(a.ws, b.ws)) >= 80 * (len(a.ws) + len(b.ws))
ORDER BY doc_a, doc_b
"""


ORACLES: Dict[str, str] = {
    "exact_dedup": EXACT_DEDUP_SQL,
    "cdc_boilerplate_chunks": CDC_BOILERPLATE_SQL,
    "ngram_jaccard_pairs": NGRAM_JACCARD_SQL,
    "prefix_jaccard_pairs": PREFIX_JACCARD_SQL,
    "embedding_dup_pairs": EMBEDDING_DUP_SQL,
    "simhash_pairs": SIMHASH_SQL,
    "simhash_clusters": SIMHASH_CLUSTERS_SQL,
    "minhash_lsh_dedup": MINHASH_SQL,
    "leakage_safe_split": LEAKAGE_SPLIT_SQL,
    "dedup_keep_best": DEDUP_KEEP_BEST_SQL,
    "cross_source_dup_matrix": CROSS_SOURCE_DUP_SQL,
    "embedding_dup_pairs_ivf": EMBEDDING_DUP_IVF_SQL,
    "semantic_dedup": SEMANTIC_DEDUP_SQL,
    "substring_dup_pairs": SUBSTRING_DUP_SQL,
    "winnowed_dup_pairs": WINNOWED_DUP_SQL,
    "strip_dup_spans": STRIP_DUP_SPANS_SQL,
    "incremental_dedup": INCREMENTAL_DEDUP_SQL,
    "sorted_neighborhood_pairs": SORTED_NEIGHBORHOOD_SQL,
}

QUERIES = {
    "exact_dedup": exact_dedup,
    "cdc_boilerplate_chunks": cdc_boilerplate_chunks,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "prefix_jaccard_pairs": prefix_jaccard_pairs,
    "minhash_lsh_dedup": minhash_lsh_dedup,
    "leakage_safe_split": leakage_safe_split,
    "dedup_keep_best": dedup_keep_best,
    "cross_source_dup_matrix": cross_source_dup_matrix,
    "simhash_pairs": simhash_pairs,
    "simhash_clusters": simhash_clusters,
    "embedding_dup_pairs": embedding_dup_pairs,
    "embedding_dup_pairs_ivf": embedding_dup_pairs_ivf,
    "semantic_dedup": semantic_dedup,
    "substring_dup_pairs": substring_dup_pairs,
    "winnowed_dup_pairs": winnowed_dup_pairs,
    "strip_dup_spans": strip_dup_spans,
    "incremental_dedup": incremental_dedup,
    "sorted_neighborhood_pairs": sorted_neighborhood_pairs,
}
