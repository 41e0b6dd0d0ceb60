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

import re
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from xmlschema_ray.engine.stats import hash64
from xmlschema_ray.functions import hashing as H
from xmlschema_ray.pipelines.common import table_path

_WS = re.compile(r"\s+")


def exact_dedup(sf_dir: str) -> pd.DataFrame:
    """One row per distinct text: (keep_id = min doc_id, n = multiplicity).

    Skew-safe combiner shape: per-batch partials collapse each distinct
    text to ONE ``(text, min_id, n)`` row before the shuffle, so a text
    duplicated across half the corpus ships #batches rows, not #rows
    (the Counter-partial shape of the reference's identity machinery,
    ``validators/identities.py:198-221``). Grouping by the actual text
    keeps the result hash-collision-proof.
    """
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def batch_partial(batch: pd.DataFrame) -> pd.DataFrame:
        gb = batch.groupby("text", sort=False)["doc_id"]
        return pd.DataFrame(
            {"min_id": gb.min(), "n": gb.size().astype("int64")}
        ).reset_index()

    def merge_partition(part: pd.DataFrame) -> pd.DataFrame:
        gb = part.groupby("text", sort=False)
        return pd.DataFrame(
            {"keep_id": gb["min_id"].min(), "n": gb["n"].sum().astype("int64")}
        ).reset_index(drop=True)

    from xmlschema_ray.ops.relational import hash_partition_apply

    out = hash_partition_apply(
        ds.map_batches(batch_partial, batch_format="pandas"), "text", merge_partition
    ).to_pandas()
    return out.sort_values("keep_id").reset_index(drop=True)


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


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.9):
    """Exact word-set Jaccard near-dup pairs (a < b, jac >= threshold).

    Corpus word-sets broadcast once (``ray.put``); stateless tasks compare
    each batch's docs against every corpus doc with a greater doc_id."""
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


def minhash_lsh_dedup(
    sf_dir: str,
    shingle_n: int = 3,
    n_perm: int = 128,
    n_bands: int = 32,
    threshold: float = 0.5,
) -> pd.DataFrame:
    """MinHash-LSH near-dup clusters: (doc_id, cluster_root).

    Pipeline shape (ray_guide near-dup pattern): per-batch signatures →
    explode (band_hash, doc_id) → ``groupby(band_hash)`` (the only shuffle)
    → within-bucket candidate pairs → exact-Jaccard verify against
    broadcast shingle sets → min-label connected components. Rows-only
    check (signature construction is implementation-defined).
    """
    a, b = H.minhash_params(n_perm)
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def band_rows(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack(
            [H.minhash_signature(H.shingle_hashes(t, shingle_n), a, b) for t in batch["text"]]
        )
        bands = H.band_hash_matrix(sigs, n_bands)  # (n, n_bands)
        n = len(batch)
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

    from xmlschema_ray.ops.relational import hash_partition_apply

    cand = (
        hash_partition_apply(
            ds.map_batches(band_rows, batch_format="pandas"), "band_hash", bucket_pairs
        )
        .to_pandas()
        .drop_duplicates()
    )

    # verify candidates with exact shingle Jaccard (broadcast sets)
    def shingle_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "sh": [H.shingle_hashes(t, shingle_n).tobytes() for t in batch["text"]],
            }
        )

    srows = ds.map_batches(shingle_rows, batch_format="pandas").to_pandas()
    sets = {
        int(d): np.frombuffer(bts, dtype=np.uint64) for d, bts in zip(srows["doc_id"], srows["sh"])
    }
    verified = [
        (int(x), int(y))
        for x, y in zip(cand["a"], cand["b"])
        if H.jaccard(sets[int(x)], sets[int(y)]) >= threshold
    ]

    # connected components: union-find on the driver for small pair sets,
    # distributed min-label propagation beyond (ops.graph)
    from xmlschema_ray.ops.graph import connected_components_distributed, union_find

    nodes = srows["doc_id"].to_numpy(dtype=np.int64)
    if len(verified) <= 100_000:
        roots = union_find(nodes, verified)
        out = pd.DataFrame(
            sorted(roots.items()), columns=["doc_id", "cluster_root"]
        ).astype("int64")
    else:  # pragma: no cover - exercised via ops.graph unit test
        edges = rd.from_pandas(pd.DataFrame(verified, columns=["a", "b"]).astype("int64"))
        cc = connected_components_distributed(edges, nodes)
        out = cc.rename(columns={"node": "doc_id", "root": "cluster_root"}).sort_values("doc_id")
        out = out.reset_index(drop=True).astype("int64")
    return out


# -- SimHash --------------------------------------------------------------


def simhash_pairs(sf_dir: str, max_hamming: int = 8) -> pd.DataFrame:
    """SimHash near-dup pairs (a < b, hamming <= k): 4×16-bit band
    bucketing generates candidates (any pair within Hamming 3 of 64 bits
    shares ≥1 of 4 bands; wider distances are best-effort), then exact
    Hamming verify. Rows-only check."""
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def sim_rows(batch: pd.DataFrame) -> pd.DataFrame:
        hs = []
        for t in batch["text"]:
            words = np.array(_WS.split(t.strip()), dtype=object)
            hs.append(H.simhash64(hash64(words)))
        sh = np.array(hs, dtype=np.uint64)
        out = {"doc_id": batch["doc_id"].to_numpy(), "simhash": sh}
        for bi in range(4):
            out[f"band{bi}"] = ((sh >> np.uint64(16 * bi)) & np.uint64(0xFFFF)).astype(np.int64)
        return pd.DataFrame(out)

    rows = ds.map_batches(sim_rows, batch_format="pandas").to_pandas()
    sim_by_id = dict(zip(rows["doc_id"].astype(int), rows["simhash"]))
    cand = set()
    for bi in range(4):
        for _, g in rows.groupby(f"band{bi}"):
            ids = np.sort(g["doc_id"].to_numpy())
            if len(ids) > 1:
                ia, ib = np.triu_indices(len(ids), k=1)
                cand.update(zip(ids[ia].tolist(), ids[ib].tolist()))
    out = [
        (x, y, int(H.hamming64(np.array([sim_by_id[x]], dtype=np.uint64), sim_by_id[y])[0]))
        for x, y in sorted(cand)
    ]
    df = pd.DataFrame(out, columns=["doc_id_a", "doc_id_b", "hamming"])
    df = df[df["hamming"] <= max_hamming].reset_index(drop=True)
    return df.astype({"doc_id_a": "int64", "doc_id_b": "int64", "hamming": "int64"})


# -- embedding cosine near-dup -------------------------------------------


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.8):
    """Embedding-cosine near-dup pairs vs broadcast normalized matrix."""
    from xmlschema_ray.functions.vector import normalize_rows

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

    out = tbl.map_batches(cosine_pairs, batch_format="pandas").to_pandas()
    if out.empty:  # all-empty blocks lose the schema through to_pandas
        out = pd.DataFrame(
            {"vec_id_a": pd.array([], dtype="int64"), "vec_id_b": pd.array([], dtype="int64")}
        )
    return out.sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)


EMBEDDING_DUP_SQL = """
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id AND list_cosine_similarity(a.embedding, b.embedding) >= 0.8
"""


ORACLES: Dict[str, str] = {
    "exact_dedup": EXACT_DEDUP_SQL,
    "ngram_jaccard_pairs": NGRAM_JACCARD_SQL,
    "embedding_dup_pairs": EMBEDDING_DUP_SQL,
}

QUERIES = {
    "exact_dedup": exact_dedup,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "minhash_lsh_dedup": minhash_lsh_dedup,
    "simhash_pairs": simhash_pairs,
    "embedding_dup_pairs": embedding_dup_pairs,
}
