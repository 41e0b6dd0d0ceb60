"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k (oracle-checked; float64 matmul against a
broadcast query matrix) and a hyperplane-LSH-bucketed variant (the scale
path: candidates restricted to the query's bucket; recall < 1 ⇒ rows-only).
Scores are exported as ``cos_e6 = floor(cos * 1e6 + 0.5)`` integers so the
driver's value-hash compare is robust to float formatting.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from xmlschema_ray.functions.vector import (
    batch_cosine_topk,
    hyperplane_bucket,
    hyperplane_planes,
    normalize_rows,
)
from xmlschema_ray.ops.sample import seeded_embedding_sample
from xmlschema_ray.pipelines.common import table_path

N_QUERIES = 5
TOP_K = 10


def _query_matrix(sf_dir: str):
    q = (
        rd.read_parquet(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
        .filter(expr=f"vec_id < {N_QUERIES}")
        .to_pandas()
        .sort_values("vec_id")
    )
    return q["vec_id"].to_numpy(), np.stack(q["embedding"].to_numpy()).astype(np.float64)


# past this corpus size the k×#batches×#queries partial stream is merged
# DISTRIBUTED (query-keyed exchange → exact per-query top-k → k×Q-row
# collect) instead of concatenated on the driver; below it the driver
# concat is faster and the partial stream is a few hundred rows. Same
# adaptive-plan pattern as the engine's driver_threshold_bytes.
KNN_DISTRIBUTED_THRESHOLD_BYTES = 256 << 20


def _reduce_query_topk(
    partials: "rd.Dataset",
    k: int,
    score_col: str,
    distributed: bool,
) -> pd.DataFrame:
    """Per-query exact top-k over a partial-top-k stream.

    Driver path: one concat + groupby-head (partials are ≤ k×#batches×Q
    rows — fine at bench scale). Distributed path: the per-batch
    groupby-head is an associative combiner, so a query-keyed
    :func:`hash_partition_apply` produces the EXACT per-query top-k with
    one tiny exchange and the driver collects only k×Q rows regardless of
    batch count."""
    from xmlschema_ray.ops.relational import hash_partition_apply, to_pandas_with_schema

    by = ["query_id", score_col, "vec_id"]
    asc = [True, False, True]

    def head_per_query(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(by, ascending=asc, kind="mergesort")
            .groupby("query_id", sort=False)
            .head(k)
        )

    if distributed:
        merged = to_pandas_with_schema(
            hash_partition_apply(partials, "query_id", head_per_query)
        )
    else:
        merged = partials.to_pandas()
    return (
        merged.sort_values(by, ascending=asc, kind="mergesort")
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )


def knn_cosine(sf_dir: str, k: int = TOP_K) -> pd.DataFrame:
    """Exact top-k neighbors per query: per-batch partial top-k (numpy
    matmul vs broadcast queries), then an adaptive merge — driver concat
    at toy scale, query-keyed distributed reduce past
    ``KNN_DISTRIBUTED_THRESHOLD_BYTES`` (driver collect bounded at k×Q
    rows at any corpus size)."""
    q_ref = ray.put(_query_matrix(sf_dir))
    ds = rd.read_parquet(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    state: dict = {}

    def topk_partial(batch: pd.DataFrame) -> pd.DataFrame:
        q = state.get("q")
        if q is None:
            q = state["q"] = ray.get(q_ref)
        qids, qmat = q
        vecs = np.stack(batch["embedding"].to_numpy())
        ids = batch["vec_id"].to_numpy()
        qi, vi, cos = batch_cosine_topk(vecs, ids, qmat, k)
        return pd.DataFrame(
            {
                "query_id": pd.array(qids[qi], dtype="int64"),
                "vec_id": pd.array(vi, dtype="int64"),
                "cos_e6": pd.array(np.floor(cos * 1e6 + 0.5).astype(np.int64), dtype="int64"),
            }
        )

    partials = ds.map_batches(topk_partial, batch_format="pandas")
    distributed = (
        os.path.getsize(table_path(sf_dir, "embeddings")) > KNN_DISTRIBUTED_THRESHOLD_BYTES
    )
    out = _reduce_query_topk(partials, k, "cos_e6", distributed)
    # Export ids only: the float cosine differs from the oracle by ~1e-15
    # (summation order), which can flip a fixed-point digit; the RANKING is
    # stable because neighboring scores are far apart relative to 1e-15.
    return out[["query_id", "vec_id"]]


KNN_SQL = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES})
SELECT q.qid AS query_id, e.vec_id
FROM embeddings e, q
QUALIFY row_number() OVER (
  PARTITION BY q.qid
  ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id
) <= {TOP_K}
ORDER BY 1, 2
"""


from xmlschema_ray.pipelines.common import ORACLE_DUMP_DIR, oracle_dump as _dump


def knn_lsh(
    sf_dir: str, k: int = TOP_K, n_planes: int = 8, oracle_dump: bool = True
) -> pd.DataFrame:
    """LSH-bucketed ANN: hyperplane sign buckets on both corpus and
    queries; candidates = same-bucket vectors only. At scale the bucket
    column is the shuffle key.

    Oracle: the per-vector bucket assignments are dumped to parquet and the
    DuckDB SQL (KNN_LSH_SQL) recomputes the bucket-restricted exact top-k
    from them — the candidate pruning + ranking is fully cross-checked; the
    hyperplane hashing itself is implementation-defined (like MinHash)."""
    qids, qmat = _query_matrix(sf_dir)
    dim = qmat.shape[1]
    planes = hyperplane_planes(dim, n_planes)
    qbuckets = hyperplane_bucket(qmat, planes)
    q_ref = ray.put((qids, normalize_rows(qmat), qbuckets))
    state: dict = {}

    def bucket_topk(batch: pd.DataFrame) -> pd.DataFrame:
        q = state.get("q")
        if q is None:
            q = state["q"] = ray.get(q_ref)
        b_qids, b_qmat, b_qbuckets = q
        vecs = np.stack(batch["embedding"].to_numpy())
        buckets = hyperplane_bucket(vecs, planes)
        nvecs = normalize_rows(vecs)
        frames = []
        for qi, (qb, qv) in enumerate(zip(b_qbuckets, b_qmat)):
            m = buckets == qb
            if not m.any():
                continue
            cos = nvecs[m] @ qv
            ids = batch["vec_id"].to_numpy()[m]
            order = np.argsort(-cos)[:k]
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": pd.array([b_qids[qi]] * len(order), dtype="int64"),
                        "vec_id": pd.array(ids[order], dtype="int64"),
                        "cos": cos[order],
                    }
                )
            )
        if frames:
            return pd.concat(frames, ignore_index=True)
        return pd.DataFrame(
            {
                "query_id": pd.array([], dtype="int64"),
                "vec_id": pd.array([], dtype="int64"),
                "cos": pd.array([], dtype="float64"),
            }
        )

    ds = rd.read_parquet(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    if oracle_dump:

        def assign_buckets(batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack(batch["embedding"].to_numpy())
            return pd.DataFrame(
                {
                    "vec_id": pd.array(batch["vec_id"].to_numpy(), dtype="int64"),
                    "bucket": pd.array(hyperplane_bucket(vecs, planes), dtype="int64"),
                }
            )

        _dump(ds.map_batches(assign_buckets, batch_format="pandas"), "knn_lsh_buckets")
    partials = ds.map_batches(bucket_topk, batch_format="pandas")
    distributed = (
        os.path.getsize(table_path(sf_dir, "embeddings")) > KNN_DISTRIBUTED_THRESHOLD_BYTES
    )
    out = _reduce_query_topk(partials, k, "cos", distributed)
    # ids only: float cosines differ from the oracle at the last ulp
    # (summation order); the ranking is stable (same argument as knn_cosine)
    return out[["query_id", "vec_id"]].sort_values(["query_id", "vec_id"]).reset_index(drop=True)


KNN_LSH_SQL = f"""
WITH vb AS (
  SELECT vec_id, bucket FROM read_parquet('{ORACLE_DUMP_DIR}/knn_lsh_buckets/*.parquet')
), q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}
), qb AS (
  SELECT q.qid, q.qe, vb.bucket FROM q JOIN vb ON vb.vec_id = q.qid
)
SELECT qb.qid AS query_id, e.vec_id AS vec_id
FROM embeddings e
JOIN vb ON vb.vec_id = e.vec_id
JOIN qb ON vb.bucket = qb.bucket
QUALIFY row_number() OVER (
  PARTITION BY qb.qid
  ORDER BY list_cosine_similarity(e.embedding, qb.qe) DESC, e.vec_id
) <= {TOP_K}
ORDER BY 1, 2
"""


def build_ivf_index(
    sf_dir: str,
    index_dir: str,
    n_centroids: int = 16,
    sample_size: int = 4096,
) -> np.ndarray:
    """Write the embeddings corpus BUCKET-PARTITIONED by nearest centroid.

    The 100-TB ANN corpus layout: one hive partition (``centroid=K/``) per
    inverted list, so a query reads ONLY its probed buckets off storage
    instead of streaming (or broadcasting) the whole corpus. The build is
    one assign pass + one partitioned write; the directory is produced
    atomically (tmp + rename, with the centroid matrix saved alongside) so
    an interrupted build is restarted, never half-read. Returns the
    centroid matrix.
    """
    import shutil

    from xmlschema_ray.functions.vector import ivf_assign, kmeans_fit

    cent_path = os.path.join(index_dir, "centroids.npy")
    if os.path.exists(cent_path):
        return np.load(cent_path)
    ds = rd.read_parquet(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    sample = seeded_embedding_sample(ds, sample_size)
    centroids = kmeans_fit(sample, k=n_centroids)
    cent_ref = ray.put(centroids)
    state: dict = {}

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        c = state.get("c")
        if c is None:
            c = state["c"] = ray.get(cent_ref)
        batch = batch.copy(deep=False)
        batch["centroid"] = ivf_assign(np.stack(batch["embedding"].to_numpy()), c)
        return batch

    tmp = index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.dirname(index_dir) or ".", exist_ok=True)
    ds.map_batches(assign, batch_format="pandas").write_parquet(
        tmp, partition_cols=["centroid"]
    )
    np.save(os.path.join(tmp, "centroids.npy"), centroids)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.replace(tmp, index_dir)
    return centroids


# corpora past this size get (or reuse) a bucket-partitioned index under
# /tmp so the probed-bucket reads replace whole-corpus streaming — the
# same adaptive-plan pattern as the engine's driver_threshold_bytes
IVF_INDEX_THRESHOLD_BYTES = 256 << 20


def knn_ivf(
    sf_dir: str,
    k: int = TOP_K,
    n_centroids: int = 16,
    n_probe: int = 6,
    sample_size: int = 4096,
    oracle_dump: bool = True,
    index_dir: "str | None" = None,
) -> pd.DataFrame:
    """IVF-bucketed ANN — the scale path for similarity search.

    Driver fits spherical k-means centroids on a SAMPLE; the broadcast
    model is ONLY (queries, centroids, probe sets) — never the corpus.
    Per batch, vectors assign to their nearest centroid with one matmul
    and each query only scores vectors whose centroid is in its
    ``n_probe`` closest centroids.

    Physical plans: small corpora stream every batch and prune by
    assignment in compute; past ``IVF_INDEX_THRESHOLD_BYTES`` (or when
    ``index_dir`` is passed) the corpus is laid out bucket-partitioned by
    :func:`build_ivf_index` and the scan reads ONLY the union of the
    queries' probed buckets — IO-level pruning. A forced-path test proves
    both plans produce identical rows.

    Oracle: the per-vector centroid assignments and per-query probe sets
    are dumped to parquet; KNN_IVF_SQL recomputes the probe-restricted
    exact top-k from them (candidate pruning + ranking fully checked; the
    k-means fit itself is implementation-defined).
    """
    from xmlschema_ray.functions.vector import ivf_assign, kmeans_fit

    qids, qmat = _query_matrix(sf_dir)
    if index_dir is None and (
        os.path.getsize(table_path(sf_dir, "embeddings")) > IVF_INDEX_THRESHOLD_BYTES
    ):
        index_dir = os.path.join(
            "/tmp/xmlschema_ray_ivf", os.path.basename(os.path.normpath(sf_dir))
        )
    if index_dir is not None:
        centroids = build_ivf_index(
            sf_dir, index_dir, n_centroids=n_centroids, sample_size=sample_size
        )
        n_centroids = len(centroids)
        nq0 = normalize_rows(qmat)
        probed = np.unique(
            np.argsort(-(nq0 @ centroids.T), axis=1)[:, :n_probe].reshape(-1)
        )
        import glob as _glob

        paths = [
            f
            for c in probed
            for f in sorted(
                _glob.glob(os.path.join(index_dir, f"centroid={int(c)}", "*.parquet"))
            )
        ]
        ds = rd.read_parquet(paths, columns=["vec_id", "embedding"])
    else:
        ds = rd.read_parquet(
            table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
        )
        sample = seeded_embedding_sample(ds, sample_size)
        centroids = kmeans_fit(sample, k=n_centroids)
    nq = normalize_rows(qmat)
    probe_sets = np.argsort(-(nq @ centroids.T), axis=1)[:, :n_probe]  # (q, n_probe)
    model_ref = ray.put((qids, nq, centroids, probe_sets))
    state: dict = {}

    def ivf_topk(batch: pd.DataFrame) -> pd.DataFrame:
        m = state.get("m")
        if m is None:
            m = state["m"] = ray.get(model_ref)
        b_qids, b_nq, b_cent, b_probe = m
        vecs = np.stack(batch["embedding"].to_numpy())
        assign = ivf_assign(vecs, b_cent)
        nvecs = normalize_rows(vecs)
        ids = batch["vec_id"].to_numpy()
        frames = []
        for qi in range(len(b_qids)):
            # O(n) lookup-table membership: np.isin against a small probe
            # set degrades to an elementwise sweep per probe
            lut = np.zeros(len(b_cent), dtype=bool)
            lut[b_probe[qi]] = True
            mask = lut[assign]
            if not mask.any():
                continue
            cos = nvecs[mask] @ b_nq[qi]
            cand_ids = ids[mask]
            order = np.argsort(-cos)[:k]
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": pd.array([b_qids[qi]] * len(order), dtype="int64"),
                        "vec_id": pd.array(cand_ids[order], dtype="int64"),
                        "cos": cos[order],
                    }
                )
            )
        if frames:
            return pd.concat(frames, ignore_index=True)
        return pd.DataFrame(
            {
                "query_id": pd.array([], dtype="int64"),
                "vec_id": pd.array([], dtype="int64"),
                "cos": pd.array([], dtype="float64"),
            }
        )

    if oracle_dump:

        def assign_fn(batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack(batch["embedding"].to_numpy())
            return pd.DataFrame(
                {
                    "vec_id": pd.array(batch["vec_id"].to_numpy(), dtype="int64"),
                    "centroid": pd.array(ivf_assign(vecs, centroids), dtype="int64"),
                }
            )

        _dump(ds.map_batches(assign_fn, batch_format="pandas"), "knn_ivf_assign")
        probe_rows = pd.DataFrame(
            {
                "query_id": pd.array(np.repeat(qids, n_probe), dtype="int64"),
                "centroid": pd.array(probe_sets.reshape(-1), dtype="int64"),
            }
        )
        _dump(rd.from_pandas(probe_rows), "knn_ivf_probes")

    partials = ds.map_batches(ivf_topk, batch_format="pandas").to_pandas()
    out = (
        partials.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    return out[["query_id", "vec_id"]].sort_values(["query_id", "vec_id"]).reset_index(drop=True)


KNN_IVF_SQL = f"""
WITH va AS (
  SELECT vec_id, centroid FROM read_parquet('{ORACLE_DUMP_DIR}/knn_ivf_assign/*.parquet')
), probes AS (
  SELECT query_id, centroid FROM read_parquet('{ORACLE_DUMP_DIR}/knn_ivf_probes/*.parquet')
), q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}
)
SELECT p.query_id AS query_id, e.vec_id AS vec_id
FROM embeddings e
JOIN va ON va.vec_id = e.vec_id
JOIN probes p ON p.centroid = va.centroid
JOIN q ON q.qid = p.query_id
QUALIFY row_number() OVER (
  PARTITION BY p.query_id
  ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id
) <= {TOP_K}
ORDER BY 1, 2
"""


# -- embedding clustering ------------------------------------------------


def embedding_kmeans(
    sf_dir: str, n_clusters: int = 8, sample_size: int = 4096, oracle_dump: bool = True
) -> pd.DataFrame:
    """Corpus clustering summary: spherical k-means fit on a driver
    SAMPLE (the broadcast model), one assignment matmul per batch, then
    per-cluster count + representative (member closest to the centroid,
    tiebreak lowest vec_id) via per-batch partials merged associatively —
    cluster-cardinality-sized state everywhere.

    Oracle: assignments + centroid vectors are dumped; DuckDB recounts the
    clusters and re-derives each representative by ranking its OWN cosine
    scores (ranking-based compare, robust to last-ulp float differences —
    the ``knn_ivf`` dumped-state pattern)."""
    from xmlschema_ray.functions.vector import ivf_assign, kmeans_fit
    from xmlschema_ray.ops.relational import hash_partition_apply

    ds = rd.read_parquet(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    sample = seeded_embedding_sample(ds, sample_size)
    centroids = kmeans_fit(sample, k=n_clusters)
    cent_ref = ray.put(centroids)
    state: dict = {}

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = state.get("c")
        if c is None:
            c = state["c"] = ray.get(cent_ref)
        vecs = normalize_rows(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        sims = vecs @ c.T
        cl = sims.argmax(axis=1)
        best = sims[np.arange(len(cl)), cl]
        vids = batch["vec_id"].to_numpy()
        df = pd.DataFrame({"cluster": cl.astype(np.int64), "vec_id": vids, "sim": best})
        # one row per cluster per batch: count + local argmax(sim, -vec_id)
        df = df.sort_values(["cluster", "sim", "vec_id"], ascending=[True, False, True])
        head = df.drop_duplicates("cluster", keep="first")
        n = df.groupby("cluster", sort=False).size()
        return pd.DataFrame(
            {
                "cluster": head["cluster"].to_numpy(),
                "n_vecs": n.loc[head["cluster"]].to_numpy().astype(np.int64),
                "top_vec_id": head["vec_id"].to_numpy().astype(np.int64),
                "sim": head["sim"].to_numpy(),
            }
        )

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["cluster", "sim", "top_vec_id"], ascending=[True, False, True])
        head = part.drop_duplicates("cluster", keep="first")
        n = part.groupby("cluster", sort=False)["n_vecs"].sum()
        return pd.DataFrame(
            {
                "cluster": head["cluster"].to_numpy(),
                "n_vecs": n.loc[head["cluster"]].to_numpy().astype(np.int64),
                "top_vec_id": head["top_vec_id"].to_numpy().astype(np.int64),
            }
        )

    if oracle_dump:

        def assign_fn(batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack(batch["embedding"].to_numpy())
            return pd.DataFrame(
                {
                    "vec_id": pd.array(batch["vec_id"].to_numpy(), dtype="int64"),
                    "cluster": pd.array(ivf_assign(vecs, centroids), dtype="int64"),
                }
            )

        _dump(ds.map_batches(assign_fn, batch_format="pandas"), "kmeans_assign")
        cent_rows = pd.DataFrame(
            {
                "cluster": pd.array(np.arange(len(centroids)), dtype="int64"),
                "cvec": pd.Series(list(centroids), dtype=object),
            }
        )
        _dump(rd.from_pandas(cent_rows), "kmeans_centroids")

    partials = ds.map_batches(partial, batch_format="pandas")
    out = hash_partition_apply(partials, "cluster", merge).to_pandas()
    return out.sort_values("cluster").reset_index(drop=True)


EMBEDDING_KMEANS_SQL = f"""
WITH a AS (
  SELECT vec_id, cluster FROM read_parquet('{ORACLE_DUMP_DIR}/kmeans_assign/*.parquet')
), c AS (
  SELECT cluster, cvec FROM read_parquet('{ORACLE_DUMP_DIR}/kmeans_centroids/*.parquet')
), reps AS (
  SELECT a.cluster, e.vec_id,
         row_number() OVER (
           PARTITION BY a.cluster
           ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC, e.vec_id
         ) AS rn,
         COUNT(*) OVER (PARTITION BY a.cluster) AS n_vecs
  FROM embeddings e JOIN a ON a.vec_id = e.vec_id JOIN c ON c.cluster = a.cluster
)
SELECT cluster, CAST(n_vecs AS BIGINT) AS n_vecs, vec_id AS top_vec_id
FROM reps WHERE rn = 1
ORDER BY cluster
"""


def embedding_centroids_by_label(sf_dir: str) -> "rd.Dataset":
    """Per-label centroid of the embedding corpus as MERGEABLE INTEGER
    MOMENTS — the class-profile op (label prototypes for nearest-class-mean
    audits, classifier drift checks, per-class dispersion baselines).

    Scale shape: embeddings are scaled to int64 per dimension (the repo's
    ``floor(x*1e6 + 0.5)`` oracle idiom, ``pipelines/common.py``) so
    per-batch per-label vector sums are exact AND associative; each batch
    contributes ≤ |labels| × dim integer partial rows to ONE combiner
    exchange — label-cardinality, never corpus rows. The centroid is a
    single int64/int64 → double division per output row, so the result is
    bit-exact against the SQL oracle at any parallelism.
    """
    from xmlschema_ray.ops.relational import combiner_aggregate
    from xmlschema_ray.pipelines.common import scaled_int

    ds = rd.read_parquet(table_path(sf_dir, "embeddings"), columns=["label", "embedding"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        mat = scaled_int(np.stack(batch["embedding"].to_numpy()), 1_000_000.0)
        uniq, inv = np.unique(batch["label"].to_numpy(), return_inverse=True)
        k, d = len(uniq), mat.shape[1]
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, inv, mat)
        cnt = np.bincount(inv, minlength=k).astype(np.int64)
        return pd.DataFrame(
            {
                "label": np.repeat(uniq.astype(np.int64), d),
                "dim": np.tile(np.arange(d, dtype=np.int64), k),
                "n": np.repeat(cnt, d),
                "sum_scaled": sums.reshape(-1),
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    agg = combiner_aggregate(
        partials,
        ["label", "dim"],
        {"n": ("n", "sum"), "sum_scaled": ("sum_scaled", "sum")},
    )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b["centroid_scaled"] = b["sum_scaled"].to_numpy(np.float64) / b["n"].to_numpy(
            np.float64
        )
        return b[["label", "dim", "n", "sum_scaled", "centroid_scaled"]]

    return agg.map_batches(finalize, batch_format="pandas").sort(["label", "dim"])


EMBEDDING_CENTROIDS_SQL = """
WITH e AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS v
  FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) AS t(i)
)
SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(v) AS BIGINT) AS sum_scaled,
       CAST(SUM(v) AS DOUBLE) / COUNT(*) AS centroid_scaled
FROM e GROUP BY label, dim ORDER BY label, dim
"""


def _power_iterate(matvec, d: int, n_iter: int, tol: float):
    """Shared power-iteration driver: ``matvec(v) -> X'Xv``; returns
    (direction with largest-|coordinate| entry positive, eigenvalue)."""
    v = np.zeros(d, dtype=np.float64)
    v[0] = 1.0
    nrm = 0.0
    for _ in range(n_iter):
        g = matvec(v)
        nrm = float(np.linalg.norm(g))
        if nrm == 0.0:
            break
        v_new = g / nrm
        converged = abs(1.0 - abs(float(v_new @ v))) < tol
        v = v_new
        if converged:
            break
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    return v, nrm


_TC_SCALE = 10**6  # embedding quantization for the EXACT covariance path
_TC_ITERS = 60  # fixed iteration count (no data-dependent early exit)


from xmlschema_ray.pipelines.common import tdiv_int as _tdiv  # canonical helper


def _power_iterate_int(a_obj: "np.ndarray", d: int, n_iter: int):
    """EXACT scaled-integer power iteration (the ``logreg_train_orders``
    bit-exactness discipline): ``a_obj`` is the d×d X'X moment matrix in
    Python-int cells (embeddings quantized at ``_TC_SCALE``), iteration is
    ``v ← tdiv(Av · S, max|Av|)`` — max-abs normalization instead of an
    L2 norm so NO sqrt/libm enters; every op is arbitrary-precision
    integer arithmetic a SQL engine replays verbatim. Fixed ``n_iter``
    (identical sequences matter, not convergence detection — both engines
    land on the same vector even through truncation plateaus). Returns
    (v_scaled ints, eig_e6 int): sign fixed so the largest-|coordinate|
    entry (lowest dim on ties, numpy argmax convention) is positive;
    ``eig_e6`` = top eigenvalue of the TRUE (unscaled) X'X × 10⁶,
    truncated."""
    S = _TC_SCALE
    v = [0] * d
    v[0] = S
    for _ in range(n_iter):
        w = [int(sum(int(a_obj[i, j]) * v[j] for j in range(d))) for i in range(d)]
        m = max(abs(x) for x in w)
        if m == 0:
            break
        v = [_tdiv(x * S, m) for x in w]
    # numpy argmax convention: FIRST maximal |coordinate|
    best = max(range(d), key=lambda i: (abs(v[i]), -i))
    if v[best] < 0:
        v = [-x for x in v]
    w = [int(sum(int(a_obj[i, j]) * v[j] for j in range(d))) for i in range(d)]
    num = sum(vi * wi for vi, wi in zip(v, w))
    den = sum(vi * vi for vi in v)
    eig_e6 = _tdiv(num, den * S) if den else 0  # A is S²×true; ×1e6 out
    return v, eig_e6


def embedding_top_component(
    sf_dir: str,
    n_iter: int = 200,
    tol: float = 1e-12,
    covariance_dim_threshold: int = 1024,
) -> pd.DataFrame:
    """Top principal direction of the corpus embedding matrix's uncentered
    second moment X'X — the iterative-linear-algebra operator class (the
    spectral building block behind PCA whitening, embedding-quality
    probes, and the deflation loop for more components).

    ``n_iter`` / ``tol`` apply to the LARGE-d float matvec path only: the
    default covariance path runs the FIXED ``_TC_ITERS``-count integer
    iteration by design — the fixed count IS the hash-exact oracle
    contract (a data-dependent early exit would have to be replayed by
    the SQL side too).

    Adaptive physical plan on the embedding dimension:

    * d ≤ ``covariance_dim_threshold``: ONE streaming pass computes
      per-batch OUTER-PRODUCT partials over the ``_TC_SCALE``-quantized
      embeddings (d² int64 cells per batch — a mergeable EXACT moment
      reduce, never rows; int sums are order-independent, so the result is
      bit-identical at any parallelism), the driver folds the tiny d×d
      matrix into Python-int cells (no overflow at any corpus size) and
      power-iterates LOCALLY in exact scaled-integer arithmetic
      (:func:`_power_iterate_int`). HASH-EXACT SQL oracle: the oracle
      replays the identical quantization, moment sum and fixed-count
      integer iteration (``_embedding_top_component_sql``); the output
      floats are each one IEEE division of an exact int by 10⁶, identical
      in both engines.
    * large d: distributed FLOAT matvec loop — each iteration broadcasts
      the current d-vector (``ray.put``) and one pass reduces per-batch
      ``Xᵀ(Xv)`` d-vector partials (the distributed-SGD shape; pinned
      blocks so iterations don't re-read parquet). Early-exits on
      convergence since every extra iteration is a corpus pass. This path
      is float (d² int partials are exactly what it exists to avoid) —
      deterministic per environment but not oracle-exact; the forced-path
      test pins direction agreement with the exact plan.
    """
    ds = rd.read_parquet(table_path(sf_dir, "embeddings"), columns=["embedding"])
    d = len(ds.take(1)[0]["embedding"])

    if d <= covariance_dim_threshold:
        S = _TC_SCALE

        def cov_partial(batch: pd.DataFrame) -> pd.DataFrame:
            x = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            # refuse-loudly before silent corruption (the repo's zone-map/
            # temporal-guard discipline): NaN would cast to INT64_MIN with
            # only an invisible worker-side RuntimeWarning and fold
            # plausible-looking garbage into the moments; |x| > 64 could
            # overflow the per-batch int64 cell (rows·(64e6)² ≈ 4.2e18 at
            # 1024-row batches — under 2^63 with headroom)
            if not np.isfinite(x).all():
                raise ValueError(
                    "embedding_top_component: non-finite embedding element "
                    "(NaN/inf/null) — clean or impute before the exact "
                    "integer moment pass"
                )
            if np.abs(x).max() > 64.0:
                raise ValueError(
                    "embedding_top_component: |embedding| > 64 would overflow "
                    "the exact int64 moment partials at the 1e6 quantization — "
                    "rescale the vectors first"
                )
            e = np.floor(x * S + 0.5).astype(np.int64)
            c = e.T @ e  # |e| ≤ 64·S ⇒ per-batch cell ≤ rows·(64·S)² — exact int64
            return pd.DataFrame(
                {
                    "i": np.repeat(np.arange(d, dtype=np.int64), d),
                    "j": np.tile(np.arange(d, dtype=np.int64), d),
                    "c": c.reshape(-1),
                }
            )

        parts = ds.map_batches(cov_partial, batch_format="pandas").to_pandas()
        # Python-int cells: the TOTAL moment can pass 2^63 at corpus scale
        # even though a per-batch partial cannot
        a = np.zeros((d, d), dtype=object)
        np.add.at(
            a,
            (parts["i"].to_numpy(), parts["j"].to_numpy()),
            parts["c"].to_numpy().astype(object),
        )
        vi, eig_e6 = _power_iterate_int(a, d, _TC_ITERS)
        comp = np.array([x / float(S) for x in vi], dtype=np.float64)
        return pd.DataFrame(
            {
                "dim": np.arange(d, dtype=np.int64),
                "component": comp,
                "eigenvalue": np.float64(eig_e6) / 1e6,
            }
        )
    else:
        pinned = ds.materialize()  # iterations must not re-read parquet

        def matvec(vv: np.ndarray) -> np.ndarray:
            v_ref = ray.put(vv)

            def partial(batch: pd.DataFrame, _ref=v_ref) -> pd.DataFrame:
                w = ray.get(_ref)  # d floats, one fetch per task
                x = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
                g = x.T @ (x @ w)
                return pd.DataFrame({"dim": np.arange(len(g), dtype=np.int64), "g": g})

            p = pinned.map_batches(partial, batch_format="pandas").to_pandas()
            g = np.zeros(d, dtype=np.float64)
            np.add.at(g, p["dim"].to_numpy(), p["g"].to_numpy())
            return g

        v, lam = _power_iterate(matvec, d, n_iter, tol)

    out = pd.DataFrame({"dim": np.arange(d, dtype=np.int64), "component": v})
    out["eigenvalue"] = lam
    return out


def _embedding_top_component_sql(n_iter: int = _TC_ITERS) -> str:
    """HASH-EXACT oracle for :func:`embedding_top_component` (default
    covariance plan): replays the identical 10⁶ quantization, the exact
    integer moment sum (HUGEINT — order-independent), and the fixed-count
    scaled-integer power iteration as ``n_iter`` chained MATERIALIZED CTEs
    (DuckDB ``//`` truncates toward zero exactly like the Python
    ``_tdiv``). The output floats are each ONE IEEE division of an exact
    integer by 10⁶ — bit-identical across engines."""
    head = """WITH
e AS MATERIALIZED (
  SELECT vec_id, CAST(t.j AS BIGINT) AS j,
         CAST(floor(CAST(embedding[t.j] AS DOUBLE) * 1000000 + 0.5) AS HUGEINT) AS ev
  FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) AS t(j)
),
mom AS MATERIALIZED (
  SELECT a.j - 1 AS i, b.j - 1 AS jj, CAST(SUM(a.ev * b.ev) AS HUGEINT) AS c
  FROM e a JOIN e b USING (vec_id) GROUP BY 1, 2
),
it0 AS MATERIALIZED (
  SELECT i AS dim, CAST(CASE WHEN i = 0 THEN 1000000 ELSE 0 END AS HUGEINT) AS v
  FROM (SELECT DISTINCT i FROM mom)
)"""
    its = []
    for k in range(1, int(n_iter) + 1):
        # mx = 0 (A·v exactly zero — a degenerate corpus where the probed
        # dimension quantizes to all zeros) passes v through UNCHANGED:
        # the Python side BREAKS there, and since A·v stays zero for the
        # same v, pass-through over the remaining iterations is identical
        # to the break — and avoids the // 0 error
        its.append(
            f"""it{k} AS MATERIALIZED (
  SELECT dim, CASE WHEN mx = 0 THEN pv ELSE (w * 1000000) // mx END AS v
  FROM (
    SELECT p.dim, p.v AS pv, w.w, MAX(ABS(w.w)) OVER () AS mx
    FROM it{k - 1} p JOIN (
      SELECT m.i AS dim, SUM(m.c * p2.v) AS w
      FROM mom m JOIN it{k - 1} p2 ON m.jj = p2.dim GROUP BY m.i
    ) w USING (dim)
  )
)"""
        )
    tail = f"""sgn AS MATERIALIZED (
  SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS s
  FROM it{int(n_iter)} ORDER BY ABS(v) DESC, dim LIMIT 1
),
vs AS MATERIALIZED (SELECT dim, v * (SELECT s FROM sgn) AS v FROM it{int(n_iter)}),
wf AS MATERIALIZED (
  SELECT m.i AS dim, SUM(m.c * p.v) AS w FROM mom m JOIN vs p ON m.jj = p.dim GROUP BY m.i
),
eig AS MATERIALIZED (
  SELECT (SELECT SUM(vs.v * wf.w) FROM vs JOIN wf USING (dim))
         // ((SELECT SUM(v * v) FROM vs) * 1000000) AS e6
)
SELECT vs.dim AS dim,
       CAST(vs.v AS DOUBLE) / 1000000.0 AS component,
       CAST((SELECT e6 FROM eig) AS DOUBLE) / 1000000.0 AS eigenvalue
FROM vs ORDER BY dim"""
    return ",\n".join([head] + its + [tail])


EMBEDDING_TOP_COMPONENT_SQL = _embedding_top_component_sql()


def embedding_quantize_int8(sf_dir: str, levels: int = 255) -> pd.DataFrame:
    """Per-dimension min/max INT8 quantization of the embedding corpus —
    the vector-compression prep every serving/ANN stack runs before
    shipping embeddings (4× smaller than float32, 8× than float64; IVF/PQ
    distance kernels read the codes directly). Two passes, both mergeable:
    (1) per-dimension global min/max as d-row combiner partials (the
    exchange carries 64 rows per batch, never vectors); (2) the d-row
    scale table broadcasts by closure and every vector encodes in place —
    embarrassingly parallel, zero further exchanges.

    code = floor((v − mn) · levels / (mx − mn)) clamped to ``levels``,
    with constant dimensions (mx == mn) pinned to 0. Every step is IEEE
    double arithmetic in a FIXED expression order that the DuckDB oracle
    replays verbatim (float32 inputs widen exactly to double), so codes
    compare bit-for-bit — the compare proves the encode, not a tolerance.
    Output: per-vector code checksum + range (vec_id, code_sum, code_min,
    code_max) — corpus-row-sized, the compact end-to-end witness of all
    d·n codes.
    """
    from xmlschema_ray.ops.relational import combiner_aggregate, to_pandas_with_schema

    ds = rd.read_parquet(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def minmax_partial(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        d = mat.shape[1]
        return pd.DataFrame(
            {
                "dim": np.arange(d, dtype=np.int64),
                "mn": mat.min(axis=0),
                "mx": mat.max(axis=0),
            }
        )

    scale = to_pandas_with_schema(
        combiner_aggregate(
            ds.map_batches(minmax_partial, batch_format="pandas"),
            "dim",
            {"mn": ("mn", "min"), "mx": ("mx", "max")},
        )
    )
    if not len(scale):
        return pd.DataFrame(
            {
                "vec_id": pd.Series([], dtype=np.int64),
                "code_sum": pd.Series([], dtype=np.int64),
                "code_min": pd.Series([], dtype=np.int64),
                "code_max": pd.Series([], dtype=np.int64),
            }
        )
    scale = scale.sort_values("dim")
    mn = scale["mn"].to_numpy(np.float64)
    mx = scale["mx"].to_numpy(np.float64)
    span = mx - mn
    const = span == 0.0

    def encode(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        # FIXED op order replayed by the oracle: (v - mn) * levels / span
        with np.errstate(divide="ignore", invalid="ignore"):
            codes = np.floor((mat - mn) * float(levels) / span)
        codes = np.minimum(codes, float(levels))
        codes[:, const] = 0.0
        codes = codes.astype(np.int64)
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].to_numpy(np.int64),
                "code_sum": codes.sum(axis=1),
                "code_min": codes.min(axis=1),
                "code_max": codes.max(axis=1),
            }
        )

    out = to_pandas_with_schema(ds.map_batches(encode, batch_format="pandas"))
    return out.sort_values("vec_id").reset_index(drop=True).astype(
        {"vec_id": "int64", "code_sum": "int64", "code_min": "int64", "code_max": "int64"}
    )


EMBEDDING_QUANTIZE_SQL = """
WITH u AS (
  SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) AS t(i)
), s AS (
  SELECT dim, MIN(v) AS mn, MAX(v) AS mx FROM u GROUP BY dim
), c AS (
  SELECT u.vec_id,
         CASE WHEN s.mx = s.mn THEN 0
              ELSE CAST(LEAST(255.0, floor((u.v - s.mn) * 255.0 / (s.mx - s.mn))) AS BIGINT)
         END AS code
  FROM u JOIN s USING (dim)
)
SELECT vec_id, CAST(SUM(code) AS BIGINT) AS code_sum,
       CAST(MIN(code) AS BIGINT) AS code_min, CAST(MAX(code) AS BIGINT) AS code_max
FROM c GROUP BY vec_id ORDER BY vec_id
"""


def pq_ann_topk(
    sf_dir: str,
    m: int = 8,
    ks: int = 16,
    k: int = TOP_K,
    sample_size: int = 2048,
    oracle_dump: bool = True,
) -> pd.DataFrame:
    """PRODUCT-QUANTIZATION ANN (Jégou et al. 2011): the compression path
    that completes the ANN family — IVF prunes WHICH vectors to score,
    PQ compresses HOW each vector is scored. Each d-dim vector becomes m
    uint8 codes (one per subspace, nearest of ks codebook centroids), a
    64×float32 → 8-byte reduction; a query then scores the WHOLE corpus
    through an m×ks distance table + code lookups (ADC — asymmetric
    distance computation) without ever touching the original vectors.

    Everything after the codebook fit is INTEGER-EXACT: codebooks are
    quantized to scaled ints (the ``embedding_centroids_by_label``
    discipline), queries quantize with the same floor(x·1e6+0.5), so
    per-subspace distance tables, encode argmins and ADC sums are all
    int64 arithmetic — the DuckDB oracle recomputes distance tables and
    the full ADC top-k from the dumped codes + codebooks and compares
    HASH-EXACT (no float-rank caveat; the kmeans dumped-state pattern,
    strengthened from rank-robust to bit-exact). Encode correctness is
    pinned separately in tests (brute-force argmin; lossless round-trip
    when corpus rows ARE centroids).

    Scale: codebook fit on a cross-block seeded sample (driver-side,
    m·ks·(d/m) floats); encode is one broadcast + per-batch integer
    einsum, zero exchanges; query scoring is per-batch table lookups with
    k×Q-bounded partial top-k rows to the driver (the ``knn_cosine``
    merge contract)."""
    from xmlschema_ray.functions.vector import kmeans_fit_l2
    from xmlschema_ray.ops.sample import seeded_embedding_sample
    from xmlschema_ray.pipelines.common import scaled_int

    ds = rd.read_parquet(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    sample = seeded_embedding_sample(ds, sample_size)
    if not len(sample):
        return pd.DataFrame(
            {
                "query_vec_id": pd.Series([], dtype=np.int64),
                "rank": pd.Series([], dtype=np.int64),
                "vec_id": pd.Series([], dtype=np.int64),
                "adc_dist": pd.Series([], dtype=np.int64),
            }
        )
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"pq_ann_topk: dim {d} not divisible by m={m}")
    sub = d // m
    cb = np.stack(
        [
            scaled_int(kmeans_fit_l2(sample[:, j * sub : (j + 1) * sub], k=ks), 1_000_000.0)
            for j in range(m)
        ]
    )  # (m, ks, sub) int64
    # overflow lint: adc sums m·sub squared diffs of ≤2·maxabs magnitudes
    maxabs = max(int(np.abs(cb).max()), int(np.ceil(np.abs(sample).max() * 1e6 + 1)))
    if m * sub * (2 * maxabs) ** 2 >= 2**62:
        raise ValueError("pq_ann_topk: scaled values would overflow int64 adc sums")
    cb_ref = ray.put(cb)
    state: dict = {}

    def codes_of(mat_int: np.ndarray, cbl: np.ndarray) -> np.ndarray:
        codes = np.empty((len(mat_int), m), dtype=np.int64)
        for j in range(m):
            x = mat_int[:, j * sub : (j + 1) * sub]
            diff = x[:, None, :] - cbl[j][None]
            codes[:, j] = np.einsum("nks,nks->nk", diff, diff).argmin(axis=1)
        return codes

    qids, qmat = _query_matrix(sf_dir)
    qint = scaled_int(qmat, 1_000_000.0)  # (Q, d)
    # per-query distance tables (Q, m, ks): int64
    qsub = qint.reshape(len(qint), m, sub)
    dt = ((qsub[:, :, None, :] - cb[None]) ** 2).sum(axis=3)
    dt_ref = ray.put(dt)

    def topk_partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = state.get("cb")
        if c is None:
            c = state["cb"] = ray.get(cb_ref)
            state["dt"] = ray.get(dt_ref)
        t = state["dt"]
        mat = scaled_int(np.stack(batch["embedding"].to_numpy()), 1_000_000.0)
        ids = batch["vec_id"].to_numpy(np.int64)
        codes = codes_of(mat, c)
        rows = []
        for qi in range(len(qids)):
            adc = t[qi, np.arange(m)[None, :], codes].sum(axis=1)  # (n,)
            order = np.lexsort((ids, adc))[:k]
            rows.append(
                pd.DataFrame(
                    {
                        "query_vec_id": np.full(len(order), qids[qi], dtype=np.int64),
                        "vec_id": ids[order],
                        "adc_dist": adc[order],
                    }
                )
            )
        return pd.concat(rows, ignore_index=True)

    # driver merge bounded at k × Q rows per batch (toy corpora; the
    # knn_cosine distributed-reduce path is the >threshold route)
    parts = ds.map_batches(topk_partial, batch_format="pandas").to_pandas()
    out = []
    for qid, g in parts.groupby("query_vec_id", sort=True):
        g = g.sort_values(["adc_dist", "vec_id"], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g.insert(1, "rank", np.arange(1, len(g) + 1, dtype=np.int64))
        out.append(g)
    res = pd.concat(out, ignore_index=True).astype(
        {"query_vec_id": "int64", "rank": "int64", "vec_id": "int64", "adc_dist": "int64"}
    )

    if oracle_dump:

        def dump_codes(batch: pd.DataFrame) -> pd.DataFrame:
            c = state.get("cb")
            if c is None:
                c = state["cb"] = ray.get(cb_ref)
            mat = scaled_int(np.stack(batch["embedding"].to_numpy()), 1_000_000.0)
            ids = batch["vec_id"].to_numpy(np.int64)
            codes = codes_of(mat, c)
            return pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, m),
                    "sub": np.tile(np.arange(m, dtype=np.int64), len(ids)),
                    "code": codes.reshape(-1),
                }
            )

        _dump(ds.map_batches(dump_codes, batch_format="pandas"), "pq_codes")
        subs, codes_i, dims = np.meshgrid(
            np.arange(m, dtype=np.int64),
            np.arange(ks, dtype=np.int64),
            np.arange(sub, dtype=np.int64),
            indexing="ij",
        )
        _dump(
            rd.from_pandas(
                pd.DataFrame(
                    {
                        "sub": subs.reshape(-1),
                        "code": codes_i.reshape(-1),
                        "dim": dims.reshape(-1),
                        "c": cb.reshape(-1),
                    }
                )
            ),
            "pq_codebooks",
        )

    return res


PQ_ANN_TOPK_SQL = f"""
WITH cb AS (
  SELECT sub, code, dim, c FROM read_parquet('{ORACLE_DUMP_DIR}/pq_codebooks/*.parquet')
), codes AS (
  SELECT vec_id, sub, code FROM read_parquet('{ORACLE_DUMP_DIR}/pq_codes/*.parquet')
), q AS (
  SELECT vec_id AS qid,
         CAST((i - 1) // 8 AS BIGINT) AS sub,
         CAST((i - 1) % 8 AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS qv
  FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) AS t(i)
  WHERE vec_id < {{n_queries}}
), dt AS (
  SELECT q.qid, q.sub, cb.code, SUM((q.qv - cb.c) * (q.qv - cb.c)) AS dsub
  FROM q JOIN cb ON q.sub = cb.sub AND q.dim = cb.dim
  GROUP BY 1, 2, 3
), adc AS (
  SELECT dt.qid, codes.vec_id, CAST(SUM(dt.dsub) AS BIGINT) AS adc_dist
  FROM codes JOIN dt ON codes.sub = dt.sub AND codes.code = dt.code
  GROUP BY 1, 2
), r AS (
  SELECT qid, vec_id, adc_dist,
         row_number() OVER (PARTITION BY qid ORDER BY adc_dist, vec_id) AS rnk
  FROM adc
)
SELECT qid AS query_vec_id, CAST(rnk AS BIGINT) AS rank, vec_id, adc_dist
FROM r WHERE rnk <= {{k}}
ORDER BY query_vec_id, rank
""".format(n_queries=N_QUERIES, k=TOP_K)


# -- hybrid retrieval: BM25 ⊕ vector via reciprocal-rank fusion --------------


def hybrid_search_rrf(
    sf_dir: str, k: int = 20, pool: int = 100, rrf_c: int = 60
) -> pd.DataFrame:
    """Hybrid retrieval with RECIPROCAL-RANK FUSION (Cormack et al.
    SIGIR'09): a lexical BM25 leg over ``documents`` and a vector cosine
    leg over ``embeddings`` each produce a top-``pool`` ranking, fused as
    ``Σ 1/(rrf_c + rank)`` — the standard hybrid-search shape of a RAG
    retrieval stack, with no score normalization to get wrong.

    Scale shape: each leg is an independent DISTRIBUTED top-``pool``
    (per-batch local top-k partials → driver merge of ``pool × #blocks``
    rows — the repo's partial-top-k contract; the vector leg is the
    brute-force baseline and swaps for the IVF/LSH/PQ paths at corpus
    scale). Fusion itself touches ≤ 2·``pool`` rows — driver-side by
    construction, never fact-sized.

    Exactness: the BM25 total is summed in FIXED term order (left-assoc,
    matching the oracle's explicit ``+`` chain — the per-term log-free
    rational idf of ``bm25_scores``), so lexical ranks are bit-exact;
    vector ranks follow the knn-oracle convention (ranking-stable, vec_id
    tie-break); RRF then only touches INTEGER ranks. Rank columns export
    as float64-with-NaN (a doc can appear in one leg only — the DuckDB
    nullable-BIGINT ``.df()`` convention)."""
    from xmlschema_ray.pipelines.curation import _split_offsets
    from xmlschema_ray.pipelines.textstats import _BM25_B, _BM25_K1, _BM25_TERMS

    docs = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def per_doc(batch) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        offsets, flat = _split_offsets(batch["text"])
        row_idx = (
            np.searchsorted(offsets, np.arange(len(flat), dtype=np.int64), side="right")
            - 1
        )
        cols = {"doc_id": ids, "dl": np.diff(offsets).astype(np.int64)}
        for t in _BM25_TERMS:
            cols[f"tf_{t}"] = np.bincount(
                row_idx[flat == t], minlength=len(ids)
            ).astype(np.int64)
        return pd.DataFrame(cols)

    narrow = docs.map_batches(per_doc, batch_format="pyarrow").materialize()

    def stat_partial(batch: pd.DataFrame) -> pd.DataFrame:
        row = {"n": np.int64(len(batch)), "tot": batch["dl"].sum()}
        for t in _BM25_TERMS:
            row[f"df_{t}"] = np.int64((batch[f"tf_{t}"] > 0).sum())
        return pd.DataFrame([row])

    stats = narrow.map_batches(stat_partial, batch_format="pandas").to_pandas().sum()
    n_docs, tot = int(stats["n"]), int(stats["tot"])
    avgdl = np.float64(tot) / n_docs
    idf = {
        t: (n_docs - int(stats[f"df_{t}"]) + 0.5) / (int(stats[f"df_{t}"]) + 0.5)
        for t in _BM25_TERMS
    }

    def local_top(batch: pd.DataFrame) -> pd.DataFrame:
        dl = batch["dl"].to_numpy(np.int64)
        denom_tail = _BM25_K1 * (1 - _BM25_B + _BM25_B * dl / avgdl)
        total = np.zeros(len(batch), dtype=np.float64)
        for t in _BM25_TERMS:  # FIXED summation order — matches the SQL chain
            tf = batch[f"tf_{t}"].to_numpy(np.int64)
            s = np.where(
                tf > 0, idf[t] * (tf * (_BM25_K1 + 1)) / (tf + denom_tail), 0.0
            )
            total = total + s
        m = total > 0
        out = pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(np.int64)[m], "bm25": total[m]}
        )
        return out.sort_values(["bm25", "doc_id"], ascending=[False, True]).head(pool)

    lexp = narrow.map_batches(local_top, batch_format="pandas").to_pandas()
    lex = (
        lexp.sort_values(["bm25", "doc_id"], ascending=[False, True])
        .head(pool)
        .reset_index(drop=True)
    )
    lex["lex_rank"] = np.arange(1, len(lex) + 1, dtype=np.int64)

    emb = rd.read_parquet(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    qrow = emb.filter(expr="vec_id == 0").to_pandas()
    qmat = np.stack(qrow.sort_values("vec_id")["embedding"].to_numpy()).astype(np.float64)

    def vec_top(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        ids = batch["vec_id"].to_numpy(np.int64)
        _, vi, cos = batch_cosine_topk(vecs, ids, qmat, pool)
        return pd.DataFrame({"vec_id": vi, "cos": cos})

    vecp = emb.map_batches(vec_top, batch_format="pandas").to_pandas()
    vec = (
        vecp.sort_values(["cos", "vec_id"], ascending=[False, True])
        .head(pool)
        .reset_index(drop=True)
    )
    vec["vec_rank"] = np.arange(1, len(vec) + 1, dtype=np.int64)

    f = lex[["doc_id", "lex_rank"]].merge(
        vec[["vec_id", "vec_rank"]].rename(columns={"vec_id": "doc_id"}),
        on="doc_id",
        how="outer",
    )
    lr = f["lex_rank"].to_numpy(np.float64)
    vr = f["vec_rank"].to_numpy(np.float64)
    rrf = np.where(np.isnan(lr), 0.0, 1.0 / (rrf_c + lr)) + np.where(
        np.isnan(vr), 0.0, 1.0 / (rrf_c + vr)
    )
    f["rrf"] = rrf
    out = (
        f.sort_values(["rrf", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return out[["doc_id", "lex_rank", "vec_rank", "rrf"]]


# -- hard-negative mining (contrastive training pairs) -----------------------


def hard_negative_mining(
    sf_dir: str, k: int = 5, pool: int = 20, oracle_dump: bool = True
) -> pd.DataFrame:
    """Hard negatives for contrastive embedding training: each query's
    top-``pool`` cosine neighbors, with NEAR-DUPLICATES of the query
    excluded (same MinHash-LSH cluster — a near-dup ranked as a negative
    is a false negative that poisons the contrastive loss), keeping the
    ``k`` best survivors. The mining step of every embedding-model data
    pipeline, composed from the repo's retrieval + dedup machinery.

    Scale shape: the kNN leg is the per-batch partial-top-k contract
    (pool×#blocks driver merge; swaps for IVF/LSH at corpus scale); the
    dedup labels stay a DATASET and only the ≤ ``pool×Q + Q`` candidate
    ids' rows are filtered out of it (candidate-sized collect, never the
    corpus). ``vec_id`` is the document key (one embedding per document
    in this corpus).

    Oracle: the minhash band dump → recursive-CTE clusters (the
    ``minhash_lsh_dedup`` oracle) joined against a windowed exact-cosine
    top-``pool``, re-ranked after exclusion. Ids+integer ranks only (the
    knn ranking-stability convention)."""
    from xmlschema_ray.pipelines.dedup import minhash_lsh_dedup

    labels = minhash_lsh_dedup(sf_dir, oracle_dump=oracle_dump)
    qids, qmat = _query_matrix(sf_dir)
    q_ref = ray.put((qids, qmat))
    state: dict = {}

    ds = rd.read_parquet(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def topk_partial(batch: pd.DataFrame) -> pd.DataFrame:
        q = state.get("q")
        if q is None:
            q = state["q"] = ray.get(q_ref)
        b_qids, b_qmat = q
        vecs = np.stack(batch["embedding"].to_numpy())
        ids = batch["vec_id"].to_numpy()
        qi, vi, cos = batch_cosine_topk(vecs, ids, b_qmat, pool + 1)
        return pd.DataFrame(
            {
                "query_id": pd.array(b_qids[qi], dtype="int64"),
                "vec_id": pd.array(vi, dtype="int64"),
                "cos": cos,
            }
        )

    cand = _reduce_query_topk(
        ds.map_batches(topk_partial, batch_format="pandas"), pool + 1, "cos", False
    )
    cand = cand[cand["vec_id"] != cand["query_id"]]
    cand = cand.groupby("query_id", sort=True).head(pool).reset_index(drop=True)

    # candidate-sized label lookup: filter the labels DATASET to the ids we
    # actually rank (≤ pool×Q + Q rows collected, never the corpus)
    need = np.union1d(cand["vec_id"].to_numpy(np.int64), qids.astype(np.int64))
    need_ref = ray.put(need)
    lstate: dict = {}

    def pick_labels(batch: pd.DataFrame) -> pd.DataFrame:
        ids = lstate.get("ids")
        if ids is None:
            ids = lstate["ids"] = ray.get(need_ref)
        m = np.isin(batch["doc_id"].to_numpy(np.int64), ids)
        return batch[m]

    lab = labels.map_batches(pick_labels, batch_format="pandas").to_pandas()
    root = dict(zip(lab["doc_id"].astype(np.int64), lab["cluster_root"].astype(np.int64)))

    qroot = cand["query_id"].map(root).to_numpy(np.int64)
    vroot = cand["vec_id"].map(root).to_numpy(np.int64)
    keep = cand[qroot != vroot]
    keep = keep.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    keep["rank"] = keep.groupby("query_id", sort=False).cumcount().to_numpy() + 1
    return keep[["query_id", "vec_id", "rank"]].astype(np.int64)


from xmlschema_ray.pipelines.dedup import _MINHASH_CC_CTE as _CC_CTE  # noqa: E402

HARD_NEGATIVE_SQL = (
    _CC_CTE
    + """
, knn AS (
  SELECT q.vec_id AS query_id, e.vec_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id
         ) AS r0
  FROM embeddings e, embeddings q
  WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id
  QUALIFY r0 <= 20
), filt AS (
  SELECT k.query_id, k.vec_id,
         CAST(row_number() OVER (PARTITION BY k.query_id ORDER BY k.r0) AS BIGINT) AS rank
  FROM knn k
  JOIN clusters cq ON cq.doc_id = k.query_id
  JOIN clusters cv ON cv.doc_id = k.vec_id
  WHERE cq.cluster_root <> cv.cluster_root
  QUALIFY rank <= 5
)
SELECT query_id, vec_id, rank FROM filt ORDER BY query_id, rank
"""
)


HYBRID_RRF_SQL = r"""
WITH w AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
  FROM documents
), d AS (
  SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl,
         CAST(len(list_filter(ws, x -> x = 'table'))  AS BIGINT) AS tf_table,
         CAST(len(list_filter(ws, x -> x = 'window')) AS BIGINT) AS tf_window,
         CAST(len(list_filter(ws, x -> x = 'join'))   AS BIGINT) AS tf_join,
         CAST(len(list_filter(ws, x -> x = 'hash'))   AS BIGINT) AS tf_hash
  FROM w
), g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS tot,
         CAST(SUM(CASE WHEN tf_table  > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_table,
         CAST(SUM(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_window,
         CAST(SUM(CASE WHEN tf_join   > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_join,
         CAST(SUM(CASE WHEN tf_hash   > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_hash
  FROM d
), s AS (
  SELECT doc_id,
    (CASE WHEN tf_table > 0 THEN ((n - df_table + 0.5) / (df_table + 0.5))
          * (tf_table * (1.2 + 1)) / (tf_table + 1.2 * (1 - 0.75 + 0.75 * dl / (CAST(tot AS DOUBLE) / n)))
          ELSE 0.0 END
   + CASE WHEN tf_window > 0 THEN ((n - df_window + 0.5) / (df_window + 0.5))
          * (tf_window * (1.2 + 1)) / (tf_window + 1.2 * (1 - 0.75 + 0.75 * dl / (CAST(tot AS DOUBLE) / n)))
          ELSE 0.0 END
   + CASE WHEN tf_join > 0 THEN ((n - df_join + 0.5) / (df_join + 0.5))
          * (tf_join * (1.2 + 1)) / (tf_join + 1.2 * (1 - 0.75 + 0.75 * dl / (CAST(tot AS DOUBLE) / n)))
          ELSE 0.0 END
   + CASE WHEN tf_hash > 0 THEN ((n - df_hash + 0.5) / (df_hash + 0.5))
          * (tf_hash * (1.2 + 1)) / (tf_hash + 1.2 * (1 - 0.75 + 0.75 * dl / (CAST(tot AS DOUBLE) / n)))
          ELSE 0.0 END) AS bm25
  FROM d CROSS JOIN g
), lex AS (
  SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS r
  FROM s WHERE bm25 > 0
  QUALIFY r <= 100
), vec AS (
  SELECT e.vec_id AS doc_id,
         CAST(row_number() OVER (
           ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id
         ) AS BIGINT) AS r
  FROM embeddings e, (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
  QUALIFY r <= 100
), f AS (
  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.r AS lex_rank, v.r AS vec_rank,
         COALESCE(1.0 / (60 + l.r), 0.0) + COALESCE(1.0 / (60 + v.r), 0.0) AS rrf
  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
)
SELECT doc_id, lex_rank, vec_rank, rrf FROM f
ORDER BY rrf DESC, doc_id
LIMIT 20
"""


ORACLES: Dict[str, str] = {
    "knn_cosine": KNN_SQL,
    "hybrid_search_rrf": HYBRID_RRF_SQL,
    "hard_negative_mining": HARD_NEGATIVE_SQL,
    "knn_lsh": KNN_LSH_SQL,
    "knn_ivf": KNN_IVF_SQL,
    "embedding_kmeans": EMBEDDING_KMEANS_SQL,
    "embedding_centroids_by_label": EMBEDDING_CENTROIDS_SQL,
    "embedding_quantize_int8": EMBEDDING_QUANTIZE_SQL,
    "pq_ann_topk": PQ_ANN_TOPK_SQL,
    "embedding_top_component": EMBEDDING_TOP_COMPONENT_SQL,
}

QUERIES = {
    "knn_cosine": knn_cosine,
    "hybrid_search_rrf": hybrid_search_rrf,
    "hard_negative_mining": hard_negative_mining,
    "knn_lsh": knn_lsh,
    "knn_ivf": knn_ivf,
    "embedding_kmeans": embedding_kmeans,
    "embedding_centroids_by_label": embedding_centroids_by_label,
    "embedding_quantize_int8": embedding_quantize_int8,
    "pq_ann_topk": pq_ann_topk,
    # hash-exact as of r5: scaled-integer power iteration (see
    # _embedding_top_component_sql); also proven against numpy
    # eigendecomposition in tests/test_graph_readers.py
    "embedding_top_component": embedding_top_component,
}
