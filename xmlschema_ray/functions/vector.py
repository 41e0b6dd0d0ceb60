"""Vector similarity primitives: cosine top-k and hyperplane LSH.

Brute-force cosine top-k is the correctness baseline (numpy matmul per
batch against a broadcast query matrix); hyperplane-LSH bucketing is the
scale path (candidates restricted to matching sign-pattern buckets).
No reference analog (north-rule mandate).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def normalize_rows(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def batch_cosine_topk(
    batch_vecs: np.ndarray,
    batch_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-batch partial top-k: cosine of every batch vector against every
    query (one matmul), keep the k best per query within this batch.

    Returns ``(query_idx, vec_ids, cosines)`` flattened. float64 throughout
    so results match a float64 oracle bit-for-bit after rounding.
    """
    sims = normalize_rows(batch_vecs) @ normalize_rows(query_matrix).T  # (n, q)
    n, q = sims.shape
    kk = min(k, n)
    # argpartition per query column, then exact ordering of the k survivors
    part = np.argpartition(-sims, kk - 1, axis=0)[:kk, :]  # (kk, q)
    qi = np.repeat(np.arange(q), kk)
    vi = part.T.reshape(-1)
    return qi, batch_ids[vi], sims[vi, qi]


def kmeans_fit(
    sample: np.ndarray, k: int = 16, iters: int = 10, seed: int = 7
) -> np.ndarray:
    """Spherical k-means (Lloyd on unit vectors, cosine assignment) for IVF
    coarse quantization. Runs on a driver-side SAMPLE — the centroid set is
    the broadcast model; assignment is a matmul per batch."""
    x = normalize_rows(sample)
    rng = np.random.default_rng(seed)
    centroids = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ centroids.T).argmax(axis=1)
        new = np.zeros_like(centroids)
        for c in range(len(centroids)):
            members = x[assign == c]
            new[c] = members.mean(axis=0) if len(members) else x[rng.integers(len(x))]
        centroids = normalize_rows(new)
    return centroids


def kmeans_fit_l2(
    sample: np.ndarray, k: int = 16, iters: int = 10, seed: int = 7
) -> np.ndarray:
    """Euclidean (squared-L2) Lloyd k-means on a driver-side sample — the
    PRODUCT-QUANTIZATION codebook fit (PQ subspaces quantize raw
    subvectors, so cosine/spherical assignment would be wrong here;
    :func:`kmeans_fit` stays the IVF coarse quantizer). Deterministic
    seeded init; empty clusters re-seed from the sample."""
    x = np.asarray(sample, dtype=np.float64)
    rng = np.random.default_rng(seed)
    centroids = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        d2 = ((x[:, None, :] - centroids[None]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        new = np.zeros_like(centroids)
        for c in range(len(centroids)):
            members = x[assign == c]
            new[c] = members.mean(axis=0) if len(members) else x[rng.integers(len(x))]
        centroids = new
    return centroids


def ivf_assign(vecs: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest-centroid id per vector (one matmul)."""
    return (normalize_rows(vecs) @ centroids.T).argmax(axis=1)


def hyperplane_planes(dim: int, n_planes: int = 16, seed: int = 99) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def hyperplane_bucket(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-pattern bucket id per vector (uint64), vectorized."""
    signs = (np.asarray(vecs, dtype=np.float64) @ planes.T) > 0  # (n, p)
    weights = (np.uint64(1) << np.arange(planes.shape[0], dtype=np.uint64))[None, :]
    return (signs.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
