"""MinHash / SimHash / shingling primitives (numpy-vectorized).

Standard public constructions (Broder's MinHash, Charikar's SimHash) for
near-duplicate detection at scale; no analog in the reference (its only
set-membership machinery is exact, ``validators/identities.py``).

All hashing routes through the stable 64-bit ``hash64`` so signatures
computed on different workers/processes agree.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd

from xmlschema_ray.engine.stats import hash64

_MERSENNE = np.uint64((1 << 61) - 1)


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Distinct word n-gram shingles of one document as uint64 hashes."""
    words = text.split()
    if len(words) < n:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(hash64(np.array(grams, dtype=object)))


def minhash_params(k: int = 128, seed: int = 1234) -> Tuple[np.ndarray, np.ndarray]:
    """k pairwise-independent (a, b) parameters for h'(x) = (a*x+b) mod p."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), size=k, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), size=k, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """k-permutation MinHash signature of one shingle-hash set."""
    if len(shingles) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    # (k, n) permuted hashes; modular arithmetic in uint64 (mod 2^61-1)
    h = (a[:, None] * (shingles[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
    return h.min(axis=1)


_FNV_PRIME = np.uint64(1099511628211)
_FNV_BASIS = np.uint64(14695981039346656037)


def band_hash_matrix(signatures: np.ndarray, n_bands: int) -> np.ndarray:
    """LSH banding over a batch: ``signatures`` is (n_docs, k); returns
    (n_docs, n_bands) uint64 bucket hashes (FNV-style mix over each band's
    ``r = k // n_bands`` values, fully vectorized). Docs sharing a value in
    any band column are candidate pairs."""
    n, k = signatures.shape
    r = k // n_bands
    bands = signatures[:, : n_bands * r].reshape(n, n_bands, r)
    with np.errstate(over="ignore"):
        h = np.full((n, n_bands), _FNV_BASIS, dtype=np.uint64)
        for j in range(r):
            h = (h ^ bands[:, :, j]) * _FNV_PRIME
        # fold the band index in so band columns never collide
        h ^= np.arange(n_bands, dtype=np.uint64)[None, :] * _FNV_PRIME
    return h


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique uint64 shingle sets."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True)
    union = len(a) + len(b) - len(inter)
    return len(inter) / union if union else 0.0


def simhash64(token_hashes: np.ndarray, weights: np.ndarray = None) -> np.uint64:
    """Charikar SimHash: weighted bit-vote over 64 hash bits."""
    if len(token_hashes) == 0:
        return np.uint64(0)
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    w = weights if weights is not None else np.ones(len(token_hashes), dtype=np.int64)
    votes = (w[:, None] * (2 * bits - 1)).sum(axis=0)
    out = np.uint64(0)
    for i in np.flatnonzero(votes > 0):
        out |= np.uint64(1) << np.uint64(i)
    return out


def hamming64(a: np.ndarray, b: np.uint64) -> np.ndarray:
    """Vectorized Hamming distance of a uint64 array vs one value."""
    x = a ^ b
    # SWAR popcount on uint64
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)
