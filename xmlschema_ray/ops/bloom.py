"""Mergeable Bloom filter — the compact-broadcast set-membership primitive.

The scale problem it solves: broadcast membership checks (decontamination
gram sets, persisted dedup keys, benchmark ids) ship the FULL key set to
every worker. At ~10^8 distinct 5-gram strings (a real benchmark suite
against a 100-TB corpus) that broadcast is multiple GiB per node; a Bloom
filter at 10 bits/key is ~125 MiB for the same set with <1% false-positive
rate and ZERO false negatives. Pipelines keep exactness by pairing the
filter with an exact second phase over the (tiny) bloom-positive candidate
subset — the same two-phase discipline as the uniqueness sieve
(``engine/engine.py`` stage B: hashed candidates can only be false
POSITIVES, recovery is exact).

Mergeability: a Bloom filter over the union of two key sets is the
bitwise OR of the two filters, so per-batch partial filters ride the
normal partial-aggregation channel and the driver (or any reduce tree)
folds them — no serialized build step, no shuffle.

Hashing is Kirsch-Mitzenmacher double hashing (two independent 64-bit
hashes, probe ``i`` at ``h1 + i*h2``) over ``pd.util.hash_array`` with two
fixed 16-byte hash keys — vectorized over the whole batch, deterministic
across processes/machines (required: the filter is built on one worker set
and probed on another).

Reference analog: enumeration/membership facets (``validators/facets.py``
enumeration) and the keyref key-set broadcast — this is their
bounded-memory scale path.
"""

from __future__ import annotations

import math
from typing import Union

import numpy as np
import pandas as pd

__all__ = ["BloomFilter", "optimal_bits"]

_KEY1 = "xmlschema-bloom1"
_KEY2 = "xmlschema-bloom2"


def optimal_bits(n_keys: int, fpr: float = 0.01) -> int:
    """Bits for a target false-positive rate: m = -n ln(p) / (ln 2)^2,
    rounded up to a power of two (masking beats modulo in the hot probe)."""
    if n_keys <= 0:
        return 1 << 10
    m = -n_keys * math.log(fpr) / (math.log(2) ** 2)
    return 1 << max(10, int(math.ceil(math.log2(m))))


def _hashes(values: np.ndarray) -> tuple:
    """Two independent deterministic uint64 hashes per value.

    ``pd.util.hash_array`` rejects numpy 'U' dtype (CLAUDE.md pitfall) —
    normalize to object. The second hash is forced odd so the
    Kirsch-Mitzenmacher stride never degenerates to probing one slot
    (m is a power of two, so any odd stride is a unit mod m).
    """
    if values.dtype.kind in ("U", "S"):
        values = values.astype(object)
    elif values.dtype.kind in ("i", "u", "b"):
        # DTYPE-STABLE hashing: a null-bearing batch surfaces an int64 key
        # as float64 under Ray's pandas conversion, and hash(int64 7) !=
        # hash(float64 7.0) — the filter would then return a FALSE
        # NEGATIVE for int-typed probes of float-built values, silently
        # dropping join rows. Integers hash through their float64
        # spelling; >2^53 collisions only add false positives, which the
        # exact second phase already absorbs.
        values = values.astype(np.float64)
    h1 = pd.util.hash_array(values, hash_key=_KEY1)
    h2 = pd.util.hash_array(values, hash_key=_KEY2) | np.uint64(1)
    return h1, h2


class BloomFilter:
    """Fixed-size Bloom filter over arbitrary hashable numpy values.

    ``m_bits`` MUST be a power of two and identical across all partial
    filters that will be merged (enforced in :meth:`union`).
    """

    def __init__(self, m_bits: int = 1 << 20, n_hashes: int = 7, bits: "np.ndarray | None" = None):
        if m_bits & (m_bits - 1):
            raise ValueError(f"m_bits must be a power of two, got {m_bits}")
        self.m_bits = int(m_bits)
        self.n_hashes = int(n_hashes)
        self.bits = np.zeros(m_bits >> 3, dtype=np.uint8) if bits is None else bits
        if len(self.bits) != m_bits >> 3:
            raise ValueError("bits length does not match m_bits")

    # -- build -------------------------------------------------------------

    def add_many(self, values: np.ndarray) -> "BloomFilter":
        if len(values) == 0:
            return self
        h1, h2 = _hashes(np.asarray(values))
        mask = np.uint64(self.m_bits - 1)
        one = np.uint8(1)
        for i in range(self.n_hashes):
            idx = (h1 + np.uint64(i) * h2) & mask
            np.bitwise_or.at(self.bits, (idx >> np.uint64(3)).astype(np.int64), one << (idx & np.uint64(7)).astype(np.uint8))
        return self

    def union(self, other: "BloomFilter") -> "BloomFilter":
        if (other.m_bits, other.n_hashes) != (self.m_bits, self.n_hashes):
            raise ValueError("cannot union Bloom filters with different geometry")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    # -- probe -------------------------------------------------------------

    def contains_many(self, values: np.ndarray) -> np.ndarray:
        """Vectorized membership: True for every added value (no false
        negatives); True for ~fpr of absent values."""
        values = np.asarray(values)
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        h1, h2 = _hashes(values)
        mask = np.uint64(self.m_bits - 1)
        out = np.ones(len(values), dtype=bool)
        for i in range(self.n_hashes):
            idx = (h1 + np.uint64(i) * h2) & mask
            byte = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
            out &= (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1 == 1
            if not out.any():
                break
        return out

    # -- serde (partials ride Arrow binary columns / ray.put) ---------------

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, n_hashes: int = 7) -> "BloomFilter":
        bits = np.frombuffer(blob, dtype=np.uint8).copy()
        return cls(m_bits=len(bits) << 3, n_hashes=n_hashes, bits=bits)

    def fill_fraction(self) -> float:
        """Fraction of set bits — the load signal (FPR ≈ fill^k)."""
        return float(np.unpackbits(self.bits).mean())
