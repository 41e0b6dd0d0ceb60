"""Cross-block seeded sampling for driver-side model fits.

The k-means fits behind IVF indexing / ANN / clustering need a small
driver-side sample of the corpus. ``ds.limit(n)`` is NOT a sample — it
takes the first blocks in file order, so at 100 TB the "sample" comes
from one file of one source and the fitted centroids degrade recall
corpus-wide. This module draws a deterministic hash-threshold sample
instead: every row is kept iff a seeded 64-bit hash of its key falls
under a threshold sized from the (metadata-cheap) row count, so the
sample is uniform across blocks/files/sources, stable across runs and
parallelism, and the driver only ever collects ~``oversample × n``
rows regardless of corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from xmlschema_ray.engine.stats import hash64

# splitmix64-style odd multiplier for seed scrambling
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _seeded_hash(keys: np.ndarray, seed: int) -> np.ndarray:
    """Seed-scrambled uint64 hash of a key column (vectorized)."""
    h = hash64(keys)
    with np.errstate(over="ignore"):
        return (h ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF)) * _MIX


def seeded_sample_pandas(
    ds,
    key_col: str,
    columns: list,
    sample_size: int,
    seed: int = 0xA5,
    oversample: float = 1.4,
) -> pd.DataFrame:
    """Collect a deterministic ~``sample_size``-row cross-block sample.

    One count (parquet-metadata cheap) + one filtering pass; per batch the
    keep mask is a vectorized hash-threshold test, so the bytes that reach
    the driver are bounded by ``oversample × sample_size`` rows whatever
    the corpus size. The final cut sorts by the hash (a deterministic
    uniform order independent of block layout) and takes ``sample_size``.
    """
    n = ds.count()
    if n <= sample_size * oversample:
        cols = columns if key_col in columns else [key_col] + list(columns)
        out = ds.select_columns(cols).to_pandas()
        if len(out) > sample_size:
            # still cut by HASH order, never physical head(): a block-order
            # head re-introduces exactly the layout bias this module
            # removes (and changes with repartitioning)
            h = _seeded_hash(out[key_col].to_numpy(), seed)
            out = out.iloc[np.argsort(h, kind="stable")[:sample_size]]
        return out[list(columns)].reset_index(drop=True)
    frac = min(1.0, oversample * sample_size / n)
    thresh = np.uint64(int(frac * float(2**64 - 1)))

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        h = _seeded_hash(batch[key_col].to_numpy(), seed)
        keep = h <= thresh
        out = batch.loc[keep, columns].copy(deep=False)
        out["__h"] = h[keep]
        return out

    picked = ds.map_batches(pick, batch_format="pandas").to_pandas()
    picked = picked.sort_values("__h", kind="mergesort").head(sample_size)
    return picked.drop(columns="__h").reset_index(drop=True)


def seeded_embedding_sample(
    ds,
    sample_size: int,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 0xA5,
) -> np.ndarray:
    """Sampled ``(n, d)`` float64 embedding matrix for driver-side model
    fits (k-means / IVF coarse quantizers) — the drop-in replacement for
    the old ``ds.limit(sample_size).to_pandas()`` first-N slice."""
    picked = seeded_sample_pandas(ds, key_col, [emb_col], sample_size, seed=seed)
    if not len(picked):
        # np.stack of nothing raises "need at least one array to stack"
        # from deep inside numpy — name the real cause instead
        raise ValueError(
            "seeded_embedding_sample: corpus is empty (no rows to sample) — "
            "a model fit needs at least one embedding"
        )
    return np.stack(picked[emb_col].to_numpy()).astype(np.float64)
