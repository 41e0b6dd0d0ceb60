"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata columns alongside (``media_type``, ``n_bytes``). Decode /
feature-extraction runs as an actor-pool ``map_batches`` stage — the model
(or codec) is loaded once per actor in ``__init__``. The actual codec
libraries are NOT in this container, so the decode step is STUBBED: pass
``fake=True`` for a deterministic hash-based pseudo-decoder (used in
tests, keeps the Ray-side plumbing — schema, batch size, actor signature,
output layout — real), otherwise ``NotImplementedError`` marks the seam
where Pillow/torchaudio/pyav would plug in.

Small batches are the memory rule for wide binary rows (SURVEY §4):
batch_size × row width × concurrency must fit the worker heap, so
``batch_size=256`` default here vs 16k for narrow rows.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from xmlschema_ray.engine.stats import hash64
from xmlschema_ray.pipelines.common import table_path

FEAT_DIM = 8


def to_binary_payloads(sf_dir: str) -> "rd.Dataset":
    """Stand-in multimodal table derived from documents: utf-8 payload
    bytes + metadata columns (the schema any real media table would use)."""
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        payload = pc.cast(batch["text"], pa.binary())
        return pa.table(
            {
                "item_id": batch["doc_id"],
                "payload": payload,
                "media_type": pa.array(["text/plain"] * batch.num_rows),
                "n_bytes": pc.binary_length(payload),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class MediaFeatureExtractor:
    """Actor-pool decode/feature stage.

    ``__init__`` is where a real implementation loads the codec/model once
    per actor. ``fake=True`` derives a deterministic FEAT_DIM-dim feature
    vector from the payload's MD5 digest — stable across processes AND
    portable to SQL (DuckDB ``md5()``), so the query carries a full value
    oracle (MULTIMODAL_FEATURES_SQL) despite the stubbed codec.
    """

    def __init__(self, fake: bool = False):
        self.fake = fake
        if not fake:
            # real codecs (PIL / torchaudio / pyav) are not available in
            # this environment; the stub marks the integration seam.
            raise NotImplementedError(
                "media decode requires codec libraries not present in this "
                "environment; construct with fake=True for the deterministic stub"
            )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        # first FEAT_DIM digest bytes / 255 — a per-item C-level hash (the
        # stub stands in for an inherently per-item codec decode)
        feats = np.frombuffer(
            b"".join(hashlib.md5(bytes(p)).digest()[:FEAT_DIM] for p in batch["payload"]),
            dtype=np.uint8,
        ).reshape(-1, FEAT_DIM).astype(np.float64) / 255.0
        out = pd.DataFrame({"item_id": batch["item_id"], "n_bytes": batch["n_bytes"].astype("int64")})
        for i in range(FEAT_DIM):
            out[f"feat_{i}"] = feats[:, i]
        return out


class MediaResizer:
    """Actor-pool resize stage (image-shaped payloads).

    Same seam pattern as :class:`MediaFeatureExtractor`: the real
    implementation would load the codec once per actor in ``__init__`` and
    decode→resize→re-encode per batch; ``fake=True`` emits a deterministic
    pseudo-resized payload (hash-seeded bytes of exactly
    ``target_w*target_h*3`` octets) so schema, sizing and ordering are
    testable without codec libraries. Binary payloads stay opaque
    ``binary`` columns with typed metadata (width/height/n_bytes).
    """

    def __init__(self, target_w: int = 32, target_h: int = 32, fake: bool = False):
        self.target_w = target_w
        self.target_h = target_h
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "image decode/resize requires codec libraries not present in "
                "this environment; construct with fake=True for the stub"
            )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_out = self.target_w * self.target_h * 3
        h = hash64(np.array([bytes(p) for p in batch["payload"]], dtype=object))
        payloads = []
        for seed in h:
            rng = np.random.default_rng(int(seed))
            payloads.append(rng.integers(0, 256, size=n_out, dtype=np.uint8).tobytes())
        return pd.DataFrame(
            {
                "item_id": batch["item_id"],
                "payload": payloads,
                "media_type": "image/raw-rgb",
                "width": np.int32(self.target_w),
                "height": np.int32(self.target_h),
                "n_bytes": np.int64(n_out),
            }
        )


class FrameSampler:
    """Actor-pool frame-sampling stage (video-shaped payloads): one input
    row fans out to ``n_frames`` rows — the flat-map shape. ``fake=True``
    slices the payload into ``n_frames`` contiguous chunks (deterministic;
    a real implementation would seek keyframes with pyav per actor)."""

    def __init__(self, n_frames: int = 4, fake: bool = False):
        self.n_frames = n_frames
        if not fake:
            raise NotImplementedError(
                "video demux requires codec libraries not present in this "
                "environment; construct with fake=True for the stub"
            )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, frames, idxs = [], [], []
        for item_id, p in zip(batch["item_id"], batch["payload"]):
            b = bytes(p)
            step = max(1, len(b) // self.n_frames)
            for i in range(self.n_frames):
                ids.append(item_id)
                idxs.append(i)
                frames.append(b[i * step : (i + 1) * step])
        return pd.DataFrame(
            {
                "item_id": pd.array(ids, dtype="int64"),
                "frame_idx": pd.array(idxs, dtype="int32"),
                "payload": frames,
            }
        )


def multimodal_resize_pipeline(
    sf_dir: str, target_w: int = 32, target_h: int = 32
) -> "rd.Dataset":
    """payloads → length gate → resize pool → feature pool, each stage an
    independently sized actor pool (resize is allocation-heavy → smaller
    batches; features are hash-cheap → larger)."""
    return (
        to_binary_payloads(sf_dir)
        .map_batches(
            MediaResizer,
            fn_constructor_kwargs=dict(target_w=target_w, target_h=target_h, fake=True),
            batch_format="pandas",
            batch_size=128,
            concurrency=(1, 4),
        )
        .map_batches(
            MediaFeatureExtractor,
            fn_constructor_kwargs=dict(fake=True),
            batch_format="pandas",
            batch_size=256,
            concurrency=(1, 4),
        )
    )


def multimodal_features(sf_dir: str, max_payload_bytes: int = 1 << 20) -> "rd.Dataset":
    """binary payloads → length-gate → actor-pool feature extraction.

    The length gate is the binary MaxLength facet applied to the payload
    column (XSD binary length semantics, reference facets.py:218-258):
    oversized payloads are dropped BEFORE the decode pool so a corrupt
    multi-GB blob can't blow a worker heap."""
    from xmlschema_ray.constraints import facets as F

    gate = F.MaxLength(max_payload_bytes)

    def length_gate(batch: pa.Table) -> pa.Table:
        viol, _ = gate.check(batch["payload"])
        if viol.any():
            return batch.filter(pa.array(~viol))
        return batch

    return (
        to_binary_payloads(sf_dir)
        .map_batches(length_gate, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            MediaFeatureExtractor,
            fn_constructor_kwargs=dict(fake=True),
            batch_format="pandas",
            batch_size=256,  # wide binary rows → small batches
            # autoscaling pool with min=1: a FIXED pool sized to the cluster
            # would reserve every CPU and starve the upstream read (deadlock
            # on small clusters); min 1 actor always leaves room to progress.
            concurrency=(1, 4),
        )
    )


def val_payload_length(sf_dir: str) -> "rd.Dataset":
    """Binary length facet on the payload column, oracle-checked: one
    violation row per payload longer than 500 bytes (XSD length counts
    OCTETS of the binary value — ``pc.binary_length``)."""
    from xmlschema_ray.constraints import facets as F
    from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints
    from xmlschema_ray.pipelines.validation_queries import TypedViolations

    spec = TableConstraints(
        name="payload_checks",
        columns=[
            ColumnSpec("item_id", pa.int64()),
            ColumnSpec("payload", pa.binary(), facets=(F.MaxLength(500),)),
        ],
        key_columns=("item_id",),
    )
    state: dict = {}

    def fn(batch: pa.Table) -> pa.Table:
        tv = state.get("tv")
        if tv is None:
            tv = state["tv"] = TypedViolations(spec, ["item_id"])
        return tv(batch)

    return to_binary_payloads(sf_dir).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


VAL_PAYLOAD_LENGTH_SQL = """
SELECT doc_id AS item_id, 'payload.maxLength(500)' AS constraint_name, 'payload' AS col_name
FROM documents WHERE NOT (octet_length(encode(text)) <= 500)
"""


def _md5_byte_expr(i: int) -> str:
    """SQL for digest byte ``i`` of md5(text): hex-pair → int via strpos."""
    hx = "'0123456789abcdef'"
    return (
        f"((strpos({hx}, substr(md5(text), {2 * i + 1}, 1)) - 1) * 16"
        f" + strpos({hx}, substr(md5(text), {2 * i + 2}, 1)) - 1)"
    )


# Full value oracle for the stubbed feature extractor: the fake decode is
# md5-digest bytes / 255, which DuckDB reproduces exactly (md5 of the same
# UTF-8 payload bytes; integer/255.0 is the identical IEEE division).
MULTIMODAL_FEATURES_SQL = (
    "SELECT doc_id AS item_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
    + ", ".join(f"{_md5_byte_expr(i)} / 255.0 AS feat_{i}" for i in range(FEAT_DIM))
    + " FROM documents WHERE octet_length(encode(text)) <= 1048576"
)


class _ResizeManifest:
    """Actor wrapper running the REAL :class:`MediaResizer` stage and
    emitting the manifest columns the oracle can re-derive (sizes and
    target geometry; the pseudo-payload itself is hash-seeded and stays
    out of the compare)."""

    def __init__(self, target_w: int, target_h: int):
        self.resizer = MediaResizer(target_w, target_h, fake=True)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = self.resizer(batch)
        return pd.DataFrame(
            {
                "item_id": out["item_id"].astype("int64"),
                "n_bytes_in": batch["n_bytes"].to_numpy().astype("int64"),
                "n_bytes_out": out["n_bytes"].astype("int64"),
                "width": out["width"].astype("int32"),
                "height": out["height"].astype("int32"),
            }
        )


def media_resize_manifest(sf_dir: str, target_w: int = 32, target_h: int = 32) -> "rd.Dataset":
    """Oracle-checked resize manifest: the :class:`MediaResizer` actor
    pool over the payload table, reduced to the columns SQL re-derives
    exactly (in/out octet counts + output geometry) — brings the resize
    stage under the driver's correctness gate."""
    return to_binary_payloads(sf_dir).map_batches(
        _ResizeManifest,
        fn_constructor_kwargs=dict(target_w=target_w, target_h=target_h),
        batch_format="pandas",
        batch_size=128,
        concurrency=(1, 4),
    )


MEDIA_RESIZE_MANIFEST_SQL = """
SELECT doc_id AS item_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes_in,
       CAST(32 * 32 * 3 AS BIGINT) AS n_bytes_out,
       CAST(32 AS INTEGER) AS width,
       CAST(32 AS INTEGER) AS height
FROM documents
ORDER BY item_id
"""


class _FrameManifest:
    """Actor wrapper over the REAL :class:`FrameSampler` fan-out, emitting
    per-frame octet counts (SQL re-derives the contiguous-chunk slicing
    arithmetic exactly)."""

    def __init__(self, n_frames: int):
        self.sampler = FrameSampler(n_frames, fake=True)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = self.sampler(batch)
        return pd.DataFrame(
            {
                "item_id": out["item_id"],
                "frame_idx": out["frame_idx"],
                "n_bytes": pd.array([len(p) for p in out["payload"]], dtype="int64"),
            }
        )


def frame_sample_manifest(sf_dir: str, n_frames: int = 4) -> "rd.Dataset":
    """Oracle-checked frame-sampling manifest: one row per (item, frame)
    with the frame's octet count — the fan-out stage under the gate."""
    return to_binary_payloads(sf_dir).map_batches(
        _FrameManifest,
        fn_constructor_kwargs=dict(n_frames=n_frames),
        batch_format="pandas",
        batch_size=256,
        concurrency=(1, 4),
    )


# chunk i of payload b is b[i*step:(i+1)*step] with step = max(1, n//4):
# length = max(0, min(n, (i+1)*step) - min(n, i*step))
FRAME_SAMPLE_MANIFEST_SQL = """
WITH d AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n,
         greatest(1, octet_length(encode(text)) // 4) AS step
  FROM documents
), f AS (SELECT unnest(range(4)) AS i)
SELECT d.doc_id AS item_id,
       CAST(f.i AS INTEGER) AS frame_idx,
       CAST(greatest(0, least(d.n, (f.i + 1) * d.step) - least(d.n, f.i * d.step)) AS BIGINT) AS n_bytes
FROM d CROSS JOIN f
ORDER BY 1, 2
"""


class _PHasher:
    """Actor-pool perceptual-hash stage (pHash analog): the real
    implementation decodes the image, downsamples to 8×8 luminance, and
    takes the DCT sign bits — once-per-actor codec setup, per-batch
    hashing. The ``fake`` stand-in derives a deterministic 60-bit hash
    from the payload's MD5 (first 15 hex chars — fits int64 AND DuckDB's
    BIGINT hex cast), and for items whose ``item_id % 7 == 0`` also emits
    a VARIANT item (id + 10^9) with ≤2 deterministic bit flips — the
    near-duplicate a real pHash would give for a re-encoded/resized copy,
    planted so the pair search has true positives both engines derive."""

    def __init__(self):
        import hashlib

        self._md5 = hashlib.md5

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["item_id"].to_numpy().astype(np.int64)
        h = np.fromiter(
            (int(self._md5(bytes(p)).hexdigest()[:15], 16) for p in batch["payload"]),
            dtype=np.int64,
            count=len(ids),
        )
        var = ids % 7 == 0
        vids = ids[var] + 1_000_000_000
        vh = (
            h[var]
            ^ (np.int64(1) << (ids[var] % 60))
            ^ (np.int64(1) << ((ids[var] * 11) % 60))
        )
        return pd.DataFrame(
            {
                "item_id": np.concatenate([ids, vids]),
                "phash": np.concatenate([h, vh]),
            }
        )


def phash_dup_pairs(sf_dir: str, max_hamming: int = 2) -> pd.DataFrame:
    """Perceptual-hash near-duplicate pairs over the binary payload table —
    the MULTIMODAL member of the dedup family (SimHash is its text
    sibling): item pairs within Hamming ``max_hamming`` of a 60-bit pHash,
    found by 4×15-bit band bucketing (pigeonhole: ≤3 flips leave ≥1 band
    intact, so ``max_hamming ≤ 3`` is EXACT) + vectorized in-bucket XOR
    popcount — one band-keyed exchange, no all-pairs scan.

    Unlike the SimHash oracle (signature dump), the fake pHash is
    md5-derived end to end, so DuckDB re-derives hashes, planted variants
    AND the full pair set from the raw table with NO dump — and replays
    the pair search as pure Hamming with no band predicate, proving the
    banding loses nothing at this distance.
    """
    from xmlschema_ray.ops.relational import hash_partition_apply

    hashed = to_binary_payloads(sf_dir).map_batches(
        _PHasher, batch_format="pandas", batch_size=1024, concurrency=(1, 4)
    )

    def band_rows(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["phash"].to_numpy(np.int64)
        ids = batch["item_id"].to_numpy(np.int64)
        frames = []
        for bi in range(4):
            band_val = (h >> np.int64(15 * bi)) & np.int64(0x7FFF)
            frames.append(
                pd.DataFrame(
                    {"band_key": band_val + (bi << 15), "item_id": ids, "phash": h}
                )
            )
        return pd.concat(frames, ignore_index=True)

    rows = hashed.map_batches(band_rows, batch_format="pandas")

    def bucket_verify(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in part.groupby("band_key", sort=False):
            if len(g) < 2:
                continue
            order = np.argsort(g["item_id"].to_numpy())
            ids = g["item_id"].to_numpy()[order]
            h = g["phash"].to_numpy(np.int64)[order]
            ia, ib = np.triu_indices(len(ids), k=1)
            x = np.bitwise_xor(h[ia], h[ib]).astype(np.uint64)
            d = np.zeros(len(x), dtype=np.int64)
            while x.any():
                d += (x & np.uint64(1)).astype(np.int64)
                x >>= np.uint64(1)
            keep = d <= max_hamming
            if keep.any():
                outs.append(
                    pd.DataFrame(
                        {
                            "item_id_a": ids[ia][keep],
                            "item_id_b": ids[ib][keep],
                            "hamming": d[keep],
                        }
                    )
                )
        if not outs:
            return pd.DataFrame(
                {
                    "item_id_a": pd.array([], dtype="int64"),
                    "item_id_b": pd.array([], dtype="int64"),
                    "hamming": pd.array([], dtype="int64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    pairs = hash_partition_apply(rows, "band_key", bucket_verify).to_pandas()
    return (
        pairs.drop_duplicates(["item_id_a", "item_id_b"])
        .sort_values(["item_id_a", "item_id_b"])
        .reset_index(drop=True)
        .astype({"item_id_a": "int64", "item_id_b": "int64", "hamming": "int64"})
    )


PHASH_DUP_PAIRS_SQL = """
WITH base AS (
  SELECT doc_id AS item_id,
         CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS phash
  FROM documents
), items AS (
  SELECT item_id, phash FROM base
  UNION ALL
  SELECT item_id + 1000000000,
         xor(xor(phash, 1::BIGINT << CAST(item_id % 60 AS INTEGER)),
             1::BIGINT << CAST((item_id * 11) % 60 AS INTEGER))
  FROM base WHERE item_id % 7 = 0
)
SELECT a.item_id AS item_id_a, b.item_id AS item_id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM items a JOIN items b ON a.item_id < b.item_id
WHERE bit_count(xor(a.phash, b.phash)) <= 2
ORDER BY item_id_a, item_id_b
"""


ORACLES: Dict[str, str] = {
    "val_payload_length": VAL_PAYLOAD_LENGTH_SQL,
    "phash_dup_pairs": PHASH_DUP_PAIRS_SQL,
    "multimodal_features": MULTIMODAL_FEATURES_SQL,
    "media_resize_manifest": MEDIA_RESIZE_MANIFEST_SQL,
    "frame_sample_manifest": FRAME_SAMPLE_MANIFEST_SQL,
}
QUERIES = {
    "multimodal_features": multimodal_features,
    "phash_dup_pairs": phash_dup_pairs,
    "val_payload_length": val_payload_length,
    "media_resize_manifest": media_resize_manifest,
    "frame_sample_manifest": frame_sample_manifest,
}
