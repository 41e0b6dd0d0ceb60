"""Deterministic synthetic pre-tokenized sequence corpus + fixtures.

The input-table shape comes from BASELINE.json's ``input_hint``:
``(doc_id:string, tokens:list<int32>, n_tok:int32, source:string)``.
Fixture methodology mirrors the reference's manifest-driven corpus factory
(``/root/reference/xmlschema/tests/test_cases/testfiles`` +
``tests/test_factory.py:116-193``): every fixture is a seeded deterministic
table paired with an exact expected violation count (the ``--errors N``
convention, asserted by ``tests/__init__.py:171-197``).

Also provides ``sequences_from_documents`` — a Ray Data derivation of the
same shape from the driver-provided ``documents.parquet`` (tokens are
deterministic hashes of whitespace words), so the flagship pipeline runs on
real testdata without synthesizing its own inputs.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from xmlschema_ray.constraints import facets as F
from xmlschema_ray.constraints.spec import (
    ColumnSpec,
    DriftSpec,
    ForeignKey,
    LengthEquals,
    TableConstraints,
    UniqueKey,
)

VOCAB = 50257
MAX_TOK = 8192
SOURCES = [f"s{i:02d}" for i in range(16)]

SEQ_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)


def sequences_spec(
    reference_hist: Optional[Tuple[int, ...]] = None,
    vocab: int = VOCAB,
    max_tok: int = MAX_TOK,
    sources_dim: str = "sources",
    drift_group_by: Optional[str] = None,
    drift_group_references: Optional[Dict[str, Tuple[int, ...]]] = None,
) -> TableConstraints:
    """The flagship constraint spec over the sequence table.

    Constraint → reference mapping:
    * ``doc_id`` pattern — pattern facet (``facets.py:564-628``);
    * ``tokens`` item range [0, vocab) — min/maxInclusive facets on the
      ``xs:list`` item type (``facets.py:261-398``, ``simple_types.py:718``);
    * ``tokens`` length in [1, max_tok] — min/maxLength (``facets.py:175-258``)
      = minOccurs/maxOccurs (``xsdbase.py:754-799``);
    * ``n_tok == len(tokens)`` — declared-vs-actual occurs consistency;
    * unique ``doc_id`` — ``xs:ID``/``xs:unique`` (``identities.py:198-221``);
    * ``source`` → sources dim — ``xs:keyref`` (``identities.py:298-318``);
    * token-length drift — stats channel (north-rule mandate).
    """
    # 256 bins: keeps the merged histogram tiny (2 KB) while bounding
    # histogram-quantile error to one bin width (32 tokens at max_tok=8192)
    bin_edges = tuple(np.linspace(0, max_tok, 257))
    return TableConstraints(
        name="sequences",
        columns=[
            ColumnSpec(
                "doc_id",
                pa.string(),
                nullable=False,
                facets=(F.Pattern(r"doc-[0-9a-f]{12}"),),
            ),
            ColumnSpec(
                "tokens",
                pa.list_(pa.int32()),
                nullable=False,
                facets=(
                    F.ItemFacets((F.MinInclusive(0), F.MaxExclusive(vocab))),
                    F.MinLength(1),
                    F.MaxLength(max_tok),
                ),
            ),
            ColumnSpec("n_tok", pa.int32(), nullable=False),
            ColumnSpec("source", pa.string(), nullable=False),
        ],
        row_checks=[LengthEquals("tokens", "n_tok", name="n_tok_equals_len_tokens")],
        unique_keys=[UniqueKey(("doc_id",), name="unique_doc_id")],
        foreign_keys=[ForeignKey("source", sources_dim, "source", name="fk_source")],
        drift=[
            DriftSpec(
                column="tokens",
                bin_edges=bin_edges,
                reference_hist=reference_hist,
                use_list_length=True,
                group_by=drift_group_by,
                group_references=drift_group_references,
                name="drift_token_length",
            )
        ],
        key_columns=("doc_id",),
        stats_columns=("n_tok", "tokens"),
        distinct_columns=("doc_id", "source"),
    )


def _doc_ids(rng: np.random.Generator, n: int) -> np.ndarray:
    raw = rng.integers(0, 1 << 48, size=n, dtype=np.int64)
    # unique by construction: fold the row index into the low bits
    raw = (raw << np.int64(16)) | np.arange(n, dtype=np.int64)
    return np.array([f"doc-{v & ((1 << 48) - 1):012x}" for v in raw], dtype=object)


def generate_sequences(
    n_rows: int,
    seed: int = 42,
    mean_len: int = 512,
    defects: Optional[Dict[str, int]] = None,
) -> Tuple[pa.Table, pa.Table, Dict[str, int]]:
    """Build ``(sequences, sources_dim, expected_violation_counts)``.

    ``defects`` maps fixture names (FIXTURES.md) to counts:
    ``dup_doc_id``, ``skewed_dup`` (fraction denominator ignored; hot key =
    10% of rows), ``bad_ref``, ``null_doc_id``, ``bad_token_range``,
    ``n_tok_mismatch``, ``len_bounds``, ``bad_pattern``. All seeding is
    derived from ``seed`` — same args, same bytes.
    """
    defects = dict(defects or {})
    rng = np.random.default_rng(seed)
    doc_ids = _doc_ids(rng, n_rows)
    lens = np.clip(rng.poisson(mean_len, size=n_rows), 1, MAX_TOK).astype(np.int64)
    total = int(lens.sum())
    flat = rng.integers(0, VOCAB, size=total, dtype=np.int32)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    sources = np.array(SOURCES, dtype=object)[rng.integers(0, len(SOURCES), size=n_rows)]
    n_tok = lens.astype(np.int32)

    expected: Dict[str, int] = {}
    # deterministic defect row selection: spread over the table, disjoint
    # regions per defect kind so counts stay exact.
    cursor = 0

    def pick(k: int) -> np.ndarray:
        nonlocal cursor
        idx = np.arange(cursor, cursor + k) * 3 % n_rows
        cursor += k
        return idx

    tokens_obj: Optional[List] = None  # materialized lazily for list edits

    def ensure_obj():
        nonlocal tokens_obj
        if tokens_obj is None:
            tokens_obj = [flat[offsets[i] : offsets[i + 1]] for i in range(n_rows)]

    if defects.get("dup_doc_id"):
        k = defects["dup_doc_id"]
        idx = pick(k)
        # duplicate each picked doc_id onto its neighbor row
        doc_ids[(idx + 1) % n_rows] = doc_ids[idx]
        expected["unique_doc_id"] = k
    if defects.get("skewed_dup"):
        hot = doc_ids[0]
        n_hot = max(2, n_rows // 10)
        doc_ids[:n_hot] = hot
        expected["unique_doc_id"] = expected.get("unique_doc_id", 0) + 1
    if defects.get("bad_ref"):
        k = defects["bad_ref"]
        idx = pick(k)
        sources[idx] = "unknown_src"
        expected["fk_source"] = k
    if defects.get("null_doc_id"):
        k = defects["null_doc_id"]
        idx = pick(k)
        doc_ids[idx] = None
        expected["doc_id.not_null"] = k
    if defects.get("bad_token_range"):
        k = defects["bad_token_range"]
        idx = pick(k)
        ensure_obj()
        for j, i in enumerate(idx):
            arr = tokens_obj[i].copy()
            arr[0] = VOCAB + 17 if j % 2 == 0 else -1
            tokens_obj[i] = arr
        expected["tokens.items[minInclusive(0),maxExclusive(50257)]"] = k
    if defects.get("n_tok_mismatch"):
        k = defects["n_tok_mismatch"]
        idx = pick(k)
        n_tok[idx] = n_tok[idx] + 5
        expected["n_tok_equals_len_tokens"] = k
    if defects.get("len_bounds"):
        k = defects["len_bounds"]
        idx = pick(k)
        ensure_obj()
        for i in idx:
            tokens_obj[i] = np.zeros(0, dtype=np.int32)  # empty < minLength(1)
            n_tok[i] = 0
        expected["tokens.minLength(1)"] = k
    if defects.get("bad_pattern"):
        k = defects["bad_pattern"]
        idx = pick(k)
        doc_ids[idx] = [f"BAD-{i}" for i in idx]
        expected["doc_id.pattern('doc-[0-9a-f]{12}')"] = k

    if tokens_obj is not None:
        tokens_arr = pa.array(
            [t if t is not None else None for t in tokens_obj], type=pa.list_(pa.int32())
        )
    else:
        tokens_arr = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), pa.array(flat, type=pa.int32())
        )

    seq = pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "tokens": tokens_arr,
            "n_tok": pa.array(n_tok, type=pa.int32()),
            "source": pa.array(sources, type=pa.string()),
        },
        schema=SEQ_SCHEMA,
    )
    dim_rng = np.random.default_rng(seed + 1)
    dim = pa.table(
        {
            "source": pa.array(SOURCES, type=pa.string()),
            "weight": pa.array(dim_rng.random(len(SOURCES)), type=pa.float64()),
        }
    )
    return seq, dim, expected


def write_sequences_corpus(
    out_dir: str,
    n_rows: int = 4000,
    n_files: int = 8,
    seed: int = 42,
    mean_len: int = 512,
    defects: Optional[Dict[str, int]] = None,
) -> Tuple[str, str, Dict[str, int]]:
    """Write a multi-file corpus (≥8 files exercises lineage/resume).

    Returns ``(sequences_dir, sources_path, expected_counts)``.
    """
    defects = dict(defects or {})
    bad_dtype = defects.pop("bad_dtype", 0)
    seq, dim, expected = generate_sequences(n_rows, seed=seed, mean_len=mean_len, defects=defects)
    seq_dir = os.path.join(out_dir, "sequences")
    os.makedirs(seq_dir, exist_ok=True)
    per = (seq.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        chunk = seq.slice(i * per, per)
        if chunk.num_rows == 0:
            break
        if bad_dtype and i == 0:
            # one input file with n_tok widened to int64: a partition-level
            # schema/dtype violation (FIXTURES.md `bad_dtype`; the analog of
            # the reference's type-instance check, simple_types.py:504-506)
            idx = chunk.schema.get_field_index("n_tok")
            chunk = chunk.set_column(
                idx, pa.field("n_tok", pa.int64()), chunk["n_tok"].cast(pa.int64())
            )
            expected["schema.dtype"] = 1
        pq.write_table(chunk, os.path.join(seq_dir, f"seq-{i:04d}.parquet"))
    dim_path = os.path.join(out_dir, "sources.parquet")
    pq.write_table(dim, dim_path)
    return seq_dir, dim_path, expected


def _write_clean_seq_file(seq_dir: str, i: int, n_i: int, seed: int, mean_len: int) -> int:
    """Generate + write clean file ``i`` of a scaled corpus. Fully
    determined by ``(seed, i)`` — identical bytes whether run serially or
    as a Ray task."""
    rng = np.random.default_rng((seed << 20) + i)
    lens = np.clip(rng.poisson(mean_len, size=n_i), 1, MAX_TOK).astype(np.int64)
    flat = rng.integers(0, VOCAB, size=int(lens.sum()), dtype=np.int32)
    offsets = np.zeros(n_i + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    # globally unique ids: file index in the high bits
    base = np.int64(i) << np.int64(28)
    ids = [f"doc-{int(base + j):012x}" for j in range(n_i)]
    srcs = np.array(SOURCES, dtype=object)[rng.integers(0, len(SOURCES), size=n_i)]
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.string()),
            "tokens": pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int64()).cast(pa.int32()),
                pa.array(flat, type=pa.int32()),
            ),
            "n_tok": pa.array(lens.astype(np.int32), type=pa.int32()),
            "source": pa.array(srcs, type=pa.string()),
        },
        schema=SEQ_SCHEMA,
    )
    pq.write_table(tbl, os.path.join(seq_dir, f"seq-{i:04d}.parquet"))
    return n_i


def write_scaled_corpus(
    out_dir: str,
    n_rows: int,
    n_files: int = 64,
    seed: int = 42,
    mean_len: int = 512,
    defects: Optional[Dict[str, int]] = None,
) -> Tuple[str, str, Dict[str, int]]:
    """Benchmark-scale corpus: generated and written file-by-file so memory
    stays bounded at one file's worth regardless of total size.

    File 0 carries the seeded defects (via :func:`generate_sequences`);
    files 1..n are clean, with globally unique doc_ids (the file index is
    folded into the id). Deterministic: (seed, i) fully determines file i.
    """
    defects = dict(defects or {})
    seq_dir = os.path.join(out_dir, "sequences")
    os.makedirs(seq_dir, exist_ok=True)
    per = (n_rows + n_files - 1) // n_files

    seq0, dim, expected = generate_sequences(per, seed=seed, mean_len=mean_len, defects=defects)
    pq.write_table(seq0, os.path.join(seq_dir, "seq-0000.parquet"))

    todo = [i for i in range(1, n_files) if min(per, n_rows - per * i) > 0]
    # (seed, i) fully determines file i, so clean files generate
    # INDEPENDENTLY — fan out as Ray tasks when a session is up (a 62 GiB
    # corpus takes ~2 h single-threaded, minutes wide). Library rule
    # intact: no ray.init here; the serial path covers sessionless use.
    import ray as _ray

    if _ray.is_initialized() and len(todo) > 2:
        gen_remote = _ray.remote(num_cpus=1)(_write_clean_seq_file)
        _ray.get(
            [gen_remote.remote(seq_dir, i, min(per, n_rows - per * i), seed, mean_len) for i in todo]
        )
    else:
        for i in todo:
            _write_clean_seq_file(seq_dir, i, min(per, n_rows - per * i), seed, mean_len)

    dim_path = os.path.join(out_dir, "sources.parquet")
    pq.write_table(dim, dim_path)
    return seq_dir, dim_path, expected


# -- derive the sequence shape from driver testdata ----------------------


def tokenize_words_batch(table: pa.Table, vocab: int = VOCAB) -> pa.Table:
    """Vectorized deterministic word→token-id derivation for one batch.

    Splits ``text`` on whitespace with an Arrow kernel, hashes every word
    with a stable 64-bit hash, and maps into ``[0, vocab)`` — no Python
    loop over rows; list offsets are reused zero-copy to rebuild the
    ``tokens`` list column.
    """
    import pyarrow.compute as pc

    from xmlschema_ray.engine.stats import hash64

    text = table["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.ascii_split_whitespace(text)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.values.to_numpy(zero_copy_only=False)
    ids = (hash64(flat) % np.uint64(vocab)).astype(np.int32)
    tokens = pa.ListArray.from_arrays(words.offsets, pa.array(ids, type=pa.int32()))
    n_tok = pc.cast(pc.list_value_length(tokens), pa.int32())
    doc_num = table["doc_id"].to_numpy(zero_copy_only=False)
    doc_id = pa.array([f"doc-{int(v):012x}" for v in doc_num], type=pa.string())
    source = table["source"]
    if isinstance(source, pa.ChunkedArray):
        source = source.combine_chunks()
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": n_tok,
            "source": pc.cast(source, pa.string()),
        },
        schema=SEQ_SCHEMA,
    )


def sequences_from_documents(sf_dir: str):
    """``documents.parquet`` → sequence-shaped Ray Dataset (lazy)."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "source"]
    )
    return ds.map_batches(tokenize_words_batch, batch_format="pyarrow", zero_copy_batch=True)
