"""BPE tokenizer induction over the corpus — distributed pair counting,
capped-vocabulary merge training, and merge application.

The tokens-axis completion of the curation module's ``encode_documents``
(fixed byte vocab): here the vocabulary is LEARNED from the corpus, the
way a production tokenizer trainer does it. The reference has no analog
(its lexical layer stops at whiteSpace/pattern facets,
``validators/facets.py:564-628``); the north-rule mandates the
training-data operator set, and a trainable tokenizer is its core tokens
operator. Public algorithm: Sennrich et al. 2016 (BPE for NMT) with the
capped word-frequency-table trainer design every public implementation
(subword-nmt, SentencePiece, HF tokenizers) uses.

Scale design
------------
* **Pair counting is a combiner aggregate**: each batch emits one row per
  DISTINCT adjacent character pair (alphabet²-bounded, a few thousand
  rows at most — far below the doc count), merged by
  :func:`~xmlschema_ray.ops.relational.combiner_aggregate`. The flat
  character stream never leaves the batch; pairs are counted on uint32
  codepoint codes (``utf-32`` view of the joined words — no per-char
  Python objects) and only the batch's few distinct pairs are decoded to
  strings.
* **Training runs on the word-frequency table, not the corpus** — the
  standard trainer shape: a distributed word count (combiner + partial
  top-k capped at ``vocab_cap`` by frequency) reduces 100 TB of text to
  a ≤``vocab_cap``-row driver table; the merge loop is O(vocab · word
  len · merges) driver work, independent of corpus size. When the cap
  trips, the tail of hapax words is dropped exactly like a trainer's
  ``min_frequency`` floor (documented approximation; at the test SFs the
  vocabulary is far below the cap, so training is exact).
* **Application is vectorized replace on the batch's unique words**:
  merges apply to each distinct word once per batch (vocabulary-bounded,
  not row-bounded) via ``np.char`` kernels, then broadcast back through
  the ``np.unique`` inverse.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from xmlschema_ray.pipelines.common import table_path

# -- shared batch scaffold ------------------------------------------------


def _lower_words(text: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Flat lowercased word array for a batch (ONE Arrow lower+split pass;
    empty boundary fields retained — they contribute no character pairs
    and are masked where word identity matters)."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lists = pc.utf8_split_whitespace(pc.utf8_lower(text))
    return pc.list_flatten(lists).to_numpy(zero_copy_only=False)


# -- distributed adjacent-pair counting ----------------------------------


def _pair_count_partial(batch: pa.Table) -> pd.DataFrame:
    """Distinct adjacent character-pair counts for one batch.

    The joined word stream is viewed as uint32 codepoints (``utf-32-le``
    buffer — 4 B/char, no per-char Python objects); adjacent pairs become
    uint64 codes, ``np.unique`` reduces them, and only the batch's few
    distinct pairs are decoded back to 2-char strings. NUL separates
    words so no pair crosses a word boundary.
    """
    empty = pd.DataFrame(
        {"pair": pd.Series([], dtype=object), "n": pd.Series([], dtype="int64")}
    )
    words = _lower_words(batch["text"])
    if len(words) == 0:
        return empty
    joined = "\x00".join(words.tolist())
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    if len(codes) < 2:
        return empty
    left, right = codes[:-1], codes[1:]
    mask = (left != 0) & (right != 0)
    pair_codes = (left[mask].astype(np.uint64) << np.uint64(32)) | right[mask].astype(
        np.uint64
    )
    u, c = np.unique(pair_codes, return_counts=True)
    pairs = np.array(
        [chr(int(h >> np.uint64(32))) + chr(int(h & np.uint64(0xFFFFFFFF))) for h in u],
        dtype=object,
    )
    return pd.DataFrame({"pair": pairs, "n": c.astype(np.int64)})


def bpe_pair_counts(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Top-``k`` adjacent character pairs within whitespace words of the
    lowercased corpus — round zero of BPE training, fully distributed
    (per-batch codepoint-pair partials → hash-partitioned merge → partial
    top-k; the driver sees ``k`` rows)."""
    from xmlschema_ray.ops.relational import combiner_aggregate, topk

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["text"])
    partials = ds.map_batches(_pair_count_partial, batch_format="pyarrow")
    counts = combiner_aggregate(partials, "pair", {"n": ("n", "sum")})
    out = topk(counts, "n", k, descending=True, tiebreak=["pair"]).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


BPE_PAIR_COUNTS_SQL = r"""
WITH w AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word FROM documents
), p AS (
  SELECT substring(word, i, 2) AS pair
  FROM w, LATERAL unnest(generate_series(1, length(word) - 1)) AS t(i)
  WHERE length(word) >= 2
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
FROM p GROUP BY pair
ORDER BY n DESC, pair
LIMIT 50
"""


# -- merge training (capped word-frequency table) ------------------------


def _word_count_partial(batch: pa.Table) -> pd.DataFrame:
    words = _lower_words(batch["text"])
    words = words[words != ""]
    if len(words) == 0:
        return pd.DataFrame(
            {"word": pd.Series([], dtype=object), "n": pd.Series([], dtype="int64")}
        )
    u, c = np.unique(words.astype(str), return_counts=True)
    return pd.DataFrame({"word": u.astype(object), "n": c.astype(np.int64)})


def train_merges_from_word_counts(
    word_counts: List[Tuple[str, int]], num_merges: int
) -> pd.DataFrame:
    """Classic BPE merge loop over a (word, count) table (Sennrich et al.
    2016, algorithm 1): each round counts symbol pairs weighted by word
    frequency, takes the argmax (ties broken by lexicographically
    smallest ``(left, right)`` for determinism), and greedily merges it
    left-to-right in every word. Pure driver function — its input is the
    capped vocabulary table, never the corpus."""
    words = [list(w) for w, _ in word_counts]
    counts = [int(c) for _, c in word_counts]
    rows = []
    for rank in range(1, num_merges + 1):
        pair_n: Dict[Tuple[str, str], int] = {}
        for syms, c in zip(words, counts):
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_n[p] = pair_n.get(p, 0) + c
        if not pair_n:
            break
        best_n = max(pair_n.values())
        a, b = min(p for p, v in pair_n.items() if v == best_n)
        rows.append((rank, a, b, best_n))
        ab = a + b
        for wi, syms in enumerate(words):
            if len(syms) < 2:
                continue
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
    return pd.DataFrame(
        {
            "rank": pd.Series([r[0] for r in rows], dtype="int64"),
            "left": pd.Series([r[1] for r in rows], dtype=object),
            "right": pd.Series([r[2] for r in rows], dtype=object),
            "n": pd.Series([r[3] for r in rows], dtype="int64"),
        }
    )


def bpe_train(sf_dir: str, num_merges: int = 12, vocab_cap: int = 65536) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus.

    Distributed word-frequency reduction (combiner partials → hash merge
    → frequency-ordered partial top-``vocab_cap``) feeds the driver merge
    loop. HASH-EXACT oracle: the iterative argmax is expressible as a
    ``num_merges``-step chained CTE with a recursive leftmost-replace
    apply (see :func:`_bpe_train_sql`); exactness is additionally proven
    by ``tests/test_bpe.py`` against an independent per-document
    brute-force trainer, and round 1 equals ``bpe_pair_counts``' top row
    by construction."""
    from xmlschema_ray.ops.relational import combiner_aggregate, topk

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["text"])
    partials = ds.map_batches(_word_count_partial, batch_format="pyarrow")
    counts = combiner_aggregate(partials, "word", {"n": ("n", "sum")})
    vocab = topk(counts, "n", vocab_cap, descending=True, tiebreak=["word"]).to_pandas()
    return train_merges_from_word_counts(
        list(zip(vocab["word"].tolist(), vocab["n"].tolist())), num_merges
    )


# -- merge application ----------------------------------------------------

# A fixed, ordered merge list (common English digraphs; later merges
# consume earlier outputs). Every merge MUST have left != right: the
# two-pass replace used below is exactly greedy left-to-right BPE only
# when the ' left right ' pattern cannot self-overlap (a chain like
# 'a a a' under a merge (a, a) has ambiguous pairings). Asserted at
# import.
FIXED_MERGES: Tuple[Tuple[str, str], ...] = (
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("an", "d"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
)
assert all(a != b for a, b in FIXED_MERGES)


def _apply_merges_spaced(spaced: np.ndarray, merges) -> np.ndarray:
    """Apply ordered merges to space-separated symbol strings (each
    wrapped in one leading/trailing space).

    ``replace`` is left-to-right non-overlapping, but consecutive
    ``' a b a b '`` occurrences share a boundary space, so one pass takes
    every other occurrence; the survivors are then isolated (their
    neighbors merged), so a SECOND pass catches all of them — two passes
    equal greedy BPE exactly when ``a != b`` (no symbol-sharing overlap).
    Vectorized over the array (unique words, not rows)."""
    for a, b in merges:
        pat, rep = f" {a} {b} ", f" {a}{b} "
        spaced = np.char.replace(np.char.replace(spaced, pat, rep), pat, rep)
    return spaced


def bpe_apply_fixed(sf_dir: str) -> "rd.Dataset":
    """Per-document symbol count after applying :data:`FIXED_MERGES` —
    the tokenizer-application operator (what a trained merge table does
    to the corpus), with a FIXED merge list so a SQL oracle can replay
    the identical nested replaces.

    Per batch: unique lowercased words → spaced symbol strings →
    vectorized two-pass replaces per merge → symbol counts broadcast back
    through the unique inverse → one weighted bincount per document. The
    per-word work is vocabulary-bounded; rows only pay the inverse
    gather."""
    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pd.DataFrame:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lists = pc.utf8_split_whitespace(pc.utf8_lower(text))
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        n_rows = len(batch)
        doc_ids = batch["doc_id"].to_numpy().astype(np.int64)
        if len(flat) == 0:
            return pd.DataFrame(
                {"doc_id": doc_ids, "n_symbols": np.zeros(n_rows, dtype=np.int64)}
            )
        uwords, inverse = np.unique(flat.astype(str), return_inverse=True)
        spaced = np.char.add(np.char.add(" ", np.char.join(" ", uwords)), " ")
        spaced = _apply_merges_spaced(spaced, FIXED_MERGES)
        n_sym = np.char.count(spaced, " ").astype(np.int64) - 1
        n_sym[uwords == ""] = 0
        per_doc = np.bincount(parent, weights=n_sym[inverse], minlength=n_rows)
        return pd.DataFrame(
            {"doc_id": doc_ids, "n_symbols": per_doc.astype(np.int64)}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def tokenizer_fertility_by_lang(sf_dir: str) -> pd.DataFrame:
    """Tokenizer compression parity across languages: per-``lang`` totals
    of word characters and post-merge BPE symbols under
    :data:`FIXED_MERGES`, plus ``chars_per_symbol_ppm`` — the fertility /
    compression-ratio audit run before committing a tokenizer to a
    multilingual corpus (languages the merge table under-serves show
    ratios near 1.0; well-served ones compress above it).

    Same vectorized unique-word apply as :func:`bpe_apply_fixed`, reduced
    per batch to ≤ #langs partial rows (integer sums) and merged in one
    combiner exchange; the single float op is the final ppm division per
    LANGUAGE (5 rows), bit-equal to the oracle's.
    """
    from xmlschema_ray.ops.relational import combiner_aggregate
    from xmlschema_ray.pipelines.common import scaled_int

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["lang", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "lang": pd.Series([], dtype=object),
                "n_docs": pd.Series([], dtype="int64"),
                "n_chars": pd.Series([], dtype="int64"),
                "n_symbols": pd.Series([], dtype="int64"),
            }
        )
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_rows = len(batch)
        if n_rows == 0:
            return empty
        lists = pc.utf8_split_whitespace(pc.utf8_lower(text))
        flat_arrow = pc.list_flatten(lists)
        flat = flat_arrow.to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        flat_len = pc.utf8_length(flat_arrow).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(flat) == 0:
            per_doc_sym = np.zeros(n_rows, dtype=np.int64)
            per_doc_chars = np.zeros(n_rows, dtype=np.int64)
        else:
            uwords, inverse = np.unique(flat.astype(str), return_inverse=True)
            spaced = np.char.add(np.char.add(" ", np.char.join(" ", uwords)), " ")
            spaced = _apply_merges_spaced(spaced, FIXED_MERGES)
            n_sym = np.char.count(spaced, " ").astype(np.int64) - 1
            n_sym[uwords == ""] = 0
            per_doc_sym = np.bincount(
                parent, weights=n_sym[inverse], minlength=n_rows
            ).astype(np.int64)
            per_doc_chars = np.bincount(
                parent, weights=flat_len, minlength=n_rows
            ).astype(np.int64)
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_numpy(zero_copy_only=False),
                "n_chars": per_doc_chars,
                "n_symbols": per_doc_sym,
            }
        )
        g = df.groupby("lang", sort=False).agg(
            n_docs=("n_chars", "size"), n_chars=("n_chars", "sum"), n_symbols=("n_symbols", "sum")
        )
        return g.reset_index()

    agg = combiner_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        "lang",
        {
            "n_docs": ("n_docs", "sum"),
            "n_chars": ("n_chars", "sum"),
            "n_symbols": ("n_symbols", "sum"),
        },
    ).to_pandas()
    agg = agg.astype({c: "int64" for c in ["n_docs", "n_chars", "n_symbols"]})
    agg["chars_per_symbol_ppm"] = scaled_int(
        agg["n_chars"].to_numpy(np.int64).astype(np.float64)
        / agg["n_symbols"].to_numpy(np.int64).astype(np.float64),
        1e6,
    )
    return agg.sort_values("lang").reset_index(drop=True)


def _fertility_sql() -> str:
    expr = "' ' || array_to_string(string_split(word, ''), ' ') || ' '"
    for a, b in FIXED_MERGES:
        pat, rep = f" {a} {b} ", f" {a}{b} "
        expr = f"replace(replace({expr}, '{pat}', '{rep}'), '{pat}', '{rep}')"
    return rf"""
WITH w AS (
  SELECT doc_id, lang, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
  FROM documents
), applied AS (
  SELECT doc_id, lang, length(word) AS wc, trim({expr}) AS s
  FROM w WHERE word <> ''
), per_word AS (
  SELECT doc_id, lang, wc, length(s) - length(replace(s, ' ', '')) + 1 AS ns
  FROM applied
), per_doc AS (
  SELECT doc_id, lang, SUM(wc) AS c, SUM(ns) AS ns FROM per_word GROUP BY doc_id, lang
), per_lang AS (
  SELECT d.lang,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(COALESCE(SUM(p.c), 0) AS BIGINT) AS n_chars,
    CAST(COALESCE(SUM(p.ns), 0) AS BIGINT) AS n_symbols
  FROM documents d LEFT JOIN per_doc p USING (doc_id)
  GROUP BY d.lang
)
SELECT lang, n_docs, n_chars, n_symbols,
  CAST(floor(1000000.0 * (CAST(n_chars AS DOUBLE) / CAST(n_symbols AS DOUBLE)) + 0.5) AS BIGINT)
    AS chars_per_symbol_ppm
FROM per_lang ORDER BY lang
"""


TOKENIZER_FERTILITY_SQL = _fertility_sql()


def _apply_fixed_sql() -> str:
    expr = "' ' || array_to_string(string_split(word, ''), ' ') || ' '"
    for a, b in FIXED_MERGES:
        pat, rep = f" {a} {b} ", f" {a}{b} "
        # two replace passes per merge — same greedy-equivalence argument
        # as _apply_merges_spaced
        expr = f"replace(replace({expr}, '{pat}', '{rep}'), '{pat}', '{rep}')"
    return rf"""
WITH w AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
  FROM documents
), applied AS (
  SELECT doc_id, trim({expr}) AS s FROM w WHERE word <> ''
), counted AS (
  SELECT doc_id, SUM(length(s) - length(replace(s, ' ', '')) + 1) AS n
  FROM applied GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_symbols
FROM documents d LEFT JOIN counted c USING (doc_id)
"""


BPE_APPLY_FIXED_SQL = _apply_fixed_sql()


def _bpe_train_sql(num_merges: int = 12, vocab_cap: int = 65536) -> str:
    """HASH-EXACT oracle for :func:`bpe_train`: the iterative merge argmax
    as a ``num_merges``-step chained CTE. Each round re-derives pair
    counts from the previous round's symbolized vocabulary, takes the
    argmax with the trainer's exact tie-break (max count, then
    lexicographically smallest ``(left, right)`` — DuckDB's binary string
    collation equals Python's codepoint order under UTF-8), and applies
    the merge by REPEATED LEFTMOST single replacement in a recursive CTE.
    Leftmost-iterate ≡ the trainer's greedy left-to-right scan: merging
    (a,b) can never create a new (a,b) adjacency (|a+b| > |a|,|b|), so
    both consume exactly the same occurrence set — including the a == b
    run case a global two-pass ``replace`` would mis-pair (odd runs of 5+
    pair differently). The vocabulary cap mirrors ``topk``'s
    (count DESC, word ASC) selection."""
    parts = [
        r"""word_counts AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word FROM documents
  ) WHERE word <> '' GROUP BY word
),
words AS MATERIALIZED (
  SELECT word, n FROM word_counts
  QUALIFY row_number() OVER (ORDER BY n DESC, word) <= """
        + str(int(vocab_cap))
        + """
),
r0_words AS MATERIALIZED (
  SELECT word, n, ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS s
  FROM words
)"""
    ]
    for i in range(1, int(num_merges) + 1):
        p = i - 1
        parts.append(
            f"""r{i}_pairs AS MATERIALIZED (
  SELECT l, r, CAST(SUM(n) AS BIGINT) AS cnt FROM (
    SELECT syms[pos] AS l, syms[pos + 1] AS r, n FROM (
      SELECT string_split(trim(s, ' '), ' ') AS syms, n FROM r{p}_words
    ), LATERAL unnest(generate_series(1, len(syms) - 1)) AS t(pos)
  ) GROUP BY l, r
),
r{i}_best AS MATERIALIZED (
  SELECT l, r, cnt, ' ' || l || ' ' || r || ' ' AS pat, ' ' || l || r || ' ' AS rep
  FROM r{i}_pairs ORDER BY cnt DESC, l, r LIMIT 1
),
r{i}_iter(word, n, s) AS (
  SELECT word, n, s FROM r{p}_words
  UNION ALL
  SELECT it.word, it.n,
         substr(it.s, 1, strpos(it.s, b.pat) - 1) || b.rep
         || substr(it.s, strpos(it.s, b.pat) + length(b.pat))
  FROM r{i}_iter it, r{i}_best b
  WHERE strpos(it.s, b.pat) > 0
),
r{i}_words AS MATERIALIZED (
  SELECT it.word, it.n, it.s FROM r{i}_iter it
  WHERE NOT EXISTS (SELECT 1 FROM r{i}_best b WHERE strpos(it.s, b.pat) > 0)
)"""
        )
    finals = "\nUNION ALL\n".join(
        f'SELECT CAST({i} AS BIGINT) AS rank, l AS "left", r AS "right", cnt AS n '
        f"FROM r{i}_best"
        for i in range(1, int(num_merges) + 1)
    )
    return (
        "WITH RECURSIVE\n"
        + ",\n".join(parts)
        + f"\nSELECT * FROM (\n{finals}\n) ORDER BY rank"
    )


BPE_TRAIN_SQL = _bpe_train_sql()


ORACLES: Dict[str, str] = {
    "bpe_pair_counts": BPE_PAIR_COUNTS_SQL,
    "bpe_train": BPE_TRAIN_SQL,
    "bpe_apply_fixed": BPE_APPLY_FIXED_SQL,
    "tokenizer_fertility_by_lang": TOKENIZER_FERTILITY_SQL,
}

QUERIES = {
    "bpe_pair_counts": bpe_pair_counts,
    "bpe_train": bpe_train,
    "bpe_apply_fixed": bpe_apply_fixed,
    "tokenizer_fertility_by_lang": tokenizer_fertility_by_lang,
}
