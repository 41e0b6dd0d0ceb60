"""BPE family: distributed pair counts, capped-vocab merge training, and
fixed-merge application — each proven against an independent brute-force
path (the SQL oracles cover pair_counts / apply_fixed; training is
iterative and rows-only at the driver, so its exactness lives here)."""

import collections

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xmlschema_ray.pipelines.bpe import (
    FIXED_MERGES,
    _apply_merges_spaced,
    _pair_count_partial,
    bpe_pair_counts,
    bpe_train,
    train_merges_from_word_counts,
)

SF = "/root/testdata/sf0.001"


def _brute_words(texts):
    for t in texts:
        for w in t.lower().split():
            if w:
                yield w


def _brute_train(texts, num_merges):
    """Independent per-document brute-force BPE: symbol streams per word
    (never a word-count table), dict pair counting, greedy merge."""
    docs = [[list(w) for w in t.lower().split() if w] for t in texts]
    merges = []
    for rank in range(1, num_merges + 1):
        counts = collections.Counter()
        for doc in docs:
            for syms in doc:
                for i in range(len(syms) - 1):
                    counts[(syms[i], syms[i + 1])] += 1
        if not counts:
            break
        best_n = max(counts.values())
        a, b = min(p for p, v in counts.items() if v == best_n)
        merges.append((rank, a, b, best_n))
        for doc in docs:
            for j, syms in enumerate(doc):
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                doc[j] = out
    return merges


def _greedy_apply(word, merges):
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_pair_partial_matches_counter():
    texts = ["Hello world", "the the cat", "a", "", "的是 的"]
    batch = pa.table({"text": texts})
    got = _pair_count_partial(batch).set_index("pair")["n"].to_dict()
    want = collections.Counter()
    for w in _brute_words(texts):
        for i in range(len(w) - 1):
            want[w[i : i + 2]] += 1
    assert got == dict(want)


def test_bpe_train_matches_per_document_bruteforce():
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])["text"].to_pylist()
    brute = _brute_train(texts, 8)
    got = bpe_train(SF, num_merges=8)
    assert list(map(tuple, got.to_records(index=False))) == brute


def test_bpe_train_round1_is_top_pair():
    top = bpe_pair_counts(SF, k=1).iloc[0]
    m1 = bpe_train(SF, num_merges=1).iloc[0]
    assert m1["left"] + m1["right"] == top["pair"]
    assert m1["n"] == top["n"]


def test_vocab_cap_drops_tail_only():
    # capped training on a skewed toy table == uncapped when cap >= vocab
    wc = [("aab", 10), ("ab", 5), ("zq", 1)]
    full = train_merges_from_word_counts(wc, 3)
    capped = train_merges_from_word_counts(wc[:2], 3)
    # 'ab' dominates both; the hapax tail only perturbs counts, not ranks 1-2
    assert full.loc[0, ["left", "right"]].tolist() == capped.loc[0, ["left", "right"]].tolist()


def test_two_pass_replace_equals_greedy_bpe():
    # adversarial chains: alternating digraph runs, partial overlaps,
    # merged-symbol reuse in later merges
    merges = FIXED_MERGES
    words = [
        "ththththt",
        "thethethe",
        "ininin",
        "andandand",
        "rerere",
        "ononon",
        "tthhee",
        "thin",
        "anthem",
        "northern",
        "的是",
        "x",
        "",
    ]
    uwords = np.unique(np.array(words, dtype=str))
    spaced = np.char.add(np.char.add(" ", np.char.join(" ", uwords)), " ")
    applied = _apply_merges_spaced(spaced, merges)
    n_sym = np.char.count(applied, " ").astype(np.int64) - 1
    for w, n in zip(uwords, n_sym):
        expect = len(_greedy_apply(w, merges)) if w else 1  # '' -> 1 slot, masked upstream
        assert n == expect, (w, n, expect)


@pytest.mark.parametrize("a,b", [("t", "h"), ("th", "e")])
def test_fixed_merges_no_self_overlap(a, b):
    assert a != b


def test_cdc_resynchronizes_after_insertion(tmp_path, ray_session):
    """The CDC property: a shared passage at DIFFERENT offsets in two
    documents still produces identical chunk fingerprints once a
    content-defined boundary inside it resynchronizes the chunking."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from xmlschema_ray.pipelines.dedup import cdc_boilerplate_chunks

    def is_boundary(w):
        return hashlib.md5(w.encode()).hexdigest()[0] in "0123"

    # build a shared passage that contains at least one boundary word
    cands = [f"tok{i}" for i in range(50)]
    boundary_words = [w for w in cands if is_boundary(w)]
    plain_words = [w for w in cands if not is_boundary(w)]
    shared = " ".join(
        [plain_words[0], boundary_words[0], plain_words[1], plain_words[2],
         boundary_words[1], plain_words[3]]
    )
    doc_a = "alpha " + shared
    doc_b = "beta gamma delta " + shared  # different prefix length
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": [1, 2], "text": [doc_a, doc_b]}), d / "documents.parquet"
    )
    out = cdc_boilerplate_chunks(str(d)).to_pandas()
    # the chunk(s) opened at boundary_words inside the shared region are
    # byte-identical in both docs despite the offset shift
    assert (out["n_docs"] == 2).any()


def test_bpe_train_sql_matches_trainer_on_equal_pair_runs():
    """The oracle's repeated-leftmost-replace recursion must equal the
    trainer's greedy scan INCLUDING the a == b case a global two-pass
    replace mis-pairs (odd runs of 5+: greedy gives [aa,aa,a], a global
    replace can give [aa,a,aa] — different next-round pair counts)."""
    import duckdb
    import pandas as pd

    from xmlschema_ray.pipelines.bpe import (
        _bpe_train_sql,
        train_merges_from_word_counts,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "aaaaa aaaaa aaaaaaa",     # odd runs of 5 and 7 force (a,a)
                "aaaaa banana bananas",
                "aaa aab the the then",
            ],
        }
    )
    words = {}
    for t in docs["text"]:
        for w in t.lower().split():
            words[w] = words.get(w, 0) + 1
    expect = train_merges_from_word_counts(sorted(words.items()), num_merges=6)
    assert (expect["left"] == expect["right"]).any(), "fixture must select an a==b merge"

    con = duckdb.connect()
    con.register("documents", docs)
    got = con.execute(_bpe_train_sql(num_merges=6)).df()
    got["rank"] = got["rank"].astype("int64")
    got["n"] = got["n"].astype("int64")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), expect.reset_index(drop=True)
    )
