"""Span corruption (span_corrupt_documents): lossless round-trip
reconstruction (input sentinels + target spans ⇒ original token stream),
pure-python rule replay, all/none-masked extremes, order invariance,
empty-text exclusion."""

import hashlib

import pandas as pd
import pytest

from xmlschema_ray.pipelines.curation import span_corrupt_documents


def _corpus(tmp_path, docs):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pd.DataFrame(docs).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _masked(doc_id, blk, mod=5):
    return int(hashlib.md5(f"{doc_id}|{blk}".encode()).hexdigest()[:8], 16) % mod == 0


def _replay(doc_id, text, span_len=3, mod=5):
    words = text.split()
    inp, tgt, k = [], [], -1
    n_spans = n_masked = 0
    seen_blocks = {}
    for i, w in enumerate(words):
        blk = i // span_len
        m = _masked(doc_id, blk, mod)
        if m:
            n_masked += 1
            if blk not in seen_blocks:
                k += 1
                seen_blocks[blk] = k
                n_spans += 1
                inp.append(f"<X_{seen_blocks[blk]}>")
                tgt.append(f"<X_{seen_blocks[blk]}> {w}")
            else:
                tgt.append(w)
        else:
            inp.append(w)
    return n_spans, n_masked, " ".join(inp), " ".join(tgt)


def _reconstruct(input_text, target_text):
    """Invert the corruption: substitute every sentinel in the input with
    its span from the target."""
    spans = {}
    cur = None
    for tok in target_text.split():
        if tok.startswith("<X_"):
            cur = tok
            spans[cur] = []
        else:
            spans[cur].append(tok)
    out = []
    for tok in input_text.split():
        if tok.startswith("<X_"):
            out.extend(spans[tok])
        else:
            out.append(tok)
    return " ".join(out)


_TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "single",
    "two words",
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
]


def test_span_corrupt_matches_replay_and_roundtrips(ray_session, tmp_path):
    docs = {"doc_id": list(range(len(_TEXTS))), "text": _TEXTS}
    out = span_corrupt_documents(_corpus(tmp_path, docs))
    assert len(out) == len(_TEXTS)
    for _, r in out.iterrows():
        ns, nm, inp, tgt = _replay(r["doc_id"], _TEXTS[int(r["doc_id"])])
        assert (r["n_spans"], r["n_masked"]) == (ns, nm)
        assert r["input_text"] == inp
        assert r["target_text"] == tgt
        # the objective is lossless: input + target reconstruct the doc
        rec = _reconstruct(r["input_text"], r["target_text"])
        assert rec == " ".join(_TEXTS[int(r["doc_id"])].split())


def test_span_corrupt_scans_many_ids_for_extremes(ray_session, tmp_path):
    # find ids whose every block masks / never masks for a 9-token doc
    text = "t0 t1 t2 t3 t4 t5 t6 t7 t8"
    all_m = next(
        i for i in range(3000) if all(_masked(i, b) for b in range(3))
    )
    none_m = next(
        i for i in range(3000) if not any(_masked(i, b) for b in range(3))
    )
    docs = {"doc_id": [all_m, none_m], "text": [text, text]}
    out = span_corrupt_documents(_corpus(tmp_path, docs)).set_index("doc_id")
    a = out.loc[all_m]
    assert a["n_spans"] == 3 and a["n_masked"] == 9
    assert a["input_text"] == "<X_0> <X_1> <X_2>"
    assert a["target_text"] == "<X_0> t0 t1 t2 <X_1> t3 t4 t5 <X_2> t6 t7 t8"
    n = out.loc[none_m]
    assert n["n_spans"] == 0 and n["n_masked"] == 0
    assert n["input_text"] == text and n["target_text"] == ""


def test_span_corrupt_empty_text_excluded_and_order_invariant(ray_session, tmp_path):
    docs = {"doc_id": [3, 1, 2], "text": ["", _TEXTS[0], "   "]}
    out = span_corrupt_documents(_corpus(tmp_path, docs))
    assert out["doc_id"].tolist() == [1]
    docs2 = {"doc_id": [1, 2, 3], "text": [_TEXTS[0], "   ", ""]}
    out2 = span_corrupt_documents(_corpus(tmp_path, docs2))
    pd.testing.assert_frame_equal(out, out2)


def test_span_corrupt_partial_last_block(ray_session, tmp_path):
    # 4 tokens -> blocks {0: 3 tokens, 1: 1 token}; a masked partial
    # block must mask only its single token
    did = next(
        i for i in range(3000) if _masked(i, 1) and not _masked(i, 0)
    )
    docs = {"doc_id": [did], "text": ["w0 w1 w2 w3"]}
    out = span_corrupt_documents(_corpus(tmp_path, docs)).iloc[0]
    assert out["n_spans"] == 1 and out["n_masked"] == 1
    assert out["input_text"] == "w0 w1 w2 <X_0>"
    assert out["target_text"] == "<X_0> w3"
