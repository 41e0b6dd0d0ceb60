"""Padding-waste report: brute-force layout replay (both orders), the
sorted-batching dominance property, exact waste arithmetic on a crafted
corpus, empty corpus."""

import hashlib

import numpy as np
import pandas as pd

from xmlschema_ray.pipelines.curation import padding_waste_report


def _corpus(tmp_path, texts, name="sf"):
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    pd.DataFrame({"doc_id": list(range(len(texts))), "text": texts}).to_parquet(
        d / "documents.parquet", index=False
    )
    return str(d)


def _brute(texts, batch_rows):
    lens = [len(t.split()) for t in texts]
    ids = list(range(len(texts)))
    out = {}
    for method, order in (
        ("shuffled", sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))),
        ("sorted", sorted(ids, key=lambda i: (lens[i], i))),
    ):
        slots = total = 0
        nb = 0
        for s in range(0, len(order), batch_rows):
            chunk = [lens[i] for i in order[s : s + batch_rows]]
            slots += max(chunk) * len(chunk)
            total += sum(chunk)
            nb += 1
        out[method] = (nb, total, slots - total, (100 * (slots - total)) // slots if slots else 0)
    return out


def test_padding_waste_matches_bruteforce(ray_session, tmp_path):
    rng = np.random.default_rng(13)
    texts = [" ".join(["w"] * int(n)) for n in rng.integers(1, 400, 500)]
    got = padding_waste_report(_corpus(tmp_path, texts), batch_rows=64).set_index("method")
    want = _brute(texts, 64)
    for m in ("shuffled", "sorted"):
        assert (
            int(got.loc[m, "n_batches"]),
            int(got.loc[m, "total_tokens"]),
            int(got.loc[m, "padded_slots"]),
            int(got.loc[m, "waste_pct"]),
        ) == want[m]
    # length-sorted batching never pads more than a shuffled layout
    assert got.loc["sorted", "padded_slots"] <= got.loc["shuffled", "padded_slots"]
    # and on a wide length spread it is strictly better
    assert got.loc["sorted", "padded_slots"] < got.loc["shuffled", "padded_slots"]


def test_padding_waste_exact_on_crafted_batches(ray_session, tmp_path):
    # 4 docs of lens 1,1,9,9 with batch_rows=2: sorted batches pad 0;
    # worst shuffled case pads 16 — verify exact values per layout
    texts = ["a", "b", " ".join(["x"] * 9), " ".join(["y"] * 9)]
    got = padding_waste_report(_corpus(tmp_path, texts), batch_rows=2).set_index("method")
    assert got.loc["sorted", "padded_slots"] == 0 and got.loc["sorted", "waste_pct"] == 0
    assert int(got.loc["sorted", "total_tokens"]) == 20
    want = _brute(texts, 2)
    assert int(got.loc["shuffled", "padded_slots"]) == want["shuffled"][2]


def test_padding_waste_empty_corpus(ray_session, tmp_path):
    got = padding_waste_report(_corpus(tmp_path, []), batch_rows=8)
    assert list(got["method"]) == ["shuffled", "sorted"]
    assert (got["n_batches"] == 0).all() and (got["padded_slots"] == 0).all()
