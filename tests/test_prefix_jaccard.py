"""prefix_jaccard_pairs — exact shingle-set similarity self-join via
prefix filtering: brute-force all-pairs equality on a crafted corpus
(planted qualifying pairs incl. an exactly-at-threshold pair,
sub-threshold decoys, empty/too-short docs), driver-vs-distributed
forced-path identity, word-mode (shingle_words=1) brute-force equality,
and the max_bucket guard. The no-blocking DuckDB oracle additionally
gates the full pipeline at 3 SFs."""

import itertools

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xmlschema_ray.pipelines.dedup import prefix_jaccard_pairs


DOCS = {
    1: "a b c d e f g h i j",
    2: "a b c d e f g h i k",  # 7 of 9 shingles shared -> J = 7/9 ≈ 0.78
    3: "a b c x y z",  # shares only 'a b c' with 1 -> J = 1/11
    4: "m n o p q r s t u v",
    5: "m n o p q r s t u v",  # identical -> J = 1
    6: "",
    7: "   ",
    8: "one two",  # < 3 words -> empty shingle set, excluded
    9: "q w e",
    10: "q w e",  # singleton shingle sets, J = 1
    11: "q w e r",  # shingles {qwe, wer}; with 9: J = 1/2 — AT the threshold
}


def _write(tmp_path):
    df = pd.DataFrame({"doc_id": list(DOCS), "text": list(DOCS.values())})
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False), tmp_path / "documents.parquet"
    )
    return str(tmp_path)


def _sets(k=3):
    out = {}
    for d, t in DOCS.items():
        ws = t.split()
        out[d] = {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}
    return out


def _brute(tau_num=1, tau_den=2, k=3):
    sets = _sets(k)
    out = []
    for a, b in itertools.combinations(sorted(DOCS), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        c = len(sa & sb)
        u = len(sa | sb)
        if tau_den * c >= tau_num * u:
            out.append((a, b, c, len(sa), len(sb), c / u))
    return pd.DataFrame(
        out, columns=["doc_id_a", "doc_id_b", "n_common", "n_a", "n_b", "jac"]
    ).astype({c: "int64" for c in ["doc_id_a", "doc_id_b", "n_common", "n_a", "n_b"]})


def test_matches_brute_force(tmp_path, ray_session):
    got = prefix_jaccard_pairs(_write(tmp_path))
    want = _brute()
    pd.testing.assert_frame_equal(got, want)
    # (1,2) near-dup, (4,5) exact dup, (9,10) singleton dup, (9,11)+(10,11)
    # exactly at J = 1/2; decoy (1,3) excluded
    assert set(zip(want["doc_id_a"], want["doc_id_b"])) == {
        (1, 2),
        (4, 5),
        (9, 10),
        (9, 11),
        (10, 11),
    }


def test_word_mode_matches_brute_force(tmp_path, ray_session):
    got = prefix_jaccard_pairs(_write(tmp_path), tau_num=7, tau_den=10, shingle_words=1)
    want = _brute(tau_num=7, tau_den=10, k=1)
    pd.testing.assert_frame_equal(got, want)


def test_forced_paths_identical(tmp_path, ray_session):
    sf = _write(tmp_path)
    driver = prefix_jaccard_pairs(sf, distributed_threshold_bytes=1 << 40)
    dist = prefix_jaccard_pairs(sf, distributed_threshold_bytes=0)
    pd.testing.assert_frame_equal(driver, dist)


def test_max_bucket_guard(tmp_path, ray_session):
    # every doc is the same 3 words -> one shingle in every prefix
    df = pd.DataFrame({"doc_id": range(10), "text": ["x y z"] * 10})
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False), tmp_path / "documents.parquet"
    )
    with pytest.raises(Exception, match="max_bucket"):
        prefix_jaccard_pairs(str(tmp_path), max_bucket=5)


def test_prefix_length_formula():
    # n - ceil(tau*n) + 1 spot checks at tau = 1/2 and 7/10
    for num, den, n, want in [
        (1, 2, 1, 1),
        (1, 2, 2, 2),
        (1, 2, 9, 5),
        (7, 10, 10, 4),
        (7, 10, 11, 4),
        (7, 10, 20, 7),
    ]:
        L = n - (-((-num * n) // den)) + 1
        assert L == want, (num, den, n, L, want)
