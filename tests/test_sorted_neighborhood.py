"""sorted_neighborhood_pairs — merge/purge windowed blocking over the
global (text, doc_id) order: brute-force rank-window equality on a
crafted corpus, forced tiny block_size proving cross-boundary windows
are complete and pairs never duplicate, window >= N degeneracy, and the
empty-input typed schema. The DuckDB row_number self-join oracle
additionally gates the full pipeline at 3 SFs."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from xmlschema_ray.pipelines.dedup import sorted_neighborhood_pairs


DOCS = {
    # crafted so the sorted order interleaves similar and dissimilar docs,
    # with duplicates (dice=1) and near-misses around the 0.8 cut
    1: "alpha beta gamma delta epsilon",
    2: "alpha beta gamma delta zeta",  # 4 shared of 5+5 -> dice 0.8 (AT cut)
    3: "alpha beta gamma other words entirely",
    4: "zz yy xx ww vv",
    5: "alpha beta gamma delta epsilon",  # dup of 1 -> dice 1
    6: "alpha beta gamma delta epsilon eta",  # 5 of 5+6 -> dice 10/11 < wait, 2*5/(5+6)=0.909
    7: "mm nn oo pp",
    8: "mm nn oo pp qq",  # 4 of 4+5 -> dice 8/9 ≈ 0.889
    9: "solo",
    10: "solo",  # dup -> dice 1
}


def _write(tmp_path, docs=DOCS):
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False), tmp_path / "documents.parquet"
    )
    return str(tmp_path)


def _brute(docs, window=10, dice_pct=80):
    order = sorted(docs.items(), key=lambda kv: (kv[1], kv[0]))
    rows = []
    for i in range(len(order)):
        wa = set(order[i][1].split(" "))
        for j in range(i + 1, min(i + window + 1, len(order))):
            wb = set(order[j][1].split(" "))
            inter = len(wa & wb)
            if 200 * inter >= dice_pct * (len(wa) + len(wb)):
                rows.append((order[i][0], order[j][0], inter))
    return (
        pd.DataFrame(rows, columns=["doc_a", "doc_b", "shared_words"])
        .astype("int64")
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def test_brute_force_equality(tmp_path, ray_session):
    sf = _write(tmp_path)
    got = sorted_neighborhood_pairs(sf, window=3, dice_pct=80)
    exp = _brute(DOCS, window=3)
    pd.testing.assert_frame_equal(got, exp)
    assert len(exp) >= 3  # the fixture actually exercises the cut


def test_forced_tiny_blocks_identical(tmp_path, ray_session):
    """block_size=2 forces every window across many bucket boundaries;
    replication must complete each forward window exactly once."""
    sf = _write(tmp_path)
    base = sorted_neighborhood_pairs(sf, window=4, dice_pct=80)
    tiny = sorted_neighborhood_pairs(sf, window=4, dice_pct=80, block_size=2)
    pd.testing.assert_frame_equal(base, tiny)
    # no duplicate pairs from replication
    assert not tiny.duplicated(["doc_a", "doc_b"]).any()


def test_window_exceeds_corpus(tmp_path, ray_session):
    docs = {1: "a b c", 2: "a b c", 3: "a b d"}
    sf = _write(tmp_path, docs)
    got = sorted_neighborhood_pairs(sf, window=50, dice_pct=80)
    exp = _brute(docs, window=50)
    pd.testing.assert_frame_equal(got, exp)


def test_empty_corpus_typed(tmp_path, ray_session):
    df = pd.DataFrame({"doc_id": pd.array([], dtype="int64"), "text": pd.Series([], dtype=object)})
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False), tmp_path / "documents.parquet"
    )
    got = sorted_neighborhood_pairs(str(tmp_path))
    assert list(got.columns) == ["doc_a", "doc_b", "shared_words"]
    assert len(got) == 0
    assert all(str(t) == "int64" for t in got.dtypes)
