"""Reshard movement report: the HRW minimal-movement property (a doc
moves iff its new owner is one of the ADDED shards; mod-hash moves far
more), brute-force owner replay, batch-split invariance, bad params."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from xmlschema_ray.pipelines.curation import reshard_movement_report


def _corpus(tmp_path, ids, name="sf"):
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    pd.DataFrame({"doc_id": ids}).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _owners(doc_id, n):
    w = [
        int(hashlib.md5(f"{doc_id}|{s}".encode()).hexdigest()[:8], 16)
        for s in range(n)
    ]
    return int(np.argmax(w))


def test_reshard_matches_bruteforce_and_hrw_property(ray_session, tmp_path):
    ids = list(range(400))
    got = reshard_movement_report(_corpus(tmp_path, ids)).set_index("method")
    mod_moved = rz_moved = 0
    for i in ids:
        hv = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        if hv % 12 != hv % 16:
            mod_moved += 1
        old, new = _owners(i, 12), _owners(i, 16)
        if old != new:
            rz_moved += 1
            # HRW minimal movement: a doc only moves TO an added shard
            assert new >= 12
    assert got.loc["mod", "n_moved"] == mod_moved
    assert got.loc["rendezvous", "n_moved"] == rz_moved
    assert (got["n_docs"] == len(ids)).all()
    assert got.loc["mod", "moved_pct"] == (100 * mod_moved) // len(ids)
    # rendezvous moves ~4/16 of docs; mod scrambles most of them
    assert got.loc["rendezvous", "n_moved"] < got.loc["mod", "n_moved"]
    assert got.loc["rendezvous", "moved_pct"] <= 40


def test_reshard_split_invariant(ray_session, tmp_path):
    ids = list(range(123))
    one = reshard_movement_report(_corpus(tmp_path, ids, "a"))
    # different file split -> same totals (counter partials merge)
    d = tmp_path / "b"
    d.mkdir()
    pd.DataFrame({"doc_id": ids[:40]}).to_parquet(d / "documents.parquet", index=False)
    import pyarrow.parquet as pq
    import pyarrow as pa

    # multi-file table dir unsupported by table_path (single file), so
    # split via row groups instead
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64())})
    pq.write_table(t, d / "documents.parquet", row_group_size=7)
    two = reshard_movement_report(str(d))
    pd.testing.assert_frame_equal(one, two)


def test_reshard_bad_params(ray_session, tmp_path):
    sf = _corpus(tmp_path, [1, 2, 3])
    with pytest.raises(ValueError):
        reshard_movement_report(sf, n_old=16, n_new=12)
    with pytest.raises(ValueError):
        reshard_movement_report(sf, n_old=0, n_new=4)
