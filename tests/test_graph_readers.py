"""Connected components + multi-format readers."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from xmlschema_ray.ops.graph import connected_components_distributed, union_find


def test_union_find_components():
    roots = union_find([1, 2, 3, 4, 5, 6], [(1, 2), (2, 3), (5, 6)])
    assert roots[1] == roots[2] == roots[3] == 1
    assert roots[4] == 4
    assert roots[5] == roots[6] == 5


def test_distributed_components_match_union_find(ray_session):
    rng = np.random.default_rng(11)
    nodes = np.arange(200, dtype=np.int64)
    pairs = [tuple(sorted(p)) for p in rng.integers(0, 200, size=(150, 2)) if p[0] != p[1]]
    truth = union_find(nodes, pairs)
    edges = rd.from_pandas(pd.DataFrame(pairs, columns=["a", "b"]).astype("int64"))
    cc = connected_components_distributed(edges, nodes, max_rounds=30)
    got = dict(zip(cc["node"], cc["root"]))
    # same partition structure (roots may differ only by representative —
    # min-label uses the minimum, same as our union-find tie-break)
    assert got == truth


def test_joined_components_match_union_find(ray_session):
    from xmlschema_ray.ops.graph import connected_components_joined

    rng = np.random.default_rng(7)
    nodes = np.arange(300, dtype=np.int64)
    pairs = [tuple(sorted(p)) for p in rng.integers(0, 300, size=(180, 2)) if p[0] != p[1]]
    # add a long chain so convergence needs pointer jumping, not just
    # 1-hop propagation
    pairs += [(i, i + 1) for i in range(200, 260)]
    truth = union_find(nodes, pairs)
    edges = rd.from_pandas(pd.DataFrame(pairs, columns=["a", "b"]).astype("int64"))
    nodes_ds = rd.from_pandas(pd.DataFrame({"node": nodes}))
    cc = connected_components_joined(edges, nodes_ds, num_partitions=4).to_pandas()
    got = dict(zip(cc["node"], cc["root"]))
    assert got == truth
    # all three paths identical
    cc_b = connected_components_distributed(edges, nodes, max_rounds=30)
    assert dict(zip(cc_b["node"], cc_b["root"])) == truth


def test_joined_components_empty_edges(ray_session):
    from xmlschema_ray.ops.graph import connected_components_joined

    nodes_ds = rd.from_pandas(pd.DataFrame({"node": np.arange(5, dtype=np.int64)}))
    edges = rd.from_pandas(pd.DataFrame({"a": [], "b": []}).astype("int64"))
    cc = connected_components_joined(edges, nodes_ds).to_pandas().sort_values("node")
    assert cc["root"].tolist() == list(range(5))


def test_read_table_csv_json_with_coercion(tmp_path, ray_session):
    from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints
    from xmlschema_ray.sources.readers import read_table

    df = pd.DataFrame({"id": [1, 2, 3], "score": [1.5, 2.5, 3.5], "name": ["a", "b", "c"]})
    csv_path = str(tmp_path / "t.csv")
    json_path = str(tmp_path / "t.json")
    df.to_csv(csv_path, index=False)
    df.to_json(json_path, orient="records", lines=True)

    spec = TableConstraints(
        name="t",
        columns=[
            ColumnSpec("id", pa.int32()),
            ColumnSpec("score", pa.float32()),
            ColumnSpec("name", pa.string()),
        ],
    )
    for path, fmt in ((csv_path, "csv"), (json_path, "json")):
        ds = read_table(path, format=fmt, spec=spec)
        tbl = pa.Table.from_pandas(ds.to_pandas())
        out = ds.to_pandas()
        assert out["id"].tolist() == [1, 2, 3]
        assert ds.schema().base_schema.field("id").type == pa.int32()
        assert ds.schema().base_schema.field("score").type == pa.float32()

    with pytest.raises(ValueError):
        read_table(csv_path, format="xml")


def test_read_table_unparseable_cells_become_nulls(tmp_path, ray_session):
    """Decode-with-errors: lexically invalid CSV cells null out instead of
    crashing the read task (reference simple_types.py:501-540)."""
    from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints
    from xmlschema_ray.sources.readers import read_table

    csv_path = str(tmp_path / "dirty.csv")
    with open(csv_path, "w") as f:
        f.write("id,score,when\n1,1.5,2024-01-01\nnope,bad,never\n3,2.5,2024-03-05\n")

    spec = TableConstraints(
        name="t",
        columns=[
            ColumnSpec("id", pa.int64()),
            ColumnSpec("score", pa.float64()),
            ColumnSpec("when", pa.timestamp("us")),
        ],
    )
    out = read_table(csv_path, format="csv", spec=spec).to_pandas()
    assert out["id"].tolist()[0] == 1 and out["id"].tolist()[2] == 3
    assert pd.isna(out["id"].iloc[1])
    assert pd.isna(out["score"].iloc[1])
    assert pd.isna(out["when"].iloc[1])
    assert out["when"].iloc[0] == pd.Timestamp("2024-01-01")


def test_knn_ivf_recall(ray_session):
    """IVF ANN recall@10 vs exact brute force on the embeddings table."""
    from xmlschema_ray.pipelines.similarity import knn_cosine, knn_ivf

    sf = "/root/testdata/sf0.001"
    exact = knn_cosine(sf)
    approx = knn_ivf(sf, n_probe=8)
    recalls = []
    for q, g in exact.groupby("query_id"):
        truth = set(g["vec_id"])
        got = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(truth & got) / len(truth))
    assert np.mean(recalls) >= 0.5, recalls


def test_resumable_write_skips_finished_shards(tmp_path, ray_session):
    import glob

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from xmlschema_ray.sources.sinks import chunk_files, resumable_write

    src = tmp_path / "in"
    src.mkdir()
    for i in range(4):
        pq.write_table(pa.table({"x": list(range(i * 10, i * 10 + 10))}), src / f"f{i}.parquet")
    shards = chunk_files(glob.glob(str(src / "*.parquet")), 2)
    assert [len(s) for s in shards] == [2, 2]

    calls = []

    def make(shard):
        calls.append(tuple(shard))
        return rd.read_parquet(shard).map_batches(
            lambda t: t, batch_format="pyarrow", zero_copy_batch=True
        )

    out = tmp_path / "out"
    r1 = resumable_write(make, shards, str(out))
    assert r1 == {"n_shards": 2, "n_skipped": 0, "n_rows": 40}
    assert len(calls) == 2
    # resume: nothing recomputed, totals stable
    r2 = resumable_write(make, shards, str(out))
    assert r2 == {"n_shards": 2, "n_skipped": 2, "n_rows": 40}
    assert len(calls) == 2
    # partial-failure sim: drop shard 1's manifest line; only it re-runs
    mf = out / "manifest.jsonl"
    lines = mf.read_text().strip().splitlines()
    mf.write_text(lines[0] + "\n")
    r3 = resumable_write(make, shards, str(out))
    assert r3 == {"n_shards": 2, "n_skipped": 1, "n_rows": 40}
    assert len(calls) == 3
    assert pads.dataset(str(out / "unified")).count_rows() == 40


def test_lexical_decode_exact_big_ints(tmp_path, ray_session):
    """A bad cell must not force valid int64 keys through float64 (values
    above 2^53 were silently corrupted), and non-integer lexical forms
    ('1.0', '1e3') must null out per the XSD integer lexical space."""
    from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints
    from xmlschema_ray.sources.readers import read_table

    csv_path = str(tmp_path / "big.csv")
    with open(csv_path, "w") as f:
        f.write("id\n9007199254740993\nxyz\n1.0\n1e3\n-7\n")
    spec = TableConstraints(name="t", columns=[ColumnSpec("id", pa.int64(), nullable=True)])
    ds = read_table(csv_path, format="csv", spec=spec)
    # assert at the ARROW level: a pandas round-trip would itself convert
    # nullable int64 to float64 and re-introduce the corruption under test
    batch = ds.take_batch(10, batch_format="pyarrow")
    assert batch.schema.field("id").type == pa.int64()
    assert batch["id"].to_pylist() == [9007199254740993, None, None, None, -7]


def test_knn_ivf_index_path_matches_streaming(ray_session, tmp_path):
    """The bucket-partitioned index plan (probed-bucket reads) must produce
    exactly the streaming plan's rows — IO pruning, same candidates."""
    from xmlschema_ray.pipelines.similarity import build_ivf_index, knn_ivf

    sf = "/root/testdata/sf0.001"
    stream = knn_ivf(sf, oracle_dump=False)
    idx = str(tmp_path / "ivf_index")
    indexed = knn_ivf(sf, oracle_dump=False, index_dir=idx)
    import pandas as pd

    pd.testing.assert_frame_equal(stream, indexed)
    # index layout: hive centroid partitions + saved centroid matrix
    import os

    assert os.path.exists(os.path.join(idx, "centroids.npy"))
    assert any(d.startswith("centroid=") for d in os.listdir(idx))
    # rebuild is a cache hit (centroids loaded, no rewrite)
    import numpy as np

    c1 = build_ivf_index(sf, idx)
    assert isinstance(c1, np.ndarray) and c1.ndim == 2


def test_knn_distributed_merge_matches_driver(ray_session, monkeypatch):
    """Forced-path: the query-keyed distributed top-k reduce must equal
    the driver concat exactly (associative combiner → same exact top-k)."""
    from xmlschema_ray.pipelines import similarity as S

    sf = "/root/testdata/sf0.001"
    # BOTH driver-path results computed BEFORE the monkeypatch so each
    # comparison is genuinely driver-vs-distributed
    driver = S.knn_cosine(sf)
    lsh_driver = S.knn_lsh(sf, oracle_dump=False)
    monkeypatch.setattr(S, "KNN_DISTRIBUTED_THRESHOLD_BYTES", 0)
    dist = S.knn_cosine(sf)
    lsh_dist = S.knn_lsh(sf, oracle_dump=False)
    pd.testing.assert_frame_equal(driver.reset_index(drop=True), dist.reset_index(drop=True))
    pd.testing.assert_frame_equal(
        lsh_driver.reset_index(drop=True), lsh_dist.reset_index(drop=True)
    )


def test_ivf_index_interrupted_build_recovers(tmp_path, ray_session):
    """build_ivf_index is atomic (tmp dir + rename): a leftover .tmp from
    a crashed build is ignored/cleaned and the rebuilt index is complete;
    an EXISTING index is reused (centroids loaded, no rebuild)."""
    import os

    import numpy as np

    from xmlschema_ray.pipelines.similarity import build_ivf_index

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "ivf")
    # simulate a crashed build: half-written tmp dir, no final dir
    os.makedirs(idx + ".tmp/centroid=0", exist_ok=True)
    open(idx + ".tmp/centroid=0/garbage.parquet", "w").write("not parquet")
    c1 = build_ivf_index(sf, idx, n_centroids=4, sample_size=256)
    assert os.path.exists(os.path.join(idx, "centroids.npy"))
    assert not os.path.exists(idx + ".tmp")
    buckets = [d for d in os.listdir(idx) if d.startswith("centroid=")]
    assert buckets, "no bucket partitions written"
    # second call must REUSE (identical centroids, no rebuild)
    c2 = build_ivf_index(sf, idx, n_centroids=4, sample_size=256)
    assert np.array_equal(c1, c2)


def test_embedding_top_component_matches_eigh(ray_session):
    """Distributed power iteration vs numpy's exact eigendecomposition of
    X'X: same top direction (|cos| ~ 1), eigenvalue within 0.1%, and the
    run is deterministic across invocations."""
    import numpy as np
    import pandas as pd

    from xmlschema_ray.pipelines.similarity import embedding_top_component

    sf = "/root/testdata/sf0.001"
    out = embedding_top_component(sf)
    v = out.sort_values("dim")["component"].to_numpy()
    emb = pd.read_parquet(f"{sf}/embeddings.parquet", columns=["embedding"])
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    w, vecs = np.linalg.eigh(x.T @ x)
    top = vecs[:, -1]
    assert abs(float(v @ top)) > 0.999
    assert abs(out["eigenvalue"].iloc[0] - w[-1]) / w[-1] < 1e-3
    # sign convention: largest-|coordinate| entry positive
    assert v[int(np.argmax(np.abs(v)))] > 0
    out2 = embedding_top_component(sf)
    pd.testing.assert_frame_equal(out, out2)


def test_embedding_top_component_forced_matvec_path(ray_session):
    """The distributed matvec plan (forced via threshold=0) finds the same
    direction as the covariance plan."""
    import numpy as np

    from xmlschema_ray.pipelines.similarity import embedding_top_component

    sf = "/root/testdata/sf0.001"
    a = embedding_top_component(sf)
    b = embedding_top_component(sf, covariance_dim_threshold=0)
    ca = a.sort_values("dim")["component"].to_numpy()
    cb = b.sort_values("dim")["component"].to_numpy()
    assert abs(float(ca @ cb)) > 0.999999
    # the default plan quantizes embeddings at 1e-6 for SQL-oracle
    # bit-exactness (r5); the float matvec plan does not — eigenvalues
    # agree to the quantization error, not to float epsilon
    assert abs(a["eigenvalue"].iloc[0] - b["eigenvalue"].iloc[0]) / a["eigenvalue"].iloc[0] < 1e-4
