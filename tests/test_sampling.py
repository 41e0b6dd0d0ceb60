"""Cross-block seeded sampling for model fits (ops/sample.py).

The failure mode this guards: at 100 TB the first blocks of a corpus come
from ONE file of ONE source, so a first-N "sample" fits k-means centroids
to a single cluster and silently degrades IVF recall corpus-wide. The
fixture below writes a corpus physically sorted cluster-major (the first
rows are all cluster 0) and proves the seeded sample spans every cluster
and IVF recall holds.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

DIM = 16
N_CLUSTERS = 4
ROWS_PER_CLUSTER = 500


def _clustered_corpus(tmp_path):
    """Embeddings table physically ordered cluster-major; query ids 0..4
    are assigned one per cluster (round-robin) so exact top-k neighbors of
    each query live in a different physical region of the file."""
    rng = np.random.default_rng(11)
    centers = np.eye(N_CLUSTERS, DIM) * 10.0
    vecs, cluster = [], []
    for c in range(N_CLUSTERS):
        vecs.append(centers[c] + rng.normal(0, 0.05, size=(ROWS_PER_CLUSTER, DIM)))
        cluster.extend([c] * ROWS_PER_CLUSTER)
    mat = np.concatenate(vecs).astype(np.float32)
    n = len(mat)
    # vec_ids: row i of cluster c gets id c + N_CLUSTERS*i → ids 0..4 spread
    # across clusters while the PHYSICAL order stays cluster-major
    ids = np.array(
        [c + N_CLUSTERS * i for c in range(N_CLUSTERS) for i in range(ROWS_PER_CLUSTER)],
        dtype=np.int64,
    )
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    tbl = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.array([list(map(float, v)) for v in mat], type=pa.list_(pa.float64())),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "embeddings.parquet"), row_group_size=200)
    return sf_dir, ids, np.array(cluster)


def test_seeded_sample_spans_clusters_and_is_deterministic(ray_session, tmp_path):
    from xmlschema_ray.ops.sample import seeded_embedding_sample, seeded_sample_pandas

    sf_dir, ids, cluster = _clustered_corpus(tmp_path)
    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    sample = seeded_embedding_sample(ds, 200)
    assert sample.shape == (200, DIM)
    # which cluster each sampled vector belongs to (nearest axis center)
    sampled_clusters = sample[:, :N_CLUSTERS].argmax(axis=1)
    counts = np.bincount(sampled_clusters, minlength=N_CLUSTERS)
    # a first-N slice would give counts == [200, 0, 0, 0]
    assert (counts > 20).all(), counts

    # deterministic across repeated runs and parallelism
    s1 = seeded_sample_pandas(ds, "vec_id", ["vec_id"], 150)
    s2 = seeded_sample_pandas(ds.repartition(7), "vec_id", ["vec_id"], 150)
    pd.testing.assert_frame_equal(s1, s2)
    # bounded: never more than sample_size rows on the driver result
    assert len(s1) == 150


def test_ivf_recall_on_cluster_sorted_corpus(ray_session, tmp_path):
    """knn_ivf must keep recall on a corpus whose head is single-cluster —
    the exact case first-N sampling breaks (its centroids would all land
    in cluster 0 and probes of other clusters return noise)."""
    from xmlschema_ray.pipelines.similarity import knn_cosine, knn_ivf

    sf_dir, _, _ = _clustered_corpus(tmp_path)
    exact = knn_cosine(sf_dir)
    approx = knn_ivf(
        sf_dir, n_centroids=N_CLUSTERS, n_probe=1, sample_size=300, oracle_dump=False
    )
    recalls = []
    for q, g in exact.groupby("query_id"):
        truth = set(g["vec_id"])
        got = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(truth & got) / len(truth))
    # n_probe=1 on well-separated clusters: recall is ~1.0 when the fit saw
    # every cluster, ~0.25 when it only saw the head cluster
    assert np.mean(recalls) >= 0.8, recalls


def test_weighted_sample_weight_bias_and_merge_invariance(ray_session):
    """Priority sampling: heavier docs are overrepresented vs uniform, the
    bottom-k is identical under any batch split (merge property), and the
    priority key replays exactly."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    from xmlschema_ray.pipelines.curation import weighted_sample_docs

    n = 3000
    w = np.where(np.arange(n) % 10 == 0, 5000, 50).astype(np.int64)  # 10% heavy
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "n_chars": w})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df), os.path.join(d, "documents.parquet"))
        out = weighted_sample_docs(d, k=300)
    assert len(out) == 300
    # exact replay of the key
    h = np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16) for i in df["doc_id"]],
        dtype=np.int64,
    )
    pri = h.astype(np.float64) / w.astype(np.float64)
    want = df.assign(priority=pri).sort_values(["priority", "doc_id"]).head(300)
    assert out["doc_id"].tolist() == want["doc_id"].tolist()
    assert out["priority"].tolist() == want["priority"].tolist()
    # weight bias: heavy docs are 10% of corpus but dominate the sample
    heavy_frac = (out["n_chars"] == 5000).mean()
    assert heavy_frac > 0.5


# -- join-output sampling ------------------------------------------------------


def test_join_sample_rows_are_real_join_rows(ray_session):
    import numpy as np
    import pandas as pd

    from xmlschema_ray.pipelines.relational import join_sample_orders_lineitem

    SF = "/root/testdata/sf0.001"
    out = join_sample_orders_lineitem(SF, k=50)
    assert len(out) == 50
    # every sampled row must be an actual orders x lineitem join row
    o = pd.read_parquet(SF + "/orders.parquet", columns=["o_orderkey", "o_custkey"])
    li = pd.read_parquet(SF + "/lineitem.parquet", columns=["l_orderkey", "l_linenumber"])
    opairs = set(zip(o["o_orderkey"], o["o_custkey"]))
    lpairs = set(zip(li["l_orderkey"], li["l_linenumber"]))
    assert set(zip(out["o_orderkey"], out["o_custkey"])) <= opairs
    assert set(zip(out["o_orderkey"], out["l_linenumber"])) <= lpairs
    # deterministic: a second run is identical
    out2 = join_sample_orders_lineitem(SF, k=50)
    pd.testing.assert_frame_equal(out, out2)
    # priorities ascend (bottom-k cut)
    assert (np.diff(out["priority"].to_numpy()) >= 0).all()
