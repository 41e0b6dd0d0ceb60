"""Leakage-safe splitting + quality-aware dedup representative selection:
both consume the minhash near-dup labels, so the properties are checked
against an INDEPENDENT pandas recompute from the labels + raw documents."""

import hashlib

import pandas as pd

import ray

SF_DIR = "/root/testdata/sf0.001"


def _labels():
    from xmlschema_ray.pipelines.dedup import minhash_lsh_dedup

    return minhash_lsh_dedup(SF_DIR).to_pandas()


def test_leakage_split_is_cluster_coherent(ray_session):
    from xmlschema_ray.pipelines.dedup import leakage_safe_split

    sp = leakage_safe_split(SF_DIR).to_pandas()
    # every cluster lands wholly in one split — the guard the op exists for
    assert (sp.groupby("cluster_root")["split"].nunique() == 1).all()
    # corpus has real multi-member clusters, so the property is non-vacuous
    assert (sp.groupby("cluster_root").size() >= 2).any()
    # split is the declared function of the root hash, row by row
    def expected(root):
        h = hashlib.md5(str(root).encode()).hexdigest()[0]
        return "test" if h >= "e" else ("val" if h >= "c" else "train")

    assert (sp["split"] == sp["cluster_root"].map(expected)).all()
    assert set(sp["split"].unique()) == {"train", "val", "test"}
    # all docs assigned exactly once
    assert sp["doc_id"].is_unique and len(sp) == 500


def test_cross_source_dup_matrix_matches_pandas_recompute(ray_session):
    from xmlschema_ray.pipelines.dedup import cross_source_dup_matrix, minhash_verified_pairs

    got = cross_source_dup_matrix(SF_DIR)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    edges, _, _ = minhash_verified_pairs(SF_DIR)
    e = edges.to_pandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "source"])
    m = e.merge(docs.rename(columns={"doc_id": "a", "source": "sa"}), on="a").merge(
        docs.rename(columns={"doc_id": "b", "source": "sb"}), on="b"
    )
    lo, hi = m[["sa", "sb"]].min(axis=1), m[["sa", "sb"]].max(axis=1)
    exp = (
        pd.DataFrame({"source_a": lo, "source_b": hi})
        .groupby(["source_a", "source_b"])
        .size()
        .rename("n_pairs")
        .reset_index()
        .sort_values(["source_a", "source_b"])
        .reset_index(drop=True)
    )
    exp["n_pairs"] = exp["n_pairs"].astype("int64")
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)
    assert int(got["n_pairs"].sum()) == len(e) > 0
    # forced distributed plan (two bucketed joins + combiner) is identical
    forced = cross_source_dup_matrix(SF_DIR, broadcast_pairs_threshold=0)
    forced = forced.to_pandas() if hasattr(forced, "to_pandas") else forced
    pd.testing.assert_frame_equal(forced.reset_index(drop=True), exp)


def test_embedding_centroids_match_numpy(ray_session):
    import numpy as np

    from xmlschema_ray.pipelines.similarity import embedding_centroids_by_label

    got = embedding_centroids_by_label(SF_DIR).to_pandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["label", "embedding"])
    mat = np.floor(np.stack(emb["embedding"].to_numpy()).astype(np.float64) * 1e6 + 0.5).astype(
        np.int64
    )
    for label, g in got.groupby("label"):
        sel = mat[(emb["label"] == label).to_numpy()]
        assert (g["n"] == len(sel)).all()
        assert np.array_equal(g.sort_values("dim")["sum_scaled"].to_numpy(), sel.sum(axis=0))
        assert np.array_equal(
            g.sort_values("dim")["centroid_scaled"].to_numpy(),
            sel.sum(axis=0).astype(np.float64) / len(sel),
        )
    assert got["label"].nunique() >= 2 and len(got) == got["label"].nunique() * 64


def test_pretraining_manifest_consistent_with_parts(ray_session):
    """The composed manifest must agree with its constituent operators:
    selected docs ⊆ train split ∩ gopher-keep ∩ not-dropped, counted
    per source (full recompute from the three already-tested parts)."""
    from xmlschema_ray.pipelines.curation import pretraining_manifest
    from xmlschema_ray.pipelines.dedup import dedup_keep_best, leakage_safe_split
    from xmlschema_ray.pipelines.textstats import gopher_quality_flags

    got = pretraining_manifest(SF_DIR)
    sp = leakage_safe_split(SF_DIR).to_pandas()
    kb = dedup_keep_best(SF_DIR).to_pandas()
    gq = gopher_quality_flags(SF_DIR).to_pandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "source"])
    m = sp.merge(gq[["doc_id", "n_words", "keep"]], on="doc_id").merge(docs, on="doc_id")
    m = m.merge(kb[["cluster_root", "keep_doc_id"]], on="cluster_root", how="left")
    sel = (
        (m["split"] == "train")
        & (m["keep"] == 1)
        & (m["keep_doc_id"].isna() | (m["keep_doc_id"] == m["doc_id"]))
    )
    exp = (
        m[sel]
        .groupby("source")
        .agg(n_docs=("doc_id", "size"), n_tokens=("n_words", "sum"))
        .reset_index()
        .sort_values("source")
        .reset_index(drop=True)
        .astype({"n_docs": "int64", "n_tokens": "int64"})
    )
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0 and (got["n_docs"] > 0).any()


def test_dedup_keep_best_matches_pandas_recompute(ray_session):
    from xmlschema_ray.pipelines.dedup import dedup_keep_best

    got = dedup_keep_best(SF_DIR).to_pandas()
    labels = _labels()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "n_chars"])
    j = labels.merge(docs, on="doc_id")
    j = j.sort_values(["cluster_root", "n_chars", "doc_id"], ascending=[True, False, True])
    g = j.groupby("cluster_root", sort=True)
    exp = g.head(1).rename(columns={"doc_id": "keep_doc_id", "n_chars": "keep_n_chars"})
    exp = exp.merge(g.size().rename("n_members").reset_index(), on="cluster_root")
    exp = exp[exp["n_members"] >= 2].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        exp[["cluster_root", "keep_doc_id", "keep_n_chars", "n_members"]].astype("int64"),
    )
    assert len(got) > 0
