import pandas as pd
import pyarrow as pa

import ray.data as rd

from xmlschema_ray.ops.transform import fill_defaults, parse_booleans, parse_timestamps


def test_fill_defaults(ray_session):
    ds = rd.from_arrow(
        pa.table({"a": pa.array([1, None, 3], type=pa.int64()), "b": pa.array(["x", None, None])})
    )
    out = fill_defaults(ds, {"a": 0, "b": "unknown"}).to_pandas()
    assert out["a"].tolist() == [1, 0, 3]
    assert out["b"].tolist() == ["x", "unknown", "unknown"]


def test_parse_timestamps_invalid_becomes_null(ray_session):
    ds = rd.from_arrow(pa.table({"ts": pa.array(["2024-01-02 03:04:05", "not a date"])}))
    out = parse_timestamps(ds, "ts").to_pandas()
    assert out["ts"].iloc[0] == pd.Timestamp("2024-01-02 03:04:05")
    assert pd.isna(out["ts"].iloc[1])


def test_parse_booleans(ray_session):
    ds = rd.from_arrow(pa.table({"f": pa.array(["true", "0", "1", "false", "junk", None])}))
    out = parse_booleans(ds, "f").to_pandas()
    assert out["f"].tolist()[:4] == [True, False, True, False]
    assert pd.isna(out["f"].iloc[4]) and pd.isna(out["f"].iloc[5])


def test_normalize_rewrite_sink(tmp_path, ray_session):
    """Encoder-direction repair sink: whiteSpace-facet normalization,
    default fill, canonical dtype cast; output validates CLEAN under the
    same spec; resumable (second run skips every shard)."""
    import os

    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from xmlschema_ray.constraints import facets as F
    from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints
    from xmlschema_ray.engine.encode import normalize_rewrite
    from xmlschema_ray.engine.engine import ValidationEngine

    src = str(tmp_path / "src")
    os.makedirs(src)
    for i in range(2):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([2 * i, 2 * i + 1], type=pa.int64()),
                    "text": [" a\tb \n", "ok"],
                    # int32 on disk; spec declares int64 (canonical cast)
                    "score": pa.array([None, 7], type=pa.int32()),
                }
            ),
            os.path.join(src, f"p{i}.parquet"),
        )

    spec = TableConstraints(
        name="t",
        columns=[
            ColumnSpec("doc_id", pa.int64()),
            ColumnSpec("text", pa.string(), facets=(F.WhiteSpace("collapse"),)),
            ColumnSpec("score", pa.int64(), facets=(F.MinInclusive(0),)),
        ],
        key_columns=("doc_id",),
    ).compile()

    out = str(tmp_path / "norm")
    stats = normalize_rewrite(src, spec, out, defaults={"score": 0}, n_shards=2)
    assert stats == {"n_shards": 2, "n_skipped": 0, "n_rows": 4}

    norm_files = sorted(
        os.path.join(r, x)
        for r, _, fs in os.walk(out)
        for x in fs
        if x.endswith(".parquet")
    )
    t = pads.dataset(norm_files).to_table().sort_by("doc_id")
    assert t.schema.field("score").type == pa.int64()
    assert t["text"].to_pylist() == ["a b", "ok", "a b", "ok"]
    assert t["score"].to_pylist() == [0, 7, 0, 7]

    # the rewritten corpus validates clean under the SAME spec
    res = ValidationEngine(spec, batch_size=64, n_shards=1).run(
        norm_files,
        out_dir=str(tmp_path / "v"),
    )
    assert res.job_validity == "valid" and res.n_violations == 0

    # resume: everything skips
    stats2 = normalize_rewrite(src, spec, out, defaults={"score": 0}, n_shards=2)
    assert stats2 == {"n_shards": 2, "n_skipped": 2, "n_rows": 4}


def test_engine_run_repair_out(tmp_path, ray_session):
    """ValidationEngine.run(repair_out=...): one call validates AND writes
    the canonicalized rewrite; the rewrite validates clean on whiteSpace."""
    import os

    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from xmlschema_ray.constraints import facets as F
    from xmlschema_ray.constraints.spec import ColumnSpec, TableConstraints
    from xmlschema_ray.engine.engine import ValidationEngine

    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2], type=pa.int64()), "text": [" x\ty ", "ok"]}),
        os.path.join(src, "p0.parquet"),
    )
    spec = TableConstraints(
        name="t",
        columns=[
            ColumnSpec("doc_id", pa.int64()),
            ColumnSpec("text", pa.string(), facets=(F.WhiteSpace("collapse"),)),
        ],
        key_columns=("doc_id",),
    ).compile()
    rep = str(tmp_path / "rep")
    res = ValidationEngine(spec, batch_size=64, n_shards=1).run(
        src, out_dir=str(tmp_path / "o"), repair_out=rep
    )
    # input had whiteSpace violations...
    assert res.job_validity == "invalid"
    # ...but the repair is canonical
    files = [
        os.path.join(r, f) for r, _, fs in os.walk(rep) for f in fs if f.endswith(".parquet")
    ]
    t = pads.dataset(sorted(files)).to_table().sort_by("doc_id")
    assert t["text"].to_pylist() == ["x y", "ok"]
