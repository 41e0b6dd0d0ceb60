"""Edge inputs: empty files, all-null columns, single-row corpora."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xmlschema_ray.engine.engine import ValidationEngine
from xmlschema_ray.sources.synthetic import SEQ_SCHEMA, sequences_spec


def _dim():
    return pa.table({"source": pa.array([f"s{i:02d}" for i in range(16)])})


def test_empty_parquet_file(tmp_path, ray_session):
    d = tmp_path / "seq"
    d.mkdir()
    pq.write_table(SEQ_SCHEMA.empty_table(), str(d / "empty.parquet"))
    res = ValidationEngine(sequences_spec(), n_shards=1).run(
        str(d), out_dir=str(tmp_path / "o"), dims={"sources": _dim()}
    )
    assert res.job_validity == "valid"
    assert res.summary["n_rows"] == 0
    assert res.n_violations == 0


def test_single_row_with_null_everything(tmp_path, ray_session):
    d = tmp_path / "seq"
    d.mkdir()
    t = pa.table(
        {
            "doc_id": pa.array([None], type=pa.string()),
            "tokens": pa.array([None], type=pa.list_(pa.int32())),
            "n_tok": pa.array([None], type=pa.int32()),
            "source": pa.array([None], type=pa.string()),
        },
        schema=SEQ_SCHEMA,
    )
    pq.write_table(t, str(d / "one.parquet"))
    res = ValidationEngine(sequences_spec(), n_shards=1).run(
        str(d), out_dir=str(tmp_path / "o"), dims={"sources": _dim()}
    )
    viol = res.violations()
    # four not_null violations, nothing else fires on nulls
    assert sorted(viol["constraint_name"]) == [
        "doc_id.not_null",
        "n_tok.not_null",
        "source.not_null",
        "tokens.not_null",
    ]


def test_missing_required_column(tmp_path, ray_session):
    d = tmp_path / "seq"
    d.mkdir()
    t = pa.table(
        {
            "doc_id": pa.array(["doc-0123456789ab"], type=pa.string()),
            "tokens": pa.array([[1, 2, 3]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([3], type=pa.int32()),
        }
    )
    pq.write_table(t, str(d / "nosource.parquet"))
    res = ValidationEngine(sequences_spec(), n_shards=1).run(
        str(d), out_dir=str(tmp_path / "o"), dims={"sources": _dim()}
    )
    viol = res.violations()
    assert "schema.required_column" in set(viol["constraint_name"])
    assert res.job_validity == "invalid"


def test_empty_result_queries_keep_schema(tmp_path, ray_session):
    """Queries whose results are LEGITIMATELY empty (repeat-free orders,
    identical snapshots, fully-covered customers) must still deliver their
    declared columns — the sort's schema-less-empty behavior is guarded."""
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xmlschema_ray.pipelines.relational import (
        customers_without_events,
        orders_snapshot_diff,
        repeat_orders_within_30d,
    )

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    # one order per customer, far apart -> no repeats-within-30d;
    # every customer has an event -> empty anti-join
    n = 50
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_orderdate": pa.array(
                    pd.to_datetime("2020-01-01") + pd.to_timedelta(np.arange(n) * 90, "D")
                ),
                "o_totalprice": pa.array(np.full(n, 10.0)),
            }
        ),
        os.path.join(sf, "orders.parquet"),
    )
    pq.write_table(
        pa.table({"c_custkey": pa.array(np.arange(n, dtype=np.int64))}),
        os.path.join(sf, "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(np.arange(n, dtype=np.int64)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
            }
        ),
        os.path.join(sf, "events.parquet"),
    )

    def frame(res):
        return res.to_pandas() if hasattr(res, "to_pandas") else res

    r = frame(repeat_orders_within_30d(sf))
    assert len(r) == 0 and "o_orderkey" in r.columns and "prev_orderkey" in r.columns

    c = frame(customers_without_events(sf))
    assert len(c) == 0 and list(c.columns) == ["c_custkey"]


# -- union_with_evolution -----------------------------------------------------


def test_union_with_evolution_fills_and_widens(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from xmlschema_ray.sources.readers import union_with_evolution

    old = rd.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int32()), "x": pa.array([1.0, 2.0])})
    )
    new = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([3], pa.int64()),
                "x": pa.array([3.0]),
                "tag": pa.array(["t"]),
                "extra_dropped": pa.array([9]),
            }
        )
    )
    schema = pa.schema([("k", pa.int64()), ("x", pa.float64()), ("tag", pa.string())])
    out = (
        union_with_evolution([old, new], schema)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert str(out["k"].dtype) == "int64" and out["k"].tolist() == [1, 2, 3]
    assert out["tag"].tolist()[:2] == [None, None] and out["tag"].iloc[2] == "t"
    assert "extra_dropped" not in out.columns


def test_union_with_evolution_lossy_cast_raises(ray_session):
    import pyarrow as pa
    import pytest as _pt
    import ray.data as rd

    from xmlschema_ray.sources.readers import union_with_evolution

    wide = rd.from_arrow(pa.table({"k": pa.array([2**40], pa.int64())}))
    schema = pa.schema([("k", pa.int32())])
    with _pt.raises(Exception):  # ArrowInvalid inside the task
        union_with_evolution([wide], schema).to_pandas()
