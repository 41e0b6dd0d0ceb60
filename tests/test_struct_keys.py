"""Nested-field identity constraints (r5): dotted struct paths in
key_columns / UniqueKey / ForeignKey — the XPath field-selector analog
(reference validators/identities.py:64-150). Covers compile lints, the
stage-A flatten, uniqueness through stage B's root-column recovery scan,
FK membership on a subfield, row identity rendering, serde round-trip and
quarantine routing with a dotted key."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xmlschema_ray import ValidationEngine
from xmlschema_ray.constraints import facets as F
from xmlschema_ray.constraints.serde import spec_from_json, spec_to_json
from xmlschema_ray.constraints.spec import (
    ColumnSpec,
    ForeignKey,
    SpecError,
    TableConstraints,
    UniqueKey,
)

META = pa.struct([pa.field("license", pa.string()), pa.field("origin", pa.int64())])


def _spec(**kw):
    base = dict(
        name="structkeys",
        columns=[
            ColumnSpec("doc_id", pa.int64(), nullable=False),
            ColumnSpec("meta", META, nullable=True),
            ColumnSpec("title", pa.string(), nullable=False),
        ],
        key_columns=("doc_id",),
    )
    base.update(kw)
    return TableConstraints(**base)


def _corpus(tmp_path):
    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    meta = pa.StructArray.from_arrays(
        [
            pa.array(["mit", "mit", "apache", "gpl", None, "mit"], pa.string()),
            pa.array([1, 2, 1, 1, 9, 1], pa.int64()),
        ],
        fields=list(META),
    )
    # row 4 has a NULL meta struct — its subfields read as null (exempt
    # from uniqueness, not_null-style handling elsewhere)
    meta = pa.StructArray.from_buffers(
        META,
        len(meta),
        [pa.array([True, True, True, True, False, True]).buffers()[1]],
        children=[meta.field(0), meta.field(1)],
    )
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
            "meta": meta,
            "title": pa.array(["a", "b", "c", None, "e", "f"], pa.string()),
        }
    )
    pq.write_table(t.slice(0, 3), os.path.join(d, "p0.parquet"))
    pq.write_table(t.slice(3), os.path.join(d, "p1.parquet"))
    return d


def test_compile_lints():
    # resolvable dotted paths compile
    _spec(unique_keys=[UniqueKey(("meta.license",))]).compile()
    _spec(key_columns=("meta.license", "meta.origin")).compile()
    _spec(
        foreign_keys=[ForeignKey("meta.license", "lic", "name")]
    ).compile()
    # unknown leaf / non-struct root / missing root refuse
    with pytest.raises(SpecError):
        _spec(unique_keys=[UniqueKey(("meta.nope",))]).compile()
    with pytest.raises(SpecError):
        _spec(unique_keys=[UniqueKey(("title.sub",))]).compile()
    with pytest.raises(SpecError):
        _spec(key_columns=("nometa.license",)).compile()


def test_resolves_struct_path_declared_name_wins():
    # a literal flat column whose name contains a dot is NOT a path
    spec = TableConstraints(
        name="flatdot",
        columns=[ColumnSpec("a.b", pa.int64()), ColumnSpec("k", pa.int64())],
        key_columns=("a.b",),
    ).compile()
    assert spec.dotted_key_paths() == ()


def test_unique_key_on_struct_subfield(tmp_path, ray_session):
    """Two-phase exact uniqueness through a dotted composite key: stage A
    flattens and emits keycounts; stage B's recovery scan reads the ROOT
    struct from parquet and flattens again. meta.license='mit' repeats
    with origin 1 twice (docs 0 and 5) — exactly one duplicated tuple;
    the null-struct row is exempt."""
    d = _corpus(tmp_path)
    spec = _spec(unique_keys=[UniqueKey(("meta.license", "meta.origin"), name="uk_lic")])
    res = ValidationEngine(spec, n_shards=1).run(
        d, out_dir=str(tmp_path / "o1"), resume=False
    )
    v = res.violations()
    dup = v[v["constraint_name"] == "uk_lic"]
    assert dup["key"].tolist() == ["mit|1"]
    assert "count=2" in dup["reason"].iloc[0]


def test_fk_on_struct_subfield(tmp_path, ray_session):
    """Broadcast keyref membership on a subfield: licenses outside the dim
    violate; the null-struct row's null subfield is exempt (null handled
    by not_null, not keyref)."""
    d = _corpus(tmp_path)
    dim = pa.table({"name": pa.array(["mit", "apache"], pa.string())})
    spec = _spec(
        foreign_keys=[ForeignKey("meta.license", "lic", "name", name="fk_lic")]
    )
    res = ValidationEngine(spec, n_shards=1).run(
        d, out_dir=str(tmp_path / "o2"), dims={"lic": dim}, resume=False
    )
    v = res.violations()
    bad = v[v["constraint_name"] == "fk_lic"]
    assert sorted(bad["key"].astype(int).tolist()) == [3]  # gpl


def test_row_identity_dotted_key(tmp_path, ray_session):
    """key_columns may address a subfield: the violation key renders the
    SUBFIELD value through the stage-A _key_strings identity (null struct
    -> empty part)."""
    d = _corpus(tmp_path)
    spec = _spec(key_columns=("meta.license", "doc_id"))
    res = ValidationEngine(spec, n_shards=1).run(
        d, out_dir=str(tmp_path / "o3"), resume=False
    )
    v = res.violations()
    nn = v[v["constraint_name"] == "title.not_null"]
    assert nn["key"].tolist() == ["gpl|3"]


def test_serde_round_trip_dotted():
    spec = _spec(
        key_columns=("meta.license", "doc_id"),
        unique_keys=[UniqueKey(("meta.origin",), name="uk_o")],
        foreign_keys=[ForeignKey("meta.license", "lic", "name", name="fk_l")],
    ).compile()
    js = spec_to_json(spec)
    back = spec_from_json(js).compile()
    assert back.key_columns == ("meta.license", "doc_id")
    assert back.unique_keys[0].columns == ("meta.origin",)
    assert back.foreign_keys[0].column == "meta.license"
    assert json.loads(json.dumps(js))  # JSON-serializable
    assert spec_to_json(back) == js  # round-trip-stable


def test_quarantine_split_dotted_key(tmp_path, ray_session):
    """quarantine_split routes by the dotted key identity and writes the
    ORIGINAL schema (no flattened helper columns leak into the output)."""
    from xmlschema_ray.engine.encode import quarantine_split

    d = _corpus(tmp_path)
    spec = _spec(key_columns=("meta.license", "doc_id"))
    res = ValidationEngine(spec, n_shards=1).run(
        d, out_dir=str(tmp_path / "o4"), resume=False
    )
    keys = set(res.violations()["key"])
    assert keys == {"gpl|3"}
    qdir, cdir = str(tmp_path / "q"), str(tmp_path / "c")
    quarantine_split(d, spec.compile(), keys, quarantine_out=qdir, clean_out=cdir, resume=False)
    import glob

    import pyarrow.dataset as pads

    q = pads.dataset(glob.glob(os.path.join(qdir, "**", "*.parquet"), recursive=True)).to_table()
    c = pads.dataset(glob.glob(os.path.join(cdir, "**", "*.parquet"), recursive=True)).to_table()
    assert q.num_rows == 1 and set(q["doc_id"].to_pylist()) == {3}
    assert c.num_rows == 5
    assert set(q.column_names) == {"doc_id", "meta", "title"}
    assert set(c.column_names) == {"doc_id", "meta", "title"}


def test_two_level_nested_path(tmp_path, ray_session):
    """Dotted paths walk MULTI-level structs (meta.inner.tag) — lint,
    flatten and uniqueness all through the 2-deep chain."""
    inner = pa.struct([pa.field("tag", pa.string())])
    meta2 = pa.struct([pa.field("inner", inner), pa.field("x", pa.int64())])
    d = str(tmp_path / "docs2")
    os.makedirs(d, exist_ok=True)
    inner_arr = pa.StructArray.from_arrays(
        [pa.array(["a", "a", "b"], pa.string())], fields=list(inner)
    )
    meta_arr = pa.StructArray.from_arrays(
        [inner_arr, pa.array([1, 2, 3], pa.int64())], fields=list(meta2)
    )
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "meta": meta_arr}),
        os.path.join(d, "p0.parquet"),
    )
    spec = TableConstraints(
        name="two_level",
        columns=[
            ColumnSpec("doc_id", pa.int64(), nullable=False),
            ColumnSpec("meta", meta2, nullable=True),
        ],
        unique_keys=[UniqueKey(("meta.inner.tag",), name="uk_tag")],
        key_columns=("doc_id",),
    )
    spec.compile()
    with pytest.raises(SpecError):
        TableConstraints(
            name="bad",
            columns=[ColumnSpec("meta", meta2, nullable=True)],
            unique_keys=[UniqueKey(("meta.inner.nope",),)],
        ).compile()
    res = ValidationEngine(spec, n_shards=1).run(
        d, out_dir=str(tmp_path / "o5"), resume=False
    )
    dup = res.violations()
    dup = dup[dup["constraint_name"] == "uk_tag"]
    assert dup["key"].tolist() == ["a"] and "count=2" in dup["reason"].iloc[0]


def test_b2_deferred_fk_with_dotted_row_identity(tmp_path, ray_session):
    """Stage B2 (over-cap distributed keyref, forced via
    broadcast_fk_cap_bytes=0) with DOTTED key_columns: the pruned read
    fetches the ROOT struct, the shared attach_pid flattens, and the
    violation keys render through the stage-A identity (source dtypes via
    the nested footer-schema lookup)."""
    d = _corpus(tmp_path)
    dim = pa.table({"name": pa.array(["mit", "apache"], pa.string())})
    spec = _spec(
        key_columns=("meta.origin", "doc_id"),
        foreign_keys=[ForeignKey("title", "titles", "name", name="fk_title")],
    )
    # dim of allowed titles: everything except 'f' (doc 5; doc 3's title
    # is null -> exempt)
    tdim = pa.table({"name": pa.array(["a", "b", "c", "e"], pa.string())})
    eng = ValidationEngine(spec, n_shards=1, broadcast_fk_cap_bytes=0)
    res = eng.run(d, out_dir=str(tmp_path / "o6"), dims={"titles": tdim}, resume=False)
    v = res.violations()
    bad = v[v["constraint_name"] == "fk_title"]
    # doc 5: meta.origin=1, doc_id=5 -> stage-A str() identity '1|5'
    assert bad["key"].tolist() == ["1|5"]
