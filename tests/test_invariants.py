"""Contract invariants.

* Token-array equality (BASELINE.json input_hint): every row the engine
  passes through must carry ``tokens`` element-wise identical to the
  input — validation/cleaning never mutates payloads.
* Pickled-spec equivalence (the reference's pickled-schema check,
  ``tests/test_validators.py:445-459``): a spec shipped through pickle
  (exactly what Ray does to closures) validates identically.
"""

import pickle

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

import ray.data as rd

from xmlschema_ray.engine.engine import ValidationEngine
from xmlschema_ray.pipelines.cleaning import clean_dataset
from xmlschema_ray.sources.synthetic import sequences_spec, write_sequences_corpus


def test_token_array_equality_through_cleaning(tmp_path, ray_session):
    seq_dir, dim, _ = write_sequences_corpus(
        str(tmp_path / "c"), n_rows=800, n_files=4, defects={"bad_token_range": 5}
    )
    spec = sequences_spec()
    ds = rd.read_parquet(seq_dir)
    import pyarrow.compute as pc

    import ray

    fk_ref = ray.put(
        {"fk_source": pads.dataset(dim).to_table()["source"].combine_chunks().unique()}
    )
    clean = clean_dataset(ds, spec, fk_sets_ref=fk_ref).to_pandas()

    src = pads.dataset(seq_dir).to_table().to_pandas().set_index("doc_id")
    assert len(clean) == 800 - 5
    for _, row in clean.sample(n=50, random_state=0).iterrows():
        orig = src.loc[row["doc_id"], "tokens"]
        assert np.array_equal(np.asarray(row["tokens"]), np.asarray(orig))


def test_pickled_spec_validates_identically(tmp_path, ray_session):
    defects = {"bad_pattern": 2, "n_tok_mismatch": 3}
    seq_dir, dim, exp = write_sequences_corpus(
        str(tmp_path / "c"), n_rows=600, n_files=4, defects=defects
    )
    spec = sequences_spec()
    spec2 = pickle.loads(pickle.dumps(spec))
    res1 = ValidationEngine(spec, batch_size=256, n_shards=1).run(
        seq_dir, out_dir=str(tmp_path / "a"), dims={"sources": dim}
    )
    res2 = ValidationEngine(spec2, batch_size=256, n_shards=1).run(
        seq_dir, out_dir=str(tmp_path / "b"), dims={"sources": dim}
    )
    g1 = res1.violations().groupby("constraint_name").size().to_dict()
    g2 = res2.violations().groupby("constraint_name").size().to_dict()
    assert g1 == g2 == exp


def test_builders_registry_swap_roundtrip():
    """BUILDERS class-map (reference schema.py:1202-1214): re-registering a
    kind with a Facet subclass swaps which checker a spec document builds."""
    import pyarrow as pa

    from xmlschema_ray.constraints import facets as F
    from xmlschema_ray.constraints import serde

    class LooseMaxLength(F.MaxLength):
        pass

    orig = serde.BUILDERS["maxLength"]
    try:
        serde.register_facet_builder(
            "maxLength",
            LooseMaxLength,
            orig.to_json,
            lambda d: LooseMaxLength(d["value"], encoding=d.get("encoding", "none")),
        )
        built = serde.facet_from_json({"kind": "maxLength", "value": 3})
        assert type(built) is LooseMaxLength
        # subclass serializes through its registered builder; unregistered
        # subclasses fall back to the nearest registered base
        assert serde.facet_to_json(built) == {"kind": "maxLength", "value": 3}
    finally:
        serde.register_facet_builder("maxLength", F.MaxLength, orig.to_json, orig.from_json)
    assert type(serde.facet_from_json({"kind": "maxLength", "value": 3})) is F.MaxLength
