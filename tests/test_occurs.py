"""ParticleCounter interval arithmetic + composed content models
(reference helpers.py:224-254, groups.py)."""

import numpy as np
import pyarrow as pa
import pytest

from xmlschema_ray.constraints import facets as F
from xmlschema_ray.constraints.occurs import (
    ContentGroup,
    OccursBounds,
    Particle,
    group_occurs_check,
)


def test_occurs_add_reference_semantics():
    # helpers.py:234-241 __add__: min sums; None (unbounded) absorbs
    assert OccursBounds(1, 2) + OccursBounds(3, 4) == OccursBounds(4, 6)
    assert OccursBounds(1, None) + OccursBounds(3, 4) == OccursBounds(4, None)
    assert OccursBounds(0, 0) + OccursBounds(0, None) == OccursBounds(0, None)


def test_occurs_mul_reference_semantics():
    # helpers.py:243-253 __mul__: unbounded×0 = 0, unbounded×n = unbounded
    assert OccursBounds(2, 3) * OccursBounds(4, 5) == OccursBounds(8, 15)
    assert OccursBounds(1, None) * OccursBounds(0, 0) == OccursBounds(0, 0)
    assert OccursBounds(0, 0) * OccursBounds(1, None) == OccursBounds(0, 0)
    assert OccursBounds(1, None) * OccursBounds(1, 2) == OccursBounds(1, None)
    assert OccursBounds(1, 2) * OccursBounds(1, None) == OccursBounds(1, None)


def test_occurs_choice_envelope_and_validity():
    assert OccursBounds(1, 2) | OccursBounds(0, 5) == OccursBounds(0, 5)
    assert OccursBounds(1, 2) | OccursBounds(3, None) == OccursBounds(1, None)
    with pytest.raises(F.SpecError):
        OccursBounds(3, 2)
    with pytest.raises(F.SpecError):
        OccursBounds(-1, 2)


def test_composed_group_bounds():
    # (a[1..2], b[0..1]){2..3} -> inner [1..3] ×[2..3] = [2..9]
    g = ContentGroup(
        "sequence",
        (Particle("a", 1, 2), Particle("b", 0, 1)),
        min_occurs=2,
        max_occurs=3,
    )
    assert g.bounds() == OccursBounds(2, 9)
    # choice picks the envelope, then a nested unbounded wrapper absorbs
    c = ContentGroup("choice", (Particle("a", 1, 1), Particle("b", 2, 4)))
    assert c.bounds() == OccursBounds(1, 4)
    outer = ContentGroup("sequence", (c,), min_occurs=0, max_occurs=None)
    assert outer.bounds() == OccursBounds(0, None)


def test_group_lint_rejects_ambiguous_choice():
    bad = ContentGroup(
        "choice",
        (Particle("a"), ContentGroup("sequence", (Particle("a"), Particle("b")))),
    )
    with pytest.raises(F.SpecError, match="ambiguous choice"):
        bad.lint()
    with pytest.raises(F.SpecError, match="unknown group kind"):
        ContentGroup("interleave", (Particle("a"),)).bounds()
    with pytest.raises(F.SpecError, match="empty content group"):
        ContentGroup("sequence", ()).bounds()


def test_group_occurs_check_vectorized():
    g = ContentGroup("sequence", (Particle("xs", 1, 2), Particle("ys", 1, 2)))
    rc = group_occurs_check(g)
    assert rc.columns == ("xs", "ys")
    t = pa.table(
        {
            "xs": pa.array([[1], [1, 2], [], None], type=pa.list_(pa.int64())),
            "ys": pa.array([[1], [1, 2], [1], [1]], type=pa.list_(pa.int64())),
        }
    )
    # totals: 2, 4, 1, 1 against derived bounds [2..4]
    assert rc.fn(t).tolist() == [False, False, True, True]
