"""SymSpell-blocked fuzzy string self-join: the deletion-neighborhood
guarantee (edit(a,b) <= k ⇒ shared delete-variant) makes the blocked join
EXACTLY equal to the brute-force all-pairs join — proven both on the corpus
and on crafted adversarial cases for each edit kind."""

import itertools

import pandas as pd

from xmlschema_ray.pipelines.relational import (
    _deletion_neighborhood,
    _levenshtein,
    similar_part_names,
)

SF_DIR = "/root/testdata/sf0.001"


def test_levenshtein_kernel():
    assert _levenshtein("", "") == 0
    assert _levenshtein("abc", "abc") == 0
    assert _levenshtein("abc", "abd") == 1  # substitute
    assert _levenshtein("abc", "abcd") == 1  # insert
    assert _levenshtein("abcd", "abc") == 1  # delete
    assert _levenshtein("kitten", "sitting") == 3  # the classic
    assert _levenshtein("red bolt", "blue bolt") == 4
    assert _levenshtein("", "xyz") == 3


def test_deletion_neighborhood_guarantee():
    """For every pair within distance k, the k-deletion neighborhoods
    intersect — exhaustively over a crafted vocabulary exercising pure
    inserts, pure deletes, substitutions, and mixes."""
    vocab = [
        "bolt", "bolts", "blt", "belt", "bold", "colt", "jolt",
        "ring", "rings", "rng", "ringo", "wring",
        "ab", "ba", "aab", "abb", " робот",  # short + non-ascii
    ]
    k = 2
    for a, b in itertools.combinations(vocab, 2):
        if _levenshtein(a, b) <= k:
            assert _deletion_neighborhood(a, k) & _deletion_neighborhood(b, k), (a, b)


def test_similar_part_names_equals_bruteforce(ray_session):
    got = similar_part_names(SF_DIR)
    names = sorted(
        pd.read_parquet(f"{SF_DIR}/part.parquet", columns=["p_name"])["p_name"].unique()
    )
    rows = [
        (a, b, _levenshtein(a, b))
        for a, b in itertools.combinations(names, 2)
        if _levenshtein(a, b) <= 2
    ]
    exp = pd.DataFrame(rows, columns=["name_a", "name_b", "dist"])
    exp["dist"] = exp["dist"].astype("int64")
    pd.testing.assert_frame_equal(got, exp.sort_values(["name_a", "name_b"]).reset_index(drop=True))
    assert len(got) > 0
