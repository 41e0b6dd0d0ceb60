"""Gopher quality-rule bundle: crafted inputs exercise the rules that are
constant on the synthetic corpus (symbol ratio, alpha fraction, word-count
bounds, mean-word-length bounds) — the SQL oracle only proves the rules
that vary there."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from xmlschema_ray.pipelines.textstats import gopher_quality_flags


def _run(tmp_path, texts):
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}),
        d / "documents.parquet",
    )
    out = gopher_quality_flags(str(d)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_gopher_rules_crafted(tmp_path, ray_session):
    good = "the cat and dog of note " + "word " * 30  # 36 words, stopworded, alpha
    texts = [
        good,                                     # 0: passes everything
        "tiny doc",                               # 1: fails word-count min
        good + "word " * 60,                      # 2: fails word-count max (96>80? 36+60=96)
        "the and " + "## # ## " * 12,             # 3: symbol-heavy + non-alpha words
        "的 是 在 了 " * 10 + "the and",            # 4: fails alpha fraction (most words CJK)
        good.upper(),                             # 5: stopwords are case-insensitive
        "the of " + "supercalifragilistic " * 30, # 6: words avg >10 chars -> fails mwl max
        "the of " + "a b c d " * 10,              # 7: 1-char words -> fails mwl min
    ]
    out = _run(tmp_path, texts)

    assert out.loc[0, "keep"] == 1
    assert out.loc[1, "f_words"] == 0 and out.loc[1, "keep"] == 0
    assert out.loc[2, "f_words"] == 0
    # doc 3: 24 '#' symbols vs 26 words -> 10*24 > 26 fails symbol ratio;
    # '##'-only words also fail alpha
    assert out.loc[3, "f_sym"] == 0
    assert out.loc[3, "f_alpha"] == 0
    assert out.loc[4, "f_alpha"] == 0
    assert out.loc[5, "f_stop"] == 1  # lowercased membership
    assert out.loc[6, "f_mwl"] == 0
    assert out.loc[7, "f_mwl"] == 0
    # count columns are exact
    assert out.loc[1, "n_words"] == 2
    assert out.loc[1, "n_word_chars"] == len("tinydoc")
    assert out.loc[3, "n_sym"] == texts[3].count("#")


def test_gopher_empty_and_whitespace_docs(tmp_path, ray_session):
    out = _run(tmp_path, ["", "   ", "one"])
    assert out["n_words"].tolist() == [0, 0, 1]
    # zero-word docs: alpha rule 5*0 >= 4*0 holds, word-count fails
    assert out["f_words"].tolist() == [0, 0, 0]
    assert out["keep"].tolist() == [0, 0, 0]
