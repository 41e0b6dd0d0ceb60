"""Validation-RUN diffing: the regression report between two completed
runs of (possibly different versions of) a pipeline over the same keyed
corpus — "did the new code/data increase violations, and WHICH keys
regressed?" — the operational complement of ``spec_compat`` (which
compares SPECS statically; this compares what two runs actually found).

Reference analog: none (single-shot validation); this extends §2.12's
extension surface the way the resumable sink extends §2.1.

Physical plan: per-constraint counts are two combiner passes (constraint-
cardinality rows); the key-level regression sets are a DISTRIBUTED
anti-join on (constraint_name, key) in each direction (the
``except_keys`` machinery), so the diff never materializes either run's
violation set on the driver — outputs are delta-sized.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import pandas as pd
import ray.data as rd

_KEY_COLS = ["constraint_name", "key"]


def _violations_ds(out_dir: str) -> "rd.Dataset | None":
    path = os.path.join(out_dir, "violations")
    if not os.path.exists(path) or not os.listdir(path):
        return None
    return rd.read_parquet(path, columns=_KEY_COLS)


def _per_constraint_counts(ds: "rd.Dataset | None", col: str) -> pd.DataFrame:
    from xmlschema_ray.ops.relational import combiner_aggregate, to_pandas_with_schema

    if ds is None:
        return pd.DataFrame(
            {"constraint_name": pd.Series([], dtype=object), col: pd.Series([], dtype=np.int64)}
        )
    df = to_pandas_with_schema(
        combiner_aggregate(ds, "constraint_name", {col: (None, "count")})
    )
    if len(df) == 0:
        return pd.DataFrame(
            {"constraint_name": pd.Series([], dtype=object), col: pd.Series([], dtype=np.int64)}
        )
    df[col] = df[col].astype("int64")
    return df


def _distinct_pairs(ds: "rd.Dataset") -> "rd.Dataset":
    """Distinct (constraint, key) pairs, MATERIALIZED once — each run's
    set serves one direction's build side and the other's probe side, so
    without this the same read+combiner would execute twice per run
    (Ray datasets are lazy). Distinct pairs are delta-bounded in
    practice; at worst violation-set-sized in the object store, never
    on the driver."""
    from xmlschema_ray.ops.relational import combiner_aggregate

    return combiner_aggregate(ds, _KEY_COLS, {"c": (None, "count")}).materialize()


def _key_except(left: "rd.Dataset | None", right: "rd.Dataset | None") -> pd.DataFrame:
    """Distinct (constraint, key) pairs present in ``left`` but not
    ``right`` — distributed anti-join, delta-sized output."""
    from xmlschema_ray.ops.relational import (
        combiner_aggregate,
        copartition_apply,
        to_pandas_with_schema,
    )

    empty = pd.DataFrame(
        {"constraint_name": pd.Series([], dtype=object), "key": pd.Series([], dtype=object)}
    )
    if left is None:
        return empty
    # callers pass PRE-DISTINCT materialized pair sets (_distinct_pairs):
    # each run's set serves one direction's build side and the other's
    # probe side, so computing it here would re-run the read+combiner
    # twice per run (Ray datasets are lazy)
    ldist = left
    if right is None:
        out = to_pandas_with_schema(ldist)
        return (
            out[_KEY_COLS].sort_values(_KEY_COLS).reset_index(drop=True)
            if len(out)
            else empty
        )
    rdist = right

    def tag_l(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "__j": batch["constraint_name"].astype(str) + "\x1f" + batch["key"].astype(str),
                "constraint_name": batch["constraint_name"],
                "key": batch["key"],
            }
        )

    def tag_r(batch: pd.DataFrame) -> pd.DataFrame:
        # the probe side ships ONLY the join key (its payload columns
        # would collide with the left's in the copartition unified schema)
        return pd.DataFrame(
            {"__j": batch["constraint_name"].astype(str) + "\x1f" + batch["key"].astype(str)}
        )

    lj = ldist.map_batches(tag_l, batch_format="pandas")
    rj = rdist.map_batches(tag_r, batch_format="pandas")

    def anti(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        if len(lf) == 0:
            return pd.DataFrame(
                {
                    "constraint_name": pd.Series([], dtype=object),
                    "key": pd.Series([], dtype=object),
                }
            )
        keep = ~lf["__j"].isin(set(rf["__j"])) if len(rf) else np.ones(len(lf), dtype=bool)
        return lf.loc[keep, ["constraint_name", "key"]]

    out = to_pandas_with_schema(copartition_apply(lj, rj, "__j", "__j", anti))
    if len(out) == 0:
        return empty
    return out.sort_values(_KEY_COLS).reset_index(drop=True)


def diff_validation_runs(out_a: str, out_b: str) -> Dict[str, pd.DataFrame]:
    """Compare two completed validation out-dirs (A = baseline, B = new).

    Returns:
      ``per_constraint`` — constraint_name, n_a, n_b, delta (sorted by
      delta descending: regressions first);
      ``regressed`` — distinct (constraint, key) pairs violating in B but
      not A (the new failures to triage);
      ``fixed`` — pairs violating in A but not B.
    """
    a = _violations_ds(out_a)
    b = _violations_ds(out_b)
    ca = _per_constraint_counts(a, "n_a")
    cb = _per_constraint_counts(b, "n_b")
    per = ca.merge(cb, on="constraint_name", how="outer")
    per["n_a"] = per["n_a"].fillna(0).astype("int64")
    per["n_b"] = per["n_b"].fillna(0).astype("int64")
    per["delta"] = (per["n_b"] - per["n_a"]).astype("int64")
    per = per.sort_values(
        ["delta", "constraint_name"], ascending=[False, True]
    ).reset_index(drop=True)
    da = _distinct_pairs(a) if a is not None else None
    db = _distinct_pairs(b) if b is not None else None
    return {
        "per_constraint": per,
        "regressed": _key_except(db, da),
        "fixed": _key_except(da, db),
    }


__all__ = ["diff_validation_runs"]
