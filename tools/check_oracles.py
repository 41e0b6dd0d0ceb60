"""Dev harness: run every queries() entry and compare against oracle_sql()
with DuckDB — the same shape as the driver's correctness gate.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd


def compare(name, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return f"SCHEMA MISMATCH ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}"
    if len(ray_df) != len(sql_df):
        return f"ROWCOUNT MISMATCH ray={len(ray_df)} sql={len(sql_df)}"
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = sql_df[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        av, bv = a[c], b[c]
        if str(av.dtype).startswith("datetime") or str(bv.dtype).startswith("datetime"):
            av = pd.to_datetime(av).astype("datetime64[us]")
            bv = pd.to_datetime(bv).astype("datetime64[us]")
        # dtype-strict: the driver's value hash is dtype-sensitive (int64 vs
        # float64 of equal values hash differently), so a kind mismatch is a
        # failure here even when values coerce equal.
        if av.dtype.kind != bv.dtype.kind:
            return f"DTYPE MISMATCH col={c} ray={av.dtype} sql={bv.dtype}"
        if not av.equals(bv):
            neq = (av != bv)
            try:
                n_bad = int(neq.sum())
            except Exception:
                n_bad = -1
            return f"VALUE MISMATCH col={c} n_bad={n_bad} ray_head={av[neq].head(3).tolist()} sql_head={bv[neq].head(3).tolist()}"
    return "OK"


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
            elif not isinstance(res, pd.DataFrame):
                res = pd.DataFrame(res)
        except Exception as e:
            print(f"[FAIL] {name}: query raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        dt = time.time() - t0
        if name in oracles:
            try:
                sql_df = con.sql(oracles[name]).df()
            except Exception as e:
                print(f"[FAIL] {name}: oracle SQL raised {e}")
                n_bad += 1
                continue
            verdict = compare(name, res, sql_df)
        else:
            verdict = f"rows-only ({len(res)} rows)"
        ok = verdict == "OK" or verdict.startswith("rows-only")
        n_ok += ok
        n_bad += not ok
        print(f"[{'ok' if ok else 'FAIL'}] {name}: {verdict} ({dt:.1f}s)")
    print(f"\n{n_ok} ok, {n_bad} bad")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
