"""Print Ray Data per-stage execution stats for a named pipeline.

Usage: python tools/query_stats.py <query_name> [sf_dir] [num_cpus]

Runs the query under its own Ray session and prints ``ds.stats()`` — the
per-operator wall/cpu/rows breakdown the perf loop needs to see whether a
stage is read-bound, shuffle-bound, or starved (CLAUDE.md: iterate until
wall time is dominated by useful compute). Queries that return a driver
DataFrame (adaptive finalize) print only their end-to-end wall time.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    name = sys.argv[1] if len(sys.argv) > 1 else None
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=num_cpus, include_dashboard=False, logging_level="ERROR"
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    qs = E.queries()
    if name is None or name not in qs:
        print("queries:", " ".join(sorted(qs)), file=sys.stderr)
        return 2
    t0 = time.time()
    res = qs[name](sf_dir)
    if hasattr(res, "materialize"):
        res = res.materialize()
        print(res.stats())
    wall = time.time() - t0
    print(f"\n== {name}: {wall:.2f}s end-to-end at num_cpus={num_cpus} over {sf_dir}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
