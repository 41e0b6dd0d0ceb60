"""Hardware per-core scaling ceiling probe.

Measures how much per-core throughput a pure, embarrassingly-parallel
numpy kernel LOSES as more cores become busy on this machine (frequency
scaling + shared cache/memory effects). The result is the hardware ceiling
that any single-box N-vs-4N comparison is bounded by — independent of the
engine under test. BASELINE.md divides the end-to-end measured efficiency
by this ceiling to isolate software scaling.

Usage: python tools/core_scaling_probe.py [lo] [hi]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np


def _worker(q, seconds: float) -> None:
    x = np.random.default_rng(0).integers(0, 50257, size=4_000_000, dtype=np.int32)
    n = 0
    t_end = time.time() + seconds
    while time.time() < t_end:
        ((x < 0) | (x >= 50257)).sum()
        n += 1
    q.put(n)


def per_core_rate(n_cores: int, seconds: float = 5.0) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(q, seconds)) for _ in range(n_cores)]
    for i, p in enumerate(ps):
        p.start()
        os.sched_setaffinity(p.pid, {i})
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / n_cores / seconds


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    r_lo = per_core_rate(lo)
    r_hi = per_core_rate(hi)
    print(
        json.dumps(
            {
                "metric": f"hardware per-core throughput ratio ({hi} busy cores / {lo} busy cores)",
                "value": round(r_hi / r_lo, 3),
                "per_core_iters_per_sec": {str(lo): round(r_lo, 1), str(hi): round(r_hi, 1)},
            }
        )
    )


if __name__ == "__main__":
    main()
