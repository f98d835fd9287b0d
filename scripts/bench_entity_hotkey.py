"""Hot-key temporal-entities microbench: ONE entity key, M same-day CDC
mutations, Q queries — times EntityKernel.__call__ directly (the
windowed-mutation sweep is the hot path; everything else in the kernel is
already composite-searchsorted numpy).

Usage: python scripts/bench_entity_hotkey.py [M] [Q] [reps]
Prints one JSON line {"m": M, "q": Q, "sec": best-of-reps}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

from raywin.api import Aggregation, Operation, TimeUnit, Window
from raywin.pipelines.entities import EntityKernel
from raywin.stages.shuffle import SIDE_COL

DAY = 86400000
BASE = 1_600_000_000_000 // DAY * DAY


def build_group(m: int, q: int, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    mts = BASE + np.sort(rng.integers(0, DAY, m))
    vals = rng.integers(1, 100, m).astype(np.float64)
    q_ts = BASE + np.sort(rng.integers(1, DAY, q))
    n = q + m
    return pa.table(
        {
            "k": pa.array(["hot"] * n),
            "ts": pa.array(np.concatenate([q_ts, mts]), type=pa.int64()),
            "rating": pa.array(
                np.concatenate([np.full(q, np.nan), vals]), type=pa.float64()
            ),
            "ds": pa.array([None] * n, type=pa.string()),
            "mutation_ts": pa.array(
                [None] * q + mts.tolist(), type=pa.int64()
            ),
            "is_before": pa.array([None] * q + [False] * m, type=pa.bool_()),
            SIDE_COL: pa.array([0] * q + [2] * m, type=pa.int8()),
        }
    )


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    aggs = [
        Aggregation(Operation.SUM, "rating", windows=[Window(1, TimeUnit.DAYS)]),
        Aggregation(Operation.COUNT, "rating", windows=[Window(12, TimeUnit.HOURS)]),
        Aggregation(Operation.AVERAGE, "rating", windows=[Window(1, TimeUnit.DAYS), Window(-1)]),
    ]
    parts = [p for a in aggs for p in a.unpack()]
    kernel = EntityKernel(["k"], parts, ["k", "ts"])
    group = build_group(m, q)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = kernel(group)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    assert len(out) == q
    print(json.dumps({"m": m, "q": q, "sec": round(best, 3)}))


if __name__ == "__main__":
    main()
