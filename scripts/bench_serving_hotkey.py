"""Serving hot-key microbench: per-row lambda_aggregate vs the vectorized
lambda_aggregate_many on ONE hot key — 100k tail events x 20k queries.

Run:  python scripts/bench_serving_hotkey.py
Records the round-4 VERDICT item-2 evidence for BASELINE.md.
"""

import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from raywin.api import (  # noqa: E402
    Accuracy, Aggregation, EventSource, GroupBy, MILLIS_DAY, Operation, Query,
    TimeUnit, Window,
)
from raywin.online.serving import SawtoothOnlineAggregator  # noqa: E402

DAY = MILLIS_DAY
BASE = (1_700_000_000_000 // DAY) * DAY
BATCH_END = BASE + 30 * DAY
N_TAIL = 100_000
N_QUERIES = 20_000


def main():
    gb = GroupBy(
        sources=[EventSource(table="unused", query=Query())],
        key_columns=["k"],
        aggregations=[
            Aggregation(Operation.SUM, "v", windows=[Window(7, TimeUnit.DAYS)]),
            Aggregation(Operation.COUNT, "v", windows=[Window(1, TimeUnit.DAYS)]),
            Aggregation(Operation.AVERAGE, "v", windows=[Window(30, TimeUnit.DAYS)]),
            Aggregation(Operation.LAST_K, "v", arg_map={"k": 5}, windows=[Window(7, TimeUnit.DAYS)]),
            Aggregation(Operation.MAX, "v"),
        ],
        accuracy=Accuracy.TEMPORAL,
        name="hot_serving_gb",
    )
    agg = SawtoothOnlineAggregator(gb, BATCH_END)
    rng = np.random.default_rng(5)
    ts_arr = np.sort(BATCH_END + rng.integers(0, DAY, N_TAIL)).astype(np.int64)
    rows = {"v": rng.normal(10, 4, N_TAIL).round(3)}
    # batch IR: a collapsed piece + 64 tail-hop tiles, the realistic upload shape
    ir = {}
    for p, op in zip(agg.parts, agg.ops):
        vals = rng.normal(10, 4, 200).round(3)
        c = None
        for i, v in enumerate(vals):
            t = int(BASE + i * 1000)
            c = op.prepare(v, t) if c is None else op.update(c, v, t)
        tiles = []
        for h in range(64):
            start = BATCH_END - (64 - h) * 3_600_000
            tv = rng.normal(10, 4, 20).round(3)
            tir = None
            for i, v in enumerate(tv):
                tt = int(start + i * 100)
                tir = op.prepare(v, tt) if tir is None else op.update(tir, v, tt)
            tiles.append((start, tir))
        ir[p.output_column] = {"c": c, "t": tiles}
    qts = np.sort(BATCH_END + rng.integers(1, DAY, N_QUERIES)).astype(np.int64)

    t0 = time.perf_counter()
    many = agg.lambda_aggregate_many(ir, ts_arr, rows, qts)
    t_many = time.perf_counter() - t0

    n_check = 2_000  # extrapolate the per-row path (full run is minutes)
    t0 = time.perf_counter()
    sample_idx = np.linspace(0, N_QUERIES - 1, n_check).astype(int)
    ones = [agg.lambda_aggregate(ir, ts_arr, rows, int(qts[i])) for i in sample_idx]
    t_one = (time.perf_counter() - t0) * (N_QUERIES / n_check)

    for j, i in enumerate(sample_idx):
        for p in agg.parts:
            assert many[p.output_column][i] == ones[j][p.output_column], p.output_column
    print(f"tail={N_TAIL} queries={N_QUERIES} parts={len(agg.parts)}")
    print(f"per-row lambda_aggregate (extrapolated from {n_check}): {t_one:.2f}s")
    print(f"lambda_aggregate_many:                               {t_many:.2f}s")
    print(f"speedup: {t_one / t_many:.1f}x  (outputs spot-verified equal)")


if __name__ == "__main__":
    main()
