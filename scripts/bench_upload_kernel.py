"""Microbench: UploadKernel.__call__ on one co-partitioned bucket group.

Measures the per-bucket kernel in isolation (no Ray) — the serving-prep hot
path that runs once per key in the corpus.  VERDICT r4 item 3: vectorize the
per-key Python IR loop; this records before/after for BASELINE.md.

Usage: python scripts/bench_upload_kernel.py [n_keys] [rows_per_key]
"""

import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

from raywin.api import Accuracy, Aggregation, EventSource, GroupBy, Operation, Query, TimeUnit, Window
from raywin.online.upload import UploadKernel

DAY = 86_400_000


def make_group(n_keys: int, rows_per_key: int, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    n = n_keys * rows_per_key
    keys = np.repeat([f"img_{i:08d}" for i in range(n_keys)], rows_per_key)
    perm = rng.permutation(n)
    ts = rng.integers(0, 30 * DAY, n)
    return pa.table(
        {
            "image_id": pa.array(keys[perm]),
            "ts": pa.array(ts, pa.int64()),
            "views": pa.array(rng.integers(0, 50, n), pa.int64()),
            "score": pa.array(
                np.where(rng.random(n) < 0.05, np.nan, rng.normal(size=n))
            ),
        }
    )


def main():
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    rows_per_key = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    gb = GroupBy(
        sources=[EventSource(table="unused", query=Query(
            selects={"image_id": "image_id", "views": "views", "score": "score"},
            time_column="ts",
        ))],
        key_columns=["image_id"],
        aggregations=[
            Aggregation(Operation.SUM, "views", windows=[Window(1, TimeUnit.DAYS), Window(-1)]),
            Aggregation(Operation.COUNT, "views", windows=[Window(6, TimeUnit.HOURS)]),
            Aggregation(Operation.MAX, "score", windows=[Window(7, TimeUnit.DAYS)]),
            Aggregation(Operation.AVERAGE, "score", windows=[Window(7, TimeUnit.DAYS)]),
            Aggregation(Operation.LAST, "score", windows=[Window(1, TimeUnit.DAYS)]),
        ],
        accuracy=Accuracy.TEMPORAL,
        name="bench_upload",
    )
    parts = gb.agg_parts()
    batch_end = 28 * DAY
    kernel = UploadKernel(
        ["image_id"], parts, batch_end, 2 * DAY,
        [pa.field("image_id", pa.string())],
    )
    group = make_group(n_keys, rows_per_key)
    t0 = time.perf_counter()
    out = kernel(group)
    dt = time.perf_counter() - t0
    print(
        f"n_keys={n_keys} rows={group.num_rows} parts={len(parts)} "
        f"-> {out.num_rows} IR rows in {dt:.3f}s "
        f"({out.num_rows / dt:.0f} keys/s)"
    )


if __name__ == "__main__":
    main()
