"""Microbench: PartitionKernel Arrow-native ingestion vs the retired
whole-group to_pandas path.

Builds one co-partitioned group (string keys, string/list passthrough
payload on the query side — the shape of a real join left) and times:

  OLD: lt/rt.to_pandas(maps_as_pydicts) -> PartitionAggregator.aggregate
       -> per-column numpy -> _to_arrow_column rebuild
  NEW: PartitionAggregator.aggregate_tables (lazy per-column numpy, arrow
       dictionary_encode key factorization) -> Table.take reorder

Asserts the two output tables are bitwise-equal before reporting.
Run: python scripts/bench_kernel_arrow.py [n_events] [n_queries]
"""
from __future__ import annotations

import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, ".")

from raywin.api import AggregationPart, Operation, TimeUnit, Window
from raywin.aggregator.kernel import PartitionAggregator
from raywin.pipelines.group_by import _to_arrow_column, output_type

N_EV = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
N_Q = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
rng = np.random.default_rng(7)

DAY = 86_400_000
keys = np.array([f"user_{i:06d}" for i in range(5_000)])
ev_key = keys[rng.integers(0, len(keys), N_EV)]
q_key = keys[rng.integers(0, len(keys), N_Q)]
ev_ts = rng.integers(0, 90 * DAY, N_EV).astype(np.int64)
q_ts = rng.integers(0, 90 * DAY, N_Q).astype(np.int64)
amount = np.round(rng.uniform(0, 500, N_EV), 2)
rating = rng.integers(1, 6, N_EV).astype(np.int64)

# query-side passthrough payload: the boxing victim of the old path
payload_s = np.array([f"payload-{i % 9973:05d}/section/{i % 77}" for i in range(N_Q)])
payload_l = pa.array([[float(i % 13), float(i % 7)] for i in range(N_Q)], type=pa.list_(pa.float64()))

rt = pa.table(
    {
        "user": pa.array(ev_key),
        "ts": pa.array(ev_ts),
        "amount": pa.array(amount),
        "rating": pa.array(rating),
    }
)
lt = pa.table(
    {
        "user": pa.array(q_key),
        "ts": pa.array(q_ts),
        "url": pa.array(payload_s),
        "emb": payload_l,
    }
)

parts = [
    AggregationPart(Operation.SUM, "amount", Window(7, TimeUnit.DAYS)),
    AggregationPart(Operation.AVERAGE, "amount", Window(30, TimeUnit.DAYS)),
    AggregationPart(Operation.COUNT, "rating", Window(14, TimeUnit.DAYS)),
    AggregationPart(Operation.LAST, "rating", Window(30, TimeUnit.DAYS)),
]
input_types = {"amount": pa.float64(), "rating": pa.int64()}
out_fields = [
    pa.field(p.output_column, output_type(p, input_types[p.input_column])) for p in parts
]
agg = PartitionAggregator(["user"], parts)
left_schema = lt.schema


def run_old():
    queries = lt.to_pandas(maps_as_pydicts="strict")
    events = rt.to_pandas(maps_as_pydicts="strict")
    out = agg.aggregate(events, queries)
    cols = [
        _to_arrow_column(out[f.name].to_numpy(), f.type) for f in left_schema
    ] + [
        _to_arrow_column(out[p.output_column].to_numpy(), f.type)
        for f, p in zip(out_fields, parts)
    ]
    return pa.table(cols, schema=pa.schema(list(left_schema) + out_fields))


def run_new():
    q_order, results = agg.aggregate_tables(rt, lt)
    taken = lt.take(q_order)
    cols = [taken.column(f.name) for f in left_schema] + [
        _to_arrow_column(results[p.output_column], f.type)
        for f, p in zip(out_fields, parts)
    ]
    return pa.table(cols, schema=pa.schema(list(left_schema) + out_fields))


def best_of(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), out


t_old, out_old = best_of(run_old)
t_new, out_new = best_of(run_new)
assert out_old.equals(out_new), "arrow-native kernel path diverged from the pandas path"
print(
    f"events={N_EV} queries={N_Q} parts={len(parts)}  "
    f"old(to_pandas)={t_old:.3f}s  new(arrow)={t_new:.3f}s  "
    f"speedup={t_old / t_new:.2f}x  (outputs bitwise equal)"
)
