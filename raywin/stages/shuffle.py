"""Partitioning helpers: deterministic hash-bucket assignment + hot-key salting.

The engine's one big shuffle keys everything by ``hash(entity) % P`` (plus an
optional time bucket), mirroring the reference's repartition-by-key pre-agg
(spark/.../GroupBy.scala:365-380, FastHashing.scala:29-130 xxHash keys).  We
use pandas' stable vectorized hash (fixed key, process-independent) so the
same row lands in the same bucket on every node and every retry.

Skew: a hot entity can be salted into ``n_salt`` sub-buckets for the partial
(IR) aggregation stage — IRs merge across salts for free because every op's
merge is commutative+associative (BaseAggregator.scala:25-27).  The final
as-of merge must see all of an entity's rows, so salting applies only to
partial-aggregation stages; time-bucketing bounds per-task data for the rest
(reference's own answer, docs/source/window_tiling.md:381-390).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

BUCKET_COL = "__bucket"
SIDE_COL = "__side"


def stable_hash(columns: list[np.ndarray]) -> np.ndarray:
    """Deterministic uint64 hash of one or more key columns."""
    acc = None
    for col in columns:
        h = pd.util.hash_array(np.asarray(col), categorize=False).astype(np.uint64)
        if acc is None:
            acc = h
        else:  # boost-style hash combine
            acc = acc ^ (h + np.uint64(0x9E3779B97F4A7C15) + (acc << np.uint64(6)) + (acc >> np.uint64(2)))
    return acc


class AddBucket:
    """map_batches fn adding BUCKET_COL = hash(keys) % num_buckets
    (optionally xor time-bucket of ``ts`` // time_bucket_ms)."""

    def __init__(self, key_cols: list[str], num_buckets: int, time_bucket_ms: int | None = None):
        self.key_cols = key_cols
        self.num_buckets = num_buckets
        self.time_bucket_ms = time_bucket_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = stable_hash([batch[c].to_numpy(zero_copy_only=False) for c in self.key_cols])
        if self.time_bucket_ms:
            tb = batch["ts"].to_numpy(zero_copy_only=False) // self.time_bucket_ms
            h = h * np.uint64(1000003) + tb.astype(np.uint64)
        bucket = (h % np.uint64(self.num_buckets)).astype(np.int32)
        return batch.append_column(BUCKET_COL, pa.array(bucket))


def pad_to_schema(batch: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project/pad a batch to a unified schema (null-fill missing columns) so
    heterogeneous sides can be unioned ahead of one co-partitioning shuffle."""
    cols = []
    n = len(batch)
    for field in schema:
        if field.name in batch.column_names:
            col = batch[field.name]
            if col.type != field.type:
                col = pc.cast(col, field.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, field.type))
    return pa.Table.from_arrays(cols, schema=schema)


def unify_schemas(left: pa.Schema, right: pa.Schema, tag_types: dict[str, pa.DataType]) -> pa.Schema:
    fields: dict[str, pa.Field] = {}
    for sch in (left, right):
        for f in sch:
            if f.name in fields and fields[f.name].type != f.type:
                raise TypeError(f"column {f.name} type mismatch: {fields[f.name].type} vs {f.type}")
            fields.setdefault(f.name, pa.field(f.name, f.type))
    for name, typ in tag_types.items():
        fields[name] = pa.field(name, typ)
    return pa.schema(list(fields.values()))
