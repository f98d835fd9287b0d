"""GroupByUpload — the batch half of the serving lambda.

Computes, per entity key, the *batch IR* a serving fetcher needs to answer
point-in-time queries for query_ts in [batch_end_ts, batch_end_ts +
tail_buffer): re-expresses the reference's GroupByUpload
(spark/.../GroupByUpload.scala:39-118) + the FinalBatchIr layout of
SawtoothOnlineAggregator (aggregator/.../windowing/
SawtoothOnlineAggregator.scala:29-170: collapsed IR + tail hop tiles).

Per windowed aggregation part (window w, tail hop h) the serving-time lower
bound lo = round(query_ts - w, h) sweeps over

    lo_min = round(batch_end_ts - w, h)              (query at batch_end_ts)
    lo_max = min(round(batch_end_ts + tail_buffer - w, h), batch_end_ts)

so batch events split three ways:

    ts <  lo_min            -> outside every servable window: dropped
    lo_min <= ts < lo_max   -> *tail hop tiles* at resolution h (the window
                               tail sweeps through here; whole tiles expire)
    lo_max <= ts < batch_end-> *collapsed* single IR (inside every window)

Unbounded windows collapse everything.  Queries beyond batch_end_ts +
tail_buffer are stale-batch territory: the collapsed IR over-includes (the
reference behaves the same way — uploads are expected to refresh daily).

Dataflow (Ray-Data-first): scan sources filtered to ts < batch_end_ts ->
project to keys+ts+inputs -> AddBucket co-partition shuffle ->
groupby(bucket).map_groups(UploadKernel) -> one row per key with a pickled
IR blob (the reference ships Avro-encoded IRs to a KV store; a binary
column in a parquet/Lance table is the warehouse-native equivalent).
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import pyarrow as pa

from ..api import GroupBy
from ..aggregator.scalar_ops import make_scalar_op
from ..aggregator.windowing import FiveMinuteResolution, round_down
from ..sources.io import scan_source, union_sources
from ..stages.shuffle import BUCKET_COL, AddBucket

IR_COL = "__batch_ir"


def part_boundaries(part, batch_end_ts: int, tail_buffer_ms: int,
                    resolution=FiveMinuteResolution):
    """(lo_min, lo_max, hop) for a part; (None, None, None) when unbounded."""
    if part.window.unbounded:
        return None, None, None
    w = part.window.millis
    hop = resolution.tail_hop(part.window)
    lo_min = round_down(batch_end_ts - w, hop)
    lo_max = min(round_down(batch_end_ts + tail_buffer_ms - w, hop), batch_end_ts)
    return lo_min, max(lo_max, lo_min), hop


class UploadKernel:
    """map_groups callable: one co-partitioned bucket -> one IR row per key."""

    def __init__(self, key_cols, parts, batch_end_ts: int, tail_buffer_ms: int,
                 key_fields: list[pa.Field], resolution=FiveMinuteResolution):
        self.__name__ = "UploadKernel"
        self.key_cols = key_cols
        self.parts = parts
        self.batch_end_ts = batch_end_ts
        self.tail_buffer_ms = tail_buffer_ms
        self.resolution = resolution
        self.key_fields = key_fields
        for p in parts:
            if p.bucket is not None or p.element_wise:
                raise NotImplementedError(
                    "online upload: bucketed/element-wise parts are offline-only"
                )

    def __call__(self, group) -> pa.Table:
        if isinstance(group, pa.Table):
            group = group.to_pandas()
        group = group.sort_values("ts", kind="stable")
        ops = [make_scalar_op(p) for p in self.parts]
        bounds = [
            part_boundaries(p, self.batch_end_ts, self.tail_buffer_ms, self.resolution)
            for p in self.parts
        ]
        out_keys: list[tuple] = []
        out_blobs: list[bytes] = []
        for key, sub in group.groupby(self.key_cols, sort=False):
            key = key if isinstance(key, tuple) else (key,)
            ts = sub["ts"].to_numpy()
            ir_row: dict = {}
            for part, op, (lo_min, lo_max, hop) in zip(self.parts, ops, bounds):
                vals = sub[part.input_column].to_numpy()
                valid = pd.notna(vals)
                collapsed = None
                tiles: list = []
                if lo_min is None:  # unbounded: collapse everything
                    collapsed = _fold(op, vals, ts, valid)
                else:
                    in_tail = valid & (ts >= lo_min) & (ts < lo_max)
                    in_body = valid & (ts >= lo_max)
                    collapsed = _fold(op, vals, ts, in_body)
                    if in_tail.any():
                        t_ts = ts[in_tail]
                        t_vals = vals[in_tail]
                        starts = (t_ts // hop) * hop
                        # events arrive ts-sorted, so tile segments are runs
                        cut = np.flatnonzero(np.diff(starts)) + 1
                        seg_starts = np.concatenate(([0], cut))
                        seg_ends = np.concatenate((cut, [len(starts)]))
                        for s, e in zip(seg_starts, seg_ends):
                            ir = None
                            for i in range(s, e):
                                ir = (
                                    op.prepare(t_vals[i], int(t_ts[i]))
                                    if ir is None
                                    else op.update(ir, t_vals[i], int(t_ts[i]))
                                )
                            tiles.append((int(starts[s]), ir))
                ir_row[part.output_column] = {"c": collapsed, "t": tiles}
            out_keys.append(key)
            out_blobs.append(pickle.dumps(ir_row, protocol=pickle.HIGHEST_PROTOCOL))
        cols = []
        for i, f in enumerate(self.key_fields):
            cols.append(pa.array([k[i] for k in out_keys], type=f.type))
        cols.append(pa.array(out_blobs, type=pa.binary()))
        cols.append(pa.array(np.full(len(out_keys), self.batch_end_ts, dtype=np.int64)))
        return pa.Table.from_arrays(
            cols,
            schema=pa.schema(
                list(self.key_fields)
                + [pa.field(IR_COL, pa.binary()), pa.field("batch_end_ts", pa.int64())]
            ),
        )


def _fold(op, vals, ts, mask):
    ir = None
    for i in np.flatnonzero(mask):
        ir = (
            op.prepare(vals[i], int(ts[i]))
            if ir is None
            else op.update(ir, vals[i], int(ts[i]))
        )
    return ir


def group_by_upload(
    group_by: GroupBy,
    batch_end_ts: int,
    num_buckets: int = 64,
    tail_buffer_ms: int = 2 * 24 * 3600 * 1000,
    resolution=FiveMinuteResolution,
):
    """Batch IR table for a GroupBy as of batch_end_ts (one row per key:
    key columns + pickled IR blob + batch_end_ts).  Returns a lazy Dataset —
    write_parquet it for the daily upload artifact."""
    parts = group_by.agg_parts()
    key_cols = group_by.key_columns
    ds = union_sources([scan_source(s) for s in group_by.sources])

    from ..pipelines.group_by import _arrow_schema

    schema = _arrow_schema(ds)  # static when possible — no pipeline probe
    needed = list(dict.fromkeys(key_cols + ["ts"] + [p.input_column for p in parts]))
    if set(needed) != set(schema.names):
        keep = [c for c in needed if c in set(schema.names)]
        ds = ds.select_columns(keep)
        schema = pa.schema([schema.field(c) for c in keep])
    # the seam: batch strictly owns ts < batch_end_ts (streaming owns the
    # rest; SawtoothOnlineAggregator.scala:105-123 filters the same way)
    ds = ds.filter(expr=f"ts < {batch_end_ts}")
    # events older than every part's lo_min can never be served: prune before
    # the shuffle (unbounded parts keep everything)
    lo_mins = [
        part_boundaries(p, batch_end_ts, tail_buffer_ms, resolution)[0] for p in parts
    ]
    if all(lo is not None for lo in lo_mins):
        ds = ds.filter(expr=f"ts >= {min(lo_mins)}")
    key_fields = [pa.field(k, schema.field(k).type) for k in key_cols]
    bucketed = ds.map_batches(AddBucket(key_cols, num_buckets), batch_format="pyarrow")
    kernel = UploadKernel(key_cols, parts, batch_end_ts, tail_buffer_ms, key_fields, resolution)
    out = bucketed.groupby(BUCKET_COL).map_groups(kernel, batch_format=None)
    out = out.select_columns(key_cols + [IR_COL, "batch_end_ts"])
    out._raywin_schema = pa.schema(
        key_fields + [pa.field(IR_COL, pa.binary()), pa.field("batch_end_ts", pa.int64())]
    )
    return out


def load_upload(upload_ds, key_cols: list[str], max_rows: int = 1_000_000) -> dict:
    """Materialize an upload table into the serving map {key_tuple: blob}.

    The per-key IR table is exactly what the reference ships to its KV store
    (GroupByUpload -> Api.put); a real deployment loads this into the store
    and the Fetcher reads per-key.  For in-process serving / offline
    enrichment we hold the dict (broadcast once via ray.put for distributed
    enrichment — see serving.OnlineEnrich).

    COUNT-GATED (like the q3 dimension broadcast): broadcasting is only
    correct while the whole IR table fits one node, so a table above
    ``max_rows`` raises and points at online_enrich_distributed — the
    co-partitioned path with zero driver materialization.  Raise the limit
    explicitly only when the deployment's nodes are known to hold it."""
    if isinstance(upload_ds, pd.DataFrame):
        n = len(upload_ds)
    else:
        n = upload_ds.count()  # metadata count: no materialization
    if n > max_rows:
        raise ValueError(
            f"upload table has {n} keys > max_rows={max_rows}: broadcasting "
            "would hold the whole IR state on every node — use "
            "online.serving.online_enrich_distributed (co-partitioned, no "
            "driver materialization) or raise max_rows deliberately"
        )
    df = upload_ds if isinstance(upload_ds, pd.DataFrame) else upload_ds.to_pandas()
    keys = list(zip(*(df[k] for k in key_cols))) if len(df) else []
    return dict(zip(keys, df[IR_COL]))
