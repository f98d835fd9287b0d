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
        """Vectorized per-bucket kernel (no pandas round-trip, no per-key
        Python loop over events):

        1. keys factorized via Arrow ``dictionary_encode`` (strings never
           box) + the offline kernel's radix mix for composite keys;
        2. one ``lexsort((ts, key))`` orders the bucket into contiguous
           per-key, ts-ascending segments;
        3. per part, collapsed IRs and tail-hop tiles are segmented
           ``ufunc.reduceat`` folds (``ScalarOp.fold_segments``); ops with
           object IRs (moments, K-ops, sketches) fall back to the per-row
           fold — but only over their own segment.

        Python touches each KEY once (dict assembly + pickle), never each
        event."""
        ops = [make_scalar_op(p) for p in self.parts]
        bounds = [
            part_boundaries(p, self.batch_end_ts, self.tail_buffer_ms, self.resolution)
            for p in self.parts
        ]
        in_cols = list(dict.fromkeys(p.input_column for p in self.parts))
        key_dicts: list = []  # per key col: (dictionary, codes) or (None, values)
        if isinstance(group, pa.Table):
            import pyarrow.compute as pc

            n = group.num_rows
            ts = group["ts"].to_numpy(zero_copy_only=False)
            key_valid = np.ones(n, dtype=bool)
            code_cols: list[np.ndarray] = []
            for k in self.key_cols:
                col = group[k]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                if col.null_count:
                    key_valid &= pc.is_valid(col).to_numpy(zero_copy_only=False)
                enc = pc.dictionary_encode(col)
                codes = pc.fill_null(enc.indices, -1).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                key_dicts.append((enc.dictionary, None))
                code_cols.append(codes)
            raw_vals = {
                c: group[c].to_numpy(zero_copy_only=False) for c in in_cols
            }
        else:
            n = len(group)
            ts = group["ts"].to_numpy()
            key_valid = np.ones(n, dtype=bool)
            code_cols = []
            for k in self.key_cols:
                arr = group[k].to_numpy()
                key_valid &= pd.notna(arr)
                codes, uniques = pd.factorize(arr, use_na_sentinel=False)
                key_dicts.append((None, np.asarray(uniques, dtype=object)))
                code_cols.append(codes.astype(np.int64))
            raw_vals = {c: group[c].to_numpy() for c in in_cols}
        if not key_valid.all():  # pandas-groupby parity: null keys dropped
            ridx = np.flatnonzero(key_valid)
            ts = ts[ridx]
            code_cols = [c[ridx] for c in code_cols]
            raw_vals = {c: v[ridx] for c, v in raw_vals.items()}
        if len(code_cols) == 1:
            joint = code_cols[0]
        else:
            from ..aggregator.kernel import _mix_codes

            joint = _mix_codes(code_cols).astype(np.int64)
        order = np.lexsort((ts, joint))
        ts = ts[order]
        joint = joint[order]
        code_cols = [c[order] for c in code_cols]
        raw_vals = {c: v[order] for c, v in raw_vals.items()}
        n_rows = len(ts)
        if n_rows == 0:
            seg_starts = np.zeros(0, dtype=np.int64)
        else:
            seg_starts = np.concatenate(
                ([0], np.flatnonzero(np.diff(joint)) + 1)
            )
        n_keys = len(seg_starts)

        # per part: collapsed IR per key (object array) + tiles list per key
        collapsed_parts: list[np.ndarray] = []
        tiles_parts: list[list] = []
        for part, op, (lo_min, lo_max, hop) in zip(self.parts, ops, bounds):
            vals = raw_vals[part.input_column]
            valid = pd.notna(vals)
            body = valid if lo_min is None else valid & (ts >= lo_max)
            collapsed = np.full(n_keys, None, dtype=object)
            _fold_masked_segments(op, vals, ts, joint, seg_starts, body, collapsed)
            tiles: list = [[] for _ in range(n_keys)]
            if lo_min is not None:
                in_tail = valid & (ts >= lo_min) & (ts < lo_max)
                if in_tail.any():
                    t_idx = np.flatnonzero(in_tail)
                    t_ts = ts[t_idx]
                    t_vals = vals[t_idx]
                    t_key = joint[t_idx]
                    t_tile = (t_ts // hop) * hop
                    cut = np.flatnonzero(
                        (np.diff(t_key) != 0) | (np.diff(t_tile) != 0)
                    ) + 1
                    st = np.concatenate(([0], cut))
                    irs = op.fold_segments(t_vals, t_ts, st)
                    if irs is None:
                        en = np.append(st[1:], len(t_idx))
                        irs = [
                            _fold_slice(op, t_vals, t_ts, s, e)
                            for s, e in zip(st, en)
                        ]
                    seg_key = np.searchsorted(
                        joint[seg_starts], t_key[st], side="left"
                    )
                    for ki, t0, ir in zip(seg_key, t_tile[st], irs):
                        tiles[ki].append((int(t0), ir))
            collapsed_parts.append(collapsed)
            tiles_parts.append(tiles)

        out_cols = [p.output_column for p in self.parts]
        out_blobs: list[bytes] = []
        for ki in range(n_keys):
            ir_row = {
                c: {"c": collapsed_parts[pi][ki], "t": tiles_parts[pi][ki]}
                for pi, c in enumerate(out_cols)
            }
            out_blobs.append(pickle.dumps(ir_row, protocol=pickle.HIGHEST_PROTOCOL))

        cols = []
        for i, f in enumerate(self.key_fields):
            rep = code_cols[i][seg_starts] if n_keys else np.zeros(0, np.int64)
            dictionary, uniques = key_dicts[i]
            if dictionary is not None:  # arrow path: unbox only representatives
                arr = dictionary.take(pa.array(rep, pa.int64()))
                if arr.type != f.type:
                    arr = arr.cast(f.type)
            else:
                arr = pa.array(uniques[rep], type=f.type)
            cols.append(arr)
        cols.append(pa.array(out_blobs, type=pa.binary()))
        cols.append(pa.array(np.full(n_keys, self.batch_end_ts, dtype=np.int64)))
        return pa.Table.from_arrays(
            cols,
            schema=pa.schema(
                list(self.key_fields)
                + [pa.field(IR_COL, pa.binary()), pa.field("batch_end_ts", pa.int64())]
            ),
        )


def _fold_slice(op, vals, ts, s: int, e: int):
    """Sequential prepare/update fold over contiguous rows [s, e) — the
    reference semantics, used for ops without a vectorized fold."""
    ir = None
    for i in range(s, e):
        ir = (
            op.prepare(vals[i], int(ts[i]))
            if ir is None
            else op.update(ir, vals[i], int(ts[i]))
        )
    return ir


def _fold_masked_segments(op, vals, ts, joint, seg_starts, mask, out):
    """Fold mask-selected rows of each key segment into out[key_idx].

    Rows are (key, ts)-sorted, so the masked subset stays contiguous per
    key; folds run as one segmented reduceat when the op supports it."""
    idx = np.flatnonzero(mask)
    if len(idx) == 0:
        return
    sub_vals = vals[idx]
    sub_ts = ts[idx]
    sub_key = joint[idx]
    st = np.concatenate(([0], np.flatnonzero(np.diff(sub_key)) + 1))
    irs = op.fold_segments(sub_vals, sub_ts, st)
    if irs is None:
        en = np.append(st[1:], len(idx))
        irs = [_fold_slice(op, sub_vals, sub_ts, s, e) for s, e in zip(st, en)]
    ki = np.searchsorted(joint[seg_starts], sub_key[st], side="left")
    packed = np.empty(len(irs), dtype=object)
    packed[:] = irs
    out[ki] = packed


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
