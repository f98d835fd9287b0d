"""Serving-time lambda merge + Fetcher — the online half.

SawtoothOnlineAggregator re-expression (reference aggregator/.../windowing/
SawtoothOnlineAggregator.scala:29-170): a feature value at query_ts is

    finalize( collapsed ⊕ tail-hop tiles with start >= lo
              ⊕ streaming events with max(lo, batch_end_ts) <= ts < query_ts )

with lo = round(query_ts - window, tail_hop).  The batch/streaming seam is
exact: batch IRs cover ts < batch_end_ts only (upload.py filters), streaming
events are filtered to ts >= batch_end_ts here — no event is counted twice
and none is dropped ("zero temporal leakage", SURVEY §2.9).

The Fetcher is the reference's online Fetcher collapsed to its offline-
testable core: per-key batch IR map (what the KV store would hold) + per-key
streaming rows or sealed tiles (streaming.TileAggregator), with fetch()
returning the same feature row the offline kernel computes for (key, ts).

OnlineEnrich wraps the Fetcher as an actor-pool ``map_batches`` stage: the
batch-IR dict ships once via ray.put and each actor deserializes per-key blobs
lazily — point-lookups over a broadcast map, never a shuffle.
"""

from __future__ import annotations

import copy
import pickle

import numpy as np
import pandas as pd

from ..api import GroupBy
from ..aggregator.scalar_ops import make_scalar_op
from ..aggregator.windowing import FiveMinuteResolution, round_down
from .upload import IR_COL, load_upload


class SawtoothOnlineAggregator:
    """Stateless lambda merge for one GroupBy's parts."""

    def __init__(self, group_by: GroupBy, batch_end_ts: int,
                 resolution=FiveMinuteResolution):
        self.group_by = group_by
        self.parts = group_by.agg_parts()
        self.ops = [make_scalar_op(p) for p in self.parts]
        self.batch_end_ts = batch_end_ts
        self.resolution = resolution

    def lambda_aggregate(self, batch_ir: dict | None, stream_ts, stream_rows,
                         query_ts: int) -> dict:
        """batch_ir: {output_column: {"c": ir, "t": [(start, ir), ...]}} or
        None; stream_ts: ascending int array; stream_rows: {input_column:
        array} aligned with stream_ts (already seam-filtered)."""
        out = {}
        q = int(query_ts)
        for part, op in zip(self.parts, self.ops):
            if part.window.unbounded:
                lo = None
            else:
                hop = self.resolution.tail_hop(part.window)
                lo = round_down(q - part.window.millis, hop)
            acc = None
            if batch_ir is not None:
                entry = batch_ir.get(part.output_column)
                if entry is not None:
                    if entry["c"] is not None:
                        acc = copy.deepcopy(entry["c"])
                    for start, ir in entry["t"]:
                        if ir is None or (lo is not None and start < lo):
                            continue
                        piece = copy.deepcopy(ir)
                        acc = piece if acc is None else op.merge(acc, piece)
            if stream_ts is not None and len(stream_ts):
                s_lo = self.batch_end_ts if lo is None else max(lo, self.batch_end_ts)
                i0 = int(np.searchsorted(stream_ts, s_lo, side="left"))
                i1 = int(np.searchsorted(stream_ts, q, side="left"))
                vals = stream_rows.get(part.input_column)
                if vals is not None:
                    for i in range(i0, i1):
                        v = vals[i]
                        if v is None or (isinstance(v, float) and v != v):
                            continue
                        t = int(stream_ts[i])
                        acc = op.prepare(v, t) if acc is None else op.update(acc, v, t)
            out[part.output_column] = None if acc is None else op.finalize(acc)
        return out

    def _merged_base(self, op, entry, lo):
        """collapsed ⊕ in-window tiles for one part at one lo hop — the
        expensive deep-copy-and-merge, paid once per (key, part, lo) instead
        of once per query row (the prefix-fold-cache idea from the offline
        kernel, kernel.py:1242-1296, applied to the serving lambda)."""
        if entry is None:
            return None
        acc = copy.deepcopy(entry["c"]) if entry["c"] is not None else None
        for start, ir in entry["t"]:
            if ir is None or (lo is not None and start < lo):
                continue
            piece = copy.deepcopy(ir)
            acc = piece if acc is None else op.merge(acc, piece)
        return acc

    def lambda_aggregate_many(self, batch_ir: dict | None, stream_ts, stream_rows,
                              query_ts) -> dict:
        """Vectorized lambda_aggregate over MANY query timestamps of one key.

        Bitwise-identical to calling lambda_aggregate per row, but:
        window bounds are searchsorted in one shot per part; the
        collapsed+tiles merge is built once per distinct lo hop (queries
        quantize to few hops); and within a hop group, queries sorted by ts
        share ONE incremental event fold — each event is folded once per hop
        group, not once per query (the offline kernel's prefix-engine shape).
        Returns {output_column: list aligned with query_ts order}."""
        qts = np.asarray(query_ts, dtype=np.int64)
        n = len(qts)
        have_stream = stream_ts is not None and len(stream_ts) > 0
        out: dict = {}
        for part, op in zip(self.parts, self.ops):
            res: list = [None] * n
            vals = stream_rows.get(part.input_column) if have_stream else None
            if part.window.unbounded:
                lo_arr = None
                i0 = np.zeros(n, dtype=np.int64)
                if have_stream:
                    i0[:] = np.searchsorted(stream_ts, self.batch_end_ts, side="left")
            else:
                hop = self.resolution.tail_hop(part.window)
                lo_arr = round_down(qts - part.window.millis, hop)
                if have_stream:
                    s_lo = np.maximum(lo_arr, self.batch_end_ts)
                    i0 = np.searchsorted(stream_ts, s_lo, side="left")
            if have_stream:
                i1 = np.searchsorted(stream_ts, qts, side="left")
            # group queries by lo (one merged base per group), ts-ascending
            # within a group so the event fold advances monotonically
            order = (
                np.argsort(qts, kind="stable")
                if lo_arr is None
                else np.lexsort((qts, lo_arr))
            )
            pos = 0
            while pos < n:
                gend = pos
                if lo_arr is None:
                    gend = n
                else:
                    g_lo = lo_arr[order[pos]]
                    while gend < n and lo_arr[order[gend]] == g_lo:
                        gend += 1
                lo = None if lo_arr is None else int(lo_arr[order[pos]])
                entry = None if batch_ir is None else batch_ir.get(part.output_column)
                acc = self._merged_base(op, entry, lo)
                j = int(i0[order[pos]]) if have_stream else 0
                for oi in order[pos:gend]:
                    if vals is not None:
                        target = int(i1[oi])
                        while j < target:
                            v = vals[j]
                            t = int(stream_ts[j])
                            j += 1
                            if v is None or (isinstance(v, float) and v != v):
                                continue
                            acc = op.prepare(v, t) if acc is None else op.update(acc, v, t)
                    if acc is None:
                        res[oi] = None
                    else:
                        r = op.finalize(acc)
                        if r is acc:  # finalize aliases the live IR (Sum/TopK/…)
                            r = copy.copy(r)
                        res[oi] = r
                pos = gend
            out[part.output_column] = res
        return out


def _scatter_features(feat_cols: dict, idx: np.ndarray, feats: dict, out_cols):
    """Scatter one key-group's feature lists into per-column object arrays
    with numpy fancy indexing — two C-level assignments per column instead
    of a Python loop over queries x parts."""
    n = len(idx)
    for c in out_cols:
        vals = np.empty(n, dtype=object)
        vals[:] = feats[c]  # object target: safe for ragged list values
        feat_cols[c][idx] = vals


class Fetcher:
    """Per-key batch IRs + streaming state, answering point-in-time fetches.

    Streaming state is either raw rows (put_events) or a TileAggregator
    (attach_tiles) — the two streaming architectures the reference supports
    (raw-row lambda vs Flink tiled IRs)."""

    def __init__(self, group_by: GroupBy, batch_end_ts: int, upload=None,
                 resolution=FiveMinuteResolution):
        self.group_by = group_by
        self.agg = SawtoothOnlineAggregator(group_by, batch_end_ts, resolution)
        self.batch_end_ts = batch_end_ts
        self.key_cols = group_by.key_columns
        self._blobs: dict = {}
        self._cache: dict = {}
        if upload is not None:
            self._blobs = (
                upload if isinstance(upload, dict) else load_upload(upload, self.key_cols)
            )
        self._stream: dict[tuple, list] = {}  # key -> [ts_array, {col: arr}] pending sort
        self._tiles = None
        self.dropped_pre_seam = 0

    # -- streaming ingestion ------------------------------------------------
    def put_events(self, df: pd.DataFrame):
        """Ingest streaming rows; rows with ts < batch_end_ts are the batch
        half's property and are dropped (counted), preserving the seam."""
        pre = df["ts"] < self.batch_end_ts
        self.dropped_pre_seam += int(pre.sum())
        df = df[~pre]
        in_cols = {p.input_column for p in self.agg.parts}
        for key, sub in df.groupby(self.key_cols, sort=False):
            key = key if isinstance(key, tuple) else (key,)
            sub = sub.sort_values("ts", kind="stable")
            ts = sub["ts"].to_numpy(dtype=np.int64)
            rows = {c: sub[c].to_numpy() for c in in_cols if c in sub.columns}
            cur = self._stream.get(key)
            if cur is None:
                self._stream[key] = [ts, rows]
            else:  # merge-sort append (micro-batches may interleave in time)
                all_ts = np.concatenate([cur[0], ts])
                order = np.argsort(all_ts, kind="stable")
                merged = {
                    c: np.concatenate([cur[1][c], rows[c]])[order] for c in rows
                }
                self._stream[key] = [all_ts[order], merged]

    def attach_tiles(self, tile_aggregator):
        """Serve from a TileAggregator's sealed tiles + unsealed raw rows."""
        self._tiles = tile_aggregator

    # -- fetch --------------------------------------------------------------
    def _batch_ir(self, key: tuple):
        if key in self._cache:
            return self._cache[key]
        blob = self._blobs.get(key)
        ir = None if blob is None else pickle.loads(blob)
        self._cache[key] = ir
        return ir

    def fetch(self, key, query_ts: int) -> dict:
        key = key if isinstance(key, tuple) else (key,)
        batch_ir = self._batch_ir(key)
        if self._tiles is not None:
            return self._tiles.lambda_query(self.agg, batch_ir, key, query_ts)
        st = self._stream.get(key)
        ts, rows = (st[0], st[1]) if st else (None, None)
        return self.agg.lambda_aggregate(batch_ir, ts, rows, query_ts)

    def fetch_batch(self, batch: pd.DataFrame) -> dict[str, list]:
        """Vectorized fetch for a whole (key cols + ts) frame: one
        ``lambda_aggregate_many`` call per distinct key (searchsorted window
        bounds, per-hop memoized IR bases) instead of a Python dispatch per
        row — the same engine ServingKernel's distributed path uses.  Tile-
        backed serving stays per-row (TileAggregator holds mutable state).
        Returns {output_column: values aligned with batch's positions}."""
        out_cols = [p.output_column for p in self.agg.parts]
        feat_cols = {
            c: np.full(len(batch), None, dtype=object) for c in out_cols
        }
        if self._tiles is not None:
            for pos, (key, ts) in enumerate(
                zip(zip(*(batch[k] for k in self.key_cols)), batch["ts"])
            ):
                row = self.fetch(key, int(ts))
                for c in out_cols:
                    feat_cols[c][pos] = row[c]
            return {c: feat_cols[c].tolist() for c in out_cols}
        grouped = batch.reset_index(drop=True).groupby(self.key_cols, sort=False)
        for key, sub in grouped:
            key = key if isinstance(key, tuple) else (key,)
            st = self._stream.get(key)
            ts_arr, rows = (st[0], st[1]) if st else (None, None)
            feats = self.agg.lambda_aggregate_many(
                self._batch_ir(key), ts_arr, rows, sub["ts"].to_numpy(dtype=np.int64)
            )
            _scatter_features(feat_cols, sub.index.to_numpy(), feats, out_cols)
        return {c: feat_cols[c].tolist() for c in out_cols}


class ServingKernel:
    """Per-bucket lambda merge over three co-partitioned sides: queries
    (side 0), batch-IR upload rows (side 1), streaming-tail events (side 2).

    The scale path for offline application of the serving lambda: nothing is
    materialized on the driver — upload blobs and tail events ride the same
    hash(key) co-partition shuffle as the queries, so each bucket task sees
    exactly its keys' state (the distributed analogue of a KV-store range
    scan; reference Fetcher reads per-key from the store instead)."""

    def __init__(self, group_by: GroupBy, batch_end_ts: int, left_names,
                 resolution=FiveMinuteResolution):
        self.__name__ = "ServingKernel"
        self.agg = SawtoothOnlineAggregator(group_by, batch_end_ts, resolution)
        self.key_cols = group_by.key_columns
        self.left_names = list(left_names)
        self.in_cols = {p.input_column for p in self.agg.parts}

    def __call__(self, group):
        import pyarrow as pa

        from ..stages.shuffle import SIDE_COL

        if isinstance(group, pa.Table):
            side = group[SIDE_COL].to_numpy(zero_copy_only=False)
            queries = group.filter(pa.array(side == 0)).select(self.left_names).to_pandas()
            upload = group.filter(pa.array(side == 1)).to_pandas()
            stream = group.filter(pa.array(side == 2)).to_pandas()
        else:
            side = group[SIDE_COL].to_numpy()
            queries = group.loc[side == 0, self.left_names].reset_index(drop=True)
            upload = group.loc[side == 1].reset_index(drop=True)
            stream = group.loc[side == 2].reset_index(drop=True)
        out_cols = [p.output_column for p in self.agg.parts]
        if len(queries) == 0:
            cols = {c: [] for c in self.left_names}
            cols.update({c: [] for c in out_cols})
            return pd.DataFrame(cols)
        blobs: dict = {}
        if len(upload):
            keys = zip(*(upload[k] for k in self.key_cols))
            blobs = dict(zip(keys, upload[IR_COL]))
        tails: dict = {}
        if len(stream):
            stream = stream.sort_values("ts", kind="stable")
            for key, sub in stream.groupby(self.key_cols, sort=False):
                key = key if isinstance(key, tuple) else (key,)
                tails[key] = (
                    sub["ts"].to_numpy(dtype=np.int64),
                    {c: sub[c].to_numpy() for c in self.in_cols if c in sub.columns},
                )
        out = queries.copy()
        feat_cols = {
            c: np.full(len(queries), None, dtype=object) for c in out_cols
        }
        for key, sub in queries.groupby(self.key_cols, sort=False):
            key = key if isinstance(key, tuple) else (key,)
            blob = blobs.get(key)
            ir = None if blob is None else pickle.loads(blob)
            ts_arr, rows = tails.get(key, (None, None))
            # all of the key's queries in one vectorized call: searchsorted
            # bounds, per-hop memoized IR bases, shared incremental event fold
            feats = self.agg.lambda_aggregate_many(
                ir, ts_arr, rows, sub["ts"].to_numpy(dtype=np.int64)
            )
            _scatter_features(feat_cols, sub.index.to_numpy(), feats, out_cols)
        for c in out_cols:
            # .tolist() keeps pandas' dtype inference identical to the old
            # list-of-values writeback (float64 columns stay float64)
            out[c] = feat_cols[c].tolist()
        return out


def online_enrich_distributed(left_ds, group_by: GroupBy, batch_end_ts: int,
                              upload_ds, stream_ds=None, num_buckets: int = 32,
                              resolution=FiveMinuteResolution):
    """Serving lambda applied offline with zero driver materialization.

    left_ds: query rows (key columns + ts [+ passthrough]); upload_ds: the
    GroupByUpload table (key columns + __batch_ir + batch_end_ts), kept as a
    lazy Dataset; stream_ds: the streaming tail (key columns + ts + inputs),
    pre-filtered to ts >= batch_end_ts (rows before the seam are the batch
    half's property and are dropped here to preserve exactness).

    One union co-partition shuffle (the EntityKernel three-side pattern) —
    the scale-safe replacement for broadcasting the tail + upload dict via
    ray.put (OnlineEnrich), which holds the whole state per node."""
    import pyarrow as pa

    from ..pipelines.group_by import _arrow_schema
    from ..stages.shuffle import BUCKET_COL, SIDE_COL, AddBucket, pad_to_schema, unify_schemas

    key_cols = group_by.key_columns
    l_arrow = _arrow_schema(left_ds)
    u_arrow = _arrow_schema(upload_ds)
    unified = unify_schemas(l_arrow, u_arrow, {})
    if stream_ds is not None:
        stream_ds = stream_ds.filter(expr=f"ts >= {batch_end_ts}")
        unified = unify_schemas(unified, _arrow_schema(stream_ds), {SIDE_COL: pa.int8()})
    else:
        unified = unify_schemas(unified, pa.schema([]), {SIDE_COL: pa.int8()})

    def tag(side_val):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.append_column(
                SIDE_COL, pa.array(np.full(len(batch), side_val, dtype=np.int8))
            )
            return pad_to_schema(batch, unified)

        return fn

    unioned = left_ds.map_batches(tag(0), batch_format="pyarrow").union(
        upload_ds.map_batches(tag(1), batch_format="pyarrow")
    )
    if stream_ds is not None:
        unioned = unioned.union(stream_ds.map_batches(tag(2), batch_format="pyarrow"))
    bucketed = unioned.map_batches(AddBucket(key_cols, num_buckets), batch_format="pyarrow")
    kernel = ServingKernel(group_by, batch_end_ts, list(l_arrow.names), resolution)
    out = bucketed.groupby(BUCKET_COL).map_groups(kernel, batch_format="pyarrow")
    return out.select_columns(list(l_arrow.names) + [p.output_column for p in kernel.agg.parts])


class OnlineEnrich:
    """Actor-pool enrichment stage: ``map_batches(OnlineEnrich, fn_constructor_args=
    (upload_ref, events_ref, group_by, batch_end_ts), concurrency=N,
    batch_format="pandas")`` — the serving lambda applied offline at scale.

    upload_ref: ray.ObjectRef of the {key: blob} dict (ray.put once — every
    actor reads the same plasma copy, zero re-shipping per batch).
    events_ref: ObjectRef of a streaming-rows DataFrame or None.

    Broadcast trades state size for shuffle-free lookups: right when the
    upload+tail fit one node comfortably.  For large state use
    online_enrich_distributed (co-partition, no driver materialization)."""

    def __init__(self, upload_ref, events_ref, group_by: GroupBy, batch_end_ts: int):
        import ray

        upload = ray.get(upload_ref) if upload_ref is not None else {}
        self.fetcher = Fetcher(group_by, batch_end_ts, upload=upload)
        if events_ref is not None:
            self.fetcher.put_events(ray.get(events_ref))
        self.key_cols = group_by.key_columns

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feat_cols = self.fetcher.fetch_batch(batch)
        out = batch.copy()
        for col in self.fetcher.agg.parts:
            out[col.output_column] = feat_cols[col.output_column]
        return out
