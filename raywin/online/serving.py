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


class OnlineEnrich:
    """Actor-pool enrichment stage: ``map_batches(OnlineEnrich, fn_constructor_args=
    (upload_ref, events_ref, group_by, batch_end_ts), concurrency=N,
    batch_format="pandas")`` — the serving lambda applied offline at scale.

    upload_ref: ray.ObjectRef of the {key: blob} dict (ray.put once — every
    actor reads the same plasma copy, zero re-shipping per batch).
    events_ref: ObjectRef of a streaming-rows DataFrame or None."""

    def __init__(self, upload_ref, events_ref, group_by: GroupBy, batch_end_ts: int):
        import ray

        upload = ray.get(upload_ref) if upload_ref is not None else {}
        self.fetcher = Fetcher(group_by, batch_end_ts, upload=upload)
        if events_ref is not None:
            self.fetcher.put_events(ray.get(events_ref))
        self.key_cols = group_by.key_columns

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = [
            self.fetcher.fetch(key, int(ts))
            for key, ts in zip(
                zip(*(batch[k] for k in self.key_cols)), batch["ts"]
            )
        ]
        out = batch.copy()
        for col in self.fetcher.agg.parts:
            out[col.output_column] = [f[col.output_column] for f in feats]
        return out
