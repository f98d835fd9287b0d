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

from ray.data.aggregate import Max as _TsMax, Min as _TsMin, Sum as _CntSum  # noqa: E402


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


CHUNK_COL = "__chunk"


class AddBucket:
    """map_batches fn adding BUCKET_COL = hash(keys) % num_buckets.

    When a CHUNK_COL is present (hot-key time chunking), rows with chunk >= 0
    are bucketed by hash(keys, chunk) so a hot entity's chunks land on
    different partitions (the time-bucket skew answer,
    reference docs/source/window_tiling.md:381-390)."""

    def __init__(self, key_cols: list[str], num_buckets: int, time_bucket_ms: int | None = None):
        self.key_cols = key_cols
        self.num_buckets = num_buckets
        self.time_bucket_ms = time_bucket_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = stable_hash([batch[c].to_numpy(zero_copy_only=False) for c in self.key_cols])
        if self.time_bucket_ms:
            tb = batch["ts"].to_numpy(zero_copy_only=False) // self.time_bucket_ms
            h = h * np.uint64(1000003) + tb.astype(np.uint64)
        if CHUNK_COL in batch.column_names:
            chunk = batch[CHUNK_COL].to_numpy(zero_copy_only=False)
            hot = chunk >= 0
            with np.errstate(over="ignore"):
                h = np.where(
                    hot, h * np.uint64(0x9E3779B97F4A7C15) + chunk.astype(np.uint64), h
                )
        bucket = (h % np.uint64(self.num_buckets)).astype(np.int32)
        return batch.append_column(BUCKET_COL, pa.array(bucket))


class HotChunkTag:
    """Tag LEFT (query) rows of hot entities with their time chunk; cold rows
    get chunk -1.  The hot-key set is small (heavy hitters only) and ships
    inline with the UDF."""

    def __init__(self, key_col: str, hot_keys, chunk_ms: int, max_chunk: int | None = None):
        self.key_col = key_col
        self.hot_arr = np.asarray(sorted(hot_keys), dtype=object)
        self.chunk_ms = chunk_ms
        self.max_chunk = max_chunk

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        is_hot = np.isin(keys, self.hot_arr)
        chunk = np.where(is_hot, ts // self.chunk_ms, -1).astype(np.int64)
        if self.max_chunk is not None:
            # late queries share the last chunk's bucket — replication caps at
            # max_chunk, so an uncapped chunk id would see no events at all
            chunk = np.minimum(chunk, self.max_chunk)
        return batch.append_column(CHUNK_COL, pa.array(chunk))


class HotChunkReplicate:
    """Replicate RIGHT (event) rows of hot entities into every time chunk
    whose queries can see them: chunks from floor(ts/S) through
    floor((ts + lookback)/S) — lookback = max bounded window + tail hop, or
    every later chunk when an unbounded window is present."""

    def __init__(self, key_col: str, hot_keys, chunk_ms: int, lookback_ms: int,
                 max_chunk: int, unbounded: bool):
        self.key_col = key_col
        self.hot_arr = np.asarray(sorted(hot_keys), dtype=object)
        self.chunk_ms = chunk_ms
        self.lookback_ms = lookback_ms
        self.max_chunk = max_chunk
        self.unbounded = unbounded

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        is_hot = np.isin(keys, self.hot_arr)
        cold = batch.filter(pa.array(~is_hot)).append_column(
            CHUNK_COL, pa.array(np.full(int((~is_hot).sum()), -1, dtype=np.int64))
        )
        hot_tbl = batch.filter(pa.array(is_hot))
        if len(hot_tbl) == 0:
            return cold
        hts = hot_tbl["ts"].to_numpy(zero_copy_only=False)
        first = hts // self.chunk_ms
        if self.unbounded:
            last = np.full_like(first, self.max_chunk)
        else:
            last = np.minimum((hts + self.lookback_ms) // self.chunk_ms, self.max_chunk)
        counts = (last - first + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(hot_tbl)), counts)
        offsets = np.repeat(first, counts) + _seq_within(counts)
        rep = hot_tbl.take(pa.array(idx)).append_column(
            CHUNK_COL, pa.array(offsets.astype(np.int64))
        )
        return pa.concat_tables([cold, rep], promote_options="default")


class HotKeyConfig:
    """Heavy-hitter handling config: which keys are hot, the time-chunk span,
    and the max chunk id (from the data's ts range)."""

    def __init__(self, keys, chunk_ms: int, ts_max: int):
        self.keys = set(keys)
        self.chunk_ms = int(chunk_ms)
        self.max_chunk = int(ts_max) // int(chunk_ms)

    def __bool__(self):
        return bool(self.keys)


def detect_hot_keys(
    ds,
    key_col: str,
    hot_fraction: float = 0.02,
    n_chunks: int = 8,
    candidate_cap: int = 1_000_000,
) -> HotKeyConfig:
    """Distributed heavy-hitter scan (the reference Analyzer's FrequentItems
    analogue, spark/.../Analyzer.scala:116-190), exact and shuffle-free.

    Pigeonhole: a key holding >= hot_fraction of ALL rows must hold
    >= hot_fraction of at least one block's rows (if it were below f in
    every block, its total would be below f of the total).  So pass A keeps
    only each block's LOCALLY-hot keys — at most 1/hot_fraction per block —
    plus one per-block summary row (count + ts range); the driver sees a
    bounded candidate union, never a per-key exchange.  Pass B broadcasts
    the candidates and exact-counts just them (at most |candidates| rows per
    block).  The earlier version shuffled a distinct-keys-per-block x blocks
    partial table through groupby(key) — measured 15.4 s of a 66 s job at
    6M rows, and unboundedly worse at corpus scale.  Exact results, unlike
    the retired sampled detector (kept as _detect_hot_keys_sampled for the
    agreement test)."""
    proj = ds.select_columns([key_col, "ts"])

    def _pass_a(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if len(batch) == 0:
            return pa.table(
                {
                    key_col: keys.slice(0, 0),
                    "cnt": pa.array([], pa.int64()),
                    "ts_lo": pa.array([], pa.int64()),
                    "ts_hi": pa.array([], pa.int64()),
                }
            )
        vc = pc.value_counts(keys)
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        local_hot = counts >= hot_fraction * len(batch)
        cand = vc.field("values").filter(pa.array(local_hot))
        n = len(cand)
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        # candidate rows carry cnt = -1 (sentinel); ONE summary row per
        # block carries (null key, block rows, block ts range)
        return pa.table(
            {
                key_col: pa.concat_arrays([cand.combine_chunks() if isinstance(cand, pa.ChunkedArray) else cand,
                                           pa.nulls(1, keys.type)]),
                "cnt": pa.array(list(np.full(n, -1, dtype=np.int64)) + [len(batch)], pa.int64()),
                "ts_lo": pa.array([0] * n + [int(ts.min())], pa.int64()),
                "ts_hi": pa.array([0] * n + [int(ts.max())], pa.int64()),
            }
        )

    rows = proj.map_batches(_pass_a, batch_format="pyarrow").take_all()
    total = sum(r["cnt"] for r in rows if r[key_col] is None)
    if total == 0:
        return HotKeyConfig(set(), 1, 0)
    candidates = sorted({r[key_col] for r in rows if r[key_col] is not None})
    if not candidates:
        return HotKeyConfig(set(), 1, 0)
    if len(candidates) > candidate_cap:
        raise ValueError(
            f"hot-key candidate union {len(candidates)} exceeds "
            f"candidate_cap={candidate_cap}: raise hot_fraction or the cap"
        )
    ts_min = min(r["ts_lo"] for r in rows if r[key_col] is None)
    ts_max = max(r["ts_hi"] for r in rows if r[key_col] is None)

    cand_arr = np.asarray(candidates, dtype=object)

    def _pass_b(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        mask = np.isin(keys, cand_arr)
        vc = pc.value_counts(pa.array(keys[mask]))
        return pa.table(
            {
                key_col: vc.field("values"),
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    exact: dict = {}
    for r in proj.map_batches(_pass_b, batch_format="pyarrow").take_all():
        exact[r[key_col]] = exact.get(r[key_col], 0) + r["cnt"]
    thresh = hot_fraction * total
    hot = {k for k, c in exact.items() if c > thresh}
    if not hot:
        return HotKeyConfig(set(), 1, 0)
    chunk_ms = max(1, (ts_max - ts_min) // n_chunks + 1)
    return HotKeyConfig(hot, chunk_ms, ts_max + chunk_ms)


def _detect_hot_keys_sampled(
    ds,
    key_col: str,
    sample_fraction: float = 0.05,
    hot_fraction: float = 0.02,
    n_chunks: int = 8,
    seed: int = 7,
) -> HotKeyConfig:
    """RETIRED sampled detector (driver-side pandas sample) — kept only so
    tests can assert the distributed detector agrees with it.  Do not call
    from pipelines: the sample materializes on the driver and cannot run at
    the 100-TB target."""
    sample = (
        ds.select_columns([key_col, "ts"])
        .random_sample(sample_fraction, seed=seed)
        .to_pandas()
    )
    if len(sample) == 0:
        return HotKeyConfig(set(), 1, 0)
    counts = sample[key_col].value_counts(normalize=True)
    hot = set(counts[counts > hot_fraction].index)
    if not hot:
        return HotKeyConfig(set(), 1, 0)
    mm = ds.select_columns(["ts"]).aggregate(_TsMin("ts"), _TsMax("ts"))
    ts_min, ts_max = int(mm["min(ts)"]), int(mm["max(ts)"])
    chunk_ms = max(1, (ts_max - ts_min) // n_chunks + 1)
    return HotKeyConfig(hot, chunk_ms, ts_max + chunk_ms)


def _seq_within(counts: np.ndarray) -> np.ndarray:
    """[0,1,..c0-1, 0,1,..c1-1, ...] for the given counts."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    return np.arange(total) - np.repeat(starts, counts)


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
