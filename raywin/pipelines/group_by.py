"""GroupBy backfill pipelines — Ray-Data-native temporal & snapshot modes.

Dataflow for TEMPORAL accuracy (the reference's temporalEvents,
spark/.../GroupBy.scala:279-358, re-expressed Ray-Data-first):

    right = scan sources (projection pushdown, Query layer)      [stateless]
    left  = query rows (keys..., ts)                             [stateless]
    both  -> pad to unified schema, tag __side, union            [stateless]
          -> AddBucket hash(keys) % P                            [stateless]
          -> groupby(__bucket).map_groups(PartitionKernel)       [the shuffle]
          -> Arrow feature rows, one per left (keys, ts)

One all-to-all exchange total: both sides co-partition in a single
``groupby`` shuffle and the vectorized kernel (aggregator/kernel.py) does the
per-partition sort + sawtooth window evaluation.  This replaces the
reference's three-way leftOuterJoin topology (GroupBy.scala:340-355) with an
equivalent single-shuffle union join.

SNAPSHOT accuracy (reference snapshotEvents, GroupBy.scala:144-169): queries
are synthesized at day-end boundaries per (key, ds) and the same kernel runs
with DailyResolution.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..api import MILLIS_DAY, Accuracy, AggregationPart, GroupBy, Operation
from ..aggregator.kernel import PartitionAggregator
from ..aggregator.windowing import DailyResolution, FiveMinuteResolution
from ..sources.io import scan_source, union_sources
from ..stages.query import apply_derivations
from ..stages.shuffle import BUCKET_COL, SIDE_COL, AddBucket, pad_to_schema, unify_schemas

import os as _os

SHUFFLE_BUNDLE_ROWS = int(_os.environ.get("RAYWIN_SHUFFLE_BUNDLE_ROWS", "32768"))

_FLOAT_OUT = {
    Operation.AVERAGE,
    Operation.VARIANCE,
    Operation.SKEW,
    Operation.KURTOSIS,
}
_INT_OUT = {
    Operation.COUNT,
    Operation.UNIQUE_COUNT,
    Operation.APPROX_UNIQUE_COUNT,
    Operation.BOUNDED_UNIQUE_COUNT,
}


def output_type(part: AggregationPart, input_type: pa.DataType) -> pa.DataType:
    op = part.operation
    if pa.types.is_map(input_type) and part.bucket is None and not part.element_wise:
        # per-key map aggregation: map<key, out-of-scalar-op-on-values>
        inner = AggregationPart(op, part.input_column, part.window, part.arg_map)
        return pa.map_(input_type.key_type, output_type(inner, input_type.item_type))
    if pa.types.is_list(input_type) and not part.element_wise and op not in (
        Operation.HISTOGRAM, Operation.APPROX_HISTOGRAM_K
    ):
        input_type = input_type.value_type  # auto-explode: element semantics
    if op in _INT_OUT:
        base = pa.int64()
    elif op in _FLOAT_OUT:
        base = pa.float64()
    elif op is Operation.SUM:
        base = pa.int64() if pa.types.is_integer(input_type) else pa.float64()
    elif op in (Operation.HISTOGRAM, Operation.APPROX_HISTOGRAM_K):
        base = pa.map_(pa.string(), pa.int64())
    elif op is Operation.APPROX_PERCENTILE:
        base = pa.list_(pa.float64())
    elif op in (Operation.TOP_K, Operation.BOTTOM_K):
        # numeric inputs run the float64 segtree engine (ints coerce to
        # float); non-numeric inputs run the object engine and keep their type
        if pa.types.is_integer(input_type) or pa.types.is_floating(input_type):
            base = pa.list_(pa.float64())
        else:
            base = pa.list_(input_type)
    elif op in (Operation.FIRST_K, Operation.LAST_K):
        elem = input_type.value_type if part.element_wise else input_type
        base = pa.list_(elem)
    else:  # MIN MAX FIRST LAST
        base = input_type.value_type if part.element_wise else input_type
    if part.element_wise and op not in (Operation.FIRST_K, Operation.LAST_K):
        base = pa.list_(base)
    if part.bucket is not None:
        base = pa.map_(pa.string(), base)
    return base


def _to_arrow_column(values, typ: pa.DataType) -> pa.Array:
    raw = values if isinstance(values, np.ndarray) else np.asarray(values)
    # vectorized fast paths (hot: every passthrough column of every group)
    if raw.dtype.kind in "iu" and (pa.types.is_integer(typ) or pa.types.is_floating(typ)):
        return pa.array(raw, type=typ)
    if raw.dtype.kind == "f":
        m = np.isnan(raw)
        if pa.types.is_floating(typ):
            return pa.array(raw, type=typ, from_pandas=True)  # NaN -> null
        if pa.types.is_integer(typ):
            return pa.array(
                np.where(m, 0, raw).astype(np.int64), type=typ, mask=m
            )
    arr = np.asarray(values, dtype=object)
    if pa.types.is_floating(typ):
        clean = [None if v is None or (isinstance(v, float) and np.isnan(v)) else float(v) for v in arr]
        return pa.array(clean, type=typ)
    if pa.types.is_integer(typ):
        clean = [None if v is None or (isinstance(v, float) and np.isnan(v)) else int(v) for v in arr]
        return pa.array(clean, type=typ)
    if pa.types.is_map(typ):
        clean = []
        for v in arr:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                clean.append(None)
            elif isinstance(v, dict):
                clean.append(sorted(v.items()))
            else:  # arrow->pandas round trip yields list-of-(key, value)
                clean.append([tuple(t) for t in v])
        return pa.array(clean, type=typ)
    return pa.array(list(arr), type=typ, from_pandas=True)


def _pandas_to_arrow(df: pd.DataFrame, schema: pa.Schema) -> pa.Table:
    """Rebuild an Arrow block from a pandas block using the KNOWN schema.

    Ray's sort shuffle can fall back to pandas blocks (an empty pandas block
    riding the union poisons the reduce-side concat), and generic
    pandas->arrow inference cannot reconstruct map/list columns."""
    n = len(df)
    cols = []
    for f in schema:
        if f.name in df.columns:
            cols.append(_to_arrow_column(df[f.name].to_numpy(), f.type))
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(cols, schema=schema)


class PartitionKernel:
    """map_groups callable: split a co-partitioned bucket into (events,
    queries), run the vectorized PartitionAggregator, emit Arrow."""

    def __init__(
        self,
        key_cols: list[str],
        parts: list[AggregationPart],
        left_schema: pa.Schema,
        input_types: dict[str, pa.DataType],
        resolution=FiveMinuteResolution,
        head_rounding: int = 1,
        tie_breaker: str | None = None,
        dedupe_queries: bool = False,
        union_schema: pa.Schema | None = None,
    ):
        self.__name__ = "PartitionKernel"  # ray map_groups wraps plain fns
        self.union_schema = union_schema
        self.key_cols = key_cols
        self.parts = parts
        self.left_schema = left_schema
        self.resolution = resolution
        self.head_rounding = head_rounding
        self.tie_breaker = tie_breaker
        self.out_fields = [
            pa.field(p.output_column, output_type(p, input_types[p.input_column]))
            for p in parts
        ]
        self.agg = PartitionAggregator(
            key_cols, parts, resolution, head_rounding, tie_breaker, dedupe_queries
        )

    def __call__(self, group) -> pa.Table:
        if isinstance(group, pd.DataFrame):
            # sort-shuffle pandas fallback: rebuild with the declared schema
            group = _pandas_to_arrow(group, self.union_schema)
        from ..stages.shuffle import CHUNK_COL

        side = group[SIDE_COL].to_numpy(zero_copy_only=False)
        left_names = [n for n in self.left_schema.names]
        is_left = side == 0
        # hot-key time chunking: the chunk id joins the entity key on BOTH
        # sides so two chunks of one key that hash-collide into this bucket
        # stay separate partitions (correctness must not depend on
        # num_buckets >= number of chunk ids)
        chunked = CHUNK_COL in group.column_names
        lt_names = left_names + ([CHUNK_COL] if chunked else [])
        lt = group.filter(pa.array(is_left)).select(lt_names)
        rt_names = [
            n for n in group.column_names if n not in (BUCKET_COL, SIDE_COL) and n not in left_names
        ] + self.key_cols + ["ts"]
        rt = group.filter(pa.array(~is_left)).select(list(dict.fromkeys(rt_names)))
        out_schema = pa.schema(list(self.left_schema) + self.out_fields)
        if lt.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.nulls(0, f.type) for f in out_schema], schema=out_schema
            )
        # Arrow-native kernel ingestion: only the columns the kernel actually
        # touches (keys, ts, aggregation inputs) convert to numpy — map
        # columns via per-column maps_as_pydicts — and the query passthrough
        # payload is reordered with Table.take, never boxed through pandas.
        q_order, results = self.agg.aggregate_tables(
            rt, lt, extra_key_cols=(CHUNK_COL,) if chunked else ()
        )
        taken = lt.select(left_names).take(q_order)
        cols = []
        for f in self.left_schema:
            c = taken.column(f.name)
            if c.type != f.type:
                try:
                    c = c.cast(f.type)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                    c = _to_arrow_column(c.to_numpy(zero_copy_only=False), f.type)
            cols.append(c)
        for f, part in zip(self.out_fields, self.parts):
            cols.append(_to_arrow_column(results[part.output_column], f.type))
        return pa.table(cols, schema=out_schema)


def _arrow_schema(ds) -> pa.Schema:
    """Arrow schema of a Dataset whose last stage may be a pandas block.
    Prefers a statically attached schema (scan_source / features_for_queries
    set one) — probing a lazy actor/shuffle pipeline costs a real execution."""
    static = getattr(ds, "_raywin_schema", None)
    if isinstance(static, pa.Schema):
        return static
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for n, t in zip(sch.names, sch.types):
        if isinstance(t, pa.DataType):
            fields.append(pa.field(n, t))
        else:
            try:
                fields.append(pa.field(n, pa.from_numpy_dtype(t)))
            except (pa.ArrowNotImplementedError, TypeError):
                fields.append(pa.field(n, pa.string()))  # pandas object column
    return pa.schema(fields)


def events_dataset(group_by: GroupBy):
    """Scan + union all sources of a GroupBy (reference GroupBy.from,
    GroupBy.scala:459-565)."""
    return union_sources([scan_source(s) for s in group_by.sources])


def features_for_queries(
    group_by: GroupBy,
    left_ds,
    num_buckets: int = 64,
    resolution=None,
    head_rounding: int | None = None,
    right_ds=None,
    dedupe_queries: bool = False,
    hot_config=None,
):
    """Point-in-time features for every left (keys..., ts) row.

    left_ds columns: group_by.key_columns + ts (+ any passthrough columns —
    they ride through the kernel untouched).  Returns one output row per left
    row with one column per aggregation part.  With dedupe_queries, duplicate
    (keys, ts) left rows are deduplicated inside the co-partition shuffle
    (left must then carry only keys+ts).
    """
    if not group_by.aggregations:
        raise ValueError(
            f"GroupBy '{group_by.name}' has no aggregations: the keyed "
            "passthrough form is only valid over entity snapshots "
            "(snapshot_entity_features; reference GroupBy.scala:137-141), "
            "not the point-in-time query path"
        )
    if resolution is None:
        resolution = (
            FiveMinuteResolution if group_by.inferred_accuracy is Accuracy.TEMPORAL else DailyResolution
        )
    if head_rounding is None:
        # SNAPSHOT accuracy = features "as of last midnight before the query"
        # (reference Extensions.scala snapshot semantics): round the window
        # head down to the day; TEMPORAL keeps the exact-millisecond head.
        head_rounding = 1 if group_by.inferred_accuracy is Accuracy.TEMPORAL else MILLIS_DAY
    if right_ds is None:
        right_ds = events_dataset(group_by)
    parts = group_by.agg_parts()

    # project the right side to exactly what the kernel reads BEFORE the
    # shuffle — nothing else should ride the exchange
    needed = list(
        dict.fromkeys(
            group_by.key_columns
            + ["ts"]
            + [p.input_column for p in parts]
            + [p.bucket for p in parts if p.bucket]
            + ([group_by.tie_breaker] if group_by.tie_breaker else [])
        )
    )
    r_schema0 = _arrow_schema(right_ds)
    r_names = set(r_schema0.names)
    if set(needed) != r_names:
        keep = [c for c in needed if c in r_names]
        right_ds = right_ds.select_columns(keep)
        r_arrow = pa.schema([r_schema0.field(c) for c in keep])
    else:
        r_arrow = r_schema0
    l_arrow = _arrow_schema(left_ds)
    input_types = {
        p.input_column: r_arrow.field(p.input_column).type for p in parts
    }

    tag_types = {SIDE_COL: pa.int8()}
    use_hot = bool(hot_config) and len(group_by.key_columns) == 1
    if use_hot:
        from ..stages.shuffle import CHUNK_COL, HotChunkReplicate, HotChunkTag

        tag_types[CHUNK_COL] = pa.int64()
        bounded = [p.window.millis for p in parts if not p.window.unbounded]
        has_unbounded = any(p.window.unbounded for p in parts)
        hops = [resolution.tail_hop(p.window) for p in parts if not p.window.unbounded]
        lookback = (max(bounded) + max(hops)) if bounded else 0
        key_col = group_by.key_columns[0]
        left_ds = left_ds.map_batches(
            HotChunkTag(key_col, hot_config.keys, hot_config.chunk_ms, hot_config.max_chunk),
            batch_format="pyarrow",
        )
        right_ds = right_ds.map_batches(
            HotChunkReplicate(
                key_col, hot_config.keys, hot_config.chunk_ms, lookback,
                hot_config.max_chunk, has_unbounded,
            ),
            batch_format="pyarrow",
        )
    unified = unify_schemas(l_arrow, r_arrow, tag_types)

    def tag(side_val):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.append_column(
                SIDE_COL, pa.array(np.full(len(batch), side_val, dtype=np.int8))
            )
            return pad_to_schema(batch, unified)

        return fn

    left_tagged = left_ds.map_batches(tag(0), batch_format="pyarrow")
    right_tagged = right_ds.map_batches(tag(1), batch_format="pyarrow")
    unioned = left_tagged.union(right_tagged)
    # bundle the sub-sized blocks fine-grained upstream stages produce before
    # the all-to-all: the sort's map phase pays a fixed per-block cost, and
    # 1-2k-row blocks made it 8x slower than 32k-row blocks on this exchange.
    # Rows here are narrow (keys + ts + numeric inputs; payloads never ride
    # the kernel shuffle), so 32k rows is a few MB — raise for production
    # block sizes via RAYWIN_SHUFFLE_BUNDLE_ROWS.
    bucketed = unioned.map_batches(
        AddBucket(group_by.key_columns, num_buckets),
        batch_format="pyarrow",
        batch_size=SHUFFLE_BUNDLE_ROWS,
    )
    kernel = PartitionKernel(
        group_by.key_columns,
        parts,
        l_arrow,
        input_types,
        resolution,
        head_rounding,
        group_by.tie_breaker,
        dedupe_queries,
        union_schema=unified.append(pa.field(BUCKET_COL, pa.int32())),
    )
    # batch_format=None: take blocks as-is; the kernel handles the sort
    # shuffle's occasional pandas-block fallback itself (map/list inputs do
    # not survive generic pandas->arrow inference)
    out = bucketed.groupby(BUCKET_COL).map_groups(kernel, batch_format=None)
    out_cols = list(l_arrow.names) + [p.output_column for p in parts]
    out = out.select_columns(out_cols)
    if group_by.derivations:
        out = apply_derivations(out, group_by.derivations, out_cols)
    else:
        # static output schema, so callers never have to execute the lazy
        # kernel pipeline just to learn it (an all-to-all sort can't stop
        # at one block); not defined under derivations (DuckDB-typed output)
        out._raywin_schema = pa.schema(list(l_arrow) + kernel.out_fields)
    return out


def snapshot_backfill(group_by: GroupBy, ds_dates: list[str], num_buckets: int = 64):
    """Daily-partitioned snapshot backfill: features as of each date's end
    (reference snapshotEvents, GroupBy.scala:144-169; window membership
    ts < ds_epoch + 1d, GroupByTest.scala:124-137).

    Returns one row per (key, ds) for every distinct key in the sources.
    """
    right_ds = events_dataset(group_by)
    keys = right_ds.groupby(group_by.key_columns).count().drop_columns(["count()"])

    ds_ends = {d: (pd.Timestamp(d).value // 1_000_000) + MILLIS_DAY for d in ds_dates}

    def explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        tables = []
        for d, end in ds_ends.items():
            t = batch.append_column("ts", pa.array(np.full(n, end, dtype=np.int64)))
            t = t.append_column("ds", pa.array([d] * n, type=pa.string()))
            tables.append(t)
        return pa.concat_tables(tables)

    left = keys.map_batches(explode, batch_format="pyarrow")
    return features_for_queries(
        # queries are synthesized at exact midnights, so SNAPSHOT head
        # rounding (ts < round_down(q, DAY) = q) matches strict ts < q
        group_by, left, num_buckets, resolution=DailyResolution
    )
