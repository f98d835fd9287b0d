"""Relational helpers on Ray Datasets: scalable grouped aggregation with
map-side partial aggregation, equi-joins, top-k.

The partial+merge pattern mirrors the reference's
``aggregateByKey(seqOp, combOp)`` everywhere (spark/.../GroupBy.scala:129-134):
aggregate inside each batch first (DuckDB over Arrow, zero-copy), shuffle only
the tiny per-batch partials, merge with ``groupby().aggregate``, then apply a
finalize projection.  This keeps the all-to-all exchange proportional to
(#groups x #batches), not #rows.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data.aggregate import Max, Min, Sum

from ..stages.query import SqlBatch

_MERGE_FNS = {"sum": Sum, "min": Min, "max": Max}


def sql_group_agg(
    ds,
    keys: list[str],
    partials: dict[str, str],
    merge: dict[str, str],
    finals: dict[str, str] | None = None,
    where: str | None = None,
):
    """Grouped aggregation with map-side combine.

    partials: {col: sql_expr} aggregate exprs evaluated per batch (GROUP BY keys)
    merge:    {col: 'sum'|'min'|'max'} how partials combine across batches
    finals:   {out_col: sql_expr over keys+merged cols}; None = passthrough
    """
    where_sql = f" WHERE {where}" if where else ""
    partial_sql = (
        f"SELECT {', '.join(keys)}, "
        + ", ".join(f"({e}) AS {c}" for c, e in partials.items())
        + f" FROM batch{where_sql} GROUP BY {', '.join(keys)}"
    )
    partial = ds.map_batches(SqlBatch(partial_sql), batch_format="pyarrow")
    aggs = [_MERGE_FNS[m](c, alias_name=c) for c, m in merge.items()]
    merged = partial.groupby(keys).aggregate(*aggs)
    if finals is None:
        return merged
    final_sql = (
        f"SELECT {', '.join(keys)}, "
        + ", ".join(f"({e}) AS {c}" for c, e in finals.items())
        + " FROM batch"
    )
    return merged.map_batches(SqlBatch(final_sql), batch_format="pyarrow")


def distinct(ds, cols: list[str], num_buckets: int = 64):
    """DISTINCT rows over `cols`: ONE hash-bucket shuffle, then a vectorized
    per-partition drop_duplicates (never one Python call per group — the
    reference's uniqSort analogue, GroupBy.scala:311)."""
    from ..stages.shuffle import BUCKET_COL, AddBucket

    bucketed = ds.map_batches(AddBucket(cols, num_buckets), batch_format="pyarrow")

    def dd(df):
        return df.drop_duplicates(cols)

    out = bucketed.groupby(BUCKET_COL).map_groups(dd, batch_format="pandas")
    return out.drop_columns([BUCKET_COL])


def min_by_group(ds, group_cols: list[str], order_col: str, num_buckets: int = 64):
    """Keep the row with min(order_col) per group — vectorized per partition."""
    from ..stages.shuffle import BUCKET_COL, AddBucket

    bucketed = ds.map_batches(AddBucket(group_cols, num_buckets), batch_format="pyarrow")

    def pick(df):
        idx = df.groupby(group_cols, sort=False)[order_col].idxmin()
        return df.loc[idx]

    out = bucketed.groupby(BUCKET_COL).map_groups(pick, batch_format="pandas")
    return out.drop_columns([BUCKET_COL])


_ARROW_HOW = {"left": "left outer", "right": "right outer", "outer": "full outer"}


class _BucketJoinKernel:
    """map_groups fn: split a co-partitioned bucket by side tag and merge."""

    def __init__(self, on, how, left_names, right_names):
        self.__name__ = "BucketJoin"
        self.on = list(on)
        self.how = how
        self.left_names = left_names
        self.right_names = right_names

    def __call__(self, group):
        import pyarrow as pa_

        side = group["__side"].to_numpy(zero_copy_only=False)
        lt = group.filter(pa_.array(side == 0)).select(self.left_names)
        rt = group.filter(pa_.array(side == 1)).select(self.right_names)
        # Arrow-native hash join: string keys never box (the pandas merge
        # round-trip boxed every key per group).  Single-threaded inside the
        # task — the actor/task already owns exactly one CPU slot.
        return lt.join(
            rt, keys=self.on, join_type=_ARROW_HOW.get(self.how, self.how),
            use_threads=False,
        )


def bucketed_left_join(left_ds, right_ds, on: list[str], num_buckets: int = 64, how: str = "left"):
    """Partitioned hash join: pad both sides to one schema, tag, union, ONE
    hash(on) co-partitioning shuffle, then a vectorized pandas merge per
    partition.  Cheaper than spawning per-join aggregator actor pools when
    the join is one stage of a larger pipeline."""
    import numpy as np_
    import pyarrow as pa_

    from ..pipelines.group_by import _arrow_schema
    from ..stages.shuffle import BUCKET_COL, SIDE_COL, AddBucket, pad_to_schema, unify_schemas

    l_schema = _arrow_schema(left_ds)
    r_schema = _arrow_schema(right_ds)
    unified = unify_schemas(l_schema, r_schema, {SIDE_COL: pa_.int8()})

    def tag(side_val):
        def fn(batch: pa_.Table) -> pa_.Table:
            batch = batch.append_column(
                SIDE_COL, pa_.array(np_.full(len(batch), side_val, dtype=np_.int8))
            )
            return pad_to_schema(batch, unified)

        return fn

    unioned = left_ds.map_batches(tag(0), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1), batch_format="pyarrow")
    )
    bucketed = unioned.map_batches(AddBucket(list(on), num_buckets), batch_format="pyarrow")
    kernel = _BucketJoinKernel(on, how, list(l_schema.names), list(r_schema.names))
    return bucketed.groupby(BUCKET_COL).map_groups(kernel, batch_format="pyarrow")


class _MultiBucketJoinKernel:
    """map_groups fn: split a co-partitioned bucket by side tag and merge the
    left side with EVERY right side sequentially (all sides share the join
    key, so one exchange co-locates them all)."""

    def __init__(self, on, left_names, right_names_list):
        self.__name__ = "MultiBucketJoin"
        self.on = list(on)
        self.left_names = left_names
        self.right_names_list = right_names_list

    def __call__(self, group):
        import pyarrow as pa_

        side = group["__side"].to_numpy(zero_copy_only=False)
        out = group.filter(pa_.array(side == 0)).select(self.left_names)
        for i, rn in enumerate(self.right_names_list):
            rt = group.filter(pa_.array(side == i + 1)).select(rn)
            out = out.join(
                rt, keys=self.on, join_type="left outer", use_threads=False
            )
        return out


def bucketed_multi_left_join(left_ds, rights, on: list[str], num_buckets: int = 64):
    """left ⟕ SEVERAL right tables that all join on the same key, in ONE
    hash(on) co-partitioning shuffle (instead of one shuffle per right).
    ``rights`` is a list of Datasets; their non-key column names must be
    disjoint from the left's and each other's (prefix them first)."""
    import numpy as np_
    import pyarrow as pa_

    from ..pipelines.group_by import _arrow_schema
    from ..stages.shuffle import (
        BUCKET_COL, SIDE_COL, AddBucket, pad_to_schema, unify_schemas,
    )

    l_schema = _arrow_schema(left_ds)
    r_schemas = [_arrow_schema(r) for r in rights]
    unified = l_schema
    for rs in r_schemas:
        unified = unify_schemas(unified, rs, {})
    unified = unify_schemas(unified, pa_.schema([]), {SIDE_COL: pa_.int8()})

    def tag(side_val):
        def fn(batch: pa_.Table) -> pa_.Table:
            batch = batch.append_column(
                SIDE_COL, pa_.array(np_.full(len(batch), side_val, dtype=np_.int8))
            )
            return pad_to_schema(batch, unified)

        return fn

    unioned = left_ds.map_batches(tag(0), batch_format="pyarrow")
    for i, r in enumerate(rights):
        unioned = unioned.union(r.map_batches(tag(i + 1), batch_format="pyarrow"))
    bucketed = unioned.map_batches(AddBucket(list(on), num_buckets), batch_format="pyarrow")
    kernel = _MultiBucketJoinKernel(
        on, list(l_schema.names), [list(rs.names) for rs in r_schemas]
    )
    return bucketed.groupby(BUCKET_COL).map_groups(kernel, batch_format="pyarrow")


class _RangeJoinKernel:
    """map_groups fn: Arrow equi-join on key+chunk, then a vectorized
    range filter start <= ts < end."""

    def __init__(self, on, left_names, right_names, left_ts, right_start, right_end):
        self.__name__ = "RangeJoin"
        self.on = list(on)
        self.left_names = left_names
        self.right_names = right_names
        self.left_ts = left_ts
        self.right_start = right_start
        self.right_end = right_end

    def __call__(self, group):
        import pyarrow as pa_
        import pyarrow.compute as pc_

        from ..stages.shuffle import CHUNK_COL

        side = group["__side"].to_numpy(zero_copy_only=False)
        lt = group.filter(pa_.array(side == 0)).select(self.left_names + [CHUNK_COL])
        rt = group.filter(pa_.array(side == 1)).select(self.right_names + [CHUNK_COL])
        j = lt.join(
            rt, keys=self.on + [CHUNK_COL], join_type="inner", use_threads=False
        )
        mask = pc_.and_(
            pc_.greater_equal(j[self.left_ts], j[self.right_start]),
            pc_.less(j[self.left_ts], j[self.right_end]),
        )
        return j.filter(mask).drop_columns([CHUNK_COL])


def bucketed_range_join(
    left_ds,
    right_ds,
    on: list[str],
    left_ts: str,
    right_start: str,
    right_end: str,
    chunk_ms: int,
    num_buckets: int = 64,
):
    """Keyed interval (range) join: left point rows x right interval rows,
    matching on equi-keys AND ``start <= ts < end`` (end exclusive).

    Scale design — ONE hash(key, time-chunk) co-partitioning exchange:
    each left row lands in exactly ONE chunk (``ts // chunk_ms``); each
    right interval is REPLICATED into every chunk it overlaps
    (``ceil(len/chunk_ms)+1`` copies — bounded when ``chunk_ms`` is sized
    to the typical interval length, ~2x at chunk_ms = max interval).
    Because a left row exists in one chunk only, every match is found
    group-locally and found exactly once — no post-dedup pass.  Per group:
    an Arrow hash join on key+chunk (string keys never box), then a
    vectorized range filter.  No global sort, no driver state; skewed keys
    spread across chunks the same way the hot-key chunking path does.

    Precondition: timestamps/interval bounds are non-negative int64 (epoch
    ms) — AddBucket mixes the chunk into the shuffle hash only for
    chunk >= 0.  Non-key column names of the two sides must be disjoint.

    Reference analogue: Chronon expresses interval enrichment as a
    range-filtered scan + join inside Spark
    (spark/src/main/scala/ai/chronon/spark/GroupBy.scala window scan
    ranges); here it is a first-class co-partitioned Ray Data operator.
    """
    import numpy as np_
    import pyarrow as pa_

    from ..pipelines.group_by import _arrow_schema
    from ..stages.shuffle import (
        BUCKET_COL, CHUNK_COL, SIDE_COL, AddBucket, pad_to_schema, unify_schemas,
    )

    l_schema = _arrow_schema(left_ds)
    r_schema = _arrow_schema(right_ds)
    chunk_field = {CHUNK_COL: pa_.int64()}
    unified = unify_schemas(l_schema, r_schema, {**chunk_field, SIDE_COL: pa_.int8()})

    def chunk_left(batch: pa_.Table) -> pa_.Table:
        ts = batch[left_ts].to_numpy(zero_copy_only=False).astype(np_.int64)
        batch = batch.append_column(
            CHUNK_COL, pa_.array(ts // chunk_ms, type=pa_.int64())
        )
        batch = batch.append_column(
            SIDE_COL, pa_.array(np_.zeros(len(batch), dtype=np_.int8))
        )
        return pad_to_schema(batch, unified)

    def replicate_right(batch: pa_.Table) -> pa_.Table:
        s = batch[right_start].to_numpy(zero_copy_only=False).astype(np_.int64)
        e = batch[right_end].to_numpy(zero_copy_only=False).astype(np_.int64)
        c0 = s // chunk_ms
        # end is exclusive; degenerate (empty) intervals still get one copy
        # and are dropped by the range filter
        c1 = np_.maximum((e - 1) // chunk_ms, c0)
        reps = c1 - c0 + 1
        idx = np_.repeat(np_.arange(len(batch), dtype=np_.int64), reps)
        base = np_.cumsum(reps) - reps
        offs = np_.arange(int(reps.sum()), dtype=np_.int64) - np_.repeat(base, reps)
        chunks = c0[idx] + offs
        out = batch.take(idx)
        out = out.append_column(CHUNK_COL, pa_.array(chunks, type=pa_.int64()))
        out = out.append_column(
            SIDE_COL, pa_.array(np_.ones(len(out), dtype=np_.int8))
        )
        return pad_to_schema(out, unified)

    unioned = left_ds.map_batches(chunk_left, batch_format="pyarrow").union(
        right_ds.map_batches(replicate_right, batch_format="pyarrow")
    )
    bucketed = unioned.map_batches(AddBucket(list(on), num_buckets), batch_format="pyarrow")
    kernel = _RangeJoinKernel(
        on, list(l_schema.names), list(r_schema.names), left_ts, right_start, right_end
    )
    return bucketed.groupby(BUCKET_COL).map_groups(kernel, batch_format="pyarrow")


def broadcast_lookup_join(ds, small_df, on: list[str], how: str = "inner"):
    """Join a Dataset against a SMALL pandas table without a shuffle: the
    small side is put in the object store once (ray.put) and merged per batch
    (the reference's small-mode key-injection analogue, JoinUtils.scala:296-359)."""
    import ray

    ref = ray.put(small_df)

    class Merge:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, batch):
            return batch.merge(self.small, on=on, how=how)

    return ds.map_batches(Merge, batch_format="pandas", concurrency=(1, 8))


def top_k(ds, sort_col: str, k: int, descending: bool = True):
    """Global top-k: per-batch prune to k, then a tiny sort+limit."""
    def prune(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = "descending" if descending else "ascending"
        idx = pc.select_k_unstable(batch, k, [(sort_col, order)])
        return batch.take(idx)

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    return pruned.sort(sort_col, descending=descending).limit(k)
