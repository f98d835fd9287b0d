"""Entity-source pipelines: PITC aggregation over MUTABLE data.

Reference semantics (spark/.../GroupBy.scala:100-142 snapshotEntities,
:171-274 temporalEntities; CDC row convention api/py/ai/chronon/query.py:66-72):

  * snapshot_table: one row per (key, ds) — the entity state as of that day's
    midnight snapshot.
  * mutation_table: CDC rows (keys, values, ts, mutation_ts, is_before); an
    update is TWO rows (old value is_before=true, new value is_before=false);
    insert = false-only, delete = true-only.
  * SNAPSHOT accuracy: features as of each ds = aggregate that day's snapshot.
  * TEMPORAL accuracy: feature at query ts = aggregate of the entity state at
    that exact millisecond = snapshot of the previous midnight + the day's
    mutations with mutation_ts < ts applied (update for is_before=false,
    delete/reversal for is_before=true) — the lambdaAggregateIrMany topology
    (SawtoothMutationAggregator.scala:185-222) collapsed into signed prefix
    sums.

Temporal-entities support covers the DELETABLE (abelian-group) operations —
SUM / COUNT / AVERAGE — the set whose IRs admit CDC reversal
(api.thrift:156-167); windowed variants are future work.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..api import MILLIS_DAY, Aggregation, EntitySource, GroupBy, Operation
from ..stages.shuffle import BUCKET_COL, SIDE_COL, AddBucket, pad_to_schema, unify_schemas
from .group_by import _arrow_schema

_DELETABLE = {Operation.SUM, Operation.COUNT, Operation.AVERAGE}


def snapshot_entity_features(group_by: GroupBy, num_buckets: int = 32):
    """SNAPSHOT accuracy over an EntitySource: one feature row per (keys, ds)
    aggregating that day's snapshot rows (GroupBy.scala:100-142)."""
    import ray.data

    src = group_by.sources[0]
    assert isinstance(src, EntitySource)
    ds_ = ray.data.read_parquet(src.snapshot_table)
    parts = group_by.agg_parts()
    key_cols = group_by.key_columns

    def agg_fn(g: pd.DataFrame) -> pd.DataFrame:
        groups = g.groupby(key_cols + ["ds"], sort=False)
        frames = {}
        for part in parts:
            op = part.operation
            col = groups[part.input_column]
            if op is Operation.SUM:
                frames[part.output_column] = col.sum()
            elif op is Operation.COUNT:
                frames[part.output_column] = col.count()
            elif op is Operation.AVERAGE:
                frames[part.output_column] = col.mean()
            elif op is Operation.MIN:
                frames[part.output_column] = col.min()
            elif op is Operation.MAX:
                frames[part.output_column] = col.max()
            else:
                raise NotImplementedError(f"snapshot entities: {op}")
        return pd.DataFrame(frames).reset_index()

    bucketed = ds_.map_batches(AddBucket(key_cols, num_buckets), batch_format="pyarrow")
    return bucketed.groupby(BUCKET_COL).map_groups(agg_fn, batch_format="pandas")


class EntityKernel:
    """Per-bucket temporal-entities merge: snapshot base + signed mutation
    prefix at each query timestamp."""

    def __init__(self, key_cols, parts, left_names):
        self.__name__ = "EntityKernel"
        self.key_cols = key_cols
        self.parts = parts
        self.left_names = left_names

    def __call__(self, group: pa.Table) -> pa.Table:
        side = group[SIDE_COL].to_numpy(zero_copy_only=False)
        queries = group.filter(pa.array(side == 0)).select(self.left_names).to_pandas()
        snaps = group.filter(pa.array(side == 1)).to_pandas()
        muts = group.filter(pa.array(side == 2)).to_pandas()
        if len(queries) == 0:
            cols = {c: [] for c in self.left_names}
            for part in self.parts:
                cols[part.output_column] = []
            return pd.DataFrame(cols)
        key = self.key_cols[0] if len(self.key_cols) == 1 else None

        def key_series(df):
            if key is not None:
                return df[key].astype(str)
            s = df[self.key_cols[0]].astype(str)
            for c in self.key_cols[1:]:
                s = s + "\x00" + df[c].astype(str)
            return s

        q_day = (queries["ts"] // MILLIS_DAY) * MILLIS_DAY
        out = queries.copy()
        # snapshot base: aggregate per (key, ds); queries use the snapshot of
        # the day BEFORE their own day (state as of last midnight)
        snaps = snaps.assign(__k=key_series(snaps))
        snap_day_end = (
            pd.to_datetime(snaps["ds"]).astype("int64") // 1_000_000 + MILLIS_DAY
        )
        snaps = snaps.assign(__day=snap_day_end)
        muts = muts.assign(__k=key_series(muts))
        muts = muts.sort_values(["__k", "mutation_ts"], kind="mergesort")
        sign = np.where(muts["is_before"].to_numpy(), -1.0, 1.0) if len(muts) else np.zeros(0)
        q_k = key_series(queries)
        for part in self.parts:
            if part.operation not in _DELETABLE:
                raise NotImplementedError(
                    f"temporal entities requires deletable ops, got {part.operation}"
                )
            vcol = part.input_column
            base = snaps.groupby(["__k", "__day"])[vcol].agg(["sum", "count"])
            base_sum = base["sum"].to_dict()
            base_cnt = base["count"].to_dict()
            msum = np.zeros(len(queries))
            mcnt = np.zeros(len(queries))
            if len(muts):
                mk = muts["__k"].to_numpy()
                mts = muts["mutation_ts"].to_numpy().astype(np.int64)
                mval = muts[vcol].to_numpy().astype(np.float64)
                valid = ~np.isnan(mval)
                cs_sum = np.concatenate([[0.0], np.cumsum(np.where(valid, mval * sign, 0))])
                cs_cnt = np.concatenate([[0.0], np.cumsum(np.where(valid, sign, 0))])
                # per-key segment bounds via composite searchsorted
                codes, uniq = pd.factorize(mk)
                qcodes = pd.Categorical(q_k, categories=uniq).codes
                tmin = mts.min()
                span = mts.max() - tmin + 2
                mkey = codes.astype(np.int64) * span + (mts - tmin)
                lo_b = np.where(
                    qcodes >= 0,
                    qcodes.astype(np.int64) * span
                    + np.clip(q_day.to_numpy() - tmin, 0, span - 1),
                    -1,
                )
                hi_b = np.where(
                    qcodes >= 0,
                    qcodes.astype(np.int64) * span
                    + np.clip(queries["ts"].to_numpy() - tmin, 0, span - 1),
                    -1,
                )
                l = np.searchsorted(mkey, lo_b, side="left")
                r = np.searchsorted(mkey, hi_b, side="left")
                ok = qcodes >= 0
                msum[ok] = cs_sum[r[ok]] - cs_sum[l[ok]]
                mcnt[ok] = cs_cnt[r[ok]] - cs_cnt[l[ok]]
            keys_days = list(zip(q_k, q_day))
            bsum = np.array([base_sum.get(kd, 0.0) for kd in keys_days])
            bcnt = np.array([base_cnt.get(kd, 0) for kd in keys_days], dtype=np.float64)
            tot_sum = bsum + msum
            tot_cnt = bcnt + mcnt
            empty = tot_cnt <= 0
            if part.operation is Operation.SUM:
                out[part.output_column] = np.where(empty, np.nan, tot_sum)
            elif part.operation is Operation.COUNT:
                out[part.output_column] = np.where(empty, np.nan, tot_cnt)
            else:
                with np.errstate(invalid="ignore", divide="ignore"):
                    out[part.output_column] = np.where(empty, np.nan, tot_sum / tot_cnt)
        return out.drop(columns=[BUCKET_COL], errors="ignore")


def temporal_entity_features(group_by: GroupBy, left_ds, num_buckets: int = 32):
    """TEMPORAL accuracy over an EntitySource with CDC mutations: features as
    of the exact query millisecond, zero leakage of same-timestamp mutations
    (strict mutation_ts < query ts)."""
    import ray.data

    src = group_by.sources[0]
    assert isinstance(src, EntitySource) and src.mutation_table
    snaps = ray.data.read_parquet(src.snapshot_table)
    muts = ray.data.read_parquet(src.mutation_table)
    key_cols = group_by.key_columns
    parts = group_by.agg_parts()

    l_arrow = _arrow_schema(left_ds)
    s_arrow = _arrow_schema(snaps)
    m_arrow = _arrow_schema(muts)
    unified = unify_schemas(unify_schemas(l_arrow, s_arrow, {}), m_arrow, {SIDE_COL: pa.int8()})

    def tag(side_val):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.append_column(
                SIDE_COL, pa.array(np.full(len(batch), side_val, dtype=np.int8))
            )
            return pad_to_schema(batch, unified)

        return fn

    unioned = (
        left_ds.map_batches(tag(0), batch_format="pyarrow")
        .union(snaps.map_batches(tag(1), batch_format="pyarrow"))
        .union(muts.map_batches(tag(2), batch_format="pyarrow"))
    )
    bucketed = unioned.map_batches(AddBucket(key_cols, num_buckets), batch_format="pyarrow")
    kernel = EntityKernel(key_cols, parts, list(l_arrow.names))
    return bucketed.groupby(BUCKET_COL).map_groups(kernel, batch_format="pyarrow")
