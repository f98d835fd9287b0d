"""Table comparison metrics — the offline half of online/offline consistency.

Re-expresses the reference's CompareMetrics (spark/.../stats/CompareMetrics.
scala:35-218) and EditDistance (stats/EditDistance.scala:16-112) on Ray Data:

- two tables joined on row ids (or keys + ts) into ``{field}_left`` /
  ``{field}_right`` column pairs,
- per-row metric columns computed vectorized in ``map_batches``,
- per-time-bucket aggregation (hourly by default) via ``groupby(bucket)
  .map_groups`` — parallelism is by bucket, numpy inside each group.

Metric families per value field (CompareMetrics.scala:52-130):

==========  =====================================================
universal   both_null / left_null / right_null (SUM), total (COUNT)
non-map     mismatch (SUM of ``l is not null and r is not null and l != r``)
numeric     smape (AVERAGE, 0.0 when either side null or |l|+|r| == 0),
            left_minus_right percentiles (p0 / p50 / p100 here — the
            reference uses a 41-bin APPROX_PERCENTILE sketch; exact
            quantiles per hourly bucket are the dev profile, the binned
            kernel op is the 100-TB path)
list/str    edit_distance insert+delete sums (LCS-based: replacement
            disallowed, inserts/deletes into RIGHT to make it match LEFT,
            EditDistance.scala:46-52)
==========  =====================================================

Scale note: consistency runs over SAMPLED serving logs (the reference gates
on metaData.consistencySamplePercent, ConsistencyJob.scala:57-62), so one
hourly bucket fits a worker; buckets fan out across the cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

LEFT_SUFFIX = "_left"
RIGHT_SUFFIX = "_right"
HOUR_MS = 3600 * 1000


def edit_distance(left, right) -> tuple[int, int]:
    """(insert, delete) counts into RIGHT to make it equal LEFT.

    Replacement is not allowed, so the distance decomposes over the longest
    common subsequence: insert = len(left) - lcs, delete = len(right) - lcs
    (equivalent to the reference's two-row DP, EditDistance.scala:53-110).
    Works on lists and strings; None counts as empty."""
    l = [] if left is None else list(left)
    r = [] if right is None else list(right)
    if not l or not r:
        return (len(l), len(r))
    # classic LCS DP, one row at a time
    prev = np.zeros(len(l) + 1, dtype=np.int32)
    cur = np.zeros(len(l) + 1, dtype=np.int32)
    for i in range(1, len(r) + 1):
        ri = r[i - 1]
        for j in range(1, len(l) + 1):
            if ri == l[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = max(prev[j], cur[j - 1])
        prev, cur = cur, prev
    lcs = int(prev[len(l)])
    return (len(l) - lcs, len(r) - lcs)


def _is_numeric(t: pa.DataType) -> bool:
    return pa.types.is_integer(t) or pa.types.is_floating(t)


def _is_sequence(t: pa.DataType) -> bool:
    return pa.types.is_list(t) or pa.types.is_large_list(t)


class RowMetrics:
    """map_batches stage: per-row metric columns for every value field.

    Output: __bucket (time bucket start, ms) + one column per (field,
    metric).  Null-count / mismatch columns are int8 indicator columns the
    bucket aggregation sums; smape / diff are float columns it averages /
    quantiles."""

    def __init__(self, value_fields: list[tuple[str, pa.DataType]],
                 time_column: str = "ts", bucket_minutes: int = 60):
        self.fields = value_fields
        self.time_column = time_column
        self.bucket_ms = bucket_minutes * 60 * 1000

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts = batch[self.time_column].to_numpy(zero_copy_only=False).astype(np.int64)
        out: dict[str, pa.Array] = {
            "__bucket": pa.array(ts // self.bucket_ms * self.bucket_ms, pa.int64())
        }
        for name, typ in self.fields:
            lcol = batch[name + LEFT_SUFFIX]
            rcol = batch[name + RIGHT_SUFFIX]
            lnull = pa.compute.is_null(lcol).to_numpy(zero_copy_only=False)
            rnull = pa.compute.is_null(rcol).to_numpy(zero_copy_only=False)
            out[f"{name}_both_null"] = pa.array((lnull & rnull).astype(np.int64))
            out[f"{name}_left_null"] = pa.array((lnull & ~rnull).astype(np.int64))
            out[f"{name}_right_null"] = pa.array((~lnull & rnull).astype(np.int64))
            if _is_numeric(typ):
                l = lcol.to_numpy(zero_copy_only=False).astype(np.float64)
                r = rcol.to_numpy(zero_copy_only=False).astype(np.float64)
                both = ~lnull & ~rnull
                denom = np.abs(l) + np.abs(r)
                smape = np.zeros(len(batch))
                ok = both & (denom != 0)
                smape[ok] = 2.0 * np.abs(l[ok] - r[ok]) / denom[ok]
                out[f"{name}_smape"] = pa.array(smape)
                diff = np.where(both, l - r, np.nan)
                out[f"{name}_left_minus_right"] = pa.array(diff)
                out[f"{name}_mismatch"] = pa.array(
                    (both & (l != r)).astype(np.int64)
                )
            elif _is_sequence(typ):
                lv = lcol.to_pylist()
                rv = rcol.to_pylist()
                ins = np.zeros(len(batch), dtype=np.int64)
                dele = np.zeros(len(batch), dtype=np.int64)
                mism = np.zeros(len(batch), dtype=np.int64)
                for i, (a, b) in enumerate(zip(lv, rv)):
                    if a is None or b is None:
                        continue
                    i_, d_ = edit_distance(a, b)
                    ins[i], dele[i] = i_, d_
                    mism[i] = int(list(a) != list(b))
                out[f"{name}_edit_insert"] = pa.array(ins)
                out[f"{name}_edit_delete"] = pa.array(dele)
                out[f"{name}_mismatch"] = pa.array(mism)
            elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
                import pyarrow.compute as pc

                both = ~lnull & ~rnull
                neq = pc.not_equal(
                    pc.fill_null(lcol, ""), pc.fill_null(rcol, "")
                ).to_numpy(zero_copy_only=False)
                out[f"{name}_mismatch"] = pa.array(
                    (both & neq).astype(np.int64)
                )
            else:  # map and other exotic types: stringified equality only
                lv = lcol.to_pylist()
                rv = rcol.to_pylist()
                mism = np.array(
                    [
                        0 if (a is None or b is None) else int(str(a) != str(b))
                        for a, b in zip(lv, rv)
                    ],
                    dtype=np.int64,
                )
                out[f"{name}_mismatch"] = pa.array(mism)
        return pa.Table.from_pydict(out)


class BucketFinalize:
    """map_groups per time bucket: sums / averages / exact quantiles."""

    def __init__(self, value_fields: list[tuple[str, pa.DataType]]):
        self.fields = value_fields

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        row: dict[str, object] = {"ts_bucket": int(g["__bucket"].iloc[0])}
        n = len(g)
        for name, typ in self.fields:
            for m in ("both_null", "left_null", "right_null"):
                row[f"{name}_{m}"] = int(g[f"{name}_{m}"].sum())
            row[f"{name}_total"] = n
            if f"{name}_mismatch" in g.columns:
                row[f"{name}_mismatch"] = int(g[f"{name}_mismatch"].sum())
            if _is_numeric(typ):
                row[f"{name}_smape"] = float(g[f"{name}_smape"].mean())
                d = g[f"{name}_left_minus_right"].to_numpy(dtype=np.float64)
                d = d[~np.isnan(d)]
                if len(d):
                    p0, p50, p100 = np.quantile(d, [0.0, 0.5, 1.0])
                else:
                    p0 = p50 = p100 = np.nan  # keeps the column float64
                row[f"{name}_left_minus_right_p0"] = p0
                row[f"{name}_left_minus_right_p50"] = p50
                row[f"{name}_left_minus_right_p100"] = p100
            elif _is_sequence(typ):
                row[f"{name}_edit_insert"] = int(g[f"{name}_edit_insert"].sum())
                row[f"{name}_edit_delete"] = int(g[f"{name}_edit_delete"].sum())
        return pd.DataFrame([row])


def compare_joined(joined_ds, value_fields: list[tuple[str, pa.DataType]],
                   time_column: str = "ts", bucket_minutes: int = 60):
    """Metrics over an already-joined table with _left/_right column pairs."""
    rows = joined_ds.map_batches(
        RowMetrics(value_fields, time_column, bucket_minutes),
        batch_format="pyarrow",
    )
    fin = BucketFinalize(value_fields)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        return fin(g)

    return rows.groupby("__bucket").map_groups(finalize, batch_format="pandas")


def compare_tables(left_ds, right_ds, keys: list[str],
                   value_fields: list[tuple[str, pa.DataType]],
                   time_column: str = "ts", bucket_minutes: int = 60,
                   num_buckets: int = 16):
    """CompareJob equivalent (stats/CompareJob.scala): join two tables on
    row keys, compute per-field consistency metrics per time bucket.

    The time column rides from the LEFT side.  Row keys must uniquely
    identify rows on each side (the reference asserts keys coverage,
    CompareBaseJob.scala:60-105)."""
    from ..functions.relational import bucketed_left_join

    lren = {c: c + LEFT_SUFFIX for c, _ in value_fields}
    rren = {c: c + RIGHT_SUFFIX for c, _ in value_fields}
    l = left_ds.rename_columns(lren)
    r = right_ds.rename_columns(rren)
    keep_r = keys + [c + RIGHT_SUFFIX for c, _ in value_fields]
    r = r.select_columns([c for c in keep_r if c != time_column])
    joined = bucketed_left_join(
        l, r, [k for k in keys if k != time_column], num_buckets=num_buckets
    )
    return compare_joined(joined, value_fields, time_column, bucket_minutes)
