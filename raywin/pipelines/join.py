"""Join backfill: left rows enriched with every JoinPart's point-in-time
features (reference JoinBase.scala:76-375 / Join.scala:292-432).

Ray-Data-first topology:

    left = scan join.left (Query layer), skew-key filter       [stateless]
    per JoinPart (independent Dataset DAGs, can run concurrently):
        queries  = DISTINCT (mapped keys, ts) of left          [shuffle: dedup]
        features = features_for_queries(group_by, queries)     [shuffle: bucket]
        prefixed = rename value cols {prefix}_{group_by}_{col} [stateless]
    assembly = iterative hash joins back on (keys..., ts)      [shuffle: join]

The per-part dedup mirrors the reference's ``uniqSort`` on query keys
(GroupBy.scala:311); assembly joins on (keys, ts) like joinWithLeft
(JoinBase.scala:76-136) so duplicate left rows each receive the same feature
row.  Derivations run as a final DuckDB-per-batch projection.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..api import GroupBy, Join, JoinPart
from ..sources.io import scan_source
from ..stages.query import apply_derivations
from .group_by import features_for_queries


def _skew_filter(ds, skew_keys: dict[str, list[str]] | None):
    """Exclude user-declared hot keys from both sides
    (reference api.thrift:339-343, Extensions.scala:978-1022)."""
    if not skew_keys:
        return ds

    def fn(batch: pa.Table) -> pa.Table:
        mask = np.ones(len(batch), dtype=bool)
        for col, bad in skew_keys.items():
            if col in batch.column_names:
                vals = batch[col].to_numpy(zero_copy_only=False)
                mask &= ~np.isin(vals, np.asarray(bad, dtype=object))
        return batch.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow")


SMALL_MODE_CUTOFF = 100_000  # distinct left keys; reference uses 5000 rows for
# literal IN-injection and 1M for bloom (TableUtils.scala:349-357) — here the
# broadcast is an exact key set filtered vectorized per batch


def part_features(
    part: JoinPart,
    left_ds,
    num_buckets: int = 64,
    prune_right: bool = True,
):
    """Feature table for one JoinPart keyed by the LEFT's column names + ts."""
    gb = part.group_by
    key_mapping = part.key_mapping or {}
    left_keys = [next((l for l, r in key_mapping.items() if r == k), k) for k in gb.key_columns]

    qcols = list(dict.fromkeys(left_keys + ["ts"]))
    queries = left_ds.select_columns(qcols)
    if key_mapping:
        queries = queries.rename_columns(
            {l: r for l, r in key_mapping.items() if l in left_keys}
        )
    right_ds = None
    if prune_right and len(gb.key_columns) == 1:
        # small mode: when the left key space is small, broadcast it and
        # semi-join-filter the right scan BEFORE the shuffle
        # (reference key-injection / bloom pruning, Join.scala:306-341)
        kcol = gb.key_columns[0]
        # gate on LEFT ROW COUNT first (a distributed count, like the
        # reference's Join.scala:306-341 row-count gate) — materializing the
        # distinct key list before deciding would pull billions of keys onto
        # the driver on a big left
        key_vals = []
        if queries.count() <= SMALL_MODE_CUTOFF:
            key_vals = queries.select_columns([kcol]).unique(kcol)
            if not isinstance(key_vals, list):  # older API returns Dataset
                key_vals = [r[kcol] for r in key_vals.take_all()]
        if key_vals:
            import numpy as np
            import pyarrow as pa
            import ray

            from .group_by import events_dataset

            key_arr_ref = ray.put(np.asarray(sorted(key_vals), dtype=object))

            class SemiFilter:
                def __init__(self):
                    self.keys = ray.get(key_arr_ref)

                def __call__(self, batch: pa.Table) -> pa.Table:
                    vals = batch[kcol].to_numpy(zero_copy_only=False)
                    return batch.filter(pa.array(np.isin(vals, self.keys)))

            right_ds = events_dataset(gb).map_batches(
                SemiFilter, batch_format="pyarrow", concurrency=(1, 8)
            )
    # DISTINCT (keys, ts) happens inside the kernel's co-partition shuffle
    # (uniqSort analogue, GroupBy.scala:311) — no separate exchange
    feats = features_for_queries(
        gb, queries, num_buckets=num_buckets, dedupe_queries=True, right_ds=right_ds
    )
    rename = {}
    for col in gb.output_columns():
        rename[col] = f"{part.full_prefix}{col}"
    if key_mapping:
        for l, r in key_mapping.items():
            rename[r] = l
    return feats.rename_columns(rename), left_keys


def backfill_join(join: Join, num_buckets: int = 64, materialize_intermediates: bool = True):
    """Full join backfill -> Dataset with left columns + all part features.

    The left table and each part's feature table are materialized by default:
    they fan out to several consumers (per-part query dedup + final assembly)
    and Ray Data re-executes shared DAG branches otherwise.  This mirrors the
    reference's materialized bootstrap/part tables (JoinBase.scala:199-222) —
    part tables ARE the checkpoint.  Disable for single-part joins on huge
    lefts where recompute beats pinning."""
    left = scan_source(join.left)
    left = _skew_filter(left, join.skew_keys)
    if materialize_intermediates:
        left = left.materialize()
    out = left
    left_cols = None
    from ..functions.relational import bucketed_left_join

    part_tables = [part_features(part, left, num_buckets) for part in join.join_parts]
    if materialize_intermediates and len(part_tables) > 1:
        # materialize part tables concurrently — they are independent DAGs
        # (the reference's per-JoinPart thread pool, Join.scala:292-296)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(4, len(part_tables))) as pool:
            mats = list(pool.map(lambda fk: fk[0].materialize(), part_tables))
        part_tables = [(m, fk[1]) for m, fk in zip(mats, part_tables)]
    elif materialize_intermediates:
        part_tables = [(f.materialize(), k) for f, k in part_tables]

    for feats, left_keys in part_tables:
        join_keys = list(dict.fromkeys(left_keys + ["ts"]))
        out = bucketed_left_join(out, feats, join_keys, num_buckets=num_buckets, how="left")
    if join.derivations:
        if left_cols is None:
            sch = out.schema()
            left_cols = sch.names
        out = apply_derivations(out, join.derivations, left_cols)
    return out
