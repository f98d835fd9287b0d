"""Deterministic dataset splitting + stratified sampling for training data.

Both operators key on the engine's cross-engine-exact splitmix64
(aggregator/sketches.py for the vectorized numpy side,
functions/texthash.py ``sql_splitmix64_ctes`` for the DuckDB oracle side —
the same primitive that already pins the minhash/simhash stages).

A row's split assignment is a pure function of its id — stable across
engines, runs, cluster sizes, and input partitioning, which is the property
a train/val/test split must have: re-running a 100 TB split after appending
rows never moves an existing row between splits, so downstream epochs /
caches stay valid.

``hash_split`` is embarrassingly parallel (one map_batches, no shuffle).
``stratified_sample`` takes the n lowest-hash rows per stratum: a per-block
partial top-n prune (at most n rows per stratum survive each block) feeds
one tiny ``groupby(stratum)`` exchange — the corpus itself never shuffles,
so the exchange moves at most ``n × strata × n_blocks`` rows at any scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..aggregator.sketches import splitmix64


def hash_ids(ids: np.ndarray) -> np.ndarray:
    """splitmix64 over an integer id column (int64 reinterpreted as uint64,
    matching the SQL side's mod-2^64 arithmetic for negative ids too)."""
    return splitmix64(np.asarray(ids).astype(np.uint64))


class _HashSplit:
    """map_batches fn: append split = train/val/test by hash bucket % 100."""

    def __init__(self, id_col: str, train_pct: int, val_pct: int):
        self.id_col = id_col
        self.train_pct = train_pct
        self.val_pct = val_pct

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        bucket = (hash_ids(ids) % np.uint64(100)).astype(np.int64)
        split = np.full(len(bucket), "test", dtype=object)
        split[bucket < self.train_pct + self.val_pct] = "val"
        split[bucket < self.train_pct] = "train"
        return batch.append_column("split", pa.array(split, pa.string()))


def hash_split(ds, id_col: str, train_pct: int = 80, val_pct: int = 10):
    """Append a deterministic ``split`` column (train/val/test)."""
    return ds.map_batches(
        _HashSplit(id_col, train_pct, val_pct), batch_format="pyarrow"
    )


class _StratumPartialTopN:
    """Per-block prune: keep the n lowest-(hash, id) rows per stratum."""

    def __init__(self, stratum_col: str, id_col: str, n: int):
        self.stratum_col = stratum_col
        self.id_col = id_col
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        batch = batch.append_column("__h", pa.array(hash_ids(ids)))
        df = batch.to_pandas()
        keep = (
            df.sort_values(["__h", self.id_col])
            .groupby(self.stratum_col, sort=False)
            .head(self.n)
        )
        return pa.Table.from_pandas(keep, preserve_index=False)


def stratified_sample(ds, stratum_col: str, id_col: str, n_per_stratum: int):
    """n lowest-hash rows per stratum: (stratum, id, rank).

    Deterministic "random" sample — the hash order is a fixed pseudo-random
    permutation of ids, so the sample is unbiased w.r.t. any id-correlated
    attribute yet identical on every run, engine, and partitioning."""
    pruned = ds.map_batches(
        _StratumPartialTopN(stratum_col, id_col, n_per_stratum),
        batch_format="pyarrow",
    )

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__h", id_col]).head(n_per_stratum)
        out = g[[stratum_col, id_col]].copy()
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    return pruned.groupby(stratum_col).map_groups(_final, batch_format="pandas")
