"""Deduplication operators for large-scale corpus processing.

All stages are Dataset-native: vectorized per-batch signature computation,
then ONE groupby shuffle over compact signature rows (never the payloads).

  * exact_dedup      — content-hash partition + per-group first
  * minhash_lsh      — shingle -> minhash -> band-bucket groupby -> min-label
  * simhash          — 64-bit simhash fingerprint column
  * ngram_jaccard    — verify candidate pairs with exact n-gram Jaccard
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..aggregator.sketches import splitmix64
from ..stages.shuffle import stable_hash

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, width: int) -> np.ndarray:
    if len(text) < width:
        return pd.util.hash_array(np.array([text], dtype=object)).astype(np.uint64)
    sh = [text[i : i + width] for i in range(len(text) - width + 1)]
    return np.unique(pd.util.hash_array(np.array(sh, dtype=object)).astype(np.uint64))


def _perm_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(1234567)  # fixed: signatures must be stable
    a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, width: int, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    h = _shingle_hashes(text, width) & _MERSENNE
    with np.errstate(over="ignore"):
        vals = (np.outer(a, h) + b[:, None]) % _MERSENNE  # (num_perm, n_shingles)
    return vals.min(axis=1)


def exact_dedup(ds, cols: list[str], order_col: str, num_buckets: int = 64):
    """Keep the row with the smallest order_col per distinct `cols` content:
    content-hash column -> one hash-bucket shuffle -> vectorized min-per-group
    per partition."""

    def add_hash(batch: pa.Table) -> pa.Table:
        h = stable_hash([batch[c].to_numpy(zero_copy_only=False) for c in cols])
        return batch.append_column("__h", pa.array(h.astype(np.int64)))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    from ..functions.relational import min_by_group

    out = min_by_group(hashed, ["__h"], order_col, num_buckets=num_buckets)
    return out.drop_columns(["__h"])


class MinHashBands:
    """map_batches: text -> (doc_id, band_id, band_hash) exploded rows."""

    def __init__(self, text_col: str, id_col: str, num_perm=64, bands=16, shingle=5):
        assert num_perm % bands == 0
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle = shingle
        self.a, self.b = _perm_params(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        out_id, out_band, out_hash = [], [], []
        for doc_id, text in zip(ids, texts):
            sig = minhash_signature(text or "", self.shingle, self.a, self.b)
            bands = sig.reshape(self.bands, self.rows_per_band)
            bh = splitmix64(bands.sum(axis=1, dtype=np.uint64) + np.arange(self.bands, dtype=np.uint64))
            out_id.extend([doc_id] * self.bands)
            out_band.extend(range(self.bands))
            out_hash.extend(bh.astype(np.int64))
        return pa.table(
            {
                self.id_col: pa.array(out_id),
                "band": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_hash, type=pa.int64()),
            }
        )


def minhash_lsh_clusters(ds, text_col: str, id_col: str, num_perm=64, bands=16, shingle=5):
    """Near-duplicate clustering: docs sharing any LSH band bucket get the
    bucket's min doc id as a cluster label; a doc in several buckets takes the
    overall min (single-round min-label propagation — transitive chains
    longer than one hop may stay in separate clusters; iterate for full CC)."""
    from ..stages.shuffle import BUCKET_COL, AddBucket

    sig = ds.map_batches(
        MinHashBands(text_col, id_col, num_perm, bands, shingle), batch_format="pyarrow"
    )
    num_buckets = 64

    def bucket_min(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["cluster"] = g.groupby(["band", "band_hash"], sort=False)[id_col].transform("min")
        return g[[id_col, "cluster"]]

    labeled = (
        sig.map_batches(AddBucket(["band", "band_hash"], num_buckets), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(bucket_min, batch_format="pandas")
    )

    def doc_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(id_col, as_index=False, sort=False)["cluster"].min()

    return (
        labeled.map_batches(AddBucket([id_col], num_buckets), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(doc_min, batch_format="pandas")
    )


class SimHash:
    """map_batches: adds a 64-bit simhash of whitespace tokens."""

    def __init__(self, text_col: str, out_col: str = "simhash"):
        import re

        self.text_col = text_col
        self.out_col = out_col
        self.tok = re.compile(r"\w+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        out = np.zeros(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            toks = self.tok.findall((text or "").lower())
            if not toks:
                continue
            h = pd.util.hash_array(np.array(toks, dtype=object)).astype(np.uint64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
            score = (2 * bits - 1).sum(axis=0)
            out[i] = np.int64(((score > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum().astype(np.uint64).view(np.int64))
        return batch.append_column(self.out_col, pa.array(out, type=pa.int64()))


def ngram_jaccard(text_a: str, text_b: str, n: int = 5) -> float:
    sa = set(text_a[i : i + n] for i in range(max(1, len(text_a) - n + 1)))
    sb = set(text_b[i : i + n] for i in range(max(1, len(text_b) - n + 1)))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
