"""Approximate/exact nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once with
``ray.put`` and every batch does one numpy matmul against it (never a shuffle
of the corpus).  Scale paths: LSH-bucketed variant (random hyperplane signs)
and IVF variant (k-means coarse quantizer, nprobe nearest cells) — both prune
each batch to candidate rows before the matmul; the corpus never shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-12)


def vecs_to_numpy(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Arrow list<float>/fixed_size_list<float> column -> (n, d) float64
    matrix without a Python-object detour: flatten the child values
    (zero-copy for non-null fixed-dim data) and reshape.  Falls back to
    ``to_pylist`` only for ragged rows."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty((0, 0), dtype=np.float64)
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
        flat = col.values.to_numpy(zero_copy_only=False)
        return np.asarray(flat, dtype=np.float64).reshape(len(col), d)
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        offs = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if col.null_count == 0 and len(widths) and (widths == widths[0]).all():
            d = int(widths[0])
            flat = col.values.to_numpy(zero_copy_only=False)
            # offsets may not start at 0 after slicing
            flat = flat[offs[0] : offs[0] + len(col) * d]
            return np.asarray(flat, dtype=np.float64).reshape(len(col), d)
    return np.asarray(col.to_pylist(), dtype=np.float64)


class _BatchTopK:
    """Per-batch local top-k candidates vs the broadcast query matrix."""

    def __init__(self, query_ref, query_ids, vec_col: str, id_col: str, k: int):
        import ray

        self.q = _normalize(np.asarray(ray.get(query_ref), dtype=np.float64))
        self.query_ids = np.asarray(query_ids)
        self.vec_col = vec_col
        self.id_col = id_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = vecs_to_numpy(batch[self.vec_col])
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        if len(vecs) == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), self.id_col: pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        sims = self.q @ _normalize(vecs).T  # (nq, nbatch)
        k = min(self.k, sims.shape[1])
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[0]):
            # deterministic local top-k: sim desc, id asc — argpartition on
            # sim alone could drop the lower id of an equal-sim tie pair at
            # the cutoff, breaking the documented global tie order
            cand = np.lexsort((ids, -sims[qi]))[:k]
            out_q.extend([self.query_ids[qi]] * len(cand))
            out_id.extend(ids[cand])
            out_sim.extend(sims[qi, cand])
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                self.id_col: pa.array(out_id),
                "sim": pa.array(out_sim, type=pa.float64()),
            }
        )


def brute_force_topk(ds, query_vectors: np.ndarray, query_ids, vec_col: str, id_col: str, k: int):
    """Exact cosine top-k of every query vector against the corpus.

    Returns (query_id, id_col, sim, rank) — rank 1-based, ties broken by id.
    """
    import ray

    ref = ray.put(np.asarray(query_vectors, dtype=np.float64))
    local = ds.map_batches(
        _BatchTopK(ref, query_ids, vec_col, id_col, k), batch_format="pyarrow"
    )

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", id_col], ascending=[False, True]).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return local.groupby("query_id").map_groups(global_topk, batch_format="pandas")


class _LshPlanes:
    """Shared random hyperplanes for the LSH-bucketed variant."""

    def __init__(self, dim: int, n_planes: int, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))

    def signature(self, vecs: np.ndarray) -> np.ndarray:
        signs = (vecs @ self.planes.T) > 0
        return (signs.astype(np.uint64) << np.arange(signs.shape[1], dtype=np.uint64)).sum(axis=1)


def lsh_bucketed_topk(ds, query_vectors: np.ndarray, query_ids, vec_col: str, id_col: str,
                      k: int, n_planes: int = 8, multiprobe: int = 1):
    """Approximate cosine top-k: corpus rows are pruned per batch to those
    sharing an LSH hyperplane-sign bucket with at least one query.
    multiprobe=H also probes buckets within Hamming distance H of each
    query's signature (standard multi-probe LSH — recovers the recall lost
    to near-boundary sign flips without shrinking the plane count)."""
    import ray

    q = np.asarray(query_vectors, dtype=np.float64)
    planes = _LshPlanes(q.shape[1], n_planes)
    base_sigs = set(planes.signature(_normalize(q)).tolist())
    q_sigs = set(base_sigs)
    frontier = set(base_sigs)
    for _ in range(multiprobe):
        frontier = {s ^ (1 << b) for s in frontier for b in range(n_planes)}
        q_sigs |= frontier
    ref = ray.put(q)
    sig_ref = ray.put((planes.planes, q_sigs))

    class Pruned(_BatchTopK):
        def __init__(self):
            super().__init__(ref, query_ids, vec_col, id_col, k)
            pl, sigs = ray.get(sig_ref)
            self.planes = pl
            self.sigs = sigs

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = vecs_to_numpy(batch[self.vec_col])
            if len(vecs):
                signs = (_normalize(vecs) @ self.planes.T) > 0
                sig = (signs.astype(np.uint64) << np.arange(signs.shape[1], dtype=np.uint64)).sum(axis=1)
                mask = np.array([s in self.sigs for s in sig.tolist()])
                batch = batch.filter(pa.array(mask))
            return super().__call__(batch)

    local = ds.map_batches(Pruned, batch_format="pyarrow", concurrency=(1, 8))

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", id_col], ascending=[False, True]).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return local.groupby("query_id").map_groups(global_topk, batch_format="pandas")


def train_ivf_centroids(ds, vec_col: str, n_centroids: int = 16,
                        sample_size: int = 4096, iters: int = 10,
                        seed: int = 7) -> np.ndarray:
    """Coarse quantizer for the IVF variant: Lloyd's k-means (spherical —
    centroids renormalized each round, assignment by max dot product) over a
    BOUNDED sample.  ``ds.limit(sample_size)`` keeps driver memory constant
    at any corpus scale; at 100 TB the sample is still ``sample_size`` rows.
    Deterministic for a fixed seed."""
    sample = ds.limit(sample_size).to_pandas()
    vecs = _normalize(np.asarray(sample[vec_col].tolist(), dtype=np.float64))
    n_c = min(n_centroids, len(vecs))
    rng = np.random.default_rng(seed)
    cents = vecs[rng.choice(len(vecs), size=n_c, replace=False)]
    for _ in range(iters):
        assign = np.argmax(vecs @ cents.T, axis=1)
        for c in range(n_c):
            pts = vecs[assign == c]
            if len(pts):
                cents[c] = pts.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_bucketed_topk(ds, query_vectors: np.ndarray, query_ids, vec_col: str,
                      id_col: str, k: int, n_centroids: int = 16,
                      nprobe: int = 4, centroids: np.ndarray | None = None):
    """Approximate cosine top-k via an IVF (inverted-file) coarse quantizer:
    each corpus row is assigned per batch to its nearest k-means centroid and
    kept only if that cell is among some query's ``nprobe`` closest cells.
    Same scale shape as the LSH variant — centroids broadcast once with
    ``ray.put``, vectorized assign+filter+matmul per batch, corpus never
    shuffled or materialized.  Pass precomputed ``centroids`` to reuse a
    trained quantizer across calls."""
    import ray

    q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    if centroids is None:
        centroids = train_ivf_centroids(ds, vec_col, n_centroids)
    # union of every query's nprobe nearest cells (allowed-cell mask)
    sims_qc = q @ centroids.T  # (nq, nc)
    npb = min(nprobe, centroids.shape[0])
    probe = np.argpartition(-sims_qc, npb - 1, axis=1)[:, :npb]
    allowed = np.zeros(centroids.shape[0], dtype=bool)
    allowed[np.unique(probe)] = True
    ref = ray.put(np.asarray(query_vectors, dtype=np.float64))
    cell_ref = ray.put((centroids, allowed))

    class IvfPruned(_BatchTopK):
        def __init__(self):
            super().__init__(ref, query_ids, vec_col, id_col, k)
            cents, mask = ray.get(cell_ref)
            self.cents = cents
            self.allowed = mask

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = vecs_to_numpy(batch[self.vec_col])
            if len(vecs):
                cell = np.argmax(_normalize(vecs) @ self.cents.T, axis=1)
                batch = batch.filter(pa.array(self.allowed[cell]))
            return super().__call__(batch)

    local = ds.map_batches(IvfPruned, batch_format="pyarrow", concurrency=(1, 8))

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", id_col], ascending=[False, True]).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return local.groupby("query_id").map_groups(global_topk, batch_format="pandas")
