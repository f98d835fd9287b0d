"""Deterministic split / stratified sample / distributed k-means.

Oracle strategy mirrors the rest of the suite: every operator is compared
against an independent recompute — DuckDB SQL built from the same public
definitions (splitmix64; unrolled Lloyd iterations) or a brute-force numpy
single-process reference."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_splitmix64_matches_sql_including_negative_ids():
    from raywin.functions.texthash import sql_splitmix64_ctes
    from raywin.stages.splits import hash_ids

    ids = np.array(
        [0, 1, 2, 499, 12345, 2**62, -1, -(2**63), 987654321987654321],
        dtype=np.int64,
    )
    py = hash_ids(ids)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS id", [[int(x) for x in ids]])
    sql = "WITH " + sql_splitmix64_ctes("t", "id", "id", "hs") + " SELECT id, h FROM hs"
    got = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    for i, v in zip(ids, py):
        assert got[int(i)] == int(v)


def test_hash_split_stable_under_partitioning(ray_session):
    import ray.data

    from raywin.stages.splits import hash_split

    ds1 = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    a = hash_split(ds1, "doc_id").to_pandas().sort_values("doc_id").reset_index(drop=True)
    ds2 = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id"], override_num_blocks=7
    ).random_shuffle(seed=3)
    b = hash_split(ds2, "doc_id").to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # all three splits populated with roughly the configured proportions
    counts = a["split"].value_counts()
    assert set(counts.index) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_stratified_sample_matches_brute_force(ray_session):
    import ray.data

    from raywin.stages.splits import hash_ids, stratified_sample

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "label"])
    got = (
        stratified_sample(ds, "label", "vec_id", 5)
        .to_pandas()
        .sort_values(["label", "rank"])
        .reset_index(drop=True)
    )
    df = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "label"])
    df["__h"] = hash_ids(df["vec_id"].to_numpy())
    want = (
        df.sort_values(["__h", "vec_id"])
        .groupby("label", sort=True)
        .head(5)
        .sort_values("label", kind="stable")
    )
    want["rank"] = want.groupby("label").cumcount() + 1
    want = want.sort_values(["label", "rank"]).reset_index(drop=True)
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert got["rank"].tolist() == want["rank"].tolist()


def _brute_kmeans(vecs, ids, k, iters):
    """Single-process Lloyd reference with the engine's exact semantics."""
    order = np.argsort(ids)
    init = order[np.isin(ids[order], np.arange(k))]
    cids = ids[init]
    cents = vecs[init].astype(np.float64)
    for _ in range(iters):
        d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        keep = np.unique(a)
        cents = np.stack([vecs[a == c].mean(axis=0) for c in keep])
        cids = cids[keep]
    d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return cids[np.argmin(d2, axis=1)]


def test_kmeans_matches_brute_force(ray_session):
    import ray.data

    from raywin.stages.kmeans import kmeans_cluster

    df = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    ids = df["vec_id"].to_numpy()
    want = dict(zip(ids, _brute_kmeans(vecs, ids, 4, 3)))
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = kmeans_cluster(ds, "embedding", "vec_id", k=4, iters=3).to_pandas()
    assert len(got) == len(df)
    assert all(want[r.vec_id] == r.cluster_id for r in got.itertuples())


def test_kmeans_drops_empty_clusters(ray_session):
    """A far-away singleton centroid that captures nothing after iteration 1
    must vanish (matching the SQL GROUP BY), not poison later iterations."""
    import ray.data

    from raywin.stages.kmeans import kmeans_fit

    # ids 0,1,2 seed; id 2's vector is identical to id 0's, so cluster 2
    # captures no one (ties break to the LOWER cluster id) and must drop out
    rows = [
        {"vec_id": 0, "embedding": [0.0, 0.0]},
        {"vec_id": 1, "embedding": [10.0, 10.0]},
        {"vec_id": 2, "embedding": [0.0, 0.0]},
        {"vec_id": 3, "embedding": [0.5, 0.0]},
        {"vec_id": 4, "embedding": [9.5, 10.0]},
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
            "embedding": pa.array([r["embedding"] for r in rows], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    cids, cents = kmeans_fit(ds, "embedding", "vec_id", k=3, iters=2)
    assert cids.tolist() == [0, 1]
    np.testing.assert_allclose(cents[0], np.array([1.0 / 6, 0.0]), atol=1e-12)
    np.testing.assert_allclose(cents[1], np.array([9.75, 10.0]), atol=1e-12)


def test_kmeans_oracle_sql_matches_engine(ray_session):
    import ray.data

    from raywin.stages.kmeans import kmeans_cluster, kmeans_oracle_sql

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = (
        kmeans_cluster(ds, "embedding", "vec_id", k=4, iters=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    want = (
        con.execute(kmeans_oracle_sql("embeddings", "embedding", "vec_id", 4, 2, 64))
        .df()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert got["cluster_id"].tolist() == want["cluster_id"].tolist()
