"""IVF-bucketed ANN (stages/ann.py): recall vs brute force on clustered
synthetic embeddings, top-1 self-match guarantee, bounded quantizer training."""

import numpy as np
import pyarrow as pa
import pytest

from raywin.stages.ann import (
    brute_force_topk,
    ivf_bucketed_topk,
    train_ivf_centroids,
)


@pytest.fixture()
def corpus(ray_session):
    import ray.data

    rng = np.random.default_rng(42)
    # 6 well-separated unit-norm cluster centers, 100 points each
    centers = rng.standard_normal((6, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.repeat(centers, 100, axis=0) + 0.05 * rng.standard_normal((600, 16))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(600), type=pa.int64()),
            "embedding": pa.array(list(pts.astype(np.float64))),
        }
    )
    return ray.data.from_arrow(tbl), pts


def test_ivf_top1_self_match_and_recall(corpus):
    ds, pts = corpus
    qids = [0, 150, 301]
    qvecs = pts[qids]
    ivf = ivf_bucketed_topk(
        ds, qvecs, qids, "embedding", "vec_id", k=5, n_centroids=6, nprobe=2
    ).to_pandas()
    brute = brute_force_topk(ds, qvecs, qids, "embedding", "vec_id", k=5).to_pandas()
    for qid in qids:
        iq = ivf[ivf["query_id"] == qid]
        bq = brute[brute["query_id"] == qid]
        # a corpus row identical to the query always survives the cell filter
        assert int(iq[iq["rank"] == 1]["vec_id"].iloc[0]) == qid
        recall = len(set(iq["vec_id"]) & set(bq["vec_id"])) / 5
        assert recall >= 0.8  # separated clusters: probed cells hold the true top-5


def test_train_ivf_centroids_bounded_and_deterministic(corpus):
    ds, _ = corpus
    c1 = train_ivf_centroids(ds, "embedding", n_centroids=6, sample_size=256)
    c2 = train_ivf_centroids(ds, "embedding", n_centroids=6, sample_size=256)
    assert c1.shape == (6, 16)
    np.testing.assert_allclose(c1, c2)
    np.testing.assert_allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-9)
