"""Near-duplicate pair operators: LSH-verified Jaccard pairs and exhaustive
block-pair cosine pairs must equal a local brute-force recompute."""

import itertools

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def doc_table(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    words = [f"w{i:03d}" for i in range(400)]  # big vocab: random pairs J ~ 0
    texts = [
        " ".join(rng.choice(words, size=40).tolist()) for _ in range(60)
    ]
    # inject near-dups: copies with one word changed (J ~ 0.9+)
    for src, dst in [(0, 50), (3, 51), (7, 52)]:
        t = texts[src].split()
        t[5] = "omega"
        texts[dst] = " ".join(t)
    texts[53] = texts[9]  # exact dup
    t = pa.table({"doc_id": pa.array(range(60), type=pa.int64()),
                  "text": pa.array(texts)})
    path = tmp_path_factory.mktemp("nd") / "docs.parquet"
    pq.write_table(t, str(path))
    return str(path), texts


def _brute_pairs(texts, thresh):
    from raywin.functions.texthash import normalize_ws
    from raywin.stages.dedup import ngram_jaccard

    norm = normalize_ws(pd.Series(texts)).tolist()
    out = set()
    for a, b in itertools.combinations(range(len(texts)), 2):
        if ngram_jaccard(norm[a], norm[b], 5) >= thresh:
            out.add((a, b))
    return out


def test_verified_neardup_pairs(ray_session, doc_table):
    import ray.data

    from raywin.stages.dedup import verified_neardup_pairs

    path, texts = doc_table
    ds = ray.data.read_parquet(path)
    got = verified_neardup_pairs(ds, "text", "doc_id", threshold=0.6,
                                 num_buckets=8).to_pandas()
    got_pairs = set(zip(got["a"].astype(int), got["b"].astype(int)))
    expect = _brute_pairs(texts, 0.6)
    # exact precision (verify stage recomputes true Jaccard) ...
    assert got_pairs <= expect
    # ... and full recall at high J (the injected dups, J ~ 0.9+; LSH recall
    # at J=0.9 with 16 bands x 4 rows is 1-(1-0.9^4)^16 ~ 0.9996)
    assert {(0, 50), (3, 51), (7, 52), (9, 53)} <= got_pairs
    assert (got["jaccard"] >= 0.6).all()


def test_cosine_neardup_pairs(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from raywin.stages.dedup import cosine_neardup_pairs

    rng = np.random.default_rng(11)
    n, d = 120, 16
    E = rng.normal(size=(n, d))
    E[100] = E[5] + rng.normal(scale=0.01, size=d)  # near-dup
    E[101] = E[30]  # exact dup
    t = pa.table({"vec_id": pa.array(range(n), type=pa.int64()),
                  "embedding": pa.array(E.tolist(),
                                        type=pa.list_(pa.float32()))})
    path = tmp_path / "emb.parquet"
    pq.write_table(t, str(path))

    ds = ray.data.read_parquet(str(path))
    got = cosine_neardup_pairs(ds, tau=0.5, num_blocks=3).to_pandas()
    got = got.sort_values(["a", "b"]).reset_index(drop=True)

    En = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    En = En / np.linalg.norm(En, axis=1, keepdims=True)
    S = En @ En.T
    iu, ju = np.triu_indices(n, 1)
    keep = S[iu, ju] >= 0.5
    exp = pd.DataFrame({"a": iu[keep], "b": ju[keep],
                        "sim": np.round(S[iu, ju][keep], 6)})
    exp = exp.sort_values(["a", "b"]).reset_index(drop=True)
    assert len(got) == len(exp) >= 2
    assert (got["a"].to_numpy() == exp["a"].to_numpy()).all()
    assert (got["b"].to_numpy() == exp["b"].to_numpy()).all()
    assert np.allclose(got["sim"], exp["sim"], atol=1e-9)
