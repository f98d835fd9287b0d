"""TF-IDF top-terms: brute-force pandas oracle + partitioning stability."""

import math

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _brute(df: pd.DataFrame, k: int) -> pd.DataFrame:
    import re

    tok = re.compile(r"[A-Za-z0-9]+")
    rows = []
    for r in df.itertuples():
        terms = [t.lower() for t in tok.findall(r.text or "")]
        if terms:
            rows.append((r.doc_id, terms))
    tf = {}
    dfreq = {}
    for doc, terms in rows:
        c = {}
        for t in terms:
            c[t] = c.get(t, 0) + 1
        tf[doc] = c
        for t in c:
            dfreq[t] = dfreq.get(t, 0) + 1
    n = len(df)
    out = []
    for doc, c in tf.items():
        scored = sorted(
            ((t, cnt * math.log(n / dfreq[t])) for t, cnt in c.items()),
            key=lambda x: (-x[1], x[0]),
        )[:k]
        for rank, (t, s) in enumerate(scored, 1):
            out.append((doc, t, rank, s))
    return pd.DataFrame(out, columns=["doc_id", "term", "rank", "tfidf"])


def test_tfidf_matches_brute_force(ray_session):
    import ray.data

    from raywin.stages.text import tfidf_top_terms

    pdf = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = _brute(pdf, 3).sort_values(["doc_id", "rank"]).reset_index(drop=True)
    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = (
        tfidf_top_terms(ds, "text", "doc_id", k=3)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["rank"].tolist() == want["rank"].tolist()
    np.testing.assert_allclose(got["tfidf"], want["tfidf"], rtol=1e-12)


def test_tfidf_stable_under_partitioning(ray_session):
    import ray.data

    from raywin.stages.text import tfidf_top_terms

    a = (
        tfidf_top_terms(
            ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"]),
            "text", "doc_id", k=3,
        )
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    ds2 = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"], override_num_blocks=9
    )
    b = (
        tfidf_top_terms(ds2, "text", "doc_id", k=3)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    assert a[["doc_id", "term", "rank"]].equals(b[["doc_id", "term", "rank"]])
    np.testing.assert_allclose(a["tfidf"], b["tfidf"], rtol=0, atol=0)


def test_tfidf_vocab_cutoff_raises(ray_session):
    import pytest
    import ray.data

    from raywin.stages.text import tfidf_top_terms

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    with pytest.raises(ValueError, match="broadcast_cutoff"):
        tfidf_top_terms(ds, "text", "doc_id", k=3, broadcast_cutoff=1)
