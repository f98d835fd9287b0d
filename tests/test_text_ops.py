"""Unit edge cases for the round-3 corpus-prep stages (the catalog oracle
covers the bulk behavior; these pin the degenerate inputs)."""

import pandas as pd

from raywin.stages.text import PiiScrub, RepetitionStats


def test_repetition_stats_edges():
    df = pd.DataFrame(
        {
            "text": [
                None,                      # null -> zeros
                "one",                     # single token: no bigrams
                "a b a b a b",             # bigrams: ab,ba,ab,ba,ab -> 2 distinct / 5
                "x y z w",                 # all distinct
            ]
        }
    )
    out = RepetitionStats("text")(df.copy())
    assert out["n_bigrams"].tolist() == [0, 0, 5, 3]
    assert out["dup_bigram_frac"].tolist() == [0.0, 0.0, 1.0 - 2 / 5, 0.0]
    assert out["top_bigram_frac"].tolist() == [0.0, 0.0, 3 / 5, 1 / 3]


def test_pii_scrub_edges():
    df = pd.DataFrame(
        {
            "text": [
                "mail a.b+c@ex-ample.co.uk now",
                "call +1 (555) 010-1234 or 555 010 9999 today",
                "no pii here",
                None,
            ]
        }
    )
    out = PiiScrub("text")(df.copy())
    assert out["n_emails"].tolist() == [1, 0, 0, 0]
    assert out["n_phones"].tolist() == [0, 2, 0, 0]
    assert out["clean_text"].tolist() == [
        "mail <EMAIL> now",
        "call <PHONE> or <PHONE> today",
        "no pii here",
        "",
    ]
