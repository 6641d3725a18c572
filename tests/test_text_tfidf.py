"""Tests for TF-IDF top-term and repeated-n-gram ratio stages."""

import math

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs_df():
    return pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "apple banana apple cherry",
                "banana cherry cherry date",
                "apple banana date date date",
                "elder elder elder banana",
            ],
        }
    )


def test_tfidf_top_term_matches_direct(ray_session, docs_df):
    import ray.data

    from spectral_time_series_ray.stages.text import tfidf_top_term

    ds = ray.data.from_pandas(docs_df)
    got = tfidf_top_term(ds).to_pandas().set_index("doc_id").sort_index()

    # direct computation
    tok = {r.doc_id: r.text.split(" ") for r in docs_df.itertuples()}
    n = len(tok)
    df_counts = {}
    for toks in tok.values():
        for t in set(toks):
            df_counts[t] = df_counts.get(t, 0) + 1
    for d, toks in tok.items():
        scores = {
            t: toks.count(t) * math.log(n / df_counts[t]) for t in set(toks)
        }
        best = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got.loc[d, "top_term"] == best[0]
        assert got.loc[d, "score"] == pytest.approx(best[1], abs=1e-9)


def test_term_frequencies_distinct_per_doc(ray_session, docs_df):
    import ray.data

    from spectral_time_series_ray.stages.text import term_frequencies

    ds = ray.data.from_pandas(docs_df)
    tf = term_frequencies(ds).to_pandas()
    # one row per (doc, distinct term); tf sums to token counts
    assert not tf.duplicated(["doc_id", "term"]).any()
    assert tf["tf"].sum() == sum(len(t.split()) for t in docs_df["text"])
    assert tf[(tf.doc_id == 3) & (tf.term == "date")]["tf"].iloc[0] == 3


def test_repeated_ngram_ratio_planted(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.dedup import repeated_ngram_ratio

    shared = " ".join(f"s{i}" for i in range(12))
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a1 a2 a3 a4 " + shared,
                "b1 b2 b3 b4 " + shared,
                " ".join(f"c{i}" for i in range(16)),
            ],
        }
    )
    out = (
        repeated_ngram_ratio(
            ray.data.from_pandas(df), n=4, min_docs=2
        )
        .to_pandas()
        .set_index("doc_id")
    )
    # shared block contributes 12-4+1 = 9 fully-shared 4-grams
    assert out.loc[1, "n_repeated"] >= 9
    assert out.loc[2, "n_repeated"] >= 9
    assert out.loc[3, "n_repeated"] == 0
    assert out.loc[3, "dup_ratio"] == 0.0
    assert out.loc[1, "n_shingles"] == 16 - 4 + 1
