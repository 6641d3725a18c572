"""Tests for benchmark decontamination, Hamming-prefix pair blocking,
and regex extraction."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@pytest.mark.usefixtures("ray_session")
def test_benchmark_contamination_planted():
    import ray.data

    from spectral_time_series_ray.stages.text import benchmark_contamination

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                bench_text,  # the benchmark doc
                "x y " + bench_text + " z",  # contains every bench 5-gram
                "alpha beta gamma delta epsilon nope",  # shares exactly one
                "totally unrelated words with no overlap at all here",
            ],
            "_is_bench": [True, False, False, False],
        }
    )
    out = (
        benchmark_contamination(ray.data.from_pandas(docs), n=5)
        .to_pandas()
        .set_index("doc_id")["n_shared_grams"]
    )
    # doc 1 contains all 4 distinct 5-grams of the benchmark doc
    assert out.loc[1] == 4
    assert out.loc[2] == 1
    assert 3 not in out.index
    assert 0 not in out.index  # benchmark docs are never reported


@given(st.integers(min_value=0, max_value=10_000))
@settings(max_examples=50, deadline=None)
def test_hamming_pigeonhole_is_lossless(seed):
    """Any pair of 16-char keys at Hamming distance <= 1 must agree on
    at least one 8-char half — the blocking invariant the operator and
    its SQL oracle both rely on."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 3, 16)
    b = a.copy()
    if rng.random() < 0.8:  # flip at most one position
        b[rng.integers(0, 16)] = rng.integers(0, 3)
    dist = int((a != b).sum())
    if dist <= 1:
        assert (a[:8] == b[:8]).all() or (a[8:] == b[8:]).all()


@pytest.mark.usefixtures("ray_session")
def test_hamming_prefix_pairs_planted():
    import ray.data

    from spectral_time_series_ray.stages.dedup import hamming_prefix_pairs

    base = "abcdefghijklmnop"  # 16 chars
    docs = pd.DataFrame(
        {
            "doc_id": [10, 11, 12, 13, 14],
            "text": [
                base + " tail one",
                base + " other tail",  # dist 0 vs 10
                "Xbcdefghijklmnop trailing",  # dist 1 (first half edited)
                "abcdefghijklmnoX trailing",  # dist 1 (second half edited)
                "XbcdefghijklmnoX trailing",  # dist 2 -> excluded
            ],
        }
    )
    out = (
        hamming_prefix_pairs(ray.data.from_pandas(docs), key_len=16, max_dist=1)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (10, 11) in pairs and out.set_index(["id_a", "id_b"]).loc[(10, 11), "dist"] == 0
    assert (10, 12) in pairs and (11, 12) in pairs
    assert (10, 13) in pairs and (11, 13) in pairs
    # 12 vs 13 differ in both halves (dist 2): must NOT pair
    assert (12, 13) not in pairs
    # 14 is dist 1 from each single-edit doc but dist 2 from the base
    assert (12, 14) in pairs and (13, 14) in pairs
    assert (10, 14) not in pairs and (11, 14) not in pairs
    # no duplicate pair rows even though dist-0 pairs block on both halves
    assert len(out) == len(pairs)


def test_regex_extractor_kernel():
    from spectral_time_series_ray.stages.text import RegexExtractor

    ex = RegexExtractor("st[a-z]+")
    batch = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["stream stops here", "no match", "stst still"]}
    )
    out = ex(batch)
    assert out["n_matches"].tolist() == [2, 0, 2]
    assert out["first_match"].tolist() == ["stream", "", "stst"]


@pytest.mark.usefixtures("ray_session")
def test_duplicate_span_coverage_planted():
    import ray.data

    from spectral_time_series_ray.stages.dedup import duplicate_span_coverage

    shared = "q w e r t y u i o p"  # 10 tokens, appears in docs 1 and 2
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                shared + " aa bb cc dd ee ff",          # 16 tokens, 10 shared
                "zz xx " + shared + " cc vv",           # 14 tokens, 10 shared
                "totally different words one two three four five six seven",
            ],
        }
    )
    out = (
        duplicate_span_coverage(ray.data.from_pandas(docs), n=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # overlapping shared 4-grams merge into ONE 10-token island
    assert out.loc[1, "covered_tokens"] == 10
    assert out.loc[2, "covered_tokens"] == 10
    assert out.loc[3, "covered_tokens"] == 0
    assert out.loc[1, "n_tokens"] == 16 and out.loc[2, "n_tokens"] == 14
    assert out.loc[1, "dup_ratio"] == pytest.approx(10 / 16)


def test_gopher_rules_hand_computed(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.text import gopher_quality

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                # 6 words, 'the'+'a' stopwords, one dup ('cat')
                "The cat and a cat sat",
                # 4 words, no stopwords, all unique
                "zebra yak xylo wombat",
                # modal word 'go' 3/5
                "go go go stop now",
            ],
        }
    )
    out = (
        gopher_quality(ray.data.from_pandas(docs), concurrency=1)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_words"] == 6
    assert out.loc[1, "mean_word_len"] == pytest.approx((3 + 3 + 3 + 1 + 3 + 3) / 6)
    assert out.loc[1, "n_stop"] == 3  # the, and, a
    assert out.loc[1, "frac_dup_words"] == pytest.approx(1 - 5 / 6)
    assert out.loc[1, "top_word_frac"] == pytest.approx(2 / 6)
    assert out.loc[2, "n_stop"] == 0
    assert out.loc[2, "frac_dup_words"] == 0.0
    assert out.loc[3, "top_word_frac"] == pytest.approx(3 / 5)
    assert (out["frac_alpha"] == 1.0).all()
    # short docs: every row fails the >=30-words gate
    assert not out["pass"].any()


@pytest.mark.usefixtures("ray_session")
def test_hamming_prefix_pairs_short_doc_padding():
    # blocking halves must come from the PADDED key: a doc shorter than
    # key_len pads with spaces for verification, and its padded key can
    # sit at Hamming distance 1 from a full-length doc — the pair must
    # be found (regression: halves sliced from the unpadded text gave
    # short docs different half-keys and the pair was silently lost)
    import ray.data

    from spectral_time_series_ray.stages.dedup import hamming_prefix_pairs

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "abcdefghijklmno",    # 15 chars -> padded 'abcdefghijklmno '
                "abcdefghijklmnoZ",   # 16 chars: dist 1 vs padded doc 1
                "abcdefghijklmno ",   # explicit trailing space: dist 0 vs doc 1
            ],
        }
    )
    out = hamming_prefix_pairs(
        ray.data.from_pandas(docs), key_len=16, max_dist=1
    ).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs


@pytest.mark.usefixtures("ray_session")
def test_ssjoin_exact_boundary_sizes():
    # threshold 0.28 with |a| = 7 contained in |b| = 25: J = 7/25 = 0.28
    # exactly — the size prefilter must not drop the boundary pair
    # (regression: float s/threshold = 24.999999999999996 excluded 25)
    import ray.data

    from spectral_time_series_ray.stages.dedup import ssjoin_prefix

    a_toks = [f"w{i}" for i in range(7)]
    b_toks = a_toks + [f"x{i}" for i in range(18)]  # 25 distinct shingles
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": [" ".join(a_toks), " ".join(b_toks)],
    })
    out = ssjoin_prefix(
        ray.data.from_pandas(docs), threshold=0.28, shingle_n=1
    ).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert (1, 2) in pairs
