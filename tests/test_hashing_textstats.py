import numpy as np

from spectral_time_series_ray.functions.hashing import (
    MinHasher,
    fnv1a_u64,
    hamming64,
    shingle_hashes,
    simhash64,
    winnow_fingerprint,
)
from spectral_time_series_ray.functions.textstats import (
    bpe_token_count,
    detect_language,
    quality_features,
    quality_score,
    whitespace_token_count,
)


def test_fnv_deterministic():
    a = fnv1a_u64(["hello", "world"])
    b = fnv1a_u64(["hello", "world"])
    np.testing.assert_array_equal(a, b)
    assert a[0] != a[1]


def test_minhash_jaccard_estimate():
    mh = MinHasher(num_perm=256, bands=32, seed=1)
    t1 = ("the quick brown fox jumps over the lazy dog " * 20).split()
    t2 = list(t1)
    t2[10] = "cat"  # near-duplicate
    s1 = mh.signature(shingle_hashes(t1))
    s2 = mh.signature(shingle_hashes(t2))
    est = MinHasher.estimate_jaccard(s1, s2)
    # true jaccard of shingle sets
    sh1, sh2 = set(shingle_hashes(t1)), set(shingle_hashes(t2))
    true = len(sh1 & sh2) / len(sh1 | sh2)
    assert abs(est - true) < 0.15
    # identical docs share every band
    assert (mh.band_keys(s1) == mh.band_keys(mh.signature(shingle_hashes(t1)))).all()


def test_minhash_distinct_docs_low_estimate():
    mh = MinHasher(seed=2)
    s1 = mh.signature(shingle_hashes("alpha beta gamma delta epsilon zeta".split() * 5))
    s2 = mh.signature(shingle_hashes("one two three four five six seven".split() * 5))
    assert MinHasher.estimate_jaccard(s1, s2) < 0.1


def test_simhash_near_dup_small_hamming():
    base = (
        "large scale distributed data processing engines stream arrow batches "
        "through actor pools with explicit shuffle partitioning and salting "
        "while rollup tiers materialize tumbling aggregates per conversation"
    ).split()
    toks1 = fnv1a_u64(base * 3)
    toks2 = fnv1a_u64(base * 3 + ["extra"])
    toks3 = fnv1a_u64("completely unrelated vocabulary covering gardens birds rivers mountains clouds".split() * 8)
    h1, h2, h3 = simhash64(toks1), simhash64(toks2), simhash64(toks3)
    d_near = hamming64(np.array([h1]), h2)[0]
    d_far = hamming64(np.array([h1]), h3)[0]
    assert d_near < d_far
    assert d_near <= 10
    assert d_far >= 15


def test_winnow_fingerprint_stability():
    toks = "a b c d e f g h i j k l m n o p".split()
    f1 = winnow_fingerprint(toks)
    f2 = winnow_fingerprint(toks)
    np.testing.assert_array_equal(f1, f2)
    # a shared long substring yields overlapping fingerprints
    f3 = winnow_fingerprint("x y z".split() + toks)
    assert len(np.intersect1d(f1, f3)) > 0


def test_token_counts():
    assert whitespace_token_count("one two  three") == 3
    assert bpe_token_count("it's working, fine!") >= 5
    assert bpe_token_count("") == 0


def test_detect_language():
    assert detect_language("the cat sat on the mat and it was happy") == "en"
    assert detect_language("el perro y la casa en un lugar de la mancha") == "es"
    assert detect_language("der hund und die katze ist in dem haus") == "de"
    assert detect_language("这是一个中文句子测试语言识别") == "zh"
    assert detect_language("") == "und"
    assert detect_language("zzz qqq xxx") == "und"


def test_quality():
    good = "The quick brown fox jumps over the lazy dog and runs far away today."
    bad = "a a a a a a a a a a"
    f = quality_features(good)
    assert f["n_words"] > 5 and 0 < f["stopword_ratio"] < 1
    assert quality_score(good) > quality_score(bad)


def test_mulmod_p61_exact():
    """mulmod_p61 must equal exact Python big-int (a*x) mod (2^61-1) —
    the universal-hash guarantee of MinHash depends on it."""
    from spectral_time_series_ray.functions.hashing import mulmod_p61

    p = (1 << 61) - 1
    rng = np.random.default_rng(3)
    a = rng.integers(0, p, 2000, dtype=np.uint64)
    x = rng.integers(0, p, 2000, dtype=np.uint64)
    got = mulmod_p61(a, x)
    exp = np.array([(int(ai) * int(xi)) % p for ai, xi in zip(a, x)], dtype=np.uint64)
    np.testing.assert_array_equal(got, exp)
    for ai, xi in [(p - 1, p - 1), (0, 5), (p - 1, 1), (2**31 - 1, 2**31 - 1), (2**60, 2**60)]:
        assert int(mulmod_p61(np.uint64(ai), np.uint64(xi))) == (ai * xi) % p


# ------------------------------------------------ chunking + redaction

import pandas as pd


def test_document_chunker_reconstruction():
    from spectral_time_series_ray.stages.text import DocumentChunker

    ch = DocumentChunker(max_tokens=8, overlap=2)
    texts = [
        "",  # empty
        "one",  # single token
        " ".join(f"w{i}" for i in range(8)),  # exactly max_tokens
        " ".join(f"w{i}" for i in range(9)),  # one over
        " ".join(f"w{i}" for i in range(50)),  # many chunks
        "a  b\t c \n d",  # messy whitespace preserved inside chunks
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    out = ch(df)
    for did, g in out.groupby("doc_id"):
        g = g.sort_values("chunk_idx")
        toks = []
        for i, t in enumerate(g["chunk_text"]):
            parts = t.split()
            toks.extend(parts if i == 0 else parts[2:])
        assert toks == texts[did].split(), f"doc {did} reconstruction"
        assert (g["n_chunks"] == len(g)).all()
        # every chunk (except possibly a lone empty doc) is non-trivial:
        # later chunks must contribute new tokens beyond the overlap
        if len(g) > 1:
            assert (g["n_tokens"].iloc[1:] > 2).all()


def test_document_chunker_token_counts():
    from spectral_time_series_ray.stages.text import DocumentChunker

    ch = DocumentChunker(max_tokens=8, overlap=2)
    n = 50
    df = pd.DataFrame({"doc_id": [np.int64(0)], "text": [" ".join(f"w{i}" for i in range(n))]})
    out = ch(df)
    # token conservation: sum of (n_tokens - overlap for later chunks)
    total = int(out["n_tokens"].sum()) - 2 * (len(out) - 1)
    assert total == n
    assert (out["n_tokens"] <= 8).all()


def test_redactor_counts_and_scrub():
    import re

    from spectral_time_series_ray.stages.text import REDACTION_PATTERNS, Redactor

    r = Redactor()
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "mail me at a.b@c.org or x@y.io",
                "call (555) 123-4567 or 555 123 4567",
                "srv 10.0.0.1 and 192.168.1.255",
                "ssn 123-45-6789 plain 123456789",
            ],
        }
    )
    out = r(df)
    assert out["n_email"].tolist() == [2, 0, 0, 0]
    assert out["n_phone"].tolist() == [0, 2, 0, 0]
    assert out["n_ip"].tolist() == [0, 0, 2, 0]
    assert out["n_ssn"].tolist() == [0, 0, 0, 1]
    pats = [re.compile(p) for p, _ in REDACTION_PATTERNS]
    for t in out["text"]:
        for rx in pats:
            assert not rx.search(t), (t, rx.pattern)
    assert "<EMAIL>" in out["text"].iloc[0]


# ------------------------------------------------ char-bigram LM


def test_char_bigram_counts_match_naive():
    from spectral_time_series_ray.functions.textstats import char_bigram_counts

    def code(ch):
        if ch.isascii() and ch.isalpha():
            return ord(ch.lower()) - 97
        if ch in " \t\n\r":
            return 26
        return 27

    texts = ["Hello, World!", "a", "", "the quick brown fox", "ZZ top 99"]
    exp = np.zeros((28, 28), dtype=np.int64)
    for t in texts:
        for x, y in zip(t, t[1:]):
            exp[code(x), code(y)] += 1
    got = char_bigram_counts(texts)
    assert (got == exp).all()


def test_char_bigram_nll_matches_naive():
    from spectral_time_series_ray.functions.textstats import (
        char_bigram_counts,
        char_bigram_logprob,
        char_bigram_nll,
    )

    def code(ch):
        if ch.isascii() and ch.isalpha():
            return ord(ch.lower()) - 97
        if ch in " \t\n\r":
            return 26
        return 27

    texts = ["hello world", "qzxj vwkp", "aaa bbb ccc"]
    lp = char_bigram_logprob(char_bigram_counts(texts))
    got = char_bigram_nll(texts, lp)
    for i, t in enumerate(texts):
        exp = np.mean([-lp[code(x), code(y)] for x, y in zip(t, t[1:])])
        assert abs(got[i] - exp) < 1e-12


def test_lm_separates_gibberish(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.text import (
        lm_quality_filter,
        lm_quality_score,
        train_char_lm,
    )

    rng = np.random.default_rng(7)
    words = ["the", "data", "table", "fast", "join", "merge", "scan", "row"]
    real = [" ".join(rng.choice(words, size=30)) for _ in range(60)]
    gib = ["".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz"), size=150))
           for _ in range(10)]
    df = pd.DataFrame({"doc_id": range(70), "text": real + gib})
    ds = ray.data.from_pandas(df)
    logp = train_char_lm(ds)
    scored = lm_quality_score(ds, logp, concurrency=2).to_pandas()
    s = scored.set_index("doc_id")["lm_nll"]
    assert s.loc[60:].min() > s.loc[:59].max()
    thr = 0.5 * (s.loc[60:].min() + s.loc[:59].max())
    kept = lm_quality_filter(ds, logp, max_nll=thr, concurrency=2).to_pandas()
    assert set(kept["doc_id"]) == set(range(60))


def test_fnv_vectorized_matches_reference_loop():
    """The lockstep vector scan must be bit-exact vs the per-byte
    FNV-1a reference recurrence on every length/content mix, including
    empties, unicode, lone surrogates, and huge outliers that take the
    Python fallback path."""
    import random

    from spectral_time_series_ray.functions.hashing import (
        _FNV_OFFSET,
        _FNV_PRIME,
    )

    def ref(tokens):
        out = np.empty(len(tokens), dtype=np.uint64)
        prime = int(_FNV_PRIME)
        mask = (1 << 64) - 1
        for i, tok in enumerate(tokens):
            h = int(_FNV_OFFSET)
            for b in tok.encode("utf-8", "surrogatepass"):
                h = ((h ^ b) * prime) & mask
            out[i] = h
        return out

    # known vector: FNV-1a 64 of "a" (public test vector)
    assert fnv1a_u64(["a"])[0] == np.uint64(0xAF63DC4C8601EC8C)
    assert fnv1a_u64([""])[0] == _FNV_OFFSET

    rng = random.Random(11)
    cases = [
        [],
        ["", "a", "ab", "abc" * 50],
        ["同じ", "ünïcode", "\ud800s", "x" * 4000, ""] + [f"t{i}" for i in range(64)],
        ["y" * 9000] * 2 + [f"short{i}" for i in range(200)],
    ]
    for _ in range(3):
        n = rng.randint(1, 300)
        cases.append([
            "".join(chr(rng.randint(32, 0x2FFF))
                    for _ in range(rng.randint(0, rng.choice([3, 40, 400]))))
            for _ in range(n)
        ])
    for c in cases:
        np.testing.assert_array_equal(fnv1a_u64(c), ref(c))
