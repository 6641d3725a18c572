"""Text-analysis kernels: tokenization, language-ID heuristic, quality
scoring. Vectorized over a batch of texts where possible; compiled
regexes are module-level so actor-pool stages pay compile cost once.
"""

from __future__ import annotations

import re

import numpy as np

# BPE-ish pre-tokenizer in the GPT-2 style (public pattern family):
# contractions | words (optional leading space) | non-space symbols | spaces
BPE_RE = re.compile(r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+")
WORD_RE = re.compile(r"[A-Za-z]+|[0-9]+", re.UNICODE)
PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)
DIGIT_RE = re.compile(r"[0-9]")

STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on", "with", "as", "was", "at"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por", "con", "para", "es", "no"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist", "des", "im", "nicht", "ein", "eine"},
    "fr": {"le", "la", "les", "de", "des", "et", "en", "un", "une", "du", "que", "est", "pour", "dans", "qui"},
    "it": {"il", "la", "di", "che", "e", "un", "una", "per", "in", "con", "del", "non", "sono", "le", "si"},
}


def whitespace_token_count(text: str) -> int:
    return len(text.split())


def bpe_token_count(text: str) -> int:
    return sum(1 for m in BPE_RE.finditer(text) if not m.group().isspace())


def words(text: str) -> list[str]:
    return WORD_RE.findall(text.lower())


def detect_language(text: str) -> str:
    """Heuristic language ID: CJK codepoint ratio, else argmax stopword
    hit-rate over small per-language lists; 'und' when nothing matches."""
    if not text:
        return "und"
    cjk = sum(1 for ch in text if "一" <= ch <= "鿿" or "぀" <= ch <= "ヿ")
    if cjk / max(1, len(text)) > 0.2:
        return "zh"
    ws = words(text)
    if not ws:
        return "und"
    best_lang, best = "und", 0.0
    for lang, sw in STOPWORDS.items():
        score = sum(1 for w in ws if w in sw) / len(ws)
        if score > best:
            best_lang, best = lang, score
    return best_lang if best > 0.02 else "und"


def quality_features(text: str) -> dict[str, float]:
    """Heuristic doc-quality features in the C4/Gopher style (public
    rules): length, word stats, punctuation/digit ratios, stopword
    ratio, repetition."""
    n_chars = len(text)
    ws = words(text)
    n_words = len(ws)
    mean_word_len = float(np.mean([len(w) for w in ws])) if ws else 0.0
    uniq_ratio = len(set(ws)) / n_words if n_words else 0.0
    n_punct = len(PUNCT_RE.findall(text))
    n_digit = len(DIGIT_RE.findall(text))
    sw = STOPWORDS["en"]
    stop_ratio = sum(1 for w in ws if w in sw) / n_words if n_words else 0.0
    return {
        "n_chars": float(n_chars),
        "n_words": float(n_words),
        "mean_word_len": mean_word_len,
        "unique_word_ratio": uniq_ratio,
        "punct_ratio": n_punct / max(1, n_chars),
        "digit_ratio": n_digit / max(1, n_chars),
        "stopword_ratio": stop_ratio,
    }


def quality_score(text: str) -> float:
    """Scalar [0,1] quality score from :func:`quality_features`."""
    f = quality_features(text)
    score = 1.0
    if f["n_words"] < 5:
        score *= 0.2
    if f["mean_word_len"] < 2 or f["mean_word_len"] > 12:
        score *= 0.5
    if f["unique_word_ratio"] < 0.3:
        score *= 0.5
    if f["punct_ratio"] > 0.2:
        score *= 0.5
    if f["digit_ratio"] > 0.3:
        score *= 0.5
    return score


# ------------------------------------------------ char-bigram language model

_LM_V = 28  # a-z (0-25), space (26), other (27)


def _char_codes(texts) -> tuple[np.ndarray, np.ndarray]:
    """Map a batch of texts to one concatenated lowercase code array
    plus per-doc lengths — single pass, no per-character Python.
    Codes: a-z -> 0..25, whitespace -> 26, everything else -> 27."""
    joined = "\x00".join(t if isinstance(t, str) else "" for t in texts)
    b = np.frombuffer(joined.encode("utf-8", "replace"), dtype=np.uint8)
    # utf-8 continuation bytes land in "other" — fine for a 28-bucket LM
    code = np.full(len(b), 27, dtype=np.int64)
    lower = (b >= 97) & (b <= 122)
    upper = (b >= 65) & (b <= 90)
    code[lower] = b[lower] - 97
    code[upper] = b[upper] - 65
    code[(b == 32) | (b == 9) | (b == 10) | (b == 13)] = 26
    sep = b == 0
    # per-doc byte lengths from separator positions
    pos = np.flatnonzero(sep)
    starts = np.concatenate([[0], pos + 1])
    ends = np.concatenate([pos, [len(b)]])
    keep = ~sep
    # doc lengths in KEPT bytes
    lens = ends - starts
    return code[keep], lens


def char_bigram_counts(texts) -> np.ndarray:
    """[28, 28] bigram count matrix over a batch of texts (pairs never
    cross document boundaries)."""
    code, lens = _char_codes(texts)
    counts = np.zeros((_LM_V, _LM_V), dtype=np.int64)
    if len(code) < 2:
        return counts
    a, b2 = code[:-1], code[1:]
    # boundary pairs: last char of doc i with first of doc i+1
    boundary = np.zeros(len(a), dtype=bool)
    cum = np.cumsum(lens)[:-1]
    boundary[cum[(cum > 0) & (cum <= len(a))] - 1] = True
    m = ~boundary
    np.add.at(counts, (a[m], b2[m]), 1)
    return counts


def char_bigram_logprob(counts: np.ndarray, k: float = 0.5) -> np.ndarray:
    """Add-k-smoothed conditional log-probabilities
    ``log P(c2 | c1)`` from a bigram count matrix."""
    c = counts.astype(np.float64) + k
    return np.log(c / c.sum(axis=1, keepdims=True))


def char_bigram_nll(texts, logp: np.ndarray) -> np.ndarray:
    """Per-document mean negative log-likelihood under the bigram LM
    (the CCNet-style perplexity proxy, Wenzek et al., LREC 2020) —
    one gather + segmented mean per batch."""
    code, lens = _char_codes(texts)
    n = len(lens)
    out = np.zeros(n, dtype=np.float64)
    if len(code) < 2:
        return out
    a, b2 = code[:-1], code[1:]
    nll_pairs = -logp[a, b2]
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    # per doc: pairs are positions [start, start+len-1) of the pair axis
    # doc ids aligned with the NON-boundary pairs: doc i contributes
    # exactly max(len_i - 1, 0) pairs once boundary pairs are dropped
    for_doc = np.repeat(np.arange(n), np.maximum(lens - 1, 0))
    bmask = np.zeros(len(a), dtype=bool)
    cum = np.cumsum(lens)[:-1]
    bmask[cum[(cum > 0) & (cum <= len(a))] - 1] = True
    vals = nll_pairs[~bmask]
    sums = np.zeros(n)
    np.add.at(sums, for_doc, vals)
    cnt = np.maximum(lens - 1, 0)
    return np.where(cnt > 0, sums / np.maximum(cnt, 1), 0.0)
