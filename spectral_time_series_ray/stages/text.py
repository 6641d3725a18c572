"""Text-analysis stages over the ``documents`` table.

``TextAnalyzer`` is an actor-pool stage: regexes / stopword tables are
built once per actor (``__init__``), batches stream through
``__call__`` (SURVEY.md §2.4 actor-pool pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import textstats
from ..functions.hashing import fnv1a_u64, simhash64, winnow_fingerprint


class TextAnalyzer:
    """Per-doc features: token counts, language-ID, quality score."""

    def __init__(self, features: tuple[str, ...] = ("tokens", "lang", "quality")):
        # touching the module-level compiled regexes here pins them into
        # the actor before the first batch
        self.features = features
        _ = textstats.BPE_RE.pattern

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].tolist()
        out = batch.copy()
        if "tokens" in self.features:
            out["ws_tokens"] = [textstats.whitespace_token_count(t) for t in texts]
            out["bpe_tokens"] = [textstats.bpe_token_count(t) for t in texts]
        if "lang" in self.features:
            out["lang_pred"] = [textstats.detect_language(t) for t in texts]
        if "quality" in self.features:
            out["quality"] = [textstats.quality_score(t) for t in texts]
        return out


class Fingerprinter:
    """Winnowing fingerprints + SimHash per document."""

    def __init__(self, k: int = 5, window: int = 4):
        self.k = k
        self.window = window

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        fps, shs = [], []
        for t in batch["text"]:
            toks = t.split()
            fps.append(winnow_fingerprint(toks, self.k, self.window).astype(np.int64))
            shs.append(np.int64(np.uint64(simhash64(fnv1a_u64(toks))).astype(np.int64)))
        out["fingerprint"] = fps
        out["simhash"] = shs
        return out


def analyze_documents(ds, features=("tokens", "lang", "quality"), concurrency: int = 4):
    return ds.map_batches(
        TextAnalyzer,
        fn_constructor_kwargs={"features": tuple(features)},
        batch_format="pandas",
        batch_size=1024,
        concurrency=concurrency,
    )


def fingerprint_documents(ds, concurrency: int = 4):
    return ds.map_batches(
        Fingerprinter, batch_format="pandas", batch_size=1024, concurrency=concurrency
    )
