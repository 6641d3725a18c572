"""Text-analysis stages over the ``documents`` table.

``TextAnalyzer`` is an actor-pool stage: regexes / stopword tables are
built once per actor (``__init__``), batches stream through
``__call__`` (SURVEY.md §2.4 actor-pool pattern).
"""

from __future__ import annotations

import re

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


def term_frequencies(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Explode documents into (id, term, tf) rows — one row per
    DISTINCT term per doc (whitespace tokenization). The building
    block for TF-IDF, inverted indexes and repeated-term analysis;
    each batch shrinks to its per-doc term histogram before leaving
    the task."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids, terms, tfs = [], [], []
        for i, t in zip(batch[id_col], batch[text_col]):
            toks = [w for w in t.split(" ") if w]
            if not toks:
                continue
            uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
            ids.extend([i] * len(uniq))
            terms.extend(uniq.tolist())
            tfs.extend(counts.tolist())
        if not ids:
            # TYPED empty: an all-blank batch must still contribute the
            # exact (id dtype, string, int64) schema — a null/object
            # empty block poisons the downstream hash join on "term"
            return pd.DataFrame({
                id_col: batch[id_col].iloc[:0],
                "term": pd.Series([], dtype=object),
                "tf": pd.Series([], dtype=np.int64),
            })
        return pd.DataFrame(
            {id_col: ids, "term": terms, "tf": np.asarray(tfs, dtype=np.int64)}
        )

    return ds.map_batches(explode, batch_format="pandas", batch_size=1024)


def tfidf_top_term(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document top TF-IDF term (score = tf * ln(N/df), ties by
    lexicographically-smallest term).

    Fully distributed: exploded (doc, term, tf) rows; document
    frequencies from a groupby over those SAME rows (each is distinct
    per (doc, term), so count == df); a hash-shuffle ``Dataset.join``
    on term; per-doc argmax via groupby. Two shuffles total, both on
    fixed-width rows — no vocabulary broadcast, so an unbounded term
    domain is fine at corpus scale."""
    from ray.data.aggregate import Count

    from ..pipelines.queries import _join_partitions

    n_docs = ds.count()
    tf = term_frequencies(ds, id_col=id_col, text_col=text_col)
    # normalize to Arrow blocks before the hash-shuffle join
    tf = tf.map_batches(lambda t: t, batch_format="pyarrow", batch_size=None)
    df = tf.groupby("term").aggregate(Count(alias_name="df"))
    joined = tf.join(
        df, join_type="inner", num_partitions=_join_partitions(), on=("term",)
    )

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["score"] = batch["tf"].to_numpy(dtype=np.float64) * np.log(
            float(n_docs) / batch["df"].to_numpy(dtype=np.float64)
        )
        return batch[[id_col, "term", "score"]]

    scored = joined.map_batches(score, batch_format="pandas", batch_size=None)

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "term"], ascending=[False, True], kind="stable")
        return pd.DataFrame(
            {
                id_col: [g[id_col].iloc[0]],
                "top_term": [g["term"].iloc[0]],
                "score": [float(g["score"].iloc[0])],
            }
        )

    return scored.groupby(id_col).map_groups(best, batch_format="pandas")


class DocumentChunker:
    """Split documents into fixed-size token windows with overlap —
    the standard pre-training chunking step (context-length packing
    feeds from these). Actor-pool stage: the token pattern compiles
    once per actor; each batch flat-maps docs -> chunk rows.

    Chunk i covers tokens ``[i*(max_tokens-overlap), ... +max_tokens)``
    of the whitespace token stream; chunk text is sliced on ORIGINAL
    character offsets so whitespace inside a chunk is preserved
    verbatim (chunks re-join losslessly modulo the overlap — the
    self-check invariant)."""

    def __init__(self, max_tokens: int = 64, overlap: int = 8):
        import re

        if not 0 <= overlap < max_tokens:
            raise ValueError("need 0 <= overlap < max_tokens")
        self.max_tokens = max_tokens
        self.overlap = overlap
        self.tok_re = re.compile(r"\S+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        stride = self.max_tokens - self.overlap
        doc_ids, chunk_idx, n_chunks, texts, n_toks = [], [], [], [], []
        for did, text in zip(batch["doc_id"], batch["text"]):
            spans = [m.span() for m in self.tok_re.finditer(text)]
            if not spans:
                doc_ids.append(did); chunk_idx.append(0); n_chunks.append(1)
                texts.append(""); n_toks.append(0)
                continue
            starts = list(range(0, len(spans), stride))
            # drop a trailing window fully contained in the previous one
            while len(starts) > 1 and starts[-1] + self.overlap >= len(spans):
                starts.pop()
            for ci, s in enumerate(starts):
                e = min(s + self.max_tokens, len(spans))
                doc_ids.append(did)
                chunk_idx.append(ci)
                n_chunks.append(len(starts))
                texts.append(text[spans[s][0]:spans[e - 1][1]])
                n_toks.append(e - s)
        return pd.DataFrame(
            {
                "doc_id": np.asarray(doc_ids, dtype=np.int64),
                "chunk_idx": np.asarray(chunk_idx, dtype=np.int64),
                "n_chunks": np.asarray(n_chunks, dtype=np.int64),
                "chunk_text": texts,
                "n_tokens": np.asarray(n_toks, dtype=np.int64),
            }
        )


def chunk_documents(ds, max_tokens: int = 64, overlap: int = 8, concurrency: int = 4):
    """documents -> one row per chunk (doc_id, chunk_idx, n_chunks,
    chunk_text, n_tokens)."""
    return ds.map_batches(
        DocumentChunker,
        fn_constructor_kwargs={"max_tokens": max_tokens, "overlap": overlap},
        batch_format="pandas",
        batch_size=1024,
        concurrency=concurrency,
    )


# (pattern, replacement) pairs compiled once per actor. Deliberately
# simple, deterministic patterns — the operator under test is the
# scrub pipeline, not pattern recall.
REDACTION_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # (?<!\w) not \b: a leading "(" has non-word chars on both sides,
    # so \b can never match there
    (r"(?<!\w)(?:\+?\d{1,2}[ -])?(?:\(\d{3}\)|\d{3})[ -]\d{3}[ -]\d{4}\b", "<PHONE>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
)


class Redactor:
    """PII-style regex scrubbing: replace every pattern match with its
    tag, count replacements per category. Patterns compile once per
    actor; per-batch work is C-regex over each doc."""

    def __init__(self, patterns=REDACTION_PATTERNS):
        import re

        self.compiled = [(re.compile(p), tag) for p, tag in patterns]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        texts = batch["text"].tolist()
        counts = np.zeros((len(texts), len(self.compiled)), dtype=np.int64)
        for j, (rx, tag) in enumerate(self.compiled):
            for i, t in enumerate(texts):
                texts[i], counts[i, j] = rx.subn(tag, t)
        out["text"] = texts
        for j, (_, tag) in enumerate(self.compiled):
            out[f"n_{tag[1:-1].lower()}"] = counts[:, j]
        return out


def redact_documents(ds, patterns=REDACTION_PATTERNS, concurrency: int = 4):
    """documents -> same rows with ``text`` scrubbed + per-category
    replacement counts (n_email, n_phone, n_ip, n_ssn)."""
    return ds.map_batches(
        Redactor,
        fn_constructor_kwargs={"patterns": patterns},
        batch_format="pandas",
        batch_size=1024,
        concurrency=concurrency,
    )


def train_char_lm(ds, text_col: str = "text") -> np.ndarray:
    """Fit the corpus-wide char-bigram language model: each block emits
    ONE flattened [28*28] count vector (mergeable partial — the model
    domain is FIXED-SIZE, so the 'model' never grows with the corpus),
    partials merge in one tiny aggregation. At 100 TB the driver sees
    6 KB per block, never text. Returns the smoothed log-prob matrix.

    CCNet-style quality modeling (Wenzek et al., LREC 2020) with the
    KenLM scorer replaced by an in-corpus bigram model (no external
    model artifacts in this environment).
    """
    from ..functions.textstats import char_bigram_counts, char_bigram_logprob

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = char_bigram_counts(batch[text_col].tolist())
        return pd.DataFrame({"counts": [c.ravel()]})

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=4096).to_pandas()
    total = np.sum(np.stack(parts["counts"].to_numpy()), axis=0).reshape(28, 28)
    return char_bigram_logprob(total)


class LMScorer:
    """Actor: log-prob matrix fetched from the object store once;
    per-batch scoring is one code-pair gather + segmented mean."""

    def __init__(self, logp_ref, text_col: str):
        import ray

        self.logp = ray.get(logp_ref)
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.textstats import char_bigram_nll

        out = batch.copy()
        out["lm_nll"] = char_bigram_nll(batch[self.text_col].tolist(), self.logp)
        return out


def lm_quality_score(ds, logp: np.ndarray, text_col: str = "text", concurrency: int = 4):
    """Add a ``lm_nll`` column: mean negative log-likelihood per doc
    under the (broadcast) bigram LM — low = natural under the corpus
    distribution, high = gibberish/outlier."""
    import ray

    logp_ref = ray.put(np.asarray(logp, dtype=np.float64))
    return ds.map_batches(
        LMScorer,
        fn_constructor_args=(logp_ref, text_col),
        batch_format="pandas",
        batch_size=2048,
        concurrency=concurrency,
    )


def lm_quality_filter(ds, logp: np.ndarray, max_nll: float, text_col: str = "text",
                      concurrency: int = 4):
    """Keep only documents scoring at or below ``max_nll`` (the
    perplexity-filter step of a pre-training data pipeline)."""
    scored = lm_quality_score(ds, logp, text_col, concurrency)
    return scored.filter(expr=f"lm_nll <= {float(max_nll)!r}")


def _explode_word_grams(ds, id_col: str, text_col: str, n: int, extra_cols=()):
    """(id, gram) rows — per-document DISTINCT word n-grams as strings.

    Joining on the gram STRING keeps the operator exactly
    SQL-mirrorable (no hash-collision caveat); at larger corpus sizes
    swap the join key for the 128-bit shingle hash pair
    (`functions.hashing.shingle_hashes` style) — same plan shape,
    fixed-width exchange.
    """
    import pandas as pd

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids, grams, extras = [], [], {c: [] for c in extra_cols}
        extra_vals = [batch[c].to_numpy() for c in extra_cols]
        for j, (d, t) in enumerate(
            zip(batch[id_col].to_numpy(), batch[text_col].to_numpy())
        ):
            toks = [w for w in t.split(" ") if w]
            if len(toks) < n:
                continue
            gs = sorted({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})
            ids.extend([d] * len(gs))
            grams.extend(gs)
            for c, vals in zip(extra_cols, extra_vals):
                extras[c].extend([vals[j]] * len(gs))
        import pyarrow as pa

        # explicit Arrow types: an empty batch must still contribute the
        # exact (int64, string, ...) schema or downstream hash joins see
        # a null-typed column
        cols = {
            id_col: pa.array(np.asarray(ids, dtype=np.int64), type=pa.int64()),
            "g": pa.array(grams, type=pa.string()),
        }
        for c, v in extras.items():
            cols[c] = pa.array(v)
        if extra_cols and len(ids) == 0:
            for c in extra_cols:
                # type from the SOURCE column's (zero-row) values, not a
                # hardcoded bool — a string/int extra column would
                # otherwise emit bool-typed empties that break Arrow
                # schema unification across blocks
                cols[c] = pa.Array.from_pandas(batch[c].iloc[:0])
        return pa.table(cols)

    return ds.map_batches(explode, batch_format="pandas")


def benchmark_contamination(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_flag: str = "_is_bench",
    n: int = 5,
):
    """Benchmark decontamination scan (the n-gram-overlap test-set
    leakage check of Brown et al., GPT-3 appendix C / Gao et al., Pile):
    given a corpus where ``bench_flag`` marks held-out benchmark
    documents, report every TRAINING document that shares at least one
    word ``n``-gram with any benchmark document, with the count of
    distinct shared grams.

    Distributed shape: one explode pass emits per-doc DISTINCT grams
    (text never re-ships after tokenize), benchmark grams collapse to a
    distinct gram set via groupby, and a gram-keyed hash join + per-doc
    count finds the hits.  No driver-side gram sets: the benchmark side
    is a Dataset end to end, so it may be arbitrarily large.

    Returns a Dataset of (id_col, n_shared_grams:int64).
    """
    from ray.data.aggregate import Count

    from ..pipelines.queries import _join_partitions

    from .join import bloom_semi_filter, build_bloom

    grams = _explode_word_grams(ds, id_col, text_col, n, extra_cols=(bench_flag,))
    bench_grams = (
        gram_counts(grams.filter(expr=f"{bench_flag} == True").select_columns(["g"]))
        .select_columns(["g"])
        .materialize()  # small side (benchmark grams), reused twice below
    )
    train_grams = grams.filter(expr=f"{bench_flag} == False").select_columns(
        [id_col, "g"]
    )
    # Bloom pushdown: the overwhelming majority of training grams hit
    # no benchmark gram; dropping them BEFORE the string-keyed shuffle
    # cuts the exchange to (false-positive rate x corpus + true hits).
    # False positives are removed by the exact membership test below.
    bloom = build_bloom(bench_grams, "g")
    train_grams = bloom_semi_filter(train_grams, "g", bloom)

    # exact semi-join via the partition-merge idiom (one int-keyed
    # gram-hash exchange, pandas membership test per partition) rather
    # than Dataset.join: Ray 2.49's hash-shuffle join intermittently
    # loses the schema when a side's partitions are near-empty — which
    # the Bloom-filtered side IS at small scales
    from ray.data.aggregate import Sum

    from .rollup import partitions_for_input

    P = partitions_for_input(None)

    def tag(side: str):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            if id_col not in batch.columns:
                batch[id_col] = np.int64(-1)
            batch["_side"] = side
            batch["_part"] = (
                pd.util.hash_pandas_object(batch["g"], index=False).to_numpy() % P
            ).astype(np.int32)
            return batch[[id_col, "g", "_side", "_part"]]

        return f

    both = train_grams.map_batches(
        tag("t"), batch_format="pandas", batch_size=None
    ).union(bench_grams.map_batches(tag("b"), batch_format="pandas", batch_size=None))

    def hit_counts(g: pd.DataFrame) -> pd.DataFrame:
        bench_set = g.loc[g["_side"] == "b", "g"]
        train = g[g["_side"] == "t"]
        m = train["g"].isin(set(bench_set))
        out = (
            train.loc[m, [id_col]]
            .groupby(id_col, as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    partials = both.groupby("_part").map_groups(hit_counts, batch_format="pandas")
    out = partials.groupby(id_col).aggregate(Sum("n", alias_name="n_shared_grams"))

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_shared_grams"] = batch["n_shared_grams"].astype(np.int64)
        return batch

    return out.map_batches(cast, batch_format="pandas", batch_size=None)


class RegexExtractor:
    """Actor-pool regex extraction: pattern compiled once per actor
    (``__init__``), applied per batch.  Emits per-document match count
    and first match — the structured-field-extraction step of a data
    pipeline (log parsing, citation mining), SQL-mirrorable via
    regexp_extract/regexp_extract_all."""

    def __init__(self, pattern: str, text_col: str = "text", id_col: str = "doc_id"):
        import re

        self.rx = re.compile(pattern)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        finditer = self.rx.finditer
        n = np.empty(len(batch), dtype=np.int64)
        first = []
        for i, t in enumerate(batch[self.text_col].to_numpy()):
            cnt = 0
            f = ""
            for m in finditer(t):
                if cnt == 0:
                    f = m.group(0)
                cnt += 1
            n[i] = cnt
            first.append(f)
        return pd.DataFrame(
            {self.id_col: batch[self.id_col].to_numpy(), "n_matches": n,
             "first_match": first}
        )


def extract_regex(ds, pattern: str, text_col: str = "text", id_col: str = "doc_id",
                  concurrency: int = 4):
    """Extract ``pattern`` matches per document via a RegexExtractor
    actor pool; rows with zero matches are dropped."""
    out = ds.map_batches(
        RegexExtractor,
        fn_constructor_args=(pattern, text_col, id_col),
        batch_format="pandas",
        concurrency=concurrency,
    )
    return out.filter(expr="n_matches > 0")


def word_frequencies(ds, text_col: str = "text"):
    """Corpus word histogram: per-batch Counter partials collapse each
    batch to its distinct words before the shuffle; one (word, count)
    groupby merges them.  The output is vocabulary-bounded — BPE
    training needs nothing larger (Sennrich et al. 2016: the merge
    statistics are a function of the word histogram alone)."""
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for t in batch[text_col].to_numpy():
            c.update(w for w in t.split(" ") if w)
        return pd.DataFrame(
            {"word": list(c.keys()),
             "n": np.fromiter(c.values(), dtype=np.int64, count=len(c))}
        )

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=None)
    out = parts.groupby("word").aggregate(Sum("n", alias_name="n"))

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        batch["n"] = batch["n"].astype(np.int64)
        return batch

    return out.map_batches(cast, batch_format="pandas", batch_size=None)


class BPETokenizer:
    """Actor-pool BPE tokenization: merge ranks are built once per
    actor from the broadcast merge list (``__init__``); per batch every
    document's words encode through the rank table with an in-actor
    word->encoding cache (Zipf makes the cache hit rate high)."""

    def __init__(self, merges_ref, text_col: str = "text"):
        import ray

        from ..functions.bpe import bpe_encode_word

        merges = ray.get(merges_ref)
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.text_col = text_col
        self._encode = bpe_encode_word
        self._cache: dict[str, int] = {}

    def _count(self, word: str) -> int:
        n = self._cache.get(word)
        if n is None:
            n = len(self._encode(word, self.ranks))
            self._cache[word] = n
        return n

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        counts = np.empty(len(batch), dtype=np.int64)
        for i, t in enumerate(batch[self.text_col].to_numpy()):
            counts[i] = sum(self._count(w) for w in t.split(" ") if w)
        out = batch.drop(columns=[self.text_col])
        out["n_bpe_tokens"] = counts
        return out


def train_bpe(ds, n_merges: int = 64, text_col: str = "text"):
    """Distributed BPE training: ONE word-count shuffle (vocabulary-
    bounded), then the deterministic merge loop on the histogram.
    Returns (merges, word_freq_df)."""
    from ..functions.bpe import bpe_train

    wf = word_frequencies(ds, text_col=text_col).to_pandas()  # |vocab| rows
    merges = bpe_train(dict(zip(wf["word"], wf["n"])), n_merges=n_merges)
    return merges, wf


def bpe_tokenize(ds, merges, text_col: str = "text", concurrency: int = 4):
    """Apply trained merges corpus-wide via a broadcast actor pool."""
    import ray

    ref = ray.put([tuple(m) for m in merges])
    return ds.map_batches(
        BPETokenizer,
        fn_constructor_args=(ref, text_col),
        batch_format="pandas",
        batch_size=512,
        concurrency=concurrency,
    )


def gram_counts(grams_ds, gram_col: str = "g", min_count: int | None = None,
                num_partitions: int | None = None):
    """(gram, count) aggregation that never puts STRING keys through a
    Ray range-partition sort (measured ~10x slower than an int-keyed
    exchange at identical row counts): rows are tagged with
    hash(gram) % P, one int-keyed shuffle groups them, and a pandas
    groupby inside each partition produces the counts.  With
    ``min_count`` the partition pass also filters, so only surviving
    grams leave the task."""
    from ..stages.rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_part"] = (
            pd.util.hash_pandas_object(batch[gram_col], index=False).to_numpy() % P
        ).astype(np.int32)
        return batch

    tagged = grams_ds.map_batches(add_part, batch_format="pandas", batch_size=None)

    import pyarrow as pa

    def count_part(df: pd.DataFrame):
        out = df.groupby(gram_col, as_index=False).size().rename(columns={"size": "n"})
        if min_count is not None:
            out = out[out["n"] >= min_count]
        # explicit Arrow types: an empty partition's pandas frame would
        # otherwise contribute an object-typed column and poison the
        # unified schema of downstream joins
        return pa.table(
            {
                gram_col: pa.array(out[gram_col].tolist(), type=pa.string()),
                "n": pa.array(out["n"].to_numpy(dtype=np.int64), type=pa.int64()),
            }
        )

    return tagged.groupby("_part").map_groups(count_part, batch_format="pandas")


class JsonExtractor:
    """Actor-pool semi-structured extraction: parse a JSON string
    column and project typed fields.  The parser and field list bind
    once per actor; per batch the loop is the unavoidable per-document
    parse (JSON has no columnar kernel), so keep the projected fields
    narrow and drop the raw column immediately after extraction."""

    def __init__(self, json_col: str, fields: tuple[str, ...]):
        import json

        self.json_col = json_col
        self.fields = fields
        self._loads = json.loads

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        loads = self._loads
        cols: dict[str, list] = {f: [] for f in self.fields}
        for s in batch[self.json_col].to_numpy():
            try:
                obj = loads(s)
            except (TypeError, ValueError):
                obj = {}
            for f in self.fields:
                cols[f].append(obj.get(f))
        out = batch.drop(columns=[self.json_col])
        for f in self.fields:
            out[f"j_{f}"] = cols[f]
        return out


def extract_json_fields(ds, json_col: str, fields, concurrency: int = 4):
    """Project JSON fields out of a string column via an actor pool."""
    return ds.map_batches(
        JsonExtractor,
        fn_constructor_args=(json_col, tuple(fields)),
        batch_format="pandas",
        batch_size=2048,
        concurrency=concurrency,
    )


class PhraseMatcher:
    """Multi-pattern phrase matcher (actor pool): all patterns compile
    ONCE per actor in ``__init__``; each batch emits per-phrase
    partial counts, so only a fixed-width (phrase_id, n_docs,
    n_matches) frame leaves the scan. Matching is non-overlapping
    (``re`` semantics, same as counting split parts in SQL).

    A classical Aho-Corasick automaton would make one text pass for
    any number of patterns; with tens of phrases the compiled
    alternation/multi-regex path stays inside CPython's C regex
    engine, which in practice beats a pure-Python AC trie walk by
    orders of magnitude — revisit only if the phrase set grows to
    thousands (then: pyahocorasick or a numpy byte-automaton).
    """

    def __init__(self, phrases: tuple[str, ...], text_col: str = "text"):
        import re

        self.phrases = list(phrases)
        self.res = [re.compile(re.escape(p)) for p in self.phrases]
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].tolist()
        n_docs = np.zeros(len(self.res), np.int64)
        n_matches = np.zeros(len(self.res), np.int64)
        for t in texts:
            for i, rx in enumerate(self.res):
                c = len(rx.findall(t))
                if c:
                    n_docs[i] += 1
                    n_matches[i] += c
        return pd.DataFrame({
            "phrase": self.phrases,
            "n_docs": n_docs,
            "n_matches": n_matches,
        })


def phrase_match_stats(ds, phrases, text_col: str = "text", concurrency: int = 4):
    """Corpus-wide phrase statistics: per phrase, how many documents
    contain it and how many (non-overlapping) occurrences exist.
    One streaming pass; the exchange carries |phrases| rows per block."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        PhraseMatcher,
        fn_constructor_kwargs={"phrases": tuple(phrases), "text_col": text_col},
        batch_format="pandas",
        concurrency=concurrency,
    )
    out = (
        partials.groupby("phrase")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_matches", alias_name="n_matches"))
        .to_pandas()
    )
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_matches"] = out["n_matches"].astype(np.int64)
    return out.sort_values("phrase").reset_index(drop=True)


def bm25_search(
    ds,
    query_terms: tuple[str, ...],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """BM25 ranked retrieval for a fixed query: TWO streaming passes,
    no shuffle. Pass 1 collapses each block to (n_docs, sum_dl, df per
    query term) fixed-width partials; pass 2 scores matching docs with
    the merged global stats and keeps a per-block partial top-k, so
    only O(blocks x k) candidate rows reach the driver. Tokenization
    is a literal single-space split (mirrors SQL ``string_split``).
    Scores are rounded to 6 decimals BEFORE ranking so the ordering is
    reproducible across engines. Returns the top-k (doc_id, score)."""
    import ray

    terms = list(query_terms)
    T = len(terms)

    def stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        dl = 0
        df_counts = np.zeros(T, np.int64)
        for t in batch[text_col]:
            toks = str(t).split(" ")
            dl += len(toks)
            s = set(toks)
            for i, q in enumerate(terms):
                if q in s:
                    df_counts[i] += 1
        out = {"n_docs": [n], "sum_dl": [dl]}
        for i, q in enumerate(terms):
            out[f"df_{i}"] = [int(df_counts[i])]
        return pd.DataFrame(out)

    st = ds.select_columns([text_col]).map_batches(
        stats_partial, batch_format="pandas", batch_size=None
    ).to_pandas().sum()  # O(blocks) fixed-width partials
    N = int(st["n_docs"])
    avgdl = float(st["sum_dl"]) / N
    dfs = np.array([int(st[f"df_{i}"]) for i in range(T)], np.float64)
    idf = np.log(1.0 + (N - dfs + 0.5) / (dfs + 0.5))
    idf_ref = ray.put(idf)

    def score_partial(batch: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        idf_ = _ray.get(idf_ref)
        ids, scores = [], []
        for did, t in zip(batch[id_col], batch[text_col]):
            toks = str(t).split(" ")
            dl = len(toks)
            sc = 0.0
            hit = False
            for i, q in enumerate(terms):
                tf = toks.count(q)
                if tf:
                    hit = True
                    sc += idf_[i] * (tf * (k1 + 1)) / (
                        tf + k1 * (1 - b + b * dl / avgdl))
            if hit:
                ids.append(did)
                scores.append(sc)
        out = pd.DataFrame({id_col: ids, "score": np.asarray(scores, np.float64)})
        out["score"] = np.round(out["score"] * 1e6) / 1e6
        return out.sort_values(
            ["score", id_col], ascending=[False, True]).head(k)

    cand = ds.select_columns([id_col, text_col]).map_batches(
        score_partial, batch_format="pandas", batch_size=None
    ).to_pandas()  # O(blocks x k)
    return cand.sort_values(["score", id_col], ascending=[False, True]).head(
        k).reset_index(drop=True)


# Gopher rule-set stopword probe (Rae et al. 2021, Table A1: a doc must
# contain >=2 of a small closed set of English function words). The
# canonical 8 plus 'a'/'in' so the rule discriminates on this corpus.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with", "a", "in",
)


class GopherRules:
    """Per-doc Gopher/C4-style quality rule features (Rae et al. 2021
    appendix A; Raffel et al. 2020 §2.2), word-level only — the corpus
    has no line structure. One pass per doc over the whitespace token
    stream: counts, mean word length, alphabetic-word fraction,
    stopword hits, duplicate-word fraction and modal-word fraction
    (the word-level analogue of Gopher's duplicate-line / most-common-
    word repetition rules). ``pass`` applies fixed thresholds chosen to
    discriminate on this corpus; each threshold is a constructor arg."""

    def __init__(
        self,
        text_col: str = "text",
        min_words: int = 30,
        max_words: int = 100_000,
        min_mean_word_len: float = 3.0,
        max_mean_word_len: float = 5.0,
        min_frac_alpha: float = 0.8,
        min_stop: int = 2,
        max_frac_dup_words: float = 0.6,
        max_top_word_frac: float = 0.2,
    ):
        self.text_col = text_col
        self.th = (min_words, max_words, min_mean_word_len,
                   max_mean_word_len, min_frac_alpha, min_stop,
                   max_frac_dup_words, max_top_word_frac)
        self.alpha_re = re.compile(r"[a-z]")
        self.stop = frozenset(GOPHER_STOPWORDS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        (min_w, max_w, min_mwl, max_mwl, min_fa, min_st, max_fd,
         max_tw) = self.th
        n_words, mwl, fa, n_stop, fdup, topf = [], [], [], [], [], []
        for t in batch[self.text_col]:
            ws = np.array([w.lower() for w in str(t).split()], dtype=object)
            n = len(ws)
            if n == 0:
                n_words.append(0); mwl.append(0.0); fa.append(0.0)
                n_stop.append(0); fdup.append(0.0); topf.append(0.0)
                continue
            lens = np.fromiter((len(w) for w in ws), np.int64, count=n)
            uniq, cnt = np.unique(ws, return_counts=True)
            n_words.append(n)
            mwl.append(float(lens.sum()) / n)
            fa.append(
                sum(int(c) for u, c in zip(uniq, cnt)
                    if self.alpha_re.search(u)) / n)
            n_stop.append(sum(1 for u in uniq if u in self.stop))
            fdup.append(1.0 - len(uniq) / n)
            topf.append(float(cnt.max()) / n)
        out = pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "n_words": np.asarray(n_words, np.int64),
            "mean_word_len": np.asarray(mwl, np.float64),
            "frac_alpha": np.asarray(fa, np.float64),
            "n_stop": np.asarray(n_stop, np.int64),
            "frac_dup_words": np.asarray(fdup, np.float64),
            "top_word_frac": np.asarray(topf, np.float64),
        })
        out["pass"] = (
            (out.n_words >= min_w) & (out.n_words <= max_w)
            & (out.mean_word_len >= min_mwl) & (out.mean_word_len <= max_mwl)
            & (out.frac_alpha >= min_fa) & (out.n_stop >= min_st)
            & (out.frac_dup_words <= max_fd) & (out.top_word_frac <= max_tw)
        )
        return out


def gopher_quality(ds, text_col: str = "text", concurrency: int = 4, **thresholds):
    """Gopher rule features + pass flag per document (actor pool; regex
    and stopword set pinned once per actor)."""
    return ds.map_batches(
        GopherRules,
        fn_constructor_kwargs={"text_col": text_col, **thresholds},
        batch_format="pandas",
        concurrency=concurrency,
        batch_size=512,
    )
