"""Text-analysis operators for training-data pipelines over a documents
table (doc_id, text, lang, ...). All hot paths run on pyarrow.compute
string/regex kernels (RE2) — zero per-row Python in token counting,
quality scoring and language ID; only the rolling-md5 fingerprint keeps a
Python loop (no Arrow kernel exists for incremental md5).

These have no reference-repo counterpart (igraph has no string functions,
SURVEY.md §2.10); they are the large-scale-pipeline extensions the task
mandates. Output values are bit-identical to the original per-row Python
implementations (cross-checked against the DuckDB oracles), the regexes
avoid constructs RE2 lacks (no lookaround).
"""

from __future__ import annotations

import hashlib
import re
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# BPE-ish word/token regex: words with internal apostrophes, numbers,
# or single non-space symbols
_TOKEN_PATTERN = r"[A-Za-z]+(?:'[A-Za-z]+)?|[0-9]+|[^\sA-Za-z0-9]"
_TOKEN_RE = re.compile(_TOKEN_PATTERN)

_STOPWORDS = {
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this", "are",
}

# token-anchored stopword pattern over space-isolated text (see
# quality_score): replicates `word.lower().strip(".,!?;:") in _STOPWORDS`
# without lookaround — each token is wrapped in its own spaces, so the
# leading/trailing " " anchors never overlap between adjacent tokens
_STOPWORD_PATTERN = (
    " [.,!?;:]*(?:" + "|".join(sorted(_STOPWORDS, key=len, reverse=True))
    + ")[.,!?;:]* "
)

# tiny n-gram language-ID heuristic: characteristic trigrams per language
_LANG_TRIGRAMS = {
    "en": ["the", "ing", "and", "ion", "ent"],
    "de": ["der", "sch", "ein", "ich", "und"],
    "fr": ["les", "ent", "que", "ion", "eur"],
    "es": ["que", "los", "ión", "ado", "nte"],
}


def token_count(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_tokens): whitespace+punctuation tokenization with the
    module token regex — one ``count_substring_regex`` kernel per batch."""

    def _f(b: pa.Table) -> pa.Table:
        counts = pc.count_substring_regex(b[text_col], _TOKEN_PATTERN)
        return pa.table(
            {"doc_id": b["doc_id"], "n_tokens": pc.cast(counts, pa.int64())}
        )

    return docs.map_batches(_f, batch_format="pyarrow", batch_size=None)


def quality_score(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_chars, n_words, punct_ratio, stopword_ratio, score):
    simple length/punctuation/stopword quality heuristics, fully on Arrow
    kernels. Stopword counting works on a space-isolated copy of the text
    (every whitespace run doubled) so the token-boundary anchors of
    ``_STOPWORD_PATTERN`` never have to share a space between adjacent
    stopwords — RE2 has no lookaround to do this in place."""

    def _f(b: pa.Table) -> pa.Table:
        txt = b[text_col]
        n_chars = pc.cast(pc.utf8_length(txt), pa.int64())
        n_words = pc.cast(pc.count_substring_regex(txt, r"\S+"), pa.int64())
        n_punct = pc.count_substring_regex(txt, r"[^\sA-Za-z0-9]")
        iso = pc.binary_join_element_wise(
            pa.array([" "] * b.num_rows),
            pc.replace_substring_regex(pc.utf8_lower(txt), r"\s+", "  "),
            pa.array([" "] * b.num_rows),
            "",
        )
        n_stop = pc.count_substring_regex(iso, _STOPWORD_PATTERN)

        nc = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
        nw = n_words.to_numpy(zero_copy_only=False).astype(np.float64)
        npu = n_punct.to_numpy(zero_copy_only=False).astype(np.float64)
        ns = n_stop.to_numpy(zero_copy_only=False).astype(np.float64)
        pr = np.divide(npu, nc, out=np.zeros_like(npu), where=nc > 0)
        sr = np.divide(ns, nw, out=np.zeros_like(ns), where=nw > 0)
        score = np.ones(len(nc))
        score[(nw < 5) | (nw > 100000)] *= 0.1
        score[pr > 0.3] *= 0.5
        score[sr < 0.01] *= 0.7
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_chars": n_chars,
                "n_words": n_words,
                "punct_ratio": pa.array(pr, pa.float64()),
                "stopword_ratio": pa.array(sr, pa.float64()),
                "score": pa.array(score, pa.float64()),
            }
        )

    return docs.map_batches(_f, batch_format="pyarrow", batch_size=None)


def language_id(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, lang_pred): n-gram-overlap heuristic language ID — one
    ``count_substring`` kernel per characteristic trigram, argmax in
    numpy (ties → first language in table order, 0 → "unknown")."""
    langs = list(_LANG_TRIGRAMS)

    def _f(b: pa.Table) -> pa.Table:
        low = pc.utf8_lower(b[text_col])
        scores = np.zeros((b.num_rows, len(langs)), dtype=np.int64)
        for li, lang in enumerate(langs):
            for tri in _LANG_TRIGRAMS[lang]:
                scores[:, li] += (
                    pc.count_substring(low, tri)
                    .to_numpy(zero_copy_only=False)
                )
        best = np.argmax(scores, axis=1)  # first max wins, as dict order
        preds = np.array(langs, dtype=object)[best]
        preds[scores.max(axis=1) == 0] = "unknown"
        return pa.table(
            {"doc_id": b["doc_id"], "lang_pred": pa.array(list(preds), pa.string())}
        )

    return docs.map_batches(_f, batch_format="pyarrow", batch_size=None)


def fingerprint(docs: ray.data.Dataset, text_col: str = "text", window: int = 8) -> ray.data.Dataset:
    """(doc_id, fingerprint): winnowing-style rolling-hash document
    fingerprint — min md5 over character n-gram windows (deterministic,
    matches an md5-based SQL oracle). The per-window md5 loop has no Arrow
    kernel; it stays a Python loop by design."""

    def _f(b: pa.Table) -> pa.Table:
        fps = []
        for t in b[text_col].to_pylist():
            if len(t) < window:
                grams = [t]
            else:
                grams = [t[i : i + window] for i in range(len(t) - window + 1)]
            fps.append(min(hashlib.md5(g.encode()).hexdigest() for g in grams))
        return pa.table({"doc_id": b["doc_id"], "fingerprint": pa.array(fps, pa.string())})

    return docs.map_batches(_f, batch_format="pyarrow", batch_size=None)


_PII_PATTERNS = {
    # RE2 syntax on both sides: pyarrow's count_substring_regex and
    # DuckDB's regexp_extract_all are both RE2, so counts agree exactly
    "n_email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "n_url": r"https?://[^\s]+",
    "n_ip": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_counts(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_email, n_url, n_ip, has_pii): per-document counts of
    the common PII-ish surface patterns a curation pipeline screens for
    (leftmost non-overlapping RE2 matches, one count_substring_regex
    kernel per pattern per batch — zero per-row Python)."""

    def _f(b: pa.Table) -> pa.Table:
        cols = {"doc_id": b["doc_id"]}
        total = np.zeros(b.num_rows, dtype=np.int64)
        for name, pat in _PII_PATTERNS.items():
            c = pc.cast(pc.count_substring_regex(b[text_col], pat), pa.int64())
            cols[name] = c
            total += c.to_numpy(zero_copy_only=False)
        cols["has_pii"] = pa.array((total > 0).astype(np.int64), pa.int64())
        return pa.table(cols)

    return docs.map_batches(_f, batch_format="pyarrow", batch_size=None)


def chunk_documents(
    docs: ray.data.Dataset,
    size_chars: int = 512,
    overlap: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_chunks: bool = False,
) -> ray.data.Dataset:
    """Context-window chunking: split every document into overlapping
    character windows (the training-data tokenize/pack precursor).

    Chunk i of a document covers code points
    [i*step, i*step + size_chars), step = size_chars - overlap; a
    document yields max(1, ceil(max(0, len - size)/step) + 1) chunks,
    so every code point is covered and consecutive chunks share
    ``overlap`` code points. Empty documents yield one empty chunk.

    Vectorized shape: per batch, rows are repeated chunk-count times
    (numpy repeat), then ONE pyarrow utf8_slice_codeunits kernel per
    distinct chunk index slices the whole batch — per-kernel work is
    O(batch), kernel count is the longest document's chunk count, and
    no per-row Python string handling happens anywhere.

    ``hash_chunks=True`` replaces chunk_text with chunk_md5 (compact
    gate/aggregation output).
    """
    if overlap >= size_chars:
        raise ValueError("overlap must be < size_chars")
    step = size_chars - overlap

    def _f(b: pa.Table) -> pa.Table:
        val_field = "chunk_md5" if hash_chunks else "chunk_text"
        if b.num_rows == 0 or text_col not in b.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "chunk_id": pa.array([], pa.int64()),
                             val_field: pa.array([], pa.string())})
        lens = pc.utf8_length(b[text_col]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # integer-exact: 1 + ceil(max(0, len - size)/step)
        n = 1 + (np.maximum(0, lens - size_chars) + step - 1) // step
        rows = np.repeat(np.arange(b.num_rows), n)
        cid = (np.arange(len(rows))
               - np.repeat(np.cumsum(n) - n, n)).astype(np.int64)
        texts = pc.take(b[text_col], pa.array(rows, pa.int64()))
        parts = []
        kmax = int(n.max())
        out = np.empty(len(rows), dtype=object)
        for k in range(kmax):
            sel = cid == k
            if not sel.any():
                continue
            sliced = pc.utf8_slice_codeunits(
                texts.filter(pa.array(sel)),
                start=k * step, stop=k * step + size_chars)
            out[sel] = np.asarray(sliced.to_pylist(), dtype=object)
        if hash_chunks:
            out = np.array([hashlib.md5(t.encode()).hexdigest()
                            for t in out], dtype=object)
        return pa.table({
            id_col: pc.take(b[id_col], pa.array(rows, pa.int64())),
            "chunk_id": pa.array(cid),
            val_field: pa.array(out.tolist(), pa.string())})

    return docs.map_batches(_f, batch_format="pyarrow", batch_size=None)


def token_vocabulary(
    docs: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """(token, token_id) — the corpus vocabulary with dense
    lexicographic ids, the documents-table sibling of
    sources.corpus.build_vocabulary (same dense_rank_map distributed
    zip-with-index; ids contiguous from 0)."""
    from igraph_ray.ops.curation import _token_table
    from igraph_ray.util import dense_rank_map

    def _toks(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or text_col not in b.column_names:
            return pa.table({"token": pa.array([], pa.string())})
        _, toks = _token_table(b, text_col)
        # per-batch dedup before the distinct groupby (combiner)
        return pa.table({"token": pc.unique(toks)})

    t = docs.map_batches(_toks, batch_format="pyarrow", batch_size=None)
    ranked = dense_rank_map(t, "token")

    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "token" not in b.column_names:
            return pa.table({"token": pa.array([], pa.string()),
                             "token_id": pa.array([], pa.int64())})
        return pa.table({"token": b["token"], "token_id": b["rank"]})

    return ranked.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def tokenize_to_ids(
    docs: ray.data.Dataset,
    vocab: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_id: int = -1,
    keep_oov: bool = False,
) -> ray.data.Dataset:
    """(doc_id, pos, token_id) — every document tokenized against the
    vocabulary, the tokenize step of a training pipeline. Tokens flow
    through the shared Arrow kernel chain (ops.curation._token_table),
    positions are 0-based over the kept tokens, and the id lookup is
    ONE hash_join on the token string (broadcast when the vocabulary
    is small, partitioned otherwise). Out-of-vocabulary tokens are
    dropped by default; ``keep_oov=True`` emits them as ``oov_id``."""
    from igraph_ray.ops.curation import _token_table
    from igraph_ray.util import hash_join

    def _toks(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or text_col not in b.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "token": pa.array([], pa.string())})
        row_idx, toks = _token_table(b, text_col)
        n = len(row_idx)
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "token": pa.array([], pa.string())})
        pos = np.arange(n, dtype=np.int64)
        newd = np.r_[True, row_idx[1:] != row_idx[:-1]]
        start = np.maximum.accumulate(np.where(newd, pos, -1))
        return pa.table({
            id_col: pc.take(b[id_col], pa.array(row_idx, pa.int64())),
            "pos": pa.array(pos - start),
            "token": toks})

    t = docs.map_batches(_toks, batch_format="pyarrow", batch_size=None)
    jt = "left_outer" if keep_oov else "inner"
    j = hash_join(t, vocab, on="token", join_type=jt)

    def _out(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or id_col not in b.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "token_id": pa.array([], pa.int64())})
        tid = b["token_id"]
        if keep_oov:
            tid = pc.fill_null(pc.cast(tid, pa.int64()), oov_id)
        return pa.table({id_col: b[id_col], "pos": b["pos"],
                         "token_id": pc.cast(tid, pa.int64())})

    return j.map_batches(_out, batch_format="pyarrow", batch_size=None)
