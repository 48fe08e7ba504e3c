"""Text-analysis operators for training-data pipelines over a documents
table (doc_id, text, lang, ...). All vectorized per Arrow batch; regexes
and stopword tables are module-level constants (compiled once per worker
process — the stateless-task analogue of actor-pool init state).

These have no reference-repo counterpart (igraph has no string functions,
SURVEY.md §2.10); they are the large-scale-pipeline extensions the task
mandates.
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
_TOKEN_RE = re.compile(r"[A-Za-z]+(?:'[A-Za-z]+)?|[0-9]+|[^\sA-Za-z0-9]")

_STOPWORDS = {
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this", "are",
}

# tiny n-gram language-ID heuristic: characteristic trigrams per language
_LANG_TRIGRAMS = {
    "en": ["the", "ing", "and", "ion", "ent"],
    "de": ["der", "sch", "ein", "ich", "und"],
    "fr": ["les", "ent", "que", "ion", "eur"],
    "es": ["que", "los", "ión", "ado", "nte"],
}


def token_count(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_tokens): whitespace+punctuation tokenization with the
    module token regex."""

    def _f(b: pa.Table) -> pa.Table:
        counts = [len(_TOKEN_RE.findall(t)) for t in b[text_col].to_pylist()]
        return pa.table(
            {"doc_id": b["doc_id"], "n_tokens": pa.array(counts, pa.int64())}
        )

    return docs.map_batches(_f, batch_format="pyarrow", batch_size=None)


def quality_score(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_chars, n_words, punct_ratio, stopword_ratio, score):
    simple length/punctuation/stopword quality heuristics."""

    punct_re = re.compile(r"[^\sA-Za-z0-9]")

    def _f(b: pa.Table) -> pa.Table:
        n_chars, n_words, punct, stopr, score = [], [], [], [], []
        for t in b[text_col].to_pylist():
            words = t.split()
            nw = len(words)
            nc = len(t)
            np_ = len(punct_re.findall(t))
            ns = sum(1 for w in words if w.lower().strip(".,!?;:") in _STOPWORDS)
            pr = np_ / nc if nc else 0.0
            sr = ns / nw if nw else 0.0
            s = 1.0
            if nw < 5 or nw > 100000:
                s *= 0.1
            if pr > 0.3:
                s *= 0.5
            if sr < 0.01:
                s *= 0.7
            n_chars.append(nc)
            n_words.append(nw)
            punct.append(pr)
            stopr.append(sr)
            score.append(s)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
                "punct_ratio": pa.array(punct, pa.float64()),
                "stopword_ratio": pa.array(stopr, pa.float64()),
                "score": pa.array(score, pa.float64()),
            }
        )

    return docs.map_batches(_f, batch_format="pyarrow", batch_size=None)


def language_id(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, lang_pred): n-gram-overlap heuristic language ID."""

    def _f(b: pa.Table) -> pa.Table:
        preds = []
        for t in b[text_col].to_pylist():
            low = t.lower()
            best, best_score = "unknown", 0
            for lang, tris in _LANG_TRIGRAMS.items():
                sc = sum(low.count(tri) for tri in tris)
                if sc > best_score:
                    best, best_score = lang, sc
            preds.append(best)
        return pa.table({"doc_id": b["doc_id"], "lang_pred": pa.array(preds, pa.string())})

    return docs.map_batches(_f, batch_format="pyarrow", batch_size=None)


def fingerprint(docs: ray.data.Dataset, text_col: str = "text", window: int = 8) -> ray.data.Dataset:
    """(doc_id, fingerprint): winnowing-style rolling-hash document
    fingerprint — min md5 over character n-gram windows (deterministic,
    matches an md5-based SQL oracle)."""

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
