"""Deduplication operators for training-data pipelines over a documents
table. Exact dedup is hash-partition + per-group first; near-dup families
(MinHash+LSH, SimHash, n-gram Jaccard) follow the standard
shingle → sketch → band-bucket groupby shape, all deterministic (md5-based
word hashing + splitmix64 mixing, no process salt) so runs are
reproducible across cluster sizes AND expressible in the DuckDB oracle SQL
(md5 per word + UHUGEINT mod-2^64 arithmetic — see tests/oracles.py).

Scale notes:
- the only per-string Python work is one md5 per *unique word per batch*
  (memoized); shingling, minhashing, banding and SimHash bit-counting are
  numpy over flat word-hash arrays with per-doc reduceat;
- band buckets are int64 keys range-sorted with explicit boundaries
  (csr.compute_boundaries), so a bucket can never straddle two blocks —
  the cross-block pair-loss hazard of an unaligned sort;
- oversized buckets (> max_bucket) emit star pairs against the bucket's
  min doc_id instead of being dropped: every member stays connected to
  the cluster for dedup purposes at O(n) instead of O(n^2) pairs.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.util import hash_join

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _md5_64(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode()).digest()[:8])[0]


def _splitmix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (Steele et al., OOPSLA 2014), vectorized on
    uint64 with wrapping arithmetic. Mirrored in SQL via UHUGEINT % 2^64."""
    x = (x ^ (x >> np.uint64(30))) * _MIX1
    x = (x ^ (x >> np.uint64(27))) * _MIX2
    return x ^ (x >> np.uint64(31))


def _word_hash_arrays(texts: List[str]):
    """Tokenize (str.split) every text; md5-hash each unique word once.
    Returns (flat uint64 word hashes, doc start offsets incl. end)."""
    cache: Dict[str, int] = {}
    flat: List[int] = []
    starts = np.empty(len(texts) + 1, dtype=np.int64)
    pos = 0
    for i, t in enumerate(texts):
        starts[i] = pos
        for w in t.split():
            h = cache.get(w)
            if h is None:
                h = cache[w] = _md5_64(w)
            flat.append(h)
        pos = len(flat)
    starts[len(texts)] = pos
    return np.array(flat, dtype=np.uint64), starts


def _shingle_hashes(wh: np.ndarray, k: int) -> np.ndarray:
    """Combine k consecutive word hashes into shingle hashes:
    splitmix64(sum_j (j+1)*w[i+j]). Caller masks cross-doc windows."""
    if len(wh) < k:
        return np.empty(0, dtype=np.uint64)
    acc = np.zeros(len(wh) - k + 1, dtype=np.uint64)
    for j in range(k):
        acc = acc + np.uint64(j + 1) * wh[j : len(wh) - k + 1 + j]
    return _splitmix(acc)


def _shingle_hashes_chain(wh: np.ndarray, k: int) -> np.ndarray:
    """Order-sensitive k-window hashes: a splitmix64 Merkle-Damgård
    chain acc = splitmix(acc + w[i+j]). The weighted-sum variant above
    (kept for the MinHash family, whose SQL oracle replicates it) has
    STRUCTURAL collisions on repeated words — e.g. 'a b a c d' and
    'c b c a d' sum identically — which is harmless noise for sketch
    similarity but wrong for exact-substring detection."""
    if len(wh) < k:
        return np.empty(0, dtype=np.uint64)
    acc = np.zeros(len(wh) - k + 1, dtype=np.uint64)
    for j in range(k):
        acc = _splitmix(acc + wh[j : len(wh) - k + 1 + j])
    return acc


def hash_docs(
    docs: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Per-document (text_md5, keep_id, dup_count=1) rows — the shared
    input of exact_dedup's groupby AND of any per-doc dup join (curate
    reuses one materialized pass instead of re-hashing the corpus)."""

    def _h(b: pa.Table) -> pa.Table:
        hs = [hashlib.md5(t.encode()).hexdigest() for t in b[text_col].to_pylist()]
        return pa.table(
            {"text_md5": pa.array(hs, pa.string()), "keep_id": b[id_col],
             "dup_count": pa.array(np.ones(b.num_rows, dtype=np.int64), pa.int64())}
        )

    return docs.map_batches(_h, batch_format="pyarrow", batch_size=None)


def exact_dedup(
    docs: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep the smallest id per exact text (md5(text) grouping):
    (text_md5, keep_id, dup_count). Per-batch pre-combine (local min)
    before the groupby shuffle."""
    return dedup_from_hashes(hash_docs(docs, text_col, id_col))


def dedup_from_hashes(hashed: ray.data.Dataset) -> ray.data.Dataset:
    """exact_dedup's groupby over a pre-built hash_docs table."""

    def _local(b: pa.Table) -> pa.Table:
        g = b.group_by("text_md5").aggregate([("keep_id", "min"), ("dup_count", "sum")])
        return pa.table(
            {"text_md5": g["text_md5"], "keep_id": g["keep_id_min"],
             "dup_count": g["dup_count_sum"]}
        )

    from ray.data.aggregate import Min, Sum

    g = (
        hashed.map_batches(_local, batch_format="pyarrow", batch_size=None)
        .groupby("text_md5")
        .aggregate(Min("keep_id"), Sum("dup_count"))
    )

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table(
            {"text_md5": b["text_md5"], "keep_id": b["min(keep_id)"],
             "dup_count": b["sum(dup_count)"]}
        )

    return g.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def minhash_signatures(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> ray.data.Dataset:
    """(doc_id, sig: list<uint64>) MinHash signatures over word shingles.

    Hash family: md5 per word + splitmix64 shingle combine + per-seed
    golden-ratio remix — deterministic across workers and cluster sizes
    (no python hash salt), and mirrored exactly by the SQL oracle.
    Fully vectorized: one ``np.minimum.reduceat`` per seed over the flat
    shingle-hash array of the whole batch.
    """
    seeds = np.arange(num_hashes, dtype=np.uint64) * _GOLDEN

    def _f(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        wh, starts = _word_hash_arrays(texts)
        n = len(texts)
        k = shingle_k
        # per-doc shingle ranges on the flat array; docs shorter than k
        # words hash their full word run as the single shingle
        sh_parts: List[np.ndarray] = []
        doc_sh_starts = np.empty(n + 1, dtype=np.int64)
        pos = 0
        for i in range(n):
            lo, hi = starts[i], starts[i + 1]
            doc_sh_starts[i] = pos
            nw = hi - lo
            if nw == 0:
                sh = np.array([_splitmix(np.uint64(0))], dtype=np.uint64)
            elif nw < k:
                acc = np.uint64(0)
                for j in range(nw):
                    acc = acc + np.uint64(j + 1) * wh[lo + j]
                sh = np.array([_splitmix(acc)], dtype=np.uint64)
            else:
                sh = _shingle_hashes(wh[lo:hi], k)
            sh_parts.append(sh)
            pos += len(sh)
        doc_sh_starts[n] = pos
        flat_sh = (
            np.concatenate(sh_parts) if sh_parts else np.empty(0, np.uint64)
        )
        sig = np.empty((n, num_hashes), dtype=np.uint64)
        if n:
            for h in range(num_hashes):
                x = _splitmix(flat_sh + seeds[h])
                sig[:, h] = np.minimum.reduceat(x, doc_sh_starts[:-1])
        return pa.table(
            {"doc_id": b[id_col],
             "sig": pa.array(list(sig), pa.list_(pa.uint64()))}
        )

    return docs.map_batches(_f, batch_format="pyarrow", batch_size=None)


def _band_keys(sig: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """(n, bands) int64 bucket keys: splitmix-fold each band's signature
    rows with the band index, truncated to non-negative int63 so the keys
    range-sort cleanly."""
    n = sig.shape[0]
    keys = np.empty((n, bands), dtype=np.int64)
    for band in range(bands):
        acc = np.full(n, np.uint64(band + 1) * _GOLDEN, dtype=np.uint64)
        chunk = sig[:, band * rows_per_band : (band + 1) * rows_per_band]
        for r in range(chunk.shape[1]):
            acc = _splitmix(acc ^ chunk[:, r])
        keys[:, band] = (acc >> np.uint64(1)).astype(np.int64)
    return keys


def minhash_lsh_pairs(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_bucket: int = 200,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Candidate near-duplicate pairs via banded MinHash LSH:
    shingle → minhash → band-key → boundary-aligned range sort →
    within-bucket pairs → distinct (a, b) with a < b.

    The band_key sort uses explicit boundaries (one block per key range,
    like ops/window.sessionize), so a bucket can never straddle two output
    blocks and silently lose its cross-block pairs. Buckets larger than
    ``max_bucket`` emit star pairs against the bucket's min doc_id —
    O(n) connectivity instead of O(n^2) pairs, nothing dropped."""
    from igraph_ray.csr import compute_boundaries

    sigs = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_k)
    rows_per_band = num_hashes // bands

    def _bands(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({"band_key": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        sig = np.array(b["sig"].to_pylist(), dtype=np.uint64)
        keys = _band_keys(sig, bands, rows_per_band)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"band_key": pa.array(keys.reshape(-1), pa.int64()),
             "doc_id": pa.array(np.repeat(ids, bands), pa.int64())}
        )

    banded = sigs.map_batches(_bands, batch_format="pyarrow", batch_size=None).materialize()
    bounds = compute_boundaries(banded, num_partitions, col="band_key")
    # boundary-aligned range sort: every band_key lives in exactly one block
    bucketed = (
        banded.sort("band_key", boundaries=bounds) if bounds else banded.sort("band_key")
    )

    def _pairs(b: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        if b.num_rows == 0 or "band_key" not in b.column_names:
            return empty
        keys = b["band_key"].to_numpy(zero_copy_only=False)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, keys))
        keys, ids = keys[order], ids[order]
        newgrp = np.empty(len(keys), dtype=bool)
        newgrp[0] = True
        np.not_equal(keys[1:], keys[:-1], out=newgrp[1:])
        starts = np.flatnonzero(newgrp)
        lens = np.diff(np.append(starts, len(keys)))
        outa, outb = [], []
        for s, ln in zip(starts, lens):
            if ln < 2:
                continue
            group = np.unique(ids[s : s + ln])
            if len(group) < 2:
                continue
            if len(group) <= max_bucket:
                x, y = np.triu_indices(len(group), k=1)
                outa.append(group[x])
                outb.append(group[y])
            else:
                # star pairs: keep every member reachable from the bucket
                # representative without O(n^2) output
                outa.append(np.full(len(group) - 1, group[0], dtype=np.int64))
                outb.append(group[1:])
        if not outa:
            return empty
        return pa.table(
            {"a": pa.array(np.concatenate(outa), pa.int64()),
             "b": pa.array(np.concatenate(outb), pa.int64())}
        )

    pairs = bucketed.map_batches(_pairs, batch_format="pyarrow", batch_size=None)
    return (
        pairs.groupby(["a", "b"]).count().select_columns(["a", "b"])
    )


def simhash(
    docs: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> ray.data.Dataset:
    """(doc_id, simhash:uint64): token-weighted SimHash (Charikar, STOC
    2002). Vectorized: md5-per-unique-word (memoized), little-endian bit
    unpack of the flat word-hash array, one reduceat per batch."""
    assert bits == 64, "simhash is fixed to 64-bit word hashes"

    def _f(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        n = len(texts)
        if n == 0:
            return pa.table({"doc_id": b[id_col],
                             "simhash": pa.array([], pa.uint64())})
        wh, starts = _word_hash_arrays(texts)
        if len(wh) == 0:
            out = np.zeros(n, dtype=np.uint64)
        else:
            # (n_words, 64) sign matrix: +1 where bit set, -1 where clear;
            # bit column j == (h >> j) & 1 (little-endian unpack)
            bits_m = np.unpackbits(
                wh.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            ).astype(np.int32)
            signs = 2 * bits_m - 1
            # empty docs contribute zero rows: reduceat needs care when a
            # doc start equals the next (empty slice yields the row AT the
            # index) — mask those docs to zero afterwards
            idx = np.minimum(starts[:-1], len(wh) - 1)
            acc = np.add.reduceat(signs, idx, axis=0)
            nwords = np.diff(starts)
            acc[nwords == 0] = 0
            weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
            out = ((acc > 0).astype(np.uint64) * weights[None, :]).sum(axis=1)
        return pa.table(
            {"doc_id": b[id_col], "simhash": pa.array(out, pa.uint64())}
        )

    return docs.map_batches(_f, batch_format="pyarrow", batch_size=None)


def _word_shingles(text: str, k: int) -> List[str]:
    words = text.split()
    if len(words) < k:
        return [" ".join(words)] if words else [""]
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


def ngram_jaccard_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Exact n-gram Jaccard over candidate pairs from LSH: candidates →
    join texts back → per-pair Jaccard ≥ threshold.
    Returns (a, b, jaccard)."""
    cands = minhash_lsh_pairs(docs, text_col=text_col, id_col=id_col, shingle_k=shingle_k)

    def _ta(b: pa.Table) -> pa.Table:
        return pa.table({"a": b[id_col], "text_a": b[text_col]})

    def _tb(b: pa.Table) -> pa.Table:
        return pa.table({"b": b[id_col], "text_b": b[text_col]})

    j = hash_join(cands, docs.map_batches(_ta, batch_format="pyarrow", batch_size=None),
                  on="a", num_partitions=num_partitions)
    j = hash_join(j, docs.map_batches(_tb, batch_format="pyarrow", batch_size=None),
                  on="b", num_partitions=num_partitions)

    def _doc_shingle_sets(texts: List[str]) -> List[np.ndarray]:
        """Unique shingle-hash array per text, via the flat word-hash +
        windowed-sum machinery (one md5 per unique word in the batch, one
        vectorized splitmix per doc) — hash equality mirrors the string
        shingle equality of ``_word_shingles`` (short docs collapse to a
        single whole-text shingle, empty text hashes the empty window)."""
        wh, starts = _word_hash_arrays(texts)
        out: List[np.ndarray] = []
        for i in range(len(texts)):
            lo, hi = starts[i], starts[i + 1]
            nw = hi - lo
            if nw >= shingle_k:
                sh = _shingle_hashes(wh[lo:hi], shingle_k)
            else:
                acc = np.zeros(1, dtype=np.uint64)
                for jj in range(nw):
                    acc += np.uint64(jj + 1) * wh[lo + jj]
                sh = _splitmix(acc)
            out.append(np.unique(sh))
        return out

    def _jac(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())})
        a_ids = b["a"].to_numpy(zero_copy_only=False)
        b_ids = b["b"].to_numpy(zero_copy_only=False)
        # shingle each distinct doc in the batch once (a doc appears in
        # many candidate pairs)
        texts_a = b["text_a"].to_pylist()
        texts_b = b["text_b"].to_pylist()
        sets: Dict[int, np.ndarray] = {}
        pending_ids: List[int] = []
        pending_tx: List[str] = []
        for ids, txs in ((a_ids, texts_a), (b_ids, texts_b)):
            for i, t in zip(ids, txs):
                if int(i) not in sets:
                    sets[int(i)] = None  # reserve
                    pending_ids.append(int(i))
                    pending_tx.append(t)
        for i, sh in zip(pending_ids, _doc_shingle_sets(pending_tx)):
            sets[i] = sh
        # each doc's set is sorted-unique, so per-pair intersection is
        # one C-speed merge (the shingling above is the former per-pair
        # cost: the old path re-split and re-hashed the TEXT per pair)
        outa, outb, outj = [], [], []
        for i in range(len(a_ids)):
            sa = sets[int(a_ids[i])]
            sb = sets[int(b_ids[i])]
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            if union == 0:
                continue
            jac = inter / union
            if jac >= threshold:
                outa.append(int(a_ids[i]))
                outb.append(int(b_ids[i]))
                outj.append(jac)
        return pa.table(
            {"a": pa.array(outa, pa.int64()), "b": pa.array(outb, pa.int64()),
             "jaccard": pa.array(outj, pa.float64())}
        )

    return j.map_batches(_jac, batch_format="pyarrow", batch_size=None)


def duplicated_spans(
    docs: ray.data.Dataset,
    l: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Exact-substring duplication spans (the shingle-window variant of
    suffix-array substring dedup, Lee et al., "Deduplicating Training
    Data Makes Language Models Better", ACL 2022): every maximal
    token-position span covered by ``l``-token windows that occur at
    least twice in the corpus (multiplicity counted globally, including
    repeats inside one document). Returns (doc_id, span_start,
    span_end) with 0-based token positions, end exclusive — the removal
    mask a curation pipeline applies to the token stream.

    Shape: one pass emits (window-hash, doc, pos) occurrences
    vectorized over the flat word-hash array (md5 per unique word per
    batch + splitmix64 combine — the exact machinery of the MinHash
    path above); a per-batch pre-combined count groupby finds hashes
    with count >= 2; occurrences semi-join the duplicated set; a
    boundary-aligned sort on doc_id groups each document into one block
    where overlapping/adjacent windows merge into maximal spans with
    one vectorized islands pass. No driver-side state; the only
    all-to-all steps are the count groupby and the final sort.
    """
    def _wins(b: pa.Table) -> pa.Table:
        empty = pa.table({"h": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        texts = b[text_col].to_pylist()
        ids = b[id_col].to_numpy(zero_copy_only=False)
        wh, starts = _word_hash_arrays(texts)
        if len(wh) < l:
            return empty
        sh = _shingle_hashes_chain(wh, l)
        doc_of = np.repeat(np.arange(len(texts)), np.diff(starts))
        p = np.arange(len(sh))
        d = doc_of[p]
        pos = p - starts[d]
        ok = pos + l <= (starts[d + 1] - starts[d])
        return pa.table({
            "h": pa.array(sh[ok].view(np.int64), pa.int64()),
            "doc_id": pa.array(ids[d[ok]], pa.int64()),
            "pos": pa.array(pos[ok], pa.int64()),
        })

    occ = docs.map_batches(_wins, batch_format="pyarrow",
                           batch_size=None).materialize()

    def _precount(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        t = pa.table({"h": b["h"],
                      "c": pa.array(np.ones(b.num_rows, np.int64), pa.int64())})
        return pa.TableGroupBy(t, "h").aggregate([("c", "sum")]) \
            .rename_columns(["h", "c"])

    counts = occ.map_batches(_precount, batch_format="pyarrow",
                             batch_size=None).groupby("h").sum("c")

    def _dups(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "h" not in b.column_names:
            return pa.table({"h": pa.array([], pa.int64())})
        keep = pc.greater_equal(b["sum(c)"], 2)
        return pa.table({"h": b["h"].filter(keep)})

    dup_h = counts.map_batches(_dups, batch_format="pyarrow", batch_size=None)
    hits = hash_join(occ, dup_h, on="h",
                     num_partitions=num_partitions).select_columns(
                         ["doc_id", "pos"])

    from igraph_ray.csr import compute_boundaries

    hits = hits.materialize()
    bounds = compute_boundaries(hits, num_partitions, col="doc_id")
    s = hits.sort("doc_id", boundaries=bounds) if bounds else hits.sort("doc_id")

    def _spans(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "span_start": pa.array([], pa.int64()),
                          "span_end": pa.array([], pa.int64())})
        if b.num_rows == 0 or "doc_id" not in b.column_names:
            return empty
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        p = b["pos"].to_numpy(zero_copy_only=False)
        o = np.lexsort((p, d))
        d, p = d[o], p[o]
        brk = np.ones(len(d), dtype=bool)
        brk[1:] = (d[1:] != d[:-1]) | (p[1:] > p[:-1] + l)
        st = np.flatnonzero(brk)
        en = np.r_[st[1:], len(d)] - 1
        return pa.table({"doc_id": pa.array(d[st], pa.int64()),
                         "span_start": pa.array(p[st], pa.int64()),
                         "span_end": pa.array(p[en] + l, pa.int64())})

    return s.map_batches(_spans, batch_format="pyarrow", batch_size=None)


def remove_duplicated_spans(
    docs: ray.data.Dataset,
    l: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """(doc_id, clean_text, n_removed): the actionable form of
    ``duplicated_spans`` — every token covered by a corpus-duplicated
    ``l``-token window is dropped (BOTH occurrences, the symmetric rule:
    keeping "the first" would need a global occurrence order; Lee et
    al.'s suffix-array cut has the same all-copies option) and the
    remaining tokens are re-joined with single spaces (canonical
    whitespace). Docs without duplicated windows pass through with
    n_removed = 0.

    Shape: spans come from duplicated_spans (its scale notes apply);
    per-doc span lists are packed by one boundary-aligned sort +
    vectorized group pass into a list<int64> column, then ONE
    broadcast/hash join onto the docs and a per-batch rebuild. The
    rebuild splits/joins each document's text once — per-document
    string work, the same class as fingerprint()."""
    spans = duplicated_spans(docs, l=l, text_col=text_col, id_col=id_col,
                             num_partitions=num_partitions).materialize()
    from igraph_ray.csr import compute_boundaries

    bounds = compute_boundaries(spans, num_partitions, col="doc_id")
    s = (spans.sort("doc_id", boundaries=bounds) if bounds
         else spans.sort("doc_id"))

    def _pack(b: pa.Table) -> pa.Table:
        # spans serialize to one "s,e,s,e,…" string per doc: pyarrow's
        # acero join (the broadcast path) cannot carry list-typed
        # payload columns
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "spans": pa.array([], pa.string())})
        if b.num_rows == 0 or "doc_id" not in b.column_names:
            return empty
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        st = b["span_start"].to_numpy(zero_copy_only=False)
        en = b["span_end"].to_numpy(zero_copy_only=False)
        o = np.lexsort((st, d))
        d, st, en = d[o], st[o], en[o]
        brk = np.ones(len(d), dtype=bool)
        brk[1:] = d[1:] != d[:-1]
        doc_first = np.flatnonzero(brk)
        ends = np.r_[doc_first[1:], len(d)]
        packed = [",".join(f"{st[i]},{en[i]}" for i in range(lo, hi))
                  for lo, hi in zip(doc_first, ends)]
        return pa.table({id_col: pa.array(d[doc_first], pa.int64()),
                         "spans": pa.array(packed, pa.string())})

    packed = s.map_batches(_pack, batch_format="pyarrow", batch_size=None)
    j = hash_join(docs, packed, on=id_col, num_partitions=num_partitions,
                  join_type="left_outer")

    def _apply(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        spans_col = (b["spans"].to_pylist() if "spans" in b.column_names
                     else [None] * b.num_rows)
        clean, removed = [], []
        for t, sp in zip(texts, spans_col):
            toks = t.split()
            if not sp:
                clean.append(" ".join(toks))
                removed.append(0)
                continue
            nums = [int(x) for x in sp.split(",")]
            drop = np.zeros(len(toks), dtype=bool)
            for i in range(0, len(nums), 2):
                drop[nums[i]:nums[i + 1]] = True
            clean.append(" ".join(tok for tok, dd in zip(toks, drop)
                                  if not dd))
            removed.append(int(drop.sum()))
        return pa.table({id_col: b[id_col],
                         "clean_text": pa.array(clean, pa.string()),
                         "n_removed": pa.array(removed, pa.int64())})

    return j.map_batches(_apply, batch_format="pyarrow", batch_size=None)
