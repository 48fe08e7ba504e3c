"""Deduplication operators for training-data pipelines over a documents
table. Exact dedup is hash-partition + per-group first; near-dup families
(MinHash+LSH, SimHash, n-gram Jaccard) follow the standard
shingle → sketch → band-bucket groupby shape, all deterministic (md5-based
hashing, no process salt) so runs are reproducible across cluster sizes.
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.util import hash_join


def _md5_64(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode()).digest()[:8])[0]


def exact_dedup(
    docs: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep the smallest id per exact text (md5(text) grouping):
    (text_md5, keep_id, dup_count). Per-batch pre-combine (local min)
    before the groupby shuffle."""

    def _h(b: pa.Table) -> pa.Table:
        hs = [hashlib.md5(t.encode()).hexdigest() for t in b[text_col].to_pylist()]
        return pa.table(
            {"text_md5": pa.array(hs, pa.string()), "keep_id": b[id_col],
             "dup_count": pa.array(np.ones(b.num_rows, dtype=np.int64), pa.int64())}
        )

    hashed = docs.map_batches(_h, batch_format="pyarrow", batch_size=None)

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


def _word_shingles(text: str, k: int) -> List[str]:
    words = text.split()
    if len(words) < k:
        return [" ".join(words)] if words else [""]
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


def minhash_signatures(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> ray.data.Dataset:
    """(doc_id, sig: list<uint64>) MinHash signatures over word shingles.

    Hash family: md5(f"{seed}:{shingle}") — deterministic across workers
    and cluster sizes (no python hash salt).
    """

    def _f(b: pa.Table) -> pa.Table:
        sigs = []
        for t in b[text_col].to_pylist():
            shingles = _word_shingles(t, shingle_k)
            base = np.array([_md5_64(s) for s in shingles], dtype=np.uint64)
            sig = np.empty(num_hashes, dtype=np.uint64)
            for h in range(num_hashes):
                # splitmix-style per-seed remix of the base md5 hashes
                x = base + np.uint64(h) * np.uint64(0x9E3779B97F4A7C15)
                x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                x = x ^ (x >> np.uint64(31))
                sig[h] = x.min() if len(x) else 0
            sigs.append(sig.tolist())
        return pa.table(
            {"doc_id": b[id_col], "sig": pa.array(sigs, pa.list_(pa.uint64()))}
        )

    return docs.map_batches(_f, batch_format="pyarrow", batch_size=None)


def minhash_lsh_pairs(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> ray.data.Dataset:
    """Candidate near-duplicate pairs via banded MinHash LSH:
    shingle → minhash → band-hash → groupby(band_key) → within-bucket
    pairs → distinct (a, b) with a < b. The groupby is the scale-out
    step; bucket sizes are bounded by banding."""
    sigs = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_k)
    rows_per_band = num_hashes // bands

    def _bands(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        sigs_ = b["sig"].to_pylist()
        out_key, out_id = [], []
        for i, sig in zip(ids, sigs_):
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                key = hashlib.md5(
                    (str(band) + ":" + ",".join(map(str, chunk))).encode()
                ).hexdigest()
                out_key.append(key)
                out_id.append(i)
        return pa.table(
            {"band_key": pa.array(out_key, pa.string()), "doc_id": pa.array(out_id, pa.int64())}
        )

    banded = sigs.map_batches(_bands, batch_format="pyarrow", batch_size=None)
    # bucket → pairs: sort by band_key so each bucket is contiguous,
    # pair generation vectorized per block
    bucketed = banded.sort("band_key")

    def _pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        keys = np.array(b["band_key"].to_pylist())
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, keys))
        keys, ids = keys[order], ids[order]
        outa, outb = [], []
        i = 0
        while i < len(keys):
            j = i
            while j < len(keys) and keys[j] == keys[i]:
                j += 1
            group = ids[i:j]
            if 1 < len(group) <= 200:  # cap pathological buckets
                for x in range(len(group)):
                    for y in range(x + 1, len(group)):
                        if group[x] != group[y]:
                            outa.append(min(group[x], group[y]))
                            outb.append(max(group[x], group[y]))
            i = j
        return pa.table({"a": pa.array(outa, pa.int64()), "b": pa.array(outb, pa.int64())})

    pairs = bucketed.map_batches(_pairs, batch_format="pyarrow", batch_size=None)
    return (
        pairs.groupby(["a", "b"]).count().select_columns(["a", "b"])
    )


def simhash(
    docs: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> ray.data.Dataset:
    """(doc_id, simhash:uint64): token-weighted SimHash."""

    def _f(b: pa.Table) -> pa.Table:
        out = []
        for t in b[text_col].to_pylist():
            acc = np.zeros(bits, dtype=np.int64)
            for w in t.split():
                h = _md5_64(w)
                for bit in range(bits):
                    acc[bit] += 1 if (h >> bit) & 1 else -1
            v = 0
            for bit in range(bits):
                if acc[bit] > 0:
                    v |= 1 << bit
            out.append(v)
        return pa.table(
            {"doc_id": b[id_col], "simhash": pa.array(np.array(out, dtype=np.uint64), pa.uint64())}
        )

    return docs.map_batches(_f, batch_format="pyarrow", batch_size=None)


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

    def _jac(b: pa.Table) -> pa.Table:
        outa, outb, outj = [], [], []
        for a, bb, ta, tb in zip(
            b["a"].to_pylist(), b["b"].to_pylist(),
            b["text_a"].to_pylist(), b["text_b"].to_pylist(),
        ):
            sa = set(_word_shingles(ta, shingle_k))
            sb = set(_word_shingles(tb, shingle_k))
            if not sa or not sb:
                continue
            jac = len(sa & sb) / len(sa | sb)
            if jac >= threshold:
                outa.append(a)
                outb.append(bb)
                outj.append(jac)
        return pa.table(
            {"a": pa.array(outa, pa.int64()), "b": pa.array(outb, pa.int64()),
             "jaccard": pa.array(outj, pa.float64())}
        )

    return j.map_batches(_jac, batch_format="pyarrow", batch_size=None)
