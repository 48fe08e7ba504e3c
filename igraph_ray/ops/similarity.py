"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k is the exact baseline: the query matrix is
broadcast once via ``ray.put`` and every batch does one numpy matmul
against it (never re-shipped per batch). The LSH-bucketed variant is the
scale path: random-hyperplane signatures bucket vectors so candidate
generation touches only same-bucket pairs.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _to_matrix(col) -> np.ndarray:
    arr = col.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def brute_force_topk(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Exact cosine top-k. Returns (query_id, neighbor_id, score) with
    rank ties broken by neighbor_id ascending; deterministic.

    queries: (Q, D) float array. Broadcast once (ray.put); per-batch
    partial top-k (numpy matmul + argpartition) → global top-k via one
    small sort-limit per query on the union of partials.
    """
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
    q_ref = ray.put(qn)

    def _partial(b: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        m = _to_matrix(b[vec_col])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        scores = q @ m.T  # (Q, B)
        kk = min(k, scores.shape[1])
        out_q, out_n, out_s = [], [], []
        for qi in range(scores.shape[0]):
            row = scores[qi]
            idx = np.argpartition(-row, kk - 1)[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_n.append(ids[idx])
            out_s.append(row[idx])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    partials = embeddings.map_batches(_partial, batch_format="pyarrow", batch_size=None).materialize()

    # global top-k per query: the partial stream is tiny (Q*k per block)
    def _final(b: pa.Table) -> pa.Table:
        qid = b["query_id"].to_numpy(zero_copy_only=False)
        nid = b["neighbor_id"].to_numpy(zero_copy_only=False)
        sc = b["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nid, -sc, qid))
        qid, nid, sc = qid[order], nid[order], sc[order]
        keep = np.zeros(len(qid), dtype=bool)
        count, prev = 0, None
        for i in range(len(qid)):
            if qid[i] != prev:
                prev, count = qid[i], 0
            if count < k:
                keep[i] = True
                count += 1
        return pa.table(
            {"query_id": pa.array(qid[keep], pa.int64()),
             "neighbor_id": pa.array(nid[keep], pa.int64()),
             "score": pa.array(sc[keep], pa.float64())}
        )

    return partials.repartition(1).map_batches(_final, batch_format="pyarrow", batch_size=None)


def embedding_near_dups(
    embeddings: ray.data.Dataset,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 4,
    num_bands: int = 8,
    seed: int = 42,
    exact: bool = True,
    max_bucket: int = 500,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Near-duplicate pairs by embedding cosine: (a, b, score) with a < b
    and cosine ≥ threshold.

    exact=True (the oracle-matched mode): every batch scores against the
    full normalized matrix broadcast once via ray.put — O(N²/P) per task,
    fine up to ~10^5 vectors.

    exact=False (the scale path): banded random-hyperplane LSH (Charikar,
    STOC 2002). ``num_bands`` bands of ``num_planes`` hyperplanes each;
    two vectors collide in a band with probability (1 - θ/π)^num_planes,
    so overall candidate recall is 1-(1-p^r)^L — ~0.998 at cosine 0.9 with
    the r=4, L=8 defaults. Candidate pairs come from per-band bucket
    groups (boundary-aligned int64-key sort, exactly one block per key
    range, so buckets never straddle blocks), then exact cosine rescoring
    over the joined vectors keeps only true ≥-threshold pairs: precision
    1.0, recall = candidate recall. Output matches the exact mode minus
    LSH misses.
    """
    if exact:
        refs = embeddings.select_columns([id_col, vec_col]).materialize().to_arrow_refs()

        @ray.remote
        def _assemble(rs):
            tables = [t for t in ray.get(list(rs)) if t.num_rows]
            t = pa.concat_tables(tables)
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            m = _to_matrix(t[vec_col])
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            return {"ids": ids, "m": m}

        side_ref = _assemble.remote(refs)

        def _pairs(b: pa.Table) -> pa.Table:
            side = ray.get(side_ref)
            all_ids, mat = side["ids"], side["m"]
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            m = _to_matrix(b[vec_col])
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            scores = m @ mat.T  # (B, N)
            ii, jj = np.nonzero(scores >= threshold)
            a = ids[ii]
            bb = all_ids[jj]
            keep = a < bb  # each unordered pair once, no self-pairs
            return pa.table(
                {"a": pa.array(a[keep], pa.int64()),
                 "b": pa.array(bb[keep], pa.int64()),
                 "score": pa.array(scores[ii, jj][keep], pa.float64())}
            )

        return embeddings.map_batches(_pairs, batch_format="pyarrow", batch_size=None)

    # ---------------- LSH scale path ----------------
    from igraph_ray.csr import compute_boundaries
    from igraph_ray.util import hash_join

    planes_by_dim: dict = {}

    def _planes_for(dim: int) -> np.ndarray:
        # deterministic per dim: fresh generator seeded identically in
        # every worker (no cross-task state)
        p = planes_by_dim.get(dim)
        if p is None:
            p = np.random.default_rng(seed).standard_normal(
                (num_bands * num_planes, dim)
            )
            planes_by_dim[dim] = p
        return p

    def _bucket(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _to_matrix(b[vec_col])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        pl = _planes_for(m.shape[1])
        bits = (m @ pl.T > 0).astype(np.uint64)  # (n, L*r)
        keys = np.empty((len(ids), num_bands), dtype=np.int64)
        weights = (np.uint64(1) << np.arange(num_planes, dtype=np.uint64))
        for band in range(num_bands):
            chunk = bits[:, band * num_planes : (band + 1) * num_planes]
            code = (chunk * weights[None, :]).sum(axis=1)
            keys[:, band] = ((np.uint64(band) << np.uint64(num_planes)) | code).astype(np.int64)
        return pa.table(
            {"band_key": pa.array(keys.reshape(-1), pa.int64()),
             "a": pa.array(np.repeat(ids, num_bands), pa.int64())}
        )

    banded = embeddings.map_batches(_bucket, batch_format="pyarrow", batch_size=None).materialize()
    bounds = compute_boundaries(banded, num_partitions, col="band_key")
    bucketed = (
        banded.sort("band_key", boundaries=bounds) if bounds else banded.sort("band_key")
    )

    def _cand(b: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        if b.num_rows == 0 or "band_key" not in b.column_names:
            return empty
        keys = b["band_key"].to_numpy(zero_copy_only=False)
        ids = b["a"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, keys))
        keys, ids = keys[order], ids[order]
        newgrp = np.empty(len(keys), dtype=bool)
        newgrp[0] = True
        np.not_equal(keys[1:], keys[:-1], out=newgrp[1:])
        starts = np.flatnonzero(newgrp)
        lens = np.diff(np.append(starts, len(keys)))
        outa, outb = [], []
        for s, ln in zip(starts, lens):
            group = np.unique(ids[s : s + ln])
            if len(group) < 2:
                continue
            if len(group) <= max_bucket:
                x, y = np.triu_indices(len(group), k=1)
                outa.append(group[x])
                outb.append(group[y])
            else:
                # star pairs against the bucket representative: O(n)
                # connectivity instead of O(n^2) output, nothing dropped
                outa.append(np.full(len(group) - 1, group[0], dtype=np.int64))
                outb.append(group[1:])
        if not outa:
            return empty
        return pa.table(
            {"a": pa.array(np.concatenate(outa), pa.int64()),
             "b": pa.array(np.concatenate(outb), pa.int64())}
        )

    cands = (
        bucketed.map_batches(_cand, batch_format="pyarrow", batch_size=None)
        .groupby(["a", "b"]).count().select_columns(["a", "b"])
    )

    # acero joins reject list-typed payload columns, so vectors ride
    # through the candidate joins as float64 binary blobs
    def _va(b: pa.Table) -> pa.Table:
        m = _to_matrix(b[vec_col]).astype(np.float64)
        return pa.table(
            {"a": b[id_col],
             "vec_a": pa.array([row.tobytes() for row in m], pa.large_binary())}
        )

    def _vb(b: pa.Table) -> pa.Table:
        m = _to_matrix(b[vec_col]).astype(np.float64)
        return pa.table(
            {"b": b[id_col],
             "vec_b": pa.array([row.tobytes() for row in m], pa.large_binary())}
        )

    j = hash_join(cands, embeddings.map_batches(_va, batch_format="pyarrow", batch_size=None),
                  on="a", num_partitions=num_partitions)
    j = hash_join(j, embeddings.map_batches(_vb, batch_format="pyarrow", batch_size=None),
                  on="b", num_partitions=num_partitions)

    def _score(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
        if b.num_rows == 0 or "vec_a" not in b.column_names:
            return empty
        va = np.stack([np.frombuffer(x, np.float64) for x in b["vec_a"].to_pylist()])
        vb = np.stack([np.frombuffer(x, np.float64) for x in b["vec_b"].to_pylist()])
        va = va / np.maximum(np.linalg.norm(va, axis=1, keepdims=True), 1e-30)
        vb = vb / np.maximum(np.linalg.norm(vb, axis=1, keepdims=True), 1e-30)
        sc = (va * vb).sum(axis=1)
        keep = sc >= threshold
        return pa.table(
            {"a": pa.array(b["a"].to_numpy(zero_copy_only=False)[keep], pa.int64()),
             "b": pa.array(b["b"].to_numpy(zero_copy_only=False)[keep], pa.int64()),
             "score": pa.array(sc[keep], pa.float64())}
        )

    return j.map_batches(_score, batch_format="pyarrow", batch_size=None)


def lsh_topk(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    num_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    multiprobe: int = 1,
) -> ray.data.Dataset:
    """Approximate cosine top-k via random-hyperplane LSH: vectors are
    scanned once, but scoring touches only batches whose bucket sets
    intersect the query buckets — the IVF-style scale path. Same output
    schema as brute_force_topk (approximate recall)."""
    rng = np.random.default_rng(seed)
    dim = queries.shape[1]
    planes = rng.standard_normal((num_planes, dim))
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
    qsig = (qn @ planes.T > 0).astype(np.uint32)
    qbuckets = set((qsig * (1 << np.arange(num_planes, dtype=np.uint32))).sum(axis=1).tolist())
    q_ref = ray.put(qn)
    p_ref = ray.put(planes)
    buckets_ref = ray.put(qbuckets)

    def _partial(b: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        pl = ray.get(p_ref)
        qb = ray.get(buckets_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        m = _to_matrix(b[vec_col])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sig = (m @ pl.T > 0).astype(np.uint32)
        bucket = (sig * (1 << np.arange(pl.shape[0], dtype=np.uint32))).sum(axis=1)
        mask = np.isin(bucket, list(qb))
        ids, m = ids[mask], m[mask]
        empty = pa.table(
            {"query_id": pa.array([], pa.int64()),
             "neighbor_id": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
        if len(ids) == 0:
            return empty
        scores = q @ m.T
        kk = min(k, scores.shape[1])
        out_q, out_n, out_s = [], [], []
        for qi in range(scores.shape[0]):
            row = scores[qi]
            idx = np.argpartition(-row, kk - 1)[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_n.append(ids[idx])
            out_s.append(row[idx])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    partials = embeddings.map_batches(_partial, batch_format="pyarrow", batch_size=None).materialize()

    def _final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        qid = b["query_id"].to_numpy(zero_copy_only=False)
        nid = b["neighbor_id"].to_numpy(zero_copy_only=False)
        sc = b["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nid, -sc, qid))
        qid, nid, sc = qid[order], nid[order], sc[order]
        keep = np.zeros(len(qid), dtype=bool)
        count, prev = 0, None
        for i in range(len(qid)):
            if qid[i] != prev:
                prev, count = qid[i], 0
            if count < k:
                keep[i] = True
                count += 1
        return pa.table(
            {"query_id": pa.array(qid[keep], pa.int64()),
             "neighbor_id": pa.array(nid[keep], pa.int64()),
             "score": pa.array(sc[keep], pa.float64())}
        )

    return partials.repartition(1).map_batches(_final, batch_format="pyarrow", batch_size=None)


def ivf_topk(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    nlist: int = 32,
    nprobe: int = 4,
    train_size: int = 2048,
    kmeans_iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> ray.data.Dataset:
    """Approximate cosine top-k via an IVF (inverted-file) index — the
    standard coarse-quantizer scale path beside lsh_topk: k-means
    centroids trained on a small deterministic sample (the lowest
    ``train_size`` ids), every vector assigned to its nearest centroid
    in one streaming pass, and each query scored only against vectors
    whose list is among its ``nprobe`` closest centroids.  Same output
    schema as brute_force_topk; recall grows with nprobe/nlist.

    Scale shape: training is O(train_size·dim) on the driver (bounded,
    independent of N); the scan is one map_batches with a broadcast
    (nlist, dim) centroid matrix; per batch the mask prunes scoring to
    the probed fraction ≈ nprobe/nlist of rows."""
    rng = np.random.default_rng(seed)
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-30)

    # --- train: deterministic sample, spherical k-means ----------------
    # hash-sample instead of sort().limit(): an md5-prefix rule needs no
    # global sort (one digest per row, no shuffle) and is parallelism-
    # invariant; the acceptance band is sized from the dataset count so
    # ~2x train_size rows pass, then limit() trims deterministically
    total = max(int(embeddings.count()), 1)
    frac = min(1.0, (2.0 * train_size) / total)
    thresh = format(int(frac * 0xFFFFFFFF), "08x")

    def _hash_sample(b: pa.Table) -> pa.Table:
        import hashlib

        ids = b[id_col].to_numpy(zero_copy_only=False)
        keep = np.array([
            hashlib.md5(str(int(i)).encode()).hexdigest()[:8] <= thresh
            for i in ids], dtype=bool)
        return b.filter(pa.array(keep))

    sample_t = (embeddings.map_batches(_hash_sample, batch_format="pyarrow",
                                       batch_size=None)
                .sort(id_col).limit(train_size).take_all())
    sm = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample_t])
    sm = sm / np.maximum(np.linalg.norm(sm, axis=1, keepdims=True), 1e-30)
    nlist = min(nlist, len(sm))
    cent = sm[rng.choice(len(sm), nlist, replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(sm @ cent.T, axis=1)
        for c in range(nlist):
            members = sm[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    c_ref = ray.put(cent)

    # --- probe lists per query ----------------------------------------
    nprobe = min(nprobe, nlist)
    qc = qn @ cent.T
    probes = np.argpartition(-qc, nprobe - 1, axis=1)[:, :nprobe]
    probe_masks = np.zeros((len(qn), nlist), dtype=bool)
    probe_masks[np.arange(len(qn))[:, None], probes] = True
    q_ref = ray.put(qn)
    pm_ref = ray.put(probe_masks)

    def _partial(b: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        c = ray.get(c_ref)
        pm = ray.get(pm_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        m = _to_matrix(b[vec_col])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        assign = np.argmax(m @ c.T, axis=1)          # (B,)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(q)):
            sel = pm[qi][assign]
            if not sel.any():
                continue
            row = q[qi] @ m[sel].T
            kk = min(k, len(row))
            idx = np.argpartition(-row, kk - 1)[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_n.append(ids[sel][idx])
            out_s.append(row[idx])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return pa.table(
            {"query_id": pa.array(np.concatenate(out_q), pa.int64()),
             "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
             "score": pa.array(np.concatenate(out_s), pa.float64())})

    partials = embeddings.map_batches(
        _partial, batch_format="pyarrow", batch_size=None).materialize()
    return partials.repartition(1).map_batches(
        _merge_topk(k), batch_format="pyarrow", batch_size=None)


def _merge_topk(k: int):
    """Final global top-k over the tiny (Q·k per block) partial stream —
    the same merge brute_force_topk/lsh_topk inline."""
    def _final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "query_id" not in b.column_names:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        qid = b["query_id"].to_numpy(zero_copy_only=False)
        nid = b["neighbor_id"].to_numpy(zero_copy_only=False)
        sc = b["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nid, -sc, qid))
        qid, nid, sc = qid[order], nid[order], sc[order]
        keep = np.zeros(len(qid), dtype=bool)
        count, prev = 0, None
        for i in range(len(qid)):
            if qid[i] != prev:
                prev, count = qid[i], 0
            if count < k:
                keep[i] = True
                count += 1
        return pa.table(
            {"query_id": pa.array(qid[keep], pa.int64()),
             "neighbor_id": pa.array(nid[keep], pa.int64()),
             "score": pa.array(sc[keep], pa.float64())})
    return _final


def kmeans_clusters(
    embeddings: ray.data.Dataset,
    nlist: int = 16,
    train_size: int = 2048,
    kmeans_iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> ray.data.Dataset:
    """Semantic clustering of an embedding column: spherical k-means
    (cosine) assignments (vec_id, cluster, score) — the IVF coarse
    quantizer (ivf_topk above) exposed as a first-class pipeline for
    topic bucketing / diversity sampling in training-data curation.

    Scale shape: identical to ivf_topk's training — bounded
    deterministic md5-prefix sample, O(train_size·dim) driver k-means,
    then ONE streaming assignment pass with the (nlist, dim) centroid
    matrix broadcast by ref; cluster ids are stable under any input
    partitioning (pure function of the vector and the trained
    centroids)."""
    rng = np.random.default_rng(seed)
    total = max(int(embeddings.count()), 1)
    frac = min(1.0, (2.0 * train_size) / total)
    thresh = format(int(frac * 0xFFFFFFFF), "08x")

    def _hash_sample(b: pa.Table) -> pa.Table:
        import hashlib

        ids = b[id_col].to_numpy(zero_copy_only=False)
        keep = np.array([
            hashlib.md5(str(int(i)).encode()).hexdigest()[:8] <= thresh
            for i in ids], dtype=bool)
        return b.filter(pa.array(keep))

    sample_t = (embeddings.map_batches(_hash_sample, batch_format="pyarrow",
                                       batch_size=None)
                .sort(id_col).limit(train_size).take_all())
    sm = np.stack([np.asarray(r[vec_col], dtype=np.float64)
                   for r in sample_t])
    sm = sm / np.maximum(np.linalg.norm(sm, axis=1, keepdims=True), 1e-30)
    nlist = min(nlist, len(sm))
    cent = sm[rng.choice(len(sm), nlist, replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(sm @ cent.T, axis=1)
        for c in range(nlist):
            members = sm[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    c_ref = ray.put(cent)

    def _assign(b: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _to_matrix(b[vec_col])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = m @ c.T
        a = np.argmax(sims, axis=1)
        return pa.table({
            "vec_id": pa.array(ids),
            "cluster": pa.array(a.astype(np.int64)),
            "score": pa.array(sims[np.arange(len(a)), a]),
        })

    return embeddings.map_batches(_assign, batch_format="pyarrow",
                                  batch_size=None)


# --------------------------------------------------------------------------
# distributed second moments / PCA


def _moment_partials(embeddings: ray.data.Dataset, col: str):
    """Per-batch (n, Σx, XᵀX) partial rows — the one streaming pass
    behind covariance and PCA. Each partial is a single row holding
    d + d² doubles; the full matrix never leaves the workers."""

    def _p(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or col not in b.column_names:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.float64())),
                             "ss": pa.array([], pa.list_(pa.float64()))})
        X = _to_matrix(b[col])
        return pa.table({
            "n": pa.array([X.shape[0]], pa.int64()),
            "s": pa.array([X.sum(axis=0).tolist()],
                          pa.list_(pa.float64())),
            "ss": pa.array([(X.T @ X).ravel().tolist()],
                           pa.list_(pa.float64()))})

    return embeddings.map_batches(_p, batch_format="pyarrow",
                                  batch_size=None)


def _reduce_moments(partials: ray.data.Dataset):
    """(n, mean, cov) from the partial rows — one small reduce task."""

    @ray.remote
    def _r(refs):
        parts = [t for t in ray.get(list(refs))
                 if t.num_rows > 0 and "n" in t.column_names]
        if not parts:
            return 0, None, None
        t = pa.concat_tables(parts)
        n = int(np.sum(t["n"].to_numpy(zero_copy_only=False)))
        s = np.sum(np.array(t["s"].to_pylist(), dtype=np.float64), axis=0)
        ss = np.sum(np.array(t["ss"].to_pylist(), dtype=np.float64), axis=0)
        d = len(s)
        mu = s / n
        cov = (ss.reshape(d, d) - n * np.outer(mu, mu)) / max(1, n - 1)
        return n, mu, cov

    return ray.get(_r.remote(partials.materialize().to_arrow_refs()))


def embedding_covariance(
    embeddings: ray.data.Dataset, col: str = "embedding"
) -> pa.Table:
    """Upper-triangle sample covariance of the embedding column,
    integer-quantized e6: (i, j, cov_e6) rows, i <= j. ONE streaming
    pass over the data (per-batch XᵀX partials), d×d algebra in a
    single small task — the column is never materialized."""
    n, mu, cov = _reduce_moments(_moment_partials(embeddings, col))
    if cov is None:
        return pa.table({"i": pa.array([], pa.int64()),
                         "j": pa.array([], pa.int64()),
                         "cov_e6": pa.array([], pa.int64())})
    d = cov.shape[0]
    iu, ju = np.triu_indices(d)
    vals = np.round(cov[iu, ju] * 1e6).astype(np.int64)
    return pa.table({"i": pa.array(iu.astype(np.int64)),
                     "j": pa.array(ju.astype(np.int64)),
                     "cov_e6": pa.array(vals)})


def pca_project(
    embeddings: ray.data.Dataset,
    k: int = 2,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Project every vector onto the top-k principal components.

    The d×d covariance comes from the same one-pass partials; the
    eigendecomposition is d×d driver algebra (d = embedding dim, tiny);
    the k×d component matrix is captured in the projection closure
    (broadcast once per worker) and the projection is one numpy matmul
    per batch. Component signs are canonicalized (largest-|coeff|
    entry positive) so output is deterministic."""
    n, mu, cov = _reduce_moments(_moment_partials(embeddings, col))
    if cov is None:
        raise ValueError("empty embedding dataset")
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]  # d × k
    for c in range(comps.shape[1]):
        m = np.argmax(np.abs(comps[:, c]))
        if comps[m, c] < 0:
            comps[:, c] = -comps[:, c]
    mu_b = mu.copy()

    def _proj(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or col not in b.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             **{f"pc{c}": pa.array([], pa.float64())
                                for c in range(k)}})
        X = _to_matrix(b[col]) - mu_b
        P = X @ comps
        return pa.table({id_col: b[id_col],
                         **{f"pc{c}": pa.array(P[:, c], pa.float64())
                            for c in range(k)}})

    return embeddings.map_batches(_proj, batch_format="pyarrow",
                                  batch_size=None)
