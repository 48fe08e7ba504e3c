"""Modularity of a membership vector (igraph_modularity, community.c:875-941).

Per edge (each stored edge once, weight w): internal edges add 2w to their
community's e[c]; both endpoints add w to a[c]. Q = Σ_c e[c]/2m − (a[c]/2m)²
with m = Σw. Distributed as: two hash joins to attach memberships →
per-batch partial (community, e, a) sums → one small groupby → scalar
finalize (the partial+final aggregate pattern, SURVEY.md §2.7).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.util import hash_join


def modularity(
    edges: ray.data.Dataset,
    membership: ray.data.Dataset,
    weighted: bool = False,
    num_partitions: int = 8,
) -> float:
    """membership: Dataset (vertex, community). Returns igraph's Q."""

    def _ms(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["vertex"], "c_src": b["community"]})

    def _md(b: pa.Table) -> pa.Table:
        return pa.table({"dst": b["vertex"], "c_dst": b["community"]})

    j = hash_join(edges, membership.map_batches(_ms, batch_format="pyarrow", batch_size=None),
                  on="src", num_partitions=num_partitions)
    j = hash_join(j, membership.map_batches(_md, batch_format="pyarrow", batch_size=None),
                  on="dst", num_partitions=num_partitions)

    def _partial(b: pa.Table) -> pa.Table:
        cs = b["c_src"].to_numpy(zero_copy_only=False)
        cd = b["c_dst"].to_numpy(zero_copy_only=False)
        w = (
            b["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
            if weighted and "weight" in b.column_names
            else np.ones(len(cs))
        )
        comm = np.concatenate([cs, cd, cs[cs == cd]])
        val_a = np.concatenate([w, w, np.zeros((cs == cd).sum())])
        val_e = np.concatenate([np.zeros(2 * len(cs)), 2.0 * w[cs == cd]])
        uniq, inv = np.unique(comm, return_inverse=True)
        return pa.table(
            {
                "community": pa.array(uniq, pa.int64()),
                "e": pa.array(np.bincount(inv, weights=val_e), pa.float64()),
                "a": pa.array(np.bincount(inv, weights=val_a), pa.float64()),
                "m": pa.array(
                    np.where(np.arange(len(uniq)) == 0, w.sum(), 0.0), pa.float64()
                ),
            }
        )

    g = (
        j.map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .groupby("community")
        .sum(["e", "a", "m"])
        .materialize()
    )

    # two distributed scalar passes; community count can be huge, so the
    # per-community table never reaches the driver
    from igraph_ray.superstep import _aggregate

    m = _aggregate(g, ["sum(m)"])["sum(m)"]
    if m <= 0:
        return 0.0

    def _qpart(b: pa.Table) -> pa.Table:
        e = b["sum(e)"].to_numpy(zero_copy_only=False)
        a = b["sum(a)"].to_numpy(zero_copy_only=False)
        q = e / (2 * m) - (a / (2 * m)) ** 2
        return pa.table({"q": pa.array(q, pa.float64())})

    qds = g.map_batches(_qpart, batch_format="pyarrow", batch_size=None).materialize()
    return _aggregate(qds, ["q"])["q"]


def modularity_matrix(
    edges: ray.data.Dataset,
    n: int,
    max_vertices: int = 4096,
) -> ray.data.Dataset:
    """Modularity matrix export (igraph_modularity_matrix,
    /root/reference/src/community.c:947): B_ij = A_ij − k_i·k_j / 2m
    over the undirected simple graph. Emitted EXACTLY as integers:
    (i, j, b_num) upper-triangle rows with b_num = A_ij·2m − k_i·k_j
    (the caller divides by the constant 2m) — no float anywhere.

    The matrix is dense by nature (the reference returns a dense
    igraph_matrix_t), so the export is guarded to ``max_vertices``;
    degrees and the edge-key set broadcast once, the O(n²) row space
    streams from a range dataset."""
    import ray as _ray

    if n > max_vertices:
        raise NotImplementedError(
            f"modularity_matrix is a dense O(n²) export, guarded to "
            f"{max_vertices} vertices ({n} present)")

    def _und(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "src" not in b.column_names:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        lo = np.minimum(s[keep], d[keep])
        hi = np.maximum(s[keep], d[keep])
        return pa.table({"lo": pa.array(lo), "hi": pa.array(hi)})

    und = (edges.map_batches(_und, batch_format="pyarrow",
                             batch_size=None)
           .groupby(["lo", "hi"]).count()
           .select_columns(["lo", "hi"]).materialize())

    @_ray.remote
    def _pack(refs):
        ts = [t for t in _ray.get(list(refs))
              if t.num_rows > 0 and "lo" in t.column_names]
        if not ts:
            return np.empty(0, np.int64), np.zeros(n, np.int64), 0
        t = pa.concat_tables(ts)
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        deg = np.zeros(n, np.int64)
        np.add.at(deg, lo, 1)
        np.add.at(deg, hi, 1)
        keys = np.sort(lo * n + hi)
        return keys, deg, len(lo)

    keys_ref = _pack.remote(und.to_arrow_refs())
    keys, deg, m = _ray.get(keys_ref)
    keys_b = _ray.put(keys)
    deg_b = _ray.put(deg)
    two_m = 2 * m

    def _rows(b: pa.Table) -> pa.Table:
        i = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ks = _ray.get(keys_b)
        dg = _ray.get(deg_b)
        outs_i, outs_j, outs_b = [], [], []
        for ii in i:
            j = np.arange(ii, n, dtype=np.int64)
            a = np.zeros(len(j), np.int64)
            pos = np.searchsorted(ks, ii * n + j)
            ok = (pos < len(ks)) & (ks[np.minimum(pos, len(ks) - 1)]
                                    == ii * n + j)
            a[ok] = 1
            outs_i.append(np.full(len(j), ii, np.int64))
            outs_j.append(j)
            outs_b.append(a * two_m - dg[ii] * dg[j])
        return pa.table({
            "i": pa.array(np.concatenate(outs_i)),
            "j": pa.array(np.concatenate(outs_j)),
            "b_num": pa.array(np.concatenate(outs_b))})

    return ray.data.range(n).map_batches(_rows, batch_format="pyarrow",
                                         batch_size=None)
