"""Exact maximum-modularity partition
(igraph_community_optimal_modularity, optimal_modularity.c:38).

The reference encodes the problem as a GLPK integer LP over pairwise
co-membership variables; this module computes the same exact optimum by
branch-and-bound over restricted-growth assignments (every set
partition enumerated once, assignment order = degree descending), with
the admissible bound Q(partial) + E_open/m — any completion can add at
most one 1/m edge term per edge still touching an unassigned vertex
and the degree penalty only subtracts. Modularity itself follows
modularity.c:69: Q = Σ_c [e_c/m − (d_c/2m)²] on the simple undirected
view.

NP-hard, so exactly like the reference this is practical only for tiny
graphs: ONE guarded Ray task over the object-store edge arrays (the
dominators/chordal pattern), hard-capped at ``max_vertices``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.graph import Graph

MAX_OPTIMAL_VERTICES = 20


@ray.remote
def _bb_task(arrays, n_cap: int):
    src, dst = arrays
    keep = src != dst
    src, dst = src[keep], dst[keep]
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    und = np.unique(lo * (np.int64(1) << 32) + hi)
    lo, hi = und // (np.int64(1) << 32), und % (np.int64(1) << 32)
    verts = np.unique(np.concatenate([lo, hi]))
    n = len(verts)
    if n > n_cap:
        raise NotImplementedError(
            f"optimal_modularity is exact and NP-hard; guarded to "
            f"{n_cap} vertices ({n} present) — the reference's GLPK ILP "
            f"has the same practical envelope")
    m = len(und)
    if m == 0:
        return pa.table({"vertex": pa.array(verts.astype(np.int64)),
                         "community": pa.array(verts.astype(np.int64)),
                         "q_e9": pa.array(np.zeros(n, np.int64))})
    ridx = {int(v): i for i, v in enumerate(verts)}
    A = np.zeros((n, n), np.float64)
    for a, b in zip(lo.tolist(), hi.tolist()):
        A[ridx[a], ridx[b]] += 1.0
        A[ridx[b], ridx[a]] += 1.0
    deg = A.sum(1)
    order = np.argsort(-deg, kind="stable")
    # open-edge count per prefix: edges with >=1 endpoint after prefix i
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    epos = np.maximum(inv[np.searchsorted(verts, lo)],
                      inv[np.searchsorted(verts, hi)])
    open_after = np.array([(epos >= i).sum() for i in range(n + 1)],
                          np.float64)

    # greedy-agglomerative incumbent (CNM sketch) so the bound prunes
    # from the first branches
    g_assign = np.arange(n, dtype=np.int64)
    g_in = np.zeros(n, np.float64)
    g_deg = deg.copy()
    cross = A.copy()
    alive = np.ones(n, bool)
    while True:
        bestd, bi, bj = 0.0, -1, -1
        idx = np.flatnonzero(alive)
        for ii in idx:
            for jj in idx:
                if jj <= ii or cross[ii, jj] == 0:
                    continue
                d = (cross[ii, jj] / m
                     - 2.0 * g_deg[ii] * g_deg[jj] / (4.0 * m * m))
                if d > bestd:
                    bestd, bi, bj = d, ii, jj
        if bi < 0:
            break
        g_assign[g_assign == bj] = bi
        g_in[bi] += g_in[bj] + cross[bi, bj]
        g_deg[bi] += g_deg[bj]
        cross[bi, :] += cross[bj, :]
        cross[:, bi] += cross[:, bj]
        cross[bi, bi] = 0.0
        cross[bj, :] = 0.0
        cross[:, bj] = 0.0
        alive[bj] = False
    gq = float((g_in[alive] / m
                - (g_deg[alive] / (2.0 * m)) ** 2).sum())
    # relabel the incumbent to dense 0..k-1 in assignment order so the
    # final table path can consume it if B&B never improves on it
    dense = {}
    inc = np.empty(n, np.int64)
    for v in order:
        c = int(g_assign[v])
        if c not in dense:
            dense[c] = len(dense)
        inc[v] = dense[c]

    best_q = gq
    best_assign = inc
    assign = np.full(n, -1, np.int64)
    # per-community running sums
    com_deg = np.zeros(n, np.float64)
    com_in = np.zeros(n, np.float64)   # internal edge count e_c

    def q_of(k_used: int) -> float:
        return float(
            (com_in[:k_used] / m
             - (com_deg[:k_used] / (2.0 * m)) ** 2).sum())

    def rec(i: int, k_used: int):
        nonlocal best_q, best_assign
        if i == n:
            q = q_of(k_used)
            if q > best_q:
                best_q = q
                best_assign = assign.copy()
            return
        # admissible bound: every still-open edge can contribute at most
        # 1/m; the degree penalty is monotone non-increasing
        if q_of(k_used) + open_after[i] / m <= best_q:
            return
        v = order[i]
        for c in range(k_used + 1):  # existing communities + one new
            dv = float(deg[v])
            ein = float(A[v, order[:i]][assign[order[:i]] == c].sum()) \
                if i else 0.0
            assign[v] = c
            com_deg[c] += dv
            com_in[c] += ein
            rec(i + 1, max(k_used, c + 1))
            com_deg[c] -= dv
            com_in[c] -= ein
            assign[v] = -1

    rec(0, 0)
    # canonical labels: community id = min member vertex id
    labels = np.empty(n, np.int64)
    for c in np.unique(best_assign):
        members = verts[best_assign == c]
        labels[best_assign == c] = members.min()
    q_e9 = int(round(best_q * 1e9))
    o = np.argsort(verts)
    return pa.table({"vertex": pa.array(verts[o].astype(np.int64)),
                     "community": pa.array(labels[o]),
                     "q_e9": pa.array(np.full(n, q_e9, np.int64))})


def optimal_modularity(graph: Graph,
                       max_vertices: int = MAX_OPTIMAL_VERTICES
                       ) -> ray.data.Dataset:
    """(vertex, community, q_e9) of the exact maximum-modularity
    partition; community ids are min-member canonical and q_e9 is the
    optimum ×1e9 rounded, replicated per row."""
    from igraph_ray.algorithms.dominators import directed_arrays_ref

    ref = directed_arrays_ref(graph.edges)
    return ray.data.from_arrow(ray.get(_bb_task.remote(ref, max_vertices)))
