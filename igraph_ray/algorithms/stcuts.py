"""All minimal s-t edge cuts (igraph_all_st_cuts / igraph_all_st_mincuts,
st-cuts.c:976,1290; Provan & Shier 1996).

A minimal s-t edge cut of a digraph corresponds 1:1 to a partition
(S, T): s ∈ S, t ∈ T, every vertex of S reachable from s inside G[S],
and every vertex of T reaching t inside G[T]; the cut is δ⁺(S). The
reference enumerates these S-sets with the Provan–Shier recursion;
this module enumerates them by the same characterization over the
2^(n−2) candidate masks in ONE guarded task — exponential by nature,
exactly like the reference's output size, and SQL-replayable (the
oracle checks the identical closure conditions per mask with a
recursive reachability CTE).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.graph import Graph

_MAX_CUT_VERTICES = 22


@ray.remote
def _cuts_task(arrays, s: int, t: int, mincuts_only: bool) -> pa.Table:
    src, dst = arrays
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # restrict to the RELEVANT set R = reach(s) ∩ coreach(t): every
    # s-t path lives in R, so the cut set of G equals the cut set of
    # G[R], and within R the Provan–Shier closed-partition bijection
    # holds (vertices off all s-t paths are not assignable)
    allv = np.unique(np.concatenate([src, dst, [s, t]]))
    fwd = {int(v): [] for v in allv}
    bwd = {int(v): [] for v in allv}
    for a, b in zip(src.tolist(), dst.tolist()):
        fwd[int(a)].append(int(b))
        bwd[int(b)].append(int(a))

    def _bfs(root, adj):
        seen = {root}
        q = [root]
        while q:
            v = q.pop()
            for u in adj[v]:
                if u not in seen:
                    seen.add(u)
                    q.append(u)
        return seen

    R = _bfs(int(s), fwd) & _bfs(int(t), bwd)
    R |= {int(s), int(t)}
    inR = np.array([int(a) in R and int(b) in R
                    for a, b in zip(src.tolist(), dst.tolist())])
    if len(src):
        src, dst = src[inR], dst[inR]
    verts = np.unique(np.concatenate([src, dst, [s, t]]))
    n = len(verts)
    if n > _MAX_CUT_VERTICES:
        raise NotImplementedError(
            f"all_st_cuts enumerates up to 2^(n-2) cuts; guarded to "
            f"{_MAX_CUT_VERTICES} vertices ({n} present)")
    ridx = {int(v): i for i, v in enumerate(verts)}
    es = [(ridx[int(a)], ridx[int(b)]) for a, b in zip(src, dst)]
    es = sorted(set(es))
    si, ti = ridx[int(s)], ridx[int(t)]
    out_adj = [[] for _ in range(n)]
    in_adj = [[] for _ in range(n)]
    for a, b in es:
        out_adj[a].append(b)
        in_adj[b].append(a)

    def grown(mask: int, root: int, adj) -> int:
        """Bits reachable from root inside mask via adj."""
        seen = 1 << root
        stack = [root]
        while stack:
            v = stack.pop()
            for u in adj[v]:
                bu = 1 << u
                if (mask & bu) and not (seen & bu):
                    seen |= bu
                    stack.append(u)
        return seen

    full = (1 << n) - 1
    cuts = []
    for m in range(1 << n):
        if not (m >> si) & 1 or (m >> ti) & 1:
            continue
        comp = full ^ m
        # (1) S is s-generated: every vertex of S reachable from s
        #     inside G[S] — then C = δ⁺(S) IS a cut and S = reach(s)
        #     in G∖C (any escape from S would need a removed edge)
        if grown(m, si, out_adj) != m:
            continue
        cut = [(a, b) for a, b in es
               if (m >> a) & 1 and not (m >> b) & 1]
        # (2) minimality: adding back any cut edge (u, v) must reopen
        #     an s-t path, i.e. its HEAD v reaches t — and after the
        #     cut removal such a path can never re-enter S, so v must
        #     reach t INSIDE G[T] (heads only: other T vertices are
        #     unconstrained, they just can't lie on any reopened path)
        w = grown(comp, ti, in_adj)  # vertices reaching t inside T
        if any(not (w >> b) & 1 for _, b in cut):
            continue
        # the ORIGINAL-id mask is the canonical cut id
        mid = sum(1 << int(verts[i]) for i in range(n) if (m >> i) & 1)
        cuts.append((mid, cut))
    if mincuts_only and cuts:
        k = min(len(c) for _, c in cuts)
        cuts = [(mid, c) for mid, c in cuts if len(c) == k]
    rows_m, rows_s, rows_d = [], [], []
    for mid, cut in cuts:
        for a, b in cut:
            rows_m.append(mid)
            rows_s.append(int(verts[a]))
            rows_d.append(int(verts[b]))
    return pa.table({"cut_id": pa.array(rows_m, pa.int64()),
                     "src": pa.array(rows_s, pa.int64()),
                     "dst": pa.array(rows_d, pa.int64())})


def all_st_cuts(graph: Graph, s: int, t: int,
                mincuts_only: bool = False) -> ray.data.Dataset:
    """(cut_id, src, dst) rows of every minimal s-t edge cut; cut_id is
    the ORIGINAL-vertex-id bitmask of the source side S (vertex ids
    must stay below 63 for the id to fit int64)."""
    from igraph_ray.algorithms.dominators import directed_arrays_ref

    ref = directed_arrays_ref(graph.edges)
    return ray.data.from_arrow(
        ray.get(_cuts_task.remote(ref, int(s), int(t), mincuts_only)))
