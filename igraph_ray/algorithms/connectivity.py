"""Global vertex connectivity and the Gomory–Hu cut tree.

Reference semantics:

* igraph_vertex_connectivity (/root/reference/src/flow.c:1923-2058):
  after the quick checks (not (strongly) connected → 0; min degree 1 →
  1) the reference minimizes igraph_st_vertex_connectivity over ALL
  ordered pairs (O(|V|⁵)). This engine computes the same value with the
  classic single-pivot reduction (Even, "Graph Algorithms", public):
  for undirected G and any pivot v,
  κ(G) = min( min_{u ∉ N[v]} κ(v,u),
              min_{u,w ∈ N(v), u≠w, w ∉ N[u]} κ(u,w) )
  — every minimum separator either misses v (then it separates v from
  a non-neighbor) or contains v (then it separates two neighbors of
  v). Each κ(s,t) is the unit-capacity max flow on the vertex-split
  graph (flow.c:1717-1803, same construction as the engine's
  distributed st_vertex_connectivity).

* igraph_gomory_hu_tree (flow.c:2389-2460, Gusfield 1990): tree over
  the vertices where the min edge weight on the tree path u→v equals
  the u-v min cut. Gusfield's loop: neighbors[*]=0; for source=1..n-1:
  target=neighbors[source]; run maxflow(source,target); record the
  value; re-hang every mid>source with neighbors[mid]==target that
  falls on the SOURCE side of the cut.

Distributed shape: the capacity aggregation is the shared distributed
groupby; the n−1 (Gomory–Hu) / O(n+deg²) (connectivity) flow loop is
inherently sequential, and each flow here is on the SAME small graph —
so the loop runs inside ONE Ray task with a local Dinic over the
broadcast arrays, guarded by ``max_vertices`` (honest-ceiling style;
the distributed per-pair primitives — maxflow / st_vertex_connectivity
in algorithms/flow.py — are the scale path for single cuts on big
graphs)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.algorithms.fastgreedy import _aggregate_und, und_arrays_ref


def _dinic(n: int, arc_src, arc_dst, arc_cap, s: int, t: int):
    """Local Dinic max flow. Returns (value, source_side bool array).
    Arcs are directed; callers add both directions for undirected."""
    m = len(arc_src)
    # adjacency with paired reverse arcs
    head = [[] for _ in range(n)]
    cap = np.zeros(2 * m, dtype=np.float64)
    to = np.zeros(2 * m, dtype=np.int64)
    for i in range(m):
        a, b = int(arc_src[i]), int(arc_dst[i])
        cap[2 * i] = arc_cap[i]
        to[2 * i] = b
        to[2 * i + 1] = a
        head[a].append(2 * i)
        head[b].append(2 * i + 1)
    INF = float("inf")
    value = 0.0
    while True:
        # BFS level graph
        level = np.full(n, -1, dtype=np.int64)
        level[s] = 0
        q = [s]
        while q:
            nq = []
            for u in q:
                for ei in head[u]:
                    v = int(to[ei])
                    if cap[ei] > 1e-12 and level[v] < 0:
                        level[v] = level[u] + 1
                        nq.append(v)
            q = nq
        if level[t] < 0:
            side = level >= 0  # residual-reachable from s
            return value, side
        it = [0] * n

        def dfs(u: int, f: float) -> float:
            if u == t:
                return f
            while it[u] < len(head[u]):
                ei = head[u][it[u]]
                v = int(to[ei])
                if cap[ei] > 1e-12 and level[v] == level[u] + 1:
                    d = dfs(v, min(f, float(cap[ei])))
                    if d > 1e-12:
                        cap[ei] -= d
                        cap[ei ^ 1] += d
                        return d
                it[u] += 1
            return 0.0

        import sys
        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, n + 1000))
        try:
            while True:
                f = dfs(s, INF)
                if f <= 1e-12:
                    break
                value += f
        finally:
            sys.setrecursionlimit(old)


def _und_ref(graph: Graph, weighted: bool):
    """ObjectRef to (lo, hi, w) of the aggregated undirected edges —
    task-side assembly, nothing on the driver; w forced to ones for the
    unweighted view."""
    agg = _aggregate_und(graph).materialize()
    ref = und_arrays_ref(agg)
    if weighted:
        return ref

    @ray.remote
    def _ones(arrs):
        lo, hi, _ = arrs
        return lo, hi, np.ones(len(lo), np.float64)

    return _ones.remote(ref)


def vertex_connectivity(
    graph: Graph,
    n: Optional[int] = None,
    checks: bool = True,
    max_vertices: int = 1024,
) -> int:
    """igraph_vertex_connectivity of the undirected simple view.
    Disconnected → 0; K_n → n−1 (no non-adjacent pair exists)."""
    n = n if n is not None else graph.num_vertices()
    if n > max_vertices:
        raise NotImplementedError(
            f"exact vertex connectivity is guarded to {max_vertices} "
            f"vertices ({n} present) — use st_vertex_connectivity for "
            f"single pairs at scale")
    arrays = _und_ref(graph, weighted=False)

    @ray.remote
    def _kappa(arrs):
        lo, hi, _w = arrs
        if n <= 1:
            return 0
        nbr = [set() for _ in range(n)]
        for a, b in zip(lo.tolist(), hi.tolist()):
            nbr[a].add(b)
            nbr[b].add(a)
        # connectivity check (BFS from 0)
        seen = np.zeros(n, dtype=bool)
        seen[0] = True
        q = [0]
        while q:
            u = q.pop()
            for v in nbr[u]:
                if not seen[v]:
                    seen[v] = True
                    q.append(v)
        if not seen.all():
            return 0
        deg = np.array([len(s) for s in nbr])
        if checks and deg.min() == 1:
            return 1
        if deg.min() == 0:
            return 0

        def _st_kappa(s: int, t: int) -> int:
            # vertex-split unit graph (flow.c:1717): v_out=v, v_in=n+v
            asrc, adst, acap = [], [], []
            for a in range(n):
                for b in nbr[a]:
                    # arc a->b becomes a -> (n+b) unless b is s/t
                    bb = b if b in (s, t) else n + b
                    asrc.append(a)
                    adst.append(bb)
                    acap.append(float(n))  # effectively infinite
            for v in range(n):
                asrc.append(n + v)
                adst.append(v)
                acap.append(1.0)
            val, _side = _dinic(2 * n, np.array(asrc), np.array(adst),
                                np.array(acap), s, t)
            return int(round(val))

        # pivot: smallest id among minimum degree (deterministic)
        piv = int(np.flatnonzero(deg == deg.min())[0])
        best = n - 1
        for u in range(n):
            if u != piv and u not in nbr[piv]:
                best = min(best, _st_kappa(piv, u))
                if best == 0:
                    return 0
        nb = sorted(nbr[piv])
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                u, w_ = nb[i], nb[j]
                if w_ not in nbr[u]:
                    best = min(best, _st_kappa(u, w_))
        return int(best)

    return ray.get(_kappa.remote(arrays))


def gomory_hu_tree(
    graph: Graph,
    weight_col: Optional[str] = None,
    n: Optional[int] = None,
    max_vertices: int = 1024,
) -> pa.Table:
    """igraph_gomory_hu_tree (flow.c:2389, Gusfield): returns the cut
    tree as (vertex, parent, flow_e6) rows for vertex = 1..n−1 —
    min-cut(u,v) == min flow_e6 on the tree path (×10⁻⁶). Vertices in
    different components get flow 0 (cut value 0)."""
    n = n if n is not None else graph.num_vertices()
    if n > max_vertices:
        raise NotImplementedError(
            f"Gomory–Hu runs n-1 sequential flows; guarded to "
            f"{max_vertices} vertices ({n} present)")
    arrays = _und_ref(graph, weighted=weight_col is not None)

    @ray.remote
    def _gusfield(arrs):
        lo, hi, w = arrs
        asrc = np.concatenate([lo, hi])
        adst = np.concatenate([hi, lo])
        acap = np.concatenate([w, w])
        parent = np.zeros(n, dtype=np.int64)
        flow = np.zeros(n, dtype=np.float64)
        for source in range(1, n):
            target = int(parent[source])
            val, side = _dinic(n, asrc, adst, acap, source, target)
            flow[source] = val
            for mid in range(source + 1, n):
                if parent[mid] == target and side[mid]:
                    parent[mid] = source
        return parent, flow

    parent, flow = ray.get(_gusfield.remote(arrays))
    vs = np.arange(1, n, dtype=np.int64)
    return pa.table({
        "vertex": pa.array(vs),
        "parent": pa.array(parent[1:]),
        "flow_e6": pa.array(np.round(flow[1:] * 1e6).astype(np.int64)),
    })
