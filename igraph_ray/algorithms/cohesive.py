"""Cohesive blocking — the engine's igraph_cohesive_blocks
(/root/reference/src/cohesive_blocks.c:202; Moody & White, "Structural
cohesion and embeddedness", ASR 68:103 (2003)).

The Moody–White recursion: for each candidate subgraph, compute its
vertex connectivity k, enumerate ALL minimum-size vertex separators,
and recurse on (a) every component of the subgraph minus the union of
separator vertices — re-attaching the neighboring separator vertices —
and (b) the separator-vertex union itself; a candidate is kept as a
block unless an ancestor already has ≥ its cohesion or it is a subset
of another block with ≥ cohesion (the reference's two post-filters,
cohesive_blocks.c:439-484, replicated exactly — validated against the
reference's own example outputs in tests/test_cohesive.py).

Minimum-size separator enumeration replaces the reference's
Even–Tarjan + all-st-mincuts machinery (separators.c:643) with the
recursive peeling identity: S (|S| = k) separates G iff for any u ∈ S,
S∖{u} separates G−u — so all size-k separators are {u} ∪ T over all
vertices u and all size-(k−1) separators T of G−u, with articulation
points as the base. O(n^{k-1}·(n+m)) — guarded; fine for the small
deep blocks where k ≥ 2 ever occurs, and k ≤ 1 levels (the common
case) cost one articulation-point pass.

The recursion is inherently sequential (children depend on the
parent's separator enumeration), so — like vertex_connectivity /
Gomory–Hu — it runs inside ONE Ray task over the broadcast aggregated
undirected arrays, guarded by ``max_edges``. Per-candidate κ uses the
same Even-pivot + local-Dinic scheme as algorithms/connectivity.py.
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List, Set, Tuple

import numpy as np
import pyarrow as pa
import ray

from igraph_ray.graph import Graph
from igraph_ray.algorithms.connectivity import _dinic
from igraph_ray.algorithms.fastgreedy import _aggregate_und, und_arrays_ref


def _components_incl_nbrs(nodes: List[int], adj: Dict[int, Set[int]],
                          marked: Set[int]) -> List[List[int]]:
    """Components over unmarked vertices; each component also absorbs
    the marked vertices adjacent to it (traversal stops there) —
    cohesive_blocks.c's igraph_i_cb_components contract."""
    seen: Set[int] = set()
    out: List[List[int]] = []
    for start in nodes:
        if start in marked or start in seen:
            continue
        comp = {start}
        seen.add(start)
        stack = [start]
        while stack:
            v = stack.pop()
            for w in adj[v]:
                if w in comp:
                    continue
                comp.add(w)
                if w not in marked:
                    seen.add(w)
                    stack.append(w)
        out.append(sorted(comp))
    return out


def _articulation_points(nodes: List[int],
                         adj: Dict[int, Set[int]]) -> Set[int]:
    """Iterative Tarjan lowpoint APs on the local subgraph."""
    disc: Dict[int, int] = {}
    low: Dict[int, int] = {}
    aps: Set[int] = set()
    timer = 0
    for root in nodes:
        if root in disc:
            continue
        stack: List[Tuple[int, int, list]] = [(root, -1, list(adj[root]))]
        disc[root] = low[root] = timer
        timer += 1
        root_children = 0
        while stack:
            v, parent, it = stack[-1]
            if it:
                w = it.pop()
                if w == parent:
                    continue
                if w in disc:
                    low[v] = min(low[v], disc[w])
                else:
                    disc[w] = low[w] = timer
                    timer += 1
                    if v == root:
                        root_children += 1
                    stack.append((w, v, list(adj[w])))
            else:
                stack.pop()
                if stack:
                    pv = stack[-1][0]
                    low[pv] = min(low[pv], low[v])
                    if pv != root and low[v] >= disc[pv]:
                        aps.add(pv)
        if root_children > 1:
            aps.add(root)
    return aps


def _kappa(nodes: List[int], adj: Dict[int, Set[int]]) -> int:
    """Vertex connectivity via the Even pivot reduction + local Dinic
    (same scheme as connectivity.vertex_connectivity)."""
    n = len(nodes)
    if n <= 1:
        return 0
    idx = {v: i for i, v in enumerate(nodes)}
    nbr = [sorted(idx[w] for w in adj[v] if w in idx) for v in nodes]
    seen = np.zeros(n, bool)
    seen[0] = True
    q = [0]
    while q:
        u = q.pop()
        for w in nbr[u]:
            if not seen[w]:
                seen[w] = True
                q.append(w)
    if not seen.all():
        return 0
    deg = np.array([len(s) for s in nbr])
    if deg.min() == 0:
        return 0
    if n == 2:
        return 1
    if all(len(nbr[i]) == n - 1 for i in range(n)):
        return n - 1

    def _st(s: int, t: int) -> int:
        asrc, adst, acap = [], [], []
        for a in range(n):
            for b in nbr[a]:
                bb = b if b in (s, t) else n + b
                asrc.append(a)
                adst.append(bb)
                acap.append(float(n))
        for v in range(n):
            asrc.append(n + v)
            adst.append(v)
            acap.append(1.0)
        val, _ = _dinic(2 * n, np.array(asrc), np.array(adst),
                        np.array(acap), s, t)
        return int(round(val))

    piv = int(np.flatnonzero(deg == deg.min())[0])
    best = n - 1
    pset = set(nbr[piv])
    for u in range(n):
        if u != piv and u not in pset:
            best = min(best, _st(piv, u))
            if best <= 1:
                return best
    nb = sorted(pset)
    for i in range(len(nb)):
        nbu = set(nbr[nb[i]])
        for j in range(i + 1, len(nb)):
            if nb[j] not in nbu:
                best = min(best, _st(nb[i], nb[j]))
    return int(best)


def _all_min_separators(nodes: List[int], adj: Dict[int, Set[int]],
                        k: int, budget: int = 50_000_000
                        ) -> List[FrozenSet[int]]:
    n = len(nodes)
    m = sum(len(s) for s in adj.values()) // 2
    if k == 0 or k >= n - 1:
        return []
    if n ** (k - 1) * (n + m) > budget:
        raise NotImplementedError(
            f"minimum-separator enumeration budget exceeded "
            f"(n={n}, k={k})")

    def rec(cur_nodes: List[int], cur_adj: Dict[int, Set[int]],
            size: int) -> Set[FrozenSet[int]]:
        if size == 1:
            return {frozenset((a,)) for a in
                    _articulation_points(cur_nodes, cur_adj)}
        out: Set[FrozenSet[int]] = set()
        for u in cur_nodes:
            sub_nodes = [v for v in cur_nodes if v != u]
            sub_adj = {v: cur_adj[v] - {u} for v in sub_nodes}
            for t in rec(sub_nodes, sub_adj, size - 1):
                out.add(t | {u})
        return out

    return sorted(rec(nodes, adj, k), key=sorted)


def _blocks_local(lo, hi):
    adj_all: Dict[int, Set[int]] = {}
    for a, b in zip(lo.tolist(), hi.tolist()):
        adj_all.setdefault(a, set()).add(b)
        adj_all.setdefault(b, set()).add(a)
    all_nodes = sorted(adj_all)

    def sub_adj(vs: List[int]) -> Dict[int, Set[int]]:
        s = set(vs)
        return {v: adj_all[v] & s for v in vs}

    # queue entries: (vertex tuple, parent idx, cohesion, check flag)
    q: List[Tuple[Tuple[int, ...], int, int, bool]] = []
    root_adj = sub_adj(all_nodes)
    q.append((tuple(all_nodes), -1, _kappa(all_nodes, root_adj), False))
    ptr = 0
    while ptr < len(q):
        vs, _parent, k, check = q[ptr]
        nodes = list(vs)
        adj = sub_adj(nodes)
        n = len(nodes)
        if k >= n - 1:
            ptr += 1
            continue  # complete (or near): no separators to act on
        seps = _all_min_separators(nodes, adj, k)
        if not seps and k > 0:
            ptr += 1
            continue
        marked: Set[int] = set().union(*seps) if seps else set()
        cands = _components_incl_nbrs(nodes, adj, marked)
        addedsep = len(marked) != n  # reference: nsepv != mynodes
        if addedsep and marked:
            cands.append(sorted(marked))
        for cand in cands:
            if len(cand) < 2:
                continue
            cadj = sub_adj(cand)
            maxdeg = max(len(s) for s in cadj.values())
            if maxdeg > k:
                ck = _kappa(cand, cadj)
                q.append((tuple(cand), ptr, ck, check or addedsep))
        ptr += 1

    # post-filter 1: ancestor cohesion (chase removed parents)
    nq = len(q)
    removed = [False] * nq
    for i in range(1, nq):
        p = q[i][1]
        while removed[p]:
            p = q[p][1]
        if q[p][2] >= q[i][2]:
            removed[i] = True
    # post-filter 2: subset check among check-flagged blocks
    sets = [set(e[0]) for e in q]
    for i in range(1, nq):
        if not q[i][3] or removed[i]:
            continue
        for j in range(1, nq):
            if j == i or not q[j][3] or removed[j]:
                continue
            if sets[i] <= sets[j] and q[j][2] >= q[i][2]:
                removed[i] = True
                break
    # emit with rewritten parents
    rewrite = {}
    out = []
    for i in range(nq):
        if removed[i]:
            continue
        rewrite[i] = len(out)
        p = q[i][1]
        while p >= 0 and removed[p]:
            p = q[p][1]
        out.append((sorted(q[i][0]), q[i][2],
                    rewrite[p] if p >= 0 else -1))
    return out


def cohesive_blocks(
    graph: Graph,
    max_edges: int = 1 << 16,
) -> Tuple[pa.Table, pa.Table]:
    """Returns (info, members): info = (block, cohesion, parent, size)
    rows, members = (block, vertex) rows; block 0 is the whole
    (observed-universe) graph, parents chase past filtered candidates
    like the reference."""
    agg = _aggregate_und(graph).materialize()
    ne = agg.count()
    if ne > max_edges:
        raise NotImplementedError(
            f"cohesive blocking recursion runs in one task; guarded "
            f"to {max_edges} aggregated edges ({ne} present)")
    arrays = und_arrays_ref(agg)

    @ray.remote
    def _run(arrs):
        lo, hi, _w = arrs
        return _blocks_local(lo, hi)

    res = ray.get(_run.remote(arrays))
    info = pa.table({
        "block": pa.array(range(len(res)), pa.int64()),
        "cohesion": pa.array([c for _, c, _ in res], pa.int64()),
        "parent": pa.array([p for _, _, p in res], pa.int64()),
        "size": pa.array([len(v) for v, _, _ in res], pa.int64())})
    members = pa.table({
        "block": pa.array([i for i, (v, _, _) in enumerate(res)
                           for _ in v], pa.int64()),
        "vertex": pa.array([x for v, _, _ in res for x in v],
                           pa.int64())})
    return info, members
