"""Girvan–Newman edge-betweenness community detection vs an in-test
exact sequential recompute (Brandes edge credits, same (lo,hi)
tie-break) — removal sequence, component counts and modularity sequence
must agree step for step."""

from collections import deque

import numpy as np
import pytest

from igraph_ray.algorithms.community_eb import community_edge_betweenness
from igraph_ray.graph import Graph


def _eb_undirected(n, edges):
    """Exact undirected edge betweenness via one BFS-Brandes per source;
    credit per undirected edge summed over both traversal directions
    (matching the engine's symmetrized accounting)."""
    adj = [[] for _ in range(n)]
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    score = {e: 0.0 for e in edges}
    for s in range(n):
        dist = [-1] * n
        sigma = [0.0] * n
        dist[s] = 0
        sigma[s] = 1.0
        order = []
        dq = deque([s])
        while dq:
            v = dq.popleft()
            order.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    dq.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = [0.0] * n
        for w in reversed(order):
            for v in adj[w]:
                if dist[v] == dist[w] - 1 and sigma[w] > 0:
                    c = sigma[v] / sigma[w] * (1.0 + delta[w])
                    e = (min(v, w), max(v, w))
                    score[e] += c
                    delta[v] += c
    # summing over every source already counts each unordered pair twice
    # (s and t both act as sources) — exactly the engine's symmetrized
    # two-direction accounting; no extra scaling
    return score


def _modularity(n, orig_edges, labels):
    m = len(orig_edges)
    if m == 0:
        return 0.0
    e = {}
    a = {}
    for u, v in orig_edges:
        cu, cv = labels[u], labels[v]
        a[cu] = a.get(cu, 0) + 1
        a[cv] = a.get(cv, 0) + 1
        if cu == cv:
            e[cu] = e.get(cu, 0) + 2
    q = 0.0
    for c in a:
        q += e.get(c, 0) / (2.0 * m) - (a[c] / (2.0 * m)) ** 2
    return q


def _gn_exact(n, edges, max_steps):
    cur = list(edges)
    steps = []
    for step in range(max_steps):
        if not cur:
            break
        sc = _eb_undirected(n, cur)
        best = max(cur, key=lambda e: (sc[e], -e[0], -e[1]))
        # deterministic tie-break: max score, then smallest (lo, hi)
        cand = [e for e in cur if sc[e] == sc[best]]
        best = min(cand)
        cur = [e for e in cur if e != best]
        # components of remaining graph, min-vertex labels
        lab = list(range(n))
        changed = True
        while changed:
            changed = False
            for u, v in cur:
                m = min(lab[u], lab[v])
                if lab[u] != m or lab[v] != m:
                    lab[u] = lab[v] = m
                    changed = True
        ncomm = len(set(lab))
        q = _modularity(n, edges, lab)
        steps.append((step, best[0], best[1],
                      int(round(sc[best] * 1e6)), ncomm,
                      int(round(q * 1e9))))
    return steps


def _engine(n, edges, **kw):
    src = np.array([e[0] for e in edges], np.int64)
    dst = np.array([e[1] for e in edges], np.int64)
    g = Graph.from_numpy(src, dst, n=n)
    t = community_edge_betweenness(g, num_partitions=2, **kw)
    return list(zip(t["step"].to_pylist(), t["lo"].to_pylist(),
                    t["hi"].to_pylist(), t["ebc_e6"].to_pylist(),
                    t["n_communities"].to_pylist(),
                    t["modularity_e9"].to_pylist()))


def test_barbell_first_cut_is_bridge():
    # two triangles + bridge: GN removes the bridge first and modularity
    # peaks right there
    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    got = _engine(6, edges, max_removals=1)
    assert got[0][1:3] == (2, 3)
    assert got[0][4] == 2  # two communities after the cut
    exact = _gn_exact(6, edges, 1)
    assert got == exact


def test_full_dendrogram_matches_exact():
    rng = np.random.default_rng(17)
    n = 10
    edges = sorted({(int(a), int(b)) if a < b else (int(b), int(a))
                    for a, b in rng.integers(0, n, (18, 2)) if a != b})
    got = _engine(n, edges, max_removals=6)
    exact = _gn_exact(n, edges, 6)
    assert got == exact


def test_target_communities_stops_early():
    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3),
             (6, 7), (7, 8), (6, 8), (5, 6)]
    got = _engine(9, edges, target_communities=3)
    assert got[-1][4] >= 3
    assert len(got) < len(edges)


def test_guard():
    edges = [(i, i + 1) for i in range(30)]
    g = Graph.from_numpy(np.array([e[0] for e in edges]),
                         np.array([e[1] for e in edges]), n=31)
    with pytest.raises(NotImplementedError):
        community_edge_betweenness(g, max_edges=10)
