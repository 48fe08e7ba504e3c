from collections import defaultdict, deque

import numpy as np

from igraph_ray import Graph
from igraph_ray.algorithms.betweenness import edge_betweenness
from tests import fixtures as fx


def _brute_ebc(src, dst):
    """Sequential Brandes with per-edge accumulation over the directed
    distinct-edge loop-free view."""
    adj = defaultdict(set)
    for a, b in zip(src, dst):
        if a != b:
            adj[int(a)].add(int(b))
    verts = sorted(set(adj) | {w for vs in adj.values() for w in vs})
    ebc = defaultdict(float)
    for s in verts:
        dist = {s: 0}
        sig = defaultdict(float)
        sig[s] = 1.0
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sig[w] += sig[u]
        delta = defaultdict(float)
        for u in reversed(order):
            for w in adj.get(u, ()):
                if dist.get(w) == dist[u] + 1:
                    c = sig[u] / sig[w] * (1.0 + delta[w])
                    ebc[(u, w)] += c
                    delta[u] += c
    return ebc


def _engine_ebc(src, dst, n=None, chunk=64):
    g = Graph.from_numpy(np.asarray(src, np.int64),
                         np.asarray(dst, np.int64), n=n)
    rows = edge_betweenness(g, num_partitions=4, chunk=chunk).take_all()
    return {(r["src"], r["dst"]): r["ebc"] for r in rows}


def _check(src, dst, n=None, chunk=64):
    got = _engine_ebc(src, dst, n=n, chunk=chunk)
    want = _brute_ebc(src, dst)
    keys = set(got) | set(want)
    for k in keys:
        assert abs(got.get(k, 0.0) - want.get(k, 0.0)) < 1e-9, (
            k, got.get(k), want.get(k))


def test_edge_betweenness_known():
    # directed path 0->1->2->3: middle edge carries the most pairs
    _check([0, 1, 2], [1, 2, 3], n=4)
    # diamond with two equal shortest paths splits credit
    _check([0, 0, 1, 2], [1, 2, 3, 3], n=4)
    # cycle
    _check([0, 1, 2, 3], [1, 2, 3, 0], n=4)


def test_edge_betweenness_random():
    for seed, m in [(1, 80), (2, 120)]:
        n, src, dst = fx.er_digraph(n=40, m=m, seed=seed)
        _check(src, dst, n=n, chunk=16)
