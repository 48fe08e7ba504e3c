"""Kamada-Kawai / SMACOF layout (layout_kk.c semantics): C4 becomes a
square, stress drops massively from the random start, determinism."""

from __future__ import annotations

import itertools

import numpy as np

from igraph_ray import Graph
from igraph_ray.ops.layout import layout_kamada_kawai


def _mk(src, dst, n):
    return Graph.from_numpy(np.asarray(src, np.int64),
                            np.asarray(dst, np.int64), n=n)


def _pos(ds):
    rows = sorted(ds.take_all(), key=lambda r: r["vertex"])
    return np.array([[r["x"], r["y"]] for r in rows])


def test_c4_square():
    g = _mk([0, 1, 2, 3], [1, 2, 3, 0], 4)
    X = _pos(layout_kamada_kawai(g, iterations=200))
    d = {(i, j): np.linalg.norm(X[i] - X[j])
         for i, j in itertools.combinations(range(4), 2)}
    sides = [d[(0, 1)], d[(1, 2)], d[(2, 3)], d[(0, 3)]]
    diags = [d[(0, 2)], d[(1, 3)]]
    assert max(sides) / min(sides) < 1.05, sides
    for dg in diags:
        assert abs(dg / np.mean(sides) - np.sqrt(2)) < 0.1, (dg, sides)


def test_stress_reduction_and_determinism():
    rng = np.random.default_rng(2)
    s = rng.integers(0, 25, 60)
    d = rng.integers(0, 25, 60)
    keep = s != d
    g = _mk(s[keep], d[keep], 25)

    def stress(X, D):
        diff = X[:, None, :] - X[None, :, :]
        dist = np.sqrt((diff ** 2).sum(-1))
        iu = np.triu_indices(len(X), 1)
        return (((dist[iu] - D[iu]) ** 2) / D[iu] ** 2).sum()

    # BFS distances for the stress metric
    adj = [[] for _ in range(25)]
    for a, b in zip(s[keep], d[keep]):
        adj[a].append(b)
        adj[b].append(a)
    D = np.full((25, 25), 25.0)
    for src in range(25):
        D[src, src] = 0
        dist = {src: 0}
        q = [src]
        while q:
            nq = []
            for u in q:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nq.append(v)
            q = nq
        for v, dd in dist.items():
            D[src, v] = dd
    X0 = _pos(layout_kamada_kawai(g, iterations=0))
    X = _pos(layout_kamada_kawai(g, iterations=100))
    assert stress(X, D) < 0.2 * stress(X0, D)
    assert np.allclose(X, _pos(layout_kamada_kawai(g, iterations=100)))
