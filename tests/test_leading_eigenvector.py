"""Leading-eigenvector communities (community.c:1414 / Newman 2006) vs
numpy's exact modularity-matrix eigendecomposition."""

import numpy as np
import pytest

from igraph_ray.algorithms.leading_eigenvector import (
    leading_eigenvector_communities,
)
from igraph_ray.graph import Graph
from tests.fixtures import karate


def _labels(g, **kw):
    out = leading_eigenvector_communities(g, **kw)
    return {r["vertex"]: r["community"] for r in out.take_all()}


def _first_split_exact(n, edges):
    """Exact sign split of the leading eigenvector of B (numpy)."""
    A = np.zeros((n, n))
    for a, b in edges:
        A[a, b] = A[b, a] = 1.0
    k = A.sum(axis=1)
    m = A.sum() / 2.0
    B = A - np.outer(k, k) / (2.0 * m)
    w, v = np.linalg.eigh(B)
    lead = v[:, np.argmax(w)]
    if lead[np.argmax(np.abs(lead))] < 0:
        lead = -lead
    return lead, float(np.max(w))


def test_barbell_splits_cliques():
    edges = []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j))
    edges.append((4, 5))
    g = Graph.from_numpy(np.array([e[0] for e in edges]),
                         np.array([e[1] for e in edges]), n=10)
    lab = _labels(g, max_splits=1, num_partitions=2)
    a = {v for v, c in lab.items() if c == lab[0]}
    assert a in ({0, 1, 2, 3, 4}, {5, 6, 7, 8, 9})


def test_first_split_matches_numpy_eigensign():
    # planted two-community graph: dense blobs + sparse cross links give
    # a clear spectral gap (power iteration needs one; on near-degenerate
    # spectra the reference's ARPACK separates where 80 iterations can't)
    rng = np.random.default_rng(9)
    n = 30
    edges = set()
    for base in (0, 15):
        for i in range(15):
            for j in range(i + 1, 15):
                if rng.random() < 0.5:
                    edges.add((base + i, base + j))
    for _ in range(6):
        edges.add((int(rng.integers(0, 15)), int(rng.integers(15, 30))))
    edges = sorted(edges)
    lead, lam = _first_split_exact(n, edges)
    assert lam > 0
    g = Graph.from_numpy(np.array([e[0] for e in edges]),
                         np.array([e[1] for e in edges]), n=n)
    lab = _labels(g, max_splits=1, num_partitions=2)
    groups = {}
    for v, c in lab.items():
        groups.setdefault(c, set()).add(v)
    assert len(groups) == 2
    want_pos = {i for i in range(n) if lead[i] >= 0}
    got = set(groups[min(groups)])
    # sign convention of the eigenvector is arbitrary: accept either side
    assert got in (want_pos, set(range(n)) - want_pos), (got, want_pos)


def test_karate_quality():
    n, src, dst = karate()
    g = Graph.from_numpy(src, dst, n=n)
    lab = _labels(g, max_splits=8, num_partitions=2)
    # modularity of the final partition beats the known LE floor (~0.35)
    edges = list(zip(src, dst))
    m = len(edges)
    deg = np.zeros(n)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    q = 0.0
    for a, b in edges:
        if lab[a] == lab[b]:
            q += 1.0 / m
    for c in set(lab.values()):
        vol = sum(deg[v] for v in range(n) if lab[v] == c)
        q -= (vol / (2.0 * m)) ** 2
    assert q > 0.3, q
    assert len(set(lab.values())) >= 2


def test_empty_and_trivial():
    g = Graph.from_numpy(np.array([], np.int64), np.array([], np.int64), n=3)
    lab = _labels(g, num_partitions=2)
    assert len(lab) == 3
