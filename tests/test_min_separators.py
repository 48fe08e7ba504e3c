"""Berry–Bordat–Cogis minimal-separator enumeration vs brute force
(separators.c:421,643). A set S is a minimal (s,t) separator iff
G − S has at least two FULL components (components C with N(C) = S)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.algorithms.min_separators import (all_minimal_separators,
                                                  minimum_size_separators)
from igraph_ray.graph import Graph


def _graph(edges, n=None):
    src = [a for a, _ in edges]
    dst = [b for _, b in edges]
    nn = n if n is not None else max(src + dst) + 1
    return Graph(ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())})), n=nn), nn


def _brute_minimal_separators(edges, n):
    nbr = [set() for _ in range(n)]
    for a, b in edges:
        if a != b:
            nbr[a].add(b)
            nbr[b].add(a)

    def components(removed):
        seen = set(removed)
        comps = []
        for s in range(n):
            if s in seen:
                continue
            comp, q = {s}, [s]
            seen.add(s)
            while q:
                u = q.pop()
                for w in nbr[u]:
                    if w not in seen:
                        seen.add(w)
                        comp.add(w)
                        q.append(w)
            comps.append(comp)
        return comps

    out = set()
    verts = range(n)
    for k in range(1, n - 1):
        for S in itertools.combinations(verts, k):
            Sset = set(S)
            comps = components(Sset)
            if len(comps) < 2:
                continue
            full = sum(1 for C in comps
                       if {w for v in C for w in nbr[v]} & Sset == Sset)
            if full >= 2:
                out.add(tuple(sorted(S)))
    return sorted(out)


@pytest.mark.parametrize("edges,n", [
    ([(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)], 4),        # diamond
    ([(0, 1), (1, 2), (2, 3), (3, 4)], 5),                # path
    ([(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3)], 6),
    ([(i, (i + 1) % 6) for i in range(6)], 6),            # C6
    ([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)], 4),  # K4
])
def test_brute_force_parity(edges, n):
    g, nn = _graph(edges, n)
    got = all_minimal_separators(g)
    assert got == _brute_minimal_separators(edges, nn)


def test_random_graph_parity():
    rng = np.random.RandomState(7)
    for _ in range(3):
        n = 8
        edges = [(i, j) for i in range(n) for j in range(i + 1, n)
                 if rng.rand() < 0.35]
        if not edges:
            continue
        g, nn = _graph(edges, n)
        assert all_minimal_separators(g) == \
            _brute_minimal_separators(edges, nn)


def test_minimum_size_petersen():
    outer = [(i, (i + 1) % 5) for i in range(5)]
    inner = [(5 + i, 5 + (i + 2) % 5) for i in range(5)]
    spokes = [(i, i + 5) for i in range(5)]
    g, n = _graph(outer + inner + spokes, 10)
    seps = minimum_size_separators(g, n=n)
    # kappa = 3; the minimum cut-sets of Petersen are exactly the 10
    # vertex neighborhoods
    assert len(seps) == 10
    assert all(len(s) == 3 for s in seps)
    nbr = {v: set() for v in range(10)}
    for a, b in outer + inner + spokes:
        nbr[a].add(b)
        nbr[b].add(a)
    assert sorted(seps) == sorted(tuple(sorted(nbr[v])) for v in range(10))


def test_minimum_size_special_cases():
    # kappa = 1: path graph -> articulation points
    g, n = _graph([(0, 1), (1, 2), (2, 3)], 4)
    assert minimum_size_separators(g, n=n) == [(1,), (2,)]
    # complete graph: kappa = n-1 -> every (n-1)-subset
    g, n = _graph([(i, j) for i in range(4) for j in range(i + 1, 4)], 4)
    got = minimum_size_separators(g, n=n)
    assert sorted(got) == [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]
    # disconnected: kappa = 0 -> empty
    g, n = _graph([(0, 1), (2, 3)], 4)
    assert minimum_size_separators(g, n=n) == []
