from itertools import combinations

import numpy as np

from igraph_ray import Graph
from igraph_ray.algorithms.cliques import (
    clique_number,
    clique_size_histogram,
    maximal_cliques,
)
from tests import fixtures as fx


def _ref_maximal_cliques(n, src, dst):
    """Brute-force reference: grow-by-adjacency enumeration (no pivot BK —
    an independent code path from the engine's)."""
    nbr = {v: set() for v in range(n)}
    for a, b in zip(src, dst):
        if a != b:
            nbr[a].add(b)
            nbr[b].add(a)
    # all cliques via BFS over extension by higher-numbered vertices
    cliques = {(v,) for v in range(n)}
    frontier = list(cliques)
    while frontier:
        nxt = []
        for c in frontier:
            cand = set.intersection(*(nbr[v] for v in c)) if c else set()
            for w in cand:
                if w > c[-1]:
                    nc = c + (w,)
                    if nc not in cliques:
                        cliques.add(nc)
                        nxt.append(nc)
        frontier = nxt
    maximal = []
    for c in cliques:
        cs = set(c)
        ext = set.intersection(*(nbr[v] for v in c)) - cs
        if not ext:
            maximal.append(tuple(sorted(c)))
    return sorted(maximal)


def _engine_cliques(g, parts=3):
    rows = maximal_cliques(g, num_partitions=parts).take_all()
    return sorted(tuple(r["clique"]) for r in rows)


def test_cliques_planted():
    # K4 + pendant + isolated
    src = np.array([0, 0, 0, 1, 1, 2, 3], dtype=np.int64)
    dst = np.array([1, 2, 3, 2, 3, 3, 4], dtype=np.int64)
    g = Graph.from_numpy(src, dst, n=6)
    assert _engine_cliques(g) == [(0, 1, 2, 3), (3, 4), (5,)]
    assert clique_number(g, num_partitions=3) == 4


def test_cliques_karate():
    n, src, dst = fx.karate()
    g = Graph.from_numpy(src, dst, n=n)
    got = _engine_cliques(g, parts=4)
    assert got == _ref_maximal_cliques(n, src, dst)


def test_cliques_er_multiblock():
    # multi-partition path: groups must stay block-intact across boundaries
    n, src, dst = fx.er_digraph(n=150, m=1100, seed=9)
    g = Graph.from_numpy(src, dst, n=n)
    got = _engine_cliques(g, parts=5)
    assert got == _ref_maximal_cliques(n, src, dst)


def test_clique_histogram_matches_enumeration():
    n, src, dst = fx.er_digraph(n=100, m=600, seed=2)
    g = Graph.from_numpy(src, dst, n=n)
    ref = _ref_maximal_cliques(n, src, dst)
    hist = {}
    for c in ref:
        hist[len(c)] = hist.get(len(c), 0) + 1
    rows = clique_size_histogram(g, num_partitions=4).take_all()
    assert {r["size"]: r["n_cliques"] for r in rows} == hist


def test_cliques_range_brute_force(ray_session):
    """igraph_cliques subset stream vs itertools enumeration."""
    import itertools

    import pyarrow as pa
    import ray.data

    from igraph_ray.algorithms.cliques import cliques
    from igraph_ray.graph import Graph

    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4), (0, 3)]
    n = 5
    g = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, b in edges], pa.int64()),
        "dst": pa.array([b for a, b in edges], pa.int64())})), n=n)
    got = {(r["clique"], r["size"])
           for r in cliques(g, min_size=1, max_size=0).take_all()}
    eset = {tuple(sorted(e)) for e in edges}
    expect = set()
    for k in range(1, n + 1):
        for sub in itertools.combinations(range(n), k):
            if all(tuple(sorted(p)) in eset
                   for p in itertools.combinations(sub, 2)):
                expect.add((",".join(map(str, sub)), k))
    assert got == expect
