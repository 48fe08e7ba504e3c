"""Exact optimal modularity vs brute-force partition enumeration
(optimal_modularity.c:38 semantics)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.algorithms.optimal_modularity import optimal_modularity


def _graph(edges):
    return Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64())})))


def _partitions(items):
    """All set partitions (restricted growth)."""
    if not items:
        yield []
        return
    first, rest = items[0], items[1:]
    for part in _partitions(rest):
        for i in range(len(part)):
            yield part[:i] + [[first] + part[i]] + part[i + 1:]
        yield [[first]] + part


def _q(edges, part):
    eset = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    m = len(eset)
    q = 0.0
    deg = {}
    for a, b in eset:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for grp in part:
        gs = set(grp)
        e_c = sum(1 for a, b in eset if a in gs and b in gs)
        d_c = sum(deg.get(v, 0) for v in grp)
        q += e_c / m - (d_c / (2 * m)) ** 2
    return q


def _brute(edges):
    verts = sorted({v for e in edges for v in e})
    return max(_q(edges, p) for p in _partitions(verts))


def _rand_edges(n, m, seed):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    keep = src != dst
    return sorted(set(zip(src[keep].tolist(), dst[keep].tolist())))


@pytest.mark.parametrize("seed,n,m", [(1, 7, 10), (2, 8, 14), (4, 8, 9)])
def test_matches_bruteforce(ray_session, seed, n, m):
    edges = _rand_edges(n, m, seed)
    got = optimal_modularity(_graph(edges)).to_pandas()
    ref = _brute(edges)
    assert got["q_e9"].iloc[0] == int(round(ref * 1e9))
    # the reported partition must itself achieve the reported optimum
    part = [list(grp.vertex) for _, grp in got.groupby("community")]
    assert abs(_q(edges, part) - ref) < 1e-12


def test_two_cliques(ray_session):
    # two K4s joined by one edge: the optimum is the two cliques
    k4a = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    k4b = [(i + 4, j + 4) for i, j in k4a]
    edges = k4a + k4b + [(0, 4)]
    got = optimal_modularity(_graph(edges)).to_pandas()
    com = dict(zip(got.vertex, got.community))
    assert len({com[v] for v in range(4)}) == 1
    assert len({com[v] for v in range(4, 8)}) == 1
    assert com[0] != com[4]


def test_guard(ray_session):
    edges = _rand_edges(30, 60, 3)
    with pytest.raises(Exception):
        optimal_modularity(_graph(edges), max_vertices=10).to_pandas()
