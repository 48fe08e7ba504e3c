"""Independent-set family vs brute force (cliques.c:303-1106)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.algorithms.independent_sets import (
    independence_number,
    largest_cliques,
    maximal_independent_sets,
)


def _graph(edges):
    return Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64())})))


def _brute_mis(n, edges):
    """All maximal independent sets by subset enumeration."""
    eset = {(min(a, b), max(a, b)) for a, b in edges if a != b}

    def indep(s):
        return all((a, b) not in eset
                   for a, b in itertools.combinations(sorted(s), 2))

    sets = [frozenset(c) for r in range(1, n + 1)
            for c in itertools.combinations(range(n), r) if indep(c)]
    out = set()
    for s in sets:
        if not any(s < t for t in sets):
            out.add(s)
    return {tuple(sorted(s)) for s in out}


def _rand_edges(n, m, seed):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    keep = src != dst
    return sorted(set(zip(src[keep].tolist(), dst[keep].tolist())))


@pytest.mark.parametrize("seed,n,m", [(1, 8, 12), (2, 10, 20), (3, 12, 30)])
def test_maximal_independent_sets(ray_session, seed, n, m):
    edges = _rand_edges(n, m, seed)
    got = maximal_independent_sets(_graph(edges), n).to_pandas()
    got_sets = {tuple(sorted(int(v) for v in s)) for s in got["set"]}
    ref = _brute_mis(n, edges)
    assert got_sets == ref
    assert sorted(got["size"]) == sorted(len(s) for s in ref)


def test_independence_number(ray_session):
    edges = _rand_edges(10, 18, 5)
    ref = max(len(s) for s in _brute_mis(10, edges))
    assert independence_number(_graph(edges), 10) == ref


def test_largest_cliques(ray_session):
    # two triangles sharing a vertex + one 4-clique
    k4 = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (2, 4), (3, 4)] + k4
    got = largest_cliques(_graph(edges)).to_pandas()
    assert len(got) == 1
    assert sorted(int(v) for v in got["clique"].iloc[0]) == [10, 11, 12, 13]
    assert got["size"].iloc[0] == 4


def test_empty_graph_mis(ray_session):
    # no edges: the single maximal independent set is everything
    got = maximal_independent_sets(_graph([(0, 1)]), 4).to_pandas()
    ref = _brute_mis(4, [(0, 1)])
    got_sets = {tuple(sorted(int(v) for v in s)) for s in got["set"]}
    assert got_sets == ref
