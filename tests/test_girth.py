from collections import deque, defaultdict

import numpy as np

from igraph_ray import Graph
from igraph_ray.algorithms.girth import girth
from tests import fixtures as fx


def _brute_girth(src, dst):
    """Shortest cycle of the simple undirected view via per-vertex BFS
    with parent-edge exclusion (exact for girth)."""
    nbr = defaultdict(set)
    for a, b in zip(src, dst):
        if a != b:
            nbr[a].add(b)
            nbr[b].add(a)
    best = 0
    verts = sorted(nbr)
    for r in verts:
        dist = {r: 0}
        par = {r: -1}
        q = deque([r])
        while q:
            x = q.popleft()
            if best and dist[x] * 2 >= best:
                break
            for y in nbr[x]:
                if y == par[x]:
                    continue
                if y in dist:
                    c = dist[x] + dist[y] + 1
                    if best == 0 or c < best:
                        best = c
                else:
                    dist[y] = dist[x] + 1
                    par[y] = x
                    q.append(y)
    return best


def test_girth_known():
    # 5-cycle
    src = np.array([0, 1, 2, 3, 4], np.int64)
    dst = np.array([1, 2, 3, 4, 0], np.int64)
    assert girth(Graph.from_numpy(src, dst, n=5), num_partitions=4) == 5
    # tree: acyclic -> 0
    src = np.array([0, 0, 1], np.int64)
    dst = np.array([1, 2, 3], np.int64)
    assert girth(Graph.from_numpy(src, dst, n=4), num_partitions=4) == 0
    # 4-cycle with a chord -> 3
    src = np.array([0, 1, 2, 3, 0], np.int64)
    dst = np.array([1, 2, 3, 0, 2], np.int64)
    assert girth(Graph.from_numpy(src, dst, n=4), num_partitions=4) == 3
    # two components: 6-cycle + 4-cycle -> 4
    src = np.array([0, 1, 2, 3, 4, 5, 10, 11, 12, 13], np.int64)
    dst = np.array([1, 2, 3, 4, 5, 0, 11, 12, 13, 10], np.int64)
    assert girth(Graph.from_numpy(src, dst, n=None), num_partitions=4) == 4
    # parallel edges + loop ignored (simple view): still the 6-cycle
    src = np.array([0, 1, 2, 3, 4, 5, 0, 3], np.int64)
    dst = np.array([1, 2, 3, 4, 5, 0, 1, 3], np.int64)
    assert girth(Graph.from_numpy(src, dst, n=6), num_partitions=4) == 6


def test_girth_even_cycle_bfs_tree_hazard():
    # even cycles are the case plain BFS-level rules get wrong
    for k in (4, 6, 8):
        src = np.arange(k, dtype=np.int64)
        dst = np.roll(src, -1).copy()
        assert girth(Graph.from_numpy(src, dst, n=k), num_partitions=4) == k


def test_girth_random_oracle():
    for seed, m in [(1, 60), (2, 75), (3, 90), (4, 120)]:
        n, src, dst = fx.er_digraph(n=60, m=m, seed=seed)
        got = girth(Graph.from_numpy(src, dst, n=n), num_partitions=4, chunk=16)
        assert got == _brute_girth(src, dst), (seed, m)
