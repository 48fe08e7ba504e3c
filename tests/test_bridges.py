from collections import defaultdict

import numpy as np
import pytest

from igraph_ray import Graph
from igraph_ray.algorithms.bridges import (
    bfs_forest,
    bridges,
    two_edge_connected_components,
)
from tests import fixtures as fx


def _cc_count(n_verts, pairs):
    parent = {v: v for v in n_verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return len({find(v) for v in n_verts})


def _brute_bridges(src, dst):
    """Exact oracle: undirected distinct pairs whose removal (of ALL
    parallel copies minus ... none: a pair with multiplicity >= 2 is
    never a bridge) disconnects its endpoints' component."""
    pairs = defaultdict(int)
    verts = set()
    for a, b in zip(src, dst):
        if a == b:
            continue
        pairs[(min(a, b), max(a, b))] += 1
        verts.add(a)
        verts.add(b)
    base = _cc_count(verts, list(pairs))
    out = set()
    for (a, b), m in pairs.items():
        if m >= 2:
            continue
        rest = [p for p in pairs if p != (a, b)]
        if _cc_count(verts, rest) > base:
            out.add((a, b))
    return out


def _got_bridges(g):
    return {(r["src"], r["dst"]) for r in bridges(g, num_partitions=4).take_all()}


def test_bridges_path_all():
    src = np.array([0, 1, 2, 3], np.int64)
    dst = np.array([1, 2, 3, 4], np.int64)
    g = Graph.from_numpy(src, dst, n=5)
    assert _got_bridges(g) == {(0, 1), (1, 2), (2, 3), (3, 4)}


def test_bridges_cycle_none():
    src = np.array([0, 1, 2, 3, 4], np.int64)
    dst = np.array([1, 2, 3, 4, 0], np.int64)
    g = Graph.from_numpy(src, dst, n=5)
    assert _got_bridges(g) == set()


def test_bridges_barbell_and_parallel():
    # triangle 0-1-2, bridge 2-3, triangle 3-4-5, parallel pair 5-6 (x2)
    src = np.array([0, 1, 2, 2, 3, 4, 5, 5, 6], np.int64)
    dst = np.array([1, 2, 0, 3, 4, 5, 3, 6, 5], np.int64)
    g = Graph.from_numpy(src, dst, n=7)
    assert _got_bridges(g) == {(2, 3)}
    labels = {r["vertex"]: r["label"] for r in
              two_edge_connected_components(g, num_partitions=4).take_all()}
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] == labels[5] == labels[6]
    assert labels[0] != labels[3]


def test_bridges_er_oracle():
    n, src, dst = fx.er_digraph(n=70, m=120, seed=23)
    g = Graph.from_numpy(src, dst, n=n)
    ref = _brute_bridges(src, dst)
    assert _got_bridges(g) == ref


def test_bridges_forest_fixture():
    n, src, dst = fx.forest(seed=11)
    g = Graph.from_numpy(src, dst, n=n)
    ref = _brute_bridges(src, dst)
    assert _got_bridges(g) == ref


def test_bfs_forest_contract():
    n, src, dst = fx.er_digraph(n=50, m=90, seed=5)
    g = Graph.from_numpy(src, dst, n=n)
    rows = {r["vertex"]: (r["root"], r["depth"], r["parent"]) for r in
            bfs_forest(g, num_partitions=4).take_all()}
    nbr = defaultdict(set)
    for a, b in zip(src, dst):
        if a != b:
            nbr[a].add(b)
            nbr[b].add(a)
    # BFS distances from per-component min vertex
    import heapq

    comps = {}
    for v in sorted(rows):
        if v in comps:
            continue
        stack = [v]
        comp = set()
        while stack:
            x = stack.pop()
            if x in comp:
                continue
            comp.add(x)
            stack.extend(nbr[x] - comp)
        for u in comp:
            comps[u] = v
    for v, (root, depth, parent) in rows.items():
        assert root == comps[v]
    # depth via BFS
    from collections import deque

    for root in set(comps.values()):
        dist = {root: 0}
        q = deque([root])
        while q:
            x = q.popleft()
            for y in nbr[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        for u, d in dist.items():
            assert rows[u][1] == d
            if d == 0:
                assert rows[u][2] == u
            else:
                assert rows[u][2] == min(
                    w for w in nbr[u] if dist[w] == d - 1)


def test_2ecc_cycle_chain():
    # two cycles joined by a bridge: 2ecc labels split at the bridge
    src = np.array([0, 1, 2, 2, 3, 4, 5], np.int64)
    dst = np.array([1, 2, 0, 3, 4, 5, 3], np.int64)
    g = Graph.from_numpy(src, dst, n=6)
    labels = {r["vertex"]: r["label"] for r in
              two_edge_connected_components(g, num_partitions=4).take_all()}
    assert labels[0] == labels[1] == labels[2] == 0
    assert labels[3] == labels[4] == labels[5] == 3
