"""All simple paths (igraph_get_all_simple_paths, paths.c:60): exact
enumeration vs a local DFS, cycle non-revisit, cutoff, determinism."""

from __future__ import annotations

import numpy as np

from igraph_ray import Graph
from igraph_ray.algorithms.simple_paths import all_simple_paths


def _mk(src, dst, n):
    return Graph.from_numpy(np.asarray(src, np.int64),
                            np.asarray(dst, np.int64), n=n)


def _got(g, source, cutoff, **kw):
    return sorted(r["path"]
                  for r in all_simple_paths(g, source, cutoff, **kw)
                  .take_all())


def _dfs_all(edges, n, source, cutoff):
    adj = [[] for _ in range(n)]
    for a, b in edges:
        adj[a].append(b)
    out = []

    def rec(path):
        if len(path) - 1 >= 1:
            out.append("->".join(map(str, path)))
        if len(path) - 1 == cutoff:
            return
        for w in adj[path[-1]]:
            if w not in path:
                rec(path + [w])

    rec([source])
    return sorted(out)


def test_diamond_cycle():
    g = _mk([0, 0, 1, 2, 3], [1, 2, 2, 3, 0], 4)
    assert _got(g, 0, 3) == ["0->1", "0->1->2", "0->1->2->3",
                             "0->2", "0->2->3"]


def test_matches_dfs_on_random():
    rng = np.random.default_rng(2)
    for trial in range(3):
        n = 25
        s = rng.integers(0, n, 70)
        d = rng.integers(0, n, 70)
        keep = s != d
        edges = sorted(set(zip(s[keep].tolist(), d[keep].tolist())))
        src_a, dst_a = zip(*edges)
        g = _mk(src_a, dst_a, n)
        assert _got(g, 0, 3, n=n) == _dfs_all(edges, n, 0, 3), trial


def test_no_out_edges():
    g = _mk([1], [0], 3)
    assert _got(g, 0, 4, n=3) == []


def test_deterministic_across_partitioning():
    import pyarrow as pa
    import ray.data

    rng = np.random.default_rng(8)
    s = rng.integers(0, 30, 90)
    d = rng.integers(0, 30, 90)
    keep = s != d
    a = _got(_mk(s[keep], d[keep], 30), 0, 3, n=30)
    g2 = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array(s[keep], pa.int64()),
        "dst": pa.array(d[keep], pa.int64())})).repartition(6), n=30)
    assert _got(g2, 0, 3, n=30) == a


def test_sigma_counts_matches_brute():
    from collections import deque

    from igraph_ray.algorithms.simple_paths import shortest_path_counts

    rng = np.random.default_rng(12)
    s = rng.integers(0, 30, 100)
    d = rng.integers(0, 30, 100)
    keep = s != d
    edges = sorted(set(zip(s[keep].tolist(), d[keep].tolist())))
    g = _mk(*zip(*edges), 30)
    got = {r["vertex"]: (r["dist"], r["sigma"])
           for r in shortest_path_counts(g, 0).take_all()}
    # brute: BFS with sigma accumulation
    adj = [[] for _ in range(30)]
    for a, b in edges:
        adj[a].append(b)
    dist = {0: 0}
    sigma = {0: 1}
    q = deque([0])
    while q:
        v = q.popleft()
        for w in adj[v]:
            if w not in dist:
                dist[w] = dist[v] + 1
                sigma[w] = 0
                q.append(w)
            if dist[w] == dist[v] + 1:
                sigma[w] += sigma[v]
    assert got == {v: (dist[v], sigma[v]) for v in dist}
