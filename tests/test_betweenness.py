"""Distributed Brandes betweenness vs a sequential Brandes oracle
(centrality.c:1700-1900 semantics: directed shortest paths, endpoints
excluded)."""

import collections

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.algorithms.betweenness import betweenness
from igraph_ray.graph import Graph


def _brandes_ref(n, adj):
    bc = np.zeros(n)
    for s in range(n):
        S = []
        P = collections.defaultdict(list)
        sigma = np.zeros(n)
        sigma[s] = 1
        dist = np.full(n, -1)
        dist[s] = 0
        Q = collections.deque([s])
        while Q:
            v = Q.popleft()
            S.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    Q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    P[w].append(v)
        delta = np.zeros(n)
        for w in reversed(S):
            for v in P[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def _graph(seed, n, m):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    pairs = sorted(set(zip(src[keep].tolist(), dst[keep].tolist())))
    src = np.array([p[0] for p in pairs], dtype=np.int64)
    dst = np.array([p[1] for p in pairs], dtype=np.int64)
    adj = collections.defaultdict(list)
    for s, d in zip(src, dst):
        adj[s].append(d)
    g = Graph(ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})), n=n)
    return g, adj, n


def test_betweenness_exact():
    g, adj, n = _graph(21, 60, 250)
    got = np.zeros(n)
    for r in betweenness(g, num_partitions=3, chunk=16).take_all():
        got[int(r["vertex"])] = r["bc"]
    want = _brandes_ref(n, adj)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_betweenness_chunk_invariance():
    # chunking the source set must not change the result
    g, adj, n = _graph(22, 40, 140)
    a = np.zeros(n)
    for r in betweenness(g, num_partitions=2, chunk=7).take_all():
        a[int(r["vertex"])] = r["bc"]
    b = np.zeros(n)
    for r in betweenness(g, num_partitions=4, chunk=40).take_all():
        b[int(r["vertex"])] = r["bc"]
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_betweenness_sampled_sources():
    # restricting sources = partial sums of per-source dependencies
    g, adj, n = _graph(23, 30, 90)
    srcs = [0, 3, 7]
    got = np.zeros(n)
    for r in betweenness(g, sources=srcs, num_partitions=2, chunk=2).take_all():
        got[int(r["vertex"])] = r["bc"]

    bc = np.zeros(n)
    for s in srcs:
        sub = _brandes_ref_single(n, adj, s)
        bc += sub
    np.testing.assert_allclose(got, bc, atol=1e-9)


def _brandes_ref_single(n, adj, s):
    bc = np.zeros(n)
    S = []
    P = collections.defaultdict(list)
    sigma = np.zeros(n)
    sigma[s] = 1
    dist = np.full(n, -1)
    dist[s] = 0
    Q = collections.deque([s])
    while Q:
        v = Q.popleft()
        S.append(v)
        for w in adj[v]:
            if dist[w] < 0:
                dist[w] = dist[v] + 1
                Q.append(w)
            if dist[w] == dist[v] + 1:
                sigma[w] += sigma[v]
                P[w].append(v)
    delta = np.zeros(n)
    for w in reversed(S):
        for v in P[w]:
            delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
        if w != s:
            bc[w] += delta[w]
    return bc


class TestWeightedBetweenness:
    def test_bruteforce_path_enumeration(self, ray_session):
        import itertools
        import pyarrow as pa
        import ray.data
        from igraph_ray.graph import Graph
        from igraph_ray.algorithms.betweenness import betweenness_weighted

        edges = [(0, 1, 1), (1, 2, 1), (0, 2, 3), (2, 3, 2), (1, 3, 4),
                 (3, 4, 1), (0, 4, 9), (4, 1, 2)]
        n = 5
        # enumerate ALL simple paths per (s, t); keep min-weight ones
        adj = {}
        for a, b, w in edges:
            adj.setdefault(a, []).append((b, w))

        def all_paths(s, t):
            out = []
            stack = [(s, [s], 0)]
            while stack:
                v, path, wsum = stack.pop()
                if v == t:
                    out.append((wsum, path))
                    continue
                for u, w in adj.get(v, []):
                    if u not in path:
                        stack.append((u, path + [u], wsum + w))
            return out

        ref = {v: 0.0 for v in range(n)}
        for s, t in itertools.permutations(range(n), 2):
            paths = all_paths(s, t)
            if not paths:
                continue
            mind = min(p[0] for p in paths)
            short = [p[1] for p in paths if p[0] == mind]
            for v in range(n):
                if v in (s, t):
                    continue
                through = sum(1 for p in short if v in p)
                ref[v] += through / len(short)
        t = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                      "dst": pa.array([e[1] for e in edges], pa.int64()),
                      "weight": pa.array([e[2] for e in edges],
                                         pa.int64())})
        g = Graph(ray.data.from_arrow(t), n=None, weighted=True)
        got = betweenness_weighted(g).to_pandas()
        for r in got.itertuples():
            assert abs(ref[r.vertex] - r.bc) < 1e-12, r


def _brandes_cutoff_ref(n, adj, cutoff):
    """Truncated Brandes: only geodesics of length <= cutoff count —
    the igraph_betweenness_estimate contract (centrality.c:1909)."""
    bc = np.zeros(n)
    for s in range(n):
        S = []
        P = collections.defaultdict(list)
        sigma = np.zeros(n)
        sigma[s] = 1
        dist = np.full(n, -1)
        dist[s] = 0
        Q = collections.deque([s])
        while Q:
            v = Q.popleft()
            S.append(v)
            if dist[v] >= cutoff:
                continue  # discovered as a target, never expanded
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    Q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    P[w].append(v)
        delta = np.zeros(n)
        for w in reversed(S):
            for v in P[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def test_betweenness_cutoff_matches_truncated_brandes():
    g, adj, n = _graph(11, 60, 240)
    for cutoff in (1, 2, 3):
        got = betweenness(g, num_partitions=4, chunk=16, cutoff=cutoff) \
            .to_pandas().set_index("vertex")["bc"]
        ref = _brandes_cutoff_ref(n, adj, cutoff)
        for v in range(n):
            assert abs(got.get(v, 0.0) - ref[v]) < 1e-9, (cutoff, v)
    # a cutoff >= diameter reproduces the exact scores
    exact = _brandes_ref(n, adj)
    got = betweenness(g, num_partitions=4, chunk=16, cutoff=n) \
        .to_pandas().set_index("vertex")["bc"]
    for v in range(n):
        assert abs(got.get(v, 0.0) - exact[v]) < 1e-9


def test_closeness_cutoff_counts_only_near_targets():
    import igraph_ray.algorithms.paths as paths

    g, adj, n = _graph(13, 40, 150)
    got = paths.closeness_centrality(g, variant="out", num_partitions=4,
                                     cutoff=2).to_pandas() \
        .set_index("vertex")["closeness"]
    # brute: BFS per source, keep d <= 2
    for s in range(n):
        dist = {s: 0}
        q = collections.deque([s])
        while q:
            v = q.popleft()
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        near = [d for v, d in dist.items() if v != s and d <= 2]
        if near:
            assert abs(got[s] - len(near) / sum(near)) < 1e-12
        else:
            assert s not in got.index
