"""BFS/DFS visitor orders vs in-test sequential replays
(igraph_bfs / igraph_dfs, visitors.c:26,395 — sorted-neighbor
deterministic variant)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.algorithms.visitors import bfs_visitor, dfs_visitor


def _graph(edges):
    src = pa.array([e[0] for e in edges], pa.int64())
    dst = pa.array([e[1] for e in edges], pa.int64())
    return Graph(ray.data.from_arrow(pa.table({"src": src, "dst": dst})))


def _adj(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    return {v: sorted(ns) for v, ns in adj.items()}


def _bfs_ref(edges, source):
    """Textbook FIFO BFS with sorted adjacency."""
    adj = _adj(edges)
    rank = {source: 0}
    father = {source: -1}
    dist = {source: 0}
    queue = [source]
    head = 0
    while head < len(queue):
        v = queue[head]; head += 1
        for w in adj.get(v, []):
            if w not in rank:
                rank[w] = len(queue)
                father[w] = v
                dist[w] = dist[v] + 1
                queue.append(w)
    return {v: (rank[v], father[v], dist[v]) for v in rank}


def _dfs_ref(edges, source):
    """Iterative DFS, ascending neighbors, with discovery/finish order."""
    adj = _adj(edges)
    disc, fin, father, dist = {}, {}, {source: -1}, {source: 0}
    nd = nf = 0
    stack = [(source, iter(adj.get(source, [])))]
    disc[source] = nd; nd += 1
    while stack:
        v, it = stack[-1]
        nxt = None
        for w in it:
            if w not in disc:
                nxt = w
                break
        if nxt is None:
            stack.pop()
            fin[v] = nf; nf += 1
        else:
            disc[nxt] = nd; nd += 1
            father[nxt] = v
            dist[nxt] = dist[v] + 1
            stack.append((nxt, iter(adj.get(nxt, []))))
    return {v: (disc[v], fin[v], father[v], dist[v]) for v in disc}


EDGES_DIAMOND = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (2, 5), (5, 6),
                 (3, 7), (7, 8), (8, 1), (6, 9), (9, 2), (4, 10)]


def _rand_edges(n, m, seed):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    keep = src != dst
    return sorted(set(zip(src[keep].tolist(), dst[keep].tolist())))


class TestBFS:
    def test_diamond(self, ray_session):
        got = bfs_visitor(_graph(EDGES_DIAMOND), 1).to_pandas()
        ref = _bfs_ref(EDGES_DIAMOND, 1)
        assert len(got) == len(ref)
        for r in got.itertuples():
            assert ref[r.vertex] == (r.rank, r.father, r.dist), r

    @pytest.mark.parametrize("seed", [3, 11])
    def test_random(self, ray_session, seed):
        edges = _rand_edges(60, 150, seed)
        src = edges[0][0]
        got = bfs_visitor(_graph(edges), src).to_pandas()
        ref = _bfs_ref(edges, src)
        assert len(got) == len(ref)
        for r in got.itertuples():
            assert ref[r.vertex] == (r.rank, r.father, r.dist), r

    def test_ranks_are_queue_positions(self, ray_session):
        got = bfs_visitor(_graph(EDGES_DIAMOND), 1).to_pandas()
        ranks = sorted(got["rank"].tolist())
        assert ranks == list(range(len(got)))
        # father always visited strictly earlier
        rk = dict(zip(got.vertex, got["rank"]))
        for r in got.itertuples():
            if r.father >= 0:
                assert rk[r.father] < r.rank

    def test_partitioning_invariance(self, ray_session):
        edges = _rand_edges(50, 120, 7)
        g1 = _graph(edges)
        g2 = Graph(g1.edges.repartition(7))
        a = bfs_visitor(g1, edges[0][0]).to_pandas()
        b = bfs_visitor(g2, edges[0][0]).to_pandas()
        assert a.values.tolist() == b.values.tolist()


class TestDFS:
    def test_diamond(self, ray_session):
        got = dfs_visitor(_graph(EDGES_DIAMOND), 1).to_pandas()
        ref = _dfs_ref(EDGES_DIAMOND, 1)
        assert len(got) == len(ref)
        for r in got.itertuples():
            assert ref[r.vertex] == (r.order, r.order_out, r.father,
                                     r.dist), r

    @pytest.mark.parametrize("seed", [5, 13])
    def test_random(self, ray_session, seed):
        edges = _rand_edges(60, 150, seed)
        src = edges[0][0]
        got = dfs_visitor(_graph(edges), src).to_pandas()
        ref = _dfs_ref(edges, src)
        assert len(got) == len(ref)
        for r in got.itertuples():
            assert ref[r.vertex] == (r.order, r.order_out, r.father,
                                     r.dist), r


class TestUnfoldTree:
    def test_tree_properties(self, ray_session):
        from igraph_ray.algorithms.visitors import unfold_tree

        got = unfold_tree(_graph(EDGES_DIAMOND), 1, n=100).to_pandas()
        # every original edge reachable from the root appears exactly once
        ref = _bfs_ref(EDGES_DIAMOND, 1)
        reach_edges = [(a, b) for a, b in EDGES_DIAMOND if a in ref]
        assert len(got) == len(reach_edges)
        # tree: every dst has exactly one incoming edge
        assert got["dst"].is_unique
        # copies are leaves with ids >= n and map back to reached verts
        copies = got[got.dst >= 100]
        assert set(copies.dst_orig).issubset(ref)
        assert not set(copies.dst) & set(got.src)
        # tree rows keep dst_orig == dst and match the BFS fathers
        tree = got[got.dst < 100]
        for r in tree.itertuples():
            assert r.dst_orig == r.dst
            assert ref[r.dst][1] == r.src

    def test_copy_multiplicity(self, ray_session):
        from igraph_ray.algorithms.visitors import unfold_tree

        # triangle: root 0 -> 1, 0 -> 2, 1 -> 2 (2 reached twice)
        got = unfold_tree(_graph([(0, 1), (0, 2), (1, 2)]), 0,
                          n=10).to_pandas()
        assert len(got) == 3
        assert sorted(got.dst_orig) == [1, 2, 2]
        assert (got.dst >= 10).sum() == 1
