"""Dominator tree (igraph_dominator_tree, st-cuts.c:388 semantics via
the CHK fixpoint): textbook fixture, definitional brute-force
cross-check on random digraphs, unreachable handling, determinism."""

from __future__ import annotations

import numpy as np

from igraph_ray import Graph
from igraph_ray.algorithms.dominators import dominator_tree


def _mk(src, dst, n):
    return Graph.from_numpy(np.asarray(src, np.int64),
                            np.asarray(dst, np.int64), n=n)


def _idoms(t):
    return {r["vertex"]: r["idom"] for r in t.to_pylist()}


def test_diamond_and_chain():
    # 0->1, 0->2, 1->3, 2->3, 3->4
    d = _idoms(dominator_tree(_mk([0, 0, 1, 2, 3], [1, 2, 3, 3, 4], 5),
                              root=0))
    assert d == {1: 0, 2: 0, 3: 0, 4: 3}


def test_textbook_lt_example():
    # Lengauer-Tarjan style: R=0; 0->1,0->2; 1->3; 2->3,2->4; 3->5;
    # 4->5; 5->6; 4->6
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (2, 4), (3, 5), (4, 5),
             (5, 6), (4, 6)]
    s, d = zip(*edges)
    got = _idoms(dominator_tree(_mk(s, d, 7), root=0))
    assert got == {1: 0, 2: 0, 3: 0, 4: 2, 5: 0, 6: 0}


def _brute(edges, n, root):
    adj = [[] for _ in range(n)]
    for a, b in edges:
        adj[a].append(b)

    def reach(block):
        seen = {root} if root != block else set()
        st = [root] if root != block else []
        while st:
            v = st.pop()
            for w in adj[v]:
                if w != block and w not in seen:
                    seen.add(w)
                    st.append(w)
        return seen

    full = reach(-1)
    strict = {w: {root} for w in full if w != root}
    for v in full:
        if v == root:
            continue
        rv = reach(v)
        for w in full:
            if w not in (root, v) and w not in rv:
                strict[w].add(v)
    out = {}
    for w, doms in strict.items():
        out[w] = max(doms, key=lambda v: len(strict.get(v, set())))
    return out


def test_matches_definitional_on_random_digraphs():
    rng = np.random.default_rng(11)
    for trial in range(3):
        n = 40
        m = 120
        s = rng.integers(0, n, m)
        d = rng.integers(0, n, m)
        keep = s != d
        edges = list(zip(s[keep].tolist(), d[keep].tolist()))
        got = _idoms(dominator_tree(_mk(*zip(*edges), n), root=0))
        assert got == _brute(edges, n, 0), trial


def test_unreachable_omitted_and_deterministic():
    # 0->1; 2->3 unreachable from 0
    g = _mk([0, 2], [1, 3], 4)
    t = dominator_tree(g, root=0)
    assert _idoms(t) == {1: 0}
    import ray.data
    import pyarrow as pa
    g2 = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([0, 2], pa.int64()),
        "dst": pa.array([1, 3], pa.int64())})).repartition(3), n=4)
    assert dominator_tree(g2, root=0).equals(t)
