from collections import defaultdict

import numpy as np

from igraph_ray import Graph
from igraph_ray.algorithms.biconnected import (
    articulation_points,
    biconnected_components,
)
from tests import fixtures as fx


def _brute(src, dst):
    """(articulation set, biconn edge partition) of the simple
    undirected view via the sequential Hopcroft–Tarjan low-point scan
    (iterative)."""
    nbr = defaultdict(set)
    for a, b in zip(src, dst):
        if a != b:
            nbr[int(a)].add(int(b))
            nbr[int(b)].add(int(a))
    disc, low = {}, {}
    artic = set()
    comps = []  # list of frozensets of canonical edges
    timer = [0]
    for r in sorted(nbr):
        if r in disc:
            continue
        stack = [(r, None, iter(sorted(nbr[r])))]
        estack = []
        disc[r] = low[r] = timer[0]
        timer[0] += 1
        children = 0
        root_children = {r: 0}
        while stack:
            v, parent, it = stack[-1]
            advanced = False
            for w in it:
                if w == parent:
                    continue
                if w not in disc:
                    estack.append((min(v, w), max(v, w)))
                    disc[w] = low[w] = timer[0]
                    timer[0] += 1
                    if v == r:
                        root_children[r] += 1
                    stack.append((w, v, iter(sorted(nbr[w]))))
                    advanced = True
                    break
                elif disc[w] < disc[v]:
                    estack.append((min(v, w), max(v, w)))
                    low[v] = min(low[v], disc[w])
            if not advanced:
                stack.pop()
                if stack:
                    u = stack[-1][0]
                    low[u] = min(low[u], low[v])
                    if low[v] >= disc[u]:
                        if u != r:
                            artic.add(u)
                        comp = set()
                        while estack:
                            e = estack.pop()
                            comp.add(e)
                            if e == (min(u, v), max(u, v)):
                                break
                        if comp:
                            comps.append(frozenset(comp))
        if root_children[r] >= 2:
            artic.add(r)
    return artic, {frozenset(c) for c in comps if c}


def _engine(src, dst, n=None):
    g = Graph.from_numpy(np.asarray(src, np.int64),
                         np.asarray(dst, np.int64), n=n)
    ap = sorted(r["vertex"] for r in
                articulation_points(g, num_partitions=4).take_all())
    rows = biconnected_components(g, num_partitions=4).take_all()
    by_label = defaultdict(set)
    for r in rows:
        by_label[(r["comp_lo"], r["comp_hi"])].add((r["lo"], r["hi"]))
    return set(ap), {frozenset(v) for v in by_label.values()}


def test_known_graphs():
    # path 0-1-2: middle vertex cuts; each edge its own component
    ap, cc = _engine([0, 1], [1, 2], n=3)
    assert ap == {1}
    assert cc == {frozenset({(0, 1)}), frozenset({(1, 2)})}
    # triangle: no cuts, one component
    ap, cc = _engine([0, 1, 2], [1, 2, 0], n=3)
    assert ap == set()
    assert cc == {frozenset({(0, 1), (1, 2), (0, 2)})}
    # bowtie: two triangles sharing vertex 2
    src = [0, 1, 2, 2, 3, 2]
    dst = [1, 2, 0, 3, 4, 4]
    ap, cc = _engine(src, dst, n=5)
    assert ap == {2}
    assert cc == {frozenset({(0, 1), (1, 2), (0, 2)}),
                  frozenset({(2, 3), (3, 4), (2, 4)})}
    # C4 with pendant: 0-1-2-3-0 plus 3-9
    ap, cc = _engine([0, 1, 2, 3, 3], [1, 2, 3, 0, 9], n=None)
    assert ap == {3}
    assert cc == {frozenset({(0, 1), (1, 2), (2, 3), (0, 3)}),
                  frozenset({(3, 9)})}
    # loops/parallels ignored; disconnected pieces independent
    ap, cc = _engine([0, 0, 1, 1, 5, 6], [1, 1, 2, 1, 6, 7], n=None)
    assert ap == {1, 6}


def test_sibling_chain_not_articulation():
    # v=0 root with two subtrees linked to each other and one escaping:
    # star 0-1, 0-2, deep edges 1-3, 2-4, cross 3-4, and 1-2 closes a
    # cycle through the root: removing 0 keeps {1,3,4,2} connected.
    src = [0, 0, 1, 2, 3, 1]
    dst = [1, 2, 3, 4, 4, 2]
    ap, cc = _engine(src, dst, n=5)
    br, bc = _brute(src, dst)
    assert ap == br
    assert cc == bc


def test_random_vs_brute():
    for seed, m in [(1, 55), (2, 70), (3, 90), (4, 120), (5, 40)]:
        n, src, dst = fx.er_digraph(n=50, m=m, seed=seed)
        ap, cc = _engine(src, dst, n=n)
        br, bc = _brute(src, dst)
        assert ap == br, (seed, m, ap ^ br)
        assert cc == bc, (seed, m)
