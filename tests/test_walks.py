from collections import defaultdict

import numpy as np

from igraph_ray import Graph
from igraph_ray.algorithms.walks import random_walks
from tests import fixtures as fx

M, A, B, C = 1 << 20, 9973, 7919, 104729


def _brute(src, dst, starts, length):
    # loop-free view: the engine's CSR drops self-loops (documented)
    adj = defaultdict(list)
    for a, b in zip(src, dst):
        if a != b:
            adj[int(a)].append(int(b))
    for k in adj:
        adj[k].sort()
    rows = set()
    for w in sorted(set(int(s) for s in starts)):
        v = w
        rows.add((w, 0, v))
        for step in range(length):
            nb = adj.get(v, [])
            if not nb:
                break
            v = nb[((w % M) * A + step * B + (v % M) * C) % len(nb)]
            rows.add((w, step + 1, v))
    return rows


def _engine(src, dst, starts, length, n=None):
    g = Graph.from_numpy(np.asarray(src, np.int64),
                         np.asarray(dst, np.int64), n=n)
    rows = random_walks(g, starts, length, num_partitions=4).take_all()
    return {(r["walk"], r["step"], r["vertex"]) for r in rows}


def test_walks_small():
    # cycle walks forever, path truncates at the sink
    src = [0, 1, 2, 3, 5, 6]
    dst = [1, 2, 3, 0, 6, 7]
    got = _engine(src, dst, [0, 5], 6, n=None)
    want = _brute(src, dst, [0, 5], 6)
    assert got == want
    # the walk from 5 dies at 7 after two steps
    assert max(s for (w, s, v) in got if w == 5) == 2


def test_walks_random_and_parallelism_invariance():
    n, src, dst = fx.er_digraph(n=80, m=400, seed=9)
    starts = list(range(0, 80, 7))
    want = _brute(src, dst, starts, 12)
    g = Graph.from_numpy(np.asarray(src, np.int64),
                         np.asarray(dst, np.int64), n=n)
    for P in (2, 5):
        rows = random_walks(g, starts, 12, num_partitions=P).take_all()
        got = {(r["walk"], r["step"], r["vertex"]) for r in rows}
        assert got == want, P


def test_walks_multigraph_multiplicity():
    # vertex 0 has edges to 1 (x2) and 2: sorted multiset [1, 1, 2];
    # the rule indexes the multiset, so 1 is twice as likely
    src = [0, 0, 0, 1, 2]
    dst = [1, 1, 2, 0, 0]
    got = _engine(src, dst, [0], 4, n=3)
    want = _brute(src, dst, [0], 4)
    assert got == want


def test_weighted_walks_draw_rule():
    """The weighted draw picks by cumulative weight in dst order and is
    parallelism-invariant."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from igraph_ray.algorithms.walks import random_walks
    from igraph_ray.graph import Graph

    # 0 -> {1 (w=3), 2 (w=1)}; 1 -> {3 (w=2)}; 2 -> {3 (w=5)}
    edges = pa.table({
        "src": pa.array([0, 0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 3, 3], pa.int64()),
        "weight": pa.array([3, 1, 2, 5], pa.int64())})
    g = Graph(ray.data.from_arrow(edges).materialize(), n=None, weighted=True)
    out = {(r["walk"], r["step"]): r["vertex"] for r in
           random_walks(g, [0], 3, num_partitions=2, weighted=True).take_all()}
    # replicate the rule by hand
    M, A, B, C = 1 << 20, 9973, 7919, 104729
    adj = {0: [(1, 3), (2, 1)], 1: [(3, 2)], 2: [(3, 5)]}
    v, w = 0, 0
    assert out[(0, 0)] == 0
    for step in range(3):
        if v not in adj:
            assert (w, step + 1) not in out
            break
        nbrs = adj[v]
        total = sum(x[1] for x in nbrs)
        choice = ((w % M) * A + step * B + (v % M) * C) % total
        cum = 0
        for d, wt in nbrs:
            cum += wt
            if choice < cum:
                v = d
                break
        assert out[(0, step + 1)] == v, step

    g2 = Graph(ray.data.from_arrow(edges).materialize(), n=None, weighted=True)
    out2 = {(r["walk"], r["step"]): r["vertex"] for r in
            random_walks(g2, [0], 3, num_partitions=4,
                         weighted=True).take_all()}
    assert out == out2
