"""Global vertex connectivity + Gomory–Hu tree (flow.c:1923-2460
semantics): known-κ fixtures, the all-pairs Gomory–Hu property
(tree-path min == direct min cut), disconnected inputs, determinism."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.algorithms.connectivity import (_dinic, gomory_hu_tree,
                                                vertex_connectivity)
from igraph_ray.graph import Graph


def _g(src, dst, n, w=None):
    cols = {"src": np.array(src, np.int64), "dst": np.array(dst, np.int64)}
    if w is not None:
        cols["weight"] = np.array(w, float)
    return Graph(ray.data.from_arrow(pa.table(cols)), n=n,
                 weighted=w is not None)


def test_vertex_connectivity_known(ray_session):
    # cycle C5 -> 2
    assert vertex_connectivity(_g([0, 1, 2, 3, 4], [1, 2, 3, 4, 0], 5)) == 2
    # path P4 -> 1
    assert vertex_connectivity(_g([0, 1, 2], [1, 2, 3], 4)) == 1
    # disconnected -> 0
    assert vertex_connectivity(_g([0, 2], [1, 3], 4)) == 0
    # K5 -> 4 (no non-adjacent pair; pivot neighbors all adjacent)
    s, d = [], []
    for i in range(5):
        for j in range(i + 1, 5):
            s.append(i)
            d.append(j)
    assert vertex_connectivity(_g(s, d, 5)) == 4


def test_vertex_connectivity_petersen_and_cut_vertex(ray_session):
    outer = [(i, (i + 1) % 5) for i in range(5)]
    inner = [(5 + i, 5 + (i + 2) % 5) for i in range(5)]
    spokes = [(i, 5 + i) for i in range(5)]
    es = outer + inner + spokes
    g = _g([e[0] for e in es], [e[1] for e in es], 10)
    assert vertex_connectivity(g) == 3
    # two triangles sharing vertex 2: articulation point -> kappa 1
    # (min degree is 2, so the check shortcut does NOT fire — this
    # exercises the flow loop itself)
    g2 = _g([0, 1, 2, 2, 3, 4], [1, 2, 0, 3, 4, 2], 5)
    assert vertex_connectivity(g2) == 1


def _gh_path_min(tree: pa.Table, u: int, v: int) -> float:
    tp = tree.to_pydict()
    parent = dict(zip(tp["vertex"], tp["parent"]))
    fl = {x: f / 1e6 for x, f in zip(tp["vertex"], tp["flow_e6"])}
    anc = {}
    x = u
    while x != 0:
        anc[x] = True
        x = parent[x]
    anc[0] = True
    mins = float("inf")
    x = v
    while x not in anc:
        mins = min(mins, fl[x])
        x = parent[x]
    lca = x
    y = u
    while y != lca:
        mins = min(mins, fl[y])
        y = parent[y]
    return mins


def test_gomory_hu_all_pairs_property(ray_session):
    rng = np.random.default_rng(7)
    n = 12
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)
             if rng.random() < 0.4]
    w = [float(rng.integers(1, 9)) for _ in pairs]
    g = _g([p[0] for p in pairs], [p[1] for p in pairs], n, w)
    tree = gomory_hu_tree(g, weight_col="weight")
    asrc = np.array([p[0] for p in pairs] + [p[1] for p in pairs])
    adst = np.array([p[1] for p in pairs] + [p[0] for p in pairs])
    acap = np.array(w + w)
    for i in range(n):
        for j in range(i + 1, n):
            direct, _ = _dinic(n, asrc, adst, acap, i, j)
            assert abs(_gh_path_min(tree, i, j) - direct) < 1e-6


def test_gomory_hu_disconnected(ray_session):
    # two components: cross-component tree edges carry flow 0
    g = _g([0, 1, 2, 3], [1, 0, 3, 2], 4)
    tree = gomory_hu_tree(g)
    tp = tree.to_pydict()
    fl = dict(zip(tp["vertex"], tp["flow_e6"]))
    assert fl[2] == 0  # vertex 2 hangs off component {0,1} with cut 0


def test_gomory_hu_deterministic(ray_session):
    rng = np.random.default_rng(3)
    n = 10
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)
             if rng.random() < 0.5]
    g = _g([p[0] for p in pairs], [p[1] for p in pairs], n)
    t1 = gomory_hu_tree(g)
    t2 = gomory_hu_tree(g)
    assert t1.equals(t2)
