"""Flow utility transforms + Menger disjoint-path counts
(st-cuts.c:51,104,177; flow.c:2177,2218)."""

import itertools

import pyarrow as pa
import pytest
import ray.data

from igraph_ray.ops.flowutil import (edge_disjoint_paths,
                                     even_tarjan_reduction,
                                     reverse_residual_graph,
                                     residual_graph,
                                     vertex_disjoint_paths)


def _ds(rows, names):
    cols = list(zip(*rows)) if rows else [[] for _ in names]
    return ray.data.from_arrow(pa.table(
        {nm: pa.array(list(c), pa.int64() if nm in ("src", "dst")
                      else pa.float64())
         for nm, c in zip(names, cols)}))


def test_even_tarjan_shape():
    e = _ds([(0, 1), (1, 2)], ["src", "dst"])
    out = even_tarjan_reduction(e, 3).to_pandas()
    rows = sorted(map(tuple, out[["src", "dst", "capacity"]].values))
    assert rows == sorted([
        (0, 3, 1.0), (1, 4, 1.0), (2, 5, 1.0),   # splitters
        (3, 1, 3.0), (4, 0, 3.0),                # edge (0,1)
        (4, 2, 3.0), (5, 1, 3.0)])               # edge (1,2)


def test_residual_and_reverse():
    rows = [(0, 1, 2.0, 2.0), (1, 2, 3.0, 1.0), (2, 0, 1.0, 0.0)]
    e = _ds(rows, ["src", "dst", "capacity", "flow"])
    res = sorted(map(tuple,
                     residual_graph(e).to_pandas().values))
    # saturated (0,1) drops; capacity reported as the ORIGINAL one
    assert res == [(1, 2, 3.0), (2, 0, 1.0)]
    rev = sorted(map(tuple,
                     reverse_residual_graph(e).to_pandas().values))
    # flow>0: (0,1),(1,2); flow<cap: (2,1),(0,2)
    assert rev == [(0, 1), (0, 2), (1, 2), (2, 1)]


def _brute_edge_disjoint(edges, s, t):
    # max number of edge-disjoint s->t paths by greedy path removal on
    # all orderings is wrong; use min-cut enumeration instead (Menger)
    n = max(max(a, b) for a, b in edges) + 1
    best = len(edges)
    for k in range(len(edges) + 1):
        for cut in itertools.combinations(range(len(edges)), k):
            rem = [e for i, e in enumerate(edges) if i not in cut]
            if not _reachable(rem, n, s, t):
                return k
    return best


def _reachable(edges, n, s, t):
    adj = [[] for _ in range(n)]
    for a, b in edges:
        adj[a].append(b)
    seen = {s}
    q = [s]
    while q:
        u = q.pop()
        if u == t:
            return True
        for w in adj[u]:
            if w not in seen:
                seen.add(w)
                q.append(w)
    return t in seen


@pytest.mark.parametrize("edges,s,t", [
    ([(0, 1), (0, 2), (1, 3), (2, 3), (0, 3)], 0, 3),
    ([(0, 1), (1, 2), (2, 3), (0, 2), (1, 3)], 0, 3),
    ([(0, 1), (1, 2)], 0, 2),
])
def test_edge_disjoint_menger(edges, s, t):
    ds = _ds(edges, ["src", "dst"])
    assert edge_disjoint_paths(ds, s, t) == \
        _brute_edge_disjoint(edges, s, t)


def test_vertex_disjoint_adjacent_pair():
    # diamond + direct edge: 2 internally-disjoint paths + the edge
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (0, 3)]
    ds = _ds(edges, ["src", "dst"])
    assert vertex_disjoint_paths(ds, 0, 3) == 3
    # without the direct edge: 2
    ds2 = _ds(edges[:-1], ["src", "dst"])
    assert vertex_disjoint_paths(ds2, 0, 3) == 2


def test_source_target_guard():
    ds = _ds([(0, 1)], ["src", "dst"])
    with pytest.raises(ValueError):
        edge_disjoint_paths(ds, 0, 0)
    with pytest.raises(ValueError):
        vertex_disjoint_paths(ds, 1, 1)
