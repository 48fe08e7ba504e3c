"""Max-flow / min-cut vs an exact Edmonds-Karp oracle.

Reference semantics: igraph_maxflow (flow.c:53-477) phase 1 — flow value
and min-cut partition. The oracle below is a tiny sequential BFS
augmenting-path max-flow (public textbook algorithm), independent of the
engine's push-relabel pulses.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray

from igraph_ray.algorithms.flow import maxflow, mincut


def edmonds_karp(n, src, dst, cap, s, t):
    """Sequential max-flow oracle; returns (value, S-side set)."""
    res = {}
    for u, v, c in zip(src, dst, cap):
        if u == v:
            continue
        res[(u, v)] = res.get((u, v), 0.0) + float(c)
        res.setdefault((v, u), 0.0)
    adj = {}
    for (u, v) in res:
        adj.setdefault(u, []).append(v)
    value = 0.0
    while True:
        # BFS for augmenting path
        parent = {s: None}
        q = [s]
        while q and t not in parent:
            u = q.pop(0)
            for v in adj.get(u, []):
                if v not in parent and res[(u, v)] > 1e-12:
                    parent[v] = u
                    q.append(v)
        if t not in parent:
            break
        # bottleneck
        path = []
        v = t
        while parent[v] is not None:
            path.append((parent[v], v))
            v = parent[v]
        aug = min(res[e] for e in path)
        for (u, v) in path:
            res[(u, v)] -= aug
            res[(v, u)] += aug
        value += aug
    side = set(parent)  # vertices reachable from s in final residual
    return value, side


def _ds(src, dst, cap):
    return ray.data.from_arrow(pa.table({
        "src": pa.array(np.asarray(src, np.int64)),
        "dst": pa.array(np.asarray(dst, np.int64)),
        "capacity": pa.array(np.asarray(cap, np.float64)),
    }))


def _check(n, src, dst, cap, s, t, **kw):
    ref_val, ref_side = edmonds_karp(n, src, dst, cap, s, t)
    res = maxflow(_ds(src, dst, cap), s, t, n=n, **kw)
    assert res.value == pytest.approx(ref_val, abs=1e-9)
    # the cut must be a valid s-t cut of capacity == value
    cut_set = set(res.cut_side_s.tolist())
    assert s in cut_set and t not in cut_set
    crossing = sum(
        float(c) for u, v, c in zip(src, dst, cap)
        if u != v and u in cut_set and v not in cut_set
    )
    assert crossing == pytest.approx(ref_val, abs=1e-9)
    return res


def test_textbook_diamond():
    # classic CLRS-style network: value 23
    src = [0, 0, 1, 1, 2, 2, 3, 3, 4, 4]
    dst = [1, 2, 2, 3, 1, 4, 2, 5, 3, 5]
    cap = [16, 13, 10, 12, 4, 14, 9, 20, 7, 4]
    res = _check(6, src, dst, cap, 0, 5)
    assert res.value == pytest.approx(23.0)


def test_disconnected_target():
    src = [0, 1]
    dst = [1, 0]
    cap = [5.0, 3.0]
    res = maxflow(_ds(src, dst, cap), 0, 2, n=3)
    assert res.value == 0.0
    assert 2 not in set(res.cut_side_s.tolist())


def test_parallel_edges_add_and_loops_drop():
    src = [0, 0, 0, 1, 1]
    dst = [1, 1, 0, 2, 2]
    cap = [2.0, 3.0, 99.0, 4.0, 0.5]
    res = _check(3, src, dst, cap, 0, 2)
    assert res.value == pytest.approx(4.5)


def test_random_graphs_match_oracle():
    rng = np.random.default_rng(1234)
    for trial in range(4):
        n = 30
        m = 150
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        cap = rng.uniform(0.5, 5.0, m).round(3)
        _check(n, src, dst, cap, 0, n - 1,
               num_partitions=3, global_relabel_every=4)


def test_mincut_alias():
    src = [0, 1]
    dst = [1, 2]
    cap = [7.0, 3.0]
    res = mincut(_ds(src, dst, cap), 0, 2, n=3)
    assert res.value == pytest.approx(3.0)
    assert set(res.cut_side_s.tolist()) == {0, 1}


# ---------------------------------------------------------- connectivity

def test_st_edge_connectivity_cycle():
    from igraph_ray.algorithms.flow import st_edge_connectivity
    # C5 undirected: two edge-disjoint paths between any pair
    src = [0, 1, 2, 3, 4]
    dst = [1, 2, 3, 4, 0]
    cap = [1.0] * 5
    assert st_edge_connectivity(_ds(src, dst, cap), 0, 2, n=5,
                                directed=False) == 2
    # directed C5: only one
    assert st_edge_connectivity(_ds(src, dst, cap), 0, 2, n=5,
                                directed=True) == 1


def test_st_vertex_connectivity():
    from igraph_ray.algorithms.flow import st_vertex_connectivity
    # two triangles sharing vertex 2: cut vertex -> connectivity 1
    src = [0, 1, 0, 2, 3, 2]
    dst = [1, 2, 2, 3, 4, 4]
    cap = [1.0] * 6
    assert st_vertex_connectivity(_ds(src, dst, cap), 0, 4, n=5,
                                  directed=False) == 1
    # C5 non-adjacent pair: 2
    assert st_vertex_connectivity(
        _ds([0, 1, 2, 3, 4], [1, 2, 3, 4, 0], [1.0] * 5),
        0, 2, n=5, directed=False) == 2
    # adjacent pair: reference NEI_NUMBER_OF_NODES rule
    assert st_vertex_connectivity(
        _ds([0, 1], [1, 2], [1.0, 1.0]), 0, 1, n=3, directed=True) == 3
    assert st_vertex_connectivity(
        _ds([0, 1], [1, 2], [1.0, 1.0]), 0, 1, n=3, directed=True,
        neighbors="negative") == -1
    with pytest.raises(ValueError):
        st_vertex_connectivity(_ds([0], [1], [1.0]), 0, 1, n=2,
                               directed=True, neighbors="error")


def test_st_vertex_connectivity_k4_minus():
    from igraph_ray.algorithms.flow import st_vertex_connectivity
    # K4 minus edge (0,3): vconn(0,3) = 2 (through 1 and 2)
    src = [0, 0, 1, 1, 2]
    dst = [1, 2, 2, 3, 3]
    cap = [1.0] * 5
    assert st_vertex_connectivity(_ds(src, dst, cap), 0, 3, n=4,
                                  directed=False) == 2
