"""Feedback arc set, Eades GR (feedback_arc_set.c:191 semantics):
DAG no-op, planted back edge, acyclicity after removal, the
m/2 - n/6 bound on 2-cycle-free digraphs, weighted avoidance,
determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from igraph_ray import Graph
from igraph_ray.algorithms.fas import feedback_arc_set


def _mk(src, dst, n):
    return Graph.from_numpy(np.asarray(src, np.int64),
                            np.asarray(dst, np.int64), n=n)


def _pairs(t):
    return set(zip(t["src"].to_pylist(), t["dst"].to_pylist()))


def _is_dag(edges, n):
    indeg = [0] * n
    adj = [[] for _ in range(n)]
    for a, b in edges:
        adj[a].append(b)
        indeg[b] += 1
    q = [v for v in range(n) if indeg[v] == 0]
    seen = 0
    while q:
        v = q.pop()
        seen += 1
        for w in adj[v]:
            indeg[w] -= 1
            if indeg[w] == 0:
                q.append(w)
    return seen == n


def test_dag_empty_fas():
    t = feedback_arc_set(_mk([0, 0, 1, 2], [1, 2, 3, 3], 4))
    assert t.num_rows == 0


def test_single_cycle_breaks_one_edge():
    t = feedback_arc_set(_mk([0, 1, 2, 3], [1, 2, 3, 0], 4))
    fas = _pairs(t)
    assert len(fas) == 1
    assert fas <= {(0, 1), (1, 2), (2, 3), (3, 0)}


def test_random_two_cycle_free_bound_and_acyclic():
    rng = np.random.default_rng(5)
    for trial in range(3):
        n = 30
        cand = [(i, j) for i in range(n) for j in range(n) if i != j]
        rng.shuffle(cand)
        chosen = {}
        for a, b in cand:
            if (b, a) not in chosen and len(chosen) < 120:
                chosen[(a, b)] = True
        edges = list(chosen)
        m = len(edges)
        s, d = zip(*edges)
        fas = _pairs(feedback_arc_set(_mk(s, d, n)))
        rest = [e for e in edges if e not in fas]
        assert _is_dag(rest, n), trial
        assert len(fas) <= m / 2 - n / 6 + 1e-9, (len(fas), m, n)


def test_weighted_avoids_heavy_edge():
    import ray.data

    g = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 0], pa.int64()),
        "weight": pa.array([1.0, 1.0, 10.0], pa.float64())})),
        n=3, weighted=True)
    fas = _pairs(feedback_arc_set(g))
    assert len(fas) == 1 and (2, 0) not in fas


def test_deterministic_across_partitioning():
    rng = np.random.default_rng(9)
    s = rng.integers(0, 50, 200)
    d = rng.integers(0, 50, 200)
    keep = s != d
    import ray.data

    t1 = feedback_arc_set(_mk(s[keep], d[keep], 50))
    g2 = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array(s[keep], pa.int64()),
        "dst": pa.array(d[keep], pa.int64())})).repartition(5), n=50)
    assert feedback_arc_set(g2).equals(t1)
