"""Leiden (Traag et al. 2019): planted-partition recovery, karate
modularity floor, the connectivity guarantee on refined output
communities, determinism, degenerate inputs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from igraph_ray import Graph
from igraph_ray.algorithms.leiden import leiden
from igraph_ray.algorithms.louvain import louvain
from tests.fixtures import karate


def _mk(src, dst, n):
    return Graph.from_numpy(np.asarray(src, np.int64), np.asarray(dst, np.int64), n=n)


def _labels(res):
    return {r["vertex"]: r["community"] for r in res.state.take_all()}


def _communities_connected(src, dst, lab) -> bool:
    """Every final community must induce a connected subgraph — the
    guarantee Leiden adds over Louvain (paper §Results)."""
    from collections import defaultdict

    adj = defaultdict(set)
    for s, d in zip(src, dst):
        if lab[s] == lab[d]:
            adj[s].add(d)
            adj[d].add(s)
    comms = defaultdict(set)
    for v, c in lab.items():
        comms[c].add(v)
    for members in comms.values():
        if len(members) == 1:
            continue
        seen = set()
        stack = [next(iter(members))]
        while stack:
            v = stack.pop()
            if v in seen:
                continue
            seen.add(v)
            stack.extend(adj[v] & members - seen)
        if seen != members:
            return False
    return True


def test_planted_partition_recovered():
    rng = np.random.default_rng(4)
    s1 = rng.integers(0, 20, 150); d1 = rng.integers(0, 20, 150)
    s2 = rng.integers(20, 40, 150); d2 = rng.integers(20, 40, 150)
    src = np.concatenate([s1, s2, [0]])
    dst = np.concatenate([d1, d2, [20]])
    keep = src != dst
    res = leiden(_mk(src[keep], dst[keep], 40), num_partitions=4)
    lab = _labels(res)
    left = {lab[v] for v in range(20)}
    right = {lab[v] for v in range(20, 40)}
    assert len(left) == 1 and len(right) == 1 and left != right
    assert res.modularity > 0.4


def test_karate_modularity_floor_and_connectivity():
    n, s, d = karate()
    res = leiden(_mk(s, d, n), num_partitions=4)
    assert res.modularity >= 0.38, res.modularity
    lab = _labels(res)
    k = len(set(lab.values()))
    assert 2 <= k <= 5
    assert set(lab.values()) == set(range(k))
    assert _communities_connected(s, d, lab)


def test_connectivity_guarantee_on_random_graph():
    """On a sparse random graph (where Louvain is known to occasionally
    emit disconnected communities), every Leiden community must induce a
    connected subgraph."""
    rng = np.random.default_rng(11)
    n = 120
    src = rng.integers(0, n, 260)
    dst = rng.integers(0, n, 260)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    res = leiden(_mk(src, dst, n), num_partitions=4)
    lab = _labels(res)
    assert _communities_connected(src.tolist(), dst.tolist(), lab)


def test_quality_not_worse_than_louvain_on_karate():
    n, s, d = karate()
    ql = louvain(_mk(s, d, n), num_partitions=4).modularity
    qe = leiden(_mk(s, d, n), num_partitions=4).modularity
    # refinement + informed coarse start must not lose macro quality
    assert qe >= ql - 0.02, (qe, ql)


def test_deterministic_across_partitioning():
    n, s, d = karate()
    a = _labels(leiden(_mk(s, d, n), num_partitions=2))
    b = _labels(leiden(_mk(s, d, n), num_partitions=6))
    assert a == b


def test_weighted_leiden():
    src = np.array([0, 1, 2, 3, 4, 5, 0])
    dst = np.array([1, 2, 0, 4, 5, 3, 3])
    w = np.array([1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.01])
    import ray.data

    g = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()),
        "weight": pa.array(w, pa.float64())})), n=6, weighted=True)
    lab = _labels(leiden(g, num_partitions=2))
    assert lab[0] == lab[1] == lab[2]
    assert lab[3] == lab[4] == lab[5]
    assert lab[0] != lab[3]


def test_empty_graph():
    g = _mk([], [], n=4)
    res = leiden(g, num_partitions=2)
    assert len(_labels(res)) == 4
