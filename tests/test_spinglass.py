"""Spinglass T=0 quench (Reichardt–Bornholdt Potts model,
clustertool.cpp:98 semantics at the deterministic zero-temperature
limit): planted recovery, karate floor, the gamma-controlled
resolution behavior on a ring of cliques (the phenomenon the RB model
was built to expose), determinism, degenerate inputs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from igraph_ray import Graph
from igraph_ray.algorithms.spinglass import spinglass_quench
from tests.fixtures import karate


def _mk(src, dst, n):
    return Graph.from_numpy(np.asarray(src, np.int64), np.asarray(dst, np.int64), n=n)


def _labels(res):
    return {r["vertex"]: r["community"] for r in res.state.take_all()}


def _ring_of_cliques(r: int = 8, k: int = 5):
    """r cliques of K_k joined in a ring by single edges."""
    src, dst = [], []
    for c in range(r):
        base = c * k
        for i in range(k):
            for j in range(i + 1, k):
                src.append(base + i)
                dst.append(base + j)
        # ring edge: last vertex of clique c -> first vertex of clique c+1
        src.append(base + k - 1)
        dst.append(((c + 1) % r) * k)
    return np.asarray(src), np.asarray(dst), r * k


def test_planted_partition_recovered():
    rng = np.random.default_rng(4)
    s1 = rng.integers(0, 20, 150); d1 = rng.integers(0, 20, 150)
    s2 = rng.integers(20, 40, 150); d2 = rng.integers(20, 40, 150)
    src = np.concatenate([s1, s2, [0]])
    dst = np.concatenate([d1, d2, [20]])
    keep = src != dst
    res = spinglass_quench(_mk(src[keep], dst[keep], 40), num_partitions=4)
    lab = _labels(res)
    left = {lab[v] for v in range(20)}
    right = {lab[v] for v in range(20, 40)}
    assert len(left) == 1 and len(right) == 1 and left != right
    assert res.modularity > 0.4


def test_karate_floor_and_dense_labels():
    n, s, d = karate()
    res = spinglass_quench(_mk(s, d, n), num_partitions=4)
    assert res.modularity >= 0.35, res.modularity
    lab = _labels(res)
    k = len(set(lab.values()))
    assert 2 <= k <= 6
    assert set(lab.values()) == set(range(k))


def test_ring_of_cliques_gamma_one():
    """At gamma=1 every K5 in an 8-clique ring is its own community —
    the per-clique partition is the Potts/H minimum here."""
    s, d, n = _ring_of_cliques(8, 5)
    res = spinglass_quench(_mk(s, d, n), gamma=1.0, num_partitions=4)
    lab = _labels(res)
    comms = {tuple(sorted(v for v in range(n) if lab[v] == c))
             for c in set(lab.values())}
    expected = {tuple(range(c * 5, c * 5 + 5)) for c in range(8)}
    assert comms == expected, comms


def test_resolution_monotone_in_gamma():
    """The RB gamma is a resolution dial: the number of communities in
    the quenched state is non-decreasing in gamma."""
    s, d, n = _ring_of_cliques(8, 5)
    ks = []
    for gamma in (0.3, 1.0, 3.0):
        lab = _labels(spinglass_quench(_mk(s, d, n), gamma=gamma,
                                       num_partitions=4))
        ks.append(len(set(lab.values())))
    assert ks[0] <= ks[1] <= ks[2], ks


def test_deterministic_across_partitioning():
    n, s, d = karate()
    a = _labels(spinglass_quench(_mk(s, d, n), num_partitions=2))
    b = _labels(spinglass_quench(_mk(s, d, n), num_partitions=6))
    assert a == b


def test_weighted_spinglass():
    src = np.array([0, 1, 2, 3, 4, 5, 0])
    dst = np.array([1, 2, 0, 4, 5, 3, 3])
    w = np.array([1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.01])
    import ray.data

    g = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()),
        "weight": pa.array(w, pa.float64())})), n=6, weighted=True)
    lab = _labels(spinglass_quench(g, num_partitions=2))
    assert lab[0] == lab[1] == lab[2]
    assert lab[3] == lab[4] == lab[5]
    assert lab[0] != lab[3]


def test_empty_graph():
    g = _mk([], [], n=4)
    res = spinglass_quench(g, num_partitions=2)
    assert len(_labels(res)) == 4
