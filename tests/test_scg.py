"""Spectral coarse graining (scg.c analogue): block-structure recovery,
semiprojector algebra vs dense numpy, determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from igraph_ray import Graph
from igraph_ray.algorithms.scg import scg_adjacency, scg_grouping


def _mk(src, dst, n):
    return Graph.from_numpy(np.asarray(src, np.int64),
                            np.asarray(dst, np.int64), n=n)


def _two_cliques(k=5):
    src, dst = [], []
    for off in (0, k):
        for i in range(k):
            for j in range(i + 1, k):
                src.append(off + i)
                dst.append(off + j)
    return src, dst, 2 * k


def test_two_cliques_group_by_clique():
    src, dst, n = _two_cliques(5)
    g = _mk(src, dst, n)
    groups = scg_grouping(g, ell=2, intervals=4, num_partitions=4)
    lab = {r["vertex"]: r["group"] for r in groups.take_all()}
    left = {lab[v] for v in range(5)}
    right = {lab[v] for v in range(5, 10)}
    assert len(left) == 1 and len(right) == 1 and left != right
    assert set(lab.values()) == {0, 1}


def test_coarse_matrix_matches_dense_semiprojector():
    """A'_{ab} must equal P·A·Pᵀ computed densely from the engine's own
    groups (double-counted undirected adjacency, loop-free)."""
    rng = np.random.default_rng(7)
    n = 24
    src = rng.integers(0, n, 60)
    dst = rng.integers(0, n, 60)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = _mk(src, dst, n)
    res = scg_adjacency(g, ell=2, intervals=3, num_partitions=4)
    lab = {r["vertex"]: r["group"] for r in res.groups.take_all()}
    k = res.num_groups
    # dense A: simple symmetric 0/1 adjacency
    A = np.zeros((n, n))
    for s, d in zip(src, dst):
        A[s, d] = 1.0
        A[d, s] = 1.0
    P = np.zeros((k, n))
    sizes = np.zeros(k)
    for v, c in lab.items():
        sizes[c] += 1
    for v, c in lab.items():
        P[c, v] = 1.0 / np.sqrt(sizes[c])
    want = P @ A @ P.T
    got = np.zeros((k, k))
    for r in res.coarse.take_all():
        got[r["src"], r["dst"]] = r["weight"]
    assert np.allclose(got, want, atol=1e-9), np.abs(got - want).max()


def test_clique_coarse_eigenvalue():
    """Two disjoint K5s: each coarse self-entry is the clique's leading
    eigenvalue (k-1 = 4) — the SCG spectrum-preservation property on a
    graph where grouping is exact."""
    src, dst, n = _two_cliques(5)
    res = scg_adjacency(_mk(src, dst, n), ell=2, intervals=4,
                        num_partitions=4)
    got = {(r["src"], r["dst"]): r["weight"] for r in res.coarse.take_all()}
    assert np.isclose(got[(0, 0)], 4.0)
    assert np.isclose(got[(1, 1)], 4.0)
    assert (0, 1) not in got and (1, 0) not in got


def test_deterministic_across_partitioning():
    rng = np.random.default_rng(3)
    n = 30
    src = rng.integers(0, n, 80)
    dst = rng.integers(0, n, 80)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    a = {r["vertex"]: r["group"] for r in scg_grouping(
        _mk(src, dst, n), ell=2, intervals=4, num_partitions=2).take_all()}
    b = {r["vertex"]: r["group"] for r in scg_grouping(
        _mk(src, dst, n), ell=2, intervals=4, num_partitions=6).take_all()}
    assert a == b
