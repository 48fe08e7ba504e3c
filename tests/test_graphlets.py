"""Graphlet decomposition (glet.c analogue): basis enumeration over
threshold levels, EM projection fixed points, sequential-replica parity,
determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray import Graph
from igraph_ray.algorithms.graphlets import (
    graphlets,
    graphlets_candidate_basis,
    graphlets_project,
)


def _wg(src, dst, w, n):
    return Graph(ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
        "weight": pa.array(np.asarray(w, np.float64), pa.float64())})),
        n=n, weighted=True)


def _k(vs, w):
    src, dst, ws = [], [], []
    for i, a in enumerate(vs):
        for b in vs[i + 1:]:
            src.append(a)
            dst.append(b)
            ws.append(w)
    return src, dst, ws


def test_two_disjoint_edge_cliques_basis_and_fixed_point():
    """K4 (weight 2) + K3 (weight 1) sharing vertex 3 but no edge:
    basis = both cliques at their own threshold; the EM projection's
    fixed points are mu = 12/10 (K4) and 3/6 (K3)."""
    s1, d1, w1 = _k([0, 1, 2, 3], 2.0)
    s2, d2, w2 = _k([3, 4, 5], 1.0)
    g = _wg(s1 + s2, d1 + d2, w1 + w2, 6)
    cliques, thr = graphlets_candidate_basis(g, num_partitions=4)
    got = {c: t for c, t in zip(cliques, thr)}
    assert got == {(0, 1, 2, 3): 2.0, (3, 4, 5): 1.0}
    res = graphlets(g, niter=200, num_partitions=4)
    assert res.cliques == [(0, 1, 2, 3), (3, 4, 5)]
    assert np.allclose(res.mu, [1.2, 0.5], atol=1e-3), res.mu


def test_nested_threshold_basis():
    """K4 at weight 1 whose inner triangle {0,1,2} is reinforced to 3:
    both the full K4 (thr 1) and the triangle (thr 3) enter the basis."""
    src, dst, w = [], [], []
    for i in range(4):
        for j in range(i + 1, 4):
            src.append(i)
            dst.append(j)
            w.append(3.0 if i < 3 and j < 3 else 1.0)
    g = _wg(src, dst, w, 4)
    cliques, thr = graphlets_candidate_basis(g, num_partitions=2)
    got = {c: t for c, t in zip(cliques, thr)}
    assert got == {(0, 1, 2, 3): 1.0, (0, 1, 2): 3.0}


def test_projection_matches_sequential_replica():
    """mu after k iterations equals the reference EM recurrence
    (glet.c:736-744) replayed sequentially in numpy."""
    rng = np.random.default_rng(5)
    n = 12
    src, dst, w = [], [], []
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < 0.4:
                src.append(i)
                dst.append(j)
                w.append(float(rng.integers(1, 4)))
    g = _wg(src, dst, w, n)
    cliques, _thr = graphlets_candidate_basis(g, num_partitions=4)
    assert cliques  # sanity: basis non-empty
    mu = graphlets_project(g, cliques, niter=7, num_partitions=4)
    # sequential replica
    wmap = {(min(a, b), max(a, b)): ww for a, b, ww in zip(src, dst, w)}
    edges = sorted(wmap)
    e_of = {e: i for i, e in enumerate(edges)}
    inc = [[] for _ in edges]  # cliques per edge
    cl_edges = [[] for _ in cliques]
    for ci, cq in enumerate(cliques):
        for i, a in enumerate(cq):
            for b in cq[i + 1:]:
                inc[e_of[(a, b)]].append(ci)
                cl_edges[ci].append(e_of[(a, b)])
    ref = np.ones(len(cliques))
    wv = np.array([wmap[e] for e in edges])
    for _ in range(7):
        est = np.full(len(edges), 1e-4)
        for ei, cs in enumerate(inc):
            for c in cs:
                est[ei] += ref[c]
        for ci, cq in enumerate(cliques):
            sr = sum(wv[ei] / est[ei] for ei in cl_edges[ci])
            nn = len(cq)
            ref[ci] *= sr / (nn * (nn + 1) / 2)
    assert np.allclose(mu, ref, atol=1e-9), np.abs(mu - ref).max()


def test_deterministic_across_partitioning():
    s1, d1, w1 = _k([0, 1, 2, 3], 2.0)
    s2, d2, w2 = _k([2, 3, 4], 5.0)
    g = _wg(s1 + s2, d1 + d2, w1 + w2, 5)
    a = graphlets(g, niter=20, num_partitions=2)
    b = graphlets(g, niter=20, num_partitions=5)
    assert a.cliques == b.cliques
    assert np.allclose(a.mu, b.mu, atol=1e-12)
