"""Laplacian COO export (igraph_laplacian, spectral_properties.c:272):
row sums, symmetry, normalized spectrum bounds on a small fixture."""

from __future__ import annotations

import numpy as np

from igraph_ray import Graph
from igraph_ray.ops.structural import laplacian_edges


def _mk(src, dst, n):
    return Graph.from_numpy(np.asarray(src, np.int64),
                            np.asarray(dst, np.int64), n=n)


def _dense(rows, n, col):
    L = np.zeros((n, n))
    for r in rows:
        L[r["i"], r["j"]] = r[col]
    return L


def test_plain_laplacian_rows_sum_zero():
    # path 0-1-2 plus edge 1-3 (given directed, multi both ways)
    g = _mk([0, 1, 1, 2, 3], [1, 0, 2, 1, 1], n=4)
    rows = laplacian_edges(g).take_all()
    L = _dense(rows, 4, "value")
    assert np.allclose(L, L.T)
    assert np.allclose(L.sum(axis=1), 0)
    assert np.array_equal(np.diag(L), [1, 3, 1, 1])


def test_normalized_laplacian_spectrum():
    g = _mk([0, 1, 2, 3, 4], [1, 2, 3, 4, 0], n=5)  # C5
    rows = laplacian_edges(g, normalized=True).take_all()
    L = _dense(rows, 5, "value_e9") / 1e9
    assert np.allclose(L, L.T)
    ev = np.linalg.eigvalsh(L)
    assert ev.min() > -1e-6 and ev.max() < 2 + 1e-6
    assert abs(ev.min()) < 1e-6  # lambda_0 = 0
    # C5 normalized Laplacian eigenvalues: 1 - cos(2 pi k / 5)
    want = np.sort(1 - np.cos(2 * np.pi * np.arange(5) / 5))
    assert np.allclose(np.sort(ev), want, atol=1e-6)
