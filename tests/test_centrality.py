"""Eigenvector centrality + HITS vs dense numpy power iteration.

Oracle: the exact recurrence (sum-normalized power iteration, fixed K,
final max-normalization) on the dense adjacency matrix — the same
recurrence the SQL driver oracle unrolls (queries._sql_eigenvector /
_sql_hits). Reference semantics: centrality.c:308-520 (eigenvector,
in-edge directed mode) and :560-720 (hub/authority)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.algorithms.centrality import eigenvector_centrality, hits
from igraph_ray.graph import Graph


def _random_graph(seed, n=80, m=600, weighted=False):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    cols = {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
    w = None
    if weighted:
        w = rng.integers(1, 8, len(src)).astype(np.float64)
        cols["weight"] = pa.array(w, pa.float64())
    A = np.zeros((n, n))
    np.add.at(A, (src, dst), w if weighted else 1.0)
    g = Graph(ray.data.from_arrow(pa.table(cols)), n=n, weighted=weighted)
    return g, A


def _dense_ev(A, K):
    n = A.shape[0]
    x = np.full(n, 1.0 / n)
    for _ in range(K):
        y = A.T @ x
        x = y / y.sum()
    return x / x.max()


def _dense_hits(A, K):
    n = A.shape[0]
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(K):
        a = A.T @ h
        a = a / a.sum()
        h = A @ a
        h = h / h.sum()
    return h / h.max(), a / a.max()


@pytest.mark.parametrize("weighted", [False, True])
def test_eigenvector_matches_dense(weighted):
    g, A = _random_graph(11, weighted=weighted)
    res = eigenvector_centrality(g, fixed_iterations=40, num_partitions=3)
    got = {int(r["vertex"]): r["ev"] for r in res.state.take_all()}
    want = _dense_ev(A, 40)
    assert len(got) == A.shape[0]
    for v, w in enumerate(want):
        assert got[v] == pytest.approx(w, abs=1e-12)


def test_eigenvector_tol_mode_converges():
    g, A = _random_graph(12)
    res = eigenvector_centrality(g, tol=1e-12, max_iter=500, num_partitions=3)
    assert res.converged
    got = np.zeros(A.shape[0])
    for r in res.state.take_all():
        got[int(r["vertex"])] = r["ev"]
    want = _dense_ev(A, 400)
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_eigenvector_dag_degenerates_to_zero():
    # chain 0->1->2->3: principal eigenvalue 0 → all-zero scores
    edges = pa.table({"src": pa.array([0, 1, 2], pa.int64()),
                      "dst": pa.array([1, 2, 3], pa.int64())})
    g = Graph(ray.data.from_arrow(edges), n=4)
    res = eigenvector_centrality(g, fixed_iterations=50, num_partitions=2)
    rows = res.state.take_all()
    assert len(rows) == 4
    assert all(r["ev"] == 0.0 for r in rows)


def test_hits_matches_dense():
    g, A = _random_graph(13)
    res = hits(g, iterations=25, num_partitions=3)
    got = {int(r["vertex"]): (r["hub"], r["authority"]) for r in res.state.take_all()}
    wh, wa = _dense_hits(A, 25)
    for v in range(A.shape[0]):
        assert got[v][0] == pytest.approx(wh[v], abs=1e-12)
        assert got[v][1] == pytest.approx(wa[v], abs=1e-12)
