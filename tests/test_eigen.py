"""Generic igraph_eigen_* surface (algorithms/eigen.py): iterative
LM/LA/SA/BE parity with dense numpy.linalg.eigh, guarded-dense SM/ALL
exactness, full-basis Rayleigh–Ritz exactness on a closed-form
spectrum, and the general non-symmetric dense path."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.algorithms.eigen import eigen_matrix, eigen_matrix_symmetric


def _coo(A, triu=True):
    n = A.shape[0]
    rows, cols, vals = [], [], []
    for i in range(n):
        for j in (range(i, n) if triu else range(n)):
            if A[i, j] != 0:
                rows.append(i)
                cols.append(j)
                vals.append(float(A[i, j]))
    return ray.data.from_arrow(pa.table({
        "row": pa.array(rows, pa.int64()),
        "col": pa.array(cols, pa.int64()),
        "value": pa.array(vals, pa.float64())}))


@pytest.fixture(scope="module")
def sym_case():
    rng = np.random.default_rng(7)
    n = 30
    A = rng.normal(size=(n, n))
    A = 0.5 * (A + A.T)
    return A, np.linalg.eigvalsh(A), _coo(A)


def test_eigen_symmetric_lm(ray_session, sym_case):
    A, w, ds = sym_case
    vals, vecs = eigen_matrix_symmetric(ds, 30, k=3, which="LM", iters=120)
    exp = w[np.argsort(-np.abs(w))][:3]
    assert np.allclose(sorted(vals), sorted(exp), atol=1e-4)
    V = (vecs.to_pandas().sort_values("vertex")
         [[f"v{j}" for j in range(3)]].to_numpy())
    for j in range(3):
        assert np.linalg.norm(A @ V[:, j] - vals[j] * V[:, j]) < 1e-3
        assert abs(np.linalg.norm(V[:, j]) - 1) < 1e-6


def test_eigen_symmetric_ends(ray_session, sym_case):
    _, w, ds = sym_case
    la, _ = eigen_matrix_symmetric(ds, 30, k=2, which="LA", iters=150)
    assert np.allclose(sorted(la), sorted(w[-2:]), atol=1e-4)
    sa, _ = eigen_matrix_symmetric(ds, 30, k=2, which="SA", iters=150)
    assert np.allclose(sorted(sa), sorted(w[:2]), atol=1e-4)
    be, bevecs = eigen_matrix_symmetric(ds, 30, k=4, which="BE", iters=150)
    assert np.allclose(sorted(be),
                       sorted(np.concatenate([w[:2], w[-2:]])), atol=1e-4)
    assert bevecs.count() == 30
    assert len(bevecs.schema().names) == 5


def test_eigen_symmetric_dense_paths(ray_session, sym_case):
    _, w, ds = sym_case
    va, _ = eigen_matrix_symmetric(ds, 30, k=30, which="ALL")
    assert np.allclose(va, w[::-1], atol=1e-10)
    vs, _ = eigen_matrix_symmetric(ds, 30, k=2, which="SM")
    assert np.allclose(vs, w[np.argsort(np.abs(w))][:2], atol=1e-10)


def test_eigen_symmetric_full_basis_exact(ray_session):
    """kk = n makes Rayleigh–Ritz exact in ONE step: C8's spectrum
    2cos(2pi j/8) recovered to 1e-9 in 3 iterations."""
    n = 8
    C = np.zeros((n, n))
    for i in range(n):
        C[i, (i + 1) % n] = 1
        C[(i + 1) % n, i] = 1
    vals, _ = eigen_matrix_symmetric(_coo(C), n, k=8, which="LM",
                                     iters=3, oversample=0)
    exp = sorted(2 * np.cos(2 * np.pi * np.arange(8) / 8), reverse=True)
    assert np.allclose(sorted(vals, reverse=True), exp, atol=1e-9)


def test_eigen_matrix_general(ray_session):
    rng = np.random.default_rng(3)
    B = rng.normal(size=(12, 12))
    w = np.linalg.eigvals(B)
    vals, vecs = eigen_matrix(_coo(B, triu=False), 12, k=3, which="LR")
    exp = w[np.argsort(-w.real)][:3]
    assert np.allclose(sorted(x.real for x in vals),
                       sorted(exp.real), atol=1e-9)
    assert {"vertex", "v0_re", "v0_im"} <= set(vecs.schema().names)
    vlm, _ = eigen_matrix(_coo(B, triu=False), 12, k=2, which="LM")
    explm = w[np.argsort(-np.abs(w))][:2]
    assert np.allclose(sorted(abs(x) for x in vlm),
                       sorted(np.abs(explm)), atol=1e-9)


def test_eigen_laplacian_c12(ray_session):
    from igraph_ray.algorithms.eigen import eigen_laplacian
    from igraph_ray.graph import Graph

    n = 12
    cyc = [(i, (i + 1) % n) for i in range(n)]
    g = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, b in cyc], pa.int64()),
        "dst": pa.array([b for a, b in cyc], pa.int64())})), n=n)
    vals, vecs = eigen_laplacian(g, k=3, which="SA", iters=150)
    exp = sorted(2 - 2 * np.cos(2 * np.pi * np.arange(n) / n))[:3]
    assert np.allclose(sorted(vals), exp, atol=1e-6)
    assert vecs.count() == n


def test_eigen_symmetric_both_triangles(ray_session, sym_case):
    """mirror=True must not double off-diagonals when the caller
    supplies a FULL symmetric COO (both triangles): eigenvalues match
    the single-triangle supply exactly, and an inconsistent pair
    (A[i,j] != A[j,i]) raises instead of silently averaging."""
    A, w, _ = sym_case
    full = _coo(A, triu=False)
    vals, _ = eigen_matrix_symmetric(full, 30, k=3, which="LM", iters=120)
    exp = w[np.argsort(-np.abs(w))][:3]
    assert np.allclose(sorted(vals), sorted(exp), atol=1e-4)
    # inconsistent orientation values -> ValueError at execution
    bad = ray.data.from_arrow(pa.table({
        "row": pa.array([0, 1, 1, 2], pa.int64()),
        "col": pa.array([1, 0, 2, 1], pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0, 3.0], pa.float64())}))
    with pytest.raises(Exception, match="different values"):
        eigen_matrix_symmetric(bad, 3, k=1, which="LM", iters=10)


def test_eigen_same_orientation_duplicates_sum(ray_session):
    """COO convention: duplicate entries in the SAME orientation sum."""
    # A = [[0, 2], [2, 0]] supplied as (0,1,1.0) twice -> eigs +-2
    ds = ray.data.from_arrow(pa.table({
        "row": pa.array([0, 0], pa.int64()),
        "col": pa.array([1, 1], pa.int64()),
        "value": pa.array([1.0, 1.0], pa.float64())}))
    vals, _ = eigen_matrix_symmetric(ds, 2, k=2, which="ALL")
    assert np.allclose(sorted(vals), [-2.0, 2.0], atol=1e-9)
