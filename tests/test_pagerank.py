import numpy as np
import pytest

from igraph_ray import Graph, pagerank
from tests import fixtures as fx
from tests.oracles import pagerank_ref


def _run(n, src, dst, weight=None, **kw):
    g = Graph.from_numpy(src, dst, weight=weight, n=n)
    res = pagerank(g, num_partitions=4, **kw)
    got = {r["vertex"]: r["pr"] for r in res.state.take_all()}
    assert len(got) == n
    return np.array([got[i] for i in range(n)]), res


def test_iprcom4_reference_example():
    n, src, dst = fx.IPRCOM4
    pr, res = _run(n, src, dst, tol=1e-13, max_iter=500)
    ref = pagerank_ref(n, src, dst, fixed=res.iterations)
    assert np.allclose(pr, ref, atol=1e-9)
    # golden from the reference example output (~0.37, 0.20, 0.39, 0.04)
    assert np.allclose(pr, [0.372526, 0.195821, 0.394154, 0.0375], atol=1e-2)
    assert pr.sum() == pytest.approx(1.0, abs=1e-12)


def test_star_hub_and_dangling():
    n, src, dst = fx.STAR8_IN
    pr, res = _run(n, src, dst, tol=1e-12)
    ref = pagerank_ref(n, src, dst, fixed=res.iterations)
    assert np.allclose(pr, ref, atol=1e-10)
    assert pr[0] == max(pr)  # hub dominates

    n, src, dst = fx.STAR8_OUT
    pr, res = _run(n, src, dst, tol=1e-12)
    ref = pagerank_ref(n, src, dst, fixed=res.iterations)
    assert np.allclose(pr, ref, atol=1e-10)


def test_er_dangling_semantics():
    n, src, dst = fx.er_digraph()
    pr, res = _run(n, src, dst, tol=1e-12, max_iter=300)
    assert res.converged
    assert res.scalars["absdiff"] < 1e-8  # BASELINE gate: L1 residual < 1e-8
    ref = pagerank_ref(n, src, dst, fixed=res.iterations)
    assert np.allclose(pr, ref, atol=1e-10)


def test_multiloop_loop_rule():
    """Self-loops excluded from degree and messages; multi-edges counted."""
    n, src, dst = fx.multiloop()
    pr, res = _run(n, src, dst, tol=1e-13)
    ref = pagerank_ref(n, src, dst, fixed=res.iterations)
    assert np.allclose(pr, ref, atol=1e-10)


def test_weighted_with_negative_clamp():
    n, src, dst = fx.er_digraph(n=100, m=600, seed=3)
    rng = np.random.default_rng(5)
    w = rng.uniform(-0.5, 3.0, len(src))
    pr, res = _run(n, src, dst, weight=w, tol=1e-12)
    ref = pagerank_ref(n, src, dst, weight=w, fixed=res.iterations)
    assert np.allclose(pr, ref, atol=1e-10)


def test_powerlaw_hub_skew():
    n, src, dst = fx.powerlaw(n=1000, m=5000)
    pr, res = _run(n, src, dst, tol=1e-11, max_iter=200)
    ref = pagerank_ref(n, src, dst, fixed=res.iterations)
    assert np.allclose(pr, ref, atol=1e-9)


def test_empty_graph_uniform():
    n = 5
    g = Graph.from_numpy(np.array([], dtype=np.int64), np.array([], dtype=np.int64), n=n)
    res = pagerank(g, num_partitions=2, max_iter=10)
    got = {r["vertex"]: r["pr"] for r in res.state.take_all()}
    assert np.allclose([got[i] for i in range(n)], 0.2, atol=1e-12)


def test_dataset_mode_matches_aligned():
    """Cross-implementation consistency (the reference's own test style:
    ARPACK vs PRPACK interleaved — igraph_pagerank.c:100-120)."""
    n, src, dst = fx.er_digraph(n=80, m=400, seed=9)
    pr_a, _ = _run(n, src, dst, fixed_iterations=4, mode="aligned")
    pr_d, _ = _run(n, src, dst, fixed_iterations=4, mode="dataset")
    assert np.allclose(pr_a, pr_d, atol=1e-14)


def test_personalized_reset_vector():
    """igraph personalized pagerank semantics: new = d*msg + sumfrom*reset
    (centrality.c:926-970)."""
    n, src, dst = fx.er_digraph(n=150, m=900, seed=33)
    rng = np.random.default_rng(7)
    reset = rng.random(n)

    g = Graph.from_numpy(src, dst, n=n)
    res = pagerank(g, num_partitions=4, tol=1e-13, max_iter=400, reset=reset)
    got = {r["vertex"]: r["pr"] for r in res.state.take_all()}
    gv = np.array([got[i] for i in range(n)])

    # independent oracle
    r = reset / reset.sum()
    nl = src != dst
    s, t = src[nl], dst[nl]
    deg = np.zeros(n)
    np.add.at(deg, s, 1.0)
    pr = np.full(n, 1.0 / n)
    for _ in range(res.iterations):
        D = pr[deg == 0].sum()
        base_total = (1 - 0.85) + 0.85 * D
        msg = np.zeros(n)
        np.add.at(msg, t, pr[s] / np.where(deg[s] > 0, deg[s], 1.0))
        pr = base_total * r + 0.85 * msg
    pr = pr / pr.sum()
    assert np.allclose(gv, pr, atol=1e-10)


def test_uniform_reset_equals_default():
    n, src, dst = fx.er_digraph(n=80, m=400, seed=9)
    a, _ = _run(n, src, dst, fixed_iterations=6)
    g = Graph.from_numpy(src, dst, n=n)
    res = pagerank(g, num_partitions=4, fixed_iterations=6, reset=np.ones(n))
    got = {r["vertex"]: r["pr"] for r in res.state.take_all()}
    b = np.array([got[i] for i in range(n)])
    assert np.allclose(a, b, atol=1e-15)


def test_personalized_dataset_mode_matches_aligned():
    """Personalization in the didactic dataset mode must agree with the
    aligned kernel (mode symmetry — the round-2 pagerank.py:110 guard)."""
    n, src, dst = fx.er_digraph(n=80, m=400, seed=9)
    rng = np.random.default_rng(3)
    reset = rng.random(n)
    g = Graph.from_numpy(src, dst, n=n)
    ra = pagerank(g, num_partitions=4, fixed_iterations=5, reset=reset,
                  mode="aligned")
    rd = pagerank(g, num_partitions=4, fixed_iterations=5, reset=reset,
                  mode="dataset")
    ga = {r["vertex"]: r["pr"] for r in ra.state.take_all()}
    gd = {r["vertex"]: r["pr"] for r in rd.state.take_all()}
    a = np.array([ga[i] for i in range(n)])
    b = np.array([gd[i] for i in range(n)])
    assert np.allclose(a, b, atol=1e-14)
