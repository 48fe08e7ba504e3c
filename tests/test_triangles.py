import numpy as np

from igraph_ray import Graph, triangle_counts
from tests import fixtures as fx
from tests.oracles import triangles_ref


def _run(n, src, dst):
    g = Graph.from_numpy(src, dst, n=n)
    ds = triangle_counts(g, num_partitions=4)
    got = {r["vertex"]: r["triangles"] for r in ds.take_all()}
    assert len(got) == n
    return np.array([got[i] for i in range(n)])


def test_karate_exact():
    n, src, dst = fx.karate()
    assert np.array_equal(_run(n, src, dst), triangles_ref(n, src, dst))


def test_cliques():
    n, src, dst = fx.cliques()
    got = _run(n, src, dst)
    ref = triangles_ref(n, src, dst)
    assert np.array_equal(got, ref)
    # every vertex of K_k sits in C(k-1, 2) triangles
    assert got[0] == 6  # K5 member


def test_multiloop_simplify():
    """Loops and duplicate edges must be dropped before counting
    (igraph_i_trans4_al_simplify, triangles.c:399-428)."""
    n, src, dst = fx.multiloop()
    assert np.array_equal(_run(n, src, dst), triangles_ref(n, src, dst))


def test_er():
    n, src, dst = fx.er_digraph(n=120, m=900, seed=21)
    assert np.array_equal(_run(n, src, dst), triangles_ref(n, src, dst))


def test_powerlaw():
    n, src, dst = fx.powerlaw(n=500, m=3000, seed=5)
    assert np.array_equal(_run(n, src, dst), triangles_ref(n, src, dst))
