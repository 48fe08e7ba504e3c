import numpy as np

from igraph_ray import Graph, label_propagation
from tests import fixtures as fx
from tests.oracles import lpa_sync_ref


def _run(n, src, dst, **kw):
    g = Graph.from_numpy(src, dst, n=n)
    res = label_propagation(g, num_partitions=4, **kw)
    got = {r["vertex"]: r["community"] for r in res.state.take_all()}
    assert len(got) == n
    return np.array([got[i] for i in range(n)]), res


def test_cliques_exact_partition():
    n, src, dst = fx.cliques()
    comm, res = _run(n, src, dst)
    ref = lpa_sync_ref(n, src, dst)
    assert np.array_equal(comm, ref)
    # one community per clique
    assert len(np.unique(comm)) == 5


def test_ring_of_cliques():
    n, src, dst = fx.ring_of_cliques()
    comm, res = _run(n, src, dst)
    ref = lpa_sync_ref(n, src, dst)
    assert np.array_equal(comm, ref)


def test_karate_property():
    """Mirror of the reference's own structural assertion (≤ a handful of
    communities on karate — igraph_community_label_propagation.c:57)."""
    n, src, dst = fx.karate()
    comm, _ = _run(n, src, dst, fixed_iterations=8)
    ref = lpa_sync_ref(n, src, dst, fixed=8)
    assert np.array_equal(comm, ref)


def test_isolated_vertices_keep_label():
    n = 10
    src = np.array([0, 1], dtype=np.int64)
    dst = np.array([1, 2], dtype=np.int64)
    comm, _ = _run(n, src, dst)
    ref = lpa_sync_ref(n, src, dst)
    assert np.array_equal(comm, ref)
    assert len(np.unique(comm[3:])) == 7  # isolated vertices stay singleton


def test_dataset_mode_matches_aligned():
    n, src, dst = fx.ring_of_cliques(k=5, num=4)
    ca, _ = _run(n, src, dst, fixed_iterations=3, mode="aligned")
    cd, _ = _run(n, src, dst, fixed_iterations=3, mode="dataset")
    assert np.array_equal(ca, cd)


def test_weighted_lpa():
    """Weighted tally (community.c:2257-2278): weights steer the argmax."""
    n, src, dst = fx.ring_of_cliques(k=5, num=4)
    rng = np.random.default_rng(17)
    w = rng.integers(1, 5, len(src)).astype(float)
    g = Graph.from_numpy(src, dst, weight=w, n=n)
    from igraph_ray import label_propagation as lp
    res = lp(g, num_partitions=4, fixed_iterations=6)
    got = {r["vertex"]: r["community"] for r in res.state.take_all()}
    comm = np.array([got[i] for i in range(n)])
    from tests.oracles import lpa_sync_ref
    ref = lpa_sync_ref(n, src, dst, weight=w, fixed=6)
    assert np.array_equal(comm, ref)
