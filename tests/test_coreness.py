"""Coreness (h-operator fixpoint) vs an exact peeling oracle
(cores.c:31 semantics on the symmetrized view)."""

import numpy as np
import pytest

from igraph_ray import Graph
from igraph_ray.algorithms.kcore import coreness
from tests import fixtures as fx
from tests.oracles import coreness_ref


def _run(n, src, dst, **kw):
    g = Graph.from_numpy(np.asarray(src), np.asarray(dst), n=n)
    res = coreness(g, num_partitions=4, **kw)
    got = {r["vertex"]: r["coreness"] for r in res.state.take_all()}
    assert len(got) == n
    return np.array([got[i] for i in range(n)])


def test_clique_plus_tail():
    # K4 on 0-3, tail 3-4-5, isolated 6
    src = [0, 0, 0, 1, 1, 2, 3, 4]
    dst = [1, 2, 3, 2, 3, 3, 4, 5]
    got = _run(7, src, dst)
    ref = coreness_ref(7, src, dst)
    assert (got == ref).all()
    assert got[0] == 3 and got[4] == 1 and got[6] == 0


def test_karate():
    e = np.array(fx._KARATE_EDGES)
    got = _run(34, e[:, 0], e[:, 1])
    assert (got == coreness_ref(34, e[:, 0], e[:, 1])).all()


@pytest.mark.parametrize("seed,n,m", [(4, 60, 200), (5, 150, 700)])
def test_random(seed, n, m):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    got = _run(n, src, dst)
    assert (got == coreness_ref(n, src, dst)).all()


def test_sparse_ids():
    src = np.array([10, 10, 900, 900000])
    dst = np.array([900, 900000, 900000, 10])
    g = Graph.from_numpy(src, dst)
    res = coreness(g, num_partitions=3)
    rows = {r["vertex"]: r["coreness"] for r in res.state.take_all()}
    assert rows == {10: 2, 900: 2, 900000: 2}
