"""Strong components vs an exact Tarjan oracle (tests/oracles.py scc_ref).
Reference semantics: igraph_clusters_strong, components.c:164-316; labels
canonicalized to the rank-of-min contract on both sides."""

import numpy as np
import pytest

from igraph_ray import Graph, strongly_connected_components
from tests import fixtures as fx
from tests.oracles import scc_ref


def _run(n, src, dst, **kw):
    g = Graph.from_numpy(np.asarray(src), np.asarray(dst), n=n)
    res = strongly_connected_components(g, num_partitions=4, **kw)
    got = {r["vertex"]: r["label"] for r in res.state.take_all()}
    assert len(got) == n
    return np.array([got[i] for i in range(n)]), res


def test_two_cycles_and_bridge():
    # 0->1->2->0 (SCC), 3->4->3 (SCC), bridge 2->3, isolated 5
    src = [0, 1, 2, 2, 3, 4]
    dst = [1, 2, 0, 3, 4, 3]
    lab, res = _run(6, src, dst)
    ref = scc_ref(6, src, dst)
    assert (lab == ref).all()
    assert lab[0] == lab[1] == lab[2]
    assert lab[3] == lab[4] != lab[0]
    assert lab[5] not in (lab[0], lab[3])


def test_dag_all_singletons():
    src = [0, 1, 2, 3]
    dst = [1, 2, 3, 4]
    lab, res = _run(5, src, dst)
    assert len(set(lab.tolist())) == 5
    assert (lab == scc_ref(5, src, dst)).all()


def test_chain_of_sccs_multiround():
    # k two-cycles chained head-to-tail: 0<->1 -> 2<->3 -> 4<->5 ...
    k = 6
    src, dst = [], []
    for i in range(k):
        a, b = 2 * i, 2 * i + 1
        src += [a, b]
        dst += [b, a]
        if i + 1 < k:
            src.append(b)
            dst.append(2 * (i + 1))
    lab, res = _run(2 * k, src, dst)
    ref = scc_ref(2 * k, src, dst)
    assert (lab == ref).all()
    assert len(set(lab.tolist())) == k


def test_self_loops_and_multi_edges():
    src = [0, 0, 1, 1, 1, 2]
    dst = [0, 1, 0, 0, 2, 2]
    lab, res = _run(3, src, dst)
    assert (lab == scc_ref(3, src, dst)).all()


@pytest.mark.parametrize("seed,n,m", [(1, 60, 150), (2, 120, 300), (3, 80, 500)])
def test_random_digraphs(seed, n, m):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    lab, res = _run(n, src, dst)
    assert (lab == scc_ref(n, src, dst)).all()


def test_karate_directed_view():
    n = 34
    e = np.array(fx._KARATE_EDGES)
    lab, res = _run(n, e[:, 0], e[:, 1])  # directed: mostly singletons
    assert (lab == scc_ref(n, e[:, 0].tolist(), e[:, 1].tolist())).all()


def test_sparse_ids():
    ids = np.array([5, 17, 900000, 42])
    src = np.array([5, 17, 900000, 42])
    dst = np.array([17, 5, 42, 900000])
    g = Graph.from_numpy(src, dst)  # n=None sparse universe
    res = strongly_connected_components(g, num_partitions=3)
    rows = {r["vertex"]: r["label"] for r in res.state.take_all()}
    assert len(rows) == 4
    assert rows[5] == rows[17]
    assert rows[42] == rows[900000]
    assert rows[5] != rows[42]
