import numpy as np

from igraph_ray import Graph, connected_components
from igraph_ray.algorithms.components import component_sizes
from tests import fixtures as fx
from tests.oracles import components_ref


def _run(n, src, dst, **kw):
    g = Graph.from_numpy(src, dst, n=n)
    res = connected_components(g, num_partitions=4, **kw)
    got = {r["vertex"]: r["label"] for r in res.state.take_all()}
    assert len(got) == n
    return np.array([got[i] for i in range(n)]), res


def test_forest_label_contract():
    n, src, dst = fx.forest()
    labels, res = _run(n, src, dst)
    ref = components_ref(n, src, dst)
    assert np.array_equal(labels, ref)  # exact, incl. rank-of-min contract
    assert res.converged


def test_karate_single_component():
    n, src, dst = fx.karate()
    labels, _ = _run(n, src, dst)
    assert np.array_equal(labels, np.zeros(n, dtype=np.int64))


def test_component_sizes():
    n, src, dst = fx.forest()
    g = Graph.from_numpy(src, dst, n=n)
    res = connected_components(g, num_partitions=4)
    ref = components_ref(n, src, dst)
    sizes = {r["label"]: r["csize"] for r in component_sizes(res.state).take_all()}
    ref_sizes = dict(zip(*np.unique(ref, return_counts=True)))
    assert sizes == {int(k): int(v) for k, v in ref_sizes.items()}


def test_multiloop():
    n, src, dst = fx.multiloop()
    labels, _ = _run(n, src, dst)
    assert np.array_equal(labels, components_ref(n, src, dst))


def test_dataset_mode_matches_aligned():
    n, src, dst = fx.forest(seed=13)
    la, _ = _run(n, src, dst, mode="aligned")
    ld, _ = _run(n, src, dst, mode="dataset")
    assert np.array_equal(la, ld)
