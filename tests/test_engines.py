"""Cross-engine equality: the task loop (aligned.py), the SPMD actor loop
(spmd.py) and the compiled-graph loop (cgraph.py) execute the same logical
superstep plan and must produce bit-identical results — including on the
awkward universes (sparse non-dense vertex ids, loops, multi-edges)."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from igraph_ray import Graph, connected_components, label_propagation, pagerank

ENGINES = ["spmd", "cgraph"]


def _sparse_graph():
    rng = np.random.default_rng(3)
    ids = np.array([5, 17, 1_000_000, 42, 99, 7, 123_456])
    src = rng.choice(ids[:-1], 400)
    dst = rng.choice(ids, 400)
    return Graph(
        ray.data.from_arrow(
            pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
        )
    )


def _dense_graph():
    rng = np.random.default_rng(11)
    src = rng.integers(0, 300, 2500)
    dst = rng.integers(0, 300, 2500)
    return Graph.from_numpy(src, dst, n=300)


@pytest.mark.parametrize("engine", ENGINES)
def test_pagerank_engine_bit_equality(engine):
    g = _dense_graph()
    base = pagerank(g, fixed_iterations=12, num_partitions=4, engine="tasks")
    other = pagerank(g, fixed_iterations=12, num_partitions=4, engine=engine)
    pb = base.state.to_pandas().sort_values("vertex").reset_index(drop=True)
    po = other.state.to_pandas().sort_values("vertex").reset_index(drop=True)
    assert (pb["vertex"].values == po["vertex"].values).all()
    assert np.abs(pb["pr"].values - po["pr"].values).max() == 0.0


@pytest.mark.parametrize("engine", ENGINES)
def test_pagerank_convergence_mode_equality(engine):
    g = _dense_graph()
    base = pagerank(g, tol=1e-10, max_iter=100, num_partitions=4, engine="tasks")
    other = pagerank(g, tol=1e-10, max_iter=100, num_partitions=4, engine=engine)
    assert base.iterations == other.iterations
    assert base.converged and other.converged
    pb = base.state.to_pandas().sort_values("vertex").reset_index(drop=True)
    po = other.state.to_pandas().sort_values("vertex").reset_index(drop=True)
    assert np.abs(pb["pr"].values - po["pr"].values).max() == 0.0


def test_sparse_ids_not_treated_dense():
    """Regression: num_vertices() caches the distinct count into _n; the
    dense-universe branch must key on the user-declared n, not on that
    cache — otherwise sparse ids >= count corrupt the state ranges."""
    g = _sparse_graph()
    assert g.num_vertices() == 7  # distinct endpoints
    res = {}
    for eng in ["tasks"] + ENGINES:
        r = pagerank(g, fixed_iterations=8, num_partitions=3, engine=eng)
        res[eng] = r.state.to_pandas().sort_values("vertex").reset_index(drop=True)
        assert len(res[eng]) == 7
        assert res[eng]["pr"].sum() == pytest.approx(1.0, abs=1e-9)
    ref = pagerank(g, fixed_iterations=8, num_partitions=3, mode="dataset")
    pr_ref = ref.state.to_pandas().sort_values("vertex").reset_index(drop=True)
    for eng, df in res.items():
        assert (df["vertex"].values == pr_ref["vertex"].values).all()
        assert np.allclose(df["pr"].values, pr_ref["pr"].values, atol=1e-12), eng


@pytest.mark.parametrize("engine", ENGINES)
def test_components_engine_equality(engine):
    g = _dense_graph()
    base = connected_components(g, num_partitions=4, engine="tasks")
    other = connected_components(g, num_partitions=4, engine=engine)
    cb = base.state.to_pandas().sort_values("vertex").reset_index(drop=True)
    co = other.state.to_pandas().sort_values("vertex").reset_index(drop=True)
    assert (cb.values == co.values).all()


@pytest.mark.parametrize("engine", ENGINES)
def test_lpa_engine_equality(engine):
    g = _dense_graph()
    base = label_propagation(g, num_partitions=4, max_iter=8, engine="tasks")
    other = label_propagation(g, num_partitions=4, max_iter=8, engine=engine)
    cb = base.state.to_pandas().sort_values("vertex").reset_index(drop=True)
    co = other.state.to_pandas().sort_values("vertex").reset_index(drop=True)
    assert (cb.values == co.values).all()
