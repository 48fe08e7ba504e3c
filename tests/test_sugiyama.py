"""Sugiyama layered layout invariants (sugiyama.c:91 semantics)."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.ops.layout import layout_sugiyama


def _graph(edges):
    return Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64())})))


def _rand_edges(n, m, seed):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    keep = src != dst
    return sorted(set(zip(src[keep].tolist(), dst[keep].tolist())))


DAG = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (1, 4), (2, 5), (5, 4)]


def test_dag_layers_strictly_increase(ray_session):
    got = layout_sugiyama(_graph(DAG), sweeps=2).to_pandas()
    y = dict(zip(got.vertex, got.y))
    for a, b in DAG:
        assert y[b] > y[a], (a, b, y)


def test_slots_unique_within_layer(ray_session):
    edges = _rand_edges(40, 100, 3)
    got = layout_sugiyama(_graph(edges), sweeps=3).to_pandas()
    for _, grp in got.groupby("y"):
        xs = sorted(grp["x"].tolist())
        assert xs == list(np.arange(len(xs), dtype=float)), xs


def test_cyclic_input_handled(ray_session):
    # a 3-cycle plus a tail: FAS reversal must yield a valid layering
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    got = layout_sugiyama(_graph(edges), sweeps=2).to_pandas()
    assert len(got) == 5
    assert got["y"].nunique() >= 3


def test_deterministic_across_partitioning(ray_session):
    edges = _rand_edges(30, 70, 9)
    g1 = _graph(edges)
    g2 = Graph(g1.edges.repartition(6))
    a = layout_sugiyama(g1, sweeps=2).to_pandas().sort_values(
        "vertex").reset_index(drop=True)
    b = layout_sugiyama(g2, sweeps=2).to_pandas().sort_values(
        "vertex").reset_index(drop=True)
    assert a.values.tolist() == b.values.tolist()
