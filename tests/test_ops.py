import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.ops import relational as rel
from igraph_ray.algorithms.modularity import modularity
from tests import fixtures as fx
from tests.oracles import modularity_ref


def _eds(src, dst):
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )


def _pairs(ds):
    return sorted((r["src"], r["dst"]) for r in ds.take_all())


def test_simplify():
    n, src, dst = fx.multiloop()
    out = _pairs(rel.simplify(_eds(src, dst)))
    want = sorted({(int(a), int(b)) for a, b in zip(src, dst) if a != b})
    assert out == want


def test_set_operations():
    a = _eds([0, 1, 2, 2], [1, 2, 3, 3])
    b = _eds([1, 2, 9], [2, 3, 9])
    assert _pairs(rel.union_edges(a, b)) == [(0, 1), (1, 2), (2, 3), (9, 9)]
    assert _pairs(rel.intersection_edges(a, b)) == [(1, 2), (2, 3)]
    assert _pairs(rel.difference_edges(a, b)) == [(0, 1)]


def test_compose():
    a = _eds([0, 1], [1, 2])
    b = _eds([1, 2], [5, 6])
    assert _pairs(rel.compose_edges(a, b)) == [(0, 5), (1, 6)]


def test_predicates():
    e = _eds([0, 0, 1, 2], [0, 1, 0, 3])
    assert rel.count_loops(e) == 1
    assert not rel.is_simple(e)
    assert rel.is_simple(_eds([0, 1], [1, 2]))
    mult = {(r["src"], r["dst"]): r["multiplicity"] for r in rel.count_multiple(
        _eds([0, 0, 1], [1, 1, 2])).take_all()}
    assert mult == {(0, 1): 2, (1, 2): 1}


def test_reciprocity_and_mutual():
    e = _eds([0, 1, 1, 2], [1, 0, 2, 3])
    # distinct non-loop edges: (0,1),(1,0),(1,2),(2,3); mutual: (0,1),(1,0)
    assert rel.reciprocity(e) == 0.5
    assert _pairs(rel.mutual_edges(e)) == [(0, 1), (1, 0)]


def test_density():
    e = _eds([0, 1], [1, 2])
    assert rel.density(e, n=3, directed=True) == 2 / 6


def test_subgraph_and_contract():
    e = _eds([0, 1, 2, 3], [1, 2, 3, 0])
    vs = ray.data.from_arrow(pa.table({"vertex": pa.array([0, 1, 2], pa.int64())}))
    assert _pairs(rel.induced_subgraph(e, vs)) == [(0, 1), (1, 2)]
    mapping = ray.data.from_arrow(
        pa.table({"vertex": pa.array([0, 1, 2, 3], pa.int64()),
                  "target": pa.array([0, 0, 1, 1], pa.int64())})
    )
    assert _pairs(rel.contract_vertices(e, mapping)) == [(0, 0), (0, 1), (1, 0), (1, 1)]


def test_to_undirected_collapse():
    e = _eds([1, 2, 3, 3], [2, 1, 3, 1])
    assert _pairs(rel.to_undirected_collapse(e)) == [(1, 2), (1, 3), (3, 3)]


def test_modularity_matches_oracle():
    n, src, dst = fx.ring_of_cliques()
    membership = np.array([v // 6 for v in range(n)])  # true clique blocks
    mds = ray.data.from_arrow(
        pa.table({"vertex": pa.array(np.arange(n), pa.int64()),
                  "community": pa.array(membership, pa.int64())})
    )
    q = modularity(_eds(src, dst), mds)
    ref = modularity_ref(n, src, dst, membership)
    assert abs(q - ref) < 1e-9
    assert q > 0.5  # strong community structure
