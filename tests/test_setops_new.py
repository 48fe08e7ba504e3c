"""disjoint_union / complementer / rewire / graph attrs — exact numpy
oracles on fixtures (SURVEY.md §2.4, §2.9; operators.c:38, :1038,
structural_properties.c:1734)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.ops.relational import (
    complementer_edges,
    disjoint_union_edges,
    is_simple,
)
from igraph_ray.ops.rewire import rewire
from tests.fixtures import er_digraph, karate


def _pairs(ds) -> set:
    t = ds.to_pandas()
    return set(zip(t["src"].astype(int), t["dst"].astype(int)))


def _mk(src, dst):
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )


def test_disjoint_union_offsets():
    n1, s1, d1 = karate()
    n2, s2, d2 = er_digraph(n=50, m=200, seed=3)
    out = disjoint_union_edges(_mk(s1, d1), _mk(s2, d2), n_left=n1)
    got = _pairs(out)
    want = set(zip(s1.astype(int), d1.astype(int))) | {
        (int(a) + n1, int(b) + n1) for a, b in zip(s2, d2)
    }
    assert got == want
    assert out.count() == len(s1) + len(s2)


def test_complementer_exact():
    n, s, d = er_digraph(n=60, m=300, seed=5)
    got = _pairs(complementer_edges(_mk(s, d), n=n, num_partitions=4))
    present = set(zip(s.astype(int), d.astype(int)))
    want = {
        (i, j) for i in range(n) for j in range(n)
        if i != j and (i, j) not in present
    }
    assert got == want


def test_complementer_loops_flag():
    s = np.array([0, 1], dtype=np.int64)
    d = np.array([1, 2], dtype=np.int64)
    n = 3
    got = _pairs(complementer_edges(_mk(s, d), n=n, loops=True, num_partitions=2))
    want = {(i, j) for i in range(n) for j in range(n)} - {(0, 1), (1, 2)}
    assert got == want


def test_rewire_preserves_degrees_and_simplicity():
    n, s, d = er_digraph(n=200, m=1200, seed=9)
    # input must be simple for the keep_simple contract
    pairs = sorted(set(zip(s.astype(int), d.astype(int))))
    pairs = [(a, b) for a, b in pairs if a != b]
    s = np.array([p[0] for p in pairs], dtype=np.int64)
    d = np.array([p[1] for p in pairs], dtype=np.int64)
    out = rewire(_mk(s, d), seed=1, num_partitions=4).materialize()
    t = out.to_pandas()
    # exact degree sequences
    np.testing.assert_array_equal(
        np.bincount(t["src"], minlength=n), np.bincount(s, minlength=n)
    )
    np.testing.assert_array_equal(
        np.bincount(t["dst"], minlength=n), np.bincount(d, minlength=n)
    )
    assert is_simple(out)
    # actually rewired: edge sets differ
    got = set(zip(t["src"].astype(int), t["dst"].astype(int)))
    assert got != set(pairs)


def test_rewire_deterministic():
    n, s, d = er_digraph(n=80, m=400, seed=2)
    pairs = sorted({(int(a), int(b)) for a, b in zip(s, d) if a != b})
    s = np.array([p[0] for p in pairs], dtype=np.int64)
    d = np.array([p[1] for p in pairs], dtype=np.int64)
    a = rewire(_mk(s, d), seed=7, num_partitions=3).to_pandas()
    b = rewire(_mk(s, d), seed=7, num_partitions=5).to_pandas()
    key = lambda t: sorted(zip(t["src"].astype(int), t["dst"].astype(int)))
    assert key(a) == key(b)
    c = rewire(_mk(s, d), seed=8, num_partitions=3).to_pandas()
    assert key(a) != key(c)


def test_graph_attrs_save_load(tmp_path):
    n, s, d = karate()
    g = Graph(_mk(s, d), n=n, attrs={"name": "karate", "built_by": "test", "rounds": 3})
    p = str(tmp_path / "g")
    g.save(p)
    g2 = Graph.load(p)
    assert g2.attrs == {"name": "karate", "built_by": "test", "rounds": 3}
    assert g2.num_vertices() == n
    assert g2.num_edges() == len(s)
    assert _pairs(g2.edges) == set(zip(s.astype(int), d.astype(int)))


def test_rewire_dense_uncapped_repair():
    """Dense fixture: the permutation collides at the density rate, so
    the violation count is large — the distributed repair must fix ALL
    of them with no driver-side cap changing semantics (the round-3
    tail_cap is retained in the signature but ignored)."""
    n = 60
    # dense digraph: |E| ≈ 60*59*0.3 ≈ 1060 — the permutation collides
    # on ~30% of rows (166 violations with this seed), far beyond what
    # a per-round cap of 1 could repair in max_rounds
    rng = np.random.RandomState(11)
    s, d = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    s, d = s.ravel(), d.ravel()
    keep = (s != d) & (rng.rand(len(s)) < 0.3)
    s = s[keep].astype(np.int64)
    d = d[keep].astype(np.int64)
    out = rewire(_mk(s, d), seed=3, num_partitions=4,
                 tail_cap=1).materialize()
    t = out.to_pandas()
    np.testing.assert_array_equal(
        np.bincount(t["src"], minlength=n), np.bincount(s, minlength=n))
    np.testing.assert_array_equal(
        np.bincount(t["dst"], minlength=n), np.bincount(d, minlength=n))
    assert is_simple(out)
    # tail_cap is semantics-free: same seed, any cap -> identical output
    t2 = rewire(_mk(s, d), seed=3, num_partitions=4,
                tail_cap=10**9).to_pandas()
    key = lambda x: sorted(zip(x["src"].astype(int), x["dst"].astype(int)))
    assert key(t) == key(t2)


def _eds(edges):
    import pyarrow as pa
    import ray.data

    return ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, b in edges], pa.int64()),
        "dst": pa.array([b for a, b in edges], pa.int64())}))


def test_union_many(ray_session):
    from igraph_ray.ops.relational import union_many_edges

    out = union_many_edges([_eds([(0, 1), (1, 2)]), _eds([(1, 2), (2, 3)]),
                            _eds([(3, 4)])]).to_pandas()
    assert sorted(map(tuple, out.values.tolist())) == [
        (0, 1), (1, 2), (2, 3), (3, 4)]


def test_intersection_many(ray_session):
    from igraph_ray.ops.relational import intersection_many_edges

    out = intersection_many_edges([
        _eds([(0, 1), (1, 2), (2, 3)]),
        _eds([(1, 2), (2, 3), (3, 4)]),
        _eds([(2, 3), (1, 2), (5, 6)])]).to_pandas()
    assert sorted(map(tuple, out.values.tolist())) == [(1, 2), (2, 3)]
    # one input => itself deduped
    one = intersection_many_edges([_eds([(0, 1), (0, 1)])]).to_pandas()
    assert sorted(map(tuple, one.values.tolist())) == [(0, 1)]


def test_disjoint_union_many(ray_session):
    from igraph_ray.ops.relational import disjoint_union_many_edges

    out = disjoint_union_many_edges([
        (_eds([(0, 1)]), 2), (_eds([(0, 1), (1, 2)]), 3),
        (_eds([(0, 0)]), 1)]).to_pandas()
    assert sorted(map(tuple, out.values.tolist())) == [
        (0, 1), (2, 3), (3, 4), (5, 5)]


def test_induced_subgraph_map(ray_session):
    import pyarrow as pa
    import ray.data

    from igraph_ray.ops.relational import induced_subgraph_map

    edges = _eds([(0, 5), (5, 9), (9, 0), (5, 7), (7, 3)])
    verts = ray.data.from_arrow(pa.table({
        "vertex": pa.array([0, 5, 9], pa.int64())}))
    sub, mapping = induced_subgraph_map(edges, verts)
    m = {r["vertex"]: r["new_id"] for r in mapping.take_all()}
    assert m == {0: 0, 5: 1, 9: 2}
    got = sorted(map(tuple, sub.to_pandas().values.tolist()))
    assert got == [(0, 1), (1, 2), (2, 0)]
