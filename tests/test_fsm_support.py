"""FSM support measures (fsm.c shallow/mib/egobased) + velist format."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import ray.data


def _db(rows):
    g, s, d = zip(*rows)
    return ray.data.from_arrow(pa.table({
        "gid": pa.array(list(g), pa.int64()),
        "src": pa.array(list(s), pa.int64()),
        "dst": pa.array(list(d), pa.int64())}))


def _brute_support(edges, p_edges, n_p, ego):
    """All injective maps over the symmetrized simple view."""
    und = set()
    verts = set()
    for s, d in edges:
        if s != d:
            und.add((s, d))
            und.add((d, s))
            verts.update((s, d))
    images = [set() for _ in range(n_p)]
    any_emb = False
    for m in itertools.permutations(verts, n_p):
        if all((m[a], m[b]) in und for a, b in p_edges):
            any_emb = True
            for i in range(n_p):
                images[i].add(m[i])
    if not any_emb:
        return 0, 0, 0
    return 1, min(len(x) for x in images), len(images[ego])


def test_pattern_support_matches_bruteforce(ray_session):
    from igraph_ray.ops.fsm_support import (aggregated_db_support,
                                            pattern_support)

    # 3 transactions: a triangle+tail, a star, a single edge
    rows = [(0, 0, 1), (0, 1, 2), (0, 2, 0), (0, 2, 3),
            (1, 0, 1), (1, 0, 2), (1, 0, 3),
            (2, 4, 5)]
    wedge = [(0, 1), (1, 2)]
    got = pattern_support(_db(rows), [0, 1], [1, 2], directed=False,
                          stride=64, ego_vertex=1, num_partitions=4) \
        .to_pandas().set_index("gid").sort_index()
    for g in (0, 1, 2):
        edges = [(s, d) for gg, s, d in rows if gg == g]
        sh, mib, ego = _brute_support(edges, wedge, 3, 1)
        assert got.loc[g, "shallow"] == sh, g
        assert got.loc[g, "mib"] == mib, g
        assert got.loc[g, "ego"] == ego, g
    # aggregated = per-graph sums (fsm.c:988)
    tbl = pattern_support(_db(rows), [0, 1], [1, 2], stride=64,
                          ego_vertex=1, num_partitions=4)
    assert aggregated_db_support(tbl, "shallow") == \
        int(got["shallow"].sum())
    assert aggregated_db_support(tbl.materialize(), "mib") == \
        int(got["mib"].sum())


def test_pattern_support_triangle_pattern(ray_session):
    from igraph_ray.ops.fsm_support import pattern_support

    rows = [(0, 0, 1), (0, 1, 2), (0, 2, 0), (0, 2, 3),
            (1, 0, 1), (1, 0, 2), (1, 0, 3)]
    tri = [(0, 1), (1, 2), (2, 0)]
    got = pattern_support(_db(rows), [0, 1, 2], [1, 2, 0],
                          directed=False, stride=64, ego_vertex=0,
                          num_partitions=4) \
        .to_pandas().set_index("gid").sort_index()
    for g in (0, 1):
        edges = [(s, d) for gg, s, d in rows if gg == g]
        sh, mib, ego = _brute_support(edges, tri, 3, 0)
        assert (got.loc[g, "shallow"], got.loc[g, "mib"],
                got.loc[g, "ego"]) == (sh, mib, ego), g


def test_velist_round_trip(ray_session, tmp_path):
    from igraph_ray.sources.velist import read_velist, write_velist

    edges = ray.data.from_arrow(pa.table({
        "gid": pa.array([0, 0, 1, 2, 2], pa.int64()),
        "src": pa.array([0, 1, 0, 0, 1], pa.int64()),
        "dst": pa.array([1, 2, 1, 2, 2], pa.int64()),
        "ecolor": pa.array([5, 6, 7, 8, 9], pa.int64()),
        "etime": pa.array([10, 11, 12, 13, 14], pa.int64())}))
    verts = ray.data.from_arrow(pa.table({
        "gid": pa.array([0, 0, 0, 1, 1, 2, 2, 2], pa.int64()),
        "vertex": pa.array([0, 1, 2, 0, 1, 0, 1, 2], pa.int64()),
        "vcolor": pa.array([3, 4, 3, 1, 1, 2, 2, 2], pa.int64())}))
    hdrs = ray.data.from_arrow(pa.table({
        "gid": pa.array([0, 1, 2], pa.int64()),
        "tid": pa.array([100, 200, 300], pa.int64()),
        "supp": pa.array([7, -1, 9], pa.int64())}))
    p = str(tmp_path / "t.velist")
    write_velist(edges, verts, p, headers=hdrs)
    re, rv, rh = read_velist(p, has_vcolors=True, has_ecolors=True,
                             has_etimes=True)
    ep = re.to_pandas().sort_values(["gid", "src", "dst"]).reset_index(
        drop=True)
    assert ep.equals(edges.to_pandas().sort_values(
        ["gid", "src", "dst"]).reset_index(drop=True))
    vp = rv.to_pandas().sort_values(["gid", "vertex"]).reset_index(
        drop=True)
    assert vp.equals(verts.to_pandas().sort_values(
        ["gid", "vertex"]).reset_index(drop=True))
    hp = rh.to_pandas().sort_values("gid").reset_index(drop=True)
    assert list(hp["tid"]) == [100, 200, 300]
    assert list(hp["supp"]) == [7, -1, 9]


def test_isomorphic_34_and_isoclass3():
    from igraph_ray.algorithms.subiso import (graph_isoclass3_directed,
                                              isomorphic_34)
    import itertools

    # permutations of the same graph are isomorphic
    p4 = [(0, 1), (1, 2), (2, 3)]
    for perm in itertools.permutations(range(4)):
        q = [(perm[a], perm[b]) for a, b in p4]
        assert isomorphic_34(p4, 4, q, 4)
    # star3 vs path4: same edge count, different shape
    assert not isomorphic_34(p4, 4, [(0, 1), (0, 2), (0, 3)], 4)
    # directed: 0->1->2 vs 0->1, 2->1 differ; reversal is isomorphic
    assert not isomorphic_34([(0, 1), (1, 2)], 3,
                             [(0, 1), (2, 1)], 3, directed=True)
    assert isomorphic_34([(0, 1), (1, 2)], 3,
                         [(2, 1), (1, 0)], 3, directed=True)
    # isoclass numbering matches the motifs3 tables: the directed
    # 16-class census partitions all 64 codes; permuted copies agree
    for edges in ([(0, 1)], [(0, 1), (1, 0)], [(0, 1), (1, 2)],
                  [(0, 1), (1, 2), (2, 0)]):
        base = graph_isoclass3_directed(edges)
        for perm in itertools.permutations(range(3)):
            q = [(perm[a], perm[b]) for a, b in edges]
            assert graph_isoclass3_directed(q) == base


def test_is_subisomorphism():
    from igraph_ray.algorithms.subiso import is_subisomorphism

    target = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    # P3 pattern 0-1-2 embeds as 3-0-1 (undirected)
    assert is_subisomorphism([3, 0, 1], target, [(0, 1), (1, 2)])
    # non-injective map rejected
    assert not is_subisomorphism([0, 1, 0], target, [(0, 1), (1, 2)])
    # missing edge rejected
    assert not is_subisomorphism([1, 3, 0], target, [(0, 1), (1, 2)])
    # induced: triangle 0-1-2 in target has chord (0,2); mapping the
    # PATH 0-1-2 onto vertices {0,1,2} is non-induced
    assert is_subisomorphism([0, 1, 2], target, [(0, 1), (1, 2)])
    assert not is_subisomorphism([0, 1, 2], target, [(0, 1), (1, 2)],
                                 induced=True)
    # directed respects orientation
    assert is_subisomorphism([0, 1], [(0, 1)], [(0, 1)], directed=True)
    assert not is_subisomorphism([1, 0], [(0, 1)], [(0, 1)],
                                 directed=True)
    # vertex colors must match
    assert not is_subisomorphism(
        [0, 1], [(0, 1)], [(0, 1)],
        vcolor_target=[5, 6], vcolor_pattern=[6, 6])


def test_isoclass3_create_roundtrip():
    from igraph_ray.algorithms.subiso import (graph_isoclass3_directed,
                                              isoclass3_create,
                                              isoclass3_subgraph)

    for cls in range(16):
        edges = isoclass3_create(cls)
        assert graph_isoclass3_directed(edges) == cls
    # induced-subgraph classification on a labeled host graph
    host = [(10, 11), (11, 12), (12, 10), (10, 13)]
    assert isoclass3_subgraph(host, (10, 11, 12)) == \
        graph_isoclass3_directed([(0, 1), (1, 2), (2, 0)])
    assert isoclass3_subgraph(host, (11, 12, 13)) == \
        graph_isoclass3_directed([(0, 1)])
