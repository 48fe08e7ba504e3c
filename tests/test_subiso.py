"""Subgraph isomorphism counting vs in-test brute force (VF2 semantics:
injective maps, non-induced, topology.c contract)."""

from itertools import permutations

import numpy as np
import pytest

from igraph_ray.algorithms.subiso import (
    count_sub_isomorphisms,
    isomorphic_small,
)
from igraph_ray.graph import Graph


def _brute_count(n, tedges, pedges, p, directed):
    tset = set()
    for a, b in tedges:
        if a == b:
            continue
        tset.add((a, b) if directed else (min(a, b), max(a, b)))

    def has(u, v):
        return ((u, v) in tset) if directed else \
            ((min(u, v), max(u, v)) in tset)

    cnt = 0
    for m in permutations(range(n), p):
        if all(has(m[a], m[b]) for a, b in pedges):
            cnt += 1
    return cnt


def _g(n, edges):
    return Graph.from_numpy(np.array([e[0] for e in edges], np.int64),
                            np.array([e[1] for e in edges], np.int64), n=n)


PATTERNS = {
    "edge": [(0, 1)],
    "path3": [(0, 1), (1, 2)],
    "triangle": [(0, 1), (1, 2), (2, 0)],
    "path4": [(0, 1), (1, 2), (2, 3)],
    "cycle4": [(0, 1), (1, 2), (2, 3), (3, 0)],
    "claw": [(0, 1), (0, 2), (0, 3)],
    # arbitrary 5-vertex patterns (general-pattern surface): a branching
    # spider tree and the house graph (C4 + apex — exercises residual
    # non-spanning pattern edges, i.e. the semi-join checks)
    "tree5": [(0, 1), (1, 2), (1, 3), (3, 4)],
    "house": [(0, 1), (1, 2), (2, 3), (3, 0), (0, 4), (1, 4)],
}


@pytest.mark.parametrize("pname", sorted(PATTERNS))
def test_undirected_counts_match_brute(pname):
    rng = np.random.default_rng(8)
    n = 9
    tedges = sorted({(int(a), int(b)) for a, b in
                     rng.integers(0, n, (20, 2)) if a != b})
    pedges = PATTERNS[pname]
    p = max(max(e) for e in pedges) + 1
    got = count_sub_isomorphisms(
        _g(n, tedges),
        [e[0] for e in pedges], [e[1] for e in pedges],
        directed=False, num_partitions=2)
    want = _brute_count(n, tedges, pedges, p, directed=False)
    assert got == want, (pname, got, want)


@pytest.mark.parametrize("pedges", [
    [(0, 1), (1, 2)],                     # directed path
    [(0, 1), (1, 2), (2, 0)],             # directed 3-cycle
    [(0, 1), (1, 0)],                     # mutual dyad
])
def test_directed_counts_match_brute(pedges):
    rng = np.random.default_rng(3)
    n = 8
    tedges = sorted({(int(a), int(b)) for a, b in
                     rng.integers(0, n, (22, 2)) if a != b})
    p = max(max(e) for e in pedges) + 1
    got = count_sub_isomorphisms(
        _g(n, tedges),
        [e[0] for e in pedges], [e[1] for e in pedges],
        directed=True, num_partitions=2)
    want = _brute_count(n, tedges, pedges, p, directed=True)
    assert got == want


def test_triangle_consistency_with_census():
    """#triangle subisomorphisms = 6 x triangle count (3! maps each)."""
    from igraph_ray.algorithms.triangles import triangle_counts

    rng = np.random.default_rng(5)
    n = 40
    tedges = sorted({(int(a), int(b)) for a, b in
                     rng.integers(0, n, (200, 2)) if a != b})
    g = _g(n, tedges)
    subs = count_sub_isomorphisms(g, [0, 1, 2], [1, 2, 0],
                                  directed=False, num_partitions=2)
    tri_total = sum(r["triangles"] for r in
                    triangle_counts(g, num_partitions=2).take_all()) // 3
    assert subs == 6 * tri_total


def test_isomorphic_small():
    # C4 vs C4 relabeled: isomorphic; C4 vs path4: not
    assert isomorphic_small([0, 1, 2, 3], [1, 2, 3, 0], 4,
                            [2, 0, 3, 1], [0, 3, 1, 2], 4)
    assert not isomorphic_small([0, 1, 2, 3], [1, 2, 3, 0], 4,
                                [0, 1, 2], [1, 2, 3], 4)
    with pytest.raises(NotImplementedError):
        isomorphic_small(list(range(9)), list(range(1, 10)), 10,
                         list(range(9)), list(range(1, 10)), 10)


# ------------------------------------------------------------- VF2 -----

def _perm_graph(src, dst, n, seed):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n).astype(np.int64)
    return perm[src], perm[dst], perm


def test_vf2_isomorphic_positive(ray_session):
    from igraph_ray.algorithms.subiso import isomorphic_vf2

    rng = np.random.default_rng(11)
    n, m = 200, 600
    # simple random graph (dedup pairs, no loops)
    s = rng.integers(0, n, 2 * m)
    d = rng.integers(0, n, 2 * m)
    keep = s != d
    pairs = sorted({(min(a, b), max(a, b)) for a, b in
                    zip(s[keep].tolist(), d[keep].tolist())})[:m]
    src = np.array([p[0] for p in pairs], np.int64)
    dst = np.array([p[1] for p in pairs], np.int64)
    ps, pd, perm = _perm_graph(src, dst, n, 5)
    iso, mapping = isomorphic_vf2(src, dst, n, ps, pd, n, directed=False)
    assert iso
    # verify mapping maps every edge onto an edge
    e2 = {(min(a, b), max(a, b)) for a, b in zip(ps.tolist(), pd.tolist())}
    for a, b in pairs:
        ma, mb = int(mapping[a]), int(mapping[b])
        assert (min(ma, mb), max(ma, mb)) in e2


def test_vf2_isomorphic_negative(ray_session):
    from igraph_ray.algorithms.subiso import isomorphic_vf2

    # same degree sequence, different structure: C6 vs 2x C3
    c6s = np.array([0, 1, 2, 3, 4, 5], np.int64)
    c6d = np.array([1, 2, 3, 4, 5, 0], np.int64)
    c33s = np.array([0, 1, 2, 3, 4, 5], np.int64)
    c33d = np.array([1, 2, 0, 4, 5, 3], np.int64)
    iso, _ = isomorphic_vf2(c6s, c6d, 6, c33s, c33d, 6, directed=False)
    assert not iso


def test_vf2_directed(ray_session):
    from igraph_ray.algorithms.subiso import isomorphic_vf2

    # directed path 0->1->2 vs reversed labels; and vs out-star
    ps = np.array([0, 1], np.int64)
    pd_ = np.array([1, 2], np.int64)
    qs = np.array([2, 1], np.int64)
    qd = np.array([1, 0], np.int64)
    iso, mp = isomorphic_vf2(ps, pd_, 3, qs, qd, 3, directed=True)
    assert iso and mp[0] == 2 and mp[2] == 0
    star_s = np.array([0, 0], np.int64)
    star_d = np.array([1, 2], np.int64)
    iso2, _ = isomorphic_vf2(ps, pd_, 3, star_s, star_d, 3, directed=True)
    assert not iso2


def test_vf2_regular_graphs(ray_session):
    from igraph_ray.algorithms.subiso import isomorphic_vf2

    # WL-hard case: circulant (3-regular) graph vs its permutation —
    # refinement gives one color class, VF2 search must still succeed
    n = 24
    src = np.concatenate([np.arange(n), np.arange(n)]).astype(np.int64)
    dst = np.concatenate([(np.arange(n) + 1) % n,
                          (np.arange(n) + 5) % n]).astype(np.int64)
    ps, pd_, _ = _perm_graph(src, dst, n, 9)
    iso, _ = isomorphic_vf2(src, dst, n, ps, pd_, n, directed=False)
    assert iso
    # Petersen (3-regular, girth 5) vs K3,3 plus... simpler: vs circulant C24(1,2)
    dst2 = np.concatenate([(np.arange(n) + 1) % n,
                           (np.arange(n) + 2) % n]).astype(np.int64)
    iso2, _ = isomorphic_vf2(src, dst, n, src, dst2, n, directed=False)
    assert not iso2


def test_isomorphic_graph_surface(ray_session):
    import pyarrow as pa
    import ray.data

    from igraph_ray.algorithms.subiso import isomorphic
    from igraph_ray.graph import Graph

    src = np.array([0, 1, 2, 3, 3], np.int64)
    dst = np.array([1, 2, 3, 0, 1], np.int64)
    g1 = Graph(ray.data.from_arrow(pa.table({"src": src, "dst": dst})),
               n=4, attrs={"directed": True})
    ps, pd_, _ = _perm_graph(src, dst, 4, 3)
    g2 = Graph(ray.data.from_arrow(pa.table({"src": ps, "dst": pd_})),
               n=4, attrs={"directed": True})
    iso, mapping = isomorphic(g1, g2)
    assert iso and mapping is not None


def test_automorphism_generators_chain_order(ray_session):
    from igraph_ray.algorithms.subiso import (automorphism_generators,
                                              count_isomorphisms_vf2)

    cases = {
        "bull": (5, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4)], False),
        "c6": (6, [(i, (i + 1) % 6) for i in range(6)], False),
        "petersen": (10, ([(i, (i + 1) % 5) for i in range(5)]
                          + [(i, i + 5) for i in range(5)]
                          + [(5 + i, 5 + (i + 2) % 5) for i in range(5)]),
                     False),
        "k4": (4, [(i, j) for i in range(4) for j in range(i + 1, 4)],
               False),
        "dir_c5": (5, [(i, (i + 1) % 5) for i in range(5)], True),
        "path3": (3, [(0, 1), (1, 2)], False),
    }
    published = {"bull": 2, "c6": 12, "petersen": 120, "k4": 24,
                 "dir_c5": 5, "path3": 2}
    for name, (n, edges, directed) in cases.items():
        s = np.array([a for a, b in edges], np.int64)
        d = np.array([b for a, b in edges], np.int64)
        gens, order = automorphism_generators(s, d, n, directed=directed)
        assert order == published[name], name
        assert order == count_isomorphisms_vf2(
            s, d, n, s, d, n, directed=directed), name
        # every generator is a permutation preserving the edge set
        eset = {(a, b) for a, b in edges}
        if not directed:
            eset |= {(b, a) for a, b in eset}
        for g in gens:
            assert len(np.unique(g)) == n
            assert all((int(g[a]), int(g[b])) in eset for a, b in edges)
        # no identity generators
        ident = np.arange(n)
        assert all(not np.array_equal(g, ident) for g in gens)


def test_automorphism_generators_closure_is_full_group(ray_session):
    """BFS closure of the generator set reproduces the exhaustive VF2
    automorphism enumeration element-for-element (bull + C4)."""
    from igraph_ray.algorithms.subiso import (automorphism_generators,
                                              get_isomorphisms_vf2)

    for n, edges in ((5, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4)]),
                     (4, [(i, (i + 1) % 4) for i in range(4)])):
        s = np.array([a for a, b in edges], np.int64)
        d = np.array([b for a, b in edges], np.int64)
        gens, order = automorphism_generators(s, d, n)
        full = {tuple(m.tolist())
                for m in get_isomorphisms_vf2(s, d, n, s, d, n,
                                              directed=False)}
        closed = {tuple(range(n))}
        frontier = list(closed)
        while frontier:
            x = np.array(frontier.pop(), np.int64)
            for g in gens:
                y = tuple(int(g[v]) for v in x)  # g after x
                if y not in closed:
                    closed.add(y)
                    frontier.append(y)
        assert closed == full
        assert len(closed) == order


def test_automorphism_group_dataset_surface(ray_session):
    import pyarrow as pa
    import ray.data

    from igraph_ray.algorithms.subiso import automorphism_group
    from igraph_ray.graph import Graph

    bull = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4)]
    g = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, b in bull], pa.int64()),
        "dst": pa.array([b for a, b in bull], pa.int64())})),
        n=5, attrs={"directed": False})
    t = automorphism_group(g).sort(["gen_id", "vertex"]).to_pandas()
    assert t["gen_id"].tolist() == [0] * 5
    assert t["image"].tolist() == [0, 2, 1, 4, 3]
    assert t["group_order"].tolist() == [2] * 5


def test_automorphism_group_trivial_sentinel(ray_session):
    """Rigid graph (trivial Aut): the surface must still report
    group_order=1 via a single (gen_id=-1) sentinel row, like the
    reference reports the order for frucht."""
    import pyarrow as pa
    import ray.data

    from igraph_ray.algorithms.subiso import automorphism_group
    from igraph_ray.graph import Graph

    # Asymmetric 6-vertex graph (path 0..5 + chord (2,4)); |Aut| = 1
    # verified by brute-force permutation check at dev time.
    rigid = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (2, 4)]
    g = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, b in rigid], pa.int64()),
        "dst": pa.array([b for a, b in rigid], pa.int64())})),
        n=6, attrs={"directed": False})
    t = automorphism_group(g, directed=False).to_pandas()
    assert len(t) == 1
    assert t["gen_id"].tolist() == [-1]
    assert t["vertex"].tolist() == [-1]
    assert t["group_order"].tolist() == [1]


def test_lad_domain_filter_preserves_counts(ray_session):
    """LAD-style candidate domains (degree + neighborhood-degree-
    sequence dominance) are sound: identical embedding counts with and
    without filtering, on a skewed fixture where the filter actually
    prunes (hub-centered spider pattern, most target vertices fail the
    degree test)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from igraph_ray.algorithms.subiso import (_lad_domains,
                                              count_sub_isomorphisms)
    from igraph_ray.graph import Graph

    # target: hub 0 with 12 leaves (two of them extended by pendant
    # tails so the spider's long leg can land), a C8 ring 20..27, one
    # K4 30..33
    edges = [(0, v) for v in range(1, 13)]
    edges += [(1, 40), (2, 41)]
    edges += [(20 + i, 20 + (i + 1) % 8) for i in range(8)]
    edges += [(a, b) for a in range(30, 34) for b in range(a + 1, 34)]
    g = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, b in edges], pa.int64()),
        "dst": pa.array([b for a, b in edges], pa.int64())})), n=42)

    spider6 = [(0, 1), (0, 2), (0, 3), (0, 4), (4, 5)]  # center deg 4
    kw = dict(directed=False, num_partitions=4)
    n_f = count_sub_isomorphisms(
        g, [a for a, _ in spider6], [b for _, b in spider6],
        domain_filter=True, **kw)
    n_0 = count_sub_isomorphisms(
        g, [a for a, _ in spider6], [b for _, b in spider6],
        domain_filter=False, **kw)
    assert n_f == n_0 > 0

    # domain soundness: only the hub (deg 12) and the K4 vertices
    # (deg 3) can host the degree-4 center candidate... deg>=4 keeps
    # ONLY the hub; every leaf/ring/K4 vertex is pruned
    E = g.edges.map_batches(
        lambda b: pa.table({
            "a": pa.array(np.concatenate(
                [b["src"].to_numpy(zero_copy_only=False),
                 b["dst"].to_numpy(zero_copy_only=False)])),
            "b": pa.array(np.concatenate(
                [b["dst"].to_numpy(zero_copy_only=False),
                 b["src"].to_numpy(zero_copy_only=False)]))}),
        batch_format="pyarrow", batch_size=None).materialize()
    doms = _lad_domains(E, spider6, 6, 4)
    center_dom = sorted(r["v"] for r in doms[0].take_all())
    assert center_dom == [0]
    # leaf domain: neighborhood dominance demands a neighbor of target
    # degree >= 4 (the center's pattern degree) — so the hub's leaves
    # qualify (their neighbor IS the hub) while the hub itself does NOT
    # (all its neighbors have degree <= 2)
    leaf_dom = {r["v"] for r in doms[1].take_all()}
    assert 0 not in leaf_dom
    assert set(range(1, 13)) <= leaf_dom
    assert not leaf_dom & set(range(20, 34))  # ring/K4 all pruned


def test_directed_degree_domains_preserve_counts(ray_session):
    """Directed >= 6-vertex patterns use out/in-degree domains: same
    counts as the unfiltered plan on a random digraph (domains are
    sound prefilters, never semantic)."""
    rng = np.random.default_rng(12)
    n = 10
    tedges = sorted({(int(a), int(b)) for a, b in
                     rng.integers(0, n, (40, 2)) if a != b})
    # 6-vertex directed broom: 0->1->2->3 with 3->4, 3->5
    pedges = [(0, 1), (1, 2), (2, 3), (3, 4), (3, 5)]
    kw = dict(directed=True, num_partitions=2)
    a = count_sub_isomorphisms(
        _g(n, tedges), [e[0] for e in pedges], [e[1] for e in pedges],
        domain_filter=True, **kw)
    b = count_sub_isomorphisms(
        _g(n, tedges), [e[0] for e in pedges], [e[1] for e in pedges],
        domain_filter=False, **kw)
    want = _brute_count(n, tedges, pedges, 6, directed=True)
    assert a == b == want
