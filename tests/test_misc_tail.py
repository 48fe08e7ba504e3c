"""Small API-tail surfaces: NCOL writer round-trip, matching
predicates, are_connected, adjacency export/import, value-only
wrappers."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.algorithms.matching import (
    is_matching,
    is_maximal_matching,
    maximal_matching,
)
from igraph_ray.ops.relational import (
    adjacency_triplets,
    are_connected,
    from_weighted_adjacency,
)
from igraph_ray.sources.edgelist import read_ncol, write_ncol


def _ds(rows, names):
    return ray.data.from_arrow(pa.table(
        {n: pa.array([r[i] for r in rows], pa.int64())
         for i, n in enumerate(names)}))


def test_write_ncol_round_trip(tmp_path):
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 0], pa.int64()),
        "weight": pa.array([1.5, 2.0, 3.25])}))
    vocab = ray.data.from_arrow(pa.table({
        "name": pa.array(["a", "b", "c"]),
        "vertex": pa.array([0, 1, 2], pa.int64())}))
    p = str(tmp_path / "t.ncol")
    write_ncol(edges, p, vocab=vocab, weight_col="weight")
    e2, v2 = read_ncol(p)
    assert sorted((r["src"], r["dst"], r["weight"])
                  for r in e2.take_all()) == [(0, 1, 1.5), (1, 2, 2.0),
                                              (2, 0, 3.25)]
    assert sorted((r["name"], r["vertex"]) for r in v2.take_all()) == [
        ("a", 0), ("b", 1), ("c", 2)]


def test_matching_predicates():
    und = _ds([(0, 1), (1, 2), (2, 3), (0, 3)], ["lo", "hi"])
    good = _ds([(0, 1), (2, 3)], ["lo", "hi"])
    assert is_matching(und, good) and is_maximal_matching(und, good)
    assert not is_matching(und, _ds([(0, 2)], ["lo", "hi"]))  # non-edge
    assert not is_matching(und, _ds([(0, 1), (1, 2)], ["lo", "hi"]))
    partial = _ds([(0, 1)], ["lo", "hi"])
    assert is_matching(und, partial)
    assert not is_maximal_matching(und, partial)  # edge (2,3) uncovered
    mm = maximal_matching(und, num_partitions=2)
    assert is_matching(und, mm) and is_maximal_matching(und, mm)


def test_are_connected():
    edges = _ds([(0, 1), (1, 2)], ["src", "dst"])
    assert are_connected(edges, 0, 1)
    assert not are_connected(edges, 1, 0)
    assert are_connected(edges, 1, 0, directed=False)
    assert not are_connected(edges, 0, 2, directed=False)


def test_adjacency_round_trip():
    m = np.array([[0.0, 2.5, 0.0],
                  [0.0, 0.0, 1.0],
                  [4.0, 0.0, 0.5]])
    edges = from_weighted_adjacency(m, mode="directed")
    got = sorted((r["src"], r["dst"], r["weight"])
                 for r in edges.take_all())
    assert got == [(0, 1, 2.5), (1, 2, 1.0), (2, 0, 4.0), (2, 2, 0.5)]
    cells = {(r["row"], r["col"]): r["mult"] for r in
             adjacency_triplets(edges, directed=True).take_all()}
    assert cells == {(0, 1): 1, (1, 2): 1, (2, 0): 1, (2, 2): 1}
    # undirected BOTH: loop adds 2 to the diagonal
    und = _ds([(0, 1), (2, 2)], ["src", "dst"])
    cells2 = {(r["row"], r["col"]): r["mult"] for r in
              adjacency_triplets(und, directed=False).take_all()}
    assert cells2 == {(0, 1): 1, (1, 0): 1, (2, 2): 2}


def test_value_wrappers():
    from igraph_ray.algorithms.cliques import maximal_cliques_count
    from igraph_ray.graph import Graph

    tri = _ds([(0, 1), (1, 2), (0, 2), (2, 3)], ["src", "dst"])
    g = Graph(tri.materialize(), n=4)
    assert maximal_cliques_count(g, num_partitions=2, min_size=2) == 2


def test_hsbm_list_structure():
    """hsbm_list_game (sbm.c:417): deterministic across parallelism,
    undirected i<j rows; dense intra-cluster vs sparse inter-block."""
    from igraph_ray.sources.games import hsbm_list_game

    kw = dict(n=30, mlist=(10, 20), rho_sizes_list=((5, 5), (10, 10)),
              c_e6_list=(((900000, 50000), (50000, 900000)),
                         ((800000, 10000), (10000, 800000))),
              p_e6=5000, seed=7)
    a = sorted((r["src"], r["dst"]) for r in hsbm_list_game(**kw).take_all())
    b = sorted((r["src"], r["dst"]) for r in hsbm_list_game(
        **{**kw, "num_partitions": 3}).take_all())
    assert a == b and all(s < d for s, d in a)
    intra = sum(1 for s, d in a if (s < 10) == (d < 10))
    inter = len(a) - intra
    assert intra > inter


def test_get_isomorphisms_c4_dihedral():
    """get_isomorphisms_vf2 with g1 == g2 enumerates Aut: the 4-cycle's
    dihedral group D4 has order 8."""
    from igraph_ray.algorithms.subiso import get_isomorphisms_vf2

    src = np.array([0, 1, 2, 3], np.int64)
    dst = np.array([1, 2, 3, 0], np.int64)
    maps = get_isomorphisms_vf2(src, dst, 4, src, dst, 4, directed=False)
    assert len(maps) == 8
    # all distinct, all bijections, all edge-preserving
    eset = {(0, 1), (1, 2), (2, 3), (3, 0)}
    eset |= {(b, a) for a, b in eset}
    seen = set()
    for m in maps:
        tm = tuple(m.tolist())
        assert tm not in seen and sorted(tm) == [0, 1, 2, 3]
        seen.add(tm)
        for a, b in [(0, 1), (1, 2), (2, 3), (3, 0)]:
            assert (m[a], m[b]) in eset


def test_canonical_permutation_invariance():
    """Canonical forms agree across random relabelings and distinguish
    non-isomorphic graphs (igraph_canonical_permutation contract)."""
    import hashlib

    from igraph_ray.algorithms.subiso import canonical_permutation

    def code(lab, s, d):
        return sorted(zip(np.minimum(lab[s], lab[d]).tolist(),
                          np.maximum(lab[s], lab[d]).tolist()))

    bull = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4)]
    s = np.array([a for a, b in bull], np.int64)
    d = np.array([b for a, b in bull], np.int64)
    base = code(canonical_permutation(s, d, 5), s, d)
    for seed in range(4):
        keys = [hashlib.md5(f"{seed}:{v}".encode()).hexdigest()
                for v in range(5)]
        perm = np.argsort(np.array(keys)).astype(np.int64)
        s2, d2 = perm[s], perm[d]
        assert code(canonical_permutation(s2, d2, 5), s2, d2) == base
    # non-isomorphic: P5 path differs
    ps = np.array([0, 1, 2, 3], np.int64)
    pd = np.array([1, 2, 3, 4], np.int64)
    assert code(canonical_permutation(ps, pd, 5), ps, pd) != base
    # symmetric graph (C4) terminates and is stable under rotation
    cs = np.array([0, 1, 2, 3], np.int64)
    cd = np.array([1, 2, 3, 0], np.int64)
    c4 = code(canonical_permutation(cs, cd, 4), cs, cd)
    rot = np.array([1, 2, 3, 0], np.int64)
    assert code(canonical_permutation(rot[cs], rot[cd], 4),
                rot[cs], rot[cd]) == c4


def test_layout_lgl_structure():
    """layout_lgl: every vertex placed, coordinates finite and inside
    the unit square, deterministic across partition counts."""
    from igraph_ray.graph import Graph
    from igraph_ray.ops.layout import layout_lgl

    # two components: a path 0-1-2-3 and an edge 4-5, plus isolate 6
    e = _ds([(0, 1), (1, 2), (2, 3), (4, 5)], ["src", "dst"])
    g = Graph(e.materialize(), n=7)
    a = sorted((r["vertex"], round(r["x"], 9), round(r["y"], 9))
               for r in layout_lgl(g, maxit=3, num_partitions=2).take_all())
    b = sorted((r["vertex"], round(r["x"], 9), round(r["y"], 9))
               for r in layout_lgl(g, maxit=3, num_partitions=4).take_all())
    assert a == b
    assert [v for v, _, _ in a] == list(range(7))
    assert all(np.isfinite(x) and np.isfinite(y) for _, x, y in a)
    assert all(0.0 <= x <= 1.0 and 0.0 <= y <= 1.0 for _, x, y in a)


def test_scg_laplacian_and_stochastic_dense_parity():
    """Coarse matrices match the dense semiprojector formulas
    (scg.c:537 lap row-norm; scg.c:634 sto row-norm with the symmetric
    walk's closed-form stationary p = deg/2m)."""
    from igraph_ray.algorithms.scg import scg_laplacian, scg_stochastic
    from igraph_ray.graph import Graph

    e = _ds([(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3)],
            ["src", "dst"])
    g = Graph(e.materialize(), n=6)

    for which in ("lap", "sto"):
        res = (scg_laplacian if which == "lap" else scg_stochastic)(
            g, ell=2, intervals=2, fixed_iterations=40, num_partitions=2)
        gr = {r["vertex"]: r["group"] for r in res.groups.take_all()}
        k = res.num_groups
        # dense replay with the SAME grouping
        A = np.zeros((6, 6))
        for s, d in [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5),
                     (5, 3)]:
            A[s, d] = A[d, s] = 1
        deg = A.sum(1)
        P = np.zeros((k, 6))
        for v, a in gr.items():
            P[a, v] = 1
        sizes = P.sum(1)
        got = {(r["src"], r["dst"]): r["weight"]
               for r in res.coarse.take_all()}
        if which == "lap":
            Lm = np.diag(deg) - A
            ref = (P / sizes[:, None]) @ Lm @ P.T
        else:
            S = A / deg[:, None]
            p = deg / deg.sum()
            pg = P @ p
            Lsemi = P * (p[None, :] / pg[:, None])
            ref = Lsemi @ S @ P.T
        for a in range(k):
            for b in range(k):
                assert abs(got.get((a, b), 0.0) - ref[a, b]) < 1e-9, (
                    which, a, b)
        if which == "sto":
            # rows of the coarse stochastic matrix sum to 1
            rows = np.zeros(k)
            for (a, b), w in got.items():
                rows[a] += w
            assert np.allclose(rows, 1.0)


def test_spinglass_single_planted_clique():
    """spinglass_single on two cliques joined by one bridge: the
    community of a clique member is exactly its clique."""
    from igraph_ray.algorithms.spinglass import spinglass_single
    from igraph_ray.graph import Graph

    edges = []
    for block, off in ((5, 0), (5, 5)):
        for i in range(block):
            for j in range(i + 1, block):
                edges.append((off + i, off + j))
    edges.append((0, 5))  # bridge
    e = _ds(edges, ["src", "dst"])
    g = Graph(e.materialize(), n=10)
    members, stats = spinglass_single(g, vertex=2, num_partitions=2)
    got = sorted(r["vertex"] for r in members.take_all())
    assert got == [0, 1, 2, 3, 4]
    assert stats["inner_links"] == 10
    assert stats["outer_links"] == 1
    assert stats["size"] == 5


def test_scg_norm_eps():
    """scg_norm_eps: zero for group-piecewise-constant vectors, exact
    residual otherwise."""
    from igraph_ray.algorithms.scg import scg_norm_eps

    vec = ray.data.from_arrow(pa.table({
        "vertex": pa.array([0, 1, 2, 3], pa.int64()),
        "d0": pa.array([1.0, 1.0, 5.0, 5.0]),
        "d1": pa.array([0.0, 2.0, 0.0, 2.0])}))
    gr = _ds([(0, 0), (1, 0), (2, 1), (3, 1)], ["vertex", "group"])
    eps = scg_norm_eps(vec, gr, ["d0", "d1"], num_partitions=2)
    assert abs(eps[0]) < 1e-12
    assert abs(eps[1] - 2.0) < 1e-12  # residuals (-1,1,-1,1)


def test_dup_ngram_stats():
    """Exact duplicate-3-gram fractions (Gopher A1.1 signal)."""
    from igraph_ray.ops.curation import dup_ngram_stats

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b c a b c a b c",
                          "one two three four five", "x y"])}))
    got = {r["doc_id"]: (r["n_ngrams"], r["dup_e6"])
           for r in dup_ngram_stats(docs, n=3).take_all()}
    # 7 trigram occurrences, 3 distinct -> (7-3)*1e6//7
    assert got == {0: (7, 571428), 1: (3, 0), 2: (0, 0)}


def test_famous_catalog_extension_invariants():
    """The session-6 famous graphs match their published invariants:
    girth, bipartiteness, automorphism-group orders."""
    from igraph_ray.algorithms.girth import girth as girth_fn
    from igraph_ray.algorithms.subiso import count_isomorphisms_vf2
    from igraph_ray.graph import Graph
    from igraph_ray.sources.structures import FAMOUS

    def _np(name):
        n, e = FAMOUS[name]()
        es = sorted({(min(a, b), max(a, b)) for a, b in e})
        return n, (np.array([a for a, _ in es], np.int64),
                   np.array([b for _, b in es], np.int64))

    # published automorphism-group orders
    for name, aut in [("dodecahedral", 120), ("icosahedral", 120),
                      ("grotzsch", 10), ("chvatal", 8),
                      ("franklin", 48)]:
        n, (s, d) = _np(name)
        assert count_isomorphisms_vf2(s, d, n, s, d, n,
                                      directed=False) == aut, name

    # published girths
    for name, gr in [("mcgee", 7), ("levi", 8), ("folkman", 4),
                     ("franklin", 4), ("dodecahedral", 5),
                     ("icosahedral", 3), ("herschel", 4),
                     ("chvatal", 4)]:
        n, (s, d) = _np(name)
        g = Graph(ray.data.from_arrow(pa.table({
            "src": pa.array(s), "dst": pa.array(d)})).materialize(), n=n)
        got = girth_fn(g, num_partitions=2)
        got = got if isinstance(got, int) else int(got)
        assert got == gr, (name, got)

    # bipartite classics: folkman, levi, herschel, franklin have no odd
    # cycles — 2-color via BFS
    for name in ["folkman", "levi", "herschel", "franklin"]:
        n, (s, d) = _np(name)
        adj = [[] for _ in range(n)]
        for a, b in zip(s, d):
            adj[a].append(b)
            adj[b].append(a)
        color = [-1] * n
        for seed in range(n):
            if color[seed] >= 0:
                continue
            color[seed] = 0
            stack = [seed]
            while stack:
                u = stack.pop()
                for w in adj[u]:
                    if color[w] < 0:
                        color[w] = 1 - color[u]
                        stack.append(w)
                    else:
                        assert color[w] != color[u], name
