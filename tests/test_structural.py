from collections import defaultdict
from itertools import combinations

import numpy as np
import pytest

from igraph_ray import Graph
from igraph_ray.ops import structural as st
from tests import fixtures as fx
from tests.oracles import triangles_ref


def _und_adj(n, src, dst):
    nbr = defaultdict(set)
    for a, b in zip(src, dst):
        if a != b:
            nbr[a].add(b)
            nbr[b].add(a)
    return nbr


def test_transitivity_global():
    n, src, dst = fx.karate()
    g = Graph.from_numpy(src, dst, n=n)
    got = st.transitivity_undirected(g, num_partitions=4)
    tri = triangles_ref(n, src, dst).sum()  # 3× triangle count
    nbr = _und_adj(n, src, dst)
    triples = sum(len(nbr[v]) * (len(nbr[v]) - 1) / 2 for v in range(n))
    assert got == pytest.approx(tri / triples, abs=1e-12)


def test_transitivity_local():
    n, src, dst = fx.karate()
    g = Graph.from_numpy(src, dst, n=n)
    rows = {r["vertex"]: r["cc_local"] for r in st.transitivity_local(g, num_partitions=4).take_all()}
    tri = triangles_ref(n, src, dst)
    nbr = _und_adj(n, src, dst)
    for v in range(n):
        d = len(nbr[v])
        if d < 2:
            assert np.isnan(rows[v])
        else:
            assert rows[v] == pytest.approx(2 * tri[v] / (d * (d - 1)), abs=1e-12)


def test_cocitation_and_bibcoupling():
    n, src, dst = fx.er_digraph(n=60, m=300, seed=15)
    g = Graph.from_numpy(src, dst, n=n)
    edges = {(a, b) for a, b in zip(src, dst) if a != b}
    # oracle
    in_n = defaultdict(set)
    out_n = defaultdict(set)
    for a, b in edges:
        out_n[a].add(b)
        in_n[b].add(a)
    co_ref = defaultdict(int)
    for citer in out_n:
        for a, b in combinations(sorted(out_n[citer]), 2):
            co_ref[(a, b)] += 1
    got = {(r["a"], r["b"]): r["common"] for r in st.cocitation(g, num_partitions=4).take_all()}
    assert got == dict(co_ref)
    bib_ref = defaultdict(int)
    for cited in in_n:
        for a, b in combinations(sorted(in_n[cited]), 2):
            bib_ref[(a, b)] += 1
    got_b = {(r["a"], r["b"]): r["common"] for r in st.bibcoupling(g, num_partitions=4).take_all()}
    assert got_b == dict(bib_ref)


def test_neighbor_jaccard():
    n, src, dst = fx.karate()
    g = Graph.from_numpy(src, dst, n=n)
    nbr = _und_adj(n, src, dst)
    got = {(r["a"], r["b"]): (r["common"], r["jaccard_e9"]) for r in
           st.neighbor_jaccard(g, num_partitions=4).take_all()}
    for (a, b), (common, je9) in got.items():
        ref_c = len(nbr[a] & nbr[b])
        assert common == ref_c
        ref_j = ref_c / len(nbr[a] | nbr[b])
        assert je9 == round(ref_j * 1e9)


def test_assortativity():
    n, src, dst = fx.powerlaw(n=300, m=1500, seed=2)
    g = Graph.from_numpy(src, dst, n=n)
    got = st.degree_assortativity(g, num_partitions=4)
    nl = src != dst
    s, t = src[nl], dst[nl]
    od = np.zeros(n); np.add.at(od, s, 1)
    idg = np.zeros(n); np.add.at(idg, t, 1)
    x, y = od[s], idg[t]
    ref = np.corrcoef(x, y)[0, 1]
    assert got == pytest.approx(ref, abs=1e-9)


def test_k_core():
    # K5 + a tail path: 4-core = the K5
    src = []
    dst = []
    for i in range(5):
        for j in range(i + 1, 5):
            src.append(i); dst.append(j)
    src += [4, 5, 6]
    dst += [5, 6, 7]
    g = Graph.from_numpy(np.array(src), np.array(dst), n=8)
    core = {r["vertex"] for r in st.k_core(g, k=4, num_partitions=2).take_all()}
    assert core == {0, 1, 2, 3, 4}
    core2 = {r["vertex"] for r in st.k_core(g, k=1, num_partitions=2).take_all()}
    assert core2 == set(range(8))


def test_local_scan1():
    # scan.c:347 undirected ecount semantics on the simple view: edges in
    # the closed neighborhood = deg + triangles-through-v
    n, src, dst = fx.er_digraph(n=120, m=900, seed=3)
    g = Graph.from_numpy(src, dst, n=n)
    got = {r["vertex"]: r["scan1"] for r in st.local_scan1(g, num_partitions=4).take_all()}
    nbr = _und_adj(n, src, dst)
    for v in range(n):
        closed = nbr[v] | {v}
        expect = sum(
            1 for a in closed for b in nbr[a] if b in closed and a < b
        )
        assert got[v] == expect, v
    assert len(got) == n


def test_similarity_dice():
    n, src, dst = fx.karate()
    g = Graph.from_numpy(src, dst, n=n)
    nbr = _und_adj(n, src, dst)
    got = {(r["a"], r["b"]): (r["common"], r["dice_e9"]) for r in
           st.similarity_dice(g, num_partitions=4).take_all()}
    expect_pairs = {(a, b) for a, b in combinations(range(n), 2)
                    if len(nbr[a] & nbr[b]) > 0}
    assert set(got) == expect_pairs
    for (a, b), (common, de9) in got.items():
        ref_c = len(nbr[a] & nbr[b])
        assert common == ref_c
        ref_d = 2.0 * ref_c / (len(nbr[a]) + len(nbr[b]))
        assert de9 == round(ref_d * 1e9)


def test_similarity_inverse_log_weighted():
    n, src, dst = fx.er_digraph(n=60, m=300, seed=7)
    g = Graph.from_numpy(src, dst, n=n)
    nbr = _und_adj(n, src, dst)

    def w(u):
        d = len(nbr[u])
        return round((1.0 / np.log(d) if d > 1 else float(d)) * 1e9)

    got = {(r["a"], r["b"]): r["sim_e9"] for r in
           st.similarity_inverse_log_weighted(g, num_partitions=4).take_all()}
    for (a, b), sim in got.items():
        ref = sum(w(u) for u in nbr[a] & nbr[b])
        assert sim == ref, (a, b)
    # every overlapping pair present
    assert all((a, b) in got for a, b in combinations(range(n), 2)
               if nbr[a] & nbr[b])


def test_avg_neighbor_degree():
    n, src, dst = fx.er_digraph(n=80, m=400, seed=3)
    # knn requires a simple graph: dedup directed pairs, drop loops
    pairs = sorted({(a, b) for a, b in zip(src, dst) if a != b})
    src = np.array([p[0] for p in pairs]); dst = np.array([p[1] for p in pairs])
    g = Graph.from_numpy(src, dst, n=n)
    deg = defaultdict(int)
    inc = defaultdict(list)  # incident directed edges, opposite endpoint
    for a, b in pairs:
        deg[a] += 1; deg[b] += 1
        inc[a].append(b); inc[b].append(a)
    got = {r["vertex"]: (r["deg"], r["knn_e9"]) for r in
           st.avg_neighbor_degree(g, num_partitions=4).take_all()}
    for v, (d, knn_e9) in got.items():
        assert d == deg[v]
        ref = sum(deg[u] for u in inc[v]) / deg[v]
        assert knn_e9 == round(ref * 1e9)
    assert set(got) == {v for v in range(n) if deg[v] > 0}
    # knnk: integer half-up mean of quantized knn per degree class
    by_deg = defaultdict(list)
    for v, (d, knn_e9) in got.items():
        by_deg[d].append(knn_e9)
    got_k = {r["deg"]: r["knnk_e9"] for r in st.knnk(g, num_partitions=4).take_all()}
    for d, vals in by_deg.items():
        s, m = sum(vals), len(vals)
        assert got_k[d] == (2 * s + m) // (2 * m)
    assert set(got_k) == set(by_deg)


def test_diversity():
    n, src, dst = fx.er_digraph(n=50, m=200, seed=9)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    rng = np.random.default_rng(4)
    wts = rng.integers(1, 11, len(src)).astype(np.float64)
    import pyarrow as pa
    import ray.data
    g = Graph(ray.data.from_arrow(pa.table(
        {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()),
         "weight": pa.array(wts)})), n=None, weighted=True)
    inc = defaultdict(list)
    for a, b, w in zip(src, dst, wts):
        inc[a].append(w); inc[b].append(w)
    got = {r["vertex"]: r["div"] for r in st.diversity(g, num_partitions=4).take_all()}
    for v, dv in got.items():
        ws = np.array(inc[v]); k = len(ws)
        if k <= 1:
            assert dv == 0.0
        else:
            s = ws.sum(); ent = (ws * np.log(ws)).sum()
            ref = (np.log(s) - ent / s) / np.log(k)
            assert dv == pytest.approx(ref, abs=1e-9)
    assert set(got) == set(inc)


def test_neighborhood_size2():
    n, src, dst = fx.karate()
    g = Graph.from_numpy(src, dst, n=n)
    nbr = _und_adj(n, src, dst)
    got = {r["vertex"]: r["nsize"] for r in
           st.neighborhood_size2(g, num_partitions=4).take_all()}
    for v in nbr:
        reach = {v} | nbr[v]
        for u in list(nbr[v]):
            reach |= nbr[u]
        assert got[v] == len(reach)


def test_edge_clustering_small():
    # triangle 0-1-2 plus pendant 2-3: edge (0,1) has 1 triangle,
    # denom = min(2,2)-1 = 1; edge (2,3) has 0 triangles, denom = 1-1+... 
    # deg: 0->2, 1->2, 2->3, 3->1
    import pyarrow as pa
    import ray.data

    from igraph_ray.graph import Graph
    from igraph_ray.ops.structural import edge_clustering

    edges = ray.data.from_arrow(pa.table(
        {"src": pa.array([0, 1, 0, 2], pa.int64()),
         "dst": pa.array([1, 2, 2, 3], pa.int64())}))
    out = {(r["lo"], r["hi"]): (r["tri"], r["denom"])
           for r in edge_clustering(Graph(edges)).take_all()}
    assert out == {(0, 1): (1, 1), (1, 2): (1, 1), (0, 2): (1, 1),
                   (2, 3): (0, 0)}


def test_k_truss():
    import pyarrow as pa
    import ray.data
    from itertools import combinations

    from igraph_ray.graph import Graph
    from igraph_ray.ops.structural import k_truss

    # K4 on {0,1,2,3} + triangle {3,4,5} + pendant edge (5,6) + chord (2,4)
    k4 = list(combinations(range(4), 2))
    edges = k4 + [(3, 4), (4, 5), (3, 5), (5, 6), (2, 4)]
    g = Graph(ray.data.from_arrow(pa.table(
        {"src": pa.array([e[0] for e in edges], pa.int64()),
         "dst": pa.array([e[1] for e in edges], pa.int64())})))
    t4 = {(r["lo"], r["hi"]) for r in k_truss(g, k=4, num_partitions=2).take_all()}
    assert t4 == set(k4)  # only the K4 survives 4-truss peeling
    t3 = {(r["lo"], r["hi"]) for r in k_truss(g, k=3, num_partitions=2).take_all()}
    # all edges in ≥1 triangle: K4, the {3,4,5} triangle, and (2,4)
    # which closes triangle {2,3,4} via the chord
    assert t3 == set(k4) | {(3, 4), (4, 5), (3, 5), (2, 4)}
    t5 = k_truss(g, k=5, num_partitions=2).take_all()
    assert t5 == []


def test_barrat_weighted_clustering():
    """Exact brute-force Barrat check on a small weighted graph
    (igraph_transitivity_barrat, triangles.c:713-965)."""
    import pyarrow as pa
    import ray.data

    # K4 minus one edge plus a pendant, deterministic integer weights
    und = [(0, 1, 3), (0, 2, 5), (1, 2, 2), (1, 3, 7), (2, 3, 1), (3, 4, 4)]
    lo = [e[0] for e in und]; hi = [e[1] for e in und]; w = [e[2] for e in und]
    ds = ray.data.from_arrow(pa.table({
        "lo": pa.array(lo, pa.int64()), "hi": pa.array(hi, pa.int64()),
        "weight": pa.array(w, pa.int64())}))
    rows = {r["vertex"]: r for r in
            st.barrat_weighted_clustering(ds, num_partitions=2).take_all()}

    nbr = defaultdict(dict)
    for a, b, ww in und:
        nbr[a][b] = ww
        nbr[b][a] = ww
    for v, nv in nbr.items():
        deg = len(nv)
        if deg < 2:
            assert v not in rows
            continue
        s = sum(nv.values())
        wsum = 0
        for j, h in combinations(sorted(nv), 2):
            if h in nbr[j]:
                wsum += nv[j] + nv[h]
        r = rows[v]
        assert (r["tri_wsum"], r["strength"], r["deg"]) == (wsum, s, deg), v
    assert set(rows) == {v for v, nv in nbr.items() if len(nv) >= 2}


def test_burt_constraint():
    """Brute-force Burt constraint on a small weighted graph
    (igraph_constraint semantics)."""
    import pyarrow as pa
    import ray.data

    und = [(0, 1, 3), (0, 2, 5), (1, 2, 2), (1, 3, 7), (2, 3, 1), (3, 4, 4)]
    ds = ray.data.from_arrow(pa.table({
        "lo": pa.array([e[0] for e in und], pa.int64()),
        "hi": pa.array([e[1] for e in und], pa.int64()),
        "weight": pa.array([e[2] for e in und], pa.int64())}))
    rows = {r["vertex"]: r["constraint_e6"] for r in
            st.burt_constraint(ds, num_partitions=2).take_all()}

    w = defaultdict(dict)
    for a, b, ww in und:
        w[a][b] = ww
        w[b][a] = ww
    for v in w:
        s = sum(w[v].values())
        c = 0.0
        for j in w[v]:
            t = w[v][j] / s
            for q in w[v]:
                if q != j and j in w[q]:
                    t += (w[v][q] / s) * (w[q][j] / sum(w[q].values()))
            c += t * t
        assert rows[v] == int(np.round(c * 1e6)), (v, rows[v], c)
    assert set(rows) == set(w)


def test_local_scan1_them():
    """Brute-force THEM scan-1 (mode OUT): count them-edges with both
    endpoints in {v} ∪ out-neighbors_us(v)."""
    import pyarrow as pa
    import ray.data

    us = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 0)]
    them = [(1, 2), (2, 1), (3, 0), (0, 4), (2, 3), (1, 1)]
    us_ds = ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in us], pa.int64()),
        "dst": pa.array([e[1] for e in us], pa.int64())}))
    them_ds = ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in them], pa.int64()),
        "dst": pa.array([e[1] for e in them], pa.int64())}))
    got = {r["vertex"]: r["scan1t"] for r in
           st.local_scan1_them(us_ds, them_ds, num_partitions=2).take_all()}

    out = defaultdict(set)
    for a, b in us:
        out[a].add(b)
    verts = {v for e in us for v in e}
    for v in verts:
        nb = {v} | out[v]
        want = sum(1 for a, b in them if a in nb and b in nb)
        assert got[v] == want, (v, got[v], want)
    assert set(got) == verts


def test_split_join_distance():
    """Brute-force van Dongen split-join on hand partitions."""
    import pyarrow as pa
    import ray.data

    from igraph_ray.ops.compare import split_join_distance

    # P1: {0,1,2},{3,4}; P2: {0,1},{2,3},{4}
    p1 = ray.data.from_arrow(pa.table({
        "vertex": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "label": pa.array([0, 0, 0, 1, 1], pa.int64())}))
    p2 = ray.data.from_arrow(pa.table({
        "vertex": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "label": pa.array([0, 0, 1, 1, 2], pa.int64())}))
    t = split_join_distance(p1, p2, num_partitions=2).to_pydict()
    # dist12 = n - (max over P2 per P1 part): part{0,1,2}→2, part{3,4}→1 → 5-3=2
    # dist21: {0,1}→2, {2,3}→1, {4}→1 → 5-4=1
    assert t["n"] == [5]
    assert t["dist12"] == [2]
    assert t["dist21"] == [1]
    assert t["split_join"] == [3]


def test_rand_pair_counts():
    """Brute-force pair-counting sums on hand partitions."""
    import pyarrow as pa
    import ray.data
    from itertools import combinations as combs

    from igraph_ray.ops.compare import rand_pair_counts

    lab1 = [0, 0, 0, 1, 1]
    lab2 = [0, 0, 1, 1, 2]
    p1 = ray.data.from_arrow(pa.table({
        "vertex": pa.array(range(5), pa.int64()),
        "label": pa.array(lab1, pa.int64())}))
    p2 = ray.data.from_arrow(pa.table({
        "vertex": pa.array(range(5), pa.int64()),
        "label": pa.array(lab2, pa.int64())}))
    t = rand_pair_counts(p1, p2, num_partitions=2).to_pydict()
    same11 = sum(1 for i, j in combs(range(5), 2)
                 if lab1[i] == lab1[j] and lab2[i] == lab2[j])
    same1 = sum(1 for i, j in combs(range(5), 2) if lab1[i] == lab1[j])
    same2 = sum(1 for i, j in combs(range(5), 2) if lab2[i] == lab2[j])
    assert t["n"] == [5] and t["pairs"] == [10]
    assert t["sum_nij2"] == [same11]
    assert t["sum_a2"] == [same1]
    assert t["sum_b2"] == [same2]


def test_local_scan2():
    """Brute-force scan-2: edges inside each closed 2-neighborhood."""
    import pyarrow as pa
    import ray.data

    und = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 2), (5, 6)]
    ds = ray.data.from_arrow(pa.table({
        "lo": pa.array([e[0] for e in und], pa.int64()),
        "hi": pa.array([e[1] for e in und], pa.int64())}))
    got = {r["vertex"]: r["scan2"] for r in
           st.local_scan2(ds, num_partitions=2).take_all()}

    nbr = _und_adj(7, [e[0] for e in und], [e[1] for e in und])
    for v in range(7):
        n2 = {v} | nbr[v] | {w for u in nbr[v] for w in nbr[u]}
        want = sum(1 for a, b in und if a in n2 and b in n2)
        assert got[v] == want, (v, got[v], want)


def test_is_bipartite_double_cover():
    """Double-cover component rule: even cycle bipartite, odd cycle not."""
    import pyarrow as pa
    import ray.data

    from igraph_ray.algorithms.components import connected_components

    def check(und_pairs):
        lo = np.array([e[0] for e in und_pairs], np.int64)
        hi = np.array([e[1] for e in und_pairs], np.int64)
        g = Graph.from_numpy(lo, hi, n=None)
        nc = connected_components(g, num_partitions=2).state \
            .groupby("label").count().count()
        dc = ray.data.from_arrow(pa.table({
            "src": pa.array(np.concatenate([2 * lo, 2 * lo + 1])),
            "dst": pa.array(np.concatenate([2 * hi + 1, 2 * hi]))}))
        g2 = Graph(dc.materialize(), n=None)
        nd = connected_components(g2, num_partitions=2).state \
            .groupby("label").count().count()
        return nd == 2 * nc

    assert check([(0, 1), (1, 2), (2, 3), (3, 0)])          # C4 bipartite
    assert not check([(0, 1), (1, 2), (2, 0)])              # C3 odd
    assert check([(0, 1), (1, 2), (3, 4)])                  # forest
    assert not check([(0, 1), (1, 2), (2, 3), (3, 0), (5, 6), (6, 7), (7, 5)])


def test_maximal_independent_set():
    """Independence + maximality on karate and a random graph; output is
    a pure function of the input (two runs identical)."""
    from igraph_ray.algorithms.mis import maximal_independent_set

    for seed, n, m in ((None, None, None), (3, 40, 120)):
        if seed is None:
            n, src, dst = fx.karate()
        else:
            rng = np.random.default_rng(seed)
            src = rng.integers(0, n, m).astype(np.int64)
            dst = rng.integers(0, n, m).astype(np.int64)
        g = Graph.from_numpy(src, dst, n=n)
        st = maximal_independent_set(g, num_partitions=4).state
        mis = {r["vertex"] for r in st.take_all() if r["status"] == 1}
        nbr = _und_adj(n, src, dst)
        assert all(not (nbr[v] & mis) for v in mis)
        covered = mis | {v for v in range(n) if nbr[v] & mis}
        # every vertex is in the set or adjacent to it (isolated → in set)
        assert covered | {v for v in range(n) if not nbr[v]} >= set(range(n))
        st2 = maximal_independent_set(
            Graph.from_numpy(src, dst, n=n), num_partitions=2).state
        mis2 = {r["vertex"] for r in st2.take_all() if r["status"] == 1}
        assert mis == mis2


def test_maximal_matching():
    """Matching (disjoint endpoints) + maximality + parallelism
    invariance on a random graph."""
    import pyarrow as pa
    import ray.data

    from igraph_ray.algorithms.matching import maximal_matching

    rng = np.random.default_rng(5)
    n, m = 30, 70
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    pairs = sorted({(min(a, b), max(a, b)) for a, b in zip(src, dst) if a != b})
    und = ray.data.from_arrow(pa.table({
        "lo": pa.array([p[0] for p in pairs], pa.int64()),
        "hi": pa.array([p[1] for p in pairs], pa.int64())}))
    got = sorted((r["lo"], r["hi"]) for r in
                 maximal_matching(und, num_partitions=4).take_all())
    verts = [v for e in got for v in e]
    assert len(verts) == len(set(verts))            # disjoint endpoints
    ms = set(verts)
    assert all(a in ms or b in ms for a, b in pairs)  # maximal
    got2 = sorted((r["lo"], r["hi"]) for r in
                  maximal_matching(und, num_partitions=2).take_all())
    assert got == got2


def test_edge_clustering4():
    """Brute-force k=4 edge clustering components on a small graph."""
    import pyarrow as pa
    import ray.data
    from itertools import product

    und = [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2), (3, 4), (4, 5), (0, 5)]
    ds = ray.data.from_arrow(pa.table({
        "lo": pa.array([e[0] for e in und], pa.int64()),
        "hi": pa.array([e[1] for e in und], pa.int64())}))
    got = {(r["lo"], r["hi"]): (r["cyc4"], r["denom"]) for r in
           st.edge_clustering4(ds, num_partitions=2).take_all()}

    nbr = _und_adj(6, [e[0] for e in und], [e[1] for e in und])
    for u, v in und:
        z = sum(1 for x, y in product(nbr[u] - {v}, nbr[v] - {u})
                if x != y and y in nbr[x])
        denom = (len(nbr[u]) - 1) * (len(nbr[v]) - 1) - len(nbr[u] & nbr[v])
        assert got[(u, v)] == (z, denom), ((u, v), got[(u, v)], (z, denom))
    assert set(got) == set(und)


def test_betweenness_source_additivity():
    """Per-source dependency sums are additive over a source partition:
    bc(all) = bc(sources=A) + bc(sources=B) — the property the sampled
    estimation variant relies on."""
    from igraph_ray.algorithms.betweenness import betweenness

    n, src, dst = fx.karate()
    g = Graph.from_numpy(src, dst, n=n)
    full = {r["vertex"]: r["bc"] for r in
            betweenness(g, num_partitions=2, chunk=16).take_all()}
    a = [v for v in range(n) if v % 2 == 0]
    b = [v for v in range(n) if v % 2 == 1]
    pa_ = {r["vertex"]: r["bc"] for r in
           betweenness(g, sources=a, num_partitions=2, chunk=16).take_all()}
    pb = {r["vertex"]: r["bc"] for r in
          betweenness(g, sources=b, num_partitions=2, chunk=16).take_all()}
    for v in range(n):
        assert abs(full[v] - (pa_.get(v, 0.0) + pb.get(v, 0.0))) < 1e-9, v


class TestGraphicalSequence:
    def test_known_cases(self, ray_session):
        from igraph_ray.ops.structural import (
            is_graphical_degree_sequence as g)

        assert g([3, 3, 3, 3]) == (True, True)       # K4
        assert g([3, 3, 3, 1]) == (True, False)      # EG violation
        assert g([2, 1]) == (False, False)           # odd sum
        assert g([0, 0, 0]) == (True, True)          # empty graph
        assert g([4, 4, 4, 1, 1]) == (True, False)
        assert g([]) == (True, True)

    def test_random_vs_havel_hakimi(self, ray_session):
        import numpy as np
        from igraph_ray.ops.structural import (
            is_graphical_degree_sequence as g)

        def havel_hakimi(seq):
            work = sorted(seq, reverse=True)
            if sum(work) % 2:
                return False
            while work:
                work.sort(reverse=True)
                d = work.pop(0)
                if d == 0:
                    return True
                if d > len(work):
                    return False
                for i in range(d):
                    work[i] -= 1
                    if work[i] < 0:
                        return False
            return True

        rng = np.random.RandomState(3)
        for _ in range(60):
            n = rng.randint(2, 12)
            seq = rng.randint(0, n, n).tolist()
            is_seq, is_gr = g(seq)
            assert is_seq == (sum(seq) % 2 == 0)
            if is_seq:
                assert is_gr == havel_hakimi(seq), seq


def test_local_scan0_and_k2_them_and_nbhd():
    """Brute-force the three scan surfaces added for the scan.c tail:
    scan-0 (= degree with loops, scan.c:54), scan-k=2 THEM
    (scan.c:676: them-edges inside the undirected 2-ball of us), and
    neighborhood_ecount (pre-supplied member lists, directed)."""
    import pyarrow as pa
    import ray.data

    us = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 0), (2, 2)]
    them = [(1, 2), (3, 0), (0, 4), (2, 3), (3, 4)]
    us_ds = ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in us], pa.int64()),
        "dst": pa.array([e[1] for e in us], pa.int64())}))
    them_ds = ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in them], pa.int64()),
        "dst": pa.array([e[1] for e in them], pa.int64())}))
    verts = sorted({v for e in us for v in e} | {v for e in them for v in e})

    # scan-0 OUT: multigraph out-degree, loops counted
    got0 = {r["vertex"]: r["scan0"] for r in
            st.local_scan0(us_ds, mode="out", num_partitions=2).take_all()}
    expect0 = defaultdict(float)
    for s, d in us:
        expect0[s] += 1.0
    assert got0 == {v: expect0[v] for v in {x for e in us for x in e}}

    # scan-2 THEM over the undirected simple views
    su = np.array([e[0] for e in us], np.int64)
    du = np.array([e[1] for e in us], np.int64)
    g_us = Graph.from_numpy(su, du, n=5)
    them_und = sorted({(min(a, b), max(a, b)) for a, b in them if a != b})
    them_und_ds = ray.data.from_arrow(pa.table({
        "lo": pa.array([e[0] for e in them_und], pa.int64()),
        "hi": pa.array([e[1] for e in them_und], pa.int64())}))
    got2 = {r["vertex"]: r["scan2t"] for r in
            st.local_scan_k_ecount_them(
                g_us, them_und_ds, k=2, num_partitions=2).take_all()}
    und_adj = defaultdict(set)
    for a, b in us:
        if a != b:
            und_adj[a].add(b)
            und_adj[b].add(a)
    for v in {x for e in us for x in e}:
        ball = {v} | und_adj[v] | {w for u in und_adj[v] for w in und_adj[u]}
        expect = sum(1 for a, b in them_und if a in ball and b in ball)
        assert got2[v] == expect, v

    # neighborhood_ecount: neighborhoods = out-neighbors in us, graph = them
    nbhd = ray.data.from_arrow(pa.table({
        "seed": pa.array([e[0] for e in us if e[0] != e[1]], pa.int64()),
        "vertex": pa.array([e[1] for e in us if e[0] != e[1]], pa.int64())}))
    uni = ray.data.from_arrow(pa.table({
        "vertex": pa.array(verts, pa.int64())}))
    gotn = {r["vertex"]: r["scan_nb"] for r in
            st.local_scan_neighborhood_ecount(
                them_ds, nbhd, universe=uni, num_partitions=2).take_all()}
    out_us = defaultdict(set)
    for a, b in us:
        if a != b:
            out_us[a].add(b)
    for v in verts:
        marked = out_us[v] | {v}
        expect = sum(1 for a, b in them if a in out_us[v] and b in marked)
        assert gotn[v] == expect, v


def test_assortativity_values_matches_numpy(ray_session):
    """igraph_assortativity (values variant) vs a dense numpy Pearson
    correlation over edge endpoint values, directed and undirected."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from igraph_ray.graph import Graph
    from igraph_ray.ops.structural import assortativity_values

    rng = np.random.default_rng(5)
    n, m = 40, 160
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    vals = rng.integers(0, 100, n)
    g = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})),
        n=n)
    vds = ray.data.from_arrow(pa.table({
        "vertex": pa.array(np.arange(n), pa.int64()),
        "value": pa.array(vals, pa.int64())}))
    r = assortativity_values(g, vds, directed=True)
    x, y = vals[src].astype(float), vals[dst].astype(float)
    exp = np.corrcoef(x, y)[0, 1]
    assert abs(r - exp) < 1e-9
    r2 = assortativity_values(g, vds, directed=False)
    x2 = np.concatenate([x, y])
    y2 = np.concatenate([y, x])
    assert abs(r2 - np.corrcoef(x2, y2)[0, 1]) < 1e-9


def test_similarity_over_edges_jaccard(ray_session):
    """Per-edge endpoint Jaccard vs a brute-force neighbor-set check."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from igraph_ray.graph import Graph
    from igraph_ray.ops.structural import similarity_over_edges

    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 0), (1, 4)]
    g = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, b in edges], pa.int64()),
        "dst": pa.array([b for a, b in edges], pa.int64())})), n=5)
    got = similarity_over_edges(g, method="jaccard").to_pandas()
    adj = {v: set() for v in range(5)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    assert len(got) == len(edges)
    for r in got.itertuples():
        inter = len(adj[r.lo] & adj[r.hi])
        union = len(adj[r.lo] | adj[r.hi])
        assert r.inter == inter
        assert r.sim_e6 == inter * 1_000_000 // union


def test_similarity_over_edges_triangle_free(ray_session):
    """A triangle-free graph leaves the intersection join side fully
    empty — blocks then carry no 'inter' column (the sf0.001 gate
    regression): every edge must still get inter=0 and the right
    Jaccard denominator."""
    import pyarrow as pa
    import ray.data

    from igraph_ray.graph import Graph
    from igraph_ray.ops.structural import similarity_over_edges

    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]  # C4: no triangles
    g = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, b in edges], pa.int64()),
        "dst": pa.array([b for a, b in edges], pa.int64())})), n=4)
    got = similarity_over_edges(g, method="jaccard").to_pandas()
    assert len(got) == 4
    assert got["inter"].tolist() == [0, 0, 0, 0]
    assert got["sim_e6"].tolist() == [0, 0, 0, 0]


def test_similarity_over_edges_plans_agree_skewed(ray_session):
    """Skewed fixture (hub with mid-range id): the broadcast and
    hash-join plans return identical rows, and the shipped (deg, id)
    orientation generates ZERO wedges at the hub — an id-ordered
    orientation would center ~m^2/4 wedge pairs on it."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from igraph_ray.algorithms.triangles import oriented_triangle_stream
    from igraph_ray.graph import Graph
    from igraph_ray.ops.structural import similarity_over_edges

    m = 400
    hub = m // 2  # adversarial: hub id sits mid-range
    edges = [(hub, v) for v in range(m + 1) if v != hub]
    edges.append((0, m))  # one closing triangle (hub, 0, m)
    ds = pa.table({
        "src": pa.array([a for a, b in edges], pa.int64()),
        "dst": pa.array([b for a, b in edges], pa.int64())})
    g = Graph(ray.data.from_arrow(ds), n=m + 1)

    fast = (similarity_over_edges(g, method="jaccard")
            .to_pandas().sort_values(["lo", "hi"]).reset_index(drop=True))
    slow = (similarity_over_edges(g, method="jaccard",
                                  broadcast_threshold=0)
            .to_pandas().sort_values(["lo", "hi"]).reset_index(drop=True))
    assert fast.equals(slow)
    # the closing triangle credits its three edges
    tri_edges = fast[fast["inter"] > 0]
    assert sorted(map(tuple, tri_edges[["lo", "hi"]].values.tolist())) == \
        [(0, hub), (0, m), (hub, m)]

    # wedge-boundedness: total wedges = sum_u C(outdeg(u), 2) over the
    # shipped orientation — the hub (highest (deg, id) rank) receives
    # every star edge, so only vertices 0 and m have outdeg 2
    und = g.canonical_undirected().materialize()
    _, oriented = oriented_triangle_stream(und, 4, return_oriented=True)
    od = (oriented.groupby("u").count().to_pandas()
          .set_index("u")["count()"])
    wedges = int((od * (od - 1) // 2).sum())
    assert wedges <= 2            # degree-oriented: O(1)
    id_wedges = hub * (m - hub)   # id-ordered plan would pay ~m^2/4
    assert id_wedges >= 40_000
