"""BFS / SSSP / path-length histogram vs an exact Dijkstra oracle.
Reference: igraph shortest paths (structural_properties.c:406-933) and
igraph_path_length_hist (structural_properties.c:293)."""

import numpy as np
import pytest

from igraph_ray import Graph
from igraph_ray.algorithms.paths import multi_source_hops, path_length_hist, sssp_hops
from tests.oracles import bfs_hops_ref


def _g(src, dst, n):
    return Graph.from_numpy(np.asarray(src, np.int64), np.asarray(dst, np.int64), n=n)


def _random(seed, n, m):
    rng = np.random.default_rng(seed)
    return rng.integers(0, n, m), rng.integers(0, n, m)


@pytest.mark.parametrize("seed,n,m", [(1, 50, 120), (2, 200, 600)])
def test_sssp_hops_matches_bfs(seed, n, m):
    src, dst = _random(seed, n, m)
    g = Graph.from_numpy(src, dst, n=n)
    res = sssp_hops(g, source=0, num_partitions=4)
    got = {r["vertex"]: r["dist"] for r in res.state.take_all()}
    ref = bfs_hops_ref(n, src, dst, 0)
    assert got == ref


def test_sssp_weighted():
    src = np.array([0, 0, 1, 2, 3])
    dst = np.array([1, 2, 3, 3, 4])
    w = np.array([1.0, 5.0, 1.0, 1.0, 2.0])
    g = Graph.from_numpy(src, dst, weight=w, n=5)
    res = sssp_hops(g, source=0, weighted=True, num_partitions=3)
    got = {r["vertex"]: r["dist"] for r in res.state.take_all()}
    ref = bfs_hops_ref(5, src, dst, 0, weight=w)
    assert set(got) == set(ref)
    for v in ref:
        assert got[v] == pytest.approx(ref[v])


def test_sssp_disconnected_and_chain():
    # chain 0->1->2, isolated 3
    g = Graph.from_numpy(np.array([0, 1]), np.array([1, 2]), n=4)
    res = sssp_hops(g, source=0, num_partitions=2)
    got = {r["vertex"]: r["dist"] for r in res.state.take_all()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_multi_source_matches_single():
    src, dst = _random(5, 80, 240)
    g = Graph.from_numpy(src, dst, n=80)
    sources = [0, 7, 33]
    ds = multi_source_hops(g, sources, num_partitions=4, chunk=2)
    got = {}
    for r in ds.take_all():
        got.setdefault(r["source"], {})[r["vertex"]] = r["dist"]
    for s in sources:
        assert got.get(s, {}) == bfs_hops_ref(80, src, dst, s)


def test_path_length_hist_exact():
    src, dst = _random(9, 40, 100)
    g = Graph.from_numpy(src, dst, n=40)
    t = path_length_hist(g, num_partitions=3, chunk=16)
    got = {d: c for d, c in zip(t["dist"].to_pylist(), t["count"].to_pylist())}
    ref = {}
    for s in range(40):
        for v, d in bfs_hops_ref(40, src, dst, s).items():
            if v != s:
                ref[d] = ref.get(d, 0) + 1
    assert got == ref


def test_subcomponent_modes():
    import numpy as np
    from igraph_ray.algorithms.paths import subcomponent
    # 0->1->2, 3->1, isolated-ish 4->5
    g = _g(np.array([0, 1, 3, 4]), np.array([1, 2, 1, 5]), n=6)
    out = sorted(r["vertex"] for r in subcomponent(g, 1, "out", num_partitions=2).take_all())
    assert out == [1, 2]
    inn = sorted(r["vertex"] for r in subcomponent(g, 1, "in", num_partitions=2).take_all())
    assert inn == [0, 1, 3]
    alls = sorted(r["vertex"] for r in subcomponent(g, 1, "all", num_partitions=2).take_all())
    assert alls == [0, 1, 2, 3]


def test_decompose_and_is_connected():
    import numpy as np
    from igraph_ray.algorithms.components import decompose_edges, is_connected
    g = _g(np.array([0, 1, 3, 4]), np.array([1, 2, 1, 5]), n=6)
    rows = decompose_edges(g, num_partitions=2).take_all()
    comp_of = {}
    for r in rows:
        comp_of[(r["src"], r["dst"])] = r["component"]
    # edges within {0,1,2,3} share one label; (4,5) another
    assert comp_of[(0, 1)] == comp_of[(1, 2)] == comp_of[(3, 1)]
    assert comp_of[(4, 5)] != comp_of[(0, 1)]
    assert not is_connected(g, "weak")
    g2 = _g(np.array([0, 1, 2]), np.array([1, 2, 0]), n=3)  # directed cycle
    assert is_connected(g2, "weak")
    assert is_connected(g2, "strong")
    g3 = _g(np.array([0, 1]), np.array([1, 2]), n=3)  # path, not strong
    assert is_connected(g3, "weak")
    assert not is_connected(g3, "strong")


def test_longest_path_layers():
    import pyarrow as pa
    import ray.data

    from igraph_ray.algorithms.paths import longest_path_layers
    from igraph_ray.graph import Graph

    # diamond + tail: layers are longest-path-from-source lengths
    e = ray.data.from_arrow(pa.table(
        {"src": pa.array([0, 0, 1, 2, 3], pa.int64()),
         "dst": pa.array([1, 2, 3, 3, 4], pa.int64())}))
    res = longest_path_layers(Graph(e, n=5), num_partitions=2)
    assert sorted((r["vertex"], r["layer"]) for r in res.state.take_all()) == \
        [(0, 0), (1, 1), (2, 1), (3, 2), (4, 3)]

    # agreement with an exact numpy longest-path sweep on a random DAG
    import numpy as np

    rng = np.random.default_rng(7)
    n = 60
    src = rng.integers(0, n - 1, 300)
    off = rng.integers(1, 6, 300)
    dst = np.minimum(src + off, n - 1)
    keep = src != dst
    s, d = src[keep], dst[keep]
    e2 = ray.data.from_arrow(pa.table({"src": pa.array(s, pa.int64()),
                                       "dst": pa.array(d, pa.int64())}))
    g = Graph(e2, n=n)
    res2 = longest_path_layers(g, num_partitions=4)
    mine = {r["vertex"]: r["layer"] for r in res2.state.take_all()}
    exp = np.zeros(n, dtype=np.int64)
    for v in range(n):  # vertex order IS topological (dst > src)
        m = s == v
        if m.any():
            np.maximum.at(exp, d[m], exp[v] + 1)
    assert mine == {v: int(exp[v]) for v in range(n)}

    # cycle raises
    e3 = ray.data.from_arrow(pa.table({"src": pa.array([0, 1, 2], pa.int64()),
                                       "dst": pa.array([1, 2, 0], pa.int64())}))
    import pytest

    with pytest.raises(ValueError):
        longest_path_layers(Graph(e3, n=3), num_partitions=2)


def test_neighborhood_sketches_exact_registers():
    """Converged HLL registers equal the brute-force max over each
    out-reachability ball, and the HLL estimate tracks the true ball
    size within the usual tolerance on a larger graph."""
    import hashlib

    import numpy as np

    from igraph_ray.algorithms.hll import M, neighborhood_sketches
    from igraph_ray.graph import Graph

    rng = np.random.default_rng(11)
    n, m = 60, 140
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    g = Graph.from_numpy(src, dst, n=n)
    st = neighborhood_sketches(g, num_partitions=4).state
    rows = {r["vertex"]: [r[f"r{b}"] for b in range(M)] for r in st.take_all()}

    adj = [set() for _ in range(n)]
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)

    def ball(v):
        seen, fr = {v}, [v]
        while fr:
            nxt = [w for u in fr for w in adj[u] if w not in seen]
            seen.update(nxt)
            fr = nxt
        return seen

    def reg(u):
        h = hashlib.md5(str(u).encode()).hexdigest()
        x = int(h[1:5], 16)
        return int(h[0], 16) % M, (17 if x == 0 else 16 - x.bit_length() + 1)

    rel_errs = []
    for v in range(n):
        want = [0] * M
        bl = ball(v)
        for u in bl:
            b, rho = reg(u)
            want[b] = max(want[b], rho)
        assert rows[v] == want, (v, rows[v], want)
        # Flajolet HLL estimate sanity (m=8 → ~37% std error)
        z = sum(2.0 ** -r for r in want)
        est = 0.6516 * M * M / z
        if len(bl) >= 8:
            rel_errs.append(abs(est - len(bl)) / len(bl))
    assert np.mean(rel_errs) < 0.6


class TestNegativeWeights:
    def test_bellman_ford_negative(self, ray_session):
        # DAG with a negative shortcut: 0->1 (5), 0->2 (1), 2->3 (1),
        # 3->1 (-4) => dist(1) = -2, not 5
        import pyarrow as pa
        import ray.data
        from igraph_ray.graph import Graph
        from igraph_ray.algorithms.paths import sssp_hops

        t = pa.table({"src": pa.array([0, 0, 2, 3], pa.int64()),
                      "dst": pa.array([1, 2, 3, 1], pa.int64()),
                      "weight": pa.array([5, 1, 1, -4], pa.int64())})
        g = Graph(ray.data.from_arrow(t), n=None, weighted=True)
        got = sssp_hops(g, source=0, weighted=True,
                        num_partitions=4).state.to_pandas()
        d = dict(zip(got.vertex, got.dist))
        assert d == {0: 0.0, 1: -2.0, 2: 1.0, 3: 2.0}

    def test_pagerank_clamp_unaffected(self, ray_session):
        # the out-CSR still clamps for PageRank consumers
        import pyarrow as pa
        import ray.data
        from igraph_ray.graph import Graph
        from igraph_ray.csr import fetch_block

        t = pa.table({"src": pa.array([0, 0], pa.int64()),
                      "dst": pa.array([1, 2], pa.int64()),
                      "weight": pa.array([3, -1], pa.int64())})
        g = Graph(ray.data.from_arrow(t), n=None, weighted=True)
        csr = g.csr_index("out", 2, weighted=True)  # default clamps
        ws = np.concatenate([fetch_block(r)["weight"]
                             for (_, _, r) in csr.block_descriptors()])
        assert (ws >= 0).all()
        csr2 = g.csr_index("out", 2, weighted=True, clamp_negative=False)
        ws2 = np.concatenate([fetch_block(r)["weight"]
                              for (_, _, r) in csr2.block_descriptors()])
        assert (ws2 == np.array([3.0, -1.0])).all()


class TestConvergenceDegree:
    def test_bruteforce(self, ray_session):
        import itertools
        import pyarrow as pa
        import ray.data
        from igraph_ray.graph import Graph
        from igraph_ray.algorithms.paths import convergence_degree

        edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 0), (1, 3)]
        n = 4
        # all-pairs BFS distances
        INF = 10**9
        d = {(i, j): (0 if i == j else INF) for i in range(n)
             for j in range(n)}
        for _ in range(n):
            for a, b in edges:
                for i in range(n):
                    if d[(i, a)] + 1 < d[(i, b)]:
                        d[(i, b)] = d[(i, a)] + 1
        ref = {}
        for u, v in edges:
            ins = sum(1 for i in range(n)
                      if d[(i, u)] < INF and d[(i, u)] + 1 == d[(i, v)])
            outs = sum(1 for t in range(n)
                       if d[(v, t)] < INF and d[(v, t)] + 1 == d[(u, t)])
            ref[(u, v)] = (ins, outs)
        g = Graph(ray.data.from_arrow(pa.table({
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64())})))
        got = convergence_degree(g, num_partitions=4).to_pandas()
        assert len(got) == len(edges)
        for r in got.itertuples():
            assert ref[(r.src, r.dst)] == (r.ins, r.outs), r


class TestWeightedMultiSource:
    def test_matches_bellman_ford(self, ray_session):
        import pyarrow as pa
        import ray.data
        from igraph_ray.graph import Graph
        from igraph_ray.algorithms.paths import multi_source_hops

        edges = [(0, 1, 4), (0, 2, 1), (2, 1, 1), (1, 3, 2), (2, 3, 7),
                 (3, 4, 1), (4, 0, 3)]
        t = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                      "dst": pa.array([e[1] for e in edges], pa.int64()),
                      "weight": pa.array([e[2] for e in edges], pa.int64())})
        g = Graph(ray.data.from_arrow(t), n=None, weighted=True)
        got = multi_source_hops(g, [0, 1, 2, 3, 4],
                                weighted=True).to_pandas()
        INF = 10**9
        d = {(i, j): (0 if i == j else INF) for i in range(5)
             for j in range(5)}
        for _ in range(5):
            for a, b, w in edges:
                for i in range(5):
                    if d[(i, a)] + w < d[(i, b)]:
                        d[(i, b)] = d[(i, a)] + w
        ref = {(i, j): v for (i, j), v in d.items() if v < INF}
        gotmap = {(r.source, r.vertex): r.dist for r in got.itertuples()}
        assert gotmap == ref


class TestJohnsonAPSP:
    """igraph_shortest_paths_johnson (structural_properties.c:5396):
    virtual-source potentials + reweighted non-negative sweep must
    equal plain Bellman-Ford from every source."""

    def _dag(self, seed, n, m):
        import pyarrow as pa
        import ray.data

        rng = np.random.default_rng(seed)
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        keep = src < dst  # acyclic => no negative cycles
        src, dst = src[keep], dst[keep]
        w = (src * 3 + dst) % 7 - 2
        t = pa.table({"src": pa.array(src, type=pa.int64()),
                      "dst": pa.array(dst, type=pa.int64()),
                      "weight": pa.array(w, type=pa.int64())})
        return Graph(ray.data.from_arrow(t), n=None, weighted=True), \
            src, dst, w

    def _bf_all_pairs(self, verts, src, dst, w):
        big = float("inf")
        out = {}
        for s in verts:
            d = {v: big for v in verts}
            d[s] = 0
            for _ in range(len(verts)):
                changed = False
                for u, v, wt in zip(src, dst, w):
                    if d[u] + wt < d[v]:
                        d[v] = d[u] + wt
                        changed = True
                if not changed:
                    break
            out[s] = {v: dv for v, dv in d.items() if dv < big}
        return out

    def test_johnson_matches_bellman_ford(self, ray_session):
        from igraph_ray.algorithms.paths import (johnson_apsp,
                                                 johnson_potentials)

        g, src, dst, w = self._dag(11, 40, 160)
        verts = sorted({int(r["vertex"]) for r in g.vertices().take_all()})
        ref = self._bf_all_pairs(verts, src, dst, w)

        # potentials make every reweighted edge non-negative
        h = {r["vertex"]: r["h"]
             for r in johnson_potentials(g, num_partitions=3).take_all()}
        assert all(wt + h[u] - h[v] >= 0 for u, v, wt in zip(src, dst, w))
        assert all(hv <= 0 for hv in h.values())

        got = {}
        for r in johnson_apsp(g, num_partitions=3, chunk=16).take_all():
            got.setdefault(int(r["source"]), {})[int(r["vertex"])] = \
                int(r["dist"])
        assert got == ref
