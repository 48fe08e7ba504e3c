"""Random-graph generators (games.c analogue): exact structural
invariants + partition-layout-independent determinism."""

from __future__ import annotations

import numpy as np
import pytest

from igraph_ray.sources import games


def _pairs(ds):
    t = ds.to_pandas()
    return list(zip(t["src"].astype(int), t["dst"].astype(int)))


def test_gnp_counts_and_determinism():
    n, p = 400, 0.01
    a = _pairs(games.erdos_renyi_gnp(n, p, seed=5, num_partitions=3))
    b = _pairs(games.erdos_renyi_gnp(n, p, seed=5, num_partitions=7))
    assert sorted(a) == sorted(b)  # layout-independent
    c = _pairs(games.erdos_renyi_gnp(n, p, seed=6, num_partitions=3))
    assert sorted(a) != sorted(c)
    m = len(a)
    exp = n * (n - 1) * p
    sd = (n * (n - 1) * p * (1 - p)) ** 0.5
    assert abs(m - exp) < 6 * sd
    assert all(s != d and 0 <= s < n and 0 <= d < n for s, d in a)
    assert len(set(a)) == m  # distinct by construction


def test_gnm_exact_count():
    n, m = 300, 5000
    a = _pairs(games.erdos_renyi_gnm(n, m, seed=1, num_partitions=4))
    assert len(a) == m
    assert len(set(a)) == m
    assert all(s != d for s, d in a)
    b = _pairs(games.erdos_renyi_gnm(n, m, seed=1, num_partitions=2))
    assert sorted(a) == sorted(b)


def test_gnm_full_space():
    n = 12
    m = n * (n - 1)
    a = _pairs(games.erdos_renyi_gnm(n, m, seed=3, num_partitions=2))
    assert sorted(a) == sorted((i, j) for i in range(n) for j in range(n) if i != j)
    with pytest.raises(ValueError):
        games.erdos_renyi_gnm(n, m + 1, seed=3)


def test_watts_strogatz():
    n, k = 500, 3
    a = _pairs(games.watts_strogatz(n, k, p=0.0, seed=2, num_partitions=3))
    assert sorted(a) == sorted((v, (v + j) % n) for v in range(n) for j in range(1, k + 1))
    b = _pairs(games.watts_strogatz(n, k, p=0.2, seed=2, num_partitions=3))
    assert len(b) == n * k
    rewired = len(set(b) - set(a))
    assert 0.1 * n * k < rewired < 0.3 * n * k  # ~20% rewired
    assert all(s != d for s, d in b)


def test_degree_sequence_game():
    rng = np.random.default_rng(0)
    outd = rng.integers(0, 6, 200)
    ind = np.zeros_like(outd)
    # a valid in-sequence with the same total
    tot = outd.sum()
    idx = rng.integers(0, 200, tot)
    np.add.at(ind, idx, 1)
    ds = games.degree_sequence_game(outd, ind, seed=4, num_partitions=3)
    t = ds.to_pandas()
    np.testing.assert_array_equal(np.bincount(t["src"], minlength=200), outd)
    np.testing.assert_array_equal(np.bincount(t["dst"], minlength=200), ind)


def test_static_power_law():
    n, m = 1000, 20000
    ds = games.static_power_law(n, m, seed=9, num_partitions=4)
    t = ds.to_pandas()
    assert len(t) == m
    assert t["src"].between(0, n - 1).all() and t["dst"].between(0, n - 1).all()
    # heavy head: top-1% of vertices take a disproportionate share
    top = int(n * 0.01)
    share = (t["src"] < top).mean()
    assert share > 0.05  # uniform would give 0.01


def test_preference_game():
    from igraph_ray.sources.games import preference_game

    pref = [[0.3, 0.0], [0.02, 0.25]]
    edges, types = preference_game(200, [0.5, 0.5], pref, seed=7,
                                   num_partitions=4)
    ty = {r["vertex"]: r["type"] for r in types.take_all()}
    assert len(ty) == 200
    assert sum(1 for t in ty.values() if t == 0) == 100
    rows = [(r["src"], r["dst"]) for r in edges.take_all()]
    assert len(rows) == len(set(rows))            # no duplicate pairs
    assert all(s != d for s, d in rows)           # no loops
    # zero-probability block really is empty (type0 -> type1)
    assert not any(ty[s] == 0 and ty[d] == 1 for s, d in rows)
    # densities land near their block probabilities
    import collections
    cnt = collections.Counter((ty[s], ty[d]) for s, d in rows)
    assert abs(cnt[(0, 0)] / (100 * 99) - 0.3) < 0.05
    assert abs(cnt[(1, 1)] / (100 * 99) - 0.25) < 0.05
    assert abs(cnt[(1, 0)] / (100 * 100) - 0.02) < 0.01
    # identical multiset at different parallelism
    e2, _ = preference_game(200, [0.5, 0.5], pref, seed=7, num_partitions=2)
    rows2 = sorted((r["src"], r["dst"]) for r in e2.take_all())
    assert sorted(rows) == rows2


def test_deterministic_structures():
    """star/ring/tree/full generators: exact edge sets (structure_generators.c)."""
    from igraph_ray.sources import structures as sg

    star = sorted((r["src"], r["dst"]) for r in sg.star(5, "out").take_all())
    assert star == [(0, i) for i in range(1, 5)]
    star_in = sorted((r["src"], r["dst"]) for r in sg.star(4, "in").take_all())
    assert star_in == [(i, 0) for i in range(1, 4)]

    ring = sorted((r["src"], r["dst"]) for r in sg.ring(4).take_all())
    assert ring == [(0, 1), (1, 2), (2, 3), (3, 0)]
    path = sorted((r["src"], r["dst"]) for r in sg.ring(4, circular=False).take_all())
    assert path == [(0, 1), (1, 2), (2, 3)]

    tr = sorted((r["src"], r["dst"]) for r in sg.tree(7, children=2).take_all())
    assert tr == [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5), (2, 6)]

    fu = sorted((r["src"], r["dst"]) for r in sg.full(4, directed=False).take_all())
    assert fu == [(a, b) for a in range(4) for b in range(4) if a < b]
    fd = sg.full(4, directed=True).count()
    assert fd == 12


def test_de_bruijn_and_lattice():
    from igraph_ray.sources import structures as sg

    db = sorted((r["src"], r["dst"]) for r in sg.de_bruijn(2, 2).take_all())
    assert db == sorted((v, (2 * v + j) % 4) for v in range(4) for j in (0, 1))

    lat = sorted((r["src"], r["dst"]) for r in sg.lattice2d(2, 3).take_all())
    assert lat == sorted([(0, 1), (1, 2), (3, 4), (4, 5), (0, 3), (1, 4), (2, 5)])
    tor = sg.lattice2d(3, 3, circular=True)
    assert tor.count() == 18  # 2 edges per vertex on a torus


def test_barabasi_structure_and_determinism():
    """Position-pointer BA: targets strictly earlier, min(v,m) edges per
    vertex, hub skew, and bit-identical reruns (any parallelism)."""
    from igraph_ray.sources.games import barabasi_game

    df = barabasi_game(2000, m=2, seed=11).to_pandas()
    assert (df["dst"] < df["src"]).all()
    counts = df.groupby("src").size()
    assert counts.max() <= 2
    assert len(df) == sum(min(v, 2) for v in range(2000))
    deg = np.bincount(np.concatenate([df["src"], df["dst"]]),
                      minlength=2000)
    # preferential attachment concentrates degree on early vertices
    assert deg[:20].mean() > 8 * deg[1000:].mean()
    df2 = barabasi_game(2000, m=2, seed=11).to_pandas()
    assert df2.equals(df)


def test_callaway_traits_structure():
    from igraph_ray.sources.games import callaway_traits_game

    ds = callaway_traits_game(100, types=2, edges_per_step=2,
                              type_dist=(3, 1),
                              pref_e6=((700000, 200000), (200000, 500000)),
                              seed=11, num_partitions=4)
    df = ds.to_pandas()
    # endpoints of a step-i trial are uniform over 0..i <= 99
    assert df.src.max() < 100 and df.dst.max() < 100
    assert len(df) <= 2 * 99  # at most edges_per_step per step
    # determinism across parallelism
    df2 = callaway_traits_game(100, types=2, edges_per_step=2,
                               type_dist=(3, 1),
                               pref_e6=((700000, 200000), (200000, 500000)),
                               seed=11, num_partitions=1).to_pandas()
    key = lambda d: sorted(map(tuple, d.values.tolist()))
    assert key(df) == key(df2)


def test_establishment_structure():
    from igraph_ray.sources.games import establishment_game

    ds = establishment_game(80, types=2, k=3, type_dist=(1, 2),
                            pref_e6=((800000, 100000), (100000, 600000)),
                            seed=13, num_partitions=4)
    df = ds.to_pandas()
    # src is always the new vertex (>= k), targets strictly older
    assert (df.src >= 3).all()
    assert (df.dst < df.src).all()
    assert len(df) <= 3 * 77


def test_sbm_structure_and_determinism():
    from igraph_ray.sources.games import sbm_game

    sizes = (20, 30, 14)
    pref = ((600000, 30000, 0), (30000, 500000, 20000), (0, 20000, 700000))
    df = sbm_game(sizes, pref, seed=3, num_partitions=4).to_pandas()
    n = sum(sizes)
    assert (df.src < df.dst).all()
    assert df.dst.max() < n
    # zero-rate block pair (0, 2) produces NO edges
    assert not (((df.src < 20) & (df.dst >= 50))).any()
    # dense intra-block-2 (p=0.7 over C(14,2)=91 pairs): binomial 5-sigma
    m2 = ((df.src >= 50) & (df.dst >= 50)).sum()
    assert abs(m2 - 91 * 0.7) < 5 * (91 * 0.7 * 0.3) ** 0.5
    df2 = sbm_game(sizes, pref, seed=3, num_partitions=1).to_pandas()
    key = lambda d: sorted(map(tuple, d.values.tolist()))
    assert key(df) == key(df2)


def test_dot_product_structure_and_determinism():
    import numpy as np
    from igraph_ray.sources.games import dot_product_game

    n, dim, mod = 64, 4, 700
    df = dot_product_game(n, dim=dim, mod=mod, seed=5,
                          num_partitions=4).to_pandas()
    assert (df.src < df.dst).all() and df.dst.max() < n
    # pairs with dot >= 1 connect unconditionally (reference contract)
    d = np.arange(dim, dtype=np.int64)
    pos = (np.arange(n, dtype=np.int64)[:, None] * 7919 + d * 104729) % mod
    got = set(map(tuple, df.values.tolist()))
    forced = [(i, j) for i in range(n) for j in range(i + 1, n)
              if int((pos[i] * pos[j]).sum()) >= 1_000_000]
    assert forced and all(p in got for p in forced)
    df2 = dot_product_game(n, dim=dim, mod=mod, seed=5,
                           num_partitions=1).to_pandas()
    key = lambda dd: sorted(map(tuple, dd.values.tolist()))
    assert key(df) == key(df2)


def test_hsbm_structure_and_determinism():
    from igraph_ray.sources.games import hsbm_game

    df = hsbm_game(n=64, m=16, rho_sizes=(8, 8),
                   c_e6=((900000, 100000), (100000, 700000)),
                   p_e6=0, seed=2, num_partitions=4).to_pandas()
    # p=0: no inter-block edges at all
    assert ((df.src // 16) == (df.dst // 16)).all()
    # dense first cluster of block 0 (p=0.9 over C(8,2)=28 pairs)
    import numpy as np
    m0 = ((df.src < 8) & (df.dst < 8)).sum()
    assert abs(m0 - 28 * 0.9) < 5 * (28 * 0.9 * 0.1) ** 0.5
    df2 = hsbm_game(n=64, m=16, rho_sizes=(8, 8),
                    c_e6=((900000, 100000), (100000, 700000)),
                    p_e6=0, seed=2, num_partitions=1).to_pandas()
    key = lambda d: sorted(map(tuple, d.values.tolist()))
    assert key(df) == key(df2)


def test_forest_fire_structure():
    from igraph_ray.sources.games import forest_fire_game

    df = forest_fire_game(200, fw_prob=0.35, bw_factor=0.6,
                          seed=4).to_pandas()
    # every edge goes from a newer vertex to an older one
    assert (df.dst < df.src).all()
    # every vertex >= 1 links at least its ambassador
    assert set(df.src.unique()) == set(range(1, 200))
    # no duplicate edges within a vertex's burn
    assert not df.duplicated().any()
    # fire spreads: more edges than the pure-ambassador tree
    assert len(df) > 199
    # determinism
    df2 = forest_fire_game(200, fw_prob=0.35, bw_factor=0.6,
                           seed=4).to_pandas()
    assert df.values.tolist() == df2.values.tolist()


def test_forest_fire_zero_prob_is_tree():
    from igraph_ray.sources.games import forest_fire_game

    df = forest_fire_game(100, fw_prob=0.0, seed=1).to_pandas()
    assert len(df) == 99
    assert (df.src.value_counts() == 1).all()


def test_famous_structural_invariants():
    from igraph_ray.sources.structures import FAMOUS, famous

    import collections

    def degs(name):
        nv, e = FAMOUS[name]()
        d = collections.Counter()
        for a, b in e:
            d[a] += 1
            d[b] += 1
        return nv, e, d

    nv, e, d = degs("petersen")
    assert nv == 10 and len(e) == 15 and set(d.values()) == {3}
    # petersen girth 5: no triangles, no C4 (distinct neighbors share
    # at most one common neighbor... check no common pair adjacency)
    nbr = {v: set() for v in range(10)}
    for a, b in e:
        nbr[a].add(b)
        nbr[b].add(a)
    assert all(not (nbr[a] & nbr[b]) for a, b in e)  # triangle-free
    nv, e, d = degs("cubical")
    assert nv == 8 and set(d.values()) == {3}
    nv, e, d = degs("octahedral")
    assert nv == 6 and set(d.values()) == {4}
    # dataset surface
    t = famous("bull").take_all()
    assert len(t) == 5


class TestCitedType:
    def test_structure(self, ray_session):
        from igraph_ray.sources.games import cited_type_game

        df = cited_type_game(100, (5, 1, 3), 3, edges_per_step=2,
                             seed=17).to_pandas()
        assert len(df) == 99 * 2
        assert (df.dst < df.src).all()          # cites earlier only
        assert (df.src >= 1).all()

    def test_preference_bias(self, ray_session):
        from igraph_ray.sources.games import cited_type_game

        df = cited_type_game(600, (10, 1, 1), 3, edges_per_step=3,
                             seed=5).to_pandas()
        by_type = df.dst.mod(3).value_counts()
        # type 0 carries 10/12 of the mass
        assert by_type.get(0, 0) > 4 * (by_type.get(1, 0) +
                                        by_type.get(2, 0)) / 2

    def test_citing_rows_constant_equals_cited(self, ray_session):
        from igraph_ray.sources.games import (cited_type_game,
                                              citing_cited_type_game)

        a = cited_type_game(80, (2, 3), 2, edges_per_step=2,
                            seed=9).to_pandas().sort_values(
            ["src", "dst"]).reset_index(drop=True)
        b = citing_cited_type_game(80, [[2, 3], [2, 3]], 2,
                                   edges_per_step=2,
                                   seed=9).to_pandas().sort_values(
            ["src", "dst"]).reset_index(drop=True)
        assert a.values.tolist() == b.values.tolist()

    def test_citing_rows_differ(self, ray_session):
        from igraph_ray.sources.games import citing_cited_type_game

        # citing type 0 cites only type 1 and vice versa
        df = citing_cited_type_game(
            200, [[0, 1], [1, 0]], 2, edges_per_step=1,
            seed=3).to_pandas()
        assert ((df.src % 2) != (df.dst % 2)).all()

    def test_parallelism_invariance(self, ray_session):
        from igraph_ray.sources.games import cited_type_game

        a = cited_type_game(150, (5, 1, 3), 3, edges_per_step=2, seed=17,
                            num_partitions=2).to_pandas().sort_values(
            ["src", "dst"]).reset_index(drop=True)
        b = cited_type_game(150, (5, 1, 3), 3, edges_per_step=2, seed=17,
                            num_partitions=11).to_pandas().sort_values(
            ["src", "dst"]).reset_index(drop=True)
        assert a.values.tolist() == b.values.tolist()


class TestBipartiteGames:
    def test_gnp_structure(self, ray_session):
        from igraph_ray.sources.games import bipartite_gnp

        df = bipartite_gnp(20, 30, 200_000, seed=3).to_pandas()
        assert df.src.between(0, 19).all()
        assert df.dst.between(20, 49).all()
        # ~p fraction of the 600 pairs
        assert 60 < len(df) < 180

    def test_gnm_exact_count_and_dedup(self, ray_session):
        from igraph_ray.sources.games import bipartite_gnm

        df = bipartite_gnm(20, 30, 123, seed=5).to_pandas()
        assert len(df) == 123
        assert not df.duplicated().any()
        assert df.src.between(0, 19).all()
        assert df.dst.between(20, 49).all()

    def test_full_bipartite(self, ray_session):
        from igraph_ray.sources.games import full_bipartite

        df = full_bipartite(4, 5).to_pandas()
        assert len(df) == 20
        assert set(zip(df.src, df.dst)) == {
            (i, 4 + j) for i in range(4) for j in range(5)}

    def test_gnp_parallelism_invariance(self, ray_session):
        from igraph_ray.sources.games import bipartite_gnp

        a = bipartite_gnp(25, 25, 300_000, seed=7,
                          num_partitions=2).to_pandas().sort_values(
            ["src", "dst"]).reset_index(drop=True)
        b = bipartite_gnp(25, 25, 300_000, seed=7,
                          num_partitions=9).to_pandas().sort_values(
            ["src", "dst"]).reset_index(drop=True)
        assert a.values.tolist() == b.values.tolist()


class TestSequentialGrowthGames:
    """recent_degree / lastcit / barabasi_aging vs LITERAL psumtree-order
    replicas of the reference loops (games.c:1574, 3033, 1732) using the
    same md5 draws — validates the engines' closed-form/event-based
    weight maintenance on settings the driver gate does not pin
    (outpref=True, edges_per_node=2, aging_exp=0)."""

    @staticmethod
    def _pick(w, draw):
        cum = 0
        s = int(sum(w))
        for v, wv in enumerate(w):
            cum += int(wv)
            if draw * s <= (1 << 32) * cum:
                return v
        raise AssertionError("roulette fell off the end")

    def test_recent_degree_vs_replica(self, ray_session):
        from igraph_ray.sources.games import recent_degree_game, _draw32

        n, m, W, za, seed = 40, 2, 3, 1, 5
        for outpref in (False, True):
            # literal replica: degree[] + history queue with -1 markers
            degree = [0] * n
            hist = [-1]
            edges = []
            for i in range(1, n):
                if i >= W:
                    while True:
                        j = hist.pop(0)
                        if j == -1:
                            break
                        degree[j] -= 1
                w = [degree[v] + za for v in range(i)]
                picks = [self._pick(w, _draw32(seed, "rd", i, j))
                         for j in range(m)]
                for to in picks:
                    degree[to] += 1
                    edges.append((i, to))
                    hist.append(to)
                hist.append(-1)
                if outpref:
                    degree[i] += m  # never queued: never expires
            got = recent_degree_game(
                n, m=m, window=W, zero_appeal=za, outpref=outpref,
                seed=seed).to_pandas()
            assert sorted(zip(got.src, got.dst)) == sorted(edges), outpref

    def test_lastcit_vs_replica(self, ray_session):
        from igraph_ray.sources.games import lastcit_game, _draw32

        n, eps, A, seed = 40, 2, 3, 9
        pref = [5, 3, 2, 1]
        bw = n // A + 1
        # literal replica: per-vertex weight array updated in the
        # reference's event order (in-step updates included)
        w = [0.0] * n
        lastcit = [0] * n
        w[0] = pref[A]
        edges = []
        for i in range(1, n):
            for j in range(eps):
                to = self._pick(w[:i], _draw32(seed, "lc", i, j))
                edges.append((i, to))
                lastcit[to] = i + 1
                w[to] = pref[0]
            w[i] = pref[A]
            k = 1
            while i - bw * k >= 1:
                sh = i - bw * k
                # vertices last cited at step sh move to pref[k]
                for v in range(i):
                    if lastcit[v] == sh + 1:
                        w[v] = pref[k]
                k += 1
        got = lastcit_game(n, edges_per_node=eps, agebins=A,
                           preference=pref, seed=seed).to_pandas()
        assert sorted(zip(got.src, got.dst)) == sorted(edges)

    def test_barabasi_aging_vs_replica(self, ray_session):
        from igraph_ray.sources.games import barabasi_aging_game, _draw32
        from fractions import Fraction

        n, m, ab, seed = 40, 2, 3, 7
        bw = n // ab + 1
        for aging_exp, outpref in ((-1, False), (0, False), (-1, True)):
            def agefac(a):
                return Fraction(1, a + 1) if aging_exp == -1 else \
                    Fraction(1)

            w = [Fraction(0)] * n
            deg = [0] * n
            w[0] = Fraction(1)  # zda*(1+zaa) = 1
            edges = []
            for i in range(1, n):
                ws = w[:i]
                s = sum(ws)
                picks = []
                for j in range(m):
                    d = _draw32(seed, "ba", i, j)
                    cum = Fraction(0)
                    for v in range(i):
                        cum += ws[v]
                        if d * s <= (1 << 32) * cum:
                            picks.append(v)
                            break
                for to in picks:
                    deg[to] += 1
                    edges.append((i, to))
                for to in picks:
                    age = (i - to) // bw
                    w[to] = (deg[to] + 1) * agefac(age)
                if outpref:
                    deg[i] += m
                    w[i] = Fraction(deg[i] + 1)
                else:
                    w[i] = Fraction(1)
                k = 1
                while i - bw * k >= 0:
                    sh = i - bw * k
                    w[sh] = (deg[sh] + 1) * agefac(k + 1)
                    k += 1
            got = barabasi_aging_game(
                n, m=m, aging_bin=ab, aging_exp=aging_exp,
                outpref=outpref, seed=seed).to_pandas()
            assert sorted(zip(got.src, got.dst)) == sorted(edges), \
                (aging_exp, outpref)

    def test_guards(self, ray_session):
        import pytest as _pt

        from igraph_ray.sources.games import (
            barabasi_aging_game, lastcit_game, recent_degree_game,
        )

        with _pt.raises(NotImplementedError):
            recent_degree_game(10, zero_appeal=0)
        with _pt.raises(NotImplementedError):
            lastcit_game(10, preference=[1, 1, 0])
        # general exponents are now served by the float-roulette path
        # (round-5); the n ceiling still guards the sequential contract
        with _pt.raises(NotImplementedError):
            barabasi_aging_game((1 << 22) + 1, aging_exp=-2)
        assert barabasi_aging_game(10, aging_exp=-2).count() == 9


class TestRecentDegreeAging:
    """recent_degree_aging vs a LITERAL transcription of
    games.c:1888's psumtree event order (Fraction weights, no LCM
    scaling): window expiry pops before the draws, post-draw citation
    updates, insertion, then the (age+2) boundary sweeps."""

    def test_vs_replica(self, ray_session):
        from fractions import Fraction

        from igraph_ray.sources.games import (_draw32,
                                              recent_degree_aging_game)

        n, m, ab, W, za, seed = 40, 2, 3, 3, 1, 11
        bw = n // ab + 1
        for aging_exp, outpref in ((-1, False), (0, False), (-1, True)):
            def agefac(a):
                return Fraction(1, a + 1) if aging_exp == -1 else \
                    Fraction(1)

            w = [Fraction(0)] * n
            deg = [0] * n
            w[0] = Fraction(za)
            hist = [-1]
            edges = []
            for i in range(1, n):
                if i >= W:
                    while True:
                        j = hist.pop(0)
                        if j == -1:
                            break
                        deg[j] -= 1
                        w[j] = (deg[j] + za) * agefac((i - j) // bw)
                ws = w[:i]
                s = sum(ws)
                picks = []
                for j in range(m):
                    d = _draw32(seed, "rda", i, j)
                    cum = Fraction(0)
                    for v in range(i):
                        cum += ws[v]
                        if d * s <= (1 << 32) * cum:
                            picks.append(v)
                            break
                for to in picks:
                    deg[to] += 1
                    edges.append((i, to))
                    hist.append(to)
                hist.append(-1)
                for to in picks:
                    w[to] = (deg[to] + za) * agefac((i - to) // bw)
                if outpref:
                    deg[i] += m
                    w[i] = Fraction(deg[i] + za)
                else:
                    w[i] = Fraction(za)
                k = 1
                while i - bw * k >= 0:
                    sh = i - bw * k
                    w[sh] = (deg[sh] + za) * agefac(k + 1)
                    k += 1
            got = recent_degree_aging_game(
                n, m=m, aging_bin=ab, time_window=W, zero_appeal=za,
                aging_exp=aging_exp, outpref=outpref,
                seed=seed).to_pandas()
            assert sorted(zip(got.src, got.dst)) == sorted(edges), \
                (aging_exp, outpref)


def test_k_regular_degrees_and_determinism():
    n, k = 40, 3
    a = _pairs(games.k_regular_game(n, k, seed=41))
    b = _pairs(games.k_regular_game(n, k, seed=41))
    assert sorted(a) == sorted(b)
    assert len(a) == n * k // 2
    deg = np.zeros(n, dtype=int)
    for s, d in a:
        deg[s] += 1
        deg[d] += 1
    assert (deg == k).all()  # loops count 2: stub conservation holds
    with pytest.raises(ValueError):
        games.k_regular_game(5, 3)  # odd stub count


def test_static_fitness_counts_and_bias():
    n, m = 30, 600
    fo = [1 + v % 7 for v in range(n)]
    fi = [1 + (v * v) % 5 for v in range(n)]
    a = _pairs(games.static_fitness_game(m, fo, fi, seed=43))
    assert len(a) == m
    b = _pairs(games.static_fitness_game(m, fo, fi, seed=43))
    assert sorted(a) == sorted(b)
    # expected out-degree proportional to out-fitness: compare the
    # highest-fitness vertex class against the lowest, 600 draws
    so = sum(fo)
    outdeg = np.zeros(n, dtype=int)
    for s, _ in a:
        outdeg[s] += 1
    hi = [v for v in range(n) if fo[v] == 7]
    lo = [v for v in range(n) if fo[v] == 1]
    exp_hi = m * 7 / so
    assert abs(np.mean([outdeg[v] for v in hi]) - exp_hi) < 4 * np.sqrt(exp_hi)
    assert np.mean([outdeg[v] for v in hi]) > np.mean(
        [outdeg[v] for v in lo])


def test_asymmetric_preference_respects_types():
    n = 36
    td = [[0.3, 0.2], [0.1, 0.4]]
    # forbid any edge whose (out(u), in(v)) is (0, 1): thr 0
    pref = [[500_000, 0], [300_000, 200_000]]
    edges, types = games.asymmetric_preference_game(n, td, pref, seed=47)
    tp = types.to_pandas().set_index("vertex")
    for s, d in _pairs(edges):
        assert s != d
        assert not (tp.loc[s, "out_type"] == 0 and tp.loc[d, "in_type"] == 1)
    # joint block sizes are the floor proportions
    import collections

    cnt = collections.Counter(
        (int(r.in_type), int(r.out_type)) for r in tp.itertuples())
    assert sum(cnt.values()) == n
    assert cnt[(1, 1)] >= cnt[(1, 0)]  # 0.4 block at least as big as 0.1


def test_nonlinear_barabasi_rich_get_richer():
    n, m = 48, 2
    a = _pairs(games.nonlinear_barabasi_game(n, m, power=2, seed=53))
    assert len(a) == (n - 1) * m
    assert all(d < s for s, d in a)  # cites only older vertices
    b = _pairs(games.nonlinear_barabasi_game(n, m, power=2, seed=53))
    assert a == b
    # super-linear PA concentrates: the max in-degree should exceed the
    # uniform-attachment expectation by a wide margin
    indeg = np.zeros(n, dtype=int)
    for _, d in a:
        indeg[d] += 1
    assert indeg.max() >= 8
