"""Triad census vs an INDEPENDENT brute-force classifier.

The engine classifies via the orbit-closure lookup table built from the
motifs.c:983-1013 exemplars; this oracle classifies every triple from
first principles — MAN dyad counts (mut/asym/null) plus the documented
D/U/C and T/C structural distinctions — so a mislabeled lookup entry
cannot self-confirm."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.ops.census import TRIAD_NAMES, motifs3, triad_census, _CENSUS_TO_ISOCLASS


def _classify_triple(E, t):
    """E: set of directed edges; t: triple (3 vertices). Returns class
    name from the documented rules."""
    a, b, c = t
    dyads = []
    for (x, y) in ((a, b), (a, c), (b, c)):
        fwd, bwd = (x, y) in E, (y, x) in E
        if fwd and bwd:
            dyads.append(("m", x, y))
        elif fwd:
            dyads.append(("a", x, y))
        elif bwd:
            dyads.append(("a", y, x))
        else:
            dyads.append(("n", x, y))
    m = sum(1 for d in dyads if d[0] == "m")
    asym = [d for d in dyads if d[0] == "a"]
    na = len(asym)
    if (m, na) == (0, 0):
        return "003"
    if (m, na) == (0, 1):
        return "012"
    if (m, na) == (1, 0):
        return "102"
    if (m, na) == (0, 2):
        s = {asym[0][1], asym[1][1]}
        tg = {asym[0][2], asym[1][2]}
        if len(s) == 1:
            return "021D"      # common source: out-star
        if len(tg) == 1:
            return "021U"      # common target: in-star
        return "021C"
    if (m, na) == (1, 1):
        mut = next(d for d in dyads if d[0] == "m")
        pair = {mut[1], mut[2]}
        return "111D" if asym[0][2] in pair else "111U"
    if (m, na) == (0, 3):
        outdeg = {v: 0 for v in t}
        for (_, x, y) in asym:
            outdeg[x] += 1
        return "030C" if all(v == 1 for v in outdeg.values()) else "030T"
    if (m, na) == (2, 0):
        return "201"
    if (m, na) == (1, 2):
        s = {asym[0][1], asym[1][1]}
        tg = {asym[0][2], asym[1][2]}
        if len(s) == 1:
            return "120D"
        if len(tg) == 1:
            return "120U"
        return "120C"
    if (m, na) == (2, 1):
        return "210"
    assert (m, na) == (3, 0)
    return "300"


def _brute_census(src, dst, n):
    E = set(zip(src.tolist(), dst.tolist()))
    counts = {nm: 0 for nm in TRIAD_NAMES}
    for t in itertools.combinations(range(n), 3):
        counts[_classify_triple(E, t)] += 1
    return counts


def _census_dict(table: pa.Table):
    return {nm: int(cv) for nm, cv in zip(table["name"].to_pylist(),
                                          table["count"].to_pylist())}


@pytest.mark.parametrize("seed,n,m", [(1, 25, 80), (2, 40, 260), (3, 18, 40)])
def test_triad_census_random(seed, n, m):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = Graph(ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})), n=n)
    got = _census_dict(triad_census(g, num_partitions=3))
    want = _brute_census(src, dst, n)
    assert got == want
    assert sum(got.values()) == n * (n - 1) * (n - 2) // 6


def test_triad_census_exemplars():
    # each documented 3-vertex exemplar graph censuses to exactly itself
    from igraph_ray.ops.census import _EXEMPLARS

    for name, edges in zip(TRIAD_NAMES, _EXEMPLARS):
        if not edges:
            continue
        src = pa.array([e[0] for e in edges], pa.int64())
        dst = pa.array([e[1] for e in edges], pa.int64())
        g = Graph(ray.data.from_arrow(pa.table({"src": src, "dst": dst})), n=3)
        got = _census_dict(triad_census(g, num_partitions=2))
        assert got[name] == 1, (name, got)
        assert sum(got.values()) == 1


def test_triad_census_multigraph_and_loops_simplified():
    # duplicates + loops must not change the census (simple-graph domain)
    edges = pa.table({"src": pa.array([0, 0, 0, 1, 2, 2], pa.int64()),
                      "dst": pa.array([1, 1, 0, 2, 1, 1], pa.int64())})
    g = Graph(ray.data.from_arrow(edges), n=3)
    got = _census_dict(triad_census(g, num_partitions=2))
    want = _brute_census(np.array([0, 1, 2]), np.array([1, 2, 1]), 3)
    assert got == want


def test_motifs3_mapping():
    rng = np.random.default_rng(9)
    n, m = 30, 160
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = Graph(ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})), n=n)
    census = triad_census(g, num_partitions=3)
    moto = motifs3(g, num_partitions=3)
    cvals = census["count"].to_pylist()
    got = dict(zip(moto["isoclass"].to_pylist(), moto["count"].to_pylist()))
    for c_idx, m_idx in enumerate(_CENSUS_TO_ISOCLASS):
        if m_idx in (0, 1, 3):
            assert m_idx not in got or c_idx in (0, 1, 2)
        else:
            assert got[m_idx] == cvals[c_idx]


def _motifs4_brute(n, src, dst):
    adj = [set() for _ in range(n)]
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    cnt = {"path4": 0, "star3": 0, "cycle4": 0, "paw": 0, "diamond": 0, "k4": 0}
    for q in itertools.combinations(range(n), 4):
        e = sum(1 for x, y in itertools.combinations(q, 2) if y in adj[x])
        degs = sorted(sum(1 for y in q if y in adj[x]) for x in q)
        if e == 3 and degs == [1, 1, 1, 3]:
            cnt["star3"] += 1
        elif e == 3 and degs == [1, 1, 2, 2]:
            cnt["path4"] += 1
        elif e == 4 and degs == [2, 2, 2, 2]:
            cnt["cycle4"] += 1
        elif e == 4 and degs == [1, 2, 2, 3]:
            cnt["paw"] += 1
        elif e == 5:
            cnt["diamond"] += 1
        elif e == 6:
            cnt["k4"] += 1
    return cnt


@pytest.mark.parametrize("seed,n,m", [(1, 20, 50), (2, 24, 40), (3, 16, 60)])
def test_motifs4_random(seed, n, m):
    """All six induced size-4 counts vs brute-force enumeration of every
    4-subset (validates the Möbius inversion in ops.census.motifs4)."""
    from igraph_ray.ops.census import motifs4

    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    g = Graph.from_numpy(src, dst, n=n)
    got = {k: v[0] for k, v in motifs4(g, num_partitions=4).to_pydict().items()}
    want = _motifs4_brute(n, src, dst)
    assert got == want


def test_motifs3_estimate_full_sample_exact():
    """sample_prob=1.0 reproduces the exact census (motifs.c:427 with
    sample = all vertices)."""
    from igraph_ray.ops.census import motifs3_estimate

    rng = np.random.default_rng(21)
    n = 60
    src = rng.integers(0, n, 500)
    dst = rng.integers(0, n, 500)
    keep = src != dst
    g = Graph.from_numpy(src[keep], dst[keep], n=n)
    exact = motifs3(g, num_partitions=3)
    est = motifs3_estimate(g, sample_prob=1.0, num_partitions=3)
    ec = {r["isoclass"]: r["count"] for r in exact.to_pylist()}
    for r in est.to_pylist():
        assert r["sampled_count"] == ec[r["isoclass"]]
        assert r["sampled_roots"] == n
        assert r["estimate_e6"] == ec[r["isoclass"]] * 1_000_000


def test_motifs3_estimate_quarter_sample_close():
    """md5-deterministic quarter sample: high-count classes within 10%
    of the exact census on a dense ER digraph."""
    from igraph_ray.ops.census import motifs3_estimate

    rng = np.random.default_rng(4)
    n = 2000
    src = rng.integers(0, n, 40000)
    dst = rng.integers(0, n, 40000)
    keep = src != dst
    g = Graph.from_numpy(src[keep], dst[keep], n=n)
    exact = motifs3(g, num_partitions=3)
    est = motifs3_estimate(g, sample_prob=0.25, num_partitions=3)
    ec = {r["isoclass"]: r["count"] for r in exact.to_pylist()}
    checked = 0
    for r in est.to_pylist():
        true = ec[r["isoclass"]]
        if true < 20000:
            continue  # rare classes have sampling variance by design
        got = r["estimate_e6"] / 1e6
        assert abs(got - true) / true < 0.10, (r["isoclass"], got, true)
        checked += 1
    assert checked >= 2


class TestMotifCallback:
    """igraph_motifs_randesu_callback (motifs.c:165): the instance
    stream enumerates every connected triple exactly once, and a
    counting callback over it reproduces the motifs3 census."""

    def _g(self, seed, n, m):
        rng = np.random.default_rng(seed)
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        return Graph.from_numpy(src.astype(np.int64),
                                dst.astype(np.int64), n=n), src, dst

    @pytest.mark.parametrize("seed,n,m", [(3, 30, 120), (4, 80, 300)])
    def test_counting_callback_reproduces_motifs3(self, ray_session,
                                                  seed, n, m):
        from igraph_ray.ops.census import motifs_randesu_callback

        g, _, _ = self._g(seed, n, m)

        def counting(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"isoclass": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64())})
            iso = b["isoclass"].to_numpy(zero_copy_only=False)
            u, c = np.unique(iso, return_counts=True)
            return pa.table({"isoclass": pa.array(u, pa.int64()),
                             "c": pa.array(c, pa.int64())})

        got = {}
        out = motifs_randesu_callback(g, counting).groupby(
            "isoclass").sum("c")
        for r in out.take_all():
            got[int(r["isoclass"])] = int(r["sum(c)"])

        ref = motifs3(g)
        want = {int(i): int(c) for i, c in
                zip(ref["isoclass"].to_pylist(), ref["count"].to_pylist())
                if int(c) != 0}
        assert got == want

    def test_instances_unique_and_connected(self, ray_session):
        from igraph_ray.ops.census import motif3_instances

        g, src, dst = self._g(5, 25, 90)
        rows = motif3_instances(g, num_partitions=3).take_all()
        triples = [(r["v1"], r["v2"], r["v3"]) for r in rows]
        assert len(triples) == len(set(triples))
        adj = set()
        for s, d in zip(src, dst):
            if s != d:
                adj.add((min(s, d), max(s, d)))
        for (a, b, c) in triples:
            assert a < b < c
            links = ((a, b) in adj) + ((a, c) in adj) + ((b, c) in adj)
            assert links >= 2


def _motif4_brute_instances(n, src, dst):
    """Every connected induced 4-subgraph with its class name, from
    first principles (edge count + degree sequence within the quad) —
    independent of MOTIF4_LOOKUP."""
    adj = [set() for _ in range(n)]
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    out = {}
    for q in itertools.combinations(range(n), 4):
        sub = {x: {y for y in adj[x] if y in q} for x in q}
        # connectivity
        seen = {q[0]}
        stack = [q[0]]
        while stack:
            x = stack.pop()
            for y in sub[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        if len(seen) < 4:
            continue
        e = sum(len(v) for v in sub.values()) // 2
        degs = sorted(len(sub[x]) for x in q)
        if e == 3:
            name = "star3" if degs == [1, 1, 1, 3] else "path4"
        elif e == 4:
            name = "paw" if degs == [1, 2, 2, 3] else "cycle4"
        elif e == 5:
            name = "diamond"
        else:
            name = "k4"
        out[q] = name
    return out


class TestMotif4Instances:
    """Size-4 instance stream (motifs.c:165 randesu size=4, cut_prob=0):
    every connected induced 4-subgraph exactly once with its class."""

    def _g(self, seed, n, m):
        rng = np.random.default_rng(seed)
        src = rng.integers(0, n, m).astype(np.int64)
        dst = rng.integers(0, n, m).astype(np.int64)
        return Graph.from_numpy(src, dst, n=n), src, dst

    @pytest.mark.parametrize("seed,n,m", [(1, 16, 40), (2, 20, 60),
                                          (3, 14, 70)])
    def test_instances_match_brute(self, ray_session, seed, n, m):
        from igraph_ray.ops.census import motif4_instances

        g, src, dst = self._g(seed, n, m)
        rows = motif4_instances(g, num_partitions=3).take_all()
        got = {(r["v1"], r["v2"], r["v3"], r["v4"]): r["name"]
               for r in rows}
        assert len(got) == len(rows)  # exactly-once
        want = _motif4_brute_instances(n, src, dst)
        assert got == want

    def test_clazz_matches_motifs4_census(self, ray_session):
        from igraph_ray.ops.census import motifs4, motif4_instances, \
            _MOTIF4_NAMES

        g, _, _ = self._g(7, 30, 140)
        inst = motif4_instances(g, num_partitions=4)
        counts = {r["clazz"]: r["count()"] for r in
                  inst.groupby("clazz").count().take_all()}
        census = motifs4(g, num_partitions=4)
        for idx, nm in enumerate(_MOTIF4_NAMES):
            assert counts.get(idx, 0) == census[nm][0].as_py()

    def test_partition_invariance(self, ray_session):
        from igraph_ray.ops.census import motif4_instances

        g, _, _ = self._g(9, 18, 55)
        a = sorted((r["v1"], r["v2"], r["v3"], r["v4"], r["clazz"])
                   for r in motif4_instances(g, num_partitions=2).take_all())
        b = sorted((r["v1"], r["v2"], r["v3"], r["v4"], r["clazz"])
                   for r in motif4_instances(g, num_partitions=5).take_all())
        assert a == b

    def test_callback_size4(self, ray_session):
        from igraph_ray.ops.census import motifs_randesu_callback, motifs4

        g, _, _ = self._g(11, 24, 90)

        def counting(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"name": pa.array([], pa.string()),
                                 "c": pa.array([], pa.int64())})
            u, c = np.unique(
                b["name"].to_numpy(zero_copy_only=False), return_counts=True)
            return pa.table({"name": pa.array(u, pa.string()),
                             "c": pa.array(c, pa.int64())})

        out = motifs_randesu_callback(g, counting, size=4).groupby(
            "name").sum("c")
        got = {r["name"]: int(r["sum(c)"]) for r in out.take_all()}
        census = motifs4(g)
        for nm in census.column_names:
            assert got.get(nm, 0) == census[nm][0].as_py()
