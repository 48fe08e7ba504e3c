"""All minimal s-t cuts vs brute-force edge-subset enumeration
(st-cuts.c:976,1290 — Provan–Shier closed-partition semantics)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.algorithms.stcuts import all_st_cuts


def _graph(edges):
    return Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64())})))


def _reachable(edges, s, t):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    seen = {s}
    q = [s]
    while q:
        v = q.pop()
        for u in adj.get(v, ()):
            if u not in seen:
                seen.add(u)
                q.append(u)
    return t in seen


def _brute_minimal_cuts(edges, s, t):
    """All inclusion-minimal edge subsets whose removal disconnects
    s from t."""
    edges = sorted(set(edges))
    cuts = []
    for r in range(len(edges) + 1):
        for comb in itertools.combinations(range(len(edges)), r):
            rem = [e for i, e in enumerate(edges) if i not in comb]
            if _reachable(rem, s, t):
                continue
            cut = frozenset(edges[i] for i in comb)
            if not any(c < cut for c in cuts):
                cuts.append(cut)
    # drop any supersets kept before a smaller cut was found
    return {c for c in cuts if not any(o < c for o in cuts if o != c)}


def _rand_edges(n, m, seed):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    keep = src != dst
    return sorted(set(zip(src[keep].tolist(), dst[keep].tolist())))


class TestAllStCuts:
    def test_diamond(self, ray_session):
        edges = [(0, 1), (0, 2), (1, 3), (2, 3)]
        got = all_st_cuts(_graph(edges), 0, 3).to_pandas()
        got_cuts = {frozenset(zip(g.src, g.dst))
                    for _, g in got.groupby("cut_id")}
        assert got_cuts == _brute_minimal_cuts(edges, 0, 3)

    @pytest.mark.parametrize("seed,n,m", [(2, 6, 11), (5, 6, 11), (8, 6, 11),
                                          (11, 6, 11), (3, 7, 13), (7, 7, 13)])
    def test_random_matches_bruteforce(self, ray_session, seed, n, m):
        edges = _rand_edges(n, m, seed)
        t = n - 1
        if not _reachable(edges, 0, t):
            pytest.skip("disconnected draw")
        got = all_st_cuts(_graph(edges), 0, t).to_pandas()
        got_cuts = {frozenset(zip(g.src, g.dst))
                    for _, g in got.groupby("cut_id")}
        assert got_cuts == _brute_minimal_cuts(edges, 0, t)

    def test_mincuts_only(self, ray_session):
        edges = [(0, 1), (0, 2), (1, 3), (2, 3), (1, 2)]
        allc = all_st_cuts(_graph(edges), 0, 3).to_pandas()
        minc = all_st_cuts(_graph(edges), 0, 3,
                           mincuts_only=True).to_pandas()
        sizes = allc.groupby("cut_id").size()
        assert (minc.groupby("cut_id").size() == sizes.min()).all()
        ref = _brute_minimal_cuts(edges, 0, 3)
        k = min(len(c) for c in ref)
        assert {frozenset(zip(g.src, g.dst))
                for _, g in minc.groupby("cut_id")} == \
            {c for c in ref if len(c) == k}
