"""Microscopic update rules vs in-test sequential replays
(microscopic_update.c:570,959,723 — deterministic md5 variants)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.algorithms.imitation import (
    initial_state,
    moran_process,
    optimal_imitation,
    roulette_wheel_imitation,
)

HEX8 = 1 << 32


def _fold8(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _graph(edges):
    return Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64())})))


def _adj(edges):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return {v: sorted(ns) for v, ns in adj.items()}


def _init(verts, seed, k=5, mod=1001):
    q = {v: _fold8(f"q:{seed}:{v}") % mod for v in verts}
    s = {v: v % k for v in verts}
    return q, s


def _rand_edges(n, m, seed):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    keep = src != dst
    return sorted(set(zip(src[keep].tolist(), dst[keep].tolist())))


def _ref_optimal(edges, seed, rounds, sign):
    adj = _adj(edges)
    verts = sorted(adj)
    q, s = _init(verts, seed)
    for _ in range(rounds):
        ns = dict(s)
        for v in verts:
            best_v, best_q = v, q[v]
            for u in adj[v]:
                if (sign > 0 and q[u] > best_q) or \
                   (sign < 0 and q[u] < best_q):
                    best_v, best_q = u, q[u]
                elif q[u] == best_q and best_v != v and u < best_v:
                    best_v = u
            ns[v] = s[best_v]
        s = ns
    return q, s


def _ref_roulette(edges, seed, rounds):
    adj = _adj(edges)
    verts = sorted(adj)
    q, s = _init(verts, seed)
    for r in range(rounds):
        ns = dict(s)
        for v in verts:
            nbrs = adj[v]
            S = sum(q[u] for u in nbrs) + q[v]
            draw = _fold8(f"{seed}:r{r}:{v}")
            cum = 0
            pick = None
            for u in nbrs:
                cum += q[u]
                if draw * S <= HEX8 * cum:
                    pick = u
                    break
            ns[v] = s[pick] if pick is not None else s[v]
        s = ns
    return q, s


EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), (1, 4)]


class TestOptimal:
    @pytest.mark.parametrize("opt,sign", [("max", 1), ("min", -1)])
    def test_small(self, ray_session, opt, sign):
        got = optimal_imitation(_graph(EDGES), seed=7, rounds=2,
                                optimality=opt).to_pandas()
        q, s = _ref_optimal(EDGES, 7, 2, sign)
        assert len(got) == len(s)
        for r in got.itertuples():
            assert (r.quantity, r.strategy) == (q[r.vertex],
                                                s[r.vertex]), r

    def test_random(self, ray_session):
        edges = _rand_edges(30, 80, 3)
        got = optimal_imitation(_graph(edges), seed=5,
                                rounds=3).to_pandas()
        q, s = _ref_optimal(edges, 5, 3, 1)
        for r in got.itertuples():
            assert (r.quantity, r.strategy) == (q[r.vertex],
                                                s[r.vertex]), r


class TestRoulette:
    def test_small(self, ray_session):
        got = roulette_wheel_imitation(_graph(EDGES), seed=11,
                                       rounds=2).to_pandas()
        q, s = _ref_roulette(EDGES, 11, 2)
        for r in got.itertuples():
            assert (r.quantity, r.strategy) == (q[r.vertex],
                                                s[r.vertex]), r

    def test_random(self, ray_session):
        edges = _rand_edges(25, 60, 9)
        got = roulette_wheel_imitation(_graph(edges), seed=4,
                                       rounds=2).to_pandas()
        q, s = _ref_roulette(edges, 4, 2)
        for r in got.itertuples():
            assert (r.quantity, r.strategy) == (q[r.vertex],
                                                s[r.vertex]), r

    def test_partitioning_invariance(self, ray_session):
        edges = _rand_edges(25, 60, 2)
        g1 = _graph(edges)
        g2 = Graph(g1.edges.repartition(5))
        a = roulette_wheel_imitation(g1, seed=6, rounds=2).to_pandas()
        b = roulette_wheel_imitation(g2, seed=6, rounds=2).to_pandas()
        assert a.values.tolist() == b.values.tolist()


class TestMoran:
    def test_one_step(self, ray_session):
        got = moran_process(_graph(EDGES), seed=13).to_pandas()
        # replay: a ∝ quantity over ascending ids, b ∝ unit weight over
        # a's ascending neighbors; b inherits a's strategy and quantity
        adj = _adj(EDGES)
        verts = sorted(adj)
        q, s = _init(verts, 13)
        cum = np.cumsum([q[v] for v in verts])
        S1 = int(cum[-1])
        d1 = _fold8("13:moran:a")
        a = verts[int(np.flatnonzero(HEX8 * cum >= d1 * S1)[0])]
        nbrs = adj[a]
        cw = np.arange(1, len(nbrs) + 1)
        d2 = _fold8("13:moran:b")
        bsel = nbrs[int(np.flatnonzero(
            HEX8 * cw >= d2 * len(nbrs))[0])]
        s[bsel], q[bsel] = s[a], q[a]
        for r in got.itertuples():
            assert (r.quantity, r.strategy) == (q[r.vertex],
                                                s[r.vertex]), r

    def test_population_conserved(self, ray_session):
        g = _graph(EDGES)
        after = moran_process(g, seed=13).to_pandas()
        assert len(after) == len(_adj(EDGES))
        assert sorted(after["vertex"]) == sorted(_adj(EDGES))


class TestStochasticImitation:
    """igraph_stochastic_imitation (microscopic_update.c:1119) vs an
    in-test sequential replay for all three imitation algorithms."""

    def _replay(self, edges, algo, seed, rounds):
        adj = _adj(edges)
        verts = sorted(adj)
        q, s = _init(verts, seed)
        for r in range(rounds):
            new_s = dict(s)
            for v in verts:
                nbrs = adj[v]
                d = _fold8(f"{seed}:s{r}:{v}")
                if algo == "blind":
                    i = d % (len(nbrs) + 1)
                    if i < len(nbrs):
                        new_s[v] = s[nbrs[i]]
                else:
                    u = nbrs[d % len(nbrs)]
                    if ((algo == "augmented" and q[u] > q[v])
                            or (algo == "contracted" and q[u] < q[v])):
                        new_s[v] = s[u]
            s = new_s
        return q, s

    @pytest.mark.parametrize("algo", ["blind", "augmented", "contracted"])
    def test_matches_sequential_replay(self, ray_session, algo):
        from igraph_ray.algorithms.imitation import stochastic_imitation

        got = stochastic_imitation(_graph(EDGES), algo=algo, seed=19,
                                   rounds=2).to_pandas()
        q, s = self._replay(EDGES, algo, 19, 2)
        for r in got.itertuples():
            assert (r.quantity, r.strategy) == (q[r.vertex],
                                                s[r.vertex]), (algo, r)

    def test_deterministic(self, ray_session):
        from igraph_ray.algorithms.imitation import stochastic_imitation

        a = stochastic_imitation(_graph(EDGES), algo="blind",
                                 seed=3).to_pandas()
        b = stochastic_imitation(_graph(EDGES), algo="blind",
                                 seed=3).to_pandas()
        assert a.equals(b)
