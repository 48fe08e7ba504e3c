"""Bounded gSpan frequent subgraphs (fsm.c:2246 semantics, ≤2-edge
color patterns, transaction support): hand fixture, brute-force
cross-check, min-support filter, parallelism invariance."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.ops.fsm import frequent_subgraphs


def _snaps(g, s, d):
    return ray.data.from_arrow(pa.table({
        "g": pa.array(np.asarray(g, np.int64)),
        "src": pa.array(np.asarray(s, np.int64)),
        "dst": pa.array(np.asarray(d, np.int64))}))


def _got(ds, minsup, colors):
    return {r["pattern"]: r["support"]
            for r in frequent_subgraphs(ds, minsup, colors).take_all()}


def test_hand_fixture():
    # graph 0: path 0-1-2 (colors mod 2: 0,1,0) -> e:0-1 x2 edges,
    #   wedge at 1: w:1|0-0
    # graph 1: edge 0-1 only
    ds = _snaps([0, 0, 1], [0, 1, 0], [1, 2, 1])
    got = _got(ds, 2, 2)
    assert got == {"e:0-1": 2}
    got1 = _got(ds, 1, 2)
    assert got1 == {"e:0-1": 2, "w:1|0-0": 1}


def _brute(triples, colors, minsup):
    per_graph = defaultdict(set)
    adj = defaultdict(lambda: defaultdict(set))
    for g, a, b in triples:
        if a == b:
            continue
        per_graph[g].add(f"e:{min(a % colors, b % colors)}-"
                         f"{max(a % colors, b % colors)}")
        adj[g][a].add(b)
        adj[g][b].add(a)
    for g, am in adj.items():
        for x, nbrs in am.items():
            nb = sorted(nbrs)
            for i in range(len(nb)):
                for j in range(i + 1, len(nb)):
                    p, q = nb[i] % colors, nb[j] % colors
                    per_graph[g].add(
                        f"w:{x % colors}|{min(p, q)}-{max(p, q)}")
    cnt = defaultdict(int)
    for pats in per_graph.values():
        for p in pats:
            cnt[p] += 1
    return {p: c for p, c in cnt.items() if c >= minsup}


def test_matches_brute_and_invariance():
    rng = np.random.default_rng(7)
    g = rng.integers(0, 6, 150)
    s = rng.integers(0, 20, 150)
    d = rng.integers(0, 20, 150)
    triples = list(zip(g.tolist(), s.tolist(), d.tolist()))
    ds = _snaps(g, s, d)
    got = _got(ds, 2, 3)
    assert got == _brute(triples, 3, 2)
    got2 = _got(_snaps(g, s, d).repartition(5), 2, 3)
    assert got2 == got
