"""MCS + chordality (decomposition.c:56,252 semantics): chordal
families, non-chordal cycles, MCS invariant replay, fill-in
chordalizes, determinism."""

from __future__ import annotations

import numpy as np

from igraph_ray import Graph
from igraph_ray.algorithms.chordal import mcs_chordal


def _mk(src, dst, n):
    return Graph.from_numpy(np.asarray(src, np.int64),
                            np.asarray(dst, np.int64), n=n)


def test_tree_and_clique_chordal():
    # star + path tail
    _, chordal, fill = mcs_chordal(_mk([0, 0, 0, 3], [1, 2, 3, 4], 5))
    assert chordal and fill.num_rows == 0
    s, d = zip(*[(i, j) for i in range(5) for j in range(i + 1, 5)])
    _, chordal, fill = mcs_chordal(_mk(s, d, 5))
    assert chordal and fill.num_rows == 0


def test_cycles_not_chordal():
    _, chordal, fill = mcs_chordal(_mk([0, 1, 2, 3], [1, 2, 3, 0], 4))
    assert not chordal and fill.num_rows == 1
    _, chordal, fill = mcs_chordal(_mk([0, 1, 2, 3, 4], [1, 2, 3, 4, 0], 5))
    assert not chordal and fill.num_rows == 2


def test_chordal_cycle_with_chords():
    # C5 + chords 0-2, 0-3 makes it chordal (fan triangulation)
    g = _mk([0, 1, 2, 3, 4, 0, 0], [1, 2, 3, 4, 0, 2, 3], 5)
    _, chordal, fill = mcs_chordal(g)
    assert chordal and fill.num_rows == 0


def test_mcs_pick_invariant():
    """Replaying the picks in rank-descending order, every pick must
    have had the max visited-neighbor count at its time (ties by id).
    """
    rng = np.random.default_rng(3)
    s = rng.integers(0, 20, 50)
    d = rng.integers(0, 20, 50)
    keep = s != d
    edges = set(map(tuple, np.sort(
        np.stack([s[keep], d[keep]], 1), axis=1).tolist()))
    alpha_t, _, _ = mcs_chordal(_mk(*zip(*sorted(edges)), 20))
    rank = {r["vertex"]: r["rank"] for r in alpha_t.to_pylist()}
    adj = {v: set() for v in range(20)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    order = sorted(range(20), key=lambda v: -rank[v])
    visited = set()
    cnt = {v: 0 for v in range(20)}
    for v in order:
        best = max((cnt[w], ) for w in range(20) if w not in visited)[0]
        cands = [w for w in range(20) if w not in visited and cnt[w] == best]
        assert v == min(cands), (v, cands)
        visited.add(v)
        for w in adj[v]:
            if w not in visited:
                cnt[w] += 1


def test_fill_in_chordalizes():
    rng = np.random.default_rng(6)
    s = rng.integers(0, 15, 28)
    d = rng.integers(0, 15, 28)
    keep = s != d
    edges = sorted(set(map(tuple, np.sort(
        np.stack([s[keep], d[keep]], 1), axis=1).tolist())))
    g = _mk(*zip(*edges), 15)
    _, chordal, fill = mcs_chordal(g)
    if chordal:
        assert fill.num_rows == 0
        return
    aug = edges + list(zip(fill["src"].to_pylist(),
                           fill["dst"].to_pylist()))
    g2 = _mk(*zip(*aug), 15)
    _, chordal2, fill2 = mcs_chordal(g2)
    assert chordal2 and fill2.num_rows == 0
