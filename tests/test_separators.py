"""Vertex separators (igraph_is_separator / is_minimal_separator,
separators.c:145,203): fixtures with known answers plus a definitional
brute-force cross-check (BFS + all-proper-subsets) on random graphs."""

from __future__ import annotations

import numpy as np

from igraph_ray import Graph
from igraph_ray.algorithms.separators import separator_profile


def _mk(src, dst, n):
    return Graph.from_numpy(np.asarray(src, np.int64),
                            np.asarray(dst, np.int64), n=n)


def test_path_middle_vertex():
    g = _mk([0, 1], [1, 2], 3)
    assert separator_profile(g, [1]) == (True, True, 2)


def test_clique_no_single_separator():
    s, d = zip(*[(i, j) for i in range(4) for j in range(i + 1, 4)])
    g = _mk(s, d, 4)
    assert separator_profile(g, [0]) == (False, False, 1)


def test_nonminimal_pair_on_path():
    g = _mk([0, 1, 2], [1, 2, 3], 4)
    is_sep, is_min, k = separator_profile(g, [1, 2])
    assert (is_sep, is_min, k) == (True, False, 2)


def test_minimal_pair_on_cycle():
    g = _mk([0, 1, 2, 3], [1, 2, 3, 0], 4)
    assert separator_profile(g, [0, 2]) == (True, True, 2)


def test_empty_set_on_disconnected():
    g = _mk([0, 2], [1, 3], 4)
    is_sep, is_min, k = separator_profile(g, [])
    assert (is_sep, is_min, k) == (True, True, 2)


def _brute(edges, universe, S):
    S = set(S) & universe
    adj = {v: set() for v in universe}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)

    def is_sep(s):
        rem = universe - s
        if not rem:
            return None
        if len(rem) == 1:
            return True
        start = min(rem)
        seen = {start}
        st = [start]
        while st:
            v = st.pop()
            for w in adj[v]:
                if w in rem and w not in seen:
                    seen.add(w)
                    st.append(w)
        return len(seen) < len(rem)

    sep = is_sep(S)
    mini = sep and all(not is_sep(S - {v}) for v in S)
    return bool(sep), bool(mini)


def test_matches_brute_on_random():
    rng = np.random.default_rng(17)
    for trial in range(4):
        n = 18
        m = 26
        s = rng.integers(0, n, m)
        d = rng.integers(0, n, m)
        keep = s != d
        edges = sorted(set(map(tuple, np.sort(
            np.stack([s[keep], d[keep]], 1), axis=1).tolist())))
        universe = set(v for e in edges for v in e)
        g = _mk(*zip(*edges), n)
        for S in ([0, 1], [2], [3, 5, 7], [1, 4]):
            got = separator_profile(g, S)[:2]
            assert got == _brute(edges, universe, S), (trial, S, got)
