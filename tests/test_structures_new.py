"""Kautz / full-citation / extended chordal ring vs brute enumeration."""

import itertools

import numpy as np

from igraph_ray.sources.structures import (extended_chordal_ring,
                                           full_citation, kautz)


def _brute_kautz(m, n):
    symbols = range(m + 1)
    strings = [s for s in itertools.product(symbols, repeat=n + 1)
               if all(s[i] != s[i + 1] for i in range(n))]
    strings.sort()
    rank = {s: i for i, s in enumerate(strings)}
    edges = set()
    for s in strings:
        for c in symbols:
            if c != s[-1]:
                edges.add((rank[s], rank[s[1:] + (c,)]))
    return len(strings), edges


def test_kautz_matches_brute_enumeration():
    for m, n in [(1, 2), (2, 2), (3, 1), (2, 3)]:
        nv, want = _brute_kautz(m, n)
        got = kautz(m, n).to_pandas()
        assert len(got) == nv * m
        assert set(zip(got["src"].astype(int),
                       got["dst"].astype(int))) == want


def test_full_citation_edges():
    got = full_citation(6).to_pandas()
    want = {(i, j) for i in range(6) for j in range(i)}
    assert set(zip(got["src"].astype(int),
                   got["dst"].astype(int))) == want


def test_chordal_ring_reference_rules():
    W = [[3, 5, 7], [4, 6, 8]]
    got = extended_chordal_ring(12, W).to_pandas()
    pairs = list(zip(got["src"].astype(int), got["dst"].astype(int)))
    want = [(i, i + 1) for i in range(11)] + [(0, 11)]
    Wm = np.asarray(W)
    for i in range(12):
        for j in range(2):
            off = int(Wm[j, i % 3])
            if i + off < 12:
                want.append((i, i + off))
    assert sorted(pairs) == sorted(want)


def test_grg_matches_brute_force():
    import hashlib

    import ray.data  # noqa: F401

    from igraph_ray.sources.games import GRG_BITS, grg_game

    n, radius_e6, seed = 120, 120_000, 7
    scale = 1 << GRG_BITS
    R = radius_e6 * scale // 1_000_000
    xs = [int(hashlib.md5(f"{seed}:x:{i}".encode()).hexdigest()[:15],
              16) % scale for i in range(n)]
    ys = [int(hashlib.md5(f"{seed}:y:{i}".encode()).hexdigest()[:15],
              16) % scale for i in range(n)]
    want = {(i, j) for i in range(n) for j in range(i + 1, n)
            if (xs[i] - xs[j]) ** 2 + (ys[i] - ys[j]) ** 2 < R * R}
    got = grg_game(n, radius_e6, seed=seed).to_pandas()
    pairs = set(zip(got["src"].astype(int), got["dst"].astype(int)))
    assert pairs == want
    assert len(got) == len(pairs)  # exactly-once


def test_islands_and_growing_random_shape():
    from igraph_ray.sources.games import growing_random_game, islands_game

    g = growing_random_game(30, m=3, citation=True, seed=5).to_pandas()
    assert len(g) == 29 * 3
    assert (g["dst"] < g["src"]).all()  # citation: i -> earlier vertex

    isl = islands_game(3, 8, pin_e6=500_000, n_inter=1,
                       seed=11).to_pandas()
    intra = isl[isl["src"] // 8 == isl["dst"] // 8]
    inter = isl[isl["src"] // 8 != isl["dst"] // 8]
    assert len(inter) == 3  # one per island pair
    assert (intra["src"] < intra["dst"]).all()
