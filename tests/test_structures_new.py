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


def test_modularity_matrix_row_sums_zero():
    import pyarrow as pa
    import ray.data

    from igraph_ray.algorithms.modularity import modularity_matrix

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 2, 3, 0, 1], pa.int64()),
        "dst": pa.array([1, 2, 3, 0, 2, 0], pa.int64())}))
    got = modularity_matrix(edges, n=5).to_pandas()
    # rebuild the full matrix from the upper triangle
    B = np.zeros((5, 5), np.int64)
    for r in got.itertuples():
        B[r.i, r.j] = r.b_num
        B[r.j, r.i] = r.b_num
    assert (B.sum(axis=1) == 0).all()  # B rows sum to zero exactly
    # vertex 4 is isolated: its row is all zeros
    assert (B[4] == 0).all()


def test_correlated_game_replay_and_marginal():
    import hashlib

    from igraph_ray.sources.games import correlated_game

    got = correlated_game(40, p_e6=300_000, corr_e6=400_000,
                          seed=3).to_pandas()
    HEX15 = 16 ** 15
    q = 300_000 + 400_000 * 700_000 // 1_000_000
    add = (1_000_000 - q) * 300_000 // 700_000
    want = set()
    for i in range(40):
        for j in range(i + 1, 40):
            rb = int(hashlib.md5(f"3:b:{i}:{j}".encode())
                     .hexdigest()[:15], 16)
            rc = int(hashlib.md5(f"3:c:{i}:{j}".encode())
                     .hexdigest()[:15], 16)
            base = rb < 300_000 * HEX15 // 1_000_000
            if (base and rc < q * HEX15 // 1_000_000) or (
                    not base and rc < add * HEX15 // 1_000_000):
                want.add((i, j))
    assert set(zip(got["src"].astype(int),
                   got["dst"].astype(int))) == want
    # marginal stays ~ p (780 pairs * 0.3 ≈ 234)
    assert 150 < len(got) < 320
