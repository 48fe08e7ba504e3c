"""Deterministic graph fixtures (FIXTURES.md §3). All seeds fixed."""

from __future__ import annotations

import numpy as np

# the 4-vertex digraph from the reference pagerank test
# (examples/simple/igraph_pagerank.c:54-60)
IPRCOM4 = (4, np.array([0, 1, 2, 3, 0]), np.array([1, 2, 0, 2, 2]))

# directed in/out star (igraph_pagerank.c:72-88): center 0
STAR8_IN = (8, np.arange(1, 8), np.zeros(7, dtype=np.int64))
STAR8_OUT = (8, np.zeros(7, dtype=np.int64), np.arange(1, 8))

# Zachary karate club, 78 edges (well-known public dataset; same edge list
# as examples/simple/igraph_community_label_propagation.c:33-48)
_KARATE_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10),
    (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31), (1, 2),
    (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30), (2, 3),
    (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32), (3, 7),
    (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10), (5, 16), (6, 16),
    (8, 30), (8, 32), (8, 33), (9, 33), (13, 33), (14, 32), (14, 33),
    (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
    (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
    (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33),
    (28, 31), (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32),
    (31, 33), (32, 33),
]


def karate():
    e = np.array(_KARATE_EDGES)
    return 34, e[:, 0].astype(np.int64), e[:, 1].astype(np.int64)


def er_digraph(n=200, m=1200, seed=42, dangling_frac=0.1):
    """ER digraph with a planted fraction of zero-outdegree vertices."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    dang = rng.choice(n, int(n * dangling_frac), replace=False)
    keep = ~np.isin(src, dang)
    return n, src[keep], dst[keep]


def multiloop(seed=7):
    """Small graph with self-loops and duplicate edges."""
    rng = np.random.default_rng(seed)
    n = 12
    src = rng.integers(0, n, 24)
    dst = rng.integers(0, n, 24)
    src = np.concatenate([src, [3, 3, 5, 1, 1]])
    dst = np.concatenate([dst, [3, 3, 5, 2, 2]])  # loops + duplicates
    return n, src, dst


def forest(seed=11):
    """Disjoint ER components + isolated vertices."""
    rng = np.random.default_rng(seed)
    srcs, dsts = [], []
    offset = 0
    for size, m in [(60, 150), (40, 90), (80, 200), (30, 60)]:
        srcs.append(rng.integers(0, size, m) + offset)
        dsts.append(rng.integers(0, size, m) + offset)
        offset += size
    n = offset + 20  # isolated tail vertices
    return n, np.concatenate(srcs), np.concatenate(dsts)


def cliques():
    """Disjoint cliques K5..K9 (LPA-stable)."""
    srcs, dsts = [], []
    offset = 0
    for k in range(5, 10):
        for i in range(k):
            for j in range(i + 1, k):
                srcs.append(offset + i)
                dsts.append(offset + j)
        offset += k
    return offset, np.array(srcs, dtype=np.int64), np.array(dsts, dtype=np.int64)


def ring_of_cliques(k=6, num=5):
    """Cliques joined by single bridges (LPA-stable communities)."""
    srcs, dsts = [], []
    for c in range(num):
        off = c * k
        for i in range(k):
            for j in range(i + 1, k):
                srcs.append(off + i)
                dsts.append(off + j)
        nxt = ((c + 1) % num) * k
        srcs.append(off)
        dsts.append(nxt + 1)
    return k * num, np.array(srcs, dtype=np.int64), np.array(dsts, dtype=np.int64)


def powerlaw(n=2000, m=10000, exponent=2.3, seed=42):
    """static_power_law-style digraph: endpoints drawn with prob ∝ rank^-α."""
    rng = np.random.default_rng(seed)
    alpha = 1.0 / (exponent - 1.0)
    p = (np.arange(1, n + 1, dtype=np.float64)) ** (-alpha)
    p /= p.sum()
    src = rng.choice(n, m, p=p)
    dst = rng.choice(n, m, p=p)
    return n, src.astype(np.int64), dst.astype(np.int64)
