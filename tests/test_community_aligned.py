"""Actor-aligned Louvain (community_aligned.py) vs the dataset engine:
bit-identical labels/Q on exact-arithmetic inputs, partition invariance,
degenerate shapes. The quality gates (planted partition, karate floor)
run against the aligned engine via test_louvain.py (mode default)."""

from __future__ import annotations

import numpy as np
import pytest

from igraph_ray import Graph
from igraph_ray.algorithms.louvain import louvain
from tests.fixtures import karate


def _mk(src, dst, n, w=None):
    return Graph.from_numpy(
        np.asarray(src, np.int64), np.asarray(dst, np.int64),
        weight=None if w is None else np.asarray(w, np.float64), n=n)


def _labels(res):
    return {r["vertex"]: r["community"] for r in res.state.take_all()}


def _both(g1, g2, parts=4):
    a = louvain(g1, num_partitions=parts, mode="aligned")
    b = louvain(g2, num_partitions=parts, mode="dataset")
    return a, b


def test_karate_engines_identical():
    """Unweighted: every float sum is exact, so the two engines make
    bit-identical choices — labels, Q, level and sweep counts all match."""
    n, s, d = karate()
    a, b = _both(_mk(s, d, n), _mk(s, d, n))
    assert _labels(a) == _labels(b)
    assert a.modularity == b.modularity
    assert (a.levels, a.sweeps) == (b.levels, b.sweeps)


def test_random_graph_engines_identical_across_partitions():
    rng = np.random.default_rng(11)
    m = 600
    s = rng.integers(0, 120, m)
    d = rng.integers(0, 120, m)
    keep = s != d
    s, d = s[keep], d[keep]
    ref = None
    for parts in (2, 5):
        a = louvain(_mk(s, d, 120), num_partitions=parts, mode="aligned")
        la = _labels(a)
        if ref is None:
            b = louvain(_mk(s, d, 120), num_partitions=parts, mode="dataset")
            assert la == _labels(b)
            assert a.modularity == b.modularity
            ref = la
        else:
            assert la == ref  # partition-count invariance


def test_integer_weighted_engines_identical():
    """Integer weights: sums stay exact, engines must agree."""
    s = [0, 1, 2, 3, 4, 5, 0, 3]
    d = [1, 2, 0, 4, 5, 3, 3, 0]
    w = [5, 5, 5, 7, 7, 7, 1, 1]
    a, b = _both(_mk(s, d, 6, w), _mk(s, d, 6, w))
    assert _labels(a) == _labels(b)
    assert a.modularity == b.modularity


def test_sparse_universe_matches_dataset():
    """Vertex ids with gaps; isolated ids absent from both engines'
    output (the edge-endpoint universe contract)."""
    s = [10, 20, 30, 100, 200]
    d = [20, 30, 10, 200, 100]
    a, b = _both(_mk(s, d, 201), _mk(s, d, 201))
    la, lb = _labels(a), _labels(b)
    assert la == lb
    assert set(la) == {10, 20, 30, 100, 200}


def test_single_edge_and_empty():
    a = louvain(_mk([0], [1], 2), num_partitions=2, mode="aligned")
    assert set(_labels(a).values()) == {0}
    e = louvain(Graph.from_numpy(np.empty(0, np.int64), np.empty(0, np.int64), n=3),
                num_partitions=2, mode="aligned")
    # m2 == 0 falls back to all-singleton labels over the vertex table
    assert len(_labels(e)) == 3


def test_leiden_karate_engines_identical():
    from igraph_ray.algorithms.leiden import leiden

    n, s, d = karate()
    a = leiden(_mk(s, d, n), num_partitions=4, mode="aligned")
    b = leiden(_mk(s, d, n), num_partitions=4, mode="dataset")
    assert _labels(a) == _labels(b)
    assert a.modularity == b.modularity
    assert (a.levels, a.sweeps) == (b.levels, b.sweeps)


def test_leiden_random_engines_identical_across_partitions():
    from igraph_ray.algorithms.leiden import leiden

    rng = np.random.default_rng(7)
    m = 500
    s = rng.integers(0, 90, m)
    d = rng.integers(0, 90, m)
    keep = s != d
    s, d = s[keep], d[keep]
    ref = None
    for parts in (2, 5):
        a = leiden(_mk(s, d, 90), num_partitions=parts, mode="aligned")
        la = _labels(a)
        if ref is None:
            b = leiden(_mk(s, d, 90), num_partitions=parts, mode="dataset")
            assert la == _labels(b)
            assert a.modularity == b.modularity
            ref = la
        else:
            assert la == ref


def test_self_loops_ignored_level1():
    """Self-loops carry no candidate weight at level 1 (the sym CSR drops
    them) — a loop-heavy vertex still joins its real neighbors."""
    s = [0, 1, 2, 2, 2]
    d = [1, 2, 0, 2, 2]
    a, b = _both(_mk(s, d, 3), _mk(s, d, 3))
    assert _labels(a) == _labels(b)
    assert set(_labels(a).values()) == {0}
