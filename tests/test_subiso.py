"""Subgraph isomorphism counting vs in-test brute force (VF2 semantics:
injective maps, non-induced, topology.c contract)."""

from itertools import permutations

import numpy as np
import pytest

from igraph_ray.algorithms.subiso import (
    count_sub_isomorphisms,
    isomorphic_small,
)
from igraph_ray.graph import Graph


def _brute_count(n, tedges, pedges, p, directed):
    tset = set()
    for a, b in tedges:
        if a == b:
            continue
        tset.add((a, b) if directed else (min(a, b), max(a, b)))

    def has(u, v):
        return ((u, v) in tset) if directed else \
            ((min(u, v), max(u, v)) in tset)

    cnt = 0
    for m in permutations(range(n), p):
        if all(has(m[a], m[b]) for a, b in pedges):
            cnt += 1
    return cnt


def _g(n, edges):
    return Graph.from_numpy(np.array([e[0] for e in edges], np.int64),
                            np.array([e[1] for e in edges], np.int64), n=n)


PATTERNS = {
    "edge": [(0, 1)],
    "path3": [(0, 1), (1, 2)],
    "triangle": [(0, 1), (1, 2), (2, 0)],
    "path4": [(0, 1), (1, 2), (2, 3)],
    "cycle4": [(0, 1), (1, 2), (2, 3), (3, 0)],
    "claw": [(0, 1), (0, 2), (0, 3)],
}


@pytest.mark.parametrize("pname", sorted(PATTERNS))
def test_undirected_counts_match_brute(pname):
    rng = np.random.default_rng(8)
    n = 9
    tedges = sorted({(int(a), int(b)) for a, b in
                     rng.integers(0, n, (20, 2)) if a != b})
    pedges = PATTERNS[pname]
    p = max(max(e) for e in pedges) + 1
    got = count_sub_isomorphisms(
        _g(n, tedges),
        [e[0] for e in pedges], [e[1] for e in pedges],
        directed=False, num_partitions=2)
    want = _brute_count(n, tedges, pedges, p, directed=False)
    assert got == want, (pname, got, want)


@pytest.mark.parametrize("pedges", [
    [(0, 1), (1, 2)],                     # directed path
    [(0, 1), (1, 2), (2, 0)],             # directed 3-cycle
    [(0, 1), (1, 0)],                     # mutual dyad
])
def test_directed_counts_match_brute(pedges):
    rng = np.random.default_rng(3)
    n = 8
    tedges = sorted({(int(a), int(b)) for a, b in
                     rng.integers(0, n, (22, 2)) if a != b})
    p = max(max(e) for e in pedges) + 1
    got = count_sub_isomorphisms(
        _g(n, tedges),
        [e[0] for e in pedges], [e[1] for e in pedges],
        directed=True, num_partitions=2)
    want = _brute_count(n, tedges, pedges, p, directed=True)
    assert got == want


def test_triangle_consistency_with_census():
    """#triangle subisomorphisms = 6 x triangle count (3! maps each)."""
    from igraph_ray.algorithms.triangles import triangle_counts

    rng = np.random.default_rng(5)
    n = 40
    tedges = sorted({(int(a), int(b)) for a, b in
                     rng.integers(0, n, (200, 2)) if a != b})
    g = _g(n, tedges)
    subs = count_sub_isomorphisms(g, [0, 1, 2], [1, 2, 0],
                                  directed=False, num_partitions=2)
    tri_total = sum(r["triangles"] for r in
                    triangle_counts(g, num_partitions=2).take_all()) // 3
    assert subs == 6 * tri_total


def test_isomorphic_small():
    # C4 vs C4 relabeled: isomorphic; C4 vs path4: not
    assert isomorphic_small([0, 1, 2, 3], [1, 2, 3, 0], 4,
                            [2, 0, 3, 1], [0, 3, 1, 2], 4)
    assert not isomorphic_small([0, 1, 2, 3], [1, 2, 3, 0], 4,
                                [0, 1, 2], [1, 2, 3], 4)
    with pytest.raises(NotImplementedError):
        isomorphic_small(list(range(9)), list(range(1, 10)), 10,
                         list(range(9)), list(range(1, 10)), 10)
