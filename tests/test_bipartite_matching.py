"""Maximum bipartite matching (matching.c semantics): exact-size checks
against an in-test Kuhn oracle, validity, and König duality
(|max matching| = |min vertex cover| on bipartite graphs)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.algorithms.bipartite_matching import maximum_bipartite_matching


def _kuhn_size(pairs, nl, nr):
    """Sequential Kuhn's algorithm — exact maximum matching size."""
    adj = [[] for _ in range(nl)]
    for l, r in pairs:
        adj[l].append(r)
    match_r = [-1] * nr

    def try_aug(l, seen):
        for r in adj[l]:
            if r in seen:
                continue
            seen.add(r)
            if match_r[r] == -1 or try_aug(match_r[r], seen):
                match_r[r] = l
                return True
        return False

    size = 0
    for l in range(nl):
        if try_aug(l, set()):
            size += 1
    return size


def _run(pairs):
    t = pa.table({
        "l": pa.array([p[0] for p in pairs], pa.int64()),
        "r": pa.array([p[1] for p in pairs], pa.int64()),
    })
    out = maximum_bipartite_matching(ray.data.from_arrow(t),
                                     num_partitions=4)
    return [(row["l"], row["r"]) for row in out.take_all()]


def _assert_valid(matched, pairs):
    es = set(pairs)
    ls = [l for l, _ in matched]
    rs = [r for _, r in matched]
    assert len(set(ls)) == len(ls), "left vertex matched twice"
    assert len(set(rs)) == len(rs), "right vertex matched twice"
    for e in matched:
        assert e in es, f"matched non-edge {e}"


def test_simple_path_augmentation():
    # chain where greedy can go wrong: l0-r0, l1-r0, l1-r1 -> max = 2
    pairs = [(0, 0), (1, 0), (1, 1)]
    m = _run(pairs)
    _assert_valid(m, pairs)
    assert len(m) == 2


def test_perfect_matching_cycle():
    # C8 as bipartite: perfect matching of size 4
    pairs = [(i, i) for i in range(4)] + [(i, (i + 1) % 4) for i in range(4)]
    m = _run(pairs)
    _assert_valid(m, pairs)
    assert len(m) == 4


@pytest.mark.parametrize("seed,nl,nr,ne", [(1, 20, 20, 45), (2, 30, 18, 70),
                                           (3, 15, 40, 60), (4, 50, 50, 120)])
def test_random_matches_kuhn(seed, nl, nr, ne):
    rng = np.random.default_rng(seed)
    pairs = sorted({(int(rng.integers(0, nl)), int(rng.integers(0, nr)))
                    for _ in range(ne)})
    m = _run(pairs)
    _assert_valid(m, pairs)
    assert len(m) == _kuhn_size(pairs, nl, nr)


def test_koenig_duality():
    """König: the vertex cover built from the final HK layering has size
    == |matching| and covers every edge."""
    rng = np.random.default_rng(11)
    nl = nr = 25
    pairs = sorted({(int(rng.integers(0, nl)), int(rng.integers(0, nr)))
                    for _ in range(60)})
    m = _run(pairs)
    _assert_valid(m, pairs)
    size = len(m)
    # build König cover sequentially from the returned matching:
    # Z = vertices reachable from free left via alternating paths;
    # cover = (L \ Z_L) ∪ (R ∩ Z_R)
    match_l = {l: r for l, r in m}
    match_r = {r: l for l, r in m}
    adj = {}
    for l, r in pairs:
        adj.setdefault(l, []).append(r)
    free_l = [l for l in {p[0] for p in pairs} if l not in match_l]
    zl, zr = set(free_l), set()
    stack = list(free_l)
    while stack:
        l = stack.pop()
        for r in adj.get(l, []):
            if match_l.get(l) == r:
                continue  # only unmatched edges L->R
            if r not in zr:
                zr.add(r)
                l2 = match_r.get(r)
                if l2 is not None and l2 not in zl:
                    zl.add(l2)
                    stack.append(l2)
    lset = {p[0] for p in pairs}
    cover = (lset - zl) | zr
    assert len(cover) == size
    for l, r in pairs:
        assert l in cover or r in cover


def test_empty_and_star():
    assert _run([]) == []
    # star: many left onto one right -> size 1
    pairs = [(i, 0) for i in range(6)]
    m = _run(pairs)
    _assert_valid(m, pairs)
    assert len(m) == 1
