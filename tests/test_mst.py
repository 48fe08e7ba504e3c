"""Minimum spanning forest vs an exact Kruskal oracle.

Reference semantics: igraph_minimum_spanning_tree[_prim]
(spanning_trees.c:78-86, 204-292). The engine uses Boruvka with a
(weight, src, dst) tie-break, so on distinct-weight inputs the edge set
must equal Kruskal's exactly; on ties, total weight and forest validity
must match.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray

from igraph_ray.algorithms.mst import minimum_spanning_forest


def kruskal(n, src, dst, w):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    order = np.lexsort((np.maximum(src, dst), np.minimum(src, dst), w))
    out = []
    for i in order:
        a, b = int(src[i]), int(dst[i])
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            out.append((min(a, b), max(a, b), float(w[i])))
    return set(out)


def _ds(src, dst, w):
    return ray.data.from_arrow(pa.table({
        "src": pa.array(np.asarray(src, np.int64)),
        "dst": pa.array(np.asarray(dst, np.int64)),
        "weight": pa.array(np.asarray(w, np.float64)),
    }))


def _engine_set(res):
    t = pa.concat_tables([b for b in res.iter_batches(batch_format="pyarrow")]) \
        if res.count() else None
    if t is None:
        return set()
    return set(zip(t["src"].to_pylist(), t["dst"].to_pylist(),
                   t["weight"].to_pylist()))


def test_simple_triangle():
    got = _engine_set(minimum_spanning_forest(_ds([0, 1, 0], [1, 2, 2],
                                                  [1.0, 2.0, 3.0])))
    assert got == {(0, 1, 1.0), (1, 2, 2.0)}


def test_disconnected_forest():
    src = [0, 1, 3, 4]
    dst = [1, 2, 4, 5]
    w = [5.0, 1.0, 2.0, 9.0]
    got = _engine_set(minimum_spanning_forest(_ds(src, dst, w)))
    assert got == kruskal(6, np.array(src), np.array(dst), np.array(w))
    assert len(got) == 4  # two trees of 2 edges each


def test_random_distinct_weights():
    rng = np.random.default_rng(7)
    n, m = 80, 400
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.permutation(m).astype(np.float64)  # distinct -> unique MSF
    got = _engine_set(minimum_spanning_forest(_ds(src, dst, w),
                                              num_partitions=4))
    ref = kruskal(n, src, dst, w)
    assert got == ref


def test_duplicate_weights_same_total():
    rng = np.random.default_rng(21)
    n, m = 40, 200
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.integers(1, 4, m).astype(np.float64)  # heavy ties
    got = _engine_set(minimum_spanning_forest(_ds(src, dst, w)))
    ref = kruskal(n, src, dst, w)
    assert len(got) == len(ref)
    assert sum(x[2] for x in got) == pytest.approx(sum(x[2] for x in ref))


def test_unweighted_spanning_forest():
    src = [0, 1, 2, 0]
    dst = [1, 2, 3, 3]
    res = minimum_spanning_forest(_ds(src, dst, [9, 9, 9, 9]),
                                  weight_col=None)
    got = _engine_set(res)
    assert len(got) == 3
    assert all(w == 1.0 for _, _, w in got)


def test_empty():
    res = minimum_spanning_forest(_ds([], [], []))
    assert res.count() == 0
