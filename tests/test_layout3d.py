"""3-D layouts, GEM/Davidson-Harel, bipartite sweeps and layout
merging — structural property tests (coordinates are rows-only)."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.ops.layout import (layout_bipartite,
                                   layout_circle,
                                   layout_davidson_harel,
                                   layout_drl_3d,
                                   layout_fruchterman_reingold_3d,
                                   layout_gem,
                                   layout_kamada_kawai,
                                   merge_layouts)


def _cycle(n):
    return Graph(ray.data.from_arrow(pa.table({
        "src": pa.array(list(range(n)), pa.int64()),
        "dst": pa.array([(i + 1) % n for i in range(n)], pa.int64())})),
        n=n)


def test_fr3d_unit_cube_and_deterministic():
    g = _cycle(12)
    a = layout_fruchterman_reingold_3d(g, iterations=4, n=12).to_pandas()
    b = layout_fruchterman_reingold_3d(g, iterations=4, n=12).to_pandas()
    assert set(a.columns) == {"vertex", "x", "y", "z"}
    assert len(a) == 12
    for c in ("x", "y", "z"):
        assert (a[c] >= 0).all() and (a[c] <= 1).all()
    a = a.sort_values("vertex").reset_index(drop=True)
    b = b.sort_values("vertex").reset_index(drop=True)
    assert a.equals(b)


def test_drl3d_separates_two_cliques():
    edges = ([(i, j) for i in range(5) for j in range(i + 1, 5)]
             + [(5 + i, 5 + j) for i in range(5) for j in range(i + 1, 5)]
             + [(0, 5)])
    g = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.int64()),
        "dst": pa.array([b for _, b in edges], pa.int64())})), n=10)
    df = layout_drl_3d(g, iterations=12, n=10).to_pandas()
    P = df.sort_values("vertex")[["x", "y", "z"]].to_numpy()
    intra = np.linalg.norm(P[:5] - P[:5].mean(0), axis=1).mean() \
        + np.linalg.norm(P[5:] - P[5:].mean(0), axis=1).mean()
    inter = np.linalg.norm(P[:5].mean(0) - P[5:].mean(0))
    assert inter > 0.3 * intra


def test_kk3d_cycle_roundness():
    g = _cycle(10)
    df = layout_kamada_kawai(g, iterations=40, n=10, dims=3).to_pandas()
    P = df.sort_values("vertex")[["x", "y", "z"]].to_numpy()
    d = [np.linalg.norm(P[i] - P[(i + 1) % 10]) for i in range(10)]
    # all cycle edges about the same length after stress majorization
    assert max(d) / min(d) < 2.0


def test_gem_gravity_compacts():
    g = _cycle(16)
    loose = layout_gem(g, iterations=6, n=16, gravity=0.0).to_pandas()
    tight = layout_gem(g, iterations=6, n=16, gravity=0.5).to_pandas()

    def spread(df):
        P = df[["x", "y"]].to_numpy()
        return np.linalg.norm(P - P.mean(0), axis=1).mean()

    assert spread(tight) <= spread(loose) + 1e-9


def test_dh_runs_and_bounded():
    g = _cycle(9)
    df = layout_davidson_harel(g, iterations=6, n=9).to_pandas()
    assert len(df) == 9
    for c in ("x", "y"):
        assert (df[c] >= 0).all() and (df[c] <= 1).all()


def test_bipartite_pinned_sweeps():
    # K_{2,2} + pendant: ranks are permutations per layer
    e = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 0, 1, 1, 2], pa.int64()),
        "dst": pa.array([10, 11, 10, 11, 12], pa.int64())}))
    df = layout_bipartite(e, sweeps=2).to_pandas()
    left = df[df.type == 0].sort_values("x")
    right = df[df.type == 1].sort_values("x")
    assert sorted(left.x) == [0, 1, 2]
    assert sorted(right.x) == [0, 1, 2]
    assert (left.y == 0).all() and (right.y == 1).all()
    # vertex 2 and 12 are exclusive partners; the sweeps keep them
    # on the same side (both at the extreme barycenter)
    assert left[left.vertex == 2].x.iloc[0] == \
        right[right.vertex == 12].x.iloc[0]


def test_merge_layouts_disjoint_circles():
    parts = [layout_circle(12), layout_circle(8), layout_circle(5)]
    df = merge_layouts(parts).to_pandas()
    assert len(df) == 25
    cents, rads = {}, {}
    for c, sub in df.groupby("comp"):
        P = sub[["x", "y"]].to_numpy()
        cents[c] = P.mean(0)
        rads[c] = np.linalg.norm(P - P.mean(0), axis=1).max()
    keys = sorted(cents)
    for i in keys:
        for j in keys:
            if i < j:
                gap = np.linalg.norm(cents[i] - cents[j])
                assert gap >= rads[i] + rads[j] - 1e-6
