"""Layouts (layout.c semantics): circle/star/grid closed forms, FR
determinism + planted-cluster separation."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.ops.layout import (layout_circle,
                                   layout_fruchterman_reingold,
                                   layout_grid, layout_star)


def test_layout_circle(ray_session):
    t = layout_circle(8).to_pandas().sort_values("vertex")
    assert np.allclose(t["x"], np.cos(2 * np.pi * np.arange(8) / 8))
    assert np.allclose(t["y"], np.sin(2 * np.pi * np.arange(8) / 8))


def test_layout_star(ray_session):
    t = layout_star(5, center=2).to_pandas().sort_values(
        "vertex").reset_index(drop=True)
    assert t["x"][2] == 0 and t["y"][2] == 0
    # first non-center vertex sits at angle 0
    assert np.isclose(t["x"][0], 1.0) and np.isclose(t["y"][0], 0.0)
    # all non-center vertices on the unit circle
    r = np.hypot(t["x"], t["y"])
    assert np.allclose(np.delete(r.to_numpy(), 2), 1.0)


def test_layout_grid(ray_session):
    t = layout_grid(7).to_pandas().sort_values("vertex").reset_index(
        drop=True)
    assert list(t["x"]) == [0, 1, 2, 0, 1, 2, 0]
    assert list(t["y"]) == [0, 0, 0, 1, 1, 1, 2]
    t2 = layout_grid(6, width=2).to_pandas().sort_values(
        "vertex").reset_index(drop=True)
    assert list(t2["x"]) == [0, 1, 0, 1, 0, 1]


def test_layout_fr_separates_and_deterministic(ray_session):
    es = set()
    for a in range(8):
        for b in range(a + 1, 8):
            es.add((a, b))
            es.add((a + 8, b + 8))
    es.add((0, 8))
    src = np.array([e[0] for e in es], np.int64)
    dst = np.array([e[1] for e in es], np.int64)
    g = Graph(ray.data.from_arrow(pa.table({"src": src, "dst": dst})),
              n=16)
    pos = layout_fruchterman_reingold(g, iterations=20, n=16).to_pandas()
    pos = pos.sort_values("vertex").reset_index(drop=True)
    xy = pos[["x", "y"]].to_numpy()
    assert ((xy >= 0) & (xy <= 1)).all()
    c1, c2 = xy[:8].mean(axis=0), xy[8:].mean(axis=0)
    intra = max(np.linalg.norm(xy[:8] - c1, axis=1).mean(),
                np.linalg.norm(xy[8:] - c2, axis=1).mean())
    assert np.linalg.norm(c1 - c2) > intra
    pos2 = layout_fruchterman_reingold(g, iterations=20,
                                       n=16).to_pandas()
    pos2 = pos2.sort_values("vertex").reset_index(drop=True)
    assert np.array_equal(xy, pos2[["x", "y"]].to_numpy())
