"""Dynamic union-graph projection (dynamic.c:568/1033 semantics):
hand-computed fixture with all three membership colors, window
clamping, parallelism invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.ops.temporal import union_graph_projection


def _events(ws, users, eids, window_s=10):
    # place each event in the middle of its window
    ts = (np.asarray(ws, np.int64) * window_s * 1_000_000
          + 5_000_000).astype("datetime64[us]")
    return ray.data.from_arrow(pa.table({
        "ts": pa.array(ts),
        "user_id": pa.array(np.asarray(users, np.int64)),
        "event_id": pa.array(np.asarray(eids, np.int64))}))


def test_colors_and_clamping():
    # windows 0,1,2; edge (u=3, e=5): in w0 and w1 -> pair 0 color 3
    # edge (u=4, e=6): only w0 -> pair 0 color 2
    # edge (u=7, e=8): only w1 -> pair 0 color 1, pair 1 color 2
    # edge (u=9, e=10): only w2 -> pair 1 color 1 (pair 2 clamped away)
    ev = _events([0, 1, 0, 1, 2], [3, 3, 4, 7, 9], [5, 5, 6, 8, 10])
    rows = {(r["w"], r["src"], r["dst"]): r["color"]
            for r in union_graph_projection(ev, window_s=10).take_all()}
    assert rows == {
        (0, 3, 5): 3, (0, 4, 6): 2, (0, 7, 8): 1,
        (1, 3, 5): 2, (1, 7, 8): 2, (1, 9, 10): 1}


def test_duplicate_events_collapse():
    ev = _events([0, 0, 0, 1], [3, 3, 3, 3], [5, 5, 5, 5])
    rows = union_graph_projection(ev, window_s=10).take_all()
    assert [(r["w"], r["src"], r["dst"], r["color"])
            for r in rows] == [(0, 3, 5, 3)]


def test_parallelism_invariance():
    rng = np.random.default_rng(3)
    ws = rng.integers(0, 10, 300)
    us = rng.integers(0, 40, 300)
    es = rng.integers(0, 200, 300)
    a = union_graph_projection(_events(ws, us, es), window_s=10).take_all()
    ev2 = _events(ws, us, es).repartition(7)
    b = union_graph_projection(ev2, window_s=10).take_all()
    assert a == b
