"""Planar geometry helpers (other.c:121 igraph_convex_hull).

The reference computes the convex hull of a 2-D point set (used by its
layout pipeline) with a sequential gift-wrap; this module uses Andrew's
monotone chain (published textbook algorithm) in ONE guarded Ray task —
the op is O(n log n) on driver-sized layout tables, same envelope as
the reference. All arithmetic is exact int64 cross products, so the
extreme-point set is SQL-replayable: p is a hull vertex iff p is not
contained (boundary included) in any triangle of three other points.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

_HULL_GUARD = 5_000_000


@ray.remote
def _hull_task(t: pa.Table) -> pa.Table:
    if t.num_rows > _HULL_GUARD:
        raise NotImplementedError(
            f"convex_hull single-task plan guarded at {_HULL_GUARD} points")
    v = t["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
    x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    y = t["y"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((v, y, x))
    v, x, y = v[order], x[order], y[order]

    def cross(o, a, b) -> int:
        return int((x[a] - x[o]) * (y[b] - y[o])
                   - (y[a] - y[o]) * (x[b] - x[o]))

    n = len(v)
    if n <= 2:
        keep = np.arange(n)
    else:
        lower: list = []
        for i in range(n):
            # strict turns only: collinear boundary points are not
            # extreme (matches the triangle-containment oracle)
            while len(lower) >= 2 and cross(lower[-2], lower[-1], i) <= 0:
                lower.pop()
            lower.append(i)
        upper: list = []
        for i in range(n - 1, -1, -1):
            while len(upper) >= 2 and cross(upper[-2], upper[-1], i) <= 0:
                upper.pop()
            upper.append(i)
        keep = np.unique(np.array(lower[:-1] + upper[:-1], np.int64))
    out = np.sort(v[keep])
    pos = {int(vv): k for k, vv in enumerate(v)}
    sel = np.array([pos[int(o)] for o in out], np.int64)
    return pa.table({"vertex": pa.array(v[sel]),
                     "x": pa.array(x[sel]), "y": pa.array(y[sel])})


def convex_hull(points: ray.data.Dataset) -> ray.data.Dataset:
    """Hull vertices (vertex, x, y) of an integer point table — the
    extreme points of conv({(x, y)}), ascending vertex id."""
    from igraph_ray.util import _concat_tables, drop_empty_blocks

    ref = _concat_tables.remote(drop_empty_blocks(points).to_arrow_refs())
    return ray.data.from_arrow(ray.get(_hull_task.remote(ref)))
