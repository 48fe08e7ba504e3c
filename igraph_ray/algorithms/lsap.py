"""Linear sum assignment — the engine's igraph_solve_lsap
(/root/reference/src/lsap.c, a Jonker–Volgenant-style solver used by
the reference for matching problems).

Minimum-cost perfect assignment of n rows to n columns. The engine
implements the O(n³) shortest-augmenting-path Hungarian algorithm with
row/column potentials (Kuhn–Munkres as presented in standard
references, e.g. Burkard–Dell'Amico–Martello "Assignment Problems").
Deterministic: scanning order is ascending index, strict inequality
for improvement, so ties resolve to the smallest column.

The augmenting loop is inherently sequential (each row's shortest path
depends on all previous assignments), so it runs inside ONE Ray task
over the broadcast cost matrix, guarded by ``max_n`` — same honesty
class as fastgreedy/dominators. The returned potentials (u, v) are a
LP-duality optimality certificate: u_i + v_j ≤ c_ij everywhere with
equality on assigned pairs, so Σu + Σv = assignment cost proves
optimality (verified in tests/test_lsap.py).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import ray


def _hungarian(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Potentials-based Hungarian on an n×n float matrix. Returns
    (col_of_row, u, v) with the duality convention
    u[i] + v[j] <= a[i, j], equality on matched pairs."""
    n = a.shape[0]
    INF = float("inf")
    # 1-indexed working arrays (classic formulation)
    u = np.zeros(n + 1)
    v = np.zeros(n + 1)
    p = np.zeros(n + 1, np.int64)   # p[j] = row matched to column j
    way = np.zeros(n + 1, np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n + 1, INF)
        used = np.zeros(n + 1, bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = -1
            for j in range(1, n + 1):
                if used[j]:
                    continue
                cur = a[i0 - 1, j - 1] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    col_of_row = np.zeros(n, np.int64)
    for j in range(1, n + 1):
        if p[j] > 0:
            col_of_row[p[j] - 1] = j - 1
    # convert to u[i] + v[j] <= c convention (u is over rows 1..n)
    return col_of_row, u[1:].copy(), v[1:].copy()


def solve_lsap(cost: np.ndarray, max_n: int = 4096) -> pa.Table:
    """Minimum-cost assignment of the square ``cost`` matrix. Returns
    (row, col, cost_e6, u_e6, v_e6) — one row per assignment with the
    duality certificate, values ×1e6-rounded for exact comparison."""
    cost = np.asarray(cost, np.float64)
    n = cost.shape[0]
    if cost.shape != (n, n):
        raise ValueError("cost matrix must be square")
    if n > max_n:
        raise NotImplementedError(
            f"Hungarian augmenting loop runs in one task; guarded to "
            f"n={max_n} ({n} requested)")

    @ray.remote
    def _run(a):
        return _hungarian(a)

    col, u, v = ray.get(_run.remote(cost))
    rows = np.arange(n, dtype=np.int64)
    return pa.table({
        "row": pa.array(rows),
        "col": pa.array(col),
        "cost_e6": pa.array(np.round(cost[rows, col] * 1e6)
                            .astype(np.int64)),
        "u_e6": pa.array(np.round(u * 1e6).astype(np.int64)),
        "v_e6": pa.array(np.round(v[col] * 1e6).astype(np.int64)),
    })
