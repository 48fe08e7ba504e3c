"""Deterministic structure generators (structure_generators.c): star,
ring, tree (regular k-ary), full. Unlike the seeded random games
(sources/games.py) these are pure functions of the vertex-id range, so
the distributed form is one vectorized ``map_batches`` over
``ray.data.range(n)`` — no RNG, no shuffle, identical output at any
parallelism, and each maps 1:1 onto an ANSI-SQL ``range()`` expression
for the oracle gate.

Reference semantics:
- igraph_star (structure_generators.c, functions.def:101): center 0,
  mode "out" (center→leaf), "in" (leaf→center), or "undirected"
  (canonical lo<hi, same as "out" with center 0).
- igraph_ring (functions.def:110): i→i+1 for i<n−1, plus n−1→0 when
  circular.
- igraph_tree (functions.def:115): k-ary tree, vertex i>0 has parent
  (i−1)//children, edges parent→child.
- igraph_full (functions.def:119): every ordered pair src≠dst
  (directed) or lo<hi pair (undirected); loops optional.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _ids(b: pa.Table) -> np.ndarray:
    return b["id"].to_numpy(zero_copy_only=False).astype(np.int64)


def star(n: int, mode: str = "out") -> ray.data.Dataset:
    """Star on n vertices with center 0 (igraph_star)."""
    if mode not in ("out", "in", "undirected"):
        raise ValueError(f"unknown star mode {mode!r}")

    def _f(b: pa.Table) -> pa.Table:
        v = _ids(b)
        v = v[v > 0]
        zeros = np.zeros(len(v), np.int64)
        if mode == "in":
            return pa.table({"src": pa.array(v), "dst": pa.array(zeros)})
        return pa.table({"src": pa.array(zeros), "dst": pa.array(v)})

    return ray.data.range(n).map_batches(_f, batch_format="pyarrow",
                                         batch_size=None)


def ring(n: int, circular: bool = True) -> ray.data.Dataset:
    """Directed path/cycle 0→1→…→n−1 (→0 when circular) (igraph_ring)."""

    def _f(b: pa.Table) -> pa.Table:
        v = _ids(b)
        v = v[v < n - 1] if not circular else v
        nxt = (v + 1) % n if circular else v + 1
        return pa.table({"src": pa.array(v), "dst": pa.array(nxt)})

    return ray.data.range(n).map_batches(_f, batch_format="pyarrow",
                                         batch_size=None)


def tree(n: int, children: int = 2) -> ray.data.Dataset:
    """Regular k-ary tree, edges parent→child (igraph_tree)."""

    def _f(b: pa.Table) -> pa.Table:
        v = _ids(b)
        v = v[v > 0]
        return pa.table({"src": pa.array((v - 1) // children),
                         "dst": pa.array(v)})

    return ray.data.range(n).map_batches(_f, batch_format="pyarrow",
                                         batch_size=None)


def full(n: int, directed: bool = True, loops: bool = False) -> ray.data.Dataset:
    """Complete graph: one task-side expansion per id block (igraph_full).
    Each block of k source ids emits k·n rows — the expansion happens
    inside the tasks, never on the driver."""

    def _f(b: pa.Table) -> pa.Table:
        v = _ids(b)
        src = np.repeat(v, n)
        dst = np.tile(np.arange(n, dtype=np.int64), len(v))
        keep = np.ones(len(src), bool)
        if not loops:
            keep &= src != dst
        if not directed:
            keep &= src < dst
        return pa.table({"src": pa.array(src[keep]),
                         "dst": pa.array(dst[keep])})

    return ray.data.range(n).map_batches(_f, batch_format="pyarrow",
                                         batch_size=None)
