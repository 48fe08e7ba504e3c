"""Random walks with a deterministic, parallelism-independent step rule.

Reference semantics: ``igraph_random_walk`` (/root/reference/src — walk
start vertex, fixed number of steps, one uniform out-neighbor per step,
walk truncates at a sink).  The reference draws from its RNG; a
distributed engine needs the draw to be *reproducible at any
parallelism and any partitioning*, so the uniform draw is replaced by a
fixed arithmetic mix of (walk id, step, current vertex) over the
dst-sorted out-neighbor rank:

    idx(walk, step, v) = ((walk % 2^20)·9973 + step·7919
                          + (v % 2^20)·104729) mod outdeg(v)

— every factor < 2^20·104729 < 2^37 so the arithmetic is exact in
int64 (and in any SQL BIGINT, which is what makes the DuckDB oracle an
independent re-execution rather than a port of numpy RNG internals).
The walk visits the idx-th smallest out-neighbor; a sink ends the walk.

Distributed shape: walk state is O(#walks) rows — tiny next to the
graph — while the adjacency lives in the per-partition CSR blocks
pinned in the object store.  Each step groups current positions by
their containing CSR block and advances them with one remote task per
touched block (the blocks are NOT re-shipped; tasks read them
zero-copy from plasma), so a step costs O(P) small tasks regardless of
graph size.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.csr import slices_for
from igraph_ray.graph import Graph

_M = np.int64(1 << 20)
_A = np.int64(9973)
_B = np.int64(7919)
_C = np.int64(104729)


@ray.remote
def _step_block(blk: dict, walks: np.ndarray, verts: np.ndarray, step: int,
                weighted: bool = False):
    """Advance the walks currently inside this CSR block one step;
    returns (walk_ids, next_vertices) for walks that found a neighbor.
    ``blk`` arrives as the plasma-resolved CSR block (zero-copy numpy
    views).  The row slice is sorted in-task (CSR rows are src-grouped
    but their internal dst order is partitioning-dependent; the
    contract needs "idx-th smallest neighbor" to be absolute)."""
    idx_arr, lens = slices_for(blk, verts)
    alive = lens > 0
    if not alive.any():
        return walks[:0], verts[:0]
    d = blk["dst"][idx_arr]
    rep = np.repeat(np.arange(len(verts), dtype=np.int64), lens)
    order = np.lexsort((d, rep))
    d_sorted = d[order].astype(np.int64)
    offs = np.zeros(len(lens), np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    w, v, deg = walks[alive], verts[alive], lens[alive]
    if weighted:
        # weight-proportional deterministic draw: the mixed index runs
        # over the integer total strength; the chosen neighbor is the
        # first (dst-ascending) whose cumulative weight exceeds it —
        # identical to the SQL oracle's windowed cumulative-sum rule.
        wts = blk["weight"][idx_arr][order]
        wts = np.round(wts).astype(np.int64)
        cum = np.cumsum(wts)
        alive_idx = np.flatnonzero(alive)
        nxt = np.empty(len(w), np.int64)
        for i, ai in enumerate(alive_idx):
            lo = int(offs[ai])
            ln = int(lens[ai])
            base = cum[lo - 1] if lo > 0 else 0
            seg = cum[lo : lo + ln] - base
            total = int(seg[-1])
            choice = int(((w[i] % _M) * _A + np.int64(step) * _B
                          + (v[i] % _M) * _C) % total)
            nxt[i] = d_sorted[lo + int(np.searchsorted(seg, choice,
                                                       side="right"))]
        return w, nxt
    choice = ((w % _M) * _A + np.int64(step) * _B + (v % _M) * _C) % deg
    nxt = d_sorted[offs[alive] + choice]
    return w, nxt


def random_walks(
    graph: Graph,
    starts: Sequence[int],
    length: int,
    num_partitions: Optional[int] = None,
    weighted: bool = False,
) -> ray.data.Dataset:
    """(walk, step, vertex): the deterministic walk from each start
    (walk id = start vertex, step 0 = the start itself), truncated at
    sinks.  Parallel edges participate with multiplicity (the index
    runs over the sorted out-neighbor multiset, matching the
    reference's uniform-over-edges draw shape); self-loops are dropped
    — the engine-wide CSR contract (graph.py "out" variant), a
    documented deviation from the reference's loop-keeping draw."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    csr = graph.csr_index("out", num_partitions, weighted=weighted)
    blocks = csr.block_descriptors()

    walks = np.asarray(sorted(set(int(s) for s in starts)), dtype=np.int64)
    verts = walks.copy()
    out_w = [walks.copy()]
    out_s = [np.zeros(len(walks), np.int64)]
    out_v = [verts.copy()]

    for step in range(length):
        if len(walks) == 0:
            break
        futs = []
        for (vlo, vhi, ref) in blocks:
            sel = (verts >= vlo) & (verts <= vhi)
            if sel.any():
                futs.append(_step_block.remote(ref, walks[sel], verts[sel],
                                               step, weighted))
        parts = ray.get(futs)
        if not parts:
            break
        walks = np.concatenate([p[0] for p in parts])
        verts = np.concatenate([p[1] for p in parts])
        order = np.argsort(walks)
        walks, verts = walks[order], verts[order]
        if len(walks) == 0:
            break
        out_w.append(walks.copy())
        out_s.append(np.full(len(walks), step + 1, np.int64))
        out_v.append(verts.copy())

    t = pa.table({"walk": pa.array(np.concatenate(out_w)),
                  "step": pa.array(np.concatenate(out_s)),
                  "vertex": pa.array(np.concatenate(out_v))})
    return ray.data.from_arrow(t)
