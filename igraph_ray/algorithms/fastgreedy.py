"""Clauset–Newman–Moore greedy modularity community detection.

Reference semantics: igraph_community_fastgreedy
(/root/reference/src/fast_community.c — CNM 2004): start with every
vertex its own community, repeatedly merge the CONNECTED community pair
with the largest modularity gain ΔQ = 2·(e_ij − a_i·a_j) (normalized by
2m), recording the merge order and the modularity after each step; the
returned partition is the cut with maximum Q. Weighted edges follow the
reference's weighted branch (weights sum into e_ij / a_i).

Distributed shape: the community-graph weights come from one
distributed groupby (canonical (lo, hi) sum-of-weights) plus a grouped
strength aggregation; the merge loop itself is inherently sequential —
like the reference, which holds the whole dheap in memory — so it runs
inside ONE Ray task over the broadcast aggregated arrays, guarded by
``max_edges`` (same honest-ceiling style as maximal_cliques / GN). The
scale path for modularity communities is algorithms/louvain.py.

Ties break deterministically: max ΔQ, then smallest (i, j) community
pair, communities named by their minimum original vertex id.
"""

from __future__ import annotations

import heapq
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from igraph_ray.graph import Graph


def _aggregate_und(graph: Graph) -> ray.data.Dataset:
    """Distributed canonical weighted undirected aggregation:
    (lo, hi, w) with parallel edges' weights summed, loops dropped."""
    def _canon(b: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(b["src"], b["dst"])
        hi = pc.max_element_wise(b["src"], b["dst"])
        w = (pc.cast(b["weight"], pa.float64())
             if "weight" in b.column_names
             else pa.array(np.ones(b.num_rows), pa.float64()))
        return pa.table({"lo": lo, "hi": hi, "w": w})

    def _pre(b: pa.Table) -> pa.Table:  # per-batch combiner
        return b.group_by(["lo", "hi"]).aggregate([("w", "sum")]).rename_columns(
            ["lo", "hi", "w"])

    return (graph.without_loops()
            .map_batches(_canon, batch_format="pyarrow", batch_size=None)
            .map_batches(_pre, batch_format="pyarrow", batch_size=None)
            .groupby(["lo", "hi"]).sum("w"))


@ray.remote
def _cols_task(t: pa.Table):
    if t is None or t.num_rows == 0 or "lo" not in t.column_names:
        return (np.array([], np.int64), np.array([], np.int64),
                np.array([], np.float64))
    return (t["lo"].to_numpy(zero_copy_only=False),
            t["hi"].to_numpy(zero_copy_only=False),
            t["sum(w)"].to_numpy(zero_copy_only=False).astype(np.float64))


def und_arrays_ref(agg: ray.data.Dataset):
    """ObjectRef to the (lo, hi, w) numpy arrays of the aggregated
    undirected edge table — assembled task-side from the block refs, so
    the edge data never lands on the driver (the sequential-merge
    community algorithms and the connectivity flows consume it inside
    one worker task)."""
    from igraph_ray.util import _concat_tables, drop_empty_blocks

    refs = drop_empty_blocks(agg).to_arrow_refs()
    if not refs:
        return ray.put((np.array([], np.int64), np.array([], np.int64),
                        np.array([], np.float64)))
    return _cols_task.remote(_concat_tables.remote(refs))


def community_fastgreedy(
    graph: Graph,
    n: Optional[int] = None,
    max_edges: int = 1 << 21,
) -> Tuple[pa.Table, pa.Table]:
    """Returns (merges, membership):

    * merges — one row per step: (step, c1, c2, q_e9) — the two merged
      communities (named by min original vertex id, c1 < c2; the merged
      community keeps name c1) and modularity ×10⁹ (rounded) AFTER the
      merge.
    * membership — (vertex, community) at the maximum-modularity cut,
      community ids dense-ranked by minimum member vertex.
    """
    n = n if n is not None else graph.num_vertices()
    agg = _aggregate_und(graph).materialize()
    ne = agg.count()
    if ne > max_edges:
        raise NotImplementedError(
            f"CNM's merge heap is sequential; guarded to {max_edges} "
            f"aggregated edges ({ne} present) — use louvain() at scale")
    arrays = und_arrays_ref(agg)

    @ray.remote
    def _cnm(arrs):
        lo, hi, w = arrs
        W = w.sum()
        if W <= 0:
            member = np.arange(n, dtype=np.int64)
            return ([], member)
        # normalized quantities (CNM 2004 eq. 2): e[i][j], a[i]
        inv2m = 1.0 / (2.0 * W)
        e: list = [dict() for _ in range(n)]
        a = np.zeros(n, dtype=np.float64)
        for i in range(len(lo)):
            x, y, ww = int(lo[i]), int(hi[i]), w[i] * inv2m
            e[x][y] = e[x].get(y, 0.0) + ww
            e[y][x] = e[y].get(x, 0.0) + ww
            a[x] += ww
            a[y] += ww
        q = -float((a * a).sum())
        alive = np.ones(n, dtype=bool)
        heap: list = []
        for x in range(n):
            for y, exy in e[x].items():
                if y > x:
                    dq = 2.0 * (exy - a[x] * a[y])
                    heapq.heappush(heap, (-dq, x, y))
        merges = []
        # lazy-deletion heap: entries are stale once either endpoint
        # merged away or the stored dq no longer matches
        while heap:
            ndq, x, y = heapq.heappop(heap)
            if not (alive[x] and alive[y]) or y not in e[x]:
                continue
            cur = 2.0 * (e[x][y] - a[x] * a[y])
            if abs(-ndq - cur) > 1e-15:
                continue  # stale score, a fresh entry exists
            # merge y into x (x < y by construction at push time)
            q += cur
            merges.append((x, y, q))
            alive[y] = False
            del e[x][y]
            del e[y][x]
            for z, eyz in list(e[y].items()):
                del e[z][y]
                e[x][z] = e[x].get(z, 0.0) + eyz
                e[z][x] = e[x][z]
            e[y].clear()
            a[x] += a[y]
            a[y] = 0.0
            for z, exz in e[x].items():
                dq = 2.0 * (exz - a[x] * a[z])
                p, r = (x, z) if x < z else (z, x)
                heapq.heappush(heap, (-dq, p, r))

        # best-cut replay in-task via union-find (the merged community
        # keeps the smaller name, so roots stay the community names)
        parent = np.arange(n, dtype=np.int64)

        def find(v: int) -> int:
            while parent[v] != v:
                parent[v] = parent[parent[v]]
                v = parent[v]
            return v

        if merges:
            qs = np.array([m[2] for m in merges])
            best = int(np.argmax(qs))
            for x, y, _ in merges[: best + 1]:
                parent[find(y)] = find(x)
        member = np.array([find(v) for v in range(n)], dtype=np.int64)
        return merges, member

    merges, member_best = ray.get(_cnm.remote(arrays))

    # best cut: max Q over the sequence (ties -> earliest, matching the
    # reference's argmax over the modularity vector)
    steps = pa.table({
        "step": pa.array(np.arange(len(merges), dtype=np.int64)),
        "c1": pa.array([m[0] for m in merges], pa.int64()),
        "c2": pa.array([m[1] for m in merges], pa.int64()),
        "q_e9": pa.array([int(round(m[2] * 1e9)) for m in merges],
                         pa.int64()),
    })
    # dense-rank by min member vertex (community name IS the min vertex,
    # so rank over sorted unique names)
    uniq, inv = np.unique(member_best, return_inverse=True)
    membership = pa.table({
        "vertex": pa.array(np.arange(n, dtype=np.int64)),
        "community": pa.array(inv.astype(np.int64)),
    })
    return steps, membership
