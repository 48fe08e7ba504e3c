"""Maximum cardinality search and chordality — the engine's
igraph_maximum_cardinality_search / igraph_is_chordal
(/root/reference/src/decomposition.c:56, 252; Tarjan & Yannakakis,
SIAM J. Comput. 13:566 (1984)).

MCS visits vertices one at a time, always picking the unvisited vertex
with the most visited neighbors; ranks are assigned n-1..0 in pick
order (the reference's i := n countdown). The reference breaks ties by
its bucket-list order; the engine's deterministic rule is the smallest
vertex id — any MCS order is a perfect elimination order iff the graph
is chordal, so the chordal verdict is tie-independent (TY theorem 2)
while ranks and fill-in are deterministic under the engine rule.

Chordality + fill-in: the elimination game along the MCS order —
eliminating vertices in rank-ascending order, each vertex's
later-neighbors must form a clique; missing pairs are the fill-in
edges (added to the working adjacency, like the reference's fill-in
that yields a chordalized graph). Chordal iff the fill is empty.

The pick loop is sequential (each pick changes the counts the next
pick reads), so it runs inside ONE Ray task over the broadcast
aggregated undirected arrays (fastgreedy.und_arrays_ref), guarded by
``max_edges`` like the other sequential-merge algorithms.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import ray

from igraph_ray.graph import Graph
from igraph_ray.algorithms.fastgreedy import _aggregate_und, und_arrays_ref


def _mcs_fill(lo, hi, n: int):
    adj = [set() for _ in range(n)]
    for a, b in zip(lo, hi):
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))
    size = np.zeros(n, np.int64)
    alpha = np.full(n, -1, np.int64)
    visited = np.zeros(n, bool)
    for step in range(n):
        # max visited-neighbor count, smallest id on ties (argmax rule)
        masked = np.where(visited, -1, size)
        v = int(np.argmax(masked))
        alpha[v] = n - 1 - step
        visited[v] = True
        for w in adj[v]:
            if not visited[w]:
                size[w] += 1
    # elimination game in rank-ascending order over a working copy
    order = np.argsort(alpha)  # rank 0 first
    fill: list = []
    eliminated = np.zeros(n, bool)
    for v in order:
        v = int(v)
        later = [w for w in adj[v] if not eliminated[w] and w != v]
        later.sort()
        for i in range(len(later)):
            for j in range(i + 1, len(later)):
                a, b = later[i], later[j]
                if b not in adj[a]:
                    adj[a].add(b)
                    adj[b].add(a)
                    fill.append((a, b))
        eliminated[v] = True
    fill.sort()
    return alpha, fill


def mcs_chordal(
    graph: Graph,
    n: int | None = None,
    max_edges: int = 1 << 21,
) -> Tuple[pa.Table, bool, pa.Table]:
    """Returns (alpha, chordal, fill_in): alpha = (vertex, rank) over
    0..n-1, fill_in = (src, dst) canonical pairs whose addition
    chordalizes the graph along the MCS order (empty iff chordal)."""
    n = n if n is not None else graph.num_vertices()
    agg = _aggregate_und(graph).materialize()
    ne = agg.count()
    if ne > max_edges:
        raise NotImplementedError(
            f"MCS pick loop runs in one task; guarded to {max_edges} "
            f"aggregated edges ({ne} present)")
    arrays = und_arrays_ref(agg)

    @ray.remote
    def _run(arrs):
        lo, hi, _w = arrs
        return _mcs_fill(lo, hi, n)

    alpha, fill = ray.get(_run.remote(arrays))
    alpha_t = pa.table({
        "vertex": pa.array(np.arange(n, dtype=np.int64)),
        "rank": pa.array(alpha)})
    fill_t = pa.table({
        "src": pa.array([a for a, _ in fill], pa.int64()),
        "dst": pa.array([b for _, b in fill], pa.int64())})
    return alpha_t, len(fill) == 0, fill_t
