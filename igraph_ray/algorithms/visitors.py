"""BFS / DFS visitor orders (igraph_bfs / igraph_dfs, visitors.c:26,395).

The reference's visitors walk the graph in adjacency-list insertion
order and invoke C callbacks per event; the useful *data* outputs are
the per-vertex visit metadata vectors (order, rank, father, dist).
This module computes those tables with deterministic SORTED-neighbor
order (documented deviation: the engine's edge tables carry no
insertion order, and sorted order is reproducible at any partitioning).

- ``bfs_visitor``: distributed level-synchronous FIFO replay. With
  sorted adjacency, the queue order is fully determined level by
  level: a vertex's father is its earliest-ranked previous-level
  in-neighbor, and within a level the queue order is
  (father_rank, vertex) ascending. Each level is one broadcast join +
  one grouped min + one anti-join + one rank-assignment sort; ranks
  are assigned from per-block row counts only (no vertex data lands
  on the driver — the dense_rank_map pattern, util.py).

- ``dfs_visitor``: inherently sequential (stack discipline is a
  chain of data dependencies); runs in ONE Ray task over the
  object-store (src, dst) arrays ref with an explicit size guard,
  like dominators/chordal/cohesive.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.util import hash_join, _block_rows

# rank/father packing guard: ranks and vertex ids must each fit 2^31
_PACK_LIMIT = np.int64(1) << 31


@ray.remote
def _rank_rows_block(t: pa.Table, offset: int, dist: int) -> pa.Table:
    n = t.num_rows
    return pa.table({
        "vertex": t["vertex"],
        "rank": pa.array(np.arange(offset, offset + n), pa.int64()),
        "father": t["father"],
        "dist": pa.array(np.full(n, dist, np.int64)),
    })


def bfs_visitor(
    graph: Graph,
    source: int,
    num_partitions: int = 8,
    max_levels: int = 64,
) -> ray.data.Dataset:
    """(vertex, rank, father, dist) of the deterministic BFS from
    ``source`` over the directed out-adjacency — igraph_bfs's order /
    father / dist vectors (visitors.c:26) under sorted-neighbor
    order, single root (no component restarts). Root father = -1."""
    edges = graph.edges.map_batches(
        lambda b: pa.table({"tail": b["src"], "nxt": b["dst"]}),
        batch_format="pyarrow", batch_size=None).materialize()
    settled = ray.data.from_arrow(pa.table({
        "vertex": pa.array([source], pa.int64()),
        "rank": pa.array([0], pa.int64()),
        "father": pa.array([-1], pa.int64()),
        "dist": pa.array([0], pa.int64())}))
    frontier = settled.select_columns(["vertex", "rank"]).materialize()
    base = 1  # queue positions assigned so far (driver scalar only)
    for level in range(1, max_levels + 2):
        j = hash_join(
            frontier.map_batches(
                lambda b: pa.table({"tail": b["vertex"],
                                    "frank": b["rank"]}),
                batch_format="pyarrow", batch_size=None),
            edges, on="tail", num_partitions=num_partitions)

        def _pack(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "nxt" not in b.column_names:
                return pa.table({"vertex": pa.array([], pa.int64()),
                                 "packed": pa.array([], pa.int64())})
            fr = b["frank"].to_numpy(zero_copy_only=False).astype(np.int64)
            fa = b["tail"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(fr) and (fr.max() >= _PACK_LIMIT or fa.max() >= _PACK_LIMIT):
                raise NotImplementedError(
                    "bfs_visitor packs (father_rank, father) into one "
                    "int64; ranks/ids must fit 2^31 each")
            t = pa.table({"vertex": b["nxt"],
                          "packed": pa.array(fr * (_PACK_LIMIT * 2) + fa)})
            # per-batch pre-combine before the shuffle min
            return (t.group_by("vertex").aggregate([("packed", "min")])
                    .rename_columns(["vertex", "packed"]))

        cand = (j.map_batches(_pack, batch_format="pyarrow", batch_size=None)
                .groupby("vertex").min("packed"))
        cand = hash_join(
            cand.map_batches(
                lambda b: (pa.table({"vertex": b["vertex"],
                                     "packed": b["min(packed)"]})
                           if b.num_rows else
                           pa.table({"vertex": pa.array([], pa.int64()),
                                     "packed": pa.array([], pa.int64())})),
                batch_format="pyarrow", batch_size=None),
            settled.select_columns(["vertex"]), on="vertex",
            num_partitions=num_partitions, join_type="left_anti")

        def _unpack(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"vertex": pa.array([], pa.int64()),
                                 "frank": pa.array([], pa.int64()),
                                 "father": pa.array([], pa.int64())})
            p = b["packed"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"vertex": b["vertex"],
                             "frank": pa.array(p // (_PACK_LIMIT * 2)),
                             "father": pa.array(p % (_PACK_LIMIT * 2))})

        lvl = (cand.map_batches(_unpack, batch_format="pyarrow",
                                batch_size=None)
               .sort(["frank", "vertex"]).materialize())
        # rank assignment from block row counts only
        refs = lvl.to_arrow_refs()
        sizes = ray.get([_block_rows.remote(r) for r in refs])
        total = int(sum(sizes))
        if total == 0:
            break
        if level > max_levels:
            raise RuntimeError(f"BFS exceeded max_levels={max_levels}")
        offsets = np.zeros(len(sizes), dtype=np.int64)
        np.cumsum(sizes[:-1], out=offsets[1:])
        out_refs = [_rank_rows_block.remote(r, base + int(off), level)
                    for r, off, n in zip(refs, offsets, sizes) if n > 0]
        ranked = ray.data.from_arrow_refs(out_refs)
        base += total
        settled = settled.union(ranked).materialize()
        frontier = ranked.select_columns(["vertex", "rank"]).materialize()
    return settled.sort("vertex")


# --------------------------------------------------------------- DFS

_DFS_GUARD_EDGES = 64_000_000


@ray.remote
def _dfs_task(arrays, source: int, n_hint: int):
    src, dst = arrays
    if len(src) > _DFS_GUARD_EDGES:
        raise NotImplementedError(
            f"dfs_visitor single-task plan is guarded at "
            f"{_DFS_GUARD_EDGES} edges (DFS stack order is a sequential "
            f"chain of dependencies; see visitors.c:395)")
    n = int(max(n_hint, (max(src.max(), dst.max()) + 1) if len(src) else 0,
                source + 1))
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    starts = np.searchsorted(src, np.arange(n + 1))
    disc = np.full(n, -1, np.int64)   # discovery order
    fin = np.full(n, -1, np.int64)    # finish (out) order
    father = np.full(n, -1, np.int64)
    dist = np.full(n, -1, np.int64)
    nd, nf = 0, 0
    stack = [(int(source), int(starts[source]))]
    disc[source] = nd; nd += 1
    dist[source] = 0
    while stack:
        v, it = stack.pop()
        while it < starts[v + 1] and disc[dst[it]] >= 0:
            it += 1
        if it < starts[v + 1]:
            w = int(dst[it])
            stack.append((v, it + 1))
            stack.append((w, int(starts[w])))
            disc[w] = nd; nd += 1
            father[w] = v
            dist[w] = dist[v] + 1
        else:
            fin[v] = nf; nf += 1
    seen = np.flatnonzero(disc >= 0)
    return pa.table({"vertex": pa.array(seen.astype(np.int64)),
                     "order": pa.array(disc[seen]),
                     "order_out": pa.array(fin[seen]),
                     "father": pa.array(father[seen]),
                     "dist": pa.array(dist[seen])})


def dfs_visitor(graph: Graph, source: int) -> ray.data.Dataset:
    """(vertex, order, order_out, father, dist) of the deterministic
    ascending-neighbor DFS from ``source`` over the directed
    out-adjacency — igraph_dfs's order / order_out / father / dist
    vectors (visitors.c:395), single root. Sequential by nature: ONE
    guarded Ray task over the object-store edge arrays."""
    from igraph_ray.algorithms.dominators import directed_arrays_ref

    ref = directed_arrays_ref(graph.edges)
    return ray.data.from_arrow(ray.get(_dfs_task.remote(ref, source, 0)))


def unfold_tree(
    graph: Graph,
    source: int,
    n: int,
    num_partitions: int = 8,
    max_levels: int = 64,
) -> ray.data.Dataset:
    """igraph_unfold_tree (structural_properties.c:5552): convert the
    reachable subgraph into a tree by COPYING every vertex reached
    again through a non-tree edge. Returns (src, dst, dst_orig) —
    tree edges carry dst_orig = dst; each non-tree edge (u, w) becomes
    (u, copy_id, w) with copy ids n, n+1, … assigned in the
    deterministic processing order (queue rank of u, then w ascending —
    the sorted-adjacency reading of the reference's v_ptr++ sequence;
    copies are leaves exactly as in the reference).

    Fully distributed: the BFS ranks come from ``bfs_visitor``; tree
    edges are the father table; non-tree copy ids are one
    block-count-offset rank over the (rank(u), w) sort. Multi-edges are
    deduplicated first (the engine's derived views are simple graphs;
    the reference would copy once per parallel edge)."""
    from igraph_ray.util import hash_join as _hj
    from igraph_ray.ops.relational import _dedup

    bfs = bfs_visitor(graph, source, num_partitions=num_partitions,
                      max_levels=max_levels).materialize()
    tree = bfs.filter(expr="father >= 0").map_batches(
        lambda b: pa.table({"src": b["father"], "dst": b["vertex"],
                            "dst_orig": b["vertex"]}),
        batch_format="pyarrow", batch_size=None)
    edges = _dedup(graph.edges)
    # non-tree edges among reached tails: join u's rank, drop the one
    # father edge per vertex
    j = _hj(edges.map_batches(
        lambda b: pa.table({"u": b["src"], "w": b["dst"]}),
        batch_format="pyarrow", batch_size=None),
        bfs.map_batches(
            lambda b: pa.table({"u": b["vertex"], "ur": b["rank"]}),
            batch_format="pyarrow", batch_size=None),
        on="u", num_partitions=num_partitions)
    j = _hj(j, bfs.map_batches(
        lambda b: pa.table({"w": b["vertex"], "wf": b["father"]}),
        batch_format="pyarrow", batch_size=None),
        on="w", num_partitions=num_partitions)
    nont = j.filter(expr="wf != u")
    if nont.count() == 0:
        return tree.sort(["src", "dst"])
    s = nont.sort(["ur", "w"]).materialize()
    refs = s.to_arrow_refs()
    sizes = ray.get([_block_rows.remote(r) for r in refs])
    offsets = np.zeros(len(sizes), dtype=np.int64)
    np.cumsum(sizes[:-1], out=offsets[1:])

    @ray.remote
    def _copies(t: pa.Table, off: int) -> pa.Table:
        return pa.table({
            "src": t["u"],
            "dst": pa.array(np.arange(n + off, n + off + t.num_rows),
                            pa.int64()),
            "dst_orig": t["w"]})

    out = [_copies.remote(r, int(off))
           for r, off, nn in zip(refs, offsets, sizes) if nn > 0]
    return tree.union(ray.data.from_arrow_refs(out)).sort(["src", "dst"])
