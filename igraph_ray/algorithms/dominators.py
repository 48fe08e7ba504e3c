"""Dominator tree — the engine's igraph_dominator_tree
(/root/reference/src/st-cuts.c:388, Lengauer–Tarjan with LINK/EVAL).

v dominates w (w.r.t. root r) iff every path r→w passes through v; the
immediate dominators form a tree. The engine computes it with the
iterative RPO dataflow algorithm (Cooper, Harvey & Kennedy, "A simple,
fast dominance algorithm", 2001 — public): process vertices in reverse
postorder, idom(w) = the pairwise `intersect` (finger walk up the
current tree by RPO number) of all processed predecessors, repeat to
fixpoint. The dominator tree is unique, so the result matches the
reference's Lengauer–Tarjan output exactly.

Like the other inherently-sequential algorithms (fastgreedy, walktrap,
Gomory–Hu), the loop runs inside ONE Ray task over the broadcast edge
arrays — the edges never land on the driver — guarded by ``max_edges``.
The SQL oracle is definitional: w's strict dominators are root plus
every v whose removal cuts w from root (one simultaneous
recursive-CTE reachability per removed vertex), and idom(w) is w's
strict dominator with the largest strict-dominator set of its own
(dominators of a vertex form a chain, so the maximum is unique).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.graph import Graph


@ray.remote
def _edge_cols(t: pa.Table):
    if t is None or t.num_rows == 0 or "src" not in t.column_names:
        return (np.array([], np.int64), np.array([], np.int64))
    return (t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["dst"].to_numpy(zero_copy_only=False).astype(np.int64))


def directed_arrays_ref(edges: ray.data.Dataset):
    """ObjectRef to the (src, dst) numpy arrays of a directed edge
    table, assembled task-side from block refs (driver never sees
    edge data) — the directed sibling of fastgreedy.und_arrays_ref."""
    from igraph_ray.util import _concat_tables, drop_empty_blocks

    refs = drop_empty_blocks(edges).to_arrow_refs()
    if not refs:
        return ray.put((np.array([], np.int64), np.array([], np.int64)))
    return _edge_cols.remote(_concat_tables.remote(refs))


def _chk_dominators(src, dst, n: int, root: int):
    """Cooper–Harvey–Kennedy iteration. Returns (vertices, idoms) for
    reachable vertices except the root, ascending vertex id."""
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    starts = np.searchsorted(src, np.arange(n + 1))
    # deterministic iterative DFS (ascending neighbors) for postorder
    post: list = []
    state = np.zeros(n, np.int8)  # 0 unseen, 1 on stack, 2 done
    stack = [(root, int(starts[root]))]
    state[root] = 1
    while stack:
        v, it = stack.pop()
        while it < starts[v + 1] and state[dst[it]] != 0:
            it += 1
        if it < starts[v + 1]:
            w = int(dst[it])
            stack.append((v, it + 1))
            stack.append((w, int(starts[w])))
            state[w] = 1
        else:
            state[v] = 2
            post.append(v)
    rpo = post[::-1]
    num = np.full(n, -1, np.int64)  # RPO number, -1 = unreachable
    for k, v in enumerate(rpo):
        num[v] = k
    # predecessor lists restricted to reachable vertices
    keep = (num[src] >= 0) & (num[dst] >= 0)
    psrc, pdst = src[keep], dst[keep]
    pord = np.lexsort((psrc, pdst))
    psrc, pdst = psrc[pord], pdst[pord]
    pstarts = np.searchsorted(pdst, np.arange(n + 1))

    idom = np.full(n, -1, np.int64)
    idom[root] = root

    def intersect(a: int, b: int) -> int:
        while a != b:
            while num[a] > num[b]:
                a = int(idom[a])
            while num[b] > num[a]:
                b = int(idom[b])
        return a

    changed = True
    while changed:
        changed = False
        for w in rpo:
            if w == root:
                continue
            new = -1
            for k in range(int(pstarts[w]), int(pstarts[w + 1])):
                p = int(psrc[k])
                if idom[p] < 0:
                    continue
                new = p if new < 0 else intersect(p, new)
            if new >= 0 and idom[w] != new:
                idom[w] = new
                changed = True
    verts = np.array([v for v in rpo if v != root], np.int64)
    verts.sort()
    return verts, idom[verts]


def dominator_tree(
    graph: Graph,
    root: int,
    n: int | None = None,
    max_edges: int = 1 << 22,
) -> pa.Table:
    """(vertex, idom) rows for every root-reachable vertex except the
    root itself (igraph_dominator_tree contract: unreachable vertices
    carry no dominator; the reference marks them -2 and we omit them).
    """
    n = n if n is not None else graph.num_vertices()
    ne = int(graph.edges.count())
    if ne > max_edges:
        raise NotImplementedError(
            f"dominator fixpoint runs in one task; guarded to "
            f"{max_edges} edges ({ne} present)")
    arrays = directed_arrays_ref(graph.edges)

    @ray.remote
    def _dom(arrs):
        s, d = arrs
        return _chk_dominators(s, d, n, root)

    verts, idoms = ray.get(_dom.remote(arrays))
    return pa.table({"vertex": pa.array(verts, pa.int64()),
                     "idom": pa.array(idoms, pa.int64())})
