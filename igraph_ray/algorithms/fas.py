"""Feedback arc set, Eades–Lin–Smyth GR approximation — the engine's
igraph_feedback_arc_set(IGRAPH_FAS_APPROX_EADES)
(/root/reference/src/feedback_arc_set.c:191; Eades, Lin & Smyth, "A
fast and effective heuristic for the feedback arc set problem", IPL
47:319 (1993)).

The GR loop builds a vertex ordering by repeatedly stripping sources
to the front and sinks to the back, and otherwise moving the vertex
with the largest outstrength−instrength difference to the front; the
feedback arc set is the back edges of that ordering. For simple
digraphs without 2-cycles the ordering guarantees |FAS| ≤ m/2 − n/6.

The strip loop is inherently sequential (each removal changes the
degrees the next decision reads), so — like fastgreedy/walktrap/
dominators — it runs inside ONE Ray task over the broadcast edge
arrays, guarded by ``max_edges``. Deterministic tie rules replace the
reference's incidence-order queues: initial scans ascending by vertex
id, FIFO queues, neighbor updates in sorted order, max-diff ties to
the smallest vertex id — output is a pure function of the edge set.
"""

from __future__ import annotations

from collections import deque

import numpy as np
import pyarrow as pa
import ray

from igraph_ray.graph import Graph


def _eades_positions(src, dst, w, n: int) -> np.ndarray:
    """Final ordering position per vertex (0..n-1, front to back)."""
    order = np.lexsort((dst, src))
    osrc, odst, ow = src[order], dst[order], w[order]
    ostarts = np.searchsorted(osrc, np.arange(n + 1))
    order2 = np.lexsort((src, dst))
    isrc, idst, iw = src[order2], dst[order2], w[order2]
    istarts = np.searchsorted(idst, np.arange(n + 1))

    indeg = np.bincount(dst, minlength=n).astype(np.int64)
    outdeg = np.bincount(src, minlength=n).astype(np.int64)
    instr = np.bincount(dst, weights=w, minlength=n)
    outstr = np.bincount(src, weights=w, minlength=n)

    pos_front: list = []
    pos_back: list = []
    removed = np.zeros(n, bool)
    left = n
    sources: deque = deque()
    sinks: deque = deque()
    for v in range(n):
        if indeg[v] == 0 and outdeg[v] == 0:
            pos_front.append(v)  # isolated: reference assigns next front
            removed[v] = True
            left -= 1
        elif indeg[v] == 0:
            sources.append(v)
        elif outdeg[v] == 0:
            sinks.append(v)

    def drop_out(v: int):
        for k in range(int(ostarts[v]), int(ostarts[v + 1])):
            t = int(odst[k])
            if removed[t]:
                continue
            indeg[t] -= 1
            instr[t] -= ow[k]
            if indeg[t] == 0:
                sources.append(t)

    def drop_in(v: int):
        for k in range(int(istarts[v]), int(istarts[v + 1])):
            s = int(isrc[k])
            if removed[s]:
                continue
            outdeg[s] -= 1
            outstr[s] -= iw[k]
            if outdeg[s] == 0:
                sinks.append(s)

    while left > 0:
        while sources:
            v = sources.popleft()
            if removed[v]:
                continue
            pos_front.append(v)
            removed[v] = True
            left -= 1
            drop_out(v)
        while sinks:
            v = sinks.popleft()
            if removed[v]:
                continue
            pos_back.append(v)
            removed[v] = True
            left -= 1
            drop_in(v)
        if left > 0 and not sources:
            diff = np.where(removed, -np.inf, outstr - instr)
            v = int(np.argmax(diff))  # np.argmax: smallest index wins ties
            pos_front.append(v)
            removed[v] = True
            left -= 1
            drop_out(v)
            drop_in(v)
    pos = np.empty(n, np.int64)
    ordering = pos_front + pos_back[::-1]
    for p, v in enumerate(ordering):
        pos[v] = p
    return pos


def feedback_arc_set(
    graph: Graph,
    n: int | None = None,
    max_edges: int = 1 << 22,
) -> pa.Table:
    """Back edges (src, dst) of the Eades GR ordering — removing them
    makes the graph acyclic. Weighted graphs use edge weights as the
    strengths, like the reference's weighted branch."""
    n = n if n is not None else graph.num_vertices()
    ne = int(graph.edges.count())
    if ne > max_edges:
        raise NotImplementedError(
            f"Eades GR strip loop runs in one task; guarded to "
            f"{max_edges} edges ({ne} present)")
    edges = graph.without_loops()
    has_w = graph.weighted

    @ray.remote
    def _cols(t: pa.Table):
        if t is None or t.num_rows == 0 or "src" not in t.column_names:
            return (np.array([], np.int64), np.array([], np.int64),
                    np.array([], np.float64))
        w = (t["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
             if has_w and "weight" in t.column_names
             else np.ones(t.num_rows, np.float64))
        return (t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                t["dst"].to_numpy(zero_copy_only=False).astype(np.int64), w)

    from igraph_ray.util import _concat_tables, drop_empty_blocks

    refs = drop_empty_blocks(edges).to_arrow_refs()
    if not refs:
        return pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64())})
    arrays = _cols.remote(_concat_tables.remote(refs))

    @ray.remote
    def _fas(arrs):
        s, d, w = arrs
        if not len(s):
            return (np.array([], np.int64), np.array([], np.int64))
        pos = _eades_positions(s, d, w, n)
        back = pos[s] > pos[d]
        out = np.lexsort((d[back], s[back]))
        return (s[back][out], d[back][out])

    s, d = ray.get(_fas.remote(arrays))
    return pa.table({"src": pa.array(s, pa.int64()),
                     "dst": pa.array(d, pa.int64())})
