"""Flow-graph utility transforms and disjoint-path counts — the
engine's counterpart of the reference's st-cuts.c / flow.c helper
surface:

* igraph_even_tarjan_reduction (st-cuts.c:51) — vertex-splitting
  reduction: vertex i becomes i' = i and i'' = i + n, a unit-capacity
  splitter arc (i', i'') per vertex, and each original edge (f, t)
  becomes the two arcs (f'', t') and (t'', f'), capacity n (the
  reference's stand-in for +inf).
* igraph_residual_graph (st-cuts.c:104,148) — arcs with positive
  residual capacity; the reference reports the ORIGINAL capacity as
  the residual arc's capacity (st-cuts.c:131-136), reproduced here.
* igraph_reverse_residual_graph (st-cuts.c:177,218) — per edge: a
  forward arc (f, t) iff flow > 0 and a backward arc (t, f) iff
  flow < capacity.
* igraph_edge_disjoint_paths (flow.c:2177) — maxflow with unit
  capacities = st edge connectivity (Menger).
* igraph_vertex_disjoint_paths (flow.c:2218) — st vertex connectivity
  with NEI_IGNORE; if s and t are adjacent every (possibly directed)
  s-t edge is removed first and 1 is added to the result.
* igraph_adhesion / igraph_cohesion (flow.c:2311,2344) — aliases of
  edge / vertex connectivity (White & Harary 2001 naming).

All three graph transforms are single vectorized map_batches passes —
no shuffle, no driver loop — and stream at any scale. The disjoint-path
counts delegate to the existing distributed push-relabel maxflow
(algorithms/flow.py)."""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data


def even_tarjan_reduction(edges: ray.data.Dataset,
                          n: int) -> ray.data.Dataset:
    """(src, dst, capacity) arcs of the Even–Tarjan split graph over
    vertex universe 0..n-1 (st-cuts.c:51)."""
    def _split(b: pa.Table) -> pa.Table:
        f = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([f + n, t + n])
        dst = np.concatenate([t, f])
        cap = np.full(2 * len(f), float(n))
        return pa.table({"src": pa.array(src), "dst": pa.array(dst),
                         "capacity": pa.array(cap)})

    splitters = ray.data.range(n).map_batches(
        lambda b: pa.table({
            "src": b["id"],
            "dst": pa.array(b["id"].to_numpy(zero_copy_only=False) + n),
            "capacity": pa.array(np.ones(b.num_rows, np.float64))}),
        batch_format="pyarrow", batch_size=None)
    arcs = edges.map_batches(_split, batch_format="pyarrow",
                             batch_size=None)
    return splitters.union(arcs)


def residual_graph(edges: ray.data.Dataset) -> ray.data.Dataset:
    """``edges`` carries (src, dst, capacity, flow); returns the arcs
    with capacity - flow > 0 as (src, dst, capacity) — capacity is the
    original one, matching st-cuts.c:131-136 verbatim (the callers
    only use the residual graph's topology)."""
    def _res(b: pa.Table) -> pa.Table:
        c = b["capacity"].to_numpy(zero_copy_only=False)
        f = b["flow"].to_numpy(zero_copy_only=False)
        keep = (c - f) > 0
        return pa.table({
            "src": pa.array(b["src"].to_numpy(zero_copy_only=False)[keep]),
            "dst": pa.array(b["dst"].to_numpy(zero_copy_only=False)[keep]),
            "capacity": pa.array(c[keep])})

    return edges.map_batches(_res, batch_format="pyarrow",
                             batch_size=None)


def reverse_residual_graph(edges: ray.data.Dataset) -> ray.data.Dataset:
    """``edges`` carries (src, dst, flow) and optionally capacity
    (default 1, st-cuts.c:190); returns (src, dst) arcs: (f, t) iff
    flow > 0, (t, f) iff flow < capacity (st-cuts.c:177-216)."""
    def _rev(b: pa.Table) -> pa.Table:
        f = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        fl = b["flow"].to_numpy(zero_copy_only=False)
        cap = (b["capacity"].to_numpy(zero_copy_only=False)
               if "capacity" in b.column_names
               else np.ones(len(f), np.float64))
        fwd = fl > 0
        bwd = fl < cap
        return pa.table({
            "src": pa.array(np.concatenate([f[fwd], t[bwd]])),
            "dst": pa.array(np.concatenate([t[fwd], f[bwd]]))})

    return edges.map_batches(_rev, batch_format="pyarrow",
                             batch_size=None)


def edge_disjoint_paths(edges: ray.data.Dataset, source: int,
                        target: int, n: Optional[int] = None,
                        directed: bool = True,
                        num_partitions: int = 4) -> int:
    """flow.c:2177 — Menger: maxflow with unit arc capacities."""
    from igraph_ray.algorithms.flow import st_edge_connectivity

    if source == target:
        raise ValueError("source == target is unimplemented in the "
                         "reference too (flow.c:2184)")
    return st_edge_connectivity(edges, source, target, n=n,
                                directed=directed,
                                num_partitions=num_partitions)


def vertex_disjoint_paths(edges: ray.data.Dataset, source: int,
                          target: int, n: Optional[int] = None,
                          directed: bool = True,
                          num_partitions: int = 4) -> int:
    """flow.c:2218 — st vertex connectivity with NEI_IGNORE; adjacent
    s, t lose every (directed) s-t edge first and gain +1."""
    from igraph_ray.algorithms.flow import st_vertex_connectivity

    if source == target:
        raise ValueError("source == target is unimplemented in the "
                         "reference too (flow.c:2226)")
    def _is_st(b: pa.Table) -> np.ndarray:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        m = (s == source) & (d == target)
        if not directed:
            m |= (s == target) & (d == source)
        return m

    pred = (f"(src == {source} and dst == {target})"
            if directed else
            f"(src == {source} and dst == {target}) or "
            f"(src == {target} and dst == {source})")
    adjacent = edges.filter(expr=pred).count() > 0
    if adjacent:
        stripped = edges.map_batches(
            lambda b: b.filter(pa.array(~_is_st(b))),
            batch_format="pyarrow", batch_size=None)
        return 1 + st_vertex_connectivity(
            stripped, source, target, n=n, directed=directed,
            neighbors="ignore", num_partitions=num_partitions)
    return st_vertex_connectivity(edges, source, target, n=n,
                                  directed=directed, neighbors="ignore",
                                  num_partitions=num_partitions)
