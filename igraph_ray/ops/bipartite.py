"""Bipartite utilities beyond the projection/generator family
(/root/reference/src/bipartite.c): create_bipartite (validated
construction from a types vector, bipartite.c:485), get_incidence
(graph + types → incidence triplets, bipartite.c:694), incidence
(matrix → bipartite graph, bipartite.c:577) and
bipartite_projection_size (projection vertex/edge counts without
materializing the projections, bipartite.c:87).

The engine's natural bipartite form is the two-column incidence table
(side-A id, side-B id); the reference's one-id-space + boolean types
vector maps onto it via the joins below.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.util import dense_rank_map, hash_join


def create_bipartite(types: ray.data.Dataset, edges: ray.data.Dataset,
                     num_partitions: int = 8) -> Graph:
    """Validated bipartite construction (igraph_create_bipartite,
    /root/reference/src/bipartite.c:485-534): every edge must connect a
    type-0 vertex with a type-1 vertex; a violating edge raises, as the
    reference errors with IGRAPH_EINVAL.

    ``types`` columns: (vertex, type∈{0,1}); ``edges``: (src, dst).
    """
    edges = edges.materialize()
    j = hash_join(
        edges.map_batches(
            lambda b: pa.table({"vertex": b["src"], "dst": b["dst"]}),
            batch_format="pyarrow", batch_size=None),
        types, on="vertex", num_partitions=num_partitions)
    j = j.map_batches(
        lambda b: pa.table({"src": b["vertex"], "vertex": b["dst"],
                            "tsrc": b["type"]})
        if b.num_rows and "vertex" in b.column_names else pa.table(
            {"src": pa.array([], pa.int64()),
             "vertex": pa.array([], pa.int64()),
             "tsrc": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(j, types, on="vertex", num_partitions=num_partitions)

    def _viol(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "tsrc" not in b.column_names:
            return pa.table({"bad": pa.array([], pa.int64())})
        ts = b["tsrc"].to_numpy(zero_copy_only=False).astype(np.int64)
        td = b["type"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"bad": pa.array(
            np.array([int((ts == td).sum())], np.int64))})

    bad = sum(r["bad"] for r in j.map_batches(
        _viol, batch_format="pyarrow", batch_size=None).take_all())
    if bad:
        raise ValueError(
            f"create_bipartite: {bad} edge(s) connect same-type vertices "
            "(reference raises IGRAPH_EINVAL, bipartite.c:508)")
    return Graph(edges, n=None)


def incidence_from_matrix(matrix: np.ndarray) -> Tuple[Graph, np.ndarray]:
    """Dense incidence matrix → bipartite graph (igraph_incidence,
    /root/reference/src/bipartite.c:577, directed=False, multiple=True:
    cell (i,j)=k emits k parallel edges between row-vertex i and
    column-vertex n1+j). Returns (graph, types) with the reference's id
    layout: rows first (type 0), then columns (type 1)."""
    n1, n2 = matrix.shape
    rows, cols = np.nonzero(matrix)
    mult = matrix[rows, cols].astype(np.int64)
    src = np.repeat(rows.astype(np.int64), mult)
    dst = np.repeat(cols.astype(np.int64) + n1, mult)
    edges = ray.data.from_arrow(pa.table(
        {"src": pa.array(src), "dst": pa.array(dst)}))
    types = np.concatenate([np.zeros(n1, np.int64), np.ones(n2, np.int64)])
    return Graph(edges, n=n1 + n2), types


def get_incidence(edges: ray.data.Dataset, types: ray.data.Dataset,
                  num_partitions: int = 8) -> ray.data.Dataset:
    """(row, col, mult): the incidence-matrix triplets of a bipartite
    graph (igraph_get_incidence, /root/reference/src/bipartite.c:694):
    row = dense rank of the type-0 endpoint among type-0 vertex ids
    ascending, col = dense rank of the type-1 endpoint, mult = parallel
    edge count (the reference increments the cell per edge). Zero cells
    are not emitted (sparse triplet contract)."""
    t0 = types.filter(expr="type == 0").map_batches(
        lambda b: pa.table({"vertex": b["vertex"]})
        if b.num_rows else pa.table({"vertex": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    t1 = types.filter(expr="type == 1").map_batches(
        lambda b: pa.table({"vertex": b["vertex"]})
        if b.num_rows else pa.table({"vertex": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    r0 = dense_rank_map(t0, "vertex")  # (vertex, rank)
    r1 = dense_rank_map(t1, "vertex")

    # orient each edge type0 → type1: semi-join src against t0; edges
    # whose src is type-1 flip. Both orientations handled by one union.
    edges = edges.materialize()

    def _fwd(b: pa.Table) -> pa.Table:
        return pa.table({"a": b["src"], "b": b["dst"]})

    def _rev(b: pa.Table) -> pa.Table:
        return pa.table({"a": b["dst"], "b": b["src"]})

    both = edges.map_batches(_fwd, batch_format="pyarrow",
                             batch_size=None).union(
        edges.map_batches(_rev, batch_format="pyarrow", batch_size=None))
    # keep orientations with a ∈ type0 (each edge survives exactly once
    # in a valid bipartite graph)
    j = hash_join(both.map_batches(
        lambda b: pa.table({"vertex": b["a"], "b": b["b"]})
        if b.num_rows else pa.table(
            {"vertex": pa.array([], pa.int64()),
             "b": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None),
        r0, on="vertex", num_partitions=num_partitions)
    j = j.map_batches(
        lambda b: pa.table({"row": b["rank"], "vertex": b["b"]})
        if b.num_rows and "rank" in b.column_names else pa.table(
            {"row": pa.array([], pa.int64()),
             "vertex": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(j, r1, on="vertex", num_partitions=num_partitions)

    def _cell(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "row" not in b.column_names:
            return pa.table({"row": pa.array([], pa.int64()),
                             "col": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        t = pa.table({"row": b["row"], "col": b["rank"],
                      "c": pa.array(np.ones(b.num_rows, np.int64))})
        return (pa.TableGroupBy(t, ["row", "col"]).aggregate([("c", "sum")])
                .rename_columns(["row", "col", "c"]))

    out = (j.map_batches(_cell, batch_format="pyarrow", batch_size=None)
           .groupby(["row", "col"]).sum("c"))
    return out.map_batches(
        lambda b: pa.table({"row": b["row"], "col": b["col"],
                            "mult": pc.cast(b["sum(c)"], pa.int64())})
        if b.num_rows and "row" in b.column_names else pa.table(
            {"row": pa.array([], pa.int64()),
             "col": pa.array([], pa.int64()),
             "mult": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)


def bipartite_projection_size(inc: ray.data.Dataset, a_col: str = "a",
                              b_col: str = "b",
                              num_partitions: int = 8) -> pa.Table:
    """One row (vcount1, ecount1, vcount2, ecount2): the sizes of the
    two bipartite projections without materializing them
    (igraph_bipartite_projection_size,
    /root/reference/src/bipartite.c:87-147 — the per-vertex mark walk
    counts each distinct same-side co-neighbor pair once per endpoint;
    the totals equal the simple-projection vertex/edge counts).

    ``inc`` is the two-column incidence table (a_col = side 1,
    b_col = side 2)."""
    from igraph_ray.ops.structural import _common_neighbor_pairs

    inc = inc.materialize()
    vc1 = inc.groupby(a_col).count().count()
    vc2 = inc.groupby(b_col).count().count()
    ec1 = _common_neighbor_pairs(inc, b_col, a_col, num_partitions).count()
    ec2 = _common_neighbor_pairs(inc, a_col, b_col, num_partitions).count()
    return pa.table({
        "vcount1": pa.array([int(vc1)], pa.int64()),
        "ecount1": pa.array([int(ec1)], pa.int64()),
        "vcount2": pa.array([int(vc2)], pa.int64()),
        "ecount2": pa.array([int(ec2)], pa.int64())})
