"""FSM support measures over a transaction graph database — the engine's
counterpart of the reference fork's single-graph support measures
(/root/reference/src/fsm.c: igraph_shallow_support:959,
igraph_mib_support:745, igraph_egobased_support:890) and the database
aggregate (igraph_aggregated_db_support:988).

Semantics (fsm.c):

* shallow   — 1 iff the pattern is subgraph-isomorphic to the graph,
              else 0 (binary containment; the aggregated form over a
              database is classical transaction support).
* mib       — minimum-image-based support (Bringmann & Nijssen, PAKDD
              2008): min over pattern vertices of the number of DISTINCT
              target vertices that pattern vertex maps to across all
              embeddings. The reference skips pattern vertices
              automorphic to an earlier one (fsm.c:765-786) — a pure
              optimization, since automorphic vertices have identical
              image sets; the engine takes the min over all vertices,
              which is exactly equal.
* egobased  — the number of distinct target vertices that can host the
              designated start pattern vertex (fsm.c:890; the reference
              marks it with vertex color 0 — the engine takes the
              pattern vertex id explicitly).
* aggregated — Σ over the database graphs of the chosen single-graph
              measure (fsm.c:988).

Distributed shape: the transaction database (gid, src, dst) is packed
into ONE union graph by offsetting each transaction's local vertex ids
by ``gid * stride`` — transactions share no edges, so embeddings can
never cross a transaction boundary, and one run of the shared
subgraph-isomorphism binding stream (algorithms/subiso.py — a chain of
hash joins, no per-graph Python loop) yields every embedding of every
transaction at once; ``gid = image // stride`` recovers the owner. All
three measures are then single grouped aggregates over that stream.
The binding stream is the same O(candidate-embeddings) object the
reference's VF2 enumerates sequentially per graph.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.graph import Graph


def transaction_bindings(
    db_edges: ray.data.Dataset,
    pattern_src: Sequence[int],
    pattern_dst: Sequence[int],
    directed: bool = False,
    stride: int = 1 << 20,
    num_partitions: int = 8,
) -> Tuple[ray.data.Dataset, Dict[int, str]]:
    """Embedding stream of the pattern over every transaction at once.

    ``db_edges`` is (gid, src, dst) with per-transaction local vertex
    ids < stride. Returns (bindings, colmap): each binding row maps
    pattern vertex v to global image colmap[v]; gid = image // stride.
    """
    from igraph_ray.algorithms.subiso import count_sub_isomorphisms

    def _pack(b: pa.Table) -> pa.Table:
        g = b["gid"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(s) and (s.max() >= stride or d.max() >= stride):
            raise ValueError(f"local vertex id >= stride {stride}")
        return pa.table({"src": pa.array(g * stride + s),
                         "dst": pa.array(g * stride + d)})

    union = Graph(db_edges.map_batches(_pack, batch_format="pyarrow",
                                       batch_size=None), n=None)
    return count_sub_isomorphisms(
        union, pattern_src, pattern_dst, directed=directed,
        num_partitions=num_partitions, return_bindings=True)


def _distinct_images_per_gid(
    bindings: ray.data.Dataset, col: str, stride: int
) -> ray.data.Dataset:
    """(gid, n) — distinct images of one pattern vertex per transaction."""
    def _gi(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or col not in b.column_names:
            return pa.table({"gid": pa.array([], pa.int64()),
                             "img": pa.array([], pa.int64())})
        v = b[col].to_numpy(zero_copy_only=False)
        t = pa.table({"gid": pa.array(v // stride), "img": pa.array(v)})
        return t.group_by(["gid", "img"]).aggregate([])

    d = (bindings.map_batches(_gi, batch_format="pyarrow", batch_size=None)
         .groupby(["gid", "img"]).count()
         .groupby("gid").count())

    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"gid": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"gid": b["gid"], "n": b["count()"]})

    return d.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def pattern_support(
    db_edges: ray.data.Dataset,
    pattern_src: Sequence[int],
    pattern_dst: Sequence[int],
    directed: bool = False,
    stride: int = 1 << 20,
    ego_vertex: int = 0,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Per-transaction support table (gid, shallow, mib, ego) for one
    pattern: shallow ∈ {0,1} (fsm.c:959), mib = min distinct-image
    count over pattern vertices (fsm.c:745), ego = distinct images of
    ``ego_vertex`` (fsm.c:890). Transactions with no embedding get the
    all-zero row (the reference reports support 0). One binding-stream
    pass + one grouped distinct per pattern vertex."""
    from igraph_ray.util import hash_join

    bindings, colmap = transaction_bindings(
        db_edges, pattern_src, pattern_dst, directed=directed,
        stride=stride, num_partitions=num_partitions)
    bindings = bindings.materialize()

    p = len(colmap)
    per_vertex: List[ray.data.Dataset] = []
    for v in range(p):
        d = _distinct_images_per_gid(bindings, colmap[v], stride)
        per_vertex.append(d.map_batches(
            lambda b, v=v: b.rename_columns(["gid", f"n{v}"]),
            batch_format="pyarrow", batch_size=None))

    j = per_vertex[0]
    for d in per_vertex[1:]:
        j = hash_join(j, d, on="gid", num_partitions=num_partitions)

    gids = db_edges.groupby("gid").count().select_columns(["gid"])

    def _measures(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n0" not in b.column_names:
            return pa.table({"gid": pa.array([], pa.int64()),
                             "shallow": pa.array([], pa.int64()),
                             "mib": pa.array([], pa.int64()),
                             "ego": pa.array([], pa.int64())})
        mat = np.stack([b[f"n{v}"].to_numpy(zero_copy_only=False)
                        for v in range(p)], axis=1)
        return pa.table({
            "gid": b["gid"],
            "shallow": pa.array(np.ones(b.num_rows, np.int64)),
            "mib": pa.array(mat.min(axis=1).astype(np.int64)),
            "ego": pa.array(mat[:, ego_vertex].astype(np.int64)),
        })

    got = j.map_batches(_measures, batch_format="pyarrow",
                        batch_size=None)
    # left-complete over every transaction id: no-embedding rows are 0
    full = hash_join(gids, got, on="gid",
                     num_partitions=num_partitions, join_type="left_outer")

    def _fill(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"gid": pa.array([], pa.int64()),
                             "shallow": pa.array([], pa.int64()),
                             "mib": pa.array([], pa.int64()),
                             "ego": pa.array([], pa.int64())})
        out = {"gid": b["gid"]}
        for c in ("shallow", "mib", "ego"):
            v = (b[c].to_numpy(zero_copy_only=False)
                 if c in b.column_names else np.full(b.num_rows, np.nan))
            v = np.nan_to_num(v.astype(np.float64), nan=0.0)
            out[c] = pa.array(v.astype(np.int64))
        return pa.table(out)

    return full.map_batches(_fill, batch_format="pyarrow", batch_size=None)


def aggregated_db_support(
    support_table: ray.data.Dataset, measure: str = "shallow"
) -> int:
    """igraph_aggregated_db_support (fsm.c:988): Σ over transactions of
    the chosen single-graph measure."""
    from ray.data.aggregate import Sum

    out = support_table.aggregate(Sum(measure))
    return int(out[f"sum({measure})"] or 0)
