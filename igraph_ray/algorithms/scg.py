"""Spectral coarse graining (SCG) — the engine's counterpart of the
reference's scg family (/root/reference/src/scg.c igraph_scg_grouping /
igraph_scg_adjacency; Gfeller & De Los Rios, PRL 99:038701 (2007)):
partition vertices by the joint equal-width-interval bins of the
leading eigenvector components (scg_approximate_methods.c
igraph_i_intervals_method, equal-width breaks, left-closed bins), then
contract the adjacency through the symmetric semiprojector
P_{alpha i} = 1/sqrt(|alpha|) so the coarse matrix P·A·Pᵀ preserves
the leading spectrum.

Ray-native shape: the eigenbasis comes from the existing distributed
block subspace iteration (algorithms/embedding.py — ASE returns
U_k·|Λ_k|^{1/2}, and per-column positive scaling leaves equal-width
binning invariant, so grouping on the ASE state equals grouping on the
raw eigenvectors); per-column min/max are two tiny aggregates; binning
is one vectorized map_batches; group densification reuses
dense_rank_map (object-store resident); the coarse matrix is one
contract-groupby over the symmetrized edge table with the 1/sqrt(n_a
n_b) normalization joined in from the group-size table. No driver-side
per-vertex state anywhere.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min

from igraph_ray.graph import Graph
from igraph_ray.util import dense_rank_map, hash_join


@dataclasses.dataclass
class SCGResult:
    groups: ray.data.Dataset  # (vertex, group) dense 0..k-1
    coarse: ray.data.Dataset  # (src, dst, weight) = P A P^T entries
    num_groups: int


def scg_grouping(
    graph: Graph,
    ell: int = 2,
    intervals: int = 4,
    fixed_iterations: int = 60,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """(vertex, group): joint equal-width-interval grouping over the
    top-``ell`` eigenvector components (igraph_scg_grouping with
    IGRAPH_SCG_INTERV semantics), groups densified 0..k-1 by first
    appearance (min vertex id)."""
    from igraph_ray.algorithms.embedding import adjacency_spectral_embedding

    emb = adjacency_spectral_embedding(
        graph, k=ell, fixed_iterations=fixed_iterations,
        num_partitions=num_partitions).state.materialize()
    cols = [f"d{i}" for i in range(ell)]
    aggs = []
    for c in cols:
        aggs += [Min(c), Max(c)]
    ext = emb.aggregate(*aggs)
    mins = np.array([ext[f"min({c})"] for c in cols], dtype=np.float64)
    maxs = np.array([ext[f"max({c})"] for c in cols], dtype=np.float64)
    width = maxs - mins
    width[width == 0.0] = 1.0  # constant column: everything lands in bin 0

    def _bins(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "group": pa.array([], pa.int64())})
        key = np.zeros(b.num_rows, dtype=np.int64)
        for i, c in enumerate(cols):
            x = b[c].to_numpy(zero_copy_only=False)
            bi = np.floor((x - mins[i]) * intervals / width[i]).astype(np.int64)
            np.clip(bi, 0, intervals - 1, out=bi)
            key = key * intervals + bi
        return pa.table({"vertex": b["vertex"], "group": pa.array(key, pa.int64())})

    binned = emb.map_batches(_bins, batch_format="pyarrow", batch_size=None)
    # densify by first appearance: min vertex per joint bin, then rank
    firsts = binned.groupby("group").min("vertex").map_batches(
        lambda b: pa.table({"group": b["group"], "minv": b["min(vertex)"]}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(binned, firsts, on="group", num_partitions=num_partitions)
    bymin = j.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "group": b["minv"]}),
        batch_format="pyarrow", batch_size=None)
    rank = dense_rank_map(bymin, "group")
    j2 = hash_join(
        bymin,
        rank.map_batches(
            lambda b: pa.table({"group": b["group"], "dense": b["rank"]}),
            batch_format="pyarrow", batch_size=None),
        on="group", num_partitions=num_partitions)
    return j2.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "group": b["dense"]}),
        batch_format="pyarrow", batch_size=None).materialize()


def _group_by_joint_bins(
    vectors: ray.data.Dataset,
    cols,
    intervals: int,
    num_partitions: int,
) -> ray.data.Dataset:
    """(vertex, group) from the joint equal-width-interval bins of
    integer-valued vector columns (igraph_scg_grouping's
    IGRAPH_SCG_INTERV rule over a caller-supplied matrix V — scg.c's
    grouping API takes V from the user). Integer arithmetic throughout:
    bin = min(intervals-1, (x-min)·intervals // (max-min)), so the
    grouping replays bit-for-bit in SQL. Groups densified 0..k-1 by
    first appearance (min vertex id)."""
    vectors = vectors.materialize()
    aggs = []
    for c in cols:
        aggs += [Min(c), Max(c)]
    ext = vectors.aggregate(*aggs)
    mins = np.array([int(ext[f"min({c})"]) for c in cols], dtype=np.int64)
    maxs = np.array([int(ext[f"max({c})"]) for c in cols], dtype=np.int64)
    width = maxs - mins

    def _bins(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "group": pa.array([], pa.int64())})
        key = np.zeros(b.num_rows, dtype=np.int64)
        for i, c in enumerate(cols):
            x = b[c].to_numpy(zero_copy_only=False).astype(np.int64)
            if width[i] == 0:
                bi = np.zeros(b.num_rows, dtype=np.int64)
            else:
                bi = ((x - mins[i]) * intervals) // width[i]
                np.minimum(bi, intervals - 1, out=bi)
            key = key * intervals + bi
        return pa.table({"vertex": b["vertex"],
                         "group": pa.array(key, pa.int64())})

    binned = vectors.map_batches(_bins, batch_format="pyarrow",
                                 batch_size=None)
    firsts = binned.groupby("group").min("vertex").map_batches(
        lambda b: pa.table({"group": b["group"], "minv": b["min(vertex)"]}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(binned, firsts, on="group", num_partitions=num_partitions)
    bymin = j.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "group": b["minv"]}),
        batch_format="pyarrow", batch_size=None)
    rank = dense_rank_map(bymin, "group")
    j2 = hash_join(
        bymin,
        rank.map_batches(
            lambda b: pa.table({"group": b["group"], "dense": b["rank"]}),
            batch_format="pyarrow", batch_size=None),
        on="group", num_partitions=num_partitions)
    return j2.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "group": b["dense"]}),
        batch_format="pyarrow", batch_size=None).materialize()


def scg_grouping_power(
    graph: Graph,
    intervals: int = 4,
    steps=(2, 3),
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """(vertex, group): interval grouping (scg.c igraph_scg_grouping,
    IGRAPH_SCG_INTERV) of the exact-integer power iterates
    x_k = A_sym^k · 1 at the requested ``steps`` — the Krylov vectors
    the approximate SCG methods build their subspace from
    (scg_approximate_methods.c), kept in integer arithmetic so the
    whole grouping is SQL-replayable (the driver-checked pinned form
    of scg_grouping; the eigenvector form stays rows-only). A_sym is
    the simple undirected adjacency (distinct endpoint pairs, loops
    dropped)."""
    verts = graph.vertices().materialize()

    def _und(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"src": pa.array(np.concatenate([s, d]), pa.int64()),
                         "dst": pa.array(np.concatenate([d, s]), pa.int64())})

    und = graph.edges.map_batches(_und, batch_format="pyarrow",
                                  batch_size=None) \
        .groupby(["src", "dst"]).count() \
        .map_batches(lambda b: b.select(["src", "dst"]),
                     batch_format="pyarrow", batch_size=None).materialize()

    x = verts.map_batches(
        lambda b: pa.table({"vertex": b["vertex"],
                            "val": pa.array(
                                np.ones(b.num_rows, np.int64), pa.int64())}),
        batch_format="pyarrow", batch_size=None).materialize()
    recorded = {}
    for k in range(1, max(steps) + 1):
        msgs = hash_join(
            und,
            x.map_batches(
                lambda b: pa.table({"dst": b["vertex"], "val": b["val"]}),
                batch_format="pyarrow", batch_size=None),
            on="dst", num_partitions=num_partitions)
        summed = msgs.map_batches(
            lambda b: pa.TableGroupBy(
                pa.table({"vertex": b["src"], "val": b["val"]}), ["vertex"])
            .aggregate([("val", "sum")]).rename_columns(["vertex", "val"]),
            batch_format="pyarrow", batch_size=None) \
            .groupby("vertex").sum("val") \
            .map_batches(
                lambda b: pa.table({"vertex": b["vertex"],
                                    "nval": b["sum(val)"]}),
                batch_format="pyarrow", batch_size=None)
        x = hash_join(verts, summed, on="vertex",
                      num_partitions=num_partitions,
                      join_type="left_outer").map_batches(
            lambda b: pa.table({
                "vertex": b["vertex"],
                "val": (pc.fill_null(pc.cast(b["nval"], pa.int64()), 0)
                        if "nval" in b.column_names
                        else pa.array(np.zeros(b.num_rows, np.int64),
                                      pa.int64()))}),
            batch_format="pyarrow", batch_size=None).materialize()
        if k in steps:
            recorded[k] = x
    cols = []
    merged = None
    for i, k in enumerate(steps):
        c = f"d{i}"
        cols.append(c)
        part = recorded[k].map_batches(
            lambda b, _c=c: pa.table({"vertex": b["vertex"], _c: b["val"]}),
            batch_format="pyarrow", batch_size=None)
        merged = part if merged is None else hash_join(
            merged, part, on="vertex", num_partitions=num_partitions)
    return _group_by_joint_bins(merged, cols, intervals, num_partitions) \
        .sort("vertex")


def scg_adjacency(
    graph: Graph,
    ell: int = 2,
    intervals: int = 4,
    fixed_iterations: int = 60,
    num_partitions: int = 8,
) -> SCGResult:
    """Full SCG of the (symmetric, unweighted) adjacency: grouping plus
    the coarse matrix A' = P·A·Pᵀ with the symmetric semiprojector,
    i.e. A'_{ab} = (Σ_{i∈a, j∈b} A_ij) / sqrt(n_a·n_b) over the
    undirected double-counted adjacency."""
    groups = scg_grouping(graph, ell=ell, intervals=intervals,
                          fixed_iterations=fixed_iterations,
                          num_partitions=num_partitions)
    sizes = groups.groupby("group").aggregate(Count()).map_batches(
        lambda b: pa.table({"group": b["group"],
                            "n": pc.cast(b["count()"], pa.int64())}),
        batch_format="pyarrow", batch_size=None).materialize()
    num_groups = sizes.count()

    from igraph_ray.algorithms.embedding import _sym_graph

    sym = _sym_graph(graph).edges  # (src, dst) both directions, loop-free
    gs = groups.map_batches(
        lambda b: pa.table({"src": b["vertex"], "g_src": b["group"]}),
        batch_format="pyarrow", batch_size=None)
    gd = groups.map_batches(
        lambda b: pa.table({"dst": b["vertex"], "g_dst": b["group"]}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(sym, gs, on="src", num_partitions=num_partitions)
    j = hash_join(j, gd, on="dst", num_partitions=num_partitions)

    def _pre(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        t = pa.table({"src": b["g_src"], "dst": b["g_dst"],
                      "w": pa.array(np.ones(b.num_rows, np.int64), pa.int64())})
        return pa.TableGroupBy(t, ["src", "dst"]).aggregate([("w", "sum")]) \
            .rename_columns(["src", "dst", "w"])

    contracted = j.map_batches(_pre, batch_format="pyarrow", batch_size=None) \
        .groupby(["src", "dst"]).sum("w")
    c1 = hash_join(
        contracted.map_batches(
            lambda b: pa.table({"src": b["src"], "dst": b["dst"],
                                "w": b["sum(w)"]}),
            batch_format="pyarrow", batch_size=None),
        sizes.map_batches(
            lambda b: pa.table({"src": b["group"], "n_src": b["n"]}),
            batch_format="pyarrow", batch_size=None),
        on="src", num_partitions=num_partitions)
    c2 = hash_join(
        c1,
        sizes.map_batches(
            lambda b: pa.table({"dst": b["group"], "n_dst": b["n"]}),
            batch_format="pyarrow", batch_size=None),
        on="dst", num_partitions=num_partitions)

    def _norm(b: pa.Table) -> pa.Table:
        w = b["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = b["n_src"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = b["n_dst"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"src": b["src"], "dst": b["dst"],
                         "weight": pa.array(w / np.sqrt(na * nb),
                                            pa.float64())})

    coarse = c2.map_batches(_norm, batch_format="pyarrow", batch_size=None)
    return SCGResult(groups=groups, coarse=coarse, num_groups=num_groups)
