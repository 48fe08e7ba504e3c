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
