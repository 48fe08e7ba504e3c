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
    variant: str = "ase",
    scale_by_invsqrt_deg: bool = False,
) -> ray.data.Dataset:
    """(vertex, group): joint equal-width-interval grouping over the
    top-``ell`` eigenvector components (igraph_scg_grouping with
    IGRAPH_SCG_INTERV semantics), groups densified 0..k-1 by first
    appearance (min vertex id)."""
    from igraph_ray.algorithms.embedding import adjacency_spectral_embedding

    emb = adjacency_spectral_embedding(
        graph, k=ell, fixed_iterations=fixed_iterations,
        num_partitions=num_partitions, variant=variant).state.materialize()
    cols = [f"d{i}" for i in range(ell)]
    if scale_by_invsqrt_deg:
        # eigvecs of the stochastic walk S = D^{-1}A are D^{-1/2} times
        # the DAD basis; the reference bins the S components
        from igraph_ray.algorithms.embedding import _sym_graph

        sym = _sym_graph(graph).edges

        def _d(b: pa.Table) -> pa.Table:
            return pa.table({"vertex": b["src"],
                             "one": pa.array(
                                 np.ones(b.num_rows, np.int64))})

        degs = (sym.map_batches(_d, batch_format="pyarrow",
                                batch_size=None)
                .groupby("vertex").sum("one").map_batches(
            lambda b: pa.table({"vertex": b["vertex"],
                                "deg": pc.cast(b["sum(one)"], pa.int64())})
            if b.num_rows and "vertex" in b.column_names else pa.table(
                {"vertex": pa.array([], pa.int64()),
                 "deg": pa.array([], pa.int64())}),
            batch_format="pyarrow", batch_size=None))
        emb = hash_join(emb, degs, on="vertex",
                        num_partitions=num_partitions,
                        join_type="left_outer")

        def _sc(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "vertex" not in b.column_names:
                return pa.table(
                    {"vertex": pa.array([], pa.int64()),
                     **{c: pa.array([], pa.float64()) for c in cols}})
            d = b["deg"].to_numpy(zero_copy_only=False).astype(np.float64) \
                if "deg" in b.column_names else np.ones(b.num_rows)
            d = np.where(np.isnan(d) | (d <= 0), 1.0, d)
            out = {"vertex": b["vertex"]}
            for c in cols:
                out[c] = pa.array(
                    b[c].to_numpy(zero_copy_only=False) / np.sqrt(d))
            return pa.table(out)

        emb = emb.map_batches(_sc, batch_format="pyarrow",
                              batch_size=None).materialize()
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


def _contract_counts(graph: Graph, groups: ray.data.Dataset,
                     num_partitions: int):
    """(cut, sizes, degsum): ordered-pair adjacency counts between
    groups over the symmetrized loop-free view, group sizes, and
    per-group degree sums — the shared ingredients of the lap/sto
    coarse matrices."""
    from igraph_ray.algorithms.embedding import _sym_graph

    sym = _sym_graph(graph).edges.materialize()
    gs = groups.map_batches(
        lambda b: pa.table({"src": b["vertex"], "g_src": b["group"]}),
        batch_format="pyarrow", batch_size=None)
    gd = groups.map_batches(
        lambda b: pa.table({"dst": b["vertex"], "g_dst": b["group"]}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(sym, gs, on="src", num_partitions=num_partitions)
    j = hash_join(j, gd, on="dst", num_partitions=num_partitions)

    def _pre(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "g_src" not in b.column_names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        t = pa.table({"a": b["g_src"], "b": b["g_dst"],
                      "w": pa.array(np.ones(b.num_rows, np.int64))})
        return (pa.TableGroupBy(t, ["a", "b"]).aggregate([("w", "sum")])
                .rename_columns(["a", "b", "w"]))

    cut = (j.map_batches(_pre, batch_format="pyarrow", batch_size=None)
           .groupby(["a", "b"]).sum("w").map_batches(
        lambda b: pa.table({"a": b["a"], "b": b["b"],
                            "cut": pc.cast(b["sum(w)"], pa.int64())})
        if b.num_rows and "a" in b.column_names else pa.table(
            {"a": pa.array([], pa.int64()),
             "b": pa.array([], pa.int64()),
             "cut": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)).materialize()

    sizes = groups.groupby("group").aggregate(Count()).map_batches(
        lambda b: pa.table({"group": b["group"],
                            "n": pc.cast(b["count()"], pa.int64())}),
        batch_format="pyarrow", batch_size=None).materialize()

    def _deg(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["src"],
                         "one": pa.array(np.ones(b.num_rows, np.int64))})

    degv = (sym.map_batches(_deg, batch_format="pyarrow", batch_size=None)
            .groupby("vertex").sum("one").map_batches(
        lambda b: pa.table({"vertex": b["vertex"],
                            "deg": pc.cast(b["sum(one)"], pa.int64())})
        if b.num_rows and "vertex" in b.column_names else pa.table(
            {"vertex": pa.array([], pa.int64()),
             "deg": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None))
    dj = hash_join(degv, groups, on="vertex",
                   num_partitions=num_partitions)
    degsum = dj.map_batches(
        lambda b: pa.table({"group": b["group"], "deg": b["deg"]})
        if b.num_rows and "group" in b.column_names else pa.table(
            {"group": pa.array([], pa.int64()),
             "deg": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None).groupby("group").sum(
        "deg").map_batches(
        lambda b: pa.table({"group": b["group"],
                            "degsum": pc.cast(b["sum(deg)"], pa.int64())})
        if b.num_rows and "group" in b.column_names else pa.table(
            {"group": pa.array([], pa.int64()),
             "degsum": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None).materialize()
    return cut, sizes, degsum


def scg_laplacian(
    graph: Graph,
    ell: int = 2,
    intervals: int = 4,
    fixed_iterations: int = 60,
    norm: str = "row",
    num_partitions: int = 8,
) -> SCGResult:
    """Laplacian SCG (igraph_scg_laplacian, scg.c:839-849 with the
    IGRAPH_SCG_LAPLACIAN semiprojectors of scg.c:537): grouping over
    the Laplacian eigenbasis (the engine's DAD-normalized Laplacian
    embedding — documented deviation from the raw D−A basis; the
    grouping contract, equal-width joint bins of the leading spectrum,
    is unchanged), then L' = L_semi·(D−A)·Rᵀ:
    L'_{ab} = coef·((a==b)·Σ_{i∈a}deg_i − cut(a,b)) with
    coef = 1/|a| (norm="row", scg.c:557) or 1/|b| (norm="col")."""
    groups = scg_grouping(graph, ell=ell, intervals=intervals,
                          fixed_iterations=fixed_iterations,
                          num_partitions=num_partitions, variant="lse")
    cut, sizes, degsum = _contract_counts(graph, groups, num_partitions)
    num_groups = sizes.count()
    # numerator rows: diag degsum minus cut, one union + grouped sum
    # (no outer join needed)
    neg = cut.map_batches(
        lambda b: pa.table({"a": b["a"], "b": b["b"],
                            "val": pc.multiply(
                                b["cut"], pa.scalar(-1, pa.int64()))}),
        batch_format="pyarrow", batch_size=None)
    diag = degsum.map_batches(
        lambda b: pa.table({"a": b["group"], "b": b["group"],
                            "val": b["degsum"]}),
        batch_format="pyarrow", batch_size=None)
    num = neg.union(diag).groupby(["a", "b"]).sum("val").map_batches(
        lambda b: pa.table({"a": b["a"], "b": b["b"],
                            "val": pc.cast(b["sum(val)"], pa.int64())})
        if b.num_rows and "a" in b.column_names else pa.table(
            {"a": pa.array([], pa.int64()),
             "b": pa.array([], pa.int64()),
             "val": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    key = "a" if norm == "row" else "b"
    sz = sizes.map_batches(
        lambda b, key=key: pa.table({key: b["group"], "nn": b["n"]}),
        batch_format="pyarrow", batch_size=None)
    merged = hash_join(num, sz, on=key, num_partitions=num_partitions)

    def _fin(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "a" not in b.column_names:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "weight": pa.array([], pa.float64())})
        v = b["val"].to_numpy(zero_copy_only=False).astype(np.float64)
        nn = b["nn"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"src": b["a"], "dst": b["b"],
                         "weight": pa.array(v / nn)})

    coarse = merged.map_batches(_fin, batch_format="pyarrow",
                                batch_size=None)
    return SCGResult(groups=groups, coarse=coarse, num_groups=num_groups)


def scg_stochastic(
    graph: Graph,
    ell: int = 2,
    intervals: int = 4,
    fixed_iterations: int = 60,
    num_partitions: int = 8,
) -> SCGResult:
    """Stochastic SCG (igraph_scg_stochastic, scg.c:851 with the
    IGRAPH_SCG_STOCHASTIC row-norm semiprojectors of scg.c:634): the
    engine coarsens the SYMMETRIC random walk S = D⁻¹A of the
    undirected simple view, whose stationary distribution is the exact
    closed form p = deg/2m — so the reference's p-weighted projector
    L[g,i] = p_i/p_g collapses to
    S'_{ab} = cut(a,b) / Σ_{i∈a} deg_i (rows sum to 1). Grouping bins
    the S eigenbasis (D^{-1/2}·DAD components)."""
    groups = scg_grouping(graph, ell=ell, intervals=intervals,
                          fixed_iterations=fixed_iterations,
                          num_partitions=num_partitions, variant="lse",
                          scale_by_invsqrt_deg=True)
    cut, sizes, degsum = _contract_counts(graph, groups, num_partitions)
    num_groups = sizes.count()
    ds = degsum.map_batches(
        lambda b: pa.table({"a": b["group"], "degsum": b["degsum"]}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(cut, ds, on="a", num_partitions=num_partitions)

    def _fin(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "a" not in b.column_names:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "weight": pa.array([], pa.float64())})
        c = b["cut"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = b["degsum"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"src": b["a"], "dst": b["b"],
                         "weight": pa.array(c / d)})

    coarse = j.map_batches(_fin, batch_format="pyarrow", batch_size=None)
    return SCGResult(groups=groups, coarse=coarse, num_groups=num_groups)


def scg_norm_eps(
    vectors: ray.data.Dataset,
    groups: ray.data.Dataset,
    cols,
    num_partitions: int = 8,
) -> np.ndarray:
    """igraph_scg_norm_eps (scg.c): per supplied vector column, the L2
    norm of v − P⁺·P·v — the grouping's reconstruction error. For the
    sym/row semiprojectors P⁺·P is the within-group averaging operator,
    so eps_k = sqrt(Σ_i (v_ki − mean_{group(i)} v_k)²). One join +
    grouped means + one squared-residual aggregate per call."""
    vectors = vectors.materialize()
    j = hash_join(vectors, groups, on="vertex",
                  num_partitions=num_partitions)
    j = j.materialize()
    sums = j.groupby("group").mean(list(cols)).materialize()
    back = hash_join(
        j, sums.map_batches(
            lambda b: pa.table(
                {"group": b["group"],
                 **{f"m_{c}": b[f"mean({c})"] for c in cols}})
            if b.num_rows and "group" in b.column_names else pa.table(
                {"group": pa.array([], pa.int64()),
                 **{f"m_{c}": pa.array([], pa.float64()) for c in cols}}),
            batch_format="pyarrow", batch_size=None),
        on="group", num_partitions=num_partitions)

    def _sq(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "group" not in b.column_names:
            return pa.table({f"s_{c}": pa.array([], pa.float64())
                             for c in cols})
        out = {}
        for c in cols:
            x = b[c].to_numpy(zero_copy_only=False)
            m = b[f"m_{c}"].to_numpy(zero_copy_only=False)
            out[f"s_{c}"] = pa.array(
                [float(((x - m) ** 2).sum())], pa.float64())
        return pa.table(out)

    tot = np.zeros(len(cols))
    for r in back.map_batches(_sq, batch_format="pyarrow",
                              batch_size=None).take_all():
        for i, c in enumerate(cols):
            tot[i] += float(r[f"s_{c}"])
    return np.sqrt(tot)
