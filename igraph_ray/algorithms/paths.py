"""Shortest-path family: BFS hop distances, weighted SSSP, multi-source
distances, and the path-length histogram.

Reference semantics: igraph's unweighted shortest paths are BFS levels
(structural_properties.c:406-933, igraph_shortest_paths); the histogram is
igraph_path_length_hist (structural_properties.c:293) — counts of ordered
reachable pairs by distance. Sequential BFS does not distribute; the
equivalent fixpoint here is frontier min-relaxation (Bellman-Ford with a
changed-set frontier), which terminates in diameter supersteps unweighted
and is correct to fixpoint for non-negative weights.

Two execution shapes on the aligned engine:

- ``sssp_hops`` (single source): frontier-SPARSE gather — only vertices
  whose distance changed last superstep emit messages, via the generic
  out-CSR slice kernel (kernels.minlabel_messages with label = dist+w).
  Work per superstep is O(|frontier out-edges|/P), the BFS optimum.
- ``multi_source_hops`` (K sources at once): dense CSC reduceat gather
  over a (width, K) distance matrix — one ``np.minimum.reduceat`` per
  superstep regardless of K, the right shape when K is large enough that
  frontiers cover most of the graph anyway. K state columns ``d0..d{K-1}``
  keep every array 1-D for the engine's Arrow conversion.

``path_length_hist`` chunks the source set through multi_source_hops and
sums per-chunk histograms driver-side (a K_chunk-sized dict per chunk —
never per-vertex data on the driver).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray import aligned as al
from igraph_ray.graph import Graph
from igraph_ray.kernels import minlabel_messages
from igraph_ray.superstep import SuperstepResult

_INF = np.float64(np.inf)


def _universe_state(graph: Graph, csr, init_fn):
    if graph._explicit_n:
        return al.state_from_csr(csr, graph.num_vertices(), init_fn=init_fn)
    boundaries = [int(b) for b in csr.boundaries]
    return al.state_from_dataset(graph.vertices(), boundaries, init_fn=init_fn)


def sssp_hops(
    graph: Graph,
    source: int,
    weighted: bool = False,
    num_partitions: Optional[int] = None,
    max_iter: int = 10_000,
    engine: str = "tasks",
) -> SuperstepResult:
    """Single-source shortest distances. Returns SuperstepResult whose
    state is (vertex, dist) over REACHED vertices only — hop count
    (int64) unweighted, sum of weights (float64) otherwise.

    igraph parity: BFS levels / Dijkstra distances from ``source``
    (structural_properties.c:406-933), unreachable vertices omitted
    (igraph reports IGRAPH_INFINITY)."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    csr = graph.csr_index("out", num_partitions, weighted=weighted,
                          clamp_negative=False)
    blocks = csr.block_descriptors()

    def _init(sd: dict) -> dict:
        v = sd["vertex"]
        dist = np.where(v == source, 0.0, _INF)
        return {"vertex": v, "dist": dist, "changed": v == source}

    state = _universe_state(graph, csr, _init)

    big = np.float64(np.finfo(np.float64).max)

    def gather_fn(sb, csr_desc, starts, scalars):
        nb = len(starts)
        segs = [[] for _ in range(nb)]
        fr = sb["changed"]
        msg_count = 0
        if fr.any():
            verts = sb["vertex"][fr]
            base = sb["dist"][fr]
            if weighted:
                # per-edge relaxation dist+w via the generic slice kernel:
                # emit (dst, min(dist[src]+w)) pre-combined per dst
                from igraph_ray.csr import fetch_block, slices_for

                out_d, out_v = [], []
                vmin, vmax = verts.min(), verts.max()
                for (vlo, vhi, ref) in csr_desc:
                    if vhi < vmin or vlo > vmax:
                        continue
                    sel = (verts >= vlo) & (verts <= vhi)
                    if not sel.any():
                        continue
                    blk = fetch_block(ref)
                    idx, lens = slices_for(blk, verts[sel])
                    if len(idx) == 0:
                        continue
                    out_d.append(blk["dst"][idx])
                    out_v.append(np.repeat(base[sel], lens) + blk["weight"][idx])
                if out_d:
                    alld = np.concatenate(out_d)
                    allv = np.concatenate(out_v)
                    dsts, inv = np.unique(alld, return_inverse=True)
                    mins = np.full(len(dsts), np.inf)
                    np.minimum.at(mins, inv, allv)
                else:
                    dsts = np.empty(0, np.int64)
                    mins = np.empty(0, np.float64)
            else:
                # hop metric: labels are int-valued; reuse the min-label
                # combiner with label = dist+1
                labs = (base + 1.0).astype(np.int64)
                dsts, minl = minlabel_messages(csr_desc, verts, labs, int(2**62))
                mins = minl.astype(np.float64)
            msg_count = len(dsts)
            bounds = np.searchsorted(dsts, starts[1:])
            lo = 0
            for r, hi in enumerate(list(bounds) + [len(dsts)]):
                if hi > lo:
                    segs[r].append((dsts[lo:hi], mins[lo:hi]))
                lo = hi
        return [tuple(s) for s in segs], msg_count

    def apply_fn(old, segments, scalars):
        vertex = old["vertex"]
        new = old["dist"].copy()
        for pairs in segments:
            for (sd, sm) in pairs:
                if not len(sd):
                    continue
                pos = np.searchsorted(vertex, sd)
                np.minimum.at(new, pos, sm)
        changed = new < old["dist"]
        return (
            {"vertex": vertex, "dist": new, "changed": changed},
            {"changed": float(changed.sum())},
        )

    res = al.run_aligned_loop(
        state=state,
        csr_descriptors=blocks,
        gather_fn=gather_fn,
        apply_fn=apply_fn,
        scalars={"changed": 1.0},
        make_scalars=lambda s, it: {"changed": s.get("changed", 0.0)},
        converged=lambda s, it: s.get("changed", 1.0) == 0.0,
        max_iter=max_iter,
        state_columns=["vertex", "dist", "changed"],
        engine=engine,
    )

    def _project(b: pa.Table) -> pa.Table:
        d = b["dist"].to_numpy(zero_copy_only=False)
        keep = np.isfinite(d)
        v = b["vertex"].to_numpy(zero_copy_only=False)[keep]
        if weighted:
            return pa.table({"vertex": pa.array(v, pa.int64()),
                             "dist": pa.array(d[keep], pa.float64())})
        return pa.table({"vertex": pa.array(v, pa.int64()),
                         "dist": pa.array(d[keep].astype(np.int64), pa.int64())})

    res.state = res.state.map_batches(_project, batch_format="pyarrow", batch_size=None)
    return res


def multi_source_hops(
    graph: Graph,
    sources: Sequence[int],
    num_partitions: Optional[int] = None,
    max_iter: int = 10_000,
    chunk: int = 128,
    variant: str = "out",
    weighted: bool = False,
) -> ray.data.Dataset:
    """Multi-source shortest distances from every source in
    ``sources``: Dataset (source, vertex, dist) over reached pairs.
    Sources are processed in chunks of ``chunk`` columns through one
    dense K-column BFS (unweighted) or K-column min-plus Bellman-Ford
    (``weighted=True`` — integer-valued weights, the dist column stays
    int64). ``variant``: "out" follows edge direction, "rev" reverses
    it (igraph IGRAPH_IN), "sym" ignores it."""
    out: List[ray.data.Dataset] = []
    sources = list(sources)
    for lo in range(0, len(sources), chunk):
        out.append(_k_column_hops(graph, sources[lo : lo + chunk],
                                  num_partitions, max_iter, variant,
                                  weighted=weighted))
    ds = out[0]
    for o in out[1:]:
        ds = ds.union(o)
    return ds


def multi_root_hops(graph, roots, num_partitions=None, max_iter=10_000,
                    variant="sym") -> ray.data.Dataset:
    """Single-column BFS from a SET of roots simultaneously: Dataset
    (vertex, dist) where dist = hops to the nearest root (forest/BFS-tree
    depth when the roots are one per component). One aligned min-plus
    loop regardless of root count — the multi-root analogue of
    ``sssp_hops`` used by the Reingold–Tilford layout. ``roots`` is
    either a sequence of vertex ids or a Dataset with columns
    (vertex, seed) — the Dataset form never lands a root list on the
    driver (the at-scale path when roots are one per component)."""
    if isinstance(roots, ray.data.Dataset):
        ds = _k_column_hops(graph, [-1], num_partitions, max_iter,
                            variant=variant, multi_root=True,
                            seed_state=roots)
    else:
        ds = _k_column_hops(graph, list(roots), num_partitions, max_iter,
                            variant=variant, multi_root=True)
    return ds.map_batches(
        lambda b: b.select(["vertex", "dist"]),
        batch_format="pyarrow", batch_size=None)


def _k_column_hops(graph, sources, num_partitions, max_iter, variant="out",
                   weighted=False, init_all_zero=False,
                   multi_root=False, seed_state=None) -> ray.data.Dataset:
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())
    K = 1 if multi_root else len(sources)
    src_arr = np.asarray(sources, dtype=np.int64)
    csr = graph.csr_index(variant, num_partitions, weighted=weighted,
                          clamp_negative=False)
    blocks = csr.block_descriptors()
    cols = [f"d{k}" for k in range(K)]

    def _init(sd: dict) -> dict:
        v = sd["vertex"]
        out = {"vertex": v}
        for k in range(K):
            if init_all_zero:
                # virtual-source mode (Johnson potentials): a phantom
                # source with a 0-weight edge to EVERY vertex is exactly
                # the all-zero initial distance vector
                out[cols[k]] = np.zeros(len(v), dtype=np.float64)
            elif multi_root and seed_state is not None:
                out[cols[k]] = np.where(sd["seed"] > 0, 0.0, _INF)
            elif multi_root:
                out[cols[k]] = np.where(np.isin(v, src_arr), 0.0, _INF)
            else:
                out[cols[k]] = np.where(v == src_arr[k], 0.0, _INF)
        return out

    if seed_state is not None:
        state = al.state_from_dataset(
            seed_state, [int(b) for b in csr.boundaries], init_fn=_init)
    else:
        state = _universe_state(graph, csr, _init)

    def gather_fn(sb, csr_desc, starts, scalars):
        from igraph_ray.csr import fetch_block

        verts = sb["vertex"]
        dmat = np.stack([sb[c] for c in cols], axis=1)  # (m, K)
        nb = len(starts)
        segs = [[] for _ in range(nb)]
        msg_count = 0
        if len(verts) == 0:
            return [tuple(s) for s in segs], 0
        vmin, vmax = verts.min(), verts.max()
        for (vlo, vhi, ref) in csr_desc:
            if vhi < vmin or vlo > vmax:
                continue
            sel = (verts >= vlo) & (verts <= vhi)
            if not sel.any():
                continue
            blk = fetch_block(ref)
            from igraph_ray.csr import block_local, block_width

            contrib = np.full((block_width(blk), K), np.inf)
            loc = block_local(blk, verts[sel])
            pres = loc >= 0
            step = 0.0 if weighted else 1.0
            contrib[loc[pres], :] = dmat[sel, :][pres, :] + step
            if len(blk["in_starts"]) == 0:
                continue
            vals = contrib[blk["in_src"], :]
            if weighted:
                vals = vals + blk["in_weight"][:, None]
            mins = np.minimum.reduceat(vals, blk["in_starts"], axis=0)
            dsts = blk["in_dst"]
            msg_count += len(dsts) * K
            bounds = np.searchsorted(dsts, starts[1:])
            lo = 0
            for r, hi in enumerate(list(bounds) + [len(dsts)]):
                if hi > lo:
                    segs[r].append((dsts[lo:hi], mins[lo:hi, :].ravel()))
                lo = hi
        return [tuple(s) for s in segs], msg_count

    def apply_fn(old, segments, scalars):
        vertex = old["vertex"]
        dmat = np.stack([old[c] for c in cols], axis=1)
        new = dmat.copy()
        for pairs in segments:
            for (sd, sm) in pairs:
                if not len(sd):
                    continue
                pos = np.searchsorted(vertex, sd)
                np.minimum.at(new, (pos[:, None], np.arange(K)[None, :]),
                              sm.reshape(len(sd), K))
        changed = float((new < dmat).sum())
        out = {"vertex": vertex}
        for k in range(K):
            out[cols[k]] = new[:, k]
        return out, {"changed": changed}

    res = al.run_aligned_loop(
        state=state,
        csr_descriptors=blocks,
        gather_fn=gather_fn,
        apply_fn=apply_fn,
        scalars={"changed": 1.0},
        make_scalars=lambda s, it: {"changed": s.get("changed", 0.0)},
        converged=lambda s, it: s.get("changed", 1.0) == 0.0,
        max_iter=max_iter,
        state_columns=["vertex"] + cols,
    )

    def _long(b: pa.Table) -> pa.Table:
        v = b["vertex"].to_numpy(zero_copy_only=False)
        outs, outv, outd = [], [], []
        for k in range(K):
            d = b[cols[k]].to_numpy(zero_copy_only=False)
            keep = np.isfinite(d)
            outs.append(np.full(int(keep.sum()), src_arr[k], dtype=np.int64))
            outv.append(v[keep])
            outd.append(d[keep].astype(np.int64))
        return pa.table(
            {"source": pa.array(np.concatenate(outs), pa.int64()),
             "vertex": pa.array(np.concatenate(outv), pa.int64()),
             "dist": pa.array(np.concatenate(outd), pa.int64())}
        )

    return res.state.map_batches(_long, batch_format="pyarrow", batch_size=None)


def johnson_potentials(graph: Graph, num_partitions: Optional[int] = None,
                       max_iter: int = 10_000) -> ray.data.Dataset:
    """Johnson reweighting potentials h(v): Bellman–Ford distances from
    a virtual source with a 0-weight edge to every vertex
    (igraph_shortest_paths_johnson step 1, the reference's
    structural_properties.c:5396 contract). The virtual source never
    materializes — it is exactly the all-zero initial distance vector
    of the same K-column min-plus kernel, relaxed to fixpoint. Dataset
    (vertex, h), int64 for integer weights; h(v) ≤ 0 and
    w + h(u) − h(v) ≥ 0 on every edge when no negative cycle exists."""
    ds = _k_column_hops(graph, [-1], num_partitions, max_iter,
                        variant="out", weighted=True, init_all_zero=True)

    def _h(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"], "h": b["dist"]})

    return ds.map_batches(_h, batch_format="pyarrow", batch_size=None)


def johnson_apsp(
    graph: Graph,
    sources: Optional[Sequence[int]] = None,
    num_partitions: Optional[int] = None,
    chunk: int = 128,
    max_iter: int = 10_000,
) -> ray.data.Dataset:
    """All-pairs shortest paths with negative edge weights (no negative
    cycles) — Johnson's algorithm (igraph_shortest_paths_johnson,
    structural_properties.c:5396), composed from existing stages:

    1. potentials h via the virtual-source Bellman–Ford
       (:func:`johnson_potentials`);
    2. reweight w'(u,v) = w(u,v) + h(u) − h(v) ≥ 0 — two hash joins
       against the (vertex, h) table, no driver materialization;
    3. the weighted K-column min-plus sweep from every requested source
       over the reweighted non-negative graph (chunked, converges in
       diameter supersteps instead of |V|);
    4. un-reweight d(u,v) = d'(u,v) − h(u) + h(v) — two more joins on
       the long (source, vertex, dist) output.

    ``sources=None`` means all vertices (exact all-pairs semantics —
    the source list itself is O(|V|) driver-side by contract; use an
    explicit sample for the at-scale path). Integer weights stay
    int64-exact end to end."""
    from igraph_ray.util import hash_join

    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())
    h = johnson_potentials(graph, num_partitions, max_iter).materialize()

    def _rn(col_from, col_to):
        def _m(b: pa.Table) -> pa.Table:
            return b.rename_columns(
                [col_to if c == col_from else c for c in b.column_names])
        return _m

    hs = h.map_batches(_rn("vertex", "src"), batch_format="pyarrow",
                       batch_size=None)
    hd = h.map_batches(_rn("vertex", "dst"), batch_format="pyarrow",
                       batch_size=None)
    ew = hash_join(graph.edges, hs.map_batches(
        lambda b: b.rename_columns(
            ["h_src" if c == "h" else c for c in b.column_names]),
        batch_format="pyarrow", batch_size=None), on="src",
        num_partitions=num_partitions)
    ew = hash_join(ew, hd.map_batches(
        lambda b: b.rename_columns(
            ["h_dst" if c == "h" else c for c in b.column_names]),
        batch_format="pyarrow", batch_size=None), on="dst",
        num_partitions=num_partitions)

    def _rw(b: pa.Table) -> pa.Table:
        w = b["weight"].to_numpy(zero_copy_only=False).astype(np.int64)
        hs_ = b["h_src"].to_numpy(zero_copy_only=False)
        hd_ = b["h_dst"].to_numpy(zero_copy_only=False)
        return pa.table({"src": b["src"], "dst": b["dst"],
                         "weight": pa.array(w + hs_ - hd_, pa.int64())})

    g2 = Graph(ew.map_batches(_rw, batch_format="pyarrow",
                              batch_size=None).materialize(),
               n=graph._n if graph._explicit_n else None, weighted=True)
    if sources is None:
        sources = [int(r["vertex"]) for r in graph.vertices().sort(
            "vertex").take_all()]
    dprime = multi_source_hops(g2, sources, num_partitions=num_partitions,
                               max_iter=max_iter, chunk=chunk,
                               weighted=True)
    dj = hash_join(dprime, h.map_batches(
        lambda b: pa.table({"source": b["vertex"], "h_s": b["h"]}),
        batch_format="pyarrow", batch_size=None), on="source",
        num_partitions=num_partitions)
    dj = hash_join(dj, h.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "h_v": b["h"]}),
        batch_format="pyarrow", batch_size=None), on="vertex",
        num_partitions=num_partitions)

    def _unrw(b: pa.Table) -> pa.Table:
        d = b["dist"].to_numpy(zero_copy_only=False)
        hs_ = b["h_s"].to_numpy(zero_copy_only=False)
        hv_ = b["h_v"].to_numpy(zero_copy_only=False)
        return pa.table({"source": b["source"], "vertex": b["vertex"],
                         "dist": pa.array(d - hs_ + hv_, pa.int64())})

    return dj.map_batches(_unrw, batch_format="pyarrow", batch_size=None)


# lcm(1..20): the exact-rational denominator for harmonic sums (see
# harmonic_centrality) — any hop distance ≤ 20 divides it exactly
_HARMONIC_LCM = 232792560


def distance_profile(
    graph: Graph,
    sources: Optional[Sequence[int]] = None,
    variant: str = "out",
    num_partitions: Optional[int] = None,
    chunk: int = 128,
    max_hops: Optional[int] = None,
) -> ray.data.Dataset:
    """Per-source histogram of hop distances: Dataset (source, dist,
    count) over ordered reachable pairs, self-pairs excluded. The shared
    building block for closeness / harmonic / eccentricity — one K-column
    BFS per source chunk, per-batch partial histograms, one small
    groupby per chunk (source chunks are disjoint, so chunks union
    without a cross-chunk shuffle)."""
    if sources is None:
        sources = [int(r["vertex"]) for r in graph.vertices().take_all()]
    sources = list(sources)
    outs: List[ray.data.Dataset] = []
    for lo in range(0, len(sources), chunk):
        ds = _k_column_hops(graph, sources[lo : lo + chunk], num_partitions,
                            10_000 if max_hops is None else int(max_hops),
                            variant)

        def _h(b: pa.Table) -> pa.Table:
            s = b["source"].to_numpy(zero_copy_only=False)
            v = b["vertex"].to_numpy(zero_copy_only=False)
            d = b["dist"].to_numpy(zero_copy_only=False)
            keep = s != v
            s, d = s[keep], d[keep]
            if len(s) == 0:
                return pa.table({"source": pa.array([], pa.int64()),
                                 "dist": pa.array([], pa.int64()),
                                 "count": pa.array([], pa.int64())})
            key = s * (d.max() + 1) + d
            uk, cnt = np.unique(key, return_counts=True)
            return pa.table({"source": pa.array(uk // (d.max() + 1), pa.int64()),
                             "dist": pa.array(uk % (d.max() + 1), pa.int64()),
                             "count": pa.array(cnt, pa.int64())})

        part = (
            ds.map_batches(_h, batch_format="pyarrow", batch_size=None)
            .groupby(["source", "dist"]).sum("count")
        )

        def _rename(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"source": pa.array([], pa.int64()),
                                 "dist": pa.array([], pa.int64()),
                                 "count": pa.array([], pa.int64())})
            return pa.table({"source": b["source"], "dist": b["dist"],
                             "count": b["sum(count)"]})

        outs.append(part.map_batches(_rename, batch_format="pyarrow", batch_size=None))
    ds = outs[0]
    for o in outs[1:]:
        ds = ds.union(o)
    return ds


def _profile_reduce(prof: ray.data.Dataset, value_fn) -> ray.data.Dataset:
    """Per-batch partial reduction of a (source, dist, count) profile
    followed by one small groupby — value_fn(dist, count) -> per-row
    contributions dict of numpy arrays."""

    def _partial(b: pa.Table) -> pa.Table:
        s = b["source"].to_numpy(zero_copy_only=False)
        d = b["dist"].to_numpy(zero_copy_only=False)
        c = b["count"].to_numpy(zero_copy_only=False)
        return value_fn(s, d, c)

    return prof.map_batches(_partial, batch_format="pyarrow", batch_size=None)


def closeness_centrality(
    graph: Graph,
    sources: Optional[Sequence[int]] = None,
    variant: str = "out",
    num_partitions: Optional[int] = None,
    chunk: int = 128,
    cutoff: Optional[int] = None,
) -> ray.data.Dataset:
    """igraph closeness (structural_properties.c, igraph_closeness):
    reached / Σ distance over reachable vertices (self excluded),
    restricted to the given ``variant`` direction. ``cutoff`` truncates
    every BFS at that hop level — only targets within cutoff hops
    count, the igraph_closeness_estimate cutoff contract
    (centrality.c:2720; the engine keeps its own reached/Σd convention
    rather than the 0.7 estimate's unreachable-distance-n penalty —
    documented deviation, consistent with the exact query). Vertices
    that reach nothing are omitted (igraph reports NaN). Returns
    (vertex, closeness) float64."""
    prof = distance_profile(graph, sources, variant, num_partitions, chunk,
                            max_hops=cutoff)

    def _vals(s, d, c):
        return pa.table({"vertex": pa.array(s, pa.int64()),
                         "r": pa.array(c, pa.int64()),
                         "s": pa.array(d * c, pa.int64())})

    agg = (
        _profile_reduce(prof, _vals)
        .groupby("vertex").sum(["r", "s"])
    )

    def _final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "closeness": pa.array([], pa.float64())})
        r = b["sum(r)"].to_numpy(zero_copy_only=False).astype(np.float64)
        sm = b["sum(s)"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = sm > 0
        return pa.table({"vertex": b["vertex"].to_numpy(zero_copy_only=False)[keep],
                         "closeness": pa.array(r[keep] / sm[keep], pa.float64())})

    return agg.map_batches(_final, batch_format="pyarrow", batch_size=None)


def harmonic_centrality(
    graph: Graph,
    sources: Optional[Sequence[int]] = None,
    variant: str = "out",
    num_partitions: Optional[int] = None,
    chunk: int = 128,
    return_numerator: bool = False,
) -> ray.data.Dataset:
    """igraph harmonic centrality (Σ 1/d over reachable, self excluded).

    The sum is computed as an EXACT integer numerator over the fixed
    denominator lcm(1..20) — N = Σ count_d · (L // d) — so the result is
    order-of-summation deterministic (the SQL oracle mirrors the same
    integer arithmetic). Requires every finite distance ≤ 20; guarded.
    ``return_numerator`` emits (vertex, hnum) int64 instead of the float
    N/L. Sources that reach nothing are omitted."""
    L = _HARMONIC_LCM
    prof = distance_profile(graph, sources, variant, num_partitions, chunk)

    def _vals(s, d, c):
        if len(d) and d.max() > 20:
            raise ValueError(
                f"harmonic_centrality exact-rational path requires hop "
                f"distances <= 20 (got {int(d.max())}); use distance_profile "
                f"directly for deeper graphs"
            )
        return pa.table({"vertex": pa.array(s, pa.int64()),
                         "hnum": pa.array(c * (L // np.maximum(d, 1)), pa.int64())})

    agg = _profile_reduce(prof, _vals).groupby("vertex").sum("hnum")

    def _final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            cols = {"vertex": pa.array([], pa.int64())}
            cols["hnum" if return_numerator else "harmonic"] = pa.array(
                [], pa.int64() if return_numerator else pa.float64())
            return pa.table(cols)
        n = b["sum(hnum)"].to_numpy(zero_copy_only=False)
        if return_numerator:
            return pa.table({"vertex": b["vertex"],
                             "hnum": pa.array(n, pa.int64())})
        return pa.table({"vertex": b["vertex"],
                         "harmonic": pa.array(n.astype(np.float64) / L,
                                              pa.float64())})

    return agg.map_batches(_final, batch_format="pyarrow", batch_size=None)


def eccentricity(
    graph: Graph,
    sources: Optional[Sequence[int]] = None,
    variant: str = "sym",
    num_partitions: Optional[int] = None,
    chunk: int = 128,
) -> ray.data.Dataset:
    """igraph_eccentricity (structural_properties.c): max hop distance to
    any reachable vertex. Default mode ALL (variant="sym") like igraph;
    sources reaching nothing are omitted. Returns (vertex, ecc) int64."""
    prof = distance_profile(graph, sources, variant, num_partitions, chunk)
    agg = prof.groupby("source").max("dist")

    def _final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "ecc": pa.array([], pa.int64())})
        return pa.table({"vertex": b["source"], "ecc": b["max(dist)"]})

    return agg.map_batches(_final, batch_format="pyarrow", batch_size=None)


def diameter_radius(
    graph: Graph,
    variant: str = "out",
    num_partitions: Optional[int] = None,
    chunk: int = 128,
) -> pa.Table:
    """(diameter, radius) over finite distances: diameter = max d(s,t)
    (igraph_diameter, unconn=False analogue — unreachable pairs ignored),
    radius = min eccentricity over sources that reach something."""
    ecc = eccentricity(graph, variant=variant, num_partitions=num_partitions,
                       chunk=chunk)
    dia = ecc.max("ecc")
    rad = ecc.min("ecc")
    return pa.table({"diameter": pa.array([int(dia)], pa.int64()),
                     "radius": pa.array([int(rad)], pa.int64())})


def path_length_hist(
    graph: Graph,
    sources: Optional[Sequence[int]] = None,
    num_partitions: Optional[int] = None,
    chunk: int = 128,
) -> pa.Table:
    """(dist, count) histogram of directed shortest-path lengths over
    ordered reachable pairs (source != target), igraph_path_length_hist
    semantics restricted to the given sources (default: every vertex —
    the exact histogram; pass a sample of sources for the estimated
    variant at scale, counts scale by |V|/|sources|)."""
    if sources is None:
        sources = [
            int(r["vertex"]) for r in graph.vertices().take_all()
        ]
    hist: dict = {}
    sources = list(sources)
    for lo in range(0, len(sources), chunk):
        ds = _k_column_hops(graph, sources[lo : lo + chunk], num_partitions, 10_000)

        def _h(b: pa.Table) -> pa.Table:
            d = b["dist"].to_numpy(zero_copy_only=False)
            s = b["source"].to_numpy(zero_copy_only=False)
            v = b["vertex"].to_numpy(zero_copy_only=False)
            d = d[s != v]  # ordered pairs, no self-pairs
            if len(d) == 0:
                return pa.table({"dist": pa.array([], pa.int64()),
                                 "count": pa.array([], pa.int64())})
            uniq, cnt = np.unique(d, return_counts=True)
            return pa.table({"dist": pa.array(uniq, pa.int64()),
                             "count": pa.array(cnt, pa.int64())})

        part = (
            ds.map_batches(_h, batch_format="pyarrow", batch_size=None)
            .groupby("dist").sum("count")
        )
        for r in part.take_all():
            hist[int(r["dist"])] = hist.get(int(r["dist"]), 0) + int(r["sum(count)"])
    dists = sorted(hist)
    return pa.table(
        {"dist": pa.array(dists, pa.int64()),
         "count": pa.array([hist[d] for d in dists], pa.int64())}
    )


def subcomponent(
    graph: Graph,
    v: int,
    mode: str = "out",
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """igraph_subcomponent (structural_properties.c:1193): the set of
    vertices reachable from ``v`` (mode="out"), reaching ``v``
    (mode="in"), or weakly connected to it (mode="all"). Returns a
    one-column Dataset (vertex,) including ``v`` itself."""
    variant = {"out": "out", "in": "rev", "all": "sym"}.get(mode)
    if variant is None:
        raise ValueError(f"mode must be out/in/all, got {mode!r}")
    prof = multi_source_hops(graph, [v], num_partitions=num_partitions,
                             variant=variant)

    def _proj(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vertex" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64())})
        return pa.table({"vertex": b["vertex"]})

    return prof.map_batches(_proj, batch_format="pyarrow", batch_size=None)


def longest_path_layers(
    graph: Graph,
    num_partitions: Optional[int] = None,
    max_iter: Optional[int] = None,
    engine: str = "tasks",
) -> SuperstepResult:
    """Topological layers of a DAG on the aligned superstep engine:
    layer(v) = length of the longest path from any source to v — the
    Kahn peel-round index (igraph_topological_sorting /
    igraph_is_dag, structural_properties.c:3287/3379: sorted by
    (layer, vertex) this is the deterministic topological order).

    Max-propagation fixpoint (the dual of sssp_hops' min-relaxation),
    negated through the same min-label gather kernel: changed vertices
    send −(layer+1) along out-edges, receivers keep the minimum ⇒ the
    maximum layer. Converges in depth+1 supersteps — each ~tens of ms on
    the aligned engine, with no driver-side join+materialize rounds.

    Raises ValueError if the fixpoint has not converged after
    ``max_iter`` supersteps (default |V|+1: any longer path implies a
    directed cycle, igraph_is_dag = False)."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())
    n = graph.num_vertices()
    if max_iter is None:
        max_iter = int(n) + 1

    csr = graph.csr_index("out", num_partitions, weighted=False)
    blocks = csr.block_descriptors()
    sentinel = int(2**62)

    def _init(sd: dict) -> dict:
        v = sd["vertex"]
        return {"vertex": v,
                "layer": np.zeros(len(v), dtype=np.int64),
                "changed": np.ones(len(v), dtype=bool)}

    state = _universe_state(graph, csr, _init)

    def gather_fn(sb, csr_desc, starts, scalars):
        nb = len(starts)
        segs = [[] for _ in range(nb)]
        fr = sb["changed"]
        msg_count = 0
        if fr.any():
            verts = sb["vertex"][fr]
            labs = -(sb["layer"][fr].astype(np.int64) + 1)
            dsts, negmax = minlabel_messages(csr_desc, verts, labs, sentinel)
            msg_count = len(dsts)
            bounds = np.searchsorted(dsts, starts[1:])
            lo = 0
            for r, hi in enumerate(list(bounds) + [len(dsts)]):
                if hi > lo:
                    segs[r].append((dsts[lo:hi], -negmax[lo:hi]))
                lo = hi
        return [tuple(s) for s in segs], msg_count

    def apply_fn(old, segments, scalars):
        vertex = old["vertex"]
        new = old["layer"].copy()
        for pairs in segments:
            for (sd, sm) in pairs:
                if not len(sd):
                    continue
                pos = np.searchsorted(vertex, sd)
                np.maximum.at(new, pos, sm)
        changed = new > old["layer"]
        return (
            {"vertex": vertex, "layer": new, "changed": changed},
            {"changed": float(changed.sum())},
        )

    res = al.run_aligned_loop(
        state=state,
        csr_descriptors=blocks,
        gather_fn=gather_fn,
        apply_fn=apply_fn,
        scalars={"changed": 1.0},
        make_scalars=lambda s, it: {"changed": s.get("changed", 0.0)},
        converged=lambda s, it: s.get("changed", 1.0) == 0.0,
        max_iter=max_iter,
        state_columns=["vertex", "layer", "changed"],
        engine=engine,
    )
    if res.scalars.get("changed", 0.0) != 0.0:
        raise ValueError(
            "longest_path_layers did not converge: graph has a directed cycle"
        )
    res.state = res.state.select_columns(["vertex", "layer"])
    return res


def convergence_degree(
    graph: Graph,
    num_partitions: Optional[int] = None,
    chunk: int = 128,
) -> ray.data.Dataset:
    """Per-edge geodesic field sizes (igraph_convergence_degree,
    structural_properties.c:4082): for each directed simple edge
    e = (u, v),

      ins(e)  = #{ i : d(i, u) + 1 = d(i, v) }   (sources whose
                 shortest-path DAG contains e)
      outs(e) = #{ t : d(v, t) + 1 = d(u, t) }   (targets; the
                 reference's reverse-BFS pass — d over reversed edges
                 from t IS the forward distance to t)

    and the convergence degree is (ins−outs)/(ins+outs). Returns exact
    integers (src, dst, ins, outs) — the ratio is derivable and the
    integers hash exactly. One all-sources K-column BFS (the
    path_length_hist machinery) + two self-joins of the distance table
    through the edge list with per-batch count pre-combine; the
    O(V·E) cost is the reference's own complexity class."""
    from igraph_ray.ops.relational import _dedup
    from igraph_ray.util import hash_join

    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())
    sources = [int(r["vertex"]) for r in graph.vertices().take_all()]
    D = multi_source_hops(graph, sources, num_partitions=num_partitions,
                          chunk=chunk, variant="out").materialize()
    edges = _dedup(graph.edges.filter(expr="src != dst")).materialize()

    def _count_pairs(first_rename, second_rename, keys, cond_cols):
        a = hash_join(
            edges.map_batches(
                lambda b: pa.table({"u": b["src"], "v": b["dst"]}),
                batch_format="pyarrow", batch_size=None),
            D.map_batches(first_rename, batch_format="pyarrow",
                          batch_size=None),
            on=keys[0], num_partitions=num_partitions)
        j = hash_join(a, D.map_batches(second_rename,
                                       batch_format="pyarrow",
                                       batch_size=None),
                      on=keys[1], num_partitions=num_partitions)
        ca, cb = cond_cols

        def _cnt(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or ca not in b.column_names:
                return pa.table({"u": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            da = b[ca].to_numpy(zero_copy_only=False)
            db = b[cb].to_numpy(zero_copy_only=False)
            keep = db == da + 1
            t = pa.table({"u": b["u"].filter(pa.array(keep)),
                          "v": b["v"].filter(pa.array(keep))})
            t = t.append_column("n", pa.array(
                np.ones(t.num_rows, np.int64)))
            return (t.group_by(["u", "v"]).aggregate([("n", "sum")])
                    .rename_columns(["u", "v", "n"]))

        g = (j.map_batches(_cnt, batch_format="pyarrow", batch_size=None)
             .groupby(["u", "v"]).sum("n"))
        return g.map_batches(
            lambda b: (pa.table({"u": b["u"], "v": b["v"],
                                 "n": b["sum(n)"]})
                       if b.num_rows else
                       pa.table({"u": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})),
            batch_format="pyarrow", batch_size=None)

    # ins: a = (i, u, du) joined on u; b = (i, v, dv) joined on (i, v)
    ins = _count_pairs(
        lambda b: pa.table({"i": b["source"], "u": b["vertex"],
                            "du": b["dist"]}),
        lambda b: pa.table({"i": b["source"], "v": b["vertex"],
                            "dv": b["dist"]}),
        ("u", ("i", "v")), ("du", "dv"))
    # outs: a = (v, t, dvt) joined on v; b = (u, t, dut) on (u, t) —
    # D rows are d(source→vertex), so v/u are the SOURCE side here
    outs = _count_pairs(
        lambda b: pa.table({"v": b["source"], "t": b["vertex"],
                            "dvt": b["dist"]}),
        lambda b: pa.table({"u": b["source"], "t": b["vertex"],
                            "dut": b["dist"]}),
        ("v", ("u", "t")), ("dvt", "dut"))
    both = hash_join(
        ins.map_batches(lambda b: pa.table(
            {"u": b["u"], "v": b["v"], "ins": b["n"]}),
            batch_format="pyarrow", batch_size=None),
        outs.map_batches(lambda b: pa.table(
            {"u": b["u"], "v": b["v"], "outs": b["n"]}),
            batch_format="pyarrow", batch_size=None),
        on=("u", "v"), num_partitions=num_partitions)
    return both.map_batches(
        lambda b: pa.table({"src": b["u"], "dst": b["v"],
                            "ins": b["ins"], "outs": b["outs"]}),
        batch_format="pyarrow", batch_size=None).sort(["src", "dst"])
