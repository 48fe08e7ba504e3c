"""k-core decomposition: coreness number per vertex.

Reference: igraph_coreness (/root/reference/src/cores.c:31) — sequential
bucket peeling. Peeling is inherently serial, so this uses the h-operator
fixpoint instead (Lü, Zhou, Zhang et al., "The H-index of a network node",
Nature Communications 2016): initialize c(v) = deg(v); repeatedly set
c(v) = H({c(u) : u ~ v}) where H is the h-index (the largest h such that
at least h neighbors have value >= h). The sequence is non-increasing and
converges exactly to the coreness. Iterations are bounded by the graph's
"convergence depth" (small on real graphs; O(V) worst case on paths).

Superstep shape: gather ships each vertex's current estimate to its
neighbors over the symmetrized CSR (message volume O(E) per superstep,
like LPA's label messages — h-index needs the neighbor multiset, so
there is no per-dst combine); apply computes every vertex's h-index in
one vectorized pass (per-dst descending sort + rank/value min-max).
Multi-edges contribute with multiplicity and loops are dropped, matching
the sym CSR variant's view (= igraph_coreness on the simplified
undirected multigraph view with IGRAPH_ALL).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import ray

from igraph_ray import aligned as al
from igraph_ray.graph import Graph
from igraph_ray.superstep import SuperstepResult


def _h_index_grouped(dst: np.ndarray, val: np.ndarray, own_dst: np.ndarray):
    """h-index per dst over (dst, val) pairs: for each dst, the largest h
    with >= h values >= h. Returns array aligned to own_dst (0 where a
    vertex received nothing). Fully vectorized: sort by (dst, -val), rank
    within group, h = max(min(rank, val))."""
    out = np.zeros(len(own_dst), dtype=np.int64)
    if len(dst) == 0:
        return out
    order = np.lexsort((-val, dst))
    d, v = dst[order], val[order]
    newgrp = np.empty(len(d), dtype=bool)
    newgrp[0] = True
    np.not_equal(d[1:], d[:-1], out=newgrp[1:])
    gstart = np.flatnonzero(newgrp)
    gid = np.cumsum(newgrp) - 1
    rank = np.arange(len(d)) - gstart[gid] + 1
    score = np.minimum(rank, v)
    h = np.zeros(len(gstart), dtype=np.int64)
    np.maximum.at(h, gid, score)
    pos = np.searchsorted(own_dst, d[gstart])
    out[pos] = h
    return out


def coreness(
    graph: Graph,
    num_partitions: Optional[int] = None,
    max_iter: int = 10_000,
    engine: str = "tasks",
) -> SuperstepResult:
    """Returns SuperstepResult with state (vertex, coreness) over the whole
    universe (isolated vertices get 0)."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    csr = graph.csr_index("sym", num_partitions, weighted=False)
    blocks = csr.block_descriptors()

    def _init(sd: dict) -> dict:
        # deg from state_from_csr is the sym out-degree = undirected degree
        return {"vertex": sd["vertex"], "core": sd["deg"].astype(np.int64)}

    # state_from_csr's deg over the sym CSR is the undirected (IGRAPH_ALL)
    # degree on both the dense and the sparse universe
    state = al.state_from_csr(
        csr, graph.num_vertices() if graph._explicit_n else None, init_fn=_init
    )

    def gather_fn(sb, csr_desc, starts, scalars):
        from igraph_ray.csr import fetch_block

        verts = sb["vertex"]
        core = sb["core"]
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

            vals_local = np.zeros(block_width(blk), dtype=np.int64)
            loc = block_local(blk, verts[sel])
            pres = loc >= 0
            vals_local[loc[pres]] = core[sel][pres]
            # one (dst, estimate) message per edge — h-index needs the
            # multiset, shipped dst-sorted via the in-index layout
            ip_edges = vals_local[blk["in_src"]]
            gl = np.diff(np.append(blk["in_starts"], len(blk["in_src"])))
            dsts_edges = np.repeat(blk["in_dst"], gl)
            msg_count += len(dsts_edges)
            bounds = np.searchsorted(dsts_edges, starts[1:])
            lo = 0
            for r, hi in enumerate(list(bounds) + [len(dsts_edges)]):
                if hi > lo:
                    segs[r].append((dsts_edges[lo:hi], ip_edges[lo:hi]))
                lo = hi
        return [tuple(s) for s in segs], msg_count

    def apply_fn(old, segments, scalars):
        vertex = old["vertex"]
        parts_d, parts_v = [], []
        for pairs in segments:
            for (sd, sv) in pairs:
                if len(sd):
                    parts_d.append(np.asarray(sd, dtype=np.int64))
                    parts_v.append(sv)
        if parts_d:
            h = _h_index_grouped(
                np.concatenate(parts_d), np.concatenate(parts_v), vertex
            )
        else:
            h = np.zeros(len(vertex), dtype=np.int64)
        new = np.minimum(old["core"], h)
        changed = int((new < old["core"]).sum())
        return ({"vertex": vertex, "core": new}, {"changed": float(changed)})

    res = al.run_aligned_loop(
        state=state,
        csr_descriptors=blocks,
        gather_fn=gather_fn,
        apply_fn=apply_fn,
        scalars={"changed": 1.0},
        make_scalars=lambda s, it: {"changed": s.get("changed", 0.0)},
        converged=lambda s, it: s.get("changed", 1.0) == 0.0,
        max_iter=max_iter,
        state_columns=["vertex", "core"],
        engine=engine,
    )

    import pyarrow as pa

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"], "coreness": b["core"]})

    res.state = res.state.map_batches(_rn, batch_format="pyarrow", batch_size=None)
    return res
