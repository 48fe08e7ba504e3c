"""Girth — length of the shortest cycle of the simple undirected view.

Reference: ``igraph_girth`` (/root/reference/src/structural_properties.c,
Alon–Yuster–Zwick style BFS-per-vertex with IGRAPH_SIMPLIFY adjacency;
acyclic graphs return 0).  Loops and parallel edges are ignored, exactly
like the reference's simplified lazy adjlist.

Distributed plan: chunked multi-source BFS (the K-column aligned loop the
distance/centrality family already uses) carrying per source both the
hop distance d and the *branch label* b — the minimum first-hop vertex
over all shortest paths from the source.  After convergence, every
undirected edge (u, w) proposes the cycle-length candidate
``d(u) + d(w) + 1`` for a source r when the closed walk
r→u,(u,w),w→r provably traverses (u, w) exactly once:

- ``d(u) == d(w)``: a same-level edge is on no shortest path, or
- ``b(u) != b(w)``: the two walks leave r on different first edges, so
  neither shortest path can end with (u, w) (if all shortest paths to u
  passed through w the two branch sets — hence their minima — would
  coincide).

Any closed walk through r that uses some edge exactly once contains a
cycle, so every candidate is ≥ girth; and for r ON a shortest cycle the
"opposite" edge meets one of the two conditions and yields exactly g
(odd g: the level-equal opposite edge; even g: the opposite vertex's two
approach branches differ — otherwise gluing the walks at the shared
first hop exhibits a shorter cycle).  Minimising over all sources and
edges is therefore exact — the same candidate rule the reference's
per-vertex BFS applies serially, evaluated here as a vectorized edge ×
chunk-of-sources join per chunk with early exit at the 3 lower bound.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray import aligned as al
from igraph_ray.csr import block_local, block_width, fetch_block
from igraph_ray.graph import Graph
from igraph_ray.util import hash_join

_INF = np.float64("inf")
_BSENT = np.int64(2**62)  # branch unset
_BSELF = np.int64(-1)     # message sent by the source itself


def _k_column_dist_branch(graph: Graph, sources, num_partitions, max_iter):
    """(source, vertex, d, b) long-format state for ``sources`` over the
    sym CSR: d = hop distance, b = min first-hop over shortest paths
    (b == vertex for the source's direct neighbors, b == -1 at the
    source itself)."""
    K = len(sources)
    src_arr = np.asarray(sources, dtype=np.int64)
    csr = graph.csr_index("sym", num_partitions, weighted=False)
    blocks = csr.block_descriptors()
    dcols = [f"d{k}" for k in range(K)]
    bcols = [f"b{k}" for k in range(K)]

    def _init(sd: dict) -> dict:
        v = sd["vertex"]
        out = {"vertex": v}
        for k in range(K):
            out[dcols[k]] = np.where(v == src_arr[k], 0.0, _INF)
            out[bcols[k]] = np.where(v == src_arr[k], _BSELF, _BSENT)
        return out

    if graph._explicit_n:
        state = al.state_from_csr(csr, graph.num_vertices(), init_fn=_init)
    else:
        state = al.state_from_dataset(
            graph.vertices(), [int(b) for b in csr.boundaries], init_fn=_init)

    def gather_fn(sb, csr_desc, starts, scalars):
        verts = sb["vertex"]
        dmat = np.stack([sb[c] for c in dcols], axis=1)        # (m, K)
        bmat = np.stack([sb[c] for c in bcols], axis=1)        # (m, K)
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
            w = block_width(blk)
            cd = np.full((w, K), _INF)
            cb = np.full((w, K), _BSENT, np.int64)
            loc = block_local(blk, verts[sel])
            pres = loc >= 0
            cd[loc[pres], :] = dmat[sel, :][pres, :] + 1.0
            cb[loc[pres], :] = bmat[sel, :][pres, :]
            if len(blk["in_starts"]) == 0:
                continue
            vals_d = cd[blk["in_src"], :]
            vals_b = cb[blk["in_src"], :]
            st = blk["in_starts"]
            min_d = np.minimum.reduceat(vals_d, st, axis=0)
            # lexicographic second key: mask branches of non-minimal-d rows
            glens = np.diff(np.append(st, len(vals_d))).astype(np.int64)
            exp_min = np.repeat(min_d, glens, axis=0)
            masked_b = np.where(vals_d == exp_min, vals_b, _BSENT)
            min_b = np.minimum.reduceat(masked_b, st, axis=0)
            dsts = blk["in_dst"]
            msg_count += len(dsts) * K
            bounds = np.searchsorted(dsts, starts[1:])
            lo = 0
            for r, hi in enumerate(list(bounds) + [len(dsts)]):
                if hi > lo:
                    segs[r].append((dsts[lo:hi],
                                    min_d[lo:hi, :].ravel(),
                                    min_b[lo:hi, :].ravel()))
                lo = hi
        return [tuple(s) for s in segs], msg_count

    def apply_fn(old, segments, scalars):
        vertex = old["vertex"]
        dmat = np.stack([old[c] for c in dcols], axis=1)
        bmat = np.stack([old[c] for c in bcols], axis=1)
        nd, nb_ = dmat.copy(), bmat.copy()
        for triples in segments:
            for (sd, sm, sb_) in triples:
                if not len(sd):
                    continue
                pos = np.searchsorted(vertex, sd)
                md = sm.reshape(len(sd), K)
                mb = sb_.reshape(len(sd), K)
                cur_d = nd[pos, :]
                cur_b = nb_[pos, :]
                takes_d = md < cur_d
                takes_b = (md == cur_d) & (mb < cur_b)
                upd = takes_d | takes_b
                nd[pos, :] = np.where(takes_d, md, cur_d)
                nb_[pos, :] = np.where(upd, mb, cur_b)
        # source-adjacent vertices adopt their own id as branch
        self_mark = (nd == 1.0) & (nb_ == _BSELF)
        if self_mark.any():
            vcol = np.broadcast_to(old["vertex"][:, None], nb_.shape)
            nb_ = np.where(self_mark, vcol, nb_)
        changed = float(((nd != dmat) | (nb_ != bmat)).sum())
        out = {"vertex": vertex}
        for k in range(K):
            out[dcols[k]] = nd[:, k]
            out[bcols[k]] = nb_[:, k]
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
        state_columns=["vertex"] + dcols + bcols,
    )

    def _long(b: pa.Table) -> pa.Table:
        v = b["vertex"].to_numpy(zero_copy_only=False)
        outs, outv, outd, outb = [], [], [], []
        for k in range(K):
            d = b[dcols[k]].to_numpy(zero_copy_only=False)
            bb = b[bcols[k]].to_numpy(zero_copy_only=False)
            keep = np.isfinite(d)
            outs.append(np.full(int(keep.sum()), src_arr[k], dtype=np.int64))
            outv.append(v[keep])
            outd.append(d[keep].astype(np.int64))
            outb.append(bb[keep].astype(np.int64))
        return pa.table(
            {"source": pa.array(np.concatenate(outs), pa.int64()),
             "vertex": pa.array(np.concatenate(outv), pa.int64()),
             "d": pa.array(np.concatenate(outd), pa.int64()),
             "b": pa.array(np.concatenate(outb), pa.int64())})

    return res.state.map_batches(_long, batch_format="pyarrow", batch_size=None)


def girth(
    graph: Graph,
    num_partitions: Optional[int] = None,
    chunk: int = 32,
    max_iter: int = 10_000,
) -> int:
    """Girth of the simple undirected view; 0 if acyclic (reference
    contract).  Cost class: all-sources BFS, chunked like betweenness /
    path_length_hist, with an early exit once a triangle is found."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    sym = graph.symmetrized(drop_loops=True)
    from igraph_ray.ops.relational import _dedup

    sym = _dedup(sym)

    def _canon(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = s < d
        return pa.table({"lo": pa.array(s[keep]), "hi": pa.array(d[keep])})

    und = sym.map_batches(_canon, batch_format="pyarrow", batch_size=None) \
        .materialize()
    if und.count() == 0:
        return 0

    sources = sorted(int(r["vertex"]) for r in graph.vertices().take_all())
    best = 0
    for lo_i in range(0, len(sources), chunk):
        cs = sources[lo_i : lo_i + chunk]
        state = _k_column_dist_branch(graph, cs, num_partitions, max_iter)
        su = state.map_batches(
            lambda b: pa.table({"source": b["source"], "lo": b["vertex"],
                                "du": b["d"], "bu": b["b"]}),
            batch_format="pyarrow", batch_size=None)
        sw = state.map_batches(
            lambda b: pa.table({"source": b["source"], "hi": b["vertex"],
                                "dw": b["d"], "bw": b["b"]}),
            batch_format="pyarrow", batch_size=None)
        j = hash_join(und, su, on="lo", num_partitions=num_partitions)
        j = hash_join(j, sw, on=["source", "hi"], num_partitions=num_partitions)

        def _cand(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "du" not in b.column_names:
                return pa.table({"cand": pa.array([], pa.int64())})
            du = b["du"].to_numpy(zero_copy_only=False)
            dw = b["dw"].to_numpy(zero_copy_only=False)
            bu = b["bu"].to_numpy(zero_copy_only=False)
            bw = b["bw"].to_numpy(zero_copy_only=False)
            # edges incident to the source never qualify (the walk would
            # reuse the edge); the opposite edge of the cycle covers them
            ok = (du > 0) & (dw > 0) & ((du == dw) | (bu != bw))
            if not ok.any():
                return pa.table({"cand": pa.array([], pa.int64())})
            c = (du[ok] + dw[ok] + 1).astype(np.int64)
            return pa.table({"cand": pa.array([int(c.min())], pa.int64())})

        cands = j.map_batches(_cand, batch_format="pyarrow", batch_size=None) \
            .materialize()
        if cands.count():
            m = int(cands.min("cand"))
            best = m if best == 0 else min(best, m)
        if best == 3:
            break  # girth cannot beat a triangle on the simple view
    return best
