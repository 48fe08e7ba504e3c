"""Betweenness centrality — distributed Brandes over the aligned engine.

Reference semantics: ``igraph_betweenness``
(/root/reference/src/centrality.c:1700-1900, Brandes 2001): bc(w) =
Σ_{s≠w≠t} σ_st(w)/σ_st over directed shortest paths, endpoints excluded.
The reference runs one sequential BFS + dependency sweep per source; the
distributed shape here processes K sources at once in dense columns
(like paths.multi_source_hops) and two level-synchronous phases per
chunk:

- FORWARD: frontier BFS carrying path counts σ. Superstep t discovers
  level-t vertices: dist = t, σ = Σ σ(predecessors at t−1).
- BACKWARD: dependency accumulation δ_u = σ_u · Σ_{v: u→v, d_v=d_u+1}
  (1+δ_v)/σ_v, swept from the deepest level down over the REVERSED CSR.

Neither phase needs a driver-synchronized level scalar: state carries a
per-row level counter ``t`` (incremented/decremented in apply), so the
frontier test (dist == t) and the receiver filter (dist == t−1) are
local — the supersteps stream through the task graph back-pressure-free.

Exactly one backward level is live per superstep, which makes the
receiver filter sound: every message in flight was sent by a vertex at
the same level.

Scale notes: work per chunk is O(|E|·K/P) per level in both phases —
the Brandes optimum; σ/δ are float64 (path counts overflow int64 on
real graphs; the reference uses double too). Sources chunk through the
same CSR (built once); per-chunk partial bc vectors are tiny (n rows)
and sum through one groupby.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray import aligned as al
from igraph_ray.csr import fetch_block
from igraph_ray.graph import Graph
from igraph_ray.superstep import SuperstepResult

_INF = np.float64(np.inf)


def _universe_state(graph: Graph, csr, init_fn):
    if graph._explicit_n:
        return al.state_from_csr(csr, graph.num_vertices(), init_fn=init_fn)
    return al.state_from_dataset(
        graph.vertices(), [int(b) for b in csr.boundaries], init_fn=init_fn
    )


def _csc_push(sb_verts, contrib, csr_desc, starts, K):
    """Dense CSC push: per csr block, (width,K) contribution rows summed
    per dst via one reduceat — the multi_source_hops gather shape with
    SUM instead of MIN."""
    nb = len(starts)
    segs = [[] for _ in range(nb)]
    msg = 0
    if len(sb_verts) == 0:
        return [tuple(s) for s in segs], 0
    vmin, vmax = sb_verts.min(), sb_verts.max()
    for (vlo, vhi, ref) in csr_desc:
        if vhi < vmin or vlo > vmax:
            continue
        sel = (sb_verts >= vlo) & (sb_verts <= vhi)
        if not sel.any():
            continue
        blk = fetch_block(ref)
        from igraph_ray.csr import block_local, block_width

        c = np.zeros((block_width(blk), K))
        loc = block_local(blk, sb_verts[sel])
        pres = loc >= 0
        c[loc[pres], :] = contrib[sel, :][pres, :]
        if len(blk["in_starts"]) == 0:
            continue
        sums = np.add.reduceat(c[blk["in_src"], :], blk["in_starts"], axis=0)
        nz = sums.any(axis=1)
        if not nz.any():
            continue
        dsts = blk["in_dst"][nz]
        msg += int(nz.sum()) * K
        bounds = np.searchsorted(dsts, starts[1:])
        lo = 0
        smat = sums[nz, :]
        for r, hi in enumerate(list(bounds) + [len(dsts)]):
            if hi > lo:
                segs[r].append((dsts[lo:hi], smat[lo:hi, :].ravel()))
            lo = hi
    return [tuple(s) for s in segs], msg


def betweenness(
    graph: Graph,
    sources: Optional[Sequence[int]] = None,
    num_partitions: Optional[int] = None,
    chunk: int = 64,
    engine: str = "tasks",
    cutoff: Optional[int] = None,
) -> ray.data.Dataset:
    """Directed vertex betweenness. ``sources=None`` = exact (every
    vertex a source); pass a sample of sources for the estimated variant
    at scale (igraph_betweenness_estimate analogue — scale results by
    |V|/|sources| yourself). ``cutoff`` (hops) truncates every forward
    BFS at that level — only geodesics of length <= cutoff contribute,
    the igraph_betweenness_estimate cutoff contract (centrality.c:1909:
    nodes at 1-based distance cutoff+1 are discovered, counted as
    targets, never expanded). Returns (vertex, bc) float64 over the
    full universe (zeros included)."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    csr_out = graph.csr_index("out", num_partitions, weighted=False)
    csr_rev = graph.csr_index("rev", num_partitions, weighted=False)
    out_blocks = csr_out.block_descriptors()
    rev_blocks = csr_rev.block_descriptors()

    if sources is None:
        sources = [int(r["vertex"]) for r in graph.vertices().take_all()]
    sources = list(sources)
    if not sources:
        return ray.data.from_arrow(pa.table(
            {"vertex": pa.array([], pa.int64()),
             "bc": pa.array([], pa.float64())}))

    partials: List[ray.data.Dataset] = []
    for lo in range(0, len(sources), chunk):
        part = _chunk_betweenness(
            graph, csr_out, out_blocks, rev_blocks,
            sources[lo : lo + chunk], engine, cutoff=cutoff,
        )
        partials.append(part)

    ds = partials[0]
    for o in partials[1:]:
        ds = ds.union(o)
    agg = ds.groupby("vertex").sum("bc")

    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "bc": pa.array([], pa.float64())})
        return pa.table({"vertex": b["vertex"], "bc": b["sum(bc)"]})

    return agg.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def edge_betweenness(
    graph: Graph,
    sources: Optional[Sequence[int]] = None,
    num_partitions: Optional[int] = None,
    chunk: int = 64,
    engine: str = "tasks",
    cutoff: Optional[int] = None,
) -> ray.data.Dataset:
    """Directed edge betweenness over the distinct-edge view
    (``igraph_edge_betweenness``, /root/reference/src/centrality.c —
    Brandes with per-edge accumulation): ebc(u→v) = Σ_s σ_s(u) ·
    (1 + δ_s(v)) / σ_s(v) over edges on some shortest path
    (d_s(v) = d_s(u) + 1).  Reuses the vertex chunks' forward σ/BFS +
    backward δ sweeps unchanged; the per-edge score is then a pure
    join of the edge list with both endpoints' state vectors — no
    extra supersteps.  Returns (src, dst, ebc) float64 for every
    distinct edge."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    from igraph_ray.ops.relational import _dedup
    from igraph_ray.util import hash_join

    edges = _dedup(graph.edges.filter(expr="src != dst")).materialize()
    # σ must count each distinct edge once — rebuild the CSR over the
    # deduped view (parallel copies would double path counts and split
    # the per-edge credit invisibly)
    graph = Graph(edges, n=(graph.num_vertices() if graph._explicit_n
                            else None))

    csr_out = graph.csr_index("out", num_partitions, weighted=False)
    csr_rev = graph.csr_index("rev", num_partitions, weighted=False)
    out_blocks = csr_out.block_descriptors()
    rev_blocks = csr_rev.block_descriptors()

    if sources is None:
        sources = [int(r["vertex"]) for r in graph.vertices().take_all()]
    sources = list(sources)
    if not sources:
        return edges.map_batches(
            lambda b: pa.table({"src": b["src"], "dst": b["dst"],
                                "ebc": pa.array(np.zeros(b.num_rows))}),
            batch_format="pyarrow", batch_size=None)

    partials: List[ray.data.Dataset] = []
    for lo in range(0, len(sources), chunk):
        cs = sources[lo : lo + chunk]
        K = len(cs)
        final_state, _ = _chunk_brandes_state(
            graph, csr_out, out_blocks, rev_blocks, cs, engine,
            cutoff=cutoff)
        dcols = [f"d{k}" for k in range(K)]
        scols = [f"s{k}" for k in range(K)]
        ecols = [f"e{k}" for k in range(K)]

        @ray.remote
        def _tbl(block: dict, cols: List[str]) -> pa.Table:
            out = {"vertex": pa.array(block["vertex"], pa.int64())}
            for c in cols:
                out[c] = pa.array(block.get(
                    c, np.zeros(len(block["vertex"]))), pa.float64())
            return pa.table(out)

        ucols = dcols + scols
        vcols = dcols + scols + ecols
        stu = ray.data.from_arrow_refs(
            [_tbl.remote(b, ucols) for b in final_state.blocks])
        stv = ray.data.from_arrow_refs(
            [_tbl.remote(b, vcols) for b in final_state.blocks])
        stu = stu.map_batches(
            lambda b: b.rename_columns(
                ["src"] + [f"u_{c}" for c in b.column_names[1:]]),
            batch_format="pyarrow", batch_size=None)
        stv = stv.map_batches(
            lambda b: b.rename_columns(
                ["dst"] + [f"v_{c}" for c in b.column_names[1:]]),
            batch_format="pyarrow", batch_size=None)
        j = hash_join(edges, stu, on="src", num_partitions=num_partitions)
        j = hash_join(j, stv, on="dst", num_partitions=num_partitions)

        def _score(b: pa.Table, K=K, dcols=tuple(dcols), scols=tuple(scols),
                   ecols=tuple(ecols)) -> pa.Table:
            if b.num_rows == 0 or "src" not in b.column_names:
                return pa.table({"src": pa.array([], pa.int64()),
                                 "dst": pa.array([], pa.int64()),
                                 "ebc": pa.array([], pa.float64())})
            ebc = np.zeros(b.num_rows)
            for k in range(K):
                du = b[f"u_{dcols[k]}"].to_numpy(zero_copy_only=False)
                su = b[f"u_{scols[k]}"].to_numpy(zero_copy_only=False)
                dv = b[f"v_{dcols[k]}"].to_numpy(zero_copy_only=False)
                sv = b[f"v_{scols[k]}"].to_numpy(zero_copy_only=False)
                ev = b[f"v_{ecols[k]}"].to_numpy(zero_copy_only=False)
                on_path = np.isfinite(du) & (dv == du + 1.0) & (sv > 0)
                with np.errstate(divide="ignore", invalid="ignore"):
                    c = np.where(on_path, su * (1.0 + ev) / sv, 0.0)
                ebc += c
            return pa.table({"src": b["src"], "dst": b["dst"],
                             "ebc": pa.array(ebc, pa.float64())})

        partials.append(j.map_batches(_score, batch_format="pyarrow",
                                      batch_size=None).materialize())

    ds = partials[0]
    for o in partials[1:]:
        ds = ds.union(o)
    agg = ds.groupby(["src", "dst"]).sum("ebc")

    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "src" not in b.column_names:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "ebc": pa.array([], pa.float64())})
        return pa.table({"src": b["src"], "dst": b["dst"],
                         "ebc": b["sum(ebc)"]})

    return agg.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def _chunk_betweenness(graph, csr_out, out_blocks, rev_blocks, sources,
                       engine, cutoff=None):
    final_state, src_arr = _chunk_brandes_state(
        graph, csr_out, out_blocks, rev_blocks, sources, engine,
        cutoff=cutoff)
    K = len(sources)
    ecols = [f"e{k}" for k in range(K)]

    @ray.remote
    def _partial(block: dict) -> pa.Table:
        v = block["vertex"]
        bc = np.zeros(len(v))
        for k in range(K):
            delta = block.get(ecols[k])
            if delta is None:
                continue
            contrib = delta.copy()
            contrib[v == src_arr[k]] = 0.0  # endpoints excluded
            bc += contrib
        return pa.table({"vertex": pa.array(v, pa.int64()),
                         "bc": pa.array(bc, pa.float64())})

    return ray.data.from_arrow_refs(
        [_partial.remote(b) for b in final_state.blocks]
    )


def _chunk_brandes_state(graph, csr_out, out_blocks, rev_blocks, sources,
                         engine, cutoff=None):
    K = len(sources)
    src_arr = np.asarray(sources, dtype=np.int64)
    dcols = [f"d{k}" for k in range(K)]
    scols = [f"s{k}" for k in range(K)]
    ecols = [f"e{k}" for k in range(K)]

    # ---------------- forward: BFS levels + path counts -----------------
    def _init(sd: dict) -> dict:
        v = sd["vertex"]
        out = {"vertex": v, "t": np.zeros(len(v))}
        for k in range(K):
            is_src = v == src_arr[k]
            out[dcols[k]] = np.where(is_src, 0.0, _INF)
            out[scols[k]] = np.where(is_src, 1.0, 0.0)
        return out

    state = _universe_state(graph, csr_out, _init)

    def fwd_gather(sb, csr_desc, starts, scalars):
        verts = sb["vertex"]
        t = sb["t"][0] if len(sb["t"]) else 0.0
        dmat = np.stack([sb[c] for c in dcols], axis=1)
        smat = np.stack([sb[c] for c in scols], axis=1)
        contrib = np.where(dmat == t, smat, 0.0)
        live = contrib.any(axis=1)
        return _csc_push(verts[live], contrib[live, :], csr_desc, starts, K)

    def fwd_apply(old, segments, scalars):
        vertex = old["vertex"]
        t = old["t"][0] if len(old["t"]) else 0.0
        dmat = np.stack([old[c] for c in dcols], axis=1)
        smat = np.stack([old[c] for c in scols], axis=1)
        acc = np.zeros_like(smat)
        for pairs in segments:
            for (sd, sv) in pairs:
                if not len(sd):
                    continue
                pos = np.searchsorted(vertex, sd)
                acc[pos, :] += sv.reshape(len(sd), K)
        undiscovered = ~np.isfinite(dmat)
        newly = undiscovered & (acc > 0)
        dmat = np.where(newly, t + 1.0, dmat)
        smat = np.where(newly, acc, smat)
        out = {"vertex": vertex, "t": np.full(len(vertex), t + 1.0)}
        for k in range(K):
            out[dcols[k]] = dmat[:, k]
            out[scols[k]] = smat[:, k]
        return out, {"changed": float(newly.sum())}

    fwd = al.run_aligned_loop(
        state=state,
        csr_descriptors=out_blocks,
        gather_fn=fwd_gather,
        apply_fn=fwd_apply,
        scalars={"changed": 1.0},
        make_scalars=lambda s, it: {"changed": s.get("changed", 0.0)},
        converged=lambda s, it: s.get("changed", 1.0) == 0.0,
        max_iter=10_000 if cutoff is None else int(cutoff),
        state_columns=["vertex", "t"] + dcols + scols,
        engine=engine,
    )
    # natural convergence: the last superstep discovered nothing; a
    # cutoff-capped loop's last superstep may still have discovered
    # level-`cutoff` frontier vertices (targets, never expanded)
    maxdist = fwd.iterations - 1 if fwd.converged else fwd.iterations

    # ---------------- backward: dependency sweep ------------------------
    @ray.remote
    def _init_back(block: dict, L: float) -> dict:
        out = dict(block)
        out["t"] = np.full(len(block["vertex"]), L)
        for k in range(K):
            out[ecols[k]] = np.zeros(len(block["vertex"]))
        return out

    if maxdist >= 1:
        bstate = al.AlignedState(
            blocks=[_init_back.remote(b, float(maxdist)) for b in fwd.aligned_state.blocks],
            starts=fwd.aligned_state.starts,
        )

        def bwd_gather(sb, csr_desc, starts, scalars):
            verts = sb["vertex"]
            t = sb["t"][0] if len(sb["t"]) else 0.0
            dmat = np.stack([sb[c] for c in dcols], axis=1)
            smat = np.stack([sb[c] for c in scols], axis=1)
            emat = np.stack([sb[c] for c in ecols], axis=1)
            on_level = dmat == t
            with np.errstate(divide="ignore", invalid="ignore"):
                val = np.where(on_level & (smat > 0), (1.0 + emat) / smat, 0.0)
            live = val.any(axis=1)
            return _csc_push(verts[live], val[live, :], csr_desc, starts, K)

        def bwd_apply(old, segments, scalars):
            vertex = old["vertex"]
            t = old["t"][0] if len(old["t"]) else 0.0
            dmat = np.stack([old[c] for c in dcols], axis=1)
            smat = np.stack([old[c] for c in scols], axis=1)
            emat = np.stack([old[c] for c in ecols], axis=1)
            acc = np.zeros_like(emat)
            for pairs in segments:
                for (sd, sv) in pairs:
                    if not len(sd):
                        continue
                    pos = np.searchsorted(vertex, sd)
                    acc[pos, :] += sv.reshape(len(sd), K)
            receivers = dmat == (t - 1.0)
            emat = np.where(receivers, emat + smat * acc, emat)
            out = {"vertex": vertex, "t": np.full(len(vertex), t - 1.0)}
            for k in range(K):
                out[dcols[k]] = dmat[:, k]
                out[scols[k]] = smat[:, k]
                out[ecols[k]] = emat[:, k]
            return out, {}

        back = al.run_aligned_loop(
            state=bstate,
            csr_descriptors=rev_blocks,
            gather_fn=bwd_gather,
            apply_fn=bwd_apply,
            scalars={},
            make_scalars=lambda s, it: {},
            converged=lambda s, it: it + 1 >= maxdist,
            max_iter=maxdist,
            state_columns=["vertex", "t"] + dcols + scols + ecols,
            engine=engine,
        )
        final_state = back.aligned_state
    else:
        final_state = fwd.aligned_state

    return final_state, src_arr


# ------------------------------------------------------------- weighted

_WBC_GUARD_EDGES = 2_000_000


@ray.remote
def _wbc_task(arrays) -> pa.Table:
    """All-sources weighted Brandes (Brandes 2001, Dijkstra variant —
    a published algorithm, not the reference's code): σ counts over
    min-weight paths, δ accumulation in decreasing-distance order.
    With strictly positive weights, equal-distance vertices cannot lie
    on each other's shortest paths, so distance order is a valid
    dependency order regardless of heap tie-breaks."""
    import heapq

    src, dst, w = arrays
    if len(src) > _WBC_GUARD_EDGES:
        raise NotImplementedError(
            f"betweenness_weighted exact all-sources plan is guarded to "
            f"{_WBC_GUARD_EDGES} edges — use the sampled/unweighted "
            f"distributed paths at scale (betweenness.py)")
    verts = np.unique(np.concatenate([src, dst])) if len(src) else \
        np.array([], np.int64)
    n = len(verts)
    ridx = {int(v): i for i, v in enumerate(verts)}
    s_l = np.array([ridx[int(x)] for x in src], np.int64)
    d_l = np.array([ridx[int(x)] for x in dst], np.int64)
    order = np.lexsort((d_l, s_l))
    s_l, d_l, w_l = s_l[order], d_l[order], w[order].astype(np.float64)
    starts = np.searchsorted(s_l, np.arange(n + 1))
    bc = np.zeros(n, np.float64)
    INF = np.inf
    for s in range(n):
        dist = np.full(n, INF)
        sigma = np.zeros(n)
        dist[s] = 0.0
        sigma[s] = 1.0
        preds: list = [[] for _ in range(n)]
        heap = [(0.0, s)]
        popped: list = []
        done = np.zeros(n, bool)
        while heap:
            dv, v = heapq.heappop(heap)
            if done[v]:
                continue
            done[v] = True
            popped.append(v)
            for ei in range(int(starts[v]), int(starts[v + 1])):
                u = int(d_l[ei])
                nd = dv + w_l[ei]
                if nd < dist[u]:
                    dist[u] = nd
                    sigma[u] = sigma[v]
                    preds[u] = [v]
                    heapq.heappush(heap, (nd, u))
                elif nd == dist[u]:
                    sigma[u] += sigma[v]
                    preds[u].append(v)
        delta = np.zeros(n)
        for v in reversed(popped):
            for p in preds[v]:
                delta[p] += sigma[p] / sigma[v] * (1.0 + delta[v])
            if v != s:
                bc[v] += delta[v]
    return pa.table({"vertex": pa.array(verts.astype(np.int64)),
                     "bc": pa.array(bc)})


def betweenness_weighted(graph: Graph) -> ray.data.Dataset:
    """Exact weighted betweenness (igraph_betweenness with weights,
    centrality.c Dijkstra branch): (vertex, bc) over the weighted
    directed edges — ONE guarded task (the reference is likewise a
    sequential per-source sweep; the distributed/sampled unweighted
    plans above are the scale path)."""
    from igraph_ray.util import _concat_tables, drop_empty_blocks

    @ray.remote
    def _cols(t: pa.Table):
        if t is None or t.num_rows == 0 or "src" not in t.column_names:
            return (np.array([], np.int64), np.array([], np.int64),
                    np.array([], np.float64))
        return (t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                t["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
                t["weight"].to_numpy(zero_copy_only=False).astype(
                    np.float64))

    refs = drop_empty_blocks(graph.edges).to_arrow_refs()
    arrays = _cols.remote(_concat_tables.remote(refs))
    return ray.data.from_arrow(ray.get(_wbc_task.remote(arrays)))


@ray.remote
def _webc_task(arrays) -> pa.Table:
    """Weighted EDGE betweenness by the same Brandes–Dijkstra sweep:
    the dependency pushed across a shortest-path-DAG edge (p→v),
    σ_p/σ_v·(1+δ_v), IS that edge's per-source contribution."""
    import heapq

    src, dst, w = arrays
    if len(src) > _WBC_GUARD_EDGES:
        raise NotImplementedError(
            f"edge_betweenness_weighted guarded to {_WBC_GUARD_EDGES} "
            f"edges")
    verts = np.unique(np.concatenate([src, dst])) if len(src) else \
        np.array([], np.int64)
    n = len(verts)
    ridx = {int(v): i for i, v in enumerate(verts)}
    s_l = np.array([ridx[int(x)] for x in src], np.int64)
    d_l = np.array([ridx[int(x)] for x in dst], np.int64)
    order = np.lexsort((d_l, s_l))
    s_l, d_l, w_l = s_l[order], d_l[order], w[order].astype(np.float64)
    starts = np.searchsorted(s_l, np.arange(n + 1))
    ebc = np.zeros(len(s_l), np.float64)
    INF = np.inf
    for s in range(n):
        dist = np.full(n, INF)
        sigma = np.zeros(n)
        dist[s] = 0.0
        sigma[s] = 1.0
        pred_edges: list = [[] for _ in range(n)]  # edge indices
        heap = [(0.0, s)]
        popped: list = []
        done = np.zeros(n, bool)
        while heap:
            dv, v = heapq.heappop(heap)
            if done[v]:
                continue
            done[v] = True
            popped.append(v)
            for ei in range(int(starts[v]), int(starts[v + 1])):
                u = int(d_l[ei])
                nd = dv + w_l[ei]
                if nd < dist[u]:
                    dist[u] = nd
                    sigma[u] = sigma[v]
                    pred_edges[u] = [ei]
                    heapq.heappush(heap, (nd, u))
                elif nd == dist[u]:
                    sigma[u] += sigma[v]
                    pred_edges[u].append(ei)
        delta = np.zeros(n)
        for v in reversed(popped):
            for ei in pred_edges[v]:
                p = int(s_l[ei])
                c = sigma[p] / sigma[v] * (1.0 + delta[v])
                ebc[ei] += c
                delta[p] += c
    return pa.table({"src": pa.array(verts[s_l].astype(np.int64)),
                     "dst": pa.array(verts[d_l].astype(np.int64)),
                     "ebc": pa.array(ebc)})


def edge_betweenness_weighted(graph: Graph) -> ray.data.Dataset:
    """igraph_edge_betweenness with weights (centrality.c Dijkstra
    branch): (src, dst, ebc) — ONE guarded task, see
    betweenness_weighted."""
    from igraph_ray.util import _concat_tables, drop_empty_blocks

    @ray.remote
    def _cols(t: pa.Table):
        if t is None or t.num_rows == 0 or "src" not in t.column_names:
            return (np.array([], np.int64), np.array([], np.int64),
                    np.array([], np.float64))
        return (t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                t["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
                t["weight"].to_numpy(zero_copy_only=False).astype(
                    np.float64))

    refs = drop_empty_blocks(graph.edges).to_arrow_refs()
    arrays = _cols.remote(_concat_tables.remote(refs))
    return ray.data.from_arrow(ray.get(_webc_task.remote(arrays)))
