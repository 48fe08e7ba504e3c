"""Distributed s-t maximum flow / minimum cut.

Reference semantics: ``igraph_maxflow`` (/root/reference/src/flow.c:53-477)
— push-relabel preflow algorithm; returns the max-flow value and the
minimum cut partition (phase 1 of the reference's two-phase scheme;
flow.c computes per-edge flows in a second phase, which this v0 omits —
value + cut + partition are the quantities the mincut/cohesion callers
use). Parallel edges add their capacities, as in the reference's edge
collapsing; loops are ignored.

Ray-native plan — NOT a port of the reference's sequential buckets: a
synchronous (pulse-based) parallel push-relabel, the classic BSP
formulation from Goldberg & Tarjan's parallel variant (public
algorithm):

- vertices are range-partitioned; each partition owns a CSR-like arc
  store: per arc (owner, nbr) → capacity(owner→nbr), net flow, and a
  cached neighbor height. Arcs are symmetric (every {u,v} pair appears
  at both endpoints); flow is antisymmetric and kept consistent by
  mirrored delta messages.
- one pulse = one Ray task per partition: apply incoming flow/height
  messages → vectorized multi-arc push from all active vertices
  (admissible = residual > 0 and cached h(nbr) == h(v) - 1) → local
  relabel (h := 1 + min residual neighbor height when no arc is
  admissible) → emit per-partition flow + height-update messages.
  All numpy segment kernels; no Python loop over vertices.
- every ``global_relabel_every`` pulses, heights are recomputed EXACTLY
  by a distributed backward BFS from t over the residual graph (the
  standard global-relabel heuristic, which also bounds the damage a
  one-pulse-stale height cache can do).
- termination is certificate-based, independent of height staleness:
  when no active vertex remains and no message is in flight, a forward
  residual BFS from s must fail to reach t (max-flow/min-cut duality);
  otherwise the loop global-relabels and continues. value = excess(t);
  the cut side S is the set that cannot reach t in the final residual
  graph.

State blocks live in the object store and move block-to-block between
pulses; the driver sees only ObjectRefs and small scalar dicts. Message
bundles are object-store refs resolved inside the receiving task (the
same P×P aligned exchange PageRank's task engine uses).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.csr import compute_boundaries

_BIG = np.int64(1 << 40)


# ------------------------------------------------------------ state build

@ray.remote
def _build_flow_block(tables_refs, vlo: int, vhi: int, n: int):
    """One partition's arc store from its (owner, nbr, cap) rows."""
    tabs = []
    for t in ray.get(list(tables_refs)):
        if t is None or t.num_rows == 0 or "owner" not in t.column_names:
            continue
        # defensive range filter (used only by the fallback routing path)
        ow = t["owner"].to_numpy(zero_copy_only=False)
        keep = (ow >= vlo) & (ow < vhi)
        tabs.append(
            (ow[keep],
             t["nbr"].to_numpy(zero_copy_only=False)[keep],
             t["cap"].to_numpy(zero_copy_only=False)[keep].astype(np.float64))
        )
    if tabs:
        owner = np.concatenate([x[0] for x in tabs])
        nbr = np.concatenate([x[1] for x in tabs])
        cap = np.concatenate([x[2] for x in tabs])
    else:
        owner = np.empty(0, np.int64); nbr = np.empty(0, np.int64); cap = np.empty(0, np.float64)
    order = np.lexsort((nbr, owner))
    owner, nbr, cap = owner[order], nbr[order], cap[order]
    # collapse duplicates (parallel edges + the zero-cap reverse placeholders)
    if len(owner):
        key = (owner - vlo) * np.int64(n + 1) + nbr
        uniq_mask = np.r_[True, key[1:] != key[:-1]]
        idx = np.flatnonzero(uniq_mask)
        cap = np.add.reduceat(cap, idx)
        owner, nbr, key = owner[uniq_mask], nbr[uniq_mask], key[uniq_mask]
    else:
        key = np.empty(0, np.int64)
    m = vhi - vlo
    counts = np.bincount(owner - vlo, minlength=m) if len(owner) else np.zeros(m, np.int64)
    indptr = np.zeros(m + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])
    return {
        "vlo": vlo, "vhi": vhi,
        "indptr": indptr,
        "nbr": nbr,
        "cap": cap,
        "flow": np.zeros(len(nbr), np.float64),
        "hnbr": np.zeros(len(nbr), np.int64),
        "key": key,  # (owner-vlo)*(n+1)+nbr, sorted — arc lookup index
        "e": np.zeros(m, np.float64),
        "h": np.zeros(m, np.int64),
        "dist": np.full(m, -1, np.int64),
    }


def _route(dst: np.ndarray, payloads, bnds: np.ndarray, P: int):
    """Split message arrays by destination partition (range partitioning)."""
    if len(dst) == 0:
        return [None] * P
    part = np.searchsorted(bnds, dst, side="right")
    order = np.argsort(part, kind="stable")
    part_s = part[order]
    outs: List = [None] * P
    starts = np.searchsorted(part_s, np.arange(P))
    ends = np.searchsorted(part_s, np.arange(P), side="right")
    for p in range(P):
        s, e = starts[p], ends[p]
        if e > s:
            sel = order[s:e]
            outs[p] = tuple(a[sel] for a in (dst,) + tuple(payloads))
    return outs


def _arc_idx(block: dict, dst: np.ndarray, src: np.ndarray, n: int) -> np.ndarray:
    """Locate arcs (dst → src) in this block's sorted key index."""
    key = (dst - block["vlo"]) * np.int64(n + 1) + src
    pos = np.searchsorted(block["key"], key)
    pos = np.minimum(pos, max(0, len(block["key"]) - 1))
    if len(key) and not np.array_equal(block["key"][pos], key):
        raise RuntimeError("flow message references a non-existent arc")
    return pos


def _my_slot(refs, p: int):
    """Resolve message-bundle refs inside a task and pick this partition's
    slot. ``refs`` is a list of per-source refs (or None)."""
    out = []
    for r in refs:
        if r is None:
            out.append(None)
            continue
        bundle = ray.get(r)
        out.append(bundle[p] if bundle is not None else None)
    return out


def _copy(block: dict) -> dict:
    return {k: (v.copy() if isinstance(v, np.ndarray) else v) for k, v in block.items()}


def _apply_flow_msgs(b: dict, flow_in, n: int) -> None:
    for msg in flow_in:
        if msg is None:
            continue
        dst, src, delta = msg
        idx = _arc_idx(b, dst, src, n)
        np.subtract.at(b["flow"], idx, delta)
        np.add.at(b["e"], dst - b["vlo"], delta)


def _apply_height_msgs(b: dict, height_in, n: int) -> None:
    for msg in height_in:
        if msg is None:
            continue
        dst, src, hh = msg
        idx = _arc_idx(b, dst, src, n)
        b["hnbr"][idx] = hh


# ------------------------------------------------------------ pulse task

@ray.remote(num_returns=4)
def _pulse(block, n, s, t, P, p, bnds_arr, fout_refs, hout_refs):
    """One push-relabel pulse for one partition."""
    b = _copy(block)
    _apply_flow_msgs(b, _my_slot(fout_refs, p), n)
    _apply_height_msgs(b, _my_slot(hout_refs, p), n)
    vlo, vhi = b["vlo"], b["vhi"]
    e, h = b["e"], b["h"]
    flow, cap, nbr, hnbr, indptr = b["flow"], b["cap"], b["nbr"], b["hnbr"], b["indptr"]
    m = vhi - vlo

    owner_loc = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
    res = cap - flow
    verts = np.arange(vlo, vhi, dtype=np.int64)
    active = (e > 1e-12) & (h < n) & (verts != s) & (verts != t)

    adm = active[owner_loc] & (res > 1e-12) & (hnbr == h[owner_loc] - 1)
    push = np.zeros(len(nbr), np.float64)
    if adm.any():
        r_adm = np.where(adm, res, 0.0)
        cs = np.cumsum(r_adm)
        starts = indptr[:-1]
        base = np.where(starts > 0, cs[np.maximum(starts - 1, 0)], 0.0)
        prefix_before = (cs - r_adm) - base[owner_loc]
        remaining = e[owner_loc] - prefix_before
        push = np.clip(np.minimum(r_adm, remaining), 0.0, None)
        push[~adm] = 0.0
        flow += push
        e -= np.bincount(owner_loc, weights=push, minlength=m)

    # local relabel: still-active vertices with no admissible arc left
    res = cap - flow
    min_h = np.full(m, _BIG, np.int64)
    has_res = res > 1e-12
    if has_res.any():
        np.minimum.at(min_h, owner_loc[has_res], hnbr[has_res])
    still = (e > 1e-12) & (h < n) & (verts != s) & (verts != t)
    can_relabel = still & (min_h < _BIG) & (min_h >= h)
    h_old = h.copy()
    h[can_relabel] = min_h[can_relabel] + 1

    sent = push > 1e-15
    flow_out = _route(nbr[sent], (verts[owner_loc[sent]], push[sent]), bnds_arr, P)
    changed = h != h_old
    if changed.any():
        arc_sel = changed[owner_loc]
        height_out = _route(
            nbr[arc_sel], (verts[owner_loc[arc_sel]], h[owner_loc[arc_sel]]),
            bnds_arr, P)
    else:
        height_out = [None] * P
    n_active = int(((e > 1e-12) & (h < n) & (verts != s) & (verts != t)).sum())
    scal = {
        "active": n_active,
        "excess_t": float(e[t - vlo]) if vlo <= t < vhi else 0.0,
        "msgs_out": int(sent.sum()),
    }
    return b, flow_out, height_out, scal


# ------------------------------------------------------------ BFS tasks

@ray.remote(num_returns=2)
def _seed_dist(block, P, bnds_arr, root, backward):
    b = _copy(block)
    vlo, vhi = b["vlo"], b["vhi"]
    b["dist"] = np.full(vhi - vlo, -1, np.int64)
    outs = [None] * P
    if vlo <= root < vhi:
        b["dist"][root - vlo] = 0
        indptr, nbr = b["indptr"], b["nbr"]
        res = b["cap"] - b["flow"]
        lo, hi = indptr[root - vlo], indptr[root - vlo + 1]
        sel = np.arange(lo, hi)
        if not backward:
            sel = sel[res[sel] > 1e-12]  # forward: sender owns the arc check
        dst = nbr[sel]
        outs = _route(dst, (np.full(len(dst), root, np.int64),
                            np.zeros(len(dst), np.int64)), bnds_arr, P)
    return b, outs


@ray.remote(num_returns=3)
def _bfs_round(block, n, P, p, bnds_arr, dist_refs, backward):
    """One frontier round of residual BFS. backward: dist-to-t; the
    receiver checks residual(dst→src) > 0 on its own arc record. forward:
    the sender already checked residual(src→dst)."""
    b = _copy(block)
    vlo, vhi = b["vlo"], b["vhi"]
    dist = b["dist"]
    res = b["cap"] - b["flow"]
    indptr, nbr = b["indptr"], b["nbr"]
    m = vhi - vlo
    owner_loc = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
    cand = np.full(m, _BIG, np.int64)
    for msg in _my_slot(dist_refs, p):
        if msg is None:
            continue
        dst, src, d = msg
        if backward:
            idx = _arc_idx(b, dst, src, n)
            ok = res[idx] > 1e-12
            dst, d = dst[ok], d[ok]
        if len(dst):
            np.minimum.at(cand, dst - vlo, d + 1)
    newly = (cand < _BIG) & (dist < 0)
    dist[newly] = cand[newly]
    outs = [None] * P
    n_new = int(newly.sum())
    if n_new:
        sel = newly[owner_loc]
        if not backward:
            sel &= res > 1e-12
        outs = _route(
            nbr[sel],
            ((owner_loc[sel] + vlo).astype(np.int64), dist[owner_loc[sel]]),
            bnds_arr, P)
    return b, outs, n_new


@ray.remote(num_returns=2)
def _apply_heights(block, n, s, P, bnds_arr):
    """After a backward BFS from t: h := dist (reachable) else n; h(s) = n.
    Emits a full height broadcast so every neighbor cache becomes exact."""
    b = _copy(block)
    vlo, vhi = b["vlo"], b["vhi"]
    m = vhi - vlo
    h = np.where(b["dist"] >= 0, b["dist"], n).astype(np.int64)
    if vlo <= s < vhi:
        h[s - vlo] = n
    b["h"] = h
    indptr, nbr = b["indptr"], b["nbr"]
    owner_loc = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
    verts = np.arange(vlo, vhi, dtype=np.int64)
    outs = _route(nbr, (verts[owner_loc], h[owner_loc]), bnds_arr, P)
    return b, outs


@ray.remote
def _absorb_heights(block, n, p, hout_refs):
    b = _copy(block)
    _apply_height_msgs(b, _my_slot(hout_refs, p), n)
    return b


@ray.remote(num_returns=2)
def _saturate_source(block, s, P, bnds_arr):
    b = _copy(block)
    vlo, vhi = b["vlo"], b["vhi"]
    outs = [None] * P
    if vlo <= s < vhi:
        indptr, nbr, cap, flow = b["indptr"], b["nbr"], b["cap"], b["flow"]
        lo, hi = indptr[s - vlo], indptr[s - vlo + 1]
        sel = np.arange(lo, hi)
        sel = sel[cap[sel] > 1e-12]
        flow[sel] = cap[sel]
        outs = _route(nbr[sel], (np.full(len(sel), s, np.int64),
                                 cap[sel].astype(np.float64)), bnds_arr, P)
    return b, outs


@ray.remote
def _apply_flow_only(block, n, p, fout_refs):
    b = _copy(block)
    _apply_flow_msgs(b, _my_slot(fout_refs, p), n)
    return b


@ray.remote
def _peek(block, target):
    """(excess_t or None, vertices with dist<0) — small result extraction."""
    vlo, vhi = block["vlo"], block["vhi"]
    et = float(block["e"][target - vlo]) if vlo <= target < vhi else None
    td = int(block["dist"][target - vlo]) if vlo <= target < vhi else None
    vs = np.arange(vlo, vhi, dtype=np.int64)
    return et, td, vs[block["dist"] < 0]


@dataclass
class MaxflowResult:
    value: float
    cut_side_s: np.ndarray  # vertices on the source side of a min cut
    pulses: int


def maxflow(
    edges: ray.data.Dataset,
    source: int,
    target: int,
    n: Optional[int] = None,
    capacity_col: str = "capacity",
    num_partitions: int = 4,
    global_relabel_every: int = 8,
    max_pulses: int = 100_000,
) -> MaxflowResult:
    """Max s-t flow value + min cut of a capacitated digraph Dataset
    (columns src, dst, ``capacity_col``; parallel edges add, loops drop)."""
    if source == target:
        raise ValueError("source == target")

    def _arcs(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False)
        dst = b["dst"].to_numpy(zero_copy_only=False)
        cap = b[capacity_col].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = src != dst
        src, dst, cap = src[keep], dst[keep], cap[keep]
        return pa.table({
            "owner": pa.array(np.concatenate([src, dst]), pa.int64()),
            "nbr": pa.array(np.concatenate([dst, src]), pa.int64()),
            "cap": pa.array(np.concatenate([cap, np.zeros(len(cap))]), pa.float64()),
        })

    arcs = edges.map_batches(_arcs, batch_format="pyarrow", batch_size=None).materialize()
    if n is None:
        n = int(arcs.max("owner")) + 1
    bnds = compute_boundaries(arcs, num_partitions, col="owner")
    sorted_arcs = (arcs.sort("owner", boundaries=bnds) if bnds
                   else arcs.sort("owner")).materialize()
    refs = sorted_arcs.to_arrow_refs()
    ranges = [0] + [int(x) for x in bnds] + [n]
    P = len(ranges) - 1
    if len(refs) == P:
        blocks_refs = [[refs[p]] for p in range(P)]
    else:
        # block/range mismatch (e.g. empty input): every builder scans all
        blocks_refs = [list(refs) for _ in range(P)]
    state = [
        _build_flow_block.remote(blocks_refs[p], ranges[p], ranges[p + 1], n)
        for p in range(P)
    ]
    bnds_arr = np.array(bnds, dtype=np.int64)

    def _bfs(state, root, backward):
        pairs = [_seed_dist.remote(state[p], P, bnds_arr, root, backward)
                 for p in range(P)]
        state = [pr[0] for pr in pairs]
        out_refs = [pr[1] for pr in pairs]
        for _ in range(n + 1):
            rs = [_bfs_round.remote(state[p], n, P, p, bnds_arr, out_refs, backward)
                  for p in range(P)]
            state = [r[0] for r in rs]
            out_refs = [r[1] for r in rs]
            counts = ray.get([r[2] for r in rs])
            if sum(counts) == 0:
                break
        return state

    def _relabel_and_broadcast(state):
        state = _bfs(state, target, True)
        pairs = [_apply_heights.remote(state[p], n, source, P, bnds_arr)
                 for p in range(P)]
        state = [pr[0] for pr in pairs]
        houts = [pr[1] for pr in pairs]
        return [_absorb_heights.remote(state[p], n, p, houts) for p in range(P)]

    # init: saturate source arcs, deliver excess, exact heights
    pairs = [_saturate_source.remote(state[p], source, P, bnds_arr) for p in range(P)]
    state = [pr[0] for pr in pairs]
    fouts = [pr[1] for pr in pairs]
    state = [_apply_flow_only.remote(state[p], n, p, fouts) for p in range(P)]
    state = _relabel_and_broadcast(state)

    none_refs = [None] * P
    fout_refs = list(none_refs)
    hout_refs = list(none_refs)
    pulses = 0
    while pulses < max_pulses:
        if pulses > 0 and pulses % global_relabel_every == 0:
            # flush pending flow messages, then exact-relabel
            state = [_apply_flow_only.remote(state[p], n, p, fout_refs)
                     for p in range(P)]
            fout_refs = list(none_refs)
            hout_refs = list(none_refs)
            state = _relabel_and_broadcast(state)
        rs = [
            _pulse.remote(state[p], n, source, target, P, p, bnds_arr,
                          fout_refs, hout_refs)
            for p in range(P)
        ]
        state = [r[0] for r in rs]
        fout_refs = [r[1] for r in rs]
        hout_refs = [r[2] for r in rs]
        scal = ray.get([r[3] for r in rs])
        pulses += 1
        n_active = sum(s_["active"] for s_ in scal)
        msgs_out = sum(s_["msgs_out"] for s_ in scal)
        if n_active == 0 and msgs_out == 0:
            # certificate: forward residual BFS from s must miss t
            state = _bfs(state, source, False)
            peeks = ray.get([_peek.remote(state[p], target) for p in range(P)])
            t_dist = next(td for _, td, _ in peeks if td is not None)
            if t_dist < 0:
                break
            state = _relabel_and_broadcast(state)

    # final: value + cut (backward residual BFS from t: unreachable = S side)
    state = _bfs(state, target, True)
    peeks = ray.get([_peek.remote(state[p], target) for p in range(P)])
    value = next(et for et, _, _ in peeks if et is not None)
    cut_side = np.sort(np.concatenate([c for _, _, c in peeks]))
    return MaxflowResult(value=float(value), cut_side_s=cut_side, pulses=pulses)


def st_edge_connectivity(
    edges: ray.data.Dataset,
    source: int,
    target: int,
    n: Optional[int] = None,
    directed: bool = True,
    num_partitions: int = 4,
) -> int:
    """igraph_st_edge_connectivity (flow.c:1263): max number of
    edge-disjoint s→t paths = maxflow with unit capacity per distinct
    arc. Undirected graphs count each edge once per direction."""

    def _unit(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False)
        dst = b["dst"].to_numpy(zero_copy_only=False)
        if not directed:
            src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
        return pa.table({
            "src": pa.array(src.astype(np.int64)),
            "dst": pa.array(dst.astype(np.int64)),
            "capacity": pa.array(np.ones(len(src), np.float64)),
        })

    unit = edges.map_batches(_unit, batch_format="pyarrow", batch_size=None)
    res = maxflow(unit, source, target, n=n, num_partitions=num_partitions)
    return int(round(res.value))


def st_vertex_connectivity(
    edges: ray.data.Dataset,
    source: int,
    target: int,
    n: Optional[int] = None,
    directed: bool = True,
    neighbors: str = "number_of_nodes",
    num_partitions: int = 4,
) -> int:
    """igraph_st_vertex_connectivity (flow.c:1652-1715 dispatch;
    construction flow.c:1717-1803): vertex-split transform — vertex v
    becomes v_out = v and v_in = n + v; each arc u→v is rewritten
    u→(n+v) unless v is source/target (then u→v), plus a unit splitter
    arc (n+v)→v per vertex; all capacities 1; answer = maxflow value.
    Undirected graphs are symmetrized first (flow.c:1805-1861).

    ``neighbors`` handles adjacent s,t as the reference's
    igraph_vconn_nei_t: "error" raises, "negative" returns -1,
    "number_of_nodes" returns n, "ignore" proceeds anyway."""
    if source == target:
        raise ValueError("source == target")

    if n is None:
        n = int(
            max(edges.max("src"), edges.max("dst"))
        ) + 1 if edges.count() else max(source, target) + 1

    if neighbors != "ignore":
        adj = edges.filter(
            expr=f"(src == {source} and dst == {target})"
            + ("" if directed else f" or (src == {target} and dst == {source})")
        ).count()
        if adj:
            if neighbors == "error":
                raise ValueError("source and target are adjacent")
            if neighbors == "negative":
                return -1
            return int(n)

    def _split(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not directed:
            src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
        keep = src != dst
        src, dst = src[keep], dst[keep]
        dst_in = np.where((dst == source) | (dst == target), dst, dst + n)
        return pa.table({
            "src": pa.array(src),
            "dst": pa.array(dst_in),
            "capacity": pa.array(np.ones(len(src), np.float64)),
        })

    split = edges.map_batches(_split, batch_format="pyarrow", batch_size=None)
    vs = np.arange(n, dtype=np.int64)
    splitters = ray.data.from_arrow(pa.table({
        "src": pa.array(vs + n),
        "dst": pa.array(vs),
        "capacity": pa.array(np.ones(n, np.float64)),
    }))
    res = maxflow(split.union(splitters), source, target, n=2 * n,
                  num_partitions=num_partitions)
    return int(round(res.value))


def mincut(
    edges: ray.data.Dataset,
    source: int,
    target: int,
    n: Optional[int] = None,
    capacity_col: str = "capacity",
    num_partitions: int = 4,
) -> MaxflowResult:
    """igraph_st_mincut (flow.c:1146): value + partition, via maxflow."""
    return maxflow(edges, source, target, n=n, capacity_col=capacity_col,
                   num_partitions=num_partitions)


def maxflow_value(edges: ray.data.Dataset, source: int, target: int,
                  **kwargs) -> float:
    """igraph_maxflow_value (flow.c): the flow value only."""
    return maxflow(edges, source, target, **kwargs).value


def st_mincut_value(edges: ray.data.Dataset, source: int, target: int,
                    **kwargs) -> float:
    """igraph_st_mincut_value (flow.c): equals the max-flow value by
    LP duality — the reference routes it through maxflow too."""
    return maxflow(edges, source, target, **kwargs).value
