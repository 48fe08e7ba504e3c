"""Actor-aligned multilevel Louvain — the fast engine for the community
sweeps.

Executes the SAME logical plan as louvain.py's Ray-Data loop (k_vc gather
-> choose_moves -> apply, coarsen between levels; community.c:2854
semantics) but pins every partition of the vertex state in a long-lived
actor, so one local-moving sweep is ONE actor round (~10-50 ms) instead of
a multi-join Dataset execution (~1-3 s fixed executor cost each — a
2-sweep 2-level run used to pay ~84 streaming-executor launches).

Exchange plan per sweep, mirroring aligned.py's P x P partition-aligned
pattern:
  - gather: each actor pushes (dst, comm(src), w) along its CSR rows,
    pre-combined per (dst, comm) (kernels.label_weight_messages), split by
    the static range boundaries.
  - volumes: each actor contributes its local (comm, sum deg, count);
    contributions are allgathered (every community's volume is global
    state — the replicated community table of distributed Louvain:
    Ghosh et al., IPDPS 2018; Grappolo). The table is O(#communities)
    and shrinks geometrically after the first sweep.
  - apply: choose_moves (louvain.py — shared verbatim with the dataset
    sweep, so both engines make bit-identical decisions whenever the
    float sums are exact, e.g. any integer-weighted graph).

Levels never leave the actors: contraction is one more label-push round
(received (dst, comm_src, w) messages become coarse edges
(comm(dst), comm_src, w)), the coarse graph is re-partitioned by the SAME
range boundaries (community labels are vertex ids, so the level-1 ranges
stay valid at every level), and label composition is an allgather of the
coarse level map (again O(#communities)). Scale story: state blocks and
message segments move node-to-node through the object store only; the
only driver traffic is per-sweep scalar move counts and the final
O(#communities) rank map.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.algorithms.louvain import LouvainResult, choose_moves
from igraph_ray.kernels import combine_label_weights, label_weight_messages


def _combine_sorted(keys: np.ndarray, *vals: np.ndarray):
    """Sum each vals array per distinct key; returns (sorted unique keys,
    summed vals...)."""
    order = np.argsort(keys, kind="stable")
    k = keys[order]
    first = np.empty(len(k), dtype=bool)
    first[0] = True
    np.not_equal(k[1:], k[:-1], out=first[1:])
    starts = np.flatnonzero(first)
    out = [k[starts]]
    for v in vals:
        out.append(np.add.reduceat(v[order], starts))
    return tuple(out)


_EMPTY_SEG = (np.empty(0, np.int64), np.empty(0, np.int64),
              np.empty(0, np.float64))


@ray.remote(num_cpus=0)
class _CommunityActor:
    """One range partition of the multilevel-Louvain vertex state."""

    def __init__(self, starts: np.ndarray, nb: int, group_size: int,
                 weighted: bool, resolution: float):
        self.starts = np.asarray(starts, dtype=np.int64)
        self.nb = nb
        self.gs = group_size
        self.weighted = weighted
        self.resolution = resolution
        self.csr = None          # level-1 CSR block descriptors
        self.coo = None          # coarse levels: (src, dst, w) src-major
        self.vertex = np.empty(0, np.int64)
        self.deg = np.empty(0, np.float64)
        self.comm = np.empty(0, np.int64)
        self.orig_vertex = np.empty(0, np.int64)
        self.orig_comm = np.empty(0, np.int64)
        self.level = 1

    # ---------- init ----------

    def init_level1(self, csr_descs, state_block) -> Tuple[int, float]:
        self.csr = csr_descs
        if state_block is not None:
            self.vertex = np.asarray(state_block["vertex"], dtype=np.int64)
            self.deg = np.asarray(state_block["deg"], dtype=np.float64)
        self.comm = self.vertex.copy()
        self.orig_vertex = self.vertex
        self.orig_comm = self.vertex.copy()
        return len(self.vertex), float(self.deg.sum())

    # ---------- per-sweep pieces ----------

    def _messages(self):
        """(dst, comm(src), w) combined per (dst, comm), dst-sorted.
        Coarse-level self-loops are excluded (they travel with the vertex
        and must not count as weight into the current community —
        louvain.py _pre), exactly like the loop-free level-1 CSR."""
        if len(self.vertex) == 0:
            return _EMPTY_SEG
        if self.level == 1:
            return label_weight_messages(self.csr, self.vertex, self.comm,
                                         self.weighted)
        src, dst, w = self.coo
        nl = src != dst
        if not nl.all():
            src, dst, w = src[nl], dst[nl], w[nl]
        if len(src) == 0:
            return _EMPTY_SEG
        lab = self.comm[np.searchsorted(self.vertex, src)]
        return combine_label_weights(dst, lab, w)

    def _split(self, d, l, w):
        cuts = np.searchsorted(d, self.starts[1:])
        segs, lo = [], 0
        for hi in list(cuts) + [len(d)]:
            segs.append((d[lo:hi], l[lo:hi], w[lo:hi]))
            lo = hi
        return segs

    def _pack(self, segs):
        return [tuple(segs[g:g + self.gs]) for g in range(0, self.nb, self.gs)]

    def _vol_contrib(self):
        if len(self.vertex) == 0:
            return (np.empty(0, np.int64), np.empty(0, np.float64),
                    np.empty(0, np.int64))
        return _combine_sorted(self.comm, self.deg,
                               np.ones(len(self.comm), np.int64))

    def _out(self, info):
        d, l, w = self._messages()
        return (*self._pack(self._split(d, l, w)), self._vol_contrib(), info)

    def bootstrap(self):
        return self._out({"moved": 0.0})

    @staticmethod
    def _gather_parts(segments):
        parts = [s for s in segments if len(s[0])]
        if not parts:
            return None
        return (np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]),
                np.concatenate([p[2] for p in parts]))

    def step(self, m2: float, vol_refs, idx_in_group: int,
             activation_salt, *groups):
        """Fused apply+gather: decide moves from the previous round's
        messages + volume table, update local labels, emit next round's
        messages and volume contribution."""
        t0 = time.perf_counter()
        segments = [grp[idx_in_group] for grp in groups]
        cat = self._gather_parts(segments)
        moved = 0
        if cat is not None and len(self.vertex):
            vols = [v for v in ray.get(list(vol_refs)) if len(v[0])]
            vc, vv, vn = _combine_sorted(
                np.concatenate([v[0] for v in vols]),
                np.concatenate([v[1] for v in vols]),
                np.concatenate([v[2] for v in vols]))
            d, l, w = cat
            v_arr, cand, kvc = combine_label_weights(d, l, w)
            pos_v = np.searchsorted(self.vertex, v_arr)
            cur = self.comm[pos_v]
            deg = self.deg[pos_v]
            ci = np.searchsorted(vc, cand)
            oi = np.searchsorted(vc, cur)
            bv, new = choose_moves(
                v=v_arr, cand=cand, kv=kvc, volc=vv[ci], cur=cur, deg=deg,
                vol_own=vv[oi], csize_c=vn[ci], csize_own=vn[oi], m2=m2,
                activation_salt=activation_salt, resolution=self.resolution)
            pos_b = np.searchsorted(self.vertex, bv)
            old = self.comm[pos_b]
            moved = int((new != old).sum())
            if moved:
                self.comm[pos_b] = new
        return self._out({"moved": float(moved),
                          "wall_ms": (time.perf_counter() - t0) * 1e3})

    # ---------- level transitions ----------

    def compose_local(self):
        """Level-1 composition: the level map IS the local label array."""
        self.orig_comm = self.comm.copy()
        return True

    def level_map(self):
        return (self.vertex, self.comm)

    def compose(self, map_refs) -> bool:
        """Fold an allgathered coarse level map (vertex -> comm over the
        CURRENT level's universe) into the original-vertex labels."""
        maps = [m for m in ray.get(list(map_refs)) if len(m[0])]
        if not maps or len(self.orig_comm) == 0:
            return True
        keys = np.concatenate([m[0] for m in maps])
        vals = np.concatenate([m[1] for m in maps])
        order = np.argsort(keys)
        keys, vals = keys[order], vals[order]
        pos = np.searchsorted(keys, self.orig_comm)
        ok = (pos < len(keys)) & (keys[np.clip(pos, 0, len(keys) - 1)]
                                  == self.orig_comm)
        self.orig_comm[ok] = vals[pos[ok]]
        return True

    def contract(self, idx_in_group: int, *groups):
        """Turn the final sweep's label messages into contracted coarse
        edges (comm(dst), comm(src), w), split by coarse-src range.
        Coarse-level self-loops re-enter as (c, c) (they carry the
        intra-community weight accumulated at earlier levels —
        louvain.py _coarsen keeps them)."""
        segments = [grp[idx_in_group] for grp in groups]
        cat = self._gather_parts(segments)
        srcs, dsts, ws = [], [], []
        if cat is not None and len(self.vertex):
            d, l, w = cat
            srcs.append(self.comm[np.searchsorted(self.vertex, d)])
            dsts.append(l)
            ws.append(w)
        if self.level > 1 and self.coo is not None:
            s0, d0, w0 = self.coo
            lo = s0 == d0
            if lo.any():
                cs = self.comm[np.searchsorted(self.vertex, s0[lo])]
                srcs.append(cs)
                dsts.append(cs)
                ws.append(w0[lo])
        if srcs:
            s, t, w = combine_label_weights(
                np.concatenate(srcs), np.concatenate(dsts),
                np.concatenate(ws))
        else:
            s, t, w = _EMPTY_SEG
        packed = self._pack(self._split(s, t, w))
        # ray flattens multi-return tuples; with a single group return the
        # group itself so the receiver's shape matches both arities
        return tuple(packed) if len(packed) > 1 else packed[0]

    def reinit(self, idx_in_group: int, *groups) -> int:
        """Adopt the contracted graph as the next level: local coo =
        combined incoming coarse-edge segments; universe = its srcs; deg
        includes self-loops (they carry intra weight — matches
        _degrees(sym) on the coarse table); all-singleton labels."""
        segments = [grp[idx_in_group] for grp in groups]
        cat = self._gather_parts(segments)
        if cat is not None:
            s, t, w = combine_label_weights(*cat)
            self.coo = (s, t, w)
            first = np.empty(len(s), dtype=bool)
            first[0] = True
            np.not_equal(s[1:], s[:-1], out=first[1:])
            starts = np.flatnonzero(first)
            self.vertex = s[starts]
            self.deg = np.add.reduceat(w, starts)
        else:
            self.coo = _EMPTY_SEG
            self.vertex = np.empty(0, np.int64)
            self.deg = np.empty(0, np.float64)
        self.comm = self.vertex.copy()
        self.level += 1
        return len(self.vertex)

    # ---------- finalization ----------

    def w_in_contrib(self, idx_in_group: int, *groups) -> float:
        """Sum of message weight landing inside the receiver's own
        community (+ local self-loop weight on coarse levels) — the
        intra-community weight numerator of modularity, counted once per
        direction like the sym table."""
        segments = [grp[idx_in_group] for grp in groups]
        cat = self._gather_parts(segments)
        w_in = 0.0
        if cat is not None and len(self.vertex):
            d, l, w = cat
            same = self.comm[np.searchsorted(self.vertex, d)] == l
            w_in += float(w[same].sum())
        if self.level > 1 and self.coo is not None:
            s0, d0, w0 = self.coo
            lo = s0 == d0
            if lo.any():
                w_in += float(w0[lo].sum())
        return w_in

    def min_vertex_contrib(self):
        """(label, min original vertex) over local original vertices —
        the canonical-renumber key (labels densify by order of first
        appearance by vertex id, community.c:2323-2342)."""
        if len(self.orig_vertex) == 0:
            return (np.empty(0, np.int64), np.empty(0, np.int64))
        order = np.argsort(self.orig_comm, kind="stable")
        c = self.orig_comm[order]
        v = self.orig_vertex[order]
        first = np.empty(len(c), dtype=bool)
        first[0] = True
        np.not_equal(c[1:], c[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        return (c[starts], np.minimum.reduceat(v, starts))

    def final_table(self, rank_keys, rank_vals) -> pa.Table:
        if len(self.orig_vertex) == 0:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "community": pa.array([], pa.int64())})
        lab = rank_vals[np.searchsorted(rank_keys, self.orig_comm)]
        return pa.table({"vertex": pa.array(self.orig_vertex, pa.int64()),
                         "community": pa.array(lab, pa.int64())})


def louvain_aligned(
    graph,
    num_partitions: Optional[int] = None,
    max_sweeps: int = 8,
    max_levels: int = 10,
    resolution: float = 1.0,
) -> LouvainResult:
    """Multilevel Louvain on the actor-aligned engine. Same contract as
    louvain.py:louvain (canonical dense labels, plain-gamma modularity of
    the final partition, level/sweep schedule with the 0.5% mover
    early-stop); identical output to the dataset engine whenever float
    sums are exact (unweighted / integer-weighted graphs — cross-checked
    in tests/test_community_aligned.py)."""
    from igraph_ray import aligned as al

    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    csr = graph.csr_index("sym", num_partitions, weighted=graph.weighted)
    state = al.state_from_csr(csr, None)
    if not state.blocks:
        from igraph_ray.algorithms.louvain import louvain as _ds_louvain
        return _ds_louvain(graph, num_partitions=num_partitions,
                           max_sweeps=max_sweeps, max_levels=max_levels,
                           resolution=resolution, mode="dataset")

    nb = len(state.blocks)
    gs = max(1, min(16, nb))
    ngroups = (nb + gs - 1) // gs
    nret = ngroups + 2  # segment groups..., vol contrib, info
    csr_by_block = al._csr_for_blocks(csr.block_descriptors(), state.starts)
    starts_ref = ray.put(state.starts)

    actors = [
        _CommunityActor.remote(starts_ref, nb, gs, graph.weighted, resolution)
        for _ in range(nb)
    ]
    inits = ray.get([
        a.init_level1.remote(csr_by_block[i], state.blocks[i])
        for i, a in enumerate(actors)
    ])
    n_cur = sum(n for n, _ in inits)
    m2 = float(sum(d for _, d in inits))
    if m2 == 0.0:
        for a in actors:
            ray.kill(a)
        from igraph_ray.algorithms.louvain import louvain as _ds_louvain
        return _ds_louvain(graph, num_partitions=num_partitions,
                           max_sweeps=max_sweeps, max_levels=max_levels,
                           resolution=resolution, mode="dataset")

    prev = [list(a.bootstrap.options(num_returns=nret).remote())
            for a in actors]

    def _groups_for(j, source):
        g = j // gs
        return g, [source[i][g] for i in range(nb)]

    def _level_modularity() -> float:
        """Q of the current labels on the current level's graph. Louvain's
        contraction invariant makes this the composed partition's plain
        modularity on the original graph: w_in from the last round's
        messages (+ coarse self-loops), vol² from the last volume
        contributions — both reflect the labels after the final sweep."""
        w_refs = []
        for j in range(nb):
            g, groups = _groups_for(j, prev)
            w_refs.append(actors[j].w_in_contrib.remote(j - g * gs, *groups))
        vols = [v for v in ray.get([prev[i][ngroups] for i in range(nb)])
                if len(v[0])]
        v2 = 0.0
        if vols:
            _, vv = _combine_sorted(np.concatenate([v[0] for v in vols]),
                                    np.concatenate([v[1] for v in vols]))
            v2 = float((vv * vv).sum())
        return float(sum(ray.get(w_refs))) / m2 - v2 / (m2 * m2)

    total_sweeps = 0
    level = 0
    q = float("nan")
    while level < max_levels:
        level += 1
        n_before = n_cur
        moved_any = False
        for _ in range(max_sweeps):
            vol_refs = [prev[i][ngroups] for i in range(nb)]
            outs = []
            for j in range(nb):
                g, groups = _groups_for(j, prev)
                outs.append(list(
                    actors[j].step.options(num_returns=nret).remote(
                        m2, vol_refs, j - g * gs, None, *groups)))
            prev = outs
            infos = ray.get([prev[i][ngroups + 1] for i in range(nb)])
            moved = int(sum(i["moved"] for i in infos))
            total_sweeps += 1
            if moved <= max(0, int(0.005 * n_before)):
                moved_any = moved_any or moved > 0
                break
            moved_any = True
        # fold this level's labels into the original-vertex mapping, and
        # take Q now — prev's segments address THIS level's universe, so
        # it must be measured before the actors adopt the coarse graph
        if level == 1:
            ray.get([a.compose_local.remote() for a in actors])
        else:
            maps = [a.level_map.remote() for a in actors]
            ray.get([a.compose.remote(maps) for a in actors])
        q = _level_modularity()
        if not moved_any:
            break
        # contract on the final labels (prev's segments reflect them) and
        # re-seed the actors with the coarse graph
        cons = []
        for j in range(nb):
            g, groups = _groups_for(j, prev)
            if ngroups > 1:
                cons.append(list(actors[j].contract.options(
                    num_returns=ngroups).remote(j - g * gs, *groups)))
            else:
                cons.append([actors[j].contract.remote(j - g * gs, *groups)])
        ns = []
        for j in range(nb):
            g, groups = _groups_for(j, cons)
            ns.append(actors[j].reinit.remote(j - g * gs, *groups))
        n_cur = int(sum(ray.get(ns)))
        if n_cur >= n_before:
            break
        prev = [list(a.bootstrap.options(num_returns=nret).remote())
                for a in actors]

    # canonical renumber: dense rank of (min vertex id per community)
    contribs = ray.get([a.min_vertex_contrib.remote() for a in actors])
    contribs = [c for c in contribs if len(c[0])]
    keys = np.concatenate([c[0] for c in contribs])
    minv = np.concatenate([c[1] for c in contribs])
    order = np.argsort(keys, kind="stable")
    keys, minv = keys[order], minv[order]
    first = np.empty(len(keys), dtype=bool)
    first[0] = True
    np.not_equal(keys[1:], keys[:-1], out=first[1:])
    starts_i = np.flatnonzero(first)
    label = keys[starts_i]
    gmin = np.minimum.reduceat(minv, starts_i)
    rank = np.empty(len(gmin), dtype=np.int64)
    rank[np.argsort(gmin, kind="stable")] = np.arange(len(gmin))
    rk_ref, rv_ref = ray.put(label), ray.put(rank)

    tables = [a.final_table.remote(rk_ref, rv_ref) for a in actors]
    final = ray.data.from_arrow_refs(tables).materialize()
    for a in actors:
        ray.kill(a)
    return LouvainResult(state=final, modularity=q, levels=level,
                         sweeps=total_sweeps)
