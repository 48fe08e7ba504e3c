"""Actor-aligned multilevel community engines (Louvain + Leiden) — the
fast path for the community sweeps.

Executes the SAME logical plans as louvain.py / leiden.py's Ray-Data
loops (k_vc gather -> choose_moves -> apply, coarsen between levels;
community.c:2854 semantics, Traag et al. 2019 for the Leiden phases) but
pins every partition of the vertex state in a long-lived actor, so one
local-moving sweep is ONE actor round (~10-50 ms) instead of a
multi-join Dataset execution (~1-3 s fixed executor cost each — a
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
coarse level map (again O(#communities)).

Leiden's refinement phase adds two twists, both receiver-side:
  - the constrained sweep runs on the intra-community edge subset; here
    messages carry the source's phase-1 community and the receiver drops
    rows whose phase-1 label differs from its own (leiden.py _refine's
    intra table, expressed as a filter instead of a join);
  - cancel_vacated needs the global set of this sweep's movers, so each
    refine sweep is TWO actor rounds: choose (tentative moves + mover
    ids out) then commit (allgathered mover ids in, cancelled moves
    dropped, next messages out).

Scale story: state blocks and message segments move node-to-node through
the object store only; the only driver traffic is per-sweep scalar move
counts and the final O(#communities) rank map.
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


def _combine_pairs(d: np.ndarray, l: np.ndarray, w: np.ndarray,
                   p: np.ndarray):
    """Sum w per (d, l) pair carrying the (functionally dependent)
    companion column p — the refine gather's combine, where p is the
    phase-1 community of the message's refined-source label."""
    if len(d) == 0:
        return d, l, w, p
    if (d[0] >= 0 and d.min() >= 0 and d.max() < 2**31
            and l.min() >= 0 and l.max() < 2**31):
        key = (d.astype(np.uint64) << np.uint64(32)) | l.astype(np.uint64)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        first = np.empty(len(ks), dtype=bool)
        first[0] = True
        np.not_equal(ks[1:], ks[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        return ((ks[starts] >> np.uint64(32)).astype(np.int64),
                (ks[starts] & np.uint64(0xFFFFFFFF)).astype(np.int64),
                np.add.reduceat(w[order], starts),
                p[order][starts])
    order = np.lexsort((l, d))
    d, l, w, p = d[order], l[order], w[order], p[order]
    first = np.empty(len(d), dtype=bool)
    first[0] = True
    np.not_equal(d[1:], d[:-1], out=first[1:])
    first[1:] |= l[1:] != l[:-1]
    starts = np.flatnonzero(first)
    return d[starts], l[starts], np.add.reduceat(w, starts), p[starts]


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


def _sorted_lookup(keys: np.ndarray, vals: np.ndarray, q: np.ndarray,
                   default: np.ndarray) -> np.ndarray:
    """vals[k == q] for sorted unique keys; default where q is absent."""
    pos = np.searchsorted(keys, q)
    ok = (pos < len(keys)) & (keys[np.clip(pos, 0, len(keys) - 1)] == q)
    out = default.copy()
    out[ok] = vals[pos[ok]]
    return out


_EMPTY_SEG = (np.empty(0, np.int64), np.empty(0, np.int64),
              np.empty(0, np.float64))


@ray.remote(num_cpus=0)
class _CommunityActor:
    """One range partition of the multilevel community-detection state."""

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
        self.rcomm = np.empty(0, np.int64)   # Leiden refined labels
        self.orig_vertex = np.empty(0, np.int64)
        self.orig_comm = np.empty(0, np.int64)
        self.level = 1
        self._pend = None        # refine: tentative (positions, targets)
        self._staged_init = None  # Leiden: coarse (vertex, start community)

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

    # ---------- message plumbing ----------

    def _raw_edges(self):
        """Non-loop local out-edges as (src, dst, w) numpy triples (w=1
        when unweighted). Level 1 expands the CSR rows; coarse levels
        slice the local coo."""
        if len(self.vertex) == 0:
            return _EMPTY_SEG
        if self.level == 1:
            from igraph_ray.kernels import _scan_blocks
            srcs, dsts, ws = [], [], []
            for blk, sel, idx, lens in _scan_blocks(self.csr, self.vertex):
                srcs.append(np.repeat(self.vertex[sel], lens))
                dsts.append(blk["dst"][idx])
                ws.append(blk["weight"][idx] if self.weighted
                          else np.ones(len(idx)))
            if not srcs:
                return _EMPTY_SEG
            return (np.concatenate(srcs), np.concatenate(dsts),
                    np.concatenate(ws))
        src, dst, w = self.coo
        nl = src != dst
        if not nl.all():
            src, dst, w = src[nl], dst[nl], w[nl]
        return src, dst, w

    def _messages(self, labels: np.ndarray):
        """(dst, labels[src], w) combined per (dst, label), dst-sorted.
        Self-loops are excluded (they travel with the vertex and must not
        count as weight into the current community — louvain.py _pre),
        exactly like the loop-free level-1 CSR."""
        if len(self.vertex) == 0:
            return _EMPTY_SEG
        if self.level == 1:
            return label_weight_messages(self.csr, self.vertex, labels,
                                         self.weighted)
        src, dst, w = self._raw_edges()
        if len(src) == 0:
            return _EMPTY_SEG
        lab = labels[np.searchsorted(self.vertex, src)]
        return combine_label_weights(dst, lab, w)

    def _split(self, d, *cols):
        cuts = np.searchsorted(d, self.starts[1:])
        segs, lo = [], 0
        for hi in list(cuts) + [len(d)]:
            segs.append((d[lo:hi], *(c[lo:hi] for c in cols)))
            lo = hi
        return segs

    def _pack(self, segs):
        return [tuple(segs[g:g + self.gs]) for g in range(0, self.nb, self.gs)]

    def _vol_contrib(self, labels: np.ndarray):
        if len(self.vertex) == 0:
            return (np.empty(0, np.int64), np.empty(0, np.float64),
                    np.empty(0, np.int64))
        return _combine_sorted(labels, self.deg,
                               np.ones(len(labels), np.int64))

    def _out(self, info):
        d, l, w = self._messages(self.comm)
        return (*self._pack(self._split(d, l, w)),
                self._vol_contrib(self.comm), info)

    def bootstrap(self):
        return self._out({"moved": 0.0})

    @staticmethod
    def _gather_parts(segments, ncols=3):
        parts = [s for s in segments if len(s[0])]
        if not parts:
            return None
        return tuple(np.concatenate([p[c] for p in parts])
                     for c in range(ncols))

    @staticmethod
    def _merge_vols(vol_refs):
        vols = [v for v in ray.get(list(vol_refs)) if len(v[0])]
        return _combine_sorted(np.concatenate([v[0] for v in vols]),
                               np.concatenate([v[1] for v in vols]),
                               np.concatenate([v[2] for v in vols]))

    # ---------- Louvain / Leiden phase-1 sweep ----------

    def step(self, m2: float, vol_refs, activation_salt,
             idx_in_group: int, *groups):
        """Fused apply+gather: decide moves from the previous round's
        messages + volume table, update local labels, emit next round's
        messages and volume contribution."""
        t0 = time.perf_counter()
        segments = [grp[idx_in_group] for grp in groups]
        cat = self._gather_parts(segments)
        moved = 0
        if cat is not None and len(self.vertex):
            vc, vv, vn = self._merge_vols(vol_refs)
            v_arr, cand, kvc = combine_label_weights(*cat)
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

    # ---------- Leiden refinement (constrained singleton merges) ----------

    def _refine_out(self, info):
        """Refine-phase gather: messages carry (dst, rcomm(src), w,
        p1(src)); the receiver filters rows whose phase-1 label differs
        from its own — leiden.py _refine's intra-edge subset, expressed
        as a receiver-side filter instead of a distributed join."""
        src, dst, w = self._raw_edges()
        if len(src):
            pos = np.searchsorted(self.vertex, src)
            d, l, w4, p = _combine_pairs(dst, self.rcomm[pos], w,
                                         self.comm[pos])
        else:
            d = np.empty(0, np.int64)
            l = np.empty(0, np.int64)
            w4 = np.empty(0, np.float64)
            p = np.empty(0, np.int64)
        return (*self._pack(self._split(d, l, w4, p)),
                self._vol_contrib(self.rcomm), info)

    def refine_init(self):
        self.rcomm = self.vertex.copy()
        self._pend = None
        return self._refine_out({"moved": 0.0})

    def refine_choose(self, m2: float, vol_refs, idx_in_group: int,
                      *groups):
        """First half of a refine sweep: tentative constrained moves
        (singleton movers only) from the intra-filtered candidates;
        returns this partition's mover ids for the cancel_vacated
        allgather. Moves are staged locally until refine_commit."""
        segments = [grp[idx_in_group] for grp in groups]
        cat = self._gather_parts(segments, ncols=4)
        self._pend = None
        if cat is None or len(self.vertex) == 0:
            return np.empty(0, np.int64)
        d, l, w, p = cat
        keep = self.comm[np.searchsorted(self.vertex, d)] == p
        if not keep.any():
            return np.empty(0, np.int64)
        d, l, w, p = d[keep], l[keep], w[keep], p[keep]
        v_arr, cand, kvc, _ = _combine_pairs(d, l, w, p)
        vc, vv, vn = self._merge_vols(vol_refs)
        pos_v = np.searchsorted(self.vertex, v_arr)
        cur = self.rcomm[pos_v]
        deg = self.deg[pos_v]
        ci = np.searchsorted(vc, cand)
        oi = np.searchsorted(vc, cur)
        bv, new = choose_moves(
            v=v_arr, cand=cand, kv=kvc, volc=vv[ci], cur=cur, deg=deg,
            vol_own=vv[oi], csize_c=vn[ci], csize_own=vn[oi], m2=m2,
            singleton_movers=True, resolution=self.resolution)
        pos_b = np.searchsorted(self.vertex, bv)
        mover = new != self.rcomm[pos_b]
        self._pend = (pos_b[mover], new[mover])
        return bv[mover]

    def refine_commit(self, mover_refs):
        """Second half: drop staged moves whose target label was vacated
        by any mover this sweep (the connectivity guard — two strangers
        simultaneously attaching to a departing singleton would form a
        disconnected pair), apply the survivors, emit the next round."""
        moved = 0
        if self._pend is not None and len(self._pend[0]):
            movers = [m for m in ray.get(list(mover_refs)) if len(m)]
            pos_b, new = self._pend
            if movers:
                vac = np.sort(np.concatenate(movers))
                pv = np.searchsorted(vac, new)
                hit = (pv < len(vac)) & (vac[np.clip(pv, 0, len(vac) - 1)]
                                         == new)
                pos_b, new = pos_b[~hit], new[~hit]
            moved = len(pos_b)
            if moved:
                self.rcomm[pos_b] = new
        self._pend = None
        return self._refine_out({"moved": float(moved)})

    # ---------- level transitions ----------

    def compose_local(self, use_ref: bool = False):
        """Level-1 composition: the level map IS the local label array."""
        self.orig_comm = (self.rcomm if use_ref else self.comm).copy()
        return True

    def level_map(self, use_ref: bool = False):
        return (self.vertex, self.rcomm if use_ref else self.comm)

    def compose(self, map_refs) -> bool:
        """Fold an allgathered coarse level map (vertex -> label over the
        CURRENT level's universe) into the original-vertex labels."""
        maps = [m for m in ray.get(list(map_refs)) if len(m[0])]
        if not maps or len(self.orig_comm) == 0:
            return True
        keys = np.concatenate([m[0] for m in maps])
        vals = np.concatenate([m[1] for m in maps])
        order = np.argsort(keys)
        self.orig_comm = _sorted_lookup(keys[order], vals[order],
                                        self.orig_comm, self.orig_comm)
        return True

    def gather_labels(self, use_ref: bool = False):
        """One label-push round over the full local edge set (feeds
        contraction — Leiden contracts by the REFINED labels while the
        refine messages covered only the intra subset)."""
        d, l, w = self._messages(self.rcomm if use_ref else self.comm)
        packed = self._pack(self._split(d, l, w))
        return tuple(packed) if len(packed) > 1 else packed[0]

    def contract(self, use_ref: bool, idx_in_group: int, *groups):
        """Turn label messages into contracted coarse edges
        (lab(dst), lab(src), w), split by coarse-src range. Coarse-level
        self-loops re-enter as (c, c) (they carry the intra-community
        weight accumulated at earlier levels — louvain.py _coarsen
        keeps them)."""
        lab = self.rcomm if use_ref else self.comm
        segments = [grp[idx_in_group] for grp in groups]
        cat = self._gather_parts(segments)
        srcs, dsts, ws = [], [], []
        if cat is not None and len(self.vertex):
            d, l, w = cat
            srcs.append(lab[np.searchsorted(self.vertex, d)])
            dsts.append(l)
            ws.append(w)
        if self.level > 1 and self.coo is not None:
            s0, d0, w0 = self.coo
            lo = s0 == d0
            if lo.any():
                cs = lab[np.searchsorted(self.vertex, s0[lo])]
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

    def stage_init_pairs(self):
        """Leiden aggregation prep: (refined label, its phase-1 community)
        pairs routed to the refined label's home range. Every member of a
        refined community shares one phase-1 community (the constrained
        sweep never crosses it), so min is just 'the' value."""
        if len(self.vertex) == 0:
            pairs = (np.empty(0, np.int64), np.empty(0, np.int64))
        else:
            order = np.argsort(self.rcomm, kind="stable")
            r = self.rcomm[order]
            p = self.comm[order]
            first = np.empty(len(r), dtype=bool)
            first[0] = True
            np.not_equal(r[1:], r[:-1], out=first[1:])
            starts = np.flatnonzero(first)
            pairs = (r[starts], np.minimum.reduceat(p, starts))
        packed = self._pack(self._split(*pairs))
        return tuple(packed) if len(packed) > 1 else packed[0]

    def count_init(self, idx_in_group: int, *groups) -> int:
        """Receive the staged (refined label, phase-1) pairs homed here;
        return the local distinct-label count (summed by the driver into
        n_ref, the dataset engine's init.count() stopping test)."""
        segments = [grp[idx_in_group] for grp in groups]
        cat = self._gather_parts(segments, ncols=2)
        if cat is None:
            self._staged_init = (np.empty(0, np.int64),
                                 np.empty(0, np.int64))
            return 0
        r, p = cat
        order = np.argsort(r, kind="stable")
        r, p = r[order], p[order]
        first = np.empty(len(r), dtype=bool)
        first[0] = True
        np.not_equal(r[1:], r[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        self._staged_init = (r[starts], np.minimum.reduceat(p, starts))
        return len(starts)

    def reinit(self, use_staged_init: bool, idx_in_group: int,
               *groups) -> int:
        """Adopt the contracted graph as the next level: local coo =
        combined incoming coarse-edge segments; universe = its srcs; deg
        includes self-loops (they carry intra weight — matches
        _degrees(sym) on the coarse table). Labels start as singletons
        (Louvain) or as the staged phase-1 communities (Leiden's defining
        difference — Traag et al. 2019 aggregation)."""
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
        if use_staged_init and self._staged_init is not None:
            k, v = self._staged_init
            self.comm = _sorted_lookup(k, v, self.vertex, self.vertex)
        else:
            self.comm = self.vertex.copy()
        self._staged_init = None
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


class _Engine:
    """Driver-side wiring shared by the Louvain and Leiden loops."""

    def __init__(self, graph, num_partitions: Optional[int],
                 resolution: float = 1.0):
        from igraph_ray import aligned as al

        if num_partitions is None:
            from igraph_ray.context import num_cpus
            num_partitions = max(2, num_cpus())
        self.ok = False
        csr = graph.csr_index("sym", num_partitions,
                              weighted=graph.weighted)
        state = al.state_from_csr(csr, None)
        if not state.blocks:
            return
        self.nb = nb = len(state.blocks)
        self.gs = max(1, min(16, nb))
        self.ngroups = (nb + self.gs - 1) // self.gs
        self.nret = self.ngroups + 2
        csr_by_block = al._csr_for_blocks(csr.block_descriptors(),
                                          state.starts)
        starts_ref = ray.put(state.starts)
        self.actors = [
            _CommunityActor.remote(starts_ref, nb, self.gs, graph.weighted,
                                   resolution)
            for _ in range(nb)
        ]
        inits = ray.get([
            a.init_level1.remote(csr_by_block[i], state.blocks[i])
            for i, a in enumerate(self.actors)
        ])
        self.n_cur = sum(n for n, _ in inits)
        self.m2 = float(sum(d for _, d in inits))
        self.ok = self.m2 > 0.0
        if not self.ok:
            self.shutdown()

    def groups_for(self, j: int, source):
        g = j // self.gs
        return g, [source[i][g] for i in range(self.nb)]

    def fan(self, method_name: str, source, nret: Optional[int] = None,
            extra=()):
        """One P-way exchange round: call actor j's method with the
        segment groups addressed to j (plus leading extras)."""
        outs = []
        for j in range(self.nb):
            g, groups = self.groups_for(j, source)
            m = getattr(self.actors[j], method_name)
            if nret is not None and nret > 1:
                outs.append(list(m.options(num_returns=nret).remote(
                    *extra, j - g * self.gs, *groups)))
            else:
                outs.append(m.remote(*extra, j - g * self.gs, *groups))
        return outs

    def infos(self, prev):
        return ray.get([prev[i][self.ngroups + 1] for i in range(self.nb)])

    def vol_refs(self, prev):
        return [prev[i][self.ngroups] for i in range(self.nb)]

    def modularity(self, prev) -> float:
        """Q of the current labels on the current level's graph.
        Contraction preserves Q (the Louvain invariant), so this is the
        composed partition's plain modularity on the original graph:
        w_in from the last round's messages (+ coarse self-loops), vol²
        from the last volume contributions."""
        w_refs = self.fan("w_in_contrib", prev)
        vols = [v for v in ray.get(self.vol_refs(prev)) if len(v[0])]
        v2 = 0.0
        if vols:
            _, vv = _combine_sorted(np.concatenate([v[0] for v in vols]),
                                    np.concatenate([v[1] for v in vols]))
            v2 = float((vv * vv).sum())
        return (float(sum(ray.get(w_refs))) / self.m2
                - v2 / (self.m2 * self.m2))

    def compose_level(self, level: int, use_ref: bool):
        if level == 1:
            ray.get([a.compose_local.remote(use_ref) for a in self.actors])
        else:
            maps = [a.level_map.remote(use_ref) for a in self.actors]
            ray.get([a.compose.remote(maps) for a in self.actors])

    def contract_level(self, prev, use_ref: bool,
                       use_staged_init: bool) -> int:
        """Contract on final labels and re-seed the actors with the
        coarse graph. ``prev`` must hold FULL-edge label messages
        reflecting the final labels (Louvain's last sweep output, or a
        fresh gather_labels round for Leiden)."""
        cons = self.fan("contract", prev, nret=self.ngroups,
                        extra=(use_ref,))
        if self.ngroups == 1:
            cons = [[c] for c in cons]
        ns = self.fan("reinit", cons, extra=(use_staged_init,))
        self.n_cur = int(sum(ray.get(ns)))
        return self.n_cur

    def finalize(self):
        """Canonical renumber (dense rank of min-vertex per community,
        the community.c:2323-2342 densification) and the output table."""
        contribs = ray.get([a.min_vertex_contrib.remote()
                            for a in self.actors])
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
        tables = [a.final_table.remote(rk_ref, rv_ref)
                  for a in self.actors]
        final = ray.data.from_arrow_refs(tables).materialize()
        self.shutdown()
        return final

    def shutdown(self):
        for a in getattr(self, "actors", []):
            ray.kill(a)


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
    eng = _Engine(graph, num_partitions, resolution)
    if not eng.ok:
        from igraph_ray.algorithms.louvain import louvain as _ds_louvain
        return _ds_louvain(graph, num_partitions=num_partitions or 8,
                           max_sweeps=max_sweeps, max_levels=max_levels,
                           resolution=resolution, mode="dataset")

    prev = [list(a.bootstrap.options(num_returns=eng.nret).remote())
            for a in eng.actors]
    total_sweeps = 0
    level = 0
    q = float("nan")
    while level < max_levels:
        level += 1
        n_before = eng.n_cur
        moved_any = False
        for _ in range(max_sweeps):
            prev = eng.fan("step", prev, nret=eng.nret,
                           extra=(eng.m2, eng.vol_refs(prev), None))
            moved = int(sum(i["moved"] for i in eng.infos(prev)))
            total_sweeps += 1
            if moved <= max(0, int(0.005 * n_before)):
                moved_any = moved_any or moved > 0
                break
            moved_any = True
        # fold this level's labels into the original-vertex mapping, and
        # take Q now — prev's segments address THIS level's universe, so
        # it must be measured before the actors adopt the coarse graph
        eng.compose_level(level, use_ref=False)
        q = eng.modularity(prev)
        if not moved_any:
            break
        if eng.contract_level(prev, use_ref=False,
                              use_staged_init=False) >= n_before:
            break
        prev = [list(a.bootstrap.options(num_returns=eng.nret).remote())
                for a in eng.actors]

    final = eng.finalize()
    return LouvainResult(state=final, modularity=q, levels=level,
                         sweeps=total_sweeps)


def leiden_aligned(
    graph,
    num_partitions: Optional[int] = None,
    max_sweeps: int = 8,
    max_refine_sweeps: int = 8,
    max_levels: int = 10,
):
    """Leiden on the actor-aligned engine — the leiden.py:leiden level
    loop (salted/full phase-1 activation schedule, constrained
    refinement with singleton movers + cancel_vacated, aggregation by
    the refined partition with phase-1 starts) executed as actor
    exchange rounds. One deliberate deviation: when max_levels stops the
    loop, the dataset engine still runs a final refinement whose result
    is discarded; this engine skips it (identical labels/Q; reported
    sweep counts differ only in that clipped case)."""
    from igraph_ray.algorithms.leiden import LeidenResult
    from igraph_ray.algorithms.leiden import leiden as _ds_leiden

    eng = _Engine(graph, num_partitions)
    if not eng.ok:
        return _ds_leiden(graph, num_partitions=num_partitions or 8,
                          max_sweeps=max_sweeps,
                          max_refine_sweeps=max_refine_sweeps,
                          max_levels=max_levels, mode="dataset")

    prev = [list(a.bootstrap.options(num_returns=eng.nret).remote())
            for a in eng.actors]
    total_sweeps = 0
    level = 0
    q = float("nan")
    while level < max_levels:
        level += 1
        n_before = eng.n_cur
        # phase 1: level 1 keeps Louvain's trickle threshold; coarse
        # levels run to strict convergence with salted half-activation
        # after two full sweeps (leiden.py's oscillation damper)
        thresh = max(0, int(0.005 * n_before)) if level == 1 else 0
        cap = 3 * max_sweeps
        full = True
        moved_any = False
        for i in range(cap):
            salt = None if full else (level << 20) + i
            prev = eng.fan("step", prev, nret=eng.nret,
                           extra=(eng.m2, eng.vol_refs(prev), salt))
            moved = int(sum(x["moved"] for x in eng.infos(prev)))
            total_sweeps += 1
            moved_any = moved_any or moved > 0
            if full:
                if moved <= thresh:
                    break
                if i >= 1:
                    full = False
            elif moved <= thresh:
                full = True
        q = eng.modularity(prev)
        if not moved_any and level > 1:
            break
        if level >= max_levels:
            break  # the dataset engine's final refine is discarded work
        # phase 2: constrained refinement (two actor rounds per sweep —
        # choose stages tentative moves and publishes mover ids, commit
        # applies the cancel_vacated-filtered survivors)
        prev_r = [list(a.refine_init.options(num_returns=eng.nret).remote())
                  for a in eng.actors]
        for _ in range(max_refine_sweeps):
            movers = eng.fan("refine_choose", prev_r,
                             extra=(eng.m2, eng.vol_refs(prev_r)))
            prev_r = [list(a.refine_commit.options(
                num_returns=eng.nret).remote(movers)) for a in eng.actors]
            moved = int(sum(x["moved"] for x in eng.infos(prev_r)))
            total_sweeps += 1
            if moved == 0:
                break
        # aggregation test BEFORE composing: the dataset engine snapshots
        # mapping pre-refine and stops on n_ref >= n_before with the
        # phase-1 labels — orig_comm must not absorb this refine then
        pair_out = [a.stage_init_pairs.options(
            num_returns=eng.ngroups).remote() if eng.ngroups > 1
            else [a.stage_init_pairs.remote()] for a in eng.actors]
        pair_out = [list(p) if not isinstance(p, list) else p
                    for p in pair_out]
        counts = eng.fan("count_init", pair_out)
        n_ref = int(sum(ray.get(counts)))
        if n_ref >= n_before:
            break
        eng.compose_level(level, use_ref=True)
        # contract by the refined labels over the FULL edge set (the
        # refine messages covered only the intra subset)
        fulls = [a.gather_labels.options(
            num_returns=eng.ngroups).remote(True) if eng.ngroups > 1
            else [a.gather_labels.remote(True)] for a in eng.actors]
        fulls = [list(f) if not isinstance(f, list) else f for f in fulls]
        eng.contract_level(fulls, use_ref=True, use_staged_init=True)
        prev = [list(a.bootstrap.options(num_returns=eng.nret).remote())
                for a in eng.actors]

    # final flat labels = this level's phase-1 map applied to the
    # refined-label composition of the previous levels
    eng.compose_level(level, use_ref=False)
    final = eng.finalize()
    return LeidenResult(state=final, modularity=q, levels=level,
                        sweeps=total_sweeps)
