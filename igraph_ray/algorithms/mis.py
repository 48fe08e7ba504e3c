"""Maximal independent set via deterministic Luby rounds.

Reference context: igraph enumerates ALL maximal independent vertex
sets (igraph_maximal_independent_vertex_sets / independence_number,
/root/reference/src/cliques.c via complement cliques) — exponential
output, inherently centralized. The distributed engine instead computes
ONE canonical maximal independent set with Luby's classic parallel
algorithm under deterministic priorities, so the result is a pure
function of the input (documented deviation; the SQL oracle replays the
identical rounds and the pytest checks independence + maximality —
exactly the two properties "a maximal independent set" promises).

Round rule over the simple undirected view: an undecided vertex enters
the set iff its priority is strictly smaller than every undecided
neighbor's (distinct priorities make simultaneous adjacent entries
impossible); undecided neighbors of set members become excluded the
following round; converged when nothing is undecided. Random priorities
give O(log n) rounds with high probability.

Priorities: the first 15 hex chars of md5(str(vertex)) parsed as int64
— fixed-length lowercase hex sorts identically as a string, so the
numpy int64 comparison here and the SQL string comparison in the oracle
induce the same order (the stratified_sample md5-prefix trick).

status encoding: 0 = undecided, 1 = in the set, 2 = excluded.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np

from igraph_ray import aligned as al
from igraph_ray.graph import Graph
from igraph_ray.kernels import _scan_blocks
from igraph_ray.superstep import SuperstepResult

_BIG = np.int64(2**62)

STATE_COLUMNS = ["vertex", "status", "prio"]


def _prio_of(verts: np.ndarray) -> np.ndarray:
    return np.array(
        [int(hashlib.md5(str(int(v)).encode()).hexdigest()[:15], 16)
         for v in verts],
        dtype=np.int64,
    )


def maximal_independent_set(
    graph: Graph,
    num_partitions: Optional[int] = None,
    max_iter: int = 64,
) -> SuperstepResult:
    """Returns SuperstepResult whose state is (vertex, status, prio);
    the MIS is the status == 1 subset."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    csr = graph.csr_index("sym", num_partitions, weighted=False)
    blocks = csr.block_descriptors()
    boundaries = csr.boundaries

    def _init(sd: dict) -> dict:
        v = sd["vertex"]
        return {"vertex": v,
                "status": np.zeros(len(v), np.int64),
                "prio": _prio_of(v)}

    if graph._explicit_n:
        state = al.state_from_csr(csr, graph.num_vertices(), init_fn=_init)
    else:
        state = al.state_from_dataset(graph.vertices(), boundaries,
                                      init_fn=_init)

    def gather_fn(sb, csr_desc, starts, scalars):
        verts = sb["vertex"]
        status = sb["status"]
        prio = sb["prio"]
        out_d, out_p, out_f = [], [], []
        und = status == 0
        for blk, sel, idx, lens in _scan_blocks(csr_desc, verts, und):
            out_d.append(blk["dst"][idx])
            out_p.append(np.repeat(prio[sel], lens))
            out_f.append(np.zeros(len(idx), np.int64))
        inm = status == 1
        for blk, sel, idx, lens in _scan_blocks(csr_desc, verts, inm):
            out_d.append(blk["dst"][idx])
            out_p.append(np.full(len(idx), _BIG))
            out_f.append(np.ones(len(idx), np.int64))
        if not out_d:
            empty = (np.empty(0, np.int64),) * 3
            return [empty for _ in starts], 0
        d = np.concatenate(out_d)
        p = np.concatenate(out_p)
        f = np.concatenate(out_f)
        # pre-combine per dst: min priority of undecided nbrs, any-IN flag
        order = np.argsort(d, kind="stable")
        d, p, f = d[order], p[order], f[order]
        grp = np.empty(len(d), bool)
        grp[0] = True
        np.not_equal(d[1:], d[:-1], out=grp[1:])
        s = np.flatnonzero(grp)
        d = d[s]
        p = np.minimum.reduceat(p, s)
        f = np.maximum.reduceat(f, s)
        bounds = np.searchsorted(d, starts[1:])
        segs, lo = [], 0
        for hi in list(bounds) + [len(d)]:
            segs.append((d[lo:hi], p[lo:hi], f[lo:hi]))
            lo = hi
        return segs, int(len(d))

    def apply_fn(old, segments, scalars):
        vertex = old["vertex"]
        status = old["status"].copy()
        prio = old["prio"]
        minp = np.full(len(vertex), _BIG)
        flag = np.zeros(len(vertex), np.int64)
        parts = [s for s in segments if len(s[0])]
        if parts:
            d = np.concatenate([s[0] for s in parts])
            p = np.concatenate([s[1] for s in parts])
            f = np.concatenate([s[2] for s in parts])
            order = np.argsort(d, kind="stable")
            d, p, f = d[order], p[order], f[order]
            grp = np.empty(len(d), bool)
            grp[0] = True
            np.not_equal(d[1:], d[:-1], out=grp[1:])
            s = np.flatnonzero(grp)
            pos = np.searchsorted(vertex, d[s])
            minp[pos] = np.minimum.reduceat(p, s)
            flag[pos] = np.maximum.reduceat(f, s)
        und = status == 0
        out_m = und & (flag == 1)
        in_m = und & ~out_m & (prio < minp)
        status[out_m] = 2
        status[in_m] = 1
        return (
            {"vertex": vertex, "status": status, "prio": prio},
            {"undecided": float((status == 0).sum())},
        )

    def make_scalars(summed, it):
        return {"undecided": summed.get("undecided", 0.0)}

    def converged(scalars, it):
        return scalars.get("undecided", 1.0) == 0.0

    return al.run_aligned_loop(
        state=state,
        csr_descriptors=blocks,
        gather_fn=gather_fn,
        apply_fn=apply_fn,
        scalars={"undecided": 1.0},
        make_scalars=make_scalars,
        converged=converged,
        max_iter=max_iter,
        state_columns=STATE_COLUMNS,
    )
