"""HyperANF-style neighborhood sketches: per-vertex HyperLogLog
registers over the out-reachability ball, computed by max-merge
supersteps (Boldi–Vigna HyperANF / Palmer et al. ANF — the estimator a
web-scale engine runs instead of exact all-pairs distances; the
reference's exact counterparts are igraph_path_length_hist /
igraph_subcomponent).

Register definition (deterministic, SQL-replayable):
  h(u)      = md5(str(u)) hex
  bucket(u) = int(h[0], 16) % m          (m = 8 registers)
  rho(u)    = 1 + leading zero bits of the 16-bit integer int(h[1:5], 16)
              (17 when the whole 16-bit word is zero)

Register b of vertex v after convergence = max rho(u) over every u in
v's closed out-reachability ball with bucket(u) = b — max is idempotent
and associative, so the converged state depends only on the reachable
SET (not the propagation schedule), which is what makes the SQL oracle
a plain recursive-reachability CTE + grouped maxes rather than a
round-by-round replay. Supersteps: v max-merges the registers of its
out-neighbors (messages flow over the REV index); converges in
diameter rounds. The Flajolet HLL estimate of |ball(v)| is
alpha_m·m²/Σ_b 2^{-r_b} — derivable from the emitted registers.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np

from igraph_ray import aligned as al
from igraph_ray.graph import Graph
from igraph_ray.kernels import _scan_blocks
from igraph_ray.superstep import SuperstepResult

M = 8
_RCOLS = [f"r{b}" for b in range(M)]

STATE_COLUMNS = ["vertex"] + _RCOLS


def _init_registers(verts: np.ndarray) -> np.ndarray:
    """(len(verts), M) int64 initial registers: own bucket set to rho."""
    regs = np.zeros((len(verts), M), np.int64)
    for i, v in enumerate(verts):
        h = hashlib.md5(str(int(v)).encode()).hexdigest()
        b = int(h[0], 16) % M
        x = int(h[1:5], 16)
        rho = 17 if x == 0 else 16 - x.bit_length() + 1
        regs[i, b] = rho
    return regs


def neighborhood_sketches(
    graph: Graph,
    num_partitions: Optional[int] = None,
    max_iter: int = 256,
) -> SuperstepResult:
    """Returns SuperstepResult with state (vertex, r0..r7) — converged
    HLL registers of each vertex's closed out-reachability ball."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    # messages must flow w -> v for original edges (v, w): use the rev index
    csr = graph.csr_index("rev", num_partitions, weighted=False)
    blocks = csr.block_descriptors()
    boundaries = csr.boundaries

    def _init(sd: dict) -> dict:
        v = sd["vertex"]
        regs = _init_registers(v)
        out = {"vertex": v}
        for b in range(M):
            out[_RCOLS[b]] = regs[:, b]
        return out

    if graph._explicit_n:
        state = al.state_from_csr(csr, graph.num_vertices(), init_fn=_init)
    else:
        state = al.state_from_dataset(graph.vertices(), boundaries,
                                      init_fn=_init)

    def gather_fn(sb, csr_desc, starts, scalars):
        verts = sb["vertex"]
        regs = np.stack([sb[c] for c in _RCOLS], axis=1)
        out_d, out_r = [], []
        for blk, sel, idx, lens in _scan_blocks(csr_desc, verts):
            out_d.append(blk["dst"][idx])
            out_r.append(np.repeat(regs[sel], lens, axis=0))
        if not out_d:
            empty = (np.empty(0, np.int64), np.empty((0, M), np.int64))
            return [empty for _ in starts], 0
        d = np.concatenate(out_d)
        r = np.concatenate(out_r, axis=0)
        # pre-combine per dst: register-wise max
        order = np.argsort(d, kind="stable")
        d, r = d[order], r[order]
        grp = np.empty(len(d), bool)
        grp[0] = True
        np.not_equal(d[1:], d[:-1], out=grp[1:])
        starts_ = np.flatnonzero(grp)
        d = d[starts_]
        r = np.maximum.reduceat(r, starts_, axis=0)
        bounds = np.searchsorted(d, starts[1:])
        segs, lo = [], 0
        for hi in list(bounds) + [len(d)]:
            segs.append((d[lo:hi], r[lo:hi]))
            lo = hi
        return segs, int(len(d))

    def apply_fn(old, segments, scalars):
        vertex = old["vertex"]
        regs = np.stack([old[c] for c in _RCOLS], axis=1)
        new = regs.copy()
        parts = [s for s in segments if len(s[0])]
        if parts:
            d = np.concatenate([s[0] for s in parts])
            r = np.concatenate([s[1] for s in parts], axis=0)
            pos = np.searchsorted(vertex, d)
            np.maximum.at(new, (pos[:, None], np.arange(M)[None, :]), r)
        changed = float((new > regs).sum())
        out = {"vertex": vertex}
        for b in range(M):
            out[_RCOLS[b]] = new[:, b]
        return out, {"changed": changed}

    return al.run_aligned_loop(
        state=state,
        csr_descriptors=blocks,
        gather_fn=gather_fn,
        apply_fn=apply_fn,
        scalars={"changed": 1.0},
        make_scalars=lambda s, it: {"changed": s.get("changed", 0.0)},
        converged=lambda s, it: s.get("changed", 1.0) == 0.0,
        max_iter=max_iter,
        state_columns=STATE_COLUMNS,
    )
