"""Spectral centralities: eigenvector centrality and HITS hub/authority
scores, as aligned superstep power iterations.

Reference semantics:

- ``igraph_eigenvector_centrality`` (/root/reference/src/centrality.c:
  308-520): principal eigenvector of the (weighted) adjacency matrix,
  scores scaled so the maximum is 1. igraph solves it with ARPACK; the
  distributed equivalent here is explicit power iteration — for the
  driver-oracle contract the recurrence itself (fixed iteration count,
  sum-normalized each step) is what both sides compute, making the
  comparison exact rather than tolerance-based. Directed graphs use
  in-edges (the left eigenvector: score flows along edge direction),
  matching igraph's directed mode. Loop edges are excluded (the "out" CSR
  variant's loop rule, as for PageRank) and multi-edges contribute with
  multiplicity.
- ``igraph_hub_score`` / ``igraph_authority_score``
  (/root/reference/src/centrality.c:560-720): principal eigenvectors of
  A·Aᵀ / Aᵀ·A (Kleinberg's HITS). Here one HITS round is two half-steps:
  authority a ← Aᵀh over the "out" CSR (messages flow src→dst), then hub
  h ← A·a over the "rev" CSR (flipped edges), each sum-normalized; final
  scores max-normalized to 1 like igraph.

State is kept *raw* (un-normalized) block-to-block; the gather divides by
the global sum carried in the scalars dict, so no extra normalization
superstep is needed. Power iteration on a DAG collapses to the zero
vector (principal eigenvalue 0) — the loop detects a zero total and
returns all-zero scores, the degenerate-eigenproblem answer.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray import aligned as al
from igraph_ray.graph import Graph
from igraph_ray.kernels import pagerank_messages_csc
from igraph_ray.superstep import SuperstepResult

EV_STATE_COLUMNS = ["vertex", "x", "xn_prev"]
HITS_STATE_COLUMNS = ["vertex", "h", "a"]


def _universe_state(graph: Graph, csr, init_fn):
    if graph._explicit_n:
        return al.state_from_csr(csr, graph.num_vertices(), init_fn=init_fn)
    return al.state_from_dataset(
        graph.vertices(), [int(b) for b in csr.boundaries], init_fn=init_fn
    )


@ray.remote
def _block_max(block: dict, col: str) -> float:
    v = block[col]
    return float(v.max()) if len(v) else float("-inf")


@ray.remote
def _block_div_max(block: dict, col: str, divisor: float) -> float:
    v = block[col]
    return float((v / divisor).max()) if len(v) else float("-inf")


def _max_normalized(state: al.AlignedState, cols, out_names, divisors=None) -> ray.data.Dataset:
    """Scale each column so its global max is 1 (igraph's scale=True),
    emitted as a Dataset (vertex, *out_names). ``divisors`` applies a
    per-column division FIRST (the running sum-normalizer), with the same
    op order as the SQL oracle (r/S, then /max) so the float results are
    bit-compatible."""
    divisors = divisors or {}
    maxes = {}
    for c in cols:
        d = divisors.get(c, 1.0)
        m = max(ray.get([_block_div_max.remote(b, c, d) for b in state.blocks]))
        maxes[c] = m if np.isfinite(m) and m > 0 else 0.0

    @ray.remote
    def _scale(block: dict) -> pa.Table:
        data = {"vertex": pa.array(block["vertex"], pa.int64())}
        for c, o in zip(cols, out_names):
            v = block[c] / divisors.get(c, 1.0)
            data[o] = pa.array(v / maxes[c] if maxes[c] > 0 else np.zeros_like(v),
                               pa.float64())
        return pa.table(data)

    scaled = al.AlignedState(
        blocks=[_scale.remote(b) for b in state.blocks], starts=state.starts
    )
    import ray.data as rd

    return rd.from_arrow_refs(list(scaled.blocks))


def eigenvector_centrality(
    graph: Graph,
    fixed_iterations: Optional[int] = None,
    tol: float = 1e-10,
    max_iter: int = 200,
    num_partitions: Optional[int] = None,
    engine: str = "tasks",
) -> SuperstepResult:
    """Returns SuperstepResult whose state has (vertex, ev) with
    max(ev) = 1 (or all-zero for the degenerate DAG case).

    Recurrence (mirrored by the SQL oracle): x₀ = 1/n; x_{k+1} =
    (Aᵀ x_k) / Σ(Aᵀ x_k); final scores x_K / max(x_K). Convergence in
    tol mode is on the (one-step-lagged) L1 residual of the normalized
    vector."""
    n = graph.num_vertices()
    if n == 0:
        empty = pa.table({"vertex": pa.array([], pa.int64()),
                          "ev": pa.array([], pa.float64())})
        return SuperstepResult(state=ray.data.from_arrow(empty), iterations=0,
                               scalars={}, converged=True)
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    weighted = graph.weighted
    csr = graph.csr_index("out", num_partitions, weighted=weighted)
    blocks = csr.block_descriptors()

    def _init(sd: dict) -> dict:
        m = len(sd["vertex"])
        return {"vertex": sd["vertex"], "x": np.ones(m),
                "xn_prev": np.zeros(m)}

    state = _universe_state(graph, csr, _init)

    if fixed_iterations is not None:
        def converged(scalars, it):
            return scalars.get("dead", 0.0) > 0 or it + 1 >= fixed_iterations
        iters = fixed_iterations
        check_every = 1  # dead-total detection needs the scalar
    else:
        def converged(scalars, it):
            return (scalars.get("dead", 0.0) > 0
                    or scalars.get("absdiff", 1.0) < tol)
        iters = max_iter
        check_every = 1

    ones = None

    def gather_fn(sb, csr_desc, starts, scalars):
        total = scalars.get("total", 1.0)
        xhat = sb["x"] / total if total > 0 else np.zeros_like(sb["x"])
        deg1 = np.ones(len(xhat))
        pairs = pagerank_messages_csc(csr_desc, sb["vertex"], xhat, deg1, weighted)
        nb = len(starts)
        segs = [[] for _ in range(nb)]
        msg_count = 0
        for (dsts, partial) in pairs:
            msg_count += len(dsts)
            bounds = np.searchsorted(dsts, starts[1:])
            lo = 0
            for r, hi in enumerate(list(bounds) + [len(dsts)]):
                if hi > lo:
                    segs[r].append((dsts[lo:hi], partial[lo:hi]))
                lo = hi
        return [tuple(s) for s in segs], msg_count

    def apply_fn(old, segments, scalars):
        vertex = old["vertex"]
        acc = np.zeros(len(vertex))
        for pairs in segments:
            for (sd, sp) in pairs:
                if not len(sd):
                    continue
                pos = np.searchsorted(vertex, sd)
                np.add.at(acc, pos, sp)
        total = scalars.get("total", 1.0)
        xn_old = old["x"] / total if total > 0 else np.zeros(len(vertex))
        absdiff = float(np.abs(xn_old - old["xn_prev"]).sum())
        return (
            {"vertex": vertex, "x": acc, "xn_prev": xn_old},
            {"total": float(acc.sum()), "absdiff": absdiff},
        )

    def make_scalars(summed, it):
        tot = summed.get("total", 0.0)
        return {
            "total": tot if tot > 0 else 1.0,
            "absdiff": summed.get("absdiff", 1.0),
            "dead": 0.0 if tot > 0 else 1.0,
        }

    res = al.run_aligned_loop(
        state=state,
        csr_descriptors=blocks,
        gather_fn=gather_fn,
        apply_fn=apply_fn,
        scalars={"total": float(n), "absdiff": 1.0, "dead": 0.0},
        make_scalars=make_scalars,
        converged=converged,
        max_iter=iters,
        state_columns=EV_STATE_COLUMNS,
        check_every=check_every,
        engine=engine,
    )

    if res.scalars.get("dead", 0.0) > 0:
        @ray.remote
        def _zero(block: dict) -> pa.Table:
            return pa.table({"vertex": pa.array(block["vertex"], pa.int64()),
                             "ev": pa.array(np.zeros(len(block["vertex"])),
                                            pa.float64())})
        import ray.data as rd
        zeroed = [_zero.remote(b) for b in res.aligned_state.blocks]
        res.state = rd.from_arrow_refs(zeroed)
        return res

    res.state = _max_normalized(
        res.aligned_state, ["x"], ["ev"],
        divisors={"x": res.scalars.get("total", 1.0)},
    )
    return res


def hits(
    graph: Graph,
    iterations: int = 30,
    num_partitions: Optional[int] = None,
    engine: str = "tasks",
) -> SuperstepResult:
    """Kleinberg HITS: SuperstepResult whose state has
    (vertex, hub, authority), each max-normalized to 1
    (centrality.c:560-720 semantics via fixed-count power iteration;
    see module docstring for the exact recurrence the oracle mirrors)."""
    n = graph.num_vertices()
    if n == 0:
        empty = pa.table({"vertex": pa.array([], pa.int64()),
                          "hub": pa.array([], pa.float64()),
                          "authority": pa.array([], pa.float64())})
        return SuperstepResult(state=ray.data.from_arrow(empty), iterations=0,
                               scalars={}, converged=True)
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    weighted = graph.weighted
    csr_out = graph.csr_index("out", num_partitions, weighted=weighted)
    csr_rev = graph.csr_index("rev", num_partitions, weighted=weighted)
    out_blocks = csr_out.block_descriptors()
    rev_blocks = csr_rev.block_descriptors()

    def _init(sd: dict) -> dict:
        m = len(sd["vertex"])
        return {"vertex": sd["vertex"], "h": np.ones(m), "a": np.zeros(m)}

    state = _universe_state(graph, csr_out, _init)

    def _make_half(src_col: str, dst_col: str):
        """One half-step: gather sends state[src_col]/total along the
        pass's CSR; apply overwrites state[dst_col] with the raw sums."""

        def gather_fn(sb, csr_desc, starts, scalars):
            total = scalars.get("total", 1.0)
            xhat = sb[src_col] / total if total > 0 else np.zeros_like(sb[src_col])
            deg1 = np.ones(len(xhat))
            pairs = pagerank_messages_csc(csr_desc, sb["vertex"], xhat, deg1, weighted)
            nb = len(starts)
            segs = [[] for _ in range(nb)]
            msg_count = 0
            for (dsts, partial) in pairs:
                msg_count += len(dsts)
                bounds = np.searchsorted(dsts, starts[1:])
                lo = 0
                for r, hi in enumerate(list(bounds) + [len(dsts)]):
                    if hi > lo:
                        segs[r].append((dsts[lo:hi], partial[lo:hi]))
                    lo = hi
            return [tuple(s) for s in segs], msg_count

        def apply_fn(old, segments, scalars):
            vertex = old["vertex"]
            acc = np.zeros(len(vertex))
            for pairs in segments:
                for (sd, sp) in pairs:
                    if not len(sd):
                        continue
                    pos = np.searchsorted(vertex, sd)
                    np.add.at(acc, pos, sp)
            new = dict(old)
            new[dst_col] = acc
            return new, {"new_total": float(acc.sum())}

        return gather_fn, apply_fn

    total_iters = 0
    # totals: normalizer applied to the SENDING column of each half-step
    h_total = float(n)  # h₀ = 1 raw per vertex → ĥ = 1/n
    a_total = 1.0
    dead = False
    for _ in range(iterations):
        for (pass_blocks, src_col, dst_col, total) in (
            (out_blocks, "h", "a", h_total),   # a ← Aᵀ ĥ
            (rev_blocks, "a", "h", None),      # h ← A â  (total set below)
        ):
            if total is None:
                total = a_total
            gather_fn, apply_fn = _make_half(src_col, dst_col)
            res = al.run_aligned_loop(
                state=state,
                csr_descriptors=pass_blocks,
                gather_fn=gather_fn,
                apply_fn=apply_fn,
                scalars={"total": total},
                make_scalars=lambda s, it: {"total": total,
                                            "new_total": s.get("new_total", 0.0)},
                converged=lambda s, it: True,  # exactly one superstep
                max_iter=1,
                state_columns=HITS_STATE_COLUMNS,
                engine=engine,
            )
            total_iters += res.iterations
            state = res.aligned_state
            new_total = res.scalars.get("new_total", 0.0)
            if new_total <= 0:
                dead = True
                break
            if dst_col == "a":
                a_total = new_total
            else:
                h_total = new_total
        if dead:
            break

    if dead:
        @ray.remote
        def _zero(block: dict) -> pa.Table:
            m = len(block["vertex"])
            z = pa.array(np.zeros(m), pa.float64())
            return pa.table({"vertex": pa.array(block["vertex"], pa.int64()),
                             "hub": z, "authority": z})
        import ray.data as rd
        out = rd.from_arrow_refs([_zero.remote(b) for b in state.blocks])
        return SuperstepResult(state=out, iterations=total_iters,
                               scalars={"dead": 1.0}, converged=True)

    out = _max_normalized(state, ["h", "a"], ["hub", "authority"],
                          divisors={"h": h_total, "a": a_total})
    return SuperstepResult(
        state=out, iterations=total_iters,
        scalars={"h_total": h_total, "a_total": a_total}, converged=True,
    )
