"""Power-iteration PageRank with the reference's ARPACK-kernel semantics.

Semantics pinned to igraph (SURVEY.md §2.2):
- damping default 0.85 (interfaces/functions.def:530-538);
- out-degrees computed with loops excluded (centrality.c:1414-1417); loop
  edges carry no message; multi-edges contribute with multiplicity;
- dangling vertices (outdeg==0 after the loop rule) contribute their entire
  mass to teleport: new[i] = d * Σ_{j→i} pr[j]/outdeg[j]
  + ((1-d) + d*dangling_mass)/n  (centrality.c:926-970);
- weighted variant: per-edge contribution pr[src]*w/strength[src], negative
  weights clamped to 0 (centrality.c:1447-1462);
- the iteration preserves Σpr = 1; the final vector is sum-normalized to
  absorb float drift (centrality.c:1490-1513);
- convergence on L1 residual (power option `eps`,
  structural_properties.c:1433; PRPACK fixed 1e-10, prpack.cpp:68).

Two execution modes over the same kernels (kernels.py):
- mode="aligned" (default): partition-aligned P×P exchange (aligned.py) —
  the performance path;
- mode="dataset": the literal map_batches → groupby('dst').sum() →
  map_batches Ray Data loop (superstep.py) — the didactic/verification
  path, cross-checked equal in tests.
"""

from __future__ import annotations

import time
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray import aligned as al
from igraph_ray.csr import build_csr_index
from igraph_ray.graph import Graph, _degrees_over
from igraph_ray.kernels import pagerank_messages, pagerank_messages_csc
from igraph_ray.superstep import (
    CheckpointConfig,
    SuperstepResult,
    record_task_metrics,
    run_loop,
)

STATE_COLUMNS = ["vertex", "pr", "deg", "absdiff", "dangling_pr"]
ALIGNED_STATE_COLUMNS = ["vertex", "pr", "deg", "reset"]


def pagerank(
    graph: Graph,
    damping: float = 0.85,
    tol: float = 1e-9,
    max_iter: int = 200,
    num_partitions: Optional[int] = None,
    fixed_iterations: Optional[int] = None,
    checkpoint: Optional[CheckpointConfig] = None,
    normalize: bool = True,
    metrics_dir: Optional[str] = None,
    gather_batch_size: int = 262144,
    mode: str = "aligned",
    reset=None,
    engine: str = "tasks",
) -> SuperstepResult:
    """Returns SuperstepResult whose state has columns (vertex, pr).

    ``reset``: optional personalization vector (igraph's personalized
    pagerank, centrality.c:1284-1316): a numpy array of length n (indexed
    by vertex id), normalized internally to sum 1. None = uniform 1/n.
    Both modes implement personalization (teleport and dangling mass land
    on the reset distribution).
    """
    n = graph.num_vertices()
    if n == 0:
        empty = pa.table({"vertex": pa.array([], pa.int64()), "pr": pa.array([], pa.float64())})
        return SuperstepResult(state=ray.data.from_arrow(empty), iterations=0, scalars={}, converged=True)

    weighted = graph.weighted
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    csr = graph.csr_index("out", num_partitions, weighted=weighted)
    blocks = csr.block_descriptors()
    boundaries = csr.boundaries

    def make_deg():
        edges = graph.without_loops()
        if weighted:
            def _clamp(b: pa.Table) -> pa.Table:
                w = pc.max_element_wise(pc.cast(b["weight"], pa.float64()), 0.0)
                return pa.table({"src": b["src"], "dst": b["dst"], "weight": w})
            edges = edges.map_batches(_clamp, batch_format="pyarrow", batch_size=None)
        return _degrees_over(edges, "src", graph.vertices(), weighted)

    inv_n = 1.0 / n
    d = float(damping)

    if fixed_iterations is not None:
        def converged(scalars: dict, it: int) -> bool:
            return it + 1 >= fixed_iterations
        iters = fixed_iterations
        check_every = 0  # no convergence test: stream all supersteps
    else:
        def converged(scalars: dict, it: int) -> bool:
            return scalars.get("absdiff", 1.0) < tol
        iters = max_iter
        check_every = 1

    if mode == "aligned":
        result = _aligned_impl(
            graph, csr, make_deg, blocks, boundaries, n, d, weighted,
            converged, iters, checkpoint, check_every, reset, engine,
        )
    else:
        result = _dataset_impl(
            make_deg(), blocks, boundaries, n, d, weighted, converged, iters,
            checkpoint, metrics_dir, gather_batch_size, reset,
        )

    total = result.scalars.get("pr", 1.0)
    if normalize and total > 0:
        scale = 1.0 / total

        def _norm(b: pa.Table) -> pa.Table:
            return pa.table(
                {"vertex": b["vertex"],
                 "pr": pc.multiply(pc.cast(b["pr"], pa.float64()), pa.scalar(scale, pa.float64()))}
            )

        result.state = result.state.map_batches(_norm, batch_format="pyarrow", batch_size=None)
    else:
        result.state = result.state.select_columns(["vertex", "pr"])
    return result


# ---------------------------------------------------------------- aligned

def _aligned_impl(
    graph, csr, make_deg, blocks, boundaries, n, d, weighted, converged, iters,
    checkpoint, check_every=1, reset=None, engine="tasks",
):
    inv_n = 1.0 / n
    if reset is not None:
        reset = np.asarray(reset, dtype=np.float64)
        total = reset.sum()
        if total <= 0:
            raise ValueError("reset vector must have positive mass")
        reset = reset / total

    def _init(sd: dict) -> dict:
        m = len(sd["vertex"])
        out = {
            "vertex": sd["vertex"],
            "pr": np.full(m, inv_n),
            "deg": sd["deg"],
        }
        # the reset distribution is static per vertex; carried in state so
        # apply never needs a lookup join (uniform when not personalized)
        out["reset"] = (
            reset[sd["vertex"]] if reset is not None else np.full(m, inv_n)
        )
        return out

    if graph._explicit_n:
        # dense universe: state built straight from the CSR blocks (degrees
        # are implicit in indptr) — no aggregate shuffle at all
        state = al.state_from_csr(csr, n, init_fn=_init)
    else:
        # sparse universe (endpoints incl. loop-only vertices): go through
        # the Dataset degree path, which covers the exact universe contract
        state = al.state_from_dataset(make_deg(), boundaries, init_fn=_init)

    import ray as _ray

    @_ray.remote
    def _dang0(b):
        return float(b["pr"][b["deg"] == 0.0].sum())

    dang0 = sum(_ray.get([_dang0.remote(b) for b in state.blocks]))
    scalars0 = {
        "absdiff": 1.0,
        "dangling_pr": dang0,
        "pr": 1.0,
        "base_total": (1.0 - d) + d * dang0,
    }

    dense_universe = graph._explicit_n

    def gather_fn(sb, csr_desc, starts, scalars):
        pairs = pagerank_messages_csc(
            csr_desc, sb["vertex"], sb["pr"], sb["deg"], weighted
        )
        # split each block's sorted (dst, partial) run by target range;
        # a segment is a list of such pairs (dsts unique within a pair)
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
        degv = old["deg"]
        acc = np.zeros(len(vertex))
        lo = vertex[0] if dense_universe and len(vertex) else 0
        for pairs in segments:
            for (sd, sp) in pairs:
                if not len(sd):
                    continue
                if dense_universe:
                    acc[sd - lo] += sp  # dsts unique within a pair
                else:
                    pos = np.searchsorted(vertex, sd)
                    np.add.at(acc, pos, sp)
        # igraph kernel: new[i] = d*Σ tmp + sumfrom*reset[i] with
        # sumfrom = (1-d) + d*dangling_mass (centrality.c:926-970)
        new = scalars["base_total"] * old["reset"] + d * acc
        absdiff = float(np.abs(new - old["pr"]).sum())
        dang = float(new[degv == 0.0].sum())
        return (
            {"vertex": vertex, "pr": new, "deg": degv, "reset": old["reset"]},
            {"absdiff": absdiff, "dangling_pr": dang, "pr": float(new.sum())},
        )

    def make_scalars(summed: dict, it: int) -> dict:
        dang = summed.get("dangling_pr", 0.0)
        return {
            "absdiff": summed.get("absdiff", 0.0),
            "dangling_pr": dang,
            "pr": summed.get("pr", 1.0),
            "base_total": (1.0 - d) + d * dang,
        }

    return al.run_aligned_loop(
        state=state,
        csr_descriptors=blocks,
        gather_fn=gather_fn,
        apply_fn=apply_fn,
        scalars=scalars0,
        make_scalars=make_scalars,
        converged=converged,
        max_iter=iters,
        state_columns=ALIGNED_STATE_COLUMNS,
        checkpoint=checkpoint,
        check_every=check_every,
        engine=engine,
    )


# ---------------------------------------------------------------- dataset

def _dataset_impl(
    deg, blocks, boundaries, n, d, weighted, converged, iters, checkpoint,
    metrics_dir, gather_batch_size, reset=None,
):
    inv_n = 1.0 / n
    if reset is not None:
        reset = np.asarray(reset, dtype=np.float64)
        total = reset.sum()
        if total <= 0:
            raise ValueError("reset vector must have positive mass")
        reset = reset / total
    reset_ref = ray.put(reset) if reset is not None else None

    def _init(b: pa.Table) -> pa.Table:
        dv = b["deg"].to_numpy(zero_copy_only=False)
        pr0 = np.full(len(dv), inv_n)
        return pa.table(
            {
                "vertex": b["vertex"],
                "pr": pa.array(pr0, pa.float64()),
                "deg": b["deg"],
                "absdiff": pa.array(np.full(len(dv), 1.0), pa.float64()),
                "dangling_pr": pa.array(np.where(dv == 0.0, inv_n, 0.0), pa.float64()),
            }
        )

    init_state = deg.map_batches(_init, batch_format="pyarrow", batch_size=None)

    def make_gather(iteration: int):
        def gather(batch):
            t0 = time.perf_counter()
            verts = batch["vertex"]
            dsts, partial = pagerank_messages(blocks, verts, batch["pr"], batch["deg"], weighted)
            z = np.zeros(len(dsts))
            if metrics_dir and len(verts):
                part = int(np.searchsorted(boundaries, verts[0], side="right")) if boundaries else 0
                record_task_metrics(
                    metrics_dir, iteration, part,
                    {"iteration": iteration, "partition": part,
                     "rows_in": int(len(verts)), "messages_out": int(len(dsts)),
                     "wall_ms": (time.perf_counter() - t0) * 1e3},
                )
            return pa.table(
                {"dst": pa.array(dsts, pa.int64()), "partial": pa.array(partial, pa.float64()),
                 "old": pa.array(z, pa.float64()), "deg": pa.array(z, pa.float64())}
            )
        return gather

    def self_message(b: pa.Table) -> pa.Table:
        zeros = pa.array(np.zeros(b.num_rows), pa.float64())
        return pa.table({"dst": b["vertex"], "partial": zeros, "old": b["pr"], "deg": b["deg"]})

    def step(state: ray.data.Dataset, scalars: dict, iteration: int) -> ray.data.Dataset:
        dangling_mass = scalars.get("dangling_pr", 0.0)
        base = ((1.0 - d) + d * dangling_mass) * inv_n
        msgs = state.map_batches(
            make_gather(iteration), batch_format="numpy", batch_size=gather_batch_size
        )
        carry = state.map_batches(self_message, batch_format="pyarrow", batch_size=None)
        red = msgs.union(carry).groupby("dst").sum(["partial", "old", "deg"])

        def apply(b: pa.Table) -> pa.Table:
            partial = b["sum(partial)"].to_numpy(zero_copy_only=False)
            old = b["sum(old)"].to_numpy(zero_copy_only=False)
            degv = b["sum(deg)"].to_numpy(zero_copy_only=False)
            if reset_ref is not None:
                # personalized (centrality.c:1284-1316): teleport AND the
                # dangling mass land on the reset distribution
                rv = ray.get(reset_ref)[b["dst"].to_numpy(zero_copy_only=False)]
                new = ((1.0 - d) + d * dangling_mass) * rv + d * partial
            else:
                new = base + d * partial
            return pa.table(
                {
                    "vertex": b["dst"],
                    "pr": pa.array(new, pa.float64()),
                    "deg": pa.array(degv, pa.float64()),
                    "absdiff": pa.array(np.abs(new - old), pa.float64()),
                    "dangling_pr": pa.array(np.where(degv == 0.0, new, 0.0), pa.float64()),
                }
            )

        return red.map_batches(apply, batch_format="pyarrow", batch_size=None)

    return run_loop(
        step=step,
        init_state=init_state,
        agg_columns=["absdiff", "dangling_pr", "pr"],
        converged=converged,
        max_iter=iters,
        state_columns=STATE_COLUMNS,
        checkpoint=checkpoint,
        boundaries=boundaries,
    )
