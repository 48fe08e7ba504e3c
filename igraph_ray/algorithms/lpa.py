"""Synchronous label propagation communities (deterministic variant).

The reference algorithm (community.c:2127-2360, Raghavan-Albert-Kumara) is
*asynchronous* with RNG-shuffled visit order and random tie-breaks, so no
reimplementation can match it run-for-run (SURVEY.md §2.2). Per the north
star this engine implements the **synchronous** variant with deterministic
smallest-label tie-breaking: every superstep, each vertex adopts the label
with the maximum total incident weight among its neighbors (count when
unweighted — community.c:2280-2298; weight sum — community.c:2257-2278),
ties broken by the smallest label, all vertices updating simultaneously.
Vertices with no neighbors keep their label. The iteration cap guards the
known synchronous-LPA oscillation mode. Parity with the reference is
checked as canonical partitions on LPA-stable fixtures only.

Finalization densifies community ids in order of first appearance by
vertex id (community.c:2323-2342): community → dense rank of the minimum
vertex id holding it.

Dataflow per superstep: gather emits per-batch pre-combined
(dst, label, w); reduce = sum by (dst,label); apply picks the arg-max
with smallest-label tie-break. Two execution modes share kernels.py
(see pagerank.py docstring).
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray import aligned as al
from igraph_ray.csr import build_csr_index
from igraph_ray.graph import Graph
from igraph_ray.kernels import combine_label_weights, label_weight_messages, lpa_argmax
from igraph_ray.superstep import (
    CheckpointConfig,
    SuperstepResult,
    record_task_metrics,
    run_loop,
)
from igraph_ray.util import dense_rank_map, hash_join

STATE_COLUMNS = ["vertex", "label", "changed"]
ALIGNED_STATE_COLUMNS = ["vertex", "label"]


def label_propagation(
    graph: Graph,
    num_partitions: Optional[int] = None,
    max_iter: int = 50,
    fixed_iterations: Optional[int] = None,
    checkpoint: Optional[CheckpointConfig] = None,
    canonicalize: bool = True,
    metrics_dir: Optional[str] = None,
    gather_batch_size: int = 262144,
    mode: str = "aligned",
    engine: str = "tasks",
) -> SuperstepResult:
    """Returns SuperstepResult with state (vertex, community)."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    weighted = graph.weighted
    csr = graph.csr_index("sym", num_partitions, weighted=weighted)
    blocks = csr.block_descriptors()
    boundaries = csr.boundaries

    if fixed_iterations is not None:
        def converged(scalars: dict, it: int) -> bool:
            return it + 1 >= fixed_iterations
        iters = fixed_iterations
        check_every = 0
    else:
        def converged(scalars: dict, it: int) -> bool:
            return scalars.get("changed", 1.0) == 0.0
        iters = max_iter
        check_every = 1

    if mode == "aligned":
        result = _aligned_impl(graph, csr, blocks, boundaries, weighted, converged, iters, checkpoint, check_every)
    else:
        result = _dataset_impl(
            graph, blocks, boundaries, weighted, converged, iters, checkpoint,
            metrics_dir, gather_batch_size,
        )

    state = result.state.select_columns(["vertex", "label"])
    if canonicalize:
        state = canonicalize_communities(state, num_partitions=num_partitions)
    else:
        def _rn(b: pa.Table) -> pa.Table:
            return pa.table({"vertex": b["vertex"], "community": b["label"]})
        state = state.map_batches(_rn, batch_format="pyarrow", batch_size=None)
    result.state = state
    return result


def _aligned_impl(graph, csr, blocks, boundaries, weighted, converged, iters, checkpoint, check_every=1):
    def _init(sd: dict) -> dict:
        return {"vertex": sd["vertex"], "label": sd["vertex"].copy()}

    if graph._explicit_n:
        state = al.state_from_csr(csr, graph.num_vertices(), init_fn=_init)
    else:
        state = al.state_from_dataset(graph.vertices(), boundaries, init_fn=_init)

    def gather_fn(sb, csr_desc, starts, scalars):
        dsts, labs, ws = label_weight_messages(csr_desc, sb["vertex"], sb["label"], weighted)
        bounds = np.searchsorted(dsts, starts[1:])
        segs = []
        lo = 0
        for hi in list(bounds) + [len(dsts)]:
            segs.append((dsts[lo:hi], labs[lo:hi], ws[lo:hi]))
            lo = hi
        return segs, len(dsts)

    def apply_fn(old, segments, scalars):
        vertex = old["vertex"]
        parts = [s for s in segments if len(s[0])]
        if parts:
            dst = np.concatenate([s[0] for s in parts])
            lab = np.concatenate([s[1] for s in parts])
            w = np.concatenate([s[2] for s in parts])
            dst, lab, w = combine_label_weights(dst, lab, w)
            new, changed = lpa_argmax(dst, lab, w, vertex, old["label"],
                                      grouped=True)
        else:
            new, changed = old["label"].copy(), np.zeros(len(vertex), dtype=bool)
        return (
            {"vertex": vertex, "label": new},
            {"changed": float(changed.sum())},
        )

    def make_scalars(summed: dict, it: int) -> dict:
        return {"changed": summed.get("changed", 0.0)}

    return al.run_aligned_loop(
        state=state,
        csr_descriptors=blocks,
        gather_fn=gather_fn,
        apply_fn=apply_fn,
        scalars={"changed": 1.0},
        make_scalars=make_scalars,
        converged=converged,
        max_iter=iters,
        state_columns=ALIGNED_STATE_COLUMNS,
        checkpoint=checkpoint,
        check_every=check_every,
    )


def _dataset_impl(
    graph, blocks, boundaries, weighted, converged, iters, checkpoint,
    metrics_dir, gather_batch_size,
):
    def _init(b: pa.Table) -> pa.Table:
        v = b["vertex"]
        return pa.table(
            {"vertex": v, "label": v,
             "changed": pa.array(np.ones(b.num_rows, dtype=np.int64), pa.int64())}
        )

    init_state = graph.vertices().map_batches(_init, batch_format="pyarrow", batch_size=None)

    def make_gather(iteration: int):
        def gather(batch):
            t0 = time.perf_counter()
            verts = batch["vertex"]
            dsts, labs, ws = label_weight_messages(blocks, verts, batch["label"], weighted)
            zeros = np.zeros(len(dsts), dtype=np.int64)
            if metrics_dir and len(verts):
                part = int(np.searchsorted(boundaries, verts[0], side="right")) if boundaries else 0
                record_task_metrics(
                    metrics_dir, iteration, part,
                    {"iteration": iteration, "partition": part,
                     "rows_in": int(len(verts)), "messages_out": int(len(dsts)),
                     "wall_ms": (time.perf_counter() - t0) * 1e3},
                )
            return pa.table(
                {"dst": pa.array(dsts, pa.int64()),
                 "label": pa.array(labs, pa.int64()),
                 "w": pa.array(ws, pa.float64()),
                 "own": pa.array(zeros, pa.int64())}
            )
        return gather

    def self_message(b: pa.Table) -> pa.Table:
        return pa.table(
            {"dst": b["vertex"], "label": b["label"],
             "w": pa.array(np.zeros(b.num_rows), pa.float64()),
             "own": pa.array(np.ones(b.num_rows, dtype=np.int64), pa.int64())}
        )

    def apply(b: pa.Table) -> pa.Table:
        dst = b["dst"].to_numpy(zero_copy_only=False)
        lab = b["label"].to_numpy(zero_copy_only=False)
        w = b["sum(w)"].to_numpy(zero_copy_only=False)
        own = b["sum(own)"].to_numpy(zero_copy_only=False)
        own_mask = own > 0
        old_dst = dst[own_mask]
        old_lab = lab[own_mask]
        o = np.argsort(old_dst, kind="stable")
        old_dst, old_lab = old_dst[o], old_lab[o]
        new_lab, changed = lpa_argmax(dst, lab, w, old_dst, old_lab)
        return pa.table(
            {"vertex": pa.array(old_dst, pa.int64()),
             "label": pa.array(new_lab, pa.int64()),
             "changed": pa.array(changed.astype(np.int64), pa.int64())}
        )

    def step(state: ray.data.Dataset, scalars: dict, iteration: int) -> ray.data.Dataset:
        msgs = state.map_batches(
            make_gather(iteration), batch_format="numpy", batch_size=gather_batch_size
        )
        carry = state.map_batches(self_message, batch_format="pyarrow", batch_size=None)
        red = msgs.union(carry).groupby(["dst", "label"]).sum(["w", "own"])
        # boundary-aligned sort keeps each dst's rows in a single block so
        # the arg-max runs vectorized per block with no cross-block groups.
        if boundaries:
            red = red.sort("dst", boundaries=list(boundaries))
        else:
            red = red.sort("dst")
        return red.map_batches(apply, batch_format="pyarrow", batch_size=None)

    return run_loop(
        step=step,
        init_state=init_state,
        agg_columns=["changed"],
        converged=converged,
        max_iter=iters,
        state_columns=STATE_COLUMNS,
        checkpoint=checkpoint,
        boundaries=boundaries,
    )


def canonicalize_communities(
    state: ray.data.Dataset, num_partitions: int = 16
) -> ray.data.Dataset:
    """Densify community ids in order of first appearance by vertex id
    (community.c:2323-2342): community → rank of min member vertex."""
    g = state.groupby("label").min("vertex")

    def _minv(b: pa.Table) -> pa.Table:
        return pa.table({"label": b["label"], "minv": b["min(vertex)"]})

    mapping = g.map_batches(_minv, batch_format="pyarrow", batch_size=None)
    ranked = dense_rank_map(mapping.select_columns(["minv"]), "minv")
    mapping = hash_join(mapping, ranked, on="minv", num_partitions=num_partitions)
    joined = hash_join(
        state, mapping.select_columns(["label", "rank"]),
        on="label", num_partitions=num_partitions,
    )

    def _project(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"], "community": b["rank"]})

    return joined.map_batches(_project, batch_format="pyarrow", batch_size=None)
