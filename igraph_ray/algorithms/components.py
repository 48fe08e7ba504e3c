"""Weakly connected components via iterative min-label propagation.

Reference semantics (SURVEY.md §2.2; components.c:89-162): BFS over
IGRAPH_ALL neighbors scanning seeds in increasing vertex id; the final
membership id of a component is the **rank of the component's minimum
vertex id** among all component minima (components.c:120-146). A
distributed min-label propagation converges to exactly min-vertex-id per
component; a final dense-rank over the distinct labels reproduces the
igraph label contract bit-for-bit.

Superstep: gather over the symmetrized CSR emits per-batch pre-combined
(dst, min incoming label); reduce = min by dst; apply takes the
elementwise min with the previous label and counts changes. Converges
when the global changed-count hits 0 (the hash-min scheme the north rule
names). Two execution modes share kernels.py (see pagerank.py docstring).
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
from igraph_ray.kernels import minlabel_messages, minlabel_messages_csc
from igraph_ray.superstep import (
    CheckpointConfig,
    SuperstepResult,
    record_task_metrics,
    run_loop,
)
from igraph_ray.util import dense_rank_map, hash_join

STATE_COLUMNS = ["vertex", "label", "changed"]
ALIGNED_STATE_COLUMNS = ["vertex", "label"]


def connected_components(
    graph: Graph,
    num_partitions: Optional[int] = None,
    max_iter: int = 200,
    checkpoint: Optional[CheckpointConfig] = None,
    densify: bool = True,
    metrics_dir: Optional[str] = None,
    gather_batch_size: int = 262144,
    mode: str = "aligned",
    engine: str = "tasks",
) -> SuperstepResult:
    """Returns SuperstepResult with state (vertex, label); labels follow the
    rank-of-min-vertex contract when densify=True (the igraph default)."""
    n = graph.num_vertices()
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    csr = graph.csr_index("sym", num_partitions, weighted=False)
    blocks = csr.block_descriptors()
    boundaries = csr.boundaries
    sentinel = int(n if n else 2**62)

    def converged(scalars: dict, it: int) -> bool:
        return scalars.get("changed", 1.0) == 0.0

    if mode == "aligned":
        result = _aligned_impl(
            graph, csr, blocks, boundaries, sentinel, converged, max_iter,
            checkpoint, engine,
        )
    else:
        result = _dataset_impl(
            graph, blocks, boundaries, sentinel, converged, max_iter, checkpoint,
            metrics_dir, gather_batch_size,
        )

    state = result.state.select_columns(["vertex", "label"])
    if densify:
        state = densify_labels(state, num_partitions=num_partitions)
    result.state = state
    return result


def _aligned_impl(graph, csr, blocks, boundaries, sentinel, converged, max_iter, checkpoint, engine="tasks"):
    def _init(sd: dict) -> dict:
        return {"vertex": sd["vertex"], "label": sd["vertex"].copy()}

    if graph._explicit_n:
        state = al.state_from_csr(csr, graph.num_vertices(), init_fn=_init)
    else:
        state = al.state_from_dataset(graph.vertices(), boundaries, init_fn=_init)

    dense_universe = graph._explicit_n

    def gather_fn(sb, csr_desc, starts, scalars):
        pairs = minlabel_messages_csc(csr_desc, sb["vertex"], sb["label"], sentinel)
        nb = len(starts)
        segs = [[] for _ in range(nb)]
        msg_count = 0
        for (dsts, minl) in pairs:
            msg_count += len(dsts)
            bounds = np.searchsorted(dsts, starts[1:])
            lo = 0
            for r, hi in enumerate(list(bounds) + [len(dsts)]):
                if hi > lo:
                    segs[r].append((dsts[lo:hi], minl[lo:hi]))
                lo = hi
        return [tuple(s) for s in segs], msg_count

    def apply_fn(old, segments, scalars):
        vertex = old["vertex"]
        new = old["label"].copy()
        lo = vertex[0] if dense_universe and len(vertex) else 0
        for pairs in segments:
            for (sd, sl) in pairs:
                if not len(sd):
                    continue
                if dense_universe:
                    idx = sd - lo  # dsts unique within a pair
                    new[idx] = np.minimum(new[idx], sl)
                else:
                    pos = np.searchsorted(vertex, sd)
                    np.minimum.at(new, pos, sl)
        changed = int((new < old["label"]).sum())
        return ({"vertex": vertex, "label": new}, {"changed": float(changed)})

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
        max_iter=max_iter,
        state_columns=ALIGNED_STATE_COLUMNS,
        checkpoint=checkpoint,
        engine=engine,
    )


def _dataset_impl(
    graph, blocks, boundaries, sentinel, converged, max_iter, checkpoint,
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
            dsts, minl = minlabel_messages(blocks, verts, batch["label"], sentinel)
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
                 "label": pa.array(minl, pa.int64()),
                 "old": pa.array(np.full(len(dsts), sentinel), pa.int64())}
            )
        return gather

    def self_message(b: pa.Table) -> pa.Table:
        return pa.table({"dst": b["vertex"], "label": b["label"], "old": b["label"]})

    def step(state: ray.data.Dataset, scalars: dict, iteration: int) -> ray.data.Dataset:
        msgs = state.map_batches(
            make_gather(iteration), batch_format="numpy", batch_size=gather_batch_size
        )
        carry = state.map_batches(self_message, batch_format="pyarrow", batch_size=None)
        red = msgs.union(carry).groupby("dst").min(["label", "old"])

        def apply(b: pa.Table) -> pa.Table:
            new = b["min(label)"].to_numpy(zero_copy_only=False)
            old = b["min(old)"].to_numpy(zero_copy_only=False)
            return pa.table(
                {"vertex": b["dst"], "label": pa.array(new, pa.int64()),
                 "changed": pa.array((new < old).astype(np.int64), pa.int64())}
            )

        return red.map_batches(apply, batch_format="pyarrow", batch_size=None)

    return run_loop(
        step=step,
        init_state=init_state,
        agg_columns=["changed"],
        converged=converged,
        max_iter=max_iter,
        state_columns=STATE_COLUMNS,
        checkpoint=checkpoint,
        boundaries=boundaries,
    )


def densify_labels(
    state: ray.data.Dataset, label_col: str = "label", num_partitions: int = 16
) -> ray.data.Dataset:
    """Relabel to the igraph contract: label → rank of label ascending
    (components.c:120-146). Output columns (vertex, label)."""
    mapping = dense_rank_map(state.select_columns([label_col]), label_col)
    joined = hash_join(state, mapping, on=label_col, num_partitions=num_partitions)

    def _project(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"], "label": b["rank"]})

    return joined.map_batches(_project, batch_format="pyarrow", batch_size=None)


def component_sizes(state: ray.data.Dataset) -> ray.data.Dataset:
    """(label, csize) — igraph's csize output (components.c:147-154)."""
    g = state.groupby("label").count()

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table({"label": b["label"], "csize": b["count()"]})

    return g.map_batches(_rename, batch_format="pyarrow", batch_size=None)


def decompose_edges(
    graph, num_partitions: int = 8
) -> "ray.data.Dataset":
    """igraph_decompose (components.c:493) expressed relationally: every
    edge tagged with its weak-component label (both endpoints share it by
    definition), so per-component subgraphs are a partition filter /
    partitioned Parquet write away instead of a list of materialized
    graph objects (which cannot exist at 10^12-edge scale)."""
    from igraph_ray.util import hash_join

    st = connected_components(graph, num_partitions=num_partitions).state

    def _lab(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["vertex"], "component": b["label"]})

    return hash_join(
        graph.edges.select_columns(["src", "dst"]),
        st.map_batches(_lab, batch_format="pyarrow", batch_size=None),
        on="src", num_partitions=num_partitions,
    )


def is_connected(graph, mode: str = "weak", num_partitions: int = 8) -> bool:
    """igraph_is_connected (components.c:343): single weak component
    (mode="weak") or single strong component (mode="strong"). Empty
    graphs count as connected like the reference's n<=1 shortcut."""
    if graph.num_vertices() <= 1:
        return True
    if mode == "weak":
        st = connected_components(graph, num_partitions=num_partitions).state
    elif mode == "strong":
        from igraph_ray.algorithms.scc import strongly_connected_components

        st = strongly_connected_components(graph, num_partitions=num_partitions).state
    else:
        raise ValueError(f"mode must be weak/strong, got {mode!r}")
    lab = st.map_batches(
        lambda b: pa.table({"label": b["label"]}),
        batch_format="pyarrow", batch_size=None,
    )
    return lab.groupby("label").count().count() == 1
