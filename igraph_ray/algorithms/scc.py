"""Strongly connected components via iterative forward/backward min-label
propagation (the distributed coloring / FW-BW family: Orzan 2004;
Hong et al., PPoPP 2013).

Reference semantics: ``igraph_clusters_strong``
(/root/reference/src/components.c:164-316 — Kosaraju-style two-pass DFS
with mode dispatch at components.c:75-87). A sequential DFS does not
distribute; the equivalent fixpoint formulation used here:

Per outer round, over the *active* (not yet assigned) vertex set:

1. F-pass: F(v) = min active vertex that can reach v along edge direction
   (min-label propagation over the "out" CSR, self included).
2. B-pass: B(v) = min active vertex v can reach (same propagation over the
   "rev" CSR — every edge flipped).
3. Assign: F(v) == B(v) == m means m reaches v AND v reaches m, i.e. v is
   in m's SCC. Set scc(v) = m, deactivate v.

Correctness of the round: removing previously-assigned SCCs never splits a
remaining SCC (any cycle witnessing mutual reachability lies entirely
inside one SCC), and for m = min active vertex, every v in SCC(m) gets
F(v)=B(v)=m (all active labels are >= m and m is both ancestor and
descendant of v) — so each round assigns at least one whole SCC and the
loop terminates in <= #SCC rounds (typically 1-3 on real graphs; a long
chain of singleton SCCs is the worst case, as for every coloring-family
algorithm).

Label contract: like weak components, final labels follow the
rank-of-min-vertex contract (densify_labels) — a canonical renumbering of
igraph's traversal-order labels; partitions are identical.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray import aligned as al
from igraph_ray.algorithms.components import densify_labels
from igraph_ray.graph import Graph
from igraph_ray.kernels import minlabel_messages_csc
from igraph_ray.superstep import SuperstepResult

STATE_COLUMNS = ["vertex", "label", "active"]


@ray.remote
def _init_round(block: dict) -> dict:
    """Label = vertex id for active vertices, sentinel-by-scc for assigned
    ones (scc >= 0 means done; their label must never win a min)."""
    active = block["active"]
    label = np.where(active, block["vertex"], np.int64(2**62))
    return {"vertex": block["vertex"], "label": label, "active": active}


@ray.remote(num_returns=2)
def _assign(block_f: dict, block_b: dict, scc_block: dict):
    """Assign scc where F == B among active; returns (new bookkeeping
    block, number newly assigned)."""
    active = scc_block["active"]
    f = block_f["label"]
    b = block_b["label"]
    hit = active & (f == b) & (f < 2**62)
    scc = np.where(hit, f, scc_block["scc"])
    return (
        {"vertex": scc_block["vertex"], "scc": scc, "active": active & ~hit},
        int(hit.sum()),
    )


def strongly_connected_components(
    graph: Graph,
    num_partitions: Optional[int] = None,
    max_rounds: int = 64,
    max_iter: int = 200,
    densify: bool = True,
    engine: str = "tasks",
) -> SuperstepResult:
    """Returns SuperstepResult with state (vertex, label): vertices share a
    label iff they are mutually reachable. ``iterations`` counts total
    inner supersteps across all rounds; ``scalars['rounds']`` the outer
    rounds."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    csr_out = graph.csr_index("out", num_partitions, weighted=False)
    csr_rev = graph.csr_index("rev", num_partitions, weighted=False)
    sentinel = int(2**62)

    # one state layout for both passes (rev blocks map onto it by range
    # overlap inside run_aligned_loop)
    def _init(sd: dict) -> dict:
        v = sd["vertex"]
        return {
            "vertex": v,
            "scc": np.full(len(v), -1, dtype=np.int64),
            "active": np.ones(len(v), dtype=bool),
        }

    if graph._explicit_n:
        book = al.state_from_csr(csr_out, graph.num_vertices(), init_fn=_init)
    else:
        book = al.state_from_dataset(graph.vertices(), [int(b) for b in csr_out.boundaries], init_fn=_init)

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
        active = old["active"]
        new = old["label"].copy()
        for pairs in segments:
            for (sd, sl) in pairs:
                if not len(sd):
                    continue
                pos = np.searchsorted(vertex, sd)
                np.minimum.at(new, pos, sl)
        # assigned vertices are out of the subgraph: their labels stay
        # sentinel no matter what arrived
        new[~active] = sentinel
        changed = int((new < old["label"]).sum())
        return (
            {"vertex": vertex, "label": new, "active": active},
            {"changed": float(changed)},
        )

    def make_scalars(summed, it):
        return {"changed": summed.get("changed", 0.0)}

    def converged(scalars, it):
        return scalars.get("changed", 1.0) == 0.0

    if len(book.blocks) == 0:
        empty = pa.table({"vertex": pa.array([], pa.int64()),
                          "label": pa.array([], pa.int64())})
        return SuperstepResult(
            state=ray.data.from_arrow(empty), iterations=0,
            scalars={"rounds": 0.0}, converged=True,
        )

    total_iters = 0
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        results = {}
        for name, csr in (("f", csr_out), ("b", csr_rev)):
            pass_state = al.AlignedState(
                blocks=[_init_round.remote(b) for b in book.blocks],
                starts=book.starts,
            )
            res = al.run_aligned_loop(
                state=pass_state,
                csr_descriptors=csr.block_descriptors(),
                gather_fn=gather_fn,
                apply_fn=apply_fn,
                scalars={"changed": 1.0},
                make_scalars=make_scalars,
                converged=converged,
                max_iter=max_iter,
                state_columns=STATE_COLUMNS,
                engine=engine,
            )
            total_iters += res.iterations
            results[name] = res.aligned_state
        pairs = [
            _assign.remote(fb, bb, kb)
            for fb, bb, kb in zip(
                results["f"].blocks, results["b"].blocks, book.blocks
            )
        ]
        book = al.AlignedState(blocks=[p[0] for p in pairs], starts=book.starts)
        assigned_now = sum(ray.get([p[1] for p in pairs]))
        if assigned_now == 0:
            break

    @ray.remote
    def _finalize(b: dict) -> dict:
        # anything still active after max_rounds keeps its own id (safe
        # fallback: singleton labels)
        scc = np.where(b["active"], b["vertex"], b["scc"])
        return {"vertex": b["vertex"], "label": scc}

    final = al.AlignedState(
        blocks=[_finalize.remote(b) for b in book.blocks], starts=book.starts
    )
    state = al.aligned_to_dataset(final)
    if densify:
        state = densify_labels(state, num_partitions=num_partitions)
    return SuperstepResult(
        state=state,
        iterations=total_iters,
        scalars={"rounds": float(rounds)},
        metrics=[],
        converged=True,
    )
