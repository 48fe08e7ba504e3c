"""Leiden communities (Traag, Waltman & van Eck, "From Louvain to
Leiden: guaranteeing well-connected communities", Scientific Reports
2019) — the engine's extension of the multilevel modularity family
beyond igraph_community_multilevel
(/root/reference/src/community.c:2854 is the Louvain the reference
ships; Leiden semantics follow the published paper).

Per level, three phases:

1. **local moving** — the synchronous Louvain sweeps
   (louvain._one_sweep), starting from the previous level's partition
   (singletons at level 1).
2. **refinement** — start every vertex as a singleton and run
   *constrained* sweeps in which (a) only vertices whose refined
   community is still a singleton may move (a vertex merged into a
   larger community never moves again), (b) candidates are restricted
   to the vertex's phase-1 community (the sweep runs on the
   intra-community edge subset, so k_vc counts exactly the edges into
   refined communities inside the same phase-1 community while degrees
   / volumes / m2 stay global), and (c) moves into a label vacated by
   its sole occupant in the same synchronous sweep are cancelled
   (cancel_vacated — two strangers simultaneously attaching to a
   departing singleton would otherwise form a disconnected pair).
   (a)+(c) make every refined community connected — the Leiden
   guarantee. This is the deterministic θ→0 greedy limit of the
   paper's randomized merge step, with min-community-id tie breaks and
   no well-connectedness pre-filter (documented deviation: the filter
   only prunes candidates the greedy gain test already rejects at
   γ=1 in practice; quality gates live in tests/test_leiden.py).
3. **aggregation by the refined partition**, with the coarse graph's
   initial assignment set to the phase-1 communities (each refined
   community lies inside exactly one phase-1 community by (b)) — the
   defining difference from Louvain, which always restarts coarse
   levels from singletons.

Every phase is the same shuffle pattern as Louvain: one k_vc
groupby-join, a boundary-aligned sort for per-vertex argmax, one apply
join per sweep — no driver-side state; labels stay in the object store
end to end.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.util import hash_join
from igraph_ray.algorithms.louvain import (
    _coarsen,
    _degrees,
    _modularity_from,
    _one_sweep,
    _sym_weighted,
)


@dataclasses.dataclass
class LeidenResult:
    state: ray.data.Dataset  # (vertex, community) — canonical dense labels
    modularity: float
    levels: int
    sweeps: int


def _refine(
    cur_sym: ray.data.Dataset,
    assign: ray.data.Dataset,  # (vertex, deg, community) after local moving
    m2: float,
    num_partitions: int,
    max_sweeps: int,
    bounds,
) -> Tuple[ray.data.Dataset, int]:
    """Phase 2: constrained singleton-merge sweeps. Returns
    ((vertex, community) refined labels, sweeps run)."""
    def _lab_s(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["vertex"], "p_src": b["community"]})

    def _lab_d(b: pa.Table) -> pa.Table:
        return pa.table({"dst": b["vertex"], "p_dst": b["community"]})

    j = hash_join(cur_sym, assign, on="src", num_partitions=num_partitions,
                  right_map=_lab_s)
    j = hash_join(j, assign, on="dst", num_partitions=num_partitions,
                  lazy_left=True, right_map=_lab_d)

    def _intra(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.equal(b["p_src"], b["p_dst"])
        return pa.table({"src": b["src"].filter(keep),
                         "dst": b["dst"].filter(keep),
                         "weight": b["weight"].filter(keep)})

    intra = j.map_batches(_intra, batch_format="pyarrow",
                          batch_size=None).materialize()

    ref = assign.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "deg": b["deg"],
                            "community": b["vertex"]}),
        batch_format="pyarrow", batch_size=None).materialize()
    sweeps = 0
    for _ in range(max_sweeps):
        ref, moved = _one_sweep(
            intra, ref, m2, num_partitions, bounds,
            singleton_movers=True, cancel_vacated=True)
        sweeps += 1
        if moved == 0:
            break
    return ref.select_columns(["vertex", "community"]), sweeps


def leiden_pinned(
    graph: Graph,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Pinned one-round Leiden with the exact int64 gain comparator:
    exactly ONE full-activation local-moving sweep from singletons
    (phase 1), then exactly ONE constrained refinement sweep from
    singletons on the intra-community edge subset (phase 2 — global
    degrees/volumes/m2, singleton_movers + cancel_vacated, the Leiden
    connectivity guards). Integer weights keep both phases bit-exact,
    so a fixed SQL text replays the full round — the driver-checked
    core of the Leiden recurrence (Traag et al. 2019), with the
    data-dependent sweep/level loops pinned away. Returns
    (vertex, community, refined) raw labels."""
    sym = _sym_weighted(graph).materialize()
    m2 = float(sym.sum("weight") or 0.0)
    if m2 == 0.0:
        return graph.vertices().map_batches(
            lambda b: pa.table({"vertex": b["vertex"],
                                "community": b["vertex"],
                                "refined": b["vertex"]}),
            batch_format="pyarrow", batch_size=None)
    from igraph_ray.csr import compute_boundaries

    deg = _degrees(sym)
    assign = deg.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "deg": b["deg"],
                            "community": b["vertex"]}),
        batch_format="pyarrow", batch_size=None).materialize()
    bounds = compute_boundaries(assign, num_partitions, col="vertex")
    assign, _moved = _one_sweep(sym, assign, m2, num_partitions,
                                bounds=bounds, integer_gains=True)
    # phase 2: one constrained singleton-merge sweep on intra edges
    def _lab_s(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["vertex"], "p_src": b["community"]})

    def _lab_d(b: pa.Table) -> pa.Table:
        return pa.table({"dst": b["vertex"], "p_dst": b["community"]})

    j = hash_join(sym, assign, on="src", num_partitions=num_partitions,
                  right_map=_lab_s)
    j = hash_join(j, assign, on="dst", num_partitions=num_partitions,
                  lazy_left=True, right_map=_lab_d)

    def _intra(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.equal(b["p_src"], b["p_dst"])
        return pa.table({"src": b["src"].filter(keep),
                         "dst": b["dst"].filter(keep),
                         "weight": b["weight"].filter(keep)})

    intra = j.map_batches(_intra, batch_format="pyarrow",
                          batch_size=None).materialize()
    ref = assign.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "deg": b["deg"],
                            "community": b["vertex"]}),
        batch_format="pyarrow", batch_size=None).materialize()
    ref, _rm = _one_sweep(intra, ref, m2, num_partitions, bounds=bounds,
                          integer_gains=True, singleton_movers=True,
                          cancel_vacated=True)
    out = hash_join(
        assign.select_columns(["vertex", "community"]),
        ref.map_batches(
            lambda b: pa.table({"vertex": b["vertex"],
                                "refined": b["community"]}),
            batch_format="pyarrow", batch_size=None),
        on="vertex", num_partitions=num_partitions)
    return out.select_columns(["vertex", "community", "refined"])


def leiden(
    graph: Graph,
    num_partitions: int = 8,
    max_sweeps: int = 8,
    max_refine_sweeps: int = 8,
    max_levels: int = 10,
    mode: str = "aligned",
) -> LeidenResult:
    """Leiden communities over the undirected interpretation of
    ``graph``; final labels canonically renumbered 0..k-1 by order of
    first appearance by vertex id (the community.c densification
    contract, like louvain()).

    ``mode="aligned"`` (default) runs all three phases on the
    actor-pinned engine (community_aligned.py); ``mode="dataset"`` is
    the pure Ray-Data loop. Both share choose_moves and the same phase
    schedule, so results are identical whenever float sums are exact."""
    if mode == "aligned":
        from igraph_ray.algorithms.community_aligned import leiden_aligned

        return leiden_aligned(
            graph, num_partitions=num_partitions, max_sweeps=max_sweeps,
            max_refine_sweeps=max_refine_sweeps, max_levels=max_levels)
    sym = _sym_weighted(graph).materialize()
    m2 = float(sym.sum("weight") or 0.0)
    if m2 == 0.0:
        verts = graph.vertices()
        return LeidenResult(
            state=verts.map_batches(
                lambda b: pa.table({"vertex": b["vertex"],
                                    "community": b["vertex"]}),
                batch_format="pyarrow", batch_size=None),
            modularity=float("nan"), levels=0, sweeps=0,
        )

    from igraph_ray.csr import compute_boundaries

    cur_sym = sym
    mapping: Optional[ray.data.Dataset] = None  # orig vertex -> level node
    init: Optional[ray.data.Dataset] = None     # level node -> start community
    final_assign: Optional[ray.data.Dataset] = None
    final_mapping: Optional[ray.data.Dataset] = None  # orig -> final level node
    total_sweeps = 0
    level = 0
    while level < max_levels:
        level += 1
        deg = _degrees(cur_sym)
        if init is None:
            assign = deg.map_batches(
                lambda b: pa.table({"vertex": b["vertex"], "deg": b["deg"],
                                    "community": b["vertex"]}),
                batch_format="pyarrow", batch_size=None)
        else:
            assign = hash_join(deg, init, on="vertex",
                               num_partitions=num_partitions)
        assign = assign.materialize()
        n_before = assign.count()
        bounds = compute_boundaries(assign, num_partitions,
                                    num_edges=n_before, col="vertex")
        moved_any = False
        # level 1 keeps Louvain's trickle threshold; coarse levels are
        # small, so run to strict convergence with salted half-activation
        # after two full sweeps (informed starts oscillate under full
        # synchronous activation — mutual swaps the singleton guard
        # doesn't cover; the random half separates the pair w.p. 1/2 per
        # sweep)
        thresh = max(0, int(0.005 * n_before)) if level == 1 else 0
        cap = 3 * max_sweeps
        full = True  # sweep mode: full activation vs salted half
        for i in range(cap):
            salt = None if full else (level << 20) + i
            assign, moved = _one_sweep(cur_sym, assign, m2, num_partitions,
                                       bounds, activation_salt=salt)
            total_sweeps += 1
            moved_any = moved_any or moved > 0
            if full:
                if moved <= thresh:
                    break  # converged on a FULL sweep — the only real stop
                if i >= 1:
                    full = False  # two full sweeps done; damp oscillation
            elif moved <= thresh:
                full = True  # salted (near-)zero-move: confirm with a full
                # sweep (low movement under half activation is not
                # convergence — the genuine mover may have been masked)
        phase1 = assign.select_columns(["vertex", "community"]).materialize()
        final_assign = phase1
        final_mapping = mapping  # orig -> THIS level's nodes (None = identity)
        if not moved_any and level > 1:
            break
        ref, rsw = _refine(cur_sym, assign, m2, num_partitions,
                           max_refine_sweeps, bounds)
        ref = ref.materialize()
        total_sweeps += rsw
        if mapping is None:
            mapping = ref
        else:
            j = hash_join(
                mapping,
                ref.map_batches(
                    lambda b: pa.table({"community": b["vertex"],
                                        "next": b["community"]}),
                    batch_format="pyarrow", batch_size=None),
                on="community", num_partitions=num_partitions)
            mapping = j.map_batches(
                lambda b: pa.table({"vertex": b["vertex"],
                                    "community": b["next"]}),
                batch_format="pyarrow", batch_size=None).materialize()
        # coarse init: refined label -> its (unique) phase-1 community
        pair = hash_join(
            ref.map_batches(
                lambda b: pa.table({"vertex": b["vertex"],
                                    "rcomm": b["community"]}),
                batch_format="pyarrow", batch_size=None),
            phase1, on="vertex", num_partitions=num_partitions)
        init = pair.groupby("rcomm").min("community").map_batches(
            lambda b: pa.table({"vertex": b["rcomm"],
                                "community": b["min(community)"]}),
            batch_format="pyarrow", batch_size=None).materialize()
        n_ref = init.count()
        if n_ref >= n_before:
            break
        cur_sym = _coarsen(
            cur_sym,
            ref,
            num_partitions,
        ).materialize()

    # project the final level's phase-1 labels back to original vertices
    if final_mapping is not None:
        # final_mapping maps orig -> final-level node; final_assign labels
        # exactly those nodes (it was snapshotted before mapping advanced
        # past the final level's refinement)
        j = hash_join(
            final_mapping,
            final_assign.map_batches(
                lambda b: pa.table({"community": b["vertex"],
                                    "final": b["community"]}),
                batch_format="pyarrow", batch_size=None),
            on="community", num_partitions=num_partitions)
        flat = j.map_batches(
            lambda b: pa.table({"vertex": b["vertex"],
                                "community": b["final"]}),
            batch_format="pyarrow", batch_size=None)
    else:
        flat = final_assign

    # canonical renumber by order of first appearance (min vertex id)
    from igraph_ray.util import dense_rank_map

    firsts = flat.groupby("community").min("vertex").map_batches(
        lambda b: pa.table({"community": b["community"],
                            "minv": b["min(vertex)"]}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(flat, firsts, on="community", num_partitions=num_partitions)
    relabeled = j.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "community": b["minv"]}),
        batch_format="pyarrow", batch_size=None)
    rank = dense_rank_map(relabeled, "community")
    j2 = hash_join(
        relabeled,
        rank.map_batches(
            lambda b: pa.table({"community": b["community"],
                                "dense": b["rank"]}),
            batch_format="pyarrow", batch_size=None),
        on="community", num_partitions=num_partitions)
    state = j2.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "community": b["dense"]}),
        batch_format="pyarrow", batch_size=None).materialize()
    q = _modularity_from(sym, state, m2, num_partitions)
    return LeidenResult(state=state, modularity=q, levels=level,
                        sweeps=total_sweeps)
