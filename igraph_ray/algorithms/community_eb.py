"""Girvan–Newman edge-betweenness community detection.

Reference semantics: igraph_community_edge_betweenness
(/root/reference/src/community.c:312-520) — repeatedly remove the edge
with the highest betweenness, recording the removal order (the
dendrogram, reference's `removed_edges`/`edge_betweenness` outputs) and
the modularity of the component partition after each removal (computed
against the ORIGINAL edge set, community.c's modularity sequence).

Distributed shape: each removal step reuses the engine's distributed
Brandes edge betweenness (algorithms/betweenness.py) on the shrinking
graph and the min-label components superstep for the partition; the
driver sees one (edge, score) row per step plus scalars. GN recomputes
betweenness |E| times by definition, so — like the reference, whose own
docs call it feasible only for small graphs — the entry is guarded by
``max_edges``; ties break deterministically by (lo, hi).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.graph import Graph


def community_edge_betweenness(
    graph: Graph,
    target_communities: Optional[int] = None,
    max_removals: Optional[int] = None,
    num_partitions: int = 8,
    max_edges: int = 5000,
) -> pa.Table:
    """Returns the dendrogram table, one row per removal step:
    (step, lo, hi, ebc_e6, n_communities, modularity_e9) — the removed
    undirected edge, its betweenness (×10⁶, rounded), and the component
    count / modularity (×10⁹, rounded) of the partition AFTER the
    removal. Stops when ``target_communities`` components exist (or the
    graph empties / ``max_removals`` is hit)."""
    from igraph_ray.algorithms.betweenness import edge_betweenness
    from igraph_ray.algorithms.components import connected_components
    from igraph_ray.algorithms.modularity import modularity

    und = graph.canonical_undirected().materialize()
    ne = und.count()
    if ne > max_edges:
        raise NotImplementedError(
            f"Girvan–Newman recomputes betweenness per removal; guarded "
            f"to {max_edges} edges ({ne} present)")
    orig_edges = und.map_batches(
        lambda b: pa.table({"src": b["lo"], "dst": b["hi"]}),
        batch_format="pyarrow", batch_size=None).materialize()

    steps: list = []
    budget = max_removals if max_removals is not None else ne
    current = und
    for step in range(min(budget, ne)):
        if current.count() == 0:
            break
        # symmetrized view for the directed Brandes kernel; on an
        # undirected graph ebc(u->v) == ebc(v->u), so the (lo, hi) score
        # is the sum over both directions (matching igraph's undirected
        # accounting up to the constant 2, which cancels in the argmax)
        sym = current.map_batches(
            lambda b: pa.table({
                "src": pa.array(np.concatenate([
                    b["lo"].to_numpy(zero_copy_only=False),
                    b["hi"].to_numpy(zero_copy_only=False)])),
                "dst": pa.array(np.concatenate([
                    b["hi"].to_numpy(zero_copy_only=False),
                    b["lo"].to_numpy(zero_copy_only=False)])),
            }), batch_format="pyarrow", batch_size=None)
        eb = edge_betweenness(Graph(sym.materialize()),
                              num_partitions=num_partitions)

        def _und_scores(b: pa.Table) -> pa.Table:
            s = b["src"].to_numpy(zero_copy_only=False)
            d = b["dst"].to_numpy(zero_copy_only=False)
            v = b["ebc"].to_numpy(zero_copy_only=False)
            return pa.table({"lo": pa.array(np.minimum(s, d)),
                             "hi": pa.array(np.maximum(s, d)),
                             "ebc": pa.array(v)})

        scores = (eb.map_batches(_und_scores, batch_format="pyarrow",
                                 batch_size=None)
                  .groupby(["lo", "hi"]).sum("ebc").materialize())
        top = scores.sort(["sum(ebc)", "lo", "hi"],
                          descending=[True, False, False]
                          ).limit(1).take_all()[0]
        rlo, rhi, rebc = int(top["lo"]), int(top["hi"]), float(top["sum(ebc)"])

        current = current.filter(
            expr=f"lo != {rlo} or hi != {rhi}").materialize()

        # partition after removal (isolated vertices from the ORIGINAL
        # universe keep their own singleton labels via Graph(n))
        remaining = current.map_batches(
            lambda b: pa.table({"src": b["lo"], "dst": b["hi"]}),
            batch_format="pyarrow", batch_size=None)
        gpart = Graph(remaining.materialize(),
                      n=graph.num_vertices() if graph._explicit_n else None)
        from igraph_ray.util import hash_join

        if gpart.edges.count() > 0 or graph._explicit_n:
            comp = connected_components(gpart, num_partitions=num_partitions,
                                        densify=False).state.materialize()
        else:
            comp = ray.data.from_arrow(pa.table(
                {"vertex": pa.array([], pa.int64()),
                 "label": pa.array([], pa.int64())}))
        # vertices isolated by removals fall out of the shrinking edge
        # set; min-label semantics make each its own singleton (label =
        # itself), restored with one left-outer coalesce over the
        # ORIGINAL universe so modularity sees every vertex
        member = hash_join(graph.vertices(), comp, on="vertex",
                           num_partitions=num_partitions,
                           join_type="left_outer")

        def _mem(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            if b.num_rows == 0 or "vertex" not in b.column_names:
                return pa.table({"vertex": pa.array([], pa.int64()),
                                 "community": pa.array([], pa.int64())})
            lab = (pc.coalesce(b["label"], b["vertex"])
                   if "label" in b.column_names else b["vertex"])
            return pa.table({"vertex": b["vertex"],
                             "community": lab.cast(pa.int64())})

        member = member.map_batches(_mem, batch_format="pyarrow",
                                    batch_size=None).materialize()
        ncomm = member.groupby("community").count().count()
        q = modularity(orig_edges, member, num_partitions=num_partitions)
        steps.append((step, rlo, rhi, int(round(rebc * 1e6)), int(ncomm),
                      int(round(q * 1e9))))
        if target_communities is not None and ncomm >= target_communities:
            break

    if not steps:
        return pa.table({
            "step": pa.array([], pa.int64()), "lo": pa.array([], pa.int64()),
            "hi": pa.array([], pa.int64()),
            "ebc_e6": pa.array([], pa.int64()),
            "n_communities": pa.array([], pa.int64()),
            "modularity_e9": pa.array([], pa.int64())})
    arr = np.array(steps, dtype=np.int64)
    return pa.table({
        "step": pa.array(arr[:, 0]), "lo": pa.array(arr[:, 1]),
        "hi": pa.array(arr[:, 2]), "ebc_e6": pa.array(arr[:, 3]),
        "n_communities": pa.array(arr[:, 4]),
        "modularity_e9": pa.array(arr[:, 5]),
    })
