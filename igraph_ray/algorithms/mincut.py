"""Global minimum cut / global edge connectivity.

Reference semantics: igraph_mincut / igraph_edge_connectivity
(/root/reference/src/flow.c:1582-2352) — the minimum total capacity of
edges whose removal disconnects the (undirected view of the) graph. The
reference runs Stoer–Wagner-style phases; a Ray-native engine offers two
paths:

* **Exact path** (small graphs, the reference-parity mode): fix
  s = the smallest vertex id and take ``min over t ≠ s`` of the s-t
  max-flow on the symmetrized capacity graph — for undirected graphs
  every global cut separates s from some t, so n−1 flows suffice
  (the classic reduction flow.c uses for the directed case). Each flow
  runs on the existing distributed push-relabel (algorithms/flow.py).
  Guarded to ≤ ``exact_vertex_limit`` vertices: n−1 sequential flows is
  the honest exact ceiling, like the maximal-cliques broadcast plan.

* **Karger sampling path** (scale mode): one trial of Karger's
  contraction (public algorithm, Karger 1993) is equivalent to building
  a minimum spanning tree under i.i.d. random edge weights and cutting
  its heaviest edge — so each trial reuses the distributed Borůvka MST
  (algorithms/mst.py) with md5-deterministic per-trial weights, splits
  the tree at the heaviest edge via connected components of the
  remainder, and evaluates the crossing capacity with one join +
  aggregate. The minimum over trials is an upper bound that finds a
  planted sparse cut with high probability (concentration pytest);
  rows-only at the driver gate by design.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.util import hash_join


def _canon_capacity(edges: ray.data.Dataset, weight_col: Optional[str]):
    """Undirected view: per unordered pair the SUMMED capacity (parallel
    edges add, flow.c capacity semantics), loops dropped."""

    def _p(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = (b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
             if weight_col else np.ones(len(src), np.float64))
        keep = src != dst
        src, dst, w = src[keep], dst[keep], w[keep]
        return pa.table({"lo": pa.array(np.minimum(src, dst)),
                         "hi": pa.array(np.maximum(src, dst)),
                         "cap": pa.array(w)})

    return (edges.map_batches(_p, batch_format="pyarrow", batch_size=None)
            .groupby(["lo", "hi"]).sum("cap")
            .map_batches(lambda b: pa.table({"lo": b["lo"], "hi": b["hi"],
                                             "cap": b["sum(cap)"]}),
                         batch_format="pyarrow", batch_size=None)
            .materialize())


def global_mincut_exact(
    edges: ray.data.Dataset,
    weight_col: Optional[str] = None,
    num_partitions: int = 4,
    exact_vertex_limit: int = 512,
) -> Tuple[float, int]:
    """Exact global min cut of the undirected capacity view. Returns
    (value, best_t) where best_t is the sink of the minimizing s-t flow.
    Disconnected graphs return (0.0, -1)."""
    from igraph_ray.algorithms.components import connected_components
    from igraph_ray.algorithms.flow import maxflow

    und = _canon_capacity(edges, weight_col)
    if und.count() == 0:
        return 0.0, -1

    def _verts(b: pa.Table) -> pa.Table:
        v = np.unique(np.concatenate([
            b["lo"].to_numpy(zero_copy_only=False),
            b["hi"].to_numpy(zero_copy_only=False)]))
        return pa.table({"v": pa.array(v)})

    vset = (und.map_batches(_verts, batch_format="pyarrow",
                            batch_size=None)
            .groupby("v").count().select_columns(["v"]).materialize())
    nv = vset.count()
    if nv > exact_vertex_limit:
        # guard BEFORE anything lands on the driver
        raise NotImplementedError(
            f"exact global mincut is guarded to {exact_vertex_limit} "
            f"vertices ({nv} present) — use global_mincut_karger for the "
            f"sampling scale path")
    verts = np.sort(np.concatenate([
        b["v"].to_numpy(zero_copy_only=False)
        for b in vset.iter_batches(batch_format="pyarrow")]))
    if nv < 2:
        return 0.0, -1

    # disconnected -> cut value 0
    comp = connected_components(Graph(und.map_batches(
        lambda b: pa.table({"src": b["lo"], "dst": b["hi"]}),
        batch_format="pyarrow", batch_size=None)),
        num_partitions=num_partitions, densify=True).state
    ncomp = comp.groupby("label").count().count()
    if ncomp > 1:
        return 0.0, -1

    def _sym(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        cap = b["cap"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([lo, hi])),
            "dst": pa.array(np.concatenate([hi, lo])),
            "capacity": pa.array(np.concatenate([cap, cap])),
        })

    arcs = und.map_batches(_sym, batch_format="pyarrow",
                           batch_size=None).materialize()
    s = int(verts[0])
    n = int(verts[-1]) + 1
    best = float("inf")
    best_t = -1
    for t in verts[1:]:
        res = maxflow(arcs, s, int(t), n=n, num_partitions=num_partitions)
        if res.value < best:
            best = float(res.value)
            best_t = int(t)
    return best, best_t


def global_edge_connectivity(
    edges: ray.data.Dataset,
    num_partitions: int = 4,
    exact_vertex_limit: int = 512,
) -> int:
    """igraph_edge_connectivity (flow.c:2122, undirected unweighted
    view): global mincut with unit capacities."""
    val, _ = global_mincut_exact(edges, weight_col=None,
                                 num_partitions=num_partitions,
                                 exact_vertex_limit=exact_vertex_limit)
    return int(round(val))


def _trial_weights(und: ray.data.Dataset, trial: int) -> ray.data.Dataset:
    def _w(b: pa.Table, trial=trial) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        w = np.array(
            [int(hashlib.md5(f"{trial}:{int(a)},{int(c)}".encode())
                 .hexdigest()[:15], 16)
             for a, c in zip(lo, hi)], dtype=np.int64).astype(np.float64)
        return pa.table({"src": b["lo"], "dst": b["hi"],
                         "weight": pa.array(w)})

    return und.map_batches(_w, batch_format="pyarrow", batch_size=None)


def global_mincut_karger(
    edges: ray.data.Dataset,
    trials: int = 8,
    weight_col: Optional[str] = None,
    num_partitions: int = 8,
) -> pa.Table:
    """Karger-sampled global min cut: per trial, MST under md5(trial,
    edge) weights, cut at the heaviest tree edge, crossing capacity via
    one join. Returns a 1-row table (value_e6:int64, best_trial:int64,
    side_size:int64) — the minimum over trials (an upper bound on the
    true cut, exact with probability growing in ``trials`` for graphs
    with a distinctly sparse cut). Disconnected graphs return value 0."""
    from igraph_ray.algorithms.components import connected_components
    from igraph_ray.algorithms.mst import minimum_spanning_forest

    und = _canon_capacity(edges, weight_col)
    if und.count() == 0:
        return pa.table({"value_e6": pa.array([0], pa.int64()),
                         "best_trial": pa.array([-1], pa.int64()),
                         "side_size": pa.array([0], pa.int64())})

    best_val = None
    best_trial = -1
    best_side = 0
    for trial in range(trials):
        wed = _trial_weights(und, trial)
        mst = minimum_spanning_forest(wed, weight_col="weight",
                                      num_partitions=num_partitions
                                      ).materialize()
        if mst.count() == 0:
            continue
        wmax = mst.max("weight")
        rest = mst.filter(expr=f"weight < {wmax!r}")
        # components of the tree minus its heaviest edge = the two sides
        # (multiple components when the input itself is disconnected —
        # then the true mincut is 0 and any split crosses nothing)
        comp = connected_components(
            Graph(rest.select_columns(["src", "dst"])),
            num_partitions=num_partitions, densify=False).state

        side = comp.map_batches(
            lambda b: pa.table({"lo": b["vertex"], "side_lo": b["label"]}),
            batch_format="pyarrow", batch_size=None)
        j = hash_join(und, side.materialize(), on="lo",
                      num_partitions=num_partitions, join_type="left_outer")
        side_hi = comp.map_batches(
            lambda b: pa.table({"hi": b["vertex"], "side_hi": b["label"]}),
            batch_format="pyarrow", batch_size=None)
        j = hash_join(j, side_hi.materialize(), on="hi",
                      num_partitions=num_partitions, join_type="left_outer")

        def _crossing(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "side_lo" not in b.column_names:
                return pa.table({"c": pa.array([], pa.float64())})
            slo = b["side_lo"].to_numpy(zero_copy_only=False)
            shi = b["side_hi"].to_numpy(zero_copy_only=False)
            cap = b["cap"].to_numpy(zero_copy_only=False)
            # vertices absent from `rest` (singleton sides) keep null ->
            # treated as their own side via nan != anything
            slo = np.where(np.isnan(slo.astype(np.float64)), -1.0,
                           slo.astype(np.float64))
            shi = np.where(np.isnan(shi.astype(np.float64)), -2.0,
                           shi.astype(np.float64))
            return pa.table({"c": pa.array(cap[slo != shi])})

        cval = j.map_batches(_crossing, batch_format="pyarrow",
                             batch_size=None).sum("c")
        cval = float(cval) if cval is not None else 0.0
        if best_val is None or cval < best_val:
            best_val = cval
            best_trial = trial
            side_counts = comp.groupby("label").count()
            best_side = int(side_counts.min("count()")) \
                if side_counts.count() else 0
    if best_val is None:
        best_val, best_trial, best_side = 0.0, -1, 0
    return pa.table({
        "value_e6": pa.array([int(round(best_val * 1e6))], pa.int64()),
        "best_trial": pa.array([best_trial], pa.int64()),
        "side_size": pa.array([best_side], pa.int64()),
    })


def mincut_value(edges: ray.data.Dataset,
                 weight_col=None, num_partitions: int = 4) -> float:
    """igraph_mincut_value (flow.c): the global min-cut weight only."""
    return global_mincut_exact(edges, weight_col=weight_col,
                               num_partitions=num_partitions)[0]
