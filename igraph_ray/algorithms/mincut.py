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


_KARGER_SMALL_INPUT_ROWS = 1 << 20


def _karger_small(rep: ray.data.Dataset, stride: int,
                  trials: int) -> pa.Table:
    """Guarded small-input Karger plan: one Ray task runs every trial
    stripe with Kruskal (sorted by the same (weight, lo, hi) total
    order the Borůvka plan uses) + union-find, splits at the heaviest
    tree edge and evaluates the crossing capacity — value-identical to
    the distributed keyed plan."""
    refs = rep.to_arrow_refs()

    @ray.remote
    def _run(*blocks) -> pa.Table:
        t = pa.concat_tables([b for b in blocks if b.num_rows])
        tr = t["trial"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = t["src"].to_numpy(zero_copy_only=False).astype(np.int64) \
            - tr * stride
        hi = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64) \
            - tr * stride
        cap = t["cap"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = t["weight"].to_numpy(zero_copy_only=False).astype(np.float64)

        def _find(parent: np.ndarray, x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return int(x)

        best_val, best_trial, best_side = None, -1, 0
        for trial in range(trials):
            m = tr == trial
            tlo, thi, tcap, tw = lo[m], hi[m], cap[m], w[m]
            if len(tlo) == 0:
                continue
            order = np.lexsort((thi, tlo, tw))
            parent = np.arange(stride, dtype=np.int64)
            tree = []
            for i in order:
                ra, rb = _find(parent, tlo[i]), _find(parent, thi[i])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
                    tree.append(i)
            if not tree:
                continue
            tree = np.array(tree, dtype=np.int64)
            wmax = tw[tree].max()
            rest = tree[tw[tree] < wmax]
            # union-find over the split forest -> side labels
            parent = np.arange(stride, dtype=np.int64)
            for i in rest:
                ra, rb = _find(parent, tlo[i]), _find(parent, thi[i])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            root = np.array([_find(parent, v) for v in range(stride)],
                            dtype=np.int64)
            cval = float(tcap[root[tlo] != root[thi]].sum())
            if best_val is None or cval < best_val:
                best_val = cval
                best_trial = trial
                # side size over vertices incident to the split forest
                # (matches the distributed plan's component counts)
                if len(rest):
                    vs = np.unique(np.concatenate([tlo[rest], thi[rest]]))
                    _, counts = np.unique(root[vs], return_counts=True)
                    best_side = int(counts.min())
                else:
                    best_side = 0
        if best_val is None:
            best_val, best_trial, best_side = 0.0, -1, 0
        return pa.table({
            "value_e6": pa.array([int(round(best_val * 1e6))], pa.int64()),
            "best_trial": pa.array([best_trial], pa.int64()),
            "side_size": pa.array([best_side], pa.int64())})

    return ray.get(_run.remote(*refs))


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
    with a distinctly sparse cut). Disconnected graphs return value 0.

    All ``trials`` contractions run in ONE keyed execution: each trial
    lives in its own vertex-id stripe (v + trial*N over the shared edge
    stream), so one Borůvka forest run, one tree-split component run and
    one crossing-evaluation join chain cover every trial — the per-trial
    md5 weights (and therefore each trial's cut) are identical to the
    former one-execution-per-trial plan."""
    from igraph_ray.algorithms.components import connected_components
    from igraph_ray.algorithms.mst import minimum_spanning_forest

    und = _canon_capacity(edges, weight_col)
    if und.count() == 0:
        return pa.table({"value_e6": pa.array([0], pa.int64()),
                         "best_trial": pa.array([-1], pa.int64()),
                         "side_size": pa.array([0], pa.int64())})
    stride = int(und.max("hi")) + 1

    def _rep(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        cap = b["cap"].to_numpy(zero_copy_only=False).astype(np.float64)
        m = len(lo)
        t_col, lo_o, hi_o, caps, ws = [], [], [], [], []
        for trial in range(trials):
            # identical per-trial weight contract to the former
            # one-MST-per-trial plan: md5("{trial}:{lo},{hi}")[:15]
            w = np.array(
                [int(hashlib.md5(f"{trial}:{int(a)},{int(c)}".encode())
                     .hexdigest()[:15], 16)
                 for a, c in zip(lo, hi)], dtype=np.int64)
            t_col.append(np.full(m, trial, np.int64))
            lo_o.append(lo + trial * stride)
            hi_o.append(hi + trial * stride)
            caps.append(cap)
            ws.append(w.astype(np.float64))
        return pa.table({
            "trial": pa.array(np.concatenate(t_col)),
            "src": pa.array(np.concatenate(lo_o)),
            "dst": pa.array(np.concatenate(hi_o)),
            "cap": pa.array(np.concatenate(caps)),
            "weight": pa.array(np.concatenate(ws))})

    rep = und.map_batches(_rep, batch_format="pyarrow",
                          batch_size=None).materialize()

    if rep.count() <= _KARGER_SMALL_INPUT_ROWS:
        # Small-input plan (two-plan design like triangles' broadcast
        # path): every trial stripe fits one task — Kruskal under the
        # identical (weight, lo, hi) total order + union-find split.
        # Same md5 weights, same unique forest, same cut values as the
        # distributed plan below.
        return _karger_small(rep, stride, trials)

    # ONE spanning forest of the 8-stripe disjoint union = the 8
    # per-trial MSTs (stripes never share a vertex id).
    mst = minimum_spanning_forest(
        rep.select_columns(["src", "dst", "weight"]),
        weight_col="weight", num_partitions=num_partitions).materialize()
    if mst.count() == 0:
        return pa.table({"value_e6": pa.array([0], pa.int64()),
                         "best_trial": pa.array([-1], pa.int64()),
                         "side_size": pa.array([0], pa.int64())})

    def _tr(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("trial", pa.array(s // stride))

    mst_t = mst.map_batches(_tr, batch_format="pyarrow", batch_size=None)
    wmax = (mst_t.groupby("trial").max("weight")
            .map_batches(lambda b: pa.table({"trial": b["trial"],
                                             "wmax": b["max(weight)"]}),
                         batch_format="pyarrow", batch_size=None))
    # drop each trial's heaviest tree edge -> the two sides per stripe
    rest = (hash_join(mst_t, wmax.materialize(), on="trial",
                      num_partitions=num_partitions)
            .filter(expr="weight < wmax"))
    comp = connected_components(
        Graph(rest.select_columns(["src", "dst"])),
        num_partitions=num_partitions, densify=False).state

    side = comp.map_batches(
        lambda b: pa.table({"src": b["vertex"], "side_lo": b["label"]}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(rep, side.materialize(), on="src",
                  num_partitions=num_partitions, join_type="left_outer")
    side_hi = comp.map_batches(
        lambda b: pa.table({"dst": b["vertex"], "side_hi": b["label"]}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(j, side_hi.materialize(), on="dst",
                  num_partitions=num_partitions, join_type="left_outer")

    def _crossing(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"trial": pa.array([], pa.int64()),
                             "c": pa.array([], pa.float64())})
        cap = b["cap"].to_numpy(zero_copy_only=False)
        tr = b["trial"].to_numpy(zero_copy_only=False)
        if "side_lo" not in b.column_names:
            # empty comp side: every vertex is its own singleton side,
            # so every capacity edge crosses
            return pa.table({"trial": pa.array(tr), "c": pa.array(cap)})
        slo = b["side_lo"].to_numpy(zero_copy_only=False)
        shi = b["side_hi"].to_numpy(zero_copy_only=False)
        # vertices absent from `rest` (singleton sides) keep null ->
        # treated as their own side via nan != anything
        slo = np.where(np.isnan(slo.astype(np.float64)), -1.0,
                       slo.astype(np.float64))
        shi = np.where(np.isnan(shi.astype(np.float64)), -2.0,
                       shi.astype(np.float64))
        cross = slo != shi
        return pa.table({"trial": pa.array(tr[cross]),
                         "c": pa.array(cap[cross])})

    cuts = {int(r["trial"]): float(r["sum(c)"])
            for r in (j.map_batches(_crossing, batch_format="pyarrow",
                                    batch_size=None)
                      .groupby("trial").sum("c").take_all())}
    # side sizes: per (trial, label) counts -> min count per trial
    sides = {}
    for r in (comp.map_batches(
            lambda b: pa.table({
                "trial": pc.divide(b["vertex"], stride),
                "label": b["label"]}),
            batch_format="pyarrow", batch_size=None)
            .groupby(["trial", "label"]).count()
            .groupby("trial").min("count()").take_all()):
        sides[int(r["trial"])] = int(r["min(count())"])

    best_val, best_trial = None, -1
    for trial in range(trials):
        cval = cuts.get(trial, 0.0)
        if best_val is None or cval < best_val:
            best_val = cval
            best_trial = trial
    if best_val is None:
        best_val, best_trial = 0.0, -1
    best_side = sides.get(best_trial, 0)
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
