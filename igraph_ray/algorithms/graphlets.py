"""Graphlet decomposition of a weighted graph — the engine's
counterpart of the reference's glet.c (igraph_graphlets_candidate_basis
/ igraph_graphlets_project / igraph_graphlets; Azari & Airoldi,
"Graphlet decomposition of a weighted network", AISTATS 2012).

**Candidate basis.** The reference enumerates maximal cliques of the
threshold graphs G_{>=t} by recursing into each clique at its next
internal weight level (glet.c igraph_i_graphlets /
igraph_subclique_next) and tags each clique with its minimum internal
weight (clique_thr). The engine enumerates the same set by a LEVEL
SWEEP: for every distinct edge weight t (ascending), the maximal
cliques of G_{>=t}, each tagged with its min internal weight, then
deduplicated by vertex set. Equivalence: a maximal clique of G_{>=t}
with min internal weight t_C is maximal in every G_{>=s}, s <= t_C, in
which it appears, and same-threshold nested pairs cannot arise (a
nested C ⊂ D with equal min weight would make C non-maximal at every
level where it is a clique), so the reference's post-filter
(igraph_i_graphlets_filter) is a no-op under this enumeration.
Documented deviations: singleton cliques (isolated vertices of a
threshold level) are excluded — their projection weight is 0 by
construction (normfact 1, no edges, mu *= 0); the level count is
bounded by ``max_levels`` (ascending; the reference recursion has the
same exponential worst case, bounded here explicitly).

**Projection.** The reference's EM multiplicative update
(glet.c:716-744): per iteration
    est[e]  = 1e-4 + sum_{cliques c containing edge e} mu_c
    mu_c   *= (sum_{e in c} w[e] / est[e]) / (n_c (n_c + 1) / 2).
Ray shape: the (edge, clique) incidence table is built once, sorted by
packed edge key with explicit boundaries (edges never straddle
blocks), and each iteration is ONE shuffle-free map_batches — est via
per-block reduceat over the contiguous edge groups, per-clique partial
sums via bincount — followed by a driver-side reduce of the
(num_cliques x num_blocks) partials. mu itself is O(basis size), the
algorithm's own output vector (the reference returns exactly this),
so holding it on the driver adds nothing beyond the result."""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.util import hash_join


@dataclasses.dataclass
class GraphletsResult:
    cliques: List[Tuple[int, ...]]  # basis, sorted by mu descending
    mu: np.ndarray                  # projection weights, same order
    thresholds: np.ndarray          # min internal weight per clique


def _weighted_und(graph: Graph) -> ray.data.Dataset:
    """(lo, hi, weight) canonical undirected weighted simple view;
    parallel edges collapse by MAX weight (the threshold view G_{>=t}
    contains an undirected edge iff any parallel copy passes)."""
    import pyarrow.compute as pc

    def _lohi(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        w = (b["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
             if "weight" in b.column_names else np.ones(len(s)))
        keep = s != d
        s, d, w = s[keep], d[keep], w[keep]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        return pa.table({"lo": pa.array(lo, pa.int64()),
                         "hi": pa.array(hi, pa.int64()),
                         "weight": pa.array(w, pa.float64())})

    def _pre(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        return pa.TableGroupBy(b, ["lo", "hi"]).aggregate([("weight", "max")]) \
            .rename_columns(["lo", "hi", "weight"])

    g = graph.edges.map_batches(_lohi, batch_format="pyarrow",
                                batch_size=None) \
        .map_batches(_pre, batch_format="pyarrow", batch_size=None) \
        .groupby(["lo", "hi"]).max("weight")
    return g.map_batches(
        lambda b: pa.table({"lo": b["lo"], "hi": b["hi"],
                            "weight": b["max(weight)"]}),
        batch_format="pyarrow", batch_size=None).materialize()


def graphlets_candidate_basis(
    graph: Graph,
    num_partitions: Optional[int] = None,
    max_levels: int = 32,
) -> Tuple[List[Tuple[int, ...]], np.ndarray]:
    """Returns (cliques, thresholds): the candidate graphlet basis as
    vertex-id tuples (sorted ascending, ordered by threshold then by
    first vertex for determinism) and each clique's min internal
    weight."""
    und = _weighted_und(graph)
    from igraph_ray.algorithms.cliques import maximal_cliques

    # Distinct thresholds, bounded IN-DATASET: the distributed sort +
    # limit keeps the driver pull at <= max_levels rows even when the
    # weight column is continuous (O(|E|) distinct values).
    lvl_rows = (und.groupby("weight").count()
                .sort("weight").limit(max_levels).take_all())
    levels = [r["weight"] for r in lvl_rows]

    seen: set = set()
    for t in levels:
        sub_edges = und.filter(expr=f"weight >= {t!r}")

        def _rn(b: pa.Table) -> pa.Table:
            return pa.table({"src": b["lo"], "dst": b["hi"]})

        sub = Graph(sub_edges.map_batches(_rn, batch_format="pyarrow",
                                          batch_size=None),
                    n=graph.num_vertices() if graph._explicit_n else None)
        cl = maximal_cliques(sub, num_partitions=num_partitions, min_size=2)
        for r in cl.take_all():
            seen.add(tuple(int(v) for v in r["clique"]))

    # per-clique min internal weight via a hash-join of the clique
    # pair-incidence table against the weighted edge table (no
    # driver-resident edge-weight map — the weights stay distributed;
    # only the basis itself is a driver list, the reference's own
    # return contract)
    cliques = sorted(seen)
    if not cliques:
        return [], np.array([], dtype=np.float64)
    los, his, cls = [], [], []
    for ci, cq in enumerate(cliques):
        for i, a in enumerate(cq):
            for b in cq[i + 1:]:
                los.append(a)
                his.append(b)
                cls.append(ci)
    inc = ray.data.from_arrow(pa.table({
        "lo": pa.array(los, pa.int64()), "hi": pa.array(his, pa.int64()),
        "clique": pa.array(cls, pa.int64())}))
    joined = hash_join(inc, und, on=("lo", "hi"),
                       num_partitions=num_partitions or 8)
    thr_rows = joined.groupby("clique").min("weight").take_all()
    thr_by_idx = np.zeros(len(cliques), dtype=np.float64)
    for r in thr_rows:
        thr_by_idx[r["clique"]] = r["min(weight)"]
    order = sorted(range(len(cliques)),
                   key=lambda i: (thr_by_idx[i], cliques[i]))
    return ([cliques[i] for i in order],
            thr_by_idx[np.array(order, dtype=np.int64)]
            if order else np.array([], dtype=np.float64))


def graphlets_project(
    graph: Graph,
    cliques: List[Tuple[int, ...]],
    niter: int = 100,
    num_partitions: int = 8,
    mu0: Optional[np.ndarray] = None,
) -> np.ndarray:
    """EM projection weights mu for a fixed basis (glet.c
    igraph_graphlets_project semantics, startMu supported via mu0)."""
    und = _weighted_und(graph)
    nc = len(cliques)
    mu = (np.ones(nc, dtype=np.float64) if mu0 is None
          else np.asarray(mu0, dtype=np.float64).copy())
    if nc == 0:
        return mu

    # incidence (lo, hi, clique): every internal pair of every clique
    los, his, cls = [], [], []
    for ci, cq in enumerate(cliques):
        for i, a in enumerate(cq):
            for b in cq[i + 1:]:
                los.append(a)
                his.append(b)
                cls.append(ci)
    inc = ray.data.from_arrow(pa.table({
        "lo": pa.array(los, pa.int64()), "hi": pa.array(his, pa.int64()),
        "clique": pa.array(cls, pa.int64())}))
    inc = hash_join(inc, und, on=("lo", "hi"), num_partitions=num_partitions)

    if int(und.max("hi") or 0) >= 2 ** 32:
        raise NotImplementedError(
            "graphlets_project packs (lo,hi) into one int64 sort key and "
            "requires vertex ids < 2^32")

    def _pack(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        key = (lo.astype(np.int64) << np.int64(32)) | hi.astype(np.int64)
        return pa.table({"ekey": pa.array(key, pa.int64()),
                         "clique": b["clique"], "weight": b["weight"]})

    inc = inc.map_batches(_pack, batch_format="pyarrow",
                          batch_size=None).materialize()
    from igraph_ray.csr import compute_boundaries

    bounds = compute_boundaries(inc, num_partitions, col="ekey")
    inc = (inc.sort("ekey", boundaries=bounds) if bounds
           else inc.sort("ekey")).materialize()
    norm = np.array([len(c) * (len(c) + 1) / 2.0 for c in cliques])

    for _ in range(niter):
        mu_ref = ray.put(mu)

        def _partials(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "ekey" not in b.column_names:
                return pa.table({"clique": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.float64())})
            ek = b["ekey"].to_numpy(zero_copy_only=False)
            cq = b["clique"].to_numpy(zero_copy_only=False)
            w = b["weight"].to_numpy(zero_copy_only=False)
            m = ray.get(mu_ref)
            # contiguous edge groups within the block
            brk = np.ones(len(ek), dtype=bool)
            brk[1:] = ek[1:] != ek[:-1]
            gid = np.cumsum(brk) - 1
            est = np.full(gid[-1] + 1, 1e-4)
            np.add.at(est, gid, m[cq])
            ratio = w / est[gid]
            s = np.bincount(cq, weights=ratio, minlength=len(m))
            nz = np.flatnonzero(s)
            return pa.table({"clique": pa.array(nz, pa.int64()),
                             "s": pa.array(s[nz], pa.float64())})

        parts = inc.map_batches(_partials, batch_format="pyarrow",
                                batch_size=None).take_all()
        sumratio = np.zeros(nc)
        for r in parts:
            sumratio[r["clique"]] += r["s"]
        mu = mu * sumratio / norm
    return mu


def graphlets(
    graph: Graph,
    niter: int = 100,
    num_partitions: int = 8,
    max_levels: int = 32,
) -> GraphletsResult:
    """Basis + projection, ordered by decreasing mu (ties by clique for
    determinism) — igraph_graphlets semantics."""
    cliques, thr = graphlets_candidate_basis(
        graph, num_partitions=num_partitions, max_levels=max_levels)
    mu = graphlets_project(graph, cliques, niter=niter,
                           num_partitions=num_partitions)
    order = sorted(range(len(cliques)), key=lambda i: (-mu[i], cliques[i]))
    return GraphletsResult(
        cliques=[cliques[i] for i in order],
        mu=mu[order] if len(order) else mu,
        thresholds=thr[order] if len(order) else thr,
    )
