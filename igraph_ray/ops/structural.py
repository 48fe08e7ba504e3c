"""Structural measures beyond the four north-star algorithms
(SURVEY.md §2.6, §2.7, §2.13): transitivity, cocitation/bibcoupling,
neighbor-set similarity, degree assortativity, DAG test / topological
peeling, k-core. All Dataset DAGs built from the same primitives as
triangles (canonical simple edges, degree tables, wedge generation).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from igraph_ray.csr import compute_boundaries
from igraph_ray.graph import Graph, _degrees_over
from igraph_ray.superstep import _aggregate
from igraph_ray.util import hash_join, universe_zeros


def transitivity_undirected(graph: Graph, num_partitions: int = 8) -> float:
    """Global clustering coefficient: 3·triangles / connected triples
    (igraph_transitivity_undirected, triangles.c:617-700)."""
    from igraph_ray.algorithms.triangles import triangle_counts

    tri = triangle_counts(graph, num_partitions=num_partitions).materialize()
    tri_sum = _aggregate(tri, ["triangles"])["triangles"]  # counts each triangle 3×

    und = graph.canonical_undirected()

    def _lo(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["lo"]})

    def _hi(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["hi"]})

    degs = (
        und.map_batches(_lo, batch_format="pyarrow", batch_size=None)
        .union(und.map_batches(_hi, batch_format="pyarrow", batch_size=None))
        .groupby("vertex")
        .count()
    )

    def _triples(b: pa.Table) -> pa.Table:
        d = b["count()"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"triples": pa.array(d * (d - 1) / 2.0, pa.float64())})

    tr = degs.map_batches(_triples, batch_format="pyarrow", batch_size=None).materialize()
    triples = _aggregate(tr, ["triples"])["triples"]
    if triples == 0:
        return float("nan")
    return tri_sum / triples


def transitivity_local(graph: Graph, num_partitions: int = 8) -> ray.data.Dataset:
    """(vertex, cc_local): 2·tri[v]/(deg(deg-1)); NaN for deg<2
    (igraph_transitivity_local_undirected, triangles.c:430-505)."""
    from igraph_ray.algorithms.triangles import triangle_counts

    tri = triangle_counts(graph, num_partitions=num_partitions)
    und = graph.canonical_undirected()

    def _lo(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["lo"]})

    def _hi(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["hi"]})

    degs = (
        und.map_batches(_lo, batch_format="pyarrow", batch_size=None)
        .union(und.map_batches(_hi, batch_format="pyarrow", batch_size=None))
        .union(universe_zeros(graph.vertices(), "pad").map_batches(
            lambda b: pa.table({"vertex": b["vertex"]}), batch_format="pyarrow", batch_size=None))
        .groupby("vertex")
        .count()
    )
    j = hash_join(tri, degs, on="vertex", num_partitions=num_partitions)

    def _cc(b: pa.Table) -> pa.Table:
        t = b["triangles"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = (b["count()"].to_numpy(zero_copy_only=False) - 1).astype(np.float64)  # pad row
        denom = d * (d - 1)
        cc = np.where(denom > 0, 2.0 * t / np.where(denom > 0, denom, 1.0), np.nan)
        return pa.table({"vertex": b["vertex"], "cc_local": pa.array(cc, pa.float64())})

    return j.map_batches(_cc, batch_format="pyarrow", batch_size=None)


def local_scan1(graph: Graph, num_partitions: int = 8) -> ray.data.Dataset:
    """(vertex, scan1): local scan-1 statistic — edges inside the closed
    neighborhood N[v] of the simple undirected view
    (igraph_local_scan_1_ecount, scan.c:347-365; scan-0 is just degree,
    scan.c:54-64). For a simple undirected graph the edges of G[N[v]]
    split into deg(v) edges incident to v plus one edge per triangle
    through v, so scan1 = deg + triangles — both already distributed
    kernels. Isolated vertices score 0.
    """
    from igraph_ray.algorithms.triangles import triangle_counts

    tri = triangle_counts(graph, num_partitions=num_partitions)
    und = graph.canonical_undirected()

    def _lo(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["lo"]})

    def _hi(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["hi"]})

    degs = (
        und.map_batches(_lo, batch_format="pyarrow", batch_size=None)
        .union(und.map_batches(_hi, batch_format="pyarrow", batch_size=None))
        .union(universe_zeros(graph.vertices(), "pad").map_batches(
            lambda b: pa.table({"vertex": b["vertex"]}), batch_format="pyarrow", batch_size=None))
        .groupby("vertex")
        .count()
    )
    j = hash_join(tri, degs, on="vertex", num_partitions=num_partitions)

    def _s1(b: pa.Table) -> pa.Table:
        t = b["triangles"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = (b["count()"].to_numpy(zero_copy_only=False) - 1).astype(np.int64)  # pad row
        return pa.table({"vertex": b["vertex"], "scan1": pa.array(d + t, pa.int64())})

    return j.map_batches(_s1, batch_format="pyarrow", batch_size=None)


def _common_neighbor_pairs(
    edges: ray.data.Dataset, key: str, other: str, num_partitions: int
) -> ray.data.Dataset:
    """(a, b, common): number of shared ``key``-side neighbors for every
    pair of ``other``-side vertices — the wedge self-join underlying
    cocitation/bibcoupling (cocitation.c:39-702)."""
    bnds = compute_boundaries(edges, num_partitions, col=key)
    s = edges.sort(key, boundaries=bnds) if bnds else edges.sort(key)

    def _pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})
        u = b[key].to_numpy(zero_copy_only=False)
        v = b[other].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        grp = np.empty(len(u), dtype=bool)
        grp[0] = True
        np.not_equal(u[1:], u[:-1], out=grp[1:])
        gid = np.cumsum(grp) - 1
        starts = np.flatnonzero(grp)
        ends = np.append(starts[1:], len(u))
        gend = ends[gid]
        cnt = gend - np.arange(len(u)) - 1
        total = int(cnt.sum())
        if total == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})
        a_idx = np.repeat(np.arange(len(u)), cnt)
        off = np.zeros(len(cnt), dtype=np.int64)
        np.cumsum(cnt[:-1], out=off[1:])
        b_idx = np.arange(total, dtype=np.int64) - np.repeat(off, cnt) + a_idx + 1
        raw = pa.table({"a": pa.array(v[a_idx], pa.int64()), "b": pa.array(v[b_idx], pa.int64())})
        # per-block combiner: the raw wedge stream is |wedges| rows but at
        # most |distinct pairs| survive the count — pre-aggregate before
        # the wide groupby so the shuffle moves counts, not wedges
        return pa.TableGroupBy(raw, ["a", "b"]).aggregate([([], "count_all")]) \
            .rename_columns(["a", "b", "cnt"])

    pairs = s.map_batches(_pairs, batch_format="pyarrow", batch_size=None)
    g = pairs.groupby(["a", "b"]).sum("cnt")

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table({"a": b["a"], "b": b["b"], "common": b["sum(cnt)"]})

    return g.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def cocitation(graph: Graph, num_partitions: int = 8) -> ray.data.Dataset:
    """(a, b, common) a<b: # vertices citing both a and b (common
    in-neighbors; igraph_cocitation, cocitation.c:39). Self-pairs and
    duplicate neighbors excluded via the simple-edge view."""
    from igraph_ray.ops.relational import simplify

    edges = simplify(graph.edges)  # distinct, loop-free
    return _common_neighbor_pairs(edges, "src", "dst", num_partitions)


def bibcoupling(graph: Graph, num_partitions: int = 8) -> ray.data.Dataset:
    """(a, b, common) a<b: # vertices both a and b cite (common
    out-neighbors; igraph_bibcoupling, cocitation.c)."""
    from igraph_ray.ops.relational import simplify

    edges = simplify(graph.edges)
    return _common_neighbor_pairs(edges, "dst", "src", num_partitions)


def neighbor_jaccard(graph: Graph, num_partitions: int = 8) -> ray.data.Dataset:
    """(a, b, common, jaccard_e9) over undirected neighbor sets for pairs
    with ≥1 common neighbor (igraph_similarity_jaccard, cocitation.c)."""
    sym = graph.symmetrized(drop_loops=True)
    from igraph_ray.ops.relational import _dedup

    sym = _dedup(sym)
    common = _common_neighbor_pairs(sym, "src", "dst", num_partitions)
    deg = _degrees_over(sym, "src", graph.vertices(), False)

    def _da(b: pa.Table) -> pa.Table:
        return pa.table({"a": b["vertex"], "deg_a": b["deg"]})

    def _db(b: pa.Table) -> pa.Table:
        return pa.table({"b": b["vertex"], "deg_b": b["deg"]})

    j = hash_join(common, deg.map_batches(_da, batch_format="pyarrow", batch_size=None),
                  on="a", num_partitions=num_partitions)
    j = hash_join(j, deg.map_batches(_db, batch_format="pyarrow", batch_size=None),
                  on="b", num_partitions=num_partitions)

    def _jac(b: pa.Table) -> pa.Table:
        c = b["common"].to_numpy(zero_copy_only=False).astype(np.float64)
        da = b["deg_a"].to_numpy(zero_copy_only=False)
        db = b["deg_b"].to_numpy(zero_copy_only=False)
        union = da + db - c
        jac = np.where(union > 0, c / np.where(union > 0, union, 1.0), 0.0)
        return pa.table(
            {"a": b["a"], "b": b["b"], "common": b["common"],
             "jaccard_e9": pa.array(np.round(jac * 1e9).astype(np.int64), pa.int64())}
        )

    return j.map_batches(_jac, batch_format="pyarrow", batch_size=None)


def degree_assortativity(graph: Graph, num_partitions: int = 8) -> float:
    """Pearson correlation of (out-deg(src), in-deg(dst)) over directed
    edges — igraph_assortativity_degree semantics for directed graphs
    (mixing.c:28-247, with the reference's deg-1 convention off; plain
    degree correlation, documented)."""
    edges = graph.without_loops()
    odeg = _degrees_over(edges, "src", graph.vertices(), False)
    ideg = _degrees_over(edges, "dst", graph.vertices(), False)

    def _ra(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["vertex"], "dx": b["deg"]})

    def _rb(b: pa.Table) -> pa.Table:
        return pa.table({"dst": b["vertex"], "dy": b["deg"]})

    j = hash_join(edges, odeg.map_batches(_ra, batch_format="pyarrow", batch_size=None),
                  on="src", num_partitions=num_partitions)
    j = hash_join(j, ideg.map_batches(_rb, batch_format="pyarrow", batch_size=None),
                  on="dst", num_partitions=num_partitions)

    def _moments(b: pa.Table) -> pa.Table:
        x = b["dx"].to_numpy(zero_copy_only=False)
        y = b["dy"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([float(len(x))], pa.float64()),
            "sx": pa.array([x.sum()], pa.float64()),
            "sy": pa.array([y.sum()], pa.float64()),
            "sxx": pa.array([(x * x).sum()], pa.float64()),
            "syy": pa.array([(y * y).sum()], pa.float64()),
            "sxy": pa.array([(x * y).sum()], pa.float64()),
        })

    m = j.map_batches(_moments, batch_format="pyarrow", batch_size=None).materialize()
    s = _aggregate(m, ["n", "sx", "sy", "sxx", "syy", "sxy"])
    n = s["n"]
    if n == 0:
        return float("nan")
    cov = s["sxy"] / n - (s["sx"] / n) * (s["sy"] / n)
    vx = s["sxx"] / n - (s["sx"] / n) ** 2
    vy = s["syy"] / n - (s["sy"] / n) ** 2
    if vx <= 0 or vy <= 0:
        return float("nan")
    return cov / np.sqrt(vx * vy)


def k_core(graph: Graph, k: int, max_iter: int = 10_000, num_partitions: int = 8) -> ray.data.Dataset:
    """Vertices of the k-core: undirected simple-graph view, vertices
    whose coreness is >= k (cores.c:31 — the k-core IS the coreness>=k
    filter). Computed by the h-operator superstep fixpoint
    (algorithms/kcore.py) over the canonical lo<hi deduped edge set —
    no per-round driver peeling loop anywhere. Returns (vertex,)."""
    from igraph_ray.algorithms.kcore import coreness
    from igraph_ray.ops.relational import _dedup

    # canonical one-direction simple view: coreness's sym CSR emits each
    # undirected edge once per direction, i.e. the simple-graph degrees
    def _canon(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        return pa.table({"src": pa.array(np.minimum(src, dst)),
                         "dst": pa.array(np.maximum(src, dst))})

    canon = _dedup(graph.edges.map_batches(_canon, batch_format="pyarrow",
                                           batch_size=None)).materialize()
    if canon.count() == 0:
        return ray.data.from_arrow(pa.table({"vertex": pa.array([], pa.int64())}))
    simple = Graph(canon)
    state = coreness(simple, num_partitions=num_partitions,
                     max_iter=max_iter).state
    out = (state.filter(expr=f"coreness >= {k}")
           .select_columns(["vertex"]).materialize())
    if out.count() == 0:
        return ray.data.from_arrow(pa.table({"vertex": pa.array([], pa.int64())}))
    return out


# ----------------------------------------------------- similarity family


def _neighbor_overlap(graph: Graph, num_partitions: int = 8) -> ray.data.Dataset:
    """(a, b, common, deg_a, deg_b) over the simple undirected neighbor
    sets, pairs with ≥1 common neighbor — shared base for Jaccard/Dice
    (igraph_similarity_jaccard / igraph_similarity_dice, cocitation.c:
    276-375 and 455-530; dice = 2J/(1+J) of the same overlap counts).

    Endpoint degrees ride INLINE through the wedge self-join: one degree
    join on the |E| edge table before the expansion (the ilw pattern),
    not two joins on the (larger) pair stream afterwards — the round-1
    fixed-cost finding on this family."""
    sym = graph.symmetrized(drop_loops=True)
    from igraph_ray.ops.relational import _dedup

    sym = _dedup(sym)
    deg = _degrees_over(sym, "src", graph.vertices(), False)

    import pyarrow.compute as pc

    def _dv(b: pa.Table) -> pa.Table:
        return pa.table({"dst": b["vertex"],
                         "dv": pc.cast(b["deg"], pa.int64())})

    dtab = deg.map_batches(_dv, batch_format="pyarrow", batch_size=None)
    we = hash_join(sym, dtab, on="dst", num_partitions=num_partitions)

    bnds = compute_boundaries(we, num_partitions, col="src")
    s = we.sort("src", boundaries=bnds) if bnds else we.sort("src")

    def _pairs(b: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "deg_a": pa.array([], pa.int64()),
                          "deg_b": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        if b.num_rows == 0 or "src" not in b.column_names:
            return empty
        u = b["src"].to_numpy(zero_copy_only=False)
        v = b["dst"].to_numpy(zero_copy_only=False)
        w = b["dv"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v, w = u[order], v[order], w[order]
        grp = np.empty(len(u), dtype=bool)
        grp[0] = True
        np.not_equal(u[1:], u[:-1], out=grp[1:])
        gid = np.cumsum(grp) - 1
        starts = np.flatnonzero(grp)
        ends = np.append(starts[1:], len(u))
        gend = ends[gid]
        cnt = gend - np.arange(len(u)) - 1
        total = int(cnt.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(len(u)), cnt)
        off = np.zeros(len(cnt), dtype=np.int64)
        np.cumsum(cnt[:-1], out=off[1:])
        b_idx = np.arange(total, dtype=np.int64) - np.repeat(off, cnt) + a_idx + 1
        raw = pa.table({"a": pa.array(v[a_idx], pa.int64()),
                        "b": pa.array(v[b_idx], pa.int64()),
                        "deg_a": pa.array(w[a_idx], pa.int64()),
                        "deg_b": pa.array(w[b_idx], pa.int64())})
        # deg_a/deg_b are functions of a/b, so grouping on all four keys
        # is the same partition as (a, b) — the combiner stays exact
        return pa.TableGroupBy(raw, ["a", "b", "deg_a", "deg_b"]) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["a", "b", "deg_a", "deg_b", "cnt"])

    pairs = s.map_batches(_pairs, batch_format="pyarrow", batch_size=None)
    g = pairs.groupby(["a", "b", "deg_a", "deg_b"]).sum("cnt")

    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "a" not in b.column_names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "common": pa.array([], pa.int64()),
                             "deg_a": pa.array([], pa.int64()),
                             "deg_b": pa.array([], pa.int64())})
        return pa.table({"a": b["a"], "b": b["b"],
                         "common": b["sum(cnt)"],
                         "deg_a": b["deg_a"], "deg_b": b["deg_b"]})

    return g.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def similarity_dice(graph: Graph, num_partitions: int = 8) -> ray.data.Dataset:
    """(a, b, common, dice_e9) a<b over undirected simple neighbor sets,
    pairs with ≥1 common neighbor: dice = 2·common/(deg_a+deg_b)
    (igraph_similarity_dice, cocitation.c:455-530)."""
    j = _neighbor_overlap(graph, num_partitions)

    def _dice(b: pa.Table) -> pa.Table:
        c = b["common"].to_numpy(zero_copy_only=False).astype(np.float64)
        da = b["deg_a"].to_numpy(zero_copy_only=False)
        db = b["deg_b"].to_numpy(zero_copy_only=False)
        den = (da + db).astype(np.float64)
        dice = np.where(den > 0, 2.0 * c / np.where(den > 0, den, 1.0), 0.0)
        return pa.table(
            {"a": b["a"], "b": b["b"], "common": b["common"],
             "dice_e9": pa.array(np.round(dice * 1e9).astype(np.int64), pa.int64())}
        )

    return j.map_batches(_dice, batch_format="pyarrow", batch_size=None)


def similarity_inverse_log_weighted(
    graph: Graph, num_partitions: int = 8
) -> ray.data.Dataset:
    """(a, b, sim_e9) a<b: common-neighbor similarity where each shared
    neighbor u contributes 1/ln(deg(u)) — hubs count less
    (igraph_similarity_inverse_log_weighted, cocitation.c:159-185; the
    reference keeps weight = deg for deg ≤ 1, i.e. deg-1 neighbors weigh
    1.0).  Computed over the simple undirected neighbor sets (mode ALL);
    only pairs with ≥1 common neighbor are emitted.

    Dataflow: degree table → per-vertex weight column → broadcast-join
    onto the edge list keyed by the wedge center → the same range-sorted
    wedge expansion as cocitation, summing w(center) per (a, b) with a
    per-block pre-combine before the groupby.

    Weights are quantized to integers at 1e-9 resolution BEFORE the sum,
    so the distributed reduction is associative-exact: the result is
    bit-identical at any partitioning / cluster size (and exactly
    mirrored by the SQL oracle)."""
    sym = graph.symmetrized(drop_loops=True)
    from igraph_ray.ops.relational import _dedup

    sym = _dedup(sym)
    deg = _degrees_over(sym, "src", graph.vertices(), False)

    def _w(b: pa.Table) -> pa.Table:
        d = b["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.where(d > 1, 1.0 / np.log(np.where(d > 1, d, 2.0)), d)
        wq = np.round(w * 1e9).astype(np.int64)
        return pa.table({"src": b["vertex"], "w": pa.array(wq, pa.int64())})

    wtab = deg.map_batches(_w, batch_format="pyarrow", batch_size=None)
    we = hash_join(sym, wtab, on="src", num_partitions=num_partitions)

    bnds = compute_boundaries(we, num_partitions, col="src")
    s = we.sort("src", boundaries=bnds) if bnds else we.sort("src")

    def _pairs(b: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "s": pa.array([], pa.int64())})
        if b.num_rows == 0 or "src" not in b.column_names:
            return empty
        u = b["src"].to_numpy(zero_copy_only=False)
        v = b["dst"].to_numpy(zero_copy_only=False)
        w = b["w"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v, w = u[order], v[order], w[order]
        grp = np.empty(len(u), dtype=bool)
        grp[0] = True
        np.not_equal(u[1:], u[:-1], out=grp[1:])
        gid = np.cumsum(grp) - 1
        starts = np.flatnonzero(grp)
        ends = np.append(starts[1:], len(u))
        gend = ends[gid]
        cnt = gend - np.arange(len(u)) - 1
        total = int(cnt.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(len(u)), cnt)
        off = np.zeros(len(cnt), dtype=np.int64)
        np.cumsum(cnt[:-1], out=off[1:])
        b_idx = np.arange(total, dtype=np.int64) - np.repeat(off, cnt) + a_idx + 1
        raw = pa.table({"a": pa.array(v[a_idx], pa.int64()),
                        "b": pa.array(v[b_idx], pa.int64()),
                        "s": pa.array(w[a_idx], pa.int64())})
        return pa.TableGroupBy(raw, ["a", "b"]).aggregate([("s", "sum")]) \
            .rename_columns(["a", "b", "s"])

    pairs = s.map_batches(_pairs, batch_format="pyarrow", batch_size=None)
    g = pairs.groupby(["a", "b"]).sum("s")

    def _rn(b: pa.Table) -> pa.Table:
        sim = b["sum(s)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"a": b["a"], "b": b["b"],
                         "sim_e9": pa.array(sim, pa.int64())})

    return g.map_batches(_rn, batch_format="pyarrow", batch_size=None)


# ------------------------------------------- degree-neighborhood family


def avg_neighbor_degree(graph: Graph, num_partitions: int = 8):
    """((vertex, knn_e9), (deg, knnk_e9)): average nearest-neighbor
    degree per vertex and its average over vertices of equal degree
    (igraph_avg_nearest_neighbor_degree, structural_properties.c; simple
    graphs, mode ALL, so each directed edge contributes its opposite
    endpoint's ALL-degree to both sides).  Isolated vertices (NaN in the
    reference) are omitted."""
    edges = graph.without_loops()

    def _ends(b: pa.Table) -> pa.Table:
        v = np.concatenate([
            b["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)])
        return pa.table({"vertex": pa.array(v)})

    deg = edges.map_batches(_ends, batch_format="pyarrow", batch_size=None) \
        .groupby("vertex").count()
    deg = deg.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "deg": b["count()"]}),
        batch_format="pyarrow", batch_size=None).materialize()

    def _dd(b: pa.Table) -> pa.Table:
        return pa.table({"dst": b["vertex"], "deg_d": b["deg"]})

    def _ds(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["vertex"], "deg_s": b["deg"]})

    j = hash_join(edges, deg.map_batches(_dd, batch_format="pyarrow", batch_size=None),
                  on="dst", num_partitions=num_partitions)
    j = hash_join(j, deg.map_batches(_ds, batch_format="pyarrow", batch_size=None),
                  on="src", num_partitions=num_partitions)

    def _contrib(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "src" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64())})
        t = pa.table({
            "vertex": pa.array(np.concatenate([
                b["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)])),
            "s": pa.array(np.concatenate([
                b["deg_d"].to_numpy(zero_copy_only=False).astype(np.float64),
                b["deg_s"].to_numpy(zero_copy_only=False).astype(np.float64)])),
        })
        return pa.TableGroupBy(t, ["vertex"]).aggregate([("s", "sum")]) \
            .rename_columns(["vertex", "s"])

    sums = j.map_batches(_contrib, batch_format="pyarrow", batch_size=None) \
        .groupby("vertex").sum("s")
    sums = sums.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "s": b["sum(s)"]}),
        batch_format="pyarrow", batch_size=None)
    knn = hash_join(sums, deg, on="vertex", num_partitions=num_partitions)

    def _knn(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy(zero_copy_only=False)
        d = b["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        val = s / d
        return pa.table({"vertex": b["vertex"],
                         "deg": b["deg"],
                         "knn_e9": pa.array(np.round(val * 1e9).astype(np.int64),
                                            pa.int64())})

    return knn.map_batches(_knn, batch_format="pyarrow", batch_size=None)


def knnk(graph: Graph, num_partitions: int = 8) -> ray.data.Dataset:
    """(deg, knnk_e9): avg_neighbor_degree averaged over vertices of
    equal ALL-degree (the knnk output of
    igraph_avg_nearest_neighbor_degree).  The mean is computed on the
    1e-9-quantized knn values in exact integer arithmetic (half-up via
    (2·Σ + n) div 2n), so it is associative-exact and oracle-matched."""
    knn = avg_neighbor_degree(graph, num_partitions)

    g = knn.groupby("deg").aggregate(
        ray.data.aggregate.Sum("knn_e9", alias_name="S"),
        ray.data.aggregate.Count(alias_name="n"),
    )

    def _rn(b: pa.Table) -> pa.Table:
        s = b["S"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        val = (2 * s + n) // (2 * n)
        return pa.table({"deg": b["deg"],
                         "knnk_e9": pa.array(val, pa.int64())})

    return g.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def diversity(graph: Graph, num_partitions: int = 8) -> ray.data.Dataset:
    """(vertex, div_e9): Shannon entropy of incident edge weights scaled
    by log(degree) — (ln Σw − Σ(w·ln w)/Σw) / ln k over the k incident
    edges, both directions (igraph_diversity,
    structural_properties.c).  The reference's k ≤ 1 cases are NaN by
    IEEE arithmetic; here they are emitted as 0 (documented deviation so
    the integer-scaled driver compare stays exact)."""
    edges = graph.without_loops()
    wcol = "weight" if graph.weighted else None

    def _inc(b: pa.Table) -> pa.Table:
        w = (b[wcol].to_numpy(zero_copy_only=False).astype(np.float64)
             if wcol else np.ones(b.num_rows, np.float64))
        v = np.concatenate([
            b["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)])
        ww = np.concatenate([w, w])
        t = pa.table({"vertex": pa.array(v),
                      "s": pa.array(ww),
                      "ent": pa.array(ww * np.log(ww)),
                      "k": pa.array(np.ones(len(v), np.int64))})
        return pa.TableGroupBy(t, ["vertex"]).aggregate(
            [("s", "sum"), ("ent", "sum"), ("k", "sum")]
        ).rename_columns(["vertex", "s", "ent", "k"])

    agg = edges.map_batches(_inc, batch_format="pyarrow", batch_size=None) \
        .groupby("vertex").aggregate(
            ray.data.aggregate.Sum("s", alias_name="S"),
            ray.data.aggregate.Sum("ent", alias_name="E"),
            ray.data.aggregate.Sum("k", alias_name="K"),
        )

    def _div(b: pa.Table) -> pa.Table:
        s = b["S"].to_numpy(zero_copy_only=False)
        e = b["E"].to_numpy(zero_copy_only=False)
        k = b["K"].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            val = (np.log(s) - e / s) / np.log(k)
        val = np.where(k > 1, val, 0.0)
        return pa.table({"vertex": b["vertex"],
                         "div": pa.array(val, pa.float64())})

    return agg.map_batches(_div, batch_format="pyarrow", batch_size=None)


def neighborhood_size2(graph: Graph, num_partitions: int = 8) -> ray.data.Dataset:
    """(vertex, nsize): number of vertices within ≤ 2 hops, self
    included, over the simple undirected view (igraph_neighborhood_size
    with order=2 / mode ALL, neighborhood.c:39-120).

    order-2 is the wedge join: pairs = self ∪ 1-hop ∪ (1-hop ∘ 1-hop),
    distinct, counted per source.  The intermediate is the 2-hop pair
    set — the same size class as cocitation's output, with the same
    hub caveat (a hub of degree d contributes d² wedges)."""
    sym = graph.symmetrized(drop_loops=True)
    from igraph_ray.ops.relational import _dedup

    sym = _dedup(sym).materialize()

    def _mid(b: pa.Table) -> pa.Table:
        return pa.table({"dst": b["src"], "hop2": b["dst"]})

    two = hash_join(sym, sym.map_batches(_mid, batch_format="pyarrow", batch_size=None),
                    on="dst", num_partitions=num_partitions)

    def _p2(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "src" not in b.column_names:
            return pa.table({"v": pa.array([], pa.int64()),
                             "u": pa.array([], pa.int64())})
        t = pa.table({"v": pa.array(b["src"].to_numpy(zero_copy_only=False).astype(np.int64)),
                      "u": pa.array(b["hop2"].to_numpy(zero_copy_only=False).astype(np.int64))})
        return pa.TableGroupBy(t, ["v", "u"]).aggregate([]).select(["v", "u"])

    def _p1(b: pa.Table) -> pa.Table:
        v = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"v": pa.array(np.concatenate([v, v])),
                         "u": pa.array(np.concatenate([u, v]))})

    pairs = two.map_batches(_p2, batch_format="pyarrow", batch_size=None) \
        .union(sym.map_batches(_p1, batch_format="pyarrow", batch_size=None))
    cnt = pairs.groupby(["v", "u"]).count().groupby("v").count()

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["v"], "nsize": b["count()"]})

    return cnt.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def edge_clustering(graph: Graph, num_partitions: int = 8) -> ray.data.Dataset:
    """(lo, hi, tri, denom) per edge of the undirected simple view: the
    edge clustering coefficient numerator tri = |N(lo) ∩ N(hi)| (number
    of triangles through the edge) and denominator
    denom = min(deg_lo, deg_hi) − 1 (igraph_ecc with k=3,
    properties/ecc.c semantics; the ratio is tri/denom, kept as exact
    integers so distributed results hash-match the SQL oracle).

    Scale shape: the wedge self-join is the shared cocitation plan with
    the per-block pre-combiner; the (a,b,common) stream is then
    LEFT-joined onto the canonical edge list (edges with no triangle get
    tri=0), and degrees arrive via two broadcast joins."""
    from igraph_ray.ops.relational import _dedup

    sym = _dedup(graph.symmetrized(drop_loops=True))
    common = _common_neighbor_pairs(sym, "src", "dst", num_partitions)
    und = graph.canonical_undirected()
    deg = _degrees_over(sym, "src", graph.vertices(), False)

    def _ab(b: pa.Table) -> pa.Table:
        return pa.table({"a": b["lo"], "b": b["hi"]})

    e = und.map_batches(_ab, batch_format="pyarrow", batch_size=None)

    def _da(b: pa.Table) -> pa.Table:
        return pa.table({"a": b["vertex"], "deg_a": b["deg"]})

    def _db(b: pa.Table) -> pa.Table:
        return pa.table({"b": b["vertex"], "deg_b": b["deg"]})

    j = hash_join(e, deg.map_batches(_da, batch_format="pyarrow", batch_size=None),
                  on="a", num_partitions=num_partitions)
    j = hash_join(j, deg.map_batches(_db, batch_format="pyarrow", batch_size=None),
                  on="b", num_partitions=num_partitions)
    j = hash_join(j, common, on=["a", "b"], num_partitions=num_partitions,
                  join_type="left_outer")

    def _out(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "tri": pa.array([], pa.int64()),
                             "denom": pa.array([], pa.int64())})
        import pyarrow.compute as pc

        da = b["deg_a"].to_numpy(zero_copy_only=False)
        db = b["deg_b"].to_numpy(zero_copy_only=False)
        tri = pc.cast(pc.fill_null(b["common"], 0), pa.int64())
        return pa.table({"lo": b["a"], "hi": b["b"],
                         "tri": tri,
                         "denom": pa.array(np.minimum(da, db).astype(np.int64) - 1,
                                           pa.int64())})

    return j.map_batches(_out, batch_format="pyarrow", batch_size=None)


def k_truss(graph: Graph, k: int, max_iter: int = 100, num_partitions: int = 8) -> ray.data.Dataset:
    """Edges of the k-truss: the maximal subgraph in which every edge has
    support ≥ k−2 (lies in at least k−2 triangles of the subgraph) —
    iterative support peeling to fixpoint (the trussness family,
    igraph_truss semantics; Cohen 2008). Returns (lo, hi).

    Each round recomputes edge support with the shared wedge self-join
    (the cocitation plan with its per-block pre-combiner) and drops
    under-supported edges via one broadcast semi-join; rounds end when no
    edge is dropped. Peel depth is small in practice (≤ a handful of
    rounds on sparse graphs); each round is a streaming pass, nothing
    driver-side beyond the loop counter."""
    und = graph.canonical_undirected().materialize()
    need = k - 2
    if need <= 0:
        return und
    for _ in range(max_iter):
        n_edges = und.count()
        if n_edges == 0:
            break

        def _sym(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"src": pa.array([], pa.int64()),
                                 "dst": pa.array([], pa.int64())})
            return pa.table(
                {"src": pa.chunked_array([b["lo"], b["hi"]]).combine_chunks(),
                 "dst": pa.chunked_array([b["hi"], b["lo"]]).combine_chunks()})

        sym = und.map_batches(_sym, batch_format="pyarrow", batch_size=None)
        pairs = _common_neighbor_pairs(sym, "src", "dst", num_partitions)
        sup = pairs.filter(expr=f"common >= {need}")

        def _ab(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "a" not in b.column_names:
                return pa.table({"lo": pa.array([], pa.int64()),
                                 "hi": pa.array([], pa.int64())})
            return pa.table({"lo": b["a"], "hi": b["b"]})

        keep_keys = sup.map_batches(_ab, batch_format="pyarrow", batch_size=None)
        new_und = hash_join(und, keep_keys, on=["lo", "hi"],
                            num_partitions=num_partitions).materialize()
        if new_und.count() == n_edges:
            break
        und = new_und
    if und.count() == 0:
        return ray.data.from_arrow(pa.table({"lo": pa.array([], pa.int64()),
                                             "hi": pa.array([], pa.int64())}))
    return und


def barrat_weighted_clustering(
    und: ray.data.Dataset, num_partitions: int = 8
) -> ray.data.Dataset:
    """Barrat weighted local clustering as exact integer components.

    igraph_transitivity_barrat (/root/reference/src/triangles.c:713-965):
    ``C_w(i) = (1/(s_i·(k_i−1))) · Σ_{triangles {i,j,h}} (w_ij+w_ih)/2``
    over the weighted undirected simple graph. With integer edge weights
    every term is exact, so the operator reports, for each vertex with
    degree ≥ 2, the integer triple that reconstructs the coefficient
    exactly — ``C_w = tri_wsum / (2·strength·(deg−1))`` — instead of a
    rounded float (the engine-wide exact-integers-over-floats rule for
    hash-compared queries).

    ``und`` columns: ``lo < hi`` (one row per unordered simple edge),
    integer-valued ``weight``. Physical plan: the triangle wedge join of
    q_triangle_list carrying the three edge weights, a per-corner
    (vertex, w_pair) emission, and one groupby-sum; degree/strength are
    the usual both-endpoint union + grouped count/sum.
    """
    und = und.materialize()

    def _e1(b: pa.Table) -> pa.Table:
        return pa.table({"a": b["lo"], "b": b["hi"], "wab": b["weight"]})

    def _e2(b: pa.Table) -> pa.Table:
        return pa.table({"b": b["lo"], "c": b["hi"], "wbc": b["weight"]})

    def _e3(b: pa.Table) -> pa.Table:
        return pa.table({"a": b["lo"], "c": b["hi"], "wac": b["weight"]})

    wedge = hash_join(
        und.map_batches(_e1, batch_format="pyarrow", batch_size=None),
        und.map_batches(_e2, batch_format="pyarrow", batch_size=None),
        on="b", num_partitions=num_partitions,
    )
    tri = hash_join(
        wedge,
        und.map_batches(_e3, batch_format="pyarrow", batch_size=None),
        on=["a", "c"], num_partitions=num_partitions,
    )

    def _corners(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "a" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "ws": pa.array([], pa.int64())})
        a = b["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        wab = b["wab"].to_numpy(zero_copy_only=False).astype(np.int64)
        wbc = b["wbc"].to_numpy(zero_copy_only=False).astype(np.int64)
        wac = b["wac"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.concatenate([a, bb, c])
        ws = np.concatenate([wab + wac, wab + wbc, wac + wbc])
        # per-batch pre-combine before the global sum-groupby
        t = pa.table({"vertex": pa.array(v), "ws": pa.array(ws)})
        return (pa.TableGroupBy(t, "vertex").aggregate([("ws", "sum")])
                .rename_columns(["vertex", "ws"]))

    wsum = (tri.map_batches(_corners, batch_format="pyarrow", batch_size=None)
            .groupby("vertex").sum("ws"))

    def _inc(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = b["weight"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"vertex": pa.array(np.concatenate([lo, hi])),
                         "one": pa.array(np.ones(2 * len(lo), np.int64)),
                         "w": pa.array(np.concatenate([w, w]))})

    degs = (und.map_batches(_inc, batch_format="pyarrow", batch_size=None)
            .groupby("vertex").sum(["one", "w"]))

    def _base(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vertex" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "strength": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64())})
        return pa.table({"vertex": b["vertex"],
                         "strength": b["sum(w)"], "deg": b["sum(one)"]})

    base = (degs.map_batches(_base, batch_format="pyarrow", batch_size=None)
            .filter(expr="deg >= 2"))
    joined = hash_join(base, wsum, on="vertex",
                       num_partitions=num_partitions, join_type="left_outer")

    def _final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vertex" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "tri_wsum": pa.array([], pa.int64()),
                             "strength": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64())})
        import pyarrow.compute as pc
        if "sum(ws)" in b.column_names:
            wsf = pc.fill_null(b["sum(ws)"], 0)
        else:  # right side empty (triangle-free view): join drops the col
            wsf = pa.array(np.zeros(b.num_rows, np.int64))
        return pa.table({"vertex": b["vertex"],
                         "tri_wsum": pc.cast(wsf, pa.int64()),
                         "strength": pc.cast(b["strength"], pa.int64()),
                         "deg": pc.cast(b["deg"], pa.int64())})

    return joined.map_batches(_final, batch_format="pyarrow",
                              batch_size=None).sort("vertex")


def burt_constraint(
    und: ray.data.Dataset, num_partitions: int = 8
) -> ray.data.Dataset:
    """Burt's network constraint over a weighted undirected simple graph
    (igraph_constraint, /root/reference/src/structural_properties.c —
    c_i = Σ_{j∈N(i)} (p_ij + Σ_q p_iq·p_qj)² with p_ij = w_ij / s_i).

    Dataflow: symmetric proportion edges p(i,j) via one strength join,
    the two-hop Σ p_iq·p_qj via a p⋈p self-join on the mid vertex
    (grouped per (i,j) with per-batch pre-combine), squared terms over
    the direct neighbor list, one final per-vertex sum. Values reported
    e6-rounded (the engine's float-reporting rule, as betweenness);
    q≠i,j exclusions are automatic on a loop-free simple graph.

    ``und`` columns: lo < hi, weight.
    """
    und = und.materialize()

    def _sym(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = b["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"i": pa.array(np.concatenate([lo, hi])),
                         "j": pa.array(np.concatenate([hi, lo])),
                         "w": pa.array(np.concatenate([w, w]))})

    sym = und.map_batches(_sym, batch_format="pyarrow", batch_size=None)
    strength = sym.groupby("i").sum("w")

    def _rs(b: pa.Table) -> pa.Table:
        return pa.table({"i": b["i"], "s": b["sum(w)"]})

    p = hash_join(
        sym, strength.map_batches(_rs, batch_format="pyarrow", batch_size=None),
        on="i", num_partitions=num_partitions,
    )

    def _p(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "i" not in b.column_names:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "p": pa.array([], pa.float64())})
        w = b["w"].to_numpy(zero_copy_only=False)
        s = b["s"].to_numpy(zero_copy_only=False)
        return pa.table({"i": b["i"], "j": b["j"],
                         "p": pa.array(w / s, pa.float64())})

    p = p.map_batches(_p, batch_format="pyarrow", batch_size=None).materialize()

    def _a(b: pa.Table) -> pa.Table:
        return pa.table({"i": b["i"], "q": b["j"], "piq": b["p"]})

    def _b(b: pa.Table) -> pa.Table:
        return pa.table({"q": b["i"], "j": b["j"], "pqj": b["p"]})

    two = hash_join(
        p.map_batches(_a, batch_format="pyarrow", batch_size=None),
        p.map_batches(_b, batch_format="pyarrow", batch_size=None),
        on="q", num_partitions=num_partitions,
    )

    def _prod(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "i" not in b.column_names:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "t": pa.array([], pa.float64())})
        i = b["i"].to_numpy(zero_copy_only=False)
        j = b["j"].to_numpy(zero_copy_only=False)
        keep = i != j
        t = pa.table({
            "i": pa.array(i[keep]), "j": pa.array(j[keep]),
            "t": pa.array(
                (b["piq"].to_numpy(zero_copy_only=False)
                 * b["pqj"].to_numpy(zero_copy_only=False))[keep], pa.float64())})
        return (pa.TableGroupBy(t, ["i", "j"]).aggregate([("t", "sum")])
                .rename_columns(["i", "j", "t"]))

    two = (two.map_batches(_prod, batch_format="pyarrow", batch_size=None)
           .groupby(["i", "j"]).sum("t"))

    def _rt(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "i" not in b.column_names:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "t": pa.array([], pa.float64())})
        return pa.table({"i": b["i"], "j": b["j"], "t": b["sum(t)"]})

    terms = hash_join(
        p, two.map_batches(_rt, batch_format="pyarrow", batch_size=None),
        on=["i", "j"], num_partitions=num_partitions, join_type="left_outer",
    )

    def _term(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "i" not in b.column_names:
            return pa.table({"i": pa.array([], pa.int64()),
                             "term": pa.array([], pa.float64())})
        pp = b["p"].to_numpy(zero_copy_only=False)
        t = np.nan_to_num(
            b["t"].to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0)
        v = (pp + t) ** 2
        tt = pa.table({"i": b["i"], "term": pa.array(v, pa.float64())})
        return (pa.TableGroupBy(tt, "i").aggregate([("term", "sum")])
                .rename_columns(["i", "term"]))

    c = (terms.map_batches(_term, batch_format="pyarrow", batch_size=None)
         .groupby("i").sum("term"))

    def _final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "i" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "constraint_e6": pa.array([], pa.int64())})
        v = b["sum(term)"].to_numpy(zero_copy_only=False)
        return pa.table({"vertex": b["i"],
                         "constraint_e6": pa.array(
                             np.round(v * 1e6).astype(np.int64), pa.int64())})

    return (c.map_batches(_final, batch_format="pyarrow", batch_size=None)
            .sort("vertex"))


def local_scan1_them(
    us: ray.data.Dataset, them: ray.data.Dataset, num_partitions: int = 8
) -> ray.data.Dataset:
    """(vertex, scan1t): THEM-graph edges inside each vertex's closed
    OUT-neighborhood taken from the US graph
    (igraph_local_scan_1_ecount_them, /root/reference/src/scan.c:475-545,
    mode=IGRAPH_OUT — with the OUT inclist each inside edge is counted
    exactly once at its tail). Both inputs are directed simple edge
    tables (src, dst); the result covers every vertex of the US
    universe, 0 where the neighborhood contains no THEM edge.

    Plan: membership pairs M(v,u) = ego ∪ out-edges of US, one join of M
    against THEM tails, one semi-join of the landed heads back against M
    — two hash joins, no neighborhood materialization per vertex.
    """
    from igraph_ray.graph import endpoint_universe

    us = us.materialize()
    universe = endpoint_universe(us).materialize()

    def _m(b: pa.Table) -> pa.Table:
        return pa.table({"v": b["src"], "u": b["dst"]})

    def _ego(b: pa.Table) -> pa.Table:
        return pa.table({"v": b["vertex"], "u": b["vertex"]})

    member = (us.map_batches(_m, batch_format="pyarrow", batch_size=None)
              .union(universe.map_batches(_ego, batch_format="pyarrow",
                                          batch_size=None))).materialize()

    def _t(b: pa.Table) -> pa.Table:
        return pa.table({"u": b["src"], "w": b["dst"]})

    landed = hash_join(
        member, them.map_batches(_t, batch_format="pyarrow", batch_size=None),
        on="u", num_partitions=num_partitions)

    def _vw(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "v" not in b.column_names:
            return pa.table({"v": pa.array([], pa.int64()),
                             "u": pa.array([], pa.int64())})
        return pa.table({"v": b["v"], "u": b["w"]})

    inside = hash_join(
        landed.map_batches(_vw, batch_format="pyarrow", batch_size=None),
        member.map_batches(
            lambda b: pa.table({"v": b["v"], "u": b["u"],
                                "one": pa.array(
                                    np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow", batch_size=None),
        on=["v", "u"], num_partitions=num_partitions)

    def _cnt(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "v" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        t = pa.table({"vertex": b["v"],
                      "c": pa.array(np.ones(b.num_rows, np.int64))})
        return (pa.TableGroupBy(t, "vertex").aggregate([("c", "sum")])
                .rename_columns(["vertex", "c"]))

    counts = (inside.map_batches(_cnt, batch_format="pyarrow", batch_size=None)
              .union(universe.map_batches(
                  lambda b: pa.table({"vertex": b["vertex"],
                                      "c": pa.array(
                                          np.zeros(b.num_rows, np.int64))}),
                  batch_format="pyarrow", batch_size=None))
              .groupby("vertex").sum("c"))

    def _rn(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if b.num_rows == 0 or "vertex" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "scan1t": pa.array([], pa.int64())})
        return pa.table({"vertex": b["vertex"],
                         "scan1t": pc.cast(b["sum(c)"], pa.int64())})

    return counts.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def local_scan2(und: ray.data.Dataset, num_partitions: int = 8) -> ray.data.Dataset:
    """(vertex, scan2): edges of the simple undirected graph inside each
    vertex's closed 2-neighborhood (igraph_local_scan_k_ecount k=2,
    /root/reference/src/scan.c — neighborhood BFS + induced ecount; each
    inside edge counted once).

    Plan: the dist≤2 membership table M2 = self ∪ direct ∪ wedge pairs
    (three streams, one distinct), then the same two-join counting as
    the THEM scan — M2 against edge lo-endpoints, heads semi-joined
    back. |M2| = Σ_v |N2[v]| rows; suited to the thinned views where
    N2 stays far below n (on a dense graph N2 ≈ V and a per-vertex
    global ecount would be cheaper).

    ``und`` columns: lo < hi (simple undirected edges).
    """
    und = und.materialize()

    def _sym(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"v": pa.array(np.concatenate([lo, hi])),
                         "u": pa.array(np.concatenate([hi, lo]))})

    sym = und.map_batches(_sym, batch_format="pyarrow",
                          batch_size=None).materialize()

    def _self(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "v" not in b.column_names:
            return pa.table({"v": pa.array([], pa.int64()),
                             "u": pa.array([], pa.int64())})
        vv = b["v"].combine_chunks().unique() if isinstance(
            b["v"], pa.ChunkedArray) else b["v"].unique()
        return pa.table({"v": vv, "u": vv})

    def _mid(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "v" not in b.column_names:
            return pa.table({"u": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        return pa.table({"u": b["v"], "w": b["u"]})

    hop2 = hash_join(sym, sym.map_batches(_mid, batch_format="pyarrow",
                                          batch_size=None),
                     on="u", num_partitions=num_partitions)

    def _vw(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "v" not in b.column_names:
            return pa.table({"v": pa.array([], pa.int64()),
                             "u": pa.array([], pa.int64())})
        t = pa.table({"v": b["v"], "u": b["w"]})
        return t.group_by(["v", "u"]).aggregate([])

    member = (hop2.map_batches(_vw, batch_format="pyarrow", batch_size=None)
              .union(sym)
              .union(sym.map_batches(_self, batch_format="pyarrow",
                                     batch_size=None))
              .groupby(["v", "u"]).count()).materialize()

    def _m(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "v" not in b.column_names:
            return pa.table({"v": pa.array([], pa.int64()),
                             "u": pa.array([], pa.int64())})
        return pa.table({"v": b["v"], "u": b["u"]})

    member = member.map_batches(_m, batch_format="pyarrow",
                                batch_size=None).materialize()

    def _elo(b: pa.Table) -> pa.Table:
        return pa.table({"u": b["lo"], "other": b["hi"]})

    landed = hash_join(
        member, und.map_batches(_elo, batch_format="pyarrow", batch_size=None),
        on="u", num_partitions=num_partitions)

    def _vo(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "v" not in b.column_names:
            return pa.table({"v": pa.array([], pa.int64()),
                             "u": pa.array([], pa.int64())})
        return pa.table({"v": b["v"], "u": b["other"]})

    inside = hash_join(
        landed.map_batches(_vo, batch_format="pyarrow", batch_size=None),
        member, on=["v", "u"], num_partitions=num_partitions)

    def _cnt(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "v" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        t = pa.table({"vertex": b["v"],
                      "c": pa.array(np.ones(b.num_rows, np.int64))})
        return (pa.TableGroupBy(t, "vertex").aggregate([("c", "sum")])
                .rename_columns(["vertex", "c"]))

    def _zero(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "v" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        vv = b["v"].combine_chunks().unique() if isinstance(
            b["v"], pa.ChunkedArray) else b["v"].unique()
        return pa.table({"vertex": vv,
                         "c": pa.array(np.zeros(len(vv), np.int64))})

    counts = (inside.map_batches(_cnt, batch_format="pyarrow", batch_size=None)
              .union(sym.map_batches(_zero, batch_format="pyarrow",
                                     batch_size=None))
              .groupby("vertex").sum("c"))

    def _rn(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if b.num_rows == 0 or "vertex" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "scan2": pa.array([], pa.int64())})
        return pa.table({"vertex": b["vertex"],
                         "scan2": pc.cast(b["sum(c)"], pa.int64())})

    return counts.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def edge_clustering4(und: ray.data.Dataset, num_partitions: int = 8) -> ray.data.Dataset:
    """(lo, hi, cyc4, denom) per edge: the k=4 edge clustering
    coefficient components (igraph_ecc k=4, properties/ecc.c semantics)
    — cyc4 = number of 4-cycles through the edge, denom =
    (deg_lo−1)·(deg_hi−1) − codeg(lo,hi) = the number of length-3 paths
    between the endpoints that COULD close a 4-cycle. Exact integers
    (the float ratio is cyc4/denom), so the driver hash gate applies.

    Plan: cyc4 via the ordered 3-path enumeration sym⋈sym⋈sym grouped
    per directed edge then matched to the canonical orientation (each
    4-cycle through an edge is exactly one (x, y) pair in that
    orientation); cost Σ_{(x,y)∈E} d_x·d_y rows — the thinned-view
    envelope, same as the wedge join family. codeg and degrees reuse
    the cocitation machinery. ``und`` columns: lo < hi.
    """
    und = und.materialize()

    def _sym(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pa.array(np.concatenate([lo, hi])),
                         "dst": pa.array(np.concatenate([hi, lo]))})

    sym = und.map_batches(_sym, batch_format="pyarrow",
                          batch_size=None).materialize()

    # ordered 3-paths u—x—y—v with y≠u, x≠v, grouped per (u, v)
    def _ux(b: pa.Table) -> pa.Table:
        return pa.table({"u": b["src"], "x": b["dst"]})

    def _xy(b: pa.Table) -> pa.Table:
        return pa.table({"x": b["src"], "y": b["dst"]})

    def _yv(b: pa.Table) -> pa.Table:
        return pa.table({"y": b["src"], "v": b["dst"]})

    w = hash_join(sym.map_batches(_ux, batch_format="pyarrow", batch_size=None),
                  sym.map_batches(_xy, batch_format="pyarrow", batch_size=None),
                  on="x", num_partitions=num_partitions)

    def _f1(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "u" not in b.column_names:
            return pa.table({"u": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64())})
        u = b["u"].to_numpy(zero_copy_only=False)
        y = b["y"].to_numpy(zero_copy_only=False)
        keep = u != y
        return pa.table({"u": b["u"].filter(pa.array(keep)),
                         "x": b["x"].filter(pa.array(keep)),
                         "y": b["y"].filter(pa.array(keep))})

    p3 = hash_join(
        w.map_batches(_f1, batch_format="pyarrow", batch_size=None),
        sym.map_batches(_yv, batch_format="pyarrow", batch_size=None),
        on="y", num_partitions=num_partitions)

    def _cnt(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "u" not in b.column_names:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "z": pa.array([], pa.int64())})
        u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = b["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        # keep the canonical edge orientation u < v so each 4-cycle
        # through {u,v} counts exactly once; drop degenerate x = v
        keep = (u < v) & (x != v)
        t = pa.table({"lo": pa.array(u[keep]), "hi": pa.array(v[keep])})
        return (pa.TableGroupBy(t, ["lo", "hi"]).aggregate([([], "count_all")])
                .rename_columns(["lo", "hi", "z"]))

    z = (p3.map_batches(_cnt, batch_format="pyarrow", batch_size=None)
         .groupby(["lo", "hi"]).sum("z"))

    def _rz(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "lo" not in b.column_names:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "z": pa.array([], pa.int64())})
        return pa.table({"lo": b["lo"], "hi": b["hi"], "z": b["sum(z)"]})

    z = z.map_batches(_rz, batch_format="pyarrow", batch_size=None)

    common = _common_neighbor_pairs(sym, "src", "dst", num_partitions)

    def _deg(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["src"]})

    deg = (sym.map_batches(_deg, batch_format="pyarrow", batch_size=None)
           .groupby("vertex").count())

    def _ab(b: pa.Table) -> pa.Table:
        return pa.table({"a": b["lo"], "b": b["hi"]})

    e = und.map_batches(_ab, batch_format="pyarrow", batch_size=None)

    def _da(b: pa.Table) -> pa.Table:
        return pa.table({"a": b["vertex"], "deg_a": b["count()"]})

    def _db(b: pa.Table) -> pa.Table:
        return pa.table({"b": b["vertex"], "deg_b": b["count()"]})

    j = hash_join(e, deg.map_batches(_da, batch_format="pyarrow", batch_size=None),
                  on="a", num_partitions=num_partitions)
    j = hash_join(j, deg.map_batches(_db, batch_format="pyarrow", batch_size=None),
                  on="b", num_partitions=num_partitions)
    j = hash_join(j, common, on=["a", "b"], num_partitions=num_partitions,
                  join_type="left_outer")

    def _zr(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "lo" not in b.column_names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "z": pa.array([], pa.int64())})
        return pa.table({"a": b["lo"], "b": b["hi"], "z": b["z"]})

    j = hash_join(j, z.map_batches(_zr, batch_format="pyarrow", batch_size=None),
                  on=["a", "b"], num_partitions=num_partitions,
                  join_type="left_outer")

    def _out(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if b.num_rows == 0 or "a" not in b.column_names:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "cyc4": pa.array([], pa.int64()),
                             "denom": pa.array([], pa.int64())})
        da = b["deg_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        db = b["deg_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = pc.fill_null(b["common"], 0).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "lo": b["a"], "hi": b["b"],
            "cyc4": pc.cast(pc.fill_null(b["z"], 0), pa.int64()),
            "denom": pa.array((da - 1) * (db - 1) - c)})

    return j.map_batches(_out, batch_format="pyarrow",
                         batch_size=None).sort(["lo", "hi"])


def laplacian_edges(
    graph: Graph,
    normalized: bool = False,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Graph Laplacian in COO form over the simple undirected view
    (igraph_laplacian, spectral_properties.c:272): L = D − A, or the
    symmetric normalization I − D^-1/2 A D^-1/2. Plain mode emits exact
    int64 ``value`` (diag = degree, offdiag = −1); normalized mode
    emits ``value_e9`` = the half-up-rounded 1e9 scaling (diag 1e9,
    offdiag −round(1e9/sqrt(d_i·d_j)) — FLOOR(x+0.5) on the positive
    magnitude so the rounding rule is identical in numpy and SQL).
    Isolated vertices never reach the edge table, matching the
    reference's degree-0 convention of leaving the normalized diagonal
    0 (no row here). One groupby for degrees, one broadcast join back
    onto the edges — no other shuffle."""
    und = graph.canonical_undirected().materialize()

    def _ends(b: pa.Table) -> pa.Table:
        return pa.table({"v": pa.concat_arrays(
            [b["lo"].combine_chunks(), b["hi"].combine_chunks()])})

    deg = (und.map_batches(_ends, batch_format="pyarrow", batch_size=None)
           .groupby("v").count())  # (v, count())

    if not normalized:
        def _off(b: pa.Table) -> pa.Table:
            lo = b["lo"].to_numpy(zero_copy_only=False)
            hi = b["hi"].to_numpy(zero_copy_only=False)
            return pa.table({
                "i": pa.array(np.concatenate([lo, hi])),
                "j": pa.array(np.concatenate([hi, lo])),
                "value": pa.array(np.full(2 * len(lo), -1, np.int64))})

        def _diag(b: pa.Table) -> pa.Table:
            return pa.table({
                "i": b["v"], "j": b["v"],
                "value": pc.cast(b["count()"], pa.int64())})

        return (und.map_batches(_off, batch_format="pyarrow",
                                batch_size=None)
                .union(deg.map_batches(_diag, batch_format="pyarrow",
                                       batch_size=None))
                .sort(["i", "j"]))

    j1 = hash_join(und, deg.map_batches(
        lambda b: pa.table({"lo": b["v"], "d1": b["count()"]}),
        batch_format="pyarrow", batch_size=None), on="lo",
        num_partitions=num_partitions)
    j2 = hash_join(j1, deg.map_batches(
        lambda b: pa.table({"hi": b["v"], "d2": b["count()"]}),
        batch_format="pyarrow", batch_size=None), on="hi",
        num_partitions=num_partitions)

    def _off_n(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        d1 = b["d1"].to_numpy(zero_copy_only=False).astype(np.float64)
        d2 = b["d2"].to_numpy(zero_copy_only=False).astype(np.float64)
        mag = np.floor(1e9 / np.sqrt(d1 * d2) + 0.5).astype(np.int64)
        return pa.table({
            "i": pa.array(np.concatenate([lo, hi])),
            "j": pa.array(np.concatenate([hi, lo])),
            "value_e9": pa.array(np.concatenate([-mag, -mag]))})

    def _diag_n(b: pa.Table) -> pa.Table:
        one = np.full(b.num_rows, 1_000_000_000, np.int64)
        return pa.table({"i": b["v"], "j": b["v"],
                         "value_e9": pa.array(one)})

    return (j2.map_batches(_off_n, batch_format="pyarrow", batch_size=None)
            .union(deg.map_batches(_diag_n, batch_format="pyarrow",
                                   batch_size=None))
            .sort(["i", "j"]))


def is_graphical_degree_sequence(degrees: np.ndarray) -> tuple:
    """(is_degree_sequence, is_graphical) for an undirected degree
    sequence (igraph_is_degree_sequence /
    igraph_is_graphical_degree_sequence,
    structural_properties.c:6629,6686). The reference runs
    Havel–Hakimi; this uses the equivalent Erdős–Gallai criterion
    (published closed form), fully vectorized: with d sorted
    descending, graphical ⟺ Σd even and ∀k:
    Σ_{i≤k} d_i ≤ k(k−1) + Σ_{i>k} min(d_i, k)."""
    d = np.sort(np.asarray(degrees, np.int64))[::-1]
    n = len(d)
    if n == 0:
        return True, True
    if (d < 0).any():
        return False, False
    is_seq = int(d.sum()) % 2 == 0
    if not is_seq:
        return False, False
    pre = np.cumsum(d)
    k = np.arange(1, n + 1)
    # Σ_{i>k} min(d_i, k): tail is ascending in min(), split at the
    # first index > k where d < k (d sorted desc → searchsorted on -d)
    # count of i > k with d_i >= k:
    ge = np.searchsorted(-d, -k, side="right")  # #i with d_i >= k
    cnt_ge = np.maximum(ge - k, 0)
    # sum of d_i for i > max(k, ge): full tail sum minus prefix
    start = np.maximum(k, ge)
    tail_sum = pre[-1] - pre[start - 1]
    rhs = k * (k - 1) + k * cnt_ge + tail_sum
    lhs = pre[k - 1]
    return True, bool((lhs <= rhs).all())


def neighborhood_members(graph: Graph, order: int = 2,
                         n: Optional[int] = None,
                         num_partitions: int = 8) -> ray.data.Dataset:
    """(seed, vertex, dist) ball-membership table of every vertex's
    closed ``order``-neighborhood over the simple undirected view —
    igraph_neighborhood (neighborhood.c:122-227, mode ALL, mindist 0).
    One frontier join per hop + a grouped min — the whole V×ball
    product is built in ``order`` shuffles, never per-seed BFS."""
    from igraph_ray.util import hash_join

    n = n if n is not None else graph.num_vertices()
    und = graph.canonical_undirected().materialize()
    sym = und.map_batches(
        lambda b: pa.table({
            "a": pa.array(np.concatenate(
                [b["lo"].to_numpy(zero_copy_only=False),
                 b["hi"].to_numpy(zero_copy_only=False)])),
            "b": pa.array(np.concatenate(
                [b["hi"].to_numpy(zero_copy_only=False),
                 b["lo"].to_numpy(zero_copy_only=False)]))})
        if b.num_rows else pa.table({"a": pa.array([], pa.int64()),
                                     "b": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None).materialize()

    d0 = ray.data.range(n).map_batches(
        lambda b: pa.table({
            "seed": b["id"], "vertex": b["id"],
            "d": pa.array(np.zeros(b.num_rows, np.int64))}),
        batch_format="pyarrow", batch_size=None).materialize()
    layers = [d0]
    frontier = d0
    for k in range(1, order + 1):
        fr = frontier.map_batches(
            lambda b: pa.table({"seed": b["seed"], "a": b["vertex"]})
            if b.num_rows else pa.table(
                {"seed": pa.array([], pa.int64()),
                 "a": pa.array([], pa.int64())}),
            batch_format="pyarrow", batch_size=None)
        nxt = hash_join(fr, sym, on="a", num_partitions=num_partitions)
        frontier = nxt.map_batches(
            lambda b, k=k: pa.table({
                "seed": b["seed"], "vertex": b["b"],
                "d": pa.array(np.full(b.num_rows, k, np.int64))})
            if b.num_rows else pa.table(
                {"seed": pa.array([], pa.int64()),
                 "vertex": pa.array([], pa.int64()),
                 "d": pa.array([], pa.int64())}),
            batch_format="pyarrow", batch_size=None).materialize()
        layers.append(frontier)

    allm = layers[0]
    for lay in layers[1:]:
        allm = allm.union(lay)
    out = allm.groupby(["seed", "vertex"]).min("d")
    return out.map_batches(
        lambda b: pa.table({"seed": b["seed"], "vertex": b["vertex"],
                            "dist": b["min(d)"]})
        if b.num_rows else pa.table(
            {"seed": pa.array([], pa.int64()),
             "vertex": pa.array([], pa.int64()),
             "dist": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)


def neighborhood_graph_edges(graph: Graph, order: int = 2,
                             n: Optional[int] = None,
                             num_partitions: int = 8
                             ) -> ray.data.Dataset:
    """(seed, src, dst): the induced edge set of every vertex's
    ``order``-ball — igraph_neighborhood_graphs (neighborhood.c:229+,
    mode ALL): two membership joins against the canonical undirected
    edge table."""
    from igraph_ray.util import hash_join

    members = neighborhood_members(
        graph, order=order, n=n,
        num_partitions=num_partitions).materialize()
    und = graph.canonical_undirected()
    m_lo = members.map_batches(
        lambda b: pa.table({"seed": b["seed"], "lo": b["vertex"]})
        if b.num_rows else pa.table(
            {"seed": pa.array([], pa.int64()),
             "lo": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    m_hi = members.map_batches(
        lambda b: pa.table({"seed": b["seed"], "hi": b["vertex"]})
        if b.num_rows else pa.table(
            {"seed": pa.array([], pa.int64()),
             "hi": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(m_lo, und, on="lo", num_partitions=num_partitions)
    j = hash_join(j, m_hi, on=["seed", "hi"],
                  num_partitions=num_partitions)
    return j.map_batches(
        lambda b: pa.table({"seed": b["seed"], "src": b["lo"],
                            "dst": b["hi"]})
        if b.num_rows else pa.table(
            {"seed": pa.array([], pa.int64()),
             "src": pa.array([], pa.int64()),
             "dst": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)


def local_scan0(edges: ray.data.Dataset, mode: str = "out",
                weight_col: Optional[str] = None,
                universe: Optional[ray.data.Dataset] = None,
                num_partitions: int = 8) -> ray.data.Dataset:
    """(vertex, scan0): the k=0 scan statistic — defined by the
    reference as plain degree (unweighted) or strength (weighted), with
    loops counted (igraph_local_scan_0, /root/reference/src/scan.c:54-65,
    which forwards to igraph_degree/igraph_strength with loops=1).

    ``edges`` is a directed edge table (src, dst [, weight_col]); loops
    and multiplicities in the input all count, exactly as the reference
    counts them. ``mode``: "out" | "in" | "all".
    """
    from igraph_ray.graph import endpoint_universe

    edges = edges.materialize()
    if universe is None:
        universe = endpoint_universe(edges)

    def _side(col: str):
        def _m(b: pa.Table) -> pa.Table:
            w = (b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
                 if weight_col else np.ones(b.num_rows, np.float64))
            return pa.table({"vertex": b[col], "w": pa.array(w)})
        return _m

    parts = []
    if mode in ("out", "all"):
        parts.append(edges.map_batches(_side("src"), batch_format="pyarrow",
                                       batch_size=None))
    if mode in ("in", "all"):
        parts.append(edges.map_batches(_side("dst"), batch_format="pyarrow",
                                       batch_size=None))
    stream = parts[0]
    for p in parts[1:]:
        stream = stream.union(p)
    stream = stream.union(universe_zeros(universe, "w", pa.float64()))
    out = stream.groupby("vertex").sum("w")

    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vertex" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "scan0": pa.array([], pa.float64())})
        return pa.table({"vertex": b["vertex"],
                         "scan0": pc.cast(b["sum(w)"], pa.float64())})

    return out.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def local_scan_k_ecount_them(us: Graph, them_und: ray.data.Dataset,
                             k: int = 2,
                             universe: Optional[ray.data.Dataset] = None,
                             num_partitions: int = 8) -> ray.data.Dataset:
    """(vertex, scan{k}t): THEM-graph edges whose BOTH endpoints fall in
    each vertex's closed k-ball taken from the US graph
    (igraph_local_scan_k_ecount_them, /root/reference/src/scan.c:676-760,
    mode ALL: BFS marks the ball in US, incident THEM edges of marked
    vertices with a marked other endpoint are summed and halved — i.e.
    each inside edge once).

    ``them_und`` columns: lo < hi (simple undirected edge table). The
    ball membership is the same V×ball product as neighborhood_members
    — k shuffles total, never a per-seed BFS.
    """
    members = neighborhood_members(us, order=k,
                                   num_partitions=num_partitions)
    members = members.map_batches(
        lambda b: pa.table({"seed": b["seed"], "vertex": b["vertex"]})
        if b.num_rows else pa.table(
            {"seed": pa.array([], pa.int64()),
             "vertex": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None).materialize()

    m_lo = members.map_batches(
        lambda b: pa.table({"seed": b["seed"], "lo": b["vertex"]})
        if b.num_rows else pa.table(
            {"seed": pa.array([], pa.int64()),
             "lo": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(m_lo, them_und, on="lo", num_partitions=num_partitions)
    j = j.map_batches(
        lambda b: pa.table({"seed": b["seed"], "vertex": b["hi"]})
        if b.num_rows and "seed" in b.column_names else pa.table(
            {"seed": pa.array([], pa.int64()),
             "vertex": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    inside = hash_join(j, members, on=["seed", "vertex"],
                       num_partitions=num_partitions)

    def _cnt(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "seed" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        t = pa.table({"vertex": b["seed"],
                      "c": pa.array(np.ones(b.num_rows, np.int64))})
        return (pa.TableGroupBy(t, "vertex").aggregate([("c", "sum")])
                .rename_columns(["vertex", "c"]))

    if universe is None:
        from igraph_ray.graph import endpoint_universe

        universe = endpoint_universe(us.edges)
    counts = (inside.map_batches(_cnt, batch_format="pyarrow",
                                 batch_size=None)
              .union(universe_zeros(universe, "c"))
              .groupby("vertex").sum("c"))
    col = f"scan{k}t"

    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vertex" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             col: pa.array([], pa.int64())})
        return pa.table({"vertex": b["vertex"],
                         col: pc.cast(b["sum(c)"], pa.int64())})

    return counts.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def local_scan_neighborhood_ecount(
    edges: ray.data.Dataset, neighborhoods: ray.data.Dataset,
    universe: Optional[ray.data.Dataset] = None,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """(vertex, scan_nb): edges of the DIRECTED graph counted inside
    user-supplied neighborhoods (igraph_local_scan_neighborhood_ecount,
    /root/reference/src/scan.c — the pre-calculated-neighborhoods UDF
    surface): for each seed, scan the out-edges of every listed member
    and count heads that land in the member set ∪ {seed} (the seed is
    always marked but only scanned from if listed; directed graphs are
    not halved).

    ``neighborhoods`` columns: (seed, vertex), distinct rows — the set
    representation of the reference's per-vertex member lists.
    """
    from igraph_ray.graph import endpoint_universe

    edges = edges.materialize()
    neighborhoods = neighborhoods.materialize()
    if universe is None:
        universe = endpoint_universe(edges)
    universe = universe.materialize()

    self_rows = universe.map_batches(
        lambda b: pa.table({"seed": b["vertex"], "vertex": b["vertex"]}),
        batch_format="pyarrow", batch_size=None)
    # marked = distinct(neighborhood ∪ self): grouped count, keys only
    marked = (neighborhoods.union(self_rows)
              .groupby(["seed", "vertex"]).count()
              .map_batches(
                  lambda b: pa.table({"seed": b["seed"],
                                      "vertex": b["vertex"]})
                  if b.num_rows else pa.table(
                      {"seed": pa.array([], pa.int64()),
                       "vertex": pa.array([], pa.int64())}),
                  batch_format="pyarrow", batch_size=None)).materialize()

    scan_from = neighborhoods.map_batches(
        lambda b: pa.table({"seed": b["seed"], "src": b["vertex"]})
        if b.num_rows else pa.table(
            {"seed": pa.array([], pa.int64()),
             "src": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(scan_from, edges, on="src",
                  num_partitions=num_partitions)
    j = j.map_batches(
        lambda b: pa.table({"seed": b["seed"], "vertex": b["dst"]})
        if b.num_rows and "seed" in b.column_names else pa.table(
            {"seed": pa.array([], pa.int64()),
             "vertex": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    inside = hash_join(j, marked, on=["seed", "vertex"],
                       num_partitions=num_partitions)

    def _cnt(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "seed" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        t = pa.table({"vertex": b["seed"],
                      "c": pa.array(np.ones(b.num_rows, np.int64))})
        return (pa.TableGroupBy(t, "vertex").aggregate([("c", "sum")])
                .rename_columns(["vertex", "c"]))

    counts = (inside.map_batches(_cnt, batch_format="pyarrow",
                                 batch_size=None)
              .union(universe_zeros(universe, "c"))
              .groupby("vertex").sum("c"))

    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vertex" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "scan_nb": pa.array([], pa.int64())})
        return pa.table({"vertex": b["vertex"],
                         "scan_nb": pc.cast(b["sum(c)"], pa.int64())})

    return counts.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def assortativity_values(graph: Graph, values: ray.data.Dataset,
                         directed: bool = True,
                         num_partitions: int = 8) -> float:
    """igraph_assortativity (mixing.c:28, the arbitrary-vertex-values
    variant): Pearson correlation of (value[src], value[dst]) over
    edges — directed edges as-is, undirected graphs with each edge
    counted in both orientations (the reference's symmetrized sums).
    ``values`` is a (vertex, value) Dataset; the moments are partial
    per-batch sums, so nothing materializes on the driver."""
    edges = graph.without_loops()
    if not directed:
        def _both(b: pa.Table) -> pa.Table:
            s = b["src"].to_numpy(zero_copy_only=False)
            d = b["dst"].to_numpy(zero_copy_only=False)
            return pa.table({"src": pa.array(np.concatenate([s, d])),
                             "dst": pa.array(np.concatenate([d, s]))})

        edges = edges.map_batches(_both, batch_format="pyarrow",
                                  batch_size=None)
    vx = values.map_batches(
        lambda b: pa.table({"src": b["vertex"], "dx": b["value"]}),
        batch_format="pyarrow", batch_size=None)
    vy = values.map_batches(
        lambda b: pa.table({"dst": b["vertex"], "dy": b["value"]}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(edges, vx, on="src", num_partitions=num_partitions)
    j = hash_join(j, vy, on="dst", num_partitions=num_partitions)

    def _moments(b: pa.Table) -> pa.Table:
        x = b["dx"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = b["dy"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "n": pa.array([float(len(x))], pa.float64()),
            "sx": pa.array([x.sum()], pa.float64()),
            "sy": pa.array([y.sum()], pa.float64()),
            "sxx": pa.array([(x * x).sum()], pa.float64()),
            "syy": pa.array([(y * y).sum()], pa.float64()),
            "sxy": pa.array([(x * y).sum()], pa.float64()),
        })

    m = j.map_batches(_moments, batch_format="pyarrow",
                      batch_size=None).materialize()
    s = _aggregate(m, ["n", "sx", "sy", "sxx", "syy", "sxy"])
    n = s["n"]
    if n == 0:
        return float("nan")
    cov = s["sxy"] / n - (s["sx"] / n) * (s["sy"] / n)
    vxv = s["sxx"] / n - (s["sx"] / n) ** 2
    vyv = s["syy"] / n - (s["sy"] / n) ** 2
    if vxv <= 0 or vyv <= 0:
        return float("nan")
    return cov / np.sqrt(vxv * vyv)


def similarity_over_edges(graph: Graph, method: str = "jaccard",
                          num_partitions: int = 8,
                          broadcast_threshold: Optional[int] = None
                          ) -> ray.data.Dataset:
    """igraph_similarity_jaccard_es / _dice_es (similarity.c): the
    endpoint-pair similarity of every edge — |N(u) ∩ N(v)| over the
    union (Jaccard) or 2∩/(deg+deg) (Dice), undirected neighbor sets,
    loops dropped. The intersection counts come from the degree-rank-
    oriented triangle plan (each triangle credits its three edges, and
    the (deg, id) orientation bounds per-vertex wedge work by
    arboricity, not by vertex-id order).
    Two plans, mirroring triangle_counts: a broadcast plan (edge keys
    + degrees assembled once in a task, wedges closed by sorted-key
    membership, zero joins) below ``broadcast_threshold`` edges with
    ids < 2^32, and the hash-join plan above it.
    Returns (lo, hi, inter, sim_e6) — the intersection count as an
    exact integer plus the 1e6-scaled integer-division similarity."""
    assert method in ("jaccard", "dice")
    from igraph_ray.algorithms.triangles import BROADCAST_THRESHOLD
    if broadcast_threshold is None:
        broadcast_threshold = BROADCAST_THRESHOLD

    # canonical_undirected is already distinct (lo, hi); materialize it
    # once — every downstream view (degree count, the wedge legs)
    # re-reads the blocks instead of re-running the dedup shuffle
    und = graph.canonical_undirected().materialize()
    n_edges = und.count()
    if n_edges <= broadcast_threshold and (
            n_edges == 0 or int(und.max("hi")) < 2**32):
        return _sim_edges_broadcast(und, method, num_partitions)
    return _sim_edges_join(und, method, num_partitions)


def _sim_edges_broadcast(und, method: str,
                         num_partitions: int) -> ray.data.Dataset:
    """Broadcast similarity plan: one _pack_edges task builds the
    sorted uint64 edge-key array + dense degree lookup; orientation and
    wedge closing are per-batch vectorized lookups (no joins); the only
    shuffle is the (lo, hi) credit groupby plus one broadcast join of
    the credits back onto the edge table."""
    from igraph_ray.algorithms.triangles import _gen_wedges, _pack_edges
    from igraph_ray.csr import compute_boundaries

    refs = und.to_arrow_refs()
    deg_ref, keys_ref = _pack_edges.remote(refs, True)

    def _orient(b: pa.Table) -> pa.Table:
        side = ray.get(deg_ref)
        ids, deg = side["ids"], side["deg"]
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        dlo = deg[np.searchsorted(ids, lo)]
        dhi = deg[np.searchsorted(ids, hi)]
        lo_first = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
        u = np.where(lo_first, lo, hi)
        v = np.where(lo_first, hi, lo)
        dv = np.where(lo_first, dhi, dlo)
        return pa.table(
            {"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64()),
             "dv": pa.array(dv.astype(np.int64), pa.int64())})

    oriented = und.map_batches(_orient, batch_format="pyarrow",
                               batch_size=None).materialize()
    bnds = compute_boundaries(oriented, num_partitions, col="u")
    osorted = (oriented.sort("u", boundaries=bnds) if bnds
               else oriented.sort("u"))

    def _wedge_credit(b: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        a_idx, b_idx, u, v = _gen_wedges(b)
        if a_idx is None:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        wa, wb, wc = v[a_idx], v[b_idx], u[a_idx]
        klo = np.minimum(wa, wb).astype(np.uint64)
        khi = np.maximum(wa, wb).astype(np.uint64)
        wkey = (klo << np.uint64(32)) | khi
        pos = np.searchsorted(keys, wkey)
        pos[pos >= len(keys)] = len(keys) - 1
        hit = keys[pos] == wkey
        wa, wb, wc = wa[hit], wb[hit], wc[hit]
        e1 = np.concatenate([wc, wc, wa])
        e2 = np.concatenate([wa, wb, wb])
        t = pa.table({
            "lo": pa.array(np.minimum(e1, e2).astype(np.int64)),
            "hi": pa.array(np.maximum(e1, e2).astype(np.int64)),
            "c": pa.array(np.ones(3 * len(wa), np.int64))})
        return (t.group_by(["lo", "hi"]).aggregate([("c", "sum")])
                .rename_columns(["lo", "hi", "c"]))

    inter = (osorted.map_batches(_wedge_credit, batch_format="pyarrow",
                                 batch_size=None)
             .groupby(["lo", "hi"]).sum("c"))
    inter = inter.map_batches(
        lambda b: (pa.table({"lo": b["lo"], "hi": b["hi"],
                             "inter": b["sum(c)"]})
                   if b.num_rows else
                   pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "inter": pa.array([], pa.int64())})),
        batch_format="pyarrow", batch_size=None)

    def _base(b: pa.Table) -> pa.Table:
        side = ray.get(deg_ref)
        ids, deg = side["ids"], side["deg"]
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        return pa.table({
            "lo": b["lo"], "hi": b["hi"],
            "du": pa.array(deg[np.searchsorted(ids, lo)].astype(np.int64)),
            "dv": pa.array(deg[np.searchsorted(ids, hi)].astype(np.int64))})

    base = und.map_batches(_base, batch_format="pyarrow", batch_size=None)
    j = hash_join(base, inter, on=("lo", "hi"),
                  num_partitions=num_partitions, join_type="left_outer")
    return j.map_batches(_make_sim_final(method), batch_format="pyarrow",
                         batch_size=None)


def _sim_edges_join(und, method: str,
                    num_partitions: int) -> ray.data.Dataset:
    """Hash-join similarity plan (the scale path): triangles.py's
    degree-rank-oriented triangle stream credits each triangle's three
    edges; return_oriented hands back per-edge endpoint degrees, so no
    further degree joins are needed."""
    from igraph_ray.algorithms.triangles import oriented_triangle_stream

    tri, oriented = oriented_triangle_stream(und, num_partitions,
                                             return_oriented=True)

    def _credit(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "wa" not in b.column_names:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        # triangle (wc; wa, wb): endpoints are (deg,id)-rank ordered,
        # not id ordered — canonicalize each credited edge to lo < hi
        wa = b["wa"].to_numpy(zero_copy_only=False).astype(np.int64)
        wb = b["wb"].to_numpy(zero_copy_only=False).astype(np.int64)
        wc = b["wc"].to_numpy(zero_copy_only=False).astype(np.int64)
        e1 = np.concatenate([wc, wc, wa])
        e2 = np.concatenate([wa, wb, wb])
        t = pa.table({
            "lo": pa.array(np.minimum(e1, e2)),
            "hi": pa.array(np.maximum(e1, e2)),
            "c": pa.array(np.ones(3 * len(wa), np.int64))})
        return (t.group_by(["lo", "hi"]).aggregate([("c", "sum")])
                .rename_columns(["lo", "hi", "c"]))

    inter = (tri.map_batches(_credit, batch_format="pyarrow",
                             batch_size=None)
             .groupby(["lo", "hi"]).sum("c"))
    inter = inter.map_batches(
        lambda b: (pa.table({"lo": b["lo"], "hi": b["hi"],
                             "inter": b["sum(c)"]})
                   if b.num_rows else
                   pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "inter": pa.array([], pa.int64())})),
        batch_format="pyarrow", batch_size=None)
    # oriented rows are the edge table itself with both endpoint
    # degrees attached — canonicalize back to (lo, hi) and join only
    # the intersection counts (jaccard/dice need du+dv, order-free)
    base = oriented.map_batches(
        lambda b: pa.table({
            "lo": pa.array(np.minimum(
                b["u"].to_numpy(zero_copy_only=False),
                b["v"].to_numpy(zero_copy_only=False))),
            "hi": pa.array(np.maximum(
                b["u"].to_numpy(zero_copy_only=False),
                b["v"].to_numpy(zero_copy_only=False))),
            "du": b["du"], "dv": b["dv"]}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(base, inter, on=("lo", "hi"),
                  num_partitions=num_partitions, join_type="left_outer")
    return j.map_batches(_make_sim_final(method), batch_format="pyarrow",
                         batch_size=None)


def _make_sim_final(method: str):
    """Shared final kernel of both similarity plans: fold the (possibly
    absent) intersection counts with the endpoint degrees into the
    integer-exact 1e6-scaled similarity."""

    def _sim(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "inter": pa.array([], pa.int64()),
                             "sim_e6": pa.array([], pa.int64())})
        if "inter" in b.column_names:
            it = pc.fill_null(pc.cast(b["inter"], pa.int64()),
                              0).to_numpy(zero_copy_only=False)
        else:
            # a triangle-free graph leaves the inter side of the
            # left-outer join fully empty — blocks then carry no
            # "inter" column at all
            it = np.zeros(b.num_rows, np.int64)
        du = b["du"].to_numpy(zero_copy_only=False).astype(np.int64)
        dv = b["dv"].to_numpy(zero_copy_only=False).astype(np.int64)
        if method == "jaccard":
            den = du + dv - it
        else:
            den = du + dv
        num = it if method == "jaccard" else 2 * it
        sim = np.where(den > 0, (num * 1_000_000) // np.maximum(den, 1), 0)
        return pa.table({"lo": b["lo"], "hi": b["hi"],
                         "inter": pa.array(it),
                         "sim_e6": pa.array(sim.astype(np.int64))})

    return _sim
