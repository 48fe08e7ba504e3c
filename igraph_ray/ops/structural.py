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


def topological_peel(
    graph: Graph, max_iter: int = 10_000, num_partitions: int = 8
) -> Tuple[bool, ray.data.Dataset]:
    """Iteratively remove zero-in-degree vertices (Kahn peeling).

    Returns (is_dag, order) where order = (vertex, layer) for peeled
    vertices; is_dag is True iff every vertex was peeled
    (igraph_is_dag / igraph_topological_sorting,
    structural_properties.c:3379, 3287). Layered order: layer = peel round
    (a valid topological order when sorted by (layer, vertex)).
    """
    from igraph_ray.ops.relational import simplify

    edges = simplify(graph.edges).materialize()
    remaining_vertices = graph.vertices()
    layers = []
    total_peeled = 0
    n = graph.num_vertices()
    for layer in range(max_iter):
        if edges.count() == 0:
            # everything left has no edges: peel the rest at once
            def _final(b: pa.Table, layer=layer) -> pa.Table:
                return pa.table(
                    {"vertex": b["vertex"],
                     "layer": pa.array(np.full(b.num_rows, layer, dtype=np.int64))}
                )
            layers.append(remaining_vertices.map_batches(_final, batch_format="pyarrow", batch_size=None).materialize())
            total_peeled += remaining_vertices.count()
            break
        ideg = _degrees_over(edges, "dst", remaining_vertices, False)
        zero = ideg.filter(expr="deg == 0.0").select_columns(["vertex"]).materialize()
        nzero = zero.count()
        if nzero == 0:
            break  # cycle: not a DAG
        def _tag(b: pa.Table, layer=layer) -> pa.Table:
            return pa.table(
                {"vertex": b["vertex"],
                 "layer": pa.array(np.full(b.num_rows, layer, dtype=np.int64))}
            )
        layers.append(zero.map_batches(_tag, batch_format="pyarrow", batch_size=None).materialize())
        total_peeled += nzero

        def _vs(b: pa.Table) -> pa.Table:
            return pa.table({"src": b["vertex"], "_z": pa.array(np.ones(b.num_rows, dtype=np.int8))})

        marked = hash_join(
            edges, zero.map_batches(_vs, batch_format="pyarrow", batch_size=None),
            on="src", num_partitions=num_partitions, join_type="left_outer",
        )

        def _keep(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return b.filter(pc.is_null(b["_z"])).select(["src", "dst"])

        edges = marked.map_batches(_keep, batch_format="pyarrow", batch_size=None).materialize()
        # remaining universe shrinks
        mkeep = hash_join(
            remaining_vertices,
            zero.map_batches(lambda b: pa.table({"vertex": b["vertex"],
                                                 "_z": pa.array(np.ones(b.num_rows, dtype=np.int8))}),
                             batch_format="pyarrow", batch_size=None),
            on="vertex", num_partitions=num_partitions, join_type="left_outer",
        )

        def _rv(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return b.filter(pc.is_null(b["_z"])).select(["vertex"])

        remaining_vertices = mkeep.map_batches(_rv, batch_format="pyarrow", batch_size=None).materialize()

    if not layers:
        order = ray.data.from_arrow(
            pa.table({"vertex": pa.array([], pa.int64()), "layer": pa.array([], pa.int64())})
        )
    else:
        order = layers[0]
        for l in layers[1:]:
            order = order.union(l)
    return total_peeled == n, order


def k_core(graph: Graph, k: int, max_iter: int = 10_000, num_partitions: int = 8) -> ray.data.Dataset:
    """Vertices of the k-core: iteratively drop vertices with undirected
    degree < k (cores.c:31). Returns (vertex,)."""
    from igraph_ray.ops.relational import _dedup

    und = _dedup(graph.symmetrized(drop_loops=True)).materialize()
    for _ in range(max_iter):
        if und.count() == 0:
            break
        degc = und.groupby("src").count()

        def _rn(b: pa.Table) -> pa.Table:
            return pa.table({"src": b["src"], "d": b["count()"]})

        deg = degc.map_batches(_rn, batch_format="pyarrow", batch_size=None)
        low = deg.filter(expr=f"d < {k}").select_columns(["src"]).materialize()
        if low.count() == 0:
            break

        def _m(b: pa.Table) -> pa.Table:
            return pa.table({"src": b["src"], "_z": pa.array(np.ones(b.num_rows, dtype=np.int8))})

        marked = hash_join(und, low.map_batches(_m, batch_format="pyarrow", batch_size=None),
                           on="src", num_partitions=num_partitions, join_type="left_outer")

        def _k1(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return b.filter(pc.is_null(b["_z"])).select(["src", "dst"])

        half = marked.map_batches(_k1, batch_format="pyarrow", batch_size=None)

        def _m2(b: pa.Table) -> pa.Table:
            return pa.table({"dst": b["src"], "_z": pa.array(np.ones(b.num_rows, dtype=np.int8))})

        marked2 = hash_join(half, low.map_batches(_m2, batch_format="pyarrow", batch_size=None),
                            on="dst", num_partitions=num_partitions, join_type="left_outer")

        def _k2(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return b.filter(pc.is_null(b["_z"])).select(["src", "dst"])

        und = marked2.map_batches(_k2, batch_format="pyarrow", batch_size=None).materialize()

    def _v(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "src" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64())})
        return pa.table({"vertex": b["src"].combine_chunks().unique()})

    grouped = (
        und.map_batches(_v, batch_format="pyarrow", batch_size=None)
        .groupby("vertex").count().select_columns(["vertex"]).materialize()
    )
    # an all-empty groupby result carries a NULL schema (known Ray Data
    # sort-groupby artifact; empty blocks bypass map_batches UDFs) — an
    # empty k-core is returned as a typed empty dataset instead
    if grouped.count() == 0:
        return ray.data.from_arrow(pa.table({"vertex": pa.array([], pa.int64())}))
    return grouped
