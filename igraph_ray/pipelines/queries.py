"""The driver-facing query registry: one engine callable + one DuckDB
oracle SQL string per implemented operator (SURVEY.md §2 inventory +
training-data extensions). The driver runs both at sf=0.01 and compares
row count, schema, and order-insensitive value hashes — so:

- column names match exactly between engine and SQL;
- float-valued outputs are returned as scaled int64 columns (``*_e8``
  etc.) on BOTH sides so the hash comparison is exact;
- iterative algorithms run a FIXED iteration count matched by unrolled
  CTE chains in the SQL (machine-generated below), making the recurrence
  — not a convergence heuristic — the thing compared.

Non-SQL-expressible ops (MinHash/SimHash sketches, LSH ANN, corpus
extraction) have engine entries without oracles → rows-only checks.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.algorithms.components import component_sizes, connected_components
from igraph_ray.algorithms.lpa import label_propagation
from igraph_ray.algorithms.modularity import modularity
from igraph_ray.algorithms.pagerank import pagerank
from igraph_ray.algorithms.kcore import coreness
from igraph_ray.algorithms.paths import path_length_hist, sssp_hops
from igraph_ray.algorithms.scc import strongly_connected_components
from igraph_ray.algorithms.triangles import triangle_counts
from igraph_ray.graph import Graph
from igraph_ray.ops import dedup as dd
from igraph_ray.ops import relational as rel
from igraph_ray.ops import similarity as sim
from igraph_ray.ops import text as tx
from igraph_ray.ops import window as win
from igraph_ray.ops import curation as cu
from igraph_ray.pipelines import derive
from igraph_ray.pipelines.derive import (
    SQL_EDGES_A,
    SQL_EDGES_A_W,
    SQL_EDGES_B,
    SQL_EDGES_MULTI,
    SQL_EDGES_SPARSE,
    SQL_VERTS_A,
    V,
)

PR_ITERS = 30
LPA_ITERS = 8
DAMPING = 0.85
KNN_K = 5
KNN_QUERIES = 4


def _md5_fold15(h: str) -> str:
    """SQL expression folding the first 15 hex chars of md5 column
    ``h`` into a BIGINT — the engine's shared indexed-draw replay."""
    f = "CAST(0 AS BIGINT)"
    for k in range(1, 16):
        f = (f"(({f}) * 16 + "
             f"(strpos('0123456789abcdef', substr({h}, {k}, 1)) - 1))")
    return f


def _scale_col(ds: ray.data.Dataset, col: str, out: str, scale: float) -> ray.data.Dataset:
    def _f(b: pa.Table) -> pa.Table:
        v = np.round(b[col].to_numpy(zero_copy_only=False) * scale).astype(np.int64)
        t = b.drop_columns([col])
        return t.append_column(out, pa.array(v, pa.int64()))

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------- graph ops

def q_edge_table(sf_dir: str):
    return derive.edges_a(sf_dir)


def q_pajek_edges(sf_dir: str):
    """edge_table routed through a Pajek write -> read round trip
    (foreign.c:462-661/2456 semantics: 1-based ids, *Arcs section for
    directed graphs) — same SQL oracle as edge_table. The graph is
    declared with the dense universe n=V so the 1-based line ids map
    back to the original vertex ids verbatim."""
    import os
    import tempfile

    from igraph_ray.sources.pajek_dimacs import read_pajek, write_pajek

    g = Graph(derive.edges_a(sf_dir).materialize(), n=derive.V,
              attrs={"directed": True})
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        p = os.path.join(td, "a.net")
        write_pajek(g, p)
        g2, _verts = read_pajek(p)
        return g2.edges.materialize()


def q_graphdb_edges(sf_dir: str):
    """edge_table routed through a GraphDB binary write -> read round
    trip (igraph_read_graph_graphdb, foreign.c:893: 16-bit LE words,
    node count then per-node out-lists; dense 0-based ids preserved) —
    the last foreign format, proved against the same SQL oracle as
    edge_table."""
    import os
    import tempfile

    from igraph_ray.sources.graphdb import read_graphdb, write_graphdb

    g = derive.graph_a(sf_dir)
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        p = os.path.join(td, "a.graphdb")
        write_graphdb(g.edges, derive.V, p)
        ds, _n = read_graphdb(p)
        return ds.materialize()


def q_dimacs_arcs(sf_dir: str):
    """Weighted edge table routed through a DIMACS max-flow write ->
    read round trip (foreign.c:663-807/2395: 'p max', two 'n' lines,
    'a src dst cap', 1-based) — capacities are the integer weights of
    the weighted derivation, so the oracle is SQL_EDGES_A_W with the
    weight cast to BIGINT."""
    import os
    import tempfile

    from igraph_ray.sources.pajek_dimacs import read_dimacs, write_dimacs

    def _cap(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["src"], "dst": b["dst"],
                         "capacity": b["weight"]})

    arcs = derive.edges_a_weighted(sf_dir).map_batches(
        _cap, batch_format="pyarrow", batch_size=None).materialize()
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        p = os.path.join(td, "a.dimacs")
        write_dimacs(arcs, source=0, target=1, path=p, n=derive.V)
        rd, _s, _t, _n, _m = read_dimacs(p)

        def _out(b: pa.Table) -> pa.Table:
            cap = b["capacity"].to_numpy(zero_copy_only=False)
            return pa.table({"src": b["src"], "dst": b["dst"],
                             "weight": pa.array(np.round(cap).astype(np.int64))})

        return rd.map_batches(_out, batch_format="pyarrow",
                              batch_size=None).materialize()


def _remap_edges(edges, mapping: np.ndarray):
    """dense-id edges -> original ids via a broadcast int64 lookup array."""
    ref = ray.put(mapping)

    def _m(b: pa.Table) -> pa.Table:
        arr = ray.get(ref)
        src = arr[b["src"].to_numpy(zero_copy_only=False)]
        dst = arr[b["dst"].to_numpy(zero_copy_only=False)]
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    return edges.map_batches(_m, batch_format="pyarrow", batch_size=None)


def q_graphml_edges(sf_dir: str):
    """edge_table routed through a GraphML write -> read round trip
    (foreign-graphml.c semantics: first-appearance dense ids; node names
    carry the original id as n<id> like the reference's vertex-index
    naming) — proves the interchange path end-to-end against the same
    SQL oracle as edge_table."""
    import os
    import tempfile

    from igraph_ray.sources.graphml import read_graphml, write_graphml

    g = derive.graph_a(sf_dir)
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        p = os.path.join(td, "a.graphml")
        write_graphml(g, p, vertices=g.vertices())
        g2, verts = read_graphml(p)
        vt = verts.select_columns(["vertex", "name"]).to_pandas()
        mapping = np.empty(len(vt), np.int64)
        mapping[vt["vertex"].to_numpy()] = (
            vt["name"].str[1:].astype(np.int64).to_numpy())
        return _remap_edges(g2.edges, mapping).materialize()


def q_ncol_edges(sf_dir: str):
    """edge_table routed through an NCOL write -> read round trip
    (foreign.c:197/1477: symbolic names, first-appearance dense ids;
    names carry the original id as n<id>) — same SQL oracle as
    edge_table."""
    import os
    import tempfile

    from igraph_ray.graph import endpoint_universe
    from igraph_ray.sources.edgelist import read_ncol, write_ncol

    g = derive.graph_a(sf_dir)
    vocab = endpoint_universe(g.edges).map_batches(
        lambda b: pa.table({
            "vertex": b["vertex"],
            "name": pc.binary_join_element_wise(
                pa.array(["n"] * b.num_rows),
                pc.cast(b["vertex"], pa.string()), "")}),
        batch_format="pyarrow", batch_size=None)
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        p = os.path.join(td, "a.ncol")
        write_ncol(g.edges, p, vocab=vocab)
        e2, v2 = read_ncol(p)
        vt = v2.to_pandas()
        mapping = np.empty(len(vt), np.int64)
        mapping[vt["vertex"].to_numpy()] = (
            vt["name"].str[1:].astype(np.int64).to_numpy())
        return _remap_edges(e2, mapping).materialize()


def q_gml_edges(sf_dir: str):
    """edge_table routed through a GML write -> read round trip
    (foreign.c:1054/2489 semantics: node id keys preserved through the
    gml_id column) — same SQL oracle as edge_table."""
    import os
    import tempfile

    from igraph_ray.sources.gml import read_gml, write_gml

    g = derive.graph_a(sf_dir)
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        p = os.path.join(td, "a.gml")
        write_gml(g, p, vertices=g.vertices())
        g2, verts = read_gml(p)
        vt = verts.select_columns(["vertex", "gml_id"]).to_pandas()
        mapping = np.empty(len(vt), np.int64)
        mapping[vt["vertex"].to_numpy()] = vt["gml_id"].to_numpy()
        return _remap_edges(g2.edges, mapping).materialize()


def q_dl_edges(sf_dir: str):
    """edge_table routed through a UCINET DL write -> read round trip
    (foreign-dl-parser.y EDGELIST1 semantics: 1-based ids, directed) —
    same SQL oracle as edge_table. The DL header declares n=V so the
    1-based line ids map back to the original dense vertex ids."""
    import os
    import tempfile

    from igraph_ray.sources.dl_lgl import read_dl, write_dl

    g = Graph(derive.edges_a(sf_dir).materialize(), n=derive.V,
              attrs={"directed": True})
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        p = os.path.join(td, "a.dl")
        write_dl(g, p)
        g2, _verts = read_dl(p)
        return g2.edges.select_columns(["src", "dst"]).materialize()


def q_lgl_edges(sf_dir: str):
    """edge_table routed through an LGL write -> read round trip
    (foreign-lgl-parser.y: '# source' adjacency groups, names mapped to
    first-appearance dense ids) — the read permutes ids, so edges are
    mapped back through the name column; same SQL oracle as edge_table."""
    import os
    import tempfile

    from igraph_ray.sources.dl_lgl import read_lgl, write_lgl

    g = Graph(derive.edges_a(sf_dir).materialize(), n=derive.V,
              attrs={"directed": False})
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        p = os.path.join(td, "a.lgl")
        write_lgl(g, p)
        g2, verts = read_lgl(p)
        vt = verts.to_pandas()
        mapping = np.empty(len(vt), np.int64)
        mapping[vt["vertex"].to_numpy()] = vt["name"].astype(np.int64).to_numpy()
        return _remap_edges(g2.edges, mapping).materialize()


def q_leda_edges(sf_dir: str):
    """edge_table routed through a LEDA write -> read round trip
    (foreign.c:2580 writer layout: LEDA.GRAPH header, |{attr}| vertex
    lines, 1-based 's t rev |{w}|' edge lines) — same SQL oracle."""
    import os
    import tempfile

    from igraph_ray.sources.dl_lgl import read_leda, write_leda

    g = Graph(derive.edges_a(sf_dir).materialize(), n=derive.V,
              attrs={"directed": True})
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        p = os.path.join(td, "a.leda")
        write_leda(g, p)
        g2 = read_leda(p)
        return g2.edges.select_columns(["src", "dst"]).materialize()


def q_out_degree(sf_dir: str):
    g = derive.graph_a(sf_dir)
    deg = g.out_degrees()
    return _scale_col(deg, "deg", "deg", 1.0)  # integral counts → int64


def q_in_degree(sf_dir: str):
    g = derive.graph_a(sf_dir)
    return _scale_col(g.in_degrees(), "deg", "deg", 1.0)


def q_pagerank(sf_dir: str):
    g = derive.graph_a(sf_dir)
    res = pagerank(g, damping=DAMPING, fixed_iterations=PR_ITERS, num_partitions=8)
    return _scale_col(res.state, "pr", "pr_e8", 1e8)


def q_pagerank_personalized(sf_dir: str):
    """Personalized PageRank (centrality.c:1284 reset-vector contract:
    teleport AND dangling mass land on the reset distribution): reset
    weight 1 on universe vertices with v % 7 == 0, 0 elsewhere."""
    g = derive.graph_a(sf_dir)
    verts = np.sort(np.array(
        [r["vertex"] for r in g.vertices().take_all()], dtype=np.int64
    ))
    reset = np.zeros(int(verts.max()) + 1, dtype=np.float64)
    sel = verts[verts % 7 == 0]
    reset[sel] = 1.0
    res = pagerank(g, damping=DAMPING, fixed_iterations=PR_ITERS,
                   num_partitions=8, reset=reset)
    return _scale_col(res.state, "pr", "pr_e8", 1e8)


def q_components(sf_dir: str):
    g = derive.graph_a(sf_dir)
    return connected_components(g, num_partitions=8).state


def q_scc(sf_dir: str):
    """Strong components over the directed edges_a digraph; labels follow
    the rank-of-min contract (components.c:164-316 semantics)."""
    g = derive.graph_a(sf_dir)
    return strongly_connected_components(g, num_partitions=8).state


def q_sssp_hops(sf_dir: str):
    """Single-source BFS hop distances from the min universe vertex over
    the directed edges_a digraph; reached vertices only
    (structural_properties.c:406-933 semantics)."""
    g = derive.graph_a(sf_dir)
    source = int(
        g.vertices().min("vertex")
    )
    return sssp_hops(g, source=source, num_partitions=8).state


def q_sssp_tree(sf_dir: str):
    """Shortest-path tree from the min universe vertex: (vertex, dist,
    parent) with parent = MIN predecessor one hop closer (deterministic
    tie-break; source parents itself) — igraph_get_shortest_paths'
    predecessor output (structural_properties.c BFS fathers)."""
    from igraph_ray.util import hash_join

    g = derive.graph_a(sf_dir)
    source = int(g.vertices().min("vertex"))
    st = sssp_hops(g, source=source, num_partitions=8).state.materialize()
    dsrc = st.map_batches(
        lambda b: pa.table({"src": b["vertex"], "d_s": b["dist"]}),
        batch_format="pyarrow", batch_size=None)
    ddst = st.map_batches(
        lambda b: pa.table({"dst": b["vertex"], "d_d": b["dist"]}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(derive.edges_a(sf_dir), dsrc, on="src", num_partitions=8)
    j = hash_join(j, ddst, on="dst", num_partitions=8)

    def _par(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "src" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "parent": pa.array([], pa.int64())})
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        ds_ = b["d_s"].to_numpy(zero_copy_only=False)
        dd_ = b["d_d"].to_numpy(zero_copy_only=False)
        keep = ds_ == dd_ - 1
        t = pa.table({"vertex": pa.array(d[keep]), "parent": pa.array(s[keep])})
        if t.num_rows == 0:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "parent": pa.array([], pa.int64())})
        return pa.TableGroupBy(t, ["vertex"]).aggregate([("parent", "min")]) \
            .rename_columns(["vertex", "parent"])

    par = j.map_batches(_par, batch_format="pyarrow", batch_size=None) \
        .groupby("vertex").min("parent")
    par = par.map_batches(
        lambda b: (pa.table({"vertex": b["vertex"],
                             "parent": b["min(parent)"]})
                   if b.num_rows and "vertex" in b.column_names
                   else pa.table({"vertex": pa.array([], pa.int64()),
                                  "parent": pa.array([], pa.int64())})),
        batch_format="pyarrow", batch_size=None)
    out = hash_join(st, par, on="vertex", num_partitions=8,
                    join_type="left_outer")

    def _fin(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vertex" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64()),
                             "parent": pa.array([], pa.int64())})
        v = b["vertex"].to_numpy(zero_copy_only=False)
        if "parent" in b.column_names:
            p = b["parent"].to_numpy(zero_copy_only=False)
            p = (np.where(np.isnan(p.astype(np.float64)), v, p).astype(np.int64)
                 if p.dtype != np.int64 else p)
        else:
            p = v
        return pa.table({"vertex": pa.array(v), "dist": b["dist"],
                         "parent": pa.array(p, pa.int64())})

    return out.map_batches(_fin, batch_format="pyarrow", batch_size=None)


def q_topo_levels(sf_dir: str):
    """Kahn peel layers over the acyclic src<dst view of the very-sparse
    digraph: layer = longest incoming path length — sorted by (layer,
    vertex) this is igraph_topological_sorting's deterministic order.
    Computed by max-propagation on the aligned superstep engine
    (paths.longest_path_layers), not driver-side peel rounds."""
    from igraph_ray.algorithms.paths import longest_path_layers

    dag = derive.edges_vsparse(sf_dir).filter(expr="src < dst").materialize()
    res = longest_path_layers(Graph(dag, n=None), num_partitions=8)
    return res.state


def q_sssp_weighted(sf_dir: str):
    """Single-source Dijkstra-semantics distances (weighted Bellman-Ford
    relaxation on the aligned engine) from the min universe vertex over
    the weighted edges_a digraph; reached vertices only. Weights are the
    integer-valued MIN((o_orderkey%10)+1) per edge, so dist is
    integer-valued and cast to int64 for the hash compare
    (structural_properties.c:1930 igraph_shortest_paths_dijkstra
    semantics)."""
    g = derive.graph_a_weighted(sf_dir)
    source = int(g.vertices().min("vertex"))
    st = sssp_hops(g, source=source, weighted=True, num_partitions=8).state

    def _cast(b: pa.Table) -> pa.Table:
        return pa.table(
            {"vertex": b["vertex"],
             "dist": pc.cast(pc.round(b["dist"]), pa.int64())}
        )

    return st.map_batches(_cast, batch_format="pyarrow", batch_size=None)


def q_sssp_negative(sf_dir: str):
    """Negative-weight single-source shortest paths (Bellman–Ford /
    Johnson semantics, structural_properties.c:2082
    igraph_shortest_paths_bellman_ford) over the ACYCLIC src<dst view
    of the sparse digraph — weights ((src·3+dst) mod 7) − 2 take
    values in [−2, 4], so some relaxations improve through negative
    edges; the DAG guarantee rules out negative cycles (the
    reference's precondition). The engine loop is the same min-plus
    fixpoint as sssp_weighted — relax-to-fixpoint IS Bellman–Ford, so
    negatives need no new kernel; the oracle unrolls the identical
    recurrence."""
    def _w(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = src < dst
        src, dst = src[keep], dst[keep]
        return pa.table({"src": pa.array(src), "dst": pa.array(dst),
                         "weight": pa.array((src * 3 + dst) % 7 - 2)})

    dag = derive.edges_sparse(sf_dir).map_batches(
        _w, batch_format="pyarrow", batch_size=None).materialize()
    g = Graph(dag, n=None, weighted=True)
    source = int(g.vertices().min("vertex"))
    st = sssp_hops(g, source=source, weighted=True, num_partitions=8).state

    def _cast(b: pa.Table) -> pa.Table:
        return pa.table(
            {"vertex": b["vertex"],
             "dist": pc.cast(pc.round(b["dist"]), pa.int64())})

    return st.map_batches(_cast, batch_format="pyarrow", batch_size=None)


def _sql_sssp_negative(iters: int = 30) -> str:
    edges = (f"SELECT src, dst, ((src * 3 + dst) % 7) - 2 AS weight "
             f"FROM ({derive.SQL_EDGES_SPARSE}) WHERE src < dst")
    parts = [
        f"WITH edges AS MATERIALIZED ({edges})",
        "verts AS MATERIALIZED (SELECT src AS v FROM edges "
        "UNION SELECT dst FROM edges)",
        f"h0 AS MATERIALIZED (SELECT v, CASE WHEN v = "
        f"(SELECT MIN(v) FROM verts) THEN 0 ELSE {_BIG} END AS d "
        f"FROM verts)",
    ]
    for k in range(1, iters + 1):
        p = f"h{k-1}"
        parts.append(
            f"h{k} AS MATERIALIZED (SELECT h.v, "
            f"LEAST(h.d, COALESCE(m.md, {_BIG})) AS d "
            f"FROM {p} h LEFT JOIN (SELECT e.dst AS v, "
            f"MIN(p.d + e.weight) AS md "
            f"FROM edges e JOIN {p} p ON p.v = e.src "
            f"WHERE p.d < {_BIG} GROUP BY e.dst) m ON m.v = h.v)")
    body = ",\n".join(parts)
    return (f"{body}\n"
            f"SELECT v AS vertex, CAST(d AS BIGINT) AS dist FROM h{iters} "
            f"WHERE d < {_BIG} ORDER BY vertex")


def q_apsp_johnson(sf_dir: str):
    """All-pairs shortest paths over the negative-weight acyclic
    fixture via Johnson's algorithm (igraph_shortest_paths_johnson,
    structural_properties.c:5396): virtual-source Bellman–Ford
    potentials, reweight w' = w + h(u) − h(v) ≥ 0 through hash joins,
    the weighted K-column min-plus sweep from every source on the
    non-negative graph, un-reweight on the long output. Same fixture
    as sssp_negative — the src<dst view of the sparse digraph with
    weights ((src·3+dst) mod 7) − 2 ∈ [−2, 4]; the DAG rules out
    negative cycles. Output (source, vertex, dist) over reachable
    ordered pairs, int64-exact; the oracle unrolls the identical
    min-plus recurrence from all sources."""
    from igraph_ray.algorithms.paths import johnson_apsp

    def _w(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = src < dst
        src, dst = src[keep], dst[keep]
        return pa.table({"src": pa.array(src), "dst": pa.array(dst),
                         "weight": pa.array((src * 3 + dst) % 7 - 2)})

    dag = derive.edges_sparse(sf_dir).map_batches(
        _w, batch_format="pyarrow", batch_size=None).materialize()
    g = Graph(dag, n=None, weighted=True)
    return johnson_apsp(g, num_partitions=8, chunk=128)


def _sql_apsp_johnson(iters: int = 30) -> str:
    edges = (f"SELECT src, dst, ((src * 3 + dst) % 7) - 2 AS weight "
             f"FROM ({derive.SQL_EDGES_SPARSE}) WHERE src < dst")
    parts = [
        f"WITH edges AS MATERIALIZED ({edges})",
        "verts AS MATERIALIZED (SELECT src AS v FROM edges "
        "UNION SELECT dst FROM edges)",
        f"h0 AS MATERIALIZED (SELECT s.v AS source, t.v AS vertex, "
        f"CASE WHEN s.v = t.v THEN 0 ELSE {_BIG} END AS d "
        f"FROM verts s, verts t)",
    ]
    for k in range(1, iters + 1):
        p = f"h{k-1}"
        parts.append(
            f"h{k} AS MATERIALIZED (SELECT h.source, h.vertex, "
            f"LEAST(h.d, COALESCE(m.md, {_BIG})) AS d "
            f"FROM {p} h LEFT JOIN (SELECT p.source, e.dst AS vertex, "
            f"MIN(p.d + e.weight) AS md "
            f"FROM edges e JOIN {p} p ON p.vertex = e.src "
            f"WHERE p.d < {_BIG} GROUP BY p.source, e.dst) m "
            f"ON m.source = h.source AND m.vertex = h.vertex)")
    body = ",\n".join(parts)
    return (f"{body}\n"
            f"SELECT source, vertex, CAST(d AS BIGINT) AS dist "
            f"FROM h{iters} WHERE d < {_BIG} ORDER BY source, vertex")


def q_path_length_hist(sf_dir: str):
    """Exact directed path-length histogram over ordered reachable pairs
    (igraph_path_length_hist, structural_properties.c:293)."""
    g = derive.graph_a(sf_dir)
    return path_length_hist(g, num_partitions=8, chunk=128)


def q_avg_path_length(sf_dir: str):
    """Mean directed shortest-path length over ordered reachable pairs
    (igraph_average_path_length, unconn pairs ignored): exact integer
    (total_pairs, dist_sum) plus the e9-scaled mean — one division on
    identical integers on both sides, so the hash is stable."""
    g = derive.graph_a(sf_dir)
    h = path_length_hist(g, num_partitions=8, chunk=128)
    ht = h if isinstance(h, pa.Table) else pa.concat_tables(
        ray.get(h.to_arrow_refs()))
    d = ht["dist"].to_numpy(zero_copy_only=False)
    c = ht["count"].to_numpy(zero_copy_only=False)
    tp = int(c.sum())
    ds_ = int((d * c).sum())
    avg = int(np.round(ds_ / tp * 1e9)) if tp else 0
    return pa.table({"total_pairs": pa.array([tp], pa.int64()),
                     "dist_sum": pa.array([ds_], pa.int64()),
                     "avg_e9": pa.array([avg], pa.int64())})


def q_transitivity_avglocal(sf_dir: str):
    """Average local clustering over vertices with degree ≥ 2
    (igraph_transitivity_avglocal_undirected, deg<2 excluded): output =
    (n_vertices, cc_sum_e9) where cc_sum_e9 = Σ per-vertex
    round_even(cc·1e9) — per-vertex rounding of a single double
    division is bit-identical in numpy and DuckDB, and the integer sum
    is exact, so the comparison is order-free."""
    from igraph_ray.ops.structural import transitivity_local

    cc = transitivity_local(derive.graph_a(sf_dir), num_partitions=8)

    def _int(b: pa.Table) -> pa.Table:
        v = b["cc_local"].to_numpy(zero_copy_only=False)
        fin = np.isfinite(v)
        e9 = np.round(v[fin] * 1e9).astype(np.int64)
        return pa.table({"n": pa.array([int(fin.sum())], pa.int64()),
                         "s": pa.array([int(e9.sum())], pa.int64())})

    parts = cc.map_batches(_int, batch_format="pyarrow", batch_size=None) \
        .take_all()
    n = sum(int(r["n"]) for r in parts)
    s = sum(int(r["s"]) for r in parts)
    return pa.table({"n_vertices": pa.array([n], pa.int64()),
                     "cc_sum_e9": pa.array([s], pa.int64())})


_BC_ITERS = 14


def q_betweenness(sf_dir: str):
    """Exact directed betweenness, Brandes over every source
    (centrality.c:1700-1900). The oracle computes the same quantity by
    the σ-triple-join pair formula — an independent algorithm."""
    from igraph_ray.algorithms.betweenness import betweenness

    g = derive.graph_a(sf_dir)
    bc = betweenness(g, num_partitions=8, chunk=64)
    return _scale_col(bc, "bc", "bc_e6", 1e6)


def _sql_betweenness(iters: int = _BC_ITERS) -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({SQL_EDGES_A})",
        f"verts AS MATERIALIZED ({SQL_VERTS_A})",
        "q0 AS MATERIALIZED (SELECT v AS s, v AS t, 0 AS d, CAST(1 AS DOUBLE) AS sig FROM verts)",
    ]
    for k in range(1, iters + 1):
        p = f"q{k-1}"
        parts.append(
            f"q{k} AS MATERIALIZED (SELECT s, t, d, sig FROM {p} UNION ALL "
            f"SELECT n.s, n.t, n.d, n.sig FROM ("
            f"SELECT p.s, e.dst AS t, {k} AS d, SUM(p.sig) AS sig "
            f"FROM {p} p JOIN edges e ON e.src = p.t WHERE p.d = {k-1} "
            f"GROUP BY p.s, e.dst) n "
            f"WHERE NOT EXISTS (SELECT 1 FROM {p} o WHERE o.s = n.s AND o.t = n.t))"
        )
    q = f"q{iters}"
    parts.append(
        f"bc AS (SELECT p1.t AS v, SUM(p1.sig * p2.sig / p3.sig) AS b "
        f"FROM {q} p1 JOIN {q} p2 ON p2.s = p1.t "
        f"JOIN {q} p3 ON p3.s = p1.s AND p3.t = p2.t AND p3.d = p1.d + p2.d "
        f"WHERE p1.s != p1.t AND p2.s != p2.t AND p1.s != p2.t GROUP BY p1.t)"
    )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT verts.v AS vertex, "
        f"CAST(round_even(COALESCE(b.b, 0)*1e6, 0) AS BIGINT) AS bc_e6 "
        f"FROM verts LEFT JOIN bc b ON b.v = verts.v ORDER BY vertex"
    )


def q_betweenness_sampled(sf_dir: str):
    """Source-sampled Brandes betweenness — the scale path for
    centrality at sizes where all-sources is impossible (Brandes–Pich
    style estimation): sources are the deterministic ~25% md5-prefix
    sample of the vertex set, partial dependencies reported un-scaled
    (the estimate is |V|/|S| × bcs). Same per-source chunk machinery as
    the exact query; the oracle restricts its pair formula to the same
    sample."""
    import hashlib as _hl

    from igraph_ray.algorithms.betweenness import betweenness

    g = derive.graph_a(sf_dir)

    def _samp(b: pa.Table) -> pa.Table:
        v = b["vertex"].to_numpy(zero_copy_only=False)
        keep = np.array([
            _hl.md5(str(int(x)).encode()).hexdigest()[0] < "4" for x in v])
        return pa.table({"vertex": pa.array(v[keep])})

    sources = sorted(int(r["vertex"]) for r in
                     g.vertices().map_batches(
                         _samp, batch_format="pyarrow",
                         batch_size=None).take_all())
    bc = betweenness(g, sources=sources, num_partitions=8, chunk=64)
    return _scale_col(bc, "bc", "bcs_e6", 1e6)


def _sql_betweenness_sampled(iters: int = _BC_ITERS) -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({SQL_EDGES_A})",
        f"verts AS MATERIALIZED ({SQL_VERTS_A})",
        "sample AS MATERIALIZED (SELECT v FROM verts "
        "WHERE substr(md5(CAST(v AS VARCHAR)), 1, 1) < '4')",
        "q0 AS MATERIALIZED (SELECT v AS s, v AS t, 0 AS d, "
        "CAST(1 AS DOUBLE) AS sig FROM verts)",
    ]
    for k in range(1, iters + 1):
        p = f"q{k-1}"
        parts.append(
            f"q{k} AS MATERIALIZED (SELECT s, t, d, sig FROM {p} UNION ALL "
            f"SELECT n.s, n.t, n.d, n.sig FROM ("
            f"SELECT p.s, e.dst AS t, {k} AS d, SUM(p.sig) AS sig "
            f"FROM {p} p JOIN edges e ON e.src = p.t WHERE p.d = {k-1} "
            f"GROUP BY p.s, e.dst) n "
            f"WHERE NOT EXISTS (SELECT 1 FROM {p} o WHERE o.s = n.s AND o.t = n.t))"
        )
    q = f"q{iters}"
    parts.append(
        f"bc AS (SELECT p1.t AS v, SUM(p1.sig * p2.sig / p3.sig) AS b "
        f"FROM {q} p1 JOIN {q} p2 ON p2.s = p1.t "
        f"JOIN {q} p3 ON p3.s = p1.s AND p3.t = p2.t AND p3.d = p1.d + p2.d "
        f"WHERE p1.s != p1.t AND p2.s != p2.t AND p1.s != p2.t "
        f"AND p1.s IN (SELECT v FROM sample) GROUP BY p1.t)"
    )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT verts.v AS vertex, "
        f"CAST(round_even(COALESCE(b.b, 0)*1e6, 0) AS BIGINT) AS bcs_e6 "
        f"FROM verts LEFT JOIN bc b ON b.v = verts.v ORDER BY vertex"
    )


_EBC_ITERS = 12


def _sql_edge_betweenness(iters: int = _EBC_ITERS) -> str:
    """Edge betweenness on the very-sparse derived digraph via the same
    unrolled-BFS σ table as the vertex oracle, then the edge pair
    formula: ebc(u→v) = Σ_{s,t} σ(s,u)·σ(v,t)/σ(s,t) over shortest
    s→t paths using the edge (d(s,u)+1+d(v,t) = d(s,t))."""
    parts = [
        f"WITH edges AS MATERIALIZED ({derive.SQL_EDGES_VSPARSE})",
        "verts AS MATERIALIZED (SELECT src AS v FROM edges UNION SELECT dst FROM edges)",
        "q0 AS MATERIALIZED (SELECT v AS s, v AS t, 0 AS d, CAST(1 AS DOUBLE) AS sig FROM verts)",
    ]
    for k in range(1, iters + 1):
        p = f"q{k-1}"
        parts.append(
            f"q{k} AS MATERIALIZED (SELECT s, t, d, sig FROM {p} UNION ALL "
            f"SELECT n.s, n.t, n.d, n.sig FROM ("
            f"SELECT p.s, e.dst AS t, {k} AS d, SUM(p.sig) AS sig "
            f"FROM {p} p JOIN edges e ON e.src = p.t WHERE p.d = {k-1} "
            f"GROUP BY p.s, e.dst) n "
            f"WHERE NOT EXISTS (SELECT 1 FROM {p} o WHERE o.s = n.s AND o.t = n.t))"
        )
    q = f"q{iters}"
    parts.append(
        f"ebc AS (SELECT e.src, e.dst, SUM(p1.sig * p2.sig / p3.sig) AS b "
        f"FROM edges e "
        f"JOIN {q} p1 ON p1.t = e.src "
        f"JOIN {q} p2 ON p2.s = e.dst "
        f"JOIN {q} p3 ON p3.s = p1.s AND p3.t = p2.t "
        f"AND p3.d = p1.d + 1 + p2.d "
        f"GROUP BY e.src, e.dst)"
    )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT e.src, e.dst, "
        f"CAST(round_even(COALESCE(b.b, 0)*1e6, 0) AS BIGINT) AS ebc_e6 "
        f"FROM edges e LEFT JOIN ebc b ON b.src = e.src AND b.dst = e.dst "
        f"ORDER BY e.src, e.dst"
    )


def q_edge_betweenness(sf_dir: str):
    """Exact directed edge betweenness on the very-sparse derived graph
    (centrality.c edge variant; oracle = σ pair formula over the edge)."""
    from igraph_ray.algorithms.betweenness import edge_betweenness

    g = derive.graph_vsparse(sf_dir)
    ebc = edge_betweenness(g, num_partitions=8, chunk=64)
    return _scale_col(ebc, "ebc", "ebc_e6", 1e6)


def q_closeness(sf_dir: str):
    """Directed (out-mode) closeness = reached/Σdist over reachable,
    self excluded; unreachable-from sources omitted (igraph_closeness
    semantics)."""
    from igraph_ray.algorithms.paths import closeness_centrality

    g = derive.graph_a(sf_dir)
    out = closeness_centrality(g, variant="out", num_partitions=8)
    return _scale_col(out, "closeness", "closeness_e8", 1e8)


def q_harmonic(sf_dir: str):
    """Directed harmonic centrality Σ 1/d via the exact lcm(1..20)
    integer numerator (igraph_harmonic_centrality semantics)."""
    from igraph_ray.algorithms.paths import _HARMONIC_LCM, harmonic_centrality

    g = derive.graph_a(sf_dir)
    num = harmonic_centrality(g, variant="out", num_partitions=8,
                              return_numerator=True)

    def _f(b: pa.Table) -> pa.Table:
        n = b["hnum"].to_numpy(zero_copy_only=False)
        v = np.round(n.astype(np.float64) * 1e8 / _HARMONIC_LCM).astype(np.int64)
        return pa.table({"vertex": b["vertex"],
                         "harmonic_e8": pa.array(v, pa.int64())})

    return num.map_batches(_f, batch_format="pyarrow", batch_size=None)


def q_eccentricity(sf_dir: str):
    """Directed (out-mode) eccentricity = max hop distance to any
    reachable vertex (igraph_eccentricity restricted to IGRAPH_OUT)."""
    from igraph_ray.algorithms.paths import eccentricity

    g = derive.graph_a(sf_dir)
    return eccentricity(g, variant="out", num_partitions=8)


def q_diameter(sf_dir: str):
    """Directed diameter + radius over finite distances
    (igraph_diameter / igraph_radius, unreachable pairs ignored)."""
    from igraph_ray.algorithms.paths import diameter_radius

    g = derive.graph_a(sf_dir)
    return diameter_radius(g, variant="out", num_partitions=8)


def q_density(sf_dir: str):
    """Directed density m/(n(n-1)) over the observed vertex universe,
    loops impossible by construction (igraph_density,
    structural_properties.c:2823); exact integers + one scaled
    division."""
    g = derive.graph_a(sf_dir)
    m = int(g.edges.count())
    n = int(g.vertices().count())
    d_e9 = int(np.round(m / (n * (n - 1)) * 1e9))
    return pa.table({"n": pa.array([n], pa.int64()),
                     "m": pa.array([m], pa.int64()),
                     "density_e9": pa.array([d_e9], pa.int64())})


def q_is_forest(sf_dir: str):
    """(is_forest, is_tree) of the simple undirected view of the
    very-sparse graph: forest ⇔ |E| = |V| − #components, tree adds
    connectedness (igraph_is_forest / igraph_is_tree)."""
    g = derive.graph_vsparse(sf_dir)
    und = g.canonical_undirected().materialize()
    m = int(und.count())
    n = int(g.vertices().count())
    ncomp = int(
        connected_components(g, num_partitions=8, densify=False)
        .state.map_batches(
            lambda b: pa.table({"label": b["label"]}),
            batch_format="pyarrow", batch_size=None)
        .groupby("label").count().count())
    forest = 1 if m == n - ncomp else 0
    tree = 1 if (forest and ncomp == 1) else 0
    return pa.table({"is_forest": pa.array([forest], pa.int64()),
                     "is_tree": pa.array([tree], pa.int64())})


def q_transitive_closure(sf_dir: str):
    """Directed transitive closure of the very-sparse digraph: ordered
    reachable pairs, self excluded (igraph_transitive_closure; the
    chunked K-column BFS stream projected to (src, dst))."""
    from igraph_ray.algorithms.paths import multi_source_hops

    g = derive.graph_vsparse(sf_dir)
    srcs = sorted(int(r["vertex"]) for r in g.vertices().take_all())
    ds = multi_source_hops(g, srcs, num_partitions=8)

    def _proj(b: pa.Table) -> pa.Table:
        s = b["source"].to_numpy(zero_copy_only=False)
        v = b["vertex"].to_numpy(zero_copy_only=False)
        keep = s != v
        return pa.table({"src": pa.array(s[keep]), "dst": pa.array(v[keep])})

    return ds.map_batches(_proj, batch_format="pyarrow", batch_size=None)


def q_graph_center(sf_dir: str):
    """Center vertices = out-mode eccentricity equal to the radius
    (igraph_graph_center restricted to IGRAPH_OUT, vertices with at
    least one reachable target)."""
    from igraph_ray.algorithms.paths import eccentricity

    g = derive.graph_a(sf_dir)
    ecc = eccentricity(g, variant="out", num_partitions=8).materialize()
    radius = int(ecc.min("ecc"))
    return ecc.filter(expr=f"ecc == {radius}").select_columns(["vertex"])


def q_assortativity_nominal(sf_dir: str):
    """Nominal (categorical) assortativity with type = vertex % 7
    (igraph_assortativity_nominal, directed): r = (m·Σe_ii − Σa_i·b_i)
    / (m² − Σa_i·b_i) computed from exact integer mixing counts, one
    final double division on both sides."""
    K = 7
    edges = derive.edges_a(sf_dir)

    def _mix(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False) % K
        d = b["dst"].to_numpy(zero_copy_only=False) % K
        code = s * K + d
        cnt = np.bincount(code, minlength=K * K).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({"code": pa.array(nz.astype(np.int64)),
                         "c": pa.array(cnt[nz])})

    rows = edges.map_batches(_mix, batch_format="pyarrow", batch_size=None) \
        .groupby("code").sum("c").take_all()
    full = np.zeros(K * K, np.int64)
    for r in rows:
        full[int(r["code"])] = int(r["sum(c)"])
    e = full.reshape(K, K)
    m = int(e.sum())
    s_ii = int(np.trace(e))
    s_ab = int((e.sum(axis=1) * e.sum(axis=0)).sum())
    r_e9 = int(np.round((s_ii * m - s_ab) / (m * m - s_ab) * 1e9))
    return pa.table({"nominal_e9": pa.array([r_e9], pa.int64())})


def q_triangle_list(sf_dir: str):
    """All triangles of the thinned undirected simple view as canonical
    (a < b < c) triples (igraph_list_triangles; the wedge-join physical
    plan shared with the count/clique operators)."""
    from igraph_ray.util import hash_join

    und = derive.graph_sparse(sf_dir).canonical_undirected().materialize()
    e1 = und.map_batches(
        lambda b: pa.table({"a": b["lo"], "b": b["hi"]}),
        batch_format="pyarrow", batch_size=None)
    e2 = und.map_batches(
        lambda b: pa.table({"b": b["lo"], "c": b["hi"]}),
        batch_format="pyarrow", batch_size=None)
    w = hash_join(e1, e2, on="b", num_partitions=8)
    e3 = und.map_batches(
        lambda b: pa.table({"a": b["lo"], "c": b["hi"]}),
        batch_format="pyarrow", batch_size=None)
    tri = hash_join(w, e3, on=["a", "c"], num_partitions=8)

    def _cols(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "a" not in b.column_names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        return pa.table({"a": b["a"], "b": b["b"], "c": b["c"]})

    out = tri.map_batches(_cols, batch_format="pyarrow",
                          batch_size=None).materialize()
    if out.count() == 0:  # keep the (a,b,c) schema visible when empty
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())})
    return out


def q_component_sizes(sf_dir: str):
    g = derive.graph_a(sf_dir)
    st = connected_components(g, num_partitions=8).state
    return component_sizes(st)


def q_lpa(sf_dir: str):
    g = derive.graph_a(sf_dir)
    return label_propagation(g, fixed_iterations=LPA_ITERS, num_partitions=8).state


def q_louvain(sf_dir: str):
    """Pinned-replay multilevel Louvain (community.c:2854 recurrence)
    over the undirected view of edges_a: exactly 2 local-moving sweeps
    at level 1, a community contraction, and 1 sweep on the coarse
    graph, all with the exact int64 gain comparator — the full
    multilevel machinery (sweep + coarsen + label composition) with the
    data-dependent stopping rules pinned so the driver oracle replays
    it in unrolled CTEs, hash-checked. The adaptive full algorithm is
    ``louvain_full`` (rows-only by nature); quality gates
    (planted-partition recovery, karate modularity floor) live in
    tests/test_louvain.py."""
    from igraph_ray.algorithms.louvain import louvain_pinned

    g = derive.graph_a(sf_dir)
    return louvain_pinned(g, level_sweeps=(2, 1),
                          num_partitions=8).sort("vertex")


def q_louvain_full(sf_dir: str):
    """Adaptive multilevel Louvain (community.c:2854 analogue) over the
    undirected view of edges_a — the user-facing full algorithm with
    data-dependent sweep/level stopping rules (rows-only by nature: a
    fixed SQL text cannot adapt its unroll depth; the float gain
    comparator is additionally summation-order sensitive). The pinned
    recurrence is driver-checked hash-green via ``louvain`` and
    ``louvain_sweeps``."""
    from igraph_ray.algorithms.louvain import louvain

    g = derive.graph_a(sf_dir)
    return louvain(g, num_partitions=8).state


def q_leiden(sf_dir: str):
    """Pinned-replay one-round Leiden (Traag, Waltman & van Eck, Sci
    Rep 2019) over the undirected view of edges_a: exactly one
    full-activation local-moving sweep from singletons, then exactly
    one constrained refinement sweep (intra-community edge subset,
    singleton_movers + cancel_vacated — the Leiden connectivity
    guards), both with the exact int64 gain comparator, so the driver
    oracle replays the round in CTEs hash-checked. Returns
    (vertex, community, refined). The adaptive full algorithm is
    ``leiden_full``; Leiden-specific guarantees (refined-community
    connectivity, planted recovery, Q >= Louvain) are pytest-gated in
    tests/test_leiden.py."""
    from igraph_ray.algorithms.leiden import leiden_pinned

    g = derive.graph_a(sf_dir)
    return leiden_pinned(g, num_partitions=8).sort("vertex")


def q_leiden_full(sf_dir: str):
    """Adaptive multilevel Leiden over the undirected view of edges_a —
    the user-facing full algorithm (rows-only by nature: sweep/level
    counts are data-dependent stopping rules, same impossibility note
    as ``louvain_full``). The one-round recurrence with the Leiden
    refinement guards is driver-checked hash-green via ``leiden``."""
    from igraph_ray.algorithms.leiden import leiden

    g = derive.graph_a(sf_dir)
    return leiden(g, num_partitions=8).state


def q_spinglass(sf_dir: str):
    """Pinned-replay T=0 spin quench of the Reichardt–Bornholdt Potts
    model (clustertool.cpp:98 greedy spin-update semantics) over the
    undirected view of edges_a: exactly 2 synchronous quench sweeps at
    the exact rational resolution gamma = 3/2, compared as the int64
    quantity den·m2·k_vc − num·deg·vol_eff (H-minimization for the
    configuration null model equals gamma-modularity maximization, RB
    PRE 74:016110 §III), so the driver oracle replays the quench
    bit-for-bit in CTEs. The adaptive multilevel quench is
    ``spinglass_full``; gamma-specific behavior (planted recovery,
    resolution monotonicity on a ring of cliques) is pytest-gated in
    tests/test_spinglass.py."""
    from igraph_ray.algorithms.spinglass import spinglass_sweeps

    g = derive.graph_a(sf_dir)
    return spinglass_sweeps(g, gamma_num=3, gamma_den=2, sweeps=2,
                            num_partitions=8).sort("vertex")


def q_spinglass_full(sf_dir: str):
    """Adaptive multilevel T=0 RB quench at gamma=1.5 over the
    undirected view of edges_a — the user-facing full algorithm
    (rows-only by nature: data-dependent sweep/level stopping rules,
    same impossibility note as ``louvain_full``). The quench-sweep
    recurrence is driver-checked hash-green via ``spinglass``."""
    from igraph_ray.algorithms.spinglass import spinglass_quench

    g = derive.graph_a(sf_dir)
    return spinglass_quench(g, gamma=1.5, num_partitions=8).state


def q_triangles(sf_dir: str):
    g = derive.graph_a(sf_dir)
    return triangle_counts(g, num_partitions=8)


def q_modularity(sf_dir: str):
    g = derive.graph_a(sf_dir)
    st = connected_components(g, num_partitions=8).state

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"], "community": b["label"]})

    q = modularity(g.edges, st.map_batches(_rn, batch_format="pyarrow", batch_size=None))
    return pa.table({"q_e9": pa.array([int(round(q * 1e9))], pa.int64())})


def q_lpa_weighted(sf_dir: str):
    """Weighted synchronous LPA (community.c:2257-2278 weight tally) over
    the weighted edge view — integer weights keep the per-(dst,label)
    sums exact, so the argmax tie-break is deterministic in SQL too."""
    g = derive.graph_a_weighted(sf_dir)
    return label_propagation(g, fixed_iterations=LPA_ITERS,
                             num_partitions=8).state


def q_modularity_weighted(sf_dir: str):
    """Weighted modularity (community.c:875-941 weights branch) of the
    weak-component partition over the weighted edge view."""
    g = derive.graph_a(sf_dir)
    st = connected_components(g, num_partitions=8).state

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"], "community": b["label"]})

    q = modularity(
        derive.edges_a_weighted(sf_dir),
        st.map_batches(_rn, batch_format="pyarrow", batch_size=None),
        weighted=True)
    return pa.table({"qw_e9": pa.array([int(round(q * 1e9))], pa.int64())})


def q_dyad_census(sf_dir: str):
    """(mut, asym, null) dyad counts over edges_a with n = |universe|
    (motifs.c:848)."""
    n = derive.graph_a(sf_dir).num_vertices()
    return rel.dyad_census(derive.edges_a(sf_dir), n)


def q_reciprocity(sf_dir: str):
    r = rel.reciprocity(derive.edges_a(sf_dir))
    return pa.table({"reciprocity_e9": pa.array([int(round(r * 1e9))], pa.int64())})


def q_mutual_edges(sf_dir: str):
    return rel.mutual_edges(derive.edges_a(sf_dir))


def q_count_multiple(sf_dir: str):
    return rel.count_multiple(derive.edges_a_multi(sf_dir))


def q_degree_topk(sf_dir: str):
    g = derive.graph_a(sf_dir)
    deg = _scale_col(g.out_degrees(), "deg", "deg", 1.0)
    return deg.sort(["deg", "vertex"], descending=[True, False]).limit(10)


def q_intersection(sf_dir: str):
    return rel.intersection_edges(derive.edges_a(sf_dir), derive.edges_b(sf_dir))


def q_difference(sf_dir: str):
    return rel.difference_edges(derive.edges_a(sf_dir), derive.edges_b(sf_dir))


def q_compose(sf_dir: str):
    return rel.compose_edges(derive.edges_a(sf_dir), derive.edges_b(sf_dir))


def q_union(sf_dir: str):
    return rel.union_edges(derive.edges_a(sf_dir), derive.edges_b(sf_dir))


def q_disjoint_union(sf_dir: str):
    """igraph_disjoint_union (operators.c:38): edges_b's ids offset by
    V=512 (edges_a's declared vertex-universe size)."""
    return rel.disjoint_union_edges(
        derive.edges_a(sf_dir), derive.edges_b(sf_dir), n_left=V
    )


def q_complementer(sf_dir: str):
    """igraph_complementer (operators.c:1038) over the V=512 dense
    universe, loops excluded."""
    return rel.complementer_edges(derive.edges_a(sf_dir), n=V, num_partitions=8)


def q_rewire_degrees(sf_dir: str):
    """Degree-preservation invariant of rewire
    (structural_properties.c:1734): the rewired graph's out/in degree
    tables equal the original's — the SQL oracle computes them on the
    ORIGINAL edges, the engine on the rewired output, so the hash check
    verifies exact degree-sequence preservation (the randomized edge set
    itself has no SQL-expressible oracle)."""
    from igraph_ray.ops.rewire import rewire as _rw

    rewired = _rw(derive.edges_a(sf_dir), seed=42, num_partitions=8)
    g = Graph(rewired.materialize(), n=None)
    out_d = g.out_degrees()
    in_d = g.in_degrees()

    def _o(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"],
                         "out_deg": pc.cast(b["deg"], pa.int64())})

    def _i(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"],
                         "in_deg": pc.cast(b["deg"], pa.int64())})

    from igraph_ray.util import hash_join

    return hash_join(
        out_d.map_batches(_o, batch_format="pyarrow", batch_size=None),
        in_d.map_batches(_i, batch_format="pyarrow", batch_size=None),
        on="vertex", num_partitions=8,
    )


def q_gen_structures(sf_dir: str):
    """Deterministic structure generators (structure_generators.c) in one
    comparable table: star(501,out) ∪ ring(500,circular) ∪ tree(500,3-ary)
    ∪ full(40,directed) ∪ de_bruijn(3,5) ∪ lattice2d(20×25 torus),
    tagged by family — pure functions of the id
    range, so the oracle is four SQL range() expressions."""
    from igraph_ray.sources import structures as sg

    def _tag(ds, tag):
        return ds.map_batches(
            lambda b, _t=tag: pa.table(
                {"fam": pa.array([_t] * b.num_rows, pa.string()),
                 "src": b["src"], "dst": b["dst"]}),
            batch_format="pyarrow", batch_size=None)

    return (_tag(sg.star(501, "out"), "star")
            .union(_tag(sg.ring(500, circular=True), "ring"))
            .union(_tag(sg.tree(500, children=3), "tree"))
            .union(_tag(sg.full(40, directed=True), "full"))
            .union(_tag(sg.de_bruijn(3, 5), "debruijn"))
            .union(_tag(sg.lattice2d(20, 25, circular=True), "lattice")))


def q_linegraph(sf_dir: str):
    """Directed line graph of the sparse view: arcs (eid1, eid2) between
    canonically-numbered edges with head(e1) = tail(e2)."""
    from igraph_ray.ops.relational import linegraph

    return linegraph(derive.edges_sparse(sf_dir), num_partitions=8)


def q_stochastic_edges(sf_dir: str):
    """Row-normalized adjacency export (igraph_get_stochastic,
    conversion.c:722/818) over the weighted edge view, reported as the
    exact integer pair (weight, out_strength) per edge — p = w/s_out
    reconstructs the stochastic matrix entry exactly."""
    from igraph_ray.util import hash_join

    e = derive.edges_a_weighted(sf_dir).materialize()

    def _w(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["src"],
                         "w": pc.cast(b["weight"], pa.int64())})

    s = e.map_batches(_w, batch_format="pyarrow", batch_size=None) \
        .groupby("src").sum("w")

    def _rs(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["src"], "s_out": b["sum(w)"]})

    j = hash_join(e, s.map_batches(_rs, batch_format="pyarrow", batch_size=None),
                  on="src", num_partitions=8)

    def _proj(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "src" not in b.column_names:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64()),
                             "s_out": pa.array([], pa.int64())})
        return pa.table({"src": b["src"], "dst": b["dst"],
                         "w": pc.cast(b["weight"], pa.int64()),
                         "s_out": pc.cast(b["s_out"], pa.int64())})

    return j.map_batches(_proj, batch_format="pyarrow", batch_size=None)


def q_strength(sf_dir: str):
    """Weighted out-degree (igraph_strength) over the multigraph with
    integer weight (o_orderkey % 10) + 1 per edge occurrence."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def _derive(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        src = (ok % V).astype(np.int64)
        dst = (ck * 7 % V).astype(np.int64)
        w = (ok % 10 + 1).astype(np.float64)
        keep = src != dst
        return pa.table(
            {"src": pa.array(src[keep]), "dst": pa.array(dst[keep]),
             "weight": pa.array(w[keep])}
        )

    edges = orders.map_batches(_derive, batch_format="pyarrow", batch_size=None)
    g = Graph(edges, n=None, weighted=True)
    return _scale_col(g.out_degrees(), "deg", "strength", 1.0)


SQL_EDGES_W = (
    f"SELECT (o_orderkey % {V}) AS src, ((o_custkey * 7) % {V}) AS dst, "
    f"CAST((o_orderkey % 10) + 1 AS DOUBLE) AS w "
    f"FROM orders WHERE (o_orderkey % {V}) != ((o_custkey * 7) % {V})"
)


def _weighted_graph(sf_dir: str) -> Graph:
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def _derive(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        src = (ok % V).astype(np.int64)
        dst = (ck * 7 % V).astype(np.int64)
        w = (ok % 10 + 1).astype(np.float64)
        keep = src != dst
        return pa.table(
            {"src": pa.array(src[keep]), "dst": pa.array(dst[keep]),
             "weight": pa.array(w[keep])}
        )

    return Graph(orders.map_batches(_derive, batch_format="pyarrow", batch_size=None).materialize(),
                 n=None, weighted=True)


def q_pagerank_weighted(sf_dir: str):
    """Weighted PageRank over the orders multigraph (per-edge contribution
    pr*w/strength — the weighted kernel, centrality.c:975-1035)."""
    g = _weighted_graph(sf_dir)
    res = pagerank(g, damping=DAMPING, fixed_iterations=PR_ITERS, num_partitions=8)
    return _scale_col(res.state, "pr", "pr_e8", 1e8)


def _sql_pagerank_weighted(iters: int = PR_ITERS, d: float = DAMPING) -> str:
    parts = [
        f"WITH em AS MATERIALIZED ({SQL_EDGES_W})",
        "verts AS MATERIALIZED (SELECT src AS v FROM em UNION SELECT dst FROM em)",
        "wdeg AS MATERIALIZED (SELECT v, COALESCE((SELECT SUM(w) FROM em e WHERE e.src = verts.v), 0) AS s FROM verts)",
        "params AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)",
        "pr0 AS MATERIALIZED (SELECT v, 1.0/(SELECT n FROM params) AS r FROM verts)",
    ]
    for k in range(1, iters + 1):
        p = f"pr{k-1}"
        parts.append(
            f"base{k} AS MATERIALIZED (SELECT ((1-{d}) + {d}*COALESCE((SELECT SUM(p.r) FROM {p} p "
            f"JOIN wdeg dd ON dd.v = p.v WHERE dd.s = 0), 0))/(SELECT n FROM params) AS b)"
        )
        parts.append(
            f"pr{k} AS MATERIALIZED (SELECT dgt.v, (SELECT b FROM base{k}) + {d} * COALESCE(m.s, 0) AS r "
            f"FROM wdeg dgt LEFT JOIN ("
            f"SELECT e.dst AS v, SUM(p.r * e.w / dd.s) AS s FROM em e "
            f"JOIN pr{k-1} p ON p.v = e.src JOIN wdeg dd ON dd.v = e.src "
            f"WHERE dd.s > 0 GROUP BY e.dst) m ON m.v = dgt.v)"
        )
    last = f"pr{iters}"
    parts.append(f"tot AS (SELECT SUM(r) AS s FROM {last})")
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT v AS vertex, CAST(ROUND(r/(SELECT s FROM tot)*1e8) AS BIGINT) AS pr_e8 "
        f"FROM {last} ORDER BY vertex"
    )


EV_ITERS = 30
HITS_ITERS = 20


def q_triad_census(sf_dir: str):
    """Davis–Leinhardt 16-class triad census over the edges_a digraph
    (igraph_triad_census, motifs.c:976-1100)."""
    from igraph_ray.ops.census import triad_census

    g = derive.graph_a(sf_dir)
    return triad_census(g, num_partitions=8)


def q_motifs3(sf_dir: str):
    """Directed size-3 motif counts in isoclass order
    (igraph_motifs_randesu size 3, connected classes)."""
    from igraph_ray.ops.census import motifs3

    g = derive.graph_a(sf_dir)
    return motifs3(g, num_partitions=8)


def q_motifs3_estimate(sf_dir: str):
    """Sampled motif estimate (igraph_motifs_randesu_estimate,
    motifs.c:427) — md5-deterministic quarter vertex sample of the ESU
    roots, exact-integer scaled counts. Rows-only at the gate (the
    estimator is the point, not a SQL-replayable aggregate); the
    exact-at-sample-1.0 and concentration pytests carry exactness."""
    from igraph_ray.ops.census import motifs3_estimate

    g = derive.graph_a(sf_dir)
    return motifs3_estimate(g, sample_prob=0.25, num_partitions=8)


def q_motifs4(sf_dir: str):
    """Undirected size-4 connected-subgraph census over the sparse view
    (igraph_motifs_randesu size 4 analogue; Möbius inversion over exact
    integer aggregates — see ops.census.motifs4)."""
    from igraph_ray.ops.census import motifs4

    return motifs4(derive.graph_sparse(sf_dir), num_partitions=8)


def _sql_census_body() -> str:
    from igraph_ray.ops.census import TRIAD_LOOKUP, TRIAD_NAMES

    lut_rows = ",".join(f"({k},{int(TRIAD_LOOKUP[k])})" for k in range(64))
    names_rows = ",".join(f"({i},'{TRIAD_NAMES[i]}')" for i in range(16))
    return f"""
WITH edges AS MATERIALIZED ({SQL_EDGES_A}),
verts AS MATERIALIZED ({SQL_VERTS_A}),
nv AS (SELECT COUNT(*) AS n FROM verts),
pairs AS MATERIALIZED (
  SELECT LEAST(src,dst) AS lo, GREATEST(src,dst) AS hi,
         SUM(CASE WHEN src<dst THEN 1 ELSE 2 END) AS code
  FROM edges GROUP BY 1,2),
links AS MATERIALIZED (
  SELECT lo AS c, hi AS nb, code FROM pairs
  UNION ALL SELECT hi, lo, code FROM pairs),
wedges AS MATERIALIZED (
  SELECT l1.nb AS i, l2.nb AS k, l1.c AS j, l1.code AS cij, l2.code AS cjk
  FROM links l1 JOIN links l2 ON l2.c = l1.c AND l1.nb < l2.nb),
wj AS MATERIALIZED (
  SELECT w.i, w.k, w.j, w.cij, w.cjk, COALESCE(p.code, 0) AS cik
  FROM wedges w LEFT JOIN pairs p ON p.lo = w.i AND p.hi = w.k),
keyed AS (
  SELECT CASE WHEN j < i THEN cij WHEN j > k THEN cik ELSE cij END * 16
       + CASE WHEN j < i THEN cjk WHEN j > k THEN cij ELSE cik END * 4
       + CASE WHEN j < i THEN cik ELSE cjk END AS key,
       cik FROM wj),
lut(key, clazz) AS (VALUES {lut_rows}),
wcounts AS (
  SELECT l.clazz,
         SUM(CASE WHEN k.cik = 0 THEN 1 ELSE 0 END)
       + SUM(CASE WHEN k.cik > 0 THEN 1 ELSE 0 END) // 3 AS cnt
  FROM keyed k JOIN lut l ON l.key = k.key GROUP BY l.clazz),
deg AS MATERIALIZED (SELECT c AS v, COUNT(*) AS d FROM links GROUP BY c),
common AS MATERIALIZED (SELECT i, k, COUNT(*) AS cm FROM wedges GROUP BY i, k),
iso AS (
  SELECT p.code,
         ((SELECT n FROM nv) - 2) - (dl.d - 1) - (dh.d - 1) + COALESCE(c.cm, 0) AS isolated
  FROM pairs p JOIN deg dl ON dl.v = p.lo JOIN deg dh ON dh.v = p.hi
  LEFT JOIN common c ON c.i = p.lo AND c.k = p.hi),
onecounts AS (
  SELECT 1 AS clazz,
         COALESCE(SUM(CASE WHEN code IN (1,2) THEN isolated ELSE 0 END),0) AS cnt FROM iso
  UNION ALL
  SELECT 2, COALESCE(SUM(CASE WHEN code = 3 THEN isolated ELSE 0 END),0) FROM iso),
allc AS (
  SELECT clazz, SUM(cnt) AS cnt FROM
  (SELECT * FROM wcounts UNION ALL SELECT * FROM onecounts) GROUP BY clazz),
names(clazz, name) AS (VALUES {names_rows}),
tot AS (SELECT (SELECT n FROM nv)*((SELECT n FROM nv)-1)*((SELECT n FROM nv)-2)//6
             - COALESCE((SELECT SUM(cnt) FROM allc),0) AS zero),
census AS (
  SELECT nm.clazz, nm.name,
         CAST(CASE WHEN nm.clazz = 0 THEN (SELECT zero FROM tot)
              ELSE COALESCE(a.cnt,0) END AS BIGINT) AS count
  FROM names nm LEFT JOIN allc a ON a.clazz = nm.clazz)"""


def q_motif3_instances(sf_dir: str):
    """Connected-triple instance stream (v1 < v2 < v3, isoclass) over
    the edges_a digraph — the enumeration behind
    igraph_motifs_randesu_callback (motifs.c:165): every connected
    3-vertex induced subgraph exactly once with its directed isoclass.
    The oracle rebuilds the canonical dyad-code pairs and the three
    shared-vertex wedge joins in SQL and classifies through the same
    64-entry lookup (generated from the in-repo exemplar table)."""
    from igraph_ray.ops.census import motif3_instances

    g = derive.graph_a(sf_dir)
    return motif3_instances(g, num_partitions=8)


def _sql_motif3_instances() -> str:
    from igraph_ray.ops.census import TRIAD_LOOKUP, _CENSUS_TO_ISOCLASS

    rows = []
    for key in range(64):
        ab, rest = divmod(key, 16)
        ac, bc = divmod(rest, 4)
        if (ab > 0) + (ac > 0) + (bc > 0) < 2:
            continue  # fewer than two linked dyads never reaches the join
        rows.append(f"({key}, {int(_CENSUS_TO_ISOCLASS[TRIAD_LOOKUP[key]])})")
    lut = ", ".join(rows)
    return f"""
WITH edges AS MATERIALIZED ({derive.SQL_EDGES_A}),
dirs AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi,
         CASE WHEN src < dst THEN 1 ELSE 2 END AS bit
  FROM edges WHERE src <> dst),
pairs AS MATERIALIZED (
  SELECT lo, hi, SUM(bit) AS code FROM dirs GROUP BY lo, hi),
tri AS MATERIALIZED (
  SELECT p.lo AS a, p.hi AS b, q.hi AS c,
         p.code AS ab, q.code AS ac, 0 AS bc
  FROM pairs p JOIN pairs q ON q.lo = p.lo AND q.hi > p.hi
  UNION ALL
  SELECT p.lo, p.hi, q.hi, p.code, 0, q.code
  FROM pairs p JOIN pairs q ON q.lo = p.hi
  UNION ALL
  SELECT p.lo, q.lo, p.hi, 0, p.code, q.code
  FROM pairs p JOIN pairs q ON q.hi = p.hi AND q.lo > p.lo),
grp AS (
  SELECT a, b, c, MAX(ab) AS ab, MAX(ac) AS ac, MAX(bc) AS bc
  FROM tri GROUP BY a, b, c),
lut(key, isoclass) AS (VALUES {lut})
SELECT g.a AS v1, g.b AS v2, g.c AS v3,
       CAST(l.isoclass AS BIGINT) AS isoclass
FROM grp g JOIN lut l ON l.key = g.ab * 16 + g.ac * 4 + g.bc
ORDER BY v1, v2, v3"""


def q_motif4_instances(sf_dir: str):
    """Connected 4-subgraph instance stream (v1<v2<v3<v4, clazz, name)
    over the vsparse undirected view — the size-4 enumeration behind
    igraph_motifs_randesu_callback (motifs.c:165, size=4, cut_prob=0).
    The oracle regenerates the spanning-path/claw candidates, dedups
    the sorted quad, and classifies from the six induced-edge flags by
    the same edge-count + max-degree rule."""
    from igraph_ray.ops.census import motif4_instances

    g = derive.graph_vsparse(sf_dir)
    res = motif4_instances(g, num_partitions=8)
    if res.count() == 0:
        # Dataset.to_pandas() drops the schema of an empty dataset
        return pa.table({"v1": pa.array([], pa.int64()),
                         "v2": pa.array([], pa.int64()),
                         "v3": pa.array([], pa.int64()),
                         "v4": pa.array([], pa.int64()),
                         "clazz": pa.array([], pa.int64()),
                         "name": pa.array([], pa.string())})
    return res


def _sql_motif4_instances() -> str:
    return f"""
WITH edges AS MATERIALIZED ({derive.SQL_EDGES_VSPARSE}),
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM edges WHERE src <> dst),
adj AS MATERIALIZED (
  SELECT lo AS a, hi AS b FROM und UNION ALL SELECT hi, lo FROM und),
walks AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c, e3.b AS d
  FROM adj e1
  JOIN adj e2 ON e2.a = e1.b AND e2.b <> e1.a
  JOIN adj e3 ON e3.a = e2.b AND e3.b <> e1.a AND e3.b <> e1.b),
claws AS (
  SELECT n1.b AS a, n1.a AS b, n2.b AS c, n3.b AS d
  FROM adj n1
  JOIN adj n2 ON n2.a = n1.a AND n2.b > n1.b
  JOIN adj n3 ON n3.a = n1.a AND n3.b > n2.b),
quads AS (
  SELECT DISTINCT l[1] AS v1, l[2] AS v2, l[3] AS v3, l[4] AS v4
  FROM (SELECT list_sort([a, b, c, d]) AS l
        FROM (SELECT * FROM walks UNION ALL SELECT * FROM claws))),
marks AS (
  SELECT q.v1, q.v2, q.v3, q.v4,
         CASE WHEN u12.lo IS NULL THEN 0 ELSE 1 END AS e12,
         CASE WHEN u13.lo IS NULL THEN 0 ELSE 1 END AS e13,
         CASE WHEN u14.lo IS NULL THEN 0 ELSE 1 END AS e14,
         CASE WHEN u23.lo IS NULL THEN 0 ELSE 1 END AS e23,
         CASE WHEN u24.lo IS NULL THEN 0 ELSE 1 END AS e24,
         CASE WHEN u34.lo IS NULL THEN 0 ELSE 1 END AS e34
  FROM quads q
  LEFT JOIN und u12 ON u12.lo = q.v1 AND u12.hi = q.v2
  LEFT JOIN und u13 ON u13.lo = q.v1 AND u13.hi = q.v3
  LEFT JOIN und u14 ON u14.lo = q.v1 AND u14.hi = q.v4
  LEFT JOIN und u23 ON u23.lo = q.v2 AND u23.hi = q.v3
  LEFT JOIN und u24 ON u24.lo = q.v2 AND u24.hi = q.v4
  LEFT JOIN und u34 ON u34.lo = q.v3 AND u34.hi = q.v4),
cls AS (
  SELECT v1, v2, v3, v4,
         e12 + e13 + e14 + e23 + e24 + e34 AS m,
         GREATEST(e12 + e13 + e14, e12 + e23 + e24,
                  e13 + e23 + e34, e14 + e24 + e34) AS dmax
  FROM marks)
SELECT v1, v2, v3, v4,
       CAST(CASE WHEN m = 6 THEN 5 WHEN m = 5 THEN 4
                 WHEN m = 4 THEN CASE WHEN dmax = 3 THEN 3 ELSE 2 END
                 ELSE CASE WHEN dmax = 3 THEN 1 ELSE 0 END END AS BIGINT)
         AS clazz,
       CASE WHEN m = 6 THEN 'k4' WHEN m = 5 THEN 'diamond'
            WHEN m = 4 THEN CASE WHEN dmax = 3 THEN 'paw' ELSE 'cycle4' END
            ELSE CASE WHEN dmax = 3 THEN 'star3' ELSE 'path4' END END
         AS name
FROM cls ORDER BY v1, v2, v3, v4"""


def _sql_triad_census() -> str:
    return f"{_sql_census_body()}\nSELECT clazz, name, count FROM census ORDER BY clazz"


def _sql_motifs3() -> str:
    from igraph_ray.ops.census import _CENSUS_TO_ISOCLASS

    remap_rows = ",".join(
        f"({c},{m})" for c, m in enumerate(_CENSUS_TO_ISOCLASS) if m not in (0, 1, 3)
    )
    return (
        f"{_sql_census_body()},\n"
        f"remap(clazz, isoclass) AS (VALUES {remap_rows})\n"
        f"SELECT r.isoclass, c.count FROM census c JOIN remap r ON r.clazz = c.clazz "
        f"ORDER BY r.isoclass"
    )


def q_eigenvector(sf_dir: str):
    """Eigenvector centrality by fixed-count power iteration over the
    edges_a digraph (centrality.c:308-520 semantics; max-normalized)."""
    from igraph_ray.algorithms.centrality import eigenvector_centrality

    g = derive.graph_a(sf_dir)
    res = eigenvector_centrality(g, fixed_iterations=EV_ITERS, num_partitions=8)
    return _scale_col(res.state, "ev", "ev_e8", 1e8)


def _sql_eigenvector(iters: int = EV_ITERS,
                     centralization: bool = False) -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({SQL_EDGES_A})",
        f"verts AS MATERIALIZED ({SQL_VERTS_A})",
        "params AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)",
        "x0 AS MATERIALIZED (SELECT v, 1.0/(SELECT n FROM params) AS r FROM verts)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"raw{k} AS MATERIALIZED (SELECT vt.v, COALESCE(m.s, 0) AS r "
            f"FROM verts vt LEFT JOIN ("
            f"SELECT e.dst AS v, SUM(x.r) AS s FROM edges e "
            f"JOIN x{k-1} x ON x.v = e.src GROUP BY e.dst) m ON m.v = vt.v)"
        )
        parts.append(
            f"x{k} AS MATERIALIZED (SELECT v, r/(SELECT SUM(r) FROM raw{k}) AS r FROM raw{k})"
        )
    last = f"x{iters}"
    body = ",\n".join(parts)
    if centralization:
        # igraph_centralization_eigenvector_centrality (centrality.c:3209,
        # scale=TRUE, directed): sum of (max - x_i) over the e8-rounded
        # scores, plus the directed tmax = n - 1 (centrality.c:3317).
        return (
            f"{body},\n"
            f"sc AS (SELECT CAST(ROUND(r/(SELECT MAX(r) FROM {last})*1e8)"
            f" AS BIGINT) AS ev_e8 FROM {last})\n"
            f"SELECT CAST(SUM(100000000 - ev_e8) AS BIGINT) AS cent_sum_e8, "
            f"CAST((SELECT COUNT(*) FROM verts) - 1 AS BIGINT) AS tmax "
            f"FROM sc"
        )
    return (
        f"{body}\n"
        f"SELECT v AS vertex, CAST(ROUND(r/(SELECT MAX(r) FROM {last})*1e8) AS BIGINT) AS ev_e8 "
        f"FROM {last} ORDER BY vertex"
    )


def q_centralization_eigenvector(sf_dir: str):
    """igraph_centralization_eigenvector_centrality (centrality.c:3209,
    scale=TRUE, directed): sum of (max - x_i) over the e8-rounded scores
    with the directed tmax = n - 1 (centrality.c:3317-3345)."""
    from igraph_ray.algorithms.centrality import eigenvector_centrality

    g = derive.graph_a(sf_dir)
    res = eigenvector_centrality(g, fixed_iterations=EV_ITERS,
                                 num_partitions=8)
    sc = _scale_col(res.state, "ev", "ev_e8", 1e8).materialize()
    n = sc.count()
    tot = sum(r["s"] for r in sc.map_batches(
        lambda b: pa.table({"s": pa.array([int(
            (100000000 - b["ev_e8"].to_numpy(zero_copy_only=False)).sum())],
            pa.int64())}),
        batch_format="pyarrow", batch_size=None).take_all())
    return pa.table({"cent_sum_e8": pa.array([tot], pa.int64()),
                     "tmax": pa.array([n - 1], pa.int64())})


def q_eigenvector_weighted(sf_dir: str):
    """Weighted eigenvector centrality (centrality.c:308-520 weights
    branch) over the weighted edge view, max-normalized e8 ints."""
    from igraph_ray.algorithms.centrality import eigenvector_centrality

    g = derive.graph_a_weighted(sf_dir)
    res = eigenvector_centrality(g, fixed_iterations=EV_ITERS,
                                 num_partitions=8)
    return _scale_col(res.state, "ev", "ev_e8", 1e8)


def _sql_eigenvector_weighted(iters: int = EV_ITERS) -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({derive.SQL_EDGES_A_W})",
        "verts AS MATERIALIZED (SELECT src AS v FROM edges "
        "UNION SELECT dst FROM edges)",
        "params AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)",
        "x0 AS MATERIALIZED (SELECT v, 1.0/(SELECT n FROM params) AS r FROM verts)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"raw{k} AS MATERIALIZED (SELECT vt.v, COALESCE(m.s, 0) AS r "
            f"FROM verts vt LEFT JOIN ("
            f"SELECT e.dst AS v, SUM(x.r * e.weight) AS s FROM edges e "
            f"JOIN x{k-1} x ON x.v = e.src GROUP BY e.dst) m ON m.v = vt.v)"
        )
        parts.append(
            f"x{k} AS MATERIALIZED (SELECT v, r/(SELECT SUM(r) FROM raw{k}) AS r FROM raw{k})"
        )
    last = f"x{iters}"
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT v AS vertex, CAST(ROUND(r/(SELECT MAX(r) FROM {last})*1e8) AS BIGINT) AS ev_e8 "
        f"FROM {last} ORDER BY vertex"
    )


def q_hits(sf_dir: str):
    """HITS hub/authority scores (centrality.c:560-720 semantics via
    fixed-count power iteration, both max-normalized)."""
    from igraph_ray.algorithms.centrality import hits

    g = derive.graph_a(sf_dir)
    res = hits(g, iterations=HITS_ITERS, num_partitions=8)
    out = _scale_col(res.state, "hub", "hub_e8", 1e8)
    return _scale_col(out, "authority", "auth_e8", 1e8)


def _sql_hits(iters: int = HITS_ITERS) -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({SQL_EDGES_A})",
        f"verts AS MATERIALIZED ({SQL_VERTS_A})",
        "params AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)",
        "h0 AS MATERIALIZED (SELECT v, 1.0/(SELECT n FROM params) AS r FROM verts)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"araw{k} AS MATERIALIZED (SELECT vt.v, COALESCE(m.s, 0) AS r "
            f"FROM verts vt LEFT JOIN ("
            f"SELECT e.dst AS v, SUM(h.r) AS s FROM edges e "
            f"JOIN h{k-1} h ON h.v = e.src GROUP BY e.dst) m ON m.v = vt.v)"
        )
        parts.append(
            f"a{k} AS MATERIALIZED (SELECT v, r/(SELECT SUM(r) FROM araw{k}) AS r FROM araw{k})"
        )
        parts.append(
            f"hraw{k} AS MATERIALIZED (SELECT vt.v, COALESCE(m.s, 0) AS r "
            f"FROM verts vt LEFT JOIN ("
            f"SELECT e.src AS v, SUM(a.r) AS s FROM edges e "
            f"JOIN a{k} a ON a.v = e.dst GROUP BY e.src) m ON m.v = vt.v)"
        )
        parts.append(
            f"h{k} AS MATERIALIZED (SELECT v, r/(SELECT SUM(r) FROM hraw{k}) AS r FROM hraw{k})"
        )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT h.v AS vertex, "
        f"CAST(ROUND(h.r/(SELECT MAX(r) FROM h{iters})*1e8) AS BIGINT) AS hub_e8, "
        f"CAST(ROUND(a.r/(SELECT MAX(r) FROM a{iters})*1e8) AS BIGINT) AS auth_e8 "
        f"FROM h{iters} h JOIN a{iters} a ON a.v = h.v ORDER BY vertex"
    )


def q_local_scan1(sf_dir: str):
    """Local scan-1 statistic (scan.c:347): edges inside the closed
    neighborhood of the simple undirected view."""
    from igraph_ray.ops.structural import local_scan1

    return local_scan1(derive.graph_a(sf_dir), num_partitions=8)


def q_burt_constraint(sf_dir: str):
    """Burt's network constraint (igraph_constraint) over the weighted
    undirected sparse view, e6-rounded per the float-reporting rule."""
    from igraph_ray.ops.structural import burt_constraint

    return burt_constraint(derive.und_sparse_weighted(sf_dir),
                           num_partitions=8)


def q_split_join(sf_dir: str):
    """van Dongen split-join distance (igraph_split_join_distance)
    between the LPA communities and the weak components of edges_a —
    two partitions of the same 512-vertex universe."""
    from igraph_ray.ops.compare import split_join_distance

    g = derive.graph_a(sf_dir)
    lpa_state = label_propagation(
        g, fixed_iterations=LPA_ITERS, num_partitions=8).state
    cc_state = connected_components(g, num_partitions=8).state
    return split_join_distance(lpa_state, cc_state,
                               label1="community", label2="label",
                               num_partitions=8)


def q_rand_pairs(sf_dir: str):
    """Pair-counting Rand-index contingency sums between the LPA and
    weak-component partitions (igraph_compare_communities rand family)."""
    from igraph_ray.ops.compare import rand_pair_counts

    g = derive.graph_a(sf_dir)
    lpa_state = label_propagation(
        g, fixed_iterations=LPA_ITERS, num_partitions=8).state
    cc_state = connected_components(g, num_partitions=8).state
    return rand_pair_counts(lpa_state, cc_state,
                            label1="community", label2="label",
                            num_partitions=8)


def q_matching(sf_dir: str):
    """Canonical maximal matching (deterministic parallel greedy rounds,
    md5 edge priorities) of the sparse undirected view — the scalable
    counterpart of the matchings family (see algorithms/matching.py)."""
    from igraph_ray.algorithms.matching import maximal_matching

    und = derive.graph_sparse(sf_dir).canonical_undirected()
    return maximal_matching(und, num_partitions=8).sort(["lo", "hi"])


def q_max_matching(sf_dir: str):
    """MAXIMUM bipartite matching (matching.c semantics) via distributed
    Hopcroft–Karp (algorithms/bipartite_matching.py) on a thinned
    orders-derived bipartite graph (customer-side vs order-side
    namespaces). Exactness is pytest-guarded (Kuhn oracle + König
    duality); the driver records rows-only (a maximum matching is not
    SQL-expressible — see max_matching_size for the hash-green size
    oracle on the block-structured instance)."""
    from igraph_ray.algorithms.bipartite_matching import (
        maximum_bipartite_matching,
    )

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])

    def _bip(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (ok * 7 + ck) % 11 == 0
        return pa.table({"l": pa.array(ck[keep] % 200),
                         "r": pa.array(ok[keep] % 150)})

    edges = orders.map_batches(_bip, batch_format="pyarrow", batch_size=None)
    return (maximum_bipartite_matching(edges, num_partitions=8)
            .sort(["l", "r"]))


def q_max_matching_size(sf_dir: str):
    """Hash-green size oracle for Hopcroft–Karp: the bipartite graph is a
    disjoint union of COMPLETE bipartite blocks (distinct (g, l) × (g, r)
    cross join per group g), where the maximum matching size has the
    closed form Σ_g min(|L_g|, |R_g|) — a maximal matching of K_{a,b} is
    always maximum, so any augmentation bug shows up as a size mismatch.
    Returns a 1-row (match_size) table."""
    from igraph_ray.algorithms.bipartite_matching import (
        maximum_bipartite_matching,
    )

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])

    def _lg(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = ok % 40
        t = pa.table({"g": pa.array(g), "l": pa.array(g * 12 + ck % 12)})
        return t.group_by(["g", "l"]).aggregate([])

    def _rg(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = ok % 40
        t = pa.table({"g": pa.array(g), "r": pa.array(g * 9 + ok % 9)})
        return t.group_by(["g", "r"]).aggregate([])

    lg = (orders.map_batches(_lg, batch_format="pyarrow", batch_size=None)
          .groupby(["g", "l"]).count().select_columns(["g", "l"]))
    rg = (orders.map_batches(_rg, batch_format="pyarrow", batch_size=None)
          .groupby(["g", "r"]).count().select_columns(["g", "r"]))
    from igraph_ray.util import hash_join
    edges = hash_join(lg, rg, on="g", num_partitions=8)
    mm = maximum_bipartite_matching(edges, num_partitions=8)
    return pa.table({"match_size": pa.array([mm.count()], pa.int64())})


def _dense24_edges(sf_dir: str):
    """Near-complete 24-vertex digraph: (o_orderkey%24, o_custkey*7%24).
    Dense by construction, so min degree ≥ n/2 and Chartrand's theorem
    pins edge connectivity = min degree — the SQL-expressible exact
    oracle for the global-mincut path."""
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])

    def _d(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = ok % 24
        b_ = (ck * 7) % 24
        keep = a != b_
        a, b_ = a[keep], b_[keep]
        t = pa.table({"src": pa.array(np.minimum(a, b_)),
                      "dst": pa.array(np.maximum(a, b_))})
        return t.group_by(["src", "dst"]).aggregate([])

    # distinct unordered pairs: edge connectivity is over the simple
    # undirected view (the parallel-row/direction multiplicity of the
    # derivation is an artifact)
    return (orders.map_batches(_d, batch_format="pyarrow", batch_size=None)
            .groupby(["src", "dst"]).count()
            .select_columns(["src", "dst"]))


SQL_DENSE24_UND = (
    "SELECT DISTINCT LEAST(o_orderkey % 24, (o_custkey * 7) % 24) AS lo, "
    "GREATEST(o_orderkey % 24, (o_custkey * 7) % 24) AS hi "
    "FROM orders WHERE (o_orderkey % 24) != ((o_custkey * 7) % 24)"
)


def q_global_mincut(sf_dir: str):
    """Global edge connectivity (igraph_edge_connectivity, flow.c:2122)
    of the dense 24-vertex derived graph via the exact n−1 s-t max-flow
    path (algorithms/mincut.py). The instance has min degree ≥ n/2, so
    the SQL oracle is the closed-form min undirected degree
    (Chartrand 1966: δ ≥ n/2 ⟹ edge connectivity = δ)."""
    from igraph_ray.algorithms.mincut import global_edge_connectivity

    val = global_edge_connectivity(_dense24_edges(sf_dir),
                                   num_partitions=4)
    return pa.table({"mincut": pa.array([val], pa.int64())})


def _dense36_edges(sf_dir: str):
    """Near-dense 36-vertex simple undirected graph: distinct pairs
    (o_orderkey%36, o_custkey*7%36) kept iff (lo²+3·hi²)%5 < 4. The
    filter makes degrees vary (21..35) while every pair still satisfies
    d(u)+d(v) ≥ n−1 — the premise of the local Chartrand bound
    (λ(u,v) = min(d(u), d(v)) when d(u)+d(v) ≥ n−1), which makes the
    Gomory–Hu weight multiset SQL-expressible."""
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])

    def _d(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = ok % 36
        c = (ck * 7) % 36
        lo = np.minimum(a, c)
        hi = np.maximum(a, c)
        keep = (lo != hi) & (((lo * lo + 3 * hi * hi) % 5) < 4)
        t = pa.table({"src": pa.array(lo[keep]), "dst": pa.array(hi[keep])})
        return t.group_by(["src", "dst"]).aggregate([])

    return (orders.map_batches(_d, batch_format="pyarrow", batch_size=None)
            .groupby(["src", "dst"]).count()
            .select_columns(["src", "dst"]))


def q_gomory_hu(sf_dir: str):
    """Gomory–Hu cut tree (igraph_gomory_hu_tree, flow.c:2389, Gusfield
    1990) on the near-dense 36-vertex derived graph; returns the SORTED
    tree weights as (rank, flow). Oracle: with d(u)+d(v) ≥ n−1 for every
    pair, λ(u,v) = min(d(u), d(v)) (local Chartrand), and any cut tree
    of a min-of-endpoint-values metric carries exactly the n−1 smallest
    vertex degrees as weights (for every x, edges of weight ≥ x span the
    vertices of degree ≥ x) — so the SQL oracle is the sorted degree
    list minus its maximum."""
    from igraph_ray.algorithms.connectivity import gomory_hu_tree

    g = Graph(_dense36_edges(sf_dir).materialize(), n=36)
    tree = gomory_hu_tree(g, n=36)
    fl = np.sort(np.array(tree["flow_e6"].to_pylist()) // 10**6)
    return pa.table({
        "rank": pa.array(np.arange(1, len(fl) + 1, dtype=np.int64)),
        "flow": pa.array(fl.astype(np.int64)),
    })


def q_vertex_connectivity(sf_dir: str):
    """Global vertex connectivity (igraph_vertex_connectivity,
    flow.c:2040) of the near-dense 36-vertex derived graph via the
    single-pivot Even reduction over vertex-split unit max flows.
    Rows-only at the gate (κ is not SQL-expressible); known-κ fixture
    pytests (C5, K5, Petersen, cut-vertex) carry exactness."""
    from igraph_ray.algorithms.connectivity import vertex_connectivity

    g = Graph(_dense36_edges(sf_dir).materialize(), n=36)
    k = vertex_connectivity(g, n=36)
    return pa.table({"kappa": pa.array([k], pa.int64())})


def q_mincut_karger(sf_dir: str):
    """Karger-sampled global min cut (the scale path: MST under md5
    trial weights, cut at the heaviest tree edge) on the sparse derived
    graph — rows-only (an upper bound by construction; the planted-cut
    concentration pytest carries the statistical contract)."""
    from igraph_ray.algorithms.mincut import global_mincut_karger

    return global_mincut_karger(derive.edges_sparse(sf_dir), trials=4,
                                num_partitions=8)


def q_barabasi(sf_dir: str):
    """Deterministic Barabási–Albert generator (games.c:419 analogue;
    communication-free position-pointer scheme, sources/games.py
    barabasi_game) — fixed (n=400, m=3, seed=7), input-independent like
    gen_structures. The SQL oracle chases the identical md5 slot
    pointers with a recursive CTE."""
    from igraph_ray.sources.games import barabasi_game

    return barabasi_game(400, m=3, seed=7).sort(["src", "dst"])


CALLAWAY_PARAMS = dict(n=300, types=2, edges_per_step=2, type_dist=(3, 1),
                       pref_e6=((700000, 200000), (200000, 500000)), seed=11)


def q_callaway(sf_dir: str):
    """Callaway-traits growing network (igraph_callaway_traits_game,
    games.c:1369) — fixed parameters, input-independent like barabasi;
    every uniform draw is an independent md5 15-hex prefix so the
    DuckDB oracle replays the generator exactly (integer-threshold
    comparisons throughout; see sources/games.py docstring)."""
    from igraph_ray.sources.games import callaway_traits_game

    return callaway_traits_game(**CALLAWAY_PARAMS).sort(["src", "dst"])


def _sql_callaway() -> str:
    p = CALLAWAY_PARAMS
    n, types, eps, seed = (p["n"], p["types"], p["edges_per_step"], p["seed"])
    HEX15 = 16 ** 15
    cum = [0]
    for w in p["type_dist"]:
        cum.append(cum[-1] + int(w))
    maxcum = cum[-1]
    cthr = [-((-c * HEX15) // maxcum) for c in cum]
    pthr = [[(int(x) * HEX15) // 1_000_000 for x in row]
            for row in p["pref_e6"]]

    def fold(h: str) -> str:
        f = "CAST(0 AS BIGINT)"
        for k in range(1, 16):
            f = (f"(({f}) * 16 + "
                 f"(strpos('0123456789abcdef', substr({h}, {k}, 1)) - 1))")
        return f

    tcase = " + ".join(
        f"(CASE WHEN rt >= {cthr[k]} THEN 1 ELSE 0 END)"
        for k in range(1, types)) or "0"
    pcase = "CASE " + " ".join(
        f"WHEN x.t = {a} AND y.t = {b} THEN CAST({pthr[a][b]} AS BIGINT)"
        for a in range(types) for b in range(types)) + " END"
    return f"""
WITH steps AS (SELECT UNNEST(range(1, {n})) AS i),
trials AS (SELECT i, UNNEST(range({eps})) AS j FROM steps),
hs AS (SELECT i, j,
  md5('{seed}:a:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS ha,
  md5('{seed}:b:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS hb,
  md5('{seed}:p:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS hp
  FROM trials),
rs AS MATERIALIZED (SELECT i, j, {fold('ha')} AS ra, {fold('hb')} AS rb,
  {fold('hp')} AS rp FROM hs),
vh AS (SELECT UNNEST(range({n})) AS v),
vth AS (SELECT v, md5('{seed}:t:' || CAST(v AS VARCHAR)) AS ht FROM vh),
vtr AS (SELECT v, {fold('ht')} AS rt FROM vth),
vtype AS MATERIALIZED (SELECT v, ({tcase}) AS t FROM vtr),
picks AS (SELECT i, j, ra % (i+1) AS n1, rb % (i+1) AS n2, rp FROM rs)
SELECT CAST(pk.n1 AS BIGINT) AS src, CAST(pk.n2 AS BIGINT) AS dst
FROM picks pk JOIN vtype x ON x.v = pk.n1 JOIN vtype y ON y.v = pk.n2
WHERE pk.rp < ({pcase})
ORDER BY src, dst"""


ESTABLISHMENT_PARAMS = dict(n=300, types=2, k=3, type_dist=(1, 2),
                            pref_e6=((800000, 100000), (100000, 600000)),
                            seed=13)


def q_establishment(sf_dir: str):
    """Establishment growing model (igraph_establishment_game, games.c):
    each new vertex tries k connections to existing vertices, accepted
    by type preference — md5-draw replayable like callaway (the
    with-replacement target deviation is documented in
    sources/games.py)."""
    from igraph_ray.sources.games import establishment_game

    return establishment_game(**ESTABLISHMENT_PARAMS).sort(["src", "dst"])


def _sql_establishment() -> str:
    p = ESTABLISHMENT_PARAMS
    n, types, k, seed = p["n"], p["types"], p["k"], p["seed"]
    HEX15 = 16 ** 15
    cum = [0]
    for w in p["type_dist"]:
        cum.append(cum[-1] + int(w))
    maxcum = cum[-1]
    cthr = [-((-c * HEX15) // maxcum) for c in cum]
    pthr = [[(int(x) * HEX15) // 1_000_000 for x in row]
            for row in p["pref_e6"]]

    def fold(h: str) -> str:
        f = "CAST(0 AS BIGINT)"
        for kk in range(1, 16):
            f = (f"(({f}) * 16 + "
                 f"(strpos('0123456789abcdef', substr({h}, {kk}, 1)) - 1))")
        return f

    tcase = " + ".join(
        f"(CASE WHEN rt >= {cthr[kk]} THEN 1 ELSE 0 END)"
        for kk in range(1, types)) or "0"
    pcase = "CASE " + " ".join(
        f"WHEN x.t = {a} AND y.t = {b} THEN CAST({pthr[a][b]} AS BIGINT)"
        for a in range(types) for b in range(types)) + " END"
    return f"""
WITH steps AS (SELECT UNNEST(range({k}, {n})) AS i),
trials AS (SELECT i, UNNEST(range({k})) AS j FROM steps),
hs AS (SELECT i, j,
  md5('{seed}:e:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS he,
  md5('{seed}:p:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS hp
  FROM trials),
rs AS MATERIALIZED (SELECT i, j, {fold('he')} AS re, {fold('hp')} AS rp
  FROM hs),
vh AS (SELECT UNNEST(range({n})) AS v),
vth AS (SELECT v, md5('{seed}:t:' || CAST(v AS VARCHAR)) AS ht FROM vh),
vtr AS (SELECT v, {fold('ht')} AS rt FROM vth),
vtype AS MATERIALIZED (SELECT v, ({tcase}) AS t FROM vtr),
picks AS (SELECT i, j, re % i AS tgt, rp FROM rs)
SELECT CAST(pk.i AS BIGINT) AS src, CAST(pk.tgt AS BIGINT) AS dst
FROM picks pk JOIN vtype x ON x.v = pk.i JOIN vtype y ON y.v = pk.tgt
WHERE pk.rp < ({pcase})
ORDER BY src, dst"""


# --- sequential-roulette growth-game tail (games.c psumtree family) ----
# Draw values are pure md5 functions of (seed, step, j), so they are
# precomputed HERE and embedded as integer literals; the SQL replays
# only the state evolution — one MATERIALIZED CTE chain carrying the
# accumulated edge table, with the exact-integer roulette
#   to = MIN(v) WHERE draw32 * S <= 2^32 * cum_incl(v)
# (the microscopic_update.c oracle convention).

RECENT_DEGREE_PARAMS = dict(n=64, m=2, window=4, zero_appeal=1, seed=17)
LASTCIT_PARAMS = dict(n=64, edges_per_node=1, agebins=3,
                      preference=(6, 3, 2, 1), seed=19)
BARABASI_AGING_PARAMS = dict(n=64, m=2, aging_bin=3, seed=23)
RECENT_DEGREE_AGING_PARAMS = dict(n=64, m=2, aging_bin=3, time_window=4,
                                  zero_appeal=1, seed=29)


def q_recent_degree(sf_dir: str):
    """Recent-degree growth game (igraph_recent_degree_game,
    games.c:1574; power=1, zero_appeal=1, outpref=False): each new
    vertex cites m targets ∝ (citations gained in the last `window`
    steps) + 1. Input-independent like barabasi; the oracle replays the
    windowed-count state per step."""
    from igraph_ray.sources.games import recent_degree_game

    return recent_degree_game(**RECENT_DEGREE_PARAMS).sort(["src", "dst"])


def q_lastcit(sf_dir: str):
    """Last-citation growth game (igraph_lastcit_game, games.c:3033):
    each new vertex cites one target ∝ preference[lag bin of the
    target's last citation] (never-cited tail positive). The oracle
    carries lastcit state via MAX(step) over the accumulated edges."""
    from igraph_ray.sources.games import lastcit_game

    return lastcit_game(**LASTCIT_PARAMS).sort(["src", "dst"])


def q_barabasi_aging(sf_dir: str):
    """Preferential attachment with aging (igraph_barabasi_aging_game,
    games.c:1732; pa_exp=1, aging_exp=-1, coefs 1, zero_age_appeal=0):
    weight = (deg+1)/(age+1), with the reference's own event order —
    including its (age+2) aging-boundary factor — replayed via
    LCM-scaled integer weights."""
    from igraph_ray.sources.games import barabasi_aging_game

    return barabasi_aging_game(**BARABASI_AGING_PARAMS).sort(["src", "dst"])


def q_recent_degree_pow(sf_dir: str):
    """Recent-degree growth game with a GENERAL float exponent
    (igraph_recent_degree_game, games.c:1574; power=0.5): the
    float-roulette path — same indexed md5 draw stream as the
    integer-exact q_recent_degree, float64 weights (recent^0.5 + 1).
    Deterministic but rows-only at the gate (float pow admits no
    bit-exact SQL replay); the moment/degree-sequence property pytest
    carries the statistical contract (tests/test_games_float.py)."""
    from igraph_ray.sources.games import recent_degree_game

    return recent_degree_game(n=256, m=2, window=4, zero_appeal=1,
                              seed=17, power=0.5).sort(["src", "dst"])


def q_barabasi_aging_pow(sf_dir: str):
    """Preferential attachment with aging and GENERAL float exponents
    (igraph_barabasi_aging_game, games.c:1732; pa_exp=1.5,
    aging_exp=-0.5): the float-roulette path replaying the reference's
    event order (citation (age+1)^γ, boundary (age+2)^γ, insertion
    (1+zaa)·zda) with float64 weights. Rows-only; property pytest in
    tests/test_games_float.py."""
    from igraph_ray.sources.games import barabasi_aging_game

    return barabasi_aging_game(n=256, m=2, aging_bin=3, seed=23,
                               pa_exp=1.5, aging_exp=-0.5) \
        .sort(["src", "dst"])


def q_recent_degree_aging(sf_dir: str):
    """Recent-degree attachment with aging
    (igraph_recent_degree_aging_game, games.c:1888; pa_exp=1,
    aging_exp=-1): weight = (windowed citations + 1)/(age+1), the
    composition of recent_degree (history-queue expiry) and
    barabasi_aging (event-ordered updates incl. the reference's
    (age+2) boundary factor). The oracle resolves each vertex's LAST
    update event — expiry at xs+W, citation at c, aging boundary, or
    insertion — from the accumulated edge CTE."""
    from igraph_ray.sources.games import recent_degree_aging_game

    return recent_degree_aging_game(**RECENT_DEGREE_AGING_PARAMS) \
        .sort(["src", "dst"])


def _sql_recent_degree_aging() -> str:
    from math import gcd

    p = RECENT_DEGREE_AGING_PARAMS
    n, m, ab, W, za = (p["n"], p["m"], p["aging_bin"], p["time_window"],
                       p["zero_appeal"])
    bw = n // ab + 1
    max_den = (n - 1) // bw + 2
    L = 1
    for d in range(1, max_den + 1):
        L = L * d // gcd(L, d)
    draws = _seq_game_draws(p["seed"], "rda", n, m)

    def w_expr(i: int) -> str:
        # events, latest step wins (ties: aging > citation > expiry):
        #   aging boundary b = v + bw·ak (ak = (i-1-v)//bw >= 1),
        #     factor L/(ak+2)
        #   citation at c = MAX(s), factor L/((c-v)//bw + 1)
        #   expiry at x = xs + W (xs = MAX(s) with s <= i-W),
        #     factor L/((x-v)//bw + 1)
        #   insertion, factor L
        # deg is always the CURRENT windowed count (s >= i-W+1)
        ak = f"(({i} - 1 - r.range) // {bw})"
        return (
            f"SELECT r.range AS v, ({za} + COALESCE(st.deg, 0)) * "
            f"CASE WHEN {ak} >= 1 AND (st.c IS NULL OR "
            f"r.range + {bw} * {ak} >= st.c) AND (st.xs IS NULL OR "
            f"r.range + {bw} * {ak} >= st.xs + {W}) "
            f"THEN {L} // ({ak} + 2) "
            f"WHEN st.c IS NOT NULL AND (st.xs IS NULL OR "
            f"st.c >= st.xs + {W}) THEN "
            f"{L} // ((st.c - r.range) // {bw} + 1) "
            f"WHEN st.xs IS NOT NULL THEN "
            f"{L} // ((st.xs + {W} - r.range) // {bw} + 1) "
            f"ELSE {L} END AS w "
            f"FROM range({i}) r LEFT JOIN "
            f"(SELECT d, COUNT(*) FILTER (WHERE s >= {i - W + 1}) AS deg, "
            f"MAX(s) AS c, MAX(s) FILTER (WHERE s <= {i - W}) AS xs "
            f"FROM e{i - 1} GROUP BY d) st ON st.d = r.range")

    return _seq_game_sql(n, m, w_expr, draws)


def _seq_game_draws(seed: int, tag: str, n: int, m: int):
    from igraph_ray.sources.games import _draw32

    return {(i, j): _draw32(seed, tag, i, j)
            for i in range(1, n) for j in range(m)}


def _seq_game_sql(n: int, m: int, w_expr_fn, draws) -> str:
    """Shared unrolled-CTE chain: e{i} accumulates (s, d) edge rows;
    w_expr_fn(i) -> SQL producing (v, w) for v in range(i) given
    e{i-1}; every step's m picks use the same pre-step cumsum (the
    reference updates its psumtree after the draw loop)."""
    parts = ["WITH e0(s, d) AS MATERIALIZED "
             "(SELECT CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) "
             "WHERE FALSE)"]
    for i in range(1, n):
        parts.append(
            f", w{i} AS MATERIALIZED ({w_expr_fn(i)})"
            f", c{i} AS MATERIALIZED (SELECT v, "
            f"SUM(w) OVER (ORDER BY v) AS c, SUM(w) OVER () AS s1 "
            f"FROM w{i})")
        arms = " ".join(
            f"UNION ALL SELECT {i}, (SELECT MIN(v) FROM c{i} "
            f"WHERE CAST({draws[(i, j)]} AS BIGINT) * s1 <= "
            f"4294967296 * c)"
            for j in range(m))
        parts.append(
            f", e{i} AS MATERIALIZED (SELECT s, d FROM e{i - 1} {arms})")
    parts.append(
        f" SELECT CAST(s AS BIGINT) AS src, CAST(d AS BIGINT) AS dst "
        f"FROM e{n - 1} ORDER BY src, dst")
    return "".join(parts)


def _sql_recent_degree() -> str:
    p = RECENT_DEGREE_PARAMS
    n, m, W, za = p["n"], p["m"], p["window"], p["zero_appeal"]
    draws = _seq_game_draws(p["seed"], "rd", n, m)

    def w_expr(i: int) -> str:
        return (f"SELECT r.range AS v, {za} + "
                f"(SELECT COUNT(*) FROM e{i - 1} pe "
                f"WHERE pe.d = r.range AND pe.s >= {i - W + 1}) AS w "
                f"FROM range({i}) r")

    return _seq_game_sql(n, m, w_expr, draws)


def _sql_lastcit() -> str:
    p = LASTCIT_PARAMS
    n, A = p["n"], p["agebins"]
    pref = list(p["preference"])
    bw = n // A + 1
    draws = _seq_game_draws(p["seed"], "lc", n, p["edges_per_node"])
    kcase = ("CASE CAST(({i} - 1 - lc.c) // " + str(bw) + " AS BIGINT) "
             + " ".join(f"WHEN {k} THEN {pref[k]}" for k in range(A))
             + " END")

    def w_expr(i: int) -> str:
        return (f"SELECT r.range AS v, CASE WHEN lc.c IS NULL "
                f"THEN {pref[A]} ELSE {kcase.format(i=i)} END AS w "
                f"FROM range({i}) r LEFT JOIN "
                f"(SELECT d, MAX(s) AS c FROM e{i - 1} GROUP BY d) lc "
                f"ON lc.d = r.range")

    return _seq_game_sql(n, p["edges_per_node"], w_expr, draws)


def _sql_barabasi_aging() -> str:
    from math import gcd

    p = BARABASI_AGING_PARAMS
    n, m, ab = p["n"], p["m"], p["aging_bin"]
    bw = n // ab + 1
    max_den = (n - 1) // bw + 2
    L = 1
    for d in range(1, max_den + 1):
        L = L * d // gcd(L, d)
    draws = _seq_game_draws(p["seed"], "ba", n, m)

    def w_expr(i: int) -> str:
        # age_k = (i-1-v)//bw; last aging boundary b = v + bw*age_k;
        # aging (factor L/(age_k+2)) wins iff age_k>=1 and b >= last
        # cite step c; else citation factor L/((c-v)//bw + 1); else L
        ak = f"(({i} - 1 - r.range) // {bw})"
        return (
            f"SELECT r.range AS v, (1 + COALESCE(st.deg, 0)) * "
            f"CASE WHEN {ak} >= 1 AND (st.c IS NULL OR "
            f"r.range + {bw} * {ak} >= st.c) THEN {L} // ({ak} + 2) "
            f"WHEN st.c IS NOT NULL THEN "
            f"{L} // ((st.c - r.range) // {bw} + 1) "
            f"ELSE {L} END AS w "
            f"FROM range({i}) r LEFT JOIN "
            f"(SELECT d, COUNT(*) AS deg, MAX(s) AS c "
            f"FROM e{i - 1} GROUP BY d) st ON st.d = r.range")

    return _seq_game_sql(n, m, w_expr, draws)


HRG_GAME_PARAMS = dict(
    depth=9, seed=42,
    level_p_e6=[800000, 500000, 250000, 120000, 60000, 30000, 15000, 8000,
                4000])


def q_hrg_game(sf_dir: str):
    """Hierarchical-random-graph generator (igraph_hrg_game,
    igraph_hrg.cc) over an explicit balanced dendrogram: n=2^9 leaves,
    one probability per level, pair (i,j) connected iff the md5 draw
    of (seed,i,j) clears the integer threshold of level
    floor(log2(i XOR j)). Input-independent like barabasi/callaway;
    the DuckDB oracle replays every draw exactly."""
    from igraph_ray.algorithms.hrg import hrg_game

    return hrg_game(**HRG_GAME_PARAMS).sort(["src", "dst"])


def _sql_hrg_game() -> str:
    p = HRG_GAME_PARAMS
    depth, seed = p["depth"], p["seed"]
    n = 1 << depth
    HEX15 = 16 ** 15
    thr = [int(x) * HEX15 // 1_000_000 for x in p["level_p_e6"]]

    def fold(h: str) -> str:
        f = "CAST(0 AS BIGINT)"
        for k in range(1, 16):
            f = (f"(({f}) * 16 + "
                 f"(strpos('0123456789abcdef', substr({h}, {k}, 1)) - 1))")
        return f

    lcase = ("CASE " + " ".join(
        f"WHEN x >= {1 << lvl} THEN CAST({thr[lvl]} AS BIGINT)"
        for lvl in range(depth - 1, 0, -1))
        + f" ELSE CAST({thr[0]} AS BIGINT) END")
    return f"""
WITH pairs AS (
  SELECT a.i AS i, b.j AS j
  FROM (SELECT UNNEST(range({n})) AS i) a,
       (SELECT UNNEST(range({n})) AS j) b
  WHERE b.j > a.i),
hs AS (SELECT i, j, xor(i, j) AS x,
  md5('{seed}:h:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS h
  FROM pairs),
rs AS MATERIALIZED (SELECT i, j, x, {fold('h')} AS r FROM hs)
SELECT CAST(i AS BIGINT) AS src, CAST(j AS BIGINT) AS dst FROM rs
WHERE r < ({lcase})
ORDER BY src, dst"""


def q_union_projection(sf_dir: str):
    """Dynamic union-graph projection (the fork's
    igraph_compute_dynamic_union_graph_projection, dynamic.c:1033)
    over the events stream: 6h-window snapshots, consecutive pairs
    projected to union edges with 0b10/0b01/0b11 membership colors.
    One shuffle for all pairs."""
    from igraph_ray.ops.temporal import union_graph_projection

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_id"])
    return union_graph_projection(events)


SQL_UNION_PROJECTION = """
WITH ev AS (
  SELECT (epoch_us(ts) // 1000000) // 21600 AS w,
         user_id % 512 AS src, event_id % 97 AS dst FROM events),
dedup AS MATERIALIZED (SELECT DISTINCT w, src, dst FROM ev),
bounds AS (SELECT MIN(w) AS wmin, MAX(w) AS wmax FROM dedup),
expanded AS (
  SELECT w AS pair, src, dst, 2 AS bit FROM dedup
  UNION ALL SELECT w - 1, src, dst, 1 FROM dedup)
SELECT CAST(pair AS BIGINT) AS w, CAST(src AS BIGINT) AS src,
       CAST(dst AS BIGINT) AS dst, CAST(SUM(bit) AS BIGINT) AS color
FROM expanded, bounds
WHERE pair >= wmin AND pair <= wmax - 1
GROUP BY pair, src, dst
ORDER BY w, src, dst"""


def q_layout_kk(sf_dir: str):
    """Kamada–Kawai layout of the very-sparse derived graph
    (igraph_layout_kamada_kawai, layout_kk.c; SMACOF majorization over
    BFS distances, circular seed). Rows-only (float coordinates);
    square-recovery and stress-reduction pytests in
    tests/test_layout_kk.py."""
    from igraph_ray.ops.layout import layout_kamada_kawai

    g = derive.graph_vsparse(sf_dir)
    return layout_kamada_kawai(g, iterations=30, n=derive.V)


def q_famous(sf_dir: str):
    """The igraph_famous catalog (structure_generators.c:2111) as one
    (name, src, dst) table — each graph written from its public
    mathematical definition; the oracle is the same closed forms as a
    VALUES list (both sides generated from sources/structures.FAMOUS,
    kept in lockstep)."""
    import pyarrow as pa

    from igraph_ray.sources.structures import FAMOUS

    names, srcs, dsts = [], [], []
    for name in sorted(FAMOUS):
        _, e = FAMOUS[name]()
        for a, b in sorted((min(x, y), max(x, y)) for x, y in e):
            names.append(name)
            srcs.append(a)
            dsts.append(b)
    return pa.table({"name": pa.array(names, pa.string()),
                     "src": pa.array(srcs, pa.int64()),
                     "dst": pa.array(dsts, pa.int64())})


def _sql_famous() -> str:
    from igraph_ray.sources.structures import FAMOUS

    rows = []
    for name in sorted(FAMOUS):
        _, e = FAMOUS[name]()
        for a, b in sorted((min(x, y), max(x, y)) for x, y in e):
            rows.append(f"('{name}', {a}, {b})")
    return ("SELECT name, CAST(src AS BIGINT) AS src, "
            "CAST(dst AS BIGINT) AS dst FROM (VALUES "
            + ", ".join(rows)
            + ") AS t(name, src, dst) ORDER BY name, src, dst")


SIGMA_SOURCE, SIGMA_LEVELS = 1, 12


def q_sigma_counts(sf_dir: str):
    """Shortest-path counts from vertex 1 over the sparse derived
    digraph: (vertex, dist, sigma) — BFS distance and number of
    distinct shortest paths (the σ table of Brandes; the counts view
    of igraph_get_all_shortest_paths). Engine = level-synchronous
    join/groupby/anti-join per level; oracle = the same recurrence
    unrolled level by level."""
    from igraph_ray.algorithms.simple_paths import shortest_path_counts

    g = derive.graph_sparse(sf_dir)
    return shortest_path_counts(g, source=SIGMA_SOURCE,
                                max_levels=SIGMA_LEVELS)


def _sql_sigma() -> str:
    parts = [f"WITH e AS MATERIALIZED ({SQL_EDGES_SPARSE}),",
             f"l0 AS (SELECT CAST({SIGMA_SOURCE} AS BIGINT) AS v, "
             f"CAST(1 AS BIGINT) AS sigma),",
             "s0 AS (SELECT v FROM l0)"]
    for k in range(1, SIGMA_LEVELS + 1):
        parts.append(
            f", l{k} AS MATERIALIZED (SELECT e.dst AS v, "
            f"CAST(SUM(l{k-1}.sigma) AS BIGINT) AS sigma "
            f"FROM l{k-1} JOIN e ON e.src = l{k-1}.v "
            f"WHERE e.dst NOT IN (SELECT v FROM s{k-1}) GROUP BY e.dst)")
        parts.append(
            f", s{k} AS MATERIALIZED (SELECT v FROM s{k-1} "
            f"UNION ALL SELECT v FROM l{k})")
    sel = " UNION ALL ".join(
        f"SELECT v, CAST({k} AS BIGINT) AS dist, sigma FROM l{k}"
        for k in range(SIGMA_LEVELS + 1))
    parts.append(f" SELECT v AS vertex, dist, sigma FROM ({sel}) "
                 f"ORDER BY vertex")
    return "\n".join(parts)


# textbook automorphism-group orders of the famous catalog: |Aut| is a
# published invariant of each named graph (Petersen 120 = S5 acting on
# 2-subsets; K4 = S4 = 24; Q3 = 2^3·3! = 48; octahedron = 48 = 2^3·3!;
# bull/house/kite have a single reflection; diamond = Z2×Z2)
AUTOMORPHISM_TRUTH = {
    "petersen": 120, "bull": 2, "diamond": 4, "house": 2,
    "tetrahedral": 24, "cubical": 48, "octahedral": 48,
    "krackhardt_kite": 2,
    # LCF-constructed classics vs their published group orders — a
    # cross-check of the lcf_edges construction itself: |Aut(Heawood)|
    # = PGL(2,7) = 336, Pappus 216, Frucht 1 (the minimal cubic
    # identity graph), Desargues 240, Moebius-Kantor 96, Nauru 144
    "heawood": 336, "pappus": 216, "frucht": 1,
    "desargues": 240, "moebius_kantor": 96, "nauru": 144,
    # session-7 residue constructions vs published orders: the
    # Robertson (4,5)-cage has |Aut| = 24, the Tutte graph Z3 (one
    # rotation of its three fragments), smallestcyclicgroup Z3 by its
    # defining property
    "robertson": 24, "tutte": 3, "smallestcyclicgroup": 3,
}


def q_automorphisms(sf_dir: str):
    """Automorphism-group orders |Aut(G)| of the famous-graph catalog
    (igraph_count_isomorphisms_vf2 with g1 = g2, topology.c:1720;
    graphs from igraph_famous, structure_generators.c:2111): one
    (name, aut) row per graph, computed by the exhaustive WL-filtered
    VF2 enumeration. Oracle = the published group orders (textbook
    invariants, same epistemic status as the famous edge lists)."""
    from igraph_ray.sources.structures import FAMOUS
    from igraph_ray.algorithms.subiso import count_isomorphisms_vf2

    @ray.remote
    def _aut(name: str) -> tuple:
        n, edges = FAMOUS[name]()
        src = np.asarray([e[0] for e in edges], dtype=np.int64)
        dst = np.asarray([e[1] for e in edges], dtype=np.int64)
        return name, count_isomorphisms_vf2(src, dst, n, src, dst, n,
                                            directed=False)

    rows = ray.get([_aut.remote(nm) for nm in sorted(AUTOMORPHISM_TRUTH)])
    return pa.table({"name": pa.array([r[0] for r in rows], pa.string()),
                     "aut": pa.array([int(r[1]) for r in rows],
                                     pa.int64())})


def _sql_automorphisms() -> str:
    rows = ", ".join(f"('{k}', {v})"
                     for k, v in sorted(AUTOMORPHISM_TRUTH.items()))
    return (f"SELECT * FROM (VALUES {rows}) AS t(name, aut) ORDER BY name")


CITED_N, CITED_K, CITED_PREF, CITED_EPS, CITED_SEED = 300, 3, (5, 1, 3), 2, 17


def q_cited_type(sf_dir: str):
    """Cited-type citation growth (igraph_cited_type_game,
    games.c:3167): 300 vertices, types v mod 3, preference weights
    (5,1,3), 2 citations per step — md5-deterministic draws with the
    CLOSED-FORM prefix-mass inversion (types cycle mod K, so the
    cumulative preference mass needs no sequential cumsum), identical
    at any parallelism. Oracle = the same draw-and-invert arithmetic
    replayed per (i, j) in SQL."""
    from igraph_ray.sources.games import cited_type_game

    return cited_type_game(CITED_N, CITED_PREF, CITED_K,
                           edges_per_step=CITED_EPS,
                           seed=CITED_SEED).sort(["src", "dst"])


def _sql_cited_type() -> str:
    row = list(CITED_PREF)
    K = CITED_K
    P = [0]
    for x in row:
        P.append(P[-1] + int(x))
    T = P[-1]
    fold = "CAST(0 AS BIGINT)"
    for kk in range(1, 13):
        fold = (f"(({fold}) * 16 + "
                f"(strpos('0123456789abcdef', substr(h, {kk}, 1)) - 1))")
    pcase = ("CASE " + " ".join(
        f"WHEN (i % {K}) = {r} THEN {P[r]}" for r in range(K)) + " END")
    poscase = ("CASE " + " ".join(
        f"WHEN (r % {T}) < {P[r + 1]} THEN {r}" for r in range(K - 1))
        + f" ELSE {K - 1} END")
    return f"""
WITH steps AS (
  SELECT a.i AS i, b.j AS j
  FROM (SELECT UNNEST(range(1, {CITED_N})) AS i) a,
       (SELECT UNNEST(range({CITED_EPS})) AS j) b),
d AS (SELECT i, j,
  md5('{CITED_SEED}:c:' || CAST(i AS VARCHAR) || ':'
      || CAST(j AS VARCHAR)) AS h FROM steps),
f AS (SELECT i, j, {fold} AS draw FROM d),
s AS (SELECT i, j, draw,
  (i // {K}) * {T} + ({pcase}) AS mass FROM f),
r AS (SELECT i, (draw * mass) // {16 ** 12} AS r FROM s WHERE mass > 0),
t AS (SELECT i, (r // {T}) * {K} + ({poscase}) AS dst FROM r)
SELECT CAST(i AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM t
ORDER BY src, dst
"""


STC_N, STC_P_E6, STC_SEED = 12, 250_000, 37


def _stc_sql_edges() -> str:
    HEX15 = 16 ** 15
    thr = STC_P_E6 * HEX15 // 1_000_000
    fold = "CAST(0 AS BIGINT)"
    for kk in range(1, 16):
        fold = (f"(({fold}) * 16 + "
                f"(strpos('0123456789abcdef', substr(h, {kk}, 1)) - 1))")
    return f"""
  SELECT i AS src, j AS dst FROM (
    SELECT i, j, {fold} AS r FROM (
      SELECT a.i AS i, b.j AS j,
        md5('{STC_SEED}:dg:' || CAST(a.i AS VARCHAR) || ':'
            || CAST(b.j AS VARCHAR)) AS h
      FROM (SELECT UNNEST(range({STC_N})) AS i) a,
           (SELECT UNNEST(range({STC_N})) AS j) b
      WHERE a.i != b.j) t) u
  WHERE r < CAST({thr} AS BIGINT)"""


def _stc_edges():
    import hashlib

    HEX15 = 16 ** 15
    thr = STC_P_E6 * HEX15 // 1_000_000
    src, dst = [], []
    for i in range(STC_N):
        for j in range(STC_N):
            if i == j:
                continue
            d = int(hashlib.md5(f"{STC_SEED}:dg:{i}:{j}".encode())
                    .hexdigest()[:15], 16)
            if d < thr:
                src.append(i)
                dst.append(j)
    return pa.table({"src": pa.array(src, pa.int64()),
                     "dst": pa.array(dst, pa.int64())})


def q_all_st_cuts(sf_dir: str):
    """All minimal s-t edge cuts (igraph_all_st_cuts, st-cuts.c:976;
    Provan–Shier) of a deterministic 12-vertex md5 digraph, s=0,
    t=11: (cut_id, src, dst) with cut_id the source-side vertex
    bitmask. Engine = the closed-partition enumeration in one guarded
    task (exponential by nature, like the reference's output); oracle
    = the identical characterization per mask — s-generation and
    cut-head co-reachability — via recursive CTEs."""
    from igraph_ray.algorithms.stcuts import all_st_cuts

    g = Graph(ray.data.from_arrow(_stc_edges()))
    return all_st_cuts(g, 0, STC_N - 1).sort(["cut_id", "src", "dst"])


def _sql_all_st_cuts() -> str:
    n, t = STC_N, STC_N - 1
    return f"""
WITH RECURSIVE e0 AS MATERIALIZED ({_stc_sql_edges()}),
fw(v) AS (SELECT CAST(0 AS BIGINT) UNION
  SELECT e.dst FROM fw JOIN e0 e ON e.src = fw.v),
bw(v) AS (SELECT CAST({t} AS BIGINT) UNION
  SELECT e.src FROM bw JOIN e0 e ON e.dst = bw.v),
rv AS MATERIALIZED (SELECT DISTINCT f.v FROM fw f JOIN bw b ON b.v = f.v),
rmask AS (SELECT SUM(CAST(1 AS BIGINT) << CAST(v AS INTEGER)) AS rm
  FROM rv),
e_r AS MATERIALIZED (SELECT e.src, e.dst FROM e0 e
  JOIN rv a ON a.v = e.src JOIN rv b ON b.v = e.dst),
masks AS MATERIALIZED (
  SELECT m, xor(rm, m) AS comp FROM
    (SELECT UNNEST(range({1 << n})) AS m) t, rmask
  WHERE (m & 1) = 1 AND ((m >> {t}) & 1) = 0
    AND (m & ~rm) = 0),
reach(m, v) AS (
  SELECT m, CAST(0 AS BIGINT) FROM masks
  UNION
  SELECT r.m, e.dst FROM reach r JOIN e_r e ON e.src = r.v
  JOIN masks k ON k.m = r.m
  WHERE ((k.m >> CAST(e.dst AS INTEGER)) & 1) = 1),
sgen AS MATERIALIZED (
  SELECT k.m, k.comp FROM masks k
  JOIN (SELECT m, COUNT(DISTINCT v) AS c FROM reach GROUP BY m) rc
    ON rc.m = k.m
  WHERE rc.c = bit_count(k.m)),
wreach(m, v) AS (
  SELECT m, CAST({t} AS BIGINT) FROM sgen
  UNION
  SELECT w.m, e.src FROM wreach w JOIN e_r e ON e.dst = w.v
  JOIN sgen k ON k.m = w.m
  WHERE ((k.comp >> CAST(e.src AS INTEGER)) & 1) = 1),
cute AS MATERIALIZED (
  SELECT k.m, e.src, e.dst FROM sgen k JOIN e_r e
    ON ((k.m >> CAST(e.src AS INTEGER)) & 1) = 1
   AND ((k.m >> CAST(e.dst AS INTEGER)) & 1) = 0),
ok AS (SELECT m FROM sgen s
  WHERE NOT EXISTS (SELECT 1 FROM cute c
    WHERE c.m = s.m AND NOT EXISTS (
      SELECT 1 FROM wreach w WHERE w.m = c.m AND w.v = c.dst)))
SELECT CAST(c.m AS BIGINT) AS cut_id, CAST(c.src AS BIGINT) AS src,
       CAST(c.dst AS BIGINT) AS dst
FROM cute c JOIN ok ON ok.m = c.m
ORDER BY cut_id, src, dst
"""


def q_all_st_mincuts(sf_dir: str):
    """All MINIMUM s-t cuts (igraph_all_st_mincuts, st-cuts.c:1290,
    unit capacities): the minimal cuts of q_all_st_cuts filtered to
    the minimum edge count — same engine task with mincuts_only;
    oracle = the all-cuts oracle filtered by the min group size."""
    from igraph_ray.algorithms.stcuts import all_st_cuts

    g = Graph(ray.data.from_arrow(_stc_edges()))
    return all_st_cuts(g, 0, STC_N - 1,
                       mincuts_only=True).sort(["cut_id", "src", "dst"])


def _sql_all_st_mincuts() -> str:
    return f"""
WITH allc AS MATERIALIZED ({_sql_all_st_cuts()}),
sizes AS (SELECT cut_id, COUNT(*) AS k FROM allc GROUP BY cut_id),
best AS (SELECT MIN(k) AS k FROM sizes)
SELECT a.cut_id AS cut_id, a.src AS src, a.dst AS dst FROM allc a
JOIN sizes s ON s.cut_id = a.cut_id, best
WHERE s.k = best.k
ORDER BY a.cut_id, a.src, a.dst
"""


def q_graphical(sf_dir: str):
    """Degree-sequence predicates (igraph_is_degree_sequence /
    igraph_is_graphical_degree_sequence,
    structural_properties.c:6629,6686) on the canonical undirected
    sparse graph's degree multiset and the same multiset with one
    degree-1 vertex appended (odd sum → both false). Engine =
    vectorized Erdős–Gallai from the distributed degree histogram;
    oracle = Erdős–Gallai written independently in SQL window/self-join
    arithmetic. Rows (seq, is_seq, is_graphical)."""
    from igraph_ray.ops.structural import is_graphical_degree_sequence

    und = derive.graph_sparse(sf_dir).canonical_undirected()

    def _deg(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        t = pa.table({"v": pa.array(np.concatenate([lo, hi])),
                      "d": pa.array(np.ones(2 * len(lo), np.int64))})
        return (t.group_by("v").aggregate([("d", "sum")])
                .rename_columns(["v", "d"]))

    degt = (und.map_batches(_deg, batch_format="pyarrow", batch_size=None)
            .groupby("v").sum("d"))
    # degree HISTOGRAM to the driver (O(#distinct degrees), scale-safe);
    # the predicate itself is sequence-level by definition
    hist = {}
    for r in degt.groupby("sum(d)").count().take_all():
        hist[int(r["sum(d)"])] = int(r["count()"])
    seq = np.repeat(np.fromiter(hist.keys(), np.int64),
                    np.fromiter(hist.values(), np.int64))
    a_seq, a_gr = is_graphical_degree_sequence(seq)
    b_seq, b_gr = is_graphical_degree_sequence(
        np.concatenate([seq, [1]]))
    return pa.table({
        "seq": pa.array(["plus_one", "sparse"], pa.string()),
        "is_seq": pa.array([int(b_seq), int(a_seq)], pa.int64()),
        "is_graphical": pa.array([int(b_gr), int(a_gr)], pa.int64())})


def _sql_graphical() -> str:
    return f"""
WITH m AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM ({derive.SQL_EDGES_SPARSE})),
deg AS MATERIALIZED (SELECT v, COUNT(*) AS d FROM (
  SELECT lo AS v FROM m UNION ALL SELECT hi FROM m) t GROUP BY v),
ds AS MATERIALIZED (SELECT d,
  ROW_NUMBER() OVER (ORDER BY d DESC, v) AS k FROM deg),
pre AS (SELECT k, d, SUM(d) OVER (ORDER BY k) AS lhs FROM ds),
rhs AS (SELECT a.k,
  SUM(CASE WHEN b.d < a.k THEN b.d ELSE a.k END) AS mins
  FROM ds a JOIN ds b ON b.k > a.k GROUP BY a.k),
chk AS (SELECT BOOL_AND(p.lhs <= p.k * (p.k - 1) + COALESCE(r.mins, 0))
  AS ok FROM pre p LEFT JOIN rhs r ON r.k = p.k),
tot AS (SELECT SUM(d) AS s FROM deg)
SELECT 'sparse' AS seq,
  CAST(CASE WHEN tot.s % 2 = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_seq,
  CAST(CASE WHEN tot.s % 2 = 0 AND chk.ok THEN 1 ELSE 0 END AS BIGINT)
    AS is_graphical
FROM tot, chk
UNION ALL
SELECT 'plus_one' AS seq,
  CAST(CASE WHEN (tot.s + 1) % 2 = 0 THEN 1 ELSE 0 END AS BIGINT),
  CAST(0 AS BIGINT)
FROM tot
ORDER BY seq
"""


LCF_CODES = {"heawood": (14, (5, -5)), "nauru": (24, (5, -9, 7, -7, 9, -5))}


def q_lcf(sf_dir: str):
    """LCF-notation graphs (igraph_lcf_vector,
    structure_generators.c:1617): Heawood [5,-5]⁷ and Nauru
    [5,-9,7,-7,9,-5]⁴ as (name, lo, hi) canonical edges. Engine =
    sources.structures.lcf_edges (ring + dedup'd chords); oracle =
    the SAME construction written INDEPENDENTLY in SQL arithmetic
    (range + mod CASE ladder + LEAST/GREATEST dedup)."""
    from igraph_ray.sources.structures import lcf_edges

    names, los, his = [], [], []
    for nm in sorted(LCF_CODES):
        n, shifts = LCF_CODES[nm]
        for a, b in lcf_edges(n, list(shifts), n // len(shifts)):
            names.append(nm)
            los.append(a)
            his.append(b)
    return pa.table({"name": pa.array(names, pa.string()),
                     "lo": pa.array(los, pa.int64()),
                     "hi": pa.array(his, pa.int64())})


def _sql_lcf() -> str:
    parts = []
    for nm in sorted(LCF_CODES):
        n, shifts = LCF_CODES[nm]
        k = len(shifts)
        case = ("CASE " + " ".join(
            f"WHEN i % {k} = {r} THEN {shifts[r]}"
            for r in range(k)) + " END")
        parts.append(f"""
SELECT '{nm}' AS name, LEAST(i, j) AS lo, GREATEST(i, j) AS hi FROM (
  SELECT i, (i + 1) % {n} AS j
  FROM (SELECT UNNEST(range({n})) AS i)
  UNION
  SELECT i, ((i + ({case})) % {n} + {n}) % {n} AS j
  FROM (SELECT UNNEST(range({n})) AS i)
) t""")
    u = " UNION ".join(f"SELECT DISTINCT name, lo, hi FROM ({p}) q{i}"
                       for i, p in enumerate(parts))
    return (f"SELECT name, CAST(lo AS BIGINT) AS lo, "
            f"CAST(hi AS BIGINT) AS hi FROM ({u}) z "
            f"ORDER BY name, lo, hi")


def q_optimal_modularity(sf_dir: str):
    """Exact maximum-modularity partition
    (igraph_community_optimal_modularity, optimal_modularity.c:38) of a
    deterministic 14-vertex planted 2-block SBM (p_in=0.6, p_out=0.08,
    seed=21): (vertex, community, q_e9) with min-member canonical
    labels. Branch-and-bound with a greedy-agglomerative incumbent in
    ONE guarded task — NP-hard exactly like the reference's GLPK ILP,
    hence rows-only at the gate; brute-force-partition parity is
    pytest-gated in tests/test_optimal_modularity.py."""
    from igraph_ray.sources.games import sbm_game
    from igraph_ray.algorithms.optimal_modularity import optimal_modularity

    edges = sbm_game((7, 7), [[600_000, 80_000], [80_000, 600_000]],
                     seed=21)
    return optimal_modularity(Graph(edges)).sort("vertex")


IMIT_SEED, IMIT_ROUNDS = 7, 2
ROUL_SEED = 11
MORAN_SEED = 13


def _sql_fold8(h: str) -> str:
    f = "CAST(0 AS BIGINT)"
    for kk in range(1, 9):
        f = (f"(({f}) * 16 + "
             f"(strpos('0123456789abcdef', substr({h}, {kk}, 1)) - 1))")
    return f


_SQL_IMIT_BASE = f"""
WITH m AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM ({{edges}}) WHERE src != dst),
sym AS MATERIALIZED (SELECT lo AS a, hi AS b FROM m
  UNION ALL SELECT hi, lo FROM m),
verts AS MATERIALIZED (SELECT DISTINCT a AS v FROM sym),
st0 AS MATERIALIZED (SELECT v AS vertex,
  CAST(v % 5 AS BIGINT) AS strategy,
  CAST(({_sql_fold8("md5('q:' || '{seed}' || ':' || CAST(v AS VARCHAR))")})
       % 1001 AS BIGINT) AS quantity
  FROM verts)
"""


def q_optimal_imitation(sf_dir: str):
    """Synchronous deterministic optimal imitation
    (igraph_deterministic_optimal_imitation,
    microscopic_update.c:570, IGRAPH_MAXIMUM, IGRAPH_ALL) over the
    sparse derived graph's undirected view — every vertex adopts the
    strategy of its strictly-better best-quantity neighbor (smallest
    id among ties), 2 rounds; md5-derived integer quantities. Oracle =
    the identical rule unrolled with grouped max / tie-min joins."""
    from igraph_ray.algorithms.imitation import optimal_imitation

    return optimal_imitation(derive.graph_sparse(sf_dir), seed=IMIT_SEED,
                             rounds=IMIT_ROUNDS)


def _sql_optimal_imitation() -> str:
    parts = [_SQL_IMIT_BASE.format(edges=derive.SQL_EDGES_SPARSE,
                                   seed=IMIT_SEED)]
    for r in range(1, IMIT_ROUNDS + 1):
        parts.append(f"""
, nb{r} AS MATERIALIZED (
  SELECT s.a AS v, s.b AS u, st.strategy AS us, st.quantity AS uq
  FROM sym s JOIN st{r-1} st ON st.vertex = s.b),
bq{r} AS (SELECT v, MAX(uq) AS bq FROM nb{r} GROUP BY v),
bu{r} AS (SELECT n.v, MIN(n.u) AS bu FROM nb{r} n
  JOIN bq{r} b ON b.v = n.v AND n.uq = b.bq GROUP BY n.v),
st{r} AS MATERIALIZED (
  SELECT s.vertex,
    CASE WHEN b.bq IS NOT NULL AND b.bq > s.quantity
         THEN ns.strategy ELSE s.strategy END AS strategy,
    s.quantity AS quantity
  FROM st{r-1} s
  LEFT JOIN bq{r} b ON b.v = s.vertex
  LEFT JOIN bu{r} u ON u.v = s.vertex
  LEFT JOIN st{r-1} ns ON ns.vertex = u.bu)""")
    parts.append(f"SELECT vertex, strategy, quantity FROM st{IMIT_ROUNDS} "
                 f"ORDER BY vertex")
    return "\n".join(parts)


def q_roulette_imitation(sf_dir: str):
    """Synchronous roulette-wheel imitation
    (igraph_roulette_wheel_imitation, microscopic_update.c:959,
    islocal, IGRAPH_ALL) — every vertex draws one 32-bit md5 value and
    adopts the first ascending-id neighbor whose cumulative quantity
    share covers the draw (retains past the last neighbor: the
    appended-self rule), 2 rounds, exact integer comparisons. Oracle =
    the same rule as per-vertex window cumsums."""
    from igraph_ray.algorithms.imitation import roulette_wheel_imitation

    return roulette_wheel_imitation(derive.graph_sparse(sf_dir),
                                    seed=ROUL_SEED, rounds=IMIT_ROUNDS)


def _sql_roulette_imitation() -> str:
    parts = [_SQL_IMIT_BASE.format(edges=derive.SQL_EDGES_SPARSE,
                                   seed=ROUL_SEED)]
    for r in range(1, IMIT_ROUNDS + 1):
        draw = _sql_fold8(
            f"md5('{ROUL_SEED}' || ':r{r-1}:' || CAST(t.v AS VARCHAR))")
        parts.append(f"""
, nb{r} AS MATERIALIZED (
  SELECT s.a AS v, s.b AS u, st.strategy AS us, st.quantity AS uq
  FROM sym s JOIN st{r-1} st ON st.vertex = s.b),
cw{r} AS (
  SELECT n.v, n.u, n.us,
    SUM(n.uq) OVER (PARTITION BY n.v ORDER BY n.u) AS cum,
    SUM(n.uq) OVER (PARTITION BY n.v) AS tot,
    oq.quantity AS vq
  FROM nb{r} n JOIN st{r-1} oq ON oq.vertex = n.v),
sel{r} AS (
  SELECT t.v, MIN(t.u) AS pu FROM cw{r} t
  WHERE ({draw}) * (t.tot + t.vq) <= 4294967296 * t.cum
  GROUP BY t.v),
st{r} AS MATERIALIZED (
  SELECT s.vertex,
    CASE WHEN sel.pu IS NOT NULL THEN ns.strategy
         ELSE s.strategy END AS strategy,
    s.quantity AS quantity
  FROM st{r-1} s
  LEFT JOIN sel{r} sel ON sel.v = s.vertex
  LEFT JOIN st{r-1} ns ON ns.vertex = sel.pu)""")
    parts.append(f"SELECT vertex, strategy, quantity FROM st{IMIT_ROUNDS} "
                 f"ORDER BY vertex")
    return "\n".join(parts)


STOCH_SEED = 19


def q_stochastic_imitation(sf_dir: str):
    """Synchronous stochastic imitation (igraph_stochastic_imitation,
    microscopic_update.c:1119, IGRAPH_IMITATE_AUGMENTED, IGRAPH_ALL)
    over the sparse derived graph's undirected view: every vertex
    draws one md5 32-bit value, picks the (draw mod deg)-th ascending
    neighbor, and adopts its strategy iff the neighbor's quantity is
    strictly larger. Oracle = the identical draw-and-pick replayed per
    round in SQL (ROW_NUMBER ascending-neighbor rank)."""
    from igraph_ray.algorithms.imitation import stochastic_imitation

    return stochastic_imitation(derive.graph_sparse(sf_dir),
                                algo="augmented", seed=STOCH_SEED,
                                rounds=IMIT_ROUNDS)


def _sql_stochastic_imitation() -> str:
    parts = [_SQL_IMIT_BASE.format(edges=derive.SQL_EDGES_SPARSE,
                                   seed=STOCH_SEED)]
    for r in range(1, IMIT_ROUNDS + 1):
        draw = _sql_fold8(
            f"md5('{STOCH_SEED}' || ':s{r-1}:' || CAST(n.v AS VARCHAR))")
        parts.append(f"""
, nb{r} AS MATERIALIZED (
  SELECT s.a AS v, s.b AS u, st.strategy AS us, st.quantity AS uq,
         ROW_NUMBER() OVER (PARTITION BY s.a ORDER BY s.b) - 1 AS rn,
         COUNT(*) OVER (PARTITION BY s.a) AS deg
  FROM sym s JOIN st{r-1} st ON st.vertex = s.b),
pick{r} AS (
  SELECT n.v, n.us, n.uq FROM nb{r} n
  WHERE n.rn = ({draw}) % n.deg),
st{r} AS MATERIALIZED (
  SELECT s.vertex,
    CASE WHEN p.uq IS NOT NULL AND p.uq > s.quantity THEN p.us
         ELSE s.strategy END AS strategy,
    s.quantity AS quantity
  FROM st{r-1} s LEFT JOIN pick{r} p ON p.v = s.vertex)""")
    parts.append(f"SELECT vertex, strategy, quantity FROM st{IMIT_ROUNDS} "
                 f"ORDER BY vertex")
    return "\n".join(parts)


def q_moran_step(sf_dir: str):
    """One igraph_moran_process birth-death step
    (microscopic_update.c:723, IGRAPH_ALL, unit edge weights) on the
    sparse derived graph's undirected view: reproducer drawn ∝
    quantity over ascending vertices, the replaced neighbor drawn ∝
    unit weight over the reproducer's ascending neighbors; the clone
    inherits strategy AND quantity. md5 draws; exact integers."""
    from igraph_ray.algorithms.imitation import moran_process

    return moran_process(derive.graph_sparse(sf_dir), seed=MORAN_SEED)


def _sql_moran_step() -> str:
    import hashlib as _h

    d1 = int(_h.md5(f"{MORAN_SEED}:moran:a".encode()).hexdigest()[:8], 16)
    d2 = int(_h.md5(f"{MORAN_SEED}:moran:b".encode()).hexdigest()[:8], 16)
    base = _SQL_IMIT_BASE.format(edges=derive.SQL_EDGES_SPARSE,
                                 seed=MORAN_SEED)
    return base + f"""
, cum AS (SELECT vertex, strategy, quantity,
    SUM(quantity) OVER (ORDER BY vertex) AS c,
    SUM(quantity) OVER () AS s1 FROM st0),
av AS (SELECT MIN(vertex) AS a FROM cum
  WHERE CAST({d1} AS BIGINT) * s1 <= 4294967296 * c),
nbr AS (SELECT s.b AS u,
    ROW_NUMBER() OVER (ORDER BY s.b) AS rn,
    COUNT(*) OVER () AS nn
  FROM sym s JOIN av ON s.a = av.a),
bv AS (SELECT MIN(u) AS b FROM nbr
  WHERE CAST({d2} AS BIGINT) * nn <= 4294967296 * rn)
SELECT s.vertex,
  CASE WHEN s.vertex = bv.b THEN sa.strategy ELSE s.strategy END AS strategy,
  CASE WHEN s.vertex = bv.b THEN sa.quantity ELSE s.quantity END AS quantity
FROM st0 s, bv, av JOIN st0 sa ON sa.vertex = av.a
ORDER BY s.vertex
"""


ISET_N, ISET_P_E6, ISET_SEED = 24, 250_000, 9


def q_largest_independent_sets(sf_dir: str):
    """igraph_largest_independent_vertex_sets (cliques.c:1058): the
    maximum-size rows of the maximal-independent-set stream on the same
    24-vertex md5 fixture; oracle = the independent_sets oracle
    filtered to its MAX(size)."""
    from igraph_ray.sources.games import sbm_game
    from igraph_ray.algorithms.independent_sets import (
        largest_independent_vertex_sets,
    )

    edges = sbm_game((ISET_N,), [[ISET_P_E6]], seed=ISET_SEED)
    sets = largest_independent_vertex_sets(Graph(edges), ISET_N)

    def _mask(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"mask": pa.array([], pa.int64()),
                             "size": pa.array([], pa.int64())})
        masks = [sum(1 << int(v) for v in s)
                 for s in b["set"].to_pylist()]
        return pa.table({"mask": pa.array(masks, pa.int64()),
                         "size": b["size"]})

    return sets.map_batches(_mask, batch_format="pyarrow",
                            batch_size=None).sort("mask")


def q_independent_sets(sf_dir: str):
    """All maximal independent vertex sets
    (igraph_maximal_independent_vertex_sets, cliques.c:400) of a
    deterministic 24-vertex md5-Bernoulli graph (sbm_game, one block,
    p=0.25, seed=9), one row per set as a vertex bitmask:
    (mask, size). Engine = the reference's complement reduction —
    distributed complement pass + distributed Bron–Kerbosch; oracle =
    the same md5 edge replay, complement in SQL, and the ascending
    clique-growth CTE with the outside-extension maximality test.
    MAX(size) over the rows is igraph_independence_number
    (cliques.c:1106)."""
    from igraph_ray.sources.games import sbm_game
    from igraph_ray.algorithms.independent_sets import (
        maximal_independent_sets,
    )

    edges = sbm_game((ISET_N,), [[ISET_P_E6]], seed=ISET_SEED)
    sets = maximal_independent_sets(Graph(edges), ISET_N)

    def _mask(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"mask": pa.array([], pa.int64()),
                             "size": pa.array([], pa.int64())})
        masks = [sum(1 << int(v) for v in s)
                 for s in b["set"].to_pylist()]
        return pa.table({"mask": pa.array(masks, pa.int64()),
                         "size": b["size"]})

    return sets.map_batches(_mask, batch_format="pyarrow",
                            batch_size=None).sort("mask")


def _sql_independent_sets() -> str:
    n, seed = ISET_N, ISET_SEED
    HEX15 = 16 ** 15
    thr = ISET_P_E6 * HEX15 // 1_000_000
    fold = "CAST(0 AS BIGINT)"
    for kk in range(1, 16):
        fold = (f"(({fold}) * 16 + "
                f"(strpos('0123456789abcdef', substr(h, {kk}, 1)) - 1))")
    return f"""
WITH RECURSIVE pairs AS (
  SELECT a.i AS i, b.j AS j
  FROM (SELECT UNNEST(range({n})) AS i) a,
       (SELECT UNNEST(range({n})) AS j) b
  WHERE b.j > a.i),
hs AS (SELECT i, j,
  md5('{seed}:s:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS h
  FROM pairs),
g AS MATERIALIZED (SELECT i AS lo, j AS hi FROM
  (SELECT i, j, {fold} AS r FROM hs) t WHERE r < CAST({thr} AS BIGINT)),
-- complement graph: pairs NOT in g
und AS MATERIALIZED (
  SELECT p.i AS lo, p.j AS hi FROM pairs p
  WHERE NOT EXISTS (SELECT 1 FROM g WHERE g.lo = p.i AND g.hi = p.j)),
verts AS MATERIALIZED (SELECT UNNEST(range({n})) AS v),
adj AS MATERIALIZED (SELECT lo AS a, hi AS b FROM und
  UNION ALL SELECT hi, lo FROM und),
cl AS (
  SELECT [v] AS members, v AS last FROM verts
  UNION
  SELECT list_append(c.members, u.hi), u.hi
  FROM cl c JOIN und u ON u.lo = c.last
  WHERE (SELECT COUNT(*) FROM adj a
         WHERE a.a = u.hi AND list_contains(c.members, a.b))
        = len(c.members)
),
maxcl AS (
  SELECT members FROM cl c
  WHERE NOT EXISTS (
    SELECT 1 FROM adj a
    WHERE list_contains(c.members, a.b)
      AND NOT list_contains(c.members, a.a)
    GROUP BY a.a
    HAVING COUNT(*) = len(c.members)))
SELECT CAST(list_sum(list_transform(members,
         x -> CAST(1 AS BIGINT) << CAST(x AS INTEGER))) AS BIGINT) AS mask,
       CAST(len(members) AS BIGINT) AS size
FROM maxcl ORDER BY mask
"""


def q_largest_cliques(sf_dir: str):
    """igraph_largest_cliques (cliques.c:1005) over the sparse derived
    graph: the maximum-size maximal cliques as canonical comma-joined
    member strings, (clique, size) — scalar max + filter over the
    distributed maximal-clique stream."""
    from igraph_ray.algorithms.independent_sets import largest_cliques

    out = largest_cliques(derive.graph_sparse(sf_dir), num_partitions=8)

    def _s(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"clique": pa.array([], pa.string()),
                             "size": pa.array([], pa.int64())})
        s = [",".join(str(int(v)) for v in c)
             for c in b["clique"].to_pylist()]
        return pa.table({"clique": pa.array(s, pa.string()),
                         "size": b["size"]})

    return out.map_batches(_s, batch_format="pyarrow",
                           batch_size=None).sort("clique")


_SQL_LARGEST_CLIQUES_TMPL = """
SELECT array_to_string(members, ',') AS clique,
       CAST(len(members) AS BIGINT) AS size
FROM maxcl WHERE len(members) = (SELECT MAX(len(members)) FROM maxcl)
ORDER BY clique
"""


BFS_SOURCE, BFS_LEVELS = 1, 12


def q_bfs_order(sf_dir: str):
    """BFS visitor metadata (igraph_bfs, visitors.c:26) from vertex 1
    over the sparse derived digraph: (vertex, rank, father, dist) under
    deterministic sorted-neighbor FIFO order, single root. Engine =
    level-synchronous join / grouped-min / anti-join with block-count
    rank assignment; oracle = the identical queue recurrence unrolled
    level by level (father = earliest-ranked previous-level
    in-neighbor; within-level order = (father_rank, vertex))."""
    from igraph_ray.algorithms.visitors import bfs_visitor

    g = derive.graph_sparse(sf_dir)
    return bfs_visitor(g, source=BFS_SOURCE, max_levels=BFS_LEVELS)


def _sql_bfs_parts() -> tuple:
    """(CTE prefix, all-levels union select) of the unrolled BFS queue
    recurrence — shared by the bfs_order and unfold_tree oracles."""
    parts = [f"WITH e AS MATERIALIZED ({derive.SQL_EDGES_SPARSE}),",
             f"l0 AS (SELECT CAST({BFS_SOURCE} AS BIGINT) AS v, "
             f"CAST(0 AS BIGINT) AS rnk, CAST(-1 AS BIGINT) AS father),",
             "s0 AS (SELECT v, rnk FROM l0)"]
    for k in range(1, BFS_LEVELS + 1):
        parts.append(
            f", c{k} AS MATERIALIZED (SELECT e.dst AS v, "
            f"MIN(l.rnk) AS frank FROM l{k-1} l JOIN e ON e.src = l.v "
            f"WHERE e.dst NOT IN (SELECT v FROM s{k-1}) GROUP BY e.dst)")
        parts.append(
            f", l{k} AS MATERIALIZED (SELECT c.v, "
            f"(SELECT COUNT(*) FROM s{k-1}) - 1 + "
            f"ROW_NUMBER() OVER (ORDER BY c.frank, c.v) AS rnk, "
            f"p.v AS father FROM c{k} c JOIN l{k-1} p ON p.rnk = c.frank)")
        parts.append(
            f", s{k} AS MATERIALIZED (SELECT v, rnk FROM s{k-1} "
            f"UNION ALL SELECT v, rnk FROM l{k})")
    sel = " UNION ALL ".join(
        f"SELECT v, rnk, father, CAST({k} AS BIGINT) AS dist FROM l{k}"
        for k in range(BFS_LEVELS + 1))
    return "\n".join(parts), sel


def _sql_bfs_order() -> str:
    prefix, sel = _sql_bfs_parts()
    return (f"{prefix}\n SELECT v AS vertex, rnk AS rank, father, dist "
            f"FROM ({sel}) ORDER BY vertex")


def q_unfold_tree(sf_dir: str):
    """igraph_unfold_tree (structural_properties.c:5552) from vertex 1
    over the sparse derived digraph: the reachable subgraph as a tree,
    every non-tree edge (u, w) replaced by (u, copy, w) with copy ids
    V, V+1, … in deterministic (queue-rank-of-u, w) order. Rows =
    (src, dst, dst_orig). Engine = bfs_visitor ranks + joins + one
    block-offset rank; oracle = the same BFS CTE extended with the
    father-edge exclusion and a ROW_NUMBER copy sequence."""
    from igraph_ray.algorithms.visitors import unfold_tree

    g = derive.graph_sparse(sf_dir)
    return unfold_tree(g, source=BFS_SOURCE, n=derive.V,
                       max_levels=BFS_LEVELS)


def _sql_unfold_tree() -> str:
    prefix, sel = _sql_bfs_parts()
    return f"""{prefix}
, bfs AS MATERIALIZED (SELECT v, rnk, father FROM ({sel})),
tree AS (SELECT father AS src, v AS dst, v AS dst_orig
  FROM bfs WHERE father >= 0),
nont AS (SELECT e.src AS u, e.dst AS w, bu.rnk AS ur
  FROM e JOIN bfs bu ON bu.v = e.src
  JOIN bfs bw ON bw.v = e.dst
  WHERE bw.father IS DISTINCT FROM e.src),
copies AS (SELECT u, w,
  ROW_NUMBER() OVER (ORDER BY ur, w) - 1 AS idx FROM nont)
SELECT src, dst, dst_orig FROM tree
UNION ALL
SELECT u AS src, CAST({derive.V} + idx AS BIGINT) AS dst, w AS dst_orig
FROM copies
ORDER BY src, dst
"""


def q_dfs_order(sf_dir: str):
    """DFS visitor metadata (igraph_dfs, visitors.c:395) from vertex 1
    over the sparse derived digraph: (vertex, order, order_out, father,
    dist) under deterministic ascending-neighbor order. Rows-only at
    the gate (the stack discipline is a sequential dependency chain —
    same class as dominators); exactness vs a recursive reference
    replay is pytest-gated in tests/test_visitors.py."""
    from igraph_ray.algorithms.visitors import dfs_visitor

    g = derive.graph_sparse(sf_dir)
    return dfs_visitor(g, source=BFS_SOURCE)


def q_forest_fire(sf_dir: str):
    """Forest fire growth model (igraph_forest_fire_game,
    forestfire.c:106), md5-deterministic variant, n=400, fw=0.3,
    bw=0.6. Rows-only (the burn frontier is a sequential recursion
    over the prefix graph — same class as the reference's RNG loop);
    structural + determinism pytests in tests/test_games.py."""
    from igraph_ray.sources.games import forest_fire_game

    return forest_fire_game(400, fw_prob=0.3, bw_factor=0.6,
                            seed=7).sort(["src", "dst"])


def q_cohesive_blocks(sf_dir: str):
    """Moody–White cohesive blocking (igraph_cohesive_blocks,
    cohesive_blocks.c:202) over the very-sparse derived graph:
    (block, cohesion, parent, size) rows. Rows-only at the gate (the
    recursion is sequential); EXACT parity with the reference's own
    example outputs (4 graphs incl. karate) is pytest-gated in
    tests/test_cohesive.py."""
    from igraph_ray.algorithms.cohesive import cohesive_blocks

    g = derive.graph_vsparse(sf_dir)
    info, _ = cohesive_blocks(g)
    return info


def q_cohesive_block_members(sf_dir: str):
    """Membership rows (block, vertex) of q_cohesive_blocks."""
    from igraph_ray.algorithms.cohesive import cohesive_blocks

    g = derive.graph_vsparse(sf_dir)
    _, members = cohesive_blocks(g)
    return members


def q_frequent_subgraphs(sf_dir: str):
    """Bounded gSpan (the fork's igraph_gspan, fsm.c:2246; ≤2-edge
    color patterns, transaction support) over the per-6h-window event
    snapshot database, vertex color = id mod 16, min support 2."""
    from igraph_ray.ops.fsm import frequent_subgraphs

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_id"])

    def _snap(b):
        import pyarrow as pa

        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        g = (ts // 1_000_000) // 21600
        src = (b["user_id"].to_numpy(zero_copy_only=False) % 512)
        dst = (b["event_id"].to_numpy(zero_copy_only=False) % 97)
        return pa.table({"g": pa.array(g),
                         "src": pa.array(src.astype("int64")),
                         "dst": pa.array(dst.astype("int64"))})

    snaps = events.map_batches(_snap, batch_format="pyarrow",
                               batch_size=None)
    return frequent_subgraphs(snaps, min_support=2, colors=16)


SQL_FREQUENT_SUBGRAPHS = """
WITH ev AS (
  SELECT (epoch_us(ts) // 1000000) // 21600 AS g,
         user_id % 512 AS src, event_id % 97 AS dst FROM events),
und AS MATERIALIZED (
  SELECT DISTINCT g, LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM ev WHERE src != dst),
sym AS MATERIALIZED (
  SELECT g, lo AS x, hi AS y FROM und UNION ALL SELECT g, hi, lo FROM und),
singles AS (
  SELECT DISTINCT g, 'e:' || LEAST(lo % 16, hi % 16) || '-'
         || GREATEST(lo % 16, hi % 16) AS pattern FROM und),
wedges AS (
  SELECT DISTINCT a.g, 'w:' || (a.x % 16) || '|'
         || LEAST(a.y % 16, b.y % 16) || '-'
         || GREATEST(a.y % 16, b.y % 16) AS pattern
  FROM sym a JOIN sym b ON a.g = b.g AND a.x = b.x AND a.y < b.y),
allp AS (SELECT * FROM singles UNION ALL SELECT * FROM wedges)
SELECT pattern, CAST(COUNT(*) AS BIGINT) AS support
FROM allp GROUP BY pattern HAVING COUNT(*) >= 2
ORDER BY pattern"""


def q_lsap(sf_dir: str):
    """Minimum-cost assignment (igraph_solve_lsap, lsap.c) of the
    deterministic 64×64 integer cost grid
    c[i][j] = ((i·37 + j·61) % 101)·1000 + (7i + 11j) % 97.
    Rows-only at the gate (the optimum needs the sequential
    augmenting-path loop); brute-force optimality and the LP-duality
    certificate are pytest-gated in tests/test_lsap.py, and the
    returned (u_e6, v_e6) columns ARE the certificate — Σu + Σv equals
    the reported cost."""
    import numpy as np

    from igraph_ray.algorithms.lsap import solve_lsap

    n = 64
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    c = (((i * 37 + j * 61) % 101) * 1000 + (7 * i + 11 * j) % 97)
    return solve_lsap(c.astype(np.float64))


def q_mcs_rank(sf_dir: str):
    """Maximum cardinality search ranks over the sparse derived graph
    (igraph_maximum_cardinality_search, decomposition.c:56;
    deterministic smallest-id tie rule). Rows-only at the gate (the
    pick loop is sequential); the pick-invariant replay pytest in
    tests/test_chordal.py carries exactness."""
    from igraph_ray.algorithms.chordal import mcs_chordal

    g = derive.graph_sparse(sf_dir)
    alpha, _, _ = mcs_chordal(g, n=derive.V)
    return alpha


def q_chordal(sf_dir: str):
    """Chordality + fill-in size of the sparse derived graph
    (igraph_is_chordal, decomposition.c:252: elimination game along
    the MCS order). Rows-only; chordal-family and fill-chordalizes
    pytests carry exactness."""
    import pyarrow as pa

    from igraph_ray.algorithms.chordal import mcs_chordal

    g = derive.graph_sparse(sf_dir)
    _, chordal, fill = mcs_chordal(g, n=derive.V)
    return pa.table({"chordal": pa.array([int(chordal)], pa.int64()),
                     "fill_count": pa.array([fill.num_rows], pa.int64())})


def q_separators(sf_dir: str):
    """igraph_is_separator / is_minimal_separator (separators.c:145,
    203) over the sparse derived graph for three candidate sets: the
    neighborhood of vertex 7 and two arithmetic rules. Engine = one
    distributed components run on G−S per set plus the
    member-adjacent-to-every-component minimality criterion (module
    docstring has the equivalence proof sketch); oracle = recursive
    undirected closure per rule with the same criterion."""
    import pyarrow as pa

    from igraph_ray.algorithms.separators import separator_profile

    g = derive.graph_sparse(sf_dir)
    uni = {int(r["vertex"]) for r in g.vertices().take_all()}
    und = g.canonical_undirected()

    def _n7(b):
        import pyarrow.compute as pc
        keep = pc.or_(pc.equal(b["lo"], 7), pc.equal(b["hi"], 7))
        t = b.filter(keep)
        return pa.table({"v": pa.concat_arrays(
            [t["lo"].combine_chunks(), t["hi"].combine_chunks()])})

    nbr7 = {int(r["v"]) for r in und.map_batches(
        _n7, batch_format="pyarrow", batch_size=None).take_all()} - {7}
    rules = {
        "mod101": {v for v in uni if v % 101 == 3},
        "mod83": {v for v in uni if v % 83 == 2},
        "nbr7": nbr7,
    }
    rows = []
    for name in sorted(rules):
        is_sep, is_min, ncomp = separator_profile(g, rules[name])
        rows.append((name, int(is_sep), int(is_min), int(ncomp)))
    return pa.table({
        "rule": pa.array([r[0] for r in rows], pa.string()),
        "is_separator": pa.array([r[1] for r in rows], pa.int64()),
        "is_minimal": pa.array([r[2] for r in rows], pa.int64()),
        "ncomp": pa.array([r[3] for r in rows], pa.int64())})


SQL_SEPARATORS = f"""
WITH RECURSIVE
e AS MATERIALIZED ({SQL_EDGES_SPARSE}),
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi FROM e),
sym AS MATERIALIZED (
  SELECT lo AS u, hi AS w FROM und UNION ALL SELECT hi, lo FROM und),
uni AS MATERIALIZED (SELECT DISTINCT u AS v FROM sym),
removed AS MATERIALIZED (
  SELECT 'nbr7' AS rule, w AS v FROM (SELECT DISTINCT w FROM sym WHERE u = 7)
  UNION ALL SELECT 'mod83', v FROM uni WHERE v % 83 = 2
  UNION ALL SELECT 'mod101', v FROM uni WHERE v % 101 = 3),
rules AS (SELECT DISTINCT rule FROM removed),
rem AS MATERIALIZED (
  SELECT r.rule, u.v FROM rules r CROSS JOIN uni u
  WHERE NOT EXISTS (SELECT 1 FROM removed x
                    WHERE x.rule = r.rule AND x.v = u.v)),
reach(rule, u, w) AS (
  SELECT rule, v AS u, v AS w FROM rem
  UNION
  SELECT rc.rule, rc.u, s.w
  FROM reach rc JOIN sym s ON s.u = rc.w
  WHERE EXISTS (SELECT 1 FROM rem t
                WHERE t.rule = rc.rule AND t.v = s.w)),
comp AS MATERIALIZED (
  SELECT rule, u, MIN(w) AS lab FROM reach GROUP BY rule, u),
nc AS (SELECT rule, COUNT(DISTINCT lab) AS ncomp FROM comp GROUP BY rule),
scount AS (SELECT rule, COUNT(*) AS sc FROM removed GROUP BY rule),
adj AS (
  SELECT x.rule, x.v AS member, c.lab
  FROM removed x
  JOIN sym s ON s.u = x.v
  JOIN comp c ON c.rule = x.rule AND c.u = s.w
  GROUP BY x.rule, x.v, c.lab),
fullmem AS (
  SELECT a.rule, a.member FROM adj a
  GROUP BY a.rule, a.member
  HAVING COUNT(*) = (SELECT ncomp FROM nc WHERE nc.rule = a.rule)),
fm AS (SELECT rule, COUNT(*) AS nfull FROM fullmem GROUP BY rule)
SELECT r.rule AS rule,
  CAST(CASE WHEN n.ncomp > 1 THEN 1 ELSE 0 END AS BIGINT) AS is_separator,
  CAST(CASE WHEN n.ncomp > 1 AND COALESCE(f.nfull, 0) = s.sc
       THEN 1 ELSE 0 END AS BIGINT) AS is_minimal,
  CAST(n.ncomp AS BIGINT) AS ncomp
FROM rules r
JOIN nc n ON n.rule = r.rule
JOIN scount s ON s.rule = r.rule
LEFT JOIN fm f ON f.rule = r.rule
ORDER BY rule"""


SP_SOURCE, SP_CUTOFF = 1, 3


def q_simple_paths(sf_dir: str):
    """All simple paths of 1..3 edges from vertex 1 over the sparse
    derived digraph (igraph_get_all_simple_paths, paths.c:60, vs=ALL),
    as '->'-joined strings. Engine = level-synchronous frontier
    expansion (one broadcast hash_join + one vectorized bitmask
    map_batches per level); oracle = recursive CTE carrying the path
    list."""
    from igraph_ray.algorithms.simple_paths import all_simple_paths

    g = derive.graph_sparse(sf_dir)
    return all_simple_paths(g, source=SP_SOURCE, cutoff=SP_CUTOFF,
                            n=derive.V)


SQL_SIMPLE_PATHS = f"""
WITH RECURSIVE
e AS MATERIALIZED ({SQL_EDGES_SPARSE}),
walk(tail, path, len) AS (
  SELECT CAST({SP_SOURCE} AS BIGINT) AS tail,
         [CAST({SP_SOURCE} AS BIGINT)] AS path, 0 AS len
  UNION ALL
  SELECT e.dst, list_append(w.path, CAST(e.dst AS BIGINT)), w.len + 1
  FROM walk w JOIN e ON e.src = w.tail
  WHERE w.len < {SP_CUTOFF} AND NOT list_contains(w.path, e.dst))
SELECT array_to_string(path, '->') AS path FROM walk WHERE len >= 1
ORDER BY path"""


def q_feedback_arc_set(sf_dir: str):
    """Eades GR feedback arc set over the sparse derived digraph
    (igraph_feedback_arc_set APPROX_EADES, feedback_arc_set.c:191).
    Rows-only at the gate (the strip order is a sequential queue
    process, not SQL-replayable); acyclicity-after-removal, the
    m/2−n/6 bound and weighted behavior are pytest-gated in
    tests/test_fas.py."""
    from igraph_ray.algorithms.fas import feedback_arc_set

    g = derive.graph_sparse(sf_dir)
    return feedback_arc_set(g, n=derive.V)


DOM_ROOT = 1


def q_dominators(sf_dir: str):
    """Dominator tree rooted at vertex 1 over the sparse derived
    digraph (igraph_dominator_tree, st-cuts.c:388): (vertex, idom) for
    every root-reachable vertex except the root. Engine = CHK RPO
    fixpoint in one guarded task; oracle = the definitional SQL (v
    strictly dominates w iff removing v cuts w from root, computed as
    one simultaneous per-removal recursive reachability; idom = the
    strict dominator with the largest own strict-dominator set — the
    chain property makes it unique)."""
    from igraph_ray.algorithms.dominators import dominator_tree

    g = derive.graph_sparse(sf_dir)
    return dominator_tree(g, root=DOM_ROOT, n=derive.V)


SQL_DOMINATORS = f"""
WITH RECURSIVE
e AS MATERIALIZED ({SQL_EDGES_SPARSE}),
full_reach(node) AS (
  SELECT {DOM_ROOT} AS node
  UNION
  SELECT e.dst FROM full_reach r JOIN e ON e.src = r.node),
cand AS (SELECT node AS v FROM full_reach WHERE node != {DOM_ROOT}),
rm(v, node) AS (
  SELECT v, {DOM_ROOT} AS node FROM cand
  UNION
  SELECT rm.v, e.dst FROM rm JOIN e ON e.src = rm.node
  WHERE e.dst != rm.v),
strict AS MATERIALIZED (
  SELECT w.node AS w, CAST({DOM_ROOT} AS BIGINT) AS d
  FROM full_reach w WHERE w.node != {DOM_ROOT}
  UNION ALL
  SELECT w.node AS w, c.v AS d
  FROM full_reach w CROSS JOIN cand c
  WHERE w.node != {DOM_ROOT} AND w.node != c.v
    AND NOT EXISTS (SELECT 1 FROM rm
                    WHERE rm.v = c.v AND rm.node = w.node)),
wsize AS (SELECT w, COUNT(*) AS sz FROM strict GROUP BY w),
pick AS (
  SELECT s.w, s.d, COALESCE(ws.sz, 0) AS dsz
  FROM strict s LEFT JOIN wsize ws ON ws.w = s.d)
SELECT CAST(p.w AS BIGINT) AS vertex, CAST(p.d AS BIGINT) AS idom
FROM pick p
WHERE p.dsz = (SELECT MAX(q.dsz) FROM pick q WHERE q.w = p.w)
ORDER BY vertex"""


def q_laplacian(sf_dir: str):
    """Graph Laplacian L = D − A in COO form over the simple
    undirected view of edges_a (igraph_laplacian,
    spectral_properties.c:272) — exact int64 values."""
    from igraph_ray.ops.structural import laplacian_edges

    return laplacian_edges(derive.graph_a(sf_dir))


SQL_LAPLACIAN = f"""
WITH und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM ({SQL_EDGES_A})),
deg AS MATERIALIZED (
  SELECT v, COUNT(*) AS d FROM (
    SELECT lo AS v FROM und UNION ALL SELECT hi AS v FROM und)
  GROUP BY v)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       CAST(value AS BIGINT) AS value FROM (
  SELECT lo AS i, hi AS j, -1 AS value FROM und
  UNION ALL SELECT hi, lo, -1 FROM und
  UNION ALL SELECT v, v, d FROM deg)
ORDER BY i, j"""


def q_laplacian_norm(sf_dir: str):
    """Symmetric normalized Laplacian I − D^-1/2 A D^-1/2 in COO form
    (igraph_laplacian normalized=true): value_e9 with the FLOOR(x+0.5)
    half-up rounding applied to the positive magnitude so numpy and
    DuckDB round identically."""
    from igraph_ray.ops.structural import laplacian_edges

    return laplacian_edges(derive.graph_a(sf_dir), normalized=True)


SQL_LAPLACIAN_NORM = f"""
WITH und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM ({SQL_EDGES_A})),
deg AS MATERIALIZED (
  SELECT v, COUNT(*) AS d FROM (
    SELECT lo AS v FROM und UNION ALL SELECT hi AS v FROM und)
  GROUP BY v),
offmag AS (
  SELECT u.lo, u.hi,
         CAST(FLOOR(1e9 / sqrt(CAST(d1.d * d2.d AS DOUBLE)) + 0.5)
              AS BIGINT) AS mag
  FROM und u JOIN deg d1 ON d1.v = u.lo JOIN deg d2 ON d2.v = u.hi)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       CAST(value_e9 AS BIGINT) AS value_e9 FROM (
  SELECT lo AS i, hi AS j, -mag AS value_e9 FROM offmag
  UNION ALL SELECT hi, lo, -mag FROM offmag
  UNION ALL SELECT v, v, 1000000000 FROM deg)
ORDER BY i, j"""


SBM_PARAMS = dict(
    block_sizes=(150, 200, 162), seed=11,
    pref_e6=((300000, 20000, 5000),
             (20000, 250000, 10000),
             (5000, 10000, 400000)))


def q_sbm(sf_dir: str):
    """Stochastic block model (igraph_sbm_game, sbm.c:71), undirected
    no-loops: one independent md5 Bernoulli trial per pair at the
    block-pair rate — input-independent, full DuckDB md5-replay."""
    from igraph_ray.sources.games import sbm_game

    return sbm_game(**SBM_PARAMS).sort(["src", "dst"])


def _sql_sbm() -> str:
    p = SBM_PARAMS
    seed = p["seed"]
    HEX15 = 16 ** 15
    bounds = []
    tot = 0
    for s in p["block_sizes"]:
        tot += int(s)
        bounds.append(tot)
    n = tot
    thr = [[int(x) * HEX15 // 1_000_000 for x in row] for row in p["pref_e6"]]
    k = len(thr)

    def fold(h: str) -> str:
        f = "CAST(0 AS BIGINT)"
        for kk in range(1, 16):
            f = (f"(({f}) * 16 + "
                 f"(strpos('0123456789abcdef', substr({h}, {kk}, 1)) - 1))")
        return f

    def blk(col: str) -> str:
        c = "CASE "
        for b in range(k - 1):
            c += f"WHEN {col} < {bounds[b]} THEN {b} "
        return c + f"ELSE {k - 1} END"

    tcase = "CASE " + " ".join(
        f"WHEN bi = {a} AND bj = {b} THEN CAST({thr[a][b]} AS BIGINT)"
        for a in range(k) for b in range(k)) + " END"
    return f"""
WITH pairs AS (
  SELECT a.i AS i, b.j AS j
  FROM (SELECT UNNEST(range({n})) AS i) a,
       (SELECT UNNEST(range({n})) AS j) b
  WHERE b.j > a.i),
hs AS (SELECT i, j, {blk('i')} AS bi, {blk('j')} AS bj,
  md5('{seed}:s:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS h
  FROM pairs),
rs AS MATERIALIZED (SELECT i, j, bi, bj, {fold('h')} AS r FROM hs)
SELECT CAST(i AS BIGINT) AS src, CAST(j AS BIGINT) AS dst FROM rs
WHERE r < ({tcase})
ORDER BY src, dst"""


HSBM_PARAMS = dict(
    n=512, m=64, rho_sizes=(16, 16, 32), p_e6=8000, seed=23,
    c_e6=((500000, 100000, 50000),
          (100000, 400000, 20000),
          (50000, 20000, 300000)))


def q_hsbm(sf_dir: str):
    """Hierarchical SBM (igraph_hsbm_game, sbm.c:243): per-block
    cluster SBM + flat inter-block rate, one md5 Bernoulli per pair —
    full DuckDB replay."""
    from igraph_ray.sources.games import hsbm_game

    return hsbm_game(**HSBM_PARAMS).sort(["src", "dst"])


HSBM_LIST_PARAMS = dict(
    n=60, mlist=(20, 30, 10),
    rho_sizes_list=((10, 10), (15, 15), (10,)),
    c_e6_list=(((700000, 120000), (120000, 650000)),
               ((600000, 80000), (80000, 700000)),
               ((500000,),)),
    p_e6=30000, seed=42)


def q_hsbm_list(sf_dir: str):
    """General hierarchical SBM with per-block sizes
    (igraph_hsbm_list_game, sbm.c:417): per-block cluster SBMs + flat
    inter-block rate, one md5 Bernoulli per pair - full DuckDB replay."""
    from igraph_ray.sources.games import hsbm_list_game

    return hsbm_list_game(**HSBM_LIST_PARAMS).sort(["src", "dst"])


def _sql_hsbm_list() -> str:
    p = HSBM_LIST_PARAMS
    n, seed = p["n"], p["seed"]
    HEX15 = 16 ** 15
    offs = [0]
    for m in p["mlist"]:
        offs.append(offs[-1] + int(m))
    nb = len(p["mlist"])
    pthr = int(p["p_e6"]) * HEX15 // 1_000_000

    def fold(h: str) -> str:
        f = "CAST(0 AS BIGINT)"
        for kk in range(1, 16):
            f = (f"(({f}) * 16 + "
                 f"(strpos('0123456789abcdef', substr({h}, {kk}, 1)) - 1))")
        return f

    def blk(col: str) -> str:
        c = "CASE "
        for b in range(nb - 1):
            c += f"WHEN {col} < {offs[b + 1]} THEN {b} "
        return c + f"ELSE {nb - 1} END"

    def off(bcol: str) -> str:
        c = "CASE "
        for b in range(nb - 1):
            c += f"WHEN {bcol} = {b} THEN {offs[b]} "
        return c + f"ELSE {offs[nb - 1]} END"

    def clu(bcol: str, col: str) -> str:
        # cluster index of col within its block bcol
        c = "CASE "
        for b in range(nb):
            cum = 0
            sizes = p["rho_sizes_list"][b]
            for ci in range(len(sizes) - 1):
                cum += int(sizes[ci])
                c += (f"WHEN {bcol} = {b} AND "
                      f"({col} - {offs[b]}) < {cum} THEN {ci} ")
            c += f"WHEN {bcol} = {b} THEN {len(sizes) - 1} "
        return c + "ELSE 0 END"

    cases = []
    for b in range(nb):
        cm = p["c_e6_list"][b]
        k = len(cm)
        for a in range(k):
            for d in range(k):
                thr = int(cm[a][d]) * HEX15 // 1_000_000
                cases.append(f"WHEN bi = {b} AND ci = {a} AND cj = {d} "
                             f"THEN CAST({thr} AS BIGINT)")
    ccase = "CASE " + " ".join(cases) + " END"
    return f"""
WITH pairs AS (
  SELECT a.i AS i, b.j AS j
  FROM (SELECT UNNEST(range({n})) AS i) a,
       (SELECT UNNEST(range({n})) AS j) b
  WHERE b.j > a.i),
hs AS (SELECT i, j, {blk('i')} AS bi, {blk('j')} AS bj,
  md5('{seed}:hsl:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS h
  FROM pairs),
hc AS (SELECT i, j, bi, bj, {clu('bi', 'i')} AS ci, {clu('bi', 'j')} AS cj,
  h FROM hs),
rs AS MATERIALIZED (
  SELECT i, j, bi, bj, ci, cj, {fold('h')} AS r FROM hc)
SELECT i AS src, j AS dst FROM rs
WHERE (bi = bj AND r < {ccase}) OR (bi <> bj AND r < CAST({pthr} AS BIGINT))
ORDER BY src, dst"""


def _sql_hsbm() -> str:
    p = HSBM_PARAMS
    n, m, seed = p["n"], p["m"], p["seed"]
    HEX15 = 16 ** 15
    cum = []
    tot = 0
    for s in p["rho_sizes"]:
        tot += int(s)
        cum.append(tot)
    k = len(cum)
    cthr = [[int(x) * HEX15 // 1_000_000 for x in row] for row in p["c_e6"]]
    pthr = int(p["p_e6"]) * HEX15 // 1_000_000

    def fold(h: str) -> str:
        f = "CAST(0 AS BIGINT)"
        for kk in range(1, 16):
            f = (f"(({f}) * 16 + "
                 f"(strpos('0123456789abcdef', substr({h}, {kk}, 1)) - 1))")
        return f

    def clu(col: str) -> str:
        c = "CASE "
        for b in range(k - 1):
            c += f"WHEN ({col} % {m}) < {cum[b]} THEN {b} "
        return c + f"ELSE {k - 1} END"

    ccase = "CASE " + " ".join(
        f"WHEN ci = {a} AND cj = {b} THEN CAST({cthr[a][b]} AS BIGINT)"
        for a in range(k) for b in range(k)) + " END"
    return f"""
WITH pairs AS (
  SELECT a.i AS i, b.j AS j
  FROM (SELECT UNNEST(range({n})) AS i) a,
       (SELECT UNNEST(range({n})) AS j) b
  WHERE b.j > a.i),
hs AS (SELECT i, j, (i // {m}) = (j // {m}) AS same,
  {clu('i')} AS ci, {clu('j')} AS cj,
  md5('{seed}:hs:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS h
  FROM pairs),
rs AS MATERIALIZED (
  SELECT i, j, same, ci, cj, {fold('h')} AS r FROM hs)
SELECT CAST(i AS BIGINT) AS src, CAST(j AS BIGINT) AS dst FROM rs
WHERE r < (CASE WHEN same THEN ({ccase})
           ELSE CAST({pthr} AS BIGINT) END)
ORDER BY src, dst"""


DOT_PRODUCT_PARAMS = dict(n=256, dim=4, mod=700, seed=5)


def q_dot_product(sf_dir: str):
    """Random dot-product graph (igraph_dot_product_game,
    dotproduct.c:59): deterministic integer-e3 latent grid, edge iff
    the md5 draw clears min(<x_i,x_j>, 1) — P>1 connects always, per
    the reference contract. Full DuckDB md5 + integer-dot replay."""
    from igraph_ray.sources.games import dot_product_game

    return dot_product_game(**DOT_PRODUCT_PARAMS).sort(["src", "dst"])


def _sql_dot_product() -> str:
    p = DOT_PRODUCT_PARAMS
    n, dim, mod, seed = p["n"], p["dim"], p["mod"], p["seed"]
    HEX15 = 16 ** 15

    def fold(h: str) -> str:
        f = "CAST(0 AS BIGINT)"
        for kk in range(1, 16):
            f = (f"(({f}) * 16 + "
                 f"(strpos('0123456789abcdef', substr({h}, {kk}, 1)) - 1))")
        return f

    dot = " + ".join(
        f"(((i*7919 + {d}*104729) % {mod}) * ((j*7919 + {d}*104729) % {mod}))"
        for d in range(dim))
    return f"""
WITH pairs AS (
  SELECT a.i AS i, b.j AS j
  FROM (SELECT UNNEST(range({n})) AS i) a,
       (SELECT UNNEST(range({n})) AS j) b
  WHERE b.j > a.i),
hs AS (SELECT i, j, ({dot}) AS p,
  md5('{seed}:d:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS h
  FROM pairs),
rs AS MATERIALIZED (SELECT i, j, p, {fold('h')} AS r FROM hs)
SELECT CAST(i AS BIGINT) AS src, CAST(j AS BIGINT) AS dst FROM rs
WHERE CAST(r AS HUGEINT)
      < CAST(LEAST(p, 1000000) AS HUGEINT) * {HEX15} // 1000000
ORDER BY src, dst"""


def q_hrg_fit(sf_dir: str):
    """Greedy-MLE HRG dendrogram (igraph_hrg_fit contract; the
    reference's MCMC sampler replaced by the deterministic greedy
    maximizer of the same per-node likelihood — algorithms/hrg.py
    docstring). Rows-only at the gate (sequential heap-driven merge
    order, not SQL-replayable — same class as fastgreedy/walktrap);
    dendrogram-validity and likelihood pytests carry exactness."""
    from igraph_ray.algorithms.hrg import hrg_fit

    g = derive.graph_sparse(sf_dir)
    return hrg_fit(g, n=derive.V).dendrogram


def q_hrg_predict(sf_dir: str):
    """Missing-link prediction from the fitted HRG
    (igraph_hrg_predict semantics): top-32 non-adjacent pairs by the
    fitted p_LCA, ties by (src, dst). Rows-only (depends on the
    sequential fit); planted-edge-recovery pytest carries exactness."""
    from igraph_ray.algorithms.hrg import hrg_fit

    g = derive.graph_sparse(sf_dir)
    return hrg_fit(g, n=derive.V, predict_k=32).predictions


def _sql_barabasi(n: int = 400, m: int = 3, seed: int = 7) -> str:
    digit = "strpos('0123456789abcdef', substr(h, {k}, 1)) - 1"
    fold = "CAST(0 AS BIGINT)"
    for k in range(1, 16):
        fold = f"(({fold}) * 16 + ({digit.format(k=k)}))"
    starts = (f"(CASE WHEN v <= {m} THEN v*(v-1)/2 "
              f"ELSE {m}*({m}+1)/2 + (v-1-{m})*{m} END)")
    return f"""
WITH RECURSIVE
verts AS (SELECT UNNEST(range(1, {n})) AS v),
enum AS (
  SELECT v, UNNEST(range(LEAST(v, {m}))) AS j FROM verts),
draws AS MATERIALIZED (
  SELECT v, j, CAST({starts} + j AS BIGINT) AS e,
         CAST(2 * {starts} AS BIGINT) AS space,
         ({fold.replace('h,', "md5(CAST({seed} AS VARCHAR) || ':' || CAST(v AS VARCHAR) || ':' || CAST(j AS VARCHAR)),".format(seed=seed))}) AS r
  FROM enum),
slots AS MATERIALIZED (
  SELECT e, v, CASE WHEN space = 0 THEN 0 ELSE r % space END AS slot,
         space FROM draws),
chase(e, pos) AS (
  SELECT e, slot FROM slots WHERE space > 0
  UNION ALL
  SELECT c.e, s.slot FROM chase c
  JOIN slots s ON s.e = c.pos // 2 WHERE c.pos % 2 = 1
),
resolved AS (
  SELECT c.e, s2.v AS dst FROM chase c
  JOIN slots s2 ON s2.e = c.pos // 2 WHERE c.pos % 2 = 0)
SELECT s.v AS src,
       CAST(CASE WHEN s.space = 0 THEN 0 ELSE r.dst END AS BIGINT) AS dst
FROM slots s LEFT JOIN resolved r ON r.e = s.e
ORDER BY src, dst"""


def q_isomorphic_check(sf_dir: str):
    """igraph_isomorphic (topology.c VF2 + WL-refinement invariants):
    the sparse derived graph vs an md5-permuted relabeling of itself.
    The engine must find a full vertex bijection mapping every edge onto
    an edge (verified inside isomorphic_vf2 — a full binding exists only
    if all |E| edges map); returns (iso, n_edges) where n_edges ties the
    result to the data (oracle counts the same distinct simple edges)."""
    import hashlib

    from igraph_ray.algorithms.subiso import isomorphic

    g = derive.graph_sparse(sf_dir)
    m = g.num_edges()
    keys = np.array([hashlib.md5(str(v).encode()).hexdigest()
                     for v in range(derive.V)])
    perm_arr = np.argsort(keys).astype(np.int64)  # md5-rank permutation
    ref = ray.put(perm_arr)

    def _permute(b: pa.Table) -> pa.Table:
        p = ray.get(ref)
        return pa.table({
            "src": pa.array(p[b["src"].to_numpy(zero_copy_only=False)]),
            "dst": pa.array(p[b["dst"].to_numpy(zero_copy_only=False)]),
        })

    g2 = Graph(g.edges.map_batches(_permute, batch_format="pyarrow",
                                   batch_size=None).materialize(),
               n=derive.V, attrs={"directed": True})
    g1 = Graph(g.edges, n=derive.V, attrs={"directed": True})
    iso, mapping = isomorphic(g1, g2)
    return pa.table({"iso": pa.array([1 if iso else 0], pa.int64()),
                     "n_edges": pa.array([m], pa.int64())})


def q_get_isomorphisms(sf_dir: str):
    """igraph_get_isomorphisms_vf2 (topology.c): the full isomorphism
    stream between the bull graph and its md5-rank permutation —
    |Aut(bull)| = 2 mappings (identity and the horn swap (1 2)(3 4)),
    each composed with the permutation. Rows (iso_id, vertex, image),
    iso_id = lexicographic rank."""
    import hashlib

    from igraph_ray.algorithms.subiso import get_isomorphisms

    bull = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4)]
    keys = [hashlib.md5(str(v).encode()).hexdigest() for v in range(5)]
    perm = np.argsort(np.array(keys)).astype(np.int64)
    e1 = ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, b in bull], pa.int64()),
        "dst": pa.array([b for a, b in bull], pa.int64())}))
    e2 = ray.data.from_arrow(pa.table({
        "src": pa.array([int(perm[a]) for a, b in bull], pa.int64()),
        "dst": pa.array([int(perm[b]) for a, b in bull], pa.int64())}))
    g1 = Graph(e1, n=5, attrs={"directed": False})
    g2 = Graph(e2, n=5, attrs={"directed": False})
    return get_isomorphisms(g1, g2, directed=False).sort(
        ["iso_id", "vertex"])


def _sql_get_isomorphisms() -> str:
    """Hand-derived VALUES replay: Aut(bull) = {id, (1 2)(3 4)}
    (the triangle body 0 is the unique degree-2 vertex inside the
    triangle; the two horn-carrying triangle vertices 1,2 swap along
    with their horns 3,4). Isomorphisms bull → perm(bull) are the two
    compositions perm∘a; iso_id by lexicographic rank of the mapping."""
    import hashlib

    keys = [hashlib.md5(str(v).encode()).hexdigest() for v in range(5)]
    import numpy as _np

    perm = _np.argsort(_np.array(keys)).astype(int)
    m0 = [int(perm[v]) for v in range(5)]                    # perm ∘ id
    sigma = [0, 2, 1, 4, 3]                                  # (1 2)(3 4)
    m1 = [int(perm[sigma[v]]) for v in range(5)]             # perm ∘ σ
    maps = sorted([m0, m1])
    rows = []
    for i, m in enumerate(maps):
        for v in range(5):
            rows.append(f"({i}, {v}, {m[v]})")
    return ("SELECT CAST(iso_id AS BIGINT) AS iso_id, "
            "CAST(vertex AS BIGINT) AS vertex, "
            "CAST(image AS BIGINT) AS image "
            "FROM (VALUES " + ", ".join(rows) +
            ") AS t(iso_id, vertex, image) ORDER BY iso_id, vertex")


def q_automorphism_group(sf_dir: str):
    """igraph_automorphism_group (topology.c BLISS surface): generator
    stream of Aut(bull) from the stabilizer-chain backtrack
    (algorithms/subiso.py) — exactly ONE generator, the horn swap
    (1 2)(3 4) (vertex 0 is the unique WL color, so base point 0 is
    fixed; level 1 finds 1 -> 2; every later level's orbit is a
    singleton). Rows (gen_id, vertex, image, group_order); oracle =
    the hand-derived VALUES replay of that chain."""
    from igraph_ray.algorithms.subiso import automorphism_group

    bull = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4)]
    g = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, b in bull], pa.int64()),
        "dst": pa.array([b for a, b in bull], pa.int64())})),
        n=5, attrs={"directed": False})
    return automorphism_group(g, directed=False).sort(["gen_id", "vertex"])


def _sql_automorphism_group() -> str:
    sigma = [0, 2, 1, 4, 3]  # (1 2)(3 4), the unique chain generator
    rows = ", ".join(f"(0, {v}, {sigma[v]}, 2)" for v in range(5))
    return ("SELECT CAST(gen_id AS BIGINT) AS gen_id, "
            "CAST(vertex AS BIGINT) AS vertex, "
            "CAST(image AS BIGINT) AS image, "
            "CAST(group_order AS BIGINT) AS group_order "
            f"FROM (VALUES {rows}) AS t(gen_id, vertex, image, group_order) "
            "ORDER BY gen_id, vertex")


def q_eigen_symmetric(sf_dir: str):
    """igraph_eigen_matrix_symmetric (eigen.c, algorithms/eigen.py):
    the C8 cycle adjacency's closed-form spectrum 2·cos(2πj/8). The LM
    leg runs the distributed subspace iteration with a FULL basis
    (kk = n ⇒ Rayleigh–Ritz exact after the basis is populated); the
    LA leg runs the Gershgorin-shifted iteration (A + 2I) to 1e-14.
    Rows (which, rank, value_e6), values sorted descending; oracle =
    the same trigonometric closed form in SQL."""
    from igraph_ray.algorithms.eigen import eigen_matrix_symmetric

    cyc = [(i, (i + 1) % 8) for i in range(8)]
    ds = ray.data.from_arrow(pa.table({
        "row": pa.array([min(a, b) for a, b in cyc], pa.int64()),
        "col": pa.array([max(a, b) for a, b in cyc], pa.int64()),
        "value": pa.array([1.0] * 8, pa.float64())}))
    lm, _ = eigen_matrix_symmetric(ds, 8, k=8, which="LM",
                                   iters=3, oversample=0)
    la, _ = eigen_matrix_symmetric(ds, 8, k=2, which="LA", iters=60)
    rows = ([("LM", i, v) for i, v in enumerate(sorted(lm, reverse=True))]
            + [("LA", i, v) for i, v in enumerate(sorted(la, reverse=True))])
    return pa.table({
        "which": pa.array([r[0] for r in rows], pa.string()),
        "rank": pa.array([r[1] for r in rows], pa.int64()),
        "value_e6": pa.array(
            [int(np.floor(r[2] * 1e6 + 0.5)) for r in rows], pa.int64())})


_SQL_EIGEN_SYMMETRIC = """
WITH lm AS (SELECT j, 2*cos(2*pi()*j/8) AS v
            FROM generate_series(0, 7) t(j)),
ranked AS (SELECT 'LM' AS which,
                  ROW_NUMBER() OVER (ORDER BY v DESC) - 1 AS rank,
                  CAST(FLOOR(v*1000000 + 0.5) AS BIGINT) AS value_e6
           FROM lm),
la_top AS (SELECT v FROM lm ORDER BY v DESC LIMIT 2),
la AS (SELECT 'LA' AS which,
              ROW_NUMBER() OVER (ORDER BY v DESC) - 1 AS rank,
              CAST(FLOOR(v*1000000 + 0.5) AS BIGINT) AS value_e6
       FROM la_top)
SELECT which, CAST(rank AS BIGINT) AS rank, value_e6 FROM ranked
UNION ALL
SELECT which, CAST(rank AS BIGINT) AS rank, value_e6 FROM la
ORDER BY which, rank"""


def q_eigen_laplacian(sf_dir: str):
    """igraph_eigen_laplacian (eigen.c surface, algorithms/eigen.py):
    the algebraic bottom of the C12 ring Laplacian — closed form
    2 − 2cos(2πj/12), so λ0 = 0 and the Fiedler pair 2 − √3. The
    engine runs the SA Gershgorin-shifted subspace iteration over the
    COO Laplacian export. Rows (rank, value_e6) ascending."""
    from igraph_ray.algorithms.eigen import eigen_laplacian

    n = 12
    cyc = [(i, (i + 1) % n) for i in range(n)]
    g = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, b in cyc], pa.int64()),
        "dst": pa.array([b for a, b in cyc], pa.int64())})), n=n)
    vals, _ = eigen_laplacian(g, k=3, which="SA", iters=150)
    rows = sorted(vals)
    return pa.table({
        "rank": pa.array(range(len(rows)), pa.int64()),
        "value_e6": pa.array([int(np.floor(v * 1e6 + 0.5)) for v in rows],
                             pa.int64())})


_SQL_EIGEN_LAPLACIAN = """
WITH sp AS (SELECT j, 2 - 2*cos(2*pi()*j/12) AS v
            FROM generate_series(0, 11) t(j)),
bot AS (SELECT v FROM sp ORDER BY v LIMIT 3)
SELECT ROW_NUMBER() OVER (ORDER BY v) - 1 AS rank,
       CAST(FLOOR(v*1000000 + 0.5) AS BIGINT) AS value_e6
FROM bot ORDER BY rank"""


def q_canonical_form(sf_dir: str):
    """igraph_canonical_permutation (topology.c BLISS surface):
    relabeling the bull graph and its md5-rank permutation by their IR
    canonical labelings must give the SAME edge set — the defining
    property of a canonical form. Returns (forms_equal, n_edges); the
    canonical edge codes themselves are checked by pytest."""
    import hashlib

    from igraph_ray.algorithms.subiso import canonical_permutation

    bull = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4)]
    s = np.array([a for a, b in bull], np.int64)
    d = np.array([b for a, b in bull], np.int64)
    keys = [hashlib.md5(str(v).encode()).hexdigest() for v in range(5)]
    perm = np.argsort(np.array(keys)).astype(np.int64)
    s2, d2 = perm[s], perm[d]

    @ray.remote
    def _canon(s, d):
        lab = canonical_permutation(s, d, 5, directed=False)
        return sorted(zip(np.minimum(lab[s], lab[d]).tolist(),
                          np.maximum(lab[s], lab[d]).tolist()))

    c1, c2 = ray.get([_canon.remote(s, d), _canon.remote(s2, d2)])
    return pa.table({
        "forms_equal": pa.array([1 if c1 == c2 else 0], pa.int64()),
        "n_edges": pa.array([len(c1)], pa.int64())})


def q_subiso_path4(sf_dir: str):
    """Count of injective P4 maps (igraph_count_subisomorphisms_vf2,
    topology.c semantics, non-induced) in the undirected sparse view —
    distributed binding-join plan (algorithms/subiso.py); SQL oracle =
    the explicit 3-way adjacency self-join with distinctness."""
    from igraph_ray.algorithms.subiso import count_sub_isomorphisms

    g = derive.graph_sparse(sf_dir)
    n = count_sub_isomorphisms(g, [0, 1, 2], [1, 2, 3],
                               directed=False, num_partitions=8)
    return pa.table({"n_maps": pa.array([n], pa.int64())})


def q_subiso_cycle4(sf_dir: str):
    """Count of injective C4 maps (VF2 count semantics) in the
    undirected sparse view; same binding-join plan plus the closing-edge
    semi join."""
    from igraph_ray.algorithms.subiso import count_sub_isomorphisms

    g = derive.graph_sparse(sf_dir)
    n = count_sub_isomorphisms(g, [0, 1, 2, 3], [1, 2, 3, 0],
                               directed=False, num_partitions=8)
    return pa.table({"n_maps": pa.array([n], pa.int64())})


_SQL_SYM_SPARSE = (
    "sym AS MATERIALIZED (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b "
    "FROM se GROUP BY 1, 2 UNION ALL "
    "SELECT GREATEST(src, dst), LEAST(src, dst) FROM se GROUP BY 1, 2)"
)


def _sql_subiso_path4() -> str:
    from igraph_ray.pipelines.derive import SQL_EDGES_SPARSE

    return (
        f"WITH se AS MATERIALIZED ({SQL_EDGES_SPARSE}),\n{_SQL_SYM_SPARSE}\n"
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_maps FROM sym e1 "
        "JOIN sym e2 ON e2.a = e1.b AND e2.b <> e1.a "
        "JOIN sym e3 ON e3.a = e2.b AND e3.b <> e2.a AND e3.b <> e1.a "
        "AND e3.b <> e1.b"
    )


def _sql_subiso_cycle4() -> str:
    from igraph_ray.pipelines.derive import SQL_EDGES_SPARSE

    return (
        f"WITH se AS MATERIALIZED ({SQL_EDGES_SPARSE}),\n{_SQL_SYM_SPARSE}\n"
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_maps FROM sym e1 "
        "JOIN sym e2 ON e2.a = e1.b AND e2.b <> e1.a "
        "JOIN sym e3 ON e3.a = e2.b AND e3.b <> e2.a AND e3.b <> e1.a "
        "AND e3.b <> e1.b "
        "JOIN sym e4 ON e4.a = e3.b AND e4.b = e1.a"
    )


# general subgraph-isomorphism patterns (topology.c:1720 VF2 contract —
# arbitrary connected query graphs; the engine's binding-join plan takes
# any pattern, these pin the driver-checked instances)
SUBISO_TREE5 = [(0, 1), (1, 2), (1, 3), (3, 4)]     # spider tree T5
SUBISO_HOUSE = [(0, 1), (1, 2), (2, 3), (3, 0),
                (0, 4), (1, 4)]                      # C4 + apex triangle
SUBISO_PRISM = [(0, 1), (1, 2), (2, 0),
                (3, 4), (4, 5), (5, 3),
                (0, 3), (1, 4), (2, 5)]              # triangular prism Y3
SUBISO_TREE8 = [(0, 1), (1, 2), (1, 3), (3, 4),
                (4, 5), (3, 6), (6, 7)]              # 8-vertex spider tree


def _sql_subiso_pattern(pedges, edges_sql=None) -> str:
    """Join-chain oracle for count_sub_isomorphisms over an undirected
    derived view (default: sparse), for an ARBITRARY connected pattern:
    bind the pattern vertices in the engine's own BFS order
    (algorithms/subiso.py _pattern_order), one sym join per spanning
    edge, every residual pattern edge as an EXISTS semi join,
    injectivity as pairwise <>."""
    from igraph_ray.algorithms.subiso import _pattern_order
    from igraph_ray.pipelines.derive import SQL_EDGES_SPARSE
    if edges_sql is None:
        edges_sql = SQL_EDGES_SPARSE

    eset = set()
    for a, b in pedges:
        eset.add((a, b))
        eset.add((b, a))
    p = max(max(a, b) for a, b in pedges) + 1
    order = _pattern_order(p, pedges)
    col = {order[0]: "t0.a", order[1]: "t0.b"}
    joins = ["sym t0"]
    conds = []
    bound = [order[0], order[1]]
    ti = 0
    for vi in order[2:]:
        anchor = next(u for u in bound if (u, vi) in eset)
        ti += 1
        joins.append(f"JOIN sym t{ti} ON t{ti}.a = {col[anchor]}")
        col[vi] = f"t{ti}.b"
        for u in bound:
            conds.append(f"{col[vi]} <> {col[u]}")
        for u in bound:
            if u != anchor and (u, vi) in eset:
                conds.append(
                    f"EXISTS (SELECT 1 FROM sym s WHERE "
                    f"s.a = {col[u]} AND s.b = {col[vi]})")
        bound.append(vi)
    where = (" WHERE " + " AND ".join(conds)) if conds else ""
    return (f"WITH se AS MATERIALIZED ({edges_sql}),\n"
            f"{_SQL_SYM_SPARSE}\n"
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n_maps "
            f"FROM {' '.join(joins)}{where}")


def q_subiso_tree5(sf_dir: str):
    """Count of injective maps of the 5-vertex spider tree
    (igraph_count_subisomorphisms_vf2, topology.c:1720, non-induced —
    arbitrary-pattern surface) in the undirected sparse view; the
    engine's binding-join plan handles any connected pattern, oracle
    generated by the same BFS-order join chain."""
    from igraph_ray.algorithms.subiso import count_sub_isomorphisms

    g = derive.graph_sparse(sf_dir)
    n = count_sub_isomorphisms(
        g, [a for a, _ in SUBISO_TREE5], [b for _, b in SUBISO_TREE5],
        directed=False, num_partitions=8)
    return pa.table({"n_maps": pa.array([n], pa.int64())})


def q_subiso_house(sf_dir: str):
    """Count of injective maps of the 5-vertex house graph (C4 plus an
    apex adjacent to two corners — a pattern with residual non-spanning
    edges, exercising the semi-join checks of the binding plan) in the
    undirected sparse view."""
    from igraph_ray.algorithms.subiso import count_sub_isomorphisms

    g = derive.graph_sparse(sf_dir)
    n = count_sub_isomorphisms(
        g, [a for a, _ in SUBISO_HOUSE], [b for _, b in SUBISO_HOUSE],
        directed=False, num_partitions=8)
    return pa.table({"n_maps": pa.array([n], pa.int64())})


def q_subiso_prism(sf_dir: str):
    """Count of injective maps of the 6-vertex triangular prism (two
    triangles joined by a perfect matching — 3 residual non-spanning
    edges, the densest pattern the ≤6-vertex contract exercises) in
    the undirected sparse view (igraph_count_subisomorphisms_vf2,
    topology.c:1720, non-induced)."""
    from igraph_ray.algorithms.subiso import count_sub_isomorphisms

    g = derive.graph_sparse(sf_dir)
    n = count_sub_isomorphisms(
        g, [a for a, _ in SUBISO_PRISM], [b for _, b in SUBISO_PRISM],
        directed=False, num_partitions=8)
    return pa.table({"n_maps": pa.array([n], pa.int64())})


def q_subiso_tree8(sf_dir: str):
    """Count of injective maps of the 8-vertex spider tree — the first
    pattern past the former ~6-vertex practical ceiling, served by the
    round-5 LAD-style candidate domains (degree + neighborhood-degree-
    sequence dominance semi-joins, lad.c's filtering idea) on the
    binding-join plan. Very-sparse view (the embedding count explodes
    combinatorially on denser views — for the 10M-map tree5 baseline on
    the sparse view see subiso_tree5); oracle = the same BFS-order
    8-way join chain."""
    from igraph_ray.algorithms.subiso import count_sub_isomorphisms

    g = derive.graph_vsparse(sf_dir)
    n = count_sub_isomorphisms(
        g, [a for a, _ in SUBISO_TREE8], [b for _, b in SUBISO_TREE8],
        directed=False, num_partitions=8)
    return pa.table({"n_maps": pa.array([n], pa.int64())})


def q_community_eb(sf_dir: str):
    """Girvan–Newman edge-betweenness dendrogram
    (igraph_community_edge_betweenness, community.c:312) — first 6
    removals on the very-sparse derived graph; each step reuses the
    distributed Brandes edge betweenness. Rows-only at the gate (the
    full per-step Brandes recompute is not SQL-replayable); the
    step-for-step exact-recompute pytest carries exactness."""
    from igraph_ray.algorithms.community_eb import community_edge_betweenness

    g = derive.graph_vsparse(sf_dir)
    return community_edge_betweenness(g, max_removals=6, num_partitions=8)


def q_layout_sugiyama(sf_dir: str):
    """Sugiyama layered layout (igraph_layout_sugiyama, sugiyama.c:91)
    of the very-sparse derived digraph: Eades-FAS cycle reversal →
    longest-path layers (aligned superstep) → 4 barycenter ordering
    sweeps → slot placement. (vertex, x, y) with integer slot x and
    layer y. Rows-only at the gate (the barycenter fixpoint is
    iterative); layer/slot invariants + determinism are pytest-gated
    in tests/test_sugiyama.py."""
    from igraph_ray.ops.layout import layout_sugiyama

    out = layout_sugiyama(derive.graph_vsparse(sf_dir), n=derive.V, sweeps=4)
    return out.sort("vertex")


def q_layout_circle(sf_dir: str):
    """igraph_layout_circle (layout.c:148): vertex i at
    (cos 2πi/n, sin 2πi/n) over the dense universe; ×10⁶ rounded. The
    SQL oracle evaluates the identical closed form (same left-assoc
    argument arithmetic, so both sides feed cos/sin bit-identical
    inputs; a 1-ulp libm difference is 10 orders below the rounding
    grid)."""
    from igraph_ray.ops.layout import layout_circle

    def _scale(b: pa.Table) -> pa.Table:
        return pa.table({
            "vertex": b["vertex"],
            "x_e6": pa.array(np.round(b["x"].to_numpy(
                zero_copy_only=False) * 1e6).astype(np.int64)),
            "y_e6": pa.array(np.round(b["y"].to_numpy(
                zero_copy_only=False) * 1e6).astype(np.int64)),
        })

    return layout_circle(derive.V).map_batches(
        _scale, batch_format="pyarrow", batch_size=None).materialize()


def q_layout_grid(sf_dir: str):
    """igraph_layout_grid (layout.c:299): row-major integer lattice of
    width ceil(sqrt(n)) — exact integers, direct SQL oracle."""
    from igraph_ray.ops.layout import layout_grid

    def _ints(b: pa.Table) -> pa.Table:
        return pa.table({
            "vertex": b["vertex"],
            "gx": pa.array(b["x"].to_numpy(
                zero_copy_only=False).astype(np.int64)),
            "gy": pa.array(b["y"].to_numpy(
                zero_copy_only=False).astype(np.int64)),
        })

    return layout_grid(derive.V).map_batches(
        _ints, batch_format="pyarrow", batch_size=None).materialize()


def q_layout_fr(sf_dir: str):
    """Fruchterman–Reingold force layout (layout.c FR'91 grid variant)
    of the very-sparse derived graph — 12 iterations, grid-approximated
    repulsion, md5-deterministic init. Rows-only at the gate (iterative
    float dynamics); the separation/determinism pytests carry the
    contract."""
    from igraph_ray.ops.layout import layout_fruchterman_reingold

    g = derive.graph_vsparse(sf_dir)
    pos = layout_fruchterman_reingold(g, iterations=12, n=derive.V,
                                      num_partitions=8)

    def _scale(b: pa.Table) -> pa.Table:
        return pa.table({
            "vertex": b["vertex"],
            "x_e6": pa.array(np.round(b["x"].to_numpy(
                zero_copy_only=False) * 1e6).astype(np.int64)),
            "y_e6": pa.array(np.round(b["y"].to_numpy(
                zero_copy_only=False) * 1e6).astype(np.int64)),
        })

    return pos.map_batches(_scale, batch_format="pyarrow",
                           batch_size=None).materialize()


def _scale_pos_e6(pos):
    def _scale(b: pa.Table) -> pa.Table:
        return pa.table({
            "vertex": b["vertex"],
            "x_e6": pa.array(np.round(b["x"].to_numpy(
                zero_copy_only=False) * 1e6).astype(np.int64)),
            "y_e6": pa.array(np.round(b["y"].to_numpy(
                zero_copy_only=False) * 1e6).astype(np.int64)),
        })

    return pos.map_batches(_scale, batch_format="pyarrow",
                           batch_size=None).materialize()


def q_layout_graphopt(sf_dir: str):
    """graphopt spring/charge layout (igraph_layout_graphopt, the
    layout.c graphopt port) of the very-sparse derived graph — 10
    iterations, grid-approximated charge repulsion, md5-deterministic
    init. Rows-only at the gate (iterative float dynamics); the
    separation/determinism pytests carry the contract."""
    from igraph_ray.ops.layout import layout_graphopt

    g = derive.graph_vsparse(sf_dir)
    return _scale_pos_e6(layout_graphopt(g, iterations=10, n=derive.V,
                                         num_partitions=8))


def q_layout_lgl(sf_dir: str):
    """Large Graph Layout (igraph_layout_lgl, layout.c): spanning-tree
    ring placement from the root + grid-FR annealing, md5-deterministic.
    Rows-only at the gate (iterative float dynamics); structure pytest
    carries the contract."""
    from igraph_ray.ops.layout import layout_lgl

    g = derive.graph_vsparse(sf_dir)
    pos = layout_lgl(g, maxit=8, root=0, n=derive.V, num_partitions=8)

    def _scale(b: pa.Table) -> pa.Table:
        return pa.table({
            "vertex": b["vertex"],
            "x_e6": pa.array(np.round(b["x"].to_numpy(
                zero_copy_only=False) * 1e6).astype(np.int64)),
            "y_e6": pa.array(np.round(b["y"].to_numpy(
                zero_copy_only=False) * 1e6).astype(np.int64)),
        })

    return pos.map_batches(_scale, batch_format="pyarrow",
                           batch_size=None).sort("vertex")


def q_layout_drl(sf_dir: str):
    """DRL density-grid layout (igraph_layout_drl, src/drl/) of the
    very-sparse derived graph — the default liquid→expansion→cooldown→
    crunch→simmer annealing schedule over the grid-cell repulsion
    field. Rows-only at the gate; pytests carry the contract."""
    from igraph_ray.ops.layout import layout_drl

    g = derive.graph_vsparse(sf_dir)
    return _scale_pos_e6(layout_drl(g, iterations=10, n=derive.V,
                                    num_partitions=8))


def q_layout_mds(sf_dir: str):
    """Landmark-MDS layout (igraph_layout_mds over BFS distances, in
    the de Silva–Tenenbaum landmark formulation) of the very-sparse
    derived graph — 48 md5-chosen landmarks, classical MDS on the
    landmark matrix, pseudo-inverse placement of everything else.
    Rows-only at the gate (eigensolve); the exact-recovery pytests
    carry the contract."""
    from igraph_ray.ops.layout import layout_mds

    g = derive.graph_vsparse(sf_dir)
    return _scale_pos_e6(layout_mds(g, num_landmarks=48,
                                    num_partitions=8))


RT_V = 512  # vertices of the deterministic layout_rt forest fixture


def _rt_forest_table() -> pa.Table:
    """Deterministic 3-tree forest on RT_V vertices: roots {0,1,2};
    father(v) = v//3 when v mod 5 ≠ 0 else v//7 (always < v, so each
    tree's root is its component minimum — the engine's root-selection
    contract picks exactly these roots). Height ≤ 7, irregular subtree
    sizes."""
    v = np.arange(3, RT_V, dtype=np.int64)
    f = np.where(v % 5 != 0, v // 3, v // 7)
    return pa.table({"src": pa.array(f), "dst": pa.array(v)})


def q_layout_rt(sf_dir: str):
    """Reingold–Tilford tree layout (igraph_layout_reingold_tilford,
    layout.c:1052) of the deterministic forest fixture: y = BFS depth,
    x centers each parent over its subtree's leaf span, sibling
    subtrees packed in child-id order, trees side by side in root-id
    order. Engine path: components → multi-root BFS → father table →
    two aligned sweeps (leaf counts up, offsets down). All-integer
    output (x doubled), so the unrolled-sweep SQL oracle hashes
    exactly."""
    from igraph_ray.ops.layout import layout_reingold_tilford

    g = Graph(ray.data.from_arrow(_rt_forest_table()), n=None)
    pos = layout_reingold_tilford(g, num_partitions=8)

    def _ints(b: pa.Table) -> pa.Table:
        return pa.table({
            "vertex": b["vertex"],
            "x2": pa.array(np.round(2 * b["x"].to_numpy(
                zero_copy_only=False)).astype(np.int64)),
            "y": pa.array(np.round(b["y"].to_numpy(
                zero_copy_only=False)).astype(np.int64)),
        })

    return pos.map_batches(_ints, batch_format="pyarrow",
                           batch_size=None).materialize()


def _sql_layout_rt(iters: int = 10) -> str:
    parts = [
        f"WITH fam AS MATERIALIZED (SELECT CAST(v AS BIGINT) AS v, "
        f"CAST(CASE WHEN v % 5 <> 0 THEN v // 3 ELSE v // 7 END AS BIGINT)"
        f" AS f FROM range(3, {RT_V}) t(v))",
        f"verts AS MATERIALIZED (SELECT CAST(r AS BIGINT) AS v "
        f"FROM range(0, {RT_V}) t(r))",
        # depth: father-chase unroll (roots 0,1,2 at depth 0)
        "d0 AS MATERIALIZED (SELECT v, CASE WHEN v < 3 THEN 0 END AS d "
        "FROM verts)",
    ]
    for k in range(1, iters + 1):
        p = f"d{k-1}"
        parts.append(
            f"d{k} AS MATERIALIZED (SELECT a.v, "
            f"COALESCE(a.d, p.d + 1) AS d FROM {p} a "
            f"LEFT JOIN fam fm ON fm.v = a.v "
            f"LEFT JOIN {p} p ON p.v = fm.f)")
    parts.append("c0 AS MATERIALIZED (SELECT v, 1 AS c FROM verts)")
    for k in range(1, iters + 1):
        p = f"c{k-1}"
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT x.v, COALESCE(s.sc, 1) AS c "
            f"FROM {p} x LEFT JOIN (SELECT fm.f AS v, SUM(cp.c) AS sc "
            f"FROM fam fm JOIN {p} cp ON cp.v = fm.v GROUP BY fm.f) s "
            f"ON s.v = x.v)")
    cn = f"c{iters}"
    parts.append(
        f"pre AS MATERIALIZED (SELECT fm.v, fm.f, COALESCE(SUM(c.c) OVER "
        f"(PARTITION BY fm.f ORDER BY fm.v ROWS BETWEEN UNBOUNDED "
        f"PRECEDING AND 1 PRECEDING), 0) AS presum "
        f"FROM fam fm JOIN {cn} c ON c.v = fm.v)")
    parts.append(
        f"roff AS MATERIALIZED (SELECT x.v, COALESCE(SUM(c.c) OVER "
        f"(ORDER BY x.v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 "
        f"PRECEDING), 0) AS off0 "
        f"FROM (SELECT v FROM verts WHERE v < 3) x "
        f"JOIN {cn} c ON c.v = x.v)")
    parts.append(
        "o0 AS MATERIALIZED (SELECT x.v, COALESCE(r.off0, 0) AS o "
        "FROM verts x LEFT JOIN roff r ON r.v = x.v)")
    for k in range(1, iters + 1):
        p = f"o{k-1}"
        parts.append(
            f"o{k} AS MATERIALIZED (SELECT a.v, CASE WHEN a.v < 3 "
            f"THEN a.o ELSE op.o + pre.presum END AS o FROM {p} a "
            f"LEFT JOIN pre ON pre.v = a.v "
            f"LEFT JOIN {p} op ON op.v = pre.f)")
    body = ",\n".join(parts)
    return (f"{body}\n"
            f"SELECT v.v AS vertex, "
            f"CAST(2 * o.o + c.c - 1 AS BIGINT) AS x2, "
            f"CAST(d.d AS BIGINT) AS y "
            f"FROM verts v JOIN o{iters} o ON o.v = v.v "
            f"JOIN {cn} c ON c.v = v.v JOIN d{iters} d ON d.v = v.v "
            f"ORDER BY vertex")


SIR_BETA, SIR_GAMMA, SIR_STEPS, SIR_SEED_MOD = 0.4, 0.25, 4, 101


def q_sir(sf_dir: str):
    """Deterministic synchronous SIR (sir.c compartment semantics, md5
    per-edge infection / per-vertex recovery draws — the engine's
    reproducible adaptation of the reference's Gillespie simulation) on
    the dense derived graph; returns the (step, s, i, r) trajectory.
    The SQL oracle replays every step verbatim (unrolled CTEs with the
    same md5 15-hex-prefix draws)."""
    from igraph_ray.algorithms.sir import sir

    g = derive.graph_a(sf_dir)
    return sir(g, beta=SIR_BETA, gamma=SIR_GAMMA, steps=SIR_STEPS,
               seed_mod=SIR_SEED_MOD, n=derive.V, num_partitions=8)


def _sql_sir() -> str:
    from igraph_ray.algorithms.sir import HEX15

    beta_hex = format(int(SIR_BETA * HEX15), "015x")
    gamma_hex = format(int(SIR_GAMMA * HEX15), "015x")
    parts = [
        f"WITH und AS (SELECT DISTINCT LEAST(src, dst) AS lo, "
        f"GREATEST(src, dst) AS hi FROM ({derive.SQL_EDGES_A}) e), "
        f"s0 AS (SELECT range AS v, CASE WHEN range % {SIR_SEED_MOD} = 0 "
        f"THEN 1 ELSE 0 END AS st FROM range({derive.V}))"
    ]
    for t in range(SIR_STEPS):
        parts.append(
            f", s{t + 1} AS (SELECT s.v, CASE "
            f"WHEN s.st = 2 THEN 2 "
            f"WHEN s.st = 1 THEN CASE WHEN substr(md5('r:' || "
            f"CAST(s.v AS VARCHAR) || ':{t}'), 1, 15) < '{gamma_hex}' "
            f"THEN 2 ELSE 1 END "
            f"ELSE CASE WHEN EXISTS (SELECT 1 FROM und e "
            f"JOIN s{t} o ON o.v = CASE WHEN e.lo = s.v THEN e.hi "
            f"ELSE e.lo END "
            f"WHERE (e.lo = s.v OR e.hi = s.v) AND o.st = 1 "
            f"AND substr(md5(CAST(e.lo AS VARCHAR) || ':' || "
            f"CAST(e.hi AS VARCHAR) || ':{t}'), 1, 15) < '{beta_hex}') "
            f"THEN 1 ELSE 0 END END AS st FROM s{t} s)")
    rows = " UNION ALL ".join(
        f"SELECT {t} AS step, "
        f"CAST(SUM(CASE WHEN st = 0 THEN 1 ELSE 0 END) AS BIGINT) AS s, "
        f"CAST(SUM(CASE WHEN st = 1 THEN 1 ELSE 0 END) AS BIGINT) AS i, "
        f"CAST(SUM(CASE WHEN st = 2 THEN 1 ELSE 0 END) AS BIGINT) AS r "
        f"FROM s{t}" for t in range(SIR_STEPS + 1))
    parts.append(f" SELECT * FROM ({rows}) ORDER BY step")
    return "".join(parts)


def q_graphlets(sf_dir: str):
    """Graphlet candidate basis (igraph_graphlets_candidate_basis,
    glet.c; Azari & Airoldi 2012) of the weighted very-sparse derived
    graph: the maximal cliques of every threshold graph G_{>=t},
    deduplicated by vertex set and tagged with their min internal
    weight — one row per (graphlet_id, vertex) with the threshold
    (x10^6) and clique size, ordered by (threshold, members). The
    basis IS SQL-expressible (per-level clique-growth CTE with the
    outside-extension maximality test, the ``independent_sets``
    pattern), so this is driver-checked hash-green; the iterative EM
    projection weights are ``graphlets_mu`` (rows-only by nature,
    pytest-exact against a sequential replica of glet.c:716-744 in
    tests/test_graphlets.py)."""
    from igraph_ray.algorithms.graphlets import graphlets_candidate_basis

    g = derive.graph_vsparse_weighted(sf_dir)
    cliques, thr = graphlets_candidate_basis(g, num_partitions=8)
    gid, vs, thrs, sizes = [], [], [], []
    for i, cq in enumerate(cliques):
        for v in cq:
            gid.append(i)
            vs.append(v)
            thrs.append(int(round(thr[i] * 1_000_000)))
            sizes.append(len(cq))
    return pa.table({
        "graphlet": pa.array(gid, pa.int64()),
        "vertex": pa.array(vs, pa.int64()),
        "threshold_e6": pa.array(thrs, pa.int64()),
        "size": pa.array(sizes, pa.int64()),
    })


def q_graphlets_mu(sf_dir: str):
    """Full graphlet decomposition (igraph_graphlets, glet.c): the
    candidate basis plus the EM projection weights mu (x10^6), ordered
    by decreasing mu. Rows-only by nature (the EM multiplicative
    update glet.c:716-744 is float-iterative); the basis half is
    driver-checked hash-green via ``graphlets``, and the EM recurrence
    is pytest-exact in tests/test_graphlets.py."""
    from igraph_ray.algorithms.graphlets import graphlets

    g = derive.graph_vsparse_weighted(sf_dir)
    res = graphlets(g, niter=30, num_partitions=8)
    gid, vs, mus, thrs = [], [], [], []
    for i, cq in enumerate(res.cliques):
        for v in cq:
            gid.append(i)
            vs.append(v)
            mus.append(int(round(res.mu[i] * 1_000_000)))
            thrs.append(int(round(res.thresholds[i] * 1_000_000)))
    return pa.table({
        "graphlet": pa.array(gid, pa.int64()),
        "vertex": pa.array(vs, pa.int64()),
        "mu_e6": pa.array(mus, pa.int64()),
        "threshold_e6": pa.array(thrs, pa.int64()),
    })


def q_spinglass_single(sf_dir: str):
    """Community of a single vertex (igraph_community_spinglass_single,
    clustertool.cpp:427, RB local Hamiltonian with the uniform null
    p = 2m/(n(n-1))): members of vertex 0's community on the dense
    undirected view + the inner/outer link stats. Rows-only (greedy
    local search); planted-clique pytest carries the contract."""
    from igraph_ray.algorithms.spinglass import spinglass_single

    members, stats = spinglass_single(derive.graph_a(sf_dir), vertex=0,
                                      max_rounds=12, num_partitions=8)
    rows = members.take_all()
    return pa.table({
        "vertex": pa.array(sorted(int(r["vertex"]) for r in rows),
                           pa.int64()),
        "size": pa.array([stats["size"]] * len(rows), pa.int64()),
        "inner_links": pa.array([stats["inner_links"]] * len(rows),
                                pa.int64()),
        "outer_links": pa.array([stats["outer_links"]] * len(rows),
                                pa.int64())})


def q_scg_laplacian(sf_dir: str):
    """Laplacian SCG coarse matrix (igraph_scg_laplacian, scg.c row
    norm): L' = L_semi.(D-A).R^T over the sparse undirected view,
    weights e6-rounded. Rows-only (eigensolve grouping); dense-replay
    pytest carries the formula."""
    from igraph_ray.algorithms.scg import scg_laplacian

    res = scg_laplacian(derive.graph_sparse(sf_dir), ell=2, intervals=4,
                        fixed_iterations=60, num_partitions=8)
    return _scale_col(res.coarse, "weight", "w_e6", 1e6).sort(
        ["src", "dst"])


def q_scg_stochastic(sf_dir: str):
    """Stochastic SCG coarse matrix (igraph_scg_stochastic, scg.c row
    norm, symmetric walk with closed-form p = deg/2m):
    S'_ab = cut(a,b)/degsum_a, weights e6-rounded. Rows-only; dense
    parity + row-sum pytest."""
    from igraph_ray.algorithms.scg import scg_stochastic

    res = scg_stochastic(derive.graph_sparse(sf_dir), ell=2, intervals=4,
                         fixed_iterations=60, num_partitions=8)
    return _scale_col(res.coarse, "weight", "w_e6", 1e6).sort(
        ["src", "dst"])


def q_scg_groups(sf_dir: str):
    """Spectral coarse graining groups (igraph_scg_grouping, scg.c,
    IGRAPH_SCG_INTERV semantics: joint equal-width-interval bins of a
    caller-supplied vector matrix V, densified by first appearance) of
    the undirected view of edges_a, with V = the exact-integer power
    iterates [A²·1, A³·1] — the Krylov vectors the approximate SCG
    methods build from (scg_approximate_methods.c), pinned to integer
    arithmetic so the driver oracle replays the grouping bit-for-bit
    (bin = (x−min)·intervals // (max−min), clipped). The
    eigenvector-based grouping is ``scg_groups_spectral`` (rows-only by
    nature); semiprojector algebra P·A·Pᵀ and block-recovery exactness
    are pytest-gated in tests/test_scg.py."""
    from igraph_ray.algorithms.scg import scg_grouping_power

    g = derive.graph_a(sf_dir)
    return scg_grouping_power(g, intervals=4, steps=(2, 3),
                              num_partitions=8)


def q_scg_groups_spectral(sf_dir: str):
    """Spectral coarse graining groups over the top-2 eigenvector
    components (igraph_scg_grouping on the eigenbasis — the reference's
    default matrix). Rows-only by nature (the eigenbasis is an
    iterative solve, same impossibility note as spectral_embedding);
    the interval-grouping rule itself is driver-checked hash-green via
    ``scg_groups``."""
    from igraph_ray.algorithms.scg import scg_grouping

    g = derive.graph_a(sf_dir)
    return scg_grouping(g, ell=2, intervals=4,
                        num_partitions=8).sort("vertex")


def q_dim_select(sf_dir: str):
    """igraph_dim_select (embedding.c:1054; Zhu–Ghodsi profile
    likelihood) on the |λ| spectrum head of the dense derived graph's
    ASE (k=6): (dim,). Rows-only; exactness vs a literal transcription
    of the reference's streaming recurrence is pytest-gated
    (tests/test_embedding.py::test_dim_select_reference_replay)."""
    from igraph_ray.algorithms.embedding import (
        adjacency_spectral_embedding,
        dim_select,
    )

    g = derive.graph_a(sf_dir)
    res = adjacency_spectral_embedding(g, k=6, fixed_iterations=60,
                                       num_partitions=8)
    sv = np.sort(np.abs(np.asarray(res.scalars["eigenvalues"])))[::-1]
    return pa.table({"dim": pa.array([dim_select(sv)], pa.int64())})


def q_laplacian_embedding(sf_dir: str):
    """Laplacian (DAD) spectral embedding
    (igraph_laplacian_spectral_embedding, embedding.c:998): top-k
    eigenpairs of D^{-1/2}·A·D^{-1/2} scaled by sqrt(|λ|), k=2, over
    the undirected dense derived graph — the SAME stride-2 subspace
    iteration as ASE with 1/sqrt(d_u·d_v) edge weights (one degree
    join; no extra per-superstep work). Values ×10⁶. Rows-only at the
    gate; dense-eigh agreement is pytest-gated
    (tests/test_embedding.py::test_lse_matches_dense_eigh)."""
    from igraph_ray.algorithms.embedding import adjacency_spectral_embedding

    g = derive.graph_a(sf_dir)
    res = adjacency_spectral_embedding(g, k=2, fixed_iterations=60,
                                       num_partitions=8, variant="lse")

    def _scale(b: pa.Table) -> pa.Table:
        return pa.table({
            "vertex": b["vertex"],
            "l0_e6": pa.array(np.round(
                b["d0"].to_numpy(zero_copy_only=False) * 1e6
            ).astype(np.int64)),
            "l1_e6": pa.array(np.round(
                b["d1"].to_numpy(zero_copy_only=False) * 1e6
            ).astype(np.int64)),
        })

    return res.state.map_batches(_scale, batch_format="pyarrow",
                                 batch_size=None).sort("vertex")


def q_spectral_embedding(sf_dir: str):
    """Adjacency spectral embedding (igraph_adjacency_spectral_embedding,
    embedding.c; ASE = U_k·|Λ_k|^{1/2}) of the undirected dense derived
    graph, k=2, via stride-2 block subspace iteration on the aligned
    engine. Values ×10⁶ rounded for hash stability. Rows-only at the
    gate (iterative eigensolve is not SQL-expressible); the dense-eigh
    agreement pytest carries exactness."""
    from igraph_ray.algorithms.embedding import adjacency_spectral_embedding

    g = derive.graph_a(sf_dir)
    res = adjacency_spectral_embedding(g, k=2, fixed_iterations=60,
                                       num_partitions=8)

    def _scale(b: pa.Table) -> pa.Table:
        return pa.table({
            "vertex": b["vertex"],
            "d0_e6": pa.array(np.round(
                b["d0"].to_numpy(zero_copy_only=False) * 1e6
            ).astype(np.int64)),
            "d1_e6": pa.array(np.round(
                b["d1"].to_numpy(zero_copy_only=False) * 1e6
            ).astype(np.int64)),
        })

    return res.state.map_batches(_scale, batch_format="pyarrow",
                                 batch_size=None).materialize()


def q_fastgreedy(sf_dir: str):
    """CNM greedy modularity communities (igraph_community_fastgreedy,
    fast_community.c) at the max-modularity cut on the sparse derived
    graph. Rows-only at the gate (the merge order is a sequential
    greedy, not SQL-replayable); the modularity-sequence cross-check
    and planted-partition pytest carry exactness."""
    from igraph_ray.algorithms.fastgreedy import community_fastgreedy

    g = derive.graph_sparse(sf_dir)
    _, mem = community_fastgreedy(g, n=derive.V)
    return mem


def q_walktrap(sf_dir: str):
    """Walktrap communities (igraph_community_walktrap, walktrap.cpp;
    Pons–Latapy t=4 walk distances) at the max-modularity cut on the
    sparse derived graph. Rows-only at the gate; planted-partition and
    best-cut-modularity pytests carry exactness."""
    from igraph_ray.algorithms.walktrap import community_walktrap

    g = derive.graph_sparse(sf_dir)
    _, mem = community_walktrap(g, n=derive.V)
    return mem


def q_infomap(sf_dir: str):
    """Greedy two-level Infomap (igraph_community_infomap, infomap.cc
    map-equation semantics; deterministic agglomerative variant of the
    reference's stochastic solver) on the sparse derived graph.
    Rows-only at the gate; closed-form codelength and planted-partition
    pytests carry exactness."""
    from igraph_ray.algorithms.infomap import community_infomap

    g = derive.graph_sparse(sf_dir)
    _, mem = community_infomap(g, n=derive.V)
    return mem


def q_community_le(sf_dir: str):
    """Leading-eigenvector communities (community.c:1414, Newman 2006)
    on the very-sparse graph — two recursive spectral bisections via
    shifted distributed power iteration (one join+groupby matvec per
    step). Rows-only (ARPACK-grade eigensolves are not SQL-replayable);
    the numpy-eigensign and modularity pytests carry exactness."""
    from igraph_ray.algorithms.leading_eigenvector import (
        leading_eigenvector_communities,
    )

    g = derive.graph_vsparse(sf_dir)
    return leading_eigenvector_communities(
        g, max_splits=2, power_iters=25, num_partitions=8).sort("vertex")


def q_louvain_sweeps(sf_dir: str):
    """Two fixed synchronous Louvain local-moving sweeps with the exact
    int64 gain comparator (algorithms/louvain.py louvain_sweeps) on the
    weighted very-sparse graph — the SQL-replayable core of Louvain
    (full Louvain's sweep/level counts are data-dependent; a fixed SQL
    text cannot adapt, so the driver-checked oracle pins the recurrence
    at 2 sweeps instead — see the louvain query docstring)."""
    from igraph_ray.algorithms.louvain import louvain_sweeps

    g = derive.graph_vsparse_weighted(sf_dir)
    return louvain_sweeps(g, sweeps=2, num_partitions=8).sort("vertex")


def q_mis(sf_dir: str):
    """Canonical maximal independent set (deterministic Luby rounds,
    md5-prefix priorities) over the sparse undirected view — the
    distributed counterpart of igraph's independent-set family (see
    algorithms/mis.py for the documented deviation)."""
    from igraph_ray.algorithms.mis import maximal_independent_set

    st = maximal_independent_set(derive.graph_sparse(sf_dir),
                                 num_partitions=8).state

    def _m(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        keep = _pc.equal(b["status"], 1)
        return pa.table({"vertex": b["vertex"].filter(keep)})

    return st.map_batches(_m, batch_format="pyarrow",
                          batch_size=None).sort("vertex")


def q_is_bipartite(sf_dir: str):
    """igraph_is_bipartite analogue via the bipartite double cover: G is
    bipartite iff its double cover D (u→(2u,2u+1); each undirected edge
    {u,v} → 2u—(2v+1), (2u+1)—2v) has exactly 2× the components —
    connected_components reused verbatim on the transformed edge table,
    no new propagation code. Reports (nc, nc_double, bipartite) over the
    very-sparse view (per-component check = whether 2v and 2v+1 ever
    share a label)."""
    g = derive.graph_vsparse(sf_dir)
    nc = connected_components(g, num_partitions=8).state \
        .groupby("label").count().count()

    und = g.canonical_undirected()

    def _dc(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([2 * lo, 2 * lo + 1])),
            "dst": pa.array(np.concatenate([2 * hi + 1, 2 * hi]))})

    g2 = Graph(und.map_batches(_dc, batch_format="pyarrow",
                               batch_size=None).materialize())
    nd = connected_components(g2, num_partitions=8).state \
        .groupby("label").count().count()
    return pa.table({
        "nc": pa.array([int(nc)], pa.int64()),
        "nc_double": pa.array([int(nd)], pa.int64()),
        "bipartite": pa.array([int(nd == 2 * nc)], pa.int64())})


def q_bipartite_components(sf_dir: str):
    """(component, csize, bipartite) per weak component of the
    very-sparse view: component label = min vertex id (the engine's
    label contract), bipartite from the double cover — component
    bipartite iff no vertex's two cover copies share a cover label."""
    from igraph_ray.util import hash_join

    g = derive.graph_vsparse(sf_dir)
    base = connected_components(g, num_partitions=8, densify=False).state

    und = g.canonical_undirected()

    def _dc(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([2 * lo, 2 * lo + 1])),
            "dst": pa.array(np.concatenate([2 * hi + 1, 2 * hi]))})

    g2 = Graph(und.map_batches(_dc, batch_format="pyarrow",
                               batch_size=None).materialize())
    cover = connected_components(g2, num_partitions=8, densify=False).state

    def _half(b: pa.Table) -> pa.Table:
        v = b["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"vertex": pa.array(v // 2),
                         "parity": pa.array(v % 2),
                         "clab": pa.array(lab)})

    halves = cover.map_batches(_half, batch_format="pyarrow", batch_size=None)

    def _l0(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        keep = _pc.equal(b["parity"], 0)
        return pa.table({"vertex": b["vertex"].filter(keep),
                         "l0": b["clab"].filter(keep)})

    def _l1(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        keep = _pc.equal(b["parity"], 1)
        return pa.table({"vertex": b["vertex"].filter(keep),
                         "l1": b["clab"].filter(keep)})

    j = hash_join(halves.map_batches(_l0, batch_format="pyarrow",
                                     batch_size=None),
                  halves.map_batches(_l1, batch_format="pyarrow",
                                     batch_size=None),
                  on="vertex", num_partitions=8)
    j = hash_join(j, base, on="vertex", num_partitions=8)

    def _same(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vertex" not in b.column_names:
            return pa.table({"component": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "odd": pa.array([], pa.int64())})
        same = (b["l0"].to_numpy(zero_copy_only=False)
                == b["l1"].to_numpy(zero_copy_only=False)).astype(np.int64)
        t = pa.table({"component": b["label"],
                      "n": pa.array(np.ones(b.num_rows, np.int64)),
                      "odd": pa.array(same)})
        return (pa.TableGroupBy(t, "component")
                .aggregate([("n", "sum"), ("odd", "max")])
                .rename_columns(["component", "n", "odd"]))

    from ray.data.aggregate import Max, Sum

    out = (j.map_batches(_same, batch_format="pyarrow", batch_size=None)
           .groupby("component").aggregate(Sum("n"), Max("odd")))

    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "component" not in b.column_names:
            return pa.table({"component": pa.array([], pa.int64()),
                             "csize": pa.array([], pa.int64()),
                             "bipartite": pa.array([], pa.int64())})
        odd = b["max(odd)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"component": b["component"],
                         "csize": pc.cast(b["sum(n)"], pa.int64()),
                         "bipartite": pa.array((1 - odd).astype(np.int64))})

    return out.map_batches(_rn, batch_format="pyarrow",
                           batch_size=None).sort("component")


def q_bipartite_projection(sf_dir: str):
    """Bipartite projection (igraph_bipartite_projection, bipartite.c:265):
    project the thinned order↔part incidence of lineitem onto parts —
    (a < b, common) = #orders the two parts co-occur in. The wedge
    self-join with per-block pre-combine (the cocitation physical plan)."""
    from igraph_ray.ops.structural import _common_neighbor_pairs

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])

    def _inc(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        keep = (ok * 11 + pk) % 7 == 0
        t = pa.table({"o": pa.array(ok[keep].astype(np.int64)),
                      "p": pa.array(pk[keep].astype(np.int64))})
        return t.group_by(["o", "p"]).aggregate([])

    inc = (li.map_batches(_inc, batch_format="pyarrow", batch_size=None)
           .groupby(["o", "p"]).count())

    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o" not in b.column_names:
            return pa.table({"o": pa.array([], pa.int64()),
                             "p": pa.array([], pa.int64())})
        return pa.table({"o": b["o"], "p": b["p"]})

    inc = inc.map_batches(_rn, batch_format="pyarrow", batch_size=None)
    return _common_neighbor_pairs(inc, "o", "p", 8)


def _thin_incidence(sf_dir: str, distinct: bool) -> ray.data.Dataset:
    """(o, p) thinned lineitem incidence — the shared bipartite fixture
    ((l_orderkey*11+l_partkey)%7==0), multigraph when distinct=False."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])

    def _inc(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        keep = (ok * 11 + pk) % 7 == 0
        return pa.table({"o": pa.array(ok[keep].astype(np.int64)),
                         "p": pa.array(pk[keep].astype(np.int64))})

    inc = li.map_batches(_inc, batch_format="pyarrow", batch_size=None)
    if distinct:
        inc = inc.groupby(["o", "p"]).count().map_batches(
            lambda b: pa.table({"o": b["o"], "p": b["p"]})
            if b.num_rows else pa.table({"o": pa.array([], pa.int64()),
                                         "p": pa.array([], pa.int64())}),
            batch_format="pyarrow", batch_size=None)
    return inc


def q_bipartite_projection_size(sf_dir: str):
    """Projection sizes without materializing the projections
    (igraph_bipartite_projection_size, bipartite.c:87) over the thinned
    order↔part incidence."""
    from igraph_ray.ops.bipartite import bipartite_projection_size

    return bipartite_projection_size(_thin_incidence(sf_dir, True),
                                     a_col="o", b_col="p",
                                     num_partitions=8)


def q_get_incidence(sf_dir: str):
    """Sparse incidence-matrix triplets (igraph_get_incidence,
    bipartite.c:694): dense-ranked rows/cols + parallel-edge counts
    over the thinned multigraph incidence mapped to one id space
    (o→2o type 0, p→2p+1 type 1)."""
    from igraph_ray.ops.bipartite import get_incidence

    inc = _thin_incidence(sf_dir, False).materialize()
    edges = inc.map_batches(
        lambda b: pa.table({
            "src": pc.multiply(b["o"], pa.scalar(2, pa.int64())),
            "dst": pc.add(pc.multiply(b["p"], pa.scalar(2, pa.int64())),
                          pa.scalar(1, pa.int64()))}),
        batch_format="pyarrow", batch_size=None)
    types = (inc.map_batches(
        lambda b: pa.table({
            "vertex": pc.multiply(b["o"], pa.scalar(2, pa.int64()))}),
        batch_format="pyarrow", batch_size=None).union(
        inc.map_batches(
            lambda b: pa.table({
                "vertex": pc.add(
                    pc.multiply(b["p"], pa.scalar(2, pa.int64())),
                    pa.scalar(1, pa.int64()))}),
            batch_format="pyarrow", batch_size=None))
        .groupby("vertex").count().map_batches(
        lambda b: pa.table({
            "vertex": b["vertex"],
            "type": pc.cast(pc.bit_wise_and(
                b["vertex"], pa.scalar(1, pa.int64())), pa.int64())})
        if b.num_rows else pa.table({"vertex": pa.array([], pa.int64()),
                                     "type": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None))
    return get_incidence(edges, types, num_partitions=8)


def q_create_bipartite(sf_dir: str):
    """Validated bipartite construction (igraph_create_bipartite,
    bipartite.c:485): one-id-space mapping of the thinned incidence
    (o→2o, p→2p+1; type = id parity) through the validator, returning
    the canonical distinct edge table."""
    from igraph_ray.ops.bipartite import create_bipartite

    inc = _thin_incidence(sf_dir, True).materialize()
    edges = inc.map_batches(
        lambda b: pa.table({
            "src": pc.multiply(b["o"], pa.scalar(2, pa.int64())),
            "dst": pc.add(pc.multiply(b["p"], pa.scalar(2, pa.int64())),
                          pa.scalar(1, pa.int64()))}),
        batch_format="pyarrow", batch_size=None).materialize()
    types = (edges.map_batches(
        lambda b: pa.table({"vertex": b["src"]}),
        batch_format="pyarrow", batch_size=None).union(
        edges.map_batches(lambda b: pa.table({"vertex": b["dst"]}),
                          batch_format="pyarrow", batch_size=None))
        .groupby("vertex").count().map_batches(
        lambda b: pa.table({
            "vertex": b["vertex"],
            "type": pc.cast(pc.bit_wise_and(
                b["vertex"], pa.scalar(1, pa.int64())), pa.int64())})
        if b.num_rows else pa.table({"vertex": pa.array([], pa.int64()),
                                     "type": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None))
    g = create_bipartite(types, edges, num_partitions=8)
    return g.edges


def q_adjacency_triplets(sf_dir: str):
    """Sparse igraph_get_adjacency cells (conversion.c:35, directed,
    eids=False): m[src][dst] += 1 per multigraph edge, loops included."""
    from igraph_ray.ops.relational import adjacency_triplets

    return adjacency_triplets(derive.edges_a_multi(sf_dir), directed=True)


def q_local_scan2(sf_dir: str):
    """Scan-2 statistic (scan.c local_scan_k_ecount k=2) on the sparse
    undirected view."""
    from igraph_ray.ops.structural import local_scan2

    return local_scan2(derive.graph_sparse(sf_dir).canonical_undirected(),
                       num_partitions=8)


def q_scan0(sf_dir: str):
    """US scan-0 (scan.c:54-65, mode OUT): plain out-degree with loops
    and multiplicities counted, over the multigraph view — the
    reference defines k=0 scan as igraph_degree/strength(loops=1)."""
    from igraph_ray.ops.structural import local_scan0

    return local_scan0(derive.edges_a_multi(sf_dir), mode="out",
                       num_partitions=8)


def q_scan2_them(sf_dir: str):
    """THEM scan-2 (scan.c:676, igraph_local_scan_k_ecount_them k=2,
    mode ALL): undirected THEM edges (from edges_b) inside each
    vertex's closed 2-ball of the undirected US graph (edges_a), each
    inside edge counted once."""
    from igraph_ray.ops.structural import local_scan_k_ecount_them
    from igraph_ray.graph import endpoint_universe

    us = derive.graph_a(sf_dir)
    them = derive.edges_b(sf_dir)

    def _und(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"lo": pa.array(np.minimum(s, d)),
                         "hi": pa.array(np.maximum(s, d))})

    them_und = them.map_batches(_und, batch_format="pyarrow",
                                batch_size=None).groupby(
        ["lo", "hi"]).count().map_batches(
        lambda b: pa.table({"lo": b["lo"], "hi": b["hi"]})
        if b.num_rows else pa.table({"lo": pa.array([], pa.int64()),
                                     "hi": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    return local_scan_k_ecount_them(
        us, them_und, k=2, universe=endpoint_universe(us.edges),
        num_partitions=8)


def q_scan_nbhd_ecount(sf_dir: str):
    """Pre-calculated-neighborhoods scan
    (igraph_local_scan_neighborhood_ecount, scan.c): count edges_b
    edges scanned from each seed's out-neighbor list in edges_a whose
    heads land back in the list ∪ {seed}; directed, no halving."""
    from igraph_ray.ops.structural import local_scan_neighborhood_ecount
    from igraph_ray.graph import endpoint_universe

    us = derive.edges_a(sf_dir).materialize()
    them = derive.edges_b(sf_dir).materialize()
    nbhd = us.map_batches(
        lambda b: pa.table({"seed": b["src"], "vertex": b["dst"]}),
        batch_format="pyarrow", batch_size=None)
    universe = endpoint_universe(us).union(
        endpoint_universe(them)).groupby("vertex").count().map_batches(
        lambda b: pa.table({"vertex": b["vertex"]})
        if b.num_rows else pa.table({"vertex": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    return local_scan_neighborhood_ecount(
        them, nbhd, universe=universe, num_partitions=8)


def q_scan0_them(sf_dir: str):
    """THEM scan-0 (scan.c:428, mode OUT): out-degree in the us∩them
    intersection graph, over the US vertex universe."""
    from igraph_ray.ops.relational import intersection_edges
    from igraph_ray.graph import _degrees_over, endpoint_universe

    us = derive.edges_a(sf_dir).materialize()
    inter = intersection_edges(us, derive.edges_b(sf_dir))
    uni = endpoint_universe(us)
    d = _degrees_over(inter, "src", uni, weighted=False)

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"],
                         "scan0t": pc.cast(b["deg"], pa.int64())})

    return d.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def q_scan1_them(sf_dir: str):
    """THEM scan-1 (scan.c:475, mode OUT): edges_b edges inside each
    vertex's closed out-neighborhood from edges_a."""
    from igraph_ray.ops.structural import local_scan1_them

    return local_scan1_them(derive.edges_a(sf_dir), derive.edges_b(sf_dir),
                            num_partitions=8)


def q_knn_weighted(sf_dir: str):
    """Weighted average nearest-neighbor degree (Barrat et al.;
    igraph_avg_nearest_neighbor_degree weights branch) over the weighted
    undirected sparse view, as the exact integer pair
    (wnum = Σ w_uv·deg(u), strength): knn_w = wnum / strength."""
    from igraph_ray.util import hash_join

    und = derive.und_sparse_weighted(sf_dir).materialize()

    def _ends(b: pa.Table) -> pa.Table:
        v = np.concatenate([
            b["lo"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)])
        return pa.table({"vertex": pa.array(v)})

    deg = (und.map_batches(_ends, batch_format="pyarrow", batch_size=None)
           .groupby("vertex").count())
    deg = deg.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "deg": b["count()"]}),
        batch_format="pyarrow", batch_size=None).materialize()

    def _dl(b: pa.Table) -> pa.Table:
        return pa.table({"lo": b["vertex"], "deg_lo": b["deg"]})

    def _dh(b: pa.Table) -> pa.Table:
        return pa.table({"hi": b["vertex"], "deg_hi": b["deg"]})

    j = hash_join(und, deg.map_batches(_dl, batch_format="pyarrow",
                                       batch_size=None), on="lo",
                  num_partitions=8)
    j = hash_join(j, deg.map_batches(_dh, batch_format="pyarrow",
                                     batch_size=None), on="hi",
                  num_partitions=8)

    def _c(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "lo" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "wnum": pa.array([], pa.int64()),
                             "strength": pa.array([], pa.int64())})
        lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = b["weight"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl = b["deg_lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        dh = b["deg_hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({"vertex": pa.array(np.concatenate([lo, hi])),
                      "wnum": pa.array(np.concatenate([w * dh, w * dl])),
                      "strength": pa.array(np.concatenate([w, w]))})
        return (pa.TableGroupBy(t, "vertex")
                .aggregate([("wnum", "sum"), ("strength", "sum")])
                .rename_columns(["vertex", "wnum", "strength"]))

    out = (j.map_batches(_c, batch_format="pyarrow", batch_size=None)
           .groupby("vertex").sum(["wnum", "strength"]))

    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vertex" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "wnum": pa.array([], pa.int64()),
                             "strength": pa.array([], pa.int64())})
        return pa.table({"vertex": b["vertex"],
                         "wnum": pc.cast(b["sum(wnum)"], pa.int64()),
                         "strength": pc.cast(b["sum(strength)"], pa.int64())})

    return out.map_batches(_rn, batch_format="pyarrow",
                           batch_size=None).sort("vertex")


def q_edge_clustering4(sf_dir: str):
    """k=4 edge clustering components (igraph_ecc k=4): 4-cycles per
    edge + the could-close-a-cycle denominator, exact integers."""
    from igraph_ray.ops.structural import edge_clustering4

    return edge_clustering4(derive.graph_sparse(sf_dir).canonical_undirected(),
                            num_partitions=8)


def q_transitivity_barrat(sf_dir: str):
    """Barrat weighted local clustering (igraph_transitivity_barrat,
    triangles.c:713-965) over the weighted undirected sparse view,
    reported as the exact integer triple (tri_wsum, strength, deg) per
    deg>=2 vertex — C_w = tri_wsum / (2*strength*(deg-1))."""
    from igraph_ray.ops.structural import barrat_weighted_clustering

    return barrat_weighted_clustering(derive.und_sparse_weighted(sf_dir),
                                      num_partitions=8)


_SQL_SCAN1 = f"""
WITH edges AS ({SQL_EDGES_A}),
verts AS ({SQL_VERTS_A}),
und AS (SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
        FROM edges WHERE src <> dst),
degs AS (SELECT v, COUNT(*) AS deg FROM
  (SELECT lo AS v FROM und UNION ALL SELECT hi FROM und) GROUP BY v),
orient AS (
  SELECT CASE WHEN (dl.deg < dh.deg) OR (dl.deg = dh.deg AND u.lo < u.hi)
              THEN u.lo ELSE u.hi END AS a,
         CASE WHEN (dl.deg < dh.deg) OR (dl.deg = dh.deg AND u.lo < u.hi)
              THEN u.hi ELSE u.lo END AS b
  FROM und u JOIN degs dl ON dl.v = u.lo JOIN degs dh ON dh.v = u.hi),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM orient e1
  JOIN orient e2 ON e2.a = e1.b
  JOIN orient e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
SELECT verts.v AS vertex,
       COALESCE(d.deg, 0) + COALESCE(c.n, 0) AS scan1
FROM verts
LEFT JOIN degs d ON d.v = verts.v
LEFT JOIN (SELECT v, COUNT(*) AS n FROM corners GROUP BY v) c ON c.v = verts.v
ORDER BY vertex
"""


def q_maximal_cliques(sf_dir: str):
    """Maximal-clique size histogram (cliques.c:576 igraph_maximal_cliques)
    over the thinned graph (graph_a at sf>=0.01 is too dense for the SQL
    clique-CTE oracle)."""
    from igraph_ray.algorithms.cliques import clique_size_histogram

    return clique_size_histogram(derive.graph_sparse(sf_dir), num_partitions=8)


def q_connect2(sf_dir: str):
    """igraph_connect_neighborhood order=2 analogue on the undirected
    sparse view: the unordered pairs (a < b) at distance ≤ 2 — direct
    edges ∪ the common-neighbor wedge pairs (one wedge self-join)."""
    from igraph_ray.ops.structural import _common_neighbor_pairs

    und = derive.graph_sparse(sf_dir).canonical_undirected().materialize()

    def _sym(b: pa.Table) -> pa.Table:
        import numpy as _np
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(_np.concatenate([lo, hi])),
                         "dst": pa.array(_np.concatenate([hi, lo]))})

    sym = und.map_batches(_sym, batch_format="pyarrow", batch_size=None)
    wedge = _common_neighbor_pairs(sym, "src", "dst", 8)

    def _w(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "a" not in b.column_names:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return pa.table({"src": b["a"], "dst": b["b"]})

    def _d(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["lo"], "dst": b["hi"]})

    both = (wedge.map_batches(_w, batch_format="pyarrow", batch_size=None)
            .union(und.map_batches(_d, batch_format="pyarrow", batch_size=None)))
    from igraph_ray.ops.relational import _dedup

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table({"a": b["src"], "b": b["dst"]})

    return _dedup(both).map_batches(_rn, batch_format="pyarrow",
                                    batch_size=None)


def q_clique_number(sf_dir: str):
    """Clique number ω(G) (igraph_clique_number, cliques.c:1054): max
    maximal-clique size from the same distributed Bron–Kerbosch stream."""
    from igraph_ray.algorithms.cliques import clique_size_histogram

    h = clique_size_histogram(derive.graph_sparse(sf_dir), num_partitions=8)
    sizes = [r["size"] for r in h.take_all()] if hasattr(h, "take_all") else \
        h["size"].to_pylist()
    return pa.table({"clique_number": pa.array(
        [max(sizes) if sizes else 0], pa.int64())})


_SQL_BRIDGES_CORE = f"""
WITH RECURSIVE edges AS MATERIALIZED ({derive.SQL_EDGES_VSPARSE}),
m AS MATERIALIZED (SELECT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi,
     COUNT(*) AS m FROM edges GROUP BY 1, 2),
sym AS MATERIALIZED (SELECT lo AS a, hi AS b FROM m UNION ALL SELECT hi, lo FROM m),
cand AS MATERIALIZED (SELECT lo, hi FROM m WHERE m = 1),
-- per candidate edge: vertices reachable from lo avoiding that edge
reach(lo, hi, v) AS (
  SELECT lo, hi, lo FROM cand
  UNION
  SELECT r.lo, r.hi, s.b FROM reach r JOIN sym s ON s.a = r.v
  WHERE NOT (LEAST(s.a, s.b) = r.lo AND GREATEST(s.a, s.b) = r.hi)
),
br AS (SELECT c.lo, c.hi FROM cand c
       WHERE NOT EXISTS (SELECT 1 FROM reach r
                         WHERE r.lo = c.lo AND r.hi = c.hi AND r.v = c.hi))
"""


_SQL_BRIDGES = (
    _SQL_BRIDGES_CORE
    + "SELECT lo AS src, hi AS dst FROM br ORDER BY src, dst"
)


_SQL_TWO_ECC = (
    _SQL_BRIDGES_CORE
    + """, verts AS (SELECT lo AS v FROM m UNION SELECT hi FROM m),
nonbr AS MATERIALIZED (
  SELECT m.lo, m.hi FROM m LEFT JOIN br
  ON br.lo = m.lo AND br.hi = m.hi WHERE br.lo IS NULL),
nsym AS (SELECT lo AS a, hi AS b FROM nonbr UNION ALL SELECT hi, lo FROM nonbr),
reach2(v, l) AS (
  SELECT v, v FROM verts
  UNION
  SELECT s.b, r.l FROM reach2 r JOIN nsym s ON s.a = r.v
)
SELECT v AS vertex, MIN(l) AS label FROM reach2 GROUP BY v ORDER BY vertex"""
)


_SQL_ARTICULATION = f"""
WITH RECURSIVE edges AS MATERIALIZED ({derive.SQL_EDGES_VSPARSE}),
und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS lo,
                     GREATEST(src, dst) AS hi FROM edges),
sym AS MATERIALIZED (SELECT lo AS a, hi AS b FROM und
                     UNION ALL SELECT hi, lo FROM und),
deg AS (SELECT a AS v, COUNT(*) AS d FROM sym GROUP BY a),
cand AS MATERIALIZED (SELECT v FROM deg WHERE d >= 2),
start AS (SELECT c.v AS c, MIN(s.b) AS s0 FROM cand c
          JOIN sym s ON s.a = c.v GROUP BY c.v),
-- vertices reachable from the min neighbor of c with c removed
reach(c, x) AS (
  SELECT c, s0 FROM start
  UNION
  SELECT r.c, s.b FROM reach r JOIN sym s ON s.a = r.x WHERE s.b <> r.c
)
SELECT DISTINCT c.v AS vertex FROM cand c
WHERE EXISTS (SELECT 1 FROM sym s WHERE s.a = c.v
              AND NOT EXISTS (SELECT 1 FROM reach r
                              WHERE r.c = c.v AND r.x = s.b))
ORDER BY vertex"""


def _sql_biconn(V: int = derive.V) -> str:
    """Biconnected components over the vsparse simple undirected view:
    edges e=(c,a), f=(c,b) sharing c belong to the same component iff
    a and b stay connected with c removed (a cycle a–c–b–…–a then
    contains both); the components are the transitive closure of that
    relation, labelled by the minimal member edge (eid = lo*V+hi, the
    same lexicographic (lo, hi) minimum the engine emits)."""
    return f"""
WITH RECURSIVE edges AS MATERIALIZED ({derive.SQL_EDGES_VSPARSE}),
und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS lo,
                     GREATEST(src, dst) AS hi FROM edges),
sym AS MATERIALIZED (SELECT lo AS a, hi AS b FROM und
                     UNION ALL SELECT hi, lo FROM und),
-- reach2: vertices x reachable from neighbor n0 of c with c removed
nstart AS (SELECT s.a AS c, s.b AS n0 FROM sym s),
reach2(c, n0, x) AS (
  SELECT c, n0, n0 FROM nstart
  UNION
  SELECT r.c, r.n0, s.b FROM reach2 r JOIN sym s ON s.a = r.x
  WHERE s.b <> r.c
),
-- adjacent-edge relation: (c,a) ~ (c,b) iff b reachable from a sans c
erel AS MATERIALIZED (
  SELECT (LEAST(p.c, p.n0) * {V} + GREATEST(p.c, p.n0)) AS e,
         (LEAST(q.c, q.n0) * {V} + GREATEST(q.c, q.n0)) AS f
  FROM nstart p JOIN nstart q ON p.c = q.c AND p.n0 < q.n0
  WHERE EXISTS (SELECT 1 FROM reach2 r
                WHERE r.c = p.c AND r.n0 = p.n0 AND r.x = q.n0)),
esym AS MATERIALIZED (SELECT e, f FROM erel UNION ALL SELECT f, e FROM erel),
eid AS (SELECT lo * {V} + hi AS e, lo, hi FROM und),
lab(e, l) AS (
  SELECT e, e FROM eid
  UNION
  SELECT s.f, lab.l FROM lab JOIN esym s ON s.e = lab.e
),
ml AS (SELECT e, MIN(l) AS l FROM lab GROUP BY e)
SELECT eid.lo, eid.hi, CAST(ml.l // {V} AS BIGINT) AS comp_lo,
       CAST(ml.l % {V} AS BIGINT) AS comp_hi
FROM eid JOIN ml ON ml.e = eid.e
ORDER BY eid.lo, eid.hi"""


def _sql_girth(cap: int = 8) -> str:
    """Exact girth of the simple undirected vsparse view whenever
    girth <= 2*cap+1 (0 if acyclic): BFS distance d(r,v) = MIN over
    <=cap-step walks, branch b(r,v) = MIN first hop over shortest
    paths, then the same candidate rule the engine applies
    (algorithms/girth.py): an undirected edge (u,w) proposes
    d(r,u)+d(r,w)+1 when d(r,u)=d(r,w) or the branches differ."""
    return f"""
WITH RECURSIVE edges AS MATERIALIZED ({derive.SQL_EDGES_VSPARSE}),
und AS MATERIALIZED (SELECT src AS u, dst AS v FROM edges
                     UNION SELECT dst, src FROM edges),
verts AS (SELECT DISTINCT u AS r FROM und),
walk(r, v, d, b) AS (
  SELECT r, r, 0, CAST(-1 AS BIGINT) FROM verts
  UNION
  SELECT w.r, und.v, w.d + 1,
         CASE WHEN w.d = 0 THEN und.v ELSE w.b END
  FROM walk w JOIN und ON und.u = w.v
  WHERE w.d < {cap}
),
dist AS (SELECT r, v, MIN(d) AS d FROM walk GROUP BY r, v),
br AS (SELECT w.r, w.v, MIN(w.b) AS b
       FROM walk w JOIN dist ON dist.r = w.r AND dist.v = w.v AND w.d = dist.d
       GROUP BY w.r, w.v),
st AS (SELECT dist.r, dist.v, dist.d, br.b
       FROM dist JOIN br ON br.r = dist.r AND br.v = dist.v),
ce AS (SELECT DISTINCT LEAST(u, v) AS lo, GREATEST(u, v) AS hi FROM und),
cand AS (SELECT MIN(su.d + sw.d + 1) AS g
         FROM ce
         JOIN st su ON su.v = ce.lo
         JOIN st sw ON sw.r = su.r AND sw.v = ce.hi
         WHERE su.d > 0 AND sw.d > 0 AND (su.d = sw.d OR su.b <> sw.b))
SELECT COALESCE(CAST(g AS BIGINT), 0) AS girth FROM cand"""


_SQL_CLIQUE_CTE = f"""
WITH RECURSIVE und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM ({derive.SQL_EDGES_SPARSE})),
verts AS MATERIALIZED (SELECT lo AS v FROM und UNION SELECT hi FROM und),
adj AS MATERIALIZED (SELECT lo AS a, hi AS b FROM und UNION ALL SELECT hi, lo FROM und),
cl AS (
  -- all cliques, grown in ascending vertex order (each clique built once)
  SELECT [v] AS members, v AS last FROM verts
  UNION
  SELECT list_append(c.members, u.hi), u.hi
  FROM cl c JOIN und u ON u.lo = c.last
  WHERE (SELECT COUNT(*) FROM adj a
         WHERE a.a = u.hi AND list_contains(c.members, a.b)) = len(c.members)
),
maxcl AS (
  -- maximal = no outside vertex adjacent to every member
  SELECT members FROM cl c
  WHERE NOT EXISTS (
    SELECT 1 FROM adj a
    WHERE list_contains(c.members, a.b) AND NOT list_contains(c.members, a.a)
    GROUP BY a.a
    HAVING COUNT(*) = len(c.members)))
"""

_SQL_MAXIMAL_CLIQUES = _SQL_CLIQUE_CTE + """
SELECT len(members) AS size, COUNT(*) AS n_cliques
FROM maxcl GROUP BY size ORDER BY size
"""

_SQL_LARGEST_CLIQUES = _SQL_CLIQUE_CTE + _SQL_LARGEST_CLIQUES_TMPL


def q_transitivity(sf_dir: str):
    from igraph_ray.ops.structural import transitivity_undirected

    t = transitivity_undirected(derive.graph_a(sf_dir), num_partitions=8)
    return pa.table({"transitivity_e9": pa.array([int(round(t * 1e9))], pa.int64())})


def q_cocitation(sf_dir: str):
    from igraph_ray.ops.structural import cocitation

    return cocitation(derive.graph_a(sf_dir), num_partitions=8)


def q_bibcoupling(sf_dir: str):
    from igraph_ray.ops.structural import bibcoupling

    return bibcoupling(derive.graph_a(sf_dir), num_partitions=8)


def q_neighbor_jaccard(sf_dir: str):
    from igraph_ray.ops.structural import neighbor_jaccard

    return neighbor_jaccard(derive.graph_a(sf_dir), num_partitions=8)


def q_dice(sf_dir: str):
    from igraph_ray.ops.structural import similarity_dice

    return similarity_dice(derive.graph_a(sf_dir), num_partitions=8)


def q_inv_log_weighted(sf_dir: str):
    from igraph_ray.ops.structural import similarity_inverse_log_weighted

    return similarity_inverse_log_weighted(derive.graph_a(sf_dir), num_partitions=8)


def q_knn_degree(sf_dir: str):
    from igraph_ray.ops.structural import avg_neighbor_degree

    return avg_neighbor_degree(derive.graph_a(sf_dir), num_partitions=8)


def q_knnk(sf_dir: str):
    from igraph_ray.ops.structural import knnk

    return knnk(derive.graph_a(sf_dir), num_partitions=8)


def q_diversity(sf_dir: str):
    from igraph_ray.ops.structural import diversity

    d = diversity(derive.graph_a_weighted(sf_dir), num_partitions=8)
    return _scale_col(d, "div", "div_e6", 1e6)


def q_neighborhood2(sf_dir: str):
    from igraph_ray.ops.structural import neighborhood_size2

    return neighborhood_size2(derive.graph_a(sf_dir), num_partitions=8)


def q_assortativity(sf_dir: str):
    from igraph_ray.ops.structural import degree_assortativity

    r = degree_assortativity(derive.graph_a(sf_dir), num_partitions=8)
    return pa.table({"assortativity_e9": pa.array([int(round(r * 1e9))], pa.int64())})


def q_assortativity_values(sf_dir: str):
    """igraph_assortativity with arbitrary vertex values (mixing.c:28):
    Pearson correlation of (value[src], value[dst]) over the directed
    edges_a view, values = md5-fold mod 1001 per vertex (integer-exact
    moments on both sides). Oracle = the same sums in SQL."""
    import hashlib

    from igraph_ray.ops.structural import assortativity_values

    g = derive.graph_a(sf_dir)

    def _vals(b: pa.Table) -> pa.Table:
        v = b["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
        val = np.array([int(hashlib.md5(f"av:{int(x)}".encode())
                            .hexdigest()[:8], 16) % 1001 for x in v],
                       np.int64)
        return pa.table({"vertex": pa.array(v), "value": pa.array(val)})

    vals = g.vertices().map_batches(_vals, batch_format="pyarrow",
                                    batch_size=None)
    r = assortativity_values(g, vals, directed=True, num_partitions=8)
    return pa.table({"assortativity_e9": pa.array([int(round(r * 1e9))],
                                                  pa.int64())})


def _sql_assortativity_values() -> str:
    fold = _sql_fold8("md5('av:' || CAST(verts.v AS VARCHAR))")
    return f"""
WITH edges AS MATERIALIZED (SELECT src, dst FROM ({derive.SQL_EDGES_A})
  WHERE src != dst),
verts AS ({derive.SQL_VERTS_A}),
vals AS (SELECT verts.v, CAST(({fold}) % 1001 AS DOUBLE) AS val FROM verts),
m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(a.val) AS sx,
             SUM(b.val) AS sy, SUM(a.val*a.val) AS sxx,
             SUM(b.val*b.val) AS syy, SUM(a.val*b.val) AS sxy
      FROM edges e JOIN vals a ON a.v = e.src JOIN vals b ON b.v = e.dst)
SELECT CAST(ROUND((sxy/n - (sx/n)*(sy/n)) /
  SQRT((sxx/n - (sx/n)*(sx/n)) * (syy/n - (sy/n)*(sy/n))) * 1e9) AS BIGINT)
  AS assortativity_e9 FROM m"""


def q_similarity_edges(sf_dir: str):
    """igraph_similarity_jaccard_es (similarity.c, edge-selector
    variant): the Jaccard endpoint similarity of every undirected
    sparse-view edge — one wedge join computes all co-neighbor counts,
    a hash-join keeps the edge pairs. Rows (lo, hi, inter, sim_e6),
    integer-exact. Oracle = the same common-neighbor counting in SQL."""
    from igraph_ray.ops.structural import similarity_over_edges

    g = derive.graph_sparse(sf_dir)
    return similarity_over_edges(g, method="jaccard",
                                 num_partitions=8).sort(["lo", "hi"])


def _sql_similarity_edges() -> str:
    return f"""
WITH und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM ({derive.SQL_EDGES_SPARSE}) WHERE src != dst),
sym AS MATERIALIZED (SELECT lo AS a, hi AS b FROM und
  UNION ALL SELECT hi, lo FROM und),
deg AS (SELECT a AS v, COUNT(*) AS d FROM sym GROUP BY a),
inter AS (SELECT s1.b AS lo, s2.b AS hi, COUNT(*) AS c
          FROM sym s1 JOIN sym s2 ON s2.a = s1.a AND s1.b < s2.b
          GROUP BY 1, 2)
SELECT u.lo, u.hi,
  CAST(COALESCE(i.c, 0) AS BIGINT) AS inter,
  CAST(COALESCE(i.c, 0) * 1000000
       // (du.d + dv.d - COALESCE(i.c, 0)) AS BIGINT) AS sim_e6
FROM und u
LEFT JOIN inter i ON i.lo = u.lo AND i.hi = u.hi
JOIN deg du ON du.v = u.lo JOIN deg dv ON dv.v = u.hi
ORDER BY u.lo, u.hi"""


def q_cliques_range(sf_dir: str):
    """igraph_cliques (cliques.c:260): counts of ALL cliques (not just
    maximal) per size 1..4 over the undirected sparse view — subset
    expansion of the maximal-clique stream with grouped dedup. Oracle:
    size 1 = vertices, 2 = simple edges, 3 = triangles (wedge join),
    4 = K4 (the motifs4 k4 join)."""
    from igraph_ray.algorithms.cliques import clique_count_by_size

    g = derive.graph_sparse(sf_dir)
    return clique_count_by_size(g, min_size=1, max_size=4,
                                num_partitions=8).sort("size")


def _sql_cliques_range() -> str:
    return f"""
WITH und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM ({derive.SQL_EDGES_SPARSE}) WHERE src != dst),
verts AS (SELECT DISTINCT v FROM
  (SELECT lo AS v FROM und UNION ALL SELECT hi FROM und)),
tri AS (SELECT u1.lo AS a, u1.hi AS b, u2.hi AS c
        FROM und u1 JOIN und u2 ON u2.lo = u1.hi
        JOIN und u3 ON u3.lo = u1.lo AND u3.hi = u2.hi),
k4 AS (SELECT COUNT(*) AS n FROM und e1
       JOIN und e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
       JOIN und e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
       JOIN und e4 ON e4.lo = e1.lo AND e4.hi > e2.hi
       JOIN und e5 ON e5.lo = e1.hi AND e5.hi = e4.hi
       JOIN und e6 ON e6.lo = e2.hi AND e6.hi = e4.hi)
SELECT CAST(size AS BIGINT) AS size, CAST(n_cliques AS BIGINT) AS n_cliques
FROM (
  SELECT 1 AS size, (SELECT COUNT(*) FROM verts) AS n_cliques
  UNION ALL SELECT 2, (SELECT COUNT(*) FROM und)
  UNION ALL SELECT 3, (SELECT COUNT(*) FROM tri)
  UNION ALL SELECT 4, (SELECT n FROM k4))
WHERE n_cliques > 0 ORDER BY size"""


def q_has_cycle(sf_dir: str):
    """igraph_is_dag via strong components on the superstep engine: a
    directed cycle exists iff some SCC has ≥2 vertices or a self-loop
    exists (components.c:164-316 gives the SCC partition; this replaces
    the O(depth) driver-side Kahn peel rounds flagged in round 1)."""
    g = derive.graph_a(sf_dir)
    n_loops = g.edges.filter(expr="src == dst").count()
    has = n_loops > 0
    if not has:
        st = strongly_connected_components(
            g, num_partitions=8, densify=False
        ).state
        has = int(component_sizes(st).max("csize")) > 1
    return pa.table({"has_cycle": pa.array([1 if has else 0], pa.int64())})


def q_st_maxflow(sf_dir: str):
    """s-t max-flow value + min cut on edges_a with deterministic integer
    capacities cap = (src*7 + dst*13) % 9 + 1 (flow.c:53 semantics,
    phase 1). Output is one row: the flow value, the size of the source
    side of the returned cut, and the cut's crossing capacity — duality
    (value == crossing) makes the row self-certifying even without a SQL
    oracle."""
    from igraph_ray.algorithms.flow import maxflow

    edges = derive.edges_a(sf_dir)

    def _cap(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False)
        dst = b["dst"].to_numpy(zero_copy_only=False)
        cap = ((src * 7 + dst * 13) % 9 + 1).astype(np.float64)
        return b.append_column("capacity", pa.array(cap, pa.float64()))

    cedges = edges.map_batches(_cap, batch_format="pyarrow", batch_size=None)
    res = maxflow(cedges, 0, V - 1, n=V, num_partitions=4)
    cut = set(res.cut_side_s.tolist())
    crossing = 0.0
    for b in cedges.iter_batches(batch_format="pyarrow"):
        src = b["src"].to_numpy(zero_copy_only=False)
        dst = b["dst"].to_numpy(zero_copy_only=False)
        cap = b["capacity"].to_numpy(zero_copy_only=False)
        in_s = np.isin(src, list(cut)) & ~np.isin(dst, list(cut))
        crossing += float(cap[in_s].sum())
    return pa.table({
        "maxflow_e9": pa.array([int(round(res.value * 1e9))], pa.int64()),
        "cut_size": pa.array([len(cut)], pa.int64()),
        "crossing_e9": pa.array([int(round(crossing * 1e9))], pa.int64()),
    })


def q_coreness(sf_dir: str):
    """Coreness per vertex via the h-operator fixpoint over the
    symmetrized multigraph view (cores.c:31 semantics)."""
    g = derive.graph_a(sf_dir)
    return coreness(g, num_partitions=8).state


def q_k_core(sf_dir: str):
    from igraph_ray.ops.structural import k_core

    ds = k_core(derive.graph_a(sf_dir), k=5, num_partitions=8)
    # return a typed Table: Ray cannot carry a 0-row schema through
    # to_pandas, and an empty 5-core is a legitimate result
    vs = [r["vertex"] for r in ds.take_all()]
    return pa.table({"vertex": pa.array(vs, pa.int64())})


# ------------------------------------------------------- training-data ops

def _docs(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def q_bridges(sf_dir: str):
    """Bridges of the undirected view of the very-sparse derived graph
    (deterministic seeded-XOR cover test; SQL oracle = per-candidate
    reachability avoiding the edge; exact pytest oracle too)."""
    from igraph_ray.algorithms.bridges import bridges

    return bridges(derive.graph_vsparse(sf_dir), num_partitions=8)


def q_two_ecc(sf_dir: str):
    """2-edge-connected component min-vertex labels (SQL oracle =
    min-label closure over non-bridge edges; pytest oracle too)."""
    from igraph_ray.algorithms.bridges import two_edge_connected_components

    return two_edge_connected_components(derive.graph_vsparse(sf_dir), num_partitions=8)


_TV_CACHE: Dict[str, object] = {}


def _tv_vsparse(sf_dir: str):
    """One Tarjan–Vishkin pipeline per sf_dir, shared by the
    articulation_points and biconnected_components queries (the
    auxiliary-graph construction dominates both)."""
    if sf_dir not in _TV_CACHE:
        from igraph_ray.algorithms.biconnected import _tarjan_vishkin

        g = derive.graph_vsparse(sf_dir)
        _TV_CACHE[sf_dir] = (g, _tarjan_vishkin(g, 8))
    return _TV_CACHE[sf_dir]


def q_articulation(sf_dir: str):
    """Articulation points of the undirected view of the very-sparse
    derived graph (igraph_articulation_points, components.c; SQL oracle
    = per-candidate neighbor reachability with the vertex removed)."""
    from igraph_ray.algorithms.biconnected import articulation_points

    g, tv = _tv_vsparse(sf_dir)
    return articulation_points(g, num_partitions=8, _tv=tv)


def q_biconn(sf_dir: str):
    """Biconnected components as per-edge labels = the lexicographically
    minimal member edge (igraph_biconnected_components, components.c;
    SQL oracle = min-label closure of the shared-vertex /
    endpoints-connected-without-it relation over edges)."""
    from igraph_ray.algorithms.biconnected import biconnected_components

    g, tv = _tv_vsparse(sf_dir)
    return biconnected_components(g, num_partitions=8, _tv=tv)


_WALK_STARTS = 64
_WALK_LEN = 20


def q_random_walks(sf_dir: str):
    """Deterministic random walks (igraph_random_walk analogue with a
    reproducible arithmetic draw — algorithms/walks.py) from the 64
    smallest vertices of the very-sparse derived digraph, 20 steps,
    truncating at sinks.  The SQL oracle replays the identical rule
    over ROW_NUMBER-ranked out-neighbors."""
    from igraph_ray.algorithms.walks import random_walks

    g = derive.graph_vsparse(sf_dir)
    starts = sorted(int(r["vertex"]) for r in g.vertices().take_all())
    return random_walks(g, starts[:_WALK_STARTS], _WALK_LEN,
                        num_partitions=8)


def q_random_walks_weighted(sf_dir: str):
    """Weight-proportional deterministic walks (igraph_random_walk's
    weighted analogue): the mixed draw runs mod the integer total
    strength and picks by cumulative weight in dst order."""
    from igraph_ray.algorithms.walks import random_walks

    g = derive.graph_vsparse_weighted(sf_dir)
    starts = sorted(int(r["vertex"]) for r in g.vertices().take_all())
    return random_walks(g, starts[:_WALK_STARTS], _WALK_LEN,
                        num_partitions=8, weighted=True)


def _sql_random_walks_weighted(nstarts: int = _WALK_STARTS,
                               length: int = _WALK_LEN) -> str:
    return f"""
WITH RECURSIVE we AS MATERIALIZED ({derive.SQL_EDGES_VSPARSE_W}),
verts AS (SELECT src AS v FROM we UNION SELECT dst FROM we),
ranked AS MATERIALIZED (
  SELECT src, dst, weight,
         SUM(weight) OVER (PARTITION BY src ORDER BY dst) AS cw,
         SUM(weight) OVER (PARTITION BY src) AS s
  FROM we),
starts AS MATERIALIZED (SELECT DISTINCT v FROM verts ORDER BY v LIMIT {nstarts}),
walk(w, step, v) AS (
  SELECT v, 0, v FROM starts
  UNION ALL
  SELECT wk.w, wk.step + 1, rk.dst
  FROM walk wk JOIN ranked rk ON rk.src = wk.v
  AND ((wk.w % 1048576) * 9973 + wk.step * 7919
       + (wk.v % 1048576) * 104729) % rk.s >= rk.cw - rk.weight
  AND ((wk.w % 1048576) * 9973 + wk.step * 7919
       + (wk.v % 1048576) * 104729) % rk.s < rk.cw
  WHERE wk.step < {length}
)
SELECT w AS walk, step, v AS vertex FROM walk ORDER BY walk, step"""


def _sql_random_walks(nstarts: int = _WALK_STARTS,
                      length: int = _WALK_LEN) -> str:
    return f"""
WITH RECURSIVE edges AS MATERIALIZED ({derive.SQL_EDGES_VSPARSE}),
verts AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
ranked AS MATERIALIZED (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS r,
         COUNT(*) OVER (PARTITION BY src) AS deg
  FROM edges),
starts AS MATERIALIZED (SELECT DISTINCT v FROM verts ORDER BY v LIMIT {nstarts}),
walk(w, step, v) AS (
  SELECT v, 0, v FROM starts
  UNION ALL
  SELECT wk.w, wk.step + 1, rk.dst
  FROM walk wk JOIN ranked rk ON rk.src = wk.v
  AND rk.r = ((wk.w % 1048576) * 9973 + wk.step * 7919
              + (wk.v % 1048576) * 104729) % rk.deg
  WHERE wk.step < {length}
)
SELECT w AS walk, step, v AS vertex FROM walk ORDER BY walk, step"""


def q_girth(sf_dir: str):
    """Girth of the simple undirected view of the very-sparse derived
    graph (igraph_girth, structural_properties.c; 0 if acyclic).  SQL
    oracle = the same distance + min-first-hop-branch candidate rule,
    with BFS distances from a bounded walk-enumeration CTE (exact
    whenever girth <= 2*cap+1; cap=8 covers any cycle <= 17)."""
    from igraph_ray.algorithms.girth import girth

    g = girth(derive.graph_vsparse(sf_dir), num_partitions=8)
    return pa.table({"girth": pa.array([g], pa.int64())})


def q_mst(sf_dir: str):
    """Minimum spanning forest (spanning_trees.c:78-86 semantics, Borůvka
    execution) of the undirected weighted view of edges_a; deterministic
    via the total edge order (weight, lo, hi)."""
    from igraph_ray.algorithms.mst import minimum_spanning_forest

    msf = minimum_spanning_forest(derive.edges_a_weighted(sf_dir),
                                  weight_col="weight", num_partitions=8)
    return _scale_col(msf, "weight", "weight", 1.0)  # integral 1..10 → int64


def q_mst_unweighted(sf_dir: str):
    """Unweighted spanning forest (igraph_minimum_spanning_tree_unweighted,
    spanning_trees.c:40-76 semantics: any spanning forest; deterministic
    here by the (1, lo, hi) Borůvka total order)."""
    from igraph_ray.algorithms.mst import minimum_spanning_forest

    msf = minimum_spanning_forest(derive.edges_a(sf_dir),
                                  weight_col=None, num_partitions=8)
    return _scale_col(msf, "weight", "weight", 1.0)


def q_exact_dedup(sf_dir: str):
    return dd.exact_dedup(_docs(sf_dir))


def q_token_count(sf_dir: str):
    return tx.token_count(_docs(sf_dir))


def q_text_stats(sf_dir: str):
    qs = tx.quality_score(_docs(sf_dir)).select_columns(
        ["doc_id", "n_chars", "n_words", "punct_ratio"]
    )
    return _scale_col(qs, "punct_ratio", "punct_ratio_e6", 1e6)


def q_lang_id(sf_dir: str):
    return tx.language_id(_docs(sf_dir))


def q_fingerprint(sf_dir: str):
    return tx.fingerprint(_docs(sf_dir), window=8)


def q_pii_counts(sf_dir: str):
    """Per-doc PII-surface counts (emails / URLs / IPv4) — RE2
    leftmost-non-overlapping counts on both sides (pyarrow
    count_substring_regex and DuckDB regexp_extract_all are both RE2)."""
    return tx.pii_counts(_docs(sf_dir))


def q_clean_dup_spans(sf_dir: str):
    """Substring-dedup applied: text with every corpus-duplicated
    5-token window removed (all copies — see
    ops/dedup.py remove_duplicated_spans), whitespace-canonicalized."""
    return dd.remove_duplicated_spans(_docs(sf_dir), l=5).sort("doc_id")


def q_minhash_pairs(sf_dir: str):
    return dd.minhash_lsh_pairs(_docs(sf_dir))


def q_dup_spans(sf_dir: str):
    """Exact-substring duplication spans (Lee et al. ACL 2022 variant):
    maximal token spans covered by 5-token windows occurring >= 2 times
    corpus-wide, as (doc_id, span_start, span_end) 0-based end-exclusive
    token positions — the removal mask for substring-level dedup."""
    return dd.duplicated_spans(_docs(sf_dir), l=5).sort(
        ["doc_id", "span_start"])


def q_simhash(sf_dir: str):
    ds = dd.simhash(_docs(sf_dir))

    def _f(b: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": b["doc_id"],
             "simhash": pc.cast(b["simhash"], pa.int64(), safe=False)}
        )

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=None)


def q_ngram_dups(sf_dir: str):
    out = dd.ngram_jaccard_pairs(_docs(sf_dir), threshold=0.8)
    return _scale_col(out, "jaccard", "jaccard_e6", 1e6)


def q_event_type_count(sf_dir: str):
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
    g = ev.groupby("event_type").count()

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b["event_type"], "n": b["count()"]})

    return g.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def q_hopping(sf_dir: str):
    """Overlapping (hopping) 60-minute windows on a 15-minute hop: each
    event expands into its 4 containing windows task-side, value sums
    integer-quantized e6 (ops.window.hopping_window)."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    return win.hopping_window(ev, size_minutes=60, hop_minutes=15)


def q_tumbling(sf_dir: str):
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    out = win.tumbling_window(ev, minutes=60)
    return _scale_col(out, "value_sum", "value_sum_e6", 1e6)


def q_sessions(sf_dir: str):
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    return win.sessionize(ev, gap_minutes=30)


def _events_keyed(sf_dir: str) -> ray.data.Dataset:
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"])

    def _p(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "ts_us": pc.cast(b["ts"], pa.int64()),
            "event_id": b["event_id"],
            "value_e6": pc.cast(pc.round(pc.multiply(b["value"], 1e6)),
                                pa.int64())})

    return ev.map_batches(_p, batch_format="pyarrow", batch_size=None)


def q_asof_prev_event(sf_dir: str):
    """Self as-of join: each event matched to the same user's most
    recent STRICTLY earlier event (ops.joins.asof_join, one
    boundary-aligned range exchange + vectorized forward-fill)."""
    from igraph_ray.ops.joins import asof_join

    L = _events_keyed(sf_dir)

    def _r(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"], "ts_us": b["ts_us"],
                         "prev_event_id": b["event_id"],
                         "prev_value_e6": b["value_e6"]})

    R = _events_keyed(sf_dir).map_batches(
        _r, batch_format="pyarrow", batch_size=None)
    return asof_join(L, R, by="user_id", on="ts_us",
                     left_cols=["event_id", "value_e6"],
                     right_cols=["prev_event_id", "prev_value_e6"],
                     strict=True)


def q_asof_order(sf_dir: str):
    """Backward as-of join events -> orders on the customer key: each
    event picks the matching customer's latest order at or before the
    event time. The right side is pre-aggregated per (custkey, date)
    so the match is unique (the SQL ASOF determinism contract)."""
    from ray.data.aggregate import Max, Sum

    from igraph_ray.ops.joins import asof_join

    L = _events_keyed(sf_dir).drop_columns(["value_e6"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"])

    def _o(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["o_custkey"],
            "ts_us": pc.cast(b["o_orderdate"], pa.int64()),
            "o_orderkey": b["o_orderkey"],
            "tp_e2": pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                             pa.int64())})

    g = (orders.map_batches(_o, batch_format="pyarrow", batch_size=None)
         .groupby(["user_id", "ts_us"])
         .aggregate(Max("o_orderkey"), Sum("tp_e2")))

    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "ts_us": pa.array([], pa.int64()),
                             "prev_orderkey": pa.array([], pa.int64()),
                             "prev_total_e2": pa.array([], pa.int64())})
        return pa.table({"user_id": b["user_id"], "ts_us": b["ts_us"],
                         "prev_orderkey": b["max(o_orderkey)"],
                         "prev_total_e2": b["sum(tp_e2)"]})

    R = g.map_batches(_rn, batch_format="pyarrow", batch_size=None)
    return asof_join(L, R, by="user_id", on="ts_us",
                     left_cols=["event_id"],
                     right_cols=["prev_orderkey", "prev_total_e2"])


def q_doclen_quantiles(sf_dir: str):
    """Exact discrete quantiles of the document-length column via the
    histogram partial-aggregate (ops.stats.exact_quantiles — the full
    column is never sorted, only the (value, count) histogram moves)."""
    from igraph_ray.ops.stats import exact_quantiles

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["n_chars"])
    return exact_quantiles(docs, "n_chars",
                           [0.1, 0.25, 0.5, 0.75, 0.9, 0.99])


def q_doclen_percentile_filter(sf_dir: str):
    """Percentile-cutoff curation: keep documents at or above the 25th
    length percentile (ops.stats.quantile_threshold_filter — exact
    quantile from the histogram, then one broadcast-scalar filter)."""
    from igraph_ray.ops.stats import quantile_threshold_filter

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    return quantile_threshold_filter(docs, "n_chars", 0.25,
                                     out_cols=["doc_id", "n_chars"])


def q_jsonl_docs(sf_dir: str):
    """documents routed through a JSONL write -> read round trip
    (sources.jsonl over Ray Data's native JSON shards), then
    md5-hashed — proves byte-identical text interchange against a
    DuckDB md5 oracle over the original parquet."""
    import tempfile

    from igraph_ray.sources.jsonl import read_jsonl, write_jsonl

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        write_jsonl(docs, td)
        back = read_jsonl(td, columns=["doc_id", "text", "lang"],
                          int_cols=["doc_id"])

        import hashlib

        def _h(b: pa.Table) -> pa.Table:
            hs = [hashlib.md5(t.encode()).hexdigest()
                  for t in b["text"].to_pylist()]
            return pa.table({"doc_id": b["doc_id"],
                             "text_md5": pa.array(hs, pa.string()),
                             "lang": b["lang"]})

        return back.map_batches(_h, batch_format="pyarrow",
                                batch_size=None).materialize()


def q_modularity_matrix(sf_dir: str):
    """igraph_modularity_matrix (community.c:947): exact-integer
    upper-triangle export b_num = A_ij·2m − k_i·k_j over graph A's
    undirected simplification (algorithms.modularity.modularity_matrix
    — broadcast degree/edge-key vectors, O(n²) row space streamed;
    dense by nature, guarded)."""
    from igraph_ray.algorithms.modularity import modularity_matrix

    return modularity_matrix(derive.edges_a(sf_dir), n=512)


def q_correlated_pair(sf_dir: str):
    """igraph_correlated_game (games.c:3905): the correlated-G(n,p)
    second graph over a 50-vertex md5 base draw — keep prob q, add
    prob (1−q)p/(1−p), exact e6 rational thresholds, full SQL
    replay."""
    from igraph_ray.sources.games import correlated_game

    return correlated_game(50, p_e6=200_000, corr_e6=500_000,
                           seed=37).materialize()


def q_growing_random(sf_dir: str):
    """igraph_growing_random_game (games.c:1318), non-citation mode:
    step i adds m=2 edges (U(0,i), 1+U(0,i-1)) — indexed md5 draws,
    embarrassingly parallel, full SQL replay."""
    from igraph_ray.sources.games import growing_random_game

    return growing_random_game(60, m=2, citation=False,
                               seed=23).materialize()


def q_islands(sf_dir: str):
    """igraph_simple_interconnected_islands_game (games.c:3345): four
    12-vertex G(n, 0.3) islands + 2 md5-drawn inter edges per island
    pair (independent-Bernoulli deviation documented in
    sources/games.py)."""
    from igraph_ray.sources.games import islands_game

    return islands_game(4, 12, pin_e6=300_000, n_inter=2,
                        seed=29).materialize()


def q_grg(sf_dir: str):
    """igraph_grg_game (geometric random graph): 300 md5-placed points
    on the 2^20 integer grid, connected iff dx²+dy² < R² — found by
    the grid-cell spatial join (3×3 probe neighborhood + one
    equi-join), never all pairs (sources.games.grg_game)."""
    from igraph_ray.sources.games import grg_game

    return grg_game(300, radius_e6=80_000, seed=31).materialize()


def q_full_citation(sf_dir: str):
    """igraph_full_citation (structure_generators.c:1078): directed
    i → j for every j < i, closed form per vertex."""
    from igraph_ray.sources.structures import full_citation

    return full_citation(40).materialize()


def q_chordal_ring(sf_dir: str):
    """igraph_extended_chordal_ring (structure_generators.c:1188):
    15-ring + per-vertex chords from the 3×3 offset matrix (period 3,
    non-wrapping rule), emitted in the reference's construction
    order."""
    from igraph_ray.sources.structures import extended_chordal_ring

    return extended_chordal_ring(
        15, [[3, 5, 7], [4, 6, 8], [5, 7, 9]]).materialize()


def q_kautz(sf_dir: str):
    """igraph_kautz (structure_generators.c:1478): K(2,2) — 12
    no-repeat strings of length 3 over 3 symbols, ids by lexicographic
    rank, arcs u → shift(u)·c for c != last(u); pure digit algebra per
    vertex against a definitional string-enumeration SQL oracle."""
    from igraph_ray.sources.structures import kautz

    return kautz(2, 2).materialize()


def q_running_mean(sf_dir: str):
    """igraph_running_mean (other.c:38): width-5 sliding mean of the
    event value vector in event_id order. Distributed shape: the dense
    index comes from dense_rank_map, each element expands task-side
    into the 5 windows it belongs to (the hopping-window trick), ONE
    groupby sums them, and full windows emit mean_e6 = sum_e6 // 5
    (integer-exact on both sides)."""
    from ray.data.aggregate import Count, Sum

    from igraph_ray.util import dense_rank_map, hash_join

    W = 5
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"])
    ranked = dense_rank_map(ev.select_columns(["event_id"]), "event_id")
    j = hash_join(ev, ranked, on="event_id")

    def _expand(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "rank" not in b.column_names:
            return pa.table({"idx": pa.array([], pa.int64()),
                             "v6": pa.array([], pa.int64())})
        r = b["rank"].to_numpy(zero_copy_only=False)
        v6 = np.round(b["value"].to_numpy(zero_copy_only=False)
                      * 1e6).astype(np.int64)
        rows = np.repeat(np.arange(b.num_rows), W)
        off = np.tile(np.arange(W, dtype=np.int64), b.num_rows)
        starts = r[rows] - off
        keep = starts >= 0
        return pa.table({"idx": pa.array(starts[keep]),
                         "v6": pa.array(v6[rows][keep])})

    g = (j.map_batches(_expand, batch_format="pyarrow", batch_size=None)
         .groupby("idx").aggregate(Sum("v6"), Count()))

    def _fin(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "idx" not in b.column_names:
            return pa.table({"idx": pa.array([], pa.int64()),
                             "mean_e6": pa.array([], pa.int64())})
        full = pc.equal(b["count()"], W)
        t = b.filter(full)
        s = t["sum(v6)"].to_numpy(zero_copy_only=False)
        return pa.table({"idx": t["idx"],
                         "mean_e6": pa.array(s // W)})

    return g.map_batches(_fin, batch_format="pyarrow", batch_size=None)


def q_tokenize_ids(sf_dir: str):
    """Tokenize every document against the corpus vocabulary:
    (doc_id, pos, token_id) with dense lexicographic ids — the
    vocabulary is the distributed zip-with-index (dense_rank_map), the
    lookup is one broadcast hash join (ops.text.token_vocabulary +
    tokenize_to_ids)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    vocab = tx.token_vocabulary(docs)
    return tx.tokenize_to_ids(docs, vocab)


def q_cap_per_source(sf_dir: str):
    """Cap every source at 10 documents, deterministically (the
    "at most N pages per domain" curation rule): kept set = the 10
    smallest (md5-fold(doc_id), doc_id) keys per source — grouped
    top-k with a per-batch combiner + one boundary-aligned exchange
    (ops.curation.cap_per_group)."""
    from igraph_ray.ops import curation as cu2

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    return cu2.cap_per_group(docs, n=10, group_col="source")


def q_power_law_fit(sf_dir: str):
    """Clauset–Shalizi–Newman power-law fit of graph A's out-degree
    distribution (igraph_power_law_fit, other.c:246): KS-optimal xmin
    sweep + discrete-approximation MLE, all on the (degree, count)
    histogram (algorithms.plfit — one groupby, the degree column never
    leaves the workers unaggregated)."""
    from igraph_ray.algorithms.plfit import power_law_fit

    g = derive.graph_a(sf_dir)
    return power_law_fit(g.out_degrees(), col="deg", discrete=True)


def q_prepare_corpus(sf_dir: str):
    """Flagship end-to-end training-corpus preparation: the curate
    decision (quality ∪ dup-keeper ∪ contamination bits) keeps a
    document set, kept documents are context-window chunked
    (256/64 overlap), and the output is the per-document packing
    manifest (doc_id, n_chars, n_chunks). One streaming composition
    of ops.curation.curate + ops.text.chunk_documents — the kept-id
    set rides a broadcast semi-join, nothing materializes the corpus."""
    from igraph_ray.util import hash_join

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    dec = cu.curate(_docs(sf_dir))

    def _kept(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "doc_id" not in b.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        return pa.table(
            {"doc_id": b.filter(pc.equal(b["kept"], 1))["doc_id"]})

    kept_docs = hash_join(docs, dec, on="doc_id",
                          join_type="left_semi", right_map=_kept)
    chunks = tx.chunk_documents(kept_docs, size_chars=256, overlap=64,
                                hash_chunks=True)

    def _len(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "doc_id" not in b.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_chars": pa.array([], pa.int64())})
        return pa.table({
            "doc_id": b["doc_id"],
            "n_chars": pc.cast(pc.utf8_length(b["text"]), pa.int64())})

    from ray.data.aggregate import Max, Sum

    g = (chunks.map_batches(
            lambda b: pa.table({"doc_id": b["doc_id"],
                                "one": pa.array(
                                    np.ones(b.num_rows, np.int64))})
            if b.num_rows and "doc_id" in b.column_names
            else pa.table({"doc_id": pa.array([], pa.int64()),
                           "one": pa.array([], pa.int64())}),
            batch_format="pyarrow", batch_size=None)
         .groupby("doc_id").aggregate(Sum("one")))

    lens = kept_docs.map_batches(_len, batch_format="pyarrow",
                                 batch_size=None)

    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "doc_id" not in b.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_chunks": pa.array([], pa.int64())})
        return pa.table({"doc_id": b["doc_id"],
                         "n_chunks": pc.cast(b["sum(one)"], pa.int64())})

    return hash_join(lens, g, on="doc_id", lazy_left=True, right_map=_rn)


def q_negative_sample(sf_dir: str):
    """k=4 uniform negatives per distinct (user, item%199) positive
    pair from the event stream — the two-tower/word2vec training-data
    primitive, indexed-md5 drawn so the sample is reproducible at any
    parallelism and replayable verbatim in SQL
    (ops.curation.negative_sample)."""
    from igraph_ray.ops import curation as cu

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id"])

    def _p(b: pa.Table) -> pa.Table:
        e = b["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({"uid": b["user_id"],
                         "item": pa.array((e % 199).astype(np.int64))})

    pairs = (ev.map_batches(_p, batch_format="pyarrow", batch_size=None)
             .groupby(["uid", "item"]).count()
             .select_columns(["uid", "item"]))
    return cu.negative_sample(pairs, num_items=199, k=4, seed=17,
                              user_col="uid", item_col="item")


def q_embedding_covariance(sf_dir: str):
    """Upper-triangle sample covariance of the embedding column, e6
    integer-quantized — one streaming pass of per-batch XᵀX partials
    (ops.similarity.embedding_covariance); d×d algebra in one task."""
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    return sim.embedding_covariance(emb)


def q_pca_project(sf_dir: str):
    """Top-2 PCA projection of every embedding (sign-canonical
    components from the one-pass covariance; projection is one matmul
    per batch against the broadcast 64×2 component matrix). Iterative
    eigensolve-free but eigenvector-based — rows-only by nature;
    exactness vs numpy's full eigh is pytest-checked."""
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = sim.pca_project(emb, k=2)
    return _scale_col(_scale_col(out, "pc0", "pc0_e6", 1e6),
                      "pc1", "pc1_e6", 1e6)


def q_chunk_docs(sf_dir: str):
    """Context-window chunking of the corpus: overlapping 256-char
    windows with a 64-char overlap, chunk text md5-compacted
    (ops.text.chunk_documents — one arrow slice kernel per chunk
    index over the whole batch, no per-row string Python)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return tx.chunk_documents(docs, size_chars=256, overlap=64,
                              hash_chunks=True)


def q_range_window_join(sf_dir: str):
    """Range (interval) join: every pair of same-user events within a
    forward one-hour window — each event's [ts, ts+1h) interval joined
    against event points via bucket expansion + ONE equi-join
    (ops.joins.range_join)."""
    from igraph_ray.ops.joins import range_join

    ev = _events_keyed(sf_dir).drop_columns(["value_e6"])

    def _pts(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"], "ts_us": b["ts_us"],
                         "pid": b["event_id"]})

    def _ivs(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"], "lo_us": b["ts_us"],
                         "hi_us": pc.add(b["ts_us"], 3_600_000_000),
                         "iid": b["event_id"]})

    P = ev.map_batches(_pts, batch_format="pyarrow", batch_size=None)
    I = ev.map_batches(_ivs, batch_format="pyarrow", batch_size=None)
    return range_join(P, I, on="ts_us", lo="lo_us", hi="hi_us",
                      by="user_id", point_cols=["pid"],
                      interval_cols=["iid"])


def _knn_common(sf_dir: str, fn):
    import pyarrow.parquet as pq

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_by("vec_id").slice(0, KNN_QUERIES)
    queries = np.array(qt["embedding"].to_pylist(), dtype=np.float64)
    qids = np.array(qt["vec_id"].to_pylist(), dtype=np.int64)
    out = fn(emb, queries)

    def _remap(b: pa.Table) -> pa.Table:
        qi = b["query_id"].to_numpy(zero_copy_only=False)
        t = b.drop_columns(["query_id"])
        return t.append_column("query_id", pa.array(qids[qi], pa.int64()))

    return _scale_col(
        out.map_batches(_remap, batch_format="pyarrow", batch_size=None), "score", "score_e6", 1e6
    )


def q_knn(sf_dir: str):
    return _knn_common(sf_dir, lambda emb, q: sim.brute_force_topk(emb, q, k=KNN_K))


def q_lsh_knn(sf_dir: str):
    return _knn_common(
        sf_dir, lambda emb, q: sim.lsh_topk(emb, q, k=KNN_K, num_planes=8)
    )


def q_ivf_knn(sf_dir: str):
    """IVF coarse-quantizer ANN (similarity.ivf_topk): approximate by
    design → rows-only; the ≥90% recall gate lives in
    tests/test_training_ops.py::test_similarity_ivf_recall."""
    return _knn_common(
        sf_dir, lambda emb, q: sim.ivf_topk(emb, q, k=KNN_K, nlist=16,
                                            nprobe=6)
    )


def q_kmeans_clusters(sf_dir: str):
    """Spherical k-means topic clustering of the embeddings table
    (similarity.kmeans_clusters — the IVF coarse quantizer as a
    first-class curation pipeline): (vec_id, cluster, score_e6).
    Approximate/iterative by design → rows-only; determinism,
    planted-blob recovery and assignment-optimality are pytest-gated
    in tests/test_training_ops.py."""
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    out = sim.kmeans_clusters(emb, nlist=16)
    return _scale_col(out, "score", "score_e6", 1e6).sort("vec_id")


def q_embedding_near_dups(sf_dir: str):
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = sim.embedding_near_dups(emb, threshold=0.35)
    return _scale_col(out, "score", "score_e6", 1e6)


def q_embedding_near_dups_lsh(sf_dir: str):
    """Banded random-hyperplane LSH scale path (exact=False): candidate
    recall < 1 by design, so no SQL oracle — the recall floor (≥95% of
    the exact pairs on a planted fixture) is asserted in
    tests/test_training_ops.py."""
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = sim.embedding_near_dups(
        emb, threshold=0.35, exact=False, num_planes=4, num_bands=8
    )
    return _scale_col(out, "score", "score_e6", 1e6)


def q_k_truss(sf_dir: str):
    """4-truss of the sparse undirected view: edges in ≥2 triangles of
    the peeled subgraph, support recomputed per round to fixpoint
    (trussness family; oracle = unrolled per-round SQL peel)."""
    from igraph_ray.ops.structural import k_truss

    res = k_truss(derive.graph_sparse(sf_dir), k=4, num_partitions=8)
    if res.count() == 0:
        # ray.data.Dataset.to_pandas() drops the schema of an empty
        # dataset; hand the driver a schema-stable empty Arrow table
        return pa.table({"lo": pa.array([], pa.int64()),
                         "hi": pa.array([], pa.int64())})
    return res


def _sql_k_truss(k: int = 4, iters: int = 6) -> str:
    base = (f"SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi "
            f"FROM ({derive.SQL_EDGES_SPARSE})")
    parts = [f"t0 AS MATERIALIZED ({base})"]
    for i in range(iters):
        parts.append(
            f"s{i} AS (SELECT lo AS a, hi AS b FROM t{i} "
            f"UNION ALL SELECT hi, lo FROM t{i})")
        parts.append(
            f"c{i} AS (SELECT u.lo, u.hi, COUNT(*) AS tri FROM t{i} u "
            f"JOIN s{i} x ON x.a = u.lo JOIN s{i} y ON y.a = u.hi AND y.b = x.b "
            f"GROUP BY u.lo, u.hi)")
        parts.append(
            f"t{i+1} AS MATERIALIZED (SELECT u.lo, u.hi FROM t{i} u "
            f"JOIN c{i} c ON c.lo = u.lo AND c.hi = u.hi WHERE c.tri >= {k-2})")
    return "WITH " + ",\n".join(parts) + f"\nSELECT lo, hi FROM t{iters}"


def q_edge_clustering(sf_dir: str):
    """Per-edge clustering coefficient components (igraph_ecc k=3,
    properties/ecc.c): tri = triangles through the edge, denom =
    min(deg)−1 — exact integers on the sparse undirected view."""
    from igraph_ray.ops.structural import edge_clustering

    return edge_clustering(derive.graph_sparse(sf_dir), num_partitions=8)


def q_centralization_degree(sf_dir: str):
    """Degree-centralization ingredients (igraph_centralization_degree,
    centralization.c: sum of max−deg over vertices): exact integers
    (n, max_deg, sum_diff) over out-degrees of the derived digraph; the
    normalized score is sum_diff/((n−1)²) for out-degree."""
    g = derive.graph_a(sf_dir)
    deg = g.out_degrees().materialize()
    n = deg.count()
    mx = int(deg.max("deg"))
    total = int(deg.sum("deg"))
    return pa.table({"n": pa.array([n], pa.int64()),
                     "max_deg": pa.array([mx], pa.int64()),
                     "sum_diff": pa.array([n * mx - total], pa.int64())})


def q_global_efficiency(sf_dir: str):
    """Directed global efficiency (igraph_global_efficiency,
    structural_properties.c family): mean of 1/d over ordered vertex
    pairs, unreachable pairs contributing 0. Kept integer-exact on both
    sides: eff_num = Σ_d count_d · (10¹² // d), ordered_pairs = n(n−1);
    efficiency = eff_num / (10¹² · ordered_pairs)."""
    g = derive.graph_a(sf_dir)
    h = path_length_hist(g, num_partitions=8, chunk=128)
    ht = h if isinstance(h, pa.Table) else pa.concat_tables(
        [b for b in h.iter_batches(batch_format="pyarrow")])
    d = ht["dist"].to_numpy(zero_copy_only=False)
    c = ht["count"].to_numpy(zero_copy_only=False)
    n = g.num_vertices()
    eff_num = int(np.sum(c * (10**12 // d)))
    return pa.table({"ordered_pairs": pa.array([n * (n - 1)], pa.int64()),
                     "eff_num": pa.array([eff_num], pa.int64())})


# deterministic stratified-sampling rates used by the query + oracle
SAMPLE_RATES = {"en": 600, "de": 300}
SAMPLE_DEFAULT = 250


def q_dedup_clusters(sf_dir: str):
    """Near-dup resolution: embedding cosine pairs (≥0.35, the hash-green
    pair predicate) → connected components → min-id keeper + cluster
    size. Oracle = recursive-CTE transitive closure of the same pairs."""
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    pairs = sim.embedding_near_dups(emb, threshold=0.35)
    return cu.dedup_clusters(pairs)


def q_dup_ngrams(sf_dir: str):
    """Gopher duplicate-3-gram fraction per document (Rae et al. 2021
    A1.1) as exact integers over the documents table."""
    from igraph_ray.ops.curation import dup_ngram_stats

    return dup_ngram_stats(_docs(sf_dir), n=3).sort("doc_id")


def q_word_stats(sf_dir: str):
    return cu.word_stats(_docs(sf_dir))


def q_lm_surprisal(sf_dir: str):
    """CCNet-style corpus-bigram LM scoring (ops/curation.lm_surprisal):
    per doc the exact integer sum of (c(w1,·) << 20) // c(w1,w2) over
    its bigrams — 2^20/p(w2|w1) under integer division, monotone in
    perplexity. Oracle = the identical window-function bigram counts
    and integer arithmetic in SQL."""
    return cu.lm_surprisal(_docs(sf_dir)).sort("doc_id")


def _sql_lm_surprisal() -> str:
    return r"""
WITH t AS (SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok,
             generate_subscripts(
               regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
           FROM documents),
bg AS (SELECT doc_id, tok AS w1,
              lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
       FROM t),
bg2 AS (SELECT * FROM bg WHERE w2 IS NOT NULL),
bc AS (SELECT w1, w2, COUNT(*) AS cb FROM bg2 GROUP BY 1, 2),
uc AS (SELECT w1, SUM(cb) AS cu FROM bc GROUP BY 1),
sc AS (SELECT g.doc_id,
              SUM((uc.cu * 1048576) // bc.cb) AS ssum,
              COUNT(*) AS nb
       FROM bg2 g JOIN bc ON bc.w1 = g.w1 AND bc.w2 = g.w2
       JOIN uc ON uc.w1 = g.w1
       GROUP BY g.doc_id)
SELECT d.doc_id,
  CAST(COALESCE(sc.nb, 0) AS BIGINT) AS n_bigrams,
  CAST(COALESCE(sc.ssum, 0) AS BIGINT) AS surprisal_sum,
  CAST(CASE WHEN COALESCE(sc.nb, 0) > 0 THEN sc.ssum // sc.nb
       ELSE 0 END AS BIGINT) AS mean_surprisal
FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
ORDER BY d.doc_id"""


def q_token_cms(sf_dir: str):
    """Count-Min sketch (4×64) of the corpus token frequencies — exact
    integer counters (see ops.curation.token_cms)."""
    return cu.token_cms(_docs(sf_dir))


def q_vocab_sketch(sf_dir: str):
    """HyperLogLog vocabulary-size sketch per language (exact registers
    of the distinct-token set; see ops.curation.token_hll)."""
    return cu.token_hll(_docs_lang(sf_dir))


def _docs_lang(sf_dir: str):
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])


def q_curate(sf_dir: str):
    """End-to-end curation decision per document: quality rules ∪
    exact-dup non-keeper ∪ benchmark contamination, as one reason
    bitmask (see ops.curation.curate)."""
    return cu.curate(_docs(sf_dir))


def q_quality_filter(sf_dir: str):
    """Composite Gopher-style keep/drop decision per document with the
    triggering rules as exact-integer reason bits."""
    return cu.quality_filter(_docs(sf_dir))


def q_ngram_contamination(sf_dir: str):
    """Benchmark decontamination: per-document 5-gram overlap counts
    against the broadcast shingle set of the doc_id%10==0 "benchmark"
    subset (exact-integer counts; no corpus shuffle)."""
    return cu.ngram_contamination(_docs(sf_dir), benchmark_mod=10, n=5) \
        .sort("doc_id")


def q_top_terms(sf_dir: str):
    return cu.top_terms(_docs(sf_dir), k=3)


def q_stratified_sample(sf_dir: str):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return cu.stratified_sample(
        docs, SAMPLE_RATES, default_permille=SAMPLE_DEFAULT
    )


def q_corpus_extract(sf_dir: str):
    """Corpus → planted edges, scaled by sf via lineitem row count (no
    SQL oracle — validated exactly in pytest against the planted graph)."""
    from igraph_ray.sources.corpus import extract_edges, generate_corpus

    n_li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]).count()
    n_repos = max(50, min(2000, n_li // 30))
    rng = np.random.default_rng(42)
    m = n_repos * 4
    src = rng.integers(0, n_repos, m)
    dst = rng.integers(0, n_repos, m)
    corpus, _ = generate_corpus(src, dst, n_repos=n_repos, seed=42)
    edges, _ = extract_edges(ray.data.from_arrow(corpus), num_partitions=4)
    return edges.groupby(["src", "dst"]).count()


# ================================================================ SQL side

def _sql_pagerank(iters: int = PR_ITERS, d: float = DAMPING) -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({SQL_EDGES_A})",
        f"verts AS MATERIALIZED ({SQL_VERTS_A})",
        "deg AS MATERIALIZED (SELECT v, (SELECT COUNT(*) FROM edges e WHERE e.src = verts.v) AS outdeg FROM verts)",
        "params AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)",
        "pr0 AS MATERIALIZED (SELECT v, 1.0/(SELECT n FROM params) AS r FROM verts)",
    ]
    for k in range(1, iters + 1):
        p = f"pr{k-1}"
        parts.append(
            f"base{k} AS MATERIALIZED (SELECT ((1-{d}) + {d}*COALESCE((SELECT SUM(p.r) FROM {p} p "
            f"JOIN deg dd ON dd.v = p.v WHERE dd.outdeg = 0), 0))/(SELECT n FROM params) AS b)"
        )
        parts.append(
            f"pr{k} AS MATERIALIZED (SELECT dgt.v, (SELECT b FROM base{k}) + {d} * COALESCE(m.s, 0) AS r "
            f"FROM deg dgt LEFT JOIN ("
            f"SELECT e.dst AS v, SUM(p.r/dd.outdeg) AS s FROM edges e "
            f"JOIN {p} p ON p.v = e.src JOIN deg dd ON dd.v = e.src "
            f"WHERE dd.outdeg > 0 GROUP BY e.dst) m ON m.v = dgt.v)"
        )
    last = f"pr{iters}"
    parts.append(f"tot AS (SELECT SUM(r) AS s FROM {last})")
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT v AS vertex, CAST(ROUND(r/(SELECT s FROM tot)*1e8) AS BIGINT) AS pr_e8 "
        f"FROM {last} ORDER BY vertex"
    )


def _sql_pagerank_personalized(iters: int = PR_ITERS, d: float = DAMPING) -> str:
    """The _sql_pagerank recurrence with the uniform teleport replaced by
    the normalized reset distribution (weight 1 on v % 7 == 0)."""
    parts = [
        f"WITH edges AS MATERIALIZED ({SQL_EDGES_A})",
        f"verts AS MATERIALIZED ({SQL_VERTS_A})",
        "deg AS MATERIALIZED (SELECT v, (SELECT COUNT(*) FROM edges e WHERE e.src = verts.v) AS outdeg FROM verts)",
        "params AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)",
        "rz AS MATERIALIZED (SELECT v, CASE WHEN v % 7 = 0 THEN 1.0 ELSE 0.0 END AS rw FROM verts)",
        "rdist AS MATERIALIZED (SELECT v, rw/(SELECT SUM(rw) FROM rz) AS rr FROM rz)",
        "pr0 AS MATERIALIZED (SELECT v, 1.0/(SELECT n FROM params) AS r FROM verts)",
    ]
    for k in range(1, iters + 1):
        p = f"pr{k-1}"
        parts.append(
            f"base{k} AS MATERIALIZED (SELECT ((1-{d}) + {d}*COALESCE((SELECT SUM(p.r) FROM {p} p "
            f"JOIN deg dd ON dd.v = p.v WHERE dd.outdeg = 0), 0)) AS b)"
        )
        parts.append(
            f"pr{k} AS MATERIALIZED (SELECT dgt.v, (SELECT b FROM base{k}) * rd.rr + {d} * COALESCE(m.s, 0) AS r "
            f"FROM deg dgt JOIN rdist rd ON rd.v = dgt.v LEFT JOIN ("
            f"SELECT e.dst AS v, SUM(p.r/dd.outdeg) AS s FROM edges e "
            f"JOIN {p} p ON p.v = e.src JOIN deg dd ON dd.v = e.src "
            f"WHERE dd.outdeg > 0 GROUP BY e.dst) m ON m.v = dgt.v)"
        )
    last = f"pr{iters}"
    parts.append(f"tot AS (SELECT SUM(r) AS s FROM {last})")
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT v AS vertex, CAST(ROUND(r/(SELECT s FROM tot)*1e8) AS BIGINT) AS pr_e8 "
        f"FROM {last} ORDER BY vertex"
    )


def _sql_louvain_sweeps(sweeps: int = 2) -> str:
    """Unrolled replay of louvain_sweeps (algorithms/louvain.py): per
    sweep, k_vc = weight from each vertex into each neighboring
    community; gains compared as the exact BIGINT m2·k_vc − deg·vol_eff
    (the integer_gains comparator — weights are integers, so both sides
    replay bit-for-bit); singleton-swap guard rows excluded from the
    argmax; move iff the best candidate strictly beats staying."""
    parts = [
        f"WITH dirw AS MATERIALIZED ({derive.SQL_EDGES_VSPARSE_W})",
        "sym AS MATERIALIZED ("
        "SELECT src, dst, CAST(weight AS BIGINT) AS w FROM dirw "
        "UNION ALL SELECT dst, src, CAST(weight AS BIGINT) AS w FROM dirw)",
        "m2t AS MATERIALIZED (SELECT SUM(w) AS m2 FROM sym)",
        "a0 AS MATERIALIZED (SELECT src AS vertex, SUM(w) AS deg, "
        "src AS community FROM sym GROUP BY src)",
    ]
    for i in range(sweeps):
        a = f"a{i}"
        parts.append(
            f"vols{i} AS MATERIALIZED (SELECT community AS c, SUM(deg) AS vol, "
            f"COUNT(*) AS csize FROM {a} GROUP BY 1)")
        parts.append(
            f"kvc{i} AS MATERIALIZED (SELECT s.src AS v, a.community AS comm, "
            f"SUM(s.w) AS kvc FROM sym s JOIN {a} a ON a.vertex = s.dst "
            f"GROUP BY 1, 2)")
        parts.append(
            f"sc{i} AS MATERIALIZED (SELECT k.v, k.comm, "
            f"((SELECT m2 FROM m2t) * k.kvc - a.deg * "
            f"(CASE WHEN k.comm = a.community THEN vc.vol - a.deg "
            f"ELSE vc.vol END)) AS g, "
            f"(vo.csize = 1 AND vc.csize = 1 AND k.comm > a.community "
            f"AND k.comm <> a.community) AS blocked, "
            f"a.community AS cur FROM kvc{i} k "
            f"JOIN vols{i} vc ON vc.c = k.comm "
            f"JOIN {a} a ON a.vertex = k.v "
            f"JOIN vols{i} vo ON vo.c = a.community)")
        parts.append(
            f"best{i} AS MATERIALIZED (SELECT v, comm, g, cur FROM ("
            f"SELECT v, comm, g, cur, ROW_NUMBER() OVER ("
            f"PARTITION BY v ORDER BY g DESC, comm ASC) AS rn "
            f"FROM sc{i} WHERE NOT blocked) WHERE rn = 1)")
        parts.append(
            f"stay{i} AS MATERIALIZED (SELECT a.vertex AS v, "
            f"((SELECT m2 FROM m2t) * COALESCE(s.kvc, 0) "
            f"- a.deg * (vo.vol - a.deg)) AS sg "
            f"FROM {a} a JOIN vols{i} vo ON vo.c = a.community "
            f"LEFT JOIN kvc{i} s ON s.v = a.vertex "
            f"AND s.comm = a.community)")
        parts.append(
            f"a{i + 1} AS MATERIALIZED (SELECT a.vertex, a.deg, "
            f"CASE WHEN b.comm IS NOT NULL AND b.comm <> a.community "
            f"AND b.g > st.sg THEN b.comm ELSE a.community END AS community "
            f"FROM {a} a LEFT JOIN best{i} b ON b.v = a.vertex "
            f"JOIN stay{i} st ON st.v = a.vertex)")
    return (",\n".join(parts)
            + f"\nSELECT vertex, community FROM a{sweeps} ORDER BY vertex")


def _sweep_cte_parts(parts, sym: str, pre: str, i: int,
                     num: int = 1, den: int = 1) -> None:
    """Emit the CTEs of ONE synchronous local-moving sweep (the
    algorithms/louvain.py _one_sweep integer comparator, rational
    gamma = num/den): {pre}a{i} -> {pre}a{i+1} over edge table ``sym``
    (src, dst, w). Self-loop rows (present on coarsened graphs) are
    excluded from k_vc but counted in deg/vol, matching the engine."""
    a = f"{pre}a{i}"
    parts.append(
        f"{pre}vols{i} AS MATERIALIZED (SELECT community AS c, "
        f"SUM(deg) AS vol, COUNT(*) AS csize FROM {a} GROUP BY 1)")
    parts.append(
        f"{pre}kvc{i} AS MATERIALIZED (SELECT s.src AS v, "
        f"a.community AS comm, SUM(s.w) AS kvc FROM {sym} s "
        f"JOIN {a} a ON a.vertex = s.dst WHERE s.src <> s.dst "
        f"GROUP BY 1, 2)")
    parts.append(
        f"{pre}sc{i} AS MATERIALIZED (SELECT k.v, k.comm, "
        f"({den} * (SELECT m2 FROM m2t) * k.kvc - {num} * a.deg * "
        f"(CASE WHEN k.comm = a.community THEN vc.vol - a.deg "
        f"ELSE vc.vol END)) AS g, "
        f"(vo.csize = 1 AND vc.csize = 1 AND k.comm > a.community) "
        f"AS blocked, a.community AS cur FROM {pre}kvc{i} k "
        f"JOIN {pre}vols{i} vc ON vc.c = k.comm "
        f"JOIN {a} a ON a.vertex = k.v "
        f"JOIN {pre}vols{i} vo ON vo.c = a.community)")
    parts.append(
        f"{pre}best{i} AS MATERIALIZED (SELECT v, comm, g, cur FROM ("
        f"SELECT v, comm, g, cur, ROW_NUMBER() OVER ("
        f"PARTITION BY v ORDER BY g DESC, comm ASC) AS rn "
        f"FROM {pre}sc{i} WHERE NOT blocked) WHERE rn = 1)")
    parts.append(
        f"{pre}stay{i} AS MATERIALIZED (SELECT a.vertex AS v, "
        f"({den} * (SELECT m2 FROM m2t) * COALESCE(s.kvc, 0) "
        f"- {num} * a.deg * (vo.vol - a.deg)) AS sg "
        f"FROM {a} a JOIN {pre}vols{i} vo ON vo.c = a.community "
        f"LEFT JOIN {pre}kvc{i} s ON s.v = a.vertex "
        f"AND s.comm = a.community)")
    parts.append(
        f"{pre}a{i + 1} AS MATERIALIZED (SELECT a.vertex, a.deg, "
        f"CASE WHEN b.comm IS NOT NULL AND b.comm <> a.community "
        f"AND b.g > st.sg THEN b.comm ELSE a.community END AS community "
        f"FROM {a} a LEFT JOIN {pre}best{i} b ON b.v = a.vertex "
        f"JOIN {pre}stay{i} st ON st.v = a.vertex)")


def _sql_louvain_pinned(edges_w_sql: str, level_sweeps=(2, 1),
                        num: int = 1, den: int = 1) -> str:
    """Unrolled replay of louvain_pinned (algorithms/louvain.py): per
    level the pinned number of integer-comparator sweeps, a community
    contraction (GROUP BY both mapped endpoints, self-loops kept — they
    carry intra-community weight), and label composition back to the
    original vertices. gamma = num/den scales the comparator exactly
    (spinglass_sweeps); m2 is the level-1 total, which contraction
    preserves."""
    parts = [
        f"WITH dirw AS MATERIALIZED ({edges_w_sql})",
        "sym_l0 AS MATERIALIZED ("
        "SELECT src, dst, CAST(weight AS BIGINT) AS w FROM dirw "
        "WHERE src <> dst "
        "UNION ALL SELECT dst, src, CAST(weight AS BIGINT) AS w FROM dirw "
        "WHERE src <> dst)",
        "m2t AS MATERIALIZED (SELECT SUM(w) AS m2 FROM sym_l0)",
    ]
    for lv, sweeps in enumerate(level_sweeps):
        sym = f"sym_l{lv}"
        pre = f"l{lv}_"
        parts.append(
            f"{pre}a0 AS MATERIALIZED (SELECT src AS vertex, "
            f"SUM(w) AS deg, src AS community FROM {sym} GROUP BY src)")
        for i in range(sweeps):
            _sweep_cte_parts(parts, sym, pre, i, num=num, den=den)
        if lv == 0:
            parts.append(
                f"map{lv} AS MATERIALIZED "
                f"(SELECT vertex, community FROM {pre}a{sweeps})")
        else:
            parts.append(
                f"map{lv} AS MATERIALIZED (SELECT m.vertex, a.community "
                f"FROM map{lv - 1} m JOIN {pre}a{sweeps} a "
                f"ON a.vertex = m.community)")
        if lv + 1 < len(level_sweeps):
            parts.append(
                f"sym_l{lv + 1} AS MATERIALIZED (SELECT "
                f"c1.community AS src, c2.community AS dst, SUM(s.w) AS w "
                f"FROM {sym} s JOIN {pre}a{sweeps} c1 ON c1.vertex = s.src "
                f"JOIN {pre}a{sweeps} c2 ON c2.vertex = s.dst "
                f"GROUP BY 1, 2)")
    last = len(level_sweeps) - 1
    return (",\n".join(parts)
            + f"\nSELECT vertex, community FROM map{last} ORDER BY vertex")


def _sql_leiden_pinned(edges_w_sql: str) -> str:
    """Unrolled replay of leiden_pinned (algorithms/leiden.py): one
    integer-comparator local-moving sweep from singletons, then one
    constrained refinement sweep from singletons on the intra-community
    edge subset — global deg/vols/m2, singleton_movers (own csize = 1)
    and cancel_vacated (moves into a label vacated by its sole occupant
    this sweep are dropped) — the Leiden connectivity guards."""
    parts = [
        f"WITH dirw AS MATERIALIZED ({edges_w_sql})",
        "sym_l0 AS MATERIALIZED ("
        "SELECT src, dst, CAST(weight AS BIGINT) AS w FROM dirw "
        "WHERE src <> dst "
        "UNION ALL SELECT dst, src, CAST(weight AS BIGINT) AS w FROM dirw "
        "WHERE src <> dst)",
        "m2t AS MATERIALIZED (SELECT SUM(w) AS m2 FROM sym_l0)",
        "l0_a0 AS MATERIALIZED (SELECT src AS vertex, SUM(w) AS deg, "
        "src AS community FROM sym_l0 GROUP BY src)",
    ]
    _sweep_cte_parts(parts, "sym_l0", "l0_", 0)
    parts += [
        # phase-2 input: intra-community edges under the phase-1 labels
        "intra AS MATERIALIZED (SELECT s.src, s.dst, s.w FROM sym_l0 s "
        "JOIN l0_a1 c1 ON c1.vertex = s.src "
        "JOIN l0_a1 c2 ON c2.vertex = s.dst "
        "WHERE c1.community = c2.community)",
        "r0 AS MATERIALIZED (SELECT vertex, deg, vertex AS community "
        "FROM l0_a1)",
        "rvols AS MATERIALIZED (SELECT community AS c, SUM(deg) AS vol, "
        "COUNT(*) AS csize FROM r0 GROUP BY 1)",
        "rkvc AS MATERIALIZED (SELECT s.src AS v, r.community AS comm, "
        "SUM(s.w) AS kvc FROM intra s JOIN r0 r ON r.vertex = s.dst "
        "WHERE s.src <> s.dst GROUP BY 1, 2)",
        "rsc AS MATERIALIZED (SELECT k.v, k.comm, "
        "((SELECT m2 FROM m2t) * k.kvc - a.deg * "
        "(CASE WHEN k.comm = a.community THEN vc.vol - a.deg "
        "ELSE vc.vol END)) AS g, "
        "(vo.csize = 1 AND vc.csize = 1 AND k.comm > a.community) "
        "AS blocked, a.community AS cur, vo.csize AS csize_own "
        "FROM rkvc k JOIN rvols vc ON vc.c = k.comm "
        "JOIN r0 a ON a.vertex = k.v "
        "JOIN rvols vo ON vo.c = a.community)",
        "rbest AS MATERIALIZED (SELECT v, comm, g, cur, csize_own FROM ("
        "SELECT v, comm, g, cur, csize_own, ROW_NUMBER() OVER ("
        "PARTITION BY v ORDER BY g DESC, comm ASC) AS rn "
        "FROM rsc WHERE NOT blocked) WHERE rn = 1)",
        "rstay AS MATERIALIZED (SELECT a.vertex AS v, "
        "((SELECT m2 FROM m2t) * COALESCE(s.kvc, 0) "
        "- a.deg * (vo.vol - a.deg)) AS sg "
        "FROM r0 a JOIN rvols vo ON vo.c = a.community "
        "LEFT JOIN rkvc s ON s.v = a.vertex AND s.comm = a.community)",
        "rmv AS MATERIALIZED (SELECT b.v, b.comm FROM rbest b "
        "JOIN rstay st ON st.v = b.v "
        "WHERE b.comm <> b.cur AND b.g > st.sg AND b.csize_own = 1)",
        "rsurv AS MATERIALIZED (SELECT v, comm FROM rmv "
        "WHERE comm NOT IN (SELECT v FROM rmv))",
        "r1 AS MATERIALIZED (SELECT r.vertex, "
        "COALESCE(s.comm, r.community) AS refined FROM r0 r "
        "LEFT JOIN rsurv s ON s.v = r.vertex)",
    ]
    return (",\n".join(parts)
            + "\nSELECT a.vertex, a.community, r.refined FROM l0_a1 a "
            "JOIN r1 r ON r.vertex = a.vertex ORDER BY a.vertex")


def _sql_scg_groups(intervals: int = 4) -> str:
    """Replay of scg_grouping_power (algorithms/scg.py): exact-integer
    power iterates x_k = A_sym^k · 1 (simple undirected adjacency) at
    k = 2, 3; per-column equal-width integer bins
    (x−min)·intervals // (max−min) clipped to intervals−1 (width 0 →
    bin 0); joint key bin0·intervals + bin1; groups densified by first
    appearance (DENSE_RANK over the min member vertex)."""
    return f"""
WITH e AS MATERIALIZED ({derive.SQL_EDGES_A}),
und AS MATERIALIZED (SELECT DISTINCT src, dst FROM
  (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)),
verts AS MATERIALIZED ({derive.SQL_VERTS_A}),
x1 AS MATERIALIZED (SELECT v.v AS vertex,
  COALESCE(s.c, 0) AS val FROM verts v LEFT JOIN
  (SELECT src, COUNT(*) AS c FROM und GROUP BY src) s ON s.src = v.v),
x2 AS MATERIALIZED (SELECT v.v AS vertex, COALESCE(s.c, 0) AS val
  FROM verts v LEFT JOIN
  (SELECT u.src, SUM(x.val) AS c FROM und u
   JOIN x1 x ON x.vertex = u.dst GROUP BY u.src) s ON s.src = v.v),
x3 AS MATERIALIZED (SELECT v.v AS vertex, COALESCE(s.c, 0) AS val
  FROM verts v LEFT JOIN
  (SELECT u.src, SUM(x.val) AS c FROM und u
   JOIN x2 x ON x.vertex = u.dst GROUP BY u.src) s ON s.src = v.v),
cols AS MATERIALIZED (SELECT a.vertex, a.val AS d0, b.val AS d1
  FROM x2 a JOIN x3 b ON b.vertex = a.vertex),
ext AS MATERIALIZED (SELECT MIN(d0) AS mn0, MAX(d0) AS mx0,
  MIN(d1) AS mn1, MAX(d1) AS mx1 FROM cols),
keys AS MATERIALIZED (SELECT vertex,
  (CASE WHEN mx0 = mn0 THEN 0 ELSE LEAST({intervals - 1},
     ((d0 - mn0) * {intervals}) // (mx0 - mn0)) END) * {intervals}
  + (CASE WHEN mx1 = mn1 THEN 0 ELSE LEAST({intervals - 1},
     ((d1 - mn1) * {intervals}) // (mx1 - mn1)) END) AS k
  FROM cols, ext),
firsts AS MATERIALIZED (SELECT k, MIN(vertex) AS minv
  FROM keys GROUP BY k),
ranks AS MATERIALIZED (SELECT k,
  CAST(DENSE_RANK() OVER (ORDER BY minv) - 1 AS BIGINT) AS grp
  FROM firsts)
SELECT ks.vertex, r.grp AS "group"
FROM keys ks JOIN ranks r ON r.k = ks.k ORDER BY ks.vertex
"""


def _sql_graphlets(max_w: int = 10) -> str:
    """Replay of graphlets_candidate_basis (algorithms/graphlets.py):
    for every threshold t the maximal cliques (size >= 2) of G_{>=t}
    via the ascending clique-growth CTE with the outside-extension
    maximality test (the ``independent_sets`` pattern), deduplicated by
    vertex set, tagged with their min internal weight, ordered by
    (threshold, members). Levels not among the distinct weights yield
    the same threshold graph as the next present level, so enumerating
    every t in 1..{max_w} reproduces the engine's distinct-level sweep
    after the UNION dedup (vsparse weights are o_orderkey%10+1)."""
    parts = [
        f"WITH RECURSIVE dirw AS MATERIALIZED ({derive.SQL_EDGES_VSPARSE_W})",
        "und AS MATERIALIZED (SELECT LEAST(src, dst) AS lo, "
        "GREATEST(src, dst) AS hi, CAST(MAX(weight) AS BIGINT) AS w "
        "FROM dirw GROUP BY 1, 2)",
    ]
    unions = []
    for t in range(1, max_w + 1):
        parts.append(
            f"g{t} AS MATERIALIZED (SELECT lo, hi FROM und WHERE w >= {t})")
        parts.append(
            f"adj{t} AS MATERIALIZED (SELECT lo AS a, hi AS b FROM g{t} "
            f"UNION ALL SELECT hi, lo FROM g{t})")
        parts.append(
            f"cl{t} AS (SELECT [a] AS members, a AS last FROM "
            f"(SELECT DISTINCT a FROM adj{t}) "
            f"UNION "
            f"SELECT list_append(c.members, u.hi), u.hi "
            f"FROM cl{t} c JOIN g{t} u ON u.lo = c.last "
            f"WHERE (SELECT COUNT(*) FROM adj{t} a "
            f"WHERE a.a = u.hi AND list_contains(c.members, a.b)) "
            f"= len(c.members))")
        parts.append(
            f"maxcl{t} AS MATERIALIZED (SELECT members FROM cl{t} c "
            f"WHERE len(members) >= 2 AND NOT EXISTS ("
            f"SELECT 1 FROM adj{t} a "
            f"WHERE list_contains(c.members, a.b) "
            f"AND NOT list_contains(c.members, a.a) "
            f"GROUP BY a.a HAVING COUNT(*) = len(c.members)))")
        unions.append(f"SELECT members FROM maxcl{t}")
    parts.append(
        "allcl AS MATERIALIZED (SELECT DISTINCT members FROM ("
        + " UNION ALL ".join(unions) + "))")
    parts.append(
        "thr AS MATERIALIZED (SELECT members, "
        "(SELECT MIN(u.w) FROM und u WHERE list_contains(members, u.lo) "
        "AND list_contains(members, u.hi)) AS t FROM allcl)")
    parts.append(
        "ranked AS MATERIALIZED (SELECT members, t, "
        "CAST(ROW_NUMBER() OVER (ORDER BY t, members) - 1 AS BIGINT) "
        "AS gid FROM thr)")
    return (",\n".join(parts)
            + "\nSELECT gid AS graphlet, UNNEST(members) AS vertex, "
            "CAST(t * 1000000 AS BIGINT) AS threshold_e6, "
            "CAST(len(members) AS BIGINT) AS size "
            "FROM ranked ORDER BY graphlet, vertex")


def _sql_mst(rounds: int = 10, edges_w_sql: str = None) -> str:
    """Unrolled Borůvka over the undirected weighted view of edges_a.

    Parallel edges collapse to their lightest representative (the total
    order (w, lo, hi) makes that equivalent to the engine's per-component
    min pick over raw rows).  Each round: per-component minimum cross
    edge by (w, lo, hi); contraction = connected components of the
    chosen-so-far forest via a recursive min-label reach CTE.  Component
    count at least halves per round, so 10 rounds cover V=512.
    """
    parts = [
        f"WITH RECURSIVE ew AS MATERIALIZED ({edges_w_sql or SQL_EDGES_A_W})",
        "ue AS MATERIALIZED (SELECT LEAST(src, dst) AS lo, "
        "GREATEST(src, dst) AS hi, MIN(weight) AS w FROM ew GROUP BY 1, 2)",
        "uverts AS MATERIALIZED (SELECT lo AS v FROM ue UNION SELECT hi FROM ue)",
        "comp0 AS MATERIALIZED (SELECT v, v AS comp FROM uverts)",
    ]
    for k in range(1, rounds + 1):
        c = f"comp{k-1}"
        half = (
            f"SELECT {{side}}.comp AS comp, u.lo, u.hi, u.w FROM ue u "
            f"JOIN {c} c1 ON c1.v = u.lo JOIN {c} c2 ON c2.v = u.hi "
            f"WHERE c1.comp <> c2.comp"
        )
        parts.append(
            f"cand{k} AS MATERIALIZED ({half.format(side='c1')} "
            f"UNION ALL {half.format(side='c2')})"
        )
        parts.append(
            f"pick{k} AS MATERIALIZED (SELECT DISTINCT lo, hi, w FROM "
            f"(SELECT lo, hi, w, ROW_NUMBER() OVER "
            f"(PARTITION BY comp ORDER BY w, lo, hi) AS rn FROM cand{k}) "
            f"WHERE rn = 1)"
        )
        if k == 1:
            parts.append("chosen1 AS MATERIALIZED (SELECT lo, hi, w FROM pick1)")
        else:
            parts.append(
                f"chosen{k} AS MATERIALIZED (SELECT lo, hi, w FROM chosen{k-1} "
                f"UNION SELECT lo, hi, w FROM pick{k})"
            )
        if k < rounds:
            parts.append(
                f"reach{k}(v, l) AS (SELECT v, v FROM uverts UNION "
                f"SELECT x.o, r.l FROM reach{k} r JOIN "
                f"(SELECT lo AS a, hi AS o FROM chosen{k} "
                f"UNION ALL SELECT hi, lo FROM chosen{k}) x ON x.a = r.v)"
            )
            parts.append(
                f"comp{k} AS MATERIALIZED "
                f"(SELECT v, MIN(l) AS comp FROM reach{k} GROUP BY v)"
            )
    return (
        ",\n".join(parts)
        + f"\nSELECT lo AS src, hi AS dst, CAST(w AS BIGINT) AS weight "
        f"FROM chosen{rounds} ORDER BY src, dst"
    )


_SQL_CC_CORE = f"""
WITH RECURSIVE edges AS MATERIALIZED ({SQL_EDGES_A}),
verts AS MATERIALIZED ({SQL_VERTS_A}),
sym AS MATERIALIZED (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
reach(v, l) AS (
  SELECT v, v FROM verts
  UNION
  SELECT s.dst, r.l FROM reach r JOIN sym s ON s.src = r.v
),
minl AS (SELECT v, MIN(l) AS ml FROM reach GROUP BY v),
ranks AS (SELECT ml, CAST(DENSE_RANK() OVER (ORDER BY ml) - 1 AS BIGINT) AS rank
          FROM (SELECT DISTINCT ml FROM minl))
"""


_SQL_SCC_CORE = f"""
WITH RECURSIVE edges AS MATERIALIZED ({SQL_EDGES_A}),
verts AS MATERIALIZED ({SQL_VERTS_A}),
reach(s, t) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.s, e.dst FROM reach r JOIN edges e ON e.src = r.t
),
mutual AS (SELECT r1.s AS a, r1.t AS b FROM reach r1
           JOIN reach r2 ON r2.s = r1.t AND r2.t = r1.s),
minl AS (SELECT a AS v, MIN(b) AS ml FROM mutual GROUP BY a),
ranks AS (SELECT ml, CAST(DENSE_RANK() OVER (ORDER BY ml) - 1 AS BIGINT) AS rank
          FROM (SELECT DISTINCT ml FROM minl))
"""


def _sql_scc() -> str:
    return (
        _SQL_SCC_CORE
        + "SELECT m.v AS vertex, r.rank AS label FROM minl m JOIN ranks r USING (ml) ORDER BY vertex"
    )


_SSSP_ITERS = 30
_BIG = 1_000_000_000


def _sql_sssp_weighted(iters: int = _SSSP_ITERS) -> str:
    """Unrolled weighted Bellman-Ford (min-plus) — same shape as
    _sql_sssp with MIN(p.d + e.weight) relaxation. 30 unrolled rounds
    cover any weighted shortest path of ≤30 hops; the dense V=512
    digraph's weighted hop-depth is far below that."""
    from igraph_ray.pipelines.derive import SQL_EDGES_A_W

    parts = [
        f"WITH edges AS MATERIALIZED ({SQL_EDGES_A_W})",
        f"verts AS MATERIALIZED ({SQL_VERTS_A})",
        f"h0 AS MATERIALIZED (SELECT v, CASE WHEN v = (SELECT MIN(v) FROM verts) "
        f"THEN 0 ELSE {_BIG} END AS d FROM verts)",
    ]
    for k in range(1, iters + 1):
        p = f"h{k-1}"
        parts.append(
            f"h{k} AS MATERIALIZED (SELECT h.v, LEAST(h.d, COALESCE(m.md, {_BIG})) AS d "
            f"FROM {p} h LEFT JOIN (SELECT e.dst AS v, MIN(p.d + e.weight) AS md "
            f"FROM edges e JOIN {p} p ON p.v = e.src WHERE p.d < {_BIG} GROUP BY e.dst) m "
            f"ON m.v = h.v)"
        )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT v AS vertex, CAST(d AS BIGINT) AS dist FROM h{iters} "
        f"WHERE d < {_BIG} ORDER BY vertex"
    )


def _sql_sssp_tree(iters: int = _SSSP_ITERS) -> str:
    """The sssp_hops distance table extended with parent = MIN
    predecessor one hop closer (source parents itself)."""
    parts = [
        f"WITH edges AS MATERIALIZED ({SQL_EDGES_A})",
        f"verts AS MATERIALIZED ({SQL_VERTS_A})",
        f"h0 AS MATERIALIZED (SELECT v, CASE WHEN v = (SELECT MIN(v) FROM verts) "
        f"THEN 0 ELSE {_BIG} END AS d FROM verts)",
    ]
    for k in range(1, iters + 1):
        p = f"h{k-1}"
        parts.append(
            f"h{k} AS MATERIALIZED (SELECT h.v, LEAST(h.d, COALESCE(m.md, {_BIG})) AS d "
            f"FROM {p} h LEFT JOIN (SELECT e.dst AS v, MIN(p.d) + 1 AS md FROM edges e "
            f"JOIN {p} p ON p.v = e.src WHERE p.d < {_BIG} GROUP BY e.dst) m ON m.v = h.v)"
        )
    parts.append(
        f"dd AS (SELECT v, d FROM h{iters} WHERE d < {_BIG})")
    parts.append(
        "par AS (SELECT e.dst AS v, MIN(e.src) AS parent FROM edges e "
        "JOIN dd a ON a.v = e.src JOIN dd b ON b.v = e.dst AND b.d = a.d + 1 "
        "GROUP BY e.dst)")
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT dd.v AS vertex, CAST(dd.d AS BIGINT) AS dist, "
        f"CAST(COALESCE(p.parent, dd.v) AS BIGINT) AS parent "
        f"FROM dd LEFT JOIN par p ON p.v = dd.v ORDER BY vertex"
    )


def _sql_sssp(iters: int = _SSSP_ITERS) -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({SQL_EDGES_A})",
        f"verts AS MATERIALIZED ({SQL_VERTS_A})",
        f"h0 AS MATERIALIZED (SELECT v, CASE WHEN v = (SELECT MIN(v) FROM verts) "
        f"THEN 0 ELSE {_BIG} END AS d FROM verts)",
    ]
    for k in range(1, iters + 1):
        p = f"h{k-1}"
        parts.append(
            f"h{k} AS MATERIALIZED (SELECT h.v, LEAST(h.d, COALESCE(m.md, {_BIG})) AS d "
            f"FROM {p} h LEFT JOIN (SELECT e.dst AS v, MIN(p.d) + 1 AS md FROM edges e "
            f"JOIN {p} p ON p.v = e.src WHERE p.d < {_BIG} GROUP BY e.dst) m ON m.v = h.v)"
        )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT v AS vertex, CAST(d AS BIGINT) AS dist FROM h{iters} "
        f"WHERE d < {_BIG} ORDER BY vertex"
    )


def _sql_allpairs_body(iters: int = _SSSP_ITERS) -> str:
    """Shared unrolled all-pairs BFS: CTE chain ending in p{iters}(s,t,d)
    = hop distance over reachable ordered pairs (self pairs d=0
    included). Used by path_length_hist / closeness / harmonic /
    eccentricity / diameter oracles."""
    parts = [
        f"WITH edges AS MATERIALIZED ({SQL_EDGES_A})",
        f"verts AS MATERIALIZED ({SQL_VERTS_A})",
        "p0 AS MATERIALIZED (SELECT v AS s, v AS t, 0 AS d FROM verts)",
    ]
    for k in range(1, iters + 1):
        p = f"p{k-1}"
        parts.append(
            f"p{k} AS MATERIALIZED (SELECT s, t, MIN(d) AS d FROM ("
            f"SELECT s, t, d FROM {p} UNION ALL "
            f"SELECT p.s, e.dst AS t, p.d + 1 AS d FROM {p} p JOIN edges e ON e.src = p.t"
            f") GROUP BY s, t)"
        )
    return ",\n".join(parts)


def _sql_allpairs_weighted(iters: int = 60) -> str:
    """Unrolled weighted all-pairs min-plus over the very-sparse
    WEIGHTED digraph: CTE chain ending in w{iters}(s, t, d). iters
    bounds the EDGE COUNT of an optimal path; 60 exceeds the
    measured max weighted distance (52 at sf0.01, integer weights
    >= 1 bound path length by distance)."""
    parts = [
        f"WITH edges AS MATERIALIZED ({derive.SQL_EDGES_VSPARSE_W})",
        "verts AS MATERIALIZED (SELECT src AS v FROM edges "
        "UNION SELECT dst FROM edges)",
        "w0 AS MATERIALIZED (SELECT v AS s, v AS t, CAST(0 AS BIGINT) "
        "AS d FROM verts)",
    ]
    for k in range(1, iters + 1):
        p = f"w{k-1}"
        parts.append(
            f"w{k} AS MATERIALIZED (SELECT s, t, MIN(d) AS d FROM ("
            f"SELECT s, t, d FROM {p} UNION ALL "
            f"SELECT p.s, e.dst AS t, p.d + e.weight AS d "
            f"FROM {p} p JOIN edges e ON e.src = p.t"
            f") GROUP BY s, t)")
    return ",\n".join(parts)


def q_closeness_weighted(sf_dir: str):
    """Weighted out-closeness (igraph_closeness with weights,
    structural_properties.c Dijkstra branch) over the very-sparse
    weighted digraph: reached/Σ(weighted dist) over reachable targets,
    self excluded, e8 integers. Engine = the K-column min-plus
    Bellman-Ford (multi_source_hops weighted=True); oracle = the
    unrolled weighted all-pairs chain."""
    from igraph_ray.algorithms.paths import multi_source_hops

    g = derive.graph_vsparse_weighted(sf_dir)
    sources = [int(r["vertex"]) for r in g.vertices().take_all()]
    D = multi_source_hops(g, sources, num_partitions=8, weighted=True)

    def _pre(b: pa.Table) -> pa.Table:
        s = b["source"].to_numpy(zero_copy_only=False)
        v = b["vertex"].to_numpy(zero_copy_only=False)
        d = b["dist"].to_numpy(zero_copy_only=False)
        keep = s != v
        t = pa.table({"vertex": pa.array(s[keep]),
                      "r": pa.array(np.ones(int(keep.sum()), np.int64)),
                      "sd": pa.array(d[keep])})
        return (t.group_by("vertex").aggregate([("r", "sum"),
                                                ("sd", "sum")])
                .rename_columns(["vertex", "r", "sd"]))

    agg = (D.map_batches(_pre, batch_format="pyarrow", batch_size=None)
           .groupby("vertex").sum(["r", "sd"]))

    def _final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "closeness_e8": pa.array([], pa.int64())})
        r = b["sum(r)"].to_numpy(zero_copy_only=False).astype(np.float64)
        sd = b["sum(sd)"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = sd > 0
        v = b["vertex"].to_numpy(zero_copy_only=False)[keep]
        c = np.floor(r[keep] / sd[keep] * 1e8 + 0.5).astype(np.int64)
        return pa.table({"vertex": pa.array(v),
                         "closeness_e8": pa.array(c)})

    return (agg.map_batches(_final, batch_format="pyarrow",
                            batch_size=None).sort("vertex"))


def _sql_closeness_weighted(iters: int = 60) -> str:
    return (
        f"{_sql_allpairs_weighted(iters)}\n"
        f"SELECT s AS vertex, CAST(FLOOR(CAST(cnt AS DOUBLE) / sumd * 1e8"
        f" + 0.5) AS BIGINT) AS closeness_e8 "
        f"FROM (SELECT s, COUNT(*) AS cnt, SUM(d) AS sumd FROM w{iters} "
        f"WHERE s != t GROUP BY s) q WHERE sumd > 0 ORDER BY vertex")


def q_diameter_weighted(sf_dir: str):
    """Weighted diameter (igraph_diameter_dijkstra): the maximum
    weighted shortest-path distance over reachable ordered pairs of
    the very-sparse weighted digraph — one scalar off the same
    K-column min-plus table."""
    from igraph_ray.algorithms.paths import multi_source_hops

    g = derive.graph_vsparse_weighted(sf_dir)
    sources = [int(r["vertex"]) for r in g.vertices().take_all()]
    D = multi_source_hops(g, sources, num_partitions=8, weighted=True)
    mx = int(D.max("dist"))
    return pa.table({"diameter": pa.array([mx], pa.int64())})


def _sql_diameter_weighted(iters: int = 60) -> str:
    return (f"{_sql_allpairs_weighted(iters)}\n"
            f"SELECT CAST(MAX(d) AS BIGINT) AS diameter FROM w{iters}")


def q_betweenness_weighted(sf_dir: str):
    """Exact weighted betweenness (igraph_betweenness, weights branch)
    over the very-sparse weighted digraph: bc_e6 integers. Engine =
    guarded all-sources Brandes–Dijkstra task; oracle = the σ pair
    formula with the σ chain unrolled by integer DISTANCE VALUE
    (predecessors of a distance-d vertex sit at d − w < d, so the
    value-level unroll is exact — the weighted reading of the
    unweighted hop unroll)."""
    from igraph_ray.algorithms.betweenness import betweenness_weighted

    g = derive.graph_vsparse_weighted(sf_dir)
    bc = betweenness_weighted(g)
    return _scale_col(bc, "bc", "bc_e6", 1e6).sort("vertex")


def _sql_betweenness_weighted(maxd: int = 60) -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({derive.SQL_EDGES_VSPARSE_W})",
        "verts AS MATERIALIZED (SELECT src AS v FROM edges "
        "UNION SELECT dst FROM edges)",
        "q0 AS MATERIALIZED (SELECT v AS s, v AS t, CAST(0 AS BIGINT) "
        "AS d, CAST(1 AS DOUBLE) AS sig FROM verts)",
    ]
    for k in range(1, maxd + 1):
        p = f"q{k-1}"
        parts.append(
            f"q{k} AS MATERIALIZED (SELECT s, t, d, sig FROM {p} "
            f"UNION ALL SELECT n.s, n.t, n.d, n.sig FROM ("
            f"SELECT p.s, e.dst AS t, CAST({k} AS BIGINT) AS d, "
            f"SUM(p.sig) AS sig "
            f"FROM {p} p JOIN edges e ON e.src = p.t "
            f"AND p.d + e.weight = {k} GROUP BY p.s, e.dst) n "
            f"WHERE NOT EXISTS (SELECT 1 FROM {p} o "
            f"WHERE o.s = n.s AND o.t = n.t))")
    q = f"q{maxd}"
    parts.append(
        f"bc AS (SELECT p1.t AS v, SUM(p1.sig * p2.sig / p3.sig) AS b "
        f"FROM {q} p1 JOIN {q} p2 ON p2.s = p1.t "
        f"JOIN {q} p3 ON p3.s = p1.s AND p3.t = p2.t "
        f"AND p3.d = p1.d + p2.d "
        f"WHERE p1.s != p1.t AND p2.s != p2.t AND p1.s != p2.t "
        f"GROUP BY p1.t)")
    body = ",\n".join(parts)
    return (f"{body}\n"
            f"SELECT verts.v AS vertex, "
            f"CAST(round_even(COALESCE(b.b, 0)*1e6, 0) AS BIGINT) AS bc_e6 "
            f"FROM verts LEFT JOIN bc b ON b.v = verts.v ORDER BY vertex")


def q_sssp_weighted_tree(sf_dir: str):
    """Weighted shortest-path tree (igraph_get_shortest_paths_dijkstra
    parent structure): from the min universe vertex of the weighted
    edges_a digraph, (vertex, dist, parent) with parent = the SMALLEST
    predecessor u satisfying the relaxation identity
    d(u) + w(u, v) = d(v) (source parents itself). Engine = the
    sssp_weighted distance fixpoint + one broadcast join and a grouped
    min — no second traversal; oracle = the unrolled min-plus chain
    extended with the same identity."""
    from igraph_ray.util import hash_join

    g = derive.graph_a_weighted(sf_dir)
    source = int(g.vertices().min("vertex"))
    st = sssp_hops(g, source=source, weighted=True,
                   num_partitions=8).state.materialize()

    def _du(b: pa.Table) -> pa.Table:
        return pa.table({"u": b["vertex"], "du": b["dist"]})

    def _dv(b: pa.Table) -> pa.Table:
        return pa.table({"v": b["vertex"], "dv": b["dist"]})

    e = g.edges.map_batches(
        lambda b: pa.table({"u": b["src"], "v": b["dst"],
                            "w": b["weight"]}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(e, st.map_batches(_du, batch_format="pyarrow",
                                    batch_size=None),
                  on="u", num_partitions=8)
    j = hash_join(j, st.map_batches(_dv, batch_format="pyarrow",
                                    batch_size=None),
                  on="v", num_partitions=8)

    def _par(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "du" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "parent": pa.array([], pa.int64())})
        du = b["du"].to_numpy(zero_copy_only=False)
        dv = b["dv"].to_numpy(zero_copy_only=False)
        w = b["w"].to_numpy(zero_copy_only=False)
        keep = du + w == dv
        t = pa.table({"vertex": b["v"].filter(pa.array(keep)),
                      "parent": b["u"].filter(pa.array(keep))})
        return (t.group_by("vertex").aggregate([("parent", "min")])
                .rename_columns(["vertex", "parent"]))

    par = (j.map_batches(_par, batch_format="pyarrow", batch_size=None)
           .groupby("vertex").min("parent"))
    par = par.map_batches(
        lambda b: (pa.table({"vertex": b["vertex"],
                             "parent": b["min(parent)"]})
                   if b.num_rows else
                   pa.table({"vertex": pa.array([], pa.int64()),
                             "parent": pa.array([], pa.int64())})),
        batch_format="pyarrow", batch_size=None)
    merged = hash_join(st, par, on="vertex", num_partitions=8,
                       join_type="left_outer")

    def _fin(b: pa.Table, _s=source) -> pa.Table:
        v = b["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dist"].to_numpy(zero_copy_only=False)
        p = b["parent"].to_numpy(zero_copy_only=False)
        p = np.where(np.isnan(p.astype(np.float64)), v,
                     np.nan_to_num(p.astype(np.float64))).astype(np.int64)
        return pa.table({"vertex": pa.array(v),
                         "dist": pa.array(np.round(d).astype(np.int64)),
                         "parent": pa.array(p)})

    return merged.map_batches(_fin, batch_format="pyarrow",
                              batch_size=None).sort("vertex")


def _sql_sssp_weighted_tree(iters: int = 30) -> str:
    from igraph_ray.pipelines.derive import SQL_EDGES_A_W

    parts = [
        f"WITH edges AS MATERIALIZED ({SQL_EDGES_A_W})",
        f"verts AS MATERIALIZED ({SQL_VERTS_A})",
        f"h0 AS MATERIALIZED (SELECT v, CASE WHEN v = "
        f"(SELECT MIN(v) FROM verts) THEN 0 ELSE {_BIG} END AS d "
        f"FROM verts)",
    ]
    for k in range(1, iters + 1):
        p = f"h{k-1}"
        parts.append(
            f"h{k} AS MATERIALIZED (SELECT h.v, "
            f"LEAST(h.d, COALESCE(m.md, {_BIG})) AS d "
            f"FROM {p} h LEFT JOIN (SELECT e.dst AS v, "
            f"MIN(p.d + e.weight) AS md "
            f"FROM edges e JOIN {p} p ON p.v = e.src "
            f"WHERE p.d < {_BIG} GROUP BY e.dst) m ON m.v = h.v)")
    q = f"h{iters}"
    parts.append(
        f"par AS (SELECT e.dst AS v, MIN(e.src) AS parent "
        f"FROM edges e JOIN {q} a ON a.v = e.src "
        f"JOIN {q} b ON b.v = e.dst AND a.d + e.weight = b.d "
        f"WHERE a.d < {_BIG} GROUP BY e.dst)")
    body = ",\n".join(parts)
    return (f"{body}\n"
            f"SELECT h.v AS vertex, CAST(h.d AS BIGINT) AS dist, "
            f"COALESCE(p.parent, h.v) AS parent "
            f"FROM {q} h LEFT JOIN par p ON p.v = h.v "
            f"WHERE h.d < {_BIG} ORDER BY vertex")


def q_edge_betweenness_weighted(sf_dir: str):
    """Weighted edge betweenness (igraph_edge_betweenness, weights
    branch) over the very-sparse weighted digraph: (src, dst, ebc_e6).
    Engine = the Brandes–Dijkstra sweep's per-DAG-edge dependency
    pushes; oracle = the edge pair formula over the distance-value
    σ chain: ebc(u→v) = Σ σ(s,u)·σ(v,t)/σ(s,t) where
    d(s,u) + w(u,v) + d(v,t) = d(s,t)."""
    from igraph_ray.algorithms.betweenness import (
        edge_betweenness_weighted,
    )

    g = derive.graph_vsparse_weighted(sf_dir)
    ebc = edge_betweenness_weighted(g)
    return _scale_col(ebc, "ebc", "ebc_e6", 1e6).sort(["src", "dst"])


def _sql_edge_betweenness_weighted(maxd: int = 60) -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({derive.SQL_EDGES_VSPARSE_W})",
        "verts AS MATERIALIZED (SELECT src AS v FROM edges "
        "UNION SELECT dst FROM edges)",
        "q0 AS MATERIALIZED (SELECT v AS s, v AS t, CAST(0 AS BIGINT) "
        "AS d, CAST(1 AS DOUBLE) AS sig FROM verts)",
    ]
    for k in range(1, maxd + 1):
        p = f"q{k-1}"
        parts.append(
            f"q{k} AS MATERIALIZED (SELECT s, t, d, sig FROM {p} "
            f"UNION ALL SELECT n.s, n.t, n.d, n.sig FROM ("
            f"SELECT p.s, e.dst AS t, CAST({k} AS BIGINT) AS d, "
            f"SUM(p.sig) AS sig "
            f"FROM {p} p JOIN edges e ON e.src = p.t "
            f"AND p.d + e.weight = {k} GROUP BY p.s, e.dst) n "
            f"WHERE NOT EXISTS (SELECT 1 FROM {p} o "
            f"WHERE o.s = n.s AND o.t = n.t))")
    q = f"q{maxd}"
    parts.append(
        f"ebc AS (SELECT e.src, e.dst, SUM(p1.sig * p2.sig / p3.sig) AS b "
        f"FROM edges e "
        f"JOIN {q} p1 ON p1.t = e.src "
        f"JOIN {q} p2 ON p2.s = e.dst "
        f"JOIN {q} p3 ON p3.s = p1.s AND p3.t = p2.t "
        f"AND p3.d = p1.d + e.weight + p2.d "
        f"GROUP BY e.src, e.dst)")
    body = ",\n".join(parts)
    return (f"{body}\n"
            f"SELECT e.src, e.dst, "
            f"CAST(round_even(COALESCE(b.b, 0)*1e6, 0) AS BIGINT) "
            f"AS ebc_e6 "
            f"FROM edges e LEFT JOIN ebc b ON b.src = e.src "
            f"AND b.dst = e.dst ORDER BY e.src, e.dst")


def q_path_length_hist_weighted(sf_dir: str):
    """Weighted path-length histogram (igraph_path_length_hist under
    Dijkstra distances) over ordered reachable pairs of the
    very-sparse weighted digraph: (dist, count) exact integers off the
    shared K-column min-plus table."""
    from igraph_ray.algorithms.paths import multi_source_hops

    g = derive.graph_vsparse_weighted(sf_dir)
    sources = [int(r["vertex"]) for r in g.vertices().take_all()]
    D = multi_source_hops(g, sources, num_partitions=8, weighted=True)

    def _pre(b: pa.Table) -> pa.Table:
        s = b["source"].to_numpy(zero_copy_only=False)
        v = b["vertex"].to_numpy(zero_copy_only=False)
        d = b["dist"].to_numpy(zero_copy_only=False)
        keep = s != v
        t = pa.table({"dist": pa.array(d[keep]),
                      "count": pa.array(
                          np.ones(int(keep.sum()), np.int64))})
        return (t.group_by("dist").aggregate([("count", "sum")])
                .rename_columns(["dist", "count"]))

    agg = (D.map_batches(_pre, batch_format="pyarrow", batch_size=None)
           .groupby("dist").sum("count"))
    return agg.map_batches(
        lambda b: (pa.table({"dist": b["dist"], "count": b["sum(count)"]})
                   if b.num_rows else
                   pa.table({"dist": pa.array([], pa.int64()),
                             "count": pa.array([], pa.int64())})),
        batch_format="pyarrow", batch_size=None).sort("dist")


def _sql_path_length_hist_weighted(iters: int = 60) -> str:
    return (f"{_sql_allpairs_weighted(iters)}\n"
            f"SELECT CAST(d AS BIGINT) AS dist, COUNT(*) AS count "
            f"FROM w{iters} WHERE s != t GROUP BY d ORDER BY dist")


def q_eccentricity_weighted(sf_dir: str):
    """Weighted out-eccentricity (igraph_eccentricity_dijkstra
    semantics) over the very-sparse weighted digraph: per source the
    max weighted shortest-path distance to any REACHED vertex (self
    included — sources reaching nothing get 0, igraph's convention of
    restricting to the reachable set). Same K-column min-plus table as
    closeness_weighted; grouped max."""
    from igraph_ray.algorithms.paths import multi_source_hops

    g = derive.graph_vsparse_weighted(sf_dir)
    sources = [int(r["vertex"]) for r in g.vertices().take_all()]
    D = multi_source_hops(g, sources, num_partitions=8, weighted=True)

    def _pre(b: pa.Table) -> pa.Table:
        t = pa.table({"vertex": b["source"], "ecc": b["dist"]})
        return (t.group_by("vertex").aggregate([("ecc", "max")])
                .rename_columns(["vertex", "ecc"]))

    agg = (D.map_batches(_pre, batch_format="pyarrow", batch_size=None)
           .groupby("vertex").max("ecc"))
    return agg.map_batches(
        lambda b: (pa.table({"vertex": b["vertex"], "ecc": b["max(ecc)"]})
                   if b.num_rows else
                   pa.table({"vertex": pa.array([], pa.int64()),
                             "ecc": pa.array([], pa.int64())})),
        batch_format="pyarrow", batch_size=None).sort("vertex")


def _sql_eccentricity_weighted(iters: int = 60) -> str:
    return (f"{_sql_allpairs_weighted(iters)}\n"
            f"SELECT s AS vertex, CAST(MAX(d) AS BIGINT) AS ecc "
            f"FROM w{iters} GROUP BY s ORDER BY vertex")


SUBCOMP_V = 1


def q_subcomponent(sf_dir: str):
    """igraph_subcomponent (structural_properties.c:1234, IGRAPH_ALL):
    the vertices in the same weakly connected component as vertex 1 of
    the very-sparse digraph. Engine = ONE distributed min-label
    components run + a filter on vertex 1's label (no per-query BFS);
    oracle = the definitional recursive closure over the symmetrized
    edges."""
    from igraph_ray.algorithms.components import connected_components

    g = derive.graph_vsparse(sf_dir)
    labels = connected_components(g, num_partitions=8).state
    lab = labels.filter(expr=f"vertex == {SUBCOMP_V}").take_all()
    if not lab:
        return pa.table({"vertex": pa.array([SUBCOMP_V], pa.int64())})
    comp = int(lab[0]["label"])
    return (labels.filter(expr=f"label == {comp}")
            .select_columns(["vertex"]).sort("vertex"))


def _sql_subcomponent() -> str:
    return f"""
WITH RECURSIVE m AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM ({derive.SQL_EDGES_VSPARSE})),
sym AS MATERIALIZED (SELECT lo AS a, hi AS b FROM m
  UNION ALL SELECT hi, lo FROM m),
reach(v) AS (
  SELECT CAST({SUBCOMP_V} AS BIGINT)
  UNION
  SELECT s.b FROM reach r JOIN sym s ON s.a = r.v)
SELECT v AS vertex FROM reach ORDER BY vertex
"""


def q_centralization(sf_dir: str):
    """Graph-level centralization for betweenness and closeness
    (igraph_centralization_betweenness / _closeness + their _tmax
    companions, centrality.c:3082,3211): C = Σ_v (max − score_v) /
    tmax, with vertices missing from the score table contributing
    max − 0 and tmax the reference's closed forms — directed
    betweenness (n−1)²(n−2), out-mode closeness (n−1)(1−1/n). Rows
    (measure, c_e9); scores are the SAME e-scaled integers as the
    hash-green `betweenness` / `closeness` queries, so both sides sum
    exact ints and perform ONE identical double division."""
    from igraph_ray.algorithms.betweenness import betweenness
    from igraph_ray.algorithms.paths import closeness_centrality

    g = derive.graph_a(sf_dir)
    n = int(Graph(derive.edges_a(sf_dir)).vertices().count())

    def _gap(ds, col):
        # distributed scalars only — the score table never lands on
        # the driver (max + sum + count are streaming aggregates)
        m = ds.materialize()
        mx = int(m.max(col))
        rows = int(m.count())
        total = int(m.sum(col))
        return rows, mx, rows * mx - total

    bc = _scale_col(betweenness(g, num_partitions=8, chunk=64),
                    "bc", "bc_e6", 1e6)
    rows_b, max_b, gap_b = _gap(bc, "bc_e6")
    gap_b += (n - rows_b) * max_b
    tmax_b = float(n - 1) * float(n - 1) * float(n - 2)
    c_b = int(np.floor(float(gap_b) * 1000.0 / tmax_b + 0.5))

    cl = _scale_col(closeness_centrality(g, variant="out",
                                         num_partitions=8),
                    "closeness", "closeness_e8", 1e8)
    rows_c, max_c, gap_c = _gap(cl, "closeness_e8")
    gap_c += (n - rows_c) * max_c
    tmax_c = float(n - 1) * (1.0 - 1.0 / float(n))
    c_c = int(np.floor(float(gap_c) * 10.0 / tmax_c + 0.5))

    return pa.table({
        "measure": pa.array(["betweenness", "closeness"], pa.string()),
        "c_e9": pa.array([c_b, c_c], pa.int64())})


def _sql_centralization() -> str:
    return f"""
WITH nv AS (SELECT COUNT(*) AS n FROM ({SQL_VERTS_A}) t),
b AS (SELECT bc_e6 AS x FROM ({_sql_betweenness()}) t),
c AS (SELECT closeness_e8 AS x FROM ({_sql_closeness()}) t),
bg AS (SELECT (SELECT MAX(x) FROM b) AS mx, COUNT(*) AS cnt,
       SUM((SELECT MAX(x) FROM b) - x) AS gap FROM b),
cg AS (SELECT (SELECT MAX(x) FROM c) AS mx, COUNT(*) AS cnt,
       SUM((SELECT MAX(x) FROM c) - x) AS gap FROM c)
SELECT 'betweenness' AS measure,
  CAST(FLOOR(CAST(bg.gap + (nv.n - bg.cnt) * bg.mx AS DOUBLE) * 1000.0
    / (CAST(nv.n - 1 AS DOUBLE) * CAST(nv.n - 1 AS DOUBLE)
       * CAST(nv.n - 2 AS DOUBLE)) + 0.5) AS BIGINT) AS c_e9
FROM bg, nv
UNION ALL
SELECT 'closeness' AS measure,
  CAST(FLOOR(CAST(cg.gap + (nv.n - cg.cnt) * cg.mx AS DOUBLE) * 10.0
    / (CAST(nv.n - 1 AS DOUBLE) * (1.0 - 1.0 / CAST(nv.n AS DOUBLE)))
    + 0.5) AS BIGINT) AS c_e9
FROM cg, nv
ORDER BY measure
"""


HULL_N, HULL_SEED, HULL_MOD = 48, 31, 2_000_003


def _hull_points() -> "pa.Table":
    import hashlib

    v = np.arange(HULL_N, dtype=np.int64)
    x = np.array([int(hashlib.md5(f"hx:{HULL_SEED}:{i}".encode())
                      .hexdigest()[:8], 16) % HULL_MOD for i in v],
                 np.int64)
    y = np.array([int(hashlib.md5(f"hy:{HULL_SEED}:{i}".encode())
                      .hexdigest()[:8], 16) % HULL_MOD for i in v],
                 np.int64)
    assert len({(int(a), int(b)) for a, b in zip(x, y)}) == HULL_N
    return pa.table({"vertex": pa.array(v), "x": pa.array(x),
                     "y": pa.array(y)})


def q_convex_hull(sf_dir: str):
    """Convex hull extreme points (igraph_convex_hull, other.c:121) of
    a 48-point md5 integer cloud: (vertex, x, y) of the hull VERTICES
    (strict turns — collinear boundary points are not extreme).
    Engine = Andrew's monotone chain, exact int64 cross products, one
    guarded task (the reference's hull is likewise a sequential scan);
    oracle = the definitional extreme-point test — p is NOT a hull
    vertex iff it lies in a nondegenerate triangle of three other
    points (sign test) or on a segment between two others. Exact
    integer arithmetic on both sides."""
    from igraph_ray.ops.geometry import convex_hull

    return convex_hull(ray.data.from_arrow(_hull_points())).sort("vertex")


def _sql_convex_hull() -> str:
    # points are tiny and md5-deterministic: inline them as VALUES —
    # the ORACLE part (containment) is the definitional computation
    t = _hull_points()
    rows = ", ".join(
        f"({int(a)}, {int(b)}, {int(c)})"
        for a, b, c in zip(t["vertex"].to_pylist(), t["x"].to_pylist(),
                           t["y"].to_pylist()))
    return f"""
WITH pts AS (SELECT CAST(v AS BIGINT) AS v, CAST(x AS BIGINT) AS x,
  CAST(y AS BIGINT) AS y FROM (VALUES {rows}) AS t(v, x, y)),
raw AS (
  SELECT p.v AS v,
    ((b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x)) AS area,
    ((b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x)) AS s1,
    ((c.x - b.x) * (p.y - b.y) - (c.y - b.y) * (p.x - b.x)) AS s2,
    ((a.x - c.x) * (p.y - c.y) - (a.y - c.y) * (p.x - c.x)) AS s3
  FROM pts p, pts a, pts b, pts c
  WHERE a.v < b.v AND b.v < c.v
    AND p.v != a.v AND p.v != b.v AND p.v != c.v),
tri AS (
  SELECT v FROM raw
  WHERE area != 0
    AND ((s1 >= 0 AND s2 >= 0 AND s3 >= 0)
         OR (s1 <= 0 AND s2 <= 0 AND s3 <= 0))
),
seg AS (
  SELECT p.v FROM pts p, pts a, pts b
  WHERE a.v < b.v AND p.v != a.v AND p.v != b.v
    AND ((b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x)) = 0
    AND (p.x - a.x) * (p.x - b.x) <= 0
    AND (p.y - a.y) * (p.y - b.y) <= 0
),
inner_pts AS (SELECT v FROM tri UNION SELECT v FROM seg)
SELECT CAST(v AS BIGINT) AS vertex, CAST(x AS BIGINT) AS x,
       CAST(y AS BIGINT) AS y
FROM pts WHERE v NOT IN (SELECT v FROM inner_pts) ORDER BY vertex
"""


BP_N1, BP_N2, BP_P_E6, BP_SEED = 40, 60, 120_000, 23
BPM_M, BPM_SEED = 500, 29


def q_bipartite_gnp(sf_dir: str):
    """Random bipartite G(n1, n2, p) (igraph_bipartite_game_gnp,
    bipartite.c:867): md5-Bernoulli per pair, exact thresholds —
    full DuckDB replay oracle."""
    from igraph_ray.sources.games import bipartite_gnp

    return bipartite_gnp(BP_N1, BP_N2, BP_P_E6,
                         seed=BP_SEED).sort(["src", "dst"])


def _sql_bipartite_gnp() -> str:
    HEX15 = 16 ** 15
    thr = BP_P_E6 * HEX15 // 1_000_000
    fold = "CAST(0 AS BIGINT)"
    for kk in range(1, 16):
        fold = (f"(({fold}) * 16 + "
                f"(strpos('0123456789abcdef', substr(h, {kk}, 1)) - 1))")
    return f"""
WITH pairs AS (
  SELECT a.i AS i, {BP_N1} + b.j AS j
  FROM (SELECT UNNEST(range({BP_N1})) AS i) a,
       (SELECT UNNEST(range({BP_N2})) AS j) b),
hs AS (SELECT i, j, md5('{BP_SEED}:bp:' || CAST(i AS VARCHAR) || ':'
  || CAST(j AS VARCHAR)) AS h FROM pairs)
SELECT CAST(i AS BIGINT) AS src, CAST(j AS BIGINT) AS dst
FROM (SELECT i, j, {fold} AS r FROM hs) t
WHERE r < CAST({thr} AS BIGINT) ORDER BY src, dst
"""


def q_bipartite_gnm(sf_dir: str):
    """Random bipartite G(n1, n2, m) (igraph_bipartite_game_gnm,
    bipartite.c:958): exactly m edges by md5-rank selection (the m
    smallest (fold, i, j) over the pair space) — one distributed
    sort+limit; ORDER BY ... LIMIT oracle."""
    from igraph_ray.sources.games import bipartite_gnm

    return bipartite_gnm(BP_N1, BP_N2, BPM_M,
                         seed=BPM_SEED).sort(["src", "dst"])


def _sql_bipartite_gnm() -> str:
    fold = "CAST(0 AS BIGINT)"
    for kk in range(1, 16):
        fold = (f"(({fold}) * 16 + "
                f"(strpos('0123456789abcdef', substr(h, {kk}, 1)) - 1))")
    return f"""
WITH pairs AS (
  SELECT a.i AS i, {BP_N1} + b.j AS j
  FROM (SELECT UNNEST(range({BP_N1})) AS i) a,
       (SELECT UNNEST(range({BP_N2})) AS j) b),
hs AS (SELECT i, j, md5('{BPM_SEED}:bm:' || CAST(i AS VARCHAR) || ':'
  || CAST(j AS VARCHAR)) AS h FROM pairs),
f AS (SELECT i, j, {fold} AS fold FROM hs),
sel AS (SELECT i, j FROM f ORDER BY fold, i, j LIMIT {BPM_M})
SELECT CAST(i AS BIGINT) AS src, CAST(j AS BIGINT) AS dst FROM sel
ORDER BY src, dst
"""


def q_full_bipartite(sf_dir: str):
    """igraph_full_bipartite (bipartite.c:388): the complete bipartite
    K(8, 11) — closed-form cross-join oracle."""
    from igraph_ray.sources.games import full_bipartite

    return full_bipartite(8, 11).sort(["src", "dst"])


_SQL_FULL_BIPARTITE = """
SELECT CAST(a.i AS BIGINT) AS src, CAST(8 + b.j AS BIGINT) AS dst
FROM (SELECT UNNEST(range(8)) AS i) a,
     (SELECT UNNEST(range(11)) AS j) b
ORDER BY src, dst
"""


REWIRE_PROB_E6, REWIRE_SEED = 300_000, 19


def q_rewire_edges(sf_dir: str):
    """Probabilistic endpoint rewiring (igraph_rewire_edges,
    games.c:2843, multiple=True, loops=False) of the sparse derived
    digraph at p=0.3 — md5-deterministic per canonical endpoint index,
    side b drawn against the already-rewired side a exactly like the
    reference's in-order endpoint walk. Oracle = ROW_NUMBER over the
    same (src, dst) order + the same fold/threshold arithmetic."""
    from igraph_ray.ops.rewire import rewire_edges

    out = rewire_edges(derive.edges_sparse(sf_dir), n=derive.V,
                       prob_e6=REWIRE_PROB_E6, seed=REWIRE_SEED)
    return out.sort(["src", "dst"])


def _sql_rewire_edges() -> str:
    thr = REWIRE_PROB_E6 * (1 << 32) // 1_000_000
    n = derive.V
    folds = {k: _sql_fold8(f"h{k}") for k in ("a", "ra", "b", "rb")}
    return f"""
WITH e AS MATERIALIZED ({derive.SQL_EDGES_SPARSE}),
r AS (SELECT src, dst,
  ROW_NUMBER() OVER (ORDER BY src, dst) - 1 AS idx FROM e),
h AS (SELECT src, dst,
  md5('{REWIRE_SEED}:a:' || CAST(idx AS VARCHAR)) AS ha,
  md5('{REWIRE_SEED}:ra:' || CAST(idx AS VARCHAR)) AS hra,
  md5('{REWIRE_SEED}:b:' || CAST(idx AS VARCHAR)) AS hb,
  md5('{REWIRE_SEED}:rb:' || CAST(idx AS VARCHAR)) AS hrb
FROM r),
f AS (SELECT src, dst, {folds['a']} AS fa, {folds['ra']} AS fra,
  {folds['b']} AS fb, {folds['rb']} AS frb FROM h),
s1 AS (SELECT dst, fb, frb,
  CASE WHEN fa < {thr} THEN
    (CASE WHEN (fra % {n - 1}) != dst THEN fra % {n - 1}
          ELSE {n - 1} END)
  ELSE src END AS nsrc FROM f),
s2 AS (SELECT nsrc,
  CASE WHEN fb < {thr} THEN
    (CASE WHEN (frb % {n - 1}) != nsrc THEN frb % {n - 1}
          ELSE {n - 1} END)
  ELSE dst END AS ndst FROM s1)
SELECT CAST(nsrc AS BIGINT) AS src, CAST(ndst AS BIGINT) AS dst
FROM s2 ORDER BY src, dst
"""


def q_convergence_degree(sf_dir: str):
    """Per-edge geodesic field sizes (igraph_convergence_degree,
    structural_properties.c:4082) over the dense derived digraph:
    (src, dst, ins, outs) with ins = sources whose shortest-path DAG
    uses the edge and outs = targets (the convergence degree
    (ins−outs)/(ins+outs) is derivable; the integers hash exactly).
    Engine = one all-sources K-column BFS + two counted self-joins of
    the distance table through the edge list; oracle = the shared
    unrolled all-pairs body + the same two joins."""
    from igraph_ray.algorithms.paths import convergence_degree

    return convergence_degree(derive.graph_a(sf_dir), num_partitions=8)


def _sql_convergence_degree(iters: int = 30) -> str:
    return f"""{_sql_allpairs_body(iters)},
ins AS (SELECT e.src AS u, e.dst AS v, COUNT(*) AS n
  FROM edges e
  JOIN p{iters} a ON a.t = e.src
  JOIN p{iters} b ON b.s = a.s AND b.t = e.dst AND b.d = a.d + 1
  GROUP BY 1, 2),
outs AS (SELECT e.src AS u, e.dst AS v, COUNT(*) AS n
  FROM edges e
  JOIN p{iters} a ON a.s = e.dst
  JOIN p{iters} b ON b.s = e.src AND b.t = a.t AND b.d = a.d + 1
  GROUP BY 1, 2)
SELECT i.u AS src, i.v AS dst, CAST(i.n AS BIGINT) AS ins,
       CAST(o.n AS BIGINT) AS outs
FROM ins i JOIN outs o ON o.u = i.u AND o.v = i.v
ORDER BY src, dst
"""


def _sql_path_length_hist(iters: int = _SSSP_ITERS) -> str:
    return (
        f"{_sql_allpairs_body(iters)}\n"
        f"SELECT CAST(d AS BIGINT) AS dist, COUNT(*) AS count FROM p{iters} "
        f"WHERE s != t GROUP BY d ORDER BY dist"
    )


def _sql_avg_path_length(iters: int = _SSSP_ITERS) -> str:
    return (
        f"{_sql_allpairs_body(iters)}\n"
        f"SELECT CAST(COUNT(*) AS BIGINT) AS total_pairs, "
        f"CAST(SUM(d) AS BIGINT) AS dist_sum, "
        f"CAST(round_even(CAST(SUM(d) AS DOUBLE)/COUNT(*)*1e9, 0) AS BIGINT) "
        f"AS avg_e9 FROM p{iters} WHERE s != t"
    )


def _sql_closeness(iters: int = _SSSP_ITERS) -> str:
    return (
        f"{_sql_allpairs_body(iters)}\n"
        f"SELECT s AS vertex, "
        f"CAST(round_even(CAST(cnt AS DOUBLE)/sumd*1e8, 0) AS BIGINT) AS closeness_e8 "
        f"FROM (SELECT s, COUNT(*) AS cnt, SUM(d) AS sumd FROM p{iters} "
        f"WHERE s != t GROUP BY s) q WHERE sumd > 0 ORDER BY vertex"
    )


def _sql_harmonic(iters: int = _SSSP_ITERS) -> str:
    # exact integer numerator over lcm(1..20) — mirrors
    # algorithms/paths.harmonic_centrality's order-free rational sum
    L = 232792560
    return (
        f"{_sql_allpairs_body(iters)}\n"
        f"SELECT s AS vertex, "
        f"CAST(round_even(CAST(n AS DOUBLE)*1e8/{L}, 0) AS BIGINT) AS harmonic_e8 "
        f"FROM (SELECT s, SUM(CAST({L} AS BIGINT) // d) AS n FROM p{iters} "
        f"WHERE s != t GROUP BY s) q ORDER BY vertex"
    )


def q_neighborhood_sketches(sf_dir: str):
    """HyperANF-style HLL registers of every vertex's out-reachability
    ball (algorithms/hll.py) over the very-sparse view — the estimator a
    100-TB engine runs instead of exact all-pairs; converged registers
    are exact integers, hash-compared against a reach-CTE oracle."""
    from igraph_ray.algorithms.hll import M, neighborhood_sketches

    st = neighborhood_sketches(derive.graph_vsparse(sf_dir),
                               num_partitions=8).state
    cols = ["vertex"] + [f"r{b}" for b in range(M)]
    return st.select_columns(cols).sort("vertex")


def _sql_neighborhood_sketches() -> str:
    hexd = "0123456789abcdef"
    # x = 16-bit int of md5 hex chars 2..5; rho = 17 - bit_length(x)
    xs = " + ".join(
        f"(strpos('{hexd}', substr(h, {i + 2}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )
    ladder = " ".join(
        f"WHEN x >= {1 << (k - 1)} THEN {17 - k}" for k in range(16, 0, -1)
    )
    regs = ", ".join(
        f"CAST(MAX(CASE WHEN ru.b = {b} THEN ru.rho ELSE 0 END) AS BIGINT) AS r{b}"
        for b in range(8)
    )
    return f"""
WITH RECURSIVE edges AS MATERIALIZED ({derive.SQL_EDGES_VSPARSE}),
verts AS MATERIALIZED (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
reach(v, u) AS (SELECT v, v FROM verts
                UNION SELECT r.v, e.dst FROM reach r JOIN edges e ON e.src = r.u),
hh AS (SELECT v, md5(CAST(v AS VARCHAR)) AS h FROM verts),
ru AS (SELECT v AS u,
              (strpos('{hexd}', substr(h, 1, 1)) - 1) % 8 AS b,
              CASE WHEN x = 0 THEN 17 {ladder} END AS rho
       FROM (SELECT v, h, {xs} AS x FROM hh))
SELECT r.v AS vertex, {regs}
FROM reach r JOIN ru ON ru.u = r.u GROUP BY r.v ORDER BY vertex"""


def q_harmonic_sampled(sf_dir: str):
    """Target-sampled harmonic centrality — the estimation path when
    all-pairs distances are impossible (Eppstein–Wang style): targets
    are the deterministic ~25% md5-prefix sample, the partial sum
    Σ_{t∈S} 1/d(v,t) reported as the exact lcm(1..20) integer numerator
    (un-scaled; the estimate is |V|/|S| × hnum_s/lcm)."""
    import hashlib as _hl

    from igraph_ray.algorithms.paths import _HARMONIC_LCM, multi_source_hops
    from igraph_ray.util import universe_zeros

    g = derive.graph_a(sf_dir)

    def _samp(b: pa.Table) -> pa.Table:
        v = b["vertex"].to_numpy(zero_copy_only=False)
        keep = np.array([
            _hl.md5(str(int(x)).encode()).hexdigest()[0] < "4" for x in v])
        return pa.table({"vertex": pa.array(v[keep])})

    targets = sorted(int(r["vertex"]) for r in
                     g.vertices().map_batches(
                         _samp, batch_format="pyarrow",
                         batch_size=None).take_all())
    d = multi_source_hops(g, targets, variant="rev", num_partitions=8)

    def _num(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "dist" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64())})
        dd = b["dist"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = dd > 0
        t = pa.table({"vertex": pa.array(v[keep]),
                      "h": pa.array(_HARMONIC_LCM // dd[keep])})
        return (pa.TableGroupBy(t, "vertex").aggregate([("h", "sum")])
                .rename_columns(["vertex", "h"]))

    out = (d.map_batches(_num, batch_format="pyarrow", batch_size=None)
           .union(universe_zeros(g.vertices(), "h"))
           .groupby("vertex").sum("h"))

    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vertex" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "hnum_s": pa.array([], pa.int64())})
        return pa.table({"vertex": b["vertex"],
                         "hnum_s": pc.cast(b["sum(h)"], pa.int64())})

    return out.map_batches(_rn, batch_format="pyarrow",
                           batch_size=None).sort("vertex")


def q_closeness_sampled(sf_dir: str):
    """Target-sampled closeness components: per vertex the exact integer
    pair (reached_s, dist_sum_s) over the md5 ~25% target sample — the
    Eppstein–Wang estimation inputs (closeness_est = reached_s² scaled
    by sample fraction / dist_sum_s)."""
    import hashlib as _hl

    from igraph_ray.algorithms.paths import multi_source_hops
    from igraph_ray.util import universe_zeros

    g = derive.graph_a(sf_dir)

    def _samp(b: pa.Table) -> pa.Table:
        v = b["vertex"].to_numpy(zero_copy_only=False)
        keep = np.array([
            _hl.md5(str(int(x)).encode()).hexdigest()[0] < "4" for x in v])
        return pa.table({"vertex": pa.array(v[keep])})

    targets = sorted(int(r["vertex"]) for r in
                     g.vertices().map_batches(
                         _samp, batch_format="pyarrow",
                         batch_size=None).take_all())
    d = multi_source_hops(g, targets, variant="rev", num_partitions=8)

    def _agg(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "dist" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "reached_s": pa.array([], pa.int64()),
                             "dist_sum_s": pa.array([], pa.int64())})
        dd = b["dist"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = dd > 0
        t = pa.table({"vertex": pa.array(v[keep]),
                      "reached_s": pa.array(np.ones(int(keep.sum()), np.int64)),
                      "dist_sum_s": pa.array(dd[keep])})
        return (pa.TableGroupBy(t, "vertex")
                .aggregate([("reached_s", "sum"), ("dist_sum_s", "sum")])
                .rename_columns(["vertex", "reached_s", "dist_sum_s"]))

    z = universe_zeros(g.vertices(), "reached_s").map_batches(
        lambda b: pa.table({"vertex": b["vertex"],
                            "reached_s": b["reached_s"],
                            "dist_sum_s": pa.array(
                                np.zeros(b.num_rows, np.int64))}),
        batch_format="pyarrow", batch_size=None)
    out = (d.map_batches(_agg, batch_format="pyarrow", batch_size=None)
           .union(z).groupby("vertex").sum(["reached_s", "dist_sum_s"]))

    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vertex" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "reached_s": pa.array([], pa.int64()),
                             "dist_sum_s": pa.array([], pa.int64())})
        return pa.table({"vertex": b["vertex"],
                         "reached_s": pc.cast(b["sum(reached_s)"], pa.int64()),
                         "dist_sum_s": pc.cast(b["sum(dist_sum_s)"], pa.int64())})

    return out.map_batches(_rn, batch_format="pyarrow",
                           batch_size=None).sort("vertex")


def _sql_closeness_sampled(iters: int = _SSSP_ITERS) -> str:
    return (
        f"{_sql_allpairs_body(iters)}\n"
        f"SELECT verts.v AS vertex, "
        f"CAST(COALESCE(q.r, 0) AS BIGINT) AS reached_s, "
        f"CAST(COALESCE(q.ds, 0) AS BIGINT) AS dist_sum_s "
        f"FROM verts LEFT JOIN ("
        f"SELECT s, COUNT(*) AS r, SUM(d) AS ds FROM p{iters} "
        f"WHERE s != t AND substr(md5(CAST(t AS VARCHAR)), 1, 1) < '4' "
        f"GROUP BY s) q ON q.s = verts.v ORDER BY vertex"
    )


def _sql_harmonic_sampled(iters: int = _SSSP_ITERS) -> str:
    L = 232792560
    return (
        f"{_sql_allpairs_body(iters)}\n"
        f"SELECT verts.v AS vertex, CAST(COALESCE(q.n, 0) AS BIGINT) AS hnum_s "
        f"FROM verts LEFT JOIN ("
        f"SELECT s, SUM(CAST({L} AS BIGINT) // d) AS n FROM p{iters} "
        f"WHERE s != t AND substr(md5(CAST(t AS VARCHAR)), 1, 1) < '4' "
        f"GROUP BY s) q ON q.s = verts.v ORDER BY vertex"
    )


def _sql_eccentricity(iters: int = _SSSP_ITERS) -> str:
    return (
        f"{_sql_allpairs_body(iters)}\n"
        f"SELECT s AS vertex, CAST(MAX(d) AS BIGINT) AS ecc FROM p{iters} "
        f"WHERE s != t GROUP BY s ORDER BY vertex"
    )


def _sql_graph_center(iters: int = _SSSP_ITERS) -> str:
    return (
        f"{_sql_allpairs_body(iters)}\n"
        f"SELECT vertex FROM ("
        f"SELECT s AS vertex, MAX(d) AS ecc FROM p{iters} WHERE s != t "
        f"GROUP BY s) q "
        f"WHERE ecc = (SELECT MIN(ecc) FROM ("
        f"SELECT MAX(d) AS ecc FROM p{iters} WHERE s != t GROUP BY s)) "
        f"ORDER BY vertex"
    )


def _sql_diameter(iters: int = _SSSP_ITERS) -> str:
    return (
        f"{_sql_allpairs_body(iters)}\n"
        f"SELECT CAST(MAX(d) AS BIGINT) AS diameter, "
        f"(SELECT CAST(MIN(m) AS BIGINT) FROM ("
        f"SELECT MAX(d) AS m FROM p{iters} WHERE s != t GROUP BY s) e) AS radius "
        f"FROM p{iters} WHERE s != t"
    )


def _sql_coreness_core(iters: int = 40, distinct: bool = False) -> str:
    """Unrolled h-operator recurrence (see algorithms/kcore.py): c0 = sym
    degree; c_k(v) = min(c_{k-1}(v), h-index of neighbor c_{k-1}s) with
    h-index = MAX(LEAST(rank_desc, value)). distinct=True = simple-graph
    view (k_core), False = multigraph view (coreness)."""
    u = "UNION" if distinct else "UNION ALL"
    parts = [
        f"WITH edges AS MATERIALIZED ({SQL_EDGES_A})",
        f"verts AS MATERIALIZED ({SQL_VERTS_A})",
        f"sym AS MATERIALIZED (SELECT src, dst FROM edges {u} SELECT dst, src FROM edges)",
        "c0 AS MATERIALIZED (SELECT verts.v, COALESCE(d.n, 0) AS c FROM verts "
        "LEFT JOIN (SELECT src, COUNT(*) AS n FROM sym GROUP BY src) d ON d.src = verts.v)",
    ]
    for k in range(1, iters + 1):
        prev = f"c{k-1}"
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT c.v, LEAST(c.c, COALESCE(h.h, 0)) AS c "
            f"FROM {prev} c LEFT JOIN (SELECT dst AS v, MAX(LEAST(rn, nc)) AS h FROM ("
            f"SELECT s.dst, p.c AS nc, ROW_NUMBER() OVER (PARTITION BY s.dst ORDER BY p.c DESC) AS rn "
            f"FROM sym s JOIN {prev} p ON p.v = s.src) GROUP BY dst) h ON h.v = c.v)"
        )
    return ",\n".join(parts) + f"\n-- final table c{iters}"


def _sql_coreness(iters: int = 40) -> str:
    return (
        _sql_coreness_core(iters, distinct=False).replace(f"-- final table c{iters}", "")
        + f"SELECT v AS vertex, CAST(c AS BIGINT) AS coreness FROM c{iters} ORDER BY vertex"
    )


def _sql_k_core(k: int = 5, iters: int = 40) -> str:
    return (
        _sql_coreness_core(iters, distinct=True).replace(f"-- final table c{iters}", "")
        + f"SELECT v AS vertex FROM c{iters} WHERE c >= {k} ORDER BY vertex"
    )


# ---------------------------------------------------- sketch-family oracles
# SQL mirrors of the md5-word-hash + splitmix64 family in ops/dedup.py —
# md5_number_upper(w) == struct.unpack("<Q", md5(w).digest()[:8]) exactly,
# and UHUGEINT mod-2^64 arithmetic reproduces numpy uint64 wraparound.
# CAUTION: DuckDB SUM over UHUGEINT goes through DOUBLE (silent rounding
# above 2^53) — all power-of-two folds sum HUGEINT instead.

_M64 = "18446744073709551616::UHUGEINT"
_GOLDEN64 = 0x9E3779B97F4A7C15
_MIX1_64 = 0xBF58476D1CE4E5B9
_MIX2_64 = 0x94D049BB133111EB


def _sm_sql(x: str) -> str:
    """splitmix64 of a (< 2^64) UHUGEINT-typed SQL expression."""
    a = f"xor(({x})::UBIGINT::UHUGEINT, ((({x})::UBIGINT) >> 30)::UHUGEINT)"
    s1 = f"((({a}) * {_MIX1_64}::UHUGEINT) % {_M64})"
    b = f"xor(({s1})::UBIGINT::UHUGEINT, ((({s1})::UBIGINT) >> 27)::UHUGEINT)"
    s2 = f"((({b}) * {_MIX2_64}::UHUGEINT) % {_M64})"
    c = f"xor(({s2})::UBIGINT::UHUGEINT, ((({s2})::UBIGINT) >> 31)::UHUGEINT)"
    return f"({c})"


def _sql_simhash() -> str:
    pow2 = ", ".join(f"({j}, {1 << j}::HUGEINT)" for j in range(64))
    return rf"""
WITH pw(j, p) AS (VALUES {pow2}),
w AS (
  SELECT doc_id, md5_number_upper(word) AS h
  FROM (SELECT doc_id, UNNEST(string_split_regex(text, '\s+')) AS word FROM documents)
  WHERE word <> ''
),
b AS (
  SELECT doc_id, j, SUM(CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END) AS acc
  FROM w CROSS JOIN (SELECT UNNEST(range(64)) AS j)
  GROUP BY doc_id, j
),
s AS (SELECT b.doc_id, SUM(CASE WHEN b.acc > 0 THEN pw.p ELSE 0::HUGEINT END) AS sh
      FROM b JOIN pw ON pw.j = b.j GROUP BY b.doc_id)
SELECT d.doc_id,
       (CASE WHEN COALESCE(s.sh, 0::HUGEINT) >= 9223372036854775808::HUGEINT
             THEN COALESCE(s.sh, 0::HUGEINT) - 18446744073709551616::HUGEINT
             ELSE COALESCE(s.sh, 0::HUGEINT) END)::BIGINT AS simhash
FROM documents d LEFT JOIN s USING (doc_id) ORDER BY doc_id"""


def _sql_minhash_core(num_hashes=64, bands=16, shingle_k=3, max_bucket=200) -> str:
    rpb = num_hashes // bands
    # band-key fold as CHAINED CTE stages (f0..f{rpb}) — nesting the
    # splitmix macro textually blows up ~6x per level
    fold_ctes = [
        f"f0 AS (SELECT doc_id, band, "
        + ", ".join(f"s{r}" for r in range(rpb))
        + f", (((band+1)::UHUGEINT * {_GOLDEN64}::UHUGEINT) % {_M64})::UBIGINT AS acc FROM piv)"
    ]
    for r in range(rpb):
        keep = ", ".join(f"s{q}" for q in range(r + 1, rpb))
        keep = (keep + ", ") if keep else ""
        fold_ctes.append(
            f"f{r+1} AS (SELECT doc_id, band, {keep}"
            + _sm_sql(f"xor(acc::UHUGEINT, s{r}::UHUGEINT)")
            + "::UBIGINT AS acc FROM f" + str(r) + ")"
        )
    fold_sql = ",\n".join(fold_ctes)
    piv_cols = ",\n         ".join(
        f"MAX(CASE WHEN r = {r} THEN s END) AS s{r}" for r in range(rpb)
    )
    small_shingle = _sm_sql(f"SUM(t.pos::UHUGEINT * t.w::UHUGEINT) % {_M64}")
    big_shingle = _sm_sql(
        "(" + " + ".join(f"{j+1}::UHUGEINT*{c}.w" for j, c in enumerate("abc"[:shingle_k]))
        + f") % {_M64}"
    )
    sig_hash = _sm_sql(f"(sh::UHUGEINT + h::UHUGEINT * {_GOLDEN64}::UHUGEINT) % {_M64}")
    joins = " ".join(
        f"JOIN toks {c} ON {c}.doc_id = a.doc_id AND {c}.pos = a.pos + {j}"
        for j, c in enumerate("abc"[:shingle_k]) if j > 0
    )
    return rf"""
WITH toks AS (
  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS pos,
         word, md5_number_upper(word) AS w
  FROM (
    SELECT doc_id, UNNEST(string_split_regex(text, '\s+')) AS word,
           UNNEST(range(1, len(string_split_regex(text, '\s+')) + 1)) AS i
    FROM documents
  ) WHERE word <> ''
),
nw AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
sh_big AS (
  SELECT a.doc_id, {big_shingle}::UBIGINT AS sh
  FROM toks a {joins}
  WHERE a.doc_id IN (SELECT doc_id FROM nw WHERE n >= {shingle_k})
),
sh_small AS (
  SELECT t.doc_id, {small_shingle}::UBIGINT AS sh
  FROM toks t WHERE t.doc_id IN (SELECT doc_id FROM nw WHERE n < {shingle_k})
  GROUP BY t.doc_id
),
sh_empty AS (
  SELECT d.doc_id, {_sm_sql("0::UHUGEINT")}::UBIGINT AS sh FROM documents d
  WHERE d.doc_id NOT IN (SELECT doc_id FROM nw)
),
shingles AS (SELECT * FROM sh_big UNION ALL SELECT * FROM sh_small UNION ALL SELECT * FROM sh_empty),
sig AS (
  SELECT doc_id, h, MIN({sig_hash}::UBIGINT) AS s
  FROM shingles CROSS JOIN (SELECT UNNEST(range({num_hashes})) AS h)
  GROUP BY doc_id, h
),
bandrows AS (SELECT doc_id, h // {rpb} AS band, h % {rpb} AS r, s FROM sig),
piv AS (
  SELECT doc_id, band,
         {piv_cols}
  FROM bandrows GROUP BY doc_id, band
),
{fold_sql},
keys AS (SELECT doc_id, (acc >> 1)::BIGINT AS band_key FROM f{rpb}),
bk AS (SELECT DISTINCT band_key, doc_id FROM keys),
bsz AS (SELECT band_key, COUNT(*) AS c FROM bk GROUP BY band_key),
pair_small AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM bk x JOIN bk y ON y.band_key = x.band_key AND y.doc_id > x.doc_id
  WHERE x.band_key IN (SELECT band_key FROM bsz WHERE c BETWEEN 2 AND {max_bucket})
),
pair_star AS (
  SELECT m.mn AS a, y.doc_id AS b
  FROM (SELECT band_key, MIN(doc_id) AS mn FROM bk GROUP BY band_key) m
  JOIN bk y ON y.band_key = m.band_key AND y.doc_id > m.mn
  WHERE m.band_key IN (SELECT band_key FROM bsz WHERE c > {max_bucket})
),
cands AS (SELECT DISTINCT a, b FROM (SELECT * FROM pair_small UNION ALL SELECT * FROM pair_star))"""


def _sql_minhash_pairs() -> str:
    return _sql_minhash_core() + "\nSELECT a, b FROM cands ORDER BY a, b"


def _sql_ngram_dups(shingle_k=3) -> str:
    return _sql_minhash_core() + rf"""
, shtxt AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT a.doc_id, a.word || ' ' || b.word || ' ' || c.word AS sh
    FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
    WHERE a.doc_id IN (SELECT doc_id FROM nw WHERE n >= {shingle_k})
    UNION ALL
    SELECT t.doc_id, string_agg(t.word, ' ' ORDER BY t.pos) AS sh
    FROM toks t WHERE t.doc_id IN (SELECT doc_id FROM nw WHERE n < {shingle_k}) GROUP BY t.doc_id
    UNION ALL
    SELECT d.doc_id, '' AS sh FROM documents d WHERE d.doc_id NOT IN (SELECT doc_id FROM nw)
  )
),
sz AS (SELECT doc_id, COUNT(*) AS c FROM shtxt GROUP BY doc_id),
inter AS (
  SELECT cd.a, cd.b, COUNT(*) AS i
  FROM cands cd JOIN shtxt x ON x.doc_id = cd.a JOIN shtxt y ON y.doc_id = cd.b AND y.sh = x.sh
  GROUP BY cd.a, cd.b
),
jac AS (
  SELECT cd.a, cd.b, COALESCE(it.i, 0) AS i, sa.c AS na, sb.c AS nb
  FROM cands cd LEFT JOIN inter it ON it.a = cd.a AND it.b = cd.b
  JOIN sz sa ON sa.doc_id = cd.a JOIN sz sb ON sb.doc_id = cd.b
)
SELECT a, b, CAST(round_even(1e6 * i / (na + nb - i), 0) AS BIGINT) AS jaccard_e6
FROM jac WHERE 2*i >= na + nb - i ORDER BY a, b"""


def _sql_components() -> str:
    return (
        _SQL_CC_CORE
        + "SELECT m.v AS vertex, r.rank AS label FROM minl m JOIN ranks r USING (ml) ORDER BY vertex"
    )


def _sql_component_sizes() -> str:
    return (
        _SQL_CC_CORE
        + "SELECT r.rank AS label, COUNT(*) AS csize FROM minl m JOIN ranks r USING (ml) GROUP BY r.rank ORDER BY label"
    )


def _sql_lpa(iters: int = LPA_ITERS) -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({SQL_EDGES_A})",
        f"verts AS MATERIALIZED ({SQL_VERTS_A})",
        # engine symmetrization keeps both directions of reciprocal edges
        # (multigraph tally), hence UNION ALL
        "sym AS MATERIALIZED (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)",
        "l0 AS MATERIALIZED (SELECT v, v AS lab FROM verts)",
    ]
    for k in range(1, iters + 1):
        p = f"l{k-1}"
        parts.append(
            f"t{k} AS MATERIALIZED (SELECT s.dst AS v, p.lab, COUNT(*) AS c FROM sym s "
            f"JOIN {p} p ON p.v = s.src GROUP BY s.dst, p.lab)"
        )
        parts.append(
            f"w{k} AS MATERIALIZED (SELECT v, lab FROM (SELECT v, lab, ROW_NUMBER() OVER "
            f"(PARTITION BY v ORDER BY c DESC, lab ASC) AS rn FROM t{k}) WHERE rn = 1)"
        )
        parts.append(
            f"l{k} AS MATERIALIZED (SELECT p.v, COALESCE(w.lab, p.lab) AS lab FROM {p} p "
            f"LEFT JOIN w{k} w ON w.v = p.v)"
        )
    last = f"l{iters}"
    parts.append(f"minv AS (SELECT lab, MIN(v) AS mv FROM {last} GROUP BY lab)")
    parts.append(
        "ranks AS (SELECT mv, CAST(DENSE_RANK() OVER (ORDER BY mv) - 1 AS BIGINT) AS rank "
        "FROM (SELECT DISTINCT mv FROM minv))"
    )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT l.v AS vertex, r.rank AS community FROM {last} l "
        f"JOIN minv m ON m.lab = l.lab JOIN ranks r ON r.mv = m.mv ORDER BY vertex"
    )


def _sql_lpa_weighted(iters: int = LPA_ITERS) -> str:
    parts = [
        f"WITH we AS MATERIALIZED ({derive.SQL_EDGES_A_W})",
        "verts AS MATERIALIZED (SELECT src AS v FROM we UNION SELECT dst FROM we)",
        "sym AS MATERIALIZED (SELECT src, dst, weight FROM we "
        "UNION ALL SELECT dst, src, weight FROM we)",
        "l0 AS MATERIALIZED (SELECT v, v AS lab FROM verts)",
    ]
    for k in range(1, iters + 1):
        p = f"l{k-1}"
        parts.append(
            f"t{k} AS MATERIALIZED (SELECT s.dst AS v, p.lab, "
            f"CAST(SUM(s.weight) AS BIGINT) AS c FROM sym s "
            f"JOIN {p} p ON p.v = s.src GROUP BY s.dst, p.lab)"
        )
        parts.append(
            f"w{k} AS MATERIALIZED (SELECT v, lab FROM (SELECT v, lab, ROW_NUMBER() OVER "
            f"(PARTITION BY v ORDER BY c DESC, lab ASC) AS rn FROM t{k}) WHERE rn = 1)"
        )
        parts.append(
            f"l{k} AS MATERIALIZED (SELECT p.v, COALESCE(w.lab, p.lab) AS lab FROM {p} p "
            f"LEFT JOIN w{k} w ON w.v = p.v)"
        )
    last = f"l{iters}"
    parts.append(f"minv AS (SELECT lab, MIN(v) AS mv FROM {last} GROUP BY lab)")
    parts.append(
        "ranks AS (SELECT mv, CAST(DENSE_RANK() OVER (ORDER BY mv) - 1 AS BIGINT) AS rank "
        "FROM (SELECT DISTINCT mv FROM minv))"
    )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT l.v AS vertex, r.rank AS community FROM {last} l "
        f"JOIN minv m ON m.lab = l.lab JOIN ranks r ON r.mv = m.mv ORDER BY vertex"
    )


_SQL_TRIANGLES = f"""
WITH edges AS ({SQL_EDGES_A}),
verts AS ({SQL_VERTS_A}),
und AS (SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi FROM edges),
degs AS (SELECT v, COUNT(*) AS deg FROM
  (SELECT lo AS v FROM und UNION ALL SELECT hi FROM und) GROUP BY v),
orient AS (
  SELECT CASE WHEN (dl.deg < dh.deg) OR (dl.deg = dh.deg AND u.lo < u.hi)
              THEN u.lo ELSE u.hi END AS a,
         CASE WHEN (dl.deg < dh.deg) OR (dl.deg = dh.deg AND u.lo < u.hi)
              THEN u.hi ELSE u.lo END AS b
  FROM und u JOIN degs dl ON dl.v = u.lo JOIN degs dh ON dh.v = u.hi),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM orient e1
  JOIN orient e2 ON e2.a = e1.b
  JOIN orient e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
SELECT verts.v AS vertex, COALESCE(c.n, 0) AS triangles
FROM verts LEFT JOIN (SELECT v, COUNT(*) AS n FROM corners GROUP BY v) c ON c.v = verts.v
ORDER BY vertex
"""


def _sql_modularity() -> str:
    return (
        _SQL_CC_CORE
        + f""",
memb AS (SELECT m.v, r.rank AS c FROM minl m JOIN ranks r USING (ml)),
je AS (SELECT ms.c AS cs, md.c AS cd FROM edges e
       JOIN memb ms ON ms.v = e.src JOIN memb md ON md.v = e.dst),
m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS mm FROM je),
ec AS (SELECT cs AS c, SUM(CASE WHEN cs = cd THEN 2.0 ELSE 0 END) AS e FROM je GROUP BY cs),
ac AS (SELECT c, SUM(w) AS a FROM
  (SELECT cs AS c, 1.0 AS w FROM je UNION ALL SELECT cd, 1.0 FROM je) GROUP BY c),
q AS (SELECT SUM(COALESCE(ec.e,0)/(2*(SELECT mm FROM m)) -
              POW(ac.a/(2*(SELECT mm FROM m)), 2)) AS q
      FROM ac LEFT JOIN ec ON ec.c = ac.c)
SELECT CAST(ROUND(q*1e9) AS BIGINT) AS q_e9 FROM q"""
    )


def _sql_mis(rounds: int = 24) -> str:
    parts = [
        f"WITH und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS lo, "
        f"GREATEST(src, dst) AS hi FROM ({derive.SQL_EDGES_SPARSE}))",
        "sym AS MATERIALIZED (SELECT lo AS u, hi AS w FROM und "
        "UNION ALL SELECT hi, lo FROM und)",
        "verts AS MATERIALIZED (SELECT DISTINCT u AS v FROM sym)",
        "prio AS MATERIALIZED (SELECT v, "
        "substr(md5(CAST(v AS VARCHAR)), 1, 15) AS p FROM verts)",
        "s0 AS MATERIALIZED (SELECT v, 0 AS st FROM verts)",
    ]
    for k in range(1, rounds + 1):
        q = f"s{k-1}"
        parts.append(
            f"m{k} AS MATERIALIZED (SELECT s.w AS v, "
            f"MIN(CASE WHEN p1.st = 0 THEN pr.p END) AS mp, "
            f"MAX(CASE WHEN p1.st = 1 THEN 1 ELSE 0 END) AS f "
            f"FROM sym s JOIN {q} p1 ON p1.v = s.u "
            f"JOIN prio pr ON pr.v = s.u GROUP BY s.w)"
        )
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT s.v, CASE WHEN s.st != 0 THEN s.st "
            f"WHEN COALESCE(m.f, 0) = 1 THEN 2 "
            f"WHEN m.mp IS NULL OR pr.p < m.mp THEN 1 "
            f"ELSE 0 END AS st "
            f"FROM {q} s LEFT JOIN m{k} m ON m.v = s.v "
            f"JOIN prio pr ON pr.v = s.v)"
        )
    body = ",\n".join(parts)
    return (f"{body}\n"
            f"SELECT v AS vertex FROM s{rounds} WHERE st = 1 ORDER BY vertex")


def _sql_matching(rounds: int = 24) -> str:
    parts = [
        f"WITH a0 AS MATERIALIZED (SELECT lo, hi, "
        f"substr(md5(CAST(lo AS VARCHAR) || ',' || CAST(hi AS VARCHAR)), 1, 15)"
        f" AS p FROM (SELECT DISTINCT LEAST(src, dst) AS lo, "
        f"GREATEST(src, dst) AS hi FROM ({derive.SQL_EDGES_SPARSE})))",
    ]
    for k in range(1, rounds + 1):
        q = f"a{k-1}"
        parts.append(
            f"mn{k} AS MATERIALIZED (SELECT v, MIN(p) AS mp FROM "
            f"(SELECT lo AS v, p FROM {q} UNION ALL SELECT hi, p FROM {q}) "
            f"GROUP BY v)"
        )
        parts.append(
            f"sel{k} AS MATERIALIZED (SELECT e.lo, e.hi FROM {q} e "
            f"JOIN mn{k} m1 ON m1.v = e.lo AND m1.mp = e.p "
            f"JOIN mn{k} m2 ON m2.v = e.hi AND m2.mp = e.p)"
        )
        parts.append(
            f"mv{k} AS MATERIALIZED (SELECT lo AS v FROM sel{k} "
            f"UNION SELECT hi FROM sel{k})"
        )
        parts.append(
            f"a{k} AS MATERIALIZED (SELECT e.* FROM {q} e "
            f"WHERE e.lo NOT IN (SELECT v FROM mv{k}) "
            f"AND e.hi NOT IN (SELECT v FROM mv{k}))"
        )
    body = ",\n".join(parts)
    sels = " UNION ALL ".join(f"SELECT lo, hi FROM sel{k}"
                              for k in range(1, rounds + 1))
    return f"{body}\nSELECT lo, hi FROM ({sels}) ORDER BY lo, hi"


def _sql_modularity_weighted() -> str:
    return (
        _SQL_CC_CORE
        + f""",
memb AS (SELECT m.v, r.rank AS c FROM minl m JOIN ranks r USING (ml)),
we AS MATERIALIZED ({derive.SQL_EDGES_A_W}),
je AS (SELECT ms.c AS cs, md.c AS cd, CAST(e.weight AS DOUBLE) AS w FROM we e
       JOIN memb ms ON ms.v = e.src JOIN memb md ON md.v = e.dst),
m AS (SELECT CAST(SUM(w) AS DOUBLE) AS mm FROM je),
ec AS (SELECT cs AS c, SUM(CASE WHEN cs = cd THEN 2.0 * w ELSE 0 END) AS e
       FROM je GROUP BY cs),
ac AS (SELECT c, SUM(w) AS a FROM
  (SELECT cs AS c, w FROM je UNION ALL SELECT cd, w FROM je) GROUP BY c),
q AS (SELECT SUM(COALESCE(ec.e,0)/(2*(SELECT mm FROM m)) -
              POW(ac.a/(2*(SELECT mm FROM m)), 2)) AS q
      FROM ac LEFT JOIN ec ON ec.c = ac.c)
SELECT CAST(ROUND(q*1e9) AS BIGINT) AS qw_e9 FROM q"""
    )


_TOKEN_RE_SQL = r"[A-Za-z]+(?:''[A-Za-z]+)?|[0-9]+|[^\sA-Za-z0-9]"

_LANG_SQL_SCORES = {
    "en": ["the", "ing", "and", "ion", "ent"],
    "de": ["der", "sch", "ein", "ich", "und"],
    "fr": ["les", "ent", "que", "ion", "eur"],
    "es": ["que", "los", "ión", "ado", "nte"],
}


def _sql_lang_id() -> str:
    def score(lang):
        terms = [
            f"(length(low) - length(replace(low, '{t}', '')))/3"
            for t in _LANG_SQL_SCORES[lang]
        ]
        return " + ".join(terms)

    return f"""
WITH s AS (
  SELECT doc_id, lower(text) AS low FROM documents
), sc AS (
  SELECT doc_id,
    {score('en')} AS s_en,
    {score('de')} AS s_de,
    {score('fr')} AS s_fr,
    {score('es')} AS s_es
  FROM s
)
SELECT doc_id,
  CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'unknown'
       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
       WHEN s_fr >= s_es THEN 'fr'
       ELSE 'es' END AS lang_pred
FROM sc ORDER BY doc_id
"""


K_REGULAR_PARAMS = dict(n=40, k=3, seed=41)
STATIC_FITNESS_PARAMS = dict(n=30, m=80, seed=43)
ASYM_PREF_PARAMS = dict(
    n=36, type_dist=[[0.3, 0.2], [0.1, 0.4]],
    pref_e6=[[400_000, 100_000], [50_000, 300_000]], seed=47)
NONLINEAR_BARABASI_PARAMS = dict(n=48, m=2, power=2, zero_appeal=1,
                                 seed=53)


def q_k_regular(sf_dir: str):
    """igraph_k_regular_game (games.c:3828): 40 vertices, degree 3 —
    n*k stubs ranked by md5 digest, consecutive rank pairs become
    edges (distributed configuration pairing, full SQL replay)."""
    from igraph_ray.sources.games import k_regular_game

    p = K_REGULAR_PARAMS
    return k_regular_game(p["n"], p["k"], seed=p["seed"]).sort(
        ["src", "dst"])


def q_static_fitness(sf_dir: str):
    """igraph_static_fitness_game (games.c:3468): 80 directed edges,
    src ∝ out-fitness 1+(v%7), dst ∝ in-fitness 1+(v²%5) — indexed
    md5 roulettes, full SQL replay."""
    from igraph_ray.sources.games import static_fitness_game

    p = STATIC_FITNESS_PARAMS
    n = p["n"]
    fo = [1 + v % 7 for v in range(n)]
    fi = [1 + (v * v) % 5 for v in range(n)]
    return static_fitness_game(p["m"], fo, fi, seed=p["seed"]).sort(
        ["src", "dst"])


def q_asymmetric_preference(sf_dir: str):
    """igraph_asymmetric_preference_game (games.c:2428): 36 vertices,
    2 types, joint (in,out)-type blocks in floor proportions, per-pair
    md5 Bernoulli with pref[out(u)][in(v)] e6 thresholds — full SQL
    replay."""
    from igraph_ray.sources.games import asymmetric_preference_game

    p = ASYM_PREF_PARAMS
    edges, _ = asymmetric_preference_game(
        p["n"], p["type_dist"], p["pref_e6"], seed=p["seed"])
    return edges.sort(["src", "dst"])


def q_nonlinear_barabasi(sf_dir: str):
    """igraph_barabasi_game psumtree path with power=2
    (games.c:297,558): step i cites m=2 targets ∝ indeg² + 1 —
    integer-exact sequential replay (the recent_degree contract)."""
    from igraph_ray.sources.games import nonlinear_barabasi_game

    p = NONLINEAR_BARABASI_PARAMS
    return nonlinear_barabasi_game(
        p["n"], p["m"], power=p["power"], zero_appeal=p["zero_appeal"],
        seed=p["seed"]).sort(["src", "dst"])


def _sql_k_regular() -> str:
    p = K_REGULAR_PARAMS
    n, k, seed = p["n"], p["k"], p["seed"]
    return f"""
WITH st AS (SELECT a.i AS v, u.j AS s,
                   md5('{seed}:kr:' || CAST(a.i AS VARCHAR) || ':'
                       || CAST(u.j AS VARCHAR)) AS h
            FROM (SELECT unnest(generate_series(0, {n - 1})) AS i) a,
                 LATERAL unnest(generate_series(0, {k - 1})) u(j)),
r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY h, v, s) - 1 AS rk FROM st)
SELECT CAST(SUM(v * (1 - rk % 2)) AS BIGINT) AS src,
       CAST(SUM(v * (rk % 2)) AS BIGINT) AS dst
FROM r GROUP BY rk // 2"""


def _sql_static_fitness() -> str:
    from igraph_ray.sources.games import _draw32

    p = STATIC_FITNESS_PARAMS
    n, m, seed = p["n"], p["m"], p["seed"]
    rows = ", ".join(
        f"({e}, {_draw32(seed, 'sfs', e, 0)}, {_draw32(seed, 'sft', e, 0)})"
        for e in range(m))
    return f"""
WITH fo AS (SELECT r.range AS v, 1 + r.range % 7 AS w FROM range({n}) r),
co AS (SELECT v, SUM(w) OVER (ORDER BY v) AS c, SUM(w) OVER () AS s1
       FROM fo),
fi AS (SELECT r.range AS v, 1 + (r.range * r.range) % 5 AS w
       FROM range({n}) r),
ci AS (SELECT v, SUM(w) OVER (ORDER BY v) AS c, SUM(w) OVER () AS s1
       FROM fi),
d(e, ds, dt) AS (VALUES {rows})
SELECT CAST((SELECT MIN(v) FROM co
             WHERE CAST(d.ds AS BIGINT) * s1 <= 4294967296 * c)
            AS BIGINT) AS src,
       CAST((SELECT MIN(v) FROM ci
             WHERE CAST(d.dt AS BIGINT) * s1 <= 4294967296 * c)
            AS BIGINT) AS dst
FROM d"""


def _sql_asymmetric_preference() -> str:
    import numpy as _np

    p = ASYM_PREF_PARAMS
    n, seed = p["n"], p["seed"]
    td = _np.asarray(p["type_dist"], dtype=_np.float64)
    kt = td.shape[0]
    td = td / td.sum()
    sizes = _np.floor(td.reshape(-1) * n).astype(_np.int64)
    rem = n - int(sizes.sum())
    sizes[:rem] += 1
    blo = _np.cumsum(sizes)
    jid_case = "CASE " + " ".join(
        f"WHEN r.range < {int(blo[q])} THEN {q}"
        for q in range(kt * kt)) + " END"
    HEX15 = 16 ** 15
    thr_case = "CASE a.ot * 2 + b.it " + " ".join(
        f"WHEN {o * kt + i} THEN {p['pref_e6'][o][i] * HEX15 // 1_000_000}"
        for o in range(kt) for i in range(kt)) + " END"
    return f"""
WITH v AS (SELECT r.range AS i, {jid_case} AS jid FROM range({n}) r),
t AS (SELECT i, jid // {kt} AS it, jid % {kt} AS ot FROM v),
pr AS (SELECT a.i AS u, b.i AS w, a.ot, b.it,
              md5('{seed}:ap:' || CAST(a.i AS VARCHAR) || ':'
                  || CAST(b.i AS VARCHAR)) AS h,
              {thr_case} AS thr
       FROM t a JOIN t b ON a.i != b.i)
SELECT CAST(u AS BIGINT) AS src, CAST(w AS BIGINT) AS dst
FROM pr WHERE ({_md5_fold15('h')}) < thr"""


def _sql_nonlinear_barabasi() -> str:
    p = NONLINEAR_BARABASI_PARAMS
    n, m, power, za = p["n"], p["m"], p["power"], p["zero_appeal"]
    draws = _seq_game_draws(p["seed"], "nb", n, m)
    dd = " * ".join(["COALESCE(st.deg, 0)"] * power)

    def w_expr(i: int) -> str:
        return (f"SELECT r.range AS v, {za} + COALESCE({dd}, 0) AS w "
                f"FROM range({i}) r LEFT JOIN "
                f"(SELECT d, COUNT(*) AS deg FROM e{i - 1} GROUP BY d) st "
                f"ON st.d = r.range")

    return _seq_game_sql(n, m, w_expr, draws)


BETWEENNESS_CUTOFF = 3
CLOSENESS_CUTOFF = 2
EBC_CUTOFF = 4


def q_betweenness_cutoff(sf_dir: str):
    """igraph_betweenness_estimate with a path-length cutoff
    (centrality.c:1746,1909): only geodesics of length <= 3 contribute
    — the forward BFS of every Brandes chunk is truncated at level 3.
    Oracle: the exact σ pair formula restricted to d(s,t) <= 3."""
    from igraph_ray.algorithms.betweenness import betweenness

    g = derive.graph_a(sf_dir)
    bc = betweenness(g, num_partitions=8, chunk=64,
                     cutoff=BETWEENNESS_CUTOFF)
    return _scale_col(bc, "bc", "bcc_e6", 1e6)


def q_edge_betweenness_cutoff(sf_dir: str):
    """igraph_edge_betweenness_estimate cutoff semantics
    (centrality.c:2219; the engine uses the consistent
    length <= cutoff rule for edges too — the 0.7 edge variant's
    off-by-one at centrality.c:2336 was fixed upstream) on the
    very-sparse view with cutoff 4."""
    from igraph_ray.algorithms.betweenness import edge_betweenness

    g = derive.graph_vsparse(sf_dir)
    ebc = edge_betweenness(g, num_partitions=8, chunk=64,
                           cutoff=EBC_CUTOFF)
    return _scale_col(ebc, "ebc", "ebcc_e6", 1e6)


def q_closeness_cutoff(sf_dir: str):
    """igraph_closeness_estimate cutoff semantics (centrality.c:2720):
    closeness over targets within 2 hops only — every BFS stops after
    2 supersteps (the scale path: bounded frontier work per source)."""
    from igraph_ray.algorithms.paths import closeness_centrality

    g = derive.graph_a(sf_dir)
    out = closeness_centrality(g, variant="out", num_partitions=8,
                               cutoff=CLOSENESS_CUTOFF)
    return _scale_col(out, "closeness", "closenessc_e8", 1e8)


def _sql_betweenness_cutoff(iters: int = _BC_ITERS) -> str:
    c = BETWEENNESS_CUTOFF
    parts = [
        f"WITH edges AS MATERIALIZED ({SQL_EDGES_A})",
        f"verts AS MATERIALIZED ({SQL_VERTS_A})",
        "q0 AS MATERIALIZED (SELECT v AS s, v AS t, 0 AS d, CAST(1 AS DOUBLE) AS sig FROM verts)",
    ]
    for k in range(1, iters + 1):
        pp = f"q{k-1}"
        parts.append(
            f"q{k} AS MATERIALIZED (SELECT s, t, d, sig FROM {pp} UNION ALL "
            f"SELECT n.s, n.t, n.d, n.sig FROM ("
            f"SELECT p.s, e.dst AS t, {k} AS d, SUM(p.sig) AS sig "
            f"FROM {pp} p JOIN edges e ON e.src = p.t WHERE p.d = {k-1} "
            f"GROUP BY p.s, e.dst) n "
            f"WHERE NOT EXISTS (SELECT 1 FROM {pp} o WHERE o.s = n.s AND o.t = n.t))"
        )
    q = f"q{iters}"
    parts.append(
        f"bc AS (SELECT p1.t AS v, SUM(p1.sig * p2.sig / p3.sig) AS b "
        f"FROM {q} p1 JOIN {q} p2 ON p2.s = p1.t "
        f"JOIN {q} p3 ON p3.s = p1.s AND p3.t = p2.t AND p3.d = p1.d + p2.d "
        f"WHERE p1.s != p1.t AND p2.s != p2.t AND p1.s != p2.t "
        f"AND p1.d + p2.d <= {c} GROUP BY p1.t)"
    )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT verts.v AS vertex, "
        f"CAST(round_even(COALESCE(b.b, 0)*1e6, 0) AS BIGINT) AS bcc_e6 "
        f"FROM verts LEFT JOIN bc b ON b.v = verts.v ORDER BY vertex"
    )


def _sql_edge_betweenness_cutoff(iters: int = _EBC_ITERS) -> str:
    c = EBC_CUTOFF
    parts = [
        f"WITH edges AS MATERIALIZED ({derive.SQL_EDGES_VSPARSE})",
        "verts AS MATERIALIZED (SELECT src AS v FROM edges UNION SELECT dst FROM edges)",
        "q0 AS MATERIALIZED (SELECT v AS s, v AS t, 0 AS d, CAST(1 AS DOUBLE) AS sig FROM verts)",
    ]
    for k in range(1, iters + 1):
        pp = f"q{k-1}"
        parts.append(
            f"q{k} AS MATERIALIZED (SELECT s, t, d, sig FROM {pp} UNION ALL "
            f"SELECT n.s, n.t, n.d, n.sig FROM ("
            f"SELECT p.s, e.dst AS t, {k} AS d, SUM(p.sig) AS sig "
            f"FROM {pp} p JOIN edges e ON e.src = p.t WHERE p.d = {k-1} "
            f"GROUP BY p.s, e.dst) n "
            f"WHERE NOT EXISTS (SELECT 1 FROM {pp} o WHERE o.s = n.s AND o.t = n.t))"
        )
    q = f"q{iters}"
    parts.append(
        f"ebc AS (SELECT e.src, e.dst, SUM(p1.sig * p2.sig / p3.sig) AS b "
        f"FROM edges e "
        f"JOIN {q} p1 ON p1.t = e.src "
        f"JOIN {q} p2 ON p2.s = e.dst "
        f"JOIN {q} p3 ON p3.s = p1.s AND p3.t = p2.t "
        f"AND p3.d = p1.d + 1 + p2.d "
        f"WHERE p1.d + 1 + p2.d <= {c} "
        f"GROUP BY e.src, e.dst)"
    )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT e.src, e.dst, "
        f"CAST(round_even(COALESCE(b.b, 0)*1e6, 0) AS BIGINT) AS ebcc_e6 "
        f"FROM edges e LEFT JOIN ebc b ON b.src = e.src AND b.dst = e.dst "
        f"ORDER BY e.src, e.dst"
    )


def _sql_closeness_cutoff(iters: int = _SSSP_ITERS) -> str:
    c = CLOSENESS_CUTOFF
    return (
        f"{_sql_allpairs_body(iters)}\n"
        f"SELECT s AS vertex, "
        f"CAST(round_even(CAST(cnt AS DOUBLE)/sumd*1e8, 0) AS BIGINT) AS closenessc_e8 "
        f"FROM (SELECT s, COUNT(*) AS cnt, SUM(d) AS sumd FROM p{iters} "
        f"WHERE s != t AND d <= {c} GROUP BY s) q WHERE sumd > 0 ORDER BY vertex"
    )


def _md5_fold(h: str, k: int) -> str:
    """SQL expression folding the first ``k`` hex chars of md5 column
    ``h`` into a BIGINT (generalizes _md5_fold15)."""
    f = "CAST(0 AS BIGINT)"
    for i in range(1, k + 1):
        f = (f"(({f}) * 16 + "
             f"(strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1))")
    return f


LAYOUT_RANDOM_SEED = 7


def q_layout_random(sf_dir: str):
    """igraph_layout_random (layout.c:76): every coordinate uniform on
    [-1,1] — indexed md5 draws (12-hex fold / 16^12), SQL-replayed
    exactly."""
    from igraph_ray.ops.layout import layout_random

    pos = layout_random(derive.V, seed=LAYOUT_RANDOM_SEED, dims=2)

    def _ints(b: pa.Table) -> pa.Table:
        return pa.table({
            "vertex": b["vertex"],
            "x_e6": pa.array(np.round(b["x"].to_numpy(
                zero_copy_only=False) * 1e6).astype(np.int64)),
            "y_e6": pa.array(np.round(b["y"].to_numpy(
                zero_copy_only=False) * 1e6).astype(np.int64)),
        })

    return pos.map_batches(_ints, batch_format="pyarrow", batch_size=None)


def q_layout_grid3d(sf_dir: str):
    """igraph_layout_grid_3d (layout.c:339): row-major integer lattice
    with default w = h = ceil(n^(1/3))."""
    from igraph_ray.ops.layout import layout_grid_3d

    pos = layout_grid_3d(derive.V)

    def _ints(b: pa.Table) -> pa.Table:
        out = {"vertex": b["vertex"]}
        for c in ("x", "y", "z"):
            out[f"g{c}"] = pa.array(b[c].to_numpy(
                zero_copy_only=False).astype(np.int64))
        return pa.table(out)

    return pos.map_batches(_ints, batch_format="pyarrow", batch_size=None)


def q_layout_sphere(sf_dir: str):
    """igraph_layout_sphere (layout.c:246): the spherical spiral with
    e6-quantized phi increments (exact integer prefix sum — the
    partitioning-independent contract; within 1e-6 of the reference's
    running-fmod phi)."""
    from igraph_ray.ops.layout import layout_sphere

    pos = layout_sphere(derive.V)

    def _ints(b: pa.Table) -> pa.Table:
        out = {"vertex": b["vertex"]}
        for c in ("x", "y", "z"):
            out[f"{c}_e6"] = pa.array(np.round(b[c].to_numpy(
                zero_copy_only=False) * 1e6).astype(np.int64))
        return pa.table(out)

    return pos.map_batches(_ints, batch_format="pyarrow", batch_size=None)


def q_layout_rt_circular(sf_dir: str):
    """igraph_layout_reingold_tilford_circular (layout.c:1226): the RT
    forest fixture mapped to polar coordinates — phi spans 2π(n-1)/n
    over the RT x range, radius = depth."""
    from igraph_ray.ops.layout import layout_reingold_tilford_circular

    g = Graph(ray.data.from_arrow(_rt_forest_table()), n=None)
    pos = layout_reingold_tilford_circular(g, num_partitions=8)

    def _ints(b: pa.Table) -> pa.Table:
        return pa.table({
            "vertex": b["vertex"],
            "xc_e6": pa.array(np.round(b["x"].to_numpy(
                zero_copy_only=False) * 1e6).astype(np.int64)),
            "yc_e6": pa.array(np.round(b["y"].to_numpy(
                zero_copy_only=False) * 1e6).astype(np.int64)),
        })

    return pos.map_batches(_ints, batch_format="pyarrow",
                           batch_size=None).materialize()


def _sql_layout_random() -> str:
    s = LAYOUT_RANDOM_SEED
    fx = _md5_fold(f"md5('{s}:rx:' || CAST(range AS VARCHAR))", 12)
    fy = _md5_fold(f"md5('{s}:ry:' || CAST(range AS VARCHAR))", 12)
    H = 16 ** 12
    return f"""
SELECT range AS vertex,
  CAST(round_even((2.0 * (CAST({fx} AS DOUBLE) / {H}) - 1.0) * 1e6, 0)
       AS BIGINT) AS x_e6,
  CAST(round_even((2.0 * (CAST({fy} AS DOUBLE) / {H}) - 1.0) * 1e6, 0)
       AS BIGINT) AS y_e6
FROM range({derive.V})"""


def _sql_layout_grid3d() -> str:
    import math as _m

    w = int(_m.ceil(derive.V ** (1.0 / 3.0)))
    return f"""
SELECT range AS vertex,
  CAST(range % {w} AS BIGINT) AS gx,
  CAST((range // {w}) % {w} AS BIGINT) AS gy,
  CAST(range // {w * w} AS BIGINT) AS gz
FROM range({derive.V})"""


def _sql_layout_sphere() -> str:
    n = derive.V
    return f"""
WITH inc AS (SELECT j, CAST(round_even(
        3.6 / sqrt({n} * (1.0 - h * h)) * 1e6, 0) AS BIGINT) AS e
    FROM (SELECT j, -1.0 + 2.0 * j / CAST({n} - 1 AS DOUBLE) AS h
          FROM range(1, {n} - 1) t(j))),
ph AS (SELECT j, SUM(e) OVER (ORDER BY j) AS pe FROM inc),
co AS (SELECT range AS v,
        CASE WHEN range = 0 THEN pi()
             WHEN range = {n} - 1 THEN 0.0
             ELSE acos(-1.0 + 2.0 * range / CAST({n} - 1 AS DOUBLE)) END
        AS theta,
        CASE WHEN range = 0 OR range = {n} - 1 THEN 0.0
             ELSE (SELECT CAST(pe AS DOUBLE) / 1e6 FROM ph
                   WHERE ph.j = range) END AS phi
    FROM range({n}))
SELECT v AS vertex,
  CAST(round_even(cos(phi) * sin(theta) * 1e6, 0) AS BIGINT) AS x_e6,
  CAST(round_even(sin(phi) * sin(theta) * 1e6, 0) AS BIGINT) AS y_e6,
  CAST(round_even(cos(theta) * 1e6, 0) AS BIGINT) AS z_e6
FROM co"""


def _sql_layout_rt_circular() -> str:
    rt = _sql_layout_rt()
    return f"""
WITH rt AS MATERIALIZED ({rt}),
st AS (SELECT MIN(x2) AS mn, MAX(x2) AS mx, COUNT(*) AS n FROM rt)
SELECT rt.vertex,
  CAST(round_even(rt.y * cos((rt.x2 - st.mn) / 2.0 *
        (((2 * pi() * (st.n - 1)) / st.n) / ((st.mx - st.mn) / 2.0)))
        * 1e6, 0) AS BIGINT) AS xc_e6,
  CAST(round_even(rt.y * sin((rt.x2 - st.mn) / 2.0 *
        (((2 * pi() * (st.n - 1)) / st.n) / ((st.mx - st.mn) / 2.0)))
        * 1e6, 0) AS BIGINT) AS yc_e6
FROM rt, st"""


def q_fsm_support(sf_dir: str):
    """The fork's FSM support measures (fsm.c shallow:959 / mib:745 /
    egobased:890) for the wedge pattern u–c–w over the per-6h-window
    event snapshot database (the q_frequent_subgraphs fixture): one
    packed binding-stream pass, grouped distinct-image aggregates,
    ego anchored on the wedge center."""
    from igraph_ray.ops.fsm_support import pattern_support

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_id"])

    def _snap(b):
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        g = (ts // 1_000_000) // 21600
        src = (b["user_id"].to_numpy(zero_copy_only=False) % 512)
        dst = (b["event_id"].to_numpy(zero_copy_only=False) % 97)
        return pa.table({"gid": pa.array(g),
                         "src": pa.array(src.astype("int64")),
                         "dst": pa.array(dst.astype("int64"))})

    db = events.map_batches(_snap, batch_format="pyarrow",
                            batch_size=None)
    return pattern_support(db, [0, 1], [1, 2], directed=False,
                           stride=1024, ego_vertex=1,
                           num_partitions=8).sort("gid")


SQL_FSM_SUPPORT = """
WITH ev AS (SELECT (epoch_us(ts) // 1000000) // 21600 AS g,
                   user_id % 512 AS src, event_id % 97 AS dst
            FROM events),
e AS (SELECT DISTINCT g, src AS a, dst AS b FROM ev WHERE src != dst),
sym AS (SELECT g, a, b FROM e UNION SELECT g, b AS a, a AS b FROM e),
w AS (SELECT s1.g, s1.a AS u, s1.b AS c, s2.b AS w2
      FROM sym s1 JOIN sym s2
      ON s2.g = s1.g AND s2.a = s1.b AND s2.b != s1.a),
m AS (SELECT g, COUNT(DISTINCT c) AS nc, COUNT(DISTINCT u) AS nu,
             COUNT(DISTINCT w2) AS nw FROM w GROUP BY g),
gids AS (SELECT DISTINCT g FROM ev)
SELECT CAST(gids.g AS BIGINT) AS gid,
  CAST(CASE WHEN m.g IS NULL THEN 0 ELSE 1 END AS BIGINT) AS shallow,
  CAST(COALESCE(LEAST(m.nc, m.nu, m.nw), 0) AS BIGINT) AS mib,
  CAST(COALESCE(m.nc, 0) AS BIGINT) AS ego
FROM gids LEFT JOIN m ON m.g = gids.g ORDER BY gid"""


def q_velist_edges(sf_dir: str):
    """The fork's gSpan transaction "velist" format
    (igraph_read_transactions_velist, dynamic.c:74) proved by a
    write → read round trip: the edge_table split into 4 transactions
    by src mod 4, per-edge etime = (src + dst) mod 7, vertex colors
    v mod 16. Oracle regenerates (gid, src, dst, etime) in SQL."""
    import os
    import tempfile

    from igraph_ray.sources.velist import read_velist, write_velist

    e = derive.edges_a(sf_dir)

    def _tx(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"gid": pa.array(s % 4),
                         "src": pa.array(s), "dst": pa.array(d),
                         "etime": pa.array((s + d) % 7)})

    edges = e.map_batches(_tx, batch_format="pyarrow",
                          batch_size=None).materialize()

    def _vx(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        g = np.concatenate([s % 4, s % 4])
        v = np.concatenate([s, d])
        t = pa.table({"gid": pa.array(g), "vertex": pa.array(v)})
        t = t.group_by(["gid", "vertex"]).aggregate([])
        vc = t["vertex"].to_numpy(zero_copy_only=False) % 16
        return t.append_column("vcolor", pa.array(vc))

    verts = (e.map_batches(_vx, batch_format="pyarrow", batch_size=None)
             .groupby(["gid", "vertex"]).max("vcolor"))
    verts = verts.map_batches(
        lambda b: pa.table({"gid": b["gid"], "vertex": b["vertex"],
                            "vcolor": b["max(vcolor)"]}),
        batch_format="pyarrow", batch_size=None)
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        pth = os.path.join(td, "a.velist")
        write_velist(edges, verts, pth)
        rd, _v, _h = read_velist(pth, has_vcolors=True, has_etimes=True)
        return rd.materialize()


SQL_VELIST_EDGES_TMPL = """
WITH e AS ({edges})
SELECT CAST(src % 4 AS BIGINT) AS gid, src, dst,
       CAST((src + dst) % 7 AS BIGINT) AS etime
FROM e"""


def q_dynamic_snapshots(sf_dir: str):
    """The fork's DYNAMIC velist reader
    (igraph_read_and_project_dynamic_velist, dynamic.c:75) proved by a
    write → read → snapshot-expansion round trip: edge_table with
    ctime = (src+dst) % 5, dtime = -1 (never deleted) when src % 3 = 0
    else ctime + 1 + dst % 3; a snapshot per distinct insertion
    timestamp, edge present iff ctime <= w < dtime."""
    import os
    import tempfile

    from igraph_ray.sources.velist import (dynamic_snapshots,
                                           read_dynamic_velist,
                                           write_dynamic_velist)

    e = derive.edges_a(sf_dir)

    def _dyn(b: pa.Table) -> pa.Table:
        t = pa.table({"src": b["src"], "dst": b["dst"]})
        t = t.group_by(["src", "dst"]).aggregate([])
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        c = (s + d) % 5
        dl = np.where(s % 3 == 0, -1, c + 1 + d % 3)
        return pa.table({"src": pa.array(s), "dst": pa.array(d),
                         "ctime": pa.array(c.astype("int64")),
                         "dtime": pa.array(dl.astype("int64"))})

    dyn = (e.map_batches(_dyn, batch_format="pyarrow", batch_size=None)
           .groupby(["src", "dst"]).max("ctime"))
    dyn = dyn.map_batches(
        lambda b: pa.table({
            "src": b["src"], "dst": b["dst"],
            "ctime": b["max(ctime)"],
            "dtime": pa.array(np.where(
                b["src"].to_numpy(zero_copy_only=False) % 3 == 0, -1,
                b["max(ctime)"].to_numpy(zero_copy_only=False) + 1
                + b["dst"].to_numpy(zero_copy_only=False) % 3)
                .astype("int64"))}),
        batch_format="pyarrow", batch_size=None)
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        pth = os.path.join(td, "a.dvelist")
        write_dynamic_velist(dyn, None, pth)
        rd, _v = read_dynamic_velist(pth)
        return dynamic_snapshots(rd).sort(["w", "src", "dst"]).materialize()


SQL_DYNAMIC_SNAPSHOTS_TMPL = """
WITH e AS ({edges}),
d AS (SELECT DISTINCT src, dst, (src + dst) % 5 AS ctime,
             CASE WHEN src % 3 = 0 THEN -1
                  ELSE (src + dst) % 5 + 1 + dst % 3 END AS dtime
      FROM e),
ws AS (SELECT DISTINCT ctime AS w FROM d)
SELECT CAST(ws.w AS BIGINT) AS w, d.src, d.dst
FROM ws JOIN d ON d.ctime <= ws.w AND (d.dtime = -1 OR d.dtime > ws.w)
ORDER BY w, src, dst"""


def q_dynamic_proj_neighbors(sf_dir: str):
    """IGRAPH_PROJECTION_NEIGHBORS over the 6h-window event snapshot
    database (dynamic.c:751): per consecutive pair, the union graph
    restricted to the joint 1-hop neighborhood of the changed
    vertices, with selector-local vertex ids (the reference's bw_index
    relabeling, dynamic.c:608)."""
    from igraph_ray.ops.temporal import (projection_neighbors,
                                         snapshots_from_events)

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_id"])
    snap = snapshots_from_events(events)
    return projection_neighbors(snap).sort(["w", "src", "dst"])


_SQL_UE_CORE = """
ev AS (
  SELECT (epoch_us(ts) // 1000000) // 21600 AS w,
         user_id % 512 AS src, event_id % 97 AS dst FROM events),
dedup AS MATERIALIZED (SELECT DISTINCT w, src, dst FROM ev),
bounds AS (SELECT MIN(w) AS wmin, MAX(w) AS wmax FROM dedup),
expanded AS (
  SELECT w AS pair, src, dst, 2 AS bit FROM dedup
  UNION ALL SELECT w - 1, src, dst, 1 FROM dedup),
ue AS MATERIALIZED (
  SELECT pair AS w, src, dst, SUM(bit) AS color
  FROM expanded, bounds
  WHERE pair >= wmin AND pair <= wmax - 1
  GROUP BY pair, src, dst),
sym AS (SELECT w, src AS a, dst AS b FROM ue
        UNION ALL SELECT w, dst AS a, src AS b FROM ue)"""


SQL_DYNAMIC_PROJ_NEIGHBORS = (
    "WITH " + _SQL_UE_CORE + """,
changed AS (SELECT DISTINCT w, v FROM (
  SELECT w, src AS v FROM ue WHERE color != 3
  UNION ALL SELECT w, dst AS v FROM ue WHERE color != 3)),
neigh AS (SELECT DISTINCT s.w, s.b AS v
          FROM sym s JOIN changed c ON c.w = s.w AND c.v = s.a),
sel AS (SELECT DISTINCT w, v FROM (
  SELECT * FROM changed UNION ALL SELECT * FROM neigh)),
ranked AS (SELECT w, v,
                  ROW_NUMBER() OVER (PARTITION BY w ORDER BY v) - 1
                  AS loc FROM sel)
SELECT CAST(ue.w AS BIGINT) AS w, CAST(ue.src AS BIGINT) AS src,
       CAST(ue.dst AS BIGINT) AS dst, CAST(ue.color AS BIGINT) AS color,
       CAST(rs.loc AS BIGINT) AS src_local,
       CAST(rd.loc AS BIGINT) AS dst_local
FROM ue JOIN ranked rs ON rs.w = ue.w AND rs.v = ue.src
        JOIN ranked rd ON rd.w = ue.w AND rd.v = ue.dst
ORDER BY w, src, dst""")


def q_dynamic_proj_event(sf_dir: str):
    """IGRAPH_PROJECTION_EVENT over the 6h-window event snapshot
    database (dynamic.c:826): one union graph per changed edge,
    restricted to the joint 1-hop neighborhood of the event's
    endpoints (documented deviation: one event per changed edge —
    see ops/temporal.projection_event)."""
    from igraph_ray.ops.temporal import (projection_event,
                                         snapshots_from_events)

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_id"])
    snap = snapshots_from_events(events)
    return projection_event(snap).sort(
        ["w", "ea", "eb", "src", "dst"])


SQL_DYNAMIC_PROJ_EVENT = (
    "WITH " + _SQL_UE_CORE + """,
evs AS (SELECT w, src AS ea, dst AS eb FROM ue WHERE color != 3),
evends AS (SELECT w, ea, eb, ea AS a FROM evs
           UNION ALL SELECT w, ea, eb, eb AS a FROM evs),
nb AS (SELECT DISTINCT e.w, e.ea, e.eb, s.b AS v
       FROM evends e JOIN sym s ON s.w = e.w AND s.a = e.a),
sel AS (SELECT DISTINCT w, ea, eb, v FROM (
  SELECT w, ea, eb, v FROM nb
  UNION ALL SELECT w, ea, eb, a AS v FROM evends))
SELECT CAST(u.w AS BIGINT) AS w, CAST(s1.ea AS BIGINT) AS ea,
       CAST(s1.eb AS BIGINT) AS eb, CAST(u.src AS BIGINT) AS src,
       CAST(u.dst AS BIGINT) AS dst, CAST(u.color AS BIGINT) AS color
FROM ue u JOIN sel s1 ON s1.w = u.w AND s1.v = u.src
          JOIN sel s2 ON s2.w = u.w AND s2.ea = s1.ea
                     AND s2.eb = s1.eb AND s2.v = u.dst
ORDER BY w, ea, eb, src, dst""")


AVM_N = 24
AVM_STEPS = 12
AVM_P = 0.4
AVM_PRIOR = 0.5
AVM_ATTEMPTS = 16


def q_avm(sf_dir: str):
    """Adaptive voter model stream (igraph_write_avm_collected,
    dynamic.c:1506) on the 24-vertex {1,5}-circulant: 12 deterministic
    md5-draw steps of discordant-edge rewiring/adoption; output is the
    full per-timestep colored-graph stream (t, kind, a, b) — kind 0 =
    edge rows, kind 1 = opinion rows. The reference seeds rand() with
    time(NULL); the engine's draw contract is documented in
    algorithms/avm.py and replayed verbatim by the oracle."""
    from igraph_ray.algorithms.avm import avm_stream

    edges = set()
    for i in range(AVM_N):
        for d in (1, 5):
            a, b = i, (i + d) % AVM_N
            edges.add((min(a, b), max(a, b)))
    return avm_stream(sorted(edges), AVM_N, steps=AVM_STEPS,
                      rewiring_p=AVM_P, opinion_prior=AVM_PRIOR,
                      attempts=AVM_ATTEMPTS)


def _sql_avm() -> str:
    from igraph_ray.algorithms.avm import HEX15

    N, T, K = AVM_N, AVM_STEPS, AVM_ATTEMPTS
    p_thr = int(AVM_P * HEX15)
    prior_thr = int(AVM_PRIOR * HEX15)

    def fold(expr: str) -> str:
        return _md5_fold15(f"md5({expr})")

    parts = [f"""WITH ks AS (SELECT range AS k FROM range({K})),
o0 AS MATERIALIZED (SELECT range AS v,
       CASE WHEN ({fold("'avm:op:' || CAST(range AS VARCHAR)")})
            < {prior_thr} THEN 2 ELSE 1 END AS op FROM range({N})),
e0 AS MATERIALIZED (SELECT LEAST(range, (range+1) % {N}) AS lo,
              GREATEST(range, (range+1) % {N}) AS hi FROM range({N})
       UNION
       SELECT LEAST(range, (range+5) % {N}),
              GREATEST(range, (range+5) % {N}) FROM range({N}))"""]
    for t in range(T):
        et, ot = f"e{t}", f"o{t}"
        parts.append(f""",
a{t} AS MATERIALIZED (SELECT lo, hi FROM (
  SELECT r.lo, r.hi, ROW_NUMBER() OVER (ORDER BY ks.k) AS rn
  FROM ks
  JOIN (SELECT lo, hi, ROW_NUMBER() OVER (ORDER BY lo, hi) - 1 AS rk,
               COUNT(*) OVER () AS m FROM {et}) r
    ON r.rk = ({fold(f"'avm:t{t}:e' || CAST(ks.k AS VARCHAR)")}) % r.m
  JOIN {ot} ol ON ol.v = r.lo JOIN {ot} oh ON oh.v = r.hi
  WHERE ol.op != oh.op) WHERE rn = 1),
c{t} AS MATERIALIZED (SELECT lo, hi,
  CASE WHEN ({fold(f"'avm:t{t}:r'")}) % 2 = 0 THEN lo ELSE hi END
    AS resolver,
  CASE WHEN ({fold(f"'avm:t{t}:r'")}) % 2 = 0 THEN hi ELSE lo END
    AS other,
  CASE WHEN ({fold(f"'avm:t{t}:a'")}) < {p_thr} THEN 1 ELSE 0 END
    AS rew
  FROM a{t}),
w{t} AS MATERIALIZED (SELECT lo, hi, resolver, w FROM (
  SELECT c.lo, c.hi, c.resolver, j.w,
         ROW_NUMBER() OVER (ORDER BY j.k) AS rn
  FROM c{t} c
  JOIN (SELECT k, ({fold(f"'avm:t{t}:w' || CAST(k AS VARCHAR)")})
               % {N} AS w FROM ks) j ON TRUE
  JOIN {ot} ow ON ow.v = j.w
  JOIN {ot} orr ON orr.v = c.resolver
  WHERE c.rew = 1 AND j.w != c.resolver AND ow.op = orr.op
    AND NOT EXISTS (SELECT 1 FROM {et} ee
        WHERE ee.lo = LEAST(c.resolver, j.w)
          AND ee.hi = GREATEST(c.resolver, j.w))
  ) WHERE rn = 1),
e{t + 1} AS MATERIALIZED (SELECT e.lo, e.hi FROM {et} e
  WHERE NOT EXISTS (SELECT 1 FROM w{t} x
                    WHERE x.lo = e.lo AND x.hi = e.hi)
  UNION ALL
  SELECT LEAST(resolver, w), GREATEST(resolver, w) FROM w{t}),
o{t + 1} AS MATERIALIZED (SELECT o.v, COALESCE(
    (SELECT o2.op FROM c{t} c JOIN {ot} o2 ON o2.v = c.other
     WHERE c.rew = 0 AND c.resolver = o.v), o.op) AS op
  FROM {ot} o)""")
    rows = " UNION ALL ".join(
        f"SELECT {t} AS t, 0 AS kind, lo AS a, hi AS b FROM e{t} "
        f"UNION ALL SELECT {t}, 1, v, op FROM o{t}"
        for t in range(T + 1))
    parts.append(
        f" SELECT CAST(t AS BIGINT) AS t, CAST(kind AS BIGINT) AS kind,"
        f" CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b"
        f" FROM ({rows}) ORDER BY t, kind, a, b")
    return "".join(parts)


def q_even_tarjan(sf_dir: str):
    """Even–Tarjan vertex-splitting reduction
    (igraph_even_tarjan_reduction, st-cuts.c:51) of edges_a: vertex i
    → (i, i+V) unit splitter arc; edge (f,t) → arcs (f+V, t) and
    (t+V, f) with capacity V."""
    from igraph_ray.ops.flowutil import even_tarjan_reduction

    out = even_tarjan_reduction(derive.edges_a(sf_dir), V)
    return out.map_batches(
        lambda b: pa.table({"src": b["src"], "dst": b["dst"],
                            "capacity": b["capacity"].cast(pa.int64())}),
        batch_format="pyarrow", batch_size=None).sort(
            ["src", "dst", "capacity"])


SQL_EVEN_TARJAN_TMPL = """
WITH e AS ({edges})
SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
       CAST(capacity AS BIGINT) AS capacity FROM (
  SELECT range AS src, range + {v} AS dst, 1 AS capacity FROM range({v})
  UNION ALL SELECT src + {v}, dst, {v} FROM e
  UNION ALL SELECT dst + {v}, src, {v} FROM e)
ORDER BY src, dst, capacity"""


def q_residual_graph(sf_dir: str):
    """Residual graph (igraph_residual_graph, st-cuts.c:104,148) of
    edges_a under the deterministic pseudo-flow
    flow = LEAST(cap, (src+dst) % 4), cap = (src*7+dst*13) % 9 + 1:
    arcs with cap − flow > 0, reported with the ORIGINAL capacity
    (the reference's literal behavior, st-cuts.c:131-136)."""
    from igraph_ray.ops.flowutil import residual_graph

    e = derive.edges_a(sf_dir)

    def _cf(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        cap = ((s * 7 + d * 13) % 9 + 1).astype(np.float64)
        fl = np.minimum(cap, ((s + d) % 4).astype(np.float64))
        t = b.append_column("capacity", pa.array(cap))
        return t.append_column("flow", pa.array(fl))

    out = residual_graph(e.map_batches(_cf, batch_format="pyarrow",
                                       batch_size=None))
    return out.map_batches(
        lambda b: pa.table({"src": b["src"], "dst": b["dst"],
                            "capacity": b["capacity"].cast(pa.int64())}),
        batch_format="pyarrow", batch_size=None).sort(["src", "dst"])


SQL_RESIDUAL_TMPL = """
WITH e AS ({edges}),
cf AS (SELECT src, dst, (src*7 + dst*13) % 9 + 1 AS cap,
              LEAST((src*7 + dst*13) % 9 + 1, (src + dst) % 4) AS fl
       FROM e)
SELECT src, dst, CAST(cap AS BIGINT) AS capacity
FROM cf WHERE cap - fl > 0 ORDER BY src, dst"""


def q_reverse_residual(sf_dir: str):
    """Reverse residual graph (igraph_reverse_residual_graph,
    st-cuts.c:177,218) of the q_residual_graph fixture: arc (f,t) iff
    flow > 0, arc (t,f) iff flow < capacity."""
    from igraph_ray.ops.flowutil import reverse_residual_graph

    e = derive.edges_a(sf_dir)

    def _cf(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        cap = ((s * 7 + d * 13) % 9 + 1).astype(np.float64)
        fl = np.minimum(cap, ((s + d) % 4).astype(np.float64))
        t = b.append_column("capacity", pa.array(cap))
        return t.append_column("flow", pa.array(fl))

    return reverse_residual_graph(
        e.map_batches(_cf, batch_format="pyarrow", batch_size=None)
    ).sort(["src", "dst"])


SQL_REVERSE_RESIDUAL_TMPL = """
WITH e AS ({edges}),
cf AS (SELECT src, dst, (src*7 + dst*13) % 9 + 1 AS cap,
              LEAST((src*7 + dst*13) % 9 + 1, (src + dst) % 4) AS fl
       FROM e)
SELECT src, dst FROM (
  SELECT src, dst FROM cf WHERE fl > 0
  UNION ALL SELECT dst AS src, src AS dst FROM cf WHERE fl < cap)
ORDER BY src, dst"""


def q_disjoint_paths(sf_dir: str):
    """Edge- and vertex-disjoint path counts s=0 → t=V-1 on edges_a
    (igraph_edge_disjoint_paths flow.c:2177,
    igraph_vertex_disjoint_paths flow.c:2218). Rows-only by nature
    (flow values); Menger brute-force parity on small graphs in
    tests/test_flowutil.py."""
    from igraph_ray.ops.flowutil import (edge_disjoint_paths,
                                         vertex_disjoint_paths)

    e = derive.edges_a(sf_dir).materialize()
    edp = edge_disjoint_paths(e, 0, V - 1, n=V)
    vdp = vertex_disjoint_paths(e, 0, V - 1, n=V)
    return pa.table({"edp": pa.array([edp], pa.int64()),
                     "vdp": pa.array([vdp], pa.int64())})


def q_minimal_separators(sf_dir: str):
    """All minimal (s,t) vertex separators of the very-sparse derived
    graph (igraph_all_minimal_st_separators, separators.c:421;
    Berry–Bordat–Cogis generation). Output (sep, vertex) with sep =
    rank of the sorted member tuple. Rows-only (output-polynomial
    enumeration); brute-force subset parity in
    tests/test_min_separators.py."""
    from igraph_ray.algorithms.min_separators import all_minimal_separators

    g = derive.graph_vsparse(sf_dir)
    seps = all_minimal_separators(g)
    sid, vs = [], []
    for i, s in enumerate(seps):
        for v in s:
            sid.append(i)
            vs.append(int(v))
    return pa.table({"sep": pa.array(sid, pa.int64()),
                     "vertex": pa.array(vs, pa.int64())})


def q_min_size_separators(sf_dir: str):
    """All minimum-size separators of the Petersen graph
    (igraph_minimum_size_separators, separators.c:643) — κ = 3 and
    every minimum cut-set listed. Rows-only; brute-force parity and
    κ-slice equivalence pytests."""
    from igraph_ray.algorithms.min_separators import minimum_size_separators
    from igraph_ray.sources.structures import FAMOUS

    n, edges = FAMOUS["petersen"]()
    g = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.int64()),
        "dst": pa.array([b for _, b in edges], pa.int64())})), n=n)
    seps = minimum_size_separators(g, n=n)
    sid, vs = [], []
    for i, s in enumerate(seps):
        for v in s:
            sid.append(i)
            vs.append(int(v))
    return pa.table({"sep": pa.array(sid, pa.int64()),
                     "vertex": pa.array(vs, pa.int64())})


def q_layout_bipartite(sf_dir: str):
    """Bipartite two-row layout with pinned barycenter sweeps
    (igraph_layout_bipartite, layout.c) over the edges_a bipartite
    double cover (left = src, right = dst + V): 2 sweeps, right layer
    first, ties broken by previous position then id. Integer ranks —
    hash-checked against the fully unrolled SQL replay."""
    from igraph_ray.ops.layout import layout_bipartite

    be = derive.edges_a(sf_dir).map_batches(
        lambda b: pa.table({
            "src": b["src"],
            "dst": pa.array(b["dst"].to_numpy(zero_copy_only=False)
                            + V)}),
        batch_format="pyarrow", batch_size=None)
    return layout_bipartite(be, sweeps=2).sort(["type", "x"])


def _sql_layout_bipartite() -> str:
    parts = [f"""WITH e AS ({SQL_EDGES_A}),
be AS (SELECT src AS l, dst + {V} AS r FROM e),
l0 AS (SELECT vertex, ROW_NUMBER() OVER (ORDER BY vertex) - 1 AS pos
       FROM (SELECT DISTINCT l AS vertex FROM be)),
r0 AS (SELECT vertex, ROW_NUMBER() OVER (ORDER BY vertex) - 1 AS pos
       FROM (SELECT DISTINCT r AS vertex FROM be))"""]
    for s in range(1, 3):
        lp, rp = f"l{s - 1}", f"r{s - 1}"
        parts.append(f""",
rb{s} AS (SELECT be.r AS vertex, AVG(CAST(p.pos AS DOUBLE)) AS bary
          FROM be JOIN {lp} p ON p.vertex = be.l GROUP BY be.r),
r{s} AS (SELECT o.vertex, ROW_NUMBER() OVER (
           ORDER BY b.bary, o.pos, o.vertex) - 1 AS pos
         FROM {rp} o JOIN rb{s} b ON b.vertex = o.vertex),
lb{s} AS (SELECT be.l AS vertex, AVG(CAST(p.pos AS DOUBLE)) AS bary
          FROM be JOIN r{s} p ON p.vertex = be.r GROUP BY be.l),
l{s} AS (SELECT o.vertex, ROW_NUMBER() OVER (
           ORDER BY b.bary, o.pos, o.vertex) - 1 AS pos
         FROM {lp} o JOIN lb{s} b ON b.vertex = o.vertex)""")
    parts.append("""
SELECT CAST(vertex AS BIGINT) AS vertex, CAST(t AS BIGINT) AS type,
       CAST(pos AS BIGINT) AS x, CAST(t AS BIGINT) AS y FROM (
  SELECT vertex, 0 AS t, pos FROM l2
  UNION ALL SELECT vertex, 1 AS t, pos FROM r2)
ORDER BY type, x""")
    return "".join(parts)


def q_layout_fr3d(sf_dir: str):
    """3-D Fruchterman–Reingold
    (igraph_layout_fruchterman_reingold_3d, layout.c) of the
    very-sparse derived graph — unit-cube density-grid engine.
    Rows-only (float coordinates); separation/determinism pytests."""
    from igraph_ray.ops.layout import layout_fruchterman_reingold_3d

    g = derive.graph_vsparse(sf_dir)
    return layout_fruchterman_reingold_3d(
        g, iterations=8, n=derive.V).sort("vertex")


def q_layout_kk3d(sf_dir: str):
    """3-D Kamada–Kawai (igraph_layout_kamada_kawai_3d, layout.c) —
    SMACOF over BFS distances with a spherical-spiral seed.
    Rows-only; stress-reduction pytest."""
    from igraph_ray.ops.layout import layout_kamada_kawai

    g = derive.graph_vsparse(sf_dir)
    return layout_kamada_kawai(g, iterations=20, n=derive.V,
                               dims=3).sort("vertex")


def q_layout_drl3d(sf_dir: str):
    """3-D DRL (igraph_layout_drl_3d, src/drl_3d/) — the default
    5-phase annealing schedule over the 3-D density grid.
    Rows-only; property pytests."""
    from igraph_ray.ops.layout import layout_drl_3d

    g = derive.graph_vsparse(sf_dir)
    return layout_drl_3d(g, iterations=10, n=derive.V).sort("vertex")


def q_layout_gem(sf_dir: str):
    """GEM layout (igraph_layout_gem; Frick et al. 1994) — FR forces
    plus GEM's gravitation toward the barycenter. Rows-only."""
    from igraph_ray.ops.layout import layout_gem

    g = derive.graph_vsparse(sf_dir)
    return layout_gem(g, iterations=8, n=derive.V).sort("vertex")


def q_layout_dh(sf_dir: str):
    """Davidson–Harel layout (igraph_layout_davidson_harel,
    layout_dh.c) — annealed energy descent with the fine-tuning
    phase. Rows-only."""
    from igraph_ray.ops.layout import layout_davidson_harel

    g = derive.graph_vsparse(sf_dir)
    return layout_davidson_harel(g, iterations=8,
                                 n=derive.V).sort("vertex")


def q_layout_merge(sf_dir: str):
    """Component-layout merging (igraph_layout_merge_dla, layout.c):
    three circle layouts packed onto one canvas with disjoint
    bounding circles (deterministic golden-angle spiral in place of
    the reference's DLA walks — documented deviation). Rows-only;
    no-overlap pytest."""
    from igraph_ray.ops.layout import layout_circle, merge_layouts

    parts = [layout_circle(12), layout_circle(8), layout_circle(5)]
    return merge_layouts(parts).sort(["comp", "vertex"])


def _u_sql(key_expr: str) -> str:
    """SQL for the repo's open-(0,1) uniform: (fold15(md5(k))+0.5)/16^15."""
    return (f"((CAST(({_md5_fold15(f'md5({key_expr})')}) AS DOUBLE)"
            f" + 0.5) / 1152921504606846976.0)")


def _gauss_sql(seed: str, axis: int) -> str:
    u1 = _u_sql(f"'{seed}:g:' || CAST(i AS VARCHAR) || ':{axis}:1'")
    u2 = _u_sql(f"'{seed}:g:' || CAST(i AS VARCHAR) || ':{axis}:2'")
    return f"(sqrt(-2.0 * ln({u1})) * cos(2.0 * pi() * {u2}))"


SAMPLE_N = 256


def q_sphere_surface(sf_dir: str):
    """Uniform points on the 2-sphere (igraph_sample_sphere_surface,
    random.c — Muller–Marsaglia gaussian normalization), md5 draws,
    ×10⁶ rounded; hash-checked against the identical closed form in
    SQL."""
    from igraph_ray.sources.sampling import sample_sphere_surface

    out = sample_sphere_surface(3, SAMPLE_N, seed="sph")

    def _scale(b: pa.Table) -> pa.Table:
        cols = {"i": b["i"]}
        for a in range(3):
            cols[f"x{a}_e6"] = pa.array(np.round(
                b[f"x{a}"].to_numpy(zero_copy_only=False) * 1e6
            ).astype(np.int64))
        return pa.table(cols)

    return out.map_batches(_scale, batch_format="pyarrow",
                           batch_size=None).sort("i")


def _sql_sphere(volume: bool) -> str:
    g = [_gauss_sql("sph", a) for a in range(3)]
    nrm = f"sqrt({g[0]}*{g[0]} + {g[1]}*{g[1]} + {g[2]}*{g[2]})"
    scale = ""
    if volume:
        r = _u_sql("'sph:r:' || CAST(i AS VARCHAR)")
        scale = f" * pow({r}, 1.0/3)"
    cols = ", ".join(
        f"CAST(ROUND({g[a]} / ({nrm}){scale} * 1000000.0) AS BIGINT) "
        f"AS x{a}_e6" for a in range(3))
    return (f"SELECT CAST(range AS BIGINT) AS i, {cols} "
            f"FROM (SELECT range, range AS i FROM range({SAMPLE_N})) "
            f"ORDER BY i")


def q_sphere_volume(sf_dir: str):
    """Uniform points in the 3-ball (igraph_sample_sphere_volume,
    random.c): surface direction × radius·u^(1/3), md5 draws, ×10⁶."""
    from igraph_ray.sources.sampling import sample_sphere_volume

    out = sample_sphere_volume(3, SAMPLE_N, seed="sph")

    def _scale(b: pa.Table) -> pa.Table:
        cols = {"i": b["i"]}
        for a in range(3):
            cols[f"x{a}_e6"] = pa.array(np.round(
                b[f"x{a}"].to_numpy(zero_copy_only=False) * 1e6
            ).astype(np.int64))
        return pa.table(cols)

    return out.map_batches(_scale, batch_format="pyarrow",
                           batch_size=None).sort("i")


DIRICHLET_ALPHA = (1, 2, 3)


def q_dirichlet(sf_dir: str):
    """Dirichlet(1,2,3) rows (igraph_sample_dirichlet, random.c) via
    the integer-alpha Erlang-sum contract (sources/sampling.py),
    ×10⁶; full SQL replay."""
    from igraph_ray.sources.sampling import sample_dirichlet

    out = sample_dirichlet(SAMPLE_N, DIRICHLET_ALPHA, seed="dir")

    def _scale(b: pa.Table) -> pa.Table:
        cols = {"i": b["i"]}
        for j in range(len(DIRICHLET_ALPHA)):
            cols[f"x{j}_e6"] = pa.array(np.round(
                b[f"x{j}"].to_numpy(zero_copy_only=False) * 1e6
            ).astype(np.int64))
        return pa.table(cols)

    return out.map_batches(_scale, batch_format="pyarrow",
                           batch_size=None).sort("i")


def _sql_dirichlet() -> str:
    ys = []
    for j, aj in enumerate(DIRICHLET_ALPHA):
        keys = [f"'dir:d:' || CAST(i AS VARCHAR) || ':{j}:{k}'"
                for k in range(aj)]
        terms = " - ".join(f"ln({_u_sql(kk)})" for kk in keys)
        ys.append(f"(0.0 - {terms})")
    tot = " + ".join(f"y{j}" for j in range(len(DIRICHLET_ALPHA)))
    ydefs = ", ".join(f"{y} AS y{j}" for j, y in enumerate(ys))
    cols = ", ".join(
        f"CAST(ROUND(y{j} / ({tot}) * 1000000.0) AS BIGINT) AS x{j}_e6"
        for j in range(len(DIRICHLET_ALPHA)))
    return (f"SELECT CAST(i AS BIGINT) AS i, {cols} FROM ("
            f"SELECT range AS i, {ydefs} FROM range({SAMPLE_N})) "
            f"ORDER BY i")


def q_subiso_embeddings(sf_dir: str):
    """The FULL embedding stream of the P4 pattern
    (igraph_get_subisomorphisms_vf2, topology.c — every injective map,
    not just the count) over the undirected sparse view: the shared
    binding-join plan with return_bindings=True; oracle = the same
    3-way adjacency self-join emitting the bindings."""
    from igraph_ray.algorithms.subiso import count_sub_isomorphisms

    g = derive.graph_sparse(sf_dir)
    binds, colmap = count_sub_isomorphisms(
        g, [0, 1, 2], [1, 2, 3], directed=False, num_partitions=8,
        return_bindings=True)
    names = [colmap[v] for v in range(4)]
    return binds.map_batches(
        lambda b: pa.table({f"v{i}": b[names[i]] for i in range(4)})
        if b.num_rows else pa.table(
            {f"v{i}": pa.array([], pa.int64()) for i in range(4)}),
        batch_format="pyarrow", batch_size=None).sort(
            ["v0", "v1", "v2", "v3"])


def _sql_subiso_embeddings() -> str:
    from igraph_ray.pipelines.derive import SQL_EDGES_SPARSE

    return (
        f"WITH se AS MATERIALIZED ({SQL_EDGES_SPARSE}),\n{_SQL_SYM_SPARSE}\n"
        "SELECT CAST(e1.a AS BIGINT) AS v0, CAST(e1.b AS BIGINT) AS v1, "
        "CAST(e2.b AS BIGINT) AS v2, CAST(e3.b AS BIGINT) AS v3 "
        "FROM sym e1 "
        "JOIN sym e2 ON e2.a = e1.b AND e2.b <> e1.a "
        "JOIN sym e3 ON e3.a = e2.b AND e3.b <> e2.a AND e3.b <> e1.a "
        "AND e3.b <> e1.b ORDER BY v0, v1, v2, v3"
    )


def q_neighborhood_members(sf_dir: str):
    """Closed 2-ball membership (igraph_neighborhood,
    neighborhood.c:122, mode ALL) of every vertex of the very-sparse
    view: (seed, vertex, dist) with dist = hop distance ≤ 2."""
    from igraph_ray.ops.structural import neighborhood_members

    g = derive.graph_vsparse(sf_dir)
    return neighborhood_members(g, order=2, n=derive.V).sort(
        ["seed", "vertex"])


SQL_NEIGHBORHOOD_MEMBERS_TMPL = """
WITH e AS ({edges}),
und AS (SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
        FROM e),
sym AS (SELECT lo AS a, hi AS b FROM und
        UNION ALL SELECT hi, lo FROM und),
m2 AS (SELECT m1.a AS seed, s.b AS vertex
       FROM sym m1 JOIN sym s ON s.a = m1.b),
allm AS (
  SELECT range AS seed, range AS vertex, 0 AS d FROM range({v})
  UNION ALL SELECT a, b, 1 FROM sym
  UNION ALL SELECT seed, vertex, 2 FROM m2)
SELECT CAST(seed AS BIGINT) AS seed, CAST(vertex AS BIGINT) AS vertex,
       CAST(MIN(d) AS BIGINT) AS dist
FROM allm GROUP BY seed, vertex ORDER BY seed, vertex"""


def q_neighborhood_graphs(sf_dir: str):
    """Induced 2-ball subgraphs (igraph_neighborhood_graphs,
    neighborhood.c): (seed, src, dst) — every canonical undirected
    edge with both endpoints inside the seed's 2-ball."""
    from igraph_ray.ops.structural import neighborhood_graph_edges

    g = derive.graph_vsparse(sf_dir)
    return neighborhood_graph_edges(g, order=2, n=derive.V).sort(
        ["seed", "src", "dst"])


SQL_NEIGHBORHOOD_GRAPHS_TMPL = """
WITH e AS ({edges}),
und AS (SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
        FROM e),
sym AS (SELECT lo AS a, hi AS b FROM und
        UNION ALL SELECT hi, lo FROM und),
m2 AS (SELECT m1.a AS seed, s.b AS vertex
       FROM sym m1 JOIN sym s ON s.a = m1.b),
mem AS (SELECT DISTINCT seed, vertex FROM (
  SELECT range AS seed, range AS vertex FROM range({v})
  UNION ALL SELECT a, b FROM sym
  UNION ALL SELECT seed, vertex FROM m2))
SELECT CAST(ma.seed AS BIGINT) AS seed, CAST(u.lo AS BIGINT) AS src,
       CAST(u.hi AS BIGINT) AS dst
FROM und u JOIN mem ma ON ma.vertex = u.lo
           JOIN mem mb ON mb.seed = ma.seed AND mb.vertex = u.hi
ORDER BY seed, src, dst"""


def q_cliques_subset(sf_dir: str):
    """Maximal cliques touching a vertex subset
    (igraph_maximal_cliques_subset, maximal_cliques.c): the size
    histogram of maximal cliques containing at least one vertex with
    v % 19 == 0 — the same clique-CTE oracle filtered by the subset
    predicate."""
    from igraph_ray.algorithms.cliques import maximal_cliques

    cl = maximal_cliques(derive.graph_sparse(sf_dir), num_partitions=8)

    def _filt(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"size": pa.array([], pa.int64()),
                             "n_cliques": pa.array([], pa.int64())})
        keep, sizes = [], []
        for row in b["clique"].to_pylist():
            hit = any(v % 19 == 0 for v in row)
            keep.append(hit)
            sizes.append(len(row))
        sizes = np.array(sizes, np.int64)[np.array(keep, bool)]
        t = pa.table({"size": pa.array(sizes),
                      "one": pa.array(np.ones(len(sizes), np.int64))})
        return t.group_by("size").aggregate([("one", "sum")]).\
            rename_columns(["size", "n_cliques"])

    return (cl.map_batches(_filt, batch_format="pyarrow",
                           batch_size=None)
            .groupby("size").sum("n_cliques")
            .map_batches(lambda b: pa.table({
                "size": b["size"], "n_cliques": b["sum(n_cliques)"]})
                if b.num_rows else pa.table(
                    {"size": pa.array([], pa.int64()),
                     "n_cliques": pa.array([], pa.int64())}),
                batch_format="pyarrow", batch_size=None)
            .sort("size"))


def q_hrg_dendrogram(sf_dir: str):
    """Fitted dendrogram exported as a graph
    (igraph_hrg_dendrogram, igraph_hrg.cc): (parent, child, prob_e9)
    edges of the greedy-MLE tree. Rows-only (carries the fit)."""
    from igraph_ray.algorithms.hrg import hrg_dendrogram, hrg_fit

    g = derive.graph_sparse(sf_dir)
    t = hrg_dendrogram(hrg_fit(g, n=derive.V))
    idx = pc.sort_indices(t, sort_keys=[("parent", "ascending"),
                                        ("child", "ascending")])
    return t.take(idx)


def q_hrg_sample(sf_dir: str):
    """Graph drawn from the fitted HRG (igraph_hrg_sample,
    igraph_hrg.cc): per-pair md5 draw against p_LCA. Rows-only (the
    fit's merge order is sequential); determinism + edge-rate pytests
    in tests/test_hrg_sample.py."""
    from igraph_ray.algorithms.hrg import hrg_fit, hrg_sample

    g = derive.graph_sparse(sf_dir)
    res = hrg_fit(g, n=derive.V)
    return hrg_sample(res, derive.V, num_partitions=8).sort(
        ["src", "dst"])


ASP_SOURCE, ASP_LEVELS = 1, 4
ASPD_LEVELS = 6


def q_all_shortest_paths(sf_dir: str):
    """FULL shortest-path enumeration from vertex 1 on the sparse
    digraph (igraph_get_all_shortest_paths,
    structural_properties.c) — every shortest path within 4 hops as a
    '>'-joined id string; oracle unrolls the identical hop bound."""
    from igraph_ray.algorithms.simple_paths import all_shortest_path_seqs

    g = derive.graph_sparse(sf_dir)
    return all_shortest_path_seqs(
        g, ASP_SOURCE, levels=ASP_LEVELS).sort(
            ["vertex", "dist", "path"])


def q_all_shortest_paths_dijkstra(sf_dir: str):
    """Weighted full shortest-path enumeration
    (igraph_get_all_shortest_paths_dijkstra) from vertex 1 under the
    standard deterministic weights (src*7+dst*13)%9+1, tight-edge
    expansion bounded to 6 hops (oracle unrolls the same slice)."""
    from igraph_ray.algorithms.simple_paths import all_shortest_path_seqs

    g = derive.graph_sparse(sf_dir)
    return all_shortest_path_seqs(
        g, ASP_SOURCE, levels=ASPD_LEVELS,
        weight_fn=lambda s, d: (s * 7 + d * 13) % 9 + 1).sort(
            ["vertex", "dist", "path"])


def _sql_all_shortest_paths(weighted: bool) -> str:
    from igraph_ray.pipelines.derive import SQL_EDGES_SPARSE

    levels = ASPD_LEVELS if weighted else ASP_LEVELS
    s = ASP_SOURCE
    wexpr = "(src*7 + dst*13) % 9 + 1" if weighted else "1"
    parts = [f"""WITH e AS MATERIALIZED ({SQL_EDGES_SPARSE}),
w AS MATERIALIZED (SELECT src, dst, {wexpr} AS w FROM e),
d0 AS (SELECT {s} AS vertex, 0 AS dist)"""]
    for k in range(1, levels + 1):
        parts.append(f""",
d{k} AS MATERIALIZED (SELECT vertex, MIN(dist) AS dist FROM (
  SELECT vertex, dist FROM d{k - 1}
  UNION ALL
  SELECT w.dst, p.dist + w.w FROM d{k - 1} p JOIN w ON w.src = p.vertex
) GROUP BY vertex)""")
    dn = f"d{levels}"
    parts.append(f""",
p0 AS (SELECT {s} AS vertex, 0 AS dist,
              CAST({s} AS VARCHAR) AS path)""")
    for k in range(1, levels + 1):
        parts.append(f""",
p{k} AS MATERIALIZED (
  SELECT w.dst AS vertex, dn.dist,
         p.path || '>' || CAST(w.dst AS VARCHAR) AS path
  FROM p{k - 1} p
  JOIN w ON w.src = p.vertex
  JOIN {dn} dn ON dn.vertex = w.dst AND dn.dist = p.dist + w.w)""")
    union = " UNION ALL ".join(
        f"SELECT vertex, dist, path FROM p{k}"
        for k in range(levels + 1))
    parts.append(f"""
SELECT DISTINCT CAST(vertex AS BIGINT) AS vertex,
       CAST(dist AS BIGINT) AS dist, path
FROM ({union}) ORDER BY vertex, dist, path""")
    return "".join(parts)


def q_reindex_membership(sf_dir: str):
    """igraph_reindex_membership (community.c:1011): compact the
    deterministic labels (v*v) % 97 over the dense universe to dense
    ranks by ascending old label — one vectorized kernel;
    oracle = DENSE_RANK."""
    from igraph_ray.ops.membership import reindex_membership

    v = np.arange(V, dtype=np.int64)
    labels = (v * v) % 97
    new, _ = reindex_membership(labels)
    return pa.table({"vertex": pa.array(v), "member": pa.array(new)})


SQL_REINDEX_MEMBERSHIP = f"""
SELECT CAST(range AS BIGINT) AS vertex,
       CAST(DENSE_RANK() OVER (ORDER BY (range * range) % 97) - 1
            AS BIGINT) AS member
FROM range({V}) ORDER BY vertex"""


def q_community_to_membership(sf_dir: str):
    """igraph_community_to_membership (community.c:757) on the fixed
    8-vertex merge matrix [(0,1),(8,2),(3,4),(9,10)] cut at steps=3 —
    the reference's exact backward numbering (merge-discovered
    components first, untouched vertices after, in vertex order).
    Oracle = the hand-derived VALUES replay of the same contract."""
    from igraph_ray.ops.membership import community_to_membership

    mem, _ = community_to_membership(
        [(0, 1), (8, 2), (3, 4), (9, 10)], nodes=8, steps=3)
    return pa.table({
        "vertex": pa.array(np.arange(8, dtype=np.int64)),
        "member": pa.array(mem)})


SQL_COMMUNITY_TO_MEMBERSHIP = """
SELECT CAST(vertex AS BIGINT) AS vertex, CAST(member AS BIGINT) AS member
FROM (VALUES (0, 1), (1, 1), (2, 1), (3, 0), (4, 0),
             (5, 2), (6, 3), (7, 4)) AS t(vertex, member)
ORDER BY vertex"""


def q_le_community_to_membership(sf_dir: str):
    """igraph_le_community_to_membership (community.c): the same fixed
    merge matrix cut at steps=3, applied ON TOP of an existing
    membership (vertex -> vertex % 8 over the A universe): each vertex
    relabels through the component-level backward numbering. Oracle =
    the hand-derived component map joined against the base
    membership."""
    from igraph_ray.graph import endpoint_universe
    from igraph_ray.ops.membership import le_community_to_membership

    uni = endpoint_universe(derive.edges_a(sf_dir))
    base = uni.map_batches(
        lambda b: pa.table({
            "vertex": b["vertex"],
            "community": pc.cast(
                pc.bit_wise_and(b["vertex"], pa.scalar(7, pa.int64())),
                pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    out, _ = le_community_to_membership(
        [(0, 1), (8, 2), (3, 4), (9, 10)], steps=3, membership=base,
        num_partitions=8)
    return out.sort("vertex")


SQL_LE_COMMUNITY_TO_MEMBERSHIP = f"""
WITH verts AS ({SQL_VERTS_A}),
fake(c, m) AS (VALUES (0, 1), (1, 1), (2, 1), (3, 0), (4, 0),
               (5, 2), (6, 3), (7, 4))
SELECT verts.v AS vertex, CAST(fake.m AS BIGINT) AS community
FROM verts JOIN fake ON fake.c = verts.v % 8 ORDER BY vertex"""


def q_colored_graph_edges(sf_dir: str):
    """The fork's colored single-graph v/e text format
    (igraph_write_colored_graph_gz, fsm.c:124) proved by a gzip
    write → read round trip of edges_a with vcolor v % 16,
    ecolor (src+dst) % 7, etime (src*3+dst) % 5."""
    import os
    import tempfile

    from igraph_ray.sources.velist import (read_colored_graph,
                                           write_colored_graph)

    e = derive.edges_a(sf_dir)

    def _cols(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"src": b["src"], "dst": b["dst"],
                         "ecolor": pa.array((s + d) % 7),
                         "etime": pa.array((s * 3 + d) % 5)})

    ed = e.map_batches(_cols, batch_format="pyarrow",
                       batch_size=None).materialize()
    vcolors = (np.arange(V) % 16).astype(np.int64)
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        pth = os.path.join(td, "g.velist.gz")
        write_colored_graph(V, ed, pth, vcolors=vcolors,
                            ecolors_col="ecolor", etimes_col="etime",
                            gz=True)
        rd, _v = read_colored_graph(pth, has_vcolors=True,
                                    has_ecolors=True, has_etimes=True,
                                    gz=True)
        return rd.materialize()


SQL_COLORED_GRAPH_TMPL = """
WITH e AS ({edges})
SELECT src, dst, CAST((src + dst) % 7 AS BIGINT) AS ecolor,
       CAST((src * 3 + dst) % 5 AS BIGINT) AS etime
FROM e"""


def q_motifs_no(sf_dir: str):
    """igraph_motifs_randesu_no (motifs.c:667, cut_prob = 0): the
    TOTAL number of connected 3- and 4-vertex subgraphs — the sums of
    the exact motif censuses; oracle composes the motifs3/motifs4
    oracles."""
    from igraph_ray.ops.census import motifs3, motifs4

    # same views as the standalone census queries the oracle composes:
    # size 3 = the directed census over graph A, size 4 = the undirected
    # census over the sparse view
    t3 = int(np.sum(motifs3(derive.graph_a(sf_dir),
                            num_partitions=8)["count"]
                    .to_numpy(zero_copy_only=False)))
    w4 = motifs4(derive.graph_sparse(sf_dir),
                 num_partitions=8)  # wide one-row class table
    t4 = int(sum(int(w4[c][0].as_py()) for c in w4.column_names))
    return pa.table({"size": pa.array([3, 4], pa.int64()),
                     "total": pa.array([t3, t4], pa.int64())})


def _colored_snapshots(sf_dir: str):
    from igraph_ray.ops.temporal import snapshots_from_events

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_id"])
    snap = snapshots_from_events(events)
    return snap.map_batches(
        lambda b: b.append_column("ecolor", pa.array(
            (b["src"].to_numpy(zero_copy_only=False)
             + b["dst"].to_numpy(zero_copy_only=False)) % 4 + 1))
        if b.num_rows else pa.table(
            {"w": pa.array([], pa.int64()),
             "src": pa.array([], pa.int64()),
             "dst": pa.array([], pa.int64()),
             "ecolor": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)


def q_union_projection_colored(sf_dir: str):
    """Edge-colored dynamic union-graph projection (dynamic.c:568,
    has_ecolors branch) over the 6h-window event snapshots with
    static edge colors (src+dst) % 4 + 1: union color =
    (max_ecolor+1)·c1 + c2 base-5 pair codes."""
    from igraph_ray.ops.temporal import union_edges_colored

    return union_edges_colored(_colored_snapshots(sf_dir),
                               max_ecolor=4).sort(["w", "src", "dst"])


SQL_UNION_PROJ_COLORED = """
WITH ev AS (
  SELECT (epoch_us(ts) // 1000000) // 21600 AS w,
         user_id % 512 AS src, event_id % 97 AS dst FROM events),
dedup AS MATERIALIZED (
  SELECT w, src, dst, (src + dst) % 4 + 1 AS ec
  FROM (SELECT DISTINCT w, src, dst FROM ev)),
bounds AS (SELECT MIN(w) AS wmin, MAX(w) AS wmax FROM dedup),
expanded AS (
  SELECT w AS pair, src, dst, ec * 5 AS bit FROM dedup
  UNION ALL SELECT w - 1, src, dst, ec FROM dedup)
SELECT CAST(pair AS BIGINT) AS w, CAST(src AS BIGINT) AS src,
       CAST(dst AS BIGINT) AS dst, CAST(SUM(bit) AS BIGINT) AS color
FROM expanded, bounds
WHERE pair >= wmin AND pair <= wmax - 1
GROUP BY pair, src, dst
ORDER BY w, src, dst"""


def q_separate_pattern(sf_dir: str):
    """igraph_seperate_graph_pattern (dynamic.c:1646): split the
    colored union graphs back into their two timesteps — side 0
    recovers snapshot w's colored edges, side 1 snapshot w+1's. The
    oracle reconstructs both sides independently from the snapshot
    database (no pair-code round trip)."""
    from igraph_ray.ops.temporal import (separate_graph_pattern,
                                         union_edges_colored)

    ug = union_edges_colored(_colored_snapshots(sf_dir), max_ecolor=4)
    return separate_graph_pattern(ug, max_ecolor=4).sort(
        ["side", "w", "src", "dst"])


SQL_SEPARATE_PATTERN = """
WITH ev AS (
  SELECT (epoch_us(ts) // 1000000) // 21600 AS w,
         user_id % 512 AS src, event_id % 97 AS dst FROM events),
dedup AS MATERIALIZED (
  SELECT w, src, dst, (src + dst) % 4 + 1 AS ec
  FROM (SELECT DISTINCT w, src, dst FROM ev)),
bounds AS (SELECT MIN(w) AS wmin, MAX(w) AS wmax FROM dedup)
SELECT CAST(side AS BIGINT) AS side, CAST(w AS BIGINT) AS w,
       CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
       CAST(ec AS BIGINT) AS ecolor FROM (
  SELECT 0 AS side, w, src, dst, ec FROM dedup, bounds
  WHERE w >= wmin AND w <= wmax - 1
  UNION ALL
  SELECT 1, w - 1, src, dst, ec FROM dedup, bounds
  WHERE w - 1 >= wmin AND w - 1 <= wmax - 1)
ORDER BY side, w, src, dst"""


def q_velist_projection(sf_dir: str):
    """igraph_read_and_project_transactions_velist (dynamic.c:1302):
    read a velist transaction database and project every consecutive
    transaction pair onto its membership-colored union graph — the
    velist_edges fixture (edges_a split into 4 transactions by
    src % 4) piped through read_velist → union_edges with w = gid."""
    import os
    import tempfile

    from igraph_ray.ops.temporal import union_edges
    from igraph_ray.sources.velist import read_velist, write_velist

    e = derive.edges_a(sf_dir)

    def _tx(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        return pa.table({"gid": pa.array(s % 4),
                         "src": b["src"], "dst": b["dst"]})

    edges = e.map_batches(_tx, batch_format="pyarrow",
                          batch_size=None).materialize()

    def _vx(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        t = pa.table({"gid": pa.array(np.concatenate([s % 4, s % 4])),
                      "vertex": pa.array(np.concatenate([s, d]))})
        return t.group_by(["gid", "vertex"]).aggregate([]).\
            rename_columns(["gid", "vertex"])

    verts = (e.map_batches(_vx, batch_format="pyarrow", batch_size=None)
             .groupby(["gid", "vertex"]).count()
             .select_columns(["gid", "vertex"]))
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        pth = os.path.join(td, "a.velist")
        write_velist(edges, verts, pth)
        rd, _v, _h = read_velist(pth)
        snap = rd.map_batches(
            lambda b: pa.table({"w": b["gid"], "src": b["src"],
                                "dst": b["dst"]}),
            batch_format="pyarrow", batch_size=None)
        return union_edges(snap).sort(["w", "src", "dst"]).materialize()


SQL_VELIST_PROJECTION_TMPL = """
WITH e AS ({edges}),
snap AS (SELECT src % 4 AS w, src, dst FROM e),
expanded AS (
  SELECT w AS pair, src, dst, 2 AS bit FROM snap
  UNION ALL SELECT w - 1, src, dst, 1 FROM snap)
SELECT CAST(pair AS BIGINT) AS w, src, dst,
       CAST(SUM(bit) AS BIGINT) AS color
FROM expanded WHERE pair >= 0 AND pair <= 2
GROUP BY pair, src, dst ORDER BY w, src, dst"""


def queries() -> Dict[str, Callable]:
    return {
        "edge_table": q_edge_table,
        "graphml_edges": q_graphml_edges,
        "pajek_edges": q_pajek_edges,
        "dimacs_arcs": q_dimacs_arcs,
        "gml_edges": q_gml_edges,
        "dl_edges": q_dl_edges,
        "lgl_edges": q_lgl_edges,
        "leda_edges": q_leda_edges,
        "out_degree": q_out_degree,
        "in_degree": q_in_degree,
        "pagerank": q_pagerank,
        "pagerank_weighted": q_pagerank_weighted,
        "pagerank_personalized": q_pagerank_personalized,
        "eigenvector": q_eigenvector,
        "eigenvector_weighted": q_eigenvector_weighted,
        "hits": q_hits,
        "components": q_components,
        "scc": q_scc,
        "sssp_hops": q_sssp_hops,
        "sssp_tree": q_sssp_tree,
        "topo_levels": q_topo_levels,
        "sssp_weighted": q_sssp_weighted,
        "path_length_hist": q_path_length_hist,
        "avg_path_length": q_avg_path_length,
        "transitivity_avglocal": q_transitivity_avglocal,
        "betweenness": q_betweenness,
        "betweenness_sampled": q_betweenness_sampled,
        "edge_betweenness": q_edge_betweenness,
        "closeness": q_closeness,
        "harmonic": q_harmonic,
        "harmonic_sampled": q_harmonic_sampled,
        "closeness_sampled": q_closeness_sampled,
        "neighborhood_sketches": q_neighborhood_sketches,
        "eccentricity": q_eccentricity,
        "diameter": q_diameter,
        "graph_center": q_graph_center,
        "transitive_closure": q_transitive_closure,
        "density": q_density,
        "is_forest": q_is_forest,
        "assortativity_nominal": q_assortativity_nominal,
        "triangle_list": q_triangle_list,
        "component_sizes": q_component_sizes,
        "lpa": q_lpa,
        "louvain": q_louvain,
        "leiden": q_leiden,
        "spinglass": q_spinglass,
        "scg_groups": q_scg_groups,
        "graphlets": q_graphlets,
        "triangles": q_triangles,
        "local_scan1": q_local_scan1,
        "knn_weighted": q_knn_weighted,
        "edge_clustering4": q_edge_clustering4,
        "transitivity_barrat": q_transitivity_barrat,
        "burt_constraint": q_burt_constraint,
        "maximal_cliques": q_maximal_cliques,
        "modularity": q_modularity,
        "lpa_weighted": q_lpa_weighted,
        "modularity_weighted": q_modularity_weighted,
        "dyad_census": q_dyad_census,
        "triad_census": q_triad_census,
        "motifs3": q_motifs3,
        "motifs3_estimate": q_motifs3_estimate,
        "motifs4": q_motifs4,
        "reciprocity": q_reciprocity,
        "mutual_edges": q_mutual_edges,
        "count_multiple": q_count_multiple,
        "degree_topk": q_degree_topk,
        "intersection": q_intersection,
        "difference": q_difference,
        "compose": q_compose,
        "union": q_union,
        "disjoint_union": q_disjoint_union,
        "complementer": q_complementer,
        "rewire_degrees": q_rewire_degrees,
        "strength": q_strength,
        "transitivity": q_transitivity,
        "cocitation": q_cocitation,
        "bibcoupling": q_bibcoupling,
        "neighbor_jaccard": q_neighbor_jaccard,
        "dice": q_dice,
        "inv_log_weighted": q_inv_log_weighted,
        "knn_degree": q_knn_degree,
        "knnk": q_knnk,
        "diversity": q_diversity,
        "neighborhood2": q_neighborhood2,
        "assortativity": q_assortativity,
        "has_cycle": q_has_cycle,
        "coreness": q_coreness,
        "k_core": q_k_core,
        "st_maxflow": q_st_maxflow,
        "bridges": q_bridges,
        "two_ecc": q_two_ecc,
        "articulation_points": q_articulation,
        "biconnected_components": q_biconn,
        "random_walks": q_random_walks,
        "random_walks_weighted": q_random_walks_weighted,
        "girth": q_girth,
        "mst": q_mst,
        "exact_dedup": q_exact_dedup,
        "token_count": q_token_count,
        "text_stats": q_text_stats,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "minhash_pairs": q_minhash_pairs,
        "dup_spans": q_dup_spans,
        "clean_dup_spans": q_clean_dup_spans,
        "pii_counts": q_pii_counts,
        "simhash": q_simhash,
        "ngram_dups": q_ngram_dups,
        "event_type_count": q_event_type_count,
        "tumbling_window": q_tumbling,
        "hopping_window": q_hopping,
        "sessionize": q_sessions,
        "asof_prev_event": q_asof_prev_event,
        "asof_order": q_asof_order,
        "range_window_join": q_range_window_join,
        "chunk_docs": q_chunk_docs,
        "prepare_corpus": q_prepare_corpus,
        "power_law_fit": q_power_law_fit,
        "cap_per_source": q_cap_per_source,
        "tokenize_ids": q_tokenize_ids,
        "running_mean": q_running_mean,
        "full_citation": q_full_citation,
        "chordal_ring": q_chordal_ring,
        "kautz": q_kautz,
        "growing_random": q_growing_random,
        "islands": q_islands,
        "grg": q_grg,
        "modularity_matrix": q_modularity_matrix,
        "correlated_pair": q_correlated_pair,
        "negative_sample": q_negative_sample,
        "embedding_covariance": q_embedding_covariance,
        "pca_project": q_pca_project,
        "doclen_quantiles": q_doclen_quantiles,
        "doclen_percentile_filter": q_doclen_percentile_filter,
        "jsonl_docs": q_jsonl_docs,
        "knn": q_knn,
        "lsh_knn": q_lsh_knn,
        "ivf_knn": q_ivf_knn,
        "embedding_near_dups": q_embedding_near_dups,
        "embedding_near_dups_lsh": q_embedding_near_dups_lsh,
        "corpus_extract": q_corpus_extract,
        "k_truss": q_k_truss,
        "edge_clustering": q_edge_clustering,
        "centralization_degree": q_centralization_degree,
        "global_efficiency": q_global_efficiency,
        "dedup_clusters": q_dedup_clusters,
        "word_stats": q_word_stats,
        "ngram_contamination": q_ngram_contamination,
        "quality_filter": q_quality_filter,
        "curate": q_curate,
        "token_cms": q_token_cms,
        "vocab_sketch": q_vocab_sketch,
        "stochastic_edges": q_stochastic_edges,
        "linegraph": q_linegraph,
        "gen_structures": q_gen_structures,
        "connect2": q_connect2,
        "scan1_them": q_scan1_them,
        "scan0_them": q_scan0_them,
        "local_scan2": q_local_scan2,
        "bipartite_components": q_bipartite_components,
        "bipartite_projection": q_bipartite_projection,
        "is_bipartite": q_is_bipartite,
        "mis": q_mis,
        "matching": q_matching,
        "max_matching": q_max_matching,
        "community_eb": q_community_eb,
        "fastgreedy": q_fastgreedy,
        "walktrap": q_walktrap,
        "infomap": q_infomap,
        "spectral_embedding": q_spectral_embedding,
        "sir": q_sir,
        "layout_circle": q_layout_circle,
        "layout_grid": q_layout_grid,
        "layout_fr": q_layout_fr,
        "barabasi": q_barabasi,
        "callaway": q_callaway,
        "hrg_game": q_hrg_game,
        "sbm": q_sbm,
        "laplacian": q_laplacian,
        "dominators": q_dominators,
        "feedback_arc_set": q_feedback_arc_set,
        "simple_paths": q_simple_paths,
        "separators": q_separators,
        "mcs_rank": q_mcs_rank,
        "lsap": q_lsap,
        "union_projection": q_union_projection,
        "frequent_subgraphs": q_frequent_subgraphs,
        "cohesive_blocks": q_cohesive_blocks,
        "forest_fire": q_forest_fire,
        "sigma_counts": q_sigma_counts,
        "bfs_order": q_bfs_order,
        "dfs_order": q_dfs_order,
        "independent_sets": q_independent_sets,
        "largest_cliques": q_largest_cliques,
        "optimal_imitation": q_optimal_imitation,
        "roulette_imitation": q_roulette_imitation,
        "moran_step": q_moran_step,
        "layout_sugiyama": q_layout_sugiyama,
        "automorphisms": q_automorphisms,
        "lcf": q_lcf,
        "graphical": q_graphical,
        "all_st_cuts": q_all_st_cuts,
        "all_st_mincuts": q_all_st_mincuts,
        "laplacian_embedding": q_laplacian_embedding,
        "dim_select": q_dim_select,
        "optimal_modularity": q_optimal_modularity,
        "cited_type": q_cited_type,
        "kmeans_clusters": q_kmeans_clusters,
        "sssp_negative": q_sssp_negative,
        "unfold_tree": q_unfold_tree,
        "convergence_degree": q_convergence_degree,
        "rewire_edges": q_rewire_edges,
        "bipartite_gnp": q_bipartite_gnp,
        "bipartite_gnm": q_bipartite_gnm,
        "full_bipartite": q_full_bipartite,
        "convex_hull": q_convex_hull,
        "centralization": q_centralization,
        "subcomponent": q_subcomponent,
        "closeness_weighted": q_closeness_weighted,
        "betweenness_weighted": q_betweenness_weighted,
        "edge_betweenness_weighted": q_edge_betweenness_weighted,
        "sssp_weighted_tree": q_sssp_weighted_tree,
        "path_length_hist_weighted": q_path_length_hist_weighted,
        "diameter_weighted": q_diameter_weighted,
        "eccentricity_weighted": q_eccentricity_weighted,
        "famous": q_famous,
        "layout_kk": q_layout_kk,
        "cohesive_block_members": q_cohesive_block_members,
        "chordal": q_chordal,
        "laplacian_norm": q_laplacian_norm,
        "dot_product": q_dot_product,
        "hsbm": q_hsbm,
        "hrg_fit": q_hrg_fit,
        "hrg_predict": q_hrg_predict,
        "establishment": q_establishment,
        "subiso_path4": q_subiso_path4,
        "isomorphic_check": q_isomorphic_check,
        "subiso_cycle4": q_subiso_cycle4,
        "global_mincut": q_global_mincut,
        "mincut_karger": q_mincut_karger,
        "gomory_hu": q_gomory_hu,
        "vertex_connectivity": q_vertex_connectivity,
        "louvain_sweeps": q_louvain_sweeps,
        "community_le": q_community_le,
        "max_matching_size": q_max_matching_size,
        "split_join": q_split_join,
        "rand_pairs": q_rand_pairs,
        "clique_number": q_clique_number,
        "top_terms": q_top_terms,
        "stratified_sample": q_stratified_sample,
        "louvain_full": q_louvain_full,
        "leiden_full": q_leiden_full,
        "spinglass_full": q_spinglass_full,
        "scg_groups_spectral": q_scg_groups_spectral,
        "graphlets_mu": q_graphlets_mu,
        "subiso_tree5": q_subiso_tree5,
        "subiso_tree8": q_subiso_tree8,
        "subiso_house": q_subiso_house,
        "recent_degree": q_recent_degree,
        "recent_degree_pow": q_recent_degree_pow,
        "barabasi_aging_pow": q_barabasi_aging_pow,
        "lastcit": q_lastcit,
        "barabasi_aging": q_barabasi_aging,
        "apsp_johnson": q_apsp_johnson,
        "layout_rt": q_layout_rt,
        "motif3_instances": q_motif3_instances,
        "motif4_instances": q_motif4_instances,
        "graphdb_edges": q_graphdb_edges,
        "layout_graphopt": q_layout_graphopt,
        "layout_drl": q_layout_drl,
        "layout_mds": q_layout_mds,
        "recent_degree_aging": q_recent_degree_aging,
        "subiso_prism": q_subiso_prism,
        "k_regular": q_k_regular,
        "static_fitness": q_static_fitness,
        "asymmetric_preference": q_asymmetric_preference,
        "nonlinear_barabasi": q_nonlinear_barabasi,
        "betweenness_cutoff": q_betweenness_cutoff,
        "edge_betweenness_cutoff": q_edge_betweenness_cutoff,
        "closeness_cutoff": q_closeness_cutoff,
        "layout_random": q_layout_random,
        "layout_grid3d": q_layout_grid3d,
        "layout_sphere": q_layout_sphere,
        "layout_rt_circular": q_layout_rt_circular,
        "fsm_support": q_fsm_support,
        "velist_edges": q_velist_edges,
        "dynamic_snapshots": q_dynamic_snapshots,
        "dynamic_proj_neighbors": q_dynamic_proj_neighbors,
        "dynamic_proj_event": q_dynamic_proj_event,
        "avm": q_avm,
        "even_tarjan": q_even_tarjan,
        "residual_graph": q_residual_graph,
        "reverse_residual": q_reverse_residual,
        "disjoint_paths": q_disjoint_paths,
        "minimal_separators": q_minimal_separators,
        "min_size_separators": q_min_size_separators,
        "layout_bipartite": q_layout_bipartite,
        "layout_fr3d": q_layout_fr3d,
        "layout_kk3d": q_layout_kk3d,
        "layout_drl3d": q_layout_drl3d,
        "layout_gem": q_layout_gem,
        "layout_dh": q_layout_dh,
        "layout_merge": q_layout_merge,
        "sphere_surface": q_sphere_surface,
        "sphere_volume": q_sphere_volume,
        "dirichlet": q_dirichlet,
        "subiso_embeddings": q_subiso_embeddings,
        "neighborhood_members": q_neighborhood_members,
        "neighborhood_graphs": q_neighborhood_graphs,
        "cliques_subset": q_cliques_subset,
        "hrg_dendrogram": q_hrg_dendrogram,
        "hrg_sample": q_hrg_sample,
        "all_shortest_paths": q_all_shortest_paths,
        "all_shortest_paths_dijkstra": q_all_shortest_paths_dijkstra,
        "reindex_membership": q_reindex_membership,
        "community_to_membership": q_community_to_membership,
        "colored_graph_edges": q_colored_graph_edges,
        "motifs_no": q_motifs_no,
        "union_projection_colored": q_union_projection_colored,
        "separate_pattern": q_separate_pattern,
        "velist_projection": q_velist_projection,
        # --- session-6 additions (appended after the r3 window) ---
        "centralization_eigenvector": q_centralization_eigenvector,
        "scg_laplacian": q_scg_laplacian,
        "spinglass_single": q_spinglass_single,
        "le_community_to_membership": q_le_community_to_membership,
        "largest_independent_sets": q_largest_independent_sets,
        "dup_ngrams": q_dup_ngrams,
        "ncol_edges": q_ncol_edges,
        "scg_stochastic": q_scg_stochastic,
        "mst_unweighted": q_mst_unweighted,
        "scan0": q_scan0,
        "scan2_them": q_scan2_them,
        "scan_nbhd_ecount": q_scan_nbhd_ecount,
        "bipartite_projection_size": q_bipartite_projection_size,
        "adjacency_triplets": q_adjacency_triplets,
        "get_incidence": q_get_incidence,
        "create_bipartite": q_create_bipartite,
        "hsbm_list": q_hsbm_list,
        "get_isomorphisms": q_get_isomorphisms,
        "canonical_form": q_canonical_form,
        "layout_lgl": q_layout_lgl,
        "automorphism_group": q_automorphism_group,
        "eigen_symmetric": q_eigen_symmetric,
        "stochastic_imitation": q_stochastic_imitation,
        "assortativity_values": q_assortativity_values,
        "similarity_edges": q_similarity_edges,
        "eigen_laplacian": q_eigen_laplacian,
        "cliques_range": q_cliques_range,
        "lm_surprisal": q_lm_surprisal,
    }


_CURATE_ORACLE = r"""
WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok,
                  generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
           FROM documents),
f AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY doc_id, tok),
agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
               CAST(MAX(c) AS BIGINT) AS top_tf
        FROM f GROUP BY doc_id),
ch AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
              CAST(length(text)
                   - length(regexp_replace(text, '[^\sA-Za-z0-9]', '', 'g'))
                   AS BIGINT) AS n_punct
       FROM documents),
sig AS (SELECT d.doc_id,
               COALESCE(a.n_words, 0) AS n_words,
               CASE WHEN COALESCE(a.n_words, 0) = 0 THEN 0
                    ELSE (a.top_tf * 1000000) // a.n_words END AS rep,
               CASE WHEN ch.n_chars = 0 THEN 0
                    ELSE (ch.n_punct * 1000000) // ch.n_chars END AS punct
        FROM documents d LEFT JOIN agg a USING (doc_id) JOIN ch USING (doc_id)),
q AS (SELECT doc_id,
             CASE WHEN n_words < 10 THEN 1 ELSE 0 END
             + CASE WHEN n_words > 100000 THEN 2 ELSE 0 END
             + CASE WHEN rep > 200000 THEN 4 ELSE 0 END
             + CASE WHEN punct > 300000 THEN 8 ELSE 0 END AS qreasons
      FROM sig),
dup AS (SELECT doc_id,
               CASE WHEN doc_id != MIN(doc_id) OVER (PARTITION BY md5(text))
                    THEN 16 ELSE 0 END AS dbit
        FROM documents),
sh AS (SELECT doc_id,
              tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
                  || ' ' || lead(tok, 3) OVER w || ' ' || lead(tok, 4) OVER w AS s,
              lead(tok, 4) OVER w IS NOT NULL AS valid
       FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
bench AS (SELECT DISTINCT s FROM sh WHERE valid AND doc_id % 10 = 0),
cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS total,
               CAST(SUM(CASE WHEN s IN (SELECT s FROM bench)
                        THEN 1 ELSE 0 END) AS BIGINT) AS cont
        FROM sh WHERE valid GROUP BY doc_id),
cb AS (SELECT d.doc_id,
              CASE WHEN 2 * COALESCE(cnt.cont, 0) > COALESCE(cnt.total, 0)
                   THEN 32 ELSE 0 END AS cbit
       FROM documents d LEFT JOIN cnt USING (doc_id))
SELECT q.doc_id,
       CAST(q.qreasons + dup.dbit + cb.cbit AS BIGINT) AS reasons,
       CAST(CASE WHEN q.qreasons + dup.dbit + cb.cbit = 0
            THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM q JOIN dup USING (doc_id) JOIN cb USING (doc_id)"""


_PREPARE_CORPUS_ORACLE = (
    "WITH cur AS (" + _CURATE_ORACLE + """),
keptd AS (SELECT d.doc_id, length(d.text) AS len
          FROM documents d JOIN cur ON cur.doc_id = d.doc_id
          WHERE cur.kept = 1)
SELECT doc_id, CAST(len AS BIGINT) AS n_chars,
       CAST(1 + CASE WHEN len > 256 THEN (len - 256 + 191) // 192
                ELSE 0 END AS BIGINT) AS n_chunks
FROM keptd""")


def oracle_sql() -> Dict[str, str]:
    d = {
        "edge_table": SQL_EDGES_A,
        "graphml_edges": SQL_EDGES_A,
        "ncol_edges": SQL_EDGES_A,
        "pajek_edges": SQL_EDGES_A,
        "dimacs_arcs": (
            f"SELECT src, dst, CAST(weight AS BIGINT) AS weight "
            f"FROM ({SQL_EDGES_A_W})"),
        "gml_edges": SQL_EDGES_A,
        "dl_edges": SQL_EDGES_A,
        "lgl_edges": SQL_EDGES_A,
        "leda_edges": SQL_EDGES_A,
        "out_degree": f"""
WITH edges AS ({SQL_EDGES_A}), verts AS ({SQL_VERTS_A})
SELECT verts.v AS vertex, COALESCE(d.n, 0) AS deg
FROM verts LEFT JOIN (SELECT src, COUNT(*) AS n FROM edges GROUP BY src) d
ON d.src = verts.v ORDER BY vertex""",
        "in_degree": f"""
WITH edges AS ({SQL_EDGES_A}), verts AS ({SQL_VERTS_A})
SELECT verts.v AS vertex, COALESCE(d.n, 0) AS deg
FROM verts LEFT JOIN (SELECT dst, COUNT(*) AS n FROM edges GROUP BY dst) d
ON d.dst = verts.v ORDER BY vertex""",
        "pagerank": _sql_pagerank(),
        "pagerank_weighted": _sql_pagerank_weighted(),
        "pagerank_personalized": _sql_pagerank_personalized(),
        "eigenvector": _sql_eigenvector(),
        "centralization_eigenvector": _sql_eigenvector(centralization=True),
        "eigenvector_weighted": _sql_eigenvector_weighted(),
        "hits": _sql_hits(),
        "triad_census": _sql_triad_census(),
        "motifs3": _sql_motifs3(),
        "motifs4": f"""
WITH und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM ({derive.SQL_EDGES_SPARSE})),
deg AS (SELECT v, COUNT(*) AS deg FROM (
          SELECT lo AS v FROM und UNION ALL SELECT hi FROM und) GROUP BY v),
tri AS (SELECT u1.lo AS a, u1.hi AS b, u2.hi AS c
        FROM und u1 JOIN und u2 ON u2.lo = u1.hi
        JOIN und u3 ON u3.lo = u1.lo AND u3.hi = u2.hi),
tcount AS (SELECT COUNT(*) AS t FROM tri),
tv AS (SELECT v, COUNT(*) AS t FROM (
         SELECT a AS v FROM tri UNION ALL SELECT b FROM tri
         UNION ALL SELECT c FROM tri) GROUP BY v),
k4c AS (SELECT COUNT(*) AS k4 FROM und e1
        JOIN und e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
        JOIN und e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
        JOIN und e4 ON e4.lo = e1.lo AND e4.hi > e2.hi
        JOIN und e5 ON e5.lo = e1.hi AND e5.hi = e4.hi
        JOIN und e6 ON e6.lo = e2.hi AND e6.hi = e4.hi),
te AS (SELECT elo, ehi, COUNT(*) AS c FROM (
         SELECT a AS elo, b AS ehi FROM tri
         UNION ALL SELECT a, c FROM tri
         UNION ALL SELECT b, c FROM tri) GROUP BY elo, ehi),
draw AS (SELECT COALESCE(SUM(c * (c - 1) // 2), 0) AS d FROM te),
sym AS (SELECT lo AS src, hi AS dst FROM und
        UNION ALL SELECT hi, lo FROM und),
codeg AS (SELECT s1.dst AS u, s2.dst AS v, COUNT(*) AS c
          FROM sym s1 JOIN sym s2 ON s2.src = s1.src AND s2.dst > s1.dst
          GROUP BY 1, 2),
cyraw AS (SELECT COALESCE(SUM(c * (c - 1) // 2), 0) // 2 AS cy FROM codeg),
clawraw AS (SELECT SUM(deg * (deg - 1) * (deg - 2) // 6) AS s FROM deg),
pawraw AS (SELECT COALESCE(SUM(tv.t * (deg.deg - 2)), 0) AS s
           FROM tv JOIN deg ON deg.v = tv.v),
pmid AS (SELECT SUM((dl.deg - 1) * (dh.deg - 1)) AS s FROM und
         JOIN deg dl ON dl.v = und.lo JOIN deg dh ON dh.v = und.hi),
inv AS (SELECT
  (SELECT k4 FROM k4c) AS k4,
  (SELECT d FROM draw) - 6 * (SELECT k4 FROM k4c) AS diamond,
  (SELECT t FROM tcount) AS tt)
SELECT
  CAST((SELECT s FROM pmid) - 3 * inv.tt
       - 4 * ((SELECT cy FROM cyraw) - inv.diamond - 3 * inv.k4)
       - 2 * ((SELECT s FROM pawraw) - 4 * inv.diamond - 12 * inv.k4)
       - 6 * inv.diamond - 12 * inv.k4 AS BIGINT) AS path4,
  CAST((SELECT s FROM clawraw)
       - ((SELECT s FROM pawraw) - 4 * inv.diamond - 12 * inv.k4)
       - 2 * inv.diamond - 4 * inv.k4 AS BIGINT) AS star3,
  CAST((SELECT cy FROM cyraw) - inv.diamond - 3 * inv.k4 AS BIGINT) AS cycle4,
  CAST((SELECT s FROM pawraw) - 4 * inv.diamond - 12 * inv.k4 AS BIGINT) AS paw,
  CAST(inv.diamond AS BIGINT) AS diamond,
  CAST(inv.k4 AS BIGINT) AS k4
FROM inv""",
        "components": _sql_components(),
        "scc": _sql_scc(),
        "sssp_hops": _sql_sssp(),
        "sssp_tree": _sql_sssp_tree(),
        "topo_levels": f"""
WITH RECURSIVE edges AS MATERIALIZED (
  SELECT src, dst FROM ({derive.SQL_EDGES_VSPARSE}) WHERE src < dst),
verts AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
walk(v, d) AS (
  SELECT v, 0 FROM verts
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.v
)
SELECT v AS vertex, CAST(MAX(d) AS BIGINT) AS layer
FROM walk GROUP BY v ORDER BY vertex""",
        "sssp_weighted": _sql_sssp_weighted(),
        "coreness": _sql_coreness(),
        "simhash": _sql_simhash(),
        "minhash_pairs": _sql_minhash_pairs(),
        "dup_spans": r"""
WITH toks AS (
  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS pos, word
  FROM (
    SELECT doc_id, UNNEST(string_split_regex(text, '\s+')) AS word,
           UNNEST(range(1, len(string_split_regex(text, '\s+')) + 1)) AS i
    FROM documents
  ) WHERE word <> ''
),
wins AS (
  SELECT doc_id, pos,
         word || ' ' || lead(word, 1) OVER w || ' ' || lead(word, 2) OVER w
              || ' ' || lead(word, 3) OVER w || ' ' || lead(word, 4) OVER w AS gram,
         lead(word, 4) OVER w IS NOT NULL AS valid
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
v AS (SELECT doc_id, pos - 1 AS pos, gram FROM wins WHERE valid),
dup AS (SELECT gram FROM v GROUP BY gram HAVING COUNT(*) >= 2),
hits AS (SELECT doc_id, pos FROM v WHERE gram IN (SELECT gram FROM dup)),
brk AS (SELECT doc_id, pos,
        CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 5
             THEN 0 ELSE 1 END AS b
        FROM hits),
grp AS (SELECT doc_id, pos,
        SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) AS gid FROM brk)
SELECT doc_id, MIN(pos) AS span_start, CAST(MAX(pos) + 5 AS BIGINT) AS span_end
FROM grp GROUP BY doc_id, gid ORDER BY doc_id, span_start""",
        "clean_dup_spans": r"""
WITH toks AS (
  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS pos, word
  FROM (
    SELECT doc_id, UNNEST(string_split_regex(text, '\s+')) AS word,
           UNNEST(range(1, len(string_split_regex(text, '\s+')) + 1)) AS i
    FROM documents
  ) WHERE word <> ''
),
wins AS (
  SELECT doc_id, pos,
         word || ' ' || lead(word, 1) OVER w || ' ' || lead(word, 2) OVER w
              || ' ' || lead(word, 3) OVER w || ' ' || lead(word, 4) OVER w AS gram,
         lead(word, 4) OVER w IS NOT NULL AS valid
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
v AS (SELECT doc_id, pos, gram FROM wins WHERE valid),
dup AS (SELECT gram FROM v GROUP BY gram HAVING COUNT(*) >= 2),
hits AS (SELECT doc_id, pos FROM v WHERE gram IN (SELECT gram FROM dup)),
cover AS (SELECT DISTINCT h.doc_id, h.pos + u.o AS tpos
          FROM hits h CROSS JOIN (SELECT UNNEST(range(5)) AS o) u),
kept AS (SELECT t.doc_id, t.pos, t.word FROM toks t
         LEFT JOIN cover c ON c.doc_id = t.doc_id AND c.tpos = t.pos
         WHERE c.doc_id IS NULL),
agg AS (SELECT doc_id,
               string_agg(word, ' ' ORDER BY pos) AS clean_text,
               CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(a.clean_text, '') AS clean_text,
       COALESCE(t.n, 0) - COALESCE(a.n_kept, 0) AS n_removed
FROM documents d
LEFT JOIN agg a ON a.doc_id = d.doc_id
LEFT JOIN tot t ON t.doc_id = d.doc_id
ORDER BY d.doc_id""",
        "pii_counts": r"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS BIGINT) AS n_url,
  CAST(len(regexp_extract_all(text,
    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ip,
  CAST(CASE WHEN len(regexp_extract_all(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
    + len(regexp_extract_all(text, 'https?://[^\s]+'))
    + len(regexp_extract_all(text,
    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) > 0
    THEN 1 ELSE 0 END AS BIGINT) AS has_pii
FROM documents ORDER BY doc_id""",
        "ngram_dups": _sql_ngram_dups(),
        "k_core": _sql_k_core(),
        "mst": _sql_mst(),
        "mst_unweighted": _sql_mst(
            edges_w_sql=f"SELECT src, dst, 1 AS weight FROM ({SQL_EDGES_A})"),
        "bridges": _SQL_BRIDGES,
        "two_ecc": _SQL_TWO_ECC,
        "girth": _sql_girth(),
        "articulation_points": _SQL_ARTICULATION,
        "biconnected_components": _sql_biconn(),
        "random_walks": _sql_random_walks(),
        "random_walks_weighted": _sql_random_walks_weighted(),
        "path_length_hist": _sql_path_length_hist(),
        "avg_path_length": _sql_avg_path_length(),
        "transitivity_avglocal": f"""
WITH edges AS MATERIALIZED ({SQL_EDGES_A}),
und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS lo,
                     GREATEST(src, dst) AS hi FROM edges),
sym AS MATERIALIZED (SELECT lo AS a, hi AS b FROM und
                     UNION ALL SELECT hi, lo FROM und),
deg AS (SELECT a AS v, COUNT(*) AS d FROM sym GROUP BY a),
tri AS (SELECT s1.a AS v, COUNT(*) AS t
        FROM sym s1 JOIN sym s2 ON s1.a = s2.a AND s1.b < s2.b
        JOIN und u ON u.lo = s1.b AND u.hi = s2.b
        GROUP BY s1.a),
cc AS (SELECT deg.v,
         CAST(round_even(2.0 * COALESCE(tri.t, 0)
              / (deg.d * (deg.d - 1)) * 1e9, 0) AS BIGINT) AS e9
       FROM deg LEFT JOIN tri ON tri.v = deg.v WHERE deg.d >= 2)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
       CAST(SUM(e9) AS BIGINT) AS cc_sum_e9 FROM cc""",
        "betweenness": _sql_betweenness(),
        "betweenness_sampled": _sql_betweenness_sampled(),
        "edge_betweenness": _sql_edge_betweenness(),
        "closeness": _sql_closeness(),
        "harmonic": _sql_harmonic(),
        "harmonic_sampled": _sql_harmonic_sampled(),
        "closeness_sampled": _sql_closeness_sampled(),
        "neighborhood_sketches": _sql_neighborhood_sketches(),
        "eccentricity": _sql_eccentricity(),
        "diameter": _sql_diameter(),
        "graph_center": _sql_graph_center(),
        "transitive_closure": f"""
WITH RECURSIVE edges AS MATERIALIZED ({derive.SQL_EDGES_VSPARSE}),
reach(s, v) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.s, e.dst FROM reach r JOIN edges e ON e.src = r.v
)
SELECT s AS src, v AS dst FROM reach WHERE s != v ORDER BY src, dst""",
        "density": f"""
WITH edges AS MATERIALIZED ({SQL_EDGES_A}),
verts AS ({SQL_VERTS_A}),
c AS (SELECT (SELECT COUNT(*) FROM verts) AS n,
             (SELECT COUNT(*) FROM edges) AS m)
SELECT CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
  CAST(round_even(CAST(m AS DOUBLE) / (n * (n - 1)) * 1e9, 0) AS BIGINT)
  AS density_e9 FROM c""",
        "is_forest": f"""
WITH RECURSIVE edges AS MATERIALIZED ({derive.SQL_EDGES_VSPARSE}),
und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS lo,
                     GREATEST(src, dst) AS hi FROM edges),
verts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT lo AS v FROM und UNION ALL
    SELECT hi FROM und UNION ALL SELECT src FROM edges
    UNION ALL SELECT dst FROM edges)),
sym AS MATERIALIZED (SELECT lo AS a, hi AS b FROM und
                     UNION ALL SELECT hi, lo FROM und),
reach(v, l) AS (
  SELECT v, v FROM verts
  UNION
  SELECT s.b, r.l FROM reach r JOIN sym s ON s.a = r.v
),
lab AS (SELECT v, MIN(l) AS l FROM reach GROUP BY v),
c AS (SELECT (SELECT COUNT(*) FROM und) AS m,
             (SELECT COUNT(DISTINCT v) FROM verts) AS n,
             (SELECT COUNT(DISTINCT l) FROM lab) AS nc)
SELECT CAST(CASE WHEN m = n - nc THEN 1 ELSE 0 END AS BIGINT) AS is_forest,
       CAST(CASE WHEN m = n - nc AND nc = 1 THEN 1 ELSE 0 END AS BIGINT)
       AS is_tree FROM c""",
        "assortativity_nominal": f"""
WITH edges AS MATERIALIZED ({SQL_EDGES_A}),
cnt AS (SELECT src % 7 AS ti, dst % 7 AS tj, COUNT(*) AS c
        FROM edges GROUP BY 1, 2),
m AS (SELECT SUM(c) AS m FROM cnt),
sii AS (SELECT COALESCE(SUM(c), 0) AS s FROM cnt WHERE ti = tj),
ab AS (SELECT SUM(o.oc * i.ic) AS s
       FROM (SELECT ti, SUM(c) AS oc FROM cnt GROUP BY ti) o
       JOIN (SELECT tj, SUM(c) AS ic FROM cnt GROUP BY tj) i ON i.tj = o.ti)
SELECT CAST(round_even(
  CAST(sii.s * m.m - ab.s AS DOUBLE) / (m.m * m.m - ab.s) * 1e9, 0)
  AS BIGINT) AS nominal_e9
FROM sii, m, ab""",
        "triangle_list": f"""
WITH und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM ({derive.SQL_EDGES_SPARSE}))
SELECT u1.lo AS a, u1.hi AS b, u2.hi AS c
FROM und u1 JOIN und u2 ON u2.lo = u1.hi
JOIN und u3 ON u3.lo = u1.lo AND u3.hi = u2.hi
ORDER BY a, b, c""",
        "component_sizes": _sql_component_sizes(),
        "lpa": _sql_lpa(),
        "triangles": _SQL_TRIANGLES,
        "local_scan1": _SQL_SCAN1,
        "burt_constraint": f"""
WITH und AS MATERIALIZED ({derive.SQL_UND_SPARSE_W}),
sym AS (SELECT lo AS i, hi AS j, weight AS w FROM und
        UNION ALL SELECT hi, lo, weight FROM und),
s AS (SELECT i, SUM(w) AS s FROM sym GROUP BY i),
p AS (SELECT sym.i, sym.j, CAST(sym.w AS DOUBLE) / s.s AS p
      FROM sym JOIN s USING (i)),
two AS (SELECT a.i, b.j, SUM(a.p * b.p) AS t
        FROM p a JOIN p b ON b.i = a.j AND b.j != a.i GROUP BY a.i, b.j),
terms AS (SELECT p.i, POWER(p.p + COALESCE(two.t, 0), 2) AS term
          FROM p LEFT JOIN two ON two.i = p.i AND two.j = p.j)
SELECT i AS vertex,
       CAST(round_even(SUM(term) * 1e6, 0) AS BIGINT) AS constraint_e6
FROM terms GROUP BY i ORDER BY vertex""",
        "knn_weighted": f"""
WITH und AS MATERIALIZED ({derive.SQL_UND_SPARSE_W}),
deg AS (SELECT v, COUNT(*) AS d FROM (
          SELECT lo AS v FROM und UNION ALL SELECT hi FROM und) GROUP BY v),
c AS (SELECT v, SUM(wn) AS wnum, SUM(w) AS s FROM (
        SELECT u.lo AS v, u.weight * dh.d AS wn, u.weight AS w
        FROM und u JOIN deg dh ON dh.v = u.hi
        UNION ALL
        SELECT u.hi, u.weight * dl.d, u.weight
        FROM und u JOIN deg dl ON dl.v = u.lo) GROUP BY v)
SELECT v AS vertex, CAST(wnum AS BIGINT) AS wnum,
       CAST(s AS BIGINT) AS strength
FROM c ORDER BY vertex""",
        "edge_clustering4": f"""
WITH und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM ({derive.SQL_EDGES_SPARSE})),
sym AS MATERIALIZED (SELECT lo AS u, hi AS w FROM und
                     UNION ALL SELECT hi, lo FROM und),
deg AS (SELECT u AS v, COUNT(*) AS d FROM sym GROUP BY u),
codeg AS (SELECT s1.w AS a, s2.w AS b, COUNT(*) AS c
          FROM sym s1 JOIN sym s2 ON s2.u = s1.u AND s2.w > s1.w
          GROUP BY 1, 2),
z AS (SELECT p.u AS lo, s3.w AS hi, COUNT(*) AS z FROM
      (SELECT s1.u, s1.w AS x, s2.w AS y FROM sym s1
       JOIN sym s2 ON s2.u = s1.w AND s2.w != s1.u) p
      JOIN sym s3 ON s3.u = p.y AND s3.w != p.x
      WHERE p.u < s3.w GROUP BY 1, 2)
SELECT e.lo, e.hi, CAST(COALESCE(z.z, 0) AS BIGINT) AS cyc4,
       CAST((dl.d - 1) * (dh.d - 1) - COALESCE(cd.c, 0) AS BIGINT) AS denom
FROM und e
JOIN deg dl ON dl.v = e.lo JOIN deg dh ON dh.v = e.hi
LEFT JOIN codeg cd ON cd.a = e.lo AND cd.b = e.hi
LEFT JOIN z ON z.lo = e.lo AND z.hi = e.hi
ORDER BY e.lo, e.hi""",
        "transitivity_barrat": f"""
WITH und AS MATERIALIZED ({derive.SQL_UND_SPARSE_W}),
tri AS (SELECT u1.lo AS a, u1.hi AS b, u2.hi AS c,
               u1.weight AS wab, u2.weight AS wbc, u3.weight AS wac
        FROM und u1 JOIN und u2 ON u2.lo = u1.hi
        JOIN und u3 ON u3.lo = u1.lo AND u3.hi = u2.hi),
corners AS (SELECT a AS v, wab + wac AS ws FROM tri
            UNION ALL SELECT b, wab + wbc FROM tri
            UNION ALL SELECT c, wac + wbc FROM tri),
ws AS (SELECT v, SUM(ws) AS s FROM corners GROUP BY v),
deg AS (SELECT v, COUNT(*) AS deg, SUM(w) AS strength FROM (
          SELECT lo AS v, weight AS w FROM und
          UNION ALL SELECT hi, weight FROM und) GROUP BY v)
SELECT deg.v AS vertex, CAST(COALESCE(ws.s, 0) AS BIGINT) AS tri_wsum,
       CAST(deg.strength AS BIGINT) AS strength,
       CAST(deg.deg AS BIGINT) AS deg
FROM deg LEFT JOIN ws ON ws.v = deg.v
WHERE deg.deg >= 2 ORDER BY vertex""",
        "maximal_cliques": _SQL_MAXIMAL_CLIQUES,
        "clique_number": _SQL_MAXIMAL_CLIQUES.replace(
            "SELECT len(members) AS size, COUNT(*) AS n_cliques\nFROM maxcl GROUP BY size ORDER BY size",
            "SELECT CAST(MAX(len(members)) AS BIGINT) AS clique_number FROM maxcl"),
        "modularity": _sql_modularity(),
        "lpa_weighted": _sql_lpa_weighted(),
        "modularity_weighted": _sql_modularity_weighted(),
        "dyad_census": f"""
WITH edges AS MATERIALIZED ({SQL_EDGES_A}),
verts AS ({SQL_VERTS_A}),
m AS (SELECT COUNT(*) AS c FROM edges a JOIN edges b ON b.src = a.dst AND b.dst = a.src),
t AS (SELECT COUNT(*) AS c FROM edges),
nv AS (SELECT COUNT(*) AS c FROM verts)
SELECT CAST((SELECT c FROM m) / 2 AS BIGINT) AS mut,
       CAST((SELECT c FROM t) - (SELECT c FROM m) AS BIGINT) AS asym,
       CAST((SELECT c FROM nv) * ((SELECT c FROM nv) - 1) / 2
            - (SELECT c FROM m) / 2
            - ((SELECT c FROM t) - (SELECT c FROM m)) AS BIGINT) AS "null"
""",
        "reciprocity": f"""
WITH edges AS ({SQL_EDGES_A})
SELECT CAST(ROUND(
  (SELECT COUNT(*) FROM edges a JOIN edges b ON b.src = a.dst AND b.dst = a.src)
  * 1e9 / (SELECT COUNT(*) FROM edges)) AS BIGINT) AS reciprocity_e9""",
        "mutual_edges": f"""
WITH edges AS ({SQL_EDGES_A})
SELECT a.src, a.dst FROM edges a JOIN edges b ON b.src = a.dst AND b.dst = a.src""",
        "count_multiple": f"""
SELECT src, dst, COUNT(*) AS multiplicity FROM ({SQL_EDGES_MULTI}) GROUP BY src, dst""",
        "degree_topk": f"""
WITH edges AS ({SQL_EDGES_A}), verts AS ({SQL_VERTS_A}),
d AS (SELECT verts.v AS vertex, COALESCE(x.n, 0) AS deg FROM verts
      LEFT JOIN (SELECT src, COUNT(*) AS n FROM edges GROUP BY src) x ON x.src = verts.v)
SELECT vertex, deg FROM d ORDER BY deg DESC, vertex ASC LIMIT 10""",
        "intersection": f"""
SELECT a.src, a.dst FROM ({SQL_EDGES_A}) a JOIN ({SQL_EDGES_B}) b USING (src, dst)""",
        "difference": f"""
SELECT a.src, a.dst FROM ({SQL_EDGES_A}) a ANTI JOIN ({SQL_EDGES_B}) b USING (src, dst)""",
        "compose": f"""
SELECT DISTINCT a.src, b.dst FROM ({SQL_EDGES_A}) a JOIN ({SQL_EDGES_B}) b ON b.src = a.dst""",
        "union": f"""
SELECT src, dst FROM ({SQL_EDGES_A}) UNION SELECT src, dst FROM ({SQL_EDGES_B})""",
        "disjoint_union": f"""
SELECT src, dst FROM ({SQL_EDGES_A})
UNION ALL SELECT src + {V} AS src, dst + {V} AS dst FROM ({SQL_EDGES_B})""",
        "complementer": f"""
WITH e AS ({SQL_EDGES_A}), v AS (SELECT range AS x FROM range({V}))
SELECT a.x AS src, b.x AS dst
FROM v a CROSS JOIN v b
WHERE a.x != b.x
  AND NOT EXISTS (SELECT 1 FROM e WHERE e.src = a.x AND e.dst = b.x)""",
        "rewire_degrees": f"""
WITH edges AS ({SQL_EDGES_A}), verts AS ({SQL_VERTS_A})
SELECT verts.v AS vertex,
       COALESCE(o.n, 0) AS out_deg,
       COALESCE(i.n, 0) AS in_deg
FROM verts
LEFT JOIN (SELECT src, COUNT(*) AS n FROM edges GROUP BY src) o ON o.src = verts.v
LEFT JOIN (SELECT dst, COUNT(*) AS n FROM edges GROUP BY dst) i ON i.dst = verts.v
ORDER BY vertex""",
        "strength": f"""
WITH em AS (SELECT (o_orderkey % {V}) AS src, ((o_custkey * 7) % {V}) AS dst,
                   (o_orderkey % 10) + 1 AS w
            FROM orders WHERE (o_orderkey % {V}) != ((o_custkey * 7) % {V})),
verts AS (SELECT src AS v FROM em UNION SELECT dst FROM em)
SELECT verts.v AS vertex, COALESCE(s.t, 0) AS strength
FROM verts LEFT JOIN (SELECT src, CAST(SUM(w) AS BIGINT) AS t FROM em GROUP BY src) s
ON s.src = verts.v ORDER BY vertex""",
        "transitivity": f"""
WITH edges AS MATERIALIZED ({SQL_EDGES_A}),
und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi FROM edges),
degs AS (SELECT v, COUNT(*) AS deg FROM
  (SELECT lo AS v FROM und UNION ALL SELECT hi FROM und) GROUP BY v),
orient AS MATERIALIZED (
  SELECT CASE WHEN (dl.deg < dh.deg) OR (dl.deg = dh.deg AND u.lo < u.hi)
              THEN u.lo ELSE u.hi END AS a,
         CASE WHEN (dl.deg < dh.deg) OR (dl.deg = dh.deg AND u.lo < u.hi)
              THEN u.hi ELSE u.lo END AS b
  FROM und u JOIN degs dl ON dl.v = u.lo JOIN degs dh ON dh.v = u.hi),
tri AS (SELECT COUNT(*) AS nt FROM orient e1
  JOIN orient e2 ON e2.a = e1.b
  JOIN orient e3 ON e3.a = e1.a AND e3.b = e2.b),
tp AS (SELECT SUM(CAST(deg AS DOUBLE) * (deg - 1) / 2) AS triples FROM degs)
SELECT CAST(ROUND(3.0 * (SELECT nt FROM tri) / (SELECT triples FROM tp) * 1e9) AS BIGINT)
  AS transitivity_e9""",
        "cocitation": f"""
WITH edges AS MATERIALIZED ({SQL_EDGES_A})
SELECT e1.dst AS a, e2.dst AS b, COUNT(*) AS common
FROM edges e1 JOIN edges e2 ON e2.src = e1.src AND e1.dst < e2.dst
GROUP BY e1.dst, e2.dst""",
        "bibcoupling": f"""
WITH edges AS MATERIALIZED ({SQL_EDGES_A})
SELECT e1.src AS a, e2.src AS b, COUNT(*) AS common
FROM edges e1 JOIN edges e2 ON e2.dst = e1.dst AND e1.src < e2.src
GROUP BY e1.src, e2.src""",
        "neighbor_jaccard": f"""
WITH edges AS MATERIALIZED ({SQL_EDGES_A}),
sym AS MATERIALIZED (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
common AS (SELECT e1.dst AS a, e2.dst AS b, COUNT(*) AS common
           FROM sym e1 JOIN sym e2 ON e2.src = e1.src AND e1.dst < e2.dst
           GROUP BY e1.dst, e2.dst),
deg AS (SELECT src AS v, COUNT(*) AS d FROM sym GROUP BY src)
SELECT c.a, c.b, c.common,
  CAST(ROUND(CAST(c.common AS DOUBLE) / (da.d + db.d - c.common) * 1e9) AS BIGINT)
    AS jaccard_e9
FROM common c JOIN deg da ON da.v = c.a JOIN deg db ON db.v = c.b""",
        "dice": f"""
WITH edges AS MATERIALIZED ({SQL_EDGES_A}),
sym AS MATERIALIZED (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
common AS (SELECT e1.dst AS a, e2.dst AS b, COUNT(*) AS common
           FROM sym e1 JOIN sym e2 ON e2.src = e1.src AND e1.dst < e2.dst
           GROUP BY e1.dst, e2.dst),
deg AS (SELECT src AS v, COUNT(*) AS d FROM sym GROUP BY src)
SELECT c.a, c.b, c.common,
  CAST(ROUND(2.0 * CAST(c.common AS DOUBLE) / (da.d + db.d) * 1e9) AS BIGINT)
    AS dice_e9
FROM common c JOIN deg da ON da.v = c.a JOIN deg db ON db.v = c.b""",
        "inv_log_weighted": f"""
WITH edges AS MATERIALIZED ({SQL_EDGES_A}),
sym AS MATERIALIZED (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
deg AS (SELECT src AS v, COUNT(*) AS d FROM sym GROUP BY src),
w AS (SELECT v, CAST(ROUND(CASE WHEN d > 1
        THEN (1.0 / LN(CAST(d AS DOUBLE))) * 1e9 ELSE d * 1e9 END) AS BIGINT) AS w
      FROM deg)
SELECT e1.dst AS a, e2.dst AS b, CAST(SUM(w.w) AS BIGINT) AS sim_e9
FROM sym e1 JOIN sym e2 ON e2.src = e1.src AND e1.dst < e2.dst
JOIN w ON w.v = e1.src
GROUP BY e1.dst, e2.dst""",
        "knn_degree": f"""
WITH edges AS MATERIALIZED ({SQL_EDGES_A}),
deg AS (SELECT v, COUNT(*) AS d FROM
        (SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges) GROUP BY v),
knnsum AS (SELECT x.v, CAST(SUM(x.nd) AS BIGINT) AS s FROM (
    SELECT e.src AS v, dg.d AS nd FROM edges e JOIN deg dg ON dg.v = e.dst
    UNION ALL
    SELECT e.dst, dg.d FROM edges e JOIN deg dg ON dg.v = e.src) x GROUP BY x.v)
SELECT k.v AS vertex, dg.d AS deg,
  CAST(ROUND(CAST(k.s AS DOUBLE) / dg.d * 1e9) AS BIGINT) AS knn_e9
FROM knnsum k JOIN deg dg ON dg.v = k.v ORDER BY vertex""",
        "knnk": f"""
WITH edges AS MATERIALIZED ({SQL_EDGES_A}),
deg AS (SELECT v, COUNT(*) AS d FROM
        (SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges) GROUP BY v),
knnsum AS (SELECT x.v, CAST(SUM(x.nd) AS BIGINT) AS s FROM (
    SELECT e.src AS v, dg.d AS nd FROM edges e JOIN deg dg ON dg.v = e.dst
    UNION ALL
    SELECT e.dst, dg.d FROM edges e JOIN deg dg ON dg.v = e.src) x GROUP BY x.v),
knn AS (SELECT k.v, dg.d AS deg,
        CAST(ROUND(CAST(k.s AS DOUBLE) / dg.d * 1e9) AS BIGINT) AS knn_e9
        FROM knnsum k JOIN deg dg ON dg.v = k.v)
SELECT deg, CAST((2 * SUM(knn_e9) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
  AS knnk_e9 FROM knn GROUP BY deg ORDER BY deg""",
        "diversity": f"""
WITH ew AS MATERIALIZED ({SQL_EDGES_A_W}),
inc AS (SELECT src AS v, CAST(weight AS DOUBLE) AS w FROM ew
        UNION ALL SELECT dst, CAST(weight AS DOUBLE) FROM ew),
agg AS (SELECT v, SUM(w) AS s, SUM(w * LN(w)) AS e, COUNT(*) AS k FROM inc GROUP BY v)
SELECT v AS vertex,
  CAST(ROUND(CASE WHEN k > 1 THEN (LN(s) - e / s) / LN(CAST(k AS DOUBLE))
             ELSE 0.0 END * 1e6) AS BIGINT) AS div_e6
FROM agg ORDER BY vertex""",
        "neighborhood2": f"""
WITH edges AS MATERIALIZED ({SQL_EDGES_A}),
sym AS MATERIALIZED (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
alln AS (SELECT a.src AS v, b.dst AS u FROM sym a JOIN sym b ON b.src = a.dst
         UNION SELECT src, dst FROM sym
         UNION SELECT src, src FROM sym)
SELECT v AS vertex, COUNT(*) AS nsize FROM alln GROUP BY v ORDER BY vertex""",
        "assortativity": f"""
WITH edges AS MATERIALIZED ({SQL_EDGES_A}),
verts AS ({SQL_VERTS_A}),
od AS (SELECT verts.v, COALESCE(x.n, 0) AS d FROM verts
       LEFT JOIN (SELECT src, COUNT(*) AS n FROM edges GROUP BY src) x ON x.src = verts.v),
idg AS (SELECT verts.v, COALESCE(x.n, 0) AS d FROM verts
        LEFT JOIN (SELECT dst, COUNT(*) AS n FROM edges GROUP BY dst) x ON x.dst = verts.v),
m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(CAST(o.d AS DOUBLE)) AS sx,
             SUM(CAST(i.d AS DOUBLE)) AS sy, SUM(CAST(o.d AS DOUBLE)*o.d) AS sxx,
             SUM(CAST(i.d AS DOUBLE)*i.d) AS syy, SUM(CAST(o.d AS DOUBLE)*i.d) AS sxy
      FROM edges e JOIN od o ON o.v = e.src JOIN idg i ON i.v = e.dst)
SELECT CAST(ROUND((sxy/n - (sx/n)*(sy/n)) /
  SQRT((sxx/n - (sx/n)*(sx/n)) * (syy/n - (sy/n)*(sy/n))) * 1e9) AS BIGINT)
  AS assortativity_e9 FROM m""",
        "has_cycle": f"""
WITH RECURSIVE edges AS MATERIALIZED ({SQL_EDGES_A}),
reach(a, b) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
)
SELECT CASE WHEN EXISTS (SELECT 1 FROM reach WHERE a = b) THEN 1 ELSE 0 END AS has_cycle""",
        "exact_dedup": """
SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
FROM documents GROUP BY md5(text)""",
        "token_count": f"""
SELECT doc_id, CAST(len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS BIGINT) AS n_tokens
FROM documents ORDER BY doc_id""",
        "text_stats": r"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
  CAST(ROUND(CASE WHEN length(text) = 0 THEN 0
       ELSE CAST(len(regexp_extract_all(text, '[^\sA-Za-z0-9]')) AS DOUBLE) / length(text)
       END * 1e6) AS BIGINT) AS punct_ratio_e6
FROM documents ORDER BY doc_id""",
        "lang_id": _sql_lang_id(),
        "fingerprint": """
SELECT doc_id,
  CASE WHEN length(text) < 8 THEN md5(text)
       ELSE list_min(list_transform(range(1, length(text) - 8 + 2),
                     i -> md5(substr(text, CAST(i AS INT), 8))))
  END AS fingerprint
FROM documents ORDER BY doc_id""",
        "embedding_near_dups": """
WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS a, b.vec_id AS b,
  CAST(ROUND(list_cosine_similarity(a.v, b.v) * 1e6) AS BIGINT) AS score_e6
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.35""",
        "event_type_count": "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
        "hopping_window": """
WITH e AS (SELECT epoch_us(ts) AS t, event_type,
                  CAST(ROUND(value * 1e6) AS BIGINT) AS v6 FROM events),
w AS (SELECT (e.t // 900000000) * 900000000 - k.range * 900000000 AS window_us,
             e.event_type, e.v6, e.t
      FROM e CROSS JOIN range(0, 4) k)
SELECT window_us, event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(v6) AS BIGINT) AS value_e6
FROM w WHERE window_us >= 0 AND t < window_us + 3600000000
GROUP BY window_us, event_type""",
        "tumbling_window": """
WITH b AS (SELECT (epoch_us(ts) - epoch_us(ts) % 3600000000) AS window_us,
                  event_type, value FROM events)
SELECT window_us, event_type, COUNT(*) AS n,
       CAST(ROUND(SUM(value) * 1e6) AS BIGINT) AS value_sum_e6
FROM b GROUP BY window_us, event_type""",
        "sessionize": """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
o AS (SELECT user_id, ts_us,
        CASE WHEN LAG(ts_us) OVER w IS NULL
             OR ts_us - LAG(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
s AS (SELECT user_id, ts_us,
        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                         ROWS UNBOUNDED PRECEDING) AS sid
      FROM o)
SELECT user_id, MIN(ts_us) AS session_start_us, COUNT(*) AS n_events
FROM s GROUP BY user_id, sid""",
        "asof_prev_event": """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                  CAST(ROUND(value * 1e6) AS BIGINT) AS value_e6 FROM events)
SELECT a.user_id, a.ts_us, a.event_id, a.value_e6,
       b.event_id AS prev_event_id, b.value_e6 AS prev_value_e6
FROM e a ASOF JOIN e b ON a.user_id = b.user_id AND a.ts_us > b.ts_us""",
        "asof_order": """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
o AS (SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS ots,
             MAX(o_orderkey) AS prev_orderkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS prev_total_e2
      FROM orders GROUP BY 1, 2)
SELECT e.user_id, e.ts_us, e.event_id, o.prev_orderkey, o.prev_total_e2
FROM e ASOF JOIN o ON e.user_id = o.user_id AND e.ts_us >= o.ots""",
        "range_window_join": """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events)
SELECT b.user_id, b.ts_us, b.event_id AS pid, a.ts_us AS lo_us,
       a.ts_us + 3600000000 AS hi_us, a.event_id AS iid
FROM e a JOIN e b ON a.user_id = b.user_id
  AND b.ts_us >= a.ts_us AND b.ts_us < a.ts_us + 3600000000""",
        "doclen_quantiles": """
WITH s AS (SELECT n_chars AS v,
                  ROW_NUMBER() OVER (ORDER BY n_chars) - 1 AS r,
                  COUNT(*) OVER () AS n
           FROM documents),
q(q) AS (VALUES (0.1), (0.25), (0.5), (0.75), (0.9), (0.99))
SELECT CAST(q.q AS DOUBLE) AS q, CAST(s.v AS BIGINT) AS value
FROM q JOIN s ON s.r = CAST(FLOOR(q.q * (s.n - 1)) AS BIGINT)""",
        "doclen_percentile_filter": """
WITH s AS (SELECT n_chars AS v,
                  ROW_NUMBER() OVER (ORDER BY n_chars) - 1 AS r,
                  COUNT(*) OVER () AS n
           FROM documents),
t AS (SELECT v FROM s WHERE r = CAST(FLOOR(0.25 * (n - 1)) AS BIGINT))
SELECT doc_id, n_chars FROM documents, t WHERE n_chars >= t.v""",
        "jsonl_docs": """
SELECT doc_id, md5(text) AS text_md5, lang FROM documents""",
        "chunk_docs": """
WITH d AS (SELECT doc_id, text,
                  1 + CASE WHEN length(text) > 256
                      THEN (length(text) - 256 + 191) // 192 ELSE 0 END
                    AS nchunks
           FROM documents),
c AS (SELECT d.doc_id, u.k AS chunk_id,
             substring(d.text, CAST(u.k * 192 + 1 AS BIGINT), 256)
               AS chunk
      FROM d, LATERAL unnest(generate_series(0, d.nchunks - 1)) u(k))
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       md5(chunk) AS chunk_md5
FROM c""",
        "modularity_matrix": """
WITH edges AS (SELECT DISTINCT (o_orderkey % 512) AS src,
                      ((o_custkey * 7) % 512) AS dst
               FROM orders
               WHERE (o_orderkey % 512) != ((o_custkey * 7) % 512)),
und AS (SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
        FROM edges),
vs AS (SELECT unnest(generate_series(0, 511)) AS v),
deg AS (SELECT vs.v, CAST(COALESCE(d.n, 0) AS BIGINT) AS k
        FROM vs LEFT JOIN (
          SELECT v, COUNT(*) AS n FROM (
            SELECT lo AS v FROM und UNION ALL SELECT hi FROM und)
          GROUP BY v) d ON d.v = vs.v),
m AS (SELECT COUNT(*) AS m FROM und)
SELECT CAST(a.v AS BIGINT) AS i, CAST(b.v AS BIGINT) AS j,
       CAST(CASE WHEN u.lo IS NOT NULL THEN 2 * m.m ELSE 0 END
            - da.k * db.k AS BIGINT) AS b_num
FROM vs a JOIN vs b ON b.v >= a.v
JOIN deg da ON da.v = a.v JOIN deg db ON db.v = b.v
LEFT JOIN und u ON u.lo = a.v AND u.hi = b.v
CROSS JOIN m""",
        "correlated_pair": f"""
WITH v AS (SELECT unnest(generate_series(0, 49)) AS i),
pr AS (SELECT a.i AS i, b.i AS j,
              md5('37:b:' || CAST(a.i AS VARCHAR) || ':'
                  || CAST(b.i AS VARCHAR)) AS hb,
              md5('37:c:' || CAST(a.i AS VARCHAR) || ':'
                  || CAST(b.i AS VARCHAR)) AS hc
       FROM v a JOIN v b ON b.i > a.i),
d AS (SELECT i, j, ({_md5_fold15('hb')}) AS rb,
             ({_md5_fold15('hc')}) AS rc
      FROM pr)
SELECT CAST(i AS BIGINT) AS src, CAST(j AS BIGINT) AS dst
FROM d
WHERE (rb < {200_000 * 16**15 // 1_000_000}
       AND rc < {600_000 * 16**15 // 1_000_000})
   OR (rb >= {200_000 * 16**15 // 1_000_000}
       AND rc < {100_000 * 16**15 // 1_000_000})""",
        "growing_random": f"""
WITH steps AS (SELECT unnest(generate_series(1, 59)) AS i),
t AS (SELECT i, u.j FROM steps,
      LATERAL unnest(generate_series(0, 1)) u(j)),
h AS (SELECT i, j,
             md5('23:f:' || CAST(i AS VARCHAR) || ':'
                 || CAST(j AS VARCHAR)) AS hf,
             md5('23:t:' || CAST(i AS VARCHAR) || ':'
                 || CAST(j AS VARCHAR)) AS ht
      FROM t)
SELECT CAST(({_md5_fold15('hf')}) % (i + 1) AS BIGINT) AS src,
       CAST(1 + ({_md5_fold15('ht')}) % i AS BIGINT) AS dst
FROM h""",
        "islands": f"""
WITH v AS (SELECT unnest(generate_series(0, 47)) AS i),
ih AS (SELECT a.i AS src, b.i AS dst,
              md5('29:p:' || CAST(a.i AS VARCHAR) || ':'
                  || CAST(b.i AS VARCHAR)) AS hh
       FROM v a JOIN v b ON b.i > a.i AND a.i // 12 = b.i // 12),
intra AS (SELECT src, dst FROM ih
          WHERE ({_md5_fold15('hh')}) < {300_000 * 16**15 // 1_000_000}),
g AS (SELECT DISTINCT i // 12 AS g FROM v),
ph AS (SELECT a.g AS ga, b.g AS gb, k.j AS k,
              md5('29:u:' || CAST(a.g AS VARCHAR) || ':'
                  || CAST(b.g AS VARCHAR) || ':'
                  || CAST(k.j AS VARCHAR)) AS hu,
              md5('29:v:' || CAST(a.g AS VARCHAR) || ':'
                  || CAST(b.g AS VARCHAR) || ':'
                  || CAST(k.j AS VARCHAR)) AS hv
       FROM g a JOIN g b ON b.g > a.g,
            LATERAL unnest(generate_series(0, 1)) k(j)),
inter AS (SELECT ga * 12 + ({_md5_fold15('hu')}) % 12 AS src,
                 gb * 12 + ({_md5_fold15('hv')}) % 12 AS dst
          FROM ph)
SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM intra
UNION ALL
SELECT CAST(src AS BIGINT), CAST(dst AS BIGINT) FROM inter""",
        "grg": f"""
WITH v AS (SELECT unnest(generate_series(0, 299)) AS i),
h AS (SELECT i, md5('31:x:' || CAST(i AS VARCHAR)) AS hx,
             md5('31:y:' || CAST(i AS VARCHAR)) AS hy
      FROM v),
c AS (SELECT i, ({_md5_fold15('hx')}) % 1048576 AS x,
             ({_md5_fold15('hy')}) % 1048576 AS y
      FROM h)
SELECT CAST(a.i AS BIGINT) AS src, CAST(b.i AS BIGINT) AS dst
FROM c a JOIN c b ON b.i > a.i
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      < {83886 * 83886}""",
        "full_citation": """
WITH v AS (SELECT unnest(generate_series(1, 39)) AS i)
SELECT CAST(v.i AS BIGINT) AS src, CAST(u.j AS BIGINT) AS dst
FROM v, LATERAL unnest(generate_series(0, v.i - 1)) u(j)""",
        "chordal_ring": """
WITH v AS (SELECT unnest(generate_series(0, 14)) AS i),
ring AS (SELECT i AS src, i + 1 AS dst FROM v WHERE i < 14
         UNION ALL SELECT 0, 14),
offs(j, p, o) AS (VALUES (0,0,3),(0,1,5),(0,2,7),
                         (1,0,4),(1,1,6),(1,2,8),
                         (2,0,5),(2,1,7),(2,2,9)),
chords AS (SELECT v.i AS src, v.i + offs.o AS dst
           FROM v JOIN offs ON offs.p = v.i % 3
           WHERE v.i + offs.o < 15)
SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM ring
UNION ALL
SELECT CAST(src AS BIGINT), CAST(dst AS BIGINT) FROM chords""",
        "kautz": """
WITH d AS (SELECT unnest(generate_series(0, 2)) AS x),
s AS (SELECT a.x AS d0, b.x AS d1, c.x AS d2
      FROM d a, d b, d c WHERE b.x != a.x AND c.x != b.x),
v AS (SELECT d0, d1, d2,
             ROW_NUMBER() OVER (ORDER BY d0, d1, d2) - 1 AS id
      FROM s)
SELECT CAST(u.id AS BIGINT) AS src, CAST(w.id AS BIGINT) AS dst
FROM v u JOIN v w ON w.d0 = u.d1 AND w.d1 = u.d2""",
        "running_mean": """
WITH e AS (SELECT CAST(ROUND(value * 1e6) AS BIGINT) AS v6,
                  ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS r
           FROM events),
w AS (SELECT r AS idx,
             SUM(v6) OVER (ORDER BY r
                           ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS s,
             COUNT(*) OVER (ORDER BY r
                            ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS c
      FROM e)
SELECT CAST(idx AS BIGINT) AS idx, CAST(s // 5 AS BIGINT) AS mean_e6
FROM w WHERE c = 5""",
        "tokenize_ids": """
WITH t AS (SELECT doc_id,
                  unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                    AS tok,
                  generate_subscripts(
                    regexp_extract_all(lower(text), '[a-z0-9]+'), 1)
                    AS pos
           FROM documents),
v AS (SELECT tok, DENSE_RANK() OVER (ORDER BY tok) - 1 AS tid
      FROM (SELECT DISTINCT tok FROM t))
SELECT t.doc_id, CAST(t.pos - 1 AS BIGINT) AS pos,
       CAST(v.tid AS BIGINT) AS token_id
FROM t JOIN v USING (tok)""",
        "cap_per_source": f"""
WITH k AS (SELECT doc_id, source,
                  md5(CAST(doc_id AS VARCHAR)) AS hh FROM documents),
r AS (SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY ({_md5_fold15('hh')}), doc_id)
               AS rn
      FROM k)
SELECT doc_id, source FROM r WHERE rn <= 10""",
        "power_law_fit": """
WITH edges AS (SELECT DISTINCT (o_orderkey % 512) AS src,
                      ((o_custkey * 7) % 512) AS dst
               FROM orders
               WHERE (o_orderkey % 512) != ((o_custkey * 7) % 512)),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src),
hist AS (SELECT d AS v, CAST(COUNT(*) AS BIGINT) AS c FROM deg
         WHERE d > 0 GROUP BY d),
suff AS (SELECT h1.v AS xm, SUM(h2.c) AS n,
                SUM(h2.c * LN(h2.v)) AS slog
         FROM hist h1 JOIN hist h2 ON h2.v >= h1.v GROUP BY h1.v),
cand AS (SELECT xm, n,
                1.0 + n / (slog - n * LN(xm - 0.5)) AS alpha
         FROM suff
         WHERE n >= 2 AND (slog - n * LN(xm - 0.5)) > 0),
tail AS (SELECT ca.xm, ca.alpha, ca.n, h.v, h.c,
                SUM(h.c) OVER (PARTITION BY ca.xm ORDER BY h.v)
                  AS cum_le
         FROM cand ca JOIN hist h ON h.v >= ca.xm),
dev AS (SELECT xm, alpha, n,
               GREATEST(ABS(cum_le / n - fit),
                        ABS((cum_le - c) / n - fit)) AS dv
        FROM (SELECT xm, alpha, n, v, c, cum_le,
                     1.0 - POWER(v / (xm - 0.5), 1.0 - alpha) AS fit
              FROM tail)),
ks AS (SELECT xm, alpha, CAST(n AS BIGINT) AS n_tail,
              CAST(ROUND(MAX(dv) * 1e9) AS BIGINT) AS ks_e9
       FROM dev GROUP BY xm, alpha, n)
SELECT CAST(xm AS BIGINT) AS xmin,
       CAST(ROUND(alpha * 1e6) AS BIGINT) AS alpha_e6, ks_e9, n_tail
FROM ks ORDER BY ks_e9, xm LIMIT 1""",
        "negative_sample": f"""
WITH p AS (SELECT DISTINCT user_id AS uid, event_id % 199 AS item
           FROM events),
t AS (SELECT p.uid, p.item, u.j
      FROM p, LATERAL unnest(generate_series(0, 3)) u(j)),
h AS (SELECT uid, item, j,
             md5('17:' || CAST(uid AS VARCHAR) || ':'
                 || CAST(item AS VARCHAR) || ':'
                 || CAST(j AS VARCHAR)) AS hh
      FROM t)
SELECT CAST(uid AS BIGINT) AS uid, CAST(item AS BIGINT) AS item,
       CAST(j AS BIGINT) AS j,
       CAST(({_md5_fold15('hh')}) % 199 AS BIGINT) AS neg_item
FROM h""",
        "embedding_covariance": """
WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
idx AS (SELECT unnest(generate_series(1, 64)) AS i)
SELECT i.i - 1 AS i, j.i - 1 AS j,
       CAST(ROUND(COVAR_SAMP(e.v[i.i], e.v[j.i]) * 1e6) AS BIGINT)
         AS cov_e6
FROM e, idx i, idx j WHERE i.i <= j.i GROUP BY 1, 2""",
        "knn": f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings ORDER BY vec_id LIMIT {KNN_QUERIES}),
s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS score
      FROM q CROSS JOIN embeddings e),
r AS (SELECT query_id, neighbor_id, score,
        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rn
      FROM s)
SELECT query_id, neighbor_id, CAST(ROUND(score * 1e6) AS BIGINT) AS score_e6
FROM r WHERE rn <= {KNN_K}""",
        "k_truss": _sql_k_truss(),
        "edge_clustering": f"""
WITH und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM ({derive.SQL_EDGES_SPARSE})),
sym AS MATERIALIZED (SELECT lo AS a, hi AS b FROM und
                     UNION ALL SELECT hi, lo FROM und),
deg AS (SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY a),
cn AS (SELECT u.lo, u.hi, CAST(COUNT(*) AS BIGINT) AS tri
       FROM und u JOIN sym s1 ON s1.a = u.lo JOIN sym s2 ON s2.a = u.hi
       WHERE s1.b = s2.b GROUP BY u.lo, u.hi)
SELECT u.lo, u.hi, COALESCE(cn.tri, 0) AS tri,
       CAST(LEAST(d1.d, d2.d) - 1 AS BIGINT) AS denom
FROM und u JOIN deg d1 ON d1.v = u.lo JOIN deg d2 ON d2.v = u.hi
LEFT JOIN cn ON cn.lo = u.lo AND cn.hi = u.hi""",
        "centralization_degree": f"""
WITH edges AS MATERIALIZED ({SQL_EDGES_A}), verts AS ({SQL_VERTS_A}),
od AS (SELECT v.v, CAST(COUNT(e.src) AS BIGINT) AS deg
       FROM verts v LEFT JOIN edges e ON e.src = v.v GROUP BY v.v)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(deg) AS BIGINT) AS max_deg,
       CAST(COUNT(*) * MAX(deg) - SUM(deg) AS BIGINT) AS sum_diff
FROM od""",
        "global_efficiency": f"""
{_sql_allpairs_body()}
, hist AS (SELECT d, COUNT(*) AS c FROM p{_SSSP_ITERS} WHERE s != t GROUP BY d),
nn AS (SELECT COUNT(*) AS n FROM verts)
SELECT CAST(nn.n * (nn.n - 1) AS BIGINT) AS ordered_pairs,
       CAST((SELECT COALESCE(SUM(c * (1000000000000 // d)), 0) FROM hist)
            AS BIGINT) AS eff_num
FROM nn""",
        "dedup_clusters": """
WITH RECURSIVE
e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
p AS MATERIALIZED (
  SELECT a.vec_id AS u, b.vec_id AS w FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= 0.35),
sym AS MATERIALIZED (SELECT u, w FROM p UNION SELECT w, u FROM p),
verts AS (SELECT DISTINCT u AS v FROM sym),
reach(v, w) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.v, s.w FROM reach r JOIN sym s ON s.u = r.w),
lab AS (SELECT v AS member_id, MIN(w) AS keep_id FROM reach GROUP BY v)
SELECT member_id, keep_id,
       CAST(COUNT(*) OVER (PARTITION BY keep_id) AS BIGINT) AS cluster_size
FROM lab""",
        "word_stats": """
WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
           FROM documents),
f AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY doc_id, tok),
agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
               CAST(MAX(c) AS BIGINT) AS top_tf
        FROM f GROUP BY doc_id)
SELECT d.doc_id,
  COALESCE(a.n_words, 0) AS n_words,
  COALESCE(a.top_tf, 0) AS top_tf,
  CAST(CASE WHEN COALESCE(a.n_words, 0) = 0 THEN 0
       ELSE (a.top_tf * 1000000) // a.n_words END AS BIGINT) AS rep_ratio_e6
FROM documents d LEFT JOIN agg a USING (doc_id)""",
        "rand_pairs": f"""
WITH p1 AS MATERIALIZED (SELECT vertex, community AS l1 FROM ({{_SJ_LPA}}) t1),
p2 AS MATERIALIZED (SELECT vertex, label AS l2 FROM ({{_SJ_CC}}) t2),
joint AS (SELECT l1, l2, COUNT(*) AS c FROM p1 JOIN p2 USING (vertex)
          GROUP BY l1, l2),
nn AS (SELECT SUM(c) AS n FROM joint),
nij AS (SELECT SUM(c * (c - 1) // 2) AS s FROM joint),
ai AS (SELECT SUM(s * (s - 1) // 2) AS s FROM
       (SELECT l1, SUM(c) AS s FROM joint GROUP BY l1)),
bj AS (SELECT SUM(s * (s - 1) // 2) AS s FROM
       (SELECT l2, SUM(c) AS s FROM joint GROUP BY l2))
SELECT CAST(nn.n AS BIGINT) AS n,
       CAST(nn.n * (nn.n - 1) // 2 AS BIGINT) AS pairs,
       CAST(nij.s AS BIGINT) AS sum_nij2,
       CAST(ai.s AS BIGINT) AS sum_a2,
       CAST(bj.s AS BIGINT) AS sum_b2
FROM nn, nij, ai, bj""".replace("{_SJ_LPA}", _sql_lpa()).replace(
            "{_SJ_CC}", _sql_components()),
        "split_join": f"""
WITH p1 AS MATERIALIZED (SELECT vertex, community AS l1 FROM ({{_SJ_LPA}}) t1),
p2 AS MATERIALIZED (SELECT vertex, label AS l2 FROM ({{_SJ_CC}}) t2),
joint AS (SELECT l1, l2, COUNT(*) AS c FROM p1 JOIN p2 USING (vertex)
          GROUP BY l1, l2),
m1 AS (SELECT SUM(mx) AS s FROM (SELECT l1, MAX(c) AS mx FROM joint GROUP BY l1)),
m2 AS (SELECT SUM(mx) AS s FROM (SELECT l2, MAX(c) AS mx FROM joint GROUP BY l2)),
nn AS (SELECT SUM(c) AS n FROM joint)
SELECT CAST(nn.n AS BIGINT) AS n,
       CAST(nn.n - m1.s AS BIGINT) AS dist12,
       CAST(nn.n - m2.s AS BIGINT) AS dist21,
       CAST(2 * nn.n - m1.s - m2.s AS BIGINT) AS split_join
FROM nn, m1, m2""".replace("{_SJ_LPA}", _sql_lpa()).replace(
            "{_SJ_CC}", _sql_components()),
        "mis": _sql_mis(),
        "matching": _sql_matching(),
        "louvain_sweeps": _sql_louvain_sweeps(),
        "louvain": _sql_louvain_pinned(
            f"SELECT src, dst, 1 AS weight FROM ({SQL_EDGES_A})",
            level_sweeps=(2, 1)),
        "leiden": _sql_leiden_pinned(
            f"SELECT src, dst, 1 AS weight FROM ({SQL_EDGES_A})"),
        "spinglass": _sql_louvain_pinned(
            f"SELECT src, dst, 1 AS weight FROM ({SQL_EDGES_A})",
            level_sweeps=(2,), num=3, den=2),
        "scg_groups": _sql_scg_groups(),
        "graphlets": _sql_graphlets(),
        "barabasi": _sql_barabasi(),
        "callaway": _sql_callaway(),
        "hrg_game": _sql_hrg_game(),
        "sbm": _sql_sbm(),
        "laplacian": SQL_LAPLACIAN,
        "dominators": SQL_DOMINATORS,
        "simple_paths": SQL_SIMPLE_PATHS,
        "separators": SQL_SEPARATORS,
        "union_projection": SQL_UNION_PROJECTION,
        "frequent_subgraphs": SQL_FREQUENT_SUBGRAPHS,
        "sigma_counts": _sql_sigma(),
        "bfs_order": _sql_bfs_order(),
        "independent_sets": _sql_independent_sets(),
        "dup_ngrams": """
WITH t AS (SELECT doc_id,
                  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok,
                  generate_subscripts(
                      regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
           FROM documents),
g AS (SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS ng
      FROM t a JOIN t b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
               JOIN t c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
s AS (SELECT doc_id, COUNT(*) AS total, COUNT(DISTINCT ng) AS uniq
      FROM g GROUP BY doc_id)
SELECT d.doc_id, CAST(COALESCE(s.total, 0) AS BIGINT) AS n_ngrams,
       CAST(CASE WHEN COALESCE(s.total, 0) > 0
            THEN (s.total - s.uniq) * 1000000 // s.total
            ELSE 0 END AS BIGINT) AS dup_e6
FROM documents d LEFT JOIN s USING (doc_id) ORDER BY doc_id""",
        "largest_independent_sets": (
            "SELECT * FROM (" + _sql_independent_sets() + ") "
            "WHERE size = (SELECT MAX(size) FROM ("
            + _sql_independent_sets() + ")) ORDER BY mask"),
        "largest_cliques": _SQL_LARGEST_CLIQUES,
        "optimal_imitation": _sql_optimal_imitation(),
        "roulette_imitation": _sql_roulette_imitation(),
        "moran_step": _sql_moran_step(),
        "automorphisms": _sql_automorphisms(),
        "lcf": _sql_lcf(),
        "graphical": _sql_graphical(),
        "all_st_cuts": _sql_all_st_cuts(),
        "all_st_mincuts": _sql_all_st_mincuts(),
        "cited_type": _sql_cited_type(),
        "sssp_negative": _sql_sssp_negative(),
        "unfold_tree": _sql_unfold_tree(),
        "convergence_degree": _sql_convergence_degree(),
        "rewire_edges": _sql_rewire_edges(),
        "bipartite_gnp": _sql_bipartite_gnp(),
        "bipartite_gnm": _sql_bipartite_gnm(),
        "full_bipartite": _SQL_FULL_BIPARTITE,
        "convex_hull": _sql_convex_hull(),
        "centralization": _sql_centralization(),
        "subcomponent": _sql_subcomponent(),
        "closeness_weighted": _sql_closeness_weighted(),
        "betweenness_weighted": _sql_betweenness_weighted(),
        "edge_betweenness_weighted": _sql_edge_betweenness_weighted(),
        "sssp_weighted_tree": _sql_sssp_weighted_tree(),
        "path_length_hist_weighted": _sql_path_length_hist_weighted(),
        "diameter_weighted": _sql_diameter_weighted(),
        "eccentricity_weighted": _sql_eccentricity_weighted(),
        "famous": _sql_famous(),
        "laplacian_norm": SQL_LAPLACIAN_NORM,
        "dot_product": _sql_dot_product(),
        "hsbm": _sql_hsbm(),
        "hsbm_list": _sql_hsbm_list(),
        "get_isomorphisms": _sql_get_isomorphisms(),
        "canonical_form": ("SELECT CAST(1 AS BIGINT) AS forms_equal, "
                           "CAST(5 AS BIGINT) AS n_edges"),
        "automorphism_group": _sql_automorphism_group(),
        "eigen_symmetric": _SQL_EIGEN_SYMMETRIC,
        "stochastic_imitation": _sql_stochastic_imitation(),
        "assortativity_values": _sql_assortativity_values(),
        "similarity_edges": _sql_similarity_edges(),
        "eigen_laplacian": _SQL_EIGEN_LAPLACIAN,
        "cliques_range": _sql_cliques_range(),
        "lm_surprisal": _sql_lm_surprisal(),
        "establishment": _sql_establishment(),
        "subiso_path4": _sql_subiso_path4(),
        "isomorphic_check": (
            f"SELECT 1 AS iso, COUNT(*) AS n_edges FROM "
            f"({derive.SQL_EDGES_SPARSE}) t"
        ),
        "subiso_cycle4": _sql_subiso_cycle4(),
        "subiso_tree5": _sql_subiso_pattern(SUBISO_TREE5),
        "subiso_tree8": _sql_subiso_pattern(
            SUBISO_TREE8, edges_sql=derive.SQL_EDGES_VSPARSE),
        "subiso_house": _sql_subiso_pattern(SUBISO_HOUSE),
        "recent_degree": _sql_recent_degree(),
        "lastcit": _sql_lastcit(),
        "barabasi_aging": _sql_barabasi_aging(),
        "apsp_johnson": _sql_apsp_johnson(),
        "layout_rt": _sql_layout_rt(),
        "motif3_instances": _sql_motif3_instances(),
        "motif4_instances": _sql_motif4_instances(),
        "graphdb_edges": SQL_EDGES_A,
        "recent_degree_aging": _sql_recent_degree_aging(),
        "subiso_prism": _sql_subiso_pattern(SUBISO_PRISM),
        "global_mincut": (
            f"WITH und AS ({SQL_DENSE24_UND}), "
            "degs AS (SELECT v, COUNT(*) AS d FROM ("
            "SELECT lo AS v FROM und UNION ALL SELECT hi AS v FROM und) "
            "GROUP BY v) "
            "SELECT CAST(MIN(d) AS BIGINT) AS mincut FROM degs"),
        "sir": _sql_sir(),
        "layout_circle": (
            f"SELECT range AS vertex, "
            f"CAST(ROUND(cos(2 * pi() * range / {derive.V}) * 1000000) "
            f"AS BIGINT) AS x_e6, "
            f"CAST(ROUND(sin(2 * pi() * range / {derive.V}) * 1000000) "
            f"AS BIGINT) AS y_e6 FROM range({derive.V})"),
        "layout_grid": (
            f"SELECT range AS vertex, "
            f"CAST(range % CAST(CEIL(SQRT({derive.V})) AS BIGINT) "
            f"AS BIGINT) AS gx, "
            f"CAST(range // CAST(CEIL(SQRT({derive.V})) AS BIGINT) "
            f"AS BIGINT) AS gy FROM range({derive.V})"),
        "gomory_hu": (
            "WITH und AS (SELECT DISTINCT "
            "LEAST(o_orderkey % 36, (o_custkey * 7) % 36) AS lo, "
            "GREATEST(o_orderkey % 36, (o_custkey * 7) % 36) AS hi "
            "FROM orders "
            "WHERE (o_orderkey % 36) != ((o_custkey * 7) % 36) "
            "AND ((LEAST(o_orderkey % 36, (o_custkey * 7) % 36) * "
            "LEAST(o_orderkey % 36, (o_custkey * 7) % 36) + "
            "3 * GREATEST(o_orderkey % 36, (o_custkey * 7) % 36) * "
            "GREATEST(o_orderkey % 36, (o_custkey * 7) % 36)) % 5) < 4), "
            "degs AS (SELECT v, COUNT(*) AS d FROM ("
            "SELECT lo AS v FROM und UNION ALL SELECT hi AS v FROM und) "
            "GROUP BY v) "
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY d, v) AS BIGINT) "
            "AS rank, CAST(d AS BIGINT) AS flow FROM degs "
            "ORDER BY d, v LIMIT 35"),
        "max_matching_size": (
            "WITH lc AS (SELECT o_orderkey % 40 AS g, "
            "COUNT(DISTINCT o_custkey % 12) AS nl FROM orders GROUP BY 1), "
            "rc AS (SELECT o_orderkey % 40 AS g, "
            "COUNT(DISTINCT o_orderkey % 9) AS nr FROM orders GROUP BY 1) "
            "SELECT CAST(SUM(LEAST(nl, nr)) AS BIGINT) AS match_size "
            "FROM lc JOIN rc USING (g)"),
        "is_bipartite": f"""
WITH RECURSIVE edges AS MATERIALIZED ({derive.SQL_EDGES_VSPARSE}),
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi FROM edges),
sym AS (SELECT lo AS u, hi AS w FROM und UNION ALL SELECT hi, lo FROM und),
verts AS (SELECT DISTINCT u AS v FROM sym),
reach(v, w) AS (SELECT v, v FROM verts
                UNION SELECT r.v, s.w FROM reach r JOIN sym s ON s.u = r.w),
lab AS (SELECT v, MIN(w) AS l FROM reach GROUP BY v),
nc AS (SELECT COUNT(DISTINCT l) AS c FROM lab),
dce AS (SELECT 2 * lo AS a, 2 * hi + 1 AS b FROM und
        UNION ALL SELECT 2 * lo + 1, 2 * hi FROM und),
sym2 AS (SELECT a AS u, b AS w FROM dce UNION ALL SELECT b, a FROM dce),
verts2 AS (SELECT DISTINCT u AS v FROM sym2),
reach2(v, w) AS (SELECT v, v FROM verts2
                 UNION SELECT r.v, s.w FROM reach2 r JOIN sym2 s ON s.u = r.w),
lab2 AS (SELECT v, MIN(w) AS l FROM reach2 GROUP BY v),
nd AS (SELECT COUNT(DISTINCT l) AS c FROM lab2)
SELECT CAST(nc.c AS BIGINT) AS nc, CAST(nd.c AS BIGINT) AS nc_double,
       CAST(CASE WHEN nd.c = 2 * nc.c THEN 1 ELSE 0 END AS BIGINT)
       AS bipartite
FROM nc, nd""",
        "bipartite_components": f"""
WITH RECURSIVE edges AS MATERIALIZED ({derive.SQL_EDGES_VSPARSE}),
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi FROM edges),
sym AS (SELECT lo AS u, hi AS w FROM und UNION ALL SELECT hi, lo FROM und),
verts AS (SELECT DISTINCT u AS v FROM sym),
reach(v, w) AS (SELECT v, v FROM verts
                UNION SELECT r.v, s.w FROM reach r JOIN sym s ON s.u = r.w),
lab AS (SELECT v, MIN(w) AS l FROM reach GROUP BY v),
dce AS (SELECT 2 * lo AS a, 2 * hi + 1 AS b FROM und
        UNION ALL SELECT 2 * lo + 1, 2 * hi FROM und),
sym2 AS (SELECT a AS u, b AS w FROM dce UNION ALL SELECT b, a FROM dce),
verts2 AS (SELECT DISTINCT u AS v FROM sym2),
reach2(v, w) AS (SELECT v, v FROM verts2
                 UNION SELECT r.v, s.w FROM reach2 r JOIN sym2 s ON s.u = r.w),
lab2 AS (SELECT v, MIN(w) AS l FROM reach2 GROUP BY v),
per_v AS (SELECT lab.v, lab.l AS component,
                 CASE WHEN l0.l = l1.l THEN 1 ELSE 0 END AS odd
          FROM lab JOIN lab2 l0 ON l0.v = 2 * lab.v
          JOIN lab2 l1 ON l1.v = 2 * lab.v + 1)
SELECT component, CAST(COUNT(*) AS BIGINT) AS csize,
       CAST(1 - MAX(odd) AS BIGINT) AS bipartite
FROM per_v GROUP BY component ORDER BY component""",
        "bipartite_projection": """
WITH inc AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE (l_orderkey * 11 + l_partkey) % 7 = 0)
SELECT i1.p AS a, i2.p AS b, CAST(COUNT(*) AS BIGINT) AS common
FROM inc i1 JOIN inc i2 ON i2.o = i1.o AND i2.p > i1.p
GROUP BY 1, 2""",
        "local_scan2": f"""
WITH und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM ({derive.SQL_EDGES_SPARSE})),
sym AS (SELECT lo AS v, hi AS u FROM und UNION ALL SELECT hi, lo FROM und),
m2 AS (SELECT DISTINCT v, u FROM (
  SELECT s1.v, s2.u FROM sym s1 JOIN sym s2 ON s2.v = s1.u
  UNION ALL SELECT v, u FROM sym
  UNION ALL SELECT v, v FROM sym)),
inside AS (SELECT m.v, COUNT(*) AS c
           FROM m2 m JOIN und e ON e.lo = m.u
           JOIN m2 m3 ON m3.v = m.v AND m3.u = e.hi
           GROUP BY m.v),
verts AS (SELECT DISTINCT v FROM sym)
SELECT verts.v AS vertex, CAST(COALESCE(inside.c, 0) AS BIGINT) AS scan2
FROM verts LEFT JOIN inside ON inside.v = verts.v""",
        "adjacency_triplets": f"""
SELECT src AS "row", dst AS col, CAST(COUNT(*) AS BIGINT) AS mult
FROM ({derive.SQL_EDGES_MULTI}) GROUP BY src, dst""",
        "bipartite_projection_size": """
WITH inc AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE (l_orderkey * 11 + l_partkey) % 7 = 0),
e1 AS (SELECT COUNT(*) AS c FROM (
  SELECT DISTINCT i1.o AS a, i2.o AS b
  FROM inc i1 JOIN inc i2 ON i2.p = i1.p AND i2.o > i1.o)),
e2 AS (SELECT COUNT(*) AS c FROM (
  SELECT DISTINCT i1.p AS a, i2.p AS b
  FROM inc i1 JOIN inc i2 ON i2.o = i1.o AND i2.p > i1.p))
SELECT CAST((SELECT COUNT(DISTINCT o) FROM inc) AS BIGINT) AS vcount1,
       CAST((SELECT c FROM e1) AS BIGINT) AS ecount1,
       CAST((SELECT COUNT(DISTINCT p) FROM inc) AS BIGINT) AS vcount2,
       CAST((SELECT c FROM e2) AS BIGINT) AS ecount2""",
        "get_incidence": """
WITH inc AS MATERIALIZED (
  SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE (l_orderkey * 11 + l_partkey) % 7 = 0),
r0 AS (SELECT o, DENSE_RANK() OVER (ORDER BY o) - 1 AS r
       FROM (SELECT DISTINCT o FROM inc)),
r1 AS (SELECT p, DENSE_RANK() OVER (ORDER BY p) - 1 AS c
       FROM (SELECT DISTINCT p FROM inc)),
cells AS (SELECT o, p, COUNT(*) AS mult FROM inc GROUP BY o, p)
SELECT CAST(r0.r AS BIGINT) AS "row", CAST(r1.c AS BIGINT) AS col,
       CAST(cells.mult AS BIGINT) AS mult
FROM cells JOIN r0 USING (o) JOIN r1 USING (p)""",
        "create_bipartite": """
SELECT DISTINCT CAST(l_orderkey * 2 AS BIGINT) AS src,
       CAST(l_partkey * 2 + 1 AS BIGINT) AS dst
FROM lineitem WHERE (l_orderkey * 11 + l_partkey) % 7 = 0""",
        "scan0": f"""
WITH multi AS MATERIALIZED ({derive.SQL_EDGES_MULTI}),
verts AS (SELECT src AS v FROM multi UNION SELECT dst FROM multi),
d AS (SELECT src, COUNT(*) AS c FROM multi GROUP BY src)
SELECT verts.v AS vertex, CAST(COALESCE(d.c, 0) AS DOUBLE) AS scan0
FROM verts LEFT JOIN d ON d.src = verts.v""",
        "scan2_them": f"""
WITH usd AS MATERIALIZED ({SQL_EDGES_A}),
und AS (SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
        FROM usd),
sym AS (SELECT lo AS v, hi AS u FROM und UNION ALL SELECT hi, lo FROM und),
m2 AS (SELECT DISTINCT v, u FROM (
  SELECT s1.v, s2.u FROM sym s1 JOIN sym s2 ON s2.v = s1.u
  UNION ALL SELECT v, u FROM sym
  UNION ALL SELECT v, v FROM sym)),
themd AS MATERIALIZED ({derive.SQL_EDGES_B}),
them AS (SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
         FROM themd),
inside AS (SELECT m.v, COUNT(*) AS c
           FROM m2 m JOIN them e ON e.lo = m.u
           JOIN m2 m3 ON m3.v = m.v AND m3.u = e.hi
           GROUP BY m.v),
verts AS ({SQL_VERTS_A})
SELECT verts.v AS vertex, CAST(COALESCE(inside.c, 0) AS BIGINT) AS scan2t
FROM verts LEFT JOIN inside ON inside.v = verts.v""",
        "scan_nbhd_ecount": f"""
WITH us AS MATERIALIZED ({SQL_EDGES_A}),
them AS MATERIALIZED ({derive.SQL_EDGES_B}),
verts AS (SELECT src AS v FROM us UNION SELECT dst FROM us
          UNION SELECT src FROM them UNION SELECT dst FROM them),
nb AS (SELECT src AS seed, dst AS u FROM us),
marked AS (SELECT seed, u FROM nb UNION SELECT v, v FROM verts),
inside AS (SELECT nb.seed, COUNT(*) AS c
           FROM nb JOIN them t ON t.src = nb.u
           JOIN marked m ON m.seed = nb.seed AND m.u = t.dst
           GROUP BY nb.seed)
SELECT verts.v AS vertex, CAST(COALESCE(inside.c, 0) AS BIGINT) AS scan_nb
FROM verts LEFT JOIN inside ON inside.seed = verts.v""",
        "scan0_them": f"""
WITH us AS MATERIALIZED ({SQL_EDGES_A}),
them AS MATERIALIZED ({derive.SQL_EDGES_B}),
verts AS ({SQL_VERTS_A}),
inter AS (SELECT us.src, us.dst FROM us JOIN them USING (src, dst)),
d AS (SELECT src, COUNT(*) AS c FROM inter GROUP BY src)
SELECT verts.v AS vertex, CAST(COALESCE(d.c, 0) AS BIGINT) AS scan0t
FROM verts LEFT JOIN d ON d.src = verts.v""",
        "scan1_them": f"""
WITH us AS MATERIALIZED ({SQL_EDGES_A}),
them AS MATERIALIZED ({derive.SQL_EDGES_B}),
verts AS ({SQL_VERTS_A}),
member AS (SELECT src AS v, dst AS u FROM us
           UNION ALL SELECT v, v FROM verts),
inside AS (SELECT m.v, COUNT(*) AS c
           FROM member m JOIN them t ON t.src = m.u
           JOIN member m2 ON m2.v = m.v AND m2.u = t.dst
           GROUP BY m.v)
SELECT verts.v AS vertex, CAST(COALESCE(inside.c, 0) AS BIGINT) AS scan1t
FROM verts LEFT JOIN inside ON inside.v = verts.v""",
        "connect2": f"""
WITH und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM ({derive.SQL_EDGES_SPARSE})),
sym AS (SELECT lo AS src, hi AS dst FROM und UNION ALL SELECT hi, lo FROM und),
wedge AS (SELECT s1.dst AS a, s2.dst AS b
          FROM sym s1 JOIN sym s2 ON s2.src = s1.src AND s2.dst > s1.dst)
SELECT DISTINCT a, b FROM (
  SELECT a, b FROM wedge UNION ALL SELECT lo, hi FROM und)""",
        "gen_structures": """
SELECT 'star' AS fam, CAST(0 AS BIGINT) AS src, CAST(range AS BIGINT) AS dst
FROM range(1, 501)
UNION ALL
SELECT 'ring', CAST(range AS BIGINT), CAST((range + 1) % 500 AS BIGINT)
FROM range(0, 500)
UNION ALL
SELECT 'tree', CAST((range - 1) // 3 AS BIGINT), CAST(range AS BIGINT)
FROM range(1, 500)
UNION ALL
SELECT 'full', CAST(a.range AS BIGINT), CAST(b.range AS BIGINT)
FROM range(0, 40) a, range(0, 40) b WHERE a.range != b.range
UNION ALL
SELECT 'debruijn', CAST(v.range AS BIGINT),
       CAST((v.range * 3 + j.range) % 243 AS BIGINT)
FROM range(0, 243) v, range(0, 3) j
UNION ALL
SELECT 'lattice', CAST(v.range AS BIGINT),
       CAST(CASE WHEN v.range % 25 < 24 THEN v.range + 1
                 ELSE v.range - 24 END AS BIGINT)
FROM range(0, 500) v
UNION ALL
SELECT 'lattice', CAST(v.range AS BIGINT),
       CAST(CASE WHEN v.range // 25 < 19 THEN v.range + 25
                 ELSE v.range - 475 END AS BIGINT)
FROM range(0, 500) v""",
        "linegraph": f"""
WITH e AS MATERIALIZED (
  SELECT src, dst, ROW_NUMBER() OVER (ORDER BY src, dst) - 1 AS eid
  FROM ({derive.SQL_EDGES_SPARSE}))
SELECT a.eid AS src, b.eid AS dst FROM e a JOIN e b ON b.src = a.dst""",
        "stochastic_edges": f"""
WITH e AS MATERIALIZED ({derive.SQL_EDGES_A_W}),
s AS (SELECT src, CAST(SUM(weight) AS BIGINT) AS s_out FROM e GROUP BY src)
SELECT e.src, e.dst, CAST(e.weight AS BIGINT) AS w, s.s_out
FROM e JOIN s USING (src)""",
        "token_cms": """
WITH t AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
           FROM documents),
dd AS (SELECT range AS d FROM range(0, 4)),
s AS (SELECT dd.d,
             ((strpos('0123456789abcdef', substr(md5(CAST(dd.d AS VARCHAR) || ':' || t.tok), 7, 1)) - 1) * 16
              + strpos('0123456789abcdef', substr(md5(CAST(dd.d AS VARCHAR) || ':' || t.tok), 8, 1)) - 1) % 64 AS slot
      FROM t CROSS JOIN dd)
SELECT d, slot, CAST(COUNT(*) AS BIGINT) AS cnt
FROM s GROUP BY d, slot ORDER BY d, slot""",
        "vocab_sketch": """
WITH t AS (SELECT DISTINCT lang AS g,
                  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
           FROM documents),
hh AS (SELECT g, tok, md5(tok) AS h FROM t),
ru AS (SELECT g,
              (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) % 8 AS b,
              CASE WHEN x = 0 THEN 17 WHEN x >= 32768 THEN 1 WHEN x >= 16384 THEN 2 WHEN x >= 8192 THEN 3 WHEN x >= 4096 THEN 4 WHEN x >= 2048 THEN 5 WHEN x >= 1024 THEN 6 WHEN x >= 512 THEN 7 WHEN x >= 256 THEN 8 WHEN x >= 128 THEN 9 WHEN x >= 64 THEN 10 WHEN x >= 32 THEN 11 WHEN x >= 16 THEN 12 WHEN x >= 8 THEN 13 WHEN x >= 4 THEN 14 WHEN x >= 2 THEN 15 WHEN x >= 1 THEN 16 END AS rho
       FROM (SELECT g, h, (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 256 + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 1 AS x FROM hh))
SELECT g AS "group", CAST(MAX(CASE WHEN b = 0 THEN rho ELSE 0 END) AS BIGINT) AS r0, CAST(MAX(CASE WHEN b = 1 THEN rho ELSE 0 END) AS BIGINT) AS r1, CAST(MAX(CASE WHEN b = 2 THEN rho ELSE 0 END) AS BIGINT) AS r2, CAST(MAX(CASE WHEN b = 3 THEN rho ELSE 0 END) AS BIGINT) AS r3, CAST(MAX(CASE WHEN b = 4 THEN rho ELSE 0 END) AS BIGINT) AS r4, CAST(MAX(CASE WHEN b = 5 THEN rho ELSE 0 END) AS BIGINT) AS r5, CAST(MAX(CASE WHEN b = 6 THEN rho ELSE 0 END) AS BIGINT) AS r6, CAST(MAX(CASE WHEN b = 7 THEN rho ELSE 0 END) AS BIGINT) AS r7
FROM ru GROUP BY g ORDER BY g""",
        "curate": _CURATE_ORACLE,
        "prepare_corpus": _PREPARE_CORPUS_ORACLE,
        "quality_filter": r"""
WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
           FROM documents),
f AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY doc_id, tok),
agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
               CAST(MAX(c) AS BIGINT) AS top_tf
        FROM f GROUP BY doc_id),
ch AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
              CAST(length(text)
                   - length(regexp_replace(text, '[^\sA-Za-z0-9]', '', 'g'))
                   AS BIGINT) AS n_punct
       FROM documents),
sig AS (SELECT d.doc_id,
               COALESCE(a.n_words, 0) AS n_words,
               CASE WHEN COALESCE(a.n_words, 0) = 0 THEN 0
                    ELSE (a.top_tf * 1000000) // a.n_words END AS rep_ratio_e6,
               CASE WHEN ch.n_chars = 0 THEN 0
                    ELSE (ch.n_punct * 1000000) // ch.n_chars END
                    AS punct_ratio_e6
        FROM documents d LEFT JOIN agg a USING (doc_id)
        JOIN ch USING (doc_id))
SELECT doc_id, n_words,
       CAST(rep_ratio_e6 AS BIGINT) AS rep_ratio_e6,
       CAST(punct_ratio_e6 AS BIGINT) AS punct_ratio_e6,
       CAST(CASE WHEN n_words < 10 THEN 1 ELSE 0 END
            + CASE WHEN n_words > 100000 THEN 2 ELSE 0 END
            + CASE WHEN rep_ratio_e6 > 200000 THEN 4 ELSE 0 END
            + CASE WHEN punct_ratio_e6 > 300000 THEN 8 ELSE 0 END
            AS BIGINT) AS reasons,
       CAST(CASE WHEN n_words >= 10 AND n_words <= 100000
                  AND rep_ratio_e6 <= 200000 AND punct_ratio_e6 <= 300000
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM sig""",
        "ngram_contamination": """
WITH t AS (SELECT doc_id,
                  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok,
                  generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
           FROM documents),
sh AS (SELECT doc_id,
              tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
                  || ' ' || lead(tok, 3) OVER w || ' ' || lead(tok, 4) OVER w AS s,
              lead(tok, 4) OVER w IS NOT NULL AS valid
       FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
bench AS (SELECT DISTINCT s FROM sh WHERE valid AND doc_id % 10 = 0),
cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS total,
               CAST(SUM(CASE WHEN s IN (SELECT s FROM bench)
                        THEN 1 ELSE 0 END) AS BIGINT) AS cont
        FROM sh WHERE valid GROUP BY doc_id)
SELECT d.doc_id, COALESCE(cnt.cont, 0) AS contaminated,
       COALESCE(cnt.total, 0) AS total_ngrams
FROM documents d LEFT JOIN cnt USING (doc_id) ORDER BY doc_id""",
        "top_terms": """
WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
           FROM documents),
f AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY doc_id, tok),
d AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM f GROUP BY tok),
r AS (SELECT f.doc_id, f.tok AS term, CAST(f.c AS BIGINT) AS tf, d.df,
        ROW_NUMBER() OVER (PARTITION BY f.doc_id
                           ORDER BY f.c DESC, d.df ASC, f.tok ASC) AS rn
      FROM f JOIN d USING (tok))
SELECT doc_id, term, tf, df FROM r WHERE rn <= 3""",
        "stratified_sample": f"""
SELECT doc_id, lang FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
  CASE lang
    WHEN 'en' THEN '{(SAMPLE_RATES["en"] << 32) // 1000:08x}'
    WHEN 'de' THEN '{(SAMPLE_RATES["de"] << 32) // 1000:08x}'
    ELSE '{(SAMPLE_DEFAULT << 32) // 1000:08x}'
  END""",
        "k_regular": _sql_k_regular(),
        "static_fitness": _sql_static_fitness(),
        "asymmetric_preference": _sql_asymmetric_preference(),
        "nonlinear_barabasi": _sql_nonlinear_barabasi(),
        "betweenness_cutoff": _sql_betweenness_cutoff(),
        "edge_betweenness_cutoff": _sql_edge_betweenness_cutoff(),
        "closeness_cutoff": _sql_closeness_cutoff(),
        "layout_random": _sql_layout_random(),
        "layout_grid3d": _sql_layout_grid3d(),
        "layout_sphere": _sql_layout_sphere(),
        "layout_rt_circular": _sql_layout_rt_circular(),
        "fsm_support": SQL_FSM_SUPPORT,
        "velist_edges": SQL_VELIST_EDGES_TMPL.format(edges=SQL_EDGES_A),
        "dynamic_snapshots": SQL_DYNAMIC_SNAPSHOTS_TMPL.format(
            edges=SQL_EDGES_A),
        "dynamic_proj_neighbors": SQL_DYNAMIC_PROJ_NEIGHBORS,
        "dynamic_proj_event": SQL_DYNAMIC_PROJ_EVENT,
        "avm": _sql_avm(),
        "even_tarjan": SQL_EVEN_TARJAN_TMPL.format(edges=SQL_EDGES_A,
                                                   v=derive.V),
        "residual_graph": SQL_RESIDUAL_TMPL.format(edges=SQL_EDGES_A),
        "reverse_residual": SQL_REVERSE_RESIDUAL_TMPL.format(
            edges=SQL_EDGES_A),
        "layout_bipartite": _sql_layout_bipartite(),
        "sphere_surface": _sql_sphere(volume=False),
        "sphere_volume": _sql_sphere(volume=True),
        "dirichlet": _sql_dirichlet(),
        "subiso_embeddings": _sql_subiso_embeddings(),
        "neighborhood_members": SQL_NEIGHBORHOOD_MEMBERS_TMPL.format(
            edges=derive.SQL_EDGES_VSPARSE, v=derive.V),
        "neighborhood_graphs": SQL_NEIGHBORHOOD_GRAPHS_TMPL.format(
            edges=derive.SQL_EDGES_VSPARSE, v=derive.V),
        "cliques_subset": _SQL_CLIQUE_CTE + """
SELECT len(members) AS size, COUNT(*) AS n_cliques
FROM maxcl
WHERE len(list_filter(members, x -> x % 19 = 0)) > 0
GROUP BY size ORDER BY size
""",
        "all_shortest_paths": _sql_all_shortest_paths(False),
        "all_shortest_paths_dijkstra": _sql_all_shortest_paths(True),
        "reindex_membership": SQL_REINDEX_MEMBERSHIP,
        "community_to_membership": SQL_COMMUNITY_TO_MEMBERSHIP,
        "le_community_to_membership": SQL_LE_COMMUNITY_TO_MEMBERSHIP,
        "colored_graph_edges": SQL_COLORED_GRAPH_TMPL.format(
            edges=SQL_EDGES_A),
        "union_projection_colored": SQL_UNION_PROJ_COLORED,
        "separate_pattern": SQL_SEPARATE_PATTERN,
        "velist_projection": SQL_VELIST_PROJECTION_TMPL.format(
            edges=SQL_EDGES_A),
    }
    # composed oracles reusing entries above
    d["motifs_no"] = (
        "SELECT CAST(3 AS BIGINT) AS size, CAST((SELECT SUM(count) "
        "FROM (" + d["motifs3"] + ")) AS BIGINT) AS total "
        "UNION ALL SELECT 4, CAST((SELECT path4 + star3 + cycle4 + paw "
        "+ diamond + k4 FROM ("
        + d["motifs4"] + ")) AS BIGINT) ORDER BY size")
    return d
