"""Relational operators over edge tables — the engine's equivalents of
igraph's predicates, set operations and structural transforms
(SURVEY.md §2.4, §2.9; operators.c, structural_properties.c).

Every function is a lazy Dataset transform (src:int64, dst:int64
[, weight]); wide steps use groupby with per-batch pre-dedup combiners.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.util import hash_join


def _dedup(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Exact distinct over (src, dst): per-batch pre-dedup combiner, then
    hash-partition groupby + per-group first (the canonical exact-dedup
    shape)."""

    def _local(b: pa.Table) -> pa.Table:
        return b.group_by(["src", "dst"]).aggregate([])

    return (
        edges.map_batches(_local, batch_format="pyarrow", batch_size=None)
        .groupby(["src", "dst"])
        .count()
        .select_columns(["src", "dst"])
    )


def simplify(edges: ray.data.Dataset, remove_loops: bool = True, remove_multiple: bool = True) -> ray.data.Dataset:
    """igraph_simplify (structural_properties.c:2248): drop loops and/or
    collapse multi-edges (directed interpretation: (a,b) and (b,a) stay
    distinct)."""
    out = edges.select_columns(["src", "dst"])
    if remove_loops:
        out = out.filter(expr="src != dst")
    if remove_multiple:
        out = _dedup(out)
    return out


def reverse(edges: ray.data.Dataset) -> ray.data.Dataset:
    def _flip(b: pa.Table) -> pa.Table:
        cols = {"src": b["dst"], "dst": b["src"]}
        if "weight" in b.column_names:
            cols["weight"] = b["weight"]
        return pa.table(cols)

    return edges.map_batches(_flip, batch_format="pyarrow", batch_size=None)


def to_undirected_collapse(edges: ray.data.Dataset) -> ray.data.Dataset:
    """igraph_to_undirected(mode=COLLAPSE) (conversion.c:413): canonical
    (lo,hi) per undirected edge, duplicates collapsed, loops preserved."""

    def _canon(b: pa.Table) -> pa.Table:
        return pa.table(
            {"src": pc.min_element_wise(b["src"], b["dst"]),
             "dst": pc.max_element_wise(b["src"], b["dst"])}
        )

    return _dedup(edges.map_batches(_canon, batch_format="pyarrow", batch_size=None))


def union_edges(a: ray.data.Dataset, b: ray.data.Dataset) -> ray.data.Dataset:
    """igraph_union (operators.c:676): edge present in either, once."""
    return _dedup(a.select_columns(["src", "dst"]).union(b.select_columns(["src", "dst"])))


def intersection_edges(a: ray.data.Dataset, b: ray.data.Dataset, num_partitions: int = 8) -> ray.data.Dataset:
    """igraph_intersection (operators.c:389): edges present in both."""
    return hash_join(_dedup(a), _dedup(b), on=("src", "dst"), num_partitions=num_partitions)


def difference_edges(a: ray.data.Dataset, b: ray.data.Dataset, num_partitions: int = 8) -> ray.data.Dataset:
    """igraph_difference (operators.c:898): edges of a not in b (anti join)."""
    da, db = _dedup(a), _dedup(b)

    def _mark(t: pa.Table) -> pa.Table:
        return t.append_column("_in_b", pa.array(np.ones(t.num_rows, dtype=np.int8)))

    marked = db.map_batches(_mark, batch_format="pyarrow", batch_size=None)
    j = hash_join(da, marked, on=("src", "dst"), num_partitions=num_partitions, join_type="left_outer")

    def _keep(t: pa.Table) -> pa.Table:
        mask = pc.is_null(t["_in_b"])
        return t.filter(mask).select(["src", "dst"])

    return j.map_batches(_keep, batch_format="pyarrow", batch_size=None)


def compose_edges(a: ray.data.Dataset, b: ray.data.Dataset, num_partitions: int = 8) -> ray.data.Dataset:
    """igraph_compose (operators.c:1114): relational composition — edge
    (x,z) iff (x,y) ∈ a and (y,z) ∈ b; join on the mid vertex."""

    def _ra(t: pa.Table) -> pa.Table:
        return pa.table({"x": t["src"], "mid": t["dst"]})

    def _rb(t: pa.Table) -> pa.Table:
        return pa.table({"mid": t["src"], "z": t["dst"]})

    j = hash_join(
        a.map_batches(_ra, batch_format="pyarrow", batch_size=None),
        b.map_batches(_rb, batch_format="pyarrow", batch_size=None),
        on="mid", num_partitions=num_partitions,
    )

    def _out(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["x"], "dst": t["z"]})

    return _dedup(j.map_batches(_out, batch_format="pyarrow", batch_size=None))


def count_loops(edges: ray.data.Dataset) -> int:
    """igraph_is_loop aggregate (structural_properties.c:3455)."""
    return edges.filter(expr="src == dst").count()


def count_multiple(edges: ray.data.Dataset) -> ray.data.Dataset:
    """igraph_count_multiple (structural_properties.c:3670): multiplicity
    per distinct (src,dst)."""
    g = edges.groupby(["src", "dst"]).count()

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["src"], "dst": b["dst"], "multiplicity": b["count()"]})

    return g.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def is_simple(edges: ray.data.Dataset) -> bool:
    """igraph_is_simple (structural_properties.c:3607)."""
    if count_loops(edges) > 0:
        return False
    total = edges.count()
    distinct = _dedup(edges).count()
    return total == distinct


def mutual_edges(edges: ray.data.Dataset, num_partitions: int = 8) -> ray.data.Dataset:
    """igraph_is_mutual (structural_properties.c:5657): edges whose reverse
    also exists (loops excluded)."""
    d = _dedup(edges.filter(expr="src != dst"))
    rev = reverse(d)
    return hash_join(d, rev, on=("src", "dst"), num_partitions=num_partitions)


def reciprocity(edges: ray.data.Dataset) -> float:
    """igraph_reciprocity(ignore_loops=True) (structural_properties.c:2375):
    fraction of non-loop distinct edges whose reverse exists."""
    d = _dedup(edges.filter(expr="src != dst")).materialize()
    total = d.count()
    if total == 0:
        return 0.0
    mutual = mutual_edges(d).count()
    return mutual / total


def density(edges: ray.data.Dataset, n: int, directed: bool = True, loops: bool = False) -> float:
    """igraph_density (structural_properties.c:2823)."""
    m = edges.count()
    if n == 0:
        return float("nan")
    if loops:
        denom = n * n if directed else n * (n + 1) / 2
    else:
        denom = n * (n - 1) if directed else n * (n - 1) / 2
    return m / denom


def induced_subgraph(
    edges: ray.data.Dataset, vertices: ray.data.Dataset, num_partitions: int = 8
) -> ray.data.Dataset:
    """igraph_induced_subgraph (structural_properties.c:2022): edges with
    both endpoints in the vertex set (ids preserved; compaction is a
    separate vocabulary step). Semi-join on each endpoint."""

    def _vs(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["vertex"]})

    def _vd(b: pa.Table) -> pa.Table:
        return pa.table({"dst": b["vertex"]})

    j = hash_join(edges, vertices.map_batches(_vs, batch_format="pyarrow", batch_size=None),
                  on="src", num_partitions=num_partitions)
    j = hash_join(j, vertices.map_batches(_vd, batch_format="pyarrow", batch_size=None),
                  on="dst", num_partitions=num_partitions)
    return j.select_columns(["src", "dst"])


def contract_vertices(
    edges: ray.data.Dataset, mapping: ray.data.Dataset, num_partitions: int = 8
) -> ray.data.Dataset:
    """igraph_contract_vertices (structural_properties.c:6286): project
    endpoints through (vertex → target) mapping; multi-edges kept (the
    reference does not simplify)."""

    def _ms(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["vertex"], "new_src": b["target"]})

    def _md(b: pa.Table) -> pa.Table:
        return pa.table({"dst": b["vertex"], "new_dst": b["target"]})

    j = hash_join(edges, mapping.map_batches(_ms, batch_format="pyarrow", batch_size=None),
                  on="src", num_partitions=num_partitions)
    j = hash_join(j, mapping.map_batches(_md, batch_format="pyarrow", batch_size=None),
                  on="dst", num_partitions=num_partitions)

    def _out(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["new_src"], "dst": b["new_dst"]})

    return j.map_batches(_out, batch_format="pyarrow", batch_size=None)


def top_k_by(ds: ray.data.Dataset, col: str, k: int, descending: bool = True) -> ray.data.Dataset:
    """Top-k helper (engine-side; the reference's analogue is
    sort_vertex_ids_by_degree, structural_properties.c:6223)."""
    return ds.sort(col, descending=descending).limit(k)
