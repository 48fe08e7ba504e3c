"""Independent vertex sets (cliques.c:303-440).

The reference computes independent-set functions by the complement
reduction — ``igraph_maximal_independent_vertex_sets`` is maximal-clique
enumeration "in the complementer graph" (its own docstring,
cliques.c:303) and ``igraph_independence_number`` is the complement's
clique number. This module applies the identical reduction on Ray Data:
one distributed complement pass (range-partitioned src axis,
ops/relational.complementer_edges) feeding the distributed
Bron–Kerbosch of algorithms/cliques.

The complement of a sparse graph is Θ(n²) edges, so these target
small-to-mid vertex counts — exactly the reference's practical envelope
for an exponential enumeration (and the clique stage's broadcast-plan
guard still applies).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.graph import Graph


def _complement_graph(graph: Graph, n: int, num_partitions: int = 8) -> Graph:
    from igraph_ray.ops.relational import complementer_edges, _dedup

    und = graph.canonical_undirected().materialize()

    def _sym(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(np.concatenate([lo, hi])),
                         "dst": pa.array(np.concatenate([hi, lo]))})

    sym = und.map_batches(_sym, batch_format="pyarrow", batch_size=None)
    comp = complementer_edges(_dedup(sym), n, loops=False,
                              num_partitions=num_partitions)
    return Graph(comp)


def maximal_independent_sets(
    graph: Graph,
    n: int,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """All maximal independent vertex sets
    (igraph_maximal_independent_vertex_sets, cliques.c:400) of the
    simple undirected view over vertices 0..n-1: one row per set,
    ``(set: list<int64> sorted asc, size: int64)`` — maximal cliques of
    the complement graph, the reference's own reduction."""
    from igraph_ray.algorithms.cliques import maximal_cliques

    comp = _complement_graph(graph, n)
    out = maximal_cliques(comp, num_partitions=num_partitions)
    return out.map_batches(
        lambda b: pa.table({"set": b["clique"], "size": b["size"]}),
        batch_format="pyarrow", batch_size=None)


def independence_number(graph: Graph, n: int) -> int:
    """igraph_independence_number (cliques.c:1106): the clique number of
    the complement."""
    from igraph_ray.algorithms.cliques import clique_number

    return clique_number(_complement_graph(graph, n))


def largest_cliques(
    graph: Graph,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """igraph_largest_cliques (cliques.c:1005): the maximal cliques of
    maximum size, ``(clique: list<int64>, size: int64)`` — one extra
    scalar max + filter over the distributed maximal-clique stream."""
    from igraph_ray.algorithms.cliques import maximal_cliques

    cl = maximal_cliques(graph, num_partitions=num_partitions).materialize()
    mx = cl.max("size")
    mx = int(mx if np.isscalar(mx) or isinstance(mx, (int, float))
             else mx["max(size)"])
    return cl.filter(expr=f"size == {mx}")


def largest_independent_vertex_sets(graph, n, num_partitions=None):
    """igraph_largest_independent_vertex_sets (cliques.c:1058): the
    maximal independent sets of maximum size — the enumeration stream
    filtered to its max ``size`` (two passes: a tiny max aggregate,
    then the filter)."""
    sets = maximal_independent_sets(graph, n,
                                    num_partitions=num_partitions
                                    ).materialize()
    mx = int(sets.max("size") or 0)
    return sets.filter(expr=f"size == {mx}")
