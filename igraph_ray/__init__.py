"""igraph_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch engine (NOT a port) with the query/data-processing
capabilities of the igraph C library reference (see SURVEY.md): power
iteration PageRank (damping 0.85), connected components via iterative
min-label propagation, synchronous label-propagation communities, and
per-vertex triangle counting — expressed as Ray Data pipelines over an
Arrow edge table, plus the relational / dedup / text / similarity
operators a large-scale training-data pipeline needs.

Design (see SURVEY.md §7):
- one ``ray.data.Dataset`` per logical table (edges, vertex state, corpus);
- per-superstep: ``map_batches`` gather-scatter over object-store-cached CSR
  blocks emitting pre-combined ``(dst, partial)`` messages, then a
  ``groupby('dst')`` aggregate shuffle, then a vectorized apply;
- stateful stages are actor pools / cached object-store blocks;
- wide steps (sort/groupby) use Ray Data's streaming shuffle.

Nothing in this package calls ``ray.init()``; the caller owns the session.
"""

from igraph_ray.graph import Graph
from igraph_ray.algorithms.pagerank import pagerank
from igraph_ray.algorithms.betweenness import betweenness
from igraph_ray.algorithms.centrality import eigenvector_centrality, hits
from igraph_ray.algorithms.paths import (
    closeness_centrality,
    eccentricity,
    harmonic_centrality,
)
from igraph_ray.algorithms.components import connected_components
from igraph_ray.algorithms.flow import (
    maxflow,
    mincut,
    st_edge_connectivity,
    st_vertex_connectivity,
)
from igraph_ray.algorithms.lpa import label_propagation
from igraph_ray.algorithms.scc import strongly_connected_components
from igraph_ray.algorithms.triangles import triangle_counts

__all__ = [
    "Graph",
    "pagerank",
    "eigenvector_centrality",
    "hits",
    "betweenness",
    "closeness_centrality",
    "harmonic_centrality",
    "eccentricity",
    "connected_components",
    "maxflow",
    "mincut",
    "st_edge_connectivity",
    "st_vertex_connectivity",
    "label_propagation",
    "strongly_connected_components",
    "triangle_counts",
]

__version__ = "0.1.0"
