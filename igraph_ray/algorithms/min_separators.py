"""Minimal vertex separators — the engine's counterpart of the
reference's separators.c enumeration surface:

* igraph_all_minimal_st_separators (separators.c:421) — every vertex
  set that is a minimal (s,t) separator for SOME pair, by the
  Berry–Bordat–Cogis generation scheme (Berry, Bordat & Cogis, "
  Generating All the Minimal Separators of a Graph", WG 1999):
  initialize with the component neighborhoods N(C) of G − N[v] for
  every vertex v, then close under the expansion step "for S found
  and x ∈ S, add the component neighborhoods of G − (S ∪ N(x))".
* igraph_minimum_size_separators (separators.c:643) — all separators
  of minimum size κ. The reference runs the Even–Kanevsky flow
  procedure; the engine uses the equivalence that every minimum-size
  separator is a minimal (s,t) separator for any s, t in two distinct
  components it leaves behind, so filtering the Berry enumeration to
  size κ yields exactly the same family (with the reference's own
  κ = 0 / κ = 1 / κ = n−1 special cases).

Distributed shape: the adjacency (CSR over the simple undirected
view) is put in the object store ONCE; each generation round maps the
whole frontier of (separator, x) expansion jobs in parallel batches
(map_batches over a jobs dataset, adjacency read from the broadcast),
and new separators are deduplicated by an md5 key of the sorted
member tuple — the driver holds only the key set and the (small)
frontier, never per-vertex state. Each job's component sweep is a
vectorized masked BFS on the shared CSR. The enumeration is
output-polynomial (O(n³) per separator, like the reference), so the
practical bound is the number of separators, not |V|."""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.graph import Graph


@ray.remote
def _build_csr(arrs):
    lo, hi, _w = arrs
    n = int(max(lo.max(initial=-1), hi.max(initial=-1))) + 1 \
        if len(lo) else 0
    src = np.concatenate([lo, hi]).astype(np.int64)
    dst = np.concatenate([hi, lo]).astype(np.int64)
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    indptr = np.searchsorted(src, np.arange(n + 1))
    return indptr, dst, n


def _csr_ref(graph: Graph) -> Tuple[object, int]:
    """Broadcast CSR of the simple undirected view — assembled
    task-side (fastgreedy.und_arrays_ref), edge data never lands on
    the driver; only n comes back."""
    from igraph_ray.algorithms.fastgreedy import (_aggregate_und,
                                                  und_arrays_ref)

    arrays = und_arrays_ref(_aggregate_und(graph).materialize())
    ref = _build_csr.remote(arrays)
    n = ray.get(_csr_n.remote(ref))
    return ref, n


@ray.remote
def _csr_n(csr) -> int:
    return int(csr[2])


def _components_neighborhoods(indptr, adj, n, leaveout_mask) -> List[Tuple[int, ...]]:
    """For each connected component C of G - leaveout, the sorted
    tuple N(C) ∩ leaveout (skipping empties)."""
    seen = leaveout_mask.copy()
    out = []
    for start in range(n):
        if seen[start]:
            continue
        comp = [start]
        seen[start] = True
        frontier = [start]
        sep = set()
        while frontier:
            nxt = []
            for u in frontier:
                for w in adj[indptr[u]:indptr[u + 1]]:
                    if leaveout_mask[w]:
                        sep.add(int(w))
                    elif not seen[w]:
                        seen[w] = True
                        nxt.append(int(w))
            frontier = nxt
        if sep:
            out.append(tuple(sorted(sep)))
    return out


def _expand_jobs(arrays, jobs: List[Tuple[Tuple[int, ...], int]]):
    """One batch of Berry expansion jobs: (basis, x) → candidate
    separators of G - (basis ∪ N(x)); x = -1 means the INIT job with
    basis = (v,) meaning leaveout = N[v]."""
    indptr, adj, n = arrays
    found = set()
    for basis, x in jobs:
        mask = np.zeros(n, dtype=bool)
        if x < 0:
            v = basis[0]
            mask[v] = True
            mask[adj[indptr[v]:indptr[v + 1]]] = True
        else:
            mask[list(basis)] = True
            mask[adj[indptr[x]:indptr[x + 1]]] = True
        for sep in _components_neighborhoods(indptr, adj, n, mask):
            found.add(sep)
    return found


@ray.remote
def _expand_task(arrays, jobs):
    return _expand_jobs(arrays, jobs)


def _key(sep: Tuple[int, ...]) -> str:
    return hashlib.md5(",".join(map(str, sep)).encode()).hexdigest()


def all_minimal_separators(
    graph: Graph,
    num_partitions: int = 8,
    max_vertices: int = 1 << 16,
) -> List[Tuple[int, ...]]:
    """Every minimal (s,t) separator of the simple undirected view,
    as sorted member tuples in discovery-closure order (sorted for
    determinism). separators.c:421."""
    arrays_ref, n = _csr_ref(graph)
    if n > max_vertices:
        raise NotImplementedError(
            f"all_minimal_separators is output-polynomial enumeration "
            f"guarded to {max_vertices} vertices ({n} present)")
    if n == 0:
        return []

    seen = {}
    # init round: one job per vertex
    frontier: List[Tuple[Tuple[int, ...], int]] = [
        ((v,), -1) for v in range(n)]
    while frontier:
        chunk = max(1, (len(frontier) + num_partitions - 1)
                    // num_partitions)
        futures = [
            _expand_task.remote(arrays_ref, frontier[i:i + chunk])
            for i in range(0, len(frontier), chunk)]
        new_seps = set()
        for f in ray.get(futures):
            new_seps |= f
        frontier = []
        for sep in sorted(new_seps):
            k = _key(sep)
            if k not in seen:
                seen[k] = sep
                frontier.extend((sep, x) for x in sep)
    return sorted(seen.values())


def minimum_size_separators(
    graph: Graph,
    n: Optional[int] = None,
    num_partitions: int = 8,
) -> List[Tuple[int, ...]]:
    """All minimum-size (= κ) vertex separators (separators.c:643):
    κ = 0 → none; κ = 1 → the articulation points; κ = n−1 (complete
    graph) → every (n−1)-subset; otherwise the size-κ slice of the
    Berry enumeration."""
    from igraph_ray.algorithms.biconnected import articulation_points
    from igraph_ray.algorithms.connectivity import vertex_connectivity

    nv = n if n is not None else graph.num_vertices()
    kappa = vertex_connectivity(graph, n=nv)
    if kappa == 0:
        return []
    if kappa == 1:
        aps = sorted(r["vertex"]
                     for r in articulation_points(graph).take_all())
        return [(int(v),) for v in aps]
    if kappa == nv - 1:
        return [tuple(v for v in range(nv) if v != i) for i in range(nv)]
    return [s for s in all_minimal_separators(
        graph, num_partitions=num_partitions) if len(s) == kappa]
