"""Subgraph isomorphism counting (VF2 family).

Reference semantics: igraph_count_subisomorphisms_vf2 /
igraph_subisomorphic_vf2 (/root/reference/src/topology.c — VF2,
Cordella et al. 2004): the number of injective vertex maps from a small
PATTERN graph into the target graph such that every pattern edge maps
onto a target edge (non-induced matches, the reference's default).

The reference's recursive VF2 search is sequential; the Ray-native
engine re-expresses counting as the classic distributed *binding-join
plan* (worst-case-optimal-join folklore; same shape as the engine's
wedge join): pattern vertices are bound one at a time in a connected
order, each step one hash join of the partial-binding Dataset against
the target edge table, followed by vectorized checks of the remaining
pattern edges (packed-key semi joins) and the injectivity filter.
Patterns are tiny (broadcast); the partial-binding stream is the only
big data and it never lands on the driver.

``isomorphic_small`` closes the igraph_isomorphic surface for tiny
graphs: exact permutation search, guarded to ≤ 8 vertices (documented
ceiling like the maximal-cliques broadcast plan).
"""

from __future__ import annotations

from itertools import permutations
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.util import hash_join


def _pattern_order(p: int, pedges: List[Tuple[int, int]]) -> List[int]:
    """BFS order from vertex 0; every later vertex touches an earlier
    one (the pattern must be connected)."""
    adj = [[] for _ in range(p)]
    for a, b in pedges:
        adj[a].append(b)
        adj[b].append(a)
    seen = [False] * p
    order = [0]
    seen[0] = True
    i = 0
    while i < len(order):
        for nb in sorted(adj[order[i]]):
            if not seen[nb]:
                seen[nb] = True
                order.append(nb)
        i += 1
    if len(order) != p:
        raise ValueError("pattern must be connected")
    return order


def count_sub_isomorphisms(
    graph: Graph,
    pattern_src: Sequence[int],
    pattern_dst: Sequence[int],
    directed: bool = False,
    num_partitions: int = 8,
) -> int:
    """Number of injective maps pattern → graph preserving pattern edges
    (non-induced). Undirected mode matches over the symmetrized simple
    view (each pattern edge may map to either direction)."""
    pedges = [(int(a), int(b)) for a, b in zip(pattern_src, pattern_dst)
              if int(a) != int(b)]
    if not pedges:
        raise ValueError("pattern needs at least one edge")
    p = max(max(a, b) for a, b in pedges) + 1
    order = _pattern_order(p, pedges)
    pos = {v: i for i, v in enumerate(order)}

    # target adjacency as a directed row set; undirected = both ways
    def _adj(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        if not directed:
            s, d = np.concatenate([s, d]), np.concatenate([d, s])
        t = pa.table({"a": pa.array(s), "b": pa.array(d)})
        return t.group_by(["a", "b"]).aggregate([])

    E = (graph.edges.map_batches(_adj, batch_format="pyarrow",
                                 batch_size=None)
         .groupby(["a", "b"]).count().select_columns(["a", "b"])
         .materialize())
    if E.count() == 0:
        return 0

    def _has_edge(u: int, v: int) -> Optional[bool]:
        """Pattern-edge direction test: does pattern require u→v / u~v?"""
        if directed:
            return (u, v) in pedges
        return (u, v) in pedges or (v, u) in pedges

    # ---- seed: bind the first two pattern vertices over one edge ------
    v0, v1 = order[0], order[1]
    if directed and not _has_edge(v0, v1):
        # only v1→v0 exists: seed from the reversed edge
        seed = E.map_batches(
            lambda b: pa.table({f"c{0}": b["b"], f"c{1}": b["a"]}),
            batch_format="pyarrow", batch_size=None)
    else:
        seed = E.map_batches(
            lambda b: pa.table({f"c{0}": b["a"], f"c{1}": b["b"]}),
            batch_format="pyarrow", batch_size=None)
    state = seed.materialize()
    bound = [v0, v1]

    # directed patterns with BOTH v0→v1 and v1→v0 need the extra check
    extra_seed = []
    if directed and (v0, v1) in pedges and (v1, v0) in pedges:
        extra_seed.append((v1, v0))

    def _check_edges(ds, checks: List[Tuple[int, int]]):
        """Semi-join the binding stream against E for each (u, v)
        pattern edge (u, v already bound)."""
        for (u, v) in checks:
            cu, cv = f"c{pos[u]}", f"c{pos[v]}"
            probe = ds.map_batches(
                lambda b, cu=cu, cv=cv: b.append_column(
                    "a", b[cu]).append_column("b", b[cv]),
                batch_format="pyarrow", batch_size=None)
            ds = hash_join(probe, E, on=("a", "b"),
                           num_partitions=num_partitions,
                           join_type="left_semi")
            ds = ds.map_batches(
                lambda b: b.drop_columns(["a", "b"])
                if "a" in b.column_names else b,
                batch_format="pyarrow", batch_size=None).materialize()
        return ds

    state = _check_edges(state, extra_seed)

    for vi in order[2:]:
        # anchor: an already-bound pattern neighbor
        anchors = [u for u in bound if _has_edge(u, vi) or _has_edge(vi, u)]
        anchor = anchors[0]
        ca = f"c{pos[anchor]}"
        # expand along anchor→vi (or vi→anchor when only that exists)
        fwd = _has_edge(anchor, vi)
        join_col = "a" if fwd else "b"
        new_col = "b" if fwd else "a"
        probe = state.map_batches(
            lambda b, ca=ca, join_col=join_col:
            b.append_column(join_col, b[ca]),
            batch_format="pyarrow", batch_size=None)
        joined = hash_join(probe, E, on=join_col,
                           num_partitions=num_partitions)

        ci = f"c{pos[vi]}"

        def _bind(b: pa.Table, ci=ci, new_col=new_col,
                  nb=len(bound)) -> pa.Table:
            if b.num_rows == 0 or new_col not in b.column_names:
                cols = {f"c{k}": pa.array([], pa.int64())
                        for k in range(nb)}
                cols[ci] = pa.array([], pa.int64())
                return pa.table(cols)
            newv = b[new_col].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = np.ones(len(newv), dtype=bool)
            for k in range(nb):
                keep &= (newv
                         != b[f"c{k}"].to_numpy(zero_copy_only=False))
            t = b.drop_columns([c for c in ("a", "b")
                                if c in b.column_names])
            t = t.append_column(ci, pa.array(newv))
            return t.filter(pa.array(keep))

        state = joined.map_batches(_bind, batch_format="pyarrow",
                                   batch_size=None).materialize()
        if state.count() == 0:
            return 0
        # remaining pattern edges between vi and other bound vertices
        checks = []
        for u in bound:
            if u == anchor:
                # anchor covered by the expansion join except the
                # reverse direction of a directed mutual edge
                if directed and _has_edge(anchor, vi) and _has_edge(vi, anchor):
                    checks.append((vi, anchor))
                continue
            if directed:
                if _has_edge(u, vi):
                    checks.append((u, vi))
                if _has_edge(vi, u):
                    checks.append((vi, u))
            else:
                if _has_edge(u, vi):
                    checks.append((u, vi))
        state = _check_edges(state, checks)
        bound.append(vi)

    return int(state.count())


def isomorphic_small(
    g1_src, g1_dst, n1: int, g2_src, g2_dst, n2: int,
    directed: bool = False, max_vertices: int = 8,
) -> bool:
    """igraph_isomorphic for tiny graphs: exact permutation search,
    guarded to ``max_vertices`` (an exponential problem — the honest
    small-graph ceiling; use canonical invariants + count_sub_isomorphisms
    for pattern work at scale)."""
    if n1 != n2:
        return False
    if n1 > max_vertices:
        raise NotImplementedError(
            f"isomorphic_small is guarded to {max_vertices} vertices")

    def _eset(src, dst):
        out = set()
        for a, b in zip(src, dst):
            a, b = int(a), int(b)
            if a == b:
                continue
            out.add((a, b) if directed else (min(a, b), max(a, b)))
        return out

    e1 = _eset(g1_src, g1_dst)
    e2 = _eset(g2_src, g2_dst)
    if len(e1) != len(e2):
        return False
    for perm in permutations(range(n1)):
        mapped = {(perm[a], perm[b]) if directed
                  else (min(perm[a], perm[b]), max(perm[a], perm[b]))
                  for a, b in e1}
        if mapped == e2:
            return True
    return False
