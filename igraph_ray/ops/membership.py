"""Community-membership utilities — counterparts of the reference's
community.c helper surface:

* igraph_community_to_membership (community.c:757) — convert a merge
  matrix (each row joins two communities; ids < n are vertices, id
  n+i is the result of row i) after ``steps`` merges into a
  membership vector, with the reference's exact numbering: components
  discovered in BACKWARD merge order get ids 0, 1, ..., then vertices
  never touched by the kept merges get fresh ids in ascending vertex
  order.
* igraph_reindex_membership (community.c:1011) — compact arbitrary
  labels to 0..k-1 ranked by ascending old label (dense rank).

community_to_membership is a replay of an O(steps) driver-side matrix
(the merge matrix is the OUTPUT of a community algorithm, never data-
scale); reindex_membership is a vectorized kernel used inside
map_batches at any scale."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def community_to_membership(
    merges: Sequence[Tuple[int, int]],
    nodes: int,
    steps: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (membership[nodes], csize[nodes - steps]) with the
    reference's exact numbering (community.c:757-840)."""
    if steps > len(merges):
        raise ValueError("steps too big or merges matrix too short")
    membership = np.zeros(nodes, dtype=np.int64)
    csize = np.zeros(nodes - steps, dtype=np.int64)
    tmp = np.zeros(steps, dtype=np.int64)
    found = 0
    for i in range(steps - 1, -1, -1):
        c1, c2 = int(merges[i][0]), int(merges[i][1])
        if tmp[i] == 0:
            found += 1
            tmp[i] = found
        for c in (c1, c2):
            if c < nodes:
                cid = tmp[i] - 1
                membership[c] = cid + 1
                csize[cid] += 1
            else:
                tmp[c - nodes] = tmp[i]
    for i in range(nodes):
        t = int(membership[i])
        if t != 0:
            membership[i] = t - 1
        else:
            csize[found] += 1
            membership[i] = found
            found += 1
    return membership, csize


def reindex_membership(membership: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (new_membership, new_to_old): labels compacted to
    0..k-1 by ascending old label (community.c:1011)."""
    membership = np.asarray(membership)
    if membership.size == 0:
        return membership.astype(np.int64), np.array([], dtype=np.int64)
    new_to_old, inverse = np.unique(membership, return_inverse=True)
    return inverse.astype(np.int64), new_to_old.astype(np.int64)


def eb_get_merges(
    removed_edges: Sequence[Tuple[int, int]],
    nodes: int,
) -> List[Tuple[int, int]]:
    """igraph_community_eb_get_merges (community.c:223): replay the
    edge-betweenness REMOVAL order backwards — adding edges back one
    by one, each join of two distinct components is one merge row,
    exactly the dendrogram the reference reconstructs. Union-find
    over the reversed removal list."""
    parent = np.arange(nodes, dtype=np.int64)
    comp_id = np.arange(nodes, dtype=np.int64)  # current community id

    def find(v: int) -> int:
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = int(parent[v])
        return v

    merges: List[Tuple[int, int]] = []
    nxt = nodes
    for a, b in reversed(list(removed_edges)):
        ra, rb = find(int(a)), find(int(b))
        if ra == rb:
            continue
        ca, cb = int(comp_id[ra]), int(comp_id[rb])
        merges.append((ca, cb))
        parent[rb] = ra
        comp_id[ra] = nxt
        nxt += 1
    return merges


def le_community_to_membership(
    merges: Sequence[Tuple[int, int]],
    steps: int,
    membership: "ray.data.Dataset",
    num_partitions: int = 8,
):
    """igraph_le_community_to_membership (community.c): perform
    ``steps`` merges of the leading-eigenvector merge matrix on top of
    an EXISTING membership (vertex, community): the merge matrix acts
    on community ids, and each vertex is relabeled through the
    component-level result of community_to_membership. Returns
    (membership Dataset (vertex, community), csize ndarray).

    The merge relabeling is O(#communities) driver algebra (the
    reference's fake_memb pass); the per-vertex rewrite is one
    broadcast join over the membership Dataset."""
    import pyarrow as pa
    import ray
    import ray.data

    from igraph_ray.util import hash_join

    membership = membership.materialize()
    comm_max = int(membership.max("community"))
    components = comm_max + 1
    if steps >= components:
        raise ValueError("cannot make `steps` steps from membership")
    fake, _ = community_to_membership(merges, components, steps)
    lut = ray.data.from_arrow(pa.table({
        "community": pa.array(np.arange(components, dtype=np.int64)),
        "new": pa.array(fake.astype(np.int64))}))
    j = hash_join(membership, lut, on="community",
                  num_partitions=num_partitions)
    out = j.map_batches(
        lambda b: pa.table({"vertex": b["vertex"],
                            "community": b["new"]})
        if b.num_rows and "vertex" in b.column_names else pa.table(
            {"vertex": pa.array([], pa.int64()),
             "community": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None).materialize()
    csize = np.zeros(components - steps, dtype=np.int64)
    for r in out.groupby("community").count().take_all():
        csize[int(r["community"])] = int(r["count()"])
    return out, csize
