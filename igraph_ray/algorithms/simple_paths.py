"""All simple paths up to a cutoff — the engine's
igraph_get_all_simple_paths (/root/reference/src/paths.c:60).

The reference runs a sequential DFS with an in-stack marker; the
engine's distributed shape is level-synchronous frontier expansion:
the frontier is a Dataset of partial paths (tail, path-string,
visited-bitmask), each step is ONE hash_join (frontier ⋈ edges on
tail = src, edges broadcast when small) plus ONE vectorized
map_batches that drops extensions revisiting a vertex (bitmask test —
numpy bit ops over a fixed-size-binary column, no per-row Python) and
appends the new vertex to both the mask and the display string
(pyarrow binary_join_element_wise). Simple paths explode
combinatorially in the cutoff — inherent to the operator, the cutoff
is the honesty guard — but each level is fully data-parallel and
streams block-by-block, unlike the reference's single DFS stack.

Paths are emitted as "v0->v1->..." strings (every path of 1..cutoff
edges from the source), exactly reproducible in SQL by a recursive
CTE carrying a DuckDB list: see SQL_SIMPLE_PATHS in
pipelines/queries.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.util import hash_join


def _mask_np(col, mb: int) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    buf = np.frombuffer(arr.buffers()[1], np.uint8)
    off = arr.offset * mb
    return buf[off: off + len(arr) * mb].reshape(-1, mb)


def all_simple_paths(
    graph: Graph,
    source: int,
    cutoff: int,
    n: int | None = None,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Dataset with one ``path`` string per simple path of 1..cutoff
    edges starting at ``source`` (targets = all vertices, the
    igraph_get_all_simple_paths contract with vs=ALL)."""
    n = n if n is not None else graph.num_vertices()
    mb = (n + 7) // 8
    edges = graph.edges.map_batches(
        lambda b: pa.table({"tail": b["src"], "nxt": b["dst"]}),
        batch_format="pyarrow", batch_size=None).materialize()

    mask0 = bytearray(mb)
    mask0[source >> 3] |= 1 << (source & 7)
    frontier = ray.data.from_arrow(pa.table({
        "tail": pa.array([source], pa.int64()),
        "path": pa.array([str(source)], pa.string()),
        "mask": pa.array([bytes(mask0)], pa.binary(mb)),
    }))
    outs: list = []
    for _ in range(cutoff):
        j = hash_join(frontier, edges, on="tail",
                      num_partitions=num_partitions)

        def _extend(b: pa.Table, _mb=mb) -> pa.Table:
            empty = pa.table({
                "tail": pa.array([], pa.int64()),
                "path": pa.array([], pa.string()),
                "mask": pa.array([], pa.binary(_mb))})
            if b.num_rows == 0:
                return empty
            nxt = b["nxt"].to_numpy(zero_copy_only=False).astype(np.int64)
            mask = _mask_np(b["mask"], _mb)
            seen = (mask[np.arange(len(nxt)), nxt >> 3]
                    >> (nxt & 7).astype(np.uint8)) & 1
            b = b.filter(pa.array(seen == 0))
            if b.num_rows == 0:
                return empty
            nxt = b["nxt"].to_numpy(zero_copy_only=False).astype(np.int64)
            newmask = _mask_np(b["mask"], _mb).copy()
            newmask[np.arange(len(nxt)), nxt >> 3] |= (
                1 << (nxt & 7)).astype(np.uint8)
            nxt_arr = pa.array(nxt)
            path = pc.binary_join_element_wise(
                b["path"].combine_chunks()
                if isinstance(b["path"], pa.ChunkedArray) else b["path"],
                pc.cast(nxt_arr, pa.string()), "->")
            mask_arr = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(_mb), len(nxt),
                [None, pa.py_buffer(newmask.tobytes(order="C"))])
            return pa.table({"tail": nxt_arr, "path": path,
                             "mask": mask_arr})

        frontier = j.map_batches(_extend, batch_format="pyarrow",
                                 batch_size=None).materialize()
        outs.append(frontier.select_columns(["path"]))
        if frontier.count() == 0:
            break
    if not outs:
        return ray.data.from_arrow(pa.table({"path": pa.array([],
                                                              pa.string())}))
    res = outs[0]
    for o in outs[1:]:
        res = res.union(o)
    return res.sort("path")


def shortest_path_counts(
    graph: Graph,
    source: int,
    num_partitions: int = 8,
    max_levels: int = 32,
) -> ray.data.Dataset:
    """(vertex, dist, sigma) for every vertex reachable from
    ``source``: BFS distance and the NUMBER of distinct shortest
    paths — the σ table of Brandes' algorithm
    (igraph_get_all_shortest_paths semantics, paths in
    structural_properties.c, exposed as counts; the full enumeration
    is σ-many rows and the counts are the useful aggregate).

    Level-synchronous: each level is one broadcast hash_join
    (frontier ⋈ edges), one groupby-sum of parent sigmas, and one
    anti-join against the settled set. σ(v) = Σ_{u→v, dist(u)=k-1}
    σ(u). Raises past ``max_levels`` (the SQL oracle unrolls the same
    bound)."""
    edges = graph.edges.map_batches(
        lambda b: pa.table({"tail": b["src"], "nxt": b["dst"]}),
        batch_format="pyarrow", batch_size=None).materialize()
    frontier = ray.data.from_arrow(pa.table({
        "vertex": pa.array([source], pa.int64()),
        "sigma": pa.array([1], pa.int64())}))
    settled = frontier.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "dist": pa.array(
            np.zeros(b.num_rows, np.int64)), "sigma": b["sigma"]}),
        batch_format="pyarrow", batch_size=None).materialize()
    for level in range(1, max_levels + 2):
        j = hash_join(
            frontier.map_batches(
                lambda b: pa.table({"tail": b["vertex"],
                                    "sigma": b["sigma"]}),
                batch_format="pyarrow", batch_size=None),
            edges, on="tail", num_partitions=num_partitions)

        def _sum(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"vertex": pa.array([], pa.int64()),
                                 "sigma": pa.array([], pa.int64())})
            t = pa.table({"vertex": b["nxt"], "sigma": b["sigma"]})
            return (t.group_by("vertex").aggregate([("sigma", "sum")])
                    .rename_columns(["vertex", "sigma"]))

        nxt = (j.map_batches(_sum, batch_format="pyarrow",
                             batch_size=None)
               .groupby("vertex").sum("sigma"))
        nxt = nxt.map_batches(
            lambda b: (pa.table({"vertex": b["vertex"],
                                 "sigma": b["sum(sigma)"]})
                       if b.num_rows else
                       pa.table({"vertex": pa.array([], pa.int64()),
                                 "sigma": pa.array([], pa.int64())})),
            batch_format="pyarrow", batch_size=None)
        frontier = hash_join(
            nxt, settled.select_columns(["vertex"]), on="vertex",
            num_partitions=num_partitions,
            join_type="left_anti").materialize()
        if frontier.count() == 0:
            break
        if level > max_levels:
            raise RuntimeError(
                f"BFS exceeded max_levels={max_levels}")
        lvl = level

        def _stamp(b: pa.Table, _l=lvl) -> pa.Table:
            return pa.table({
                "vertex": b["vertex"],
                "dist": pa.array(np.full(b.num_rows, _l, np.int64)),
                "sigma": b["sigma"]})

        settled = settled.union(frontier.map_batches(
            _stamp, batch_format="pyarrow", batch_size=None)
        ).materialize()
    return settled.sort("vertex")


def all_shortest_path_seqs(
    graph: Graph,
    source: int,
    levels: int = 4,
    weight_fn=None,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """(vertex, dist, path): EVERY shortest path from ``source`` as a
    '>'-joined vertex-id string — the full enumeration surface of
    igraph_get_all_shortest_paths (structural_properties.c) and, with
    ``weight_fn``, igraph_get_all_shortest_paths_dijkstra. ``levels``
    bounds the HOP length of enumerated paths (the registry oracle
    unrolls the same bound, so both sides see the identical slice).

    ``weight_fn(src, dst) -> int weights`` switches to weighted
    semantics: dist is the min-plus distance and a path edge (u, v)
    qualifies iff dist(v) = dist(u) + w(u, v).

    Level-synchronous: one frontier ⋈ edges join per hop plus a
    settle/relax check against the distance table; paths extend with
    one vectorized string concat (pc.binary_join_element_wise). The σ
    counts view (shortest_path_counts) is the aggregate for scale —
    the enumeration is inherently σ-many rows."""
    import pyarrow.compute as pc

    def _w(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        w = (weight_fn(s, d) if weight_fn is not None
             else np.ones(len(s), np.int64))
        return pa.table({"tail": pa.array(s), "nxt": pa.array(d),
                         "w": pa.array(w.astype(np.int64))})

    edges = graph.edges.map_batches(_w, batch_format="pyarrow",
                                    batch_size=None).materialize()

    # --- distances (hop-synchronous Bellman relaxation, `levels` rounds)
    dist = ray.data.from_arrow(pa.table({
        "vertex": pa.array([source], pa.int64()),
        "dist": pa.array([0], pa.int64())})).materialize()
    for _ in range(levels):
        relax = hash_join(
            dist.map_batches(lambda b: pa.table(
                {"tail": b["vertex"], "dbase": b["dist"]}),
                batch_format="pyarrow", batch_size=None),
            edges, on="tail", num_partitions=num_partitions)
        cand = relax.map_batches(
            lambda b: pa.table({
                "vertex": b["nxt"],
                "dist": pa.array(
                    b["dbase"].to_numpy(zero_copy_only=False)
                    + b["w"].to_numpy(zero_copy_only=False))})
            if b.num_rows else pa.table(
                {"vertex": pa.array([], pa.int64()),
                 "dist": pa.array([], pa.int64())}),
            batch_format="pyarrow", batch_size=None)
        dist = (dist.union(cand).groupby("vertex").min("dist")
                .map_batches(lambda b: pa.table(
                    {"vertex": b["vertex"], "dist": b["min(dist)"]})
                    if b.num_rows else pa.table(
                        {"vertex": pa.array([], pa.int64()),
                         "dist": pa.array([], pa.int64())}),
                    batch_format="pyarrow", batch_size=None)
                .materialize())

    dist_t = dist.map_batches(
        lambda b: pa.table({"nxt": b["vertex"], "dnxt": b["dist"]})
        if b.num_rows else pa.table(
            {"nxt": pa.array([], pa.int64()),
             "dnxt": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None).materialize()

    # --- path expansion along tight edges only
    paths = ray.data.from_arrow(pa.table({
        "vertex": pa.array([source], pa.int64()),
        "dist": pa.array([0], pa.int64()),
        "path": pa.array([str(source)], pa.string())})).materialize()
    out_layers = [paths]
    for _ in range(levels):
        ext = hash_join(
            paths.map_batches(lambda b: pa.table(
                {"tail": b["vertex"], "dbase": b["dist"],
                 "path": b["path"]}),
                batch_format="pyarrow", batch_size=None),
            edges, on="tail", num_partitions=num_partitions)
        ext = hash_join(ext, dist_t, on="nxt",
                        num_partitions=num_partitions)

        def _tight(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"vertex": pa.array([], pa.int64()),
                                 "dist": pa.array([], pa.int64()),
                                 "path": pa.array([], pa.string())})
            keep = (b["dnxt"].to_numpy(zero_copy_only=False)
                    == b["dbase"].to_numpy(zero_copy_only=False)
                    + b["w"].to_numpy(zero_copy_only=False))
            t = b.filter(pa.array(keep))
            newp = pc.binary_join_element_wise(
                t["path"], pc.cast(t["nxt"], pa.string()), ">")
            return pa.table({"vertex": t["nxt"], "dist": t["dnxt"],
                             "path": newp})

        paths = ext.map_batches(_tight, batch_format="pyarrow",
                                batch_size=None).materialize()
        if paths.count() == 0:
            break
        out_layers.append(paths)

    out = out_layers[0]
    for lay in out_layers[1:]:
        out = out.union(lay)
    # a vertex can be reached by tight chains longer in hops than a
    # shorter tight chain only in the weighted case where both are
    # shortest; dedup identical sequences (loops cannot occur on tight
    # edges since dist strictly increases)
    return out.groupby(["vertex", "dist", "path"]).count().select_columns(
        ["vertex", "dist", "path"])
