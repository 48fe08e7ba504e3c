"""Per-vertex triangle counting via degree-ordered sorted-neighbor wedges.

Reference semantics (SURVEY.md §2.2; triangles.c + triangles_template.h):
the graph is first simplified to an undirected simple graph (loops and
multi-edges dropped — igraph_i_trans4_al_simplify, triangles.c:399-428),
each edge is oriented from the lower-(degree, id) endpoint to the higher
one, and each vertex's *forward* neighbor list is scanned against its
forward neighbors' lists — every triangle is found exactly once and all
three corners are credited (triangles_template.h:82-105). Per-vertex
counts are orientation-invariant, so any correct algorithm matches igraph
exactly (integers).

Two physical plans over the same logical DAG:

- **broadcast path** (default up to ``broadcast_threshold`` edges): the
  canonical edge set is packed once into two object-store arrays — a
  sorted uint64 edge-key array (lo<<32|hi) and a degree array — and every
  map task orients, generates wedges, and closes them with a vectorized
  ``searchsorted`` against the broadcast keys. One shuffle total (the
  canonical dedup); the classic broadcast-hash-join specialization for a
  small-side lookup (SURVEY.md §2.6).
- **join path** (beyond the threshold, when the edge set no longer fits a
  worker): degrees + two hash joins to attach endpoint degrees →
  boundary-aligned sort by the forward source → per-block wedge
  generation → hash join wedges ⋈ oriented edges.

The degree orientation bounds per-vertex forward degree by O(sqrt(|E|)),
which bounds the wedge blow-up — the same arboricity trick the reference
uses to get O(|V|·d²).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.csr import compute_boundaries
from igraph_ray.graph import Graph
from igraph_ray.util import hash_join, universe_zeros

BROADCAST_THRESHOLD = 32_000_000


def triangle_counts(
    graph: Graph,
    num_partitions: Optional[int] = None,
    broadcast_threshold: int = BROADCAST_THRESHOLD,
) -> ray.data.Dataset:
    """Returns a Dataset (vertex, triangles) covering the whole universe."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus() * 2)

    und = graph.canonical_undirected().materialize()
    n_edges = und.count()
    # the broadcast path packs each edge as (lo<<32)|hi in uint64, which
    # silently corrupts lookups for vertex ids >= 2^32 — route such graphs
    # through the join plan regardless of edge count (hi >= lo, so one
    # cheap max() decides)
    if n_edges <= broadcast_threshold and (
        n_edges == 0 or int(und.max("hi")) < 2**32
    ):
        return _broadcast_impl(graph, und, num_partitions)
    return _join_impl(graph, und, num_partitions)


@ray.remote(num_returns=2)
def _pack_edges(tables, use_unique_ids: bool):
    """Assemble the broadcast side: sorted uint64 edge keys + degrees.

    Runs in one task (never on the driver); the arrays land in the object
    store and are mapped zero-copy by every wedge task.
    """
    tables = [t for t in ray.get(list(tables)) if t.num_rows and "lo" in t.column_names]
    if not tables:
        return ({"ids": np.empty(0, np.int64), "deg": np.empty(0, np.int64)},
                np.empty(0, np.uint64))
    los = np.concatenate([t["lo"].to_numpy(zero_copy_only=False) for t in tables])
    his = np.concatenate([t["hi"].to_numpy(zero_copy_only=False) for t in tables])
    if use_unique_ids:
        ids = np.unique(np.concatenate([los, his]))
        lo_i = np.searchsorted(ids, los)
        hi_i = np.searchsorted(ids, his)
    else:
        ids = None
        lo_i, hi_i = los, his
    ndense = (ids.size if ids is not None else int(max(los.max(), his.max())) + 1) if len(los) else 0
    deg = np.bincount(lo_i, minlength=ndense) + np.bincount(hi_i, minlength=ndense)
    if len(his) and int(his.max()) >= 2**32:
        raise ValueError(
            "broadcast triangle path requires vertex ids < 2^32 "
            "(caller routes larger ids to the join plan)"
        )
    keys = np.sort((los.astype(np.uint64) << np.uint64(32)) | his.astype(np.uint64))
    return ({"ids": ids, "deg": deg.astype(np.int64)}, keys)


def _broadcast_impl(graph: Graph, und, num_partitions: int) -> ray.data.Dataset:
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
             "dv": pa.array(dv.astype(np.int64), pa.int64())}
        )

    oriented = und.map_batches(_orient, batch_format="pyarrow", batch_size=None).materialize()
    bnds = compute_boundaries(oriented, num_partitions, col="u")
    osorted = oriented.sort("u", boundaries=bnds) if bnds else oriented.sort("u")

    def _wedge_close(b: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        a_idx, b_idx, u, v = _gen_wedges(b)
        if a_idx is None:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        wa, wb, wc = v[a_idx], v[b_idx], u[a_idx]
        # wedge endpoints are (deg,id)-rank-ordered; edge keys are canonical
        # (numeric lo<hi), so re-canonicalize before the lookup
        klo = np.minimum(wa, wb).astype(np.uint64)
        khi = np.maximum(wa, wb).astype(np.uint64)
        wkey = (klo << np.uint64(32)) | khi
        pos = np.searchsorted(keys, wkey)
        pos[pos >= len(keys)] = len(keys) - 1
        hit = keys[pos] == wkey
        verts = np.concatenate([wa[hit], wb[hit], wc[hit]])
        uniq, counts = np.unique(verts, return_counts=True)
        return pa.table(
            {"vertex": pa.array(uniq, pa.int64()),
             "cnt": pa.array(counts.astype(np.int64), pa.int64())}
        )

    credits = osorted.map_batches(_wedge_close, batch_format="pyarrow", batch_size=None).union(
        universe_zeros(graph.vertices(), "cnt")
    )
    return _final_sum(credits)


def _gen_wedges(b: pa.Table):
    """Vectorized forward-neighbor pair generation over a u-sorted block."""
    u = b["u"].to_numpy(zero_copy_only=False)
    v = b["v"].to_numpy(zero_copy_only=False)
    dv = b["dv"].to_numpy(zero_copy_only=False)
    if len(u) == 0:
        return None, None, None, None
    order = np.lexsort((v, dv, u))
    u, v = u[order], v[order]
    grp_start = np.empty(len(u), dtype=bool)
    grp_start[0] = True
    np.not_equal(u[1:], u[:-1], out=grp_start[1:])
    gid = np.cumsum(grp_start) - 1
    starts = np.flatnonzero(grp_start)
    ends = np.append(starts[1:], len(u))
    gend = ends[gid]
    cnt = gend - np.arange(len(u)) - 1
    total = int(cnt.sum())
    if total == 0:
        return None, None, None, None
    a_idx = np.repeat(np.arange(len(u)), cnt)
    off = np.zeros(len(cnt), dtype=np.int64)
    np.cumsum(cnt[:-1], out=off[1:])
    b_idx = np.arange(total, dtype=np.int64) - np.repeat(off, cnt) + a_idx + 1
    return a_idx, b_idx, u, v


def _final_sum(credits: ray.data.Dataset) -> ray.data.Dataset:
    summed = credits.groupby("vertex").sum("cnt")

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"], "triangles": b["sum(cnt)"]})

    return summed.map_batches(_rename, batch_format="pyarrow", batch_size=None)


def oriented_triangle_stream(und, num_partitions: int, degs=None,
                             return_oriented: bool = False):
    """Stream of (wa, wb, wc) rows, EXACTLY one per triangle of the
    simplified undirected graph ``und`` (canonical lo < hi edge rows):
    wc is the (deg, id)-lowest vertex of the triangle, wa/wb its two
    forward neighbors in (deg, id) rank order. The degree-rank
    orientation bounds per-vertex wedge work by O(sqrt(|E|)) /
    arboricity even on adversarial degree-ordered vertex ids — shared
    by triangle_counts' join plan and similarity_over_edges.

    ``degs``: optional precomputed (vertex, count()) degree table (the
    caller may already hold one — avoids a duplicate groupby).
    ``return_oriented``: also return the materialized oriented edge
    table (u, v, du, dv) so callers can recover per-edge endpoint
    degrees without re-joining."""

    if degs is None:
        # undirected degree of the simplified graph
        def _lo(b: pa.Table) -> pa.Table:
            return pa.table({"vertex": b["lo"]})

        def _hi(b: pa.Table) -> pa.Table:
            return pa.table({"vertex": b["hi"]})

        degs = (
            und.map_batches(_lo, batch_format="pyarrow", batch_size=None)
            .union(und.map_batches(_hi, batch_format="pyarrow",
                                   batch_size=None))
            .groupby("vertex")
            .count()
        )

    def _deg_lo(b: pa.Table) -> pa.Table:
        return pa.table({"lo": b["vertex"], "deg_lo": b["count()"]})

    def _deg_hi(b: pa.Table) -> pa.Table:
        return pa.table({"hi": b["vertex"], "deg_hi": b["count()"]})

    j1 = hash_join(
        und, degs.map_batches(_deg_lo, batch_format="pyarrow", batch_size=None),
        on="lo", num_partitions=num_partitions,
    )
    j2 = hash_join(
        j1, degs.map_batches(_deg_hi, batch_format="pyarrow", batch_size=None),
        on="hi", num_partitions=num_partitions,
    )

    def _orient(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        dlo = b["deg_lo"].to_numpy(zero_copy_only=False)
        dhi = b["deg_hi"].to_numpy(zero_copy_only=False)
        # forward direction: lower (deg, id) → higher (deg, id)
        lo_first = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
        u = np.where(lo_first, lo, hi)
        v = np.where(lo_first, hi, lo)
        du = np.where(lo_first, dlo, dhi)
        dv = np.where(lo_first, dhi, dlo)
        return pa.table(
            {"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64()),
             "du": pa.array(du.astype(np.int64), pa.int64()),
             "dv": pa.array(dv.astype(np.int64), pa.int64())}
        )

    oriented = j2.map_batches(_orient, batch_format="pyarrow", batch_size=None).materialize()

    bnds = compute_boundaries(oriented, num_partitions, col="u")
    osorted = oriented.sort("u", boundaries=bnds) if bnds else oriented.sort("u")

    def _wedges(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        dv = b["dv"].to_numpy(zero_copy_only=False)
        if len(u) == 0:
            return pa.table({"wa": pa.array([], pa.int64()), "wb": pa.array([], pa.int64()),
                             "wc": pa.array([], pa.int64())})
        # within each u group, order forward neighbors by (deg, id) so wedge
        # endpoints come out rank-ordered (matching the edge orientation)
        order = np.lexsort((v, dv, u))
        u, v = u[order], v[order]
        grp_start = np.empty(len(u), dtype=bool)
        grp_start[0] = True
        np.not_equal(u[1:], u[:-1], out=grp_start[1:])
        gid = np.cumsum(grp_start) - 1
        starts = np.flatnonzero(grp_start)
        ends = np.append(starts[1:], len(u))
        gend = ends[gid]  # group end per position
        cnt = gend - np.arange(len(u)) - 1  # pairs led by this position
        total = int(cnt.sum())
        if total == 0:
            return pa.table({"wa": pa.array([], pa.int64()), "wb": pa.array([], pa.int64()),
                             "wc": pa.array([], pa.int64())})
        a_idx = np.repeat(np.arange(len(u)), cnt)
        off = np.zeros(len(cnt), dtype=np.int64)
        np.cumsum(cnt[:-1], out=off[1:])
        b_idx = np.arange(total, dtype=np.int64) - np.repeat(off, cnt) + a_idx + 1
        return pa.table(
            {"wa": pa.array(v[a_idx], pa.int64()),
             "wb": pa.array(v[b_idx], pa.int64()),
             "wc": pa.array(u[a_idx], pa.int64())}
        )

    wedges = osorted.map_batches(_wedges, batch_format="pyarrow", batch_size=None)

    def _edge_key(b: pa.Table) -> pa.Table:
        return pa.table({"wa": b["u"], "wb": b["v"]})

    closing = oriented.map_batches(_edge_key, batch_format="pyarrow", batch_size=None)
    tri = hash_join(wedges, closing, on=("wa", "wb"),
                    num_partitions=num_partitions)
    return (tri, oriented) if return_oriented else tri


def _join_impl(graph: Graph, und, num_partitions: int) -> ray.data.Dataset:
    tri = oriented_triangle_stream(und, num_partitions)

    def _credit(b: pa.Table) -> pa.Table:
        verts = np.concatenate(
            [
                b["wa"].to_numpy(zero_copy_only=False),
                b["wb"].to_numpy(zero_copy_only=False),
                b["wc"].to_numpy(zero_copy_only=False),
            ]
        ) if b.num_rows else np.empty(0, np.int64)
        uniq, counts = np.unique(verts, return_counts=True)
        return pa.table(
            {"vertex": pa.array(uniq, pa.int64()),
             "cnt": pa.array(counts.astype(np.int64), pa.int64())}
        )

    credits = tri.map_batches(_credit, batch_format="pyarrow", batch_size=None).union(
        universe_zeros(graph.vertices(), "cnt")
    )
    summed = credits.groupby("vertex").sum("cnt")

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"], "triangles": b["sum(cnt)"]})

    return summed.map_batches(_rename, batch_format="pyarrow", batch_size=None)
