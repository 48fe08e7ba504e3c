"""Graph layouts.

Reference semantics (/root/reference/src/layout.c):

* igraph_layout_circle (layout.c:148): vertex i at
  (cos 2πi/n, sin 2πi/n).
* igraph_layout_star (layout.c:191): center at the origin, the other
  n−1 vertices on the unit circle in id order (phi advances only on
  non-center vertices).
* igraph_layout_grid (layout.c:299): row-major integer lattice of the
  given width (default ceil(sqrt(n))).
* igraph_layout_fruchterman_reingold (layout.c / the FR'91 grid
  variant): iterative force layout — attraction |Δ|²/k along edges,
  repulsion k²/|Δ| between vertex pairs, displacement capped by a
  linearly cooling temperature. The engine's repulsion uses the grid
  approximation (vertices repel CELL CENTROIDS of a 2k-sized grid
  rather than all pairs — the same locality idea as the reference's
  own grid variant), attraction is two hash joins along the edge
  table, and positions never land on the driver (the cell table is
  assembled in a task and broadcast by ref). Deterministic md5 initial
  positions.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.util import _concat_tables, hash_join

HEX12 = 16 ** 12


def _range_layout(n: int, fn) -> ray.data.Dataset:
    def _m(b: pa.Table) -> pa.Table:
        v = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = fn(v)
        return pa.table({"vertex": pa.array(v),
                         "x": pa.array(x.astype(np.float64)),
                         "y": pa.array(y.astype(np.float64))})

    return ray.data.range(n).map_batches(_m, batch_format="pyarrow",
                                         batch_size=None)


def layout_circle(n: int) -> ray.data.Dataset:
    return _range_layout(
        n, lambda v: (np.cos(2 * np.pi * v / n), np.sin(2 * np.pi * v / n)))


def layout_star(n: int, center: int = 0) -> ray.data.Dataset:
    def _f(v):
        if n == 1:
            return np.zeros(1), np.zeros(1)
        idx = v - (v > center)  # phi index skips the center
        phi = 2 * np.pi * idx / (n - 1)
        x = np.where(v == center, 0.0, np.cos(phi))
        y = np.where(v == center, 0.0, np.sin(phi))
        return x, y

    return _range_layout(n, _f)


def layout_grid(n: int, width: int = 0) -> ray.data.Dataset:
    w = width if width > 0 else int(np.ceil(np.sqrt(n)))
    return _range_layout(
        n, lambda v: ((v % w).astype(np.float64),
                      (v // w).astype(np.float64)))


def _md5_unit(keys) -> np.ndarray:
    out = np.empty(len(keys))
    for i, kstr in enumerate(keys):
        out[i] = int(hashlib.md5(kstr.encode()).hexdigest()[:12],
                     16) / HEX12
    return out


def layout_fruchterman_reingold(
    graph: Graph,
    iterations: int = 10,
    n: Optional[int] = None,
    num_partitions: int = 8,
    init_pos: Optional[ray.data.Dataset] = None,
) -> ray.data.Dataset:
    """FR force layout in the unit square; returns (vertex, x, y).
    ``init_pos`` (vertex, x, y) overrides the md5 start — the seam
    layout_lgl uses to anneal from its layered placement."""
    n = n if n is not None else graph.num_vertices()
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "vertex": pa.array([], pa.int64()),
            "x": pa.array([], pa.float64()),
            "y": pa.array([], pa.float64())}))
    k = float(np.sqrt(1.0 / n))
    # cell = 2k is the classic FR grid resolution; cap the cell size so
    # small graphs still get a usable grid (>= 4x4)
    cell = min(2.0 * k, 0.25)
    ncell = max(1, int(np.ceil(1.0 / cell)))
    und = graph.canonical_undirected().materialize()

    def _init(b: pa.Table) -> pa.Table:
        v = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _md5_unit([f"x:{i}" for i in v.tolist()])
        y = _md5_unit([f"y:{i}" for i in v.tolist()])
        return pa.table({"vertex": pa.array(v), "x": pa.array(x),
                         "y": pa.array(y)})

    pos = (init_pos if init_pos is not None else
           ray.data.range(n).map_batches(
               _init, batch_format="pyarrow",
               batch_size=None)).materialize()

    for it in range(iterations):
        temp = 0.15 * (1.0 - it / iterations)

        # cell centroid table: assembled in a task, broadcast by ref —
        # O(#cells) rows, never on the driver
        def _cells(b: pa.Table) -> pa.Table:
            x = b["x"].to_numpy(zero_copy_only=False)
            y = b["y"].to_numpy(zero_copy_only=False)
            cx = np.clip((x / cell).astype(np.int64), 0, ncell - 1)
            cy = np.clip((y / cell).astype(np.int64), 0, ncell - 1)
            cid = cx * ncell + cy
            t = pa.table({"cid": pa.array(cid), "x": b["x"], "y": b["y"],
                          "cnt": pa.array(np.ones(len(x)))})
            return t.group_by("cid").aggregate(
                [("x", "sum"), ("y", "sum"), ("cnt", "sum")])

        cells = (pos.map_batches(_cells, batch_format="pyarrow",
                                 batch_size=None)
                 .groupby("cid").sum(["x_sum", "y_sum", "cnt_sum"]))
        cells_ref = _concat_tables.remote(cells.to_arrow_refs())

        # attraction: tag each undirected edge with both positions
        ps = pos.map_batches(lambda b: pa.table(
            {"lo": b["vertex"], "xs": b["x"], "ys": b["y"]}),
            batch_format="pyarrow", batch_size=None)
        pd_ = pos.map_batches(lambda b: pa.table(
            {"hi": b["vertex"], "xd": b["x"], "yd": b["y"]}),
            batch_format="pyarrow", batch_size=None)
        j = hash_join(und, ps, on="lo", num_partitions=num_partitions)
        j = hash_join(j, pd_, on="hi", num_partitions=num_partitions)

        def _att(b: pa.Table) -> pa.Table:
            dx = b["xd"].to_numpy(zero_copy_only=False) - \
                b["xs"].to_numpy(zero_copy_only=False)
            dy = b["yd"].to_numpy(zero_copy_only=False) - \
                b["ys"].to_numpy(zero_copy_only=False)
            d = np.sqrt(dx * dx + dy * dy) + 1e-9
            f = d / k  # FR attraction |Δ|²/k, normalized by |Δ|
            lo = b["lo"].to_numpy(zero_copy_only=False)
            hi = b["hi"].to_numpy(zero_copy_only=False)
            t = pa.table({
                "vertex": pa.array(np.concatenate([lo, hi])),
                "fx": pa.array(np.concatenate([dx * f, -dx * f])),
                "fy": pa.array(np.concatenate([dy * f, -dy * f])),
            })
            return t.group_by("vertex").aggregate(
                [("fx", "sum"), ("fy", "sum")])

        att = (j.map_batches(_att, batch_format="pyarrow",
                             batch_size=None)
               .groupby("vertex").sum(["fx_sum", "fy_sum"])
               .materialize())

        def _move(b: pa.Table, temp=temp) -> pa.Table:
            ct = ray.get(cells_ref)
            ccnt = ct["sum(cnt_sum)"].to_numpy(zero_copy_only=False)
            ccx = (ct["sum(x_sum)"].to_numpy(zero_copy_only=False)
                   / np.maximum(ccnt, 1.0))
            ccy = (ct["sum(y_sum)"].to_numpy(zero_copy_only=False)
                   / np.maximum(ccnt, 1.0))
            x = b["x"].to_numpy(zero_copy_only=False).copy()
            y = b["y"].to_numpy(zero_copy_only=False).copy()
            # repulsion from cell centroids (count-weighted); own
            # contribution cancels via the d>eps mask on the centroid
            dx = x[:, None] - ccx[None, :]
            dy = y[:, None] - ccy[None, :]
            d2 = dx * dx + dy * dy + 1e-12
            f = k * k / d2 * ccnt[None, :]
            fx = (dx * f).sum(axis=1)
            fy = (dy * f).sum(axis=1)
            if "sum(fx_sum)" in b.column_names:
                ax = np.nan_to_num(b["sum(fx_sum)"].to_numpy(
                    zero_copy_only=False).astype(np.float64))
                ay = np.nan_to_num(b["sum(fy_sum)"].to_numpy(
                    zero_copy_only=False).astype(np.float64))
                fx += ax
                fy += ay
            norm = np.sqrt(fx * fx + fy * fy) + 1e-12
            step = np.minimum(norm, temp)
            x = np.clip(x + fx / norm * step, 0.0, 1.0)
            y = np.clip(y + fy / norm * step, 0.0, 1.0)
            return pa.table({"vertex": b["vertex"], "x": pa.array(x),
                             "y": pa.array(y)})

        pos = (hash_join(pos, att, on="vertex",
                         num_partitions=num_partitions,
                         join_type="left_outer")
               .map_batches(_move, batch_format="pyarrow",
                            batch_size=None)
               .repartition(num_partitions).materialize())
    return pos


def layout_kamada_kawai(
    graph: Graph,
    iterations: int = 50,
    n: Optional[int] = None,
    max_vertices: int = 2048,
    dims: int = 2,
) -> ray.data.Dataset:
    """Kamada–Kawai layout (igraph_layout_kamada_kawai, layout_kk.c;
    KK '89) as deterministic SMACOF stress majorization: minimize
    Σ_{i<j} (|x_i−x_j| − d_ij)² / d_ij² over the BFS distance matrix,
    via the guaranteed-monotone majorization update
    x_i ← (Σ_j w_ij (x_j + d_ij·(x_i−x_j)/|x_i−x_j|)) / Σ_j w_ij,
    w = 1/d² (Gansner–Koren–North, GD 2004 — the modern KK solver).
    Deterministic md5 initial positions; disconnected pairs take
    d = n (finite repulsion fallback). APSP + the O(n²)-per-sweep
    majorization are inherent to KK, so they run inside ONE Ray task
    over the broadcast undirected arrays, guarded by ``max_vertices``
    — the scale path for layouts is the FR grid variant above."""
    from igraph_ray.algorithms.fastgreedy import (_aggregate_und,
                                                  und_arrays_ref)

    n = n if n is not None else graph.num_vertices()
    if n > max_vertices:
        raise NotImplementedError(
            f"KK stress majorization is O(n²)/sweep; guarded to "
            f"{max_vertices} vertices ({n} present) — use "
            f"layout_fruchterman_reingold at scale")
    arrays = und_arrays_ref(_aggregate_und(graph).materialize())

    @ray.remote
    def _kk(arrs):
        lo, hi, _w = arrs
        adj = [[] for _ in range(n)]
        for a, b in zip(lo.tolist(), hi.tolist()):
            adj[a].append(b)
            adj[b].append(a)
        D = np.full((n, n), float(n))
        for s in range(n):
            D[s, s] = 0.0
            dist = np.full(n, -1, np.int64)
            dist[s] = 0
            q = [s]
            while q:
                nq = []
                for u in q:
                    for v in adj[u]:
                        if dist[v] < 0:
                            dist[v] = dist[u] + 1
                            nq.append(v)
                q = nq
            r = dist >= 0
            D[s, r] = dist[r]
        # start from the circle layout like the reference's default
        # seed (layout_kk.c uses the circular start) — random starts
        # fall into collinear local minima of the stress
        theta = 2.0 * np.pi * np.arange(n) / max(n, 1)
        if dims == 3:
            # spherical-spiral seed (the 3-D analogue of the circle;
            # igraph_layout_kamada_kawai_3d starts from layout_sphere)
            h = (-1.0 + 2.0 * np.arange(n) / max(n - 1, 1)
                 if n > 1 else np.zeros(1))
            phi = np.arccos(np.clip(h, -1.0, 1.0))
            X = np.stack([np.sin(phi) * np.cos(theta * 2.0),
                          np.sin(phi) * np.sin(theta * 2.0),
                          np.cos(phi)], 1) * np.sqrt(n)
        else:
            X = np.stack([np.cos(theta), np.sin(theta)], 1) * np.sqrt(n)
        W = 1.0 / np.maximum(D, 1e-9) ** 2
        np.fill_diagonal(W, 0.0)
        wsum = W.sum(1)
        for _ in range(iterations):
            diff = X[:, None, :] - X[None, :, :]
            dist = np.sqrt((diff ** 2).sum(-1))
            np.fill_diagonal(dist, 1.0)
            ratio = W * D / np.maximum(dist, 1e-12)
            np.fill_diagonal(ratio, 0.0)
            X = ((W @ X) + ratio.sum(1)[:, None] * X
                 - ratio @ X) / wsum[:, None]
        return X

    X = ray.get(_kk.remote(arrays))
    cols = {"vertex": pa.array(np.arange(n, dtype=np.int64)),
            "x": pa.array(X[:, 0]), "y": pa.array(X[:, 1])}
    if dims == 3:
        cols["z"] = pa.array(X[:, 2])
    return ray.data.from_arrow(pa.table(cols))


# --------------------------------------------------------------- Sugiyama

def _global_rank(ds: ray.data.Dataset, sort_cols, out_col: str = "grank"
                 ) -> ray.data.Dataset:
    """Append a 0-based global rank under ``sort_cols`` order — sorted
    blocks + per-block offsets from row counts only (the dense_rank_map
    pattern; no row data lands on the driver)."""
    from igraph_ray.util import _block_rows

    s = ds.sort(sort_cols).materialize()
    refs = s.to_arrow_refs()
    sizes = ray.get([_block_rows.remote(r) for r in refs])
    offsets = np.zeros(len(sizes), dtype=np.int64)
    np.cumsum(sizes[:-1], out=offsets[1:])

    @ray.remote
    def _stamp(t: pa.Table, off: int) -> pa.Table:
        return t.append_column(
            out_col, pa.array(np.arange(off, off + t.num_rows), pa.int64()))

    out = [_stamp.remote(r, int(off))
           for r, off, nn in zip(refs, offsets, sizes) if nn > 0]
    if not out:
        return s
    return ray.data.from_arrow_refs(out)


def layout_sugiyama(
    graph: Graph,
    n: Optional[int] = None,
    sweeps: int = 4,
    hgap: float = 1.0,
    vgap: float = 1.0,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Sugiyama-style layered layout (igraph_layout_sugiyama,
    sugiyama.c:91): (vertex, x, y) with y = layer·vgap and x =
    within-layer slot·hgap.

    The reference's four phases, re-expressed distributed:
    1. cycle removal — Eades GR feedback arcs (algorithms/fas, the
       reference's own igraph_feedback_arc_set default) are REVERSED,
       preserving connectivity for the layering;
    2. layering — longest-path layers on the aligned superstep engine
       (the reference's layering when no layers vector is given);
    3. ordering — ``sweeps`` barycenter passes: each vertex's key is
       the mean x of its direct neighbors (both directions), then
       re-rank within layer by (barycenter, vertex) — a sort + two
       grouped aggregates per sweep, no driver data;
    4. horizontal placement — slot index · hgap (the reference's
       LP-compaction needs GLPK; slot placement is the documented
       deviation, as is skipping dummy vertices on long edges).
    """
    from igraph_ray.algorithms.fas import feedback_arc_set
    from igraph_ray.algorithms.paths import longest_path_layers
    from igraph_ray.ops.relational import _dedup

    back = feedback_arc_set(graph, n=n)  # small pa.Table of back arcs
    bs = back["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    bd = back["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(bs) and max(bs.max(), bd.max()) >= (1 << 31):
        raise NotImplementedError(
            "layout_sugiyama packs back-arc keys into int64; ids must "
            "fit 2^31")
    back_ref = ray.put(np.sort(bs * (np.int64(1) << 32) + bd))

    def _reorient(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        bk = ray.get(back_ref)
        if len(bk):
            key = src * (np.int64(1) << 32) + dst
            idx = np.searchsorted(bk, key)
            idx = np.minimum(idx, len(bk) - 1)
            flip = bk[idx] == key
            src, dst = (np.where(flip, dst, src), np.where(flip, src, dst))
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    dag = _dedup(graph.edges.map_batches(
        _reorient, batch_format="pyarrow", batch_size=None)).materialize()
    layers = longest_path_layers(Graph(dag, n=None),
                                 num_partitions=num_partitions).state
    layers = layers.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "layer": b["layer"]}),
        batch_format="pyarrow", batch_size=None)

    # initial order: by vertex id within layer
    pos = _global_rank(layers, ["layer", "vertex"])
    sym = dag.map_batches(
        lambda b: pa.table({
            "v": pa.array(np.concatenate(
                [b["src"].to_numpy(zero_copy_only=False),
                 b["dst"].to_numpy(zero_copy_only=False)])),
            "u": pa.array(np.concatenate(
                [b["dst"].to_numpy(zero_copy_only=False),
                 b["src"].to_numpy(zero_copy_only=False)]))}),
        batch_format="pyarrow", batch_size=None).materialize()

    for _ in range(max(0, sweeps)):
        nbr = hash_join(
            sym,
            pos.map_batches(
                lambda b: pa.table({"u": b["vertex"], "ux": b["grank"]}),
                batch_format="pyarrow", batch_size=None),
            on="u", num_partitions=num_partitions)

        def _pre(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "ux" not in b.column_names:
                return pa.table({"vertex": pa.array([], pa.int64()),
                                 "sx": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            t = pa.table({"vertex": b["v"], "sx": b["ux"],
                          "cnt": pa.array(np.ones(b.num_rows, np.int64))})
            return (t.group_by("vertex")
                    .aggregate([("sx", "sum"), ("cnt", "sum")])
                    .rename_columns(["vertex", "sx", "cnt"]))

        bc = (nbr.map_batches(_pre, batch_format="pyarrow", batch_size=None)
              .groupby("vertex").sum(["sx", "cnt"]))
        bc = bc.map_batches(
            lambda b: (pa.table({
                "vertex": b["vertex"],
                # e6 fixed-point barycenter keeps the sort key integral
                "bc": pa.array(
                    (b["sum(sx)"].to_numpy(zero_copy_only=False)
                     .astype(np.int64) * 1_000_000
                     // np.maximum(b["sum(cnt)"].to_numpy(
                         zero_copy_only=False).astype(np.int64), 1))
                    .astype(np.int64))})
                if b.num_rows else
                pa.table({"vertex": pa.array([], pa.int64()),
                          "bc": pa.array([], pa.int64())})),
            batch_format="pyarrow", batch_size=None)
        merged = hash_join(pos.select_columns(["vertex", "layer"]), bc,
                           on="vertex", num_partitions=num_partitions,
                           join_type="left_outer")

        def _key(b: pa.Table) -> pa.Table:
            bcv = b["bc"].to_numpy(zero_copy_only=False)
            bcv = np.nan_to_num(bcv.astype(np.float64),
                                nan=0.0).astype(np.int64)
            return pa.table({"vertex": b["vertex"], "layer": b["layer"],
                             "bc": pa.array(bcv)})

        pos = _global_rank(
            merged.map_batches(_key, batch_format="pyarrow",
                               batch_size=None),
            ["layer", "bc", "vertex"]).materialize()

    # within-layer slot = grank - min grank of the layer
    base = pos.groupby("layer").min("grank").map_batches(
        lambda b: (pa.table({"layer": b["layer"], "base": b["min(grank)"]})
                   if b.num_rows else
                   pa.table({"layer": pa.array([], pa.int64()),
                             "base": pa.array([], pa.int64())})),
        batch_format="pyarrow", batch_size=None)
    out = hash_join(pos, base, on="layer", num_partitions=num_partitions)

    def _xy(b: pa.Table) -> pa.Table:
        g = b["grank"].to_numpy(zero_copy_only=False).astype(np.int64)
        bs = b["base"].to_numpy(zero_copy_only=False).astype(np.int64)
        ly = b["layer"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"vertex": b["vertex"],
                         "x": pa.array((g - bs).astype(np.float64) * hgap),
                         "y": pa.array(ly.astype(np.float64) * vgap)})

    return out.map_batches(_xy, batch_format="pyarrow", batch_size=None)


def _exclusive_cumsum(ds: ray.data.Dataset, sort_cols, val_col: str,
                      out_col: str = "csum") -> ray.data.Dataset:
    """Append the EXCLUSIVE prefix sum of ``val_col`` under ``sort_cols``
    order: sorted blocks, per-block totals to the driver (one int per
    block), per-row cumsum stamped in tasks — the _global_rank pattern
    generalized from counts to sums."""
    from igraph_ray.util import drop_empty_blocks

    s = drop_empty_blocks(ds).sort(sort_cols).materialize()
    refs = s.to_arrow_refs()

    @ray.remote
    def _tot(t: pa.Table) -> int:
        if t.num_rows == 0:
            return 0
        return int(t[val_col].to_numpy(zero_copy_only=False).sum())

    sizes = ray.get([_tot.remote(r) for r in refs])
    offsets = np.zeros(len(sizes), dtype=np.int64)
    np.cumsum(sizes[:-1], out=offsets[1:])

    @ray.remote
    def _stamp(t: pa.Table, off: int) -> pa.Table:
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ex = off + np.concatenate([[0], np.cumsum(v[:-1])])
        return t.append_column(out_col, pa.array(ex, pa.int64()))

    out = [_stamp.remote(r, int(off)) for r, off in zip(refs, offsets)]
    if not out:
        return s
    return ray.data.from_arrow_refs(out)


def layout_reingold_tilford(
    graph: Graph,
    num_partitions: int = 8,
    max_iter: int = 10_000,
) -> ray.data.Dataset:
    """Reingold–Tilford tree layout (igraph_layout_reingold_tilford,
    layout.c:1052): y = BFS depth below the component root, x centers
    every parent over its subtree's leaf span, sibling subtrees packed
    left-to-right in child-id order, trees of a forest side by side in
    root-id order. igraph's contract on general graphs — lay out the
    BFS tree — is reproduced: father(v) = min neighbor at depth−1.

    Distributed shape (the two-sweep plan):

    1. roots: one per component (the component's min vertex id), seeded
       straight from the min-label components state — no root list on
       the driver;
    2. depth: one multi-root BFS (single aligned min-plus column);
    3. father table: join depth onto the symmetrized edges, keep
       du = dv − 1, min father per child;
    4. UP sweep (aligned, sum-gather over child→father CSR):
       leafcnt(v) = 1 for leaves else Σ leafcnt(children) — converges
       in tree-height supersteps;
    5. sibling prefix sums per father (grouped cumsum in child order)
       and root offsets (exclusive cumsum of per-tree leaf counts in
       root order — trees never overlap);
    6. DOWN sweep (aligned, copy-gather over father→child CSR):
       offset(v) = offset(father) + presum(v) — converges in
       tree-depth supersteps.

    x = offset + (leafcnt − 1)/2, y = depth. All-integer internally
    (x doubled), so positions hash exactly. Depth/height-bounded
    superstep counts are the documented contract (same family as the
    Sugiyama layering)."""
    from igraph_ray import aligned as al
    from igraph_ray.algorithms.components import connected_components
    from igraph_ray.algorithms.paths import multi_root_hops
    from igraph_ray.csr import block_local, block_width, fetch_block

    comp = connected_components(graph, num_partitions=num_partitions,
                                densify=False).state.materialize()

    def _seed(b: pa.Table) -> pa.Table:
        v = b["vertex"].to_numpy(zero_copy_only=False)
        lab = b["label"].to_numpy(zero_copy_only=False)
        return pa.table({"vertex": b["vertex"],
                         "seed": pa.array((v == lab).astype(np.int64))})

    seeds = comp.map_batches(_seed, batch_format="pyarrow", batch_size=None)
    depth = multi_root_hops(graph, seeds, num_partitions=num_partitions,
                            max_iter=max_iter).materialize()

    # 3. father(v) = min neighbor u with depth(u) = depth(v) - 1
    sym = graph.symmetrized()
    du = depth.map_batches(
        lambda b: pa.table({"src": b["vertex"], "du": b["dist"]}),
        batch_format="pyarrow", batch_size=None)
    dv = depth.map_batches(
        lambda b: pa.table({"dst": b["vertex"], "dv": b["dist"]}),
        batch_format="pyarrow", batch_size=None)
    e = hash_join(hash_join(sym, du, on="src",
                            num_partitions=num_partitions),
                  dv, on="dst", num_partitions=num_partitions)

    def _cand(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"child": pa.array([], pa.int64()),
                             "father": pa.array([], pa.int64())})
        duv = b["du"].to_numpy(zero_copy_only=False)
        dvv = b["dv"].to_numpy(zero_copy_only=False)
        keep = duv == dvv - 1
        return pa.table({"child": pc.array_filter(b["dst"], pa.array(keep)),
                         "father": pc.array_filter(b["src"], pa.array(keep))})

    fathers = e.map_batches(_cand, batch_format="pyarrow",
                            batch_size=None).groupby("child") \
        .min("father").map_batches(
            lambda b: (pa.table({"child": b["child"],
                                 "father": b["min(father)"]})
                       if b.num_rows else
                       pa.table({"child": pa.array([], pa.int64()),
                                 "father": pa.array([], pa.int64())})),
            batch_format="pyarrow", batch_size=None).materialize()

    # 4. UP sweep: leafcnt over the child->father graph
    def _as_edges(cf: str, ff: str):
        def _m(b: pa.Table) -> pa.Table:
            return pa.table({"src": b[cf], "dst": b[ff]})
        return _m

    gf_up = Graph(fathers.map_batches(_as_edges("child", "father"),
                                      batch_format="pyarrow",
                                      batch_size=None).materialize(),
                  n=None)
    csr_up = gf_up.csr_index("out", num_partitions)
    blocks_up = csr_up.block_descriptors()

    def _init_cnt(sd: dict) -> dict:
        return {"vertex": sd["vertex"],
                "cnt": np.ones(len(sd["vertex"]), dtype=np.float64)}

    state = al.state_from_dataset(gf_up.vertices(),
                                  [int(b) for b in csr_up.boundaries],
                                  init_fn=_init_cnt)

    def gather_up(sb, csr_desc, starts, scalars):
        verts = sb["vertex"]
        cnt = sb["cnt"]
        nb = len(starts)
        segs = [[] for _ in range(nb)]
        msg_count = 0
        if len(verts) == 0:
            return [tuple(s) for s in segs], 0
        vmin, vmax = verts.min(), verts.max()
        for (vlo, vhi, ref) in csr_desc:
            if vhi < vmin or vlo > vmax:
                continue
            sel = (verts >= vlo) & (verts <= vhi)
            if not sel.any():
                continue
            blk = fetch_block(ref)
            # absent-from-this-block children contribute 0 here; their
            # own block's gather carries them (sum identity, not inf)
            contrib = np.zeros(block_width(blk), dtype=np.float64)
            loc = block_local(blk, verts[sel])
            pres = loc >= 0
            contrib[loc[pres]] = cnt[sel][pres]
            if len(blk["in_starts"]) == 0:
                continue
            vals = contrib[blk["in_src"]]
            sums = np.add.reduceat(vals, blk["in_starts"])
            dsts = blk["in_dst"]
            msg_count += len(dsts)
            bounds = np.searchsorted(dsts, starts[1:])
            lo = 0
            for r, hi in enumerate(list(bounds) + [len(dsts)]):
                if hi > lo:
                    segs[r].append((dsts[lo:hi], sums[lo:hi]))
                lo = hi
        return [tuple(s) for s in segs], msg_count

    def apply_up(old, segments, scalars):
        vertex = old["vertex"]
        acc = np.zeros(len(vertex), dtype=np.float64)
        for pairs in segments:
            for (sd, sm) in pairs:
                if not len(sd):
                    continue
                pos = np.searchsorted(vertex, sd)
                np.add.at(acc, pos, sm)
        # leafcnt >= 1 always, so any child present => acc > 0;
        # vertices with no children are leaves (cnt = 1)
        new = np.where(acc > 0, acc, 1.0)
        changed = float((new != old["cnt"]).sum())
        return {"vertex": vertex, "cnt": new}, {"changed": changed}

    res_up = al.run_aligned_loop(
        state=state, csr_descriptors=blocks_up,
        gather_fn=gather_up, apply_fn=apply_up,
        scalars={"changed": 1.0},
        make_scalars=lambda s, it: {"changed": s.get("changed", 0.0)},
        converged=lambda s, it: s.get("changed", 1.0) == 0.0,
        max_iter=max_iter, state_columns=["vertex", "cnt"])
    cnt = res_up.state.map_batches(
        lambda b: pa.table({"vertex": b["vertex"],
                            "cnt": pc.cast(pc.round(b["cnt"]), pa.int64())}),
        batch_format="pyarrow", batch_size=None).materialize()

    # 5a. sibling prefix sums: exclusive cumsum of leafcnt in child-id
    # order within each father
    fc = hash_join(fathers, cnt.map_batches(
        lambda b: pa.table({"child": b["vertex"], "ccnt": b["cnt"]}),
        batch_format="pyarrow", batch_size=None), on="child",
        num_partitions=num_partitions)

    def _presum_group(df):
        df = df.sort_values("child")
        c = df["ccnt"].to_numpy()
        df["presum"] = np.concatenate([[0], np.cumsum(c[:-1])])
        return df[["child", "presum"]]

    presum = fc.groupby("father").map_groups(
        _presum_group, batch_format="pandas").materialize()

    # 5b. root offsets: exclusive cumsum of per-tree leaf counts
    roots = comp.map_batches(
        lambda b: pa.table({"vertex": pc.array_filter(
            b["vertex"], pc.equal(b["vertex"], b["label"]))}),
        batch_format="pyarrow", batch_size=None)
    rc = hash_join(roots, cnt, on="vertex", num_partitions=num_partitions,
                   join_type="left_outer")
    rc = rc.map_batches(
        lambda b: pa.table({"vertex": b["vertex"],
                            "cnt": pc.fill_null(b["cnt"], 1)}),
        batch_format="pyarrow", batch_size=None)
    roff = _exclusive_cumsum(rc, ["vertex"], "cnt", "off0").materialize()

    # 6. DOWN sweep: offset(v) = offset(father) + presum(v)
    gf_dn = Graph(fathers.map_batches(_as_edges("father", "child"),
                                      batch_format="pyarrow",
                                      batch_size=None).materialize(),
                  n=None)
    csr_dn = gf_dn.csr_index("out", num_partitions)
    blocks_dn = csr_dn.block_descriptors()

    init_ds = hash_join(gf_dn.vertices(), presum.map_batches(
        lambda b: (pa.table({"vertex": pa.array(
            b["child"].to_numpy(zero_copy_only=False), pa.int64()),
            "presum": pa.array(
                b["presum"].to_numpy(zero_copy_only=False), pa.int64())})
            if b.num_rows else
            pa.table({"vertex": pa.array([], pa.int64()),
                      "presum": pa.array([], pa.int64())})),
        batch_format="pyarrow", batch_size=None), on="vertex",
        num_partitions=num_partitions, join_type="left_outer")
    init_ds = hash_join(init_ds, roff.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "off0": b["off0"]}),
        batch_format="pyarrow", batch_size=None), on="vertex",
        num_partitions=num_partitions, join_type="left_outer")

    def _init_off(sd: dict) -> dict:
        pre = np.nan_to_num(sd["presum"].astype(np.float64), nan=0.0)
        off0 = np.nan_to_num(sd["off0"].astype(np.float64), nan=0.0)
        return {"vertex": sd["vertex"], "presum": pre, "off": off0}

    state_dn = al.state_from_dataset(init_ds,
                                     [int(b) for b in csr_dn.boundaries],
                                     init_fn=_init_off)

    def gather_dn(sb, csr_desc, starts, scalars):
        verts = sb["vertex"]
        off = sb["off"]
        nb = len(starts)
        segs = [[] for _ in range(nb)]
        msg_count = 0
        if len(verts) == 0:
            return [tuple(s) for s in segs], 0
        vmin, vmax = verts.min(), verts.max()
        for (vlo, vhi, ref) in csr_desc:
            if vhi < vmin or vlo > vmax:
                continue
            sel = (verts >= vlo) & (verts <= vhi)
            if not sel.any():
                continue
            blk = fetch_block(ref)
            contrib = np.full(block_width(blk), np.inf)
            loc = block_local(blk, verts[sel])
            pres = loc >= 0
            contrib[loc[pres]] = off[sel][pres]
            if len(blk["in_starts"]) == 0:
                continue
            vals = contrib[blk["in_src"]]
            mins = np.minimum.reduceat(vals, blk["in_starts"])
            dsts = blk["in_dst"]
            msg_count += len(dsts)
            bounds = np.searchsorted(dsts, starts[1:])
            lo = 0
            for r, hi in enumerate(list(bounds) + [len(dsts)]):
                if hi > lo:
                    segs[r].append((dsts[lo:hi], mins[lo:hi]))
                lo = hi
        return [tuple(s) for s in segs], msg_count

    def apply_dn(old, segments, scalars):
        vertex = old["vertex"]
        msg = np.full(len(vertex), np.inf)
        for pairs in segments:
            for (sd, sm) in pairs:
                if not len(sd):
                    continue
                pos = np.searchsorted(vertex, sd)
                np.minimum.at(msg, pos, sm)
        # exactly one father per child => the min IS the father's offset
        new = np.where(np.isfinite(msg), msg + old["presum"], old["off"])
        changed = float((new != old["off"]).sum())
        return ({"vertex": vertex, "presum": old["presum"], "off": new},
                {"changed": changed})

    res_dn = al.run_aligned_loop(
        state=state_dn, csr_descriptors=blocks_dn,
        gather_fn=gather_dn, apply_fn=apply_dn,
        scalars={"changed": 1.0},
        make_scalars=lambda s, it: {"changed": s.get("changed", 0.0)},
        converged=lambda s, it: s.get("changed", 1.0) == 0.0,
        max_iter=max_iter, state_columns=["vertex", "presum", "off"])
    off = res_dn.state.map_batches(
        lambda b: pa.table({"vertex": b["vertex"],
                            "off": pc.cast(pc.round(b["off"]), pa.int64())}),
        batch_format="pyarrow", batch_size=None)

    # 7. assemble x = off + (cnt-1)/2, y = depth over the full universe
    pos = hash_join(depth.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "y": b["dist"]}),
        batch_format="pyarrow", batch_size=None), cnt, on="vertex",
        num_partitions=num_partitions, join_type="left_outer")
    pos = hash_join(pos, off, on="vertex",
                    num_partitions=num_partitions, join_type="left_outer")
    pos = hash_join(pos, roff.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "off0": b["off0"]}),
        batch_format="pyarrow", batch_size=None), on="vertex",
        num_partitions=num_partitions, join_type="left_outer")

    def _xy(b: pa.Table) -> pa.Table:
        c = pc.fill_null(b["cnt"], 1).to_numpy(zero_copy_only=False)
        o = b["off"].to_numpy(zero_copy_only=False).astype(np.float64)
        o0 = pc.fill_null(b["off0"], 0).to_numpy(
            zero_copy_only=False).astype(np.float64)
        # isolated roots never enter the father graph: their offset is
        # the root prefix directly
        ov = np.where(np.isnan(o), o0, o)
        return pa.table({
            "vertex": b["vertex"],
            "x": pa.array(ov + (c - 1) / 2.0, pa.float64()),
            "y": pa.array(b["y"].to_numpy(
                zero_copy_only=False).astype(np.float64)),
        })

    return pos.map_batches(_xy, batch_format="pyarrow", batch_size=None)


def _force_directed(
    graph: Graph,
    n: int,
    iterations: int,
    num_partitions: int,
    att_mul,
    rep_mul,
    temp_fn,
    k: float,
) -> ray.data.Dataset:
    """Shared force-directed engine behind graphopt and DRL: per
    iteration, grid-cell centroid repulsion (the DRL density-grid
    idea — O(#cells) broadcast table, no all-pairs) + per-edge
    attraction through two hash joins, displacement capped by
    ``temp_fn(it, iterations)``. ``att_mul(d, it)`` and ``rep_mul(d2,
    cnt, it)`` return the multiplier applied to the raw Δ vector (the
    iteration argument lets DRL vary the force law per annealing
    phase). Same md5-deterministic init and unit-square clamp as
    layout_fruchterman_reingold."""
    cell = min(2.0 * k, 0.25)
    ncell = max(1, int(np.ceil(1.0 / cell)))
    und = graph.canonical_undirected().materialize()

    def _init(b: pa.Table) -> pa.Table:
        v = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _md5_unit([f"x:{i}" for i in v.tolist()])
        y = _md5_unit([f"y:{i}" for i in v.tolist()])
        return pa.table({"vertex": pa.array(v), "x": pa.array(x),
                         "y": pa.array(y)})

    pos = ray.data.range(n).map_batches(
        _init, batch_format="pyarrow", batch_size=None).materialize()

    for it in range(iterations):
        temp = temp_fn(it, iterations)

        def _cells(b: pa.Table) -> pa.Table:
            x = b["x"].to_numpy(zero_copy_only=False)
            y = b["y"].to_numpy(zero_copy_only=False)
            cx = np.clip((x / cell).astype(np.int64), 0, ncell - 1)
            cy = np.clip((y / cell).astype(np.int64), 0, ncell - 1)
            cid = cx * ncell + cy
            t = pa.table({"cid": pa.array(cid), "x": b["x"], "y": b["y"],
                          "cnt": pa.array(np.ones(len(x)))})
            return t.group_by("cid").aggregate(
                [("x", "sum"), ("y", "sum"), ("cnt", "sum")])

        cells = (pos.map_batches(_cells, batch_format="pyarrow",
                                 batch_size=None)
                 .groupby("cid").sum(["x_sum", "y_sum", "cnt_sum"]))
        cells_ref = _concat_tables.remote(cells.to_arrow_refs())

        ps = pos.map_batches(lambda b: pa.table(
            {"lo": b["vertex"], "xs": b["x"], "ys": b["y"]}),
            batch_format="pyarrow", batch_size=None)
        pd_ = pos.map_batches(lambda b: pa.table(
            {"hi": b["vertex"], "xd": b["x"], "yd": b["y"]}),
            batch_format="pyarrow", batch_size=None)
        j = hash_join(und, ps, on="lo", num_partitions=num_partitions)
        j = hash_join(j, pd_, on="hi", num_partitions=num_partitions)

        def _att(b: pa.Table, it=it) -> pa.Table:
            dx = b["xd"].to_numpy(zero_copy_only=False) - \
                b["xs"].to_numpy(zero_copy_only=False)
            dy = b["yd"].to_numpy(zero_copy_only=False) - \
                b["ys"].to_numpy(zero_copy_only=False)
            d = np.sqrt(dx * dx + dy * dy) + 1e-9
            f = att_mul(d, it)
            lo = b["lo"].to_numpy(zero_copy_only=False)
            hi = b["hi"].to_numpy(zero_copy_only=False)
            t = pa.table({
                "vertex": pa.array(np.concatenate([lo, hi])),
                "fx": pa.array(np.concatenate([dx * f, -dx * f])),
                "fy": pa.array(np.concatenate([dy * f, -dy * f])),
            })
            return t.group_by("vertex").aggregate(
                [("fx", "sum"), ("fy", "sum")])

        att = (j.map_batches(_att, batch_format="pyarrow",
                             batch_size=None)
               .groupby("vertex").sum(["fx_sum", "fy_sum"])
               .materialize())

        def _move(b: pa.Table, temp=temp, it=it) -> pa.Table:
            ct = ray.get(cells_ref)
            ccnt = ct["sum(cnt_sum)"].to_numpy(zero_copy_only=False)
            ccx = (ct["sum(x_sum)"].to_numpy(zero_copy_only=False)
                   / np.maximum(ccnt, 1.0))
            ccy = (ct["sum(y_sum)"].to_numpy(zero_copy_only=False)
                   / np.maximum(ccnt, 1.0))
            x = b["x"].to_numpy(zero_copy_only=False).copy()
            y = b["y"].to_numpy(zero_copy_only=False).copy()
            dx = x[:, None] - ccx[None, :]
            dy = y[:, None] - ccy[None, :]
            d2 = dx * dx + dy * dy + 1e-12
            f = rep_mul(d2, ccnt[None, :], it)
            fx = (dx * f).sum(axis=1)
            fy = (dy * f).sum(axis=1)
            if "sum(fx_sum)" in b.column_names:
                fx += np.nan_to_num(b["sum(fx_sum)"].to_numpy(
                    zero_copy_only=False).astype(np.float64))
                fy += np.nan_to_num(b["sum(fy_sum)"].to_numpy(
                    zero_copy_only=False).astype(np.float64))
            norm = np.sqrt(fx * fx + fy * fy) + 1e-12
            step = np.minimum(norm, temp)
            x = np.clip(x + fx / norm * step, 0.0, 1.0)
            y = np.clip(y + fy / norm * step, 0.0, 1.0)
            return pa.table({"vertex": b["vertex"], "x": pa.array(x),
                             "y": pa.array(y)})

        pos = (hash_join(pos, att, on="vertex",
                         num_partitions=num_partitions,
                         join_type="left_outer")
               .map_batches(_move, batch_format="pyarrow",
                            batch_size=None)
               .repartition(num_partitions).materialize())
    return pos


def layout_graphopt(
    graph: Graph,
    iterations: int = 12,
    n: Optional[int] = None,
    num_partitions: int = 8,
    node_charge: float = 0.001,
    spring_length: float = 0.0,
    spring_constant: float = 1.0,
) -> ray.data.Dataset:
    """graphopt layout (igraph_layout_graphopt, layout.c graphopt port
    semantics): electrical repulsion node_charge²/d² between vertices
    and a linear spring of natural length ``spring_length`` and
    stiffness ``spring_constant`` along edges, displacement cooled
    linearly. Grid-cell approximated repulsion (count-weighted
    centroids) like the FR engine; unit-square coordinates, md5 init."""
    n = n if n is not None else graph.num_vertices()
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "vertex": pa.array([], pa.int64()),
            "x": pa.array([], pa.float64()),
            "y": pa.array([], pa.float64())}))
    k = float(np.sqrt(1.0 / n))
    q2 = node_charge * node_charge

    # spring: magnitude k_s(d - L) along the unit vector => Δ multiplier
    # k_s(1 - L/d); charge: q² / d² along the unit vector => Δ·q²/d³
    return _force_directed(
        graph, n, iterations, num_partitions,
        att_mul=lambda d, it: spring_constant * (
            1.0 - spring_length / np.maximum(d, 1e-9)),
        rep_mul=lambda d2, cnt, it: q2 / (d2 * np.sqrt(d2)) * cnt,
        temp_fn=lambda it, iters: 0.1 * (1.0 - it / iters),
        k=k)


# DRL default phase schedule (src/drl/DensityGrid + graph.cpp phase
# table, the "default" preset): fraction of iterations, temperature
# scale, attraction multiplier
_DRL_PHASES = [
    (0.25, 2.000, 1.0),   # liquid
    (0.25, 2.000, 2.0),   # expansion
    (0.25, 0.250, 1.0),   # cooldown
    (0.10, 0.100, 1.0),   # crunch
    (0.15, 0.050, 0.5),   # simmer
]


def layout_drl(
    graph: Graph,
    iterations: int = 20,
    n: Optional[int] = None,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """DRL layout (igraph_layout_drl, src/drl/): force-directed with a
    DENSITY-GRID repulsion field and a staged annealing schedule
    (liquid → expansion → cooldown → crunch → simmer, the default
    preset's temperature/attraction multipliers). The engine's
    grid-cell centroid repulsion IS DRL's density-grid idea, so the
    distributed shape matches the reference's design rather than
    emulating its sequential loop. md5-deterministic init,
    unit-square output."""
    n = n if n is not None else graph.num_vertices()
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "vertex": pa.array([], pa.int64()),
            "x": pa.array([], pa.float64()),
            "y": pa.array([], pa.float64())}))
    k = float(np.sqrt(1.0 / n))

    # map iteration -> phase parameters by cumulative fraction
    bounds = np.cumsum([f for f, _, _ in _DRL_PHASES])

    def _phase(it, iters):
        frac = (it + 0.5) / iters
        idx = int(np.searchsorted(bounds, frac))
        return _DRL_PHASES[min(idx, len(_DRL_PHASES) - 1)]

    def temp_fn(it, iters):
        _, tscale, _ = _phase(it, iters)
        return 0.075 * tscale * (1.0 - 0.5 * it / iters)

    def att_mul(d, it):
        # FR-style |Δ|²/k attraction scaled by the phase multiplier
        _, _, amul = _phase(it, iterations)
        return amul * d / k

    return _force_directed(
        graph, n, iterations, num_partitions,
        att_mul=att_mul,
        rep_mul=lambda d2, cnt, it: k * k / d2 * cnt,
        temp_fn=temp_fn,
        k=k)


def layout_mds(
    graph: Graph,
    dim: int = 2,
    num_landmarks: int = 64,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """MDS layout (igraph_layout_mds, layout.c MDS over the
    shortest-path distance matrix) in the Landmark-MDS formulation
    (de Silva & Tenenbaum, NIPS 2004 — the published out-of-sample
    extension of classical MDS): BFS hop distances from L landmarks
    (one K-column sweep), classical MDS on the L×L landmark matrix
    (driver-side L² doubles only), then every vertex is placed by the
    pseudo-inverse projection of its landmark-distance vector inside
    map_batches. Reproduces classical MDS exactly when the landmarks
    span the point set; the full n×n matrix never materializes — at
    igraph's own all-pairs semantics L = n on small graphs. Landmarks
    are the md5-smallest vertices (parallelism-invariant choice);
    disconnected pairs take d = n like the KK fallback."""
    import hashlib

    n = graph.num_vertices()
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "vertex": pa.array([], pa.int64()),
            "x": pa.array([], pa.float64()),
            "y": pa.array([], pa.float64())}))
    L = int(min(num_landmarks, n))

    def _rank(b: pa.Table) -> pa.Table:
        v = b["vertex"].to_numpy(zero_copy_only=False)
        h = [hashlib.md5(f"mds:{i}".encode()).hexdigest()[:12]
             for i in v.tolist()]
        return pa.table({"vertex": pa.array(v),
                         "h": pa.array(h, pa.string())})

    lm_rows = graph.vertices().map_batches(
        _rank, batch_format="pyarrow", batch_size=None) \
        .sort("h").limit(L).take_all()
    landmarks = sorted(int(r["vertex"]) for r in lm_rows)
    col_of = {v: i for i, v in enumerate(landmarks)}

    from igraph_ray.algorithms.paths import multi_source_hops

    longd = multi_source_hops(graph, landmarks,
                              num_partitions=num_partitions,
                              chunk=min(L, 128),
                              variant="sym").materialize()

    # landmark×landmark matrix: L² rows to the driver (small by design)
    dmat = np.full((L, L), float(n), dtype=np.float64)
    np.fill_diagonal(dmat, 0.0)
    # filter landmark rows distributed, then pull just L² of them
    lm_arr = np.asarray(landmarks, dtype=np.int64)

    def _lm_only(b: pa.Table) -> pa.Table:
        v = b["vertex"].to_numpy(zero_copy_only=False)
        keep = np.isin(v, lm_arr)
        return pa.table({"source": pc.array_filter(b["source"],
                                                   pa.array(keep)),
                         "vertex": pa.array(v[keep]),
                         "dist": pc.array_filter(b["dist"],
                                                 pa.array(keep))})

    for r in longd.map_batches(_lm_only, batch_format="pyarrow",
                               batch_size=None).take_all():
        dmat[col_of[int(r["source"])], col_of[int(r["vertex"])]] = \
            float(r["dist"])

    # classical MDS on the landmark matrix
    d2 = dmat * dmat
    J = np.eye(L) - np.ones((L, L)) / L
    B = -0.5 * J @ d2 @ J
    w, V = np.linalg.eigh(B)
    order = np.argsort(w)[::-1][:dim]
    lam = np.maximum(w[order], 0.0)
    # a dimension with negligible spectrum (e.g. dim 2 of a path graph)
    # carries no geometry — its 1/sqrt(lam) projection row would be
    # noise amplified by ~1/eps, so it collapses to coordinate 0
    good = lam > 1e-9 * max(lam.max(), 1e-30)
    s = np.where(good, np.sqrt(np.maximum(lam, 1e-30)), np.inf)
    # de Silva–Tenenbaum projection: x = -0.5 · Lk# · (δ² - mean column)
    pinv = (V[:, order] / s[None, :]).T                # dim×L
    mu = d2.mean(axis=0)

    mu_ref = ray.put((pinv, mu, lm_arr, float(n)))

    # pivot the long distances per vertex and project — boundary-aligned
    # sort keeps each vertex's L rows in one block
    from igraph_ray.csr import compute_boundaries

    bnds = compute_boundaries(longd, num_partitions, col="vertex")
    sorted_d = (longd.sort("vertex", boundaries=[int(x) for x in bnds])
                if bnds else longd.repartition(1).sort("vertex"))

    def _place(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "x": pa.array([], pa.float64()),
                             "y": pa.array([], pa.float64())})
        pinv_, mu_, lms, fallback = ray.get(mu_ref)
        v = b["vertex"].to_numpy(zero_copy_only=False)
        s = b["source"].to_numpy(zero_copy_only=False)
        d = b["dist"].to_numpy(zero_copy_only=False).astype(np.float64)
        uv, inv = np.unique(v, return_inverse=True)
        cols = np.searchsorted(lms, s)
        delta2 = np.full((len(uv), len(lms)), fallback * fallback)
        delta2[inv, cols] = d * d
        X = -0.5 * (pinv_ @ (delta2 - mu_[None, :]).T).T
        return pa.table({"vertex": pa.array(uv, pa.int64()),
                         "x": pa.array(X[:, 0], pa.float64()),
                         "y": pa.array(X[:, 1] if X.shape[1] > 1
                                       else np.zeros(len(uv)),
                                       pa.float64())})

    placed = sorted_d.map_batches(_place, batch_format="pyarrow",
                                  batch_size=None)

    # vertices in landmark-free components never appear in the distance
    # stream — they all sit at the fallback-vector projection (constant,
    # computed once from the all-d=n delta row)
    fb2 = np.full(L, float(n) * float(n))
    xfb = -0.5 * (pinv @ (fb2 - mu))
    pos_all = hash_join(
        graph.vertices(), placed, on="vertex",
        num_partitions=num_partitions, join_type="left_outer")

    def _fill(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "x": pa.array([], pa.float64()),
                             "y": pa.array([], pa.float64())})
        if "x" not in b.column_names:
            nn = b.num_rows
            return pa.table({"vertex": b["vertex"],
                             "x": pa.array(np.full(nn, xfb[0])),
                             "y": pa.array(np.full(
                                 nn, xfb[1] if len(xfb) > 1 else 0.0))})
        x = b["x"].to_numpy(zero_copy_only=False)
        y = b["y"].to_numpy(zero_copy_only=False)
        return pa.table({
            "vertex": b["vertex"],
            "x": pa.array(np.where(np.isnan(x), xfb[0], x)),
            "y": pa.array(np.where(
                np.isnan(y), xfb[1] if len(xfb) > 1 else 0.0, y)),
        })

    return pos_all.map_batches(_fill, batch_format="pyarrow",
                               batch_size=None)


def layout_random(n: int, seed: int = 7, dims: int = 2) -> ray.data.Dataset:
    """igraph_layout_random / _3d (layout.c:76,110): every coordinate
    uniform on [-1, 1]. Engine contract: indexed md5 draws
    (seed:r{axis}:v → 12-hex fold / 16^12), embarrassingly parallel
    and SQL-replayable."""
    axes = "xyz"[:dims]

    def _f(b: pa.Table) -> pa.Table:
        v = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = {"vertex": pa.array(v)}
        for ax in axes:
            u = _md5_unit([f"{seed}:r{ax}:{int(i)}" for i in v])
            out[ax] = pa.array(2.0 * u - 1.0, pa.float64())
        return pa.table(out)

    return ray.data.range(n).map_batches(_f, batch_format="pyarrow",
                                         batch_size=None)


def layout_grid_3d(n: int, width: int = 0, height: int = 0
                   ) -> ray.data.Dataset:
    """igraph_layout_grid_3d (layout.c:339): row-major integer lattice,
    x = i % w, y = (i // w) % h, z = i // (w·h); default w = h =
    ceil(n^(1/3))."""
    w = width if width > 0 else int(np.ceil(n ** (1.0 / 3.0)))
    h = height if height > 0 else w

    def _f(b: pa.Table) -> pa.Table:
        v = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"vertex": pa.array(v),
                         "x": pa.array((v % w).astype(np.float64)),
                         "y": pa.array(((v // w) % h).astype(np.float64)),
                         "z": pa.array((v // (w * h)).astype(np.float64))})

    return ray.data.range(n).map_batches(_f, batch_format="pyarrow",
                                         batch_size=None)


def layout_sphere(n: int) -> ray.data.Dataset:
    """igraph_layout_sphere (layout.c:246): the spherical spiral —
    theta_i = acos(-1 + 2i/(n-1)), phi advances by 3.6/sqrt(n(1-h²))
    per step; poles pinned (row 0: theta=π, row n-1: theta=0, phi=0).
    Engine deviation (documented): the phi increments are e6-quantized
    BEFORE summation, so the prefix sum is an exact integer — any task
    recomputes it for its id range independently of partitioning
    (the reference's running fmod changes only ulps; the quantized φ
    is within 1e-6 of it). O(max_id) vectorized work per block —
    layouts are for visualizable graphs; fine by construction."""
    if n < 1:
        return ray.data.from_arrow(pa.table(
            {"vertex": pa.array([], pa.int64()),
             "x": pa.array([], pa.float64()),
             "y": pa.array([], pa.float64()),
             "z": pa.array([], pa.float64())}))

    def _f(b: pa.Table) -> pa.Table:
        v = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = int(v.max()) if len(v) else 0
        j = np.arange(1, max(hi, 1) + 1, dtype=np.float64)
        hh = -1.0 + 2.0 * j / (n - 1) if n > 1 else np.zeros_like(j)
        with np.errstate(divide="ignore", invalid="ignore"):
            inc = 3.6 / np.sqrt(n * (1.0 - hh * hh))
        inc_e6 = np.round(inc * 1e6)
        inc_e6[~np.isfinite(inc_e6)] = 0.0
        pe = np.concatenate([[0.0], np.cumsum(inc_e6)])  # index by i
        h_of = np.where(v == 0, -1.0,
                        np.where(v == n - 1, 1.0,
                                 -1.0 + 2.0 * v / (n - 1) if n > 1 else 0.0))
        theta = np.arccos(np.clip(h_of, -1.0, 1.0))
        theta = np.where(v == 0, np.pi, np.where(v == n - 1, 0.0, theta))
        phi = np.where((v == 0) | (v == n - 1), 0.0, pe[v] / 1e6)
        x = np.cos(phi) * np.sin(theta)
        y = np.sin(phi) * np.sin(theta)
        z = np.cos(theta)
        return pa.table({"vertex": pa.array(v),
                         "x": pa.array(x, pa.float64()),
                         "y": pa.array(y, pa.float64()),
                         "z": pa.array(z, pa.float64())})

    return ray.data.range(n).map_batches(_f, batch_format="pyarrow",
                                         batch_size=None)


def layout_reingold_tilford_circular(
    graph: Graph, num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """igraph_layout_reingold_tilford_circular (layout.c:1226): the RT
    layout mapped to polar coordinates — phi = (x - minx) ·
    (2π(n-1)/n) / (maxx - minx), r = the RT depth, output
    (r·cosφ, r·sinφ). The RT pass and the min/max are streaming; only
    the two scalars reach the driver."""
    from ray.data.aggregate import Count, Max, Min

    pos = layout_reingold_tilford(graph, num_partitions=num_partitions) \
        .materialize()
    stats = pos.aggregate(Min("x"), Max("x"), Count())
    minx = float(stats["min(x)"])
    maxx = float(stats["max(x)"])
    nn = int(stats["count()"])
    if nn == 0:
        return pos
    span = maxx - minx
    ratio = (2.0 * np.pi * (nn - 1.0) / nn) / span if span > 0 else 0.0

    def _f(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        r = b["y"].to_numpy(zero_copy_only=False)
        phi = (x - minx) * ratio
        return pa.table({"vertex": b["vertex"],
                         "x": pa.array(r * np.cos(phi), pa.float64()),
                         "y": pa.array(r * np.sin(phi), pa.float64())})

    return pos.map_batches(_f, batch_format="pyarrow", batch_size=None)


# ------------------------------------------------ N-dimensional engine

_AXES = ("x", "y", "z")


def _force_directed_nd(
    graph: Graph,
    n: int,
    iterations: int,
    num_partitions: int,
    att_mul,
    rep_mul,
    temp_fn,
    k: float,
    dims: int = 3,
    gravity: float = 0.0,
) -> ray.data.Dataset:
    """Dimension-generic variant of :func:`_force_directed` (2 or 3
    dims): same grid-cell centroid repulsion (the DRL density grid in
    d dimensions), per-edge attraction via two hash joins, optional
    GEM-style gravitation toward the global centroid (``gravity`` ×
    temp per iteration). Unit-cube coordinates, md5 init."""
    axes = _AXES[:dims]
    cell = min(2.0 * k, 0.25)
    ncell = max(1, int(np.ceil(1.0 / cell)))
    und = graph.canonical_undirected().materialize()

    def _init(b: pa.Table) -> pa.Table:
        v = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {"vertex": pa.array(v)}
        for a in axes:
            cols[a] = pa.array(_md5_unit([f"{a}:{i}" for i in v.tolist()]))
        return pa.table(cols)

    pos = ray.data.range(n).map_batches(
        _init, batch_format="pyarrow", batch_size=None).materialize()

    for it in range(iterations):
        temp = temp_fn(it, iterations)

        def _cells(b: pa.Table) -> pa.Table:
            cid = np.zeros(b.num_rows, np.int64)
            cols = {}
            for a in axes:
                v = b[a].to_numpy(zero_copy_only=False)
                cid = cid * ncell + np.clip(
                    (v / cell).astype(np.int64), 0, ncell - 1)
                cols[a] = b[a]
            t = pa.table({"cid": pa.array(cid), **cols,
                          "cnt": pa.array(np.ones(b.num_rows))})
            return t.group_by("cid").aggregate(
                [(a, "sum") for a in axes] + [("cnt", "sum")])

        cells = (pos.map_batches(_cells, batch_format="pyarrow",
                                 batch_size=None)
                 .groupby("cid").sum([f"{a}_sum" for a in axes]
                                     + ["cnt_sum"]))
        cells_ref = _concat_tables.remote(cells.to_arrow_refs())

        ps = pos.map_batches(lambda b: pa.table(
            {"lo": b["vertex"], **{f"{a}s": b[a] for a in axes}}),
            batch_format="pyarrow", batch_size=None)
        pd_ = pos.map_batches(lambda b: pa.table(
            {"hi": b["vertex"], **{f"{a}d": b[a] for a in axes}}),
            batch_format="pyarrow", batch_size=None)
        j = hash_join(und, ps, on="lo", num_partitions=num_partitions)
        j = hash_join(j, pd_, on="hi", num_partitions=num_partitions)

        def _att(b: pa.Table, it=it) -> pa.Table:
            dv = [b[f"{a}d"].to_numpy(zero_copy_only=False)
                  - b[f"{a}s"].to_numpy(zero_copy_only=False)
                  for a in axes]
            d = np.sqrt(sum(x * x for x in dv)) + 1e-9
            f = att_mul(d, it)
            lo = b["lo"].to_numpy(zero_copy_only=False)
            hi = b["hi"].to_numpy(zero_copy_only=False)
            cols = {"vertex": pa.array(np.concatenate([lo, hi]))}
            for a, x in zip(axes, dv):
                cols[f"f{a}"] = pa.array(np.concatenate([x * f, -x * f]))
            t = pa.table(cols)
            return t.group_by("vertex").aggregate(
                [(f"f{a}", "sum") for a in axes])

        att = (j.map_batches(_att, batch_format="pyarrow",
                             batch_size=None)
               .groupby("vertex").sum([f"f{a}_sum" for a in axes])
               .materialize())

        def _move(b: pa.Table, temp=temp, it=it) -> pa.Table:
            ct = ray.get(cells_ref)
            ccnt = ct["sum(cnt_sum)"].to_numpy(zero_copy_only=False)
            cc = [ct[f"sum({a}_sum)"].to_numpy(zero_copy_only=False)
                  / np.maximum(ccnt, 1.0) for a in axes]
            x = [b[a].to_numpy(zero_copy_only=False).copy()
                 for a in axes]
            dd = [xi[:, None] - ci[None, :] for xi, ci in zip(x, cc)]
            d2 = sum(d * d for d in dd) + 1e-12
            f = rep_mul(d2, ccnt[None, :], it)
            fs = [(d * f).sum(axis=1) for d in dd]
            if f"sum(f{axes[0]}_sum)" in b.column_names:
                for i, a in enumerate(axes):
                    fs[i] += np.nan_to_num(
                        b[f"sum(f{a}_sum)"].to_numpy(
                            zero_copy_only=False).astype(np.float64))
            if gravity:
                total = ccnt.sum()
                gc = [(ci * ccnt).sum() / max(total, 1.0) for ci in cc]
                for i in range(len(axes)):
                    fs[i] += gravity * (gc[i] - x[i])
            norm = np.sqrt(sum(g * g for g in fs)) + 1e-12
            step = np.minimum(norm, temp)
            out = {"vertex": b["vertex"]}
            for a, xi, g in zip(axes, x, fs):
                out[a] = pa.array(np.clip(xi + g / norm * step, 0.0, 1.0))
            return pa.table(out)

        pos = (hash_join(pos, att, on="vertex",
                         num_partitions=num_partitions,
                         join_type="left_outer")
               .map_batches(_move, batch_format="pyarrow",
                            batch_size=None)
               .repartition(num_partitions).materialize())
    return pos


def layout_fruchterman_reingold_3d(
    graph: Graph,
    iterations: int = 10,
    n: Optional[int] = None,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """igraph_layout_fruchterman_reingold_3d (layout.c FR-3D): the FR
    force laws in the unit cube — (vertex, x, y, z)."""
    n = n if n is not None else graph.num_vertices()
    if n == 0:
        return ray.data.from_arrow(pa.table(
            {"vertex": pa.array([], pa.int64()),
             **{a: pa.array([], pa.float64()) for a in _AXES}}))
    k = float((1.0 / n) ** (1.0 / 3.0))
    return _force_directed_nd(
        graph, n, iterations, num_partitions,
        att_mul=lambda d, it: d / k,
        rep_mul=lambda d2, cnt, it: k * k / d2 * cnt,
        temp_fn=lambda it, iters: 0.15 * (1.0 - it / iters),
        k=k, dims=3)


def layout_drl_3d(
    graph: Graph,
    iterations: int = 20,
    n: Optional[int] = None,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """igraph_layout_drl_3d (src/drl_3d/): the DRL default annealing
    schedule over the 3-D density grid."""
    n = n if n is not None else graph.num_vertices()
    if n == 0:
        return ray.data.from_arrow(pa.table(
            {"vertex": pa.array([], pa.int64()),
             **{a: pa.array([], pa.float64()) for a in _AXES}}))
    k = float((1.0 / n) ** (1.0 / 3.0))
    bounds = np.cumsum([f for f, _, _ in _DRL_PHASES])

    def _phase(it, iters):
        frac = (it + 0.5) / iters
        idx = int(np.searchsorted(bounds, frac))
        return _DRL_PHASES[min(idx, len(_DRL_PHASES) - 1)]

    return _force_directed_nd(
        graph, n, iterations, num_partitions,
        att_mul=lambda d, it: _phase(it, iterations)[2] * d / k,
        rep_mul=lambda d2, cnt, it: k * k / d2 * cnt,
        temp_fn=lambda it, iters: 0.075 * _phase(it, iters)[1]
        * (1.0 - 0.5 * it / iters),
        k=k, dims=3)


def layout_gem(
    graph: Graph,
    iterations: int = 15,
    n: Optional[int] = None,
    num_partitions: int = 8,
    gravity: float = 0.0625,
) -> ray.data.Dataset:
    """GEM layout (igraph_layout_gem, layout.c; Frick, Ludwig & Mehldau
    1994): FR-style attraction/repulsion plus GEM's distinctive
    GRAVITATION term pulling every vertex toward the barycenter
    (Frick's Φ/16 default). The reference's per-vertex local
    temperatures and rotation/oscillation detection are replaced by
    the engine's global cooling schedule (documented deviation — the
    equilibrium shape is the same; rows-only + property pytest)."""
    n = n if n is not None else graph.num_vertices()
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "vertex": pa.array([], pa.int64()),
            "x": pa.array([], pa.float64()),
            "y": pa.array([], pa.float64())}))
    k = float(np.sqrt(1.0 / n))
    return _force_directed_nd(
        graph, n, iterations, num_partitions,
        att_mul=lambda d, it: d / k,
        rep_mul=lambda d2, cnt, it: k * k / d2 * cnt,
        temp_fn=lambda it, iters: 0.15 * (1.0 - it / iters),
        k=k, dims=2, gravity=gravity)


def layout_davidson_harel(
    graph: Graph,
    iterations: int = 16,
    n: Optional[int] = None,
    num_partitions: int = 8,
    fine_tune_fraction: float = 0.25,
) -> ray.data.Dataset:
    """Davidson–Harel layout (igraph_layout_davidson_harel, layout_dh.c;
    Davidson & Harel 1996): simulated-annealing energy minimization of
    node-node repulsion + edge-length cost inside a bounded frame. The
    engine anneals the same energy's gradient (grid-approximated 1/d²
    node repulsion, linear edge springs, the unit-square frame as the
    border term) with a two-regime schedule: annealing, then the
    reference's fine-tuning phase at a tenth of the temperature.
    Documented deviation: gradient descent under the annealing
    schedule instead of per-vertex Metropolis trials (the reference's
    RNG is irreproducible); rows-only + property pytest."""
    n = n if n is not None else graph.num_vertices()
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "vertex": pa.array([], pa.int64()),
            "x": pa.array([], pa.float64()),
            "y": pa.array([], pa.float64())}))
    k = float(np.sqrt(1.0 / n))
    cut = 1.0 - fine_tune_fraction

    def temp_fn(it, iters):
        frac = it / iters
        if frac < cut:
            return 0.2 * (1.0 - frac / cut)
        return 0.02 * (1.0 - (frac - cut) / (1.0 - cut))

    return _force_directed_nd(
        graph, n, iterations, num_partitions,
        att_mul=lambda d, it: d / k,
        rep_mul=lambda d2, cnt, it: 1.5 * k * k / d2 * cnt,
        temp_fn=temp_fn, k=k, dims=2)


def merge_layouts(
    layouts,
    pad: float = 0.05,
) -> ray.data.Dataset:
    """Merge per-component layouts into one canvas
    (igraph_layout_merge_dla, layout.c DLA merge). The reference
    drops each component's bounding circle onto the canvas with
    diffusion-limited-aggregation random walks; the engine places the
    circles DETERMINISTICALLY on a golden-angle spiral with radii
    accumulated so no two circles overlap (documented deviation — the
    contract "disjoint bounding circles, big components central" is
    preserved without the reference's RNG). ``layouts`` is a list of
    (vertex, x, y) datasets; output adds the component index ``comp``
    and offsets vertex coordinates in place."""
    stats = []
    mats = []
    for ds in layouts:
        m = ds.materialize()
        mats.append(m)
        cnt = m.count()
        if cnt == 0:
            stats.append((0.0, 0.0, 0.0))
            continue
        mx = (m.mean("x"), m.mean("y"))
        rows = m.map_batches(
            lambda b, mx=mx: pa.table({"r": pa.array(np.sqrt(
                (b["x"].to_numpy(zero_copy_only=False) - mx[0]) ** 2
                + (b["y"].to_numpy(zero_copy_only=False) - mx[1]) ** 2))}),
            batch_format="pyarrow", batch_size=None)
        stats.append((mx[0], mx[1], float(rows.max("r") or 0.0)))

    # biggest circle first at the origin, rest on a golden-angle spiral
    order = sorted(range(len(stats)), key=lambda i: -stats[i][2])
    centers = [None] * len(stats)
    placed = []
    golden = np.pi * (3.0 - np.sqrt(5.0))
    for rank, i in enumerate(order):
        r = stats[i][2] + pad
        if rank == 0:
            centers[i] = (0.0, 0.0)
            placed.append((0.0, 0.0, r))
            continue
        ang = golden * rank
        dist = 0.0
        step = max(r, pad) * 0.5
        while True:
            cx, cy = dist * np.cos(ang), dist * np.sin(ang)
            if all((cx - px) ** 2 + (cy - py) ** 2 >= (r + pr) ** 2
                   for px, py, pr in placed):
                break
            dist += step
        centers[i] = (cx, cy)
        placed.append((cx, cy, r))

    parts = []
    for i, m in enumerate(mats):
        cx, cy = centers[i] if centers[i] else (0.0, 0.0)
        ox, oy, _ = stats[i]
        parts.append(m.map_batches(
            lambda b, i=i, cx=cx, cy=cy, ox=ox, oy=oy: pa.table({
                "comp": pa.array(np.full(b.num_rows, i, np.int64)),
                "vertex": b["vertex"],
                "x": pa.array(b["x"].to_numpy(zero_copy_only=False)
                              - ox + cx),
                "y": pa.array(b["y"].to_numpy(zero_copy_only=False)
                              - oy + cy)}),
            batch_format="pyarrow", batch_size=None))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def layout_bipartite(
    edges: ray.data.Dataset,
    sweeps: int = 2,
    hgap: int = 1,
    vgap: int = 1,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Bipartite layout (igraph_layout_bipartite, layout.c): the two
    vertex classes on two horizontal rows (y = 0 / vgap), horizontal
    order by the classic barycenter crossing-minimization sweeps
    (the reference's heuristic is the same Sugiyama-style median/
    barycenter pass). The contract is PINNED so SQL replays it
    exactly: initial order = ascending vertex id per layer; each sweep
    reorders the RIGHT layer by the mean position of its left
    neighbors (ties: previous position, then id), then the LEFT layer
    symmetrically; positions are integer ranks × hgap. ``edges`` rows
    are (src=left vertex, dst=right vertex) over disjoint id
    universes. Returns (vertex, type, x, y) — all int64."""
    edges = edges.materialize()

    def _layer(col: str, typ: int) -> ray.data.Dataset:
        d = (edges.groupby(col).count()
             .select_columns([col]).map_batches(
                 lambda b: pa.table({"vertex": b[col]}) if b.num_rows
                 else pa.table({"vertex": pa.array([], pa.int64())}),
                 batch_format="pyarrow", batch_size=None))
        d = _global_rank(d, ["vertex"], "pos")
        return d.map_batches(
            lambda b: pa.table({"vertex": b["vertex"], "pos": b["pos"]})
            if b.num_rows else pa.table(
                {"vertex": pa.array([], pa.int64()),
                 "pos": pa.array([], pa.int64())}),
            batch_format="pyarrow", batch_size=None).materialize()

    left = _layer("src", 0)
    right = _layer("dst", 1)

    def _resweep(layer: ray.data.Dataset, other: ray.data.Dataset,
                 key: str, okey: str) -> ray.data.Dataset:
        opos = other.map_batches(
            lambda b: pa.table({okey: b["vertex"], "npos": b["pos"]})
            if b.num_rows else pa.table(
                {okey: pa.array([], pa.int64()),
                 "npos": pa.array([], pa.int64())}),
            batch_format="pyarrow", batch_size=None)
        j = hash_join(edges, opos, on=okey,
                      num_partitions=num_partitions)
        bary = (j.map_batches(
            lambda b: pa.table({"vertex": b[key],
                                "npos": b["npos"].cast(pa.float64())})
            if b.num_rows else pa.table(
                {"vertex": pa.array([], pa.int64()),
                 "npos": pa.array([], pa.float64())}),
            batch_format="pyarrow", batch_size=None)
            .groupby("vertex").mean("npos"))
        bary = bary.map_batches(
            lambda b: pa.table({"vertex": b["vertex"],
                                "bary": b["mean(npos)"]})
            if b.num_rows else pa.table(
                {"vertex": pa.array([], pa.int64()),
                 "bary": pa.array([], pa.float64())}),
            batch_format="pyarrow", batch_size=None)
        # every layer vertex has >= 1 neighbor (layers come from the
        # edge list), so the inner join keeps the whole layer
        withb = hash_join(layer, bary, on="vertex",
                          num_partitions=num_partitions)
        withb = withb.map_batches(
            lambda b: pa.table({
                "vertex": b["vertex"], "opos": b["pos"],
                "bary": b["bary"]})
            if b.num_rows else pa.table(
                {"vertex": pa.array([], pa.int64()),
                 "opos": pa.array([], pa.int64()),
                 "bary": pa.array([], pa.float64())}),
            batch_format="pyarrow", batch_size=None)
        ranked = _global_rank(withb, ["bary", "opos", "vertex"], "pos")
        return ranked.map_batches(
            lambda b: pa.table({"vertex": b["vertex"], "pos": b["pos"]})
            if b.num_rows else pa.table(
                {"vertex": pa.array([], pa.int64()),
                 "pos": pa.array([], pa.int64())}),
            batch_format="pyarrow", batch_size=None).materialize()

    for _ in range(sweeps):
        right = _resweep(right, left, "dst", "src")
        left = _resweep(left, right, "src", "dst")

    def _out(typ: int):
        def _f(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"vertex": pa.array([], pa.int64()),
                                 "type": pa.array([], pa.int64()),
                                 "x": pa.array([], pa.int64()),
                                 "y": pa.array([], pa.int64())})
            p = b["pos"].to_numpy(zero_copy_only=False)
            return pa.table({
                "vertex": b["vertex"],
                "type": pa.array(np.full(b.num_rows, typ, np.int64)),
                "x": pa.array(p * hgap),
                "y": pa.array(np.full(b.num_rows, typ * vgap, np.int64))})
        return _f

    return (left.map_batches(_out(0), batch_format="pyarrow",
                             batch_size=None)
            .union(right.map_batches(_out(1), batch_format="pyarrow",
                                     batch_size=None)))


def layout_lgl(graph: Graph, maxit: int = 10, root: int = 0,
               n: Optional[int] = None,
               num_partitions: int = 8) -> ray.data.Dataset:
    """Large Graph Layout (igraph_layout_lgl, layout.c): the reference
    builds a spanning tree, places vertices ring by ring outward from
    ``proot`` (each BFS layer of the tree on a growing circle), and
    anneals with the grid-bounded FR force pass. Here: unweighted
    spanning forest → hop layers from ``root`` over the forest →
    radial md5-jittered initial placement (layer = radius) → the
    engine's FR-grid annealing seeded with those positions. Vertices
    outside the root's component (and isolated ids) start on the
    outermost ring, as the reference appends later components outward.
    Returns (vertex, x, y)."""
    from igraph_ray.algorithms.mst import minimum_spanning_forest
    from igraph_ray.algorithms.paths import sssp_hops

    n = n if n is not None else graph.num_vertices()
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "vertex": pa.array([], pa.int64()),
            "x": pa.array([], pa.float64()),
            "y": pa.array([], pa.float64())}))
    msf = minimum_spanning_forest(graph.edges, weight_col=None,
                                  num_partitions=num_partitions)
    forest = Graph(msf.map_batches(
        lambda b: pa.table({"src": b["src"], "dst": b["dst"]})
        if b.num_rows else pa.table({"src": pa.array([], pa.int64()),
                                     "dst": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None).materialize(), n=n)
    hops = sssp_hops(forest, source=root,
                     num_partitions=num_partitions).state

    # max layer (small driver scalar)
    hops = hops.materialize()
    dmax = int(hops.max("dist") or 0)
    maxlayer = dmax + 1  # the unreached ring

    def _ring(b: pa.Table) -> pa.Table:
        v = b["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dist"].to_numpy(zero_copy_only=False).astype(np.float64)
        r = 0.5 * (d + 0.5) / (maxlayer + 1)
        ang = 2.0 * np.pi * _md5_unit([f"lgl:{i}" for i in v.tolist()])
        return pa.table({"vertex": pa.array(v),
                         "x": pa.array(0.5 + r * np.cos(ang)),
                         "y": pa.array(0.5 + r * np.sin(ang))})

    placed = hops.map_batches(_ring, batch_format="pyarrow",
                              batch_size=None)
    # vertices not reached from root: outermost ring
    reached = hops.map_batches(
        lambda b: pa.table({"vertex": b["vertex"],
                            "seen": pa.array(
                                np.ones(b.num_rows, np.int64))}),
        batch_format="pyarrow", batch_size=None).materialize()
    from igraph_ray.util import hash_join

    universe = ray.data.range(n).map_batches(
        lambda b: pa.table({"vertex": b["id"]}),
        batch_format="pyarrow", batch_size=None)
    unreached = hash_join(universe, reached, on="vertex",
                          num_partitions=num_partitions,
                          join_type="left_anti")

    def _outer(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vertex" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "x": pa.array([], pa.float64()),
                             "y": pa.array([], pa.float64())})
        v = b["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = 0.5 * (maxlayer + 0.5) / (maxlayer + 1)
        ang = 2.0 * np.pi * _md5_unit([f"lgl:{i}" for i in v.tolist()])
        return pa.table({"vertex": pa.array(v),
                         "x": pa.array(0.5 + r * np.cos(ang)),
                         "y": pa.array(0.5 + r * np.sin(ang))})

    init = placed.union(unreached.map_batches(
        _outer, batch_format="pyarrow", batch_size=None)).materialize()
    return layout_fruchterman_reingold(
        graph, iterations=maxit, n=n, num_partitions=num_partitions,
        init_pos=init)
