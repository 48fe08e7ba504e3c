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
) -> ray.data.Dataset:
    """FR force layout in the unit square; returns (vertex, x, y)."""
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

    pos = ray.data.range(n).map_batches(
        _init, batch_format="pyarrow", batch_size=None).materialize()

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
    return ray.data.from_arrow(pa.table({
        "vertex": pa.array(np.arange(n, dtype=np.int64)),
        "x": pa.array(X[:, 0]),
        "y": pa.array(X[:, 1])}))


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
