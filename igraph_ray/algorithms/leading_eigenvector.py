"""Leading-eigenvector community detection (Newman spectral bisection).

Reference semantics: igraph_community_leading_eigenvector
(/root/reference/src/community.c:1414 — Newman, PNAS 2006): recursively
bisect each group by the sign of the leading eigenvector of its
generalized modularity matrix

    B^(g)_ij = A_ij − k_i k_j / (2m) − δ_ij · Σ_{l∈g} (A_il − k_i k_l / (2m)),

stopping when the leading eigenvalue is non-positive or the sign split
does not improve modularity (ΔQ = sᵀ B^(g) s / 4m ≤ 0).

The reference calls ARPACK; the Ray-native engine runs *shifted power
iteration* (public textbook method): M = B^(g) + αI with the Gershgorin
shift α = max_i Σ_j |B^(g)_ij| ≥ |λ_min|, so M is PSD and iteration
converges to λ_max(B^(g)) + α. Each iteration is ONE distributed
matvec: A_g·x is a hash join of the group-restricted edge table with
the x vector plus a groupby-sum; the rank-one and diagonal terms are a
broadcast scalar (k_gᵀx) and an elementwise column — no dense matrix
anywhere. Group state lives in Datasets; the driver sees scalars.

Deterministic: the start vector is x_i = 1 + (i mod 7)/7 (fixed,
asymmetric so it is never orthogonal to the leading eigenvector by
symmetry), tie signs (|u_i| ≈ 0) resolve to +.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.util import hash_join


def _t(**cols) -> pa.Table:
    return pa.table(cols)


def _sym_simple(graph: Graph) -> ray.data.Dataset:
    """Distinct loop-free undirected edges, both directions."""
    from igraph_ray.ops.relational import _dedup

    def _canon(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return _t(src=pa.array(np.minimum(s, d)),
                  dst=pa.array(np.maximum(s, d)))

    und = _dedup(graph.edges.map_batches(_canon, batch_format="pyarrow",
                                         batch_size=None))
    return und.map_batches(
        lambda b: _t(src=pa.array(np.concatenate([
            b["src"].to_numpy(zero_copy_only=False),
            b["dst"].to_numpy(zero_copy_only=False)])),
            dst=pa.array(np.concatenate([
                b["dst"].to_numpy(zero_copy_only=False),
                b["src"].to_numpy(zero_copy_only=False)]))),
        batch_format="pyarrow", batch_size=None).materialize()


def _matvec(sym_g: ray.data.Dataset, xs: ray.data.Dataset,
            npn: int) -> ray.data.Dataset:
    """(vertex, ax) = A_g · x via one join + one grouped sum; vertices
    with no in-group neighbor get ax = 0 via the outer coalesce."""
    xr = xs.map_batches(lambda b: _t(src=b["vertex"], xv=b["x"]),
                        batch_format="pyarrow", batch_size=None)
    j = hash_join(sym_g, xr.materialize(), on="src", num_partitions=npn)

    def _pre(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "xv" not in b.column_names:
            return _t(vertex=pa.array([], pa.int64()),
                      ax=pa.array([], pa.float64()))
        t = _t(vertex=b["dst"], ax=b["xv"])
        return (pa.TableGroupBy(t, "vertex").aggregate([("ax", "sum")])
                .rename_columns(["vertex", "ax"]))

    acc = (j.map_batches(_pre, batch_format="pyarrow", batch_size=None)
           .groupby("vertex").sum("ax"))
    acc = acc.map_batches(
        lambda b: _t(vertex=b["vertex"], ax=b["sum(ax)"]),
        batch_format="pyarrow", batch_size=None)
    merged = hash_join(xs, acc.materialize(), on="vertex",
                       num_partitions=npn, join_type="left_outer")

    def _fin(b: pa.Table) -> pa.Table:
        ax = (pc.fill_null(b["ax"], 0.0) if "ax" in b.column_names
              else pa.array(np.zeros(b.num_rows)))
        out = {c: b[c] for c in b.column_names if c != "ax"}
        out["ax"] = pc.cast(ax, pa.float64())
        return pa.table(out)

    return merged.map_batches(_fin, batch_format="pyarrow",
                              batch_size=None).materialize()


def leading_eigenvector_communities(
    graph: Graph,
    max_splits: int = 16,
    power_iters: int = 80,
    tol: float = 1e-7,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Returns (vertex, community) with community = min vertex id of the
    final group (the engine's canonical raw labeling)."""
    sym = _sym_simple(graph)
    if sym.count() == 0:
        return graph.vertices().map_batches(
            lambda b: _t(vertex=b["vertex"], community=b["vertex"]),
            batch_format="pyarrow", batch_size=None)
    m2 = float(sym.count())  # 2m (each undirected edge twice)
    m = m2 / 2.0

    deg = (sym.groupby("src").count()
           .map_batches(lambda b: _t(vertex=b["src"],
                                     k=pc.cast(b["count()"], pa.float64())),
                        batch_format="pyarrow", batch_size=None)
           .materialize())

    # initial group table: (vertex, k, community=0 placeholder)
    state = deg.map_batches(
        lambda b: _t(vertex=b["vertex"], k=b["k"],
                     community=pa.array(
                         np.zeros(b.num_rows, np.int64))),
        batch_format="pyarrow", batch_size=None).materialize()
    # start with everything in one group keyed by the min vertex id
    root = int(state.min("vertex"))
    state = state.map_batches(
        lambda b, root=root: _t(vertex=b["vertex"], k=b["k"],
                                community=pa.array(
                                    np.full(b.num_rows, root, np.int64))),
        batch_format="pyarrow", batch_size=None).materialize()

    queue: List[int] = [root]
    splits_done = 0

    while queue and splits_done < max_splits:
        gid = queue.pop(0)
        grp = state.filter(expr=f"community == {gid}").materialize()
        ng = grp.count()
        if ng < 2:
            continue
        kg = float(grp.sum("k"))

        # group-restricted symmetric edges (semi joins both endpoints)
        gv = grp.select_columns(["vertex"])
        e1 = hash_join(sym.map_batches(
            lambda b: _t(vertex=b["src"], dst=b["dst"]),
            batch_format="pyarrow", batch_size=None), gv,
            on="vertex", num_partitions=num_partitions,
            join_type="left_semi")
        e2 = hash_join(e1.map_batches(
            lambda b: (_t(src=b["vertex"], vertex=b["dst"])
                       if b.num_rows and "vertex" in b.column_names
                       else _t(src=pa.array([], pa.int64()),
                               vertex=pa.array([], pa.int64()))),
            batch_format="pyarrow", batch_size=None), gv,
            on="vertex", num_partitions=num_partitions,
            join_type="left_semi")
        sym_g = e2.map_batches(
            lambda b: (_t(src=b["src"], dst=b["vertex"])
                       if b.num_rows and "src" in b.column_names
                       else _t(src=pa.array([], pa.int64()),
                               dst=pa.array([], pa.int64()))),
            batch_format="pyarrow", batch_size=None).materialize()

        # per-vertex constants: within-group degree din, diagonal
        # d_i = din_i − k_i·K_g/2m; deterministic start vector
        din = (sym_g.groupby("src").count()
               .map_batches(lambda b: _t(vertex=b["src"],
                                         din=pc.cast(b["count()"],
                                                     pa.float64())),
                            batch_format="pyarrow", batch_size=None))
        xs = hash_join(grp, din.materialize(), on="vertex",
                       num_partitions=num_partitions,
                       join_type="left_outer")

        def _init(b: pa.Table, kg=kg) -> pa.Table:
            v = b["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
            k = b["k"].to_numpy(zero_copy_only=False)
            dv = (pc.fill_null(b["din"], 0.0).to_numpy(zero_copy_only=False)
                  if "din" in b.column_names else np.zeros(len(v)))
            diag = dv - k * kg / m2
            x0 = 1.0 + (v % 7) / 7.0
            return _t(vertex=pa.array(v), k=pa.array(k),
                      diag=pa.array(diag), x=pa.array(x0))

        xs = xs.map_batches(_init, batch_format="pyarrow",
                            batch_size=None).materialize()

        # Gershgorin shift: α = max_i (din_i + k_i·K_g/2m + |diag_i|)
        def _gersh(b: pa.Table) -> pa.Table:
            k = b["k"].to_numpy(zero_copy_only=False)
            diag = b["diag"].to_numpy(zero_copy_only=False)
            din = diag + k * kg / m2
            g = din + k * kg / m2 + np.abs(diag)
            return _t(g=pa.array(g))

        alpha = float(xs.map_batches(_gersh, batch_format="pyarrow",
                                     batch_size=None).max("g")) + 1.0

        lam = 0.0
        for _it in range(power_iters):
            kx = float(xs.map_batches(
                lambda b: _t(kx=pc.multiply(b["k"], b["x"])),
                batch_format="pyarrow", batch_size=None).sum("kx"))
            xs2 = _matvec(sym_g, xs, num_partitions)

            def _update(b: pa.Table, kx=kx, alpha=alpha) -> pa.Table:
                x = b["x"].to_numpy(zero_copy_only=False)
                k = b["k"].to_numpy(zero_copy_only=False)
                diag = b["diag"].to_numpy(zero_copy_only=False)
                ax = b["ax"].to_numpy(zero_copy_only=False)
                y = ax - k * kx / m2 - diag * x + alpha * x
                return _t(vertex=b["vertex"], k=b["k"], diag=b["diag"],
                          x=pa.array(y), xprev=pa.array(x))

            xs2 = xs2.map_batches(_update, batch_format="pyarrow",
                                  batch_size=None).materialize()
            norm = float(np.sqrt(xs2.map_batches(
                lambda b: _t(s=pc.multiply(b["x"], b["x"])),
                batch_format="pyarrow", batch_size=None).sum("s")))
            if norm == 0.0:
                break
            lam = norm - alpha  # Rayleigh surrogate via ||Mx|| on unit x

            def _norm(b: pa.Table, norm=norm) -> pa.Table:
                return _t(vertex=b["vertex"], k=b["k"], diag=b["diag"],
                          x=pc.divide(b["x"], pa.scalar(norm, pa.float64())))

            nxt = xs2.map_batches(_norm, batch_format="pyarrow",
                                  batch_size=None).materialize()
            # residual ||x_new − x_old||∞ on the normalized vectors
            resid = float(xs2.map_batches(
                lambda b, norm=norm: _t(r=pc.abs(pc.subtract(
                    pc.divide(b["x"], pa.scalar(norm, pa.float64())),
                    b["xprev"]))),
                batch_format="pyarrow", batch_size=None).max("r"))
            xs = nxt
            if resid < tol:
                break

        if lam <= 1e-9:
            continue  # indivisible: leading eigenvalue non-positive

        # split by sign; ΔQ = sᵀB^(g)s / 4m must be positive
        signs = xs.map_batches(
            lambda b: _t(vertex=b["vertex"], k=b["k"], diag=b["diag"],
                         x=pc.cast(pc.if_else(
                             pc.greater_equal(b["x"], 0.0), 1.0, -1.0),
                             pa.float64())),
            batch_format="pyarrow", batch_size=None).materialize()
        ks = float(signs.map_batches(
            lambda b: _t(kx=pc.multiply(b["k"], b["x"])),
            batch_format="pyarrow", batch_size=None).sum("kx"))
        ss = _matvec(sym_g, signs, num_partitions)

        def _quad(b: pa.Table, ks=ks) -> pa.Table:
            s = b["x"].to_numpy(zero_copy_only=False)
            k = b["k"].to_numpy(zero_copy_only=False)
            diag = b["diag"].to_numpy(zero_copy_only=False)
            ax = b["ax"].to_numpy(zero_copy_only=False)
            bs = ax - k * ks / m2 - diag * s
            return _t(q=pa.array(s * bs))

        dq = float(ss.map_batches(_quad, batch_format="pyarrow",
                                  batch_size=None).sum("q")) / (4.0 * m)
        if dq <= 1e-12:
            continue
        pos = signs.filter(expr="x >= 0").select_columns(["vertex"])
        neg = signs.filter(expr="x < 0").select_columns(["vertex"])
        if pos.count() == 0 or neg.count() == 0:
            continue
        new_pos = int(pos.min("vertex"))
        new_neg = int(neg.min("vertex"))
        flip = neg.map_batches(
            lambda b, lab=new_neg: _t(vertex=b["vertex"],
                                      newc=pa.array(np.full(
                                          b.num_rows, lab, np.int64))),
            batch_format="pyarrow", batch_size=None)
        flip2 = pos.map_batches(
            lambda b, lab=new_pos: _t(vertex=b["vertex"],
                                      newc=pa.array(np.full(
                                          b.num_rows, lab, np.int64))),
            batch_format="pyarrow", batch_size=None)
        remap = flip.union(flip2).materialize()
        merged = hash_join(state, remap, on="vertex",
                           num_partitions=num_partitions,
                           join_type="left_outer")

        def _apply(b: pa.Table) -> pa.Table:
            nc = (pc.coalesce(b["newc"], b["community"])
                  if "newc" in b.column_names else b["community"])
            return _t(vertex=b["vertex"], k=b["k"],
                      community=pc.cast(nc, pa.int64()))

        state = merged.map_batches(_apply, batch_format="pyarrow",
                                   batch_size=None).materialize()
        splits_done += 1
        queue.extend([new_pos, new_neg])

    return state.select_columns(["vertex", "community"])
