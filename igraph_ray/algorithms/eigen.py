"""Generic eigenproblem plumbing — the igraph_eigen_* surface
(igraph_eigen.h, eigen.c): selected eigenpairs of a matrix given as a
COO triplet Dataset, independent of any particular graph algorithm.

The reference routes these through LAPACK (dense) or ARPACK
(matrix-free Lanczos) with an igraph_eigen_which_t selector
(LM/SM/LA/SA/BE/ALL); the engine's counterpart is Ray-Data-first:

- The operator is a weighted Graph whose edge table IS the COO matrix
  (row -> src, col -> dst, value -> weight); one weighted-CSR gather
  per superstep computes A·X for the whole k-column block.
- LM runs plain distributed subspace iteration (the ASE engine,
  embedding.py variant="matrix"); LA/SA run the SAME iteration on the
  spectrally shifted operator A ± B·I (B = Gershgorin bound, computed
  with one grouped aggregate) so the wanted algebraic end becomes the
  dominant magnitude; BE composes an LA and an SA solve.
- SM and ALL have no magnitude-dominant formulation reachable by
  forward iteration (the reference uses a factorization / full dense
  solve there too) — they run dense in ONE guarded Ray task
  (np.linalg.eigh, the LAPACK-parity path) with an explicit size
  ceiling, same honesty contract as the other guarded-task surfaces.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.graph import Graph

_DENSE_GUARD = 4096


def matrix_from_triplets(triplets: ray.data.Dataset, n: int,
                         mirror: bool = True) -> Graph:
    """COO triplets (row, col, value) -> weighted operator Graph.
    With ``mirror`` every off-diagonal entry is reflected, so the
    caller may supply one triangle of a symmetric matrix; diagonal
    entries become self-loops (taken once).

    ``mirror=True`` is robust to a caller that supplies BOTH triangles
    of a symmetric matrix: off-diagonal entries are canonicalized to
    unordered pairs and grouped once — a pair seen in only one
    orientation is reflected, a pair seen in both orientations with
    equal totals is taken once per direction (no silent doubling), and
    a pair whose two orientations disagree raises ValueError.
    Duplicate entries in the SAME orientation still sum (COO
    convention)."""

    if not mirror:
        def _edges(b: pa.Table) -> pa.Table:
            r = b["row"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = b["col"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = b["value"].to_numpy(
                zero_copy_only=False).astype(np.float64)
            return pa.table({"src": pa.array(r), "dst": pa.array(c),
                             "weight": pa.array(v)})

        return Graph(triplets.map_batches(_edges, batch_format="pyarrow",
                                          batch_size=None),
                     n=n, weighted=True, attrs={"directed": True})

    # mirror=True: one grouped pass over unordered off-diagonal pairs.
    def _canon(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "s_up": pa.array([], pa.float64()),
                             "s_dn": pa.array([], pa.float64()),
                             "n_up": pa.array([], pa.int64()),
                             "n_dn": pa.array([], pa.int64())})
        r = b["row"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["col"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        lo = np.minimum(r, c)
        hi = np.maximum(r, c)
        up = (r <= c)
        t = pa.table({"lo": pa.array(lo), "hi": pa.array(hi),
                      "s_up": pa.array(np.where(up, v, 0.0)),
                      "s_dn": pa.array(np.where(up, 0.0, v)),
                      "n_up": pa.array(up.astype(np.int64)),
                      "n_dn": pa.array((~up).astype(np.int64))})
        return (t.group_by(["lo", "hi"])
                .aggregate([("s_up", "sum"), ("s_dn", "sum"),
                            ("n_up", "sum"), ("n_dn", "sum")])
                .rename_columns(["lo", "hi", "s_up", "s_dn",
                                 "n_up", "n_dn"]))

    def _resolve(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "weight": pa.array([], pa.float64())})
        lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        su = b["sum(s_up)"].to_numpy(zero_copy_only=False)
        sd = b["sum(s_dn)"].to_numpy(zero_copy_only=False)
        nu = b["sum(n_up)"].to_numpy(zero_copy_only=False)
        nd = b["sum(n_dn)"].to_numpy(zero_copy_only=False)
        diag = lo == hi
        both = (~diag) & (nu > 0) & (nd > 0)
        bad = both & ~np.isclose(su, sd, rtol=1e-12, atol=1e-300)
        if bad.any():
            i = int(np.flatnonzero(bad)[0])
            raise ValueError(
                "matrix_from_triplets(mirror=True): entries "
                f"({lo[i]},{hi[i]}) and ({hi[i]},{lo[i]}) are both "
                f"present with different values ({su[i]} vs {sd[i]}) — "
                "supply one triangle, or a consistent symmetric COO")
        val = np.where(nu > 0, su, sd)
        off = ~diag
        src = np.concatenate([lo, hi[off]])
        dst = np.concatenate([hi, lo[off]])
        w = np.concatenate([val, val[off]])
        return pa.table({"src": pa.array(src), "dst": pa.array(dst),
                         "weight": pa.array(w)})

    resolved = (triplets.map_batches(_canon, batch_format="pyarrow",
                                     batch_size=None)
                .groupby(["lo", "hi"])
                .sum(["s_up", "s_dn", "n_up", "n_dn"])
                .map_batches(_resolve, batch_format="pyarrow",
                             batch_size=None))
    return Graph(resolved, n=n, weighted=True, attrs={"directed": True})


def _gershgorin_bound(op: Graph) -> float:
    """B = max_i sum_j |A_ij| >= max |eigenvalue| — one grouped
    aggregate over the operator's edge table."""

    def _abs_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "a": pa.array([], pa.float64())})
        return pa.table({
            "src": b["src"],
            "a": pa.array(np.abs(b["weight"].to_numpy(
                zero_copy_only=False).astype(np.float64)))})

    rows = (op.edges.map_batches(_abs_rows, batch_format="pyarrow",
                                 batch_size=None)
            .groupby("src").sum("a").max("sum(a)"))
    return float(rows or 0.0)


def eigen_matrix_symmetric(
    triplets: ray.data.Dataset,
    n: int,
    k: int = 2,
    which: str = "LM",
    iters: int = 60,
    oversample: int = 2,
    num_partitions: Optional[int] = None,
    mirror: bool = True,
) -> Tuple[List[float], ray.data.Dataset]:
    """igraph_eigen_matrix_symmetric (eigen.c): ``k`` selected
    eigenpairs of the symmetric COO matrix. Returns (values, vectors):
    values in selection order, vectors as a Dataset (vertex,
    v0..v{k-1}) of unit Ritz vectors with the engine's deterministic
    sign convention. which in {LM, LA, SA, BE, SM, ALL}; SM/ALL take
    the guarded dense path."""
    from igraph_ray.algorithms.embedding import adjacency_spectral_embedding

    which = which.upper()
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())
    op = matrix_from_triplets(triplets, n, mirror=mirror)

    if which in ("SM", "ALL"):
        kk = n if which == "ALL" else k
        return _dense_symmetric(op, n, kk, which)

    if which == "BE":
        k_hi = (k + 1) // 2
        k_lo = k - k_hi
        hi_vals, hi_vecs = eigen_matrix_symmetric(
            triplets, n, k_hi, "LA", iters, oversample, num_partitions,
            mirror)
        lo_vals, lo_vecs = eigen_matrix_symmetric(
            triplets, n, k_lo, "SA", iters, oversample, num_partitions,
            mirror) if k_lo else ([], None)
        from igraph_ray.util import hash_join
        if lo_vecs is None:
            return hi_vals, hi_vecs
        lo_vecs = lo_vecs.map_batches(
            lambda b: b.rename_columns(
                ["vertex"] + [f"v{k_hi + j}" for j in range(k_lo)]),
            batch_format="pyarrow", batch_size=None)
        return (hi_vals + lo_vals,
                hash_join(hi_vecs, lo_vecs, on="vertex",
                          num_partitions=num_partitions))

    shift = 0.0
    if which in ("LA", "SA"):
        b = _gershgorin_bound(op)
        shift = b if which == "LA" else -b
    elif which != "LM":
        raise ValueError(f"unknown which spec {which!r}")

    res = adjacency_spectral_embedding(
        op, k=k, oversample=oversample, fixed_iterations=iters,
        num_partitions=num_partitions, variant="matrix", shift=shift)
    vals = [float(x) for x in res.scalars["eigenvalues"]]
    vecs = res.state.map_batches(
        lambda b: b.rename_columns(
            ["vertex"] + [f"v{j}" for j in range(k)]),
        batch_format="pyarrow", batch_size=None)
    return vals, vecs


def _dense_symmetric(op: Graph, n: int, k: int,
                     which: str) -> Tuple[List[float], ray.data.Dataset]:
    if n > _DENSE_GUARD:
        raise NotImplementedError(
            f"eigen_matrix_symmetric which={which} takes the dense "
            f"LAPACK-parity path, guarded to n <= {_DENSE_GUARD} "
            "(the reference factorizes / solves densely here too)")

    @ray.remote
    def _run(n: int, k: int, which: str) -> tuple:
        A = np.zeros((n, n))
        for b in op.edges.iter_batches(batch_format="pyarrow"):
            r = b["src"].to_numpy(zero_copy_only=False)
            c = b["dst"].to_numpy(zero_copy_only=False)
            v = b["weight"].to_numpy(zero_copy_only=False)
            np.add.at(A, (r, c), v)
        w, V = np.linalg.eigh(0.5 * (A + A.T))
        if which == "SM":
            order = np.lexsort((w, np.abs(w)))[:k]
        else:  # ALL: algebraic descending
            order = np.argsort(-w)[:k]
        w = w[order]
        V = V[:, order]
        for j in range(V.shape[1]):  # deterministic sign
            a = np.abs(V[:, j])
            i = int(np.flatnonzero(a == a.max())[0])
            if V[i, j] < 0:
                V[:, j] = -V[:, j]
        cols = {"vertex": pa.array(np.arange(n, dtype=np.int64))}
        for j in range(V.shape[1]):
            cols[f"v{j}"] = pa.array(V[:, j], pa.float64())
        return [float(x) for x in w], pa.table(cols)

    vals, table = ray.get(_run.remote(n, k, which))
    return vals, ray.data.from_arrow(table)


def eigen_matrix(
    triplets: ray.data.Dataset,
    n: int,
    k: int = 2,
    which: str = "LM",
) -> Tuple[List[complex], ray.data.Dataset]:
    """igraph_eigen_matrix (eigen.c, general non-symmetric case): the
    reference's non-ARPACK branch is a dense LAPACK solve; the engine
    mirrors it in ONE guarded Ray task (np.linalg.eig). which in
    {LM, LR, SR} (magnitude / largest / smallest real part). Returns
    (complex values, vectors Dataset with v{j}_re / v{j}_im
    columns)."""
    if n > _DENSE_GUARD:
        raise NotImplementedError(
            f"eigen_matrix (general) is the dense LAPACK-parity path, "
            f"guarded to n <= {_DENSE_GUARD}")
    which = which.upper()
    op = matrix_from_triplets(triplets, n, mirror=False)

    @ray.remote
    def _run(n: int, k: int, which: str) -> tuple:
        A = np.zeros((n, n))
        for b in op.edges.iter_batches(batch_format="pyarrow"):
            np.add.at(A, (b["src"].to_numpy(zero_copy_only=False),
                          b["dst"].to_numpy(zero_copy_only=False)),
                      b["weight"].to_numpy(zero_copy_only=False))
        w, V = np.linalg.eig(A)
        if which == "LM":
            key = np.lexsort((-w.real, -np.abs(w)))
        elif which == "LR":
            key = np.lexsort((-np.abs(w.imag), -w.real))
        elif which == "SR":
            key = np.lexsort((np.abs(w.imag), w.real))
        else:
            raise ValueError(f"unknown which spec {which!r}")
        order = key[:k]
        w = w[order]
        V = V[:, order]
        cols = {"vertex": pa.array(np.arange(n, dtype=np.int64))}
        for j in range(V.shape[1]):
            cols[f"v{j}_re"] = pa.array(V[:, j].real, pa.float64())
            cols[f"v{j}_im"] = pa.array(V[:, j].imag, pa.float64())
        return [complex(x) for x in w], pa.table(cols)

    vals, table = ray.get(_run.remote(n, k, which))
    return vals, ray.data.from_arrow(table)


def eigen_laplacian(
    graph: Graph,
    k: int = 2,
    which: str = "SA",
    iters: int = 80,
    num_partitions: Optional[int] = None,
) -> Tuple[List[float], ray.data.Dataset]:
    """igraph_eigen_laplacian (eigen.c surface): selected eigenpairs of
    L = D − A over the simple undirected view — the COO export of
    ops/structural.laplacian_edges fed into eigen_matrix_symmetric
    verbatim (both triangles are already present; mirror off). SA (the
    algebraic bottom: λ0 = 0, the Fiedler pair next) is the common
    spectral-partitioning ask; every which spec of the generic surface
    is accepted."""
    from igraph_ray.ops.structural import laplacian_edges

    coo = laplacian_edges(graph, normalized=False,
                          num_partitions=num_partitions or 8)
    trip = coo.map_batches(
        lambda b: pa.table({"row": b["i"], "col": b["j"],
                            "value": pa.compute.cast(b["value"],
                                                     pa.float64())}),
        batch_format="pyarrow", batch_size=None)
    return eigen_matrix_symmetric(trip, graph.num_vertices(), k=k,
                                  which=which, iters=iters,
                                  num_partitions=num_partitions,
                                  mirror=False)
