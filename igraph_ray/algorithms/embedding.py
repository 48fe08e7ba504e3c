"""Adjacency spectral embedding (top-k eigenpairs of the symmetric
adjacency, X = U_k·|S_k|^{1/2}).

Reference semantics: igraph_adjacency_spectral_embedding
(/root/reference/src/embedding.c — Sussman et al. 2012 ASE): the
embedding is the top-|k| eigenvectors (by |λ|) of the undirected
adjacency matrix scaled by sqrt(|λ|). The reference calls ARPACK; the
Ray-native engine runs BLOCK SUBSPACE ITERATION on the aligned
superstep engine: per superstep every partition gathers Y = A·X for all
k columns at once (the same CSC reduceat kernel as PageRank, k payload
columns), the k×k Gram matrix YᵀY and Rayleigh–Ritz projection XᵀY
accumulate as superstep scalars, and the driver-side work per step is
only the k×k Cholesky / eigendecomposition. Deterministic throughout:
fixed iteration count, fixed cosine-hash initial basis, sign fixed by
the smallest vertex id among each column's max-|value| entries.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data

import igraph_ray.aligned as al
from igraph_ray.graph import Graph
from igraph_ray.kernels import pagerank_messages_csc
from igraph_ray.superstep import SuperstepResult


def _sym_graph(graph: Graph, dad_weights: bool = False) -> Graph:
    """Symmetrized simple view (each undirected edge in both
    directions) — ASE is defined on the undirected adjacency. With
    ``dad_weights`` each edge carries w(u,v) = 1/sqrt(d_u·d_v), so the
    weighted gather computes D^{-1/2}·A·D^{-1/2}·x — the Laplacian
    ("DAD") spectral-embedding operator of embedding.c:998 — with NO
    extra per-superstep work."""
    und = graph.canonical_undirected().materialize()

    def _sym(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([lo, hi])),
            "dst": pa.array(np.concatenate([hi, lo])),
        })

    sym = und.map_batches(_sym, batch_format="pyarrow",
                          batch_size=None)
    n = graph.num_vertices() if graph._explicit_n else None
    if not dad_weights:
        return Graph(sym.materialize(), n=n)
    from igraph_ray.util import hash_join

    def _deg(b: pa.Table) -> pa.Table:
        t = pa.table({"v": b["src"],
                      "d": pa.array(np.ones(b.num_rows, np.int64))})
        return (t.group_by("v").aggregate([("d", "sum")])
                .rename_columns(["v", "d"]))

    deg = (sym.map_batches(_deg, batch_format="pyarrow", batch_size=None)
           .groupby("v").sum("d"))
    deg = deg.map_batches(
        lambda b: (pa.table({"v": b["v"], "d": b["sum(d)"]})
                   if b.num_rows else
                   pa.table({"v": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64())})),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(sym.map_batches(
        lambda b: pa.table({"v": b["src"], "dst": b["dst"]}),
        batch_format="pyarrow", batch_size=None), deg, on="v",
        num_partitions=8)
    j = hash_join(j.map_batches(
        lambda b: pa.table({"src": b["v"], "u": b["dst"],
                            "ds": b["d"]}),
        batch_format="pyarrow", batch_size=None),
        deg.map_batches(lambda b: pa.table({"u": b["v"], "dd": b["d"]}),
                        batch_format="pyarrow", batch_size=None),
        on="u", num_partitions=8)

    def _w(b: pa.Table) -> pa.Table:
        ds = b["ds"].to_numpy(zero_copy_only=False).astype(np.float64)
        dd = b["dd"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"src": b["src"], "dst": b["u"],
                         "weight": pa.array(1.0 / np.sqrt(ds * dd))})

    return Graph(j.map_batches(_w, batch_format="pyarrow",
                               batch_size=None).materialize(),
                 n=n, weighted=True)


def adjacency_spectral_embedding(
    graph: Graph,
    k: int = 4,
    oversample: int = 2,
    fixed_iterations: int = 60,
    num_partitions: Optional[int] = None,
    engine: str = "tasks",
    variant: str = "ase",
    shift: float = 0.0,
) -> SuperstepResult:
    """Returns SuperstepResult whose state is (vertex, d0..d{k-1}) —
    row v of X = U_k·|Λ_k|^{1/2}, eigenpairs ordered by |λ| descending,
    each column's sign fixed so its max-|value| entry (smallest vertex
    id on ties) is positive.

    ``variant="matrix"`` is the generic symmetric-operator mode
    (igraph_eigen_matrix_symmetric plumbing, algorithms/eigen.py): the
    input graph IS the operator — a weighted COO edge table taken
    verbatim (caller supplies both triangles + diagonal loops) — the
    subspace iterates on A + shift·I (spectral-shift selection of the
    algebraic ends), the returned columns are UNIT Ritz vectors (no
    |λ|^(1/2) scaling) and scalars["eigenvalues"] are eigenvalues of A
    (shift removed), still ordered by shifted magnitude descending."""
    assert variant in ("ase", "lse", "matrix")
    dad = variant != "ase"
    sym = graph if variant == "matrix" else _sym_graph(graph,
                                                       dad_weights=dad)
    n = sym.num_vertices()
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())
    csr = sym.csr_index("matrix" if variant == "matrix" else "out",
                        num_partitions, weighted=dad)
    blocks = csr.block_descriptors()
    # guard vectors (randomized-subspace oversampling): iterate with
    # k+oversample columns so the k-th pair's convergence rate is
    # |λ_{k+oversample+1}|/|λ_k| instead of |λ_{k+1}|/|λ_k|
    kk = k + max(0, oversample)

    def _init(sd: dict) -> dict:
        v = sd["vertex"].astype(np.float64)
        out = {"vertex": sd["vertex"]}
        for j in range(kk):
            # deterministic dense init: shifted cosine lattice — full
            # rank against any basis whp, identical on every run
            col = np.cos((j + 1) * 0.7548776662 * v + 0.25 * j)
            out[f"y{j}"] = col
            out[f"x{j}"] = col
            out[f"p{j}"] = col
        return out

    if sym._explicit_n:
        state = al.state_from_csr(csr, n, init_fn=_init)
    else:
        state = al.state_from_dataset(
            sym.vertices(), [int(b) for b in csr.boundaries], init_fn=_init)

    def _rinv_from(scalars) -> np.ndarray:
        r = np.zeros((kk, kk))
        for i in range(kk):
            for j in range(kk):
                r[i, j] = scalars.get(f"r_{i}_{j}", 1.0 if i == j else 0.0)
        return r

    def gather_fn(sb, csr_desc, starts, scalars):
        X = np.stack([sb[f"x{j}"] for j in range(kk)], axis=1)
        deg1 = np.ones(len(sb["vertex"]))
        nb = len(starts)
        segs = [[] for _ in range(nb)]
        msg_count = 0
        col_pairs = [pagerank_messages_csc(csr_desc, sb["vertex"],
                                           X[:, j].copy(), deg1, dad)
                     for j in range(kk)]
        # identical dst structure across columns (same verts, same CSC
        # walk) — stack the k partial vectors per (block, dst-run)
        for bi in range(len(col_pairs[0])):
            dsts = col_pairs[0][bi][0]
            partial = np.stack([col_pairs[j][bi][1] for j in range(kk)],
                               axis=1)
            msg_count += len(dsts)
            bounds = np.searchsorted(dsts, starts[1:])
            lo = 0
            for r, hi in enumerate(list(bounds) + [len(dsts)]):
                if hi > lo:
                    segs[r].append((dsts[lo:hi], partial[lo:hi]))
                lo = hi
        return [tuple(s) for s in segs], msg_count

    # The fused one-hop engine hands every iteration the PREVIOUS
    # iteration's reduce, so naive Y·rinv conditioning inside gather is
    # one step stale — that makes log||Y|| follow ℓ_{t+1}=logλ+ℓ_t−ℓ_{t-1}
    # (a sustained oscillation) and numerically collapses the
    # subdominant columns. Instead the loop runs STRIDE-2 subspace
    # iteration where every orthonormalization is exact: the state
    # carries y (the raw gathered A·x, whose global Gram arrives with
    # the next reduce) and x (the exactly-orthonormalized PREVIOUS y).
    # gather always emits A·x for an exactly orthonormal x, so the
    # Rayleigh quotient m = xᵀ(A·x) accumulated in apply is exact and
    # symmetric — no correction factors needed.

    def apply_fn(old, segments, scalars):
        vertex = old["vertex"]
        m = len(vertex)
        rinv = _rinv_from(scalars)
        Yold = np.stack([old[f"y{j}"] for j in range(kk)], axis=1)
        Xnew = Yold @ rinv  # exact: rinv is chol-inv of gram(Yold)
        Xmsg = np.stack([old[f"x{j}"] for j in range(kk)], axis=1)
        acc = np.zeros((m, kk))
        for pairs in segments:
            for (sd, sp) in pairs:
                if not len(sd):
                    continue
                pos = np.searchsorted(vertex, sd)
                np.add.at(acc, pos, sp)
        if shift != 0.0:
            acc += shift * Xmsg  # operator is A + shift·I
        out = {"vertex": vertex}
        for j in range(kk):
            out[f"y{j}"] = acc[:, j]        # raw A·Xmsg, orth next step
            out[f"x{j}"] = Xnew[:, j]       # basis for the NEXT gather
            out[f"p{j}"] = Xmsg[:, j]       # basis the m below lives in
        gram = acc.T @ acc
        proj = Xmsg.T @ acc                 # = Xmsgᵀ·A·Xmsg (exact RR)
        partial = {}
        for i in range(kk):
            for j in range(kk):
                partial[f"g_{i}_{j}"] = float(gram[i, j])
                partial[f"m_{i}_{j}"] = float(proj[i, j])
        return out, partial

    def make_scalars(summed, it):
        gram = np.zeros((kk, kk))
        out = {}
        for i in range(kk):
            for j in range(kk):
                gram[i, j] = summed.get(f"g_{i}_{j}", 0.0)
                out[f"m_{i}_{j}"] = summed.get(f"m_{i}_{j}", 0.0)
        # ridge keeps Cholesky alive if columns collapse (k > rank)
        gram += np.eye(kk) * max(1e-12, 1e-12 * abs(np.trace(gram)))
        rinv = np.linalg.inv(np.linalg.cholesky(gram).T)
        for i in range(kk):
            for j in range(kk):
                out[f"r_{i}_{j}"] = float(rinv[i, j])
        return out

    init_scalars = {f"r_{i}_{j}": (1.0 if i == j else 0.0)
                    for i in range(kk) for j in range(kk)}
    init_scalars.update({f"m_{i}_{j}": 0.0
                         for i in range(kk) for j in range(kk)})

    state_columns = (["vertex"] + [f"y{j}" for j in range(kk)]
                     + [f"x{j}" for j in range(kk)]
                     + [f"p{j}" for j in range(kk)])
    res = al.run_aligned_loop(
        state=state,
        csr_descriptors=blocks,
        gather_fn=gather_fn,
        apply_fn=apply_fn,
        scalars=init_scalars,
        make_scalars=make_scalars,
        converged=lambda scalars, it: it + 1 >= fixed_iterations,
        max_iter=fixed_iterations,
        state_columns=state_columns,
        check_every=1,
        engine=engine,
    )

    # Rayleigh–Ritz: m is exact and symmetric in the orthonormal
    # basis stored in the p{j} columns
    proj = np.zeros((kk, kk))
    for i in range(kk):
        for j in range(kk):
            proj[i, j] = res.scalars.get(f"m_{i}_{j}", 0.0)
    proj = 0.5 * (proj + proj.T)
    evals, W = np.linalg.eigh(proj)
    # stable ordering: shifted magnitude descending, algebraic value as
    # the deterministic tie-break (argsort alone is not stable)
    order = np.lexsort((-evals, -np.abs(evals)))[:k]  # drop guard vectors
    evals = evals[order]
    W = W[:, order]
    scale = (np.ones(k) if variant == "matrix"
             else np.sqrt(np.abs(evals)))
    rot = ray.put(W * scale[None, :])

    @ray.remote
    def _cands(block: dict):
        """Per-block sign candidates only — k small tuples land on the
        driver, never the embedding itself."""
        X = np.stack([block[f"p{j}"] for j in range(kk)], axis=1)
        E = X @ ray.get(rot)
        cand = []
        for j in range(E.shape[1]):
            col = E[:, j]
            if len(col):
                a = np.abs(col)
                mx = a.max()
                ties = np.flatnonzero(a == mx)
                cand.append((float(mx), int(block["vertex"][ties[0]]),
                             1.0 if col[ties[0]] >= 0 else -1.0))
            else:
                cand.append((-1.0, -1, 1.0))
        return cand

    all_cands = ray.get([_cands.remote(b) for b in res.aligned_state.blocks])
    signs = np.ones(k)
    for j in range(k):
        best = max((c[j] for c in all_cands), key=lambda t: (t[0], -t[1]))
        signs[j] = best[2]
    sref = ray.put(signs)

    @ray.remote
    def _final(block: dict) -> pa.Table:
        s = ray.get(sref)
        X = np.stack([block[f"p{j}"] for j in range(kk)], axis=1)
        E = X @ ray.get(rot)
        cols = {"vertex": pa.array(block["vertex"], pa.int64())}
        for j in range(E.shape[1]):
            cols[f"d{j}"] = pa.array(E[:, j] * s[j], pa.float64())
        return pa.table(cols)

    res.state = ray.data.from_arrow_refs(
        [_final.remote(b) for b in res.aligned_state.blocks])
    res.scalars["eigenvalues"] = [float(x - shift) for x in evals]
    return res


def dim_select(sv: np.ndarray) -> int:
    """igraph_dim_select (embedding.c:1054; Zhu & Ghodsi 2006 profile
    likelihood): the split point of a (descending) singular-value
    vector maximizing the two-group shared-variance Gaussian profile
    log-likelihood. Vectorized closed form: prefix/suffix sums give
    every split's means and variances at once."""
    sv = np.asarray(sv, np.float64)
    n = len(sv)
    if n == 0:
        raise ValueError("need at least one singular value")
    if n == 1:
        return 1
    pre = np.cumsum(sv)
    pre2 = np.cumsum(sv * sv)
    tot, tot2 = pre[-1], pre2[-1]
    best, best_dim = -np.inf, 1
    for i in range(n):  # group 1 = sv[:i+1]
        n1 = i + 1
        n2 = n - n1
        sum1, sumsq1 = pre[i], pre2[i]
        sum2, sumsq2 = tot - sum1, tot2 - sumsq1
        mean1 = sum1 / n1
        mean2 = sum2 / n2 if n2 else 0.0
        varsq1 = sumsq1 - n1 * mean1 * mean1
        varsq2 = (sumsq2 - n2 * mean2 * mean2) if n2 else 0.0
        if n2 == 0:
            sd = np.sqrt(max(varsq1, 0.0) / (n - 1))
        elif n == 2:
            # the reference's sd is 0/0 = NaN here; its NaN profile
            # never wins a strict comparison — skip the split
            continue
        else:
            sd = np.sqrt(max(varsq1 + varsq2, 0.0) / (n - 2))
        if sd <= 0:
            # the reference's -n·log(0) → +inf: a zero-variance split
            # wins outright (first such split under strict >)
            profile = np.inf
        else:
            profile = (-n * np.log(sd)
                       - (varsq1 + varsq2) / (2.0 * sd * sd))
        if profile > best:
            best, best_dim = profile, n1
    return int(best_dim)


def eigen_adjacency(graph: Graph, k: int = 2, iters: int = 40,
                    num_partitions: int = 8):
    """igraph_eigen_adjacency (igraph_eigen.h surface): the leading
    eigenpairs of the (symmetrized) adjacency operator. The engine's
    per-algorithm eigensolver IS the adjacency spectral embedding — the
    ASE superstep computes exactly these pairs (X = U·|S|^(1/2), so the
    eigenvalues are recoverable from the returned spectrum); this alias
    pins the functions.def name onto it."""
    return adjacency_spectral_embedding(graph, k=k, fixed_iterations=iters,
                                        num_partitions=num_partitions)
