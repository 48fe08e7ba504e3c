"""Walktrap community detection (Pons–Latapy random-walk distances).

Reference semantics: igraph_community_walktrap
(/root/reference/src/walktrap.cpp — Pons & Latapy 2005): vertices start
as singleton communities; the pair of ADJACENT communities whose merge
minimizes Δσ = (1/n)·(|C1||C2|/(|C1|+|C2|))·r²(C1,C2) is merged
repeatedly, where r²(C1,C2) = Σ_k (P^t_{C1,k} − P^t_{C2,k})²/d(k) is
the squared t-step random-walk probability distance (t=4 default, the
reference's default) and P^t_C is the member-mean of the t-step walk
distributions. Merges are recorded as a dendrogram with the modularity
after each step; the returned partition is the max-modularity cut.

Distributed shape: the weighted undirected aggregation is a distributed
groupby (shared with fastgreedy); the walk matrix and the merge loop —
O(V²) memory by definition — run inside ONE Ray task, guarded by
``max_vertices`` (honest ceiling; the scale path for communities is
algorithms/louvain.py / lpa.py). Ties break deterministically by
(Δσ, c1, c2); community names are the min member vertex id.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.algorithms.fastgreedy import _aggregate_und, und_arrays_ref


def community_walktrap(
    graph: Graph,
    steps: int = 4,
    n: Optional[int] = None,
    max_vertices: int = 4096,
) -> Tuple[pa.Table, pa.Table]:
    """Returns (merges, membership):

    * merges — (step, c1, c2, dsigma_e9, q_e9): the merged pair (c1 <
      c2, merged community keeps name c1), Δσ ×10⁹ and modularity ×10⁹
      (both rounded) AFTER the merge.
    * membership — (vertex, community) at the max-modularity cut,
      community ids dense-ranked by min member vertex.
    """
    n = n if n is not None else graph.num_vertices()
    if n > max_vertices:
        raise NotImplementedError(
            f"walktrap's walk matrix is O(V^2); guarded to {max_vertices} "
            f"vertices ({n} present) — use louvain()/lpa() at scale")
    agg = _aggregate_und(graph).materialize()
    arrays = und_arrays_ref(agg)
    t_steps = steps

    @ray.remote
    def _walktrap(arrs):
        lo, hi, w = arrs
        A = np.zeros((n, n), dtype=np.float64)
        A[lo, hi] = w
        A[hi, lo] = w
        d = A.sum(axis=1)
        d_safe = np.where(d > 0, d, 1.0)
        P = A / d_safe[:, None]
        iso = d <= 0
        P[iso, :] = 0.0
        P[iso, iso] = 1.0  # isolated vertices stay put
        Pt = np.linalg.matrix_power(P, t_steps)
        inv_d = 1.0 / d_safe  # distance metric weights 1/d(k)

        total_w = w.sum()
        inv2m = 1.0 / (2.0 * total_w) if total_w > 0 else 0.0

        # community state: mean walk vector, size, strength-fractions
        vec = Pt.copy()                      # row c = P^t_C (mean)
        size = np.ones(n, dtype=np.int64)
        a = d * inv2m                        # Σ strength / 2m per comm
        adj = [set() for _ in range(n)]      # community adjacency
        for x, y in zip(lo.tolist(), hi.tolist()):
            adj[x].add(y)
            adj[y].add(x)
        alive = np.ones(n, dtype=bool)
        q = -float((a * a).sum())

        def _dsig(c1: int, c2: int) -> float:
            diff = vec[c1] - vec[c2]
            r2 = float((diff * diff * inv_d).sum())
            return (size[c1] * size[c2]) / (size[c1] + size[c2]) * r2 / n

        merges = []
        n_alive = n
        while n_alive > 1:
            best = None
            for c1 in range(n):
                if not alive[c1]:
                    continue
                for c2 in adj[c1]:
                    if c2 > c1 and alive[c2]:
                        ds = _dsig(c1, int(c2))
                        key = (ds, c1, int(c2))
                        if best is None or key < best:
                            best = key
            if best is None:
                break  # multiple components, no adjacent pair left
            ds, c1, c2 = best
            # merge c2 into c1
            vec[c1] = (size[c1] * vec[c1] + size[c2] * vec[c2]) / (
                size[c1] + size[c2])
            size[c1] += size[c2]
            a[c1] += a[c2]
            alive[c2] = False
            adj[c1].discard(c2)
            adj[c2].discard(c1)
            for z in adj[c2]:
                adj[z].discard(c2)
                if z != c1:
                    adj[z].add(c1)
                    adj[c1].add(z)
            adj[c2] = set()
            n_alive -= 1
            merges.append((c1, c2, ds))

        # modularity after each merge via union-find replay (in-task:
        # the edge arrays stay worker-side)
        parent = np.arange(n, dtype=np.int64)

        def find(v: int) -> int:
            while parent[v] != v:
                parent[v] = parent[parent[v]]
                v = parent[v]
            return v

        W = w.sum()
        strength = np.zeros(n)
        np.add.at(strength, lo, w)
        np.add.at(strength, hi, w)
        qs = []
        for c1, c2, ds in merges:
            parent[find(c2)] = find(c1)
            roots = np.array([find(v) for v in range(n)])
            e_in = np.zeros(n)
            same = roots[lo] == roots[hi]
            np.add.at(e_in, roots[lo[same]], w[same])
            a_c = np.zeros(n)
            np.add.at(a_c, roots, strength)
            qs.append(float((e_in / W).sum()
                            - ((a_c / (2 * W)) ** 2).sum())
                      if W > 0 else 0.0)

        # best-cut membership, also in-task
        parent = np.arange(n, dtype=np.int64)
        if merges:
            best = int(np.argmax(np.array(qs)))
            for c1, c2, _ in merges[: best + 1]:
                parent[find(c2)] = find(c1)
        member = np.array([find(v) for v in range(n)], dtype=np.int64)
        return merges, qs, member

    raw, qs, member = ray.get(_walktrap.remote(arrays))

    merges_t = pa.table({
        "step": pa.array(np.arange(len(raw), dtype=np.int64)),
        "c1": pa.array([m[0] for m in raw], pa.int64()),
        "c2": pa.array([m[1] for m in raw], pa.int64()),
        "dsigma_e9": pa.array([int(round(m[2] * 1e9)) for m in raw],
                              pa.int64()),
        "q_e9": pa.array([int(round(x * 1e9)) for x in qs], pa.int64()),
    })
    uniq, inv = np.unique(member, return_inverse=True)
    membership = pa.table({
        "vertex": pa.array(np.arange(n, dtype=np.int64)),
        "community": pa.array(inv.astype(np.int64)),
    })
    return merges_t, membership
