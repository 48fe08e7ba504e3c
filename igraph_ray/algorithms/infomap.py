"""Infomap community detection (two-level map equation).

Reference semantics: igraph_community_infomap
(/root/reference/src/infomap.cc — Rosvall & Bergström 2008): find the
partition M minimizing the two-level map equation

    L(M) = plogp(q) − 2·Σ_m plogp(q_m) + Σ_m plogp(p_m∘)
           − Σ_v plogp(p_v),   plogp(x) = x·log₂x

over the undirected weighted graph, with visit rates p_v = s_v/2W
(stationary distribution of the unrecorded walk), module exit rates
q_m = cut(m)/2W, q = Σ q_m and p_m∘ = q_m + Σ_{v∈m} p_v. The
reference's solver is stochastic local moving + recursive calls (RNG
not reproducible across implementations); this engine uses the
DETERMINISTIC greedy agglomeration of the same objective — repeatedly
merge the adjacent community pair with the largest codelength decrease
until no merge improves (ties: smallest (c1, c2); community names are
min member vertex ids), exactly the CNM pattern with L in place of Q.

Distributed shape: strengths and the community-graph weights come from
the shared distributed groupby (fastgreedy._aggregate_und); the merge
loop is sequential by nature and runs inside ONE Ray task over the
broadcast arrays, guarded by ``max_vertices`` (the scale path for
communities is louvain()/lpa()). Every merge's ΔL depends on the global
q term, so candidate scores are rescanned per round (walktrap-style)
rather than heap-cached.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.algorithms.fastgreedy import _aggregate_und, und_arrays_ref


def _plogp(x: float) -> float:
    return x * np.log2(x) if x > 0 else 0.0


def codelength(lo, hi, w, member: np.ndarray) -> float:
    """Two-level map equation of a given partition (exact, for tests
    and the L sequence)."""
    W = float(np.sum(w))
    if W <= 0:
        return 0.0
    n = len(member)
    s = np.zeros(n)
    np.add.at(s, lo, w)
    np.add.at(s, hi, w)
    p_v = s / (2 * W)
    cut = np.zeros(n)
    diff = member[lo] != member[hi]
    np.add.at(cut, member[lo[diff]], w[diff])
    np.add.at(cut, member[hi[diff]], w[diff])
    q_m = cut / (2 * W)
    p_sum = np.zeros(n)
    np.add.at(p_sum, member, p_v)
    p_circ = q_m + p_sum
    q = float(q_m.sum())
    return (_plogp(q) - 2 * sum(_plogp(x) for x in q_m)
            + sum(_plogp(x) for x in p_circ)
            - sum(_plogp(x) for x in p_v))


def community_infomap(
    graph: Graph,
    n: Optional[int] = None,
    max_vertices: int = 4096,
) -> Tuple[pa.Table, pa.Table]:
    """Returns (merges, membership):

    * merges — (step, c1, c2, codelen_e9): the merged pair and the map
      equation ×10⁹ (rounded) AFTER the merge; the sequence is strictly
      decreasing (greedy stops at the first non-improving round).
    * membership — (vertex, community) at the stopping partition,
      community ids dense-ranked by min member vertex.
    """
    n = n if n is not None else graph.num_vertices()
    if n > max_vertices:
        raise NotImplementedError(
            f"greedy infomap is guarded to {max_vertices} vertices "
            f"({n} present) — use louvain()/lpa() at scale")
    agg = _aggregate_und(graph).materialize()
    arrays = und_arrays_ref(agg)

    @ray.remote
    def _greedy(arrs):
        lo, hi, w = arrs
        W = float(np.sum(w))
        if W <= 0:
            return [], [], np.arange(n, dtype=np.int64)
        inv2w = 1.0 / (2.0 * W)
        s = np.zeros(n)
        np.add.at(s, lo, w)
        np.add.at(s, hi, w)
        p_v = s * inv2w

        # community state
        e: list = [dict() for _ in range(n)]   # inter-community weights
        for i in range(len(lo)):
            x, y, ww = int(lo[i]), int(hi[i]), w[i] * inv2w
            e[x][y] = e[x].get(y, 0.0) + ww
            e[y][x] = e[y].get(x, 0.0) + ww
        q_m = np.array([sum(d.values()) for d in e])  # singleton exits
        p_sum = p_v.copy()
        alive = np.ones(n, dtype=bool)
        q_tot = float(q_m.sum())

        def plogp(x):
            return x * np.log2(x) if x > 0 else 0.0

        merges = []
        while True:
            best = None
            for c1 in range(n):
                if not alive[c1]:
                    continue
                for c2, c12 in e[c1].items():
                    if c2 <= c1 or not alive[c2]:
                        continue
                    qn = q_m[c1] + q_m[c2] - 2 * c12
                    dl = (plogp(q_tot - 2 * c12) - plogp(q_tot)
                          - 2 * (plogp(qn) - plogp(q_m[c1])
                                 - plogp(q_m[c2]))
                          + plogp(qn + p_sum[c1] + p_sum[c2])
                          - plogp(q_m[c1] + p_sum[c1])
                          - plogp(q_m[c2] + p_sum[c2]))
                    key = (dl, c1, int(c2))
                    if best is None or key < best:
                        best = key
            if best is None or best[0] >= -1e-12:
                break  # no improving merge
            dl, c1, c2 = best
            c12 = e[c1][c2]
            q_tot -= 2 * c12
            q_m[c1] = q_m[c1] + q_m[c2] - 2 * c12
            q_m[c2] = 0.0
            p_sum[c1] += p_sum[c2]
            alive[c2] = False
            del e[c1][c2]
            del e[c2][c1]
            for z, eyz in list(e[c2].items()):
                del e[z][c2]
                e[c1][z] = e[c1].get(z, 0.0) + eyz
                e[z][c1] = e[c1][z]
            e[c2].clear()
            merges.append((c1, c2))

        # codelength sequence + final membership, in-task (edge arrays
        # stay worker-side)
        parent = np.arange(n, dtype=np.int64)

        def find(v: int) -> int:
            while parent[v] != v:
                parent[v] = parent[parent[v]]
                v = parent[v]
            return v

        codelens = []
        for c1, c2 in merges:
            parent[find(c2)] = find(c1)
            mem = np.array([find(v) for v in range(n)], dtype=np.int64)
            codelens.append(codelength(lo, hi, w, mem))
        member = np.array([find(v) for v in range(n)], dtype=np.int64)
        return merges, codelens, member

    merges, codelens, member = ray.get(_greedy.remote(arrays))

    merges_t = pa.table({
        "step": pa.array(np.arange(len(merges), dtype=np.int64)),
        "c1": pa.array([m[0] for m in merges], pa.int64()),
        "c2": pa.array([m[1] for m in merges], pa.int64()),
        "codelen_e9": pa.array([int(round(x * 1e9)) for x in codelens],
                               pa.int64()),
    })
    uniq, inv = np.unique(member, return_inverse=True)
    membership = pa.table({
        "vertex": pa.array(np.arange(n, dtype=np.int64)),
        "community": pa.array(inv.astype(np.int64)),
    })
    return merges_t, membership
