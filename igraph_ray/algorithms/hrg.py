"""Hierarchical random graphs — the engine's counterpart of the
igraph_hrg_* family (/root/reference/src/igraph_hrg.cc,
include/igraph_hrg.h:76-117; Clauset, Moore & Newman, "Hierarchical
structure and the prediction of missing links in networks", Nature
453:98 (2008)).

An HRG is a binary dendrogram over the n vertices whose n-1 internal
nodes each carry a connection probability p_r; the likelihood of a
graph given the dendrogram is  L(D) = Π_r p_r^{E_r} (1-p_r)^{L_r R_r -
E_r}  where L_r/R_r are the leaf counts of r's subtrees and E_r the
observed edges whose endpoints' lowest common ancestor is r. At the
MLE  p_r = E_r/(L_r R_r)  the log-likelihood decomposes into
independent per-internal-node terms  h(r) = E_r ln p_r + (L_r R_r -
E_r) ln(1-p_r)  (CMN 2008 supplement eq. 4).

The reference fits by MCMC over subtree rotations
(igraph_hrg.cc `fit`/`markovChainMonteCarlo`) — an RNG-dependent
sampler whose output is a draw, not a function of the input, so it has
no distributed counterpart with matching semantics. The engine's
deterministic replacement maximizes the same objective greedily:
agglomerative merging where each step picks the CONNECTED cluster pair
whose merge node has the largest h(r) (least-negative: merges that are
near-cliques or near-empty across are preferred — exactly the low
null-entropy structure the MCMC converges toward), deterministic ties
by smallest (min-vertex-id, min-vertex-id) pair; once no connected
pairs remain, residual components chain-merge in min-id order with
E_r = 0 (h = 0). Like CNM fastgreedy the merge loop is inherently
sequential, so it runs inside ONE Ray task over the broadcast
aggregated (lo, hi) arrays (`fastgreedy.und_arrays_ref` — the edge
data never lands on the driver), guarded by ``max_edges``.

`hrg_predict` (igraph_hrg.cc `predict` semantics, deterministic
variant): missing-link scores are the fitted p_LCA of each non-adjacent
pair; the engine enumerates internal nodes in descending-p order and
emits their cross pairs (every pair whose LCA is r scores p_r) until k
non-edges are collected — top-k without touching the full O(n²) pair
space when p is concentrated.

`hrg_game` (igraph_hrg_game, igraph_hrg.cc) over an EXPLICIT balanced
dendrogram (the `hrg_create` route, not a fitted one): n = 2^depth
leaves, one probability per level, LCA level of (i, j) =
floor(log2(i XOR j)) — so the generator is a pure per-pair md5-draw
rule, identical at any parallelism and SQL-replayable (the driver
oracle recomputes every draw with integer-exact thresholds, like the
callaway/establishment games).
"""

from __future__ import annotations

import dataclasses
import hashlib
import heapq
import math
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.algorithms.fastgreedy import _aggregate_und, und_arrays_ref

HEX15 = 16 ** 15


@dataclasses.dataclass
class HRGResult:
    dendrogram: pa.Table  # (node, left, right, pairs, edges, prob_e9)
    loglik: float         # sum of per-internal-node h(r) at the MLE
    predictions: Optional[pa.Table] = None  # (src, dst, prob_e9)


def _h_term(e: float, lr: float) -> float:
    """Per-internal-node MLE log-likelihood E ln p + (LR-E) ln(1-p),
    with the 0·ln 0 = 0 convention (p = 0 or 1 contributes 0)."""
    if e <= 0.0 or e >= lr:
        return 0.0
    p = e / lr
    return e * math.log(p) + (lr - e) * math.log(1.0 - p)


def _greedy_fit(lo, hi, n: int, predict_k: int):
    """Sequential greedy MLE agglomeration (runs inside one Ray task).
    Returns (rows, loglik, predictions): rows = one (node, left, right,
    pairs, edges, prob_e9) tuple per internal node n..2n-2."""
    size = np.ones(n, dtype=np.int64)
    minv = np.arange(n, dtype=np.int64)   # deterministic tie-break name
    node_of = np.arange(n, dtype=np.int64)  # cluster -> dendrogram node id
    nbr: List[dict] = [dict() for _ in range(n)]
    for a, b in zip(lo, hi):
        a, b = int(a), int(b)
        nbr[a][b] = nbr[a].get(b, 0) + 1
        nbr[b][a] = nbr[b].get(a, 0) + 1
    # members tracked only when predictions are requested (small-to-
    # large concatenation: O(n log n) copies on balanced merges)
    members: List[Optional[np.ndarray]] = (
        [np.array([v], np.int64) for v in range(n)] if predict_k else
        [None] * n)
    alive = np.ones(n, dtype=bool)

    def score(x: int, y: int) -> float:
        return _h_term(float(nbr[x].get(y, 0)), float(size[x] * size[y]))

    heap: list = []
    for x in range(n):
        for y in nbr[x]:
            if y > x:
                a, b = sorted((int(minv[x]), int(minv[y])))
                heapq.heappush(heap, (-score(x, y), a, b, x, y,
                                      nbr[x][y], int(size[x]), int(size[y])))
    rows = []      # (node, left, right, pairs, edges, prob_e9)
    internal = []  # (prob, node_id, left_members, right_members) for predict
    loglik = 0.0
    next_node = n

    def merge(x: int, y: int, e_xy: int):
        nonlocal next_node, loglik
        lr = int(size[x]) * int(size[y])
        loglik += _h_term(float(e_xy), float(lr))
        left, right = (x, y) if minv[x] <= minv[y] else (y, x)
        rows.append((next_node, int(node_of[left]), int(node_of[right]),
                     lr, e_xy, int(round(e_xy / lr * 1e9))))
        if predict_k:
            internal.append((e_xy / lr, next_node,
                             members[left], members[right]))
            members[x] = np.concatenate([members[left], members[right]])
            members[y] = None
        # fold y's adjacency into x (disconnected chain merges have no
        # cross entry to drop)
        nbr[x].pop(y, None)
        nbr[y].pop(x, None)
        for w, c in nbr[y].items():
            nbr[x][w] = nbr[x].get(w, 0) + c
            d = nbr[w]
            d[x] = d.get(x, 0) + c
            del d[y]
        nbr[y].clear()
        alive[y] = False
        size[x] += size[y]
        minv[x] = min(minv[x], minv[y])
        node_of[x] = next_node
        next_node += 1
        for w in nbr[x]:
            a, b = sorted((int(minv[x]), int(minv[w])))
            heapq.heappush(heap, (-score(x, w), a, b, x, w,
                                  nbr[x][w], int(size[x]), int(size[w])))

    while heap:
        ns, _, _, x, y, e_xy, sx, sy = heapq.heappop(heap)
        if not (alive[x] and alive[y]):
            continue
        if nbr[x].get(y, 0) != e_xy or size[x] != sx or size[y] != sy:
            continue  # stale lazy-deletion entry; a fresh one exists
        merge(x, y, e_xy)
    # residual disconnected components: chain-merge in min-id order
    roots = sorted(int(v) for v in np.flatnonzero(alive))
    while len(roots) > 1:
        merge(roots[0], roots[1], 0)
        roots = [roots[0]] + roots[2:]

    predictions = []
    if predict_k:
        edge_keys = np.asarray(lo, np.int64) * n + np.asarray(hi, np.int64)
        got = 0
        cut = None
        for p, node_id, lm, rm in sorted(
                internal, key=lambda t: (-t[0], t[1])):
            if cut is not None and p < cut:
                break
            s = np.repeat(lm, len(rm))
            d = np.tile(rm, len(lm))
            swap = s > d
            s2 = np.where(swap, d, s)
            d2 = np.where(swap, s, d)
            keep = ~np.isin(s2 * n + d2, edge_keys)
            pe9 = int(round(p * 1e9))
            predictions.extend(
                (int(a), int(b), pe9) for a, b in zip(s2[keep], d2[keep]))
            got += int(keep.sum())
            if got >= predict_k and cut is None:
                cut = p  # finish every node tied at this probability
        predictions.sort(key=lambda t: (-t[2], t[0], t[1]))
        predictions = predictions[:predict_k]
    return rows, loglik, predictions


def hrg_fit(
    graph: Graph,
    n: Optional[int] = None,
    predict_k: int = 0,
    max_edges: int = 1 << 21,
) -> HRGResult:
    """Deterministic greedy-MLE dendrogram fit (igraph_hrg_fit
    contract: an igraph_hrg_t of n-1 internal nodes with probabilities;
    left/right children here are node ids — leaves 0..n-1, internal
    n..2n-2, root 2n-2). ``predict_k`` > 0 additionally returns the
    top-k missing-link predictions (igraph_hrg_predict semantics).
    Guarded sequential merge loop, same ceiling style as fastgreedy."""
    n = n if n is not None else graph.num_vertices()
    agg = _aggregate_und(graph).materialize()
    ne = agg.count()
    if ne > max_edges:
        raise NotImplementedError(
            f"HRG greedy agglomeration is sequential; guarded to "
            f"{max_edges} aggregated edges ({ne} present)")
    arrays = und_arrays_ref(agg)

    @ray.remote
    def _fit(arrs):
        lo, hi, _w = arrs
        return _greedy_fit(lo, hi, n, predict_k)

    rows, loglik, preds = ray.get(_fit.remote(arrays))
    dendro = pa.table({
        "node": pa.array([r[0] for r in rows], pa.int64()),
        "left": pa.array([r[1] for r in rows], pa.int64()),
        "right": pa.array([r[2] for r in rows], pa.int64()),
        "pairs": pa.array([r[3] for r in rows], pa.int64()),
        "edges": pa.array([r[4] for r in rows], pa.int64()),
        "prob_e9": pa.array([r[5] for r in rows], pa.int64()),
    })
    pred_table = None
    if predict_k:
        pred_table = pa.table({
            "src": pa.array([p[0] for p in preds], pa.int64()),
            "dst": pa.array([p[1] for p in preds], pa.int64()),
            "prob_e9": pa.array([p[2] for p in preds], pa.int64()),
        })
    return HRGResult(dendrogram=dendro, loglik=loglik,
                     predictions=pred_table)


def hrg_loglik(dendrogram: pa.Table) -> float:
    """Recompute Σ_r h(r) from a dendrogram table (cross-check)."""
    e = dendrogram["edges"].to_numpy(zero_copy_only=False)
    lr = dendrogram["pairs"].to_numpy(zero_copy_only=False)
    return float(sum(_h_term(float(a), float(b)) for a, b in zip(e, lr)))


def hrg_game(
    depth: int,
    level_p_e6: List[int],
    seed: int = 42,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """igraph_hrg_game over an explicit balanced dendrogram: n =
    2**depth leaves; the pair (i, j) has its LCA at level
    floor(log2(i XOR j)) (level 0 = deepest internal nodes) and is an
    edge iff the independent md5 15-hex draw of (seed, i, j) is below
    the integer threshold floor(level_p_e6[level] · 16^15 / 1e6).
    Pure per-pair rule: identical at any parallelism, SQL-replayable.
    Emits undirected (src, dst) with src < dst. O(n²/P) draw scan per
    task — a generator over the full pair space, same honesty class as
    the reference's own O(n²) loop (igraph_hrg.cc `igraph_hrg_game`)."""
    if len(level_p_e6) != depth:
        raise ValueError("need one probability per level (depth levels)")
    n = 1 << depth
    thr = np.array([int(p) * HEX15 // 1_000_000 for p in level_p_e6],
                   dtype=np.uint64)
    pows = (1 << np.arange(depth, dtype=np.int64))  # 2^0 .. 2^(depth-1)

    def _gen(batch: pa.Table) -> pa.Table:
        outs_s, outs_d = [], []
        for i in batch["id"].to_numpy(zero_copy_only=False):
            i = int(i)
            j = np.arange(i + 1, n, dtype=np.int64)
            if not len(j):
                continue
            lvl = np.searchsorted(pows, np.bitwise_xor(i, j),
                                  side="right") - 1
            draws = np.array(
                [int(hashlib.md5(f"{seed}:h:{i}:{int(jj)}".encode())
                     .hexdigest()[:15], 16) for jj in j], dtype=np.uint64)
            keep = draws < thr[lvl]
            outs_s.append(np.full(int(keep.sum()), i, np.int64))
            outs_d.append(j[keep])
        if not outs_s:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return pa.table({"src": pa.array(np.concatenate(outs_s)),
                         "dst": pa.array(np.concatenate(outs_d))})

    return (ray.data.range(n, override_num_blocks=num_partitions)
            .map_batches(_gen, batch_format="pyarrow", batch_size=None))


def hrg_dendrogram(result: HRGResult) -> pa.Table:
    """igraph_hrg_dendrogram (igraph_hrg.cc): the fitted dendrogram as
    a graph — one (parent, child, prob_e9) edge per internal-node
    child slot (leaves 0..n-1, internal n..2n-2, root 2n-2)."""
    d = result.dendrogram
    node = d["node"].to_numpy(zero_copy_only=False)
    left = d["left"].to_numpy(zero_copy_only=False)
    right = d["right"].to_numpy(zero_copy_only=False)
    prob = d["prob_e9"].to_numpy(zero_copy_only=False)
    return pa.table({
        "parent": pa.array(np.concatenate([node, node])),
        "child": pa.array(np.concatenate([left, right])),
        "prob_e9": pa.array(np.concatenate([prob, prob])),
    })


def hrg_sample(
    result: HRGResult,
    n: int,
    seed: str = "hrgs",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """igraph_hrg_sample (igraph_hrg.cc): draw a graph from a fitted
    HRG — pair (i, j) is an edge with probability p_LCA(i,j). The
    reference samples with its RNG; the engine's draw is the repo's
    deterministic 15-hex md5 fold per unordered pair, so the sample is
    a pure function of (dendrogram, seed) and identical at any
    parallelism. The dendrogram (O(n) rows) is broadcast once; each
    task walks leaf→root ancestor chains for its pair block."""
    import hashlib

    d = result.dendrogram
    node = d["node"].to_numpy(zero_copy_only=False)
    left = d["left"].to_numpy(zero_copy_only=False)
    right = d["right"].to_numpy(zero_copy_only=False)
    prob = d["prob_e9"].to_numpy(zero_copy_only=False)
    parent = np.full(2 * n - 1, -1, dtype=np.int64)
    p_of = np.zeros(2 * n - 1, dtype=np.int64)
    for nd, l, r, p in zip(node, left, right, prob):
        parent[l] = nd
        parent[r] = nd
        p_of[nd] = p
    dref = ray.put((parent, p_of))

    HEX15 = 16 ** 15

    def _gen(b: pa.Table) -> pa.Table:
        par, pe9 = ray.get(dref)
        depth = np.zeros(len(par), dtype=np.int64)
        for v in range(len(par)):
            d_, u = 0, v
            while par[u] != -1:
                u = par[u]
                d_ += 1
            depth[v] = d_
        srcs, dsts = [], []
        for i in b["id"].to_numpy(zero_copy_only=False).tolist():
            for j in range(i + 1, n):
                a, bb = i, j
                da, db = depth[a], depth[b_ := bb]
                while da > db:
                    a = par[a]
                    da -= 1
                while db > da:
                    b_ = par[b_]
                    db -= 1
                while a != b_:
                    a = par[a]
                    b_ = par[b_]
                thr = int(pe9[a])  # prob_e9 of the LCA (py int: the
                # 16^15-scale integer compare overflows int64)
                h = int(hashlib.md5(
                    f"{seed}:{i}:{j}".encode()).hexdigest()[:15], 16)
                if h * 1_000_000_000 < thr * HEX15:
                    srcs.append(i)
                    dsts.append(j)
        return pa.table({"src": pa.array(srcs, pa.int64()),
                         "dst": pa.array(dsts, pa.int64())})

    return ray.data.range(n, override_num_blocks=num_partitions
                          ).map_batches(_gen, batch_format="pyarrow",
                                        batch_size=None)
