"""Microscopic strategy-update rules (microscopic_update.c).

Reference semantics: per-vertex strategy revision over a game network —
``igraph_deterministic_optimal_imitation`` (:570, adopt the strategy of
the max/min-quantity vertex in N(v) ∪ {v}),
``igraph_roulette_wheel_imitation`` (:959, adopt a neighbor's strategy
with probability proportional to its quantity, retain with probability
q(v)/S), and ``igraph_moran_process`` (:723, one birth–death step:
reproducer drawn ∝ quantity globally, the replaced neighbor drawn ∝
incident edge weight).

The reference updates ONE vertex per call with C RNG ties/draws. This
module maps the identical per-vertex rule over the whole population as
synchronous rounds (the natural distributed reading), with the repo's
deterministic draw conventions so every result is a pure function of
(graph, seed) and SQL-replayable:

- neighbor iteration order = ascending vertex id (the engine's edge
  tables carry no insertion order);
- optimal-imitation ties = smallest vertex id among the optima, v
  itself winning ties against neighbors (the C code replaces only on
  strict improvement);
- random draws = md5("{seed}:r{round}:{v}") folded to 8 hex digits
  (32-bit), compared as exact integers: r ≤ V[i] ⇔ draw·S ≤ 2³²·cum —
  no float division on either side.

Scale shape: one boundary-aligned range sort per round makes every
vertex's neighbor run block-local; the per-round state join is a
broadcast/partitioned hash_join; all kernels are numpy segment scans.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.csr import compute_boundaries
from igraph_ray.graph import Graph
from igraph_ray.util import hash_join

_HEX8 = np.int64(1) << 32
_PACK = np.int64(1) << 31


def _fold8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def initial_state(vertices: ray.data.Dataset, seed: int,
                  n_strategies: int = 5,
                  q_mod: int = 1001) -> ray.data.Dataset:
    """(vertex, strategy, quantity): strategy = v mod n_strategies,
    quantity = md5 8-hex fold mod q_mod — both SQL-replayable."""
    def _init(b: pa.Table) -> pa.Table:
        v = b["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.array([_fold8(f"q:{seed}:{int(x)}") % q_mod for x in v],
                     np.int64)
        return pa.table({"vertex": pa.array(v),
                         "strategy": pa.array(v % n_strategies),
                         "quantity": pa.array(q)})

    return vertices.map_batches(_init, batch_format="pyarrow",
                                batch_size=None)


def _sym_edges(graph: Graph) -> ray.data.Dataset:
    from igraph_ray.ops.relational import _dedup

    und = graph.canonical_undirected()

    def _sym(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(np.concatenate([lo, hi])),
                         "dst": pa.array(np.concatenate([hi, lo]))})

    d = _dedup(und.map_batches(_sym, batch_format="pyarrow",
                               batch_size=None))
    return d.map_batches(
        lambda b: pa.table({"v": b["src"], "u": b["dst"]}),
        batch_format="pyarrow", batch_size=None).materialize()


def _joined_neighbors(sym: ray.data.Dataset, state: ray.data.Dataset,
                      num_partitions: int) -> ray.data.Dataset:
    """(v, u, u_strategy, u_quantity) — neighbor rows carrying the
    neighbor's current state."""
    nstate = state.map_batches(
        lambda b: pa.table({"u": b["vertex"], "u_strategy": b["strategy"],
                            "u_quantity": b["quantity"]}),
        batch_format="pyarrow", batch_size=None)
    return hash_join(sym, nstate, on="u", num_partitions=num_partitions)


def optimal_imitation(
    graph: Graph,
    seed: int = 7,
    rounds: int = 2,
    optimality: str = "max",
    n_strategies: int = 5,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Synchronous rounds of igraph_deterministic_optimal_imitation
    (microscopic_update.c:570, IGRAPH_ALL mode) over every vertex:
    v adopts the strategy of the strictly-better optimum neighbor
    (smallest id among ties), keeping its own strategy when it already
    attains the optimum. Returns (vertex, strategy, quantity)."""
    assert optimality in ("max", "min")
    sym = _sym_edges(graph)
    verts = Graph(sym.map_batches(
        lambda b: pa.table({"src": b["v"], "dst": b["u"]}),
        batch_format="pyarrow", batch_size=None)).vertices()
    state = initial_state(verts, seed, n_strategies).materialize()
    sign = 1 if optimality == "max" else -1
    for _ in range(rounds):
        j = _joined_neighbors(sym, state, num_partitions)

        def _pack(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "u" not in b.column_names:
                return pa.table({"vertex": pa.array([], pa.int64()),
                                 "packed": pa.array([], pa.int64())})
            q = b["u_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
            u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            s = b["u_strategy"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(u) and (u.max() >= _PACK or q.max() >= _PACK // 2):
                raise NotImplementedError(
                    "optimal_imitation packs (quantity, id, strategy); "
                    "quantities must fit 2^30 and ids 2^31")
            # maximize sign*q, then minimize id: key = sign*q*2^31 + (2^31-1-u)
            # strategy rides in the value via a second packed column
            key = sign * q * _PACK + (_PACK - 1 - u)
            t = pa.table({"vertex": b["v"], "packed": pa.array(key),
                          "st": pa.array(s)})
            # per-batch pre-combine: keep the argmax row per vertex
            order = np.lexsort((
                -t["packed"].to_numpy(zero_copy_only=False),
                t["vertex"].to_numpy(zero_copy_only=False)))
            vv = t["vertex"].to_numpy(zero_copy_only=False)[order]
            first = np.ones(len(vv), bool)
            first[1:] = vv[1:] != vv[:-1]
            return pa.table({
                "vertex": pa.array(vv[first]),
                "packed": pa.array(
                    t["packed"].to_numpy(zero_copy_only=False)[order][first]),
                "st": pa.array(
                    t["st"].to_numpy(zero_copy_only=False)[order][first])})

        # strategy must ride with the winning key: re-pair via a join on
        # (vertex, packed) after the grouped max
        pk = j.map_batches(_pack, batch_format="pyarrow", batch_size=None)
        best = pk.groupby("vertex").max("packed").map_batches(
            lambda b: (pa.table({"vertex": b["vertex"],
                                 "packed": b["max(packed)"]})
                       if b.num_rows else
                       pa.table({"vertex": pa.array([], pa.int64()),
                                 "packed": pa.array([], pa.int64())})),
            batch_format="pyarrow", batch_size=None)
        best = hash_join(best, pk, on=("vertex", "packed"),
                         num_partitions=num_partitions)

        def _best(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"vertex": pa.array([], pa.int64()),
                                 "b_q": pa.array([], pa.int64()),
                                 "b_st": pa.array([], pa.int64())})
            key = b["packed"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"vertex": b["vertex"],
                             "b_q": pa.array(sign * (key // _PACK)),
                             "b_st": b["st"]})

        # (vertex, packed) is unique across batches — packed encodes the
        # neighbor id, and each (v, u) edge row exists exactly once — so
        # the re-pair join cannot fan out
        best = best.map_batches(_best, batch_format="pyarrow",
                                batch_size=None)
        merged = hash_join(state, best, on="vertex",
                           num_partitions=num_partitions,
                           join_type="left_outer")

        def _adopt(b: pa.Table) -> pa.Table:
            q = b["quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
            s = b["strategy"].to_numpy(zero_copy_only=False).astype(np.int64)
            bq = b["b_q"].to_numpy(zero_copy_only=False)
            bs = b["b_st"].to_numpy(zero_copy_only=False)
            have = ~pa.compute.is_null(b["b_q"]).to_numpy(
                zero_copy_only=False)
            bq = (np.where(have, np.nan_to_num(bq.astype(np.float64)), 0)
                  .astype(np.int64) if have.any() else q)
            bs = (np.where(have, np.nan_to_num(bs.astype(np.float64)), 0)
                  .astype(np.int64) if have.any() else s)
            better = have & ((bq > q) if sign > 0 else (bq < q))
            return pa.table({"vertex": b["vertex"],
                             "strategy": pa.array(np.where(better, bs, s)),
                             "quantity": pa.array(q)})

        state = merged.map_batches(_adopt, batch_format="pyarrow",
                                   batch_size=None).materialize()
    return state.sort("vertex")


def roulette_wheel_imitation(
    graph: Graph,
    seed: int = 11,
    rounds: int = 2,
    n_strategies: int = 5,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Synchronous rounds of igraph_roulette_wheel_imitation
    (microscopic_update.c:959, islocal=True, IGRAPH_ALL): every vertex
    draws one 32-bit md5 value r and adopts the strategy of the first
    ascending-id neighbor u with r·S ≤ 2³²·cum(u), where cum is the
    running quantity sum over ascending neighbors and
    S = Σ_{u∈N(v)} q(u) + q(v); if the draw lands past every neighbor
    the vertex retains its strategy (the reference's appended-self
    rule). Returns (vertex, strategy, quantity)."""
    sym = _sym_edges(graph)
    verts = Graph(sym.map_batches(
        lambda b: pa.table({"src": b["v"], "dst": b["u"]}),
        batch_format="pyarrow", batch_size=None)).vertices()
    state = initial_state(verts, seed, n_strategies).materialize()
    bounds = compute_boundaries(sym, num_partitions, col="v")
    for rnd in range(rounds):
        j = _joined_neighbors(sym, state, num_partitions)
        # own quantity rides along for the denominator
        own = state.map_batches(
            lambda b: pa.table({"v": b["vertex"], "v_quantity": b["quantity"],
                                "v_strategy": b["strategy"]}),
            batch_format="pyarrow", batch_size=None)
        j = hash_join(j, own, on="v", num_partitions=num_partitions)
        aligned = (j.sort(["v", "u"], boundaries=bounds)
                   if bounds else j.sort(["v", "u"]))

        def _select(b: pa.Table, _r=rnd) -> pa.Table:
            if b.num_rows == 0 or "u" not in b.column_names:
                return pa.table({"vertex": pa.array([], pa.int64()),
                                 "new_strategy": pa.array([], pa.int64())})
            v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            uq = b["u_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
            us = b["u_strategy"].to_numpy(zero_copy_only=False).astype(np.int64)
            vq = b["v_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
            vs = b["v_strategy"].to_numpy(zero_copy_only=False).astype(np.int64)
            # rows are sorted (v, u); segment boundaries
            starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
            ends = np.r_[starts[1:], len(v)]
            cum = np.cumsum(uq)
            seg_off = np.repeat(np.r_[0, cum[ends[:-1] - 1]],
                                np.diff(np.r_[starts, len(v)]))
            cum = cum - seg_off
            seg_tot = cum[ends - 1]  # per segment Σ neighbor q
            out_v, out_s = [], []
            draws = np.array([_fold8(f"{seed}:r{_r}:{int(v[s])}")
                              for s in starts], np.int64)
            S = seg_tot + vq[starts]
            # r ≤ V[i]  ⇔  draw·S ≤ 2³²·cum  (exact int64: draw<2³²,
            # S ≤ Σq ≈ deg·1000 — caller keeps deg·q below 2³¹)
            lhs = draws * S
            for k, (s0, e0) in enumerate(zip(starts, ends)):
                hit = np.flatnonzero(_HEX8 * cum[s0:e0] >= lhs[k])
                out_v.append(int(v[s0]))
                out_s.append(int(us[s0 + hit[0]]) if len(hit)
                             else int(vs[s0]))
            return pa.table({"vertex": pa.array(out_v, pa.int64()),
                             "new_strategy": pa.array(out_s, pa.int64())})

        sel = aligned.map_batches(_select, batch_format="pyarrow",
                                  batch_size=None)
        merged = hash_join(state, sel, on="vertex",
                           num_partitions=num_partitions,
                           join_type="left_outer")

        def _apply(b: pa.Table) -> pa.Table:
            s = b["strategy"].to_numpy(zero_copy_only=False).astype(np.int64)
            ns = b["new_strategy"]
            have = ~pa.compute.is_null(ns).to_numpy(zero_copy_only=False)
            nsv = np.where(have, np.nan_to_num(
                ns.to_numpy(zero_copy_only=False).astype(np.float64)),
                s).astype(np.int64)
            return pa.table({"vertex": b["vertex"],
                             "strategy": pa.array(nsv),
                             "quantity": b["quantity"]})

        state = merged.map_batches(_apply, batch_format="pyarrow",
                                   batch_size=None).materialize()
    return state.sort("vertex")


# ------------------------------------------------------------- Moran

_MORAN_GUARD = 16_000_000


@ray.remote
def _moran_task(arrays, state_t: pa.Table, seed: int):
    src, dst = arrays
    if len(src) > _MORAN_GUARD:
        raise NotImplementedError(
            "moran_process single-task step is guarded at 16M edges (one "
            "birth-death step is a sequential two-draw selection)")
    v = state_t["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(v)
    v = v[order]
    q = state_t["quantity"].to_numpy(zero_copy_only=False).astype(
        np.int64)[order]
    s = state_t["strategy"].to_numpy(zero_copy_only=False).astype(
        np.int64)[order]
    # reproducer a: global roulette over ascending vertex id
    cum = np.cumsum(q)
    S1 = int(cum[-1])
    d1 = _fold8(f"{seed}:moran:a")
    # r ≤ cum/S1 ⇔ d1·S1 ≤ 2³²·cum
    ia = int(np.flatnonzero(_HEX8 * cum >= d1 * S1)[0])
    a = int(v[ia])
    # replaced neighbor b: roulette over a's undirected neighbors by
    # (unit) edge weight, ascending id
    nbrs = np.unique(np.concatenate([dst[src == a], src[dst == a]]))
    nbrs = nbrs[nbrs != a]
    if len(nbrs) == 0:
        out_v, out_s, out_q = v, s, q
    else:
        w = np.ones(len(nbrs), np.int64)
        cw = np.cumsum(w)
        S2 = int(cw[-1])
        d2 = _fold8(f"{seed}:moran:b")
        ib = int(np.flatnonzero(_HEX8 * cw >= d2 * S2)[0])
        bpos = int(np.searchsorted(v, nbrs[ib]))
        out_s, out_q = s.copy(), q.copy()
        out_s[bpos] = s[ia]
        out_q[bpos] = q[ia]
        out_v = v
    return pa.table({"vertex": pa.array(out_v), "strategy": pa.array(out_s),
                     "quantity": pa.array(out_q)})


def moran_process(graph: Graph, seed: int = 13,
                  n_strategies: int = 5) -> ray.data.Dataset:
    """One igraph_moran_process step (microscopic_update.c:723,
    IGRAPH_ALL, unit weights): reproducer a drawn ∝ quantity over all
    vertices ascending, clone replaces the neighbor b drawn ∝ incident
    edge weight ascending; b inherits a's strategy AND quantity.
    Deterministic md5 draws; ONE guarded task (single sequential
    step). Returns the post-step (vertex, strategy, quantity)."""
    from igraph_ray.algorithms.dominators import directed_arrays_ref
    from igraph_ray.util import _concat_tables, drop_empty_blocks

    sym = _sym_edges(graph)
    verts = Graph(sym.map_batches(
        lambda b: pa.table({"src": b["v"], "dst": b["u"]}),
        batch_format="pyarrow", batch_size=None)).vertices()
    state = initial_state(verts, seed, n_strategies).materialize()
    arr = directed_arrays_ref(sym.map_batches(
        lambda b: pa.table({"src": b["v"], "dst": b["u"]}),
        batch_format="pyarrow", batch_size=None))
    st_ref = _concat_tables.remote(drop_empty_blocks(state).to_arrow_refs())
    return ray.data.from_arrow(ray.get(
        _moran_task.remote(arr, st_ref, seed))).sort("vertex")


def stochastic_imitation(
    graph: Graph,
    algo: str = "augmented",
    seed: int = 19,
    rounds: int = 2,
    n_strategies: int = 5,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Synchronous rounds of igraph_stochastic_imitation
    (microscopic_update.c:1119, IGRAPH_ALL) over every vertex. Each
    vertex v draws one 32-bit md5 value r = fold8("{seed}:s{round}:{v}"):

    - ``blind``: u = (N(v) ascending + [v])[r mod (deg+1)] — v adopts
      u's strategy unconditionally (the reference appends v itself at
      the back of the candidate vector);
    - ``augmented``: u = N(v)[r mod deg], adopt iff q(u) > q(v);
    - ``contracted``: u = N(v)[r mod deg], adopt iff q(u) < q(v).

    Returns (vertex, strategy, quantity); fully SQL-replayable. Like
    the module's other rules, the vertex universe is derived from the
    symmetrized simple edge set, so vertices with no (non-loop)
    neighbors carry no state row — the reference's per-vid call
    errors on such vertices anyway (microscopic_standard_tests)."""
    assert algo in ("blind", "augmented", "contracted")
    sym = _sym_edges(graph)
    verts = Graph(sym.map_batches(
        lambda b: pa.table({"src": b["v"], "dst": b["u"]}),
        batch_format="pyarrow", batch_size=None)).vertices()
    state = initial_state(verts, seed, n_strategies).materialize()
    bounds = compute_boundaries(sym, num_partitions, col="v")
    for rnd in range(rounds):
        j = _joined_neighbors(sym, state, num_partitions)
        own = state.map_batches(
            lambda b: pa.table({"v": b["vertex"],
                                "v_quantity": b["quantity"],
                                "v_strategy": b["strategy"]}),
            batch_format="pyarrow", batch_size=None)
        j = hash_join(j, own, on="v", num_partitions=num_partitions)
        aligned = (j.sort(["v", "u"], boundaries=bounds)
                   if bounds else j.sort(["v", "u"]))

        def _select(b: pa.Table, _r=rnd) -> pa.Table:
            if b.num_rows == 0 or "u" not in b.column_names:
                return pa.table({"vertex": pa.array([], pa.int64()),
                                 "new_strategy": pa.array([], pa.int64())})
            v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            uq = b["u_quantity"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            us = b["u_strategy"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            vq = b["v_quantity"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            vs = b["v_strategy"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
            ends = np.r_[starts[1:], len(v)]
            deg = ends - starts
            draws = np.array([_fold8(f"{seed}:s{_r}:{int(v[s])}")
                              for s in starts], np.int64)
            out_v = v[starts]
            out_s = vs[starts].copy()
            if algo == "blind":
                idx = draws % (deg + 1)
                pick = idx < deg               # idx == deg keeps self
                pos = starts + np.minimum(idx, deg - 1)
                out_s = np.where(pick, us[pos], out_s)
            else:
                idx = draws % deg
                pos = starts + idx
                better = (uq[pos] > vq[starts] if algo == "augmented"
                          else uq[pos] < vq[starts])
                out_s = np.where(better, us[pos], out_s)
            return pa.table({"vertex": pa.array(out_v),
                             "new_strategy": pa.array(out_s)})

        sel = aligned.map_batches(_select, batch_format="pyarrow",
                                  batch_size=None)
        merged = hash_join(state, sel, on="vertex",
                           num_partitions=num_partitions,
                           join_type="left_outer")

        def _apply(b: pa.Table) -> pa.Table:
            s = b["strategy"].to_numpy(zero_copy_only=False).astype(np.int64)
            ns = b["new_strategy"]
            have = ~pa.compute.is_null(ns).to_numpy(zero_copy_only=False)
            nsv = np.where(have, np.nan_to_num(
                ns.to_numpy(zero_copy_only=False).astype(np.float64)),
                s).astype(np.int64)
            return pa.table({"vertex": b["vertex"],
                             "strategy": pa.array(nsv),
                             "quantity": b["quantity"]})

        state = merged.map_batches(_apply, batch_format="pyarrow",
                                   batch_size=None).materialize()
    return state.sort("vertex")
