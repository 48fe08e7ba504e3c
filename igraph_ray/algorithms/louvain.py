"""Distributed multilevel modularity optimization (Louvain) — the
engine's counterpart of igraph_community_multilevel
(/root/reference/src/community.c:2854, Blondel et al. 2008), re-expressed
for synchronous distributed execution in the style of parallel Louvain
implementations (Grappolo; Ghosh et al., "Distributed Louvain Algorithm
for Graph Community Detection", IPDPS 2018 — both public):

level loop:
  sweep loop (synchronous local moving):
    1. k_vc:   join community labels onto the symmetrized weighted edge
               table, groupby (v, comm) sum — the weight from v into each
               neighboring community (one shuffle).
    2. choose: per v, max modularity gain
               ΔQ = k_vc/m − deg_v·vol_c/(2m²)   (c ≠ current, self-loop
               corrected for leaving the current community); ties break
               to the smaller community id; the singleton-swap guard
               (only the smaller-id endpoint of a would-be mutual swap
               moves) prevents the classic synchronous oscillation.
    3. apply:  vertices with positive gain adopt the new label; community
               volumes recompute by one groupby.
    until no vertex moves (or max_sweeps).
  coarsen: contract edges by community (groupby sum), compose the
  vertex→community map through the level, recurse while the graph shrinks.

The reference's sequential algorithm visits vertices one at a time with
immediate effect; any distributed variant trades that for synchronous
rounds — community assignments differ in ties but modularity quality is
equivalent (validated against known-partition fixtures and a modularity
floor on karate in tests/test_louvain.py). Deterministic: no RNG, all
tie-breaks by min community id.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from igraph_ray.graph import Graph
from igraph_ray.util import hash_join


@dataclasses.dataclass
class LouvainResult:
    state: ray.data.Dataset  # (vertex, community) — canonical dense labels
    modularity: float
    levels: int
    sweeps: int


def _sym_weighted(graph: Graph) -> ray.data.Dataset:
    """Symmetrized loop-free weighted edge table (w=1 if unweighted):
    every undirected edge appears in both directions."""
    base = graph.without_loops()

    def _w(b: pa.Table) -> pa.Table:
        cols = {"src": b["src"], "dst": b["dst"]}
        if "weight" in b.column_names:
            cols["weight"] = pc.cast(b["weight"], pa.float64())
        else:
            cols["weight"] = pa.array(np.ones(b.num_rows), pa.float64())
        return pa.table(cols)

    def _flip(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["dst"], "dst": b["src"], "weight": b["weight"]})

    ew = base.map_batches(_w, batch_format="pyarrow", batch_size=None)
    return ew.union(ew.map_batches(_flip, batch_format="pyarrow", batch_size=None))


def _degrees(sym: ray.data.Dataset) -> ray.data.Dataset:
    """(vertex, deg): weighted degree over the symmetrized table."""
    g = sym.groupby("src").sum("weight")

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["src"], "deg": b["sum(weight)"]})

    return g.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def _volumes(assign: ray.data.Dataset, num_partitions: int) -> ray.data.Dataset:
    """(comm, vol, csize): total degree and member count per community."""
    g = assign.groupby("community").aggregate(Sum("deg"), Count())

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table(
            {"comm": b["community"], "vol": b["sum(deg)"],
             "csize": pc.cast(b["count()"], pa.int64())}
        )

    return g.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def choose_moves(
    v: np.ndarray,
    cand: np.ndarray,
    kv: np.ndarray,
    volc: np.ndarray,
    cur: np.ndarray,
    deg: np.ndarray,
    vol_own: np.ndarray,
    csize_c: np.ndarray,
    csize_own: np.ndarray,
    m2: float,
    integer_gains: bool = False,
    singleton_movers: bool = False,
    activation_salt: Optional[int] = None,
    resolution: float = 1.0,
    gamma_num: int = 1,
    gamma_den: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """The per-vertex local-moving decision, shared verbatim by the
    dataset sweep (_one_sweep) and the aligned actor engine
    (community_aligned.py) so both modes make bit-identical choices.

    Inputs are candidate rows — one per (vertex, neighboring community):
    ``kv`` the weight into the candidate, ``volc``/``csize_c`` the
    candidate community's volume/size, ``cur``/``deg``/``vol_own``/
    ``csize_own`` the vertex's current community, degree and its
    volume/size (repeated per row). Row order does not matter: the
    argmax lexsort keys (vertex, -gain, candidate id) are a total order
    over distinct candidates. Returns (vertices, new_comm) with one row
    per distinct input vertex (new_comm == cur when staying)."""
    m = m2 / 2.0
    is_cur = cand == cur
    # gain of joining candidate c (after leaving current):
    #   kvc_c/m − deg·vol_c/(2m²)          for c ≠ current
    #   kvc_cur/m − deg·(vol_cur−deg)/(2m²) for staying
    vol_eff = np.where(is_cur, volc - deg, volc)
    if integer_gains:
        # exact int64 comparator: gain·den·2m² = den·m2·kvc − num·deg·vol_eff
        gain = (np.int64(gamma_den) * np.int64(round(m2))
                * kv.astype(np.int64)
                - np.int64(gamma_num) * deg.astype(np.int64)
                * vol_eff.astype(np.int64))
    else:
        # resolution-gamma gain (RB Potts null-model scaling — the
        # spinglass family's gamma; 1.0 = plain modularity)
        gain = kv / m - resolution * deg * vol_eff / (2.0 * m * m)
    # singleton-swap guard: a singleton vertex may only merge into a
    # smaller-id singleton (prevents mutual-swap oscillation); moves
    # into non-singleton communities are always allowed
    own_single = csize_own == 1
    cand_single = csize_c == 1
    blocked = own_single & cand_single & (cand > cur) & ~is_cur
    if integer_gains:
        gain = np.where(blocked, np.iinfo(np.int64).min // 2, gain)
    else:
        gain = np.where(blocked, -np.inf, gain)
    # per-vertex argmax, ties to smaller community id, stay on equal
    order = np.lexsort((cand, -gain, v))
    v_s, cand_s, gain_s = v[order], cand[order], gain[order]
    cur_s, is_cur_s = cur[order], is_cur[order]
    first = np.empty(len(v_s), dtype=bool)
    if len(v_s):
        first[0] = True
        np.not_equal(v_s[1:], v_s[:-1], out=first[1:])
    best_idx = np.flatnonzero(first)
    bv = v_s[best_idx]
    bc = cand_s[best_idx]
    bg = gain_s[best_idx]
    # staying gain = kv,cur/m − deg·(vol_own−deg)/(2m²). kv,cur comes
    # from the vertex's own-community candidate row when one exists
    # (i.e. it has a same-community neighbor), else 0 — the volume
    # penalty applies either way.
    deg_s = deg[order]
    vol_own_s = vol_own[order]
    kv_cur = np.zeros(len(bv))
    cur_rows = np.flatnonzero(is_cur_s)
    if len(cur_rows):
        sv = v_s[cur_rows]
        sk = (kv[order])[cur_rows]
        pos = np.searchsorted(bv, sv)
        ok = (pos < len(bv)) & (bv[np.clip(pos, 0, len(bv) - 1)] == sv)
        kv_cur[pos[ok]] = sk[ok]
    bdeg = deg_s[best_idx]
    bvol_own = vol_own_s[best_idx]
    bcsize_own = (csize_own[order])[best_idx]
    if integer_gains:
        stay_gain = (np.int64(gamma_den) * np.int64(round(m2))
                     * kv_cur.astype(np.int64)
                     - np.int64(gamma_num) * bdeg.astype(np.int64)
                     * (bvol_own - bdeg).astype(np.int64))
        move = (bc != cur_s[best_idx]) & (bg > stay_gain)
    else:
        stay_gain = (kv_cur / m
                     - resolution * bdeg * (bvol_own - bdeg)
                     / (2.0 * m * m))
        # move only on a strict improvement over staying
        move = (bc != cur_s[best_idx]) & (bg > stay_gain + 1e-12)
    if singleton_movers:
        move &= bcsize_own == 1
    if activation_salt is not None:
        from igraph_ray.ops.dedup import _splitmix

        h = _splitmix(bv.astype(np.uint64)
                      + np.uint64(activation_salt & 0xFFFFFFFFFFFFFFFF))
        move &= (h & np.uint64(1)) == 0
    new_comm = np.where(move, bc, cur_s[best_idx])
    return bv, new_comm


def _one_sweep(
    sym: ray.data.Dataset,
    assign: ray.data.Dataset,  # (vertex, deg, community)
    m2: float,
    num_partitions: int,
    bounds: Optional[List[int]] = None,
    integer_gains: bool = False,
    singleton_movers: bool = False,
    cancel_vacated: bool = False,
    activation_salt: Optional[int] = None,
    resolution: float = 1.0,
    gamma_num: int = 1,
    gamma_den: int = 1,
) -> Tuple[ray.data.Dataset, int]:
    """One synchronous local-moving sweep. Returns (new assign, moved).
    ``bounds``: per-level vertex-range boundaries, computed once by the
    caller (the vertex universe is fixed within a level, so re-sampling
    them every sweep is pure overhead).

    ``integer_gains``: compare gains as the exact int64 quantity
    gain·2m² = m2·k_vc − deg·vol_eff instead of float64 (valid when all
    weights are integers) — the mode behind the SQL-replayable
    louvain_sweeps query, immune to float summation-order ties.

    ``singleton_movers``: only vertices whose current community is a
    singleton may move (the Leiden refinement rule — a vertex merged
    into a larger community never moves again, which keeps every
    refined community connected).

    ``cancel_vacated``: drop any move whose target community label was
    vacated by its sole occupant in the same synchronous sweep (two
    strangers simultaneously attaching to a departing singleton would
    otherwise form a disconnected pair). Cancelled movers simply retry
    next sweep.

    ``activation_salt``: when set, only the deterministic random half of
    the vertices (splitmix64(vertex + salt) & 1 == 0) may move this
    sweep — the standard synchronous-local-moving damper: a mutual-swap
    pair oscillating under full activation is separated with
    probability 1/2 per salted sweep, so oscillations die geometrically
    while every run stays exactly reproducible. Callers vary the salt
    per sweep.

    ``gamma_num``/``gamma_den``: exact rational resolution gamma for the
    integer comparator — with ``integer_gains`` the compared quantity
    becomes gain·den·2m² = den·m2·k_vc − num·deg·vol_eff, so any
    gamma = num/den (e.g. the spinglass 3/2) replays bit-for-bit in SQL.
    Ignored on the float path (use ``resolution`` there)."""
    vols = _volumes(assign, num_partitions).materialize()

    def _lab_dst(b: pa.Table) -> pa.Table:
        return pa.table({"dst": b["vertex"], "comm_dst": b["community"]})

    # 1. weight from each vertex into each neighboring community.
    # right_map renames happen inside the broadcast-assembly task —
    # assign/vols are already materialized, so the right side costs
    # ZERO extra executor launches
    j = hash_join(sym, assign, on="dst", num_partitions=num_partitions,
                  right_map=_lab_dst)

    def _pre(b: pa.Table) -> pa.Table:
        # self-loops (present on coarsened graphs — contracted
        # intra-community weight) travel WITH the vertex wherever it
        # moves, so they must not count as weight "into the current
        # community" — leaving them in inflates the stay gain by w_self/m
        # and freezes coarse levels. They still count in deg/vol.
        keep = pc.invert(pc.equal(b["src"], b["dst"]))
        t = pa.table({"vertex": b["src"].filter(keep),
                      "comm": b["comm_dst"].filter(keep),
                      "w": b["weight"].filter(keep)})
        return pa.TableGroupBy(t, ["vertex", "comm"]).aggregate([("w", "sum")]) \
            .rename_columns(["vertex", "comm", "w"])

    kvc = j.map_batches(_pre, batch_format="pyarrow", batch_size=None) \
        .groupby(["vertex", "comm"]).sum("w")

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"], "comm": b["comm"], "kvc": b["sum(w)"]})

    kvc = kvc.map_batches(_rn, batch_format="pyarrow", batch_size=None)
    # attach candidate-community volume + size, own community/deg
    def _vol_for(b: pa.Table) -> pa.Table:
        return pa.table({"comm": b["comm"], "vol_c": b["vol"], "csize_c": b["csize"]})

    # lazy_left: the three candidate-row joins fuse into ONE streaming
    # execution ending at the materialize (each join boundary used to
    # pay a full executor launch — pure overhead at gate scale)
    kvc = hash_join(
        kvc, vols, on="comm", num_partitions=num_partitions,
        right_map=_vol_for,
    )
    kvc = hash_join(kvc, assign, on="vertex", num_partitions=num_partitions,
                    lazy_left=True)

    def _own_vol(b: pa.Table) -> pa.Table:
        return pa.table({"community": b["comm"], "vol_own": b["vol"],
                         "csize_own": b["csize"]})

    kvc = hash_join(
        kvc, vols, on="community", num_partitions=num_partitions,
        lazy_left=True, right_map=_own_vol,
    ).materialize()

    # 2. per vertex: best candidate by gain (vectorized argmax per group)
    def _choose(b: pa.Table) -> pa.Table:
        empty = pa.table({"vertex": pa.array([], pa.int64()),
                          "new_comm": pa.array([], pa.int64())})
        if b.num_rows == 0 or "kvc" not in b.column_names:
            return empty
        bv, new_comm = choose_moves(
            v=b["vertex"].to_numpy(zero_copy_only=False),
            cand=b["comm"].to_numpy(zero_copy_only=False),
            kv=b["kvc"].to_numpy(zero_copy_only=False),
            volc=b["vol_c"].to_numpy(zero_copy_only=False),
            cur=b["community"].to_numpy(zero_copy_only=False),
            deg=b["deg"].to_numpy(zero_copy_only=False),
            vol_own=b["vol_own"].to_numpy(zero_copy_only=False),
            csize_c=b["csize_c"].to_numpy(zero_copy_only=False),
            csize_own=b["csize_own"].to_numpy(zero_copy_only=False),
            m2=m2, integer_gains=integer_gains,
            singleton_movers=singleton_movers,
            activation_salt=activation_salt, resolution=resolution,
            gamma_num=gamma_num, gamma_den=gamma_den,
        )
        return pa.table({"vertex": pa.array(bv, pa.int64()),
                         "new_comm": pa.array(new_comm, pa.int64())})

    # group rows of one vertex together: boundary-aligned sort on vertex
    kvs = kvc.sort("vertex", boundaries=list(bounds)) if bounds else kvc.sort("vertex")
    choice = kvs.map_batches(_choose, batch_format="pyarrow", batch_size=None)

    if cancel_vacated:
        # moves only: new_comm != current community
        def _lab_cur(b: pa.Table) -> pa.Table:
            return pa.table({"vertex": b["vertex"], "cur": b["community"]})

        mv = hash_join(choice, assign, on="vertex",
                       num_partitions=num_partitions,
                       lazy_left=True, right_map=_lab_cur)

        def _only_moves(b: pa.Table) -> pa.Table:
            keep = pc.not_equal(b["new_comm"], b["cur"])
            return pa.table({"vertex": b["vertex"].filter(keep),
                             "new_comm": b["new_comm"].filter(keep)})

        mv = mv.map_batches(_only_moves, batch_format="pyarrow",
                            batch_size=None).materialize()
        # a singleton label vacated this sweep = a mover's own vertex id;
        # left_outer + null filter is the scale-safe anti join (the
        # partitioned join path has no native anti type)
        vac = mv.map_batches(
            lambda b: pa.table({"new_comm": b["vertex"],
                                "vacated": pa.array(
                                    np.ones(b.num_rows, dtype=np.int8),
                                    pa.int8())}),
            batch_format="pyarrow", batch_size=None)
        surv = hash_join(mv, vac, on="new_comm", num_partitions=num_partitions,
                         join_type="left_outer")

        def _keep_live(b: pa.Table) -> pa.Table:
            if "vacated" not in b.column_names:  # empty vacated side
                return b.select(["vertex", "new_comm"])
            keep = pc.is_null(b["vacated"])
            return pa.table({"vertex": b["vertex"].filter(keep),
                             "new_comm": b["new_comm"].filter(keep)})

        choice = surv.map_batches(_keep_live, batch_format="pyarrow",
                                  batch_size=None)

    # 3. apply
    merged = hash_join(assign, choice, on="vertex", num_partitions=num_partitions,
                       join_type="left_outer")

    def _apply(b: pa.Table) -> pa.Table:
        if "new_comm" not in b.column_names:  # empty choice side (all cancelled)
            return pa.table({"vertex": b["vertex"], "deg": b["deg"],
                             "community": b["community"],
                             "moved": pa.array(
                                 np.zeros(b.num_rows, dtype=np.int64),
                                 pa.int64())})
        nc = pc.if_else(pc.is_null(b["new_comm"]), b["community"],
                        pc.cast(b["new_comm"], pa.int64()))
        moved = pc.cast(pc.not_equal(nc, b["community"]), pa.int64())
        return pa.table(
            {"vertex": b["vertex"], "deg": b["deg"],
             "community": nc, "moved": moved}
        )

    out = merged.map_batches(_apply, batch_format="pyarrow", batch_size=None).materialize()
    moved = int(out.sum("moved"))
    return out.select_columns(["vertex", "deg", "community"]), moved


def _coarsen(
    sym: ray.data.Dataset, assign: ray.data.Dataset, num_partitions: int
) -> ray.data.Dataset:
    """Contract the symmetrized weighted edges by community labels
    (self-loops kept — they carry intra-community weight)."""
    def _ls(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["vertex"], "comm_src": b["community"]})

    def _ld(b: pa.Table) -> pa.Table:
        return pa.table({"dst": b["vertex"], "comm_dst": b["community"]})

    j = hash_join(sym, assign, on="src", num_partitions=num_partitions,
                  right_map=_ls)
    j = hash_join(j, assign, on="dst", num_partitions=num_partitions,
                  lazy_left=True, right_map=_ld)

    def _pre(b: pa.Table) -> pa.Table:
        t = pa.table({"src": b["comm_src"], "dst": b["comm_dst"], "weight": b["weight"]})
        return pa.TableGroupBy(t, ["src", "dst"]).aggregate([("weight", "sum")]) \
            .rename_columns(["src", "dst", "weight"])

    g = j.map_batches(_pre, batch_format="pyarrow", batch_size=None) \
        .groupby(["src", "dst"]).sum("weight")

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["src"], "dst": b["dst"], "weight": b["sum(weight)"]})

    return g.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def _modularity_from(
    sym: ray.data.Dataset, assign: ray.data.Dataset, m2: float, num_partitions: int
) -> float:
    """Q = Σ_c [ w_in_c/2m − (vol_c/2m)² ] over the symmetrized table
    (w_in counts both directions, hence /m2)."""
    def _ls(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["vertex"], "comm_src": b["community"]})

    def _ld(b: pa.Table) -> pa.Table:
        return pa.table({"dst": b["vertex"], "comm_dst": b["community"]})

    j = hash_join(sym, assign, on="src", num_partitions=num_partitions,
                  right_map=_ls)
    j = hash_join(j, assign, on="dst", num_partitions=num_partitions,
                  lazy_left=True, right_map=_ld)

    def _intra(b: pa.Table) -> pa.Table:
        same = pc.equal(b["comm_src"], b["comm_dst"])
        w = b["weight"].to_numpy(zero_copy_only=False)
        s = same.to_numpy(zero_copy_only=False)
        return pa.table({"w_in": pa.array([float(w[s].sum())], pa.float64())})

    w_in = float(
        j.map_batches(_intra, batch_format="pyarrow", batch_size=None).sum("w_in") or 0.0
    )
    # assign here carries only (vertex, community); join degrees back in
    with_deg = hash_join(assign, _degrees(sym), on="vertex",
                         num_partitions=num_partitions)
    vols = _volumes(with_deg, num_partitions)

    def _sq(b: pa.Table) -> pa.Table:
        v = b["vol"].to_numpy(zero_copy_only=False)
        return pa.table({"v2": pa.array(v * v, pa.float64())})

    v2 = float(vols.map_batches(_sq, batch_format="pyarrow", batch_size=None).sum("v2") or 0.0)
    return w_in / m2 - v2 / (m2 * m2)


def louvain_sweeps(
    graph: Graph,
    sweeps: int = 2,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Exactly ``sweeps`` synchronous level-1 local-moving sweeps from
    the all-singleton assignment, with the int64 gain comparator
    (``integer_gains`` — requires integer edge weights). This is the
    SQL-replayable core of Louvain: the full algorithm's sweep/level
    counts are data-dependent (a fixed SQL text cannot adapt), so the
    driver-checked oracle pins the sweep count instead and replays the
    identical k_vc → argmax-gain → apply recurrence in unrolled CTEs.
    Returns (vertex, community) raw labels (no renumbering)."""
    sym = _sym_weighted(graph).materialize()
    m2 = float(sym.sum("weight") or 0.0)
    if m2 == 0.0:
        return graph.vertices().map_batches(
            lambda b: pa.table({"vertex": b["vertex"],
                                "community": b["vertex"]}),
            batch_format="pyarrow", batch_size=None)
    deg = _degrees(sym)
    assign = deg.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "deg": b["deg"],
                            "community": b["vertex"]}),
        batch_format="pyarrow", batch_size=None).materialize()
    from igraph_ray.csr import compute_boundaries

    bounds = compute_boundaries(assign, num_partitions, col="vertex")
    for _ in range(sweeps):
        assign, _moved = _one_sweep(sym, assign, m2, num_partitions,
                                    bounds=bounds, integer_gains=True)
    return assign.select_columns(["vertex", "community"])


def louvain_pinned(
    graph: Graph,
    level_sweeps: Tuple[int, ...] = (2, 1),
    num_partitions: int = 8,
    gamma_num: int = 1,
    gamma_den: int = 1,
) -> ray.data.Dataset:
    """Pinned-schedule multilevel Louvain with the exact int64 gain
    comparator: exactly ``level_sweeps[L]`` synchronous sweeps at level
    L, a community contraction between levels, labels composed back to
    the original vertices (raw labels, no renumbering — like
    louvain_sweeps). SQL-replayable: the unroll depth is fixed and the
    arithmetic is integer throughout (weights are integers and coarse
    weights are integer sums), so the driver oracle replays the full
    multilevel recurrence of community.c:2854 in unrolled CTEs —
    including the contraction, which louvain_sweeps alone does not
    exercise. ``gamma_num/gamma_den`` pin the RB resolution rationally
    (the spinglass_sweeps path). Returns (vertex, community)."""
    sym = _sym_weighted(graph).materialize()
    m2 = float(sym.sum("weight") or 0.0)
    if m2 == 0.0:
        return graph.vertices().map_batches(
            lambda b: pa.table({"vertex": b["vertex"],
                                "community": b["vertex"]}),
            batch_format="pyarrow", batch_size=None)
    from igraph_ray.csr import compute_boundaries

    mapping: Optional[ray.data.Dataset] = None
    cur_sym = sym
    for li, sweeps in enumerate(level_sweeps):
        deg = _degrees(cur_sym)
        assign = deg.map_batches(
            lambda b: pa.table({"vertex": b["vertex"], "deg": b["deg"],
                                "community": b["vertex"]}),
            batch_format="pyarrow", batch_size=None).materialize()
        bounds = compute_boundaries(assign, num_partitions, col="vertex")
        for _ in range(sweeps):
            assign, _moved = _one_sweep(
                cur_sym, assign, m2, num_partitions, bounds=bounds,
                integer_gains=True, gamma_num=gamma_num,
                gamma_den=gamma_den)
        lvl_map = assign.select_columns(["vertex", "community"]).materialize()
        if mapping is None:
            mapping = lvl_map
        else:
            j = hash_join(
                mapping,
                lvl_map.map_batches(
                    lambda b: pa.table({"community": b["vertex"],
                                        "next": b["community"]}),
                    batch_format="pyarrow", batch_size=None),
                on="community", num_partitions=num_partitions)
            mapping = j.map_batches(
                lambda b: pa.table({"vertex": b["vertex"],
                                    "community": b["next"]}),
                batch_format="pyarrow", batch_size=None).materialize()
        if li + 1 < len(level_sweeps):
            cur_sym = _coarsen(cur_sym, lvl_map, num_partitions).materialize()
    return mapping


def louvain(
    graph: Graph,
    num_partitions: int = 8,
    max_sweeps: int = 8,
    max_levels: int = 10,
    resolution: float = 1.0,
    mode: str = "aligned",
) -> LouvainResult:
    """Multilevel modularity communities over the undirected
    interpretation of ``graph`` (community.c:2854 contract: final labels
    canonically renumbered 0..k-1 in order of first appearance by vertex
    id, like the reference's densification). ``resolution`` is the
    Reichardt–Bornholdt gamma scaling the null-model term of every
    local-moving gain; 1.0 is plain modularity. The reported modularity
    is always the plain (gamma=1) value of the final labels.

    ``mode="aligned"`` (default) runs the sweeps on the actor-pinned
    engine (community_aligned.py — one actor round per sweep instead of a
    multi-join Dataset execution); ``mode="dataset"`` is the pure
    Ray-Data loop. Both share choose_moves, so results are identical
    whenever float sums are exact (unweighted / integer-weighted)."""
    if mode == "aligned":
        from igraph_ray.algorithms.community_aligned import louvain_aligned

        return louvain_aligned(
            graph, num_partitions=num_partitions, max_sweeps=max_sweeps,
            max_levels=max_levels, resolution=resolution)
    sym = _sym_weighted(graph).materialize()
    m2 = float(sym.sum("weight") or 0.0)
    if m2 == 0.0:
        verts = graph.vertices()

        def _iso(b: pa.Table) -> pa.Table:
            return pa.table({"vertex": b["vertex"], "community": b["vertex"]})

        return LouvainResult(
            state=verts.map_batches(_iso, batch_format="pyarrow", batch_size=None),
            modularity=float("nan"), levels=0, sweeps=0,
        )

    deg = _degrees(sym)

    def _init(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"], "deg": b["deg"],
                         "community": b["vertex"]})

    assign = deg.map_batches(_init, batch_format="pyarrow", batch_size=None).materialize()

    # vertex -> final community, composed through the levels
    mapping: Optional[ray.data.Dataset] = None  # (vertex, community)
    total_sweeps = 0
    level = 0
    cur_sym = sym
    from igraph_ray.csr import compute_boundaries

    while level < max_levels:
        level += 1
        n_before = assign.count()
        bounds = compute_boundaries(
            assign, num_partitions, num_edges=n_before, col="vertex"
        )
        moved_any = False
        for _ in range(max_sweeps):
            assign, moved = _one_sweep(cur_sym, assign, m2, num_partitions,
                                       bounds, resolution=resolution)
            total_sweeps += 1
            # early stop: a sub-0.5% trickle of movers converges to nothing
            # worth another three shuffles (synchronous Louvain's long tail)
            if moved <= max(0, int(0.005 * n_before)):
                moved_any = moved_any or moved > 0
                break
            moved_any = True
        lvl_map = assign.select_columns(["vertex", "community"]).materialize()
        if mapping is None:
            mapping = lvl_map
        else:
            def _lm(b: pa.Table) -> pa.Table:
                return pa.table({"community": b["vertex"], "next": b["community"]})

            j = hash_join(
                mapping,
                lvl_map.map_batches(_lm, batch_format="pyarrow", batch_size=None),
                on="community", num_partitions=num_partitions,
            )

            def _compose(b: pa.Table) -> pa.Table:
                return pa.table({"vertex": b["vertex"], "community": b["next"]})

            mapping = j.map_batches(_compose, batch_format="pyarrow", batch_size=None) \
                .materialize()
        if not moved_any:
            break
        # coarsen and continue on the community graph
        cur_sym = _coarsen(cur_sym, lvl_map, num_partitions).materialize()
        # volume on the contracted graph = full weighted degree including
        # self-loops (intra-community weight already appears once per
        # direction in the sym table, so a plain per-src sum is correct)
        cdeg_all = _degrees(cur_sym)

        def _init2(b: pa.Table) -> pa.Table:
            return pa.table({"vertex": b["vertex"], "deg": b["deg"],
                             "community": b["vertex"]})

        assign = cdeg_all.map_batches(_init2, batch_format="pyarrow", batch_size=None) \
            .materialize()
        if assign.count() >= n_before:
            break

    # canonical renumber: labels densified by order of first appearance
    # (min vertex id per community), matching the reference's contract
    from igraph_ray.util import dense_rank_map

    def _minv(b: pa.Table) -> pa.Table:
        return pa.table({"community": b["community"], "minv": b["min(vertex)"]})

    firsts = mapping.groupby("community").min("vertex") \
        .map_batches(_minv, batch_format="pyarrow", batch_size=None)
    j = hash_join(mapping, firsts, on="community", num_partitions=num_partitions)

    def _by_min(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"], "community": b["minv"]})

    relabeled = j.map_batches(_by_min, batch_format="pyarrow", batch_size=None)
    rank = dense_rank_map(relabeled, "community")

    def _lab(b: pa.Table) -> pa.Table:
        return pa.table({"community": b["community"], "dense": b["rank"]})

    j2 = hash_join(
        relabeled, rank.map_batches(_lab, batch_format="pyarrow", batch_size=None),
        on="community", num_partitions=num_partitions,
    )

    def _final(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"], "community": b["dense"]})

    final = j2.map_batches(_final, batch_format="pyarrow", batch_size=None).materialize()
    q = _modularity_from(
        sym,
        final.map_batches(
            lambda b: pa.table({"vertex": b["vertex"], "community": b["community"]}),
            batch_format="pyarrow", batch_size=None,
        ),
        m2, num_partitions,
    )
    return LouvainResult(state=final, modularity=q, levels=level, sweeps=total_sweeps)
