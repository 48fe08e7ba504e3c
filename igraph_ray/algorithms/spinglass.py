"""Spinglass community detection, deterministic zero-temperature limit
— the engine's counterpart of igraph_community_spinglass
(/root/reference/src/clustertool.cpp:98; Reichardt & Bornholdt,
"Statistical mechanics of community detection", PRE 74:016110 (2006)).

The reference minimizes the RB Potts Hamiltonian
    H = -Σ_ij (A_ij − γ p_ij) δ(σ_i, σ_j)
by simulated annealing over an RNG-dependent spin-update schedule; its
output is a sample, not a function of the input. For the configuration
null model p_ij = k_i k_j / 2m, minimizing H is exactly maximizing
resolution-γ modularity (RB paper §III), so the engine implements the
deterministic T→0 quench as multilevel γ-local-moving on the shared
louvain engine: synchronous greedy spin updates (each vertex adopts the
neighboring spin with the largest Hamiltonian decrease, min-id tie
break, splitmix half-activation damping against synchronous
oscillation), then contraction and further quenching on the coarse spin
graph — the T=0 analogue of the annealer's collective spin flips, which
a single-level quench cannot perform and without which the quench
freezes in fragmented local minima. Deterministic pure function of
(graph, gamma); quality gates (planted recovery, the γ-controlled
resolution behavior on a ring of cliques — the phenomenon the RB model
was built to expose) live in tests/test_spinglass.py.
"""

from __future__ import annotations

import dataclasses

import ray.data

from igraph_ray.graph import Graph
from igraph_ray.algorithms.louvain import louvain, louvain_pinned


@dataclasses.dataclass
class SpinglassResult:
    state: ray.data.Dataset  # (vertex, community) dense 0..k-1
    modularity: float        # plain (gamma=1) modularity of the labels
    sweeps: int


def spinglass_sweeps(
    graph: Graph,
    gamma_num: int = 3,
    gamma_den: int = 2,
    sweeps: int = 2,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Exactly ``sweeps`` synchronous T=0 spin-quench sweeps of the RB
    Potts model at the exact rational resolution gamma = num/den, from
    the all-singleton spin state (clustertool.cpp:98 greedy spin-update
    semantics, pinned for the driver oracle). The Hamiltonian-decrease
    comparison is the exact int64 quantity den·m2·k_vc − num·deg·vol_eff
    (gain·den·2m² — RB PRE 74:016110 §III equivalence with
    gamma-modularity), so a fixed SQL text replays it bit-for-bit.
    Returns (vertex, community) raw spin labels."""
    return louvain_pinned(graph, level_sweeps=(sweeps,),
                          num_partitions=num_partitions,
                          gamma_num=gamma_num, gamma_den=gamma_den)


def spinglass_quench(
    graph: Graph,
    gamma: float = 1.0,
    max_sweeps: int = 8,
    max_levels: int = 10,
    num_partitions: int = 8,
) -> SpinglassResult:
    """Deterministic T=0 spin quench of the RB Potts model at
    resolution ``gamma``; labels densified 0..k-1 by first appearance
    (min member vertex id), like the reference's membership vector."""
    res = louvain(graph, num_partitions=num_partitions,
                  max_sweeps=max_sweeps, max_levels=max_levels,
                  resolution=gamma)
    return SpinglassResult(state=res.state, modularity=res.modularity,
                           sweeps=res.sweeps)


def spinglass_single(
    graph: Graph,
    vertex: int,
    gamma: float = 1.0,
    max_rounds: int = 64,
    num_partitions: int = 8,
):
    """Community of a single vertex by the Reichardt–Bornholdt local
    Hamiltonian (igraph_community_spinglass_single,
    /root/reference/src/clustertool.cpp:427 → PottsModel::
    FindCommunityFromStart): grow C from the seed by adding vertices
    whose links into C beat the expected γ·p·|C| (p = 2m/(n(n−1)), the
    reference's uniform null, clustertool.cpp:456), dropping members
    that fall below it, to a fixpoint. The engine updates all
    candidates per round (batch variant of the reference's sequential
    adds — a documented deterministic deviation; the fixpoint condition
    is identical). Returns (members Dataset (vertex,), stats dict with
    cohesion/adhesion/inner_links/outer_links as in the reference's
    output arguments).

    Dataflow per round: one hash join of the symmetric edge table
    against the member set → per-candidate k_in sums → vectorized
    threshold. Members live in the object store between rounds; the
    driver holds only counters.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from igraph_ray.util import hash_join

    und = graph.canonical_undirected().materialize()
    m = und.count()
    n = graph.num_vertices()
    if n < 2:
        raise ValueError("spinglass_single needs >= 2 vertices")
    p = 2.0 * m / (n * (n - 1.0))

    sym = und.map_batches(
        lambda b: pa.table({
            "a": pa.array(np.concatenate(
                [b["lo"].to_numpy(zero_copy_only=False),
                 b["hi"].to_numpy(zero_copy_only=False)])),
            "b": pa.array(np.concatenate(
                [b["hi"].to_numpy(zero_copy_only=False),
                 b["lo"].to_numpy(zero_copy_only=False)]))}),
        batch_format="pyarrow", batch_size=None).materialize()

    members = ray.data.from_arrow(pa.table(
        {"vertex": pa.array([int(vertex)], pa.int64())})).materialize()
    size = 1

    for _ in range(max_rounds):
        # k_in for every vertex adjacent to C (members included)
        ma = members.map_batches(
            lambda b: pa.table({"a": b["vertex"]}),
            batch_format="pyarrow", batch_size=None)
        inc = hash_join(sym, ma, on="a", num_partitions=num_partitions)

        def _kin(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "b" not in t.column_names:
                return pa.table({"vertex": pa.array([], pa.int64()),
                                 "kin": pa.array([], pa.int64())})
            out = pa.table({"vertex": t["b"], "kin": pa.array(
                np.ones(t.num_rows, np.int64))})
            return (pa.TableGroupBy(out, "vertex")
                    .aggregate([("kin", "sum")])
                    .rename_columns(["vertex", "kin"]))

        kin = (inc.map_batches(_kin, batch_format="pyarrow",
                               batch_size=None)
               .groupby("vertex").sum("kin").map_batches(
            lambda b: pa.table({"vertex": b["vertex"],
                                "kin": pc.cast(b["sum(kin)"], pa.int64())})
            if b.num_rows and "vertex" in b.column_names else pa.table(
                {"vertex": pa.array([], pa.int64()),
                 "kin": pa.array([], pa.int64())}),
            batch_format="pyarrow", batch_size=None)).materialize()

        # flag membership on the kin table (left join against members)
        flagged = hash_join(
            kin, members.map_batches(
                lambda b: pa.table({"vertex": b["vertex"],
                                    "inc_m": pa.array(np.ones(
                                        b.num_rows, np.int64))}),
                batch_format="pyarrow", batch_size=None),
            on="vertex", num_partitions=num_partitions,
            join_type="left_outer")

        thr_add = gamma * p * size          # candidate joins if kin > thr
        thr_keep = gamma * p * (size - 1)   # member stays if kin >= thr

        def _next(b: pa.Table, thr_add=thr_add, thr_keep=thr_keep
                  ) -> pa.Table:
            if b.num_rows == 0 or "vertex" not in b.column_names:
                return pa.table({"vertex": pa.array([], pa.int64())})
            v = b["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
            k = b["kin"].to_numpy(zero_copy_only=False).astype(np.float64)
            if "inc_m" in b.column_names:
                im = b["inc_m"].to_numpy(zero_copy_only=False)
                is_m = ~np.isnan(im.astype(np.float64)) & (
                    np.nan_to_num(im.astype(np.float64)) > 0)
            else:
                is_m = np.zeros(len(v), bool)
            keep = np.where(is_m, k >= thr_keep, k > thr_add)
            keep |= v == int(vertex)  # the seed never leaves
            return pa.table({"vertex": pa.array(v[keep])})

        nxt = flagged.map_batches(_next, batch_format="pyarrow",
                                  batch_size=None)
        # the seed may be absent from kin when isolated: re-add
        nxt = nxt.union(ray.data.from_arrow(pa.table(
            {"vertex": pa.array([int(vertex)], pa.int64())}))) \
            .groupby("vertex").count().map_batches(
            lambda b: pa.table({"vertex": b["vertex"]})
            if b.num_rows and "vertex" in b.column_names else pa.table(
                {"vertex": pa.array([], pa.int64())}),
            batch_format="pyarrow", batch_size=None).materialize()
        new_size = nxt.count()
        # fixpoint: same set (size check then exact set check)
        if new_size == size:
            same = hash_join(nxt, members.map_batches(
                lambda b: pa.table({"vertex": b["vertex"],
                                    "x": pa.array(np.ones(
                                        b.num_rows, np.int64))}),
                batch_format="pyarrow", batch_size=None),
                on="vertex", num_partitions=num_partitions).count()
            if same == new_size:
                members = nxt
                break
        members = nxt
        size = new_size

    # stats: inner links (both ends in C), outer links (one end in C)
    mm = members.map_batches(
        lambda b: pa.table({"lo": b["vertex"],
                            "in_lo": pa.array(np.ones(b.num_rows,
                                                      np.int64))}),
        batch_format="pyarrow", batch_size=None)
    j1 = hash_join(und, mm, on="lo", num_partitions=num_partitions,
                   join_type="left_outer")
    mh = members.map_batches(
        lambda b: pa.table({"hi": b["vertex"],
                            "in_hi": pa.array(np.ones(b.num_rows,
                                                      np.int64))}),
        batch_format="pyarrow", batch_size=None)
    j2 = hash_join(j1, mh, on="hi", num_partitions=num_partitions,
                   join_type="left_outer")

    def _cls(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "lo" not in b.column_names:
            return pa.table({"inner": pa.array([], pa.int64()),
                             "outer": pa.array([], pa.int64())})

        def _flag(col):
            if col not in b.column_names:
                return np.zeros(b.num_rows, bool)
            x = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
            return np.nan_to_num(x) > 0

        lo_in = _flag("in_lo")
        hi_in = _flag("in_hi")
        inner = int((lo_in & hi_in).sum())
        outer = int((lo_in ^ hi_in).sum())
        return pa.table({"inner": pa.array([inner], pa.int64()),
                         "outer": pa.array([outer], pa.int64())})

    inner = outer = 0
    for r in j2.map_batches(_cls, batch_format="pyarrow",
                            batch_size=None).take_all():
        inner += int(r["inner"])
        outer += int(r["outer"])
    size = members.count()
    exp_in = gamma * p * size * (size - 1) / 2.0
    exp_out = gamma * p * size * (n - size)
    stats = {
        "size": int(size),
        "inner_links": int(inner),
        "outer_links": int(outer),
        "cohesion": float(inner - exp_in),   # PottsModel cohesion
        "adhesion": float(outer - exp_out),  # PottsModel adhesion
    }
    return members, stats
