"""SIR epidemic simulation on a graph.

Reference semantics: igraph_sir (/root/reference/src/sir.c) — SIR
compartment dynamics on a network: susceptible vertices are infected by
infected neighbors at rate beta, infected vertices recover at rate
gamma, and the output is the S/I/R population trajectory. The reference
runs continuous-time Gillespie draws from its own RNG (inherently
irreproducible across implementations), so — like the engine's
random_walks — this engine uses the DETERMINISTIC synchronous-time
variant: per step, every susceptible endpoint of an S–I edge is
infected iff the edge's md5 draw md5("lo:hi:t") falls below beta, and
every infected vertex recovers iff md5("r:v:t") falls below gamma (the
repo-wide 15-hex-prefix draw convention, replayable verbatim in SQL).
State updates are synchronous: infections and recoveries at step t both
read the state at step t.

Distributed shape: per step two hash joins tag the undirected edge
table with its endpoint states, the new-infection candidates come out
of a vectorized md5 filter, and the state update is three semi/anti
joins — no driver-side per-vertex work, no broadcast of O(V) state."""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.util import hash_join

HEX15 = 16 ** 15


def _draw_lt(keys, threshold: int) -> np.ndarray:
    out = np.empty(len(keys), dtype=bool)
    for i, k in enumerate(keys):
        out[i] = int(hashlib.md5(k.encode()).hexdigest()[:15], 16) < threshold
    return out


def sir(
    graph: Graph,
    beta: float = 0.4,
    gamma: float = 0.25,
    steps: int = 6,
    seed_mod: int = 101,
    n: Optional[int] = None,
    num_partitions: int = 8,
) -> pa.Table:
    """Returns the trajectory table (step, s, i, r) for step = 0..steps
    (step 0 is the initial condition: vertices with v % seed_mod == 0
    infected, everyone else susceptible)."""
    n = n if n is not None else graph.num_vertices()
    beta_thr = int(beta * HEX15)
    gamma_thr = int(gamma * HEX15)
    und = graph.canonical_undirected().materialize()

    def _init(b: pa.Table) -> pa.Table:
        v = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        st = np.where(v % seed_mod == 0, 1, 0).astype(np.int64)
        return pa.table({"vertex": pa.array(v), "st": pa.array(st)})

    state = ray.data.range(n).map_batches(
        _init, batch_format="pyarrow", batch_size=None).materialize()

    def _counts(sds: ray.data.Dataset, step: int) -> dict:
        rows = {r["st"]: r["count()"] for r in
                sds.groupby("st").count().take_all()}
        return {"step": step, "s": int(rows.get(0, 0)),
                "i": int(rows.get(1, 0)), "r": int(rows.get(2, 0))}

    traj = [_counts(state, 0)]
    for t in range(steps):
        st_lo = state.map_batches(
            lambda b: pa.table({"lo": b["vertex"], "st_lo": b["st"]}),
            batch_format="pyarrow", batch_size=None)
        st_hi = state.map_batches(
            lambda b: pa.table({"hi": b["vertex"], "st_hi": b["st"]}),
            batch_format="pyarrow", batch_size=None)
        j = hash_join(und, st_lo, on="lo", num_partitions=num_partitions)
        j = hash_join(j, st_hi, on="hi", num_partitions=num_partitions)

        def _cands(b: pa.Table, t=t) -> pa.Table:
            lo = b["lo"].to_numpy(zero_copy_only=False)
            hi = b["hi"].to_numpy(zero_copy_only=False)
            sl = b["st_lo"].to_numpy(zero_copy_only=False)
            sh = b["st_hi"].to_numpy(zero_copy_only=False)
            si = ((sl == 0) & (sh == 1)) | ((sl == 1) & (sh == 0))
            lo, hi, sl = lo[si], hi[si], sl[si]
            keys = [f"{a}:{b_}:{t}" for a, b_ in zip(lo.tolist(),
                                                     hi.tolist())]
            fire = _draw_lt(keys, beta_thr)
            v = np.where(sl == 0, lo, hi)[fire]  # the S endpoint
            return pa.table({"vertex": pa.array(np.unique(v))})

        # materialized once: cand feeds the outer join below, and
        # hash_join's broadcast-size probe would otherwise re-execute
        # the whole upstream per use
        def _mark(b: pa.Table) -> pa.Table:
            return pa.table({"vertex": b["vertex"],
                             "hit": pa.array(np.ones(b.num_rows,
                                                     np.int64))})

        cand = (j.map_batches(_cands, batch_format="pyarrow",
                              batch_size=None)
                .groupby("vertex").count().select_columns(["vertex"])
                .map_batches(_mark, batch_format="pyarrow",
                             batch_size=None)
                .materialize())

        def _infect(b: pa.Table) -> pa.Table:
            if "hit" not in b.column_names:  # empty candidate side:
                # hash_join's broadcast path passes the left through
                return pa.table({"vertex": b["vertex"],
                                 "st": pa.array(np.zeros(b.num_rows,
                                                         np.int64))})
            hit = b["hit"].to_numpy(zero_copy_only=False)
            st = np.where(np.nan_to_num(hit.astype(np.float64)) > 0,
                          1, 0).astype(np.int64)
            return pa.table({"vertex": b["vertex"], "st": pa.array(st)})

        s_new = hash_join(state.filter(expr="st == 0"), cand, on="vertex",
                          num_partitions=num_partitions,
                          join_type="left_outer").map_batches(
            _infect, batch_format="pyarrow", batch_size=None)

        def _recover(b: pa.Table, t=t) -> pa.Table:
            v = b["vertex"].to_numpy(zero_copy_only=False)
            rec = _draw_lt([f"r:{x}:{t}" for x in v.tolist()], gamma_thr)
            return pa.table({"vertex": pa.array(v),
                             "st": pa.array(np.where(rec, 2, 1)
                                            .astype(np.int64))})

        i_rows = state.filter(expr="st == 1").map_batches(
            _recover, batch_format="pyarrow", batch_size=None)
        r_rows = state.filter(expr="st == 2")
        # repartition: the 3-way union would otherwise TRIPLE the block
        # count every step (3^t tiny blocks by step t — pure scheduler
        # overhead); the state stays at num_partitions blocks instead
        state = (s_new.union(i_rows).union(r_rows)
                 .repartition(num_partitions).materialize())
        traj.append(_counts(state, t + 1))

    return pa.table({
        "step": pa.array([r["step"] for r in traj], pa.int64()),
        "s": pa.array([r["s"] for r in traj], pa.int64()),
        "i": pa.array([r["i"] for r in traj], pa.int64()),
        "r": pa.array([r["r"] for r in traj], pa.int64()),
    })
