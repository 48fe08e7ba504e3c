"""Compiled-graph (Ray Compiled Graphs / accelerated DAG) engine for the
aligned superstep loop — the fastest exchange transport measured.

Single-node profile of one BSP superstep at P=32 (exchange only, zero
compute):

- task engine (aligned.py):        ~150-250 ms, does NOT shrink with CPUs
- P^2 fire-and-forget actor calls: ~75-105 ms (parallelizes ~0.9)
- hub rendezvous / pull model:     ~150-290 ms (blocking RPC ~5 ms each)
- compiled graph (this engine):    ~10 ms at 32 cpus / ~16 ms at 8 cpus

Ray Compiled Graphs (``ray.dag``, public experimental API) pre-compile a
static DAG over actors into persistent shared-memory channels: after one
compile, each ``execute()`` runs the whole P-gather -> P x P exchange ->
P-apply superstep with microsecond-level per-edge overhead — no raylet
dispatch, no per-call gRPC, no plasma object churn.

Layout per superstep (one ``execute(ctl)``):

    InputNode(ctl) ──► gather_j  (num_returns=P: one output per target)
                         │ P x P channel edges, each carrying ONLY its
                         ▼ (dst-slice) segment — data moves exactly once
                       apply_j(ctl, seg_0j, ..., seg_Pj) ──► partials_j

- actors hold state + zero-copy CSR views across executes (Pregel worker
  layout, Malewicz et al. SIGMOD 2010);
- the driver computes ``make_scalars`` from the returned partials and
  tests convergence between executes — that single driver round trip is
  the entire per-superstep control plane;
- checkpoint trigger rides the input ctl: when due, every apply writes its
  ``part-{p}.parquet`` before returning, so the driver can commit the
  manifest immediately after the execute returns — strictly ordered.

Two cold-start costs are deliberately kept OUT of the loop and amortized:

- ``experimental_compile`` costs ~30 ms per channel (~30 s at P=32,
  measured) — so the compiled DAG and its actor pool are CACHED per
  partition count for the process lifetime. The DAG wiring depends only
  on P; each run re-points the actors at its own gather/apply closures,
  CSR blocks and state via ``set_fns``/``set_state``. A production
  deployment compiles once per cluster session and runs many jobs
  through it; a bench rep after the first reuses the compiled graph.
- the first gather otherwise pays first-touch page faults over the
  plasma-resident CSR views (~2.8 s/partition at 2^25 edges, measured)
  and the first execute grows each channel buffer to its working size —
  ``set_state`` touches every CSR page up front and the driver issues one
  no-op warmup execute (gather runs, apply skipped) before the timer.

Semantics note vs aligned.py: gather for iteration *it+1* here runs at the
start of execute *it+1* and therefore sees the scalars derived from
iteration *it* (one step fresher than the task engine, which reuses
iteration *it*'s scalars for the trailing gather). All shipped algorithms'
gather kernels ignore the scalars argument, so results are bit-identical —
cross-checked in tests. Algorithms whose gather *consumes* scalars should
use engine="tasks"/"spmd".

Multi-node note: compiled graphs transport channels over the Ray object
store between nodes; the P x P edge layout is the same partitioned
exchange the task engine uses, so the design carries to a real cluster
unchanged.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from igraph_ray.superstep import (
    CheckpointConfig,
    SuperstepResult,
    _manifest_path,
    prune_checkpoints,
)


@ray.remote(num_cpus=0)
class _CgActor:
    def __init__(self, idx: int, nb: int):
        self.idx = idx
        self.nb = nb
        self.state = None
        self._msgs = 0
        self._gather_ms = 0.0

    def set_fns(self, gather_fn, apply_fn, make_scalars, init_scalars,
                csr_desc, starts,
                checkpoint: Optional[CheckpointConfig]) -> bool:
        self.gather_fn = gather_fn
        self.apply_fn = apply_fn
        self.make_scalars = make_scalars
        self.csr_desc = csr_desc
        self.starts = starts
        self.checkpoint = checkpoint
        self.init_scalars = init_scalars
        self._scalars = init_scalars
        self._partial_prev: dict = {}
        # pin this actor to one core — but ONLY when each actor can own a
        # core (P <= cores). A BSP superstep runs at the pace of its
        # slowest partition, so OS migration jitter is paid in full every
        # iteration (measured gather p95 2-8x p50 unpinned at 32/32).
        # When actors outnumber cores, static pinning instead AMPLIFIES
        # skew (a core stuck with the heaviest partitions can't shed
        # load, measured 2x iteration spikes at 32 actors on 8 cores) —
        # leave placement to the OS there.
        try:
            allowed = sorted(os.sched_getaffinity(0))
            if self.nb <= len(allowed):
                os.sched_setaffinity(0, {allowed[self.idx % len(allowed)]})
            else:
                os.sched_setaffinity(0, set(allowed))
        except (AttributeError, OSError):
            pass
        return True

    def set_state(self, block: dict) -> bool:
        self.state = {k: np.asarray(v) for k, v in block.items()}
        # fault in every page of the CSR views now — the first in-loop
        # gather otherwise pays seconds of page-fault stalls
        from igraph_ray.csr import fetch_block

        sink = 0
        for desc in self.csr_desc:
            blk = fetch_block(desc[2])
            for v in blk.values():
                if isinstance(v, np.ndarray) and v.size:
                    sink += int(v.flat[0]) + int(v.flat[-1]) + int(v[:: max(1, 512)].sum() % 2)
        return True

    def get_state(self) -> dict:
        return self.state

    def gather(self, ctl: dict):
        t0 = time.perf_counter()
        segs, cnt = self.gather_fn(self.state, self.csr_desc, self.starts,
                                   self._scalars)
        self._msgs = int(cnt)
        self._gather_ms = (time.perf_counter() - t0) * 1e3
        # each outgoing segment carries this actor's PREVIOUS apply
        # partials: every receiver can then derive the iteration's global
        # scalars locally (fixed partition-order float sum — identical on
        # every actor and to the old driver-side reduction), so the
        # driver round trip leaves the critical path and fixed-iteration
        # runs pipeline executes back-to-back
        meta = (self.idx, self._partial_prev)
        return tuple((seg, meta) for seg in segs)

    def apply(self, ctl: dict, *segments):
        if ctl.get("warmup"):
            return {}
        t0 = time.perf_counter()
        by_idx = {}
        segs = []
        for (seg, (idx, part)) in segments:
            segs.append(seg)
            if part:
                by_idx[idx] = part
        if by_idx:
            summed: dict = {}
            for idx in sorted(by_idx):
                for k, v in by_idx[idx].items():
                    if not k.startswith("_"):
                        summed[k] = summed.get(k, 0.0) + float(v)
            scalars = self.make_scalars(summed, ctl["it"] - 1)
        else:
            scalars = self.init_scalars
        self._scalars = scalars
        new_state, partial = self.apply_fn(self.state, segs, scalars)
        partial = dict(partial)
        self._partial_prev = {k: v for k, v in partial.items() if not k.startswith("_")}
        self.state = new_state
        apply_ms = (time.perf_counter() - t0) * 1e3
        ck = ctl.get("ckpt_iter")
        if ck is not None:
            self._write_part(ck)
        partial["_apply_ms"] = apply_ms
        partial["_gather_ms"] = self._gather_ms
        partial["_messages"] = float(self._msgs)
        return partial

    def write_final_part(self, it: int) -> bool:
        self._write_part(it)
        return True

    def _write_part(self, it: int) -> None:
        cp = self.checkpoint
        cp_dir = os.path.join(cp.path, f"iter={it:05d}")
        os.makedirs(cp_dir, exist_ok=True)
        n = len(self.state["vertex"])
        cols = {k: pa.array(v) for k, v in self.state.items()}
        cols["partition"] = pa.array(np.full(n, self.idx, dtype=np.int32))
        cols["iteration"] = pa.array(np.full(n, it, dtype=np.int32))
        cols["input_digest"] = pa.array([cp.input_digest] * n, pa.string())
        pq.write_table(
            pa.table(cols), os.path.join(cp_dir, f"part-{self.idx:05d}.parquet")
        )


def _sum_partials(infos) -> Dict[str, float]:
    summed: Dict[str, float] = {}
    for p in infos:
        for k, v in p.items():
            if not k.startswith("_"):
                summed[k] = summed.get(k, 0.0) + float(v)
    return summed


def _commit_manifest(checkpoint: CheckpointConfig, it: int, scalars) -> None:
    tmp = _manifest_path(checkpoint.path, it) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"iteration": it, "scalars": scalars,
                   "input_digest": checkpoint.input_digest}, f)
    os.replace(tmp, _manifest_path(checkpoint.path, it))


# (nb) -> (actors, compiled_dag); compile costs ~30 s at P=32 and the DAG
# wiring depends only on the partition count, so it is reused for the
# process lifetime (sequential runs only — the aligned loop is driver-
# synchronous, so two loops never interleave on one driver).
_DAG_CACHE: Dict[int, Tuple[list, object]] = {}
# compile wall of the most recent cache MISS (0.0 on a hit) — benches
# report it so cold-start cost stays visible
last_compile_s: float = 0.0


def clear_cache() -> None:
    for actors, cdag in _DAG_CACHE.values():
        try:
            cdag.teardown()
        except Exception:
            pass
        for a in actors:
            try:
                ray.kill(a)
            except Exception:
                pass
    _DAG_CACHE.clear()


def _get_dag(nb: int):
    global last_compile_s
    cached = _DAG_CACHE.get(nb)
    if cached is not None:
        actors, cdag = cached
        try:
            ray.get(actors[0].get_state.remote())
            last_compile_s = 0.0
            return cached
        except Exception:
            # actor pool died (e.g. ray restarted) — rebuild
            _DAG_CACHE.pop(nb, None)
    from ray.dag import InputNode, MultiOutputNode

    actors = [_CgActor.remote(i, nb) for i in range(nb)]
    t0 = time.perf_counter()
    with InputNode() as inp:
        if nb == 1:
            gathers = [actors[0].gather.bind(inp)]
            applies = [actors[0].apply.bind(inp, gathers[0])]
        else:
            gathers = [
                a.gather.options(num_returns=nb).bind(inp) for a in actors
            ]
            applies = [
                a.apply.bind(inp, *[gathers[i][j] for i in range(nb)])
                for j, a in enumerate(actors)
            ]
        dag = MultiOutputNode(applies)
    cdag = dag.experimental_compile(_max_inflight_executions=16)
    last_compile_s = time.perf_counter() - t0
    _DAG_CACHE[nb] = (actors, cdag)
    return _DAG_CACHE[nb]


def run_cgraph_loop(
    state, csr_by_block, gather_fn, apply_fn, scalars, make_scalars,
    converged, start_iter, max_iter, checkpoint, check_every, metrics,
) -> SuperstepResult:
    """Drive the compiled-graph loop. Interface mirrors
    aligned.run_aligned_loop internals."""
    from igraph_ray.aligned import AlignedState, aligned_to_dataset

    nb = len(state.blocks)
    did_converge = False
    it = start_iter
    loop_wall_s = 0.0

    if max_iter > start_iter:
        actors, cdag = _get_dag(nb)
        ray.get([
            a.set_fns.remote(gather_fn, apply_fn, make_scalars, scalars,
                             csr_by_block[i], state.starts, checkpoint)
            for i, a in enumerate(actors)
        ])
        ray.get([a.set_state.remote(state.blocks[i]) for i, a in enumerate(actors)])
        # no-op warmup: gathers run (faulting in state pages, growing every
        # channel buffer to its real working size), applies skip — state
        # unchanged, loop timer unaffected
        ray.get(cdag.execute({"warmup": True, "it": start_iter}))

        # check_every == 0 (fixed-iteration runs): scalars are derived
        # inside the actors, so the driver submits executes WINDOW-deep
        # and drains results behind the pipeline — no per-superstep
        # round trip. Convergence-tested runs keep window 1 so the state
        # never advances past the converged iteration.
        window = 8 if check_every == 0 else 1
        from collections import deque

        in_flight: deque = deque()

        def _drain():
            nonlocal scalars
            d_it, t0, fut = in_flight.popleft()
            partials = ray.get(fut)
            scalars = make_scalars(_sum_partials(partials), d_it)
            row = {
                "iteration": d_it,
                "wall_s": time.perf_counter() - t0,
                "messages": int(sum(p.get("_messages", 0.0) for p in partials)),
            }
            for key, out in (("_gather_ms", "gather_ms"), ("_apply_ms", "apply_ms")):
                vals = [p.get(key, 0.0) for p in partials]
                row[out + "_p50"] = float(np.percentile(vals, 50))
                row[out + "_p95"] = float(np.percentile(vals, 95))
            row.update({k: v for k, v in scalars.items() if not k.startswith("_")})
            metrics.append(row)
            stop = converged(scalars, d_it)
            if checkpoint is not None and (
                d_it % checkpoint.every == 0 or stop
            ):
                if d_it % checkpoint.every != 0:
                    ray.get([a.write_final_part.remote(d_it) for a in actors])
                _commit_manifest(checkpoint, d_it, scalars)
                with open(os.path.join(checkpoint.path, "metrics.jsonl"), "a") as f:
                    f.write(json.dumps(row) + "\n")
                prune_checkpoints(checkpoint, d_it)
            return d_it, stop

        loop_t0 = time.perf_counter()
        it = start_iter
        stopped_at = None
        for sub_it in range(start_iter, max_iter):
            while len(in_flight) >= window:
                d_it, stop = _drain()
                if stop:
                    stopped_at = d_it
                    break
            if stopped_at is not None:
                break
            ck_due = checkpoint is not None and sub_it % checkpoint.every == 0
            ctl = {"it": sub_it, "ckpt_iter": sub_it if ck_due else None}
            in_flight.append((sub_it, time.perf_counter(), cdag.execute(ctl)))
        while in_flight and stopped_at is None:
            d_it, stop = _drain()
            if stop:
                stopped_at = d_it
        while in_flight:
            _drain()  # drain remaining pipelined results in order
        if stopped_at is not None:
            did_converge = True
            it = stopped_at + 1
        else:
            it = max_iter
        loop_wall_s = time.perf_counter() - loop_t0
        final_blocks = [a.get_state.remote() for a in actors]
    else:
        final_blocks = state.blocks

    final_aligned = AlignedState(blocks=final_blocks, starts=state.starts)
    result = SuperstepResult(
        state=aligned_to_dataset(final_aligned),
        iterations=it,
        scalars=scalars,
        metrics=metrics,
        converged=did_converge,
        loop_wall_s=loop_wall_s,
        # block refs are owned by the cached actor pool: valid until the
        # next run through the same pool replaces them — consume promptly
        aligned_state=final_aligned,
    )
    # materialize while the (cached) actors still hold the blocks
    result.state = result.state.materialize()
    return result
