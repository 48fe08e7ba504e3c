"""Partition-aligned fast execution of the superstep exchange.

This is the performance path for the iterative algorithms. It executes the
*same* logical plan as superstep.py's Ray-Data loop — gather-scatter over
CSR blocks, pre-combined (dst, partial) messages, a groupby-by-destination
aggregate, a vertex-wise apply — but specializes the shuffle to the static
range partitioning both sides already share: gather task *i* splits its
pre-combined messages by target state block (np.searchsorted on the block
start array) and returns one object per target; apply task *j* consumes
exactly the segments addressed to it. That is a hash(range)-partitioned
groupby-aggregate executed as a P×P partition-wise exchange, with
per-partition combine on both sides — the explicit salting/skew story of
the north rule, minus the generic sort-shuffle's per-iteration fixed cost
(which dominates superstep wall time: ~3 s/iteration for ANY graph size in
the generic engine vs ~30-100 ms here).

This is the one place the engine drops below the Dataset API, and it is the
sanctioned case: an iteratively-updated partitioned vertex state shared
across supersteps (a "shared mutable index"). Everything feeding it (edge
canonicalization, degree computation, CSR build, checkpoint I/O) and
everything after it remains Ray Data. Both engines share the numpy message
kernels (kernels.py) and are cross-checked for equality in tests.

State lives in the object store as one sorted-by-vertex Arrow-backed numpy
block per range; blocks move node-to-node only as message segments, never
through the driver.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from igraph_ray.superstep import (
    CheckpointConfig,
    SuperstepResult,
    _manifest_path,
    latest_checkpoint,
    prune_checkpoints,
)


@dataclass
class AlignedState:
    blocks: List[ray.ObjectRef]  # each -> dict[str, np.ndarray], 'vertex' sorted asc
    starts: np.ndarray  # first vertex id of each block


@ray.remote(num_returns=2)
def _state_block_from_arrow(t: pa.Table, init_fn):
    """Convert a sorted Arrow block into numpy state arrays; returns
    ((first_vertex, rows), state_dict)."""
    if t.num_rows == 0 or "vertex" not in t.column_names:
        return (None, None)
    d = {c: t[c].to_numpy(zero_copy_only=False) for c in t.column_names}
    if init_fn is not None:
        d = init_fn(d)
    return ((int(d["vertex"][0]), len(d["vertex"])), d)


def state_from_dataset(
    ds: ray.data.Dataset,
    boundaries: Sequence[int],
    init_fn: Optional[Callable[[dict], dict]] = None,
) -> AlignedState:
    """Range-partition a (vertex, ...) Dataset by the engine boundaries and
    pin each block in the object store as numpy arrays."""
    if boundaries:
        s = ds.sort("vertex", boundaries=list(boundaries)).materialize()
    else:
        s = ds.sort("vertex").materialize()
    refs = s.to_arrow_refs()
    pairs = [_state_block_from_arrow.remote(r, init_fn) for r in refs]
    metas = ray.get([p[0] for p in pairs])
    blocks, starts = [], []
    for meta, p in zip(metas, pairs):
        if meta is None:
            continue
        blocks.append(p[1])
        starts.append(meta[0])
    order = np.argsort(starts)
    return AlignedState(
        blocks=[blocks[i] for i in order],
        starts=np.array([starts[i] for i in order], dtype=np.int64),
    )


@ray.remote
def _range_dsts(csr_data: dict, boundaries_arr: np.ndarray):
    """Unique dsts of one CSR block, split by target range. Returns a tuple
    of len(boundaries)+1 arrays (the P×P exchange for sparse universes)."""
    u = np.unique(csr_data["dst"])
    cuts = np.searchsorted(u, boundaries_arr)
    segs = []
    lo = 0
    for hi in list(cuts) + [len(u)]:
        segs.append(u[lo:hi])
        lo = hi
    return tuple(segs)


@ray.remote(num_returns=2)
def _build_state_block(
    lo: int,
    hi: int,
    csr_datas: List[dict],
    dst_segs,
    dense: bool,
    init_fn,
):
    """Build one aligned state block (vertex sorted, deg) for range [lo,hi).

    dense=True: vertex universe is the full integer range (explicit n).
    dense=False: universe = srcs with out-edges ∪ incoming dsts (segments).
    Returns ((first_vertex, rows), state_dict).
    """
    from igraph_ray.csr import fetch_block

    csr_datas = [fetch_block(r) for r in csr_datas]
    dst_segs = [s if isinstance(s, np.ndarray) else ray.get(s) for s in (dst_segs or [])]
    if dense:
        vertex = np.arange(lo, hi, dtype=np.int64)
        deg = np.zeros(hi - lo, dtype=np.float64)
        for blk in csr_datas:
            vlo, vhi = blk["vlo"], blk["vhi"]
            d = np.diff(blk["indptr"]).astype(np.float64)
            if "weight" in blk:
                # weighted strength per local vertex via reduceat
                ip = blk["indptr"]
                w = blk["weight"]
                nz = ip[:-1] < ip[1:]
                ws = np.zeros(len(ip) - 1)
                if nz.any():
                    ws[nz] = np.add.reduceat(w, ip[:-1][nz])
                d = ws
            deg[vlo - lo : vhi + 1 - lo] += d
    else:
        parts = [s for s in dst_segs if len(s)]
        for blk in csr_datas:
            ip = blk["indptr"]
            if "row_vids" in blk:  # compressed rows all have out-edges
                local = blk["row_vids"]
            else:
                local = np.flatnonzero(ip[1:] > ip[:-1]) + blk["vlo"]
            parts.append(local)
        if not parts:
            return (None, None)
        vertex = np.unique(np.concatenate(parts))
        deg = np.zeros(len(vertex), dtype=np.float64)
        for blk in csr_datas:
            ip = blk["indptr"]
            local = (blk["row_vids"] if "row_vids" in blk
                     else np.arange(blk["vlo"], blk["vhi"] + 1, dtype=np.int64))
            nz = ip[:-1] < ip[1:]
            if "weight" in blk:
                w = blk["weight"]
                d = np.zeros(len(ip) - 1)
                if nz.any():
                    d[nz] = np.add.reduceat(w, ip[:-1][nz])
            else:
                d = np.diff(ip).astype(np.float64)
            # only vertices that actually have out-edges are guaranteed to
            # be in the sparse universe; zero-degree locals may be absent
            pos = np.searchsorted(vertex, local[nz])
            deg[pos] += d[nz]
    if len(vertex) == 0:
        return (None, None)
    sd = {"vertex": vertex, "deg": deg}
    if init_fn is not None:
        sd = init_fn(sd)
    return ((int(sd["vertex"][0]), len(sd["vertex"])), sd)


def state_from_csr(csr, n: Optional[int], init_fn=None) -> AlignedState:
    """Build the aligned vertex state straight from the CSR index — no
    Ray Data aggregate (the sort-based groupby costs tens of seconds per
    million-row shuffle and the CSR already encodes degrees).

    With explicit ``n`` the universe is dense; otherwise it is assembled
    from per-block unique dsts exchanged range-to-range plus local srcs.
    ``deg`` is the out-degree (weighted strength when the CSR carries
    weights), loops already excluded by the CSR variant.
    """
    boundaries = np.array(csr.boundaries, dtype=np.int64)
    nb = len(boundaries) + 1
    if n is not None:
        range_lo = np.concatenate([[0], boundaries])
        range_hi = np.concatenate([boundaries, [n]])
    else:
        big = np.int64(2**62)
        range_lo = np.concatenate([[np.int64(-big)], boundaries])
        range_hi = np.concatenate([boundaries, [big]])

    csr_by_range: List[list] = [[] for _ in range(nb)]
    for m in csr.blocks:
        r = int(np.searchsorted(boundaries, m.vlo, side="right"))
        csr_by_range[r].append(m.ref)

    dst_segs_by_range: List[list] = [[] for _ in range(nb)]
    if n is None:
        outs = [
            _range_dsts.options(num_returns=nb).remote(m.ref, boundaries)
            for m in csr.blocks
        ]
        for refs in outs:
            refs = list(refs) if nb > 1 else [refs]
            for r in range(nb):
                dst_segs_by_range[r].append(refs[r])

    pairs = [
        _build_state_block.remote(
            int(range_lo[r]), int(range_hi[r]), csr_by_range[r],
            dst_segs_by_range[r], n is not None, init_fn,
        )
        for r in range(nb)
    ]
    metas = ray.get([p[0] for p in pairs])
    blocks, starts = [], []
    for meta, p in zip(metas, pairs):
        if meta is None:
            continue
        blocks.append(p[1])
        starts.append(meta[0])
    order = np.argsort(starts)
    return AlignedState(
        blocks=[blocks[i] for i in order],
        starts=np.array([starts[i] for i in order], dtype=np.int64),
    )


def _csr_for_blocks(csr_descriptors, starts: np.ndarray) -> List[list]:
    """Assign CSR blocks to state blocks by vertex-range overlap."""
    nb = len(starts)
    ends = np.append(starts[1:], np.int64(2**62))
    out: List[list] = [[] for _ in range(nb)]
    for (vlo, vhi, ref) in csr_descriptors:
        i = int(np.searchsorted(starts, vlo, side="right") - 1)
        i = max(i, 0)
        while i < nb and starts[i] <= vhi:
            if vlo < ends[i] and vhi >= starts[i]:
                out[i].append((vlo, vhi, ref))
            i += 1
    return out


def _sum_partials(infos) -> Dict[str, float]:
    summed: Dict[str, float] = {}
    for p in infos:
        for k, v in p.items():
            if not k.startswith("_"):
                summed[k] = summed.get(k, 0.0) + float(v)
    return summed


def _step_impl(
    gather_fn, apply_fn, make_scalars, init_scalars,
    old_state, csr_desc, starts, iteration, nb, group_size,
    idx_in_group, bootstrap, partial_refs, *groups,
):
    """One fused superstep task for one partition: derive this iteration's
    scalars from the previous step's (tiny) partials, apply the incoming
    segments, then gather + pack outgoing segments for the next iteration.

    Fusing apply+gather and computing the scalar reduce locally keeps the
    critical path at ONE scheduling hop per superstep (the BSP minimum) —
    the split gather/apply/reduce pipeline pays three hops, which dominates
    wall time once per-task compute is tens of milliseconds. Segments are
    packed into ceil(nb/group_size) group objects (two-level exchange) to
    bound object-store operation count.
    """
    if isinstance(gather_fn, ray.ObjectRef):
        gather_fn = ray.get(gather_fn)
    if isinstance(apply_fn, ray.ObjectRef):
        apply_fn = ray.get(apply_fn)
    if isinstance(make_scalars, ray.ObjectRef):
        make_scalars = ray.get(make_scalars)
    t0 = time.perf_counter()
    if bootstrap:
        new_state = old_state
        partial: Dict[str, float] = {}
        scalars = init_scalars
        apply_ms = 0.0
    else:
        prev = ray.get(list(partial_refs)) if partial_refs else []
        prev = [p for p in prev if p]
        scalars = make_scalars(_sum_partials(prev), iteration - 1) if prev else init_scalars
        segments = [grp[idx_in_group] for grp in groups]
        ta = time.perf_counter()
        new_state, partial = apply_fn(old_state, segments, scalars)
        partial = dict(partial)
        apply_ms = (time.perf_counter() - ta) * 1e3
    tg = time.perf_counter()
    segs, msg_count = gather_fn(new_state, csr_desc, starts, scalars)
    groups_out = [tuple(segs[g : g + group_size]) for g in range(0, nb, group_size)]
    partial["_apply_ms"] = apply_ms
    partial["_gather_ms"] = (time.perf_counter() - tg) * 1e3
    partial["_wall_ms"] = (time.perf_counter() - t0) * 1e3
    partial["_messages"] = float(msg_count)
    return (new_state, *groups_out, partial)


@ray.remote(num_cpus=0)
class _PartitionActor:
    """One partition of the superstep state, pinned in a long-lived actor.

    The actor holds its CSR blocks (zero-copy plasma views) and its state
    arrays in process memory across supersteps: per iteration the only
    traffic is the message segments and a tiny partials dict. Compared to
    the task mode this removes per-superstep state put/get (V×32B per
    iteration) and per-task scheduling/lease overhead — the fixed costs
    that cap single-node scaling. num_cpus=0 so P actors schedule at any
    slot count; the OS time-slices them (they are separate processes).
    """

    def __init__(self, gather_fn, apply_fn, make_scalars, init_scalars,
                 csr_desc, starts, nb, group_size):
        self.gather_fn = gather_fn
        self.apply_fn = apply_fn
        self.make_scalars = make_scalars
        self.init_scalars = init_scalars
        self.csr_desc = csr_desc
        self.starts = starts
        self.nb = nb
        self.group_size = group_size
        self.state = None

    def set_state(self, block: dict) -> bool:
        self.state = {k: np.asarray(v) for k, v in block.items()}
        return True

    def get_state(self) -> dict:
        return self.state

    def _pack(self, segs):
        return [tuple(segs[g : g + self.group_size]) for g in range(0, self.nb, self.group_size)]

    def bootstrap(self):
        t0 = time.perf_counter()
        segs, cnt = self.gather_fn(self.state, self.csr_desc, self.starts, self.init_scalars)
        info = {"_gather_ms": (time.perf_counter() - t0) * 1e3, "_apply_ms": 0.0,
                "_wall_ms": (time.perf_counter() - t0) * 1e3, "_messages": float(cnt)}
        return (*self._pack(segs), info)

    def step(self, iteration, idx_in_group, prev_partials, *groups):
        t0 = time.perf_counter()
        prev = ray.get(list(prev_partials)) if prev_partials else []
        prev = [p for p in prev if p]
        scalars = (
            self.make_scalars(_sum_partials(prev), iteration - 1)
            if prev else self.init_scalars
        )
        segments = [grp[idx_in_group] for grp in groups]
        ta = time.perf_counter()
        new_state, partial = self.apply_fn(self.state, segments, scalars)
        partial = dict(partial)
        apply_ms = (time.perf_counter() - ta) * 1e3
        self.state = new_state
        tg = time.perf_counter()
        segs, cnt = self.gather_fn(new_state, self.csr_desc, self.starts, scalars)
        partial["_apply_ms"] = apply_ms
        partial["_gather_ms"] = (time.perf_counter() - tg) * 1e3
        partial["_wall_ms"] = (time.perf_counter() - t0) * 1e3
        partial["_messages"] = float(cnt)
        return (*self._pack(segs), partial)

    def write_checkpoint(self, path: str, part: int, iteration: int, digest: str) -> int:
        n = len(self.state["vertex"])
        cols = {k: pa.array(v) for k, v in self.state.items()}
        cols["partition"] = pa.array(np.full(n, part, dtype=np.int32))
        cols["iteration"] = pa.array(np.full(n, iteration, dtype=np.int32))
        cols["input_digest"] = pa.array([digest] * n, pa.string())
        pq.write_table(pa.table(cols), os.path.join(path, f"part-{part:05d}.parquet"))
        return n


@ray.remote
def _write_block(state_block: dict, path: str, part: int, iteration: int, digest: str) -> int:
    n = len(state_block["vertex"])
    cols = {k: pa.array(v) for k, v in state_block.items()}
    cols["partition"] = pa.array(np.full(n, part, dtype=np.int32))
    cols["iteration"] = pa.array(np.full(n, iteration, dtype=np.int32))
    cols["input_digest"] = pa.array([digest] * n, pa.string())
    pq.write_table(pa.table(cols), os.path.join(path, f"part-{part:05d}.parquet"))
    return n


@ray.remote
def _read_block(path: str, columns: List[str]) -> dict:
    t = pq.read_table(path, columns=columns)
    return {c: t[c].to_numpy(zero_copy_only=False) for c in columns}


def run_aligned_loop(
    state: AlignedState,
    csr_descriptors,
    gather_fn: Callable,
    apply_fn: Callable,
    scalars: Dict[str, float],
    make_scalars: Callable[[Dict[str, float], int], Dict[str, float]],
    converged: Callable[[Dict[str, float], int], bool],
    max_iter: int,
    state_columns: List[str],
    checkpoint: Optional[CheckpointConfig] = None,
    check_every: int = 1,
    segment_group_size: int = 16,
    engine: str = "tasks",
) -> SuperstepResult:
    """Generic aligned loop. ``gather_fn(state_block, csr_desc, starts,
    scalars) -> (segments_list, msg_count)``; ``apply_fn(old_state,
    segments, scalars) -> (new_state, partial_scalars)``. ``make_scalars``
    turns summed partials into the next iteration's scalars dict.

    ``check_every``: fetch the scalars and test convergence every k
    iterations (0 = never, for fixed-iteration runs: the loop then streams
    all supersteps through the task graph with no driver barrier)."""
    metrics: List[dict] = []
    start_iter = 0

    if checkpoint is not None:
        last = latest_checkpoint(checkpoint.path, checkpoint.input_digest)
        if last is not None:
            cp_dir = os.path.join(checkpoint.path, f"iter={last:05d}")
            files = sorted(
                os.path.join(cp_dir, f) for f in os.listdir(cp_dir) if f.endswith(".parquet")
            )
            blocks = [_read_block.remote(f, state_columns) for f in files]
            starts = np.array(
                [int(b["vertex"][0]) for b in ray.get(blocks)], dtype=np.int64
            )
            state = AlignedState(blocks=blocks, starts=starts)
            with open(_manifest_path(checkpoint.path, last)) as f:
                scalars = json.load(f)["scalars"]
            start_iter = last + 1

    # a resumed run that was already converged must not re-iterate
    if start_iter > 0 and converged(scalars, start_iter - 1):
        return SuperstepResult(
            state=aligned_to_dataset(state), iterations=start_iter,
            scalars=scalars, metrics=metrics, converged=True,
        )

    nb = len(state.blocks)
    csr_by_block = _csr_for_blocks(csr_descriptors, state.starts)

    if engine == "cgraph":
        from igraph_ray.cgraph import run_cgraph_loop

        return run_cgraph_loop(
            state, csr_by_block, gather_fn, apply_fn, scalars, make_scalars,
            converged, start_iter, max_iter, checkpoint, check_every, metrics,
        )

    if engine == "spmd":
        from igraph_ray.spmd import run_spmd_loop

        return run_spmd_loop(
            state, csr_by_block, gather_fn, apply_fn, scalars, make_scalars,
            converged, start_iter, max_iter, checkpoint, metrics,
        )

    if engine == "actors":
        return _run_actor_loop(
            state, csr_by_block, gather_fn, apply_fn, scalars, make_scalars,
            converged, start_iter, max_iter, checkpoint, check_every,
            segment_group_size, metrics,
        )

    step_task = ray.remote(_step_impl)

    # ship the per-algorithm closures and the starts array to plasma ONCE —
    # passing them by value would re-pickle them for every one of the
    # O(P) tasks × iterations (a dominant driver-side cost at small task
    # sizes). Tasks resolve the tiny refs locally.
    gather_fn_ref = ray.put(gather_fn)
    apply_fn_ref = ray.put(apply_fn)
    make_scalars_ref = ray.put(make_scalars)
    init_scalars_ref = ray.put(scalars)
    starts_ref = ray.put(state.starts)

    group_size = max(1, min(segment_group_size, nb))
    ngroups = (nb + group_size - 1) // group_size
    nret = ngroups + 2  # state, groups..., partials/info
    info_refs_by_iter: List[list] = []

    loop_t0 = time.perf_counter()
    # bootstrap step: gather-only from the initial state
    prev = []
    for i in range(nb):
        out = step_task.options(num_returns=nret).remote(
            gather_fn_ref, apply_fn_ref, make_scalars_ref, init_scalars_ref,
            state.blocks[i], csr_by_block[i], starts_ref, start_iter - 1,
            nb, group_size, 0, True, [],
        )
        prev.append(list(out))

    it = start_iter
    did_converge = False
    for it in range(start_iter, max_iter):
        t0 = time.perf_counter()
        prev_infos = [prev[i][ngroups + 1] for i in range(nb)]
        outs = []
        for j in range(nb):
            g = j // group_size
            groups = [prev[i][1 + g] for i in range(nb)]
            out = step_task.options(num_returns=nret).remote(
                gather_fn_ref, apply_fn_ref, make_scalars_ref, init_scalars_ref,
                prev[j][0], csr_by_block[j], starts_ref, it,
                nb, group_size, j - g * group_size, False,
                prev_infos if it > start_iter else [], *groups,
            )
            outs.append(list(out))
        prev = outs
        info_refs_by_iter.append([outs[i][ngroups + 1] for i in range(nb)])
        state = AlignedState(blocks=[outs[i][0] for i in range(nb)], starts=state.starts)

        must_sync = (
            checkpoint is not None and it % checkpoint.every == 0
        ) or (check_every > 0 and it % check_every == check_every - 1)
        if must_sync:
            scalars = make_scalars(_sum_partials(ray.get(info_refs_by_iter[-1])), it)
        row = {"iteration": it, "wall_s": time.perf_counter() - t0,
               **{k: v for k, v in (scalars.items() if must_sync else []) if not k.startswith("_")}}
        metrics.append(row)
        stop = must_sync and converged(scalars, it)
        if checkpoint is not None and (it % checkpoint.every == 0 or stop):
            cp_dir = os.path.join(checkpoint.path, f"iter={it:05d}")
            os.makedirs(cp_dir, exist_ok=True)
            ray.get(
                [
                    _write_block.remote(state.blocks[p], cp_dir, p, it, checkpoint.input_digest)
                    for p in range(nb)
                ]
            )
            tmp = _manifest_path(checkpoint.path, it) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {"iteration": it, "scalars": scalars, "input_digest": checkpoint.input_digest},
                    f,
                )
            os.replace(tmp, _manifest_path(checkpoint.path, it))
            with open(os.path.join(checkpoint.path, "metrics.jsonl"), "a") as f:
                f.write(json.dumps(row) + "\n")
            prune_checkpoints(checkpoint, it)
        if stop:
            did_converge = True
            it += 1
            break
    else:
        it = max_iter

    if info_refs_by_iter:
        scalars = make_scalars(_sum_partials(ray.get(info_refs_by_iter[-1])), it - 1)
    loop_wall_s = time.perf_counter() - loop_t0

    # enrich metrics with per-task walls / message counts (collected lazily
    # so the hot loop never blocked on them)
    for row, refs in zip(metrics[-len(info_refs_by_iter):], info_refs_by_iter):
        infos = ray.get(refs)
        gw = [g.get("_gather_ms", 0.0) for g in infos]
        aw = [g.get("_apply_ms", 0.0) for g in infos]
        row["messages"] = int(sum(g.get("_messages", 0.0) for g in infos))
        row["gather_ms_p50"] = float(np.percentile(gw, 50)) if gw else 0.0
        row["gather_ms_p95"] = float(np.percentile(gw, 95)) if gw else 0.0
        row["apply_ms_p50"] = float(np.percentile(aw, 50)) if aw else 0.0
        row["apply_ms_p95"] = float(np.percentile(aw, 95)) if aw else 0.0

    return SuperstepResult(
        state=aligned_to_dataset(state),
        iterations=it,
        scalars=scalars,
        metrics=metrics,
        converged=did_converge,
        loop_wall_s=loop_wall_s,
        aligned_state=state,
    )


def _run_actor_loop(
    state: AlignedState,
    csr_by_block,
    gather_fn,
    apply_fn,
    scalars,
    make_scalars,
    converged,
    start_iter,
    max_iter,
    checkpoint,
    check_every,
    segment_group_size,
    metrics,
):
    nb = len(state.blocks)
    group_size = max(1, min(segment_group_size, nb))
    ngroups = (nb + group_size - 1) // group_size
    nret = ngroups + 1
    starts_ref = ray.put(state.starts)

    actors = [
        _PartitionActor.remote(
            gather_fn, apply_fn, make_scalars, scalars,
            csr_by_block[i], starts_ref, nb, group_size,
        )
        for i in range(nb)
    ]
    ray.get([a.set_state.remote(state.blocks[i]) for i, a in enumerate(actors)])

    info_refs_by_iter: List[list] = []
    loop_t0 = time.perf_counter()
    prev = [list(a.bootstrap.options(num_returns=nret).remote()) for a in actors]

    it = start_iter
    did_converge = False
    for it in range(start_iter, max_iter):
        t0 = time.perf_counter()
        prev_infos = [prev[i][ngroups] for i in range(nb)]
        outs = []
        for j in range(nb):
            g = j // group_size
            groups = [prev[i][g] for i in range(nb)]
            out = actors[j].step.options(num_returns=nret).remote(
                it, j - g * group_size,
                prev_infos if it > start_iter else [], *groups,
            )
            outs.append(list(out))
        prev = outs
        info_refs_by_iter.append([outs[i][ngroups] for i in range(nb)])

        must_sync = (
            checkpoint is not None and it % checkpoint.every == 0
        ) or (check_every > 0 and it % check_every == check_every - 1)
        if must_sync:
            scalars = make_scalars(_sum_partials(ray.get(info_refs_by_iter[-1])), it)
        row = {"iteration": it, "wall_s": time.perf_counter() - t0,
               **{k: v for k, v in (scalars.items() if must_sync else []) if not k.startswith("_")}}
        metrics.append(row)
        stop = must_sync and converged(scalars, it)
        if checkpoint is not None and (it % checkpoint.every == 0 or stop):
            cp_dir = os.path.join(checkpoint.path, f"iter={it:05d}")
            os.makedirs(cp_dir, exist_ok=True)
            ray.get([
                actors[p].write_checkpoint.remote(cp_dir, p, it, checkpoint.input_digest)
                for p in range(nb)
            ])
            tmp = _manifest_path(checkpoint.path, it) + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"iteration": it, "scalars": scalars,
                           "input_digest": checkpoint.input_digest}, f)
            os.replace(tmp, _manifest_path(checkpoint.path, it))
            with open(os.path.join(checkpoint.path, "metrics.jsonl"), "a") as f:
                f.write(json.dumps(row) + "\n")
            prune_checkpoints(checkpoint, it)
        if stop:
            did_converge = True
            it += 1
            break
    else:
        it = max_iter

    if info_refs_by_iter:
        scalars = make_scalars(_sum_partials(ray.get(info_refs_by_iter[-1])), it - 1)
    loop_wall_s = time.perf_counter() - loop_t0

    for row, refs in zip(metrics[-len(info_refs_by_iter):], info_refs_by_iter):
        infos = ray.get(refs)
        gw = [g.get("_gather_ms", 0.0) for g in infos]
        aw = [g.get("_apply_ms", 0.0) for g in infos]
        row["messages"] = int(sum(g.get("_messages", 0.0) for g in infos))
        row["gather_ms_p50"] = float(np.percentile(gw, 50)) if gw else 0.0
        row["gather_ms_p95"] = float(np.percentile(gw, 95)) if gw else 0.0
        row["apply_ms_p50"] = float(np.percentile(aw, 50)) if aw else 0.0
        row["apply_ms_p95"] = float(np.percentile(aw, 95)) if aw else 0.0

    final_blocks = [a.get_state.remote() for a in actors]
    result = SuperstepResult(
        state=aligned_to_dataset(AlignedState(blocks=final_blocks, starts=state.starts)),
        iterations=it,
        scalars=scalars,
        metrics=metrics,
        converged=did_converge,
        loop_wall_s=loop_wall_s,
    )
    # keep actors alive until the final state is materialized
    result.state = result.state.materialize()
    for a in actors:
        ray.kill(a)
    return result


@ray.remote
def _block_to_arrow(state_block: dict) -> pa.Table:
    return pa.table({k: pa.array(v) for k, v in state_block.items()})


def aligned_to_dataset(state: AlignedState) -> ray.data.Dataset:
    tables = [_block_to_arrow.remote(b) for b in state.blocks]
    return ray.data.from_arrow_refs(tables)
