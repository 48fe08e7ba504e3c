"""The superstep loop: iterate a Ray Data pipeline over vertex state.

Each superstep is one streaming Ray Data execution:

    state --map_batches(gather over CSR blocks)--> (dst, partial...) msgs
    state --map_batches(self_message)-----------> (dst, carry...) rows
    union --groupby('dst').agg(...)-------------> one row per vertex
          --[optional second stage]------------->
          --map_batches(apply, scalars)---------> new state  --materialize()

followed by one cheap aggregate pass producing the iteration's scalars
(residual / changed-count / dangling mass) that drive convergence — the
engine analogue of igraph's per-iteration ``maxdiff`` / ``running`` checks
(structural_properties.c:1433; community.c:2306).

The union-of-self-messages trick folds the old state into the same shuffle
so the apply stage needs **no join**: every vertex appears exactly once in
the reduced stream, carrying both its aggregated messages and its previous
state. Gather pre-combines messages per batch (np.unique/bincount), which
bounds any hub vertex's fan-in to one row per batch — the explicit
hub-salting defense the north rule requires.

``materialize()`` per superstep cuts lineage (the classic Ray Data
iterative-algorithm trap, SURVEY.md §7.4) and doubles as the checkpoint
source. Checkpoints are per-partition Parquet with lineage columns
(partition, iteration, input_digest) + a manifest written last so resume
only ever sees complete iterations.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import pyarrow as pa
import ray
import ray.data


@dataclass
class CheckpointConfig:
    path: str
    every: int = 1
    input_digest: str = ""
    keep_last: int = 0  # 0 = keep all iterations


def prune_checkpoints(cfg: "CheckpointConfig", committed_iter: int) -> None:
    """Delete iter= dirs older than the last ``keep_last`` committed ones.

    Called after a manifest commit; keep_last=0 keeps everything. Only
    directories with a committed manifest count toward the budget — a
    half-written iteration dir is never what resume reads, but it is also
    never deleted out from under a writer."""
    import shutil

    if cfg.keep_last <= 0 or not os.path.isdir(cfg.path):
        return
    committed = sorted(
        int(name.split("=")[1])
        for name in os.listdir(cfg.path)
        if name.startswith("iter=")
        and os.path.exists(_manifest_path(cfg.path, int(name.split("=")[1])))
        and int(name.split("=")[1]) <= committed_iter
    )
    for it in committed[: -cfg.keep_last]:
        shutil.rmtree(os.path.join(cfg.path, f"iter={it:05d}"), ignore_errors=True)


@dataclass
class SuperstepResult:
    state: ray.data.Dataset
    iterations: int
    scalars: Dict[str, float]
    metrics: List[dict] = field(default_factory=list)
    converged: bool = False
    # wall time of the whole iteration loop, submission to completion
    # (meaningful even when supersteps are pipelined through the task graph)
    loop_wall_s: float = 0.0
    # the final per-partition numpy state (aligned.AlignedState), set by
    # the aligned engines so multi-pass algorithms (e.g. strong components)
    # can chain passes without a re-sort
    aligned_state: Optional[object] = None


def _manifest_path(root: str, iteration: int) -> str:
    return os.path.join(root, f"iter={iteration:05d}", "_MANIFEST.json")


def write_checkpoint(
    state: ray.data.Dataset,
    cfg: CheckpointConfig,
    iteration: int,
    scalars: Dict[str, float],
    boundaries: List[int],
) -> None:
    """Per-partition Parquet + lineage columns, manifest committed last.

    Partition id = the vertex-range id (searchsorted against the engine's
    static boundaries) so a resumed run can map rows back to ranges. The
    manifest is written only after the Parquet write completes — a killed
    run can never resume from a half-written iteration.
    """
    import numpy as np

    out_dir = os.path.join(cfg.path, f"iter={iteration:05d}")
    os.makedirs(out_dir, exist_ok=True)
    bnds = np.array(boundaries, dtype=np.int64)
    digest = cfg.input_digest

    def _lineage(b: pa.Table) -> pa.Table:
        v = b["vertex"].to_numpy(zero_copy_only=False)
        part = np.searchsorted(bnds, v, side="right").astype(np.int32) if len(bnds) else np.zeros(len(v), np.int32)
        return b.append_column("partition", pa.array(part, pa.int32())).append_column(
            "iteration", pa.array(np.full(len(v), iteration, dtype=np.int32))
        ).append_column("input_digest", pa.array([digest] * len(v), pa.string()))

    state.map_batches(_lineage, batch_format="pyarrow", batch_size=None).write_parquet(out_dir)
    with open(_manifest_path(cfg.path, iteration) + ".tmp", "w") as f:
        json.dump({"iteration": iteration, "scalars": scalars, "input_digest": digest}, f)
    os.replace(_manifest_path(cfg.path, iteration) + ".tmp", _manifest_path(cfg.path, iteration))


def latest_checkpoint(path: str, input_digest: str = "") -> Optional[int]:
    """Last iteration with a committed manifest (and matching digest)."""
    if not os.path.isdir(path):
        return None
    best = None
    for name in os.listdir(path):
        if not name.startswith("iter="):
            continue
        it = int(name.split("=")[1])
        mp = _manifest_path(path, it)
        if os.path.exists(mp):
            with open(mp) as f:
                m = json.load(f)
            if input_digest and m.get("input_digest") != input_digest:
                continue
            if best is None or it > best:
                best = it
    return best


def read_checkpoint(path: str, iteration: int, state_columns: List[str]) -> ray.data.Dataset:
    out_dir = os.path.join(path, f"iter={iteration:05d}")
    return ray.data.read_parquet(out_dir, columns=state_columns)


def run_loop(
    step: Callable[[ray.data.Dataset, Dict[str, float], int], ray.data.Dataset],
    init_state: ray.data.Dataset,
    agg_columns: List[str],
    converged: Callable[[Dict[str, float], int], bool],
    max_iter: int,
    state_columns: List[str],
    checkpoint: Optional[CheckpointConfig] = None,
    boundaries: Optional[List[int]] = None,
) -> SuperstepResult:
    """Generic driver loop. ``step`` builds the (lazy) next-state pipeline;
    the loop materializes it, computes Sum aggregates over ``agg_columns``
    into the scalars dict, checkpoints, and tests convergence.

    Resume: if a checkpoint dir holds a completed iteration for the same
    input digest, the loop restarts from it (state + scalars from the
    manifest) and recomputes nothing before it.
    """
    metrics: List[dict] = []
    boundaries = boundaries or []

    start_iter = 0
    scalars: Dict[str, float] = {}
    state = init_state

    if checkpoint is not None:
        last = latest_checkpoint(checkpoint.path, checkpoint.input_digest)
        if last is not None:
            state = read_checkpoint(checkpoint.path, last, state_columns).materialize()
            with open(_manifest_path(checkpoint.path, last)) as f:
                scalars = json.load(f)["scalars"]
            start_iter = last + 1

    if not scalars:
        # initial scalar pass (e.g. dangling mass at iteration 0)
        t0 = time.perf_counter()
        state = state.materialize()
        scalars = _aggregate(state, agg_columns)
        metrics.append({"iteration": start_iter - 1, "phase": "init", "wall_s": time.perf_counter() - t0, **scalars})

    # a resumed run that was already converged must not re-iterate
    if start_iter > 0 and converged(scalars, start_iter - 1):
        return SuperstepResult(
            state=state, iterations=start_iter, scalars=scalars,
            metrics=metrics, converged=True,
        )

    it = start_iter
    did_converge = False
    for it in range(start_iter, max_iter):
        t0 = time.perf_counter()
        new_state = step(state, scalars, it).materialize()
        t1 = time.perf_counter()
        scalars = _aggregate(new_state, agg_columns)
        t2 = time.perf_counter()
        state = new_state
        row = {
            "iteration": it,
            "wall_s": t1 - t0,
            "agg_wall_s": t2 - t1,
            **scalars,
        }
        metrics.append(row)
        if checkpoint is not None and (it % checkpoint.every == 0 or converged(scalars, it)):
            write_checkpoint(state, checkpoint, it, scalars, boundaries)
            _append_metrics(checkpoint.path, row)
        if converged(scalars, it):
            did_converge = True
            it += 1
            break
    else:
        it = max_iter

    return SuperstepResult(
        state=state, iterations=it, scalars=scalars, metrics=metrics, converged=did_converge
    )


@ray.remote
def _block_sums(t: pa.Table, cols: List[str]) -> List[float]:
    import pyarrow.compute as pc

    out = []
    for c in cols:
        if t.num_rows == 0 or c not in t.column_names:
            out.append(0.0)
            continue
        v = pc.sum(t[c]).as_py()
        out.append(float(v) if v is not None else 0.0)
    return out


def _aggregate(state: ray.data.Dataset, cols: List[str]) -> Dict[str, float]:
    """Global column sums over a *materialized* state.

    Implemented as one tiny task per block over the existing block refs —
    a tree-reduce with no extra Dataset execution (a full
    ``Dataset.aggregate`` costs an AllToAll per iteration, which dominates
    superstep wall time for anything but huge states).
    """
    if not cols:
        return {}
    refs = state.to_arrow_refs()
    parts = ray.get([_block_sums.remote(r, cols) for r in refs])
    out: Dict[str, float] = {c: 0.0 for c in cols}
    for p in parts:
        for c, v in zip(cols, p):
            out[c] += v
    return out


def _append_metrics(root: str, row: dict) -> None:
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "metrics.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


# --- per-task gather metrics side-channel (per-partition evidence) ---------

def record_task_metrics(root: Optional[str], iteration: int, part: int, row: dict) -> None:
    """Written directly from gather tasks when a metrics dir is configured.
    At real scale this lands on the shared checkpoint store."""
    if not root:
        return
    d = os.path.join(root, "task_metrics")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, f"iter{iteration:05d}_part{part:05d}_{os.getpid()}.json")
    with open(p, "w") as f:
        json.dump(row, f)
