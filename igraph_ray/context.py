"""Engine-wide execution context helpers.

Keeps Ray Data tuned for the superstep workload. ``configure()`` is
idempotent and safe to call from bench / CLI / tests; the library never
calls ``ray.init()`` itself (the driver owns the session).
"""

from __future__ import annotations

import ray.data


def configure(quiet: bool = True, target_max_block_size: int | None = None) -> None:
    """Tune the Ray Data context for iterative graph workloads.

    - progress bars off (they dominate wall time for many small supersteps);
    - optional block-size override: superstep state rows are narrow
      (vertex:int64 + a few float64), so the default 128 MiB blocks are fine
      at scale; tests may shrink it to force multi-block paths.
    """
    ctx = ray.data.DataContext.get_current()
    if quiet:
        ctx.enable_progress_bars = False
    if target_max_block_size is not None:
        ctx.target_max_block_size = target_max_block_size
    # Ray's read planner has a 200-block parallelism floor; on a small input
    # that shatters the read into confetti blocks and every downstream stage
    # pays per-block dispatch. Cap the floor at the cluster slot count — at
    # scale the target_max_block_size cap governs and this is a no-op.
    if hasattr(ctx, "read_op_min_num_blocks"):
        ctx.read_op_min_num_blocks = min(
            int(getattr(ctx, "read_op_min_num_blocks", 200)), num_cpus()
        )


def num_cpus() -> int:
    import ray

    try:
        return int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        return 4
