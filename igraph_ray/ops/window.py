"""Windowed aggregates over an event stream table (event_id, ts, user_id,
event_type, value). Tumbling windows are a pure groupby over the bucketed
timestamp; sessionization needs per-user time order, done with a
boundary-aligned sort so each user's events land in one block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def tumbling_window(
    events: ray.data.Dataset,
    minutes: int = 60,
    ts_col: str = "ts",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Per (window_start, event_type): count + value sum. Pre-aggregated
    per batch before the groupby shuffle."""
    us = minutes * 60 * 1_000_000

    def _bucket(b: pa.Table) -> pa.Table:
        t = pc.cast(b[ts_col], pa.int64())
        w = pc.multiply(pc.divide(t, us), us)
        g = pa.table(
            {"window_us": w, "event_type": b["event_type"],
             "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
             "value_sum": pc.cast(b[value_col], pa.float64())}
        ).group_by(["window_us", "event_type"]).aggregate([("n", "sum"), ("value_sum", "sum")])
        return pa.table(
            {"window_us": g["window_us"], "event_type": g["event_type"],
             "n": g["n_sum"], "value_sum": g["value_sum_sum"]}
        )

    from ray.data.aggregate import Sum

    g = (
        events.map_batches(_bucket, batch_format="pyarrow", batch_size=None)
        .groupby(["window_us", "event_type"])
        .aggregate(Sum("n"), Sum("value_sum"))
    )

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table(
            {"window_us": b["window_us"], "event_type": b["event_type"],
             "n": b["sum(n)"], "value_sum": b["sum(value_sum)"]}
        )

    return g.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def sessionize(
    events: ray.data.Dataset,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> ray.data.Dataset:
    """Per-user sessions with an inactivity gap: (user_id, session_start_us,
    n_events). Sort by user (hash-free range partition) keeps each user's
    events in one block; session assignment is a vectorized diff/cumsum."""

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": b[user_col], "ts_us": pc.cast(b[ts_col], pa.int64())}
        )

    gap_us = gap_minutes * 60 * 1_000_000
    prepped = events.map_batches(_prep, batch_format="pyarrow", batch_size=None).materialize()
    # boundary-aligned sort on user_id: blocks split only at user
    # boundaries, so every user's events land whole in one block and the
    # per-block session scan needs no cross-block repair
    from igraph_ray.csr import compute_boundaries

    bnds = compute_boundaries(prepped, num_partitions=8, col="user_id")
    s = (
        prepped.sort(["user_id", "ts_us"], boundaries=bnds)
        if bnds
        else prepped.sort(["user_id", "ts_us"])
    )

    def _sessions(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "session_start_us": pa.array([], pa.int64()),
                 "n_events": pa.array([], pa.int64())}
            )
        u = b["user_id"].to_numpy(zero_copy_only=False)
        t = b["ts_us"].to_numpy(zero_copy_only=False)
        new = np.empty(len(u), dtype=bool)
        new[0] = True
        new[1:] = (u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > gap_us)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(u))
        return pa.table(
            {"user_id": pa.array(u[starts], pa.int64()),
             "session_start_us": pa.array(t[starts], pa.int64()),
             "n_events": pa.array((ends - starts).astype(np.int64), pa.int64())}
        )

    return s.map_batches(_sessions, batch_format="pyarrow", batch_size=None)


def hopping_window(
    events: ray.data.Dataset,
    size_minutes: int = 60,
    hop_minutes: int = 15,
    ts_col: str = "ts",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Per (window_start, event_type): count + value sum for OVERLAPPING
    (hopping/sliding) windows — each event belongs to size/hop windows,
    expanded task-side (k copies per row, k = size//hop) then
    pre-aggregated per batch before the one groupby shuffle. value sums
    are integer-quantized e6 so the distributed reduce is
    associative-exact (the engine's float-reporting rule)."""
    size_us = size_minutes * 60 * 1_000_000
    hop_us = hop_minutes * 60 * 1_000_000
    k = size_us // hop_us

    def _expand(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"window_us": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "value_e6": pa.array([], pa.int64())})
        t = pc.cast(b[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        v = np.round(pc.cast(b[value_col], pa.float64())
                     .to_numpy(zero_copy_only=False) * 1e6).astype(np.int64)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        # window starts containing t: the k hops ending at or before t
        last = t // hop_us * hop_us
        starts = last[:, None] - np.arange(k, dtype=np.int64)[None, :] * hop_us
        inside = (starts >= 0) & (t[:, None] < starts + size_us)
        rows = np.repeat(np.arange(b.num_rows), k)[inside.ravel()]
        g = pa.table({
            "window_us": pa.array(starts.ravel()[inside.ravel()]),
            "event_type": pa.array(et[rows]),
            "n": pa.array(np.ones(len(rows), np.int64)),
            "value_e6": pa.array(v[rows]),
        }).group_by(["window_us", "event_type"]).aggregate(
            [("n", "sum"), ("value_e6", "sum")])
        return pa.table({"window_us": g["window_us"],
                         "event_type": g["event_type"],
                         "n": g["n_sum"], "value_e6": g["value_e6_sum"]})

    from ray.data.aggregate import Sum

    g = (events.map_batches(_expand, batch_format="pyarrow", batch_size=None)
         .groupby(["window_us", "event_type"])
         .aggregate(Sum("n"), Sum("value_e6")))

    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "window_us" not in b.column_names:
            return pa.table({"window_us": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "value_e6": pa.array([], pa.int64())})
        return pa.table({"window_us": b["window_us"],
                         "event_type": b["event_type"],
                         "n": pc.cast(b["sum(n)"], pa.int64()),
                         "value_e6": pc.cast(b["sum(value_e6)"], pa.int64())})

    return g.map_batches(_rn, batch_format="pyarrow", batch_size=None)
