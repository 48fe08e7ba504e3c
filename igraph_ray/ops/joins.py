"""Temporal joins — as-of join and range (interval) join.

Neither exists in Ray Data's Dataset API; both are staples of
event-stream / feature-pipeline processing, so the engine provides
them as first-class composed operators (the task brief's canonical
"custom operator" examples alongside the windowed aggregates in
ops/window.py).

**as-of join** (``asof_join``): for every left row (key, t), attach
the right row with the same key and the LARGEST right time <= t
(backward; ``strict=True`` uses < t), optionally within
``tolerance_us``. Distributed shape: both sides are tagged and
UNIONED into one dataset, boundary-aligned range-sorted on
(key, t, side) — the same one-exchange pattern sessionize uses
(ops/window.py) — so every key's timeline lands whole and ordered in
one block, and the match is a vectorized forward-fill scan per block
(np.maximum.accumulate over right-row positions, reset at key
starts). ONE range exchange total, no per-row work, no driver
participation. Partitioning assumption: a single key's full timeline
fits in one block (same contract as any per-key ordered operator); a
pathologically hot key should be pre-split by time with per-range
seed rows carried forward — documented, not automated.

**range join** (``range_join``): join points (key, t) against
intervals (key, lo, hi) with lo <= t < hi. Distributed shape: each
interval is expanded task-side into the fixed-width time buckets it
covers (ceil(len/bucket)+1 copies, bounded), points keep their single
bucket, and ONE equi-join on (key, bucket) plus an exact containment
filter yields each matching pair exactly once (a point lives in
exactly one bucket, so no dedup pass is needed). The expansion factor
is the documented partitioning assumption: pick ``bucket_us`` near
the typical interval length; ``max_copies`` guards runaway intervals.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.util import drop_empty_blocks, hash_join


def _empty(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    on: str,
    left_cols: List[str],
    right_cols: List[str],
    strict: bool = False,
    tolerance_us: Optional[int] = None,
    join_type: str = "inner",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Backward as-of join.

    ``left``/``right`` carry (``by``: int64/string key, ``on``: int64
    time) plus their payload columns (``left_cols`` / ``right_cols``;
    names must be disjoint). The right side must be UNIQUE per
    (by, on) — pre-aggregate otherwise, exactly as SQL ASOF JOIN
    requires for a deterministic answer. Returns
    (by, on, *left_cols, *right_cols) with right payloads taken from
    the matched row (nulls under ``join_type="left"``; unmatched rows
    dropped under ``"inner"``).
    """
    if join_type not in ("inner", "left"):
        raise ValueError(f"join_type must be inner|left, got {join_type}")

    def _types(ds):
        s = ds.schema()
        return dict(zip(s.names, s.types))

    lt, rt = _types(left), _types(right)
    int_key = pa.types.is_integer(lt[by])
    # non-integer keys ride a deterministic int64 hash so the range
    # exchange can still be boundary-aligned on the key (a key group
    # must never straddle sorted blocks — the forward-fill scan is
    # per-block); the true key stays the secondary sort column, so
    # hash collisions are harmless (group starts use the real key).
    range_col = by if int_key else "__kh"
    # unified union schema: [hash,] by, on, __side, payloads
    unified = pa.schema(
        ([] if int_key else [pa.field("__kh", pa.int64())])
        + [pa.field(by, lt[by]),
           pa.field(on, pa.int64()),
           pa.field("__side", pa.int8())]
        + [pa.field(c, lt[c]) for c in left_cols]
        + [pa.field(c, rt[c]) for c in right_cols])

    def _tag(side: int, payload: List[str], other: List[str]):
        def _m(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or by not in b.column_names:
                return _empty(unified)
            cols = {by: b[by], on: pc.cast(b[on], pa.int64()),
                    "__side": pa.array(
                        np.full(b.num_rows, side, np.int8))}
            if not int_key:
                import pandas as pd
                kh = pd.util.hash_array(
                    b[by].to_numpy(zero_copy_only=False))
                cols["__kh"] = pa.array(
                    (kh & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64))
            for c in payload:
                cols[c] = b[c]
            for c in other:
                cols[c] = pa.nulls(b.num_rows, unified.field(c).type)
            return pa.table({f.name: cols[f.name] for f in unified})
        return _m

    u = drop_empty_blocks(left).map_batches(
        _tag(1, left_cols, right_cols), batch_format="pyarrow",
        batch_size=None).union(
        drop_empty_blocks(right).map_batches(
            _tag(0, right_cols, left_cols), batch_format="pyarrow",
            batch_size=None)).materialize()

    from igraph_ray.csr import compute_boundaries

    bnds = compute_boundaries(u, num_partitions=num_partitions,
                              col=range_col)
    sort_cols = ([range_col] if not int_key else []) + [by, on, "__side"]
    s = u.sort(sort_cols, boundaries=bnds) if bnds else u.sort(sort_cols)

    out_schema = pa.schema(
        [unified.field(by), pa.field(on, pa.int64())]
        + [unified.field(c) for c in left_cols]
        + [unified.field(c) for c in right_cols])

    def _merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or by not in b.column_names:
            return _empty(out_schema)
        key = b[by].to_numpy(zero_copy_only=False)
        t = b[on].to_numpy(zero_copy_only=False)
        side = b["__side"].to_numpy(zero_copy_only=False)
        n = len(key)
        idx = np.arange(n, dtype=np.int64)
        isr = side == 0
        # last right-row position at or before each row (sort puts the
        # right row first at equal (by, on))
        last = np.maximum.accumulate(np.where(isr, idx, -1))
        # first position of each key group
        newg = np.empty(n, dtype=bool)
        newg[0] = True
        newg[1:] = key[1:] != key[:-1]
        gstart = np.maximum.accumulate(np.where(newg, idx, -1))
        cand = last.copy()
        if strict:
            # (by, on) unique on the right => at most one candidate at
            # t itself; step those back to the previous right row
            rpos = np.flatnonzero(isr)
            eq = (cand >= 0) & (t[np.maximum(cand, 0)] >= t) & ~isr
            if eq.any() and len(rpos):
                pos = np.searchsorted(rpos, cand[eq])  # cand is a right pos
                prev = np.where(pos > 0, rpos[np.maximum(pos - 1, 0)], -1)
                cand[eq] = prev
        ok = (~isr) & (cand >= 0) & (cand >= gstart)
        if tolerance_us is not None:
            safe = np.maximum(cand, 0)
            ok &= (t - t[safe]) <= tolerance_us
        lmask = ~isr if join_type == "left" else ok
        lrows = np.flatnonzero(lmask)
        matched = ok[lrows]
        src = np.maximum(cand[lrows], 0)
        take_r = pa.array(np.where(matched, src, -1), pa.int64())
        take_r = pc.if_else(pc.equal(take_r, -1),
                            pa.nulls(len(lrows), pa.int64()), take_r)
        li = pa.array(lrows, pa.int64())
        cols = {by: pc.take(b[by], li), on: pc.take(b[on], li)}
        for c in left_cols:
            cols[c] = pc.take(b[c], li)
        for c in right_cols:
            cols[c] = pc.take(b[c], take_r)
        return pa.table({f.name: cols[f.name] for f in out_schema})

    return s.map_batches(_merge, batch_format="pyarrow", batch_size=None)


def range_join(
    points: ray.data.Dataset,
    intervals: ray.data.Dataset,
    on: str,
    lo: str,
    hi: str,
    by: Optional[str] = None,
    point_cols: Optional[List[str]] = None,
    interval_cols: Optional[List[str]] = None,
    bucket_us: int = 3_600_000_000,
    max_copies: int = 64,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Point-in-interval join: every (point, interval) pair with the
    same ``by`` key (when given) and lo <= t < hi, each pair exactly
    once. Intervals longer than ``max_copies`` buckets raise — widen
    ``bucket_us`` instead of silently exploding the expansion."""
    point_cols = point_cols or []
    interval_cols = interval_cols or []
    keys = ([by] if by else []) + ["__bucket"]

    def _expand(b: pa.Table) -> pa.Table:
        cols = {"__bucket": pa.array([], pa.int64()),
                lo: pa.array([], pa.int64()), hi: pa.array([], pa.int64())}
        if by:
            cols[by] = pa.array([], pa.int64())
        for c in interval_cols:
            cols[c] = pa.array([], pa.int64())
        if b.num_rows == 0 or lo not in b.column_names:
            return pa.table(cols)
        lo_v = pc.cast(b[lo], pa.int64()).to_numpy(zero_copy_only=False)
        hi_v = pc.cast(b[hi], pa.int64()).to_numpy(zero_copy_only=False)
        b0 = lo_v // bucket_us
        b1 = np.maximum(hi_v - 1, lo_v) // bucket_us
        k = (b1 - b0 + 1).astype(np.int64)
        if k.max(initial=0) > max_copies:
            raise ValueError(
                f"interval covers {int(k.max())} buckets "
                f"(> max_copies={max_copies}); raise bucket_us")
        rows = np.repeat(np.arange(b.num_rows), k)
        off = np.arange(len(rows)) - np.repeat(
            np.cumsum(k) - k, k)
        ri = pa.array(rows, pa.int64())
        out = {"__bucket": pa.array(b0[rows] + off),
               lo: pa.array(lo_v[rows]), hi: pa.array(hi_v[rows])}
        if by:
            out[by] = pc.take(b[by], ri)
        for c in interval_cols:
            out[c] = pc.take(b[c], ri)
        return pa.table(out)

    def _bucket(b: pa.Table) -> pa.Table:
        cols = {"__bucket": pa.array([], pa.int64()),
                on: pa.array([], pa.int64())}
        if by:
            cols[by] = pa.array([], pa.int64())
        for c in point_cols:
            cols[c] = pa.array([], pa.int64())
        if b.num_rows == 0 or on not in b.column_names:
            return pa.table(cols)
        t = pc.cast(b[on], pa.int64())
        out = {"__bucket": pc.divide(t, bucket_us), on: t}
        if by:
            out[by] = b[by]
        for c in point_cols:
            out[c] = b[c]
        return pa.table(out)

    pts = points.map_batches(_bucket, batch_format="pyarrow",
                             batch_size=None)
    ivs = intervals.map_batches(_expand, batch_format="pyarrow",
                                batch_size=None)
    j = hash_join(pts, ivs, on=keys, num_partitions=num_partitions)

    def _filter(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or on not in b.column_names:
            names = ([by] if by else []) + [on, lo, hi] + \
                point_cols + interval_cols
            return pa.table({c: pa.array([], pa.int64()) for c in names})
        keep = pc.and_(pc.greater_equal(b[on], b[lo]),
                       pc.less(b[on], b[hi]))
        out = b.filter(keep)
        return out.drop_columns(["__bucket"])

    return j.map_batches(_filter, batch_format="pyarrow", batch_size=None)
