"""Shared distributed helpers (no ray.init here)."""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data


@ray.remote
def _block_rows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _rank_block(t: pa.Table, col: str, offset: int) -> pa.Table:
    if t.num_rows == 0 or col not in t.column_names:
        return pa.table({col: pa.array([], pa.int64()), "rank": pa.array([], pa.int64())})
    return pa.table(
        {col: t[col], "rank": pa.array(np.arange(offset, offset + t.num_rows), pa.int64())}
    )


def dense_rank_map(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """Map each distinct value of ``col`` to its 0-based dense rank in
    ascending order — the distributed zip-with-index used for igraph's
    label-densification contracts (components.c:120-146;
    community.c:2323-2342).

    Scalable: global sort of the distinct values, then per-block rank
    offsets computed from block row counts only (no data to the driver).
    """
    distinct = ds.groupby(col).count().select_columns([col]).sort(col).materialize()
    refs = distinct.to_arrow_refs()
    sizes = ray.get([_block_rows.remote(r) for r in refs])
    offsets = np.zeros(len(sizes), dtype=np.int64)
    np.cumsum(sizes[:-1], out=offsets[1:])
    out_refs = [
        _rank_block.remote(r, col, int(off))
        for r, off, n in zip(refs, offsets, sizes)
        if n > 0
    ]
    if not out_refs:
        return ray.data.from_arrow(
            pa.table({col: pa.array([], pa.int64()), "rank": pa.array([], pa.int64())})
        )
    # blocks stay in the object store — never funnel the rank table
    # (O(#distinct labels) rows: components/LPA/SCC/Louvain densify and
    # the vocabulary ride on this) through the driver heap
    return ray.data.from_arrow_refs(out_refs)


def drop_empty_blocks(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Materialize and drop zero-row blocks.

    Sort-based groupby can emit empty blocks with a *null schema*; pyarrow's
    acero hash join rejects them ("No match for key field ..."). Stripping
    them before a join is cheap (row-count tasks over block refs only).
    """
    m = ds.materialize()
    refs = m.to_arrow_refs()
    counts = ray.get([_block_rows.remote(r) for r in refs])
    keep = [r for r, c in zip(refs, counts) if c > 0]
    if not keep:
        return m
    return ray.data.from_arrow_refs(keep)


# broadcast-join threshold: right sides up to this many rows are shipped
# once via ray.put and joined per batch with pyarrow's acero join — Ray's
# shuffle hash join costs seconds of fixed overhead per call and is kept
# for genuinely large-large joins only
BROADCAST_JOIN_ROWS = 4_000_000

_SMALL_TABLE_CACHE: dict = {}


@ray.remote
def _concat_tables(refs) -> pa.Table:
    all_t = ray.get(list(refs))
    tables = [t for t in all_t if t.num_rows > 0]
    if tables:
        return pa.concat_tables(tables)
    # keep a schema-carrying empty table when one exists (joins need it)
    for t in all_t:
        if t.num_columns > 0:
            return t.slice(0, 0)
    return pa.table({})


@ray.remote
def _concat_tables_mapped(refs, fn) -> pa.Table:
    all_t = ray.get(list(refs))
    tables = [t for t in all_t if t.num_rows > 0]
    if tables:
        return fn(pa.concat_tables(tables))
    for t in all_t:
        if t.num_columns > 0:
            return fn(t.slice(0, 0))
    return fn(pa.table({}))


def _fetch_small(ref) -> pa.Table:
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    t = _SMALL_TABLE_CACHE.get(key)
    if t is None:
        t = ray.get(ref)
        _SMALL_TABLE_CACHE[key] = t
    return t


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on,
    num_partitions: int = 16,
    join_type: str = "inner",
    broadcast_threshold: int = BROADCAST_JOIN_ROWS,
    lazy_left: bool = False,
    right_map=None,
) -> ray.data.Dataset:
    """Equi-join with empty-block sanitation.

    Small right sides take the broadcast path: the right table is
    assembled once in a task, put in the object store, and every left
    batch joins against it with pyarrow's in-memory join (zero extra
    shuffle; the canonical broadcast-hash-join). Large-large joins fall
    back to Ray Data's partitioned hash join.

    ``lazy_left``: skip the left side's drop_empty_blocks MATERIALIZE
    on the broadcast path, so chains of broadcast joins fuse into one
    streaming execution instead of paying a full executor launch per
    join boundary. Callers must guarantee the left side cannot carry
    null-schema empty blocks (safe for: outputs of a previous broadcast
    hash_join, plain map_batches chains over materialized data; NOT
    safe straight off a sort-based groupby). The partitioned fallback
    always sanitizes.

    ``right_map``: a (pa.Table -> pa.Table) projection applied to the
    ASSEMBLED small right table inside the broadcast task — pass the
    materialized base dataset as ``right`` and do the rename/select
    here, so the projection never becomes its own Dataset execution
    (a tiny rename map otherwise costs a full executor launch). On
    the partitioned fallback it degrades to a map_batches.
    """
    if isinstance(on, str):
        on = (on,)
    on = list(on)
    left_c = left if lazy_left else drop_empty_blocks(left)
    right_c = drop_empty_blocks(right)
    if right_c.count() <= broadcast_threshold:
        if right_map is not None:
            small_ref = _concat_tables_mapped.remote(
                right_c.to_arrow_refs(), right_map)
        else:
            small_ref = _concat_tables.remote(right_c.to_arrow_refs())
        arrow_type = {"inner": "inner", "left_outer": "left outer",
                      "left_anti": "left anti",
                      "left_semi": "left semi"}.get(join_type)
        if arrow_type is not None:
            def _bj(b: pa.Table) -> pa.Table:
                small = _fetch_small(small_ref)
                if small.num_rows == 0:
                    if arrow_type in ("inner", "left semi"):
                        # empty inner/semi join: no rows survive
                        return b.slice(0, 0)
                    return b
                if arrow_type in ("left anti", "left semi"):
                    # anti/semi keep only left columns
                    return b.join(small.select(on).group_by(on).aggregate([]),
                                  keys=on, join_type=arrow_type)
                return b.join(small, keys=on, join_type=arrow_type)

            return left_c.map_batches(_bj, batch_format="pyarrow", batch_size=None)
    if lazy_left:
        left_c = drop_empty_blocks(left_c)  # partitioned path must sanitize
    if right_map is not None:
        right_c = drop_empty_blocks(right_c.map_batches(
            right_map, batch_format="pyarrow", batch_size=None))
    return left_c.join(
        right_c,
        join_type=join_type,
        num_partitions=num_partitions,
        on=tuple(on),
    )


def universe_zeros(universe: ray.data.Dataset, value_col: str, dtype=pa.int64()) -> ray.data.Dataset:
    """(vertex, value=0) rows for every vertex — the union trick used to
    give aggregates full-universe coverage without a join."""

    def _z(b: pa.Table) -> pa.Table:
        return pa.table(
            {"vertex": b["vertex"], value_col: pa.array(np.zeros(b.num_rows, dtype=np.int64), dtype)}
        )

    return universe.map_batches(_z, batch_format="pyarrow", batch_size=None)
