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
        _rank_block.remote(r, col, int(off)) for r, off in zip(refs, offsets) if True
    ]
    tables = ray.get(out_refs)
    tables = [t for t in tables if t.num_rows > 0]
    if not tables:
        return ray.data.from_arrow(
            pa.table({col: pa.array([], pa.int64()), "rank": pa.array([], pa.int64())})
        )
    return ray.data.from_arrow(tables)


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


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on,
    num_partitions: int = 16,
    join_type: str = "inner",
) -> ray.data.Dataset:
    """Hash equi-join with empty-block sanitation on both sides."""
    if isinstance(on, str):
        on = (on,)
    return drop_empty_blocks(left).join(
        drop_empty_blocks(right),
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
