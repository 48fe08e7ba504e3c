"""JSONL (newline-delimited JSON) corpus source/sink.

JSONL is the lingua franca of training-data interchange; the engine
rides Ray Data's native arrow-backed JSON reader/writer (streaming,
one shard per block — the same resumable-shard layout as the parquet
sink) and adds the schema hygiene the rest of the engine expects:
explicit column projection on read and int64 id coercion, so a JSONL
corpus drops into any documents-table pipeline unchanged.

Round-trip fidelity: JSON string escaping is symmetric for valid
UTF-8, so text survives write->read byte-identically — proven by the
``jsonl_docs`` query, which md5-hashes the round-tripped text against
a DuckDB md5 over the original parquet.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def write_jsonl(ds: ray.data.Dataset, path: str) -> None:
    """One .json shard per block under ``path`` (JSON-lines rows)."""
    ds.write_json(path)


def read_jsonl(
    path: str,
    columns: Optional[List[str]] = None,
    int_cols: Optional[List[str]] = None,
) -> ray.data.Dataset:
    """Read a JSONL directory/file; project to ``columns`` and coerce
    ``int_cols`` to int64 (JSON numbers parse as the narrowest arrow
    type per shard — coercion keeps the schema stable across shards)."""
    ds = ray.data.read_json(path)
    ints = set(int_cols or [])

    def _norm(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        names = columns or b.column_names
        cols = {}
        for c in names:
            a = b[c]
            cols[c] = pc.cast(a, pa.int64()) if c in ints else a
        return pa.table(cols)

    if columns or ints:
        ds = ds.map_batches(_norm, batch_format="pyarrow", batch_size=None)
    return ds
