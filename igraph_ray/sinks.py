"""Resumable partitioned Parquet output.

The 100-TB output contract: never one giant file, never an
all-or-nothing job. Work is split into shards keyed by the INPUT
partitioning (file groups), each shard writes its own output directory,
and a per-shard ``_DONE.json`` marker — containing the input digest —
is committed LAST via atomic rename. A re-run of the same pipeline
skips every shard whose marker matches, re-does partially-written ones
(no marker → the directory is wiped and rebuilt), and redoes shards
whose inputs changed (digest mismatch). The same manifest-last
convention as the superstep checkpoints (superstep.py:100-126).

This is driver-side orchestration of shard granularity only — each
shard's data flows through a normal streaming Ray Data pipeline
(read → transform → write_parquet), so no shard is ever materialized
on the driver.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Callable, List, Sequence

import ray.data


def _shard_digest(files: Sequence[str]) -> str:
    h = hashlib.sha256()
    for f in sorted(files):
        h.update(f.encode())
        try:
            st = os.stat(f)
            h.update(str(st.st_size).encode())
        except OSError:
            pass
    return h.hexdigest()[:16]


def _marker(out_dir: str) -> str:
    return os.path.join(out_dir, "_DONE.json")


def shard_files(files: Sequence[str], shard_size: int) -> List[List[str]]:
    """Deterministic contiguous grouping of the sorted input file list."""
    files = sorted(files)
    return [list(files[i:i + shard_size]) for i in range(0, len(files), shard_size)]


def write_partitioned(
    input_files: Sequence[str],
    out_root: str,
    pipeline_fn: Callable[[ray.data.Dataset], ray.data.Dataset],
    shard_size: int = 16,
    columns: Sequence[str] | None = None,
) -> dict:
    """Run ``pipeline_fn`` over the input files shard-by-shard, writing
    ``out_root/shard=K/`` per shard with a digest-stamped ``_DONE.json``
    committed last. Returns {"written": k, "skipped": k2, "shards": n}.

    Resume semantics: a shard directory with a marker whose digest
    matches its input files is skipped; anything else is wiped and
    rebuilt, so a killed run resumes from the last completed shard and
    the final output is bit-for-bit independent of how many times the
    job was restarted."""
    shards = shard_files(input_files, shard_size)
    written = skipped = 0
    for k, files in enumerate(shards):
        out_dir = os.path.join(out_root, f"shard={k:05d}")
        digest = _shard_digest(files)
        mp = _marker(out_dir)
        if os.path.exists(mp):
            try:
                with open(mp) as f:
                    meta = json.load(f)
                if meta.get("digest") == digest:
                    skipped += 1
                    continue
            except (OSError, json.JSONDecodeError):
                pass
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir, exist_ok=True)
        ds = ray.data.read_parquet(list(files), columns=list(columns) if columns else None)
        pipeline_fn(ds).write_parquet(out_dir)
        tmp = mp + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"digest": digest, "files": list(files)}, f)
        os.replace(tmp, mp)
        written += 1
    return {"written": written, "skipped": skipped, "shards": len(shards)}


def read_partitioned(out_root: str, columns: Sequence[str] | None = None) -> ray.data.Dataset:
    """Read back only COMMITTED shards (those with a _DONE marker)."""
    files = []
    for d in sorted(os.listdir(out_root)):
        sd = os.path.join(out_root, d)
        if d.startswith("shard=") and os.path.exists(_marker(sd)):
            files.extend(
                os.path.join(sd, f)
                for f in sorted(os.listdir(sd))
                if f.endswith(".parquet")
            )
    if not files:
        raise FileNotFoundError(f"no committed shards under {out_root}")
    return ray.data.read_parquet(files, columns=list(columns) if columns else None)
