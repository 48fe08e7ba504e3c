"""GraphDB binary reader/writer — the iso-benchmark database format.

Reference semantics: igraph_read_graph_graphdb
(/root/reference/src/foreign.c:893-966): the file is a stream of 16-bit
little-endian words; the first word is the node count, then for each
node (0-based, in order) one word with the out-list length followed by
that many destination words. Only unlabelled graphs exist in the
format; a short file is an error ("Truncated graphdb file"); trailing
bytes after the last list are ignored, exactly like the reference's
read loop. The 16-bit words cap the format at 65,535 vertices, so the
whole file is parsed in one vectorized numpy pass (the per-node length
chain is a sequential prefix, the edge extraction is a mask gather).

The reference has no graphdb writer; ``write_graphdb`` is the engine's
own inverse for round-trip tests and emits files the reference reader
accepts.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import ray.data


def read_graphdb(path: str) -> Tuple[ray.data.Dataset, int]:
    """Parse a GraphDB binary file -> (Dataset (src:int64, dst:int64),
    n). foreign.c:927 contract: directedness is the caller's choice
    (the file stores out-lists either way), node ids are dense
    0..n-1."""
    words = np.fromfile(path, dtype="<u2").astype(np.int64)
    if len(words) == 0:
        raise ValueError(f"can't read graphdb header from {path!r}")
    n = int(words[0])
    starts = np.empty(n + 1, dtype=np.int64)
    starts[0] = 1
    for i in range(n):  # <= 65535 iterations by format cap
        p = starts[i]
        if p >= len(words):
            raise ValueError(f"truncated graphdb file {path!r}")
        starts[i + 1] = p + 1 + int(words[p])
    if starts[n] > len(words):
        raise ValueError(f"truncated graphdb file {path!r}")
    lens = np.diff(starts) - 1
    mask = np.zeros(int(starts[n]), dtype=bool)
    mask[1:] = True
    mask[starts[:-1]] = False
    dst = words[: int(starts[n])][mask]
    src = np.repeat(np.arange(n, dtype=np.int64), lens)
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})), n


def write_graphdb(edges: ray.data.Dataset, n: int, path: str) -> None:
    """Inverse of :func:`read_graphdb` (no reference counterpart —
    foreign.c reads the format only): 16-bit LE words, node count then
    per-node out-lists in node order. Requires ids < 65536 (the format
    width)."""
    import collections

    adj = collections.defaultdict(list)
    for b in edges.iter_batches(batch_format="pyarrow"):
        for s, d in zip(b["src"].to_numpy(zero_copy_only=False),
                        b["dst"].to_numpy(zero_copy_only=False)):
            adj[int(s)].append(int(d))
    if n > 0xFFFF:
        raise ValueError("graphdb format caps node count at 65535")
    out = [n]
    for v in range(n):
        lst = adj.get(v, [])
        out.append(len(lst))
        out.extend(lst)
    np.asarray(out, dtype="<u2").tofile(path)
