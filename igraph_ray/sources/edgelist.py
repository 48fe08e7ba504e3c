"""Text-format dev readers/writers: whitespace edge list and NCOL.

Reference semantics: igraph_read_graph_edgelist
(/root/reference/src/foreign.c:78-121) — whitespace-separated integer
pairs, any run of spaces/newlines between tokens; and
igraph_read_graph_ncol (foreign.c:197) — named vertices, optional third
weight column, names mapped to dense ids in first-appearance order (the
trie's insertion-order contract).

These are deliberately "tiny dev helpers" (SURVEY.md §2.3 scopes the ten
reference parsers out of v0): the edge list parses streaming per text
block when no pair straddles a block boundary (the overwhelmingly common
one-pair-per-line layout), and falls back to a single-pass parse for the
exotic pairs-span-lines case. NCOL needs globally-ordered name
registration, so it is a driver-side single pass by design — use Parquet
for big inputs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data


def _parse_block(b: pa.Table) -> pa.Table:
    toks: list = []
    for line in b["text"].to_pylist():
        toks.extend(line.split())
    if not toks:
        return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    arr = np.array(toks, dtype=np.int64)
    pairs = arr.reshape(-1, 2)
    return pa.table({"src": pa.array(pairs[:, 0]), "dst": pa.array(pairs[:, 1])})


def read_edgelist(path: str) -> ray.data.Dataset:
    """Whitespace integer pairs -> Dataset (src:int64, dst:int64).

    foreign.c:78-121 semantics: tokens separated by any whitespace (a
    pair may span lines); total token count must be even."""
    ds = ray.data.read_text(path)

    def _count(b: pa.Table) -> pa.Table:
        toks = sum(len(line.split()) for line in b["text"].to_pylist())
        return pa.table({"n": pa.array([toks], pa.int64())})

    counts = [
        int(r["n"])
        for r in ds.map_batches(_count, batch_format="pyarrow", batch_size=None).take_all()
    ]
    if sum(counts) % 2 != 0:
        raise ValueError(f"odd token count in edge list {path!r}")
    if all(c % 2 == 0 for c in counts):
        # no pair straddles a block boundary: parse blocks in parallel
        return ds.map_batches(_parse_block, batch_format="pyarrow", batch_size=None)
    # rare layout (odd tokens per line run): one sequential pass
    arr = np.array(open(path).read().split(), dtype=np.int64)
    pairs = arr.reshape(-1, 2)
    return ray.data.from_arrow(
        pa.table({"src": pa.array(pairs[:, 0]), "dst": pa.array(pairs[:, 1])})
    )


def write_edgelist(edges: ray.data.Dataset, path: str) -> None:
    """igraph_write_graph_edgelist (foreign.c:2345): one "src dst" pair
    per line. Single file, streamed batch-wise."""
    with open(path, "w") as f:
        for b in edges.iter_batches(batch_format="pyarrow"):
            src = b["src"].to_numpy(zero_copy_only=False)
            dst = b["dst"].to_numpy(zero_copy_only=False)
            np.savetxt(f, np.column_stack([src, dst]), fmt="%d")


def read_ncol(
    path: str, weighted: Optional[bool] = None
) -> Tuple[ray.data.Dataset, ray.data.Dataset]:
    """NCOL reader (foreign.c:197): lines of "name name [weight]". Returns
    (edges Dataset with dense int ids [+ weight], vocabulary Dataset
    (name, vertex) in first-appearance order)."""
    names: dict = {}
    srcs, dsts, ws = [], [], []
    has_w = False
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if len(parts) not in (2, 3):
                raise ValueError(f"bad NCOL line: {line!r}")
            a = names.setdefault(parts[0], len(names))
            b = names.setdefault(parts[1], len(names))
            srcs.append(a)
            dsts.append(b)
            if len(parts) == 3:
                has_w = True
                ws.append(float(parts[2]))
            else:
                ws.append(1.0)
    if weighted is None:
        weighted = has_w
    cols = {"src": pa.array(srcs, pa.int64()), "dst": pa.array(dsts, pa.int64())}
    if weighted:
        cols["weight"] = pa.array(ws, pa.float64())
    edges = ray.data.from_arrow(pa.table(cols))
    vocab = ray.data.from_arrow(
        pa.table({"name": pa.array(list(names), pa.string()),
                  "vertex": pa.array(list(names.values()), pa.int64())})
    )
    return edges, vocab


def write_ncol(edges: ray.data.Dataset, path: str,
               vocab: "Optional[ray.data.Dataset]" = None,
               weight_col: Optional[str] = None) -> None:
    """NCOL writer (igraph_write_graph_ncol, foreign.c:1477): one
    "name1 name2 [weight]" line per edge, names from the vocabulary
    (name, vertex) when given, else the numeric ids — the reference
    falls back to ids when no name attribute exists. Streamed
    batch-wise with a broadcast name map (the vocabulary is the small
    side by contract, exactly the trie the reference holds in RAM)."""
    names = {}
    if vocab is not None:
        for b in vocab.iter_batches(batch_format="pyarrow"):
            vs = b["vertex"].to_numpy(zero_copy_only=False)
            ns = b["name"].to_pylist()
            names.update(zip(vs.tolist(), ns))
    with open(path, "w") as f:
        for b in edges.iter_batches(batch_format="pyarrow"):
            src = b["src"].to_numpy(zero_copy_only=False)
            dst = b["dst"].to_numpy(zero_copy_only=False)
            w = (b[weight_col].to_numpy(zero_copy_only=False)
                 if weight_col and weight_col in b.column_names else None)
            for i in range(len(src)):
                a = names.get(int(src[i]), str(int(src[i])))
                c = names.get(int(dst[i]), str(int(dst[i])))
                if w is not None:
                    f.write(f"{a} {c} {w[i]:g}\n")
                else:
                    f.write(f"{a} {c}\n")
