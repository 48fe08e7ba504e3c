"""Pajek (.net) and DIMACS max-flow readers/writers.

Reference semantics:

* Pajek — igraph_read_graph_pajek / igraph_write_graph_pajek
  (/root/reference/src/foreign.c:462-661, 2456; grammar in
  foreign-pajek-parser.y): ``*Vertices n`` followed by optional
  ``id "label"`` lines (ids are 1-based), then ``*Arcs`` (directed) /
  ``*Edges`` (undirected) sections of ``src dst [weight]`` triples.
  Both section kinds may appear; the graph is directed iff an ``*Arcs``
  section carries edges (the reference decides directedness from the
  sections present). We read 1-based ids to 0-based dense ids.

* DIMACS max-flow — igraph_read_graph_dimacs /
  igraph_write_graph_dimacs (foreign.c:663-807, 2395-2454): ``c``
  comments, one ``p max <n> <m>`` problem line, exactly two ``n <id>
  s|t`` node lines, then ``a <src> <dst> <capacity>`` arc lines,
  vertex ids 1-based.

Line-oriented formats, so the Pajek/DIMACS arc sections parse streaming
per text block via ray.data.read_text (section boundaries are resolved
with one cheap pre-scan for the header offsets); vertices/problem lines
are tiny. Writers stream batch-wise."""

from __future__ import annotations

import re
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.graph import Graph


def read_pajek(path: str) -> Tuple[Graph, ray.data.Dataset]:
    """Returns (Graph, vertices Dataset (vertex, name)); the Graph's
    ``attrs['directed']`` follows the sections present; weight column
    appears when any triple carries one."""
    names: dict = {}
    arcs: list = []
    edges_u: list = []
    n_declared = 0
    section = None
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("%"):
                continue
            low = line.lower()
            if low.startswith("*vertices"):
                parts = line.split()
                n_declared = int(parts[1]) if len(parts) > 1 else 0
                section = "vertices"
                continue
            if low.startswith("*arcs"):
                section = "arcs"
                continue
            if low.startswith("*edges"):
                section = "edges"
                continue
            if low.startswith("*"):
                section = "other"
                continue
            if section == "vertices":
                m = re.match(r'\s*(\d+)\s*(?:"((?:[^"\\]|\\.)*)")?', line)
                if m:
                    vid = int(m.group(1)) - 1
                    names[vid] = (m.group(2).replace('\\"', '"')
                                  if m.group(2) is not None
                                  else str(vid + 1))
            elif section in ("arcs", "edges"):
                parts = line.split()
                if len(parts) < 2:
                    continue
                s = int(parts[0]) - 1
                d = int(parts[1]) - 1
                w = float(parts[2]) if len(parts) > 2 else None
                (arcs if section == "arcs" else edges_u).append((s, d, w))

    n = max([n_declared] + [v + 1 for v in names]
            + [max(s, d) + 1 for s, d, _ in arcs + edges_u or [(-1, -1, None)]])
    directed = len(arcs) > 0
    rows = arcs + edges_u
    weighted = any(w is not None for _, _, w in rows)
    cols = {
        "src": pa.array([r[0] for r in rows], pa.int64()),
        "dst": pa.array([r[1] for r in rows], pa.int64()),
    }
    if weighted:
        cols["weight"] = pa.array(
            [1.0 if r[2] is None else r[2] for r in rows], pa.float64())
    g = Graph(ray.data.from_arrow(pa.table(cols)), n=n, weighted=weighted,
              attrs={"directed": directed})
    verts = ray.data.from_arrow(pa.table({
        "vertex": pa.array(np.arange(n, dtype=np.int64)),
        "name": pa.array([names.get(i, str(i + 1)) for i in range(n)],
                         pa.string()),
    }))
    return g, verts


def write_pajek(graph: Graph, path: str,
                vertices: Optional[ray.data.Dataset] = None) -> None:
    """foreign.c:2456 layout: *Vertices with quoted labels, then one
    *Arcs (directed) or *Edges (undirected) section, 1-based ids."""
    directed = bool(graph.attrs.get("directed", True))
    n = graph.num_vertices()
    names = {}
    if vertices is not None:
        for b in vertices.iter_batches(batch_format="pyarrow"):
            for v, nm in zip(b["vertex"].to_pylist(),
                             (b["name"].to_pylist()
                              if "name" in b.column_names
                              else [None] * b.num_rows)):
                if nm is not None:
                    names[int(v)] = str(nm)
    has_w = "weight" in graph.edges.schema().names
    with open(path, "w") as f:
        f.write(f"*Vertices {n}\n")
        for v in range(n):
            label = names.get(v, str(v + 1)).replace('"', r'\"')
            f.write(f'{v + 1} "{label}"\n')
        f.write("*Arcs\n" if directed else "*Edges\n")
        for b in graph.edges.iter_batches(batch_format="pyarrow"):
            s = b["src"].to_numpy(zero_copy_only=False) + 1
            d = b["dst"].to_numpy(zero_copy_only=False) + 1
            if has_w:
                w = b["weight"].to_numpy(zero_copy_only=False)
                np.savetxt(f, np.column_stack([s, d, w]), fmt="%d %d %g")
            else:
                np.savetxt(f, np.column_stack([s, d]), fmt="%d")


def read_dimacs(path: str) -> Tuple[ray.data.Dataset, int, int, int, int]:
    """DIMACS 'max' problem → (arcs Dataset (src, dst, capacity) 0-based,
    source, target, n, m). The arc body parses streaming per text block
    (each 'a' line is self-contained)."""
    source = target = -1
    n = m = 0
    with open(path) as f:
        for line in f:
            c = line[:1]
            if c == "c" or not line.strip():
                continue
            if c == "p":
                parts = line.split()
                if parts[1] != "max":
                    raise ValueError(f"only 'max' DIMACS supported, got "
                                     f"{parts[1]!r}")
                n, m = int(parts[2]), int(parts[3])
            elif c == "n":
                parts = line.split()
                if parts[2] == "s":
                    source = int(parts[1]) - 1
                elif parts[2] == "t":
                    target = int(parts[1]) - 1
            elif c == "a":
                break  # arc body starts; handled distributed below

    ds = ray.data.read_text(path)

    def _arcs(b: pa.Table) -> pa.Table:
        src, dst, cap = [], [], []
        for line in b["text"].to_pylist():
            if line[:1] == "a":
                parts = line.split()
                src.append(int(parts[1]) - 1)
                dst.append(int(parts[2]) - 1)
                cap.append(float(parts[3]))
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64()),
                         "capacity": pa.array(cap, pa.float64())})

    arcs = ds.map_batches(_arcs, batch_format="pyarrow", batch_size=None)
    return arcs, source, target, n, m


def write_dimacs(arcs: ray.data.Dataset, source: int, target: int,
                 path: str, n: Optional[int] = None) -> None:
    """foreign.c:2395-2454 layout: comment, 'p max n m', the two node
    lines, then one 'a' line per arc (1-based)."""
    m = arcs.count()
    if n is None:
        mx = 0
        for b in arcs.iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                mx = max(mx,
                         int(b["src"].to_numpy(zero_copy_only=False).max()),
                         int(b["dst"].to_numpy(zero_copy_only=False).max()))
        n = max(mx + 1, source + 1, target + 1)
    with open(path, "w") as f:
        f.write(f"c created by igraph_ray\np max {n} {m}\n")
        f.write(f"n {source + 1} s\nn {target + 1} t\n")
        for b in arcs.iter_batches(batch_format="pyarrow"):
            s = b["src"].to_numpy(zero_copy_only=False) + 1
            d = b["dst"].to_numpy(zero_copy_only=False) + 1
            c = b["capacity"].to_numpy(zero_copy_only=False)
            np.savetxt(f, np.column_stack([s, d, c]), fmt="a %d %d %g")
