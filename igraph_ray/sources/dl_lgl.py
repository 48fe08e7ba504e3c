"""UCINET DL, LGL, LEDA and DOT format support.

Reference semantics:

* DL — igraph_read_graph_dl (/root/reference/src/foreign-dl-parser.y:115-
  230, foreign-dl-lexer.l): header ``DL ... N=<n>``, optional ``FORMAT =
  FULLMATRIX | EDGELIST1 | NODELIST1`` (fullmatrix default), optional
  ``LABELS:`` block or ``LABELS EMBEDDED``, then ``DATA:`` and the body.
  EDGELIST1 lines are 1-based ``i j [weight]``; NODELIST1 lines are
  ``src t1 t2 ...``; FULLMATRIX rows are 0/1 sequences (row-major, a '1'
  at (i,j) is the edge i->j). The reference always builds a directed
  graph from DL input.

* LGL — igraph_read_graph_lgl / igraph_write_graph_lgl
  (foreign-lgl-parser.y; foreign.c:283-360): ``# <source>`` lines start
  an adjacency group, following ``<target> [weight]`` lines attach to
  the most recent source. Names are arbitrary tokens mapped to dense
  0-based ids in first-appearance order (the reference's trie does the
  same). Undirected in the reference; we keep the (src,dst) rows as
  written and tag attrs['directed']=False.

* LEDA — igraph_write_graph_leda (foreign.c:2580-2720): ``LEDA.GRAPH``,
  one line each for the vertex / edge attribute type (``float`` /
  ``string`` / ``void``), ``-1`` directed / ``-2`` undirected, vertex
  count then one ``|{attr}|`` line per vertex, edge count then one
  ``<src> <dst> <rev> |{attr}|`` line per edge (1-based; rev is the
  reversal edge id + 1 or 0). The reference has no LEDA reader; we add
  one for round-trips.

* DOT — igraph_write_graph_dot (foreign-dot.c / foreign.c): header
  comment, ``digraph {`` / ``graph {``, one ``  <id>;`` line per vertex
  and ``  <from> -> <to>;`` (directed) or ``--`` (undirected) per edge.
  The reference is write-only for DOT; the reader here handles exactly
  the subset the writer emits (round-trip support).

These are interchange / dev formats: headers and grouping context make
the line streams non-self-contained, so (like ``read_pajek``) parsing
happens on the driver and is intended for graphs that fit a single
machine's text file — the scale ingress path is Parquet. Writers stream
edge batches from the Dataset.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.graph import Graph


def _from_rows(rows: List[Tuple[int, int, Optional[float]]], n: int,
               directed: bool) -> Graph:
    weighted = any(w is not None for _, _, w in rows)
    cols = {
        "src": pa.array([r[0] for r in rows], pa.int64()),
        "dst": pa.array([r[1] for r in rows], pa.int64()),
    }
    if weighted:
        cols["weight"] = pa.array(
            [1.0 if r[2] is None else r[2] for r in rows], pa.float64())
    return Graph(ray.data.from_arrow(pa.table(cols)), n=n,
                 weighted=weighted, attrs={"directed": directed})


# ---------------------------------------------------------------- DL ---

def read_dl(path: str) -> Tuple[Graph, ray.data.Dataset]:
    """UCINET DL → (Graph, vertices Dataset (vertex, name)).

    Handles the three reference formats (fullmatrix / edgelist1 /
    nodelist1), LABELS: blocks and LABELS EMBEDDED (foreign-dl-parser.y).
    """
    text = open(path).read()
    m = re.search(r"\bN\s*=\s*(\d+)", text, re.I)
    if not m or not re.match(r"\s*DL\b", text, re.I):
        raise ValueError("not a DL file (missing 'DL' / 'N=<n>' header)")
    n = int(m.group(1))
    fmt = "fullmatrix"
    fm = re.search(r"FORMAT\s*=\s*(FULLMATRIX|EDGELIST1|NODELIST1)",
                   text, re.I)
    if fm:
        fmt = fm.group(1).lower()
    embedded = re.search(r"LABELS\s+EMBEDDED", text, re.I) is not None

    labels: List[str] = []
    lm = re.search(r"^\s*LABELS\s*:\s*$(.*?)^\s*(?:DATA|LABELS)",
                   text, re.I | re.M | re.S)
    if lm:
        labels = [t for chunk in lm.group(1).splitlines()
                  for t in re.split(r"[,\s]+", chunk.strip()) if t]
    dm = re.search(r"^\s*DATA\s*:?\s*$", text, re.I | re.M)
    if not dm:
        raise ValueError("DL file has no DATA section")
    body = [ln.strip() for ln in text[dm.end():].splitlines() if ln.strip()]

    name_to_id: Dict[str, int] = {lab: i for i, lab in enumerate(labels)}

    def _vid(tok: str) -> int:
        if embedded:
            if tok not in name_to_id:
                name_to_id[tok] = len(name_to_id)
            return name_to_id[tok]
        return int(tok) - 1

    rows: List[Tuple[int, int, Optional[float]]] = []
    if fmt == "edgelist1":
        for ln in body:
            parts = ln.split()
            if len(parts) < 2:
                continue
            w = float(parts[2]) if len(parts) > 2 else None
            rows.append((_vid(parts[0]), _vid(parts[1]), w))
    elif fmt == "nodelist1":
        for ln in body:
            parts = ln.split()
            if len(parts) < 2:
                continue
            s = _vid(parts[0])
            rows.extend((s, _vid(t), None) for t in parts[1:])
    else:  # fullmatrix
        if embedded:
            # first body line is the column label sequence
            for tok in body[0].split():
                _vid(tok)
            body = body[1:]
        i = 0
        for ln in body:
            parts = ln.split()
            if embedded:
                parts = parts[1:]  # row label
            digits = "".join(parts)
            for j, ch in enumerate(digits):
                if ch == "1":
                    rows.append((i, j, None))
            i += 1
    if embedded:
        labels = [None] * len(name_to_id)
        for k, v in name_to_id.items():
            labels[v] = k
    g = _from_rows(rows, n, directed=True)
    verts = ray.data.from_arrow(pa.table({
        "vertex": pa.array(np.arange(n, dtype=np.int64)),
        "name": pa.array([labels[i] if i < len(labels) else str(i + 1)
                          for i in range(n)], pa.string()),
    }))
    return g, verts


def write_dl(graph: Graph, path: str) -> None:
    """EDGELIST1 layout (the list form every DL consumer reads):
    header, FORMAT line, DATA:, 1-based ``i j [w]`` lines."""
    n = graph.num_vertices()
    has_w = "weight" in graph.edges.schema().names
    with open(path, "w") as f:
        f.write(f"DL N={n}\nFORMAT = EDGELIST1\nDATA:\n")
        for b in graph.edges.iter_batches(batch_format="pyarrow"):
            s = b["src"].to_numpy(zero_copy_only=False) + 1
            d = b["dst"].to_numpy(zero_copy_only=False) + 1
            if has_w:
                w = b["weight"].to_numpy(zero_copy_only=False)
                np.savetxt(f, np.column_stack([s, d, w]), fmt="%d %d %g")
            else:
                np.savetxt(f, np.column_stack([s, d]), fmt="%d")


# --------------------------------------------------------------- LGL ---

def read_lgl(path: str) -> Tuple[Graph, ray.data.Dataset]:
    """LGL → (Graph, vertices Dataset (vertex, name)); names mapped to
    dense ids in first-appearance order (foreign-lgl-parser.y)."""
    name_to_id: Dict[str, int] = {}

    def _vid(tok: str) -> int:
        if tok not in name_to_id:
            name_to_id[tok] = len(name_to_id)
        return name_to_id[tok]

    rows: List[Tuple[int, int, Optional[float]]] = []
    cur = -1
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line:
                continue
            if line.startswith("#"):
                cur = _vid(line[1:].strip())
                continue
            parts = line.split()
            w = float(parts[1]) if len(parts) > 1 else None
            if cur < 0:
                raise ValueError("LGL target line before any '# source'")
            rows.append((cur, _vid(parts[0]), w))
    n = len(name_to_id)
    g = _from_rows(rows, n, directed=False)
    names = [None] * n
    for k, v in name_to_id.items():
        names[v] = k
    verts = ray.data.from_arrow(pa.table({
        "vertex": pa.array(np.arange(n, dtype=np.int64)),
        "name": pa.array(names, pa.string()),
    }))
    return g, verts


def write_lgl(graph: Graph, path: str,
              names: Optional[Dict[int, str]] = None,
              isolates: bool = True) -> None:
    """foreign.c:283-360 layout: '# from' group headers, one target (and
    optional weight) per line. Grouping needs src-sorted edges; the sort
    runs distributed, only the text serialization is driver-side."""
    n = graph.num_vertices()
    names = names or {}
    has_w = "weight" in graph.edges.schema().names
    seen = np.zeros(n, dtype=bool)
    with open(path, "w") as f:
        cur = None
        for b in graph.edges.sort("src").iter_batches(batch_format="pyarrow"):
            s = b["src"].to_numpy(zero_copy_only=False)
            d = b["dst"].to_numpy(zero_copy_only=False)
            w = (b["weight"].to_numpy(zero_copy_only=False)
                 if has_w else None)
            for i in range(len(s)):
                si = int(s[i])
                seen[si] = True
                seen[int(d[i])] = True
                if si != cur:
                    f.write(f"# {names.get(si, str(si))}\n")
                    cur = si
                tgt = names.get(int(d[i]), str(int(d[i])))
                f.write(f"{tgt} {w[i]:g}\n" if has_w else f"{tgt}\n")
        if isolates:
            for v in np.flatnonzero(~seen):
                f.write(f"# {names.get(int(v), str(int(v)))}\n")


# -------------------------------------------------------------- LEDA ---

def write_leda(graph: Graph, path: str,
               edge_attr: Optional[str] = None) -> None:
    """foreign.c:2580-2720 layout. ``rev`` (the reversal edge id) is 0
    throughout — matching the reference when no reverse edge exists; the
    reverse-id lookup is an O(E) join we skip, readers (including ours)
    ignore the field."""
    n = graph.num_vertices()
    directed = bool(graph.attrs.get("directed", True))
    names = graph.edges.schema().names
    if edge_attr is None and "weight" in names:
        edge_attr = "weight"
    etype = "float" if edge_attr else "void"
    m = graph.num_edges()
    with open(path, "w") as f:
        f.write(f"LEDA.GRAPH\nvoid\n{etype}\n{-1 if directed else -2}\n")
        f.write(f"# Vertices\n{n}\n")
        for _ in range(n):
            f.write("|{}|\n")
        f.write(f"# Edges\n{m}\n")
        for b in graph.edges.iter_batches(batch_format="pyarrow"):
            s = b["src"].to_numpy(zero_copy_only=False) + 1
            d = b["dst"].to_numpy(zero_copy_only=False) + 1
            if edge_attr:
                w = b[edge_attr].to_numpy(zero_copy_only=False)
                for i in range(len(s)):
                    f.write(f"{s[i]} {d[i]} 0 |{{{w[i]:g}}}|\n")
            else:
                for i in range(len(s)):
                    f.write(f"{s[i]} {d[i]} 0 |{{}}|\n")


def read_leda(path: str) -> Graph:
    """Reader for the section the reference writer emits (the reference
    itself is write-only for LEDA)."""
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f
                 if ln.strip() and not ln.startswith("#")]
    if lines[0] != "LEDA.GRAPH":
        raise ValueError("not a LEDA.GRAPH file")
    etype = lines[2].strip()
    directed = int(lines[3]) == -1
    n = int(lines[4])
    idx = 5 + n
    m = int(lines[idx])
    rows: List[Tuple[int, int, Optional[float]]] = []
    for ln in lines[idx + 1: idx + 1 + m]:
        mm = re.match(r"(\d+)\s+(\d+)\s+(-?\d+)\s*\|\{(.*)\}\|", ln)
        if not mm:
            raise ValueError(f"bad LEDA edge line: {ln!r}")
        w = (float(mm.group(4))
             if etype == "float" and mm.group(4) else None)
        rows.append((int(mm.group(1)) - 1, int(mm.group(2)) - 1, w))
    return _from_rows(rows, n, directed=directed)


# --------------------------------------------------------------- DOT ---

def write_dot(graph: Graph, path: str) -> None:
    """foreign.c igraph_write_graph_dot minimal profile: header comment,
    digraph/graph block, '  <id>;' vertex lines, edge lines with the
    direction-matching operator."""
    directed = bool(graph.attrs.get("directed", True))
    op = "->" if directed else "--"
    with open(path, "w") as f:
        f.write("/* Created by igraph_ray */\n")
        f.write("digraph {\n" if directed else "graph {\n")
        for v in range(graph.num_vertices()):
            f.write(f"  {v};\n")
        f.write("\n")
        for b in graph.edges.iter_batches(batch_format="pyarrow"):
            s = b["src"].to_numpy(zero_copy_only=False)
            d = b["dst"].to_numpy(zero_copy_only=False)
            for i in range(len(s)):
                f.write(f"  {s[i]} {op} {d[i]};\n")
        f.write("}\n")


def read_dot(path: str) -> Graph:
    """Reads the subset ``write_dot`` emits (integer ids, one statement
    per line) — round-trip support; the reference has no DOT reader."""
    directed = None
    n = 0
    rows: List[Tuple[int, int, Optional[float]]] = []
    with open(path) as f:
        for raw in f:
            line = raw.strip().rstrip(";")
            if line.startswith("digraph"):
                directed = True
            elif line.startswith("graph") and directed is None:
                directed = False
            m = re.match(r"(\d+)\s*(->|--)\s*(\d+)$", line)
            if m:
                s, d = int(m.group(1)), int(m.group(3))
                rows.append((s, d, None))
                n = max(n, s + 1, d + 1)
            elif re.match(r"\d+$", line):
                n = max(n, int(line) + 1)
    return _from_rows(rows, n, directed=bool(directed))
