"""GML reader/writer.

Reference semantics: igraph_read_graph_gml / igraph_write_graph_gml
(/root/reference/src/foreign.c:1054-1500, 2489 — the tree built by the
gml_tree parser in gml_tree.c): a GML file is a key/value token stream
where values are integers, reals, quoted strings or bracketed sub-lists;
the top-level ``graph`` list holds ``directed 0|1``, ``node [ id ... ]``
and ``edge [ source ... target ... ]`` entries. Node ``id`` values are
arbitrary integers, mapped to dense vertex ids in first-appearance
order; other scalar keys on node/edge become typed attributes (the
reference unifies per-key types across records; numeric wins over
missing, string beats numeric when mixed — we match that by promoting
int → float → string over the union of observed values).

Single sequential pass by design (bracket nesting cannot be split),
Arrow-typed Datasets out — the same scoping note as the NCOL dev
reader: Parquet is the scale ingress; GML is interchange.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.graph import Graph

_TOKEN = re.compile(r'"(?:[^"\\]|\\.)*"|\[|\]|[^\s\[\]]+')


def _tokenize(text: str):
    for m in _TOKEN.finditer(text):
        yield m.group(0)


def _parse_value(tok: str):
    if tok.startswith('"'):
        return tok[1:-1].replace('\\"', '"').replace("\\\\", "\\")
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        return tok  # bare symbol — keep as string


def _parse_list(tokens) -> list:
    """Parse until the matching ']' (or stream end). Returns a list of
    (key, value) where value is a scalar or a nested list."""
    items = []
    for tok in tokens:
        if tok == "]":
            return items
        key = tok
        val_tok = next(tokens, None)
        if val_tok is None:
            break
        if val_tok == "[":
            items.append((key, _parse_list(tokens)))
        else:
            items.append((key, _parse_value(val_tok)))
    return items


def _col_type(values) -> pa.DataType:
    has_str = any(isinstance(v, str) for v in values if v is not None)
    if has_str:
        return pa.string()
    has_float = any(isinstance(v, float) for v in values if v is not None)
    return pa.float64() if has_float else pa.int64()


def _typed_col(values):
    t = _col_type(values)
    if pa.types.is_string(t):
        values = [None if v is None else str(v) for v in values]
    elif pa.types.is_floating(t):
        values = [None if v is None else float(v) for v in values]
    return pa.array(values, t)


def read_gml(path: str) -> Tuple[Graph, ray.data.Dataset]:
    """Returns (Graph, vertices Dataset (vertex:int64, gml_id:int64
    [, attr...])); edge attributes become typed columns on graph.edges;
    ``graph.attrs`` carries top-level scalars (Creator, directed, ...)."""
    with open(path) as f:
        items = _parse_list(_tokenize(f.read()))

    graph_list = None
    top_attrs: dict = {}
    for k, v in items:
        if k == "graph" and isinstance(v, list):
            graph_list = v
        elif not isinstance(v, list):
            top_attrs[k] = v
    if graph_list is None:
        raise ValueError(f"no 'graph [...]' list in GML file {path!r}")

    ids: dict = {}
    node_rows: list = []  # list of dicts
    edge_rows: list = []
    directed = False
    for k, v in graph_list:
        if k == "directed" and not isinstance(v, list):
            directed = bool(v)
        elif k == "node" and isinstance(v, list):
            rec = {kk: vv for kk, vv in v if not isinstance(vv, list)}
            gid = int(rec.get("id", len(ids)))
            if gid not in ids:
                ids[gid] = len(ids)
            node_rows.append((ids[gid], gid, rec))
        elif k == "edge" and isinstance(v, list):
            rec = {kk: vv for kk, vv in v if not isinstance(vv, list)}
            edge_rows.append(rec)
        elif not isinstance(v, list):
            top_attrs[k] = v

    # edges may reference ids with no node record (reference: error; we
    # register them like GraphML does to stay total)
    for rec in edge_rows:
        for key in ("source", "target"):
            gid = int(rec[key])
            if gid not in ids:
                ids[gid] = len(ids)

    n = len(ids)
    v_attr_keys = sorted({k for _, _, rec in node_rows for k in rec} - {"id"})
    gml_id = np.zeros(n, np.int64)
    for gid, vid in ids.items():
        gml_id[vid] = gid
    vcols = {"vertex": pa.array(np.arange(n, dtype=np.int64)),
             "gml_id": pa.array(gml_id)}
    for key in v_attr_keys:
        vals: list = [None] * n
        for vid, _gid, rec in node_rows:
            if key in rec:
                vals[vid] = rec[key]
        vcols[key] = _typed_col(vals)
    vertices = ray.data.from_arrow(pa.table(vcols))

    e_attr_keys = sorted({k for rec in edge_rows for k in rec}
                         - {"source", "target"})
    src = np.array([ids[int(r["source"])] for r in edge_rows], np.int64)
    dst = np.array([ids[int(r["target"])] for r in edge_rows], np.int64)
    ecols = {"src": pa.array(src), "dst": pa.array(dst)}
    for key in e_attr_keys:
        ecols[key] = _typed_col([rec.get(key) for rec in edge_rows])
    edges = ray.data.from_arrow(pa.table(ecols))

    top_attrs["directed"] = directed
    g = Graph(edges, n=n, weighted="weight" in e_attr_keys,
              attrs=top_attrs)
    return g, vertices


def _gml_scalar(v) -> str:
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    s = str(v).replace("\\", "\\\\").replace('"', '\\"')
    return f'"{s}"'


def write_gml(
    graph: Graph,
    path: str,
    vertices: Optional[ray.data.Dataset] = None,
) -> None:
    """foreign.c:2489 layout: Creator line, then graph [ directed ...
    node [...] edge [...] ]. Node ids are the dense vertex ids (the
    reference writes vertex indexes); attribute columns on the vertex /
    edge tables are emitted as scalar keys. Streams batch-wise."""
    directed = bool(graph.attrs.get("directed", True))
    with open(path, "w") as f:
        f.write('Creator "igraph_ray"\nVersion 1\ngraph\n[\n')
        f.write(f"  directed {int(directed)}\n")
        if vertices is not None:
            vschema = vertices.schema()
            vattrs = [c for c in vschema.names if c not in ("vertex", "gml_id")]
            for b in vertices.sort("vertex").iter_batches(batch_format="pyarrow"):
                vid = b["vertex"].to_pylist()
                cols = {c: b[c].to_pylist() for c in vattrs}
                for i, v in enumerate(vid):
                    f.write(f"  node\n  [\n    id {v}\n")
                    for c in vattrs:
                        if cols[c][i] is not None:
                            f.write(f"    {c} {_gml_scalar(cols[c][i])}\n")
                    f.write("  ]\n")
        else:
            for v in range(graph.num_vertices()):
                f.write(f"  node\n  [\n    id {v}\n  ]\n")
        eschema = graph.edges.schema()
        eattrs = [c for c in eschema.names if c not in ("src", "dst")]
        for b in graph.edges.iter_batches(batch_format="pyarrow"):
            s = b["src"].to_pylist()
            d = b["dst"].to_pylist()
            cols = {c: b[c].to_pylist() for c in eattrs}
            for i in range(len(s)):
                f.write(f"  edge\n  [\n    source {s[i]}\n    target {d[i]}\n")
                for c in eattrs:
                    if cols[c][i] is not None:
                        f.write(f"    {c} {_gml_scalar(cols[c][i])}\n")
                f.write("  ]\n")
        f.write("]\n")
