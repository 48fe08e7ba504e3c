"""GraphML reader/writer.

Reference semantics: igraph_read_graph_graphml /
igraph_write_graph_graphml (/root/reference/src/foreign-graphml.c) — the
reference's default interchange format (the shell binding reads GraphML
by default, interfaces/shell/interface.c.in:81-86):

* ``<key>`` declarations carry typed attributes (attr.type ∈ boolean /
  int / long / float / double / string) with optional ``<default>``;
  boolean literals accept true/false/yes/no/1/0
  (foreign-graphml.c:145-170).
* node XML ids are registered in first-appearance order into dense
  integer vertex ids (the node trie contract, foreign-graphml.c:395).
* ``<graph edgedefault=...>`` decides directedness
  (foreign-graphml.c:977, 1490).

Ray-native shape: parsing uses the stdlib ``xml.etree.iterparse``
streaming scan (XML cannot be split mid-tag, so one file = one
sequential pass — same scoping note as the NCOL dev reader: use Parquet
for big graphs; MANY GraphML files parallelize per-file via
``read_graphml_dir``). Output is Arrow-typed Datasets throughout —
attributes become typed columns, missing values become the declared
default (or null), exactly the reference's attribute-record fill rule
(foreign-graphml.c:394-460).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, Optional, Tuple
from xml.sax.saxutils import escape, quoteattr

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.graph import Graph

_NS = "{http://graphml.graphdrawing.org/xmlns}"

_PA_TYPES = {
    "boolean": pa.bool_(),
    "int": pa.int64(),
    "long": pa.int64(),
    "float": pa.float64(),
    "double": pa.float64(),
    "string": pa.string(),
}


def _parse_value(raw: Optional[str], attr_type: str):
    if raw is None:
        return None
    raw = raw.strip()
    if attr_type == "boolean":
        return raw.lower() in ("true", "yes", "1")
    if attr_type in ("int", "long"):
        return int(float(raw))
    if attr_type in ("float", "double"):
        return float(raw)
    return raw


class _Key:
    __slots__ = ("name", "domain", "attr_type", "default")

    def __init__(self, name: str, domain: str, attr_type: str, default):
        self.name = name
        self.domain = domain
        self.attr_type = attr_type
        self.default = default


def parse_graphml(path: str) -> dict:
    """Single-pass streaming parse. Returns plain Python/numpy data:
    {directed, names, node_attrs, src, dst, edge_attrs, keys}."""
    keys: Dict[str, _Key] = {}
    names: Dict[str, int] = {}
    node_attr_rows: Dict[str, dict] = {}   # key name -> {vid: value}
    edge_attr_rows: Dict[str, dict] = {}   # key name -> {eid: value}
    src: list = []
    dst: list = []
    directed = True
    in_graph = False

    cur_kind = None      # "node" | "edge" | "key"
    cur_id = None        # vid or eid
    cur_key: Optional[_Key] = None
    cur_data_key: Optional[str] = None

    def _local(tag: str) -> str:
        return tag.split("}", 1)[1] if tag.startswith("{") else tag

    for event, el in ET.iterparse(path, events=("start", "end")):
        tag = _local(el.tag)
        if event == "start":
            if tag == "key":
                kid = el.get("id")
                cur_key = _Key(
                    el.get("attr.name", kid),
                    el.get("for", "all"),
                    el.get("attr.type", "string"),
                    None,
                )
                keys[kid] = cur_key
                cur_kind = "key"
            elif tag == "graph":
                directed = el.get("edgedefault", "directed") == "directed"
                in_graph = True
            elif tag == "node":
                nid = el.get("id")
                if nid not in names:
                    names[nid] = len(names)
                cur_kind, cur_id = "node", names[nid]
            elif tag == "edge":
                a = el.get("source")
                b = el.get("target")
                for x in (a, b):
                    if x not in names:
                        names[x] = len(names)
                cur_kind, cur_id = "edge", len(src)
                src.append(names[a])
                dst.append(names[b])
            elif tag == "data":
                cur_data_key = el.get("key")
        else:  # end
            if tag == "default" and cur_kind == "key" and cur_key is not None:
                cur_key.default = _parse_value(el.text, cur_key.attr_type)
            elif tag == "data" and in_graph and cur_data_key is not None:
                k = keys.get(cur_data_key)
                if k is not None and cur_kind in ("node", "edge"):
                    val = _parse_value(el.text, k.attr_type)
                    store = node_attr_rows if cur_kind == "node" else edge_attr_rows
                    store.setdefault(k.name, {})[cur_id] = val
                cur_data_key = None
            elif tag in ("node", "edge"):
                cur_kind, cur_id = None, None
            elif tag == "key":
                cur_kind, cur_key = None, None
            el.clear()

    return {
        "directed": directed,
        "names": names,
        "node_attrs": node_attr_rows,
        "src": np.array(src, np.int64),
        "dst": np.array(dst, np.int64),
        "edge_attrs": edge_attr_rows,
        "keys": keys,
    }


def _attr_column(rows: dict, n: int, key: _Key):
    vals = [rows.get(i, key.default) for i in range(n)]
    return pa.array(vals, _PA_TYPES.get(key.attr_type, pa.string()))


def read_graphml(path: str) -> Tuple[Graph, ray.data.Dataset]:
    """Returns (Graph, vertices Dataset). The vertex table carries
    (vertex:int64, name:string) plus one typed column per declared node
    attribute; edge attributes become typed columns on graph.edges.
    ``graph.attrs['directed']`` records edgedefault."""
    p = parse_graphml(path)
    names = p["names"]
    n = len(names)
    keys = p["keys"]

    vcols = {
        "vertex": pa.array(np.arange(n, dtype=np.int64)),
        "name": pa.array(list(names.keys()), pa.string()),
    }
    for kid, k in keys.items():
        if k.domain in ("node", "all") and (
            k.name in p["node_attrs"] or k.default is not None
        ):
            vcols[k.name] = _attr_column(p["node_attrs"].get(k.name, {}), n, k)
    vertices = ray.data.from_arrow(pa.table(vcols))

    ecols = {"src": pa.array(p["src"]), "dst": pa.array(p["dst"])}
    m = len(p["src"])
    weighted = False
    for kid, k in keys.items():
        if k.domain in ("edge", "all") and (
            k.name in p["edge_attrs"] or k.default is not None
        ):
            ecols[k.name] = _attr_column(p["edge_attrs"].get(k.name, {}), m, k)
            if k.name == "weight":
                weighted = True
    edges = ray.data.from_arrow(pa.table(ecols))
    g = Graph(edges, n=n, weighted=weighted,
              attrs={"directed": p["directed"]})
    return g, vertices


def read_graphml_dir(paths: list) -> ray.data.Dataset:
    """Parse MANY GraphML files in parallel (one Ray task per file) into
    a single edge Dataset (file:string, src, dst) with per-file dense
    ids — the multi-file scale path."""

    def _one(row: dict) -> list:
        p = parse_graphml(row["path"])
        return [{"file": row["path"], "src": int(s), "dst": int(d)}
                for s, d in zip(p["src"], p["dst"])]

    return ray.data.from_items([{"path": p} for p in paths]).flat_map(_one)


def _graphml_type(t: pa.DataType) -> str:
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_integer(t):
        return "long"
    if pa.types.is_floating(t):
        return "double"
    return "string"


def _fmt(v, gtype: str) -> str:
    if gtype == "boolean":
        return "true" if v else "false"
    if gtype == "double":
        return repr(float(v))
    return escape(str(v))


def write_graphml(
    graph: Graph,
    path: str,
    vertices: Optional[ray.data.Dataset] = None,
) -> None:
    """foreign-graphml.c:1440+ layout: key declarations first, then the
    graph with nodes (ids ``n<vertex>`` like the reference's vertex-index
    naming) and edges. Streams batch-wise; attribute columns on the
    vertex table / edge table are emitted as typed <data>."""
    directed = bool(graph.attrs.get("directed", True))

    eschema = graph.edges.schema()
    e_attr_cols = [c for c in eschema.names if c not in ("src", "dst")]
    e_types = {c: _graphml_type(eschema.types[eschema.names.index(c)])
               for c in e_attr_cols}
    v_attr_cols: list = []
    v_types: dict = {}
    if vertices is not None:
        vschema = vertices.schema()
        v_attr_cols = [c for c in vschema.names if c not in ("vertex", "name")]
        v_types = {c: _graphml_type(vschema.types[vschema.names.index(c)])
                   for c in v_attr_cols}

    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n')
        for c in v_attr_cols:
            f.write(f'  <key id="v_{c}" for="node" attr.name={quoteattr(c)} '
                    f'attr.type="{v_types[c]}"/>\n')
        for c in e_attr_cols:
            f.write(f'  <key id="e_{c}" for="edge" attr.name={quoteattr(c)} '
                    f'attr.type="{e_types[c]}"/>\n')
        f.write(f'  <graph id="G" edgedefault='
                f'"{"directed" if directed else "undirected"}">\n')
        if vertices is not None:
            for b in vertices.sort("vertex").iter_batches(batch_format="pyarrow"):
                vids = b["vertex"].to_pylist()
                cols = {c: b[c].to_pylist() for c in v_attr_cols}
                for i, v in enumerate(vids):
                    if v_attr_cols:
                        f.write(f'    <node id="n{v}">')
                        for c in v_attr_cols:
                            if cols[c][i] is not None:
                                f.write(f'<data key="v_{c}">'
                                        f'{_fmt(cols[c][i], v_types[c])}</data>')
                        f.write("</node>\n")
                    else:
                        f.write(f'    <node id="n{v}"/>\n')
        else:
            for v in range(graph.num_vertices()):
                f.write(f'    <node id="n{v}"/>\n')
        for b in graph.edges.iter_batches(batch_format="pyarrow"):
            s = b["src"].to_pylist()
            d = b["dst"].to_pylist()
            cols = {c: b[c].to_pylist() for c in e_attr_cols}
            for i in range(len(s)):
                if e_attr_cols:
                    f.write(f'    <edge source="n{s[i]}" target="n{d[i]}">')
                    for c in e_attr_cols:
                        if cols[c][i] is not None:
                            f.write(f'<data key="e_{c}">'
                                    f'{_fmt(cols[c][i], e_types[c])}</data>')
                    f.write("</edge>\n")
                else:
                    f.write(f'    <edge source="n{s[i]}" target="n{d[i]}"/>\n')
        f.write("  </graph>\n</graphml>\n")
